"""Front-end on real EuRoC frames (the reference's mh04 fixture images,
line_matching/data/mh04/imgs — the same data its own test binaries use)."""

import os

import jax.numpy as jnp
import numpy as np
import pytest

from vplines_slam_tpu.models import camera as cam_mod
from vplines_slam_tpu.models.feature_tracker import FeatureTrackerFrontend, TrackerConfig
from vplines_slam_tpu.ops import lines as lines_mod
from vplines_slam_tpu.utils.dataset import REFERENCE_MH04_FIXTURE, ImageFolderSequence, load_image

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REFERENCE_MH04_FIXTURE), reason="fixture images not present"
)


def euroc_cam():
    return cam_mod.pinhole(
        fx=461.6, fy=460.3, cx=363.0, cy=248.1,
        k1=-2.917e-01, k2=8.228e-02, p1=5.333e-05, p2=-1.578e-04,
    )


@pytest.mark.slow
def test_point_tracking_on_euroc_frames():
    seq = ImageFolderSequence(REFERENCE_MH04_FIXTURE)
    cam = euroc_cam()
    fe = FeatureTrackerFrontend(
        cam, TrackerConfig(max_features=96, min_dist=30), dtype=jnp.float64
    )
    counts, tracked = [], []
    prev_ids = set()
    for k, frame in enumerate(seq):
        if k >= 5:
            break
        out = fe.process(frame.t, jnp.asarray(frame.image(), jnp.float64))
        ids = set(int(i) for i in np.asarray(out.ids) if i >= 0)
        counts.append(len(ids))
        if prev_ids:
            tracked.append(len(ids & prev_ids))
        prev_ids = ids
    # detector fills the budget on textured EuRoC frames
    assert counts[0] >= 50, counts
    # most features survive frame-to-frame tracking at 20 Hz
    assert min(tracked) >= 30, tracked


@pytest.mark.slow
def test_line_detection_on_euroc_frame():
    img = load_image(os.path.join(REFERENCE_MH04_FIXTURE, "1.png"))
    segs, lens, valid = lines_mod.detect_lines(
        jnp.asarray(img, jnp.float64),
        lines_mod.LineDetectConfig(min_len=40.0, max_lines=48),
    )
    n = int(jnp.sum(valid))
    # the machine-hall frames are full of structural lines
    assert n >= 8, n
    assert float(jnp.max(lens)) > 80.0
