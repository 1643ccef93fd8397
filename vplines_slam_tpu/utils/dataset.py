"""Dataset readers: EuRoC ASL directories and simple image sequences.

Host-side IO (the only part of the pipeline that touches disk).  Replaces
the reference's ROS-bag replay (`roslaunch` + rosbag play,
vins_estimator/launch/euroc.launch:6) with a direct reader — no ROS.
"""

from __future__ import annotations

import csv
import os
from dataclasses import dataclass
from typing import Iterator, Optional

import numpy as np


def load_image(path):
    """Grayscale float32 [0,1]."""
    from PIL import Image

    img = Image.open(path).convert("L")
    return np.asarray(img, np.float32) / 255.0


@dataclass
class ImuSample:
    t: float
    gyr: np.ndarray
    acc: np.ndarray


@dataclass
class FrameSample:
    t: float
    path: str

    def image(self):
        return load_image(self.path)


class EurocDataset:
    """EuRoC ASL layout: mav0/{cam0/data.csv+data/, imu0/data.csv,
    state_groundtruth_estimate0/data.csv}."""

    def __init__(self, root):
        self.root = root
        mav = os.path.join(root, "mav0") if os.path.isdir(os.path.join(root, "mav0")) else root
        self.cam_dir = os.path.join(mav, "cam0")
        self.imu_csv = os.path.join(mav, "imu0", "data.csv")
        self.gt_csv = os.path.join(
            mav, "state_groundtruth_estimate0", "data.csv"
        )

    def frames(self):
        out = []
        with open(os.path.join(self.cam_dir, "data.csv")) as f:
            for row in csv.reader(f):
                if row[0].startswith("#"):
                    continue
                t = int(row[0]) * 1e-9
                out.append(
                    FrameSample(t, os.path.join(self.cam_dir, "data", row[1].strip()))
                )
        return out

    def imu(self):
        out = []
        with open(self.imu_csv) as f:
            for row in csv.reader(f):
                if row[0].startswith("#"):
                    continue
                v = [float(x) for x in row]
                out.append(
                    ImuSample(v[0] * 1e-9, np.asarray(v[1:4]), np.asarray(v[4:7]))
                )
        return out

    def ground_truth(self):
        """(t [N], p [N,3], q [N,4] wxyz) from the 17-column GT csv
        (benchmark_publisher_node.cpp:33-52 format)."""
        ts, ps, qs = [], [], []
        with open(self.gt_csv) as f:
            for row in csv.reader(f):
                if row[0].startswith("#"):
                    continue
                v = [float(x) for x in row]
                ts.append(v[0] * 1e-9)
                ps.append(v[1:4])
                qs.append(v[4:8])  # w x y z
        return np.asarray(ts), np.asarray(ps), np.asarray(qs)


class ImageFolderSequence:
    """Numbered-image folder (e.g. the reference's line_matching/data/mh04
    fixture: 1.png..N.png, 20 Hz)."""

    def __init__(self, folder, hz=20.0):
        names = [f for f in os.listdir(folder) if f.endswith(".png")]
        names.sort(key=lambda s: int(os.path.splitext(s)[0]))
        self.paths = [os.path.join(folder, n) for n in names]
        self.hz = hz

    def __len__(self):
        return len(self.paths)

    def __iter__(self):
        for k, p in enumerate(self.paths):
            yield FrameSample(k / self.hz, p)


REFERENCE_MH04_FIXTURE = "/root/reference/line_matching/data/mh04/imgs"
