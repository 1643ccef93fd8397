"""Backend selection helpers.

The hosted TPU plugin in this environment registers itself regardless of
``JAX_PLATFORMS``, so the usual env-var route to a CPU run silently lands
on the real chip.  ``force_cpu()`` uses ``jax.config`` instead, which wins
over the plugin as long as it runs before the first backend initialization
(same mechanism as ``__graft_entry__.dryrun_multichip``).
"""

from __future__ import annotations

import os


def force_cpu(n_devices: int | None = None) -> bool:
    """Pin this process to the CPU backend (optionally with a virtual
    n-device mesh).  Must be called before any JAX backend initialization;
    returns True if the config took effect, False if a backend already
    existed (in which case the caller keeps whatever platform is live)."""
    if n_devices is not None:
        flags = os.environ.get("XLA_FLAGS", "")
        if "xla_force_host_platform_device_count" not in flags:
            os.environ["XLA_FLAGS"] = (
                flags + f" --xla_force_host_platform_device_count={n_devices}"
            ).strip()
    import jax

    try:
        jax.config.update("jax_platforms", "cpu")
        if n_devices is not None:
            jax.config.update("jax_num_cpu_devices", n_devices)
    except Exception:
        return False
    return jax.devices()[0].platform == "cpu"
