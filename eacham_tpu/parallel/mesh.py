"""Device-mesh construction.

The reference's only parallelism is a single-host TBB thread pool
(apps/sfm/main.cpp:72,98; SURVEY.md §2.3). The TPU-native replacement is a
`jax.sharding.Mesh`: frame/pair/observation axes are sharded over devices
and reductions ride ICI collectives — no threads, no mutexes.
"""

from __future__ import annotations

import numpy as np
import jax
from jax.sharding import Mesh


def make_mesh(n_devices: int | None = None, axis: str = "shard") -> Mesh:
    """1-D mesh over the first ``n_devices`` devices (default: all).

    When the default backend has too few devices (e.g. one real TPU chip)
    but the CPU backend was given virtual devices via
    ``xla_force_host_platform_device_count``, falls back to those — this is
    how multi-chip sharding logic is validated without hardware.
    """
    devs = jax.devices()
    if n_devices is not None and len(devs) < n_devices:
        try:
            cpu = jax.devices("cpu")
        except RuntimeError:
            cpu = []
        if len(cpu) >= n_devices:
            devs = cpu
    if n_devices is not None:
        if len(devs) < n_devices:
            raise ValueError(
                f"need {n_devices} devices, have {len(devs)} "
                "(set --xla_force_host_platform_device_count for CPU tests)"
            )
        devs = devs[:n_devices]
    return Mesh(np.array(devs), (axis,))
