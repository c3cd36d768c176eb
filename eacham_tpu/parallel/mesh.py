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


def init_distributed(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
) -> bool:
    """Initialize `jax.distributed` for a multi-host run (idempotent).

    The reference is a single-process program (SURVEY.md §2.3 — "no
    MPI/NCCL/Gloo"); multi-host is a north-star capability designed
    fresh: one JAX process per host, all chips of the pod slice visible
    as `jax.devices()` after initialization, DCN used only by the
    coordinator handshake and any cross-host collective XLA inserts.

    Returns True if a multi-process runtime is (now) active. Safe to call
    in single-process runs: with no coordinator configured (args or
    standard cluster env vars) it is a no-op returning False.
    """
    # IMPORTANT: do not touch jax.devices()/process_count() before
    # initialize() — any backend query initializes the runtime single-
    # process and the late initialize() is then ignored (measured: the
    # two-process rehearsal saw process_count()==1 exactly because this
    # function previously probed process_count() first).
    try:
        from jax._src import distributed as _dist

        already = getattr(_dist.global_state, "client", None) is not None
    except ImportError:
        # private module moved (jax upgrade): fall back to the public
        # probe when available, else assume not-yet-initialized and let
        # the initialize() call below raise/no-op as appropriate
        already = bool(getattr(jax.distributed, "is_initialized", bool)())
    if already:
        return jax.process_count() > 1
    import os
    coord = coordinator_address or os.environ.get("JAX_COORDINATOR_ADDRESS")
    if coord is None and num_processes is None:
        return False
    try:
        jax.distributed.initialize(
            coordinator_address=coord,
            num_processes=num_processes,
            process_id=process_id,
        )
    except RuntimeError:
        # already initialized (e.g. by the launcher)
        pass
    return jax.process_count() > 1


def make_mesh_2d(
    n_hosts: int | None = None,
    chips_per_host: int | None = None,
    axes: tuple[str, str] = ("dcn", "ici"),
) -> Mesh:
    """2-D (hosts, chips) mesh: leading axis over DCN (process) boundaries,
    trailing axis over the chips within a host, which XLA maps to ICI.

    Layout contract: the pair/observation PartitionSpecs shard their
    leading dim over BOTH axes flattened (``P(axes)``), so per-device work
    is unchanged vs a 1-D mesh; reductions (`psum` over the axis tuple)
    decompose into an ICI all-reduce within each host followed by the
    small cross-host DCN reduce — the collective payload of the BA camera
    system is tens of KB (SCALING.md), so DCN latency, not bandwidth,
    bounds it.

    Defaults: hosts = `jax.process_count()`, chips = local device count.
    On a single host with virtual CPU devices, pass explicit shape (e.g.
    2x4) to validate the mesh logic without hardware.
    """
    devs = jax.devices()
    if n_hosts is None:
        n_hosts = jax.process_count()
    if chips_per_host is None:
        chips_per_host = max(1, len(devs) // max(n_hosts, 1))
    need = n_hosts * chips_per_host
    if len(devs) < need:
        try:
            cpu = jax.devices("cpu")
        except RuntimeError:
            cpu = []
        if len(cpu) >= need:
            devs = cpu
    if len(devs) < need:
        raise ValueError(
            f"need {need} devices for a {n_hosts}x{chips_per_host} mesh, "
            f"have {len(devs)}")
    grid = np.array(devs[:need]).reshape(n_hosts, chips_per_host)
    return Mesh(grid, axes)


def mesh_axes(mesh: Mesh) -> tuple[tuple[str, ...], int]:
    """(axis-name tuple, total device count) — consumers shard their
    leading data axis over ALL mesh axes flattened, so 1-D and (hosts,
    chips) meshes use identical PartitionSpecs."""
    names = tuple(mesh.axis_names)
    n_dev = int(np.prod([mesh.shape[a] for a in names]))
    return names, n_dev


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
