"""Two-process `jax.distributed` rehearsal — multi-HOST without hardware.

The dryrun validates the (hosts, chips) mesh on virtual devices inside ONE
process; this script validates the actual multi-process path: it spawns two
CPU processes, each claiming 4 virtual devices, initializes
`jax.distributed` through `eacham_tpu.parallel.mesh.init_distributed`,
builds the 2x4 (dcn, ici) mesh spanning BOTH processes, and executes the
pair-sharded matcher plus the psum-reduced distributed bundle adjustment on
it. Cross-process collectives ride the CPU gloo backend — the same code
path that rides DCN between TPU hosts.

Run directly (spawns its own workers):

    python scripts/distributed_rehearsal.py

or as a worker (used internally):

    EACHAM_REHEARSAL_RANK=0 EACHAM_REHEARSAL_COORD=localhost:9876 \
        python scripts/distributed_rehearsal.py
"""

from __future__ import annotations

import os
import subprocess
import sys
from pathlib import Path

ROOT = Path(__file__).resolve().parents[1]
N_PROCS = 2
LOCAL_DEVICES = 4


def worker(rank: int, coord: str) -> None:
    import jax

    # must run BEFORE any backend query (see init_distributed docstring):
    # pin the CPU platform and the cross-process CPU collectives backend
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_cpu_collectives_implementation", "gloo")

    import jax.numpy as jnp
    import numpy as np

    from eacham_tpu.parallel.mesh import init_distributed, make_mesh_2d

    assert init_distributed(coord, N_PROCS, rank), "distributed init failed"
    assert jax.process_count() == N_PROCS
    n_global = len(jax.devices())
    assert n_global == N_PROCS * LOCAL_DEVICES, jax.devices()

    mesh = make_mesh_2d(N_PROCS, LOCAL_DEVICES)

    # --- pair-sharded exhaustive matching over both processes -------------
    from eacham_tpu.parallel import match_all_pairs_sharded, refine_ba_sharded
    from eacham_tpu.sfm.matches import all_pairs_index

    rng = np.random.default_rng(0)      # same seed on every process:
    N, K, D = 8, 128, 64                # inputs are replicated by contract
    desc = rng.normal(size=(N, K, D)).astype(np.float32)
    desc /= np.linalg.norm(desc, axis=-1, keepdims=True)
    desc[1, :64] = desc[0, :64]
    mj, mv, ok = match_all_pairs_sharded(
        jnp.asarray(desc), jnp.ones((N, K), bool),
        jnp.asarray(all_pairs_index(N)), mesh, min_matches=16, chunk=4,
    )
    from jax.experimental import multihost_utils

    ok_all = multihost_utils.process_allgather(ok, tiled=True)
    assert bool(np.asarray(ok_all)[0]), \
        "frame (0,1) edge must survive the sharded match"

    # --- observation-sharded BA with cross-process psum -------------------
    from eacham_tpu.ba.core import BAConfig, BAProblem

    n_cams, n_pts = 4, 64
    pts = rng.uniform(-1, 1, (n_pts, 3)).astype(np.float32)
    pts[:, 2] += 4.0
    f = 100.0
    intr = np.array([f, f, 64.0, 48.0], np.float32)
    poses = np.tile(np.eye(4, dtype=np.float32), (n_cams, 1, 1))
    poses[:, 0, 3] = 0.3 * np.arange(n_cams)
    obs_cam, obs_pt = np.meshgrid(
        np.arange(n_cams), np.arange(n_pts), indexing="ij")
    pc = np.einsum("nij,pj->npi", poses[:, :3, :3], pts) + poses[:, None, :3, 3]
    uv = np.stack([f * pc[..., 0] / pc[..., 2] + intr[2],
                   f * pc[..., 1] / pc[..., 2] + intr[3]], -1)
    fixed = np.zeros(n_cams, bool)
    fixed[0] = True
    prob = BAProblem(
        poses=jnp.asarray(poses), points=jnp.asarray(pts + 0.01),
        intr=jnp.asarray(intr),
        obs_cam=jnp.asarray(obs_cam.ravel(), jnp.int32),
        obs_pt=jnp.asarray(obs_pt.ravel(), jnp.int32),
        obs_uv=jnp.asarray(uv.reshape(-1, 2), jnp.float32),
        obs_mask=jnp.ones(n_cams * n_pts, bool),
        cam_in_ba=jnp.ones(n_cams, bool),
        cam_fixed=jnp.asarray(fixed),
        pt_in_ba=jnp.ones(n_pts, bool),
        pt_obs_count=jnp.full(n_pts, float(n_cams)),
    )
    poses_out, pts_out, intr_out, info = refine_ba_sharded(
        prob, BAConfig(max_iters=3, cg_iters=8), mesh)
    ini, fin = float(info["initial_cost"]), float(info["final_cost"])
    assert np.isfinite(fin) and fin <= ini, (ini, fin)

    if rank == 0:
        print(f"REHEARSAL_OK procs={N_PROCS} devices={n_global} "
              f"cost {ini:.4f} -> {fin:.4f}", flush=True)


def launch() -> int:
    import socket

    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]
    coord = f"localhost:{port}"
    env_base = {
        **os.environ,
        "JAX_PLATFORMS": "cpu",
        "XLA_FLAGS": f"--xla_force_host_platform_device_count={LOCAL_DEVICES}",
        "EACHAM_REHEARSAL_COORD": coord,
    }
    procs = []
    for rank in range(N_PROCS):
        env = dict(env_base, EACHAM_REHEARSAL_RANK=str(rank))
        procs.append(subprocess.Popen(
            [sys.executable, __file__], env=env, cwd=str(ROOT),
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True))
    outs = []
    rc = 0
    for p in procs:
        try:
            out, _ = p.communicate(timeout=600)
        except subprocess.TimeoutExpired:
            p.kill()
            out, _ = p.communicate()
            rc = 1
        outs.append(out)
        rc |= p.returncode or 0
    sys.stdout.write("\n".join(outs))
    if rc == 0 and "REHEARSAL_OK" in outs[0]:
        print("distributed rehearsal: PASS")
        return 0
    print("distributed rehearsal: FAIL")
    return 1


if __name__ == "__main__":
    sys.path.insert(0, str(ROOT))
    rank_s = os.environ.get("EACHAM_REHEARSAL_RANK")
    if rank_s is None:
        raise SystemExit(launch())
    worker(int(rank_s), os.environ["EACHAM_REHEARSAL_COORD"])
