import numpy as np
import jax
import jax.numpy as jnp

from eacham_tpu.ba import BAProblem, BAConfig, refine_ba, ba_cost
from eacham_tpu.geometry import se3
from tests.conftest import make_synthetic_scene


def _make_problem(rng, poses, pts, intr, uv, pose_noise=0.05, pt_noise=0.05,
                  n_fixed=2, drop=0.0):
    N, L = poses.shape[0], pts.shape[0]
    obs_cam = np.repeat(np.arange(N), L).astype(np.int32)
    obs_pt = np.tile(np.arange(L), N).astype(np.int32)
    obs_uv = uv.reshape(-1, 2)
    obs_mask = np.ones(N * L, dtype=bool)
    if drop:
        obs_mask &= rng.uniform(size=N * L) > drop

    poses_n = poses.copy()
    for i in range(n_fixed, N):
        xi = np.concatenate([
            rng.normal(scale=pose_noise, size=3),
            rng.normal(scale=pose_noise * 2, size=3),
        ])
        poses_n[i] = np.asarray(se3.exp_se3(jnp.asarray(xi, jnp.float32))) @ poses_n[i]
    pts_n = pts + rng.normal(scale=pt_noise, size=pts.shape)

    cam_fixed = np.zeros(N, dtype=bool)
    cam_fixed[:n_fixed] = True

    return BAProblem(
        poses=jnp.asarray(poses_n, jnp.float32),
        points=jnp.asarray(pts_n, jnp.float32),
        intr=jnp.asarray(intr, jnp.float32),
        obs_cam=jnp.asarray(obs_cam),
        obs_pt=jnp.asarray(obs_pt),
        obs_uv=jnp.asarray(obs_uv, jnp.float32),
        obs_mask=jnp.asarray(obs_mask),
        cam_in_ba=jnp.ones(N, dtype=bool),
        cam_fixed=jnp.asarray(cam_fixed),
        pt_in_ba=jnp.ones(L, dtype=bool),
        pt_obs_count=jnp.full((L,), float(N)),
    )


def test_ba_reduces_cost_and_recovers_poses(rng):
    poses, pts, intr, uv = make_synthetic_scene(rng, n_cams=8, n_pts=150)
    prob = _make_problem(rng, poses, pts, intr, uv)
    cfg = BAConfig(max_iters=40, tolerance=1e-8)
    new_poses, new_points, new_intr, info = refine_ba(prob, cfg)
    assert float(info["final_cost"]) < 0.01 * float(info["initial_cost"])
    # fixed cameras untouched
    np.testing.assert_allclose(np.asarray(new_poses[:2]), poses[:2], atol=1e-6)
    # free cameras recovered close to GT (gauge fixed by 2 fixed cams)
    err = np.abs(np.asarray(new_poses) - poses).max()
    assert err < 5e-3, f"pose err {err}"
    pt_err = np.abs(np.asarray(new_points) - pts).max()
    assert pt_err < 2e-2, f"point err {pt_err}"


def test_ba_with_noisy_observations(rng):
    poses, pts, intr, uv = make_synthetic_scene(rng, n_cams=8, n_pts=150, noise=0.5)
    prob = _make_problem(rng, poses, pts, intr, uv)
    new_poses, new_points, new_intr, info = refine_ba(prob, BAConfig(max_iters=40))
    assert float(info["final_cost"]) < float(info["initial_cost"])
    # ~0.5px noise: poses should still come out close
    err = np.abs(np.asarray(new_poses) - poses).max()
    assert err < 2e-2, f"pose err {err}"


def test_ba_masked_observations_ignored(rng):
    poses, pts, intr, uv = make_synthetic_scene(rng, n_cams=6, n_pts=100)
    prob = _make_problem(rng, poses, pts, intr, uv, drop=0.0)
    # corrupt 30% of observations but mask them out
    m = np.asarray(prob.obs_mask).copy()
    idx = rng.choice(len(m), size=int(0.3 * len(m)), replace=False)
    uv_bad = np.asarray(prob.obs_uv).copy()
    uv_bad[idx] += 300.0
    m[idx] = False
    prob = prob._replace(obs_uv=jnp.asarray(uv_bad), obs_mask=jnp.asarray(m))
    new_poses, _, _, info = refine_ba(prob, BAConfig(max_iters=30))
    assert float(info["final_cost"]) < 0.05 * float(info["initial_cost"])
    err = np.abs(np.asarray(new_poses) - poses).max()
    assert err < 1e-2


def test_ba_recovers_focal(rng):
    poses, pts, intr, uv = make_synthetic_scene(rng, n_cams=8, n_pts=200)
    prob = _make_problem(rng, poses, pts, intr, uv, pose_noise=0.0, pt_noise=0.0)
    # perturb focal by 5%
    intr_bad = intr.copy()
    intr_bad[:2] *= 1.05
    prob = prob._replace(intr=jnp.asarray(intr_bad, jnp.float32))
    _, _, new_intr, info = refine_ba(prob, BAConfig(max_iters=40, tolerance=1e-9))
    rec = np.asarray(new_intr)
    assert abs(rec[0] - intr[0]) < 0.02 * intr[0], f"fx {rec[0]} vs {intr[0]}"


def test_ba_cost_matches_manual(rng):
    poses, pts, intr, uv = make_synthetic_scene(rng, n_cams=4, n_pts=50)
    prob = _make_problem(rng, poses, pts, intr, uv, pose_noise=0.0, pt_noise=0.0)
    c = float(ba_cost(prob.poses, prob.points, prob.intr, prob))
    assert c < 1e-4  # exact projections -> ~zero cost


def test_dense_solver_matches_pcg(rng):
    """The materialized reduced-system solver must agree with implicit PCG."""
    from tests.test_parallel import _random_problem
    from eacham_tpu.ba.core import BAConfig, refine_ba
    import numpy as np

    prob, _, _ = _random_problem(np.random.default_rng(3))
    out_p = refine_ba(prob, BAConfig(max_iters=20, cg_iters=30, solver="pcg"))
    out_d = refine_ba(prob, BAConfig(max_iters=20, solver="dense"))
    np.testing.assert_allclose(
        np.asarray(out_p[0]), np.asarray(out_d[0]), atol=1e-2
    )
    assert abs(float(out_p[3]["final_cost"]) - float(out_d[3]["final_cost"])) < max(
        1e-2 * float(out_p[3]["final_cost"]), 1.0
    )


def test_dogleg_converges(rng):
    """The DogLeg trust-region method must reach the same optimum as LM
    (OptimizerConfig::method parity, BundleAdjuster.cpp:182-214)."""
    from tests.test_parallel import _random_problem
    from eacham_tpu.ba.core import BAConfig, refine_ba
    import numpy as np

    prob, _, _ = _random_problem(np.random.default_rng(5))
    out_lm = refine_ba(prob, BAConfig(max_iters=25, solver="dense"))
    out_dl = refine_ba(
        prob, BAConfig(max_iters=40, solver="dense", method="dogleg",
                       trust_radius_init=1.0)
    )
    lm_cost = float(out_lm[3]["final_cost"])
    dl_cost = float(out_dl[3]["final_cost"])
    assert dl_cost < 1.5 * lm_cost + 1.0, (lm_cost, dl_cost)
    assert dl_cost < 0.05 * float(out_dl[3]["initial_cost"])
