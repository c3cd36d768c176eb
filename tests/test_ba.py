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


def test_memory_shaped_segment_sums_match_reference():
    """The chunk-scan outer products and transposed-scatter vector sums
    (the KITTI-scale memory fix, r3) must equal plain segment_sum."""
    import jax
    from eacham_tpu.ba.core import (
        _SEG_CHUNK, _seg_outer, _seg_outer_t, _seg_vec, _seg_vec_t,
    )

    rng = np.random.default_rng(0)
    O, n = 2 * _SEG_CHUNK + 777, 37          # forces the chunked path + pad
    J1 = rng.normal(size=(O, 2, 6)).astype(np.float32)
    J2 = rng.normal(size=(O, 2, 6)).astype(np.float32)
    t = rng.normal(size=(O, 2)).astype(np.float32)
    idx = rng.integers(0, n, O).astype(np.int32)

    ref_outer = jax.ops.segment_sum(
        jnp.einsum("oki,okj->oij", J1, J2), jnp.asarray(idx), num_segments=n)
    ref_vec = jax.ops.segment_sum(
        jnp.einsum("oki,ok->oi", J1, t), jnp.asarray(idx), num_segments=n)

    got = _seg_outer(jnp.asarray(J1), jnp.asarray(J2), jnp.asarray(idx),
                     n, None)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref_outer),
                               rtol=1e-5, atol=1e-3)
    got = _seg_vec(jnp.asarray(J1), jnp.asarray(t), jnp.asarray(idx), n, None)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref_vec),
                               rtol=1e-5, atol=1e-3)
    # transposed variants ([k, a, O] Jacobians, [k, O] residuals)
    got = _seg_outer_t(jnp.asarray(J1.transpose(1, 2, 0)),
                       jnp.asarray(J2.transpose(1, 2, 0)),
                       jnp.asarray(idx), n, None)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref_outer),
                               rtol=1e-5, atol=1e-3)
    got = _seg_vec_t(jnp.asarray(J1.transpose(1, 2, 0)), jnp.asarray(t.T),
                     jnp.asarray(idx), n, None)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref_vec),
                               rtol=1e-5, atol=1e-3)


def test_obs_linearize_t_matches_standard():
    """Transposed linearization is the same math as the standard layout."""
    from eacham_tpu.ba.core import _obs_linearize, _obs_linearize_t

    prob, poses_gt, pts_gt = None, None, None
    rng = np.random.default_rng(1)
    N, L, O = 5, 60, 300
    pts = (rng.uniform(-1, 1, (L, 3)) + [0, 0, 5]).astype(np.float32)
    poses = np.tile(np.eye(4, dtype=np.float32), (N, 1, 1))
    poses[:, :3, 3] = rng.normal(scale=0.2, size=(N, 3))
    from eacham_tpu.ba.core import BAProblem

    oc = rng.integers(0, N, O).astype(np.int32)
    op = rng.integers(0, L, O).astype(np.int32)
    uv = rng.uniform(0, 640, (O, 2)).astype(np.float32)
    p = BAProblem(
        poses=jnp.asarray(poses), points=jnp.asarray(pts),
        intr=jnp.asarray([500.0, 500.0, 320.0, 240.0], jnp.float32),
        obs_cam=jnp.asarray(oc), obs_pt=jnp.asarray(op),
        obs_uv=jnp.asarray(uv), obs_mask=jnp.ones(O, bool),
        cam_in_ba=jnp.ones(N, bool), cam_fixed=jnp.zeros(N, bool),
        pt_in_ba=jnp.ones(L, bool), pt_obs_count=jnp.full(L, 5.0),
    )
    r, Jc, Jp, Jk, w = _obs_linearize(p.poses, p.points, p.intr, p)
    r_t, Jc_t, Jp_t, Jk_t, w_t = _obs_linearize_t(p.poses, p.points, p.intr, p)
    np.testing.assert_allclose(np.asarray(r), np.asarray(r_t).T, atol=1e-5)
    np.testing.assert_allclose(np.asarray(Jc),
                               np.asarray(Jc_t).transpose(2, 0, 1), atol=1e-4)
    np.testing.assert_allclose(np.asarray(Jp),
                               np.asarray(Jp_t).transpose(2, 0, 1), atol=1e-4)
    np.testing.assert_allclose(np.asarray(w), np.asarray(w_t), atol=1e-6)


def _rigid_warp(angle=0.06, trans=(0.2, -0.15, 0.1)):
    """A world-frame rigid transform W — pure gauge motion: applying
    T' = T W^-1, X' = W X leaves every reprojection identical."""
    c, s = np.cos(angle), np.sin(angle)
    W = np.eye(4, dtype=np.float32)
    W[:3, :3] = np.array([[c, -s, 0], [s, c, 0], [0, 0, 1]], np.float32)
    W[:3, 3] = np.asarray(trans, np.float32)
    return W


def test_absolute_anchors_recover_gauge_warp(rng):
    """Absolute pose anchors (BAProblem.abs_pose/abs_mask) must pull the
    whole reconstruction out of a drift mode that reprojection cannot see.

    The probe is the extreme case: a global rigid warp (the gauge) leaves
    the reprojection cost EXACTLY invariant, so no amount of unanchored
    BA can undo it — while 3 anchored cameras must drag every camera and
    landmark back to the true frame through the reprojection coupling.
    This is the measurement class the SCALING.md 1000-frame observability
    analysis calls for (GPS priors / surveyed cameras); the reference has
    no equivalent (BundleAdjuster.cpp priors anchor only to the estimate
    itself).
    """
    poses, pts, intr, uv = make_synthetic_scene(rng, n_cams=8, n_pts=150)
    W = _rigid_warp()
    W_inv = np.linalg.inv(W)
    poses_w = np.einsum("nij,jk->nik", poses, W_inv)
    pts_w = pts @ W[:3, :3].T + W[:3, 3]

    N, L = poses.shape[0], pts.shape[0]
    base = BAProblem(
        poses=jnp.asarray(poses_w, jnp.float32),
        points=jnp.asarray(pts_w, jnp.float32),
        intr=jnp.asarray(intr, jnp.float32),
        obs_cam=jnp.asarray(np.repeat(np.arange(N), L).astype(np.int32)),
        obs_pt=jnp.asarray(np.tile(np.arange(L), N).astype(np.int32)),
        obs_uv=jnp.asarray(uv.reshape(-1, 2), jnp.float32),
        obs_mask=jnp.ones(N * L, dtype=bool),
        cam_in_ba=jnp.ones(N, dtype=bool),
        cam_fixed=jnp.zeros(N, dtype=bool),   # free gauge
        pt_in_ba=jnp.ones(L, dtype=bool),
        pt_obs_count=jnp.full((L,), float(N)),
    )
    warp_err = np.abs(poses_w - poses).max()
    assert warp_err > 0.1   # the warp is substantial

    # without anchors the warped frame is a (near-)global optimum: BA
    # must NOT move back toward the true frame
    cfg = BAConfig(max_iters=30, tolerance=1e-10)
    up, _, _, _ = refine_ba(base, cfg)
    assert np.abs(np.asarray(up) - poses).max() > 0.5 * warp_err

    # anchor 3 spread-out cameras to their TRUE poses
    mask = np.zeros(N, dtype=bool)
    mask[[0, N // 2, N - 1]] = True
    prob = base._replace(
        abs_pose=jnp.asarray(poses, jnp.float32),
        abs_mask=jnp.asarray(mask),
    )
    for solver in ("dense", "pcg"):
        new_poses, new_points, _, info = refine_ba(
            prob, BAConfig(max_iters=60, tolerance=1e-12, solver=solver))
        err = np.abs(np.asarray(new_poses) - poses).max()
        assert err < 0.02 * warp_err, f"{solver}: pose err {err} vs warp {warp_err}"
        pt_err = np.abs(np.asarray(new_points) - pts).max()
        assert pt_err < 0.05, f"{solver}: point err {pt_err}"


def test_absolute_anchors_ignore_garbage_unanchored_rows(rng):
    """Unanchored abs_pose rows may hold zeros (singular): the masked
    prior must stay finite (regression: inv(0) -> NaN poisoned the whole
    solve through 0 * NaN)."""
    poses, pts, intr, uv = make_synthetic_scene(rng, n_cams=6, n_pts=80)
    prob = _make_problem(rng, poses, pts, intr, uv)
    anchors = np.zeros((6, 4, 4), np.float32)
    anchors[0] = poses[0]
    mask = np.zeros(6, bool)
    mask[0] = True
    prob = prob._replace(abs_pose=jnp.asarray(anchors),
                         abs_mask=jnp.asarray(mask))
    new_poses, new_points, _, info = refine_ba(prob, BAConfig(max_iters=15))
    assert np.isfinite(np.asarray(new_poses)).all()
    assert np.isfinite(float(info["final_cost"]))
    assert float(info["final_cost"]) < float(info["initial_cost"])
