"""Self-supervised training for the deep frontend on synthetic scenes.

The reference ships only stripped ONNX weight files
(.MISSING_LARGE_BLOBS); with no network egress the weights cannot be
re-downloaded, so the deep models are trained here from scratch the
MagicPoint/SuperPoint way — on synthetic geometry with exact ground truth
(eacham_tpu.utils.synthetic renders blob fields with known projections):

  * detector: 65-way cell cross-entropy against GT keypoint cells
  * descriptor field: InfoNCE across two views of the same scene —
    corresponding locations attract, all others repel
  * matcher: cross-entropy of the dual-softmax assignment against the GT
    correspondence, + matchability BCE

These produce functional weights for blob-world and a complete, scalable
training path; swap the data generator for real imagery to reach
production quality.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
import optax

from eacham_tpu.features.deep.superpoint import SuperPointNet, CELL
from eacham_tpu.features.deep.lightglue import LightGlueMatcher
from eacham_tpu.utils.synthetic import (
    make_blob_scene, make_texture, photometric_augment, render_view,
)


# --------------------------------------------------------------------------
# data generation
# --------------------------------------------------------------------------

def sample_pair(rng, width=160, height=120, n_blobs=60, max_kps=64,
                world="blob"):
    """Two views of one scene + GT kp locations and correspondence.

    ``world``: "blob" (volumetric field, near-identity poses), "surface"
    (textured-surface sphere from the production orbit shell — the
    stress/robustness domain), or "mix" (50/50 per pair)."""
    f = 1.2 * max(width, height)
    intr = np.array([f, f, width / 2, height / 2], np.float32)
    if world == "mix":
        world = "surface" if rng.random() < 0.5 else "blob"
    if world == "surface":
        from eacham_tpu.utils.synthetic import make_surface_scene

        scene = make_surface_scene(rng, n_blobs=max(n_blobs, 1500))
        center = np.array([0.0, 0.0, 9.0], np.float32)
        a0 = rng.uniform(0, 2 * np.pi)
        da = np.deg2rad(rng.uniform(0.75, 8.0)) * rng.choice([-1.0, 1.0])
        T0 = _orbit_pose(a0, center, 14.0)
        T1 = _orbit_pose(a0 + da, center, 14.0)
    else:
        scene = make_blob_scene(
            rng, n_blobs=n_blobs, depth=(3.0, 7.0), spread=1.3)

        def rand_pose():
            T = np.eye(4, dtype=np.float32)
            a = rng.uniform(-0.06, 0.06)
            c, s = np.cos(a), np.sin(a)
            T[:3, :3] = np.array(
                [[c, 0, -s], [0, 1, 0], [s, 0, c]], np.float32)
            T[:3, 3] = rng.uniform(-0.25, 0.25, 3).astype(np.float32)
            return T

        T0, T1 = rand_pose(), rand_pose()
    img0 = render_view(scene, T0, intr, width, height)
    img1 = render_view(scene, T1, intr, width, height)

    def project(T):
        pc = scene["pts"] @ T[:3, :3].T + T[:3, 3]
        u = f * pc[:, 0] / pc[:, 2] + intr[2]
        v = f * pc[:, 1] / pc[:, 2] + intr[3]
        vis = (pc[:, 2] > 0.5) & (u >= 4) & (u < width - 4) & (v >= 4) & (v < height - 4)
        if world == "surface":
            # occlusion on the sphere: a surface point is visible only
            # from the camera-facing hemisphere (the renderer composites
            # back-to-front, hiding the far side) — without this, half
            # the "GT keypoints" would be invisible and poison the
            # detector labels
            cam = -T[:3, :3].T @ T[:3, 3]
            center = np.array([0.0, 0.0, 9.0], np.float32)
            n_hat = scene["pts"] - center
            vis = vis & (np.sum(n_hat * (cam - scene["pts"]), axis=1) > 0)
        return np.stack([u, v], -1), vis

    uv0, vis0 = project(T0)
    uv1, vis1 = project(T1)
    both = vis0 & vis1
    idx = np.nonzero(both)[0]
    if len(idx) > max_kps:
        idx = rng.choice(idx, size=max_kps, replace=False)
    k = len(idx)
    kp0 = np.zeros((max_kps, 2), np.float32)
    kp1 = np.zeros((max_kps, 2), np.float32)
    kp0[:k] = uv0[idx]
    kp1[:k] = uv1[idx]
    mask = np.arange(max_kps) < k
    return img0, img1, kp0, kp1, mask, (width, height)


def make_batch(rng, batch=8, **kw):
    outs = [sample_pair(rng, **kw) for _ in range(batch)]
    img0 = np.stack([o[0] for o in outs])
    img1 = np.stack([o[1] for o in outs])
    kp0 = np.stack([o[2] for o in outs])
    kp1 = np.stack([o[3] for o in outs])
    mask = np.stack([o[4] for o in outs])
    return img0, img1, kp0, kp1, mask, outs[0][5]


# --------------------------------------------------------------------------
# SuperPoint training
# --------------------------------------------------------------------------

def train_superpoint(steps=200, batch=8, lr=1e-3, seed=0, params=None,
                     log_every=50, trainable=None, anchor_params=None,
                     anchor_weight=20.0, **data_kw):
    """Returns trained params. Fast smoke: steps≈200; real: 10k+.

    ``trainable``: optional set of top-level module names (e.g.
    {"det1", "det2"}) — gradients for every other subtree are zeroed.
    Head-only refreshes keep the descriptor field (and thus a finetuned
    downstream matcher's input domain) bit-identical.

    ``anchor_params``: frozen reference params; when given, an L2
    distillation term (weight ``anchor_weight``) pins the descriptor
    field to the reference's output. Detector improvements (e.g. the
    subpixel bilinear-label loss) then need the full backbone free WITHOUT
    drifting the descriptor domain a finetuned matcher was trained on
    (measured: an unanchored subpix retrain halved localization error but
    cost 0.077 -> 0.34 e2e ATE through matcher domain shift).
    """
    from eacham_tpu.features.deep import superpoint as sp

    rng = np.random.default_rng(seed)
    key = jax.random.PRNGKey(seed)
    if params is None:
        params = sp.init_params(key)
    tx = optax.adam(lr)
    opt_state = tx.init(params)

    def freeze(g):
        if trainable is None:
            return g
        return {"params": {k: (v if k in trainable
                               else jax.tree_util.tree_map(jnp.zeros_like, v))
                           for k, v in g["params"].items()}}

    @jax.jit
    def step(params, opt_state, img0, img1, kp0, kp1, mask):
        def loss_fn(p):
            return _sp_loss(p, img0, img1, kp0, kp1, mask,
                            anchor_params=anchor_params,
                            anchor_weight=anchor_weight)
        (l, aux), g = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt_state = tx.update(freeze(g), opt_state)
        return optax.apply_updates(params, updates), opt_state, l, aux

    losses = []
    for i in range(steps):
        img0, img1, kp0, kp1, mask, size = make_batch(rng, batch=batch, **data_kw)
        params, opt_state, l, aux = step(
            params, opt_state, jnp.asarray(img0), jnp.asarray(img1),
            jnp.asarray(kp0), jnp.asarray(kp1), jnp.asarray(mask))
        losses.append(float(l))
        if log_every and i % log_every == 0:
            print(f"[superpoint] step {i}: loss {float(l):.4f} "
                  f"(det {float(aux['det']):.4f} desc {float(aux['desc']):.4f})",
                  flush=True)
    return params, losses


def _sp_loss(params, img0, img1, kp0, kp1, mask, anchor_params=None,
             anchor_weight=20.0):
    """Loss using the public apply (heatmap + desc field)."""
    from eacham_tpu.features.deep.superpoint import SuperPointNet, CELL, _bilinear_field

    model = SuperPointNet()
    B, H, W = img0.shape

    def side(img, kps):
        heat, desc_field = model.apply(params, img)
        # detector: bilinear cross-entropy against the SUBPIXEL GT location.
        # The target distribution over the 2x2 neighborhood carries the
        # bilinear weights of the true float keypoint, so the learned heat
        # places mass whose local centroid IS the subpixel position — which
        # extract_deep's 3x3 soft-argmax (_soft_refine) then reads out.
        # (An integer gather here caps localization at +-0.5 px and was the
        # deep path's dominant ATE term vs the classical DoG subpixel fit.)
        eps = 1e-8
        def gather(hm, p):
            x = jnp.clip(p[:, 0], 0.0, W - 1.001)
            y = jnp.clip(p[:, 1], 0.0, H - 1.001)
            x0 = jnp.floor(x).astype(jnp.int32)
            y0 = jnp.floor(y).astype(jnp.int32)
            fx, fy = x - x0, y - y0
            lh = jnp.log(jnp.stack(
                [hm[y0, x0], hm[y0, x0 + 1],
                 hm[y0 + 1, x0], hm[y0 + 1, x0 + 1]]) + eps)
            w = jnp.stack([(1 - fy) * (1 - fx), (1 - fy) * fx,
                           fy * (1 - fx), fy * fx])
            return -(w * lh).sum(0)                          # CE per keypoint
        at_kp = jax.vmap(gather)(heat, kps)                  # [B, K]
        det = (at_kp * mask).sum() / jnp.maximum(mask.sum(), 1)

        pts = kps / CELL
        d = jax.vmap(lambda f, p: _bilinear_field(f, p[:, 0], p[:, 1]))(
            desc_field, pts)
        d = d / (jnp.linalg.norm(d, axis=-1, keepdims=True) + 1e-8)
        return det, d, desc_field

    det0, d0, f0 = side(img0, kp0)
    det1, d1, f1 = side(img1, kp1)

    sim = jnp.einsum("bkd,bld->bkl", d0, d1) / 0.07
    live = mask[:, :, None] & mask[:, None, :]
    sim = jnp.where(live, sim, -1e9)
    K = sim.shape[1]
    tgt = jnp.broadcast_to(jnp.arange(K), sim.shape[:2])
    ce_row = optax.softmax_cross_entropy_with_integer_labels(sim, tgt)
    ce_col = optax.softmax_cross_entropy_with_integer_labels(
        sim.transpose(0, 2, 1), tgt)
    m = mask.astype(jnp.float32)
    desc_l = ((ce_row + ce_col) * m).sum() / jnp.maximum(m.sum(), 1.0)
    det = det0 + det1
    anchor_l = 0.0
    if anchor_params is not None:
        _, a0 = model.apply(anchor_params, img0)
        _, a1 = model.apply(anchor_params, img1)
        anchor_l = anchor_weight * 0.5 * (
            ((f0 - jax.lax.stop_gradient(a0)) ** 2).mean()
            + ((f1 - jax.lax.stop_gradient(a1)) ** 2).mean())
    return det + desc_l + anchor_l, {
        "det": det, "desc": desc_l, "anchor": anchor_l}


# --------------------------------------------------------------------------
# LightGlue training
# --------------------------------------------------------------------------

def train_lightglue(steps=300, batch=8, lr=3e-4, n_layers=3, seed=0,
                    params=None, log_every=50, noise=0.5, outlier_frac=0.3,
                    n_kps=64, log=print):
    """Train the matcher on synthetic correspondence sets: GT-corresponding
    keypoints share a (noisy) random descriptor; outliers get fresh ones.
    Loss: CE of the assignment matrix at GT pairs + matchability BCE."""
    from eacham_tpu.features.deep import lightglue as lg

    rng = np.random.default_rng(seed)
    key = jax.random.PRNGKey(seed)
    if params is None:
        params = lg.init_params(key, n_layers=n_layers, n_kps=n_kps)
    model = LightGlueMatcher(n_layers=n_layers)
    sched = optax.warmup_cosine_decay_schedule(
        0.0, lr, warmup_steps=max(50, steps // 20), decay_steps=max(steps, 1)
    )
    tx = optax.chain(optax.clip_by_global_norm(1.0), optax.adam(sched))
    opt_state = tx.init(params)

    def gen(rng, cur_noise, cur_outliers):
        B, N = batch, n_kps
        kp0 = rng.uniform(-1, 1, (B, N, 2)).astype(np.float32)
        # view 2 = slight affine warp of view 1 + jitter, shuffled
        A = np.eye(2) + rng.normal(scale=0.05, size=(B, 1, 2, 2))
        t = rng.normal(scale=0.2, size=(B, 1, 2))
        kp1 = np.einsum("bnij,bnj->bni", np.broadcast_to(A, (B, N, 2, 2)), kp0) + t
        kp1 += rng.normal(scale=0.01, size=kp1.shape)
        d = rng.normal(size=(B, N, 256)).astype(np.float32)
        d /= np.linalg.norm(d, axis=-1, keepdims=True)
        # noise scaled to per-component signal magnitude (1/sqrt(dim)):
        # unscaled unit-variance noise would swamp a unit-norm descriptor
        nscale = cur_noise / np.sqrt(d.shape[-1])
        d0 = d + nscale * rng.normal(size=d.shape).astype(np.float32)
        d1 = d + nscale * rng.normal(size=d.shape).astype(np.float32)
        outlier = rng.random((B, N)) < cur_outliers
        d_out = rng.normal(size=(B, N, 256)).astype(np.float32)
        d1 = np.where(outlier[..., None], d_out, d1)
        d0 /= np.linalg.norm(d0, axis=-1, keepdims=True)
        d1 /= np.linalg.norm(d1, axis=-1, keepdims=True)
        perm = np.stack([rng.permutation(N) for _ in range(B)])
        kp1 = np.take_along_axis(kp1, perm[..., None], 1)
        d1 = np.take_along_axis(d1, perm[..., None], 1)
        # gt[b, i] = position of i's partner in view 2 (or -1 if outlier)
        inv = np.argsort(perm, axis=1)
        gt = np.where(outlier, -1, inv)
        return (kp0.astype(np.float32), d0, kp1.astype(np.float32), d1,
                gt.astype(np.int32))

    @jax.jit
    def step(params, opt_state, kp0, d0, kp1, d1, gt):
        mask = jnp.ones(kp0.shape[:2], bool)

        def loss_fn(p):
            # log-space dual-softmax NLL (stable gradients; the product
            # form p0*p1*m0*m1 barely moves from a cold start)
            sim, m0, m1 = model.apply(
                p, kp0, d0, mask, kp1, d1, mask, method="similarity")
            logp0 = jax.nn.log_softmax(sim, axis=2)
            logp1 = jax.nn.log_softmax(sim, axis=1)
            matched = gt >= 0
            tgt = jnp.maximum(gt, 0)
            pick = lambda lp: jnp.take_along_axis(lp, tgt[..., None], 2)[..., 0]
            nll = -(pick(logp0) + pick(logp1))
            pos = (nll * matched).sum() / jnp.maximum(matched.sum(), 1)
            eps = 1e-7
            bce = -(
                jnp.where(matched, jnp.log(m0 + eps), jnp.log(1 - m0 + eps))
            ).mean()
            return pos + 0.5 * bce, (pos, bce)

        (l, aux), g = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt_state = tx.update(g, opt_state)
        return optax.apply_updates(params, updates), opt_state, l, aux

    losses = []
    warm = max(1, steps // 3)
    for i in range(steps):
        # curriculum: clean first third, then ramp to target difficulty
        ramp = min(1.0, max(0.0, (i - warm) / max(1, steps - 2 * warm)))
        kp0, d0, kp1, d1, gt = gen(rng, 0.1 + ramp * (noise - 0.1),
                                   ramp * outlier_frac)
        params, opt_state, l, aux = step(
            params, opt_state, jnp.asarray(kp0), jnp.asarray(d0),
            jnp.asarray(kp1), jnp.asarray(d1), jnp.asarray(gt))
        losses.append(float(l))
        if log_every and i % log_every == 0:
            log(f"[lightglue] step {i}: loss {float(l):.4f} "
                f"(nll {float(aux[0]):.3f} bce {float(aux[1]):.3f})")
    return params, losses


# --------------------------------------------------------------------------
# LightGlue training on SuperPoint outputs (domain-matched)
# --------------------------------------------------------------------------

def _orbit_pose(a, center, orbit_r):
    """One inward-looking camera on the stress-orbit shell (keep the
    geometry in sync with scripts/stress_500.py / pgo_replay.orbit_gt)."""
    cam = center + orbit_r * np.array(
        [np.sin(a), 0.025 * np.sin(5 * a), -np.cos(a)], np.float32)
    fwd = center - cam
    fwd /= np.linalg.norm(fwd)
    right = np.cross([0.0, 1.0, 0.0], fwd)
    right /= np.linalg.norm(right)
    up = np.cross(fwd, right)
    R = np.stack([right, up, fwd]).astype(np.float32)
    T = np.eye(4, dtype=np.float32)
    T[:3, :3] = R
    T[:3, 3] = -R @ cam
    return T


def sample_image_pair(rng, width=160, height=120, n_blobs=70, textured=True,
                      world="blob"):
    """Two augmented renders of one scene + the scene/pose GT needed to
    label detected-keypoint correspondences.

    ``world``: "blob" = the volumetric textured-blob field (near-identity
    pose pairs); "surface" = the textured-SURFACE sphere viewed from the
    production orbit shell at window-scale angular offsets — the domain
    the robustness matrix and long-trajectory stress runs exercise, on
    which the blob-only r4 matcher collapsed (SCALING.md r4: 120 vs the
    classical 830 verified matches/pair).
    """
    f = 1.2 * max(width, height)
    intr = np.array([f, f, width / 2, height / 2], np.float32)

    if world == "surface":
        from eacham_tpu.utils.synthetic import make_surface_scene

        # n_blobs <= 100 means "the blob-world default leaked through":
        # substitute a production-density sphere. Callers wanting a
        # specific surface density pass it explicitly. Density matters:
        # a detector budget K on a world with V visible blobs yields
        # ~K^2/V co-detected (labelable) pairs — K=64 on V~750 starves
        # the matcher of positives (measured: 3.9 labels/pair, and the
        # matchability head then learns "nothing matches").
        # production appearance density: the stress/robustness worlds run
        # 4000 blobs at 512x384 (0.0203 blobs/px^2) — scale to this render
        scene = make_surface_scene(
            rng, n_blobs=(n_blobs if n_blobs > 500
                          else max(300, int(0.0203 * width * height))))
        if rng.random() < 0.5:
            # stress geometry: inward look-at orbit (rotation mostly
            # cancels; translation-dominant flow), window-scale offsets
            center = np.array([0.0, 0.0, 9.0], np.float32)
            a0 = rng.uniform(0, 2 * np.pi)
            da = (np.deg2rad(rng.uniform(0.75, 8.0))
                  * rng.choice([-1.0, 1.0]))
            T0 = _orbit_pose(a0, center, 14.0)
            T1 = _orbit_pose(a0 + da, center, 14.0)
        else:
            # robustness/bench_deep geometry: orbit_poses near the sphere
            # (rotation-DOMINANT flow between window pairs) — the flow
            # family the surface bench rows actually measure; a matcher
            # trained only on the look-at orbit misses it (measured:
            # 79/69/64 of 100 registered)
            from eacham_tpu.utils.synthetic import orbit_poses

            i = int(rng.integers(0, 90))
            j = i + int(rng.integers(1, 11))
            traj = orbit_poses(j + 1, radius=0.6, step_deg=0.8,
                               advance=0.04)
            T0, T1 = traj[i], traj[j]
    else:
        scene = make_blob_scene(
            rng, n_blobs=n_blobs, depth=(3.0, 7.0), spread=1.3)

        def rand_pose():
            T = np.eye(4, dtype=np.float32)
            a = rng.uniform(-0.08, 0.08)
            c, s = np.cos(a), np.sin(a)
            T[:3, :3] = np.array(
                [[c, 0, -s], [0, 1, 0], [s, 0, c]], np.float32)
            T[:3, 3] = rng.uniform(-0.3, 0.3, 3).astype(np.float32)
            return T

        T0, T1 = rand_pose(), rand_pose()
    bg0 = make_texture(rng, height, width) if textured else None
    bg1 = make_texture(rng, height, width) if textured else None
    img0 = render_view(scene, T0, intr, width, height, background=bg0)
    img1 = render_view(scene, T1, intr, width, height, background=bg1)
    img0 = photometric_augment(img0, rng)
    img1 = photometric_augment(img1, rng)
    return img0, img1, scene, T0, T1, intr


def _label_correspondence(xy0, m0, xy1, m1, scene, T0, T1, intr, tol=3.0,
                          assoc_r=10.0):
    """gt[i] = index of xy0[i]'s true partner among the DETECTED xy1 (or
    -1), by FLOW TRANSFER through each keypoint's governing blob.

    The renderer's blobs are pixel-anchored sprites (their sinusoidal
    texture lives in blob-local PIXEL coordinates), so every texture
    feature at offset (dx, dy) from its blob's center reappears at the
    SAME offset in the other view — the true correspondence of a detected
    keypoint is kp + (proj1(g) - proj0(g)) for its governing blob g.
    The r4 scheme instead required detections to sit ON blob centers
    (<= 3 px) in BOTH views; on dense surface worlds detections are
    texture corners between centers, which starved the labels (measured:
    3.9 labels per 64-kp pair — and a matcher trained on that learns
    "nothing matches", surface recall 0.10)."""
    def project(T):
        pc = scene["pts"] @ T[:3, :3].T + T[:3, 3]
        z = np.maximum(pc[:, 2], 1e-6)
        u = intr[0] * pc[:, 0] / z + intr[2]
        v = intr[1] * pc[:, 1] / z + intr[3]
        good = pc[:, 2] > 0.5
        if "center" in scene:
            # surface world: only the camera-facing hemisphere is rendered
            cam = -T[:3, :3].T @ T[:3, 3]
            n_hat = scene["pts"] - scene["center"]
            good = good & (np.sum(n_hat * (cam - scene["pts"]), axis=1) > 0)
        return np.stack([u, v], -1), good

    proj0, vis0 = project(T0)
    proj1, vis1 = project(T1)
    xy0 = np.asarray(xy0)
    xy1 = np.asarray(xy1)
    m0 = np.asarray(m0)
    m1 = np.asarray(m1)

    # governing blob of each view-0 keypoint: nearest visible projection
    d0 = np.linalg.norm(xy0[:, None, :] - proj0[None, :, :], axis=-1)
    d0 = np.where(vis0[None, :], d0, np.inf)
    g = np.argmin(d0, axis=1)
    ok = (d0[np.arange(len(xy0)), g] < assoc_r) & m0 & vis1[g]

    # predicted partner position in view 1 (rigid sprite translation)
    pred = xy0 + proj1[g] - proj0[g]
    d1 = np.linalg.norm(pred[:, None, :] - xy1[None, :, :], axis=-1)
    d1 = np.where(m1[None, :], d1, np.inf)
    j = np.argmin(d1, axis=1)
    ok = ok & (d1[np.arange(len(xy0)), j] < tol)
    return np.where(ok, j, -1).astype(np.int32)


def render_pair_batch(rng, batch=8, width=160, height=120, n_blobs=70,
                      textured=True, world="blob"):
    """``batch`` rendered training pairs (the host-CPU half of
    make_sp_batch — safe to run in worker processes: numpy only).

    Blob density is RESOLUTION-ADAPTIVE: the orbit/FOV geometry is
    resolution-independent, so matching the production bench's local
    appearance means matching blobs per PIXEL, not per scene — the
    default n_blobs scales with render area (70 @ 160x120 equivalent)."""
    n_eff = max(30, int(round(n_blobs * (width * height) / (160 * 120))))

    def pick_world():
        if world == "mix":
            return "surface" if rng.random() < 0.5 else "blob"
        return world

    return [sample_image_pair(rng, width, height, n_eff, textured,
                              world=pick_world())
            for _ in range(batch)]


def _pool_worker_init():
    """Initializer for data-rendering worker processes: force any jax
    import onto CPU so workers can never grab the (single) TPU the
    training step owns."""
    import os
    os.environ["JAX_PLATFORMS"] = "cpu"


def _render_pairs_task(args):
    seed, batch, width, height, n_blobs, textured, world = args
    rng = np.random.default_rng(seed)
    return render_pair_batch(rng, batch, width, height, n_blobs,
                             textured, world)


def make_sp_batch(sp_params, rng, batch=8, width=160, height=120,
                  n_blobs=70, max_kps=64, textured=True, world="blob",
                  pairs=None):
    """A LightGlue training batch whose keypoints/descriptors come from the
    ACTUAL SuperPoint forward pass — the domain the matcher sees in
    production (closing the random-descriptor gap of train_lightglue).
    ``world="mix"`` draws each pair 50/50 from the blob and surface
    domains (see sample_image_pair). ``pairs``: pre-rendered output of
    render_pair_batch (e.g. from a worker pool) — extraction + labeling
    still happen here."""
    from eacham_tpu.features.deep.frontend import extract_deep_batch

    if pairs is None:
        pairs = render_pair_batch(rng, batch, width, height, n_blobs,
                                  textured, world)
    batch = len(pairs)
    imgs = np.stack([p[0] for p in pairs] + [p[1] for p in pairs])
    xy, desc, score, mask = extract_deep_batch(
        sp_params, jnp.asarray(imgs), max_keypoints=max_kps)
    xy, desc = np.asarray(xy), np.asarray(desc)
    mask = np.array(mask)          # writable copy (np.asarray of a jax
    score_np = np.asarray(score)   # array is a read-only view)
    # per-world keypoint budget: a blob-world frame holds only ~70-140
    # true features — forcing the full max_kps there fills 3/4 of the
    # slots with background-texture junk, and a matcher trained on that
    # junk loses precision on the CLEAN blob bench (measured e2e: blob
    # median ATE 0.047 -> 0.22 on the uniform-K mix run). Blob pairs keep
    # their top-half by detector score; surface worlds keep everything.
    kp_budget = max_kps // 2
    for b, (_, _, sc, _, _, _) in enumerate(pairs):
        if "center" not in sc and kp_budget < max_kps:
            for side in (b, batch + b):
                order = np.argsort(-score_np[side])
                keep = np.zeros(max_kps, bool)
                keep[order[:kp_budget]] = True
                mask[side] &= keep
    gts = []
    for b, (i0, i1, scene, T0, T1, intr) in enumerate(pairs):
        gts.append(_label_correspondence(
            xy[b], mask[b], xy[batch + b], mask[batch + b],
            scene, T0, T1, intr))
    kp0, kp1 = xy[:batch], xy[batch:]
    # normalize keypoints to ~[-1, 1] (Tools2d.h:25-45 convention)
    from eacham_tpu.features.deep.lightglue import normalize_keypoints
    kp0 = np.asarray(normalize_keypoints(
        jnp.asarray(kp0), float(width), float(height)))
    kp1 = np.asarray(normalize_keypoints(
        jnp.asarray(kp1), float(width), float(height)))
    return (kp0, desc[:batch], mask[:batch],
            kp1, desc[batch:], mask[batch:], np.stack(gts))


def train_lightglue_sp(sp_params, steps=300, batch=8, lr=2e-4, n_layers=3,
                       seed=0, params=None, n_kps=64, log_every=25,
                       width=160, height=120, log=print, world="blob",
                       workers=0):
    """Train (or fine-tune) the matcher on SuperPoint-extracted features
    from rendered pairs. Pass ``params`` (e.g. the random-descriptor
    pretrain) to fine-tune; None trains from scratch."""
    from eacham_tpu.features.deep import lightglue as lg

    rng = np.random.default_rng(seed)
    key = jax.random.PRNGKey(seed)
    if params is None:
        params = lg.init_params(key, n_layers=n_layers, n_kps=n_kps)
    model = LightGlueMatcher(n_layers=n_layers)
    warmup = min(max(20, steps // 20), max(steps // 2, 1))
    sched = optax.warmup_cosine_decay_schedule(
        0.0, lr, warmup_steps=warmup,
        decay_steps=max(steps, warmup + 1), end_value=lr * 0.2,
    )
    tx = optax.chain(optax.clip_by_global_norm(1.0), optax.adam(sched))
    opt_state = tx.init(params)

    @jax.jit
    def step(params, opt_state, kp0, d0, m0, kp1, d1, m1, gt):
        def loss_fn(p):
            sim, mt0, mt1 = model.apply(
                p, kp0, d0, m0, kp1, d1, m1, method="similarity")
            logp0 = jax.nn.log_softmax(
                jnp.where(m1[:, None, :], sim, -1e9), axis=2)
            logp1 = jax.nn.log_softmax(
                jnp.where(m0[:, :, None], sim, -1e9), axis=1)
            matched = gt >= 0
            tgt = jnp.maximum(gt, 0)
            pick = lambda lp: jnp.take_along_axis(lp, tgt[..., None], 2)[..., 0]
            nll = -(pick(logp0) + pick(logp1))
            pos = (nll * matched).sum() / jnp.maximum(matched.sum(), 1)
            eps = 1e-7
            bce = -jnp.where(
                matched, jnp.log(mt0 + eps),
                jnp.where(m0, jnp.log(1 - mt0 + eps), 0.0)
            ).sum() / jnp.maximum(m0.sum(), 1)
            return pos + 0.5 * bce, (pos, bce)

        (l, aux), g = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt_state = tx.update(g, opt_state)
        return optax.apply_updates(params, updates), opt_state, l, aux

    # data pipeline: rendering is host-CPU-bound (surface worlds paint
    # ~1500 blobs/view) while the step runs on device — a small process
    # pool renders ahead with a BOUNDED window so memory stays flat
    pool = None
    pending = []
    if workers > 0:
        from multiprocessing import get_context

        pool = get_context("spawn").Pool(workers,
                                         initializer=_pool_worker_init)
        task_seeds = rng.integers(2 ** 31, size=steps)

        def submit(i):
            pending.append(pool.apply_async(_render_pairs_task, (
                (int(task_seeds[i]), batch, width, height, 70, True, world),)))

        for i in range(min(2 * workers, steps)):
            submit(i)

    losses = []
    try:
        for i in range(steps):
            if pool is not None:
                pairs = pending.pop(0).get()
                nxt = i + 2 * workers
                if nxt < steps:
                    submit(nxt)
            else:
                pairs = None
            kp0, d0, m0, kp1, d1, m1, gt = make_sp_batch(
                sp_params, rng, batch=batch, width=width, height=height,
                max_kps=n_kps, world=world, pairs=pairs)
            params, opt_state, l, aux = step(
                params, opt_state, jnp.asarray(kp0), jnp.asarray(d0),
                jnp.asarray(m0), jnp.asarray(kp1), jnp.asarray(d1),
                jnp.asarray(m1), jnp.asarray(gt))
            losses.append(float(l))
            if log_every and i % log_every == 0:
                log(f"[lightglue-sp] step {i}: loss {float(l):.4f} "
                    f"(nll {float(aux[0]):.3f} bce {float(aux[1]):.3f})")
    finally:
        if pool is not None:
            pool.terminate()
            pool.join()
    return params, losses
