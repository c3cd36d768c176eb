"""Streaming (SENSOR-type) incremental reconstruction.

The reference declares a SENSOR modality next to DATASET
(modules/base/data_source/DataSourceTypes.h:7-18, config/ConfigRealsense.
json) but ships no working streaming reconstruction. Here the pipeline
consumes frames AS THEY ARRIVE from any ``FrameSource`` (io/stream.py):

    rec = StreamingReconstructor(image_size=(W, H), max_frames=64)
    while (batch := drain_next_window(source)):
        stats = rec.process(batch_images)      # extract + match + register
    rec.checkpoint("state.npz")                # resumable any time

TPU-first design: every array (frames, pair tables, landmarks) is
PREALLOCATED at ``max_frames`` capacity and masked — arriving frames fill
rows in place, so every jitted stage keeps one static shape across the
whole stream and nothing recompiles per window (the alternative —
re-shaping the scene as N grows — would pay a fresh XLA compile on every
arrival).

Matching is incremental: each new frame is paired with its ``window``
predecessors plus ``retrieval_k`` pooled-descriptor retrievals over all
arrived frames (the same candidate policy as sfm/matches.candidate_pairs),
and only those new pair rows are matched and scattered into the tables.
"""

from __future__ import annotations

from pathlib import Path

import numpy as np
import jax
import jax.numpy as jnp

from eacham_tpu.features.frontend import extract_features
from eacham_tpu.features.matching import match_all_pairs
from eacham_tpu.geometry.camera import intrinsics_from_image_size
from eacham_tpu.sfm.matches import invert_matches
from eacham_tpu.sfm.pipeline import SfmOptions, rank_init_pairs, \
    seed_initial_pair, resume_sfm
from eacham_tpu.sfm.scene import Scene, make_scene
from eacham_tpu.sfm.twoview import find_best_pair


class StreamingReconstructor:
    """Incremental SfM over an arriving frame stream."""

    def __init__(
        self,
        image_size: tuple[int, int],
        intr=None,
        options: SfmOptions = SfmOptions(),
        max_frames: int = 64,
        window: int = 6,
        retrieval_k: int = 2,
        desc_dim: int = 256,
        finalize_every: int = 1,
    ):
        self.image_size = image_size
        self.opt = options
        self.window = window
        self.retrieval_k = retrieval_k
        self.max_frames = max_frames
        # sensor-rate amortization: the global-BA finalize is the
        # superlinear per-window cost (it solves ALL arrived frames); run
        # it on every k-th window only — in between, new frames get the
        # sweep's local-window refinement, which is O(window) per frame.
        # Callers polish on demand with .finalize() at stream end.
        self.finalize_every = max(1, int(finalize_every))
        self._windows_seen = 0
        K = options.max_features
        self.K = K
        N = max_frames
        self.pair_capacity = max_frames * (window + retrieval_k)

        self.desc = np.zeros((N, K, desc_dim), np.float32)   # host mirror
        self.pooled = np.zeros((N, desc_dim), np.float32)
        intr = (jnp.asarray(intr) if intr is not None
                else intrinsics_from_image_size(*image_size))
        P = self.pair_capacity
        self.scene = make_scene(
            keypoints=jnp.zeros((N, K, 2), jnp.float32),
            kp_mask=jnp.zeros((N, K), bool),
            pair_idx=jnp.zeros((P, 2), jnp.int32),
            pair_ok=jnp.zeros((P,), bool),
            match_ij=jnp.zeros((P, K), jnp.int32),
            valid_ij=jnp.zeros((P, K), bool),
            match_ji=jnp.zeros((P, K), jnp.int32),
            valid_ji=jnp.zeros((P, K), bool),
            intr=intr,
            lm_capacity=options.lm_capacity or min(N * K, 1 << 17),
        )
        self.n_frames = 0          # arrived frames
        self.pair_cursor = 0       # filled pair rows
        self.initialized = False
        self.names: list[str] = []

    # ---- internals --------------------------------------------------------

    def _new_pairs(self, first: int, last: int) -> np.ndarray:
        """Candidate pairs touching frames [first, last): window ∪
        retrieval, global frame indices, i < j, padded to a fixed budget."""
        pairs = []
        for j in range(first, last):
            lo = max(0, j - self.window)
            for i in range(lo, j):
                pairs.append((i, j))
            if self.retrieval_k > 0 and j - self.window > 0:
                sims = self.pooled[: j - self.window] @ self.pooled[j]
                k = min(self.retrieval_k, sims.shape[0])
                top = np.argpartition(-sims, k - 1)[:k]
                pairs.extend((int(t), j) for t in top)
        if not pairs:
            return np.zeros((0, 2), np.int32)
        return np.unique(np.asarray(pairs, np.int32), axis=0)

    # ---- public API -------------------------------------------------------

    def process(self, images, names=None, verbose: bool = False) -> dict:
        """Integrate a window of frames: extract, match against the recent
        past, register (and initialize once enough parallax arrives).

        ``images``: [M, H, W] float grayscale in [0, 1].
        Returns the run stats of the post-arrival registration sweep.
        """
        m = int(images.shape[0])
        s = self.n_frames
        if s + m > self.max_frames:
            raise ValueError(
                f"stream capacity exceeded ({s}+{m} > {self.max_frames})"
            )
        self.names.extend(
            names if names is not None else
            [f"frame_{s + i:05d}" for i in range(m)]
        )

        xy, desc, score, mask = extract_features(
            jnp.asarray(images), max_keypoints=self.K
        )
        desc_np = np.asarray(desc)
        mask_np = np.asarray(mask)
        self.desc[s:s + m] = desc_np
        pooled = (desc_np * mask_np[..., None]).sum(1)
        pooled /= np.maximum(
            np.linalg.norm(pooled, axis=-1, keepdims=True), 1e-8)
        self.pooled[s:s + m] = pooled
        self.n_frames = s + m

        sc = self.scene
        sc = sc._replace(
            keypoints=sc.keypoints.at[s:s + m].set(xy),
            kp_mask=sc.kp_mask.at[s:s + m].set(mask),
        )

        # --- match the new candidate pairs only ---------------------------
        new_pairs = self._new_pairs(s, s + m)
        if new_pairs.shape[0]:
            c = self.pair_cursor
            if c + new_pairs.shape[0] > self.pair_capacity:
                raise ValueError("pair capacity exceeded")
            mj, mv, ok = match_all_pairs(
                jnp.asarray(self.desc), sc.kp_mask,
                jnp.asarray(new_pairs),
                ratio=self.opt.match_ratio,
                min_matches=self.opt.min_matches,
                chunk=self.opt.match_chunk,
            )
            mv = mv & ok[:, None]
            mji, mvi = invert_matches(mj, mv)
            e = c + new_pairs.shape[0]
            sc = sc._replace(
                pair_idx=sc.pair_idx.at[c:e].set(jnp.asarray(new_pairs)),
                pair_ok=sc.pair_ok.at[c:e].set(ok),
                match_ij=sc.match_ij.at[c:e].set(mj),
                valid_ij=sc.valid_ij.at[c:e].set(mv),
                match_ji=sc.match_ji.at[c:e].set(mji),
                valid_ji=sc.valid_ji.at[c:e].set(mvi),
            )
            self.pair_cursor = e
        self.scene = sc

        # --- initialize once, then sweep ----------------------------------
        if not self.initialized:
            score_r = np.asarray(
                rank_init_pairs(self.scene, float(max(self.image_size))))
            order = np.argsort(-score_r)
            order = order[score_r[order] > 0]
            if order.size:
                key = jax.random.PRNGKey(self.opt.seed)
                pair_row, init = find_best_pair(
                    key, self.scene, order,
                    min_initial_inliers=self.opt.min_initial_inliers,
                    max_repr_error=self.opt.init_max_repr_error,
                    min_tri_angle=self.opt.init_min_tri_angle,
                    chunk=self.opt.init_chunk,
                    n_hyp_e=self.opt.ransac_hyps_e,
                    n_hyp_h=self.opt.ransac_hyps_h,
                )
                if pair_row is not None:
                    self.scene = seed_initial_pair(
                        self.scene, pair_row, init.T, init.points,
                        init.point_ok)
                    self.initialized = True
        if not self.initialized:
            return {"initialized": False, "registered": 0,
                    "arrived": self.n_frames}

        self._windows_seen += 1
        do_finalize = (self._windows_seen % self.finalize_every == 0)
        self.scene, stats = resume_sfm(
            self.scene, options=self.opt, verbose=verbose,
            finalize=do_finalize)
        stats["arrived"] = self.n_frames
        return stats

    def finalize(self, verbose: bool = False) -> dict:
        """Run the full global-BA finalization on demand (stream end)."""
        self.scene, stats = resume_sfm(
            self.scene, options=self.opt, verbose=verbose, finalize=True)
        stats["arrived"] = self.n_frames
        return stats

    # ---- persistence ------------------------------------------------------

    def checkpoint(self, path: str | Path) -> None:
        from eacham_tpu.io.checkpoint import save_scene

        save_scene(
            path, self.scene,
            n_frames=np.int32(self.n_frames),
            pair_cursor=np.int32(self.pair_cursor),
            initialized=np.bool_(self.initialized),
            desc=self.desc,
            pooled=self.pooled,
            names=np.asarray(self.names),
        )

    @classmethod
    def restore(cls, path: str | Path, image_size, options=SfmOptions(),
                window: int = 6, retrieval_k: int = 2,
                finalize_every: int = 1):
        from eacham_tpu.io.checkpoint import load_scene

        scene, extra = load_scene(path)
        self = cls.__new__(cls)
        self.image_size = image_size
        self.opt = options
        self.window = window
        self.retrieval_k = retrieval_k
        self.finalize_every = max(1, int(finalize_every))
        self._windows_seen = 0
        self.K = scene.kp_mask.shape[1]
        self.max_frames = scene.kp_mask.shape[0]
        self.pair_capacity = scene.pair_idx.shape[0]
        self.scene = scene
        self.desc = extra["desc"]
        self.pooled = extra["pooled"]
        self.n_frames = int(extra["n_frames"])
        self.pair_cursor = int(extra["pair_cursor"])
        self.initialized = bool(extra["initialized"])
        self.names = [str(n) for n in extra["names"]]
        return self
