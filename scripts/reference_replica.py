"""Faithful CPU replica of the reference SfM driver, for BASELINE measurement.

The reference (fatlipp/eacham) publishes no numbers and its C++ toolchain
(conan + gtsam + opencv-contrib + pangolin) cannot be built in this
environment, so the baseline is MEASURED with this replica: the same
algorithms, parameters, gates and control flow as the reference driver
`/root/reference/apps/sfm/main.cpp:31-269`, expressed with the same
underlying native kernels the reference uses (OpenCV SIFT / FLANN /
findEssentialMat / findHomography / decomposeHomographyMat / recoverPose /
solvePnPRansac via opencv-python, which wraps the identical C++ code), plus
a float64 Schur-complement Levenberg-Marquardt bundle adjuster that
reproduces the reference's GTSAM factor graph structure
(BundleAdjuster.cpp:28-250) since gtsam has no Python build here.

Stage-for-stage mirror:
  extract   — SIFT create(maxFeatures, 3, 0.009, 10, 1.3), threaded like
              the reference's std::execution::par (FeatureExtractorSift.cpp:8,
              main.cpp:72-79)
  match     — FLANN knn k=2 + ratio 0.8, BOTH directions per unordered pair,
              mutual cross-check, >30 gate (FeatureMatcherFlann.cpp:14-30,
              main.cpp:84-147)
  init      — FindBestPair: E (LMEDS 0.99/4.0/1000) vs H (LMEDS 4.0/100)
              inlier ratio 0.9 -> decomposeHomographyMat cheirality sweep or
              recoverPose; DLT triangulation + z>0 / reproj / angle gates;
              both directions must clear min_initial_inliers
              (ReconstructionManager.cpp:47-183, Utils.h:24-68)
  loop      — GetBestPairForValid next-best-view scoring (Graph.h:59-106),
              solvePnPRansac EPNP 10000 it / 4 px / 0.999 with
              min_pnp_inliers both sides (ReconstructionManager.cpp:185-240),
              TriangulateFrame minObs=2, local RefineBA, TriangulateFrame
              minObs=3 (main.cpp:195-225)
  global BA — RefineBA(-1) (main.cpp:227-231)

Run on bench.py's exact workload (same renderer, seed, options) so the
frames/s are directly comparable:

    python scripts/reference_replica.py                 # 100-frame bench
    python scripts/reference_replica.py --frames 500    # stress extrapolation

Writes REFERENCE_FPS at the repo root (consumed by bench.py's vs_baseline)
and BASELINE_MEASURED.json with the per-stage breakdown.
"""

from __future__ import annotations

import argparse
import json
import math
import sys
import time
from concurrent.futures import ThreadPoolExecutor
from pathlib import Path

import cv2
import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


# ---------------------------------------------------------------------------
# data model: Graph / Node / Map (Graph.h, Node.h, Map.h) as plain dicts
# ---------------------------------------------------------------------------

class Node:
    __slots__ = ("id", "kps", "desc", "pose", "valid", "factors",
                 "points3d", "two_view")

    def __init__(self, nid, kps, desc):
        self.id = nid
        self.kps = kps          # [K,2] float32 pixel coords
        self.desc = desc        # [K,256] float32
        self.pose = np.eye(4)   # world->cam, float64 (Node.h "transform")
        self.valid = False
        self.factors = {}       # id2 -> {m1: m2} match dict
        self.points3d = {}      # kp -> landmark id
        self.two_view = {}      # kp -> bool


class SfmMap:
    """Map.h: points + status + observers."""

    def __init__(self):
        self.points = {}        # lm -> xyz (float64 [3])
        self.status = {}        # lm -> bool
        self.observers = {}     # lm -> {frame: kp}
        self._next = 0

    def add(self, p):
        lm = self._next
        self._next += 1
        self.points[lm] = np.asarray(p, np.float64)
        self.status[lm] = True
        self.observers[lm] = {}
        return lm


# ---------------------------------------------------------------------------
# geometry helpers (Triangulator.cpp:21-83, ProjectionHelper.cpp:8-38)
# ---------------------------------------------------------------------------

def convert_to_transform(R, t):
    T = np.eye(4)
    T[:3, :3] = np.asarray(R, np.float64).reshape(3, 3)
    T[:3, 3] = np.asarray(t, np.float64).reshape(3)
    return T


def triangulate_dlt(p1n, p2n, T1, T2):
    """DLT from normalized image points (Triangulator.cpp:49-62)."""
    A = np.empty((4, 4))
    A[1] = p1n[0] * T1[2] - T1[0]
    A[0] = p1n[1] * T1[2] - T1[1]
    A[3] = p2n[0] * T2[2] - T2[0]
    A[2] = p2n[1] * T2[2] - T2[1]
    _, _, Vt = np.linalg.svd(A)
    h = Vt[-1]
    return h[:3] / h[3]


def triangulate_k(p1, p2, K, T2, T1=None):
    fx, fy, cx, cy = K[0, 0], K[1, 1], K[0, 2], K[1, 2]
    p1n = ((p1[0] - cx) / fx, (p1[1] - cy) / fy)
    p2n = ((p2[0] - cx) / fx, (p2[1] - cy) / fy)
    return triangulate_dlt(p1n, p2n, np.eye(4) if T1 is None else T1, T2)


def tri_angle(T1, T2, p):
    """Triangulator.cpp:21-47 (min(angle, pi-angle))."""
    c1 = np.linalg.inv(T1)[:3, 3]
    c2 = np.linalg.inv(T2)[:3, 3]
    r1, r2 = p - c1, p - c2
    n1, n2 = np.linalg.norm(r1), np.linalg.norm(r2)
    if n1 < 1e-7 or n2 < 1e-7:
        return 0.0
    a = math.acos(np.clip(np.dot(r1, r2) / (n1 * n2), -1.0, 1.0))
    return min(a, math.pi - a)


def reproj_err(p2d, p3d_cam, K):
    """ProjectionHelper.cpp:32-38 (pinhole; no cheirality guard)."""
    u = K[0, 0] * p3d_cam[0] / p3d_cam[2] + K[0, 2]
    v = K[1, 1] * p3d_cam[1] / p3d_cam[2] + K[1, 2]
    return math.hypot(p2d[0] - u, p2d[1] - v)


def transform_pt(p, T):
    return T[:3, :3] @ p + T[:3, 3]


# ---------------------------------------------------------------------------
# two-view recovery (ReconstructionManager.cpp:47-183)
# ---------------------------------------------------------------------------

def recover_pose_two_view(node1, node2, K, max_repr, min_angle):
    matches = node1.factors[node2.id]
    m1s = np.fromiter(matches.keys(), np.int64)
    m2s = np.fromiter(matches.values(), np.int64)
    pts1 = node1.kps[m1s].astype(np.float64)
    pts2 = node2.kps[m2s].astype(np.float64)

    E, maskE = cv2.findEssentialMat(
        pts1, pts2, focal=K[0, 0], pp=(K[0, 2], K[1, 2]),
        method=cv2.LMEDS, prob=0.99, threshold=4.0, maxIters=1000)
    e_inl = int(maskE.sum()) if maskE is not None else 0
    H, maskH = cv2.findHomography(pts1, pts2, cv2.LMEDS, 4.0,
                                  maxIters=100, confidence=0.999)
    h_inl = int(maskH.sum()) if maskH is not None else 0
    ratio = (h_inl / e_inl) if (h_inl > 0 and e_inl > 0) else 0.0

    out_matches, out_T = [], None
    if ratio > 0.9 and H is not None:
        n, Rs, ts, _ = cv2.decomposeHomographyMat(H, K)
        best = []
        bestT = None
        for i in range(n):
            T = convert_to_transform(Rs[i], ts[i])
            cur = []
            for m1, m2, p1, p2 in zip(m1s, m2s, pts1, pts2):
                p3 = triangulate_k(p1, p2, K, T)
                if p3[2] <= 0.0:
                    continue
                err = reproj_err(p1, p3, K)
                if err < max_repr and tri_angle(np.eye(4), T, p3) > min_angle:
                    cur.append((int(m1), int(m2), p3))
            if len(cur) > len(best):
                best, bestT = cur, T
        if len(best) > 20:
            out_matches, out_T = best, bestT
    elif E is not None:
        # distanceThresh overload (ReconstructionManager.cpp:150) returns
        # (retval, R, t, mask, triangulatedPoints)
        _, R, t, _, _ = cv2.recoverPose(E, pts1, pts2, K,
                                        distanceThresh=50.0, mask=maskE)
        T = convert_to_transform(R, t)
        for m1, m2, p1, p2 in zip(m1s, m2s, pts1, pts2):
            p3 = triangulate_k(p1, p2, K, T)
            if p3[2] <= 0.0 or tri_angle(np.eye(4), T, p3) < min_angle:
                continue
            if reproj_err(p1, p3, K) < max_repr:
                out_matches.append((int(m1), int(m2), p3))
        out_T = T
    return out_matches, out_T


def find_best_pair(nodes, smap, K, min_init_inliers, max_repr, min_angle):
    """Utils.h:24-68 — first pair clearing the gate in both directions."""
    for id1 in sorted(nodes):
        node1 = nodes[id1]
        for id2 in node1.factors:
            node2 = nodes[id2]
            rec1, T1 = recover_pose_two_view(node1, node2, K, max_repr, min_angle)
            rec2, _ = recover_pose_two_view(node2, node1, K, max_repr, min_angle)
            if len(rec1) > min_init_inliers and len(rec2) > min_init_inliers:
                node1.pose = np.eye(4)
                node1.valid = True
                node2.pose = T1
                node2.valid = True
                for m1, m2, p3 in rec1:
                    lm = smap.add(p3)
                    node1.points3d[m1] = lm
                    node1.two_view[m1] = True
                    node2.points3d[m2] = lm
                    node2.two_view[m2] = True
                    smap.observers[lm][id1] = m1
                    smap.observers[lm][id2] = m2
                return id1, id2
    return None, None


def get_best_pair_for_valid(nodes, excluded):
    """Graph.h:59-106 (ties resolved to the LAST candidate, as the
    reference's `bestScore > count -> continue` does)."""
    best_score, best = 0, (None, None, 0)
    for nid in sorted(nodes):
        node = nodes[nid]
        if not node.valid:
            continue
        for id2, matches in node.factors.items():
            if nodes[id2].valid or id2 in excluded:
                continue
            cnt = sum(1 for m1 in matches
                      if m1 in node.points3d and not node.two_view[m1])
            if best_score > cnt:
                continue
            best_score, best = cnt, (nid, id2, cnt)
    return best


def recover_pose_pnp(node1, node2, smap, K, min_pnp_inliers):
    """ReconstructionManager.cpp:185-240."""
    matches = node1.factors[node2.id]
    p3d, p2d = [], []
    for m1, m2 in matches.items():
        if m1 in node1.points3d:
            p3d.append(smap.points[node1.points3d[m1]])
            p2d.append(node2.kps[m2])
    if len(p2d) < min_pnp_inliers:
        return False
    ok, rvec, tvec, inl = cv2.solvePnPRansac(
        np.asarray(p3d, np.float64), np.asarray(p2d, np.float64), K,
        np.zeros(4), iterationsCount=10000, reprojectionError=4.0,
        confidence=0.999, flags=cv2.SOLVEPNP_EPNP)
    if not ok or inl is None or len(inl) < min_pnp_inliers:
        return False
    R, _ = cv2.Rodrigues(rvec)
    node2.pose = convert_to_transform(R, tvec)
    node2.valid = True
    return True


# ---------------------------------------------------------------------------
# triangulation (Triangulator.cpp:91-303)
# ---------------------------------------------------------------------------

def triangulate_ransac(datas, K, max_repr, min_angle):
    """TriangulatePointRansac: exhaustive-pair consensus."""
    size = len(datas)
    if size < 2:
        return None, None
    if size < 3:
        (p1, T1), (p2, T2) = datas
        p3 = triangulate_k(p1, p2, K, T2, T1)
        if tri_angle(T1, T2, p3) < min_angle:
            return None, None
        inliers = []
        for p2d, T in datas:
            pc = transform_pt(p3, T)
            ok = (reproj_err(p2d, pc, K) < max_repr
                  and np.dot(T[2, :3], p3) + T[2, 3] >= np.finfo(float).eps)
            inliers.append(ok)
        return (p3, inliers) if p3[2] > 0.0 else (None, None)

    best_inl, best_mask, best_p = 0, None, None
    for r1 in range(size):
        for r2 in range(r1 + 1, size):
            p3 = triangulate_k(datas[r1][0], datas[r2][0], K,
                               datas[r2][1], datas[r1][1])
            if tri_angle(datas[r1][1], datas[r2][1], p3) < min_angle:
                continue
            mask = []
            inl = 0
            for p2d, T in datas:
                pc = transform_pt(p3, T)
                ok = (reproj_err(p2d, pc, K) < max_repr
                      and np.dot(T[2, :3], p3) + T[2, 3]
                      >= np.finfo(float).eps)
                mask.append(ok)
                inl += ok
            if inl > best_inl:
                best_inl, best_mask, best_p = inl, mask, p3
    if best_p is not None and best_p[2] > 0.0 and best_inl > 2:
        return best_p, best_mask
    return None, None


def triangulate_frame(fid, nodes, smap, K, min_obs, max_repr, min_angle):
    """TriangulateFrame (Triangulator.cpp:188-303)."""
    cur = nodes[fid]
    tracks = {}  # m1 -> {frame: kp}
    for nid, matches in cur.factors.items():
        nb = nodes[nid]
        if not nb.valid:
            continue
        for m1, m2 in matches.items():
            if m2 in nb.points3d:
                lm = nb.points3d[m2]
                if len(smap.observers[lm]) > 2:
                    pc = transform_pt(smap.points[lm], cur.pose)
                    if reproj_err(cur.kps[m1], pc, K) < max_repr:
                        cur.points3d[m1] = lm
                        cur.two_view[m1] = False
                        smap.observers[lm][fid] = m1
                        continue
            tracks.setdefault(m1, {})[fid] = m1
            tracks[m1][nid] = m2
    added = 0
    for observers in tracks.values():
        if len(observers) < min_obs:
            continue
        datas = [(nodes[f].kps[kp].astype(np.float64), nodes[f].pose)
                 for f, kp in observers.items()]
        p3, mask = triangulate_ransac(datas, K, max_repr, min_angle)
        if p3 is None or not all(mask):
            continue
        lm = smap.add(p3)
        for f, kp in observers.items():
            if kp in nodes[f].points3d:
                old = nodes[f].points3d[kp]
                smap.observers[old].pop(f, None)
                smap.status[old] = False
            nodes[f].points3d[kp] = lm
            nodes[f].two_view[kp] = False
            smap.observers[lm][f] = kp
        added += 1
    return added


# ---------------------------------------------------------------------------
# bundle adjustment — GTSAM factor-structure replica (BundleAdjuster.cpp)
# float64 Schur-complement LM with Ceres-default-style damping.
# ---------------------------------------------------------------------------

def _so3_exp(w):
    th = np.linalg.norm(w)
    Wx = np.array([[0, -w[2], w[1]], [w[2], 0, -w[0]], [-w[1], w[0], 0]])
    if th < 1e-10:
        return np.eye(3) + Wx
    return (np.eye(3) + math.sin(th) / th * Wx
            + (1 - math.cos(th)) / th**2 * (Wx @ Wx))


def _se3_retract(T, xi):
    """GTSAM Pose3::retract (first-order translation coupling is enough
    for the small LM steps here): T * Exp(xi), xi = (omega, v)."""
    E = np.eye(4)
    E[:3, :3] = _so3_exp(xi[:3])
    E[:3, 3] = xi[3:]
    return T @ E


def _huber_w(norms, k):
    """IRLS weights for GTSAM's Huber m-estimator on whitened norms.
    ``k`` may be a scalar or a per-element array."""
    return np.where(norms > k, k / np.maximum(norms, 1e-12), 1.0)


def _huber_rho(norms, k):
    """GTSAM robust error: 0.5 e^2 inside, k|e| - 0.5 k^2 outside."""
    return np.where(norms <= k, 0.5 * norms**2, k * norms - 0.5 * k * k)


class BAProblem:
    """One RefineBA call: local (frame + valid neighbors) or global."""

    SIG_PIX = 1.5          # Isotropic::Sigma(2, 1.5) BundleAdjuster.cpp:91
    HUB_PIX = 3.0          # Huber(3.0)
    SIG_ROT = np.deg2rad(45.0)   # CreateNoise6_2_1(0.35, 45)
    SIG_POS = 0.35
    HUB_POSE = 2.5
    SIG_FIXED = 1e-4
    SIG_K = np.array([25.0, 25.0, 1e-5, 1e-4, 1e-4])  # fx fy s px py

    def __init__(self, frame_ids, nodes, smap, K, fixed_ids):
        self.frame_ids = list(frame_ids)
        self.cam_of = {f: i for i, f in enumerate(self.frame_ids)}
        self.fixed = np.array([f in fixed_ids for f in self.frame_ids])

        lm_ids, obs = [], []
        lm_index = {}
        for f in self.frame_ids:
            node = nodes[f]
            for kp, lm in node.points3d.items():
                if not smap.status[lm] or len(smap.observers[lm]) < 2:
                    continue
                if lm not in lm_index:
                    lm_index[lm] = len(lm_ids)
                    lm_ids.append(lm)
                obs.append((self.cam_of[f], lm_index[lm], node.kps[kp]))
        self.lm_ids = lm_ids
        if not obs:
            self.n_obs = 0
            return
        self.cam_idx = np.array([o[0] for o in obs])
        self.lm_idx = np.array([o[1] for o in obs])
        self.kp2d = np.array([o[2] for o in obs], np.float64)
        self.n_obs = len(obs)

        # state: camera-to-world poses (GTSAM 'x'), landmarks, K(5)
        self.c2w = np.stack([np.linalg.inv(nodes[f].pose)
                             for f in self.frame_ids])
        self.pts = np.stack([smap.points[lm] for lm in lm_ids])
        self.Kp = np.array([K[0, 0], K[1, 1], 0.0, K[0, 2], K[1, 2]])
        # priors anchored at the linearization point of THIS call
        self.prior_c2w = self.c2w.copy()
        self.prior_pts = self.pts.copy()
        self.prior_K = self.Kp.copy()
        self.lm_obs_n = np.array(
            [len(smap.observers[lm]) for lm in lm_ids], np.float64)

    # -- residuals / error ---------------------------------------------------

    def _project(self, c2w, pts, Kp):
        w2c_R = np.transpose(c2w[:, :3, :3], (0, 2, 1))
        cam_c = c2w[:, :3, 3]
        pc = np.einsum("oij,oj->oi", w2c_R[self.cam_idx],
                       pts[self.lm_idx] - cam_c[self.cam_idx])
        z = pc[:, 2]
        u = Kp[0] * pc[:, 0] / z + Kp[2] * pc[:, 1] / z + Kp[3]
        v = Kp[1] * pc[:, 1] / z + Kp[4]
        return pc, np.stack([u, v], 1)

    def error(self, c2w, pts, Kp):
        """GTSAM graph error: sum of robust half-squared whitened norms."""
        _, uv = self._project(c2w, pts, Kp)
        r = (uv - self.kp2d) / self.SIG_PIX
        e = np.sum(_huber_rho(np.linalg.norm(r, axis=1), self.HUB_PIX))
        # pose priors (anchored at prior_c2w; residual via local coords)
        for i in range(len(self.frame_ids)):
            dT = np.linalg.inv(self.prior_c2w[i]) @ c2w[i]
            w = cv2.Rodrigues(dT[:3, :3])[0].ravel()
            dv = dT[:3, 3]
            if self.fixed[i]:
                rn = np.concatenate([w / self.SIG_FIXED, dv / self.SIG_FIXED])
                e += 0.5 * rn @ rn
            else:
                rn = np.concatenate([w / self.SIG_ROT, dv / self.SIG_POS])
                e += float(_huber_rho(np.array([np.linalg.norm(rn)]),
                                      self.HUB_POSE)[0])
        rl = (pts - self.prior_pts) * self.lm_obs_n[:, None]  # sigma = 1/obs
        e += np.sum(_huber_rho(np.linalg.norm(rl, axis=1),
                               self.HUB_PIX / self.lm_obs_n))
        rk = (Kp - self.prior_K) / self.SIG_K
        e += 0.5 * rk @ rk
        return e

    # -- one damped normal-equations solve ------------------------------------

    def solve_step(self, lam):
        C, L = len(self.frame_ids), len(self.pts)
        D = 6 * C + 5
        pc, uv = self._project(self.c2w, self.pts, self.Kp)
        r = (uv - self.kp2d) / self.SIG_PIX                      # whitened
        w = _huber_w(np.linalg.norm(r, axis=1), self.HUB_PIX)
        sw = np.sqrt(w)[:, None]
        x, y, z = pc[:, 0], pc[:, 1], pc[:, 2]
        fx, fy = self.Kp[0], self.Kp[1]
        O = self.n_obs
        # d(uv)/d(pc)
        Jpc = np.zeros((O, 2, 3))
        Jpc[:, 0, 0] = fx / z
        Jpc[:, 0, 2] = -fx * x / z**2
        Jpc[:, 1, 1] = fy / z
        Jpc[:, 1, 2] = -fy * y / z**2
        # d(pc)/d(xi): [pc]_x | -I  (right-multiplied retraction on c2w)
        Jxi = np.zeros((O, 3, 6))
        Jxi[:, 0, 1], Jxi[:, 0, 2] = z, -y
        Jxi[:, 1, 0], Jxi[:, 1, 2] = -z, x
        Jxi[:, 2, 0], Jxi[:, 2, 1] = y, -x
        Jxi[:, :, 3:] = -np.eye(3)
        Jp = np.einsum("oij,ojk->oik", Jpc, Jxi) / self.SIG_PIX * sw[:, :, None]
        # d(pc)/d(p_w) = R_w2c
        Rw2c = np.transpose(self.c2w[:, :3, :3], (0, 2, 1))[self.cam_idx]
        Jl = np.einsum("oij,ojk->oik", Jpc, Rw2c) / self.SIG_PIX * sw[:, :, None]
        # d(uv)/d(K) (fx fy s px py)
        Jk = np.zeros((O, 2, 5))
        Jk[:, 0, 0] = x / z
        Jk[:, 0, 2] = y / z
        Jk[:, 0, 3] = 1.0
        Jk[:, 1, 1] = y / z
        Jk[:, 1, 4] = 1.0
        Jk = Jk / self.SIG_PIX * sw[:, :, None]
        rw = r * sw

        # camera-side compact jacobian: 6 pose cols + 5 K cols
        Jc = np.concatenate([Jp, Jk], axis=2)                 # [O,2,11]
        col = np.concatenate(
            [6 * self.cam_idx[:, None] + np.arange(6)[None, :],
             np.full((O, 5), 6 * C) + np.arange(5)[None, :]], axis=1)

        def _scat2(rows, cols, blocks):
            """dense (D,D) scatter-add via bincount (np.add.at is slow)."""
            flat = (rows * D + cols).ravel()
            return np.bincount(flat, weights=blocks.ravel(),
                               minlength=D * D).reshape(D, D)

        U = _scat2(np.broadcast_to(col[:, :, None], (O, 11, 11)),
                   np.broadcast_to(col[:, None, :], (O, 11, 11)),
                   np.einsum("oic,oid->ocd", Jc, Jc))
        b = -np.bincount(col.ravel(),
                         np.einsum("oic,oi->oc", Jc, rw).ravel(),
                         minlength=D)

        V = np.bincount(
            (self.lm_idx[:, None] * 9 + np.arange(9)[None, :]).ravel(),
            np.einsum("oic,oid->ocd", Jl, Jl).reshape(O, 9).ravel(),
            minlength=L * 9).reshape(L, 3, 3)
        bl = -np.bincount(
            (self.lm_idx[:, None] * 3 + np.arange(3)[None, :]).ravel(),
            np.einsum("oic,oi->oc", Jl, rw).reshape(O, 3).ravel(),
            minlength=L * 3).reshape(L, 3)
        W = np.einsum("oic,oid->ocd", Jc, Jl)                 # [O,11,3]

        # priors --------------------------------------------------------------
        for i in range(C):
            dT = np.linalg.inv(self.prior_c2w[i]) @ self.c2w[i]
            rr = np.concatenate([cv2.Rodrigues(dT[:3, :3])[0].ravel(),
                                 dT[:3, 3]])
            if self.fixed[i]:
                sig = np.full(6, self.SIG_FIXED)
                wp = 1.0
            else:
                sig = np.concatenate([np.full(3, self.SIG_ROT),
                                      np.full(3, self.SIG_POS)])
                wp = _huber_w(np.array([np.linalg.norm(rr / sig)]),
                              self.HUB_POSE)[0]
            sl = slice(6 * i, 6 * i + 6)
            U[sl, sl] += np.diag(wp / sig**2)
            b[sl] += -wp * rr / sig**2
        rl = (self.pts - self.prior_pts) * self.lm_obs_n[:, None]
        wl = _huber_w(np.linalg.norm(rl, axis=1), self.HUB_PIX / self.lm_obs_n)
        V += (wl * self.lm_obs_n**2)[:, None, None] * np.eye(3)
        bl += -(wl * self.lm_obs_n**2)[:, None] * rl
        kq = 1.0 / self.SIG_K**2
        U[6 * C:, 6 * C:] += np.diag(kq)
        b[6 * C:] += -kq * (self.Kp - self.prior_K)

        # damping (diagonal, GTSAM SetCeresDefaults style) ---------------------
        U[np.arange(D), np.arange(D)] *= (1 + lam)
        V[:, np.arange(3), np.arange(3)] *= (1 + lam)

        # Schur elimination of landmarks ---------------------------------------
        Vinv = np.linalg.inv(V)
        WVinv = np.einsum("ocd,ode->oce", W, Vinv[self.lm_idx])  # [O,11,3]
        b -= np.bincount(
            col.ravel(),
            np.einsum("ocd,od->oc", WVinv, bl[self.lm_idx]).ravel(),
            minlength=D)
        # pair products within each landmark
        order = np.argsort(self.lm_idx, kind="stable")
        sor = self.lm_idx[order]
        starts = np.searchsorted(sor, np.arange(L))
        counts = np.bincount(self.lm_idx, minlength=L)
        pa, pb = [], []
        for j in range(L):
            seg = order[starts[j]:starts[j] + counts[j]]
            if len(seg) == 0:
                continue
            g1, g2 = np.meshgrid(seg, seg, indexing="ij")
            pa.append(g1.ravel())
            pb.append(g2.ravel())
        pa = np.concatenate(pa)
        pb = np.concatenate(pb)
        P = len(pa)
        blocks = np.einsum("pce,pde->pcd", WVinv[pa], W[pb])
        U -= _scat2(np.broadcast_to(col[pa][:, :, None], (P, 11, 11)),
                    np.broadcast_to(col[pb][:, None, :], (P, 11, 11)),
                    blocks)

        try:
            dxc = np.linalg.solve(U, b)
        except np.linalg.LinAlgError:
            return None
        dl = np.einsum("lcd,ld->lc", Vinv,
                       bl - _scatter_obs(
                           np.einsum("ocd,oc->od", W, dxc[col]),
                           self.lm_idx, L))
        return dxc, dl

    def apply(self, dxc, dl):
        C = len(self.frame_ids)
        c2w = np.stack([_se3_retract(self.c2w[i], dxc[6 * i:6 * i + 6])
                        for i in range(C)])
        return c2w, self.pts + dl, self.Kp + dxc[6 * C:]


def _scatter_obs(vals, idx, L):
    out = np.zeros((L, vals.shape[1]))
    np.add.at(out, idx, vals)
    return out


def refine_ba(current_fid, nodes, smap, K, fixed_ids,
              max_iter, tol):
    """RefineBA (BundleAdjuster.cpp:40-250). current_fid=None => global."""
    if current_fid is not None:
        frame_ids = [current_fid]
        for nid in nodes[current_fid].factors:
            if nodes[nid].valid:
                frame_ids.append(nid)
    else:
        frame_ids = [nid for nid in sorted(nodes) if nodes[nid].valid]

    prob = BAProblem(frame_ids, nodes, smap, K, fixed_ids)
    if prob.n_obs == 0 or len(prob.lm_ids) < 50:   # cpp:166-169
        return 0
    err = prob.error(prob.c2w, prob.pts, prob.Kp)
    lam, nu = 1e-4, 2.0
    iters = 0
    for _ in range(max_iter):
        step = prob.solve_step(lam)
        iters += 1
        if step is None:
            lam *= nu
            nu *= 2
            continue
        c2w, pts, Kp = prob.apply(*step)
        new_err = prob.error(c2w, pts, Kp)
        if new_err < err:
            decrease = err - new_err
            prob.c2w, prob.pts, prob.Kp = c2w, pts, Kp
            converged = (decrease < tol or
                         (err > 0 and decrease / err < tol))
            err = new_err
            lam = max(lam / 3.0, 1e-16)
            nu = 2.0
            if converged:
                break
        else:
            lam = min(lam * nu, 1e32)
            nu *= 2
            if lam >= 1e32:
                break
    # write back (cpp:221-249)
    K[0, 0], K[1, 1] = prob.Kp[0], prob.Kp[1]
    K[0, 2], K[1, 2] = prob.Kp[3], prob.Kp[4]
    for lm, p in zip(prob.lm_ids, prob.pts):
        smap.points[lm] = p
        smap.status[lm] = True
    for i, f in enumerate(prob.frame_ids):
        nodes[f].pose = np.linalg.inv(prob.c2w[i])
    return iters


# ---------------------------------------------------------------------------
# driver (main.cpp:31-269)
# ---------------------------------------------------------------------------

def run_replica(images_u8, cfg, verbose=True):
    t_stage = {}
    t0 = time.perf_counter()

    # extract (main.cpp:72-79; std::execution::par -> thread pool)
    def _extract(img):
        sift = cv2.SIFT_create(cfg["max_features"], 3, 0.009, 10, 1.3)
        kps, desc = sift.detectAndCompute(img, None)
        return (np.array([k.pt for k in kps], np.float32),
                desc if desc is not None else np.zeros((0, 128), np.float32))

    with ThreadPoolExecutor() as ex:
        feats = list(ex.map(_extract, images_u8))
    nodes = {i: Node(i, kp, d) for i, (kp, d) in enumerate(feats)
             if len(kp) >= cfg["min_features"]}
    t_stage["extract"] = time.perf_counter() - t0

    # match (main.cpp:84-147): both directions, mutual check, >30 gates
    t0 = time.perf_counter()
    ids = sorted(nodes)

    def _match_dir(args):
        i, j = args
        flann = cv2.FlannBasedMatcher()
        knn = flann.knnMatch(nodes[i].desc, nodes[j].desc, k=2)
        return i, j, {m[0].queryIdx: m[0].trainIdx for m in knn
                      if len(m) == 2 and
                      m[0].distance / max(m[1].distance, 1e-12) < 0.8}

    pairs = [(i, j) for a, i in enumerate(ids) for j in ids[a + 1:]]
    tasks = [(i, j) for i, j in pairs] + [(j, i) for i, j in pairs]
    with ThreadPoolExecutor() as ex:
        results = list(ex.map(_match_dir, tasks))
    buf = {}
    for i, j, m in results:
        if len(m) < 30:
            continue
        key = (min(i, j), max(i, j))
        if key not in buf:
            buf[key] = (i, j, m)
            continue
        pi, pj, prev = buf[key]
        # mutual cross-check (main.cpp:130-146)
        fwd = {m1: m2 for m1, m2 in m.items()
               if prev.get(m2) == m1}
        if len(fwd) > 30:
            nodes[i].factors[j] = fwd
            nodes[j].factors[i] = {v: k for k, v in fwd.items()}
    t_stage["match"] = time.perf_counter() - t0

    # K guess (Utils.h:13-22)
    h, w = images_u8[0].shape
    f = 1.2 * max(h, w)
    K = np.array([[f, 0, w / 2], [0, f, h / 2], [0, 0, 1]])

    smap = SfmMap()
    t0 = time.perf_counter()
    id1, id2 = find_best_pair(nodes, smap, K, cfg["min_init_inliers"],
                              cfg["init_max_repr"], cfg["init_min_angle"])
    if id1 is None:
        raise SystemExit("no initial pair")
    fixed_ids = {id1}
    if verbose:
        print(f"# init pair {id1},{id2}: {len(smap.points)} seeds")

    excluded = {id1, id2}
    prev, cur, cnt = get_best_pair_for_valid(nodes, excluded)
    ba_iters = 0
    t_pnp = t_tri = t_ba = 0.0
    while prev is not None:
        ts = time.perf_counter()
        ok = recover_pose_pnp(nodes[prev], nodes[cur], smap, K,
                              cfg["min_pnp_inliers"])
        t_pnp += time.perf_counter() - ts
        if ok:
            ts = time.perf_counter()
            triangulate_frame(cur, nodes, smap, K, 2,
                              cfg["max_repr"], cfg["min_angle"])
            t_tri += time.perf_counter() - ts
            ts = time.perf_counter()
            ba_iters += refine_ba(cur, nodes, smap, K, fixed_ids,
                                  cfg["refine_max_iter"], cfg["refine_tol"])
            t_ba += time.perf_counter() - ts
            ts = time.perf_counter()
            triangulate_frame(cur, nodes, smap, K, 3,
                              cfg["max_repr"], cfg["min_angle"])
            t_tri += time.perf_counter() - ts
            excluded = set()
        prev, cur, cnt = get_best_pair_for_valid(nodes, excluded)
        if prev is None:
            break
        excluded.add(prev)
        excluded.add(cur)
    t_stage["incremental"] = time.perf_counter() - t0
    t_stage["incremental_pnp"] = t_pnp
    t_stage["incremental_triangulate"] = t_tri
    t_stage["incremental_local_ba"] = t_ba

    t0 = time.perf_counter()
    if cfg["global_max_iter"] > 0:
        ba_iters += refine_ba(None, nodes, smap, K, fixed_ids,
                              cfg["global_max_iter"], cfg["global_tol"])
    t_stage["global_ba"] = time.perf_counter() - t0
    return nodes, smap, K, t_stage, ba_iters


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=100)
    ap.add_argument("--max-features", type=int, default=512,
                    help="SIFT cap; reference default is 15000 "
                         "(config/SfmConfig.json), bench uses 512 kps — "
                         "measured at the bench budget for like-for-like")
    ap.add_argument("--min-init-inliers", type=int, default=100,
                    help="reference default 450 at 15000 features; "
                         "bench.py uses 100 at the 512-kp budget")
    ap.add_argument("--min-angle", type=float, default=1.0,
                    help="triangulation angle gate in degrees; reference "
                         "default 3/2 deg, bench.py uses 1.0 on this "
                         "small-baseline orbit workload (SfmOptions "
                         "init_min_tri_angle_deg/min_tri_angle_deg)")
    ap.add_argument("--write", action="store_true",
                    help="write REFERENCE_FPS + BASELINE_MEASURED.json")
    ap.add_argument("--stress", action="store_true",
                    help="use the stress_500 textured-surface orbit "
                         "workload instead of the bench blob orbit")
    args = ap.parse_args()

    rng = np.random.default_rng(0)
    t0 = time.perf_counter()
    if args.stress:
        # EXACT stress workload (scripts/stress_500.py): textured surface
        # world, look-at orbit radius 14, 360*1.04 deg over --frames
        from eacham_tpu.utils.synthetic import make_surface_scene, render_view

        W, H = 512, 384
        f = 1.2 * max(W, H)
        intr = np.array([f, f, W / 2, H / 2], np.float32)
        center = np.array([0.0, 0.0, 9.0], np.float32)
        orbit_r = 14.0
        N = args.frames
        poses_l = []
        for i in range(N):
            a = np.deg2rad(360.0 * 1.04 * i / N)
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
            poses_l.append(T)
        poses_gt = np.stack(poses_l)
        world = make_surface_scene(rng, n_blobs=4000, jitter=0.05)
        images = np.stack([
            render_view(world, T, intr, W, H) for T in poses_gt])
    else:
        import bench
        bench.N_FRAMES = args.frames
        images, poses_gt, intr = bench.render_workload(rng)
    print(f"# rendered {args.frames} frames in {time.perf_counter()-t0:.1f}s",
          flush=True)
    images_u8 = [(im * 255).astype(np.uint8) for im in images]

    cfg = dict(
        max_features=args.max_features, min_features=100,
        min_init_inliers=args.min_init_inliers,
        init_max_repr=4.0, init_min_angle=np.deg2rad(args.min_angle),
        max_repr=8.0, min_angle=np.deg2rad(args.min_angle),
        min_pnp_inliers=15,
        refine_max_iter=100, refine_tol=1e-5,
        global_max_iter=150, global_tol=1e-7,
    )

    t0 = time.perf_counter()
    nodes, smap, K, t_stage, ba_iters = run_replica(images_u8, cfg)
    total = time.perf_counter() - t0

    valid = [i for i in sorted(nodes) if nodes[i].valid]
    est = np.stack([nodes[i].pose for i in valid])
    gt = poses_gt[valid]
    from eacham_tpu.utils.evaluate import ate_rmse
    c_est = -np.einsum("nij,ni->nj", est[:, :3, :3], est[:, :3, 3])
    c_gt = -np.einsum("nij,ni->nj", gt[:, :3, :3], gt[:, :3, 3])
    rmse = float(ate_rmse(c_est, c_gt))

    fps = args.frames / total
    out = {
        "workload": ("stress_" if args.stress else "bench_")
                    + str(args.frames),
        "frames": args.frames,
        "registered": len(valid),
        "landmarks": int(sum(smap.status.values())),
        "ate_rmse": round(rmse, 4),
        "ba_iters": ba_iters,
        "total_s": round(total, 2),
        "fps": round(fps, 4),
        "stages_s": {k: round(v, 2) for k, v in t_stage.items()},
        "max_features": args.max_features,
        "cpus": __import__("os").cpu_count(),
    }
    print(json.dumps(out, indent=2))
    if args.write:
        root = Path(__file__).resolve().parents[1]
        if not args.stress:     # bench.py's vs_baseline is the bench ratio
            (root / "REFERENCE_FPS").write_text(f"{fps:.4f}\n")
        p = root / "BASELINE_MEASURED.json"
        hist = json.loads(p.read_text()) if p.exists() else []
        hist.append(out)
        p.write_text(json.dumps(hist, indent=2))


if __name__ == "__main__":
    main()
