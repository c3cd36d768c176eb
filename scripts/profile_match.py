"""Per-substage timing of the match-graph build at N=500 (cached features).

Usage: python scripts/profile_match.py  (requires /tmp/feat500.npz from
scripts/bisect_500.py). Each stage is timed twice (compile + steady) with
np.asarray fetches (block_until_ready is a no-op on the tunnel platform).
"""
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np


def main():
    import jax.numpy as jnp
    from eacham_tpu.sfm.matches import (
        build_match_tables, candidate_pairs, invert_matches,
    )
    from eacham_tpu.features.matching import match_all_pairs
    from eacham_tpu.sfm.scene import make_scene, frame_pair_table
    from eacham_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    d = np.load("/tmp/feat500.npz")
    n = int(os.environ.get("PROF_N", 500))
    xy = jnp.asarray(d["xy"][:n])
    desc = jnp.asarray(d["desc"][:n])
    mask = jnp.asarray(d["mask"][:n])
    intr = jnp.asarray(d["intr"])

    def clock(label, thunk, reps=2):
        out = None
        for r in range(reps):
            t0 = time.perf_counter()
            out = thunk()
            import jax
            jax.tree_util.tree_map(
                lambda a: np.asarray(a) if hasattr(a, "shape") else a, out)
            print(f"{label:34s} run{r}: {time.perf_counter() - t0:7.2f} s",
                  flush=True)
        return out

    cand = clock("candidate_pairs", lambda: jnp.asarray(
        candidate_pairs(desc, mask, window=10, retrieval_k=3)))
    print(f"  pairs: {cand.shape[0]}")

    for chunk in (32, 128):
        clock(f"match_all_pairs chunk={chunk}", lambda c=chunk: match_all_pairs(
            desc, mask, cand, ratio=0.85, min_matches=25, chunk=c))

    m_ij, v_ij, pair_ok = match_all_pairs(
        desc, mask, cand, ratio=0.85, min_matches=25, chunk=32)
    v_ij = v_ij & pair_ok[:, None]
    clock("invert_matches", lambda: invert_matches(m_ij, v_ij))
    m_ji, v_ji = invert_matches(m_ij, v_ij)
    clock("make_scene", lambda: make_scene(
        xy, mask, cand, pair_ok, m_ij, v_ij, m_ji, v_ji, intr,
        lm_capacity=65536))
    clock("frame_pair_table (host)", lambda: frame_pair_table(np.asarray(cand), n))


if __name__ == "__main__":
    main()
