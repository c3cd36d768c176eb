"""One-shot numerics + timing check of the Pallas attention kernel on the
real TPU chip (VERDICT r1: the kernel ran in production but its numerics
were only ever asserted in interpret mode on CPU).

Compares `masked_attention` (compiled Pallas) against
`masked_attention_reference` (plain jnp) at LightGlue production shapes,
including padded key slots and fully-masked rows, and times both with
np.asarray fetches. Record the output in SCALING.md.
"""
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from eacham_tpu.ops.attention import (
        masked_attention, masked_attention_reference,
    )

    print(f"platform: {jax.devices()[0].platform}", flush=True)
    rng = np.random.default_rng(0)

    # LightGlue production regime: B image pairs x H heads, N kps, D=64
    for (B, H, N, D) in [(8, 4, 512, 64), (2, 4, 1024, 64)]:
        q = jnp.asarray(rng.normal(size=(B, H, N, D)).astype(np.float32))
        k = jnp.asarray(rng.normal(size=(B, H, N, D)).astype(np.float32))
        v = jnp.asarray(rng.normal(size=(B, H, N, D)).astype(np.float32))
        # ragged live counts per batch element, incl. one fully-dead batch
        counts = rng.integers(1, N + 1, size=B)
        counts[-1] = 0
        mask = jnp.asarray(np.arange(N)[None, :] < counts[:, None])

        out_p = np.asarray(masked_attention(q, k, v, mask))
        out_r = np.asarray(masked_attention_reference(q, k, v, mask))
        err = np.abs(out_p - out_r).max()
        dead = np.abs(out_p[-1]).max()   # fully-masked batch must be zeros
        print(f"[{B}x{H}x{N}x{D}] max|pallas - jnp| = {err:.2e}  "
              f"dead-batch max = {dead:.2e}", flush=True)
        assert err < 5e-5, err
        assert dead == 0.0, dead

        for label, fn in [("pallas", masked_attention),
                          ("jnp   ", masked_attention_reference)]:
            np.asarray(fn(q, k, v, mask))        # compile
            t0 = time.perf_counter()
            for _ in range(20):
                out = fn(q, k, v, mask)
            np.asarray(out)
            dt = (time.perf_counter() - t0) / 20
            print(f"  {label}: {dt * 1e3:8.3f} ms/call", flush=True)

    print("OK", flush=True)


if __name__ == "__main__":
    main()
