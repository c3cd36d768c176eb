"""Pallas kernel tests (interpret mode on the CPU backend)."""

import numpy as np
import jax.numpy as jnp

from eacham_tpu.ops.attention import masked_attention, masked_attention_reference


def test_masked_attention_matches_reference(rng):
    B, H, N, D = 2, 4, 200, 64
    q = jnp.asarray(rng.normal(size=(B, H, N, D)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(B, H, N, D)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(B, H, N, D)).astype(np.float32))
    mask = jnp.asarray(rng.random((B, N)) > 0.3)
    out = masked_attention(q, k, v, mask, interpret=True)
    ref = masked_attention_reference(q, k, v, mask)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_masked_attention_cross_shapes(rng):
    """Cross-attention: Nq != Nk, non-tile-aligned."""
    B, H, Nq, Nk, D = 1, 2, 130, 70, 64
    q = jnp.asarray(rng.normal(size=(B, H, Nq, D)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(B, H, Nk, D)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(B, H, Nk, D)).astype(np.float32))
    mask = jnp.asarray(rng.random((B, Nk)) > 0.5)
    out = masked_attention(q, k, v, mask, interpret=True)
    ref = masked_attention_reference(q, k, v, mask)
    assert out.shape == (B, H, Nq, D)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_masked_attention_fully_masked(rng):
    B, H, N, D = 2, 1, 64, 64
    q = jnp.asarray(rng.normal(size=(B, H, N, D)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(B, H, N, D)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(B, H, N, D)).astype(np.float32))
    mask = jnp.zeros((B, N), bool).at[1].set(True)
    out = masked_attention(q, k, v, mask, interpret=True)
    assert bool(jnp.all(jnp.isfinite(out)))
    assert float(jnp.abs(out[0]).max()) == 0.0


def test_attention_grad(rng):
    """The custom VJP must match autodiff through the reference impl."""
    import jax
    from eacham_tpu.ops.attention import attention, masked_attention_reference

    B, H, N, D = 1, 2, 32, 64
    q = jnp.asarray(rng.normal(size=(B, H, N, D)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(B, H, N, D)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(B, H, N, D)).astype(np.float32))
    mask = jnp.asarray(rng.random((B, N)) > 0.3)

    def loss_custom(q, k, v):
        return jnp.sum(attention(q, k, v, mask) ** 2)

    def loss_ref(q, k, v):
        return jnp.sum(masked_attention_reference(q, k, v, mask) ** 2)

    g1 = jax.grad(loss_custom, argnums=(0, 1, 2))(q, k, v)
    g2 = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)


def test_fused_match_kernel_parity(rng):
    """Pallas fused matcher == jnp matcher, exactly (interpret mode)."""
    from eacham_tpu.ops.match_kernel import match_pair_fused
    from eacham_tpu.features.matching import match_pair

    K1, K2, D = 200, 170, 256
    d2 = rng.normal(size=(K2, D)).astype(np.float32)
    d2 /= np.linalg.norm(d2, axis=1, keepdims=True)
    d1 = np.zeros((K1, D), np.float32)
    d1[:120] = d2[:120] + 0.02 * rng.normal(size=(120, D)).astype(np.float32)
    d1[120:] = rng.normal(size=(K1 - 120, D)).astype(np.float32)
    d1 /= np.linalg.norm(d1, axis=1, keepdims=True)
    m1 = jnp.asarray(rng.random(K1) > 0.15)
    m2 = jnp.asarray(rng.random(K2) > 0.15)

    a_ref, v_ref = match_pair(jnp.asarray(d1), jnp.asarray(d2), m1, m2)
    a_f, v_f = match_pair_fused(jnp.asarray(d1), jnp.asarray(d2), m1, m2,
                                interpret=True)
    np.testing.assert_array_equal(np.asarray(v_ref), np.asarray(v_f))
    v = np.asarray(v_ref)
    np.testing.assert_array_equal(np.asarray(a_ref)[v], np.asarray(a_f)[v])
    assert v.sum() > 50


def test_batched_match_kernel_parity(rng):
    """Batched pair-grid Pallas matcher == jnp match_all_pairs decisions
    (interpret mode; bf16 MXU passes on both sides make near-ties the
    only possible divergence — this fixture has none)."""
    from eacham_tpu.ops.match_kernel import match_pairs_fused
    from eacham_tpu.features.matching import match_all_pairs

    N, K, D = 7, 96, 256
    desc = rng.normal(size=(N, K, D)).astype(np.float32)
    # correlated neighbours so real matches exist
    for i in range(1, N):
        desc[i, : K // 2] = (
            desc[i - 1, : K // 2]
            + 0.02 * rng.normal(size=(K // 2, D)).astype(np.float32)
        )
    desc /= np.linalg.norm(desc, axis=-1, keepdims=True)
    mask = rng.random((N, K)) > 0.1
    pairs = np.array(
        [(i, j) for i in range(N) for j in range(i + 1, N)], np.int32
    )

    d, m, pi = jnp.asarray(desc), jnp.asarray(mask), jnp.asarray(pairs)
    mj_ref, mv_ref, ok_ref = match_all_pairs(
        d, m, pi, chunk=7, backend="jnp")
    mj_f, mv_f = match_pairs_fused(d, m, pi, interpret=True)

    vr = np.asarray(mv_ref)
    vf = np.asarray(mv_f)
    # decision agreement must be overwhelming; allow a handful of
    # bf16-rounding near-tie flips between the two implementations
    agree = (vr == vf).mean()
    assert agree > 0.995, agree
    both = vr & vf
    np.testing.assert_array_equal(
        np.asarray(mj_ref)[both], np.asarray(mj_f)[both])
    assert both.sum() > 100


def test_batched_match_kernel_all_masked(rng):
    """All-False keypoint masks must yield zero matches, not crash."""
    from eacham_tpu.ops.match_kernel import match_pairs_fused

    N, K, D = 3, 64, 256
    desc = rng.normal(size=(N, K, D)).astype(np.float32)
    desc /= np.linalg.norm(desc, axis=-1, keepdims=True)
    mask = np.zeros((N, K), bool)
    pairs = np.array([[0, 1], [1, 2]], np.int32)
    mj, mv = match_pairs_fused(
        jnp.asarray(desc), jnp.asarray(mask), jnp.asarray(pairs),
        interpret=True)
    assert not np.asarray(mv).any()
    assert mj.shape == (2, K)
