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
