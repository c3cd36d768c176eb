"""Fused masked multi-head attention — Pallas TPU kernel.

The compute core of the LightGlue-class matcher (the reference runs its
attention inside an opaque ONNX graph on CUDA,
modules/onnx/lightglue/feature/FeatureMatcherLightglue.cpp:10-131; here it
is a first-party TPU kernel).

Shape regime: keypoint sets are short (N <= 2048) and head_dim is 64, so
K/V for one (batch, head) fit comfortably in VMEM. The kernel therefore
fuses QK^T -> masked softmax -> PV in one pass per (batch*head, q-tile)
grid cell — one HBM round-trip for K/V, no [N, N] score tensor ever hits
HBM. A flash-style streaming loop would only pay off for much longer
sequences.

Padded keypoint slots are masked: mask_kv=False keys get -inf logits;
fully-masked query rows return zeros (softmax denominator guarded).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Q_TILE = 128
NEG = -1e30


def _attn_kernel(q_ref, k_ref, v_ref, mask_ref, o_ref):
    # q: [Q_TILE, D]; k, v: [N, D]; mask: [1, N] int32 (bool-as-int)
    q = q_ref[:]
    k = k_ref[:]
    v = v_ref[:]
    d = q.shape[-1]
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * (1.0 / (d ** 0.5))                                   # [Q_TILE, N]
    live = mask_ref[0, :] > 0                                # [N]
    s = jnp.where(live[None, :], s, NEG)
    m = jnp.max(s, axis=-1, keepdims=True)                   # [Q_TILE, 1]
    e = jnp.exp(s - m)
    e = jnp.where(live[None, :], e, 0.0)
    denom = jnp.sum(e, axis=-1, keepdims=True)
    p = e / jnp.maximum(denom, 1e-20)
    o_ref[:] = jnp.dot(p, v, preferred_element_type=jnp.float32)


@partial(jax.jit, static_argnames=("interpret",))
def masked_attention(
    q: jnp.ndarray,        # [B, H, Nq, D]
    k: jnp.ndarray,        # [B, H, Nk, D]
    v: jnp.ndarray,        # [B, H, Nk, D]
    mask_kv: jnp.ndarray,  # [B, Nk] bool — live key/value slots
    interpret: bool = False,
):
    """Softmax(QK^T / sqrt(D)) V with key-side masking. Returns [B, H, Nq, D]."""
    B, H, Nq, D = q.shape
    Nk = k.shape[2]
    pad_q = (-Nq) % Q_TILE
    if pad_q:
        q = jnp.pad(q, ((0, 0), (0, 0), (0, pad_q), (0, 0)))
    Nq_p = Nq + pad_q

    qf = q.reshape(B * H, Nq_p, D)
    kf = k.reshape(B * H, Nk, D)
    vf = v.reshape(B * H, Nk, D)
    maskf = jnp.repeat(mask_kv.astype(jnp.int32), H, axis=0)[:, None, :]

    grid = (B * H, Nq_p // Q_TILE)
    out = pl.pallas_call(
        _attn_kernel,
        out_shape=jax.ShapeDtypeStruct((B * H, Nq_p, D), jnp.float32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((None, Q_TILE, D), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, Nk, D), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, Nk, D), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, 1, Nk), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((None, Q_TILE, D), lambda b, i: (b, i, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(qf, kf, vf, maskf)
    return out.reshape(B, H, Nq_p, D)[:, :, :Nq, :]


def masked_attention_reference(q, k, v, mask_kv):
    """jnp reference implementation (for tests and non-TPU fallback)."""
    d = q.shape[-1]
    s = jnp.einsum("bhqd,bhkd->bhqk", q, k) / (d ** 0.5)
    s = jnp.where(mask_kv[:, None, None, :], s, NEG)
    p = jax.nn.softmax(s, axis=-1)
    p = jnp.where(mask_kv[:, None, None, :], p, 0.0)
    return jnp.einsum("bhqk,bhkd->bhqd", p, v)


@jax.custom_vjp
def attention(q, k, v, mask_kv):
    """Backend-dispatching masked attention: the Pallas kernel on TPU, the
    fused-by-XLA jnp path elsewhere (CPU tests, interpret-free).

    Differentiable: the backward pass recomputes the (masked) probabilities
    and propagates standard softmax-attention gradients with einsums —
    Pallas forward + XLA backward (guide pattern "Custom VJP")."""
    if jax.default_backend() == "tpu":
        return masked_attention(q, k, v, mask_kv)
    return masked_attention_reference(q, k, v, mask_kv)


def _attention_fwd(q, k, v, mask_kv):
    return attention(q, k, v, mask_kv), (q, k, v, mask_kv)


def _attention_bwd(res, g):
    q, k, v, mask_kv = res
    d = q.shape[-1]
    scale = 1.0 / (d ** 0.5)
    s = jnp.einsum("bhqd,bhkd->bhqk", q, k) * scale
    s = jnp.where(mask_kv[:, None, None, :], s, NEG)
    p = jax.nn.softmax(s, axis=-1)
    p = jnp.where(mask_kv[:, None, None, :], p, 0.0)
    dv = jnp.einsum("bhqk,bhqd->bhkd", p, g)
    dp = jnp.einsum("bhqd,bhkd->bhqk", g, v)
    ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
    dq = jnp.einsum("bhqk,bhkd->bhqd", ds, k) * scale
    dk = jnp.einsum("bhqk,bhqd->bhkd", ds, q) * scale
    return dq, dk, dv, None


attention.defvjp(_attention_fwd, _attention_bwd)
