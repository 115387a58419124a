"""Pallas TPU kernel: biased set attention for jet-scale sequences.

For particle clouds (T <= a few hundred) the entire (T, T) score matrix of
one (batch, head) pair fits comfortably in VMEM, so instead of a streaming
flash-attention kernel we run one fused block per (batch, head) grid cell:

    HBM -> VMEM:  q, k, v (T, Dh) and the additive bias tile (T, T)
    MXU:          S = Q @ K^T * scale + bias          (fp32 accumulate)
    VPU:          P = softmax(S)  (max-subtracted, fp32)
    MXU:          O = P @ V
    VMEM -> HBM:  O (T, Dh)

The score matrix never touches HBM — the XLA fallback materializes
(B, H, T, T) scores — and the bias is read per-(b, h) tile, supporting a
broadcast head axis without expanding it in memory.

Replaces the reference's flash-attention call
(`networks/attention.py:68-69`) for the D=150 AOJ workload.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array


def _attn_kernel(q_ref, k_ref, v_ref, bias_ref, o_ref, *, scale: float):
    q = q_ref[0, 0].astype(jnp.float32)  # (T, Dh)
    k = k_ref[0, 0].astype(jnp.float32)
    v = v_ref[0, 0].astype(jnp.float32)

    s = jax.lax.dot_general(
        q, k, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (T, T) = Q @ K^T
    s = s * scale
    if bias_ref is not None:
        s = s + bias_ref[0, 0].astype(jnp.float32)

    s_max = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - s_max)
    denom = jnp.sum(p, axis=-1, keepdims=True)
    p = p / denom

    o = jnp.dot(p, v, preferred_element_type=jnp.float32)  # (T, Dh)
    o_ref[0, 0] = o.astype(o_ref.dtype)


def pallas_set_attention(
    q: Array,
    k: Array,
    v: Array,
    bias: Optional[Array] = None,
    *,
    interpret: bool = False,
) -> Array:
    """Fused biased attention. q, k, v: (B, H, T, Dh); bias broadcastable to
    (B, H, T, T) (head and/or batch axes may be 1)."""
    B, H, T, Dh = q.shape
    scale = 1.0 / float(Dh) ** 0.5

    grid = (B, H)

    def qkv_spec():
        return pl.BlockSpec((1, 1, T, Dh), lambda b, h: (b, h, 0, 0),
                            memory_space=pltpu.VMEM)

    in_specs = [qkv_spec(), qkv_spec(), qkv_spec()]
    args = [q, k, v]

    if bias is not None:
        Bb, Hb = bias.shape[0], bias.shape[1]
        in_specs.append(
            pl.BlockSpec(
                (1, 1, T, T),
                lambda b, h, _Bb=Bb, _Hb=Hb: (b if _Bb > 1 else 0, h if _Hb > 1 else 0, 0, 0),
                memory_space=pltpu.VMEM,
            )
        )
        args.append(bias)
        kernel = functools.partial(_attn_kernel, scale=scale)
    else:
        kernel = functools.partial(_bias_free_kernel, scale=scale)

    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, 1, T, Dh), lambda b, h: (b, h, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, H, T, Dh), v.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * B * H * (T * T * Dh * 2),
            bytes_accessed=B * H * T * (3 * Dh + Dh) * q.dtype.itemsize
            + (0 if bias is None else bias.size * bias.dtype.itemsize),
            transcendentals=B * H * T * T,
        ),
        interpret=interpret,
    )(*args)
    return out


def _bias_free_kernel(q_ref, k_ref, v_ref, o_ref, *, scale: float):
    _attn_kernel(q_ref, k_ref, v_ref, None, o_ref, scale=scale)
