"""Masked set attention for padded particle clouds.

This is the hot op of the framework: non-causal multi-head attention over
D <= 150 particles with an additive (B, H, D, D) bias that carries both the
pad-pair mask and optional learned pairwise terms (token co-occurrence /
Lund observables).  Replaces the reference's call into
`torch.nn.functional.scaled_dot_product_attention`
(`networks/attention.py:68-69`).

Two implementations:
- `xla`:    einsum + fp32 softmax; XLA fuses bias-add and softmax into the
            matmuls. Correctness reference.
- `pallas`: single-block VMEM kernel per (batch*head) — for jet-scale
            sequences the whole score matrix fits in VMEM, so flash-style
            online softmax is unnecessary; one MXU pass for Q@K^T and one
            for P@V with the softmax in between, never spilling scores to
            HBM. (See `ops/pallas_attention.py`.)

Shapes: q, k, v are (B, H, T, Dh); bias is broadcastable to (B, H, T, T).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp

Array = jax.Array

_IMPL_DEFAULT = "auto"


def set_default_impl(impl: str) -> None:
    global _IMPL_DEFAULT
    assert impl in ("auto", "xla", "pallas")
    _IMPL_DEFAULT = impl


def _xla_attention(q: Array, k: Array, v: Array, bias: Optional[Array]) -> Array:
    dh = q.shape[-1]
    scale = 1.0 / jnp.sqrt(jnp.asarray(dh, jnp.float32))
    scores = jnp.einsum("bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32)
    scores = scores * scale
    if bias is not None:
        scores = scores + bias.astype(scores.dtype)
    probs = jax.nn.softmax(scores, axis=-1)
    out = jnp.einsum("bhqk,bhkd->bhqd", probs.astype(v.dtype), v,
                     preferred_element_type=jnp.float32)
    return out.astype(v.dtype)


def multihead_attention(
    q: Array,
    k: Array,
    v: Array,
    bias: Optional[Array] = None,
    *,
    impl: Optional[str] = None,
) -> Array:
    """Scaled dot-product attention with an additive bias.

    `impl='auto'` picks the Pallas kernel on TPU for supported shapes and
    falls back to the XLA path elsewhere (CPU tests, exotic shapes).
    """
    impl = impl or _IMPL_DEFAULT
    if impl == "auto":
        # XLA's batched attention keeps the MXU busy across the whole
        # (B*H) batch; a Pallas grid executes sequentially per step, so a
        # kernel is only worth it with large per-step blocks (see
        # ops/pallas_attention.py for the batched-block variant).
        impl = "xla"
    if impl == "pallas":
        from multimodal_flows_tpu.ops.pallas_attention import pallas_set_attention

        return pallas_set_attention(q, k, v, bias)
    return _xla_attention(q, k, v, bias)
