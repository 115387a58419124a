"""Masked set attention for padded particle clouds.

This is the hot op of the framework: non-causal multi-head attention over
D <= 150 particles.  Masking enters as a compact additive key-mask (B, T)
(pad keys get -1e9); learned pairwise terms (token co-occurrence / Lund)
enter as an additive (B, H|1, T, T) bias.  Replaces the reference's call
into `torch.nn.functional.scaled_dot_product_attention`
(`networks/attention.py:68-69`).

Implementations:
- `xla`:    einsum + fp32 softmax.  Correctness reference; used on CPU and
            for exotic shapes.  Materializes (B, H, T, T) scores in HBM.
- `pallas`: batched-block VMEM kernel (`ops/pallas_attention.py`) — scores
            never leave VMEM; custom VJP recomputes the backward in XLA.

Shapes: q, k, v are (B, H, T, Dh); key_mask (B, T); bias broadcastable to
(B, H, T, T).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

Array = jax.Array

_IMPL_DEFAULT = "auto"


def set_default_impl(impl: str) -> None:
    global _IMPL_DEFAULT
    assert impl in ("auto", "xla", "pallas")
    _IMPL_DEFAULT = impl


def _xla_attention(q: Array, k: Array, v: Array, bias: Optional[Array],
                   key_mask: Optional[Array], dropout_rate: float = 0.0,
                   dropout_rng: Optional[Array] = None) -> Array:
    dh = q.shape[-1]
    scale = 1.0 / jnp.sqrt(jnp.asarray(dh, jnp.float32))
    scores = jnp.einsum("bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32)
    scores = scores * scale
    if key_mask is not None:
        scores = scores + key_mask[:, None, None, :].astype(scores.dtype)
    if bias is not None:
        scores = scores + bias.astype(scores.dtype)
    probs = jax.nn.softmax(scores, axis=-1)
    if dropout_rate > 0.0 and dropout_rng is not None:
        # attention-probability dropout (the reference passes
        # dropout_p=config.dropout into SDPA, `networks/attention.py:69`);
        # inverted scaling like nn.Dropout
        keep = jax.random.bernoulli(dropout_rng, 1.0 - dropout_rate, probs.shape)
        probs = probs * keep.astype(probs.dtype) / (1.0 - dropout_rate)
    out = jnp.einsum("bhqk,bhkd->bhqd", probs.astype(v.dtype), v,
                     preferred_element_type=jnp.float32)
    return out.astype(v.dtype)


def multihead_attention(
    q: Array,
    k: Array,
    v: Array,
    bias: Optional[Array] = None,
    key_mask: Optional[Array] = None,
    *,
    impl: Optional[str] = None,
    dropout_rate: float = 0.0,
    dropout_rng: Optional[Array] = None,
) -> Array:
    """Scaled dot-product attention with additive key-mask and bias.

    `impl='auto'` picks the Pallas kernel on TPU when the shape qualifies
    (no full pairwise bias, block-divisible batch), else the XLA path.
    Attention-probability dropout (`dropout_rate` with a live
    `dropout_rng`) is XLA-only; the Pallas kernel is inference-oriented
    and falls back to XLA when prob dropout is requested.
    """
    impl = impl or _IMPL_DEFAULT
    if impl == "auto":
        # XLA measured faster than the Pallas kernel at jet-scale shapes on
        # v5e (the per-(jet,head) matmuls underfill the MXU either way) and
        # is stable inside nested scans; the kernel stays available via
        # impl='pallas' / config.attn_impl for larger-D workloads.
        impl = "xla"
    if impl == "pallas" and not (dropout_rate > 0.0 and dropout_rng is not None):
        from multimodal_flows_tpu.ops.pallas_attention import pallas_set_attention

        return pallas_set_attention(q, k, v, key_mask, bias)
    return _xla_attention(q, k, v, bias, key_mask, dropout_rate, dropout_rng)


def _xla_attention_btc(q: Array, k: Array, v: Array, n_head: int,
                       bias: Optional[Array], key_mask: Optional[Array],
                       dropout_rate: float = 0.0,
                       dropout_rng: Optional[Array] = None,
                       unnormalized_softmax: bool = False) -> Array:
    """Attention from token-major (B, T, C) tensors: the head split is a
    free reshape and XLA folds the (B,T,H,hs)->(B,H,T,hs) transposes into
    the dots, avoiding the materialized head-layout relayouts of the
    (B,H,T,Dh) path (those relayouts were ~half the flagship forward cost
    on v5e, see PROFILE_r02.md)."""
    B, T, C = q.shape
    Tk = k.shape[1]  # may differ from T (KV-cached decode: T=1, Tk=seq)
    hs = C // n_head
    scale = 1.0 / float(hs) ** 0.5
    q4 = q.reshape(B, T, n_head, hs)
    k4 = k.reshape(B, Tk, n_head, hs)
    v4 = v.reshape(B, Tk, n_head, hs)
    scores = jnp.einsum("bqhd,bkhd->bhqk", q4, k4,
                        preferred_element_type=jnp.float32) * scale
    if key_mask is not None:
        scores = scores + key_mask[:, None, None, :].astype(scores.dtype)
    if bias is not None:
        scores = scores + bias.astype(scores.dtype)
    if unnormalized_softmax:
        # skip the max-subtract passes over the (B,H,T,T) score tensor —
        # safe only when the caller guarantees bounded scores (qk-LN keeps
        # |s| <~ gamma^2 sqrt(hs); the clamp is a backstop, exp(60) is
        # finite in fp32 and -1e9 key masks still flush pads to exactly 0)
        e = jnp.exp(jnp.minimum(scores, 60.0))
        # +1e-30 guards the (degenerate, never-for-real-jets) all-masked
        # row: 0/eps -> zero attention instead of NaN
        probs = e / (e.sum(axis=-1, keepdims=True) + 1e-30)
    else:
        probs = jax.nn.softmax(scores, axis=-1)
    if dropout_rate > 0.0 and dropout_rng is not None:
        keep = jax.random.bernoulli(dropout_rng, 1.0 - dropout_rate, probs.shape)
        probs = probs * keep.astype(probs.dtype) / (1.0 - dropout_rate)
    out = jnp.einsum("bhqk,bkhd->bqhd", probs.astype(v.dtype), v4,
                     preferred_element_type=jnp.float32)
    return out.reshape(B, T, C).astype(v.dtype)


def multihead_attention_btc(
    q: Array,
    k: Array,
    v: Array,
    n_head: int,
    bias: Optional[Array] = None,
    key_mask: Optional[Array] = None,
    *,
    impl: Optional[str] = None,
    dropout_rate: float = 0.0,
    dropout_rng: Optional[Array] = None,
    unnormalized_softmax: bool = False,
) -> Array:
    """Attention over token-major (B, T, C) q/k/v with heads packed in C.

    This is the production entry point for the set encoders: it never
    materializes head-transposed tensors.  On TPU, `impl='auto'` uses the
    fused Pallas kernel (scores live in VMEM, zero relayouts) for the
    bias-free inference path, else the reshaped-einsum XLA formulation.
    """
    impl = impl or _IMPL_DEFAULT
    want_dropout = dropout_rate > 0.0 and dropout_rng is not None
    if impl == "auto":
        # XLA wins at jet shapes on v5e (measured r2: fwd T=48 4.46 ms XLA
        # vs 5.15 Pallas; T=128 9.4 vs 20.6 — the VMEM kernel's head
        # packing can't beat XLA's fusions while hs=32 underfills the MXU
        # either way).  The kernel stays available via impl='pallas'.
        impl = "xla"
    if impl == "pallas" and bias is None and not want_dropout:
        from multimodal_flows_tpu.ops.pallas_attention import pallas_btc_attention

        return pallas_btc_attention(q, k, v, key_mask, n_head)
    return _xla_attention_btc(q, k, v, n_head, bias, key_mask,
                              dropout_rate, dropout_rng,
                              unnormalized_softmax=unnormalized_softmax)
