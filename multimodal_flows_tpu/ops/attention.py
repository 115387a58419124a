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

#: trace-time opt-in for the unnormalized inference softmax.  The model
#: layer marks *eligibility* (qk-LN, bias-free, deterministic); this flag
#: marks *intent*: only the sampling/generation drivers enable it, so the
#: validation loss that drives checkpoint ranking always runs the exact
#: softmax (advisor r2: a silent clamp on the val path could distort model
#: selection if trained qk-LN gains ever pushed scores past the clamp).
_FAST_INFERENCE_SOFTMAX = False

#: global kill switch: when True, `fast_inference_softmax()` becomes a
#: no-op so the sampling drivers run the exact softmax.  Exists for the
#: trained-scale A/B equivalence test (scripts/ab_fast_softmax_r05.py)
#: and debugging; the generator includes it in its jit-cache signature so
#: flipping it retraces instead of silently reusing the other variant.
_FAST_INFERENCE_FORCE_OFF = False


def force_exact_softmax(force_off: bool = True) -> None:
    global _FAST_INFERENCE_FORCE_OFF
    _FAST_INFERENCE_FORCE_OFF = force_off


def fast_softmax_would_apply() -> bool:
    """Whether a sampling driver entering `fast_inference_softmax()` will
    actually get the unnormalized path (i.e. the kill switch is off)."""
    return not _FAST_INFERENCE_FORCE_OFF


def set_default_impl(impl: str) -> None:
    global _IMPL_DEFAULT
    assert impl in ("auto", "xla", "pallas")
    _IMPL_DEFAULT = impl


class fast_inference_softmax:
    """Context manager enabling the unnormalized softmax on eligible
    attention calls traced within it (sampling hot path only)."""

    def __init__(self, enabled: bool = True):
        self.enabled = enabled

    def __enter__(self):
        global _FAST_INFERENCE_SOFTMAX
        self._prev = _FAST_INFERENCE_SOFTMAX
        _FAST_INFERENCE_SOFTMAX = self.enabled and not _FAST_INFERENCE_FORCE_OFF
        return self

    def __exit__(self, *exc):
        global _FAST_INFERENCE_SOFTMAX
        _FAST_INFERENCE_SOFTMAX = self._prev
        return False


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
                       unnormalized_softmax: bool = False,
                       segments: Optional[Array] = None) -> Array:
    """Attention from token-major (B, T, C) tensors: the head split is a
    free reshape and XLA folds the (B,T,H,hs)->(B,H,T,hs) transposes into
    the dots, avoiding the materialized head-layout relayouts of the
    (B,H,T,Dh) path (those relayouts were ~half the flagship forward cost
    on v5e, see PROFILE_r02.md).

    `segments` (B, T) int enables block-diagonal set attention for packed
    multi-jet rows: token i attends token j only when segments match.  The
    (B,1,T,T) comparison is generated inline from the (B,T) ids so XLA
    fuses it into the softmax instead of reading a materialized bias from
    HBM.  Pad slots carry segment -1 (they attend only each other, and
    their garbage stays isolated — outputs on pads are masked downstream).
    """
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
    if segments is not None:
        same = segments[:, None, :, None] == segments[:, None, None, :]
        scores = jnp.where(same, scores, jnp.float32(-1e9))
    if unnormalized_softmax and _FAST_INFERENCE_SOFTMAX:
        # skip the max-subtract passes over the (B,H,T,T) score tensor —
        # exact (normalization cancels) whenever no exp overflows: the
        # clamp at 80 keeps exp finite (e^80 ~ 5.5e34; a 150-key row sums
        # to < 1e37 < fp32 max) and only distorts scores above 80, far
        # past the qk-LN bound |s| <= gamma_q gamma_k sqrt(hs).  Enabled
        # only inside `fast_inference_softmax()` (sampling drivers), so
        # the val loss that ranks checkpoints never takes this path
        e = jnp.exp(jnp.minimum(scores, 80.0))
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
    segments: Optional[Array] = None,
) -> Array:
    """Attention over token-major (B, T, C) q/k/v with heads packed in C.

    This is the production entry point for the set encoders: it never
    materializes head-transposed tensors.  On TPU, `impl='auto'` uses the
    fused Pallas kernel (scores live in VMEM, zero relayouts) for the
    bias-free inference path, else the reshaped-einsum XLA formulation.
    `segments` (B, T) restricts attention to same-segment pairs
    (block-diagonal packed multi-jet rows); XLA-path only.
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

        return pallas_btc_attention(q, k, v, key_mask, segments, n_head)
    return _xla_attention_btc(q, k, v, n_head, bias, key_mask,
                              dropout_rate, dropout_rng,
                              unnormalized_softmax=unnormalized_softmax,
                              segments=segments)
