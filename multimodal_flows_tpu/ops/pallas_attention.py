"""Pallas TPU kernel: fused masked set attention for jet-scale sequences.

Why not classic flash attention: jets cap at T<=~150, so the whole (T, T)
score matrix of one (batch, head) pair fits in VMEM — streaming/online
softmax buys nothing.  What *does* cost on TPU is (a) materializing the
(B, H, T, T) fp32 score tensors in HBM between the QK^T and PV matmuls
(XLA cannot fuse across two dots) and (b) grid overhead: a TPU Pallas grid
executes **sequentially**, so a naive one-(b,h)-per-step kernel serializes
B*H tiny programs.

This kernel therefore processes a *block* of BB jets (all H heads) per
grid step: q/k/v blocks are DMA'd once, the per-(jet, head) score matrices
live and die in VMEM (softmax on the VPU between two MXU dots), and only
the (BB, H, T, Dh) outputs return to HBM.  Pad-key masking is applied from
a compact (B, T) additive key-mask vector instead of a (B, 1, T, T) pair
bias.  An optional full pairwise bias path supports the co-occurrence /
Lund variants.

Training support: `pallas_set_attention` carries a custom VJP whose
backward recomputes the standard attention formula in XLA — forward pays
the fused kernel, backward pays the (rare) full-materialization cost only
during training.

Status: correctness- and grad-verified on v5e (parity test in
tests/test_ops.py), but at jet-scale shapes (T=150, Dh=64) it does not beat
XLA — the per-(jet, head) matmuls underfill the MXU either way — and it
crashed the TPU worker when invoked inside a nested scan (scan-of-scans
generation).  It is therefore opt-in (`impl='pallas'`), not the default;
revisit with larger per-step blocks if D grows.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array

DEFAULT_BLOCK_B = 8  # needs the raised vmem_limit: lane padding (Dh 64->128)
                     # makes an 8x4x150x64 fp32 block ~2.4MB in VMEM


def _kernel(q_ref, k_ref, v_ref, mask_ref, bias_ref, o_ref, *, scale: float,
            block_b: int, n_head: int):
    """One grid step: BB jets x H heads, scores resident in VMEM."""
    for b in range(block_b):
        for h in range(n_head):
            q = q_ref[b, h].astype(jnp.float32)   # (T, Dh)
            k = k_ref[b, h].astype(jnp.float32)
            v = v_ref[b, h].astype(jnp.float32)

            s = jax.lax.dot_general(
                q, k, dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)          # (T, T)
            s = s * scale
            if mask_ref is not None:
                s = s + mask_ref[b, 0][None, :]               # additive key mask
            if bias_ref is not None:
                s = s + bias_ref[b, h].astype(jnp.float32)

            m = jnp.max(s, axis=-1, keepdims=True)
            p = jnp.exp(s - m)
            p = p / jnp.sum(p, axis=-1, keepdims=True)

            o_ref[b, h] = jnp.dot(p, v, preferred_element_type=jnp.float32
                                  ).astype(o_ref.dtype)


def _pallas_forward(q: Array, k: Array, v: Array, key_mask: Optional[Array],
                    bias: Optional[Array], block_b: int) -> Array:
    B, H, T, Dh = q.shape
    scale = 1.0 / float(Dh) ** 0.5
    # largest divisor of B that fits the requested block (any batch works,
    # e.g. B=12 -> block 6 instead of asserting on 8)
    block_b = min(block_b, B)
    while B % block_b != 0:
        block_b -= 1
    grid = (B // block_b,)

    def qkv_spec():
        return pl.BlockSpec((block_b, H, T, Dh), lambda i: (i, 0, 0, 0),
                            memory_space=pltpu.VMEM)

    in_specs = [qkv_spec(), qkv_spec(), qkv_spec()]
    args = [q, k, v]

    if key_mask is not None:
        # (B, 1, T) layout: a (block_b, 1, T) block keeps the last two dims
        # equal to the array dims, satisfying Mosaic tiling rules
        in_specs.append(pl.BlockSpec((block_b, 1, T), lambda i: (i, 0, 0),
                                     memory_space=pltpu.VMEM))
        args.append(key_mask.astype(jnp.float32)[:, None, :])

    if bias is not None:
        Hb = bias.shape[1]
        bias = jnp.broadcast_to(bias, (B, Hb if Hb == H else H, T, T)) \
            if bias.shape[1] != H else bias
        if bias.shape[0] != B:
            bias = jnp.broadcast_to(bias, (B, H, T, T))
        in_specs.append(pl.BlockSpec((block_b, H, T, T), lambda i: (i, 0, 0, 0),
                                     memory_space=pltpu.VMEM))
        args.append(bias)

    kernel = functools.partial(
        _dispatch_kernel, scale=scale, block_b=block_b, n_head=H,
        has_mask=key_mask is not None, has_bias=bias is not None)

    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((block_b, H, T, Dh), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, H, T, Dh), v.dtype),
        cost_estimate=pl.CostEstimate(
            flops=4 * B * H * T * T * Dh,
            bytes_accessed=4 * B * H * T * Dh * q.dtype.itemsize,
            transcendentals=B * H * T * T,
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
    )(*args)


def _dispatch_kernel(*refs, scale, block_b, n_head, has_mask, has_bias):
    i = 3
    mask_ref = refs[i] if has_mask else None
    i += int(has_mask)
    bias_ref = refs[i] if has_bias else None
    i += int(has_bias)
    o_ref = refs[i]
    _kernel(refs[0], refs[1], refs[2], mask_ref, bias_ref, o_ref,
            scale=scale, block_b=block_b, n_head=n_head)


def _xla_reference(q, k, v, key_mask, bias):
    scale = 1.0 / float(q.shape[-1]) ** 0.5
    s = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                   preferred_element_type=jnp.float32) * scale
    if key_mask is not None:
        s = s + key_mask[:, None, None, :].astype(jnp.float32)
    if bias is not None:
        s = s + bias.astype(jnp.float32)
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("bhqk,bhkd->bhqd", p.astype(v.dtype), v,
                      preferred_element_type=jnp.float32).astype(v.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5,))
def pallas_set_attention(q, k, v, key_mask=None, bias=None,
                         block_b: int = DEFAULT_BLOCK_B):
    """Fused biased attention. q/k/v: (B, H, T, Dh); key_mask: (B, T)
    additive (0 / -1e9); bias: broadcastable (B, H|1, T, T)."""
    return _pallas_forward(q, k, v, key_mask, bias, block_b)


def _fwd(q, k, v, key_mask, bias, block_b):
    out = _pallas_forward(q, k, v, key_mask, bias, block_b)
    return out, (q, k, v, key_mask, bias)


def _bwd(block_b, res, g):
    q, k, v, key_mask, bias = res
    # backward via XLA recompute of the reference formula
    if bias is None:
        _, vjp = jax.vjp(lambda q_, k_, v_: _xla_reference(q_, k_, v_, key_mask, None),
                         q, k, v)
        dq, dk, dv = vjp(g)
        db = None
    else:
        _, vjp = jax.vjp(lambda q_, k_, v_, b_: _xla_reference(q_, k_, v_, key_mask, b_),
                         q, k, v, bias)
        dq, dk, dv, db = vjp(g)
    dmask = None if key_mask is None else jnp.zeros_like(key_mask)
    return dq, dk, dv, dmask, db


pallas_set_attention.defvjp(_fwd, _bwd)


# ---------------------------------------------------------------------------
# Token-major fused kernel: q/k/v in (B, T, C), heads packed in C
# ---------------------------------------------------------------------------
#
# This is the production attention of the set encoders.  The XLA (B,H,T,Dh)
# formulation costs ~half the flagship forward at jet widths (T<=128,
# hs=32): every head-layout relayout and the (B,H,T,T) score tensors round-
# trip HBM with 4x tile padding (PROFILE_r02.md).  Here one grid step DMAs
# a block of jets ONCE in token layout; head slicing, QK^T, masked softmax
# and PV all happen in VMEM; the output returns in token layout.  No
# transposes exist anywhere in the chain.

BTC_BLOCK_B = 16


def _btc_kernel(q_ref, k_ref, v_ref, mask_ref, seg_ref, o_ref, *, scale: float,
                block_b: int, n_head: int, hs: int, T: int, precision):
    """Lane-masked head packing: per jet, q/k/v rows are replicated H times
    with each replica keeping only its head's lanes (zeros elsewhere), so

      Q_p (H*T, C) @ K_p^T -> scores[(h,i),(g,j)] = q_h[i]. k_g[j] [h == g]

    — the head-block-diagonal structure falls out of the disjoint lane
    support, each dot contracts the full 128-lane C (full MXU passes, no
    narrow (*, hs) arrays, no relayouts, no in-kernel concatenation), and
    the whole chain (two dots + masked softmax) lives in VMEM.  Cross-head
    blocks are exact zeros; an additive -1e9 penalty removes them from the
    softmax.  PV with the lane-masked V lands each head's output in its
    own lanes; summing the H row-groups reassembles (T, C)."""
    HT = n_head * T
    # compile-time lane mask (H, 1, C): replica h keeps lanes [h*hs,(h+1)*hs)
    lane_h = jax.lax.broadcasted_iota(jnp.int32, (n_head, 1, n_head * hs), 2) // hs
    rep_h = jax.lax.broadcasted_iota(jnp.int32, (n_head, 1, n_head * hs), 0)
    lane_mask = (lane_h == rep_h).astype(jnp.float32)
    # compile-time (H*T, H*T) block-diagonal penalty
    row_h = jax.lax.broadcasted_iota(jnp.int32, (HT, HT), 0) // T
    col_h = jax.lax.broadcasted_iota(jnp.int32, (HT, HT), 1) // T
    block_penalty = jnp.where(row_h == col_h, 0.0, -1e9).astype(jnp.float32)

    for b in range(block_b):
        def pack(ref):
            x = ref[b].astype(jnp.float32)                        # (T, C)
            xp = jnp.broadcast_to(x[None], (n_head, T, x.shape[-1])) * lane_mask
            return xp.reshape(HT, x.shape[-1])                    # (H*T, C)

        qs, ks, vs = pack(q_ref), pack(k_ref), pack(v_ref)

        s = jax.lax.dot_general(
            qs, ks, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=precision) * scale                          # (H*T, H*T)
        s = s + block_penalty
        if mask_ref is not None:
            s = s + mask_ref[b, 0][None, :]                       # (1, H*T), pre-tiled
        if seg_ref is not None:
            # packed multi-jet rows: attention restricted to same-segment
            # pairs (block-diagonal within the row).  Segment ids arrive
            # pre-tiled to (1, H*T) like the key mask; the pairwise
            # comparison lives and dies in VMEM (the XLA path materializes
            # the (B,1,T,T) comparison only inside the fused softmax, but
            # still round-trips the (B,H,T,T) scores through HBM).
            seg = seg_ref[b, 0]                                   # (H*T,)
            same = seg[:, None] == seg[None, :]
            s = jnp.where(same, s, jnp.float32(-1e9))
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s - m)
        p = p / jnp.sum(p, axis=-1, keepdims=True)
        o = jax.lax.dot_general(
            p, vs, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=precision)                                  # (H*T, C)
        o_ref[b] = o.reshape(n_head, T, -1).sum(axis=0).astype(o_ref.dtype)


def _btc_dispatch(*refs, scale, block_b, n_head, hs, T, precision, has_mask,
                  has_seg):
    i = 3
    mask_ref = refs[i] if has_mask else None
    i += int(has_mask)
    seg_ref = refs[i] if has_seg else None
    i += int(has_seg)
    o_ref = refs[i]
    _btc_kernel(refs[0], refs[1], refs[2], mask_ref, seg_ref, o_ref,
                scale=scale, block_b=block_b, n_head=n_head, hs=hs, T=T,
                precision=precision)


def _btc_forward(q: Array, k: Array, v: Array, key_mask: Optional[Array],
                 n_head: int, block_b: int, interpret: bool,
                 precision=None, segments: Optional[Array] = None) -> Array:
    B, T, C = q.shape
    hs = C // n_head
    scale = 1.0 / float(hs) ** 0.5
    block_b = min(block_b, B)
    while B % block_b != 0:
        block_b -= 1

    def spec():
        return pl.BlockSpec((block_b, T, C), lambda i: (i, 0, 0),
                            memory_space=pltpu.VMEM)

    def row_spec():
        # pre-tiled to (B, 1, H*T): the head-packed scores are (H*T, H*T)
        # and Mosaic cannot concatenate 1-D vectors in-kernel
        return pl.BlockSpec((block_b, 1, n_head * T), lambda i: (i, 0, 0),
                            memory_space=pltpu.VMEM)

    in_specs = [spec(), spec(), spec()]
    args = [q, k, v]
    if key_mask is not None:
        in_specs.append(row_spec())
        args.append(jnp.tile(key_mask.astype(jnp.float32), (1, n_head))[:, None, :])
    if segments is not None:
        # segment ids as float32 (small ints compare exactly); pads are -1
        # and attend only each other — their outputs are masked downstream,
        # matching the XLA packed path (`ops/attention.py:segments`)
        in_specs.append(row_spec())
        args.append(jnp.tile(segments.astype(jnp.float32), (1, n_head))[:, None, :])

    kernel = functools.partial(_btc_dispatch, scale=scale, block_b=block_b,
                               n_head=n_head, hs=hs, T=T, precision=precision,
                               has_mask=key_mask is not None,
                               has_seg=segments is not None)
    return pl.pallas_call(
        kernel,
        grid=(B // block_b,),
        in_specs=in_specs,
        out_specs=spec(),
        out_shape=jax.ShapeDtypeStruct((B, T, C), v.dtype),
        cost_estimate=pl.CostEstimate(
            flops=4 * B * T * T * C,
            bytes_accessed=4 * B * T * C * q.dtype.itemsize,
            transcendentals=B * n_head * T * T,
        ),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=64 * 1024 * 1024),
        interpret=interpret,
    )(*args)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8))
def pallas_btc_attention(q, k, v, key_mask=None, segments=None,
                         n_head: int = 4,
                         block_b: int = BTC_BLOCK_B, interpret: bool = False,
                         precision=None):
    """Fused token-major attention. q/k/v: (B, T, C) with heads packed in
    C; key_mask: (B, T) additive (0 / -1e9); segments: (B, T) int ids
    (pads -1) restricting attention to same-segment pairs (packed
    multi-jet rows).  `interpret=True` runs the kernel in Pallas interpret
    mode (CPU) for parity tests; pass
    `precision=jax.lax.Precision.HIGHEST` for true-fp32 MXU passes
    (exactness tests — default matches XLA's bf16-pass matmuls)."""
    return _btc_forward(q, k, v, key_mask, n_head, block_b, interpret,
                        precision, segments)


def _btc_vjp_fwd(q, k, v, key_mask, segments, n_head, block_b, interpret,
                 precision):
    out = _btc_forward(q, k, v, key_mask, n_head, block_b, interpret,
                       precision, segments)
    return out, (q, k, v, key_mask, segments)


def _btc_vjp_bwd(n_head, block_b, interpret, precision, res, g):
    q, k, v, key_mask, segments = res
    from multimodal_flows_tpu.ops.attention import _xla_attention_btc

    _, vjp = jax.vjp(lambda q_, k_, v_: _xla_attention_btc(
        q_, k_, v_, n_head, None, key_mask, segments=segments), q, k, v)
    dq, dk, dv = vjp(g)
    dmask = None if key_mask is None else jnp.zeros_like(key_mask)
    dseg = None if segments is None else jnp.zeros_like(segments)
    return dq, dk, dv, dmask, dseg


pallas_btc_attention.defvjp(_btc_vjp_fwd, _btc_vjp_bwd)
