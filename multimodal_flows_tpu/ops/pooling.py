"""Masked set pooling ops (EPiC global stream).

Functional equivalent of the reference `EPiC._meansum_pool`
(`networks/EPiC.py:65-72`): masked mean and scaled sum over the particle
axis, concatenated with any global features.  XLA fuses the mask multiply
and both reductions into one pass over the (B, D, F) activations.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jax.Array


def masked_meansum_pool(mask: Array, x_local: Array, *x_global: Array, scale: float = 0.01) -> Array:
    """mask: (B, D, 1); x_local: (B, D, F); x_global: any number of (B, G).

    Returns (B, 2F + sum(G)): [masked mean, masked sum * scale, *globals].
    The sum is scaled by 0.01 as in EPiC-GAN to keep magnitudes comparable.
    """
    m = mask.astype(x_local.dtype)
    x_sum = (x_local * m).sum(axis=1)                       # (B, F)
    denom = m.sum(axis=1)                                    # (B, 1)
    x_mean = x_sum / denom
    return jnp.concatenate([x_mean, x_sum * scale, *x_global], axis=-1)


def segment_meansum_pool(segments: Array, x_local: Array, *x_global: Array,
                         num_segments: int, scale: float = 0.01) -> Array:
    """Per-jet mean+sum pooling over packed multi-jet rows — the segment
    twin of `masked_meansum_pool`, so EPiC's global stream becomes
    per-(row, jet-slot) instead of per-row and packing never mixes jets.

    segments: (B, W) within-row jet ids (pad slots -1 — routed to an
    overflow slot and dropped); x_local: (B, W, F); x_global: any number
    of (B, J, G) per-jet globals.  Returns (B, J, 2F + sum(G)).  One
    flattened `segment_sum` (an XLA scatter-add) per call.
    """
    B, W = segments.shape
    J = num_segments
    slot = jnp.where(segments >= 0, segments, J)
    gid = (jnp.arange(B, dtype=jnp.int32)[:, None] * (J + 1) + slot).reshape(-1)
    flat = x_local.reshape(B * W, -1)
    ones = jnp.ones((B * W, 1), x_local.dtype)
    pooled = jax.ops.segment_sum(jnp.concatenate([flat, ones], axis=-1), gid,
                                 num_segments=B * (J + 1))
    pooled = pooled.reshape(B, J + 1, -1)[:, :J]
    x_sum, counts = pooled[..., :-1], pooled[..., -1:]
    x_mean = x_sum / jnp.clip(counts, 1.0, None)            # empty slots -> 0
    return jnp.concatenate([x_mean, x_sum * scale, *x_global], axis=-1)


def segment_gather(x_global: Array, segments: Array) -> Array:
    """Broadcast per-jet globals (B, J, G) back to tokens (B, W, G) via the
    segment ids (pad slots get jet 0's global; their outputs are masked
    downstream)."""
    B = segments.shape[0]
    slot = jnp.clip(segments, 0, x_global.shape[1] - 1)
    return x_global[jnp.arange(B, dtype=jnp.int32)[:, None], slot]
