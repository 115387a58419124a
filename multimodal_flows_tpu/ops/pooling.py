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
