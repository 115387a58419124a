"""LR schedule: linear warmup then cosine annealing, stepped per epoch.

Matches the reference's SequentialLR(LinearLR -> CosineAnnealingLR)
stepped once per epoch (`model/MMF.py:77-110`): warmup ramps the LR factor
from 0.01 to 1.0 over `warmup_epochs`, then cosine decays from `lr` to
`lr_final` over the remaining epochs.  Implemented as an optax schedule on
the global step with `steps_per_epoch` granularity (the per-epoch staircase
is preserved by flooring the epoch index).
"""

from __future__ import annotations

import jax.numpy as jnp


def warmup_cosine_epoch_schedule(lr: float, lr_final: float, warmup_epochs: int,
                                 max_epochs: int, steps_per_epoch: int):
    cosine_epochs = max(max_epochs - warmup_epochs, 1)

    def schedule(step):
        epoch = jnp.floor_divide(step, steps_per_epoch)
        # linear warmup factor 0.01 -> 1.0 over warmup_epochs epochs
        if warmup_epochs > 0:
            warm_frac = jnp.clip(epoch / warmup_epochs, 0.0, 1.0)
            warm_lr = lr * (0.01 + (1.0 - 0.01) * warm_frac)
        else:
            warm_lr = lr
        # cosine from lr to lr_final over cosine_epochs epochs (per-epoch staircase)
        e = jnp.clip(epoch - warmup_epochs, 0, cosine_epochs)
        cos_lr = lr_final + 0.5 * (lr - lr_final) * (1.0 + jnp.cos(jnp.pi * e / cosine_epochs))
        return jnp.where(epoch < warmup_epochs, warm_lr, cos_lr)

    return schedule
