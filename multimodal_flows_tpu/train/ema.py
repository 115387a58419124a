"""Exponential moving average of parameters.

Replaces the reference's timm `ModelEmaV2` wrapper + Lightning callback
(`utils/callbacks.py:152-226`): here the EMA pytree lives inside the train
state and is updated by one fused `jax.tree.map` inside the jitted train
step — no host-side weight copying, no swap-in/swap-out; evaluation and
prediction simply read `state.ema_params`.
"""

from __future__ import annotations

import jax


def ema_update(ema_params, params, decay: float):
    """ema <- decay * ema + (1 - decay) * params."""
    return jax.tree.map(lambda e, p: e * decay + p * (1.0 - decay), ema_params, params)
