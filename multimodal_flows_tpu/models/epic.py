"""EPiC: equivariant point-cloud encoder (flax.linen).

Re-design of the reference EPiC network (`networks/EPiC.py:9-178`, itself
after EPiC-GAN): a local particle stream and a global jet stream coupled by
masked mean+sum pooling (`ops.masked_meansum_pool`) and global->local
broadcast, with weight-normalized Dense layers and local/global skip
connections.  Continuous-only (drift head; no discrete head).
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
from flax import linen as nn

from multimodal_flows_tpu.config import Config
from multimodal_flows_tpu.data.state import MultiModal
from multimodal_flows_tpu.models.blocks import DENSE_INIT, timestep_embedding
from multimodal_flows_tpu.ops.pooling import masked_meansum_pool

Array = jax.Array


def _wn_dense(features: int, name: str, dtype=jnp.float32):
    return nn.WeightNorm(nn.Dense(features, kernel_init=DENSE_INIT, dtype=dtype),
                         name=name)


def _broadcast_global(x_global: Array, num_particles: int) -> Array:
    return jnp.broadcast_to(x_global[:, None, :], (x_global.shape[0], num_particles, x_global.shape[-1]))


class EPiCProjection(nn.Module):
    """Input projection into (local, global) streams (reference
    `EPiC.py:80-124`)."""

    dim_hid_loc: int
    dim_hid_glob: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, time: Array, x_local: Array, x_global: Array, mask: Array):
        h = jnp.concatenate([time, x_local], axis=-1)
        h = nn.gelu(_wn_dense(self.dim_hid_loc, "local_fc1", self.dtype)(h), approximate=False)
        h = nn.gelu(_wn_dense(self.dim_hid_loc, "local_fc2", self.dtype)(h), approximate=False)

        g = masked_meansum_pool(mask, h, x_global)
        g = nn.gelu(_wn_dense(self.dim_hid_loc, "global_fc1", self.dtype)(g), approximate=False)
        g = nn.gelu(_wn_dense(self.dim_hid_glob, "global_fc2", self.dtype)(g), approximate=False)
        return h, g


class EPiCLayer(nn.Module):
    """One equivariant layer: pool -> global MLP (+skip) -> broadcast ->
    local MLP (+skip) (reference `EPiC.py:127-178`)."""

    dim_loc: int
    dim_hid_loc: int
    dim_hid_glob: int
    dropout: float = 0.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, time: Array, x_local: Array, x_global: Array, mask: Array,
                 deterministic: bool = True):
        act = lambda v: nn.leaky_relu(v)

        # global stream
        g_hidden = masked_meansum_pool(mask, x_local, x_global)
        g_hidden = act(_wn_dense(self.dim_loc, "fc_glob1", self.dtype)(g_hidden))
        x_global = x_global + _wn_dense(self.dim_hid_glob, "fc_glob2", self.dtype)(g_hidden)
        g_out = nn.Dropout(self.dropout, deterministic=deterministic)(act(x_global))

        # local stream
        glob2local = _broadcast_global(x_global, x_local.shape[1])
        l_hidden = jnp.concatenate([time, x_local, glob2local], axis=-1)
        l_hidden = act(_wn_dense(self.dim_hid_loc, "fc_loc1", self.dtype)(l_hidden))
        x_local = x_local + _wn_dense(self.dim_hid_loc, "fc_loc2", self.dtype)(l_hidden)
        l_out = nn.Dropout(self.dropout, deterministic=deterministic)(act(x_local))

        return l_out, g_out


class EPiC(nn.Module):
    """Full EPiC drift network (reference `EPiC.py:9-77`)."""

    config: Config

    @nn.compact
    def __call__(self, state: MultiModal, deterministic: bool = True) -> Array:
        cfg = self.config
        dt = jnp.float32
        mask = state.mask.astype(dt)
        D = state.continuous.shape[1]

        x_emb = nn.Dense(cfg.n_embd, kernel_init=DENSE_INIT, dtype=dt, name="wxe")(
            state.continuous.astype(dt))
        time_glob = timestep_embedding(state.time, cfg.n_embd)              # (B, E)
        time_local = _broadcast_global(time_glob, D)                        # (B, D, E)

        x_local, x_global = EPiCProjection(cfg.n_embd, cfg.n_embd_glob, dt, name="proj")(
            time_local, x_emb, time_glob, mask)
        x_local_skip, x_global_skip = x_local, x_global

        for i in range(cfg.n_layer):
            x_local, x_global = EPiCLayer(cfg.n_embd, cfg.n_embd, cfg.n_embd_glob,
                                          cfg.dropout, dt, name=f"layer_{i}")(
                time_local, x_local, x_global, mask, deterministic)
            x_local = x_local + x_local_skip
            x_global = x_global + x_global_skip

        glob_bcast = _broadcast_global(x_global, D)
        h = jnp.concatenate([time_local, x_local, glob_bcast], axis=-1)
        return nn.Dense(cfg.dim_continuous, kernel_init=DENSE_INIT, dtype=jnp.float32,
                        name="head")(h)
