"""Autoregressive flavor-sequence GPT baseline (flax.linen).

TPU-native replacement for the reference `JetFlavorSeqGPT`
(`model/GPT.py:8-125`), which wraps HuggingFace's torch `GPT2LMHeadModel`:
here the decoder is a small causal transformer built from the same
SelfAttnBlock used by the set encoders (pre-LN, fused QKV) with learned
positional embeddings, and generation is a fixed-shape `lax.scan` loop
(one compiled program, no per-token Python).

Vocabulary layout (reference `GPT.py:18-21`): flavor tokens 1..V-1, plus
BOS = V+1, EOS = V+2, PAD = V+3 over sequences of max_seq_length + 2.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from multimodal_flows_tpu.config import Config
from multimodal_flows_tpu.models.attention import SelfAttnBlock
from multimodal_flows_tpu.models.blocks import DENSE_INIT, EMBED_INIT, LayerNorm

Array = jax.Array


class FlavorSeqGPT(nn.Module):
    """Decoder-only causal transformer over flavor-token sequences."""

    config: Config

    @property
    def seq_len(self) -> int:
        return self.config.max_seq_length + 2  # BOS + tokens + EOS

    @property
    def full_vocab(self) -> int:
        return self.config.vocab_size + 4  # + BOS/EOS/PAD

    @nn.compact
    def __call__(self, input_ids: Array, deterministic: bool = True) -> Array:
        cfg = self.config
        B, T = input_ids.shape

        tok = nn.Embed(self.full_vocab, cfg.n_embd, embedding_init=EMBED_INIT,
                       name="wte")(input_ids)
        pos = nn.Embed(self.seq_len, cfg.n_embd, embedding_init=EMBED_INIT,
                       name="wpe")(jnp.arange(T))
        h = nn.Dropout(cfg.dropout_emb, deterministic=deterministic)(tok + pos[None])

        causal = jnp.tril(jnp.ones((T, T), bool))
        bias = jnp.where(causal, 0.0, -1e9).astype(jnp.float32)[None, None]

        # GPT2 dropout semantics (reference `GPT.py:31-34`): attn_pdrop on
        # attention probs, resid_pdrop after attn/MLP projections,
        # activation_function (gelu_new = tanh-approx) in the MLP
        for i in range(cfg.n_layer):
            h = SelfAttnBlock(cfg.n_embd, cfg.n_head, cfg.n_inner,
                              dropout=cfg.dropout_res,
                              use_bias=cfg.bias, qk_layernorm=False,
                              attn_dropout=cfg.dropout_att,
                              activation=cfg.activation,
                              name=f"block_{i}")(h, bias, deterministic)

        h = LayerNorm(name="ln_f")(h)
        return nn.Dense(self.full_vocab, use_bias=False, kernel_init=DENSE_INIT,
                        name="lm_head")(h)
