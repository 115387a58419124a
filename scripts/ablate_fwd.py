"""Forward-pass ablation: attribute the gap between the measured
ParticleFormer forward and the dense-matmul ideal (PROFILE_r02).

Variants timed at flagship size (B=256, T=64, fp32):
  full        — the real forward
  no-attn     — multihead_attention returns v (isolates attention core)
  attn-es     — attention via direct einsum without explicit transposes
  no-qkln     — QK-layernorm disabled
  merged-attn — x/y streams' attention batched into one call (simulated:
                single stream at 2x batch, half width)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from multimodal_flows_tpu.config import Config
from multimodal_flows_tpu.data.state import MultiModal
from multimodal_flows_tpu.train.systems import MMF
from multimodal_flows_tpu.utils import enable_compilation_cache
from multimodal_flows_tpu.ops import attention as attn_ops

enable_compilation_cache()

B, T, STEPS = 256, 64, 30


def make_state(cfg, seed=0):
    rng = np.random.default_rng(seed)
    n = np.minimum(rng.poisson(40, B), T - 1) + 1
    m = (np.arange(T)[None] < n[:, None]).astype(np.int32)[..., None]
    return MultiModal(
        time=jnp.full((B,), 0.5, jnp.float32),
        continuous=jnp.asarray(rng.normal(size=(B, T, 3)) * m, jnp.float32),
        discrete=jnp.asarray(rng.integers(1, 9, (B, T, 1)) * m, jnp.int32),
        mask=jnp.asarray(m))


def timed(fn, init, reps=3):
    @jax.jit
    def run(x):
        out, _ = jax.lax.scan(lambda c, _: (fn(c), None), x, None, length=STEPS)
        return out

    r = run(init)
    float(jnp.sum(jax.tree.leaves(r)[0]))
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        r = run(init)
        float(jnp.sum(jax.tree.leaves(r)[0]))
        best = min(best, time.perf_counter() - t0)
    return best / STEPS * 1e3  # ms


def bench(tag, qk_layernorm=True):
    cfg = Config(model="ParticleFormer", n_embd=256, n_inner=512, n_layer=5,
                 n_layer_fused=6, n_head=4, max_num_particles=T,
                 qk_layernorm=qk_layernorm)
    system = MMF(cfg)
    params = system.init_params(jax.random.PRNGKey(0))
    state = make_state(cfg)

    def body(s):
        vt, logits = system.module.apply(params, s)
        return s.replace(continuous=s.continuous + 0.0 * vt)

    ms = timed(body, state)
    print(f"{tag:12s}: {ms:.2f} ms", flush=True)
    return ms


def main():
    # models.attention binds the symbol at import time — patch THERE
    from multimodal_flows_tpu.models import attention as attn_mod

    orig = attn_mod.multihead_attention

    full = bench("full")

    # attention core removed
    attn_mod.multihead_attention = (
        lambda q, k, v, bias=None, key_mask=None, **kw: v)
    bench("no-attn")

    # attention via direct einsums, no explicit transposes upstream can't
    # change here, but measure fp32 softmax replaced by bf16 scores
    def attn_bf16(q, k, v, bias=None, key_mask=None, **kw):
        dh = q.shape[-1]
        s = jnp.einsum("bhqd,bhkd->bhqk", q.astype(jnp.bfloat16),
                       k.astype(jnp.bfloat16),
                       preferred_element_type=jnp.float32)
        s = s / jnp.sqrt(jnp.float32(dh))
        if key_mask is not None:
            s = s + key_mask[:, None, None, :]
        if bias is not None:
            s = s + bias
        p = jax.nn.softmax(s, axis=-1)
        return jnp.einsum("bhqk,bhkd->bhqd", p.astype(jnp.bfloat16),
                          v.astype(jnp.bfloat16),
                          preferred_element_type=jnp.float32).astype(v.dtype)

    attn_mod.multihead_attention = attn_bf16
    bench("attn-bf16")

    # softmax in bf16 end to end
    def attn_allbf16(q, k, v, bias=None, key_mask=None, **kw):
        dh = q.shape[-1]
        s = jnp.einsum("bhqd,bhkd->bhqk", q.astype(jnp.bfloat16),
                       k.astype(jnp.bfloat16),
                       preferred_element_type=jnp.bfloat16)
        s = s * jnp.bfloat16(1.0 / float(dh) ** 0.5)
        if key_mask is not None:
            s = s + key_mask[:, None, None, :].astype(jnp.bfloat16)
        if bias is not None:
            s = s + bias.astype(jnp.bfloat16)
        p = jax.nn.softmax(s, axis=-1)
        return jnp.einsum("bhqk,bhkd->bhqd", p, v.astype(jnp.bfloat16),
                          preferred_element_type=jnp.float32).astype(v.dtype)

    attn_mod.multihead_attention = attn_allbf16
    bench("attn-allbf16")

    attn_mod.multihead_attention = orig
    bench("no-qkln", qk_layernorm=False)

    # prior run (same harness): two-stacks (10 half-width blocks alone)
    # 3.92 ms, merged into one 2xB 5-block stack 4.28 ms -> merging the
    # dual streams does NOT help; the half-width stacks dominate the
    # forward (full 5.81 ms).


if __name__ == "__main__":
    main()
