"""Microbenchmark: fused (Pallas) vs XLA attention at the packed shape.

The round-4 roofline question (VERDICT r3 #6): at the packed sampling
operating point (B=128 rows, T=128 tokens, fp32, fast softmax) the XLA
path materializes the (B,H,T,T) score tensor in HBM between QK^T and PV
(~33 MB per layer per direction); the segment-masked Pallas BTC kernel
keeps scores in VMEM.  This script times both at the flagship encoder
shapes (full-width C=256 blocks and the fused model's half-width C=128
streams), amortized over a lax.scan (per-dispatch tunnel latency ~0.5 s).

Also times the full flagship packed forward with attn_impl in
{xla, pallas} to get the end-to-end delta.

Usage: python scripts/pallas_packed_bench.py [--steps 200]
"""

from __future__ import annotations

import argparse
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

from multimodal_flows_tpu.ops.attention import (_xla_attention_btc,
                                                fast_inference_softmax)
from multimodal_flows_tpu.ops.pallas_attention import pallas_btc_attention
from multimodal_flows_tpu.utils import enable_compilation_cache


def timed_scan(fn, args, steps):
    """Median of 3: scan fn over `steps` iterations, force completion."""

    @jax.jit
    def run(args):
        def body(c, _):
            out = fn(*c[:-1], c[-1])
            # fold the output back so the scan cannot be DCE'd
            return (*c[:-1], out + 0.0 * c[-1]), ()

        c, _ = jax.lax.scan(body, args, None, length=steps)
        return c[-1]

    out = run(args)
    float(out.ravel()[0])  # warm compile + tunnel
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        out = run(args)
        float(out.ravel()[0])
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts)) / steps


def bench_attention(B, T, C, H, steps, segments):
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.normal(size=(B, T, C)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(B, T, C)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(B, T, C)).astype(np.float32))
    # packed-style segments: ~3 jets per row + pad tail
    seg = np.full((B, T), -1, np.int32)
    w = T // 3
    seg[:, :w] = 0
    seg[:, w:2 * w] = 1
    seg[:, 2 * w:3 * w] = 2
    seg = jnp.asarray(seg) if segments else None

    t_xla = timed_scan(
        lambda q_, k_, seg_, v_: _xla_attention_btc(
            q_, k_, v_, H, None, None, unnormalized_softmax=True,
            segments=seg_),
        (q, k, seg, v) if segments else (q, k, v),
        steps) if segments else timed_scan(
        lambda q_, k_, v_: _xla_attention_btc(q_, k_, v_, H, None, None,
                                              unnormalized_softmax=True),
        (q, k, v), steps)

    for block_b in (8, 16, 32):
        if segments:
            fn = (lambda bb: lambda q_, k_, seg_, v_: pallas_btc_attention(
                q_, k_, v_, None, seg_, H, bb))(block_b)
        else:
            fn = (lambda bb: lambda q_, k_, v_: pallas_btc_attention(
                q_, k_, v_, None, None, H, bb))(block_b)
        try:
            t_pal = timed_scan(fn, (q, k, seg, v) if segments else (q, k, v),
                               steps)
        except Exception as e:
            t_pal = None
            print(f"  pallas block_b={block_b}: FAILED {type(e).__name__}: "
                  f"{str(e)[:200]}", flush=True)
            continue
        print(f"  B={B} T={T} C={C} H={H} seg={segments} "
              f"block_b={block_b}: xla {t_xla*1e3:.3f} ms  "
              f"pallas {t_pal*1e3:.3f} ms  ({t_xla/t_pal:.2f}x)", flush=True)
    return t_xla


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=200)
    args = p.parse_args()
    enable_compilation_cache()
    print(f"devices: {jax.devices()}", flush=True)

    # flagship packed shapes: full-width ParticleFormer blocks (C=256,H=4)
    # and FusedParticleFormer half-streams (C=128,H=4)
    # trace under the production sampling context so the XLA baseline
    # uses the unnormalized fast softmax it runs with in generation
    with fast_inference_softmax():
        for (C, H) in [(256, 4), (128, 4)]:
            for segments in (True, False):
                bench_attention(128, 128, C, H, args.steps, segments)


if __name__ == "__main__":
    main()
