"""TPU performance audit for the sampling hot path (VERDICT r1 #2).

Measures, on the real chip, with every timing amortized inside a
`lax.scan` (per-dispatch latency over the tunnel is ~0.5 s):

  1. matmul ceiling (bf16 / fp32) -> the achievable TF/s on THIS chip
  2. flagship ParticleFormer forward: dtype x width x batch grid
  3. full hybrid solver step vs model-only step (solver/RNG overhead)
  4. threefry vs rbg PRNG for the tau-leap uniform draw
  5. scan unroll sensitivity of the 1000-step trajectory

Writes PROFILE_r02.json; the findings drive bench.py's configuration and
are summarized in PROFILE_r02.md.

Usage: python scripts/profile_tpu.py [--quick]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timed_scan(fn, init, length: int, reps: int = 3):
    """Wall time of `lax.scan(fn, init, None, length)`, best of reps,
    completion forced by fetching a scalar."""
    import jax
    import jax.numpy as jnp

    @jax.jit
    def run(x):
        out, _ = jax.lax.scan(lambda c, _: (fn(c), None), x, None, length=length)
        return out

    # warmup/compile
    r = run(init)
    float(jnp.sum(jax.tree.leaves(r)[0]))
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        r = run(init)
        float(jnp.sum(jax.tree.leaves(r)[0]))
        best = min(best, time.perf_counter() - t0)
    return best / length


def matmul_ceiling(n: int, dtype, steps: int = 30):
    import jax
    import jax.numpy as jnp

    a = jnp.ones((n, n), dtype)
    b = jnp.ones((n, n), dtype)

    def body(x):
        return jnp.dot(x, b, preferred_element_type=jnp.float32).astype(dtype) / n

    per_step = timed_scan(body, a, steps)
    return 2 * n**3 / per_step / 1e12  # TF/s


def forward_flops(cfg, T: int) -> float:
    """Analytic FLOPs of one ParticleFormer forward per jet (dense matmuls
    + attention), for achieved-TF/s accounting."""
    half = cfg.n_embd // 2
    d_in, v = cfg.dim_continuous, cfg.vocab_size

    def block(width, n_inner):
        dense = 4 * width**2 + 2 * width * n_inner      # qkv+proj + mlp params
        attn = 2 * T * width                            # scores + weighted sum
        return 2 * (dense + attn) * T                   # 2 FLOP per MAC, per token

    emb = 2 * T * (d_in * cfg.n_embd + cfg.n_embd * half          # wxe
                   + cfg.n_embd * half                            # wye proj
                   + half * cfg.n_embd)                           # time_expand approx
    heads = 2 * T * (half * cfg.n_inner + cfg.n_inner * (d_in + v)) * 2
    total = (2 * cfg.n_layer * block(half, cfg.n_inner)
             + cfg.n_layer_fused * block(cfg.n_embd, cfg.n_inner)
             + emb + heads)
    return float(total)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--quick", action="store_true")
    p.add_argument("--out", default="PROFILE_r02.json")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from multimodal_flows_tpu.config import Config
    from multimodal_flows_tpu.data.state import MultiModal
    from multimodal_flows_tpu.train.systems import MMF
    from multimodal_flows_tpu.utils import enable_compilation_cache

    enable_compilation_cache()
    results = {"platform": jax.devices()[0].platform,
               "device": str(jax.devices()[0])}

    # ---- 1. matmul ceiling
    n = 2048 if args.quick else 4096
    results["matmul_tfs_bf16"] = matmul_ceiling(n, jnp.bfloat16)
    results["matmul_tfs_fp32"] = matmul_ceiling(n, jnp.float32)
    print(f"ceiling: bf16 {results['matmul_tfs_bf16']:.1f} TF/s, "
          f"fp32 {results['matmul_tfs_fp32']:.1f} TF/s", flush=True)

    # ---- 2. flagship forward grid
    def make(cfg, B, T, seed=0):
        rng = np.random.default_rng(seed)
        nmask = np.minimum(rng.poisson(40, B), T - 1) + 1
        m = (np.arange(T)[None] < nmask[:, None]).astype(np.int32)[..., None]
        return MultiModal(
            time=jnp.full((B,), 0.5, jnp.float32),
            continuous=jnp.asarray(rng.normal(size=(B, T, 3)) * m, jnp.float32),
            discrete=jnp.asarray(rng.integers(1, 9, (B, T, 1)) * m, jnp.int32),
            mask=jnp.asarray(m))

    steps = 10 if args.quick else 30
    grid = []
    widths = [64, 150] if args.quick else [48, 64, 128, 150]
    batches = [256] if args.quick else [256, 512, 1024]
    # tail-width probes: T=150 measured badly tiling-hostile; find a good
    # static width for the >128-particle tail bucket
    tail_probe = [] if args.quick else [(152, 256), (160, 256), (192, 256)]
    for dtype in ["float32", "bfloat16"]:
        cfg = Config(model="ParticleFormer", n_embd=256, n_inner=512, n_layer=5,
                     n_layer_fused=6, n_head=4, compute_dtype=dtype,
                     max_num_particles=256)
        system = MMF(cfg)
        params = system.init_params(jax.random.PRNGKey(0))
        for T, B in [(t, b) for t in widths for b in batches] + tail_probe:
            if True:
                state = make(cfg, B, T)

                def body(s):
                    vt, logits = system.module.apply(params, s)
                    return s.replace(continuous=s.continuous + 0.0 * vt)

                per = timed_scan(body, state, steps)
                tfs = forward_flops(cfg, T) * B / per / 1e12
                grid.append({"dtype": dtype, "T": T, "B": B,
                             "ms_per_fwd": per * 1e3, "achieved_tfs": tfs,
                             "fwd_per_jet_us": per / B * 1e6})
                print(f"fwd {dtype} T={T} B={B}: {per*1e3:.2f} ms "
                      f"({tfs:.1f} TF/s)", flush=True)
    results["forward_grid"] = grid

    # ---- 3. solver overhead: full hybrid step vs model-only (fp32, T=64)
    cfg = Config(model="ParticleFormer", n_embd=256, n_inner=512, n_layer=5,
                 n_layer_fused=6, n_head=4, max_num_particles=150)
    system = MMF(cfg)
    params = system.init_params(jax.random.PRNGKey(0))
    B, T = 256, 64
    state = make(cfg, B, T)

    solver = system.make_solver(params, temperature=1.0)
    key0 = jax.random.PRNGKey(0)

    def full_step(carry):
        s, k = carry
        k, sub = jax.random.split(k)
        s2, _ = solver.fwd_step(sub, s, jnp.float32(1e-3))
        return (s2.replace(continuous=s2.continuous * 0.999), k)

    per_full = timed_scan(lambda c: full_step(c), (state, key0), steps)
    results["full_step_ms"] = per_full * 1e3

    def model_only(s):
        vt, logits = system.module.apply(params, s)
        return s.replace(continuous=s.continuous + 1e-3 * vt)

    per_model = timed_scan(model_only, state, steps)
    results["model_only_ms"] = per_model * 1e3
    print(f"solver overhead: full {per_full*1e3:.2f} ms vs model "
          f"{per_model*1e3:.2f} ms", flush=True)

    # ---- 4. PRNG impl for the tau-leap draw (typed keys: legacy raw keys
    # lose their impl inside scan)
    for impl in ["threefry2x32", "rbg"]:
        key = jax.random.key(0, impl=impl)

        def draw(c):
            acc, k = c
            k, sub = jax.random.split(k)
            u = jax.random.uniform(sub, (B, T, 9), jnp.float32)
            return (acc + u[0, 0, 0], k)

        per = timed_scan(draw, (jnp.float32(0), key), steps)
        results[f"rng_{impl}_ms"] = per * 1e3
        print(f"rng {impl}: {per*1e3:.3f} ms per (B,T,9) uniform", flush=True)

    # ---- 5. 1000-step trajectory: unroll sensitivity (quick: 200 steps)
    n_steps = 200 if args.quick else 1000
    src = make(cfg, B, T)
    for unroll in [1, 2, 4]:
        @jax.jit
        def traj(s, key):
            def step(carry, _):
                st, k = carry
                k, sub = jax.random.split(k)
                st2, _ = solver.fwd_step(sub, st, jnp.float32(1.0 / n_steps))
                return (st2, k), None
            (out, _), _ = jax.lax.scan(step, (s, key), None, length=n_steps,
                                       unroll=unroll)
            return out

        r = traj(src, key0)
        float(jnp.sum(r.continuous))
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            r = traj(src, key0)
            float(jnp.sum(r.continuous))
            best = min(best, time.perf_counter() - t0)
        results[f"traj_{n_steps}steps_unroll{unroll}_s"] = best
        print(f"trajectory {n_steps} steps unroll={unroll}: {best:.2f} s "
              f"({B / best * n_steps / 1000:.1f} jets/s @1000-step-equiv)",
              flush=True)

    with open(args.out, "w") as f:
        json.dump(results, f, indent=1)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
