"""Itemize the ~1 ms/step of sampling cost outside the model forward
(VERDICT r4 #6): PROFILE_r04 measured the flagship packed sampling step at
~4.4 ms — forward 3.44 ms (dense 2.56 + attention 0.89) — leaving ~0.9 ms
of "solver + step overhead" asserted structural but never split.

Method (tunnel-safe: every number is a 100-step `lax.scan` amortized and
completed by fetching a scalar, median of 3):

  full         production scan body: forward + filtered probs + telegraph
               rates + censored-Poisson tau-leap + Euler update + time
               broadcast (exactly `dynamics/solvers.py:simulate`'s body)
  fwd_only     scan body = model forward only (heads reduced into the
               carry so nothing dead-codes); solver cost = full - fwd_only
  solver_only  scan body = solver math on constant heads (forward stubbed)
  empty        scan body = one elementwise op on the carry (scan floor)
  +B-scaling   full at B in {32, 64, 128, 256}: linear fit t(B) = a + b*B
               separates per-step fixed cost (a: dispatch/loop
               bookkeeping, shape-independent epilogues) from
               work that scales with rows (b*B)

plus end-to-end jets/s at B in {128, 256} on the bench grid (2048 jets,
1000 steps) to re-test the r3 "B=128 beats B=256" pack ablation after the
round-4 packed-training changes.

Reference hot loop being accounted for: per-step Python dispatch of
`HybridSolver.tauleap_step` (`/root/reference/multimodal_flows/model/solvers.py:23-60`).

Usage: python scripts/solver_overhead_r05.py [--steps 100] [--reps 3]
Writes PROFILE_r05.md section data to closure_r05/solver_overhead.json.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=100)
    p.add_argument("--reps", type=int, default=3)
    p.add_argument("--width", type=int, default=128)
    p.add_argument("--out_json", default="closure_r05/solver_overhead.json")
    p.add_argument("--skip_e2e", action="store_true")
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from multimodal_flows_tpu.config import Config
    from multimodal_flows_tpu.data.state import MultiModal
    from multimodal_flows_tpu.dynamics.solvers import time_grid
    from multimodal_flows_tpu.ops.attention import fast_inference_softmax
    from multimodal_flows_tpu.train.systems import MMF
    from multimodal_flows_tpu.utils import enable_compilation_cache
    from multimodal_flows_tpu.utils.logger import SimpleLogger as log

    enable_compilation_cache()

    W = args.width
    cfg = Config(model="ParticleFormer", n_embd=256, n_inner=512, n_layer=5,
                 n_layer_fused=6, n_head=4, vocab_size=9, dim_continuous=3,
                 max_num_particles=150, batch_size=128,
                 multitask_loss="time-weighted")
    system = MMF(cfg)
    params = system.init_params(jax.random.PRNGKey(0), batch_size=2)

    rng = np.random.default_rng(0)

    def packed_batch(B):
        """AOJ-like packed rows: ~3 jets/row behind a segment mask."""
        segs = np.full((B, W), -1, np.int32)
        masks = np.zeros((B, W, 1), np.int64)
        sid = 0
        for b in range(B):
            pos = 0
            while pos < W - 8:
                n = int(np.clip(rng.poisson(40), 3, W - pos))
                segs[b, pos:pos + n] = sid
                masks[b, pos:pos + n] = 1
                sid += 1
                pos += n
        return masks, segs

    ts, dt = time_grid(cfg.time_eps, args.steps)

    def timed(fn, *a):
        outs = []
        for _ in range(args.reps):
            t0 = time.time()
            out = fn(*a)
            float(jax.tree.leaves(out)[0].ravel()[-1])  # force completion
            outs.append(time.time() - t0)
        return float(np.median(outs)) / args.steps * 1e3  # ms/step

    results = {"steps": args.steps, "width": W, "variants": {}}

    def make_state(B, masks, segs):
        k = jax.random.PRNGKey(1)
        cont = jax.random.normal(k, (B, W, 3), jnp.float32) * masks
        toks = (jax.random.randint(k, (B, W, 1), 1, 9) * masks).astype(jnp.int32)
        return MultiModal(time=jnp.zeros((B,), jnp.float32),
                          continuous=cont, discrete=toks,
                          mask=jnp.asarray(masks, jnp.int32))

    for B in (32, 64, 128, 256):
        masks, segs = packed_batch(B)
        state = make_state(B, masks, segs)
        segs_dev = jnp.asarray(segs)

        # ---- full production body (simulate)
        @jax.jit
        def full(p, src, key):
            with fast_inference_softmax():
                return system.simulate(p, key, src, args.steps,
                                       segments=segs_dev, num_segments=None)

        ms_full = timed(full, params, state, jax.random.PRNGKey(2))
        results["variants"][f"full_B{B}"] = round(ms_full, 4)
        log.info(f"B={B} full: {ms_full:.3f} ms/step")

        if B != 128:
            continue

        # ---- forward only: heads folded into the carry, no solver
        def apply_fn(s):
            return system.module.apply(params, s, segments=segs_dev)

        @jax.jit
        def fwd_only(p, src):
            def body(carry, t):
                s, acc = carry
                s = s.replace(time=jnp.full((B,), t, jnp.float32))
                with fast_inference_softmax():
                    vt, logits = system.module.apply(p, s, segments=segs_dev)
                return (s, acc + vt.sum() + logits.sum()), None

            (s, acc), _ = jax.lax.scan(body, (src, jnp.float32(0.0)), ts)
            return acc

        ms_fwd = timed(fwd_only, params, state)
        results["variants"]["fwd_only_B128"] = round(ms_fwd, 4)
        log.info(f"B={B} fwd_only: {ms_fwd:.3f} ms/step")

        # ---- solver only: constant heads, full solver math
        from multimodal_flows_tpu.dynamics.solvers import HybridSolver
        from multimodal_flows_tpu.dynamics.solvers import simulate as sim_fn

        const_vt = jnp.zeros((B, W, 3), jnp.float32)
        const_logits = jnp.linspace(-1, 1, 9, dtype=jnp.float32)[None, None, :] \
            * jnp.ones((B, W, 1), jnp.float32)

        stub_solver = HybridSolver(lambda s: (const_vt, const_logits),
                                   system.bridge_discrete, cfg.vocab_size)

        @jax.jit
        def solver_only(src, key):
            return sim_fn(key, stub_solver, src, args.steps, cfg.time_eps)

        ms_solver = timed(solver_only, state, jax.random.PRNGKey(3))
        results["variants"]["solver_only_B128"] = round(ms_solver, 4)
        log.info(f"B={B} solver_only: {ms_solver:.3f} ms/step")

        # ---- empty scan floor
        @jax.jit
        def empty(src):
            def body(carry, t):
                return carry.replace(
                    continuous=carry.continuous + t), None
            s, _ = jax.lax.scan(body, src, ts)
            return s.continuous

        ms_empty = timed(empty, state)
        results["variants"]["empty_scan_B128"] = round(ms_empty, 4)
        log.info(f"B={B} empty scan: {ms_empty:.3f} ms/step")

        # ---- full with use_final_max_rates (rates carried)
        @jax.jit
        def full_rates(p, src, key):
            with fast_inference_softmax():
                return system.simulate(p, key, src, args.steps,
                                       segments=segs_dev,
                                       use_final_max_rates=True)

        ms_fr = timed(full_rates, params, state, jax.random.PRNGKey(2))
        results["variants"]["full_maxrates_B128"] = round(ms_fr, 4)
        log.info(f"B={B} full+maxrates: {ms_fr:.3f} ms/step")

        # ---- scan unroll: amortize per-iteration fixed cost (semantics
        # pinned unchanged by tests/test_solvers.py unroll tests)
        for u in (2, 4):
            @jax.jit
            def full_unroll(p, src, key, _u=u):
                with fast_inference_softmax():
                    return system.simulate(p, key, src, args.steps,
                                           segments=segs_dev, unroll=_u)

            ms_u = timed(full_unroll, params, state, jax.random.PRNGKey(2))
            results["variants"][f"full_B128_unroll{u}"] = round(ms_u, 4)
            log.info(f"B={B} full unroll={u}: {ms_u:.3f} ms/step")

    # ---- linear fit t(B) = a + b*B over the full variants
    Bs = np.array([32, 64, 128, 256], float)
    ys = np.array([results["variants"][f"full_B{int(b)}"] for b in Bs])
    b_fit, a_fit = np.polyfit(Bs, ys, 1)
    results["fit"] = {"fixed_ms_per_step": round(float(a_fit), 4),
                      "ms_per_row": round(float(b_fit), 6),
                      "note": "t(B) = fixed + ms_per_row * B over full_B*"}
    log.info(f"fit: fixed {a_fit:.3f} ms/step + {b_fit*128:.3f} ms per 128 rows")

    # ---- end-to-end jets/s at B 128 vs 256 (bench grid)
    if not args.skip_e2e:
        from multimodal_flows_tpu.dynamics.solvers import set_scan_unroll
        from multimodal_flows_tpu.sampling.generator import generate_packed

        n = np.clip(np.random.default_rng(0).poisson(40, size=2048), 3, 150)
        pad_masks = (np.arange(150)[None, :] < n[:, None]).astype(np.int64)[..., None]
        for B, unroll in ((128, 1), (256, 1), (128, 2), (128, 4)):
            set_scan_unroll(unroll)
            try:
                res = generate_packed(system, params, pad_masks,
                                      num_timesteps=1000,
                                      pack_width=W, batch_size=B, seed=1,
                                      max_dispatch_steps=16_000)
                res2 = generate_packed(system, params, pad_masks,
                                       num_timesteps=1000,
                                       pack_width=W, batch_size=B, seed=2,
                                       max_dispatch_steps=16_000)
            finally:
                set_scan_unroll(1)
            jps = max(res.jets_per_sec, res2.jets_per_sec)
            tag = f"e2e_jets_per_sec_B{B}" + (f"_unroll{unroll}"
                                              if unroll > 1 else "")
            results[tag] = round(jps, 2)
            log.info(f"e2e B={B} unroll={unroll}: {jps:.1f} jets/s")

    os.makedirs(os.path.dirname(args.out_json), exist_ok=True)
    json.dump(results, open(args.out_json, "w"), indent=1)
    print(json.dumps(results, indent=1))


if __name__ == "__main__":
    main()
