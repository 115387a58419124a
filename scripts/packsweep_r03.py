"""Round-3 packing ablation: jets/s vs (pack_width, batch_size).

Measures the packed sampler on the bench workload (Poisson(40) AOJ-like
multiplicities, 1000 ODE steps) across the pack-width / batch grid to pick
bench.py's operating point.  Results recorded in PROFILE_r03.md.
"""

from __future__ import annotations

import json
import sys

import numpy as np

NUM_JETS = 1024
NUM_TIMESTEPS = 1000


def main():
    import jax

    from multimodal_flows_tpu.utils import enable_compilation_cache

    enable_compilation_cache()

    from multimodal_flows_tpu.config import Config
    from multimodal_flows_tpu.sampling.generator import generate_packed, pack_jets
    from multimodal_flows_tpu.train.systems import MMF

    cfg = Config(model="ParticleFormer", n_embd=256, n_inner=512, n_layer=5,
                 n_layer_fused=6, n_head=4, vocab_size=9, dim_continuous=3,
                 max_num_particles=150, batch_size=256,
                 multitask_loss="time-weighted")
    system = MMF(cfg)
    params = system.init_params(jax.random.PRNGKey(0), batch_size=2)

    rng = np.random.default_rng(0)
    n = np.clip(rng.poisson(40, size=NUM_JETS), 3, cfg.max_num_particles)
    pad_masks = (np.arange(cfg.max_num_particles)[None, :] < n[:, None]
                 ).astype(np.int64)[..., None]

    grid = [(128, 256), (128, 128), (128, 384), (112, 256), (96, 256), (64, 256)]
    if len(sys.argv) > 1:
        grid = [tuple(map(int, g.split("x"))) for g in sys.argv[1].split(",")]

    for W, B in grid:
        _, _, n_rows = pack_jets(n, W)
        fill = n.sum() / max(n_rows * W, 1)
        res = generate_packed(system, params, pad_masks,
                              num_timesteps=NUM_TIMESTEPS, pack_width=W,
                              batch_size=B, seed=0)  # warmup/compile
        best = max(generate_packed(system, params, pad_masks,
                                   num_timesteps=NUM_TIMESTEPS, pack_width=W,
                                   batch_size=B, seed=s).jets_per_sec
                   for s in (1, 2))
        print(json.dumps({"pack_width": W, "batch": B, "rows": n_rows,
                          "fill": round(float(fill), 3),
                          "jets_per_sec": round(best, 2)}), flush=True)


if __name__ == "__main__":
    main()
