"""Packed vs bucketed sampling throughput per encoder (VERDICT r3 #2/#3).

Round 3 left the pairwise-bias encoders (KinFormer+Lund, co-occurrence)
and EPiC on the bucketed fallback; round 4 moved them onto the packed
path (chunked Lund pair-MLP, project-before-gather co-occurrence bias,
per-segment EPiC pooling).  This script loads each trained round-4
encoder experiment (from `scripts/encoder_closures_r04.py`) and times
`generate_packed` vs the `generate_bucketed` fallback on the same masks,
reporting jets/s for both.

Usage: python scripts/encoder_packed_vs_bucketed.py [--num_jets 2000]
Appends a markdown table to ENCODER_CLOSURES_r04.md.
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--dir", default="/tmp/encoders_r04")
    p.add_argument("--num_jets", type=int, default=2000)
    p.add_argument("--num_timesteps", type=int, default=200)
    p.add_argument("--out_md", default="ENCODER_CLOSURES_r04.md")
    args = p.parse_args(argv)

    import yaml

    from multimodal_flows_tpu.config import Config
    from multimodal_flows_tpu.data.aoj import (AspenOpenJets,
                                               sample_from_empirical_masks)
    from multimodal_flows_tpu.sampling.generator import (generate_bucketed,
                                                         generate_packed)
    from multimodal_flows_tpu.train.systems import build_system
    from multimodal_flows_tpu.train.trainer import Trainer
    from multimodal_flows_tpu.utils import enable_compilation_cache
    from multimodal_flows_tpu.utils.logger import SimpleLogger as log

    enable_compilation_cache()

    aoj = AspenOpenJets(args.dir, "RunG_synth_r04test.h5")
    test, _ = aoj(num_jets=5_000, max_num_particles=64, transform=None)
    masks = sample_from_empirical_masks(np.asarray(test.mask), args.num_jets,
                                        64, seed=11)

    rows = []
    for exp_dir in sorted(glob.glob(os.path.join(args.dir, "enc", "*"))):
        cfg_path = os.path.join(exp_dir, "config.yaml")
        if not os.path.exists(cfg_path):
            continue
        raw = yaml.safe_load(open(cfg_path))
        cfg = Config.load(exp_dir)
        kind = "MMF"
        for t in raw.get("tags") or []:
            if t.startswith("system:"):
                kind = t.split(":", 1)[1]
        system = build_system(cfg, kind)
        trainer = Trainer(system, cfg, mesh=None)
        params = trainer.load_for_inference("last")
        name = (f"{cfg.model}"
                + (" +pairwise" if getattr(cfg, "use_pairwise", False) else "")
                + (" +coocc" if getattr(cfg, "use_coocurrence", False) else "")
                + (" +posemb" if getattr(cfg, "use_pos_emb", False) else ""))

        res_p = generate_packed(system, params, masks,
                                num_timesteps=args.num_timesteps,
                                batch_size=256, seed=3, metadata=cfg.metadata)
        res_b = generate_bucketed(system, params, masks,
                                  num_timesteps=args.num_timesteps,
                                  batch_size=256, seed=3, metadata=cfg.metadata)
        # warm-cache repeats (first calls pay compile)
        res_p = generate_packed(system, params, masks,
                                num_timesteps=args.num_timesteps,
                                batch_size=256, seed=4, metadata=cfg.metadata)
        res_b = generate_bucketed(system, params, masks,
                                  num_timesteps=args.num_timesteps,
                                  batch_size=256, seed=4, metadata=cfg.metadata)
        rows.append({"encoder": name, "system": kind,
                     "packed": round(res_p.jets_per_sec, 1),
                     "bucketed": round(res_b.jets_per_sec, 1),
                     "speedup": round(res_p.jets_per_sec /
                                      max(res_b.jets_per_sec, 1e-9), 2)})
        log.info(f"{name}: packed {rows[-1]['packed']} vs bucketed "
                 f"{rows[-1]['bucketed']} jets/s ({rows[-1]['speedup']}x)")

    md = ["", "## Packed vs bucketed sampling (round-4 fast path, "
          f"{args.num_jets:,} jets @{args.num_timesteps} steps)",
          "",
          "| encoder | system | packed jets/s | bucketed jets/s | speedup |",
          "|---|---|---|---|---|"]
    for r in rows:
        md.append(f"| {r['encoder']} | {r['system']} | {r['packed']} | "
                  f"{r['bucketed']} | {r['speedup']}x |")
    md.append("")
    md.append("(`use_pos_emb` models route to the bucketed path by design — "
              "learned absolute positions are incompatible with packed rows.)")
    with open(os.path.join(REPO, args.out_md), "a") as f:
        f.write("\n".join(md) + "\n")
    print(json.dumps(rows, indent=1))


if __name__ == "__main__":
    main()
