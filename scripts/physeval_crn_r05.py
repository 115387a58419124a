"""Common-random-numbers fix for the in-training physics eval (round 5).

CLOSURE_r05 run 1 showed the 250-step protocol (validated post-hoc in
round 4 on saved slots) STILL mis-ranks in-training: `best_physics`
picked epoch 230 (W1(pt) 1.94 at 50k/500) over the end-of-cosine EMA
(0.89).  Diagnosis: the trainer reseeded the generator every eval
(`seed = cfg.seed + 104729*(epoch+1)`), so each of the 30 in-training
scores carries the full 2k-jet sampling variance and the argmin selects
a noise dip (winner's curse over 30 draws).

This script validates the fix BEFORE paying for a retrain: it re-scores
the saved run-1 checkpoints (epochs 170/220/230/250/280/300) under
common random numbers — one FIXED generation seed shared by every eval —
across protocols (steps, jets) x several fixed seeds, and checks each
protocol's ranking against the 50k-jet/500-step ground truth
(ablation_*.json: ep230 1.94, ep250 1.06, ep300 0.89).

A protocol passes when, for EVERY fixed seed, the combined normed score
ranks ep300 (`last`) strictly best among {ep230, ep250, ep300} — i.e.
the exact comparison the slot got wrong in runs r04 and r05-1.

Reference monitors being replaced: `/root/reference/scripts/train_mmf.py:128-148`.

Usage: python scripts/physeval_crn_r05.py   # after closure_r05.py run 1
"""

from __future__ import annotations

import argparse
import itertools
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--workdir", default="/tmp/closure_r05")
    p.add_argument("--experiment_id", default="r05flagship")
    p.add_argument("--seeds", type=int, nargs="*", default=[101, 102, 103])
    p.add_argument("--out_md", default="PHYSEVAL_CRN_r05.md")
    p.add_argument("--out_json", default="closure_r05/physeval_crn.json")
    args = p.parse_args(argv)

    from multimodal_flows_tpu.config import Config
    from multimodal_flows_tpu.data.datasets import ArrayDataset
    from multimodal_flows_tpu.data.state import DataCoupling, MultiModal
    from multimodal_flows_tpu.train.physics_eval import (
        physics_metrics, reference_observables)
    from multimodal_flows_tpu.train.systems import MMF
    from multimodal_flows_tpu.train.trainer import Trainer
    from multimodal_flows_tpu.utils import enable_compilation_cache
    from multimodal_flows_tpu.utils.logger import SimpleLogger as log

    enable_compilation_cache()
    cfg = Config.load(os.path.join(args.workdir, "closure", args.experiment_id))
    system = MMF(cfg)
    trainer = Trainer(system, cfg, mesh=None)

    # the exact val slice the in-training eval scored against
    jets = MultiModal.load_from(os.path.join(args.workdir, "featurized_train.h5"))
    ds = ArrayDataset(DataCoupling(source=MultiModal(mask=jets.mask), target=jets))
    _, val_ds = ds.split(0.97, seed=0)
    target = val_ds.coupling.target

    # checkpoints saved by run 1 (slot links + top-k runners-up)
    ckpts = ["last", "best", "best_mse", "best_physics-ep220",
             "best-ep170", "best_mse-ep280"]
    epochs = {"last": 300, "best": 230, "best_mse": 250,
              "best_physics-ep220": 220, "best-ep170": 170,
              "best_mse-ep280": 280}
    # 50k/500 ground truth from run 1's ablation (seed 7)
    truth = {}
    for slot, name in [("best", "best"), ("best_mse", "best_mse"),
                       ("last", "last")]:
        f = os.path.join(args.workdir, f"ablation_{name}.json")
        if os.path.exists(f):
            truth[slot] = json.load(open(f))["pt"]

    params = {}
    for name in ckpts:
        try:
            params[name] = trainer.load_for_inference(name)
        except Exception as e:
            log.warn(f"checkpoint {name}: {e!r}")

    protocols = [(250, 2000), (500, 2000), (500, 5000)]
    ref_cache = {}
    results = {}  # (steps, n, seed) -> {ckpt: combined}
    for steps, n in protocols:
        if n not in ref_cache:
            nn = min(n, len(target))
            ref_cache[n] = (reference_observables(target, cfg.metadata, nn),
                            np.asarray(target.mask)[:nn])
        ref_obs, masks = ref_cache[n]
        for seed in args.seeds:
            key = f"steps{steps}_n{n}_seed{seed}"
            results[key] = {}
            for name, prm in params.items():
                m = physics_metrics(system, prm, ref_obs, masks,
                                    num_timesteps=steps,
                                    metadata=cfg.metadata,
                                    batch_size=cfg.batch_size, seed=seed,
                                    mesh=None, pack_width=cfg.pack_width)
                results[key][name] = {k.removeprefix("val_"): round(v, 5)
                                      for k, v in m.items()}
                log.info(f"{key} {name} (ep{epochs[name]}): "
                         f"{m['val_w1_physics']:.5f} "
                         f"(pt {m['val_w1_pt']:.3f})")

    # ---- verdict per protocol: does every seed rank ep300 best among
    # the three ground-truthed checkpoints?
    verdicts = {}
    for steps, n in protocols:
        ok_all, per_seed = True, {}
        for seed in args.seeds:
            key = f"steps{steps}_n{n}_seed{seed}"
            scores = {c: results[key][c]["w1_physics"]
                      for c in ("last", "best", "best_mse")
                      if c in results[key]}
            ranked = sorted(scores, key=scores.get)
            per_seed[seed] = {"ranking": ranked, "scores": scores,
                              "last_first": ranked[0] == "last"}
            ok_all &= ranked[0] == "last"
        verdicts[f"steps{steps}_n{n}"] = {"passes": ok_all,
                                          "per_seed": per_seed}
        log.info(f"protocol steps={steps} n={n}: "
                 f"{'PASS' if ok_all else 'FAIL'}")

    out = {"ground_truth_w1pt_50k_500": truth, "epochs": epochs,
           "results": results, "verdicts": verdicts}
    os.makedirs(os.path.dirname(args.out_json), exist_ok=True)
    json.dump(out, open(args.out_json, "w"), indent=1)

    # ---- report
    lines = [
        "# Physics-eval protocol under common random numbers (round 5)", "",
        "CLOSURE_r05 run 1: the 250-step in-training eval still mis-ranked",
        "because the trainer reseeded the generator per eval — each of the",
        "30 scores carried the full 2k-jet sampling variance and the argmin",
        "picked a noise dip.  Here every saved run-1 checkpoint is re-scored",
        "with ONE fixed generation seed per column (common random numbers):",
        "scores in a column differ only through the params, so the shared",
        "sampling noise cancels in the ranking.", "",
        "Ground truth (50k jets / 500 steps, run-1 ablation): "
        + ", ".join(f"ep{epochs[k]} -> W1(pt) {v:.3g}"
                    for k, v in sorted(truth.items(), key=lambda kv: epochs[kv[0]])),
        "",
    ]
    for steps, n in protocols:
        v = verdicts[f"steps{steps}_n{n}"]
        lines.append(f"## {steps} steps x {n:,} jets — "
                     f"{'PASS' if v['passes'] else 'FAIL'}")
        lines.append("")
        hdr = "| checkpoint | epoch | " + " | ".join(
            f"seed {s}" for s in args.seeds) + " |"
        lines.append(hdr)
        lines.append("|---" * (2 + len(args.seeds)) + "|")
        for name in sorted(params, key=lambda c: epochs[c]):
            row = [name, str(epochs[name])]
            for seed in args.seeds:
                key = f"steps{steps}_n{n}_seed{seed}"
                row.append(f"{results[key][name]['w1_physics']:.5f}")
            lines.append("| " + " | ".join(row) + " |")
        lines.append("")
        lines.append("per-seed ranking of the ground-truthed trio "
                     "(truth: last < best_mse < best): "
                     + "; ".join(
                         f"seed {s}: {' < '.join(ps['ranking'])}"
                         for s, ps in v["per_seed"].items()))
        lines.append("")
    lines.append("Raw numbers: `closure_r05/physeval_crn.json`.")
    open(args.out_md, "w").write("\n".join(lines) + "\n")
    log.info(f"wrote {args.out_md}")
    print(json.dumps({k: v["passes"] for k, v in verdicts.items()}, indent=1))


if __name__ == "__main__":
    main()
