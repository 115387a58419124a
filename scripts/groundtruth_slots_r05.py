"""Ground-truth check for the round-5 checkpoint-slot ablation: is ep230
(`best`/`best_physics`) REALLY worse than ep300 (`last`) at 50k/500, or was
the run-1 single-seed ablation (1.94 vs 0.89, seed 7) itself a noise draw?

Motivation: PHYSEVAL_CRN_r05 re-scored the saved run-1 checkpoints under
common random numbers at 2k-5k jets and found ep230 ranking EQUAL OR BETTER
than ep300 when averaged over 3 fixed seeds — contradicting the 50k seed-7
"ground truth".  One of the two measurements is noise; this script settles
it by re-sampling the named slots at 50k jets / 500 steps with extra seeds,
the exact ablation protocol of scripts/closure_r05.py (same empirical masks
drawn with seed 3, same held-out reference).

The repeat-seed half-spread for `last` is +/-0.15 (CLOSURE_r05.md); if
ep230's mean over seeds sits ~1.9 it is truly worse and the in-training
eval needs more discriminating power; if it sits ~1.0 the slot did NOT
mis-rank and the run-1 verdict gets revised.

Reference metric being trusted: W1(jet pt) as in
`/root/reference/multimodal_flows/utils/aoj.py:507-510`.

Usage: python scripts/groundtruth_slots_r05.py --slots best best_mse --seeds 11 13
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def _token_mult(sample) -> np.ndarray:
    toks = np.asarray(sample.discrete)[..., 0]
    return (toks > 0).sum(axis=1).astype(np.float64)


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--workdir", default="/tmp/closure_r05")
    p.add_argument("--experiment_id", default="r05flagship")
    p.add_argument("--slots", nargs="*", default=["best", "best_mse"])
    p.add_argument("--seeds", type=int, nargs="*", default=[11, 13])
    p.add_argument("--gen_jets", type=int, default=50_000)
    p.add_argument("--num_timesteps", type=int, default=500)
    p.add_argument("--batch_size", type=int, default=256)
    p.add_argument("--max_p", type=int, default=64)
    p.add_argument("--out_json", default="closure_r05/groundtruth_slots.json")
    args = p.parse_args(argv)

    from multimodal_flows_tpu.config import Config
    from multimodal_flows_tpu.data.aoj import sample_from_empirical_masks
    from multimodal_flows_tpu.data.state import MultiModal
    from multimodal_flows_tpu.sampling.generator import generate_packed
    from multimodal_flows_tpu.train.systems import MMF
    from multimodal_flows_tpu.train.trainer import Trainer
    from multimodal_flows_tpu.utils import enable_compilation_cache
    from multimodal_flows_tpu.utils.jet_features import JetFeatures
    from multimodal_flows_tpu.utils.logger import SimpleLogger as log
    from multimodal_flows_tpu.utils.metrics import wasserstein1d

    enable_compilation_cache()
    cfg = Config.load(os.path.join(args.workdir, "closure", args.experiment_id))
    metadata = json.load(open(os.path.join(args.workdir, "featurized_meta.json")))
    test_jets = MultiModal.load_from(os.path.join(args.workdir, "featurized_test.h5"))
    system = MMF(cfg)
    trainer = Trainer(system, cfg, mesh=None)

    # identical conditioning masks to the run-1 ablation (seed 3)
    masks = sample_from_empirical_masks(
        np.asarray(test_jets.mask), args.gen_jets, args.max_p, seed=3)
    feats_r = JetFeatures(test_jets)
    mult_r = _token_mult(test_jets)

    rows = {}
    for name in args.slots:
        params = trainer.load_for_inference(name)
        for seed in args.seeds:
            tag = f"{name}" if seed == 7 else f"{name}_seed{seed}"
            slot_json = os.path.join(args.workdir, f"ablation_{tag}.json")
            if os.path.exists(slot_json):
                rows[tag] = json.load(open(slot_json))
                log.info(f"{tag}: cached {rows[tag]}")
                continue
            t0 = time.time()
            res = generate_packed(system, params, masks,
                                  num_timesteps=args.num_timesteps,
                                  batch_size=args.batch_size, seed=seed,
                                  metadata=metadata)
            fg = JetFeatures(res.sample)
            rows[tag] = {
                "pt": fg.Wassertein1D("pt", feats_r),
                "mass": fg.Wassertein1D("m", feats_r),
                "multiplicity": wasserstein1d(_token_mult(res.sample), mult_r),
                "jets_per_sec": round(res.jets_per_sec, 1),
                "gen_seconds": round(time.time() - t0, 1),
            }
            json.dump(rows[tag], open(slot_json, "w"))
            log.info(f"{tag}: {rows[tag]}")

    # merge with the seed-7 ablation rows already on disk
    for name in args.slots + ["last"]:
        f = os.path.join(args.workdir, f"ablation_{name}.json")
        if os.path.exists(f):
            rows.setdefault(name, json.load(open(f)))

    os.makedirs(os.path.dirname(args.out_json), exist_ok=True)
    json.dump(rows, open(args.out_json, "w"), indent=1)
    print(json.dumps(rows, indent=1))


if __name__ == "__main__":
    main()
