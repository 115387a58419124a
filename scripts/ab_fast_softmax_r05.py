"""Trained-scale A/B test of `fast_inference_softmax` (VERDICT r4 #9).

The sampling drivers skip the softmax max-subtract passes over the
(B,H,T,T) score tensor (`ops/attention.py:_xla_attention_btc`), exact
whenever no exp overflows — an analytic argument tied to the qk-LN score
bound.  This script turns the argument into a measurement: generate the
same jets from the round-5 flagship checkpoint with the fast path ON and
OFF (same masks, same seed, identical trajectories modulo the softmax
impl) and compare at the distribution level against the held-out test
slice, plus directly against each other.

Equivalence bar: the ON/OFF W1 deltas must sit inside the sampling-seed
noise floor measured by closure_r05.py's repeat-seed runs (CLOSURE_r05.md).

Reference behavior being accelerated: the reference runs torch SDPA's
exact softmax at inference (`/root/reference/multimodal_flows/networks/attention.py:68-69`).

Usage: python scripts/ab_fast_softmax_r05.py     # after closure_r05.py
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--workdir", default="/tmp/closure_r05")
    p.add_argument("--experiment_id", default="r05flagship")
    p.add_argument("--num_jets", type=int, default=10_000)
    p.add_argument("--num_timesteps", type=int, default=500)
    p.add_argument("--out_md", default="AB_FAST_SOFTMAX_r05.md")
    p.add_argument("--out_json", default="closure_r05/ab_fast_softmax.json")
    args = p.parse_args(argv)

    from multimodal_flows_tpu.config import Config
    from multimodal_flows_tpu.data.aoj import sample_from_empirical_masks
    from multimodal_flows_tpu.data.state import MultiModal
    from multimodal_flows_tpu.ops.attention import force_exact_softmax
    from multimodal_flows_tpu.sampling.generator import generate_packed
    from multimodal_flows_tpu.train.systems import MMF
    from multimodal_flows_tpu.train.trainer import Trainer
    from multimodal_flows_tpu.utils import enable_compilation_cache
    from multimodal_flows_tpu.utils.jet_features import JetFeatures
    from multimodal_flows_tpu.utils.metrics import wasserstein1d
    from multimodal_flows_tpu.utils.logger import SimpleLogger as log

    enable_compilation_cache()
    cfg = Config.load(os.path.join(
        args.workdir, "closure", args.experiment_id))
    metadata = cfg.metadata
    system = MMF(cfg)
    trainer = Trainer(system, cfg, mesh=None)
    params = trainer.load_for_inference("last")

    test_jets = MultiModal.load_from(
        os.path.join(args.workdir, "featurized_test.h5"))
    masks = sample_from_empirical_masks(
        np.asarray(test_jets.mask), args.num_jets,
        cfg.max_num_particles, seed=23)
    feats_r = JetFeatures(test_jets)
    mult_r = (np.asarray(test_jets.discrete)[..., 0] > 0).sum(axis=1)

    results = {}
    samples = {}
    for mode, off in [("fast", False), ("exact", True)]:
        force_exact_softmax(off)
        t0 = time.time()
        res = generate_packed(system, params, masks,
                              num_timesteps=args.num_timesteps,
                              batch_size=cfg.batch_size, seed=29,
                              metadata=metadata)
        fg = JetFeatures(res.sample)
        mult_g = (np.asarray(res.sample.discrete)[..., 0] > 0).sum(axis=1)
        results[mode] = {
            "w1_pt": fg.Wassertein1D("pt", feats_r),
            "w1_mass": fg.Wassertein1D("m", feats_r),
            "w1_mult": wasserstein1d(mult_g.astype(float),
                                     mult_r.astype(float)),
            "jets_per_sec": round(res.jets_per_sec, 1),
            "wall_s": round(time.time() - t0, 1),
        }
        samples[mode] = res.sample
        log.info(f"{mode}: {results[mode]}")
    force_exact_softmax(False)

    # direct fast-vs-exact distribution distance (same seed, same masks)
    fa, ex = JetFeatures(samples["fast"]), JetFeatures(samples["exact"])
    mult_f = (np.asarray(samples["fast"].discrete)[..., 0] > 0).sum(axis=1)
    mult_e = (np.asarray(samples["exact"].discrete)[..., 0] > 0).sum(axis=1)
    direct = {
        "w1_pt": fa.Wassertein1D("pt", ex),
        "w1_mass": fa.Wassertein1D("m", ex),
        "w1_mult": wasserstein1d(mult_f.astype(float), mult_e.astype(float)),
    }
    log.info(f"fast-vs-exact direct: {direct}")

    # pull the seed noise floor from the closure, if present
    floor = None
    for cpath in ("closure_r05/run2/metrics.json", "closure_r05/metrics.json"):
        if os.path.exists(cpath):
            st = json.load(open(cpath)).get("seed_stats", {})
            if "last" in st:
                floor = {"pt": st["last"]["pt"]["spread"],
                         "mass": st["last"]["mass"]["spread"]}
            break

    out = {"num_jets": args.num_jets, "num_timesteps": args.num_timesteps,
           "checkpoint": "last", "results": results, "fast_vs_exact": direct,
           "seed_noise_floor_50k": floor}
    os.makedirs(os.path.dirname(args.out_json), exist_ok=True)
    json.dump(out, open(args.out_json, "w"), indent=1)

    d_pt = abs(results["fast"]["w1_pt"] - results["exact"]["w1_pt"])
    d_m = abs(results["fast"]["w1_mass"] - results["exact"]["w1_mass"])
    floor_txt = (f"seed-noise spread at 50k jets: W1(pt) {floor['pt']:.3f}, "
                 f"W1(mass) {floor['mass']:.3f} (CLOSURE_r05.md)"
                 if floor else "closure seed stats not found")
    md = f"""# fast_inference_softmax A/B at trained scale (round 5)

{args.num_jets:,} jets @{args.num_timesteps} tau-leap steps from the
round-5 flagship `last` checkpoint, identical conditioning masks and
sampling seed; only the attention softmax implementation differs
(`ops/attention.py:_xla_attention_btc` unnormalized-exp path vs exact
`jax.nn.softmax`).  Reference behavior: exact SDPA softmax
(`/root/reference/multimodal_flows/networks/attention.py:68-69`).

| path | W1(pt) vs test | W1(mass) vs test | W1(mult) vs test | jets/s |
|---|---|---|---|---|
| fast (unnormalized) | {results['fast']['w1_pt']:.4g} | {results['fast']['w1_mass']:.4g} | {results['fast']['w1_mult']:.4g} | {results['fast']['jets_per_sec']} |
| exact softmax | {results['exact']['w1_pt']:.4g} | {results['exact']['w1_mass']:.4g} | {results['exact']['w1_mult']:.4g} | {results['exact']['jets_per_sec']} |

ON/OFF deltas: W1(pt) {d_pt:.4g}, W1(mass) {d_m:.4g}; {floor_txt}.

Direct fast-vs-exact sample distance (same seed): W1(pt)
{direct['w1_pt']:.4g}, W1(mass) {direct['w1_mass']:.4g}, W1(mult)
{direct['w1_mult']:.4g}.

Raw numbers: `{args.out_json}`.
"""
    open(args.out_md, "w").write(md)
    log.info(f"wrote {args.out_md}")


if __name__ == "__main__":
    main()
