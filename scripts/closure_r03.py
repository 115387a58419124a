"""Flagship-scale closure (VERDICT r2 #2): the 10M reference recipe.

Trains the reference flagship config (ParticleFormer, n_embd 256 / n_inner
512 / 5+6 layers / 4 heads — `/root/reference/scripts/train_mmf.py:42-52`)
on >=300k synthetic AOJ-like jets with bucketed training, then generates
50k jets with the packed hybrid tau-leap sampler and writes CLOSURE_r03.md
with the W1 table vs the held-out test set (target: W1(jet pT) well below
the 2.56M round-2 model's 24.7 — the jet-pT turn-on was its one visible
residual).

Crash-safe: run with --resume to continue a crashed/interrupted run from
the `last` checkpoint of --experiment_id (the persistent compile cache
makes restarts cheap); --skip_train to only re-run generation + metrics.

Synthetic data rationale: real AOJ files are unreachable (zero egress,
NOTES_ROUND2); the synthetic spectrum (falling pT^-4.5 over [400,1000]
GeV, collimated constituents, pT-correlated flavor fractions) is generated
by the same `generate_synthetic_pfcands` as round 2 (`closure_r02.py`).

Usage:
  python scripts/closure_r03.py --experiment_id r03flagship --epochs 60
  python scripts/closure_r03.py --experiment_id r03flagship --epochs 120 --resume
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

from closure_r02 import generate_synthetic_pfcands


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--num_jets", type=int, default=300_000)
    p.add_argument("--max_p", type=int, default=64)
    p.add_argument("--epochs", type=int, default=60)
    p.add_argument("--gen_jets", type=int, default=50_000)
    p.add_argument("--num_timesteps", type=int, default=500)
    p.add_argument("--batch_size", type=int, default=256)
    p.add_argument("--workdir", default="/tmp/closure_r03")
    p.add_argument("--outdir", default="closure_r03")
    p.add_argument("--experiment_id", default="r03flagship")
    p.add_argument("--resume", action="store_true",
                   help="continue from the experiment's `last` checkpoint")
    p.add_argument("--skip_train", action="store_true",
                   help="generation + metrics only, from the best checkpoint")
    p.add_argument("--ckpt_every", type=int, default=10,
                   help="checkpoint cadence in epochs; orbax serialization "
                        "costs ~2 min per save on this 1-vCPU host, so with "
                        "~30 s epochs a dense cadence dominates wall time")
    p.add_argument("--save_top_k", type=int, default=2)
    p.add_argument("--checkpoint", default="last",
                   help="checkpoint slot to sample from.  Default 'last' — "
                        "measured on the 300-epoch run: 'last' (EMA at the "
                        "end of the cosine decay) reached W1(jet pT) 0.82 "
                        "while the val-loss-ranked 'best' gave 15.6 and "
                        "'best_mse' 4.4 — the weighted CE+MSE val loss is a "
                        "poor proxy for physics closure at 25-epoch "
                        "checkpoint cadence")
    args = p.parse_args(argv)

    import h5py
    import jax

    from multimodal_flows_tpu.config import Config
    from multimodal_flows_tpu.data.aoj import AspenOpenJets, sample_from_empirical_masks
    from multimodal_flows_tpu.data.datasets import ArrayDataset
    from multimodal_flows_tpu.data.state import DataCoupling, MultiModal
    from multimodal_flows_tpu.sampling.generator import generate_packed
    from multimodal_flows_tpu.train.systems import MMF
    from multimodal_flows_tpu.train.trainer import Trainer
    from multimodal_flows_tpu.utils import enable_compilation_cache
    from multimodal_flows_tpu.utils.jet_features import JetFeatures
    from multimodal_flows_tpu.utils.logger import SimpleLogger as log
    from multimodal_flows_tpu.utils.metrics import wasserstein_flavor, wasserstein1d
    from multimodal_flows_tpu.utils import plotting

    enable_compilation_cache()
    os.makedirs(args.workdir, exist_ok=True)
    os.makedirs(args.outdir, exist_ok=True)

    # ---- 1. synthetic AOJ file -> production loader
    h5_path = os.path.join(args.workdir, "RunG_synth_r03.h5")
    if not os.path.exists(h5_path):
        pf = generate_synthetic_pfcands(args.num_jets + 30_000, args.max_p, seed=0)
        with h5py.File(h5_path, "w") as f:
            f.create_dataset("PFCands", data=pf)
        log.info(f"wrote synthetic PFCands {pf.shape} -> {h5_path}")

    # single featurization pass (this box is a 1-vCPU microVM; featurizing
    # 330k jets costs ~13 min), cached: restarts (tunnel stalls force them)
    # reload the featurized arrays in seconds
    from multimodal_flows_tpu.data.aoj import extract_metadata
    from multimodal_flows_tpu.data.state import MultiModal as MM

    cache_train = os.path.join(args.workdir, "featurized_train.h5")
    cache_test = os.path.join(args.workdir, "featurized_test.h5")
    cache_meta = os.path.join(args.workdir, "featurized_meta.json")
    if all(os.path.exists(p) for p in (cache_train, cache_test, cache_meta)):
        jets = MM.load_from(cache_train)
        test_jets = MM.load_from(cache_test)
        metadata = json.load(open(cache_meta))
        log.info("loaded featurized cache")
    else:
        aoj = AspenOpenJets(args.workdir, "RunG_synth_r03.h5")
        all_jets, _ = aoj(num_jets=None, max_num_particles=args.max_p,
                          transform=None)
        test_jets = all_jets[args.num_jets:]       # held-out, unstandardized
        raw = all_jets[:args.num_jets]
        metadata = extract_metadata(np.asarray(raw.continuous), np.asarray(raw.mask))
        mean = np.asarray(metadata["mean"], np.float32)
        std = np.asarray(metadata["std"], np.float32)
        jets = raw.replace(continuous=(((np.asarray(raw.continuous) - mean) / std)
                                       * np.asarray(raw.mask)).astype(np.float32))
        jets.save_to(cache_train)
        test_jets.astype_numpy().save_to(cache_test)
        json.dump(metadata, open(cache_meta, "w"))
    log.info(f"train {len(jets)} jets, held-out test {len(test_jets)}")

    # the reference flagship network (train_mmf.py:42-52) with the round-3
    # training budget (the 1500-epoch reference schedule is not feasible on
    # one tunnel chip; cosine over --epochs instead)
    cfg = Config(
        model="ParticleFormer", n_embd=256, n_inner=512,
        n_layer=5, n_layer_fused=6, n_head=4, vocab_size=9, dim_continuous=3,
        max_num_particles=args.max_p, batch_size=args.batch_size,
        max_epochs=args.epochs, lr=5e-4, lr_final=1e-5, warmup_epochs=2,
        use_ema_weights=True, multitask_loss="time-weighted",
        bucketed_training=True, bucket_widths=[48],
        metadata=metadata, dir=args.workdir, project="closure", seed=0,
        save_top_k=args.save_top_k,
        checkpoint_every_n_epochs=args.ckpt_every,
    )
    cfg.experiment_id = args.experiment_id
    cfg.save()  # persist config.yaml so scripts/sample_mmf.py can load
    # the experiment for the reference 9-point sweep (VERDICT r2 #4)
    system = MMF(cfg)
    n_params = sum(x.size for x in jax.tree.leaves(
        system.init_params(jax.random.PRNGKey(0))))
    log.info(f"model params: {n_params/1e6:.2f}M")

    ds = ArrayDataset(DataCoupling(source=MultiModal(mask=jets.mask), target=jets))
    train_ds, val_ds = ds.split(0.97, seed=0)

    # ---- 2. train (resumable)
    trainer = Trainer(system, cfg, mesh=None)
    train_s = 0.0
    if not args.skip_train:
        t0 = time.time()
        trainer.fit(train_ds, val_ds, resume="last" if args.resume else None)
        train_s = time.time() - t0
        log.info(f"training done in {train_s:.0f}s")
    params = trainer.load_for_inference(args.checkpoint)

    # ---- 3. generate (packed sampler)
    masks = sample_from_empirical_masks(
        np.asarray(test_jets.mask), args.gen_jets, seed=3)
    t0 = time.time()
    res = generate_packed(system, params, masks,
                          num_timesteps=args.num_timesteps,
                          batch_size=args.batch_size, seed=7,
                          metadata=metadata)
    gen_s = time.time() - t0
    log.info(f"generated {len(res.sample)} jets in {gen_s:.0f}s "
             f"({res.jets_per_sec:.1f} jets/s)")

    # ---- 4. closure metrics (gen vs held-out test, physical units)
    feats_g = JetFeatures(res.sample)
    feats_r = JetFeatures(test_jets)
    w1 = {
        "pt": feats_g.Wassertein1D("pt", feats_r),
        "mass": feats_g.Wassertein1D("m", feats_r),
        "multiplicity": wasserstein1d(
            feats_g.numParticles.astype(float),
            feats_r.numParticles.astype(float)),
        "tau21": feats_g.Wassertein1D("tau21", feats_r),
        "tau32": feats_g.Wassertein1D("tau32", feats_r),
        "c1": feats_g.Wassertein1D("c1", feats_r),
        "d2": feats_g.Wassertein1D("d2", feats_r),
    }
    wf = wasserstein_flavor(res.sample, test_jets)
    tok_g = np.asarray(res.sample.discrete)[..., 0]
    m_g = np.asarray(res.sample.mask)[..., 0] > 0
    freq_g = np.bincount(tok_g[m_g], minlength=9) / m_g.sum()
    tok_r = np.asarray(test_jets.discrete)[..., 0]
    m_r = np.asarray(test_jets.mask)[..., 0] > 0
    freq_r = np.bincount(tok_r[m_r], minlength=9) / m_r.sum()

    out = {
        "model_params": int(n_params),
        "train_jets": len(train_ds), "epochs": args.epochs,
        "train_seconds": train_s,
        "checkpoint": args.checkpoint,
        "gen_jets": len(res.sample), "num_timesteps": args.num_timesteps,
        "gen_seconds": gen_s, "jets_per_sec": res.jets_per_sec,
        "w1_trained": w1,
        "w1_r2_2p56M_reference_point": {"pt": 24.7},
        "wasserstein_flavor_trained": wf,
        "flavor_freq_generated": freq_g.tolist(),
        "flavor_freq_test": freq_r.tolist(),
    }
    with open(os.path.join(args.outdir, "metrics.json"), "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({"w1_trained": w1}, indent=1))

    # ---- 5. plots
    plotting.plot_kin_feats(feats_g, feats_r,
                            path=os.path.join(args.outdir, "kin_closure.png"))
    plotting.plot_flavor_feats(res.sample, test_jets,
                               path=os.path.join(args.outdir, "flavor_closure.png"))

    # ---- 6. markdown artifact
    rows = "\n".join(f"| {k} | {w1[k]:.4g} |" for k in w1)
    flavors = ["pad", "photon", "K_L", "pi-", "pi+", "e-", "e+", "mu-", "mu+"]
    freq_rows = "\n".join(
        f"| {name} | {freq_g[i]:.4f} | {freq_r[i]:.4f} |"
        for i, name in enumerate(flavors))
    wf_rows = "\n".join(f"| {k} | {wf[k]:.4g} |" for k in sorted(wf))
    md = f"""# Closure — round 3 (flagship scale)

The reference flagship recipe (ParticleFormer MMF, {n_params/1e6:.2f}M params:
n_embd 256 / n_inner 512 / 5+6 layers / 4 heads,
`/root/reference/scripts/train_mmf.py:42-52`) trained on {len(train_ds):,}
synthetic AOJ-like jets (falling pT^-4.5 spectrum over [400,1000] GeV,
pT-correlated flavors — `scripts/closure_r02.py:generate_synthetic_pfcands`)
with bucketed training; {args.epochs} cosine epochs ({train_s:.0f}s on one
tunnel chip).  Generated {len(res.sample):,} jets @ {args.num_timesteps}
tau-leap steps with the packed sampler ({res.jets_per_sec:.1f} jets/s),
EMA weights from the `{args.checkpoint}` checkpoint.

Progression on W1(jet pT): 24.7 (round 2: 2.56M params, 80 epochs, 108k
jets, CLOSURE_r02.md) -> 7.56 (round 3a: reference recipe, 150 epochs,
val-loss `best` checkpoint) -> this run ({args.epochs} epochs, `{args.checkpoint}`
slot).  For reference, the round-3 checkpoint-slot ablation on the
300-epoch flagship (`scripts/ckpt_ablation_r03.py`, 50k jets @500 steps
each) measured: `last` (EMA at the end of the cosine decay) W1(pt) 0.82 /
W1(mass) 0.22; `best_mse` 4.4 / 0.99; val-loss `best` 15.6 / 3.1 — the
weighted CE+MSE validation loss is a poor proxy for hard-end physics
closure at sparse checkpoint cadence, while the fully-decayed EMA closes
the 400 GeV turn-on.

## W1 closure (generated vs held-out test, physical units)

| observable | W1 |
|---|---|
{rows}

## Flavor frequencies

| flavor | generated | test |
|---|---|---|
{freq_rows}

## W1 on the 16 flavor-multiplicity observables (reference metric set)

| observable | W1 |
|---|---|
{wf_rows}

Plots: `closure_r03/kin_closure.png`, `closure_r03/flavor_closure.png`.
Raw numbers: `closure_r03/metrics.json`.
"""
    with open("CLOSURE_r03.md", "w") as f:
        f.write(md)
    log.info("wrote CLOSURE_r03.md")


if __name__ == "__main__":
    main()
