"""Packed training at the reference-scale point: D=150, 513k train jets.

VERDICT r4 #5: PROFILE_r04 measured the 3.06x packed-training epoch win at
D=64 / 291k jets and *extrapolated* it to the D=150 / 513k-jet point where
round 3 measured 54.3 s/epoch resident bucketed (PROFILE_r03.md "Full-scale
training demo").  This driver measures it: the identical r3 workload — a
540k-jet synthetic AOJ file, 150-particle padding, flagship model, EMA,
`--train_frac 0.95` -> 513k train jets — through the production
`train_mmf.py` CLI with `--packed_training`, reporting warm-epoch times.

The packing lever at D=150: AOJ jets (mean mult ~40) pack ~3.1/row at
W=128 < D=150, so the ~3/4 zero-padding waste of bucketed D=150 rows
becomes real work.  Reference hot loop this accelerates:
`/root/reference/multimodal_flows/model/MMF.py:138-170` (everything padded
to 150, `scripts/train_mmf.py:30-33`).

Usage: python scripts/profile_packed_d150_r05.py [--epochs 4]
Writes closure_r05/packed_d150.json; the PROFILE_r05.md row is authored
from it.
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--workdir", default="/tmp/profile_d150")
    p.add_argument("--num_jets", type=int, default=540_000)
    p.add_argument("--max_p", type=int, default=150)
    p.add_argument("--epochs", type=int, default=4)
    p.add_argument("--out_json", default="closure_r05/packed_d150.json")
    args = p.parse_args(argv)

    import h5py

    from closure_r02 import generate_synthetic_pfcands

    os.makedirs(args.workdir, exist_ok=True)
    h5_path = os.path.join(args.workdir, "RunG_synth_d150.h5")
    if not os.path.exists(h5_path):
        t0 = time.time()
        pf = generate_synthetic_pfcands(args.num_jets, args.max_p, seed=0)
        with h5py.File(h5_path, "w") as f:
            f.create_dataset("PFCands", data=pf)
        print(f"wrote {pf.shape} in {time.time()-t0:.0f}s -> {h5_path}",
              flush=True)

    exp_root = os.path.join(args.workdir, "exp")
    before = set(glob.glob(os.path.join(exp_root, "prof", "*")))
    cmd = [sys.executable, "scripts/train_mmf.py",
           "--dir", exp_root, "--project", "prof",
           "--dir_aoj", args.workdir, "-f", "RunG_synth_d150.h5",
           "-n", str(args.num_jets), "-d", str(args.max_p),
           "--train_frac", "0.95", "-bs", "256",
           "-epochs", str(args.epochs), "-ema", "--packed_training"]
    print("$ " + " ".join(cmd), flush=True)
    t0 = time.time()
    subprocess.run(cmd, check=True, cwd=REPO)
    wall = time.time() - t0

    exp_dir = sorted(set(glob.glob(os.path.join(exp_root, "prof", "*")))
                     - before, key=os.path.getmtime)[-1]
    rows = [json.loads(l) for l in open(os.path.join(exp_dir, "metrics.jsonl"))]
    epochs = [(r["epoch"], r["epoch_time_s"], r.get("train_loss"))
              for r in rows if "epoch_time_s" in r]
    warm = [t for e, t, _ in epochs if e >= 1]  # epoch 0 pays compile
    train_jets = int(args.num_jets * 0.95)
    out = {
        "workload": f"{train_jets} train jets, D={args.max_p}, flagship "
                    "model, packed W=128, batch 256 jets/step, EMA, resident",
        "epoch_times_s": [round(t, 1) for _, t, _ in epochs],
        "warm_epoch_s": round(min(warm), 1) if warm else None,
        "warm_epoch_median_s": round(sorted(warm)[len(warm) // 2], 1)
        if warm else None,
        "jets_per_sec": round(train_jets / min(warm), 0) if warm else None,
        "r3_bucketed_resident_s": 54.3,
        "speedup_vs_r3_bucketed": round(54.3 / min(warm), 2) if warm else None,
        "total_wall_s": round(wall, 0),
        "losses": [round(l, 4) for _, _, l in epochs if l is not None],
    }
    os.makedirs(os.path.dirname(args.out_json), exist_ok=True)
    json.dump(out, open(args.out_json, "w"), indent=1)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
