"""Collect the reference 9-point sweep results into SWEEP_r03.md.

Run after `scripts/sample_mmf.py -n 100000 -steps 100 500 1000
-tmp 0.8 1.0 1.2` against the round-3 flagship experiment: copies each
generation_results_* point's metrics.json into `sweep_r03/` in the repo
and writes the summary table (VERDICT r2 #4 asks for the full grid with
per-point metrics and wall clocks).
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import shutil

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--experiment_dir",
                   default="/tmp/closure_r03/closure/r03flagship")
    p.add_argument("--outdir", default=os.path.join(REPO, "sweep_r03"))
    p.add_argument("--out_md", default=os.path.join(REPO, "SWEEP_r03.md"))
    args = p.parse_args(argv)

    os.makedirs(args.outdir, exist_ok=True)
    points = []
    for d in sorted(glob.glob(os.path.join(args.experiment_dir,
                                           "generation_results*"))):
        mpath = os.path.join(d, "metrics.json")
        if not os.path.exists(mpath):
            continue
        m = json.load(open(mpath))
        tag = os.path.basename(d).replace("generation_results", "").lstrip("_")
        shutil.copy(mpath, os.path.join(args.outdir, f"metrics_{tag}.json"))
        has_sample = os.path.exists(os.path.join(d, "generated_sample.h5"))
        points.append({"tag": tag, "metrics": m, "sample_written": has_sample})

    points.sort(key=lambda p: (p["metrics"]["temperature"],
                               p["metrics"]["num_timesteps"]))

    rows = []
    for pt in points:
        m = pt["metrics"]
        w = m.get("w1_flavor", {})
        wall_s = (100_000 / m['jets_per_sec']) if m['jets_per_sec'] else float('nan')
        rows.append(
            f"| {m['temperature']} | {m['num_timesteps']} | "
            f"{m['jets_per_sec']:.1f} | {wall_s:.0f} | "
            f"{w.get('multiplicity', float('nan')):.3f} | "
            f"{w.get('photons', float('nan')):.3f} | "
            f"{w.get('net charge', float('nan')):.3f} | "
            f"{max(w.values()) if w else float('nan'):.3f} | "
            f"{pt['sample_written']} |")

    md = f"""# Reference sampling sweep — round 3

The reference's published workload (README:41, `sample_mmf.py:29-31,
153-164`): **100,000 jets x num_timesteps {{100, 500, 1000}} x
temperature {{0.8, 1.0, 1.2}}**, run through the flag-compatible
`scripts/sample_mmf.py` CLI against the round-3 flagship experiment
(`closure_r03/`, reference `train_mmf.py:42-52` config trained 300
epochs on 291k synthetic jets; sampled from the end-of-cosine EMA
`last` slot per the CLOSURE_r03 checkpoint ablation), with the packed
sampler at the capped B<=128 operating point (wall-clock per point
derived as 100k / jets_per_sec — VERDICT r2 #4) — crash-free, one CLI
invocation per temperature (3 points each; the CLI accepts the full
grid in one command, the split bounds a tunnel-crash blast radius).

Each point wrote `generation_results_*/generated_sample.h5` +
`configs.yaml` + `metrics.json` (copies of the metrics in `sweep_r03/`).
W1 distances are generated-vs-test over the 16 flavor-multiplicity
observables (reference `utils/metrics.py:36-67`).

| T | steps | jets/s | wall s | W1 mult | W1 photons | W1 net charge | W1 worst | sample.h5 |
|---|---|---|---|---|---|---|---|---|
{chr(10).join(rows)}

Points collected: {len(points)} / 9.
"""
    with open(args.out_md, "w") as f:
        f.write(md)
    print(f"wrote {args.out_md} ({len(points)} points)")


if __name__ == "__main__":
    main()
