"""Trained closures for the non-flagship encoders (VERDICT r2 #3).

Runs the PRODUCTION CLIs end to end for each variant —

  (a) CFM + KinFormer with the Lund pairwise attention bias
      (reference `ParticleTransformers.py:315-432`)
  (b) MJB + FlavorFormer with pairwise token-interaction bias + learned
      positional embedding (reference `ParticleTransformers.py:223-312`)
  (c) CFM + EPiC (reference `EPiC.py:9-178`)
  (d) MMF + ParticleFormer with the token co-occurrence attention bias
      (reference `ParticleTransformers.py:124-133`)

— training via `scripts/train_mmf.py` on the round-3 synthetic AOJ file,
sampling via `scripts/sample_mmf.py`, then collects each point's
metrics.json (+ the learned lambda_u gate where applicable) into
ENCODER_CLOSURES_r03.md.  This converts the "unit-tested only" verdict on
these encoders into "trains stably + samples via the CLI + W1 reported".

Usage: python scripts/encoder_closures_r03.py [--epochs 20] [--num_jets 60000]
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

VARIANTS = [
    {
        "name": "MJB + FlavorFormer (pairwise + pos-emb)",
        "train": ["--system", "MJB", "--model", "FlavorFormer",
                  "--use_pairwise", "--use_pos_emb"],
        "match": {"model": "FlavorFormer", "use_pairwise": True,
                  "use_pos_emb": True},
        "lambda_u": True,
        "modes": "discrete",
    },
    {
        "name": "CFM + EPiC",
        "train": ["--system", "CFM", "--model", "EPiC", "--n_embd_glob", "16"],
        "match": {"model": "EPiC"},
        "lambda_u": False,
        "modes": "continuous",
    },
    {
        "name": "CFM + KinFormer (Lund pairwise)",
        "train": ["--system", "CFM", "--model", "KinFormer", "--use_pairwise"],
        "match": {"model": "KinFormer", "use_pairwise": True},
        "lambda_u": True,
        "modes": "continuous",
    },
    {
        # the last never-trained variant from VERDICT r2 weak #4: the
        # flagship encoder with the token co-occurrence attention bias
        # (reference `ParticleTransformers.py:56-58,70-72,124-133`)
        "name": "MMF + ParticleFormer (co-occurrence bias)",
        "train": ["--system", "MMF", "--model", "ParticleFormer",
                  "--use_coocurrence"],
        "match": {"model": "ParticleFormer", "use_coocurrence": True},
        "lambda_u": False,
        "modes": "both",
    },
]


def _find_trained(args, variant):
    """Resume support: an existing experiment whose config matches this
    variant and whose best checkpoint exists (tunnel crashes kill the
    driver mid-variant; restarts must not retrain)."""
    import yaml

    for exp_dir in sorted(glob.glob(os.path.join(args.dir, "enc", "*")),
                          key=os.path.getmtime, reverse=True):
        cfg_path = os.path.join(exp_dir, "config.yaml")
        if not os.path.exists(cfg_path):
            continue
        cfg = yaml.safe_load(open(cfg_path))
        if all(cfg.get(k) == v for k, v in variant["match"].items()) and \
                os.path.isdir(os.path.join(exp_dir, "checkpoints", "best")):
            return exp_dir
    return None


def run(cmd, log_path, env=None):
    with open(log_path, "a") as f:
        f.write("\n$ " + " ".join(cmd) + "\n")
        f.flush()
        subprocess.run(cmd, check=True, stdout=f, stderr=subprocess.STDOUT,
                       cwd=REPO, env=env)


def run_cpu(cmd, log_path):
    """Run a child CPU-forced (pure-numpy steps must not block on the
    tunnel; see _read_lambda_u)."""
    run(cmd, log_path, env=dict(os.environ, JAX_PLATFORM_NAME="cpu"))


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--num_jets", type=int, default=60_000)
    p.add_argument("--epochs", type=int, default=20)
    p.add_argument("--gen_jets", type=int, default=10_000)
    p.add_argument("--num_timesteps", type=int, default=200)
    # the pairwise-bias forwards are several times heavier than the
    # flagship the default dispatch cap was calibrated on; keep single
    # device programs short (two worker crashes at the default cap)
    p.add_argument("--max_dispatch_steps", type=int, default=2_000)
    p.add_argument("--dir", default="/tmp/encoders")
    p.add_argument("--dir_aoj", default="/tmp/closure_r03")
    p.add_argument("--data_files", default="RunG_synth_r03.h5")
    p.add_argument("--out_md", default="ENCODER_CLOSURES_r03.md")
    args = p.parse_args(argv)

    os.makedirs(args.dir, exist_ok=True)
    log_path = os.path.join(args.dir, "runner.log")
    results = []

    for v in VARIANTS:
        exp_dir = _find_trained(args, v)
        if exp_dir is not None:
            train_s = 0.0
            print(f"reusing trained experiment {exp_dir} for {v['name']}",
                  flush=True)
        else:
            before = set(glob.glob(os.path.join(args.dir, "enc", "*")))
            t0 = time.time()
            run([sys.executable, "scripts/train_mmf.py",
                 "--dir", args.dir, "--project", "enc",
                 "--dir_aoj", args.dir_aoj, "-f", args.data_files,
                 "-n", str(args.num_jets), "-d", "64",
                 "-bs", "256", "-epochs", str(args.epochs),
                 "--train_frac", "0.95",
                 "--lr", "1e-3", "--lr_final", "1e-5", "--warmup_epochs", "1",
                 "--n_embd", "128", "--n_inner", "256", "--n_layer", "4",
                 "--n_layer_fused", "4", "--n_head", "4", "-ema",
                 "--seed", "0",
                 *v["train"]], log_path)
            train_s = time.time() - t0
            exp_dir = (set(glob.glob(os.path.join(args.dir, "enc", "*")))
                       - before).pop()
        exp_id = os.path.basename(exp_dir)

        def have_metrics():
            return bool(glob.glob(os.path.join(exp_dir, "generation_results*",
                                               "metrics.json")))

        gen_s = 0.0
        if have_metrics():
            print(f"reusing generation results in {exp_dir}", flush=True)
        elif glob.glob(os.path.join(exp_dir, "generation_results*",
                                    "generated_sample.h5")):
            # a prior run generated but crashed before the metrics write:
            # the W1 pass is pure numpy — recompute CPU-forced, never
            # touching the (possibly wedged) tunnel
            print(f"recomputing metrics for existing sample in {exp_dir}",
                  flush=True)
            run_cpu([sys.executable, "scripts/sample_mmf.py",
                     "--dir", args.dir, "--project", "enc", "-id", exp_id,
                     "-f", args.data_files, "--dir_aoj", args.dir_aoj,
                     "-n", str(args.gen_jets), "--metrics_only"], log_path)
        if not have_metrics():
            t0 = time.time()
            run([sys.executable, "scripts/sample_mmf.py",
                 "--dir", args.dir, "--project", "enc", "-id", exp_id,
                 "-f", args.data_files, "--dir_aoj", args.dir_aoj,
                 "-n", str(args.gen_jets), "-steps", str(args.num_timesteps),
                 "-tmp", "1.0", "-bs", "256",
                 "--max_dispatch_steps", str(args.max_dispatch_steps)],
                log_path)
            gen_s = time.time() - t0

        # collect metrics + training health
        mjson = glob.glob(os.path.join(exp_dir, "generation_results*",
                                       "metrics.json"))[0]
        metrics = json.load(open(mjson))
        rows = [json.loads(l) for l in
                open(os.path.join(exp_dir, "metrics.jsonl"))]
        lam = None
        if v["lambda_u"]:
            # read the learned pairwise gate from the best checkpoint
            lam = _read_lambda_u(exp_dir)
        results.append({"variant": v["name"], "modes": v["modes"],
                        "experiment": exp_id,
                        "train_seconds": round(train_s, 1),
                        "gen_seconds": round(gen_s, 1),
                        "final_train_loss": rows[-1].get("train_loss"),
                        "final_val_loss": rows[-1].get("val_loss"),
                        "losses_finite": all(
                            r.get("val_loss") == r.get("val_loss") and
                            abs(r.get("val_loss", 0)) < 1e9 for r in rows),
                        "lambda_u": lam, "metrics": metrics})
        print(json.dumps(results[-1], indent=1), flush=True)

    _write_md(args, results)


def _read_lambda_u(exp_dir):
    """Read the learned pairwise gate in a CPU-forced subprocess.

    The read is pure checkpoint I/O, but importing the library in this
    (TPU-connected) process initializes the axon backend — and a wedged
    tunnel then blocks the whole driver indefinitely (observed 2026-08-17).
    A child with JAX_PLATFORM_NAME=cpu never touches the tunnel."""
    env = dict(os.environ, JAX_PLATFORM_NAME="cpu")
    r = subprocess.run([sys.executable, os.path.abspath(__file__),
                        "--read_lambda_u", exp_dir],
                       capture_output=True, text=True, env=env, cwd=REPO)
    for line in reversed(r.stdout.splitlines()):
        try:
            return json.loads(line)["lambda_u"]
        except (ValueError, KeyError):
            continue
    return f"unreadable: rc={r.returncode} {r.stderr[-300:]}"


def _read_lambda_u_inproc(exp_dir):
    """Read the learned pairwise gate from the best checkpoint via the
    library's own loader (EMA params when enabled)."""
    import numpy as np

    try:
        from multimodal_flows_tpu.config import Config
        from multimodal_flows_tpu.train.systems import build_system
        from multimodal_flows_tpu.train.trainer import Trainer

        cfg = Config.load(exp_dir)
        kind = "MMF"
        for t in cfg.tags or []:
            if t.startswith("system:"):
                kind = t.split(":", 1)[1]
        system = build_system(cfg, kind)
        params = Trainer(system, cfg, mesh=None).load_for_inference("best")
        flat = {"/".join(str(k) for k in path): v
                for path, v in _flatten(params)}
        for k, v in flat.items():
            if "lambda_u" in k:
                return float(np.asarray(v).reshape(()))
    except Exception as e:
        return f"unreadable: {e}"
    return None


def _flatten(tree, path=()):
    if isinstance(tree, dict):
        for k, v in tree.items():
            yield from _flatten(v, path + (k,))
    else:
        yield path, tree


def _write_md(args, results):
    lines = [
        "# Encoder closures — round 3",
        "",
        "Short trained closures for every non-flagship encoder via the",
        "production CLIs (`scripts/train_mmf.py` -> `scripts/sample_mmf.py`)",
        f"on the round-3 synthetic AOJ workload ({args.num_jets:,} jets,",
        f"{args.epochs} epochs, {args.gen_jets:,} jets sampled at",
        f"{args.num_timesteps} steps).  Converts VERDICT r2's",
        "\"implemented-but-never-trained\" into trained + sampled + measured.",
        "Note: the W1 comparison sample is the head of the same synthetic",
        "file (quick-closure signal, not a strict held-out split).",
        "",
    ]
    for r in results:
        lines += [f"## {r['variant']}", "",
                  f"- experiment `{r['experiment']}`: trained "
                  f"{r['train_seconds']}s, sampled {r['gen_seconds']}s, "
                  f"losses finite: {r['losses_finite']}",
                  f"- final train/val loss: {r['final_train_loss']:.4f} / "
                  f"{r['final_val_loss']:.4f}"]
        if r["lambda_u"] is not None:
            lines += [f"- learned pairwise gate lambda_u = {r['lambda_u']}"]
        # only the MODELED modality's W1 is a closure signal: a CFM
        # sample's tokens (and an MJB sample's kinematics) are the
        # untouched source noise passed through by the generator
        m = r["metrics"]
        if "w1_flavor" in m and r["modes"] in ("discrete", "both"):
            w = m["w1_flavor"]
            worst = sorted(w.items(), key=lambda kv: -kv[1])[:4]
            lines += ["- W1 flavor multiplicities (worst 4): " +
                      ", ".join(f"{k}={v:.3f}" for k, v in worst)]
        if "w1_kinematics" in m and r["modes"] in ("continuous", "both"):
            lines += ["- W1 kinematics: " +
                      ", ".join(f"{k}={v:.4f}" for k, v in
                                m["w1_kinematics"].items())]
        lines += [f"- sampler throughput: {m['jets_per_sec']:.1f} jets/s "
                  f"@{m['num_timesteps']} steps", ""]
    with open(os.path.join(REPO, args.out_md), "w") as f:
        f.write("\n".join(lines))
    print("wrote", args.out_md)


if __name__ == "__main__":
    if len(sys.argv) >= 3 and sys.argv[1] == "--read_lambda_u":
        import jax
        jax.config.update("jax_platforms", "cpu")
        print(json.dumps({"lambda_u": _read_lambda_u_inproc(sys.argv[2])}))
    else:
        main()
