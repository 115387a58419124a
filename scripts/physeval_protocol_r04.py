"""Which in-training physics-eval protocol ranks checkpoints correctly?

The round-4 flagship exposed a protocol bug in the `best_physics` slot:
evaluating 2k jets at 50 steps ranked the epoch-160 EMA (50-step
W1(pt) 4.60) above the end-of-cosine EMA (50-step 13.99) — but at the
production operating point (500 steps) the ordering INVERTS: `last`
scores 0.89 vs 4.58 for the epoch-160 pick (CLOSURE_r04.md).  Few-step
sampling quality is a different objective from many-step quality, and
near the cosine tail they anti-correlate: the fully-annealed EMA wins
at fine time discretization while flatter mid-training weights tolerate
coarse steps better.

This script measures, per candidate protocol (num_timesteps x 2000
jets, fixed seed), the W1(pt/mass/mult) of every saved slot of the
round-4 flagship, and reports which protocols reproduce the 50k-jet
500-step ground-truth ranking.  It also prints the 2k-vs-2k W1 noise
floor (two disjoint halves of the test set) so the slot separations can
be judged against sampling noise.

Result (run on the r04 flagship, see CLOSURE_r04.md): the ranking is
wrong at 50 steps, correct at >=250; the trainer default
`physics_eval_num_timesteps` moved 50 -> 250 on this evidence.

Usage: python scripts/physeval_protocol_r04.py [workdir] [experiment_dir]
(defaults match scripts/closure_r04.py --workdir /tmp/closure_r04)
"""

import json, os, sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
from multimodal_flows_tpu.config import Config
from multimodal_flows_tpu.data.state import MultiModal
from multimodal_flows_tpu.train.physics_eval import (physics_metrics,
                                                     reference_observables)
from multimodal_flows_tpu.train.systems import MMF
from multimodal_flows_tpu.train.trainer import Trainer
from multimodal_flows_tpu.utils import enable_compilation_cache
from multimodal_flows_tpu.utils.metrics import wasserstein1d

enable_compilation_cache()
workdir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/closure_r04"
exp = (sys.argv[2] if len(sys.argv) > 2
       else os.path.join(workdir, "closure", "r04flagship"))
N_JETS = 2000

cfg = Config.load(exp)
system = MMF(cfg)
trainer = Trainer(system, cfg, mesh=None)
test = MultiModal.load_from(os.path.join(workdir, "featurized_test.h5"))
meta = json.load(open(os.path.join(workdir, "featurized_meta.json")))

# Reference observables: the same JetFeatures/mult path the trainer uses.
# NOTE: featurized_test.h5 is saved UNSTANDARDIZED (closure_r04.py:112-120),
# so pass metadata=None — destandardizing it again would double-scale the
# reference while physics_metrics destandardizes the generated jets once.
ref_obs = reference_observables(test, None, N_JETS)
masks = np.asarray(test.mask)[:N_JETS]

# 2k-vs-2k noise floor per observable: W1 between two disjoint test halves.
ref_obs_b = reference_observables(test[N_JETS:], None, N_JETS)
floor = {k: wasserstein1d(ref_obs[k], ref_obs_b[k]) for k in ref_obs}
print(json.dumps({"noise_floor_2k": {k: round(float(v), 4)
                                     for k, v in floor.items()}}), flush=True)

SLOTS = ["last", "best", "best_mse", "best_physics"]
params = {s: trainer.load_for_inference(s) for s in SLOTS}

for steps in [50, 100, 250, 500]:
    row = {"steps": steps, "n_jets": N_JETS}
    scores = {}
    for s in SLOTS:
        out = physics_metrics(system, params[s], ref_obs, masks,
                              num_timesteps=steps, metadata=meta,
                              batch_size=256, seed=7)
        scores[s] = out
        row[s] = {k.removeprefix("val_w1_"): round(v, 4)
                  for k, v in out.items()}
    ranking = sorted(SLOTS, key=lambda s: scores[s]["val_w1_physics"])
    row["ranking"] = ranking
    row["picks_last"] = ranking[0] == "last"
    print(json.dumps(row), flush=True)
