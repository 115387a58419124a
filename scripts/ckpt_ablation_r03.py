"""Checkpoint-slot ablation for the round-3 flagship closure.

Samples 50k jets @500 steps from each checkpoint slot of the 300-epoch
flagship experiment and reports W1(jet pT)/W1(mass) vs the held-out
test set.  Result (CLOSURE_r03.md): `last` (EMA at the end of the
cosine decay) 0.82/0.22, `best_mse` 4.4/0.99, val-loss `best` 15.6/3.1
— sample production runs from the fully-decayed EMA, not the val-loss
winner.

Usage: python scripts/ckpt_ablation_r03.py [workdir] [experiment_dir]
(defaults match scripts/closure_r03.py --workdir /tmp/closure_r03full
 --experiment_id r03flagship300)
"""

import json, os, sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
from multimodal_flows_tpu.config import Config
from multimodal_flows_tpu.data.aoj import sample_from_empirical_masks
from multimodal_flows_tpu.data.state import MultiModal
from multimodal_flows_tpu.sampling.generator import generate_packed
from multimodal_flows_tpu.train.systems import MMF
from multimodal_flows_tpu.train.trainer import Trainer
from multimodal_flows_tpu.utils import enable_compilation_cache
from multimodal_flows_tpu.utils.jet_features import JetFeatures
from multimodal_flows_tpu.utils.metrics import wasserstein1d

enable_compilation_cache()
workdir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/closure_r03full"
exp = (sys.argv[2] if len(sys.argv) > 2
       else os.path.join(workdir, "closure", "r03flagship300"))
cfg = Config.load(exp)
system = MMF(cfg)
trainer = Trainer(system, cfg, mesh=None)
test = MultiModal.load_from(os.path.join(workdir, "featurized_test.h5"))
masks = sample_from_empirical_masks(np.asarray(test.mask), 50_000,
                                    cfg.max_num_particles, seed=3)
meta = json.load(open(os.path.join(workdir, "featurized_meta.json")))
for name in ["last", "best", "best_mse", "best_ce"]:
    params = trainer.load_for_inference(name)
    res = generate_packed(system, params, masks, num_timesteps=500,
                          batch_size=256, seed=7, metadata=meta)
    fg, fr = JetFeatures(res.sample), JetFeatures(test)
    out = {"ckpt": name,
           "pt": fg.Wassertein1D("pt", fr),
           "mass": fg.Wassertein1D("m", fr),
           "jets_per_sec": round(res.jets_per_sec, 1)}
    print(json.dumps(out), flush=True)
