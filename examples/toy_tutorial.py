"""Tutorial: colored 8-Gaussians -> 2-moons multimodal flow.

Script equivalent of the reference tutorial notebook
(`notebooks/Tutorial_Colored_8Gaussians_to_2Moons.ipynb`): train a small
MLP multimodal flow (CFM for positions + telegraph bridge for the color
label) on the toy coupling, then sample full trajectories with the hybrid
tau-leaping solver and plot the paths.

Run:  python examples/toy_tutorial.py [--epochs 200] [--out toy_out]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from multimodal_flows_tpu.config import Config
from multimodal_flows_tpu.data.datasets import ArrayDataset
from multimodal_flows_tpu.data.state import DataCoupling, MultiModal
from multimodal_flows_tpu.data.toy import NGaussians, TwoMoons
from multimodal_flows_tpu.train.systems import MMF
from multimodal_flows_tpu.train.trainer import Trainer
from multimodal_flows_tpu.utils.logger import SimpleLogger as log
from multimodal_flows_tpu.utils.plotting import plot_trajectories


def main(argv=None):
    p = argparse.ArgumentParser()
    # notebook recipe (cell 10): 20 epochs, lr 1e-3, n_embd 128,
    # sigma 0.1, beta 0.25, 80k-point coupling, batch 256
    p.add_argument("--epochs", type=int, default=20)
    p.add_argument("--num_points", type=int, default=80_000)
    p.add_argument("--num_timesteps", type=int, default=200)
    p.add_argument("--out", type=str, default="toy_out")
    args = p.parse_args(argv)

    cfg = Config(
        model="ToyMLP", vocab_size=9, dim_continuous=2, max_num_particles=1,
        n_embd=128, n_inner=128, n_layer=3, batch_size=256,
        max_epochs=args.epochs, lr=1e-3, lr_final=1e-5,
        multitask_loss="sum", beta=0.25, sigma=0.1,
        dir=args.out, project="toy", seed=0,
    )
    cfg.mint_experiment_id()

    # toy coupling as in the reference tutorial: 8 colored gaussians (labels
    # 1..8) -> colored two moons (labels 1..2); vocab 9 covers both plus pad
    n_src = args.num_points
    src = NGaussians(num_points_per_gaussian=n_src // 8, num_gaussians=8, seed=0).as_clouds()
    tgt = TwoMoons(num_points_per_moon=n_src // 2, seed=1).as_clouds()
    ds = ArrayDataset(DataCoupling(source=src, target=tgt))
    train_ds, val_ds = ds.split(0.9, seed=0)

    system = MMF(cfg)
    trainer = Trainer(system, cfg, mesh=None)
    state = trainer.fit(train_ds, val_ds)

    # sample trajectories starting FROM fresh 8-Gaussians draws, exactly
    # like the notebook's generation dataloader (cell 12) — the model was
    # trained on 8-Gaussians sources, not standard-normal noise
    n = 2000
    gen_src = NGaussians(num_points_per_gaussian=n // 8, num_gaussians=8,
                         seed=7).as_clouds()
    source = MultiModal(
        time=jnp.full((n,), cfg.time_eps),
        continuous=jnp.asarray(gen_src.continuous),
        discrete=jnp.asarray(gen_src.discrete),
        mask=jnp.ones((n, 1, 1), jnp.int32),
    )
    final, traj = system.simulate(state.params, jax.random.PRNGKey(42), source,
                                  num_timesteps=args.num_timesteps,
                                  return_trajectory=True)

    out_png = os.path.join(cfg.experiment_dir, "trajectories.png")
    plot_trajectories(jax.tree.map(np.asarray, traj), num_points=600, path=out_png)
    log.info(f"saved trajectory plot -> {out_png}")

    labels = np.asarray(final.discrete)[:, 0, 0]
    freq = np.bincount(labels, minlength=cfg.vocab_size) / n
    log.info(f"final label frequencies: {np.round(freq, 3)} "
             f"(target: ~0.5 each on labels 1 and 2, ~0 elsewhere)")


if __name__ == "__main__":
    main()
