"""The training loop: one jitted step, data-parallel over a mesh.

Replaces the reference's Lightning `Trainer(strategy='ddp')` stack
(`scripts/train_mmf.py:159-170`): loss + grad + Adam update + EMA fuse into
a single donated jit; the batch is sharded over the `data` mesh axis, so
the partitioner inserts the gradient all-reduce (the NCCL allreduce of the
reference) over ICI automatically.  Validation runs the same loss with the
EMA parameters (the reference's EMA swap callback,
`utils/callbacks.py:207-220`) and per-epoch means feed best-k
checkpointing on val_loss / val_loss_mse / val_loss_ce.
"""

from __future__ import annotations

import os
import time
from functools import partial
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct

from multimodal_flows_tpu.config import Config
from multimodal_flows_tpu.data.datasets import ArrayDataset, num_batches, shuffle_batches
from multimodal_flows_tpu.parallel.mesh import make_mesh, shard_coupling
from multimodal_flows_tpu.train.checkpoints import CheckpointManager
from multimodal_flows_tpu.train.ema import ema_update
from multimodal_flows_tpu.train.lr_schedules import warmup_cosine_epoch_schedule
from multimodal_flows_tpu.utils.logger import MetricsLogger, SimpleLogger as log


class TrainState(struct.PyTreeNode):
    params: Any
    opt_state: Any
    ema_params: Any          # None when EMA disabled
    step: jax.Array


class Trainer:
    def __init__(self, system, config: Config, mesh: Optional[object] = "auto",
                 steps_per_epoch: Optional[int] = None):
        self.system = system
        self.config = config
        self.mesh = make_mesh() if mesh == "auto" else mesh
        self._steps_per_epoch = steps_per_epoch
        self._compiled = {}

    # ------------------------------------------------------------ building

    def make_optimizer(self, steps_per_epoch: int):
        cfg = self.config
        schedule = warmup_cosine_epoch_schedule(
            cfg.lr, cfg.lr_final, cfg.warmup_epochs, cfg.max_epochs, steps_per_epoch)
        self.lr_schedule = schedule
        return optax.chain(
            optax.clip_by_global_norm(cfg.gradient_clip_val),
            optax.adam(schedule),
        )

    def init_state(self, key, steps_per_epoch: int) -> TrainState:
        params = self.system.init_params(key)
        self.tx = self.make_optimizer(steps_per_epoch)
        opt_state = self.tx.init(params)
        ema = jax.tree.map(jnp.copy, params) if self.config.use_ema_weights else None
        return TrainState(params=params, opt_state=opt_state, ema_params=ema,
                          step=jnp.zeros((), jnp.int32))

    # --------------------------------------------------------------- steps

    def _train_step(self, state: TrainState, batch, key):
        def loss_of(params):
            return self.system.loss_fn(params, batch, key, train=True)

        (loss, metrics), grads = jax.value_and_grad(loss_of, has_aux=True)(state.params)
        updates, opt_state = self.tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        if state.ema_params is not None:
            ema = ema_update(state.ema_params, params, self.config.ema_decay)
        else:
            ema = None
        new_state = TrainState(params=params, opt_state=opt_state, ema_params=ema,
                               step=state.step + 1)
        metrics = dict(metrics)
        metrics["grad_norm"] = optax.global_norm(grads)
        return new_state, metrics

    def _eval_step(self, state: TrainState, batch, key):
        params = state.ema_params if state.ema_params is not None else state.params
        _, metrics = self.system.loss_fn(params, batch, key, train=False)
        return metrics

    def compiled_train_step(self):
        if "train" not in self._compiled:
            self._compiled["train"] = jax.jit(self._train_step, donate_argnums=0)
        return self._compiled["train"]

    def compiled_eval_step(self):
        if "eval" not in self._compiled:
            self._compiled["eval"] = jax.jit(self._eval_step)
        return self._compiled["eval"]

    # ----------------------------------------------------------------- fit

    def fit(self, train_ds: ArrayDataset, val_ds: ArrayDataset,
            resume: Optional[str] = None) -> TrainState:
        cfg = self.config
        if self.mesh is not None:
            n_dev = self.mesh.devices.size
            assert cfg.batch_size % n_dev == 0, (
                f"batch_size {cfg.batch_size} must be divisible by the "
                f"{n_dev}-device data mesh")
        spe = self._steps_per_epoch or max(num_batches(len(train_ds), cfg.batch_size), 1)

        key = jax.random.PRNGKey(cfg.seed)
        k_init, k_train = jax.random.split(key)
        state = self.init_state(k_init, spe)

        exp_dir = cfg.experiment_dir if cfg.experiment_id else os.path.join(cfg.dir, "scratch")
        ckpt = CheckpointManager(os.path.join(exp_dir, "checkpoints"))
        logger = MetricsLogger(exp_dir)

        start_epoch = 0
        if resume and ckpt.has(resume):
            restored = ckpt.load(self._to_ckpt(state), name=resume)
            state = self._from_ckpt(state, restored)
            start_epoch = int(restored["epoch"])
            log.info(f"resumed from {resume!r} at epoch {start_epoch}")

        train_fn = self.compiled_train_step()
        eval_fn = self.compiled_eval_step()
        global_step = start_epoch * spe  # python-side mirror of state.step
                                         # (avoids a device sync per key fold)

        from multimodal_flows_tpu.utils.progress import EpochProgress

        progress = EpochProgress()

        for epoch in range(start_epoch, cfg.max_epochs):
            t0 = time.time()
            # ---- train
            accum = []
            progress.start_epoch(epoch, spe)
            for i, batch in enumerate(shuffle_batches(train_ds, cfg.batch_size,
                                                      seed=cfg.seed, epoch=epoch)):
                batch = shard_coupling(batch, self.mesh)
                k = jax.random.fold_in(k_train, global_step)
                state, metrics = train_fn(state, batch, k)
                accum.append(metrics)
                global_step += 1
                # fetch the loss only at the logging cadence (each fetch
                # syncs the async dispatch pipeline)
                if progress.enabled:
                    progress.update(float(metrics["loss"])
                                    if i % cfg.log_every_n_steps == 0 else float("nan"))
            progress.end_epoch()
            train_metrics = _mean_metrics(accum, prefix="train_")

            # ---- validate (with EMA params when enabled)
            # the tail batch is padded up to the static batch size (keeps one
            # compiled shape and mesh-divisibility); metric means are
            # weighted by the real jet count per batch
            accum, weights = [], []
            n_val = len(val_ds)
            for i, batch in enumerate(shuffle_batches(val_ds, cfg.batch_size,
                                                      shuffle=False, drop_last=False,
                                                      pad_last=True)):
                batch = shard_coupling(batch, self.mesh)
                k = jax.random.fold_in(k_train, 1_000_000_000 + epoch * 10_000 + i)
                accum.append(eval_fn(state, batch, k))
                weights.append(min(cfg.batch_size, n_val - i * cfg.batch_size))
            val_metrics = _mean_metrics(accum, prefix="val_", weights=weights)

            epoch_metrics = {**train_metrics, **val_metrics,
                             "epoch": epoch,
                             "lr": float(self.lr_schedule(global_step)),
                             "epoch_time_s": time.time() - t0}
            logger.log(int(state.step), epoch_metrics)

            if (epoch + 1) % cfg.checkpoint_every_n_epochs == 0 or epoch == cfg.max_epochs - 1:
                ckpt.save(self._to_ckpt(state, epoch=epoch + 1), val_metrics, epoch + 1)

            log.info(
                f"epoch {epoch}: train_loss={train_metrics.get('train_loss', float('nan')):.4f} "
                f"val_loss={val_metrics.get('val_loss', float('nan')):.4f} "
                f"({epoch_metrics['epoch_time_s']:.1f}s)")

        logger.close()
        return state

    # ----------------------------------------------------------- inference

    def load_for_inference(self, name: str = "best", use_ema: Optional[bool] = None):
        """Restore a checkpoint slot and return the parameters to predict
        with (EMA when enabled — the reference applies EMA weights in
        `EMACallback.on_predict_start`, `utils/callbacks.py:182-201`)."""
        cfg = self.config
        spe = self._steps_per_epoch or 1
        state = self.init_state(jax.random.PRNGKey(0), spe)
        ckpt = CheckpointManager(os.path.join(cfg.experiment_dir, "checkpoints"))
        restored = ckpt.load(self._to_ckpt(state), name=name)
        want_ema = cfg.use_ema_weights if use_ema is None else use_ema
        if want_ema and "ema_params" in restored:
            return restored["ema_params"]
        return restored["params"]

    # -------------------------------------------------------- ckpt mapping

    def _to_ckpt(self, state: TrainState, epoch: int = 0):
        d = {"params": state.params, "opt_state": state.opt_state,
             "step": state.step, "epoch": np.full((), epoch, np.int32)}
        if state.ema_params is not None:
            d["ema_params"] = state.ema_params
        return d

    def _from_ckpt(self, template: TrainState, restored) -> TrainState:
        return TrainState(
            params=restored["params"],
            opt_state=restored["opt_state"],
            ema_params=restored.get("ema_params", template.ema_params),
            step=jnp.asarray(restored["step"], jnp.int32),
        )


def _mean_metrics(accum, prefix: str = "", weights=None) -> Dict[str, float]:
    if not accum:
        return {}
    if weights is None:
        w = np.ones(len(accum))
    else:
        w = np.asarray(weights, dtype=np.float64)
    w = w / w.sum()
    out = {}
    for k in accum[0]:
        vals = np.asarray([float(m[k]) for m in accum])
        out[prefix + k] = float((vals * w).sum())
    return out
