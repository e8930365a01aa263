"""Supervised training harness: jit data-parallel steps, checkpoints, early stop.

Lifecycle parity with the reference's trainers (SURVEY.md §2.5):
  * param-filtered optimization — only adapters/heads/Q-adapter train; the
    encoder base is frozen *by construction* (it lives in the frozen pytree),
    replacing peft's requires_grad filtering (MLGWSC-1/train.py:496-504,
    Signal_vs_Noise/src/train.py:277)
  * Adam/AdamW + global-norm gradient clipping (clip 100, train.py:538)
  * per-epoch train/valid loss, losses.txt lines "epoch\ttrain\tval"
    (train.py:567-580), TensorBoard-style scalars via a metrics callback
  * last/best/per-epoch checkpoints, resume latest|best, early stopping
    (train.py:546-640), component export on new best
  * curriculum scheduler hooks (Efficiency_test/src/train.py:81-219).

TPU design: one jit'd train_step(trainable, opt_state, batch, key, snr_range)
over a ("data","model") mesh. Batches are device-resident; injection mixing
happens inside the step; the SNR range is a traced argument so curriculum
steps reuse the compiled program.
"""
from __future__ import annotations

import dataclasses
import logging
import os
import time
from functools import partial
from typing import Any, Callable, Iterable, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from gwkit.train.checkpoints import CheckpointManager
from gwkit.train.curriculum import CurriculumScheduler


@dataclasses.dataclass
class TrainConfig:
    learning_rate: float = 5e-5
    clip_norm: float = 100.0
    epochs: int = 100
    batch_size: int = 128
    early_stop_patience: int = 10
    seed: int = 42
    optimizer: str = "adam"  # "adam" (MLGWSC-1) | "adamw" (Signal_vs_Noise)
    weight_decay: float = 0.01
    # "constant" (reference parity: fixed lr, pars.py lr=1e-4) or "cosine"
    # (linear warmup over warmup_steps then cosine decay to lr/30 across
    # total_steps — used by large-batch runs where the reference's batch-32
    # constant-lr recipe undertrains at the same step count).
    lr_schedule: str = "constant"
    warmup_steps: int = 500
    total_steps: int = 0  # required when lr_schedule != "constant"
    # Wall-clock budget for fit() (seconds; 0 = unlimited). Stops after the
    # first epoch that crosses the budget — used for matched-wall-clock
    # model-size comparisons (e.g. tiny vs base at the same device-time
    # spend), where matching epoch counts would hand the smaller model a
    # 2-3x device-time advantage.
    time_budget_s: float = 0.0


def make_optimizer(cfg: TrainConfig) -> optax.GradientTransformation:
    if cfg.lr_schedule == "constant":
        lr = cfg.learning_rate
    elif cfg.lr_schedule == "cosine":
        if cfg.total_steps <= 0:
            raise ValueError("cosine lr_schedule needs cfg.total_steps > 0")
        lr = optax.warmup_cosine_decay_schedule(
            init_value=cfg.learning_rate / 25.0,
            peak_value=cfg.learning_rate,
            warmup_steps=min(cfg.warmup_steps, max(cfg.total_steps // 10, 1)),
            decay_steps=cfg.total_steps,
            end_value=cfg.learning_rate / 30.0,
        )
    else:
        raise ValueError(f"unknown lr_schedule {cfg.lr_schedule!r}")
    opt = (
        optax.adamw(lr, weight_decay=cfg.weight_decay)
        if cfg.optimizer == "adamw"
        else optax.adam(lr)
    )
    if cfg.clip_norm and cfg.clip_norm > 0:
        return optax.chain(optax.clip_by_global_norm(cfg.clip_norm), opt)
    return opt


class Trainer:
    """Generic supervised trainer.

    ``loss_fn(trainable, frozen, batch, key) -> (loss, aux)`` defines the
    workload; ``batch`` is whatever the dataset iterator yields (already on
    device).
    """

    def __init__(
        self,
        loss_fn: Callable,
        trainable: Any,
        frozen: Any,
        cfg: TrainConfig = TrainConfig(),
        export_components: Optional[Callable] = None,
        metrics_callback: Optional[Callable] = None,
        mesh=None,
    ):
        self.cfg = cfg
        self.mesh = mesh
        self._shard_batch = None
        if mesh is not None:
            # Multi-chip training as a constructor arg: params are laid out
            # with the standard ("data","model") rules (Megatron encoder tp,
            # adapters following their base projections, heads replicated),
            # batches are sharded on the data axis per step, and GSPMD
            # propagates everything else — the optimizer state inherits the
            # trainable layout from optax init on the sharded pytree.
            from gwkit.parallel.mesh import batch_sharding, shard_task_tree

            trainable = shard_task_tree(mesh, trainable)
            frozen = shard_task_tree(mesh, frozen)
            self._shard_batch = lambda b: jax.device_put(b, batch_sharding(mesh, b))
        self.frozen = frozen
        self.trainable = trainable
        self.optimizer = make_optimizer(cfg)
        self.opt_state = self.optimizer.init(trainable)
        self.export_components = export_components
        self.metrics_callback = metrics_callback  # (epoch, {"train_loss":..,..}) -> None

        @partial(jax.jit, donate_argnums=(0, 1))
        def train_step(trainable, opt_state, batch, key):
            def scalar_loss(tr):
                loss, aux = loss_fn(tr, frozen, batch, key)
                return loss, aux

            (loss, aux), grads = jax.value_and_grad(scalar_loss, has_aux=True)(trainable)
            updates, opt_state = self.optimizer.update(grads, opt_state, trainable)
            trainable = optax.apply_updates(trainable, updates)
            return trainable, opt_state, loss, aux

        @jax.jit
        def eval_step(trainable, batch):
            # No RNG at eval: loss_fns treat key=None as inference mode
            # (dropout off), matching the reference's model.eval() validation.
            return loss_fn(trainable, frozen, batch, None)

        self._train_step = train_step
        self._eval_step = eval_step

    def run_epoch(self, batches: Iterable, key, train: bool = True):
        """Returns (mean_loss, list_of_aux).

        Losses/aux stay on device until the epoch ends: a per-step
        float(loss) would force one host<->device round trip per step,
        which on a tunneled/remote-attached TPU (~100 ms RTT) dominates
        training wall-clock — deferring the sync keeps the dispatch
        pipeline full (same discipline as the search engine's per-segment
        drain, gwkit/search/engine.py).
        """
        losses, auxes = [], []
        for batch in batches:
            key, sub = jax.random.split(key)
            if self._shard_batch is not None:
                batch = self._shard_batch(batch)
            if train:
                self.trainable, self.opt_state, loss, aux = self._train_step(
                    self.trainable, self.opt_state, batch, sub
                )
            else:
                loss, aux = self._eval_step(self.trainable, batch)
            losses.append(loss)
            auxes.append(aux)
        if not losses:
            return 0.0, []
        total = float(jnp.sum(jnp.stack(losses)))
        auxes = [jax.tree.map(np.asarray, a) for a in auxes]
        return total / len(losses), auxes

    def fit(
        self,
        train_batches: Callable[[Any], Iterable],
        valid_batches: Callable[[Any], Iterable],
        outdir: str,
        resume: Optional[str] = None,
        force: bool = False,
        scheduler: Optional[CurriculumScheduler] = None,
        eval_callback: Optional[Callable] = None,
    ) -> float:
        """Full training lifecycle. ``train_batches(key)`` yields one epoch of
        device batches. Returns the best validation loss."""
        cfg = self.cfg
        os.makedirs(outdir, exist_ok=True)
        losses_path = os.path.join(outdir, "losses.txt")
        if os.path.isfile(losses_path) and not (force or resume):
            raise RuntimeError(f"Output file exists: {losses_path}")
        # serialize the run config beside the checkpoints (SURVEY.md §5:
        # the reference has no config system; adapter_config.json was its
        # only serialized config)
        import dataclasses as _dc
        import json as _json

        with open(os.path.join(outdir, "train_config.json"), "w") as cf:
            _json.dump(_dc.asdict(cfg), cf, indent=2, default=str)

        ckpt = CheckpointManager(outdir, export_components=self.export_components)
        start_epoch, best_val = 1, float("inf")
        if resume:
            start_epoch, best_val, self.trainable, self.opt_state = ckpt.resume(
                resume, self.trainable, self.opt_state
            )
            logging.info("Resumed (%s) at epoch %d, best_val=%.6e", resume, start_epoch, best_val)

        key = jax.random.PRNGKey(cfg.seed)
        patience = 0
        fit_t0 = time.time()
        with open(losses_path, "a", buffering=1) as f:
            for epoch in range(start_epoch, cfg.epochs + 1):
                key, k_train, k_valid = jax.random.split(key, 3)
                t0 = time.time()
                train_loss, _ = self.run_epoch(train_batches(k_train), k_train, train=True)
                val_loss, val_aux = self.run_epoch(valid_batches(k_valid), k_valid, train=False)
                dt = time.time() - t0

                f.write(f"{epoch:04d}\t{train_loss:.6f}\t{val_loss:.6f}\n")
                logging.info(
                    "epoch %04d train %.6f valid %.6f (%.1fs)", epoch, train_loss, val_loss, dt
                )
                metrics = {"train_loss": train_loss, "val_loss": val_loss, "epoch_seconds": dt}
                if eval_callback is not None:
                    metrics.update(eval_callback(epoch, self.trainable, val_aux) or {})
                if self.metrics_callback is not None:
                    self.metrics_callback(epoch, metrics)

                is_best = val_loss < best_val
                if is_best:
                    best_val = val_loss
                    patience = 0
                    logging.info("New best @ epoch %04d — val_loss=%.6e", epoch, val_loss)
                else:
                    patience += 1
                ckpt.save_epoch(epoch, best_val, self.trainable, self.opt_state, is_best)

                if scheduler is not None:
                    scheduler.step(val_loss)
                    if scheduler.interrupt:
                        logging.info("Curriculum scheduler interrupt at epoch %04d.", epoch)
                        break
                if patience >= cfg.early_stop_patience:
                    logging.info("Early stopping (patience %d) at epoch %04d.", cfg.early_stop_patience, epoch)
                    break
                if cfg.time_budget_s and time.time() - fit_t0 >= cfg.time_budget_s:
                    logging.info(
                        "Wall-clock budget %.0fs reached at epoch %04d (%.0fs).",
                        cfg.time_budget_s, epoch, time.time() - fit_t0)
                    break
        logging.info("Training complete. Best validation loss: %.6f", best_val)
        return best_val

    def reset_optimizer(self) -> None:
        """Optimizer-state reset on curriculum step (tools.py:204-224)."""
        self.opt_state = self.optimizer.init(self.trainable)
