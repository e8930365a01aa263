"""InfoNCE contrastive pretraining of the Q-adapter + encoder.

Parity with ContrastivePretrainer (MLGWSC-1/train.py:377-463,884-920):
AdamW over Q-adapter + encoder(+adapters) + a 2-layer projection head,
fixed-step loop (default 60k steps), temperature 0.1, pair sampling from
PretrainDataset semantics; weights saved + reloaded at the end.

TPU design: the step is one jit program. Unlike the reference (which trains
*all* encoder params during pretraining), the encoder's base weights stay
frozen and the DoRA adapters carry the adaptation — same trainable surface
as fine-tuning, which keeps the pretrain->finetune handoff consistent.
A ``train_full_encoder=True`` escape hatch reproduces the reference exactly.
"""
from __future__ import annotations

import logging
import os
import time
from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import optax

from gwkit.models.classifier import ClassifierConfig
from gwkit.models.heads import init_mlp_head, mlp_head_apply
from gwkit.train.checkpoints import save_pytree
from gwkit.train.losses import info_nce
from gwkit.data.datasets import sample_pretrain_pairs


class ContrastivePretrainer:
    def __init__(
        self,
        task,  # gwkit.train.tasks.Task (mlgwsc)
        proj_dim: int = 256,
        lr: float = 1e-4,
        temperature: float = 0.1,
        train_full_encoder: bool = False,
        seed: int = 0,
    ):
        self.task = task
        self.temp = temperature
        cfg: ClassifierConfig = task.cfg
        d = cfg.encoder.d_model * cfg.n_detectors
        key = jax.random.PRNGKey(seed)
        proj = init_mlp_head(key, d, (proj_dim,), proj_dim)

        # every non-head trainable (Q-adapter and/or DoRA adapters) learns
        # during pretraining; the supervised head is task-specific and stays
        # out (it is trained fresh afterwards)
        trainable = {k: v for k, v in task.trainable.items() if k != "head"}
        trainable["proj"] = proj
        frozen = dict(task.frozen)
        if train_full_encoder and "encoder" in frozen:
            trainable["encoder"] = frozen.pop("encoder")
        self.trainable, self.frozen = trainable, frozen
        self.optimizer = optax.adamw(lr)
        self.opt_state = self.optimizer.init(trainable)
        assert task.embed is not None, (
            "contrastive pretraining needs a task with an `embed` surface "
            "(build_mlgwsc / build_signal_vs_noise provide one)")
        embed = task.embed

        @partial(jax.jit, donate_argnums=(0, 1))
        def step(trainable, opt_state, x1, x2):
            def loss_fn(tr):
                z1 = mlp_head_apply(tr["proj"], embed(tr, frozen, x1))
                z2 = mlp_head_apply(tr["proj"], embed(tr, frozen, x2))
                return info_nce(z1, z2, temperature=self.temp)

            loss, grads = jax.value_and_grad(loss_fn)(trainable)
            updates, opt_state = self.optimizer.update(grads, opt_state, trainable)
            return optax.apply_updates(trainable, updates), opt_state, loss

        self._step = step

    def train(
        self,
        noises: jnp.ndarray,
        waveforms: jnp.ndarray,
        steps: int = 60_000,
        batch_size: int = 128,
        snr_range: Tuple[float, float] = (5.0, 15.0),
        noise_only_prob: float = 0.25,
        outdir: str | None = None,
        seed: int = 0,
        log_every: int = 100,
    ) -> None:
        """Fixed-step InfoNCE loop over PretrainDataset-style pairs."""
        noises = jnp.asarray(noises, jnp.float32)
        waveforms = jnp.asarray(waveforms, jnp.float32)
        key = jax.random.PRNGKey(seed)
        n_wave = waveforms.shape[0]
        t0 = time.time()
        for it in range(steps):
            key, k_idx, k_pair = jax.random.split(key, 3)
            idx = jax.random.randint(k_idx, (batch_size,), 0, n_wave)
            x1, x2 = sample_pretrain_pairs(
                k_pair, noises, waveforms, idx, snr_range, noise_only_prob
            )
            self.trainable, self.opt_state, loss = self._step(self.trainable, self.opt_state, x1, x2)
            if log_every and (it % log_every == 0 or it == steps - 1):
                logging.info("pretrain step %d/%d loss %.4f (%.1fs)", it, steps, float(loss), time.time() - t0)
        # write back into the task + save/reload round trip (train.py:912-920)
        for k in self.task.trainable:
            if k in self.trainable:
                self.task.trainable[k] = self.trainable[k]
        if "encoder" in self.trainable:
            self.task.frozen["encoder"] = self.trainable["encoder"]
        if outdir:
            os.makedirs(outdir, exist_ok=True)
            if "qadapter" in self.trainable:
                save_pytree(os.path.join(outdir, "q_adapter_pretrained.npz"),
                            self.trainable["qadapter"])
            # Each surface in its own file with a BARE pytree: npz leaves are
            # order-mapped onto the loader's template, so every consumer of
            # encoder_pretrained.npz (--pretrained-encoder on the training
            # CLIs, load_task_from_components, the e2e resume path) can load
            # it with an encoder template alone — a combined
            # {adapters, encoder} dict would require the loader to know the
            # pretrain-time AdapterConfig to even reconstruct the template.
            if "adapters" in self.trainable:
                save_pytree(os.path.join(outdir, "adapters_pretrained.npz"),
                            self.trainable["adapters"])
            if "encoder" in self.trainable:
                save_pytree(os.path.join(outdir, "encoder_pretrained.npz"),
                            self.trainable["encoder"])
            logging.info("Saved pretraining weights.")
