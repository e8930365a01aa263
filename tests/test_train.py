"""Training-layer tests: losses (golden vs torch), curriculum semantics,
datasets mixing, checkpoint round trips, metrics vs sklearn."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from gwkit.train.curriculum import EpochCLScheduler, PlateauCLScheduler, ThresholdCLScheduler
from gwkit.train.early_stopping import EarlyStopper
from gwkit.train.losses import bce_with_logits, cross_entropy, info_nce, reg_bce
from gwkit.train.metrics import binary_f1, confusion_matrix, f1_scores, roc_auc


class TestLossesVsTorch:
    torch = pytest.importorskip("torch")

    def test_reg_bce(self, rng):
        import torch
        import torch.nn as nn

        probs = rng.uniform(0.01, 0.99, size=(8, 2)).astype(np.float32)
        probs /= probs.sum(-1, keepdims=True)
        y = np.eye(2, dtype=np.float32)[rng.integers(0, 2, 8)]

        class RegBCE(nn.BCELoss):
            def __init__(self, epsilon=1e-6, dim=2):
                super().__init__()
                self.a, self.b = epsilon, 1.0 - epsilon * dim

            def forward(self, inputs, target):
                return super().forward(self.a + self.b * inputs, target)

        ref = RegBCE()(torch.from_numpy(probs), torch.from_numpy(y)).item()
        ours = float(reg_bce(jnp.asarray(probs), jnp.asarray(y)))
        assert abs(ours - ref) < 1e-6

    def test_bce_with_logits(self, rng):
        import torch

        logits = rng.normal(size=(16, 1)).astype(np.float32)
        y = rng.integers(0, 2, 16).astype(np.float32)
        ref = torch.nn.BCEWithLogitsLoss()(torch.from_numpy(logits.squeeze(1)), torch.from_numpy(y)).item()
        ours = float(bce_with_logits(jnp.asarray(logits), jnp.asarray(y)))
        assert abs(ours - ref) < 1e-6

    def test_cross_entropy(self, rng):
        import torch

        logits = rng.normal(size=(16, 11)).astype(np.float32)
        y = rng.integers(0, 11, 16)
        ref = torch.nn.CrossEntropyLoss()(torch.from_numpy(logits), torch.from_numpy(y)).item()
        ours = float(cross_entropy(jnp.asarray(logits), jnp.asarray(y)))
        assert abs(ours - ref) < 1e-5

    def test_info_nce_matches_reference_formula(self, rng):
        """Check against a direct torch transcription of the reference's
        _info_nce (MLGWSC-1/train.py:413-424)."""
        import torch
        import torch.nn.functional as F

        z1 = torch.randn(8, 16)
        z2 = torch.randn(8, 16)
        t = 0.1
        z1n, z2n = F.normalize(z1, dim=1), F.normalize(z2, dim=1)
        z = torch.cat([z1n, z2n], dim=0)
        sim = (z @ z.T) / t
        mask = ~torch.eye(16, dtype=torch.bool)
        exp_sim = torch.exp(sim) * mask
        pos = torch.exp((z1n * z2n).sum(dim=1) / t)
        loss = (-torch.log(pos / exp_sim[:8].sum(1)) - torch.log(pos / exp_sim[8:].sum(1))).mean()
        ours = float(info_nce(jnp.asarray(z1.numpy()), jnp.asarray(z2.numpy()), temperature=t))
        assert abs(ours - loss.item()) < 1e-4


def test_early_stopper():
    es = EarlyStopper(patience=2)
    assert not es.early_stop(1.0)
    assert not es.early_stop(0.9)
    assert not es.early_stop(0.95)
    assert es.early_stop(0.96)


def test_plateau_scheduler_steps_on_plateau():
    s = PlateauCLScheduler([(50, 60), (30, 40), (10, 20)], patience=1, verbose=False)
    assert s.current == (50, 60)
    s.step(1.0)
    s.step(1.0)
    s.step(1.0)  # > patience bad epochs -> advance
    assert s.current == (30, 40)
    s.step(0.5)
    s.step(0.5)
    s.step(0.5)
    assert s.current == (10, 20)
    assert s.done


def test_threshold_scheduler():
    s = ThresholdCLScheduler([(50, 60), (30, 40)], threshold=0.2, verbose=False)
    s.step(0.5)
    assert s.current == (50, 60)
    s.step(0.1)
    assert s.current == (30, 40)


def test_epoch_scheduler():
    s = EpochCLScheduler([(50, 60), (30, 40)], patience=2, verbose=False)
    for _ in range(2):
        s.step()
    assert s.current == (50, 60)
    s.step()
    assert s.current == (30, 40)


def test_injection_dataset_mixing(rng):
    from gwkit.data.datasets import InjectionDataset

    noises = rng.normal(size=(10, 2, 64)).astype(np.float32)
    waves = np.ones((4, 2, 64), np.float32)
    ds = InjectionDataset(noises=noises, waveforms=waves, snr_range=(3.0, 3.0))
    x, y, snr = ds.sample_batch(jax.random.PRNGKey(0), jnp.arange(10))
    x = np.asarray(x)
    # injections: noise + 3*wave for idx<4
    np.testing.assert_allclose(x[:4], noises[:4] + 3.0, rtol=1e-5)
    np.testing.assert_allclose(x[4:], noises[4:], rtol=1e-5)
    np.testing.assert_array_equal(np.asarray(y)[:4], [[1, 0]] * 4)
    np.testing.assert_array_equal(np.asarray(y)[4:], [[0, 1]] * 6)
    assert np.allclose(np.asarray(snr)[:4], 3.0) and np.allclose(np.asarray(snr)[4:], 0.0)


def test_injection_dataset_batches_deterministic(rng):
    from gwkit.data.datasets import InjectionDataset

    ds = InjectionDataset(
        noises=rng.normal(size=(12, 1, 32)).astype(np.float32),
        waveforms=rng.normal(size=(6, 1, 32)).astype(np.float32),
    )
    key = jax.random.PRNGKey(7)
    run1 = [np.asarray(x) for x, _, _ in ds.batches(key, 4)]
    run2 = [np.asarray(x) for x, _, _ in ds.batches(key, 4)]
    for a, b in zip(run1, run2):
        np.testing.assert_array_equal(a, b)
    # different key -> different order
    run3 = [np.asarray(x) for x, _, _ in ds.batches(jax.random.PRNGKey(8), 4)]
    assert any(not np.array_equal(a, b) for a, b in zip(run1, run3))


def test_small_validation_set_still_yields_a_batch(rng):
    """drop_remainder=False must wrap-pad a sub-batch-size epoch to ONE batch.

    Regression: training CLIs evaluate with batch_size >= 32; a validation set
    smaller than that produced zero batches and crashed the eval callback.
    """
    from gwkit.data.datasets import InjectionDataset

    ds = InjectionDataset(
        noises=rng.normal(size=(6, 1, 32)).astype(np.float32),
        waveforms=rng.normal(size=(3, 1, 32)).astype(np.float32),
    )
    key = jax.random.PRNGKey(0)
    assert len(list(ds.batches(key, 32))) == 0  # drop_remainder default
    got = list(ds.batches(key, 32, shuffle=False, drop_remainder=False))
    assert len(got) == 1 and got[0][0].shape[0] == 32


def test_noise_only_dataset_batches(rng):
    """Zero-waveform datasets (efficiency FAP thresholds) must batch cleanly."""
    from gwkit.data.datasets import InjectionDataset

    ds = InjectionDataset(
        noises=rng.normal(size=(8, 1, 32)).astype(np.float32),
        waveforms=np.zeros((0, 1, 32), np.float32),
    )
    (x, y, snr), = list(ds.batches(jax.random.PRNGKey(0), 8, shuffle=False))
    np.testing.assert_allclose(np.asarray(x), np.asarray(ds.noises), rtol=1e-6)
    np.testing.assert_array_equal(np.asarray(y), [[0, 1]] * 8)
    assert np.all(np.asarray(snr) == 0.0)


def test_injection_dataset_hdf5_round_trip(tmp_path, rng):
    import h5py

    from gwkit.data.datasets import InjectionDataset

    ds = InjectionDataset(
        noises=rng.normal(size=(6, 2, 32)).astype(np.float32),
        waveforms=rng.normal(size=(3, 2, 32)).astype(np.float32),
    )
    path = str(tmp_path / "ds.hdf")
    with h5py.File(path, "w") as f:
        ds.save(f, "training")
    with h5py.File(path, "r") as f:
        ds2 = InjectionDataset.load(f, "training")
    np.testing.assert_array_equal(np.asarray(ds.noises), np.asarray(ds2.noises))
    np.testing.assert_array_equal(np.asarray(ds.waveforms), np.asarray(ds2.waveforms))


def test_checkpoint_round_trip(tmp_path):
    import optax

    from gwkit.train.checkpoints import load_pytree, save_pytree

    tree = {"a": jnp.arange(5.0), "b": [jnp.ones((2, 3)), {"c": jnp.zeros(1)}]}
    opt = optax.adam(1e-3)
    state = opt.init(tree)
    path = str(tmp_path / "ck.npz")
    save_pytree(path, {"t": tree, "s": state}, meta={"epoch": 7})
    loaded, meta = load_pytree(path, {"t": tree, "s": state})
    assert meta["epoch"] == 7
    for a, b in zip(jax.tree.leaves(loaded), jax.tree.leaves({"t": tree, "s": state})):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_trainer_time_budget_stops_early(tmp_path):
    """TrainConfig.time_budget_s halts fit() after the epoch that crosses the
    wall-clock budget — the matched-device-time knob for encoder-size
    comparisons (tiny vs base at equal spend)."""
    import time

    from gwkit.train.trainer import TrainConfig, Trainer

    def loss_fn(tr, frozen, batch, key):
        return jnp.sum((tr["w"] - batch) ** 2), {}

    def batches(_key):
        # host-side sleep stands in for device time; 3 batches/epoch
        for _ in range(3):
            time.sleep(0.05)
            yield jnp.ones(4)

    epochs_seen = []
    trainer = Trainer(
        loss_fn, {"w": jnp.zeros(4)}, {},
        TrainConfig(learning_rate=1e-2, epochs=50, batch_size=4,
                    early_stop_patience=50, time_budget_s=0.4),
        metrics_callback=lambda epoch, m: epochs_seen.append(epoch),
    )
    trainer.fit(batches, batches, outdir=str(tmp_path / "run"), force=True)
    # each epoch is >=0.3s of batch time (train+valid); the 0.4s budget must
    # stop well short of 50 epochs but always complete epoch 1
    assert 1 <= len(epochs_seen) <= 3


def test_metrics_vs_sklearn(rng):
    sklearn = pytest.importorskip("sklearn")
    from sklearn.metrics import f1_score, roc_auc_score

    labels = rng.integers(0, 2, 200)
    scores = rng.normal(size=200) + labels * 1.5
    assert abs(roc_auc(labels, scores) - roc_auc_score(labels, scores)) < 1e-9
    preds = (scores > 0.5).astype(int)
    assert abs(binary_f1(labels, preds) - f1_score(labels, preds)) < 1e-9

    y = rng.integers(0, 4, 100)
    p = rng.integers(0, 4, 100)
    from sklearn.metrics import confusion_matrix as sk_cm, f1_score as sk_f1

    np.testing.assert_array_equal(confusion_matrix(y, p, 4), sk_cm(y, p, labels=range(4)))
    stats = f1_scores(confusion_matrix(y, p, 4))
    assert abs(stats["macro_f1"] - sk_f1(y, p, average="macro")) < 1e-9
    assert abs(stats["weighted_f1"] - sk_f1(y, p, average="weighted")) < 1e-9
