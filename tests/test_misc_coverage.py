"""Coverage for the remaining surfaces: InfoNCE pretrainer, plotting
artifacts, baseline head, orbax checkpointing, real-size HF conversion."""
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp


def test_contrastive_pretrainer_runs_and_reduces_loss(rng, tmp_path):
    from gwkit.models.adapters import AdapterConfig
    from gwkit.models.qadapter import QAdapterConfig
    from gwkit.models.whisper import WhisperConfig
    from gwkit.train.pretrain import ContrastivePretrainer
    from gwkit.train.tasks import build_mlgwsc

    enc = WhisperConfig(d_model=32, n_heads=2, n_layers=1, d_ff=64, max_positions=64)
    qcfg = QAdapterConfig(spectrogram_shape=(32, 32), target_shape=(80, 128), channels=(4, 8, 8))
    task = build_mlgwsc(jax.random.PRNGKey(0), encoder=enc,
                        acfg=AdapterConfig(r=2, alpha=4, targets="kv"), qcfg=qcfg)
    noises = rng.normal(size=(16, 2, 2048)).astype(np.float32)
    waves = (rng.normal(size=(8, 2, 2048)) * 0.5).astype(np.float32)
    pre = ContrastivePretrainer(task, proj_dim=16, lr=1e-3)
    pre.train(noises, waves, steps=3, batch_size=4, outdir=str(tmp_path), log_every=0)
    assert os.path.isfile(tmp_path / "q_adapter_pretrained.npz")
    # adapter-only pretrain (train_full_encoder default False): the learned
    # adapters go to their own file; no misleading "encoder" file is written
    assert os.path.isfile(tmp_path / "adapters_pretrained.npz")
    assert not os.path.isfile(tmp_path / "encoder_pretrained.npz")
    # weights were written back into the task
    assert task.trainable["qadapter"] is pre.trainable["qadapter"]


def test_pretrained_encoder_save_loads_with_bare_template(rng, tmp_path):
    """encoder_pretrained.npz must round-trip through every consumer's bare
    encoder template (cli/common.load_encoder_params, inference's
    _load_gwkit_encoder, the e2e resume path). Regression: the pretrainer
    used to save a combined {adapters, encoder} dict that none of those
    loaders could reconstruct a template for (order-mapped npz leaves)."""
    from gwkit.models.adapters import AdapterConfig
    from gwkit.models.qadapter import QAdapterConfig
    from gwkit.models.whisper import WhisperConfig
    from gwkit.train.checkpoints import load_pytree
    from gwkit.train.pretrain import ContrastivePretrainer
    from gwkit.train.tasks import build_mlgwsc

    enc = WhisperConfig(d_model=32, n_heads=2, n_layers=1, d_ff=64, max_positions=64)
    qcfg = QAdapterConfig(spectrogram_shape=(32, 32), target_shape=(80, 128), channels=(4, 8, 8))
    task = build_mlgwsc(jax.random.PRNGKey(0), encoder=enc,
                        acfg=AdapterConfig(r=2, alpha=4, targets="kv"), qcfg=qcfg)
    noises = rng.normal(size=(16, 2, 2048)).astype(np.float32)
    waves = (rng.normal(size=(8, 2, 2048)) * 0.5).astype(np.float32)
    pre = ContrastivePretrainer(task, proj_dim=16, lr=1e-3, train_full_encoder=True)
    pre.train(noises, waves, steps=2, batch_size=4, outdir=str(tmp_path), log_every=0)

    # bare-template reload, as the training/serving CLIs do
    from gwkit.models.whisper import init_encoder_params

    template = init_encoder_params(jax.random.PRNGKey(1), enc)
    loaded, _ = load_pytree(str(tmp_path / "encoder_pretrained.npz"), template)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
        loaded, task.frozen["encoder"])
    # the pretrained adapters are preserved alongside, in their own file
    adapters, _ = load_pytree(str(tmp_path / "adapters_pretrained.npz"),
                              task.trainable["adapters"])
    assert jax.tree_util.tree_structure(adapters) == jax.tree_util.tree_structure(
        task.trainable["adapters"])


def test_plotting_artifacts(rng, tmp_path):
    pytest.importorskip("matplotlib")
    from gwkit.train.metrics import confusion_matrix
    from gwkit.utils.plotting import (
        plot_confusion_matrix,
        plot_efficiency_curves,
        plot_losses,
        plot_qscan,
        plot_roc,
        plot_sensitivity_vs_far,
    )

    losses = tmp_path / "losses.txt"
    losses.write_text("0001\t0.9\t0.8\n0002\t0.7\t0.75\n")
    assert os.path.isfile(plot_losses(str(losses), str(tmp_path / "l.png")))

    labels = rng.integers(0, 2, 100)
    scores = rng.normal(size=100) + labels
    assert os.path.isfile(plot_roc(labels, scores, str(tmp_path / "r.png"), bootstrap=False))

    cm = confusion_matrix(rng.integers(0, 3, 50), rng.integers(0, 3, 50), 3)
    assert os.path.isfile(plot_confusion_matrix(cm, ["a", "b", "c"], str(tmp_path / "c.png")))

    eff = rng.uniform(0, 1, size=(4, 2))
    assert os.path.isfile(plot_efficiency_curves([5, 7, 9, 11], [1e-2, 1e-4], eff, str(tmp_path / "e.png")))
    assert os.path.isfile(plot_sensitivity_vs_far(
        np.array([1e-4, 1e-2, 1.0]), np.array([100.0, 150.0, 200.0]), str(tmp_path / "s.png")))
    assert os.path.isfile(plot_qscan(rng.uniform(0, 25, (64, 64)), str(tmp_path / "q.png")))


def test_baseline_model(rng):
    from gwkit.models.classifier import baseline_apply
    from gwkit.models.heads import init_mlp_head

    mel = jnp.asarray(rng.normal(size=(3, 8, 10)).astype(np.float32))
    params = init_mlp_head(jax.random.PRNGKey(0), 8 * 10 * 2, (1024, 512, 256), 1)
    out = baseline_apply(params, mel, mel)
    assert out.shape == (3, 1)


def test_cnn_head_two_channel(rng):
    from gwkit.models.classifier import ClassifierConfig, two_channel_apply
    from gwkit.models.heads import init_cnn_head
    from gwkit.models.whisper import WhisperConfig, init_encoder_params

    enc = WhisperConfig(d_model=32, n_heads=2, n_layers=1, d_ff=64, max_positions=16)
    cfg = ClassifierConfig(encoder=enc, head="cnn", num_classes=1)
    params = {
        "encoder": init_encoder_params(jax.random.PRNGKey(0), enc),
        "head": init_cnn_head(jax.random.PRNGKey(1), 1),
    }
    mel = jnp.asarray(rng.normal(size=(2, 80, 32)).astype(np.float32))
    out = two_channel_apply(cfg, params, mel, mel)
    assert out.shape == (2, 1)


def test_orbax_round_trip(tmp_path):
    pytest.importorskip("orbax.checkpoint")
    from gwkit.train.checkpoints import orbax_load, orbax_save

    tree = {"a": jnp.arange(6.0).reshape(2, 3), "b": {"c": jnp.ones(4)}}
    path = str(tmp_path / "ckpt")
    orbax_save(path, tree)
    loaded = orbax_load(path, tree)
    for x, y in zip(jax.tree.leaves(loaded), jax.tree.leaves(tree)):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


@pytest.mark.slow
def test_real_tiny_size_conversion(rng):
    """HF conversion at the real whisper-tiny dimensions (384/6/4)."""
    torch = pytest.importorskip("torch")
    from transformers import WhisperConfig as HFConfig, WhisperModel

    from gwkit.models.hf_io import load_hf_encoder
    from gwkit.models.whisper import encoder_apply

    hf_cfg = HFConfig(
        num_mel_bins=80, d_model=384, encoder_attention_heads=6, encoder_layers=4,
        encoder_ffn_dim=1536, decoder_layers=1, decoder_attention_heads=6,
        decoder_ffn_dim=1536, max_source_positions=1500,
    )
    torch.manual_seed(0)
    enc = WhisperModel(hf_cfg).eval().encoder
    cfg, params = load_hf_encoder(enc, size="tiny")
    mel = rng.normal(size=(1, 80, 3000)).astype(np.float32)
    with torch.no_grad():
        ref = enc(torch.from_numpy(mel)).last_hidden_state.numpy()
    ours = np.asarray(encoder_apply(cfg, params, jnp.asarray(mel)))
    np.testing.assert_allclose(ours, ref, rtol=1e-3, atol=2e-4)


def test_plot_efficiency_vs_epoch(rng, tmp_path):
    pytest.importorskip("matplotlib")
    from gwkit.utils.plotting import plot_efficiency_vs_epoch

    eff = rng.uniform(0, 1, size=(5, 3))
    out = plot_efficiency_vs_epoch([1, 2, 3, 4, 5], eff, [7, 9, 11], 1e-3,
                                   str(tmp_path / "eve.png"))
    assert os.path.isfile(out)


def test_seobnrv4_aliases_to_imrphenomd(rng):
    """Reference Efficiency_test defaults to SEOBNRv4_opt (generate_data.py:
    182); gwkit accepts it as an imrphenomd alias so reference commands port
    verbatim (docs/MIGRATION.md 'Approximant substitution')."""
    import numpy as np

    from gwkit.data.waveforms import canonical_approximant, td_polarizations

    assert canonical_approximant("SEOBNRv4_opt") == "imrphenomd"
    assert canonical_approximant("seobnrv4") == "imrphenomd"
    assert canonical_approximant("imrphenomhm") == "imrphenomhm"

    params = {"mass1": np.array([30.0]), "mass2": np.array([25.0]),
              "distance": np.array([400.0]), "inclination": np.array([0.3]),
              "tc": np.array([0.5]), "coa_phase": np.array([0.1])}
    hp_a, hx_a = td_polarizations(params, 2.0, 2048.0, approximant="seobnrv4_opt")
    hp_d, hx_d = td_polarizations(params, 2.0, 2048.0, approximant="imrphenomd")
    np.testing.assert_array_equal(np.asarray(hp_a), np.asarray(hp_d))
    np.testing.assert_array_equal(np.asarray(hx_a), np.asarray(hx_d))
