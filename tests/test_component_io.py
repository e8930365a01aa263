"""Component-checkpoint round trip: Task.export_components ->
inference CLI's load_task_from_components -> identical scores.

This validates the reference-format persistence surface end to end
(MLGWSC-1 train.py:723-737 save -> inference.py:415-430 build_model).
"""
import numpy as np

import jax
import jax.numpy as jnp

from gwkit.models.adapters import AdapterConfig
from gwkit.models.qadapter import QAdapterConfig
from gwkit.models.whisper import WhisperConfig
from gwkit.train.checkpoints import save_pytree
from gwkit.train.tasks import build_mlgwsc


def test_component_round_trip(tmp_path, rng, monkeypatch):
    enc = WhisperConfig(d_model=32, n_heads=2, n_layers=2, d_ff=64, max_positions=64)
    qcfg = QAdapterConfig(spectrogram_shape=(32, 32), target_shape=(80, 128), channels=(4, 8, 8))
    acfg = AdapterConfig(r=2, alpha=4, use_dora=True, targets="qkvo")
    task = build_mlgwsc(jax.random.PRNGKey(0), encoder=enc, acfg=acfg, qcfg=qcfg, usr=True)
    # perturb so adapters are non-trivial
    task.trainable = jax.tree.map(lambda x: x + 0.01, task.trainable)

    outdir = str(tmp_path)
    task.export_components(outdir, task.trainable)

    # the CLI loader rebuilds from components; patch its task builder to use
    # our tiny geometry (the CLI reads size presets; geometry comes from args)
    import gwkit.cli.inference as inf

    def build_small(key, encoder="tiny", acfg=None, encoder_params=None, usr=True):
        return build_mlgwsc(key, encoder=enc, acfg=acfg, qcfg=qcfg,
                            encoder_params=encoder_params, usr=usr)

    import gwkit.train.tasks as tasks_mod

    real_build = tasks_mod.build_mlgwsc
    monkeypatch.setattr(
        "gwkit.cli.inference.build_mlgwsc",
        lambda key, encoder, acfg, encoder_params, usr, qcfg=None: build_small(
            key, acfg=acfg, encoder_params=encoder_params, usr=usr
        ),
        raising=False,
    )
    # load_task_from_components imports build_mlgwsc inside the function, so
    # patch at the source module instead
    monkeypatch.setattr(tasks_mod, "build_mlgwsc",
                        lambda key, encoder, acfg, encoder_params, usr, qcfg=None: build_small(
                            key, acfg=acfg, encoder_params=encoder_params, usr=usr))
    # config_for must also yield our tiny cfg for n_layers when importing the dir
    import gwkit.models.whisper as W

    monkeypatch.setattr(W, "config_for", lambda size, **kw: enc)

    loaded = inf.load_task_from_components(
        lora_weights=f"{outdir}/best_lora_weights",
        dense_weights=f"{outdir}/best_dense_layers.npz",
        adapter_weights=f"{outdir}/best_adapter.npz",
        encoder="tiny", usr=True, seed=0,
    )
    # base encoder weights are random per seed; align them for comparison
    loaded.frozen = task.frozen

    x = jnp.asarray(rng.normal(size=(2, 2, 2048)).astype(np.float32))
    ref = np.asarray(task.forward(task.trainable, task.frozen, x))
    out = np.asarray(loaded.forward(loaded.trainable, loaded.frozen, x))
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-5)


def test_load_gwkit_encoder_repins_positions(tmp_path, monkeypatch):
    """_load_gwkit_encoder loads a stored-geometry encoder and regenerates
    the fixed sinusoidal position table at the serving geometry (the npz
    pretrained-encoder counterpart of inference.py's build_model)."""
    import dataclasses

    import gwkit.cli.inference as inf
    import gwkit.models.whisper as W
    from gwkit.models.whisper import init_encoder_params, sinusoid_positions

    enc = WhisperConfig(d_model=32, n_heads=2, n_layers=2, d_ff=64, max_positions=64)
    stored = init_encoder_params(jax.random.PRNGKey(3), enc)
    stored = jax.tree.map(lambda x: x + 0.5, stored)
    path = str(tmp_path / "enc.npz")
    save_pytree(path, stored)

    monkeypatch.setattr(W, "config_for", lambda size, **kw: enc)
    serving_cfg = dataclasses.replace(enc, max_positions=32)
    loaded = inf._load_gwkit_encoder(path, "tiny", serving_cfg)

    assert loaded["pos"].shape == (32, 32)
    np.testing.assert_allclose(
        np.asarray(loaded["pos"]), sinusoid_positions(32, 32), atol=1e-6)
    for key in stored:
        if key != "pos":
            np.testing.assert_allclose(
                np.asarray(jax.tree.leaves(loaded[key])[0]),
                np.asarray(jax.tree.leaves(stored[key])[0]))


def test_load_gwkit_encoder_third_geometry(tmp_path, monkeypatch):
    """A checkpoint stored at a geometry matching NEITHER the default size
    NOR the serving config still loads: the stored max_positions is inferred
    from the pos leaf in the npz (round 5 — serving a production-(80,512)
    capstone at the strict (80,3000) reference geometry)."""
    import dataclasses

    import gwkit.cli.inference as inf
    import gwkit.models.whisper as W
    from gwkit.models.whisper import init_encoder_params, sinusoid_positions

    enc = WhisperConfig(d_model=32, n_heads=2, n_layers=2, d_ff=64, max_positions=64)
    stored = init_encoder_params(jax.random.PRNGKey(3), enc)
    stored = jax.tree.map(lambda x: x + 0.25, stored)
    path = str(tmp_path / "enc.npz")
    save_pytree(path, stored)

    # default lookup resolves to yet another geometry (neither stored nor serving)
    monkeypatch.setattr(
        W, "config_for",
        lambda size, **kw: dataclasses.replace(enc, max_positions=128))
    serving_cfg = dataclasses.replace(enc, max_positions=32)
    loaded = inf._load_gwkit_encoder(path, "tiny", serving_cfg)

    assert loaded["pos"].shape == (32, 32)
    np.testing.assert_allclose(
        np.asarray(loaded["pos"]), sinusoid_positions(32, 32), atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(jax.tree.leaves(loaded["conv1"])[0]),
        np.asarray(jax.tree.leaves(stored["conv1"])[0]))


def test_load_task_with_pretrained_encoder(tmp_path, monkeypatch):
    """load_task_from_components(pretrained_encoder=...) serves a model whose
    base encoder came from InfoNCE pretraining instead of the seed init."""
    from gwkit.models.whisper import init_encoder_params

    enc = WhisperConfig(d_model=32, n_heads=2, n_layers=2, d_ff=64, max_positions=64)
    qcfg = QAdapterConfig(spectrogram_shape=(32, 32), target_shape=(80, 128), channels=(4, 8, 8))
    acfg = AdapterConfig(r=2, alpha=4, use_dora=True, targets="qkvo")
    task = build_mlgwsc(jax.random.PRNGKey(0), encoder=enc, acfg=acfg, qcfg=qcfg, usr=True)
    outdir = str(tmp_path)
    task.export_components(outdir, task.trainable)

    pretrained = jax.tree.map(lambda x: x * 0.0 + 0.125, init_encoder_params(jax.random.PRNGKey(9), enc))
    enc_path = str(tmp_path / "encoder_pretrained_full.npz")
    save_pytree(enc_path, pretrained)

    import gwkit.cli.inference as inf
    import gwkit.models.whisper as W
    import gwkit.train.tasks as tasks_mod

    monkeypatch.setattr(W, "config_for", lambda size, **kw: enc)
    monkeypatch.setattr(
        tasks_mod, "build_mlgwsc",
        lambda key, encoder, acfg, encoder_params, usr, qcfg=None: build_mlgwsc(
            key, encoder=enc, acfg=acfg, qcfg=QAdapterConfig(
                spectrogram_shape=(32, 32), target_shape=(80, 128), channels=(4, 8, 8)),
            encoder_params=encoder_params, usr=usr))

    loaded = inf.load_task_from_components(
        lora_weights=f"{outdir}/best_lora_weights",
        dense_weights=f"{outdir}/best_dense_layers.npz",
        adapter_weights=f"{outdir}/best_adapter.npz",
        encoder="tiny", usr=True, seed=0,
        pretrained_encoder=enc_path, target_shape=(80, 128),
    )
    # every non-pos frozen-encoder leaf is the pretrained constant, not the
    # seed-random init
    frozen_enc = dict(loaded.frozen["encoder"])
    frozen_enc.pop("pos")
    for leaf in jax.tree.leaves(frozen_enc):
        np.testing.assert_allclose(np.asarray(leaf), 0.125)
