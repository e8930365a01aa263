"""CLI surface tests: every entry point imports, exposes --help, parses its
reference-parity flags, and round-trips the unified --config tree."""
import importlib
import json

import pytest

CLI_MODULES = [
    "gwkit.cli.train",
    "gwkit.cli.train_mlgwsc",
    "gwkit.cli.train_glitch",
    "gwkit.cli.train_efficiency",
    "gwkit.cli.inference",
    "gwkit.cli.evaluate",
    "gwkit.cli.evaluate_classifier",
    "gwkit.cli.evaluate_stream",
    "gwkit.cli.generate_data",
    "gwkit.cli.calculate_efficiencies",
    "gwkit.cli.preprocess",
]


@pytest.mark.parametrize("mod_name", CLI_MODULES)
def test_cli_help(mod_name, capsys):
    mod = importlib.import_module(mod_name)
    with pytest.raises(SystemExit) as exc:
        mod.parse_args(["--help"])
    assert exc.value.code == 0
    assert "usage" in capsys.readouterr().out.lower()


def test_train_defaults():
    from gwkit.cli.train import parse_args

    args = parse_args(["-d", "x.hdf", "-o", "out"])
    assert args.method == "DoRA" and args.lora_rank == 8 and args.lora_alpha == 32
    assert args.encoder == "tiny" and args.n_frames == 3000


def test_inference_flags():
    from gwkit.cli.inference import parse_args

    args = parse_args([
        "in.hdf", "out.hdf", "--lora-weights", "lw", "--dense-weights", "dw",
        "--adapter-weights", "aw",
    ])
    assert args.trigger_threshold == -0.5  # USR default (inference.py:611)
    assert args.step_size == 0.1 and args.cluster_threshold == 0.35


def test_generate_data_modes():
    from gwkit.cli.generate_data import parse_args

    a = parse_args(["challenge", "-f", "f.hdf", "-b", "b.hdf", "-i", "i.hdf"])
    assert a.mode == "challenge" and a.dataset == 1
    t = parse_args(["training", "-o", "t.hdf"])
    assert t.mode == "training"


def test_real_events_cli_help(capsys):
    from gwkit.cli.real_events import parse_args

    with pytest.raises(SystemExit) as exc:
        parse_args(["--help"])
    assert exc.value.code == 0


# minimal required argv per entry point (config-tree round-trip tests)
REQUIRED_ARGV = {
    "gwkit.cli.train": ["-d", "x.hdf", "-o", "out"],
    "gwkit.cli.train_mlgwsc": ["-d", "dsdir", "-o", "out"],
    "gwkit.cli.train_glitch": ["-d", "x.hdf", "-o", "out"],
    "gwkit.cli.train_efficiency": ["-d", "x.hdf", "-o", "out"],
    "gwkit.cli.inference": ["in.hdf", "out.hdf", "--lora-weights", "l",
                            "--dense-weights", "d", "--adapter-weights", "a"],
    "gwkit.cli.evaluate": ["--injection-file", "i", "--foreground-events", "f",
                           "--foreground-files", "ff", "--background-events", "b",
                           "--output-file", "o.hdf"],
    "gwkit.cli.evaluate_classifier": ["-d", "x.hdf", "--checkpoint", "c.npz", "-o", "out"],
    "gwkit.cli.evaluate_stream": ["--injection-file", "i.hdf", "--data-dir", "d"],
    "gwkit.cli.generate_data": ["training", "-o", "out.hdf"],
    "gwkit.cli.calculate_efficiencies": ["-d", "x.hdf", "--checkpoint-dir", "c", "-o", "out"],
    "gwkit.cli.preprocess": ["resample", "in.hdf", "out.hdf"],
    "gwkit.cli.real_events": ["-d", "e.hdf", "--checkpoint", "c.npz", "-o", "out.hdf"],
}


def _normalize(v):
    return list(v) if isinstance(v, (list, tuple)) else v


@pytest.mark.parametrize("mod_name", sorted(REQUIRED_ARGV))
def test_config_roundtrip_and_precedence(mod_name, tmp_path):
    """--config <dumped tree> reproduces a run's resolved flags on every
    entry point, and explicitly passed flags beat the config file."""
    from gwkit.utils.config import config_tree

    mod = importlib.import_module(mod_name)
    argv = REQUIRED_ARGV[mod_name]
    ref = mod.parse_args(["--seed", "7"] + argv)
    cfg_path = tmp_path / "config.json"
    cfg_path.write_text(json.dumps(config_tree(ref), default=str))

    # round trip: defaults come back from the file
    loaded = mod.parse_args(["--config", str(cfg_path)] + argv)
    for dest, want in vars(ref).items():
        if dest == "config":
            continue
        assert _normalize(getattr(loaded, dest)) == _normalize(want), dest
    assert loaded.seed == 7  # file value applied over the parser default

    # precedence: an explicit flag beats the same key in the file
    override = mod.parse_args(["--config", str(cfg_path), "--seed", "9"] + argv)
    assert override.seed == 9

    # typo'd keys fail loudly
    cfg_path.write_text(json.dumps({"train": {"not_a_real_key": 1}}))
    with pytest.raises(SystemExit):
        mod.parse_args(["--config", str(cfg_path)] + argv)


def test_evaluate_classifier_glitch_mode(tmp_path):
    """--task glitch consumes the flat 'strain'/'labels' layout and writes a
    confusion matrix + per-class report (ADVICE r4: the documented
    Glitch_classification/src/evaluate.py replacement must actually run)."""
    import h5py
    import jax
    import numpy as np

    from gwkit.cli.evaluate_classifier import main, parse_args
    from gwkit.models.adapters import AdapterConfig
    from gwkit.train.checkpoints import save_pytree
    from gwkit.train.tasks import build_glitch

    rng = np.random.default_rng(0)
    data = tmp_path / "glitch.hdf"
    with h5py.File(data, "w") as f:
        f.create_dataset("strain", data=rng.normal(size=(12, 256)).astype(np.float32))
        f.create_dataset("labels", data=rng.integers(0, 4, 12).astype(np.int64))

    # checkpoint whose pytree matches the CLI's task construction
    task = build_glitch(jax.random.PRNGKey(7), encoder="tiny",
                        acfg=AdapterConfig(r=8, alpha=32, use_dora=True, targets="qkvo"),
                        num_classes=4, input_sample_rate=256, n_frames=128)
    ckpt = tmp_path / "best.npz"
    save_pytree(str(ckpt), task.trainable)

    out = tmp_path / "eval"
    main(["-d", str(data), "--checkpoint", str(ckpt), "-o", str(out),
          "--task", "glitch", "--num-classes", "4", "--valid-fraction", "0",
          "--n-frames", "128", "--input-sample-rate", "256", "--seed", "7",
          "--batch-size", "6"])
    assert (out / "evaluation.txt").read_text().startswith("accuracy")
    cm = np.loadtxt(out / "confusion_matrix.txt")
    assert cm.shape == (4, 4) and cm.sum() == 12
