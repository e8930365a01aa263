"""CLI surface tests: every entry point imports, exposes --help, and parses
its reference-parity flags."""
import importlib

import pytest

CLI_MODULES = [
    "gwkit.cli.train",
    "gwkit.cli.train_mlgwsc",
    "gwkit.cli.train_glitch",
    "gwkit.cli.train_efficiency",
    "gwkit.cli.inference",
    "gwkit.cli.evaluate",
    "gwkit.cli.evaluate_classifier",
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
