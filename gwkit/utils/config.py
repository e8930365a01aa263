"""One config tree for every CLI entry point.

The reference configures each script with its own 30-flag argparse
(MLGWSC-1/train.py:780-826) plus ad-hoc python-module configs
(Efficiency_test/src/pars.py) — SURVEY.md §5 calls for a single config
system with CLI overrides, serialized beside checkpoints. gwkit's:

* every entry point accepts ``--config foo.json``;
* precedence: argparse defaults < config file < explicitly passed flags;
* the resolved config is grouped into a fixed section tree
  (run / data / model / train / search / eval) and written as
  ``config.json`` next to the entry point's outputs, so a run is exactly
  reproducible with ``--config <outdir>/config.json``;
* sections share one global dest->section registry, so the same key means
  the same thing in every tool (one schema, not eleven).

Config files may be nested by section or flat; unknown keys are rejected
(typos should fail loudly, not silently train with defaults).
"""
from __future__ import annotations

import argparse
import json
import logging
import os
from typing import Dict, Optional

# Global dest -> section registry. Any dest not listed lands in "run".
SECTIONS: Dict[str, str] = {
    # data
    "dataset": "data", "dataset_dir": "data", "data_dir": "data",
    "input": "data", "inputfile": "data", "input_sample_rate": "data",
    "sample_rate": "data", "n_detectors": "data", "snr": "data",
    "snrs": "data", "n_frames": "data", "duration": "data",
    "real_noise_path": "data", "n_train": "data", "n_valid": "data",
    "waveform_fraction": "data", "approximant": "data", "chunk_size": "data",
    "window": "data", "step": "data", "window_duration": "data",
    "wave_duration": "data",
    # model
    "encoder": "model", "method": "model", "lora_rank": "model",
    "lora_alpha": "model", "target_modules": "model", "hf_checkpoint": "model",
    "spectrogram_shape": "model", "target_shape": "model", "q_range": "model",
    "kernel_length": "model", "num_classes": "model", "head": "model",
    "full_finetune": "model",
    # train
    "learning_rate": "train", "epochs": "train", "batch_size": "train",
    "clip_norm": "train", "early_stop_patience": "train", "optimizer": "train",
    "resume": "train", "pretrain_steps": "train", "pretrain_lr": "train",
    "pretrain_temp": "train", "noise_only_prob": "train", "scheduler": "train",
    "run_index": "train", "valid_fraction": "train",
    # search
    "step_size": "search", "trigger_threshold": "search", "white": "search",
    "cluster_threshold": "search", "low_frequency_cutoff": "search",
    "whitened_file": "search", "raw_triggers_file": "search",
    "softmax": "search", "stream": "search", "shard_dir": "search",
    # eval
    "injection_file": "eval", "foreground_events": "eval",
    "background_events": "eval", "foreground_files": "eval",
    "chirp_distance": "eval", "faps": "eval", "padding_start": "eval",
    "padding_end": "eval",
}

_RUN_ONLY = {"config", "help"}


def add_config_arg(parser: argparse.ArgumentParser) -> None:
    parser.add_argument("--config", type=str, default=None,
                        help="JSON config (flat or sectioned); explicitly "
                             "passed flags take precedence over it.")


def _all_actions(parser: argparse.ArgumentParser):
    """Every action of the parser AND its subparsers (recursively)."""
    for a in parser._actions:
        yield a
        if isinstance(a, argparse._SubParsersAction):
            for sub in a.choices.values():
                yield from _all_actions(sub)


def _explicit_dests(parser: argparse.ArgumentParser, argv) -> set:
    """Which dests were actually passed on the command line: re-parse with
    every default (including subcommand defaults) suppressed, so only
    explicit flags appear in the result."""
    saved = [(a, a.default) for a in _all_actions(parser)]
    try:
        for a, _ in saved:
            a.default = argparse.SUPPRESS
        ns, _ = parser.parse_known_args(argv)
        return set(vars(ns))
    finally:
        for a, d in saved:
            a.default = d


def _flatten(tree: dict) -> dict:
    """Accept {section: {key: v}} or flat {key: v} (sections may mix)."""
    flat = {}
    section_names = set(SECTIONS.values()) | {"run"}
    for key, val in tree.items():
        if key in section_names and isinstance(val, dict):
            flat.update(val)
        else:
            flat[key] = val
    return flat


def parse_with_config(parser: argparse.ArgumentParser, argv=None) -> argparse.Namespace:
    """parse_args with --config support and defaults < file < flags precedence."""
    add_config_arg(parser)
    args = parser.parse_args(argv)
    if args.config:
        explicit = _explicit_dests(parser, argv)
        with open(args.config) as f:
            flat = _flatten(json.load(f))
        known = set(vars(args))
        unknown = [k for k in flat if k not in known]
        if unknown:
            raise SystemExit(
                f"--config {args.config}: keys not accepted by this entry "
                f"point: {sorted(unknown)}")
        for dest, val in flat.items():
            if dest not in explicit and dest not in _RUN_ONLY:
                setattr(args, dest, val)
    return args


def config_tree(args: argparse.Namespace) -> dict:
    """Group the resolved namespace into the section tree."""
    tree: Dict[str, dict] = {}
    for dest, val in sorted(vars(args).items()):
        if dest in _RUN_ONLY:
            continue
        tree.setdefault(SECTIONS.get(dest, "run"), {})[dest] = val
    return tree


def dump_config(args: argparse.Namespace, outdir: Optional[str],
                name: str = "config.json") -> Optional[str]:
    """Serialize the resolved config beside the run's outputs (reloadable
    via --config). ``outdir`` may be a directory or a sibling file path."""
    if not outdir:
        return None
    if os.path.splitext(outdir)[1]:  # looks like an output *file*: write a
        # sibling <file>.config.json so several tools can share a directory
        name = os.path.basename(outdir) + ".config.json"
        outdir = os.path.dirname(os.path.abspath(outdir))
    os.makedirs(outdir, exist_ok=True)
    path = os.path.join(outdir, name)
    with open(path, "w") as f:
        json.dump(config_tree(args), f, indent=2, sort_keys=True, default=str)
    logging.info("resolved config written to %s", path)
    return path
