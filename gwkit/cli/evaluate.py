"""MLGWSC-1 evaluation CLI (reference: MLGWSC-1/evaluate.py): FAR and
sensitive distance from foreground/background event files."""
from __future__ import annotations

import os
from argparse import ArgumentParser

import h5py
import numpy as np

from gwkit.cli.common import add_common_args, setup


def parse_args(argv=None):
    p = ArgumentParser(description="Calculate FAR and sensitive distance of a search (MLGWSC-1 protocol).")
    add_common_args(p)
    p.add_argument("--injection-file", type=str, required=True)
    p.add_argument("--foreground-events", type=str, nargs="+", required=True)
    p.add_argument("--foreground-files", type=str, nargs="+", required=True)
    p.add_argument("--background-events", type=str, nargs="+", required=True)
    p.add_argument("--output-file", type=str, required=True)
    from gwkit.utils.config import parse_with_config

    return parse_with_config(p, argv)


def main(argv=None):
    args = parse_args(argv)
    setup(args)
    from gwkit.utils.config import dump_config

    dump_config(args, args.output_file)
    from gwkit.evaluation.mlgwsc import find_injection_times, get_stats, read_events

    if os.path.splitext(args.output_file)[1] != ".hdf":
        raise ValueError("The output file must have the extension `.hdf`.")
    if os.path.isfile(args.output_file) and not args.force:
        raise IOError(f"The file {args.output_file} already exists. Use --force to overwrite.")

    padding_start, padding_end = 30, 30
    dur, idxs = find_injection_times(
        args.foreground_files, args.injection_file,
        padding_start=padding_start, padding_end=padding_end,
    )
    if np.sum(idxs) == 0:
        raise RuntimeError(
            "The foreground data contains no injections! Generate at least "
            f"{padding_start + padding_end + 24} seconds of data."
        )

    injparams = {}
    with h5py.File(args.injection_file, "r") as fp:
        for key in ("tc", "distance", "mass1", "mass2"):
            injparams[key] = fp[key][()][idxs]
        use_chirp_distance = "chirp_distance" in fp.keys()

    fg_events = read_events(args.foreground_events)
    bg_events = read_events(args.background_events)
    stats = get_stats(fg_events, bg_events, injparams, duration=dur,
                      chirp_distance=use_chirp_distance)

    mode = "w" if args.force else "x"
    with h5py.File(args.output_file, mode) as fp:
        for key, val in stats.items():
            fp.create_dataset(key, data=np.array(val))
    print(f"Wrote {args.output_file}")


if __name__ == "__main__":
    main()
