"""Offline preprocessing CLI.

Covers the reference's preprocessing scripts (SURVEY.md §2.8):
  * Signal_vs_Noise/utils/preprocess.py + preprocess_chunked.py — resample
    2048 Hz strain to 16 kHz and store (chunked) datasets;
  * Real_events/preprocess_real_events.py — cut event strain into
    overlapping windows (window 2048, step 204);
  * Glitch_classification/utils/preprocess_data.py — resample + carry labels.

NOTE: gwkit's training/inference graphs resample *on device* inside jit
(gwkit.ops.resample), so offline resampling is optional — this tool exists
for corpus interop with reference-style pipelines, and chunks its output to
bound memory like preprocess_chunked.py.
"""
from __future__ import annotations

from argparse import ArgumentParser

import numpy as np

from gwkit.cli.common import add_common_args, setup


def parse_args(argv=None):
    p = ArgumentParser(description="Offline resampling / windowing of strain corpora.")
    add_common_args(p)
    sub = p.add_subparsers(dest="mode", required=True)

    rs = sub.add_parser("resample", help="Resample every dataset in an HDF5 file.")
    rs.add_argument("input", type=str)
    rs.add_argument("output", type=str)
    rs.add_argument("--original-rate", type=int, default=2048)
    rs.add_argument("--target-rate", type=int, default=16000)
    rs.add_argument("--chunk", type=int, default=1000, help="Rows per processing chunk.")

    ev = sub.add_parser("events", help="Cut event strain into overlapping windows.")
    ev.add_argument("input", type=str, help="HDF5 with one (D, N) dataset per event.")
    ev.add_argument("output", type=str)
    ev.add_argument("--window", type=int, default=2048)
    ev.add_argument("--step", type=int, default=204)
    from gwkit.utils.config import parse_with_config

    return parse_with_config(p, argv)


def _walk_datasets(h5group, prefix=""):
    import h5py

    for key, item in h5group.items():
        path = f"{prefix}/{key}" if prefix else key
        if isinstance(item, h5py.Group):
            yield from _walk_datasets(item, path)
        else:
            yield path, item


def main(argv=None):
    args = parse_args(argv)
    setup(args)
    from gwkit.utils.config import dump_config

    dump_config(args, args.output)
    import h5py
    import jax.numpy as jnp

    from gwkit.ops.resample import resample_fourier

    if args.mode == "resample":
        with h5py.File(args.input, "r") as fin, h5py.File(args.output, "w") as fout:
            for path, ds in _walk_datasets(fin):
                data = ds[()]
                if data.ndim == 1:
                    data = data[None]
                n_out = data.shape[-1] * args.target_rate // args.original_rate
                rows = []
                for s in range(0, len(data), args.chunk):
                    rows.append(np.asarray(resample_fourier(jnp.asarray(data[s : s + args.chunk], jnp.float32), n_out)))
                out = np.concatenate(rows)
                fout.create_dataset(path, data=out.squeeze())
                print(f"{path}: {data.shape} -> {out.shape}")
    else:
        with h5py.File(args.input, "r") as fin, h5py.File(args.output, "w") as fout:
            for path, ds in _walk_datasets(fin):
                strain = ds[()]
                if strain.ndim == 1:
                    strain = strain[None]
                n = strain.shape[-1]
                starts = np.arange(0, n - args.window + 1, args.step)
                windows = np.stack([strain[:, s : s + args.window] for s in starts])
                fout.create_dataset(path, data=windows.astype(np.float32))
                print(f"{path}: {len(starts)} windows of {args.window}")


if __name__ == "__main__":
    main()
