"""Small HDF5 helpers shared by data generation, search, and evaluation."""
from __future__ import annotations

import os

import h5py
import numpy as np


def check_file_existence(path: str | None, force: bool) -> None:
    """Refuse to overwrite an existing output unless --force.

    Reference: MLGWSC-1/generate_data.py:32-41, inference.py:627-632.
    """
    if path is not None and os.path.isfile(path) and not force:
        raise IOError(f"The file {path} already exists. Set the flag `--force` to overwrite it.")


def write_datasets(path: str, datasets: dict, mode: str = "w", attrs: dict | None = None) -> None:
    with h5py.File(path, mode) as fp:
        for key, val in datasets.items():
            fp.create_dataset(key, data=np.asarray(val))
        if attrs:
            for key, val in attrs.items():
                fp.attrs[key] = val


def read_datasets(path: str, keys=None) -> dict:
    out = {}
    with h5py.File(path, "r") as fp:
        for key in (keys if keys is not None else fp.keys()):
            out[key] = fp[key][()]
    return out
