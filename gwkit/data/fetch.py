"""Real-data ingestion: Gravity Spy glitch corpora and GWTC event strain.

The reference fetches open LIGO data with gwpy
(`Glitch_classification/utils/generate_glitch_dataset.py:19-116`: per-CSV-row
``TimeSeries.fetch_open_data(ifo, gps-8, gps+8)`` -> 2x decimate to 2048 Hz
-> pycbc whiten (4 s segments) -> 30 Hz highpass -> crop [gps-0.8, gps+0.2))
and feeds event strain HDF5s into `Real_events/preprocess_real_events.py`.

This module provides the same ingestion surface with the network call
isolated behind an injectable ``fetch_fn`` (gwpy is imported lazily and only
when no ``fetch_fn`` is given), so:

* with network + gwpy installed, `build_gravityspy_corpus` /
  `fetch_event_file` are drop-in replacements for the reference scripts;
* without (this zero-egress build), everything after the fetch —
  CSV parsing, decimation, whitening, highpass, cropping, labeling, output
  layouts — is exercised by tests with synthetic fetch functions.

DSP runs through gwkit's device pipeline (`preprocess_glitch_strain` wraps
whiten_estimate + highpass) instead of per-row pycbc calls in an mp pool.
"""
from __future__ import annotations

import csv
import logging
import os
import re
from typing import Callable, Dict, List, Optional, Sequence, Tuple

import numpy as np

from gwkit.data.glitch import CLASS_TO_INDEX, GLITCH_CLASSES

#: fetch_fn(ifo: str, gps_start: float, gps_end: float) -> (strain f64 array, sample_rate)
FetchFn = Callable[[str, float, float], Tuple[np.ndarray, float]]


def gwpy_fetch(ifo: str, gps_start: float, gps_end: float) -> Tuple[np.ndarray, float]:
    """Open-data fetch via gwpy (network + gwpy required; reference
    generate_glitch_dataset.py:19-29)."""
    try:
        from gwpy.timeseries import TimeSeries
    except ImportError as e:  # pragma: no cover - gwpy absent in this image
        raise RuntimeError(
            "gwpy is required for open-data fetching; install gwpy or pass "
            "an explicit fetch_fn") from e
    data = TimeSeries.fetch_open_data(ifo, gps_start, gps_end, cache=True)
    return np.asarray(data.value, np.float64), float(data.sample_rate.value)


def read_gravityspy_csv(path: str, label: Optional[str] = None) -> List[dict]:
    """Parse a Gravity Spy trigger CSV into rows with GPStime/snr/ifo/label.

    The reference derives the class label from the CSV *filename*
    (`preprocess_data.py` label-from-filename); an explicit ``label``
    overrides, and a 'label' column (if present) wins over both.
    """
    if label is None:
        stem = os.path.splitext(os.path.basename(path))[0]
        cleaned = re.sub(r"[_-]+", " ", stem).strip()
        for cls in GLITCH_CLASSES:
            if cls.lower() in cleaned.lower():
                label = cls
                break
    rows = []
    with open(path, newline="") as f:
        for rec in csv.DictReader(f):
            rec = {k.strip(): v for k, v in rec.items()}
            rows.append({
                "GPStime": float(rec["GPStime"]),
                "snr": float(rec.get("snr", 0.0)),
                "ifo": rec.get("ifo", "H1").strip(),
                "label": rec.get("label", label),
            })
    return rows


def fetch_glitch_window(
    row: dict,
    fetch_fn: FetchFn,
    target_rate: float = 2048.0,
    half_span: float = 8.0,
) -> Optional[np.ndarray]:
    """One CSV row -> whitened/highpassed 1 s window at 2048 Hz, cropped
    [gps-0.8, gps+0.2) around the trigger (reference process_row semantics:
    generate_glitch_dataset.py:31-72). Returns None on fetch failure/NaNs."""
    from gwkit.data.glitch import preprocess_glitch_strain

    gps = row["GPStime"]
    try:
        strain, rate = fetch_fn(row["ifo"], gps - half_span, gps + half_span)
    except Exception as e:
        logging.error("fetch failed for %s @ %s: %s", row["ifo"], gps, e)
        return None
    strain = np.asarray(strain, np.float64)
    step = int(round(rate / target_rate))
    if step > 1:
        strain = strain[::step]  # reference decimates 4096 -> 2048 by [::2]
    n = strain.shape[0]
    # whiten the full span (4 s PSD segments); crop asymmetrically so the
    # trigger sits at 0.8 s into the 1 s window
    white = preprocess_glitch_strain(
        strain[None], sample_rate=target_rate, segment_duration=4.0,
        crop_duration=None,  # crop by GPS below, not by center
    )[0]
    crop_lost = (n - white.shape[0]) // 2  # symmetric whitening-edge crop
    center = n // 2 - crop_lost  # trigger sample index in the whitened series
    lo = center - int(round(0.8 * target_rate))
    hi = lo + int(round(1.0 * target_rate))
    if lo < 0 or hi > white.shape[0]:
        return None
    window = white[lo:hi]
    if np.isnan(window).any():
        logging.warning("NaNs for GPS %s", gps)
        return None
    return window.astype(np.float32)


def build_gravityspy_corpus(
    csv_paths: Sequence[str],
    output_path: str,
    fetch_fn: Optional[FetchFn] = None,
    max_rows_per_file: Optional[int] = None,
) -> int:
    """CSV trigger lists -> labeled glitch corpus HDF5 ('strain' [N, 2048],
    'labels' [N], 'SNR' [N]) in the layout `gwkit.cli.train_glitch` consumes
    (reference output: 'Strain'/'SNR' per processed file). Returns N."""
    import h5py

    fetch_fn = fetch_fn or gwpy_fetch
    strains, labels, snrs = [], [], []
    for path in csv_paths:
        rows = read_gravityspy_csv(path)
        if max_rows_per_file:
            rows = rows[:max_rows_per_file]
        for row in rows:
            if row["label"] not in CLASS_TO_INDEX:
                logging.warning("unknown class %r; skipping", row["label"])
                continue
            window = fetch_glitch_window(row, fetch_fn)
            if window is None:
                continue
            strains.append(window)
            labels.append(CLASS_TO_INDEX[row["label"]])
            snrs.append(row["snr"])
    if not strains:
        raise IOError("no valid rows fetched")
    with h5py.File(output_path, "w") as f:
        f.create_dataset("strain", data=np.stack(strains))
        f.create_dataset("labels", data=np.asarray(labels, np.int64))
        f.create_dataset("SNR", data=np.asarray(snrs, np.float64))
    return len(strains)


def fetch_event_file(
    events: Dict[str, float],
    output_path: str,
    fetch_fn: Optional[FetchFn] = None,
    detectors: Sequence[str] = ("H1", "L1"),
    half_span: float = 8.0,
    target_rate: float = 2048.0,
) -> None:
    """GWTC events ({name: gps}) -> the {event: {h1_strain, l1_strain}} HDF5
    the real-events preprocessor consumes (reference
    preprocess_real_events.py:31-39 input layout)."""
    import h5py

    fetch_fn = fetch_fn or gwpy_fetch
    with h5py.File(output_path, "w") as f:
        for name, gps in events.items():
            g = f.create_group(name)
            for det in detectors:
                strain, rate = fetch_fn(det, gps - half_span, gps + half_span)
                step = int(round(rate / target_rate))
                if step > 1:
                    strain = np.asarray(strain)[::step]
                g.create_dataset(f"{det.lower()[0]}1_strain", data=np.asarray(strain, np.float64))
                g.attrs["gps"] = gps
