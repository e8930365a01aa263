"""Stream evaluation: per-file score series -> events -> FAR & sensitivity sweep.

Parity with Efficiency_test/src/evaluate_test_data.py:260-632: assemble the
network's per-window scores into a continuous ranking time series (softmax
probability or USR logit difference), extract triggers/clusters/events, split
true/false positives against the injection table, and sweep ranking
thresholds to produce FAR (per month) vs sensitive-volume curves.
"""
from __future__ import annotations

import dataclasses
from typing import Dict, Optional, Sequence

import numpy as np

from gwkit.evaluation.mlgwsc import mchirp
from gwkit.evaluation.sensitivity import volume_montecarlo
from gwkit.search.cluster import (
    SECONDS_PER_MONTH,
    events_above_threshold,
    get_cluster_boundaries,
    get_event_list_from_triggers,
    get_triggers_from_series,
    split_true_and_false_positives,
)


@dataclasses.dataclass
class StreamEvalResult:
    ranking_thresholds: np.ndarray
    far_per_month: np.ndarray
    sensitive_fraction: np.ndarray
    sensitive_volume: np.ndarray
    sensitive_distance: np.ndarray
    events: list


def evaluate_score_stream(
    values: np.ndarray,
    sample_times: np.ndarray,
    injections: Dict[str, np.ndarray],
    trigger_thresh: float = 0.2,
    ranking_thresholds: Optional[Sequence[float]] = None,
    cluster_tolerance: float = 1.0,
    event_tolerance: float = 3.0,
) -> StreamEvalResult:
    """Sweep ranking thresholds over one score stream.

    ``injections``: dict with 'tc' (+ optional 'mass1','mass2','distance'
    for sensitive-volume estimation).
    """
    triggers = get_triggers_from_series(values, sample_times, trigger_thresh)
    clusters = get_cluster_boundaries(triggers, cluster_tolerance)
    events = get_event_list_from_triggers(triggers, clusters)
    injtimes = np.sort(np.asarray(injections["tc"]))
    duration = sample_times[-1] - sample_times[0] if len(sample_times) > 1 else 1.0

    if ranking_thresholds is None:
        stats = np.asarray([ev[1] for ev in events])
        ranking_thresholds = (
            np.quantile(stats, np.linspace(0, 1, 50)) if len(stats) else np.linspace(0, 1, 10)
        )
    ranking_thresholds = np.asarray(ranking_thresholds)

    has_params = all(k in injections for k in ("mass1", "mass2", "distance"))
    fars, fracs, vols, dists = [], [], [], []
    for thresh in ranking_thresholds:
        sig = events_above_threshold(events, float(thresh))
        tp, fp = split_true_and_false_positives(sig, injtimes, event_tolerance, assume_sorted=True)
        fars.append(len(fp) / duration * SECONDS_PER_MONTH)
        # which injections were found
        if len(tp):
            tp_times = np.asarray([ev[0] for ev in tp])
            idx = np.clip(np.searchsorted(injtimes, tp_times), 0, len(injtimes) - 1)
            left = np.clip(idx - 1, 0, len(injtimes) - 1)
            pick = np.where(
                np.abs(injtimes[left] - tp_times) <= np.abs(injtimes[idx] - tp_times), left, idx
            )
            found = np.unique(pick)
        else:
            found = np.asarray([], int)
        fracs.append(len(found) / max(len(injtimes), 1))
        if has_params:
            missed = np.setdiff1d(np.arange(len(injtimes)), found)
            order = np.argsort(np.asarray(injections["tc"]))
            m1 = np.asarray(injections["mass1"])[order]
            m2 = np.asarray(injections["mass2"])[order]
            dist = np.asarray(injections["distance"])[order]
            f_d = dist[found] if len(found) else np.array([0.0])
            f_mc = mchirp(m1[found], m2[found]) if len(found) else np.array([1.0])
            m_d = dist[missed] if len(missed) else np.array([1.0])
            m_mc = mchirp(m1[missed], m2[missed]) if len(missed) else np.array([np.inf])
            vol, _ = volume_montecarlo(f_d, m_d, f_mc, m_mc, "distance", "volume", "distance")
            vols.append(vol)
            dists.append((3.0 * vol / (4.0 * np.pi)) ** (1.0 / 3.0))
        else:
            vols.append(np.nan)
            dists.append(np.nan)
    return StreamEvalResult(
        ranking_thresholds=ranking_thresholds,
        far_per_month=np.asarray(fars),
        sensitive_fraction=np.asarray(fracs),
        sensitive_volume=np.asarray(vols),
        sensitive_distance=np.asarray(dists),
        events=events,
    )


def scores_to_series(
    window_scores: np.ndarray,
    window_times: np.ndarray,
    mode: str = "usr",
) -> tuple[np.ndarray, np.ndarray]:
    """Window scores -> ranking series. mode 'softmax': scores are p(signal);
    'usr': raw logits (logit-difference ranking when given (N,2) outputs —
    evaluate_test_data.py's subtraction-layer swap)."""
    scores = np.asarray(window_scores)
    if scores.ndim == 2 and scores.shape[1] == 2:
        scores = scores[:, 0] - scores[:, 1] if mode == "usr" else scores[:, 0]
    return scores.reshape(-1), np.asarray(window_times).reshape(-1)
