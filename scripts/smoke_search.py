"""Smoke drive: full MLGWSC-1 pipeline — generate challenge data, run the
search engine, evaluate FAR/sensitive distance.

Asserts structural correctness end-to-end: the injection with an untrained
model just exercises the machinery; with a loud-injection shortcut it also
checks that triggers cluster near injections.
"""
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    if os.environ.get("SMOKE_TPU", "0") != "1":
        from gwkit.utils.platform import force_cpu

        force_cpu()
    import h5py
    import jax

    from gwkit.data.generate import generate_challenge_data
    from gwkit.evaluation.mlgwsc import find_injection_times, get_stats, read_events
    from gwkit.models.whisper import WhisperConfig
    from gwkit.search.engine import get_triggers, write_search_output
    from gwkit.train.tasks import build_mlgwsc
    from gwkit.models.qadapter import QAdapterConfig

    with tempfile.TemporaryDirectory() as d:
        fg, bg, inj = (os.path.join(d, n) for n in ("fg.hdf", "bg.hdf", "inj.hdf"))
        t0 = time.time()
        # short stretch: 2 segments x ~5 min
        from gwkit.data.segments import restrict_segments

        segs = [(1238166018.0, 1238166018.0 + 150.0), (1238167018.0, 1238167018.0 + 100.0)]
        params = generate_challenge_data(fg, bg, inj, duration=250.0, seed=1, segments=segs)
        print(f"generated {len(params['tc'])} injections in {time.time()-t0:.1f}s")
        assert len(params["tc"]) >= 3

        # small pooled context keeps the CPU smoke fast; the full (80, 3000)
        # reference geometry runs in bench.py on TPU
        enc = WhisperConfig(d_model=64, n_heads=2, n_layers=2, d_ff=128, max_positions=256)
        qcfg = QAdapterConfig(spectrogram_shape=(64, 64), target_shape=(80, 512))
        task = build_mlgwsc(jax.random.PRNGKey(0), encoder=enc, qcfg=qcfg, usr=True)

        t0 = time.time()
        triggers, all_vals, result = get_triggers(
            task, fg, trigger_threshold=-1e9, batch_size=64
        )
        print(f"search: {result.n_windows} windows, {result.throughput_x_realtime:.1f}x realtime "
              f"({time.time()-t0:.1f}s)")
        fg_events_path = os.path.join(d, "fg_events.hdf")
        write_search_output(fg_events_path, triggers, all_vals)

        trig_bg, vals_bg, _ = get_triggers(task, bg, trigger_threshold=-1e9, batch_size=64)
        bg_events_path = os.path.join(d, "bg_events.hdf")
        write_search_output(bg_events_path, trig_bg, vals_bg)

        with h5py.File(fg_events_path) as f:
            n_events = len(f["time"])
            print(f"fg events: {n_events}, all_vals: {len(f['all_vals'])}")
        assert n_events > 0

        dur, mask = find_injection_times([fg], inj, padding_start=30, padding_end=30)
        print(f"duration {dur:.0f}s, {mask.sum()} injections in analyzed span")
        with h5py.File(inj) as f:
            injparams = {k: f[k][()][mask] for k in ("tc", "distance", "mass1", "mass2")}
        stats = get_stats(read_events([fg_events_path]), read_events([bg_events_path]),
                          injparams, duration=dur, chirp_distance=False)
        print(f"sensitive-distance range: {np.min(stats['sensitive-distance']):.1f}.."
              f"{np.max(stats['sensitive-distance']):.1f} Mpc; "
              f"far points: {len(stats['far'])}")
        assert np.all(np.isfinite(stats["sensitive-distance"]))
    print("SMOKE SEARCH OK")


if __name__ == "__main__":
    main()
