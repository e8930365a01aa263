"""Waveform-generation throughput: TD polarizations per second, batched.

The reference generates injections by fanning per-waveform lalsuite calls
over a multiprocessing pool (bnslib.py:1447-1467; gen.py WaveformGetter) —
tens of waveforms/s/core. gwkit synthesizes a whole parameter table as one
jit-compiled FD batch + one batched irfft (gwkit/data/waveforms.py), so the
MXU/VPU sees one program. This script measures waveforms/s per approximant
at challenge geometry (16 s @ 2048 Hz) on whatever backend is active
(WF_CPU=1 forces CPU).

Usage: python scripts/bench_waveforms.py   (prints one line per approximant)
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    if os.environ.get("WF_CPU", "0") == "1":
        from gwkit.utils.platform import force_cpu

        force_cpu()
    import jax

    from gwkit.data.waveforms import (
        APPROXIMANTS, SourceDistribution, td_polarizations)

    batch = int(os.environ.get("WF_BATCH", "256"))
    dur, fs = float(os.environ.get("WF_DURATION", "16")), 2048.0
    reps = int(os.environ.get("WF_REPS", "3"))
    print(f"backend: {jax.devices()[0].platform}, batch {batch}, {dur:.0f}s @ {fs:.0f}Hz")

    rng = np.random.default_rng(0)
    for apx in APPROXIMANTS:
        precessing = apx.split("-")[0] in ("imrphenomp", "imrphenomxphm")
        dist = SourceDistribution(spin_max=0.99 if precessing else 0.5,
                                  isotropic_spins=precessing, approximant=apx)
        params = dist.sample(rng, batch)
        params["tc"] = np.full(batch, 0.75 * dur)
        # warmup = compile
        hp, _ = td_polarizations(params, dur, fs, approximant=apx)
        float(jax.numpy.sum(hp))  # fetch-forced sync (PJRT block_until_ready quirk)
        t0 = time.time()
        for _ in range(reps):
            hp, hc = td_polarizations(params, dur, fs, approximant=apx)
            float(jax.numpy.sum(hp) + jax.numpy.sum(hc))
        dt = (time.time() - t0) / reps
        print(f"{apx:>14}: {batch / dt:8.0f} waveforms/s  ({dt * 1e3 / batch:6.2f} ms each)")


if __name__ == "__main__":
    main()
