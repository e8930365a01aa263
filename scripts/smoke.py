"""End-to-end smoke drive of the gwkit public API on synthetic data.

Drives the Signal_vs_Noise-shaped flow through the package boundary:
  synthetic 2048 Hz H1/L1 strain -> device resample to 16 kHz -> fused
  log-mel + Whisper encoder (+DoRA) + two-channel head forward (one jit graph)
  -> logits; plus a Q-scan of a chirp (MLGWSC-1 front end).

Usage: python scripts/smoke.py  (CPU ok; set JAX_PLATFORMS=cpu off-TPU)
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    if os.environ.get("SMOKE_TPU", "0") != "1":
        from gwkit.utils.platform import force_cpu

        force_cpu()
    import jax
    import jax.numpy as jnp

    from gwkit.models.adapters import AdapterConfig, init_adapters, n_trainable
    from gwkit.models.classifier import ClassifierConfig, init_head, two_channel_from_audio
    from gwkit.models.whisper import WhisperConfig, init_encoder_params
    from gwkit.ops.qtransform import qscan
    from gwkit.ops.resample import resample_timeseries

    print(f"devices: {jax.devices()}")

    # Tiny encoder so the smoke run is fast on CPU; the architecture is identical.
    enc_cfg = WhisperConfig(d_model=64, n_heads=2, n_layers=2, d_ff=128, max_positions=1500)
    cfg = ClassifierConfig(encoder=enc_cfg, head="two_channel", num_classes=1)
    key = jax.random.PRNGKey(0)
    k1, k2, k3 = jax.random.split(key, 3)
    enc_params = init_encoder_params(k1, enc_cfg)
    adapters = init_adapters(k2, enc_cfg, AdapterConfig(r=8, alpha=32, use_dora=True, targets="kv"), enc_params)
    params = {"encoder": enc_params, "head": init_head(k3, cfg)}
    print(f"trainable adapter params: {n_trainable(adapters)}")

    # Synthetic 1 s dual-detector strain at 2048 Hz: noise + a chirp in sample 0.
    rng = np.random.default_rng(0)
    strain = rng.normal(size=(4, 2, 2048)).astype(np.float32)
    t = np.linspace(0, 1, 2048)
    chirp = np.sin(2 * np.pi * (30 * t + 80 * t ** 2)) * np.hanning(2048)
    strain[0] += 5.0 * chirp

    audio = resample_timeseries(jnp.asarray(strain))  # (4, 2, 16000)
    print(f"resampled: {audio.shape}")

    fwd = jax.jit(lambda p, a, h1, l1: two_channel_from_audio(cfg, p, h1, l1, adapters=a))
    t0 = time.time()
    logits = fwd(params, adapters, audio[:, 0], audio[:, 1])
    logits.block_until_ready()
    print(f"logits (compile {time.time()-t0:.1f}s): {np.asarray(logits).ravel()}")
    t0 = time.time()
    logits = fwd(params, adapters, audio[:, 0], audio[:, 1])
    logits.block_until_ready()
    print(f"steady-state fwd: {time.time()-t0:.3f}s")
    assert np.isfinite(np.asarray(logits)).all()

    spec = np.asarray(qscan(jnp.asarray(strain[:, 0]), spectrogram_shape=(64, 64)))
    peak_row, peak_col = np.unravel_index(spec[0].argmax(), spec[0].shape)
    print(f"qscan: {spec.shape}, chirp peak energy {spec[0].max():.1f} at (f={peak_row}, t={peak_col}); "
          f"noise-only peak {spec[1].max():.1f}")
    assert spec[0].max() > 2 * spec[1].max(), "chirp should dominate the Q-scan energy"
    print("SMOKE OK")


if __name__ == "__main__":
    main()
