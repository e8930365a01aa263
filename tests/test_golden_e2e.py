"""Golden-file end-to-end regression: fixed-seed tiny train -> search ->
evaluate, compared against checked-in expectations (SURVEY.md §4 layer 3).

Locks the semantics of the WHOLE pipeline — corpus generation (IMRPhenomD +
colored noise), on-device injection mixing, the training loop, the search
engine (whiten -> window -> score -> trigger -> cluster), and the MLGWSC-1
evaluation oracle — in a single test that fails on any semantic drift the
unit tests can't see (reference workflow: MLGWSC-1 train.py -> inference.py
-> evaluate.py).

Regenerate expectations after an INTENDED semantic change with:

    python -m tests.test_golden_e2e

and commit the updated tests/golden/e2e_tiny.npz alongside the change.
"""
import os

import h5py
import numpy as np
import pytest

GOLDEN = os.path.join(os.path.dirname(__file__), "golden", "e2e_tiny.npz")


def _run_pipeline(workdir: str) -> dict:
    import jax
    import jax.numpy as jnp

    from gwkit.data.datasets import InjectionDataset
    from gwkit.data.generate import generate_challenge_data, generate_training_set
    from gwkit.evaluation.mlgwsc import find_injection_times, get_stats, read_events
    from gwkit.models.adapters import AdapterConfig
    from gwkit.models.qadapter import QAdapterConfig
    from gwkit.models.whisper import WhisperConfig
    from gwkit.search.engine import get_triggers, write_search_output
    from gwkit.train.tasks import build_mlgwsc
    from gwkit.train.trainer import TrainConfig, Trainer

    corpus = os.path.join(workdir, "train.hdf")
    generate_training_set(corpus, n_train=48, n_valid=16, seed=7, wave_duration=8.0)
    with h5py.File(corpus) as f:
        train_ds = InjectionDataset.load(f, "training", snr_range=(8.0, 20.0))
        valid_ds = InjectionDataset.load(f, "validation", snr_range=(8.0, 20.0))

    enc = WhisperConfig(d_model=32, n_heads=2, n_layers=1, d_ff=64, max_positions=64)
    qcfg = QAdapterConfig(spectrogram_shape=(32, 32), target_shape=(80, 128),
                          channels=(4, 8, 8), median_stride=8)
    acfg = AdapterConfig(r=2, alpha=4, use_dora=True, targets="kv")
    task = build_mlgwsc(jax.random.PRNGKey(0), encoder=enc, acfg=acfg, qcfg=qcfg)
    trainer = Trainer(
        task.loss_fn, task.trainable, task.frozen,
        TrainConfig(learning_rate=3e-4, clip_norm=100.0, epochs=2, batch_size=16,
                    early_stop_patience=2, optimizer="adam"),
    )
    trainer.fit(lambda k: train_ds.batches(k, 16),
                lambda k: valid_ds.batches(k, 16, shuffle=False),
                outdir=os.path.join(workdir, "run"), force=True)

    fg, bg, inj = (os.path.join(workdir, n) for n in ("fg.hdf", "bg.hdf", "inj.hdf"))
    generate_challenge_data(fg, bg, inj, duration=256.0, seed=13,
                            segments=[(1238205000.0, 1238205256.0)], wave_duration=8.0)

    usr = build_mlgwsc(jax.random.PRNGKey(0), encoder=enc, acfg=acfg, qcfg=qcfg, usr=True)
    usr.trainable = trainer.trainable
    out = {}
    for name, path in (("fg", fg), ("bg", bg)):
        triggers, all_vals, _ = get_triggers(usr, path, trigger_threshold=-0.5,
                                             batch_size=64)
        events_path = os.path.join(workdir, f"{name}_events.hdf")
        write_search_output(events_path, triggers, all_vals)
        with h5py.File(events_path) as f:
            out[f"{name}_time"] = f["time"][()]
            out[f"{name}_stat"] = f["stat"][()]
        out[f"{name}_nvals"] = np.asarray([len(all_vals)])
        # the raw score stream locks the full numeric path (whiten -> window
        # -> Q-scan -> encoder -> head) sample-exactly; quantiles lock the
        # score distribution the trigger threshold cuts through
        out[f"{name}_vals_sample"] = np.asarray(all_vals)[::37][:64]
        out[f"{name}_vals_quantiles"] = np.quantile(
            np.asarray(all_vals, np.float64), [0.01, 0.25, 0.5, 0.75, 0.99])

    dur, mask = find_injection_times([fg], inj, padding_start=30, padding_end=30)
    with h5py.File(inj) as f:
        injparams = {k: f[k][()][mask] for k in ("tc", "distance", "mass1", "mass2")}
    stats = get_stats(
        read_events([os.path.join(workdir, "fg_events.hdf")]),
        read_events([os.path.join(workdir, "bg_events.hdf")]),
        injparams, duration=dur, chirp_distance=False,
    )
    out["far"] = np.asarray(stats["far"])
    out["sensitive_distance"] = np.asarray(stats["sensitive-distance"])
    out["sensitive_fraction"] = np.asarray(stats["sensitive-fraction"])
    return out


@pytest.mark.slow
def test_golden_e2e(tmp_path):
    assert os.path.isfile(GOLDEN), (
        "missing golden file — generate with `python -m tests.test_golden_e2e`")
    got = _run_pipeline(str(tmp_path))
    with np.load(GOLDEN) as want:
        assert sorted(got) == sorted(want.files)
        for key in want.files:
            np.testing.assert_allclose(
                got[key], want[key], rtol=1e-4, atol=1e-6,
                err_msg=f"e2e drift in '{key}' — if intended, regenerate "
                        f"tests/golden/e2e_tiny.npz (see module docstring)")


if __name__ == "__main__":
    import tempfile

    from gwkit.utils.platform import force_cpu

    force_cpu(n_virtual_devices=8)  # match tests/conftest.py (CPU, f32-highest)
    with tempfile.TemporaryDirectory() as td:
        result = _run_pipeline(td)
    os.makedirs(os.path.dirname(GOLDEN), exist_ok=True)
    np.savez(GOLDEN, **result)
    for k, v in sorted(result.items()):
        print(k, np.asarray(v).shape, np.asarray(v).ravel()[:4])
    print(f"wrote {GOLDEN}")
