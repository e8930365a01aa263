"""Parallel-layer tests on the virtual 8-device CPU mesh: sharded training
step and window-sharded search equality."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from gwkit.models.adapters import AdapterConfig
from gwkit.models.whisper import WhisperConfig
from gwkit.parallel.mesh import (
    DATA_AXIS,
    adapter_sharding,
    batch_sharding,
    encoder_sharding,
    make_mesh,
    replicated,
)
from gwkit.train.tasks import build_signal_vs_noise

pytestmark = pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")

ENC = WhisperConfig(d_model=64, n_heads=2, n_layers=2, d_ff=128, max_positions=64)


def _tiny_task():
    return build_signal_vs_noise(
        jax.random.PRNGKey(0), encoder=ENC,
        acfg=AdapterConfig(r=2, alpha=4, use_dora=True, targets="qkvo"),
        input_sample_rate=256, n_frames=128,
    )


def test_sharded_forward_matches_single_device(rng):
    task = _tiny_task()
    x = jnp.asarray(rng.normal(size=(8, 2, 256)).astype(np.float32))
    base = np.asarray(task.forward(task.trainable, task.frozen, x))

    mesh = make_mesh(n_model=2)
    frozen = {"encoder": jax.device_put(task.frozen["encoder"], encoder_sharding(mesh))}
    trainable = {
        "adapters": jax.device_put(task.trainable["adapters"],
                                   adapter_sharding(mesh, task.trainable["adapters"])),
        "head": jax.device_put(task.trainable["head"], replicated(mesh, task.trainable["head"])),
    }
    xs = jax.device_put(x, NamedSharding(mesh, P(DATA_AXIS, None, None)))
    sharded = np.asarray(jax.jit(task.forward)(trainable, frozen, xs))
    np.testing.assert_allclose(sharded, base, rtol=1e-4, atol=1e-5)


def test_window_sharded_search_matches(rng):
    from gwkit.search.engine import score_segments
    from gwkit.search.slicer import Segment, SlicerConfig

    task = _tiny_task()

    @jax.jit
    def score_fn(w):
        return task.forward(task.trainable, task.frozen, w).reshape(-1)

    strain = rng.normal(size=(2, 256 * 30)).astype(np.float32)
    seg = Segment(key="s", strain=strain, start_time=0.0, delta_t=1.0 / 256)
    cfg = SlicerConfig(step_size=0.5, slice_length=256, batch_size=16,
                       segment_duration=2.0, max_filter_duration=0.5,
                       low_frequency_cutoff=10.0)
    single = score_segments(score_fn, [seg], cfg, trigger_threshold=-1e9, white=True)
    mesh = make_mesh(n_model=1)  # 8-way data parallel
    sharded = score_segments(score_fn, [seg], cfg, trigger_threshold=-1e9, white=True, mesh=mesh)
    np.testing.assert_allclose(sharded.all_vals, single.all_vals, rtol=1e-5, atol=1e-6)
    assert sharded.n_windows == single.n_windows
