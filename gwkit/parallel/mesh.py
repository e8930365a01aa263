"""Mesh construction + sharding rules for every gwkit pytree.

Axes:
  * "data"  — batch sharding (training) / window sharding (search)
  * "model" — tensor parallelism of attention heads + MLP hidden dim

Rules (encoder params have a leading n_layers axis from the lax.scan stack):
  q/k/v weights (L, d_in, d_out) shard d_out on "model" (head sharding);
  out-proj and fc2 shard d_in (their inputs are the sharded activations, so
  GSPMD reduces with one psum per block — the Megatron layout); DoRA
  adapters follow their base projection (b-matrix and magnitude on the
  sharded axis); everything small (conv stem, LN, heads, FiLM) replicates.
"""
from __future__ import annotations

from typing import Any, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(n_model: int = 1, devices=None) -> Mesh:
    """Mesh over all (or given) devices: ("data", "model") with the model
    axis innermost so tensor-parallel collectives ride neighboring ICI links."""
    devices = np.asarray(devices if devices is not None else jax.devices())
    n = devices.size
    if n % n_model:
        raise ValueError(f"{n} devices not divisible by model parallelism {n_model}")
    return Mesh(devices.reshape(n // n_model, n_model), (DATA_AXIS, MODEL_AXIS))


def _ns(mesh: Mesh, *spec) -> NamedSharding:
    return NamedSharding(mesh, P(*spec))


def encoder_sharding(mesh: Mesh) -> Any:
    """PartitionSpec pytree matching gwkit.models.whisper params."""
    rep2, rep3 = _ns(mesh, None, None), _ns(mesh, None, None, None)
    ln = {"g": _ns(mesh, None, None), "b": _ns(mesh, None, None)}
    col = {"w": _ns(mesh, None, None, MODEL_AXIS), "b": _ns(mesh, None, MODEL_AXIS)}  # shard d_out
    col_nb = {"w": _ns(mesh, None, None, MODEL_AXIS)}
    row = {"w": _ns(mesh, None, MODEL_AXIS, None), "b": _ns(mesh, None, None)}  # shard d_in
    return {
        "conv1": {"w": rep3, "b": _ns(mesh, None)},
        "conv2": {"w": rep3, "b": _ns(mesh, None)},
        "pos": rep2,
        "layers": {
            "attn_ln": ln,
            "q": dict(col),
            "k": col_nb,
            "v": dict(col),
            "o": row,
            "mlp_ln": ln,
            "fc1": dict(col),
            "fc2": row,
        },
        "ln_post": {"g": _ns(mesh, None), "b": _ns(mesh, None)},
    }


def adapter_sharding(mesh: Mesh, adapters: Any) -> Any:
    """Adapters follow their base projection's layout."""
    out = {}
    for proj, entry in adapters.items():
        if proj in ("q", "k", "v"):
            spec = {
                "a": _ns(mesh, None, None, None),
                "b": _ns(mesh, None, None, MODEL_AXIS),
                "m": _ns(mesh, None, MODEL_AXIS),
            }
        else:  # out-proj: d_in sharded
            spec = {
                "a": _ns(mesh, None, MODEL_AXIS, None),
                "b": _ns(mesh, None, None, None),
                "m": _ns(mesh, None, None),
            }
        spec["scaling"] = _ns(mesh, None)
        out[proj] = {k: spec[k] for k in entry}
    return out


def replicated(mesh: Mesh, tree: Any) -> Any:
    return jax.tree.map(lambda x: _ns(mesh, *([None] * np.ndim(x))), tree)


def batch_sharding(mesh: Mesh, tree: Any) -> Any:
    """Shard the leading axis of every leaf over "data"."""
    return jax.tree.map(
        lambda x: _ns(mesh, *((DATA_AXIS,) + (None,) * (np.ndim(x) - 1))), tree
    )


def task_shardings(mesh: Mesh, tree: Any) -> Any:
    """Sharding pytree for a task-level dict (a Task's ``trainable`` or
    ``frozen``): "encoder" gets the Megatron layout, "adapters" follow their
    base projections, everything else (heads, Q-adapter, FiLM) replicates."""
    out = {}
    for name, sub in tree.items():
        if name == "encoder":
            out[name] = encoder_sharding(mesh)
        elif name == "adapters":
            out[name] = adapter_sharding(mesh, sub)
        else:
            out[name] = replicated(mesh, sub)
    return out


def shard_task_tree(mesh: Mesh, tree: Any) -> Any:
    """device_put a Task's trainable/frozen dict with the standard layout."""
    return jax.device_put(tree, task_shardings(mesh, tree))


def shard_params(mesh: Mesh, encoder_params, adapters=None, extras: Optional[dict] = None):
    """device_put every pytree with its sharding; returns the same structure."""
    enc = jax.device_put(encoder_params, encoder_sharding(mesh))
    out = [enc]
    if adapters is not None:
        out.append(jax.device_put(adapters, adapter_sharding(mesh, adapters)))
    if extras is not None:
        out.append(jax.device_put(extras, replicated(mesh, extras)))
    return out[0] if len(out) == 1 else tuple(out)
