"""Checkpointing with the reference's export surface.

Reference behavior (MLGWSC-1/train.py:470-476, 583-609, 618-640):
  * every epoch: ``last.ckpt`` (epoch, best_val_loss, model, optimizer state)
    + per-epoch ``state_e_{epoch:04d}.npz``
  * on new best: ``best.npz`` plus decomposed components — Q-adapter state,
    HF/peft-compatible LoRA dir, classifier head (train.py:723-737)
  * resume 'latest' (model+optimizer) or 'best' (model only).

Format: flattened-pytree ``.npz`` (fast, dependency-free, works for any
dict/list/namedtuple pytree given a structure template at load time). An
orbax async path is available for large multi-host runs.
"""
from __future__ import annotations

import json
import os
from typing import Any, Optional, Tuple

import jax
import numpy as np


def save_pytree(path: str, tree: Any, meta: Optional[dict] = None) -> None:
    leaves = jax.tree.leaves(tree)
    arrays = {f"leaf_{i:05d}": np.asarray(leaf) for i, leaf in enumerate(leaves)}
    if meta:
        arrays["__meta__"] = np.frombuffer(json.dumps(meta).encode(), dtype=np.uint8)
    tmp = path + ".tmp.npz"
    np.savez(tmp, **arrays)
    os.replace(tmp, path)


def load_pytree(path: str, like: Any) -> Tuple[Any, dict]:
    """Load into the structure of ``like`` (shapes/dtypes validated)."""
    with np.load(path) as data:
        meta = {}
        if "__meta__" in data:
            meta = json.loads(bytes(data["__meta__"]).decode())
        leaves, treedef = jax.tree.flatten(like)
        loaded = [data[f"leaf_{i:05d}"] for i in range(len(leaves))]
        for i, (a, b) in enumerate(zip(loaded, leaves)):
            if hasattr(b, "shape") and tuple(a.shape) != tuple(np.shape(b)):
                raise ValueError(f"leaf {i}: checkpoint shape {a.shape} != expected {np.shape(b)}")
        return jax.tree.unflatten(treedef, loaded), meta


class CheckpointManager:
    """last/best/per-epoch checkpoints + component export + resume."""

    def __init__(self, outdir: str, export_components=None):
        self.outdir = outdir
        os.makedirs(outdir, exist_ok=True)
        self.export_components = export_components  # callable(outdir, trainable)

    def path(self, name: str) -> str:
        return os.path.join(self.outdir, name)

    def save_epoch(self, epoch: int, best_val: float, trainable, opt_state, is_best: bool) -> None:
        meta = {"epoch": epoch, "best_val_loss": float(best_val)}
        save_pytree(self.path("last.ckpt"), {"trainable": trainable, "opt_state": opt_state}, meta)
        save_pytree(self.path(f"state_e_{epoch:04d}.npz"), trainable, meta)
        if is_best:
            save_pytree(self.path("best.npz"), trainable, meta)
            if self.export_components is not None:
                self.export_components(self.outdir, trainable)

    def resume(self, which: str, trainable, opt_state):
        """'latest' restores trainable+optimizer; 'best' restores trainable only.
        Returns (start_epoch, best_val, trainable, opt_state)."""
        if which == "best":
            path = self.path("best.npz")
            if not os.path.isfile(path):
                return 1, float("inf"), trainable, opt_state
            loaded, _ = load_pytree(path, trainable)
            return 1, float("inf"), loaded, opt_state
        path = self.path("last.ckpt")
        if not os.path.isfile(path):
            return 1, float("inf"), trainable, opt_state
        loaded, meta = load_pytree(path, {"trainable": trainable, "opt_state": opt_state})
        return (
            int(meta.get("epoch", 0)) + 1,
            float(meta.get("best_val_loss", float("inf"))),
            loaded["trainable"],
            loaded["opt_state"],
        )


def orbax_save(path: str, tree: Any) -> None:
    """Async-capable orbax path for large multi-host checkpoints
    (StandardCheckpointer saves asynchronously; closing waits for finalization)."""
    import orbax.checkpoint as ocp

    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(os.path.abspath(path), tree, force=True)


def orbax_load(path: str, like: Any) -> Any:
    import orbax.checkpoint as ocp

    with ocp.StandardCheckpointer() as ckptr:
        return ckptr.restore(os.path.abspath(path), target=like)
