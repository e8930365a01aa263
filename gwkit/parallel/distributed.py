"""Multi-host initialization and cross-host result gathering.

The reference is single-process (SURVEY.md §2.9); gwkit's multi-host model:

* training — `initialize()` then build one global mesh over all hosts'
  devices; pjit/GSPMD handles cross-host collectives over ICI/DCN.
* search — segments are sharded across hosts (embarrassingly parallel,
  SURVEY.md §5 "long-context" note); each host runs gwkit.search over its
  share and `gather_trigger_lists` merges per-segment triggers host-side.
"""
from __future__ import annotations

import logging
from typing import Dict, List, Optional, Sequence


def initialize(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """jax.distributed.initialize with env-var passthrough; no-op when
    single-process (the common case on one host)."""
    import jax

    if num_processes in (None, 1) and coordinator_address is None:
        logging.info("single-process run: skipping jax.distributed.initialize")
        return
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )
    logging.info("distributed: process %d/%d, %d local / %d global devices",
                 jax.process_index(), jax.process_count(),
                 jax.local_device_count(), jax.device_count())


def host_key_filter(process_id: int, num_processes: int):
    """(index, key) -> bool round-robin predicate for metadata-level segment
    sharding: passed to read_segments/stream_segments so each host only OPENS
    its share (longest-first order keeps per-host work balanced). Sharding at
    the key level — not over the yielded stream — is what preserves streaming
    under jax.distributed."""
    return lambda i, key: i % num_processes == process_id


def shard_segments_across_hosts(segments: Sequence, process_id: int, num_processes: int) -> List:
    """Deterministic round-robin split of an ALREADY-MATERIALIZED segment
    list (prefer host_key_filter for file-backed searches — it shards before
    any read)."""
    keep = host_key_filter(process_id, num_processes)
    return [seg for i, seg in enumerate(segments) if keep(i, getattr(seg, "key", None))]


def write_trigger_shard(local_triggers: Dict[str, list], shard_dir: str, process_id: int) -> str:
    """Serialize one host's per-segment trigger lists as (time, stat) rows."""
    import os

    import numpy as np

    os.makedirs(shard_dir, exist_ok=True)
    path = os.path.join(shard_dir, f"triggers_{process_id}.npz")
    np.savez(
        path,
        **{key: np.asarray(v, dtype=np.float64).reshape(-1, 2) for key, v in local_triggers.items()},
    )
    return path


def merge_trigger_shards(shard_dir: str, num_processes: int) -> Dict[str, list]:
    """Read every host's trigger shard back and merge into one segment->list
    dict, sorted by segment key. Segment keys are disjoint across hosts
    (shard_segments_across_hosts partitions them), so the merge is a union."""
    import os

    import numpy as np

    merged: Dict[str, list] = {}
    for p in range(num_processes):
        with np.load(os.path.join(shard_dir, f"triggers_{p}.npz")) as data:
            for key in data.files:
                merged[key] = data[key].tolist()
    return dict(sorted(merged.items()))


def gather_trigger_lists(
    local_triggers: Dict[str, list], shard_dir: Optional[str] = None
) -> Dict[str, list]:
    """Merge per-segment trigger dicts across hosts.

    Trigger lists are tiny host-side python objects, so the gather goes
    through the shared filesystem rather than device collectives: each host
    writes ``shard_dir/triggers_{pid}.npz``, a barrier syncs, and every host
    reads all shards back. Single-process: identity.
    """
    import jax

    if jax.process_count() == 1:
        return local_triggers
    from jax.experimental import multihost_utils

    assert shard_dir is not None, "multi-host gather needs a shared shard_dir"
    write_trigger_shard(local_triggers, shard_dir, jax.process_index())
    multihost_utils.sync_global_devices("gwkit_trigger_gather")
    return merge_trigger_shards(shard_dir, jax.process_count())
