"""30-day MLGWSC-1 month deliverable as a durable segment-interleaved pipeline.

The monolithic month run (scripts/bench_monthscale.py month mode) needs
~6-7 h of relay-bound device time on a tunneled single chip: generation
moves ~32 KB and the two searches another ~32 KB per strain-second over a
link that sustains ~7 MB/s, and none of its 85 GB of intermediate strain
survives the ephemeral build VM. This pipeline makes the same deliverable
(reference: MLGWSC-1/inference.py:492-589 month search, evaluate.py:104-278
challenge evaluation) durable and composable:

per segment i:  generate fg/bg/inj (deterministic seed 11_000_000+i)
             -> search fg and bg at the production threshold
             -> persist ONLY the small state (raw triggers f64 time/f32
                stat, injection table, walls) into MP_STATE (repo-committable)
             -> delete the strain

Segments are block-aligned (multiples of 256 s = one 2^19-sample device
chunk) so every segment reuses ONE fused-search executable and ONE noise
graph — no per-tail-geometry recompiles (204 segments would otherwise pay
~204 relay-round-trip compiles). Alignment only trims the O3a span tails;
the span list is part of the dataset definition, and the evaluation uses
the actual analyzed duration.

Any session can resume: completed segments are skipped by their state
files, and the final assembly (cluster -> challenge evaluation) runs over
whatever prefix is complete. Assembly = write_search_output over the
per-segment trigger dict (segment keys are disjoint, so clustering is
identical to a monolithic run) + get_stats at the actual analyzed duration.

Env: MP_DAYS (30), MP_STATE (<repo>/artifacts/month_r5), MP_TMP
(/tmp/month_pipeline), MP_CKPT_DIR (/tmp/e2e_imrd; auto-populated from
artifacts/capstone_r5 if absent), MP_TARGET (512), MP_BATCH (128),
MP_THRESHOLD (-0.5), MP_SEED (11), MP_MAX_SEGMENTS (0 = all),
MP_EVAL (1 = assemble+evaluate completed segments at the end).
"""
import glob
import importlib.util
import json
import os
import resource
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
BLOCK_S = 256.0  # one 2^19-sample device chunk at 2048 Hz


def _bench_monthscale():
    spec = importlib.util.spec_from_file_location(
        "bench_monthscale", os.path.join(REPO, "scripts", "bench_monthscale.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def aligned_spans(days: float):
    """O3a spans block-aligned to 256 s multiples, accumulated to >= days."""
    from gwkit.data.segments import default_o3a_segments

    target = days * 86400.0
    out, total = [], 0.0
    # overfetch the span source: block alignment trims up to 256 s per
    # segment, so the default exactly-`days` table falls ~0.2 d short
    for start, end in default_o3a_segments(total=target + 86400.0):
        dur = int((end - start) // BLOCK_S) * BLOCK_S
        if dur < 2 * BLOCK_S:
            continue
        if total >= target:
            break
        need = target - total
        take = min(dur, np.ceil(need / BLOCK_S) * BLOCK_S)
        out.append((float(start), float(start + take)))
        total += take
    if total < target:
        raise RuntimeError(f"O3a segment list holds only {total/86400.0:.1f} "
                           f"of the requested {days} days")
    return out


def seg_seed(base: int, si: int) -> int:
    return 11_000_000 + 10_000 * base + si


def _search_one(task, path, threshold, batch):
    from gwkit.search.engine import get_triggers

    t0 = time.time()
    triggers, _vals, result = get_triggers(
        task, path, trigger_threshold=threshold, batch_size=batch)
    wall = time.time() - t0
    (trig_list,) = triggers.values()  # per-segment file holds one dataset
    arr = np.asarray(trig_list, np.float64).reshape(-1, 2)
    return {
        "time": arr[:, 0].astype(np.float64),
        "stat": arr[:, 1].astype(np.float32),
    }, {
        "wall_s": round(wall, 2),
        "windows": result.n_windows,
        "strain_seconds": result.strain_seconds,
        "raw_triggers": int(arr.shape[0]),
    }


def assemble_and_evaluate(state: str, spans, threshold: float, days: float):
    """Cluster + challenge-protocol evaluation over every completed segment."""
    import h5py

    from gwkit.evaluation.mlgwsc import get_stats, read_events
    from gwkit.search.engine import write_search_output

    done = sorted(
        int(os.path.basename(p).split("_")[0])
        for p in glob.glob(os.path.join(state, "seg", "*_meta.json")))
    if not done:
        print("no completed segments; nothing to evaluate", flush=True)
        return None
    trig = {"fg": {}, "bg": {}}
    inj = {}
    walls = {"fg": 0.0, "bg": 0.0}
    strain = 0.0
    for si in done:
        base = os.path.join(state, "seg", f"{si:03d}")
        for name in ("fg", "bg"):
            with np.load(f"{base}_{name}.npz") as z:
                trig[name][str(si)] = np.stack(
                    [z["time"], z["stat"].astype(np.float64)], axis=1).tolist()
        with np.load(f"{base}_inj.npz") as z:
            for k in z.files:
                inj.setdefault(k, []).append(z[k])
        with open(f"{base}_meta.json") as f:
            meta = json.load(f)
        walls["fg"] += meta["fg"]["wall_s"]
        walls["bg"] += meta["bg"]["wall_s"]
        strain += meta["fg"]["strain_seconds"]
    injparams = {k: np.concatenate(v) for k, v in inj.items()}
    events = {}
    for name in ("fg", "bg"):
        events[name] = os.path.join(state, f"{name}_events.hdf")
        write_search_output(events[name], trig[name], np.zeros(0, np.float32))

    # find_injection_times semantics (evaluate.py:13-63) from the span list:
    # full duration of completed segments; injections inside the 30 s pads
    # excluded from the sensitivity sample
    duration, mask = 0.0, np.zeros(len(injparams["tc"]), bool)
    for si in done:
        start, end = spans[si]
        duration += end - start
        mask |= ((start + 30.0 <= injparams["tc"])
                 & (injparams["tc"] <= end - 30.0))
    stats = get_stats(
        read_events([events["fg"]]), read_events([events["bg"]]),
        {k: v[mask] for k, v in injparams.items()},
        duration=duration, chirp_distance=False)
    far_month = stats["far"] * 30 * 86400
    sd = stats["sensitive-distance"]
    table = {}
    for far_target in (10000.0, 1000.0, 100.0, 10.0, 1.0):
        idx = np.searchsorted(-far_month, -far_target)
        if idx < len(sd):
            table[f"far<={far_target:g}/month"] = round(float(sd[idx]), 1)
    with h5py.File(os.path.join(state, "stats.hdf"), "w") as f:
        for key, val in stats.items():
            f.create_dataset(key, data=np.asarray(val))
    summary = {
        "mode": "month-pipeline",
        "segments_done": len(done),
        "segments_total": len(spans),
        "analyzed_days": round(duration / 86400.0, 3),
        "target_days": days,
        "threshold": threshold,
        "n_injections_analyzed": int(mask.sum()),
        "search_wall_s": {k: round(v, 1) for k, v in walls.items()},
        "sustained_search_x_realtime": round(
            2 * strain / max(walls["fg"] + walls["bg"], 1e-9), 1),
        "best_sensitive_fraction": round(float(stats["sensitive-fraction"].max()), 4),
        "sensitive_distance_mpc": table,
        "peak_host_rss_gb": round(
            resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1e6, 2),
    }
    with open(os.path.join(state, "summary.json"), "w") as f:
        json.dump(summary, f, indent=2)
    print(json.dumps(summary, indent=2), flush=True)
    return summary


def main():
    bms = _bench_monthscale()
    days = float(os.environ.get("MP_DAYS", "30"))
    state = os.environ.get("MP_STATE", os.path.join(REPO, "artifacts", "month_r5"))
    tmp = os.environ.get("MP_TMP", "/tmp/month_pipeline")
    ckpt = os.environ.get("MP_CKPT_DIR", "/tmp/e2e_imrd")
    target = int(os.environ.get("MP_TARGET", "512"))
    batch = int(os.environ.get("MP_BATCH", "128"))
    threshold = float(os.environ.get("MP_THRESHOLD", "-0.5"))
    seed = int(os.environ.get("MP_SEED", "11"))
    max_segs = int(os.environ.get("MP_MAX_SEGMENTS", "0"))
    os.makedirs(os.path.join(state, "seg"), exist_ok=True)
    os.makedirs(tmp, exist_ok=True)

    if os.environ.get("MP_ASSEMBLE_ONLY", "0") == "1":
        # CPU-side snapshot over whatever is complete; safe to run while the
        # device child is still working through segments
        from gwkit.utils.platform import force_cpu

        force_cpu()
        with open(os.path.join(state, "spans.json")) as f:
            spans = [tuple(s) for s in json.load(f)["spans"]]
        assemble_and_evaluate(state, spans, threshold, days)
        return

    if not os.path.isdir(ckpt):  # fresh VM: serve the committed capstone
        import shutil

        src = os.path.join(REPO, "artifacts", "capstone_r5")
        if os.path.isdir(src):
            shutil.copytree(src, ckpt)
            print(f"populated {ckpt} from {src}", flush=True)

    spans = aligned_spans(days)
    spans_path = os.path.join(state, "spans.json")
    if os.path.isfile(spans_path):
        with open(spans_path) as f:
            prev = [tuple(s) for s in json.load(f)["spans"]]
        if prev != spans:
            raise RuntimeError("span list changed across sessions; state dir "
                               "is inconsistent with MP_DAYS/segment source")
    else:
        with open(spans_path, "w") as f:
            json.dump({"days": days, "seed": seed, "threshold": threshold,
                       "block_s": BLOCK_S, "spans": spans}, f)

    import jax

    print(f"devices: {jax.devices()}; {len(spans)} aligned segments "
          f"({sum(e-s for s, e in spans)/86400.0:.2f} d)", flush=True)
    bms.probe_device(float(os.environ.get("MS_PROBE_TIMEOUT_S", "90")))

    from gwkit.data.generate import generate_challenge_data

    task, model_src = bms._load_model(ckpt, target)
    print(f"model: {model_src}", flush=True)

    done_this_call = 0
    for si, (start, end) in enumerate(spans):
        base = os.path.join(state, "seg", f"{si:03d}")
        if os.path.isfile(f"{base}_meta.json"):
            continue
        if max_segs and done_this_call >= max_segs:
            break
        fg = os.path.join(tmp, f"fg_{si:03d}.hdf")
        bg = os.path.join(tmp, f"bg_{si:03d}.hdf")
        inj = os.path.join(tmp, f"inj_{si:03d}.hdf")
        t0 = time.time()
        generate_challenge_data(
            fg, bg, inj, seed=seg_seed(seed, si), dataset=1,
            segments=[(start, end)], wave_duration=24.0, resume=True)
        gen_wall = time.time() - t0
        meta = {"segment": si, "start": start, "end": end,
                "gen_wall_s": round(gen_wall, 2)}
        for name, path in (("fg", fg), ("bg", bg)):
            trig, m = _search_one(task, path, threshold, batch)
            np.savez_compressed(f"{base}_{name}.npz", **trig)
            meta[name] = m
        import h5py

        with h5py.File(inj) as f:
            np.savez_compressed(
                f"{base}_inj.npz", **{k: f[k][()] for k in f.keys()})
        with open(f"{base}_meta.json", "w") as f:
            json.dump(meta, f, indent=2)
        for p in (fg, bg, inj):
            os.remove(p)
        done_this_call += 1
        dur = end - start
        print(json.dumps({
            "segment": si, "dur_s": dur, "gen_x": round(dur / meta["gen_wall_s"], 1),
            "fg_x": round(dur / meta["fg"]["wall_s"], 1),
            "bg_x": round(dur / meta["bg"]["wall_s"], 1),
            "raw_triggers": meta["fg"]["raw_triggers"] + meta["bg"]["raw_triggers"],
        }), flush=True)

    if os.environ.get("MP_EVAL", "1") == "1":
        assemble_and_evaluate(state, spans, threshold, days)


if __name__ == "__main__":
    main()
