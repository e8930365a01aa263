"""Nightly regression driver: chains the proven end-to-end pipelines and
benchmarks into one resumable run with a machine-readable summary.

Stages (each resumable via its own artifact/arm cache; a stage failure is
recorded and does not stop the rest):

  tests     — `pytest tests/ -q` on the CPU backend
  tpu_tests — `pytest tests/ -q -m tpu` compiled on the real chip
              (GWKIT_TPU_TESTS=1; kernel parity with backend tolerances)
  bench     — bench.py production geometry (+ strict reference geometry)
  headlines — scripts/check_headlines.py (README vs docs/results/HEADLINE.json)
  realfile  — scripts/bench_realfile.py warm-search throughput
  e2e       — scripts/e2e_mlgwsc.py capstone (train -> search -> evaluate)
  ablation  — scripts/ablation_dora.py (per-arm result cache)

Writes NIGHTLY.json {stage: {ok, seconds, tail}} to NIGHTLY_OUT
(default /tmp/nightly). Select stages with NIGHTLY_STAGES (comma list,
default "tests,tpu_tests,bench"); the heavy stages (e2e, ablation: hours on the
single chip) are opt-in. TPU stages run serially — this machine's chip
supports ONE process at a time.
"""
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_stage(name: str, cmd, env=None, timeout=14400):
    t0 = time.time()
    e = dict(os.environ, **(env or {}))
    try:
        proc = subprocess.run(
            cmd, cwd=REPO, env=e, timeout=timeout,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True)
        ok = proc.returncode == 0
        tail = proc.stdout[-2000:]
    except subprocess.TimeoutExpired as exc:
        ok, tail = False, f"TIMEOUT after {timeout}s: {str(exc.stdout or '')[-500:]}"
    return {"ok": ok, "seconds": round(time.time() - t0, 1), "tail": tail}


def main():
    out = os.environ.get("NIGHTLY_OUT", "/tmp/nightly")
    os.makedirs(out, exist_ok=True)
    stages = os.environ.get("NIGHTLY_STAGES", "tests,tpu_tests,bench,headlines").split(",")
    py = sys.executable
    results = {}

    plan = {
        "tests": ([py, "-m", "pytest", "tests/", "-q"], {}),
        # on-TPU kernel-parity lane (VERDICT r4 #3): the same hot kernels the
        # CPU suite covers in interpret mode, compiled on the real chip
        "tpu_tests": ([py, "-m", "pytest", "tests/", "-q", "-m", "tpu"],
                      {"GWKIT_TPU_TESTS": "1"}),
        "bench": ([py, "bench.py"], {}),
        "bench_strict": ([py, "bench.py"],
                         {"BENCH_TARGET_FRAMES": "3000", "BENCH_TIME_DECIMATION": "1"}),
        "headlines": ([py, "scripts/check_headlines.py"], {}),
        "realfile": ([py, "scripts/bench_realfile.py"], {}),
        "e2e": ([py, "scripts/e2e_mlgwsc.py"], {"E2E_OUT": os.path.join(out, "e2e")}),
        "ablation": ([py, "scripts/ablation_dora.py"],
                     {"ABL_OUT": os.path.join(out, "ablation")}),
    }
    for name in stages:
        name = name.strip()
        if name not in plan:
            results[name] = {"ok": False, "seconds": 0, "tail": "unknown stage"}
            continue
        cmd, env = plan[name]
        print(f"[nightly] {name}: {' '.join(cmd)}", flush=True)
        results[name] = run_stage(name, cmd, env)
        print(f"[nightly] {name}: {'OK' if results[name]['ok'] else 'FAIL'} "
              f"({results[name]['seconds']}s)", flush=True)

    path = os.path.join(out, "NIGHTLY.json")
    with open(path, "w") as f:
        json.dump(results, f, indent=1)
    print(f"[nightly] wrote {path}")
    sys.exit(0 if all(r["ok"] for r in results.values()) else 1)


if __name__ == "__main__":
    main()
