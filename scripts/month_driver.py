"""Supervisor for the month-scale bench on a tunneled TPU.

The axon relay occasionally wedges a fresh client on its first compute RPC
(silent infinite block — no error, no traffic), and a multi-hour job must
also survive mid-run stalls. Every stage of scripts/bench_monthscale.py is
resumable (per-segment generation, per-file search sidecars), so the right
recovery is always "kill and relaunch":

- exit 0            -> done
- exit 3            -> the child's own startup probe timed out; relaunch
- I/O-counter stall -> no rchar/wchar movement (device traffic rides
                       sockets, so healthy compute always moves them) for
                       MD_STALL_S seconds; kill -9 and relaunch
- any other exit    -> relaunch (counts against MD_MAX_RETRIES)

Env: MD_MAX_RETRIES (20), MD_STALL_S (420), MD_COOLDOWN_S (45 — the relay
needs a beat between client sessions or the next one wedges too),
MD_LOG (/tmp/month_run.log), MD_TARGET (script to supervise, default
scripts/bench_monthscale.py — use scripts/month_pipeline.py for the
durable segment-interleaved month). All MS_*/MP_* vars pass through.
"""
import os
import signal
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _io_bytes(pid: int):
    try:
        with open(f"/proc/{pid}/io") as f:
            d = dict(line.split(": ") for line in f.read().splitlines())
        return int(d["rchar"]) + int(d["wchar"])
    except (OSError, KeyError, ValueError):
        return None


def main() -> int:
    max_retries = int(os.environ.get("MD_MAX_RETRIES", "20"))
    stall_s = float(os.environ.get("MD_STALL_S", "420"))
    cooldown = float(os.environ.get("MD_COOLDOWN_S", "45"))
    log_path = os.environ.get("MD_LOG", "/tmp/month_run.log")
    target = os.environ.get(
        "MD_TARGET", os.path.join(REPO, "scripts", "bench_monthscale.py"))
    if not os.path.isabs(target):
        target = os.path.join(REPO, target)

    # pidfiles let bench.py preempt us with targeted kills before it claims
    # the chip (two concurrent relay clients deadlock; state is resumable)
    with open("/tmp/month_driver.pid", "w") as f:
        f.write(str(os.getpid()))
    for attempt in range(1, max_retries + 1):
        with open(log_path, "a") as log:
            log.write(f"\n===== month_driver attempt {attempt} =====\n")
            log.flush()
            child = subprocess.Popen([sys.executable, target], stdout=log,
                                     stderr=subprocess.STDOUT, cwd=REPO)
            with open("/tmp/month_pipeline.pid", "w") as f:
                f.write(str(child.pid))
            last_io, last_move = _io_bytes(child.pid), time.time()
            while True:
                try:
                    rc = child.wait(timeout=15)
                    break
                except subprocess.TimeoutExpired:
                    pass
                io = _io_bytes(child.pid)
                if io is not None and io != last_io:
                    last_io, last_move = io, time.time()
                elif time.time() - last_move > stall_s:
                    log.write(f"[driver] no I/O movement for {stall_s:.0f}s; "
                              "killing wedged child\n")
                    log.flush()
                    child.send_signal(signal.SIGKILL)
                    rc = child.wait()
                    rc = -9
                    break
        if rc == 0:
            print(f"month run complete (attempt {attempt})", flush=True)
            return 0
        print(f"attempt {attempt} ended rc={rc}; relaunching after "
              f"{cooldown:.0f}s cooldown", flush=True)
        time.sleep(cooldown)
    print(f"giving up after {max_retries} attempts", flush=True)
    return 1


if __name__ == "__main__":
    sys.exit(main())
