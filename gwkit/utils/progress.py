"""Progress reporting with ETA.

Replaces bnslib's hand-rolled progress_tracker/mp_progress_tracker
(bnslib.py:892-1103). The TPU pipeline is single-process (no mp pools), so
this is a plain thread-safe tracker; the printed format (percent, bar, ETA)
matches the reference's spirit.
"""
from __future__ import annotations

import sys
import threading
import time


class ProgressTracker:
    def __init__(self, total: int, name: str = "Progress", steps: int = 25, out=sys.stderr):
        self.total = max(total, 1)
        self.name = name
        self.steps = steps
        self.out = out
        self.count = 0
        self.start = time.time()
        self._lock = threading.Lock()
        self._last_len = 0

    def iterate(self, n: int = 1, print_update: bool = True) -> None:
        with self._lock:
            self.count += n
            if print_update:
                self._print()

    def _print(self) -> None:
        frac = self.count / self.total
        filled = int(frac * self.steps)
        bar = "=" * filled + ">" + "." * (self.steps - filled - 1) if filled < self.steps else "=" * self.steps
        elapsed = time.time() - self.start
        eta = elapsed / max(frac, 1e-9) * (1 - frac)
        msg = f"\r{self.name}: [{bar}] {100*frac:5.1f}% | ETA {eta:6.0f}s"
        self.out.write(msg + " " * max(0, self._last_len - len(msg)))
        self._last_len = len(msg)
        if self.count >= self.total:
            self.out.write(f"\n{self.name}: done in {elapsed:.1f}s\n")
        self.out.flush()


class DictList:
    """Append-oriented dict-of-lists (bnslib.py:1750-1937 surface)."""

    def __init__(self, dic=None):
        self._dic = {k: list(v) for k, v in (dic or {}).items()}

    def append(self, key, value=None) -> None:
        if isinstance(key, dict) and value is None:
            for k, v in key.items():
                self._dic.setdefault(k, []).append(v)
        else:
            self._dic.setdefault(key, []).append(value)

    def extend(self, other) -> None:
        dic = other._dic if isinstance(other, DictList) else other
        for k, v in dic.items():
            self._dic.setdefault(k, []).extend(v)

    def as_dict(self):
        return dict(self._dic)

    def __getitem__(self, key):
        return self._dic[key]

    def keys(self):
        return self._dic.keys()

    def __len__(self):
        return len(self._dic)


class Counter:
    """Thread-safe counter (bnslib MPCounter surface, bnslib.py:1939-1977)."""

    def __init__(self, val: int = 0):
        self._val = val
        self._lock = threading.Lock()

    def increment(self, n: int = 1) -> None:
        with self._lock:
            self._val += n

    @property
    def value(self) -> int:
        with self._lock:
            return self._val
