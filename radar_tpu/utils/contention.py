"""Cooperative TPU-relay yield protocol (round-4, verdict item 1).

The driver's bench (``bench.py``) must never time out behind a
background rebuild chain holding the single TPU relay (round-3
``BENCH_r03.json`` was ``rc=124``).  SIGSTOPping a relay client mid-RPC
wedges the relay for *every* process — measured this round: with a
stopped client holding a half-open request even ``import jax`` hangs in
a fresh process — so preemption has to be cooperative:

* ``bench.py`` touches ``/tmp/radar_bench_running`` before measuring
  and keeps its mtime fresh between ladder rungs;
* long-running workers (trainer epochs/steps, eval batch loops,
  retrieval training) call :func:`maybe_yield` between device
  dispatches and park client-side — no RPC in flight — until the flag
  goes stale (>10 min, so a crashed bench never deadlocks a chain) or
  is removed;
* ``scripts/tpu_retry.sh`` applies the same freshness rule so its
  no-output watchdog doesn't kill a politely parked worker.

Set ``RADAR_NO_YIELD=1`` to opt a process out (used by bench.py's own
subprocess rungs, and available for interactive debugging).
"""

from __future__ import annotations

import os
import sys
import time

BENCH_FLAG = "/tmp/radar_bench_running"
FRESH_S = 600.0


def bench_active(flag: str = BENCH_FLAG, fresh_s: float = FRESH_S) -> bool:
    """True if a bench flag exists and is fresh (mtime < ``fresh_s``)."""
    try:
        st = os.stat(flag)
    except OSError:
        return False
    return (time.time() - st.st_mtime) < fresh_s


class bench_window:
    """Context manager for benchmark CLIs: holds the bench flag fresh
    (a background thread re-touches it every 60 s) so cooperative
    workers stay parked for the whole measurement, however long it
    runs.  Used by bench_serving / bench_async_serving; bench.py
    manages the flag itself (it refreshes per ladder rung)."""

    def __init__(self, flag: str = BENCH_FLAG):
        self.flag = flag
        self._stop = None

    def __enter__(self):
        import threading
        stop = threading.Event()
        self._stop = stop

        def keep_fresh():
            while not stop.wait(60.0):
                try:
                    os.utime(self.flag)
                except OSError:
                    break

        with open(self.flag, "w") as f:
            f.write(str(os.getpid()))
        t = threading.Thread(target=keep_fresh, daemon=True,
                             name="bench-flag")
        t.start()
        return self

    def __exit__(self, *exc):
        self._stop.set()
        try:
            os.remove(self.flag)
        except OSError:
            pass
        return False


def maybe_yield(flag: str = BENCH_FLAG, fresh_s: float = FRESH_S,
                poll_s: float = 5.0) -> float:
    """Park (sleep) while a bench flag is fresh; return seconds waited.

    Call between device dispatches only — never with an RPC in flight
    (the point is that a parked worker holds no relay state).  Cheap
    when idle: one ``stat()``.
    """
    if os.environ.get("RADAR_NO_YIELD"):
        return 0.0
    waited = 0.0
    while bench_active(flag, fresh_s):
        if waited == 0.0:
            print(f"[contention] yielding TPU to bench ({flag})",
                  file=sys.stderr, flush=True)
        time.sleep(poll_s)
        waited += poll_s
    if waited:
        print(f"[contention] bench done, resuming after {waited:.0f}s",
              file=sys.stderr, flush=True)
    return waited
