"""Cooperative TPU-relay yield protocol (bench contention guard).

Round-3 verdict item 1: the driver bench must never time out behind a
background chain.  These tests lock the flag semantics bench.py and
scripts/tpu_retry.sh rely on.
"""

import os
import threading
import time

from radar_tpu.utils import contention


def test_bench_active_fresh_and_stale(tmp_path):
    flag = str(tmp_path / "flag")
    assert not contention.bench_active(flag)
    with open(flag, "w") as f:
        f.write("1")
    assert contention.bench_active(flag)
    # stale flag (crashed bench) must not park workers forever
    old = time.time() - contention.FRESH_S - 1
    os.utime(flag, (old, old))
    assert not contention.bench_active(flag)


def test_maybe_yield_parks_until_flag_clears(tmp_path):
    flag = str(tmp_path / "flag")
    with open(flag, "w") as f:
        f.write("1")

    def clear():
        time.sleep(0.5)
        os.remove(flag)

    t = threading.Thread(target=clear)
    t.start()
    waited = contention.maybe_yield(flag, poll_s=0.1)
    t.join()
    assert waited >= 0.1  # actually parked
    assert not os.path.exists(flag)


def test_maybe_yield_noop_without_flag(tmp_path):
    assert contention.maybe_yield(str(tmp_path / "absent")) == 0.0


def test_no_yield_env_opt_out(tmp_path, monkeypatch):
    flag = str(tmp_path / "flag")
    with open(flag, "w") as f:
        f.write("1")
    monkeypatch.setenv("RADAR_NO_YIELD", "1")
    assert contention.maybe_yield(flag, poll_s=0.1) == 0.0
