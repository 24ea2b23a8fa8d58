"""Benchmark: expert-model inference throughput (CXR images/sec/chip).

Runs the serving-preset expert (ViT-B/32-width vision tower + 4-layer
clinical-text tower, bf16, batch 512 — ``radar_tpu.core.config.
serving_config``) and prints ONE JSON line on stdout.  ``vs_baseline``
is against the driver-set north star of 5,000 images/sec/chip
(BASELINE.json:5; the reference publishes no measured throughput —
SURVEY.md §6).

Un-missable by construction (round-3 verdict item 1 — BENCH_r03 timed
out at rc=124 behind a background rebuild chain holding the single TPU
relay):

* **Cooperative contention guard** — the bench touches
  ``/tmp/radar_bench_running``; long-running radar_tpu workers call
  ``radar_tpu.utils.contention.maybe_yield()`` between device
  dispatches and park until the flag clears, and ``tpu_retry.sh``
  neither stall-kills nor relaunches workers while it is fresh.
  (SIGSTOP was measured to be worse than useless: a stopped client
  holding a half-open relay RPC wedges the relay for every process —
  even ``import jax`` hangs — so preemption must be cooperative.)
  If competitors are detected (pidfile dir / proc scan) the bench
  waits a short grace period for them to park.
* **Warm compile cache** — the measurement process enables the
  persistent JAX compilation cache (``.cache/jax``), so warm runs skip
  the 20-40 s B=512 compile.
* **Bounded fallback ladder** — the measurement runs in a subprocess
  with a per-rung timeout: B=512 → B=256 (documented smaller operating
  point) → CPU tiny smoke.  The worst case is a smaller number, never
  a timeout.

Measurement notes (see .claude/skills/verify/SKILL.md): the axon TPU
tunnel replay-caches identical computations and ``block_until_ready``
does not reliably fence small programs, so the bench (a) pre-stages
ITERS distinct device-resident inputs, (b) dispatches the pipelined
sequence, and (c) forces completion by reading the last output's value
to host.  Set RADAR_BENCH_CONFIG=quality for the ViT-B/16 training
config instead.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

BASELINE_IMG_PER_SEC = 5000.0
BENCH_FLAG = "/tmp/radar_bench_running"
WORKER_PIDDIR = "/tmp/radar_tpu_workers"
REPO = os.path.dirname(os.path.abspath(__file__))


# ---------------------------------------------------------------------------
# Inner measurement (runs in a subprocess so the parent can bound its time)
# ---------------------------------------------------------------------------

def _measure() -> None:
    import jax

    if os.environ.get("RADAR_BENCH_FORCE_CPU"):
        # env var JAX_PLATFORMS is overridden by the axon plugin; the
        # config update after import is the reliable path (CLAUDE.md).
        jax.config.update("jax_platforms", "cpu")
    # Persistent compile cache: warm runs of the B=512 program skip the
    # 20-40 s compile that made round-3's bench rc=124-able.
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(REPO, ".cache", "jax"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

    import jax.numpy as jnp
    import numpy as np

    from radar_tpu.core.config import (RadarConfig, serving_config,
                                       tiny_config)
    from radar_tpu.models.experts import create_model

    import dataclasses

    on_tpu = jax.default_backend() == "tpu"
    preset = os.environ.get("RADAR_BENCH_CONFIG", "serving")
    if not on_tpu:  # CPU smoke fallback so bench.py always runs
        cfg, batch = tiny_config(), 16
    elif preset.startswith("quality"):
        cfg, batch = RadarConfig(), 256
    else:
        cfg, batch = serving_config(), 512
    # operating-point probe (batch is a serving choice, not a model
    # property): RADAR_BENCH_BATCH=1024 python bench.py
    batch = int(os.environ.get("RADAR_BENCH_BATCH", batch))
    # e.g. RADAR_BENCH_CONFIG=serving_int8 / quality_aqt
    qmode = next((q for q in ("int8", "aqt") if preset.endswith(q)), None)
    if qmode:
        cfg = dataclasses.replace(
            cfg,
            vision=dataclasses.replace(cfg.vision, quant=qmode),
            text=dataclasses.replace(cfg.text, quant=qmode))

    seq = min(128, cfg.text.max_length)
    dtype = jnp.bfloat16 if on_tpu else jnp.float32
    model = create_model("baseline", cfg.vision, cfg.text, cfg.expert,
                         dtype=dtype)

    rng = np.random.default_rng(0)
    pixel_values = jnp.asarray(
        rng.normal(0.5, 0.3, (batch, cfg.vision.image_size,
                              cfg.vision.image_size, 3)), jnp.float32)
    input_ids = jnp.asarray(
        rng.integers(0, cfg.text.vocab_size, (batch, seq)), jnp.int32)
    attention_mask = jnp.ones((batch, seq), jnp.int32)

    params = jax.jit(lambda k: model.init(
        k, pixel_values, input_ids, attention_mask))(
        jax.random.key(0))["params"]

    @jax.jit
    def forward(params, pv, ids, mask):
        logits = model.apply({"params": params}, pv, ids, mask,
                             deterministic=True)
        return jnp.sum(logits)  # scalar read fences completion

    # warmup / compile
    float(forward(params, pixel_values, input_ids, attention_mask))

    iters = 20 if on_tpu else 3
    mk = jax.jit(lambda base, i: base + 1e-2 * i)
    pvs = [mk(pixel_values, jnp.float32(i)) for i in range(iters)]
    jax.block_until_ready(pvs)
    t0 = time.perf_counter()
    outs = [forward(params, pvs[i], input_ids, attention_mask)
            for i in range(iters)]
    float(outs[-1])  # host read of the last value forces the queue
    dt = time.perf_counter() - t0

    img_per_sec = batch * iters / dt
    print(json.dumps({
        "metric": "expert_inference_images_per_sec_per_chip",
        "value": round(float(img_per_sec), 2),
        "unit": "images/sec/chip",
        "vs_baseline": round(float(img_per_sec / BASELINE_IMG_PER_SEC), 4),
        "batch": batch,
        "backend": jax.default_backend(),
    }))


# ---------------------------------------------------------------------------
# Contention guard
# ---------------------------------------------------------------------------

def _ancestors_of_self() -> set:
    pids, pid = set(), os.getpid()
    while pid > 1:
        pids.add(pid)
        try:
            with open(f"/proc/{pid}/stat") as f:
                # field 4 (after the parenthesised comm) is ppid
                pid = int(f.read().rsplit(")", 1)[1].split()[1])
        except (OSError, ValueError, IndexError):
            break
    return pids

def _competitor_pids() -> list:
    """TPU-holding worker pids: pidfiles + a conservative /proc scan.

    Scan matches python processes running ``radar_tpu`` CLIs/scripts —
    never this bench or its ancestors.  Detection only (used to decide
    whether to grant a parking grace period) — competitors are never
    signalled.
    """
    skip = _ancestors_of_self()
    pids = set()
    if os.path.isdir(WORKER_PIDDIR):
        for name in os.listdir(WORKER_PIDDIR):
            if name.isdigit():
                pids.add(int(name))
    try:
        entries = os.listdir("/proc")
    except OSError:
        entries = []
    for entry in entries:
        if not entry.isdigit():
            continue
        pid = int(entry)
        try:
            with open(f"/proc/{pid}/cmdline", "rb") as f:
                cmd = f.read().decode("utf-8", "replace").split("\0")
        except OSError:
            continue
        if not cmd or "python" not in os.path.basename(cmd[0]):
            continue
        if any("radar_tpu" in a for a in cmd[1:]):
            pids.add(pid)
    return sorted(p for p in pids if p not in skip)

def _touch_flag() -> None:
    with open(BENCH_FLAG, "w") as f:
        f.write(str(os.getpid()))


# ---------------------------------------------------------------------------
# Orchestrator: bounded-time ladder, never rc=124
# ---------------------------------------------------------------------------

def _try_rung(env_extra: dict, timeout: float) -> "str | None":
    env = dict(os.environ, RADAR_BENCH_INNER="1", RADAR_NO_YIELD="1",
               **env_extra)
    try:
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__)],
            env=env, capture_output=True, text=True, timeout=timeout)
    except subprocess.TimeoutExpired:
        print(f"bench: rung timed out after {timeout:.0f}s "
              f"({env_extra})", file=sys.stderr)
        return None
    if proc.stderr:
        sys.stderr.write(proc.stderr)
    for line in reversed(proc.stdout.splitlines()):
        line = line.strip()
        if line.startswith("{"):
            try:
                json.loads(line)
                return line
            except json.JSONDecodeError:
                continue
    print(f"bench: rung exited rc={proc.returncode} without JSON "
          f"({env_extra})", file=sys.stderr)
    return None

def main() -> None:
    if os.environ.get("RADAR_BENCH_INNER"):
        _measure()
        return

    _touch_flag()
    competitors = _competitor_pids()
    if competitors:
        # cooperative grace: workers park between dispatches once they
        # see the fresh flag (per-step checks in trainer/eval loops).
        print(f"bench: competitors {competitors} detected; "
              "granting 20s to park", file=sys.stderr)
        time.sleep(20)
    try:
        if os.environ.get("RADAR_BENCH_BATCH"):
            ladder = [({}, float(os.environ.get("RADAR_BENCH_TIMEOUT",
                                                360)))]
        else:
            ladder = [({"RADAR_BENCH_BATCH": "512"}, 330.0),
                      ({"RADAR_BENCH_BATCH": "256"}, 90.0)]
        for env_extra, timeout in ladder:
            _touch_flag()  # keep the flag fresh for parked workers
            line = _try_rung(env_extra, timeout)
            if line is not None:
                print(line)
                return
        # Absolute floor: CPU tiny smoke — always emits a (small) number.
        _touch_flag()
        line = _try_rung({"RADAR_BENCH_FORCE_CPU": "1"}, 60.0)
        if line is not None:
            print(line)
            return
        # Even the CPU rung failed (broken env): still emit parseable
        # JSON rather than nothing.
        print(json.dumps({
            "metric": "expert_inference_images_per_sec_per_chip",
            "value": 0.0, "unit": "images/sec/chip", "vs_baseline": 0.0,
            "error": "all bench rungs failed"}))
    finally:
        try:
            os.remove(BENCH_FLAG)
        except OSError:
            pass


if __name__ == "__main__":
    main()
