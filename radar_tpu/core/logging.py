"""Structured logging + profiling hooks.

The reference's observability is ``print`` + tqdm (SURVEY.md §5).
Here: one named logger per subsystem, JSONL metric sinks for artifacts,
and ``jax.profiler`` trace capture as a context manager.
"""

from __future__ import annotations

import contextlib
import json
import logging
import os
import time
from typing import Any

_FORMAT = "%(asctime)s %(name)s %(levelname)s %(message)s"


def get_logger(name: str = "radar_tpu") -> logging.Logger:
    logger = logging.getLogger(name)
    if not logger.handlers:
        handler = logging.StreamHandler()
        handler.setFormatter(logging.Formatter(_FORMAT))
        logger.addHandler(handler)
        logger.setLevel(os.environ.get("RADAR_LOG_LEVEL", "INFO"))
        logger.propagate = False
    return logger


class MetricWriter:
    """Append-only JSONL metrics sink (timestamped artifacts, the
    reference's results-JSON role)."""

    def __init__(self, path: str):
        os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
        self.path = path

    def write(self, step: int, metrics: dict[str, Any]) -> None:
        rec = {"step": int(step), "time": time.time()}
        for k, v in metrics.items():
            try:
                rec[k] = float(v)
            except (TypeError, ValueError):
                rec[k] = v
        with open(self.path, "a") as f:
            f.write(json.dumps(rec) + "\n")


@contextlib.contextmanager
def profile_trace(log_dir: str | None):
    """Capture a jax.profiler trace when ``log_dir`` is set; no-op
    otherwise."""
    if not log_dir:
        yield
        return
    import jax
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@contextlib.contextmanager
def timed(name: str, sink: dict | None = None):
    t0 = time.perf_counter()
    try:
        yield
    finally:
        dt = time.perf_counter() - t0
        if sink is not None:
            sink[name] = dt
        get_logger().debug("%s took %.3fs", name, dt)
