"""Async-serving latency/throughput bench: drive ``RadarServer`` with
Poisson arrivals at one or more offered loads and record the latency
distribution each load achieves — the production question ("what p95
do I get at N requests/sec?") that the fixed-batch bench
(``bench_serving``) cannot answer, because it measures saturated
back-to-back batches with no queueing.

One open-loop generator thread sleeps exponential gaps and submits;
the server's single batcher thread does all device work, so the
measured latency includes real queue-wait + dynamic-batch coalescing.

Usage:
    python -m radar_tpu.cli.bench_async_serving --serve_batch 16 \
        --offered_load 4,16,64 --requests_per_load 96 \
        --output results/serving_async.json
"""

from __future__ import annotations

import argparse
import json
import os
import time

import numpy as np

from ..core.logging import get_logger
from ..serving.server import QueueFull, RadarServer, ServerConfig
from .common import (add_common_args, add_data_args, build_datasets,
                     load_config, make_tokenizer)
from .evaluate_pipeline import build_pipeline_from_args
from .evaluate_retrieval_system import _normalized_image
from ..utils.io import atomic_write_json

logger = get_logger("radar_tpu.bench_async_serving")


def build_parser():
    parser = argparse.ArgumentParser(
        description="Poisson-arrival latency bench for RadarServer")
    parser.add_argument("--model_type", type=str, default="baseline")
    parser.add_argument("--expert_checkpoint", type=str, default=None)
    parser.add_argument("--targeting_stacker", type=str, default=None,
                        help="fit_targeting_stacker.py JSON: val-fitted"
                             " logistic keep-rule replacing the hand "
                             "cross-modal veto on expert positives")
    parser.add_argument("--ensemble_expert", action="append",
                        default=[], metavar="TYPE:CKPT_DIR")
    parser.add_argument("--retrieval_checkpoint", type=str,
                        default="./checkpoints/retrieval_system")
    parser.add_argument("--passages", type=int, default=1024)
    parser.add_argument("--serve_batch", type=int, default=64,
                        help="server max_batch_size (largest bucket); "
                             "64 matches the fused-dispatch sweet spot "
                             "measured by bench_serving (65.3 rps "
                             "sync at b64)")
    parser.add_argument("--max_wait_ms", type=float, default=30.0)
    parser.add_argument("--offered_load", type=str, default="8,32,48,64",
                        help="comma-separated requests/sec sweep")
    parser.add_argument("--requests_per_load", type=int, default=64)
    parser.add_argument("--max_queue", type=int, default=0,
                        help="admission control: bound the server queue"
                             " — overload is shed (reported as "
                             "shed_fraction) instead of exploding p95. "
                             "0 = unbounded (round-3 behaviour)")
    parser.add_argument("--wire_dtype", choices=["float32", "uint8"],
                        default="uint8",
                        help="image format submitted to the server: "
                             "uint8 raw pixels (production wire format"
                             " — 1/4 the relay upload, on-device fused"
                             " preprocessing) or pre-normalized "
                             "float32 (round-3 behaviour)")
    parser.add_argument("--grounding", action="store_true")
    parser.add_argument("--serving_dp", type=int, default=0,
                        help="N > 1: data-parallel serving over N "
                             "devices (buckets become multiples of N)")
    parser.add_argument("--output", type=str,
                        default="results/serving_async.json")
    add_data_args(parser)
    add_common_args(parser)
    return parser


def _main(argv=None):
    args = build_parser().parse_args(argv)
    cfg = load_config(args)
    tokenizer = make_tokenizer(args, cfg)
    datasets = build_datasets(args, cfg, tokenizer, ("train", "test"))
    train_ds, test_ds = datasets["train"], datasets["test"]
    pipe = build_pipeline_from_args(args, cfg, tokenizer, train_ds)

    n_pool = min(len(test_ds), max(args.requests_per_load, 64))
    studies = []
    for i in range(n_pool):
        s = test_ds[i]
        meta = test_ds.sample_meta(i)
        img = _normalized_image(s, cfg)
        if args.wire_dtype == "uint8":
            # reconstruct the raw pixels the normalized float was
            # derived from — what a production client would POST
            from ..data.dataset import IMAGE_MEAN, IMAGE_STD
            img = np.clip((img * np.asarray(IMAGE_STD, np.float32)
                           + np.asarray(IMAGE_MEAN, np.float32))
                          * 255.0, 0, 255).astype(np.uint8)
        studies.append((img, meta["clinical_context"]))

    loads = [float(x) for x in args.offered_load.split(",") if x]
    if not loads or any(x <= 0 for x in loads):
        raise SystemExit(f"--offered_load needs positive rates, got "
                         f"{args.offered_load!r}")
    rng = np.random.default_rng(args.seed)
    rows = []
    server = RadarServer(pipe, ServerConfig(
        max_batch_size=args.serve_batch,
        max_wait_ms=args.max_wait_ms,
        max_queue=args.max_queue,
        batch_multiple=max(args.serving_dp, 1)))
    try:
        # warmup: compile EVERY bucket (Poisson arrivals hit
        # intermediate buckets too) and prime the relay replay cache
        # with a second pass; then zero the stats so the aggregate
        # server_stats reflect measured traffic only — round 4's
        # aggregate p95 of 71 s was 127 warmup rows carrying 20-40 s
        # compiles through the same deque as real requests
        warmup_s = server.warmup(*studies[0],
                                 verify_grounding=args.grounding)
        server.reset_stats()
        for load in loads:
            futs = []
            shed = 0
            t_start = time.perf_counter()
            for i in range(args.requests_per_load):
                try:
                    futs.append(server.submit(
                        *studies[i % n_pool],
                        verify_grounding=args.grounding))
                except QueueFull:
                    # admission control: overload is shed at the door
                    # so admitted requests keep a bounded latency
                    shed += 1
                time.sleep(float(rng.exponential(1.0 / load)))
            results = [f.result() for f in futs]
            span = time.perf_counter() - t_start
            lat = np.asarray([r["serving"]["latency_s"]
                              for r in results])
            waits = np.asarray([r["serving"]["queue_wait_s"]
                                for r in results])
            sizes = np.asarray([r["serving"]["batch_size"]
                                for r in results])
            rows.append({
                "offered_load_rps": load,
                "achieved_rps": len(results) / span,
                "shed_fraction": shed / max(args.requests_per_load, 1),
                "latency_p50_s": float(np.percentile(lat, 50)),
                "latency_p95_s": float(np.percentile(lat, 95)),
                "queue_wait_p50_s": float(np.percentile(waits, 50)),
                "mean_batch_size": float(sizes.mean()),
            })
            logger.info("load %.1f rps: p50 %.3fs p95 %.3fs "
                        "mean batch %.1f shed %.0f%%", load,
                        rows[-1]["latency_p50_s"],
                        rows[-1]["latency_p95_s"],
                        rows[-1]["mean_batch_size"],
                        100 * rows[-1]["shed_fraction"])
    finally:
        server.shutdown()

    result = {
        "backend": __import__("jax").default_backend(),
        "serve_batch": args.serve_batch,
        "max_wait_ms": args.max_wait_ms,
        "grounding": bool(args.grounding),
        "wire_dtype": args.wire_dtype,
        "max_queue": args.max_queue,
        "requests_per_load": args.requests_per_load,
        "warmup_seconds": warmup_s,
        "server_stats": server.stats(),
        "loads": rows,
        "measured": True,
    }
    os.makedirs(os.path.dirname(os.path.abspath(args.output)),
                exist_ok=True)
    atomic_write_json(args.output, result, indent=2)
    print(json.dumps(result, indent=2))
    return result


def main(argv=None):
    # bench-window flag: cooperative workers (supervisor chains) park
    # for the duration so the measurement sees a quiet relay
    from ..utils.contention import bench_window
    with bench_window():
        return _main(argv)


if __name__ == "__main__":
    main()
