"""Serve the full RADAR pipeline over HTTP — the deployment entry
point the reference never had (SURVEY.md §0.1: no serving/API layer).

Boots the two-stage pipeline from checkpoints (same flags as
``evaluate_pipeline``/``bench_serving``), wraps it in the dynamic-
batching ``RadarServer`` and the stdlib ``RadarHTTPServer``, and
blocks until SIGINT/SIGTERM.

Usage:
    python -m radar_tpu.cli.serve --synthetic --tiny \
        --expert_checkpoint ./checkpoints/expert_models/gnn \
        --model_type gnn --port 8000

    curl -s localhost:8000/healthz
    curl -s -X POST localhost:8000/generate -d \
        '{"image": {"b64": "...", "shape": [64, 64, 3]},
          "clinical_context": "Indication: dyspnea."}'
"""

from __future__ import annotations

import argparse
import threading

from ..core.logging import get_logger
from ..serving.http import RadarHTTPServer
from ..serving.server import RadarServer, ServerConfig
from .common import (add_common_args, add_data_args, build_datasets,
                     load_config, make_tokenizer)
from .evaluate_pipeline import build_pipeline_from_args

logger = get_logger("radar_tpu.serve")


def build_parser():
    parser = argparse.ArgumentParser(
        description="Serve the RADAR pipeline over HTTP")
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
    parser.add_argument("--host", type=str, default="127.0.0.1")
    parser.add_argument("--port", type=int, default=8000,
                        help="0 picks a free port (printed at boot)")
    parser.add_argument("--serve_batch", type=int, default=16)
    parser.add_argument("--max_wait_ms", type=float, default=30.0)
    parser.add_argument("--max_queue", type=int, default=256,
                        help="reject submits beyond this queue depth "
                             "with HTTP 429 (0 = unbounded)")
    parser.add_argument("--serving_dp", type=int, default=0,
                        help="N > 1: data-parallel serving over N "
                             "devices (batch buckets become multiples "
                             "of N)")
    parser.add_argument("--warmup", choices=["none", "uint8", "both"],
                        default="uint8",
                        help="pre-compile every batch bucket BEFORE "
                             "opening the listener so no client ever "
                             "pays the 20-40s first-use XLA compile: "
                             "'uint8' warms the production wire "
                             "signature, 'both' also warms float32 "
                             "image submits")
    add_data_args(parser)
    add_common_args(parser)
    return parser


def start(argv=None):
    """Build pipeline + batcher + HTTP listener; return them running.
    (``main`` adds the signal-blocking wait — split so tests and
    embedding callers can drive the running server in-process.)"""
    args = build_parser().parse_args(argv)
    cfg = load_config(args)
    tokenizer = make_tokenizer(args, cfg)
    datasets = build_datasets(args, cfg, tokenizer, ("train",))
    pipe = build_pipeline_from_args(args, cfg, tokenizer,
                                    datasets["train"])
    server = RadarServer(pipe, ServerConfig(
        max_batch_size=args.serve_batch,
        max_wait_ms=args.max_wait_ms,
        max_queue=args.max_queue,
        batch_multiple=max(args.serving_dp, 1)))
    if args.warmup != "none":
        # warm every bucket before the listener opens: the compile
        # stall lands here, not on the first unlucky clients
        import numpy as np
        from .evaluate_retrieval_system import _normalized_image
        s = datasets["train"][0]
        meta = datasets["train"].sample_meta(0)
        img_f32 = _normalized_image(s, cfg)
        from ..data.dataset import IMAGE_MEAN, IMAGE_STD
        img_u8 = np.clip((img_f32 * np.asarray(IMAGE_STD, np.float32)
                          + np.asarray(IMAGE_MEAN, np.float32)) * 255.0,
                         0, 255).astype(np.uint8)
        server.warmup(img_u8, meta["clinical_context"])
        if args.warmup == "both":
            server.warmup(img_f32, meta["clinical_context"])
        server.reset_stats()
    http = RadarHTTPServer(server, host=args.host, port=args.port)
    logger.info("RADAR serving on http://%s:%d (batch<=%d, wait %.0fms)",
                http.host, http.port, args.serve_batch, args.max_wait_ms)
    return http, server


def main(argv=None):
    http, server = start(argv)
    stop = threading.Event()
    import signal

    def _handler(signum, frame):   # noqa: ARG001 (signal API)
        logger.info("signal %d: shutting down", signum)
        stop.set()

    signal.signal(signal.SIGINT, _handler)
    signal.signal(signal.SIGTERM, _handler)
    try:
        stop.wait()
    finally:
        http.close()
        server.shutdown()


if __name__ == "__main__":
    main()
