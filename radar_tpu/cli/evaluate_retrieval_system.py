"""Retrieval-system evaluation CLI — flag parity with the reference's
``evaluate_retrieval_system.py:377-381`` (``--contribution``), producing
**measured** numbers for the metric names in ``evaluation.json`` (the
reference returns hard-coded constants — SURVEY.md §0.2.2).

Usage:
    python -m radar_tpu.cli.evaluate_retrieval_system \
        --contribution all --synthetic --tiny
"""

from __future__ import annotations

import argparse
import json
import os
import time

import numpy as np

from ..core.checkpoint import load_params
from ..core.logging import get_logger
from .common import add_common_args, add_data_args, build_datasets, \
    load_config, make_tokenizer
from ..utils.io import atomic_write_json

logger = get_logger("radar_tpu.eval_retrieval")


def build_parser():
    parser = argparse.ArgumentParser(
        description="Evaluate RADAR retrieval system (real metrics)")
    parser.add_argument("--contribution",
                        choices=["2.1", "2.2", "2.3", "all"],
                        default="all")
    parser.add_argument("--checkpoint_dir", type=str,
                        default="./checkpoints/retrieval_system/")
    parser.add_argument("--output_path", type=str,
                        default="./results/evaluation.json")
    parser.add_argument("--num_queries", type=int, default=32)
    add_data_args(parser)
    add_common_args(parser)
    return parser


def _normalized_image(sample: dict, cfg) -> np.ndarray:
    """Model-ready image from either dataset type: synthetic samples
    carry pre-normalised pixel_values; real samples carry raw uint8
    that must go through the device preprocessing."""
    if "pixel_values" in sample:
        return np.asarray(sample["pixel_values"], np.float32)
    from ..data.dataset import preprocess_images
    import jax.numpy as jnp
    return np.asarray(preprocess_images(
        jnp.asarray(sample["image"])[None], cfg.vision.image_size)[0])


def _maybe_restore(path: str, params):
    if os.path.isdir(path):
        try:
            import jax
            # pin restored (host-numpy) params on device once — jit
            # re-uploads numpy args on every call through the relay
            return jax.device_put(
                load_params(path, {"params": params})["params"])
        except Exception as e:  # pragma: no cover
            logger.warning("restore failed from %s: %s", path, e)
    return params


def main(argv=None):
    args = build_parser().parse_args(argv)
    cfg = load_config(args)
    tokenizer = make_tokenizer(args, cfg)
    datasets = build_datasets(args, cfg, tokenizer, ("train", "test"))
    train_ds, test_ds = datasets["train"], datasets["test"]
    contributions = (["2.1", "2.2", "2.3"]
                     if args.contribution == "all"
                     else [args.contribution])
    results = {}

    passages = train_ds.get_passages()
    passage_labels = train_ds.get_observations()
    nq = min(args.num_queries, len(test_ds))
    test_meta = [test_ds.sample_meta(i) for i in range(nq)]
    query_texts = [m["report"] for m in test_meta]
    query_labels = np.stack([m["labels"] for m in test_meta])
    query_images = [_normalized_image(test_ds[i], cfg) for i in range(nq)]

    dpr = None
    if contributions:
        from ..retrieval.dpr import create_dpr_model
        from .common import apply_embedder_meta
        cfg = apply_embedder_meta(cfg, args.checkpoint_dir)
        dpr = create_dpr_model(cfg, tokenizer)
        dpr.embedder.params = _maybe_restore(
            os.path.join(args.checkpoint_dir, "embedder"),
            dpr.embedder.params)
        dpr.build_retrieval_database(passages, passage_labels)

    if "2.1" in contributions:
        from ..eval.retrieval_eval import DPREvaluator
        t0 = time.time()
        rep = DPREvaluator(dpr).evaluate(
            query_texts, query_labels, passage_labels, query_images)
        rep["seconds"] = round(time.time() - t0, 2)
        results["contribution_2_1_dpr"] = rep
        logger.info("2.1: MRR=%.3f acc@5=%.3f", rep["mean_reciprocal_rank"],
                    rep["retrieval_accuracy@5"])

    if "2.2" in contributions:
        from ..eval.retrieval_eval import FusionEvaluator
        from ..fusion.fusion import AttentionKnowledgeFusion
        import jax
        import jax.numpy as jnp
        t0 = time.time()
        module = AttentionKnowledgeFusion(cfg.fusion)
        seq = 8
        dummy = jnp.zeros((2, seq, cfg.fusion.hidden_size), jnp.float32)
        params = module.init(jax.random.key(0), dummy, dummy)["params"]
        params = _maybe_restore(
            os.path.join(args.checkpoint_dir, "fusion"), params)
        fe = FusionEvaluator(module, params)
        if (dpr is not None
                and cfg.fusion.hidden_size == cfg.text.hidden_size
                and os.path.isdir(os.path.join(args.checkpoint_dir,
                                               "embedder"))):
            rep = fe.evaluate_conflicts_on_texts(
                query_labels, dpr.embedder.embed_text_hidden,
                cfg.fusion.max_findings_len)
            rep["mode"] = "text-features"
        else:
            rep = fe.evaluate_conflicts(query_labels,
                                        cfg.fusion.hidden_size, seq)
            rep["mode"] = "codebook"
        # fused-report text metrics: PF = first half of the reference
        # report, SF = best retrieved passage; fused = concat
        fused_reports, refs = [], []
        for i in range(nq):
            ref = query_texts[i]
            words = ref.split()
            pf = " ".join(words[: max(1, len(words) // 2)])
            sf = ""
            if dpr is not None:
                hits = dpr.retrieve_for_text(pf, k=1)
                sf = hits[0]["passage"] if hits else ""
            fused_reports.append(f"{pf} {sf}".strip())
            refs.append(ref)
        rep.update(fe.evaluate_reports(fused_reports, refs))
        rep["seconds"] = round(time.time() - t0, 2)
        results["contribution_2_2_fusion"] = rep
        logger.info("2.2: conflict_f1=%.3f completeness=%.3f",
                    rep["conflict_detection_f1"],
                    rep["report_completeness"])

    if "2.3" in contributions:
        from ..eval.retrieval_eval import RAGEvaluator
        from ..pipeline.rag import create_iterative_rag_model
        t0 = time.time()
        rag = create_iterative_rag_model(cfg.rag)

        def retrieval_fn(query, k):
            hits = dpr.retrieve_for_text(query, k)
            return [h["passage"] for h in hits]

        def generation_fn_factory(sample):
            # template generator: reads observations present in its
            # context (initial findings + retrieved evidence) — the
            # reference's test uses the same shape (test_2.py:181-182)
            from ..pipeline.observations import ObservationDetector
            det = ObservationDetector()

            def gen(context):
                obs = det.detect_observations(context)
                if not obs:
                    return "No significant findings."
                return ("Findings: "
                        + ". ".join(sorted(obs)) + ".")
            return gen

        samples = [{"initial_findings":
                    " ".join(query_texts[i].split()[:8]),
                    "reference": query_texts[i]} for i in range(nq)]
        rep = RAGEvaluator(rag, embed_fn=dpr.embedder.embed_texts
                           ).evaluate(samples, retrieval_fn,
                                      generation_fn_factory)
        rep["seconds"] = round(time.time() - t0, 2)
        results["contribution_2_3_rag"] = rep
        logger.info("2.3: completeness=%.3f avg_iters=%.2f",
                    rep["completeness"], rep["average_iterations"])

    os.makedirs(os.path.dirname(os.path.abspath(args.output_path)),
                exist_ok=True)
    payload = {"timestamp": time.strftime("%Y-%m-%d %H:%M:%S"),
               "measured": True, "results": results}
    atomic_write_json(args.output_path, payload, indent=2, default=str)
    logger.info("results -> %s", args.output_path)
    return results


if __name__ == "__main__":
    main()
