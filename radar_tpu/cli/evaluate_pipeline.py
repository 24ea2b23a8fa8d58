"""Full-RADAR pipeline evaluation CLI: assemble expert + retrieval +
decoder from checkpoints, generate reports over a test set, and measure
BLEU-1/4, ROUGE-L, observation F1 (the CheXbert-F1 analog), loop
behavior and latency — the measured counterpart of the reference's
expected "Full RADAR BLEU-4" rows (BASELINE.md rows 5-8).

Usage:
    python -m radar_tpu.cli.evaluate_pipeline --synthetic --tiny \
        --expert_checkpoint ./checkpoints/expert_models/baseline \
        --retrieval_checkpoint ./checkpoints/retrieval_system \
        --num_samples 16
"""

from __future__ import annotations

import argparse
import json
import os

import jax
import jax.numpy as jnp
import numpy as np

from ..core.checkpoint import load_params
from ..core.logging import get_logger
from ..eval.pipeline_eval import (evaluate_pipeline,
                                  evaluate_pipeline_verification)
from ..models.decoder import ReportDecoder
from ..pipeline.radar import RadarPipeline
from ..retrieval.dpr import create_dpr_model
from .common import (add_common_args, make_tokenizer, add_data_args, build_datasets,
                     load_config)
from .evaluate_expert_models import load_calibration, load_model_params
from .evaluate_retrieval_system import _normalized_image
from ..utils.io import atomic_write_json

logger = get_logger("radar_tpu.eval_pipeline")


def build_parser():
    parser = argparse.ArgumentParser(
        description="Evaluate the full two-stage RADAR pipeline")
    parser.add_argument("--model_type", type=str, default="baseline")
    parser.add_argument("--expert_checkpoint", type=str, default=None)
    parser.add_argument("--ensemble_expert", action="append",
                        default=[], metavar="TYPE:CKPT_DIR",
                        help="Extra expert member(s) for probability-"
                             "averaged ensembling, e.g. "
                             "--ensemble_expert gnn:./checkpoints/"
                             "expert_models/gnn (repeatable)")
    parser.add_argument("--retrieval_checkpoint", type=str,
                        default="./checkpoints/retrieval_system")
    parser.add_argument("--num_samples", type=int, default=16)
    parser.add_argument("--passages", type=int, default=128)
    parser.add_argument("--use_reference", action="store_true",
                        help="Reference-guided RAG (evaluation mode)")
    parser.add_argument("--max_iterations", type=int, default=None,
                        help="Override rag.max_iterations (1 = "
                             "single-pass ablation)")
    parser.add_argument("--grounding", action="store_true",
                        help="Run the contribution-3.3 hallucination "
                             "pass (entity verification + constrained "
                             "regeneration) during evaluation")
    parser.add_argument("--verify_samples", type=int, default=0,
                        help="N > 0: evaluate the N-sample stochastic "
                             "self-consistency serving path instead of "
                             "the deterministic loop")
    parser.add_argument("--temperature", type=float, default=0.7,
                        help="Sampling temperature for --verify_samples")
    parser.add_argument("--oracle_targeting", action="store_true",
                        help="DIAGNOSTIC: drive the RAG loop's expected"
                             "-observation set from the ground-truth "
                             "labels instead of the expert stage — "
                             "measures the loop's value ceiling at "
                             "perfect targeting (artifact is tagged "
                             "targeting=oracle; never a headline)")
    parser.add_argument("--leakage_free", action="store_true",
                        help="Synthetic eval contexts use a generic "
                             "indication instead of the ground-truth "
                             "observation names (no label leakage "
                             "through the prompt)")
    parser.add_argument("--context_parallel", type=int, default=0,
                        help="N > 1: run decoder prefills with ring "
                             "attention sequence-sharded over N devices "
                             "(context parallelism; needs N devices)")
    parser.add_argument("--serving_dp", type=int, default=0,
                        help="N > 1: build the pipeline on an N-device "
                             "data-parallel serving mesh (replicated "
                             "params + row-sharded retrieval index; "
                             "batch sharding engages on the BATCHED "
                             "entry points — serve/bench_serving/"
                             "bench_async_serving; this eval drives "
                             "single-study serving). Mutually "
                             "exclusive with --context_parallel")
    parser.add_argument("--targeting_stacker", type=str, default=None,
                        help="Path to a fit_targeting_stacker.py JSON: "
                             "replaces the hand cross-modal veto on "
                             "expert positives with the val-fitted "
                             "logistic keep-rule (must be fitted on "
                             "the same ensemble size)")
    parser.add_argument("--output_path", type=str,
                        default="./results/pipeline_evaluation.json")
    add_data_args(parser)
    add_common_args(parser)
    return parser


def build_pipeline_from_args(args, cfg, tokenizer, train_ds
                             ) -> RadarPipeline:
    """Assemble the full serving pipeline (expert + retrieval index +
    decoder + optional fusion) from CLI args and checkpoints — shared
    by the evaluation and serving-bench CLIs."""
    sample_batch = next(iter(train_ds.batches(2)))
    if "raw_images" in sample_batch:
        sample_batch = train_ds.device_batch(sample_batch)
    expert, expert_params = load_model_params(
        args.model_type, args.expert_checkpoint, cfg, sample_batch)

    # data-parallel serving knob (built before the DPR so the retrieval
    # corpus can row-shard over the same mesh): replicate params over N
    # chips and shard every batched stage's leading dim across them
    serving_mesh = None
    n_dp = getattr(args, "serving_dp", 0) or 0
    if n_dp > 1:
        if (getattr(args, "context_parallel", 0) or 0) > 1:
            raise SystemExit("--serving_dp and --context_parallel are "
                             "mutually exclusive per pipeline")
        from jax.sharding import Mesh
        devs = jax.devices()
        if len(devs) < n_dp:
            raise SystemExit(f"--serving_dp {n_dp} needs {n_dp} "
                             f"devices, have {len(devs)}")
        serving_mesh = (Mesh(np.asarray(devs[:n_dp]), ("data",)),
                        "data")
        logger.info("data-parallel serving over %d devices", n_dp)

    index_mesh = None
    if serving_mesh is not None:
        if cfg.retrieval.capacity % n_dp == 0:
            index_mesh = serving_mesh[0]
            logger.info("retrieval corpus row-sharded over the "
                        "serving mesh (%d rows/chip)",
                        cfg.retrieval.capacity // n_dp)
        else:
            logger.warning(
                "retrieval.capacity %d does not divide over %d chips; "
                "index stays unsharded", cfg.retrieval.capacity, n_dp)
    from .common import apply_embedder_meta
    cfg = apply_embedder_meta(cfg, args.retrieval_checkpoint)
    dpr = create_dpr_model(cfg, tokenizer, mesh=index_mesh)
    emb_ckpt = os.path.join(args.retrieval_checkpoint, "embedder")
    if os.path.isdir(emb_ckpt):
        dpr.embedder.params = load_params(
            emb_ckpt, {"params": dpr.embedder.params})["params"]
    n = min(args.passages, len(train_ds))
    dpr.build_retrieval_database(train_ds.get_passages()[:n],
                                 train_ds.get_observations()[:n])

    decoder = ReportDecoder(cfg.decoder)
    decoder_params = decoder.init(
        jax.random.key(1), jnp.zeros((1, 8), jnp.int32),
        jnp.ones((1, 8), jnp.int32),
        jnp.zeros((1, cfg.decoder.prefix_dim), jnp.float32))["params"]
    dec_ckpt = os.path.join(args.retrieval_checkpoint, "decoder")
    if os.path.isdir(dec_ckpt):
        decoder_params = load_params(
            dec_ckpt, {"params": jax.device_get(decoder_params)})["params"]

    # optional trained fusion for conflict filtering
    fusion_module = fusion_params = None
    fus_ckpt = os.path.join(args.retrieval_checkpoint, "fusion")
    if (os.path.isdir(fus_ckpt)
            and cfg.fusion.hidden_size == cfg.text.hidden_size):
        from ..fusion.fusion import AttentionKnowledgeFusion
        fusion_module = AttentionKnowledgeFusion(cfg.fusion)
        dummy = jnp.zeros((2, 8, cfg.fusion.hidden_size), jnp.float32)
        fusion_params = fusion_module.init(jax.random.key(0), dummy,
                                           dummy)["params"]
        fusion_params = load_params(
            fus_ckpt, {"params": jax.device_get(fusion_params)})["params"]

    # context-parallel serving knob: sequence-shard decoder prefills
    # over a ring of devices (long retrieved-evidence prompts)
    ring = None
    n_cp = getattr(args, "context_parallel", 0) or 0
    if n_cp > 1:
        from jax.sharding import Mesh
        devs = jax.devices()
        if len(devs) < n_cp:
            raise SystemExit(f"--context_parallel {n_cp} needs {n_cp} "
                             f"devices, have {len(devs)}")
        ring = (Mesh(np.asarray(devs[:n_cp]), ("seq",)), "seq")
        logger.info("context parallelism: ring of %d devices", n_cp)

    # probability-averaged expert ensemble (decorrelated confident FPs)
    ensemble = []
    for spec in getattr(args, "ensemble_expert", []) or []:
        m_type, _, m_ckpt = spec.partition(":")
        if not m_ckpt:
            raise SystemExit(f"--ensemble_expert needs TYPE:CKPT_DIR, "
                             f"got {spec!r}")
        m_model, m_params = load_model_params(m_type, m_ckpt, cfg,
                                              sample_batch)
        ensemble.append((m_model, m_params, load_calibration(m_ckpt)))

    # temporal comparator (contribution 3.1 serving hook)
    temporal_model = temporal_params = None
    tckpt = getattr(args, "temporal_checkpoint", None)
    if tckpt:
        from ..core.checkpoint import CheckpointManager
        from ..models.temporal import TemporalComparator
        temporal_model = TemporalComparator(cfg.vision, cfg.expert)
        dummy = jnp.zeros((1, cfg.vision.image_size,
                           cfg.vision.image_size, 3), jnp.float32)
        temporal_params = temporal_model.init(
            jax.random.key(0), dummy, dummy)["params"]
        mngr = CheckpointManager(os.path.join(tckpt, "comparator"))
        temporal_params = mngr.restore(jax.device_get(temporal_params))
        mngr.close()
        logger.info("restored temporal comparator from %s", tckpt)

    # val-fitted logistic keep-rule on expert positives (replaces the
    # hand cross-modal veto; fit with cli/fit_targeting_stacker.py)
    stacker = None
    st_path = getattr(args, "targeting_stacker", None)
    if st_path:
        from ..pipeline.targeting import TargetingStacker
        if not os.path.isfile(st_path):
            raise SystemExit(f"--targeting_stacker {st_path}: no such "
                             f"file (fit one with "
                             f"cli/fit_targeting_stacker.py)")
        stacker = TargetingStacker.load(st_path)
        logger.info("targeting stacker: %s (tau=%.2f, %d members)",
                    st_path, stacker.tau, stacker.n_members)

    return RadarPipeline(cfg, tokenizer, expert, expert_params, dpr,
                         decoder, decoder_params, fusion_module,
                         fusion_params,
                         temporal_model=temporal_model,
                         temporal_params=temporal_params,
                         ring=ring, serving_mesh=serving_mesh,
                         expert_thresholds=load_calibration(
                             args.expert_checkpoint),
                         ensemble=ensemble, stacker=stacker)


def main(argv=None):
    args = build_parser().parse_args(argv)
    cfg = load_config(args)
    if args.max_iterations:
        cfg = cfg.override(**{"rag.max_iterations": args.max_iterations})
    tokenizer = make_tokenizer(args, cfg)
    datasets = build_datasets(args, cfg, tokenizer, ("train", "test"))
    train_ds, test_ds = datasets["train"], datasets["test"]
    if args.leakage_free:
        from ..data.synthetic import SyntheticCXRDataset
        if not isinstance(test_ds, SyntheticCXRDataset):
            raise SystemExit("--leakage_free applies to synthetic data")
        # same seed as build_datasets' test split -> identical
        # labels/images/reports, only the context string changes
        # (honouring the distribution-shift knobs)
        kw = ({} if args.synthetic_noise is None
              else {"noise": args.synthetic_noise})
        test_ds = SyntheticCXRDataset(
            len(test_ds), cfg.vision.image_size, cfg.text.max_length,
            seed=101 + (args.synthetic_shift_seed or 0) * 100_000,
            tokenizer=tokenizer, leak_labels=False, **kw)

    pipe = build_pipeline_from_args(args, cfg, tokenizer, train_ds)

    num = min(args.num_samples, len(test_ds))
    samples = []
    for i in range(num):
        s = test_ds[i]
        meta = test_ds.sample_meta(i)
        samples.append({
            "pixel_values": _normalized_image(s, cfg),
            "clinical_context": meta["clinical_context"],
            "report": meta["report"],
            "labels": meta["labels"],
        })

    if args.verify_samples > 0:
        results = evaluate_pipeline_verification(
            pipe, samples, num_samples=args.verify_samples,
            temperature=args.temperature)
    else:
        results = evaluate_pipeline(pipe, samples,
                                    use_reference=args.use_reference,
                                    verify_grounding=args.grounding,
                                    oracle_targeting=args.oracle_targeting)
    # which positive gate actually ran (advisor round-3: a loaded
    # stacker can silently fall back to the hand veto — make it visible
    # in the artifact)
    results["targeting_gate_counts"] = dict(pipe.gate_counts)
    if pipe.stacker is not None and pipe.gate_counts["stacker"] == 0 \
            and pipe.gate_counts["veto"] > 0:
        results["targeting_gate_warning"] = (
            "stacker loaded but never ran; hand-veto fallback was used")
    os.makedirs(os.path.dirname(os.path.abspath(args.output_path)),
                exist_ok=True)
    atomic_write_json(args.output_path, results, indent=2)
    logger.info("pipeline eval: bleu_4=%.3f obs_micro_f1=%.3f "
                "p50=%.2fs -> %s", results["bleu_4"],
                results["observation_micro_f1"],
                results["latency_p50_seconds"], args.output_path)
    print(json.dumps(results, indent=2))
    return results


if __name__ == "__main__":
    main()
