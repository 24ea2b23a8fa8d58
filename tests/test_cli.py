"""CLI smoke tests: every entry point runs end-to-end on synthetic tiny
configs, produces its artifacts, and real training signals appear."""

import json
import os

import numpy as np

import pytest

pytestmark = pytest.mark.filterwarnings("ignore")


def test_train_and_evaluate_expert_models(tmp_path):
    from radar_tpu.cli.evaluate_expert_models import main as eval_main
    from radar_tpu.cli.train_expert_models import main as train_main
    out = str(tmp_path / "ckpt")
    r = train_main(["--model_type", "baseline", "--synthetic", "--tiny",
                    "--epochs", "2", "--synthetic_size", "48",
                    "--output_dir", out])
    assert r["best"] is not None
    assert os.path.exists(os.path.join(out, "baseline"))
    results = eval_main(["--model_type", "baseline", "--synthetic",
                         "--tiny", "--synthetic_size", "48",
                         "--checkpoint_dir", out, "--output_path",
                         str(tmp_path / "cmp.json")])
    assert "baseline" in results
    assert 0.0 <= results["baseline"]["macro_f1"] <= 1.0
    saved = json.load(open(tmp_path / "cmp.json"))
    assert "results" in saved


def test_train_uncertainty_calibrates(tmp_path):
    from radar_tpu.cli.train_expert_models import main as train_main
    r = train_main(["--model_type", "uncertainty", "--synthetic",
                    "--tiny", "--epochs", "1", "--synthetic_size", "32",
                    "--output_dir", str(tmp_path / "ckpt")])
    assert r["history"]


def test_retrieval_system_train_eval(tmp_path):
    from radar_tpu.cli.evaluate_retrieval_system import main as eval_main
    from radar_tpu.cli.train_retrieval_system import main as train_main
    ckpt = str(tmp_path / "retr")
    r = train_main(["--contribution", "2.2", "--synthetic", "--tiny",
                    "--epochs", "2", "--synthetic_size", "32",
                    "--output_dir", ckpt])
    assert r["2.2"]["final_conflict_acc"] > 0.6  # real learning signal
    res = eval_main(["--contribution", "2.1", "--synthetic", "--tiny",
                     "--synthetic_size", "32", "--num_queries", "8",
                     "--checkpoint_dir", ckpt, "--output_path",
                     str(tmp_path / "evaluation.json")])
    rep = res["contribution_2_1_dpr"]
    for key in ("mean_reciprocal_rank", "retrieval_accuracy@5",
                "precision@5", "ndcg@5"):
        assert 0.0 <= rep[key] <= 1.0
    payload = json.load(open(tmp_path / "evaluation.json"))
    assert payload["measured"] is True


def test_rag_evaluation_runs(tmp_path):
    from radar_tpu.cli.evaluate_retrieval_system import main as eval_main
    res = eval_main(["--contribution", "2.3", "--synthetic", "--tiny",
                     "--synthetic_size", "32", "--num_queries", "6",
                     "--checkpoint_dir", str(tmp_path / "none"),
                     "--output_path", str(tmp_path / "rag.json")])
    rep = res["contribution_2_3_rag"]
    assert rep["average_iterations"] >= 1.0
    assert 0.0 <= rep["completeness"] <= 1.0
    assert rep["iteration_1_completeness"] is not None


def test_demo_expert_models():
    from radar_tpu.cli.demo_expert_models import main
    assert main([]) == 0


def test_data_prep_cli(tmp_path):
    import pandas as pd
    from radar_tpu.cli.data_prep import main
    csv = tmp_path / "df.csv"
    pd.DataFrame([
        {"id": "a", "path": "x.jpg", "findings": "cardiomegaly seen"},
        {"id": "b", "path": "y.jpg", "findings": "no acute process"},
    ]).to_csv(csv, index=False)
    summary = main(["--csv", str(csv), "--output",
                    str(tmp_path / "out")])
    assert summary["num_records"] == 2
    assert os.path.exists(tmp_path / "out" / "annotation.json")


def test_train_resume(tmp_path):
    """Full train-state resume: a second run with --resume continues
    from the saved epoch instead of restarting."""
    from radar_tpu.cli.train_expert_models import main as train_main
    out = str(tmp_path / "ckpt")
    common = ["--model_type", "baseline", "--synthetic", "--tiny",
              "--synthetic_size", "32", "--output_dir", out]
    r1 = train_main(common + ["--epochs", "2"])
    assert len([h for h in r1["history"] if "epoch" in h]) == 2
    # resume with a larger epoch budget: only the remaining epochs run
    r2 = train_main(common + ["--epochs", "3", "--resume"])
    epochs_run = [h["epoch"] for h in r2["history"] if "epoch" in h]
    assert epochs_run == [2], epochs_run


def test_generate_report_cli(tmp_path):
    from radar_tpu.cli.generate_report import main
    out = main(["--synthetic", "--tiny", "--synthetic_size", "24",
                "--retrieval_checkpoint", str(tmp_path / "none"),
                "--sample", "0"])
    assert isinstance(out["report"], str)
    assert out["iterations"] >= 1


def test_train_on_prepared_real_data(tmp_path):
    """Full real-data path: CSV ETL -> image files -> ExpertModelDataset
    -> device preprocessing -> training (no --synthetic)."""
    import numpy as np
    import pandas as pd
    from PIL import Image

    from radar_tpu.cli.data_prep import main as prep_main
    from radar_tpu.cli.train_expert_models import main as train_main

    reports = ["Mild cardiomegaly.", "No acute process. Normal exam.",
               "Pneumonia with consolidation.", "Pleural effusion seen."] * 8
    rows = [{"study_id": f"s{i:04d}", "image_path": f"images/s{i:04d}.jpg",
             "report": r} for i, r in enumerate(reports)]
    csv = tmp_path / "df.csv"
    pd.DataFrame(rows).to_csv(csv, index=False)
    out = tmp_path / "data"
    prep_main(["--csv", str(csv), "--output", str(out)])
    os.makedirs(out / "images", exist_ok=True)
    for i in range(len(rows)):
        Image.fromarray((np.random.default_rng(i).random((48, 48, 3))
                         * 255).astype(np.uint8)).save(
            out / f"images/s{i:04d}.jpg")

    r = train_main([
        "--model_type", "baseline", "--tiny", "--epochs", "1",
        "--batch_size", "4",
        "--image_path", str(out),
        "--annotation_path", str(out / "annotation.json"),
        "--clinical_context_path", str(out / "clinical_context.json"),
        "--observation_path", str(out / "observation.json"),
        "--output_dir", str(tmp_path / "ckpt")])
    assert r["history"], r
    assert np.isfinite(r["history"][-1]["train_loss"])


def test_evaluate_pipeline_cli(tmp_path):
    from radar_tpu.cli.evaluate_pipeline import main
    r = main(["--synthetic", "--tiny", "--synthetic_size", "32",
              "--num_samples", "4", "--passages", "16",
              "--retrieval_checkpoint", str(tmp_path / "none"),
              "--output_path", str(tmp_path / "pe.json")])
    for k in ("bleu_1", "bleu_4", "rouge_l", "observation_micro_f1",
              "latency_p50_seconds"):
        assert k in r and np.isfinite(r[k])
    assert r["mode"] == "blind"


def test_evaluate_pipeline_cli_context_parallel(tmp_path):
    """--context_parallel N builds RadarPipeline(ring=...) and the
    pipeline still evaluates end-to-end (CP is a serving knob now, not
    a tests-only capability)."""
    from radar_tpu.cli.evaluate_pipeline import main
    r = main(["--synthetic", "--tiny", "--synthetic_size", "32",
              "--num_samples", "2", "--passages", "16",
              "--context_parallel", "2",
              "--retrieval_checkpoint", str(tmp_path / "none"),
              "--output_path", str(tmp_path / "pe_cp.json")])
    assert np.isfinite(r["bleu_4"])


def test_evaluate_pipeline_cli_serving_dp(tmp_path):
    """--serving_dp N builds RadarPipeline(serving_mesh=...): params
    replicate over N devices (and the index row-shards) and the full
    pipeline evaluates end-to-end.  Batch sharding itself is asserted
    in test_serving.py::test_dp_serving_parity — this eval CLI drives
    the single-study path."""
    from radar_tpu.cli.evaluate_pipeline import main
    r = main(["--synthetic", "--tiny", "--synthetic_size", "32",
              "--num_samples", "4", "--passages", "16",
              "--serving_dp", "4",
              "--retrieval_checkpoint", str(tmp_path / "none"),
              "--output_path", str(tmp_path / "pe_dp.json")])
    assert np.isfinite(r["bleu_4"])


def test_prompt_contract():
    """Training and serving share these exact strings; changing them
    requires retraining deployed decoders — keep the contract pinned."""
    from radar_tpu.pipeline.prompts import (build_prompt,
                                            build_regeneration_prompt)
    p = build_prompt("Indication: pain", ["Edema", "Cardiomegaly"])
    assert p == ("Clinical context: Indication: pain\n"
                 "Validated observations: Cardiomegaly, Edema\nFindings:")
    assert build_prompt("ctx") == "Clinical context: ctx\nFindings:"
    r = build_regeneration_prompt("draft text", ["ev1", "ev2"])
    assert r == "draft text\n\nRetrieved Evidence:\nev1\nev2\nFindings:"
    r = build_regeneration_prompt("draft text", ["ev1"], {"Edema"})
    assert r == ("draft text\n\nRetrieved Evidence:\nev1\n"
                 "Validated observations: Edema\nFindings:")
