"""Offline data preparation ETL — capability parity with the
reference's ``scripts/data_prep.py``: CSV → ``annotation.json`` +
``splits.json`` + ``findings_stats.json`` with keyword-based findings
extraction and fuzzy column auto-detection.

Additionally emits the ``observation.json`` and
``clinical_context.json`` files the training pipeline consumes (the
reference's prep never produces them even though its trainer requires
them), mapping extracted keyword findings onto the CheXpert-14
vocabulary.
"""

from __future__ import annotations

import json
import os

import numpy as np

from ..core import constants
from ..core.logging import get_logger
from ..utils.io import atomic_write_json

logger = get_logger("radar_tpu.prep")


class FindingsExtractor:
    """Keyword-based findings extraction from free-text reports
    (reference ``FindingsExtractor`` :14-82)."""

    KEYWORDS = constants.FINDINGS_KEYWORDS

    @classmethod
    def extract_findings(cls, report: str) -> list[str]:
        if not isinstance(report, str) or not report:
            return []
        lower = report.lower()
        return [finding for finding, kws in cls.KEYWORDS.items()
                if any(kw in lower for kw in kws)]


# keyword label -> CheXpert-14 observation name
_FINDING_TO_OBSERVATION = {
    "atelectasis": "Atelectasis",
    "pneumonia": "Pneumonia",
    "pneumothorax": "Pneumothorax",
    "pleural_effusion": "Pleural Effusion",
    "pulmonary_edema": "Edema",
    "consolidation": "Consolidation",
    "nodule": "Lung Lesion",
    "mass": "Lung Lesion",
    "opacity": "Lung Opacity",
    "cardiomegaly": "Cardiomegaly",
    "pericardial_effusion": "Enlarged Cardiomediastinum",
    "fracture": "Fracture",
    "central_line": "Support Devices",
    "chest_tube": "Support Devices",
    "pacemaker": "Support Devices",
    "defibrillator": "Support Devices",
    "endotracheal_tube": "Support Devices",
    "nasogastric_tube": "Support Devices",
    "foley_catheter": "Support Devices",
    "ijv_catheter": "Support Devices",
    "picc_line": "Support Devices",
    "port": "Support Devices",
    "normal": "No Finding",
}


def findings_to_observations(findings: list[str]) -> list[str]:
    obs = {_FINDING_TO_OBSERVATION[f] for f in findings
           if f in _FINDING_TO_OBSERVATION}
    if "No Finding" in obs and len(obs) > 1:
        obs.discard("No Finding")
    return sorted(obs)


def identify_columns(columns: list[str]) -> dict:
    """Fuzzy column auto-detection for id/image/report
    (reference ``identify_columns`` :114-144)."""
    cols = {c.lower(): c for c in columns}
    def find(cands):
        for cand in cands:
            for low, orig in cols.items():
                if cand in low:
                    return orig
        return None
    return {
        "id": find(("dicom_id", "image_id", "study_id", "subject_id",
                    "id")),
        "image": find(("image_path", "path", "image", "file", "jpg",
                       "png")),
        "report": find(("report", "findings", "impression", "text")),
    }


def prepare_dataset(csv_path: str, output_dir: str,
                    split_fracs: tuple[float, float, float]
                    = (0.8, 0.1, 0.1),
                    seed: int = 42, limit: int | None = None) -> dict:
    """CSV → annotation/splits/stats/observation/clinical_context JSONs.

    Returns a summary dict with counts and output paths.
    """
    import pandas as pd

    df = pd.read_csv(csv_path)
    if limit:
        df = df.head(limit)
    colmap = identify_columns(list(df.columns))
    if not colmap["report"]:
        raise ValueError(
            f"could not find a report column in {list(df.columns)}")
    logger.info("column map: %s", colmap)

    records = {}
    stats: dict[str, int] = {}
    for i, row in df.iterrows():
        rid = (str(row[colmap["id"]]) if colmap["id"]
               else f"study_{i:08d}")
        report = str(row[colmap["report"]])
        image_path = (str(row[colmap["image"]]) if colmap["image"]
                      else f"images/{rid}.jpg")
        findings = FindingsExtractor.extract_findings(report)
        for f in findings:
            stats[f] = stats.get(f, 0) + 1
        records[rid] = {
            "image_id": rid,
            "image_path": image_path,
            "report": report,
            "findings": report,          # trainer filters on this key
            "extracted_findings": findings,
            "observations": findings_to_observations(findings),
        }

    ids = list(records)
    rng = np.random.default_rng(seed)
    rng.shuffle(ids)
    n = len(ids)
    n_train = int(n * split_fracs[0])
    n_val = int(n * split_fracs[1])
    splits = {
        "train": ids[:n_train],
        "val": ids[n_train:n_train + n_val],
        "test": ids[n_train + n_val:],
    }

    annotation = {split: {rid: records[rid] for rid in rids}
                  for split, rids in splits.items()}
    observation = {rid: rec["observations"]
                   for rid, rec in records.items()}
    clinical_context = {rid: {"Indication": "", "History": "",
                              "Comparison": "None.",
                              "Technique": "Chest radiograph."}
                        for rid in records}

    os.makedirs(output_dir, exist_ok=True)
    outputs = {}
    for name, payload in (("annotation.json", annotation),
                          ("splits.json", splits),
                          ("findings_stats.json", stats),
                          ("observation.json", observation),
                          ("clinical_context.json", clinical_context)):
        path = os.path.join(output_dir, name)
        atomic_write_json(path, payload)
        outputs[name] = path
    logger.info("prepared %d records -> %s", n, output_dir)
    return {"num_records": n,
            "splits": {k: len(v) for k, v in splits.items()},
            "findings_stats": stats, "outputs": outputs}
