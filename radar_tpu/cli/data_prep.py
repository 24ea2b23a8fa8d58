"""Offline data-prep CLI — the reference's ``scripts/data_prep.py``
role: CSV → annotation/splits/stats (+ observation/clinical_context)
JSONs with keyword findings extraction.

Usage:
    python -m radar_tpu.cli.data_prep --csv Cxr_df.csv --output ./data/
"""

from __future__ import annotations

import argparse
import json

from ..core.logging import get_logger
from ..data.prep import prepare_dataset

logger = get_logger("radar_tpu.data_prep")


def main(argv=None):
    parser = argparse.ArgumentParser(
        description="Prepare MIMIC-CXR-style data for RADAR training")
    parser.add_argument("--csv", type=str, required=True,
                        help="Input CSV with id/image/report columns")
    parser.add_argument("--output", type=str, default="./data/mimic_cxr/")
    parser.add_argument("--train_frac", type=float, default=0.8)
    parser.add_argument("--val_frac", type=float, default=0.1)
    parser.add_argument("--limit", type=int, default=None)
    parser.add_argument("--seed", type=int, default=42)
    args = parser.parse_args(argv)

    test_frac = max(0.0, 1.0 - args.train_frac - args.val_frac)
    summary = prepare_dataset(
        args.csv, args.output,
        split_fracs=(args.train_frac, args.val_frac, test_frac),
        seed=args.seed, limit=args.limit)
    print(json.dumps({"num_records": summary["num_records"],
                      "splits": summary["splits"],
                      "top_findings": dict(sorted(
                          summary["findings_stats"].items(),
                          key=lambda kv: -kv[1])[:10])}, indent=2))
    return summary


if __name__ == "__main__":
    main()
