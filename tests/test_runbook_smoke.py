"""Production-preset end-to-end smoke (round-4, verdict item 7).

Runs ``scripts/runbook_smoke.sh`` — the RUNBOOK_MIMIC.md flow on a
synthetic raw stand-in with ``configs/mimic_cxr.yaml`` geometry intact
(SwinV2-large 192px + ClinicalBERT + 12-layer decoder) — in a
subprocess.  ~20 min on the 1-core CPU host, so it is ``slow``-marked
and deselected by default (see pytest.ini); the rebuild supervisor
also executes it as a stamped stage, committing the evidence artifact
``results/runbook_smoke.json``.
"""

import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.slow
def test_runbook_smoke_end_to_end(tmp_path):
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    env["RUNBOOK_SMOKE_RECORDS"] = "20"
    # don't clobber the supervisor-maintained committed artifact from CI
    env["RUNBOOK_SMOKE_ARTIFACT"] = str(tmp_path / "runbook_smoke.json")
    proc = subprocess.run(
        ["bash", os.path.join(REPO, "scripts", "runbook_smoke.sh"),
         str(tmp_path / "work")],
        env=env, capture_output=True, text=True, timeout=3600)
    assert proc.returncode == 0, proc.stdout[-3000:] + proc.stderr[-3000:]
    payload = json.load(open(tmp_path / "runbook_smoke.json"))
    assert payload["runbook_smoke"] == "ok"
    assert payload["config"] == "configs/mimic_cxr.yaml"
