"""Atomic artifact writes (round-4, verdict item 8 — snapshot hygiene).

Round-3's snapshot raced a live regen: the driver committed
``results/evaluation.json`` while ``evaluate_retrieval_system`` was
mid-write.  Every results/ artifact now goes through
:func:`atomic_write_json` — write to a same-directory temp file, fsync,
``os.replace`` — so any reader (including ``git add`` at snapshot time)
sees either the old complete artifact or the new complete one, never a
torn write.
"""

from __future__ import annotations

import json
import os
import tempfile


def atomic_write_json(path: str, payload, **json_kw) -> None:
    """Serialize ``payload`` as JSON to ``path`` atomically.

    Extra keyword args are forwarded to :func:`json.dump`
    (``indent``, ``default``, ...).
    """
    path = os.fspath(path)
    d = os.path.dirname(os.path.abspath(path))
    os.makedirs(d, exist_ok=True)
    fd, tmp = tempfile.mkstemp(dir=d, prefix=os.path.basename(path) + ".",
                               suffix=".tmp")
    try:
        with os.fdopen(fd, "w") as f:
            json.dump(payload, f, **json_kw)
            f.flush()
            os.fsync(f.fileno())
        os.replace(tmp, path)
    except BaseException:
        try:
            os.unlink(tmp)
        except OSError:
            pass
        raise
