"""Val-fitted logistic keep-rule ("targeting stacker") for the loop's
expected-observation set.

The oracle-targeting ceiling experiment (results/loop_value_ceiling.json,
docs/DESIGN.md) showed the leak-free RAG loop converts perfect targets
into +6.7-10.7pp micro-F1 while expert-seeded targeting realizes +1.3pp
— the bottleneck is WHICH observations the loop trusts.  The shipping
hand veto keeps an expert-positive only if ``prob > 0.7 OR neighbour
votes >= 6``: a rectangle in a space where the true keep/drop boundary
is not axis-aligned.  The offline sweep
(scripts/targeting_stacker_sweep.py, results/targeting_stacker_sweep.json)
measured that a logistic regression over the signals the pipeline
already computes — per-member calibrated probabilities, their
mean/std/max/min, image-neighbour vote fractions, score-weighted votes,
and a per-observation one-hot — fitted on a held-out leak-free
validation split, beats the hand veto by ~2pp expected-set micro-F1 on
both val (0.953 vs 0.929) and a disjoint test seed (0.934 vs 0.913).

This module is the serving-side integration: a fit helper (plain-numpy
logistic regression — deterministic, no sklearn), a JSON-serializable
:class:`TargetingStacker`, and the feature builder shared by the fit
CLI (``cli/fit_targeting_stacker.py``) and ``RadarPipeline``.

Reference role: the reference's TargetedRetriever
(``modeling_iterative_rag.py:110-152``) has no expert-seeded targeting
at all — this channel is net-new capability on top of its loop.
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass, field

import numpy as np

from ..core.constants import OBSERVATION_NAMES
from ..utils.io import atomic_write_json

#: neighbour depths the feature builder consumes — the pipeline's
#: shared image-neighbour search must fetch at least ``max(VOTE_TOP_MS)``
#: neighbours when a stacker is active.
VOTE_TOP_MS = (10, 20)
#: depth of the score-weighted vote feature; referenced by both the
#: feature builder loop and FEATURE_SPEC so the two cannot drift
#: (advisor round-3: a hardcoded ``m == 10`` silently dropped the
#: feature if VOTE_TOP_MS changed).
SWV_TOP_M = 10
assert SWV_TOP_M in VOTE_TOP_MS
FEATURE_SPEC = (f"mean,std,max,min,member_probs,votes{VOTE_TOP_MS[0]},"
                f"votes{VOTE_TOP_MS[1]},swv{SWV_TOP_M},obs_onehot,bias")


def neighbour_vote_features(nbr_ids: np.ndarray,
                            nbr_scores: np.ndarray,
                            obs_mat: np.ndarray,
                            count: int) -> dict:
    """Vote features from a (score-sorted) neighbour search.

    ``nbr_ids``/``nbr_scores`` are [N, K] with K >= max(VOTE_TOP_MS);
    ``obs_mat`` is the index's stored multi-hot labels [count, n_obs].
    Returns {"votes10": [N, n_obs], "votes20": ..., "swv10": ...} —
    raw counts / score-weighted mass (the stacker normalizes).
    """
    n = len(nbr_ids)
    n_obs = obs_mat.shape[1] if obs_mat.size else len(OBSERVATION_NAMES)
    out = {f"votes{m}": np.zeros((n, n_obs), np.float32)
           for m in VOTE_TOP_MS}
    out["swv10"] = np.zeros((n, n_obs), np.float32)
    if obs_mat.size == 0:
        return out
    for r in range(n):
        for m in VOTE_TOP_MS:
            sel = nbr_ids[r, :m]
            ok = (sel >= 0) & (sel < count)
            out[f"votes{m}"][r] = obs_mat[sel[ok]].sum(0)
            if m == SWV_TOP_M:
                out["swv10"][r] = (obs_mat[sel[ok]]
                                   * nbr_scores[r, :m][ok, None]).sum(0)
    return out


def build_features(stack: np.ndarray, votes10: np.ndarray,
                   votes20: np.ndarray, swv10: np.ndarray) -> np.ndarray:
    """[N, n_obs, F] stacker feature tensor.

    ``stack`` [M, N, n_obs]: per-member calibrated probabilities (the
    fused ensemble forward's output; M=1 for a solo expert).  The
    column order must match :data:`FEATURE_SPEC` — the fitted weights
    key on it.
    """
    stack = np.asarray(stack, np.float32)
    mean, std = stack.mean(0), stack.std(0)
    mx, mn = stack.max(0), stack.min(0)
    n, n_obs = mean.shape
    feats = [mean, std, mx, mn]
    feats += [stack[m] for m in range(stack.shape[0])]
    feats += [votes10 / float(VOTE_TOP_MS[0]), votes20 / float(VOTE_TOP_MS[1]),
              swv10 / float(SWV_TOP_M)]
    x = np.stack(feats, axis=-1)
    eye = np.broadcast_to(np.eye(n_obs, dtype=np.float32),
                          (n, n_obs, n_obs))
    return np.concatenate([x, eye], axis=-1)


def fit_logistic(x: np.ndarray, y: np.ndarray, steps: int = 800,
                 lr: float = 0.5, l2: float = 1e-3) -> np.ndarray:
    """Deterministic full-batch logistic regression (no sklearn).
    ``x`` [S, F], ``y`` [S] in {0,1}; returns weights [F+1], bias last."""
    xb = np.concatenate([x, np.ones((len(x), 1), np.float32)], 1)
    w = np.zeros(xb.shape[1], np.float64)
    for _ in range(steps):
        p = 1.0 / (1.0 + np.exp(-(xb @ w)))
        g = xb.T @ (p - y) / max(len(y), 1) + l2 * w
        w -= lr * g
    return w


@dataclass
class TargetingStacker:
    """Positive-region keep-rule: ``sigmoid(w . features) > tau`` on
    the expert's threshold-positive cells.  ``n_members`` is baked in
    at fit time — the member-probability feature columns are
    positional, so serving must run the same ensemble size."""
    weights: np.ndarray                 # [F+1], bias last
    tau: float = 0.5
    n_members: int = 1
    n_obs: int = len(OBSERVATION_NAMES)
    meta: dict = field(default_factory=dict)

    @property
    def num_features(self) -> int:
        # mean/std/max/min + M member probs + 3 vote features + one-hot
        return 4 + self.n_members + 3 + self.n_obs

    def __post_init__(self):
        self.weights = np.asarray(self.weights, np.float64)
        if self.weights.shape != (self.num_features + 1,):
            raise ValueError(
                f"stacker weights shape {self.weights.shape} does not "
                f"match n_members={self.n_members}/n_obs={self.n_obs} "
                f"(expected {(self.num_features + 1,)})")

    def keep_probs(self, stack: np.ndarray, votes10: np.ndarray,
                   votes20: np.ndarray, swv10: np.ndarray) -> np.ndarray:
        """[N, n_obs] keep probability per cell."""
        if stack.shape[0] != self.n_members:
            raise ValueError(
                f"stacker fitted for {self.n_members} ensemble "
                f"member(s), pipeline runs {stack.shape[0]}")
        x = build_features(stack, votes10, votes20, swv10)
        xb = np.concatenate(
            [x.reshape(-1, x.shape[-1]),
             np.ones((x.shape[0] * x.shape[1], 1), np.float32)], 1)
        z = xb @ self.weights
        return (1.0 / (1.0 + np.exp(-z))).reshape(x.shape[:2])

    def keep_mask(self, stack, votes10, votes20, swv10) -> np.ndarray:
        """[N, n_obs] bool keep decisions at this stacker's tau.
        ``No Finding`` is always kept (it is not a mention the decoder
        can hallucinate; the veto has the same exemption)."""
        keep = self.keep_probs(stack, votes10, votes20, swv10) > self.tau
        keep[:, OBSERVATION_NAMES.index("No Finding")] = True
        return keep

    # ------------------------------------------------------------------
    def save(self, path: str) -> None:
        payload = {
            "version": 1,
            "kind": "positive-keep",
            "features": FEATURE_SPEC,
            "n_members": int(self.n_members),
            "n_obs": int(self.n_obs),
            "tau": float(self.tau),
            "weights": [float(v) for v in self.weights],
            "meta": self.meta,
        }
        d = os.path.dirname(os.path.abspath(path))
        os.makedirs(d, exist_ok=True)
        atomic_write_json(path, payload, indent=2)

    @classmethod
    def load(cls, path: str) -> "TargetingStacker":
        with open(path) as f:
            p = json.load(f)
        if p.get("features") != FEATURE_SPEC:
            raise ValueError(
                f"stacker file {path} was fitted with feature spec "
                f"{p.get('features')!r}; this build expects "
                f"{FEATURE_SPEC!r} — refit with "
                f"cli/fit_targeting_stacker.py")
        return cls(weights=np.asarray(p["weights"], np.float64),
                   tau=float(p.get("tau", 0.5)),
                   n_members=int(p.get("n_members", 1)),
                   n_obs=int(p.get("n_obs", len(OBSERVATION_NAMES))),
                   meta=p.get("meta", {}))


def fit_positive_keep_stacker(stack: np.ndarray, labels: np.ndarray,
                              thresholds: np.ndarray,
                              votes10: np.ndarray, votes20: np.ndarray,
                              swv10: np.ndarray, tau: float = 0.5,
                              meta: dict | None = None,
                              min_region_cells: int = 50
                              ) -> TargetingStacker:
    """Fit the keep-rule on the POSITIVE region (mean prob > threshold,
    ``No Finding`` excluded) of a validation split: y = the cell's
    ground-truth label, i.e. the stacker learns which expert positives
    are real.  ``thresholds``: [n_obs] mean decision thresholds.

    Refuses a fit region smaller than ``min_region_cells`` (advisor
    round-3: an empty region yields all-zero weights, keep_probs 0.5
    everywhere, and the strict ``> tau`` comparison then silently drops
    EVERY expert positive — a recall-destroying artifact)."""
    stack = np.asarray(stack, np.float32)
    mean = stack.mean(0)
    region = mean > np.broadcast_to(
        np.asarray(thresholds, np.float32), mean.shape)
    region[:, OBSERVATION_NAMES.index("No Finding")] = False
    n_cells = int(region.sum())
    if n_cells < min_region_cells:
        raise ValueError(
            f"stacker fit region has {n_cells} expert-positive cells "
            f"(< {min_region_cells}): the fitted rule would be "
            f"degenerate (keep_probs ~0.5 everywhere -> drops all "
            f"positives at tau). Fit on more validation studies or "
            f"stronger experts.")
    x = build_features(stack, votes10, votes20, swv10)
    y = (np.asarray(labels) > 0.5)[region].astype(np.float64)
    w = fit_logistic(x[region], y)
    return TargetingStacker(weights=w, tau=tau,
                            n_members=stack.shape[0],
                            n_obs=mean.shape[1], meta=meta or {})
