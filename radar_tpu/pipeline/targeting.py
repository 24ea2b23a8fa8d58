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
#: v2 (round-4, verdict item 4): adds the signals the pipeline already
#: computes at gate time but v1 never saw — retrieval score stats
#: (top-1, mean@10, margin) per study, the score-normalized vote mass,
#: and the |mean prob - vote fraction| cross-modal disagreement delta.
#: (Fusion conflict scores stay out: serving computes them on
#: RETRIEVED passages later in the loop, so a gate-time conflict
#: feature would cost an extra fusion dispatch per batch.)
#: v3 (round-5, verdict item 5): per-study RANK features — each
#: member's probability rank across the study's observations, the mean
#: probability's rank, and the vote fraction's rank.  Ranks are
#: computed at serve time from the study itself, so they are invariant
#: to any monotone per-member mis-calibration: exactly the failure
#: mode of the ensemble+shift cell, where all members' absolute
#: calibrated probabilities degrade together under domain shift and
#: the v2 rule (fitted on absolute probabilities) degraded with them.
FEATURE_SPEC = (f"mean,std,max,min,member_probs,votes{VOTE_TOP_MS[0]},"
                f"votes{VOTE_TOP_MS[1]},swv{SWV_TOP_M},swv_norm,"
                f"vote_delta,score_top1,score_mean{SWV_TOP_M},"
                f"score_margin,member_ranks,mean_rank,vote_rank,"
                f"obs_onehot,bias")


def _study_rank(a: np.ndarray) -> np.ndarray:
    """[N, n_obs] -> per-row rank of each column's value, normalized
    to [0, 1] (0 = smallest in the study).  Deterministic under ties
    (stable argsort order)."""
    order = np.argsort(np.argsort(a, axis=1, kind="stable"), axis=1)
    return order.astype(np.float32) / max(a.shape[1] - 1, 1)


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
    out["score_stats"] = np.zeros((n, 3), np.float32)
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
        # retrieval-confidence stats over the swv window: top-1 score,
        # mean, and the top1-mean margin (how peaked the neighbourhood
        # is — a flat neighbourhood makes votes less trustworthy)
        sc = nbr_scores[r, :SWV_TOP_M].astype(np.float32)
        if sc.size:
            out["score_stats"][r] = (sc[0], sc.mean(), sc[0] - sc.mean())
    return out


def build_features(stack: np.ndarray, votes10: np.ndarray,
                   votes20: np.ndarray, swv10: np.ndarray,
                   score_stats: np.ndarray | None = None) -> np.ndarray:
    """[N, n_obs, F] stacker feature tensor.

    ``stack`` [M, N, n_obs]: per-member calibrated probabilities (the
    fused ensemble forward's output; M=1 for a solo expert).
    ``score_stats`` [N, 3]: per-study neighbour score top-1 / mean /
    margin from :func:`neighbour_vote_features` (zeros when absent).
    The column order must match :data:`FEATURE_SPEC` — the fitted
    weights key on it.
    """
    stack = np.asarray(stack, np.float32)
    mean, std = stack.mean(0), stack.std(0)
    mx, mn = stack.max(0), stack.min(0)
    n, n_obs = mean.shape
    if score_stats is None:
        score_stats = np.zeros((n, 3), np.float32)
    score_stats = np.asarray(score_stats, np.float32)
    vote_frac10 = votes10 / float(VOTE_TOP_MS[0])
    # score-normalized vote mass: swv relative to total available
    # score mass in the window (mean score * window).  Falls back to
    # the plain /M normalization when score stats are absent or
    # degenerate (all-zero scores would otherwise blow the feature up
    # and wreck the logistic fit), and clips: a normalized mass > 2
    # carries no extra information.
    mean_score = score_stats[:, 1:2]
    swv_norm = np.where(mean_score > 1e-3,
                        swv10 / np.maximum(mean_score * SWV_TOP_M, 1e-6),
                        swv10 / float(SWV_TOP_M))
    swv_norm = np.clip(swv_norm, 0.0, 2.0)  # [N, n_obs]
    feats = [mean, std, mx, mn]
    feats += [stack[m] for m in range(stack.shape[0])]
    feats += [vote_frac10, votes20 / float(VOTE_TOP_MS[1]),
              swv10 / float(SWV_TOP_M), swv_norm,
              np.abs(mean - vote_frac10)]  # cross-modal disagreement
    feats += [np.broadcast_to(score_stats[:, j:j + 1], mean.shape)
              for j in range(3)]
    # v3 shift-invariant ranks (see FEATURE_SPEC note)
    feats += [_study_rank(stack[m]) for m in range(stack.shape[0])]
    feats += [_study_rank(mean), _study_rank(vote_frac10)]
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
    #: optional per-feature standardization fitted on the fit region
    #: (round-4): makes the rule robust to score/vote SCALE shift —
    #: the round-3 stacker degraded under distribution shift partly
    #: because raw retrieval scores re-scale with image noise.
    feat_mean: np.ndarray | None = None  # [F]
    feat_std: np.ndarray | None = None   # [F]

    @property
    def num_features(self) -> int:
        # mean/std/max/min + M member probs + 5 vote/disagreement
        # features + 3 score stats + (M + 2) rank features + one-hot
        return 4 + self.n_members + 5 + 3 + (self.n_members + 2) \
            + self.n_obs

    def __post_init__(self):
        self.weights = np.asarray(self.weights, np.float64)
        if self.weights.shape != (self.num_features + 1,):
            raise ValueError(
                f"stacker weights shape {self.weights.shape} does not "
                f"match n_members={self.n_members}/n_obs={self.n_obs} "
                f"(expected {(self.num_features + 1,)})")
        for name in ("feat_mean", "feat_std"):
            v = getattr(self, name)
            if v is not None:
                v = np.asarray(v, np.float64)
                if v.shape != (self.num_features,):
                    raise ValueError(
                        f"stacker {name} shape {v.shape} != "
                        f"({self.num_features},)")
                setattr(self, name, v)

    def _standardize(self, flat: np.ndarray) -> np.ndarray:
        if self.feat_mean is None or self.feat_std is None:
            return flat
        return (flat - self.feat_mean) / np.maximum(self.feat_std, 1e-6)

    def keep_probs(self, stack: np.ndarray, votes10: np.ndarray,
                   votes20: np.ndarray, swv10: np.ndarray,
                   score_stats: np.ndarray | None = None) -> np.ndarray:
        """[N, n_obs] keep probability per cell."""
        if stack.shape[0] != self.n_members:
            raise ValueError(
                f"stacker fitted for {self.n_members} ensemble "
                f"member(s), pipeline runs {stack.shape[0]}")
        x = build_features(stack, votes10, votes20, swv10, score_stats)
        flat = self._standardize(x.reshape(-1, x.shape[-1]))
        xb = np.concatenate(
            [flat, np.ones((flat.shape[0], 1), np.float64)], 1)
        z = xb @ self.weights
        return (1.0 / (1.0 + np.exp(-z))).reshape(x.shape[:2])

    def keep_mask(self, stack, votes10, votes20, swv10,
                  score_stats=None) -> np.ndarray:
        """[N, n_obs] bool keep decisions at this stacker's tau.
        ``No Finding`` is always kept (it is not a mention the decoder
        can hallucinate; the veto has the same exemption)."""
        keep = self.keep_probs(stack, votes10, votes20, swv10,
                               score_stats) > self.tau
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
        if self.feat_mean is not None:
            payload["feat_mean"] = [float(v) for v in self.feat_mean]
            payload["feat_std"] = [float(v) for v in self.feat_std]
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
        fm = p.get("feat_mean")
        fs = p.get("feat_std")
        return cls(weights=np.asarray(p["weights"], np.float64),
                   tau=float(p.get("tau", 0.5)),
                   n_members=int(p.get("n_members", 1)),
                   n_obs=int(p.get("n_obs", len(OBSERVATION_NAMES))),
                   meta=p.get("meta", {}),
                   feat_mean=None if fm is None else np.asarray(fm),
                   feat_std=None if fs is None else np.asarray(fs))


def fit_positive_keep_stacker(stack: np.ndarray, labels: np.ndarray,
                              thresholds: np.ndarray,
                              votes10: np.ndarray, votes20: np.ndarray,
                              swv10: np.ndarray, tau: float = 0.5,
                              meta: dict | None = None,
                              min_region_cells: int = 50,
                              score_stats: np.ndarray | None = None
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
    x = build_features(stack, votes10, votes20, swv10, score_stats)
    y = (np.asarray(labels) > 0.5)[region].astype(np.float64)
    xr = x[region].astype(np.float64)
    # standardize on the fit region; the scaler ships with the stacker
    # so serving sees the same normalized space (scale-shift robust)
    fm = xr.mean(0)
    fs = np.maximum(xr.std(0), 1e-6)
    w = fit_logistic(((xr - fm) / fs).astype(np.float32), y)
    return TargetingStacker(weights=w, tau=tau,
                            n_members=stack.shape[0],
                            n_obs=mean.shape[1], meta=meta or {},
                            feat_mean=fm, feat_std=fs)
