"""Metric library.

Covers the reference's full metric vocabulary with *real* implementations:

- multi-label classification: macro/micro precision/recall/F1,
  specificity, per-class AUC-ROC and average precision
  (reference ``train_expert_models.py:202-228``,
  ``evaluate_expert_models.py:144-222``)
- calibration: expected calibration error, uncertainty quality
  (reference ``modeling_expert_model_uncertainty.py:195-256``)
- retrieval: MRR, precision@k, recall@k, nDCG@k, accuracy@k
  (reference ``evaluate_retrieval_system.py:137-188`` — where the
  reference computes these then discards them for hard-coded constants,
  SURVEY.md §0.2.2; here they are the real outputs)
- text: BLEU-n and ROUGE-L for report generation.

Array metrics are pure jnp and jittable; text metrics are host-side.
"""

from __future__ import annotations

import math
from collections import Counter

import jax.numpy as jnp
import numpy as np

# --------------------------------------------------------------------------
# Multi-label classification
# --------------------------------------------------------------------------


def multilabel_counts(preds: jnp.ndarray, labels: jnp.ndarray):
    """Per-class TP/FP/FN/TN from {0,1} predictions. Shapes [B, C]."""
    preds = preds.astype(jnp.float32)
    labels = labels.astype(jnp.float32)
    tp = jnp.sum(preds * labels, axis=0)
    fp = jnp.sum(preds * (1 - labels), axis=0)
    fn = jnp.sum((1 - preds) * labels, axis=0)
    tn = jnp.sum((1 - preds) * (1 - labels), axis=0)
    return tp, fp, fn, tn


def f1_scores(preds: jnp.ndarray, labels: jnp.ndarray, eps: float = 1e-8):
    """Macro/micro P/R/F1 + per-class F1 + specificity. Jittable."""
    tp, fp, fn, tn = multilabel_counts(preds, labels)
    precision = tp / (tp + fp + eps)
    recall = tp / (tp + fn + eps)
    f1 = 2 * precision * recall / (precision + recall + eps)
    specificity = tn / (tn + fp + eps)
    micro_p = jnp.sum(tp) / (jnp.sum(tp) + jnp.sum(fp) + eps)
    micro_r = jnp.sum(tp) / (jnp.sum(tp) + jnp.sum(fn) + eps)
    micro_f1 = 2 * micro_p * micro_r / (micro_p + micro_r + eps)
    return {
        "macro_precision": jnp.mean(precision),
        "macro_recall": jnp.mean(recall),
        "macro_f1": jnp.mean(f1),
        "micro_precision": micro_p,
        "micro_recall": micro_r,
        "micro_f1": micro_f1,
        "macro_specificity": jnp.mean(specificity),
        "per_class_f1": f1,
        "per_class_precision": precision,
        "per_class_recall": recall,
    }


def auc_roc(scores: np.ndarray, labels: np.ndarray) -> np.ndarray:
    """Per-class AUC-ROC via the rank statistic (ties averaged).

    Host-side numpy; classes with a single label value return NaN.
    ``scores``/``labels``: [B, C].
    """
    scores = np.asarray(scores, np.float64)
    labels = np.asarray(labels, np.float64)
    out = np.full(scores.shape[1], np.nan)
    for c in range(scores.shape[1]):
        y, s = labels[:, c], scores[:, c]
        pos, neg = y.sum(), (1 - y).sum()
        if pos == 0 or neg == 0:
            continue
        order = np.argsort(s, kind="mergesort")
        ranks = np.empty_like(order, dtype=np.float64)
        ranks[order] = np.arange(1, len(s) + 1)
        # average ranks over ties
        sorted_s = s[order]
        i = 0
        while i < len(s):
            j = i
            while j + 1 < len(s) and sorted_s[j + 1] == sorted_s[i]:
                j += 1
            if j > i:
                avg = ranks[order[i:j + 1]].mean()
                ranks[order[i:j + 1]] = avg
            i = j + 1
        out[c] = (ranks[y == 1].sum() - pos * (pos + 1) / 2) / (pos * neg)
    return out


def average_precision(scores: np.ndarray, labels: np.ndarray) -> np.ndarray:
    """Per-class average precision (area under the PR curve)."""
    scores = np.asarray(scores, np.float64)
    labels = np.asarray(labels, np.float64)
    out = np.full(scores.shape[1], np.nan)
    for c in range(scores.shape[1]):
        y, s = labels[:, c], scores[:, c]
        npos = int(y.sum())
        if npos == 0:
            continue
        order = np.argsort(-s, kind="mergesort")
        y_sorted = y[order]
        tp_cum = np.cumsum(y_sorted)
        prec = tp_cum / np.arange(1, len(y) + 1)
        out[c] = float((prec * y_sorted).sum() / npos)
    return out


# --------------------------------------------------------------------------
# Calibration / uncertainty
# --------------------------------------------------------------------------


def expected_calibration_error(probs: jnp.ndarray, labels: jnp.ndarray,
                               num_bins: int = 10) -> jnp.ndarray:
    """ECE with uniform confidence bins, jittable.

    Probabilities and binary labels are flattened (multi-label treated
    per-(sample, class) as in the reference,
    ``modeling_expert_model_uncertainty.py:195-232``).
    """
    probs = probs.reshape(-1).astype(jnp.float32)
    labels = labels.reshape(-1).astype(jnp.float32)
    confidence = jnp.maximum(probs, 1.0 - probs)
    predicted = (probs > 0.5).astype(jnp.float32)
    correct = (predicted == labels).astype(jnp.float32)
    edges = jnp.linspace(0.0, 1.0, num_bins + 1)
    n = probs.shape[0]
    ece = 0.0
    for b in range(num_bins):
        lo, hi = edges[b], edges[b + 1]
        in_bin = (confidence > lo) & (confidence <= hi)
        prop = jnp.mean(in_bin.astype(jnp.float32))
        acc = jnp.sum(correct * in_bin) / jnp.maximum(jnp.sum(in_bin), 1.0)
        conf = jnp.sum(confidence * in_bin) / jnp.maximum(jnp.sum(in_bin), 1.0)
        ece = ece + prop * jnp.abs(acc - conf)
    del n
    return ece


def uncertainty_quality(uncertainty: jnp.ndarray, probs: jnp.ndarray,
                        labels: jnp.ndarray) -> dict:
    """Pearson correlation between predictive uncertainty and error,
    plus mean uncertainty of correct vs incorrect predictions
    (reference ``modeling_expert_model_uncertainty.py:234-256``)."""
    u = uncertainty.reshape(-1).astype(jnp.float32)
    p = probs.reshape(-1).astype(jnp.float32)
    y = labels.reshape(-1).astype(jnp.float32)
    err = jnp.abs(p - y)
    um, em = jnp.mean(u), jnp.mean(err)
    cov = jnp.mean((u - um) * (err - em))
    corr = cov / (jnp.std(u) * jnp.std(err) + 1e-8)
    correct = ((p > 0.5).astype(jnp.float32) == y).astype(jnp.float32)
    u_correct = jnp.sum(u * correct) / jnp.maximum(jnp.sum(correct), 1.0)
    u_wrong = jnp.sum(u * (1 - correct)) / jnp.maximum(
        jnp.sum(1 - correct), 1.0)
    return {
        "uncertainty_error_correlation": corr,
        "mean_uncertainty_correct": u_correct,
        "mean_uncertainty_incorrect": u_wrong,
    }


# --------------------------------------------------------------------------
# Retrieval metrics
# --------------------------------------------------------------------------


def reciprocal_rank(retrieved_ids: np.ndarray, relevant: set[int]) -> float:
    for rank, rid in enumerate(np.asarray(retrieved_ids).tolist(), start=1):
        if rid in relevant:
            return 1.0 / rank
    return 0.0


def precision_at_k(retrieved_ids, relevant: set[int], k: int) -> float:
    top = list(np.asarray(retrieved_ids).tolist())[:k]
    if not top:
        return 0.0
    return sum(1 for r in top if r in relevant) / k


def recall_at_k(retrieved_ids, relevant: set[int], k: int) -> float:
    if not relevant:
        return 0.0
    top = list(np.asarray(retrieved_ids).tolist())[:k]
    return sum(1 for r in top if r in relevant) / len(relevant)


def ndcg_at_k(retrieved_ids, relevant: set[int], k: int) -> float:
    top = list(np.asarray(retrieved_ids).tolist())[:k]
    dcg = sum(1.0 / math.log2(i + 2) for i, r in enumerate(top)
              if r in relevant)
    ideal = sum(1.0 / math.log2(i + 2)
                for i in range(min(len(relevant), k)))
    return dcg / ideal if ideal > 0 else 0.0


def accuracy_at_k(retrieved_ids, relevant: set[int], k: int) -> float:
    top = list(np.asarray(retrieved_ids).tolist())[:k]
    return 1.0 if any(r in relevant for r in top) else 0.0


def retrieval_report(all_retrieved: list, all_relevant: list[set],
                     ks: tuple[int, ...] = (5, 10)) -> dict:
    """Aggregate retrieval metrics over a query set."""
    out = {"mean_reciprocal_rank": float(np.mean(
        [reciprocal_rank(r, rel)
         for r, rel in zip(all_retrieved, all_relevant)]))}
    for k in ks:
        out[f"retrieval_accuracy@{k}"] = float(np.mean(
            [accuracy_at_k(r, rel, k)
             for r, rel in zip(all_retrieved, all_relevant)]))
        out[f"precision@{k}"] = float(np.mean(
            [precision_at_k(r, rel, k)
             for r, rel in zip(all_retrieved, all_relevant)]))
        out[f"recall@{k}"] = float(np.mean(
            [recall_at_k(r, rel, k)
             for r, rel in zip(all_retrieved, all_relevant)]))
        out[f"ndcg@{k}"] = float(np.mean(
            [ndcg_at_k(r, rel, k)
             for r, rel in zip(all_retrieved, all_relevant)]))
    return out


# --------------------------------------------------------------------------
# Text generation metrics (host-side)
# --------------------------------------------------------------------------


def _ngrams(tokens: list[str], n: int) -> Counter:
    return Counter(tuple(tokens[i:i + n]) for i in range(len(tokens) - n + 1))


def bleu(candidate: str, references: list[str], max_n: int = 4) -> float:
    """Corpus-style BLEU-n for a single candidate with brevity penalty."""
    cand = candidate.lower().split()
    refs = [r.lower().split() for r in references]
    if not cand or not refs:
        return 0.0
    log_precisions = []
    for n in range(1, max_n + 1):
        cand_ng = _ngrams(cand, n)
        if not cand_ng:
            return 0.0
        max_ref = Counter()
        for r in refs:
            for ng, c in _ngrams(r, n).items():
                max_ref[ng] = max(max_ref[ng], c)
        clipped = sum(min(c, max_ref[ng]) for ng, c in cand_ng.items())
        total = sum(cand_ng.values())
        p = clipped / total
        if p == 0:
            # smoothed (method 1): tiny epsilon instead of zeroing BLEU
            p = 1.0 / (2 * total)
        log_precisions.append(math.log(p))
    ref_len = min(refs, key=lambda r: abs(len(r) - len(cand)))
    bp = 1.0 if len(cand) >= len(ref_len) else math.exp(
        1 - len(ref_len) / max(len(cand), 1))
    return bp * math.exp(sum(log_precisions) / max_n)


def rouge_l(candidate: str, reference: str) -> float:
    """ROUGE-L F1 via longest common subsequence."""
    a = candidate.lower().split()
    b = reference.lower().split()
    if not a or not b:
        return 0.0
    dp = [[0] * (len(b) + 1) for _ in range(len(a) + 1)]
    for i in range(1, len(a) + 1):
        for j in range(1, len(b) + 1):
            if a[i - 1] == b[j - 1]:
                dp[i][j] = dp[i - 1][j - 1] + 1
            else:
                dp[i][j] = max(dp[i - 1][j], dp[i][j - 1])
    lcs = dp[-1][-1]
    prec = lcs / len(a)
    rec = lcs / len(b)
    if prec + rec == 0:
        return 0.0
    return 2 * prec * rec / (prec + rec)
