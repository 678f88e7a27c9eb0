"""Host-side survival / classification metrics.

The reference computes its headline metric — Harrell's concordance index — via
``lifelines.concordance_index`` for Cox scores and
``sksurv.metrics.concordance_index_censored`` for discrete-time risks, after a
per-WSI / per-case mean of the raw model outputs (canonical copy:
``1_HistoPathology/2_HistoPath_train.py:150-280``, duplicated in every driver).
Neither library is a dependency here; this module implements the same
definitions natively in vectorized numpy:

comparable pairs (i, j):
  - ``t_i < t_j`` and ``event_i`` (i's death observed before j's time), or
  - ``t_i == t_j`` and ``event_i`` and ``not event_j`` (the censored sample is
    known to have outlived the death);
  - pairs with both dead at the same time are not comparable.
concordance:
  - 1 if the higher-risk sample is the shorter-lived, 0.5 for risk ties
    (within ``tied_tol``), 0 otherwise.

``concordance_index(times, predicted, events)`` mirrors the lifelines call
signature (``predicted`` = predicted *survival*, i.e. the reference passes
``-score`` at ``2_HistoPath_train.py:207``); ``concordance_index_censored``
mirrors the sksurv signature (direct risks). Both reduce to the same pair
counting.

These run on the host after device eval; O(n²) vectorized over case counts
(hundreds to a few thousand) is negligible next to the forward passes.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from scipy.special import softmax as _scipy_softmax


def _concordance_quadratic(t, r, e, tied_tol):
    ti = t[:, None]
    tj = t[None, :]
    ei = e[:, None]
    ej = e[None, :]
    # i is the known-shorter member of the pair
    comparable = (ei & (ti < tj)) | (ei & ~ej & (ti == tj))

    ri = r[:, None]
    rj = r[None, :]
    tied = np.abs(ri - rj) <= tied_tol
    concordant = comparable & (ri > rj) & ~tied
    tied_pairs = comparable & tied

    num_comparable = comparable.sum()
    if num_comparable == 0:
        return np.nan
    return float((concordant.sum() + 0.5 * tied_pairs.sum()) / num_comparable)


class _Fenwick:
    def __init__(self, n: int):
        self.tree = np.zeros(n + 1, np.int64)
        self.n = n

    def add(self, i: int) -> None:
        i += 1
        while i <= self.n:
            self.tree[i] += 1
            i += i & (-i)

    def prefix(self, i: int) -> int:
        # count of inserted ranks < i
        s = 0
        while i > 0:
            s += self.tree[i]
            i -= i & (-i)
        return int(s)


def _concordance_nlogn(t, r, e, tied_tol):
    """O(n log n) pair counting: ascend unique times; a Fenwick tree over the
    exact risk values holds every sample with a strictly LATER time, so each
    event sample counts its concordant/tied partners in two prefix queries.

    Tie handling matches the quadratic counting's PAIRWISE band
    ``|r_i - r_j| <= tied_tol`` (which is non-transitive): partners are
    counted by searchsorted windows ``(-inf, r_i - tol)`` vs
    ``[r_i - tol, r_i + tol]`` over the exact sorted values — no chained rank
    compression. Same-time event-vs-censored pairs are counted within the
    group the same way. Exactly equal to the quadratic counting (tested,
    including adversarial near-tied chains)."""
    uniq = np.unique(r)  # sorted exact values
    ranks = np.searchsorted(uniq, r)  # exact-value rank per sample

    by_time = np.argsort(t, kind="stable")
    groups: list[np.ndarray] = []
    start = 0
    for k in range(1, len(t) + 1):
        if k == len(t) or t[by_time[k]] != t[by_time[start]]:
            groups.append(by_time[start:k])
            start = k

    bit = _Fenwick(len(uniq))
    inserted = 0
    conc = tied = total = 0
    for g in reversed(groups):
        g_event = g[e[g]]
        g_cens = g[~e[g]]
        # later-time partners (already in the BIT); band boundaries on the
        # exact value axis give the pairwise |ri-rj|<=tol semantics
        for i in g_event:
            lo = int(np.searchsorted(uniq, r[i] - tied_tol, side="left"))
            hi = int(np.searchsorted(uniq, r[i] + tied_tol, side="right"))
            below = bit.prefix(lo)          # count(r_j < r_i - tol)
            at = bit.prefix(hi) - below     # count(|r_j - r_i| <= tol)
            conc += below
            tied += at
            total += inserted
        # same-time: event vs censored
        if len(g_event) and len(g_cens):
            cr = np.sort(r[g_cens])
            for i in g_event:
                lo = np.searchsorted(cr, r[i] - tied_tol, side="left")
                hi = np.searchsorted(cr, r[i] + tied_tol, side="right")
                conc += int(lo)
                tied += int(hi - lo)
                total += len(cr)
        for i in g:
            bit.add(int(ranks[i]))
        inserted += len(g)
    if total == 0:
        return np.nan
    return float((conc + 0.5 * tied) / total)


def _concordance_from_risk(
    times: np.ndarray, risks: np.ndarray, events: np.ndarray, tied_tol: float = 1e-8
) -> float:
    t = np.asarray(times, dtype=np.float64).reshape(-1)
    r = np.asarray(risks, dtype=np.float64).reshape(-1)
    e = np.asarray(events).reshape(-1).astype(bool)
    n = t.shape[0]
    if n < 2:
        return np.nan
    if n <= 2048:  # vectorized O(n²) wins at eval-set sizes
        return _concordance_quadratic(t, r, e, tied_tol)
    return _concordance_nlogn(t, r, e, tied_tol)


def concordance_index_censored(
    events: np.ndarray, times: np.ndarray, risks: np.ndarray, tied_tol: float = 1e-8
) -> float:
    """sksurv-style call: boolean events, times, risk scores (higher = worse)."""
    return _concordance_from_risk(times, risks, events, tied_tol)


def concordance_index(
    times: np.ndarray, predicted: np.ndarray, events: np.ndarray
) -> float:
    """lifelines-style call: ``predicted`` is a predicted survival ordering
    (higher = longer life), so risk = ``-predicted``."""
    return _concordance_from_risk(times, -np.asarray(predicted, np.float64), events)


def _group_mean(values: np.ndarray, ids: list) -> tuple[list, np.ndarray]:
    """Per-id mean of ``values`` (rows), ids returned sorted-unique.

    Mirrors the reference's dict-accumulate-then-mean pattern
    (``2_HistoPath_train.py:185-199``).
    """
    df = pd.DataFrame({"id": list(ids)})
    vals = np.asarray(values)
    if vals.ndim == 1:
        vals = vals[:, None]
    frame = pd.concat([df, pd.DataFrame(vals)], axis=1)
    grouped = frame.groupby("id", sort=True).mean()
    return list(grouped.index), grouped.to_numpy()


def survival_ci(
    outputs: np.ndarray,
    ids: list,
    survival_months: np.ndarray,
    vital_status: np.ndarray,
) -> tuple[float, pd.DataFrame]:
    """Per-id mean Cox score → Harrell C-index + the reference's score frame.

    Parity with ``get_survival_CI`` (``2_HistoPath_train.py:184-209``): scores
    are column 0 of ``outputs``, labels are taken from the last occurrence per
    id (labels are constant per id in practice), frame columns are
    ``id, score, survival_months, vital_status``.
    """
    outputs = np.asarray(outputs)
    scores = outputs[:, 0] if outputs.ndim == 2 else outputs.reshape(-1)
    uids, mean_scores = _group_mean(scores, ids)
    mean_scores = mean_scores[:, 0]
    lookup_m = {i: m for i, m in zip(ids, np.asarray(survival_months).reshape(-1))}
    lookup_v = {i: v for i, v in zip(ids, np.asarray(vital_status).reshape(-1))}
    months = np.array([lookup_m[i] for i in uids])
    status = np.array([lookup_v[i] for i in uids])
    ci = concordance_index(months, -mean_scores, status)
    frame = pd.DataFrame(
        {
            "id": uids,
            "score": mean_scores,
            "survival_months": months,
            "vital_status": status,
        }
    )
    return ci, frame


def classification_scores(
    outputs: np.ndarray, ids: list, labels: np.ndarray
) -> tuple[float, float, float, pd.DataFrame]:
    """Per-id mean logits → softmax → accuracy / F1 / AUC.

    Parity with ``get_classification_scores`` (``2_HistoPath_train.py:150-182``).
    """
    from sklearn.metrics import accuracy_score, f1_score, roc_auc_score

    outputs = np.asarray(outputs)
    n_class = outputs.shape[1]
    uids, mean_scores = _group_mean(outputs, ids)
    probs = _scipy_softmax(mean_scores, axis=1)
    lookup = {i: l for i, l in zip(ids, np.asarray(labels).reshape(-1))}
    label_list = np.array([lookup[i] for i in uids])
    preds = np.argmax(probs, axis=1)

    acc = accuracy_score(label_list, preds)
    if n_class > 2:
        f1 = f1_score(label_list, preds, average="micro")
        auc = -1.0
    else:
        f1 = f1_score(label_list, preds)
        auc = roc_auc_score(label_list, probs[:, 1])

    dic = {"id": uids, "label": label_list}
    dic.update({f"score_{i}": probs[:, i] for i in range(n_class)})
    return acc, f1, auc, pd.DataFrame(dic)


def nllsurv_ci(
    outputs: np.ndarray,
    vital_status: np.ndarray,
    survival_months: np.ndarray,
    ids: list,
    num_classes: int,
) -> tuple[float, pd.DataFrame]:
    """Per-id mean bin logits → risk = -Σ cumprod(1 - sigmoid) → censored CI.

    Parity with ``get_nllsurv_CI`` (``2_HistoPath_train.py:211-280``).
    """
    outputs = np.asarray(outputs)[:, :num_classes]
    uids, mean_logits = _group_mean(outputs, ids)
    lookup_m = {i: m for i, m in zip(ids, np.asarray(survival_months).reshape(-1))}
    lookup_v = {i: v for i, v in zip(ids, np.asarray(vital_status).reshape(-1))}
    months = np.array([lookup_m[i] for i in uids])
    status = np.array([lookup_v[i] for i in uids])

    hazards = 1.0 / (1.0 + np.exp(-mean_logits))
    survival = np.cumprod(1.0 - hazards, axis=-1)
    risk = -survival.sum(axis=-1)

    ci = concordance_index_censored(status.astype(bool), months, risk)
    frame = pd.DataFrame(
        {"id": uids, "score": risk, "survival_months": months, "vital_status": status}
    )
    return ci, frame
