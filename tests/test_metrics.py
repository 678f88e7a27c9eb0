"""C-index + per-id aggregation metrics: hand-computed and property tests."""

import numpy as np
import pandas as pd

from multimodalbrainsurvival_tpu.ops.metrics import (
    classification_scores,
    concordance_index,
    concordance_index_censored,
    nllsurv_ci,
    survival_ci,
)


def test_ci_perfect_ordering():
    times = np.array([1.0, 2.0, 3.0, 4.0])
    events = np.ones(4)
    risks = np.array([4.0, 3.0, 2.0, 1.0])  # shortest-lived has highest risk
    assert concordance_index_censored(events.astype(bool), times, risks) == 1.0


def test_ci_reversed_ordering():
    times = np.array([1.0, 2.0, 3.0, 4.0])
    events = np.ones(4)
    risks = np.array([1.0, 2.0, 3.0, 4.0])
    assert concordance_index_censored(events.astype(bool), times, risks) == 0.0


def test_ci_random_is_half():
    times = np.array([1.0, 2.0, 3.0, 4.0])
    events = np.ones(4)
    risks = np.zeros(4)  # all tied → 0.5 each
    assert concordance_index_censored(events.astype(bool), times, risks) == 0.5


def test_ci_hand_computed_with_censoring():
    # t: 2(dead), 3(censored), 5(dead); risks 3, 1, 2
    # comparable pairs: (0,1), (0,2), and NOT (2,1) since t2 > t1.
    # (0,1): r0=3 > r1=1 concordant; (0,2): 3 > 2 concordant → CI = 1.0
    times = np.array([2.0, 3.0, 5.0])
    events = np.array([1, 0, 1])
    risks = np.array([3.0, 1.0, 2.0])
    assert concordance_index_censored(events.astype(bool), times, risks) == 1.0
    # flip one pair: risks 1, 3, 2 → (0,1): 1<3 discordant; (0,2): 1<2 discordant
    assert (
        concordance_index_censored(events.astype(bool), times, np.array([1.0, 3.0, 2.0]))
        == 0.0
    )


def test_ci_tied_time_death_vs_censor():
    # same time, one dead one censored: censored outlived → comparable
    times = np.array([2.0, 2.0])
    events = np.array([1, 0])
    assert concordance_index_censored(events.astype(bool), times, np.array([5.0, 1.0])) == 1.0
    # both dead at same time: not comparable → nan
    assert np.isnan(
        concordance_index_censored(np.array([True, True]), times, np.array([5.0, 1.0]))
    )


def test_nlogn_ci_matches_quadratic():
    """The O(n log n) counting (used for n > 2048) equals the O(n²) oracle,
    including heavy time- and risk-ties."""
    from multimodalbrainsurvival_tpu.ops.metrics import (
        _concordance_nlogn,
        _concordance_quadratic,
    )

    rng = np.random.default_rng(1)
    for _ in range(10):
        n = int(rng.integers(5, 300))
        times = rng.choice(rng.uniform(1, 50, size=max(2, n // 3)), size=n)
        risks = np.round(rng.normal(size=n), 1)
        events = rng.uniform(size=n) < 0.6
        a = _concordance_quadratic(times, risks, events, 1e-8)
        b = _concordance_nlogn(times, risks, events, 1e-8)
        assert (np.isnan(a) and np.isnan(b)) or np.isclose(a, b)


def test_large_cohort_ci_uses_fast_path():
    rng = np.random.default_rng(2)
    n = 5000
    times = rng.uniform(1, 100, n)
    risks = -times + rng.normal(size=n) * 5  # strong signal
    events = np.ones(n)
    ci = concordance_index_censored(events.astype(bool), times, risks)
    assert ci > 0.9


def test_lifelines_style_wrapper_direction():
    times = np.array([1.0, 2.0, 3.0, 4.0])
    events = np.ones(4)
    predicted = times.copy()  # predicting longer survival for longer-lived
    assert concordance_index(times, predicted, events) == 1.0


def test_survival_ci_per_id_mean():
    # two rows per case; per-case mean must be used
    outputs = np.array([[1.0], [3.0], [10.0], [20.0]])
    ids = ["a", "a", "b", "b"]
    months = np.array([50.0, 50.0, 5.0, 5.0])
    status = np.array([1.0, 1.0, 1.0, 1.0])
    ci, frame = survival_ci(outputs, ids, months, status)
    assert ci == 1.0  # b (risk 15) dies earlier than a (risk 2)
    assert list(frame["id"]) == ["a", "b"]
    np.testing.assert_allclose(frame["score"].to_numpy(), [2.0, 15.0])
    assert set(frame.columns) == {"id", "score", "survival_months", "vital_status"}


def test_classification_scores_shapes():
    rng = np.random.default_rng(0)
    outputs = rng.normal(size=(20, 2))
    ids = [f"c{i//2}" for i in range(20)]
    labels = np.array([(i // 2) % 2 for i in range(20)])
    acc, f1, auc, frame = classification_scores(outputs, ids, labels)
    assert 0 <= acc <= 1 and 0 <= f1 <= 1
    assert {"id", "label", "score_0", "score_1"} <= set(frame.columns)
    # softmax rows sum to 1
    np.testing.assert_allclose(
        frame[["score_0", "score_1"]].to_numpy().sum(1), 1.0, rtol=1e-6
    )


def test_nllsurv_ci_risk_direction():
    # logits strongly negative → hazards ~0 → survival ~1 → risk ~ -K (low risk)
    # logits strongly positive → risk ~ 0 (high risk)
    outputs = np.array([[8.0, 8.0], [-8.0, -8.0]])
    ids = ["dead_fast", "alive_long"]
    months = np.array([2.0, 100.0])
    status = np.array([1.0, 1.0])
    ci, frame = nllsurv_ci(outputs, status, months, ids, num_classes=2)
    assert ci == 1.0
    assert frame.loc[frame["id"] == "dead_fast", "score"].item() > frame.loc[
        frame["id"] == "alive_long", "score"
    ].item()


def test_nlogn_ci_pairwise_tie_band():
    """Non-transitive near-tied chains: nlogn must use the pairwise
    |ri - rj| <= tol band, not chained rank compression."""
    from multimodalbrainsurvival_tpu.ops.metrics import (
        _concordance_nlogn,
        _concordance_quadratic,
    )

    risks = np.array([0.0, 0.6e-8, 1.2e-8])
    times = np.array([1.0, 2.0, 3.0])
    events = np.ones(3, bool)
    a = _concordance_quadratic(times, risks, events, 1e-8)
    b = _concordance_nlogn(times, risks, events, 1e-8)
    assert np.isclose(a, b)
    rng = np.random.default_rng(3)
    for _ in range(8):
        n = int(rng.integers(5, 150))
        t = rng.choice(rng.uniform(1, 50, size=max(2, n // 3)), size=n)
        r = rng.integers(0, 15, size=n) * 0.7e-8  # dense sub-tolerance gaps
        e = rng.uniform(size=n) < 0.6
        x = _concordance_quadratic(t, r, e, 1e-8)
        y = _concordance_nlogn(t, r, e, 1e-8)
        assert (np.isnan(x) and np.isnan(y)) or np.isclose(x, y)
