"""Cox elastic-net: MLE convergence, sparsity, CV, late-fusion CLI."""

import numpy as np
import pytest

from multimodalbrainsurvival_tpu.ops.coxnet import fit_coxnet


@pytest.fixture(scope="module")
def survival_data():
    rng = np.random.default_rng(0)
    n, p = 200, 4
    X = rng.normal(size=(n, p)).astype(np.float32)
    beta_true = np.array([1.0, -0.5, 0.0, 0.0])
    t = rng.exponential(np.exp(-X @ beta_true)).astype(np.float32)
    e = (rng.uniform(size=n) < 0.8).astype(np.float32)
    return X, t, e, beta_true


def test_path_end_approaches_mle(survival_data):
    import jax.numpy as jnp
    from scipy.optimize import minimize

    from multimodalbrainsurvival_tpu.ops.coxnet import _npll

    X, t, e, _ = survival_data
    fit = fit_coxnet(X, t, e, n_folds=4, n_lambda=30, seed=1)

    def f(b):
        return float(
            _npll(jnp.asarray(b, jnp.float32), jnp.asarray(X), jnp.asarray(t),
                  jnp.asarray(e))
        )

    mle = minimize(f, np.zeros(X.shape[1]), method="Nelder-Mead",
                   options={"maxiter": 5000, "fatol": 1e-10}).x
    assert np.abs(fit.betas_path[-1] - mle).max() < 0.02


def test_signs_and_sparsity(survival_data):
    X, t, e, beta_true = survival_data
    fit = fit_coxnet(X, t, e, n_folds=4, n_lambda=30, seed=1)
    assert fit.beta[0] > 0.3 and fit.beta[1] < -0.1
    assert np.all(np.abs(fit.beta[2:]) < np.abs(fit.beta[0]) / 2)


def test_large_lambda_all_zero(survival_data):
    X, t, e, _ = survival_data
    fit = fit_coxnet(X, t, e, n_folds=3, n_lambda=10, seed=0)
    assert np.allclose(fit.betas_path[0], 0.0, atol=1e-4)  # at lambda_max


def test_predict_is_linear(survival_data):
    X, t, e, _ = survival_data
    fit = fit_coxnet(X, t, e, n_folds=3, n_lambda=10, seed=0)
    p1 = fit.predict(X[:5])
    p2 = fit.predict(X[:5] * 2)
    np.testing.assert_allclose(p2, 2 * p1, rtol=1e-6)


def test_late_fusion_cli(tmp_path, survival_data):
    import pandas as pd

    from multimodalbrainsurvival_tpu.cli.late_fusion import run_late_fusion

    X, t, e, _ = survival_data
    # two informative "unimodal scores"
    for name, sl in (("train", slice(0, 150)), ("val", slice(150, 200))):
        pd.DataFrame(
            {
                "case": [f"c{i}" for i in range(sl.start, sl.stop)],
                "path_score": X[sl, 0],
                "survival_months": t[sl],
                "vital_status": e[sl],
                "rna_score": -X[sl, 1],
            }
        ).to_csv(tmp_path / f"combined_{name}.csv", index=False)
    res = run_late_fusion(
        str(tmp_path / "combined_train.csv"),
        str(tmp_path / "combined_val.csv"),
        str(tmp_path),
    )
    assert (tmp_path / "model_late_train.csv").is_file()
    out = pd.read_csv(tmp_path / "model_late_val.csv")
    assert "score" in out.columns
    assert res["val"]["ci"] > 0.6  # fused score predicts held-out survival
