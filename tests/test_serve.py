"""HTTP model server (``cli/serve.py``) over exported artifacts.

Boots the real ``ThreadingHTTPServer`` on a free port and speaks to it with
stdlib ``urllib`` only — the same way a non-Python client would. Oracle:
the in-process ``model.apply`` / ``load_artifact().call`` outputs.
"""

import base64
import json
import threading
import urllib.error
import urllib.request

import numpy as np
import pytest

import jax
import jax.numpy as jnp


@pytest.fixture(scope="module")
def artifacts(tmp_path_factory):
    """One table (RNA) + one MIL artifact, plus their float oracles."""
    from multimodalbrainsurvival_tpu.models import (
        AggregationModel,
        RNAEncoder,
        RNAOnlyModel,
        make_aggregator,
        resnet18,
    )
    from multimodalbrainsurvival_tpu.models.folding import (
        fold_resnet_variables,
    )
    from multimodalbrainsurvival_tpu.serving import (
        export_mil_artifact,
        export_table_artifact,
    )

    root = tmp_path_factory.mktemp("artifacts")
    rna = RNAOnlyModel(encoder=RNAEncoder(hidden_dims=(16, 8), dropout=0.0))
    rna_v = rna.init(jax.random.PRNGKey(0), jnp.zeros((1, 12)), train=False)
    export_table_artifact(rna, rna_v, str(root / "rna"), in_features=12,
                          kind="rna_serving")

    def mil_model(fold_bn):
        return AggregationModel(
            resnet=resnet18(fold_bn=fold_bn),
            aggregator=make_aggregator("attention", dim=512, hdim=16),
            aggregator_dim=512,
        )

    v = mil_model(False).init(
        jax.random.PRNGKey(1), jnp.zeros((1, 1, 16, 16, 3)), train=False
    )
    folded = fold_resnet_variables(v)
    export_mil_artifact(mil_model(True), folded, str(root / "mil"),
                        img_size=16, arch="resnet18")
    return {"root": root, "rna": rna, "rna_v": rna_v}


@pytest.fixture(scope="module")
def server(artifacts):
    from multimodalbrainsurvival_tpu.cli.serve import build_server

    root = artifacts["root"]
    srv = build_server([
        "--artifact", str(root / "rna"),
        "--artifact", f"tiles={root / 'mil'}",
        "--port", "0", "--buckets", "4,8", "--quiet", "1",
    ])
    thread = threading.Thread(target=srv.serve_forever, daemon=True)
    thread.start()
    yield f"http://{srv.server_address[0]}:{srv.server_address[1]}"
    srv.shutdown()
    srv.server_close()


def _get(url):
    try:
        with urllib.request.urlopen(url, timeout=30) as r:
            return r.status, json.loads(r.read())
    except urllib.error.HTTPError as err:
        return err.code, json.loads(err.read())


def _post(url, payload):
    req = urllib.request.Request(
        url, data=json.dumps(payload).encode(),
        headers={"Content-Type": "application/json"}, method="POST",
    )
    try:
        with urllib.request.urlopen(req, timeout=120) as r:
            return r.status, json.loads(r.read())
    except urllib.error.HTTPError as err:
        return err.code, json.loads(err.read())


def test_health_and_model_listing(server):
    code, health = _get(f"{server}/healthz")
    assert code == 200 and health["status"] == "ok"
    assert set(health["models"]) == {"rna", "tiles"}

    code, models = _get(f"{server}/v1/models")
    assert code == 200
    assert models["rna"]["kind"] == "rna_serving"
    assert models["tiles"]["kind"] == "mil_serving"
    assert "calling_convention" in models["tiles"]

    code, err = _get(f"{server}/nope")
    assert code == 404 and "unknown path" in err["error"]


def test_table_scoring_matches_model(server, artifacts):
    rng = np.random.default_rng(2)
    x = rng.normal(size=(3, 12)).astype(np.float32)
    code, out = _post(f"{server}/v1/models/rna/score",
                      {"data": x.tolist()})
    assert code == 200
    want = np.asarray(artifacts["rna"].apply(
        artifacts["rna_v"], jnp.asarray(x), train=False))
    # bucketing pads 3 -> 4 and slices back: exactly 3 rows, same values
    got = np.asarray(out["scores"])
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)
    assert np.asarray(out["embedding"]).shape == (3, 8)
    assert out["latency_ms"] > 0


def test_mil_scoring_b64_roundtrip(server, artifacts):
    from multimodalbrainsurvival_tpu.serving import load_artifact

    rng = np.random.default_rng(3)
    x = rng.integers(0, 255, (2, 3, 16, 16, 3), dtype=np.uint8)
    mask = np.ones((2, 3), np.float32)
    mask[1, -1] = 0.0
    code, out = _post(f"{server}/v1/models/tiles/score", {
        "patch_bag": {"b64": base64.b64encode(x.tobytes()).decode(),
                      "shape": list(x.shape), "dtype": "uint8"},
        "bag_mask": mask.tolist(),
        "encoding": "b64",
    })
    assert code == 200
    art = load_artifact(str(artifacts["root"] / "mil"))
    want = art.call(jnp.asarray(x), jnp.asarray(mask))
    for key in ("scores", "embedding"):
        spec = out[key]
        got = np.frombuffer(base64.b64decode(spec["b64"]),
                            dtype=np.dtype(spec["dtype"])
                            ).reshape(spec["shape"])
        np.testing.assert_allclose(got, np.asarray(want[key]),
                                   rtol=1e-4, atol=1e-5)


def test_request_validation_errors(server):
    url = f"{server}/v1/models/rna/score"
    code, err = _post(f"{server}/v1/models/ghost/score", {"data": [[0.0]]})
    assert code == 404 and "unknown model" in err["error"]

    code, err = _post(url, {"wrong": [[0.0] * 12]})
    assert code == 400 and "missing argument 'data'" in err["error"]

    code, err = _post(url, {"data": [0.0] * 12})  # 1-D: wrong rank
    assert code == 400 and "expected 2 dims" in err["error"]

    code, err = _post(url, {"data": [[0.0] * 5]})  # wrong feature width
    assert code == 400 and "dim 1 must be 12" in err["error"]

    code, err = _post(url, {"data": [["x"] * 12]})
    assert code == 400

    # floats cannot silently feed the uint8 patch tensor
    code, err = _post(f"{server}/v1/models/tiles/score", {
        "patch_bag": np.zeros((1, 1, 16, 16, 3), np.float32).tolist(),
        "bag_mask": [[1.0]],
    })
    assert code == 400 and "does not cast" in err["error"]

    # out-of-range ints for uint8 are rejected, not wrapped
    bad = np.full((1, 1, 16, 16, 3), 300, np.int64)
    code, err = _post(f"{server}/v1/models/tiles/score", {
        "patch_bag": bad.tolist(), "bag_mask": [[1.0]],
    })
    assert code == 400 and "out of range" in err["error"]

    code, err = _post(url, {"data": []})
    assert code == 400


def test_bucket_padding_is_invisible(server, artifacts):
    """B=5 pads to bucket 8; rows must equal the unpadded B=5 oracle."""
    rng = np.random.default_rng(4)
    x = rng.normal(size=(5, 12)).astype(np.float32)
    code, out = _post(f"{server}/v1/models/rna/score", {"data": x.tolist()})
    assert code == 200
    want = np.asarray(artifacts["rna"].apply(
        artifacts["rna_v"], jnp.asarray(x), train=False))
    np.testing.assert_allclose(np.asarray(out["scores"]), want,
                               rtol=1e-4, atol=1e-5)
