"""HTTP model server over exported serving artifacts (``mmbs-serve``).

The reference's "deployment" is re-running its savescore scripts — load the
``.pt`` plus the Python model code, loop a DataLoader, write a CSV
(``3_HistoPath_savescore.py:228-349``). This serves the same trained models
as a long-lived process instead: one command turns any artifact directory
written by ``mmbs-export-model`` (self-contained StableHLO, weights baked
in, symbolic batch/bag dims — ``serving.py``) into a JSON-over-HTTP scoring
endpoint. Stdlib ``http.server`` + numpy only — no web framework, no model
code, usable from any language.

Endpoints:

- ``GET /healthz`` — liveness + per-model readiness (responds during a
  long first-compile; device calls hold a lock, health does not).
- ``GET /v1/models`` — every loaded artifact's ``meta.json`` (calling
  convention, platforms, quantization, export config).
- ``POST /v1/models/<name>/score`` — body keys match the artifact's
  calling convention (``meta["calling_convention"]["args"]``), e.g.
  ``{"data": [[...]]}`` for a table artifact or
  ``{"patch_bag": {"b64": ..., "shape": ..., "dtype": "uint8"},
  "bag_mask": [[1.0, ...]]}`` for MIL. Arrays are nested JSON lists or a
  ``{"b64", "shape", "dtype"}`` object (raw little-endian bytes,
  base64-encoded — the fast path for image batches). Returns the
  artifact's outputs (``scores`` / ``embedding`` / ``attention``) as JSON
  lists, or base64 objects with ``"encoding": "b64"`` in the request.

Batch shapes: artifacts are shape-polymorphic, but each DISTINCT concrete
batch shape compiles once on first use. ``--buckets 1,8,32`` pads every
request's batch up to the next bucket (rows replicated from the last real
row — row-independent by construction, outputs sliced back), bounding the
set of compiled shapes a production mix of request sizes can trigger.
``--warmup`` pre-compiles each model at the smallest bucket at startup so
the first request is fast.
"""

from __future__ import annotations

import argparse
import base64
import json
import os
import re
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import numpy as np

MAX_BODY_BYTES = 1 << 30


def _parse_convention(meta: dict) -> list:
    """``meta["calling_convention"]["args"]`` strings → [(name, dtype,
    dims)] where dims entries are ints (fixed) or None (symbolic).

    The export side writes e.g. ``"patch_bag uint8 (b, g, 224, 224, 3)"``
    (``serving.py::export_mil_artifact``); this is the single source of
    truth for request validation, shared by every artifact kind.
    """
    args = []
    for spec in meta["calling_convention"]["args"]:
        m = re.match(r"(\w+)\s+(\w+)\s+\(([^)]*)\)", spec)
        if not m:
            raise ValueError(f"unparseable calling-convention arg: {spec!r}")
        name, dtype, dims_s = m.groups()
        dims = []
        for d in dims_s.split(","):
            d = d.strip()
            dims.append(int(d) if d.isdigit() else None)
        args.append((name, np.dtype(dtype), dims))
    return args


class _Model:
    """One loaded artifact + its parsed calling convention and call lock
    (JAX dispatch is not reentrant-safe across server threads)."""

    def __init__(self, name: str, path: str):
        from multimodalbrainsurvival_tpu.serving import load_artifact

        self.name = name
        self.path = path
        self.serving = load_artifact(path)
        self.meta = self.serving.meta
        self.args = _parse_convention(self.meta)
        self.lock = threading.Lock()
        self.n_requests = 0

    def decode_arg(self, body: dict, name: str, dtype: np.dtype,
                   dims: list) -> np.ndarray:
        if name not in body:
            raise _BadRequest(f"missing argument {name!r} "
                              f"(expects {[a[0] for a in self.args]})")
        spec = body[name]
        if isinstance(spec, dict):
            try:
                raw = base64.b64decode(spec["b64"], validate=True)
                arr = np.frombuffer(raw, dtype=np.dtype(spec["dtype"]))
                arr = arr.reshape(spec["shape"])
            except (KeyError, ValueError, TypeError) as err:
                raise _BadRequest(f"{name}: bad b64 array object ({err})")
        else:
            try:
                arr = np.asarray(spec)
            except (ValueError, TypeError) as err:
                raise _BadRequest(f"{name}: not an array ({err})")
        if arr.ndim != len(dims):
            raise _BadRequest(f"{name}: expected {len(dims)} dims "
                              f"{_dims_str(dims)}, got shape {arr.shape}")
        for ax, d in enumerate(dims):
            if d is not None and arr.shape[ax] != d:
                raise _BadRequest(f"{name}: dim {ax} must be {d} "
                                  f"(got {arr.shape[ax]})")
        # JSON numbers arrive as int64/float64: any integer kind may feed
        # an integer or float arg (uint8 patches as plain lists), floats
        # may only feed floats
        if not (arr.dtype == dtype
                or (arr.dtype.kind in "iu" and dtype.kind in "iuf")
                or (arr.dtype.kind == "f" and dtype.kind == "f")):
            raise _BadRequest(f"{name}: dtype {arr.dtype} does not cast "
                              f"to {dtype}")
        if arr.dtype.kind in "iu" and dtype.kind in "iu" and arr.size and (
            arr.min() < np.iinfo(dtype).min or arr.max() > np.iinfo(dtype).max
        ):
            raise _BadRequest(f"{name}: values out of range for {dtype}")
        return np.ascontiguousarray(arr, dtype=dtype)

    def call(self, body: dict, buckets: list) -> dict:
        arrays = [self.decode_arg(body, n, dt, dims)
                  for n, dt, dims in self.args]
        batches = {a.shape[0] for a in arrays}
        if len(batches) != 1:
            got = {spec[0]: arr.shape[0]
                   for spec, arr in zip(self.args, arrays)}
            raise _BadRequest(f"inconsistent batch dims: {got}")
        (b,) = batches
        if b == 0:
            raise _BadRequest("empty batch")
        padded = _next_bucket(b, buckets)
        if padded > b:
            arrays = [np.concatenate(
                [a, np.repeat(a[-1:], padded - b, axis=0)], axis=0)
                for a in arrays]
        with self.lock:
            out = self.serving.call(*arrays)
            out = {k: np.asarray(v)[:b] for k, v in out.items()}
            self.n_requests += 1
        return out


def _dims_str(dims: list) -> str:
    return "(" + ", ".join("?" if d is None else str(d) for d in dims) + ")"


def _next_bucket(b: int, buckets: list) -> int:
    for cap in buckets:
        if b <= cap:
            return cap
    return b  # beyond the largest bucket: serve at the exact size


class _BadRequest(Exception):
    pass


def _encode_outputs(out: dict, encoding: str) -> dict:
    if encoding == "b64":
        return {
            k: {"b64": base64.b64encode(
                    np.ascontiguousarray(v).tobytes()).decode("ascii"),
                "shape": list(v.shape), "dtype": str(v.dtype)}
            for k, v in out.items()
        }
    return {k: np.asarray(v).tolist() for k, v in out.items()}


class _Handler(BaseHTTPRequestHandler):
    # set by build_server:
    models: dict = {}
    buckets: list = []
    quiet: bool = False

    protocol_version = "HTTP/1.1"

    def log_message(self, fmt, *args):  # route through our own line format
        if not self.quiet:
            print(f"serve: {self.address_string()} {fmt % args}")

    def _send_json(self, code: int, payload: dict) -> None:
        body = json.dumps(payload).encode()
        self.send_response(code)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def do_GET(self):  # noqa: N802 (http.server API)
        if self.path == "/healthz":
            self._send_json(200, {
                "status": "ok",
                "models": {n: {"kind": m.meta.get("kind"),
                               "quantize": m.meta.get("quantize", ""),
                               "requests": m.n_requests}
                           for n, m in self.models.items()},
            })
        elif self.path == "/v1/models":
            self._send_json(200, {n: m.meta
                                  for n, m in self.models.items()})
        else:
            self._send_json(404, {"error": f"unknown path {self.path}"})

    def do_POST(self):  # noqa: N802
        m = re.match(r"^/v1/models/([\w.-]+)/score$", self.path)
        if not m:
            self._send_json(404, {"error": f"unknown path {self.path} "
                                  "(POST /v1/models/<name>/score)"})
            return
        model = self.models.get(m.group(1))
        if model is None:
            self._send_json(404, {"error": f"unknown model {m.group(1)!r} "
                                  f"(loaded: {sorted(self.models)})"})
            return
        try:
            length = int(self.headers.get("Content-Length", 0))
            if length <= 0 or length > MAX_BODY_BYTES:
                raise _BadRequest(f"Content-Length {length} out of range")
            body = json.loads(self.rfile.read(length))
            if not isinstance(body, dict):
                raise _BadRequest("body must be a JSON object")
            t0 = time.monotonic()
            out = model.call(body, self.buckets)
            ms = (time.monotonic() - t0) * 1e3
            payload = _encode_outputs(out, body.get("encoding", "json"))
            payload["latency_ms"] = round(ms, 3)
            self._send_json(200, payload)
        except _BadRequest as err:
            self._send_json(400, {"error": str(err)})
        except json.JSONDecodeError as err:
            self._send_json(400, {"error": f"bad JSON body: {err}"})
        except Exception as err:  # the server must survive any model error
            self._send_json(500, {"error": f"{type(err).__name__}: {err}"})


def _warmup(model: _Model, buckets: list) -> None:
    """Compile the smallest-bucket shape before serving. Symbolic dims
    become the smallest bucket (batch) or 1 (bag); mask-like float args
    are ones so padded positions look real."""
    b = buckets[0] if buckets else 1
    arrays = []
    for name, dtype, dims in model.args:
        shape = [b if ax == 0 else (d if d is not None else 1)
                 for ax, d in enumerate(dims)]
        fill = (np.ones if ("mask" in name or dtype.kind == "f")
                else np.zeros)
        arrays.append(fill(shape, dtype=dtype))
    with model.lock:
        model.serving.call(*arrays)


def build_server(argv=None) -> ThreadingHTTPServer:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--artifact", action="append", required=True,
                   metavar="[NAME=]DIR",
                   help="artifact directory from mmbs-export-model; "
                        "repeatable. NAME defaults to the directory "
                        "basename.")
    p.add_argument("--host", default="127.0.0.1")
    p.add_argument("--port", type=int, default=8000,
                   help="0 = pick a free port (printed at startup)")
    p.add_argument("--buckets", default="",
                   help="comma-separated batch buckets (e.g. 1,8,32): pad "
                        "each request's batch up to the next bucket so the "
                        "compiled-shape set stays bounded")
    p.add_argument("--warmup", type=int, default=1,
                   help="1 = compile each model at the smallest bucket "
                        "before accepting traffic")
    p.add_argument("--platform", default="",
                   help="force a JAX platform (e.g. 'cpu'): artifacts are "
                        "multi-platform, so the same directory serves on a "
                        "CPU-only box or when the TPU is held by training")
    p.add_argument("--quiet", type=int, default=0)
    a = p.parse_args(argv)

    if a.platform:
        import jax

        jax.config.update("jax_platforms", a.platform)

    models = {}
    for spec in a.artifact:
        name, _, path = spec.rpartition("=")
        if not name:
            name = os.path.basename(os.path.normpath(path))
        if name in models:
            raise SystemExit(f"duplicate model name {name!r}")
        models[name] = _Model(name, path)
        meta = models[name].meta
        print(f"serve: loaded {name!r} [{meta.get('kind')}] from {path} "
              f"({meta.get('size_bytes', 0) / 1e6:.1f} MB, "
              f"quantize={meta.get('quantize') or 'none'})")

    buckets = sorted({int(x) for x in a.buckets.split(",") if x})
    if any(b <= 0 for b in buckets):
        raise SystemExit("--buckets must be positive")

    handler = type("Handler", (_Handler,), {
        "models": models, "buckets": buckets, "quiet": bool(a.quiet),
    })
    server = ThreadingHTTPServer((a.host, a.port), handler)
    if a.warmup:
        for m in models.values():
            t0 = time.monotonic()
            _warmup(m, buckets)
            print(f"serve: warmed up {m.name!r} in "
                  f"{time.monotonic() - t0:.1f}s")
    print(f"serve: listening on http://{server.server_address[0]}:"
          f"{server.server_address[1]} "
          f"(models: {sorted(models)}, buckets: {buckets or 'exact'})")
    return server


def main(argv=None):
    server = build_server(argv)
    try:
        server.serve_forever()
    except KeyboardInterrupt:
        print("serve: shutting down")
    finally:
        server.server_close()


if __name__ == "__main__":
    main()
