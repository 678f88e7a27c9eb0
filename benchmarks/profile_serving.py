"""Per-layer device-time attribution of the folded serving path (the
roofline evidence behind docs/DESIGN.md item 8).

Captures a jax.profiler trace of the BN-folded bf16 ResNet-50 extract at the
given batch size, maps every HLO fusion to the convolution output shape
inside it (parsed from the compiled module), and prints device ms/iter per
conv-shape group. Round-2 measurement on v5e-1 at batch 256 (total
~19.8 ms/iter ≈ 12k patches/s):

    4.60 ms  (256,56,56,256)  layer1 1x1 expansions   — HBM roofline
    3.44 ms  (256,28,28,512)  layer2 1x1 expansions   — HBM roofline
    3.12 ms  (256,14,14,256)  layer3 1x1 reductions
    ...

i.e. the fat-activation 1x1 convs dominate and sit at the measured
~819 GB/s bandwidth bound, which is what the fused-stage kernel attempt
targeted (and could not beat — see docs/DESIGN.md item 8; the kernel was
retired in round 4, code in git history up to round 3).

Usage: python benchmarks/profile_serving.py [--batch 256] [--trace-dir DIR]
"""

from __future__ import annotations

import os as _os, sys as _sys
# the venv's editable install can vanish mid-session (see
# .claude/skills/verify/SKILL.md); standalone scripts import the repo
# checkout defensively
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))


import argparse
import glob
import gzip
import json
import os
import re
import tempfile
import time
from collections import defaultdict

import numpy as np


def attribute_trace(
    trace_dir: str, hlo: str, *, split_unmatched: bool = False
) -> dict[str, float]:
    """trace events + optimized HLO text → {conv-shape or op label: total ms}.

    ``split_unmatched=True`` keys ops with no conv inside by their FULL HLO
    op name instead of the ``[name-prefix]`` family bucket — use it to open
    up an opaque ``[fusion]`` total into its individual fusions."""
    comps = {}
    for m in re.finditer(
        r"^%?([\w.\-]+) \([^)]*\) -> [^\{]*\{\n(.*?)^\}", hlo, re.S | re.M
    ):
        comps[m.group(1)] = m.group(2)

    def conv_sig(body):
        m = re.search(r"%[\w.\-]+ = \w+\[([\d,]+)\].*? convolution\(", body)
        return m.group(1) if m else None

    sig_of = {}
    for m in re.finditer(
        r"%([\w.\-]+)\s*=.*?(?:calls=|to_apply=)%([\w.\-]+)", hlo
    ):
        body = comps.get(m.group(2), "")
        s = conv_sig(body)
        if s:
            sig_of[m.group(1)] = s

    files = sorted(glob.glob(trace_dir + "/**/*.trace.json.gz", recursive=True))
    with gzip.open(files[-1], "rt") as f:
        data = json.load(f)
    pid_names = {}
    tid_names = {}
    for e in data.get("traceEvents", []):
        if e.get("ph") != "M":
            continue
        if e.get("name") == "process_name":
            pid_names[e["pid"]] = e["args"].get("name", "")
        elif e.get("name") == "thread_name":
            tid_names[(e["pid"], e["tid"])] = e["args"].get("name", "")
    by_sig: dict[str, float] = defaultdict(float)
    found_ops_line = False
    for e in data.get("traceEvents", []):
        if e.get("ph") != "X":
            continue
        if "TPU" not in pid_names.get(e.get("pid"), ""):
            continue
        # Keep only the per-op line. The device trace also carries "Steps"
        # and "XLA Modules" parent spans that cover the same wall time —
        # counting those double- (or triple-) counts every op. (A round-2
        # name-based filter missed step spans numbered >4, inflating the
        # train-step attribution by ~45% until caught.)
        if tid_names.get((e["pid"], e["tid"])) != "XLA Ops":
            continue
        found_ops_line = True
        name = e.get("name", "")
        sig = sig_of.get(name.split(".(")[0]) or sig_of.get(name)
        if sig is None:
            sig = (name if split_unmatched
                   else f"[{name.split('.')[0]}]")
        by_sig[sig] += e.get("dur", 0) / 1e3
    if not found_ops_line:
        raise RuntimeError(
            "trace has no 'XLA Ops' device thread line — profiler format "
            "changed? Refusing to return a silently-empty attribution."
        )
    return dict(by_sig)


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--batch", type=int, default=256)
    p.add_argument("--iters", type=int, default=5)
    p.add_argument("--trace-dir", default=None)
    a = p.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from multimodalbrainsurvival_tpu.models import resnet50
    from multimodalbrainsurvival_tpu.models.folding import fold_resnet_variables
    from multimodalbrainsurvival_tpu.ops.image import preprocess_patches

    stock = resnet50(dtype=jnp.bfloat16)
    variables = fold_resnet_variables(
        stock.init(
            jax.random.PRNGKey(0), jnp.zeros((1, 224, 224, 3), jnp.bfloat16),
            train=False,
        )
    )
    model = resnet50(dtype=jnp.bfloat16, fold_bn=True)
    rng = np.random.default_rng(0)
    x = jax.device_put(
        rng.integers(0, 255, size=(a.batch, 224, 224, 3), dtype=np.uint8)
    )

    @jax.jit
    def extract(v, x):
        h = preprocess_patches(x, train=False, dtype=jnp.bfloat16)
        return model.apply(v, h, train=False, method="extract")

    hlo = extract.lower(variables, x).compile().as_text()
    jax.block_until_ready(extract(variables, x))
    t0 = time.perf_counter()
    jax.block_until_ready(extract(variables, x))
    print(f"extract b{a.batch}: {(time.perf_counter() - t0) * 1e3:.2f} ms wall")

    trace_dir = a.trace_dir or tempfile.mkdtemp(prefix="serve_trace_")
    os.makedirs(trace_dir, exist_ok=True)
    jax.profiler.start_trace(trace_dir)
    for _ in range(a.iters):
        out = extract(variables, x)
    jax.block_until_ready(out)
    jax.profiler.stop_trace()

    by_sig = attribute_trace(trace_dir, hlo)
    print("\nper-group device ms/iter (conv output shape, or [op]):")
    total = 0.0
    for sig, ms in sorted(by_sig.items(), key=lambda kv: -kv[1])[:20]:
        print(f"{ms / a.iters:8.3f}  {sig}")
        total += ms
    print(f"\ndevice total: {total / a.iters:.2f} ms/iter")


if __name__ == "__main__":
    main()
