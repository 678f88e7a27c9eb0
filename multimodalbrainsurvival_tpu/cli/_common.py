"""Shared CLI scaffolding mirroring the reference driver surface.

Every reference entry point is ``python <script> --config cfg.json [--seed N]
[--log 0/1] [--quick 0/1]`` with config keys overriding args for ``flag`` /
``checkpoint_path`` / ``summary_path`` (``2_HistoPath_train.py:439-456,
599-604``). Checkpoints live at ``<checkpoint_path>/models/<flag>/`` and
output frames at ``<checkpoint_path>/outputs/<flag>/``.
"""

from __future__ import annotations

import argparse
import datetime
import os

import numpy as np

from multimodalbrainsurvival_tpu.config import Config
from multimodalbrainsurvival_tpu.utils.logging import MetricWriter


def make_parser(description: str) -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=description)
    p.add_argument("--config", type=str, default="config.json",
                   help="configuration json file")
    p.add_argument("--quick", type=int, default=0,
                   help="use small datasets to check that the script runs")
    p.add_argument("--log", type=int, default=0,
                   help="0 = do not use a summary writer")
    p.add_argument("--seed", type=int, default=1111,
                   help="seed for the random number generator")
    p.add_argument("--save_images", type=int, default=0,
                   help="accepted for reference CLI parity (unused)")
    return p


def enable_compile_cache(cache_dir: str) -> None:
    """Persistent XLA compile cache: repeat runs of the same config skip
    compilation entirely (the first ResNet-50 train-step compile costs
    minutes on a remote compile server; a cache hit is ~ms). Numbers are
    unaffected — only compile time. Programs under 5 s compile are not
    cached (they recompile faster than the disk round-trip is worth).
    ONE policy shared by the CLIs (``compile_cache_dir`` config key) and
    ``bench.py``."""
    import jax

    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)


def load_config(args) -> tuple[Config, str, str, str]:
    """Returns (config, flag, checkpoint_path, summary_path) with the
    reference's config-over-args override semantics."""
    config = Config.from_json(args.config)
    unknown = config.unknown_keys()
    if unknown:
        # audit, not an error: reference configs must keep loading verbatim,
        # but typo'd or since-removed keys (e.g. steps_per_dispatch) should
        # never be silently ignored
        print(f"config: ignoring unrecognized keys: {', '.join(unknown)}")
    # reference device-select parity (2_HistoPath_train.py:457: use_cuda
    # false → torch CPU): an explicit false routes this run to host CPU.
    # A reference quirk, so gated behind reference_parity (CLAUDE.md rule);
    # loud, because the reference's shipped EarlyFusion configs set false
    # and silently training on host CPU is an order-of-magnitude surprise.
    # Config-value check only — reading the backend here would initialize
    # (and on this platform, CLAIM) the accelerator we're opting out of.
    use_cuda = config.get("use_cuda", None)
    if use_cuda is not None and not use_cuda and config.reference_parity:
        import jax

        if jax.config.jax_platforms != "cpu":
            jax.config.update("jax_platforms", "cpu")
        print(
            "use_cuda: false -> running on host CPU (reference device-select "
            "parity, 2_HistoPath_train.py:457; set use_cuda: true or "
            "reference_parity: false to use the accelerator)"
        )
    # `mesh: {"distributed": true}`: join the multi-host runtime NOW —
    # jax.distributed.initialize must run before anything (dataset probes,
    # model init) touches the XLA backend; make_device_put then builds the
    # process-spanning mesh
    if (config.get("mesh") or {}).get("distributed"):
        if not config.get("flag"):
            # the timestamp fallback below is per-process wall clock: hosts
            # would compute different save_dir/output_dir and the COLLECTIVE
            # orbax checkpoint would diverge across processes
            raise SystemExit(
                "distributed runs need an explicit 'flag' in the config "
                "(the timestamp fallback differs across hosts)"
            )
        from multimodalbrainsurvival_tpu.parallel.mesh import (
            initialize_from_env,
        )

        initialize_from_env()
    cache_dir = config.get("compile_cache_dir", "")
    if cache_dir:
        enable_compile_cache(cache_dir)
    np.random.seed(args.seed)
    flag = config.get("flag", "") or "train_{date:%Y-%m-%d_%H:%M:%S}".format(
        date=datetime.datetime.now()
    )
    checkpoint_path = config.get("checkpoint_path", "checkpoints/")
    summary_path = config.get("summary_path", os.path.join(checkpoint_path, "summary"))
    return config, flag, checkpoint_path, summary_path


def experiment_dirs(checkpoint_path: str, flag: str) -> tuple[str, str]:
    save_dir = os.path.join(checkpoint_path, "models", flag)
    output_dir = os.path.join(checkpoint_path, "outputs", flag)
    os.makedirs(save_dir, exist_ok=True)
    return save_dir, output_dir


def make_writer(log: bool, summary_path: str, flag: str, config: Config):
    if not log:
        return None
    import jax

    if jax.process_index() != 0:
        # multi-host: metric streams are identical on every process — only
        # the primary writes (same convention as the output-frame CSVs)
        return None
    d = os.path.join(
        summary_path,
        datetime.datetime.now().strftime("%Y-%m-%d_%H:%M:%S") + f"_{flag}",
    )
    writer = MetricWriter(d)
    writer.text("config", dict(config.raw))
    return writer


def savescore_name(prefix: str, dataset: str, flag: str) -> str:
    """Reference naming: ``<prefix>_<split>[_<flag>]_df.csv`` where the flag
    is appended only for cross-validation runs (``'cv' in flag`` —
    ``2_GeneExpress_savescore.py:186-190``)."""
    if "cv" in flag:
        return f"{prefix}_{dataset}_{flag}_df.csv"
    return f"{prefix}_{dataset}_df.csv"


def maybe_restore(variables, config: Config, ckpt, keys=("restore_path", "model_path")):
    """Warm-start parity: reference loads ``restore_path`` then ``model_path``
    if set (``2_HistoPath_train.py:531-537``)."""
    for key in keys:
        path = config.get(key, "")
        if path:
            variables = ckpt.restore(path, variables)
            print("Loaded model from checkpoint for finetuning")
    return variables


#: Exit status of a preempted CLI run (128 + SIGTERM, the shell convention).
#: Schedulers / retry wrappers keyed on exit codes must NOT see 0 for an
#: incomplete run — they would treat it as done and never rerun it.
PREEMPTED_EXIT_CODE = 143


def run_train(train_model_fn, *args, **kwargs):
    """Run ``train_model``, converting a preemption (SIGTERM) into an orderly
    exit with status :data:`PREEMPTED_EXIT_CODE`: the emergency full-state
    checkpoint is already committed by the loop, so rerunning the same command
    with ``resume: true`` continues the run exactly where it stopped
    (train/loop.py). The non-zero status tells schedulers the run is
    incomplete."""
    from multimodalbrainsurvival_tpu.train import TrainingPreempted

    try:
        return train_model_fn(*args, **kwargs)
    except TrainingPreempted as e:
        print(
            f"exiting after preemption (status {PREEMPTED_EXIT_CODE}): {e}"
        )
        # SystemExit skips the writer.close() that follows run_train in the
        # CLIs — flush the partial run's scalars here so they aren't lost
        writer = kwargs.get("writer")
        if writer is not None:
            writer.close()
        raise SystemExit(PREEMPTED_EXIT_CODE)


def tune_optimizer(tx, config: Config, n_train: int, *, num_epochs: int,
                   batch_size: int):
    """Apply the opt-in whole-model optimizer knobs from the config
    (TPU-native training extensions — the reference trains at a constant
    Adam LR with no clipping, ``2_HistoPath_train.py:552-559``):

    - ``lr_schedule``: "constant" | "cosine" | "linear" | "step" — a
      RELATIVE decay factor multiplying every parameter group's own base LR
      (``train/optim.relative_lr_schedule``), over
      ``ceil(n_train / batch_size) * num_epochs`` optimizer steps;
    - ``warmup_steps``: linear 0→1 LR ramp over that many steps (composes
      with any schedule kind, incl. "constant" for warmup-only);
    - ``lr_min_factor`` (default 0.0), ``lr_step_every_epochs`` +
      ``lr_step_gamma`` (torch ``StepLR`` shape, in epochs);
    - ``grad_clip_norm``: global-norm gradient clipping across the FULL
      parameter tree before the per-group transforms
      (``torch.nn.utils.clip_grad_norm_`` semantics).

    With none of the keys set, ``tx`` is returned untouched (identical
    optimizer state tree → plain checkpoints stay layout-compatible).
    """
    from multimodalbrainsurvival_tpu.train.optim import (
        relative_lr_schedule, wrap_optimizer,
    )

    kind = str(config.get("lr_schedule", "constant"))
    warmup = int(config.get("warmup_steps", 0))
    clip = config.get("grad_clip_norm")
    if kind == "constant" and warmup == 0 and clip is None:
        return tx
    steps_per_epoch = max(1, -(-int(n_train) // int(batch_size)))
    schedule = None
    if kind != "constant" or warmup > 0:
        schedule = relative_lr_schedule(
            kind,
            total_steps=steps_per_epoch * int(num_epochs),
            warmup_steps=warmup,
            min_factor=float(config.get("lr_min_factor", 0.0)),
            step_every=int(config.get("lr_step_every_epochs", 0))
            * steps_per_epoch,
            step_gamma=float(config.get("lr_step_gamma", 0.1)),
        )
    return wrap_optimizer(
        tx, schedule=schedule,
        grad_clip_norm=float(clip) if clip is not None else None,
    )


def observability_kwargs(config: Config, save_dir: str) -> dict:
    """TrainSettings kwargs for the config-driven observability knobs
    (SURVEY.md §5 "tracing / profiling" — first-class on TPU because
    profiles, not intuition, drive the perf work in docs/DESIGN.md):

    - ``profile_steps``: capture a ``jax.profiler`` trace of that many train
      steps (after warmup) — viewable with TensorBoard / xprof;
    - ``profile_dir``: where the trace lands (default
      ``<save_dir>/jax_trace`` so each experiment keeps its own);
    - ``debug_checkify``: op-level NaN/div localization via
      ``jax.experimental.checkify`` (slow; names the first offending
      primitive instead of just "loss is NaN");
    - ``donate_state``: off-switch for buffer donation (debugging aid —
      donation is numerics-neutral but changes buffer lifetimes).
    """
    steps = int(config.get("profile_steps", 0))
    return {
        "profile_steps": steps,
        "profile_dir": str(
            config.get("profile_dir", "")
            or os.path.join(save_dir, "jax_trace")),
        "debug_checkify": bool(config.get("debug_checkify", False)),
        "donate_state": bool(config.get("donate_state", True)),
    }


def early_stop_kwargs(config: Config) -> dict:
    """TrainSettings kwargs for the opt-in early-stopping knobs (TPU-native
    extension; see TrainSettings.early_stop_patience)."""
    return {
        "early_stop_patience": int(config.get("early_stop_patience", 0)),
        "early_stop_min_delta": float(config.get("early_stop_min_delta", 0.0)),
    }


def make_device_put(config: Config):
    """``mesh: {"dp": N, "mp": M}`` in the config shards every batch over a
    device mesh (``parallel/``); absent or dp*mp == 1 → single-device (None).

    ``mesh: {"distributed": true}`` additionally joins the multi-host
    runtime first (``parallel/mesh.initialize_from_env``: explicit
    ``JAX_COORDINATOR_ADDRESS``/``JAX_NUM_PROCESSES``/``JAX_PROCESS_ID``
    env vars, or TPU-pod auto-detection), so the SAME train CLI command
    runs on every host of a pod and the mesh spans them all — proven
    end-to-end by ``tests/test_multihost_cli.py``.
    """
    spec = config.get("mesh")
    if not spec:
        return None
    if spec.get("distributed"):
        import jax

        from multimodalbrainsurvival_tpu.parallel.mesh import (
            initialize_from_env,
        )

        initialize_from_env()
        print(
            f"joined distributed runtime: process {jax.process_index()} "
            f"of {jax.process_count()}"
        )
    dp = int(spec.get("dp", 0)) or None
    mp = int(spec.get("mp", 1))
    shard_bag = bool(spec.get("shard_bag", False))
    from multimodalbrainsurvival_tpu.parallel import batch_device_put, make_mesh

    mesh = make_mesh(dp=dp, mp=mp)
    print(f"training over mesh {dict(mesh.shape)}")
    # batch_device_put attaches .mesh / .shard_bag for callers that must
    # co-locate params (serving replication, elastic checkpoint restore)
    return batch_device_put(mesh, shard_bag=shard_bag)


def restore_maybe_folded(config: Config, adapter, init_adapter, probe, seed: int):
    """Init with the stock (unfolded) model tree, restore ``model_path``, and
    fold BN into the conv weights when ``fold_bn: true`` (+20% serving
    throughput on v5e; ``models/folding.py``). Checkpoints are always stored
    unfolded."""
    import jax
    import jax.numpy as jnp

    from multimodalbrainsurvival_tpu.train.checkpoint import Checkpointer

    variables = init_adapter.init(
        jax.random.PRNGKey(seed),
        {k: jnp.asarray(probe[k]) for k in adapter.array_keys},
    )
    variables = Checkpointer().restore(config["model_path"], variables)
    if init_adapter is not adapter:  # fold requested
        from multimodalbrainsurvival_tpu.models.folding import (
            fold_resnet_variables,
        )

        variables = fold_resnet_variables(variables)
        print("folded BatchNorm into conv weights for serving")
    return variables


def quantize_mode(config: Config) -> str:
    """Validated ``quantize`` config value: ``""`` (float serving, default)
    or ``"int8"`` (W8A8 ResNet, ``models/quantize.py``). int8 implies
    ``fold_bn`` — the int8 weights are built from the folded kernels."""
    quant = str(config.get("quantize", "") or "").lower()
    if quant not in ("", "int8"):
        raise ValueError(f"unsupported quantize mode: {quant!r}")
    return quant


def quantize_serving(config: Config, model, adapter, variables, probe):
    """Swap a float MIL serving path for the int8 (W8A8) one.

    Calibrates activation ranges on the probe batch, quantizes the folded
    ResNet weights, rides the int8 tree in ``variables["qtree"]`` (a real
    jit argument the mesh replication also covers), and returns
    ``(variables, QuantizedMILAdapter)``. Deviates from reference numerics
    by int8 rounding (cosine > 0.995 pinned in tests/test_quantize.py) —
    opt-in for that reason.
    """
    import jax

    from multimodalbrainsurvival_tpu.models.quantize import quantize_mil_resnet
    from multimodalbrainsurvival_tpu.train.adapters import (
        JointAdapter,
        QuantizedJointAdapter,
        QuantizedMILAdapter,
    )

    qtree = quantize_mil_resnet(variables, [probe["patch_bag"]],
                                arch=config.model_name)
    variables = dict(variables)
    variables["qtree"] = jax.device_put(qtree)
    if isinstance(adapter, JointAdapter):
        # the joint model's OTHER 105 MB weight stream — the RNA encoder —
        # gets the same treatment (models/quantize.quantize_rna_encoder)
        from multimodalbrainsurvival_tpu.models.quantize import (
            quantize_rna_encoder,
        )

        variables["qtree_rna"] = jax.device_put(
            quantize_rna_encoder(variables, [probe["rna_data"]],
                                 submodule="rna_encoder")
        )
        adapter = QuantizedJointAdapter(
            model=model, loader_kwargs=adapter.loader_kwargs,
            arch=config.model_name,
        )
        print("quantized ResNet + RNA encoder to int8 (W8A8) for serving")
        return variables, adapter
    adapter = QuantizedMILAdapter(
        model=model, loader_kwargs=adapter.loader_kwargs,
        arch=config.model_name,
    )
    print("quantized ResNet to int8 (W8A8) for serving")
    return variables, adapter


def quantize_rna_serving(config: Config, model, adapter, variables, probe):
    """Swap the float RNA serving path for the int8 (W8A8) one.

    Quantizes the Dense stack (``models/quantize.quantize_rna_encoder`` —
    the 12,778×4096 matmul is weight-load-bound, so int8 weights ≈ halve its
    HBM stream; activation scales are DYNAMIC per-row, so there is nothing
    to calibrate) and returns ``(variables, QuantizedTableAdapter)``. Opt-in via
    ``quantize: "int8"`` exactly like the ResNet paths; the float path stays
    the default and the parity-tested one.
    """
    import jax

    from multimodalbrainsurvival_tpu.models.quantize import (
        quantize_rna_encoder,
    )
    from multimodalbrainsurvival_tpu.train.adapters import (
        QuantizedTableAdapter,
    )

    qtree = quantize_rna_encoder(variables, [probe["data"]])
    variables = dict(variables)
    variables["qtree"] = jax.device_put(qtree)
    adapter = QuantizedTableAdapter(model=model,
                                    loader_kwargs=adapter.loader_kwargs)
    print("quantized RNA encoder to int8 (W8A8) for serving")
    return variables, adapter


def quantize_trunk_training(config: Config, adapter, variables, datasets,
                            probe, settings, device_put_fn, seed: int):
    """Swap a float training adapter for the int8 frozen-trunk one
    (``quantize_trunk: "int8"``, opt-in TPU-native extension).

    Under the reference freeze ladders (``2_HistoPath_train.py:544-551``,
    ``1_JointFusion_train.py:386-401``) the ResNet stages below
    ``n_layers_to_train`` run forward-only every step — exactly the work
    profile the W8A8 path executes ~1.5× faster than bf16 (docs/DESIGN.md
    items 18-24). One-shot fold + calibrate + quantize of the frozen prefix
    at training start (valid because its params never change); the trainable
    tail, aggregator/RNA encoder, and head stay float with an unchanged
    checkpoint layout. Dispatches MIL vs joint on the adapter type, like
    ``quantize_serving``. Returns the (possibly replaced) adapter.
    """
    qt_mode = str(config.get("quantize_trunk", "") or "")
    if not qt_mode:
        return adapter
    if qt_mode != "int8":
        raise ValueError(f"quantize_trunk: unknown mode {qt_mode!r} "
                         "(supported: 'int8')")
    # Both freeze ladders order trainable layers head-first (MIL:
    # train/optim.py mil_freeze_ladder; joint: JOINT_LADDER resnet/fc down),
    # so n trainable layers leave `5 - n` frozen residual stages below them.
    n = int(config.n_layers_to_train)
    trunk_stages = max(0, min(4, 5 - max(n, 1)))
    if trunk_stages < 1:
        raise ValueError(
            "quantize_trunk requires n_layers_to_train <= 4: the frozen "
            "prefix must cover at least conv1+layer1 "
            f"(got n_layers_to_train={n})"
        )
    import jax

    from multimodalbrainsurvival_tpu.models.quantize import (
        quantize_trunk_for_training,
    )
    from multimodalbrainsurvival_tpu.train.adapters import (
        JointAdapter,
        QuantTrunkJointAdapter,
        QuantTrunkMILAdapter,
    )

    cal_bags = [probe["patch_bag"]]
    for i, b in enumerate(
        datasets["train"].batches(settings.batch_size,
                                  **adapter.loader_kwargs)
    ):
        cal_bags.append(b["patch_bag"])
        if i >= 1:
            break
    qtree = quantize_trunk_for_training(
        variables, cal_bags, arch=config.model_name,
        augment=adapter.augment, seed=seed,
    )
    mesh = getattr(device_put_fn, "mesh", None)
    if mesh is not None:
        # the qtree is a closure constant of the jitted step; under a
        # mesh it must be replicated, not committed to device 0
        from multimodalbrainsurvival_tpu.parallel.sharding import (
            replicated_shardings,
        )

        qtree = jax.device_put(qtree, replicated_shardings(qtree, mesh))
    else:
        qtree = jax.device_put(qtree)
    cls = (QuantTrunkJointAdapter if isinstance(adapter, JointAdapter)
           else QuantTrunkMILAdapter)
    adapter = cls(
        model=adapter.model,
        loader_kwargs=adapter.loader_kwargs,
        augment=adapter.augment,
        arch=config.model_name,
        trunk_stages=trunk_stages,
        qtree=qtree,
    )
    print(f"quantize_trunk: int8 frozen prefix = stem + "
          f"{trunk_stages} stage(s); trainable tail stays float")
    return adapter


def extract_features_frames(cases: list[str], feats: np.ndarray):
    """Per-case mean feature aggregation (``4_HistoPath_extractfeatures.py:80-88``)."""
    import pandas as pd

    frame = pd.concat(
        [pd.DataFrame({"case": cases}), pd.DataFrame(feats)], axis=1
    )
    grouped = frame.groupby("case", sort=False).mean()
    return list(grouped.index), grouped.to_numpy()
