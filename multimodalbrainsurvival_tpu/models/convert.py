"""PyTorch checkpoint → JAX parameter conversion for the ResNet family.

The reference initializes its ResNets from torchvision ImageNet checkpoints
(``1_HistoPathology/resnet.py:10-16,366-376``) and performs conv1 "weight
surgery" for the 1-channel / 4-channel input variants
(``resnet.py:378-428``). This module provides the equivalent one-shot
converter: a torch ``state_dict`` (loaded from a ``.pt``/``.pth`` file, e.g. a
downloaded torchvision checkpoint or a reference-trained model) is re-keyed
into our flax variable tree.

Key mapping (torch → flax):
  ``conv1.weight``                  → ``params/conv1/kernel``   (OIHW → HWIO)
  ``bn1.{weight,bias}``             → ``params/bn1/{scale,bias}``
  ``bn1.running_{mean,var}``        → ``batch_stats/bn1/{mean,var}``
  ``layer{i}.{j}.conv{k}.weight``   → ``params/layer{i}_{j}/conv{k}/kernel``
  ``layer{i}.{j}.downsample.0/1.*`` → ``params/layer{i}_{j}/downsample_{conv,bn}/*``
  ``fc.{weight,bias}``              → ``params/fc/{kernel,bias}`` (transposed)

No torch import is required at module load; ``load_torch_state_dict`` imports
torch lazily (CPU build is available in this environment).
"""

from __future__ import annotations

import re
from typing import Any, Mapping

import numpy as np


def load_torch_state_dict(path: str) -> dict[str, np.ndarray]:
    """Load a torch checkpoint file into a flat {name: numpy array} dict."""
    import torch

    state = torch.load(path, map_location="cpu", weights_only=True)
    if isinstance(state, Mapping) and "state_dict" in state:
        state = state["state_dict"]
    return {k: v.detach().cpu().numpy() for k, v in state.items()}


def _convert_conv(w: np.ndarray) -> np.ndarray:
    # torch OIHW → flax HWIO
    return np.transpose(w, (2, 3, 1, 0))


def adapt_conv1_channels(
    kernel_hwio: np.ndarray,
    in_channels: int,
    *,
    rng: np.random.Generator | None = None,
) -> np.ndarray:
    """Reference conv1 surgery for non-RGB inputs, pinned against the
    reference's own pretrained branches (oracle test runs
    ``resnet50_1channel``/``resnet50_4channel`` with a monkeypatched
    ``model_zoo.load_url``):

    - 1 channel (``RNone``): the MEAN over the RGB kernels
      (``resnet.py:423-426`` — ``torch.mean(con1w, dim=1, keepdim=True)``).
    - 4 channels (``RNfour``): keep RGB and draw the 4th channel from
      N(0, 0.001) (``resnet.py:398-399`` — conv1 is ``normal_(0, 0.001)``
      then ``[:, :3]`` overwritten with the pretrained kernels). The noise
      values come from ``rng`` (torch's global RNG in the reference); parity
      for this channel is statistical by construction.
    - 3 channels: unchanged.
    """
    h, w, c, o = kernel_hwio.shape
    if in_channels == c:
        return kernel_hwio
    if in_channels == 1:
        return kernel_hwio.mean(axis=2, keepdims=True)
    if in_channels == 4:
        if rng is None:
            rng = np.random.default_rng(0)
        extra = rng.normal(0.0, 0.001, size=(h, w, 1, o)).astype(
            kernel_hwio.dtype
        )
        return np.concatenate([kernel_hwio, extra], axis=2)
    raise ValueError(f"Cannot adapt conv1 from {c} to {in_channels} channels")


def torch_resnet_to_flax(
    state: Mapping[str, np.ndarray],
    *,
    in_channels: int = 3,
    prefix: str = "",
) -> dict[str, Any]:
    """Re-key a torch ResNet state_dict into flax ``{'params', 'batch_stats'}``.

    ``prefix`` strips a leading qualifier (e.g. ``"resnet."`` when converting
    a whole reference ``AggregationModel`` checkpoint).
    """
    params: dict[str, Any] = {}
    stats: dict[str, Any] = {}

    def put(tree, path, value):
        node = tree
        for k in path[:-1]:
            node = node.setdefault(k, {})
        node[path[-1]] = value

    block_re = re.compile(r"^layer(\d+)\.(\d+)\.(.+)$")
    for key, value in state.items():
        if prefix:
            if not key.startswith(prefix):
                continue
            key = key[len(prefix):]
        if key.endswith("num_batches_tracked"):
            continue

        m = block_re.match(key)
        if m:
            stage, block, rest = m.group(1), m.group(2), m.group(3)
            scope = f"layer{stage}_{block}"
            rest = rest.replace("downsample.0", "downsample_conv").replace(
                "downsample.1", "downsample_bn"
            )
            parts = rest.split(".")
            sub, leaf = ".".join(parts[:-1]), parts[-1]
            dest_scope = [scope, sub]
        else:
            parts = key.split(".")
            sub, leaf = ".".join(parts[:-1]), parts[-1]
            dest_scope = [sub]

        is_bn = "bn" in dest_scope[-1] or "downsample_bn" in dest_scope[-1]
        if leaf == "weight":
            if is_bn:
                put(params, dest_scope + ["scale"], value)
            elif value.ndim == 4:
                kernel = _convert_conv(value)
                if dest_scope == ["conv1"]:
                    kernel = adapt_conv1_channels(kernel, in_channels)
                put(params, dest_scope + ["kernel"], kernel)
            else:  # linear
                put(params, dest_scope + ["kernel"], value.T)
        elif leaf == "bias":
            put(params, dest_scope + ["bias"], value)
        elif leaf == "running_mean":
            put(stats, dest_scope + ["mean"], value)
        elif leaf == "running_var":
            put(stats, dest_scope + ["var"], value)

    return {"params": params, "batch_stats": stats}


def _linear(state, name):
    return {
        "kernel": state[f"{name}.weight"].T,
        "bias": state[f"{name}.bias"],
    }


def torch_mil_to_flax(state: Mapping[str, np.ndarray]) -> dict[str, Any]:
    """Reference ``AggregationModel`` state_dict → our variable tree.

    Covers the resnet (via :func:`torch_resnet_to_flax` with the ``resnet.``
    prefix), the ``fc`` head, and the aggregator (TanhAttention params when
    present; identity has none). The ResNet's own 1000-class classifier is
    dropped: the MIL ``extract`` path never calls it, so flax never
    materializes its params and a restore would mismatch.
    """
    rn = torch_resnet_to_flax(state, prefix="resnet.")
    rn["params"].pop("fc", None)
    params: dict[str, Any] = {"resnet": rn["params"], "fc": _linear(state, "fc")}
    if "aggregator.vector" in state:
        params["aggregator"] = {
            "vector": state["aggregator.vector"],
            "linear": {"kernel": state["aggregator.linear.weight"].T},
        }
    if "project.weight" in state:  # AggregationProjectModel
        params["project"] = _linear(state, "project")
    return {"params": params, "batch_stats": {"resnet": rn["batch_stats"]}}


def torch_rna_to_flax(state: Mapping[str, np.ndarray]) -> dict[str, Any]:
    """Reference ``RNAOnlyModel`` state_dict → our variable tree.

    The reference builds the encoder as ``Sequential(Dropout, Linear, ReLU,
    Dropout, Linear)`` (``1_GeneExpress_train.py:247-257``) so the Linear
    indices are 1 and 4; the head is ``final_mlp.0``.
    """
    return {
        "params": {
            "encoder": {
                "dense_0": _linear(state, "rna_mlp.1"),
                "dense_1": _linear(state, "rna_mlp.4"),
            },
            "final": _linear(state, "final_mlp.0"),
        }
    }


def torch_feature_to_flax(state: Mapping[str, np.ndarray]) -> dict[str, Any]:
    """Reference early-fusion MLP state_dict → our ``EarlyFusionMLP`` tree.

    The reference model is a bare ``Sequential(Dropout, Linear(4096,2048),
    ReLU, Dropout, Linear(2048,200), ReLU, Dropout, Linear(200,1))``
    (``2_EarlyFusion_train.py:242-251``), so the Linear indices are 1/4/7.
    """
    return {
        "params": {
            "dense_0": _linear(state, "1"),
            "dense_1": _linear(state, "4"),
            "head": _linear(state, "7"),
        }
    }


def torch_joint_to_flax(state: Mapping[str, np.ndarray]) -> dict[str, Any]:
    """Reference ``BagHistopathologyRNAModel`` state_dict → our variable tree
    (``5_JointFusion/models.py:87-104``; head ``Sequential(Dropout, Linear)``)."""
    rn = torch_resnet_to_flax(state, prefix="resnet.")
    rn["params"].pop("fc", None)  # unused classifier head (see torch_mil_to_flax)
    return {
        "params": {
            "resnet": rn["params"],
            "rna_encoder": {
                "dense_0": _linear(state, "rna_mlp.1"),
                "dense_1": _linear(state, "rna_mlp.4"),
            },
            "final": _linear(state, "final_mlp.1"),
        },
        "batch_stats": {"resnet": rn["batch_stats"]},
    }
