"""Convert a reference PyTorch checkpoint into this framework's format.

Lets a user of the reference bring their trained ``.pt`` models across:

    python -m multimodalbrainsurvival_tpu.cli.convert_checkpoint \
        --torch_path model_dict_best.pt --arch histo --output ckpt_dir/

``arch``: ``histo`` (AggregationModel — ``1_HistoPathology``), ``rna``
(RNAOnlyModel — ``2_GeneExpression``), ``joint``
(BagHistopathologyRNAModel — ``5_JointFusion``), or ``resnet`` (bare
encoder, e.g. an ImageNet checkpoint for ``pretrained_path``). The output is
an Orbax directory usable as ``model_path`` / ``restore_path`` in any config.
"""

from __future__ import annotations

import argparse

import jax
import jax.numpy as jnp

from multimodalbrainsurvival_tpu.models.convert import (
    load_torch_state_dict,
    torch_joint_to_flax,
    torch_mil_to_flax,
    torch_resnet_to_flax,
    torch_rna_to_flax,
)
from multimodalbrainsurvival_tpu.train.checkpoint import Checkpointer

CONVERTERS = {
    "histo": torch_mil_to_flax,
    "rna": torch_rna_to_flax,
    "joint": torch_joint_to_flax,
    "resnet": torch_resnet_to_flax,
}


def convert(torch_path: str, arch: str, output: str, in_channels: int = 3):
    state = load_torch_state_dict(torch_path)
    if arch == "resnet":
        variables = torch_resnet_to_flax(state, in_channels=in_channels)
    else:
        variables = CONVERTERS[arch](state)
    variables = jax.tree.map(jnp.asarray, variables)
    # one-shot CLI: block until the write commits (saves are async by default)
    Checkpointer().save(output, variables, block=True)
    n = sum(x.size for x in jax.tree.leaves(variables))
    print(f"converted {arch} checkpoint ({n:,} params) -> {output}")
    return variables


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--torch_path", required=True, help=".pt/.pth state_dict")
    p.add_argument("--arch", choices=sorted(CONVERTERS), required=True)
    p.add_argument("--output", required=True, help="output checkpoint dir")
    p.add_argument("--in_channels", type=int, default=3,
                   help="conv1 surgery target for arch=resnet (1/3/4)")
    a = p.parse_args(argv)
    convert(a.torch_path, a.arch, a.output, a.in_channels)


if __name__ == "__main__":
    main()
