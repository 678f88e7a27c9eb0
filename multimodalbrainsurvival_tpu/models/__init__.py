from multimodalbrainsurvival_tpu.models.resnet import (
    ResNet,
    ResNetProject,
    resnet18,
    resnet34,
    resnet50,
    resnet101,
    resnet152,
)
from multimodalbrainsurvival_tpu.models.aggregators import (
    IdentityAggregator,
    TanhAttention,
    TransformerAggregator,
    make_aggregator,
)
from multimodalbrainsurvival_tpu.models.mil import (
    AggregationModel,
    AggregationProjectModel,
)
from multimodalbrainsurvival_tpu.models.rna import RNAEncoder, RNAOnlyModel
from multimodalbrainsurvival_tpu.models.fusion import (
    EarlyFusionMLP,
    BagHistopathologyRNAModel,
    PatchHistopathologyRNAModel,
)

__all__ = [
    "ResNet",
    "ResNetProject",
    "resnet18",
    "resnet34",
    "resnet50",
    "resnet101",
    "resnet152",
    "IdentityAggregator",
    "TanhAttention",
    "TransformerAggregator",
    "make_aggregator",
    "AggregationModel",
    "AggregationProjectModel",
    "RNAEncoder",
    "RNAOnlyModel",
    "EarlyFusionMLP",
    "BagHistopathologyRNAModel",
    "PatchHistopathologyRNAModel",
]
