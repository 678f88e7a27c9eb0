from multimodalbrainsurvival_tpu.data.tables import (
    FeatureTableDataset,
    RNATableDataset,
    TableDataset,
)
from multimodalbrainsurvival_tpu.data.patches import PatchBagDataset, PatchBagRNADataset

__all__ = [
    "TableDataset",
    "RNATableDataset",
    "FeatureTableDataset",
    "PatchBagDataset",
    "PatchBagRNADataset",
]
