"""Config system: accepts the reference's flat JSON schema verbatim.

The reference reads configs with ``json.load`` into a raw dict and mixes
``config['key']`` with ``config.get(key, default)`` (``2_HistoPath_train.py:
440-456``). This wrapper keeps that permissiveness (every reference
``ExampleConfigs/*.json`` loads unchanged) while adding typed accessors with
the reference's defaults, CLI-arg override semantics (config overrides args
for ``flag`` / ``checkpoint_path`` / ``summary_path``), and an optional
strict-mode validation listing unknown keys.
"""

from __future__ import annotations

import json
from dataclasses import dataclass, field
from typing import Any

KNOWN_KEYS = {
    # model
    "model_name", "num_classes", "pretrained", "pretrained_path",
    "aggregator", "aggregator_hdim", "transformer_layers",
    "n_layers_to_train", "task", "target_label",
    # data
    "data_path", "train_csv_path", "val_csv_path", "test_csv_path",
    "img_size", "train_bag_size", "val_bag_size",
    "max_patch_per_wsi_train", "max_patch_per_wsi_val",
    "num_workers", "weighted_sampler", "quick",
    # optimization
    "batch_size", "num_epochs", "lr", "lr_rna", "lr_mlp", "lr_histo",
    "weight_decay", "use_cuda",
    # paths / experiment
    "flag", "checkpoint_path", "summary_path", "output_path",
    "model_path", "restore_path", "histo_restore_path", "rna_restore_path",
    # TPU-native extensions (not in reference)
    "compute_dtype", "reference_parity", "mesh", "log_interval",
    "keep_bag_remainder", "num_devices", "resume", "fold_bn",
    "cache_patches_on_device", "cache_max_bytes_per_device",
    "emergency_checkpoint", "preempt_sync_every", "compile_cache_dir",
    "dropout", "augment",
    "quantize", "quantize_trunk", "remat", "freeze_bn", "accumulate_steps",
    "lr_schedule", "warmup_steps", "lr_min_factor", "lr_step_every_epochs",
    "lr_step_gamma", "grad_clip_norm", "early_stop_patience",
    "early_stop_min_delta",
    "export_path", "export_kind",
    # observability / debugging (train/loop.TrainSettings knobs, wired
    # through every train CLI via cli/_common.observability_kwargs)
    "profile_steps", "profile_dir", "debug_checkify", "donate_state",
    # streaming slide→features serving (cli/slide_extractfeatures.py)
    "slide_csv_path", "slide_path", "slides", "max_patches_per_slide",
    "dezoom_factor", "background_threshold", "save_patch_features",
    # K-fold cross-validation orchestrator (cli/cv_run.py)
    "cv_csv_path", "cv_folds",
}


@dataclass
class Config:
    raw: dict[str, Any] = field(default_factory=dict)

    @classmethod
    def from_json(cls, path: str) -> "Config":
        with open(path) as f:
            return cls(json.load(f))

    # dict-compatible access (reference style)
    def __getitem__(self, key: str) -> Any:
        return self.raw[key]

    def __contains__(self, key: str) -> bool:
        return key in self.raw

    def get(self, key: str, default: Any = None) -> Any:
        return self.raw.get(key, default)

    def unknown_keys(self) -> list[str]:
        return sorted(k for k in self.raw if k not in KNOWN_KEYS)

    # typed accessors with the reference's defaults
    @property
    def model_name(self) -> str:
        return self.raw.get("model_name", "resnet50")

    @property
    def num_classes(self) -> int:
        return int(self.raw.get("num_classes", 1))

    @property
    def batch_size(self) -> int:
        return int(self.raw.get("batch_size", 128))

    @property
    def num_epochs(self) -> int:
        return int(self.raw.get("num_epochs", 10))

    @property
    def img_size(self) -> int:
        return int(self.raw.get("img_size", 224))

    @property
    def task(self) -> str:
        return self.raw.get("task", "classification")

    @property
    def target_label(self) -> str:
        return self.raw.get("target_label", "vital_status")

    @property
    def aggregator(self) -> str:
        return self.raw.get("aggregator", "identity")

    @property
    def aggregator_hdim(self) -> int:
        return int(self.raw.get("aggregator_hdim", 2048))

    @property
    def n_layers_to_train(self) -> int:
        return int(self.raw.get("n_layers_to_train", 100))

    @property
    def weight_decay(self) -> float:
        return float(self.raw.get("weight_decay", 0.0))

    @property
    def flag(self) -> str:
        return self.raw.get("flag", "")

    @property
    def compute_dtype(self) -> str:
        return self.raw.get("compute_dtype", "float32")

    @property
    def reference_parity(self) -> bool:
        return bool(self.raw.get("reference_parity", True))

    @property
    def log_interval(self) -> int:
        return int(self.raw.get("log_interval", 100))
