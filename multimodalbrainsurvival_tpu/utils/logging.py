"""Metric logging: stdout (reference format), JSONL, optional TensorBoard.

The reference logs scalars through tensorboardX behind ``--log`` and prints a
``bags/s`` throughput line every ``log_interval`` steps
(``2_HistoPath_train.py:346-364``). This writer keeps that surface and adds a
durable ``metrics.jsonl`` stream (one JSON object per event) regardless of
TensorBoard availability.
"""

from __future__ import annotations

import json
import os
import time
from typing import Any


class MetricWriter:
    def __init__(self, log_dir: str | None = None, jsonl_path: str | None = None):
        self._tb = None
        if log_dir:
            os.makedirs(log_dir, exist_ok=True)
            try:
                from tensorboardX import SummaryWriter

                self._tb = SummaryWriter(log_dir)
            except ImportError:
                pass
            if jsonl_path is None:
                jsonl_path = os.path.join(log_dir, "metrics.jsonl")
        self._jsonl = open(jsonl_path, "a") if jsonl_path else None

    def scalar(self, tag: str, value: float, step: int) -> None:
        if self._tb is not None:
            self._tb.add_scalar(tag, value, step)
        if self._jsonl is not None:
            self._jsonl.write(
                json.dumps(
                    {"ts": time.time(), "tag": tag, "value": float(value), "step": step}
                )
                + "\n"
            )
            self._jsonl.flush()

    def text(self, tag: str, value: Any) -> None:
        if self._tb is not None:
            self._tb.add_text(tag, str(value))
        if self._jsonl is not None:
            self._jsonl.write(
                json.dumps({"ts": time.time(), "tag": tag, "text": str(value)}) + "\n"
            )
            self._jsonl.flush()

    def close(self) -> None:
        if self._tb is not None:
            self._tb.close()
        if self._jsonl is not None:
            self._jsonl.close()
