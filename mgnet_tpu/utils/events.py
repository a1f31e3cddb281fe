"""Metric logging / observability.

Replaces detectron2's EventStorage + JSONWriter + TensorBoard writers
(reference: mg_net.py:362-371, tools/train_net.py:229-230; SURVEY.md §5):
scalars accumulate host-side and flush to a metrics.json JSONL plus
optional TensorBoard event files.
"""

from __future__ import annotations

import json
import os
import time
from typing import Dict

__all__ = ["MetricLogger"]


class MetricLogger:
    def __init__(self, output_dir: str, use_tensorboard: bool = True):
        os.makedirs(output_dir, exist_ok=True)
        self.path = os.path.join(output_dir, "metrics.json")
        self._file = open(self.path, "a")
        self._tb = None
        if use_tensorboard:
            try:
                from torch.utils.tensorboard import SummaryWriter

                self._tb = SummaryWriter(log_dir=output_dir)
            except Exception:
                self._tb = None
        self._t0 = time.time()

    def log(self, step: int, metrics: Dict[str, float]):
        record = {"iteration": int(step),
                  "time": round(time.time() - self._t0, 3)}
        record.update({k: float(v) for k, v in metrics.items()})
        self._file.write(json.dumps(record) + "\n")
        self._file.flush()
        if self._tb is not None:
            for k, v in metrics.items():
                self._tb.add_scalar(k, float(v), int(step))

    def log_image(self, step: int, tag: str, image):
        if self._tb is not None:
            self._tb.add_image(tag, image, int(step), dataformats="HWC")

    def close(self):
        self._file.close()
        if self._tb is not None:
            self._tb.close()
