"""Training observability — reference ``train.py:236-301`` training_report.

TensorBoard scalars per loss term, periodic rendered-image panels, and a
throughput meter (the rays/s/chip counter BASELINE.md requires), plus a
machine-readable JSONL mirror. Uses torch's bundled SummaryWriter (the
only TB backend in this image); degrades to JSONL-only when absent.
"""

from __future__ import annotations

import json
import os
import time
from typing import Optional

import numpy as np


class TrainLogger:
    def __init__(self, log_dir: str, enable_tb: bool = True):
        os.makedirs(log_dir, exist_ok=True)
        self.jsonl = open(os.path.join(log_dir, "train_log.jsonl"), "a")
        self.tb = None
        if enable_tb:
            try:
                from torch.utils.tensorboard import SummaryWriter
                self.tb = SummaryWriter(log_dir)
            except Exception:
                self.tb = None
        self._t0 = time.time()

    def scalars(self, step: int, values: dict) -> None:
        rec = {"step": step, "t": round(time.time() - self._t0, 3)}
        for k, v in values.items():
            v = float(v)
            rec[k] = v
            if self.tb is not None:
                self.tb.add_scalar(k, v, step)
        self.jsonl.write(json.dumps(rec) + "\n")
        self.jsonl.flush()

    def image(self, step: int, tag: str, img) -> None:
        if self.tb is None:
            return
        arr = np.clip(np.asarray(img), 0.0, 1.0)
        self.tb.add_image(tag, arr, step, dataformats="HWC")

    def rays_per_s(self, step: int, pixels: int, iters: int,
                   seconds: float) -> float:
        v = pixels * iters / max(seconds, 1e-9)
        self.scalars(step, {"perf/rays_per_s": v})
        return v

    def close(self) -> None:
        if self.tb is not None:
            self.tb.close()
        self.jsonl.close()
