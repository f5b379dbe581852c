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


class profile_trace:
    """``jax.profiler`` trace hook (SURVEY.md §5 tracing: the reference
    only has CUDA-event timing, train.py:52-53; on TPU the real tool is
    an XLA trace viewed in TensorBoard/XProf).

        with profile_trace(model_path):        # writes <dir>/plugins/...
            for _ in range(3): step(...)

    No-ops (with a warning) when the profiler backend is unavailable —
    e.g. through the axon remote relay, where tools/profile_raster.py's
    jitted stage breakdown is the supported alternative.
    """

    def __init__(self, log_dir: str, enabled: bool = True):
        self.dir = os.path.join(log_dir, "profile")
        self.enabled = enabled
        self.active = False

    def __enter__(self):
        if not self.enabled:
            return self
        try:
            import jax
            os.makedirs(self.dir, exist_ok=True)
            jax.profiler.start_trace(self.dir)
            self.active = True
        except Exception as e:  # backend without profiler support
            print(f"profiler trace unavailable ({e}); "
                  "use tools/profile_raster.py for the stage breakdown")
        return self

    def __exit__(self, *exc):
        if self.active:
            import jax
            jax.profiler.stop_trace()
            print(f"wrote profiler trace to {self.dir}")
        return False
