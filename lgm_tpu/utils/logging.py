"""Training observability: scalar logging + eval image grids.

Parity surface with the reference's logging stack, redesigned around a
single append-only JSONL stream (machine-readable, survives crashes)
with an optional TensorBoard mirror:

- rank-0 scalar prints every N iters (ref: main.py:114-118),
- TensorBoard scalars train/{loss,psnr,loss_mse,loss_lpips,lr} and
  eval/{loss,psnr} (ref: main1_lvis.py:51,203-213,282-283),
- GT-vs-pred image grids during train/eval (ref: main.py:120-136).

TensorBoard comes from torch.utils.tensorboard when importable (torch is
a CPU-only host dep here); absent that, JSONL alone still captures every
scalar so runs remain inspectable without a display stack.
"""

from __future__ import annotations

import json
import os
import time
from typing import Dict, Optional

import numpy as np


class MetricLogger:
    """Append scalars to <workspace>/metrics.jsonl (+ optional TB)."""

    def __init__(self, workspace: str, tensorboard: bool = True):
        os.makedirs(workspace, exist_ok=True)
        self.path = os.path.join(workspace, "metrics.jsonl")
        self._fh = open(self.path, "a", buffering=1)
        self._tb = None
        if tensorboard:
            try:
                from torch.utils.tensorboard import SummaryWriter

                self._tb = SummaryWriter(
                    log_dir=os.path.join(workspace, "tb")
                )
            except Exception:
                self._tb = None

    def log(self, step: int, scalars: Dict[str, float],
            prefix: str = "train"):
        rec = {"step": int(step), "ts": time.time()}
        rec.update({f"{prefix}/{k}": float(v) for k, v in scalars.items()})
        self._fh.write(json.dumps(rec) + "\n")
        if self._tb is not None:
            for k, v in scalars.items():
                self._tb.add_scalar(f"{prefix}/{k}", float(v), int(step))

    def close(self):
        self._fh.close()
        if self._tb is not None:
            self._tb.close()


def save_image_grid(path: str, gt: np.ndarray, pred: np.ndarray) -> None:
    """Write a 2-row (GT on top, prediction below) image grid.

    gt/pred: [B, V, H, W, 3] float in [0, 1] (our NHWC layout; the
    reference's equivalent dump is main.py:120-136). Rows are the two
    sources, columns are B*V views.
    """
    import cv2

    def row(x):
        b, v, h, w, c = x.shape
        return x.reshape(b * v, h, w, c).transpose(1, 0, 2, 3).reshape(
            h, b * v * w, c
        )

    grid = np.concatenate([row(np.asarray(gt)), row(np.asarray(pred))], 0)
    grid = (np.clip(grid, 0.0, 1.0) * 255).astype(np.uint8)
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    cv2.imwrite(path, grid[..., ::-1])  # RGB -> BGR for cv2
