"""Run logging: JSONL scalar metrics + image dumps.

Replaces Weights & Biases (reference logs scalars/images/3D objects to wandb,
SURVEY.md §5 "Metrics/logging") with local artifacts of the same content:
- metrics.jsonl: one JSON object per log call {step, ...scalars},
- media/: PNG image dumps,
- summary.json written on close.

The interface mirrors the wandb subset the harness uses so a real wandb
backend can be slotted in where available.
"""
from __future__ import annotations

import json
import pathlib
import time
from typing import Optional

import numpy as np


class RunLogger:
    def __init__(self, run_dir, name: Optional[str] = None):
        self.run_dir = pathlib.Path(run_dir)
        self.run_dir.mkdir(parents=True, exist_ok=True)
        self.media_dir = self.run_dir / "media"
        self._metrics_f = (self.run_dir / "metrics.jsonl").open("a")
        self.name = name or self.run_dir.name
        self.summary: dict = {}
        self._t0 = time.time()

    def log(self, data: dict, step: Optional[int] = None):
        rec = {"_step": step, "_t": round(time.time() - self._t0, 3)}
        for k, v in data.items():
            if isinstance(v, (int, float, str, bool)) or v is None:
                rec[k] = v
            elif np.isscalar(v) or (hasattr(v, "ndim") and v.ndim == 0):
                rec[k] = float(v)
        self._metrics_f.write(json.dumps(rec) + "\n")
        self._metrics_f.flush()

    def log_image(self, name: str, img: np.ndarray,
                  step: Optional[int] = None):
        """img: HxWx{3,4} float [0,1] or uint8."""
        self.media_dir.mkdir(exist_ok=True)
        if img.dtype != np.uint8:
            img = (np.clip(img, 0, 1) * 255).astype(np.uint8)
        from PIL import Image
        tag = f"{name}_{step}" if step is not None else name
        Image.fromarray(img).save(self.media_dir / f"{tag}.png")

    def close(self):
        with (self.run_dir / "summary.json").open("w") as f:
            json.dump(self.summary, f, indent=2, default=float)
        self._metrics_f.close()
