"""Checkpointing: top-k-by-val-loss + last, hparams embedded.

Parity with the reference's Lightning checkpoint behavior (SURVEY.md §5):
- `{epoch}-{val_loss:.4f}.ckpt` naming + `last.ckpt`, top-k by val_loss
  (reference train_pointnet2.py:47-56, k=20),
- ctor hparams embedded in the checkpoint (save_hyperparameters,
  networks/pointnet2_nocs.py:78) so load_from_checkpoint-style restoration
  needs no external config,
- `get_checkpoint_df` filename parsing (reference predict.py:30-42).

Format: msgpack via flax.serialization (template-free restore), one file per
checkpoint — simple, fast, and fork-safe on the host.
"""
from __future__ import annotations

import json
import pathlib
from typing import Any, Optional

import numpy as np
import pandas as pd
import jax
from flax import serialization


def save_checkpoint(path, state: dict, hparams: Optional[dict] = None):
    """state: pytree of arrays (params/batch_stats/opt_state/step...)."""
    path = pathlib.Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    payload = dict(state)
    if hparams is not None:
        payload["hparams_json"] = np.frombuffer(
            json.dumps(hparams).encode(), dtype=np.uint8).copy()
    # to_state_dict converts NamedTuple optimizer states etc. into plain
    # nested dicts, which msgpack can serialize
    state_np = jax.tree_util.tree_map(
        np.asarray, serialization.to_state_dict(payload))
    path.write_bytes(serialization.msgpack_serialize(state_np))


def load_checkpoint(path) -> tuple[dict, Optional[dict]]:
    """Returns (state, hparams-or-None)."""
    raw = serialization.msgpack_restore(
        pathlib.Path(path).expanduser().read_bytes())
    hparams = None
    if "hparams_json" in raw:
        hparams = json.loads(bytes(raw.pop("hparams_json")).decode())
    return raw, hparams


class TopKCheckpointManager:
    """ModelCheckpoint(top-k, monitor=val_loss, save_last) equivalent."""

    def __init__(self, dirpath, k: int = 20, mode: str = "min"):
        self.dirpath = pathlib.Path(dirpath)
        self.dirpath.mkdir(parents=True, exist_ok=True)
        self.k = k
        assert mode in ("min", "max")
        self.mode = mode
        self._saved: list[tuple[float, pathlib.Path]] = []

    def save(self, epoch: int, val_loss: float, state: dict,
             hparams: Optional[dict] = None) -> pathlib.Path:
        fname = f"epoch={epoch}-val_loss={val_loss:.4f}.ckpt"
        path = self.dirpath / fname
        save_checkpoint(path, state, hparams)
        save_checkpoint(self.dirpath / "last.ckpt", state, hparams)
        score = val_loss if self.mode == "min" else -val_loss
        self._saved.append((score, path))
        self._saved.sort(key=lambda t: t[0])
        while len(self._saved) > self.k:
            _, worst = self._saved.pop()
            worst.unlink(missing_ok=True)
        return path

    @property
    def best_path(self) -> Optional[pathlib.Path]:
        return self._saved[0][1] if self._saved else None


def get_checkpoint_df(checkpoint_dir) -> pd.DataFrame:
    """Parse metric-bearing checkpoint filenames (reference predict.py:30-42)."""
    rows = []
    for path in sorted(pathlib.Path(checkpoint_dir).glob("*.ckpt")):
        row: dict[str, Any] = {}
        try:
            for item in path.stem.split("-"):
                key, _, value = item.partition("=")
                row[key] = float(value)
        except ValueError:
            continue  # e.g. last.ckpt
        row["path"] = str(path.absolute())
        rows.append(row)
    return pd.DataFrame(rows)
