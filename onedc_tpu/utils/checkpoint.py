"""Checkpoint I/O: orbax for training state, safetensors for interchange.

Covers the reference checkpoint semantics (SURVEY.md section 5):
- rotating ``checkpoint_model_{step:06d}`` dirs with ``max_checkpoint``
  retention + separate best-checkpoint dir
  (ref train_sd15_codec_stage1.py:198-217)
- step parsing from the directory name on resume (ref :198-201)
- safetensors export/import of parameter trees with "/"-joined keys so
  weights interchange with torch-side tooling.
"""

from __future__ import annotations

import os
import re
import shutil
from pathlib import Path
from typing import Any, Dict, List, Optional

import jax
import numpy as np

CKPT_PREFIX = "checkpoint_model_"


# ---------------------------------------------------------------------------
# safetensors params interchange
# ---------------------------------------------------------------------------

def flatten_params(tree, prefix: str = "") -> Dict[str, np.ndarray]:
    out = {}
    if isinstance(tree, dict):
        for k, v in tree.items():
            key = f"{prefix}/{k}" if prefix else str(k)
            out.update(flatten_params(v, key))
    else:
        out[prefix] = np.asarray(tree)
    return out


def unflatten_params(flat: Dict[str, np.ndarray]) -> Dict[str, Any]:
    tree: Dict[str, Any] = {}
    for key, val in flat.items():
        parts = key.split("/")
        node = tree
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = val
    return tree


def save_safetensors(params, path) -> None:
    from safetensors.numpy import save_file
    flat = {k: np.ascontiguousarray(v) for k, v in flatten_params(params).items()}
    save_file(flat, str(path))


def load_safetensors(path) -> Dict[str, Any]:
    from safetensors.numpy import load_file
    return unflatten_params(load_file(str(path)))


# ---------------------------------------------------------------------------
# orbax training-state checkpoints with rotation + best tracking
# ---------------------------------------------------------------------------

class CheckpointManager:
    """Rotating step checkpoints + best-by-metric dir."""

    def __init__(self, run_dir, max_checkpoints: int = 3):
        self.run_dir = Path(run_dir)
        self.best_dir = self.run_dir / "checkpoints_best"
        self.max_checkpoints = max_checkpoints
        self.run_dir.mkdir(parents=True, exist_ok=True)
        import orbax.checkpoint as ocp
        self._ckptr = ocp.StandardCheckpointer()
        self.best_metric: Optional[float] = None

    def _step_dirs(self) -> List[Path]:
        dirs = [d for d in self.run_dir.iterdir()
                if d.is_dir() and d.name.startswith(CKPT_PREFIX)]
        return sorted(dirs, key=lambda d: int(d.name[len(CKPT_PREFIX):]))

    def save(self, state, step: int, metric: Optional[float] = None):
        path = self.run_dir / f"{CKPT_PREFIX}{step:06d}"
        if path.exists():
            shutil.rmtree(path)
        self._ckptr.save(path.absolute(), state)
        self._ckptr.wait_until_finished()
        # rotation (ref :204-217)
        dirs = self._step_dirs()
        while len(dirs) > self.max_checkpoints:
            shutil.rmtree(dirs.pop(0))
        # best tracking by lowest metric (total_loss)
        if metric is not None and (self.best_metric is None
                                   or metric < self.best_metric):
            self.best_metric = metric
            if self.best_dir.exists():
                shutil.rmtree(self.best_dir)
            shutil.copytree(path, self.best_dir)
        return path

    def latest_step(self) -> Optional[int]:
        dirs = self._step_dirs()
        if not dirs:
            return None
        return int(dirs[-1].name[len(CKPT_PREFIX):])

    def restore(self, target, step: Optional[int] = None):
        """Restore into `target`'s structure. step=None -> latest."""
        if step is None:
            step = self.latest_step()
            if step is None:
                raise FileNotFoundError(f"no checkpoints in {self.run_dir}")
        path = self.run_dir / f"{CKPT_PREFIX}{step:06d}"
        return self._ckptr.restore(path.absolute(), target), step


def parse_step_from_path(path) -> int:
    """'.../checkpoint_model_012345' -> 12345 (ref :198-201)."""
    m = re.search(rf"{CKPT_PREFIX}(\d+)", str(path))
    if not m:
        raise ValueError(f"no step in checkpoint path {path}")
    return int(m.group(1))
