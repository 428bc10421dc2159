"""Logging / observability.

Counterpart to the reference's ``WrappedTensorboard`` / ``WrappedWandb`` /
``AvgDict`` (``src/utils.py:36-126``): a uniform ``log_dict`` / ``log_image``
writer API over TensorBoard, plus running-mean metric aggregation and the
jax.profiler trace hook (the TPU-native replacement for the reference's
absent profiling story — SURVEY.md section 5 "Tracing").
"""

from __future__ import annotations

import contextlib
import logging
import sys
from pathlib import Path
from typing import Dict, Mapping, Optional

import numpy as np


def get_logger(name: str = "onedc_tpu", level=logging.INFO):
    logger = logging.getLogger(name)
    if not logger.handlers:
        h = logging.StreamHandler(sys.stdout)
        h.setFormatter(logging.Formatter(
            "%(asctime)s %(levelname)s %(name)s: %(message)s"))
        logger.addHandler(h)
        logger.setLevel(level)
    return logger


class AvgDict:
    """Running means over a dict of scalars (ref utils.py:36-51)."""

    def __init__(self):
        self._sum: Dict[str, float] = {}
        self._cnt: Dict[str, int] = {}

    def update(self, metrics: Mapping[str, float]):
        for k, v in metrics.items():
            v = float(v)
            self._sum[k] = self._sum.get(k, 0.0) + v
            self._cnt[k] = self._cnt.get(k, 0) + 1

    def mean(self) -> Dict[str, float]:
        return {k: self._sum[k] / self._cnt[k] for k in self._sum}

    def reset(self):
        self._sum.clear()
        self._cnt.clear()


class TensorboardWriter:
    """log_dict/log_image API over tensorboard summaries
    (ref WrappedTensorboard)."""

    def __init__(self, log_dir):
        from torch.utils.tensorboard import SummaryWriter
        Path(log_dir).mkdir(parents=True, exist_ok=True)
        self.writer = SummaryWriter(str(log_dir))

    def log_dict(self, metrics: Mapping[str, float], step: int,
                 prefix: str = ""):
        for k, v in metrics.items():
            tag = f"{prefix}/{k}" if prefix else k
            self.writer.add_scalar(tag, float(v), step)

    def log_image(self, tag: str, image: np.ndarray, step: int):
        """image: (H, W, 3) in [-1, 1] or [0, 1]."""
        img = np.asarray(image)
        if img.min() < -0.01:
            img = img * 0.5 + 0.5
        img = np.clip(img, 0, 1)
        self.writer.add_image(tag, img, step, dataformats="HWC")

    def log_config(self, config: Mapping, step: int = 0):
        import json
        self.writer.add_text("config", f"```\n{json.dumps(dict(config), indent=2, default=str)}\n```", step)

    def flush(self):
        self.writer.flush()

    def close(self):
        self.writer.close()


class WandbWriter:
    """log_dict/log_image API over wandb (ref WrappedWandb,
    src/utils.py:90-126). Import-gated: wandb is optional."""

    def __init__(self, project: str, run_name: Optional[str] = None,
                 config: Optional[Mapping] = None):
        import wandb  # noqa: F401 (optional dep)
        self._wandb = wandb
        self.run = wandb.init(project=project, name=run_name,
                              config=dict(config) if config else None)

    def log_dict(self, metrics: Mapping[str, float], step: int,
                 prefix: str = ""):
        payload = {(f"{prefix}/{k}" if prefix else k): float(v)
                   for k, v in metrics.items()}
        self._wandb.log(payload, step=step)

    def log_image(self, tag: str, image: np.ndarray, step: int):
        img = np.asarray(image)
        if img.min() < -0.01:
            img = img * 0.5 + 0.5
        img = np.clip(img, 0, 1)
        self._wandb.log({tag: self._wandb.Image(img)}, step=step)

    def log_config(self, config: Mapping, step: int = 0):
        self.run.config.update(dict(config), allow_val_change=True)

    def flush(self):
        pass

    def close(self):
        self.run.finish()


class MultiWriter:
    """Fan a single writer API out to several backends (e.g. TB + wandb)."""

    def __init__(self, *writers):
        self.writers = [w for w in writers if w is not None]

    def log_dict(self, *a, **k):
        for w in self.writers:
            w.log_dict(*a, **k)

    def log_image(self, *a, **k):
        for w in self.writers:
            w.log_image(*a, **k)

    def log_config(self, *a, **k):
        for w in self.writers:
            w.log_config(*a, **k)

    def flush(self):
        for w in self.writers:
            w.flush()

    def close(self):
        for w in self.writers:
            w.close()


class NoOpWriter:
    """Writer used on non-zero hosts (single-writer logging)."""

    def log_dict(self, *a, **k):
        pass

    def log_image(self, *a, **k):
        pass

    def log_config(self, *a, **k):
        pass

    def flush(self):
        pass

    def close(self):
        pass


def make_writer(log_dir, enabled: Optional[bool] = None,
                wandb_project: Optional[str] = None,
                run_name: Optional[str] = None):
    """TensorBoard (plus wandb when ``wandb_project`` is set and the
    package is installed) on process 0, no-op elsewhere."""
    import jax
    if enabled is None:
        enabled = jax.process_index() == 0
    if not enabled:
        return NoOpWriter()
    tb = TensorboardWriter(log_dir)
    if wandb_project:
        try:
            return MultiWriter(tb, WandbWriter(wandb_project, run_name))
        except Exception as e:  # import, auth, or network (zero-egress)
            get_logger().warning(
                "wandb unavailable (%s); logging to TensorBoard only", e)
    return tb


@contextlib.contextmanager
def profile_trace(log_dir, enabled: bool = True):
    """jax.profiler trace context; view with xprof/tensorboard-profile."""
    import jax
    if not enabled:
        yield
        return
    jax.profiler.start_trace(str(log_dir))
    try:
        yield
    finally:
        jax.profiler.stop_trace()
