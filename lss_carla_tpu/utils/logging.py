"""Metric logging: tensorboard scalars + JSONL + optional wandb.

Covers the reference's observability surface (``train_simbev.py:254-265,
352-354``): tensorboard scalars (train/loss, train/iou, train/epoch,
train/step_time, val/loss, val/iou), optional wandb scalars/figures, plus a
machine-readable JSONL stream the reference lacks.
"""

from __future__ import annotations

import json
import os
import time
from typing import Optional


class MetricLogger:
    def __init__(self, logdir: str, use_wandb: bool = False,
                 wandb_kwargs: Optional[dict] = None):
        os.makedirs(logdir, exist_ok=True)
        self.logdir = logdir
        self._jsonl = open(os.path.join(logdir, "metrics.jsonl"), "a")
        try:
            from tensorboardX import SummaryWriter
            self._tb = SummaryWriter(logdir=logdir)
        except ImportError:
            self._tb = None
        self._wandb = None
        if use_wandb:
            try:
                import wandb
                wandb.init(dir=logdir, **(wandb_kwargs or {}))
                self._wandb = wandb
            except ImportError:
                print("wandb requested but not installed; skipping")

    def scalars(self, step: int, **kv):
        for k, v in kv.items():
            if self._tb is not None:
                self._tb.add_scalar(k, float(v), step)
        rec = {"step": step, "time": time.time()}
        rec.update({k: float(v) for k, v in kv.items()})
        self._jsonl.write(json.dumps(rec) + "\n")
        self._jsonl.flush()
        if self._wandb is not None:
            self._wandb.log({**kv, "iteration": step})

    def figure(self, step: int, tag: str, fig):
        if self._wandb is not None:
            self._wandb.log({tag: self._wandb.Image(fig), "iteration": step})
        if self._tb is not None:
            self._tb.add_figure(tag, fig, step)

    def summary(self, **kv):
        if self._wandb is not None:
            for k, v in kv.items():
                self._wandb.run.summary[k] = v

    def close(self):
        self._jsonl.close()
        if self._tb is not None:
            self._tb.close()
        if self._wandb is not None:
            self._wandb.finish()


class NullLogger:
    """MetricLogger interface, no output — non-primary processes of a
    multi-host run (TB/wandb/jsonl writers on a shared logdir would
    collide; metrics are replicated so process 0 logs for everyone)."""

    def scalars(self, step: int, **kv):
        pass

    def figure(self, step: int, tag: str, fig):
        pass

    def summary(self, **kv):
        pass

    def close(self):
        pass
