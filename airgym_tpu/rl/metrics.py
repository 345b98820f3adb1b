"""Metrics & observability (reference: lib/agent/a2c_base.py:246-336 TB
wiring, lib/utils/isaacgym_utils.py RLGPUAlgoObserver,
lib/core/interval_summary_writer.py, lib/core/dignostics.py).

Writes the same scalar namespaces the reference emits so existing TB
dashboards keep working:
  losses/{a_loss,c_loss,bounds_loss,entropy}, info/{last_lr,lr_mul,kl,
  epochs,frames}, performance/{step_fps,step_inference_fps,
  step_inference_rl_update_fps,...}, rewards/{frame,iter,time},
  episode_lengths/{frame,iter,time}, Episode/<reward term> (the per-term
  item_reward_info means), diagnostics/{clip_frac,explained_variance}.

Falls back to a JSONL event log when no TB backend is importable. An
``IntervalWriter`` reproduces the reference's adaptive write throttling.
"""
from __future__ import annotations

import json
import os
import time
from typing import Dict, Optional


class MetricsWriter:
    def __init__(self, log_dir: str, use_tensorboard: bool = True):
        os.makedirs(log_dir, exist_ok=True)
        self.log_dir = log_dir
        self._tb = None
        if use_tensorboard:
            try:
                from torch.utils.tensorboard import SummaryWriter
                self._tb = SummaryWriter(log_dir=os.path.join(
                    log_dir, "summaries"))
            except Exception:
                try:
                    from tensorboardX import SummaryWriter
                    self._tb = SummaryWriter(logdir=os.path.join(
                        log_dir, "summaries"))
                except Exception:
                    self._tb = None
        self._jsonl = open(os.path.join(log_dir, "events.jsonl"), "a")

    def add_scalar(self, tag: str, value: float, step: int):
        if self._tb is not None:
            self._tb.add_scalar(tag, value, step)
        self._jsonl.write(json.dumps(
            {"tag": tag, "value": float(value), "step": int(step)}) + "\n")

    def add_scalars(self, scalars: Dict[str, float], step: int):
        for tag, v in scalars.items():
            self.add_scalar(tag, v, step)
        self.flush()

    def flush(self):
        if self._tb is not None:
            self._tb.flush()
        self._jsonl.flush()

    def close(self):
        self.flush()
        if self._tb is not None:
            self._tb.close()
        self._jsonl.close()


class IntervalWriter:
    """Adaptive write-interval throttle (reference
    interval_summary_writer.py:4-64): cheap early logging, then at most
    one write per `summaries_interval` (scaled from experiment runtime)."""

    def __init__(self, writer: MetricsWriter, defer_start: float = 50.0,
                 interval_frac: float = 0.002, min_interval: float = 2.0):
        self.writer = writer
        self.start = time.time()
        self.defer_start = defer_start
        self.interval_frac = interval_frac
        self.min_interval = min_interval
        self.last_write = 0.0

    def _interval(self):
        elapsed = time.time() - self.start
        if elapsed < self.defer_start:
            return self.min_interval
        return max(self.min_interval, elapsed * self.interval_frac)

    def add_scalars(self, scalars: Dict[str, float], step: int):
        now = time.time()
        if now - self.last_write >= self._interval():
            self.writer.add_scalars(scalars, step)
            self.last_write = now


def episode_terms(info: Dict[str, "object"]) -> Dict[str, float]:
    """item_reward_info terms -> Episode/<key> means (reference
    RLGPUAlgoObserver, isaacgym_utils.py:78-113)."""
    import numpy as np
    return {f"Episode/{k}": float(np.mean(np.asarray(v)))
            for k, v in info.items()}
