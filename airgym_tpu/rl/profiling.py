"""Profiling & timing instrumentation (reference: the wall-clock fps
counters in a2c_base.py:668-672 / a2c_continuous.py:82-137 plus TB
performance/* scalars — the reference has no deeper profiler; here we
additionally hook ``jax.profiler`` for device traces, SURVEY.md 5).
"""
from __future__ import annotations

import contextlib
import time
from typing import Dict, Optional


class StepTimer:
    """Accumulates the reference's three fps figures: pure env step time,
    step+inference, and total incl. RL update (performance/step_fps,
    step_inference_fps, step_inference_rl_update_fps)."""

    def __init__(self):
        self.reset()

    def reset(self):
        self.step_time = 0.0
        self.play_time = 0.0
        self.update_time = 0.0
        self.frames = 0

    @contextlib.contextmanager
    def env_step(self):
        t0 = time.perf_counter()
        yield
        self.step_time += time.perf_counter() - t0

    @contextlib.contextmanager
    def play(self):
        t0 = time.perf_counter()
        yield
        self.play_time += time.perf_counter() - t0

    @contextlib.contextmanager
    def update(self):
        t0 = time.perf_counter()
        yield
        self.update_time += time.perf_counter() - t0

    def add_frames(self, n: int):
        self.frames += n

    def fps(self) -> Dict[str, float]:
        eps = 1e-9
        return {
            "performance/step_fps": self.frames / max(self.step_time, eps),
            "performance/step_inference_fps":
                self.frames / max(self.play_time, eps),
            "performance/step_inference_rl_update_fps":
                self.frames / max(self.play_time + self.update_time, eps),
        }


@contextlib.contextmanager
def device_trace(log_dir: Optional[str]):
    """jax.profiler trace for TensorBoard's profile plugin; no-op when
    log_dir is None."""
    if not log_dir:
        yield
        return
    import jax
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named trace span (shows up in the device timeline)."""
    import jax
    return jax.profiler.TraceAnnotation(name)
