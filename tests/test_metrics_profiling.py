"""Tests for the observability modules (metrics writer, interval
throttle, step timers)."""
import json
import os
import time

import numpy as np

from airgym_tpu.rl import metrics as mmod
from airgym_tpu.rl import profiling as pmod


def test_metrics_writer_jsonl(tmp_path):
    w = mmod.MetricsWriter(str(tmp_path), use_tensorboard=False)
    w.add_scalars({"losses/a_loss": 0.5, "Episode/reward": 1.25}, step=7)
    w.close()
    lines = [json.loads(l) for l in
             open(tmp_path / "events.jsonl").read().splitlines()]
    tags = {l["tag"]: l for l in lines}
    assert tags["losses/a_loss"]["value"] == 0.5
    assert tags["Episode/reward"]["step"] == 7


def test_metrics_writer_tensorboard(tmp_path):
    w = mmod.MetricsWriter(str(tmp_path), use_tensorboard=True)
    w.add_scalars({"rewards/frame": 3.0}, step=1)
    w.close()
    # summaries dir created by the TB backend when available
    assert os.path.isdir(tmp_path / "summaries") or \
        os.path.exists(tmp_path / "events.jsonl")


def test_interval_writer_throttles(tmp_path):
    w = mmod.MetricsWriter(str(tmp_path), use_tensorboard=False)
    iw = mmod.IntervalWriter(w, defer_start=1e9, interval_frac=0.0,
                             min_interval=100.0)
    iw.add_scalars({"a": 1.0}, 0)      # first write goes through
    iw.add_scalars({"a": 2.0}, 1)      # throttled
    w.close()
    lines = open(tmp_path / "events.jsonl").read().splitlines()
    assert len(lines) == 1


def test_episode_terms():
    out = mmod.episode_terms({"pos_reward": np.array([1.0, 3.0])})
    assert out == {"Episode/pos_reward": 2.0}


def test_step_timer_fps():
    t = pmod.StepTimer()
    with t.play():
        with t.env_step():
            time.sleep(0.01)
    with t.update():
        time.sleep(0.01)
    t.add_frames(1000)
    fps = t.fps()
    assert fps["performance/step_fps"] > 0
    assert fps["performance/step_inference_rl_update_fps"] < \
        fps["performance/step_inference_fps"]


def test_device_trace_noop():
    with pmod.device_trace(None):
        pass
