"""Observability: TensorBoard logging + step timing + JAX profiler traces.

Parity+upgrade over the reference's aux subsystems (SURVEY.md §5):
  * torch.utils.tensorboard SummaryWriter scalars/histograms/images
    (train.py:29-31, :182-187) — same writer (torch is in the image),
    guarded so the framework runs without it.
  * per-iteration wall timing (the reference's cuda-event iter_time) via a
    simple StepTimer with EMA.
  * first-class `jax.profiler` trace capture (the reference has nothing) —
    `with profile_trace("/tmp/trace"):` produces a tensorboard-loadable
    device trace; `top_ops` parses it for a quick text breakdown.
"""
from __future__ import annotations

import contextlib
import glob
import gzip
import json
import time
from pathlib import Path
from typing import Optional

import numpy as np


class TBLogger:
    """Thin SummaryWriter wrapper; no-op when tensorboard is unavailable."""

    def __init__(self, log_dir):
        self.writer = None
        try:
            from torch.utils.tensorboard import SummaryWriter

            Path(log_dir).mkdir(parents=True, exist_ok=True)
            self.writer = SummaryWriter(str(log_dir))
        except Exception:
            pass

    def scalar(self, tag, value, step):
        if self.writer:
            self.writer.add_scalar(tag, float(value), int(step))

    def histogram(self, tag, values, step):
        if self.writer:
            self.writer.add_histogram(tag, np.asarray(values), int(step))

    def image(self, tag, img_hwc, step):
        if self.writer:
            self.writer.add_image(
                tag, np.asarray(img_hwc), int(step), dataformats="HWC"
            )

    def close(self):
        if self.writer:
            self.writer.close()


class StepTimer:
    """EMA per-step wall timing (reference train/iter_time analogue)."""

    def __init__(self, ema: float = 0.6):
        self.ema = ema
        self.value: Optional[float] = None
        self._t0: Optional[float] = None

    def __enter__(self):
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        dt = time.perf_counter() - self._t0
        self.value = dt if self.value is None else (
            self.ema * self.value + (1 - self.ema) * dt
        )
        return False


@contextlib.contextmanager
def profile_trace(log_dir: str):
    """Capture a device trace viewable in tensorboard / parsable by top_ops."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def top_ops(trace_dir: str, k: int = 20, steps: int = 1, device_only: bool = True):
    """[(total_ms_per_step, op_name)] from a captured trace directory.

    device_only keeps events on TPU/device pids (XLA op timeline) and drops
    host Python/runtime threads, which otherwise drown the listing in
    tracing/compile frames."""
    totals = {}
    for f in glob.glob(f"{trace_dir}/**/*.trace.json.gz", recursive=True):
        data = json.load(gzip.open(f))
        events = data.get("traceEvents", [])
        dev_pids = {
            ev.get("pid")
            for ev in events
            if ev.get("ph") == "M"
            and ev.get("name") == "process_name"
            and "TPU" in str(ev.get("args", {}).get("name", ""))
        }
        for ev in events:
            if ev.get("ph") == "X" and "dur" in ev:
                if device_only and dev_pids and ev.get("pid") not in dev_pids:
                    continue
                name = ev.get("name", "?")
                totals[name] = totals.get(name, 0) + ev["dur"]
    out = sorted(
        ((dur / 1e3 / steps, name) for name, dur in totals.items()),
        reverse=True,
    )
    return out[:k]
