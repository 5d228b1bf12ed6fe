"""Experiment tracking and console logging.

The reference logs to wandb (reference train.py:414-425). wandb is optional
here: when importable and configured it receives the same per-epoch metric
dicts; regardless, every epoch's metrics append to a JSONL file next to the
checkpoints so runs are inspectable without external services.
"""

from __future__ import annotations

import json
import logging
import os
import time
from typing import Dict, Optional

log = logging.getLogger(__name__)


def human_format(num) -> str:
    """1234567 -> '1.2M' (reference common/utils.py:253-259)."""
    num = float(num)
    magnitude = 0
    while abs(num) >= 1000:
        magnitude += 1
        num /= 1000.0
    return "{}{}".format(
        "{:f}".format(num).rstrip("0").rstrip("."),
        ["", "K", "M", "G", "T", "P"][magnitude])


class ExperimentLogger:
    """JSONL metrics log + optional wandb mirror."""

    def __init__(self, out_dir: str, project_name: str, experiment_name: str,
                 use_wandb: bool = True, config: Optional[dict] = None):
        self.out_dir = out_dir
        os.makedirs(out_dir, exist_ok=True)
        self.jsonl_path = os.path.join(out_dir, "metrics.jsonl")
        self._wandb = None
        if use_wandb:
            try:
                import wandb
                self._wandb = wandb
                wandb.init(project=project_name, name=experiment_name,
                           config=config or {})
            except Exception as e:  # not installed / not logged in
                log.info("wandb unavailable (%s); JSONL logging only", e)

    def log(self, metrics: Dict, step: Optional[int] = None):
        payload = {"_time": time.time()}
        if step is not None:
            payload["_step"] = step
        for k, v in metrics.items():
            if v is None:
                continue
            try:
                payload[k] = float(v)
            except (TypeError, ValueError):
                continue
        with open(self.jsonl_path, "a") as f:
            f.write(json.dumps(payload) + "\n")
        if self._wandb is not None:
            self._wandb.log({k: v for k, v in payload.items()
                             if not k.startswith("_")}, step=step)

    def summary(self, key: str, value):
        if self._wandb is not None and self._wandb.run is not None:
            self._wandb.run.summary[key] = value
        # newline-delimited records: append-only across resumed runs
        # (a .json name would become invalid JSON on the second write)
        with open(os.path.join(self.out_dir, "summary.jsonl"), "a") as f:
            f.write(json.dumps({key: value}) + "\n")


class ProfilerHook:
    """jax.profiler trace over a step window (cfg-gated).

    The reference has only hand-rolled host timers (SURVEY §5.1); on TPU the
    device-side picture needs a real trace. Enable with
    ``+profile_dir=/tmp/trace`` (+ optional ``+profile_steps=[10,20]``).
    """

    def __init__(self, trace_dir: Optional[str],
                 start_step: int = 10, stop_step: int = 20):
        self.trace_dir = trace_dir
        self.start_step = start_step
        self.stop_step = stop_step
        self._active = False

    def step(self, step: int):
        if self.trace_dir is None:
            return
        import jax
        if step >= self.start_step and step < self.stop_step \
                and not self._active:
            # >= not ==: a resumed run restores step_counter past
            # start_step and must still honor the requested trace window
            jax.profiler.start_trace(self.trace_dir)
            self._active = True
            log.info("profiler trace started -> %s", self.trace_dir)
        elif step >= self.stop_step and self._active:
            jax.profiler.stop_trace()
            self._active = False
            log.info("profiler trace stopped")

    def close(self):
        if self._active:
            import jax
            jax.profiler.stop_trace()
            self._active = False
