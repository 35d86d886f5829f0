"""Metrics sink: W&B-compatible logging with a local JSONL fallback.

The reference's only sink is wandb (brax_rodent_run_ppo.py:122-132,197;
SURVEY.md §5 "Metrics / logging"). Here the same ``log(metrics, step)`` /
``log_video(path, step)`` surface works with or without wandb installed:
scalars always go to ``<logdir>/<run>/metrics.jsonl`` (one JSON object per
line, with ``step`` and wall ``time``), videos are copied under the run
dir, and both are mirrored to wandb when it is importable and enabled.
Only process 0 of a multi-host run should construct a sink.
"""

from __future__ import annotations

import json
import os
import shutil
import time
from typing import Any, Dict, Optional


def _try_wandb():
  try:
    import wandb  # type: ignore
    return wandb
  except Exception:
    return None


class MetricsSink:
  def __init__(self, logdir: str, run_name: str, project: str = "",
               config: Optional[Dict[str, Any]] = None,
               use_wandb: bool = True):
    self.dir = os.path.join(logdir, run_name)
    os.makedirs(self.dir, exist_ok=True)
    self._f = open(os.path.join(self.dir, "metrics.jsonl"), "a")
    self._t0 = time.time()
    self._wandb = _try_wandb() if use_wandb else None
    self._wandb_run = None
    if self._wandb is not None:
      try:
        self._wandb_run = self._wandb.init(
            project=project or None, name=run_name, config=config or {})
      except Exception:
        self._wandb = None
    if config is not None:
      with open(os.path.join(self.dir, "config.json"), "w") as f:
        json.dump(config, f, indent=2, default=str)

  def log(self, metrics: Dict[str, Any], step: int) -> None:
    row = {"step": int(step), "time": time.time() - self._t0}
    for k, v in metrics.items():
      try:
        row[k] = float(v)
      except (TypeError, ValueError):
        row[k] = str(v)
    self._f.write(json.dumps(row) + "\n")
    self._f.flush()
    if self._wandb_run is not None:
      self._wandb_run.log(metrics, step=int(step))

  def log_video(self, path: str, step: int, fps: int = 50,
                key: str = "eval/rollout") -> None:
    ext = os.path.splitext(path)[1] or ".mp4"
    dst = os.path.join(self.dir, f"video_{step:012d}{ext}")
    if os.path.abspath(path) != os.path.abspath(dst):
      shutil.copyfile(path, dst)
    if self._wandb_run is not None:
      self._wandb_run.log(
          {key: self._wandb.Video(dst, fps=fps, format=ext.lstrip("."))},
          step=int(step))

  def close(self) -> None:
    self._f.close()
    if self._wandb_run is not None:
      self._wandb_run.finish()
