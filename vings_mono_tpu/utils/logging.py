"""Optional experiment logging — the reference's Wandber
(/root/reference/scripts/gaussian/wandb_utils.py) kept wandb optional behind
`use_wandb`; here the same logger also falls back to a local JSONL metrics
file so headless runs always keep a record."""

from __future__ import annotations

import json
import os
import time


class Logger:
    def __init__(self, cfg, run_name="run", save_dir=None):
        self.enabled_wandb = bool(cfg.get("use_wandb"))
        self.wandb = None
        if self.enabled_wandb:
            try:
                import wandb
                self.wandb = wandb
                wandb.init(project=cfg.get("wandb_project", "vings_tpu"),
                           name=run_name, config=cfg)
            except Exception:
                self.wandb = None
        self.jsonl = None
        if save_dir:
            self.jsonl = open(os.path.join(save_dir, "metrics.jsonl"), "a")
        self._timers = {}

    def log_once(self, name, value, step=None):
        if self.wandb is not None:
            self.wandb.log({name: value}, step=step)
        if self.jsonl is not None:
            self.jsonl.write(json.dumps(
                {"t": time.time(), "name": name, "value": float(value),
                 "step": step}) + "\n")
            self.jsonl.flush()

    def log_time(self, name):
        """Paired-call stage timer (wandb_utils.py:30-45 semantics)."""
        now = time.perf_counter()
        if name in self._timers:
            self.log_once(f"time/{name}_ms",
                          (now - self._timers.pop(name)) * 1e3)
        else:
            self._timers[name] = now
