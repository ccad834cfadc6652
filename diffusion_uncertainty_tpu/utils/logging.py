"""Structured logging + JSON metrics sink.

The reference logs via bare ``print`` (even inside schedulers,
``scheduling_ddim_uncertainty_threshold.py:542-547``) and writes ad-hoc JSON
(``results/times.json``, ``results/fid_scores.json``). We keep the JSON result
files as the cross-script interface but route them through one sink with
append/merge semantics, and use stdlib logging for text.
"""

from __future__ import annotations

import json
import logging
import sys
import time
from pathlib import Path
from typing import Any

__all__ = ["get_logger", "MetricsSink", "Timer"]

_FORMAT = "%(asctime)s %(levelname).1s %(name)s] %(message)s"


def get_logger(name: str = "du_tpu", level: int = logging.INFO) -> logging.Logger:
    logger = logging.getLogger(name)
    if not logger.handlers:
        h = logging.StreamHandler(sys.stderr)
        h.setFormatter(logging.Formatter(_FORMAT, datefmt="%H:%M:%S"))
        logger.addHandler(h)
        logger.setLevel(level)
        logger.propagate = False
    return logger


class MetricsSink:
    """Append structured records to a JSON file (list-of-records layout),
    compatible with the reference's ``results/times.json`` pattern
    (``scripts/measure_times_imagenet.py:125-134``)."""

    def __init__(self, path: str | Path):
        self.path = Path(path)

    def append(self, record: dict[str, Any]) -> None:
        self.path.parent.mkdir(parents=True, exist_ok=True)
        records: list[dict[str, Any]] = []
        if self.path.exists():
            try:
                records = json.loads(self.path.read_text())
            except json.JSONDecodeError:
                records = []
        record = {"ts": time.time(), **record}
        records.append(record)
        self.path.write_text(json.dumps(records, indent=1))


class Timer:
    """Wall-clock context manager; call ``block_until_ready`` on device values
    before exiting the block for honest TPU timings."""

    def __enter__(self):
        self.start = time.perf_counter()
        return self

    def __exit__(self, *exc):
        self.elapsed = time.perf_counter() - self.start
