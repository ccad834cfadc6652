"""Tabular summary of all runs from their args.yaml metadata.

Parity: reference ``scripts/summary_experiments.py`` (pandas pivot of run
metadata) and ``scripts/clean_empty_runs.py`` (``--clean`` flag here).
"""

from __future__ import annotations

import dataclasses
import sys

import yaml

from ..utils import paths
from ..utils.config import parse_config
from ..utils.experiments import clean_empty_runs

KEYS = ("dataset", "scheduler_type", "num_samples", "M", "generation_steps", "start_step_uc", "num_steps_uc")


@dataclasses.dataclass
class Config:
    clean: bool = False


def main(argv=None):
    cfg = parse_config(Config, argv)
    if cfg.clean:
        removed = clean_empty_runs()
        print(f"removed {len(removed)} empty runs")
    base = paths.score_uncertainty()
    rows = []
    if base.exists():
        for run in sorted(base.iterdir()):
            meta_file = run / "args.yaml"
            if not meta_file.exists():
                continue
            meta = yaml.safe_load(meta_file.read_text()) or {}
            n_shards = len(list(run.glob("uncertainty_*.npz")))
            rows.append([run.name] + [meta.get(k, "-") for k in KEYS] + [n_shards])
    header = ["run"] + list(KEYS) + ["shards"]
    widths = [max(len(str(r[i])) for r in [header] + rows) for i in range(len(header))] if rows else []
    if not rows:
        print("no runs found under", base)
        return []
    for r in [header] + rows:
        print("  ".join(str(v).ljust(w) for v, w in zip(r, widths)))
    return rows


if __name__ == "__main__":
    main(sys.argv[1:])
