"""Per-timestep per-pixel uncertainty thresholds from saved runs.

Parity: reference ``scripts/compute_threshold_pixel_wise.py:43-116`` — for
each window step, the per-pixel value at the ``perc`` quantile across the run's
N samples (order-statistic, sort-based). Output:
``results/thresholds/<dataset>/thresholds_<scheduler_type>_perc=<p>.npz``
with ``data`` of shape [num_steps_uc, H, W, C] (NHWC here; the reference
stores NCHW) plus a ``window_offset`` scalar: row j of ``data`` is the
threshold for GLOBAL inference step ``window_offset + j`` of the producing
run (its ``start_step_uc``). Consumers (``generate_guided``) subtract the
stamped offset before indexing, so tables from windowed runs line up with
the reference's global-step contract (it asserts
``threshold.shape[0] == timesteps.shape[0]`` and reads ``threshold[i]``,
``...posterior_distribution.py:121-122``) without requiring
``start_step_uc=0`` producers.
"""

from __future__ import annotations

import dataclasses
import sys
from pathlib import Path

import numpy as np
import yaml

from ..utils import paths
from ..utils.config import parse_config
from ..utils.experiments import load_run_arrays
from ..utils.logging import get_logger

log = get_logger(__name__)


@dataclasses.dataclass
class Config:
    run_dirs: tuple = ()
    perc: float = 0.15


def compute_thresholds(uncertainty: np.ndarray, perc: float) -> np.ndarray:
    """[N, T, ...] -> [T, ...]: the value ranked at floor(N·perc) per pixel,
    matching the reference's argsort/gather order statistic (``:90-100``)."""
    n = uncertainty.shape[0]
    k = int(n * perc)
    return np.sort(uncertainty, axis=0)[k]


def main(argv=None):
    cfg = parse_config(Config, argv)
    if not cfg.run_dirs:
        raise SystemExit("--run-dirs required (comma-separated run folders)")
    run_dirs = []
    for d in cfg.run_dirs:
        p = Path(d)
        if not p.exists():
            p = paths.score_uncertainty() / d
        if not p.exists():
            raise FileNotFoundError(d)
        run_dirs.append(p)

    meta = yaml.safe_load((run_dirs[0] / "args.yaml").read_text())
    uncertainty = np.concatenate([load_run_arrays(d, "uncertainty") for d in run_dirs], axis=0)
    log.info("loaded uncertainty %s from %d runs", uncertainty.shape, len(run_dirs))

    thresholds = compute_thresholds(uncertainty, cfg.perc)
    out_dir = paths.ensure(paths.thresholds() / meta["dataset"])
    name = f"thresholds_{meta['scheduler_type']}_perc={cfg.perc}"
    np.savez(
        out_dir / f"{name}.npz",
        data=thresholds,
        window_offset=np.int32(meta.get("start_step_uc", 0)),
    )
    with open(out_dir / f"config_{meta['scheduler_type']}_perc={cfg.perc}.yaml", "w") as f:
        yaml.safe_dump({**dataclasses.asdict(cfg), "run_dirs": [str(d) for d in run_dirs], "dataset_config": meta}, f)
    log.info("saved thresholds %s -> %s", thresholds.shape, out_dir / name)
    return out_dir / f"{name}.npz"


if __name__ == "__main__":
    main(sys.argv[1:])
