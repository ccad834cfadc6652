"""Train the surrogate uncertainty model on saved (score, uncertainty) runs.

Parity: the reference trains ``ScoreUncertaintyModel`` with Lightning on
tensors produced by the generation runs (``score_uncertainty_model.py:83-108``;
consumed by the ``score_uncertainty_model_gradient`` scheduler). Here: load a
run's score/uncertainty shards, map window timesteps to step indices, train
with the optax trainer, save an orbax checkpoint under
``results/score-uncertainty-models/<dataset>/``.
"""

from __future__ import annotations

import dataclasses
import sys
from pathlib import Path

import numpy as np

from ..training.score_uncertainty import ScoreUncertaintyConfig, ScoreUncertaintyTrainer
from ..utils import paths
from ..utils.checkpoint import save_params
from ..utils.config import parse_config, save_config
from ..utils.experiments import load_run_arrays
from ..utils.logging import get_logger

log = get_logger(__name__)


@dataclasses.dataclass
class Config:
    run_dir: str = ""
    epochs: int = 5
    batch_size: int = 64
    learning_rate: float = 1e-3
    optimizer: str = "adam"
    val_fraction: float = 0.1
    seed: int = 0


def main(argv=None):
    import jax
    import jax.numpy as jnp
    import yaml

    cfg = parse_config(Config, argv)
    if not cfg.run_dir:
        raise SystemExit("--run-dir required (a generation run with score_*.npz shards)")
    run = Path(cfg.run_dir)
    meta = yaml.safe_load((run / "args.yaml").read_text())

    scores = load_run_arrays(run, "score")  # [N, W, H, W, C]
    uncert = load_run_arrays(run, "uncertainty")
    n, w = scores.shape[:2]
    image_size = scores.shape[2]
    # flatten (sample, window-step) pairs; target is the channel-mean map
    x = scores.reshape(n * w, *scores.shape[2:]).astype(np.float32)
    u = uncert.reshape(n * w, *uncert.shape[2:]).mean(axis=-1, keepdims=True).astype(np.float32)
    t_idx = np.tile(np.arange(w, dtype=np.int32), n)

    tcfg = ScoreUncertaintyConfig(
        in_channels=x.shape[-1],
        num_timesteps=w,
        image_size=image_size,
        optimizer=cfg.optimizer,
        learning_rate=cfg.learning_rate,
    )
    trainer = ScoreUncertaintyTrainer(tcfg)
    state = trainer.init(jax.random.key(cfg.seed))

    rng = np.random.RandomState(cfg.seed)
    order = rng.permutation(len(x))
    n_val = max(1, int(len(x) * cfg.val_fraction))
    val_idx, train_idx = order[:n_val], order[n_val:]

    for epoch in range(cfg.epochs):
        rng.shuffle(train_idx)
        losses = []
        for lo in range(0, len(train_idx) - cfg.batch_size + 1, cfg.batch_size):
            sel = train_idx[lo : lo + cfg.batch_size]
            state, loss = trainer.train_step(
                state, jnp.asarray(x[sel]), jnp.asarray(t_idx[sel]), jnp.asarray(u[sel])
            )
            losses.append(float(loss))
        val_loss = float(
            trainer.eval_step(state, jnp.asarray(x[val_idx]), jnp.asarray(t_idx[val_idx]), jnp.asarray(u[val_idx]))
        )
        log.info("epoch %d: train %.5f val %.5f", epoch, float(np.mean(losses)), val_loss)

    out = paths.ensure(paths.results() / "score-uncertainty-models" / meta.get("dataset", "unknown"))
    ckpt = save_params(out / "ckpt", state.params)
    save_config(cfg, out / "train_args.yaml")
    with open(out / "model_config.yaml", "w") as f:
        import yaml as _yaml

        _yaml.safe_dump(dataclasses.asdict(dataclasses.replace(tcfg, dtype=None)), f)
    log.info("saved surrogate checkpoint -> %s", ckpt)
    return ckpt


if __name__ == "__main__":
    main(sys.argv[1:])
