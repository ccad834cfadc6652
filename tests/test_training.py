import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffusion_uncertainty_tpu.diffusion import SamplerConfig, make_schedule, sample_ddim
from diffusion_uncertainty_tpu.diffusion.schedule import spaced_timesteps
from diffusion_uncertainty_tpu.training import (
    FinetuneNoiseConfig,
    ScoreUncertaintyConfig,
    ScoreUncertaintyTrainer,
    make_finetune_step,
)
from diffusion_uncertainty_tpu.uncertainty.guidance import make_score_model_gradient_guidance


def test_score_uncertainty_model_trains():
    cfg = ScoreUncertaintyConfig(in_channels=3, num_timesteps=10, image_size=8)
    trainer = ScoreUncertaintyTrainer(cfg)
    state = trainer.init(jax.random.key(0))

    # learnable synthetic task: u = |score| + t-dependent offset
    rng = np.random.RandomState(0)
    score = jnp.asarray(rng.randn(16, 8, 8, 3).astype(np.float32))
    t_idx = jnp.asarray(rng.randint(0, 10, 16))
    target = jnp.abs(score).mean(axis=-1, keepdims=True) + 0.1 * t_idx[:, None, None, None]

    losses = []
    for _ in range(30):
        state, loss = trainer.train_step(state, score, t_idx, target)
        losses.append(float(loss))
    assert losses[-1] < losses[0] * 0.9
    assert float(trainer.eval_step(state, score, t_idx, target)) == pytest.approx(
        losses[-1], rel=0.5
    )


def test_finetune_noise_step_decreases_loss():
    sched = make_schedule("linear", 100)

    # toy linear "unet": eps_hat = W * x_t, trainable W
    def model_apply(params, x, t, y):
        return params["w"] * x

    params = {"w": jnp.asarray(0.0)}
    cfg = FinetuneNoiseConfig(M=3, lr=0.1, time_zone="all", mode="min", optimizer="sgd")
    init_fn, step_fn = make_finetune_step(model_apply, sched, cfg)
    state = init_fn(params)

    x0 = jax.random.uniform(jax.random.key(0), (8, 8, 8, 3), minval=-1, maxval=1)
    losses = []
    for i in range(10):
        state, loss = step_fn(state, x0, None, jax.random.key(i))
        losses.append(float(loss))
    assert losses[-1] < losses[0]
    assert np.isfinite(losses).all()


def test_finetune_time_zones():
    sched = make_schedule("linear", 100)
    model_apply = lambda p, x, t, y: 0.1 * x
    for zone in ("start", "middle", "end", "all"):
        cfg = FinetuneNoiseConfig(M=2, time_zone=zone)
        init_fn, step_fn = make_finetune_step(model_apply, sched, cfg)
        state = init_fn({"dummy": jnp.zeros(())})
        _, loss = step_fn(state, jnp.ones((2, 8, 8, 3)), None, jax.random.key(0))
        assert np.isfinite(float(loss)), zone


def test_score_model_gradient_guidance_in_sampler():
    sched = make_schedule("linear", 1000)
    cfg = ScoreUncertaintyConfig(in_channels=3, num_timesteps=10, image_size=8)
    trainer = ScoreUncertaintyTrainer(cfg)
    state = trainer.init(jax.random.key(0))
    ts = spaced_timesteps(1000, 10)

    g = make_score_model_gradient_guidance(trainer.apply_fn(state), ts)
    model_fn = lambda x, t, k: 0.2 * x
    scfg = SamplerConfig(num_inference_steps=10, after_step=3, num_steps_uc=3)
    res = sample_ddim(model_fn, sched, jnp.ones((2, 8, 8, 3)), jax.random.key(1), scfg, guidance=g)
    assert bool(jnp.all(jnp.isfinite(res.sample)))
    assert res.uncertainty.shape == (3, 2, 8, 8, 3)


def test_p_losses_objectives_and_minsnr():
    from diffusion_uncertainty_tpu.training.ddpm_trainer import DDPMTrainConfig, p_losses

    sched = make_schedule("linear", 100)
    model = lambda p, x, t, y: p["w"] * x
    params = {"w": jnp.asarray(0.5)}
    x0 = jax.random.uniform(jax.random.key(0), (4, 8, 8, 3), minval=-1, maxval=1)
    t = jnp.asarray([10, 40, 70, 90])
    for obj in ("pred_noise", "pred_x0", "pred_v"):
        for gamma in (None, 5.0):
            cfg = DDPMTrainConfig(objective=obj, min_snr_gamma=gamma)
            loss = p_losses(model, params, sched, x0, t, jax.random.key(1), cfg)
            assert np.isfinite(float(loss)) and float(loss) > 0, (obj, gamma)


def test_ddpm_train_step_learns_oracle():
    """A linear model eps_hat = w*x_t on pure-noise targets should move w."""
    from diffusion_uncertainty_tpu.training.ddpm_trainer import (
        DDPMTrainConfig,
        make_train_step,
    )

    sched = make_schedule("linear", 100)
    model = lambda p, x, t, y: p["w"] * x
    cfg = DDPMTrainConfig(lr=0.05)
    init_fn, step_fn = make_train_step(model, sched, cfg)
    state = init_fn({"w": jnp.asarray(0.0)})
    x0 = jax.random.uniform(jax.random.key(2), (8, 8, 8, 3), minval=-1, maxval=1)
    losses = []
    for i in range(20):
        state, loss = step_fn(state, x0, None, jax.random.key(i))
        losses.append(float(loss))
    assert losses[-1] < losses[0]
    assert float(state.params["w"]) != 0.0


def test_hybrid_learned_variance_loss():
    from diffusion_uncertainty_tpu.training.ddpm_trainer import DDPMTrainConfig, p_losses

    sched = make_schedule("linear", 100)

    def model6(p, x, t, y):
        return jnp.concatenate([p["w"] * x, jnp.zeros_like(x)], axis=-1)

    cfg = DDPMTrainConfig(learned_variance=True)
    loss = p_losses(model6, {"w": jnp.asarray(0.1)}, sched,
                    jax.random.uniform(jax.random.key(3), (2, 8, 8, 3)),
                    jnp.asarray([5, 50]), jax.random.key(4), cfg)
    assert np.isfinite(float(loss))
