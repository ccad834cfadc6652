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


class _NumpyLossSecondMoment:
    """Independent replica of iddpm resample.py:124-154 semantics (not a copy:
    re-derived from the documented protocol) used as the oracle."""

    def __init__(self, num_timesteps, history_per_term=10, uniform_prob=0.001):
        self.h = history_per_term
        self.p_u = uniform_prob
        self.hist = np.zeros((num_timesteps, history_per_term), np.float64)
        self.counts = np.zeros(num_timesteps, np.int64)

    def weights(self):
        if not (self.counts == self.h).all():
            return np.full(len(self.counts), 1.0 / len(self.counts))
        w = np.sqrt((self.hist**2).mean(-1))
        w /= w.sum()
        return w * (1 - self.p_u) + self.p_u / len(w)

    def update(self, ts, losses):
        for t, l in zip(ts, losses):
            if self.counts[t] == self.h:
                self.hist[t, :-1] = self.hist[t, 1:]
                self.hist[t, -1] = l
            else:
                self.hist[t, self.counts[t]] = l
                self.counts[t] += 1


def test_loss_second_moment_sampler_matches_reference_semantics():
    from diffusion_uncertainty_tpu.training.resample import (
        init_sampler_state,
        sampler_weights,
        update_sampler_state,
    )

    T, H = 7, 3
    state = init_sampler_state(T, H)
    oracle = _NumpyLossSecondMoment(T, H)
    rng = np.random.RandomState(0)
    update = jax.jit(update_sampler_state)
    # several batches incl. duplicate timesteps within a batch
    for _ in range(12):
        t = rng.randint(0, T, size=6)
        losses = rng.rand(6).astype(np.float32)
        state = update(state, jnp.asarray(t), jnp.asarray(losses))
        oracle.update(t, losses)
        np.testing.assert_allclose(
            np.asarray(sampler_weights(state)), oracle.weights(), rtol=1e-5
        )
    np.testing.assert_allclose(np.asarray(state.loss_history), oracle.hist, rtol=1e-6)
    assert (np.asarray(state.loss_counts) == oracle.counts).all()


def test_sample_timesteps_importance_weights_unbiased():
    from diffusion_uncertainty_tpu.training.resample import (
        init_sampler_state,
        sample_timesteps,
        sampler_weights,
        update_sampler_state,
    )

    T, H = 5, 2
    state = init_sampler_state(T, H)
    # warm up fully with known losses so p is non-uniform
    for i in range(H):
        state = update_sampler_state(
            state, jnp.arange(T), jnp.asarray(np.linspace(0.1, 2.0, T), np.float32)
        )
    p = np.asarray(sampler_weights(state))
    assert p.std() > 0  # warmed-up -> non-uniform
    assert p.sum() == pytest.approx(1.0, abs=1e-5)
    t, iw = sample_timesteps(state, jax.random.key(0), 4096, T)
    # exact unbiasedness identity: iw == 1/(T*p[t])
    np.testing.assert_allclose(np.asarray(iw), 1.0 / (T * p[np.asarray(t)]), rtol=1e-5)
    # and empirically E[iw] ~= 1 (sum_t p_t * 1/(T p_t) = 1)
    assert float(np.mean(np.asarray(iw))) == pytest.approx(1.0, rel=0.1)
    # uniform sampler: state=None
    t_u, iw_u = sample_timesteps(None, jax.random.key(1), 128, T)
    assert (np.asarray(iw_u) == 1.0).all()
    assert np.asarray(t_u).max() < T


def test_train_step_with_loss_second_moment_sampler():
    from diffusion_uncertainty_tpu.training.ddpm_trainer import (
        DDPMTrainConfig,
        make_train_step,
    )

    sched = make_schedule("linear", 20)
    model = lambda p, x, t, y: p["w"] * x
    cfg = DDPMTrainConfig(lr=0.05, schedule_sampler="loss-second-moment",
                          sampler_history_per_term=2)
    init_fn, step_fn = make_train_step(model, sched, cfg)
    state = init_fn({"w": jnp.asarray(0.0)})
    x0 = jax.random.uniform(jax.random.key(2), (8, 8, 8, 3), minval=-1, maxval=1)
    losses = []
    for i in range(25):
        state, loss = step_fn(state, x0, None, jax.random.key(i))
        losses.append(float(loss))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]
    # history actually filled
    assert int(np.asarray(state.sampler.loss_counts).min()) >= 1
    with pytest.raises(ValueError):
        make_train_step(model, sched, DDPMTrainConfig(schedule_sampler="nope"))


def test_p_losses_per_example_matches_mean():
    from diffusion_uncertainty_tpu.training.ddpm_trainer import DDPMTrainConfig, p_losses

    sched = make_schedule("linear", 100)
    model = lambda p, x, t, y: p["w"] * x
    params = {"w": jnp.asarray(0.5)}
    x0 = jax.random.uniform(jax.random.key(0), (4, 8, 8, 3), minval=-1, maxval=1)
    t = jnp.asarray([10, 40, 70, 90])
    cfg = DDPMTrainConfig()
    per = p_losses(model, params, sched, x0, t, jax.random.key(1), cfg, per_example=True)
    assert per.shape == (4,)
    mean = p_losses(model, params, sched, x0, t, jax.random.key(1), cfg)
    assert float(jnp.mean(per)) == pytest.approx(float(mean), rel=1e-6)


def test_ema_params_track_toward_current():
    from diffusion_uncertainty_tpu.training.ddpm_trainer import (
        DDPMTrainConfig,
        make_train_step,
    )

    sched = make_schedule("linear", 20)
    model = lambda p, x, t, y: p["w"] * x
    cfg = DDPMTrainConfig(lr=0.1, ema_rates=(0.9, 0.999))
    init_fn, step_fn = make_train_step(model, sched, cfg)
    w0 = jnp.asarray(0.0)
    state = init_fn({"w": w0})
    assert len(state.ema_params) == 2
    x0 = jax.random.uniform(jax.random.key(0), (8, 8, 8, 3), minval=-1, maxval=1)
    # track the exact EMA recurrence alongside
    ref = [0.0, 0.0]
    for i in range(10):
        state, _ = step_fn(state, x0, None, jax.random.key(i))
        w = float(state.params["w"])
        for j, rate in enumerate((0.9, 0.999)):
            ref[j] = ref[j] + (1 - rate) * (w - ref[j])
    assert float(state.params["w"]) != 0.0
    for j in range(2):
        assert float(state.ema_params[j]["w"]) == pytest.approx(ref[j], rel=1e-5)
    # faster rate is closer to the live params
    d_fast = abs(float(state.ema_params[0]["w"]) - float(state.params["w"]))
    d_slow = abs(float(state.ema_params[1]["w"]) - float(state.params["w"]))
    assert d_fast < d_slow
