import numpy as np
import jax.numpy as jnp
import pytest

from diffusion_uncertainty_tpu.diffusion import (
    make_betas,
    make_schedule,
    spaced_timesteps,
    uncertainty_window,
    cosine_schedule,
)


def test_linear_betas_endpoints():
    b = make_betas("linear", 1000, 0.0001, 0.02)
    assert b[0] == pytest.approx(0.0001)
    assert b[-1] == pytest.approx(0.02)
    assert np.all(np.diff(b) > 0)


def test_scaled_linear_betas():
    b = make_betas("scaled_linear", 1000, 0.00085, 0.012)
    assert b[0] == pytest.approx(0.00085)
    assert b[-1] == pytest.approx(0.012)
    # interior point is the square of the sqrt-space linspace
    mid = (np.sqrt(0.00085) + np.sqrt(0.012)) / 2
    assert b[499] == pytest.approx(mid**2, rel=1e-2)


def test_cosine_schedule_matches_alpha_bar():
    import math

    b = cosine_schedule(100)
    # alpha_bar after cumprod should approximate cos^2 curve
    ab = np.cumprod(1 - b)
    f = lambda t: math.cos((t + 0.008) / 1.008 * math.pi / 2) ** 2
    assert ab[49] == pytest.approx(f(50 / 100) / f(0), rel=1e-6)
    assert b.max() <= 0.999


def test_alphas_cumprod_and_final_alpha():
    s = make_schedule("linear", 100)
    assert s.alphas_cumprod.shape == (100,)
    assert float(s.final_alpha_cumprod) == 1.0
    s2 = make_schedule("linear", 100, set_alpha_to_one=False)
    assert float(s2.final_alpha_cumprod) == pytest.approx(float(s2.alphas_cumprod[0]))
    # t < 0 resolves to final_alpha_cumprod
    assert float(s.alpha_bar(jnp.asarray(-10))) == 1.0
    assert float(s.alpha_bar(jnp.asarray(5))) == pytest.approx(float(s.alphas_cumprod[5]))


def test_add_noise_formula():
    s = make_schedule("linear", 1000)
    x0 = jnp.ones((2, 4, 4, 3))
    noise = jnp.full((2, 4, 4, 3), 2.0)
    t = jnp.asarray(500)
    out = np.asarray(s.add_noise(x0, noise, t))
    ab = float(s.alphas_cumprod[500])
    expected = np.sqrt(ab) * 1.0 + np.sqrt(1 - ab) * 2.0
    np.testing.assert_allclose(out, expected, rtol=1e-6)


def test_add_noise_per_sample_t():
    s = make_schedule("linear", 1000)
    x0 = jnp.zeros((3, 2, 2, 1))
    noise = jnp.ones((3, 2, 2, 1))
    t = jnp.asarray([10, 500, 990])
    out = np.asarray(s.add_noise(x0, noise, t))
    for i, ti in enumerate([10, 500, 990]):
        np.testing.assert_allclose(
            out[i], np.sqrt(1 - float(s.alphas_cumprod[ti])), rtol=1e-6
        )


def test_spacing_leading():
    # reference formula: arange(n) * (T // n), descending (+ steps_offset)
    ts = spaced_timesteps(1000, 50, "leading")
    assert ts.shape == (50,)
    assert ts[0] == 980 and ts[-1] == 0
    assert np.all(np.diff(ts) == -20)


def test_spacing_trailing():
    ts = spaced_timesteps(1000, 50, "trailing")
    assert ts[0] == 999 and ts[-1] == 19
    assert np.all(np.diff(ts) == -20)


def test_spacing_linspace():
    ts = spaced_timesteps(1000, 50, "linspace")
    assert ts[0] == 999 and ts[-1] == 0
    assert np.all(np.diff(ts) < 0)


def test_spacing_rejects_too_many_steps():
    with pytest.raises(ValueError):
        spaced_timesteps(100, 101, "leading")


def test_uncertainty_window():
    # reference anchors: timesteps[after_step] .. timesteps[after_step+num_uc-1]
    # inclusive == step indices [after_step, after_step+num_uc)
    assert uncertainty_window(40, 10, 50) == (40, 50)
    assert uncertainty_window(0, 5, 50) == (0, 5)
    with pytest.raises(ValueError):
        uncertainty_window(10, -1, 50)
