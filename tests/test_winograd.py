"""Winograd F(2,3) conv kernel (ops/winograd_conv.py) — interpret-mode checks.

The kernel targets the reference's wall-to-wall 3x3/stride-1 ResBlock convs
(``guided_diffusion/unet_openai.py:144-258``); these tests run the pallas
path in interpret mode on CPU and compare against ``lax.conv``.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffusion_uncertainty_tpu.ops import winograd_conv as wc


def _rand(shape, dtype, seed):
    return jax.random.normal(jax.random.key(seed), shape, jnp.float32).astype(dtype)


@pytest.mark.parametrize("res", [False, True])
def test_matches_lax_conv(res):
    x = _rand((8, 8, 16, 128), jnp.float32, 0)
    w = _rand((3, 3, 128, 128), jnp.float32, 1) * 0.05
    b = _rand((128,), jnp.float32, 2)
    r = _rand((8, 8, 16, 128), jnp.float32, 3) if res else None
    ref = wc._reference_conv(x, w, b, r)
    got = wc.conv3x3_winograd(x, w, b, r, use_pallas=True)
    # the kernel's only rounding vs f32 direct conv is the bf16 MXU operands
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=0, atol=0.05)


def test_multi_kc_and_rect():
    x = _rand((8, 12, 32, 128), jnp.float32, 4)
    w = _rand((3, 3, 128, 256), jnp.float32, 5) * 0.05
    b = _rand((256,), jnp.float32, 6)
    ref = wc._reference_conv(x, w, b, None)
    got = wc.conv3x3_winograd(x, w, b, None, use_pallas=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=0, atol=0.05)


def test_bf16_storage():
    x = _rand((8, 8, 16, 128), jnp.bfloat16, 7)
    w = _rand((3, 3, 128, 128), jnp.bfloat16, 8) * 0.05
    b = _rand((128,), jnp.bfloat16, 9)
    ref = wc._reference_conv(x, w, b, None).astype(jnp.float32)
    got = wc.conv3x3_winograd(x, w, b, None, use_pallas=True).astype(jnp.float32)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=0, atol=0.1)


def test_vmap_folds_into_batch():
    """Mapped axes must fold into the kernel's batch grid (CLAUDE rule: the
    default pallas batching rule multiplies VMEM blocks by the mapped size)."""
    x = _rand((3, 8, 8, 16, 128), jnp.float32, 10)
    w = _rand((3, 3, 128, 128), jnp.float32, 11) * 0.05
    b = jnp.zeros((128,), jnp.float32)
    got = jax.vmap(lambda xi: wc.conv3x3_winograd(xi, w, b, None, use_pallas=True))(x)
    ref = jax.vmap(lambda xi: wc._reference_conv(xi, w, b, None))(x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=0, atol=0.05)


def test_vjp_uses_xla_math():
    """Gradient-mode guidance differentiates through the model (reference
    uncertainty_guidance.py:122-129); the kernel's VJP is exact XLA conv math."""
    x = _rand((8, 8, 16, 128), jnp.float32, 12)
    w = _rand((3, 3, 128, 128), jnp.float32, 13) * 0.05
    b = jnp.zeros((128,), jnp.float32)
    g = jax.grad(lambda xx: float(0) + jnp.sum(wc.conv3x3_winograd(xx, w, b, None, use_pallas=True) ** 2))(x)
    gref = jax.grad(lambda xx: jnp.sum(wc._reference_conv(xx, w, b, None) ** 2))(x)
    np.testing.assert_allclose(np.asarray(g), np.asarray(gref), rtol=0, atol=0.2)


def test_supports_gate():
    assert wc.supports((8, 8, 16, 128), (3, 3, 128, 128), (1, 1), (1, 1))
    # stride-2 / 1x1 / ragged channels fall back
    assert not wc.supports((8, 8, 16, 128), (3, 3, 128, 128), (2, 2), (1, 1))
    assert not wc.supports((8, 8, 16, 128), (1, 1, 128, 128), (1, 1), (1, 1))
    assert not wc.supports((8, 8, 16, 96), (3, 3, 96, 128), (1, 1), (1, 1))
    assert not wc.supports((8, 8, 16, 128), (3, 3, 128, 6), (1, 1), (1, 1))
    # odd height (not a multiple of the row tile)
    assert not wc.supports((8, 6, 16, 128), (3, 3, 128, 128), (1, 1), (1, 1))


def test_fallback_identical_off_tpu():
    """use_pallas=None on CPU routes to lax.conv — bit-identical to ref."""
    x = _rand((2, 8, 8, 128), jnp.float32, 14)
    w = _rand((3, 3, 128, 128), jnp.float32, 15) * 0.05
    b = _rand((128,), jnp.float32, 16)
    got = wc.conv3x3_winograd(x, w, b, None)
    ref = wc._reference_conv(x, w, b, None)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))
