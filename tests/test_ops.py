import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffusion_uncertainty_tpu.ops.attention import dot_product_attention
from diffusion_uncertainty_tpu.ops.flash_attention import flash_attention, supports
from diffusion_uncertainty_tpu.ops.groupnorm import group_norm_silu


def test_flash_attention_matches_xla():
    # interpret mode on CPU: keep shapes small but tile-legal (S % 128 == 0)
    k1, k2, k3 = jax.random.split(jax.random.key(0), 3)
    q = jax.random.normal(k1, (2, 128, 2, 64), jnp.float32)
    k = jax.random.normal(k2, (2, 128, 2, 64), jnp.float32)
    v = jax.random.normal(k3, (2, 128, 2, 64), jnp.float32)
    ref = dot_product_attention(q, k, v, use_pallas=False)
    out = flash_attention(q, k, v, bq=64, bk=64)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5)


def test_flash_attention_head_dim_padding():
    # head_dim 48 -> padded to 128 internally; result must still match
    k1, k2, k3 = jax.random.split(jax.random.key(1), 3)
    q = jax.random.normal(k1, (1, 128, 1, 48), jnp.float32)
    k = jax.random.normal(k2, (1, 128, 1, 48), jnp.float32)
    v = jax.random.normal(k3, (1, 128, 1, 48), jnp.float32)
    ref = dot_product_attention(q, k, v, use_pallas=False)
    out = flash_attention(q, k, v, bq=128, bk=128)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5)


def test_supports_predicate():
    assert supports((2, 256, 4, 64), jnp.float32)
    assert not supports((2, 100, 4, 64), jnp.float32)  # ragged seq (not 8-aligned)
    assert supports((2, 64, 4, 64), jnp.float32)  # short seq rides sublanes
    assert supports((2, 392, 4, 64), jnp.float32)  # 8-aligned mid seq: whole-q block
    assert supports((4, 1040, 24, 64), jnp.bfloat16, 1040)  # SD3 joint seq, unpadded
    assert not supports((2, 1048, 4, 64), jnp.float32)  # 8x131: degenerate divisors
    assert not supports((2, 256, 4, 64), jnp.int8)
    # cross-attention kv constraints
    assert supports((2, 4096, 8, 64), jnp.bfloat16, 80)  # SD text context (padded 77)
    assert not supports((2, 256, 4, 64), jnp.float32, 77)  # unpadded 77 is ragged


def test_flash_attention_short_sequence_matches_xla():
    """S=64 (ADM's 8x8 attention level) runs the kernel with bq=bk=S instead
    of falling back to XLA (round-2 perf weak #1)."""
    k1, k2, k3 = jax.random.split(jax.random.key(7), 3)
    q = jax.random.normal(k1, (3, 64, 4, 64), jnp.float32)
    k = jax.random.normal(k2, (3, 64, 4, 64), jnp.float32)
    v = jax.random.normal(k3, (3, 64, 4, 64), jnp.float32)
    ref = dot_product_attention(q, k, v, use_pallas=False)
    out = flash_attention(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5)


def test_flash_attention_whole_row_matches_loop_kernel(monkeypatch):
    """S <= 2048 takes the single-pass whole-row softmax kernel; its output
    must match the online-softmax loop kernel (DU_TPU_ATTN_WHOLEROW=0)."""
    k1, k2, k3 = jax.random.split(jax.random.key(11), 3)
    q = jax.random.normal(k1, (2, 256, 2, 64), jnp.float32)
    k = jax.random.normal(k2, (2, 256, 2, 64), jnp.float32)
    v = jax.random.normal(k3, (2, 256, 2, 64), jnp.float32)
    whole = flash_attention(q, k, v, bq=128, bk=128)
    monkeypatch.setenv("DU_TPU_ATTN_WHOLEROW", "0")
    loop = flash_attention(q, k, v, bq=128, bk=128)
    np.testing.assert_allclose(np.asarray(whole), np.asarray(loop), rtol=2e-5, atol=2e-5)
    ref = dot_product_attention(q, k, v, use_pallas=False)
    np.testing.assert_allclose(np.asarray(whole), np.asarray(ref), rtol=2e-5, atol=2e-5)


def test_flash_attention_masked_padding_matches_xla():
    """Misaligned sequences (SD3's image+text joint rows) run the kernel
    zero-padded with trailing keys masked to zero weight — exact parity."""
    from diffusion_uncertainty_tpu.ops.attention import _flash_with_xla_grad, _pad_plan, _xla_attention

    k1, k2, k3 = jax.random.split(jax.random.key(13), 3)
    s = 132  # not 8-aligned -> pads to 136
    q = jax.random.normal(k1, (1, s, 2, 128), jnp.float32)
    k = jax.random.normal(k2, (1, s, 2, 128), jnp.float32)
    v = jax.random.normal(k3, (1, s, 2, 128), jnp.float32)
    from diffusion_uncertainty_tpu.ops.flash_attention import supports
    sp, sp_kv = _pad_plan(q.shape, q.dtype, s, supports)
    assert (sp, sp_kv) == (136, 136)
    # non-lane-aligned head dims decline the padded branch (the transpose +
    # lane-pad + seq-pad stack measurably loses to XLA: U-ViT S=258/d=72 ran
    # 2.67 vs 3.14 imgs/sec before the gate) but keep exact-length support
    assert _pad_plan((1, s, 2, 64), q.dtype, s, supports) == (None, None)
    assert _pad_plan((1, 256, 2, 64), q.dtype, 256, supports) == (256, 256)
    pad = ((0, 0), (0, sp - s), (0, 0), (0, 0))
    out = _flash_with_xla_grad(jnp.pad(q, pad), jnp.pad(k, pad), jnp.pad(v, pad), s)[:, :s]
    ref = _xla_attention(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5)
    # gradient path (masked einsum backward)
    g1 = jax.grad(lambda qq: jnp.sum(
        _flash_with_xla_grad(jnp.pad(qq, pad), jnp.pad(k, pad), jnp.pad(v, pad), s)[:, :s] ** 2
    ))(q)
    g2 = jax.grad(lambda qq: jnp.sum(_xla_attention(qq, k, v) ** 2))(q)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), rtol=2e-4, atol=2e-5)


def test_flash_attention_s384_grid_regression():
    """S=384 passes supports() (%128==0) but the default bq=256 grid left
    rows 256-383 unwritten; bq must fall back to a divisor of S."""
    k1, k2, k3 = jax.random.split(jax.random.key(17), 3)
    q = jax.random.normal(k1, (1, 384, 1, 64), jnp.float32)
    k = jax.random.normal(k2, (1, 384, 1, 64), jnp.float32)
    v = jax.random.normal(k3, (1, 384, 1, 64), jnp.float32)
    ref = dot_product_attention(q, k, v, use_pallas=False)
    out = flash_attention(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5)


def test_group_norm_silu_fallback_matches_flax():
    import flax.linen as nn

    x = jax.random.normal(jax.random.key(2), (2, 8, 8, 64))
    gamma = jnp.ones((64,))
    beta = jnp.zeros((64,))
    ours = group_norm_silu(x, gamma, beta, num_groups=32, use_pallas=False, apply_silu=False)
    ref = nn.GroupNorm(num_groups=32, epsilon=1e-5).apply(
        {"params": {"scale": gamma, "bias": beta}}, x
    )
    np.testing.assert_allclose(np.asarray(ours), np.asarray(ref), rtol=2e-5, atol=2e-5)


def test_group_norm_silu_pallas_matches_fallback():
    x = jax.random.normal(jax.random.key(3), (2, 8, 8, 128))
    gamma = jax.random.normal(jax.random.key(4), (128,)) * 0.1 + 1.0
    beta = jax.random.normal(jax.random.key(5), (128,)) * 0.1
    scale = jax.random.normal(jax.random.key(6), (2, 128)) * 0.1
    shift = jax.random.normal(jax.random.key(7), (2, 128)) * 0.1
    ref = group_norm_silu(x, gamma, beta, scale=scale, shift=shift, use_pallas=False)
    out = group_norm_silu(x, gamma, beta, scale=scale, shift=shift, use_pallas=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5)


def test_group_norm_scale_without_shift_raises():
    x = jnp.ones((1, 4, 4, 64))
    with pytest.raises(ValueError):
        group_norm_silu(x, jnp.ones(64), jnp.zeros(64), scale=jnp.ones((1, 64)))


def test_group_norm_vmap_folds_into_batch():
    """vmapping the fused GN must match the vmapped reference (the custom
    batching rule folds the mapped axis into the batch grid)."""
    x = jax.random.normal(jax.random.key(10), (3, 2, 8, 8, 128))
    g = jnp.ones(128)
    b = jnp.zeros(128)
    out = jax.vmap(lambda xx: group_norm_silu(xx, g, b, use_pallas=True))(x)
    ref = jax.vmap(lambda xx: group_norm_silu(xx, g, b, use_pallas=False))(x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5)


def test_flash_attention_vmap_folds_into_batch():
    q = jax.random.normal(jax.random.key(11), (2, 2, 128, 2, 64))
    out = jax.vmap(lambda a: flash_attention(a, a, a, bq=64, bk=64))(q)
    ref = jax.vmap(lambda a: dot_product_attention(a, a, a, use_pallas=False))(q)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5)


def test_group_norm_hwnc_path_matches_fallback(monkeypatch):
    """The layout-native [HW,N,C] kernel (big-level path) must match the jnp
    reference bit-for-bit-ish, including scale-shift + SiLU."""
    import diffusion_uncertainty_tpu.ops.groupnorm as gnm

    monkeypatch.setattr(gnm, "_VMEM_SLAB_LIMIT", 1)  # force the HWNC branch
    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.randn(8, 16, 16, 256).astype(np.float32))
    g = jnp.asarray(rng.randn(256).astype(np.float32))
    b = jnp.asarray(rng.randn(256).astype(np.float32))
    sc = jnp.asarray(rng.randn(8, 256).astype(np.float32) * 0.1)
    sh = jnp.asarray(rng.randn(8, 256).astype(np.float32) * 0.1)
    out = gnm.group_norm_silu(x, g, b, scale=sc, shift=sh, use_pallas=True)
    ref = gnm.group_norm_silu(x, g, b, scale=sc, shift=sh, use_pallas=False)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5)


def test_group_norm_hwnc_vmap_folds_into_n(monkeypatch):
    import diffusion_uncertainty_tpu.ops.groupnorm as gnm

    monkeypatch.setattr(gnm, "_VMEM_SLAB_LIMIT", 1)
    rng = np.random.RandomState(4)
    x = jnp.asarray(rng.randn(2, 8, 8, 8, 128).astype(np.float32))
    g = jnp.asarray(rng.randn(128).astype(np.float32))
    b = jnp.asarray(rng.randn(128).astype(np.float32))
    out = jax.vmap(lambda xx: gnm.group_norm_silu(xx, g, b, use_pallas=True))(x)
    ref = jax.vmap(lambda xx: gnm.group_norm_silu(xx, g, b, use_pallas=False))(x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("stats_only", ["0", "1"])
def test_group_norm_stats_only_both_branches(monkeypatch, stats_only):
    """The 1R stats kernel + consumer-fused normalize must match the two-pass
    HWNC kernel and the jnp reference, in both env-knob positions, with and
    without the scale-shift epilogue and under a mapped ensemble axis."""
    import diffusion_uncertainty_tpu.ops.groupnorm as gnm

    monkeypatch.setattr(gnm, "_VMEM_SLAB_LIMIT", 1)  # force the HWNC family
    monkeypatch.setenv("DU_TPU_GN_STATS_ONLY", stats_only)
    rng = np.random.RandomState(7)
    x = jnp.asarray(rng.randn(8, 16, 16, 256).astype(np.float32))
    g = jnp.asarray(rng.randn(256).astype(np.float32))
    b = jnp.asarray(rng.randn(256).astype(np.float32))
    sc = jnp.asarray(rng.randn(8, 256).astype(np.float32) * 0.1)
    sh = jnp.asarray(rng.randn(8, 256).astype(np.float32) * 0.1)
    out = gnm.group_norm_silu(x, g, b, scale=sc, shift=sh, use_pallas=True)
    ref = gnm.group_norm_silu(x, g, b, scale=sc, shift=sh, use_pallas=False)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5)
    xm = jnp.asarray(rng.randn(2, 8, 8, 8, 128).astype(np.float32))
    gm = jnp.asarray(rng.randn(128).astype(np.float32))
    bm = jnp.asarray(rng.randn(128).astype(np.float32))
    outm = jax.vmap(lambda xx: gnm.group_norm_silu(xx, gm, bm, use_pallas=True))(xm)
    refm = jax.vmap(lambda xx: gnm.group_norm_silu(xx, gm, bm, use_pallas=False))(xm)
    np.testing.assert_allclose(np.asarray(outm), np.asarray(refm), rtol=2e-5, atol=2e-5)


def test_cross_attention_matches_xla():
    """Cross-attention (kv shorter than q, the SD text context) runs the
    kernel with the 77-token context padded to 80 and masked — must match
    the XLA path exactly (historically this shape faulted the kernel and
    had to fall back)."""
    rng = np.random.RandomState(5)
    q = jnp.asarray(rng.randn(2, 128, 2, 40).astype(np.float32))
    k = jnp.asarray(rng.randn(2, 77, 2, 40).astype(np.float32))
    v = jnp.asarray(rng.randn(2, 77, 2, 40).astype(np.float32))
    out = dot_product_attention(q, k, v, use_pallas=True)
    ref = dot_product_attention(q, k, v, use_pallas=False)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-5, atol=1e-6)
    # and under an ensemble vmap, like the percentile guidance applies it
    outv = jax.vmap(lambda qq: dot_product_attention(qq, k, v, use_pallas=True))(
        jnp.stack([q, q + 0.1])
    )
    refv = jax.vmap(lambda qq: dot_product_attention(qq, k, v, use_pallas=False))(
        jnp.stack([q, q + 0.1])
    )
    np.testing.assert_allclose(np.asarray(outv), np.asarray(refv), rtol=1e-5, atol=1e-6)


def test_flash_attention_gradient_matches_xla():
    """Gradients THROUGH the flash path (gradient guidance differentiates the
    model) must match the XLA attention gradients — the Pallas kernel has a
    custom VJP with standard-attention backward math."""
    rng = np.random.RandomState(6)
    q = jnp.asarray(rng.randn(1, 128, 2, 64).astype(np.float32))
    k = jnp.asarray(rng.randn(1, 128, 2, 64).astype(np.float32))
    v = jnp.asarray(rng.randn(1, 128, 2, 64).astype(np.float32))

    def loss(fn_flag):
        return lambda a, b, c: jnp.sum(
            jnp.sin(dot_product_attention(a, b, c, use_pallas=fn_flag))
        )

    g_flash = jax.grad(loss(True), argnums=(0, 1, 2))(q, k, v)
    g_xla = jax.grad(loss(False), argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g_flash, g_xla):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5)


def test_group_norm_gradient_matches_reference():
    """Gradients through the Pallas GN dispatch (custom VJP with reference
    backward math) must equal the pure-jnp gradients — the gradient guidance
    family differentiates through every norm in the model."""
    import diffusion_uncertainty_tpu.ops.groupnorm as gnm

    rng = np.random.RandomState(7)
    x = jnp.asarray(rng.randn(2, 8, 8, 128).astype(np.float32))
    g = jnp.asarray(rng.randn(128).astype(np.float32))
    b = jnp.asarray(rng.randn(128).astype(np.float32))
    sc = jnp.asarray(rng.randn(2, 128).astype(np.float32) * 0.1)
    sh = jnp.asarray(rng.randn(2, 128).astype(np.float32) * 0.1)

    def loss(flag):
        return lambda xx, gg, bb: jnp.sum(
            jnp.sin(gnm.group_norm_silu(xx, gg, bb, scale=sc, shift=sh, use_pallas=flag))
        )

    got = jax.grad(loss(True), argnums=(0, 1, 2))(x, g, b)
    ref = jax.grad(loss(False), argnums=(0, 1, 2))(x, g, b)
    for a_, r_ in zip(got, ref):
        np.testing.assert_allclose(np.asarray(a_), np.asarray(r_), rtol=1e-4, atol=1e-5)


def test_conv3x3_nearest_up2_matches_naive():
    """Sub-pixel phase decomposition (ops/fused_upsample.py) == conv3x3 over
    the materialized nearest-2x upsample, SAME padding, to f32 roundoff."""
    from diffusion_uncertainty_tpu.models.layers import nearest_upsample
    from diffusion_uncertainty_tpu.ops.fused_upsample import (
        conv3x3_nearest_up2,
        upsample2_conv1x1,
    )

    rng = np.random.RandomState(11)
    x = jnp.asarray(rng.randn(2, 6, 5, 16).astype(np.float32))
    w = jnp.asarray(rng.randn(3, 3, 16, 8).astype(np.float32))
    b = jnp.asarray(rng.randn(8).astype(np.float32))

    got = conv3x3_nearest_up2(x, w, b)
    ref = (
        jax.lax.conv_general_dilated(
            nearest_upsample(x), w, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        + b
    )
    assert got.shape == (2, 12, 10, 8)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-5, atol=1e-5)

    w1 = jnp.asarray(rng.randn(1, 1, 16, 8).astype(np.float32))
    got1 = upsample2_conv1x1(x, w1, b)
    ref1 = (
        jax.lax.conv_general_dilated(
            nearest_upsample(x), w1, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        + b
    )
    np.testing.assert_allclose(np.asarray(got1), np.asarray(ref1), rtol=1e-5, atol=1e-5)


def test_conv3x3_nearest_up2_gradient():
    """Pure-XLA fused form must autodiff identically to the naive form."""
    from diffusion_uncertainty_tpu.models.layers import nearest_upsample
    from diffusion_uncertainty_tpu.ops.fused_upsample import conv3x3_nearest_up2

    rng = np.random.RandomState(12)
    x = jnp.asarray(rng.randn(1, 4, 4, 8).astype(np.float32))
    w = jnp.asarray(rng.randn(3, 3, 8, 8).astype(np.float32))
    b = jnp.zeros((8,), jnp.float32)

    def f_fused(xx, ww):
        return jnp.sum(jnp.tanh(conv3x3_nearest_up2(xx, ww, b)))

    def f_naive(xx, ww):
        y = jax.lax.conv_general_dilated(
            nearest_upsample(xx), ww, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        return jnp.sum(jnp.tanh(y))

    gx, gw = jax.grad(f_fused, argnums=(0, 1))(x, w)
    rx, rw = jax.grad(f_naive, argnums=(0, 1))(x, w)
    np.testing.assert_allclose(np.asarray(gx), np.asarray(rx), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(gw), np.asarray(rw), rtol=1e-4, atol=1e-5)


def test_interleave_phases_pallas_matches_xla():
    """The Pallas phase-interleave kernel (interpret mode off-TPU) == the
    stack+transpose interleave, incl. the vmap fold and the upsample case."""
    from diffusion_uncertainty_tpu.ops.fused_upsample import (
        interleave_phases_2x,
        nearest_upsample_2x,
    )
    from diffusion_uncertainty_tpu.models.layers import nearest_upsample

    rng = np.random.RandomState(13)
    ys = [jnp.asarray(rng.randn(8, 4, 6, 128).astype(np.float32)) for _ in range(4)]
    got = interleave_phases_2x(*ys, use_pallas=True)
    ref = interleave_phases_2x(*ys, use_pallas=False)
    assert got.shape == (8, 8, 12, 128)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=0, atol=0)

    x = jnp.asarray(rng.randn(8, 4, 4, 128).astype(np.float32))
    up = nearest_upsample_2x(x, use_pallas=True)
    np.testing.assert_allclose(np.asarray(up), np.asarray(nearest_upsample(x)), rtol=0, atol=0)

    # vmap folds the mapped axis into N
    ysv = [jnp.asarray(rng.randn(3, 8, 4, 6, 128).astype(np.float32)) for _ in range(4)]
    gotv = jax.vmap(lambda a, b, c, d: interleave_phases_2x(a, b, c, d, use_pallas=True))(*ysv)
    refv = jax.vmap(lambda a, b, c, d: interleave_phases_2x(a, b, c, d, use_pallas=False))(*ysv)
    np.testing.assert_allclose(np.asarray(gotv), np.asarray(refv), rtol=0, atol=0)

    # VJP: strided-slice cotangents; upsample grad sums the 4 phases
    g = jax.grad(lambda xx: jnp.sum(jnp.sin(nearest_upsample_2x(xx, use_pallas=True))))(x)
    r = jax.grad(lambda xx: jnp.sum(jnp.sin(nearest_upsample(xx))))(x)
    np.testing.assert_allclose(np.asarray(g), np.asarray(r), rtol=1e-5, atol=1e-6)


def test_xla_attention_fast_matches_reference():
    """Bandwidth-lean bounded-logit softmax (U-ViT's Pallas-rejected d=72):
    bf16-probability storage keeps weights to ~0.4% relative, so outputs
    agree with the f32-logits path to bf16-grade tolerance."""
    from diffusion_uncertainty_tpu.ops.attention import (
        _xla_attention,
        _xla_attention_fast,
    )

    kq, kk, kv = jax.random.split(jax.random.key(7), 3)
    q = jax.random.normal(kq, (2, 258, 4, 72), jnp.bfloat16) * 2
    k = jax.random.normal(kk, (2, 258, 4, 72), jnp.bfloat16) * 2
    v = jax.random.normal(kv, (2, 258, 4, 72), jnp.bfloat16)
    ref = np.asarray(_xla_attention(q, k, v).astype(jnp.float32))
    out = np.asarray(_xla_attention_fast(q, k, v).astype(jnp.float32))
    np.testing.assert_allclose(out, ref, atol=3e-2)
    assert np.abs(out - ref).mean() < 2e-3


def test_xla_attention_fast_extreme_logits_finite():
    """The clamp keeps pathological activations finite (softmax saturates
    instead of overflowing to inf/nan) and stays exact for a one-hot row."""
    from diffusion_uncertainty_tpu.ops.attention import _xla_attention_fast

    # huge-magnitude q/k: unclamped logits ~ +-D*1e4 would overflow exp
    q = jnp.full((1, 8, 1, 72), 100.0, jnp.float32)
    k = jnp.concatenate(
        [jnp.full((1, 1, 1, 72), 100.0), -jnp.ones((1, 7, 1, 72))], axis=1
    )
    v = jnp.arange(8, dtype=jnp.float32).reshape(1, 8, 1, 1) * jnp.ones((1, 8, 1, 72))
    out = np.asarray(_xla_attention_fast(q, k, v))
    assert np.isfinite(out).all()
    # key 0 dominates (logit gap >> clamp width after clipping): weight -> 1
    np.testing.assert_allclose(out[0, 0, 0], np.zeros(72), atol=1e-3)


def test_packed_attention_matches_xla():
    """Packed-head kernel (interpret mode on CPU): exact vs the f32 XLA
    path at the U-ViT (d=72) and CLIP/MMDiT (d=64) head shapes."""
    from diffusion_uncertainty_tpu.ops.attention import _xla_attention
    from diffusion_uncertainty_tpu.ops.packed_attention import (
        packed_attention,
        packed_supports,
    )

    for b, s, h, d in [(2, 258, 4, 72), (1, 77, 4, 64)]:
        kq, kk, kv = jax.random.split(jax.random.key(b), 3)
        q = jax.random.normal(kq, (b, s, h, d), jnp.float32)
        k = jax.random.normal(kk, (b, s, h, d), jnp.float32)
        v = jax.random.normal(kv, (b, s, h, d), jnp.float32)
        assert packed_supports((b, s, h, d), jnp.float32)
        ref = np.asarray(_xla_attention(q, k, v))
        out = np.asarray(packed_attention(q, k, v))
        np.testing.assert_allclose(out, ref, rtol=2e-5, atol=2e-5)


def test_packed_attention_masked_cross():
    """kv_len masks trailing alignment-padded keys exactly (cross-attention
    with a ragged real context, e.g. SD1.5's 77 tokens padded to 80)."""
    from diffusion_uncertainty_tpu.ops.attention import _xla_attention
    from diffusion_uncertainty_tpu.ops.packed_attention import packed_attention

    kq, kk, kv = jax.random.split(jax.random.key(5), 3)
    q = jax.random.normal(kq, (1, 64, 2, 72), jnp.float32)
    k = jax.random.normal(kk, (1, 80, 2, 72), jnp.float32)
    v = jax.random.normal(kv, (1, 80, 2, 72), jnp.float32)
    ref = np.asarray(_xla_attention(q, k[:, :66], v[:, :66]))
    out = np.asarray(packed_attention(q, k, v, kv_len=66))
    np.testing.assert_allclose(out, ref, rtol=2e-5, atol=2e-5)


def test_packed_attention_vmap_folds_into_batch():
    """The custom vmap rule folds the mapped (ensemble) axis into batch
    instead of appending it to every VMEM block."""
    from diffusion_uncertainty_tpu.ops.attention import _xla_attention
    from diffusion_uncertainty_tpu.ops.packed_attention import packed_attention

    qs = jax.random.normal(jax.random.key(4), (3, 1, 64, 2, 72))
    out = np.asarray(jax.vmap(lambda a, b, c: packed_attention(a, b, c))(qs, qs, qs))
    ref = np.stack([np.asarray(_xla_attention(qs[i], qs[i], qs[i])) for i in range(3)])
    np.testing.assert_allclose(out, ref, rtol=2e-5, atol=2e-5)


def test_packed_attention_dispatch_and_gradient():
    """dot_product_attention routes non-lane-aligned heads to the packed
    kernel; the custom VJP (einsum backward) matches XLA's gradient."""
    from diffusion_uncertainty_tpu.ops.attention import (
        _xla_attention,
        dot_product_attention,
    )

    q = jax.random.normal(jax.random.key(0), (2, 258, 4, 72), jnp.float32)
    out = dot_product_attention(q, q, q, use_pallas=True)
    ref = _xla_attention(q, q, q)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5)
    g = jax.grad(lambda qq: jnp.sum(dot_product_attention(qq, q, q, use_pallas=True) ** 2))(q)
    gr = jax.grad(lambda qq: jnp.sum(_xla_attention(qq, q, q) ** 2))(q)
    np.testing.assert_allclose(np.asarray(g), np.asarray(gr), rtol=1e-4, atol=1e-4)


def test_avg_pool_2x2_pallas_matches_jnp():
    """Layout-native pool kernel (interpret mode): exact vs the reshape
    form, plus gradient and the fold-into-N vmap rule."""
    from diffusion_uncertainty_tpu.ops.avgpool import avg_pool_2x2

    x = jax.random.normal(jax.random.key(0), (8, 16, 16, 128), jnp.float32)
    ref = np.asarray(avg_pool_2x2(x, use_pallas=False))
    out = np.asarray(avg_pool_2x2(x, use_pallas=True))
    np.testing.assert_allclose(out, ref, rtol=1e-6, atol=1e-6)

    g1 = jax.grad(lambda a: jnp.sum(avg_pool_2x2(a, use_pallas=True) ** 2))(x)
    g2 = jax.grad(lambda a: jnp.sum(avg_pool_2x2(a, use_pallas=False) ** 2))(x)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), rtol=1e-6, atol=1e-6)

    xs = jax.random.normal(jax.random.key(1), (3, 8, 16, 16, 128))
    o = np.asarray(jax.vmap(lambda a: avg_pool_2x2(a, use_pallas=True))(xs))
    r = np.stack([np.asarray(avg_pool_2x2(xs[i], use_pallas=False)) for i in range(3)])
    np.testing.assert_allclose(o, r, rtol=1e-6, atol=1e-6)


def test_avg_pool_2x2_unsupported_shape_falls_back():
    from diffusion_uncertainty_tpu.ops.avgpool import avg_pool_2x2

    # C % 128 != 0 and B % 8 != 0: must take the jnp path and stay exact
    x = jax.random.normal(jax.random.key(2), (3, 4, 4, 96))
    out = np.asarray(avg_pool_2x2(x, use_pallas=True))
    ref = np.asarray(avg_pool_2x2(x, use_pallas=False))
    np.testing.assert_allclose(out, ref)
