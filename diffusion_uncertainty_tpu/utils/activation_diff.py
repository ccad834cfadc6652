"""Per-module activation-diff harness for checkpoint converters.

Feeds one fixed input through the reference's *PyTorch* modules (imported from
the read-only reference tree, used strictly as a numerical oracle) and through
the converted flax models, and reports the max abs diff per top-level block.
This catches converter layout bugs (QKV packing, legacy-vs-new attention
order — ``guided_diffusion/unet_openai.py:329-395`` — scale-shift splits,
NCHW flatten order) at the *block* where they first diverge, instead of as one
opaque end-to-end mismatch.

Works with random weights, so it runs in zero-egress environments *now*; when
real checkpoints land, pass their state dict instead and the same harness
verifies them one command later (SURVEY.md §7.3.1).

Usage (CPU, a few seconds at the tiny config):

    from diffusion_uncertainty_tpu.utils.activation_diff import adm_block_diffs
    diffs = adm_block_diffs(ADMUNetConfig.tiny())
    assert max(d for _, d in diffs) < 1e-4
"""

from __future__ import annotations

import sys
from typing import Dict, List, Optional, Tuple

import numpy as np

REFERENCE_ROOT = "/root/reference"

__all__ = [
    "import_reference",
    "adm_block_diffs",
    "uvit_block_diffs",
    "vae_diffs",
    "activation_noise_u_diff",
    "bpd_loop_diff",
    "ddim_loop_diff",
    "dpm_loop_diff",
    "estimator_window_diff",
    "guided_generation_loop_diff",
    "training_loss_diff",
    "zigzag_window_diff",
    "reference_available",
]


def import_reference(module: str, root: str = REFERENCE_ROOT):
    """Import ``diffusion_uncertainty.<module>`` from the reference tree."""
    import importlib

    if root not in sys.path:
        sys.path.insert(0, root)
    return importlib.import_module(f"diffusion_uncertainty.{module}")


def reference_available(root: str = REFERENCE_ROOT) -> bool:
    import pathlib

    return (pathlib.Path(root) / "diffusion_uncertainty").is_dir()


def _to_nhwc(t) -> np.ndarray:
    a = t.detach().float().numpy()
    return np.transpose(a, (0, 2, 3, 1)) if a.ndim == 4 else a


def _max_diff(a: np.ndarray, b: np.ndarray) -> float:
    assert a.shape == b.shape, (a.shape, b.shape)
    return float(np.abs(a - b).max())


def adm_block_diffs(
    cfg=None,
    batch: int = 2,
    seed: int = 0,
    state_dict: Optional[dict] = None,
    root: str = REFERENCE_ROOT,
) -> List[Tuple[str, float]]:
    """[(block_name, max|Δ|)] across every ADM UNet top-level block.

    Builds the reference ``UNetModel`` with the same hparams (random-init
    unless ``state_dict`` is given), converts its weights with
    ``convert_adm_unet``, and compares per-block activations:
    ``input_blocks[i]`` ↔ ``in_{i}_*``, ``middle_block`` ↔ ``mid_res_1``,
    ``output_blocks[i]`` ↔ ``out_{i}_*``, plus the final epsilon output.
    """
    import jax
    import jax.numpy as jnp
    import torch

    from ..models import ADMUNet, ADMUNetConfig
    from ..models.convert import convert_adm_unet

    if cfg is None:
        cfg = ADMUNetConfig.tiny()
    unet_openai = import_reference("guided_diffusion.unet_openai", root)

    torch.manual_seed(seed)
    ref = unet_openai.UNetModel(
        image_size=cfg.image_size,
        in_channels=cfg.in_channels,
        model_channels=cfg.model_channels,
        out_channels=cfg.out_channels,
        num_res_blocks=cfg.num_res_blocks,
        attention_resolutions=cfg.attention_resolutions,
        dropout=cfg.dropout,
        channel_mult=cfg.channel_mult,
        num_classes=cfg.num_classes,
        use_checkpoint=False,
        use_fp16=False,
        num_heads=cfg.num_heads,
        num_head_channels=cfg.num_head_channels,
        num_heads_upsample=cfg.num_heads_upsample,
        use_scale_shift_norm=cfg.use_scale_shift_norm,
        resblock_updown=cfg.resblock_updown,
        use_new_attention_order=cfg.use_new_attention_order,
    )
    if state_dict is not None:
        ref.load_state_dict({k: torch.as_tensor(v) for k, v in state_dict.items()})
    ref.eval()

    # capture reference per-block outputs via forward hooks
    captured: Dict[str, np.ndarray] = {}

    def hook(name):
        def fn(_mod, _inp, out):
            captured[name] = _to_nhwc(out)

        return fn

    for i, blk in enumerate(ref.input_blocks):
        blk.register_forward_hook(hook(f"in_{i}"))
    ref.middle_block.register_forward_hook(hook("mid"))
    for i, blk in enumerate(ref.output_blocks):
        blk.register_forward_hook(hook(f"out_{i}"))

    rs = np.random.RandomState(seed)
    x = rs.randn(batch, cfg.image_size, cfg.image_size, cfg.in_channels).astype(np.float32)
    tval = 37
    y = rs.randint(0, cfg.num_classes, (batch,)) if cfg.num_classes else None
    with torch.no_grad():
        t_out = ref(
            torch.from_numpy(x.transpose(0, 3, 1, 2)),
            torch.full((batch,), tval, dtype=torch.long),
            y=torch.from_numpy(y) if y is not None else None,
        )
    captured["output"] = _to_nhwc(t_out)

    # convert + run flax with intermediates
    sd = {k: v.numpy() for k, v in ref.state_dict().items()}
    params = convert_adm_unet(sd, cfg)
    model = ADMUNet(cfg)
    out, state = model.apply(
        params,
        jnp.asarray(x),
        jnp.asarray(tval, jnp.int32),
        jnp.asarray(y) if y is not None else None,
        capture_intermediates=True,
        mutable=["intermediates"],
    )
    inter = state["intermediates"]

    def flax_block(name: str) -> Optional[np.ndarray]:
        entry = inter.get(name)
        if entry is None:
            return None
        return np.asarray(entry["__call__"][0], np.float32)

    diffs: List[Tuple[str, float]] = []
    # input_blocks[0] is the stem conv
    diffs.append(("in_0", _max_diff(captured["in_0"], flax_block("conv_in"))))
    n_in = len(ref.input_blocks)
    for i in range(1, n_in):
        for suffix in ("attn", "res", "down"):
            val = flax_block(f"in_{i}_{suffix}")
            if val is not None:
                diffs.append((f"in_{i}", _max_diff(captured[f"in_{i}"], val)))
                break
    diffs.append(("mid", _max_diff(captured["mid"], flax_block("mid_res_1"))))
    for i in range(len(ref.output_blocks)):
        for suffix in ("up", "attn", "res"):
            val = flax_block(f"out_{i}_{suffix}")
            if val is not None:
                diffs.append((f"out_{i}", _max_diff(captured[f"out_{i}"], val)))
                break
    diffs.append(("output", _max_diff(captured["output"], np.asarray(out, np.float32))))
    return diffs


def uvit_block_diffs(
    cfg=None,
    batch: int = 2,
    seed: int = 0,
    state_dict: Optional[dict] = None,
    root: str = REFERENCE_ROOT,
) -> List[Tuple[str, float]]:
    """Per-transformer-block diff of the reference U-ViT vs the converted flax
    one (``uvit/uvit.py:203-231`` skip topology)."""
    import jax.numpy as jnp
    import torch

    from ..models import UViT, UViTConfig
    from ..models.convert import convert_uvit

    if cfg is None:
        cfg = UViTConfig.tiny()
    ref_uvit = import_reference("uvit.uvit", root)

    torch.manual_seed(seed)
    ref = ref_uvit.UViT(
        img_size=cfg.img_size,
        patch_size=cfg.patch_size,
        in_chans=cfg.in_chans,
        embed_dim=cfg.embed_dim,
        depth=cfg.depth,
        num_heads=cfg.num_heads,
        mlp_ratio=cfg.mlp_ratio,
        qkv_bias=cfg.qkv_bias,
        mlp_time_embed=cfg.mlp_time_embed,
        num_classes=cfg.num_classes if cfg.num_classes else -1,
        conv=cfg.final_conv,
    )
    if state_dict is not None:
        ref.load_state_dict({k: torch.as_tensor(v) for k, v in state_dict.items()})
    ref.eval()

    captured: Dict[str, np.ndarray] = {}

    def hook(name):
        def fn(_mod, _inp, out):
            captured[name] = out.detach().float().numpy()

        return fn

    for i, blk in enumerate(ref.in_blocks):
        blk.register_forward_hook(hook(f"in_blk_{i}"))
    ref.mid_block.register_forward_hook(hook("mid_blk"))
    for i, blk in enumerate(ref.out_blocks):
        blk.register_forward_hook(hook(f"out_blk_{i}"))

    rs = np.random.RandomState(seed)
    x = rs.randn(batch, cfg.img_size, cfg.img_size, cfg.in_chans).astype(np.float32)
    tval = np.full((batch,), 11.0, np.float32)
    y = rs.randint(0, cfg.num_classes, (batch,)) if cfg.num_classes else None
    with torch.no_grad():
        t_out = ref(
            torch.from_numpy(x.transpose(0, 3, 1, 2)),
            torch.from_numpy(tval),
            y=torch.from_numpy(y) if y is not None else None,
        )
    captured["output"] = _to_nhwc(t_out)

    sd = {k: v.numpy() for k, v in ref.state_dict().items()}
    params = convert_uvit(sd, cfg)
    model = UViT(cfg)
    out, state = model.apply(
        params,
        jnp.asarray(x),
        jnp.asarray(tval),
        jnp.asarray(y) if y is not None else None,
        capture_intermediates=True,
        mutable=["intermediates"],
    )
    inter = state["intermediates"]

    pairs = [(f"in_blk_{i}", f"in_block_{i}") for i in range(len(ref.in_blocks))]
    pairs += [("mid_blk", "mid_block")]
    pairs += [(f"out_blk_{i}", f"out_block_{i}") for i in range(len(ref.out_blocks))]
    diffs: List[Tuple[str, float]] = []
    for ref_name, flax_name in pairs:
        entry = inter.get(flax_name)
        if entry is not None:
            diffs.append(
                (ref_name, _max_diff(captured[ref_name], np.asarray(entry["__call__"][0], np.float32)))
            )
    diffs.append(("output", _max_diff(captured["output"], np.asarray(out, np.float32))))
    return diffs


def ddim_loop_diff(
    cfg=None,
    T: int = 50,
    batch: int = 2,
    seed: int = 0,
    state_dict: Optional[dict] = None,
    root: str = REFERENCE_ROOT,
) -> List[Tuple[str, float]]:
    """Whole-loop DDIM oracle vs the reference's vendored OpenAI sampler.

    Runs the SAME random-init (or checkpoint) tiny ADM model through the
    reference's ``ddim_sample_loop_progressive``
    (``guided_diffusion/gaussian_diffusion.py:479-525,594-634``, eta=0,
    clip_denoised=True) and through this framework's ``ddim_step`` loop with
    identical betas, and returns [(t, max|Δ|)] for every intermediate sample.
    This catches step-math / spacing / ᾱ-boundary drift that per-block
    forward diffs cannot (the OpenAI loop re-derives eps from the CLIPPED
    x̂0 — our ``use_clipped_model_output=True``; ᾱ_prev past t=0 is 1.0 —
    our ``set_alpha_to_one=True``).
    """
    import jax.numpy as jnp
    import torch

    from ..diffusion.ddim import DiffusionConfig, ddim_step
    from ..diffusion.schedule import make_betas, make_schedule
    from ..models import ADMUNet, ADMUNetConfig
    from ..models.convert import convert_adm_unet

    if cfg is None:
        cfg = ADMUNetConfig.tiny()
    assert cfg.out_channels == cfg.in_channels, "oracle needs an eps-only head"
    unet_openai = import_reference("guided_diffusion.unet_openai", root)
    gd = import_reference("guided_diffusion.gaussian_diffusion", root)

    torch.manual_seed(seed)
    ref = unet_openai.UNetModel(
        image_size=cfg.image_size,
        in_channels=cfg.in_channels,
        model_channels=cfg.model_channels,
        out_channels=cfg.out_channels,
        num_res_blocks=cfg.num_res_blocks,
        attention_resolutions=cfg.attention_resolutions,
        dropout=cfg.dropout,
        channel_mult=cfg.channel_mult,
        num_classes=cfg.num_classes,
        use_checkpoint=False,
        use_fp16=False,
        num_heads=cfg.num_heads,
        num_head_channels=cfg.num_head_channels,
        num_heads_upsample=cfg.num_heads_upsample,
        use_scale_shift_norm=cfg.use_scale_shift_norm,
        resblock_updown=cfg.resblock_updown,
        use_new_attention_order=cfg.use_new_attention_order,
    )
    if state_dict is not None:
        ref.load_state_dict({k: torch.as_tensor(v) for k, v in state_dict.items()})
    ref.eval()

    betas = np.asarray(make_betas("linear", T), np.float64)
    diffusion = gd.GaussianDiffusion(
        betas=betas,
        model_mean_type=gd.ModelMeanType.EPSILON,
        model_var_type=gd.ModelVarType.FIXED_SMALL,
        loss_type=gd.LossType.MSE,
    )

    rs = np.random.RandomState(seed)
    x_T = rs.randn(batch, cfg.image_size, cfg.image_size, cfg.in_channels).astype(np.float32)
    y = rs.randint(0, cfg.num_classes, (batch,)) if cfg.num_classes else None
    kwargs = {"y": torch.from_numpy(y)} if y is not None else {}
    ref_traj: List[np.ndarray] = []
    with torch.no_grad():
        for out in diffusion.ddim_sample_loop_progressive(
            ref,
            x_T.transpose(0, 3, 1, 2).shape,
            noise=torch.from_numpy(x_T.transpose(0, 3, 1, 2)),
            clip_denoised=True,
            model_kwargs=kwargs,
            device="cpu",
            eta=0.0,
        ):
            ref_traj.append(_to_nhwc(out["sample"]))

    sd = {k: v.numpy() for k, v in ref.state_dict().items()}
    params = convert_adm_unet(sd, cfg)
    model = ADMUNet(cfg)
    schedule = make_schedule(trained_betas=betas, set_alpha_to_one=True)
    dcfg = DiffusionConfig(
        clip_sample=True, clip_sample_range=1.0, use_clipped_model_output=True, eta=0.0
    )
    y_j = jnp.asarray(y) if y is not None else None
    x = jnp.asarray(x_T)
    diffs: List[Tuple[str, float]] = []
    for i, t in enumerate(range(T - 1, -1, -1)):
        eps = model.apply(params, x, jnp.asarray(t, jnp.int32), y_j)
        step = ddim_step(schedule, x, eps, jnp.asarray(t), jnp.asarray(t - 1), dcfg)
        x = step.prev_sample
        diffs.append((f"t={t}", _max_diff(ref_traj[i], np.asarray(x, np.float32))))
    return diffs


def _oracle_models(size: int):
    """(torch NCHW fn, jax NHWC fn) of the SAME analytic epsilon model.

    Deliberately NONLINEAR in x (a linear model makes Var_m shift-invariant
    in eps, leaving the grad fork's update identically zero) and SPATIALLY
    NON-UNIFORM (an elementwise model makes the flip fork's u ≡ 0):
    eps = 0.3·x·cos(t/1000) + 0.2·tanh(x) + 0.1·sin(0.7h)·cos(1.3w).
    """
    import jax.numpy as jnp
    import torch

    hh = np.arange(size, dtype=np.float32)
    ww = np.arange(size, dtype=np.float32)
    g_hw = 0.1 * np.sin(0.7 * hh)[:, None] * np.cos(1.3 * ww)[None, :]
    g_t = torch.from_numpy(g_hw)[None, None]  # NCHW
    g_j = jnp.asarray(g_hw)[None, :, :, None]  # NHWC

    def eps_fn_torch(x, t):
        tt = torch.as_tensor(t, dtype=torch.float32)
        if tt.ndim == 1:  # trait-style predict_model passes a [B] tensor
            tt = tt.reshape((-1,) + (1,) * (x.ndim - 1))
        return 0.3 * x * torch.cos(tt / 1000.0) + 0.2 * torch.tanh(x) + g_t

    def model_fn(x, t, key):
        return 0.3 * x * jnp.cos(t.astype(jnp.float32) / 1000.0) + 0.2 * jnp.tanh(x) + g_j

    return eps_fn_torch, model_fn


class _OracleOut:
    """One return object for every fork convention: ``out[0]`` (diffusers
    tuple), ``out.sample`` (UNet2DModel output), and ``out[:, :3]`` (the
    trait's raw-tensor channel slice) all yield the eps tensor."""

    def __init__(self, eps):
        self.sample = eps

    def __getitem__(self, idx):
        return self.sample if idx == 0 else self.sample[idx]


def _make_oracle_unet(eps_fn_torch):
    class _AnalyticUNet:
        def __call__(self, x, t, encoder_hidden_states=None,
                     cross_attention_kwargs=None, return_dict=False, y=None):
            return _OracleOut(eps_fn_torch(x, t))

    return _AnalyticUNet()


# our estimator/guidance registry name -> the reference's scheduler fork
_REF_SCHED_MODULES = {
    "uncertainty_zigzag_centered": "scheduling_ddim_uncertainty_zigzag_centered",
    "uncertainty_centered": "scheduling_ddim_uncertainty_centered",
    "infer_noise": "scheduling_ddim_infer_noise",
    "uncertainty_image": "scheduling_ddim_uncertainty_image",
    "uncertainty_grad": "scheduling_ddim_uncertainty_grad",
    "flip": "scheduling_ddim_flip",
    "uncertainty_threshold": "scheduling_ddim_uncertainty_threshold",
    "multiscale_threshold": "scheduling_ddim_infer_noise_multiscale_threshold",
    "mc_dropout": "scheduling_ddim_mc_dropout",
}

def estimator_window_diff(
    name: str = "uncertainty_zigzag_centered",
    M: int = 192,
    num_zigzag: int = 3,
    steps: int = 10,
    after_step: int = 3,
    num_steps_uc: int = 3,
    batch: int = 2,
    size: int = 8,
    channels: int = 3,
    seed: int = 0,
    threshold: float = 1e9,  # uncertainty_threshold only; ±1e9 = degenerate
    root: str = REFERENCE_ROOT,
) -> Dict[str, float]:
    """Whole-window oracle vs the reference's ACTUAL scheduler forks.

    Imports the fork named by ``_REF_SCHED_MODULES[name]`` from the reference
    tree (through the diffusers shim — diffusers itself is not installed
    here) and runs its full ``set_timesteps`` + ``step`` loop with an
    analytic epsilon model, against ``sample_ddim`` with the matching
    estimator (or, for ``uncertainty_grad``, the matching *guidance*) on the
    identical schedule and model.

    Two kinds of checks come out:

    - ``traj``: max|Δ| over the pre-window intermediate samples (and, for
      pure estimators, the whole trajectory) — the DDIM update inside the
      fork is noise-free at eta=0 and must match exactly. ``uncertainty_grad``
      modifies the trajectory with a stochastic gradient, so only the
      pre-window steps are compared exactly there.
    - ``u_rel[i]``: per-window-step relative difference of the MEAN
      uncertainty map. The ensemble noise draws are independent on the two
      sides, so this is a statistical comparison: the per-pixel estimator has
      ~sqrt(2/M) relative sd; averaging over batch*size²*channels pixels
      brings the mean's s.e. well under 1% at the defaults.

    This pins the *window semantics* the per-block diffs cannot: the
    ``predict_next=True`` hardcoding of the zigzag forks
    (``scheduling_ddim_uncertainty_zigzag_centered.py:272``), the window
    bounds (``:383-384``), the mean-square vs Var(ddof=1) reductions
    (``:549`` vs ``scheduling_ddim_infer_noise.py:533``), the image-space
    propagation (``scheduling_ddim_uncertainty_image.py:532``), and the grad
    fork's ᾱ-scaled eps update (``scheduling_ddim_uncertainty_grad.py:550``).
    """
    import jax
    import jax.numpy as jnp
    import torch

    from ..diffusion.sampler import SamplerConfig, sample_ddim
    from ..diffusion.schedule import make_schedule
    from ..uncertainty.estimators import EstimatorConfig, make_estimator
    from .diffusers_shim import install_diffusers_shim

    install_diffusers_shim()
    mod = import_reference(
        f"schedulers_uncertainty.{_REF_SCHED_MODULES[name]}", root
    )

    eps_fn_torch, model_fn = _oracle_models(size)

    if name == "mc_dropout":
        # the fork flips unet.train() inside the u block and asserts a
        # Dropout module exists (:499,510-519); the multiplicative-Gaussian
        # stochastic forward matches the jax-side estimator_model_fn below
        class _DropoutUNet(torch.nn.Module):
            def __init__(self):
                super().__init__()
                self.drop = torch.nn.Dropout(0.5)

            def forward(self, x, t, encoder_hidden_states=None,
                        cross_attention_kwargs=None, return_dict=False, y=None):
                eps = eps_fn_torch(x, t)
                if self.training:
                    eps = eps * (1.0 + 0.3 * torch.randn_like(eps))
                return _OracleOut(eps)

        unet = _DropoutUNet()
    else:
        unet = _make_oracle_unet(eps_fn_torch)
    torch.manual_seed(seed)
    import inspect

    ctor_kwargs = dict(
        M=M, after_step=after_step, num_steps_uc=num_steps_uc,
        unet=unet, num_zigzag=num_zigzag,
        # normalize off: the fork records the z-normalized map when set,
        # whose ~0 mean makes a mean-relative comparison meaningless
        uncertainty_threshold=threshold, uncertainty_threshold_mode="max",
        uncertainty_normalize=False,
    )
    sig = inspect.signature(mod.DDIMSchedulerUncertainty.__init__)
    # the decorated __init__ signature still lists the real params
    ctor_kwargs = {k: v for k, v in ctor_kwargs.items() if k in sig.parameters}
    sched_ref = mod.DDIMSchedulerUncertainty(**ctor_kwargs)
    sched_ref.set_timesteps(steps)

    rs = np.random.RandomState(seed)
    x_T = rs.randn(batch, size, size, channels).astype(np.float32)

    # the reference loop runs NCHW (the trait's ``[:, :3]`` slice assumes a
    # channel dim 1); the analytic model is elementwise so the layout is free
    x_ref = torch.from_numpy(x_T.transpose(0, 3, 1, 2))
    ref_traj: List[np.ndarray] = []
    ref_unc: List[np.ndarray] = []
    # the grad fork needs autograd inside step(); everything else is no_grad
    grad_mode = torch.enable_grad() if name == "uncertainty_grad" else torch.no_grad()
    with grad_mode:
        for t in sched_ref.timesteps:
            t = int(t)
            eps = eps_fn_torch(x_ref, t)
            out = sched_ref.step(eps, t, x_ref, eta=0.0)
            if getattr(out, "uncertainty", None) is not None:
                ref_unc.append(_to_nhwc(out.uncertainty))
            x_ref = out.prev_sample.detach()
            ref_traj.append(_to_nhwc(x_ref))

    schedule = make_schedule("linear", 1000)
    cfg = SamplerConfig(
        num_inference_steps=steps, after_step=after_step, num_steps_uc=num_steps_uc
    )
    est = guidance = None
    if name == "uncertainty_grad":
        from ..uncertainty.guidance import make_uncertainty_grad_guidance

        guidance = make_uncertainty_grad_guidance(M=M)
    elif name == "uncertainty_threshold":
        from ..uncertainty.guidance import make_mask_guidance

        guidance = make_mask_guidance(
            EstimatorConfig(name="infer_noise", M=M),
            threshold=threshold, threshold_mode="max", normalize=False,
        )
    elif name == "multiscale_threshold":
        from ..uncertainty.guidance import make_mask_guidance

        # normalize off ⇒ raw Var ≥ 0 ⇒ the -1/-2/-3 z-levels put every pixel
        # in the 1.0 band — deterministic trajectory, exact whole-loop compare
        guidance = make_mask_guidance(
            EstimatorConfig(name="infer_noise", M=M), mode="multiscale",
            normalize=False,
        )
    else:
        est = make_estimator(EstimatorConfig(name=name, M=M, num_zigzag=num_zigzag))
    est_model_fn = None
    if name == "mc_dropout":
        # stochastic ensemble model, deterministic trajectory — exercises the
        # estimator_model_fn split that mirrors the fork's train()/eval() flip
        def est_model_fn(x, t, k):
            return model_fn(x, t, None) * (
                1.0 + 0.3 * jax.random.normal(k, x.shape, jnp.float32)
            )
    res = sample_ddim(
        model_fn, schedule, jnp.asarray(x_T), jax.random.key(seed), cfg,
        estimator=est, guidance=guidance, collect_intermediates=True,
        estimator_model_fn=est_model_fn,
    )

    diffs: Dict[str, float] = {}
    traj = np.asarray(res.intermediates, np.float32)
    assert traj.shape[0] == len(ref_traj), (traj.shape, len(ref_traj))
    # guidance modifies the in-window trajectory with independent noise draws
    # on the two sides — compare the deterministic pre-window prefix there,
    # EXCEPT when a degenerate (±inf-like) threshold makes the binary mask
    # constant and the whole guided trajectory deterministic again
    n_traj = after_step if guidance is not None else len(ref_traj)
    if name == "uncertainty_threshold" and abs(threshold) >= 1e6:
        n_traj = len(ref_traj)
    if name == "multiscale_threshold":  # un-normalized ⇒ constant 1.0 band
        n_traj = len(ref_traj)
    diffs["traj"] = max(
        _max_diff(r, traj[i]) for i, r in enumerate(ref_traj[:n_traj])
    )
    unc = np.asarray(res.uncertainty, np.float32)
    assert unc.shape[0] == len(ref_unc), (unc.shape, len(ref_unc))
    for i, (r, o) in enumerate(zip(ref_unc, unc)):
        mr, mo = float(r.mean()), float(o.mean())
        diffs[f"u_rel[{i}]"] = abs(mr - mo) / max(abs(mr), 1e-12)
    return diffs


def zigzag_window_diff(**kwargs) -> Dict[str, float]:
    """Flagship-estimator alias of :func:`estimator_window_diff`."""
    return estimator_window_diff("uncertainty_zigzag_centered", **kwargs)


def activation_noise_u_diff(
    M: int = 96,
    batch: int = 2,
    t: int = 500,
    seed: int = 0,
    root: str = REFERENCE_ROOT,
) -> float:
    """Tap-placement oracle for the activation-noise ('uncertainty' /
    'uncertainty_original') estimator.

    The reference registers ``N(0, 0.01²)`` forward hooks on exactly four
    named ResBlocks — ``input_blocks.8.0`` and ``output_blocks.{1,4,12}.0``
    — only inside the uncertainty block (``scheduling_ddim_uncertainty.py:
    34-38,520-529``), runs M forwards on the RAW sample, and reduces
    mean-square centered on pred_epsilon. This builds the reference torch
    UNet at a small config with the ImageNet-128 block layout (5 levels ×
    2 res blocks, so all four hook sites exist as REGULAR res blocks),
    converts the weights, and compares the mean uncertainty statistically
    against our ``activation_noise`` estimator with its ``act_noise`` rng
    taps. Catches tap-site and tap-ordering (pre- vs post-attention) drift.
    Returns the relative difference of the mean u map.
    """
    import dataclasses as _dc

    import jax
    import jax.numpy as jnp
    import torch

    from ..diffusion.sampler import StepState
    from ..diffusion.schedule import make_schedule
    from ..models import ADMUNet, ADMUNetConfig
    from ..models.convert import convert_adm_unet
    from ..uncertainty.estimators import EstimatorConfig, make_estimator

    # attention at ds=4 puts an AttentionBlock AFTER the in_8 hook site, so
    # the oracle discriminates tap ORDERING (the fork hooks the ResBlock
    # child '.0' — PRE-attention), not just the four site indices
    cfg = ADMUNetConfig(
        image_size=32, in_channels=3, model_channels=32, out_channels=3,
        num_res_blocks=2, attention_resolutions=(4,), dropout=0.0,
        channel_mult=(1, 1, 2, 3, 4), num_classes=None, num_heads=1,
        num_head_channels=-1, num_heads_upsample=-1,
        use_scale_shift_norm=True, resblock_updown=True,
        use_new_attention_order=False,
    )
    unet_openai = import_reference("guided_diffusion.unet_openai", root)
    torch.manual_seed(seed)
    ref = unet_openai.UNetModel(
        image_size=cfg.image_size, in_channels=cfg.in_channels,
        model_channels=cfg.model_channels, out_channels=cfg.out_channels,
        num_res_blocks=cfg.num_res_blocks,
        attention_resolutions=cfg.attention_resolutions, dropout=0.0,
        channel_mult=cfg.channel_mult, num_classes=None, use_checkpoint=False,
        use_fp16=False, num_heads=cfg.num_heads,
        num_head_channels=cfg.num_head_channels,
        num_heads_upsample=cfg.num_heads_upsample,
        use_scale_shift_norm=cfg.use_scale_shift_norm,
        resblock_updown=cfg.resblock_updown,
        use_new_attention_order=cfg.use_new_attention_order,
    )
    ref.eval()
    # guided_diffusion zero-initializes the final output conv (zero_module),
    # so a random-init model emits exactly 0 and every u map degenerates to
    # a constant — re-randomize it so noise actually propagates to the output
    with torch.no_grad():
        ref.out[2].weight.normal_(0.0, 0.05)
        ref.out[2].bias.normal_(0.0, 0.05)

    rs = np.random.RandomState(seed)
    x = rs.randn(batch, cfg.image_size, cfg.image_size, 3).astype(np.float32)
    x_t = torch.from_numpy(x.transpose(0, 3, 1, 2))
    tt = torch.full((batch,), t, dtype=torch.long)

    def add_gaussian_noise(module, input, output):  # the fork's hook, :36-39
        return output + torch.randn_like(output) * 0.01

    hook_names = {
        "input_blocks.8.0", "output_blocks.1.0",
        "output_blocks.4.0", "output_blocks.12.0",
    }
    with torch.no_grad():
        eps_ref = ref(x_t, tt)
        removals = []
        hit = 0
        for name, module in ref.named_modules():
            if name in hook_names:
                removals.append(module.register_forward_hook(add_gaussian_noise))
                hit += 1
        assert hit == 4, f"only {hit} hook sites found"
        scores = [ref(x_t, tt) for _ in range(M)]
        for r in removals:
            r.remove()
    u_ref = np.mean(
        [(s - eps_ref).numpy() ** 2 for s in scores], axis=0
    )

    sd = {k: v.numpy() for k, v in ref.state_dict().items()}
    params = convert_adm_unet(sd, cfg)
    model = ADMUNet(cfg)

    def model_fn(xx, ttt, key):
        rngs = {"act_noise": key} if key is not None else {}
        return model.apply(params, xx, jnp.full((xx.shape[0],), ttt, jnp.int32)[0], None, rngs=rngs)

    eps = model_fn(jnp.asarray(x), t, None)
    state = StepState(
        sample=jnp.asarray(x), pred_x0=jnp.zeros_like(eps), pred_epsilon=eps,
        prev_sample=jnp.asarray(x), timestep=jnp.asarray(t), prev_timestep=jnp.asarray(t - 1),
    )
    est = make_estimator(EstimatorConfig(name="uncertainty", M=M))
    u = np.asarray(
        est(model_fn, make_schedule("linear", 1000), state, jax.random.key(seed + 1))
    )
    mr, mo = float(_to_nhwc(torch.from_numpy(u_ref)).mean()), float(u.mean())
    return abs(mr - mo) / max(abs(mr), 1e-12)


def bpd_loop_diff(
    T: int = 50,
    batch: int = 2,
    seed: int = 0,
    root: str = REFERENCE_ROOT,
) -> Dict[str, float]:
    """NLL/BPD oracle: our ``metrics.nll.calc_bpd_loop`` vs the reference's
    vendored ``GaussianDiffusion.calc_bpd_loop`` (``guided_diffusion/
    gaussian_diffusion.py:770-825``), learned_range variance, through the
    SAME converted tiny 6-channel ADM model with the per-step q-sample noise
    pinned to one fixed tensor on both sides (monkeypatched RNGs), so every
    vb term is deterministic and must match to f32 roundoff.
    """
    import dataclasses as _dc

    import jax
    import jax.numpy as jnp
    import torch

    from ..diffusion.schedule import make_betas, make_schedule
    from ..metrics.nll import calc_bpd_loop
    from ..models import ADMUNet, ADMUNetConfig
    from ..models.convert import convert_adm_unet

    unet_openai = import_reference("guided_diffusion.unet_openai", root)
    gd = import_reference("guided_diffusion.gaussian_diffusion", root)

    cfg = _dc.replace(ADMUNetConfig.tiny(num_classes=None), out_channels=6)
    torch.manual_seed(seed)
    ref = unet_openai.UNetModel(
        image_size=cfg.image_size, in_channels=3, model_channels=cfg.model_channels,
        out_channels=6, num_res_blocks=cfg.num_res_blocks,
        attention_resolutions=cfg.attention_resolutions, dropout=0.0,
        channel_mult=cfg.channel_mult, num_classes=None, use_checkpoint=False,
        use_fp16=False, num_heads=cfg.num_heads, num_head_channels=cfg.num_head_channels,
        num_heads_upsample=cfg.num_heads_upsample,
        use_scale_shift_norm=cfg.use_scale_shift_norm,
        resblock_updown=cfg.resblock_updown,
        use_new_attention_order=cfg.use_new_attention_order,
    )
    ref.eval()
    with torch.no_grad():  # zero-init output conv (see activation_noise_u_diff)
        ref.out[2].weight.normal_(0.0, 0.05)
        ref.out[2].bias.normal_(0.0, 0.05)

    betas = np.asarray(make_betas("linear", T), np.float64)
    diffusion = gd.GaussianDiffusion(
        betas=betas,
        model_mean_type=gd.ModelMeanType.EPSILON,
        model_var_type=gd.ModelVarType.LEARNED_RANGE,
        loss_type=gd.LossType.MSE,
    )

    rs = np.random.RandomState(seed)
    x0 = np.tanh(rs.randn(batch, cfg.image_size, cfg.image_size, 3)).astype(np.float32)
    fixed = rs.randn(batch, cfg.image_size, cfg.image_size, 3).astype(np.float32)
    fixed_t = torch.from_numpy(fixed.transpose(0, 3, 1, 2))

    orig_randn_like = gd.th.randn_like
    gd.th.randn_like = lambda x: fixed_t
    try:
        with torch.no_grad():
            ref_out = diffusion.calc_bpd_loop(
                ref, torch.from_numpy(x0.transpose(0, 3, 1, 2)), clip_denoised=True,
                model_kwargs={"y": None},  # p_mean_variance indexes ['y'] unconditionally
            )
    finally:
        gd.th.randn_like = orig_randn_like

    params = convert_adm_unet({k: v.numpy() for k, v in ref.state_dict().items()}, cfg)
    model = ADMUNet(cfg)
    model_fn6 = lambda x, t, k: model.apply(params, x, t, None)
    schedule = make_schedule(trained_betas=betas, set_alpha_to_one=True)

    fixed_j = jnp.asarray(fixed)
    orig_normal = jax.random.normal

    def stub(key, shape, dtype=jnp.float32):
        if tuple(shape) == fixed.shape:
            return fixed_j.astype(dtype)
        return orig_normal(key, shape, dtype)

    jax.random.normal = stub
    try:
        res = calc_bpd_loop(model_fn6, schedule, jnp.asarray(x0), jax.random.key(seed))
    finally:
        jax.random.normal = orig_normal

    diffs = {
        "total_bpd": _max_diff(
            ref_out["total_bpd"].numpy(), np.asarray(res.total_bpd, np.float32)
        ),
        "prior_bpd": _max_diff(
            ref_out["prior_bpd"].numpy(), np.asarray(res.prior_bpd, np.float32)
        ),
        # reference stacks vb as [N, T] in the same t=T-1..0 order as our scan
        "vb": _max_diff(
            ref_out["vb"].numpy().T, np.asarray(res.vb_terms, np.float32)
        ),
    }
    return diffs


def training_loss_diff(
    T: int = 50,
    batch: int = 4,
    seed: int = 0,
    root: str = REFERENCE_ROOT,
) -> float:
    """Hybrid training-loss oracle: ``training.ddpm_trainer.p_losses``
    (learned_variance, pred_noise, vlb_weight=1) vs the vendored iddpm
    ``GaussianDiffusion.training_losses`` (MSE + LEARNED_RANGE vb,
    ``gaussian_diffusion.py:677-745``) through the converted 6-channel tiny
    ADM with matched noise and timesteps — deterministic; returns |Δloss|.
    """
    import dataclasses as _dc

    import jax
    import jax.numpy as jnp
    import torch

    from ..diffusion.schedule import make_betas, make_schedule
    from ..models import ADMUNet, ADMUNetConfig
    from ..models.convert import convert_adm_unet
    from ..training.ddpm_trainer import DDPMTrainConfig, p_losses

    unet_openai = import_reference("guided_diffusion.unet_openai", root)
    gd = import_reference("guided_diffusion.gaussian_diffusion", root)

    cfg = _dc.replace(ADMUNetConfig.tiny(num_classes=None), out_channels=6)
    torch.manual_seed(seed)
    ref = unet_openai.UNetModel(
        image_size=cfg.image_size, in_channels=3, model_channels=cfg.model_channels,
        out_channels=6, num_res_blocks=cfg.num_res_blocks,
        attention_resolutions=cfg.attention_resolutions, dropout=0.0,
        channel_mult=cfg.channel_mult, num_classes=None, use_checkpoint=False,
        use_fp16=False, num_heads=cfg.num_heads, num_head_channels=cfg.num_head_channels,
        num_heads_upsample=cfg.num_heads_upsample,
        use_scale_shift_norm=cfg.use_scale_shift_norm,
        resblock_updown=cfg.resblock_updown,
        use_new_attention_order=cfg.use_new_attention_order,
    )
    ref.eval()
    with torch.no_grad():
        ref.out[2].weight.normal_(0.0, 0.05)
        ref.out[2].bias.normal_(0.0, 0.05)

    betas = np.asarray(make_betas("linear", T), np.float64)
    diffusion = gd.GaussianDiffusion(
        betas=betas,
        model_mean_type=gd.ModelMeanType.EPSILON,
        model_var_type=gd.ModelVarType.LEARNED_RANGE,
        loss_type=gd.LossType.MSE,
    )

    rs = np.random.RandomState(seed)
    x0 = np.tanh(rs.randn(batch, cfg.image_size, cfg.image_size, 3)).astype(np.float32)
    noise = rs.randn(batch, cfg.image_size, cfg.image_size, 3).astype(np.float32)
    # include t=0 so the decoder-NLL branch is exercised
    t_np = np.array([0] + list(rs.randint(1, T, batch - 1)), np.int64)

    # training_losses' vb branch calls _vb_terms_bpd WITHOUT model_kwargs and
    # p_mean_variance indexes ['y'] unconditionally — inject {'y': None}
    orig_vb = diffusion._vb_terms_bpd
    diffusion._vb_terms_bpd = lambda model, x_start, x_t, t, clip_denoised=True, model_kwargs=None: orig_vb(
        model=model, x_start=x_start, x_t=x_t, t=t,
        clip_denoised=clip_denoised, model_kwargs={"y": None},
    )
    with torch.no_grad():
        terms = diffusion.training_losses(
            lambda x, t, y=None: ref(x, t),
            torch.from_numpy(x0.transpose(0, 3, 1, 2)),
            torch.from_numpy(t_np),
            model_kwargs={"y": None},
            noise=torch.from_numpy(noise.transpose(0, 3, 1, 2)),
        )
    ref_loss = float(terms["loss"].mean())

    params = convert_adm_unet({k: v.numpy() for k, v in ref.state_dict().items()}, cfg)
    model = ADMUNet(cfg)
    schedule = make_schedule(trained_betas=betas, set_alpha_to_one=True)
    tcfg = DDPMTrainConfig(objective="pred_noise", learned_variance=True, vlb_weight=1.0)

    noise_j = jnp.asarray(noise)
    orig_normal = jax.random.normal

    def stub(key, shape, dtype=jnp.float32):
        if tuple(shape) == noise.shape:
            return noise_j.astype(dtype)
        return orig_normal(key, shape, dtype)

    jax.random.normal = stub
    try:
        loss = p_losses(
            lambda p, x_t, t, y: model.apply(p, x_t, t, y),
            params, schedule, jnp.asarray(x0), jnp.asarray(t_np, jnp.int32),
            jax.random.key(seed), tcfg,
        )
    finally:
        jax.random.normal = orig_normal
    return abs(float(loss) - ref_loss)


def guided_generation_loop_diff(
    steps: int = 8,
    after_step: int = 3,
    num_steps_uc: int = 3,
    M: int = 48,
    num_zigzag: int = 2,
    classifier_scale: float = 2.0,
    batch: int = 2,
    seed: int = 0,
    root: str = REFERENCE_ROOT,
) -> Dict[str, float]:
    """The paper's flagship protocol as ONE oracle: classifier-guided
    class-conditional generation with the zigzag uncertainty window, through
    REAL converted models on both sides.

    Replicates the reference's hand-rolled loop (``generate_samples.py:
    255-319``): per step ``eps = unet(x,t,y)[:, :3] − √(1−ᾱ_t)·scale·∇_x
    log p(y|x_t)`` fed into the zigzag fork's ``step`` — whose ensemble
    forwards run the PLAIN unet (``predict_model``), not the guided one —
    against ``with_classifier_guidance`` + ``sample_ddim`` +
    ``uncertainty_zigzag_centered`` with ``estimator_model_fn`` carrying the
    plain unet. Trajectory must match exactly (eta=0); per-window-step mean
    uncertainty statistically. Pins jointly: the classifier eps-shift, the
    guided-vs-plain model split, and the zigzag window through a real model.
    """
    import jax
    import jax.numpy as jnp
    import torch

    from ..classifier_guidance import with_classifier_guidance
    from ..diffusion.sampler import SamplerConfig, sample_ddim
    from ..diffusion.schedule import make_schedule
    from ..models import ADMClassifier, ADMClassifierConfig, ADMUNet, ADMUNetConfig
    from ..models.convert import convert_adm_classifier, convert_adm_unet
    from ..uncertainty.estimators import EstimatorConfig, make_estimator
    from .diffusers_shim import install_diffusers_shim

    install_diffusers_shim()
    zz = import_reference(
        "schedulers_uncertainty.scheduling_ddim_uncertainty_zigzag_centered", root
    )
    unet_openai = import_reference("guided_diffusion.unet_openai", root)

    ucfg = ADMUNetConfig.tiny(num_classes=10)
    ccfg = ADMClassifierConfig(
        image_size=16, model_channels=32, out_channels=10, num_res_blocks=1,
        attention_resolutions=(2,), channel_mult=(1, 2), num_head_channels=16,
    )
    torch.manual_seed(seed)
    ref_unet = unet_openai.UNetModel(
        image_size=ucfg.image_size, in_channels=3, model_channels=ucfg.model_channels,
        out_channels=ucfg.out_channels, num_res_blocks=ucfg.num_res_blocks,
        attention_resolutions=ucfg.attention_resolutions, dropout=0.0,
        channel_mult=ucfg.channel_mult, num_classes=ucfg.num_classes,
        use_checkpoint=False, use_fp16=False, num_heads=ucfg.num_heads,
        num_head_channels=ucfg.num_head_channels, num_heads_upsample=ucfg.num_heads_upsample,
        use_scale_shift_norm=ucfg.use_scale_shift_norm, resblock_updown=ucfg.resblock_updown,
        use_new_attention_order=ucfg.use_new_attention_order,
    )
    ref_clf = unet_openai.EncoderUNetModel(
        image_size=ccfg.image_size, in_channels=3, model_channels=ccfg.model_channels,
        out_channels=ccfg.out_channels, num_res_blocks=ccfg.num_res_blocks,
        attention_resolutions=ccfg.attention_resolutions, dropout=0.0,
        channel_mult=ccfg.channel_mult, use_checkpoint=False, use_fp16=False,
        num_head_channels=ccfg.num_head_channels,
        use_scale_shift_norm=ccfg.use_scale_shift_norm,
        resblock_updown=ccfg.resblock_updown, pool=ccfg.pool,
    )
    ref_unet.eval()
    ref_clf.eval()
    with torch.no_grad():
        # guided_diffusion zero-inits the UNet's output conv — re-randomize so
        # the epsilon (and the guidance interplay) is non-trivial
        ref_unet.out[2].weight.normal_(0.0, 0.05)
        ref_unet.out[2].bias.normal_(0.0, 0.05)

    rs = np.random.RandomState(seed)
    x_np = rs.randn(batch, ucfg.image_size, ucfg.image_size, 3).astype(np.float32)
    y_np = rs.randint(0, 10, (batch,))
    y_t = torch.from_numpy(y_np)

    class _PlainUNet:
        """zigzag predict_model convention; the ensemble runs the PLAIN unet."""

        def __call__(self, x, t, encoder_hidden_states=None,
                     cross_attention_kwargs=None, return_dict=False, y=None):
            tt = torch.full((x.shape[0],), int(t), dtype=torch.long)
            return (ref_unet(x, tt, y=y_t)[:, :3],)

    sched_ref = zz.DDIMSchedulerUncertainty(
        M=M, after_step=after_step, num_steps_uc=num_steps_uc,
        unet=_PlainUNet(), num_zigzag=num_zigzag,
    )
    sched_ref.set_timesteps(steps)
    ab_torch = sched_ref.alphas_cumprod

    def cond_fn(x, tt):  # generate_samples.py:255-271
        with torch.enable_grad():
            x_in = x.detach().requires_grad_(True)
            logits = ref_clf(x_in, tt)
            log_probs = logits.log_softmax(dim=-1)
            selected = log_probs[range(len(logits)), y_t.view(-1)]
            gradient = torch.autograd.grad(selected.sum(), x_in)[0]
        return gradient.detach() * classifier_scale

    x_ref = torch.from_numpy(x_np.transpose(0, 3, 1, 2))
    ref_traj: List[np.ndarray] = []
    ref_unc: List[np.ndarray] = []
    for t in sched_ref.timesteps:
        t = int(t)
        tt = torch.full((batch,), t, dtype=torch.long)
        with torch.no_grad():
            eps = ref_unet(x_ref, tt, y=y_t)[:, :3]
        grad = cond_fn(x_ref, tt)
        with torch.no_grad():
            eps = eps - (1 - ab_torch[t]).sqrt() * grad
            out = sched_ref.step(eps, t, x_ref, eta=0.0)
            if getattr(out, "uncertainty", None) is not None:
                ref_unc.append(_to_nhwc(out.uncertainty))
            x_ref = out.prev_sample
            ref_traj.append(_to_nhwc(x_ref))

    params = {
        "model": convert_adm_unet({k: v.numpy() for k, v in ref_unet.state_dict().items()}, ucfg),
        "classifier": convert_adm_classifier({k: v.numpy() for k, v in ref_clf.state_dict().items()}, ccfg),
    }
    unet = ADMUNet(ucfg)
    clf = ADMClassifier(ccfg)
    schedule = make_schedule("linear", 1000)
    y_j = jnp.asarray(y_np)

    def plain(p, x, t, y, key):
        return unet.apply(p["model"], x, t, y)[..., :3]

    guided = with_classifier_guidance(
        plain, lambda p, x, t: clf.apply(p["classifier"], x, t), schedule, classifier_scale
    )
    model_fn = lambda x, t, k: guided(params, x, t, y_j, k)
    est_fn = lambda x, t, k: plain(params, x, t, y_j, k)
    cfg = SamplerConfig(
        num_inference_steps=steps, after_step=after_step, num_steps_uc=num_steps_uc
    )
    est = make_estimator(
        EstimatorConfig(name="uncertainty_zigzag_centered", M=M, num_zigzag=num_zigzag)
    )
    res = sample_ddim(
        model_fn, schedule, jnp.asarray(x_np), jax.random.key(seed), cfg,
        estimator=est, estimator_model_fn=est_fn, collect_intermediates=True,
    )

    diffs: Dict[str, float] = {}
    traj = np.asarray(res.intermediates, np.float32)
    diffs["traj"] = max(_max_diff(r, traj[i]) for i, r in enumerate(ref_traj))
    unc = np.asarray(res.uncertainty, np.float32)
    assert unc.shape[0] == len(ref_unc), (unc.shape, len(ref_unc))
    for i, (r, o) in enumerate(zip(ref_unc, unc)):
        mr, mo = float(r.mean()), float(o.mean())
        diffs[f"u_rel[{i}]"] = abs(mr - mo) / max(abs(mr), 1e-12)
    return diffs


def dpm_loop_diff(
    steps: int = 12,
    solver_order: int = 2,
    timestep_spacing: str = "linspace",
    use_karras_sigmas: bool = False,
    batch: int = 2,
    size: int = 8,
    channels: int = 3,
    seed: int = 0,
    root: str = REFERENCE_ROOT,
) -> float:
    """Whole-loop DPM-Solver++ trajectory oracle vs the reference's
    ``KDPM2DiscreteSchedulerUncertainty`` (``scheduling_dpm_2_uncertainty_
    centered.py:876-940``): runs its full multistep loop (convert_model_output
    + order-1/2/3 updates + lower-order tail flags) and ``sample_dpm_solver``
    with the same analytic model, and returns max|Δ| of the FINAL sample.
    The non-SDE dpmsolver++ trajectory is noise-free, so this is exact; it
    pins the fork's n+1-point timestep spacings, the σ/λ tables, and the
    static order schedule against the reference's mutable-state loop.
    """
    import jax
    import jax.numpy as jnp
    import torch

    from ..diffusion.dpm_solver import DPMSolverConfig, sample_dpm_solver
    from ..diffusion.schedule import make_schedule
    from .diffusers_shim import install_diffusers_shim

    install_diffusers_shim()
    mod = import_reference(
        "schedulers_uncertainty.scheduling_dpm_2_uncertainty_centered", root
    )
    eps_fn_torch, model_fn = _oracle_models(size)
    torch.manual_seed(seed)
    # after_step=steps-1/num_steps_uc=1 keeps the fork's uncertainty block to
    # one cheap M=1 call (a 0-length window would make its `end<=t<=after`
    # bound span every step); the block does not touch the trajectory
    # the Imagenet subclass carries predict_model (the base fork has none)
    sched_ref = mod.KDPM2SchedulerUncertaintyImagenet(
        solver_order=solver_order,
        timestep_spacing=timestep_spacing,
        use_karras_sigmas=use_karras_sigmas,
        M=1, after_step=steps - 1, num_steps_uc=1,
        unet=_make_oracle_unet(eps_fn_torch),
    )
    sched_ref.set_timesteps(steps)

    rs = np.random.RandomState(seed)
    x_T = rs.randn(batch, size, size, channels).astype(np.float32)
    x_ref = torch.from_numpy(x_T.transpose(0, 3, 1, 2))
    with torch.no_grad():
        for t in sched_ref.timesteps:
            eps = eps_fn_torch(x_ref, t)
            x_ref = sched_ref.step(eps, t, x_ref).prev_sample
    final_ref = _to_nhwc(x_ref)

    cfg = DPMSolverConfig(
        num_inference_steps=steps,
        solver_order=solver_order,
        timestep_spacing=timestep_spacing,
        use_karras_sigmas=use_karras_sigmas,
    )
    res = sample_dpm_solver(
        model_fn, make_schedule("linear", 1000), jnp.asarray(x_T),
        jax.random.key(seed), cfg,
    )
    return _max_diff(final_ref, np.asarray(res.sample, np.float32))


def vae_diffs(
    cfg=None,
    batch: int = 1,
    seed: int = 0,
    state_dict: Optional[dict] = None,
    root: str = REFERENCE_ROOT,
) -> List[Tuple[str, float]]:
    """Encoder-moments + decoder diffs of the KL autoencoder
    (``uvit/autoencoder.py:412-460``)."""
    import jax.numpy as jnp
    import torch

    from ..models import AutoencoderKL, AutoencoderKLConfig
    from ..models.convert import convert_autoencoder_kl

    if cfg is None:
        # smallest config the reference accepts: its Normalize is hard-coded
        # GroupNorm(32) so every width must be a multiple of 32
        import dataclasses

        cfg = dataclasses.replace(AutoencoderKLConfig.tiny(), ch=32)
    ref_ae = import_reference("uvit.autoencoder", root)

    size = 8 * (2 ** (len(cfg.ch_mult) - 1))
    ddconfig = dict(
        double_z=True,
        z_channels=cfg.z_channels,
        resolution=size,
        in_channels=cfg.in_channels,
        out_ch=cfg.out_channels,
        ch=cfg.ch,
        ch_mult=list(cfg.ch_mult),
        num_res_blocks=cfg.num_res_blocks,
        attn_resolutions=[],
        dropout=0.0,
    )
    # FrozenAutoencoderKL's ctor force-loads a checkpoint file; compose the
    # same submodules (same state-dict key layout) without that requirement
    import torch.nn as tnn

    torch.manual_seed(seed)

    class _RefAE(tnn.Module):
        def __init__(self):
            super().__init__()
            self.encoder = ref_ae.Encoder(**ddconfig)
            self.decoder = ref_ae.Decoder(**ddconfig)
            self.quant_conv = tnn.Conv2d(2 * cfg.z_channels, 2 * cfg.embed_dim, 1)
            self.post_quant_conv = tnn.Conv2d(cfg.embed_dim, cfg.z_channels, 1)

        def encode_moments(self, x):
            return self.quant_conv(self.encoder(x))

        def decode(self, z):
            # reference decode: unscale then post_quant + decoder
            # (``autoencoder.py:446-450``)
            return self.decoder(self.post_quant_conv(z / cfg.scale_factor))

    ref = _RefAE()
    if state_dict is not None:
        ref.load_state_dict({k: torch.as_tensor(v) for k, v in state_dict.items()})
    ref.eval()

    rs = np.random.RandomState(seed)
    x = rs.randn(batch, size, size, cfg.in_channels).astype(np.float32)
    with torch.no_grad():
        xt = torch.from_numpy(x.transpose(0, 3, 1, 2))
        moments = ref.encode_moments(xt)
        z_scaled = cfg.scale_factor * moments[:, : cfg.embed_dim]  # mean half
        dec = ref.decode(z_scaled)

    sd = {k: v.numpy() for k, v in ref.state_dict().items()}
    params = convert_autoencoder_kl(sd, cfg)
    model = AutoencoderKL(cfg)
    j_moments = model.apply(params, jnp.asarray(x), "encode_moments")
    j_dec = model.apply(params, jnp.asarray(np.transpose(z_scaled.numpy(), (0, 2, 3, 1))), "decode")
    return [
        ("encode_moments", _max_diff(_to_nhwc(moments), np.asarray(j_moments, np.float32))),
        ("decode", _max_diff(_to_nhwc(dec), np.asarray(j_dec, np.float32))),
    ]


def _plain_torch_ddim(steps: int, unet, mod=None, root: str = REFERENCE_ROOT):
    """A reference scheduler usable as a PLAIN DDIM stepper.

    The guided class-conditional pipelines receive a stock diffusers
    ``DDIMScheduler`` (``scripts/generate_images_with_uncertainty_threshold
    .py:203``); diffusers isn't installed here, so we use the reference's
    *flip* fork with its window parked on the final step — flip's u-block is
    record-only and draws no noise (``scheduling_ddim_flip.py:487-493``), so
    every ``step()`` is exactly the stock DDIM update."""
    if mod is None:
        mod = import_reference("schedulers_uncertainty.scheduling_ddim_flip", root)
    sched = mod.DDIMSchedulerUncertainty(
        after_step=steps - 1, num_steps_uc=1, unet=unet
    )
    sched.set_timesteps(steps)
    return sched


class _NoiseQueue:
    """Deterministic ``torch.randn_like`` replacement: pops pre-drawn arrays
    in call order, falling back to real randn once exhausted.

    Armed per GUIDED UPDATE, not per loop: the flip fork's ``step()`` draws
    one unconditional (eta=0-unused) ``randn_like`` per call
    (``scheduling_ddim_flip.py:485``), so a loop-lifetime queue would desync;
    each guided update gets a queue holding exactly its own draws, and any
    trailing in-``step`` draw lands on the harmless fallback."""

    def __init__(self, arrays):
        import torch

        self._q = [torch.from_numpy(a) for a in arrays]
        self._torch_randn_like = torch.randn_like

    def __call__(self, t, **kwargs):
        if self._q:
            out = self._q.pop(0)
            assert out.shape == t.shape, (out.shape, t.shape)
            return out
        return self._torch_randn_like(t, **kwargs)

    @property
    def exhausted(self):
        return not self._q


def posterior_pipeline_broken(root: str = REFERENCE_ROOT) -> Dict[str, str]:
    """Verify (not assume) that the reference's posterior guided PIPELINE
    class is broken code at runtime, two ways:

    1. the driver script constructs it with ``threshold_type=``
       (``scripts/generate_images_with_uncertainty_threshold.py:215``) which
       ``DiffusionClassConditionalGuidedPosteriorDistribution.__init__``
       does not accept (``...posterior_distribution.py:76``);
    2. ``__call__``'s window block calls the module-level 4-positional-arg
       ``calculate_threshold_map`` with 3 args (``:158`` vs ``:11``).

    Returns the exception names actually raised. The posterior MATH
    (``estimate_score_update``, ``:206-243``) is working code and is oracled
    by :func:`posterior_guided_loop_diff`.
    """
    import torch

    from .diffusers_shim import install_diffusers_shim

    install_diffusers_shim()
    mod = import_reference(
        "pipeline_uncertainty.pipeline_sampler_class_conditional_uncertainty_guided_posterior_distribution",
        root,
    )
    out: Dict[str, str] = {}
    eps_fn_torch, _ = _oracle_models(8)
    unet = _make_oracle_unet(eps_fn_torch)
    sched = _plain_torch_ddim(6, unet, root=root)
    try:
        mod.DiffusionClassConditionalGuidedPosteriorDistribution(
            unet, sched, 0.9, 8, torch.device("cpu"), 2, 0, threshold_type="higher"
        )
        out["ctor_threshold_type"] = "no error"
    except TypeError as e:
        out["ctor_threshold_type"] = f"TypeError: {e}"
    # the 3-arg call the window block makes (:158)
    try:
        mod.calculate_threshold_map(0.9, 0, torch.zeros(2, 3, 8, 8))
        out["call_threshold_map_3args"] = "no error"
    except TypeError as e:
        out["call_threshold_map_3args"] = f"TypeError: {e}"
    return out


def posterior_guided_loop_diff(
    M: int = 4,
    steps: int = 8,
    start_step: int = 3,
    num_steps: int = 2,
    batch: int = 2,
    size: int = 8,
    channels: int = 3,
    seed: int = 0,
    threshold="midrange",  # "midrange" tensor | float percentile
    root: str = REFERENCE_ROOT,
) -> Dict[str, float]:
    """Matched-noise EXACT trajectory oracle for the posterior-distribution
    guidance.

    The reference pipeline class crashes before sampling (see
    :func:`posterior_pipeline_broken`), so the torch side drives the class's
    WORKING methods through the ``__call__`` loop semantics typed here
    (``...posterior_distribution.py:146-163``): plain DDIM step, then in the
    inclusive window ``start+num >= i >= start`` recompute x_{t-1} from
    ``eps' = post_score·mask + eps·(1−mask)`` with ``estimate_score_update``
    (``:206-243`` — ᾱ read at the loop INDEX ``alphas_cumprod[i]``, ``:152``,
    and the posterior score built from the LAST ensemble member summed over
    the batch axis, ``:242``) and the 4-arg ``calculate_threshold_map``
    (``:11-30``; the intent of the broken 3-arg call at ``:158``).

    The jax side is our real sampler + ``make_threshold_guidance`` with the
    documented compat knobs replicating the two latent bugs, fed the SAME
    ensemble noise (``torch.randn_like`` patched to a queue of shared draws).
    Everything — uncertainty maps, masks, trajectories — must agree to f32
    roundoff.
    """
    import jax
    import jax.numpy as jnp
    import torch

    from ..diffusion.sampler import SamplerConfig, sample_ddim
    from ..diffusion.schedule import make_schedule
    from ..uncertainty.guidance import make_threshold_guidance
    from .diffusers_shim import install_diffusers_shim

    install_diffusers_shim()
    mod = import_reference(
        "pipeline_uncertainty.pipeline_sampler_class_conditional_uncertainty_guided_posterior_distribution",
        root,
    )
    eps_fn_torch, model_fn = _oracle_models(size)
    unet = _make_oracle_unet(eps_fn_torch)
    sched = _plain_torch_ddim(steps, unet, root=root)

    rs = np.random.RandomState(seed)
    x_T = rs.randn(batch, size, size, channels).astype(np.float32)
    n_window = num_steps + 1  # inclusive bound (:156)
    ens = rs.randn(n_window, M, batch, size, size, channels).astype(np.float32)

    if threshold == "midrange":
        thr_host = np.full((steps,), 5e-3, np.float32)  # ~typical Var scale
        thr_ref: object = torch.from_numpy(thr_host)
        thr_jax: object = jnp.asarray(thr_host)
    else:
        thr_ref = thr_jax = float(threshold)

    # pipeline instance only to borrow its methods (ctor per script intent)
    pipe = mod.DiffusionClassConditionalGuidedPosteriorDistribution(
        unet, sched, thr_ref, size, torch.device("cpu"), batch, 0, M=M
    )

    x_ref = torch.from_numpy(x_T.transpose(0, 3, 1, 2))
    ref_traj: List[np.ndarray] = []
    ref_unc: List[np.ndarray] = []
    y = torch.zeros(batch, dtype=torch.long)
    orig_randn_like = torch.randn_like
    try:
        with torch.no_grad():
            for i, t in enumerate(sched.timesteps):
                t = int(t)
                t_tensor = torch.full((batch,), t, dtype=torch.long)
                eps = eps_fn_torch(x_ref, t)
                out = sched.step(eps, t, x_ref, eta=0.0)
                prev = out.prev_sample
                alpha_hat_t = sched.alphas_cumprod[i]  # the :152 index bug
                if (start_step + num_steps) >= i >= start_step:
                    w = i - start_step
                    queue = _NoiseQueue(
                        [ens[w, m].transpose(0, 3, 1, 2).copy() for m in range(M)]
                    )
                    torch.randn_like = queue
                    try:
                        u, post = pipe.estimate_score_update(
                            x_ref, y, i, t_tensor, eps, prev, alpha_hat_t
                        )
                    finally:
                        torch.randn_like = orig_randn_like
                    assert queue.exhausted
                    mask = mod.calculate_threshold_map(thr_ref, i, u, "higher")
                    new_eps = post * mask + eps * (1 - mask)
                    out = sched.step(new_eps, t, x_ref, eta=0.0)
                    prev = out.prev_sample
                    ref_unc.append(_to_nhwc(u))
                x_ref = prev
                ref_traj.append(_to_nhwc(x_ref))
    finally:
        torch.randn_like = orig_randn_like

    schedule = make_schedule("linear", 1000)
    cfg = SamplerConfig(
        num_inference_steps=steps, after_step=start_step, num_steps_uc=n_window
    )
    guidance = make_threshold_guidance(
        M=M,
        threshold=thr_jax,
        threshold_type="higher",
        step_index_offset=start_step,
        compat_step_index_alpha=True,
        compat_batch_sum=True,
        ensemble_noise=ens,
    )
    res = sample_ddim(
        model_fn, schedule, jnp.asarray(x_T), jax.random.key(seed), cfg,
        guidance=guidance, collect_intermediates=True,
    )

    diffs: Dict[str, float] = {}
    traj = np.asarray(res.intermediates, np.float32)
    assert traj.shape[0] == len(ref_traj)
    diffs["traj"] = max(_max_diff(r, traj[i]) for i, r in enumerate(ref_traj))
    unc = np.asarray(res.uncertainty, np.float32)
    assert unc.shape[0] == len(ref_unc), (unc.shape, len(ref_unc))
    diffs["u"] = max(_max_diff(r, unc[i]) for i, r in enumerate(ref_unc))
    return diffs


def second_order_guided_loop_diff(
    M: int = 4,
    steps: int = 8,
    start_step: int = 3,
    num_steps: int = 3,
    batch: int = 2,
    size: int = 8,
    channels: int = 3,
    seed: int = 0,
    threshold=0.5,  # float percentile | "midrange" tensor
    threshold_type: str = "higher",
    root: str = REFERENCE_ROOT,
) -> Dict[str, float]:
    """Matched-noise EXACT whole-trajectory oracle for the second-order
    (momentum) guided pipeline.

    Torch side: the ACTUAL ``DiffusionClassConditionalGuidedSecondOrder
    .update_with_uncertainty`` + ``estimate_score_update`` methods
    (``...guided_second_order.py:195-298``) driven through the ``__call__``
    loop semantics (``:146-162``: plain DDIM step; in the half-open window
    ``start+num > i >= start`` the update ``eps' = eps + u·sign(n)·mask``
    with u the centered mean-square over M re-noised forwards at
    ᾱ[loop-index], zeros-initialised β=0.99 momentum EMA). Jax side: our
    sampler + ``make_second_order_guidance`` with the compat ᾱ knob and the
    same injected ensemble + sign noise. eta=0 ⇒ exact comparison of every
    intermediate sample.
    """
    import contextlib
    import io

    import jax
    import jax.numpy as jnp
    import torch

    from ..diffusion.sampler import SamplerConfig, sample_ddim
    from ..diffusion.schedule import make_schedule
    from ..uncertainty.guidance import make_second_order_guidance
    from .diffusers_shim import install_diffusers_shim

    install_diffusers_shim()
    mod = import_reference(
        "pipeline_uncertainty.pipeline_sampler_class_conditional_uncertainty_guided_second_order",
        root,
    )
    eps_fn_torch, model_fn = _oracle_models(size)
    unet = _make_oracle_unet(eps_fn_torch)
    sched = _plain_torch_ddim(steps, unet, root=root)

    rs = np.random.RandomState(seed)
    x_T = rs.randn(batch, size, size, channels).astype(np.float32)
    ens = rs.randn(num_steps, M, batch, size, size, channels).astype(np.float32)
    sign = rs.randn(num_steps, batch, size, size, channels).astype(np.float32)

    if threshold == "midrange":
        thr_host = np.full((steps,), 5e-3, np.float32)
        thr_ref: object = torch.from_numpy(thr_host)
        thr_jax: object = jnp.asarray(thr_host)
    else:
        thr_ref = thr_jax = float(threshold)

    pipe = mod.DiffusionClassConditionalGuidedSecondOrder(
        unet, sched, thr_ref, size, torch.device("cpu"), batch, 0, M=M,
        threshold_type=threshold_type,
    )

    x_ref = torch.from_numpy(x_T.transpose(0, 3, 1, 2))
    ref_traj: List[np.ndarray] = []
    y = torch.zeros(batch, dtype=torch.long)
    momentum = torch.zeros_like(x_ref)  # :147
    orig_randn_like = torch.randn_like
    try:
        with torch.no_grad(), contextlib.redirect_stdout(io.StringIO()):
            for i, t in enumerate(sched.timesteps):
                t = int(t)
                t_tensor = torch.full((batch,), t, dtype=torch.long)
                eps = eps_fn_torch(x_ref, t)
                out = sched.step(eps, t, x_ref, eta=0.0)
                prev = out.prev_sample
                alpha_hat_t = sched.alphas_cumprod[i]  # :157
                if (start_step + num_steps) > i >= start_step:
                    w = i - start_step
                    # M ensemble draws, then the sign draw (:249); the
                    # method's internal step() draws one more (unused at
                    # eta=0) which lands on the queue's fallback
                    queue = _NoiseQueue(
                        [ens[w, m].transpose(0, 3, 1, 2).copy() for m in range(M)]
                        + [sign[w].transpose(0, 3, 1, 2).copy()]
                    )
                    torch.randn_like = queue
                    try:
                        prev, momentum = pipe.update_with_uncertainty(
                            x_ref, y, 0.99, momentum, i, t, t_tensor, eps,
                            prev, alpha_hat_t,
                        )
                    finally:
                        torch.randn_like = orig_randn_like
                    assert queue.exhausted
                x_ref = prev
                ref_traj.append(_to_nhwc(x_ref))
    finally:
        torch.randn_like = orig_randn_like

    schedule = make_schedule("linear", 1000)
    cfg = SamplerConfig(
        num_inference_steps=steps, after_step=start_step, num_steps_uc=num_steps
    )
    guidance = make_second_order_guidance(
        M=M,
        threshold=thr_jax,
        threshold_type=threshold_type,
        step_index_offset=start_step,
        compat_step_index_alpha=True,
        ensemble_noise=ens,
        sign_noise=sign,
    )
    res = sample_ddim(
        model_fn, schedule, jnp.asarray(x_T), jax.random.key(seed), cfg,
        guidance=guidance, collect_intermediates=True,
    )

    traj = np.asarray(res.intermediates, np.float32)
    assert traj.shape[0] == len(ref_traj)
    return {
        "traj": max(_max_diff(r, traj[i]) for i, r in enumerate(ref_traj))
    }


def score_model_gradient_loop_diff(
    steps: int = 8,
    after_step: int = 3,
    num_steps_uc: int = 3,
    batch: int = 2,
    size: int = 8,
    channels: int = 3,
    seed: int = 0,
    normalize_grad: bool = False,
    root: str = REFERENCE_ROOT,
) -> Dict[str, float]:
    """EXACT whole-trajectory oracle for the trained-surrogate gradient fork
    (``scheduling_ddim_score_uncertainty_model_gradient.py:519-575``).

    The fork is deterministic (no ensemble noise — the surrogate predicts u
    from pred_epsilon and the timestep INDEX via ``timesteps_index_map``,
    ``:385,525``), so the whole guided loop must match to f32 roundoff: u =
    surrogate(eps, idx), eps' = eps + ∂(u.mean(0).sum())/∂eps · ᾱ_t, x̂0 kept
    from the ORIGINAL model output (``:555``), direction from eps'
    (``:570-573``). Both sides use the same analytic differentiable
    surrogate."""
    import jax
    import jax.numpy as jnp
    import torch

    from ..diffusion.sampler import SamplerConfig, sample_ddim
    from ..diffusion.schedule import make_schedule, spaced_timesteps
    from ..uncertainty.guidance import make_score_model_gradient_guidance
    from .diffusers_shim import install_diffusers_shim

    install_diffusers_shim()
    mod = import_reference(
        "schedulers_uncertainty.scheduling_ddim_score_uncertainty_model_gradient",
        root,
    )
    eps_fn_torch, model_fn = _oracle_models(size)
    unet = _make_oracle_unet(eps_fn_torch)

    class _AnalyticScoreModel(torch.nn.Module):
        def forward(self, eps, idx):
            s = 1.0 + 0.1 * torch.sin(idx.float().view(-1, 1, 1, 1))
            return 0.5 * (eps * s) ** 2 + 0.3 * torch.cos(eps)

    def score_model_apply(eps, idx):
        s = 1.0 + 0.1 * jnp.sin(idx.astype(jnp.float32).reshape(-1, 1, 1, 1))
        return 0.5 * (eps * s) ** 2 + 0.3 * jnp.cos(eps)

    sched = mod.DDIMSchedulerUncertainty(
        after_step=after_step, num_steps_uc=num_steps_uc, unet=unet,
        score_model=_AnalyticScoreModel(), normalize_grad=normalize_grad,
    )
    sched.set_timesteps(steps)

    rs = np.random.RandomState(seed)
    x_T = rs.randn(batch, size, size, channels).astype(np.float32)
    x_ref = torch.from_numpy(x_T.transpose(0, 3, 1, 2))
    ref_traj: List[np.ndarray] = []
    ref_unc: List[np.ndarray] = []
    import contextlib
    import io

    with contextlib.redirect_stdout(io.StringIO()):
        for t in sched.timesteps:
            t = int(t)
            with torch.no_grad():
                eps = eps_fn_torch(x_ref, t)
            out = sched.step(eps, t, x_ref, eta=0.0)
            if getattr(out, "uncertainty", None) is not None:
                ref_unc.append(_to_nhwc(out.uncertainty.detach()))
            x_ref = out.prev_sample.detach()
            ref_traj.append(_to_nhwc(x_ref))

    schedule = make_schedule("linear", 1000)
    cfg = SamplerConfig(
        num_inference_steps=steps, after_step=after_step, num_steps_uc=num_steps_uc
    )
    ts = spaced_timesteps(1000, steps, "leading", 0)
    guidance = make_score_model_gradient_guidance(
        score_model_apply, ts, normalize_grad=normalize_grad
    )
    res = sample_ddim(
        model_fn, schedule, jnp.asarray(x_T), jax.random.key(seed), cfg,
        guidance=guidance, collect_intermediates=True,
    )

    diffs: Dict[str, float] = {}
    traj = np.asarray(res.intermediates, np.float32)
    assert traj.shape[0] == len(ref_traj)
    diffs["traj"] = max(_max_diff(r, traj[i]) for i, r in enumerate(ref_traj))
    unc = np.asarray(res.uncertainty, np.float32)
    assert unc.shape[0] == len(ref_unc), (unc.shape, len(ref_unc))
    diffs["u"] = max(_max_diff(r, unc[i]) for i, r in enumerate(ref_unc))
    return diffs


def ause_metric_diff(
    n: int = 4096, intervals: int = 50, seed: int = 0, root: str = REFERENCE_ROOT
) -> Dict[str, float]:
    """Same-array AUSE/AURG oracle: feed identical (gt, pred, uncert) arrays
    to the reference's ``metrics.ause.compute_aucs`` (``metrics/ause.py:
    91-146``, the paper's Table-2 metric) and to both our exact and TPU-fast
    implementations; return absolute differences of the AUSE/AURG scalars and
    the max pointwise curve differences."""
    import jax.numpy as jnp

    from ..metrics.ause import (
        ause_aurg_from_curves,
        compute_aucs,
        sparsification_curves_fast,
    )

    ref = import_reference("metrics.ause", root)
    rs = np.random.RandomState(seed)
    gt = (rs.rand(n) * 2 - 1).astype(np.float32)
    pred = (gt + 0.3 * rs.randn(n)).astype(np.float32)
    # mid-quality uncertainty: correlated with the true error + noise, so the
    # sparse curve sits strictly between oracle and random
    uncert = (np.abs(gt - pred) + 0.1 * rs.rand(n)).astype(np.float32)

    aucs_ref, curves_ref = ref.compute_aucs(gt, pred, uncert, intervals)
    aucs, curves = compute_aucs(gt, pred, uncert, intervals)

    out = {
        "ause": abs(aucs["rmse"][0] - float(aucs_ref["rmse"][0])),
        "aurg": abs(aucs["rmse"][1] - float(aucs_ref["rmse"][1])),
        "sparse_curve": max(
            abs(float(a) - float(b))
            for a, b in zip(curves["rmse"][2], curves_ref["rmse"][2])
        ),
        "opt_curve": max(
            abs(float(a) - float(b))
            for a, b in zip(curves["rmse"][0], curves_ref["rmse"][0])
        ),
    }
    opt, rnd, sparse = sparsification_curves_fast(
        jnp.asarray(gt), jnp.asarray(pred), jnp.asarray(uncert), intervals
    )
    a_f, g_f = ause_aurg_from_curves(np.asarray(opt), np.asarray(rnd), np.asarray(sparse))
    out["fast_ause"] = abs(a_f - float(aucs_ref["rmse"][0]))
    out["fast_aurg"] = abs(g_f - float(aucs_ref["rmse"][1]))
    return out


def precision_recall_metric_diff(
    n: int = 512, dim: int = 64, k: int = 3, seed: int = 0, root: str = REFERENCE_ROOT
) -> Dict[str, float]:
    """Same-array improved-P&R oracle vs the reference's kNN manifold math
    (``metrics/precision_recall.py:194-282``: f64 pairwise distances,
    (k+1)-smallest radii incl. self, strict ``dist < radii`` membership).
    Features are drawn so the two manifolds overlap partially — precision and
    recall both land strictly inside (0, 1)."""
    import torch

    from .diffusers_shim import install_diffusers_shim

    install_diffusers_shim()
    ref = import_reference("metrics.precision_recall", root)

    from ..metrics.precision_recall import knn_radii, precision_recall

    rs = np.random.RandomState(seed)
    real = rs.randn(n, dim).astype(np.float32)
    gen = (rs.randn(n, dim) * 1.1 + 0.2).astype(np.float32)

    import contextlib
    import io

    with contextlib.redirect_stdout(io.StringIO()):
        radii_real = ref.distances2radii(ref.compute_pairwise_distances(real), k)
        radii_gen = ref.distances2radii(ref.compute_pairwise_distances(gen), k)
        # IPR.precision_and_recall wraps manifold features AND radii as torch
        # tensors before compute_metric (:65-67)
        m_real = ref.Manifold(torch.from_numpy(real), torch.from_numpy(radii_real))
        m_gen = ref.Manifold(torch.from_numpy(gen), torch.from_numpy(radii_gen))
        prec_ref = float(ref.compute_metric(m_real, torch.from_numpy(gen)))
        rec_ref = float(ref.compute_metric(m_gen, torch.from_numpy(real)))

    import jax.numpy as jnp

    pr = precision_recall(real, gen, k=k)
    r_j = np.sqrt(np.asarray(knn_radii(jnp.asarray(real), k), np.float64))
    return {
        "precision": abs(pr.precision - prec_ref),
        "recall": abs(pr.recall - rec_ref),
        "radii": float(np.max(np.abs(r_j - np.asarray(radii_real)))),
        "precision_ref": prec_ref,
        "recall_ref": rec_ref,
    }
