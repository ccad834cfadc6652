"""Host-side text encoding for the T2I pipelines.

The reference's forked diffusers pipelines call ``self._encode_prompt`` (CLIP
ViT-L/14 for SD1.5 — ``pipeline_stable_diffusion_uncertainty_guided.py:577``ff)
inside the pipeline. Text encoding is a tiny, once-per-prompt CPU workload, so
TPU-first it belongs on the host: encode with ``transformers`` (torch CPU)
into ``[B, 77, D]`` embeddings, then hand plain arrays to the jitted denoise
loop. Keeps the hot path free of tokenizers and keeps the pipeline contract
(``pipelines/text_to_image.py``) purely array-in/array-out.

Zero-egress environments can't download CLIP weights; ``encode_prompts``
falls back to a deterministic hash-seeded pseudo-embedding (stable across
processes) when the model can't be loaded, so scripts stay runnable with
``--random-init true`` and tests never need the network.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import numpy as np

__all__ = [
    "encode_prompts",
    "encode_prompts_ex",
    "encode_tokens_flax",
    "pseudo_text_embeddings",
    "pseudo_token_ids",
    "T2ITowers",
    "SD15_TEXT_DIM",
    "SD15_TEXT_LEN",
]

SD15_TEXT_DIM = 768  # CLIP ViT-L/14 hidden size
SD15_TEXT_LEN = 77


def pseudo_text_embeddings(
    prompts: Sequence[str], seq_len: int = SD15_TEXT_LEN, dim: int = SD15_TEXT_DIM
) -> np.ndarray:
    """Deterministic prompt-hashed stand-in embeddings (no network, no torch).

    Unit-variance gaussian per prompt, seeded by a stable hash of the text —
    distinct prompts get distinct conditioning, identical prompts identical
    conditioning, matching the contract the denoise loop actually relies on.
    """
    import hashlib

    out = np.empty((len(prompts), seq_len, dim), np.float32)
    for i, p in enumerate(prompts):
        seed = int.from_bytes(hashlib.sha256(p.encode()).digest()[:4], "little")
        out[i] = np.random.RandomState(seed).randn(seq_len, dim).astype(np.float32)
    return out


def encode_tokens_flax(params, input_ids: np.ndarray, cfg=None) -> np.ndarray:
    """On-device CLIP text encoding: token ids -> [B, L, D] hidden states via
    the flax ``models.clip_text.CLIPTextEncoder`` (params from
    ``models.convert.convert_clip_text`` on a transformers state dict —
    verified against torch in tests/test_models.py). Tokenization stays
    host-side (``CLIPTokenizer`` vocab files)."""
    import jax.numpy as jnp

    from ..models import CLIPTextConfig, CLIPTextEncoder

    cfg = cfg or CLIPTextConfig.vit_l_14()
    out = CLIPTextEncoder(cfg).apply(params, jnp.asarray(input_ids, jnp.int32))
    return np.asarray(out.last_hidden, np.float32)


def encode_prompts(
    prompts: Sequence[str],
    negative_prompts: Optional[Sequence[str]] = None,
    model_name: str = "openai/clip-vit-large-patch14",
    local_path: Optional[str] = None,
) -> Tuple[np.ndarray, np.ndarray]:
    """(cond, uncond) — see :func:`encode_prompts_ex`."""
    return encode_prompts_ex(prompts, negative_prompts, model_name, local_path)[:2]


def encode_prompts_ex(
    prompts: Sequence[str],
    negative_prompts: Optional[Sequence[str]] = None,
    model_name: str = "openai/clip-vit-large-patch14",
    local_path: Optional[str] = None,
) -> Tuple[np.ndarray, np.ndarray, bool]:
    """(cond, uncond, used_pseudo) embeddings, each [B, 77, D] float32.

    Tries a local/downloaded CLIP text encoder first (``transformers``, torch
    CPU); on failure (zero egress, missing weights) falls back to
    ``pseudo_text_embeddings`` so the pipeline stays exercisable end to end.
    For fully on-device encoding convert the same weights with
    ``convert_clip_text`` and call ``encode_tokens_flax``.
    """
    if negative_prompts is None:
        negative_prompts = [""] * len(prompts)
    assert len(negative_prompts) == len(prompts)
    try:
        import torch
        from transformers import CLIPTextModel, CLIPTokenizer

        src = local_path or model_name
        # local_files_only always: with no egress the hub client otherwise
        # burns ~2 min in retry backoff before we can fall back. Networked
        # users pre-download to the HF cache or pass local_path.
        tokenizer = CLIPTokenizer.from_pretrained(src, local_files_only=True)
        encoder = CLIPTextModel.from_pretrained(src, local_files_only=True)
    except (ImportError, OSError, TypeError):
        # construction-time failures only: missing torch/transformers or
        # missing local weights/vocab (zero egress; TypeError = cached repo
        # without vocab files). Encoding errors below raise — a real
        # tokenizer/encoder bug must surface, not silently degrade to
        # pseudo embeddings.
        return (
            pseudo_text_embeddings(list(prompts)),
            pseudo_text_embeddings(list(negative_prompts)),
            True,
        )
    encoder.eval()

    def enc(texts):
        tokens = tokenizer(
            list(texts), padding="max_length", max_length=tokenizer.model_max_length,
            truncation=True, return_tensors="pt",
        )
        with torch.no_grad():
            return encoder(tokens.input_ids)[0].float().numpy()

    return enc(prompts), enc(negative_prompts), False


# ---------------------------------------------------------------------------
# SD3 / Flux conditioning through real flax towers
# ---------------------------------------------------------------------------
#
# Reference: SD3 encodes through (tokenizer, text_encoder=CLIP-L-proj),
# (tokenizer_2, text_encoder_2=CLIP-G-proj), (tokenizer_3, text_encoder_3=T5)
# (``pipeline_stable_diffusion_3_uncertainty_guided.py:90-93,118-121``);
# Flux through (CLIP-L pooled, T5 hidden) (``pipeline_flux_uncertainty.py:60``).
# Conditioning assembly (diffusers SD3 encode_prompt):
#   clip_ctx  = concat([clip_l.hidden_states[-2], clip_g.hidden_states[-2]], -1)
#   context   = seq-concat([zero-pad(clip_ctx -> t5_dim), t5_hidden])
#   pooled    = concat([clip_l.text_embeds, clip_g.text_embeds], -1)
# Tokenization is host-side; in zero-egress environments deterministic
# hash-seeded pseudo TOKEN IDS stand in (the towers themselves stay real).

CLIP_VOCAB = 49408
CLIP_EOS = 49407
T5_VOCAB = 32128


def pseudo_token_ids(
    prompts: Sequence[str], seq_len: int, vocab_size: int,
    bos: Optional[int] = None, eos: Optional[int] = None, pad: int = 0,
) -> np.ndarray:
    """Deterministic prompt-hashed token ids (the zero-egress tokenizer
    stand-in): per prompt, a hash-seeded id sequence of length ~len(words)+2,
    padded to ``seq_len``, with optional BOS/EOS structure."""
    import hashlib

    out = np.full((len(prompts), seq_len), pad, np.int32)
    for i, p in enumerate(prompts):
        seed = int.from_bytes(hashlib.sha256(("tok:" + p).encode()).digest()[:4], "little")
        rs = np.random.RandomState(seed)
        n = min(max(len(p.split()), 1) + 2, seq_len)
        ids = rs.randint(1, vocab_size - 2, size=n)
        if bos is not None:
            ids[0] = bos
        if eos is not None:
            ids[n - 1] = eos
        out[i, :n] = ids
    return out


def _clip_tokenize(prompts, seq_len, local_path=None):
    """(ids [B, seq_len] int32, used_pseudo)."""
    try:
        from transformers import CLIPTokenizer

        tok = CLIPTokenizer.from_pretrained(
            local_path or "openai/clip-vit-large-patch14", local_files_only=True
        )
    except (ImportError, OSError, TypeError):
        # construction-time failures only: missing transformers / missing
        # local vocab files (zero egress). TypeError is transformers' symptom
        # for a cached repo whose vocab file is absent (vocab_file=None
        # reaches open()). Tokenization errors below raise — a real tokenizer
        # bug must never silently degrade to pseudo ids.
        return pseudo_token_ids(
            prompts, seq_len, CLIP_VOCAB, bos=CLIP_VOCAB - 2, eos=CLIP_EOS
        ), True
    enc = tok(list(prompts), padding="max_length", max_length=seq_len,
              truncation=True, return_tensors="np")
    return enc["input_ids"].astype(np.int32), False


def _t5_tokenize(prompts, seq_len, local_path=None):
    try:
        from transformers import T5TokenizerFast

        tok = T5TokenizerFast.from_pretrained(
            local_path or "google/t5-v1_1-xxl", local_files_only=True
        )
    except (ImportError, OSError, TypeError, ValueError, AttributeError):
        # construction-time failures only (missing transformers / vocab files;
        # TypeError/ValueError/AttributeError are transformers' symptoms for
        # a cached repo without tokenizer files — e.g. convert_slow_tokenizer
        # on a None spm model) — tokenization errors below raise
        return pseudo_token_ids(prompts, seq_len, T5_VOCAB, eos=1), True
    enc = tok(list(prompts), padding="max_length", max_length=seq_len,
              truncation=True, return_tensors="np")
    return enc["input_ids"].astype(np.int32), False


def _unflatten_npz(path, template):
    """npz with 'a/b/c'-joined keys -> nested dict shaped like ``template``.
    Missing or extra keys raise (partial tower weights are never valid)."""
    import jax

    with np.load(path) as f:
        flat = {k: f[k] for k in f.files}
    paths_leaves, treedef = jax.tree_util.tree_flatten_with_path(template)
    keys = [
        "/".join(str(getattr(k, "key", k)) for k in p) for p, _ in paths_leaves
    ]
    missing = [k for k in keys if k not in flat]
    extra = sorted(set(flat) - set(keys))
    if missing or extra:
        raise KeyError(
            f"{path}: key mismatch vs architecture (missing {missing[:5]}, extra {extra[:5]})"
        )
    return jax.tree_util.tree_unflatten(treedef, [flat[k] for k in keys])


class T2ITowers:
    """Real flax text towers for the SD3/Flux conditioning path.

    ``scale``:
      * ``"small"`` — real hidden widths (768/1280/4096) at depth 2, random
        init: runs the full conditioning path in zero-egress environments.
      * ``"full"``  — the real architectures (CLIP-L-proj, CLIP-G, T5-XXL);
        pass converted params via ``load(params_dir)`` on weights day, or
        random init for capability runs.
    """

    def __init__(self, family: str = "sd3", scale: str = "small", seed: int = 0,
                 clip_seq: int = 77, t5_seq: int = 77):
        import dataclasses as dc

        import jax

        from ..models import CLIPTextConfig, CLIPTextEncoder, T5Config, T5Encoder

        assert family in ("sd3", "flux")
        # a typo like 'smal' must not silently instantiate the full-scale
        # CLIP-G + T5-XXL architectures (multi-GB host allocation)
        assert scale in ("small", "full"), f"scale must be 'small' or 'full', got {scale!r}"
        self.family = family
        self.clip_seq = clip_seq
        self.t5_seq = t5_seq

        small = scale == "small"
        self.clip_l_cfg = CLIPTextConfig.vit_l_14_projected() if family == "sd3" else dc.replace(
            CLIPTextConfig.vit_l_14(), eos_token_id=CLIP_EOS
        )
        if small:
            self.clip_l_cfg = dc.replace(self.clip_l_cfg, num_layers=2)
        self.clip_l = CLIPTextEncoder(self.clip_l_cfg)
        k = jax.random.split(jax.random.key(seed), 3)
        ids0 = np.zeros((1, clip_seq), np.int32)
        self.clip_l_params = self.clip_l.init(k[0], ids0)

        self.clip_g_cfg = self.clip_g = self.clip_g_params = None
        if family == "sd3":
            self.clip_g_cfg = CLIPTextConfig.vit_bigg_14()
            if small:
                self.clip_g_cfg = dc.replace(self.clip_g_cfg, num_layers=2)
            self.clip_g = CLIPTextEncoder(self.clip_g_cfg)
            self.clip_g_params = self.clip_g.init(k[1], ids0)

        self.t5_cfg = T5Config.v1_1_xxl()
        if small:
            import dataclasses as dc2

            self.t5_cfg = dc2.replace(self.t5_cfg, num_layers=2, d_ff=4096)
        self.t5 = T5Encoder(self.t5_cfg)
        self.t5_params = self.t5.init(k[2], np.zeros((1, t5_seq), np.int32))
        self.used_pseudo_tokens = False

    def load(self, params_dir: str) -> "T2ITowers":
        """Restore converted tower params (the weights-day ramp).

        ``params_dir`` holds one entry per tower — ``clip_l``, ``t5``, and
        (sd3 only) ``clip_g`` — each either an orbax checkpoint directory
        written by ``utils.checkpoint.save_params`` or a ``<name>.npz`` flat
        dict ('a/b/c' keys) — on the output of the matching converter
        (``models.convert.convert_clip_text`` / ``convert_t5_encoder``). The
        reference loads the same three towers at
        ``pipeline_stable_diffusion_3_uncertainty_guided.py:90-121``. Every
        tower must be present (a partial load would silently mix random-init
        towers into real conditioning) and every leaf must match the
        architecture's shape (a 'small'-scale instance can't take full
        weights).
        """
        from pathlib import Path

        import jax

        base = Path(params_dir)
        towers = [("clip_l", "clip_l_params"), ("t5", "t5_params")]
        if self.family == "sd3":
            towers.append(("clip_g", "clip_g_params"))
        for name, attr in towers:
            template = getattr(self, attr)
            ckpt_dir, npz = base / name, base / f"{name}.npz"
            if ckpt_dir.is_dir():
                from ..utils.checkpoint import load_params

                restored = load_params(ckpt_dir, template=template)
            elif npz.is_file():
                restored = _unflatten_npz(npz, template)
            else:
                raise FileNotFoundError(
                    f"tower checkpoint missing: {ckpt_dir} (orbax dir) or {npz}"
                )
            bad = []

            def _chk(path, a, b):
                if tuple(a.shape) != tuple(b.shape):
                    bad.append(f"{jax.tree_util.keystr(path)}: {a.shape} != {b.shape}")
                return a

            jax.tree_util.tree_map_with_path(_chk, restored, template)
            if bad:
                raise ValueError(f"{name}: leaf shapes differ from the architecture: {bad[:5]}")
            setattr(self, attr, restored)
        return self

    def encode(self, prompts: Sequence[str], clip_path=None, t5_path=None):
        """-> (context [B, clip_seq + t5_seq, t5_dim], pooled [B, P]) float32.

        SD3: P = 768 + 1280 (projected CLIP-L + CLIP-G); Flux: P = 768
        (CLIP-L eot-pooled, unprojected) and context is the T5 hidden alone.
        """
        import jax.numpy as jnp

        ids_l, p1 = _clip_tokenize(prompts, self.clip_seq, clip_path)
        ids_t5, p3 = _t5_tokenize(prompts, self.t5_seq, t5_path)
        self.used_pseudo_tokens = bool(p1 or p3)

        out_l = self.clip_l.apply(self.clip_l_params, jnp.asarray(ids_l))
        t5_hidden = self.t5.apply(self.t5_params, jnp.asarray(ids_t5))

        if self.family == "flux":
            return np.asarray(t5_hidden, np.float32), np.asarray(out_l.pooled, np.float32)

        out_g = self.clip_g.apply(self.clip_g_params, jnp.asarray(ids_l))
        clip_ctx = jnp.concatenate([out_l.penultimate, out_g.penultimate], axis=-1)
        pad = self.t5_cfg.d_model - clip_ctx.shape[-1]
        clip_ctx = jnp.pad(clip_ctx, ((0, 0), (0, 0), (0, pad)))
        context = jnp.concatenate([clip_ctx, t5_hidden], axis=1)
        pooled = jnp.concatenate([out_l.pooled, out_g.pooled], axis=-1)
        return np.asarray(context, np.float32), np.asarray(pooled, np.float32)
