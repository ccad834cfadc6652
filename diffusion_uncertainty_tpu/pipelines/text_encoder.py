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

__all__ = ["encode_prompts", "encode_tokens_flax", "pseudo_text_embeddings", "SD15_TEXT_DIM", "SD15_TEXT_LEN"]

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
    hid, _ = CLIPTextEncoder(cfg).apply(params, jnp.asarray(input_ids, jnp.int32))
    return np.asarray(hid, np.float32)


def encode_prompts(
    prompts: Sequence[str],
    negative_prompts: Optional[Sequence[str]] = None,
    model_name: str = "openai/clip-vit-large-patch14",
    local_path: Optional[str] = None,
) -> Tuple[np.ndarray, np.ndarray]:
    """(cond, uncond) embeddings, each [B, 77, D] float32.

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
        encoder.eval()

        def enc(texts):
            tokens = tokenizer(
                list(texts), padding="max_length", max_length=tokenizer.model_max_length,
                truncation=True, return_tensors="pt",
            )
            with torch.no_grad():
                return encoder(tokens.input_ids)[0].float().numpy()

        return enc(prompts), enc(negative_prompts)
    except Exception:
        return (
            pseudo_text_embeddings(list(prompts)),
            pseudo_text_embeddings(list(negative_prompts)),
        )
