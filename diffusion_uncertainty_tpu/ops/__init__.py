"""Pallas TPU kernels + XLA fallbacks for the hot ops."""

from .attention import dot_product_attention  # noqa: F401
from .groupnorm import group_norm_silu  # noqa: F401
