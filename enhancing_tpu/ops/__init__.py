from .attention import multihead_attention
from .vq import codebook_distances, l2_normalize, nearest_codebook_indices

__all__ = [
    "multihead_attention",
    "nearest_codebook_indices",
    "codebook_distances",
    "l2_normalize",
]
