from .layers import GPT, Block, FFN, MultiHeadSelfAttention, RQTransformer
from .quantize import drop_quantized_kernels, quantize_decode_params
from .sampling import (filter_logits, sample_gpt,
                       sample_gpt_sharded, sample_rq,
                       sample_rq_sharded)
from .transformer import CondTransformer

__all__ = ["GPT", "RQTransformer", "Block", "FFN", "MultiHeadSelfAttention",
           "CondTransformer", "sample_gpt", "sample_rq", "filter_logits",
           "sample_gpt_sharded", "sample_rq_sharded",
           "quantize_decode_params", "drop_quantized_kernels"]
