from multimodal_flows_tpu.ops.attention import multihead_attention
from multimodal_flows_tpu.ops.pooling import masked_meansum_pool

__all__ = ["multihead_attention", "masked_meansum_pool"]
