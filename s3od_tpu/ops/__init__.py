from s3od_tpu.ops.attention import multi_head_attention
from s3od_tpu.ops.resize import resize_bilinear

__all__ = ["multi_head_attention", "resize_bilinear"]
