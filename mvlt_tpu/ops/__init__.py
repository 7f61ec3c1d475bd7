from mvlt_tpu.ops.attention import multi_head_attention
from mvlt_tpu.ops.upsample import upsample_bilinear_align_corners

__all__ = ["multi_head_attention", "upsample_bilinear_align_corners"]
