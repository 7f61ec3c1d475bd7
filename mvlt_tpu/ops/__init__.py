from mvlt_tpu.ops.attention import multi_head_attention
from mvlt_tpu.ops.upsample import upsample_bilinear_align_corners


def __getattr__(name):
    # lazy: the Pallas kernels import jax.experimental.pallas
    if name == "fused_attention":
        from mvlt_tpu.ops.pallas_attention import fused_attention

        return fused_attention
    if name == "fused_ln_mlp":
        from mvlt_tpu.ops.fused_mlp import fused_ln_mlp

        return fused_ln_mlp
    if name == "fused_block_attention":
        from mvlt_tpu.ops.block_attention import fused_block_attention

        return fused_block_attention
    raise AttributeError(name)


__all__ = [
    "multi_head_attention", "upsample_bilinear_align_corners",
    "fused_attention", "fused_ln_mlp", "fused_block_attention",
]
