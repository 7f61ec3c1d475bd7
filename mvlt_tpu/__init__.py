"""MVLT-TPU: a TPU-native JAX/Pallas vision-language framework.

A from-scratch rebuild of the capabilities of GewelsJI/MVLT ("Masked
Vision-Language Transformer in Fashion", Machine Intelligence Research 2023)
designed for TPU hardware: bf16 MXU compute, XLA-fused graphs, Pallas
attention kernels, and `jax.sharding` data/tensor parallelism over device
meshes.

Top-level surface:
    mvlt_tpu.models    -- PVLT backbone, heads, BERT text embeddings
    mvlt_tpu.ops       -- attention (XLA + Pallas), upsampling, mask ops
    mvlt_tpu.parallel  -- mesh construction and sharding rules
    mvlt_tpu.data      -- WordPiece tokenizer, Fashion-Gen pipeline
    mvlt_tpu.train     -- losses, schedules, jitted train/eval steps
    mvlt_tpu.eval      -- metrics and retrieval/recognition protocols
    mvlt_tpu.utils     -- metric logging, checkpointing, config system
    mvlt_tpu.convert   -- PyTorch checkpoint -> JAX parameter converter
"""

from mvlt_tpu.version import __version__

__all__ = ["__version__"]
