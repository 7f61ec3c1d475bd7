"""Configuration system.

Replaces the reference's argparse (~60 flags, main_vl.py:28-178) + mmcv
python-dict config files merged via ``update_from_config``
(libs/utils.py:257-262).  Here a single frozen dataclass tree is the source
of truth; experiment presets are plain dicts (see ``configs/``) applied with
:func:`apply_overrides`, preserving the reference semantics that config-file
keys override CLI/defaults.
"""

from __future__ import annotations

import dataclasses
import json
import pathlib
import runpy
from dataclasses import dataclass, field
from typing import Any, Mapping


@dataclass(frozen=True)
class LossType:
    """Which heads/objectives are active.

    Mirrors the reference ``loss_type`` dict flag; the full key family in the
    reference is {itm, mlm, itg, i2t, t2i, cls, rtd, bartNSG, bartMSS}
    (mcloader/fashion_gen.py:809) but the model only ever reads
    mlm/itm/cls/t2i (libs/pvlt.py:242-277); the dead keys are not rebuilt.
    """

    itm: bool = True
    mlm: bool = True
    t2i: bool = True
    cls: bool = False

    @classmethod
    def from_dict(cls, d: Mapping[str, Any]) -> "LossType":
        return cls(**{k: bool(v) for k, v in d.items() if k in {"itm", "mlm", "t2i", "cls"}})

    def to_dict(self) -> dict:
        return {"itm": int(self.itm), "mlm": int(self.mlm), "t2i": int(self.t2i), "cls": int(self.cls)}


@dataclass(frozen=True)
class ModelConfig:
    """PVLT architecture hyperparameters (libs/pvlt.py:175-230, 415-483)."""

    name: str = "pvlt_tiny"
    # Construction-time grid for positional-embedding shapes.  The reference
    # builds PVLT at the PVT default 224 (libs/pvlt.py:179, pvlt_tiny passes
    # no img_size) so pvt_tiny.pth pos-embeds load exactly, then *runs* at
    # input_size 256 via bilinear pos-embed interpolation
    # (libs/pvlt.py:291-297).  Keep 224 for checkpoint parity; the runtime
    # resolution is DataConfig.input_size.
    img_size: int = 224
    patch_size: int = 4
    in_chans: int = 3
    embed_dims: tuple = (64, 128, 320, 512)
    num_heads: tuple = (1, 2, 5, 8)
    mlp_ratios: tuple = (8, 8, 4, 4)
    depths: tuple = (2, 2, 2, 2)
    sr_ratios: tuple = (8, 4, 2, 1)
    qkv_bias: bool = True
    variant: str = "v1"        # 'v1' (reference PVT) | 'v2' (PVT-v2) | 'swin'
    linear_sr: bool = False    # PVT-v2 linear SRA (avg-pool KV, O(N))
    window_size: int = 8       # swin variant: attention window (8 divides
                               # every 256-input stage grid; others pad+mask)
    drop_rate: float = 0.0
    attn_drop_rate: float = 0.0
    drop_path_rate: float = 0.1
    block_ln_eps: float = 1e-6   # norm_layer=partial(nn.LayerNorm, eps=1e-6) (libs/pvlt.py:420)
    other_ln_eps: float = 1e-5   # PatchEmbed/text_embed/SR/adapters use torch default eps
    # VL part
    token_hidden_size: int = 768
    num_text_tokens: int = 128
    vocab_size: int = 30522
    max_position_embeddings: int = 512
    type_vocab_size: int = 2
    bert_ln_eps: float = 1e-12   # HF BertConfig default layer_norm_eps
    bert_dropout: float = 0.1    # HF hidden_dropout_prob
    num_super_classes: int = 48
    num_sub_classes: int = 122
    itg_channel: int = 64
    loss_type: LossType = field(default_factory=LossType)
    # TPU execution policy
    compute_dtype: str = "bfloat16"  # MXU-native; params stay float32
    use_pallas_attention: bool = True
    # block-fusion kernel dispatch on the inference path:
    # 'none'  — modular Pallas kernels (fused attention + fused LN-MLP),
    # 'mega'  — attention-half megakernel (ops/block_attention.py),
    # 'auto'  — 'mega' only for joint sequences >= 4000 tokens,
    # 'full'  — whole-block megakernel on a lane-padded stream
    #           (ops/block_fused.py): one read+write of the residual
    #           stream per block, no pad/slice copies.  Default: fastest
    #           measured on v5e under the scan harness (25.0 vs 25.8
    #           ms/batch @ B=101 vs 'none'; tools/bench_scan_sweep.py).
    #           Inference-only — training always uses the modular kernels.
    block_attn_kernel: str = "full"
    # pack2 serving layout for dim=64 stages (stage 1 of every shipped v1
    # config): ride the whole-block path on a [B, N/2, 128] stream with two
    # tokens per row instead of lane-padding 64->128 — half the stream HBM
    # bytes and half the per-element VPU work (ops/block_packed.py; the
    # packed LN runs its stats as a block-diagonal matmul on the otherwise
    # idle MXU).  Only takes effect on the 'full' inference path with
    # heads==1 and even sr/w/t; everything else falls back unchanged.
    # Default ON by measurement (tools/tpu_pack2_check.py, 2026-08-19 v5e):
    # 11.34 vs 13.25 ms/batch @ B=101 (8903 vs 7625 pairs/s), itm-logit
    # rel-err 7.7e-3 (bf16 tolerance) vs the unpacked 'full' path.
    pack_stage1: bool = True
    # hp2 head-pair striping for hd<=64 MULTI-head stages (stages 2-4 of
    # every shipped v1 config, heads 2/5/8 at head_dim 64): the 'full'
    # whole-block kernel packs TWO heads per 128-lane stripe (head A lanes
    # 0:64, head B 64:128) instead of one zero-padded head per stripe —
    # ceil(H/2) stripes halve the Q/out-projection MXU work and the q/attn
    # VPU element count; both heads' logits come from ONE full-lane matmul
    # against block-interleaved K rows (ops/kernel_math.softmax_av_pair).
    # Stage 3's dim-320 Q/proj operands shrink 640->384 lanes as a bonus.
    # pack2 covers the single-head dim-64 stage; paths other than v1 'full'
    # ignore this knob.  Default ON by measurement (tools/tpu_hp2_check.py,
    # 2026-08-19 v5e): 10.99 vs 11.38 ms/batch @ B=101 (9187 vs 8878
    # pairs/s, +3.5%), itm-logit rel-err 7.8e-3 (bf16 tolerance) vs the
    # per-head-stripe path — with the K/V PRODUCER emitting the paired
    # layout (ops/sr_kv.py head_pair); XLA-side pairing copies instead
    # measured a 10% LOSS (8008), the round-2 K/V-glue lesson again.
    head_pair_attn: bool = True
    # pack2 layout for the fused LN-MLP kernel at dim=64 (stage 1): two
    # tokens per 128-lane row (free reshape) instead of lane-padding
    # 64->128 — removes the pad/slice copies of x/dy/dx and halves the
    # kernel stream bytes in BOTH the forward and the custom-VJP backward
    # (weights block-diagonalized, grads fold after the grid).  Applies
    # wherever fused_ln_mlp runs (training is where it matters; the 'full'
    # serving path has its own packed block kernel).  Default ON by
    # measurement (tools/probes/bench_pack_mlp_train.py, 2026-08-20 v5e,
    # real train step @ B=150, slope harness): 111.2 vs 114.8 ms/step
    # (1349 vs 1306 pairs/s, +3.2%), warm loss 15.5772 vs 15.5771 (bf16
    # noise) — VERDICT r4 #2b.
    pack_mlp_train: bool = True
    # use the fused LN-MLP kernel (custom VJP) in TRAINING too; DropPath
    # folds into the kernel as a per-sample row scale.  Default on by
    # measurement: 140.3 vs 144.5 ms/step at B=150 on v5e under the
    # forced-fetch methodology (tools/bench_train_fusedmlp.py; the old
    # inference-only gate was decided on pre-2026-08-16 polluted timing).
    # NB: the fused path draws its DropPath mask from Block-scope
    # make_rng('dropout') while the unfused path draws inside the
    # DropPath submodule — toggling this flag changes the stochastic-depth
    # RNG stream, so A/B training runs won't have identical loss curves.
    fused_mlp_train: bool = True
    # use the fused attention half-block (LN1+Q+attn+proj+residual, custom
    # Pallas VJP, ops/block_attention.py) in TRAINING; DropPath folds in as
    # a per-sample row scale.  Same RNG-stream caveat as fused_mlp_train.
    # Default OFF by measurement: 128.6 (on) vs 124.4 (off) ms/step at
    # B=150 on v5e (tools/bench_train_fusedattn.py, forced-fetch slope) —
    # the backward kernel's full forward recompute plus its sequential
    # (batch x tile) accumulation grid loses to XLA autodiff's
    # save-activations schedule at these shapes.  Re-measured 2026-08-20
    # with pack_mlp_train on: off 111.2 / recompute 113.5 / saved-stats
    # 115.6 ms/step — still OFF (see fused_attn_stats for why the stats
    # form is the worst of the three).  The kernel + custom VJP
    # stay available (and tested) for memory-bound regimes where the saved
    # full-stream activations matter more than the recompute.
    fused_attn_train: bool = False
    # save-activations backward for the fused attention half (VERDICT r4
    # #2a; only read when fused_attn_train=True): the forward persists
    # per-row LN mean/inv_std + per-head softmax row_max/inv_denom as a
    # tiny [B, N, S] fp32 side output (~20 MB at stage-1 B=150 vs the
    # ~324 MB/block a saved P would stream) and the backward rebuilds
    # nhat/P with multiplies — no LN/softmax tile reductions, no fp32
    # divide.  Default OFF by measurement (tools/bench_train_fusedattn.py,
    # 2026-08-20 v5e, B=150 slope harness): stats 115.6 vs recompute 113.5
    # vs XLA-off 111.2 ms/step — the stats forward's extra live fp32
    # logits/unnorm force a 2-tile stream split (scoped-VMEM), which costs
    # more than the backward's saved reductions recover.  Both fused-VJP
    # forms lose to XLA autodiff at these shapes; the kernels stay for
    # memory-bound regimes (saved full-stream activations).
    fused_attn_stats: bool = False
    # GELU form inside the Pallas kernels: 'tanh' (default) or 'erf'.
    # Measured on v5e: the A&S erf polynomial's fp32 divide costs ~1 ms per
    # stage-1 block while the tanh form is free (tools/bench_block_vpu.py,
    # scan harness); tanh's max error vs exact erf-GELU (4.7e-4 abs) is
    # below the bf16 quantization noise the compute path already carries.
    # XLA paths (fp32 CPU parity oracle, modular fallback) always use exact
    # erf; 'erf' restores the A&S form in the kernels too.  Scope: this
    # knob covers ONLY GELUs computed inside Pallas kernels — XLA-side
    # MLPs that ride a fused path (e.g. the Swin band path's text-half MLP,
    # models/pvlt.py _swin_fused_block) use exact erf regardless, matching
    # the unfused path bit-for-bit (VERDICT r4 weak #4).
    kernel_gelu: str = "tanh"
    # v2-only: serve the DWConv MLP half through the whole-image fused
    # Pallas kernel (ops/dwconv_mlp.py — LN+fc1+in-VMEM 9-shift depthwise+
    # GELU+fc2, the hidden activation never touches HBM).  Default ON by
    # measurement: pvlt_v2_tiny serving 2163 -> 3803 pairs/s @ B=101 on
    # v5e (tools/bench_variants.py, 2026-08-18); on-device parity green at
    # all 4 stage shapes (tools/tpu_dwconv_check.py).  TPU-gated at the
    # call site — CPU falls back to the XLA path either way.
    dwconv_mlp_kernel: bool = True
    remat: bool = False              # jax.checkpoint each Block (memory <-> FLOPs)
    # training computes the MLM CE in row chunks of this size instead of
    # materializing [B, T, vocab] logits (0 disables; eval always decodes)
    mlm_loss_chunk: int = 2048
    # decode only the labeled rows (gathered to a static capacity of this
    # fraction of B*T, rounded up to a chunk): exact for any masking rate
    # <= ~word_mask_rate at the default, and cuts the dominant vocab-GEMM
    # work (more with lower fracs for short-caption recipes).  1.0 = full
    # decode (reference behavior).  Default 0.16 by measurement (round-4
    # skeleton ablation: 118.7 -> 115.1 ms/step @ B=150 vs 0.25) — capacity
    # 3072 rows at B=150*T=128 is still 3.9 sigma above the worst-case
    # labeled count (15% of ALL positions), and overflow drops rows from
    # the mean rather than mislabeling (losses.mlm_gather_plan).
    mlm_capacity_frac: float = 0.16
    # fused vocab-tiled CE kernel (ops/mlm_ce.py): online-logsumexp decode,
    # the [rows, vocab] logits never touch HBM.  TPU-gated at the call
    # site; CPU keeps the XLA chunked decode.  Default ON by measurement
    # (tools/probes/bench_mlm_ce.py 2026-08-19: 115.4 -> 114.6 ms/step @
    # B=150, parity loss-diff 1.9e-6, grads <=3.7e-3 rel at real shapes;
    # also removes the [chunk, 30522] fp32 logits HBM spike).
    mlm_ce_kernel: bool = True

    @property
    def num_stages(self) -> int:
        return len(self.embed_dims)


@dataclass(frozen=True)
class DataConfig:
    """Fashion-Gen dataset + preprocessing (mcloader/fashion_gen.py)."""

    data_path: str = ""
    data_set: str = "FashionGen"
    input_size: int = 256
    num_text_tokens: int = 128
    word_mask_rate: float = 0.15
    mask_ratio: float = 0.50
    mask_strategy: str = "random_grid"
    mask_patch_size: int = 16
    vocab_file: str = "preweights/bert-base-uncased-vocab.txt"
    repeated_aug: int = 3          # RASampler x3 repeat (samplers.py:8-59)
    # use the C++ crop/resize kernel for training images; eval keeps the
    # exact-PIL path for bit-parity with the reference.  Default ON by
    # measurement (tools/probes/bench_pipeline.py 2026-08-19: 73 -> 103
    # items/s end-to-end on the 1-core host, +41%).
    use_native_image_ops: bool = True
    num_workers: int = 4
    prefetch_depth: int = 2
    synthetic: bool = False        # synthetic data for benchmarking/tests


@dataclass(frozen=True)
class OptimConfig:
    """AdamW + cosine schedule (main_vl.py:306-311)."""

    opt: str = "adamw"
    lr: float = 2.5e-4
    min_lr: float = 1e-5
    warmup_lr: float = 1e-6
    warmup_epochs: int = 5
    weight_decay: float = 0.01
    clip_grad: float | None = None
    epochs: int = 150
    batch_size: int = 150          # per-device, like per-GPU in reference
    lr_batch_denom: int = 512      # linear scaling lr*global_batch/512 (main_vl.py:306)
    eps: float = 1e-8
    betas: tuple = (0.9, 0.999)


@dataclass(frozen=True)
class RunConfig:
    """Top-level experiment config."""

    model: ModelConfig = field(default_factory=ModelConfig)
    data: DataConfig = field(default_factory=DataConfig)
    optim: OptimConfig = field(default_factory=OptimConfig)
    output_dir: str = ""
    seed: int = 0
    resume: str = ""
    finetune: str = ""
    eval_mode: str = ""            # '', 'vl', 'retrieval-itr', 'retrieval-tir', 'recognition'
    save_every_frac: float = 2.0 / 3.0  # checkpoint policy switch point (main_vl.py:444)
    log_every: int = 10
    # parallelism
    dp_size: int = -1              # -1: all devices on the data axis
    tp_size: int = 1


def _replace(dc, updates: Mapping[str, Any]):
    """dataclasses.replace that tolerates nested dict updates."""
    kwargs = {}
    for k, v in updates.items():
        if not hasattr(dc, k):
            raise KeyError(f"unknown config key {k!r} for {type(dc).__name__}")
        cur = getattr(dc, k)
        if isinstance(cur, LossType) and isinstance(v, Mapping):
            # must precede the generic dataclass branch (LossType is one):
            # merge with current values and coerce ints to bools
            kwargs[k] = LossType.from_dict({**cur.to_dict(), **v})
        elif dataclasses.is_dataclass(cur) and isinstance(v, Mapping):
            kwargs[k] = _replace(cur, v)
        elif isinstance(cur, tuple) and isinstance(v, (list, tuple)):
            kwargs[k] = tuple(v)
        else:
            kwargs[k] = v
    return dataclasses.replace(dc, **kwargs)


# Flat key -> nested path mapping for reference-style config files
# (scripts_dws/configs/dws_mvlt_exp21.py uses a flat cfg dict).
_FLAT_KEYS = {
    "model": ("model", "name"),
    "input_size": ("data", "input_size"),
    "loss_type": ("model", "loss_type"),
    "batch_size": ("optim", "batch_size"),
    "epochs": ("optim", "epochs"),
    "lr": ("optim", "lr"),
    "weight_decay": ("optim", "weight_decay"),
    "clip_grad": ("optim", "clip_grad"),
    "drop_path": ("model", "drop_path_rate"),
    "mask_ratio": ("data", "mask_ratio"),
    "mask_strategy": ("data", "mask_strategy"),
    "mask_patch_size": ("data", "mask_patch_size"),
    "word_mask_rate": ("data", "word_mask_rate"),
    "output_dir": ("output_dir",),
    "data_set": ("data", "data_set"),
    "data_path": ("data", "data_path"),
    "seed": ("seed",),
    "resume": ("resume",),
    "finetune": ("finetune",),
    "pretrain_pth": ("finetune",),
    "num_text_tokens": ("model", "num_text_tokens"),
    "token_hidden_size": ("model", "token_hidden_size"),
    "num_workers": ("data", "num_workers"),
    "model_overrides": ("model",),   # nested ModelConfig dict
    "data_overrides": ("data",),
    "optim_overrides": ("optim",),
    # ignored vestigial reference keys
    "mixup": None,
    "cutmix": None,
}


def apply_overrides(cfg: RunConfig, flat: Mapping[str, Any]) -> RunConfig:
    """Apply a flat, reference-style config dict onto a RunConfig.

    Implements the mmcv-config-overrides-args semantics of
    libs/utils.py:257-262: every key in the file wins over the default.
    """
    nested: dict = {}
    for k, v in flat.items():
        path = _FLAT_KEYS.get(k, (k,))
        if path is None:
            continue
        node = nested
        for p in path[:-1]:
            node = node.setdefault(p, {})
        if isinstance(v, Mapping) and isinstance(node.get(path[-1]), dict) \
                and path[-1] not in ("loss_type",):
            node[path[-1]].update(v)   # merge model_overrides with e.g. model name
        else:
            node[path[-1]] = v
    out = _replace(cfg, nested)
    # keep dependent fields in sync (img_size is intentionally NOT synced to
    # input_size — see ModelConfig.img_size)
    if out.model.num_text_tokens != out.data.num_text_tokens:
        out = _replace(out, {"data": {"num_text_tokens": out.model.num_text_tokens}})
    return out


def load_config_file(path: str | pathlib.Path, base: RunConfig | None = None) -> RunConfig:
    """Load an experiment preset.

    Supports two formats:
      * ``.py`` files defining ``cfg = dict(...)`` — the reference's format
        (scripts_dws/configs/dws_mvlt_exp21.py);
      * ``.json`` files with the same flat keys.
    """
    base = base or RunConfig()
    path = pathlib.Path(path)
    if path.suffix == ".py":
        ns = runpy.run_path(str(path))
        flat = ns["cfg"]
    elif path.suffix == ".json":
        flat = json.loads(path.read_text())
    else:
        raise ValueError(f"unsupported config format: {path.suffix}")
    return apply_overrides(base, flat)


def config_to_dict(cfg) -> dict:
    """Serialize a config tree for run-dir provenance (the reference copies
    the config file into the run dir, scripts_dws/dws_mvlt_exp21.sh:9)."""
    if isinstance(cfg, LossType):
        return cfg.to_dict()
    if dataclasses.is_dataclass(cfg):
        return {f.name: config_to_dict(getattr(cfg, f.name)) for f in dataclasses.fields(cfg)}
    if isinstance(cfg, tuple):
        return list(cfg)
    return cfg
