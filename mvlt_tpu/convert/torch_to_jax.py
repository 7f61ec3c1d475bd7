"""PyTorch checkpoint -> JAX parameter converter.

Ingests the reference's published checkpoints — ``pvt_tiny.pth`` (ImageNet
PVT backbone init, loaded strict=False at libs/pvlt.py:426-428),
``checkpoint_retrieval.pth`` and ``checkpoint_recognition.pth`` (full models,
possibly nested under a 'model' key with an 'epoch' sidecar,
main_vl.py:327-346) — and emits this framework's flax parameter /
batch_stats trees, so zero-shot ITR/TIR and M-CR/S-CR reproduce the
reference numbers with no PyTorch at runtime (SURVEY.md §2b last row).

Layout transforms:
  * Linear weight  [out, in]        -> kernel [in, out]      (transpose)
  * Conv2d weight  [O, I, kh, kw]   -> kernel [kh, kw, I, O]
  * LayerNorm/BatchNorm weight/bias -> scale/bias
  * BatchNorm running_mean/var      -> batch_stats collection
  * Embedding weight                -> embedding (no transpose)
  * mlm_head.mlm_decoder.weight is TIED to the word-embedding table
    (libs/vl_heads.py:62) — dropped (sanity-checked equal when present).

Load policies:
  * strict=False semantics for backbone-only checkpoints: keys absent from
    the torch side keep their fresh-init values;
  * finetune head filtering (main_vl.py:284-290): shape-mismatched torch
    tensors are skipped with a warning instead of erroring.

torch is imported lazily and used only for deserialization (torch.load,
CPU); no torch ops run.
"""

from __future__ import annotations

import re
from typing import Any, Dict, Tuple

import numpy as np


def _load_torch_state_dict(path: str) -> Dict[str, np.ndarray]:
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(ckpt, dict) and "model" in ckpt and isinstance(ckpt["model"], dict):
        ckpt = ckpt["model"]  # full training checkpoints nest under 'model'
    out = {}
    for k, v in ckpt.items():
        if hasattr(v, "numpy"):
            out[k] = v.detach().cpu().numpy()
    return out


# torch name pattern -> (flax path template, kind)
# kinds: linear (transpose), conv (OIHW->HWIO), raw, scale (LN/BN weight),
#        bias, embed, bn_stat
_MAPPING: Tuple[Tuple[str, str, str], ...] = (
    # patch embeds
    (r"patch_embed(\d)\.proj\.weight", r"patch_embed\1/proj/kernel", "conv"),
    (r"patch_embed(\d)\.proj\.bias", r"patch_embed\1/proj/bias", "raw"),
    (r"patch_embed(\d)\.norm\.weight", r"patch_embed\1/norm/scale", "raw"),
    (r"patch_embed(\d)\.norm\.bias", r"patch_embed\1/norm/bias", "raw"),
    # per-stage text projection (Sequential: 0=Linear, 1=LN)
    (r"text_embed(\d)\.0\.weight", r"text_embed\1_dense/kernel", "linear"),
    (r"text_embed(\d)\.0\.bias", r"text_embed\1_dense/bias", "raw"),
    (r"text_embed(\d)\.1\.weight", r"text_embed\1_ln/scale", "raw"),
    (r"text_embed(\d)\.1\.bias", r"text_embed\1_ln/bias", "raw"),
    # positional embeddings
    (r"pos_embed(\d)", r"pos_embed\1", "raw"),
    (r"text_pos_embed(\d)", r"text_pos_embed\1", "raw"),
    # transformer blocks
    (r"block(\d)\.(\d+)\.norm1\.weight", r"block\1_\2/norm1/scale", "raw"),
    (r"block(\d)\.(\d+)\.norm1\.bias", r"block\1_\2/norm1/bias", "raw"),
    (r"block(\d)\.(\d+)\.norm2\.weight", r"block\1_\2/norm2/scale", "raw"),
    (r"block(\d)\.(\d+)\.norm2\.bias", r"block\1_\2/norm2/bias", "raw"),
    (r"block(\d)\.(\d+)\.attn\.q\.weight", r"block\1_\2/attn/q/kernel", "linear"),
    (r"block(\d)\.(\d+)\.attn\.q\.bias", r"block\1_\2/attn/q/bias", "raw"),
    (r"block(\d)\.(\d+)\.attn\.kv\.weight", r"block\1_\2/attn/kv/kernel", "linear"),
    (r"block(\d)\.(\d+)\.attn\.kv\.bias", r"block\1_\2/attn/kv/bias", "raw"),
    (r"block(\d)\.(\d+)\.attn\.proj\.weight", r"block\1_\2/attn/proj/kernel", "linear"),
    (r"block(\d)\.(\d+)\.attn\.proj\.bias", r"block\1_\2/attn/proj/bias", "raw"),
    (r"block(\d)\.(\d+)\.attn\.sr\.weight", r"block\1_\2/attn/sr/kernel", "conv"),
    (r"block(\d)\.(\d+)\.attn\.sr\.bias", r"block\1_\2/attn/sr/bias", "raw"),
    (r"block(\d)\.(\d+)\.attn\.norm\.weight", r"block\1_\2/attn/norm/scale", "raw"),
    (r"block(\d)\.(\d+)\.attn\.norm\.bias", r"block\1_\2/attn/norm/bias", "raw"),
    (r"block(\d)\.(\d+)\.mlp\.fc1\.weight", r"block\1_\2/mlp/fc1/kernel", "linear"),
    (r"block(\d)\.(\d+)\.mlp\.fc1\.bias", r"block\1_\2/mlp/fc1/bias", "raw"),
    (r"block(\d)\.(\d+)\.mlp\.fc2\.weight", r"block\1_\2/mlp/fc2/kernel", "linear"),
    (r"block(\d)\.(\d+)\.mlp\.fc2\.bias", r"block\1_\2/mlp/fc2/bias", "raw"),
    # PVT-v2 depthwise-conv MLP (official pvt_v2.py naming: Mlp.dwconv is a
    # DWConv module wrapping nn.Conv2d, hence the doubled '.dwconv.').  The
    # generic conv transform handles the depthwise [O,1,kh,kw] layout.
    (r"block(\d)\.(\d+)\.mlp\.dwconv\.dwconv\.weight",
     r"block\1_\2/mlp/dwconv/kernel", "conv"),
    (r"block(\d)\.(\d+)\.mlp\.dwconv\.dwconv\.bias",
     r"block\1_\2/mlp/dwconv/bias", "raw"),
    # Swin variant window attention: relative-position bias table (official
    # Swin naming); q/kv/proj reuse the shared attn rules above.
    (r"block(\d)\.(\d+)\.attn\.relative_position_bias_table",
     r"block\1_\2/attn/rel_pos_bias", "raw"),
    # BERT text embeddings (HF naming)
    (r"text_embeddings\.word_embeddings\.weight",
     r"text_embeddings/word_embeddings/embedding", "raw"),
    (r"text_embeddings\.position_embeddings\.weight",
     r"text_embeddings/position_embeddings/embedding", "raw"),
    (r"text_embeddings\.token_type_embeddings\.weight",
     r"text_embeddings/token_type_embeddings/embedding", "raw"),
    (r"text_embeddings\.LayerNorm\.weight", r"text_embeddings/LayerNorm/scale", "raw"),
    (r"text_embeddings\.LayerNorm\.bias", r"text_embeddings/LayerNorm/bias", "raw"),
    # head adapters (Sequential: 0=Linear, 1=LN)
    (r"(mlm|itm|sup_cls|sub_cls)_head_embed\.0\.weight", r"\1_head_embed_dense/kernel", "linear"),
    (r"(mlm|itm|sup_cls|sub_cls)_head_embed\.0\.bias", r"\1_head_embed_dense/bias", "raw"),
    (r"(mlm|itm|sup_cls|sub_cls)_head_embed\.1\.weight", r"\1_head_embed_ln/scale", "raw"),
    (r"(mlm|itm|sup_cls|sub_cls)_head_embed\.1\.bias", r"\1_head_embed_ln/bias", "raw"),
    # MLM head
    (r"mlm_head\.transform\.dense\.weight", r"mlm_head/transform/dense/kernel", "linear"),
    (r"mlm_head\.transform\.dense\.bias", r"mlm_head/transform/dense/bias", "raw"),
    (r"mlm_head\.transform\.LayerNorm\.weight", r"mlm_head/transform/LayerNorm/scale", "raw"),
    (r"mlm_head\.transform\.LayerNorm\.bias", r"mlm_head/transform/LayerNorm/bias", "raw"),
    (r"mlm_head\.bias", r"mlm_head/bias", "raw"),
    # ITM / CLS heads (Linear + extra zero-init bias param)
    (r"(itm|sup_cls|sub_cls)_head\.linear\.weight", r"\1_head/linear/kernel", "linear"),
    (r"(itm|sup_cls|sub_cls)_head\.linear\.bias", r"\1_head/linear/bias", "raw"),
    (r"(itm|sup_cls|sub_cls)_head\.linear_bias", r"\1_head/linear_bias", "raw"),
    # T2I score layer (Sequential: 0=Conv1x1 with bias, 1=Upsample) — must
    # precede the generic ConvBN rule below.
    (r"t2i_head\.score\.0\.weight", r"t2i_head/score_conv/kernel", "conv"),
    (r"t2i_head\.score\.0\.bias", r"t2i_head/score_conv/bias", "raw"),
    # T2I decoder ConvBN blocks (Sequential: 0=Conv no-bias, 1=BN)
    (r"t2i_head\.(\w+)\.0\.weight", r"t2i_head/\1/conv/kernel", "conv"),
    (r"t2i_head\.(\w+)\.1\.weight", r"t2i_head/\1/bn/scale", "raw"),
    (r"t2i_head\.(\w+)\.1\.bias", r"t2i_head/\1/bn/bias", "raw"),
    (r"t2i_head\.(\w+)\.1\.running_mean", r"t2i_head/\1/bn/mean", "bn_stat"),
    (r"t2i_head\.(\w+)\.1\.running_var", r"t2i_head/\1/bn/var", "bn_stat"),
)

_SKIP_PATTERNS = (
    r"mlm_head\.mlm_decoder\.weight",   # tied to word embeddings
    r"num_batches_tracked",
    r"text_embeddings\.position_ids",   # HF buffer
    r"^cls_token$", r"^norm\.", r"^head\.",  # PVT ImageNet-only leftovers
)


def _transform(kind: str, arr: np.ndarray) -> np.ndarray:
    if kind == "linear":
        return arr.T
    if kind == "conv":
        return arr.transpose(2, 3, 1, 0)
    return arr


def translate_torch_key(key: str):
    """torch key -> (flax path tuple, kind, is_batch_stat) or None."""
    for pat in _SKIP_PATTERNS:
        if re.search(pat, key):
            return None
    for pat, tmpl, kind in _MAPPING:
        m = re.fullmatch(pat, key)
        if m:
            path = m.expand(tmpl)
            return tuple(path.split("/")), kind, kind == "bn_stat"
    return None


def _set_in(tree: dict, path: tuple, value) -> None:
    node = tree
    for p in path[:-1]:
        node = node.setdefault(p, {})
    node[path[-1]] = value


def _get_in(tree, path: tuple):
    node = tree
    for p in path:
        if not isinstance(node, dict) or p not in node:
            return None
        node = node[p]
    return node


def convert_state_dict(state_dict: Dict[str, np.ndarray], params_template,
                       batch_stats_template=None, strict_shapes: bool = True,
                       verbose: bool = True) -> Tuple[Any, Any, Dict[str, list]]:
    """Merge a torch state dict onto fresh flax trees.

    Returns (params, batch_stats, report).  report lists 'loaded',
    'skipped_shape' (finetune head filtering), 'unmapped' torch keys and
    'missing' flax paths left at init values.
    """
    import jax

    params = jax.tree_util.tree_map(np.asarray, params_template)
    batch_stats = jax.tree_util.tree_map(np.asarray, batch_stats_template or {})
    report = {"loaded": [], "skipped_shape": [], "unmapped": [], "missing": []}

    for key, arr in state_dict.items():
        t = translate_torch_key(key)
        if t is None:
            if not any(re.search(p, key) for p in _SKIP_PATTERNS):
                report["unmapped"].append(key)
            continue
        path, kind, is_stat = t
        tree = batch_stats if is_stat else params
        current = _get_in(tree, path)
        if current is None:
            report["unmapped"].append(key)
            continue
        new = _transform(kind, arr).astype(np.asarray(current).dtype)
        if new.shape != np.asarray(current).shape:
            report["skipped_shape"].append(
                f"{key}: torch {new.shape} vs model {np.asarray(current).shape}")
            if strict_shapes:
                raise ValueError(report["skipped_shape"][-1])
            continue
        _set_in(tree, path, new)
        report["loaded"].append(key)

    if verbose:
        print(f"converted: {len(report['loaded'])} tensors loaded, "
              f"{len(report['skipped_shape'])} shape-filtered, "
              f"{len(report['unmapped'])} unmapped", flush=True)
        for k in report["unmapped"][:20]:
            print(f"  unmapped: {k}", flush=True)
    return params, batch_stats, report


def convert_checkpoint(path: str, params_template, batch_stats_template=None,
                       strict_shapes: bool = False):
    """Load + convert a .pth file onto the given templates; returns params
    (and mutates nothing).  Shape mismatches are skipped (finetune
    semantics, main_vl.py:284-290)."""
    sd = _load_torch_state_dict(path)
    params, batch_stats, _ = convert_state_dict(
        sd, params_template, batch_stats_template, strict_shapes=strict_shapes)
    if batch_stats_template is not None:
        return params, batch_stats
    return params


def _flatten(tree, prefix=()) -> Dict[tuple, np.ndarray]:
    out = {}
    if isinstance(tree, dict):
        for k, v in tree.items():
            out.update(_flatten(v, prefix + (k,)))
    else:
        out[prefix] = np.asarray(tree)
    return out


def _untransform(kind: str, arr: np.ndarray) -> np.ndarray:
    if kind == "linear":
        return arr.T
    if kind == "conv":
        return arr.transpose(3, 2, 0, 1)
    return arr


def export_state_dict(params, batch_stats=None, *,
                      strict: bool = True) -> Dict[str, np.ndarray]:
    """Inverse converter: flax trees -> reference-named torch-style state
    dict (numpy values).  Enables exporting trained weights back to the
    reference ecosystem and round-trip-tests the mapping.

    strict (default): raise if any parameter has no reference name — an
    incomplete export must fail loudly, not ship a state dict missing
    tensors.  strict=False keeps the old behavior of emitting the flax path
    suffixed ':UNMAPPED' for inspection."""
    flat = _flatten(params)
    if batch_stats:
        flat.update(_flatten(batch_stats))
    # Build flax-path -> (torch key, kind) by enumerating the mapping over
    # the actual paths present.
    out: Dict[str, np.ndarray] = {}
    for path, arr in flat.items():
        path_str = "/".join(path)
        matched = False
        for pat, tmpl, kind in _MAPPING:
            # invert: the flax template is a regex-expansion; rebuild a
            # regex from it by replacing backrefs with capture groups.
            flax_rx = re.sub(r"\\(\d)", r"(\\w+)", tmpl.replace("/", "/"))
            m = re.fullmatch(flax_rx, path_str)
            if m is None:
                continue
            torch_key = pat
            for g in m.groups():
                torch_key = re.sub(r"\((?:[^()]|\([^()]*\))*\)", g.replace("\\", "\\\\"), torch_key, count=1)
            torch_key = torch_key.replace("\\.", ".")
            out[torch_key] = _untransform(kind, arr)
            matched = True
            break
        if not matched:
            out["/".join(path) + ":UNMAPPED"] = arr
    if strict:
        unmapped = sorted(k[:-len(":UNMAPPED")] for k in out
                          if k.endswith(":UNMAPPED"))
        if unmapped:
            raise ValueError(
                f"export_state_dict: {len(unmapped)} parameters have no "
                f"reference name (extend _MAPPING or pass strict=False to "
                f"inspect): {unmapped[:10]}")
    return out


def main(argv=None) -> None:
    """CLI: convert a reference .pth checkpoint into an Orbax checkpoint.

    Usage: python -m mvlt_tpu.convert.torch_to_jax ckpt.pth out_dir \
               [--model pvlt_tiny] [--cls] [--strict]
    """
    import argparse
    import os

    import jax
    import jax.numpy as jnp

    p = argparse.ArgumentParser("torch->jax converter")
    p.add_argument("pth")
    p.add_argument("out_dir")
    p.add_argument("--model", default="pvlt_tiny")
    p.add_argument("--no-mlm", action="store_true")
    p.add_argument("--no-itm", action="store_true")
    p.add_argument("--no-t2i", action="store_true")
    p.add_argument("--cls", action="store_true")
    p.add_argument("--strict", action="store_true",
                   help="error on shape mismatches instead of skipping")
    args = p.parse_args(argv)

    from mvlt_tpu.config import LossType, ModelConfig
    from mvlt_tpu.models import create_model

    cfg = ModelConfig(name=args.model, loss_type=LossType(
        itm=not args.no_itm, mlm=not args.no_mlm, t2i=not args.no_t2i,
        cls=args.cls))
    model = create_model(cfg)
    imgs = jnp.zeros((1, 256, 256, 3), jnp.float32)
    ids = jnp.zeros((1, cfg.num_text_tokens), jnp.int32)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), imgs, ids)

    sd = _load_torch_state_dict(args.pth)
    params, batch_stats, report = convert_state_dict(
        sd, variables["params"], variables.get("batch_stats", {}),
        strict_shapes=args.strict)

    import orbax.checkpoint as ocp

    path = os.path.abspath(os.path.join(args.out_dir, "checkpoint", "last"))
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, {"step": 0, "params": params,
                      "batch_stats": batch_stats, "opt_state": {}}, force=True)
    ckptr.wait_until_finished()
    print(f"saved converted checkpoint to {path} "
          f"({len(report['loaded'])} tensors)")


def load_finetune_params(path: str, params_template):
    """Finetune init (main_vl.py:272-291): model weights only, intersected
    by path with shape filtering, from a reference .pth or an Orbax
    checkpoint.  Pre-train checkpoints carry different heads (mlm/itm/t2i
    vs cls), a full opt_state and t2i BN batch_stats, so the Orbax restore
    must be template-free; the merge then drops mismatched head tensors
    exactly like the reference's shape filter."""
    if path.endswith(".pth"):
        return convert_checkpoint(path, params_template)
    import orbax.checkpoint as ocp

    from mvlt_tpu.utils.checkpoint import merge_params_by_path, resolve_checkpoint_path

    restored = ocp.StandardCheckpointer().restore(resolve_checkpoint_path(path))
    params = restored.get("params", restored)
    merged, report = merge_params_by_path(params_template, params)
    if not report["loaded"]:
        raise ValueError(
            f"finetune init from {path}: no checkpoint tensor matched the model tree")
    return merged


if __name__ == "__main__":
    main()
