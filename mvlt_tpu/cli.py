"""Command-line entry point.

The capability of the reference's main_vl.py orchestrator: config loading,
model/optimizer construction, resume/finetune restore, 4-way eval dispatch
(--eval / --eval-retrieval-itr / --eval-retrieval-tir / --eval-recognition,
main_vl.py:348-399) and the training epoch loop with two-phase checkpointing
(main_vl.py:422-503).

Usage:
  python -m mvlt_tpu.cli --config configs/pretrain_exp21.py
  python -m mvlt_tpu.cli --config configs/pretrain_exp21.py --eval-retrieval-itr \
      --resume <ckpt-dir-or-tag>
"""

from __future__ import annotations

import argparse
import functools
import json
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from mvlt_tpu.config import DataConfig, RunConfig, apply_overrides, load_config_file
from mvlt_tpu.models import create_model
from mvlt_tpu.parallel import make_mesh, shard_batch, state_shardings
from mvlt_tpu.parallel.mesh import maybe_init_distributed
from mvlt_tpu.train.engine import train_one_epoch
from mvlt_tpu.train.schedule import make_lr_schedule, make_optimizer
from mvlt_tpu.train.state import create_train_state
from mvlt_tpu.train.step import make_train_step
from mvlt_tpu.utils.checkpoint import CheckpointManager


def get_args_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser("MVLT-TPU", add_help=True)
    p.add_argument("--config", default="", help="experiment preset (.py with cfg=dict(...) or .json)")
    p.add_argument("--output-dir", default="")
    p.add_argument("--data-path", default="")
    p.add_argument("--resume", default="")
    p.add_argument("--finetune", default="", help="load model weights only, dropping mismatched heads")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--batch-size", type=int, default=0, help="per-host batch (0: from config)")
    p.add_argument("--epochs", type=int, default=0)
    p.add_argument("--tp-size", type=int, default=1)
    # model / optimizer / data knobs (the reference's main argparse family,
    # main_vl.py:28-178; config-file values still win when both are set
    # there, CLI wins over defaults)
    p.add_argument("--model", default="", help="registry name (pvlt_tiny/.../pvlt_v2_*)")
    p.add_argument("--lr", type=float, default=0.0)
    p.add_argument("--weight-decay", type=float, default=-1.0)
    p.add_argument("--clip-grad", type=float, default=0.0)
    p.add_argument("--drop-path", type=float, default=-1.0)
    p.add_argument("--input-size", type=int, default=0)
    p.add_argument("--num-text-tokens", type=int, default=0)
    p.add_argument("--word-mask-rate", type=float, default=-1.0)
    p.add_argument("--mask-ratio", type=float, default=-1.0)
    p.add_argument("--mask-strategy", default="")
    p.add_argument("--num-workers", type=int, default=0)
    p.add_argument("--no-repeated-aug", action="store_true",
                   help="plain distributed shuffle instead of the x3 "
                        "repeated-augmentation sampler (main_vl.py:221-242)")
    p.add_argument("--remat", action="store_true", help="jax.checkpoint each block")
    p.add_argument("--synthetic-data", action="store_true")
    p.add_argument("--fp32", action="store_true",
                   help="float32 compute (the reference's --fp32/no-AMP switch)")
    p.add_argument("--device-masks", action="store_true",
                   help="generate grid masks on device (halves image H2D traffic)")
    p.add_argument("--steps-per-dispatch", type=int, default=1,
                   help="k>1 scans k optimizer steps inside one jitted "
                        "dispatch (numerically identical; amortizes host "
                        "dispatch overhead on few-core hosts; metrics/NaN "
                        "checks stay per-step, logged k at a time)")
    p.add_argument("--zero1", action="store_true",
                   help="ZeRO-1: partition optimizer moments over the data "
                        "axis (reduce-scatter grads + sharded update + "
                        "param all-gather via GSPMD); cuts optimizer HBM "
                        "by the DP degree, numerics unchanged")
    p.add_argument("--grad-accum", type=int, default=1,
                   help="k>1 splits each batch into k sequential "
                        "microbatches inside the step (averaged grads, "
                        "threaded BN stats): ~k-fold lower activation "
                        "memory at the same effective batch size")
    p.add_argument("--eval", action="store_true", help="pre-train metric eval on valid")
    p.add_argument("--eval-retrieval-itr", action="store_true")
    p.add_argument("--eval-retrieval-tir", action="store_true")
    p.add_argument("--parity-heads", action="store_true",
                   help="retrieval eval pays the full pretrain-config forward "
                        "(mlm decode + t2i head) per scored pair, exactly like "
                        "the reference (engine_grid_masking.py:358); default "
                        "scores with itm-only heads — identical ranks, ~2/3 "
                        "fewer FLOPs per pair")
    p.add_argument("--eval-recognition", action="store_true")
    p.add_argument("--viz", action="store_true", help="dump qualitative samples")
    p.add_argument("--viz-samples", type=int, default=32)
    p.add_argument("--profile-dir", default="", help="jax.profiler trace output dir")
    return p


def build_run_config(args) -> RunConfig:
    cfg = RunConfig()
    if args.config:
        cfg = load_config_file(args.config, cfg)
    overrides = {}
    for flat_key, val in (("output_dir", args.output_dir), ("data_path", args.data_path),
                          ("resume", args.resume), ("finetune", args.finetune)):
        if val:
            overrides[flat_key] = val
    if args.batch_size:
        overrides["batch_size"] = args.batch_size
    if args.epochs:
        overrides["epochs"] = args.epochs
    if args.model:
        overrides["model"] = args.model
    if args.lr > 0:
        overrides["lr"] = args.lr
    if args.weight_decay >= 0:
        overrides["weight_decay"] = args.weight_decay
    if args.clip_grad > 0:
        overrides["clip_grad"] = args.clip_grad
    if args.drop_path >= 0:
        overrides["drop_path"] = args.drop_path
    if args.input_size:
        overrides["input_size"] = args.input_size
    if args.num_text_tokens:
        overrides["num_text_tokens"] = args.num_text_tokens
    if args.word_mask_rate >= 0:
        overrides["word_mask_rate"] = args.word_mask_rate
    if args.mask_ratio >= 0:
        overrides["mask_ratio"] = args.mask_ratio
    if args.mask_strategy:
        overrides["mask_strategy"] = args.mask_strategy
    if args.num_workers:
        overrides["num_workers"] = args.num_workers
    overrides["seed"] = args.seed
    cfg = apply_overrides(cfg, overrides)
    if args.synthetic_data:
        cfg = apply_overrides(cfg, {"data": {"synthetic": True}})
    if args.no_repeated_aug:
        cfg = apply_overrides(cfg, {"data": {"repeated_aug": 1}})
    if args.fp32:
        cfg = apply_overrides(cfg, {"model_overrides": {"compute_dtype": "float32"}})
    if args.remat:
        cfg = apply_overrides(cfg, {"model_overrides": {"remat": True}})
    if args.tp_size != 1:
        cfg = apply_overrides(cfg, {"tp_size": args.tp_size})
    return cfg


def main(argv=None) -> "dict | None":
    """CLI entry point.  Returns the results dict for the eval modes
    (retrieval/recognition/vl-eval) so programmatic callers — the parity
    harness, mvlt_tpu/eval/parity.py — can consume the metrics; train
    invocations return None."""
    from mvlt_tpu.utils.backend import backend_or_die

    args = get_args_parser().parse_args(argv)
    cfg = build_run_config(args)
    maybe_init_distributed()
    backend_or_die()  # a dead device transport hangs forever otherwise
    is_main = jax.process_index() == 0

    mesh = make_mesh(dp_size=cfg.dp_size, tp_size=cfg.tp_size)
    if is_main:
        print(f"mesh: {dict(mesh.shape)}  devices: {len(jax.devices())}  "
              f"backend: {jax.default_backend()}", flush=True)

    model = create_model(cfg.model)
    rng = jax.random.PRNGKey(cfg.seed + jax.process_index())  # seed+rank (main_vl.py:207)

    # --- eval dispatch ------------------------------------------------------
    if args.eval_retrieval_itr or args.eval_retrieval_tir:
        from mvlt_tpu.data.fashion_gen import FashionGenRetrieval
        from mvlt_tpu.eval.retrieval import evaluate_retrieval, make_itm_scorer

        direction = "itr" if args.eval_retrieval_itr else "tir"
        if not args.parity_heads and (cfg.model.loss_type.mlm or cfg.model.loss_type.t2i
                                      or cfg.model.loss_type.cls):
            # TPU-first serving: score with itm-only heads.  The reference
            # evaluates retrieval under the full pretrain config, paying the
            # 30522-wide MLM decode and the T2I decoder per scored pair and
            # discarding those logits (engine_grid_masking.py:358); ITM ranks
            # are identical without them.  --parity-heads restores the
            # reference behavior.  Checkpoint tensors for the dropped heads
            # are intersected away on load (merge_params_by_path /
            # convert_state_dict 'unmapped').
            cfg = apply_overrides(
                cfg, {"loss_type": {"itm": 1, "mlm": 0, "t2i": 0, "cls": 0}})
            model = create_model(cfg.model)
        variables = _load_eval_variables(model, cfg, rng, mesh)
        dataset = FashionGenRetrieval(cfg.data.data_path, cfg.data, direction)
        scorer = make_itm_scorer(model, variables)
        # one bundle per data-axis shard per step: every chip scores pairs
        results = evaluate_retrieval(
            scorer, _simple_loader(dataset, batch=mesh.shape["data"]),
            mesh=mesh, is_main=is_main)
        if is_main:
            print(f"retrieval {direction.upper()}: "
                  + " ".join(f"acc@{k}: {results[f'acc@{k}']}" for k in (1, 5, 10)), flush=True)
        return results

    if args.eval_recognition:
        from mvlt_tpu.data.fashion_gen import FashionGenRecognition
        from mvlt_tpu.eval.recognition import evaluate_recognition, make_cls_scorer

        if not cfg.model.loss_type.cls:
            # recognition needs the CLS heads regardless of the config's
            # pre-training loss_type (the reference runs this with the
            # fine-tune config, downstream_recognition.sh)
            cfg = apply_overrides(cfg, {"loss_type": {"cls": 1}})
            model = create_model(cfg.model)
        variables = _load_eval_variables(model, cfg, rng, mesh)
        dataset = FashionGenRecognition(cfg.data.data_path, cfg.data)
        scorer = make_cls_scorer(model, variables)
        # reference protocol batches recognition at 500 (main_vl.py:374-385)
        rec_batch = 500 if jax.default_backend() != "cpu" else 64
        return evaluate_recognition(
            scorer, _simple_loader(dataset, batch=rec_batch),
            num_super=cfg.model.num_super_classes, num_sub=cfg.model.num_sub_classes,
            artifact_dir=os.path.join(cfg.output_dir or ".", "visualization"),
            mesh=mesh, is_main=is_main)

    # --- training -----------------------------------------------------------
    from mvlt_tpu.data.fashion_gen import build_dataset
    from mvlt_tpu.data.pipeline import DataLoader
    from mvlt_tpu.data.samplers import (DistributedSampler,
                                        RepeatedAugmentSampler,
                                        SequentialSampler)
    from mvlt_tpu.eval.vl_eval import evaluate_vl, make_vl_eval_fn

    train_ds = build_dataset("train", cfg.data, itm_enabled=cfg.model.loss_type.itm,
                             seed=cfg.seed)
    # sampler choice mirrors the reference's --repeated-aug switch
    # (main_vl.py:221-242): RA x3 by default, plain shuffle otherwise
    if cfg.data.repeated_aug > 1:
        sampler = RepeatedAugmentSampler(len(train_ds), jax.process_index(),
                                         jax.process_count(), cfg.data.repeated_aug,
                                         cfg.seed)
    else:
        sampler = DistributedSampler(len(train_ds), jax.process_index(),
                                     jax.process_count(), seed=cfg.seed)
    global_batch = cfg.optim.batch_size * mesh.shape["data"]
    # each host loads its slice of the global batch; shard_batch assembles
    # the global array (make_array_from_process_local_data on multi-host)
    host_batch = global_batch // jax.process_count()
    steps_per_epoch = max(1, len(sampler) // host_batch)

    tx = make_optimizer(cfg.optim, global_batch, steps_per_epoch)
    lr_schedule = make_lr_schedule(cfg.optim, global_batch, steps_per_epoch)

    sample = jnp.zeros((2, cfg.data.input_size, cfg.data.input_size, 3), jnp.float32)
    sample_ids = jnp.zeros((2, cfg.model.num_text_tokens), jnp.int32)
    state = create_train_state(model, tx, rng, sample, sample_ids)
    state = jax.device_put(state, state_shardings(mesh, state, zero1=args.zero1))

    ckpt = CheckpointManager(cfg.output_dir or "./runs/default", cfg)
    start_epoch = 0
    if cfg.resume:
        # cfg.resume is honored as a path (another run dir / checkpoint dir)
        # or a tag in this run's checkpoint dir; missing targets raise.
        state, start_epoch = ckpt.restore(state, cfg.resume)
        if is_main:
            print(f"resumed at epoch {start_epoch} (step {int(state.step)})", flush=True)
    elif cfg.finetune:
        from mvlt_tpu.convert.torch_to_jax import load_finetune_params

        state = state.replace(params=load_finetune_params(cfg.finetune, state.params))
        state = jax.device_put(state, state_shardings(mesh, state, zero1=args.zero1))
        if is_main:
            print(f"finetune init from {cfg.finetune}", flush=True)

    put = functools.partial(shard_batch, mesh)
    device_masks = args.device_masks and cfg.data.mask_strategy == "random_grid"
    # host-side H2D trimming: t2i_labels is emitted for reference batch-dict
    # parity but never consumed (the loss compares against the full image);
    # with --device-masks the step regenerates masked_images on device, so
    # shipping it would pay the very transfer the flag eliminates.
    drop_keys = ("t2i_labels",)
    if device_masks or not cfg.model.loss_type.t2i:
        # step regenerates masks on device / never reads masked input (CLS
        # fine-tune trains on clean images every step, train/step.py)
        drop_keys += ("masked_images",)
    spd = max(1, args.steps_per_dispatch)
    if spd > 1:
        put = functools.partial(shard_batch, mesh, stacked=True)
    loader = DataLoader(train_ds, sampler, host_batch, put_fn=put,
                        num_workers=cfg.data.num_workers,
                        prefetch_depth=cfg.data.prefetch_depth,
                        drop_keys=drop_keys, stack_steps=spd)
    train_step = make_train_step(
        model, cfg.model,
        device_masks=device_masks,
        mask_ratio=cfg.data.mask_ratio, mask_patch_size=cfg.data.mask_patch_size,
        # reference quirk (main_vl.py:435): fine-tuning from a checkpoint
        # trains with dropout/drop-path OFF (set_training_mode=finetune=='')
        train_mode=not cfg.finetune,
        scan_steps=spd, grad_accum=max(1, args.grad_accum))
    if args.grad_accum > 1 and host_batch % args.grad_accum:
        raise ValueError(f"--grad-accum {args.grad_accum} must divide the "
                         f"per-host batch {host_batch}")
    eval_fn = make_vl_eval_fn(model, cfg.model)

    valid_ds = build_dataset("valid", cfg.data, itm_enabled=cfg.model.loss_type.itm,
                             seed=cfg.seed + 10_000)
    # eval keeps every sample (drop_last=False); the ragged final batch is
    # padded+masked inside evaluate_vl and sharded over the data axis, so
    # eval rides the whole mesh (reference leaves world-1 ranks idle).
    valid_loader = DataLoader(valid_ds, SequentialSampler(len(valid_ds)),
                              host_batch, put_fn=None, drop_last=False)

    if args.eval:
        variables = {"params": state.params}
        if state.batch_stats:
            variables["batch_stats"] = state.batch_stats
        evaluate_vl(eval_fn, variables, valid_loader, mesh=mesh, is_main=is_main)
        return

    if args.viz:
        from mvlt_tpu.eval.visualize import visualize_vl
        from mvlt_tpu.train.step import make_eval_step

        variables = {"params": state.params}
        if state.batch_stats:
            variables["batch_stats"] = state.batch_stats

        def viz_step(variables, images, ids):
            return model.apply(variables, images, ids, train=False)

        n = visualize_vl(jax.jit(viz_step), variables, valid_loader,
                         valid_ds.tokenizer,
                         os.path.join(cfg.output_dir or ".", "visualization"),
                         max_samples=args.viz_samples)
        if is_main:
            print(f"wrote {n} visualization samples", flush=True)
        return

    from mvlt_tpu.utils.profiling import trace

    log_path = os.path.join(cfg.output_dir or ".", "train_log.jsonl")
    os.makedirs(os.path.dirname(log_path) or ".", exist_ok=True)
    for epoch in range(start_epoch, cfg.optim.epochs):
        loader.set_epoch(epoch)
        t0 = time.time()
        # profile only the first trained epoch when requested
        profile_dir = args.profile_dir if epoch == start_epoch else ""
        with trace(profile_dir):
            state, stats = train_one_epoch(train_step, state, loader, rng, epoch,
                                           lr_schedule=lr_schedule, log_every=cfg.log_every,
                                           is_main=is_main, steps_per_dispatch=spd)
        quality = None
        if epoch >= int(cfg.optim.epochs * cfg.save_every_frac):
            variables = {"params": state.params}
            if state.batch_stats:
                variables["batch_stats"] = state.batch_stats
            eval_stats = evaluate_vl(eval_fn, variables, valid_loader, mesh=mesh,
                                     is_main=is_main)
            quality = eval_stats["quality_score"]
            stats.update({f"eval_{k}": v for k, v in eval_stats.items()})
        if is_main:
            # async: returns once state is copied off device; serialization
            # overlaps the next epoch (ckpt.wait() below collects the tail)
            ckpt.save_epoch(state, epoch, cfg.optim.epochs, quality, cfg.save_every_frac)
            with open(log_path, "a") as f:  # rank-0 JSONL (main_vl.py:500-502)
                f.write(json.dumps({"epoch": epoch, "time": time.time() - t0,
                                    **{k: round(float(v), 6) for k, v in stats.items()}}) + "\n")
    if is_main:
        ckpt.wait()


def _load_eval_variables(model, cfg: RunConfig, rng, mesh=None):
    """Build variables for eval: resume checkpoint, converted torch weights,
    or fresh init (useful only for smoke tests).  With ``mesh``, the tree is
    placed with the TP param rules (replicated when tp=1) so sharded eval
    batches compute distributed."""
    sample = jnp.zeros((1, cfg.data.input_size, cfg.data.input_size, 3), jnp.float32)
    sample_ids = jnp.zeros((1, cfg.model.num_text_tokens), jnp.int32)
    variables = jax.jit(model.init)(rng, sample, sample_ids)
    if cfg.resume:
        if cfg.resume.endswith(".pth"):
            from mvlt_tpu.convert.torch_to_jax import convert_checkpoint

            if variables.get("batch_stats"):
                # full checkpoints carry the ITG head's BN running stats
                params, batch_stats = convert_checkpoint(
                    cfg.resume, variables["params"], variables["batch_stats"])
                variables = dict(variables, params=params, batch_stats=batch_stats)
            else:
                params = convert_checkpoint(cfg.resume, variables["params"])
                variables = dict(variables, params=params)
        else:
            import orbax.checkpoint as ocp

            path = os.path.abspath(cfg.resume)
            if os.path.isdir(os.path.join(path)) and not os.path.exists(
                    os.path.join(path, "_METADATA")):
                # allow pointing at an output dir or a ckpt root
                for cand in ("checkpoint/best", "checkpoint/last", "last", "best"):
                    if os.path.exists(os.path.join(path, cand, "_METADATA")):
                        path = os.path.join(path, cand)
                        break
            restored = ocp.StandardCheckpointer().restore(path)  # no template
            # intersect into the model's template: the eval model may carry
            # fewer heads than the checkpoint (itm-only retrieval serving)
            from mvlt_tpu.utils.checkpoint import merge_params_by_path

            params, report = merge_params_by_path(variables["params"],
                                                  restored["params"])
            if not report["loaded"]:
                raise ValueError(f"{path}: no checkpoint tensor matched the model tree")
            variables = dict(variables, params=params)
            if restored.get("batch_stats") and "batch_stats" in variables:
                bs, _ = merge_params_by_path(variables["batch_stats"],
                                             restored["batch_stats"])
                variables["batch_stats"] = bs
    if mesh is not None:
        from mvlt_tpu.parallel.sharding import param_shardings

        variables = jax.device_put(variables, param_shardings(mesh, variables))
    return variables


def _simple_loader(dataset, batch: int = 1):
    """Minimal sequential loader for eval datasets."""
    from mvlt_tpu.data.pipeline import DataLoader
    from mvlt_tpu.data.samplers import SequentialSampler

    return DataLoader(dataset, SequentialSampler(len(dataset)), batch,
                      num_workers=4, drop_last=False)


if __name__ == "__main__":
    main()
