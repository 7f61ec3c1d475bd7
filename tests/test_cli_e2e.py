"""End-to-end CLI smoke: 2 epochs of synthetic pre-training through the real
orchestration path (config file -> mesh -> pipeline -> jitted step ->
checkpoint -> resume), all on the 8-device CPU mesh."""

import json
import os

import pytest


@pytest.fixture()
def run_dir(tmp_path):
    return str(tmp_path / "run")


def test_train_checkpoint_resume(run_dir):
    from mvlt_tpu.cli import main

    argv = ["--config", "configs/test_micro.py", "--synthetic-data",
            "--output-dir", run_dir, "--epochs", "2"]
    main(argv)

    log = os.path.join(run_dir, "train_log.jsonl")
    assert os.path.exists(log)
    lines = [json.loads(l) for l in open(log)]
    assert len(lines) == 2
    assert all("total_loss" in l for l in lines)
    assert os.path.isdir(os.path.join(run_dir, "checkpoint", "last"))

    # resume for one more epoch
    main(argv + ["--epochs", "3", "--resume", "last"])
    lines = [json.loads(l) for l in open(log)]
    assert len(lines) == 3
    assert lines[-1]["epoch"] == 2


def test_train_steps_per_dispatch(run_dir):
    """--steps-per-dispatch 2 trains through the stacked loader + scanned
    step: same orchestration path, one dispatch per 2 optimizer steps, with
    per-step metric rows in the log averages."""
    from mvlt_tpu.cli import main

    argv = ["--config", "configs/test_micro.py", "--synthetic-data",
            "--output-dir", run_dir, "--epochs", "1",
            "--steps-per-dispatch", "2"]
    main(argv)

    log = os.path.join(run_dir, "train_log.jsonl")
    lines = [json.loads(l) for l in open(log)]
    assert len(lines) == 1 and "total_loss" in lines[0]
    assert os.path.isdir(os.path.join(run_dir, "checkpoint", "last"))


def test_eval_mode(run_dir):
    from mvlt_tpu.cli import main

    main(["--config", "configs/test_micro.py", "--synthetic-data",
          "--output-dir", run_dir, "--eval"])


def test_eval_with_resumed_checkpoint(run_dir):
    """Train briefly, then run each eval dispatch from the saved orbax
    checkpoint (exercises the template-free restore path)."""
    from mvlt_tpu.cli import main

    argv = ["--config", "configs/test_micro.py", "--synthetic-data",
            "--output-dir", run_dir, "--epochs", "1"]
    main(argv)
    ckpt = os.path.join(run_dir, "checkpoint", "last")
    main(["--config", "configs/test_micro.py", "--synthetic-data",
          "--output-dir", run_dir, "--resume", ckpt, "--eval"])


def test_cli_flag_overrides():
    """CLI knobs map onto the config tree (config-file keys still win over
    argparse defaults, libs/utils.py:257-262 semantics)."""
    from mvlt_tpu.cli import build_run_config, get_args_parser

    args = get_args_parser().parse_args([
        "--config", "configs/test_micro.py", "--model", "pvlt_small",
        "--lr", "1e-3", "--weight-decay", "0.05", "--mask-ratio", "0.75",
        "--num-text-tokens", "24", "--num-workers", "2", "--remat",
        "--mask-strategy", "square", "--clip-grad", "1.0",
    ])
    cfg = build_run_config(args)
    assert cfg.model.name == "pvlt_small"
    assert cfg.optim.lr == 1e-3
    assert cfg.optim.weight_decay == 0.05
    assert cfg.optim.clip_grad == 1.0
    assert cfg.data.mask_ratio == 0.75
    assert cfg.data.mask_strategy == "square"
    assert cfg.model.num_text_tokens == 24
    assert cfg.data.num_text_tokens == 24
    assert cfg.data.num_workers == 2
    assert cfg.model.remat is True
