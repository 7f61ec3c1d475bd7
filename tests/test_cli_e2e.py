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
