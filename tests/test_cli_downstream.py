"""CLI end-to-end for the downstream eval protocols (retrieval ITR/TIR and
recognition) over a synthesized Fashion-Gen tree, plus converter round-trip
through the CLI resume path."""

import json
import os
import pickle

import numpy as np
import pytest
from PIL import Image


@pytest.fixture(scope="module")
def fake_tree(tmp_path_factory):
    root = tmp_path_factory.mktemp("fg")
    rng = np.random.default_rng(0)
    img_dir = root / "extracted_valid_images"
    txt_dir = root / "full_valid_info_PAI"
    img_dir.mkdir()
    txt_dir.mkdir()
    n = 10
    for i in range(n):
        name = f"prod{i:04d}_img.png"
        arr = np.full((40, 40, 3), 255, np.uint8)
        arr[8:32, 8:32] = rng.integers(0, 200, (24, 24, 3), np.uint8)
        Image.fromarray(arr).save(img_dir / name)
        info = {"product_id": i, "img_name": name,
                "super_cls_id": int(rng.integers(0, 48)),
                "sub_cls_id": int(rng.integers(0, 122)),
                "captions": f"item {i} wool coat with buttons"}
        with open(txt_dir / f"prod{i:04d}_info.pkl", "wb") as f:
            pickle.dump(info, f)
    for direction in ("ITR", "TIR"):
        d = root / f"retrieve_{direction}"
        d.mkdir()
        for q in range(2):
            bundle = {c: {"img_name": f"prod{(q + c) % n:04d}_img.png",
                          "captions": f"item {(q + c) % n} wool coat"}
                      for c in range(4)}
            with open(d / f"q{q:04d}.pkl", "wb") as f:
                pickle.dump(bundle, f)
    return str(root)


ARGS = ["--config", "configs/test_micro.py"]


def test_cli_retrieval_itr(fake_tree, capsys):
    from mvlt_tpu.cli import main

    main(ARGS + ["--data-path", fake_tree, "--eval-retrieval-itr"])
    out = capsys.readouterr().out
    assert "retrieval ITR" in out
    assert "acc@1" in out


def test_cli_retrieval_resume_pth(fake_tree, tmp_path, capsys):
    """README quick-start flow: --resume checkpoint_retrieval.pth drives the
    torch.load+convert branch of _load_eval_variables (main_vl.py:327-346
    semantics).  --parity-heads keeps the full pretrain heads so every
    checkpoint tensor must map (zero unmapped)."""
    torch = pytest.importorskip("torch")
    import jax
    import jax.numpy as jnp

    from mvlt_tpu.cli import build_run_config, get_args_parser
    from mvlt_tpu.convert.torch_to_jax import export_state_dict
    from mvlt_tpu.models import create_model

    args = get_args_parser().parse_args(ARGS)
    cfg = build_run_config(args)
    model = create_model(cfg.model)
    imgs = jnp.zeros((1, cfg.data.input_size, cfg.data.input_size, 3), jnp.float32)
    ids = jnp.zeros((1, cfg.model.num_text_tokens), jnp.int32)
    variables = jax.jit(model.init)(jax.random.PRNGKey(5), imgs, ids)
    sd = export_state_dict(variables["params"], variables.get("batch_stats"))
    torch_sd = {k: torch.from_numpy(np.ascontiguousarray(v)) for k, v in sd.items()}
    pth = tmp_path / "checkpoint_retrieval.pth"
    torch.save({"model": torch_sd, "epoch": 7}, str(pth))

    from mvlt_tpu.cli import main

    main(ARGS + ["--data-path", fake_tree, "--eval-retrieval-itr",
                 "--parity-heads", "--resume", str(pth)])
    out = capsys.readouterr().out
    assert "retrieval ITR" in out and "acc@1" in out
    assert "0 unmapped" in out  # convert_state_dict's verbose report


def test_cli_retrieval_tir(fake_tree, capsys):
    from mvlt_tpu.cli import main

    main(ARGS + ["--data-path", fake_tree, "--eval-retrieval-tir"])
    assert "retrieval TIR" in capsys.readouterr().out


def test_cli_recognition(fake_tree, tmp_path, capsys):
    from mvlt_tpu.cli import main

    main(ARGS + ["--data-path", fake_tree, "--eval-recognition",
                 "--output-dir", str(tmp_path)])
    out = capsys.readouterr().out
    assert "recognition:" in out
    pred_file = tmp_path / "visualization" / "recognition_predictions.json"
    assert pred_file.exists()
    data = json.loads(pred_file.read_text())
    assert len(data["sup_preds"]) == 10


def test_cli_viz(tmp_path, capsys):
    from mvlt_tpu.cli import main

    main(ARGS + ["--synthetic-data", "--output-dir", str(tmp_path),
                 "--viz", "--viz-samples", "2"])
    assert (tmp_path / "visualization" / "sample_0000" / "original.png").exists()


def test_parity_harness_skips_when_blobs_absent(fake_tree, tmp_path, capsys):
    """scripts/verify_parity.sh entry: absent checkpoints -> per-check SKIP
    message and exit 0 (the environment-portable half of VERDICT missing #1)."""
    from mvlt_tpu.eval.parity import main as parity_main

    rc = parity_main(["--data-path", fake_tree,
                      "--retrieval-pth", str(tmp_path / "nope.pth"),
                      "--recognition-pth", str(tmp_path / "nope2.pth")])
    out = capsys.readouterr().out
    assert rc == 0
    assert "SKIP retrieval parity" in out
    assert "SKIP recognition parity" in out
    assert "PARITY SKIPPED" in out


def test_parity_harness_runs_synthetic_pth(fake_tree, tmp_path, capsys):
    """Full parity flow against a synthetic .pth fixture: converter ->
    --eval-retrieval-itr/tir --parity-heads -> --eval-recognition -> numeric
    assertion (with EXPECTED overridden by the fixture's own metrics, since
    random weights can't hit the README numbers).  Also exercises the FAIL
    path against the real README expectations."""
    import json as _json

    torch = pytest.importorskip("torch")
    import jax
    import jax.numpy as jnp

    from mvlt_tpu.cli import build_run_config, get_args_parser
    from mvlt_tpu.cli import main as cli_main
    from mvlt_tpu.config import apply_overrides
    from mvlt_tpu.convert.torch_to_jax import export_state_dict
    from mvlt_tpu.eval.parity import main as parity_main
    from mvlt_tpu.models import create_model

    args = get_args_parser().parse_args(ARGS)
    cfg = build_run_config(args)
    model = create_model(cfg.model)
    imgs = jnp.zeros((1, cfg.data.input_size, cfg.data.input_size, 3), jnp.float32)
    ids = jnp.zeros((1, cfg.model.num_text_tokens), jnp.int32)
    variables = jax.jit(model.init)(jax.random.PRNGKey(3), imgs, ids)
    sd = export_state_dict(variables["params"], variables.get("batch_stats"))
    torch_sd = {k: torch.from_numpy(np.ascontiguousarray(v)) for k, v in sd.items()}
    pth = tmp_path / "ckpt.pth"
    torch.save({"model": torch_sd, "epoch": 0}, str(pth))

    # recognition needs CLS head tensors in the blob: export a cls-enabled
    # model for the recognition pth (the reference ships two distinct blobs)
    cfg_cls = apply_overrides(cfg, {"loss_type": {"cls": 1}})
    model_cls = create_model(cfg_cls.model)
    var_cls = jax.jit(model_cls.init)(jax.random.PRNGKey(3), imgs, ids)
    sd_cls = export_state_dict(var_cls["params"], var_cls.get("batch_stats"))
    pth_cls = tmp_path / "ckpt_cls.pth"
    torch.save({"model": {k: torch.from_numpy(np.ascontiguousarray(v))
                          for k, v in sd_cls.items()}, "epoch": 0}, str(pth_cls))

    # ground-truth metrics for this fixture, from the CLI flows themselves
    expected = {}
    for d in ("itr", "tir"):
        expected[f"retrieval-{d}"] = cli_main(
            ARGS + ["--data-path", fake_tree, f"--eval-retrieval-{d}",
                    "--parity-heads", "--resume", str(pth)])
    rec = cli_main(ARGS + ["--data-path", fake_tree, "--eval-recognition",
                           "--resume", str(pth_cls)])
    expected["recognition"] = {k: rec[k] for k in (
        "sup_accuracy", "sup_macro_f1", "sub_accuracy", "sub_macro_f1")}
    override = tmp_path / "expected.json"
    override.write_text(_json.dumps(expected))
    capsys.readouterr()

    rc = parity_main(["--data-path", fake_tree, "--config", ARGS[1],
                      "--retrieval-pth", str(pth),
                      "--recognition-pth", str(pth_cls),
                      "--expected-override", str(override)])
    out = capsys.readouterr().out
    assert rc == 0 and "PARITY OK (3 protocol run(s) checked)" in out

    # random weights vs the real README numbers must FAIL loudly
    rc = parity_main(["--data-path", fake_tree, "--config", ARGS[1],
                      "--retrieval-pth", str(pth), "--skip-recognition"])
    out = capsys.readouterr().out
    assert rc == 1 and "PARITY FAIL" in out
