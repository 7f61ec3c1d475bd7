"""Config-system tests: preset loading (.py and .json), override semantics,
provenance serialization."""

import json

from mvlt_tpu.config import (
    LossType, RunConfig, apply_overrides, config_to_dict, load_config_file,
)


def test_load_reference_style_py_config():
    cfg = load_config_file("configs/pretrain_exp21.py")
    assert cfg.model.name == "pvlt_tiny"
    assert cfg.optim.batch_size == 150
    assert cfg.optim.epochs == 150
    assert cfg.optim.lr == 2.5e-4
    assert cfg.optim.weight_decay == 0.01
    assert cfg.model.drop_path_rate == 0.1
    assert cfg.data.mask_ratio == 0.50
    assert cfg.data.mask_strategy == "random_grid"
    assert cfg.model.loss_type == LossType(itm=True, mlm=True, t2i=True, cls=False)
    # construction size stays 224 (checkpoint parity) while input is 256
    assert cfg.model.img_size == 224
    assert cfg.data.input_size == 256


def test_finetune_config_cls_only():
    cfg = load_config_file("configs/finetune_exp48.py")
    assert cfg.model.loss_type == LossType(itm=False, mlm=False, t2i=False, cls=True)
    assert cfg.optim.epochs == 30


def test_json_config(tmp_path):
    p = tmp_path / "exp.json"
    p.write_text(json.dumps({"model": "pvlt_small", "lr": 1e-3,
                             "loss_type": {"itm": 1, "mlm": 0, "t2i": 0, "cls": 0}}))
    cfg = load_config_file(str(p))
    assert cfg.model.name == "pvlt_small"
    assert cfg.optim.lr == 1e-3
    assert cfg.model.loss_type.mlm is False


def test_config_overrides_win_and_merge():
    base = RunConfig()
    cfg = apply_overrides(base, {"lr": 9e-4, "loss_type": {"cls": 1}})
    assert cfg.optim.lr == 9e-4
    # partial loss_type merges with current (itm/mlm/t2i keep defaults)
    assert cfg.model.loss_type.cls is True
    assert cfg.model.loss_type.itm is True


def test_vestigial_keys_ignored():
    cfg = apply_overrides(RunConfig(), {"mixup": 0.8, "cutmix": 1.0})
    assert cfg == RunConfig()


def test_config_to_dict_roundtrippable():
    d = config_to_dict(RunConfig())
    assert d["model"]["name"] == "pvlt_tiny"
    assert d["model"]["loss_type"] == {"itm": 1, "mlm": 1, "t2i": 1, "cls": 0}
    json.dumps(d)  # serializable for run-dir provenance


class TestConfigValidation:
    """Unsupported knobs reject at create_model time, not trace time
    (VERDICT r3 next-round #7)."""

    def _micro(self, **kw):
        from mvlt_tpu.config import ModelConfig

        base = dict(img_size=64, embed_dims=(8, 16, 32, 64),
                    num_heads=(1, 2, 2, 4), mlp_ratios=(2, 2, 2, 2),
                    token_hidden_size=32, num_text_tokens=16, vocab_size=64,
                    max_position_embeddings=32, itg_channel=8,
                    compute_dtype="float32", use_pallas_attention=False)
        base.update(kw)
        return ModelConfig(**base)

    def test_swin_attn_drop_rejected_at_construction(self):
        import pytest

        from mvlt_tpu.models import create_model

        with pytest.raises(NotImplementedError, match="attn_drop_rate"):
            create_model(self._micro(name="pvlt_swin_tiny", variant="swin",
                                     attn_drop_rate=0.1))

    def test_v1_attn_drop_allowed(self):
        # implemented on the XLA path (JointSRAttention) — must construct
        from mvlt_tpu.models import create_model

        create_model(self._micro(attn_drop_rate=0.1))

    def test_bad_knob_values_rejected(self):
        import pytest

        from mvlt_tpu.models import create_model

        with pytest.raises(ValueError, match="block_attn_kernel"):
            create_model(self._micro(block_attn_kernel="warp"))
        with pytest.raises(ValueError, match="kernel_gelu"):
            create_model(self._micro(kernel_gelu="quick"))
        with pytest.raises(ValueError, match="mlm_capacity_frac"):
            create_model(self._micro(mlm_capacity_frac=0.0))
