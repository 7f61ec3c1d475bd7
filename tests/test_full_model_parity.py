"""FULL-MODEL forward parity against the torch reference network.

Instantiates the reference ``libs/pvlt.py`` PyramidVisionLanguageTransformer
on torch-CPU (timm is absent in this environment, so its three touchpoints —
DropPath / to_2tuple / trunc_normal_ + the registry decorator — are vendored
as a ~30-line shim), loads THIS framework's randomly-initialized weights into
it via ``export_state_dict``, and asserts all four heads' logits match to
float32 tolerance.  This catches composition-order / eps / activation /
layout bugs that no per-layer oracle (test_torch_parity.py) can
(VERDICT.md round 1, Missing #3).

Reference surface exercised: libs/pvlt.py:175-401 (backbone + forward),
libs/vl_heads.py:17-165 (all four heads incl. the ITG BN decoder),
pos-embed bilinear resize rule (libs/pvlt.py:291-297).
"""

import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")

REFERENCE_ROOT = "/root/reference"

# micro dims (full 30522 vocab — the reference hardcodes it in MLMHead)
DIMS = dict(embed_dims=[8, 16, 32, 64], num_heads=[1, 2, 2, 4],
            mlp_ratios=[2, 2, 2, 2], depths=[2, 2, 2, 2], sr_ratios=[8, 4, 2, 1])
IMG, PATCH, TH, TNUM, MPE, VOCAB = 64, 4, 32, 16, 64, 30522


def _install_timm_shim():
    """Vendored stand-ins for the only timm symbols libs/pvlt.py imports."""
    if "timm" in sys.modules:
        return
    import torch.nn as nn

    timm = types.ModuleType("timm")
    models = types.ModuleType("timm.models")
    layers = types.ModuleType("timm.models.layers")
    registry = types.ModuleType("timm.models.registry")
    vit = types.ModuleType("timm.models.vision_transformer")

    class DropPath(nn.Module):  # identity in eval mode (all we need here)
        def __init__(self, drop_prob=None):
            super().__init__()
            self.drop_prob = drop_prob or 0.0

        def forward(self, x):
            if self.drop_prob == 0.0 or not self.training:
                return x
            keep = 1.0 - self.drop_prob
            shape = (x.shape[0],) + (1,) * (x.ndim - 1)
            mask = torch.floor(keep + torch.rand(shape, dtype=x.dtype))
            return x / keep * mask

    def to_2tuple(v):
        return v if isinstance(v, tuple) else (v, v)

    def trunc_normal_(t, mean=0.0, std=1.0, a=-2.0, b=2.0):
        with torch.no_grad():
            t.normal_(mean, std).clamp_(a * std, b * std)
        return t

    layers.DropPath, layers.to_2tuple, layers.trunc_normal_ = DropPath, to_2tuple, trunc_normal_
    registry.register_model = lambda fn: fn
    vit._cfg = lambda **kw: dict(kw)
    models.layers, models.registry, models.vision_transformer = layers, registry, vit
    timm.models = models
    fakes = {
        "timm": timm, "timm.models": models, "timm.models.layers": layers,
        "timm.models.registry": registry, "timm.models.vision_transformer": vit,
    }
    # transformers probes importlib.util.find_spec("timm"); a module without
    # a real __spec__ makes that raise, so give each fake one
    import importlib.machinery

    for name, mod in fakes.items():
        mod.__spec__ = importlib.machinery.ModuleSpec(name, loader=None)
    sys.modules.update(fakes)


@pytest.fixture(scope="module")
def models_pair():
    """(torch reference model, flax model, flax variables) with IDENTICAL weights."""
    import jax
    import jax.numpy as jnp

    from mvlt_tpu.config import LossType, ModelConfig
    from mvlt_tpu.convert.torch_to_jax import export_state_dict
    from mvlt_tpu.models import create_model

    # --- flax side -----------------------------------------------------
    cfg = ModelConfig(
        img_size=IMG, patch_size=PATCH,
        embed_dims=tuple(DIMS["embed_dims"]), num_heads=tuple(DIMS["num_heads"]),
        mlp_ratios=tuple(DIMS["mlp_ratios"]), depths=tuple(DIMS["depths"]),
        sr_ratios=tuple(DIMS["sr_ratios"]),
        token_hidden_size=TH, num_text_tokens=TNUM, vocab_size=VOCAB,
        max_position_embeddings=MPE, itg_channel=64,  # reference hardcodes 64
        compute_dtype="float32", use_pallas_attention=False,
        loss_type=LossType(itm=True, mlm=True, t2i=True, cls=True),
    )
    model = create_model(cfg)
    imgs0 = jnp.zeros((1, IMG, IMG, 3), jnp.float32)
    ids0 = jnp.zeros((1, TNUM), jnp.int32)
    variables = jax.jit(model.init)(jax.random.PRNGKey(3), imgs0, ids0)

    # perturb every leaf so zero-init biases/pos-embeds/BN stats all carry
    # signal through the export (a zero tensor can't catch a mapping bug)
    gen = np.random.default_rng(11)

    def perturb(x):
        x = np.asarray(x)
        return (x + 0.03 * gen.standard_normal(x.shape)).astype(x.dtype)

    import jax.tree_util as jtu

    params = jtu.tree_map(perturb, variables["params"])
    batch_stats = jtu.tree_map(
        lambda x: np.abs(perturb(x)) + 0.05, variables.get("batch_stats", {}))
    variables = {"params": params, "batch_stats": batch_stats}

    # --- torch side ------------------------------------------------------
    _install_timm_shim()
    if REFERENCE_ROOT not in sys.path:
        sys.path.insert(0, REFERENCE_ROOT)
    from transformers.models.bert.modeling_bert import BertConfig

    orig_from_pretrained = BertConfig.from_pretrained
    BertConfig.from_pretrained = classmethod(
        lambda cls, *a, **k: BertConfig(
            hidden_size=TH, vocab_size=VOCAB, max_position_embeddings=MPE))
    try:
        from libs.pvlt import PyramidVisionLanguageTransformer

        from functools import partial

        ref = PyramidVisionLanguageTransformer(
            img_size=IMG, patch_size=PATCH, qkv_bias=True,
            norm_layer=partial(torch.nn.LayerNorm, eps=1e-6),
            token_hidden_size=TH, num_text_tokens=TNUM,
            loss_type={"itm": 1, "mlm": 1, "t2i": 1, "cls": 1}, **DIMS)
    finally:
        BertConfig.from_pretrained = orig_from_pretrained
    ref.eval()

    sd = export_state_dict(params, batch_stats)
    unmapped = [k for k in sd if k.endswith(":UNMAPPED")]
    assert not unmapped, f"export left unmapped flax paths: {unmapped[:10]}"
    torch_sd = {k: torch.from_numpy(np.ascontiguousarray(v)) for k, v in sd.items()}
    missing, unexpected = ref.load_state_dict(torch_sd, strict=False)
    assert not unexpected, f"exported keys unknown to the reference: {unexpected[:10]}"
    allowed_missing = {"mlm_head.mlm_decoder.weight"}  # tied to word embeddings
    bad_missing = [k for k in missing
                   if k not in allowed_missing
                   and "num_batches_tracked" not in k
                   and "position_ids" not in k]
    assert not bad_missing, f"reference params NOT covered by export: {bad_missing[:10]}"

    return ref, model, variables


def _forward_pair(models_pair, input_size, seed):
    import jax

    ref, model, variables = models_pair
    gen = np.random.default_rng(seed)
    images = gen.uniform(0, 1, size=(2, input_size, input_size, 3)).astype(np.float32)
    ids = gen.integers(0, VOCAB, size=(2, TNUM)).astype(np.int64)

    with torch.no_grad():
        want = ref(torch.from_numpy(images.transpose(0, 3, 1, 2)),
                   torch.from_numpy(ids))
    got = jax.jit(lambda v, im, i: model.apply(v, im, i, train=False))(
        variables, images, ids.astype(np.int32))
    return want, got


HEADS = ["mlm_logits", "itm_logits", "sup_cls_logits", "sub_cls_logits", "t2i_logits"]


def test_pth_checkpoint_ingestion_end_to_end(models_pair, tmp_path):
    """The published-checkpoint flow the README promises, exercised for real:
    ``torch.save({'model': state_dict, 'epoch': 0})`` (the nesting the
    reference writes, main_vl.py:327-346 / 446-455) -> ``torch.load`` +
    conversion (_load_torch_state_dict, the one previously-untested branch)
    -> bit-exact parameter recovery on a differently-seeded template, zero
    unmapped keys."""
    import jax
    import jax.numpy as jnp

    from mvlt_tpu.convert.torch_to_jax import (_load_torch_state_dict,
                                               convert_state_dict)

    ref, model, variables = models_pair
    pth = tmp_path / "checkpoint_retrieval.pth"
    torch.save({"model": ref.state_dict(), "epoch": 0, "args": None}, str(pth))

    sd = _load_torch_state_dict(str(pth))
    assert "epoch" not in sd  # the 'model' nesting was unwrapped

    imgs0 = jnp.zeros((1, IMG, IMG, 3), jnp.float32)
    ids0 = jnp.zeros((1, TNUM), jnp.int32)
    fresh = jax.jit(model.init)(jax.random.PRNGKey(99), imgs0, ids0)
    params, batch_stats, report = convert_state_dict(
        sd, fresh["params"], fresh.get("batch_stats", {}), verbose=False)
    assert not report["unmapped"], report["unmapped"][:10]
    assert not report["skipped_shape"], report["skipped_shape"][:10]

    # the .pth round-trip must reproduce the source weights bit-exactly
    want = dict(jax.tree_util.tree_leaves_with_path(variables["params"]))
    for path, leaf in jax.tree_util.tree_leaves_with_path(params):
        np.testing.assert_array_equal(np.asarray(leaf), np.asarray(want[path]),
                                      err_msg=str(path))
    want_bs = dict(jax.tree_util.tree_leaves_with_path(variables["batch_stats"]))
    for path, leaf in jax.tree_util.tree_leaves_with_path(batch_stats):
        np.testing.assert_array_equal(np.asarray(leaf), np.asarray(want_bs[path]),
                                      err_msg=str(path))


@pytest.mark.parametrize("input_size", [IMG, 96])
def test_full_forward_all_heads(models_pair, input_size):
    """End-to-end logits parity; input_size=96 additionally exercises the
    pos-embed bilinear interpolation rule (libs/pvlt.py:291-297) that the
    224-built / 256-run reference recipe depends on."""
    want, got = _forward_pair(models_pair, input_size, seed=input_size)
    for key in HEADS:
        w = want[key].numpy()
        g = np.asarray(got[key])
        if key == "t2i_logits":
            g = g.transpose(0, 3, 1, 2)  # flax NHWC -> torch NCHW
        assert g.shape == w.shape, f"{key}: {g.shape} vs {w.shape}"
        scale = max(1.0, float(np.abs(w).max()))
        np.testing.assert_allclose(
            g, w, rtol=2e-4, atol=2e-4 * scale,
            err_msg=f"{key} diverged at input {input_size}")
