"""Swin joint-attention variant (BASELINE.json stretch row; registry
pattern of libs/pvlt.py:415-483).

Correctness pins:
  * the windowed visual attention + global text KV equals a naive dense
    attention in which each visual query may attend exactly {its own
    window's visual tokens} + {all text tokens} (with the rel-pos bias on
    the visual-visual logits);
  * shifted blocks mask wrapped regions (token moved across the image
    boundary by the cyclic roll must not attend tokens from the far side);
  * non-divisible grids pad+mask without NaNs;
  * full model trains end-to-end through the registry.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp


def _naive_joint_attention(variables, x, h, w, t_num, ws, shift, nh):
    """Dense oracle: same q/kv/proj params, brute-force masks."""
    from mvlt_tpu.models.swin import relative_position_index, window_masks

    p = variables["params"]
    b, n, c = x.shape
    hd = c // nh
    scale = hd ** -0.5
    xf = np.asarray(x, np.float32)
    q = xf @ np.asarray(p["q"]["kernel"], np.float32) + np.asarray(p["q"]["bias"], np.float32)
    kv = xf @ np.asarray(p["kv"]["kernel"], np.float32) + np.asarray(p["kv"]["bias"], np.float32)
    k, v = kv[..., :c], kv[..., c:]

    s = ws // 2 if shift else 0
    # window id of every visual token AFTER the cyclic shift
    rows, cols = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
    sr, sc = (rows - s) % h, (cols - s) % w  # position after roll(-s)
    win_id = (sr // ws) * (w // ws) + (sc // ws)
    win_id = win_id.reshape(-1)
    # region ids for the shift mask (same scheme as window_masks)
    def region(pos, size):
        r = np.zeros_like(pos)
        if s:
            r[pos >= size - ws] = 1
            r[pos >= size - s] = 2
        return r
    reg = region(sr, h) * 3 + region(sc, w)
    reg = reg.reshape(-1)

    idx = relative_position_index(ws)
    table = np.asarray(p["rel_pos_bias"], np.float32)
    # relative position of each token inside its window
    in_r, in_c = (sr % ws).reshape(-1), (sc % ws).reshape(-1)
    in_pos = in_r * ws + in_c

    hw = h * w
    out = np.zeros((b, n, c), np.float32)
    for bi in range(b):
        qh = q[bi].reshape(n, nh, hd).transpose(1, 0, 2)
        kh = k[bi].reshape(n, nh, hd).transpose(1, 0, 2)
        vh = v[bi].reshape(n, nh, hd).transpose(1, 0, 2)
        for head in range(nh):
            logits = qh[head] @ kh[head].T * scale      # [n, n]
            mask = np.full((n, n), -1e9, np.float32)
            for qi in range(hw):                        # visual queries
                allow = (win_id == win_id[qi]) & (reg == reg[qi])
                mask[qi, :hw][allow] = 0.0
                mask[qi, hw:] = 0.0                     # text KV always
                logits[qi, :hw][allow] += table[
                    idx[in_pos[qi], in_pos[:hw][allow]], head]
            # text queries handled separately by the module (pooled KV);
            # compare visual rows only
            lg = logits + mask
            pr = np.exp(lg - lg.max(-1, keepdims=True))
            pr /= pr.sum(-1, keepdims=True)
            out[bi, :, head * hd:(head + 1) * hd] = pr @ vh[head]
    return out[:, :hw, :]


@pytest.mark.parametrize("shift", [False, True])
def test_window_attention_matches_dense_oracle(rng, shift):
    from mvlt_tpu.models.swin import SwinJointAttention

    b, h, w, c, t, nh, ws = 2, 8, 8, 16, 5, 2, 4
    x = jnp.asarray(rng.normal(size=(b, h * w + t, c)), jnp.float32)
    mod = SwinJointAttention(c, nh, window_size=ws, shift=shift)
    variables = mod.init(jax.random.PRNGKey(0), x, (h, w), t)
    # non-trivial rel-pos bias
    variables = jax.tree_util.tree_map(
        lambda a: jnp.asarray(rng.normal(size=a.shape) * 0.1, a.dtype), variables)
    got = mod.apply(variables, x, (h, w), t)
    # proj layer applies to the oracle output too
    p = variables["params"]
    want_pre = _naive_joint_attention(variables, x, h, w, t, ws, shift, nh)
    want = want_pre @ np.asarray(p["proj"]["kernel"]) + np.asarray(p["proj"]["bias"])
    np.testing.assert_allclose(np.asarray(got)[:, : h * w, :], want,
                               rtol=2e-4, atol=2e-4)


def test_nondivisible_grid_pads_without_nan(rng):
    from mvlt_tpu.models.swin import SwinJointAttention

    b, h, w, c, t = 1, 6, 10, 8, 3   # 6,10 not divisible by ws=4
    x = jnp.asarray(rng.normal(size=(b, h * w + t, c)), jnp.float32)
    for shift in (False, True):
        mod = SwinJointAttention(c, 2, window_size=4, shift=shift)
        variables = mod.init(jax.random.PRNGKey(1), x, (h, w), t)
        out = mod.apply(variables, x, (h, w), t)
        assert out.shape == x.shape
        assert bool(jnp.isfinite(out).all())


def test_swin_model_shapes_and_registry():
    from mvlt_tpu.config import LossType, ModelConfig
    from mvlt_tpu.models import create_model

    cfg = ModelConfig(
        name="pvlt_swin_tiny", img_size=32, embed_dims=(8, 16, 32, 64),
        num_heads=(1, 2, 2, 4), mlp_ratios=(2, 2, 2, 2), window_size=4,
        token_hidden_size=32, num_text_tokens=8, vocab_size=128,
        max_position_embeddings=16, itg_channel=8, compute_dtype="float32",
        use_pallas_attention=False,
        loss_type=LossType(itm=True, mlm=True, t2i=True, cls=False))
    model = create_model(cfg)
    imgs = jnp.zeros((2, 32, 32, 3), jnp.float32)
    ids = jnp.zeros((2, 8), jnp.int32)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), imgs, ids)
    out = model.apply(variables, imgs, ids, train=False)
    assert out["mlm_logits"].shape == (2, 8, 128)
    assert out["itm_logits"].shape == (2, 1, 2)
    assert out["t2i_logits"].shape == (2, 32, 32, 3)
    # odd blocks carry the rel-pos bias too (both W-MSA and SW-MSA built)
    assert "rel_pos_bias" in variables["params"]["block1_1"]["attn"]


def test_swin_train_step_runs():
    from mvlt_tpu.config import LossType, ModelConfig, OptimConfig
    from mvlt_tpu.models import create_model
    from mvlt_tpu.train.schedule import make_optimizer
    from mvlt_tpu.train.state import create_train_state
    from mvlt_tpu.train.step import make_train_step

    cfg = ModelConfig(
        name="pvlt_swin_tiny", img_size=32, embed_dims=(8, 16, 32, 64),
        num_heads=(1, 2, 2, 4), mlp_ratios=(2, 2, 2, 2), window_size=4,
        token_hidden_size=32, num_text_tokens=8, vocab_size=128,
        max_position_embeddings=16, itg_channel=8, compute_dtype="float32",
        use_pallas_attention=False, drop_path_rate=0.1,
        loss_type=LossType(itm=True, mlm=True, t2i=True, cls=False))
    model = create_model(cfg)
    rng = np.random.default_rng(0)
    b = 4
    imgs = jnp.asarray(rng.random((b, 32, 32, 3)), jnp.float32)
    ids = jnp.asarray(rng.integers(0, 128, (b, 8)), jnp.int32)
    batch = dict(images=imgs, masked_images=imgs, input_ids=ids,
                 mlm_labels=jnp.asarray(rng.integers(-1, 128, (b, 8)), jnp.int32),
                 itm_labels=jnp.asarray(rng.integers(0, 2, (b,)), jnp.int32))
    tx = make_optimizer(OptimConfig(epochs=2, batch_size=b), b, 10)
    state = create_train_state(model, tx, jax.random.PRNGKey(0), imgs, ids)
    step = make_train_step(model, cfg, donate=False)
    new_state, losses = step(state, batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(losses["total_loss"]))
    assert int(new_state.step) == 1


@pytest.mark.parametrize("nw,pair_env", [(4, "1"), (4, "0"), (3, "1")])
def test_fused_swin_attention_matches_xla(rng, monkeypatch, nw, pair_env):
    """ops/swin_attention kernel (interpret mode) vs the module's XLA
    two-block einsum formulation, including rel-pos bias + region mask
    folded into the additive table.  Covers the window-pair grouped form
    (even nW, default), the forced single-window form (MVLT_SWIN_PAIR=0)
    and the odd-nW fallback."""
    from unittest import mock

    import jax.experimental.pallas as pl

    from mvlt_tpu.ops.swin_attention import fused_swin_attention

    monkeypatch.setenv("MVLT_SWIN_PAIR", pair_env)
    b, nh, ws2, hd, t = 2, 2, 16, 32, 24
    q = jnp.asarray(rng.normal(size=(b, nw, nh, ws2, hd)), jnp.float32)
    kw = jnp.asarray(rng.normal(size=(b, nw, nh, ws2, hd)), jnp.float32)
    vw = jnp.asarray(rng.normal(size=(b, nw, nh, ws2, hd)), jnp.float32)
    kt = jnp.asarray(rng.normal(size=(b, nh, t, hd)), jnp.float32)
    vt = jnp.asarray(rng.normal(size=(b, nh, t, hd)), jnp.float32)
    add = jnp.asarray(rng.normal(size=(nw, nh, ws2, ws2 + t)) * 0.3, jnp.float32)
    # sprinkle -inf region-mask entries on the visual block
    add = add.at[:, :, :, 3].set(-np.inf)
    scale = hd ** -0.5

    logits = jnp.concatenate([
        jnp.einsum("bnhqd,bnhkd->bnhqk", q, kw),
        jnp.einsum("bnhqd,bhtd->bnhqt", q, kt),
    ], axis=-1) * scale + add[None]
    probs = jax.nn.softmax(logits, axis=-1)
    want = (jnp.einsum("bnhqk,bnhkd->bnhqd", probs[..., :ws2], vw)
            + jnp.einsum("bnhqt,bhtd->bnhqd", probs[..., ws2:], vt))

    orig = pl.pallas_call

    def patched(*a, **k):
        k["interpret"] = True
        return orig(*a, **k)

    with mock.patch.object(pl, "pallas_call", patched):
        got = fused_swin_attention(q, kw, vw, kt, vt, add, scale=scale)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=3e-5, atol=3e-5)


def test_swin_fused_routing_matches_unfused(monkeypatch):
    """Model-level: the fused windowed-attention serving gate forced open
    (backend mock + interpret mode) matches the unfused forward through
    the real param tree (same guard as tests/test_v2_fused_routing.py).
    MVLT_SWIN_FULL=0 pins the MODULAR fused path — the default band-kernel
    routing has its own model-level test (tests/test_swin_band.py)."""
    monkeypatch.setenv("MVLT_SWIN_FULL", "0")
    from unittest import mock

    import jax

    from mvlt_tpu.config import LossType, ModelConfig
    from mvlt_tpu.models import create_model
    from tests.kernel_utils import run_interpret

    rng = np.random.default_rng(9)

    def build(use_pallas):
        cfg = ModelConfig(
            name="pvlt_swin_tiny", img_size=32, embed_dims=(8, 16, 32, 64),
            num_heads=(1, 2, 2, 4), mlp_ratios=(2, 2, 2, 2), window_size=4,
            token_hidden_size=32, num_text_tokens=8, vocab_size=128,
            max_position_embeddings=16, itg_channel=8, compute_dtype="float32",
            use_pallas_attention=use_pallas, drop_path_rate=0.0,
            kernel_gelu="erf",
            loss_type=LossType(itm=True, mlm=False, t2i=False, cls=False))
        return create_model(cfg)

    imgs = jnp.asarray(rng.random((2, 32, 32, 3)), jnp.float32)
    ids = jnp.asarray(rng.integers(0, 128, (2, 8)), jnp.int32)
    base = build(False)
    variables = jax.jit(base.init)(jax.random.PRNGKey(0), imgs, ids)
    want = np.asarray(base.apply(variables, imgs, ids, train=False)["itm_logits"])

    fused = build(True)
    with mock.patch.object(jax, "default_backend", return_value="tpu"):
        got = run_interpret(
            lambda: fused.apply(variables, imgs, ids, train=False)["itm_logits"])
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-3, atol=2e-3)
