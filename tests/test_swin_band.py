"""Model-level routing test for the Swin whole-block band-kernel serving
path (ops/swin_band.py + the split-stream stage gate in models/pvlt.py).

The gate requires jax.default_backend() == 'tpu', so on the CPU test mesh
the fused wiring (split visual/text stage stream, band mask tables, the
roll/unroll pair for shifted blocks, the pooled-LN text path) never
executes — a wiring bug would only surface on hardware.  Here we force the
gates open (backend mock + pallas interpret mode) and check the WHOLE swin
model forward against the unfused XLA path.

At img_size=64 the stage grids are 16/8/4/2: stages 1-3 satisfy the band
gate and run fused — stage 1 with TWO bands per image (exercising the
two-kind shifted mask: interior band + y-wrap band), stages 2-3 with a
single wrap band — while stage 4 fails the 16-sublane alignment gate and
falls back to the XLA path, exercising the per-stage gate itself.
"""

from unittest import mock

import jax
import jax.numpy as jnp
import numpy as np

from tests.kernel_utils import run_interpret


def _model(block_attn: str, use_pallas: bool):
    from mvlt_tpu.config import LossType, ModelConfig
    from mvlt_tpu.models import create_model

    cfg = ModelConfig(
        name="pvlt_swin_tiny", variant="swin",
        img_size=64, embed_dims=(16, 32, 64, 128), num_heads=(1, 2, 2, 4),
        mlp_ratios=(4, 4, 2, 2), token_hidden_size=32, num_text_tokens=16,
        vocab_size=64, max_position_embeddings=32, itg_channel=8,
        compute_dtype="float32", use_pallas_attention=use_pallas,
        drop_path_rate=0.0, kernel_gelu="erf",
        loss_type=LossType(itm=True, mlm=False, t2i=False, cls=False),
        block_attn_kernel=block_attn,
    )
    return create_model(cfg)


def test_swin_band_full_stage_matches_unfused(monkeypatch):
    monkeypatch.setenv("MVLT_SWIN_FULL", "1")  # pin the default-ON routing
    rng = np.random.default_rng(11)
    imgs = jnp.asarray(rng.random((2, 64, 64, 3)), jnp.float32)
    ids = jnp.asarray(rng.integers(0, 64, (2, 16)), jnp.int32)

    base = _model(block_attn="none", use_pallas=False)
    variables = jax.jit(base.init)(jax.random.PRNGKey(0), imgs, ids)
    want = np.asarray(base.apply(variables, imgs, ids, train=False)["itm_logits"])

    fused = _model(block_attn="full", use_pallas=True)
    with mock.patch.object(jax, "default_backend", return_value="tpu"):
        got = run_interpret(
            lambda: fused.apply(variables, imgs, ids, train=False)["itm_logits"])
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-3, atol=2e-3)


def test_swin_band_knob_disables_fused_path(monkeypatch):
    """MVLT_SWIN_FULL=0 must fall back to the standard (concat) stream even
    with block_attn='full' on a mocked TPU backend — the measurement A/B
    knob; also proves the split-stream gate never fires when disabled."""
    monkeypatch.setenv("MVLT_SWIN_FULL", "0")
    rng = np.random.default_rng(13)
    imgs = jnp.asarray(rng.random((2, 64, 64, 3)), jnp.float32)
    ids = jnp.asarray(rng.integers(0, 64, (2, 16)), jnp.int32)

    base = _model(block_attn="none", use_pallas=False)
    variables = jax.jit(base.init)(jax.random.PRNGKey(0), imgs, ids)
    want = np.asarray(base.apply(variables, imgs, ids, train=False)["itm_logits"])

    fused = _model(block_attn="full", use_pallas=True)
    with mock.patch.object(jax, "default_backend", return_value="tpu"):
        got = run_interpret(
            lambda: fused.apply(variables, imgs, ids, train=False)["itm_logits"])
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-3, atol=2e-3)
