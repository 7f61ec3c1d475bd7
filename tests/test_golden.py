"""Golden-value regression test: fixed seed + fixed input -> fixed logits.

Catches silent numerical regressions in the forward path (layer order, eps
values, initializer changes, fused-path divergence).  Values generated on
jax 0.9.0 CPU fp32; tolerance allows cross-version reduction-order drift.
"""

import jax
import jax.numpy as jnp
import numpy as np

from mvlt_tpu.config import LossType, ModelConfig
from mvlt_tpu.models import create_model


def test_forward_golden_values():
    cfg = ModelConfig(
        img_size=64, embed_dims=(8, 16, 32, 64), num_heads=(1, 2, 2, 4),
        mlp_ratios=(2, 2, 2, 2), token_hidden_size=32, num_text_tokens=16,
        vocab_size=64, max_position_embeddings=32, itg_channel=8,
        compute_dtype="float32", use_pallas_attention=False, drop_path_rate=0.0,
        loss_type=LossType(itm=True, mlm=True, t2i=True, cls=True),
    )
    model = create_model(cfg)
    rng = np.random.default_rng(42)
    imgs = jnp.asarray(rng.random((2, 64, 64, 3)), jnp.float32)
    ids = jnp.asarray(rng.integers(0, 64, (2, 16)), jnp.int32)
    variables = jax.jit(model.init)(jax.random.PRNGKey(1234), imgs, ids)
    out = model.apply(variables, imgs, ids)

    np.testing.assert_allclose(
        np.asarray(out["itm_logits"]).reshape(-1)[:4],
        [-0.13564688, 0.16484986, -0.08265907, 0.02607459],
        rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(out["mlm_logits"])[0, 0, :4],
        [-0.06336661, -0.07997872, -0.17598952, -0.05102407],
        rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(out["sup_cls_logits"])[0, 0, :4],
        [0.02104934, 0.0119331, 0.06715953, -0.08051036],
        rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(out["t2i_logits"])[0, 10, 10],
        [11.450861, 25.108938, 21.512701],
        rtol=1e-3, atol=1e-3)
    np.testing.assert_allclose(
        float(np.asarray(out["t2i_logits"]).mean()), 32.96242, rtol=1e-3)
