"""Visualization dump smoke test (SURVEY.md §2 item 23)."""

import os

import jax
import jax.numpy as jnp
import numpy as np

from mvlt_tpu.config import DataConfig, LossType, ModelConfig
from mvlt_tpu.data.fashion_gen import SyntheticFashionGen
from mvlt_tpu.data.pipeline import DataLoader
from mvlt_tpu.data.samplers import SequentialSampler
from mvlt_tpu.eval.visualize import visualize_vl
from mvlt_tpu.models import create_model

import os

VOCAB = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                     "preweights", "bert-base-uncased-vocab.txt")


def test_visualize_writes_artifacts(tmp_path):
    cfg = ModelConfig(
        img_size=32, embed_dims=(8, 16, 32, 64), num_heads=(1, 2, 2, 4),
        mlp_ratios=(2, 2, 2, 2), token_hidden_size=32, num_text_tokens=16,
        vocab_size=30522, max_position_embeddings=32, itg_channel=8,
        compute_dtype="float32", use_pallas_attention=False, drop_path_rate=0.0,
        loss_type=LossType(itm=True, mlm=True, t2i=True, cls=False),
    )
    model = create_model(cfg)
    imgs = jnp.zeros((1, 32, 32, 3), jnp.float32)
    ids = jnp.zeros((1, 16), jnp.int32)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), imgs, ids)

    dcfg = DataConfig(input_size=32, num_text_tokens=16, vocab_file=VOCAB, synthetic=True)
    ds = SyntheticFashionGen(dcfg, size=6)
    loader = DataLoader(ds, SequentialSampler(len(ds)), 3, drop_last=False)

    def step(variables, images, ids):
        return model.apply(variables, images, ids, train=False)

    out_dir = str(tmp_path / "viz")
    n = visualize_vl(jax.jit(step), variables, loader, ds.tokenizer, out_dir, max_samples=4)
    assert n == 4
    sample = os.path.join(out_dir, "sample_0000")
    for fname in ("original.png", "masked.png", "reconstruction.png", "predictions.txt"):
        assert os.path.exists(os.path.join(sample, fname)), fname
    text = open(os.path.join(sample, "predictions.txt")).read()
    assert "ITM:" in text
