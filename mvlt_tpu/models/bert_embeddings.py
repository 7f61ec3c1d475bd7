"""BERT text embeddings (word + position + token-type, LayerNorm, dropout).

Functional equivalent of HF ``BertEmbeddings`` as used by the reference
(libs/pvlt.py:232-233 builds it from ``BertConfig.from_pretrained(
"bert-base-uncased")``): vocab 30522, hidden 768, max positions 512, two
token types, LayerNorm eps 1e-12, hidden dropout 0.1.  The reference always
calls it with input_ids only, so position ids are [0..T) and token-type ids
are all zero.

The word-embedding table is also the (transposed) MLM decoder weight — the
reference ties them (libs/vl_heads.py:62).  Here the tying is expressed at
the model level: `PVLT` passes this module's embedding table into `MLMHead`.
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn


class BertEmbeddings(nn.Module):
    vocab_size: int = 30522
    hidden_size: int = 768
    max_position_embeddings: int = 512
    type_vocab_size: int = 2
    ln_eps: float = 1e-12
    dropout_rate: float = 0.1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, input_ids: jnp.ndarray, *, deterministic: bool = True) -> jnp.ndarray:
        """input_ids: [B, T] int32 -> [B, T, hidden] embeddings."""
        t = input_ids.shape[-1]
        word_emb = nn.Embed(
            self.vocab_size, self.hidden_size, dtype=self.dtype,
            embedding_init=nn.initializers.normal(stddev=0.02),
            name="word_embeddings",
        )
        pos_emb = nn.Embed(
            self.max_position_embeddings, self.hidden_size, dtype=self.dtype,
            embedding_init=nn.initializers.normal(stddev=0.02),
            name="position_embeddings",
        )
        type_emb = nn.Embed(
            self.type_vocab_size, self.hidden_size, dtype=self.dtype,
            embedding_init=nn.initializers.normal(stddev=0.02),
            name="token_type_embeddings",
        )
        position_ids = jnp.arange(t, dtype=jnp.int32)[None, :]
        # The reference always passes token_type_ids == 0, so the type
        # embedding is one row broadcast over [B, T].  Looking it up as a
        # [B, T] gather of the same row makes its VJP a fully-colliding
        # 19200-way scatter-add into one row on TPU; looking up [1, 1] and
        # broadcasting is bitwise-identical forward and turns the backward
        # into a plain sum.
        type_row = type_emb(jnp.zeros((1, 1), jnp.int32))
        x = word_emb(input_ids) + pos_emb(position_ids) + type_row
        x = nn.LayerNorm(epsilon=self.ln_eps, dtype=self.dtype, name="LayerNorm")(x)
        x = nn.Dropout(rate=self.dropout_rate)(x, deterministic=deterministic)
        return x
