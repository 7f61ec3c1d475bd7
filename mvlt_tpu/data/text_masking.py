"""BERT-style 80/10/10 text masking.

Reference: ``random_masking_features`` (mcloader/fashion_gen.py:383-409) —
each token is selected with prob ``word_mask_rate`` (0.15); a selected token
becomes [MASK] with p=0.8, a uniformly random vocab token with p=0.1, stays
unchanged with p=0.1; its original id becomes the MLM label; unselected
positions get label -1 (the CE ignore index).

Note the reference draws the random replacement uniformly over the *whole*
vocab including special/unused tokens (random.choice over vocab items); the
same is done here.

Output contract matches text_process (mcloader/fashion_gen.py:321-381):
[CLS] + tokens + [SEP] + [PAD]*, labels padded with -1 at CLS/SEP/PAD.
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

import numpy as np

from mvlt_tpu.data.tokenizer import WordPieceTokenizer

IGNORE = -1


def mask_tokens(token_ids: Sequence[int], vocab_size: int, mask_id: int,
                word_mask_rate: float,
                rng: np.random.Generator) -> Tuple[List[int], List[int]]:
    """80/10/10 masking over a bare (no CLS/SEP) token-id list."""
    out_ids: List[int] = []
    labels: List[int] = []
    for tid in token_ids:
        p = rng.random()
        if p < word_mask_rate:
            q = p / word_mask_rate
            if q < 0.8:
                out_ids.append(mask_id)
            elif q < 0.9:
                out_ids.append(int(rng.integers(0, vocab_size)))
            else:
                out_ids.append(tid)
            labels.append(tid)
        else:
            out_ids.append(tid)
            labels.append(IGNORE)
    return out_ids, labels


def process_caption(caption: str, tokenizer: WordPieceTokenizer, max_len: int,
                    word_mask_rate: float, rng: np.random.Generator) -> dict:
    """Tokenize + truncate + mask + pad one caption.

    Returns int32 arrays: input_ids (masked), ori_input_ids (clean),
    attention_mask, segment_ids (all-zero; cls/sequence/pad segment ids are
    all 0 in the reference, mcloader/fashion_gen.py:322-341), mlm_labels.
    """
    ids = tokenizer.tokenize_to_ids(caption)[: max_len - 2]
    masked_ids, labels = mask_tokens(ids, len(tokenizer), tokenizer.mask_id,
                                     word_mask_rate, rng)

    def wrap(core: List[int], fill: int) -> np.ndarray:
        seq = [tokenizer.cls_id] + core + [tokenizer.sep_id]
        seq += [fill] * (max_len - len(seq))
        return np.asarray(seq, np.int32)

    input_ids = wrap(masked_ids, tokenizer.pad_id)
    ori_input_ids = wrap(ids, tokenizer.pad_id)
    mlm_labels = np.full(max_len, IGNORE, np.int32)
    mlm_labels[1: 1 + len(labels)] = labels
    token_len = len(ids) + 2
    attention_mask = np.zeros(max_len, np.int32)
    attention_mask[:token_len] = 1
    segment_ids = np.zeros(max_len, np.int32)
    return {
        "input_ids": input_ids,
        "ori_input_ids": ori_input_ids,
        "attention_mask": attention_mask,
        "segment_ids": segment_ids,
        "mlm_labels": mlm_labels,
    }
