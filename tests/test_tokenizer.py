"""WordPiece tokenizer parity vs. the HF BertTokenizer over the shipped
vocab (the reference's tokenizer, mcloader/fashion_gen.py:46)."""

import pathlib

import pytest

from mvlt_tpu.data.tokenizer import WordPieceTokenizer

VOCAB = "/root/reference/preweights/bert-base-uncased-vocab.txt"

SAMPLES = [
    "Long sleeve shirt in midnight blue stretch cotton poplin.",
    "WOOL-BLEND twill coat, Double-breasted button closure at front!",
    "Café-style ÉPONGE slippers w/ 100% leather soles (sizes 36–42).",
    "unaffable preconditions, overengineering  \t multi-space",
    "",
    "Zippered pocket & logo plaque: 3M™ reflective trim...",
]


@pytest.fixture(scope="module")
def tok():
    return WordPieceTokenizer(VOCAB)


@pytest.fixture(scope="module")
def hf_tok():
    transformers = pytest.importorskip("transformers")
    return transformers.BertTokenizer(vocab_file=VOCAB, do_lower_case=True)


@pytest.mark.parametrize("text", SAMPLES)
def test_tokenize_matches_hf(tok, hf_tok, text):
    assert tok.tokenize(text) == hf_tok.tokenize(text)


def test_special_ids(tok):
    assert tok.pad_id == 0
    assert tok.cls_id == 101
    assert tok.sep_id == 102
    assert tok.mask_id == 103
    assert tok.unk_id == 100
    assert len(tok) == 30522


def test_encode_shape_contract(tok):
    ids = tok.encode("long sleeve shirt", max_length=128)
    assert len(ids) == 128
    assert ids[0] == tok.cls_id
    assert tok.sep_id in ids
    # padding tail
    sep_pos = ids.index(tok.sep_id)
    assert all(i == tok.pad_id for i in ids[sep_pos + 1:])


def test_truncation(tok):
    long_text = "shirt " * 300
    ids = tok.encode(long_text, max_length=128)
    assert len(ids) == 128
    assert ids[-1] == tok.sep_id  # truncated sequences end with [SEP]


def test_roundtrip(tok):
    toks = tok.tokenize("double-breasted wool coat")
    ids = tok.convert_tokens_to_ids(toks)
    assert tok.convert_ids_to_tokens(ids) == toks
