"""WordPiece tokenizer parity vs. the HF BertTokenizer over the shipped
vocab (the reference's tokenizer, mcloader/fashion_gen.py:46)."""

import pathlib

import pytest

from mvlt_tpu.data.tokenizer import WordPieceTokenizer

import os

VOCAB = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                     "preweights", "bert-base-uncased-vocab.txt")

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


def test_fuzz_against_hf(tok, hf_tok):
    """Randomized parity fuzz: ASCII + Latin-1 + punctuation soup."""
    import random

    random.seed(0)
    alphabet = (
        "abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ0123456789"
        "  .,-!?/()[]{}#&%$@*+=:;'\"_~^|\\<>"
        "éèêëàâäôöûüçñÉÈÀÇ"
    )
    for _ in range(200):
        n = random.randint(0, 60)
        text = "".join(random.choice(alphabet) for _ in range(n))
        assert tok.tokenize(text) == hf_tok.tokenize(text), repr(text)


def test_native_fuzz_against_python():
    """The C++ tokenizer (with fallback rows) equals the Python tokenizer on
    the same fuzz corpus."""
    import random

    pytest.importorskip("mvlt_tpu.data.native")
    from mvlt_tpu.data.native import NativeTokenizer

    nt = NativeTokenizer(VOCAB)
    if not nt.native_available:
        pytest.skip("native lib unavailable")
    py = WordPieceTokenizer(VOCAB)
    random.seed(1)
    alphabet = (
        "abcdefghijklmnopqrstuvwxyz0123456789 .,-!?/()'\"éèàç日本語"
    )
    for _ in range(200):
        n = random.randint(0, 60)
        text = "".join(random.choice(alphabet) for _ in range(n))
        assert nt.tokenize_to_ids(text) == py.tokenize_to_ids(text), repr(text)
