"""Self-contained BERT-uncased WordPiece tokenizer.

Replaces the reference's HF ``BertTokenizer.from_pretrained('bert-base-
uncased')`` (mcloader/fashion_gen.py:46) with a dependency-free tokenizer
over the shipped vocab (preweights/bert-base-uncased-vocab.txt, 30,522
entries).  Implements the same algorithm as BERT's reference tokenizer:

  basic pass:  clean (strip control chars, normalize whitespace) -> lowercase
               -> NFD accent stripping -> punctuation splitting -> CJK
               char isolation
  wordpiece:   greedy longest-match-first over the vocab with '##'
               continuation prefixes; words longer than 200 chars and
               unmatched words map to [UNK]

Parity with the HF fast tokenizer is asserted in tests/test_tokenizer.py.

A C++ batch tokenizer (native/tokenizer.cc) provides the same algorithm for
host-side throughput; this module is the ground truth and fallback.
"""

from __future__ import annotations

import unicodedata
from typing import Dict, Iterable, List, Sequence

PAD, UNK, CLS, SEP, MASK = "[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]"


def resolve_vocab_path(vocab_file: str) -> str:
    """Resolve a relative vocab path against the repo/package root so the
    shipped preweights/ asset is found regardless of cwd."""
    import os

    if os.path.isabs(vocab_file) or os.path.exists(vocab_file):
        return vocab_file
    pkg_root = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    candidate = os.path.join(pkg_root, vocab_file)
    return candidate if os.path.exists(candidate) else vocab_file


def load_vocab(vocab_file: str) -> Dict[str, int]:
    vocab: Dict[str, int] = {}
    with open(resolve_vocab_path(vocab_file), encoding="utf-8") as f:
        for i, line in enumerate(f):
            tok = line.rstrip("\n")
            if tok:
                vocab[tok] = i
    return vocab


def _is_whitespace(ch: str) -> bool:
    if ch in (" ", "\t", "\n", "\r"):
        return True
    return unicodedata.category(ch) == "Zs"


def _is_control(ch: str) -> bool:
    if ch in ("\t", "\n", "\r"):
        return False
    return unicodedata.category(ch).startswith("C")


def _is_punctuation(ch: str) -> bool:
    cp = ord(ch)
    # ASCII ranges BERT treats as punctuation even when unicode doesn't.
    if (33 <= cp <= 47) or (58 <= cp <= 64) or (91 <= cp <= 96) or (123 <= cp <= 126):
        return True
    return unicodedata.category(ch).startswith("P")


def _is_cjk(cp: int) -> bool:
    return (
        0x4E00 <= cp <= 0x9FFF or 0x3400 <= cp <= 0x4DBF
        or 0x20000 <= cp <= 0x2A6DF or 0x2A700 <= cp <= 0x2B73F
        or 0x2B740 <= cp <= 0x2B81F or 0x2B820 <= cp <= 0x2CEAF
        or 0xF900 <= cp <= 0xFAFF or 0x2F800 <= cp <= 0x2FA1F
    )


class WordPieceTokenizer:
    def __init__(self, vocab_file: str, do_lower_case: bool = True,
                 max_chars_per_word: int = 200):
        self.vocab = load_vocab(vocab_file)
        self.inv_vocab = {v: k for k, v in self.vocab.items()}
        self.do_lower_case = do_lower_case
        self.max_chars_per_word = max_chars_per_word
        self.pad_id = self.vocab[PAD]
        self.unk_id = self.vocab[UNK]
        self.cls_id = self.vocab[CLS]
        self.sep_id = self.vocab[SEP]
        self.mask_id = self.vocab[MASK]

    # --- basic tokenization ---------------------------------------------
    def _clean(self, text: str) -> str:
        out = []
        for ch in text:
            cp = ord(ch)
            if cp == 0 or cp == 0xFFFD or _is_control(ch):
                continue
            out.append(" " if _is_whitespace(ch) else ch)
        return "".join(out)

    def _split_cjk(self, text: str) -> str:
        out = []
        for ch in text:
            if _is_cjk(ord(ch)):
                out.extend((" ", ch, " "))
            else:
                out.append(ch)
        return "".join(out)

    def _strip_accents(self, text: str) -> str:
        return "".join(
            ch for ch in unicodedata.normalize("NFD", text)
            if unicodedata.category(ch) != "Mn"
        )

    def _split_punct(self, word: str) -> List[str]:
        pieces: List[str] = []
        current: List[str] = []
        for ch in word:
            if _is_punctuation(ch):
                if current:
                    pieces.append("".join(current))
                    current = []
                pieces.append(ch)
            else:
                current.append(ch)
        if current:
            pieces.append("".join(current))
        return pieces

    def basic_tokenize(self, text: str) -> List[str]:
        text = self._clean(text)
        text = self._split_cjk(text)
        tokens: List[str] = []
        for word in text.split():
            if self.do_lower_case:
                word = self._strip_accents(word.lower())
            tokens.extend(self._split_punct(word))
        return tokens

    # --- wordpiece --------------------------------------------------------
    def wordpiece(self, word: str) -> List[str]:
        if len(word) > self.max_chars_per_word:
            return [UNK]
        pieces: List[str] = []
        start = 0
        n = len(word)
        while start < n:
            end = n
            piece = None
            while start < end:
                sub = word[start:end]
                if start > 0:
                    sub = "##" + sub
                if sub in self.vocab:
                    piece = sub
                    break
                end -= 1
            if piece is None:
                return [UNK]
            pieces.append(piece)
            start = end
        return pieces

    # --- public API ------------------------------------------------------
    def tokenize(self, text: str) -> List[str]:
        out: List[str] = []
        for word in self.basic_tokenize(text):
            out.extend(self.wordpiece(word))
        return out

    def convert_tokens_to_ids(self, tokens: Iterable[str]) -> List[int]:
        return [self.vocab.get(t, self.unk_id) for t in tokens]

    def tokenize_to_ids(self, text: str) -> List[int]:
        """tokenize + convert in one call — the interface the data pipeline
        uses, overridden by the native C++ tokenizer."""
        return self.convert_tokens_to_ids(self.tokenize(text))

    def convert_ids_to_tokens(self, ids: Iterable[int]) -> List[str]:
        return [self.inv_vocab.get(i, UNK) for i in ids]

    def encode(self, text: str, max_length: int) -> List[int]:
        """[CLS] tokens [SEP] padded to max_length — the reference's shape
        contract (mcloader/fashion_gen.py:326-355)."""
        toks = self.tokenize(text)[: max_length - 2]
        ids = [self.cls_id] + self.convert_tokens_to_ids(toks) + [self.sep_id]
        ids += [self.pad_id] * (max_length - len(ids))
        return ids

    def __len__(self) -> int:
        return len(self.vocab)


def make_tokenizer(vocab_file: str):
    """Prefer the native C++ tokenizer (exact-parity with per-row Python
    fallback); return the pure-Python tokenizer when the library is
    unavailable."""
    reason = "native_available=False (libmvlt_native.so not found/loadable)"
    try:
        from mvlt_tpu.data.native import NativeTokenizer

        t = NativeTokenizer(vocab_file)
        if t.native_available:
            return t
    except Exception as e:  # noqa: BLE001 — any native failure falls back
        reason = f"{type(e).__name__}: {e}"
    # one warning, not silence: the fallback costs ~16% host tokenization
    # throughput, and a broken native build should be visible (ADVICE r3)
    import logging

    logging.getLogger(__name__).warning(
        "native tokenizer unavailable (%s); using the pure-Python "
        "WordPiece fallback", reason)
    return WordPieceTokenizer(vocab_file)
