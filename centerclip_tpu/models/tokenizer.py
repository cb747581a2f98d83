# coding=utf-8
"""CLIP byte-pair-encoding tokenizer.

Functional equivalent of the reference tokenizer
(reference: modules/simple_tokenizer.py:63-146), written fresh around the
standard BPE algorithm.  The merges table
(`assets/bpe_simple_vocab_16e6.txt.gz`) is OpenAI's public CLIP vocabulary —
a data asset, not code.  `ftfy` is optional (not available in this image);
when absent, text cleaning falls back to html-unescaping only, which is a
no-op for ordinary ASCII captions.
"""
from __future__ import annotations

import functools
import gzip
import html
import os
from typing import Dict, List, Sequence, Tuple

import numpy as np

try:
    import regex as re
    _HAS_REGEX = True
except ImportError:  # pragma: no cover
    import re  # type: ignore
    _HAS_REGEX = False

try:
    import ftfy
    _HAS_FTFY = True
except ImportError:
    _HAS_FTFY = False

DEFAULT_BPE_PATH = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "assets", "bpe_simple_vocab_16e6.txt.gz")

SOT_TOKEN = "<|startoftext|>"
EOT_TOKEN = "<|endoftext|>"


@functools.lru_cache()
def bytes_to_unicode() -> Dict[int, str]:
    """Reversible byte -> printable-unicode map (standard GPT-2/CLIP table).

    Printable bytes map to themselves; the rest get shifted into a private
    range starting at 256 so every byte has a visible, non-whitespace symbol.
    """
    bs = (list(range(ord("!"), ord("~") + 1))
          + list(range(ord("¡"), ord("¬") + 1))
          + list(range(ord("®"), ord("ÿ") + 1)))
    cs = bs[:]
    n = 0
    for b in range(256):
        if b not in bs:
            bs.append(b)
            cs.append(256 + n)
            n += 1
    return dict(zip(bs, (chr(c) for c in cs)))


def _get_pairs(word: Tuple[str, ...]) -> set:
    return set(zip(word[:-1], word[1:]))


def _basic_clean(text: str) -> str:
    if _HAS_FTFY:
        text = ftfy.fix_text(text)
    return html.unescape(html.unescape(text)).strip()


def _whitespace_clean(text: str) -> str:
    return re.sub(r"\s+", " ", text).strip()


class SimpleTokenizer:
    """CLIP BPE tokenizer with a 49408-entry vocabulary."""

    def __init__(self, bpe_path: str = DEFAULT_BPE_PATH):
        self.byte_encoder = bytes_to_unicode()
        self.byte_decoder = {v: k for k, v in self.byte_encoder.items()}
        with gzip.open(bpe_path, "rt", encoding="utf-8") as f:
            merge_lines = f.read().split("\n")
        # same slice as the reference: skip the header line, keep exactly
        # 49152-256-2 merges (simple_tokenizer.py:68)
        merge_lines = merge_lines[1:49152 - 256 - 2 + 1]
        merges = [tuple(line.split()) for line in merge_lines]

        vocab = list(self.byte_encoder.values())
        vocab = vocab + [v + "</w>" for v in vocab]
        vocab.extend("".join(m) for m in merges)
        vocab.extend([SOT_TOKEN, EOT_TOKEN])
        self.encoder: Dict[str, int] = {tok: i for i, tok in enumerate(vocab)}
        self.decoder = {i: tok for tok, i in self.encoder.items()}
        self.bpe_ranks = {m: i for i, m in enumerate(merges)}
        self.cache = {SOT_TOKEN: SOT_TOKEN, EOT_TOKEN: EOT_TOKEN}
        if _HAS_REGEX:
            self.pat = re.compile(
                r"""<\|startoftext\|>|<\|endoftext\|>|'s|'t|'re|'ve|'m|'ll|'d"""
                r"""|[\p{L}]+|[\p{N}]|[^\s\p{L}\p{N}]+""", re.IGNORECASE)
        else:  # pragma: no cover - regex is in the baked image
            self.pat = re.compile(
                r"""<\|startoftext\|>|<\|endoftext\|>|'s|'t|'re|'ve|'m|'ll|'d"""
                r"""|[A-Za-z]+|[0-9]|[^\sA-Za-z0-9]+""", re.IGNORECASE)

    @property
    def vocab_size(self) -> int:
        return len(self.encoder)

    def bpe(self, token: str) -> str:
        if token in self.cache:
            return self.cache[token]
        word = tuple(token[:-1]) + (token[-1] + "</w>",)
        pairs = _get_pairs(word)
        if not pairs:
            return token + "</w>"
        while True:
            bigram = min(pairs, key=lambda p: self.bpe_ranks.get(p, float("inf")))
            if bigram not in self.bpe_ranks:
                break
            first, second = bigram
            new_word: List[str] = []
            i = 0
            while i < len(word):
                try:
                    j = word.index(first, i)
                except ValueError:
                    new_word.extend(word[i:])
                    break
                new_word.extend(word[i:j])
                i = j
                if i < len(word) - 1 and word[i] == first and word[i + 1] == second:
                    new_word.append(first + second)
                    i += 2
                else:
                    new_word.append(word[i])
                    i += 1
            word = tuple(new_word)
            if len(word) == 1:
                break
            pairs = _get_pairs(word)
        result = " ".join(word)
        self.cache[token] = result
        return result

    def encode(self, text: str) -> List[int]:
        bpe_tokens: List[int] = []
        text = _whitespace_clean(_basic_clean(text)).lower()
        for token in re.findall(self.pat, text):
            token = "".join(self.byte_encoder[b] for b in token.encode("utf-8"))
            bpe_tokens.extend(self.encoder[t] for t in self.bpe(token).split(" "))
        return bpe_tokens

    def decode(self, tokens: Sequence[int]) -> str:
        text = "".join(self.decoder[int(t)] for t in tokens)
        return bytearray(self.byte_decoder[c] for c in text).decode(
            "utf-8", errors="replace").replace("</w>", " ")

    # --- reference-compatible string-token API (simple_tokenizer.py:137-146)
    def tokenize(self, text: str) -> List[str]:
        tokens: List[str] = []
        text = _whitespace_clean(_basic_clean(text)).lower()
        for token in re.findall(self.pat, text):
            token = "".join(self.byte_encoder[b] for b in token.encode("utf-8"))
            tokens.extend(self.bpe(token).split(" "))
        return tokens

    def convert_tokens_to_ids(self, tokens: Sequence[str]) -> List[int]:
        return [self.encoder[t] for t in tokens]

    @property
    def vocab(self) -> Dict[str, int]:
        return self.encoder


def tokenize_batch(tokenizer: SimpleTokenizer, texts: Sequence[str],
                   max_words: int = 32
                   ) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """CLS + BPE(<=max_words-2) + SEP, zero-padded, with mask/segment arrays
    (the per-dataset `_get_text` convention, e.g.
    reference: dataloaders/dataloader_msrvtt_retrieval.py:56-89)."""
    sot = tokenizer.encoder[SOT_TOKEN]
    eot = tokenizer.encoder[EOT_TOKEN]
    ids = np.zeros((len(texts), max_words), np.int32)
    mask = np.zeros((len(texts), max_words), np.int32)
    seg = np.zeros((len(texts), max_words), np.int32)
    for i, text in enumerate(texts):
        toks = tokenizer.encode(text)[: max_words - 2]
        row = [sot] + toks + [eot]
        ids[i, : len(row)] = row
        mask[i, : len(row)] = 1
    return ids, mask, seg
