# coding=utf-8
"""Tokenizer tests.

Cross-implementation oracle: HuggingFace's CLIPTokenizer implements the same
BPE independently; feeding it vocab/merges tables exported from our tokenizer
checks the merge loop, byte mapping and special-token handling against a
totally separate codebase.
"""
import gzip
import json
import os

import numpy as np
import pytest

from centerclip_tpu.models.tokenizer import (DEFAULT_BPE_PATH, EOT_TOKEN,
                                             SOT_TOKEN, SimpleTokenizer,
                                             tokenize_batch)

SENTENCES = [
    "a man is riding a horse on the beach",
    "The quick brown fox jumps over the lazy dog!",
    "someone is COOKING pasta, then they eat it...",
    "video of a cat playing piano (4k, 60fps)",
    "don't stop believin' -- journey",
    "",
]


@pytest.fixture(scope="module")
def tok():
    return SimpleTokenizer()


def test_vocab_size(tok):
    assert tok.vocab_size == 49408
    assert tok.encoder[SOT_TOKEN] == 49406
    assert tok.encoder[EOT_TOKEN] == 49407


def test_roundtrip(tok):
    # BPE decode re-inserts word boundaries as spaces (also around
    # punctuation), so the stable invariant is encode∘decode∘encode = encode.
    for s in SENTENCES[:-1]:
        ids = tok.encode(s)
        assert tok.encode(tok.decode(ids)) == ids
    # pure-word sentences roundtrip exactly (modulo case/whitespace)
    assert tok.decode(tok.encode("A man Rides a Horse")).strip() == \
        "a man rides a horse"


def test_matches_huggingface(tok, tmp_path):
    transformers = pytest.importorskip("transformers")
    vocab_file = tmp_path / "vocab.json"
    merges_file = tmp_path / "merges.txt"
    with open(vocab_file, "w") as f:
        json.dump(tok.encoder, f)
    with gzip.open(DEFAULT_BPE_PATH, "rt", encoding="utf-8") as f:
        lines = f.read().split("\n")[1:49152 - 256 - 2 + 1]
    with open(merges_file, "w") as f:
        f.write("#version: 0.2\n" + "\n".join(lines))
    hf = transformers.CLIPTokenizer(str(vocab_file), str(merges_file))
    for s in SENTENCES[:-1]:
        ours = tok.encode(s)
        theirs = hf(s, add_special_tokens=False)["input_ids"]
        assert ours == theirs, s


def test_tokenize_batch_layout(tok):
    ids, mask, seg = tokenize_batch(tok, SENTENCES, max_words=16)
    assert ids.shape == (len(SENTENCES), 16)
    # CLS first, EOT closes every row
    assert (ids[:, 0] == tok.encoder[SOT_TOKEN]).all()
    for i in range(len(SENTENCES)):
        n = int(mask[i].sum())
        assert ids[i, n - 1] == tok.encoder[EOT_TOKEN]
        assert (ids[i, n:] == 0).all()
    # truncation to max_words-2 body tokens
    long = "word " * 100
    ids2, mask2, _ = tokenize_batch(tok, [long], max_words=16)
    assert int(mask2.sum()) == 16
    # EOT id is the max id -> argmax pooling finds it (clip.py:484)
    assert np.argmax(ids[0]) == int(mask[0].sum()) - 1
    assert seg.sum() == 0
