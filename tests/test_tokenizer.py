"""CLIP BPE tokenizer: merge algorithm, padding convention, fallback."""

import json

import numpy as np

from aqualora_tpu.core.tokenizer import (CLIPTokenizer, FallbackTokenizer,
                                         bytes_to_unicode, load_tokenizer)


def _mini_vocab(tmp_path):
    """A small but real BPE vocab: bytes + merges for 'hello world'."""
    base = list(bytes_to_unicode().values())
    vocab = {c: i for i, c in enumerate(base)}
    for c in base:
        vocab[c + "</w>"] = len(vocab)
    merges = ["h e", "he l", "hel l", "hell o</w>",
              "w o", "wo r", "wor l", "worl d</w>"]
    for m in merges:
        vocab["".join(m.split())] = len(vocab)
    vocab["<|startoftext|>"] = len(vocab)
    vocab["<|endoftext|>"] = len(vocab)
    vp = tmp_path / "vocab.json"
    mp = tmp_path / "merges.txt"
    vp.write_text(json.dumps(vocab))
    mp.write_text("#version: 0.2\n" + "\n".join(merges) + "\n")
    return str(vp), str(mp)


def test_bpe_merges(tmp_path):
    vp, mp = _mini_vocab(tmp_path)
    tok = CLIPTokenizer(vp, mp)
    ids = tok.encode("hello world")
    toks = [tok.decoder[i] for i in ids]
    assert toks == ["hello</w>", "world</w>"]


def test_padding_and_truncation(tmp_path):
    vp, mp = _mini_vocab(tmp_path)
    tok = CLIPTokenizer(vp, mp)
    out = tok(["hello", "hello world hello world"])
    assert out.shape == (2, 77)
    assert out[0, 0] == tok.bos
    assert out[0, 2] == tok.eos
    assert (out[0, 3:] == tok.eos).all()    # pad with eos


def test_unknown_word_falls_to_bytes(tmp_path):
    vp, mp = _mini_vocab(tmp_path)
    tok = CLIPTokenizer(vp, mp)
    ids = tok.encode("xyz")   # no merges -> per-byte tokens + </w>
    assert len(ids) == 3
    assert tok.decoder[ids[-1]].endswith("</w>")


def test_fallback_deterministic():
    tok = FallbackTokenizer()
    a = tok(["a cat sat"])
    b = tok(["a cat sat"])
    np.testing.assert_array_equal(a, b)
    c = tok(["a dog sat"])
    assert (a != c).any()


def test_load_tokenizer_dispatch(tmp_path):
    vp, mp = _mini_vocab(tmp_path)
    assert isinstance(load_tokenizer(vp, mp), CLIPTokenizer)
    assert isinstance(load_tokenizer(None), FallbackTokenizer)
    assert isinstance(load_tokenizer("/nonexistent"), FallbackTokenizer)
