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


def test_unicode_word_splitting(tmp_path):
    """CLIP's \\p{L}+ keeps accented words whole: with a merge-free vocab
    "café" byte-BPE-encodes as one word — c, a, f, 0xC3, 0xA9</w> — where
    the former ASCII pattern split it into "caf" + "é" (f</w> inside)."""
    vp, mp = _mini_vocab(tmp_path)
    tok = CLIPTokenizer(vp, mp)
    b2u = bytes_to_unicode()
    ids = tok.encode("café")
    raw = "café".encode("utf-8")        # 5 bytes: c a f 0xC3 0xA9
    expect = [b2u[b] for b in raw[:-1]] + [b2u[raw[-1]] + "</w>"]
    assert [tok.decoder[i] for i in ids] == expect


def test_unicode_cjk_single_word(tmp_path):
    """CJK letters are \\p{L}: "日本語" is ONE word (9 UTF-8 bytes, only
    the last carries </w>), even adjacent to ASCII."""
    vp, mp = _mini_vocab(tmp_path)
    tok = CLIPTokenizer(vp, mp)
    b2u = bytes_to_unicode()
    ids = tok.encode("日本語 hello")
    raw = "日本語".encode("utf-8")
    expect = ([b2u[b] for b in raw[:-1]] + [b2u[raw[-1]] + "</w>"]
              + ["hello</w>"])
    assert [tok.decoder[i] for i in ids] == expect


def test_unicode_digits_split_singly(tmp_path):
    """\\p{N} matches ONE number char at a time — Arabic-Indic "١٢٣" is
    three words (each 2 UTF-8 bytes ending </w>), not one catch-all run
    of 6 bytes like the former ASCII pattern produced."""
    vp, mp = _mini_vocab(tmp_path)
    tok = CLIPTokenizer(vp, mp)
    b2u = bytes_to_unicode()
    ids = tok.encode("١٢٣")
    expect = []
    for ch in "١٢٣":
        raw = ch.encode("utf-8")
        expect += [b2u[b] for b in raw[:-1]] + [b2u[raw[-1]] + "</w>"]
    assert [tok.decoder[i] for i in ids] == expect
    assert tok.encode("123") == tok.encode("1 2 3")  # ASCII digits too


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
