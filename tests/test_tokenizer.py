"""Golden tests for the first-party GPT-2 byte-level BPE tokenizer.

We can't download the published GPT-2 vocab (no egress), so we build a small
but realistic vocab/merges pair covering multi-byte unicode, contractions,
digits and whitespace, write them in the standard format, and check our
tokenizer agrees exactly with HF's ``GPT2Tokenizer`` loaded from the *same
files* — a true algorithm-parity test.
"""

import json

import numpy as np
import pytest

from gpt2_image_captioning_tpu.data.tokenizer import (
    GPT2BPETokenizer,
    bytes_to_unicode,
)


def _build_assets(tmp_path):
    """Construct a tiny byte-level BPE vocab: all 256 byte symbols + a few merges."""
    b2u = bytes_to_unicode()
    symbols = [b2u[i] for i in range(256)]
    merges = [
        ("Ġ", "t"),       # " t"
        ("h", "e"),
        ("Ġt", "he"),     # " the"
        ("c", "a"),
        ("ca", "t"),
        ("a", "t"),
        ("1", "2"),
        ("'", "s"),
        ("Ġ", "Ġ"),       # double space
        ("é", "Ĥ"),       # part of a multi-byte utf-8 char
    ]
    vocab_tokens = symbols + ["".join(m) for m in merges] + ["<|endoftext|>"]
    vocab = {tok: i for i, tok in enumerate(vocab_tokens)}
    vocab_file = tmp_path / "vocab.json"
    merges_file = tmp_path / "merges.txt"
    vocab_file.write_text(json.dumps(vocab), encoding="utf-8")
    merges_file.write_text(
        "#version: 0.2\n" + "\n".join(f"{a} {b}" for a, b in merges) + "\n",
        encoding="utf-8",
    )
    return str(vocab_file), str(merges_file)


SAMPLES = [
    "the cat sat on the mat",
    "The cat's hat,  double  space",
    "numbers 123 456 mixed12",
    "unicode: café ☕ emoji",
    "trailing space ",
    " leading",
    "newlines\nand\ttabs",
    "",
    "it's they've we'll don't",
]


@pytest.fixture(scope="module")
def assets(tmp_path_factory):
    return _build_assets(tmp_path_factory.mktemp("bpe"))


@pytest.fixture(scope="module")
def ours(assets):
    return GPT2BPETokenizer.from_files(*assets)


@pytest.fixture(scope="module")
def hf(assets):
    transformers = pytest.importorskip("transformers")
    tok = transformers.GPT2Tokenizer(vocab_file=assets[0], merges_file=assets[1])
    tok.pad_token = tok.eos_token
    return tok


def test_encode_matches_hf(ours, hf):
    for s in SAMPLES:
        assert ours.encode(s) == hf.encode(s), f"mismatch for {s!r}"


def test_decode_roundtrip(ours, hf):
    for s in SAMPLES:
        ids = ours.encode(s)
        assert ours.decode(ids) == hf.decode(ids)
        assert ours.decode(ids) == s


def test_eos_token_id(ours, hf):
    assert ours.eos_token == "<|endoftext|>"
    assert ours.eos_token_id == hf.eos_token_id
    assert ours.pad_token_id == ours.eos_token_id


def test_explicit_eos_string_is_single_token(ours):
    ids = ours.encode("the cat" + ours.eos_token)
    assert ids[-1] == ours.eos_token_id
    assert ours.eos_token_id not in ids[:-1]


def test_call_padding_and_mask_semantics(ours, hf):
    """The reference's dataset contract (src/dataset.py:181-206): explicit EOS
    keeps mask 1, max-length padding gets mask 0 even though ids coincide."""
    text = "the cat" + ours.eos_token
    enc = ours(text, max_length=10, padding="max_length", truncation=True)
    ref = hf(text, max_length=10, padding="max_length", truncation=True)
    np.testing.assert_array_equal(enc["input_ids"][0], ref["input_ids"])
    np.testing.assert_array_equal(enc["attention_mask"][0], ref["attention_mask"])
    n_real = int(enc["attention_mask"][0].sum())
    assert enc["input_ids"][0, n_real - 1] == ours.eos_token_id
    assert enc["attention_mask"][0, n_real - 1] == 1
    assert (enc["attention_mask"][0, n_real:] == 0).all()
    assert (enc["input_ids"][0, n_real:] == ours.pad_token_id).all()


def test_truncation(ours, hf):
    text = "the cat sat " * 20
    enc = ours(text, max_length=5, padding="max_length", truncation=True)
    ref = hf(text, max_length=5, padding="max_length", truncation=True)
    np.testing.assert_array_equal(enc["input_ids"][0], ref["input_ids"])


def test_batch_decode_skip_special(ours):
    ids = ours.encode("the cat")
    padded = ids + [ours.eos_token_id] * 3
    out = ours.batch_decode(np.asarray([padded]), skip_special_tokens=True)
    assert out == ["the cat"]


def test_native_bpe_matches_python(assets):
    """The C++ merge engine and the pure-Python loop agree exactly."""
    from gpt2_image_captioning_tpu.data import native_bpe

    if not native_bpe.available():
        pytest.skip("libbpe.so not built")
    import os

    native = GPT2BPETokenizer.from_files(*assets)
    native.encode("warm")  # engage the native engine before disabling it
    assert native._native is not None, "native path was not engaged"
    os.environ["GIC_DISABLE_NATIVE_BPE"] = "1"
    try:
        pure = GPT2BPETokenizer.from_files(*assets)
        for s in SAMPLES + ["repeated repeated repeated words words"]:
            assert native.encode(s) == pure.encode(s), s
    finally:
        os.environ.pop("GIC_DISABLE_NATIVE_BPE", None)
    assert pure._native is None
