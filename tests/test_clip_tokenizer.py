"""CLIP BPE tokenizer parity vs HF's CLIPTokenizer on shared vocab/merges."""

import json

import numpy as np
import pytest

from gpt2_image_captioning_tpu.data.tokenizer import CLIPBPETokenizer, bytes_to_unicode


def _build_assets(tmp_path):
    b2u = bytes_to_unicode()
    symbols = [b2u[i] for i in range(256)]
    # CLIP-style: every symbol also exists with a word-end marker
    end_symbols = [s + "</w>" for s in symbols]
    merges = [
        ("t", "he</w>"),
        ("c", "a"),
        ("ca", "t</w>"),
        ("d", "o"),
        ("do", "g</w>"),
        ("a", "t</w>"),
        ("1", "2</w>"),
        ("'", "s</w>"),
    ]
    vocab_tokens = (
        symbols + end_symbols + ["".join(m) for m in merges]
        + ["<|startoftext|>", "<|endoftext|>"]
    )
    vocab = {t: i for i, t in enumerate(vocab_tokens)}
    vf = tmp_path / "vocab.json"
    mf = tmp_path / "merges.txt"
    vf.write_text(json.dumps(vocab), encoding="utf-8")
    mf.write_text("#version: 0.2\n" + "\n".join(f"{a} {b}" for a, b in merges) + "\n")
    return str(vf), str(mf)


SAMPLES = [
    "the cat",
    "The CAT sat",          # lowercasing
    "a   dog  here",        # whitespace cleanup
    "it's 12 dogs",
    "punctuation, yes!",
]


@pytest.fixture(scope="module")
def assets(tmp_path_factory):
    return _build_assets(tmp_path_factory.mktemp("clipbpe"))


def test_matches_hf_cliptokenizer(assets):
    transformers = pytest.importorskip("transformers")
    ours = CLIPBPETokenizer.from_files(*assets)
    hf = transformers.CLIPTokenizer(vocab_file=assets[0], merges_file=assets[1])
    for s in SAMPLES:
        assert ours.encode(s) == hf.encode(s), f"mismatch on {s!r}"


def test_call_contract(assets):
    tok = CLIPBPETokenizer.from_files(*assets, context_length=8)
    enc = tok(["the cat", "a much longer caption with many words to truncate"])
    ids = enc["input_ids"]
    assert ids.shape == (2, 8)
    assert ids[0, 0] == tok.bos_token_id
    # truncation keeps a terminal EOS
    assert ids[1, -1] == tok.eos_token_id
    n_real = int(enc["attention_mask"][0].sum())
    assert ids[0, n_real - 1] == tok.eos_token_id
    assert (ids[0, n_real:] == tok.pad_token_id).all()


def test_clip_native_matches_python(assets):
    import os

    from gpt2_image_captioning_tpu.data import native_bpe

    if not native_bpe.available():
        pytest.skip("libbpe.so not built")
    native = CLIPBPETokenizer.from_files(*assets)
    native.encode("warm up")
    assert native._native is not None
    os.environ["GIC_DISABLE_NATIVE_BPE"] = "1"
    try:
        pure = CLIPBPETokenizer.from_files(*assets)
        for s in SAMPLES + ["the the cat cat dog"]:
            assert native.encode(s) == pure.encode(s), s
    finally:
        os.environ.pop("GIC_DISABLE_NATIVE_BPE", None)
