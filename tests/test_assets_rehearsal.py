"""REHEARSAL of the asset-gated tier (VERDICT r2 missing #2).

The real pretrained assets can't be downloaded here, so the four
``tests/test_assets.py`` paths had never executed — a typo in them would
surface only the day real weights land.  This module fabricates a
structurally faithful bundle (real formats, key names, shapes, 50,257-token
vocab — ``tests/fabricate_assets.py``) and runs the SAME test functions
against it, relaxing only the assertions that need pretrained weight
quality.  What this proves today: file loading, key mapping, shapes, the
ports, and the end-to-end decode plumbing.  What still needs real assets:
numerics (PARITY.md delta 1).
"""

from __future__ import annotations

import pytest

import test_assets as TA
from fabricate_assets import fabricate_bundle


@pytest.fixture(scope="module")
def fabricated_assets(tmp_path_factory):
    return fabricate_bundle(str(tmp_path_factory.mktemp("fabricated_assets")))


@pytest.fixture()
def use_fabricated(fabricated_assets, monkeypatch):
    monkeypatch.setattr(TA, "ASSETS", fabricated_assets)
    monkeypatch.setattr(TA, "PRETRAINED_QUALITY", False)


def test_rehearse_tokenizer_path(use_fabricated):
    TA.test_tokenizer_matches_hf_on_real_vocab()


def test_rehearse_gpt2_port_path(use_fabricated):
    TA.test_gpt2_port_matches_hf_forward()


def test_rehearse_clip_caption_path(use_fabricated):
    TA.test_clip_port_and_caption_non_degenerate()


def test_rehearse_dinov3_port_path(use_fabricated):
    # the fabricated hub checkpoint has no importable `dinov3` package, so
    # the test's final numeric branch skips — the port/shape path executes
    with pytest.raises(pytest.skip.Exception):
        TA.test_dinov3_port_matches_torch_checkpoint()
