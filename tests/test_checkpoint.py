"""Checkpoint save/load: native .npz and reference-format .pt interchange."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from gpt2_image_captioning_tpu.models import captioner as C
from gpt2_image_captioning_tpu.models import gpt2 as G
from gpt2_image_captioning_tpu.models import mapping as M
from gpt2_image_captioning_tpu.train import checkpoint

GCFG = G.GPT2Config.tiny(vocab_size=64)
MCFG = M.TransformerMappingConfig(
    embed_dim=8, gpt_dim=32, prefix_length=3, hidden_length=2, num_layers=1, num_heads=4
)
CCFG = C.CaptionerConfig(gpt2=GCFG, mapping=MCFG, eos_token_id=63)


def _params(seed=0):
    return C.init_params(jax.random.PRNGKey(seed), CCFG)


def _tree_equal(a, b):
    fa = jax.tree.leaves(a)
    fb = jax.tree.leaves(b)
    assert len(fa) == len(fb)
    for x, y in zip(fa, fb):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y), atol=0)


def test_npz_roundtrip(tmp_path):
    t, _ = _params()
    p = str(tmp_path / "model_epoch_1.npz")
    checkpoint.save_captioner(p, t, CCFG)
    t2, _ = _params(seed=1)
    loaded = checkpoint.load_captioner(p, t2, CCFG)
    _tree_equal(t, loaded)


def test_npz_rejects_mismatched_tree(tmp_path):
    t, _ = _params()
    p = str(tmp_path / "ck.npz")
    checkpoint.save_captioner(p, t, CCFG)
    other_cfg = C.CaptionerConfig(
        gpt2=GCFG, mapping=MCFG, eos_token_id=63, task_prompt_ids=(1, 2)
    )
    t3, _ = C.init_params(jax.random.PRNGKey(2), other_cfg)
    with pytest.raises(ValueError, match="Missing keys"):
        checkpoint.load_captioner(p, t3, other_cfg)


def test_reference_pt_roundtrip(tmp_path):
    """Save in the reference's torch format, reload into fresh params."""
    pytest.importorskip("torch")
    t, _ = _params()
    p = str(tmp_path / "model_epoch_1.pt")
    checkpoint.save_captioner(p, t, CCFG)

    # the artifact uses the reference's parameter names
    import torch

    sd = torch.load(p, weights_only=False)
    assert "mapping_network.linear.weight" in sd
    assert "mapping_network.prefix_const" in sd
    assert any(k.startswith("mapping_network.transformer.layers.0.") for k in sd)
    assert not any(k.startswith("gpt.") for k in sd)  # frozen GPT excluded

    t2, _ = _params(seed=3)
    loaded = checkpoint.load_captioner(p, t2, CCFG)
    _tree_equal(t, loaded)


def test_pt_unexpected_keys_rejected(tmp_path):
    pytest.importorskip("torch")
    import torch

    t, _ = _params()
    p = str(tmp_path / "bad.pt")
    sd = {"something_else.weight": torch.zeros(2)}
    torch.save(sd, p)
    with pytest.raises(ValueError, match="Unexpected keys"):
        checkpoint.load_captioner(p, t, CCFG)


def test_pt_with_unfrozen_gpt(tmp_path):
    pytest.importorskip("torch")
    cfg = C.CaptionerConfig(gpt2=GCFG, mapping=MCFG, eos_token_id=63, freeze_gpt_weights=False)
    t, f = C.init_params(jax.random.PRNGKey(4), cfg)
    assert "gpt" in t and not f
    p = str(tmp_path / "full.pt")
    checkpoint.save_captioner(p, t, cfg)
    import torch

    sd = torch.load(p, weights_only=False)
    assert "gpt.transformer.wte.weight" in sd
    t2, _ = C.init_params(jax.random.PRNGKey(5), cfg)
    loaded = checkpoint.load_captioner(p, t2, cfg)
    np.testing.assert_allclose(np.asarray(loaded["gpt"]["wte"]), np.asarray(t["gpt"]["wte"]))


def test_generic_pytree_roundtrip(tmp_path):
    tree = {"a": jnp.ones((2, 3)), "b": [jnp.zeros(4), {"c": jnp.full((2,), 7.0)}]}
    p = str(tmp_path / "opt_state.npz")
    checkpoint.save_pytree(p, tree)
    loaded = checkpoint.load_pytree(p)
    _tree_equal(tree, loaded)
    assert isinstance(loaded["b"], list)


def test_orbax_backend_roundtrip(tmp_path):
    pytest.importorskip("orbax.checkpoint")
    t, _ = _params()
    d = str(tmp_path / "orbax_ck")
    checkpoint.save_pytree_orbax(d, t)
    t2, _ = _params(seed=9)
    loaded = checkpoint.load_pytree_orbax(d, t2)
    _tree_equal(t, loaded)
