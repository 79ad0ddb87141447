"""Numerical parity of the JAX GPT-2 against HF's GPT2LMHeadModel.

A randomly-initialized HF model (no download needed) is ported via
models/porting.py; logits, masked-attention behavior, loss, and the KV-cached
decode path must all match float32 torch numerics closely.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

import jax.numpy as jnp

from gpt2_image_captioning_tpu.models import gpt2
from gpt2_image_captioning_tpu.models.porting import export_gpt2, port_gpt2

CFG = gpt2.GPT2Config(vocab_size=97, n_positions=64, n_embd=32, n_layer=3, n_head=4)


@pytest.fixture(scope="module")
def torch_model():
    torch.manual_seed(0)
    hf_cfg = transformers.GPT2Config(
        vocab_size=CFG.vocab_size,
        n_positions=CFG.n_positions,
        n_embd=CFG.n_embd,
        n_layer=CFG.n_layer,
        n_head=CFG.n_head,
        attn_pdrop=0.0,
        embd_pdrop=0.0,
        resid_pdrop=0.0,
    )
    m = transformers.GPT2LMHeadModel(hf_cfg)
    m.eval()
    return m


@pytest.fixture(scope="module")
def jax_params(torch_model):
    return port_gpt2(torch_model.state_dict(), CFG)


def _rand_embeds(b, t, seed=0):
    rng = np.random.default_rng(seed)
    return rng.normal(size=(b, t, CFG.n_embd)).astype(np.float32)


def test_forward_logits_match(torch_model, jax_params):
    x = _rand_embeds(2, 10)
    with torch.no_grad():
        ref = torch_model(inputs_embeds=torch.from_numpy(x)).logits.numpy()
    ours = np.asarray(gpt2.forward(jax_params, CFG, jnp.asarray(x)))
    np.testing.assert_allclose(ours, ref, atol=2e-4, rtol=2e-4)


def test_forward_with_padding_mask(torch_model, jax_params):
    x = _rand_embeds(2, 8, seed=1)
    mask = np.ones((2, 8), dtype=np.int64)
    mask[0, 5:] = 0
    mask[1, 7:] = 0
    with torch.no_grad():
        ref = torch_model(
            inputs_embeds=torch.from_numpy(x), attention_mask=torch.from_numpy(mask)
        ).logits.numpy()
    ours = np.asarray(gpt2.forward(jax_params, CFG, jnp.asarray(x), jnp.asarray(mask)))
    # positions attending only to valid keys must match
    np.testing.assert_allclose(ours[0, :5], ref[0, :5], atol=2e-4, rtol=2e-4)
    np.testing.assert_allclose(ours[1, :7], ref[1, :7], atol=2e-4, rtol=2e-4)


def test_loss_matches_torch(torch_model, jax_params):
    x = _rand_embeds(2, 9, seed=2)
    labels = np.random.default_rng(3).integers(0, CFG.vocab_size, size=(2, 9))
    labels[0, 6:] = -100
    labels[1, :2] = -100
    with torch.no_grad():
        ref = torch_model(
            inputs_embeds=torch.from_numpy(x), labels=torch.from_numpy(labels)
        ).loss.item()
    logits = gpt2.forward(jax_params, CFG, jnp.asarray(x))
    s, c = gpt2.cross_entropy_loss(logits, jnp.asarray(labels))
    assert float(s / c) == pytest.approx(ref, abs=1e-4)


def test_kv_cached_decode_matches_full_forward(jax_params):
    """Prefill + step-by-step cached decode must equal the full re-forward."""
    b, prefix_len, steps = 2, 5, 4
    x = _rand_embeds(b, prefix_len + steps, seed=4)

    # reference: full forwards like the torch loop (no cache)
    want_logits = []
    for t in range(prefix_len, prefix_len + steps + 1):
        logits = gpt2.forward(jax_params, CFG, jnp.asarray(x[:, :t]))
        want_logits.append(np.asarray(logits[:, -1]))

    cache = gpt2.init_cache(CFG, b, prefix_len + steps + 1)
    got, cache = gpt2.forward_cached(jax_params, CFG, jnp.asarray(x[:, :prefix_len]), cache)
    np.testing.assert_allclose(np.asarray(got), want_logits[0], atol=1e-4, rtol=1e-4)
    for s in range(steps):
        tok = jnp.asarray(x[:, prefix_len + s : prefix_len + s + 1])
        got, cache = gpt2.forward_cached(jax_params, CFG, tok, cache)
        np.testing.assert_allclose(
            np.asarray(got), want_logits[s + 1], atol=1e-4, rtol=1e-4
        )
    assert int(cache["index"]) == prefix_len + steps


def test_export_roundtrip(torch_model, jax_params):
    sd = export_gpt2(jax_params)
    m2 = transformers.GPT2LMHeadModel(torch_model.config)
    missing, unexpected = m2.load_state_dict(
        {k: torch.from_numpy(np.array(v)) for k, v in sd.items()}, strict=False
    )
    assert not unexpected
    assert all(".attn.bias" in k or ".attn.masked_bias" in k for k in missing)
    x = _rand_embeds(1, 6, seed=5)
    with torch.no_grad():
        a = torch_model(inputs_embeds=torch.from_numpy(x)).logits.numpy()
        b_ = m2(inputs_embeds=torch.from_numpy(x)).logits.numpy()
    np.testing.assert_allclose(a, b_, atol=1e-6)


def test_embed_tokens(jax_params):
    ids = jnp.asarray([[1, 2, 3]])
    out = gpt2.embed_tokens(jax_params, ids)
    np.testing.assert_allclose(
        np.asarray(out[0, 1]), np.asarray(jax_params["wte"][2]), atol=0
    )
