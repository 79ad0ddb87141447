"""GPT-2 family sizes beyond the 124M flagship.

The reference hardcodes the 124M checkpoint but accepts any injected
``GPT2LMHeadModel`` (``/root/reference/src/models.py:211``); this framework's
equivalent is config-driven.  The fused decode kernel's VMEM budget is tuned
for the 768-wide flagship, so wider sizes must (a) be gated OFF the kernel
(not crash deep inside Mosaic) and (b) still decode correctly on the generic
layerwise XLA cached path.
"""

import jax.numpy as jnp
import numpy as np
import pytest

import jax
from gpt2_image_captioning_tpu.core.precision import BF16, F32
from gpt2_image_captioning_tpu.models import captioner as C
from gpt2_image_captioning_tpu.models import gpt2 as G
from gpt2_image_captioning_tpu.models import mapping as M
from gpt2_image_captioning_tpu.ops import decode_step as DS


def test_family_configs_shapes():
    for cfg, params_m in [
        (G.GPT2Config.gpt2_124m(), 124),
        (G.GPT2Config.gpt2_medium(), 355),
        (G.GPT2Config.gpt2_large(), 774),
        (G.GPT2Config.gpt2_xl(), 1558),
    ]:
        assert cfg.n_embd % cfg.n_head == 0
        # embeddings + blocks(12 d^2-scale mats) + layernorms, the standard count
        approx = (
            cfg.vocab_size * cfg.n_embd
            + cfg.n_positions * cfg.n_embd
            + cfg.n_layer * 12 * cfg.n_embd**2
        ) / 1e6
        assert approx == pytest.approx(params_m, rel=0.06), (cfg, approx)


def test_fused_gate_rejects_wide_models():
    """Widths the kernel's VMEM budget isn't tuned for fall back to XLA."""
    for cfg in (G.GPT2Config.gpt2_medium(), G.GPT2Config.gpt2_large(),
                G.GPT2Config.gpt2_xl()):
        assert not DS.fused_greedy_enabled(cfg, BF16, True)
    assert DS.fused_greedy_enabled(G.GPT2Config.gpt2_124m(), BF16, True)
    assert DS.fused_greedy_enabled(G.GPT2Config.tiny(), F32, True)


def test_wide_model_decodes_on_xla_path():
    """A 1024-wide (medium-width, depth-reduced) model: generate() must route
    around the fused kernel and match the uncached full-re-forward oracle."""
    gcfg = G.GPT2Config(
        vocab_size=211, n_positions=96, n_embd=1024, n_layer=2, n_head=16
    )
    mcfg = M.MLPMappingConfig(embed_dim=24, gpt_dim=1024, prefix_length=3)
    ccfg = C.CaptionerConfig(gpt2=gcfg, mapping=mcfg, eos_token_id=200)
    trainable, frozen = C.init_params(jax.random.PRNGKey(0), ccfg)
    emb = jnp.asarray(
        np.random.default_rng(3).normal(size=(2, 24)).astype(np.float32)
    )
    max_length = 6
    got = np.asarray(
        C.generate(
            trainable, frozen, ccfg, emb,
            max_length=max_length, temperature=0.0, top_p=0.9,
            use_pallas_decode=None,
        )
    )

    # uncached oracle: full re-forward each step over growing embeddings
    gpt_params = frozen["gpt"]
    prefix = M.mlp(trainable["mapping"], mcfg, emb)
    cur = prefix
    toks = []
    finished = np.zeros(2, dtype=bool)
    for _ in range(max_length):
        logits = G.forward(gpt_params, gcfg, cur)[:, -1, :]
        nxt = np.asarray(jnp.argmax(logits, axis=-1))
        finished |= nxt == 200
        nxt = np.where(finished, 200, nxt)
        toks.append(nxt)
        cur = jnp.concatenate(
            [cur, G.embed_tokens(gpt_params, jnp.asarray(nxt)[:, None])], axis=1
        )
    want = np.stack(toks, axis=1)
    np.testing.assert_array_equal(got, want)
