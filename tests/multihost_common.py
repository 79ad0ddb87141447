"""Shared model/ingest helpers for the true 2-process multihost test.

Used by both the pytest process (single-process reference run) and the
spawned ``multihost_worker.py`` processes, so the two runs are guaranteed to
construct identical models and move host data onto the mesh the same way.
"""

from __future__ import annotations

import jax

from gpt2_image_captioning_tpu.models import captioner as C
from gpt2_image_captioning_tpu.models import gpt2 as G
from gpt2_image_captioning_tpu.models import mapping as M


def make_model():
    """Tiny captioner, deterministic across processes (fixed PRNG seed)."""
    from helpers import tiny_tokenizer

    tok = tiny_tokenizer()
    gcfg = G.GPT2Config(
        vocab_size=len(tok.encoder), n_positions=32, n_embd=16, n_layer=2, n_head=2
    )
    mcfg = M.MLPMappingConfig(prefix_length=2, embed_dim=16, gpt_dim=16)
    ccfg = C.CaptionerConfig(
        gpt2=gcfg, mapping=mcfg, eos_token_id=len(tok.encoder) - 1
    )
    return C.ImageCaptioningModel(ccfg, tokenizer=tok, rng=jax.random.PRNGKey(0))


def put_tree(tree, shardings):
    """Host pytree → global jax.Arrays under ``shardings``.

    ``make_array_from_callback`` works identically in single- and
    multi-process mode when every process holds the full host value (params,
    optimizer state) — each process serves exactly the index slices its
    addressable devices need.
    """
    import numpy as np

    if shardings is None or not jax.tree.leaves(tree):
        return tree
    return jax.tree.map(
        lambda x, s: jax.make_array_from_callback(
            np.shape(x), s, lambda idx, _x=x: np.asarray(_x)[idx]
        ),
        tree,
        shardings,
    )
