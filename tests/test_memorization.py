"""End-to-end learning check: a small captioner trained on a few (image,
caption) pairs must reproduce the training captions verbatim at decode time
— the whole loop (data → loss → optimizer → KV-cached decode → detokenize)
demonstrably learns, not just runs."""

import json

import numpy as np
import pytest

import jax

from gpt2_image_captioning_tpu.core.mesh import MeshSpec, create_mesh
from gpt2_image_captioning_tpu.data.dataset import CocoDataset
from gpt2_image_captioning_tpu.data.embeddings_io import save_embeddings
from gpt2_image_captioning_tpu.models import captioner as C
from gpt2_image_captioning_tpu.models import gpt2 as G
from gpt2_image_captioning_tpu.models import mapping as M
from gpt2_image_captioning_tpu.train.loop import train

from helpers import tiny_tokenizer


@pytest.mark.slow
def test_tiny_model_memorizes_captions(tmp_path):
    tok = tiny_tokenizer()
    rng = np.random.default_rng(0)
    captions = ["the cat", "a dog", "the dog on a cat", "a cat on the dog"]
    ids = list(range(100, 104))
    names = [f"COCO_val2017_{i:012d}.jpg" for i in ids]
    # well-separated embeddings so the mapper can address each caption
    emb = np.eye(4, 8, dtype=np.float32) * 2.0 + rng.normal(0, 0.01, size=(4, 8)).astype(np.float32)
    emb_path = str(tmp_path / "e.pt")
    save_embeddings(emb_path, names, emb)
    ann = {
        "images": [{"id": i} for i in ids],
        "annotations": [
            {"image_id": i, "id": k, "caption": c} for k, (i, c) in enumerate(zip(ids, captions))
        ],
    }
    ann_path = tmp_path / "ann.json"
    ann_path.write_text(json.dumps(ann))
    ds = CocoDataset(emb_path, str(ann_path), tokenizer=tok, max_length=10)

    gcfg = G.GPT2Config(vocab_size=tok.vocab_size, n_positions=32, n_embd=64, n_layer=2, n_head=4)
    mcfg = M.MLPMappingConfig(prefix_length=4, embed_dim=8, gpt_dim=64)
    ccfg = C.CaptionerConfig(
        gpt2=gcfg, mapping=mcfg, eos_token_id=tok.eos_token_id,
        freeze_gpt_weights=False,  # tiny random GPT-2 must learn the language too
    )
    model = C.ImageCaptioningModel(ccfg, tokenizer=tok, rng=jax.random.PRNGKey(0))

    mesh = create_mesh(MeshSpec(dp=1, tp=1), devices=jax.devices()[:1])
    hist = train(
        ds, model, batch_size=4, num_epochs=150, learning_rate=3e-3,
        save_every_epoch=1000, outputs_dir=str(tmp_path / "ck"), mesh=mesh,
        log_dir=str(tmp_path / "logs"),
    )
    assert hist["epoch_losses"][-1] < 0.15, f"did not converge: {hist['epoch_losses'][-3:]}"

    generated = model.generate_captions(emb, max_length=10, temperature=0.0, top_p=1.0)
    assert generated == captions, f"memorization failed: {generated} vs {captions}"

    # beam search must reproduce them too
    import numpy as _np

    beam_ids = C.beam_generate(
        model.trainable, model.frozen, ccfg, emb, max_length=10, beam_size=3
    )
    beam_caps = tok.batch_decode(_np.asarray(beam_ids), skip_special_tokens=True)
    assert beam_caps == captions, f"beam decode diverged: {beam_caps}"

    # int8 W8A8 quantized decode on the TRAINED model: random-init logits
    # are quantization's adversarial case (near-flat → easy flips), but a
    # trained model's confident logits must survive int8 verbatim — the
    # accuracy claim behind the serving mode
    from jax.experimental.pallas import tpu as pltpu

    with pltpu.force_tpu_interpret_mode():
        int8_ids = C.generate(
            model.trainable, model.frozen, ccfg, jax.numpy.asarray(emb),
            max_length=10, temperature=0.0, top_p=1.0,
            use_pallas_decode=True, decode_quant=True,
        )
    int8_caps = tok.batch_decode(_np.asarray(int8_ids), skip_special_tokens=True)
    assert int8_caps == captions, f"int8 decode diverged: {int8_caps}"
