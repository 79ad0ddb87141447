"""System-level training parity: ONE full optimizer step (forward, backward,
global-norm clip, AdamW with HF warmup schedule) on identical weights and an
identical batch must produce the same updated parameters as the PyTorch
composition the reference trains (src/train.py:94-159 + src/models.py forward).
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

import jax
import jax.numpy as jnp

from gpt2_image_captioning_tpu.core.mesh import MeshSpec, create_mesh
from gpt2_image_captioning_tpu.models import captioner as C
from gpt2_image_captioning_tpu.models import gpt2 as G
from gpt2_image_captioning_tpu.models import mapping as M
from gpt2_image_captioning_tpu.models.porting import port_gpt2, port_mlp_mapping
from gpt2_image_captioning_tpu.train import optim
from gpt2_image_captioning_tpu.train.loop import make_train_step

VOCAB, EMBD, LAYERS, HEADS = 101, 32, 2, 4
PFX, EDIM = 3, 12
LR, WARMUP, TOTAL = 1e-3, 2, 10


class TorchCaptioner(torch.nn.Module):
    """The reference's model composition (mapper + frozen GPT-2 prefix LM)."""

    def __init__(self):
        super().__init__()
        self.gpt = transformers.GPT2LMHeadModel(
            transformers.GPT2Config(
                vocab_size=VOCAB, n_positions=64, n_embd=EMBD, n_layer=LAYERS,
                n_head=HEADS, attn_pdrop=0.0, embd_pdrop=0.0, resid_pdrop=0.0,
            )
        )
        for p in self.gpt.parameters():
            p.requires_grad = False
        hid = (PFX * EMBD) // 2
        self.mapping_network = torch.nn.Sequential(
            torch.nn.Linear(EDIM, hid), torch.nn.Tanh(), torch.nn.Linear(hid, PFX * EMBD)
        )

    def forward(self, token_ids, image_embeddings, attention_mask, labels):
        cap = self.gpt.transformer.wte(token_ids)
        prefix = self.mapping_network(image_embeddings).view(-1, PFX, EMBD)
        inputs = torch.cat((prefix, cap), dim=1)
        dummy = torch.full((labels.shape[0], PFX), -100, dtype=torch.long)
        lab = torch.cat((dummy, labels), dim=1)
        am = torch.cat(
            (torch.ones((attention_mask.shape[0], PFX), dtype=attention_mask.dtype),
             attention_mask), dim=1)
        return self.gpt(inputs_embeds=inputs, labels=lab, attention_mask=am).loss


def test_one_optimizer_step_matches_torch():
    torch.manual_seed(0)
    tm = TorchCaptioner().eval()

    rng = np.random.default_rng(0)
    b, L = 4, 9
    token_ids = rng.integers(0, VOCAB - 1, size=(b, L))
    mask = np.ones((b, L), np.int64)
    mask[0, 6:] = 0
    labels = token_ids.copy()
    labels[mask == 0] = -100
    emb = rng.normal(size=(b, EDIM)).astype(np.float32)

    # --- torch: reference training step (src/train.py:94-159) -------------
    opt = torch.optim.AdamW(
        [p for p in tm.parameters() if p.requires_grad], lr=LR, weight_decay=0.01
    )
    sched = transformers.get_linear_schedule_with_warmup(opt, WARMUP, TOTAL)
    loss = tm(
        torch.from_numpy(token_ids), torch.from_numpy(emb),
        torch.from_numpy(mask), torch.from_numpy(labels),
    )
    loss.backward()
    torch.nn.utils.clip_grad_norm_(tm.parameters(), max_norm=1.0)
    opt.step()
    sched.step()
    torch_loss = float(loss)
    torch_fc1 = tm.mapping_network[0].weight.detach().numpy().copy()
    torch_fc2 = tm.mapping_network[2].weight.detach().numpy().copy()

    # --- ours: the jitted sharded step on the SAME initial weights ---------
    torch.manual_seed(0)
    tm0 = TorchCaptioner()  # re-create pristine weights
    gcfg = G.GPT2Config(vocab_size=VOCAB, n_positions=64, n_embd=EMBD,
                        n_layer=LAYERS, n_head=HEADS)
    mcfg = M.MLPMappingConfig(prefix_length=PFX, embed_dim=EDIM, gpt_dim=EMBD)
    ccfg = C.CaptionerConfig(gpt2=gcfg, mapping=mcfg, eos_token_id=VOCAB - 1)
    trainable = {
        "mapping": port_mlp_mapping(
            {f"model.{k}": v for k, v in tm0.mapping_network.state_dict().items()}, mcfg
        )
    }
    frozen = {"gpt": port_gpt2(tm0.gpt.state_dict(), gcfg)}

    mesh = create_mesh(MeshSpec(dp=2, tp=1), devices=jax.devices()[:2])
    opt_cfg = optim.AdamWConfig(
        learning_rate=LR, num_warmup_steps=WARMUP, num_training_steps=TOTAL
    )
    from gpt2_image_captioning_tpu.core.precision import F32

    step, (tr_sh, fr_sh, opt_sh, b_sh) = make_train_step(ccfg, opt_cfg, mesh, F32)
    batch = {
        "token_ids": token_ids.astype(np.int32),
        "labels": labels.astype(np.int32),
        "attention_mask": mask.astype(np.int32),
        "image_embedding": emb,
    }
    tr = jax.device_put(trainable, tr_sh)
    fz = jax.device_put(frozen, fr_sh)
    o = jax.device_put(optim.init(trainable), opt_sh)
    new_tr, _, jloss, _ = step(tr, o, fz, jax.device_put(batch, b_sh), {})

    assert float(jloss) == pytest.approx(torch_loss, abs=2e-4)
    np.testing.assert_allclose(
        np.asarray(new_tr["mapping"]["fc1"]["w"]).T, torch_fc1, atol=2e-5,
        err_msg="fc1 after one AdamW step",
    )
    np.testing.assert_allclose(
        np.asarray(new_tr["mapping"]["fc2"]["w"]).T, torch_fc2, atol=2e-5,
        err_msg="fc2 after one AdamW step",
    )


def test_remat_identical_loss_and_grads():
    """Per-layer jax.checkpoint (cfg.remat) changes memory, not math: loss
    and gradients (including GPT weight grads, unfrozen) match bit-for-bit
    tolerance with the non-remat forward."""
    import dataclasses

    import jax
    import jax.numpy as jnp
    import numpy as np

    from gpt2_image_captioning_tpu.models import captioner as C
    from gpt2_image_captioning_tpu.models import gpt2 as G
    from gpt2_image_captioning_tpu.models import mapping as M

    gcfg = G.GPT2Config(vocab_size=211, n_positions=32, n_embd=32, n_layer=3, n_head=4)
    mcfg = M.MLPMappingConfig(prefix_length=2, embed_dim=16, gpt_dim=32)
    base = C.CaptionerConfig(
        gpt2=gcfg, mapping=mcfg, eos_token_id=210, freeze_gpt_weights=False
    )
    trainable, frozen = C.init_params(jax.random.PRNGKey(0), base)
    rng = np.random.default_rng(3)
    batch = {
        "token_ids": jnp.asarray(rng.integers(0, 211, (4, 9)).astype(np.int32)),
        "labels": jnp.asarray(rng.integers(0, 211, (4, 9)).astype(np.int32)),
        "attention_mask": jnp.asarray(np.ones((4, 9), np.int32)),
        "image_embedding": jnp.asarray(rng.normal(size=(4, 16)).astype(np.float32)),
    }

    def mean_loss_for(cfg):
        return jax.value_and_grad(
            lambda tr: C.mean_loss(tr, frozen, cfg, batch)
        )(trainable)

    loss0, g0 = mean_loss_for(base)
    loss1, g1 = mean_loss_for(dataclasses.replace(base, remat=True))
    np.testing.assert_allclose(float(loss0), float(loss1), rtol=1e-6)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-5, rtol=1e-5
        ),
        g0, g1,
    )
