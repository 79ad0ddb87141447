"""Mapping networks vs the reference's torch modules (random-init, ported)."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax.numpy as jnp

from gpt2_image_captioning_tpu.models import mapping as M
from gpt2_image_captioning_tpu.models.porting import (
    export_mlp_mapping,
    export_transformer_mapping,
    port_mlp_mapping,
    port_transformer_mapping,
)


def _torch_mlp(prefix_length, embed_dim, gpt_dim):
    out_dim = prefix_length * gpt_dim
    hidden = out_dim // 2
    return torch.nn.Sequential(
        torch.nn.Linear(embed_dim, hidden),
        torch.nn.Tanh(),
        torch.nn.Linear(hidden, out_dim),
    )


class _TorchTransformerMapper(torch.nn.Module):
    """Reference-equivalent transformer mapper (src/models.py:77-174 semantics)."""

    def __init__(self, embed_dim, gpt_dim, prefix_length, hidden_length, num_layers):
        super().__init__()
        self.hidden_length = hidden_length
        self.gpt_dim = gpt_dim
        self.linear = torch.nn.Linear(embed_dim, hidden_length * gpt_dim)
        self.prefix_const = torch.nn.Parameter(torch.randn(prefix_length, gpt_dim))
        layer = torch.nn.TransformerEncoderLayer(
            d_model=gpt_dim,
            nhead=8,
            dim_feedforward=gpt_dim * 4,
            batch_first=True,
            activation="relu",
            norm_first=True,
            dropout=0.0,
        )
        self.transformer = torch.nn.TransformerEncoder(layer, num_layers=num_layers)

    def forward(self, x):
        b = x.shape[0]
        t = self.linear(x).view(b, self.hidden_length, self.gpt_dim)
        p = self.prefix_const.unsqueeze(0).expand(b, -1, -1)
        out = self.transformer(torch.cat((t, p), dim=1))
        return out[:, self.hidden_length :, :]


def test_mlp_mapper_matches_torch():
    torch.manual_seed(0)
    cfg = M.MLPMappingConfig(prefix_length=4, embed_dim=16, gpt_dim=8)
    tm = _torch_mlp(4, 16, 8)
    sd = {f"model.{k}": v for k, v in tm.state_dict().items()}
    params = port_mlp_mapping(sd, cfg)
    x = np.random.default_rng(0).normal(size=(3, 16)).astype(np.float32)
    with torch.no_grad():
        ref = tm(torch.from_numpy(x)).view(3, 4, 8).numpy()
    ours = np.asarray(M.mlp(params, cfg, jnp.asarray(x)))
    np.testing.assert_allclose(ours, ref, atol=1e-5, rtol=1e-5)
    # export roundtrip
    back = export_mlp_mapping(params, prefix="model.")[f"model.model.0.weight"]
    np.testing.assert_allclose(back, tm[0].weight.detach().numpy(), atol=0)


def test_transformer_mapper_matches_torch():
    torch.manual_seed(1)
    cfg = M.TransformerMappingConfig(
        embed_dim=16, gpt_dim=24, prefix_length=5, hidden_length=3, num_layers=2, num_heads=8
    )
    tm = _TorchTransformerMapper(16, 24, 5, 3, 2)
    tm.eval()
    params = port_transformer_mapping(tm.state_dict(), cfg)
    x = np.random.default_rng(1).normal(size=(2, 16)).astype(np.float32)
    with torch.no_grad():
        ref = tm(torch.from_numpy(x)).numpy()
    ours = np.asarray(M.transformer(params, cfg, jnp.asarray(x)))
    assert ours.shape == (2, 5, 24)
    np.testing.assert_allclose(ours, ref, atol=2e-5, rtol=2e-5)


def test_transformer_mapper_export_roundtrip():
    torch.manual_seed(2)
    cfg = M.TransformerMappingConfig(
        embed_dim=8, gpt_dim=16, prefix_length=2, hidden_length=2, num_layers=1, num_heads=8
    )
    tm = _TorchTransformerMapper(8, 16, 2, 2, 1)
    params = port_transformer_mapping(tm.state_dict(), cfg)
    sd = export_transformer_mapping(params, prefix="")
    for k, v in tm.state_dict().items():
        np.testing.assert_allclose(sd[k], v.numpy(), atol=0, err_msg=k)


def test_make_mapping_config():
    c = M.make_mapping_config(
        {"type": "transformer", "embed_dim": 512, "gpt_dim": 768, "prefix_length": 15, "hidden_length": 10}
    )
    assert isinstance(c, M.TransformerMappingConfig) and c.prefix_length == 15
    c2 = M.make_mapping_config(
        {"type": "mlp", "embed_dim": 512, "gpt_dim": 768, "prefix_length": 10, "hidden_length": 0}
    )
    assert isinstance(c2, M.MLPMappingConfig)
    with pytest.raises(ValueError):
        M.make_mapping_config({"type": "nope"})
