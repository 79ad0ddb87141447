"""Checkpointing with reference-interchange support.

Two on-disk formats, chosen by extension:

- ``.npz`` — native: flattened pytree paths → arrays, fast and torch-free.
- ``.pt`` — the reference's torch format with the reference's parameter
  names (``mapping_network.*``, ``task_prefix_embeds``, ``gpt.*``), so
  checkpoints flow **both directions** between this framework and the PyTorch
  reference (``src/models.py:489-547``).

Both store exactly the trainable pytree (frozen GPT-2 weights are excluded,
same semantics as the reference's ``save_parameters``).  Loading applies the
reference's validation: unexpected keys are an error; missing keys are only
tolerated for frozen ``gpt.*`` weights.
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
import numpy as np

from gpt2_image_captioning_tpu.core.tree import flatten_with_paths, unflatten_from_paths
from gpt2_image_captioning_tpu.models import porting
from gpt2_image_captioning_tpu.models.mapping import MLPMappingConfig


# ---------------------------------------------------------------------------
# Generic pytree <-> npz
# ---------------------------------------------------------------------------

def save_pytree(path: str, tree: Any) -> None:
    flat = {k: np.asarray(v) for k, v in flatten_with_paths(tree).items()}
    np.savez(path, **flat)


def load_pytree(path: str) -> Any:
    data = np.load(path, allow_pickle=False)
    return unflatten_from_paths({k: jnp.asarray(data[k]) for k in data.files})


# ---------------------------------------------------------------------------
# Captioner checkpoints (trainable-only, reference-compatible)
# ---------------------------------------------------------------------------

def _to_reference_state_dict(trainable: dict, cfg) -> dict[str, np.ndarray]:
    sd: dict[str, np.ndarray] = {}
    if isinstance(cfg.mapping, MLPMappingConfig):
        sd.update(porting.export_mlp_mapping(trainable["mapping"]))
    else:
        sd.update(porting.export_transformer_mapping(trainable["mapping"]))
    if "task_prefix" in trainable:
        sd["task_prefix_embeds"] = np.asarray(trainable["task_prefix"])
    if "gpt" in trainable:
        for k, v in porting.export_gpt2(trainable["gpt"]).items():
            if k == "lm_head.weight":
                continue  # tied; the reference's filtered save keeps gpt.* only
            sd[f"gpt.{k}"] = v
        sd["gpt.lm_head.weight"] = np.asarray(trainable["gpt"]["wte"])
    return sd


def _from_reference_state_dict(sd: dict, trainable: dict, cfg) -> dict:
    """Reference-named state_dict → trainable pytree shaped like ``trainable``."""
    known_prefixes = ("mapping_network.", "task_prefix_embeds", "gpt.")
    unexpected = [k for k in sd if not k.startswith(known_prefixes)]
    if unexpected:
        raise ValueError(f"Unexpected keys found in the checkpoint: {unexpected}")

    out = dict(trainable)
    if isinstance(cfg.mapping, MLPMappingConfig):
        out["mapping"] = porting.port_mlp_mapping(sd, cfg.mapping)
    else:
        out["mapping"] = porting.port_transformer_mapping(sd, cfg.mapping)
    if "task_prefix" in trainable:
        if "task_prefix_embeds" not in sd:
            raise ValueError("Missing keys found in the checkpoint: ['task_prefix_embeds']")
        out["task_prefix"] = jnp.asarray(np.asarray(sd["task_prefix_embeds"], dtype=np.float32)
                                         if not hasattr(sd["task_prefix_embeds"], "numpy")
                                         else sd["task_prefix_embeds"].float().numpy())
    if "gpt" in trainable:
        gpt_sd = {k[len("gpt."):]: v for k, v in sd.items() if k.startswith("gpt.")}
        if not gpt_sd:
            raise ValueError(
                "Missing keys found in the checkpoint that are not from frozen GPT weights: ['gpt.*']"
            )
        out["gpt"] = porting.port_gpt2(gpt_sd, cfg.gpt2)
    return out


def save_captioner(path: str, trainable: dict, cfg) -> None:
    """Save the trainable parameters (everything except frozen GPT-2)."""
    if path.endswith(".pt"):
        import torch

        sd = {k: torch.from_numpy(np.array(v, copy=True)) for k, v in
              _to_reference_state_dict(trainable, cfg).items()}
        print(f"Saving {len(sd)} trainable parameters and buffers to {path}.")
        torch.save(sd, path)
    else:
        save_pytree(path, trainable)


def load_captioner(path: str, trainable: dict, cfg) -> dict:
    """Load a checkpoint produced by this framework (.npz) or by the PyTorch
    reference (.pt with reference naming) into the trainable pytree."""
    if path.endswith(".pt"):
        import torch

        sd = torch.load(path, map_location="cpu", weights_only=False)
        sd = {k: (v.detach().cpu().float().numpy() if hasattr(v, "detach") else v)
              for k, v in sd.items()}
        return _from_reference_state_dict(sd, trainable, cfg)
    loaded = load_pytree(path)
    # shape-validate against the current pytree
    cur = flatten_with_paths(trainable)
    new = flatten_with_paths(loaded)
    unexpected = sorted(set(new) - set(cur))
    missing = sorted(set(cur) - set(new))
    if unexpected:
        raise ValueError(f"Unexpected keys found in the checkpoint: {unexpected}")
    if missing:
        raise ValueError(f"Missing keys found in the checkpoint: {missing}")
    return loaded


# ---------------------------------------------------------------------------
# Orbax backend (optional): sharded/async-capable checkpoints for multihost
# ---------------------------------------------------------------------------

def save_pytree_orbax(directory: str, tree: Any) -> None:
    """Save a pytree with orbax (the backend for sharded multihost arrays —
    each host writes its shards; .npz requires fully-addressable arrays)."""
    import os

    import orbax.checkpoint as ocp

    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(os.path.abspath(directory), tree, force=True)


def load_pytree_orbax(directory: str, like: Any) -> Any:
    """Restore a pytree saved by :func:`save_pytree_orbax`; ``like`` provides
    the structure/shardings to restore into."""
    import os

    import jax

    import orbax.checkpoint as ocp

    with ocp.StandardCheckpointer() as ckptr:
        abstract = jax.tree.map(ocp.utils.to_shape_dtype_struct, like)
        return ckptr.restore(os.path.abspath(directory), abstract)
