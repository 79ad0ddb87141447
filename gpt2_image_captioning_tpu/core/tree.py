"""Parameter-pytree utilities: flatten-by-path, counting, dtype casting.

Models in this framework are pure functions over nested-dict parameter
pytrees; these helpers provide the cross-cutting plumbing (checkpoint
key paths, parameter counts matching ``src/utils.py:183-194`` in the
reference, trainable/frozen partitioning).
"""

from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp
import numpy as np


def flatten_with_paths(tree: Any, sep: str = ".") -> dict[str, Any]:
    """Flatten a nested pytree into ``{"a.b.0.c": leaf}`` with stable names."""
    flat = {}
    for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        parts = []
        for p in path:
            if isinstance(p, jax.tree_util.DictKey):
                parts.append(str(p.key))
            elif isinstance(p, jax.tree_util.SequenceKey):
                parts.append(str(p.idx))
            elif isinstance(p, jax.tree_util.GetAttrKey):
                parts.append(str(p.name))
            else:
                parts.append(str(p))
        flat[sep.join(parts)] = leaf
    return flat


def unflatten_from_paths(flat: dict[str, Any], sep: str = ".") -> Any:
    """Inverse of :func:`flatten_with_paths` for dict/list pytrees."""
    root: dict = {}
    for key, leaf in flat.items():
        parts = key.split(sep)
        node = root
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = leaf

    def listify(node):
        if not isinstance(node, dict):
            return node
        keys = list(node.keys())
        if keys and all(k.isdigit() for k in keys):
            return [listify(node[str(i)]) for i in range(len(keys))]
        return {k: listify(v) for k, v in node.items()}

    return listify(root)


def count_parameters(tree: Any) -> int:
    """Total number of scalar parameters in a pytree."""
    return sum(int(np.prod(x.shape)) for x in jax.tree.leaves(tree))


def count_model_parameters(trainable: Any, frozen: Any = None) -> tuple[int, int]:
    """(trainable, total) parameter counts — reference ``src/utils.py:183-194``."""
    t = count_parameters(trainable)
    f = count_parameters(frozen) if frozen is not None else 0
    return t, t + f


def tree_cast(tree: Any, dtype) -> Any:
    return jax.tree.map(
        lambda x: x.astype(dtype) if jnp.issubdtype(x.dtype, jnp.floating) else x, tree
    )


def tree_map_with_path_names(fn: Callable[[str, Any], Any], tree: Any) -> Any:
    flat = flatten_with_paths(tree)
    return unflatten_from_paths({k: fn(k, v) for k, v in flat.items()})


def global_norm(tree: Any) -> jnp.ndarray:
    """L2 norm over all leaves (matches torch.nn.utils.clip_grad_norm_'s total)."""
    leaves = [jnp.sum(jnp.square(x.astype(jnp.float32))) for x in jax.tree.leaves(tree)]
    return jnp.sqrt(jnp.sum(jnp.stack(leaves)))
