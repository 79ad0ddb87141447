"""Embedding-file interchange IO.

THE interchange format of the whole stack is the reference's ``.pt`` file:
``{"filenames": list[str], "embeddings": FloatTensor(N, D)}`` (reference
``src/embeddings/clip.py:147-149``).  We keep it byte-compatible (torch
serialization, CPU tensors) so artifacts flow freely between the PyTorch
reference and this framework, and additionally support ``.npz`` (pure numpy,
no torch needed at load time) chosen by file extension.
"""

from __future__ import annotations

import numpy as np


def save_embeddings(path: str, filenames: list[str], embeddings: np.ndarray) -> None:
    embeddings = np.ascontiguousarray(embeddings, dtype=np.float32)
    if path.endswith(".npz"):
        np.savez(path, filenames=np.array(filenames, dtype=object), embeddings=embeddings)
        return
    import torch  # torch-cpu used ONLY as a serializer for .pt interchange

    torch.save(
        {"filenames": list(filenames), "embeddings": torch.from_numpy(embeddings)}, path
    )


def load_embeddings(path: str) -> tuple[list[str], np.ndarray]:
    if path.endswith(".npz"):
        data = np.load(path, allow_pickle=True)
        return list(data["filenames"]), np.asarray(data["embeddings"], dtype=np.float32)
    import torch

    data = torch.load(path, map_location="cpu", weights_only=False)
    emb = data["embeddings"]
    if hasattr(emb, "numpy"):
        emb = emb.float().numpy()
    return list(data["filenames"]), np.asarray(emb, dtype=np.float32)
