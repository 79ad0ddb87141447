"""ctypes binding for the native image pipeline (native/imagepipe).

Fused JPEG decode → antialiased resize → center-crop in C++ (libjpeg +
PIL-style separable resampling), threaded over batches — the host stage that
keeps the TPU fed during embedding extraction (the reference does this with
PIL inside DataLoader workers, ``src/utils.py:142-155``).

Falls back transparently to the PIL path when the library isn't built
(``make -C native``) or for non-JPEG files.
"""

from __future__ import annotations

import ctypes
import os

import numpy as np

from gpt2_image_captioning_tpu.embeddings.preprocess import PreprocessSpec

_LIB_PATHS = [
    os.path.join(os.path.dirname(__file__), "..", "..", "native", "build", "libimagepipe.so"),
    os.environ.get("GIC_IMAGEPIPE_LIB", ""),
]

_lib: ctypes.CDLL | None = None


def lib() -> ctypes.CDLL:
    global _lib
    if _lib is None:
        for p in _LIB_PATHS:
            if p and os.path.exists(p):
                l = ctypes.CDLL(os.path.abspath(p))
                l.imagepipe_process_one.restype = ctypes.c_int
                l.imagepipe_process_one.argtypes = [
                    ctypes.c_char_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
                    ctypes.c_int, ctypes.POINTER(ctypes.c_uint8),
                ]
                l.imagepipe_process_batch.restype = ctypes.c_int
                l.imagepipe_process_batch.argtypes = [
                    ctypes.POINTER(ctypes.c_char_p), ctypes.c_int64, ctypes.c_int,
                    ctypes.c_int, ctypes.c_int, ctypes.c_int,
                    ctypes.POINTER(ctypes.c_uint8), ctypes.c_int,
                ]
                _lib = l
                break
        else:
            raise FileNotFoundError(
                "libimagepipe.so not built — run `make -C native` at the repo root."
            )
    return _lib


def available() -> bool:
    try:
        lib()
        return True
    except FileNotFoundError:
        return False


def _final_size(spec: PreprocessSpec) -> int:
    return spec.crop if (spec.resize_shortest and spec.crop) else spec.resize


def process_one(path: str, spec: PreprocessSpec) -> np.ndarray:
    """One JPEG → uint8 (S, S, 3) per the preprocessing spec."""
    s = _final_size(spec)
    out = np.empty((s, s, 3), np.uint8)
    rc = lib().imagepipe_process_one(
        path.encode(),
        spec.resize,
        spec.crop or 0,
        1 if spec.interpolation == "bicubic" else 0,
        1 if spec.resize_shortest else 0,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
    )
    if rc != 0:
        raise RuntimeError(f"imagepipe failed to process {path}")
    return out


def process_batch(paths: list[str], spec: PreprocessSpec, threads: int = 4) -> np.ndarray:
    """Batch of JPEGs → uint8 (N, S, S, 3), decoded/resized in C++ threads."""
    s = _final_size(spec)
    n = len(paths)
    out = np.empty((n, s, s, 3), np.uint8)
    arr = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
    rc = lib().imagepipe_process_batch(
        arr,
        n,
        spec.resize,
        spec.crop or 0,
        1 if spec.interpolation == "bicubic" else 0,
        1 if spec.resize_shortest else 0,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        threads,
    )
    if rc != 0:
        raise RuntimeError(f"imagepipe failed on {paths[rc - 1]}")
    return out


class NativeImageBatchLoader:
    """Drop-in for ImageBatchLoader backed by the C++ pipeline: yields
    ``(filenames, batch_u8 (B, S, S, 3), valid)`` with fixed batch shapes.
    Non-JPEG files fall back to PIL per image."""

    def __init__(self, directory: str, spec: PreprocessSpec, batch_size: int = 64,
                 num_workers: int = 4):
        from gpt2_image_captioning_tpu.data.images import ImageDirectory

        self.dir = ImageDirectory(directory)
        self.spec = spec
        self.batch_size = batch_size
        self.num_workers = num_workers

    def __len__(self) -> int:
        return -(-len(self.dir) // self.batch_size)

    def __iter__(self):
        from gpt2_image_captioning_tpu.embeddings.preprocess import resize_and_crop

        names = self.dir.filenames
        s = _final_size(self.spec)
        for start in range(0, len(names), self.batch_size):
            chunk = names[start : start + self.batch_size]
            paths = [self.dir.path(start + i) for i in range(len(chunk))]
            jpegs = [p.lower().endswith((".jpg", ".jpeg")) for p in paths]
            if all(jpegs):
                batch = process_batch(paths, self.spec, threads=self.num_workers)
            else:
                rows = []
                for i, (p, is_jpeg) in enumerate(zip(paths, jpegs)):
                    if is_jpeg:
                        rows.append(process_one(p, self.spec))
                    else:
                        rows.append(resize_and_crop(self.dir.load_rgb(start + i), self.spec))
                batch = np.stack(rows)
            valid = np.ones(self.batch_size, dtype=bool)
            if len(chunk) < self.batch_size:
                valid[len(chunk):] = False
                batch = np.concatenate(
                    [batch, np.repeat(batch[-1:], self.batch_size - len(chunk), axis=0)]
                )
            yield chunk, batch, valid
