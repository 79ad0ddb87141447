"""ctypes binding for the first-party C++ vector index (native/hnsw).

Two index types matching the reference's FAISS usage
(``src/database/faiss_indexing.py:61-77``):

- :class:`HNSWIndex` — approximate, inner-product HNSW
  (M / ef_construction / ef_search with the reference's defaults 32/200/64),
- :class:`FlatIPIndex` — exact scan (``IndexFlatIP`` equivalent).

Both support ``add`` / ``search`` / ``reconstruct`` / ``save`` / ``load``.
The shared library builds with ``make -C native``.
"""

from __future__ import annotations

import ctypes
import os

import numpy as np

_LIB_PATHS = [
    os.path.join(os.path.dirname(__file__), "..", "..", "native", "build", "libhnsw.so"),
    os.environ.get("GIC_HNSW_LIB", ""),
]


def _load_lib() -> ctypes.CDLL:
    for p in _LIB_PATHS:
        if p and os.path.exists(p):
            lib = ctypes.CDLL(os.path.abspath(p))
            _declare(lib)
            return lib
    raise FileNotFoundError(
        "libhnsw.so not built — run `make -C native` at the repo root."
    )


def _declare(lib: ctypes.CDLL) -> None:
    c = ctypes
    lib.hnsw_create.restype = c.c_void_p
    lib.hnsw_create.argtypes = [c.c_int, c.c_int, c.c_int, c.c_int, c.c_uint64]
    lib.hnsw_free.argtypes = [c.c_void_p]
    lib.hnsw_add.argtypes = [c.c_void_p, c.POINTER(c.c_float), c.c_int64]
    lib.hnsw_size.restype = c.c_int64
    lib.hnsw_size.argtypes = [c.c_void_p]
    lib.hnsw_set_ef.argtypes = [c.c_void_p, c.c_int]
    lib.hnsw_search.argtypes = [
        c.c_void_p, c.POINTER(c.c_float), c.c_int64, c.c_int,
        c.POINTER(c.c_float), c.POINTER(c.c_int64), c.c_int,
    ]
    lib.hnsw_reconstruct.argtypes = [c.c_void_p, c.c_int64, c.POINTER(c.c_float)]
    lib.hnsw_save.restype = c.c_int
    lib.hnsw_save.argtypes = [c.c_void_p, c.c_char_p]
    lib.hnsw_load.restype = c.c_void_p
    lib.hnsw_load.argtypes = [c.c_char_p]
    lib.flat_create.restype = c.c_void_p
    lib.flat_create.argtypes = [c.c_int]
    lib.flat_free.argtypes = [c.c_void_p]
    lib.flat_add.argtypes = [c.c_void_p, c.POINTER(c.c_float), c.c_int64]
    lib.flat_size.restype = c.c_int64
    lib.flat_size.argtypes = [c.c_void_p]
    lib.flat_search.argtypes = lib.hnsw_search.argtypes
    lib.flat_reconstruct.argtypes = lib.hnsw_reconstruct.argtypes
    lib.flat_save.restype = c.c_int
    lib.flat_save.argtypes = [c.c_void_p, c.c_char_p]
    lib.flat_load.restype = c.c_void_p
    lib.flat_load.argtypes = [c.c_char_p]


_lib: ctypes.CDLL | None = None


def lib() -> ctypes.CDLL:
    global _lib
    if _lib is None:
        _lib = _load_lib()
    return _lib


def available() -> bool:
    try:
        lib()
        return True
    except FileNotFoundError:
        return False


def _fptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def _iptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int64))


class _BaseIndex:
    _prefix = ""

    def __init__(self, dim: int, handle=None, **_):
        self.dim = dim
        self._h = handle

    def _fn(self, name: str):
        return getattr(lib(), f"{self._prefix}_{name}")

    def add(self, vecs: np.ndarray) -> None:
        vecs = np.ascontiguousarray(vecs, np.float32)
        assert vecs.ndim == 2 and vecs.shape[1] == self.dim
        self._fn("add")(self._h, _fptr(vecs), vecs.shape[0])

    def __len__(self) -> int:
        return int(self._fn("size")(self._h))

    def search(self, queries: np.ndarray, k: int, threads: int | None = None):
        """→ (scores (nq, k) float32 inner products desc, ids (nq, k) int64,
        -1 padding when the index holds fewer than k vectors)."""
        queries = np.ascontiguousarray(queries, np.float32)
        nq = queries.shape[0]
        scores = np.empty((nq, k), np.float32)
        ids = np.empty((nq, k), np.int64)
        threads = threads or min(os.cpu_count() or 1, 8)
        self._fn("search")(self._h, _fptr(queries), nq, k, _fptr(scores), _iptr(ids), threads)
        return scores, ids

    def reconstruct(self, idx: int) -> np.ndarray:
        out = np.empty((self.dim,), np.float32)
        self._fn("reconstruct")(self._h, int(idx), _fptr(out))
        return out

    def save(self, path: str) -> None:
        if self._fn("save")(self._h, path.encode()) != 0:
            raise IOError(f"failed to save index to {path}")

    def __del__(self):
        if getattr(self, "_h", None):
            try:
                self._fn("free")(self._h)
            except Exception:
                pass
            self._h = None


class HNSWIndex(_BaseIndex):
    """Approximate inner-product index (HNSW), FAISS ``IndexHNSWFlat`` role."""

    _prefix = "hnsw"

    def __init__(
        self,
        dim: int,
        M: int = 32,
        ef_construction: int = 200,
        ef_search: int = 64,
        seed: int = 42,
        handle=None,
    ):
        super().__init__(dim)
        self._h = handle or lib().hnsw_create(dim, M, ef_construction, ef_search, seed)

    def set_ef(self, ef: int) -> None:
        lib().hnsw_set_ef(self._h, ef)

    @classmethod
    def load(cls, path: str, dim: int) -> "HNSWIndex":
        h = lib().hnsw_load(path.encode())
        if not h:
            raise IOError(f"failed to load HNSW index from {path}")
        return cls(dim, handle=h)


class FlatIPIndex(_BaseIndex):
    """Exact inner-product scan, FAISS ``IndexFlatIP`` role."""

    _prefix = "flat"

    def __init__(self, dim: int, handle=None):
        super().__init__(dim)
        self._h = handle or lib().flat_create(dim)

    @classmethod
    def load(cls, path: str, dim: int) -> "FlatIPIndex":
        h = lib().flat_load(path.encode())
        if not h:
            raise IOError(f"failed to load flat index from {path}")
        return cls(dim, handle=h)
