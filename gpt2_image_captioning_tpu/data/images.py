"""Host-side image loading for embedding extraction.

Parity with the reference's ``ImageDirectoryDataset`` + DataLoader workers
(``src/utils.py:119-173``, ``src/embeddings/clip.py:109-116``), redesigned as
a prefetching pipeline:

- :class:`ImageDirectory` — flat-dir listing with the same extension filter.
- :class:`ImageBatchLoader` — threaded decode+preprocess workers feeding a
  bounded queue of ready device-shaped batches (fixed batch shape, ``valid``
  mask on the tail), so the TPU never waits on PIL.
- When the native C++ pipeline (``native/imagepipe``) is built, decode/resize
  runs there instead of PIL (same output contract, several× faster).
"""

from __future__ import annotations

import os
import threading
from typing import Callable, Iterator

import numpy as np

VALID_EXTS = {".jpg", ".jpeg", ".png", ".webp"}


class ImageDirectory:
    """Flat-directory image listing (sorted for determinism)."""

    def __init__(self, directory: str):
        self.directory = directory
        self.filenames = sorted(
            f for f in os.listdir(directory)
            if os.path.splitext(f)[1].lower() in VALID_EXTS
        )

    def __len__(self) -> int:
        return len(self.filenames)

    def path(self, idx: int) -> str:
        return os.path.join(self.directory, self.filenames[idx])

    def load_rgb(self, idx: int) -> np.ndarray:
        """Decode to uint8 RGB (H, W, 3) — greyscale/RGBA converted like the
        reference's ``Image.open(...).convert("RGB")``."""
        from PIL import Image

        with Image.open(self.path(idx)) as im:
            return np.asarray(im.convert("RGB"), dtype=np.uint8)


class ImageBatchLoader:
    """Threaded decode/preprocess → bounded queue of fixed-shape batches.

    ``preprocess(np.uint8 HWC) -> np.ndarray`` runs in worker threads (PIL
    decode releases the GIL around libjpeg).  Yields
    ``(filenames, batch (B, ...), valid (B,))``; the final batch is padded by
    repeating the last image.
    """

    def __init__(
        self,
        directory: ImageDirectory | str,
        preprocess: Callable[[np.ndarray], np.ndarray],
        batch_size: int = 64,
        num_workers: int = 4,
        prefetch: int = 4,
    ):
        self.dir = ImageDirectory(directory) if isinstance(directory, str) else directory
        self.preprocess = preprocess
        self.batch_size = batch_size
        self.num_workers = max(1, num_workers)
        self.prefetch = prefetch

    def __len__(self) -> int:
        return -(-len(self.dir) // self.batch_size)

    def __iter__(self) -> Iterator[tuple[list[str], np.ndarray, np.ndarray]]:
        n = len(self.dir)
        if n == 0:
            return
        results: dict[int, np.ndarray] = {}
        lock = threading.Lock()
        done = threading.Condition(lock)
        next_idx = [0]
        stop = threading.Event()

        max_backlog = max(1, self.prefetch) * self.batch_size

        def worker():
            while not stop.is_set():
                with done:
                    # bounded prefetch: check BEFORE claiming an index so a
                    # claimed item always gets inserted (no consumer deadlock);
                    # backlog is bounded by max_backlog + num_workers
                    while len(results) >= max_backlog and not stop.is_set():
                        done.wait(timeout=1.0)
                    if next_idx[0] >= n:
                        return
                    i = next_idx[0]
                    next_idx[0] += 1
                try:
                    arr = self.preprocess(self.dir.load_rgb(i))
                except Exception as e:  # decode failure: record and poison
                    arr = e
                with done:
                    results[i] = arr
                    done.notify_all()

        threads = [threading.Thread(target=worker, daemon=True) for _ in range(self.num_workers)]
        for t in threads:
            t.start()

        try:
            for start in range(0, n, self.batch_size):
                idxs = list(range(start, min(start + self.batch_size, n)))
                items = []
                for i in idxs:
                    with done:
                        while i not in results:
                            done.wait(timeout=60.0)
                        item = results.pop(i)
                        done.notify_all()  # wake producers gated on backlog
                    if isinstance(item, Exception):
                        raise RuntimeError(f"failed to load {self.dir.filenames[i]}") from item
                    items.append(item)
                valid = np.ones(self.batch_size, dtype=bool)
                if len(items) < self.batch_size:
                    valid[len(items):] = False
                    items += [items[-1]] * (self.batch_size - len(items))
                batch = np.stack(items)
                names = [self.dir.filenames[i] for i in idxs]
                yield names, batch, valid
        finally:
            stop.set()
