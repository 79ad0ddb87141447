"""End-to-end image → caption serving.

The reference stops at scripts (extract embeddings to ``.pt``, then caption
from the files); a production deployment wants one object that takes images
and returns captions.  ``CaptionService`` packages the whole pipeline
TPU-first:

- **host**: JPEG decode + resize/crop (C++ imagepipe when built, PIL
  otherwise — the same geometry contracts as the extractors,
  ``embeddings/preprocess.py``),
- **device**: ONE compiled program per stage at a fixed serving batch shape
  (normalize → vision encoder → L2-norm; then mapper → fused whole-step
  GPT-2 decode, ``ops/decode_step.py``) — requests are padded up to the
  serving batch and sliced back, so no request shape ever recompiles,
- **host**: BPE decode.

Weights stay packed for the fused decode kernel across requests (the model
facade caches them, keyed on weight identity), and ``decode_precision``
selects f32 parity / bf16 / int8-W8A8 serving.

``serve_http`` wraps a service in a dependency-free stdlib HTTP endpoint
(POST an image body to ``/caption`` → JSON), mirroring the viz server's
zero-dependency approach (``viz/server.py``).
"""

from __future__ import annotations

import io
import json
import time
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

from gpt2_image_captioning_tpu.embeddings.preprocess import (
    SPECS,
    normalize_on_device,
    resize_and_crop,
)


class CaptionService:
    """images → captions with fixed-shape compiled device stages.

    ``model``: an ``ImageCaptioningModel`` (with tokenizer).
    ``encode_fn``: jittable ``(params, cfg, pixels, policy, normalize) ->
    (B, D) embeddings`` — e.g. ``models.clip.encode_image``; selected via
    ``encoder`` when not given.
    """

    def __init__(
        self,
        model,
        vision_params,
        vision_cfg,
        *,
        encoder: str = "clip",
        encode_fn=None,
        batch_size: int = 64,
        max_length: int = 50,
        temperature: float = 0.0,
        top_p: float = 0.9,
        decode_precision: str | None = None,
        policy=None,
        spec=None,
        rng: jax.Array | None = None,
    ):
        from gpt2_image_captioning_tpu.core.precision import BF16

        if encode_fn is None:
            if encoder == "clip":
                from gpt2_image_captioning_tpu.models.clip import encode_image
            elif encoder == "vit":
                from gpt2_image_captioning_tpu.models.vit import encode_image
            elif encoder == "dino":
                from gpt2_image_captioning_tpu.models.dino import encode_image
            else:
                raise ValueError(f"unknown encoder {encoder!r}")
            encode_fn = encode_image
        self.model = model
        # a custom encode_fn may carry its own PreprocessSpec; named encoders
        # default to their standard spec
        if spec is None:
            if encoder not in SPECS:
                raise ValueError(
                    f"unknown encoder {encoder!r}; pass spec= with a custom encode_fn"
                )
            spec = SPECS[encoder]
        # geometry follows the vision model's actual input size (the standard
        # specs assume the 224-px production towers; tiny test configs and
        # alternative resolutions scale the resize step proportionally)
        size = getattr(vision_cfg, "image_size", None)
        base = spec.crop or spec.resize
        if size and size != base:
            import dataclasses as _dc

            spec = _dc.replace(
                spec,
                resize=max(1, round(spec.resize * size / base)),
                crop=size if spec.crop else None,
            )
        self.spec = spec
        self.batch_size = batch_size
        self.max_length = max_length
        self.temperature = temperature
        self.top_p = top_p
        self.decode_precision = decode_precision
        policy = policy or BF16
        self._stats = {"images": 0, "requests": 0, "device_s": 0.0}
        # sampled decoding (temperature > 0) advances this key per device
        # batch so repeated requests draw fresh captions; pass rng= for
        # reproducible serving
        self._rng = rng if rng is not None else jax.random.PRNGKey(0)
        self._draws = 0

        final_spec = self.spec

        @jax.jit
        def _encode(vparams, batch_u8):
            px = normalize_on_device(batch_u8, final_spec)
            return encode_fn(vparams, vision_cfg, px, policy=policy, normalize=True)

        self._encode = _encode
        self._vparams = vision_params

    def _next_rng(self) -> jax.Array:
        """A fresh per-device-batch key (greedy decode ignores it)."""
        self._draws += 1
        return jax.random.fold_in(self._rng, self._draws)

    # -- input adapters ------------------------------------------------------
    def _to_square_u8(self, rgb: np.ndarray) -> np.ndarray:
        return resize_and_crop(np.asarray(rgb, np.uint8), self.spec)

    def caption_arrays(self, images: Sequence[np.ndarray]) -> list[str]:
        """uint8 RGB arrays (any sizes) → captions, in order."""
        if len(images) == 0:
            return []
        return self.caption_prepped(
            np.stack([self._to_square_u8(im) for im in images])
        )

    def caption_prepped(self, prepped: np.ndarray) -> list[str]:
        """Already resized/cropped uint8 batch (N, S, S, 3) → captions.

        The geometry step is skipped — callers that decode+crop per request
        on their own threads (e.g. the coalescing HTTP server) land here so
        pixels aren't resampled twice."""
        n = len(prepped)
        if n == 0:
            return []
        captions: list[str] = []
        t0 = time.perf_counter()
        for start in range(0, n, self.batch_size):
            chunk = prepped[start : start + self.batch_size]
            k = len(chunk)
            if k < self.batch_size:  # pad to the fixed serving shape
                chunk = np.concatenate(
                    [chunk, np.repeat(chunk[-1:], self.batch_size - k, axis=0)]
                )
            emb = self._encode(self._vparams, jnp.asarray(chunk))
            caps = self.model.generate_captions(
                emb,
                max_length=self.max_length,
                temperature=self.temperature,
                top_p=self.top_p,
                rng=self._next_rng(),
                decode_precision=self.decode_precision,
            )
            captions.extend(caps[:k])
        self._stats["images"] += n
        self._stats["requests"] += 1
        self._stats["device_s"] += time.perf_counter() - t0
        return captions

    def caption_bytes(self, blobs: Sequence[bytes]) -> list[str]:
        """Encoded image bytes (JPEG/PNG/...) → captions."""
        from PIL import Image

        arrays = [
            np.asarray(Image.open(io.BytesIO(b)).convert("RGB"), np.uint8)
            for b in blobs
        ]
        return self.caption_arrays(arrays)

    def caption_paths(self, paths: Sequence[str]) -> list[str]:
        from PIL import Image

        arrays = [np.asarray(Image.open(p).convert("RGB"), np.uint8) for p in paths]
        return self.caption_arrays(arrays)

    def caption_dir(self, image_dir: str, num_workers: int = 4) -> dict[str, str]:
        """Caption every image in a directory → {filename: caption}.

        Streams through the prefetching batch loader (C++ imagepipe when
        built, threaded PIL otherwise) so host JPEG decode for batch i+1
        overlaps the device work of batch i — the end-to-end path is
        host-decode-bound (PERF_NOTES), so the threads are the scaling lever
        on multi-core serving hosts.
        """
        from gpt2_image_captioning_tpu.embeddings.extract import _make_loader

        loader = _make_loader(image_dir, self.spec, self.batch_size, num_workers)
        out: dict[str, str] = {}
        t0 = time.perf_counter()
        for names, batch_u8, valid in loader:
            emb = self._encode(self._vparams, jnp.asarray(batch_u8))
            caps = self.model.generate_captions(
                emb,
                max_length=self.max_length,
                temperature=self.temperature,
                top_p=self.top_p,
                rng=self._next_rng(),
                decode_precision=self.decode_precision,
            )
            for name, cap in zip(names, caps):
                out[name] = cap
        self._stats["images"] += len(out)
        self._stats["requests"] += 1
        self._stats["device_s"] += time.perf_counter() - t0
        return out

    @property
    def stats(self) -> dict:
        s = dict(self._stats)
        if s["device_s"] > 0:
            s["img_per_s"] = s["images"] / s["device_s"]
        return s


class _Pending:
    """One in-flight /caption request: decoded pixels in, caption/error out."""

    __slots__ = ("array", "event", "caption", "error")

    def __init__(self, array: np.ndarray):
        import threading

        self.array = array
        self.event = threading.Event()
        self.caption: str | None = None
        self.error: str | None = None


def serve_http(
    service: CaptionService,
    host: str = "127.0.0.1",
    port: int = 5152,
    *,
    window_ms: float = 5.0,
    max_body_bytes: int = 32 << 20,
    request_timeout_s: float = 300.0,
):
    """Stdlib HTTP endpoint with **request coalescing** around a service.

    - ``POST /caption`` with an encoded image body → ``{"caption": str}``
    - ``GET /healthz`` → ``{"ok": true, ...stats}``

    Concurrent POSTs are each handled on their own thread (JPEG decode +
    resize happen per-request, in parallel); the decoded arrays are then
    coalesced by a single dispatcher thread — it gathers requests for up to
    ``window_ms`` or until ``service.batch_size`` are waiting, makes ONE
    device call, and fans the captions back out.  This keeps the device at
    its fixed serving batch shape under multi-client load instead of padding
    every single-image POST up to a full batch (1/batch_size efficiency).

    Bodies larger than ``max_body_bytes`` are rejected with 413 before any
    read, so an oversized upload can't exhaust serving-host memory.

    Returns the ``ThreadingHTTPServer`` (call ``serve_forever()`` from a
    thread; ``shutdown()`` also stops the dispatcher).
    """
    import queue
    import threading
    from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

    pending: queue.Queue = queue.Queue()
    stop = object()  # sentinel

    def dispatcher():
        while True:
            item = pending.get()
            if item is stop:
                return
            batch = [item]
            deadline = time.monotonic() + window_ms / 1000.0
            while len(batch) < service.batch_size:
                remain = deadline - time.monotonic()
                if remain <= 0:
                    break
                try:
                    nxt = pending.get(timeout=remain)
                except queue.Empty:
                    break
                if nxt is stop:
                    pending.put(stop)  # re-post for the outer loop
                    break
                batch.append(nxt)
            try:
                captions = service.caption_prepped(
                    np.stack([p.array for p in batch])
                )
                for p, cap in zip(batch, captions):
                    p.caption = cap
            except Exception as e:  # device/compile failures are OUR fault
                for p in batch:
                    p.error = str(e)
            for p in batch:
                p.event.set()

    class Server(ThreadingHTTPServer):
        daemon_threads = True

        def shutdown(self):
            pending.put(stop)
            super().shutdown()

    class Handler(BaseHTTPRequestHandler):
        def _json(self, code: int, obj) -> None:
            body = json.dumps(obj).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):  # noqa: N802 (stdlib API)
            if self.path == "/healthz":
                self._json(200, {"ok": True, **service.stats})
            else:
                self._json(404, {"error": "not found"})

        def do_POST(self):  # noqa: N802
            if self.path != "/caption":
                self._json(404, {"error": "not found"})
                return
            try:
                length = int(self.headers.get("Content-Length", 0))
            except (TypeError, ValueError):
                self._json(411, {"error": "missing or malformed Content-Length"})
                return
            if length > max_body_bytes:
                self._json(
                    413, {"error": f"body exceeds {max_body_bytes} byte limit"}
                )
                return
            blob = self.rfile.read(length)
            from PIL import Image, UnidentifiedImageError

            try:
                # decode + geometry on THIS thread → host work parallelizes
                # across concurrent clients; the device call is coalesced
                rgb = np.asarray(
                    Image.open(io.BytesIO(blob)).convert("RGB"), np.uint8
                )
                arr = service._to_square_u8(rgb)
            except (UnidentifiedImageError, OSError, ValueError) as e:
                self._json(400, {"error": f"not a decodable image: {e}"})
                return
            p = _Pending(arr)
            pending.put(p)
            if not p.event.wait(timeout=request_timeout_s):
                self._json(504, {"error": "caption batch timed out"})
                return
            if p.error is not None:
                self._json(500, {"error": p.error})
                return
            self._json(200, {"caption": p.caption})

        def log_message(self, *a):  # quiet
            pass

    server = Server((host, port), Handler)
    t = threading.Thread(target=dispatcher, daemon=True, name="caption-dispatcher")
    t.start()
    server.dispatcher_thread = t
    return server
