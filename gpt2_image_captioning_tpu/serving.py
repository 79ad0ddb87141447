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

import collections
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


def _make_frontend(vision_cfg, encoder, encode_fn, spec, policy):
    """Resolve the vision frontend shared by both serving classes.

    Returns ``(spec, jitted_encode)`` where ``jitted_encode(vparams,
    batch_u8)`` runs normalize → encoder → L2-norm on device.  A custom
    ``encode_fn`` may carry its own PreprocessSpec via ``spec``; named
    encoders default to their standard spec, with the resize step scaled
    when the vision config's ``image_size`` differs from the 224-px
    production towers (tiny test configs, alternative resolutions)."""
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
    if spec is None:
        if encoder not in SPECS:
            raise ValueError(
                f"unknown encoder {encoder!r}; pass spec= with a custom encode_fn"
            )
        spec = SPECS[encoder]
    size = getattr(vision_cfg, "image_size", None)
    base = spec.crop or spec.resize
    if size and size != base:
        import dataclasses as _dc

        spec = _dc.replace(
            spec,
            resize=max(1, round(spec.resize * size / base)),
            crop=size if spec.crop else None,
        )
    final_spec = spec

    @jax.jit
    def _encode(vparams, batch_u8):
        px = normalize_on_device(batch_u8, final_spec)
        return encode_fn(vparams, vision_cfg, px, policy=policy, normalize=True)

    return spec, _encode


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
        mesh=None,
    ):
        from gpt2_image_captioning_tpu.core.precision import BF16

        self.model = model
        policy = policy or BF16
        self.spec, self._encode = _make_frontend(
            vision_cfg, encoder, encode_fn, spec, policy
        )
        # multi-chip fixed-batch serving: a dp-only Mesh dp-shards both the
        # vision encode (GSPMD over the sharded pixel batch) and the decode
        # (generate's fused dp shard_map path — batch_size % dp must hold so
        # every serving chunk splits evenly); tp>1 meshes run generate's
        # GSPMD tensor-parallel decode instead.
        self._mesh = mesh
        if mesh is not None and batch_size % int(mesh.shape.get("dp", 1)) != 0:
            raise ValueError(
                f"batch_size {batch_size} must divide over dp="
                f"{mesh.shape.get('dp', 1)}"
            )
        self.batch_size = batch_size
        self.max_length = max_length
        self.temperature = temperature
        self.top_p = top_p
        self.decode_precision = decode_precision
        self._stats = {"images": 0, "requests": 0, "device_s": 0.0}
        # sampled decoding (temperature > 0) advances this key per device
        # batch so repeated requests draw fresh captions; pass rng= for
        # reproducible serving
        self._rng = rng if rng is not None else jax.random.PRNGKey(0)
        self._draws = 0
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
            pixels = jnp.asarray(chunk)
            if self._mesh is not None and self._mesh.shape.get("dp", 1) > 1:
                from jax.sharding import NamedSharding
                from jax.sharding import PartitionSpec as _P

                # dp-shard the pixel batch so XLA runs the encode tower
                # data-parallel across the mesh (weights replicated)
                pixels = jax.device_put(
                    pixels, NamedSharding(self._mesh, _P("dp"))
                )
            emb = self._encode(self._vparams, pixels)
            caps = self.model.generate_captions(
                emb,
                max_length=self.max_length,
                temperature=self.temperature,
                top_p=self.top_p,
                rng=self._next_rng(),
                decode_precision=self.decode_precision,
                mesh=self._mesh,
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


class ContinuousCaptionService:
    """Rolling-admission ("continuous batching") caption serving.

    ``CaptionService`` decodes synchronous fixed batches: every request in a
    device batch waits for the slowest caption before the next batch starts,
    so short captions pay the longest caption's latency and freed rows idle.
    This service keeps a fixed pool of ``slots`` decode rows live *across*
    requests: whenever a row's caption finishes (EOS or its length cap) the
    next queued request is prefilled straight into the freed row —
    mid-flight — while every other row keeps decoding.

    The serving loop itself runs ON DEVICE (``models/continuous.py``): one
    jitted **macro-step** executes ``bursts`` × (admission from a staged
    request block + ``segment`` fused decode steps) per dispatch, and the
    host fetches a single packed int32 matrix of tokens/uids per macro.
    With one macro kept in flight, the fetch overlaps the next macro's
    device time — the host-driven variant of this loop (one round trip per
    burst) measured 6× slower than fixed batches purely on tunnel latency
    (scripts/continuous_ab.py).  Host-side primitives with the same
    semantics (``captioner.decode_segment`` / ``admit_prefill``) remain the
    unit-testable reference implementation.

    Greedy (default) is token-for-token identical to one-shot greedy
    :func:`captioner.generate` for every request
    (``tests/test_continuous.py``).  ``temperature``/``top_p`` select
    sampled serving: the kernel streams logits and the categorical draw
    (sort-free bisection nucleus mask, ``ops/sampling.py``) runs on device
    inside the macro, keyed by the engine's global step counter — still
    host-free, deterministic per ``(seed, submission order)``.  The
    reference has no serving surface at all (its decode is a notebook
    loop, ``/root/reference/src/models.py:389-469``); continuous batching
    is this framework's production capability add.

    Compiled-program inventory (all fixed-shape): ONE macro-step program,
    plus one vision-encode program per admission-block bucket (powers of
    two up to the staging block, only for image submissions).

    Multi-chip: pass a dp-only ``mesh`` to shard the pool into dp
    independent sub-pools (one per device) inside a single shard_map macro
    program — requests round-robin across sub-pool queues, weights stay
    replicated, the decode loop runs with zero collectives
    (``models/continuous.py::macro_step_dp``).  Greedy captions remain
    token-exact vs one-shot generate; sampled sub-pools use shard-folded
    noise streams.
    """

    def __init__(
        self,
        model,
        vision_params,
        vision_cfg,
        *,
        encoder: str = "clip",
        encode_fn=None,
        slots: int = 64,
        segment: int = 4,
        bursts: int = 8,
        admit: int | None = None,
        max_length: int = 50,
        t_max: int | None = None,
        decode_precision: str | None = None,
        temperature: float = 0.0,
        top_p: float = 0.9,
        per_request_sampling: bool = False,
        sample_in_kernel: bool = False,
        seed: int = 0,
        spec=None,
        pipeline_depth: int = 1,
        mesh=None,
        admit_affinity: bool = False,
    ):
        from gpt2_image_captioning_tpu.models import captioner as C
        from gpt2_image_captioning_tpu.models import continuous as CE

        self.model = model
        self._C, self._CE = C, CE
        quant = decode_precision == "int8"
        tr, fz, pol = model.decode_params("bf16" if quant else decode_precision)
        self._tr, self._fz, self._pol = tr, fz, pol
        cfg = model.cfg
        self.cfg = cfg
        self.spec, self._encode = _make_frontend(
            vision_cfg, encoder, encode_fn, spec, pol
        )
        self._vparams = vision_params
        # multi-chip serving: a dp-only Mesh shards the slot pool into
        # dp independent sub-pools, each served by its own device inside ONE
        # shard_map macro program (models/continuous.py::macro_step_dp).
        # The host round-robins requests across sub-pool queues; weights and
        # packed kernel tiles are replicated, so the decode loop runs with
        # zero collectives.  Sampled sub-pools draw shard-folded noise
        # streams (deterministic per (seed, submission order, mesh), but a
        # different stream than the single-device engine).
        self._mesh = mesh
        self._dp = 1 if mesh is None else int(mesh.shape.get("dp", 1))
        if mesh is not None and mesh.shape.get("tp", 1) != 1:
            raise ValueError("ContinuousCaptionService meshes must be dp-only")
        if slots % self._dp != 0:
            raise ValueError(f"slots {slots} must divide over dp={self._dp}")
        self.slots = slots
        self.segment = segment
        self.bursts = bursts
        # admit is PER SUB-POOL (each device admits into its own rows)
        self.admit = min(admit if admit is not None else 32, slots // self._dp)
        self.max_length = max_length
        # age-affine admission (models/continuous.py): measured-rejected
        # default-off — lowest-free-first already age-clusters blocks for
        # the kernel's per-block chunk skip (docs/PERF_NOTES.md round 5);
        # opt-in for workloads whose length spread defeats that
        self.admit_affinity = bool(admit_affinity)
        self.temperature, self.top_p = float(temperature), float(top_p)
        # sampled mode compiles the emit-logits macro with PER-ROW
        # temperature/top_p (models/continuous.py): every request may carry
        # its own values, and temperature-0 rows take the argmax, so greedy
        # and sampled requests mix in one pool.  per_request_sampling=True
        # opts a greedy-default service into that program (slightly more
        # device work per step than the pure in-kernel-argmax program).
        self.sampled = bool(per_request_sampling) or temperature != 0.0
        # sample_in_kernel: the sampled macro draws tokens INSIDE the fused
        # kernel (speculative-accept nucleus sampling) — the (S, V) logits
        # never leave the chip.  Requires per-request top_p >= 0.5 (validated
        # at submit): smaller nuclei retry speculative candidates too often.
        self.sample_in_kernel = bool(sample_in_kernel) and self.sampled
        if self.sample_in_kernel and self.top_p < 0.5:
            raise ValueError(
                f"sample_in_kernel needs top_p >= 0.5, got {self.top_p}"
            )
        self._rng = None if not self.sampled else jax.random.PRNGKey(seed)
        # the kernel sees PER-DEVICE rows: key the 256-row tile packing off
        # the sub-pool width, not the global slot count
        self._packed = C.prepare_decode_weights(
            tr, fz, cfg, pol, quant=quant,
            tw=384 if (slots // self._dp) % 256 == 0 else None,
        )

        # total prefix length (mapping output ⧺ optional task prefix)
        emb_dim = cfg.mapping.embed_dim
        self._emb_dim = emb_dim
        self._p = jax.eval_shape(
            lambda e: C.build_prefix(tr, cfg, e, pol),
            jax.ShapeDtypeStruct((1, emb_dim), jnp.float32),
        ).shape[1]
        p = self._p
        # engine capacity contract: compaction at macro entry rebases idx to
        # the longest live window (<= P + max_length - 1), then idx grows by
        # bursts*segment; round up to the kernel's CHUNK_T granularity
        need = p + max_length + bursts * segment
        t_max = max(t_max or 0, need)
        self.t_max = -(-t_max // 8) * 8
        # staging block: everything one macro could possibly admit — sized
        # per sub-pool, laid out as dp contiguous per-shard blocks
        sp = slots // self._dp
        self._q_per = max(sp, min(bursts * self.admit, 4 * sp))
        self.q_cap = self._dp * self._q_per
        self._buckets = []
        b = 1
        while b < self.q_cap:
            self._buckets.append(b)
            b *= 2
        self._buckets.append(self.q_cap)

        if pipeline_depth < 1:
            raise ValueError(f"pipeline_depth must be >= 1, got {pipeline_depth}")
        # dispatch pipeline depth: how many macros may be in flight at once.
        # depth 1 (default) overlaps macro N's output fetch with macro N+1's
        # device time; depth 2 additionally keeps the device queue one macro
        # deep so host-side staging/bookkeeping hiccups never starve it —
        # at the cost of the host learning completions one macro later
        # (slightly staler admission).  A/B: scripts/continuous_depth_ab.py.
        self.pipeline_depth = pipeline_depth
        self._state = (
            CE.init_state(cfg, slots, self.t_max, p, pol)
            if self._dp == 1
            else CE.init_state_dp(cfg, self._dp, slots, self.t_max, p, pol)
        )
        # host bookkeeping: queue of submitted-but-unstaged requests, the
        # in-flight macro deque (newest right), and per-request token streams
        self._queue: list[tuple[int, np.ndarray, bool]] = []
        self._inflight: collections.deque = collections.deque()
        self._live: set[int] = set()
        self._emitted: dict[int, list[int]] = {}
        self._req_max: dict[int, int] = {}
        self._req_temp: dict[int, float] = {}
        self._req_topp: dict[int, float] = {}
        self._submit_t: dict[int, float] = {}
        self._latencies: list[float] = []
        self._results: dict[int, str] = {}
        self._next_id = 0
        self._stats = {
            "images": 0, "macros": 0, "device_s": 0.0,
            # phase breakdown (seconds): staging+dispatch, packed-output
            # readback sync, host bookkeeping
            "dispatch_s": 0.0, "sync_s": 0.0, "host_s": 0.0,
        }
        self._occ_sum, self._occ_n = 0.0, 0

    # -- request intake ------------------------------------------------------
    def _enqueue(
        self,
        payload,
        is_emb: bool,
        max_length: int | None,
        temperature: float | None = None,
        top_p: float | None = None,
    ) -> int:
        if max_length is not None and not 1 <= max_length <= self.max_length:
            raise ValueError(
                f"per-request max_length must be in [1, {self.max_length}]"
            )
        if temperature is not None:
            if not self.sampled and temperature != 0.0:
                raise ValueError(
                    "per-request temperature needs a sampled service — construct "
                    "with temperature>0 or per_request_sampling=True (the greedy "
                    "service compiles the in-kernel-argmax program, which never "
                    "materializes logits)"
                )
            if temperature < 0.0:
                raise ValueError(f"temperature must be >= 0, got {temperature}")
        if top_p is not None and not 0.0 < top_p <= 1.0:
            raise ValueError(f"top_p must be in (0, 1], got {top_p}")
        if top_p is not None and self.sample_in_kernel and top_p < 0.5:
            raise ValueError(
                f"this service draws tokens in-kernel (sample_in_kernel=True), "
                f"which needs per-request top_p >= 0.5; got {top_p}"
            )
        rid = self._next_id
        self._next_id += 1
        self._queue.append((rid, payload, is_emb))
        if max_length is not None:
            self._req_max[rid] = max_length
        if temperature is not None:
            self._req_temp[rid] = float(temperature)
        if top_p is not None:
            self._req_topp[rid] = float(top_p)
        self._submit_t[rid] = time.perf_counter()
        return rid

    def submit_array(
        self,
        rgb: np.ndarray,
        max_length: int | None = None,
        temperature: float | None = None,
        top_p: float | None = None,
    ) -> int:
        """Queue one uint8 RGB image (any size); returns a request id.

        ``max_length`` caps this request's caption below the service-wide
        limit (the cache is provisioned for the service limit).
        ``temperature``/``top_p`` override the service defaults for THIS
        request (sampled services only — the engine decodes every pool row
        with its own values; ``temperature=0`` selects greedy)."""
        return self._enqueue(
            resize_and_crop(np.asarray(rgb, np.uint8), self.spec), False,
            max_length, temperature, top_p,
        )

    def submit_bytes(
        self,
        blob: bytes,
        max_length: int | None = None,
        temperature: float | None = None,
        top_p: float | None = None,
    ) -> int:
        from PIL import Image

        return self.submit_array(
            np.asarray(Image.open(io.BytesIO(blob)).convert("RGB"), np.uint8),
            max_length, temperature, top_p,
        )

    def submit_embedding(
        self,
        emb: np.ndarray,
        max_length: int | None = None,
        temperature: float | None = None,
        top_p: float | None = None,
    ) -> int:
        """Queue a precomputed image embedding (E,) — skips the vision
        encoder, serving the reference's embedding-file workflow
        (``/root/reference/src/utils.py`` loads ``.pt`` embeddings)."""
        return self._enqueue(
            np.asarray(emb, np.float32), True, max_length, temperature, top_p
        )

    def submit_prepped(
        self,
        arr: np.ndarray,
        max_length: int | None = None,
        temperature: float | None = None,
        top_p: float | None = None,
    ) -> int:
        """Queue an already resize/cropped uint8 image matching
        ``self.spec`` geometry.  ``serve_http_continuous`` preps images on
        its handler threads (host decode parallelizes across clients) and
        hands the pump thread prepped arrays; everything else should use
        :meth:`submit_array`."""
        a = np.asarray(arr, np.uint8)
        side = self.spec.crop or self.spec.resize
        if a.shape != (side, side, 3):
            raise ValueError(f"prepped image must be {(side, side, 3)}, got {a.shape}")
        return self._enqueue(a, False, max_length, temperature, top_p)

    @property
    def live(self) -> int:
        """Requests admitted to the device pool and not yet completed (by
        the host's knowledge — an in-flight macro may have finished some)."""
        return len(self._live)

    @property
    def queued(self) -> int:
        return len(self._queue)

    # -- serving loop --------------------------------------------------------
    def _complete(self, rid: int) -> None:
        toks = self._emitted.pop(rid)
        self._req_max.pop(rid, None)
        self._req_temp.pop(rid, None)
        self._req_topp.pop(rid, None)
        self._live.discard(rid)
        t_sub = self._submit_t.pop(rid, None)
        if t_sub is not None:
            self._latencies.append(time.perf_counter() - t_sub)
        if toks and toks[-1] == self.cfg.eos_token_id:
            toks = toks[:-1]
        self._results[rid] = self.model.tokenizer.batch_decode(
            np.asarray([toks], np.int32) if toks else np.zeros((1, 0), np.int32),
            skip_special_tokens=True,
        )[0]
        self._stats["images"] += 1

    def _dispatch(self) -> None:
        """Stage a request block and enqueue one macro-step on device.

        With a dp mesh, the staging matrix is ``dp`` contiguous per-shard
        blocks of ``_q_per`` rows; entries round-robin across sub-pools so
        queues stay balanced, and each sub-pool admits its own block in
        order (``macro_step_dp``)."""
        td = time.perf_counter()
        dp, qper = self._dp, self._q_per
        entries = self._queue[: self.q_cap]
        del self._queue[: len(entries)]
        # staging row of entry i: shard (i % dp) block + within-shard slot
        pos = [(i % dp) * qper + i // dp for i in range(len(entries))]
        emb_host = np.zeros((self.q_cap, self._emb_dim), np.float32)
        img_idx = [i for i, (_, _, e) in enumerate(entries) if not e]
        for i, (_, payload, is_emb) in enumerate(entries):
            if is_emb:
                emb_host[pos[i]] = payload
        emb_dev = jnp.asarray(emb_host)
        if img_idx:
            m = len(img_idx)
            bucket = next(b for b in self._buckets if b >= m)
            filler = entries[img_idx[0]][1]
            u8 = np.stack(
                [entries[i][1] for i in img_idx] + [filler] * (bucket - m)
            )
            enc = self._encode(self._vparams, jnp.asarray(u8))
            # pad the scatter rows to the bucket shape (out of bounds →
            # dropped) so each bucket compiles exactly once
            rows_pad = np.full((bucket,), self.q_cap, np.int64)
            rows_pad[:m] = [pos[i] for i in img_idx]
            emb_dev = emb_dev.at[jnp.asarray(rows_pad)].set(enc, mode="drop")
            # entries the macro fails to admit are re-queued by _harvest:
            # hand them back as EMBEDDING entries (device rows, no host
            # sync here) so a backlogged image is encoded exactly once
            for j, i in enumerate(img_idx):
                entries[i] = (entries[i][0], enc[j], True)
        caps = np.full((self.q_cap,), self.max_length, np.int32)
        uids = np.full((self.q_cap,), -1, np.int32)
        temps = np.full((self.q_cap,), self.temperature, np.float32)
        topps = np.full((self.q_cap,), self.top_p, np.float32)
        for i, (rid, _, _) in enumerate(entries):
            caps[pos[i]] = self._req_max.get(rid, self.max_length)
            uids[pos[i]] = rid
            temps[pos[i]] = self._req_temp.get(rid, self.temperature)
            topps[pos[i]] = self._req_topp.get(rid, self.top_p)
        # per-shard staged lists (original submission index kept so _harvest
        # can restore FIFO order when re-queueing unreached entries)
        shard_entries = [
            [(i, entries[i]) for i in range(s, len(entries), dp)]
            for s in range(dp)
        ]
        if dp == 1:
            self._state, out = self._CE.macro_step(
                self._packed, self._tr, self._fz, self._state,
                emb_dev, jnp.asarray(caps), jnp.asarray(uids),
                jnp.asarray(len(entries), jnp.int32), self._rng,
                jnp.asarray(temps), jnp.asarray(topps),
                cfg=self.cfg, policy=self._pol, seg=self.segment,
                bursts=self.bursts, admit=self.admit,
                temperature=self.temperature, top_p=self.top_p,
                sampled=self.sampled, sample_in_kernel=self.sample_in_kernel,
                admit_affinity=self.admit_affinity,
            )
        else:
            n_vec = np.asarray([len(se) for se in shard_entries], np.int32)
            self._state, out = self._CE.macro_step_dp(
                self._mesh, self._packed, self._tr, self._fz, self._state,
                emb_dev, jnp.asarray(caps), jnp.asarray(uids),
                jnp.asarray(n_vec), self._rng,
                jnp.asarray(temps), jnp.asarray(topps),
                cfg=self.cfg, policy=self._pol, seg=self.segment,
                bursts=self.bursts, admit=self.admit,
                temperature=self.temperature, top_p=self.top_p,
                sampled=self.sampled, sample_in_kernel=self.sample_in_kernel,
                admit_affinity=self.admit_affinity,
            )
        self._inflight.append((out, shard_entries))
        self._stats["macros"] += 1
        self._stats["dispatch_s"] += time.perf_counter() - td

    def _harvest(self, inflight) -> None:
        """Fetch and apply a dispatched macro's packed output.

        Host bookkeeping is vectorized: a request occupies exactly one pool
        row for its whole life, so each row's uid column splits into
        contiguous per-request segments and numpy hands each request its
        token slice in one go.  The scalar per-(step, row) loop this
        replaces was the serving bottleneck on a 1-core host (4,096 Python
        iterations per macro at 128 slots; scripts/continuous_host_ab.py
        measured the swap +30% end-to-end).  Semantics are unchanged: a
        step's admissions land before its decode token, tokens append in
        time order, truncated at the request's cap, completed at EOS/cap."""
        if inflight is None:
            return
        out_dev, shard_entries = inflight
        ts = time.perf_counter()
        out = np.asarray(out_dev)  # ONE device→host fetch per macro
        th = time.perf_counter()
        self._stats["sync_s"] += th - ts
        eos = self.cfg.eos_token_id
        toks_mat, uid_mat = out[:, 0], out[:, 1]     # (T, S)
        adm_first, adm_uid = out[:, 2], out[:, 3]    # (T, S), -1-padded
        # occupancy telemetry: fraction of (step, row) cells live this macro.
        # Sustained values well below ~0.9 under load almost always mean the
        # in-system population is under recommended_inflight() — the
        # root-caused failure mode of the round-5 occupancy decomposition —
        # so surface it where operators look (stats["occupancy"]).
        self._occ_sum += float((uid_mat >= 0).mean())
        self._occ_n += 1
        # admissions, in time order (np.nonzero is row-major == step-major;
        # the engine left-aligns each step's admitted columns — per sub-pool
        # column block under a dp mesh)
        at_i, aa_i = np.nonzero(adm_uid >= 0)
        for t_i, a_i in zip(at_i, aa_i):
            u = int(adm_uid[t_i, a_i])
            first = int(adm_first[t_i, a_i])
            self._emitted[u] = [first]
            self._live.add(u)
            if first == eos or self._req_max.get(u, self.max_length) <= 1:
                self._complete(u)
        # per-row decode streams: contiguous uid segments, one per request
        for r in np.nonzero((uid_mat >= 0).any(axis=0))[0]:
            col = uid_mat[:, r]
            valid = col >= 0
            us = col[valid]
            change = np.nonzero(np.diff(us) != 0)[0]
            starts = np.concatenate(([0], change + 1))
            ends = np.concatenate((change + 1, [us.size]))
            toks_col = toks_mat[:, r][valid]
            for s0, s1 in zip(starts, ends):
                u = int(us[s0])
                if u not in self._live:
                    continue
                stream = self._emitted[u]
                cap = self._req_max.get(u, self.max_length)
                room = cap - len(stream)
                if room <= 0:
                    self._complete(u)
                    continue
                take = toks_col[s0:s1][:room]
                ep = np.nonzero(take == eos)[0]
                if ep.size:
                    take = take[: ep[0] + 1]
                stream.extend(take.tolist())
                if len(stream) >= cap or (take.size and take[-1] == eos):
                    self._complete(u)
        # entries the macro did not reach go back to the queue front: each
        # sub-pool consumes its staged block in order, so shard s's consumed
        # count is the number of admissions in its slot-column block
        sp = self.slots // self._dp
        leftovers = []
        for s, ents in enumerate(shard_entries):
            consumed_s = int((adm_uid[:, s * sp : (s + 1) * sp] >= 0).sum())
            leftovers.extend(ents[consumed_s:])
        if leftovers:
            leftovers.sort(key=lambda t: t[0])  # restore submission order
            self._queue[:0] = [e for _, e in leftovers]
        self._stats["host_s"] += time.perf_counter() - th

    def step(self) -> dict[int, str]:
        """Dispatch the next macro (if there is visible work), then harvest
        down to ``pipeline_depth - 1`` older in-flight macros — their
        packed-output fetches and host bookkeeping overlap the newest
        macro's device execution.  At depth 1 this is dispatch-then-harvest-
        previous; at depth 2 the device queue stays one whole macro deep, so
        staging the next block never leaves the chip idle.

        When no work is visible on the host (queue and live both empty) but
        macros are still in flight, no new macro is dispatched and ALL
        in-flight output is harvested: it may reveal admissions/re-queued
        entries, and the next :meth:`step` dispatches then.  At most
        ``pipeline_depth`` tail macros run over an all-dead pool.

        Returns the requests completed during this call ({id: caption});
        they are also retained until popped via :meth:`pop_result`."""
        t0 = time.perf_counter()
        before = set(self._results)
        dispatched = False
        if self._queue or self._live:
            self._dispatch()
            dispatched = True
        keep = self.pipeline_depth if dispatched else 0
        while len(self._inflight) > keep:
            self._harvest(self._inflight.popleft())
        self._stats["device_s"] += time.perf_counter() - t0
        return {r: c for r, c in self._results.items() if r not in before}

    def drain(self) -> dict[int, str]:
        """Run until the queue, every in-flight macro and every live request
        are exhausted."""
        # worst case (single-slot trickle): one request admits only when a
        # row frees, then needs ceil(max_length / tokens-per-macro) macros;
        # bound by requests × that, NOT by pool size (a large pool serving
        # one long request would otherwise hit the guard mid-progress)
        per_req = -(-self.max_length // (self.segment * self.bursts)) + 2
        pending = self.queued + self.live + len(self._inflight)
        limit = 8 + self.pipeline_depth + (pending + 1) * per_req
        guard = 0
        while (self._queue or self._live or self._inflight) and guard < limit:
            guard += 1
            self.step()
        if self._queue or self._live or self._inflight:
            raise RuntimeError("continuous serving loop failed to drain")
        return dict(self._results)

    def pop_result(self, rid: int) -> str:
        return self._results.pop(rid)

    def caption_arrays(self, images: Sequence[np.ndarray]) -> list[str]:
        """Submit + drain; captions in input order (CaptionService parity)."""
        ids = [self.submit_array(im) for im in images]
        self.drain()
        return [self._results.pop(i) for i in ids]

    def recommended_inflight(self, expected_len: int | None = None) -> int:
        """Minimum in-system population (queued + live) for full-occupancy
        steady-state throughput.

        Measured on-chip (docs/ab_logs/continuous_occupancy_ab.log): with
        only 3×slots in-system, steady occupancy equilibrates at 0.574 and
        throughput at ~56% of the pool's ceiling — NOT because the engine is
        slow (its step cost matches fixed-batch) but because admission can
        only draw from what was staged at dispatch.  Keeping every row live
        through a ``bursts·segment``-step macro needs the staged queue to
        cover the macro's completions, and the host's resubmission knowledge
        is one macro stale (depth-1 overlap), so:

            population ≈ slots · (1 + 2 · bursts·segment / expected_len)

        At the tuned flagship config (128 slots, 128-step macros, len-49
        captions) that is ≈ 6.2×slots; the measured sweep saturates between
        5× (occupancy 0.841, +31% throughput) and 7× (0.875, +35%).  Shorter
        captions need MORE backlog (they free rows faster), hence the
        conservative ``expected_len`` default of half the service cap.
        Load-generating callers should keep ``queued + live`` at or above
        this value whenever sustained throughput matters.
        """
        el = max(1, expected_len or max(1, self.max_length // 2))
        steps = self.bursts * self.segment
        return int(self.slots * (1 + 2 * steps / el) + 0.5)

    @property
    def stats(self) -> dict:
        s = dict(self._stats)
        if s["device_s"] > 0:
            s["img_per_s"] = s["images"] / s["device_s"]
        if self._occ_n:
            s["occupancy"] = self._occ_sum / self._occ_n
        if self._latencies:
            lat = np.sort(self._latencies)
            s["latency_p50_s"] = float(lat[len(lat) // 2])
            s["latency_p95_s"] = float(lat[int(len(lat) * 0.95)])
        return s


class _Pending:
    """One in-flight /caption request: decoded pixels in, caption/error out."""

    __slots__ = ("array", "event", "caption", "error", "max_length",
                 "temperature", "top_p")

    def __init__(
        self,
        array: np.ndarray,
        max_length: int | None = None,
        temperature: float | None = None,
        top_p: float | None = None,
    ):
        import threading

        self.array = array
        self.event = threading.Event()
        self.caption: str | None = None
        self.error: str | None = None
        self.max_length = max_length
        self.temperature = temperature
        self.top_p = top_p


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
            if not 0 <= length <= max_body_bytes:
                # negative Content-Length would make rfile.read(-1) buffer
                # the stream until EOF — exactly the exhaustion this guards
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


def serve_http_continuous(
    service: ContinuousCaptionService,
    host: str = "127.0.0.1",
    port: int = 5152,
    *,
    max_body_bytes: int = 32 << 20,
    request_timeout_s: float = 300.0,
):
    """Stdlib HTTP endpoint over a :class:`ContinuousCaptionService`.

    - ``POST /caption[?max_length=N]`` with an encoded image body →
      ``{"caption": str}``
    - ``GET /healthz`` → ``{"ok": true, ...stats}``

    Where :func:`serve_http` coalesces requests into *synchronous* fixed
    batches (every request in a batch waits for the slowest caption),
    this surface feeds the rolling-admission pool: each request is
    admitted into a freed decode row mid-flight and completes at ITS OWN
    length, so a short caption never pays a long one's latency and the
    device pool stays occupied under ragged loads.

    Threading contract: ``ContinuousCaptionService`` is single-threaded by
    design (one jitted macro program over donated state), so ONE pump
    thread owns every ``service`` call.  Handler threads do the
    embarrassingly-parallel host work per request (body read, JPEG decode,
    resize/crop), enqueue the prepped array, and block on a per-request
    event; the pump submits queued intakes, turns the serving loop
    (:meth:`ContinuousCaptionService.step` — dispatch next macro, harvest
    previous), and fans completions back out.  When fully idle it blocks
    on the intake queue, burning no CPU.

    Returns the ``ThreadingHTTPServer`` (run ``serve_forever()`` from a
    thread; ``shutdown()`` also stops the pump).
    """
    import queue
    import threading
    from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

    intake: queue.Queue = queue.Queue()
    stop = object()

    # CPU-testing nicety: `pltpu.force_tpu_interpret_mode()` is THREAD-local,
    # so a caller tracing the macro under it would see the pump thread
    # retrace WITHOUT interpret lowering and fail ("Only interpret mode is
    # supported on CPU backend").  Inherit the caller's setting onto the
    # pump thread; no effect on real TPUs, degrades to nothing if the jax
    # internal moves.
    try:
        from jax._src import config as _jax_config

        _interp_state = _jax_config.pallas_tpu_interpret_mode_context_manager
        _caller_interp = _interp_state.get_local()
        if type(_caller_interp) is object:  # the unset sentinel
            _interp_state = _caller_interp = None
    except Exception:  # pragma: no cover - jax internals moved
        _interp_state = _caller_interp = None

    def pump():
        if _interp_state is not None:
            try:
                _interp_state.set_local(_caller_interp)
            except Exception:  # pragma: no cover
                pass
        rid_map: dict[int, _Pending] = {}
        while True:
            busy = bool(
                rid_map or service.queued or service.live or service._inflight
            )
            try:
                # block only when there is nothing to serve
                item = intake.get(block=not busy) if not busy else intake.get_nowait()
            except queue.Empty:
                item = None
            while True:
                if item is stop:
                    for p in rid_map.values():
                        p.error = "server shut down"
                        p.event.set()
                    return
                if item is None:
                    break
                try:
                    rid = service.submit_prepped(
                        item.array, item.max_length, item.temperature,
                        item.top_p,
                    )
                    rid_map[rid] = item
                except Exception as e:  # bad geometry etc.
                    item.error = str(e)
                    item.event.set()
                try:
                    item = intake.get_nowait()  # drain the burst
                except queue.Empty:
                    break
            if not (service.queued or service.live or service._inflight):
                continue
            try:
                done = service.step()
            except Exception as e:  # device failure: fail ALL waiters loudly
                for p in rid_map.values():
                    p.error = str(e)
                    p.event.set()
                rid_map.clear()
                continue
            for rid, caption in done.items():
                service.pop_result(rid)
                p = rid_map.pop(rid, None)
                if p is not None:
                    p.caption = caption
                    p.event.set()

    class Server(ThreadingHTTPServer):
        daemon_threads = True

        def shutdown(self):
            intake.put(stop)
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
            from urllib.parse import parse_qs, urlparse

            u = urlparse(self.path)
            if u.path != "/caption":
                self._json(404, {"error": "not found"})
                return
            qs = parse_qs(u.query)
            max_length = temperature = top_p = None
            q = qs.get("max_length")
            if q:
                try:
                    max_length = int(q[0])
                    if not 1 <= max_length <= service.max_length:
                        raise ValueError
                except ValueError:
                    self._json(
                        400,
                        {"error": f"max_length must be in [1, {service.max_length}]"},
                    )
                    return
            q = qs.get("temperature")
            if q:
                try:
                    temperature = float(q[0])
                    if not (temperature >= 0.0 and (service.sampled or temperature == 0.0)):
                        raise ValueError
                except ValueError:
                    self._json(
                        400,
                        {"error": "temperature must be >= 0 (and the service "
                                  "sampled for temperature > 0)"},
                    )
                    return
            q = qs.get("top_p")
            if q:
                try:
                    top_p = float(q[0])
                    if not 0.0 < top_p <= 1.0:
                        raise ValueError
                except ValueError:
                    self._json(400, {"error": "top_p must be in (0, 1]"})
                    return
            try:
                length = int(self.headers.get("Content-Length", 0))
            except (TypeError, ValueError):
                self._json(411, {"error": "missing or malformed Content-Length"})
                return
            if not 0 <= length <= max_body_bytes:
                self._json(
                    413, {"error": f"body exceeds {max_body_bytes} byte limit"}
                )
                return
            blob = self.rfile.read(length)
            from PIL import Image, UnidentifiedImageError

            try:
                rgb = np.asarray(
                    Image.open(io.BytesIO(blob)).convert("RGB"), np.uint8
                )
                arr = resize_and_crop(rgb, service.spec)
            except (UnidentifiedImageError, OSError, ValueError) as e:
                self._json(400, {"error": f"not a decodable image: {e}"})
                return
            p = _Pending(arr, max_length, temperature, top_p)
            intake.put(p)
            if not p.event.wait(timeout=request_timeout_s):
                self._json(504, {"error": "caption timed out"})
                return
            if p.error is not None:
                self._json(500, {"error": p.error})
                return
            self._json(200, {"caption": p.caption})

        def log_message(self, *a):  # quiet
            pass

    server = Server((host, port), Handler)
    t = threading.Thread(target=pump, daemon=True, name="caption-pump")
    t.start()
    server.pump_thread = t
    return server
