"""End-to-end serving: images → captions through CaptionService + HTTP."""

from __future__ import annotations

import io
import json
import threading
import urllib.request

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gpt2_image_captioning_tpu.models import captioner as C
from gpt2_image_captioning_tpu.models import clip as CL
from gpt2_image_captioning_tpu.models import gpt2 as G
from gpt2_image_captioning_tpu.models import mapping as M
from gpt2_image_captioning_tpu.serving import CaptionService, serve_http

from helpers import tiny_tokenizer


@pytest.fixture(scope="module")
def service():
    from gpt2_image_captioning_tpu.core.precision import F32

    vcfg = CL.CLIPVisionConfig.tiny()
    vparams = CL.init_vision(jax.random.PRNGKey(0), vcfg)
    tok = tiny_tokenizer()
    gcfg = G.GPT2Config(
        vocab_size=len(tok.encoder), n_positions=64, n_embd=32, n_layer=2, n_head=2
    )
    mcfg = M.MLPMappingConfig(
        prefix_length=2, embed_dim=vcfg.projection_dim, gpt_dim=32
    )
    ccfg = C.CaptionerConfig(gpt2=gcfg, mapping=mcfg, eos_token_id=len(tok.encoder) - 1)
    model = C.ImageCaptioningModel(ccfg, tokenizer=tok)
    svc = CaptionService(
        model, vparams, vcfg, encoder="clip", batch_size=4, max_length=6,
        temperature=0.0, top_p=1.0, policy=F32,
    )
    return svc, vparams, vcfg, model


def _imgs(n, rng):
    # variable sizes: the service owns resize/crop
    return [
        rng.integers(0, 255, size=(40 + 7 * i, 52 - 3 * i, 3)).astype(np.uint8)
        for i in range(n)
    ]


def test_caption_arrays_order_and_padding(service):
    svc, *_ = service
    rng = np.random.default_rng(0)
    caps = svc.caption_arrays(_imgs(3, rng))  # 3 < batch_size=4 → padded tail
    assert len(caps) == 3
    assert all(isinstance(c, str) for c in caps)
    # a bigger request spans two device batches; same images → same captions
    caps2 = svc.caption_arrays(_imgs(3, np.random.default_rng(0)))
    assert caps == caps2
    assert svc.stats["images"] == 6


def test_matches_manual_pipeline(service):
    """The service == hand-composed preprocess→encode→generate_captions."""
    from gpt2_image_captioning_tpu.embeddings.preprocess import (
        SPECS,
        normalize_on_device,
        resize_and_crop,
    )

    svc, vparams, vcfg, model = service
    rng = np.random.default_rng(1)
    imgs = _imgs(4, rng)
    want_u8 = np.stack([resize_and_crop(im, svc.spec) for im in imgs])

    @jax.jit
    def enc(vp, u8):
        from gpt2_image_captioning_tpu.core.precision import F32

        px = normalize_on_device(u8, svc.spec)
        return CL.encode_image(vp, vcfg, px, policy=F32, normalize=True)

    emb = enc(vparams, jnp.asarray(want_u8))
    want = model.generate_captions(emb, max_length=6, temperature=0.0, top_p=1.0)
    got = svc.caption_arrays(imgs)
    assert got == want


def test_caption_bytes_decodes_images(service):
    from PIL import Image

    svc, *_ = service
    rng = np.random.default_rng(2)
    blobs = []
    for im in _imgs(2, rng):
        buf = io.BytesIO()
        Image.fromarray(im).save(buf, format="PNG")
        blobs.append(buf.getvalue())
    caps = svc.caption_bytes(blobs)
    assert len(caps) == 2 and all(isinstance(c, str) for c in caps)


def test_caption_dir_streams_loader(service, tmp_path):
    """caption_dir (prefetching loader path) == caption_paths on the same
    files, keyed by filename."""
    from PIL import Image

    svc, *_ = service
    rng = np.random.default_rng(4)
    paths = []
    for i, im in enumerate(_imgs(5, rng)):
        p = tmp_path / f"im_{i}.jpg"
        Image.fromarray(im).save(p, quality=95)
        paths.append(str(p))
    want = svc.caption_paths(paths)
    got = svc.caption_dir(str(tmp_path), num_workers=2)
    assert [got[f"im_{i}.jpg"] for i in range(5)] == want


def test_service_int8_precision(service):
    """decode_precision='int8' works through the service (facade mapping)."""
    svc, vparams, vcfg, model = service
    from gpt2_image_captioning_tpu.core.precision import F32
    from gpt2_image_captioning_tpu.serving import CaptionService

    svc8 = CaptionService(
        model, vparams, vcfg, batch_size=4, max_length=5, temperature=0.0,
        top_p=1.0, decode_precision="int8", policy=F32,
    )
    caps = svc8.caption_arrays(_imgs(2, np.random.default_rng(5)))
    assert len(caps) == 2 and all(isinstance(c, str) for c in caps)


def test_service_vit_encoder():
    """The service composes with the ViT tower too (encoder='vit')."""
    from gpt2_image_captioning_tpu.core.precision import F32
    from gpt2_image_captioning_tpu.models import vit as VT
    from gpt2_image_captioning_tpu.serving import CaptionService

    tok = tiny_tokenizer()
    vcfg = VT.ViTConfig.tiny()
    vparams = VT.init(jax.random.PRNGKey(0), vcfg)
    gcfg = G.GPT2Config(
        vocab_size=len(tok.encoder), n_positions=64, n_embd=32, n_layer=2, n_head=2
    )
    mcfg = M.MLPMappingConfig(
        prefix_length=2, embed_dim=vcfg.hidden_size, gpt_dim=32
    )
    ccfg = C.CaptionerConfig(gpt2=gcfg, mapping=mcfg, eos_token_id=len(tok.encoder) - 1)
    model = C.ImageCaptioningModel(ccfg, tokenizer=tok)
    svc = CaptionService(
        model, vparams, vcfg, encoder="vit", batch_size=4, max_length=5,
        temperature=0.0, top_p=1.0, policy=F32,
    )
    caps = svc.caption_arrays(_imgs(2, np.random.default_rng(6)))
    assert len(caps) == 2


def test_sampled_serving_rng_advances_and_is_reproducible(service):
    """temperature>0 serving draws a fresh key per device batch (repeat
    requests aren't frozen to PRNGKey(0)); an explicit rng reproduces."""
    svc, vparams, vcfg, model = service
    from gpt2_image_captioning_tpu.core.precision import F32
    from gpt2_image_captioning_tpu.serving import CaptionService

    def make(seed):
        return CaptionService(
            model, vparams, vcfg, batch_size=4, max_length=6, temperature=0.9,
            top_p=0.9, policy=F32, rng=jax.random.PRNGKey(seed),
        )

    a, b = make(7), make(7)
    imgs = _imgs(2, np.random.default_rng(8))
    assert a.caption_arrays(imgs) == b.caption_arrays(imgs)  # reproducible
    assert a._draws == 1
    a.caption_arrays(imgs)
    assert a._draws == 2  # later requests use advanced keys


def test_http_endpoint(service):
    from PIL import Image

    svc, *_ = service
    server = serve_http(svc, host="127.0.0.1", port=0)  # ephemeral port
    port = server.server_address[1]
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    try:
        with urllib.request.urlopen(f"http://127.0.0.1:{port}/healthz", timeout=30) as r:
            health = json.loads(r.read())
        assert health["ok"] is True

        buf = io.BytesIO()
        Image.fromarray(_imgs(1, np.random.default_rng(3))[0]).save(buf, format="JPEG")
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/caption", data=buf.getvalue(), method="POST"
        )
        with urllib.request.urlopen(req, timeout=120) as r:
            out = json.loads(r.read())
        assert isinstance(out["caption"], str)

        # malformed body → 400, not a crash
        bad = urllib.request.Request(
            f"http://127.0.0.1:{port}/caption", data=b"not an image", method="POST"
        )
        with pytest.raises(urllib.error.HTTPError) as ei:
            urllib.request.urlopen(bad, timeout=30)
        assert ei.value.code == 400

        # oversized body → 413 before any read (memory-exhaustion guard)
        huge = urllib.request.Request(
            f"http://127.0.0.1:{port}/caption", data=b"x", method="POST",
            headers={"Content-Length": str(1 << 30)},
        )
        with pytest.raises(urllib.error.HTTPError) as ei:
            urllib.request.urlopen(huge, timeout=30)
        assert ei.value.code == 413
    finally:
        server.shutdown()
        server.server_close()


def test_http_concurrent_clients_coalesce(service):
    """N parallel POSTs are coalesced into shared device batches: every
    client gets the right caption back, and the device-dispatch count stays
    well below one-batch-per-request."""
    from PIL import Image

    svc, vparams, vcfg, model = service
    from gpt2_image_captioning_tpu.core.precision import F32
    from gpt2_image_captioning_tpu.serving import CaptionService

    # fresh service → clean stats counters
    svc2 = CaptionService(
        model, vparams, vcfg, encoder="clip", batch_size=4, max_length=6,
        temperature=0.0, top_p=1.0, policy=F32,
    )
    imgs = _imgs(8, np.random.default_rng(9))
    want = svc2.caption_arrays(imgs)  # ground truth per image (1 warm request)
    base_requests = svc2.stats["requests"]

    server = serve_http(svc2, host="127.0.0.1", port=0, window_ms=200.0)
    port = server.server_address[1]
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    results = [None] * len(imgs)

    def post(i):
        buf = io.BytesIO()
        Image.fromarray(imgs[i]).save(buf, format="PNG")
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/caption", data=buf.getvalue(), method="POST"
        )
        with urllib.request.urlopen(req, timeout=120) as r:
            results[i] = json.loads(r.read())["caption"]

    try:
        threads = [threading.Thread(target=post, args=(i,)) for i in range(len(imgs))]
        for th in threads:
            th.start()
        for th in threads:
            th.join(timeout=120)
        assert results == want  # right caption to the right client
        # 8 clients, batch_size 4, 200 ms window → at most a handful of
        # device dispatches, NOT 8 (the coalescing claim)
        assert svc2.stats["requests"] - base_requests <= 4
    finally:
        server.shutdown()
        server.server_close()


def test_http_continuous_endpoint(service):
    """serve_http_continuous: concurrent POSTs ride the rolling-admission
    pool and return exactly the one-shot captions; per-request ?max_length
    caps the caption; bad bodies 400; /healthz reports engine stats.

    Pallas interpret mode is set GLOBALLY here (not via the thread-local
    ``force_tpu_interpret_mode`` context manager): the server's pump thread
    owns the service, and a thread-local flag would retrace the macro on
    that thread without interpret lowering (→ CPU pallas error)."""
    import contextlib

    from jax._src import config as _jc
    from jax.experimental.pallas import tpu as pltpu
    from PIL import Image

    @contextlib.contextmanager
    def global_interpret():
        st = _jc.pallas_tpu_interpret_mode_context_manager
        prev = st.get_global()
        st.set_global(pltpu.InterpretParams())
        try:
            yield
        finally:
            st.set_global(prev)

    from gpt2_image_captioning_tpu.embeddings.preprocess import resize_and_crop
    from gpt2_image_captioning_tpu.serving import (
        ContinuousCaptionService,
        serve_http_continuous,
    )

    _, vparams, vcfg, model = service
    csvc = ContinuousCaptionService(
        model, vparams, vcfg, encoder="clip", slots=3, segment=2, bursts=2,
        admit=2, max_length=6,
    )
    imgs = _imgs(6, np.random.default_rng(11))
    with global_interpret():
        # ground truth through the service itself; the pump thread traces
        # under the same (global) interpret setting
        want = csvc.caption_arrays(imgs)
        # capped ground truth from the one-shot token matrix
        prepped = np.stack([resize_and_crop(im, csvc.spec) for im in imgs])
        emb = csvc._encode(vparams, jnp.asarray(prepped))
        ids = np.asarray(model.generate(emb, max_length=6, temperature=0.0))
        want_capped = model.tokenizer.batch_decode(
            ids[:1, :2], skip_special_tokens=True
        )[0]

        server = serve_http_continuous(csvc, host="127.0.0.1", port=0)
        port = server.server_address[1]
        t = threading.Thread(target=server.serve_forever, daemon=True)
        t.start()
        results = [None] * len(imgs)

        def post(i):
            buf = io.BytesIO()
            Image.fromarray(imgs[i]).save(buf, format="PNG")
            req = urllib.request.Request(
                f"http://127.0.0.1:{port}/caption", data=buf.getvalue(),
                method="POST",
            )
            with urllib.request.urlopen(req, timeout=120) as r:
                results[i] = json.loads(r.read())["caption"]

        try:
            threads = [
                threading.Thread(target=post, args=(i,)) for i in range(len(imgs))
            ]
            for th in threads:
                th.start()
            for th in threads:
                th.join(timeout=120)
            assert results == want  # right caption to the right client

            # per-request max_length through the query string
            buf = io.BytesIO()
            Image.fromarray(imgs[0]).save(buf, format="PNG")
            req = urllib.request.Request(
                f"http://127.0.0.1:{port}/caption?max_length=2",
                data=buf.getvalue(), method="POST",
            )
            with urllib.request.urlopen(req, timeout=120) as r:
                assert json.loads(r.read())["caption"] == want_capped

            # out-of-range max_length → 400
            bad_len = urllib.request.Request(
                f"http://127.0.0.1:{port}/caption?max_length=99",
                data=buf.getvalue(), method="POST",
            )
            with pytest.raises(urllib.error.HTTPError) as ei:
                urllib.request.urlopen(bad_len, timeout=30)
            assert ei.value.code == 400

            # malformed body → 400, server stays up
            bad = urllib.request.Request(
                f"http://127.0.0.1:{port}/caption", data=b"junk", method="POST"
            )
            with pytest.raises(urllib.error.HTTPError) as ei:
                urllib.request.urlopen(bad, timeout=30)
            assert ei.value.code == 400

            with urllib.request.urlopen(
                f"http://127.0.0.1:{port}/healthz", timeout=30
            ) as r:
                health = json.loads(r.read())
            assert health["ok"] is True and health["images"] >= 13
        finally:
            server.shutdown()
            server.server_close()


def test_service_dp_mesh_matches_single_device(service):
    """CaptionService with a dp-only mesh: the encode batch is dp-sharded and
    the decode runs generate's fused dp shard_map path — captions must match
    the single-device service exactly."""
    from jax.experimental.pallas import tpu as pltpu

    from gpt2_image_captioning_tpu.core.mesh import MeshSpec, create_mesh
    from gpt2_image_captioning_tpu.core.precision import F32

    svc, vparams, vcfg, model = service
    mesh = create_mesh(MeshSpec(dp=4, tp=1))
    dsvc = CaptionService(
        model, vparams, vcfg, encoder="clip", batch_size=4, max_length=6,
        temperature=0.0, top_p=1.0, policy=F32, mesh=mesh,
    )
    rng = np.random.default_rng(2)
    imgs = _imgs(6, rng)  # spans two device batches, padded tail
    with pltpu.force_tpu_interpret_mode():
        got = dsvc.caption_arrays(imgs)
    want = svc.caption_arrays(_imgs(6, np.random.default_rng(2)))
    assert got == want

    with pytest.raises(ValueError, match="divide over dp"):
        CaptionService(
            model, vparams, vcfg, encoder="clip", batch_size=6, mesh=mesh
        )
