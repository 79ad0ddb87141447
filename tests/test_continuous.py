"""Continuous batching: per-row start windows in the fused decode kernel and
the rolling-admission serving loop built on them.

The reference has no serving at all (its decode is a notebook loop,
/root/reference/src/models.py:389-469); continuous batching is this
framework's production-serving capability add: a freed batch row admits a
queued request mid-flight by writing its prefix into the row's past cache
slots [idx-p, idx) and masking attention to [start_r, idx), so every row
still appends at the same cache position.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gpt2_image_captioning_tpu.core.precision import F32
from gpt2_image_captioning_tpu.models import gpt2
from gpt2_image_captioning_tpu.ops import decode_step as DS


def _cfg():
    return gpt2.GPT2Config(
        vocab_size=293, n_positions=128, n_embd=32, n_layer=2, n_head=2
    )


def test_fused_step_start_matches_independent_rows():
    """Rows with different admission ages (start offsets) produce exactly the
    tokens each row would produce decoded alone with its own prefix."""
    cfg = _cfg()
    params = gpt2.init(jax.random.PRNGKey(0), cfg)
    packed = DS.pack_decode_weights(params, compute_dtype=jnp.float32)
    rng = np.random.default_rng(1)
    p_lens = [3, 5, 7]
    idx0 = 15  # all rows append here; oldest row's window begins at 8 → the
    # chunk walk's c0 skips chunk 0 entirely (ct=8), exercising the skip path
    tpad = 32
    steps = 3

    # standalone decodes, one row each
    prefixes = [
        jnp.asarray(rng.normal(size=(1, p, cfg.n_embd)).astype(np.float32))
        for p in p_lens
    ]
    solo_tokens = []
    solo_caches = []
    for p, prefix in zip(p_lens, prefixes):
        cache = gpt2.init_cache(cfg, 1, tpad)
        logits, cache = gpt2.forward_cached(
            params, cfg, prefix, cache, fresh_prefill=True
        )
        tok = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        toks = [int(tok[0])]
        for _ in range(steps):
            iidx = cache["index"]
            x0 = gpt2.embed_tokens(params, tok[:, None])[:, 0] + params["wpe"][iidx]
            tok, kc, vc = DS.fused_decode_step(
                packed, x0.astype(jnp.float32), cache["k"], cache["v"], iidx,
                n_head=cfg.n_head, vocab=cfg.vocab_size, interpret=True,
            )
            cache = {"k": kc, "v": vc, "index": iidx + 1}
            toks.append(int(tok[0]))
        solo_tokens.append(toks)
        solo_caches.append(cache)

    # combined batch: each row's prefill K/V shifted to [idx0 - p, idx0)
    b = len(p_lens)
    k = jnp.zeros((cfg.n_layer, tpad, b, cfg.n_embd), jnp.float32)
    v = jnp.zeros_like(k)
    start = jnp.asarray([idx0 - p for p in p_lens], jnp.int32)
    first_toks = []
    for r, (p, prefix) in enumerate(zip(p_lens, prefixes)):
        cache = gpt2.init_cache(cfg, 1, tpad)
        logits, cache = gpt2.forward_cached(
            params, cfg, prefix, cache, fresh_prefill=True
        )
        first_toks.append(int(jnp.argmax(logits, axis=-1)[0]))
        k = k.at[:, idx0 - p : idx0, r, :].set(cache["k"][:, :p, 0, :])
        v = v.at[:, idx0 - p : idx0, r, :].set(cache["v"][:, :p, 0, :])

    assert [t[0] for t in solo_tokens] == first_toks
    tok = jnp.asarray(first_toks, jnp.int32)
    idx = jnp.asarray(idx0, jnp.int32)
    for step in range(steps):
        local = idx - start  # per-row local position for wpe
        x0 = (
            gpt2.embed_tokens(params, tok[:, None])[:, 0]
            + params["wpe"][local]
        )
        tok, k, v = DS.fused_decode_step(
            packed, x0.astype(jnp.float32), k, v, idx,
            n_head=cfg.n_head, vocab=cfg.vocab_size, interpret=True,
            start=start,
        )
        idx = idx + 1
        for r in range(b):
            assert int(tok[r]) == solo_tokens[r][step + 1], (r, step)

    # written cache rows equal the standalone rows (shifted)
    for r, p in enumerate(p_lens):
        solo = solo_caches[r]
        np.testing.assert_allclose(
            np.asarray(k[:, idx0 : idx0 + steps, r, :]),
            np.asarray(solo["k"][:, p : p + steps, 0, :]),
            atol=1e-6, rtol=1e-6,
        )


def _tiny_model():
    from gpt2_image_captioning_tpu.models import captioner as C
    from gpt2_image_captioning_tpu.models import mapping as M

    gcfg = _cfg()
    mcfg = M.MLPMappingConfig(prefix_length=4, embed_dim=16, gpt_dim=32)
    ccfg = C.CaptionerConfig(gpt2=gcfg, mapping=mcfg, eos_token_id=292)
    trainable, frozen = C.init_params(jax.random.PRNGKey(5), ccfg)
    return ccfg, trainable, frozen


def test_segment_admission_matches_one_shot_generate():
    """Requests admitted into a live batch at different times produce exactly
    the captions one-shot generate() yields for the same embeddings."""
    from jax.experimental.pallas import tpu as pltpu

    from gpt2_image_captioning_tpu.models import captioner as C

    ccfg, trainable, frozen = _tiny_model()
    gp = C._gpt(trainable, frozen)
    p = ccfg.mapping.prefix_length
    s_slots, t_max, seg, max_new = 4, 64, 4, 10
    rng = np.random.default_rng(11)
    embs = jnp.asarray(rng.normal(size=(6, 16)).astype(np.float32))

    with pltpu.force_tpu_interpret_mode():
        want = C.generate(
            trainable, frozen, ccfg, embs, max_length=max_new,
            temperature=0.0, use_pallas_decode=True,
        )

        packed = C.prepare_decode_weights(trainable, frozen, ccfg, policy=F32)
        k = jnp.zeros((ccfg.gpt2.n_layer, t_max, s_slots, ccfg.gpt2.n_embd), jnp.float32)
        v = jnp.zeros_like(k)
        idx = jnp.asarray(p, jnp.int32)
        start = jnp.full((s_slots,), p, jnp.int32)
        prev = jnp.zeros((s_slots,), jnp.int32)
        finished = jnp.ones((s_slots,), bool)  # all slots empty

        emitted = {}  # req -> [tokens]
        slot_req = [-1] * s_slots
        queue = list(range(6))

        def admit(rows_live):
            nonlocal k, v, idx, start, prev, finished
            n = len(rows_live)
            reqs = [queue.pop(0) for _ in range(min(n, len(queue)))]
            if not reqs:
                return
            rows = rows_live[: len(reqs)]
            pad = n - len(reqs)
            rows_a = jnp.asarray(rows + [rows[0]] * pad, jnp.int32)
            valid = jnp.asarray([True] * len(reqs) + [False] * pad)
            emb_a = embs[jnp.asarray(reqs + [reqs[0]] * pad)]
            first, k, v = C.admit_prefill(
                trainable, frozen, ccfg, emb_a, k, v, idx, rows_a, valid,
                policy=F32,
            )
            first = np.asarray(first)
            sa = np.array(start)
            fa = np.array(finished)
            pa = np.array(prev)
            for i, (req, row) in enumerate(zip(reqs, rows)):
                slot_req[row] = req
                emitted[req] = [int(first[i])]
                sa[row] = int(idx) - p
                fa[row] = emitted[req][-1] == ccfg.eos_token_id
                pa[row] = int(first[i])
            start, finished, prev = (
                jnp.asarray(sa), jnp.asarray(fa), jnp.asarray(pa)
            )

        # staggered admission: 2 slots now, the rest as slots free up
        admit([0, 1])
        guard = 0
        while (queue or any(r >= 0 for r in slot_req)) and guard < 60:
            guard += 1
            toks, k, v, idx, prev, finished = C.decode_segment(
                packed, gp["wte"], gp["wpe"], k, v, idx, start, prev, finished,
                cfg=ccfg, steps=seg, policy=F32,
            )
            toks = np.asarray(toks)
            fa = np.array(finished)
            freed = []
            for row in range(s_slots):
                req = slot_req[row]
                if req < 0:
                    continue
                for t in range(seg):
                    if len(emitted[req]) >= max_new:
                        break
                    tok = int(toks[row, t])
                    emitted[req].append(tok)
                    if tok == ccfg.eos_token_id:
                        break
                if (
                    len(emitted[req]) >= max_new
                    or emitted[req][-1] == ccfg.eos_token_id
                ):
                    slot_req[row] = -1
                    freed.append(row)
            if freed and queue and int(idx) + max_new + seg < t_max:
                admit(freed)
            # host-side finished merge (max_new cutoffs)
            fa2 = fa.copy()
            for row in range(s_slots):
                if slot_req[row] < 0:
                    fa2[row] = True
            finished = jnp.asarray(fa2)
        assert guard < 60, "continuous loop did not drain"

    want_np = np.asarray(want)
    for req in range(6):
        got = emitted[req]
        # one-shot generate pads with EOS after finish; compare the prefix
        ref = list(want_np[req][: len(got)])
        assert got == [int(x) for x in ref], (req, got, ref)


def test_continuous_service_matches_one_shot(tmp_path):
    """ContinuousCaptionService == one-shot generate_captions for every
    request, across staggered admission, cache compaction (tiny t_max) and
    pool reuse after a full drain."""
    from jax.experimental.pallas import tpu as pltpu

    from gpt2_image_captioning_tpu.core.precision import F32
    from gpt2_image_captioning_tpu.embeddings.preprocess import (
        normalize_on_device, resize_and_crop,
    )
    from gpt2_image_captioning_tpu.models import captioner as C
    from gpt2_image_captioning_tpu.models import clip as CL
    from gpt2_image_captioning_tpu.models import mapping as M
    from gpt2_image_captioning_tpu.serving import ContinuousCaptionService

    from helpers import tiny_tokenizer

    vcfg = CL.CLIPVisionConfig.tiny()
    vparams = CL.init_vision(jax.random.PRNGKey(0), vcfg)
    tok = tiny_tokenizer()
    gcfg = gpt2.GPT2Config(
        vocab_size=len(tok.encoder), n_positions=64, n_embd=32, n_layer=2,
        n_head=2,
    )
    mcfg = M.MLPMappingConfig(
        prefix_length=2, embed_dim=vcfg.projection_dim, gpt_dim=32
    )
    ccfg = C.CaptionerConfig(
        gpt2=gcfg, mapping=mcfg, eos_token_id=len(tok.encoder) - 1
    )
    model = C.ImageCaptioningModel(ccfg, tokenizer=tok)

    svc = ContinuousCaptionService(
        model, vparams, vcfg, encoder="clip", slots=3, segment=2, bursts=2,
        admit=2, max_length=6,
    )
    # minimal capacity: p=2 + max_length=6 + bursts*segment=4 → t_max=16;
    # idx grows 4/macro from 8 — every later macro entry runs compaction
    assert svc.t_max == 16

    rng = np.random.default_rng(7)
    imgs = [
        rng.integers(0, 255, size=(40 + 5 * i, 50 - 2 * i, 3)).astype(np.uint8)
        for i in range(10)
    ]

    # ground truth: one-shot greedy over the same preprocessed embeddings
    u8 = np.stack([resize_and_crop(im, svc.spec) for im in imgs])

    @jax.jit
    def enc(vp, batch):
        px = normalize_on_device(batch, svc.spec)
        return CL.encode_image(vp, vcfg, px, policy=F32, normalize=True)

    emb = enc(vparams, jnp.asarray(u8))
    want = model.generate_captions(emb, max_length=6, temperature=0.0)

    with pltpu.force_tpu_interpret_mode():
        got = svc.caption_arrays(imgs)
        assert got == want
        assert svc.stats["images"] == 10
        assert svc.stats["macros"] > 2  # staggered admission, not one batch
        # occupancy telemetry (round-5 starvation diagnostic): present and
        # sane — this burst admits 10 requests into 3 slots, so the pool
        # runs substantially occupied across the run
        assert 0.0 < svc.stats["occupancy"] <= 1.0
        # pool is fully drained and reusable (idle rebase path)
        assert svc.step() == {}
        got2 = svc.caption_arrays(imgs[:2])
        assert got2 == want[:2]

        # embedding intake (no vision tower) + per-request max_length caps,
        # mixed with an image submission in the same admission bucket
        ids = np.asarray(model.generate(emb, max_length=6, temperature=0.0))
        caps_len = [3, 1, 6]
        rids = [
            svc.submit_embedding(np.asarray(emb[i]), max_length=caps_len[i])
            for i in range(3)
        ]
        rid_img = svc.submit_array(imgs[4])
        svc.drain()
        for i, rid in enumerate(rids):
            want_i = tok.batch_decode(
                ids[i : i + 1, : caps_len[i]], skip_special_tokens=True
            )[0]
            assert svc.pop_result(rid) == want_i, (i, caps_len[i])
        assert svc.pop_result(rid_img) == want[4]


def test_continuous_service_int8():
    """decode_precision="int8" through the macro engine: W8A8 packed weights
    + per-row start windows compose; captions match the one-shot int8 fused
    decode for every request."""
    from jax.experimental.pallas import tpu as pltpu

    from gpt2_image_captioning_tpu.models import captioner as C
    from gpt2_image_captioning_tpu.serving import ContinuousCaptionService

    from helpers import tiny_tokenizer

    tok = tiny_tokenizer()
    gcfg = gpt2.GPT2Config(
        vocab_size=len(tok.encoder), n_positions=64, n_embd=32, n_layer=2,
        n_head=2,
    )
    from gpt2_image_captioning_tpu.models import mapping as M

    mcfg = M.MLPMappingConfig(prefix_length=2, embed_dim=8, gpt_dim=32)
    ccfg = C.CaptionerConfig(
        gpt2=gcfg, mapping=mcfg, eos_token_id=len(tok.encoder) - 1
    )
    model = C.ImageCaptioningModel(ccfg, tokenizer=tok)
    rng = np.random.default_rng(33)
    embs = rng.normal(size=(5, 8)).astype(np.float32)

    with pltpu.force_tpu_interpret_mode():
        tr, fz, pol = model.decode_params("bf16")
        ids = np.asarray(C.generate(
            tr, fz, ccfg, jnp.asarray(embs), max_length=6, temperature=0.0,
            top_p=1.0, policy=pol, decode_quant=True,
        ))
        want = tok.batch_decode(ids, skip_special_tokens=True)

        svc = ContinuousCaptionService(
            model, None, None, slots=3, segment=2, bursts=2, admit=2,
            max_length=6, decode_precision="int8",
        )
        rids = [svc.submit_embedding(e) for e in embs]
        svc.drain()
        got = [svc.pop_result(r) for r in rids]
    assert got == want


def test_continuous_service_sampled():
    """Sampled continuous serving: near-zero temperature reproduces greedy
    token-for-token; temperature 1.0 is deterministic per (seed, submission
    order) and re-draws under a different seed."""
    from jax.experimental.pallas import tpu as pltpu

    from gpt2_image_captioning_tpu.models import captioner as C
    from gpt2_image_captioning_tpu.serving import ContinuousCaptionService

    from helpers import tiny_tokenizer

    tok = tiny_tokenizer()
    gcfg = gpt2.GPT2Config(
        vocab_size=len(tok.encoder), n_positions=64, n_embd=32, n_layer=2,
        n_head=2,
    )
    from gpt2_image_captioning_tpu.models import mapping as M

    mcfg = M.MLPMappingConfig(prefix_length=2, embed_dim=8, gpt_dim=32)
    ccfg = C.CaptionerConfig(
        gpt2=gcfg, mapping=mcfg, eos_token_id=len(tok.encoder) - 1
    )
    model = C.ImageCaptioningModel(ccfg, tokenizer=tok)
    rng = np.random.default_rng(21)
    embs = rng.normal(size=(5, 8)).astype(np.float32)

    def run(temperature, top_p, seed):
        svc = ContinuousCaptionService(
            model, None, None, slots=3, segment=2, bursts=2, admit=2,
            max_length=6, temperature=temperature, top_p=top_p, seed=seed,
        )
        rids = [svc.submit_embedding(e) for e in embs]
        svc.drain()
        return [svc.pop_result(r) for r in rids]

    with pltpu.force_tpu_interpret_mode():
        want = model.generate_captions(
            jnp.asarray(embs), max_length=6, temperature=0.0
        )
        # temperature → 0 limit: the categorical over scaled logits is argmax
        assert run(1e-4, 0.9, 0) == want
        # determinism per (seed, submission order); fresh noise across seeds
        a1 = run(1.0, 0.9, 3)
        a2 = run(1.0, 0.9, 3)
        assert a1 == a2
        b = run(1.0, 0.9, 4)
        assert b != a1  # 5 requests × 6 draws over ~270 tokens: collision ≈ 0


def test_fused_step_start_zeros_is_default():
    """start=zeros is bit-identical to omitting start."""
    cfg = _cfg()
    params = gpt2.init(jax.random.PRNGKey(2), cfg)
    packed = DS.pack_decode_weights(params, compute_dtype=jnp.float32)
    rng = np.random.default_rng(3)
    b, p_len = 4, 6
    prefix = jnp.asarray(rng.normal(size=(b, p_len, cfg.n_embd)).astype(np.float32))
    cache = gpt2.init_cache(cfg, b, p_len + 4)
    logits, cache = gpt2.forward_cached(params, cfg, prefix, cache, fresh_prefill=True)
    tok = jnp.argmax(logits, axis=-1).astype(jnp.int32)
    idx = cache["index"]
    x0 = gpt2.embed_tokens(params, tok[:, None])[:, 0] + params["wpe"][idx]

    a, ka, va = DS.fused_decode_step(
        packed, x0.astype(jnp.float32), cache["k"], cache["v"], idx,
        n_head=cfg.n_head, vocab=cfg.vocab_size, interpret=True,
    )
    z, kz, vz = DS.fused_decode_step(
        packed, x0.astype(jnp.float32), cache["k"], cache["v"], idx,
        n_head=cfg.n_head, vocab=cfg.vocab_size, interpret=True,
        start=jnp.zeros((b,), jnp.int32),
    )
    np.testing.assert_array_equal(np.asarray(a), np.asarray(z))
    np.testing.assert_array_equal(np.asarray(ka), np.asarray(kz))


def test_continuous_per_request_sampling():
    """Every pool row decodes with ITS OWN (temperature, top_p): greedy and
    sampled requests mix in one pool; greedy rows are exactly one-shot
    greedy; sampled rows are deterministic per seed and re-draw across
    seeds; a service-level sampled config equals the same values passed
    per-request; requesting temperature on a pure-greedy service raises."""
    from jax.experimental.pallas import tpu as pltpu

    from gpt2_image_captioning_tpu.models import captioner as C
    from gpt2_image_captioning_tpu.models import mapping as M
    from gpt2_image_captioning_tpu.serving import ContinuousCaptionService

    from helpers import tiny_tokenizer

    tok = tiny_tokenizer()
    gcfg = gpt2.GPT2Config(
        vocab_size=len(tok.encoder), n_positions=64, n_embd=32, n_layer=2,
        n_head=2,
    )
    mcfg = M.MLPMappingConfig(prefix_length=2, embed_dim=8, gpt_dim=32)
    ccfg = C.CaptionerConfig(
        gpt2=gcfg, mapping=mcfg, eos_token_id=len(tok.encoder) - 1
    )
    model = C.ImageCaptioningModel(ccfg, tokenizer=tok)
    rng = np.random.default_rng(33)
    embs = rng.normal(size=(6, 8)).astype(np.float32)

    def make(seed, **kw):
        return ContinuousCaptionService(
            model, None, None, slots=3, segment=2, bursts=2, admit=2,
            max_length=6, seed=seed, **kw,
        )

    def run_mixed(seed):
        svc = make(seed, per_request_sampling=True)  # greedy default
        rids = []
        for i, e in enumerate(embs):
            if i % 2 == 0:
                rids.append(svc.submit_embedding(e))  # service default: greedy
            else:
                rids.append(
                    svc.submit_embedding(e, temperature=1.0, top_p=0.9)
                )
        svc.drain()
        return [svc.pop_result(r) for r in rids]

    with pltpu.force_tpu_interpret_mode():
        want = model.generate_captions(
            jnp.asarray(embs), max_length=6, temperature=0.0
        )
        a1 = run_mixed(3)
        a2 = run_mixed(3)
        assert a1 == a2  # deterministic per (seed, submission order)
        assert a1[0::2] == want[0::2]  # greedy rows EXACT despite mixing
        b = run_mixed(4)
        assert b[0::2] == want[0::2]  # greedy rows seed-independent
        assert b[1::2] != a1[1::2]  # sampled rows re-draw across seeds

        # explicit temperature=0 per request == greedy default rows
        svc = make(0, per_request_sampling=True)
        rid = svc.submit_embedding(embs[0], temperature=0.0)
        svc.drain()
        assert svc.pop_result(rid) == want[0]

        # service-level sampled values == the same values per-request
        svc_a = make(5, temperature=0.9, top_p=0.8)
        ra = [svc_a.submit_embedding(e) for e in embs]
        svc_a.drain()
        svc_b = make(5, per_request_sampling=True)
        rb = [svc_b.submit_embedding(e, temperature=0.9, top_p=0.8) for e in embs]
        svc_b.drain()
        assert [svc_a.pop_result(r) for r in ra] == [
            svc_b.pop_result(r) for r in rb
        ]

    # greedy program never materializes logits → per-request sampling is a
    # construction-time choice
    svc = make(0)
    with pytest.raises(ValueError, match="per_request_sampling"):
        svc.submit_embedding(embs[0], temperature=1.0)
    with pytest.raises(ValueError, match="top_p"):
        svc.submit_embedding(embs[0], top_p=1.5)


def test_continuous_sample_in_kernel():
    """``sample_in_kernel=True`` compiles the in-kernel-draw macro
    (speculative-accept nucleus sampling in ops/decode_step.py): greedy
    requests stay EXACTLY one-shot greedy even mixed with sampled ones (the
    kernel takes the per-row argmax for temp-0 rows), sampled rows replay
    per (seed, submission order), and per-request top_p < 0.5 is rejected at
    submit.  Under the interpreter's zero PRNG bits the in-kernel draw
    degenerates to the argmax — hardware stochasticity is validated on-chip
    by scripts/kernel_sample_ab.py."""
    from jax.experimental.pallas import tpu as pltpu

    from gpt2_image_captioning_tpu.models import captioner as C
    from gpt2_image_captioning_tpu.models import mapping as M
    from gpt2_image_captioning_tpu.serving import ContinuousCaptionService

    from helpers import tiny_tokenizer

    tok = tiny_tokenizer()
    gcfg = gpt2.GPT2Config(
        vocab_size=len(tok.encoder), n_positions=64, n_embd=32, n_layer=2,
        n_head=2,
    )
    mcfg = M.MLPMappingConfig(prefix_length=2, embed_dim=8, gpt_dim=32)
    ccfg = C.CaptionerConfig(
        gpt2=gcfg, mapping=mcfg, eos_token_id=len(tok.encoder) - 1
    )
    model = C.ImageCaptioningModel(ccfg, tokenizer=tok)
    rng = np.random.default_rng(41)
    embs = rng.normal(size=(6, 8)).astype(np.float32)

    def make(seed, **kw):
        return ContinuousCaptionService(
            model, None, None, slots=3, segment=2, bursts=2, admit=2,
            max_length=6, seed=seed, per_request_sampling=True,
            sample_in_kernel=True, **kw,
        )

    def run_mixed(seed):
        svc = make(seed)
        rids = []
        for i, e in enumerate(embs):
            if i % 2 == 0:
                rids.append(svc.submit_embedding(e))  # greedy default
            else:
                rids.append(svc.submit_embedding(e, temperature=1.0, top_p=0.9))
        svc.drain()
        return [svc.pop_result(r) for r in rids]

    with pltpu.force_tpu_interpret_mode():
        want = model.generate_captions(
            jnp.asarray(embs), max_length=6, temperature=0.0
        )
        a1 = run_mixed(3)
        a2 = run_mixed(3)
        assert a1 == a2  # deterministic per (seed, submission order)
        assert a1[0::2] == want[0::2]  # greedy rows EXACT despite mixing

    svc = make(0)
    with pytest.raises(ValueError, match="top_p >= 0.5"):
        svc.submit_embedding(embs[0], temperature=1.0, top_p=0.3)


def test_macro_step_dp_matches_independent_pools():
    """macro_step_dp (dp=4 shard_map, per-device sub-pools) emits exactly
    what four independent single-pool macro_steps emit on the same request
    slices — the mesh split must be invisible to tokens, uids, admissions
    and the per-pool idx/t counters."""
    from jax.experimental.pallas import tpu as pltpu

    from gpt2_image_captioning_tpu.core.mesh import MeshSpec, create_mesh
    from gpt2_image_captioning_tpu.models import captioner as C
    from gpt2_image_captioning_tpu.models import continuous as CE

    ccfg, trainable, frozen = _tiny_model()
    p = ccfg.mapping.prefix_length
    dp, slots, seg, bursts, admit, max_len = 4, 8, 2, 2, 2, 4
    t_max = 16
    rng = np.random.default_rng(7)
    emb_q = jnp.asarray(rng.normal(size=(8, 16)).astype(np.float32))
    cap_q = jnp.full((8,), max_len, jnp.int32)
    uid_q = jnp.arange(8, dtype=jnp.int32)
    kw = dict(cfg=ccfg, policy=F32, seg=seg, bursts=bursts, admit=admit)

    with pltpu.force_tpu_interpret_mode():
        packed = C.prepare_decode_weights(trainable, frozen, ccfg, policy=F32)

        mesh = create_mesh(MeshSpec(dp=dp, tp=1))
        st_dp = CE.init_state_dp(ccfg, dp, slots, t_max, p, F32)
        st_dp2, out_dp = CE.macro_step_dp(
            mesh, packed, trainable, frozen, st_dp, emb_q, cap_q, uid_q,
            jnp.full((dp,), 2, jnp.int32), **kw,
        )
        out_dp = np.asarray(out_dp)

        per = slots // dp
        for i in range(dp):
            st_i = CE.init_state(ccfg, per, t_max, p, F32)
            st_i2, out_i = CE.macro_step(
                packed, trainable, frozen, st_i,
                emb_q[2 * i : 2 * i + 2], cap_q[2 * i : 2 * i + 2],
                uid_q[2 * i : 2 * i + 2], jnp.asarray(2, jnp.int32), **kw,
            )
            np.testing.assert_array_equal(
                out_dp[:, :, per * i : per * (i + 1)], np.asarray(out_i)
            )
            assert int(st_dp2["idx"][i]) == int(st_i2["idx"])
            assert int(st_dp2["t"][i]) == int(st_i2["t"])
            np.testing.assert_array_equal(
                np.asarray(st_dp2["uid"][per * i : per * (i + 1)]),
                np.asarray(st_i2["uid"]),
            )


def test_continuous_pipeline_depth2_matches_one_shot():
    """pipeline_depth=2 (two macros in flight) only changes scheduling:
    every caption stays token-exact vs one-shot greedy, all requests drain,
    and stats stay coherent."""
    from jax.experimental.pallas import tpu as pltpu

    from gpt2_image_captioning_tpu.models import captioner as C
    from gpt2_image_captioning_tpu.serving import ContinuousCaptionService

    from helpers import tiny_tokenizer

    tok = tiny_tokenizer()
    gcfg = gpt2.GPT2Config(
        vocab_size=len(tok.encoder), n_positions=64, n_embd=32, n_layer=2,
        n_head=2,
    )
    from gpt2_image_captioning_tpu.models import mapping as M

    mcfg = M.MLPMappingConfig(prefix_length=2, embed_dim=8, gpt_dim=32)
    ccfg = C.CaptionerConfig(
        gpt2=gcfg, mapping=mcfg, eos_token_id=len(tok.encoder) - 1
    )
    model = C.ImageCaptioningModel(ccfg, tokenizer=tok)
    rng = np.random.default_rng(29)
    embs = rng.normal(size=(9, 8)).astype(np.float32)

    svc = ContinuousCaptionService(
        model, None, None, slots=3, segment=2, bursts=2, admit=2,
        max_length=6, pipeline_depth=2,
    )
    with pltpu.force_tpu_interpret_mode():
        want = model.generate_captions(
            jnp.asarray(embs), max_length=6, temperature=0.0
        )
        rids = [svc.submit_embedding(e) for e in embs]
        svc.drain()
        got = [svc.pop_result(r) for r in rids]
        assert got == want
        assert svc.stats["images"] == 9
        assert not svc._inflight and not svc.queued and not svc.live
        # pool reusable after drain at depth 2 as well
        rid = svc.submit_embedding(embs[0])
        svc.drain()
        assert svc.pop_result(rid) == want[0]

    with pytest.raises(ValueError, match="pipeline_depth"):
        ContinuousCaptionService(
            model, None, None, slots=3, max_length=6, pipeline_depth=0
        )


def test_continuous_service_dp_mesh_matches_one_shot():
    """Multi-chip continuous serving (dp=4 sub-pools via macro_step_dp):
    greedy captions stay token-exact vs one-shot generate, per-request
    max_length caps hold, unreached entries re-queue correctly, and the
    pool drains + stays reusable."""
    from jax.experimental.pallas import tpu as pltpu

    from gpt2_image_captioning_tpu.core.mesh import MeshSpec, create_mesh
    from gpt2_image_captioning_tpu.models import captioner as C
    from gpt2_image_captioning_tpu.serving import ContinuousCaptionService

    from helpers import tiny_tokenizer

    tok = tiny_tokenizer()
    gcfg = gpt2.GPT2Config(
        vocab_size=len(tok.encoder), n_positions=64, n_embd=32, n_layer=2,
        n_head=2,
    )
    from gpt2_image_captioning_tpu.models import mapping as M

    mcfg = M.MLPMappingConfig(prefix_length=2, embed_dim=8, gpt_dim=32)
    ccfg = C.CaptionerConfig(
        gpt2=gcfg, mapping=mcfg, eos_token_id=len(tok.encoder) - 1
    )
    model = C.ImageCaptioningModel(ccfg, tokenizer=tok)
    rng = np.random.default_rng(31)
    embs = rng.normal(size=(11, 8)).astype(np.float32)
    mesh = create_mesh(MeshSpec(dp=4, tp=1))

    svc = ContinuousCaptionService(
        model, None, None, slots=8, segment=2, bursts=2, admit=2,
        max_length=6, mesh=mesh,
    )
    assert svc._dp == 4 and svc.q_cap % 4 == 0
    with pltpu.force_tpu_interpret_mode():
        want = model.generate_captions(
            jnp.asarray(embs), max_length=6, temperature=0.0
        )
        rids = [svc.submit_embedding(e) for e in embs]
        rid_cap = svc.submit_embedding(embs[0], max_length=3)
        svc.drain()
        got = [svc.pop_result(r) for r in rids]
        assert got == want
        ids0 = np.asarray(
            model.generate(jnp.asarray(embs[:1]), max_length=6, temperature=0.0)
        )
        assert svc.pop_result(rid_cap) == tok.batch_decode(
            ids0[:, :3], skip_special_tokens=True
        )[0]
        assert not svc._inflight and not svc.queued and not svc.live
        # reusable pool after drain
        rid = svc.submit_embedding(embs[1])
        svc.drain()
        assert svc.pop_result(rid) == want[1]

    with pytest.raises(ValueError, match="divide over dp"):
        ContinuousCaptionService(
            model, None, None, slots=6, max_length=6, mesh=mesh
        )


def test_continuous_service_dp_mesh_images_and_sampled():
    """dp-mesh service with IMAGE submissions (encode scatter must land in
    the round-robin staging rows, not submission order) mixed with
    embeddings; plus sampled dp serving: deterministic per (seed,
    submission order, mesh), fresh stream across seeds, near-zero
    temperature reproduces greedy."""
    from jax.experimental.pallas import tpu as pltpu

    from gpt2_image_captioning_tpu.core.mesh import MeshSpec, create_mesh
    from gpt2_image_captioning_tpu.core.precision import F32
    from gpt2_image_captioning_tpu.embeddings.preprocess import (
        normalize_on_device, resize_and_crop,
    )
    from gpt2_image_captioning_tpu.models import captioner as C
    from gpt2_image_captioning_tpu.models import clip as CL
    from gpt2_image_captioning_tpu.models import mapping as M
    from gpt2_image_captioning_tpu.serving import ContinuousCaptionService

    from helpers import tiny_tokenizer

    vcfg = CL.CLIPVisionConfig.tiny()
    vparams = CL.init_vision(jax.random.PRNGKey(0), vcfg)
    tok = tiny_tokenizer()
    gcfg = gpt2.GPT2Config(
        vocab_size=len(tok.encoder), n_positions=64, n_embd=32, n_layer=2,
        n_head=2,
    )
    mcfg = M.MLPMappingConfig(
        prefix_length=2, embed_dim=vcfg.projection_dim, gpt_dim=32
    )
    ccfg = C.CaptionerConfig(
        gpt2=gcfg, mapping=mcfg, eos_token_id=len(tok.encoder) - 1
    )
    model = C.ImageCaptioningModel(ccfg, tokenizer=tok)
    mesh = create_mesh(MeshSpec(dp=4, tp=1))

    rng = np.random.default_rng(11)
    imgs = [
        rng.integers(0, 255, size=(40 + 3 * i, 48 - 2 * i, 3)).astype(np.uint8)
        for i in range(6)
    ]
    svc = ContinuousCaptionService(
        model, vparams, vcfg, encoder="clip", slots=8, segment=2, bursts=2,
        admit=2, max_length=6, mesh=mesh,
    )
    u8 = np.stack([resize_and_crop(im, svc.spec) for im in imgs])

    @jax.jit
    def enc(vp, batch):
        px = normalize_on_device(batch, svc.spec)
        return CL.encode_image(vp, vcfg, px, policy=F32, normalize=True)

    emb = enc(vparams, jnp.asarray(u8))
    with pltpu.force_tpu_interpret_mode():
        want = model.generate_captions(emb, max_length=6, temperature=0.0)
        # interleave image and embedding submissions so staging rows are
        # round-robin-permuted relative to submission order
        rids = []
        for i in range(6):
            if i % 2 == 0:
                rids.append(svc.submit_array(imgs[i]))
            else:
                rids.append(svc.submit_embedding(np.asarray(emb[i])))
        svc.drain()
        assert [svc.pop_result(r) for r in rids] == want

    def run_sampled(seed, temperature=1.0):
        s = ContinuousCaptionService(
            model, None, None, slots=8, segment=2, bursts=2, admit=2,
            max_length=6, temperature=temperature, top_p=0.9, seed=seed,
            mesh=mesh,
        )
        rs = [s.submit_embedding(np.asarray(e)) for e in emb]
        s.drain()
        return [s.pop_result(r) for r in rs]

    with pltpu.force_tpu_interpret_mode():
        assert run_sampled(0, temperature=1e-4) == want  # argmax limit
        a1, a2, b = run_sampled(3), run_sampled(3), run_sampled(4)
        assert a1 == a2
        assert b != a1


def test_continuous_service_dp_mesh_int8():
    """dp-mesh continuous serving composes with decode_precision="int8":
    the replicated W8A8 packed tiles feed every sub-pool's kernel and
    captions match the one-shot int8 fused decode."""
    from jax.experimental.pallas import tpu as pltpu

    from gpt2_image_captioning_tpu.core.mesh import MeshSpec, create_mesh
    from gpt2_image_captioning_tpu.models import captioner as C
    from gpt2_image_captioning_tpu.models import mapping as M
    from gpt2_image_captioning_tpu.serving import ContinuousCaptionService

    from helpers import tiny_tokenizer

    tok = tiny_tokenizer()
    gcfg = gpt2.GPT2Config(
        vocab_size=len(tok.encoder), n_positions=64, n_embd=32, n_layer=2,
        n_head=2,
    )
    mcfg = M.MLPMappingConfig(prefix_length=2, embed_dim=8, gpt_dim=32)
    ccfg = C.CaptionerConfig(
        gpt2=gcfg, mapping=mcfg, eos_token_id=len(tok.encoder) - 1
    )
    model = C.ImageCaptioningModel(ccfg, tokenizer=tok)
    rng = np.random.default_rng(17)
    embs = rng.normal(size=(7, 8)).astype(np.float32)
    mesh = create_mesh(MeshSpec(dp=4, tp=1))

    with pltpu.force_tpu_interpret_mode():
        tr, fz, pol = model.decode_params("bf16")
        ids = np.asarray(C.generate(
            tr, fz, ccfg, jnp.asarray(embs), max_length=6, temperature=0.0,
            top_p=1.0, policy=pol, decode_quant=True,
        ))
        want = tok.batch_decode(ids, skip_special_tokens=True)

        svc = ContinuousCaptionService(
            model, None, None, slots=8, segment=2, bursts=2, admit=2,
            max_length=6, decode_precision="int8", mesh=mesh,
        )
        rids = [svc.submit_embedding(e) for e in embs]
        svc.drain()
        assert [svc.pop_result(r) for r in rids] == want


def test_recommended_inflight_sizing():
    """Population-sizing helper (round-5 occupancy decomposition): the
    formula slots*(1 + 2*macro_steps/expected_len) at the flagship config
    must land between the measured 5x (occ 0.841) and 7x (occ 0.875)
    saturation points, and scale sensibly with caption length."""
    from gpt2_image_captioning_tpu.models import captioner as C
    from gpt2_image_captioning_tpu.models import clip as CL
    from gpt2_image_captioning_tpu.models import mapping as M
    from gpt2_image_captioning_tpu.serving import ContinuousCaptionService

    from helpers import tiny_tokenizer

    vcfg = CL.CLIPVisionConfig.tiny()
    vparams = CL.init_vision(jax.random.PRNGKey(0), vcfg)
    tok = tiny_tokenizer()
    gcfg = gpt2.GPT2Config(
        vocab_size=len(tok.encoder), n_positions=256, n_embd=32, n_layer=2,
        n_head=2,
    )
    mcfg = M.MLPMappingConfig(
        prefix_length=2, embed_dim=vcfg.projection_dim, gpt_dim=32
    )
    ccfg = C.CaptionerConfig(
        gpt2=gcfg, mapping=mcfg, eos_token_id=len(tok.encoder) - 1
    )
    model = C.ImageCaptioningModel(ccfg, tokenizer=tok)
    svc = ContinuousCaptionService(
        model, vparams, vcfg, encoder="clip", slots=128, segment=8, bursts=16,
        admit=32, max_length=50,
    )
    rec = svc.recommended_inflight(expected_len=49)
    assert 5 * 128 < rec < 7 * 128, rec          # between the measured points
    # shorter captions free rows faster -> need more backlog
    assert svc.recommended_inflight(expected_len=10) > rec
    # conservative default = half the cap
    assert svc.recommended_inflight() == svc.recommended_inflight(expected_len=25)


def test_occupancy_responds_to_population():
    """The round-5 root-caused mechanism, pinned in CI: a closed loop with
    only ~1x-slots in-system equilibrates at partial pool occupancy, while
    a population at recommended_inflight() holds the pool near-full — and
    stats["occupancy"] makes the difference observable."""
    from jax.experimental.pallas import tpu as pltpu

    from gpt2_image_captioning_tpu.models import captioner as C
    from gpt2_image_captioning_tpu.models import mapping as M
    from gpt2_image_captioning_tpu.serving import ContinuousCaptionService

    from helpers import tiny_tokenizer

    tok = tiny_tokenizer()
    gcfg = gpt2.GPT2Config(
        vocab_size=len(tok.encoder), n_positions=64, n_embd=32, n_layer=2,
        n_head=2,
    )
    mcfg = M.MLPMappingConfig(prefix_length=2, embed_dim=8, gpt_dim=32)
    ccfg = C.CaptionerConfig(
        gpt2=gcfg, mapping=mcfg, eos_token_id=len(tok.encoder) - 1
    )
    model = C.ImageCaptioningModel(ccfg, tokenizer=tok)
    rng = np.random.default_rng(11)
    emb_pool = rng.normal(size=(64, 8)).astype(np.float32)

    def steady_occupancy(pop, macros=8):
        svc = ContinuousCaptionService(
            model, None, None, slots=4, segment=2, bursts=4, admit=4,
            max_length=6,
        )
        nxt = [0]

        def submit(k):
            for _ in range(k):
                svc.submit_embedding(emb_pool[nxt[0] % len(emb_pool)])
                nxt[0] += 1

        submit(pop)
        with pltpu.force_tpu_interpret_mode():
            for _ in range(3):  # warm to the equilibrium
                submit(len(svc.step()))
            svc._occ_sum, svc._occ_n = 0.0, 0
            for _ in range(macros):
                submit(len(svc.step()))
            occ = svc.stats["occupancy"]
            svc.drain()
        return occ

    starved = steady_occupancy(4)
    rec = None
    svc_probe = ContinuousCaptionService(
        model, None, None, slots=4, segment=2, bursts=4, admit=4, max_length=6
    )
    rec = svc_probe.recommended_inflight(expected_len=6)
    populated = steady_occupancy(rec)
    assert populated > starved + 0.15, (starved, populated, rec)
    # tiny-geometry ceiling: len/(len + seg/2 + stagger) ~ 0.78 at len=6
    assert populated > 0.7, populated


def test_fused_step_per_block_c0_exact_across_blocks():
    """The per-block chunk-skip (blk_c0 scalar-prefetch entries): two batch
    blocks with very different row ages must reproduce the single-block
    result exactly — block 1's rows are young (start high, walk skips
    early chunks for that block only), block 0's are old."""
    cfg = _cfg()
    params = gpt2.init(jax.random.PRNGKey(2), cfg)
    packed = DS.pack_decode_weights(params, compute_dtype=jnp.float32)
    rng = np.random.default_rng(9)
    b, tpad, idx0 = 16, 64, 40
    k = jnp.asarray(rng.normal(size=(cfg.n_layer, tpad, b, cfg.n_embd)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(cfg.n_layer, tpad, b, cfg.n_embd)).astype(np.float32))
    x0 = jnp.asarray(rng.normal(size=(b, cfg.n_embd)).astype(np.float32))
    # block 0 (rows 0-7): old rows, start in [2, 10); block 1 (rows 8-16):
    # young rows, start in [32, 40) — with block_b=8 the second block's
    # blk_c0 skips chunks 0..3 entirely (ct=8)
    start = jnp.asarray(
        [2 + i for i in range(8)] + [32 + i for i in range(8)], jnp.int32
    )
    tok_blocked, kb, vb = DS.fused_decode_step(
        packed, x0, k, v, jnp.asarray(idx0, jnp.int32),
        n_head=cfg.n_head, vocab=cfg.vocab_size, interpret=True,
        start=start, block_b=8,
    )
    tok_single, ks, vs = DS.fused_decode_step(
        packed, x0, k, v, jnp.asarray(idx0, jnp.int32),
        n_head=cfg.n_head, vocab=cfg.vocab_size, interpret=True,
        start=start, block_b=16,
    )
    np.testing.assert_array_equal(np.asarray(tok_blocked), np.asarray(tok_single))
    np.testing.assert_allclose(np.asarray(kb), np.asarray(ks), atol=1e-6)
    # emit-logits mode takes the same skip path: logits must agree too
    lg_b, _, _ = DS.fused_decode_step(
        packed, x0, k, v, jnp.asarray(idx0, jnp.int32),
        n_head=cfg.n_head, vocab=cfg.vocab_size, interpret=True,
        start=start, block_b=8, emit_logits=True,
    )
    lg_s, _, _ = DS.fused_decode_step(
        packed, x0, k, v, jnp.asarray(idx0, jnp.int32),
        n_head=cfg.n_head, vocab=cfg.vocab_size, interpret=True,
        start=start, block_b=16, emit_logits=True,
    )
    np.testing.assert_allclose(np.asarray(lg_b), np.asarray(lg_s), atol=1e-4)
