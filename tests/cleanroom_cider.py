"""Clean-room CIDEr-D oracle, written directly from the formula in
Vedantam, Lawrence Zitnick & Parikh, *CIDEr: Consensus-based Image
Description Evaluation* (CVPR 2015) — TF-IDF n-gram vectors (eq. 1),
per-order cosine consensus averaged over reference sets (eq. 2-3) — plus
the two CIDEr-D robustness adjustments shipped with the official
coco-caption release: hypothesis-count clipping inside the dot product and
a Gaussian penalty on sentence-length difference (sigma = 6), with
"length" measured in bigrams and the final score scaled by 10.

This module exists so the production scorer
(``gpt2_image_captioning_tpu/evaluation/metrics.py::Cider``) is no longer
guarded only by frozen self-goldens: the two implementations share NO code
and are deliberately structured differently —

================================  =====================================
production ``Cider``              this oracle
================================  =====================================
per-order list of defaultdicts    one flat dict keyed by the gram tuple
                                  (order recovered from ``len(gram)``)
numpy (``np.log``, ``np.e**x``,   pure ``math`` + generator sums
array accumulation)
df from nested comprehension      df via ``Counter.update(set)`` over a
over per-ref count dicts          per-image seen-set
length from the k==1 term-freq    ``max(0, len(tokens) - 1)``
accumulation quirk
sim() mutates a per-k value       pure ``score_pair`` returning a float
array in place
================================  =====================================

Agreement at 1e-12 on a corpus can only come from both independently
implementing the same math.
"""

from __future__ import annotations

import math
from collections import Counter


def _grams(tokens: list[str], k: int) -> Counter:
    return Counter(tuple(tokens[i : i + k]) for i in range(len(tokens) - k + 1))


def cider_d(gts, res, max_n: int = 4, sigma: float = 6.0):
    """``(gts, res)`` as ``{image_id: [caption, ...]}`` → (corpus score,
    {image_id: score})."""
    images = list(gts)
    log_n = math.log(len(images))

    # document frequency: in how many images' REFERENCE sets each gram occurs
    appearances: Counter = Counter()
    for img in images:
        seen: set = set()
        for ref in gts[img]:
            toks = ref.split()
            for k in range(1, max_n + 1):
                seen.update(_grams(toks, k))
        appearances.update(seen)

    def weighted(sentence: str):
        """flat {gram: tf·idf}, per-order L2 norms, bigram length."""
        toks = sentence.split()
        weights: dict = {}
        for k in range(1, max_n + 1):
            for gram, tf in _grams(toks, k).items():
                idf = log_n - math.log(max(1.0, float(appearances[gram])))
                weights[gram] = float(tf) * idf
        norms = [
            math.sqrt(sum(w * w for g, w in weights.items() if len(g) == k))
            for k in range(1, max_n + 1)
        ]
        return weights, norms, max(0, len(toks) - 1)

    def score_pair(hyp, ref) -> float:
        hw, hn, hl = hyp
        rw, rn, rl = ref
        gauss = math.exp(-((hl - rl) ** 2) / (2.0 * sigma * sigma))
        total = 0.0
        for k in range(1, max_n + 1):
            # CIDEr-D: hypothesis weight clipped to the reference's
            dot = sum(
                min(w, rw.get(g, 0.0)) * rw.get(g, 0.0)
                for g, w in hw.items()
                if len(g) == k
            )
            denom = hn[k - 1] * rn[k - 1]
            total += (dot / denom if denom > 0.0 else dot) * gauss
        return total / max_n

    per_image: dict = {}
    for img in images:
        hyp = weighted(res[img][0])
        consensus = sum(score_pair(hyp, weighted(r)) for r in gts[img])
        per_image[img] = consensus / len(gts[img]) * 10.0
    corpus = sum(per_image.values()) / len(images)
    return corpus, per_image
