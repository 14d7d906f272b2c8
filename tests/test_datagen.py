"""Draw-sequence pins for the deterministic generator.

The r8 optimization replaced ``rng.choice(seq)`` with
``seq[int(rng.integers(0, len(seq)))]`` in ``_make_doc`` (Generator.choice
with no p/size draws exactly one ``integers(0, len(seq))`` from the bit
stream, so the rewrite is draw-sequence identical — lemma test below).
These fingerprints were computed from the pre-rewrite implementation and
re-verified bit-equal on seven corpora before landing; any future edit
that shifts a single RNG draw, span field, or doc boundary changes them.
"""

from __future__ import annotations

import hashlib
import json

import numpy as np

from har2tree_spark.datagen import _CONTENT_KINDS, GenConfig, gen_docs


def _fingerprint(rows) -> str:
    h = hashlib.sha256()
    for r in rows:
        h.update(json.dumps(r, sort_keys=True).encode())
    return h.hexdigest()[:32]


def test_bench_corpus_fingerprint_pinned():
    # exactly the bench.py q4 corpus: seed=42, 20k docs, max_spans=32
    assert (
        _fingerprint(gen_docs(42, 20000, GenConfig(max_spans=32)))
        == "44ba0c2aac993b6a175c29481f19b805"
    )


def test_default_and_warmup_fingerprints_pinned():
    assert _fingerprint(gen_docs(42, 2000)) == "9a49fce391608664d4f8662fcd45ff0c"
    # bench.py warmup corpus: seed=1, 200 docs, max_spans=16
    assert (
        _fingerprint(gen_docs(1, 200, GenConfig(max_spans=16)))
        == "b5d5c2dbbcfccf71bd5fd204eedbbbf8"
    )


def test_choice_equals_integers_indexing_lemma():
    # the equivalence the _make_doc rewrite relies on: same value AND the
    # bit stream stays aligned afterwards (checked by interleaving draws)
    for s in range(50):
        r1 = np.random.default_rng(np.random.SeedSequence([7, s]))
        r2 = np.random.default_rng(np.random.SeedSequence([7, s]))
        for _ in range(40):
            a = str(r1.choice(_CONTENT_KINDS))
            b = _CONTENT_KINDS[int(r2.integers(0, len(_CONTENT_KINDS)))]
            assert a == b
            assert r1.random() == r2.random()
