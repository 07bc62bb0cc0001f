"""Candidate-set equality fuzz of the clean-room LiteMorph_en
(functions/morph_en.py) vs the reference lang/morph_en.py, plus the
Variations-query integration."""

from __future__ import annotations

import random


def test_morph_en_equality_fuzz(whoosh):
    from whoosh.lang import morph_en as ref

    from whoosh_reloaded_ray.functions import morph_en as mine

    rng = random.Random(42)
    words = [w for line in ref.exceptions for w in line.split(" ")]
    sufs = ["iness", "eless", "less", "ness", "ous", "ies", "sis", "is",
            "es", "izes", "ises", "ed", "ing", "er", "ers", "est", "ly",
            "ment", "ful", "s", "y", "e", ""]
    stems = ["run", "tokeniz", "happi", "base", "spot", "ach", "judg",
             "cris", "tre", "spoon", "rac", "agre", "bus", "tr", "p",
             "qu", "arch"]
    words += [s + rng.choice(sufs) for s in stems for _ in range(100)]
    words += ["".join(rng.choice("abcdefghijklmnopqrstuvwxyz")
                      for _ in range(rng.randint(1, 12))) for _ in range(7000)]
    assert len(words) > 10_000
    for w in words:
        r, m = ref.variations(w), mine.variations(w)
        assert type(r) is type(m), w
        assert set(r) == set(m), (w, set(r) ^ set(m))
        if isinstance(r, list):
            assert r == m, w


def test_variations_wrapper():
    from whoosh_reloaded_ray.query.variations import variations

    v = variations("PULL")
    assert {"pull", "pulls", "pulled", "pulling", "puller"} <= v
    assert variations("x1") == {"x1"}
