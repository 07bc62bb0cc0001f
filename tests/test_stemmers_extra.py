"""Differential parity of the clean-room Lovins and Paice-Husk stemmers
and the phonetic (soundex) encoders vs the reference implementations
(ref lang/lovins.py, lang/paicehusk.py, lang/phonetic.py), over
suffix-seeded pseudo-words plus real-word samples."""

from __future__ import annotations

import random

import pytest

LOVINS_SUFFIXES = [
    "alistically", "izationally", "antialness", "ationally", "entiality",
    "iveness", "ization", "arized", "ably", "ibly", "ically", "ation",
    "icism", "ingly", "ities", "otide", "ating", "able", "ible", "ance",
    "ence", "ings", "ious", "less", "ness", "ment", "ful", "est", "ers",
    "ied", "ies", "ily", "ing", "ion", "ism", "ist", "ity", "ize", "al",
    "ar", "ed", "en", "es", "er", "ly", "on", "or", "um", "us", "yl",
    "a", "e", "i", "o", "s", "y", "'s", "s'",
    # recode triggers
    "iev", "uct", "umpt", "rpt", "urs", "istr", "metr", "olv", "ul",
    "bex", "ax", "ex", "ix", "uad", "cid", "end", "ond", "her", "mit",
    "ent", "ert", "et", "yt", "yz",
]

PH_SUFFIXES = [
    "ia", "a", "bb", "ytic", "ic", "nc", "dd", "ied", "ceed", "eed", "ed",
    "hood", "e", "lief", "if", "ing", "iag", "ag", "gg", "th", "guish",
    "ish", "i", "ij", "fuj", "uj", "oj", "hej", "verj", "misj", "nj", "j",
    "ifiabl", "iabl", "abl", "ibl", "bil", "cl", "iful", "ful", "ul",
    "ial", "ual", "al", "ll", "ium", "um", "ism", "mm", "sion", "xion",
    "ion", "ian", "an", "een", "en", "nn", "ship", "pp", "er", "ear",
    "ar", "or", "ur", "rr", "tr", "ier", "ies", "sis", "is", "ness",
    "ss", "ous", "us", "s", "plicat", "at", "ment", "ent", "ant",
    "ript", "orpt", "duct", "sumpt", "cept", "olut", "sist", "ist", "tt",
    "iqu", "ogu", "siv", "eiv", "iv", "bly", "ily", "ply", "ly", "ogy",
    "phy", "omy", "opy", "ity", "ety", "lty", "istry", "ary", "ory",
    "ify", "ncy", "acy", "iz", "yz",
]

REAL_WORDS = """
nationally sitting forest understandable taxation conspiracy running
believes maximum multiply presumably provision siezing knack knacks
conditional connection connections connective university universities
relational organization organizations computing computer computerize
happily classified classify magnesia magnesian apprehension prediction
""".split()


def _pseudo_words(suffixes, n, seed):
    rng = random.Random(seed)
    stems = ["nat", "comput", "str", "believ", "magnes", "conspir", "maxim",
             "rel", "organiz", "understand", "apprehens", "bas", "tranqu",
             "sq", "b", "pre", "kilog", "pseudosc", "ultrab"]
    out = []
    for _ in range(n):
        s = rng.choice(stems)
        if rng.random() < 0.3:
            s += "".join(rng.choice("abcdefghijklmnopqrstuvwxyz")
                         for _ in range(rng.randint(1, 3)))
        out.append(s + rng.choice(suffixes))
    return out


def test_lovins_parity(whoosh):
    from whoosh.lang import lovins as ref

    from whoosh_reloaded_ray.functions.lovins import lovins_stem

    words = REAL_WORDS + _pseudo_words(LOVINS_SUFFIXES, 4000, 3)
    checked = 0
    for w in words:
        try:
            expect = ref.stem(w)
        except IndexError:
            # the reference's condition X reads base[-3] unguarded and
            # crashes on 2-char stems; ours just declines the ending
            lovins_stem(w)  # must not crash
            continue
        checked += 1
        assert lovins_stem(w) == expect, w
    assert checked > 3000


def test_paicehusk_parity(whoosh):
    from whoosh.lang import paicehusk as ref

    from whoosh_reloaded_ray.functions.paicehusk import paicehusk_stem

    words = REAL_WORDS + _pseudo_words(PH_SUFFIXES, 4000, 7)
    checked = 0
    for w in words:
        try:
            expect = ref.stem(w)
        except ValueError:
            # the reference's first_vowel crashes when the (intermediate)
            # stem has no aeiou vowel; ours must still not crash
            paicehusk_stem(w)
            continue
        got = paicehusk_stem(w)
        if expect == "" and got != "":
            # DECLARED DEVIATION: the reference's protect rules (num=0,
            # e.g. -ply/-een/-ss) wipe the stem via stem[:0-0] == "";
            # we implement protect correctly (stem unchanged, stop).
            assert got, (w, got)
            continue
        checked += 1
        assert got == expect, (w, expect, got)
    assert checked > 3000
    # protect rules leave the word intact instead of emptying it
    assert paicehusk_stem("multiply") == "multiply"


def test_soundex_parity(whoosh):
    from whoosh.lang import phonetic as ref

    from whoosh_reloaded_ray.functions.phonetic import (
        soundex_ar, soundex_en, soundex_esp,
    )

    rng = random.Random(13)
    en_words = REAL_WORDS + [
        "".join(rng.choice("abcdefghijklmnopqrstuvwxyz") for _ in range(rng.randint(1, 12)))
        for _ in range(2000)
    ]
    for w in en_words:
        assert soundex_en(w) == ref.soundex_en(w), w

    es_words = ["huevo", "guillermo", "xavier", "cheque", "vaca", "baca",
                "zapato", "psicologia", "accion", "wual", "yerba", "llave"] + [
        "".join(rng.choice("abcdefghijklmnñopqrstuvwxyzáéíóú") for _ in range(rng.randint(1, 10)))
        for _ in range(2000)
    ]
    for w in es_words:
        assert soundex_esp(w) == ref.soundex_esp(w), w

    ar_alphabet = "اأإآبتثجحخدذرزسشصضطظعغفقكلمنهوي"
    ar_words = ["".join(rng.choice(ar_alphabet) for _ in range(rng.randint(2, 8)))
                for _ in range(2000)]
    for w in ar_words:
        assert soundex_ar(w) == ref.soundex_ar(w), w


def test_stemfilter_lovins_paicehusk(ray_session, tmp_path_factory):
    """StemFilter(stemfn=...) end-to-end: index with the lovins /
    paicehusk stemmers and confirm variants collapse to one term."""
    from whoosh_reloaded_ray import compat as wrr
    from whoosh_reloaded_ray.query import Term

    for name, probe_a, probe_b in (
        ("lovins", "nationally", "nation"),
        ("paicehusk", "connection", "connections"),
    ):
        ana = wrr.RegexTokenizer() | wrr.LowercaseFilter() | wrr.StemFilter(stemfn=name)
        schema = wrr.Schema(text=wrr.TEXT(stored=True, analyzer=ana))
        d = str(tmp_path_factory.mktemp(f"stem_{name}"))
        ix = wrr.create_in(d, schema)
        w = ix.writer(num_shards=2, partition_rows=64)
        w.add_document(text=f"the {probe_a} word")
        w.add_document(text=f"a {probe_b} sample")
        w.commit()
        from whoosh_reloaded_ray.functions import lovins, paicehusk

        stem = (lovins.lovins_stem if name == "lovins" else paicehusk.paicehusk_stem)(
            probe_a
        )
        with ix.searcher() as s:
            assert len(s.search(Term("text", stem), limit=None)) == 2, name


def test_lang_registry_parity(whoosh):
    """whoosh_reloaded_ray.lang mirrors the reference whoosh.lang API:
    same language/alias resolution, same stemmer/stopword availability,
    agreeing stemmer outputs on common words."""
    import whoosh.lang as ref

    from whoosh_reloaded_ray import lang as mine

    assert mine.languages == ref.languages
    assert mine.aliases == ref.aliases
    for name in list(ref.aliases) + list(ref.languages) + ["xx"]:
        assert mine.two_letter_code(name) == ref.two_letter_code(name), name
    for lc in ref.languages:
        assert mine.has_stemmer(lc) == ref.has_stemmer(lc), lc
        assert mine.has_stopwords(lc) == ref.has_stopwords(lc), lc
        if not ref.has_stemmer(lc):
            continue
        rs, ms = ref.stemmer_for_language(lc), mine.stemmer_for_language(lc)
        for w in ("national", "running", "universal"):
            assert ms(w) == rs(w), (lc, w)
    # porter alias path
    assert (mine.stemmer_for_language("en_porter")("relational")
            == ref.stemmer_for_language("en_porter")("relational"))
    import pytest as _pytest

    with _pytest.raises(mine.NoStemmer):
        mine.stemmer_for_language("klingon")
