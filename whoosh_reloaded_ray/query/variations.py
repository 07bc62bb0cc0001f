"""English morphological variation candidates for the Variations query.

The reference (query/terms.py:522-560) calls ``whoosh.lang.morph_en
.variations()``, the LiteMorph_en exception+rule table that deliberately
OVER-generates (e.g. ``pull -> pullment``) and relies on the index
vocabulary to filter to real terms.  ``variations()`` here is backed by
the clean-room LiteMorph implementation
(:mod:`whoosh_reloaded_ray.functions.morph_en`, candidate-set equality
fuzzed vs the reference on 8k+ words); the original compact suffix
toolkit remains available as :func:`toolkit_variations` (fallback /
comparison path).
"""

from __future__ import annotations

_VOWELS = set("aeiou")

# Suffixes recognised when deriving candidate stems from the input word,
# longest first so "renderings" strips "ings" before "s".
_STRIP_SUFFIXES = (
    "ations", "ation", "ingly", "iness", "iest", "ings", "edly", "ness",
    "ment", "ing", "ies", "ily", "ier", "ied", "est", "ful", "ed", "er",
    "es", "ly", "s", "e", "y",
)

# Endings attached to every candidate stem (with orthographic adjustment).
_ADD_SUFFIXES = (
    "", "s", "es", "ed", "ing", "er", "est", "ly", "y", "e",
    "ness", "ment", "ful", "less", "ion", "ation", "ive", "able", "al",
)


def _stems(word: str) -> set:
    """Candidate stems: the word itself plus every plausible de-suffixed
    form (with y-restore, e-restore and doubled-consonant undoubling)."""
    out = {word}
    for suf in _STRIP_SUFFIXES:
        if not word.endswith(suf):
            continue
        stem = word[: len(word) - len(suf)]
        if len(stem) < 2:
            continue
        out.add(stem)
        if suf in ("ies", "ily", "ier", "iest", "ied", "iness"):
            out.add(stem + "y")  # carries -> carry
        if suf in ("ing", "ed", "er", "est", "ation", "ion"):
            out.add(stem + "e")  # making -> make
            if len(stem) >= 2 and stem[-1] == stem[-2] and stem[-1] not in _VOWELS:
                out.add(stem[:-1])  # running -> run
    return out


def _attach(stem: str, suf: str) -> list:
    """Orthographic variants of stem+suf (reference rules attach several
    spellings and let the vocabulary filter)."""
    if not suf:
        return [stem]
    forms = [stem + suf]
    starts_vowel = suf[0] in _VOWELS or suf[0] == "y"
    if starts_vowel:
        if stem.endswith("e"):
            forms.append(stem[:-1] + suf)  # make+ing -> making
        elif len(stem) >= 2 and stem[-1] not in _VOWELS and stem[-2] in _VOWELS:
            forms.append(stem + stem[-1] + suf)  # run+ing -> running
    if stem.endswith("y") and len(stem) > 2 and stem[-2] not in _VOWELS:
        if suf == "s":
            forms.append(stem[:-1] + "ies")  # carry+s -> carries
        elif starts_vowel and suf[0] != "i":
            forms.append(stem[:-1] + "i" + suf)  # carry+ed -> carried
    return forms


def toolkit_variations(word: str) -> set:
    """Original compact-toolkit candidate generator (kept as the
    non-English / fallback path; over-generates by design)."""
    word = word.lower()
    out = {word}
    if not word.isalpha() or len(word) < 3:
        return out
    for stem in _stems(word):
        for suf in _ADD_SUFFIXES:
            for form in _attach(stem, suf):
                if len(form) >= 2:
                    out.add(form)
    return out


def variations(word: str) -> set:
    """Candidate variations of ``word`` — morph_en-exact (reference
    lang/morph_en.py semantics), always including the word itself."""
    from ..functions.morph_en import variations_set

    out = set(variations_set(word.lower()))
    out.add(word.lower())
    return out
