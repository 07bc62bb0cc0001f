"""Porter2 ("English Snowball") stemmer.

Original table-driven implementation of the published algorithm
(snowballstem.org/algorithms/english) matching the OBSERVED behavior of
the reference's transcription (lang/snowball/english.py) — including its
region-synchronization conventions (R1/R2 tracked as suffix-aligned
strings that shrink/grow with each replacement, with the documented
`r2_else` quirks on the ate/ive rewrites) and its special-word table.
Black-box parity-tested against the reference in tests/test_analysis.py.
"""

from __future__ import annotations

from functools import lru_cache

_VOWELS = frozenset("aeiouy")
_DOUBLES = ("bb", "dd", "ff", "gg", "mm", "nn", "pp", "rr", "tt")
_LI_ENDING = frozenset("cdeghkmnrt")

_SPECIAL = {
    "skis": "ski", "skies": "sky", "dying": "die", "lying": "lie",
    "tying": "tie", "idly": "idl", "gently": "gentl", "ugly": "ugli",
    "early": "earli", "only": "onli", "singly": "singl",
    "sky": "sky", "news": "news", "howe": "howe", "atlas": "atlas",
    "cosmos": "cosmos", "bias": "bias", "andes": "andes",
    "inning": "inning", "innings": "inning", "outing": "outing",
    "outings": "outing", "canning": "canning", "cannings": "canning",
    "herring": "herring", "herrings": "herring", "earring": "earring",
    "earrings": "earring", "proceed": "proceed", "proceeds": "proceed",
    "proceeded": "proceed", "proceeding": "proceed", "exceed": "exceed",
    "exceeds": "exceed", "exceeded": "exceed", "exceeding": "exceed",
    "succeed": "succeed", "succeeds": "succeed", "succeeded": "succeed",
    "succeeding": "succeed",
}

# step 2 rules: suffix -> (strip_count, replacement, r2_else, guard)
# guard: None, or a callable(word) -> bool checked IN ADDITION to R1
_STEP2 = (
    ("ization", 7, "ize", ""), ("ational", 7, "ate", "e"),
    ("fulness", 4, "", ""), ("ousness", 7, "ous", ""),
    ("iveness", 7, "ive", "e"), ("tional", 2, "", ""),
    ("biliti", 6, "ble", ""), ("lessli", 2, "", ""),
    ("entli", 2, "", ""), ("ation", 5, "ate", "e"),
    ("alism", 5, "al", ""), ("aliti", 5, "al", ""),
    ("ousli", 5, "ous", ""), ("iviti", 5, "ive", "e"),
    ("fulli", 2, "", ""), ("enci", 1, "e", ""),
    ("anci", 1, "e", ""), ("abli", 1, "e", ""),
    ("izer", 4, "ize", ""), ("ator", 4, "ate", "e"),
    ("alli", 4, "al", ""), ("bli", 3, "ble", ""),
    ("ogi", 1, "", ""), ("li", 2, "", ""),
)

_STEP3 = (
    ("ational", 7, "ate", ""), ("tional", 2, "", ""),
    ("alize", 3, "", ""), ("icate", 5, "ic", ""),
    ("iciti", 5, "ic", ""), ("ative", 5, "", ""),
    ("ical", 4, "ic", ""), ("ness", 4, "", ""), ("ful", 3, "", ""),
)

_STEP4 = (
    "ement", "ance", "ence", "able", "ible", "ment", "ant", "ent",
    "ism", "ate", "iti", "ous", "ive", "ize", "ion", "al", "er", "ic",
)


def _apply(word, r1, r2, strip, add="", r2_else=""):
    """Strip ``strip`` chars + append ``add``, keeping the R1/R2 strings
    suffix-aligned with the word (the reference's convention: a region
    shorter than the stripped suffix collapses to ``""`` — or to the
    rule's ``r2_else`` quirk value for R2)."""
    word = word[:-strip] + add
    r1 = (r1[:-strip] + add) if len(r1) >= strip else ""
    r2 = (r2[:-strip] + add) if len(r2) >= strip else r2_else
    return word, r1, r2


def porter2_stem(word: str) -> str:
    word = word.lower()
    sp = _SPECIAL.get(word)
    if sp is not None:
        return sp
    word = word.replace("’", "'").replace("‘", "'").replace("‛", "'")
    if word.startswith("'"):
        word = word[1:]
    if word.startswith("y"):
        word = "Y" + word[1:]
    for i in range(1, len(word)):
        if word[i] == "y" and word[i - 1] in _VOWELS:
            word = word[:i] + "Y" + word[i + 1 :]

    # regions (gener/commun/arsen prefix exception)
    r1 = r2 = ""
    if word.startswith(("gener", "commun", "arsen")):
        r1 = word[6:] if word.startswith("commun") else word[5:]
        for i in range(1, len(r1)):
            if r1[i] not in _VOWELS and r1[i - 1] in _VOWELS:
                r2 = r1[i + 1 :]
                break
    else:
        for i in range(1, len(word)):
            if word[i] not in _VOWELS and word[i - 1] in _VOWELS:
                r1 = word[i + 1 :]
                break
        for i in range(1, len(r1)):
            if r1[i] not in _VOWELS and r1[i - 1] in _VOWELS:
                r2 = r1[i + 1 :]
                break

    # step 0
    for suf in ("'s'", "'s", "'"):
        if word.endswith(suf):
            word, r1, r2 = _apply(word, r1, r2, len(suf))
            break

    # step 1a
    for suf in ("sses", "ied", "ies", "us", "ss", "s"):
        if word.endswith(suf):
            if suf == "sses":
                word, r1, r2 = _apply(word, r1, r2, 2)
            elif suf in ("ied", "ies"):
                n = 2 if len(word) - 3 > 1 else 1
                word, r1, r2 = _apply(word, r1, r2, n)
            elif suf == "s":
                if any(ch in _VOWELS for ch in word[:-2]):
                    word, r1, r2 = _apply(word, r1, r2, 1)
            break

    # step 1b
    for suf in ("eedly", "ingly", "edly", "eed", "ing", "ed"):
        if word.endswith(suf):
            if suf in ("eed", "eedly"):
                if r1.endswith(suf):
                    word, r1, r2 = _apply(word, r1, r2, len(suf), "ee")
            elif any(ch in _VOWELS for ch in word[: -len(suf)]):
                word, r1, r2 = _apply(word, r1, r2, len(suf))
                if word.endswith(("at", "bl", "iz")):
                    word += "e"
                    r1 += "e"
                    if len(word) > 5 or len(r1) >= 3:
                        r2 += "e"
                elif word.endswith(_DOUBLES):
                    word, r1, r2 = _apply(word, r1, r2, 1)
                elif r1 == "" and (
                    (
                        len(word) >= 3
                        and word[-1] not in _VOWELS
                        and word[-1] not in "wxY"
                        and word[-2] in _VOWELS
                        and word[-3] not in _VOWELS
                    )
                    or (
                        len(word) == 2
                        and word[0] in _VOWELS
                        and word[1] not in _VOWELS
                    )
                ):
                    word += "e"
                    if r1:
                        r1 += "e"
                    if r2:
                        r2 += "e"
            break

    # step 1c
    if len(word) > 2 and word[-1] in "yY" and word[-2] not in _VOWELS:
        word = word[:-1] + "i"
        r1 = (r1[:-1] + "i") if r1 else ""
        r2 = (r2[:-1] + "i") if r2 else ""

    # step 2
    for suf, strip, add, r2_else in _STEP2:
        if word.endswith(suf):
            if r1.endswith(suf):
                if suf == "ogi":
                    if word[-4] == "l":
                        word, r1, r2 = _apply(word, r1, r2, 1)
                elif suf == "li":
                    if word[-3] in _LI_ENDING:
                        word, r1, r2 = _apply(word, r1, r2, 2)
                else:
                    word, r1, r2 = _apply(word, r1, r2, strip, add, r2_else)
            break

    # step 3
    for suf, strip, add, r2_else in _STEP3:
        if word.endswith(suf):
            if r1.endswith(suf):
                if suf == "ative":
                    if r2.endswith(suf):
                        word, r1, r2 = _apply(word, r1, r2, 5)
                else:
                    word, r1, r2 = _apply(word, r1, r2, strip, add, r2_else)
            break

    # step 4
    for suf in _STEP4:
        if word.endswith(suf):
            if r2.endswith(suf):
                if suf == "ion":
                    if word[-4] in "st":
                        word, r1, r2 = _apply(word, r1, r2, 3)
                else:
                    word, r1, r2 = _apply(word, r1, r2, len(suf))
            break

    # step 5
    if r2.endswith("l") and word[-2] == "l":
        word = word[:-1]
    elif r2.endswith("e"):
        word = word[:-1]
    elif r1.endswith("e"):
        if len(word) >= 4 and (
            word[-2] in _VOWELS
            or word[-2] in "wxY"
            or word[-3] not in _VOWELS
            or word[-4] in _VOWELS
        ):
            word = word[:-1]

    return word.replace("Y", "y")


@lru_cache(maxsize=50000)
def porter2_stem_cached(word: str) -> str:
    return porter2_stem(word)
