"""Dutch Snowball stemmer — implemented from the published algorithm
(snowballstem.org/algorithms/dutch/stemmer.html); parity-fuzzed against
the reference transcription (ref lang/snowball/dutch.py)."""

from __future__ import annotations

from ._region import r1_start, r2_start

VOWELS = "aeiouyè"

_ACCENTS = str.maketrans("äëïöüáéíóú", "aeiouaeiou")


def _undouble(word: str) -> str:
    if word.endswith(("kk", "dd", "tt")):
        return word[:-1]
    return word


def stem(word: str) -> str:
    word = word.lower().translate(_ACCENTS)
    if not word:
        return word
    # protect y (initial or after a vowel) FIRST, then i between vowels —
    # a freshly-protected Y no longer counts as a vowel for the i pass
    chars = list(word)
    if chars[0] == "y":
        chars[0] = "Y"
    for i in range(1, len(chars)):
        if chars[i] == "y" and chars[i - 1] in VOWELS:
            chars[i] = "Y"
    for i in range(1, len(chars) - 1):
        if (
            chars[i] == "i"
            and chars[i - 1] in VOWELS
            and chars[i + 1] in VOWELS
        ):
            chars[i] = "I"
    word = "".join(chars)

    r1 = r1_start(word, VOWELS)
    if r1 < 3:
        r1 = min(3, len(word))
    r2 = r2_start(word, VOWELS)

    # step 1 — branch on the ENDING first; an ending outside its region
    # does NOT fall through to a shorter suffix (reference behavior)
    if word.endswith("heden"):
        if len(word) - 5 >= r1:
            word = word[:-5] + "heid"
    elif word.endswith("ene"):
        if (
            len(word) - 3 >= r1
            and len(word) >= 4
            and word[-4] not in VOWELS
            and word[:-3][-3:] != "gem"
        ):
            word = _undouble(word[:-3])
    elif word.endswith("en"):
        if (
            len(word) - 2 >= r1
            and len(word) >= 3
            and word[-3] not in VOWELS
            and word[:-2][-3:] != "gem"
        ):
            word = _undouble(word[:-2])
    elif word.endswith("se"):
        if (
            len(word) - 2 >= r1
            and len(word) >= 3
            and word[-3] not in VOWELS + "j"
        ):
            word = word[:-2]
    elif word.endswith("s"):
        if (
            len(word) - 1 >= r1
            and len(word) >= 2
            and word[-2] not in VOWELS + "j"
        ):
            word = word[:-1]

    # step 2
    e_removed = False
    if (
        word.endswith("e")
        and len(word) - 1 >= r1
        and len(word) >= 2
        and word[-2] not in VOWELS
    ):
        word = _undouble(word[:-1])
        e_removed = True

    # step 3a
    if word.endswith("heid") and len(word) - 4 >= r2 and (len(word) < 5 or word[-5] != "c"):
        word = word[:-4]
        if (
            word.endswith("en")
            and len(word) - 2 >= r1
            and len(word) - 2 >= 1
            and word[-3] not in VOWELS
            and word[:-2][-3:] != "gem"
        ):
            word = _undouble(word[:-2])

    # step 3b
    if word.endswith(("end", "ing")):
        if len(word) - 3 >= r2:
            word = word[:-3]
            if (
                word.endswith("ig")
                and len(word) - 2 >= r2
                and (len(word) < 3 or word[-3] != "e")
            ):
                word = word[:-2]
            else:
                word = _undouble(word)
    elif word.endswith("ig"):
        if len(word) - 2 >= r2 and (len(word) < 3 or word[-3] != "e"):
            word = word[:-2]
    elif word.endswith("lijk"):
        if len(word) - 4 >= r2:
            word = word[:-4]
            # repeat step 2
            if (
                word.endswith("e")
                and len(word) - 1 >= r1
                and len(word) >= 2
                and word[-2] not in VOWELS
            ):
                word = _undouble(word[:-1])
    elif word.endswith("baar"):
        if len(word) - 4 >= r2:
            word = word[:-4]
    elif word.endswith("bar"):
        if len(word) - 3 >= r2 and e_removed:
            word = word[:-3]

    # step 4: undouble vowel — C V V C(not I) at the end -> drop one vowel
    if (
        len(word) >= 4
        and word[-1] not in VOWELS
        and word[-1] != "I"
        and word[-2] == word[-3]
        and word[-2] in "aeou"
        and word[-4] not in VOWELS
    ):
        word = word[:-2] + word[-1]

    return word.replace("I", "i").replace("Y", "y")
