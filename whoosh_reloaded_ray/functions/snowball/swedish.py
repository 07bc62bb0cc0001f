"""Swedish Snowball stemmer — implemented from the published algorithm
(snowballstem.org/algorithms/swedish/stemmer.html); parity-fuzzed
against the reference transcription (ref lang/snowball/swedish.py)."""

from __future__ import annotations

from ._region import scandinavian_r1

VOWELS = "aeiouyäåö"
S_ENDINGS = "bcdfghjklmnoprtvy"

_STEP1 = (
    "heterna", "hetens", "anden", "heten", "heter", "arnas", "ernas",
    "ornas", "andes", "arens", "andet", "arna", "erna", "orna", "ande",
    "arne", "aste", "aren", "ades", "erns", "ade", "are", "ern", "ens",
    "het", "ast", "ad", "en", "ar", "er", "or", "as", "es", "at", "a", "e",
)
_STEP2 = ("dd", "gd", "nn", "dt", "gt", "kt", "tt")
_STEP3_DEL = ("lig", "els", "ig")


def stem(word: str) -> str:
    word = word.lower()
    if len(word) <= 3:
        return word
    r1 = scandinavian_r1(word, VOWELS)

    # step 1
    for suf in _STEP1:
        if word.endswith(suf) and len(word) - len(suf) >= r1:
            word = word[: -len(suf)]
            break
    else:
        if (
            word.endswith("s")
            and len(word) - 1 >= r1
            and len(word) >= 2
            and word[-2] in S_ENDINGS
        ):
            word = word[:-1]

    # step 2
    if len(word) - 2 >= r1 and word[-2:] in _STEP2:
        word = word[:-1]

    # step 3
    if word.endswith("fullt") and len(word) - 5 >= r1:
        word = word[:-1]
    elif word.endswith("löst") and len(word) - 4 >= r1:
        word = word[:-1]
    else:
        for suf in _STEP3_DEL:
            if word.endswith(suf) and len(word) - len(suf) >= r1:
                word = word[: -len(suf)]
                break
    return word
