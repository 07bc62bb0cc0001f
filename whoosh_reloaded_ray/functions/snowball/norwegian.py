"""Norwegian Snowball stemmer — implemented from the published algorithm
(snowballstem.org/algorithms/norwegian/stemmer.html); parity-fuzzed
against the reference transcription (ref lang/snowball/norwegian.py)."""

from __future__ import annotations

from ._region import scandinavian_r1

VOWELS = "aeiouyæåø"
S_ENDINGS = "bcdfghjlmnoprtvyz"

_STEP1 = (
    "hetenes", "hetene", "hetens", "heten", "heter", "endes", "edes",
    "enes", "ande", "ende", "ane", "ene", "ede", "ens", "ers", "ets",
    "het", "ast", "en", "ar", "er", "as", "es", "et", "a", "e",
)
_STEP1_ERT = ("erte", "ert")
_STEP3 = ("hetslov", "eleg", "elig", "elov", "slov", "leg", "eig", "lig", "els", "lov", "ig")


def stem(word: str) -> str:
    word = word.lower()
    if len(word) <= 3:
        return word
    r1 = scandinavian_r1(word, VOWELS)

    # step 1
    for suf in _STEP1_ERT:
        if word.endswith(suf) and len(word) - len(suf) >= r1:
            word = word[: -len(suf)] + "er"
            break
    else:
        for suf in _STEP1:
            if word.endswith(suf) and len(word) - len(suf) >= r1:
                word = word[: -len(suf)]
                break
        else:
            if word.endswith("s") and len(word) - 1 >= r1 and len(word) >= 2:
                prev = word[-2]
                if prev in S_ENDINGS or (
                    prev == "k" and (len(word) < 3 or word[-3] not in VOWELS)
                ):
                    word = word[:-1]

    # step 2
    if len(word) - 2 >= r1 and word[-2:] in ("dt", "vt"):
        word = word[:-1]

    # step 3
    for suf in _STEP3:
        if word.endswith(suf) and len(word) - len(suf) >= r1:
            word = word[: -len(suf)]
            break
    return word
