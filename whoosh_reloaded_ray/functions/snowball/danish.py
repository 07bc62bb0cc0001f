"""Danish Snowball stemmer — implemented from the published algorithm
(snowballstem.org/algorithms/danish/stemmer.html); parity-fuzzed against
the reference transcription (ref lang/snowball/danish.py)."""

from __future__ import annotations

from ._region import scandinavian_r1

VOWELS = "aeiouyæåø"
S_ENDINGS = "abcdfghjklmnoprtvyzå"

_STEP1 = (
    "erendes", "erende", "hedens", "ethed", "erede", "heden", "heder",
    "endes", "ernes", "erens", "erets", "ered", "ende", "erne", "eren",
    "erer", "heds", "enes", "eres", "eret", "hed", "ene", "ere", "ens",
    "ers", "ets", "en", "er", "es", "et", "e",
)
_STEP3 = ("elig", "lig", "els", "ig")


def stem(word: str) -> str:
    word = word.lower()
    if len(word) <= 3:
        return word
    r1 = scandinavian_r1(word, VOWELS)

    # step 1: longest matching suffix wholly in R1 -> delete; or s after
    # a valid s-ending
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

    # step 2: penultimate-consonant cleanup
    if len(word) - 2 >= r1 and word[-2:] in ("gd", "dt", "gt", "kt"):
        word = word[:-1]

    # step 3 (suffixes must lie wholly in R1, like step 1)
    if word.endswith("igst") and len(word) - 4 >= r1:
        word = word[:-2]
    for suf in _STEP3:
        if word.endswith(suf) and len(word) - len(suf) >= r1:
            word = word[: -len(suf)]
            # repeat step 2
            if len(word) - 2 >= r1 and word[-2:] in ("gd", "dt", "gt", "kt"):
                word = word[:-1]
            break
    else:
        if word.endswith("løst") and len(word) - 4 >= r1:
            word = word[:-1]

    # step 4: undouble a final double non-vowel when len > 3 (the
    # reference applies NO R1 condition here)
    if (
        len(word) > 3
        and word[-1] == word[-2]
        and word[-1] not in VOWELS
    ):
        word = word[:-1]
    return word
