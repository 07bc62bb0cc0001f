"""German Snowball stemmer — implemented from the published algorithm
(snowballstem.org/algorithms/german/stemmer.html); parity-fuzzed against
the reference transcription (ref lang/snowball/german.py)."""

from __future__ import annotations

from ._region import r1_start, r2_start

VOWELS = "aeiouyäöü"
S_ENDINGS = "bdfghklmnrt"
ST_ENDINGS = "bdfghklmnt"


def stem(word: str) -> str:
    word = word.lower().replace("ß", "ss")
    # protect u and y between vowels (treated as consonants)
    chars = list(word)
    for i in range(1, len(chars) - 1):
        if chars[i] in "uy" and word[i - 1] in VOWELS and word[i + 1] in VOWELS:
            chars[i] = chars[i].upper()
    word = "".join(chars)

    r1 = r1_start(word, VOWELS)
    if r1 < 3:
        r1 = min(3, len(word))
    r2 = r2_start(word, VOWELS)

    # step 1
    if word.endswith(("em", "ern", "er")):
        for suf in ("ern", "em", "er"):
            if word.endswith(suf) and len(word) - len(suf) >= r1:
                word = word[: -len(suf)]
                break
    elif word.endswith(("en", "es", "e")):
        for suf in ("en", "es", "e"):
            if word.endswith(suf) and len(word) - len(suf) >= r1:
                word = word[: -len(suf)]
                if word.endswith("niss"):
                    word = word[:-1]
                break
    elif (
        word.endswith("s")
        and len(word) - 1 >= r1
        and len(word) >= 2
        and word[-2] in S_ENDINGS
    ):
        word = word[:-1]

    # step 2
    if word.endswith(("en", "er", "est")):
        for suf in ("est", "en", "er"):
            if word.endswith(suf) and len(word) - len(suf) >= r1:
                word = word[: -len(suf)]
                break
    elif (
        word.endswith("st")
        and len(word) - 2 >= r1
        and len(word) >= 6
        and word[-3] in ST_ENDINGS
    ):
        word = word[:-2]

    # step 3 (d-suffixes)
    if word.endswith(("end", "ung")):
        if len(word) - 3 >= r2:
            word = word[:-3]
            if (
                word.endswith("ig")
                and len(word) - 2 >= r2
                and (len(word) < 3 or word[-3] != "e")
            ):
                word = word[:-2]
    elif word.endswith(("isch", "ik", "ig")):
        for suf in ("isch", "ik", "ig"):
            if (
                word.endswith(suf)
                and len(word) - len(suf) >= r2
                and (len(word) < len(suf) + 1 or word[-len(suf) - 1] != "e")
            ):
                word = word[: -len(suf)]
                break
    elif word.endswith(("lich", "heit")):
        if len(word) - 4 >= r2:
            word = word[:-4]
            for suf in ("er", "en"):
                if word.endswith(suf) and len(word) - 2 >= r1:
                    word = word[:-2]
                    break
    elif word.endswith("keit"):
        if len(word) - 4 >= r2:
            word = word[:-4]
            if word.endswith("lich") and len(word) - 4 >= r2:
                word = word[:-4]
            elif word.endswith("ig") and len(word) - 2 >= r2:
                word = word[:-2]

    # restore protected letters and unfold umlauts
    out = []
    for ch in word:
        if ch == "U":
            out.append("u")
        elif ch == "Y":
            out.append("y")
        elif ch == "ä":
            out.append("a")
        elif ch == "ö":
            out.append("o")
        elif ch == "ü":
            out.append("u")
        else:
            out.append(ch)
    return "".join(out)
