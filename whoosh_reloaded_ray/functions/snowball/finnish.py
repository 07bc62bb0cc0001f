"""Finnish Snowball stemmer — implemented from the published algorithm
(snowballstem.org/algorithms/finnish/stemmer.html), behavior-converged
against the reference transcription (ref lang/snowball/finnish.py).

Reference quirks replicated on purpose: step 1/2/3 dispatch on the R1
tail and stop at the first R1 match whether or not the branch's
condition admits the action (except the ``siin``/``den``/``tten`` and
``seen`` branches, which keep scanning on condition failure); the
``sti`` particle needs a substring-containment hit in R2; and the
final undouble removes the first consonant of a double consonant that
precedes zero or more trailing vowels."""

from __future__ import annotations

VOWELS = "aeiouy\xe4\xf6"
_RESTRICTED_VOWELS = "aeiou\xe4\xf6"
_LONG_VOWELS = ("aa", "ee", "ii", "oo", "uu", "\xe4\xe4", "\xf6\xf6")
_CONSONANTS = "bcdfghjklmnpqrstvwxz"
_DOUBLE_CONSONANTS = (
    "bb", "cc", "dd", "ff", "gg", "hh", "jj", "kk", "ll", "mm", "nn",
    "pp", "qq", "rr", "ss", "tt", "vv", "ww", "xx", "zz",
)

_STEP1 = (
    "kaan", "k\xe4\xe4n", "sti", "kin", "han", "h\xe4n", "ko",
    "k\xf6", "pa", "p\xe4",
)
_STEP2 = ("nsa", "ns\xe4", "mme", "nne", "si", "ni", "an", "\xe4n", "en")
_STEP3 = (
    "siin", "tten", "seen", "han", "hen", "hin", "hon", "h\xe4n",
    "h\xf6n", "den", "tta", "tt\xe4", "ssa", "ss\xe4", "sta",
    "st\xe4", "lla", "ll\xe4", "lta", "lt\xe4", "lle", "ksi", "ine",
    "ta", "t\xe4", "na", "n\xe4", "a", "\xe4", "n",
)
_S3_H = {
    "han": "a", "hen": "e", "hin": "i", "hon": "o",
    "h\xe4n": "\xe4", "h\xf6n": "\xf6",
}
_STEP4 = (
    "impi", "impa", "imp\xe4", "immi", "imma", "imm\xe4",
    "mpi", "mpa", "mp\xe4", "mmi", "mma", "mm\xe4", "eja", "ej\xe4",
)
_S4_MP = frozenset(("mpi", "mpa", "mp\xe4", "mmi", "mma", "mm\xe4"))


def _r1r2(word: str) -> tuple[str, str]:
    r1 = ""
    for i in range(1, len(word)):
        if word[i] not in VOWELS and word[i - 1] in VOWELS:
            r1 = word[i + 1 :]
            break
    r2 = ""
    for i in range(1, len(r1)):
        if r1[i] not in VOWELS and r1[i - 1] in VOWELS:
            r2 = r1[i + 1 :]
            break
    return r1, r2


def stem(word: str) -> str:  # noqa: C901
    word = word.lower()
    step3_done = False
    r1, r2 = _r1r2(word)

    def cut(n: int):
        nonlocal word, r1, r2
        word = word[:-n]
        r1 = r1[:-n]
        r2 = r2[:-n]

    # STEP 1: particles
    for s in _STEP1:
        if r1.endswith(s):
            if s == "sti":
                if s in r2:
                    cut(3)
            elif word[-len(s) - 1] in "ntaeiouy\xe4\xf6":
                cut(len(s))
            break

    # STEP 2: possessives
    for s in _STEP2:
        if r1.endswith(s):
            if s == "si":
                if word[-3] != "k":
                    cut(2)
            elif s == "ni":
                cut(2)
                if word.endswith("kse"):
                    word = word[:-3] + "ksi"
                if r1.endswith("kse"):
                    r1 = r1[:-3] + "ksi"
                if r2.endswith("kse"):
                    r2 = r2[:-3] + "ksi"
            elif s == "an":
                if word[-4:-2] in ("ta", "na") or word[-5:-2] in (
                    "ssa", "sta", "lla", "lta",
                ):
                    cut(2)
            elif s == "\xe4n":
                if word[-4:-2] in ("t\xe4", "n\xe4") or word[-5:-2] in (
                    "ss\xe4", "st\xe4", "ll\xe4", "lt\xe4",
                ):
                    cut(2)
            elif s == "en":
                if word[-5:-2] in ("lle", "ine"):
                    cut(2)
            else:
                cut(3)
            break

    # STEP 3: cases
    for s in _STEP3:
        if r1.endswith(s):
            if s in _S3_H:
                if word[-4] == _S3_H[s]:
                    cut(3)
                    step3_done = True
            elif s in ("siin", "den", "tten"):
                if (
                    word[-len(s) - 1] == "i"
                    and word[-len(s) - 2] in _RESTRICTED_VOWELS
                ):
                    cut(len(s))
                    step3_done = True
                else:
                    continue
            elif s == "seen":
                if word[-6:-4] in _LONG_VOWELS:
                    cut(4)
                    step3_done = True
                else:
                    continue
            elif s in ("a", "\xe4"):
                if word[-2] in VOWELS and word[-3] in _CONSONANTS:
                    cut(1)
                    step3_done = True
            elif s in ("tta", "tt\xe4"):
                if word[-4] == "e":
                    cut(3)
                    step3_done = True
            elif s == "n":
                cut(1)
                step3_done = True
                if word[-2:] == "ie" or word[-2:] in _LONG_VOWELS:
                    cut(1)
            else:
                cut(len(s))
                step3_done = True
            break

    # STEP 4: other endings (in R2)
    for s in _STEP4:
        if r2.endswith(s):
            if s in _S4_MP:
                if word[-5:-3] != "po":
                    cut(3)
            else:
                cut(len(s))
            break

    # STEP 5: plurals
    if step3_done and len(r1) >= 1 and r1[-1] in "ij":
        word = word[:-1]
        r1 = r1[:-1]
    elif (
        not step3_done
        and len(r1) >= 2
        and r1[-1] == "t"
        and r1[-2] in VOWELS
    ):
        cut(1)
        if r2.endswith("imma"):
            word = word[:-4]
            r1 = r1[:-4]
        elif r2.endswith("mma") and r2[-5:-3] != "po":
            word = word[:-3]
            r1 = r1[:-3]

    # STEP 6: tidying
    if r1[-2:] in _LONG_VOWELS:
        word = word[:-1]
        r1 = r1[:-1]
    if len(r1) >= 2 and r1[-2] in _CONSONANTS and r1[-1] in "a\xe4ei":
        word = word[:-1]
        r1 = r1[:-1]
    if r1.endswith(("oj", "uj")):
        word = word[:-1]
        r1 = r1[:-1]
    if r1.endswith("jo"):
        word = word[:-1]
        r1 = r1[:-1]

    # undouble: double consonant followed by zero or more vowels
    for i in range(1, len(word)):
        if word[-i] in VOWELS:
            continue
        if i == 1:
            if word[-i - 1 :] in _DOUBLE_CONSONANTS:
                word = word[:-1]
        elif word[-i - 1 : -i + 1] in _DOUBLE_CONSONANTS:
            word = word[:-i] + word[-i + 1 :]
        break

    return word
