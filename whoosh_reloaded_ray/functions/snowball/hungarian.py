"""Hungarian Snowball stemmer — implemented from the published
algorithm (snowballstem.org/algorithms/hungarian/stemmer.html),
behavior-converged against the reference transcription (ref
lang/snowball/hungarian.py).

Reference quirks replicated on purpose (the REFERENCE is the parity
target):

- the vowel set and suffixes use Latin-1 õ (o-tilde) and û
  (u-circumflex) where real Hungarian has ő/ű — words spelled with
  ő/ű simply miss those rules;
- R1 for vowel-initial words: the first digraph found ANYWHERE in
  word[1:] (searched in fixed table order, not leftmost) wins, and R1
  starts after the FIRST occurrence of that digraph's last letter in
  the whole word;
- step 1 only undoubles a double consonant before ``al``/``el`` and
  never strips the case ending itself; the undouble splice uses fixed
  ``word[:-4] + word[-3]`` / step 5's ``word[:-3] + word[-2]``
  arithmetic regardless of digraph length, and step 5 keeps the á/é;
- steps 3–6 dispatch on the R1 tail only, steps 2/7/8/9 dispatch on
  the word tail gated by the R1 tail.
"""

from __future__ import annotations

VOWELS = "aeiou\xf6\xfc\xe1\xe9\xed\xf3\xf5\xfa\xfb"
_DIGRAPHS = ("cs", "dz", "dzs", "gy", "ly", "ny", "ty", "zs")
_DOUBLE_CONSONANTS = (
    "bb", "cc", "ccs", "dd", "ff", "gg", "ggy", "jj", "kk", "ll",
    "lly", "mm", "nn", "nny", "pp", "rr", "ss", "ssz", "tt", "tty",
    "vv", "zz", "zzs",
)

_STEP2 = (
    "k\xe9ppen", "onk\xe9nt", "enk\xe9nt", "ank\xe9nt", "k\xe9pp",
    "k\xe9nt", "ban", "ben", "nak", "nek", "val", "vel", "t\xf3l",
    "t\xf5l", "r\xf3l", "r\xf5l", "b\xf3l", "b\xf5l", "hoz", "hez",
    "h\xf6z", "n\xe1l", "n\xe9l", "\xe9rt", "kor", "ba", "be", "ra",
    "re", "ig", "at", "et", "ot", "\xf6t", "ul", "\xfcl", "v\xe1",
    "v\xe9", "en", "on", "an", "\xf6n", "n", "t",
)
_STEP3 = ("\xe1nk\xe9nt", "\xe1n", "\xe9n")
_STEP4 = ("astul", "est\xfcl", "\xe1stul", "\xe9st\xfcl", "stul", "st\xfcl")
_STEP6 = (
    "ok\xe9", "\xf6k\xe9", "ak\xe9", "ek\xe9", "\xe1k\xe9",
    "\xe1\xe9i", "\xe9k\xe9", "\xe9\xe9i", "k\xe9", "\xe9i",
    "\xe9\xe9", "\xe9",
)
_STEP7 = (
    "\xe1juk", "\xe9j\xfck", "\xfcnk", "unk", "juk", "j\xfck",
    "\xe1nk", "\xe9nk", "nk", "uk", "\xfck", "em", "om", "am", "od",
    "ed", "ad", "\xf6d", "ja", "je", "\xe1m", "\xe1d", "\xe9m",
    "\xe9d", "m", "d", "a", "e", "o", "\xe1", "\xe9",
)
_S7_A = frozenset(("\xe1nk", "\xe1juk", "\xe1m", "\xe1d", "\xe1"))
_S7_E = frozenset(("\xe9nk", "\xe9j\xfck", "\xe9m", "\xe9d", "\xe9"))
_STEP8 = (
    "jaitok", "jeitek", "jaink", "jeink", "aitok", "eitek",
    "\xe1itok", "\xe9itek", "jaim", "jeim", "jaid", "jeid", "eink",
    "aink", "itek", "jeik", "jaik", "\xe1ink", "\xe9ink", "aim",
    "eim", "aid", "eid", "jai", "jei", "ink", "aik", "eik",
    "\xe1im", "\xe1id", "\xe1ik", "\xe9im", "\xe9id", "\xe9ik",
    "im", "id", "ai", "ei", "ik", "\xe1i", "\xe9i", "i",
)
_S8_A = frozenset(
    ("\xe1im", "\xe1id", "\xe1i", "\xe1ink", "\xe1itok", "\xe1ik")
)
_S8_E = frozenset(
    ("\xe9im", "\xe9id", "\xe9i", "\xe9ink", "\xe9itek", "\xe9ik")
)
_STEP9 = ("\xe1k", "\xe9k", "\xf6k", "ok", "ek", "ak", "k")


def _r1(word: str) -> str:
    if not word:
        return ""
    if word[0] in VOWELS:
        for dg in _DIGRAPHS:
            if dg in word[1:]:
                return word[word.index(dg[-1]) + 1 :]
        for i in range(1, len(word)):
            if word[i] not in VOWELS:
                return word[i + 1 :]
        return ""
    for i in range(1, len(word)):
        if word[i] in VOWELS:
            return word[i + 1 :]
    return ""


def _replace_tail(word, r1, n, rep):
    """Drop the last ``n`` chars of word and r1, appending ``rep``."""
    return word[:-n] + rep, r1[:-n] + rep


def stem(word: str) -> str:  # noqa: C901
    word = word.lower()
    r1 = _r1(word)

    # STEP 1: instrumental case — only undoubles the consonant
    # before al/el; the ending itself stays (reference quirk)
    if r1.endswith(("al", "el")):
        for dc in _DOUBLE_CONSONANTS:
            if word[-2 - len(dc) : -2] == dc:
                if r1[-2 - len(dc) : -2] == dc:
                    r1 = r1[:-4] + r1[-3]
                word = word[:-4] + word[-3]
                break

    # STEP 2: frequent cases, with final á/é shortening
    for s in _STEP2:
        if word.endswith(s):
            if r1.endswith(s):
                word = word[: -len(s)]
                r1 = r1[: -len(s)]
                if r1.endswith("\xe1"):
                    word, r1 = _replace_tail(word, r1, 1, "a")
                elif r1.endswith("\xe9"):
                    word, r1 = _replace_tail(word, r1, 1, "e")
            break

    # STEP 3: special cases (dispatch on R1 tail)
    for s in _STEP3:
        if r1.endswith(s):
            if s == "\xe9n":
                word, r1 = _replace_tail(word, r1, 2, "e")
            else:
                word, r1 = _replace_tail(word, r1, len(s), "a")
            break

    # STEP 4: other cases
    for s in _STEP4:
        if r1.endswith(s):
            if s == "\xe1stul":
                word, r1 = _replace_tail(word, r1, 5, "a")
            elif s == "\xe9st\xfcl":
                word, r1 = _replace_tail(word, r1, 5, "e")
            else:
                word = word[: -len(s)]
                r1 = r1[: -len(s)]
            break

    # STEP 5: factive case — undoubles before a final á/é, keeps it
    for s in ("\xe1", "\xe9"):
        if r1.endswith(s):
            for dc in _DOUBLE_CONSONANTS:
                if word[-1 - len(dc) : -1] == dc:
                    if r1[-1 - len(dc) : -1] == dc:
                        r1 = r1[:-3] + r1[-2]
                    word = word[:-3] + word[-2]
                    break

    # STEP 6: owned
    for s in _STEP6:
        if r1.endswith(s):
            if s in ("\xe1k\xe9", "\xe1\xe9i"):
                word, r1 = _replace_tail(word, r1, 3, "a")
            elif s in ("\xe9k\xe9", "\xe9\xe9i", "\xe9\xe9"):
                word, r1 = _replace_tail(word, r1, len(s), "e")
            else:
                word = word[: -len(s)]
                r1 = r1[: -len(s)]
            break

    # STEP 7: singular owner suffixes
    for s in _STEP7:
        if word.endswith(s):
            if r1.endswith(s):
                if s in _S7_A:
                    word, r1 = _replace_tail(word, r1, len(s), "a")
                elif s in _S7_E:
                    word, r1 = _replace_tail(word, r1, len(s), "e")
                else:
                    word = word[: -len(s)]
                    r1 = r1[: -len(s)]
            break

    # STEP 8: plural owner suffixes
    for s in _STEP8:
        if word.endswith(s):
            if r1.endswith(s):
                if s in _S8_A:
                    word, r1 = _replace_tail(word, r1, len(s), "a")
                elif s in _S8_E:
                    word, r1 = _replace_tail(word, r1, len(s), "e")
                else:
                    word = word[: -len(s)]
                    r1 = r1[: -len(s)]
            break

    # STEP 9: plural suffixes
    for s in _STEP9:
        if word.endswith(s):
            if r1.endswith(s):
                if s == "\xe1k":
                    word = word[:-2] + "a"
                elif s == "\xe9k":
                    word = word[:-2] + "e"
                else:
                    word = word[: -len(s)]
            break

    return word
