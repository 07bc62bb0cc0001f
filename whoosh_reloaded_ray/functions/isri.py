"""ISRI Arabic stemmer (Taghva, Elkhoury & Coombs 2005, "Arabic
Stemming without a root dictionary") — implemented from the published
algorithm, behavior-converged against the reference transcription (ref
lang/isri.py, the NLTK port whoosh dispatches to for lang="ar").

Reference quirks replicated on purpose:

- the three-letter prefix scan interleaves: a word not starting with
  كال is tested against the two-letter prefixes BEFORE the remaining
  three-letter prefixes (the transcription nests the p2 loop inside
  the p3 loop's first non-match); same structure for suffixes;
- the length-six four-root rule افعلال tests only position 4 for alif
  (the transcription's ``(stm[0] and stm[4]) == alif`` short-circuit);
- stop words are checked after diacritic removal but before any
  affix stripping, and hamza normalization touches only the INITIAL
  آ/أ/إ (step 2 of the original paper is deliberately dropped).
"""

from __future__ import annotations

import re
from functools import lru_cache as _lru_cache

# affixes
_P3 = ("كال", "بال", "ولل", "وال")
_P2 = ("ال", "لل")
_P1 = ("ل", "ب", "ف", "س", "و", "ي", "ت", "ن", "ا")

_S3 = ("تمل", "همل", "تان", "تين", "كمل")
_S2 = (
    "ون", "ات", "ان", "ين",
    "تن", "كم", "هن", "نا",
    "يا", "ها", "تم", "كن",
    "ني", "وا", "ما", "هم",
)
_S1 = ("ة", "ه", "ي", "ك", "ت", "ا", "ن")

_ALIF = "ا"
_WAW = "و"
_YA = "ي"
_MEEM = "م"
_TA = "ت"
_TA_MARBUTA = "ة"
_NOON = "ن"
_HAMZA_SEAT = "ئ"

# pattern letter groups (length-4 and length-5/3-root tables)
_PR4 = {0: (_MEEM,), 1: (_ALIF,), 2: (_ALIF, _WAW, "ي"), 3: (_TA_MARBUTA,)}
_PR53_0 = (_ALIF, _TA)
_PR53_1 = (_ALIF, _YA, _WAW)
_PR53_2 = (_ALIF, _TA, _MEEM)
_PR53_3 = (_MEEM, _YA, _TA)
_PR53_4 = (_MEEM, _TA)
_PR53_5 = (_ALIF, _WAW)
_PR53_6 = (_ALIF, _MEEM)

_RE_SHORT_VOWELS = re.compile("[ً-ْ]")
_RE_INITIAL_HAMZA = re.compile("^[آأإ]")

STOP_WORDS = frozenset((
    "يكون", "وليس", "وكان",
    "كذلك", "التي", "وبين",
    "عليها", "مساء", "الذي",
    "وكانت", "ولكن",
    "والتي", "تكون",
    "اليوم", "اللذين",
    "عليه", "كانت", "لذلك",
    "أمام", "هناك", "منها",
    "مازال", "لازال",
    "لايزال", "مايزال",
    "اصبح", "أصبح", "أمسى",
    "امسى", "أضحى", "اضحى",
    "مابرح", "مافتئ",
    "ماانفك", "لاسيما",
    "ولايزال", "الحالي",
    "اليها", "الذين",
    "فانه", "والذي", "وهذا",
    "لهذا", "فكان",
    "ستكون", "اليه",
    "يمكن", "بهذا", "الذى",
))


def _pre32(w: str) -> str:
    if len(w) >= 6:
        for p3 in _P3:
            if w.startswith(p3):
                return w[3:]
            if len(w) >= 5:  # runs between p3 candidates (quirk)
                for p2 in _P2:
                    if w.startswith(p2):
                        return w[2:]
    return w


def _suf32(w: str) -> str:
    if len(w) >= 6:
        for s3 in _S3:
            if w.endswith(s3):
                return w[:-3]
            if len(w) >= 5:
                for s2 in _S2:
                    if w.endswith(s2):
                        return w[:-2]
    return w


def _suf1(w: str) -> str:
    for s in _S1:
        if w.endswith(s):
            return w[:-1]
    return w


def _pre1(w: str) -> str:
    for p in _P1:
        if w.startswith(p):
            return w[1:]
    return w


def _pro_w4(w: str) -> str:
    if w[0] in _PR4[0]:
        return w[1:]
    if w[1] in _PR4[1]:
        return w[0] + w[2:]
    if w[2] in _PR4[2]:
        return w[:2] + w[3]
    if w[3] in _PR4[3]:
        return w[:-1]
    w = _suf1(w)
    if len(w) == 4:
        w = _pre1(w)
    return w


def _pro_w53(w: str) -> str:
    if w[2] in _PR53_0 and w[0] == _ALIF:
        return w[1] + w[3:]
    if w[3] in _PR53_1 and w[0] == _MEEM:
        return w[1:3] + w[4]
    if w[0] in _PR53_2 and w[4] == _TA_MARBUTA:
        return w[1:4]
    if w[0] in _PR53_3 and w[2] == _TA:
        return w[1] + w[3:]
    if w[0] in _PR53_4 and w[2] == _ALIF:
        return w[1] + w[3:]
    if w[2] in _PR53_5 and w[4] == _TA_MARBUTA:
        return w[:2] + w[3]
    if w[0] in _PR53_6 and w[1] == _NOON:
        return w[2:]
    if w[3] == _ALIF and w[0] == _ALIF:
        return w[1:3] + w[4]
    if w[4] == _NOON and w[3] == _ALIF:
        return w[:3]
    if w[3] == _YA and w[0] == _TA:
        return w[1:3] + w[4]
    if w[3] == _WAW and w[1] == _ALIF:
        return w[0] + w[2] + w[4]
    if w[2] == _ALIF and w[1] == _WAW:
        return w[0] + w[3:]
    if w[3] == _HAMZA_SEAT and w[2] == _ALIF:
        return w[:2] + w[4]
    if w[4] == _TA_MARBUTA and w[1] == _ALIF:
        return w[0] + w[2:4]
    if w[4] == _YA and w[2] == _ALIF:
        return w[:2] + w[3]
    w = _suf1(w)
    if len(w) == 5:
        w = _pre1(w)
    return w


def _pro_w54(w: str) -> str:
    if w[0] in _PR53_2:
        return w[1:]
    if w[4] == _TA_MARBUTA:
        return w[:4]
    if w[2] == _ALIF:
        return w[:2] + w[3:]
    return w


def _end_w5(w: str) -> str:
    if len(w) == 4:
        return _pro_w4(w)
    if len(w) == 5:
        return _pro_w54(w)
    return w


def _pro_w6(w: str) -> str:
    if w.startswith("است") or w.startswith("مست"):
        return w[3:]
    if w[0] == _MEEM and w[3] == _ALIF and w[5] == _TA_MARBUTA:
        return w[1:3] + w[4]
    if w[0] == _ALIF and w[2] == _TA and w[4] == _ALIF:
        return w[1] + w[3] + w[5]
    if w[0] == _ALIF and w[3] == _WAW and w[2] == w[4]:
        return w[1] + w[4:]
    if w[0] == _TA and w[2] == _ALIF and w[4] == _YA:
        return w[1] + w[3] + w[5]
    w = _suf1(w)
    if len(w) == 6:
        w = _pre1(w)
    return w


def _pro_w64(w: str) -> str:
    # the افعلال test only inspects position 4 (reference short-circuit)
    if w[4] == _ALIF:
        return w[1:4] + w[5]
    if w.startswith("مت"):
        return w[2:]
    return w


def _end_w6(w: str) -> str:
    if len(w) == 5:
        return _end_w5(_pro_w53(w))
    if len(w) == 6:
        return _pro_w64(w)
    return w


def stem(word: str) -> str:
    w = _RE_SHORT_VOWELS.sub("", word)
    if w in STOP_WORDS:
        return w
    w = _pre32(w)
    w = _suf32(w)
    if len(w) >= 4 and w[:2] == _WAW + _WAW:
        w = w[1:]
    w = _RE_INITIAL_HAMZA.sub(_ALIF, w)
    n = len(w)
    if n <= 3:
        return w
    if n == 4:
        return _pro_w4(w)
    if n == 5:
        return _end_w5(_pro_w53(w))
    if n == 6:
        return _end_w6(_pro_w6(w))
    if n == 7:
        w = _suf1(w)
        if len(w) == 7:
            w = _pre1(w)
        if len(w) == 6:
            return _end_w6(_pro_w6(w))
    return w


@_lru_cache(maxsize=50000)
def isri_stem_cached(word: str) -> str:
    return stem(word)
