"""Quasi-phonetic word encoders (reference lang/phonetic.py surface):
classic Soundex for English, plus the Spanish and Arabic variants the
reference carries.  Clean-room implementations of the published
algorithms; the letter->digit tables are the published data.

- ``soundex_en``: Odell/Russell soundex, unlimited length (the reference
  does not truncate to 4), first letter kept, consecutive duplicate codes
  collapsed, vowels emit code 0 which separates duplicate groups.
- ``soundex_esp``: regex-table recoder for Spanish.
- ``soundex_ar``: Arabic soundex (first char dropped, vowel class 0
  suppressed).
"""

from __future__ import annotations

import re

# a..z -> soundex digit (0 = vowel class)
_EN = "01230120022455012623010202"


def soundex_en(word: str) -> str:
    out = []
    first = None
    prev = None
    for ch in word.lower():
        o = ord(ch)
        if not (97 <= o <= 122):
            continue
        if first is None:
            first = ch
        code = _EN[o - 97]
        if code != prev:
            out.append(code)
        prev = code
    if first is None:
        return ""
    return first + "".join(out)[1:]


# Spanish recoding table (pattern -> replacement), applied at each
# position, longest-match-by-table-order; unmatched chars pass through.
_ESP = tuple(
    (re.compile(p), r)
    for p, r in (
        (r"\Aw?[uh]?([aeiou])", ""),
        (r"c[eiéí]|z|ll|sh|ch|sch|cc|y[aeiouáéíóú]|ps|bs|x|j|g[eiéí]", "s"),
        (r"[aeiouhwáéíóúü]+", ""),
        (r"y", ""),
        (r"ñ|gn", "n"),
        (r"[dpc]t", "t"),
        (r"c[aouáóú]|ck|q", "k"),
        (r"v", "b"),
        (r"d$", "t"),
    )
)


def soundex_esp(word: str) -> str:
    word = word.lower()
    out = []
    prev = None
    i = 0
    n = len(word)
    while i < n:
        code = None
        for expr, repl in _ESP:
            m = expr.match(word, i)
            if m:
                i = m.end()
                code = repl
                break
        if code is None:
            code = word[i]
            i += 1
        if code != prev:
            out.append(code)
        prev = code
    return "".join(out)


# Arabic letter classes (leading alef forms dropped; class 0 = long
# vowels / gutturals, suppressed like soundex vowels)
_AR = {}
for _chars, _code in (
    ("اأإآحخهعغشوي", "0"),
    ("فب", "1"),
    ("جزسصظقك", "2"),
    ("تثدذضط", "3"),
    ("ل", "4"),
    ("من", "5"),
    ("ر", "6"),
):
    for _c in _chars:
        _AR[_c] = _code


def soundex_ar(word: str) -> str:
    if word and word[0] in "اأإآ":
        word = word[1:]
    out = ["0"]
    prev = "0"
    if len(word) > 1:
        for ch in word[1:]:
            if ch in _AR:
                code = _AR[ch]
                if code != prev and code != "0":
                    out.append(code)
                prev = code
    return "".join(out)
