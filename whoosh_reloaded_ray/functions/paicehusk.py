"""Paice/Husk (Lancaster) stemmer (Paice 1990, "Another stemmer",
ACM SIGIR Forum 24(3):56-61): iterative suffix rewriting driven by a
rule table keyed on the word's final letter.  Each rule =
(ending, intact_only, n_remove, append, continue): if the word ends with
``ending`` (and, for intact rules, no rule has fired yet), strip
``n_remove`` chars, append ``append``, and keep iterating while
``continue`` — subject to the acceptability floor (stems starting with a
vowel keep >= 2 chars; consonant-initial stems keep >= 3 and must still
contain a vowel position per the first-vowel rule).

Clean-room implementation; the 115 default rules are the PUBLISHED
Lancaster rule set (same data the reference carries, ref
lang/paicehusk.py).  The reference also strips a fixed set of metric
prefixes before stemming — replicated (its ``strip_prefix``).
"""

from __future__ import annotations

from functools import lru_cache

# (ending [in normal reading order? NO: as stored, the ending string is
# reversed-rule notation already restored to normal order], intact_only,
# n_remove, append, continue) — Lancaster default rules
_RULES = (
    ("ia", True, 2, "", False),
    ("a", True, 1, "", False),
    ("bb", False, 1, "", False),
    ("ytic", False, 3, "s", False),
    ("ic", False, 2, "", True),
    ("nc", False, 1, "t", True),
    ("dd", False, 1, "", False),
    ("ied", False, 3, "y", True),
    ("ceed", False, 2, "ss", False),
    ("eed", False, 1, "", False),
    ("ed", False, 2, "", True),
    ("hood", False, 4, "", True),
    ("e", False, 1, "", True),
    ("lief", False, 1, "v", False),
    ("if", False, 2, "", True),
    ("ing", False, 3, "", True),
    ("iag", False, 3, "y", False),
    ("ag", False, 2, "", True),
    ("gg", False, 1, "", False),
    ("th", True, 2, "", False),
    ("guish", False, 5, "ct", False),
    ("ish", False, 3, "", True),
    ("i", True, 1, "", False),
    ("i", False, 1, "y", True),
    ("ij", False, 1, "d", False),
    ("fuj", False, 1, "s", False),
    ("uj", False, 1, "d", False),
    ("oj", False, 1, "d", False),
    ("hej", False, 1, "r", False),
    ("verj", False, 1, "t", False),
    ("misj", False, 2, "t", False),
    ("nj", False, 1, "d", False),
    ("j", False, 1, "s", False),
    ("ifiabl", False, 6, "", False),
    ("iabl", False, 4, "y", False),
    ("abl", False, 3, "", True),
    ("ibl", False, 3, "", False),
    ("bil", False, 2, "l", True),
    ("cl", False, 1, "", False),
    ("iful", False, 4, "y", False),
    ("ful", False, 3, "", True),
    ("ul", False, 2, "", False),
    ("ial", False, 3, "", True),
    ("ual", False, 3, "", True),
    ("al", False, 2, "", True),
    ("ll", False, 1, "", False),
    ("ium", False, 3, "", False),
    ("um", True, 2, "", False),
    ("ism", False, 3, "", True),
    ("mm", False, 1, "", False),
    ("sion", False, 4, "j", True),
    ("xion", False, 4, "ct", False),
    ("ion", False, 3, "", True),
    ("ian", False, 3, "", True),
    ("an", False, 2, "", True),
    ("een", False, 0, "", False),
    ("en", False, 2, "", True),
    ("nn", False, 1, "", False),
    ("ship", False, 4, "", True),
    ("pp", False, 1, "", False),
    ("er", False, 2, "", True),
    ("ear", False, 0, "", False),
    ("ar", False, 2, "", False),
    ("or", False, 2, "", True),
    ("ur", False, 2, "", True),
    ("rr", False, 1, "", False),
    ("tr", False, 1, "", True),
    ("ier", False, 3, "y", True),
    ("ies", False, 3, "y", True),
    ("sis", False, 2, "", False),
    ("is", False, 2, "", True),
    ("ness", False, 4, "", True),
    ("ss", False, 0, "", False),
    ("ous", False, 3, "", True),
    ("us", True, 2, "", False),
    ("s", True, 1, "", True),
    ("s", False, 0, "", False),
    ("plicat", False, 4, "y", False),
    ("at", False, 2, "", True),
    ("ment", False, 4, "", True),
    ("ent", False, 3, "", True),
    ("ant", False, 3, "", True),
    ("ript", False, 2, "b", False),
    ("orpt", False, 2, "b", False),
    ("duct", False, 1, "", False),
    ("sumpt", False, 2, "", False),
    ("cept", False, 2, "iv", False),
    ("olut", False, 2, "v", False),
    ("sist", False, 0, "", False),
    ("ist", False, 3, "", True),
    ("tt", False, 1, "", False),
    ("iqu", False, 3, "", False),
    ("ogu", False, 1, "", False),
    ("siv", False, 3, "j", True),
    ("eiv", False, 0, "", False),
    ("iv", False, 2, "", True),
    ("bly", False, 1, "", True),
    ("ily", False, 3, "y", True),
    ("ply", False, 0, "", False),
    ("ly", False, 2, "", True),
    ("ogy", False, 1, "", False),
    ("phy", False, 1, "", False),
    ("omy", False, 1, "", False),
    ("opy", False, 1, "", False),
    ("ity", False, 3, "", True),
    ("ety", False, 3, "", True),
    ("lty", False, 2, "", False),
    ("istry", False, 5, "", False),
    ("ary", False, 3, "", True),
    ("ory", False, 3, "", True),
    ("ify", False, 3, "", False),
    ("ncy", False, 2, "t", True),
    ("acy", False, 3, "", True),
    ("iz", False, 2, "", True),
    ("yz", False, 1, "s", False),
)

_BY_LAST = {}
for _r in _RULES:
    _BY_LAST.setdefault(_r[0][-1], []).append(_r)

_PREFIXES = ("kilo", "micro", "milli", "intra", "ultra", "mega", "nano",
             "pico", "pseudo")


def _first_vowel_pos(word: str) -> int:
    """Position of the first vowel; a 'y' after position 0 counts when it
    precedes every aeiou (the reference's first_vowel)."""
    positions = [p for p in (word.find(v) for v in "aeiou") if p > -1]
    vp = min(positions) if positions else len(word)
    yp = word.find("y")
    if 0 < yp < vp:
        return yp
    return vp


def _acceptable(pfv: int, newlen: int) -> bool:
    # vowel-initial stems keep >= 2 chars, consonant-initial >= 3
    return not ((pfv == 0 and newlen < 2) or (pfv > 0 and newlen < 3))


def paicehusk_stem(word: str) -> str:
    """Stem one (lowercased alphabetic) word."""
    if not word or not word[0].isalpha():
        return word
    # mirror the reference's leading-\w+ slice + metric-prefix strip
    i = 0
    while i < len(word) and (word[i].isalnum() or word[i] == "_"):
        i += 1
    stem = word[:i]
    for p in _PREFIXES:
        if stem.startswith(p):
            stem = stem[len(p):]
            break
    intact = True
    while True:
        rulelist = _BY_LAST.get(stem[-1] if stem else "")
        if not rulelist:
            break
        pfv = _first_vowel_pos(stem)
        fired = False
        for ending, intact_only, n, append, cont in rulelist:
            if not stem.endswith(ending):
                continue
            if intact_only and not intact:
                continue
            if not _acceptable(pfv, len(stem) - n + len(append)):
                continue
            intact = False
            stem = stem[: len(stem) - n] + append
            fired = cont
            break
        if not fired:
            break
    return stem


@lru_cache(maxsize=50_000)
def paicehusk_stem_cached(word: str) -> str:
    return paicehusk_stem(word)
