"""Russian Snowball stemmer — implemented from the published algorithm
(snowballstem.org/algorithms/russian/stemmer.html), behavior-converged
against the reference transcription (ref lang/snowball/russian.py).

The reference stems through a Roman transliteration round-trip and
carries several observable quirks that we replicate on purpose (the
REFERENCE is the parity target):

- ``ё``→``е`` and ``ъ``/``ь`` alias through ``''``/``'`` (so a bare
  ``ъ`` can stem to ``ь``);
- ``й``/``ю``/``я``/``э``/the digraph consonants become multi-char
  Roman sequences, which shifts R1/R2/RV boundaries relative to a
  direct Cyrillic computation (``й`` counts as vowel+consonant);
- suffix classes are searched FIRST-MATCH in the reference's exact
  tuple order (not longest-match) — the tuples below are those search
  orders kept as behavioral data constants, including the dead
  ``aia``-for-``ai^a`` entry in the adjectival class;
- truncation can split a digraph (e.g. ``ц``=``t^s`` losing its ``s``
  to a reflexive match), leaving literal ``^``/backtick artifacts in
  the output, and pure-ASCII input is stemmed in Roman space without
  back-transliteration;
- step 4 skips the trailing-``ь`` removal whenever an ``нн`` undouble
  or superlative removal fired.
"""

from __future__ import annotations

# Cyrillic -> Roman (case-folding; ё normalized to е, ъ/ь to quotes)
_CYR2ROM = {
    "а": "a", "б": "b", "в": "v", "г": "g", "д": "d", "е": "e",
    "ё": "e", "ж": "zh", "з": "z", "и": "i", "й": "i`", "к": "k",
    "л": "l", "м": "m", "н": "n", "о": "o", "п": "p", "р": "r",
    "с": "s", "т": "t", "у": "u", "ф": "f", "х": "kh", "ц": "t^s",
    "ч": "ch", "ш": "sh", "щ": "shch", "ъ": "''", "ы": "y", "ь": "'",
    "э": "e`", "ю": "i^u", "я": "i^a",
}
_CYR2ROM.update({k.upper(): v for k, v in list(_CYR2ROM.items())})

# Roman -> Cyrillic, applied as an ORDERED replace chain (longest
# sequences first); a truncated digraph tail falls through to its
# single-letter replacements, reproducing the reference's artifacts.
_ROM2CYR = (
    ("i^u", "ю"), ("i^a", "я"), ("shch", "щ"), ("kh", "х"),
    ("t^s", "ц"), ("ch", "ч"), ("e`", "э"), ("i`", "й"), ("sh", "ш"),
    ("k", "к"), ("e", "е"), ("zh", "ж"), ("a", "а"), ("b", "б"),
    ("v", "в"), ("g", "г"), ("d", "д"), ("z", "з"), ("i", "и"),
    ("l", "л"), ("m", "м"), ("n", "н"), ("o", "о"), ("p", "п"),
    ("r", "р"), ("s", "с"), ("t", "т"), ("u", "у"), ("f", "ф"),
    ("''", "ъ"), ("y", "ы"), ("'", "ь"),
)

# Suffix classes from the published spec, transliterated, in the
# reference transcription's first-match search order.
_PERF_GERUND = (
    "ivshis'", "yvshis'", "vshis'", "ivshi", "yvshi", "vshi",
    "iv", "yv", "v",
)
# group-1 members (must be preceded by а/я in RV; the а/я stays)
_PERF_GERUND_COND = frozenset(("v", "vshi", "vshis'"))

_ADJ_ENDINGS = (
    "i^ui^u", "i^ai^a", "imi", "ymi", "ego", "ogo", "emu", "omu",
    "ikh", "ykh", "ui^u", "ai^a", "oi^u", "ei^u", "ee", "ie", "ye",
    "oe", "ei`", "ii`", "yi`", "oi`", "em", "im", "ym", "om",
)
_ADJECTIVAL = (
    "ui^ushchi^ui^u", "ui^ushchi^ai^a", "ui^ushchimi", "ui^ushchymi",
    "ui^ushchego", "ui^ushchogo", "ui^ushchemu", "ui^ushchomu",
    "ui^ushchikh", "ui^ushchykh", "ui^ushchui^u", "ui^ushchaia",
    "ui^ushchoi^u", "ui^ushchei^u", "i^ushchi^ui^u", "i^ushchi^ai^a",
    "ui^ushchee", "ui^ushchie", "ui^ushchye", "ui^ushchoe",
    "ui^ushchei`", "ui^ushchii`", "ui^ushchyi`", "ui^ushchoi`",
    "ui^ushchem", "ui^ushchim", "ui^ushchym", "ui^ushchom",
    "i^ushchimi", "i^ushchymi", "i^ushchego", "i^ushchogo",
    "i^ushchemu", "i^ushchomu", "i^ushchikh", "i^ushchykh",
    "i^ushchui^u", "i^ushchai^a", "i^ushchoi^u", "i^ushchei^u",
    "i^ushchee", "i^ushchie", "i^ushchye", "i^ushchoe", "i^ushchei`",
    "i^ushchii`", "i^ushchyi`", "i^ushchoi`", "i^ushchem",
    "i^ushchim", "i^ushchym", "i^ushchom", "shchi^ui^u", "shchi^ai^a",
    "ivshi^ui^u", "ivshi^ai^a", "yvshi^ui^u", "yvshi^ai^a", "shchimi",
    "shchymi", "shchego", "shchogo", "shchemu", "shchomu", "shchikh",
    "shchykh", "shchui^u", "shchai^a", "shchoi^u", "shchei^u",
    "ivshimi", "ivshymi", "ivshego", "ivshogo", "ivshemu", "ivshomu",
    "ivshikh", "ivshykh", "ivshui^u", "ivshai^a", "ivshoi^u",
    "ivshei^u", "yvshimi", "yvshymi", "yvshego", "yvshogo", "yvshemu",
    "yvshomu", "yvshikh", "yvshykh", "yvshui^u", "yvshai^a",
    "yvshoi^u", "yvshei^u", "vshi^ui^u", "vshi^ai^a", "shchee",
    "shchie", "shchye", "shchoe", "shchei`", "shchii`", "shchyi`",
    "shchoi`", "shchem", "shchim", "shchym", "shchom", "ivshee",
    "ivshie", "ivshye", "ivshoe", "ivshei`", "ivshii`", "ivshyi`",
    "ivshoi`", "ivshem", "ivshim", "ivshym", "ivshom", "yvshee",
    "yvshie", "yvshye", "yvshoe", "yvshei`", "yvshii`", "yvshyi`",
    "yvshoi`", "yvshem", "yvshim", "yvshym", "yvshom", "vshimi",
    "vshymi", "vshego", "vshogo", "vshemu", "vshomu", "vshikh",
    "vshykh", "vshui^u", "vshai^a", "vshoi^u", "vshei^u", "emi^ui^u",
    "emi^ai^a", "nni^ui^u", "nni^ai^a", "vshee", "vshie", "vshye",
    "vshoe", "vshei`", "vshii`", "vshyi`", "vshoi`", "vshem", "vshim",
    "vshym", "vshom", "emimi", "emymi", "emego", "emogo", "ememu",
    "emomu", "emikh", "emykh", "emui^u", "emai^a", "emoi^u", "emei^u",
    "nnimi", "nnymi", "nnego", "nnogo", "nnemu", "nnomu", "nnikh",
    "nnykh", "nnui^u", "nnai^a", "nnoi^u", "nnei^u", "emee", "emie",
    "emye", "emoe", "emei`", "emii`", "emyi`", "emoi`", "emem",
    "emim", "emym", "emom", "nnee", "nnie", "nnye", "nnoe", "nnei`",
    "nnii`", "nnyi`", "nnoi`", "nnem", "nnim", "nnym", "nnom",
) + _ADJ_ENDINGS
# group-1 participles (ющ/щ/вш/ем/нн): the combined
# participle+adjective suffix then needs а/я before it.  Plain
# adjective endings (including bare ``em``/``emu``) stay
# unconditional.
_ADJ_COND = frozenset(
    p + e
    for p in ("i^ushch", "shch", "vsh", "em", "nn")
    for e in _ADJ_ENDINGS
)

_REFLEXIVE = ("si^a", "s'")

_VERB = (
    "esh'", "ei`te", "ui`te", "ui^ut", "ish'", "ete", "i`te", "i^ut",
    "nno", "ila", "yla", "ena", "ite", "ili", "yli", "ilo", "ylo",
    "eno", "i^at", "uet", "eny", "it'", "yt'", "ui^u", "la", "na",
    "li", "em", "lo", "no", "et", "ny", "t'", "ei`", "ui`", "il",
    "yl", "im", "ym", "en", "it", "yt", "i^u", "i`", "l", "n",
)
_VERB_COND = frozenset((
    "la", "na", "ete", "i`te", "li", "i`", "l", "em", "n", "lo",
    "no", "et", "i^ut", "ny", "t'", "esh'", "nno",
))

_NOUN = (
    "ii^ami", "ii^akh", "i^ami", "ii^am", "i^akh", "ami", "iei`",
    "i^am", "iem", "akh", "ii^u", "'i^u", "ii^a", "'i^a", "ev", "ov",
    "ie", "'e", "ei", "ii", "ei`", "oi`", "ii`", "em", "am", "om",
    "i^u", "i^a", "a", "e", "i", "i`", "o", "u", "y", "'",
)

_SUPERLATIVE = ("ei`she", "ei`sh")
_DERIVATIONAL = ("ost'", "ost")

_VOWELS_COND = "AUEaeiouy"


def _romanize(word: str) -> str:
    return "".join(_CYR2ROM.get(ch, ch) for ch in word)


def _to_cyrillic(word: str) -> str:
    for rom, cyr in _ROM2CYR:
        word = word.replace(rom, cyr)
    return word


def _regions(word: str) -> tuple[str, str]:
    """(RV, R2) as tail strings of the Roman word, computed with
    я/ю/э condensed to single placeholders (so they count as single
    vowels) but digraph consonants left multi-char (so й is
    vowel+consonant — the reference quirk)."""
    cond = word.replace("i^a", "A").replace("i^u", "U").replace("e`", "E")
    r1 = ""
    for i in range(1, len(cond)):
        if cond[i] not in _VOWELS_COND and cond[i - 1] in _VOWELS_COND:
            r1 = cond[i + 1 :]
            break
    r2 = ""
    for i in range(1, len(r1)):
        if r1[i] not in _VOWELS_COND and r1[i - 1] in _VOWELS_COND:
            r2 = r1[i + 1 :]
            break
    rv = ""
    for i in range(len(cond)):
        if cond[i] in _VOWELS_COND:
            rv = cond[i + 1 :]
            break

    def expand(s: str) -> str:
        return s.replace("A", "i^a").replace("U", "i^u").replace("E", "e`")

    return expand(rv), expand(r2)


def _preceded_by_a(rv: str, slen: int) -> bool:
    return (
        rv[-slen - 3 : -slen] == "i^a" or rv[-slen - 1 : -slen] == "a"
    )


def _drop_first(word, rv, r2, suffixes, cond=None):
    """Remove the FIRST suffix in search order matching the RV tail;
    members of the conditional subset additionally need а/я right
    before them in RV (kept).  Returns (word, rv, r2, removed)."""
    for s in suffixes:
        if rv.endswith(s):
            if cond is not None and s in cond and not _preceded_by_a(
                rv, len(s)
            ):
                continue
            n = len(s)
            return word[:-n], rv[:-n], r2[:-n], True
    return word, rv, r2, False


def stem(word: str) -> str:
    cyrillic = any(ord(ch) > 255 for ch in word)
    if cyrillic:
        word = _romanize(word)

    rv, r2 = _regions(word)

    # step 1: perfective gerund, else [reflexive] + adjectival / verb
    # / noun
    word, rv, r2, done = _drop_first(
        word, rv, r2, _PERF_GERUND, cond=_PERF_GERUND_COND
    )
    if not done:
        word, rv, r2, _ = _drop_first(word, rv, r2, _REFLEXIVE)
        word, rv, r2, done = _drop_first(
            word, rv, r2, _ADJECTIVAL, cond=_ADJ_COND
        )
        if not done:
            word, rv, r2, done = _drop_first(
                word, rv, r2, _VERB, cond=_VERB_COND
            )
        if not done:
            word, rv, r2, _ = _drop_first(word, rv, r2, _NOUN)

    # step 2: trailing и in RV
    if rv.endswith("i"):
        word = word[:-1]
        r2 = r2[:-1]

    # step 3: derivational ending in R2
    for s in _DERIVATIONAL:
        if r2.endswith(s):
            word = word[: -len(s)]
            break

    # step 4: undouble нн, else superlative (+undouble); trailing ь
    # only when neither fired (reference control-flow quirk)
    undoubled = superlative = False
    if word.endswith("nn"):
        word = word[:-1]
        undoubled = True
    else:
        for s in _SUPERLATIVE:
            if word.endswith(s):
                word = word[: -len(s)]
                superlative = True
                break
        if word.endswith("nn"):
            word = word[:-1]
    if not undoubled and not superlative and word.endswith("'"):
        word = word[:-1]

    if cyrillic:
        word = _to_cyrillic(word)
    return word
