"""Lovins stemmer (Lovins 1968, "Development of a Stemming Algorithm",
Mechanical Translation and Computational Linguistics 11:22-31) — the
classic longest-match single-pass stemmer: remove the longest of 294
endings whose context condition accepts the remaining stem (min stem
length 2), then undouble terminal consonants and apply the paper's 35
spelling-recoding rules.

Clean-room implementation; the ending/condition/recoding tables are the
PUBLISHED algorithm data (same constants the reference carries,
ref lang/lovins.py — behavioral data, not code).  Used by
``StemFilter-style`` analyzer specs via ``stemmer="lovins"``.
"""

from __future__ import annotations

from functools import lru_cache

# ---- context conditions (paper Appendix A; letter -> predicate on the
# candidate stem).  Written from the published descriptions.
_COND = {
    "A": lambda s: True,
    "B": lambda s: len(s) >= 3,
    "C": lambda s: len(s) >= 4,
    "D": lambda s: len(s) >= 5,
    "E": lambda s: not s.endswith("e"),
    "F": lambda s: len(s) >= 3 and not s.endswith("e"),
    "G": lambda s: len(s) >= 3 and s.endswith("f"),
    "H": lambda s: s.endswith("t") or s.endswith("ll"),
    "I": lambda s: s[-1] not in "oe",
    "J": lambda s: s[-1] not in "ae",
    "K": lambda s: len(s) >= 3
    and (s[-1] in "li" or (s.endswith("e") and len(s) >= 3 and s[-3] == "u")),
    "L": lambda s: s[-1] not in "ux" and (s[-1] != "s" or s[-2:] == "os"),
    "M": lambda s: s[-1] not in "acem",
    "N": lambda s: len(s) >= 4 or (len(s) == 3 and s[-1] != "s"),
    "O": lambda s: s[-1] in "li",
    "P": lambda s: s[-1] != "c",
    "Q": lambda s: len(s) >= 3 and s[-1] not in "ln",
    "R": lambda s: s[-1] in "nr",
    # paper: "after dr or t, unless t follows t"; the reference
    # (lang/lovins.py:112-115) compares the single char base[-2] against
    # "rd"/"tt", degenerating to plain "after t" — replicated for parity
    "S": lambda s: s.endswith("t"),
    "T": lambda s: s.endswith("s") or (s.endswith("t") and not s.endswith("ot")),
    "U": lambda s: s[-1] in "lmnr",
    "V": lambda s: s[-1] == "c",
    "W": lambda s: s[-1] not in "su",
    "X": lambda s: s[-1] in "li" or (s.endswith("e") and len(s) >= 3 and s[-3] == "u"),
    "Y": lambda s: s.endswith("in"),
    "Z": lambda s: s[-1] != "f",
    "a": lambda s: s[-1] in "dflt" or s[-2:] in ("ph", "th", "er", "or", "es"),
    "b": lambda s: len(s) >= 3 and not s.endswith("met") and not s.endswith("ryst"),
    "c": lambda s: s[-1] == "l",
}

# ---- ending -> condition letter (paper Appendix A, all 294 endings)
_ENDINGS = {
    "alistically":"B","arizability":"A","izationally":"B","antialness":"A",
    "arisations":"A","arizations":"A","entialness":"A","allically":"C",
    "antaneous":"A","antiality":"A","arisation":"A","arization":"A",
    "ationally":"B","ativeness":"A","eableness":"E","entations":"A",
    "entiality":"A","entialize":"A","entiation":"A","ionalness":"A",
    "istically":"A","itousness":"A","izability":"A","izational":"A",
    "ableness":"A","arizable":"A","entation":"A","entially":"A",
    "eousness":"A","ibleness":"A","icalness":"A","ionalism":"A",
    "ionality":"A","ionalize":"A","iousness":"A","izations":"A",
    "lessness":"A","ability":"A","aically":"A","alistic":"B","alities":"A",
    "ariness":"E","aristic":"A","arizing":"A","ateness":"A","atingly":"A",
    "ational":"B","atively":"A","ativism":"A","elihood":"E","encible":"A",
    "entally":"A","entials":"A","entiate":"A","entness":"A","fulness":"A",
    "ibility":"A","icalism":"A","icalist":"A","icality":"A","icalize":"A",
    "ication":"G","icianry":"A","ination":"A","ingness":"A","ionally":"A",
    "isation":"A","ishness":"A","istical":"A","iteness":"A","iveness":"A",
    "ivistic":"A","ivities":"A","ization":"F","izement":"A","oidally":"A",
    "ousness":"A","aceous":"A","acious":"B","action":"G","alness":"A",
    "ancial":"A","ancies":"A","ancing":"B","ariser":"A","arized":"A",
    "arizer":"A","atable":"A","ations":"B","atives":"A","eature":"Z",
    "efully":"A","encies":"A","encing":"A","ential":"A","enting":"C",
    "entist":"A","eously":"A","ialist":"A","iality":"A","ialize":"A",
    "ically":"A","icance":"A","icians":"A","icists":"A","ifully":"A",
    "ionals":"A","ionate":"D","ioning":"A","ionist":"A","iously":"A",
    "istics":"A","izable":"E","lessly":"A","nesses":"A","oidism":"A",
    "acies":"A","acity":"A","aging":"B","aical":"A","alism":"B","alist":"A",
    "ality":"A","alize":"A","allic":"b","anced":"B","ances":"B","antic":"C",
    "arial":"A","aries":"A","arily":"A","arity":"B","arize":"A","aroid":"A",
    "ately":"A","ating":"I","ation":"B","ative":"A","ators":"A","atory":"A",
    "ature":"E","early":"Y","ehood":"A","eless":"A","elily":"A","ement":"A",
    "enced":"A","ences":"A","eness":"E","ening":"E","ental":"A","ented":"C",
    "ently":"A","fully":"A","ially":"A","icant":"A","ician":"A","icide":"A",
    "icism":"A","icist":"A","icity":"A","idine":"I","iedly":"A","ihood":"A",
    "inate":"A","iness":"A","ingly":"B","inism":"J","inity":"c","ional":"A",
    "ioned":"A","ished":"A","istic":"A","ities":"A","itous":"A","ively":"A",
    "ivity":"A","izers":"F","izing":"F","oidal":"A","oides":"A","otide":"A",
    "ously":"A","able":"A","ably":"A","ages":"B","ally":"B","ance":"B",
    "ancy":"B","ants":"B","aric":"A","arly":"K","ated":"I","ates":"A",
    "atic":"B","ator":"A","ealy":"Y","edly":"E","eful":"A","eity":"A",
    "ence":"A","ency":"A","ened":"E","enly":"E","eous":"A","hood":"A",
    "ials":"A","ians":"A","ible":"A","ibly":"A","ical":"A","ides":"L",
    "iers":"A","iful":"A","ines":"M","ings":"N","ions":"B","ious":"A",
    "isms":"B","ists":"A","itic":"H","ized":"F","izer":"F","less":"A",
    "lily":"A","ness":"A","ogen":"A","ward":"A","wise":"A","ying":"B",
    "yish":"A","acy":"A","age":"B","aic":"A","als":"b","ant":"B","ars":"O",
    "ary":"F","ata":"A","ate":"A","eal":"Y","ear":"Y","ely":"E","ene":"E",
    "ent":"C","ery":"E","ese":"A","ful":"A","ial":"A","ian":"A","ics":"A",
    "ide":"L","ied":"A","ier":"A","ies":"P","ily":"A","ine":"M","ing":"N",
    "ion":"Q","ish":"C","ism":"B","ist":"A","ite":"a","ity":"A","ium":"A",
    "ive":"A","ize":"F","oid":"A","one":"R","ous":"A","'s":"A","ae":"A",
    "al":"b","ar":"X","as":"B","ed":"E","en":"F","es":"E","ia":"A","ic":"A",
    "is":"A","ly":"B","on":"S","or":"T","s'":"A","um":"U","us":"V","yl":"R",
    "a":"A","e":"A","i":"A","o":"A","s":"W","y":"B",
}

# longest-first ending lengths actually present
_LENGTHS = sorted({len(e) for e in _ENDINGS}, reverse=True)

# ---- recoding (paper Appendix B): terminal-consonant undoubling + the
# 35 spelling transformations.  Third element = letters after which the
# rule must NOT fire.
# NB: no "bb" — the reference's double-set omits it (lang/lovins.py:552)
_UNDOUBLE = ("dd", "gg", "ll", "mm", "nn", "pp", "rr", "ss", "tt")
_RECODE = (
    ("iev", "ief", ""),
    ("uct", "uc", ""),
    ("umpt", "um", ""),
    ("rpt", "rb", ""),
    ("urs", "ur", ""),
    ("istr", "ister", ""),
    ("metr", "meter", ""),
    ("olv", "olut", ""),
    ("ul", "l", "aoi"),
    ("bex", "bic", ""),
    ("dex", "dic", ""),
    ("pex", "pic", ""),
    ("tex", "tic", ""),
    ("ax", "ac", ""),
    ("ex", "ec", ""),
    ("ix", "ic", ""),
    ("lux", "luc", ""),
    ("uad", "uas", ""),
    ("vad", "vas", ""),
    ("cid", "cis", ""),
    ("lid", "lis", ""),
    ("erid", "eris", ""),
    ("pand", "pans", ""),
    ("end", "ens", "s"),
    ("ond", "ons", ""),
    ("lud", "lus", ""),
    ("rud", "rus", ""),
    ("her", "hes", "pt"),
    ("mit", "mis", ""),
    ("ent", "ens", "m"),
    ("ert", "ers", ""),
    ("et", "es", "n"),
    ("yt", "ys", ""),
    ("yz", "ys", ""),
)


def _strip_ending(word: str) -> str:
    n = len(word)
    for el in _LENGTHS:
        if n - el < 2:
            continue
        cond = _ENDINGS.get(word[n - el :])
        if cond is not None:
            stem = word[: n - el]
            if _COND[cond](stem):
                return stem
    return word


def _recode(word: str) -> str:
    if word[-2:] in _UNDOUBLE:
        word = word[:-1]
    for target, repl, not_after in _RECODE:
        if word.endswith(target):
            if not_after and len(word) > len(target) and word[-len(target) - 1] in not_after:
                return word
            return word[: len(word) - len(target)] + repl
    return word


def lovins_stem(word: str) -> str:
    """Stem one (lowercased) word."""
    if not word:
        return word
    return _recode(_strip_ending(word))


@lru_cache(maxsize=50_000)
def lovins_stem_cached(word: str) -> str:
    return lovins_stem(word)
