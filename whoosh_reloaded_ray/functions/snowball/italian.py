"""Italian Snowball stemmer — implemented from the published algorithm
(snowballstem.org/algorithms/italian/stemmer.html); parity-fuzzed
against the reference transcription (ref lang/snowball/italian.py)."""

from __future__ import annotations

from ._region import r1_start, r2_start, rv_standard

VOWELS = "aeiouàèìòù"

_ACUTE_TO_GRAVE = str.maketrans("áéíóú", "àèìòù")

_STEP0_PRON = (
    "gliela", "gliele", "glieli", "glielo", "gliene", "sene", "mela",
    "mele", "meli", "melo", "mene", "tela", "tele", "teli", "telo",
    "tene", "cela", "cele", "celi", "celo", "cene", "vela", "vele",
    "veli", "velo", "vene", "gli", "ci", "la", "le", "li", "lo",
    "mi", "ne", "si", "ti", "vi",
)

_S1_DELETE_R2 = (
    "atrice", "atrici", "abile", "abili", "ibile", "ibili", "iche",
    "ichi", "ismo", "ismi", "ista", "iste", "isti", "istà", "istè",
    "istì", "ante", "anti", "anza", "anze", "ico", "ici", "ica", "ice",
    "oso", "osa", "osi", "ose", "mente",
)
_S1_AZIONE = ("azione", "azioni", "atore", "atori")
_S1_AMENTO = ("amento", "amenti", "imento", "imenti")
_S1_IVO = ("ivo", "ivi", "iva", "ive")

_S1_ALL = tuple(
    sorted(
        _S1_DELETE_R2
        + _S1_AZIONE
        + _S1_AMENTO
        + _S1_IVO
        + (
            "amente", "logia", "logie", "uzione", "uzioni", "usione",
            "usioni", "enza", "enze", "ità",
        ),
        key=len,
        reverse=True,
    )
)

_S2 = (
    "erebbero", "irebbero", "assero", "assimo", "eranno", "erebbe",
    "eremmo", "ereste", "eresti", "essero", "iranno", "irebbe",
    "iremmo", "ireste", "iresti", "iscano", "iscono", "issero",
    "arono", "avamo", "avano", "avate", "eremo", "erete", "erono",
    "evamo", "evano", "evate", "iremo", "irete", "irono", "ivamo",
    "ivano", "ivate", "ammo", "ando", "asse", "assi", "emmo", "enda",
    "ende", "endi", "endo", "erai", "erei", "yamo", "iamo", "immo",
    "irai", "irei", "isca", "isce", "isci", "isco", "ano", "are",
    "ata", "ate", "ati", "ato", "ava", "avi", "avo", "erà", "ere",
    "erò", "ete", "eva", "evi", "evo", "irà", "ire", "irò", "ita",
    "ite", "iti", "ito", "iva", "ivi", "ivo", "ono", "uta", "ute",
    "uti", "uto", "ar", "ir",
)


def stem(word: str) -> str:
    word = word.lower().translate(_ACUTE_TO_GRAVE)
    # protect u after q, and u/i between vowels
    chars = list(word)
    for i in range(1, len(chars)):
        if chars[i] == "u" and chars[i - 1] == "q":
            chars[i] = "U"
        elif (
            chars[i] in "ui"
            and 0 < i < len(chars) - 1
            and chars[i - 1] in VOWELS
            and chars[i + 1] in VOWELS
        ):
            chars[i] = chars[i].upper()
    word = "".join(chars)

    r1 = r1_start(word, VOWELS)
    r2 = r2_start(word, VOWELS)
    rv = rv_standard(word, VOWELS)

    # step 0: attached pronoun
    for pron in _STEP0_PRON:
        if not word.endswith(pron):
            continue
        base = word[: -len(pron)]
        if base.endswith(("ando", "endo")) and len(base) - 4 >= rv:
            word = base
        else:
            # after ar/er/ir (in RV) the pronoun becomes 'e'
            for suf in ("ar", "er", "ir"):
                if base.endswith(suf) and len(base) - 2 >= rv:
                    word = base + "e"
                    break
        break

    # step 1 — longest ENDSWITH match decides the rule; a failed region
    # check does NOT fall through to a shorter suffix
    n = len(word)
    did_step1 = False
    for s in _S1_ALL:
        if not word.endswith(s):
            continue
        if s == "amente":
            if n - 6 >= r1:
                did_step1 = True
                word = word[:-6]
                if word.endswith("iv") and len(word) - 2 >= r2:
                    word = word[:-2]
                    if word.endswith("at") and len(word) - 2 >= r2:
                        word = word[:-2]
                else:
                    for t in ("os", "ic", "abil"):
                        if word.endswith(t) and len(word) - len(t) >= r2:
                            word = word[: -len(t)]
                            break
        elif s in _S1_AMENTO:
            if n - len(s) >= rv:
                did_step1 = True
                word = word[: -len(s)]
        elif s in _S1_AZIONE:
            if n - len(s) >= r2:
                did_step1 = True
                word = word[: -len(s)]
                if word.endswith("ic") and len(word) - 2 >= r2:
                    word = word[:-2]
        elif s in ("logia", "logie"):
            if n - 5 >= r2:
                did_step1 = True
                word = word[:-2]
        elif s in ("uzione", "uzioni", "usione", "usioni"):
            if n - 6 >= r2:
                did_step1 = True
                word = word[:-5]
        elif s in ("enza", "enze"):
            if n - 4 >= r2:
                did_step1 = True
                word = word[:-2] + "te"
        elif s == "ità":
            if n - 3 >= r2:
                did_step1 = True
                word = word[:-3]
                for t in ("abil", "ic", "iv"):
                    if word.endswith(t) and len(word) - len(t) >= r2:
                        word = word[: -len(t)]
                        break
        elif s in _S1_IVO:
            if n - len(s) >= r2:
                did_step1 = True
                word = word[: -len(s)]
                if word.endswith("at") and len(word) - 2 >= r2:
                    word = word[:-2]
                    if word.endswith("ic") and len(word) - 2 >= r2:
                        word = word[:-2]
        else:  # plain R2 deletions
            if n - len(s) >= r2:
                did_step1 = True
                word = word[: -len(s)]
        break

    # step 2 (only if step 1 removed nothing)
    if not did_step1:
        for s in _S2:
            if word.endswith(s) and len(word) - len(s) >= rv:
                word = word[: -len(s)]
                break

    # step 3a: final vowel in RV, then a preceding i in RV
    if word and word[-1] in "aeioàèìò" and len(word) - 1 >= rv:
        word = word[:-1]
        if word and word[-1] == "i" and len(word) - 1 >= rv:
            word = word[:-1]

    # step 3b: ch -> c, gh -> g in RV
    if word.endswith(("ch", "gh")) and len(word) - 2 >= rv:
        word = word[:-1]

    return word.replace("I", "i").replace("U", "u")
