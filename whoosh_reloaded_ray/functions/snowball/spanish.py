"""Spanish Snowball stemmer — implemented from the published algorithm
(snowballstem.org/algorithms/spanish/stemmer.html); parity-fuzzed
against the reference transcription (ref lang/snowball/spanish.py)."""

from __future__ import annotations

from ._region import r1_start, r2_start, rv_standard

VOWELS = "aeiouáéíóúü"

_STEP0_PRON = (
    "selas", "selos", "sela", "selo", "las", "les", "los", "nos",
    "me", "se", "la", "le", "lo",
)
_STEP0_A = ("iéndo", "ándo", "ár", "ér", "ír")
_STEP0_B = ("iendo", "ando", "ar", "er", "ir")
_DEACCENT = str.maketrans("áéíóú", "aeiou")

_S1_DELETE_R2 = (
    "amientos", "imientos", "amiento", "imiento", "anzas", "ismos",
    "ables", "ibles", "istas", "anza", "icos", "icas", "ismo", "able",
    "ible", "ista", "osos", "osas", "ico", "ica", "oso", "osa",
)
_S1_ADOR = ("aciones", "adoras", "adores", "ancias", "adora", "ación", "antes", "ancia", "ador", "ante")
_S1_IDAD = ("idades", "idad")
_S1_IVA = ("ivas", "ivos", "iva", "ivo")

_S2A = ("yeron", "yendo", "yamos", "yais", "yan", "yen", "yas", "yes", "ya", "ye", "yo", "yó")
_S2B_GU = ("en", "es", "éis", "emos")
_S2B = (
    "aríamos", "eríamos", "iríamos", "iéramos", "iésemos", "aríais",
    "aremos", "eríais", "eremos", "iríais", "iremos", "ierais", "ieseis",
    "asteis", "isteis", "ábamos", "áramos", "ásemos", "arían", "arías",
    "aréis", "erían", "erías", "eréis", "irían", "irías", "iréis",
    "ieran", "iesen", "ieron", "iendo", "ieras", "ieses", "abais",
    "arais", "aseis", "íamos", "arán", "arás", "aría", "erán", "erás",
    "ería", "irán", "irás", "iría", "iera", "iese", "aste", "iste",
    "aban", "aran", "asen", "aron", "ando", "abas", "adas", "idas",
    "aras", "ases", "íais", "ados", "idos", "amos", "imos", "ará",
    "aré", "erá", "eré", "irá", "iré", "aba", "ada", "ida", "ara",
    "ase", "ían", "ado", "ido", "ías", "áis", "ía", "ad", "ed", "id",
    "an", "ió", "ar", "er", "ir", "as", "ís",
)
_S3_LONG = ("os", "a", "o", "á", "í", "ó")

# longest-first union for step 2b
_S2B_ALL = tuple(sorted(_S2B + _S2B_GU, key=len, reverse=True))


def stem(word: str) -> str:
    word = word.lower()
    r1 = r1_start(word, VOWELS)
    r2 = r2_start(word, VOWELS)
    rv = rv_standard(word, VOWELS)

    # step 0: attached pronoun
    for pron in _STEP0_PRON:
        if not word.endswith(pron):
            continue
        base = word[: -len(pron)]
        for suf in _STEP0_A:
            if base.endswith(suf) and len(base) - len(suf) >= rv:
                word = base[: -len(suf)] + suf.translate(_DEACCENT)
                break
        else:
            for suf in _STEP0_B:
                if base.endswith(suf) and len(base) - len(suf) >= rv:
                    word = base
                    break
            else:
                if (
                    base.endswith("yendo")
                    and len(base) >= 6
                    and base[-6] == "u"
                    and len(base) - 5 >= rv
                ):
                    word = base
        break

    # step 1: standard suffixes
    did_step1 = True
    n = len(word)
    if any(word.endswith(s) and n - len(s) >= r2 for s in _S1_DELETE_R2):
        for s in _S1_DELETE_R2:
            if word.endswith(s) and n - len(s) >= r2:
                word = word[: -len(s)]
                break
    elif any(word.endswith(s) and n - len(s) >= r2 for s in _S1_ADOR):
        for s in _S1_ADOR:
            if word.endswith(s) and n - len(s) >= r2:
                word = word[: -len(s)]
                if word.endswith("ic") and len(word) - 2 >= r2:
                    word = word[:-2]
                break
    elif word.endswith("logías") and n - 6 >= r2:
        word = word[:-3]
    elif word.endswith("logía") and n - 5 >= r2:
        word = word[:-2]
    elif word.endswith("uciones") and n - 7 >= r2:
        word = word[:-6]
    elif word.endswith("ución") and n - 5 >= r2:
        word = word[:-4]
    elif word.endswith("encias") and n - 6 >= r2:
        word = word[:-6] + "ente"
    elif word.endswith("encia") and n - 5 >= r2:
        word = word[:-5] + "ente"
    elif word.endswith("amente") and n - 6 >= r1:
        word = word[:-6]
        if word.endswith("iv") and len(word) - 2 >= r2:
            word = word[:-2]
            if word.endswith("at") and len(word) - 2 >= r2:
                word = word[:-2]
        else:
            for s in ("os", "ic", "ad"):
                if word.endswith(s) and len(word) - 2 >= r2:
                    word = word[:-2]
                    break
    elif word.endswith("mente") and n - 5 >= r2:
        word = word[:-5]
        for s in ("ante", "able", "ible"):
            if word.endswith(s) and len(word) - 4 >= r2:
                word = word[:-4]
                break
    elif any(word.endswith(s) and n - len(s) >= r2 for s in _S1_IDAD):
        for s in _S1_IDAD:
            if word.endswith(s) and n - len(s) >= r2:
                word = word[: -len(s)]
                break
        for s in ("abil", "ic", "iv"):
            if word.endswith(s) and len(word) - len(s) >= r2:
                word = word[: -len(s)]
                break
    elif any(word.endswith(s) and n - len(s) >= r2 for s in _S1_IVA):
        for s in _S1_IVA:
            if word.endswith(s) and n - len(s) >= r2:
                word = word[: -len(s)]
                if word.endswith("at") and len(word) - 2 >= r2:
                    word = word[:-2]
                break
    else:
        did_step1 = False

    # step 2a: verb suffixes beginning with y (only if step 1 removed
    # nothing), u must precede
    did_step2a = False
    if not did_step1:
        for s in _S2A:
            if (
                word.endswith(s)
                and len(word) - len(s) >= rv
                and len(word) - len(s) >= 1
                and word[len(word) - len(s) - 1] == "u"
            ):
                word = word[: -len(s)]
                did_step2a = True
                break

    # step 2b: other verb suffixes — LONGEST match across the whole set;
    # only the en/es/éis/emos group triggers the gu -> g cleanup
    if not did_step1 and not did_step2a:
        for s in _S2B_ALL:
            if word.endswith(s) and len(word) - len(s) >= rv:
                word = word[: -len(s)]
                if s in _S2B_GU and word.endswith("gu"):
                    word = word[:-1]
                break

    # step 3: residual suffix
    for s in _S3_LONG:
        if word.endswith(s) and len(word) - len(s) >= rv:
            word = word[: -len(s)]
            break
    else:
        if word.endswith(("e", "é")) and len(word) - 1 >= rv:
            word = word[:-1]
            if (
                word.endswith("gu")
                and len(word) - 1 >= rv
            ):
                word = word[:-1]

    return word.translate(_DEACCENT)
