"""Portuguese Snowball stemmer — implemented from the published
algorithm (snowballstem.org/algorithms/portuguese/stemmer.html);
parity-fuzzed against the reference transcription (ref
lang/snowball/portugese.py)."""

from __future__ import annotations

from ._region import r1_start, r2_start, rv_standard

VOWELS = "aeiouáéíóúâêô"

_S1_DELETE_R2 = (
    "amentos", "imentos", "amento", "imento", "adoras", "adores",
    "aço~es", "adora", "ismos", "istas", "ância", "aça~o", "antes",
    "ezas", "icos", "icas", "ismo", "ável", "ível", "ista", "osos",
    "osas", "ador", "ante", "eza", "ico", "ica", "oso", "osa",
)
_S1_IDADE = ("idades", "idade")
_S1_IVA = ("ivas", "ivos", "iva", "ivo")

_S2 = (
    "aríamos", "eríamos", "iríamos", "ássemos", "êssemos", "íssemos",
    "aríeis", "eríeis", "iríeis", "ásseis", "ésseis", "ísseis",
    "áramos", "éramos", "íramos", "ávamos", "aremos", "eremos",
    "iremos", "ariam", "eriam", "iriam", "assem", "essem", "issem",
    "ara~o", "era~o", "ira~o", "arias", "erias", "irias", "ardes",
    "erdes", "irdes", "asses", "esses", "isses", "astes", "estes",
    "istes", "áreis", "areis", "éreis", "ereis", "íreis", "ireis",
    "áveis", "íamos", "armos", "ermos", "irmos", "aria", "eria",
    "iria", "asse", "esse", "isse", "aste", "este", "iste", "arei",
    "erei", "irei", "aram", "eram", "iram", "avam", "arem", "erem",
    "irem", "ando", "endo", "indo", "adas", "idas", "arás", "aras",
    "erás", "eras", "irás", "avas", "ares", "eres", "ires", "íeis",
    "ados", "idos", "ámos", "amos", "emos", "imos", "iras", "ada",
    "ida", "ará", "ara", "erá", "era", "irá", "ava", "iam", "ado",
    "ido", "ias", "ais", "eis", "ira", "ia", "ei", "am", "em", "ar",
    "er", "ir", "as", "es", "is", "eu", "iu", "ou",
)


def stem(word: str) -> str:
    word = word.lower().replace("ã", "a~").replace("õ", "o~")

    r1 = r1_start(word, VOWELS)
    r2 = r2_start(word, VOWELS)
    rv = rv_standard(word, VOWELS)

    n = len(word)
    altered = False

    # step 1 — longest ENDSWITH match decides; no fall-through
    for s in _S1_ALL:
        if not word.endswith(s):
            continue
        if s == "amente":
            if n - 6 >= r1:
                altered = True
                word = word[:-6]
                if word.endswith("iv") and len(word) - 2 >= r2:
                    word = word[:-2]
                    if word.endswith("at") and len(word) - 2 >= r2:
                        word = word[:-2]
                else:
                    for t in ("os", "ic", "ad"):
                        if word.endswith(t) and len(word) - 2 >= r2:
                            word = word[:-2]
                            break
        elif s == "mente":
            if n - 5 >= r2:
                altered = True
                word = word[:-5]
                for t in ("ante", "avel", "ível"):
                    if word.endswith(t) and len(word) - 4 >= r2:
                        word = word[:-4]
                        break
        elif s in ("logias", "logia"):
            if n - len(s) >= r2:
                altered = True
                word = word[: len(word) - len(s) + 3]
        elif s in ("ências", "ência"):
            if n - len(s) >= r2:
                altered = True
                word = word[: -len(s)] + "ente"
        elif s in _S1_IDADE:
            if n - len(s) >= r2:
                altered = True
                word = word[: -len(s)]
                for t in ("abil", "ic", "iv"):
                    if word.endswith(t) and len(word) - len(t) >= r2:
                        word = word[: -len(t)]
                        break
        elif s in _S1_IVA:
            if n - len(s) >= r2:
                altered = True
                word = word[: -len(s)]
                if word.endswith("at") and len(word) - 2 >= r2:
                    word = word[:-2]
        elif s in ("iras", "ira"):
            if (
                n - len(s) >= rv
                and n - len(s) >= 1
                and word[n - len(s) - 1] == "e"
            ):
                altered = True
                word = word[: -len(s)] + "ir"
        else:
            if n - len(s) >= r2:
                altered = True
                word = word[: -len(s)]
        break

    # step 2: verb suffixes (only if step 1 removed nothing)
    if not altered:
        for s in _S2:
            if word.endswith(s) and len(word) - len(s) >= rv:
                word = word[: -len(s)]
                altered = True
                break

    # step 3 (after an alteration): final i preceded by c, in RV
    if altered:
        if (
            word.endswith("i")
            and len(word) - 1 >= rv
            and len(word) >= 2
            and word[-2] == "c"
        ):
            word = word[:-1]
    else:
        # step 4: residual suffix
        for s in ("os", "a", "i", "o", "á", "í", "ó"):
            if word.endswith(s) and len(word) - len(s) >= rv:
                word = word[: -len(s)]
                break

    # step 5: residual e/é/ê
    if word.endswith(("e", "é", "ê")) and len(word) - 1 >= rv:
        word = word[:-1]
        if (
            word.endswith("gu") and len(word) - 1 >= rv
        ) or (
            word.endswith("ci") and len(word) - 1 >= rv
        ):
            word = word[:-1]
    elif word.endswith("ç"):
        word = word[:-1] + "c"

    return word.replace("a~", "ã").replace("o~", "õ")


_S1_ALL = tuple(
    sorted(
        _S1_DELETE_R2
        + _S1_IDADE
        + _S1_IVA
        + (
            # no uça~o/uço~es rule: the reference transcription omits it
            "amente", "mente", "logias", "logia",
            "ências", "ência", "iras", "ira",
        ),
        key=len,
        reverse=True,
    )
)
