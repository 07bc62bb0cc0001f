"""Romanian Snowball stemmer — implemented from the published algorithm
(snowballstem.org/algorithms/romanian/stemmer.html), behavior-converged
against the reference transcription (ref lang/snowball/romanian.py).

The reference predates the 2015 ș/ț (comma-below) revision and matches
the cedilla forms ş/ţ only.  Its quirks, replicated on purpose:

- region gates are substring CONTAINMENT on region strings captured
  BEFORE the word mutates (step 0/1 rewrites leave r1/r2 stale, so a
  later gate can pass on text the word no longer ends with — and the
  ``iune``→``t`` branch can then index out of bounds, raising);
- step 0/1/2 break on the first ``endswith`` match whether or not the
  region gate admits the action, while step 3/4 keep scanning until
  a suffix passes its RV containment;
- a step-1 match outside R1 RESETS the step-1 success flag even when
  an earlier while-loop pass had set it;
- the ``iune``/``iuni`` branch acts only on a preceding ţ but reports
  success either way (suppressing step 3);
- step 3's consonant-before check uses the FIRST occurrence of the
  suffix inside RV (``rv.index``) and a vowel set WITHOUT u (the
  spec's "preceded by a consonant or u").
"""

from __future__ import annotations

VOWELS = "aeiouăâî"

_STEP0 = (
    "iilor", "ului", "elor", "iile", "ilor", "atei", "aţie", "aţia",
    "aua", "ele", "iua", "iei", "ile", "ul", "ea", "ii",
)

_STEP1 = (
    "abilitate", "abilitati", "abilităţi", "ibilitate", "abilităi",
    "ivitate", "ivitati", "ivităţi", "icitate", "icitati", "icităţi",
    "icatori", "ivităi", "icităi", "icator", "aţiune", "atoare",
    "ătoare", "iţiune", "itoare", "iciva", "icive", "icivi", "icivă",
    "icala", "icale", "icali", "icală", "ativa", "ative", "ativi",
    "ativă", "atori", "ători", "itiva", "itive", "itivi", "itivă",
    "itori", "iciv", "ical", "ativ", "ator", "ător", "itiv", "itor",
)
_S1_ABIL = frozenset(("abilitate", "abilitati", "abilităi", "abilităţi"))
_S1_IV = frozenset(("ivitate", "ivitati", "ivităi", "ivităţi"))
_S1_IC = frozenset((
    "icitate", "icitati", "icităi", "icităţi", "icator", "icatori",
    "iciv", "iciva", "icive", "icivi", "icivă",
    "ical", "icala", "icale", "icali", "icală",
))
_S1_AT = frozenset((
    "ativ", "ativa", "ative", "ativi", "ativă", "aţiune",
    "atoare", "ator", "atori", "ătoare", "ător", "ători",
))
_S1_IT = frozenset((
    "itiv", "itiva", "itive", "itivi", "itivă", "iţiune",
    "itoare", "itor", "itori",
))

_STEP2 = (
    "abila", "abile", "abili", "abilă", "ibila", "ibile", "ibili",
    "ibilă", "atori", "itate", "itati", "ităţi", "abil", "ibil",
    "oasa", "oasă", "oase", "anta", "ante", "anti", "antă", "ator",
    "ităi", "iune", "iuni", "isme", "ista", "iste", "isti", "istă",
    "işti", "ata", "ată", "ati", "ate", "uta", "ută", "uti", "ute",
    "ita", "ită", "iti", "ite", "ica", "ice", "ici", "ică", "osi",
    "oşi", "ant", "iva", "ive", "ivi", "ivă", "ism", "ist", "at",
    "ut", "it", "ic", "os", "iv",
)
_S2_IST = frozenset(
    ("ism", "isme", "ist", "ista", "iste", "isti", "istă", "işti")
)

_STEP3 = (
    "seserăţi", "aserăţi", "iserăţi", "âserăţi", "userăţi", "seserăm",
    "aserăm", "iserăm", "âserăm", "userăm", "serăţi", "seseşi",
    "seseră", "ească", "arăţi", "urăţi", "irăţi", "ârăţi", "aseşi",
    "aseră", "iseşi", "iseră", "âseşi", "âseră", "useşi", "useră",
    "serăm", "sesem", "indu", "ându", "ează", "eşti", "eşte", "ăşti",
    "ăşte", "eaţi", "iaţi", "arăm", "urăm", "irăm", "ârăm", "asem",
    "isem", "âsem", "usem", "seşi", "seră", "sese", "are", "ere",
    "ire", "âre", "ind", "ând", "eze", "ezi", "esc", "ăsc", "eam",
    "eai", "eau", "iam", "iai", "iau", "aşi", "ară", "uşi", "ură",
    "işi", "iră", "âşi", "âră", "ase", "ise", "âse", "use", "aţi",
    "eţi", "iţi", "âţi", "sei", "ez", "am", "ai", "au", "ea", "ia",
    "ui", "âi", "ăm", "em", "im", "âm", "se",
)
# the s-group deletes unconditionally (and consumes RV); the rest need
# a non-vowel (u counts as consonant) before the first RV occurrence
_S3_SE = frozenset((
    "seserăţi", "seserăm", "serăţi", "seseşi", "seseră", "serăm",
    "sesem", "seşi", "seră", "sese", "aţi", "eţi", "iţi", "âţi",
    "sei", "ăm", "em", "im", "âm", "se",
))
_S3_CONSONANTS_BEFORE = "aeioăâî"  # NOT u

_STEP4 = ("ie", "a", "e", "i", "ă")


def _mark_consonants(word: str) -> str:
    w = list(word)
    for i in range(1, len(w) - 1):
        if w[i - 1] in VOWELS and w[i + 1] in VOWELS:
            if w[i] == "u":
                w[i] = "U"
            elif w[i] == "i":
                w[i] = "I"
    return "".join(w)


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


def _rv(word: str) -> str:
    if len(word) < 2:
        return ""
    if word[1] not in VOWELS:
        for i in range(2, len(word)):
            if word[i] in VOWELS:
                return word[i + 1 :]
        return ""
    if word[:2] in VOWELS:  # reference substring quirk
        for i in range(2, len(word)):
            if word[i] not in VOWELS:
                return word[i + 1 :]
        return ""
    return word[3:]


def stem(word: str) -> str:  # noqa: C901
    word = word.lower()
    word = _mark_consonants(word)
    r1, r2 = _r1r2(word)
    rv = _rv(word)

    step1_done = False
    step2_done = False

    # STEP 0: plurals and article simplifications
    for s in _STEP0:
        if not word.endswith(s):
            continue
        if s in r1:
            if s in ("ul", "ului"):
                word = word[: -len(s)]
                rv = rv[: -len(s)] if s in rv else ""
            elif s in ("aua", "atei") or (
                s == "ile" and word[-5:-3] != "ab"
            ):
                word = word[:-2]
            elif s in ("ea", "ele", "elor"):
                word = word[: -len(s)] + "e"
                rv = rv[: -len(s)] + "e" if s in rv else ""
            elif s in ("ii", "iua", "iei", "iile", "iilor", "ilor"):
                word = word[: -len(s)] + "i"
                rv = rv[: -len(s)] + "i" if s in rv else ""
            elif s in ("aţie", "aţia"):
                word = word[:-1]
        break

    # STEP 1: combining suffixes, repeated until no rewrite; a match
    # outside R1 resets the success flag and ends the loop
    while True:
        rewrote = False
        for s in _STEP1:
            if not word.endswith(s):
                continue
            if s in r1:
                step1_done = True
                rewrote = True
                if s in _S1_ABIL:
                    word = word[: -len(s)] + "abil"
                elif s == "ibilitate":
                    word = word[:-5]
                elif s in _S1_IV:
                    word = word[: -len(s)] + "iv"
                elif s in _S1_IC:
                    word = word[: -len(s)] + "ic"
                elif s in _S1_AT:
                    word = word[: -len(s)] + "at"
                    if s in r2:
                        r2 = r2[: -len(s)] + "at"
                elif s in _S1_IT:
                    word = word[: -len(s)] + "it"
                    if s in r2:
                        r2 = r2[: -len(s)] + "it"
            else:
                step1_done = False
            break
        if not rewrote:
            break

    # STEP 2: standard suffixes
    for s in _STEP2:
        if not word.endswith(s):
            continue
        if s in r2:
            step2_done = True
            if s in ("iune", "iuni"):
                if word[-5] == "ţ":
                    word = word[:-5] + "t"
            elif s in _S2_IST:
                word = word[: -len(s)] + "ist"
            else:
                word = word[: -len(s)]
        break

    # STEP 3: verb suffixes (only when steps 1 and 2 both failed)
    if not step1_done and not step2_done:
        for s in _STEP3:
            if word.endswith(s) and s in rv:
                if s in _S3_SE:
                    word = word[: -len(s)]
                    rv = rv[: -len(s)]
                elif (
                    not rv.startswith(s)
                    and rv[rv.index(s) - 1] not in _S3_CONSONANTS_BEFORE
                ):
                    word = word[: -len(s)]
                break

    # STEP 4: final vowel
    for s in _STEP4:
        if word.endswith(s):
            if s in rv:
                word = word[: -len(s)]
            break

    return word.replace("I", "i").replace("U", "u")
