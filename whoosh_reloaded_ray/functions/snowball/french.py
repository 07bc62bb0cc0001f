"""French Snowball stemmer — implemented from the published algorithm
(snowballstem.org/algorithms/french/stemmer.html), behavior-converged
against the reference transcription (ref lang/snowball/french.py).

Reference quirks replicated on purpose (the REFERENCE is the parity
target):

- region gates use substring CONTAINMENT (``suffix in r2``), not
  ``endswith`` — a suffix occurring earlier inside the region string
  also satisfies the gate;
- step 1/2a/4 dispatch on the FIRST ``endswith`` match in tuple order
  and never fall back to a shorter suffix when the matched branch's
  region gate fails (e.g. ``ements`` outside RV does not retry
  ``ments``);
- the ``ion`` residual branch indexes ``rv[-4]`` unguarded, raising
  IndexError when RV is exactly ``ion`` and the r2 gate holds;
- the u/i/y consonant-marking passes scan left-to-right over the
  mutating word, so a freshly-marked U/I no longer counts as a vowel
  for the next position;
- un-accenting replaces only the LAST vowel of the word when it is
  é/è and non-final (the spec's "é/è followed by consonants" scan).
"""

from __future__ import annotations

VOWELS = "aeiouyâàëéêèïîôûù"

_STEP1 = (
    "issements", "issement", "atrices", "atrice", "ateurs", "ations",
    "logies", "usions", "utions", "ements", "amment", "emment",
    "ances", "iqUes", "ismes", "ables", "istes", "ateur", "ation",
    "logie", "usion", "ution", "ences", "ement", "euses", "ments",
    "ance", "iqUe", "isme", "able", "iste", "ence", "ités", "ives",
    "eaux", "euse", "ment", "eux", "ité", "ive", "ifs", "aux", "if",
)
_S1_R2_DELETE = frozenset((
    "ance", "iqUe", "isme", "able", "iste", "eux",
    "ances", "iqUes", "ismes", "ables", "istes",
))
_S1_ATEUR = frozenset(
    ("atrice", "ateur", "ation", "atrices", "ateurs", "ations")
)

_STEP2A = (
    "issaIent", "issantes", "iraIent", "issante", "issants",
    "issions", "irions", "issais", "issait", "issant", "issent",
    "issiez", "issons", "irais", "irait", "irent", "iriez", "irons",
    "iront", "isses", "issez", "îmes", "îtes", "irai", "iras",
    "irez", "isse", "ies", "ira", "ît", "ie", "ir", "is", "it", "i",
)

_STEP2B = (
    "eraIent", "assions", "erions", "assent", "assiez", "èrent",
    "erais", "erait", "eriez", "erons", "eront", "aIent", "antes",
    "asses", "ions", "erai", "eras", "erez", "âmes", "âtes", "ante",
    "ants", "asse", "ées", "era", "iez", "ais", "ait", "ant", "ée",
    "és", "er", "ez", "ât", "ai", "as", "é", "a",
)
_S2B_ER = frozenset((
    "eraIent", "erions", "èrent", "erais", "erait", "eriez", "erons",
    "eront", "erai", "eras", "erez", "ées", "era", "iez", "ée", "és",
    "er", "ez", "é",
))
_S2B_A = frozenset((
    "assions", "assent", "assiez", "aIent", "antes", "asses", "âmes",
    "âtes", "ante", "ants", "asse", "ais", "ait", "ant", "ât", "ai",
    "as", "a",
))

_STEP4 = ("ière", "Ière", "ion", "ier", "Ier", "e", "ë")


def _mark_consonants(word: str) -> str:
    # u after q
    w = list(word)
    for i in range(1, len(w)):
        if w[i] == "u" and w[i - 1] == "q":
            w[i] = "U"
    # u/i between vowels, y adjacent to a vowel — sequential, so an
    # already-marked U/I is no longer a vowel for later positions
    for i in range(1, len(w) - 1):
        if w[i - 1] in VOWELS and w[i + 1] in VOWELS:
            if w[i] == "u":
                w[i] = "U"
            elif w[i] == "i":
                w[i] = "I"
        if w[i] == "y" and (w[i - 1] in VOWELS or w[i + 1] in VOWELS):
            w[i] = "Y"
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
    if word.startswith(("par", "col", "tap")) or (
        word[0] in VOWELS and word[1] in VOWELS
    ):
        return word[3:]
    for i in range(1, len(word)):
        if word[i] in VOWELS:
            return word[i + 1 :]
    return ""


def stem(word: str) -> str:  # noqa: C901
    word = word.lower()
    word = _mark_consonants(word)
    r1, r2 = _r1r2(word)
    rv = _rv(word)

    step1_done = False
    rv_ending = False
    step2a_done = False
    step2b_done = False

    # STEP 1: standard suffixes — first endswith match dispatches
    for s in _STEP1:
        if not word.endswith(s):
            continue
        if s == "eaux":
            word = word[:-1]
            step1_done = True
        elif s in ("euse", "euses"):
            if s in r2:
                word = word[: -len(s)]
                step1_done = True
            elif s in r1:
                word = word[: -len(s)] + "eux"
                step1_done = True
        elif s in ("ement", "ements") and s in rv:
            word = word[: -len(s)]
            step1_done = True
            if word[-2:] == "iv" and "iv" in r2:
                word = word[:-2]
                if word[-2:] == "at" and "at" in r2:
                    word = word[:-2]
            elif word[-3:] == "eus":
                if "eus" in r2:
                    word = word[:-3]
                elif "eus" in r1:
                    word = word[:-1] + "x"
            elif word[-3:] in ("abl", "iqU"):
                if "abl" in r2 or "iqU" in r2:
                    word = word[:-3]
            elif word[-3:] in ("ièr", "Ièr"):
                if "ièr" in rv or "Ièr" in rv:
                    word = word[:-3] + "i"
        elif s == "amment" and s in rv:
            word = word[:-6] + "ant"
            rv = rv[:-6] + "ant"
            rv_ending = True
        elif s == "emment" and s in rv:
            word = word[:-6] + "ent"
            rv_ending = True
        elif (
            s in ("ment", "ments")
            and s in rv
            and not rv.startswith(s)
            and rv[rv.rindex(s) - 1] in VOWELS
        ):
            word = word[: -len(s)]
            rv = rv[: -len(s)]
            rv_ending = True
        elif s == "aux" and s in r1:
            word = word[:-2] + "l"
            step1_done = True
        elif (
            s in ("issement", "issements")
            and s in r1
            and word[-len(s) - 1] not in VOWELS
        ):
            word = word[: -len(s)]
            step1_done = True
        elif s in _S1_R2_DELETE and s in r2:
            word = word[: -len(s)]
            step1_done = True
        elif s in _S1_ATEUR and s in r2:
            word = word[: -len(s)]
            step1_done = True
            if word[-2:] == "ic":
                if "ic" in r2:
                    word = word[:-2]
                else:
                    word = word[:-2] + "iqU"
        elif s in ("logie", "logies") and s in r2:
            word = word[: -len(s)] + "log"
            step1_done = True
        elif s in ("usion", "ution", "usions", "utions") and s in r2:
            word = word[: -len(s)] + "u"
            step1_done = True
        elif s in ("ence", "ences") and s in r2:
            word = word[: -len(s)] + "ent"
            step1_done = True
        elif s in ("ité", "ités") and s in r2:
            word = word[: -len(s)]
            step1_done = True
            if word[-4:] == "abil":
                if "abil" in r2:
                    word = word[:-4]
                else:
                    word = word[:-2] + "l"
            elif word[-2:] == "ic":
                if "ic" in r2:
                    word = word[:-2]
                else:
                    word = word[:-2] + "iqU"
            elif word[-2:] == "iv":
                if "iv" in r2:
                    word = word[:-2]
        elif s in ("if", "ive", "ifs", "ives") and s in r2:
            word = word[: -len(s)]
            step1_done = True
            if word[-2:] == "at" and "at" in r2:
                word = word[:-2]
                if word[-2:] == "ic":
                    if "ic" in r2:
                        word = word[:-2]
                    else:
                        word = word[:-2] + "iqU"
        break

    # STEP 2a: verb suffixes beginning with i (non-vowel before, in RV)
    if not step1_done or rv_ending:
        for s in _STEP2A:
            if word.endswith(s):
                if (
                    s in rv
                    and len(rv) > len(s)
                    and rv[rv.rindex(s) - 1] not in VOWELS
                ):
                    word = word[: -len(s)]
                    step2a_done = True
                break

        # STEP 2b: other verb suffixes
        if not step2a_done:
            for s in _STEP2B:
                if rv.endswith(s):
                    if s == "ions" and "ions" in r2:
                        word = word[:-4]
                        step2b_done = True
                    elif s in _S2B_ER:
                        word = word[: -len(s)]
                        step2b_done = True
                    elif s in _S2B_A:
                        word = word[: -len(s)]
                        rv = rv[: -len(s)]
                        step2b_done = True
                        if rv.endswith("e"):
                            word = word[:-1]
                    break

    if step1_done or step2a_done or step2b_done:
        # STEP 3: residual Y / ç
        if word[-1] == "Y":
            word = word[:-1] + "i"
        elif word[-1] == "ç":
            word = word[:-1] + "c"
    else:
        # STEP 4: residual suffixes
        if len(word) >= 2 and word[-1] == "s" and word[-2] not in "aiouès":
            word = word[:-1]
        for s in _STEP4:
            if word.endswith(s) and s in rv:
                if s == "ion" and s in r2 and rv[-4] in "st":
                    word = word[:-3]
                elif s in ("ier", "ière", "Ier", "Ière"):
                    word = word[: -len(s)] + "i"
                elif s == "e":
                    word = word[:-1]
                elif s == "ë" and word[-3:-1] == "gu":
                    word = word[:-1]
                break

    # STEP 5: undouble
    if word.endswith(("enn", "onn", "ett", "ell", "eill")):
        word = word[:-1]

    # STEP 6: un-accent the last vowel when é/è and non-final
    for i in range(1, len(word)):
        if word[-i] in VOWELS:
            if i != 1 and word[-i] in "éè":
                word = word[:-i] + "e" + word[-i + 1 :]
            break

    return word.replace("I", "i").replace("U", "u").replace("Y", "y")
