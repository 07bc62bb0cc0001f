"""Double Metaphone phonetic encoding (Lawrence Philips, 1998-2000).

Original, handler-per-letter implementation of the published algorithm
(the reference carries a public-domain translation at lang/dmetaphone.py:1;
cf. analysis/morph.py:218 DoubleMetaphoneFilter).  Behavior-matched to the
reference transcription — including its stale-action fallthrough quirk in
the G/GH branch, where an unmatched sub-case silently re-applies the
previous letter's action — and black-box fuzz-verified in
tests/test_analysis.py.

Returns ``(primary, secondary_or_None)``.
"""

from __future__ import annotations

import re

V = frozenset("AEIOUY")
_SLAVO = re.compile("W|K|CZ|WITZ")
_SILENT_START = re.compile("GN|KN|PN|WR|PS")

# Each handler takes (w, i, first, last, slavo) where w is the padded
# text ("--" + WORD + 5 spaces, so first == 2) and returns either
#   (both, advance)            -> appended to primary AND secondary
#   (prim, sec, advance)       -> appended separately ('' / None = skip)
# or None, meaning "leave the previous action in place" (the reference's
# fallthrough quirk — only the G handler produces it).


def _h_vowel(w, i, first, last, sl):
    return ("A", 1) if i == first else (None, 1)


def _h_b(w, i, first, last, sl):
    return ("P", 2 if w[i + 1] == "B" else 1)


def _h_c(w, i, first, last, sl):
    if (
        i > first + 1
        and w[i - 2] not in V
        and w[i - 1 : i + 2] == "ACH"
        and (w[i + 2] not in "IE" or w[i - 2 : i + 4] in ("BACHER", "MACHER"))
    ):
        return ("K", 2)
    if i == first and w[first : first + 6] == "CAESAR":
        return ("S", 2)
    if w[i : i + 4] == "CHIA":
        return ("K", 2)
    if w[i : i + 2] == "CH":
        if i > first and w[i : i + 4] == "CHAE":
            return ("K", "X", 2)
        if (
            i == first
            and (
                w[i + 1 : i + 6] in ("HARAC", "HARIS")
                or w[i + 1 : i + 4] in ("HOR", "HYM", "HIA", "HEM")
            )
            and w[first : first + 5] != "CHORE"
        ):
            return ("K", 2)
        if (
            w[first : first + 4] in ("VAN ", "VON ")
            or w[first : first + 3] == "SCH"
            or w[i - 2 : i + 4] in ("ORCHES", "ARCHIT", "ORCHID")
            or w[i + 2] in "TS"
            or (
                (w[i - 1] in "AOUE" or i == first)
                and w[i + 2] in "LRNMBHFVW "
            )
        ):
            return ("K", 1)
        if i > first:
            if w[first : first + 2] == "MC":
                return ("K", 2)
            return ("X", "K", 2)
        return ("X", 2)
    if w[i : i + 2] == "CZ" and w[i - 2 : i + 2] != "WICZ":
        return ("S", "X", 2)
    if w[i + 1 : i + 4] == "CIA":
        return ("X", 3)
    if w[i : i + 2] == "CC" and not (i == first + 1 and w[first] == "M"):
        if w[i + 2] in "IEH" and w[i + 2 : i + 4] != "HU":
            if (i == first + 1 and w[first] == "A") or w[i - 1 : i + 4] in (
                "UCCEE",
                "UCCES",
            ):
                return ("KS", 3)
            return ("X", 3)
        return ("K", 2)
    if w[i : i + 2] in ("CK", "CG", "CQ"):
        return ("K", "K", 2)
    if w[i : i + 2] in ("CI", "CE", "CY"):
        if w[i : i + 3] in ("CIO", "CIE", "CIA"):
            return ("S", "X", 2)
        return ("S", 2)
    if w[i + 1 : i + 3] in (" C", " Q", " G"):
        return ("K", 3)
    if w[i + 1] in "CKQ" and w[i + 1 : i + 3] not in ("CE", "CI"):
        return ("K", 2)
    return ("K", 1)


def _h_d(w, i, first, last, sl):
    if w[i : i + 2] == "DG":
        if w[i + 2] in "IEY":
            return ("J", 3)
        return ("TK", 2)
    if w[i : i + 2] in ("DT", "DD"):
        return ("T", 2)
    return ("T", 1)


def _h_g(w, i, first, last, sl):
    nxt = w[i + 1]
    if nxt == "H":
        if i > first and w[i - 1] not in V:
            return ("K", 2)
        if i < first + 3:
            if i == first:
                return ("J", 2) if w[i + 2] == "I" else ("K", 2)
            return None  # QUIRK: falls through to the previous action
        if (
            (i > first + 1 and w[i - 2] in "BHD")
            or (i > first + 2 and w[i - 3] in "BHD")
            or (i > first + 3 and w[i - 4] in "BH")
        ):
            return (None, 2)
        if i > first + 2 and w[i - 1] == "U" and w[i - 3] in "CGLRT":
            return ("F", 2)
        if i > first and w[i - 1] != "I":
            return ("K", 2)
        return None  # QUIRK: falls through to the previous action
    if nxt == "N":
        if i == first + 1 and w[first] in V and not sl:
            return ("KN", "N", 2)
        if w[i + 2 : i + 4] != "EY" and nxt != "Y" and not sl:
            return ("N", "KN", 2)
        return ("KN", 2)
    if w[i + 1 : i + 3] == "LI" and not sl:
        return ("KL", "L", 2)
    if i == first and (
        nxt == "Y"
        or w[i + 1 : i + 3]
        in ("ES", "EP", "EB", "EL", "EY", "IB", "IL", "IN", "IE", "EI", "ER")
    ):
        return ("K", "J", 2)
    if (
        (w[i + 1 : i + 2] == "ER" or nxt == "Y")
        and w[first : first + 6] not in ("DANGER", "RANGER", "MANGER")
        and w[i - 1] not in "EI"
        and w[i - 1 : i + 2] not in ("RGY", "OGY")
    ):
        return ("K", "J", 2)
    if nxt in "EIY" or w[i - 1 : i + 3] in ("AGGI", "OGGI"):
        if (
            w[first : first + 4] in ("VON ", "VAN ")
            or w[first : first + 3] == "SCH"
            or w[i + 1 : i + 3] == "ET"
        ):
            return ("K", 2)
        if w[i + 1 : i + 5] == "IER ":
            return ("J", 2)
        return ("J", "K", 2)
    if nxt == "G":
        return ("K", 2)
    return ("K", 1)


def _h_h(w, i, first, last, sl):
    if (i == first or w[i - 1] in V) and w[i + 1] in V:
        return ("H", 2)
    return (None, 1)


def _h_j(w, i, first, last, sl):
    adv = 2 if w[i + 1] == "J" else 1
    if w[i : i + 4] == "JOSE" or w[first : first + 4] == "SAN ":
        if (i == first and w[i + 4] == " ") or w[first : first + 4] == "SAN ":
            return ("H", adv)
        return ("J", "H", adv)
    if i == first and w[i : i + 4] != "JOSE":
        return ("J", "A", adv)
    if w[i - 1] in V and not sl and w[i + 1] in "AO":
        return ("J", "H", adv)
    if i == last:
        return ("J", " ", adv)
    if w[i + 1] not in "LTKSNMBZ" and w[i - 1] not in "SKL":
        return ("J", adv)
    return (None, adv)


def _h_l(w, i, first, last, sl):
    if w[i + 1] == "L":
        if (i == last - 2 and w[i - 1 : i + 3] in ("ILLO", "ILLA", "ALLE")) or (
            (w[last - 1 : last + 1] in ("AS", "OS") or w[last] in "AO")
            and w[i - 1 : i + 3] == "ALLE"
        ):
            return ("L", "", 2)
        return ("L", 2)
    return ("L", 1)


def _h_m(w, i, first, last, sl):
    if (
        w[i + 1 : i + 4] == "UMB"
        and (i + 1 == last or w[i + 2 : i + 4] == "ER")
        or w[i + 1] == "M"
    ):
        return ("M", 2)
    return ("M", 1)


def _h_p(w, i, first, last, sl):
    if w[i + 1] == "H":
        return ("F", 2)
    if w[i + 1] in "PB":
        return ("P", 2)
    return ("P", 1)


def _h_r(w, i, first, last, sl):
    adv = 2 if w[i + 1] == "R" else 1
    if (
        i == last
        and not sl
        and w[i - 2 : i] == "IE"
        and w[i - 4 : i - 2] not in ("ME", "MA")
    ):
        return ("", "R", adv)
    return ("R", adv)


def _h_s(w, i, first, last, sl):
    if w[i - 1 : i + 2] in ("ISL", "YSL"):
        return (None, 1)
    if i == first and w[first : first + 5] == "SUGAR":
        return ("X", "S", 1)
    if w[i : i + 2] == "SH":
        if w[i + 1 : i + 5] in ("HEIM", "HOEK", "HOLM", "HOLZ"):
            return ("S", 2)
        return ("X", 2)
    if w[i : i + 3] in ("SIO", "SIA") or w[i : i + 4] == "SIAN":
        return ("S", 3) if sl else ("S", "X", 3)
    if (i == first and w[i + 1] in "MNLW") or w[i + 1] == "Z":
        adv = 2 if w[i + 1] == "Z" else 1
        return ("S", "X", adv)
    if w[i : i + 2] == "SC":
        if w[i + 2] == "H":
            if w[i + 3 : i + 5] in ("OO", "ER", "EN", "UY", "ED", "EM"):
                if w[i + 3 : i + 5] in ("ER", "EN"):
                    return ("X", "SK", 3)
                return ("SK", 3)
            if i == first and w[first + 3] not in V and w[first + 3] != "W":
                return ("X", "S", 3)
            return ("X", 3)
        if w[i + 2] in "IEY":
            return ("S", 3)
        return ("SK", 3)
    if i == last and w[i - 2 : i] in ("AI", "OI"):
        return ("", "S", 1)
    adv = 2 if w[i + 1] in "SZ" else 1
    return ("S", adv)


def _h_t(w, i, first, last, sl):
    if w[i : i + 4] == "TION":
        return ("X", 3)
    if w[i : i + 3] in ("TIA", "TCH"):
        return ("X", 3)
    if w[i : i + 2] == "TH" or w[i : i + 3] == "TTH":
        if (
            w[i + 2 : i + 4] in ("OM", "AM")
            or w[first : first + 4] in ("VON ", "VAN ")
            or w[first : first + 3] == "SCH"
        ):
            return ("T", 2)
        return ("0", "T", 2)
    if w[i + 1] in "TD":
        return ("T", 2)
    return ("T", 1)


def _h_w(w, i, first, last, sl):
    if w[i : i + 2] == "WR":
        return ("R", 2)
    if i == first and (w[i + 1] in V or w[i : i + 2] == "WH"):
        if w[i + 1] in V:
            return ("A", "F", 1)
        return ("A", 1)
    if (
        (i == last and w[i - 1] in V)
        or w[i - 1 : i + 5] in ("EWSKI", "EWSKY", "OWSKI", "OWSKY")
        or w[first : first + 3] == "SCH"
    ):
        return ("", "F", 1)
    if w[i : i + 4] in ("WICZ", "WITZ"):
        return ("TS", "FX", 4)
    return (None, 1)


def _h_x(w, i, first, last, sl):
    adv = 2 if w[i + 1] in "CX" else 1
    if i == last and (
        w[i - 3 : i] in ("IAU", "EAU") or w[i - 2 : i] in ("AU", "OU")
    ):
        return (None, adv)
    return ("KS", adv)


def _h_z(w, i, first, last, sl):
    adv = 2 if w[i + 1] == "Z" else 1
    if w[i + 1] == "H":
        return ("J", adv)
    if w[i + 1 : i + 3] in ("ZO", "ZI", "ZA") or (sl and i > first and w[i - 1] != "T"):
        return ("S", "TS", adv)
    return ("S", adv)


def _h_same(letter, dbl_adv=2):
    def h(w, i, first, last, sl, _c=letter):
        return (_c, dbl_adv if w[i + 1] == _c else 1)

    return h


_HANDLERS = {
    "B": _h_b, "C": _h_c, "D": _h_d, "F": _h_same("F"), "G": _h_g,
    "H": _h_h, "J": _h_j, "K": _h_same("K"), "L": _h_l, "M": _h_m,
    "N": _h_same("N"), "P": _h_p, "Q": _h_same("Q"), "R": _h_r,
    "S": _h_s, "T": _h_t, "V": _h_same("V"), "W": _h_w, "X": _h_x,
    "Z": _h_z, "Ç": lambda w, i, f, l, s: ("S", 1),
    "Ñ": lambda w, i, f, l, s: ("N", 1),
}
# K and Q emit K; V emits F — adjust the shared-handler outputs:


def _h_k(w, i, first, last, sl):
    return ("K", 2 if w[i + 1] == "K" else 1)


def _h_q(w, i, first, last, sl):
    return ("K", 2 if w[i + 1] == "Q" else 1)


def _h_v(w, i, first, last, sl):
    return ("F", 2 if w[i + 1] == "V" else 1)


_HANDLERS["K"] = _h_k
_HANDLERS["Q"] = _h_q
_HANDLERS["V"] = _h_v


def double_metaphone(text: str) -> tuple:
    text = text.upper()
    sl = bool(_SLAVO.search(text))
    n = len(text)
    w = "--" + text + "     "
    first = 2
    last = first + n - 1
    i = first
    if _SILENT_START.match(w, first):
        i += 1

    prim: list = []
    sec: list = []
    act = (None, 1)
    while i < n + 2:
        ch = w[i]
        if ch in V:
            act = _h_vowel(w, i, first, last, sl)
        else:
            h = _HANDLERS.get(ch)
            new = h(w, i, first, last, sl) if h else (None, 1)
            if new is not None:
                act = new
            # else: the G/GH fallthrough quirk — reuse the previous action
        if len(act) == 2:
            if act[0]:
                prim.append(act[0])
                sec.append(act[0])
            i += act[1]
        else:
            if act[0]:
                prim.append(act[0])
            if act[1]:
                sec.append(act[1])
            i += act[2]

    p = "".join(prim)
    s = "".join(sec)
    return (p, None) if p == s else (p, s)
