"""Full English natural-language datestring grammar.

Clean-room re-expression of the reference DateParserPlugin's English
grammar (reference ``qparser/dateparse.py:603-780``) over a sparse-date
model mirroring ``adatetime`` / ``timespan`` disambiguation (reference
``util/times.py:93-424``).  Where the reference composes backtracking
parser-combinator objects (Sequence/Choice/Bag/Combo), this module
classifies tokens and checks them against the same accepted orderings —
same language, different machinery.

Covered forms (all relative to a caller-supplied basedate):

* plus/minus chains     ``+1yr 2mo 3d``, ``-3 weeks`` (one sign, fixed
  unit order years>months>weeks>days>hours>minutes>seconds, full alias
  sets; relativedelta-style month arithmetic with day clamping)
* times of day          ``3pm``, ``3:30:05pm``, ``15:30``, ``noon``,
  ``midnight`` — alone (span/point on the basedate's day) or bagged
  with any date form in either order (``tomorrow 3pm``, ``3pm 25 dec``)
* date part orders      dmy / mdy / ymd / ydm / dm / md / my / bare
  month / bare year, with ordinal day suffixes (``25th dec``)
* named days            ``today``, ``tomorrow``, ``yesterday``,
  ``next|last <weekday>``, ``this month``, ``this year``, ``now``
* ranges                ``<bundle> to <bundle>`` with the reference's
  cross-side year / month+day inference and out-of-order repairs

Ambiguous results disambiguate exactly like ``adatetime.disambiguated``:
fully-specified -> a point; otherwise floor/ceil over the unspecified
tail, with date parts above the most-specific field taken from the
basedate (time-only -> the basedate's day; year missing -> the
basedate's year).
"""

from __future__ import annotations

import calendar
import datetime as dt
import re
from dataclasses import dataclass, replace

# ---------------------------------------------------------------------------
# sparse date model (adatetime analog)
# ---------------------------------------------------------------------------

_FIELDS = ("year", "month", "day", "hour", "minute", "second", "usec")


@dataclass(frozen=True)
class SparseDate:
    year: int | None = None
    month: int | None = None
    day: int | None = None
    hour: int | None = None
    minute: int | None = None
    second: int | None = None
    usec: int | None = None

    def is_full(self) -> bool:
        return all(getattr(self, f) is not None for f in _FIELDS)

    def has_date(self) -> bool:
        return not (self.year is None and self.month is None and self.day is None)

    def floor(self) -> dt.datetime:
        y = self.year
        if y is None:
            raise ValueError("no year")
        return dt.datetime(
            y,
            self.month or 1,
            self.day or 1,
            self.hour or 0,
            self.minute or 0,
            self.second or 0,
            self.usec or 0,
        )

    def ceil(self) -> dt.datetime:
        y = self.year
        if y is None:
            raise ValueError("no year")
        mo = self.month if self.month is not None else 12
        d = self.day if self.day is not None else calendar.monthrange(y, mo)[1]
        return dt.datetime(
            y,
            mo,
            d,
            self.hour if self.hour is not None else 23,
            self.minute if self.minute is not None else 59,
            self.second if self.second is not None else 59,
            self.usec if self.usec is not None else 999999,
        )


def _full(d: dt.datetime) -> SparseDate:
    return SparseDate(d.year, d.month, d.day, d.hour, d.minute, d.second, d.microsecond)


# ---------------------------------------------------------------------------
# vocab (alias sets match the reference English grammar verbatim — they
# are the LANGUAGE being recognized, not code)
# ---------------------------------------------------------------------------

_MONTHS = {}
for _i, _aliases in enumerate(
    (
        "january jan",
        "february febuary feb",
        "march mar",
        "april apr",
        "may",
        "june jun",
        "july jul",
        "august aug",
        "september sept sep",
        "october oct",
        "november nov",
        "december dec",
    ),
    1,
):
    for _a in _aliases.split():
        _MONTHS[_a] = _i

_WEEKDAYS = {}
for _i, _aliases in enumerate(
    (
        "monday mon mo",
        "tuesday tues tue tu",
        "wednesday wed we",
        "thursday thur thu th",
        "friday fri fr",
        "saturday sat sa",
        "sunday sun su",
    )
):
    for _a in _aliases.split():
        _WEEKDAYS[_a] = _i

_PM_UNITS = (
    ("years", "years|year|yrs|yr|ys|y"),
    ("months", "months|month|mons|mon|mos|mo"),
    ("weeks", "weeks|week|wks|wk|ws|w"),
    ("days", "days|day|dys|dy|ds|d"),
    ("hours", "hours|hour|hrs|hr|hs|h"),
    ("minutes", "minutes|minute|mins|min|ms|m"),
    ("seconds", "seconds|second|secs|sec|s"),
)
_PLUSMINUS_RE = re.compile(
    "(?P<dir>[+-]) *"
    + " *".join(f"((?P<{n}>[0-9]+) *({pat}))?" for n, pat in _PM_UNITS)
    + r"\s*$",
    re.IGNORECASE,
)

_TIME12_RE = re.compile(
    r"(?P<hour>1[0-2]|[1-9])(:(?P<mins>[0-5][0-9])"
    r"(:(?P<secs>[0-5][0-9])(\.(?P<usecs>[0-9]{1,5}))?)?)?"
    r"\s*(?P<ampm>am|pm)(?=(\W|$))",
    re.IGNORECASE,
)
_TIME24_RE = re.compile(
    r"(?P<hour>([01][0-9])|(2[0-3])):(?P<mins>[0-5][0-9])"
    r"(:(?P<secs>[0-5][0-9])(\.(?P<usecs>[0-9]{1,5}))?)?"
    r"(?=(\W|$))"
)

_DAY_RE = re.compile(r"^(?P<day>[123][0-9]|[1-9])(st|nd|rd|th)?$")
_YEAR_RE = re.compile(r"^[0-9]{4}$")

# accepted date-part token orders (the reference's dmy Choice: a day
# requires a month; year-before-month only with a day between or before)
_DATE_ORDERS = {
    ("d", "m", "y"),
    ("m", "d", "y"),
    ("y", "m", "d"),
    ("y", "d", "m"),
    ("d", "m"),
    ("m", "d"),
    ("m", "y"),
    ("m",),
    ("y",),
}


# ---------------------------------------------------------------------------
# component parsers
# ---------------------------------------------------------------------------


def _plusminus(text: str, base: dt.datetime):
    """``[+-] N unit ...`` chain -> exact datetime, or None."""
    m = _PLUSMINUS_RE.match(text)
    if not m or not any(m.group(n) for n, _ in _PM_UNITS):
        return None
    sign = -1 if m.group("dir") == "-" else 1

    def val(name):
        g = m.group(name)
        return sign * int(g) if g else 0

    months = val("years") * 12 + val("months")
    y = base.year + (base.month - 1 + months) // 12
    mo = (base.month - 1 + months) % 12 + 1
    day = min(base.day, calendar.monthrange(y, mo)[1])
    out = base.replace(year=y, month=mo, day=day)
    return out + dt.timedelta(
        weeks=val("weeks"),
        days=val("days"),
        hours=val("hours"),
        minutes=val("minutes"),
        seconds=val("seconds"),
    )


def _time_prefix(text: str):
    """Match a time-of-day at the START of ``text``: (SparseDate with
    only time fields, remainder) or None."""
    m = _TIME12_RE.match(text)
    if m:
        hr = int(m.group("hour"))
        if m.group("ampm").lower().startswith("a"):
            hr = 0 if hr == 12 else hr
        else:
            hr = 12 if hr == 12 else hr + 12
        g = lambda n: int(m.group(n)) if m.group(n) else None
        return (
            SparseDate(hour=hr, minute=g("mins"), second=g("secs"), usec=g("usecs")),
            text[m.end() :],
        )
    m = _TIME24_RE.match(text)
    if m:
        g = lambda n: int(m.group(n)) if m.group(n) else None
        return (
            SparseDate(
                hour=int(m.group("hour")),
                minute=g("mins"),
                second=g("secs"),
                usec=g("usecs"),
            ),
            text[m.end() :],
        )
    for word, sd in (
        ("midnight", SparseDate(hour=0, minute=0, second=0, usec=0)),
        ("noon", SparseDate(hour=12, minute=0, second=0, usec=0)),
    ):
        if text.startswith(word) and (len(text) == len(word) or not text[len(word)].isalnum()):
            return sd, text[len(word) :]
    return None


def _next_last_weekday(direction: str, dayname: str, base: dt.datetime):
    target = _WEEKDAYS.get(dayname)
    if target is None:
        return None
    cur = base.weekday()
    if cur == target:
        delta = 7 if direction == "next" else -7
    elif direction == "next":
        delta = (target + 7 - cur) % 7
    else:
        delta = -((cur + 7 - target) % 7)
    d = base.date() + dt.timedelta(days=delta)
    return SparseDate(year=d.year, month=d.month, day=d.day)


def _date_tokens(tokens: tuple, base: dt.datetime):
    """Parse a complete date-part token sequence -> SparseDate or None.
    ``now`` is handled by the caller (it yields a full datetime, which
    the reference does not bag with a time)."""
    if not tokens:
        return None
    if len(tokens) == 2 and tokens[0] in ("next", "last"):
        return _next_last_weekday(tokens[0], tokens[1], base)
    if tokens == ("this", "year"):
        return SparseDate(year=base.year)
    if tokens == ("this", "month"):
        return SparseDate(year=base.year, month=base.month)
    if len(tokens) == 1:
        word = tokens[0]
        if word in ("today", "tomorrow", "yesterday"):
            off = {"today": 0, "tomorrow": 1, "yesterday": -1}[word]
            d = base.date() + dt.timedelta(days=off)
            return SparseDate(year=d.year, month=d.month, day=d.day)
    # d/m/y combination in an accepted order
    kinds, vals = [], {}
    for tok in tokens:
        if tok in _MONTHS and "m" not in vals:
            kinds.append("m")
            vals["m"] = _MONTHS[tok]
        elif _YEAR_RE.match(tok) and "y" not in vals:
            kinds.append("y")
            vals["y"] = int(tok)
        else:
            dm = _DAY_RE.match(tok)
            if dm and "d" not in vals:
                kinds.append("d")
                vals["d"] = int(dm.group("day"))
            else:
                return None
    if tuple(kinds) not in _DATE_ORDERS:
        return None
    return SparseDate(year=vals.get("y"), month=vals.get("m"), day=vals.get("d"))


_SEP_RE = re.compile(r"(\s+|\s*,\s*)")
_TOKEN_RE = re.compile(r"[^\s,]+")


def _split_tokens(text: str):
    """Split on the reference's element separator ``(\\s+|\\s*,\\s*)``
    honoring its no-backtracking semantics: a gap starting with
    whitespace is consumed as pure whitespace (so " , " kills the parse),
    otherwise it must be a single comma plus optional trailing spaces.
    Returns None when any gap (or leading/trailing junk) is invalid."""
    toks = []
    pos = 0
    for m in _TOKEN_RE.finditer(text):
        gap = text[pos : m.start()]
        if not toks:
            if gap:
                return None
        elif not (gap.strip() == "" or (gap[0] == "," and gap[1:].strip() == "")):
            return None
        toks.append(m.group())
        pos = m.end()
    if text[pos:]:
        return None
    return toks


def _bag(text: str, base: dt.datetime):
    """Time + date in either order (the reference Bag), either part
    optional.  Returns SparseDate or a full datetime (``now``) or None."""
    text = text.strip()
    tokens = _split_tokens(text.lower())
    if not tokens:
        return None
    now_toks = tokens
    if now_toks and now_toks[0] == "now":
        # ``now`` matches the reference's time element and yields the full
        # basedate datetime; fill_in() returns a fully-specified
        # accumulator unchanged, so any following regex-valid date parses
        # but is ignored — even semantically impossible ones like "32 dec"
        # (ref dateparse.py:712-714, util/times.py:436-443).
        if len(now_toks) == 1 or _date_tokens(tuple(now_toks[1:]), base) is not None:
            return base
        return None
    # time first (the reference Bag tries its elements in listed order)
    tp = _time_prefix(text)
    if tp is not None:
        tval, rest = tp
        rest = rest.strip().lstrip(",").strip()
        if not rest:
            return tval
        dval = _date_tokens(tuple(t for t in _SEP_RE.split(rest.lower()) if t.strip(", ")), base)
        if dval is None:
            return None
        return replace(dval, hour=tval.hour, minute=tval.minute, second=tval.second, usec=tval.usec)
    # greedy date prefix, then an optional trailing time.  The LONGEST
    # matching date prefix is committed to without backtracking — the
    # reference's Choice tries its longer d/m/y sequences first and a
    # committed match never retries shorter ("may 3 pm" is a parse
    # error, not May + 3pm).
    for cut in range(len(tokens), 0, -1):
        dval = _date_tokens(tuple(tokens[:cut]), base)
        if dval is None:
            continue
        rest = " ".join(tokens[cut:])
        if not rest:
            return dval
        if tokens[cut:] == ["now"]:
            # date + now: fill_in() fills EVERY unspecified unit (date
            # units included) from the basedate, yielding a full
            # datetime; impossible combos ("feb 31 now") raise inside
            # the reference's fix() and surface as no-parse.
            try:
                return dt.datetime(
                    dval.year if dval.year is not None else base.year,
                    dval.month if dval.month is not None else base.month,
                    dval.day if dval.day is not None else base.day,
                    base.hour,
                    base.minute,
                    base.second,
                    base.microsecond,
                )
            except ValueError:
                return None
        tp = _time_prefix(rest)
        if tp is None or tp[1].strip(", "):
            return None
        tval = tp[0]
        return replace(
            dval, hour=tval.hour, minute=tval.minute, second=tval.second, usec=tval.usec
        )
    return None


def _bundle(text: str, base: dt.datetime):
    """plusdate | bag  ->  SparseDate | datetime | None (the reference
    bundle Choice minus ``simple``, which ``_datetime_bounds`` covers
    upstream)."""
    pm = _plusminus(text, base)
    if pm is not None:
        return pm
    return _bag(text, base)


# ---------------------------------------------------------------------------
# disambiguation (adatetime.disambiguated / timespan.disambiguated)
# ---------------------------------------------------------------------------


def _point_bounds(res, base: dt.datetime):
    if isinstance(res, dt.datetime):
        return res, res
    ad = res
    if ad.is_full():
        v = ad.floor()
        return v, v
    if not ad.has_date():
        ad = replace(ad, year=base.year, month=base.month, day=base.day)
    elif ad.year is None:
        ad = replace(ad, year=base.year)
    return ad.floor(), ad.ceil()


def _span_bounds(s, e, base: dt.datetime):
    """Cross-side inference for ``a to b`` (reference
    timespan.disambiguated, util/times.py:329-421)."""
    e_is_dt = isinstance(e, dt.datetime)
    if isinstance(s, dt.datetime):
        s = _full(s)
    if e_is_dt:
        e = _full(e)
    s_year_amb, e_year_amb = s.year is None, e.year is None
    if not s.has_date() and not e.has_date():
        s = replace(s, year=base.year, month=base.month, day=base.day)
        e = replace(e, year=base.year, month=base.month, day=base.day)
    else:
        if s.year is None and e.year is None:
            s, e = replace(s, year=base.year), replace(e, year=base.year)
        elif s.year is None:
            s = replace(s, year=e.year)
        elif e.year is None:
            e = replace(e, year=max(s.year, base.year))
    if s.year == e.year:
        s_dm = not (s.month is None and s.day is None)
        e_dm = not (e.month is None and e.day is None)
        if e_dm and not s_dm:
            if e_is_dt:
                # "3pm to now": the reference calls end.ceil() as a METHOD
                # here and plain datetimes have none -> AttributeError ->
                # no match (util/times.py timespan.disambiguated).
                return None
            if s.floor().time() > e.ceil().time():
                s = replace(s, month=base.month, day=base.day)
            else:
                s = replace(s, month=e.month, day=e.day)
        elif s_dm and not e_dm:
            e = replace(e, month=base.month, day=base.day)
    if s.floor().date() > e.ceil().date():
        if s_year_amb:
            s = replace(s, year=e.year - 1)
        elif e_year_amb:
            e = replace(e, year=s.year + 1)
        else:
            s, e = e, s
    lo, hi = s.floor(), e.ceil()
    if lo.date() == hi.date() and lo.time() > hi.time():
        hi += dt.timedelta(days=1)
    return lo, hi


# ---------------------------------------------------------------------------
# entry point
# ---------------------------------------------------------------------------

# The reference torange Combo separates its elements with
# ``(\s+|\s*,\s*)`` tried WITHOUT backtracking: a whitespace run is
# consumed atomically, so " , to" fails while ", to" / ",to" / " to"
# parse.  The atomic groups + boundary lookarounds replicate that: the
# sep must consume the entire run between the two bundles.
_TO_RE = re.compile(r"(?<![\s,])(?>\s+|,\s*)to(?>\s+|,\s*)(?![\s,])")


def english_date_bounds(text: str, base: dt.datetime):
    """(floor, ceil) ``datetime`` bounds for an English NL datestring, or
    None if unparseable (callers map None to a no-match query, mirroring
    the reference's error -> NullQuery path)."""
    t = text.strip().lower()
    if not t:
        return None
    parts = _TO_RE.split(t)
    try:
        if len(parts) == 2:
            s, e = _bundle(parts[0], base), _bundle(parts[1], base)
            if s is None or e is None:
                return None
            return _span_bounds(s, e, base)
        res = _bundle(t, base)
        if res is None:
            return None
        return _point_bounds(res, base)
    except ValueError:
        # impossible concrete date (e.g. "39 dec") -> no match
        return None
