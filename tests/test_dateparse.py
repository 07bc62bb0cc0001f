"""English NL datetime grammar (query/dateparse.py) parity vs the
reference DateParserPlugin's English parser, across basedates and the
full long-tail surface: times of day, date/time bags, d-m-y orders,
plus-minus chains, to-ranges with cross-side inference, error cases."""

from __future__ import annotations

import datetime as dt

import pytest

BASES = [
    dt.datetime(2026, 8, 17, 14, 25, 36, 123456),
    dt.datetime(2026, 1, 1, 0, 0, 0),
    dt.datetime(2024, 2, 29, 23, 59, 59, 999999),
    dt.datetime(2026, 12, 31, 12, 0, 0),
]

CASES = [
    # named / relative days
    "today", "tomorrow", "yesterday", "now", "this year", "this month",
    "next friday", "last tuesday", "next mo", "last su", "next thur", "next we",
    # times of day
    "3pm", "12am", "12pm", "3:30pm", "3:30:05pm", "3:30:05.12345 pm",
    "15:30", "15:30:05", "15:30:05.12345", "noon", "midnight", "00:00", "23:59",
    # date/time bags, both orders
    "tomorrow 3pm", "3pm tomorrow", "noon next friday", "next friday noon",
    "yesterday 15:30", "today noon", "noon today", "3pm,tomorrow", "tomorrow, 3pm",
    "25 dec 3pm", "3pm 25 dec 2027", "midnight 25 dec",
    # d-m-y orders + ordinals + month aliases
    "25 dec", "dec 25", "dec 2027", "dec", "2027", "25 dec 2027", "dec 25 2027",
    "2027 dec 25", "2027 25 dec", "25th dec", "1st jan 2027", "22nd feb",
    "3rd may", "march", "febuary", "sept 2025", "may",
    # plus-minus chains
    "+1y", "-3 weeks", "+2mo", "-1yr 2mo", "+1yr 2mo 3d", "-2h 30m",
    "+90 mins", "-1 week 2 days 3 hours", "+1y 1mo 1w 1d 1h 1m 1s", "-12mo", "+0d",
    # to-ranges (cross-side year/month-day inference, order repairs)
    "25 dec to 25 jan", "3pm to 5pm", "3 am to 5 am tomorrow", "dec to feb",
    "2025 to 2027", "today to +2d", "last monday to next friday", "5pm to 3pm",
    "25 dec 2025 to 25 dec 2024", "jan 1 to feb", "feb to jan 1",
    "noon to midnight", "midnight to noon", "now to +1d", "-1d to now",
    "feb 2027 to mar", "mar to feb 2027", "today to today",
    # error / reject cases
    "may 3 pm", "garbage", "12 2026", "2026 12", "now 3pm", "3pm now",
    "32 dec", "39 dec", "0 dec", "31 feb", "31 feb 2026", "29 feb 2024",
    "tuesday", "next", "last", "3 pm",
]


@pytest.fixture(scope="module")
def ref_english(whoosh):
    from whoosh.qparser.dateparse import English

    return English()


def _ref_bounds(eng, text, base):
    from whoosh.util.times import timespan

    try:
        w = eng.date_from(text, basedate=base)
    except Exception:
        return None
    if w is None:
        return None
    if isinstance(w, timespan):
        return (w.start.replace(tzinfo=None), w.end.replace(tzinfo=None))
    return (w.replace(tzinfo=None), w.replace(tzinfo=None))


def test_english_grammar_parity(ref_english):
    from whoosh_reloaded_ray.query.dateparse import english_date_bounds

    diffs = []
    for base in BASES:
        for c in CASES:
            ref = _ref_bounds(ref_english, c, base)
            mine = english_date_bounds(c, base)
            if ref != mine:
                diffs.append((base, c, ref, mine))
    assert not diffs, diffs[:5]


def test_parser_integration():
    """NL datestrings flow through the query parser into inclusive
    NumericRange bounds (_word_query / _make_range paths)."""
    import numpy as np

    from whoosh_reloaded_ray.query import ast
    from whoosh_reloaded_ray.query.parser import QueryParser
    from whoosh_reloaded_ray.schema import transcript_schema

    base = dt.datetime(2026, 1, 1, 0, 0, 30)
    p = QueryParser("text", transcript_schema(), dateparse_basedate=base)
    q = p.parse("ts:'yesterday to +3 mins'")
    assert isinstance(q, ast.NumericRange)
    assert q.start == np.datetime64("2025-12-31T00:00:00.000000", "us")
    assert q.end == np.datetime64("2026-01-01T00:03:30.000000", "us")
    # time-only start + datetime end errors in the reference
    # (timespan.disambiguated calls end.ceil() on a plain datetime ->
    # AttributeError -> error/NullQuery), so it must be a no-match here too
    def _is_nomatch(q):
        return isinstance(q, ast._NullQuery) or (
            isinstance(q, ast.Or) and not q.subqueries
        )

    qerr = p.parse("ts:'midnight to +3 mins'")
    assert _is_nomatch(qerr)
    q2 = p.parse("ts:'tomorrow 3pm'")
    assert q2.start == np.datetime64("2026-01-02T15:00:00.000000", "us")
    assert q2.end == np.datetime64("2026-01-02T15:59:59.999999", "us")
    # unparseable -> no-match query (reference NullQuery)
    q3 = p.parse("ts:'may 3 pm'")
    assert _is_nomatch(q3)
