"""Property-based (hypothesis) parity fuzzing vs the reference whoosh:
analyzers over arbitrary unicode, the Porter stemmer over random words,
the NL date grammar over generated component combinations, and varint /
delta codec roundtrips.  These complement the fixed-seed sweeps in
test_analysis.py / test_dateparse.py with adversarial input search."""

from __future__ import annotations

import datetime as dt

import pytest
from hypothesis import given, settings, strategies as st

FAST = dict(max_examples=120, deadline=None)


# ---------------------------------------------------------------------------
# analyzers over arbitrary unicode
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def ref_analyzers(whoosh):
    from whoosh.analysis import SimpleAnalyzer, StandardAnalyzer, StemmingAnalyzer

    return StandardAnalyzer(), SimpleAnalyzer(), StemmingAnalyzer()


def _ref_tokens(analyzer, text):
    return [(t.text, t.pos) for t in analyzer(text, positions=True)]


@settings(**FAST)
@given(st.text(max_size=200))
def test_standard_analyzer_fuzz(ref_analyzers, text):
    from whoosh_reloaded_ray.functions.analysis import make_analyzer, standard_analyzer

    ours = make_analyzer(standard_analyzer())
    assert ours(text) == _ref_tokens(ref_analyzers[0], text), repr(text)


@settings(**FAST)
@given(st.text(max_size=200))
def test_simple_analyzer_fuzz(ref_analyzers, text):
    from whoosh_reloaded_ray.functions.analysis import make_analyzer, simple_analyzer

    ours = make_analyzer(simple_analyzer())
    assert ours(text) == _ref_tokens(ref_analyzers[1], text), repr(text)


@settings(**FAST)
@given(st.text(max_size=200))
def test_stemming_analyzer_fuzz(ref_analyzers, text):
    from whoosh_reloaded_ray.functions.analysis import make_analyzer, stemming_analyzer

    ours = make_analyzer(stemming_analyzer())
    assert ours(text) == _ref_tokens(ref_analyzers[2], text), repr(text)


# ---------------------------------------------------------------------------
# Porter stemmer over random ascii words
# ---------------------------------------------------------------------------


@settings(**FAST)
@given(st.from_regex(r"[a-z]{1,24}", fullmatch=True))
def test_porter_stem_fuzz(whoosh, word):
    from whoosh.lang.porter import stem as ref_stem

    from whoosh_reloaded_ray.functions.analysis import porter_stem

    assert porter_stem(word) == ref_stem(word), word


# ---------------------------------------------------------------------------
# NL date grammar over generated component combos
# ---------------------------------------------------------------------------

_DATE_PARTS = st.sampled_from(
    [
        "today", "tomorrow", "yesterday", "now", "this year", "this month",
        "next friday", "last tue", "3pm", "12am", "11:45", "noon", "midnight",
        "25 dec", "dec 25", "dec 2027", "2027", "mar", "1st jan 2027",
        "+2mo", "-3 weeks", "+1yr 2mo 3d", "tomorrow 3pm", "noon 25 dec",
        "feb 31", "32 dec", "garbage", "14:99", "next", "to",
    ]
)


@pytest.fixture(scope="module")
def ref_english(whoosh):
    from whoosh.qparser.dateparse import English

    return English()


@settings(**FAST)
@given(
    parts=st.lists(_DATE_PARTS, min_size=1, max_size=3),
    base=st.datetimes(
        min_value=dt.datetime(1990, 1, 5), max_value=dt.datetime(2100, 12, 25)
    ),
    joiner=st.sampled_from([" ", " to ", ", "]),
)
def test_dateparse_fuzz(ref_english, parts, base, joiner):
    from whoosh.util.times import timespan

    from whoosh_reloaded_ray.query.dateparse import english_date_bounds

    text = joiner.join(parts)
    try:
        w = ref_english.date_from(text, basedate=base)
    except Exception:
        w = None
    if w is None:
        ref = None
    elif isinstance(w, timespan):
        ref = (w.start.replace(tzinfo=None), w.end.replace(tzinfo=None))
    else:
        ref = (w.replace(tzinfo=None), w.replace(tzinfo=None))
    assert english_date_bounds(text, base) == ref, (text, base)


# ---------------------------------------------------------------------------
# varint / delta codec roundtrips
# ---------------------------------------------------------------------------


@settings(**FAST)
@given(st.lists(st.integers(min_value=0, max_value=2**62), max_size=200))
def test_varint_roundtrip_fuzz(values):
    import numpy as np

    from whoosh_reloaded_ray.functions.varint import decode_varints, encode_varints

    arr = np.array(values, dtype=np.uint64)
    assert decode_varints(encode_varints(arr)).tolist() == values


@settings(**FAST)
@given(st.lists(st.integers(min_value=0, max_value=255), max_size=64))
def test_quant_monotone_fuzz(bytes_):
    """Quantized-length roundtrip stability: byte -> length -> byte."""
    import numpy as np

    from whoosh_reloaded_ray.functions.quant import bytes_to_lengths, lengths_to_bytes

    arr = np.array(bytes_, dtype=np.uint8)
    lens = bytes_to_lengths(arr)
    assert (lengths_to_bytes(lens) == arr).all()
