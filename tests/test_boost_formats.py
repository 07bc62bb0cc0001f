"""PositionBoosts/CharacterBoosts posting formats (reference
formats.py:345-470): per-position boost payloads from a
DelimitedAttributeFilter chain, weight = summed token boost, payload
round-trip — parity-checked against the reference's formats."""

from __future__ import annotations

import pytest

from whoosh_reloaded_ray import compat as wrr
from whoosh_reloaded_ray.query import Term

DOCS = [
    "image render^2 file^0.5",
    "render^3 render video",
    "plain words only",
]


def _mk(tmp_path_factory, chars: bool):
    d = str(tmp_path_factory.mktemp("boostidx"))
    ana = wrr.RegexTokenizer(r"\S+") | wrr.DelimitedAttributeFilter()
    schema = wrr.Schema(text=wrr.TEXT(stored=True, analyzer=ana, chars=chars, boosts=True))
    ix = wrr.create_in(d, schema)
    w = ix.writer(num_shards=2, partition_rows=64)
    for t in DOCS:
        w.add_document(text=t)
    w.commit()
    return ix


@pytest.mark.parametrize("chars", [False, True], ids=["PositionBoosts", "CharacterBoosts"])
def test_position_boost_roundtrip(ray_session, tmp_path_factory, chars):
    ix = _mk(tmp_path_factory, chars)
    with ix.searcher() as s:
        # doc 0: render^2 at position 1
        assert s.position_boosts(0, "text", "render") == [(1, 2.0)]
        assert s.position_boosts(0, "text", "file") == [(2, 0.5)]
        # unboosted token defaults to 1.0
        assert s.position_boosts(0, "text", "image") == [(0, 1.0)]
        # doc 1: render at positions 0 (boost 3) and 1 (boost 1)
        assert s.position_boosts(1, "text", "render") == [(0, 3.0), (1, 1.0)]
        # doc without the term
        assert s.position_boosts(2, "text", "render") == []


@pytest.mark.parametrize("chars", [False, True], ids=["PositionBoosts", "CharacterBoosts"])
def test_weight_is_summed_boost_vs_reference(ray_session, tmp_path_factory, whoosh, chars):
    """Reference PositionBoosts.word_values: weight = sum of token boosts
    (formats.py:352-366).  Compare our stored weights against a real
    whoosh index using the PositionBoosts/CharacterBoosts format."""
    import tempfile

    from whoosh import fields as wf
    from whoosh import formats as wfmt
    from whoosh import index as windex
    from whoosh.analysis import DelimitedAttributeFilter, RegexTokenizer

    ana = RegexTokenizer(r"\S+") | DelimitedAttributeFilter()
    ftype = wf.FieldType(
        format=(wfmt.CharacterBoosts if chars else wfmt.PositionBoosts)(analyzer=ana),
        analyzer=ana,
        scorable=True,
        stored=True,
    )
    with tempfile.TemporaryDirectory() as d:
        ix = windex.create_in(d, wf.Schema(text=ftype))
        w = ix.writer()
        for t in DOCS:
            w.add_document(text=t)
        w.commit()
        ref = {}
        with ix.searcher() as s:
            for term in ("image", "render", "file", "video"):
                m = s.postings("text", term)
                while m.is_active():
                    ref[(term, m.id())] = (
                        m.weight(),
                        [(int(p), float(b)) for p, b in m.value_as("position_boosts")],
                    )
                    m.next()

    ours_ix = _mk(tmp_path_factory, chars)
    with ours_ix.searcher() as s:
        for (term, docnum), (ref_w, ref_pb) in ref.items():
            r = s.search(Term("text", term), limit=None)
            ours_pb = s.position_boosts(docnum, "text", term)
            assert ours_pb == ref_pb, (term, docnum)
            # stored weight: read via the segment reader's posting list
            rd = s._s.local.readers[0]
            import numpy as np

            plist = rd.postings("text", term)
            i = int(np.searchsorted(plist.docs, np.uint64(docnum)))
            assert plist.docs[i] == docnum
            assert plist.weights[i] == pytest.approx(ref_w), (term, docnum)


def test_char_spans_trim_delimiter(ray_session, tmp_path_factory):
    """CharacterBoosts keeps char offsets; the span must exclude the
    delimiter + payload (reference filters.py:473-477)."""
    ix = _mk(tmp_path_factory, chars=True)
    with ix.searcher() as s:
        rd = s._s.local.readers[0]
        spans = rd.char_spans("text", "render", 0).tolist()
        text = DOCS[0]
        assert spans == [[text.index("render"), text.index("render") + len("render")]]
