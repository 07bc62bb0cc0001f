"""Custom posting Format plug point (reference formats.py:51-135).

Verifies a user-registered payload codec round-trips through the full
build + query path: encode in the tokenizer stage, shuffle, block write,
payload read-back and decode — including re-implementing PositionBoosts
through the PUBLIC hook and checking parity against the native
``boosts=True`` path (payloads AND scores).
"""

from __future__ import annotations

import pytest

from whoosh_reloaded_ray import compat as wrr
from whoosh_reloaded_ray import formats
from whoosh_reloaded_ray.query import Term

DOCS = [
    "image render^2 file^0.5",
    "render^3 render video",
    "plain words only",
]


def _make_firstlast():
    """A NOVEL format: payload = (first, last) occurrence positions as two
    varints; weight = plain term frequency.  Defined inside a function so
    cloudpickle ships the class BY VALUE to the Ray workers (a test module
    is not importable there; library-module formats pickle by reference)."""

    class FirstLastFormat(formats.Format):
        def encode(self, occurrences):
            out = bytearray()
            formats._write_varint(out, occurrences[0].pos)
            formats._write_varint(out, occurrences[-1].pos)
            return bytes(out)

        def decode(self, payload):
            if not payload:
                return None
            first, i = formats._read_varint(payload, 0)
            last, _ = formats._read_varint(payload, i)
            return (first, last)

        def weight(self, occurrences):
            return float(len(occurrences))

    return FirstLastFormat()


formats.register_format("pb_demo", formats.PositionBoostsFormat())
formats.register_format("firstlast", _make_firstlast())


def _mk(tmp_path_factory, fmt=None, boosts=False):
    d = str(tmp_path_factory.mktemp("fmtidx"))
    ana = wrr.RegexTokenizer(r"\S+") | wrr.DelimitedAttributeFilter()
    schema = wrr.Schema(
        text=wrr.TEXT(stored=True, analyzer=ana, boosts=boosts, format=fmt)
    )
    ix = wrr.create_in(d, schema)
    w = ix.writer(num_shards=2, partition_rows=64)
    for t in DOCS:
        w.add_document(text=t)
    w.commit()
    return ix


def test_position_boosts_via_public_hook(ray_session, tmp_path_factory):
    """PositionBoosts re-implemented through the plug point matches the
    native FieldSpec(boosts=True) path: payload decode AND scores."""
    ix = _mk(tmp_path_factory, fmt="pb_demo")
    native = _mk(tmp_path_factory, boosts=True)
    fmt = formats.get_format("pb_demo")
    with ix.searcher() as s, native.searcher() as ns:
        assert fmt.decode(s.payload(0, "text", "render")) == [(1, 2.0)]
        assert fmt.decode(s.payload(0, "text", "file")) == [(2, 0.5)]
        assert fmt.decode(s.payload(0, "text", "image")) == [(0, 1.0)]
        assert fmt.decode(s.payload(1, "text", "render")) == [(0, 3.0), (1, 1.0)]
        assert s.payload(2, "text", "render") is None
        # payload parity with the native path's decoded boosts
        for d in (0, 1):
            assert fmt.decode(s.payload(d, "text", "render")) == ns.position_boosts(
                d, "text", "render"
            )
        # weight parity: custom weight() == native summed-boost weights,
        # so BM25 scores agree exactly
        mine = [(h.docnum, h.score) for h in s.search(Term("text", "render"))]
        ref = [(h.docnum, h.score) for h in ns.search(Term("text", "render"))]
        assert mine == ref


def test_novel_format_roundtrip(ray_session, tmp_path_factory):
    """A brand-new user format round-trips and drives the posting weight."""
    ix = _mk(tmp_path_factory, fmt="firstlast")
    fmt = formats.get_format("firstlast")
    with ix.searcher() as s:
        # doc1: render at positions 0 and 2... DOCS[1] = "render^3 render video"
        assert fmt.decode(s.payload(1, "text", "render")) == (0, 1)
        assert fmt.decode(s.payload(0, "text", "image")) == (0, 0)
        assert s.payload(2, "text", "render") is None
        # weight = tf (2 for doc1's render), NOT the summed boost (4.0)
        r = s.search(Term("text", "video"))
        assert len(r) == 1


def test_unregistered_format_raises():
    with pytest.raises(KeyError, match="not registered"):
        formats.get_format("nope_does_not_exist")
