"""Reference tests/test_spans.py ported WHOLESALE (all 16 scenarios).

The reference walks matchers doc-by-doc calling ``m.spans()``; here the
same per-document Span(start, end) position assertions run against
``IndexSearcher.matched_spans`` (one batch call returning
{docnum: [(start, end), ...]}), plus ``char_spans`` for the Characters
payload scenario.  Corpus, schemas and expected values are byte-for-byte
the reference's (ref tests/test_spans.py:9-377)."""

from __future__ import annotations

from itertools import permutations

import pytest

from whoosh_reloaded_ray import compat as wrr
from whoosh_reloaded_ray.query import (
    And,
    Or,
    Phrase,
    Sequence,
    SpanBefore,
    SpanCondition,
    SpanContains,
    SpanFirst,
    SpanNear,
    SpanNot,
    SpanOr,
    Term,
)

DOMAIN = ("alfa", "bravo", "bravo", "charlie", "delta", "echo")


@pytest.fixture(scope="module")
def perm_ix(ray_session, tmp_path_factory):
    """ref test_spans.py:12-30 get_index(): permutations(domain, 4) with a
    SimpleAnalyzer Characters field (duplicates kept)."""
    d = str(tmp_path_factory.mktemp("spanperm"))
    schema = wrr.Schema(
        text=wrr.TEXT(analyzer=wrr.SimpleAnalyzer(), chars=True, stored=True)
    )
    ix = wrr.create_in(d, schema)
    w = ix.writer(num_shards=2, partition_rows=128)
    rows = [" ".join(ls) for ls in permutations(DOMAIN, 4)]
    for text in rows:
        w.add_document(text=text)
    w.commit()
    return ix, rows


def _spans(ix, q):
    with ix.searcher() as s:
        return s._s.matched_spans(q)


def test_multimatcher(ray_session, tmp_path_factory):
    # ref test_spans.py:33-53: spans stay doc-local across segments
    d = str(tmp_path_factory.mktemp("spanmulti"))
    schema = wrr.Schema(content=wrr.TEXT(stored=True))
    ix = wrr.create_in(d, schema)
    domain = ("alfa", "bravo", "charlie", "delta")
    rows = []
    for _ in range(3):
        w = ix.writer(num_shards=2, partition_rows=16)
        for ls in permutations(domain):
            w.add_document(content=" ".join(ls))
            rows.append(list(ls))
        w.commit(merge=False)
    with ix.searcher() as s:
        assert len(s._s.manifest.segments) > 1
        spans = s._s.matched_spans(Term("content", "bravo"))
        assert set(spans) == {i for i, ls in enumerate(rows) if "bravo" in ls}
        for doc, sps in spans.items():
            for start, end in sps:
                assert rows[doc][start] == "bravo"


def test_excludematcher(ray_session, tmp_path_factory):
    # ref test_spans.py:56-82: deletions drop out of the span walk
    d = str(tmp_path_factory.mktemp("spanexcl"))
    schema = wrr.Schema(content=wrr.TEXT(stored=True))
    ix = wrr.create_in(d, schema)
    domain = ("alfa", "bravo", "charlie", "delta")
    rows = []
    for _ in range(3):
        w = ix.writer(num_shards=2, partition_rows=16)
        for ls in permutations(domain):
            w.add_document(content=" ".join(ls))
            rows.append(list(ls))
        w.commit(merge=False)
    w = ix.writer()
    w.delete_document(5)
    w.delete_document(10)
    w.delete_document(28)
    w.commit(merge=False)
    with ix.searcher() as s:
        spans = s._s.matched_spans(Term("content", "bravo"))
        assert not {5, 10, 28} & set(spans)
        assert set(spans) == {
            i for i, ls in enumerate(rows) if "bravo" in ls and i not in (5, 10, 28)
        }
        for doc, sps in spans.items():
            for start, end in sps:
                assert rows[doc][start] == "bravo"


def test_span_term(perm_ix):
    # ref test_spans.py:85-111
    ix, rows = perm_ix
    alllists = [r.split() for r in rows]
    for word in DOMAIN:
        spans = _spans(ix, Term("text", word))
        ids = set(spans)
        for doc, sps in spans.items():
            original = alllists[doc]
            assert word in original
            if word != "bravo":
                assert len(sps) == 1
            assert original.index(word) == sps[0][0]
            assert original.index(word) == sps[0][1]
        for i, ls in enumerate(alllists):
            assert (i in ids) == (word in ls)


def test_span_first(perm_ix):
    # ref test_spans.py:115-136
    ix, rows = perm_ix
    alllists = [r.split() for r in rows]
    for word in DOMAIN:
        spans = _spans(ix, SpanFirst(Term("text", word)))
        for doc, sps in spans.items():
            assert alllists[doc][0] == word
            assert len(sps) == 1
            assert sps[0] == (0, 0)
    spans = _spans(ix, SpanFirst(Term("text", "bravo"), limit=1))
    assert spans
    for doc, sps in spans.items():
        for start, end in sps:
            assert alllists[doc][start] == "bravo"


def test_span_near(perm_ix):
    # ref test_spans.py:139-184 (5 sub-scenarios)
    ix, rows = perm_ix
    alllists = [r.split() for r in rows]

    spans = _spans(ix, SpanNear(Term("text", "alfa"), Term("text", "bravo"), ordered=True))
    assert spans
    for doc, sps in spans.items():
        orig = alllists[doc]
        assert orig[sps[0][0]] == "alfa"
        assert orig[sps[0][1]] == "bravo"

    spans = _spans(ix, SpanNear(Term("text", "alfa"), Term("text", "bravo"), ordered=False))
    assert spans
    for doc, sps in spans.items():
        orig = alllists[doc]
        first, second = orig[sps[0][0]], orig[sps[0][1]]
        assert (first, second) in (("alfa", "bravo"), ("bravo", "alfa"))

    spans = _spans(ix, SpanNear(Term("text", "bravo"), Term("text", "bravo"), ordered=True))
    assert spans
    for doc in spans:
        assert " ".join(alllists[doc]).find("bravo bravo") > -1

    q = SpanNear(
        SpanNear(Term("text", "alfa"), Term("text", "charlie")), Term("text", "echo")
    )
    spans = _spans(ix, q)
    assert spans
    for doc in spans:
        assert " ".join(alllists[doc]).find("alfa charlie echo") > -1

    q = SpanNear(
        Or([Term("text", "alfa"), Term("text", "charlie")]),
        Term("text", "echo"),
        ordered=True,
    )
    spans = _spans(ix, q)
    assert spans
    for doc in spans:
        text = " ".join(alllists[doc])
        assert text.find("alfa echo") > -1 or text.find("charlie echo") > -1


def test_near_unordered(ray_session, tmp_path_factory):
    # ref test_spans.py:188-207
    d = str(tmp_path_factory.mktemp("spanunord"))
    schema = wrr.Schema(text=wrr.TEXT(stored=True))
    ix = wrr.create_in(d, schema)
    w = ix.writer()
    w.add_document(text="alfa bravo charlie delta echo")
    w.add_document(text="alfa bravo delta echo charlie")
    w.add_document(text="alfa charlie bravo delta echo")
    w.add_document(text="echo delta alfa foxtrot")
    w.commit()
    with ix.searcher() as s:
        q = SpanNear(Term("text", "bravo"), Term("text", "charlie"), ordered=False)
        r = sorted(hit["text"] for hit in s.search(q))
        assert r == [
            "alfa bravo charlie delta echo",
            "alfa charlie bravo delta echo",
        ]


def test_span_near_tree(ray_session, tmp_path_factory):
    # ref test_spans.py:210-228
    d = str(tmp_path_factory.mktemp("spantree"))
    schema = wrr.Schema(text=wrr.TEXT(analyzer=wrr.SimpleAnalyzer(), stored=True))
    ix = wrr.create_in(d, schema)
    w = ix.writer()
    w.add_document(
        text="The Lucene library is by Doug Cutting and Whoosh was made by Matt Chaput"
    )
    w.commit()
    nq1 = SpanNear(Term("text", "lucene"), Term("text", "doug"), slop=5)
    nq2 = SpanNear(nq1, Term("text", "whoosh"), slop=4)
    spans = _spans(ix, nq2)
    assert spans == {0: [(1, 8)]}


def test_spannear2(ray_session, tmp_path_factory):
    # ref test_spans.py:231-247 (SpanNear2 == our Sequence)
    d = str(tmp_path_factory.mktemp("spannear2"))
    schema = wrr.Schema(id=wrr.ID(stored=True), text=wrr.TEXT())
    ix = wrr.create_in(d, schema)
    w = ix.writer()
    w.add_document(id="a", text="alfa echo")
    w.add_document(id="b", text="alfa bravo echo")
    w.add_document(id="c", text="alfa bravo charlie echo")
    w.add_document(id="d", text="alfa bravo charlie delta echo")
    w.add_document(id="e", text="alfa bravo charlie fox delta echo")
    w.add_document(id="f", text="charlie delta echo fox golf hotel")
    w.commit()
    with ix.searcher() as s:
        q = Sequence([Term("text", "bravo"), Term("text", "echo")], slop=3)
        assert q.estimate_size(s.reader()) == 4
        ids = "".join(sorted(hit["id"] for hit in s.search(q)))
        assert ids == "bcd"


def test_span_not(perm_ix):
    # ref test_spans.py:250-265
    ix, rows = perm_ix
    alllists = [r.split() for r in rows]
    nq = SpanNear(Term("text", "alfa"), Term("text", "charlie"), slop=2)
    q = SpanNot(nq, Term("text", "bravo"))
    spans = _spans(ix, q)
    assert spans
    for doc in spans:
        orig = alllists[doc]
        i1 = orig.index("alfa")
        i2 = orig.index("charlie")
        assert 0 < i2 - i1 < 3
        if "bravo" in orig:
            assert orig.index("bravo") != i1 + 1


def test_span_or(perm_ix):
    # ref test_spans.py:268-278
    ix, rows = perm_ix
    alllists = [r.split() for r in rows]
    nq = SpanNear(Term("text", "alfa"), Term("text", "charlie"), slop=2)
    q = SpanOr([nq, Term("text", "bravo")])
    spans = _spans(ix, q)
    assert spans
    for doc in spans:
        orig = alllists[doc]
        assert ("alfa" in orig and "charlie" in orig) or "bravo" in orig


def test_span_contains(perm_ix):
    # ref test_spans.py:281-307 — exact 12-row sorted expectation
    ix, rows = perm_ix
    nq = SpanNear(Term("text", "alfa"), Term("text", "charlie"), slop=3)
    cq = SpanContains(nq, Term("text", "echo"))
    spans = _spans(ix, cq)
    ls = sorted(rows[doc] for doc in spans)
    assert ls == [
        "alfa bravo echo charlie",
        "alfa bravo echo charlie",
        "alfa delta echo charlie",
        "alfa echo bravo charlie",
        "alfa echo bravo charlie",
        "alfa echo charlie bravo",
        "alfa echo charlie bravo",
        "alfa echo charlie delta",
        "alfa echo delta charlie",
        "bravo alfa echo charlie",
        "bravo alfa echo charlie",
        "delta alfa echo charlie",
    ]


def test_span_before(perm_ix):
    # ref test_spans.py:310-320
    ix, rows = perm_ix
    alllists = [r.split() for r in rows]
    spans = _spans(ix, SpanBefore(Term("text", "alfa"), Term("text", "charlie")))
    assert spans
    for doc in spans:
        orig = alllists[doc]
        assert "alfa" in orig and "charlie" in orig
        assert orig.index("alfa") < orig.index("charlie")


def test_span_condition(perm_ix):
    # ref test_spans.py:323-334
    ix, rows = perm_ix
    alllists = [r.split() for r in rows]
    spans = _spans(ix, SpanCondition(Term("text", "alfa"), Term("text", "charlie")))
    assert spans
    for doc, sps in spans.items():
        orig = alllists[doc]
        assert "alfa" in orig and "charlie" in orig
        for start, _end in sps:
            assert orig[start] == "alfa"


def test_regular_or(perm_ix):
    # ref test_spans.py:337-347 (UnionMatcher.spans)
    ix, rows = perm_ix
    alllists = [r.split() for r in rows]
    spans = _spans(ix, Or([Term("text", "bravo"), Term("text", "alfa")]))
    assert spans
    for doc, sps in spans.items():
        orig = alllists[doc]
        for start, _end in sps:
            assert orig[start] in ("bravo", "alfa")


def test_regular_and(perm_ix):
    # ref test_spans.py:350-360 (IntersectionMatcher.spans)
    ix, rows = perm_ix
    alllists = [r.split() for r in rows]
    q = And([Term("text", "bravo"), Term("text", "alfa")])
    spans = _spans(ix, q)
    assert spans
    for doc, sps in spans.items():
        orig = alllists[doc]
        assert "bravo" in orig and "alfa" in orig  # intersection docs only
        for start, _end in sps:
            assert orig[start] in ("bravo", "alfa")


def test_span_characters(perm_ix):
    # ref test_spans.py:363-377: Characters payload -> char offsets
    ix, rows = perm_ix
    q = Phrase("text", ["bravo", "echo"])
    spans = _spans(ix, q)
    assert spans
    with ix.searcher() as s:
        w = s._s._local_worker()
        for doc, sps in spans.items():
            orig = rows[doc]
            reader = next(
                r for r in w.readers
                if r.seg.doc_base <= doc < r.seg.doc_base + r.seg.doc_count
            )
            bravo_cs = reader.char_spans("text", "bravo", doc)
            echo_cs = reader.char_spans("text", "echo", doc)
            bravo_pos = [p for p, _ in enumerate(orig.split()) if orig.split()[p] == "bravo"]
            echo_pos = [p for p, _ in enumerate(orig.split()) if orig.split()[p] == "echo"]
            for start, end in sps:
                startchar = int(bravo_cs[bravo_pos.index(start)][0])
                endchar = int(echo_cs[echo_pos.index(end)][1])
                assert orig[startchar:endchar] == "bravo echo"
