"""Scenarios ported VERBATIM-in-spirit from the reference's own test
suite (ref tests/test_results.py) and run against the compat API — the
"a whoosh user can switch" check: same schemas, same documents, same
assertions (RamStorage becomes a tmp index dir)."""

from __future__ import annotations

from itertools import permutations

import pytest

from whoosh_reloaded_ray import compat as wrr
from whoosh_reloaded_ray import scoring
from whoosh_reloaded_ray.query import Every, Term


def _mk(tmp_path_factory, schema, rows, **writer_kw):
    d = str(tmp_path_factory.mktemp("refport"))
    ix = wrr.create_in(d, schema)
    w = ix.writer(num_shards=2, partition_rows=64, **writer_kw)
    for r in rows:
        w.add_document(**r)
    w.commit()
    return ix


def test_score_retrieval(ray_session, tmp_path_factory):
    # ref test_results.py:10-34
    schema = wrr.Schema(title=wrr.TEXT(stored=True), content=wrr.TEXT(stored=True))
    ix = _mk(tmp_path_factory, schema, [
        dict(title="Miss Mary",
             content="Mary had a little white lamb its fleece was white as snow"),
        dict(title="Snow White",
             content="Snow white lived in the forest with seven dwarfs"),
    ])
    with ix.searcher() as s:
        results = s.search(Term("content", "white"))
        assert len(results) == 2
        assert results[0]["title"] == "Miss Mary"
        assert results[1]["title"] == "Snow White"
        assert results.score(0) is not None
        assert results.score(0) != 0
        assert results.score(0) != 1


def test_resultslength(ray_session, tmp_path_factory):
    # ref test_results.py:56-73: len() is the EXACT count despite limit
    schema = wrr.Schema(id=wrr.ID(stored=True), value=wrr.TEXT())
    ix = _mk(tmp_path_factory, schema, [
        dict(id="1", value="alfa alfa alfa alfa alfa"),
        dict(id="2", value="alfa alfa alfa alfa"),
        dict(id="3", value="alfa alfa alfa"),
        dict(id="4", value="alfa alfa"),
        dict(id="5", value="alfa"),
        dict(id="6", value="bravo"),
    ])
    with ix.searcher() as s:
        r = s.search(Term("value", "alfa"), limit=3)
        assert len(r) == 5
        assert r.scored_length() == 3
        assert r[10:] == []


def test_combine(ray_session, tmp_path_factory):
    # ref test_results.py:76-108: exact result-combination orders
    schema = wrr.Schema(id=wrr.ID(stored=True), value=wrr.TEXT())
    ix = _mk(tmp_path_factory, schema, [
        dict(id="1", value="alfa bravo charlie all"),
        dict(id="2", value="bravo charlie echo all"),
        dict(id="3", value="charlie echo foxtrot all"),
        dict(id="4", value="echo foxtrot india all"),
        dict(id="5", value="foxtrot india juliet all"),
        dict(id="6", value="india juliet alfa all"),
        dict(id="7", value="juliet alfa bravo all"),
        dict(id="8", value="charlie charlie charlie all"),
    ])
    with ix.searcher() as s:
        def idsof(r):
            return "".join(hit["id"] for hit in r.hits)

        def check(r1, methodname, r2, ids):
            getattr(r1, methodname)(r2)
            assert idsof(r1) == ids

        def rfor(t):
            return s.search(Term("value", t))

        assert idsof(rfor("foxtrot")) == "345"
        check(rfor("foxtrot"), "extend", rfor("charlie"), "345812")
        check(rfor("foxtrot"), "filter", rfor("juliet"), "5")
        check(rfor("charlie"), "filter", rfor("foxtrot"), "3")
        check(rfor("all"), "filter", rfor("foxtrot"), "345")
        check(rfor("all"), "upgrade", rfor("india"), "45612378")
        check(rfor("charlie"), "upgrade_and_extend", rfor("echo"), "23814")


def test_extend_empty(ray_session, tmp_path_factory):
    # ref test_results.py:176-199
    schema = wrr.Schema(id=wrr.ID(stored=True), words=wrr.KEYWORD())
    ix = _mk(tmp_path_factory, schema, [
        dict(id="1", words="alfa bravo charlie"),
        dict(id="2", words="bravo charlie delta"),
        dict(id="3", words="charlie delta echo"),
        dict(id="4", words="delta echo foxtrot"),
        dict(id="5", words="echo foxtrot golf"),
    ])
    with ix.searcher() as s:
        r1 = s.search(Term("words", "hotel"))
        r1c = r1.copy()
        r2 = s.search(Term("words", "delta"))
        r2c = r2.copy()
        r1c.extend(r2c)
        assert [hit["id"] for hit in r1c.hits] == ["2", "3", "4"]
        assert r1c.scored_length() == 3


def test_pages(ray_session, tmp_path_factory):
    # ref test_results.py:232-257 (Frequency weighting orders by tf)
    schema = wrr.Schema(id=wrr.ID(stored=True), c=wrr.TEXT())
    ix = _mk(tmp_path_factory, schema, [
        dict(id="1", c="alfa alfa alfa alfa alfa alfa"),
        dict(id="2", c="alfa alfa alfa alfa alfa"),
        dict(id="3", c="alfa alfa alfa alfa"),
        dict(id="4", c="alfa alfa alfa"),
        dict(id="5", c="alfa alfa"),
        dict(id="6", c="alfa"),
    ])
    with ix.searcher(weighting=scoring.Frequency) as s:
        q = Term("c", "alfa")
        r = s.search(q)
        assert [d["id"] for d in r] == ["1", "2", "3", "4", "5", "6"]
        r = s.search_page(q, 2, pagelen=2)
        assert [d["id"] for d in r] == ["3", "4"]

        r = s.search_page(q, 2, pagelen=4)
        assert r.total == 6
        assert r.pagenum == 2
        assert r.pagelen == 2  # last partial page shrinks


def test_page_counts(ray_session, tmp_path_factory):
    # ref test_results.py:297-334
    schema = wrr.Schema(id=wrr.ID(stored=True))
    ix = _mk(tmp_path_factory, schema, [dict(id=str(i)) for i in range(10)])
    with ix.searcher(weighting=scoring.Frequency) as s:
        q = Every("id")
        r = s.search(q)
        assert len(r) == 10
        with pytest.raises(ValueError):
            s.search_page(q, 0)
        r = s.search_page(q, 1, 5)
        assert len(r) == 10
        assert r.pagecount == 2
        r = s.search_page(q, 2, 5)
        assert len(r) == 10
        assert r.pagecount == 2
        assert r.pagenum == 2
        r = s.search_page(q, 1, 10)
        assert len(r) == 10
        assert r.pagecount == 1
        assert r.pagenum == 1


def test_resultspage(ray_session, tmp_path_factory):
    # ref test_results.py:337-373
    schema = wrr.Schema(id=wrr.STORED(), content=wrr.TEXT(stored=True))
    domain = ("alfa", "bravo", "bravo", "charlie", "delta")
    rows = [
        dict(id=str(i), content=" ".join(lst))
        for i, lst in enumerate(permutations(domain, 3))
    ]
    ix = _mk(tmp_path_factory, schema, rows)
    with ix.searcher() as s:
        q = Term("content", "bravo")
        r = s.search(q, limit=10)
        tops = list(r)

        rp = s.search_page(q, 1, pagelen=5)
        assert rp.scored_length() == 5
        assert list(rp) == tops[0:5]
        assert rp[10:] == []

        rp = s.search_page(q, 2, pagelen=5)
        assert list(rp) == tops[5:10]

        rp = s.search_page(q, 1, pagelen=10)
        assert len(rp) == 54
        assert rp.pagecount == 6
        rp = s.search_page(q, 6, pagelen=10)
        assert len(list(rp)) == 4
        assert rp.is_last_page()

        with pytest.raises(ValueError):
            s.search_page(q, 0)
        assert s.search_page(q, 10).pagenum == 6

        rp = s.search_page(Term("content", "glonk"), 1)
        assert len(rp) == 0
        assert rp.is_last_page()


def test_stability(ray_session, tmp_path_factory):
    # ref test_results.py:510-527: growing-limit searches are prefixes
    schema = wrr.Schema(text=wrr.TEXT())
    domain = "alfa bravo charlie delta".split()
    rows = [dict(text=" ".join(ls)) for ls in permutations(domain, 3)]
    ix = _mk(tmp_path_factory, schema, rows)
    with ix.searcher() as s:
        q = Term("text", "bravo")
        last = []
        for i in range(s._s.doc_frequency("text", "bravo")):
            r = s.search(q, limit=i + 1)
            docnums = [hit.docnum for hit in r.hits]
            assert docnums[:-1] == last
            last = docnums


def test_snippets(ray_session, tmp_path_factory):
    # ref test_results.py:391-436 (stemming analyzer + sentence
    # fragmenter + uppercase formatter through Results setters)
    from whoosh_reloaded_ray.query.highlight import (
        SentenceFragmenter,
        UppercaseFormatter,
    )

    schema = wrr.Schema(text=wrr.TEXT(stored=True, analyzer=wrr.StemmingAnalyzer()))
    ix = _mk(tmp_path_factory, schema, [
        dict(text="Lay out the rough animation by creating the important poses where they occur on the timeline."),
        dict(text="Set key frames on everything that's key-able. This is for control and predictability: you don't want to accidentally leave something un-keyed. This is also much faster than selecting the parameters to key."),
        dict(text="Use constant (straight) or sometimes linear transitions between keyframes in the channel editor. This makes the character jump between poses."),
        dict(text="Keying everything gives quick, immediate results. But it can become difficult to tweak the animation later, especially for complex characters."),
        dict(text="Copy the current pose to create the next one: pose the character, key everything, then copy the keyframe in the playbar to another frame, and key everything at that frame."),
    ])
    target = [
        "Set KEY frames on everything that's KEY-able",
        "Copy the current pose to create the next one: pose the character, KEY everything, then copy the keyframe in the playbar to another frame, and KEY everything at that frame",
        "KEYING everything gives quick, immediate results",
    ]
    with ix.searcher() as s:
        r = s.search(s.parse("key"), terms=True)
        r.fragmenter = SentenceFragmenter()
        r.formatter = UppercaseFormatter()
        assert sorted(hit.highlights("text", top=1) for hit in r.hits) == sorted(target)


def test_keyterms(ray_session, tmp_path_factory):
    # ref test_results.py:439-461
    schema = wrr.Schema(path=wrr.ID(stored=True), content=wrr.TEXT())
    ix = _mk(tmp_path_factory, schema, [
        dict(path="a", content="This is some generic content"),
        dict(path="b", content="This is some distinctive content"),
    ])
    with ix.searcher() as s:
        docnum = s.document_number(path="b")
        keyterms = list(s.key_terms([docnum], "content"))
        assert len(keyterms) > 0
        assert keyterms[0][0] == "distinctive"

        r = s.search(Term("path", "b"))
        keyterms2 = list(r.key_terms("content"))
        assert len(keyterms2) > 0
        assert keyterms2[0][0] == "distinctive"


def test_lengths(ray_session, tmp_path_factory):
    # ref test_results.py:464-487 — DECLARED DEVIATION: the reference
    # reports inexact doc-frequency estimates when limit pruned the
    # collector; this engine's lazy count is always exact
    schema = wrr.Schema(id=wrr.STORED(), text=wrr.TEXT())
    from whoosh_reloaded_ray.query import Or

    ix = _mk(tmp_path_factory, schema, [
        dict(id="1", text="alfa bravo charlie delta echo"),
        dict(id="2", text="bravo charlie delta echo foxtrot"),
        dict(id="3", text="charlie needle echo foxtrot golf"),
        dict(id="4", text="delta echo foxtrot golf hotel"),
        dict(id="5", text="echo needle needle hotel india"),
        dict(id="6", text="foxtrot golf hotel india juliet"),
        dict(id="7", text="golf needle india juliet kilo"),
        dict(id="8", text="hotel india juliet needle lima"),
    ])
    with ix.searcher() as s:
        q = Or([Term("text", "needle"), Term("text", "charlie")])
        r = s.search(q, limit=2)
        assert r.has_exact_length()  # stronger than the reference
        assert r.scored_length() == 2
        assert len(r) == 6
        assert r.estimated_length() == 6


def test_lengths2(ray_session, tmp_path_factory):
    # ref test_results.py:489-507 (three commit generations, no merge)
    from whoosh_reloaded_ray.query import Or

    schema = wrr.Schema(text=wrr.TEXT(stored=True))
    d = str(tmp_path_factory.mktemp("refport"))
    ix = wrr.create_in(d, schema)
    count = 0
    for _ in range(3):
        w = ix.writer(num_shards=2, partition_rows=64)
        for ls in permutations("alfa bravo charlie".split()):
            if "bravo" in ls and "charlie" in ls:
                count += 1
            w.add_document(text=" ".join(ls))
        w.commit(mergetype=wrr.NO_MERGE)
    with ix.searcher() as s:
        q = Or([Term("text", "bravo"), Term("text", "charlie")])
        r = s.search(q, limit=None)
        assert len(r) == count
        r = s.search(q, limit=3)
        assert len(r) == count


def test_terms(ray_session, tmp_path_factory):
    # ref test_results.py:530-554 (term texts are str here, not bytes)
    schema = wrr.Schema(text=wrr.TEXT(stored=True))
    ix = _mk(tmp_path_factory, schema, [
        dict(text="alfa sierra tango"),
        dict(text="bravo charlie delta"),
        dict(text="charlie delta echo"),
        dict(text="delta echo foxtrot"),
    ])
    with ix.searcher() as s:
        q = s.parse("(bravo AND charlie) OR foxtrot OR missing")
        r = s.search(q, terms=True)

        def txts(tset):
            return sorted(t for _, t in tset)

        assert txts(r.matched_terms()) == ["bravo", "charlie", "foxtrot"]
        for hit in r.hits:
            value = hit["text"]
            for txt in txts(hit.matched_terms()):
                assert txt in value


def test_phrase_keywords(ray_session, tmp_path_factory):
    # ref test_results.py:638-654 (exact Bo1 key-term order)
    from whoosh_reloaded_ray.query import Phrase

    schema = wrr.Schema(text=wrr.TEXT(stored=True))
    ix = _mk(tmp_path_factory, schema, [
        dict(text="alfa bravo charlie delta"),
        dict(text="bravo charlie delta echo"),
        dict(text="charlie delta echo foxtrot"),
        dict(text="delta echo foxtrot alfa"),
        dict(text="echo foxtrot alfa bravo"),
    ])
    with ix.searcher() as s:
        q = Phrase("text", "alfa bravo".split())
        r = s.search(q)
        assert len(r) == 2
        kts = " ".join(t for t, score in r.key_terms("text"))
        assert kts == "alfa bravo charlie foxtrot delta"


def test_every_keywords(ray_session, tmp_path_factory):
    # ref test_results.py:656-671
    schema = wrr.Schema(title=wrr.TEXT(), content=wrr.TEXT(stored=True))
    ix = _mk(tmp_path_factory, schema, [
        dict(title="alfa", content="bravo"),
        dict(title="charlie", content="delta"),
    ])
    with ix.searcher() as s:
        q = s.parse("*", default_field="content") if False else s.parse("*")
        assert isinstance(q, Every)
        r = s.search(q, terms=True)
        assert len(r) == 2
        hit = next(h for h in r.hits if h["content"] == "bravo")
        assert hit.highlights("content") == ""


def test_filter_by_result(ray_session, tmp_path_factory):
    # ref test_results.py:674-696 (filter= accepts a Results object)
    schema = wrr.Schema(title=wrr.TEXT(stored=True), content=wrr.TEXT(stored=True))
    words = "foo bar baz qux barney".split()
    rows = [
        dict(title=("even" if x % 2 == 0 else "odd"), content=words[x % len(words)])
        for x in range(100)
    ]
    ix = _mk(tmp_path_factory, schema, rows)
    with ix.searcher() as s:
        fq = Term("title", "even")
        filter_result = s.search(fq, limit=None)
        q = Term("content", "foo")
        result = s.search(q, filter=filter_result, limit=None)
        assert len(result) > 0
        assert all(
            x["title"] == "even" and x["content"] == "foo" for x in result.hits
        )


# ---- ported from ref tests/test_sorting.py ---------------------------------

SORT_DOCS = (
    {"id": "zulu", "num": 100, "tag": "one"},
    {"id": "xray", "num": -5, "tag": "three"},
    {"id": "yankee", "num": 3, "tag": "two"},
    {"id": "alfa", "num": 7, "tag": "three"},
    {"id": "tango", "num": 2, "tag": "two"},
    {"id": "foxtrot", "num": -800, "tag": "two"},
    {"id": "sierra", "num": 1, "tag": "one"},
    {"id": "whiskey", "num": 0, "tag": "three"},
    {"id": "bravo", "num": 582045, "tag": "three"},
)


def _sort_schema():
    return wrr.Schema(
        id=wrr.ID(stored=True), num=wrr.NUMERIC(stored=True),
        tag=wrr.ID(stored=True), ev=wrr.ID(),
    )


def _try_sort(tmp_path_factory, sortedby, key, limit=None, reverse=False):
    # ref test_sorting.py:71-85: single-commit AND multi-generation
    # indexes must sort identically
    correct = [d["id"] for d in sorted(SORT_DOCS, key=key, reverse=reverse)][:limit]
    for multi in (False, True):
        d = str(tmp_path_factory.mktemp("refsort"))
        ix = wrr.create_in(d, _sort_schema())
        if multi:
            for i in range(0, len(SORT_DOCS), 3):
                w = ix.writer(num_shards=2, partition_rows=64)
                for doc in SORT_DOCS[i : i + 3]:
                    w.add_document(ev="a", **doc)
                w.commit(mergetype=wrr.NO_MERGE)
        else:
            w = ix.writer(num_shards=2, partition_rows=64)
            for doc in SORT_DOCS:
                w.add_document(ev="a", **doc)
            w.commit()
        with ix.searcher() as s:
            r = s.search(Term("ev", "a"), sortedby=sortedby, limit=limit,
                         reverse=reverse)
            rids = [h["id"] for h in r.hits]
            assert rids == correct, (multi, sortedby, rids, correct)


def test_sortedby(ray_session, tmp_path_factory):
    # ref test_sorting.py:87-92
    _try_sort(tmp_path_factory, "id", lambda d: d["id"])
    _try_sort(tmp_path_factory, "id", lambda d: d["id"], limit=5)
    _try_sort(tmp_path_factory, "id", lambda d: d["id"], reverse=True)
    _try_sort(tmp_path_factory, "id", lambda d: d["id"], limit=5, reverse=True)


def test_multisort(ray_session, tmp_path_factory):
    # ref test_sorting.py:94-100
    mf = wrr.MultiFacet(["tag", "id"])
    _try_sort(tmp_path_factory, mf, lambda d: (d["tag"], d["id"]))
    _try_sort(tmp_path_factory, mf, lambda d: (d["tag"], d["id"]), limit=5)


def test_numeric_sort(ray_session, tmp_path_factory):
    # ref test_sorting.py:102-107 (int part; float NUMERIC is a
    # declared compat-writer gap, TODO.md)
    _try_sort(tmp_path_factory, "num", lambda d: d["num"])
    _try_sort(tmp_path_factory, "num", lambda d: d["num"], reverse=True)
    _try_sort(tmp_path_factory, "num", lambda d: d["num"], limit=5)


def test_page_sorted(ray_session, tmp_path_factory):
    # ref test_sorting.py:123-145
    import random as _random

    schema = wrr.Schema(key=wrr.ID(stored=True))
    domain = list("abcdefghijklmnopqrstuvwxyz")
    _random.Random(42).shuffle(domain)
    ix = _mk(tmp_path_factory, schema, [dict(key=c) for c in domain])
    with ix.searcher() as s:
        r = s.search(Every(), sortedby="key", limit=5)
        assert r.scored_length() == 5
        assert len(r) == s.doc_count_all()

        rp = s.search_page(Every(), 1, pagelen=5, sortedby="key")
        assert "".join(h["key"] for h in rp) == "abcde"
        assert rp[10:] == []

        rp = s.search_page(Term("key", "glonk"), 1, pagelen=5, sortedby="key")
        assert len(rp) == 0
        assert rp.is_last_page()


def test_query_facet_ported(ray_session, tmp_path_factory):
    # ref test_sorting.py:223-249 (multi-generation commits)
    from whoosh_reloaded_ray.query import TermRange

    schema = wrr.Schema(id=wrr.STORED(), v=wrr.ID())
    d = str(tmp_path_factory.mktemp("refqf"))
    ix = wrr.create_in(d, schema)
    for i, ltr in enumerate("iacgbehdf"):
        w = ix.writer(num_shards=2, partition_rows=64)
        w.add_document(id=str(i), v=ltr)
        w.commit(mergetype=wrr.NO_MERGE)
    with ix.searcher() as s:
        q1 = TermRange("v", "a", "c")
        q2 = TermRange("v", "d", "f")
        q3 = TermRange("v", "g", "i")
        assert sorted(int(h["id"]) for h in s.search(q1, limit=None).hits) == [1, 2, 4]
        assert sorted(int(h["id"]) for h in s.search(q2, limit=None).hits) == [5, 7, 8]
        assert sorted(int(h["id"]) for h in s.search(q3, limit=None).hits) == [0, 3, 6]
        facet = wrr.QueryFacet({"a-c": q1, "d-f": q2, "g-i": q3})
        r = s.search(Every(), limit=None, groupedby=facet)
        assert r.groups() == {
            "a-c": [1, 2, 4],
            "d-f": [5, 7, 8],
            "g-i": [0, 3, 6],
        }


def test_numeric_float_sort(ray_session, tmp_path_factory):
    # ref test_sorting.py:102-107 frac line (float NUMERIC)
    from whoosh_reloaded_ray.query import NumericRange

    fracs = {"zulu": 0.75, "xray": 2.0, "yankee": 5.5, "alfa": 2.25,
             "tango": 1.75, "foxtrot": 3.25, "sierra": 4.75,
             "whiskey": 5.25, "bravo": 1.25}
    schema = wrr.Schema(
        id=wrr.ID(stored=True), frac=wrr.NUMERIC(float, stored=True),
        ev=wrr.ID(),
    )
    ix = _mk(tmp_path_factory, schema,
             [dict(id=k, frac=v, ev="a") for k, v in fracs.items()])
    correct = [k for k, _ in sorted(fracs.items(), key=lambda kv: kv[1])]
    with ix.searcher() as s:
        r = s.search(Term("ev", "a"), sortedby="frac", limit=None)
        assert [h["id"] for h in r.hits] == correct
        # float range predicate
        r = s.search(NumericRange("frac", 2.0, 3.3), limit=None)
        assert sorted(h["id"] for h in r.hits) == ["alfa", "foxtrot", "xray"]
        # float stored value round-trips
        assert r.hits[0]["frac"] in fracs.values()


def test_range_facet(ray_session, tmp_path_factory):
    # ref test_sorting.py:351-372 (doc lists incl. the None bucket)
    schema = wrr.Schema(id=wrr.STORED(), price=wrr.NUMERIC())
    ix = _mk(tmp_path_factory, schema, [
        dict(id="0", price=200),
        dict(id="1", price=100),
        dict(id="2"),
        dict(id="3", price=50),
        dict(id="4", price=500),
        dict(id="5", price=125),
    ])
    with ix.searcher() as s:
        rf = wrr.RangeFacet("price", 0, 1000, 100)
        r = s.search(Every(), limit=None, groupedby={"price": rf})
        assert r.groups("price") == {
            (0, 100): [3],
            (100, 200): [1, 5],
            (200, 300): [0],
            (500, 600): [4],
            None: [2],
        }


def test_range_gaps(ray_session, tmp_path_factory):
    # ref test_sorting.py:375-393 (variable-width gap list)
    schema = wrr.Schema(id=wrr.STORED(), num=wrr.NUMERIC())
    ix = _mk(tmp_path_factory, schema,
             [dict(id=str(i), num=i) for i in range(10)])
    with ix.searcher() as s:
        rf = wrr.RangeFacet("num", 0, 1000, [1, 2, 3])
        r = s.search(Every(), limit=None, groupedby={"num": rf})
        assert r.groups("num") == {
            (0, 1): [0],
            (1, 3): [1, 2],
            (3, 6): [3, 4, 5],
            (6, 9): [6, 7, 8],
            (9, 12): [9],
        }


def test_numeric_field_facet(ray_session, tmp_path_factory):
    # ref test_sorting.py:201-221: per-FIELD reverse inside MultiFacet
    schema = wrr.Schema(id=wrr.STORED(), v1=wrr.NUMERIC(), v2=wrr.NUMERIC())
    d = str(tmp_path_factory.mktemp("refmf"))
    ix = wrr.create_in(d, schema)
    for batch in ([dict(id="1", v1=2, v2=100), dict(id="2", v1=1, v2=50)],
                  [dict(id="3", v1=2, v2=200), dict(id="4", v1=1, v2=100)],
                  [dict(id="5", v1=2, v2=50), dict(id="6", v1=1, v2=200)]):
        w = ix.writer(num_shards=2, partition_rows=64)
        for r in batch:
            w.add_document(**r)
        w.commit(mergetype=wrr.NO_MERGE)
    with ix.searcher() as s:
        mf = wrr.MultiFacet().add_field("v1").add_field("v2", reverse=True)
        r = s.search(Every(), sortedby=mf, limit=None)
        assert [h["id"] for h in r.hits] == ["6", "4", "2", "3", "1", "5"]


def test_sorted_extend_facet(ray_session, tmp_path_factory):
    # ref test_results.py:135-173 (MultiFacet with reversed field +
    # ScoreFacet secondary; extend combines two sorted result sets)
    from itertools import permutations as _perms

    schema = wrr.Schema(
        title=wrr.TEXT(stored=True), keywords=wrr.TEXT(), num=wrr.NUMERIC(),
    )
    domain = "alfa bravo charlie delta echo foxtrot golf hotel india".split()
    keys = "juliet kilo lima november oskar papa quebec romeo".split()
    rows, tcount, kcount, combined = [], 0, 0, 0
    for i, words in enumerate(_perms(domain, 3)):
        key = keys[i % (len(domain) - 1)]
        if "bravo" in words:
            tcount += 1
        if key == "kilo":
            kcount += 1
        if "bravo" in words or key == "kilo":
            combined += 1
        rows.append(dict(title=" ".join(words), keywords=key, num=i))
    ix = _mk(tmp_path_factory, schema, rows)
    with ix.searcher() as s:
        facet = wrr.MultiFacet([wrr.FieldFacet("num", reverse=True), wrr.ScoreFacet()])
        r1 = s.search(Term("title", "bravo"), limit=None, sortedby=facet)
        r2 = s.search(Term("keywords", "kilo"), limit=None, sortedby=facet)
        assert len(r1) == tcount
        assert len(r2) == kcount
        r1.extend(r2)
        assert len(r1) == combined


def test_missing_field_facet(ray_session, tmp_path_factory):
    # ref test_sorting.py:280-293 (docs without the field -> None group)
    schema = wrr.Schema(id=wrr.STORED(), tag=wrr.ID())
    ix = _mk(tmp_path_factory, schema, [
        dict(id="0", tag="alfa"),
        dict(id="1", tag="alfa"),
        dict(id="2"),
        dict(id="3", tag="bravo"),
        dict(id="4"),
    ])
    with ix.searcher() as s:
        r = s.search(Every(), limit=None, groupedby="tag")
        assert r.groups("tag") == {None: [2, 4], "bravo": [3], "alfa": [0, 1]}


def test_missing_numeric_facet(ray_session, tmp_path_factory):
    # ref test_sorting.py:296-309
    schema = wrr.Schema(id=wrr.STORED(), tag=wrr.NUMERIC())
    ix = _mk(tmp_path_factory, schema, [
        dict(id="0", tag=1),
        dict(id="1", tag=1),
        dict(id="2"),
        dict(id="3", tag=0),
        dict(id="4"),
    ])
    with ix.searcher() as s:
        r = s.search(Every(), limit=None, groupedby="tag")
        assert r.groups("tag") == {None: [2, 4], 0: [3], 1: [0, 1]}


def test_date_facet(ray_session, tmp_path_factory):
    # ref test_sorting.py:329-349 (datetime group keys, None for missing)
    from datetime import datetime

    schema = wrr.Schema(id=wrr.STORED(), date=wrr.DATETIME())
    d1 = datetime(2011, 7, 13)
    d2 = datetime(1984, 3, 29)
    ix = _mk(tmp_path_factory, schema, [
        dict(id="0", date=d1),
        dict(id="1", date=d1),
        dict(id="2"),
        dict(id="3", date=d2),
        dict(id="4"),
    ])
    with ix.searcher() as s:
        r = s.search(Every(), limit=None, groupedby="date")
        assert r.groups() == {d1: [0, 1], d2: [3], None: [2, 4]}


# ---- ported from ref tests/test_highlighting.py ----------------------------

_HLDOC = "alfa bravo charlie delta echo foxtrot golf hotel india juliet kilo lima"


def test_null_fragment(whoosh):
    # ref test_highlighting.py:15-24
    from whoosh_reloaded_ray.query.highlight import (
        UppercaseFormatter,
        WholeFragmenter,
        highlight,
    )

    htext = highlight(
        _HLDOC, frozenset(("bravo", "india")), wrr.StandardAnalyzer(),
        WholeFragmenter(), UppercaseFormatter(),
    )
    assert htext == "alfa BRAVO charlie delta echo foxtrot golf hotel INDIA juliet kilo lima"


def test_sentence_fragment_ported(whoosh):
    # ref test_highlighting.py:86-99
    from whoosh_reloaded_ray.query.highlight import (
        SentenceFragmenter,
        UppercaseFormatter,
        highlight,
    )

    text = ("This is the first sentence. This one doesn't have the word. "
            "This sentence is the second. Third sentence here.")
    htext = highlight(
        text, ("sentence",), wrr.StandardAnalyzer(stoplist=None),
        SentenceFragmenter(), UppercaseFormatter(),
    )
    assert htext == (
        "This is the first SENTENCE...This SENTENCE is the second...Third SENTENCE here"
    )


def test_context_fragment_ported(whoosh):
    # ref test_highlighting.py:102-118
    from whoosh_reloaded_ray.query.highlight import (
        ContextFragmenter,
        UppercaseFormatter,
        highlight,
    )

    htext = highlight(
        _HLDOC, frozenset(("bravo", "india")), wrr.StandardAnalyzer(),
        ContextFragmenter(surround=6), UppercaseFormatter(),
    )
    assert htext == "alfa BRAVO charlie...hotel INDIA juliet"

    htext = highlight(
        _HLDOC, frozenset(["alfa"]), wrr.StandardAnalyzer(),
        ContextFragmenter(surround=15), UppercaseFormatter(),
    )
    assert htext == "ALFA bravo charlie delta echo foxtrot"


def test_html_format_ported(whoosh):
    # ref test_highlighting.py:120-153
    from whoosh_reloaded_ray.query.highlight import (
        ContextFragmenter,
        HtmlFormatter,
        WholeFragmenter,
        highlight,
    )

    htext = highlight(
        _HLDOC, frozenset(("bravo", "india")), wrr.StandardAnalyzer(),
        ContextFragmenter(surround=6), HtmlFormatter(),
    )
    assert htext == (
        'alfa <strong class="match term0">bravo</strong> charlie...'
        'hotel <strong class="match term1">india</strong> juliet'
    )

    htext = highlight(
        'alfa <bravo "charlie"> delta', frozenset(["bravo"]),
        wrr.StandardAnalyzer(), WholeFragmenter(), HtmlFormatter(),
    )
    assert htext == (
        'alfa &lt;<strong class="match term0">bravo</strong> "charlie"&gt; delta'
    )

    htext = highlight(
        _HLDOC, frozenset(("alfa", "bravo", "charlie", "delta", "echo")),
        wrr.StandardAnalyzer(), ContextFragmenter(surround=6),
        HtmlFormatter(tagname="b", termclass="t", maxclasses=2),
    )
    assert htext == (
        '<b class="match t0">alfa</b> <b class="match t1">bravo</b> '
        '<b class="match t0">charlie</b>...<b class="match t1">delta</b> '
        '<b class="match t0">echo</b> foxtrot'
    )


# ---- ported from ref tests/test_searching.py -------------------------------


def test_phrase_order(ray_session, tmp_path_factory):
    # ref test_searching.py:637-656
    from whoosh_reloaded_ray.query import Phrase

    schema = wrr.Schema(text=wrr.TEXT(stored=True, analyzer=wrr.SimpleAnalyzer()))
    rows = [dict(text=" ".join(ls))
            for ls in permutations(["ape", "bay", "can", "day"], 4)]
    ix = _mk(tmp_path_factory, schema, rows)
    with ix.searcher() as s:
        q = Phrase("text", ["bay", "can", "day"])
        r = s.search(q, limit=None)
        assert sorted(d["text"] for d in r.hits) == [
            "ape bay can day", "bay can day ape",
        ]


def test_phrase_sameword(ray_session, tmp_path_factory):
    # ref test_searching.py:658-672
    from whoosh_reloaded_ray.query import Phrase

    schema = wrr.Schema(id=wrr.STORED(), text=wrr.TEXT())
    ix = _mk(tmp_path_factory, schema, [
        dict(id="1", text="The film Linda Linda Linda is good"),
        dict(id="2", text="The model Linda Evangelista is pretty"),
    ])
    with ix.searcher() as s:
        r = s.search(Phrase("text", ["linda", "linda", "linda"]), limit=None)
        assert len(r) == 1
        assert r[0]["id"] == "1"


def test_range_parse_and_search(ray_session, tmp_path_factory):
    # ref test_searching.py:241-291
    from whoosh_reloaded_ray.query import And, TermRange

    schema = wrr.Schema(id=wrr.ID(stored=True), content=wrr.TEXT())
    ix = _mk(tmp_path_factory, schema, [
        dict(id="A", content="alfa bravo charlie delta echo"),
        dict(id="B", content="bravo charlie delta echo foxtrot"),
        dict(id="C", content="charlie delta echo foxtrot golf"),
        dict(id="D", content="delta echo foxtrot golf hotel"),
        dict(id="E", content="echo foxtrot golf hotel india"),
    ])
    with ix.searcher() as s:
        q = s.parse("charlie [delta TO foxtrot]", default_field="content") if False \
            else s.parse("charlie [delta TO foxtrot]")
        assert isinstance(q, And)
        assert isinstance(q.subqueries[1], TermRange)
        tr = q.subqueries[1]
        assert (tr.start, tr.end, tr.startexcl, tr.endexcl) == (
            "delta", "foxtrot", False, False)
        assert sorted(d["id"] for d in s.search(q).hits) == ["A", "B", "C"]

        q = s.parse("foxtrot {echo TO hotel]")
        tr = q.subqueries[1]
        assert (tr.start, tr.end, tr.startexcl, tr.endexcl) == (
            "echo", "hotel", True, False)
        assert sorted(d["id"] for d in s.search(q).hits) == ["B", "C", "D", "E"]

        q = s.parse("{bravo TO delta}")
        assert isinstance(q, TermRange)
        assert (q.start, q.end, q.startexcl, q.endexcl) == (
            "bravo", "delta", True, True)
        assert sorted(d["id"] for d in s.search(q).hits) == ["A", "B", "C"]

        q = s.parse("[1 to 10]")
        assert isinstance(q, TermRange)
        assert len(s.search(q)) == 0


def test_range_clusiveness(ray_session, tmp_path_factory):
    # ref test_searching.py:294-313
    from whoosh_reloaded_ray.query import TermRange

    schema = wrr.Schema(id=wrr.ID(stored=True))
    ix = _mk(tmp_path_factory, schema, [dict(id=c) for c in "abcdefg"])
    with ix.searcher() as s:
        def check(startexcl, endexcl, string):
            q = TermRange("id", "b", "f", startexcl, endexcl)
            assert "".join(sorted(d["id"] for d in s.search(q).hits)) == string

        check(False, False, "bcdef")
        check(True, False, "cdef")
        check(True, True, "cde")
        check(False, True, "bcde")


def test_open_ranges(ray_session, tmp_path_factory):
    # ref test_searching.py:316-339
    schema = wrr.Schema(id=wrr.ID(stored=True))
    ix = _mk(tmp_path_factory, schema, [dict(id=c) for c in "abcdefg"])
    with ix.searcher() as s:
        def check(qstring, result):
            q = s.parse(qstring, )
            got = "".join(sorted(d["id"] for d in s.search(q, limit=None).hits))
            assert got == result, (qstring, got, result)

        # our searcher.parse uses the default text field; parse on id
        from whoosh_reloaded_ray.query.parser import QueryParser

        p = QueryParser("id", s._schema)
        def check(qstring, result):  # noqa: F811
            q = p.parse(qstring)
            got = "".join(sorted(d["id"] for d in s.search(q, limit=None).hits))
            assert got == result, (qstring, got, result)

        check("[b TO]", "bcdefg")
        check("[TO e]", "abcde")
        check("[b TO d]", "bcd")
        check("{b TO]", "cdefg")
        check("[TO e}", "abcd")
        check("{b TO d}", "c")


def test_posting_phrase(ray_session, tmp_path_factory):
    # ref test_searching.py:546-590
    from whoosh_reloaded_ray.query import Phrase

    schema = wrr.Schema(name=wrr.ID(stored=True), value=wrr.TEXT())
    ix = _mk(tmp_path_factory, schema, [
        dict(name="A", value="Little Miss Muffet sat on a tuffet"),
        dict(name="B", value="Miss Little Muffet tuffet"),
        dict(name="C", value="Miss Little Muffet tuffet sat"),
        dict(name="D", value="Gibberish blonk falunk miss muffet sat tuffet garbonzo"),
        dict(name="E", value="Blah blah blah pancakes"),
    ])
    with ix.searcher() as s:
        def names(r):
            return sorted(h["name"] for h in r.hits)

        q = Phrase("value", ["little", "miss", "muffet", "sat", "tuffet"])
        r = s.search(q)
        assert names(r) == ["A"] and len(r) == 1
        assert names(s.search(Phrase("value", ["miss", "muffet", "sat", "tuffet"]))) == ["A", "D"]
        r = s.search(Phrase("value", ["falunk", "gibberish"]))
        assert not names(r) and len(r) == 0
        assert names(s.search(Phrase("value", ["gibberish", "falunk"], slop=2))) == ["D"]
        assert not names(s.search(Phrase("value", ["blah"] * 4)))
        assert names(s.search(Phrase("value", ["blah"] * 3))) == ["E"]


def test_stop_phrase(ray_session, tmp_path_factory):
    # ref test_searching.py:618-634 (stop words vanish from the parse)
    from whoosh_reloaded_ray.query import And, Term as _T

    schema = wrr.Schema(title=wrr.TEXT(stored=True))
    ix = _mk(tmp_path_factory, schema, [
        dict(title="Richard of York"),
        dict(title="Lily the Pink"),
    ])
    with ix.searcher() as s:
        q = s.parse("richard of york")
        assert q == And([_T("title", "richard"), _T("title", "york")])
        assert len(s.search(q)) == 1
        assert len(s.find("title", "lily the pink")) == 1


def test_deleted_wildcard(ray_session, tmp_path_factory):
    # ref test_searching.py:809-831
    schema = wrr.Schema(id=wrr.ID(stored=True))
    ix = _mk(tmp_path_factory, schema,
             [dict(id=w) for w in "alfa bravo charlie delta echo foxtrot".split()])
    w = ix.writer(num_shards=2, partition_rows=64)
    w.delete_by_term("id", "bravo")
    w.delete_by_term("id", "delta")
    w.delete_by_term("id", "echo")
    w.commit()
    with ix.searcher() as s:
        r = s.search(Every("id"), limit=None)
        assert sorted(d["id"] for d in r.hits) == ["alfa", "charlie", "foxtrot"]


def test_missing_wildcard(ray_session, tmp_path_factory):
    # ref test_searching.py:834-856 (Every(field) skips docs missing it)
    schema = wrr.Schema(id=wrr.ID(stored=True), f1=wrr.TEXT(), f2=wrr.TEXT())
    ix = _mk(tmp_path_factory, schema, [
        dict(id="1", f1="alfa", f2="apple"),
        dict(id="2", f1="bravo"),
        dict(id="3", f1="charlie", f2="candy"),
        dict(id="4", f2="donut"),
        dict(id="5"),
    ])
    with ix.searcher() as s:
        assert sorted(d["id"] for d in s.search(Every("id"), limit=None).hits) == ["1", "2", "3", "4", "5"]
        assert sorted(d["id"] for d in s.search(Every("f1"), limit=None).hits) == ["1", "2", "3"]
        assert sorted(d["id"] for d in s.search(Every("f2"), limit=None).hits) == ["1", "3", "4"]


def test_search_fieldname_underscores(ray_session, tmp_path_factory):
    # ref test_searching.py:720-733
    schema = wrr.Schema(my_name=wrr.ID(stored=True), my_value=wrr.TEXT())
    ix = _mk(tmp_path_factory, schema, [
        dict(my_name="Green", my_value="It's not easy being green"),
        dict(my_name="Red", my_value="Hopping mad like a playground ball"),
    ])
    with ix.searcher() as s:
        from whoosh_reloaded_ray.query.parser import QueryParser

        r = s.search(QueryParser("my_value", s._schema).parse("my_name:Green"))
        assert r[0]["my_name"] == "Green"


def test_short_prefix(whoosh):
    # ref test_searching.py:736-741
    from whoosh_reloaded_ray.query import Prefix
    from whoosh_reloaded_ray.query.parser import QueryParser
    from whoosh_reloaded_ray.schema import IndexSchema, id_field, text_field

    p = QueryParser("value", IndexSchema(fields=[id_field("name"), text_field("value")]))
    q = p.parse("s*")
    assert isinstance(q, Prefix)
    assert q.text == "s"


def test_translate_facet(ray_session, tmp_path_factory):
    # ref test_sorting.py:709-757 (test_translate)
    domain = [
        ("alfa", 100, 50), ("bravo", 20, 80), ("charlie", 10, 10),
        ("delta", 82, 39), ("echo", 20, 73), ("foxtrot", 81, 59),
        ("golf", 39, 93), ("hotel", 57, 48), ("india", 84, 75),
    ]
    schema = wrr.Schema(
        name=wrr.TEXT(stored=True), a=wrr.NUMERIC(stored=True),
        b=wrr.NUMERIC(stored=True),
    )
    ix = _mk(tmp_path_factory, schema, [dict(name=n, a=a, b=b) for n, a, b in domain])
    with ix.searcher() as s:
        r = s.search(Every(), sortedby="a")
        assert (
            " ".join(h["name"] for h in r)
            == "charlie bravo echo golf hotel foxtrot delta india alfa"
        )

        # sort by reversed name
        target = [x[0] for x in sorted(domain, key=lambda x: x[0][::-1])]
        tf = wrr.TranslateFacet(lambda name: name[::-1], wrr.FieldFacet("name"))
        r = s.search(Every(), sortedby=tf)
        assert [h["name"] for h in r] == target

        # sort by average of a and b
        def avg(a, b):
            return (a + b) / 2

        target = [x[0] for x in sorted(domain, key=lambda x: (x[1] + x[2]) / 2)]
        tf = wrr.TranslateFacet(avg, wrr.FieldFacet("a"), wrr.FieldFacet("b"))
        r = s.search(Every(), sortedby=tf)
        assert [h["name"] for h in r] == target


def test_function_facet(ray_session, tmp_path_factory):
    # ref test_sorting.py:170-199 (test_function_facet): sort by a custom
    # fn over per-doc term frequencies; top hits must balance alfa/bravo
    schema = wrr.Schema(id=wrr.NUMERIC(stored=True), text=wrr.TEXT(stored=True))
    domain = ("alfa", "bravo", "charlie")
    rows, count = [], 1
    for w1 in domain:
        for w2 in domain:
            for w3 in domain:
                for w4 in domain:
                    rows.append(dict(id=count, text=" ".join((w1, w2, w3, w4))))
                    count += 1
    ix = _mk(tmp_path_factory, schema, rows)
    with ix.searcher() as s:
        from whoosh_reloaded_ray.query import And

        q = And([Term("text", "alfa"), Term("text", "bravo")])

        def fn(searcher, docnum):
            v = dict(searcher.vector(docnum, "text"))
            return 0 - (1.0 / (abs(v.get("alfa", 0) - v.get("bravo", 0)) + 1.0))

        r = s.search(q, sortedby=wrr.FunctionFacet(fn))
        texts = [hit["text"] for hit in r]
        assert texts, "no hits"
        for t in texts[:10]:
            tks = t.split()
            assert tks.count("alfa") == tks.count("bravo"), t


def test_translate_facet_groupedby(ray_session, tmp_path_factory):
    # groupedby=TranslateFacet: bucket by a derived key (a // 50)
    domain = [("alfa", 100), ("bravo", 20), ("charlie", 10), ("delta", 82),
              ("echo", 20), ("foxtrot", 81)]
    schema = wrr.Schema(name=wrr.TEXT(stored=True), a=wrr.NUMERIC(stored=True))
    ix = _mk(tmp_path_factory, schema, [dict(name=n, a=a) for n, a in domain])
    with ix.searcher() as s:
        tf = wrr.TranslateFacet(lambda a: a // 50, wrr.FieldFacet("a"))
        groups = s.search(Every(), limit=None, groupedby=tf, maptype="count")
        assert groups.groups() == {2: 1, 0: 3, 1: 2}


def test_buffered_search(ray_session, tmp_path_factory):
    # ref test_writing.py:135-157 (BufferedWriter quasi-real-time search)
    schema = wrr.Schema(id=wrr.NUMERIC(stored=True), text=wrr.TEXT(stored=True))
    d = str(tmp_path_factory.mktemp("bufsearch"))
    ix = wrr.create_in(d, schema)
    w = wrr.BufferedWriter(ix, period=None, limit=5,
                           writerargs=dict(num_shards=2, partition_rows=64))
    w.add_document(id=1, text="alfa bravo charlie")
    w.add_document(id=2, text="bravo tango delta")
    w.add_document(id=3, text="tango delta echo")
    w.add_document(id=4, text="charlie delta echo")

    with w.searcher() as s:
        r = s.search(Term("text", "tango"), limit=None)
        assert sorted(h["id"] for h in r) == [2, 3]

    w.add_document(id=5, text="foxtrot golf hotel")
    w.add_document(id=6, text="india tango juliet")
    w.add_document(id=7, text="tango kilo lima")
    w.add_document(id=8, text="mike november echo")

    with w.searcher() as s:
        r = s.search(Term("text", "tango"), limit=None)
        assert sorted(h["id"] for h in r) == [2, 3, 6, 7]

    w.close()


def test_buffered_update(ray_session, tmp_path_factory):
    # ref test_writing.py:160-181: update_document sees SAME-BUFFER adds
    schema = wrr.Schema(id=wrr.ID(stored=True, unique=True),
                        payload=wrr.TEXT(stored=True))
    d = str(tmp_path_factory.mktemp("bufupdate"))
    ix = wrr.create_in(d, schema)
    w = wrr.BufferedWriter(ix, period=None, limit=5,
                           writerargs=dict(num_shards=2, partition_rows=64))
    for i in range(4):
        for char in "abc":
            w.update_document(id=char, payload=str(i) + char)

    with w.reader() as r:
        sfs = sorted((sf for _, sf in r.iter_docs()), key=lambda x: x["id"])
        assert sfs == [
            {"id": "a", "payload": "3a"},
            {"id": "b", "payload": "3b"},
            {"id": "c", "payload": "3c"},
        ]
        assert r.doc_count() == 3
    w.close()


def test_writer_update_document(ray_session, tmp_path_factory):
    # ref IndexWriter.update_document (writing.py:439-502): committed
    # docs matching a unique field are replaced
    schema = wrr.Schema(key=wrr.ID(stored=True, unique=True),
                        text=wrr.TEXT(stored=True))
    d = str(tmp_path_factory.mktemp("wupdate"))
    ix = wrr.create_in(d, schema)
    w = ix.writer(num_shards=2, partition_rows=64)
    w.add_document(key="x", text="old x words")
    w.add_document(key="y", text="keep y words")
    w.commit()
    w = ix.writer(num_shards=2, partition_rows=64)
    w.update_document(key="x", text="new x words")
    w.commit()
    with ix.searcher() as s:
        assert len(s.search(Term("text", "old"), limit=None)) == 0
        assert len(s.search(Term("text", "new"), limit=None)) == 1
        rows = {h["key"]: h["text"] for h in s.search(Every(), limit=None)}
        assert rows == {"x": "new x words", "y": "keep y words"}


def test_nested_parent_block_join(ray_session, tmp_path_factory):
    # ref test_nested.py:6-40 (test_nested_parent)
    from whoosh_reloaded_ray.query import NestedParent

    schema = wrr.Schema(name=wrr.ID(stored=True), type=wrr.ID(),
                        part=wrr.ID(), price=wrr.NUMERIC(stored=True))
    d = str(tmp_path_factory.mktemp("nestedp"))
    ix = wrr.create_in(d, schema)
    with ix.writer(num_shards=2, partition_rows=64) as w:
        with w.group():
            w.add_document(name="iPad", type="product")
            w.add_document(part="screen", price=100)
            w.add_document(part="battery", price=50)
            w.add_document(part="case", price=20)
        with w.group():
            w.add_document(name="iPhone", type="product")
            w.add_document(part="screen", price=60)
            w.add_document(part="battery", price=30)
            w.add_document(part="case", price=10)
        with w.group():
            w.add_document(name="Mac mini", type="product")
            w.add_document(part="hard drive", price=50)
            w.add_document(part="case", price=50)
    with ix.searcher() as s:
        q = NestedParent(Term("type", "product"), Term("price", 50))
        r = s.search(q)
        assert sorted(hit["name"] for hit in r) == ["Mac mini", "iPad"]


def test_nested_parent_score_fn(ray_session, tmp_path_factory):
    # ref test_nested.py:283-319 (test_parent_score_fn): score_fn=max/min
    # with Frequency weighting
    from whoosh_reloaded_ray import scoring
    from whoosh_reloaded_ray.query import NestedParent

    schema = wrr.Schema(name=wrr.ID(stored=True), keys=wrr.TEXT(stored=True),
                        type=wrr.ID())
    d = str(tmp_path_factory.mktemp("nestedscore"))
    ix = wrr.create_in(d, schema)
    with ix.writer(num_shards=2, partition_rows=64) as w:
        w.add_document(name="p1", type="parent")
        w.add_document(name="c1.1", type="child", keys="key key")
        w.add_document(name="c1.2", type="child", keys="key key key")
        w.add_document(name="c1.3", type="child", keys="key key")
        w.add_document(name="p2", type="parent")
        w.add_document(name="c2.1", type="child", keys="")
        w.add_document(name="c2.2", type="child", keys="key key key key")
        w.add_document(name="c2.3", type="child", keys="key")
    with ix.searcher(weighting=scoring.Frequency()) as s:
        parents = Term("type", "parent")
        children = Term("keys", "key")
        q = NestedParent(parents, children, score_fn=max)
        r = s.search(q)
        assert r.scored_length() == 2
        assert r[0]["name"] == "p2" and r[0].score == 4
        assert r[1]["name"] == "p1" and r[1].score == 3

        q = NestedParent(parents, children, score_fn=min)
        r = s.search(q)
        assert r.scored_length() == 2
        assert r[0]["name"] == "p1" and r[0].score == 2
        assert r[1]["name"] == "p2" and r[1].score == 1


def test_nested_children_query(ray_session, tmp_path_factory):
    # ref test_nested.py:322-368 (test_nested_children)
    from whoosh_reloaded_ray.query import NestedChildren

    schema = wrr.Schema(t=wrr.ID(stored=True), track=wrr.NUMERIC(stored=True),
                        album_name=wrr.TEXT(stored=True),
                        song_name=wrr.TEXT(stored=True))
    d = str(tmp_path_factory.mktemp("nestedc"))
    ix = wrr.create_in(d, schema)
    with ix.writer(num_shards=2, partition_rows=64) as w:
        with w.group():
            w.add_document(t="album", album_name="alfa bravo charlie")
            w.add_document(t="track", track=1, song_name="delta echo foxtrot")
            w.add_document(t="track", track=2, song_name="golf hotel india")
            w.add_document(t="track", track=3, song_name="juliet kilo lima")
        with w.group():
            w.add_document(t="album", album_name="mike november oskar")
            w.add_document(t="track", track=1, song_name="papa quebec romeo")
            w.add_document(t="track", track=2, song_name="sierra tango ultra")
            w.add_document(t="track", track=3, song_name="victor whiskey xray")
        with w.group():
            w.add_document(t="album", album_name="yankee zulu one")
            w.add_document(t="track", track=1, song_name="two three four")
            w.add_document(t="track", track=2, song_name="five six seven")
            w.add_document(t="track", track=3, song_name="eight nine ten")
    with ix.searcher() as s:
        pq = Term("t", "album")
        aq = Term("album_name", "november")

        r = s.search(NestedChildren(pq, pq), limit=None)
        assert len(r) == 9
        assert [hit["t"] for hit in r] == ["track"] * 9

        ncq = NestedChildren(pq, aq)
        assert sorted(ncq.docs(s)) == [5, 6, 7]
        r = s.search(ncq, limit=None)
        assert len(r) == 3
        assert sorted(hit["song_name"] for hit in r) == [
            "papa quebec romeo", "sierra tango ultra", "victor whiskey xray",
        ]

        zq = NestedChildren(pq, Term("album_name", "zulu"))
        f = wrr.StoredFieldFacet("song_name")
        r = s.search(zq, sortedby=f)
        assert [hit["track"] for hit in r] == [3, 2, 1]


def test_query_replace(ray_session):
    # ref test_queries.py:103-117
    from whoosh_reloaded_ray.query import Or, Term, Variations

    q = wrr_and = None
    from whoosh_reloaded_ray.query import And

    q = And([
        Or([Term("a", "b"), Term("b", "c")], boost=1.2),
        Variations("a", "b", boost=2.0),
    ])
    q = q.replace("a", "b", "BB")
    assert q == And([
        Or([Term("a", "BB"), Term("b", "c")], boost=1.2),
        Variations("a", "BB", boost=2.0),
    ])


def test_query_apply(ray_session):
    # ref test_queries.py:119-145 (immutability-adapted: our transforms
    # RETURN new trees; the reference mutates in place)
    from whoosh_reloaded_ray.query import And, Not, Or, Term, Variations

    def term2var(q):
        if isinstance(q, Term):
            return Variations(q.field, q.text)
        return q.apply(term2var)

    q = And([Term("f", "alfa"), Or([Term("f", "bravo"), Not(Term("f", "charlie"))])])
    q = term2var(q)
    assert q == And([
        Variations("f", "alfa"),
        Or([Variations("f", "bravo"), Not(Variations("f", "charlie"))]),
    ])


def test_query_accept(ray_session):
    # ref test_queries.py:148-173
    from whoosh_reloaded_ray.query import And, Or, Phrase, Term

    def boost_phrases(q):
        if isinstance(q, Phrase):
            import copy

            q2 = copy.copy(q)
            object.__setattr__(q2, "boost", q.boost * 2.0)
            return q2
        return q

    before = And([
        Term("a", "b"),
        Or([Term("c", "d"), Phrase("a", ["e", "f"])]),
        Phrase("a", ["g", "h"], boost=0.25),
    ])
    after = before.accept(boost_phrases)
    assert after == And([
        Term("a", "b"),
        Or([Term("c", "d"), Phrase("a", ["e", "f"], boost=2.0)]),
        Phrase("a", ["g", "h"], boost=0.5),
    ])


def test_query_requires(ray_session):
    # ref test_queries.py:387-394
    from whoosh_reloaded_ray.query import And, AndMaybe, Or, Term

    a, b = Term("f", "a"), Term("f", "b")
    assert And([a, b]).requires() == {a, b}
    assert Or([a, b]).requires() == set()
    assert AndMaybe(a, b).requires() == {a}
    assert a.requires() == {a}


def test_query_simplify(ray_session, tmp_path_factory):
    # ref test_queries.py:175-198
    from whoosh_reloaded_ray.query import And, Or, Prefix, Term

    schema = wrr.Schema(k=wrr.ID(stored=True), v=wrr.TEXT(stored=True))
    d = str(tmp_path_factory.mktemp("simplify"))
    ix = wrr.create_in(d, schema)
    w = ix.writer(num_shards=2, partition_rows=64)
    w.add_document(k="1", v="aardvark apple allan alfa bear bee")
    w.add_document(k="2", v="brie glue geewhiz goop julia")
    w.commit()
    r = ix.reader()
    q1 = And([Prefix("v", "b", boost=2.0), Term("v", "juliet")])
    q2 = And([
        Or([
            Term("v", "bear", boost=2.0),
            Term("v", "bee", boost=2.0),
            Term("v", "brie", boost=2.0),
        ]),
        Term("v", "juliet"),
    ])
    assert q1.simplify(r) == q2


def test_query_existing_terms(ray_session, tmp_path_factory):
    # ref test_queries.py:43-100 (existing_terms + wildcard expand)
    from whoosh_reloaded_ray.query import And, Or, Prefix, Term

    schema = wrr.Schema(key=wrr.ID(stored=True), value=wrr.TEXT(stored=True))
    d = str(tmp_path_factory.mktemp("existing"))
    ix = wrr.create_in(d, schema)
    w = ix.writer(num_shards=2, partition_rows=64)
    w.add_document(key="a", value="alfa bravo charlie delta echo")
    w.add_document(key="b", value="foxtrot golf hotel india juliet")
    w.commit()
    r = ix.reader()
    q = And([Term("value", "alfa"), Term("value", "nonexistent"),
             Or([Term("value", "golf"), Term("key", "zzz")])])
    assert q.existing_terms(r) == {("value", "alfa"), ("value", "golf")}
    assert q.all_terms() == {
        ("value", "alfa"), ("value", "nonexistent"),
        ("value", "golf"), ("key", "zzz"),
    }
    # expand: Prefix leaf expands against the vocabulary
    q2 = Prefix("value", "g")
    assert q2.existing_terms(r, expand=True) == {("value", "golf")}


def test_reader_corrector(ray_session, tmp_path_factory):
    # ref test_spelling.py:56-72 (ReaderCorrector over field vocabulary)
    from whoosh_reloaded_ray.spelling import ReaderCorrector

    schema = wrr.Schema(text=wrr.TEXT(stored=True))
    d = str(tmp_path_factory.mktemp("readercorr"))
    ix = wrr.create_in(d, schema)
    w = ix.writer(num_shards=2, partition_rows=64)
    w.add_document(text="render zorro kaori postal")
    w.add_document(text="reader zebra koala pastry")
    w.add_document(text="leader libra oola paster")
    w.add_document(text="feeder lorry zoala baster")
    w.commit()
    with ix.reader() as r:
        sp = ReaderCorrector(r, "text")
        assert sp.suggest("koala", maxdist=1) == ["koala", "zoala"]
        assert sp.suggest("kaola", maxdist=2) == ["kaori", "koala", "oola"]
        # reader.terms_within: lexicon-order terms within edit distance
        assert r.terms_within("text", "kaola", 2) == ["kaori", "koala", "oola"]
        # reader.corrector returns a ReaderCorrector (reference API)
        assert r.corrector("text").suggest("koala", maxdist=1) == ["koala", "zoala"]


def test_addfield(ray_session, tmp_path_factory):
    # ref test_flexible.py:5-24 (test_addfield)
    schema = wrr.Schema(id=wrr.ID(stored=True), content=wrr.TEXT(stored=False))
    d = str(tmp_path_factory.mktemp("addfield"))
    ix = wrr.create_in(d, schema)
    w = ix.writer(num_shards=2, partition_rows=64)
    w.add_document(id="a", content="alfa")
    w.add_document(id="b", content="bravo")
    w.add_document(id="c", content="charlie")
    w.commit()

    ix.add_field("added", wrr.KEYWORD(stored=True))

    w = ix.writer(num_shards=2, partition_rows=64)
    w.add_document(id="d", content="delta", added="fourth")
    w.add_document(id="e", content="echo", added="fifth")
    w.commit(mergetype=wrr.NO_MERGE)

    with ix.searcher() as s:
        assert ("id", "d") in s.reader()
        assert s.document(id="d") == {"id": "d", "added": "fourth"}
        got = s.document(id="b")
        assert got.get("id") == "b" and not got.get("added")


def test_removefield(ray_session, tmp_path_factory):
    # ref test_flexible.py:49-75 (test_removefield)
    schema = wrr.Schema(id=wrr.ID(stored=True), content=wrr.TEXT(stored=False),
                        city=wrr.KEYWORD(stored=True))
    d = str(tmp_path_factory.mktemp("removefield"))
    ix = wrr.create_in(d, schema)
    w = ix.writer(num_shards=2, partition_rows=64)
    w.add_document(id="b", content="bravo", city="baghdad")
    w.add_document(id="c", content="charlie", city="cairo")
    w.add_document(id="d", content="delta", city="dakar")
    w.commit()

    with ix.searcher() as s:
        assert s.document(id="c") == {"id": "c", "city": "cairo"}

    w = ix.writer(num_shards=2, partition_rows=64)
    w.remove_field("content")
    w.remove_field("city")
    w.commit()

    with ix.searcher() as s:
        assert ("content", b"charlie") not in s.reader()
        assert s.document(id="c") == {"id": "c"}


def test_update_multiple_unique(ray_session, tmp_path_factory):
    # ref test_indexing.py:365-385 (test_update): update with multiple
    # unique keys deletes docs matching ANY given unique value
    schema = wrr.Schema(id=wrr.ID(unique=True, stored=True),
                        path=wrr.ID(unique=True, stored=True),
                        text=wrr.TEXT(stored=True))
    d = str(tmp_path_factory.mktemp("multiunique"))
    ix = wrr.create_in(d, schema)
    with ix.writer(num_shards=2, partition_rows=64) as w:
        w.add_document(id="test1", path="/test/1", text="Hello")
        w.add_document(id="test2", path="/test/2", text="There")
        w.add_document(id="test3", path="/test/3", text="Reader")
    with ix.writer(num_shards=2, partition_rows=64) as w:
        w.update_document(id="test2", path="/test/1", text="Replacement")
    with ix.searcher() as s:
        ids = sorted(sf["id"] for _, sf in s.iter_docs())
        assert ids == ["test2", "test3"]  # test1 (path) and test2 (id) replaced


def test_update2_rolling(ray_session, tmp_path_factory):
    # ref test_indexing.py:388-404 (test_update2), smaller commit count
    import random as _random

    schema = wrr.Schema(key=wrr.ID(unique=True, stored=True),
                        p=wrr.ID(stored=True))
    d = str(tmp_path_factory.mktemp("update2"))
    ix = wrr.create_in(d, schema)
    nums = list(range(11))
    _random.Random(7).shuffle(nums)
    for i, n in enumerate(nums):
        w = ix.writer(num_shards=2, partition_rows=64)
        w.update_document(key=str(n % 10), p=str(i))
        w.commit()
    with ix.searcher() as s:
        results = " ".join(sorted(sf["key"] for _, sf in s.iter_docs()))
        assert results == "0 1 2 3 4 5 6 7 8 9"


def test_update_numeric_unique(ray_session, tmp_path_factory):
    # ref test_indexing.py:406-421 (test_update_numeric)
    import random as _random

    schema = wrr.Schema(num=wrr.NUMERIC(unique=True, stored=True),
                        text=wrr.ID(stored=True))
    d = str(tmp_path_factory.mktemp("updatenum"))
    ix = wrr.create_in(d, schema)
    nums = list(range(5)) * 2
    _random.Random(9).shuffle(nums)
    for num in nums:
        with ix.writer(num_shards=2, partition_rows=64) as w:
            w.update_document(num=num, text=str(num))
    with ix.searcher() as s:
        results = " ".join(sorted(sf["text"] for _, sf in s.iter_docs()))
        assert results == "0 1 2 3 4"


def test_reindex_idempotent(ray_session, tmp_path_factory):
    # ref test_indexing.py:423-447 (test_reindex)
    sample_docs = [
        {"id": "test1", "text": "This is a document. Awesome, is it not?"},
        {"id": "test2", "text": "Another document. Astounding!"},
        {"id": "test3",
         "text": "A fascinating article on the behavior of domestic steak knives."},
    ]
    schema = wrr.Schema(text=wrr.TEXT(stored=True),
                        id=wrr.ID(unique=True, stored=True))
    d = str(tmp_path_factory.mktemp("reindex"))
    ix = wrr.create_in(d, schema)

    def reindex():
        writer = ix.writer(num_shards=2, partition_rows=64)
        for doc in sample_docs:
            writer.update_document(**doc)
        writer.commit()

    reindex()
    assert ix.doc_count() == 3
    reindex()
    assert ix.doc_count() == 3


def test_reverse_collapse(ray_session, tmp_path_factory):
    # ref test_collector.py:126-183 (collapse_order facet)
    schema = wrr.Schema(
        title=wrr.TEXT(stored=True), content=wrr.TEXT(stored=False),
        path=wrr.ID(stored=True), tags=wrr.KEYWORD(stored=False),
        order=wrr.NUMERIC(stored=True),
    )
    d = str(tmp_path_factory.mktemp("revcollapse"))
    ix = wrr.create_in(d, schema)
    with ix.writer(num_shards=2, partition_rows=64) as w:
        w.add_document(title="First document", content="This is my document!",
                       path="/a", tags="first", order=20)
        w.add_document(title="Second document",
                       content="This is the second example.", path="/b",
                       tags="second", order=12)
        w.add_document(title="Third document", content="Examples are many.",
                       path="/c", tags="third", order=15)
        w.add_document(title="Thirdish document",
                       content="Examples are too many.", path="/d",
                       tags="third", order=25)
    with ix.searcher() as s:
        r = s.search(Every("content"), limit=None)
        assert sorted(hit["path"] for hit in r) == ["/a", "/b", "/c", "/d"]

        from whoosh_reloaded_ray.query import Or

        q = Or([Term("title", "document"), Term("content", "document"),
                Term("tags", "document")])
        cf = wrr.FieldFacet("tags")
        of = wrr.FieldFacet("order", reverse=True)
        r = s.search(q, collapse=cf, collapse_order=of)
        assert [hit["path"] for hit in r] == ["/a", "/b", "/d"]


def test_termdocs(ray_session, tmp_path_factory):
    # ref test_collector.py:186-211 (Results.termdocs via terms=True)
    from whoosh_reloaded_ray.query import And, Prefix

    schema = wrr.Schema(key=wrr.TEXT(stored=True), city=wrr.ID(stored=True))
    d = str(tmp_path_factory.mktemp("termdocs"))
    ix = wrr.create_in(d, schema)
    with ix.writer(num_shards=2, partition_rows=64) as w:
        for key, city in [("ant", "london"), ("anteater", "roma"),
                          ("bear", "london"), ("bees", "roma"),
                          ("anorak", "london"), ("antimatter", "roma"),
                          ("angora", "london"), ("angels", "roma")]:
            w.add_document(key=key, city=city)
    with ix.searcher() as s:
        q = And([Term("city", "london"), Prefix("key", "an")]).normalize()
        r = s.search(q, limit=None, terms=True)
        terms = [t for fieldname, t in r.termdocs if fieldname == "key"]
        assert sorted(terms) == ["angora", "anorak", "ant"]


def test_termdocs2(ray_session, tmp_path_factory):
    # ref test_collector.py:214-246 (manual prefix-expansion walk)
    schema = wrr.Schema(key=wrr.TEXT(stored=True), city=wrr.ID(stored=True))
    d = str(tmp_path_factory.mktemp("termdocs2"))
    ix = wrr.create_in(d, schema)
    with ix.writer(num_shards=2, partition_rows=64) as w:
        for key, city in [("ant", "london"), ("anteater", "roma"),
                          ("bear", "london"), ("bees", "roma"),
                          ("anorak", "london"), ("antimatter", "roma"),
                          ("angora", "london"), ("angels", "roma")]:
            w.add_document(key=key, city=city)
    with ix.searcher() as s:
        cond_docnums = set(Term("city", "london").docs(s))
        terms = []
        for term in s.reader().expand_prefix("key", "an"):
            for docnum in s.document_numbers(key=term):
                if docnum in cond_docnums:
                    terms.append(term)
                    break
        assert terms == ["angora", "anorak", "ant"]


def test_open_date_ranges(ray_session, tmp_path_factory):
    # ref test_searching.py:362-411 (open-ended date ranges, with and
    # without the date parser; tz-naive datetimes — our DATETIME column
    # is a naive timestamp[us])
    from datetime import datetime, timedelta

    from whoosh_reloaded_ray.query.parser import QueryParser

    basedate = datetime(2011, 1, 24, 6, 25, 0, 0)
    domain = [basedate + timedelta(days=n) for n in range(-20, 20)]
    schema = wrr.Schema(date=wrr.DATETIME(stored=True))
    d = str(tmp_path_factory.mktemp("opendates"))
    ix = wrr.create_in(d, schema)
    w = ix.writer(num_shards=2, partition_rows=64)
    for dt in domain:
        w.add_document(date=dt)
    w.commit()

    with ix.searcher() as s:
        qp = QueryParser("date", s._schema)
        q = qp.parse("[2011-01-10 to]")
        r = [hit["date"] for hit in s.search(q, limit=None, sortedby="date")]
        assert r and r == sorted(dt for dt in domain
                                 if dt >= datetime(2011, 1, 10, 6, 25))

        q = qp.parse("[to 2011-01-30]")
        r = [hit["date"] for hit in s.search(q, limit=None, sortedby="date")]
        assert r and r == sorted(dt for dt in domain
                                 if dt <= datetime(2011, 1, 30, 6, 25))

        # with the natural-language date parser (basedate-seeded)
        qp = QueryParser("date", s._schema, dateparse_basedate=basedate)
        q = qp.parse("[10 jan 2011 to]")
        r = [hit["date"] for hit in s.search(q, limit=None, sortedby="date")]
        assert r and r == sorted(dt for dt in domain
                                 if dt >= datetime(2011, 1, 10, 6, 25))

        q = qp.parse("[to 30 jan 2011]")
        r = [hit["date"] for hit in s.search(q, limit=None, sortedby="date")]
        assert r and r == sorted(dt for dt in domain
                                 if dt <= datetime(2011, 1, 30, 6, 25))


def test_finalweighting(ray_session, tmp_path_factory):
    # ref test_searching.py:858-885 (use_final score adjustment)
    from whoosh_reloaded_ray import scoring

    schema = wrr.Schema(id=wrr.ID(stored=True), summary=wrr.TEXT(stored=False),
                        n_comments=wrr.NUMERIC(stored=True))
    d = str(tmp_path_factory.mktemp("finalw"))
    ix = wrr.create_in(d, schema)
    w = ix.writer(num_shards=2, partition_rows=64)
    w.add_document(id="1", summary="alfa bravo", n_comments=5)
    w.add_document(id="2", summary="alfa", n_comments=12)
    w.add_document(id="3", summary="bravo", n_comments=2)
    w.add_document(id="4", summary="bravo bravo", n_comments=7)
    w.commit()

    class CommentWeighting(scoring.Frequency):
        use_final = True

        def final(self, searcher, docnum, score):
            return searcher.stored_fields(docnum).get("n_comments", 0)

    with ix.searcher(weighting=CommentWeighting()) as s:
        from whoosh_reloaded_ray.query import Or

        q = Or([Term("summary", "alfa"), Term("summary", "bravo")])
        r = s.search(q)
        ids = [fs["id"] for fs in r]
        assert ids == ["2", "4", "1", "3"]


def test_highlight_wildcards(ray_session, tmp_path_factory):
    # ref test_highlighting.py:293-306: wildcard-matched terms highlight
    from whoosh_reloaded_ray.highlight import UppercaseFormatter
    from whoosh_reloaded_ray.qparser import QueryParser

    schema = wrr.Schema(text=wrr.TEXT(stored=True))
    d = str(tmp_path_factory.mktemp("hlwild"))
    ix = wrr.create_in(d, schema)
    with ix.writer(num_shards=2, partition_rows=64) as w:
        w.add_document(text="alfa bravo charlie delta cookie echo")
    with ix.searcher() as s:
        qp = QueryParser("text", s._schema)
        q = qp.parse("c*")
        r = s.search(q)
        assert r.scored_length() == 1
        r.formatter = UppercaseFormatter()
        hit = r[0]
        assert hit.highlights("text") == "alfa bravo CHARLIE delta COOKIE echo"


def test_highlight_ngrams(ray_session, tmp_path_factory, whoosh):
    # ref test_highlighting.py:309-324: NGRAMWORDS highlights matched
    # gram SPANS; oracle = the live reference's own output for the same
    # schema/doc/query
    import tempfile

    from whoosh import fields as wf
    from whoosh import highlight as wh
    from whoosh import index as windex
    from whoosh import qparser as wqp

    text = "Multiplication and subtraction are good"
    with tempfile.TemporaryDirectory() as wd:
        wix = windex.create_in(wd, wf.Schema(text=wf.NGRAMWORDS(stored=True)))
        with wix.writer() as w:
            w.add_document(text=text)
        with wix.searcher() as s:
            q = wqp.QueryParser("text", wix.schema).parse("multiplication")
            r = s.search(q)
            r.fragmenter = wh.SentenceFragmenter()
            r.formatter = wh.UppercaseFormatter()
            expected = r[0].highlights("text")
    assert expected  # the reference produces a non-empty snippet

    from whoosh_reloaded_ray.highlight import SentenceFragmenter, UppercaseFormatter
    from whoosh_reloaded_ray.qparser import QueryParser

    schema = wrr.Schema(text=wrr.NGRAMWORDS(stored=True))
    d = str(tmp_path_factory.mktemp("hlngram"))
    ix = wrr.create_in(d, schema)
    with ix.writer(num_shards=2, partition_rows=64) as w:
        w.add_document(text=text)
    with ix.searcher() as s:
        q = QueryParser("text", s._schema).parse("multiplication")
        r = s.search(q)
        assert r.scored_length() == 1
        r.fragmenter = SentenceFragmenter()
        r.formatter = UppercaseFormatter()
        assert r[0].highlights("text") == expected


def test_missing_field_scoring(ray_session, tmp_path_factory):
    # ref test_searching.py:695-717 (docs missing a field; per-field
    # lengths stay correct across two commits/segments)
    from whoosh_reloaded_ray.qparser import MultifieldParser

    schema = wrr.Schema(name=wrr.TEXT(stored=True), hobbies=wrr.TEXT(stored=True))
    d = str(tmp_path_factory.mktemp("missfield"))
    ix = wrr.create_in(d, schema)
    with ix.writer(num_shards=2, partition_rows=64) as w:
        w.add_document(name="Frank", hobbies="baseball, basketball")
    with ix.reader() as r:
        assert r.field_length("hobbies") == 2
        assert r.field_length("name") == 1
    w = ix.writer(num_shards=2, partition_rows=64)
    w.add_document(name="Jonny")
    w.commit(merge=False)
    with ix.searcher() as s:
        assert s.field_length("hobbies") == 2
        assert s.field_length("name") == 2
        q = MultifieldParser(["name", "hobbies"], s._schema).parse("baseball")
        assert s.search(q).scored_length() == 1


def test_find_missing(ray_session, tmp_path_factory):
    # ref test_searching.py:914-932 ("NOT id:*" finds docs missing the field)
    from whoosh_reloaded_ray.qparser import QueryParser

    schema = wrr.Schema(id=wrr.ID(stored=False), text=wrr.KEYWORD(stored=True))
    d = str(tmp_path_factory.mktemp("findmiss"))
    ix = wrr.create_in(d, schema)
    with ix.writer(num_shards=2, partition_rows=64) as w:
        w.add_document(id="1", text="alfa")
        w.add_document(id="2", text="bravo")
        w.add_document(text="charlie")
        w.add_document(id="4", text="delta")
        w.add_document(text="echo")
        w.add_document(id="6", text="foxtrot")
        w.add_document(text="golf")
    with ix.searcher() as s:
        q = QueryParser("text", s._schema).parse("NOT id:*")
        r = s.search(q, limit=None)
        assert [h["text"] for h in r] == ["charlie", "echo", "golf"]


def test_andmaybe_quality(ray_session, tmp_path_factory):
    # ref test_searching.py:1186-1213 (AndMaybe under limit keeps the
    # boosted hit in the top slice)
    from whoosh_reloaded_ray.qparser import QueryParser

    schema = wrr.Schema(
        title=wrr.TEXT(stored=True), year=wrr.NUMERIC(int)
    )
    d = str(tmp_path_factory.mktemp("ambq"))
    ix = wrr.create_in(d, schema)
    domain = [
        ("Alpha Bravo Charlie Delta", 2000), ("Echo Bravo Foxtrot", 2000),
        ("Bravo Golf Hotel", 2002), ("Bravo India", 2002),
        ("Juliet Kilo Bravo", 2004), ("Lima Bravo Mike", 2004),
    ]
    with ix.writer(num_shards=2, partition_rows=64) as w:
        for title, year in domain:
            w.add_document(title=title, year=year)
    with ix.searcher() as s:
        q = QueryParser("title", s._schema).parse("title:bravo ANDMAYBE year:2004")
        titles = [hit["title"] for hit in s.search(q, limit=None)[:2]]
        assert "Juliet Kilo Bravo" in titles
        titles = [hit["title"] for hit in s.search(q, limit=2)]
        assert "Juliet Kilo Bravo" in titles


def test_collect_limit(ray_session, tmp_path_factory):
    # ref test_searching.py:1216-1249 (limit larger than hits; second
    # unmerged commit)
    from whoosh_reloaded_ray.query import Term

    schema = wrr.Schema(id=wrr.STORED(), text=wrr.TEXT())
    d = str(tmp_path_factory.mktemp("colimit"))
    ix = wrr.create_in(d, schema)
    with ix.writer(num_shards=2, partition_rows=64) as w:
        w.add_document(id="a", text="alfa bravo charlie delta echo")
        w.add_document(id="b", text="bravo charlie delta echo foxtrot")
        w.add_document(id="c", text="charlie delta echo foxtrot golf")
        w.add_document(id="d", text="delta echo foxtrot golf hotel")
        w.add_document(id="e", text="echo foxtrot golf hotel india")
    with ix.searcher() as s:
        r = s.search(Term("text", "golf"), limit=10)
        assert r.scored_length() == 3
        assert sum(1 for _ in r) == 3
    w = ix.writer(num_shards=2, partition_rows=64)
    w.add_document(id="f", text="foxtrot golf hotel india juliet")
    w.add_document(id="g", text="golf hotel india juliet kilo")
    w.add_document(id="h", text="hotel india juliet kilo lima")
    w.add_document(id="i", text="india juliet kilo lima mike")
    w.add_document(id="j", text="juliet kilo lima mike november")
    w.commit(merge=False)
    with ix.searcher() as s:
        r = s.search(Term("text", "golf"), limit=20)
        assert r.scored_length() == 5
        assert sum(1 for _ in r) == 5


def test_coord(ray_session, tmp_path_factory):
    # ref test_searching.py:1582-1611 (OrGroup.factory scale -> CoordMatcher
    # ranking; exact hit order ported)
    from whoosh_reloaded_ray.qparser import OrGroup, QueryParser
    from whoosh_reloaded_ray.query import Or

    schema = wrr.Schema(id=wrr.STORED(), hits=wrr.STORED(), tags=wrr.KEYWORD())
    d = str(tmp_path_factory.mktemp("coord"))
    ix = wrr.create_in(d, schema)
    with ix.writer(num_shards=2, partition_rows=64) as w:
        w.add_document(id="0", hits="0", tags="blah blah blah blah")
        w.add_document(id="1", hits="0", tags="echo echo blah blah")
        w.add_document(id="2", hits="1", tags="bravo charlie delta echo")
        w.add_document(id="3", hits="2", tags="charlie delta echo foxtrot")
        w.add_document(id="4", hits="3", tags="delta echo foxtrot golf")
        w.add_document(id="5", hits="3", tags="echo foxtrot golf hotel")
        w.add_document(id="6", hits="2", tags="foxtrot golf hotel india")
        w.add_document(id="7", hits="1", tags="golf hotel india juliet")
        w.add_document(id="8", hits="0", tags="foxtrot foxtrot foo foo")
        w.add_document(id="9", hits="0", tags="foo foo foo foo")
    og = OrGroup.factory(0.99)
    qp = QueryParser("tags", ix.index_schema, group=og)
    q = qp.parse("golf foxtrot echo")
    assert isinstance(q, Or) and q.scale == 0.99
    with ix.searcher() as s:
        r = s.search(q, limit=None)
        assert [hit["id"] for hit in r] == ["4", "5", "3", "6", "1", "8", "2", "7"]


def test_groupedby_with_terms(ray_session, tmp_path_factory):
    # ref test_searching.py:1624-1645 (groupedby + terms=True together;
    # matched terms are (field, text-str) pairs here vs the reference's
    # bytes — a documented surface deviation)
    from whoosh_reloaded_ray.qparser import QueryParser

    schema = wrr.Schema(content=wrr.TEXT(), organism=wrr.ID())
    d = str(tmp_path_factory.mktemp("gbterms"))
    ix = wrr.create_in(d, schema)
    with ix.writer(num_shards=2, partition_rows=64) as w:
        w.add_document(
            organism="mus",
            content="IPFSTD1 IPFSTD_kdwq134 Kaminski-all Study00:00:00",
        )
        w.add_document(
            organism="mus", content="IPFSTD1 IPFSTD_kdwq134 Kaminski-all Study"
        )
        w.add_document(organism="hs", content="This is the first document we've added!")
    with ix.searcher() as s:
        q = QueryParser("content", s._schema).parse("IPFSTD1")
        r = s.search(q, groupedby=["organism"], terms=True)
        assert r.scored_length() == 2
        assert r.groups("organism") == {"mus": [1, 0]}
        assert r.has_matched_terms()
        assert r.matched_terms() == {("content", "ipfstd1")}


def test_terms_with_filter(ray_session, tmp_path_factory):
    # ref test_searching.py:1691-1711 (search_page with a plain docnum-set
    # filter + terms=True)
    from whoosh_reloaded_ray.query import Term

    schema = wrr.Schema(text=wrr.TEXT())
    d = str(tmp_path_factory.mktemp("twfilter"))
    ix = wrr.create_in(d, schema)
    with ix.writer(num_shards=2, partition_rows=64) as w:
        w.add_document(text="alfa bravo charlie delta")
        w.add_document(text="bravo charlie delta echo")
        w.add_document(text="charlie delta echo foxtrot")
        w.add_document(text="delta echo foxtrot golf")
        w.add_document(text="echo foxtrot golf hotel")
        w.add_document(text="foxtrot golf hotel alfa")
        w.add_document(text="golf hotel alfa bravo")
        w.add_document(text="hotel alfa bravo charlie")
    with ix.searcher() as s:
        r = s.search_page(
            Term("text", "foxtrot"), pagenum=1, pagelen=5, terms=True,
            filter={1, 2, 3},
        )
        assert r.scored_length() == 2
        assert [hit.docnum for hit in r] == [2, 3]


def test_terms_to_bytes(ray_session, tmp_path_factory):
    # ref test_searching.py:1713-1727 (numeric Term value conversion
    # inside And)
    from whoosh_reloaded_ray.query import And, Term

    schema = wrr.Schema(a=wrr.TEXT(), b=wrr.NUMERIC(int), id=wrr.STORED())
    d = str(tmp_path_factory.mktemp("t2b"))
    ix = wrr.create_in(d, schema)
    with ix.writer(num_shards=2, partition_rows=64) as w:
        w.add_document(id="0", a="alfa bravo", b=100)
        w.add_document(id="1", a="bravo charlie", b=200)
        w.add_document(id="2", a="charlie delta", b=100)
        w.add_document(id="3", a="delta echo", b=200)
    with ix.searcher() as s:
        r = s.search(And([Term("b", 200), Term("a", "bravo")]))
        assert [hit["id"] for hit in r] == ["1"]


def test_limit_scores(ray_session, tmp_path_factory):
    # ref test_searching.py:1796-1820 (limited and unlimited searches
    # score identically)
    from whoosh_reloaded_ray.query import And, Term

    domain = "alfa bravo charlie delta echo foxtrot golf".split()
    schema = wrr.Schema(desc=wrr.TEXT(), parent=wrr.KEYWORD(stored=True))
    d = str(tmp_path_factory.mktemp("limsc"))
    ix = wrr.create_in(d, schema)
    with ix.writer(num_shards=2, partition_rows=4096) as w:
        count = 0
        for words in permutations(domain, 4):
            count += 1
            w.add_document(desc=" ".join(words), parent=str(count))
    with ix.searcher() as s:
        q = And([Term("desc", "delta", boost=30.0), Term("parent", "545")])
        r = s.search(q, limit=500)
        assert r.scored_length() == 1
        limited_score = r[0].score
        r = s.search(q, limit=None)
        assert r.scored_length() == 1
        assert r[0].score == limited_score


def test_find_decimals(ray_session, tmp_path_factory):
    # ref test_searching.py:1770-1793 (NUMERIC(Decimal, decimal_places));
    # deviation: our schema-aware parser resolves "num:3.0" straight to a
    # columnar equality range instead of the reference's numeric Term —
    # same matches
    from decimal import Decimal

    from whoosh_reloaded_ray.qparser import QueryParser

    schema = wrr.Schema(
        name=wrr.KEYWORD(stored=True),
        num=wrr.NUMERIC(Decimal, decimal_places=5),
    )
    d = str(tmp_path_factory.mktemp("decim"))
    ix = wrr.create_in(d, schema)
    with ix.writer(num_shards=2, partition_rows=64) as w:
        w.add_document(name="alfa", num=Decimal("1.5"))
        w.add_document(name="bravo", num=Decimal("2.1"))
        w.add_document(name="charlie", num=Decimal("5.3"))
        w.add_document(name="delta", num=Decimal(3))
        w.add_document(name="echo", num=Decimal("3.00001"))
        w.add_document(name="foxtrot", num=Decimal("3"))
    with ix.searcher() as s:
        q = QueryParser("name", s._schema).parse("num:3.0")
        r = s.search(q)
        assert " ".join(sorted(hit["name"] for hit in r)) == "delta foxtrot"
        # stored readback descales to Decimal
        assert s.document(name="echo")["num"] == Decimal("3.00001")
        # user-built range queries scale the same way
        from whoosh_reloaded_ray.query import NumericRange

        r2 = s.search(NumericRange("num", Decimal("2"), Decimal("3")), limit=None)
        assert sorted(h["name"] for h in r2) == ["bravo", "delta", "foxtrot"]


def test_resultcopy(ray_session, tmp_path_factory):
    # ref test_results.py:37-53
    from whoosh_reloaded_ray.qparser import QueryParser

    schema = wrr.Schema(a=wrr.TEXT(stored=True))
    ix = _mk(tmp_path_factory, schema, [
        {"a": "alfa bravo charlie"}, {"a": "bravo charlie delta"},
        {"a": "charlie delta echo"}, {"a": "delta echo foxtrot"},
    ])
    with ix.searcher() as s:
        r = s.search(QueryParser("a", None).parse("charlie"))
        assert len(r) == 3
        rcopy = r.copy()
        assert r.top_n == rcopy.top_n


def test_results_filter(ray_session, tmp_path_factory):
    # ref test_results.py:111-132 (in-place Results.filter)
    from whoosh_reloaded_ray.query import Term

    schema = wrr.Schema(id=wrr.STORED(), words=wrr.KEYWORD(stored=True))
    ix = _mk(tmp_path_factory, schema, [
        {"id": "1", "words": "bravo top"}, {"id": "2", "words": "alfa top"},
        {"id": "3", "words": "alfa top"}, {"id": "4", "words": "alfa bottom"},
        {"id": "5", "words": "bravo bottom"}, {"id": "6", "words": "charlie bottom"},
        {"id": "7", "words": "charlie bottom"},
    ])
    with ix.searcher() as s:
        r = s.search(Term("words", "alfa"))
        r.filter(s.search(Term("words", "bottom")))
        assert "".join(s.stored_fields(d)["id"] for d in r.docs()) == "4"


def test_pages_with_filter(ray_session, tmp_path_factory):
    # ref test_results.py:260-281 (filter query + paging, Frequency model)
    from whoosh_reloaded_ray import scoring
    from whoosh_reloaded_ray.query import Term

    schema = wrr.Schema(id=wrr.ID(stored=True), type=wrr.TEXT(), c=wrr.TEXT())
    ix = _mk(tmp_path_factory, schema, [
        {"id": "1", "type": "odd", "c": "alfa alfa alfa alfa alfa alfa"},
        {"id": "2", "type": "even", "c": "alfa alfa alfa alfa alfa"},
        {"id": "3", "type": "odd", "c": "alfa alfa alfa alfa"},
        {"id": "4", "type": "even", "c": "alfa alfa alfa"},
        {"id": "5", "type": "odd", "c": "alfa alfa"},
        {"id": "6", "type": "even", "c": "alfa"},
    ])
    with ix.searcher(weighting=scoring.Frequency) as s:
        q = Term("c", "alfa")
        filterq = Term("type", "even")
        r = s.search(q, filter=filterq)
        assert [d["id"] for d in r] == ["2", "4", "6"]
        r = s.search_page(q, 2, pagelen=2, filter=filterq)
        assert [d["id"] for d in r] == ["6"]


def test_extra_slice(ray_session, tmp_path_factory):
    # ref test_results.py:284-295 (slice past the collected hits)
    from whoosh_reloaded_ray.query import Every

    schema = wrr.Schema(key=wrr.ID(stored=True))
    ix = _mk(
        tmp_path_factory, schema, [{"key": ch} for ch in "abcdefghijklmnopqrstuvwxyz"]
    )
    with ix.searcher() as s:
        r = s.search(Every(), limit=5)
        assert r[6:7] == []


def test_highlight_setters(ray_session, tmp_path_factory):
    # ref test_results.py:376-388 (Results.formatter forwards to the
    # attached Highlighter)
    from whoosh_reloaded_ray import highlight as hl
    from whoosh_reloaded_ray.query import Term

    schema = wrr.Schema(text=wrr.TEXT())
    ix = _mk(tmp_path_factory, schema, [{"text": "Hello"}])
    r = ix.searcher().search(Term("text", "hello"))
    h = hl.Highlighter()
    ucf = hl.UppercaseFormatter()
    r.highlighter = h
    r.formatter = ucf
    assert h.formatter is ucf


def test_hit_column(ray_session, tmp_path_factory):
    # ref test_results.py:556-580 (unstored field raises KeyError;
    # sortable=True keeps the value readable)
    from whoosh_reloaded_ray.query import Term

    schema = wrr.Schema(text=wrr.TEXT(stored=False))
    ix = _mk(tmp_path_factory, schema, [{"text": "alfa bravo charlie"}])
    with ix.searcher() as s:
        r = s.search(Term("text", "alfa"))
        assert r.scored_length() == 1
        with pytest.raises(KeyError):
            _ = r[0]["text"]

    schema = wrr.Schema(text=wrr.TEXT(stored=False, sortable=True))
    ix = _mk(tmp_path_factory, schema, [{"text": "alfa bravo charlie"}])
    with ix.searcher() as s:
        r = s.search(Term("text", "alfa"))
        assert r.scored_length() == 1
        assert r[0]["text"] == "alfa bravo charlie"


def test_paged_highlights(ray_session, tmp_path_factory):
    # ref test_results.py:617-636 (highlight config through ResultsPage)
    from whoosh_reloaded_ray import highlight as hl
    from whoosh_reloaded_ray.query import Term

    schema = wrr.Schema(text=wrr.TEXT(stored=True))
    ix = _mk(tmp_path_factory, schema, [
        {"text": "alfa bravo charlie delta echo foxtrot"},
        {"text": "bravo charlie delta echo foxtrot golf"},
        {"text": "charlie delta echo foxtrot golf hotel"},
        {"text": "delta echo foxtrot golf hotel india"},
        {"text": "echo foxtrot golf hotel india juliet"},
        {"text": "foxtrot golf hotel india juliet kilo"},
    ])
    with ix.searcher() as s:
        page = s.search_page(Term("text", "alfa"), 1, pagelen=3)
        page.results.fragmenter = hl.WholeFragmenter()
        page.results.formatter = hl.UppercaseFormatter()
        assert page[0].highlights("text") == "ALFA bravo charlie delta echo foxtrot"


def test_frequency_keyword(ray_session, tmp_path_factory):
    # ref test_indexing.py:231-267 (reader term stats + full terminfo
    # iteration; our terms are str, not the reference's utf-8 bytes)
    schema = wrr.Schema(content=wrr.KEYWORD())
    ix = _mk(tmp_path_factory, schema, [
        {"content": "A B C D E"}, {"content": "B B B B C D D"},
        {"content": "D E F"},
    ])
    with ix.reader() as tr:
        assert tr.doc_frequency("content", "B") == 2
        assert tr.frequency("content", "B") == 5
        assert tr.doc_frequency("content", "E") == 2
        assert tr.frequency("content", "E") == 2
        assert tr.doc_frequency("content", "A") == 1
        assert tr.frequency("content", "A") == 1
        assert tr.doc_frequency("content", "D") == 3
        assert tr.frequency("content", "D") == 4
        assert tr.doc_frequency("content", "F") == 1
        assert tr.frequency("content", "F") == 1
        assert tr.doc_frequency("content", "Z") == 0
        assert tr.frequency("content", "Z") == 0
        stats = [
            (fname, text, ti.doc_frequency(), ti.weight())
            for (fname, text), ti in tr
        ]
        assert stats == [
            ("content", "A", 1, 1), ("content", "B", 2, 5),
            ("content", "C", 2, 2), ("content", "D", 3, 4),
            ("content", "E", 2, 2), ("content", "F", 1, 1),
        ]


def test_frequency_text(ray_session, tmp_path_factory):
    # ref test_indexing.py:270-306
    schema = wrr.Schema(content=wrr.KEYWORD())
    ix = _mk(tmp_path_factory, schema, [
        {"content": "alfa bravo charlie delta echo"},
        {"content": "bravo bravo bravo bravo charlie delta delta"},
        {"content": "delta echo foxtrot"},
    ])
    with ix.reader() as tr:
        assert tr.doc_frequency("content", "bravo") == 2
        assert tr.frequency("content", "bravo") == 5
        assert tr.doc_frequency("content", "zulu") == 0
        assert tr.frequency("content", "zulu") == 0
        stats = [
            (fname, text, ti.doc_frequency(), ti.weight())
            for (fname, text), ti in tr
        ]
        assert stats == [
            ("content", "alfa", 1, 1), ("content", "bravo", 2, 5),
            ("content", "charlie", 2, 2), ("content", "delta", 3, 4),
            ("content", "echo", 2, 2), ("content", "foxtrot", 1, 1),
        ]


def test_simple_stored(ray_session, tmp_path_factory):
    # ref test_indexing.py:568-575 (unstored fields absent from
    # stored_fields)
    schema = wrr.Schema(a=wrr.ID(stored=True), b=wrr.ID(stored=False))
    ix = _mk(tmp_path_factory, schema, [{"a": "alfa", "b": "bravo"}])
    with ix.searcher() as s:
        assert s.stored_fields(0) == {"a": "alfa"}


def test_single_doc(ray_session, tmp_path_factory):
    # ref test_indexing.py:578-590 (reader __contains__, documents())
    schema = wrr.Schema(id=wrr.ID(stored=True), text=wrr.TEXT(stored=False))
    ix = _mk(tmp_path_factory, schema, [{"id": "1", "text": "alfa"}])
    with ix.searcher() as s:
        assert ("text", "alfa") in s.reader()
        assert list(s.documents(id="1")) == [{"id": "1"}]
        assert list(s.documents(text="alfa")) == [{"id": "1"}]
        assert list(s.reader().all_stored_fields()) == [{"id": "1"}]


def test_indentical_fields(ray_session, tmp_path_factory):
    # ref test_indexing.py:592-608 (same value in three fields stays
    # per-field separated)
    schema = wrr.Schema(
        id=wrr.STORED(), f1=wrr.TEXT(stored=False), f2=wrr.TEXT(stored=False),
        f3=wrr.TEXT(stored=False),
    )
    ix = _mk(tmp_path_factory, schema, [{"id": "1", "f1": "alfa", "f2": "alfa", "f3": "alfa"}])
    with ix.searcher() as s:
        assert list(s.lexicon("f1")) == ["alfa"]
        assert list(s.lexicon("f2")) == ["alfa"]
        assert list(s.lexicon("f3")) == ["alfa"]
        assert list(s.documents(f1="alfa")) == [{"id": "1"}]
        assert list(s.documents(f2="alfa")) == [{"id": "1"}]
        assert list(s.documents(f3="alfa")) == [{"id": "1"}]


def test_index_decimals(ray_session, tmp_path_factory):
    # ref test_indexing.py:771-787 (Decimal rejected without
    # decimal_places; accepted with)
    from decimal import Decimal

    schema = wrr.Schema(name=wrr.KEYWORD(stored=True), num=wrr.NUMERIC(int))
    d = str(tmp_path_factory.mktemp("idec1"))
    ix = wrr.create_in(d, schema)
    w = ix.writer(num_shards=2, partition_rows=64)
    with pytest.raises(TypeError):
        w.add_document(name="hello", num=Decimal("3.2"))
    w.cancel()

    schema = wrr.Schema(
        name=wrr.KEYWORD(stored=True), num=wrr.NUMERIC(Decimal, decimal_places=5)
    )
    d = str(tmp_path_factory.mktemp("idec2"))
    ix = wrr.create_in(d, schema)
    with ix.writer(num_shards=2, partition_rows=64) as w:
        w.add_document(name="hello", num=Decimal("3.2"))


def test_all_terms_parse(whoosh):
    # ref test_queries.py:35-40
    from whoosh_reloaded_ray.qparser import QueryParser

    q = QueryParser("a", None).parse('hello b:there c:"my friend"')
    assert sorted(q.all_terms(phrases=False)) == [("a", "hello"), ("b", "there")]
    assert sorted(q.all_terms(phrases=True)) == [
        ("a", "hello"), ("b", "there"), ("c", "friend"), ("c", "my")
    ]


def test_merge_ranges(whoosh):
    # ref test_queries.py:201-238 (normalize range merging / Every
    # absorption)
    from whoosh_reloaded_ray.query import (
        And, Every, NumericRange, Or, Term, TermRange, Variations,
    )

    q = And([TermRange("f1", "a", None), TermRange("f1", None, "z")])
    assert q.normalize() == TermRange("f1", "a", "z")
    q = And([NumericRange("f1", None, "aaaaa"), NumericRange("f1", "zzzzz", None)])
    assert q.normalize() == q
    q = And([TermRange("f1", "a", "z"), TermRange("f1", "b", "x")])
    assert q.normalize() == TermRange("f1", "a", "z")
    q = And([TermRange("f1", "a", "m"), TermRange("f1", "f", "q")])
    assert q.normalize() == TermRange("f1", "f", "m")
    q = Or([TermRange("f1", "a", "m"), TermRange("f1", "f", "q")])
    assert q.normalize() == TermRange("f1", "a", "q")
    q = Or([TermRange("f1", "m", None), TermRange("f1", None, "n")])
    assert q.normalize() == Every("f1")
    q = And([Every("f1"), Term("f1", "a"), Variations("f1", "b")])
    assert q.normalize() == Every("f1")
    q = Or([Term("f1", "q"), TermRange("f1", "m", None), TermRange("f1", None, "n")])
    assert q.normalize() == Every("f1")
    q = And([Or([Term("f1", "a"), Term("f1", "b")]), Every("f1")])
    assert q.normalize() == Every("f1")
    q = And([Term("f1", "a"), And([Or([Every("f1")])])])
    assert q.normalize() == Every("f1")


def test_normalize_compound(whoosh):
    # ref test_queries.py:239-251 (deep same-class flattening)
    from whoosh_reloaded_ray.query import Or, Term

    def oq():
        return Or([Term("a", "a"), Term("a", "b")])

    def nq(level):
        if level == 0:
            return oq()
        return Or([nq(level - 1), nq(level - 1), nq(level - 1)])

    assert nq(5).normalize() == Or([Term("a", "a"), Term("a", "b")])


def test_duplicates_normalize(whoosh):
    # ref test_queries.py:254-272
    from whoosh_reloaded_ray.query import And, Prefix, Term, Variations, Wildcard

    q = And([Term("a", "b"), Term("a", "b")])
    assert q.normalize() == Term("a", "b")
    q = And([Prefix("a", "b"), Prefix("a", "b")])
    assert q.normalize() == Prefix("a", "b")
    q = And([Variations("a", "b"), And([Variations("a", "b"), Term("a", "b")])])
    assert q.normalize() == And([Variations("a", "b"), Term("a", "b")])
    q = And([Term("a", "b"), Prefix("a", "b"), Term("a", "b", boost=1.1)])
    assert q.normalize() == q
    q = And([Wildcard("a", "b"), And([Wildcard("a", "b"), Term("a", "b")])])
    assert q.normalize() == Term("a", "b")


def test_query_copy_hash(whoosh):
    # ref test_queries.py:275-387, adapted to our constructor signatures
    # (SpanNear here is binary a/b like the reference's pre-SpanNear2 form)
    import copy

    from whoosh_reloaded_ray.query import (
        And, ConstantScoreQuery, DisjunctionMax, Every, FuzzyTerm, Not,
        NullQuery, NumericRange, Or, Phrase, Prefix, Require, SpanContains,
        SpanFirst, SpanNear, SpanNot, SpanOr, Term, TermRange, Variations,
        Wildcard,
    )

    def do(q1, q2):
        q1a = copy.deepcopy(q1)
        assert q1 == q1a
        assert hash(q1) == hash(q1a)
        assert q1 != q2

    do(Term("a", "b", boost=1.1), Term("a", "b", boost=1.5))
    do(And([Term("a", "b"), Term("c", "d")], boost=1.1),
       And([Term("a", "b"), Term("c", "d")], boost=1.5))
    do(Or([Term("a", "b", boost=1.1), Term("c", "d")]),
       Or([Term("a", "b", boost=1.8), Term("c", "d")], boost=1.5))
    do(DisjunctionMax([Term("a", "b", boost=1.8), Term("c", "d")]),
       DisjunctionMax([Term("a", "b", boost=1.1), Term("c", "d")], boost=1.5))
    do(Not(Term("a", "b", boost=1.1)), Not(Term("a", "b", boost=1.5)))
    do(Prefix("a", "b", boost=1.1), Prefix("a", "b", boost=1.5))
    do(Wildcard("a", "b*x?", boost=1.1), Wildcard("a", "b*x?", boost=1.5))
    do(FuzzyTerm("a", "b", constantscore=True),
       FuzzyTerm("a", "b", constantscore=False))
    do(FuzzyTerm("a", "b", boost=1.1), FuzzyTerm("a", "b", boost=1.5))
    do(TermRange("a", "b", "c"), TermRange("a", "b", "d"))
    do(TermRange("a", None, "c"), TermRange("a", None, None))
    do(TermRange("a", "b", "c", boost=1.1), TermRange("a", "b", "c", boost=1.5))
    do(TermRange("a", "b", "c", constantscore=True),
       TermRange("a", "b", "c", constantscore=False))
    do(NumericRange("a", 1, 5), NumericRange("a", 1, 6))
    do(NumericRange("a", None, 5), NumericRange("a", None, None))
    do(NumericRange("a", 3, 6, boost=1.1), NumericRange("a", 3, 6, boost=1.5))
    do(NumericRange("a", 3, 6, constantscore=True),
       NumericRange("a", 3, 6, constantscore=False))
    do(Variations("a", "render"), Variations("a", "renders"))
    do(Phrase("a", ["b", "c", "d"]), Phrase("a", ["b", "c", "e"]))
    do(Phrase("a", ["b", "c", "d"], boost=1.1), Phrase("a", ["b", "c", "d"], boost=1.5))
    do(Phrase("a", ["b", "c", "d"], slop=1), Phrase("a", ["b", "c", "d"], slop=2))
    do(Every(), Every("a"))
    do(Every("a"), Every("b"))
    do(Every("a", boost=1.1), Every("a", boost=1.5))
    do(NullQuery, Term("a", "b"))
    do(ConstantScoreQuery(Term("a", "b")), ConstantScoreQuery(Term("a", "c")))
    do(Require(Term("a", "b"), Term("c", "d")),
       Require(Term("a", "b", boost=1.1), Term("c", "d")))
    do(SpanFirst(Term("a", "b"), limit=1), SpanFirst(Term("a", "b"), limit=2))
    do(SpanNear(Term("a", "b"), Term("c", "d")),
       SpanNear(Term("a", "b"), Term("c", "e")))
    do(SpanNear(Term("a", "b"), Term("c", "d"), slop=1),
       SpanNear(Term("a", "b"), Term("c", "d"), slop=2))
    do(SpanNear(Term("a", "b"), Term("c", "d"), mindist=1),
       SpanNear(Term("a", "b"), Term("c", "d"), mindist=2))
    do(SpanNear(Term("a", "b"), Term("c", "d"), ordered=True),
       SpanNear(Term("a", "b"), Term("c", "d"), ordered=False))
    do(SpanNot(Term("a", "b"), Term("a", "c")),
       SpanNot(Term("a", "b"), Term("a", "d")))
    do(SpanOr([Term("a", "b"), Term("a", "c"), Term("a", "d")]),
       SpanOr([Term("a", "b"), Term("a", "c"), Term("a", "e")]))
    do(SpanContains(Term("a", "b"), Term("a", "c")),
       SpanContains(Term("a", "b"), Term("a", "d")))


def test_none_in_compounds(whoosh):
    # ref test_queries.py:561-563
    from whoosh_reloaded_ray.query import And, QueryError, Term

    with pytest.raises(QueryError):
        And([Term("a", "b"), None, Term("c", "d")])


def test_or_nots1(ray_session, tmp_path_factory):
    # ref test_queries.py:482-503 (issue #285)
    from whoosh_reloaded_ray.query import And, Not, Or, Term

    schema = wrr.Schema(a=wrr.KEYWORD(stored=True), b=wrr.KEYWORD(stored=True))
    ix = _mk(tmp_path_factory, schema, [{"a": "alfa", "b": "charlie"}])
    with ix.searcher() as s:
        q = And([
            Term("a", "alfa"),
            Or([Not(Term("b", "bravo")), Not(Term("b", "charlie"))]),
        ])
        assert s.search(q).scored_length() == 1


def test_or_nots2(ray_session, tmp_path_factory):
    # ref test_queries.py:506-517 (issue #286)
    from whoosh_reloaded_ray.query import Not, Or, Term

    schema = wrr.Schema(a=wrr.KEYWORD(stored=True), b=wrr.KEYWORD(stored=True))
    ix = _mk(tmp_path_factory, schema, [{"b": "bravo"}])
    with ix.searcher() as s:
        q = Or([Term("a", "alfa"), Not(Term("b", "alfa"))])
        assert s.search(q).scored_length() == 1


def test_or_nots3(ray_session, tmp_path_factory):
    # ref test_queries.py:520-535
    from whoosh_reloaded_ray.query import Not, Or, Term

    schema = wrr.Schema(title=wrr.TEXT(stored=True), itemtype=wrr.ID(stored=True))
    ix = _mk(tmp_path_factory, schema, [
        {"title": "a1", "itemtype": "a"}, {"title": "a2", "itemtype": "a"},
        {"title": "b1", "itemtype": "b"},
    ])
    q = Or([Term("itemtype", "a"), Not(Term("itemtype", "a"))])
    with ix.searcher() as s:
        r = " ".join(hit["title"] for hit in s.search(q))
        assert r == "a1 a2 b1"


def test_ornot_andnot(ray_session, tmp_path_factory):
    # ref test_queries.py:538-558
    from whoosh_reloaded_ray.qparser import QueryParser

    schema = wrr.Schema(id=wrr.NUMERIC(int), a=wrr.KEYWORD())
    ix = _mk(tmp_path_factory, schema, [
        {"id": 0, "a": "word1 word1"}, {"id": 1, "a": "word1 word2"},
        {"id": 2, "a": "word1 foo"}, {"id": 3, "a": "foo word2"},
        {"id": 4, "a": "foo bar"},
    ])
    with ix.searcher() as s:
        qp = QueryParser("a", s._schema)
        q1 = qp.parse("NOT word1 NOT word2")
        q2 = qp.parse("NOT (word1 OR word2)")
        r1 = [hit["id"] for hit in s.search(q1, sortedby="id")]
        r2 = [hit["id"] for hit in s.search(q2, sortedby="id")]
        assert r1 == r2 == [4]


def test_issue_355(ray_session, tmp_path_factory):
    # ref test_queries.py:566-587 (unparseable / out-of-range numeric Term
    # values match nothing instead of raising)
    from whoosh_reloaded_ray.query import Term

    schema = wrr.Schema(seats=wrr.NUMERIC(int, stored=True))
    ix = _mk(tmp_path_factory, schema, [{"seats": 0}, {"seats": 10}, {"seats": 20}])
    with ix.searcher() as s:
        r1 = [hit["seats"] for hit in s.search(Term("seats", b"maker"), limit=5)]
        r2 = [hit["seats"] for hit in s.search(Term("seats", "maker"), limit=5)]
        r3 = [hit["seats"] for hit in s.search(Term("seats", 260), limit=5)]
        assert r1 == r2 == []
        # our NUMERIC is int64, so 260 is in range and simply matches no doc
        assert r3 == []


def test_sequence_in_and(ray_session, tmp_path_factory):
    # ref test_queries.py:590-606
    from whoosh_reloaded_ray.query import And, Sequence, Term

    schema = wrr.Schema(id=wrr.STORED(), text=wrr.TEXT())
    ix = _mk(tmp_path_factory, schema, [
        {"id": "0", "text": "alfa bravo charlie delta echo"},
        {"id": "1", "text": "bravo charlie delta echo alfa"},
        {"id": "2", "text": "charlie delta echo bravo"},
        {"id": "3", "text": "delta echo charlie"},
        {"id": "4", "text": "echo delta"},
    ])
    with ix.searcher() as s:
        seq = Sequence([Term("text", "echo"), Term("text", "alfa")])
        q = And([Term("text", "bravo"), seq])
        r = s.search(q, limit=4)
        assert r.scored_length() == 1
        assert r[0]["id"] == "1"


def test_andmaybe_parse(ray_session, tmp_path_factory):
    # ref test_queries.py:609-625
    from whoosh_reloaded_ray.qparser import QueryParser

    schema = wrr.Schema(id=wrr.STORED(), text=wrr.TEXT())
    ix = _mk(tmp_path_factory, schema, [
        {"id": "0", "text": "alfa bravo charlie delta echo"},
        {"id": "1", "text": "bravo charlie delta echo alfa"},
        {"id": "2", "text": "charlie delta echo bravo"},
        {"id": "3", "text": "delta echo charlie"},
        {"id": "4", "text": "echo delta"},
    ])
    with ix.searcher() as s:
        q = QueryParser("text", s._schema).parse('bravo ANDMAYBE "echo alfa"')
        r = s.search(q)
        assert r.scored_length() == 3
        assert [hit["id"] for hit in r] == ["1", "2", "0"]


def test_numeric_filter(ray_session, tmp_path_factory):
    # ref test_queries.py:628-649
    from whoosh_reloaded_ray.query import NumericRange, Term

    schema = wrr.Schema(status=wrr.NUMERIC(int), tags=wrr.TEXT())
    ix = _mk(tmp_path_factory, schema, [{"status": -2, "tags": "alfa bravo"}])
    with ix.searcher() as s:
        fq = NumericRange("status", 0, 2)
        assert s.search(fq).scored_length() == 0
        assert s.search(Term("tags", "alfa")).scored_length() == 1
        assert s.search(Term("tags", "alfa"), filter=fq).scored_length() == 0


def test_andnot_reverse(ray_session, tmp_path_factory):
    # ref test_queries.py:652-676 (bitbucket issue 419: AndNot result is
    # insertion-order independent)
    from whoosh_reloaded_ray.query import AndNot, Term

    docs = ["ruby", "sapphire", "ruby + sapphire"]
    q = AndNot(Term("name", "ruby"), Term("name", "sapphire"))
    schema = wrr.Schema(name=wrr.TEXT(stored=True))
    ix = _mk(tmp_path_factory, schema, [{"name": n} for n in docs])
    with ix.searcher() as s:
        names_fw = [hit["name"] for hit in s.search(q, limit=None)]
    schema = wrr.Schema(name=wrr.TEXT(stored=True))
    ix = _mk(tmp_path_factory, schema, [{"name": n} for n in reversed(docs)])
    with ix.searcher() as s:
        names_rv = [hit["name"] for hit in s.search(q, limit=None)]
    assert len(names_fw) == len(names_rv) == 1
    assert names_fw == names_rv


def test_collector_add(ray_session, tmp_path_factory):
    # ref test_collector.py:7-21
    from whoosh_reloaded_ray.query import Term

    schema = wrr.Schema(id=wrr.STORED(), text=wrr.TEXT())
    ix = _mk(tmp_path_factory, schema, [
        {"id": "1", "text": "alfa bravo charlie"},
        {"id": "2", "text": "alfa bravo delta"},
        {"id": "3", "text": "alfa charlie echo"},
    ])
    with ix.searcher() as s:
        assert s.doc_frequency("text", "charlie") == 2
        r = s.search(Term("text", "charlie"))
        assert [hit["id"] for hit in r] == ["1", "3"]
        assert len(r) == 2


def test_filter_that_matches_no_document(ray_session, tmp_path_factory):
    # ref test_collector.py:23-34
    from whoosh_reloaded_ray.query import Every, Term

    schema = wrr.Schema(id=wrr.STORED(), text=wrr.TEXT())
    ix = _mk(tmp_path_factory, schema, [
        {"id": "1", "text": "alfa bravo charlie"},
        {"id": "2", "text": "alfa bravo delta"},
    ])
    with ix.searcher() as s:
        r = s.search(Every(), filter=Term("text", "echo"))
        assert [hit["id"] for hit in r] == []
        assert len(r) == 0


def test_filter_results_count(ray_session, tmp_path_factory):
    # ref test_collector.py:249-267 (len() of a limit-truncated filtered
    # search is the EXACT match count)
    from whoosh_reloaded_ray.query import Term

    schema = wrr.Schema(
        id=wrr.STORED(), django_ct=wrr.ID(stored=True), text=wrr.TEXT()
    )
    ix = _mk(tmp_path_factory, schema, [
        {"id": "1", "django_ct": "app.model1", "text": "alfa bravo charlie"},
        {"id": "2", "django_ct": "app.model1", "text": "alfa bravo delta"},
        {"id": "3", "django_ct": "app.model2", "text": "alfa charlie echo"},
    ])
    with ix.searcher() as s:
        r1 = s.search(Term("django_ct", "app.model1"), limit=None)
        assert len(r1) == 2
        r2 = s.search(Term("text", "alfa"), filter=r1, limit=1)
        assert len(r2) == 2


def test_overlapping_lists(ray_session, tmp_path_factory):
    # ref test_sorting.py:541-575 (allow_overlap FieldFacet: a doc lands
    # in a group per token)
    from whoosh_reloaded_ray.compat import Facets, FieldFacet
    from whoosh_reloaded_ray.query import Every

    schema = wrr.Schema(id=wrr.STORED(), tags=wrr.KEYWORD())
    ix = _mk(tmp_path_factory, schema, [
        {"id": "0", "tags": "alfa bravo charlie"},
        {"id": "1", "tags": "bravo charlie delta"},
        {"id": "2", "tags": "charlie delta echo"},
        {"id": "3", "tags": "delta echo alfa"},
        {"id": "4", "tags": "echo alfa bravo"},
    ])
    expected = {
        "alfa": [0, 3, 4], "bravo": [0, 1, 4], "charlie": [0, 1, 2],
        "delta": [1, 2, 3], "echo": [2, 3, 4],
    }
    with ix.searcher() as s:
        of = FieldFacet("tags", allow_overlap=True)
        r = s.search(Every(), groupedby={"tags": of})
        assert {k: sorted(v) for k, v in r.groups("tags").items()} == expected
        fcts = Facets()
        fcts.add_field("tags", allow_overlap=True)
        r = s.search(Every(), groupedby=fcts)
        assert {k: sorted(v) for k, v in r.groups("tags").items()} == expected


def test_sorted_groups(ray_session, tmp_path_factory):
    # ref test_sorting.py:760-777 (group doc lists in score order)
    from whoosh_reloaded_ray.query import Term

    schema = wrr.Schema(a=wrr.STORED(), b=wrr.TEXT(), c=wrr.ID())
    ix = _mk(tmp_path_factory, schema, [
        {"a": "0", "b": "blah", "c": "apple"},
        {"a": "1", "b": "blah blah", "c": "bear"},
        {"a": "2", "b": "blah blah blah", "c": "apple"},
        {"a": "3", "b": "blah blah blah blah", "c": "bear"},
        {"a": "4", "b": "blah blah blah blah blah", "c": "apple"},
        {"a": "5", "b": "blah blah blah blah blah blah", "c": "bear"},
    ])
    with ix.searcher() as s:
        gs = s.search(Term("b", "blah"), groupedby="c").groups("c")
        assert gs["apple"] == [4, 2, 0]
        assert gs["bear"] == [5, 3, 1]


def test_group_types(ray_session, tmp_path_factory):
    # ref test_sorting.py:779-816 (UnorderedList / Count / Best maptypes,
    # facet-level and search-level)
    from whoosh_reloaded_ray import sorting
    from whoosh_reloaded_ray.query import Term

    schema = wrr.Schema(a=wrr.STORED(), b=wrr.TEXT(), c=wrr.ID())
    ix = _mk(tmp_path_factory, schema, [
        {"a": "0", "b": "blah", "c": "apple"},
        {"a": "1", "b": "blah blah", "c": "bear"},
        {"a": "2", "b": "blah blah blah", "c": "apple"},
        {"a": "3", "b": "blah blah blah blah", "c": "bear"},
        {"a": "4", "b": "blah blah blah blah blah", "c": "apple"},
        {"a": "5", "b": "blah blah blah blah blah blah", "c": "bear"},
        {"a": "6", "b": "blah blah blah blah blah blah blah", "c": "apple"},
    ])
    with ix.searcher() as s:
        q = Term("b", "blah")
        f = sorting.FieldFacet("c", maptype=sorting.UnorderedList)
        gs = s.search(q, groupedby=f).groups()
        assert gs["apple"] == [0, 2, 4, 6]
        assert gs["bear"] == [1, 3, 5]
        f = sorting.FieldFacet("c", maptype=sorting.Count)
        gs = s.search(q, groupedby=f).groups()
        assert gs["apple"] == 4
        assert gs["bear"] == 3
        gs = s.search(q, groupedby="c", maptype=sorting.Count).groups()
        assert gs["apple"] == 4
        assert gs["bear"] == 3
        f = sorting.FieldFacet("c", maptype=sorting.Best)
        gs = s.search(q, groupedby=f).groups()
        assert gs["apple"] == 6
        assert gs["bear"] == 5


def test_compound_sort(ray_session, tmp_path_factory):
    # ref test_sorting.py:1086-1121 (mixed-direction multi-key sort)
    from whoosh_reloaded_ray.compat import FieldFacet
    from whoosh_reloaded_ray.query import Every

    schema = wrr.Schema(
        a=wrr.KEYWORD(stored=True), b=wrr.KEYWORD(stored=True),
        c=wrr.KEYWORD(stored=True),
    )
    alist = "alfa bravo alfa bravo alfa bravo alfa bravo alfa bravo".split()
    blist = "alfa bravo charlie alfa bravo charlie alfa bravo charlie alfa".split()
    clist = "alfa bravo charlie delta echo foxtrot golf hotel india juliet".split()
    ix = _mk(tmp_path_factory, schema, [
        {"a": alist[i], "b": blist[i], "c": clist[i]} for i in range(10)
    ])
    with ix.searcher() as s:
        sortedby = [
            FieldFacet("a"), FieldFacet("b", reverse=True), FieldFacet("c"),
        ]
        r = s.search(Every(), sortedby=sortedby)
        output = [" ".join((hit["a"], hit["b"], hit["c"])) for hit in r]
        assert output == [
            "alfa charlie charlie", "alfa charlie india", "alfa bravo echo",
            "alfa alfa alfa", "alfa alfa golf", "bravo charlie foxtrot",
            "bravo bravo bravo", "bravo bravo hotel", "bravo alfa delta",
            "bravo alfa juliet",
        ]


def test_sort_filter(ray_session, tmp_path_factory):
    # ref test_sorting.py:621-676 (sortedby + filter across multiple
    # segments, before and after optimize)
    import random as _random

    from whoosh_reloaded_ray.query import Every, Term

    schema = wrr.Schema(group=wrr.ID(stored=True), key=wrr.ID(stored=True))
    groups = "alfa bravo charlie".split()
    keys = "abcdefghijklmnopqrstuvwxyz"
    source = [
        {"key": keys[i % len(keys)], "group": groups[i % len(groups)]}
        for i in range(100)
    ]
    source.sort(key=lambda x: (x["key"], x["group"]))
    sample = list(source)
    _random.Random(42).shuffle(sample)

    d = str(tmp_path_factory.mktemp("sortfilter"))
    ix = wrr.create_in(d, schema)
    w = ix.writer(num_shards=2, partition_rows=64)
    for i, fs in enumerate(sample, 1):
        w.add_document(**fs)
        if not i % 26:
            w.commit(merge=False)
            w = ix.writer(num_shards=2, partition_rows=64)
    w.commit()

    expected = [dd for dd in source if dd["group"] == "bravo"]
    fq = Term("group", "bravo")
    with ix.searcher() as s:
        r = s.search(Every(), sortedby=("key", "group"), filter=fq, limit=20)
        assert [h.fields() for h in r] == expected[:20]
        r = s.search(Every(), sortedby=("key", "group"), filter=fq, limit=None)
        assert [h.fields() for h in r] == expected
    ix.optimize()
    with ix.searcher() as s:
        r = s.search(Every(), sortedby=("key", "group"), filter=fq, limit=20)
        assert [h.fields() for h in r] == expected[:20]
        r = s.search(Every(), sortedby=("key", "group"), filter=fq, limit=None)
        assert [h.fields() for h in r] == expected


def test_groups_ignore_limit(ray_session, tmp_path_factory):
    """Reference facet-collector semantics: group maps cover EVERY matched
    doc; the search limit only truncates the hit list (verified against
    live whoosh: 30 docs, limit=10 default -> groups of 15/15)."""
    from whoosh_reloaded_ray.query import Every, Term

    schema = wrr.Schema(g=wrr.ID(stored=True), k=wrr.ID(stored=True))
    ix = _mk(tmp_path_factory, schema, [
        {"g": "even" if i % 2 == 0 else "odd", "k": chr(97 + i % 26)}
        for i in range(30)
    ])
    with ix.searcher() as s:
        r = s.search(Every(), groupedby="g")  # default limit=10
        assert r.scored_length() == 10
        assert {kk: len(v) for kk, v in r.groups("g").items()} == {
            "even": 15, "odd": 15
        }
        g = s.search(Every(), groupedby="g", filter=Term("g", "even"),
                     maptype="count").groups("g")
        assert g == {"even": 15}


def test_query_facet_overlap(ray_session, tmp_path_factory):
    # ref test_sorting.py:251-277 (QueryFacet allow_overlap)
    from whoosh_reloaded_ray.compat import Facets
    from whoosh_reloaded_ray.query import Every, TermRange

    domain = "abcdefghi"
    schema = wrr.Schema(v=wrr.KEYWORD(stored=True), num=wrr.NUMERIC(int, stored=True))
    ix = _mk(tmp_path_factory, schema, [
        {"num": i, "v": f"{ltr} {domain[8 - i]}"} for i, ltr in enumerate(domain)
    ])
    with ix.searcher() as s:
        facets = Facets()
        facets.add_query(
            "myfacet",
            {"a-c": TermRange("v", "a", "c"), "d-f": TermRange("v", "d", "f"),
             "g-i": TermRange("v", "g", "i")},
            allow_overlap=True,
        )
        gr = s.search(Every(), groupedby=facets).groups("myfacet")
        assert {k: sorted(v) for k, v in gr.items()} == {
            "a-c": [0, 1, 2, 6, 7, 8],
            "d-f": [3, 4, 5],
            "g-i": [0, 1, 2, 6, 7, 8],
        }


def test_missing_overlap(ray_session, tmp_path_factory):
    # ref test_sorting.py:312-326 (overlap facet None bucket for docs
    # missing the field)
    from whoosh_reloaded_ray.compat import FieldFacet
    from whoosh_reloaded_ray.query import Every

    schema = wrr.Schema(a=wrr.NUMERIC(int, stored=True), b=wrr.KEYWORD(stored=True))
    ix = _mk(tmp_path_factory, schema, [
        {"a": 0, "b": "one two"}, {"a": 1}, {"a": 2, "b": "two three"},
        {"a": 3}, {"a": 4, "b": "three four"},
    ])
    with ix.searcher() as s:
        facet = FieldFacet("b", allow_overlap=True)
        r = s.search(Every(), groupedby=facet)
        assert {k: sorted(v) for k, v in r.groups().items()} == {
            "one": [0], "two": [0, 2], "three": [2, 4], "four": [4],
            None: [1, 3],
        }


def test_filtered_grouped(ray_session, tmp_path_factory):
    # ref test_sorting.py:978-991 (filter + groupedby + exact len)
    from whoosh_reloaded_ray.query import And, Every, Term

    domain = "alfa bravo charlie delta echo foxtrot".split()
    schema = wrr.Schema(tag=wrr.ID(stored=False), text=wrr.TEXT(stored=True))
    rows = [
        {"tag": str(i % 3), "text": " ".join(ls)}
        for i, ls in enumerate(permutations(domain, 3))
    ]
    ix = _mk(tmp_path_factory, schema, rows)
    with ix.searcher() as s:
        f = And([Term("text", "charlie"), Term("text", "delta")])
        r = s.search(Every(), filter=f, groupedby="tag", limit=None)
        assert len(r) == 24


def test_daterange_facet(ray_session, tmp_path_factory):
    # ref test_sorting.py:395-430 (timedelta buckets, (start,end) keys,
    # None bucket; naive datetimes here — our columns are tz-naive micros)
    from datetime import datetime as dt
    from datetime import timedelta

    from whoosh_reloaded_ray.compat import DateRangeFacet
    from whoosh_reloaded_ray.query import Every

    schema = wrr.Schema(id=wrr.STORED(), date=wrr.DATETIME())
    ix = _mk(tmp_path_factory, schema, [
        {"id": "0", "date": dt(2001, 1, 15)},
        {"id": "1", "date": dt(2001, 1, 10)},
        {"id": "2"},
        {"id": "3", "date": dt(2001, 1, 3)},
        {"id": "4", "date": dt(2001, 1, 8)},
        {"id": "5", "date": dt(2001, 1, 6)},
    ])
    with ix.searcher() as s:
        rf = DateRangeFacet("date", dt(2001, 1, 1), dt(2001, 1, 20), timedelta(days=5))
        r = s.search(Every(), groupedby={"date": rf})
        g = {k: sorted(v) for k, v in r.groups("date").items()}
        assert g == {
            (dt(2001, 1, 1), dt(2001, 1, 6)): [3],
            (dt(2001, 1, 6), dt(2001, 1, 11)): [1, 4, 5],
            (dt(2001, 1, 11), dt(2001, 1, 16)): [0],
            None: [2],
        }


def test_relative_daterange(ray_session, tmp_path_factory):
    # ref test_sorting.py:433-502 (month-granular relativedelta gap)
    from datetime import datetime as dt
    from datetime import timedelta

    from dateutil.relativedelta import relativedelta

    from whoosh_reloaded_ray.compat import DateRangeFacet
    from whoosh_reloaded_ray.query import Every

    rows = []
    basedate, count = dt(2001, 1, 1), 0
    while basedate < dt(2001, 12, 1):
        rows.append({"id": str(count), "date": basedate})
        basedate += timedelta(days=14, hours=16)
        count += 1
    schema = wrr.Schema(id=wrr.STORED(), date=wrr.DATETIME())
    ix = _mk(tmp_path_factory, schema, rows)
    with ix.searcher() as s:
        rf = DateRangeFacet("date", dt(2001, 1, 1), dt(2001, 12, 31),
                            relativedelta(months=1))
        g = {
            k: sorted(v)
            for k, v in s.search(Every(), groupedby={"date": rf}).groups("date").items()
        }
        assert g == {
            (dt(2001, 1, 1), dt(2001, 2, 1)): [0, 1, 2],
            (dt(2001, 2, 1), dt(2001, 3, 1)): [3, 4],
            (dt(2001, 3, 1), dt(2001, 4, 1)): [5, 6],
            (dt(2001, 4, 1), dt(2001, 5, 1)): [7, 8],
            (dt(2001, 5, 1), dt(2001, 6, 1)): [9, 10],
            (dt(2001, 6, 1), dt(2001, 7, 1)): [11, 12],
            (dt(2001, 7, 1), dt(2001, 8, 1)): [13, 14],
            (dt(2001, 8, 1), dt(2001, 9, 1)): [15, 16],
            (dt(2001, 9, 1), dt(2001, 10, 1)): [17, 18],
            (dt(2001, 10, 1), dt(2001, 11, 1)): [19, 20],
            (dt(2001, 11, 1), dt(2001, 12, 1)): [21, 22],
        }


def test_groupby_phrase(ray_session, tmp_path_factory):
    # ref test_sorting.py:884-911
    from whoosh_reloaded_ray.compat import StoredFieldFacet
    from whoosh_reloaded_ray.query import Term

    domain = {
        "Alan Ball": "Tel Aviv", "Alan Charles": "San Francisco",
        "Alan Darwin": "London", "Alan Eames": "Paris",
    }
    schema = wrr.Schema(
        name=wrr.TEXT(stored=True), city=wrr.TEXT(stored=True),
        city_g=wrr.ID(stored=True),
    )
    ix = _mk(tmp_path_factory, schema, [
        {"name": n, "city": c, "city_g": c} for n, c in domain.items()
    ])
    with ix.searcher() as s:
        r = s.search(Term("name", "alan"), groupedby="city_g")
        assert sorted(r.groups().keys()) == [
            "London", "Paris", "San Francisco", "Tel Aviv"
        ]
        r = s.search(Term("name", "alan"), groupedby=StoredFieldFacet("city"))
        assert sorted(r.groups().keys()) == [
            "London", "Paris", "San Francisco", "Tel Aviv"
        ]


def test_sort_text_field(ray_session, tmp_path_factory):
    # ref test_sorting.py:914-975 (sortable TEXT column, reverse, mixed
    # multi-key; single- and multi-segment)
    from whoosh_reloaded_ray.compat import FieldFacet, MultiFacet
    from whoosh_reloaded_ray.query import Every

    domain = (
        ("Visual Display of Quantitative Information, The", 10),
        ("Envisioning Information", 10),
        ("Visual Explanations", 10),
        ("Beautiful Evidence", -10),
        ("Visual and Statistical Thinking", -10),
        ("Cognitive Style of Powerpoint", -10),
    )
    sorted_titles = sorted(d[0] for d in domain)
    schema = wrr.Schema(
        title=wrr.TEXT(stored=True, sortable=True),
        num=wrr.NUMERIC(int, sortable=True),
    )

    def check(ix):
        with ix.searcher() as s:
            r = s.search(Every(), sortedby="title")
            assert [hit["title"] for hit in r] == sorted_titles
            r = s.search(Every(), sortedby=FieldFacet("title", reverse=True))
            assert [hit["title"] for hit in r] == list(reversed(sorted_titles))
            facet = MultiFacet()
            facet.add_field("num")
            facet.add_field("title", reverse=True)
            r = s.search(Every(), sortedby=facet)
            assert [hit["title"] for hit in r] == [
                "Visual and Statistical Thinking",
                "Cognitive Style of Powerpoint",
                "Beautiful Evidence",
                "Visual Explanations",
                "Visual Display of Quantitative Information, The",
                "Envisioning Information",
            ]

    check(_mk(tmp_path_factory, schema, [
        {"title": t, "num": n} for t, n in domain
    ]))
    # multisegment
    d = str(tmp_path_factory.mktemp("stf2"))
    ix = wrr.create_in(d, schema)
    w = ix.writer(num_shards=2, partition_rows=64)
    for t, n in domain[:3]:
        w.add_document(title=t, num=n)
    w.commit(merge=False)
    w = ix.writer(num_shards=2, partition_rows=64)
    for t, n in domain[3:]:
        w.add_document(title=t, num=n)
    w.commit(merge=False)
    check(ix)


def test_query_terms_iter(whoosh):
    # ref test_spelling.py:124-147 (iter_all_terms + all_tokens boosts);
    # deviation: our parse trees carry no source char offsets, so tokens
    # have startchar/endchar None (correct_query locates by word match)
    from whoosh_reloaded_ray.qparser import QueryParser

    qp = QueryParser("a", None)
    q = qp.parse("alfa b:(bravo OR c:charlie) delta")
    assert sorted(q.iter_all_terms()) == [
        ("a", "alfa"), ("a", "delta"), ("b", "bravo"), ("c", "charlie"),
    ]
    q = qp.parse("alfa brav*")
    assert sorted(q.iter_all_terms()) == [("a", "alfa")]
    q = qp.parse('a b:("b c" d)^2 e')
    tokens = [(t.fieldname, t.text, t.boost) for t in q.all_tokens()]
    assert tokens == [
        ("a", "a", 1.0), ("b", "b", 2.0), ("b", "c", 2.0), ("b", "d", 2.0),
        ("a", "e", 1.0),
    ]


def test_decimal_numeric(ray_session, tmp_path_factory):
    # ref test_fields.py:196-221
    from decimal import Decimal

    from whoosh_reloaded_ray.qparser import QueryParser

    schema = wrr.Schema(
        id=wrr.ID(stored=True), deci=wrr.NUMERIC(Decimal, decimal_places=4)
    )
    ix = _mk(tmp_path_factory, schema, [
        {"id": "a", "deci": Decimal("123.56")},
        {"id": "b", "deci": Decimal("0.5362")},
        {"id": "c", "deci": Decimal("2.5255")},
        {"id": "d", "deci": Decimal("58")},
    ])
    with ix.searcher() as s:
        qp = QueryParser("deci", s._schema)
        r = s.search(qp.parse("123.56"))
        assert len(r) == 1 and r[0]["id"] == "a"
        r = s.search(qp.parse("0.5362"))
        assert len(r) == 1 and r[0]["id"] == "b"


def test_numeric_ranges(ray_session, tmp_path_factory):
    # ref test_fields.py:247-272 (inclusive/exclusive numeric range syntax)
    from whoosh_reloaded_ray.qparser import QueryParser

    schema = wrr.Schema(id=wrr.STORED(), num=wrr.NUMERIC(int))
    ix = _mk(
        tmp_path_factory, schema, [{"id": str(i), "num": i} for i in range(400)]
    )
    with ix.searcher() as s:
        qp = QueryParser("num", s._schema)

        def check(qs, target):
            q = qp.parse(qs)
            result = [int(s.stored_fields(d)["id"]) for d in q.docs(s)]
            assert result == target, qs

        check("[10 to 390]", list(range(10, 391)))
        check("[100 to]", list(range(100, 400)))
        check("[to 350]", list(range(0, 351)))
        check("[16 to 255]", list(range(16, 256)))
        check("{10 to 390]", list(range(11, 391)))
        check("[10 to 390}", list(range(10, 390)))
        check("{10 to 390}", list(range(11, 390)))
        check("{16 to 255}", list(range(17, 255)))


def test_decimal_ranges(ray_session, tmp_path_factory):
    # ref test_fields.py:291-323 (decimal_places ranges through the parser)
    from decimal import Decimal

    from whoosh_reloaded_ray.qparser import QueryParser

    schema = wrr.Schema(id=wrr.STORED(), num=wrr.NUMERIC(int, decimal_places=2))
    rows, count, inc = [], Decimal("0.0"), Decimal("0.2")
    for _ in range(500):
        rows.append({"id": str(count), "num": count})
        count += inc
    ix = _mk(tmp_path_factory, schema, rows)
    with ix.searcher() as s:
        qp = QueryParser("num", s._schema)

        def check(qs, start, end):
            q = qp.parse(qs)
            result = [s.stored_fields(d)["id"] for d in q.docs(s)]
            target, c, lim = [], Decimal(start), Decimal(end)
            while c <= lim:
                target.append(str(c))
                c += inc
            assert result == target, qs

        check("[10.2 to 80.8]", "10.2", "80.8")
        check("{10.2 to 80.8]", "10.4", "80.8")
        check("[10.2 to 80.8}", "10.2", "80.6")
        check("{10.2 to 80.8}", "10.4", "80.6")


def test_boolean_strings(ray_session, tmp_path_factory):
    # ref test_fields.py:493-521 (string values at add_document; t/f query
    # words)
    from whoosh_reloaded_ray.qparser import QueryParser

    schema = wrr.Schema(i=wrr.STORED(), b=wrr.BOOLEAN(stored=True))
    ix = _mk(tmp_path_factory, schema, [
        {"i": str(n), "b": v}
        for n, v in enumerate(
            ["true", "True", "false", "False", "true", "True", "false", "False"]
        )
    ])
    with ix.searcher() as s:
        qp = QueryParser("b", s._schema)

        def check(qs, nums):
            r = s.search(qp.parse(qs), limit=None)
            assert [int(hit["i"]) for hit in r] == nums, qs

        trues, falses = [0, 1, 4, 5], [2, 3, 6, 7]
        check("true", trues)
        check("True", trues)
        check("false", falses)
        check("False", falses)
        check("t", trues)
        check("f", falses)


def test_boolean_find_deleted(ray_session, tmp_path_factory):
    # ref test_fields.py:524-572 (delete by boolean term across segments;
    # Every / Not never see deleted docs)
    from whoosh_reloaded_ray.qparser import QueryParser

    domain = "1110001010001110010101000101001011101010001011111101000101010101"
    schema = wrr.Schema(i=wrr.STORED(), b=wrr.BOOLEAN(stored=True))
    d = str(tmp_path_factory.mktemp("bfd"))
    ix = wrr.create_in(d, schema)
    count = 0
    for _ in range(3):
        w = ix.writer(num_shards=2, partition_rows=64)
        for c in domain:
            w.add_document(i=str(count), b=(c == "1"))
            count += 1
        w.commit(merge=False)
    w = ix.writer(num_shards=2, partition_rows=64)
    w.delete_by_term("b", "t")
    with ix.searcher() as s:
        reader = s.reader()
        for docnum in range(s.doc_count_all()):
            assert s.stored_fields(docnum)["b"] == reader.is_deleted(docnum)
        qp = QueryParser("b", s._schema)
        assert s.search(qp.parse("b:t"), limit=None).scored_length() == 0
        for qs in ("*", "*:*", "NOT b:t"):
            r = s.search(qp.parse(qs), limit=None)
            assert not any(hit["b"] for hit in r), qs
            assert not any(reader.is_deleted(hit.docnum) for hit in r), qs
        r = s.search(qp.parse("NOT b:t"), limit=5)
        assert not any(hit["b"] for hit in r)


def test_boolean_multifield(ray_session, tmp_path_factory):
    # ref test_fields.py:575-593 (non-boolean word over a boolean field in
    # a MultifieldParser coerces bool("boop") == True — reference quirk)
    from whoosh_reloaded_ray.qparser import MultifieldParser

    schema = wrr.Schema(name=wrr.TEXT(stored=True), bit=wrr.BOOLEAN(stored=True))
    ix = _mk(tmp_path_factory, schema, [
        {"name": "audi", "bit": True}, {"name": "vw", "bit": False},
        {"name": "porsche", "bit": False}, {"name": "ferrari", "bit": True},
        {"name": "citroen", "bit": False},
    ])
    with ix.searcher() as s:
        q = MultifieldParser(["name", "bit"], s._schema).parse("boop")
        r = s.search(q)
        assert sorted(hit["name"] for hit in r) == ["audi", "ferrari"]
        assert len(r) == 2


def test_nontext_document(ray_session, tmp_path_factory):
    # ref test_fields.py:336-357 (documents() lookups over numeric /
    # datetime / boolean fields; tz-naive datetimes here)
    from datetime import datetime, timedelta

    schema = wrr.Schema(
        id=wrr.STORED(), num=wrr.NUMERIC(int), date=wrr.DATETIME(),
        even=wrr.BOOLEAN(),
    )
    dt = datetime(2020, 3, 1, 12, 30)
    ix = _mk(tmp_path_factory, schema, [
        {"id": str(i), "num": i, "date": dt + timedelta(days=i),
         "even": not (i % 2)}
        for i in range(50)
    ])
    with ix.searcher() as s:
        def check(kwargs, target):
            assert [int(d["id"]) for d in s.documents(**kwargs)] == target

        check({"num": 49}, [49])
        check({"date": dt + timedelta(days=30)}, [30])
        check({"even": True}, list(range(0, 50, 2)))


def test_idlist_search(ray_session, tmp_path_factory):
    # ref test_fields.py:596-610
    from whoosh_reloaded_ray.qparser import QueryParser

    schema = wrr.Schema(paths=wrr.IDLIST(stored=True))
    ix = _mk(tmp_path_factory, schema, [
        {"paths": "here there everywhere"}, {"paths": "here"},
        {"paths": "there"},
    ])
    with ix.searcher() as s:
        r = s.search(QueryParser("paths", s._schema).parse("here"))
        assert sorted(hit["paths"] for hit in r) == [
            "here", "here there everywhere"
        ]


def test_missing_field_lookup(ray_session, tmp_path_factory):
    # ref test_fields.py:613-619 (unknown field raises KeyError)
    schema = wrr.Schema(a=wrr.ID(stored=True))
    ix = _mk(tmp_path_factory, schema, [{"a": "x"}])
    with ix.searcher() as s:
        with pytest.raises(KeyError):
            s.document_numbers(id="test")


def test_phrase_strict(ray_session, tmp_path_factory):
    # ref test_highlighting.py:27-83 (strict_phrase=True highlights only
    # phrase-chain occurrences; exact reference outputs)
    from whoosh_reloaded_ray import highlight as hl
    from whoosh_reloaded_ray.qparser import QueryParser

    schema = wrr.Schema(id=wrr.ID(stored=True), title=wrr.TEXT(stored=True))
    ix = _mk(tmp_path_factory, schema, [
        {"id": "1",
         "title": "strict phrase highlights phrase terms but not individual terms"},
    ])

    def search(s, query_string):
        q = QueryParser("title", s._schema).parse(query_string)
        r = s.search(q, terms=True)
        r.fragmenter = hl.ContextFragmenter()
        r.formatter = hl.UppercaseFormatter()
        return r

    with ix.searcher() as s:
        r = search(s, '"phrase terms"')
        assert [h.highlights("title", strict_phrase=False) for h in r] == [
            "strict PHRASE highlights PHRASE TERMS but not individual...TERMS"
        ]
        assert [h.highlights("title", strict_phrase=True) for h in r] == [
            "phrase highlights PHRASE TERMS but not individual"
        ]

        r = search(s, '"strict highlights terms"~2')
        assert [h.highlights("title", strict_phrase=False) for h in r] == [
            "STRICT phrase HIGHLIGHTS phrase TERMS but not individual...TERMS"
        ]
        assert [h.highlights("title", strict_phrase=True) for h in r] == [
            "STRICT phrase HIGHLIGHTS phrase TERMS but not individual"
        ]

        r = search(s, 'individual AND "phrase terms"')
        assert [h.highlights("title", strict_phrase=False) for h in r] == [
            "strict PHRASE highlights PHRASE TERMS but not INDIVIDUAL TERMS"
        ]
        assert [h.highlights("title", strict_phrase=True) for h in r] == [
            "phrase highlights PHRASE TERMS but not INDIVIDUAL terms"
        ]


def test_unstored_highlight(ray_session, tmp_path_factory):
    # ref test_highlighting.py:225-234 (highlights on an unstored field
    # raises KeyError)
    from whoosh_reloaded_ray.query import Term

    schema = wrr.Schema(text=wrr.TEXT(stored=False), tags=wrr.KEYWORD(stored=False))
    ix = _mk(tmp_path_factory, schema, [
        {"text": "alfa bravo charlie", "tags": "delta echo"}
    ])
    hit = ix.searcher().search(Term("text", "bravo"))[0]
    with pytest.raises(KeyError):
        hit.highlights("tags")


def test_issue324_highlight(whoosh):
    # ref test_highlighting.py:327-336
    from whoosh_reloaded_ray import highlight as hl
    from whoosh_reloaded_ray.functions.analysis import stemming_analyzer

    result = hl.highlight(
        "Indexed!\n1", ["index"], stemming_analyzer(),
        fragmenter=hl.ContextFragmenter(), formatter=hl.UppercaseFormatter(),
    )
    assert result == "INDEXED!\n1"


def test_whole_noterms(ray_session, tmp_path_factory):
    # ref test_highlighting.py:339-363 (WholeFragmenter with a query on a
    # different field: empty at minscore=1, whole text at minscore=0)
    from whoosh_reloaded_ray import highlight as hl
    from whoosh_reloaded_ray.query import Term

    schema = wrr.Schema(text=wrr.TEXT(stored=True), tag=wrr.KEYWORD(stored=False))
    ix = _mk(tmp_path_factory, schema, [
        {"text": "alfa bravo charlie delta echo foxtrot golf", "tag": "foo"}
    ])
    with ix.searcher() as s:
        r = s.search(Term("text", "delta"))
        assert r.scored_length() == 1
        r.fragmenter = hl.WholeFragmenter()
        r.formatter = hl.UppercaseFormatter()
        assert r[0].highlights("text") == "alfa bravo charlie DELTA echo foxtrot golf"

        r = s.search(Term("tag", "foo"))
        assert r.scored_length() == 1
        r.fragmenter = hl.WholeFragmenter()
        r.formatter = hl.UppercaseFormatter()
        assert r[0].highlights("text") == ""
        assert (
            r[0].highlights("text", minscore=0)
            == "alfa bravo charlie delta echo foxtrot golf"
        )


def test_fractional_weights(ray_session, tmp_path_factory):
    # ref test_writing.py:209-238 (DelimitedAttributeFilter boosts become
    # posting weights; Positions and Frequency formats)
    from whoosh_reloaded_ray.analysis import (
        DelimitedAttributeFilter, RegexTokenizer,
    )

    for phrase in (True, False):
        ana = RegexTokenizer(r"\S+") | DelimitedAttributeFilter()
        schema = wrr.Schema(f=wrr.TEXT(analyzer=ana, phrase=phrase))
        ix = _mk(tmp_path_factory, schema, [
            {"f": "alfa^0.5 bravo^1.5 charlie^2.0 delta^1.5"}
        ])
        with ix.searcher() as s:
            wts = [s.postings("f", w).weight() for w in s.lexicon("f")]
            assert wts == [0.5, 1.5, 2.0, 1.5], f"phrase={phrase}"


def test_score_length(ray_session, tmp_path_factory):
    # ref test_searching.py:1664-1689 (postings cursor scores across
    # segments where a field is missing from some docs)
    schema = wrr.Schema(a=wrr.TEXT(), b=wrr.TEXT())
    d = str(tmp_path_factory.mktemp("scorelen"))
    ix = wrr.create_in(d, schema)
    w = ix.writer(num_shards=2, partition_rows=64)
    w.add_document(a="alfa bravo charlie")
    w.add_document(b="delta echo foxtrot")
    w.add_document(a="golf hotel india")
    w.commit(merge=False)
    w = ix.writer(num_shards=2, partition_rows=64)
    w.add_document(b="juliet kilo lima")
    w.add_document(a="mike november oskar")
    w.add_document(b="papa quebec romeo")
    w.commit(merge=False)
    with ix.searcher() as s:
        p = s.postings("a", "mike")
        seen = 0
        while p.is_active():
            assert isinstance(p.id(), int)
            assert p.score() > 0
            p.next()
            seen += 1
        assert seen == 1


def test_cancel_delete(ray_session, tmp_path_factory):
    # ref test_writing.py:241-281 (cancelled deletes never apply; single-
    # and multi-segment)
    schema = wrr.Schema(id=wrr.ID(stored=True))
    for multi in (False, True):
        d = str(tmp_path_factory.mktemp(f"cdel{multi}"))
        ix = wrr.create_in(d, schema)
        if multi:
            for ch in "ABCD":
                w = ix.writer(num_shards=2, partition_rows=64)
                w.add_document(id=ch)
                w.commit(merge=False)
        else:
            w = ix.writer(num_shards=2, partition_rows=64)
            for ch in "ABCD":
                w.add_document(id=ch)
            w.commit()
        with ix.reader() as r:
            assert not r.has_deletions()
        w = ix.writer(num_shards=2, partition_rows=64)
        w.delete_document(2)
        w.delete_document(3)
        w.cancel()
        with ix.reader() as r:
            assert not r.has_deletions()
            assert not r.is_deleted(2)
            assert not r.is_deleted(3)


def test_delete_nonexistant(ray_session, tmp_path_factory):
    # ref test_writing.py:284-314 (deleting a missing docnum raises)
    from whoosh_reloaded_ray.compat import IndexingError

    schema = wrr.Schema(id=wrr.ID(stored=True))
    ix = _mk(tmp_path_factory, schema, [{"id": ch} for ch in "ABC"])
    w = ix.writer(num_shards=2, partition_rows=64)
    with pytest.raises(IndexingError):
        w.delete_document(5)
    w.cancel()


def test_delete_document_applies(ray_session, tmp_path_factory):
    # companion check (reference delete_document semantics): committed
    # deletes ARE applied
    from whoosh_reloaded_ray.query import Every

    schema = wrr.Schema(id=wrr.ID(stored=True))
    ix = _mk(tmp_path_factory, schema, [{"id": ch} for ch in "ABCD"])
    w = ix.writer(num_shards=2, partition_rows=64)
    w.delete_document(1)
    w.commit()
    with ix.searcher() as s:
        assert sorted(h["id"] for h in s.search(Every(), limit=None)) == ["A", "C", "D"]
