"""Reference tests/test_searching.py — the 34 scenarios not already
ported elsewhere, same names / documents / assertions (ref line numbers
in comments).

Declared deviations:
- RamStorage becomes a tmp index dir; RamStorage().open_index ->
  wrr.open_dir on an index-less dir (same EmptyIndexError);
- the query AST is immutable (frozen dataclasses): in-place boost
  mutation in the reference's tree-walk helpers becomes
  dataclasses.replace (our documented apply/accept contract), and
  ``obj.field()`` becomes the ``fieldname`` property;
- test_ors: there is no second "binary matcher" union implementation to
  cross-check (one vectorized union path); instead the Or results are
  checked against an independent per-term score-sum oracle — a strictly
  stronger assertion of the same property;
- test_phrase_score: no public per-doc Phrase matcher cursor; the
  weight ordering is asserted through search scores instead;
- test_pos_scorer / test_weighting: FunctionWeighting's callable takes
  (field, term, docnum, weight) here (documented in scoring.py), so the
  position/stored-field lookups move into the closure — positions come
  from the Searcher.postings cursor's value_as("positions");
- test_buffered_refresh: BufferedWriter searches ARE durable flushes by
  design (compat.py BufferedWriter docstring), so the searcher it hands
  out IS up to date — the reference's `not up_to_date()` flips.
"""

from __future__ import annotations

from datetime import datetime, timedelta
from itertools import permutations

import pytest

from whoosh_reloaded_ray import collectors, compat as wrr, fields, qparser
from whoosh_reloaded_ray import query, scoring, sorting


def _mk(tmp_path_factory, schema, rows, segments=None):
    d = str(tmp_path_factory.mktemp("searchport"))
    ix = wrr.create_in(d, schema)
    if segments is None:
        w = ix.writer()
        for r in rows:
            w.add_document(**r)
        w.commit()
    else:
        for seg in segments:
            w = ix.writer()
            for r in seg:
                w.add_document(**r)
            w.commit(merge=False)
    return ix


def make_index(tmp_path_factory):
    # ref test_searching.py:12-27
    s = wrr.Schema(key=wrr.ID(stored=True), name=wrr.TEXT(), value=wrr.TEXT())
    return _mk(tmp_path_factory, s, [
        dict(key="A", name="Yellow brown", value="Blue red green render purple?"),
        dict(key="B", name="Alpha beta", value="Gamma delta epsilon omega."),
        dict(key="C", name="One two", value="Three rendered four five."),
        dict(key="D", name="Quick went", value="Every red town."),
        dict(key="E", name="Yellow uptown", value="Interest rendering outer photo!"),
    ])


def _get_keys(stored_fields):
    return sorted([d.get("key") for d in stored_fields])


def _docs(q, s):
    return _get_keys([s.stored_fields(docnum) for docnum in q.docs(s)])


def _run_query(tmp_path_factory, q, target):
    ix = make_index(tmp_path_factory)
    with ix.searcher() as s:
        assert target == _docs(q, s)


def test_empty_index(ray_session, tmp_path_factory):
    # ref :44-48 (open_index on an empty storage -> EmptyIndexError)
    d = str(tmp_path_factory.mktemp("emptyix"))
    with pytest.raises(wrr.EmptyIndexError):
        wrr.open_dir(d)


def test_docs_method(ray_session, tmp_path_factory):
    # ref :51-56
    ix = make_index(tmp_path_factory)
    with ix.searcher() as s:
        assert _get_keys(s.documents(name="yellow")) == ["A", "E"]
        assert _get_keys(s.documents(value="red")) == ["A", "D"]
        assert _get_keys(s.documents()) == ["A", "B", "C", "D", "E"]


def test_ors(ray_session, tmp_path_factory):
    # ref :73-95.  Deviation: instead of a second matcher implementation,
    # the union is checked against a per-term score-sum oracle.
    domain = "alfa bravo charlie delta".split()
    s = wrr.Schema(num=wrr.STORED, text=wrr.TEXT())
    ix = _mk(tmp_path_factory, s, [
        dict(num=i, text=" ".join(ls)) for i, ls in enumerate(permutations(domain))
    ])
    with ix.searcher() as s:
        qs = [query.Term("text", word) for word in domain]
        per_term = {
            word: {
                hit.docnum: hit.score
                for hit in s.search(query.Term("text", word), limit=None)
            }
            for word in domain
        }
        for i in range(1, len(domain)):
            q = query.Or(qs[:i])
            r1 = [(hit.docnum, hit.score) for hit in s.search(q, limit=None)]
            acc: dict = {}
            for word in domain[:i]:
                for d, sc in per_term[word].items():
                    acc[d] = acc.get(d, 0.0) + sc
            expected = sorted(acc.items(), key=lambda kv: (-kv[1], kv[0]))
            assert [d for d, _ in r1] == [d for d, _ in expected]
            for (d1, s1), (d2, s2) in zip(r1, expected):
                assert abs(s1 - s2) < 1e-9, (i, d1)


def test_topnot(ray_session, tmp_path_factory):
    # ref :98-100
    _run_query(tmp_path_factory, query.Not(query.Term("value", "red")),
               ["B", "C", "E"])
    _run_query(tmp_path_factory, query.Not(query.Term("name", "yellow")),
               ["B", "C", "D"])


def test_andnot2(ray_session, tmp_path_factory):
    # ref :113-147
    schema = wrr.Schema(a=wrr.ID(stored=True))
    d = str(tmp_path_factory.mktemp("andnot2"))
    ix = wrr.create_in(d, schema)
    w = ix.writer()
    w.add_document(a="bravo")
    w.add_document(a="echo")
    w.add_document(a="juliet")
    w.commit()
    w = ix.writer()
    w.add_document(a="kilo")
    w.add_document(a="foxtrot")
    w.add_document(a="charlie")
    w.commit(merge=False)
    w = ix.writer()
    w.delete_by_term("a", "echo")
    w.add_document(a="alfa")
    w.add_document(a="india")
    w.add_document(a="delta")
    w.commit(merge=False)

    with ix.searcher() as s:
        q = query.TermRange("a", "bravo", "k")
        qr = [hit["a"] for hit in s.search(q)]
        assert " ".join(sorted(qr)) == "bravo charlie delta foxtrot india juliet"

        oq = query.Or([query.Term("a", "bravo"), query.Term("a", "delta")])
        oqr = [hit["a"] for hit in s.search(oq)]
        assert " ".join(sorted(oqr)) == "bravo delta"

        anq = query.AndNot(q, oq)
        r = s.search(anq)
        assert list(anq.docs(s)) == sorted(hit.docnum for hit in r)
        assert " ".join(sorted(hit["a"] for hit in r)) == "charlie foxtrot india juliet"


def test_variations(ray_session, tmp_path_factory):
    # ref :150
    _run_query(tmp_path_factory, query.Variations("value", "render"),
               ["A", "C", "E"])


def test_not2(ray_session, tmp_path_factory):
    # ref :153-177
    schema = wrr.Schema(name=wrr.ID(stored=True), value=wrr.TEXT())
    ix = _mk(tmp_path_factory, schema, [
        dict(name="a", value="alfa bravo charlie delta echo"),
        dict(name="b", value="bravo charlie delta echo foxtrot"),
        dict(name="c", value="charlie delta echo foxtrot golf"),
        dict(name="d", value="delta echo golf hotel india"),
        dict(name="e", value="echo golf hotel india juliet"),
    ])
    p = qparser.QueryParser("value", None)
    with ix.searcher() as s:
        results = s.search(p.parse("echo NOT golf"))
        assert sorted([d["name"] for d in results]) == ["a", "b"]

        results = s.search(p.parse("echo NOT bravo"))
        assert sorted([d["name"] for d in results]) == ["c", "d", "e"]

    ix.delete_by_term("value", "bravo")

    with ix.searcher() as s:
        results = s.search(p.parse("echo NOT charlie"))
        assert sorted([d["name"] for d in results]) == ["d", "e"]


def test_range(ray_session, tmp_path_factory):
    # ref :200-249
    schema = wrr.Schema(id=wrr.ID(stored=True), content=wrr.TEXT())
    ix = _mk(tmp_path_factory, schema, [
        dict(id="A", content="alfa bravo charlie delta echo"),
        dict(id="B", content="bravo charlie delta echo foxtrot"),
        dict(id="C", content="charlie delta echo foxtrot golf"),
        dict(id="D", content="delta echo foxtrot golf hotel"),
        dict(id="E", content="echo foxtrot golf hotel india"),
    ])
    with ix.searcher() as s:
        qp = qparser.QueryParser("content", ix.index_schema)

        q = qp.parse("charlie [delta TO foxtrot]")
        assert q.__class__ == query.And
        assert q[0].__class__ == query.Term
        assert q[1].__class__ == query.TermRange
        assert q[1].start == "delta"
        assert q[1].end == "foxtrot"
        assert not q[1].startexcl
        assert not q[1].endexcl
        ids = sorted([d["id"] for d in s.search(q)])
        assert ids == ["A", "B", "C"]

        q = qp.parse("foxtrot {echo TO hotel]")
        assert q.__class__ == query.And
        assert q[0].__class__ == query.Term
        assert q[1].__class__ == query.TermRange
        assert q[1].start == "echo"
        assert q[1].end == "hotel"
        assert q[1].startexcl
        assert not q[1].endexcl
        ids = sorted([d["id"] for d in s.search(q)])
        assert ids == ["B", "C", "D", "E"]

        q = qp.parse("{bravo TO delta}")
        assert q.__class__ == query.TermRange
        assert q.start == "bravo"
        assert q.end == "delta"
        assert q.startexcl
        assert q.endexcl
        ids = sorted([d["id"] for d in s.search(q)])
        assert ids == ["A", "B", "C"]

        # Shouldn't match anything
        q = qp.parse("[1 to 10]")
        assert q.__class__ == query.TermRange
        assert len(s.search(q)) == 0


def test_open_numeric_ranges(ray_session, tmp_path_factory):
    # ref :252-270
    domain = range(0, 1000, 7)
    schema = wrr.Schema(num=wrr.NUMERIC(stored=True))
    ix = _mk(tmp_path_factory, schema, [dict(num=i) for i in domain])
    qp = qparser.QueryParser("num", ix.index_schema)
    with ix.searcher() as s:
        q = qp.parse("[100 to]")
        r = [hit["num"] for hit in s.search(q, limit=None)]
        assert r == [n for n in domain if n >= 100]

        q = qp.parse("[to 500]")
        r = [hit["num"] for hit in s.search(q, limit=None)]
        assert r == [n for n in domain if n <= 500]


def test_negated_unlimited_ranges(ray_session, tmp_path_factory):
    # ref :273-310 ("[to]" must behave like "*")
    from string import ascii_letters

    schema = wrr.Schema(
        id=wrr.ID(stored=True), num=wrr.NUMERIC(), date=wrr.DATETIME()
    )
    domain = ascii_letters
    dt = datetime(2010, 1, 1)
    ix = _mk(tmp_path_factory, schema, [
        dict(id=letter, num=i, date=dt + timedelta(days=i))
        for i, letter in enumerate(domain)
    ])
    with ix.searcher() as s:
        qp = qparser.QueryParser("id", ix.index_schema)

        nq = qp.parse("NOT [to]")
        assert nq.__class__ == query.Not
        q = nq.subquery
        assert q.__class__ == query.Every
        assert "".join(h["id"] for h in s.search(q, limit=None)) == domain
        assert not list(nq.docs(s))

        nq = qp.parse("NOT num:[to]")
        assert nq.__class__ == query.Not
        q = nq.subquery
        assert q.__class__ == query.NumericRange
        assert q.start is None
        assert q.end is None
        assert "".join(h["id"] for h in s.search(q, limit=None)) == domain
        assert not list(nq.docs(s))

        nq = qp.parse("NOT date:[to]")
        assert nq.__class__ == query.Not
        q = nq.subquery
        assert q.__class__ == query.Every
        assert "".join(h["id"] for h in s.search(q, limit=None)) == domain
        assert not list(nq.docs(s))


def test_keyword_or(ray_session, tmp_path_factory):
    # ref :313-330
    schema = wrr.Schema(a=wrr.ID(stored=True), b=wrr.KEYWORD())
    ix = _mk(tmp_path_factory, schema, [
        dict(a="First", b="ccc ddd"),
        dict(a="Second", b="aaa ddd"),
        dict(a="Third", b="ccc eee"),
    ])
    qp = qparser.QueryParser("b", ix.index_schema)
    with ix.searcher() as s:
        qr = qp.parse("b:ccc OR b:eee")
        assert qr.__class__ == query.Or
        r = s.search(qr)
        assert len(r) == 2
        assert r[0]["a"] == "Third"
        assert r[1]["a"] == "First"


def test_merged(ray_session, tmp_path_factory):
    # ref :333-355 (writer.optimize = True merges to one segment)
    schema = wrr.Schema(id=wrr.ID(stored=True), content=wrr.TEXT())
    d = str(tmp_path_factory.mktemp("merged"))
    ix = wrr.create_in(d, schema)
    with ix.writer() as w:
        w.add_document(id="alfa", content="alfa")
        w.add_document(id="bravo", content="bravo")

    with ix.searcher() as s:
        r = s.search(query.Term("content", "bravo"))
        assert len(r) == 1
        assert r[0]["id"] == "bravo"

    with ix.writer() as w:
        w.add_document(id="charlie", content="charlie")
        w.optimize = True

    assert len(ix._segments()) == 1

    with ix.searcher() as s:
        r = s.search(query.Term("content", "bravo"))
        assert len(r) == 1
        assert r[0]["id"] == "bravo"


def test_multireader(ray_session, tmp_path_factory):
    # ref :358-398
    sc = wrr.Schema(id=wrr.ID(stored=True), content=wrr.TEXT())
    d = str(tmp_path_factory.mktemp("multireader"))
    ix = wrr.create_in(d, sc)
    w = ix.writer()
    for n in ("alfa bravo charlie delta echo foxtrot golf hotel india").split():
        w.add_document(id=n, content=n)
    w.commit()

    with ix.searcher() as s:
        r = s.search(query.Term("content", "bravo"))
        assert len(r) == 1
        assert r[0]["id"] == "bravo"

    w = ix.writer()
    for n in ("juliet kilo lima mike november oscar papa quebec romeo").split():
        w.add_document(id=n, content=n)
    w.commit(merge=False)
    assert len(ix._segments()) == 2

    with ix.searcher() as s:
        r = s.search(query.Term("content", "bravo"))
        assert len(r) == 1
        assert r[0]["id"] == "bravo"


def test_phrase_score(ray_session, tmp_path_factory):
    # ref :431-450.  Deviation: the per-doc Phrase matcher weight walk is
    # asserted through search scores (doc F's doubled phrase must outscore
    # doc A; both positive).
    schema = wrr.Schema(name=wrr.ID(stored=True), value=wrr.TEXT())
    ix = _mk(tmp_path_factory, schema, [
        dict(name="A", value="Little Miss Muffet sat on a tuffet"),
        dict(name="D", value="Gibberish blonk falunk miss muffet sat tuffet garbonzo"),
        dict(name="E", value="Blah blah blah pancakes"),
        dict(name="F", value="Little miss muffet little miss muffet"),
    ])
    with ix.searcher() as s:
        q = query.Phrase("value", ["little", "miss", "muffet"])
        r = s.search(q, limit=None)
        scores = {hit["name"]: hit.score for hit in r}
        assert set(scores) == {"A", "F"}
        assert scores["A"] > 0
        assert scores["F"] > scores["A"]


def test_phrase_multi(ray_session, tmp_path_factory):
    # ref :453-470 (phrase search across many segments must not crash)
    schema = wrr.Schema(id=wrr.STORED, text=wrr.TEXT())
    d = str(tmp_path_factory.mktemp("phrasemulti"))
    ix = wrr.create_in(d, schema)
    domain = "alfa bravo charlie delta echo".split()
    w = None
    for i, ls in enumerate(permutations(domain)):
        if w is None:
            w = ix.writer()
        w.add_document(id=i, text=" ".join(ls))
        if not i % 30:
            w.commit(merge=False)
            w = None
    if w is not None:
        w.commit(merge=False)

    with ix.searcher() as s:
        q = query.Phrase("text", ["alfa", "bravo"])
        _ = s.search(q)


def test_weighting(ray_session, tmp_path_factory):
    # ref :473-505.  Deviation: FunctionWeighting takes
    # (field, term, docnum, weight); the stored-field lookup moves into
    # the closure (docnums are add-order).
    schema = wrr.Schema(id=wrr.ID(stored=True), n_comments=wrr.STORED)
    ix = _mk(tmp_path_factory, schema, [
        dict(id="1", n_comments=5),
        dict(id="2", n_comments=12),
        dict(id="3", n_comments=2),
        dict(id="4", n_comments=7),
    ])
    comments = {0: 5, 1: 12, 2: 2, 3: 7}

    def comment_score(field, term, docnum, weight):
        return comments.get(docnum, 0)

    with ix.searcher(weighting=scoring.FunctionWeighting(comment_score)) as s:
        q = query.TermRange("id", "1", "4", constantscore=False)
        r = s.search(q)
        ids = [fs["id"] for fs in r]
        assert ids == ["2", "4", "1", "3"]


def test_outofdate(ray_session, tmp_path_factory):
    # ref :533-556
    schema = wrr.Schema(id=wrr.ID(stored=True))
    d = str(tmp_path_factory.mktemp("outofdate"))
    ix = wrr.create_in(d, schema)
    w = ix.writer()
    w.add_document(id="1")
    w.add_document(id="2")
    w.commit()

    s = ix.searcher()
    assert s.up_to_date()

    w = ix.writer()
    w.add_document(id="3")
    w.add_document(id="4")

    assert s.up_to_date()
    w.commit()
    assert not s.up_to_date()

    s = s.refresh()
    assert s.up_to_date()
    s.close()


def test_ngram_phrase(ray_session, tmp_path_factory):
    # ref :667-690
    f = wrr.NGRAM(minsize=2, maxsize=2, phrase=True)
    schema = wrr.Schema(text=f, path=wrr.ID(stored=True))
    ix = _mk(tmp_path_factory, schema, [dict(
        text=(
            "高校までは東京"
            "で、大学からは"
            "京大です。"
        ),
        path="sample",
    )])
    with ix.searcher() as s:
        p = qparser.QueryParser("text", ix.index_schema)

        q = p.parse("東京大学")
        assert len(s.search(q)) == 1

        q = p.parse('"東京大学"')
        assert len(s.search(q)) == 0

        q = p.parse('"は東京で"')
        assert len(s.search(q)) == 1


def test_ordered(ray_session, tmp_path_factory):
    # ref :693-717
    domain = "alfa bravo charlie delta echo foxtrot".split(" ")
    schema = wrr.Schema(f=wrr.TEXT(stored=True))
    ix = _mk(tmp_path_factory, schema, [
        dict(f=" ".join(ls)) for ls in permutations(domain)
    ])
    with ix.searcher() as s:
        q = query.Ordered([
            query.Term("f", "alfa"),
            query.Term("f", "charlie"),
            query.Term("f", "echo"),
        ])
        r = s.search(q)
        for hit in r:
            ls = hit["f"].split()
            assert "alfa" in ls
            assert "charlie" in ls
            assert "echo" in ls
            a = ls.index("alfa")
            c = ls.index("charlie")
            e = ls.index("echo")
            assert a < c and c < e, repr(ls)


def test_otherwise(ray_session, tmp_path_factory):
    # ref :720-737
    schema = wrr.Schema(id=wrr.STORED, f=wrr.TEXT())
    ix = _mk(tmp_path_factory, schema, [
        dict(id=1, f="alfa one two"),
        dict(id=2, f="alfa three four"),
        dict(id=3, f="bravo four five"),
        dict(id=4, f="bravo six seven"),
    ])
    with ix.searcher() as s:
        q = query.Otherwise(query.Term("f", "alfa"), query.Term("f", "six"))
        assert [d["id"] for d in s.search(q)] == [1, 2]

        q = query.Otherwise(query.Term("f", "tango"), query.Term("f", "four"))
        assert [d["id"] for d in s.search(q)] == [2, 3]

        q = query.Otherwise(query.Term("f", "tango"), query.Term("f", "nine"))
        assert [d["id"] for d in s.search(q)] == []


def test_fuzzyterm2(ray_session, tmp_path_factory):
    # ref :753-768
    schema = wrr.Schema(id=wrr.STORED, f=wrr.TEXT(spelling=True))
    ix = _mk(tmp_path_factory, schema, [
        dict(id=1, f="alfa bravo charlie delta"),
        dict(id=2, f="bravo charlie delta echo"),
        dict(id=3, f="charlie delta echo foxtrot"),
        dict(id=4, f="delta echo foxtrot golf"),
    ])
    with ix.searcher() as s:
        assert list(s.reader().terms_within("f", "brave", 1)) == ["bravo"]
        q = query.FuzzyTerm("f", "brave")
        assert [d["id"] for d in s.search(q)] == [1, 2]


def test_multireader_not(ray_session, tmp_path_factory):
    # ref :797-833
    schema = wrr.Schema(id=wrr.STORED, f=wrr.TEXT())
    ix = _mk(tmp_path_factory, schema, [
        dict(id=0, f="alfa bravo chralie"),
        dict(id=1, f="bravo chralie delta"),
        dict(id=2, f="charlie delta echo"),
        dict(id=3, f="delta echo foxtrot"),
        dict(id=4, f="echo foxtrot golf"),
    ])
    with ix.searcher() as s:
        q = query.And([query.Term("f", "delta"),
                       query.Not(query.Term("f", "delta"))])
        r = s.search(q)
        assert len(r) == 0

    ix = _mk(tmp_path_factory, schema, None, segments=[
        [dict(id=5, f="alfa bravo chralie"), dict(id=6, f="bravo chralie delta")],
        [dict(id=7, f="charlie delta echo"), dict(id=8, f="delta echo foxtrot")],
        [dict(id=9, f="echo foxtrot golf"), dict(id=10, f="foxtrot golf delta")],
    ])
    assert len(ix._segments()) > 1
    with ix.searcher() as s:
        q = query.And([query.Term("f", "delta"),
                       query.Not(query.Term("f", "delta"))])
        r = s.search(q)
        assert len(r) == 0


def test_boost_phrase(ray_session, tmp_path_factory):
    # ref :836-865.  Deviation: immutable AST -> dataclasses.replace
    # instead of in-place boost mutation.
    from dataclasses import replace

    schema = wrr.Schema(title=wrr.TEXT(field_boost=5.0, stored=True),
                        text=wrr.TEXT())
    domain = "alfa bravo charlie delta".split()
    ix = _mk(tmp_path_factory, schema, [
        dict(title=" ".join(ls), text=" ".join(ls)) for ls in permutations(domain)
    ])
    q = query.Or([
        query.Term("title", "alfa"),
        query.Term("title", "bravo"),
        query.Phrase("text", ["bravo", "charlie", "delta"]),
    ])

    def boost_phrases(q):
        if isinstance(q, query.Phrase):
            return replace(q, boost=q.boost * 1000.0)
        else:
            return q.apply(boost_phrases)

    q = boost_phrases(q)

    with ix.searcher() as s:
        r = s.search(q, limit=None)
        for hit in r:
            if "bravo charlie delta" in hit["title"]:
                assert hit.score > 100.0


def test_fieldboost(ray_session, tmp_path_factory):
    # ref :868-903.  Deviation: field() -> fieldname property,
    # deepcopy+mutate -> dataclasses.replace.
    from dataclasses import replace

    schema = wrr.Schema(id=wrr.STORED, a=wrr.TEXT(), b=wrr.TEXT())
    ix = _mk(tmp_path_factory, schema, [
        dict(id=0, a="alfa bravo charlie", b="echo foxtrot india"),
        dict(id=1, a="delta bravo charlie", b="alfa alfa alfa"),
        dict(id=2, a="alfa alfa alfa", b="echo foxtrot india"),
        dict(id=3, a="alfa sierra romeo", b="alfa tango echo"),
        dict(id=4, a="bravo charlie delta", b="alfa foxtrot india"),
        dict(id=5, a="alfa alfa echo", b="tango tango tango"),
        dict(id=6, a="alfa bravo echo", b="alfa alfa tango"),
    ])

    def field_booster(fieldname, factor=2.0):
        def booster_fn(obj):
            if obj.is_leaf() and obj.fieldname == fieldname:
                return replace(obj, boost=obj.boost * factor)
            else:
                return obj

        return booster_fn

    with ix.searcher() as s:
        q = query.Or([query.Term("a", "alfa"), query.Term("b", "alfa")])
        q = q.accept(field_booster("a", 100.0))
        assert str(q) == "(a:alfa^100.0 OR b:alfa)"
        r = s.search(q)
        assert [hit["id"] for hit in r] == [2, 5, 6, 3, 0, 1, 4]


def test_scorer(ray_session, tmp_path_factory):
    # ref :906-930 (reference body is mostly commented out: builds a
    # two-segment index; the DebugModel block is disabled there too)
    schema = wrr.Schema(key=wrr.TEXT(stored=True))
    ix = _mk(tmp_path_factory, schema, None, segments=[
        [dict(key="alfa alfa alfa"), dict(key="alfa alfa alfa alfa"),
         dict(key="alfa alfa")],
        [dict(key="alfa alfa alfa alfa alfa alfa"), dict(key="alfa"),
         dict(key="alfa alfa alfa alfa alfa")],
    ])
    with ix.searcher() as s:
        assert len(s.search(query.Term("key", "alfa"), limit=None)) == 6


def test_pos_scorer(ray_session, tmp_path_factory):
    # ref :933-957.  Deviation: FunctionWeighting takes
    # (field, term, docnum, weight); first positions come from the
    # Searcher.postings cursor (value_as("positions")).
    ana = wrr.SimpleAnalyzer()
    schema = wrr.Schema(id=wrr.STORED, key=wrr.TEXT(analyzer=ana))
    ix = _mk(tmp_path_factory, schema, None, segments=[
        [dict(id=0, key="0 0 1 0 0 0"), dict(id=1, key="0 0 0 1 0 0"),
         dict(id=2, key="0 1 0 0 0 0")],
        [dict(id=3, key="0 0 0 0 0 1"), dict(id=4, key="1 0 0 0 0 0"),
         dict(id=5, key="0 0 0 0 1 0")],
    ])
    with ix.searcher() as s0:
        cursor = s0.postings("key", "1")
        first_pos = {}
        while cursor.is_active():
            first_pos[cursor.id()] = cursor.value_as("positions")[0]
            cursor.next()

    def pos_score_fn(field, term, docnum, weight):
        return 1.0 / (first_pos[docnum] + 1)

    with ix.searcher(weighting=scoring.FunctionWeighting(pos_score_fn)) as s:
        r = s.search(query.Term("key", "1"))
        assert [hit["id"] for hit in r] == [4, 2, 0, 1, 5, 3]


_COLLAPSE_DOMAIN = [
    # id, text, size, tag (ref :960-972)
    ("a", "blah blah blah", 5, "x"),
    ("b", "blah", 3, "y"),
    ("c", "blah blah blah blah", 2, "z"),
    ("d", "blah blah", 4, "x"),
    ("e", "bloop", 1, "-"),
    ("f", "blah blah blah blah blah", 6, "x"),
    ("g", "blah", 8, "w"),
    ("h", "blah blah", 7, "="),
]


def _collapse_checks(s):
    q = query.Term("text", "blah")
    r = s.search(q, limit=None)
    assert " ".join(hit["id"] for hit in r) == "f c a d h b g"

    col = s.collector(limit=3)
    col = collectors.CollapseCollector(col, "tag")
    s.search_with_collector(q, col)
    r = col.results()
    assert " ".join(hit["id"] for hit in r) == "f c h"

    col = s.collector(limit=None)
    col = collectors.CollapseCollector(col, "tag")
    s.search_with_collector(q, col)
    r = col.results()
    assert " ".join(hit["id"] for hit in r) == "f c h b g"

    r = s.search(query.Every(), sortedby="size")
    assert " ".join(hit["id"] for hit in r) == "e c b d a f h g"

    col = s.collector(sortedby="size")
    col = collectors.CollapseCollector(col, "tag")
    s.search_with_collector(query.Every(), col)
    r = col.results()
    assert " ".join(hit["id"] for hit in r) == "e c b d h g"


def test_collapse(ray_session, tmp_path_factory):
    # ref :975-1020 (column variant; columns are native Parquet here)
    schema = wrr.Schema(id=wrr.STORED, text=wrr.TEXT(),
                        size=wrr.NUMERIC(sortable=True),
                        tag=wrr.KEYWORD(sortable=True))
    ix = _mk(tmp_path_factory, schema, [
        dict(id=i, text=t, size=sz, tag=tg) for i, t, sz, tg in _COLLAPSE_DOMAIN
    ])
    with ix.searcher() as s:
        _collapse_checks(s)


def test_collapse_nocolumn(ray_session, tmp_path_factory):
    # ref :1023-1065
    schema = wrr.Schema(id=wrr.STORED, text=wrr.TEXT(),
                        size=wrr.NUMERIC(), tag=wrr.KEYWORD())
    ix = _mk(tmp_path_factory, schema, [
        dict(id=i, text=t, size=sz, tag=tg) for i, t, sz, tg in _COLLAPSE_DOMAIN
    ])
    with ix.searcher() as s:
        _collapse_checks(s)


_LEN_DOMAIN = (
    "alfa apple agnostic aplomb arc "
    "bravo big braid beer "
    "charlie crouch car "
    "delta dog "
    "echo "
    "foxtrot fold flip "
    "golf gym goop"
).split()


def _collapse_length_checks(s):
    q = query.Every()

    def check(r):
        words = " ".join(hit["word"] for hit in r)
        assert words == "alfa bravo charlie delta echo foxtrot golf"
        assert r.scored_length() == 7
        assert len(r) == 7

    check(s.search(q, collapse="key", collapse_limit=1, limit=None))
    check(s.search(q, collapse="key", collapse_limit=1, limit=50))
    check(s.search(q, collapse="key", collapse_limit=1, limit=10))


def test_collapse_length(ray_session, tmp_path_factory):
    # ref :1068-1095
    schema = wrr.Schema(key=wrr.ID(sortable=True), word=wrr.ID(stored=True))
    ix = _mk(tmp_path_factory, schema,
             [dict(key=word[0], word=word) for word in _LEN_DOMAIN])
    with ix.searcher() as s:
        _collapse_length_checks(s)


def test_collapse_length_nocolumn(ray_session, tmp_path_factory):
    # ref :1098-1125
    schema = wrr.Schema(key=wrr.ID(), word=wrr.ID(stored=True))
    ix = _mk(tmp_path_factory, schema,
             [dict(key=word[0], word=word) for word in _LEN_DOMAIN])
    with ix.searcher() as s:
        _collapse_length_checks(s)


_ORDER_ROWS = [
    dict(id="a", price=10, rating=1, tag="x"),
    dict(id="b", price=80, rating=3, tag="y"),
    dict(id="c", price=60, rating=1, tag="z"),
    dict(id="d", price=30, rating=2),
    dict(id="e", price=50, rating=3, tag="x"),
    dict(id="f", price=20, rating=1, tag="y"),
    dict(id="g", price=50, rating=2, tag="z"),
    dict(id="h", price=90, rating=5),
    dict(id="i", price=50, rating=5, tag="x"),
    dict(id="j", price=40, rating=1, tag="y"),
    dict(id="k", price=50, rating=4, tag="z"),
    dict(id="l", price=70, rating=2),
]


def _collapse_order_checks(s):
    def check(kwargs, target):
        r = s.search(query.Every(), limit=None, **kwargs)
        assert " ".join(hit["id"] for hit in r) == target

    price = sorting.FieldFacet("price", reverse=True)
    rating = sorting.FieldFacet("rating", reverse=True)
    tag = sorting.FieldFacet("tag")

    check({"sortedby": price}, "h b l c e g i k j d f a")
    check({"sortedby": price, "collapse": tag}, "h b l c e d")
    check(
        {"sortedby": price, "collapse": tag, "collapse_order": rating},
        "h b l i k d",
    )


def test_collapse_order(ray_session, tmp_path_factory):
    # ref :1128-1165
    schema = wrr.Schema(id=wrr.STORED, price=wrr.NUMERIC(sortable=True),
                        rating=wrr.NUMERIC(sortable=True),
                        tag=wrr.ID(sortable=True))
    ix = _mk(tmp_path_factory, schema, _ORDER_ROWS)
    with ix.searcher() as s:
        _collapse_order_checks(s)


def test_collapse_order_nocolumn(ray_session, tmp_path_factory):
    # ref :1168-1205
    schema = wrr.Schema(id=wrr.STORED, price=wrr.NUMERIC(),
                        rating=wrr.NUMERIC(), tag=wrr.ID())
    ix = _mk(tmp_path_factory, schema, _ORDER_ROWS)
    with ix.searcher() as s:
        _collapse_order_checks(s)


def test_keyword_search(ray_session, tmp_path_factory):
    # ref :1208-1216
    schema = wrr.Schema(tags=wrr.KEYWORD())
    ix = _mk(tmp_path_factory, schema, [
        dict(tags="keyword1 keyword2 keyword3 keyword4 keyword5"),
    ])
    with ix.searcher() as s:
        r = s.search_page(query.Term("tags", "keyword3"), 1)
        assert r


def test_buffered_refresh(ray_session, tmp_path_factory):
    # ref :1219-1232.  Deviation: this BufferedWriter's searcher() is a
    # durable flush (declared design deviation), so it IS up to date.
    schema = wrr.Schema(foo=wrr.ID())
    d = str(tmp_path_factory.mktemp("bufrefresh"))
    ix = wrr.create_in(d, schema)
    with wrr.BufferedWriter(ix, period=1000) as writer:
        writer.add_document(foo="1")
        writer.add_document(foo="2")

        with writer.searcher() as searcher:
            assert searcher.doc_count() == 2
            assert searcher.up_to_date()  # deviation (reference: False)
            searcher = searcher.refresh()
            assert searcher.doc_count() == 2


def test_issue_334(ray_session, tmp_path_factory):
    # ref :1235-1286 (writer.group() + NestedChildren & Term)
    schema = wrr.Schema(
        kind=wrr.ID(stored=True),
        name=wrr.ID(stored=True),
        returns=wrr.ID(stored=True),
    )
    d = str(tmp_path_factory.mktemp("issue334"))
    ix = wrr.create_in(d, schema)
    with ix.writer() as w:
        with w.group():
            w.add_document(kind="class", name="Index")
            w.add_document(kind="method", name="add document", returns="void")
            w.add_document(kind="method", name="add reader", returns="void")
            w.add_document(kind="method", name="close", returns="void")
        with w.group():
            w.add_document(kind="class", name="Accumulator")
            w.add_document(kind="method", name="add", returns="void")
            w.add_document(kind="method", name="get result", returns="number")
        with w.group():
            w.add_document(kind="class", name="Calculator")
            w.add_document(kind="method", name="add", returns="number")
            w.add_document(kind="method", name="add all", returns="number")
            w.add_document(kind="method", name="add some", returns="number")
            w.add_document(kind="method", name="multiply", returns="number")
            w.add_document(kind="method", name="close", returns="void")
        with w.group():
            w.add_document(kind="class", name="Deleter")
            w.add_document(kind="method", name="add", returns="void")
            w.add_document(kind="method", name="delete", returns="void")

    with ix.searcher() as s:
        pq = query.Term("kind", "class")
        cq = query.Term("name", "Calculator")

        q = query.NestedChildren(pq, cq) & query.Term("returns", "void")
        r = s.search(q)
        assert len(r) == 1
        assert r[0]["name"] == "close"
