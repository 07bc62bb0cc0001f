"""Query-string parser parity: same query strings through our parser +
engine and whoosh's QueryParser + engine must return identical hits.

Covers the reference's default plugin pipeline semantics: default-AND
juxtaposition, AND>OR precedence, NOT prefix, ANDNOT/ANDMAYBE, phrases and
slop, field prefixes, boosts, prefix/wildcard, term/numeric ranges, parens,
Every."""

from __future__ import annotations

from collections import Counter

import numpy as np
import pyarrow.parquet as pq
import pytest

from whoosh_reloaded_ray.query.parser import QueryParser
from whoosh_reloaded_ray.schema import transcript_schema
from whoosh_reloaded_ray.sources.corpus import generate_transcripts
from whoosh_reloaded_ray.state.searcher import IndexSearcher


N_TURNS = 800


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    d = tmp_path_factory.mktemp("pcorpus")
    path = str(d / "transcripts.parquet")
    generate_transcripts(path, n_turns=N_TURNS, avg_turn_words=25, seed=29, rows_per_file=200)
    return path


@pytest.fixture(scope="module")
def our_index(corpus, ray_session, tmp_path_factory):
    from whoosh_reloaded_ray.pipelines.build import build_index

    idx_dir = str(tmp_path_factory.mktemp("pindex"))
    build_index([corpus], idx_dir, num_shards=4, partition_rows=200)
    return IndexSearcher(idx_dir)


@pytest.fixture(scope="module")
def whoosh_index(corpus, whoosh, tmp_path_factory):
    from whoosh import fields, index

    schema = fields.Schema(
        conv_id=fields.ID(stored=True),
        turn_idx=fields.NUMERIC(int, stored=True),
        role=fields.ID(stored=True),
        text=fields.TEXT,
        tool=fields.ID,
        ts=fields.DATETIME,
    )
    d = str(tmp_path_factory.mktemp("pwhoosh"))
    ix = index.create_in(d, schema)
    w = ix.writer(limitmb=256)
    for row in pq.read_table(corpus).to_pylist():
        w.add_document(
            conv_id=row["conv_id"],
            turn_idx=row["turn_idx"],
            role=row["role"],
            text=row["text"],
            tool=row["tool"] or None,
            ts=row["ts"],
        )
    w.commit()
    return ix


@pytest.fixture(scope="module")
def terms(corpus):
    from whoosh_reloaded_ray.functions.analysis import make_analyzer, standard_analyzer

    analyze = make_analyzer(standard_analyzer())
    ctr = Counter()
    for t in pq.read_table(corpus, columns=["text"])["text"].to_pylist():
        ctr.update(tok for tok, _ in analyze(t))
    ordered = [w for w, _ in ctr.most_common()]
    return {
        "hot": ordered[0],
        "mid": ordered[len(ordered) // 8],
        "mid2": ordered[len(ordered) // 6],
        "rare": ordered[len(ordered) // 2],
    }


def _compare(our_index, whoosh_index, whoosh, qstring, limit=10):
    from whoosh.qparser import QueryParser as WQP

    wq = WQP("text", whoosh_index.schema).parse(qstring)
    ours = QueryParser("text", transcript_schema(), fuzzy=True).parse(qstring)
    with whoosh_index.searcher() as s:
        wres = [(h.docnum, h.score) for h in s.search(wq, limit=limit)]
    t = our_index.search(ours, limit=limit)
    ores = list(zip(t["docnum"].to_pylist(), t["score"].to_pylist()))
    assert [d for d, _ in ores] == [d for d, _ in wres], (
        f"{qstring!r}\nparsed ours:   {ours}\nparsed whoosh: {wq!r}\n"
        f"ours: {ores}\ntheirs: {wres}"
    )
    np.testing.assert_allclose(
        [s for _, s in ores], [s for _, s in wres], atol=1e-6, rtol=0
    )


QUERY_TEMPLATES = [
    "{mid}",
    "{mid} {rare}",                      # default AND
    "{mid} AND {rare}",
    "{mid} OR {rare}",
    "{mid} OR {rare} AND {mid2}",        # AND binds tighter
    "{mid} AND {rare} OR {mid2}",
    "NOT {mid} AND {rare}",
    "{mid} ANDNOT {rare}",
    "{mid} ANDMAYBE {rare}",
    "{mid} OR {rare} ANDNOT {mid2}",     # ANDNOT loosest
    '"{mid} {rare}"',
    '"{mid} {rare}"~3',
    "role:user AND {mid}",
    "{mid}^2 OR {rare}",
    "({mid} OR {rare}) AND {mid2}",
    "turn_idx:2 AND {mid}",
    "turn_idx:[1 TO 3] AND {mid}",
    "turn_idx:{{1 TO 4}} AND {mid}",     # exclusive numeric range
    "text:[{mid} TO {mid2}]",
    "{pfx}*",
    "{w1}?{w2}*",
]


def test_parser_parity(our_index, whoosh_index, whoosh, terms):
    vocab = dict(terms)
    vocab["pfx"] = terms["mid"][:3]
    vocab["w1"] = terms["mid"][:2]
    vocab["w2"] = ""
    for tmpl in QUERY_TEMPLATES:
        qstring = tmpl.format(**vocab)
        _compare(our_index, whoosh_index, whoosh, qstring)


def test_parser_structure():
    """Spot-check resolved AST shapes (precedence + flattening)."""
    from whoosh_reloaded_ray.query import And, AndNot, Not, Or, Phrase, Term

    p = QueryParser("text", transcript_schema())
    assert p.parse("a1 b1 c1") == And([Term("text", "a1"), Term("text", "b1"), Term("text", "c1")])
    q = p.parse("a1 OR b1 AND c1")
    assert isinstance(q, Or) and isinstance(q.subqueries[1], And)
    q = p.parse("a1 AND b1 OR c1")
    assert isinstance(q, Or) and isinstance(q.subqueries[0], And)
    q = p.parse("a1 OR b1 ANDNOT c1")
    assert isinstance(q, AndNot) and isinstance(q.a, Or)
    q = p.parse("NOT a1 AND b1")
    assert isinstance(q, And) and isinstance(q.subqueries[0], Not)
    q = p.parse('"x1 y1"~2')
    assert isinstance(q, Phrase) and q.slop == 2
    from whoosh_reloaded_ray.query.ast import NullQuery
    assert p.parse("the") == NullQuery  # stopword removed -> null query (ref-exact)


def test_multifield_parser(ray_session, whoosh, tmp_path_factory):
    """MultifieldParser parity: unfielded words fan out over fields."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from whoosh_reloaded_ray.pipelines.build import build_index
    from whoosh_reloaded_ray.query.parser import MultifieldParser
    from whoosh_reloaded_ray.schema import IndexSchema, id_field, text_field

    rows = [
        ("A", "yellow brown fox", "blue red green"),
        ("B", "alpha beta", "yellow delta"),
        ("C", "one two", "three four"),
        ("D", "quick brown", "every red town"),
    ]
    d = tmp_path_factory.mktemp("mfcorpus")
    path = str(d / "docs.parquet")
    pq.write_table(
        pa.table(
            {
                "key": pa.array([r[0] for r in rows]),
                "name": pa.array([r[1] for r in rows]),
                "value": pa.array([r[2] for r in rows]),
            }
        ),
        path,
    )
    idx = str(tmp_path_factory.mktemp("mfidx"))
    build_index(
        [path], idx,
        schema=IndexSchema(fields=[id_field("key"), text_field("name"), text_field("value")]),
        num_shards=2, partition_rows=8,
    )
    ours_s = IndexSearcher(idx)

    from whoosh import fields, index
    from whoosh.qparser import MultifieldParser as WMFP

    wdir = str(tmp_path_factory.mktemp("mfwhoosh"))
    ix = index.create_in(
        wdir,
        fields.Schema(key=fields.ID(stored=True), name=fields.TEXT, value=fields.TEXT),
    )
    w = ix.writer()
    for k, n, v in rows:
        w.add_document(key=k, name=n, value=v)
    w.commit()

    mfp = MultifieldParser(["name", "value"], transcript_schema_2())
    for qs in ["yellow", "yellow red", "brown OR three", "name:alpha yellow", '"every red"']:
        ours = mfp.parse(qs)
        wq = WMFP(["name", "value"], ix.schema).parse(qs)
        a = ours_s.search(ours, limit=None)
        with ix.searcher() as s:
            theirs = [(h.docnum, h.score) for h in s.search(wq, limit=None)]
        assert a["docnum"].to_pylist() == [d_ for d_, _ in theirs], qs
        np.testing.assert_allclose(
            a["score"].to_pylist(), [sc for _, sc in theirs], atol=1e-6
        )


def transcript_schema_2():
    from whoosh_reloaded_ray.schema import IndexSchema, id_field, text_field

    return IndexSchema(fields=[id_field("key"), text_field("name"), text_field("value")])


def test_simple_parser_parity(our_index, whoosh_index, whoosh, terms):
    """SimpleParser (+/- syntax) parity vs the reference SimpleParser."""
    from whoosh.qparser import SimpleParser as WSP

    from whoosh_reloaded_ray.query.parser import SimpleParser

    for tmpl in (
        "{mid}",
        "{mid} {rare}",              # plain OR group
        "+{mid} {rare}",             # required + optional
        "{mid} -{rare}",             # banned
        "+{mid} +{mid2} -{rare}",
        '+{mid} "{hot} {rare}"',     # phrase node
        "-{mid}",                    # banned only -> no matches
    ):
        qstring = tmpl.format(**terms)
        wq = WSP("text", whoosh_index.schema).parse(qstring)
        ours = SimpleParser("text", __import__(
            "whoosh_reloaded_ray.schema", fromlist=["transcript_schema"]
        ).transcript_schema()).parse(qstring)
        with whoosh_index.searcher() as s:
            wres = [(h.docnum, h.score) for h in s.search(wq, limit=10)]
        t = our_index.search(ours, limit=10)
        ores = list(zip(t["docnum"].to_pylist(), t["score"].to_pylist()))
        assert [d for d, _ in ores] == [d for d, _ in wres], (
            f"{qstring!r}\nours: {ours}\nwhoosh: {wq!r}\n{ores}\n{wres}"
        )
        np.testing.assert_allclose(
            [s for _, s in ores], [s for _, s in wres], atol=1e-6, rtol=0
        )


def test_dismax_parser_parity(our_index, whoosh_index, whoosh, terms):
    """DisMaxParser parity vs the reference DisMaxParser."""
    from whoosh.qparser import DisMaxParser as WDP

    from whoosh_reloaded_ray.query.parser import DisMaxParser
    from whoosh_reloaded_ray.schema import transcript_schema

    boosts = {"text": 1.0, "role": 0.5}
    for tmpl in ("{mid}", "{mid} {rare}", "+{mid} user", "user -{rare}"):
        qstring = tmpl.format(**terms)
        wq = WDP(boosts, whoosh_index.schema).parse(qstring)
        ours = DisMaxParser(boosts, transcript_schema()).parse(qstring)
        with whoosh_index.searcher() as s:
            wres = [(h.docnum, h.score) for h in s.search(wq, limit=10)]
        t = our_index.search(ours, limit=10)
        ores = list(zip(t["docnum"].to_pylist(), t["score"].to_pylist()))
        assert [d for d, _ in ores] == [d for d, _ in wres], (
            f"{qstring!r}\nours: {ours}\nwhoosh: {wq!r}\n{ores}\n{wres}"
        )
        np.testing.assert_allclose(
            [s for _, s in ores], [s for _, s in wres], atol=1e-6, rtol=0
        )


def test_gtlt_parity(our_index, whoosh_index, whoosh, terms):
    """GtLt plugin parity: field:>n etc. against whoosh with GtLtPlugin."""
    from whoosh.qparser import GtLtPlugin
    from whoosh.qparser import QueryParser as WQP

    from whoosh_reloaded_ray.query.parser import QueryParser
    from whoosh_reloaded_ray.schema import transcript_schema

    for tmpl in (
        "turn_idx:>2 AND {mid}",
        "turn_idx:<=1 AND {mid}",
        "turn_idx:>=3 {rare}",
        "text:>{mid} AND text:<{mid2}",
    ):
        qstring = tmpl.format(**terms)
        wp = WQP("text", whoosh_index.schema)
        wp.add_plugin(GtLtPlugin())
        wq = wp.parse(qstring)
        ours = QueryParser("text", transcript_schema(), gtlt=True).parse(qstring)
        with whoosh_index.searcher() as s:
            wres = [(h.docnum, h.score) for h in s.search(wq, limit=10)]
        t = our_index.search(ours, limit=10)
        ores = list(zip(t["docnum"].to_pylist(), t["score"].to_pylist()))
        assert [d for d, _ in ores] == [d for d, _ in wres], (
            f"{qstring!r}\nours: {ours}\nwhoosh: {wq!r}\n{ores}\n{wres}"
        )
        np.testing.assert_allclose(
            [s for _, s in ores], [s for _, s in wres], atol=1e-6, rtol=0
        )


def test_parse_normalization_parity(our_index, whoosh_index, whoosh, terms):
    """Parser-side normalization (CompoundQuery.normalize): duplicate
    clause dedup and overlapping-range union under OR."""
    for tmpl in (
        "{mid} {mid}",                         # duplicate dedup
        "{mid} OR {mid} OR {rare}",
        "text:[{mid} TO {mid2}] OR text:[{mid} TO {rare}]",  # range union
    ):
        _compare(our_index, whoosh_index, whoosh, tmpl.format(**terms))


def test_fieldalias_copyfield(our_index, whoosh_index, whoosh, terms):
    """FieldAliasPlugin + CopyFieldPlugin parity."""
    from whoosh.qparser import CopyFieldPlugin, FieldAliasPlugin
    from whoosh.qparser import QueryParser as WQP

    from whoosh_reloaded_ray.query.parser import QueryParser
    from whoosh_reloaded_ray.schema import transcript_schema

    # aliases: 'speaker' -> role
    wp = WQP("text", whoosh_index.schema)
    wp.add_plugin(FieldAliasPlugin({"role": ["speaker"]}))
    for tmpl in ("speaker:user AND {mid}", "speaker:assistant OR {rare}"):
        qstring = tmpl.format(**terms)
        wq = wp.parse(qstring)
        ours = QueryParser(
            "text", transcript_schema(), fieldaliases={"role": ["speaker"]}
        ).parse(qstring)
        with whoosh_index.searcher() as s:
            wres = [(h.docnum, round(h.score, 6)) for h in s.search(wq, limit=10)]
        t = our_index.search(ours, limit=10)
        ores = [
            (d, round(s, 6))
            for d, s in zip(t["docnum"].to_pylist(), t["score"].to_pylist())
        ]
        assert ores == wres, f"{qstring!r}\n{ours}\n{wq!r}"

    # copyfield: terms in 'role' also searched in 'tool'
    wp2 = WQP("text", whoosh_index.schema)
    wp2.add_plugin(CopyFieldPlugin({"role": "tool"}))
    qstring = f"role:user {terms['mid']}"
    wq = wp2.parse(qstring)
    ours = QueryParser(
        "text", transcript_schema(), copyfields={"role": "tool"}
    ).parse(qstring)
    with whoosh_index.searcher() as s:
        wres = [(h.docnum, round(h.score, 6)) for h in s.search(wq, limit=10)]
    t = our_index.search(ours, limit=10)
    ores = [
        (d, round(s, 6))
        for d, s in zip(t["docnum"].to_pylist(), t["score"].to_pylist())
    ]
    assert ores == wres, f"{qstring!r}\n{ours}\n{wq!r}"


def test_otherwise_query(our_index, whoosh_index, whoosh, terms):
    """Otherwise: a's matches, else b's — decided per segment like the
    reference's per-subsearcher matcher selection."""
    from whoosh import query as wq

    from whoosh_reloaded_ray.query import Otherwise, Term

    # 'zzznope' matches nothing anywhere -> falls back to b in every segment
    q = Otherwise(Term("text", "zzznope"), Term("text", terms["mid"]))
    w = wq.Otherwise(wq.Term("text", "zzznope"), wq.Term("text", terms["mid"]))
    with whoosh_index.searcher() as s:
        wres = [(h.docnum, round(h.score, 6)) for h in s.search(w, limit=10)]
    t = our_index.search(q, limit=10)
    ores = [
        (d, round(s, 6))
        for d, s in zip(t["docnum"].to_pylist(), t["score"].to_pylist())
    ]
    assert ores == wres
    # a matches -> b ignored
    q = Otherwise(Term("text", terms["mid"]), Term("text", terms["hot"]))
    w = wq.Otherwise(wq.Term("text", terms["mid"]), wq.Term("text", terms["hot"]))
    with whoosh_index.searcher() as s:
        wres = [(h.docnum, round(h.score, 6)) for h in s.search(w, limit=10)]
    t = our_index.search(q, limit=10)
    ores = [
        (d, round(s, 6))
        for d, s in zip(t["docnum"].to_pylist(), t["score"].to_pylist())
    ]
    assert ores == wres


def test_datetime_word_parity(our_index, whoosh_index, whoosh, terms):
    """DATETIME word queries: whoosh-style datestrings floor/ceil to
    inclusive ranges (fields.py:876-918)."""
    for tmpl in (
        "ts:2026 AND {mid}",
        "ts:202601 AND {mid}",
        "ts:20260101 AND {mid}",
        "ts:[2026 TO 202601] AND {rare}",
    ):
        _compare(our_index, whoosh_index, whoosh, tmpl.format(**terms))


def test_every_absorption_parity(our_index, whoosh_index, whoosh, terms):
    """Every absorption in normalize: a same-field Every swallows other
    leaves on that field (compound.py:133-170)."""
    for tmpl in (
        "{mid} *",
        "{mid} OR *",
        "role:* AND role:user",
        "{mid} AND role:*",
    ):
        _compare(our_index, whoosh_index, whoosh, tmpl.format(**terms))


def test_fuzzy_prefix_syntax(our_index, whoosh_index, whoosh, terms):
    """~n/m fuzzy syntax with prefix length (FuzzyTermPlugin)."""
    from whoosh.qparser import FuzzyTermPlugin
    from whoosh.qparser import QueryParser as WQP

    from whoosh_reloaded_ray.query.parser import QueryParser
    from whoosh_reloaded_ray.schema import transcript_schema

    bad = terms["mid"][:-1] + ("x" if terms["mid"][-1] != "x" else "q")
    qstring = f"{bad}~2/2"
    wp = WQP("text", whoosh_index.schema)
    wp.add_plugin(FuzzyTermPlugin())
    wq = wp.parse(qstring)
    ours = QueryParser("text", transcript_schema(), fuzzy=True).parse(qstring)
    with whoosh_index.searcher() as s:
        wres = [(h.docnum, round(h.score, 6)) for h in s.search(wq, limit=10)]
    t = our_index.search(ours, limit=10)
    ores = [
        (d, round(s, 6)) for d, s in zip(t["docnum"].to_pylist(), t["score"].to_pylist())
    ]
    assert ores == wres, (qstring, ours, wq)


def test_dateparse_nl_parity(our_index, whoosh_index, whoosh, terms):
    """Natural-language date parsing subset vs the reference
    DateParserPlugin (fixed basedate)."""
    import datetime as dt

    from whoosh.qparser import QueryParser as WQP
    from whoosh.qparser.dateparse import DateParserPlugin

    from whoosh_reloaded_ray.query.parser import QueryParser
    from whoosh_reloaded_ray.schema import transcript_schema

    base = dt.datetime(2026, 1, 1, 12, 0, 0)
    for tmpl in (
        "ts:today AND {mid}",
        "ts:yesterday AND {mid}",
        "ts:'jan 2026' AND {mid}",
        "ts:'1 jan 2026' AND {rare}",
        "ts:[today to tomorrow] AND {mid}",
        "ts:'next friday' OR {rare}",
    ):
        qstring = tmpl.format(**terms)
        wp = WQP("text", whoosh_index.schema)
        wp.add_plugin(DateParserPlugin(basedate=base))
        wq = wp.parse(qstring)
        ours = QueryParser(
            "text", transcript_schema(), dateparse_basedate=base
        ).parse(qstring)
        with whoosh_index.searcher() as s:
            wres = [(h.docnum, round(h.score, 6)) for h in s.search(wq, limit=10)]
        t = our_index.search(ours, limit=10)
        ores = [
            (d, round(s, 6))
            for d, s in zip(t["docnum"].to_pylist(), t["score"].to_pylist())
        ]
        assert ores == wres, f"{qstring!r}\n{ours}\n{wq!r}\n{ores}\n{wres}"


def test_binary_null_rewrites():
    """AndNot/AndMaybe/Require/Otherwise null-side rewrites
    (reference compound.py:530-658) and Not(Null) -> Null."""
    from whoosh_reloaded_ray.query import (
        AndMaybe, AndNot, Not, Or, Otherwise, Require, Term,
    )
    from whoosh_reloaded_ray.query.normalize import normalize

    from whoosh_reloaded_ray.query.ast import NullQuery, _NullQuery

    t = Term("text", "hello")
    null = Or([])  # an empty group normalizes to the NullQuery singleton

    def is_null(q):
        return isinstance(q, _NullQuery) or (isinstance(q, Or) and not q.subqueries)

    assert is_null(normalize(AndNot(null, t)))
    assert normalize(AndNot(t, null)) == t
    assert is_null(normalize(AndMaybe(null, t)))
    assert normalize(AndMaybe(t, null)) == t
    assert is_null(normalize(Require(null, t)))
    assert is_null(normalize(Require(t, null)))
    assert normalize(Otherwise(null, t)) == t
    assert normalize(Otherwise(t, null)) == t
    assert is_null(normalize(Otherwise(null, null)))
    assert is_null(normalize(Not(null)))
    # nested: the null side comes from a collapsed group
    assert normalize(AndNot(t, Or([Or([])]))) == t


def test_group_boost_parity(whoosh):
    """``(...)^N`` group boosts: distributed into children through
    same-class flattening, kept on a different-class group (reference
    GroupNode boost + compound.py:124 flatten)."""
    from whoosh import fields as wf
    from whoosh.qparser import QueryParser as RefQP

    from whoosh_reloaded_ray.query.parser import QueryParser
    from whoosh_reloaded_ray.schema import IndexSchema, text_field

    rp = RefQP("text", wf.Schema(text=wf.TEXT(), title=wf.TEXT()))
    op = QueryParser(
        "text", IndexSchema(fields=[text_field("text"), text_field("title")])
    )

    def canon(q):
        n = type(q).__name__
        if n in ("And", "Or"):
            return (n, round(q.boost, 6), tuple(canon(s) for s in q.subqueries))
        if n == "Phrase":
            return ("Phrase", round(q.boost, 6), tuple(q.words), q.slop)
        if n == "Term":
            f = getattr(q, "fieldname", None) or getattr(q, "field", None)
            return ("Term", f, q.text, round(q.boost, 6))
        if n == "Not":
            sub = getattr(q, "query", None) or getattr(q, "subquery", None)
            return ("Not", canon(sub))
        return (n, repr(q))

    for c in [
        "(alpha beta)^2 gamma", "title:(alpha beta)^3", "(alpha OR beta)^0.5",
        '("alpha beta" gamma)^2', "(alpha beta)^2", "((alpha beta)^2 delta)^3",
        "alpha^2.5 (beta OR gamma)^2", "(alpha AND beta)^2 OR gamma",
        "NOT (alpha beta)^2", "(alpha)^2",
    ]:
        assert canon(op.parse(c)) == canon(rp.parse(c)), c


def test_parser_differential_fuzz(whoosh):
    """Random token-soup differential parse vs the reference: only the
    declared deviations remain (boost-leak artifact, reference crashes,
    null-query representation)."""
    import random

    from whoosh import fields as wf
    from whoosh.qparser import QueryParser as RefQP

    from whoosh_reloaded_ray.query.parser import QueryParser
    from whoosh_reloaded_ray.schema import IndexSchema, numeric_field, text_field

    rp = RefQP("text", wf.Schema(text=wf.TEXT(), title=wf.TEXT(), num=wf.NUMERIC(int, 64)))
    op = QueryParser(
        "text",
        IndexSchema(fields=[text_field("text"), text_field("title"), numeric_field("num")]),
    )

    def canon(q):
        n = type(q).__name__
        if n == "_NullQuery":
            return ("Null",)
        if n in ("And", "Or"):
            subs = tuple(canon(s) for s in q.subqueries)
            return ("Null",) if not subs else (n, round(q.boost, 6), subs)
        if n == "Phrase":
            return ("Phrase", round(q.boost, 6), tuple(q.words), q.slop)
        if n == "Term":
            f = getattr(q, "fieldname", None) or getattr(q, "field", None)
            if isinstance(q.text, bytes):
                return ("NumPoint", f)
            return ("Term", f, q.text, round(q.boost, 6))
        if n == "NumericRange":
            f = getattr(q, "fieldname", None) or getattr(q, "field", None)
            if q.start == q.end and not q.startexcl and not q.endexcl:
                return ("NumPoint", f)
            return ("NumericRange", f, str(q.start), str(q.end), q.startexcl, q.endexcl)
        if n == "Not":
            sub = getattr(q, "query", None) or getattr(q, "subquery", None)
            return ("Not", round(q.boost, 6), canon(sub))
        if n in ("AndNot", "AndMaybe", "Require", "Otherwise"):
            a, b = getattr(q, "a", None), getattr(q, "b", None)
            if a is None and hasattr(q, "subqueries"):
                a, b = q.subqueries
            return (n, canon(a), canon(b))
        if n in ("Prefix", "Wildcard"):
            f = getattr(q, "fieldname", None) or getattr(q, "field", None)
            return (n, f, getattr(q, "text", None) or getattr(q, "pattern", None), round(q.boost, 6))
        if n == "TermRange":
            f = getattr(q, "fieldname", None) or getattr(q, "field", None)
            return ("TermRange", f, q.start, q.end, q.startexcl, q.endexcl)
        if n == "Every":
            return ("Every", getattr(q, "fieldname", None) or getattr(q, "field", None))
        return (n,)

    ATOMS = ["alpha", "beta", "gamma", "delta*", "?lpha", "title:omega",
             "num:5", '"alpha beta"', '"alpha beta"~2', "'sq uote'", "omega^2",
             "[alpha TO beta]", "{alpha TO beta}", "num:[2 TO 8]", "*",
             "title:*", "al*a", "NOT", "AND", "OR", "ANDNOT", "ANDMAYBE",
             "(", ")", "text:(alpha beta)", "(alpha beta)^2", "NOT alpha",
             "and", "not", "andnot"]
    rng = random.Random(7)
    residual = []
    for _ in range(4000):
        s = " ".join(rng.choice(ATOMS) for _ in range(rng.randint(1, 6)))
        try:
            r = canon(rp.parse(s))
        except Exception:
            continue  # declared deviation: we don't replicate crashes
        o = canon(op.parse(s))
        if r != o:
            if "^2" in s and (" AND " in s or " ANDNOT " in s):
                continue  # declared deviation: reference boost-leak
            toks = s.split()
            OPS = {"NOT", "AND", "OR", "ANDNOT", "ANDMAYBE"}
            if any(a in OPS and b in OPS for a, b in zip(toks, toks[1:])):
                continue  # declared: consecutive-operator pathologies
            if any(a == "(" and b in OPS for a, b in zip(toks, toks[1:])):
                continue  # declared: group-leading-operator pathologies
            STOPS = {"and", "or", "not"}
            if any(t in STOPS for t in toks) and any(t in OPS for t in toks):
                continue  # declared: stop-word operand feeding an operator
                # (the reference's whitespace-node mechanics make null
                # operands resolve differently on such malformed input)
            residual.append((s, r, o))
    assert not residual, residual[:5]


# ---------------------------------------------------------------------------
# multitoken_query (reference FieldType.multitoken_query, fields.py:85-124;
# ported from reference tests/test_parsing.py:846-906 and
# tests/test_analysis.py:450-469 test_name_field)
# ---------------------------------------------------------------------------


def _mt_schema(mode):
    from whoosh_reloaded_ray import compat as wrr

    return wrr.Schema(text=wrr.TEXT(multitoken_query=mode)).index_schema


def test_multitoken_default():
    """ref test_parsing.py:846-861: one query word analyzing into several
    tokens builds the parser's group class by default."""
    from whoosh_reloaded_ray.query import And, Term

    schema = _mt_schema("default")
    assert schema.fields[0].multitoken_query == "default"
    q = QueryParser("text", schema).parse("chaw-bacon")
    assert q == And([Term("text", "chaw"), Term("text", "bacon")])


def test_multitoken_or():
    # ref test_parsing.py:863-880
    from whoosh_reloaded_ray.query import Or, Term

    q = QueryParser("text", _mt_schema("or")).parse("chaw-bacon")
    assert q == Or([Term("text", "chaw"), Term("text", "bacon")])


def test_multitoken_phrase():
    # ref test_parsing.py:882-893
    from whoosh_reloaded_ray.query import Phrase

    q = QueryParser("text", _mt_schema("phrase")).parse("chaw-bacon")
    assert isinstance(q, Phrase) and q.words == ("chaw", "bacon")


def test_multitoken_first():
    # reference qparser/default.py:188-190 mode "first"
    from whoosh_reloaded_ray.query import Term

    q = QueryParser("text", _mt_schema("first")).parse("chaw-bacon")
    assert q == Term("text", "chaw")


def test_singlequote_multitoken():
    """ref test_parsing.py:896-906: whitespace-separated words are the
    GROUP (AND) regardless of multitoken mode; a single-quoted 'foo bar'
    is ONE query word that analyzes into two tokens, so the field's
    multitoken_query mode (or) decides."""
    from whoosh_reloaded_ray.query import And, Or, Term

    p = QueryParser("text", _mt_schema("or"))
    assert p.parse("foo bar") == And([Term("text", "foo"), Term("text", "bar")])
    assert p.parse("'foo bar'") == Or([Term("text", "foo"), Term("text", "bar")])


def test_name_field_multitoken(ray_session, tmp_path):
    """ref test_analysis.py:450-469 test_name_field: DoubleMetaphone
    (combine=True) splits one query word into several phonetic tokens;
    multitoken_query="or" makes 'leaf eriksen' find 'Leif Ericson'."""
    from whoosh_reloaded_ray import compat as wrr

    ana = (
        wrr.RegexTokenizer(r"\S+")
        | wrr.LowercaseFilter()
        | wrr.DoubleMetaphoneFilter(combine=True)
    )
    schema = wrr.Schema(
        id=wrr.STORED(), name=wrr.TEXT(analyzer=ana, multitoken_query="or")
    )
    ix = wrr.create_in(str(tmp_path / "names"), schema)
    w = ix.writer()
    w.add_document(id="one", name="Leif Ericson")
    w.commit()

    with ix.searcher() as s:
        q = QueryParser("name", ix.index_schema).parse("leaf eriksen")
        r = s.search(q)
        assert len(r) == 1
