"""Reference tests/test_queries.py ported — the scenarios not already
covered by same-named tests elsewhere (ref line numbers cited per test).

Declared deviations (see Reader.__iter__ / TODO.md):
- reference terms are utf-8 bytes, ours str — assertions compare text;
- simplify() results are compared STRUCTURALLY (same trees the reference
  asserts as strings; str(query) now renders the reference's infix form
  too — see test_searching_ported.py::test_fieldboost).
"""

from __future__ import annotations

import pytest

from whoosh_reloaded_ray import compat as wrr
from whoosh_reloaded_ray.query import ast
from whoosh_reloaded_ray.query.ast import (
    And,
    ConstantScoreQuery,
    FuzzyTerm,
    Not,
    NumericRange,
    Or,
    Phrase,
    Prefix,
    Term,
    TermRange,
    Variations,
    Wildcard,
)
from whoosh_reloaded_ray.query.parser import QueryParser


def _create(tmp_path, name, **fields):
    return wrr.create_in(str(tmp_path / name), wrr.Schema(**fields))


# ref :35 — all_terms over a schemaless parse
def test_all_terms():
    q = QueryParser("a", None).parse('hello b:there c:"my friend"')
    ts = q.all_terms(phrases=False)
    assert sorted(ts) == [("a", "hello"), ("b", "there")]
    ts = q.all_terms(phrases=True)
    assert sorted(ts) == [
        ("a", "hello"),
        ("b", "there"),
        ("c", "friend"),
        ("c", "my"),
    ]


# ref :43 — existing_terms with/without phrases
def test_existing_terms(ray_session, tmp_path):
    ix = _create(tmp_path, "ext", key=wrr.ID, value=wrr.TEXT)
    w = ix.writer()
    w.add_document(key="a", value="alfa bravo charlie delta echo")
    w.add_document(key="b", value="foxtrot golf hotel india juliet")
    w.commit()

    r = ix.reader()
    q = QueryParser("value", None).parse('alfa hotel tango "sierra bravo"')

    ts = q.existing_terms(r, phrases=False)
    assert sorted(ts) == [("value", "alfa"), ("value", "hotel")]

    ts = q.existing_terms(r)
    assert sorted(ts) == [
        ("value", "alfa"),
        ("value", "bravo"),
        ("value", "hotel"),
    ]


# ref :66 — existing_terms(expand=True) over Prefix / TermRange / Variations
def test_wildcard_existing_terms(ray_session, tmp_path):
    ix = _create(tmp_path, "wext", key=wrr.ID, value=wrr.TEXT)
    w = ix.writer()
    w.add_document(key="a", value="alfa bravo bear charlie delta")
    w.add_document(key="a", value="boggle echo render rendering renders")
    w.commit()
    r = ix.reader()
    qp = QueryParser("value", ix.schema)

    def words(terms):
        z = []
        for t in terms:
            assert t[0] == "value"
            z.append(t[1])
        return " ".join(sorted(z))

    q = qp.parse("b*")
    assert q.existing_terms(r) == set()
    assert words(q.existing_terms(r, expand=True)) == "bear boggle bravo"

    q = qp.parse("[a TO f]")
    assert q.existing_terms(r) == set()
    assert (
        words(q.existing_terms(r, expand=True))
        == "alfa bear boggle bravo charlie delta echo"
    )

    q = Variations("value", "render")
    assert q.existing_terms(r, expand=False) == {("value", "render")}
    assert words(q.existing_terms(r, expand=True)) == "render rendering renders"


# ref :103
def test_replace():
    q = And(
        [
            Or([Term("a", "b"), Term("b", "c")], boost=1.2),
            Variations("a", "b", boost=2.0),
        ]
    )
    q = q.replace("a", "b", "BB")
    assert q == And(
        [
            Or([Term("a", "BB"), Term("b", "c")], boost=1.2),
            Variations("a", "BB", boost=2.0),
        ]
    )


# ref :119 — apply() visitor (our nodes are immutable: the visitor REBUILDS
# leaves instead of assigning .text, same trees out)
def test_apply():
    def visit(q):
        if isinstance(q, Term):
            return Term(q.field, q.text.upper(), boost=q.boost)
        if isinstance(q, Variations):
            return Variations(q.field, q.text.upper(), boost=q.boost)
        if isinstance(q, FuzzyTerm):
            return FuzzyTerm(q.field, q.text.upper(), boost=q.boost)
        return q.apply(visit)

    before = And(
        [Not(Term("a", "b")), Variations("a", "c"), Not(FuzzyTerm("a", "d"))]
    )
    after = visit(before)
    assert after == And(
        [Not(Term("a", "B")), Variations("a", "C"), Not(FuzzyTerm("a", "D"))]
    )

    def term2var(q):
        if isinstance(q, Term):
            return Variations(q.field, q.text)
        return q.apply(term2var)

    q = And(
        [Term("f", "alfa"), Or([Term("f", "bravo"), Not(Term("f", "charlie"))])]
    )
    q = term2var(q)
    assert q == And(
        [
            Variations("f", "alfa"),
            Or([Variations("f", "bravo"), Not(Variations("f", "charlie"))]),
        ]
    )


# ref :148 — accept() bottom-up rewrite
def test_accept():
    def boost_phrases(q):
        if isinstance(q, Phrase):
            return Phrase(q.field, list(q.words), slop=q.slop, boost=q.boost * 2.0)
        return q

    before = And(
        [
            Term("a", "b"),
            Or([Term("c", "d"), Phrase("a", ["e", "f"])]),
            Phrase("a", ["g", "h"], boost=0.25),
        ]
    )
    after = before.accept(boost_phrases)
    assert after == And(
        [
            Term("a", "b"),
            Or([Term("c", "d"), Phrase("a", ["e", "f"], boost=2.0)]),
            Phrase("a", ["g", "h"], boost=0.5),
        ]
    )

    before = Phrase("a", ["b", "c"], boost=2.5)
    after = before.accept(boost_phrases)
    assert after == Phrase("a", ["b", "c"], boost=5.0)


# ref :175 — simplify() expands Prefix to existing Terms with its boost
def test_simplify(ray_session, tmp_path):
    ix = _create(tmp_path, "simp", k=wrr.ID, v=wrr.TEXT)
    w = ix.writer()
    w.add_document(k="1", v="aardvark apple allan alfa bear bee")
    w.add_document(k="2", v="brie glue geewhiz goop julia")
    w.commit()

    r = ix.reader()
    q1 = And([Prefix("v", "b", boost=2.0), Term("v", "juliet")])
    q2 = And(
        [
            Or(
                [
                    Term("v", "bear", boost=2.0),
                    Term("v", "bee", boost=2.0),
                    Term("v", "brie", boost=2.0),
                ]
            ),
            Term("v", "juliet"),
        ]
    )
    assert q1.simplify(r) == q2


# ref :254
def test_duplicates():
    q = And([Term("a", "b"), Term("a", "b")])
    assert q.normalize() == Term("a", "b")

    q = And([Prefix("a", "b"), Prefix("a", "b")])
    assert q.normalize() == Prefix("a", "b")

    q = And(
        [Variations("a", "b"), And([Variations("a", "b"), Term("a", "b")])]
    )
    assert q.normalize() == And([Variations("a", "b"), Term("a", "b")])

    q = And([Term("a", "b"), Prefix("a", "b"), Term("a", "b", boost=1.1)])
    assert q.normalize() == q

    # Wildcard without * or ? normalizes to Term
    q = And([Wildcard("a", "b"), And([Wildcard("a", "b"), Term("a", "b")])])
    assert q.normalize() == Term("a", "b")


# ref :387
def test_requires():
    a = Term("f", "a")
    b = Term("f", "b")
    assert And([a, b]).requires() == {a, b}
    assert Or([a, b]).requires() == set()
    assert ast.AndMaybe(a, b).requires() == {a}
    assert a.requires() == {a}


# ref :396 — terms=True highlighting + empty highlights on a DateRange hit
def test_highlight_daterange(ray_session, tmp_path):
    from datetime import datetime

    ix = _create(
        tmp_path,
        "hldr",
        id=wrr.ID(unique=True, stored=True),
        title=wrr.TEXT(stored=True),
        content=wrr.TEXT(stored=True),
        released=wrr.DATETIME(stored=True),
    )
    w = ix.writer()
    w.update_document(
        id="1",
        title="Life Aquatic",
        content="A nautic film crew sets out to kill a gigantic shark.",
        released=datetime(2004, 12, 25),
    )
    w.update_document(
        id="2",
        title="Darjeeling Limited",
        content="Three brothers meet in India for a life changing train journey.",
        released=datetime(2007, 10, 27),
    )
    w.commit()

    s = ix.searcher()
    r = s.search(Term("content", "train"), terms=True)
    assert len(r) == 1
    assert r[0]["id"] == "2"
    assert (
        r[0].highlights("content")
        == 'for a life changing <b class="match term0">train</b> journey'
    )

    r = s.search(ast.DateRange("released", datetime(2007, 1, 1), None))
    assert len(r) == 1
    assert r[0].highlights("content") == ""


# ref :438 — prefix/wildcard/regex simplify + Regex._find_prefix
def test_patterns(ray_session, tmp_path):
    domain = (
        "aaron able acre adage aether after ago ahi aim ajax akimbo "
        "alembic all amiga amount ampere"
    ).split()
    ix = _create(tmp_path, "pat", word=wrr.KEYWORD(stored=True))
    w = ix.writer()
    for word in domain:
        w.add_document(word=word)
    w.commit()

    r = ix.reader()
    assert list(r.field_terms("word")) == domain

    assert list(r.expand_prefix("word", "al")) == ["alembic", "all"]
    q = Prefix("word", "al")
    assert q.simplify(r) == Or([Term("word", "alembic"), Term("word", "all")])

    q = Wildcard("word", "a*[ae]")
    assert q.simplify(r) == Or(
        [Term("word", w) for w in ("able", "acre", "adage", "amiga", "ampere")]
    )
    assert q._find_prefix(q.pattern) == "a"

    q = ast.Regex("word", "am.*[ae]")
    assert q.simplify(r) == Or([Term("word", "amiga"), Term("word", "ampere")])
    assert q._find_prefix(q.text) == "am"

    q = ast.Regex("word", "able|ago")
    assert q.simplify(r) == Or([Term("word", "able"), Term("word", "ago")])
    assert q._find_prefix(q.text) == ""

    # special case: ? may mean "zero occurences"
    q = ast.Regex("word", "ah?i")
    assert q.simplify(r) == Or([Term("word", "ahi"), Term("word", "aim")])
    assert q._find_prefix(q.text) == "a"

    # special case: * may mean "zero occurences"
    q = ast.Regex("word", "ah*i")
    assert q.simplify(r) == Or([Term("word", "ahi"), Term("word", "aim")])
    assert q._find_prefix(q.text) == "a"


# ref :679-910 — the NumericRange constructor-attribute suite (10 trivial
# scenarios collapsed into one parametrized sweep; same assertions)
@pytest.mark.parametrize(
    "args,kw,expect",
    [
        (("number", 10, 5925), {}, {}),
        (
            ("number", 10, 5925),
            dict(startexcl=True, endexcl=True),
            dict(startexcl=True, endexcl=True),
        ),
        (
            ("number", 10, 5925),
            dict(boost=2.0, constantscore=False),
            dict(boost=2.0, constantscore=False),
        ),
        (("number", 0, 0), {}, dict(start=0, end=0)),
        (("number", -1, 1), {}, dict(start=-1, end=1)),
        (("fieldname", 1, -1), {}, dict(start=1, end=-1)),
        (("fieldname", 1.5, 2.5), {}, dict(start=1.5, end=2.5)),
        (
            ("fieldname", 1.5, 2.5),
            dict(startexcl=True, endexcl=True),
            dict(start=1.5, end=2.5, startexcl=True, endexcl=True),
        ),
        (
            ("number", 10, 5925),
            dict(startexcl=True, endexcl=False),
            dict(startexcl=True),
        ),
        (("number", 10, 5925), dict(boost=-1.0), dict(boost=-1.0)),
    ],
)
def test_numeric_range_attributes(args, kw, expect):
    nr = NumericRange(*args, **kw)
    want = dict(
        fieldname=args[0],
        start=args[1],
        end=args[2],
        startexcl=False,
        endexcl=False,
        boost=1.0,
        constantscore=True,
    )
    want.update(expect)
    for k, v in want.items():
        assert getattr(nr, k) == v, k


# fieldname alias holds across leaf types (reference query attribute)
def test_fieldname_alias():
    assert Term("f", "x").fieldname == "f"
    assert TermRange("g", "a", "b").fieldname == "g"
    assert ConstantScoreQuery(Term("f", "x")).fieldname is None
    assert And([Term("f", "x")]).fieldname is None
