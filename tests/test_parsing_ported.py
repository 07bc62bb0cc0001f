"""Reference tests/test_parsing.py ported (the scenarios not already
covered by test_parser.py / test_parser_plugins.py / the 8000-string
differential fuzz).

The reference asserts both tagger-stage node reprs and final parse
results; our parser has no exposed tagger stage, so every scenario is
asserted at the parse level — the observable contract.  Scenario names and
inputs are the reference's (ref tests/test_parsing.py line numbers cited
per test)."""

from __future__ import annotations

import pytest

from whoosh_reloaded_ray import compat as wrr
from whoosh_reloaded_ray.query import ast as wrr_ast
from whoosh_reloaded_ray.qparser import (
    DisMaxParser,
    MultifieldParser,
    QueryParser,
    SimpleParser,
)
from whoosh_reloaded_ray.query import (
    And,
    AndMaybe,
    AndNot,
    ColumnQuery,
    Every,
    Not,
    NumericRange,
    Or,
    Phrase,
    Prefix,
    Require,
    Term,
    TermRange,
    Wildcard,
)


def _schema(**kw):
    return wrr.Schema(**kw).index_schema


# --- tokenizer-level scenarios asserted at parse level ---------------------


def test_singlequotes():
    # ref :13-20 + :380-430 test_singlequotes_query
    p = QueryParser("t", None)
    q = p.parse("a 'b c' d")
    assert q == And([Term("t", "a"), Term("t", "b c"), Term("t", "d")])


def test_sq_range():
    # ref :42-52: quoted endpoints may hold spaces and bracket chars
    p = QueryParser("t", None)
    q = p.parse("['a b' to 'c d']")
    assert q == TermRange("t", "a b", "c d", constantscore=True)


def test_groups_with_range():
    # ref :85-109 (gtlt + range + groups); asserted as resolved queries
    p = QueryParser("a", None, gtlt=True)
    q = p.parse("a:b OR e:>=5 g:<6")
    assert isinstance(q, And)
    assert isinstance(q.subqueries[0], Or)
    inner = q.subqueries[0]
    assert inner.subqueries[0] == Term("a", "b")
    r1 = inner.subqueries[1]
    assert isinstance(r1, TermRange) and (r1.start, r1.end) == ("5", None)
    r2 = q.subqueries[1]
    assert isinstance(r2, TermRange)
    assert (r2.start, r2.end, r2.endexcl) == (None, "6", True)


def test_fieldnames():
    # ref :112-123: nested field groups, innermost wins; dangling "j:" is a
    # plain word; "a:b:" keeps the trailing colon in the term
    p = QueryParser("t", None)
    q = p.parse("a:b c d:(e f:(g h)) i j:")
    assert q == And([
        Term("a", "b"), Term("t", "c"), Term("d", "e"), Term("f", "g"),
        Term("f", "h"), Term("t", "i"), Term("t", "j:"),
    ])
    assert p.parse("a:b:") == Term("a", "b:")


def test_fieldname_fieldname():
    # ref :941-943
    assert QueryParser("a", None).parse("a:b:") == Term("a", "b:")


def test_colonspace():
    # ref :232-259: "field:" followed by a SPACE is not a field prefix
    s = _schema(content=wrr.TEXT(), url=wrr.ID())
    qp = QueryParser("content", s)
    assert qp.parse("url:test") == Term("url", "test")
    q = qp.parse("url: test")
    assert q == And([Term("content", "url"), Term("content", "test")])
    assert qp.parse("url:") == Term("content", "url")

    s2 = _schema(foo=wrr.KEYWORD())
    q = QueryParser("foo", s2).parse("blah:")
    assert q == Term("foo", "blah:")


def test_andor():
    # ref :262-276
    qp = QueryParser("a", None)
    q = qp.parse("a AND b OR c AND d OR e AND f")
    assert isinstance(q, Or) and len(q.subqueries) == 3
    assert all(isinstance(s, And) for s in q.subqueries)
    assert qp.parse("aORb") == Term("a", "aORb")
    assert qp.parse("aOR b") == And([Term("a", "aOR"), Term("a", "b")])
    assert qp.parse("a ORb") == And([Term("a", "a"), Term("a", "ORb")])
    assert qp.parse("OR") == Term("a", "OR")


def test_boost_query():
    # ref :306-319: terminal-only boost; detached "^n" is a word
    qp = QueryParser("content", None)
    q = qp.parse("this^3 fn:that^0.5 5.67 hi^5x")
    subs = q.subqueries
    assert subs[0] == Term("content", "this", boost=3.0)
    assert subs[1] == Term("fn", "that", boost=0.5)
    assert subs[2] == Term("content", "5.67")
    assert subs[3] == Term("content", "hi^5x")

    q = qp.parse("alfa (bravo OR charlie)^2.5 ^3")
    assert len(q.subqueries) == 3
    assert q.subqueries[0].boost == 1.0
    assert q.subqueries[1].boost == 2.5
    assert q.subqueries[2] == Term("content", "^3")


def test_boost_directionality():
    # ref :134-154 test_boost tagger scenarios, parse-level
    qp = QueryParser("t", None)
    assert qp.parse("a^3") == Term("t", "a", boost=3.0)
    assert qp.parse("^2 a") == And([Term("t", "^2"), Term("t", "a")])
    assert qp.parse("a^2^3") == Term("t", "a^2", boost=3.0)
    q = qp.parse("a (b c)^2.5 d")
    # group boost distributes into the children (reference compound
    # normalize semantics)
    assert q.subqueries[1] == Term("t", "b", boost=2.5)
    assert q.subqueries[2] == Term("t", "c", boost=2.5)


def test_parse_fieldname_underscores():
    # ref :360-366
    s = _schema(my_name=wrr.ID(stored=True), my_value=wrr.TEXT())
    q = QueryParser("my_value", s).parse("my_name:Green")
    assert q == Term("my_name", "Green")


def test_endstar():
    # ref :369-377
    qp = QueryParser("text", None)
    assert qp.parse("word*") == Prefix("text", "word")
    q = qp.parse("first* second")
    assert q.subqueries[0] == Prefix("text", "first")


def test_singlequotes_query():
    # ref :380-430
    qp = QueryParser("text", None)
    q = qp.parse("hell's hot 'i stab at thee'")
    assert [t.text for t in q.subqueries] == ["hell's", "hot", "i stab at thee"]

    q = qp.parse("alfa zulu:'bravo charlie' delta")
    assert q == And([
        Term("text", "alfa"), Term("zulu", "bravo charlie"), Term("text", "delta"),
    ])

    q = qp.parse("The rest 'is silence")
    assert [t.text for t in q.subqueries] == ["The", "rest", "'is", "silence"]

    q = qp.parse("I don't like W's stupid face")
    assert [t.text for t in q.subqueries] == [
        "I", "don't", "like", "W's", "stupid", "face",
    ]

    q = qp.parse("I forgot the drinkin' in '98")
    assert [t.text for t in q.subqueries] == [
        "I", "forgot", "the", "drinkin'", "in", "'98",
    ]


def test_phrase_phrase():
    # ref :488-499
    qp = QueryParser("content", None)
    q = qp.parse('"alfa bravo" "charlie delta echo"^2.2 test:"foxtrot golf"')
    assert q.subqueries[0] == Phrase("content", ["alfa", "bravo"])
    p1 = q.subqueries[1]
    assert isinstance(p1, Phrase) and p1.words == ("charlie", "delta", "echo")
    assert p1.boost == 2.2
    p2 = q.subqueries[2]
    assert isinstance(p2, Phrase) and p2.field == "test"
    assert p2.words == ("foxtrot", "golf")


def test_weird_characters():
    # ref :502-514
    qp = QueryParser("content", None)
    assert qp.parse(".abcd@gmail.com") == Term("content", ".abcd@gmail.com")
    assert qp.parse("r*") == Prefix("content", "r")
    assert qp.parse(".") == Term("content", ".")
    q = qp.parse("?")
    assert isinstance(q, Wildcard) and q.pattern == "?"


def test_euro_chars():
    # ref :517-522
    q = QueryParser("text", _schema(text=wrr.TEXT())).parse("stra\xdfe")
    assert q == Term("text", "stra\xdfe")


def test_star_field():
    # ref :555-567: *:* is Every; "*:test" analyzes down to the bare term
    qp = QueryParser("text", _schema(text=wrr.TEXT()))
    q = qp.parse("*:*")
    assert isinstance(q, Every)
    q = qp.parse("*:test")
    assert q == Term("text", "test")


def test_range_query():
    # ref :570-628 (all 10 sub-cases incl. quoted 'to' endpoints)
    s = _schema(name=wrr.ID(stored=True), text=wrr.TEXT(stored=True))
    qp = QueryParser("text", s)

    q = qp.parse("[alfa to bravo}")
    assert (q.start, q.end, q.startexcl, q.endexcl) == ("alfa", "bravo", False, True)

    q = qp.parse("['hello there' to 'what ever']")
    assert (q.start, q.end) == ("hello there", "what ever")

    q = qp.parse("name:{'to' to 'b'}")
    assert (q.start, q.end, q.startexcl, q.endexcl) == ("to", "b", True, True)

    q = qp.parse("name:{'a' to 'to']")
    assert (q.start, q.end, q.startexcl, q.endexcl) == ("a", "to", True, False)

    q = qp.parse("name:[a to to]")
    assert (q.start, q.end) == ("a", "to")

    q = qp.parse("name:[to to b]")
    assert (q.start, q.end) == ("to", "b")

    q = qp.parse("[alfa to alfa]")
    assert q == Term("text", "alfa")

    q = qp.parse("Ind* AND name:[d TO]")
    assert isinstance(q, And)
    assert q.subqueries[0] == Prefix("text", "ind")
    r = q.subqueries[1]
    assert isinstance(r, TermRange) and (r.field, r.start) == ("name", "d")

    q = qp.parse("name:[d TO]")
    assert isinstance(q, TermRange) and (q.field, q.start, q.end) == ("name", "d", None)


def test_regressions():
    # ref :661-678 (0.3.18 escaping regressions)
    qp = QueryParser("f", None)
    assert qp.parse("re-inker") == Term("f", "re-inker")
    assert qp.parse("0.7 wire") == And([Term("f", "0.7"), Term("f", "wire")])
    assert qp.parse("daler-rowney pearl 'bell bronze'") == And([
        Term("f", "daler-rowney"), Term("f", "pearl"), Term("f", "bell bronze"),
    ])
    q = qp.parse('22" BX')  # unbalanced double quote stays a term
    assert isinstance(q, (And, Term))


def test_empty_ranges():
    # ref :681-687
    s = _schema(name=wrr.TEXT(), num=wrr.NUMERIC(), date=wrr.DATETIME())
    qp = QueryParser("name", s)
    for fname in ("name", "date"):
        q = qp.parse(f"{fname}:[to]")
        assert isinstance(q, (Every, NumericRange)), q
        if isinstance(q, NumericRange):
            assert q.start is None and q.end is None


def test_empty_numeric_range():
    # ref :690-696
    s = _schema(id=wrr.ID(), num=wrr.NUMERIC())
    q = QueryParser("num", s).parse("num:[to]")
    assert isinstance(q, NumericRange)
    assert q.start is None and q.end is None


def test_numrange_multi():
    # ref :700-724
    s = _schema(text=wrr.TEXT(), start=wrr.NUMERIC(), end=wrr.NUMERIC())
    qp = QueryParser("text", s)

    q = qp.parse("start:[2008 to]")
    assert isinstance(q, NumericRange)
    assert (q.field, q.start, q.end) == ("start", 2008, None)

    q = qp.parse("start:[2011 to 2012]")
    assert (q.field, q.start, q.end) == ("start", 2011, 2012)

    q = qp.parse("start:[2008 to] AND end:[2011 to 2012]")
    assert isinstance(q, And)
    assert (q.subqueries[0].start, q.subqueries[0].end) == (2008, None)
    assert (q.subqueries[1].start, q.subqueries[1].end) == (2011, 2012)


def test_nonexistant_fieldnames():
    # ref :727-740: unknown "http:" prefix stays part of the term
    a = wrr.SimpleAnalyzer(r"\S+")
    s = _schema(id=wrr.ID(), text=wrr.TEXT(analyzer=a))
    q = QueryParser("text", s).parse("id:/code http://localhost/")
    assert q == And([Term("id", "/code"), Term("text", "http://localhost/")])


def test_stopped():
    # ref :743-747: all-stopword input -> NullQuery (reference-exact)
    q = QueryParser("text", _schema(text=wrr.TEXT())).parse("a b")
    assert q == wrr_ast.NullQuery


def test_analyzing_terms():
    # ref :750-756
    s = _schema(text=wrr.TEXT(analyzer=wrr.StemmingAnalyzer()))
    q = QueryParser("text", s).parse("Indexed!")
    assert q == Term("text", "index")


def test_simple_parsing():
    # ref :759-771 (structure, not repr)
    parser = SimpleParser("x", None)
    q = parser.parse("alfa bravo charlie delta")
    assert q == Or([Term("x", w) for w in "alfa bravo charlie delta".split()])

    q = parser.parse("alfa +bravo charlie delta")
    assert isinstance(q, AndMaybe)
    assert q.a == Term("x", "bravo")
    assert q.b == Or([Term("x", "alfa"), Term("x", "charlie"), Term("x", "delta")])

    q = parser.parse("alfa +bravo -charlie delta")
    assert isinstance(q, AndNot)
    assert isinstance(q.a, AndMaybe) and q.b == Term("x", "charlie")

    q = parser.parse("- alfa +bravo + delta")
    assert isinstance(q, AndNot)
    assert q.a == And([Term("x", "bravo"), Term("x", "delta")])
    assert q.b == Term("x", "alfa")


def test_many_clauses():
    # ref :800-804: 1001-clause OR must parse without recursion failure
    qs = "1" + (" OR 1" * 1000)
    QueryParser("content", None).parse(qs)


def test_operator_queries():
    # ref :908-918
    qp = QueryParser("f", None)
    q = qp.parse("a AND b OR c AND d")
    assert q == Or([
        And([Term("f", "a"), Term("f", "b")]),
        And([Term("f", "c"), Term("f", "d")]),
    ])
    q = qp.parse("a OR b OR c OR d")
    assert q == Or([Term("f", w) for w in "abcd"])
    q = qp.parse("a ANDMAYBE b ANDNOT c REQUIRE d")
    assert isinstance(q, Require)
    assert isinstance(q.a, AndMaybe)
    assert isinstance(q.a.b, AndNot)


def test_not_assoc():
    # ref :952-959
    qp = QueryParser("text", None)
    q = qp.parse("a AND NOT b OR c")
    assert isinstance(q, Or)
    lhs = q.subqueries[0]
    assert isinstance(lhs, And) and isinstance(lhs.subqueries[1], Not)

    q = qp.parse("a NOT (b OR c)")
    assert isinstance(q, And)
    assert isinstance(q.subqueries[1], Not)
    assert isinstance(q.subqueries[1].subquery, Or)


def test_fieldname_space():
    # ref :962-965: "Ray:" followed by space is a literal word
    q = QueryParser("a", None).parse("Man Ray: a retrospective")
    assert [t.text for t in q.subqueries] == ["Man", "Ray:", "a", "retrospective"]


def test_paren_fieldname():
    # ref :968-976
    s = _schema(kind=wrr.ID(), content=wrr.TEXT())
    qp = QueryParser("content", s)
    want = And([
        Or([Term("kind", "1d565"), Term("kind", "7c584")]),
        Term("content", "stuff"),
    ])
    assert qp.parse("(kind:1d565 OR kind:7c584) AND (stuff)") == want
    assert qp.parse("kind:(1d565 OR 7c584) AND (stuff)") == want


def test_star_paren():
    # ref :979-989
    q = QueryParser("content", None).parse("(*john*) AND (title:blog)")
    assert isinstance(q.subqueries[0], Wildcard)
    assert q.subqueries[0].pattern == "*john*"
    assert q.subqueries[1] == Term("title", "blog")


def test_bool_True():
    # ref :1015-1021
    s = _schema(text=wrr.TEXT(), bool=wrr.BOOLEAN())
    q = QueryParser("text", s).parse("bool:True")
    # reference BOOLEAN.parse_query -> Term(field, True)
    assert isinstance(q, Term) and q.text is True


def test_not_order():
    # ref :1024-1042
    s = _schema(count=wrr.KEYWORD(lowercase=True), cats=wrr.KEYWORD(lowercase=True))
    qp = QueryParser("count", s)
    q1 = qp.parse("(NOT (count:0) AND cats:1)")
    assert isinstance(q1.subqueries[0], Not)
    assert q1.subqueries[1] == Term("cats", "1")
    q2 = qp.parse("(cats:1 AND NOT (count:0))")
    assert q2.subqueries[0] == Term("cats", "1")
    assert isinstance(q2.subqueries[1], Not)


def test_spacespace_and():
    # ref :1045-1059: extra blanks around operators don't change the parse
    qp = QueryParser("f", None)
    for qs in ("A AND B", "A  AND B", "A AND  B"):
        q = qp.parse(qs)
        assert q == And([Term("f", "A"), Term("f", "B")]), qs


def test_unicode_num():
    # ref :1062-1067
    s = _schema(num=wrr.NUMERIC())
    q = QueryParser("num", s).parse("num:1")
    assert isinstance(q, NumericRange) and (q.start, q.end) == (1, 1)


def test_phrase_andmaybe():
    # ref :1070-1076
    q = QueryParser("f", None).parse('Dahmen ANDMAYBE "Besov Spaces"')
    assert isinstance(q, AndMaybe)
    assert q.a == Term("f", "Dahmen")
    assert q.b == Phrase("f", ["Besov", "Spaces"])


def test_phrase_boost():
    # ref :1079-1084
    q = QueryParser("f", None).parse('Dahmen ANDMAYBE "Besov Spaces"^9')
    assert isinstance(q, AndMaybe)
    assert isinstance(q.b, Phrase) and q.b.boost == 9.0


def test_andmaybe_none():
    # ref :1087-1090: must not raise
    s = _schema(f=wrr.TEXT(), year=wrr.NUMERIC())
    QueryParser("f", s).parse("Dahmen ANDMAYBE @year:[2000 TO]")


def test_multitoken_with_factory():
    # ref :1107-1117: OrGroup.factory parser + a word that analyzes into
    # several tokens must not raise
    from whoosh_reloaded_ray.qparser import OrGroup

    s = _schema(title=wrr.TEXT())
    qp = QueryParser("title", s, group=OrGroup.factory(0.9))
    qp.parse("get my name/address")


def test_empty_querystring():
    # ref :160-164 (NullQuery, reference-exact)
    s = _schema(content=wrr.TEXT(), title=wrr.TEXT(), id=wrr.ID())
    q = QueryParser("content", s).parse("")
    assert q == wrr_ast.NullQuery


def test_multifield():
    # ref :191-203
    s = _schema(
        content=wrr.TEXT(), title=wrr.TEXT(), cat=wrr.KEYWORD(),
        date=wrr.DATETIME(),
    )
    q = MultifieldParser(["x", "y"], s).parse("a (b c cat:d) OR (b c cat:e)")
    assert isinstance(q, And)
    assert q.subqueries[0] == Or([Term("x", "a"), Term("y", "a")])
    rhs = q.subqueries[1]
    assert isinstance(rhs, Or) and len(rhs.subqueries) == 2
    assert rhs.subqueries[0].subqueries[2] == Term("cat", "d")
    assert rhs.subqueries[1].subqueries[2] == Term("cat", "e")


def test_dismax_shapes():
    # ref :774-797 test_dismax, structural
    from whoosh_reloaded_ray.query import DisMax

    parser = DisMaxParser({"body": 0.8, "title": 2.5}, None)
    q = parser.parse("alfa bravo charlie")
    assert isinstance(q, Or) and len(q.subqueries) == 3
    for s in q.subqueries:
        assert isinstance(s, DisMax)
        assert {t.field for t in s.subqueries} == {"body", "title"}
        assert {t.boost for t in s.subqueries} == {0.8, 2.5}

    q = parser.parse("alfa +bravo charlie")
    assert isinstance(q, AndMaybe)
    q = parser.parse("alfa -bravo charlie")
    assert isinstance(q, AndNot)
    q = parser.parse("alfa -bravo +charlie")
    assert isinstance(q, AndNot) and isinstance(q.a, AndMaybe)
