"""qparser Plugin API: ported reference scenarios.

Ports the plugin-customization cases from reference
tests/test_parse_plugins.py + tests/test_parsing.py (custom operator
tokens, WildcardPlugin->PrefixPlugin swap, PseudoFieldPlugin transforms,
CopyFieldPlugin group variants, FieldsPlugin expr replacement, plugin
removal) and adds a user-defined TaggingPlugin + custom filter scenario —
the extension surface the reference documents for end users.
"""

from __future__ import annotations

import pytest

from whoosh_reloaded_ray import qparser
from whoosh_reloaded_ray.qparser import (
    CopyFieldPlugin,
    FieldAliasPlugin,
    FieldsPlugin,
    FuzzyTermPlugin,
    GtLtPlugin,
    OperatorsPlugin,
    PrefixPlugin,
    PseudoFieldPlugin,
    QueryParser,
    RangePlugin,
    RegexPlugin,
    TaggingPlugin,
    WildcardPlugin,
)
from whoosh_reloaded_ray.query import ast
from whoosh_reloaded_ray.schema import FieldSpec, IndexSchema


def _schema(**kw):
    from whoosh_reloaded_ray.schema import id_field, numeric_field, text_field

    makers = {"text": text_field, "id": id_field, "numeric": numeric_field}
    return IndexSchema(fields=[makers[k](n) for n, k in kw.items()])


def test_custom_tokens():
    """Reference test_parse_plugins.py::test_custom_tokens: replace the
    operator syntax wholesale with single-character tokens."""
    qp = QueryParser("text", None)
    qp.remove_plugin_class(OperatorsPlugin)
    cp = OperatorsPlugin(And="&", Or="\\|", AndNot="&!", AndMaybe="&~", Not="-")
    qp.add_plugin(cp)

    q = qp.parse("this | that")
    assert isinstance(q, ast.Or)
    assert [s.text for s in q.subqueries] == ["this", "that"]

    q = qp.parse("this&!that")
    assert isinstance(q, ast.AndNot)
    assert q.a.text == "this" and q.b.text == "that"

    q = qp.parse("alfa -bravo NOT charlie")
    assert isinstance(q, ast.And) and len(q.subqueries) == 4
    assert isinstance(q.subqueries[1], ast.Not)
    assert q.subqueries[1].subquery.text == "bravo"
    # with Not remapped to "-", the word NOT is plain text
    assert q.subqueries[2].text == "NOT"


def test_prefix_plugin_swap(tmp_path):
    """Reference test_parse_plugins.py::test_prefix_plugin: drop wildcards,
    use the simpler trailing-star prefix syntax, verified against a real
    index."""
    from whoosh_reloaded_ray import compat

    schema = compat.Schema(
        id=compat.ID(stored=True), text=compat.TEXT(analyzer=None)
    )
    ix = compat.create_in(str(tmp_path / "ix"), schema)
    w = ix.writer()
    w.add_document(id="1", text="alfa")
    w.add_document(id="2", text="bravo")
    w.add_document(id="3", text="buono")
    w.commit()

    with ix.searcher() as s:
        qp = QueryParser("text", _schema(text="text"))
        qp.remove_plugin_class(WildcardPlugin)
        qp.add_plugin(PrefixPlugin)

        q = qp.parse("b*")
        assert isinstance(q, ast.Prefix)
        assert len(s.search(q, limit=None)) == 2

        q = qp.parse("br*")
        assert len(s.search(q, limit=None)) == 1

        # without WildcardPlugin, embedded stars are plain text
        q = qp.parse("b*o")
        assert not isinstance(q, (ast.Prefix, ast.Wildcard))


def test_pseudofield_regex_maker():
    """Reference test_parse_plugins.py::test_pseudofield (first half)."""

    def regex_maker(node):
        if node.has_text:
            node = RegexPlugin.RegexNode(node.text)
            node.set_fieldname("content")
            return node

    qp = QueryParser("a", _schema(a="id", b="text"))
    qp.add_plugin(PseudoFieldPlugin({"regex": regex_maker}))
    q = qp.parse("alfa regex:br.vo")
    assert isinstance(q, ast.And)
    assert q.subqueries[0] == ast.Term("a", "alfa")
    assert isinstance(q.subqueries[1], ast.Regex)
    assert q.subqueries[1].field == "content"
    assert q.subqueries[1].text == "br.vo"


def test_pseudofield_reverse():
    """Reference test_parse_plugins.py::test_pseudofield (second half):
    transform returning a group of the original + a derived node."""

    def rev_text(node):
        if node.has_text:
            revtext = node.text[::-1]
            rnode = qparser.WordNode(revtext)
            rnode.set_range(node.startchar, node.endchar)
            group = qparser.OrGroup([node, rnode])
            group.set_fieldname("reverse")
            return group

    qp = QueryParser("content", _schema(content="text"))
    qp.add_plugin(PseudoFieldPlugin({"reverse": rev_text}))
    q = qp.parse("alfa reverse:bravo")
    assert isinstance(q, ast.And)
    assert q.subqueries[0] == ast.Term("content", "alfa")
    sub = q.subqueries[1]
    assert isinstance(sub, ast.Or)
    assert [t.field for t in sub.subqueries] == ["reverse", "reverse"]
    assert [t.text for t in sub.subqueries] == ["bravo", "ovarb"]


def test_field_alias_plugin():
    """Reference test_parse_plugins.py::test_field_alias via add_plugin."""
    qp = QueryParser("content", None)
    qp.add_plugin(FieldAliasPlugin({"title": ("article", "caption")}))
    q = qp.parse("alfa title:bravo article:charlie caption:delta")
    fields = [t.field for t in q.subqueries]
    assert fields == ["content", "title", "title", "title"]


def test_copyfield_inline():
    qp = QueryParser("a", None)
    qp.add_plugin(CopyFieldPlugin({"b": "c"}, None))
    q = qp.parse("hello b:matt")
    assert isinstance(q, ast.And)
    assert [(t.field, t.text) for t in q.subqueries] == [
        ("a", "hello"),
        ("b", "matt"),
        ("c", "matt"),
    ]


def test_copyfield_andmaybe():
    qp = QueryParser("a", None)
    qp.add_plugin(CopyFieldPlugin({"b": "c"}, qparser.AndMaybeGroup))
    q = qp.parse("hello b:matt")
    assert q.subqueries[0] == ast.Term("a", "hello")
    am = q.subqueries[1]
    assert isinstance(am, ast.AndMaybe)
    assert (am.a.field, am.a.text) == ("b", "matt")
    assert (am.b.field, am.b.text) == ("c", "matt")


def test_copyfield_require_nested():
    qp = QueryParser("a", None)
    qp.add_plugin(CopyFieldPlugin({"b": "c"}, qparser.RequireGroup))
    q = qp.parse("hello (there OR b:matt)")
    assert q.subqueries[0] == ast.Term("a", "hello")
    orq = q.subqueries[1]
    assert isinstance(orq, ast.Or)
    assert orq.subqueries[0] == ast.Term("a", "there")
    req = orq.subqueries[1]
    assert isinstance(req, ast.Require)
    assert (req.a.field, req.b.field) == ("b", "c")


def test_copyfield_default_field_or():
    qp = QueryParser("a", None)
    qp.add_plugin(CopyFieldPlugin({"a": "c"}, qparser.OrGroup))
    q = qp.parse("hello there")
    assert isinstance(q, ast.And)
    for sub, word in zip(q.subqueries, ["hello", "there"]):
        assert isinstance(sub, ast.Or)
        assert [(t.field, t.text) for t in sub.subqueries] == [
            ("a", word),
            ("c", word),
        ]


def test_copyfield_mirror():
    qp = QueryParser("a", None)
    qp.add_plugin(CopyFieldPlugin({"b": "c"}, mirror=True))
    q = qp.parse("hello c:matt")
    assert q.subqueries[0] == ast.Term("a", "hello")
    sub = q.subqueries[1]
    assert isinstance(sub, ast.Or)
    assert [(t.field, t.text) for t in sub.subqueries] == [
        ("c", "matt"),
        ("b", "matt"),
    ]


def test_fields_plugin_expr_replacement():
    """Reference test_parsing.py::test_quoted_prefix: a custom FieldsPlugin
    expression changes what counts as a field prefix."""
    qp = QueryParser("f", None)
    expr = r"(^|(?<=[ (]))(?P<text>\w+|[*]):"
    qp.replace_plugin(FieldsPlugin(expr))

    q = qp.parse("foo url:https://apple.com:8080/bar* baz")
    assert isinstance(q, ast.And)
    assert q.subqueries[0] == ast.Term("f", "foo")
    assert q.subqueries[1] == ast.Prefix("url", "https://apple.com:8080/bar")
    assert q.subqueries[2] == ast.Term("f", "baz")
    assert len(q.subqueries) == 3


def test_remove_fields_and_range_plugins():
    """Reference test_parse_plugins.py:381-384: removing FieldsPlugin and
    RangePlugin turns their syntax into plain text."""
    qp = QueryParser("a", None, gtlt=True)
    qp.remove_plugin_class(FieldsPlugin)
    qp.remove_plugin_class(RangePlugin)
    q = qp.parse("hello a:500 there")
    assert [t.text for t in q.subqueries] == ["hello", "a:500", "there"]
    q = qp.parse("x [b TO c]")
    texts = [t.text for t in q.subqueries]
    assert "[b" in texts  # bracket text parses as plain words


def test_fuzzy_plugin_via_add():
    """Reference test_parse_plugins.py::test_fuzzy_plugin (head)."""
    qp = QueryParser("f", None)
    qp.add_plugin(FuzzyTermPlugin())
    q = qp.parse("bob~")
    assert isinstance(q, ast.FuzzyTerm)
    assert (q.field, q.text, q.maxdist) == ("f", "bob", 1)
    q = qp.parse("bob~3")
    assert q.maxdist == 3


def test_gtlt_and_regex_via_add():
    qp = QueryParser("a", _schema(a="text", n="numeric"))
    qp.add_plugin(GtLtPlugin())
    qp.add_plugin(RegexPlugin())
    q = qp.parse("n:>5")
    assert isinstance(q, ast.NumericRange)
    assert q.start == 5 and q.startexcl
    q = qp.parse('r"gr.y"')
    assert isinstance(q, ast.Regex)


def test_custom_tagging_plugin():
    """A user-defined TaggingPlugin: new ``#hashtag`` syntax becomes a term
    in another field — the custom-syntax extension the reference documents
    (plugins.py TaggingPlugin)."""

    class HashTagPlugin(TaggingPlugin):
        priority = -1
        expr = r"#(?P<tag>\w+)"

        def create(self, parser, match):
            node = qparser.WordNode(match.group("tag"))
            node.set_fieldname("tag")
            return node

    qp = QueryParser("text", None)
    qp.add_plugin(HashTagPlugin())
    q = qp.parse("hello #world again")
    assert isinstance(q, ast.And)
    assert [(t.field, t.text) for t in q.subqueries] == [
        ("text", "hello"),
        ("tag", "world"),
        ("text", "again"),
    ]


def test_custom_filter_plugin():
    """A user-defined filter: drops nodes by predicate before operator
    resolution (reference Plugin.filters contract)."""
    from whoosh_reloaded_ray.query.plugins import Plugin

    class DropSecretsPlugin(Plugin):
        def filters(self, parser):
            return [(self.drop, 500)]

        def drop(self, parser, group):
            keep = type(group)(
                n for n in group if getattr(n, "text", None) != "secret"
            )
            return keep

    qp = QueryParser("text", None)
    qp.add_plugin(DropSecretsPlugin())
    q = qp.parse("alfa secret bravo")
    assert [t.text for t in q.subqueries] == ["alfa", "bravo"]


def test_plugin_management_api():
    """add/remove/replace/has/get round-trips (reference default.py)."""
    qp = QueryParser("text", None)
    assert qp.has_plugin(WildcardPlugin)
    qp.remove_plugin_class(WildcardPlugin)
    assert not qp.has_plugin(WildcardPlugin)
    pin = RegexPlugin()
    qp.add_plugin(pin)
    assert qp.get_plugin(RegexPlugin) is pin
    qp.remove_plugin(pin)
    assert qp.get_plugin(RegexPlugin) is None
    fp = FieldsPlugin(r"(?P<text>\w+)::")
    qp.replace_plugin(fp)
    assert qp.get_plugin(FieldsPlugin) is fp
    # custom expr active: single colon is no longer field syntax
    q = qp.parse("a:b x::y")
    assert [t.text for t in q.subqueries] == ["a:b", "y"]
    assert q.subqueries[1].field == "x"
