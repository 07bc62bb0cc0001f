"""qparser Plugin API — the reference's user-facing parser extension point.

Replicates the contract of reference ``qparser/plugins.py:37-56`` (Plugin
base with ``taggers``/``filters`` returning ``(item, priority)`` pairs,
lower priority first) and ``qparser/default.py:121-170``
(``add_plugin`` / ``add_plugins`` / ``remove_plugin`` /
``remove_plugin_class`` / ``replace_plugin`` / ``plugins=`` constructor
override, ``taggers()``/``filters()`` priorization).

Mapping onto this engine: the DEFAULT plugin set's behavior is implemented
natively by the tokenizer/builder in ``parser.py`` for speed, gated on each
marker plugin's presence in ``parser.plugins`` — so
``remove_plugin_class(WildcardPlugin)`` really disables ``*``/``?`` syntax,
and plugin instances carry the same configuration knobs the reference's do
(``FieldsPlugin(expr)``, ``OperatorsPlugin(And="&", ...)``,
``CopyFieldPlugin(map, group, mirror)``, ...).

CUSTOM plugins participate through the real extension hooks:

  * ``taggers(parser)`` -> ``[(tagger, priority)]`` where a tagger has
    ``match(parser, text, pos) -> SyntaxNode | None`` (subclass
    :class:`TaggingPlugin` for the common regex case).  When any custom
    tagger or non-default operator syntax is registered the parser switches
    from its fast single-regex tokenizer to the reference-faithful
    per-position scan (``default.py:264-324``): at each character the
    taggers are tried in priority order — negative-priority taggers before
    the built-in syntax, non-negative after — and unmatched stretches
    become word nodes.
  * ``filters(parser)`` -> ``[(fn, priority)]`` with
    ``fn(parser, group) -> group`` run over the built node group before
    operator resolution (reference filter priorities < 600; this engine
    resolves operators natively, so a custom filter always sees the
    pre-resolution group exactly like a reference filter with
    priority < 600 would).

Custom syntax nodes implement ``query(parser) -> ast.Query`` (the
reference's ``SyntaxNode.query``); ready-made node classes
(:class:`WordNode`, :class:`GroupNode` aliases ``AndGroup``/``OrGroup``,
``RegexPlugin.RegexNode``, ``PrefixPlugin.PrefixNode``) cover the cases the
reference's docs use in custom-plugin examples (PseudoFieldPlugin and
custom TaggingPlugins).
"""

from __future__ import annotations

import re

__all__ = [
    "Plugin",
    "RegexTagger",
    "TaggingPlugin",
    "WhitespacePlugin",
    "SingleQuotePlugin",
    "FieldsPlugin",
    "WildcardPlugin",
    "PrefixPlugin",
    "PhrasePlugin",
    "RangePlugin",
    "GroupPlugin",
    "OperatorsPlugin",
    "BoostPlugin",
    "EveryPlugin",
    "RegexPlugin",
    "GtLtPlugin",
    "FuzzyTermPlugin",
    "FieldAliasPlugin",
    "CopyFieldPlugin",
    "PseudoFieldPlugin",
    "DateParserPlugin",
]


class Plugin:
    """Base class for parser plugins (reference qparser/plugins.py:37-56)."""

    def taggers(self, parser):
        """Returns a list of ``(Tagger, priority)`` tuples to add to the
        syntax the parser understands.  Lower priorities run first."""
        return ()

    def filters(self, parser):
        """Returns a list of ``(function, priority)`` tuples to add to the
        list of filters the parser uses.  Lower priorities run first."""
        return ()


class RegexTagger:
    """Tagger that matches a regular expression at the current position
    (reference qparser/taggers.py:44-68)."""

    expr: str | re.Pattern | None = None

    def __init__(self, expr=None):
        e = expr if expr is not None else self.expr
        self.expr = re.compile(e) if isinstance(e, str) else e

    def match(self, parser, text, pos):
        m = self.expr.match(text, pos)
        if m:
            node = self.create(parser, m)
            if node is not None:
                node.startchar, node.endchar = m.start(), m.end()
            return node
        return None

    def create(self, parser, match):
        raise NotImplementedError(type(self).__name__)


class TaggingPlugin(RegexTagger, Plugin):
    """A plugin that also acts as a tagger, to avoid having to define both
    classes for simple cases (reference qparser/plugins.py:59-79)."""

    priority = 0

    def __init__(self, expr=None):
        RegexTagger.__init__(self, expr)

    def taggers(self, parser):
        return [(self, self.priority)]


# ---------------------------------------------------------------------------
# Built-in marker/config plugins.  Their *presence* in parser.plugins gates
# the native implementation of the matching syntax; instances carry the
# reference plugins' configuration.
# ---------------------------------------------------------------------------


class WhitespacePlugin(Plugin):
    """Parses whitespace between tokens (always active; the tokenizer
    treats whitespace natively).  Kept for API parity — the reference adds
    it implicitly too (default.py:128-131)."""


class SingleQuotePlugin(Plugin):
    """``'single quoted'`` text as one atomic term."""


class FieldsPlugin(Plugin):
    """``field:`` prefixes.  ``expr`` must contain a ``text`` group for the
    field name, like the reference's (plugins.py:120-160); the default is
    ``(?P<text>\\w+|\\*):``.  Unknown field names revert to plain text when
    a schema is present (``remove_unknown``)."""

    def __init__(self, expr=r"(?P<text>\w+|\*):", remove_unknown=True):
        self.expr = expr
        self.remove_unknown = remove_unknown
        # the word-level matcher: field prefix anchored at token start
        self.pattern = re.compile(expr if isinstance(expr, str) else expr.pattern)


class WildcardPlugin(Plugin):
    """``*``/``?`` wildcard terms (normalizing to Term/Prefix/Every)."""


class PrefixPlugin(TaggingPlugin):
    """``term*`` prefix queries — simpler replacement for WildcardPlugin
    (reference plugins.py:166-180)."""

    class PrefixNode:
        has_text = True
        startchar = endchar = None

        def __init__(self, text):
            self.text = text
            self.field = None

        def set_fieldname(self, name, override=False):
            if self.field is None or override:
                self.field = name
            return self

        def set_range(self, startchar, endchar):
            self.startchar, self.endchar = startchar, endchar
            return self

        def query(self, parser):
            from . import ast

            return ast.Prefix(self.field or parser.default_field, self.text.lower())

    def __init__(self):
        Plugin.__init__(self)

    def taggers(self, parser):
        return ()  # native: the word handler checks for the trailing star


class PhrasePlugin(Plugin):
    """``"quoted phrases"`` with optional slop ``"..."~n``."""


class RangePlugin(Plugin):
    """``[a TO b]`` / ``{a TO b}`` ranges."""


class GroupPlugin(Plugin):
    """Parenthesised groups."""


class BoostPlugin(Plugin):
    """``term^2.5`` boosts."""


class EveryPlugin(Plugin):
    """``*`` / ``field:*`` match-all."""


class RegexPlugin(Plugin):
    """``r"expr"`` regular-expression terms (opt-in, reference
    plugins.py:197-214)."""

    class RegexNode:
        has_text = True
        startchar = endchar = None

        def __init__(self, text):
            self.text = text
            self.field = None

        def set_fieldname(self, name, override=False):
            if self.field is None or override:
                self.field = name
            return self

        def set_range(self, startchar, endchar):
            self.startchar, self.endchar = startchar, endchar
            return self

        def query(self, parser):
            from . import ast

            return ast.Regex(self.field or parser.default_field, self.text)


class GtLtPlugin(Plugin):
    """``field:>x`` / ``field:<=y`` open-ended ranges (opt-in, reference
    plugins.py:1081-1160)."""


class FuzzyTermPlugin(Plugin):
    """``term~n/m`` fuzzy terms (opt-in, reference plugins.py:461-520)."""


class FieldAliasPlugin(Plugin):
    """Alternate names for fields: ``{"realname": ("alias1", "alias2")}``
    (reference plugins.py:1205-1238)."""

    def __init__(self, fieldmap):
        self.fieldmap = fieldmap
        self.reverse = {}
        for key, values in fieldmap.items():
            for value in values:
                self.reverse[value] = key


class CopyFieldPlugin(Plugin):
    """Copies fielded basic nodes into a second field, joined by ``group``
    (default Or); ``group=None`` splices the copy inline next to the
    original; ``mirror=True`` copies both ways (reference
    plugins.py:1241-1296)."""

    def __init__(self, map, group="or", mirror=False):
        self.map = dict(map)
        # accept this engine's group-name strings or the reference-style
        # group classes exposed below
        if group is None:
            self.group = None
        elif isinstance(group, str):
            self.group = group
        else:
            self.group = getattr(group, "kindname", "or")
        if mirror:
            self.map.update({v: k for k, v in map.items()})


class PseudoFieldPlugin(Plugin):
    """User-defined pseudo-fields: ``{"name": fn}`` where
    ``fn(node) -> node | None`` transforms the node the user wrote in the
    pseudo-field (reference plugins.py:1309-1380).  The node passed in has
    its fieldname stripped; the function may return any syntax node (or
    ``None`` to drop it)."""

    def __init__(self, xform_map):
        self.xform_map = dict(xform_map)


class DateParserPlugin(Plugin):
    """Natural-language datetime parsing against ``basedate`` (reference
    qparser/dateparse.py).  ``free`` mode (un-fielded date phrases) is not
    supported — a declared deviation."""

    def __init__(self, basedate=None, dateparser=None, callback=None, free=False):
        if free:
            raise NotImplementedError(
                "DateParserPlugin(free=True) is not supported (declared deviation)"
            )
        self.basedate = basedate
        self.callback = callback


class OperatorsPlugin(Plugin):
    """AND/OR/ANDNOT/ANDMAYBE/NOT/REQUIRE operators, with the reference's
    two customization levels (plugins.py:860-960): keyword arguments
    replace the default patterns (``None`` removes the operator), and the
    ``ops`` argument prepends custom ``(OpTagger, priority)`` pairs."""

    DEFAULTS = dict(
        And=r"(?<=\s)AND(?=\s)",
        Or=r"(?<=\s)OR(?=\s)",
        AndNot=r"(?<=\s)ANDNOT(?=\s)",
        AndMaybe=r"(?<=\s)ANDMAYBE(?=\s)",
        Not=r"(^|(?<=(\s|[()])))NOT(?=\s)",
        Require=r"(^|(?<=\s))REQUIRE(?=\s)",
    )

    class OpTagger(RegexTagger):
        """Matches an operator pattern; ``opname`` is one of the engine's
        operator kinds (NOT/AND/OR/ANDNOT/ANDMAYBE/REQUIRE)."""

        def __init__(self, expr, opname, memo=""):
            RegexTagger.__init__(self, expr)
            self.opname = opname
            self.memo = memo

        def create(self, parser, match):
            return _OpNode(self.opname)

    def __init__(
        self,
        ops=None,
        clean=False,
        And=DEFAULTS["And"],
        Or=DEFAULTS["Or"],
        AndNot=DEFAULTS["AndNot"],
        AndMaybe=DEFAULTS["AndMaybe"],
        Not=DEFAULTS["Not"],
        Require=DEFAULTS["Require"],
    ):
        given = dict(
            And=And, Or=Or, AndNot=AndNot, AndMaybe=AndMaybe, Not=Not, Require=Require
        )
        self.is_default = not ops and not clean and given == self.DEFAULTS
        oplist = list(ops) if ops else []
        if not clean:
            # reference priorities: binary two-word ops at -5 so "&!" is
            # tried before "&"; the rest at 0 in insertion order
            ot = self.OpTagger
            if Not:
                oplist.append((ot(Not, "NOT", memo="not"), 0))
            if And:
                oplist.append((ot(And, "AND", memo="and"), 0))
            if Or:
                oplist.append((ot(Or, "OR", memo="or"), 0))
            if AndNot:
                oplist.append((ot(AndNot, "ANDNOT", memo="anot"), -5))
            if AndMaybe:
                oplist.append((ot(AndMaybe, "ANDMAYBE", memo="amaybe"), -5))
            if Require:
                oplist.append((ot(Require, "REQUIRE", memo="req"), 0))
        self.ops = oplist

    def taggers(self, parser):
        return self.ops

    def resolve_order(self):
        """Operator kinds in resolution-pass order = the ops list order
        (reference do_operators iterates ``self.ops`` in order)."""
        seen = []
        for tagger, _ in self.ops:
            name = getattr(tagger, "opname", None)
            if name and name not in seen:
                seen.append(name)
        return seen


# ---------------------------------------------------------------------------
# Public syntax-node shims for custom plugins (PseudoFieldPlugin transform
# functions, custom TaggingPlugins).  Group aliases carry ``kindname`` so
# CopyFieldPlugin(group=...) can accept them like the reference's
# syntax.OrGroup / syntax.AndMaybeGroup / syntax.RequireGroup.
# ---------------------------------------------------------------------------


class _NodeMixin:
    startchar = endchar = None
    has_text = False

    def set_range(self, startchar, endchar):
        self.startchar, self.endchar = startchar, endchar
        return self


class WordNode(_NodeMixin):
    """A plain word in some field (field None = parser default)."""

    has_text = True

    def __init__(self, text):
        self.text = text
        self.field = None

    def set_fieldname(self, name, override=False):
        if self.field is None or override:
            self.field = name
        return self

    def query(self, parser):
        return parser._word_query(self.field or parser.default_field, self.text)


class GroupNode(_NodeMixin):
    """A group of syntax nodes joined by ``kindname`` ('and' / 'or')."""

    kindname = "and"

    def __init__(self, nodes=None):
        self.nodes = list(nodes or ())

    def append(self, node):
        self.nodes.append(node)

    def set_fieldname(self, name, override=False):
        for n in self.nodes:
            if hasattr(n, "set_fieldname"):
                n.set_fieldname(name, override)
        return self

    def query(self, parser):
        from . import ast

        subs = [
            q
            for q in (parser._custom_node_query(n) for n in self.nodes)
            if q is not None
        ]
        if not subs:
            return None
        if len(subs) == 1:
            return subs[0]
        cls = {"and": ast.And, "or": ast.Or}[self.kindname]
        return cls(subs)


class AndGroup(GroupNode):
    kindname = "and"


class OrGroup(GroupNode):
    kindname = "or"
    scale = None  # coordination-bonus scale set by factory()

    @classmethod
    def factory(cls, scale=1.0):
        """Reference qparser.syntax.OrGroup.factory: an OrGroup subclass
        whose queries carry a coordination-bonus ``scale`` (the
        CoordMatcher wrap — see exec._eval_or).  Pass the result as
        ``QueryParser(group=...)``."""

        class ScaledOrGroup(cls):
            pass

        ScaledOrGroup.scale = scale
        return ScaledOrGroup


class AndMaybeGroup(GroupNode):
    kindname = "andmaybe"


class RequireGroup(GroupNode):
    kindname = "require"


class _OpNode(_NodeMixin):
    """Operator marker produced by OpTaggers in scanner mode."""

    def __init__(self, opname):
        self.opname = opname


def default_set():
    """The default list of plugins (reference default.py:95-111 +
    the implicit WhitespacePlugin)."""
    return [
        WhitespacePlugin(),
        SingleQuotePlugin(),
        FieldsPlugin(),
        WildcardPlugin(),
        PhrasePlugin(),
        RangePlugin(),
        GroupPlugin(),
        OperatorsPlugin(),
        BoostPlugin(),
        EveryPlugin(),
    ]
