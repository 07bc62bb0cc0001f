"""Query-string parser with whoosh default-syntax semantics.

Replicates the behavior of the reference's default plugin pipeline
(qparser/default.py:95-111 plugins; qparser/plugins.py taggers/filters):

  * whitespace-separated nodes, parenthesised groups, the parser's default
    group (AndGroup, default.py:61) joining bare juxtaposition;
  * ``field:`` prefixes for schema fields (unknown names stay literal
    text, like the reference's FieldsPlugin);
  * quoted phrases ``"a b"`` with optional slop ``"a b"~2``
    (PhrasePlugin);
  * wildcards ``?``/``*`` normalizing to Term / Prefix / Every exactly like
    Wildcard.normalize (query/terms.py:310-421);
  * ranges ``[a TO b]`` / ``{a TO b}`` / mixed, numeric fields ->
    NumericRange (RangePlugin);
  * boosts ``term^2`` (BoostPlugin);
  * operators resolved IN THE REFERENCE'S PASS ORDER over each node list
    (OperatorsPlugin.do_operators, plugins.py:975-1005): NOT (prefix),
    then AND, OR (merging infix — left-assoc flattening), then ANDNOT,
    ANDMAYBE (binary infix), then REQUIRE; so AND binds tighter than OR,
    and ANDNOT/ANDMAYBE are looser than both;
  * query text re-analyzed with the target field's analyzer (default.py
    term_query): 0 tokens -> ignored, 1 -> Term, >1 -> default group of
    Terms.

Declared deviations (differential-fuzzed to 10/8000 random token-soup
strings, tests/test_parser.py::test_parser_differential_fuzz):

  * the reference CRASHES (IndexError/AssertionError) on some malformed
    inputs (``NOT NOT x ANDMAYBE ...``, operator runs against stray
    parens); this parser degrades gracefully instead;
  * the reference's infix-AND merge appends the right operand into an
    already-boosted left group, leaking the boost onto it
    (``(a b)^2 AND c`` boosts ``c`` too) — here the boost stays on the
    left group only;
  * an empty parse is the empty ``Or([])`` (this engine's null query
    representation) instead of the ``_NullQuery`` singleton.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

from ..schema import IndexSchema
from . import ast

_TOKEN_BODY = r"""
    (?P<lparen>\()
  | (?P<rparen>\))
{regex_alts}
  | (?P<fphrase>(?P<fpf>\w+):"(?P<fptext>[^"]*)"(?:~(?P<fpslop>\d+))?)
  | (?P<phrase>"(?P<phtext>[^"]*)"(?:~(?P<slop>\d+))?)
  | (?P<fsquote>(?P<fsf>\w+):'(?P<fstext>[^']*)')
  | (?P<squote>'(?P<sqtext>[^']*)')
  | (?P<frange>(?P<frf>\w+):(?P<frbody>[\[{{][^\]}}]*[\]}}]))
  | (?P<range>[\[{{](?P<rbody>[^\]}}]*)[\]}}])
  | (?P<boost>\^(?P<bval>\d+(?:\.\d+)?))
  | (?P<word>[^\s()^]+)
"""

_TOKEN_RE = re.compile(_TOKEN_BODY.format(regex_alts=""), re.VERBOSE)
# RegexPlugin syntax (reference qparser/plugins.py:197-214): r"expr" /
# field:r"expr" — only active when the parser opts in (the reference
# requires add_plugin(RegexPlugin()) too)
_TOKEN_RE_REGEX = re.compile(
    _TOKEN_BODY.format(
        regex_alts=(
            '  | (?P<fregex>(?P<frxf>\\w+):r"(?P<frxtext>[^"]*)")\n'
            '  | (?P<regex>r"(?P<rxtext>[^"]*)")\n'
        )
    ),
    re.VERBOSE,
)

# TO is case-insensitive and may touch the brackets ("[b TO]",
# "[TO e]", "[1 to 10]" — reference RangePlugin behaviors)
_RANGE_RE = re.compile(
    r"^([\[{])\s*(.*?)\s*\b[Tt][Oo]\b\s*(.*?)\s*([\]}])$", re.DOTALL
)
# DateParserPlugin ranges use lowercase 'to' ([today to tomorrow])
_RANGE_RE_NL = re.compile(r"^([\[{])(.*?)\s[Tt][Oo]\s(.*?)([\]}])$", re.DOTALL)


@dataclass
class _Op:
    kind: str  # "NOT" | "AND" | "OR" | "ANDNOT" | "ANDMAYBE" | "REQUIRE"


class _Group(list):
    pass


class QueryParser:
    """``QueryParser("text", schema).parse("hello AND field:world^2")``."""

    OPERATORS = ("NOT", "AND", "OR", "ANDNOT", "ANDMAYBE", "REQUIRE")

    def __init__(
        self,
        default_field: str,
        schema: IndexSchema,
        group: str = "and",
        gtlt: bool = False,
        regex: bool = False,
        fuzzy: bool = False,
        fieldaliases: dict | None = None,
        copyfields: dict | None = None,
        dateparse_basedate=None,
    ):
        """``gtlt=True`` enables the reference's optional GtLtPlugin
        (qparser/plugins.py:1081-1160): ``field:>5  field:<=z`` become
        open-ended ranges.  Off by default, matching the reference's
        default plugin set.  ``fuzzy`` gates the ``term~n/m`` syntax
        (reference FuzzyTermPlugin — opt-in there too, so the default-off
        here matches the default plugin set: a bare ``term~`` parses
        as a plain term)."""
        self.default_field = default_field
        self.schema = schema
        self.group_cls = ast.And if group == "and" else ast.Or
        self.gtlt = gtlt
        self.fuzzy = fuzzy
        # RegexPlugin analog: opt-in r"pattern" term syntax
        self.regex = regex
        # DateParserPlugin analog (qparser/dateparse.py): when a basedate
        # is given, datetime fields accept natural-language datestrings
        # (today / yesterday / 'next friday' / '25 may 2026' / '-3 weeks')
        self.dateparse_basedate = dateparse_basedate
        self.fields = {f.name: f for f in schema.fields}
        # FieldAliasPlugin (plugins.py:1205-1238): alias -> real field name
        self.aliases: dict = {}
        if fieldaliases:
            for real, alist in fieldaliases.items():
                for alias in alist:
                    self.aliases[alias] = real
        # CopyFieldPlugin (plugins.py:1241-1296): fielded term/phrase nodes
        # are expanded to Or(original, same-text node in the mapped field)
        self.copyfields = dict(copyfields) if copyfields else {}

    # -- tokenize ----------------------------------------------------------

    def _tokens(self, text: str):
        out = []
        pos = 0
        token_re = _TOKEN_RE_REGEX if self.regex else _TOKEN_RE
        for m in token_re.finditer(text):
            if m.lastgroup is None:
                continue
            if m.group("lparen"):
                out.append(("(", None))
            elif m.group("rparen"):
                out.append((")", None))
            elif self.regex and m.group("fregex") is not None:
                out.append(("fregex", (m.group("frxf"), m.group("frxtext"))))
            elif self.regex and m.group("regex") is not None:
                out.append(("regex", m.group("rxtext")))
            elif m.group("fphrase") is not None:
                out.append(
                    ("fphrase", (m.group("fpf"), m.group("fptext"), int(m.group("fpslop") or 1)))
                )
            elif m.group("phrase") is not None:
                out.append(("phrase", (m.group("phtext"), int(m.group("slop") or 1))))
            elif m.group("fsquote") is not None:
                out.append(("fsquote", (m.group("fsf"), m.group("fstext"))))
            elif m.group("squote") is not None:
                # bare 'quoted text' is ONE atomic operand (reference
                # SingleQuotePlugin): analyzed later, possibly into a
                # default group, but never split across operators
                out.append(("squote", m.group("sqtext")))
            elif m.group("frange") is not None:
                out.append(("frange", (m.group("frf"), m.group("frbody"))))
            elif m.group("range") is not None:
                out.append(("range", m.group(0)))
            elif m.group("boost") is not None:
                out.append(("boost", float(m.group("bval"))))
            elif m.group("word") is not None:
                w = m.group("word")
                if w in self.OPERATORS and self._op_context_ok(
                    w, text, m.start("word"), m.end("word")
                ):
                    out.append(("op", w))
                else:
                    out.append(("word", w))
            pos = m.end()
        return out

    @staticmethod
    def _op_context_ok(op: str, text: str, s: int, e: int) -> bool:
        """Operator words need the reference taggers' raw-text context
        (plugins.py:937-942): AND/OR/ANDNOT/ANDMAYBE require whitespace
        on BOTH sides, NOT allows start-of-string or a paren before,
        REQUIRE allows start-of-string; all need whitespace after.
        Elsewhere the word is plain text (``and``/``or``/``not`` then
        vanish into the stop filter, ``andnot`` stays a term)."""
        if e >= len(text) or not text[e].isspace():
            return False
        if s == 0:
            return op in ("NOT", "REQUIRE")
        prev = text[s - 1]
        if prev.isspace():
            return True
        return op == "NOT" and prev in "()"

    # -- node building -----------------------------------------------------

    def parse(self, text: str) -> ast.Query:
        tokens = self._tokens(text)
        group, _, _ = self._build_group(tokens, 0, top=True)
        q = self._resolve(group)
        if q is None:
            return ast.Or([])
        from .normalize import normalize

        # the reference parser normalizes by default (default.py parse
        # normalize=True); direct AST searches stay un-normalized
        return normalize(q)

    def _build_group(self, tokens, i, top: bool = False) -> tuple:
        nodes = _Group()
        field_ctx = None  # pending "field:" prefix for the next node
        while i < len(tokens):
            kind, val = tokens[i]
            if kind == ")":
                if top:  # stray close paren: ignored, parsing continues
                    i += 1
                    continue
                return nodes, i + 1, True
            if kind == "(":
                sub, i, closed = self._build_group(tokens, i + 1)
                sub = self._with_field(sub, field_ctx)
                if closed:
                    nodes.append(sub)
                else:
                    # unclosed "(": the reference's tagger never emits a
                    # group, so the paren dissolves and the contents flow
                    # inline
                    nodes.extend(sub)
                field_ctx = None
                continue
            if kind == "op":
                nodes.append(_Op(val))
            elif kind == "boost":
                if nodes and not isinstance(nodes[-1], _Op):
                    nodes[-1] = _Boosted(nodes[-1], val)
            elif kind == "phrase":
                nodes.append(_PhraseNode(field_ctx or self.default_field, *val))
                field_ctx = None
            elif kind == "regex":
                nodes.append(_RegexNode(field_ctx or self.default_field, val))
                field_ctx = None
            elif kind == "fregex":
                f, text = val
                f = self.aliases.get(f, f)
                f = f if f in self.fields else self.default_field
                nodes.append(_RegexNode(f, text))
                field_ctx = None
            elif kind == "fphrase":
                f, text, slop = val
                f = self.aliases.get(f, f)
                f = f if f in self.fields else self.default_field
                nodes.append(_PhraseNode(f, text, slop))
                field_ctx = None
            elif kind == "range":
                nodes.append(_RangeNode(field_ctx or self.default_field, val))
                field_ctx = None
            elif kind == "fsquote":
                f, text = val
                f = self.aliases.get(f, f)
                f = f if f in self.fields else self.default_field
                nodes.append(_WordNode(f, text))
                field_ctx = None
            elif kind == "squote":
                nodes.append(_WordNode(field_ctx or self.default_field, val))
                field_ctx = None
            elif kind == "frange":
                f, body = val
                f = self.aliases.get(f, f)
                f = f if f in self.fields else self.default_field
                nodes.append(_RangeNode(f, body))
                field_ctx = None
            elif kind == "word":
                w = val
                fm = re.match(r"^(\w+):(.*)$", w, re.UNICODE)
                if fm and self.aliases.get(fm.group(1), fm.group(1)) in self.fields:
                    fname = self.aliases.get(fm.group(1), fm.group(1))
                    if fm.group(2) == "":
                        field_ctx = fname  # "field:(...)" / "field:[..]"
                        i += 1
                        continue
                    gm = (
                        re.match(r"^(<=|>=|=<|=>|<|>)(.+)$", fm.group(2))
                        if self.gtlt
                        else None
                    )
                    if gm:
                        nodes.append(_GtLtNode(fname, gm.group(1), gm.group(2)))
                    else:
                        nodes.append(_WordNode(fname, fm.group(2)))
                else:
                    nodes.append(_WordNode(field_ctx or self.default_field, w))
                field_ctx = None
            i += 1
        return nodes, i, top

    def _with_field(self, node, field):
        if field is None:
            return node
        if isinstance(node, _Group):
            return _Group(self._with_field(n, field) for n in node)
        if isinstance(node, (_WordNode, _PhraseNode, _RangeNode)):
            node.field = field
        if isinstance(node, _Boosted):
            node.node = self._with_field(node.node, field)
        return node

    # -- operator resolution (reference pass order) ------------------------

    def _resolve(self, group: _Group):
        nodes = []
        for n in group:
            if isinstance(n, _Group):
                # an empty group is a NULL OPERAND (reference: () ->
                # NullQuery), kept so binary ops see it — AndNot(null, x)
                # then nulls out in normalize instead of x surviving
                n = self._resolve(n)
                if n is None:
                    n = ast.Or(())
            elif isinstance(n, _Boosted) and isinstance(n.node, _Group):
                # ``(...)^N``: resolve the group, keep the boost on the
                # resulting compound (reference GroupNode boost; And-in-
                # And flattening then multiplies it into the children)
                inner = self._resolve(n.node)
                n = _Boosted(inner, n.boost) if inner is not None else None
            nodes.append(n)
        nodes = [n for n in nodes if n is not None or isinstance(n, _Op)]

        # pass 1: NOT (prefix)
        i = 0
        while i < len(nodes):
            n = nodes[i]
            if isinstance(n, _Op) and n.kind == "NOT":
                del nodes[i]
                if i < len(nodes):
                    nodes[i] = _NotNode(nodes[i])
            else:
                i += 1

        # passes 2+: infix ops in reference order
        for opname, builder in (
            ("AND", lambda l, r: _flatten("AND", l, r)),
            ("OR", lambda l, r: _flatten("OR", l, r)),
            ("ANDNOT", lambda l, r: _BinNode("ANDNOT", l, r)),
            ("ANDMAYBE", lambda l, r: _BinNode("ANDMAYBE", l, r)),
            ("REQUIRE", lambda l, r: _BinNode("REQUIRE", l, r)),
        ):
            i = 0
            while i < len(nodes):
                n = nodes[i]
                if isinstance(n, _Op) and n.kind == opname:
                    if 0 < i < len(nodes) - 1:
                        left, right = nodes[i - 1], nodes[i + 1]
                        nodes[i - 1 : i + 2] = [builder(left, right)]
                        i -= 1
                    else:
                        del nodes[i]
                        continue
                i += 1

        # drop any dangling operators
        nodes = [n for n in nodes if not isinstance(n, _Op)]
        queries = [q for q in (self._to_query(n) for n in nodes) if q is not None]
        if not queries:
            return None
        if len(queries) == 1:
            q = queries[0]
            # the reference always wraps in the group class and its
            # normalize flattens a same-class child by multiplying the
            # child's boost into the grandchildren (compound.py:124) —
            # replicate so ``(a b)^2`` yields per-term boosts
            if type(q) is self.group_cls and q.boost != 1.0:
                import dataclasses as _dc

                return self.group_cls(
                    [
                        _dc.replace(s, boost=s.boost * q.boost)
                        for s in q.subqueries
                    ]
                )
            return q
        return self.group_cls(queries)

    # -- node -> ast.Query -------------------------------------------------

    def _to_query(self, node):
        if node is None or isinstance(node, _Op):
            return None
        if isinstance(node, ast.Query):
            return node
        if isinstance(node, _GroupNode):
            subs = [q for q in (self._to_query(n) for n in node.children) if q is not None]
            if not subs:
                return None
            if len(subs) == 1:
                return subs[0]
            return (ast.And if node.kind == "AND" else ast.Or)(subs)
        if isinstance(node, _BinNode):
            # null-operand semantics follow the reference's binary
            # rewrites (compound.py:530-658): AndNot/AndMaybe null a ->
            # null, null b -> a; Require either null -> null
            lq, rq = self._to_query(node.left), self._to_query(node.right)
            if node.kind == "REQUIRE" and (lq is None or rq is None):
                return None
            if lq is None:
                return None if node.kind in ("ANDNOT", "ANDMAYBE") else rq
            if rq is None:
                return lq
            cls = {"ANDNOT": ast.AndNot, "ANDMAYBE": ast.AndMaybe, "REQUIRE": ast.Require}[node.kind]
            return cls(lq, rq)
        if isinstance(node, _NotNode):
            sub = self._to_query(node.node)
            return ast.Not(sub) if sub is not None else None
        if isinstance(node, _Boosted):
            q = self._to_query(node.node)
            if q is not None:
                q = _apply_boost(q, node.boost)
            return q
        if isinstance(node, _PhraseNode):
            q = self._phrase_query(node.field, node.text, node.slop)
            to = self.copyfields.get(node.field)
            if to is not None:
                q = self._copy_or(q, self._phrase_query(to, node.text, node.slop))
            return q
        if isinstance(node, _RegexNode):
            # pattern used verbatim (the reference RegexNode does not
            # analyze/lowercase the text)
            return ast.Regex(node.field, node.text)
        if isinstance(node, _RangeNode):
            return self._range_query(node)
        if isinstance(node, _GtLtNode):
            # reference GtLtPlugin.make_range (plugins.py:1144-1160):
            #   <  -> [None TO x}   >  -> {x TO None]
            #   <= -> [None TO x]   >= -> [x TO None]
            rel, text = node.rel, node.text
            if rel in ("<", "<=", "=<"):
                return self._make_range(node.field, None, text, False, rel == "<")
            return self._make_range(node.field, text, None, rel == ">", False)
        if isinstance(node, _WordNode):
            q = self._word_query(node.field, node.text)
            to = self.copyfields.get(node.field)
            if to is not None:
                q = self._copy_or(q, self._word_query(to, node.text))
            return q
        raise TypeError(f"unknown node {node!r}")

    def _phrase_query(self, field, text, slop):
        words = self._analyze(field, text)
        if not words:
            return None
        if len(words) == 1:
            return ast.Term(field, words[0])
        return ast.Phrase(field, words, slop=slop)

    @staticmethod
    def _copy_or(a, b):
        if a is None:
            return b
        if b is None:
            return a
        return ast.Or([a, b])

    def _analyze(self, field: str, text: str) -> list:
        from ..functions.analysis import make_analyzer

        spec = self.fields.get(field)
        if spec is None or spec.analyzer is None:
            return [text]
        # mode="query" replicates Token.mode branching (single-size ngram
        # expansion); a field may also carry an explicitly different
        # query_analyzer (the MultiFilter index/query pattern)
        return [
            t
            for t, _ in make_analyzer(
                spec.query_analyzer or spec.analyzer, mode="query"
            )(text)
        ]

    # reference BOOLEAN accepted strings (fields.py trues/falses)
    BOOL_TRUES = frozenset("t true yes 1".split())
    BOOL_FALSES = frozenset("f false no 0".split())

    def _word_query(self, field: str, text: str):
        spec = self.fields.get(field)
        if spec is not None and spec.kind == "boolean" and text != "*":
            low = text.lower()
            if low in self.BOOL_TRUES:
                return ast.ColumnQuery(field, True)
            if low in self.BOOL_FALSES:
                return ast.ColumnQuery(field, False)
            return None
        if spec is not None and spec.kind == "datetime" and text != "*":
            bounds = _datetime_bounds(text)
            if bounds is None and self.dateparse_basedate is not None:
                bounds = _nl_date_bounds(text, self.dateparse_basedate)
            if bounds is None:
                return None
            lo, hi = bounds
            # ambiguous datestring -> inclusive [floor, ceil] range
            # (reference DATETIME.parse_query, fields.py:903-918)
            return ast.NumericRange(field, lo, hi)
        is_numeric = spec is not None and spec.kind in ("numeric", "datetime")
        if text == "*":
            return ast.Every(field)
        fm = re.match(r"^(.+?)~(\d*)(?:/(\d+))?$", text)
        if fm and not is_numeric and self.fuzzy:
            base = fm.group(1)
            maxdist = int(fm.group(2)) if fm.group(2) else 1
            # ~n/m syntax: m = required prefix length (reference
            # FuzzyTermPlugin, plugins.py:461-520)
            prefixlength = int(fm.group(3)) if fm.group(3) else 1
            words = self._analyze(field, base)
            if not words:
                return None
            return ast.FuzzyTerm(field, words[0], maxdist=maxdist, prefixlength=prefixlength)
        if "*" in text or "?" in text:
            # Wildcard.normalize: plain text -> Term, trailing-* only -> Prefix
            if not is_numeric:
                core = text[:-1]
                if text.endswith("*") and "*" not in core and "?" not in core:
                    return ast.Prefix(field, core.lower())
                return ast.Wildcard(field, text.lower())
        if is_numeric:
            v = _parse_number(text)
            if v is None:
                return None
            return ast.NumericRange(field, v, v)
        words = self._analyze(field, text)
        if not words:
            return None
        if len(words) == 1:
            return ast.Term(field, words[0])
        return self.group_cls([ast.Term(field, w) for w in words])

    def _range_query(self, node):
        m = _RANGE_RE.match(node.text)
        if m is None and self.dateparse_basedate is not None:
            spec = self.fields.get(node.field)
            if spec is not None and spec.kind == "datetime":
                m = _RANGE_RE_NL.match(node.text)
        if not m:
            return self._word_query(node.field, node.text)
        lb, lo, hi, rb = m.groups()
        return self._make_range(
            node.field, lo.strip() or None, hi.strip() or None, lb == "{", rb == "}"
        )

    def _make_range(self, field, lo, hi, startexcl, endexcl):
        spec = self.fields.get(field)
        if spec is not None and spec.kind == "datetime":
            # range bounds: start -> floor, end -> ceil (reference
            # DATETIME.parse_range, fields.py:920-934)
            def _db(text):
                b = _datetime_bounds(text)
                if b is None and self.dateparse_basedate is not None:
                    b = _nl_date_bounds(text, self.dateparse_basedate)
                return b

            lob = _db(lo) if lo is not None else None
            hib = _db(hi) if hi is not None else None
            return ast.NumericRange(
                field,
                lob[0] if lob else None,
                hib[1] if hib else None,
                startexcl=startexcl,
                endexcl=endexcl,
            )
        if spec is not None and spec.kind == "numeric":
            return ast.NumericRange(
                field,
                _parse_number(lo) if lo is not None else None,
                _parse_number(hi) if hi is not None else None,
                startexcl=startexcl,
                endexcl=endexcl,
            )
        def bound(text):
            if not text:
                return None
            words = self._analyze(field, text)
            # a bound the analyzer rejects (too short / stopword) keeps
            # its raw lowercased text, like the reference's unanalyzed
            # range bounds ("[1 to 10]" -> TermRange('1', '10'))
            return words[0] if words else text.lower()

        return ast.TermRange(
            field, bound(lo), bound(hi), startexcl=startexcl, endexcl=endexcl
        )


def _datetime_bounds(text: str):
    """(floor, ceil) np.datetime64[us] for a whoosh-style datestring
    ``YYYY[MM[DD[hh[mm[ss[uuuuuu]]]]]]`` (spaces/dashes/dots stripped;
    reference fields.py:876-901) — missing parts floor to their minimum
    and ceil to their maximum.  ISO strings with time separators parse as
    exact points."""
    import calendar

    import numpy as np

    digits = text.replace(" ", "").replace("-", "").replace(".", "")
    if not digits.isdigit() or len(digits) < 4:
        # ISO fallback (e.g. 2026-01-01T00:03:00) — digits required so
        # numpy's own natural-language keywords ('today', 'now') don't
        # short-circuit the DateParserPlugin path
        if not any(c.isdigit() for c in text):
            return None
        try:
            v = np.datetime64(text, "us")
            return v, v
        except Exception:
            return None
    y = int(digits[:4])
    mo = int(digits[4:6]) if len(digits) >= 6 else None
    d = int(digits[6:8]) if len(digits) >= 8 else None
    h = int(digits[8:10]) if len(digits) >= 10 else None
    mi = int(digits[10:12]) if len(digits) >= 12 else None
    s = int(digits[12:14]) if len(digits) >= 14 else None
    us = int(digits[14:]) if len(digits) == 20 else None
    try:
        import datetime as _dt

        flo = _dt.datetime(y, mo or 1, d or 1, h or 0, mi or 0, s or 0, us or 0)
        chi = _dt.datetime(
            y,
            mo if mo is not None else 12,
            d if d is not None else calendar.monthrange(y, mo if mo is not None else 12)[1],
            h if h is not None else 23,
            mi if mi is not None else 59,
            s if s is not None else 59,
            us if us is not None else 999999,
        )
    except ValueError:
        return None
    return np.datetime64(flo, "us"), np.datetime64(chi, "us")


def _nl_date_bounds(text: str, base):
    """Natural-language datestring bounds via the full English grammar
    (query/dateparse.py — the reference DateParserPlugin analog,
    qparser/dateparse.py:603-780): times of day, date/time bags, d-m-y
    orderings, named/relative days, plus-minus chains, and 'a to b'
    ranges, all relative to ``base``.  Returns (floor, ceil)
    np.datetime64[us] or None (unparseable -> no matches, like the
    reference's NullQuery)."""
    import numpy as np

    from .dateparse import english_date_bounds

    b = english_date_bounds(text, base)
    if b is None:
        return None
    return np.datetime64(b[0], "us"), np.datetime64(b[1], "us")


def _parse_number(text: str):
    """int if possible, else float (reference NUMERIC fields parse
    according to numtype; we store both in one numeric column kind)."""
    try:
        return int(text)
    except ValueError:
        try:
            return float(text)
        except ValueError:
            return None


def _apply_boost(q: ast.Query, boost: float) -> ast.Query:
    import dataclasses

    return dataclasses.replace(q, boost=q.boost * boost)


class _GroupNode:
    __slots__ = ("kind", "children")

    def __init__(self, kind, children):
        self.kind = kind
        self.children = children


class _BinNode:
    __slots__ = ("kind", "left", "right")

    def __init__(self, kind, left, right):
        self.kind = kind
        self.left = left
        self.right = right


def _flatten(kind, left, right):
    """Left-assoc merging exactly like InfixOperator.replace_self
    (syntax.py:614-642): append to an existing same-type group."""
    if isinstance(left, _GroupNode) and left.kind == kind:
        left.children.append(right)
        return left
    return _GroupNode(kind, [left, right])


class _WordNode:
    __slots__ = ("field", "text")

    def __init__(self, field, text):
        self.field = field
        self.text = text


class _PhraseNode:
    __slots__ = ("field", "text", "slop")

    def __init__(self, field, text, slop=1):
        self.field = field
        self.text = text
        self.slop = slop


class _RangeNode:
    __slots__ = ("field", "text")

    def __init__(self, field, text):
        self.field = field
        self.text = text


class _RegexNode:
    __slots__ = ("field", "text")

    def __init__(self, field, text):
        self.field = field
        self.text = text


class _GtLtNode:
    __slots__ = ("field", "rel", "text")

    def __init__(self, field, rel, text):
        self.field = field
        self.rel = rel
        self.text = text


class _NotNode:
    __slots__ = ("node",)

    def __init__(self, node):
        self.node = node


class _Boosted:
    __slots__ = ("node", "boost")

    def __init__(self, node, boost):
        self.node = node
        self.boost = boost


_MULTI = "\x00multi"


class MultifieldParser(QueryParser):
    """Unfielded clauses search an OR over several fields (reference
    MultifieldParser / MultifieldPlugin, qparser/default.py:393-412:
    "hello there" -> (f1:hello OR f2:hello) AND (f1:there OR f2:there);
    optional per-field boosts)."""

    def __init__(self, fieldnames, schema: IndexSchema, fieldboosts=None, group: str = "and"):
        super().__init__(_MULTI, schema, group=group)
        self.multifields = list(fieldnames)
        self.fieldboosts = fieldboosts or {}

    def _fan(self, make):
        subs = []
        for f in self.multifields:
            q = make(f)
            if q is None:
                continue
            boost = self.fieldboosts.get(f, 1.0)
            if boost != 1.0:
                q = _apply_boost(q, boost)
            subs.append(q)
        if not subs:
            return None
        if len(subs) == 1:
            return subs[0]
        return ast.Or(subs)

    def _word_query(self, field, text):
        if field != _MULTI:
            return super()._word_query(field, text)
        return self._fan(lambda f: super(MultifieldParser, self)._word_query(f, text))

    def _to_query(self, node):
        if isinstance(node, _PhraseNode) and node.field == _MULTI:
            def mk(f):
                return super(MultifieldParser, self)._to_query(
                    _PhraseNode(f, node.text, node.slop)
                )

            return self._fan(mk)
        if isinstance(node, _RangeNode) and node.field == _MULTI:
            def mkr(f):
                return super(MultifieldParser, self)._to_query(_RangeNode(f, node.text))

            return self._fan(mkr)
        return super()._to_query(node)


# ---------------------------------------------------------------------------
# SimpleParser / DisMaxParser — the reference's +/- syntax family
# (qparser/default.py:415-447; PlusMinusPlugin, plugins.py:1016-1078).
# Grammar: whitespace-separated words and quoted phrases only (no fields,
# ranges, operators or wildcards); a '+' marker makes the NEXT node
# required, '-' makes it prohibited.  Resolution per do_plusminus:
#   result = optional-group            (OrGroup unless group="and")
#   if required: result = AndMaybe(And(required), result)
#   if banned:   result = AndNot(result, Or(banned))
# ---------------------------------------------------------------------------

_SIMPLE_TOKEN_RE = re.compile(
    r"""
    (?P<plus>\+)
  | (?P<minus>-)
  | (?P<phrase>"(?P<phtext>[^"]*)")
  | (?P<word>[^\s+\-"][^\s"]*)
""",
    re.VERBOSE,
)


class SimpleParser(QueryParser):
    """``SimpleParser("text", schema).parse('render +fast -slow')``."""

    def __init__(self, default_field: str, schema: IndexSchema, group: str = "or"):
        super().__init__(default_field, schema, group=group)

    # -- single node builders (no fields/wildcards in this grammar) --------

    def _simple_word(self, text: str):
        words = self._analyze(self.default_field, text)
        if not words:
            return None
        if len(words) == 1:
            return ast.Term(self.default_field, words[0])
        return self.group_cls([ast.Term(self.default_field, w) for w in words])

    def _simple_phrase(self, text: str):
        words = self._analyze(self.default_field, text)
        if not words:
            return None
        if len(words) == 1:
            return ast.Term(self.default_field, words[0])
        return ast.Phrase(self.default_field, words)

    # -- parse -------------------------------------------------------------

    def parse(self, text: str) -> ast.Query:
        required, optional, banned = [], [], []
        dest = optional
        for m in _SIMPLE_TOKEN_RE.finditer(text):
            if m.group("plus"):
                dest = required
                continue
            if m.group("minus"):
                dest = banned
                continue
            q = (
                self._simple_phrase(m.group("phtext"))
                if m.group("phrase")
                else self._simple_word(m.group("word"))
            )
            if q is not None:
                dest.append(q)
            dest = optional
        return self._combine_plusminus(required, optional, banned)

    def _combine_plusminus(self, required, optional, banned) -> ast.Query:
        def grp(qs, cls):
            if not qs:
                return None
            return qs[0] if len(qs) == 1 else cls(qs)

        q = grp(optional, self.group_cls)
        req = grp(required, ast.And)
        if req is not None:
            q = ast.AndMaybe(req, q) if q is not None else req
        if banned:
            base = q if q is not None else ast.Or([])
            q = ast.AndNot(base, grp(banned, ast.Or))
        if q is None:
            return ast.Or([])
        from .normalize import normalize

        return normalize(q)


class DisMaxParser(SimpleParser):
    """+/- syntax where each term searches several fields combined with
    DisjunctionMax (reference DisMaxParser, qparser/default.py:427-447:
    MultifieldPlugin with group=DisMaxGroup and per-field boosts)."""

    def __init__(self, fieldboosts: dict, schema: IndexSchema, tiebreak: float = 0.0):
        super().__init__(next(iter(fieldboosts)), schema, group="or")
        self.fieldboosts = dict(fieldboosts)
        self.tiebreak = tiebreak

    def _fan_dismax(self, make):
        subs = []
        for f, boost in self.fieldboosts.items():
            q = make(f)
            if q is None:
                continue
            if boost != 1.0:
                q = _apply_boost(q, boost)
            subs.append(q)
        if not subs:
            return None
        if len(subs) == 1:
            return subs[0]
        return ast.DisMax(subs, tiebreak=self.tiebreak)

    def _simple_word(self, text: str):
        def mk(f):
            words = self._analyze(f, text)
            if not words:
                return None
            if len(words) == 1:
                return ast.Term(f, words[0])
            return self.group_cls([ast.Term(f, w) for w in words])

        return self._fan_dismax(mk)

    def _simple_phrase(self, text: str):
        def mk(f):
            words = self._analyze(f, text)
            if not words:
                return None
            if len(words) == 1:
                return ast.Term(f, words[0])
            return ast.Phrase(f, words)

        return self._fan_dismax(mk)
