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
  * an empty parse is the reference's ``NullQuery`` singleton (empty
    groups normalize to it, query/normalize.py).
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

# dynamic token-regex builder: one alternation per ACTIVE built-in plugin
# (same alternative order as _TOKEN_BODY); cached per feature tuple
_TOKEN_RE_CACHE: dict = {}


def _build_token_re(
    group_on: bool,
    regex_on: bool,
    fields_on: bool,
    phrase_on: bool,
    squote_on: bool,
    range_on: bool,
    boost_on: bool,
    word_on: bool = True,
):
    key = (group_on, regex_on, fields_on, phrase_on, squote_on, range_on, boost_on, word_on)
    pat = _TOKEN_RE_CACHE.get(key)
    if pat is not None:
        return pat
    parts = []
    if group_on:
        parts += [r"(?P<lparen>\()", r"(?P<rparen>\))"]
    if regex_on:
        if fields_on:
            parts.append(r'(?P<fregex>(?P<frxf>\w+):r"(?P<frxtext>[^"]*)")')
        parts.append(r'(?P<regex>r"(?P<rxtext>[^"]*)")')
    if phrase_on:
        if fields_on:
            parts.append(
                r'(?P<fphrase>(?P<fpf>\w+):"(?P<fptext>[^"]*)"(?:~(?P<fpslop>\d+))?)'
            )
        parts.append(r'(?P<phrase>"(?P<phtext>[^"]*)"(?:~(?P<slop>\d+))?)')
    if squote_on:
        if fields_on:
            parts.append(r"(?P<fsquote>(?P<fsf>\w+):'(?P<fstext>[^']*)')")
        parts.append(r"(?P<squote>'(?P<sqtext>[^']*)')")
    if range_on:
        if fields_on:
            parts.append(r"(?P<frange>(?P<frf>\w+):(?P<frbody>[\[{][^\]}]*[\]}]))")
        parts.append(r"(?P<range>[\[{](?P<rbody>[^\]}]*)[\]}])")
    if boost_on:
        # terminal-only: the reference BoostPlugin expr requires the boost
        # to end the token (followed by whitespace/')'/end,
        # qparser/plugins.py BoostPlugin.expr) — "hi^5x" is a plain word
        parts.append(r"(?P<boost>\^(?P<bval>\d+(?:\.\d+)?)(?=$|[\s)]))")
    if word_on:
        excl = r"\s" + ("()" if group_on else "")
        if boost_on:
            # '^' is a word char unless it starts a terminal boost
            parts.append(
                rf"(?P<word>(?:[^{excl}^]|\^(?!\d+(?:\.\d+)?(?:$|[\s)])))+)"
            )
        else:
            parts.append(rf"(?P<word>[^{excl}]+)")
    pat = re.compile("|".join(parts) if parts else r"(?!x)x")
    _TOKEN_RE_CACHE[key] = pat
    return pat

# TO is case-insensitive and may touch the brackets ("[b TO]",
# "[TO e]", "[1 to 10]" — reference RangePlugin behaviors)
# start: single-quoted-then-space OR non-greedy until TO; end:
# space-then-single-quoted OR non-greedy until the close bracket — the
# reference RangePlugin.expr verbatim semantics (qparser/plugins.py:838-855),
# so "name:{'to' to 'b'}" and "[to to b]" resolve like the reference
_RANGE_RE = re.compile(
    r"""^(?P<open>[\[{])
    (?P<start>('[^']*?'\s+)|([^\]}]+?(?=[Tt][Oo])))?
    [Tt][Oo]
    (?P<end>(\s+'[^']*?')|([^\]}]+?))?
    (?P<close>[\]}])$""",
    re.VERBOSE | re.DOTALL,
)
# DateParserPlugin ranges use lowercase 'to' ([today to tomorrow])
_RANGE_RE_NL = re.compile(
    r"^(?P<open>[\[{])(?P<start>.*?)\s[Tt][Oo]\s(?P<end>.*?)(?P<close>[\]}])$",
    re.DOTALL,
)


@dataclass
class _Op:
    kind: str  # "NOT" | "AND" | "OR" | "ANDNOT" | "ANDMAYBE" | "REQUIRE"


class _Group(list):
    pass


class QueryParser:
    """``QueryParser("text", schema).parse("hello AND field:world^2")``.

    Extensible through the reference's Plugin API (see
    ``query/plugins.py``): ``add_plugin`` / ``remove_plugin_class`` /
    ``replace_plugin`` change the syntax the parser understands; the
    legacy keyword flags (``gtlt=True`` etc.) are sugar that appends the
    matching optional plugin."""

    OPERATORS = ("NOT", "AND", "OR", "ANDNOT", "ANDMAYBE", "REQUIRE")

    def __init__(
        self,
        default_field: str,
        schema: IndexSchema | None,
        group: str = "and",
        plugins: list | None = None,
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
        as a plain term).  ``plugins`` overrides the default plugin list
        (WhitespacePlugin is added implicitly, like reference
        default.py:87-94); ``schema=None`` parses without analysis and
        treats every ``field:`` prefix as a real field, like the
        reference."""
        from . import plugins as plg

        self.default_field = default_field
        self.schema = schema
        # ``group`` accepts "and"/"or" strings or the reference's syntax
        # group classes (plugins.AndGroup / OrGroup / OrGroup.factory(s) —
        # the factory product carries a coordination ``scale``)
        self.group_scale = None
        if group is not None and not isinstance(group, str):
            self.group_scale = getattr(group, "scale", None)
            group = "and" if getattr(group, "kindname", "or") == "and" else "or"
        self.group_cls = ast.And if group == "and" else ast.Or
        # accept the compat fields.Schema wrapper directly (the reference
        # passes its Schema object straight to QueryParser)
        if schema is not None and not hasattr(schema, "fields"):
            schema = getattr(schema, "index_schema", schema)
            self.schema = schema
        self.fields = {} if schema is None else {f.name: f for f in schema.fields}
        self.plugins: list = []
        if plugins is None:
            self.add_plugins(plg.default_set())
        else:
            self.add_plugin(plg.WhitespacePlugin())
            self.add_plugins(plugins)
        # legacy keyword sugar -> optional plugins
        if gtlt:
            self.add_plugin(plg.GtLtPlugin())
        if regex:
            self.add_plugin(plg.RegexPlugin())
        if fuzzy:
            self.add_plugin(plg.FuzzyTermPlugin())
        if fieldaliases:
            self.add_plugin(plg.FieldAliasPlugin(fieldaliases))
        if copyfields:
            self.add_plugin(plg.CopyFieldPlugin(copyfields))
        if dateparse_basedate is not None:
            self.add_plugin(plg.DateParserPlugin(dateparse_basedate))

    # -- plugin management (reference default.py:113-170) ------------------

    def add_plugin(self, pin):
        """Adds the given plugin (instance or class) to this parser."""
        if isinstance(pin, type):
            pin = pin()
        self.plugins.append(pin)

    def add_plugins(self, pins):
        for pin in pins:
            self.add_plugin(pin)

    def remove_plugin(self, pi):
        """Removes the given plugin OBJECT from this parser."""
        self.plugins.remove(pi)

    def remove_plugin_class(self, cls):
        """Removes any plugins of the given class from this parser."""
        self.plugins = [pi for pi in self.plugins if not isinstance(pi, cls)]

    def replace_plugin(self, plugin):
        """Removes plugins of the given plugin's class, then adds it."""
        self.remove_plugin_class(plugin.__class__)
        self.add_plugin(plugin)

    def has_plugin(self, cls) -> bool:
        return any(isinstance(pi, cls) for pi in self.plugins)

    def get_plugin(self, cls):
        for pi in self.plugins:
            if isinstance(pi, cls):
                return pi
        return None

    def _priorized(self, methodname):
        """Priorized list of tagger objects or filter functions from all
        plugins (reference default.py:158-170; lower priority first,
        stable for ties)."""
        items = []
        for plugin in self.plugins:
            items.extend(getattr(plugin, methodname)(self))
        items.sort(key=lambda x: x[1])
        return [item for item, _ in items]

    def taggers(self):
        return self._priorized("taggers")

    def filters(self):
        return self._priorized("filters")

    # -- feature switches derived from the plugin list ---------------------

    @property
    def gtlt(self) -> bool:
        from . import plugins as plg

        return self.has_plugin(plg.GtLtPlugin)

    @property
    def regex(self) -> bool:
        from . import plugins as plg

        return self.has_plugin(plg.RegexPlugin)

    @property
    def fuzzy(self) -> bool:
        from . import plugins as plg

        return self.has_plugin(plg.FuzzyTermPlugin)

    @property
    def dateparse_basedate(self):
        from . import plugins as plg

        p = self.get_plugin(plg.DateParserPlugin)
        return p.basedate if p is not None else None

    @property
    def aliases(self) -> dict:
        """alias -> real field name, merged over FieldAliasPlugins."""
        from . import plugins as plg

        out: dict = {}
        for pi in self.plugins:
            if isinstance(pi, plg.FieldAliasPlugin):
                out.update(pi.reverse)
        return out

    @property
    def copyfields(self) -> dict:
        """src field -> dst field for GROUPED copies (legacy Or shape);
        see ``_copyfield_specs`` for the full (map, group) list."""
        out: dict = {}
        for m, g in self._copyfield_specs:
            if g is not None:
                out.update(m)
        return out

    @property
    def _copyfield_specs(self) -> list:
        from . import plugins as plg

        return [
            (pi.map, pi.group)
            for pi in self.plugins
            if isinstance(pi, plg.CopyFieldPlugin)
        ]

    @property
    def pseudofields(self) -> dict:
        from . import plugins as plg

        out: dict = {}
        for pi in self.plugins:
            if isinstance(pi, plg.PseudoFieldPlugin):
                out.update(pi.xform_map)
        return out

    @property
    def _ops_plugin(self):
        from . import plugins as plg

        return self.get_plugin(plg.OperatorsPlugin)

    def _custom_taggers(self):
        """(tagger, priority) pairs from NON-builtin plugins (everything a
        plugin's taggers() reports except OperatorsPlugin's op taggers,
        which the tokenizer handles specially)."""
        from . import plugins as plg

        items = []
        for plugin in self.plugins:
            if isinstance(plugin, plg.OperatorsPlugin):
                continue
            items.extend(plugin.taggers(self))
        items.sort(key=lambda x: x[1])
        return items

    # -- tokenize ----------------------------------------------------------

    def _active_token_re(self, word_on: bool = True):
        from . import plugins as plg

        return _build_token_re(
            group_on=self.has_plugin(plg.GroupPlugin),
            regex_on=self.has_plugin(plg.RegexPlugin),
            fields_on=self.has_plugin(plg.FieldsPlugin),
            phrase_on=self.has_plugin(plg.PhrasePlugin),
            squote_on=self.has_plugin(plg.SingleQuotePlugin),
            range_on=self.has_plugin(plg.RangePlugin),
            boost_on=self.has_plugin(plg.BoostPlugin),
            word_on=word_on,
        )

    def _token_from_match(self, m, text: str):
        """One (kind, value) token from a token-regex match."""
        gd = m.groupdict()
        if gd.get("lparen"):
            return ("(", None)
        if gd.get("rparen"):
            return (")", None)
        if gd.get("fregex") is not None:
            return ("fregex", (m.group("frxf"), m.group("frxtext")))
        if gd.get("regex") is not None:
            return ("regex", m.group("rxtext"))
        if gd.get("fphrase") is not None:
            return (
                "fphrase",
                (m.group("fpf"), m.group("fptext"), int(m.group("fpslop") or 1)),
            )
        if gd.get("phrase") is not None:
            return ("phrase", (m.group("phtext"), int(m.group("slop") or 1)))
        if gd.get("fsquote") is not None:
            return ("fsquote", (m.group("fsf"), m.group("fstext")))
        if gd.get("squote") is not None:
            # bare 'quoted text' is ONE atomic operand (reference
            # SingleQuotePlugin): analyzed later, possibly into a
            # default group, but never split across operators
            return ("squote", m.group("sqtext"))
        if gd.get("frange") is not None:
            return ("frange", (m.group("frf"), m.group("frbody")))
        if gd.get("range") is not None:
            return ("range", m.group(0))
        if gd.get("boost") is not None:
            # value + raw text: a boost that can't attach (whitespace gap,
            # leading position) reverts to a plain word, like the
            # reference BoostPlugin.clean_boost
            return ("boost", (float(m.group("bval")), m.group(0)))
        w = gd.get("word")
        if w is None:  # scanner-mode regex has no word alternative
            return ("word", m.group(0))
        opp = self._ops_plugin
        if (
            opp is not None
            and w in self.OPERATORS
            and self._op_context_ok(w, text, m.start("word"), m.end("word"))
        ):
            return ("op", w)
        return ("word", w)

    def _tokens(self, text: str):
        opp = self._ops_plugin
        custom = self._custom_taggers()
        if custom or (opp is not None and not opp.is_default):
            return self._scan_tokens(text, custom)
        out = []
        prev_end = -1  # adjacency: token starts exactly where the last one
        # ended (no whitespace gap) — what boost attachment and the
        # reference FieldsPlugin's (?=\S) lookahead key on
        for m in self._active_token_re().finditer(text):
            if m.lastgroup is None:
                continue
            kind, val = self._token_from_match(m, text)
            out.append((kind, val, m.start() == prev_end))
            prev_end = m.end()
        return out

    def _scan_tokens(self, text: str, custom):
        """Reference-faithful per-position scan (default.py:264-324), used
        when custom taggers or custom operator syntax are registered:
        negative-priority taggers are tried before the built-in syntax,
        non-negative after; unmatched stretches become word tokens."""
        from . import plugins as plg

        opp = self._ops_plugin
        matchers = list(custom)
        if opp is not None:
            matchers.extend(opp.ops)
        matchers.sort(key=lambda x: x[1])
        pre = [t for t, p in matchers if p < 0]
        post = [t for t, p in matchers if p >= 0]
        token_re = self._active_token_re(word_on=False)

        out: list = []
        pos, n = 0, len(text)
        wstart = None
        prev_end = -1  # see _tokens: adjacency for boost/field attachment

        def flush(end):
            nonlocal wstart, prev_end
            if wstart is not None and wstart < end:
                out.append(("word", text[wstart:end], wstart == prev_end))
                prev_end = end
            wstart = None

        while pos < n:
            if text[pos].isspace():
                flush(pos)
                pos += 1
                continue
            node = None
            for tagger in pre:
                node = tagger.match(self, text, pos)
                if node is not None:
                    break
            if node is None:
                m = token_re.match(text, pos)
                if m is not None and m.end() > pos:
                    flush(pos)
                    kind, val = self._token_from_match(m, text)
                    out.append((kind, val, pos == prev_end))
                    pos = prev_end = m.end()
                    continue
                for tagger in post:
                    node = tagger.match(self, text, pos)
                    if node is not None:
                        break
            if node is not None and node.endchar is not None and node.endchar > pos:
                flush(pos)
                if isinstance(node, plg._OpNode):
                    out.append(("op", node.opname, pos == prev_end))
                else:
                    out.append(("node", node, pos == prev_end))
                pos = prev_end = node.endchar
                continue
            if wstart is None:
                wstart = pos
            pos += 1
        flush(n)
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
        # custom plugin filters run over the built group before operator
        # resolution (reference filterize, default.py:326-342; built-in
        # filter behaviors — fieldnames at 100, operators at 600 — are
        # native, so a custom filter sees the pre-resolution group like a
        # reference filter with priority < 600 would)
        for f in self.filters():
            group = f(self, group)
            if group is None:
                raise Exception(f"Filter {f!r} did not return anything")
        q = self._resolve(group)
        if q is None:
            return ast.NullQuery
        from .normalize import normalize

        # the reference parser normalizes by default (default.py parse
        # normalize=True); direct AST searches stay un-normalized
        return normalize(q)

    def _build_group(self, tokens, i, top: bool = False) -> tuple:
        nodes = _Group()
        field_ctx = None  # pending "field:" prefix for the next node
        while i < len(tokens):
            kind, val, adj = tokens[i]
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
                bval, raw = val
                if adj and nodes and not isinstance(nodes[-1], _Op):
                    nodes[-1] = _Boosted(nodes[-1], bval)
                else:
                    # whitespace-detached or leading "^n" is a plain word
                    # (reference BoostPlugin.clean_boost)
                    nodes.append(
                        _WordNode(field_ctx or self.default_field, raw,
                                  explicit=field_ctx is not None)
                    )
                    field_ctx = None
            elif kind == "phrase":
                nodes.append(_PhraseNode(field_ctx or self.default_field, *val,
                                         explicit=field_ctx is not None))
                field_ctx = None
            elif kind == "regex":
                nodes.append(_RegexNode(field_ctx or self.default_field, val))
                field_ctx = None
            elif kind == "fregex":
                f, text = val
                f = self._field_or_default(f)
                nodes.append(_RegexNode(f, text))
                field_ctx = None
            elif kind == "fphrase":
                f, text, slop = val
                f = self._field_or_default(f)
                nodes.append(_PhraseNode(f, text, slop, explicit=True))
                field_ctx = None
            elif kind == "range":
                nodes.append(_RangeNode(field_ctx or self.default_field, val,
                                        explicit=field_ctx is not None))
                field_ctx = None
            elif kind == "fsquote":
                f, text = val
                f = self._field_or_default(f)
                nodes.append(_WordNode(f, text, explicit=True))
                field_ctx = None
            elif kind == "squote":
                nodes.append(_WordNode(field_ctx or self.default_field, val,
                                        explicit=field_ctx is not None))
                field_ctx = None
            elif kind == "frange":
                f, body = val
                f = self._field_or_default(f)
                nodes.append(_RangeNode(f, body, explicit=True))
                field_ctx = None
            elif kind == "node":
                # custom-tagger syntax node (query(parser) protocol)
                nodes.append(val)
                field_ctx = None
            elif kind == "word":
                w = val
                fm = self._match_field_prefix(w)
                if fm is not None and fm[0] == "*":
                    # "*:" every-field prefix (reference FieldsPlugin expr
                    # \w+|[*]): "*:*" is the unfielded Every; "*:word"
                    # degrades to a default-field word (reference
                    # test_parsing.py:555-567)
                    if fm[1] == "*":
                        nodes.append(ast.Every(None))
                    elif fm[1]:
                        nodes.append(_WordNode(self.default_field, fm[1]))
                    field_ctx = None
                    i += 1
                    continue
                pseudo = self.pseudofields.get(fm[0]) if fm is not None else None
                if pseudo is not None:
                    # PseudoFieldPlugin: run the user transform on the node
                    # written in the pseudo-field (fieldname stripped)
                    if fm[1] != "":
                        xnode = pseudo(_WordNode(None, fm[1]))
                        if xnode is not None:
                            nodes.append(xnode)
                    field_ctx = None
                elif fm is not None and self._known_field(fm[0]):
                    fname = self.aliases.get(fm[0], fm[0])
                    if fm[1] == "":
                        # "field:(...)" / "field:[..]" — only when the next
                        # token is ATTACHED: the reference FieldsPlugin expr
                        # requires (?=\S), so a dangling "name:" (followed
                        # by whitespace or end) stays a plain word
                        if i + 1 < len(tokens) and tokens[i + 1][2]:
                            field_ctx = fname
                            i += 1
                            continue
                        nodes.append(
                            _WordNode(field_ctx or self.default_field, w,
                                      explicit=field_ctx is not None)
                        )
                        field_ctx = None
                        i += 1
                        continue
                    gm = (
                        re.match(r"^(<=|>=|=<|=>|<|>)(.+)$", fm[1])
                        if self.gtlt
                        else None
                    )
                    if gm:
                        nodes.append(_GtLtNode(fname, gm.group(1), gm.group(2)))
                    else:
                        nodes.append(_WordNode(fname, fm[1], explicit=True))
                else:
                    nodes.append(_WordNode(field_ctx or self.default_field, w,
                                            explicit=field_ctx is not None))
                field_ctx = None
            i += 1
        return nodes, i, top

    def _field_or_default(self, f: str) -> str:
        """Alias-resolve a field prefix; unknown names fall back to the
        default field (with schema=None every name is a field)."""
        f = self.aliases.get(f, f)
        if self.schema is None or f in self.fields:
            return f
        return self.default_field

    def _match_field_prefix(self, w: str):
        """(fieldname, rest) when the word starts with the FieldsPlugin
        field expr, else None.  Uses the active plugin instance's pattern
        so ``replace_plugin(FieldsPlugin(expr))`` changes the syntax."""
        from . import plugins as plg

        fp = self.get_plugin(plg.FieldsPlugin)
        if fp is None:
            return None
        m = fp.pattern.match(w)
        if m is None or not m.group("text"):
            return None
        return (m.group("text"), w[m.end() :])

    def _known_field(self, name: str) -> bool:
        """Unknown field names revert to plain text when a schema is
        present and the FieldsPlugin has remove_unknown=True (the
        defaults); with schema=None every prefix is a field, like the
        reference."""
        from . import plugins as plg

        if self.schema is None:
            return True
        if self.aliases.get(name, name) in self.fields:
            return True
        fp = self.get_plugin(plg.FieldsPlugin)
        return fp is not None and not fp.remove_unknown

    def _with_field(self, node, field):
        if field is None:
            return node
        if isinstance(node, _Group):
            return _Group(self._with_field(n, field) for n in node)
        if isinstance(node, (_WordNode, _PhraseNode, _RangeNode)):
            if not getattr(node, "explicit", False):
                node.field = field
                node.explicit = True
        if isinstance(node, _Boosted):
            node.node = self._with_field(node.node, field)
        return node

    # -- operator resolution (reference pass order) ------------------------

    def _resolve(self, group: _Group):
        group = self._splice_inline_copies(group)
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

        # passes 2+: infix ops in the ops-list order (reference
        # do_operators iterates the plugin's ops in order; the default
        # list yields AND, OR, ANDNOT, ANDMAYBE, REQUIRE)
        builders = {
            "AND": lambda l, r: _flatten("AND", l, r),
            "OR": lambda l, r: _flatten("OR", l, r),
            "ANDNOT": lambda l, r: _BinNode("ANDNOT", l, r),
            "ANDMAYBE": lambda l, r: _BinNode("ANDMAYBE", l, r),
            "REQUIRE": lambda l, r: _BinNode("REQUIRE", l, r),
        }
        opp = self._ops_plugin
        order = (
            [k for k in opp.resolve_order() if k != "NOT"]
            if opp is not None
            else ["AND", "OR", "ANDNOT", "ANDMAYBE", "REQUIRE"]
        )
        for opname, builder in ((k, builders[k]) for k in order if k in builders):
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

                return self._make_group(
                    [
                        _dc.replace(s, boost=s.boost * q.boost)
                        for s in q.subqueries
                    ]
                )
            return q
        return self._make_group(queries)

    def _make_group(self, queries):
        """Top-level/implicit group constructor: applies the
        OrGroup.factory coordination scale when configured."""
        if self.group_cls is ast.Or and self.group_scale:
            return ast.Or(queries, scale=self.group_scale)
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
            field = node.field or self.default_field
            return self._with_copies(
                field, lambda f: self._phrase_query(f, node.text, node.slop)
            )
        if isinstance(node, _RegexNode):
            # pattern used verbatim (the reference RegexNode does not
            # analyze/lowercase the text)
            return ast.Regex(node.field or self.default_field, node.text)
        if isinstance(node, _RangeNode):
            if node.field is None:
                node.field = self.default_field
            return self._range_query(node)
        if isinstance(node, _GtLtNode):
            # reference GtLtPlugin.make_range (plugins.py:1144-1160):
            #   <  -> [None TO x}   >  -> {x TO None]
            #   <= -> [None TO x]   >= -> [x TO None]
            rel, text = node.rel, node.text
            fieldname = node.field or self.default_field
            if rel in ("<", "<=", "=<"):
                return self._make_range(fieldname, None, text, False, rel == "<")
            return self._make_range(fieldname, text, None, rel == ">", False)
        if isinstance(node, _WordNode):
            field = node.field or self.default_field
            return self._with_copies(field, lambda f: self._word_query(f, node.text))
        if isinstance(node, ast.Query):
            return node  # pre-resolved query inlined by the tokenizer
        # custom plugin syntax node: the reference SyntaxNode.query protocol
        make = getattr(node, "query", None)
        if callable(make):
            return make(self)
        raise TypeError(f"unknown node {node!r}")

    def _custom_node_query(self, node):
        """ast.Query for any node — internal or custom-plugin shim (used by
        the plugins module's GroupNode)."""
        return self._to_query(node)

    def _with_copies(self, field: str, make):
        """make(field) plus grouped CopyFieldPlugin copies (reference
        do_copyfield, plugins.py:1287-1296); inline (group=None) copies
        are spliced in _resolve instead."""
        q = make(field)
        for cmap, gkind in self._copyfield_specs:
            if gkind is None:
                continue
            dst = cmap.get(field)
            if dst is not None:
                q = self._copy_combine(q, make(dst), gkind)
        return q

    def _copy_combine(self, a, b, gkind: str):
        if a is None:
            return b
        if b is None:
            return a
        if gkind == "and":
            return ast.And([a, b])
        if gkind == "andmaybe":
            return ast.AndMaybe(a, b)
        if gkind == "require":
            return ast.Require(a, b)
        return ast.Or([a, b])

    def _splice_inline_copies(self, group: _Group) -> _Group:
        """CopyFieldPlugin(group=None): the copy is inserted inline next to
        the original node instead of in a new group."""
        specs = [m for m, g in self._copyfield_specs if g is None]
        if not specs:
            return group
        out = _Group()
        for n in group:
            out.append(n)
            if isinstance(n, (_WordNode, _PhraseNode, _RangeNode, _RegexNode)):
                field = n.field or self.default_field
                for cmap in specs:
                    dst = cmap.get(field)
                    if dst is None:
                        continue
                    import copy as _copy

                    dup = _copy.copy(n)
                    dup.field = dst
                    out.append(dup)
        return out

    def _phrase_query(self, field, text, slop):
        spec = self.fields.get(field)
        if spec is None or spec.analyzer is None:
            # unknown/analyzer-less field (incl. schema=None parsing): the
            # reference PhraseNode splits the quoted text on spaces
            words = [w for w in text.split(" ") if w]
        else:
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
            # reference BOOLEAN.parse_query yields Term(field, True/False)
            # (fields.py); the executor evaluates bool-text Terms as a
            # columnar mask, so this keeps the ColumnQuery fast path
            low = text.lower()
            if low in self.BOOL_TRUES:
                return ast.Term(field, True)
            if low in self.BOOL_FALSES:
                return ast.Term(field, False)
            # reference BOOLEAN._obj_to_bool: anything else is bool(x) —
            # a non-empty string queries True (fields.py:963-974)
            return ast.Term(field, bool(text))
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
        from . import plugins as plg

        is_numeric = spec is not None and spec.kind in ("numeric", "datetime")
        if text == "*" and (
            self.has_plugin(plg.WildcardPlugin) or self.has_plugin(plg.EveryPlugin)
        ):
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
            if not is_numeric and self.has_plugin(plg.WildcardPlugin):
                core = text[:-1]
                if text.endswith("*") and "*" not in core and "?" not in core:
                    return ast.Prefix(field, core.lower())
                return ast.Wildcard(field, text.lower())
            if (
                not is_numeric
                and self.has_plugin(plg.PrefixPlugin)
                and text.endswith("*")
                and "*" not in text[:-1]
                and "?" not in text[:-1]
            ):
                # PrefixPlugin (reference plugins.py:166-180): only the
                # whole-token trailing star is special
                return ast.Prefix(field, text[:-1].lower())
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
        # one query word -> several tokens: the field's multitoken_query
        # mode decides the shape (reference qparser/default.py:172-203)
        mode = (getattr(spec, "multitoken_query", "default") or "default").lower()
        if mode == "first":
            return ast.Term(field, words[0])
        if mode == "phrase":
            return ast.Phrase(field, words)
        if mode == "and":
            return ast.And([ast.Term(field, w) for w in words])
        if mode == "or":
            return ast.Or([ast.Term(field, w) for w in words])
        if mode != "default":
            raise ast.QueryError(f"Unknown multitoken_query value {mode!r}")
        return self.group_cls([ast.Term(field, w) for w in words])

    def _range_query(self, node):
        m = _RANGE_RE.match(node.text)
        if m is None and self.dateparse_basedate is not None:
            spec = self.fields.get(node.field)
            if spec is not None and spec.kind == "datetime":
                m = _RANGE_RE_NL.match(node.text)
        if not m:
            return self._word_query(node.field, node.text)
        lo, hi = m.group("start"), m.group("end")
        if lo:
            lo = lo.strip()
            if lo.startswith("'") and lo.endswith("'"):
                lo = lo[1:-1]  # quoted endpoint (reference RangeTagger)
        if hi:
            hi = hi.strip()
            if hi.startswith("'") and hi.endswith("'"):
                hi = hi[1:-1]
        return self._make_range(
            node.field, lo or None, hi or None,
            m.group("open") == "{", m.group("close") == "}",
        )

    def _make_range(self, field, lo, hi, startexcl, endexcl):
        spec = self.fields.get(field)
        if spec is not None and spec.kind == "datetime" and lo is None and hi is None:
            # fully-open date range -> Every (reference DateRange(None,
            # None).normalize(), ranges.py; "[to]" behaves like "*")
            return ast.Every(field)
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
            lov = _parse_number(lo) if lo is not None else None
            hiv = _parse_number(hi) if hi is not None else None
            if (lo is not None and lov is None) or (hi is not None and hiv is None):
                # unparseable bound text ("[10 to *]") -> NullQuery
                # (reference NUMERIC.parse_range raising -> NullQuery)
                return ast.NullQuery
            return ast.NumericRange(
                field, lov, hiv, startexcl=startexcl, endexcl=endexcl,
            )
        def bound(text):
            if not text:
                return None
            words = self._analyze(field, text)
            if len(words) == 1:
                return words[0]
            # rejected (stopword/too-short) or multi-token bound: the
            # reference analyzes range bounds with tokenize=False —
            # the WHOLE string as one case-folded token (syntax.py
            # RangeNode.query get_single_text), so "['hello there' to
            # 'what ever']" keeps its spaces and "[1 to 10]" -> '1'/'10'
            return text.lower()

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


class _BasicNodeMixin:
    """Reference SyntaxNode surface for plugin transform functions
    (PseudoFieldPlugin et al.): has_text / set_fieldname / set_range."""

    __slots__ = ()
    has_text = False
    startchar = None
    endchar = None

    def set_fieldname(self, name, override=False):
        if self.field is None or override:
            self.field = name
        return self

    def set_range(self, startchar, endchar):
        return self


class _WordNode(_BasicNodeMixin):
    __slots__ = ("field", "text", "explicit")
    has_text = True

    def __init__(self, field, text, explicit=False):
        self.field = field
        self.text = text
        # carries its own "field:" prefix — an enclosing "field:(...)"
        # prefix must NOT override it (reference: innermost field wins)
        self.explicit = explicit


class _PhraseNode(_BasicNodeMixin):
    __slots__ = ("field", "text", "slop", "explicit")
    has_text = True

    def __init__(self, field, text, slop=1, explicit=False):
        self.field = field
        self.text = text
        self.slop = slop
        self.explicit = explicit


class _RangeNode(_BasicNodeMixin):
    __slots__ = ("field", "text", "explicit")

    def __init__(self, field, text, explicit=False):
        self.field = field
        self.text = text
        self.explicit = explicit


class _RegexNode(_BasicNodeMixin):
    __slots__ = ("field", "text")
    has_text = True

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
            return ast.NullQuery
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
