"""Query AST: plain-data nodes broadcast to searcher actors.

Node set mirrors the reference's v1 parity scope (query/terms.py,
query/compound.py, query/positional.py, query/ranges.py): Term, And, Or,
Not, AndNot, AndMaybe, Require, DisMax, Phrase, Prefix, Wildcard,
TermRange, NumericRange, Every, with per-node boost.  Nodes serialize to
dicts (msgpack/pickle-friendly) for actor transport.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Optional


@dataclass(frozen=True)
class Query:
    boost: float = 1.0

    @property
    def fieldname(self):
        """Reference-parity alias (reference queries expose ``fieldname``;
        our nodes store ``field``; None on field-less nodes)."""
        return getattr(self, "field", None)

    def children(self) -> tuple:
        return ()

    def leaves(self):
        if not self.children():
            yield self
        for c in self.children():
            yield from c.leaves()

    def terms(self):
        """All (field, text) Term leaves (for global df gathering)."""
        for leaf in self.leaves():
            if isinstance(leaf, Term):
                yield (leaf.field, leaf.text)
            elif isinstance(leaf, Phrase):
                for w in leaf.words:
                    yield (leaf.field, w)

    def docs(self, searcher):
        """Docnums matching this query (reference Query.docs(searcher)).
        Accepts the compat Searcher or an IndexSearcher."""
        s = getattr(searcher, "_s", searcher)
        return iter(s.search(self, limit=None, scored=False)["docnum"].to_pylist())

    # ---- tree-transform API (reference qcore.Query:243-340) -------------
    # Nodes here are IMMUTABLE, so apply/accept/replace RETURN transformed
    # trees instead of mutating in place (the reference documents the same
    # copy-before-mutate contract for accept()).

    def is_leaf(self) -> bool:
        return not self.children()

    def apply(self, fn):
        """New copy of this node with ``fn`` applied to each child; a leaf
        returns itself (reference Query.apply)."""
        if self.is_leaf():
            return self
        import copy as _copy

        new = _copy.copy(self)
        for name, v in list(self.__dict__.items()):
            if isinstance(v, Query):
                object.__setattr__(new, name, fn(v))
            elif (
                isinstance(v, (list, tuple))
                and v
                and all(isinstance(x, Query) for x in v)
            ):
                object.__setattr__(new, name, type(v)(fn(x) for x in v))
        return new

    def accept(self, fn):
        """Apply ``fn`` bottom-up to every node, returning the new tree
        (reference Query.accept — implemented via apply, like the
        reference)."""

        def wrap(q):
            return fn(q.apply(wrap))

        return wrap(self)

    def replace(self, fieldname: str, oldtext, newtext):
        """Copy of this tree with ``oldtext`` replaced by ``newtext`` in
        every leaf targeting ``fieldname`` (reference Query.replace)."""
        if self.is_leaf():
            if (
                getattr(self, "field", None) == fieldname
                and getattr(self, "text", None) == oldtext
            ):
                import copy as _copy

                new = _copy.copy(self)
                object.__setattr__(new, "text", newtext)
                return new
            return self
        from operator import methodcaller

        return self.apply(methodcaller("replace", fieldname, oldtext, newtext))

    def copy(self):
        import copy as _copy

        return _copy.deepcopy(self)

    def all_terms(self, phrases: bool = True) -> set:
        """Set of (field, text) pairs in the tree (reference
        Query.all_terms).  Expanding leaves (FuzzyTerm/Variations)
        contribute their BASE text like the reference's ExpandingTerm
        (terms.py:431-433)."""
        out = set()
        for leaf in self.leaves():
            if isinstance(leaf, (Term, FuzzyTerm, Variations)):
                out.add((leaf.field, leaf.text))
            elif phrases and isinstance(leaf, Phrase):
                out.update((leaf.field, w) for w in leaf.words)
        return out

    def phrases(self):
        """(term leaves, phrase nodes) of the tree (reference
        Query.phrases, qcore.py:379-400 — used by strict-phrase
        highlighting)."""
        terms: list = []
        phrs: list = []
        if isinstance(self, Phrase):
            phrs.append(self)
        else:
            for sub in self.children():
                if isinstance(sub, Term):
                    terms.append(sub)
                else:
                    t, p = sub.phrases()
                    terms.extend(t)
                    phrs.extend(p)
        return terms, phrs

    def iter_all_terms(self, phrases: bool = True):
        """Iterator of (field, text) pairs over the tree in leaf order
        (reference Query.iter_all_terms, qcore.py:413-436); multiterm
        leaves (Prefix/Wildcard/...) contribute nothing, expanding leaves
        (FuzzyTerm/Variations) contribute their base text, Phrase words
        are included when ``phrases``."""
        for leaf in self.leaves():
            if isinstance(leaf, (Term, FuzzyTerm, Variations)):
                yield (leaf.field, leaf.text)
            elif phrases and isinstance(leaf, Phrase):
                for w in leaf.words:
                    yield (leaf.field, w)

    def all_tokens(self, boost: float = 1.0):
        """Token objects (fieldname/text/boost) for every term in the
        tree, compound boosts multiplied down (reference Query.all_tokens,
        qcore.py:438-452).  Deviation: our parse trees carry no source
        char offsets, so ``startchar``/``endchar`` are None (the
        correct_query path locates occurrences by whole-word match
        instead)."""
        from .highlight import Token

        boost *= self.boost
        if isinstance(self, Term):
            yield Token(
                text=self.text, pos=-1, startchar=None, endchar=None,
                fieldname=self.field, boost=boost,
            )
            return
        if isinstance(self, Phrase):
            for w in self.words:
                yield Token(
                    text=w, pos=-1, startchar=None, endchar=None,
                    fieldname=self.field, boost=boost,
                )
            return
        for c in self.children():
            yield from c.all_tokens(boost)

    def existing_terms(self, ixreader, phrases: bool = True, expand: bool = False,
                       fieldname: str | None = None) -> set:
        """The subset of all_terms that EXIST in the index (reference
        Query.existing_terms); accepts a compat Reader/Searcher or an
        IndexSearcher.  ``expand`` additionally expands multiterm leaves
        (Prefix/Wildcard/Variations) against the vocabulary."""
        s = getattr(ixreader, "_s", ixreader)
        cands = self.all_terms(phrases=phrases)
        if expand:
            for leaf in self.leaves():
                sub = leaf.simplify(ixreader)
                if sub is not leaf:
                    cands |= sub.all_terms(phrases=phrases)
        out = set()
        for f, t in cands:
            if fieldname and f != fieldname:
                continue
            if s.doc_frequency(f, t) > 0:
                out.add((f, t))
        return out

    def requires(self) -> set:
        """Queries statically known to be required for a match (reference
        Query.requires; leaf default = itself)."""
        return {self}

    def simplify(self, ixreader):
        """Recursively rewrite second-order leaves (Prefix/Wildcard/
        Variations) into Or-of-existing-Terms (reference Query.simplify /
        MultiTerm.simplify: each expanded Term keeps the leaf's boost)."""
        if self.is_leaf():
            return self
        from operator import methodcaller

        return self.apply(methodcaller("simplify", ixreader))

    def normalize(self):
        """Parse-time normal form (reference Query.normalize): flatten,
        merge ranges, dedup, absorb Every, unwrap singletons."""
        from .normalize import normalize as _norm

        return _norm(self)

    def estimate_size(self, ixreader) -> int:
        """Overestimate of potentially matching docs (reference
        Query.estimate_size: Term = doc frequency, compounds combine;
        unknown node types answer the whole doc count — permissibly
        over, never under)."""
        s = getattr(ixreader, "_s", ixreader)
        if isinstance(self, Term):
            return s.doc_frequency(self.field, self.text)
        kids = self.children()
        if isinstance(self, And) and kids:
            return min(q.estimate_size(ixreader) for q in kids)
        if isinstance(self, (Or, DisMax)) and kids:
            est = sum(q.estimate_size(ixreader) for q in kids)
            return min(est, s.doc_count_all())
        if isinstance(self, (AndNot, AndMaybe, Require)):
            return self.a.estimate_size(ixreader)
        # positional / span queries estimate via the doc-level query they
        # wrap (reference positional.py:96-103, 234-241 _and_query;
        # spans.py:601-608 SpanNear2, :712 SpanOr self.q = Or(subqs),
        # :823/871/906 SpanContains/Before/Condition self.q = And([a, b]),
        # SpanNot self.q = a, WrappingSpan(SpanFirst) wraps its child)
        if isinstance(self, Phrase):
            return min(
                s.doc_frequency(self.field, w) for w in self.words
            ) if self.words else 0
        if isinstance(self, (Sequence, Ordered)) and self.subqueries:
            return min(q.estimate_size(ixreader) for q in self.subqueries)
        if isinstance(self, SpanOr) and self.subqueries:
            est = sum(q.estimate_size(ixreader) for q in self.subqueries)
            return min(est, s.doc_count_all())
        if isinstance(self, (SpanNear, SpanContains, SpanBefore, SpanCondition)):
            return min(
                self.a.estimate_size(ixreader), self.b.estimate_size(ixreader)
            )
        if isinstance(self, SpanNot):
            return self.a.estimate_size(ixreader)
        if isinstance(self, SpanFirst):
            return self.child.estimate_size(ixreader)
        return s.doc_count_all()

    def estimate_min_size(self, ixreader) -> int:
        """Underestimate of guaranteed matches (reference
        Query.estimate_min_size; 0 is always safe)."""
        return 0


@dataclass(frozen=True)
class Term(Query):
    field: str = "text"
    text: str = ""

    def __init__(self, field="text", text="", boost=1.0):
        object.__setattr__(self, "field", field)
        object.__setattr__(self, "text", text)
        object.__setattr__(self, "boost", boost)


class _Compound(Query):
    def children(self) -> tuple:
        return tuple(self.subqueries)

    def requires(self) -> set:
        # Or/DisMax default (reference compound.py:323,469): only a
        # single-child disjunction is required; And overrides with the
        # union of its children's requirements
        if len(self.subqueries) == 1:
            return self.subqueries[0].requires()
        return set()


@dataclass(frozen=True)
class And(_Compound):
    subqueries: tuple = ()

    def __init__(self, subqueries, boost=1.0):
        subqueries = tuple(subqueries)
        if any(s is None for s in subqueries):
            # reference qcore.py compound __init__ rejects None children
            raise QueryError("None in compound query")
        object.__setattr__(self, "subqueries", subqueries)
        object.__setattr__(self, "boost", boost)

    def requires(self) -> set:
        out = set()
        for q in self.subqueries:
            out |= q.requires()
        return out


@dataclass(frozen=True)
class Or(_Compound):
    subqueries: tuple = ()
    # "coordination bonus" scaling factor (reference Or(scale=...),
    # compound.py:291-306): when set, scores are adjusted by the V-Twin SQR
    # function to reward documents matching more of the query's terms.
    # Declared deviation: the reference's CoordMatcher RECOMPUTES its
    # termcount whenever the collector's replace() prunes an exhausted or
    # low-quality union branch (wrappers.py:545-546), so late documents'
    # coord scores silently decay — down to exactly 0.0 once one term
    # matcher remains ((termcount-1)/termcount == 0).  Its own docstring
    # warns it "may give unexpected results".  We always score with the
    # query's full, fixed termcount; everything before the decay region is
    # rank+score-identical.
    scale: float | None = None
    # stored for API parity; the reference marks minmatch "not yet
    # implemented" (compound.py:293) and neither engine applies it
    minmatch: int = 0

    def __init__(self, subqueries, boost=1.0, scale=None, minmatch=0):
        subqueries = tuple(subqueries)
        if any(s is None for s in subqueries):
            # reference qcore.py compound __init__ rejects None children
            raise QueryError("None in compound query")
        object.__setattr__(self, "subqueries", subqueries)
        object.__setattr__(self, "boost", boost)
        object.__setattr__(self, "scale", scale)
        object.__setattr__(self, "minmatch", minmatch)


@dataclass(frozen=True)
class DisMax(_Compound):
    subqueries: tuple = ()
    tiebreak: float = 0.0

    def __init__(self, subqueries, boost=1.0, tiebreak=0.0):
        subqueries = tuple(subqueries)
        if any(s is None for s in subqueries):
            # reference qcore.py compound __init__ rejects None children
            raise QueryError("None in compound query")
        object.__setattr__(self, "subqueries", subqueries)
        object.__setattr__(self, "boost", boost)
        object.__setattr__(self, "tiebreak", tiebreak)


@dataclass(frozen=True)
class Not(Query):
    subquery: Optional[Query] = None

    def __init__(self, subquery, boost=1.0):
        object.__setattr__(self, "subquery", subquery)
        object.__setattr__(self, "boost", boost)

    def children(self) -> tuple:
        return (self.subquery,)

    def requires(self) -> set:
        return set()


@dataclass(frozen=True)
class _Binary(Query):
    a: Optional[Query] = None
    b: Optional[Query] = None

    def __init__(self, a, b, boost=1.0):
        object.__setattr__(self, "a", a)
        object.__setattr__(self, "b", b)
        object.__setattr__(self, "boost", boost)

    def children(self) -> tuple:
        return (self.a, self.b)


class AndNot(_Binary):
    """Docs matching a but not b; scores from a."""

    def requires(self) -> set:
        return self.a.requires()


class AndMaybe(_Binary):
    """Docs matching a; b's score added where it also matches."""

    def requires(self) -> set:
        return self.a.requires()


class Require(_Binary):
    """Docs matching both; scores from a only."""

    def requires(self) -> set:
        return self.a.requires() | self.b.requires()


class Otherwise(_Binary):
    """Matches ``a``; if ``a`` matches NOTHING in a segment, matches ``b``
    instead (reference compound.py:578-589 — the choice is made per
    sub-searcher/segment, which we replicate per SegmentReader)."""


@dataclass(frozen=True)
class Phrase(Query):
    field: str = "text"
    words: tuple = ()
    slop: int = 1

    def __init__(self, field, words, slop=1, boost=1.0):
        object.__setattr__(self, "field", field)
        object.__setattr__(self, "words", tuple(words))
        object.__setattr__(self, "slop", slop)
        object.__setattr__(self, "boost", boost)


@dataclass(frozen=True)
class Sequence(Query):
    """Sub-queries matching at consecutive positions (reference
    query/positional.py:36-121 Sequence -> SpanNear matcher tree); each
    sub-query must be term-expandable in one field (Term / Prefix /
    Wildcard / FuzzyTerm / Or-of-Terms)."""

    subqueries: tuple = ()
    slop: int = 1
    ordered: bool = True

    def __init__(self, subqueries, slop=1, ordered=True, boost=1.0):
        object.__setattr__(self, "subqueries", tuple(subqueries))
        object.__setattr__(self, "slop", slop)
        object.__setattr__(self, "ordered", ordered)
        object.__setattr__(self, "boost", boost)

    def children(self) -> tuple:
        return tuple(self.subqueries)


@dataclass(frozen=True)
class SpanFirst(Query):
    """Docs where the child matches within the first ``limit`` positions
    (span.end <= limit; reference spans.py:309-352)."""

    child: Optional[Query] = None
    limit: int = 0

    def __init__(self, child, limit=0, boost=1.0):
        object.__setattr__(self, "child", child)
        object.__setattr__(self, "limit", limit)
        object.__setattr__(self, "boost", boost)

    def children(self) -> tuple:
        return (self.child,)


@dataclass(frozen=True)
class SpanNot(Query):
    """Docs where ``a`` has at least one occurrence NOT overlapping any
    occurrence of ``b`` (reference spans.py:771-819; single-position spans
    overlap iff equal)."""

    a: Optional[Query] = None
    b: Optional[Query] = None

    def __init__(self, a, b, boost=1.0):
        object.__setattr__(self, "a", a)
        object.__setattr__(self, "b", b)
        object.__setattr__(self, "boost", boost)

    def children(self) -> tuple:
        return (self.a, self.b)


@dataclass(frozen=True)
class Ordered(Query):
    """Docs containing the sub-queries in document ORDER, any distance
    apart (reference positional.py:123-131 Ordered — a binary
    SpanBefore tree over the halves of the list; combined spans are
    first-start .. last-end).  Scores sum the children like Sequence."""

    subqueries: tuple = ()

    def __init__(self, subqueries, boost=1.0):
        object.__setattr__(self, "subqueries", tuple(subqueries))
        object.__setattr__(self, "boost", boost)

    def children(self) -> tuple:
        return tuple(self.subqueries)


@dataclass(frozen=True)
class SpanNear(Query):
    """Binary near query (reference spans.py:355-528 SpanNear — the
    pre-SpanNear2 form): spans of ``a`` and ``b`` whose distance is in
    [mindist, slop], optionally ordered (a must start at or before b);
    overlapping spans have distance 0, so the default mindist=1
    REJECTS overlaps (reference quirk kept).  Combined span =
    min start / max end."""

    a: Optional[Query] = None
    b: Optional[Query] = None
    slop: int = 1
    ordered: bool = True
    mindist: int = 1

    def __init__(self, a, b, slop=1, ordered=True, mindist=1, boost=1.0):
        object.__setattr__(self, "a", a)
        object.__setattr__(self, "b", b)
        object.__setattr__(self, "slop", slop)
        object.__setattr__(self, "ordered", ordered)
        object.__setattr__(self, "mindist", mindist)
        object.__setattr__(self, "boost", boost)

    def children(self) -> tuple:
        return (self.a, self.b)

    @classmethod
    def phrase(cls, fieldname, words, slop=1, ordered=True):
        """Binary tree over the terms (reference SpanNear.phrase /
        util.make_binary_tree: left half nested against right half)."""
        terms = [Term(fieldname, w) for w in words]

        def build(args):
            if len(args) == 1:
                return args[0]
            half = len(args) // 2
            return cls(
                build(args[:half]), build(args[half:]),
                slop=slop, ordered=ordered,
            )

        return build(terms)


@dataclass(frozen=True)
class SpanBefore(Query):
    """Docs where some occurrence of ``a`` precedes some occurrence of
    ``b`` (reference SpanBefore via Ordered, spans.py)."""

    a: Optional[Query] = None
    b: Optional[Query] = None

    def __init__(self, a, b, boost=1.0):
        object.__setattr__(self, "a", a)
        object.__setattr__(self, "b", b)
        object.__setattr__(self, "boost", boost)

    def children(self) -> tuple:
        return (self.a, self.b)


@dataclass(frozen=True)
class SpanOr(Query):
    """Union of sub-queries with overlapping/touching spans merged
    (reference spans.py:702-753 SpanOr; doc-level result equals Or with
    summed scores — the span merge matters when nested inside another
    span query)."""

    subqueries: tuple = ()

    def __init__(self, subqueries, boost=1.0):
        object.__setattr__(self, "subqueries", tuple(subqueries))
        object.__setattr__(self, "boost", boost)

    def children(self) -> tuple:
        return tuple(self.subqueries)


@dataclass(frozen=True)
class SpanContains(Query):
    """Docs where some span of ``a`` CONTAINS some span of ``b``
    (b.start >= a.start and b.end <= a.end; reference spans.py:821-871);
    score = a + b on surviving docs (the wrapped IntersectionMatcher)."""

    a: Optional[Query] = None
    b: Optional[Query] = None

    def __init__(self, a, b, boost=1.0):
        object.__setattr__(self, "a", a)
        object.__setattr__(self, "b", b)
        object.__setattr__(self, "boost", boost)

    def children(self) -> tuple:
        return (self.a, self.b)


@dataclass(frozen=True)
class SpanCondition(Query):
    """Docs matching BOTH ``a`` and ``b``, keeping only ``a``'s spans
    (reference spans.py:904-930); doc-level = And with summed scores, the
    span restriction matters when nested."""

    a: Optional[Query] = None
    b: Optional[Query] = None

    def __init__(self, a, b, boost=1.0):
        object.__setattr__(self, "a", a)
        object.__setattr__(self, "b", b)
        object.__setattr__(self, "boost", boost)

    def children(self) -> tuple:
        return (self.a, self.b)


@dataclass(frozen=True)
class NestedChildren(Query):
    """Matches parents but RETURNS the children (reference nested.py:209-281
    NestedChildren): ``parents`` matches every parent doc (the block
    delimiters), ``child`` (= the reference's ``subq``) selects the WANTED
    parents; the result is every doc strictly between a wanted parent and
    the next parent delimiter.  Evaluated as a whole-index rewrite on the
    searcher (docnum-interval arithmetic needs the global parent set, like
    the reference's bit-set comb)."""

    parents: Optional[Query] = None
    child: Optional[Query] = None

    def __init__(self, parents, child, boost=1.0):
        object.__setattr__(self, "parents", parents)
        object.__setattr__(self, "child", child)
        object.__setattr__(self, "boost", boost)

    def children(self) -> tuple:
        return (self.parents, self.child)


@dataclass(frozen=True)
class Variations(Query):
    """Searches morphological variations of an English word (reference
    query/terms.py:522-560 Variations): candidate variant strings are
    generated algorithmically, filtered to terms that EXIST in the index,
    and evaluated as a scored Or of Terms (ExpandingTerm semantics:
    constantscore=False).  The candidate generator is morph_en-exact
    (clean-room LiteMorph_en, functions/morph_en.py, equality-fuzzed vs
    the reference); the original suffix toolkit remains as
    ``toolkit_variations``."""

    field: str = "text"
    text: str = ""

    def __init__(self, field, text, boost=1.0):
        object.__setattr__(self, "field", field)
        object.__setattr__(self, "text", text)
        object.__setattr__(self, "boost", boost)


    def simplify(self, ixreader):
        from .variations import variations as _vars

        s = getattr(ixreader, "_s", ixreader)
        return _simplified_terms(
            self.field,
            (t for t in _vars(self.text) if s.doc_frequency(self.field, t) > 0),
            self.boost,
        )

@dataclass(frozen=True)
class DocSet(Query):
    """Pre-resolved sorted docnum array with constant score 1.0·boost —
    produced by searcher-level rewrites (NestedChildren), not by users."""

    docnums: object = None  # np.ndarray[uint64], sorted

    def __init__(self, docnums, boost=1.0):
        object.__setattr__(self, "docnums", docnums)
        object.__setattr__(self, "boost", boost)


@dataclass(frozen=True)
class ScoredDocSet(Query):
    """Pre-resolved sorted (docnum, score) arrays — produced by
    searcher-level rewrites (NestedParent), not by users."""

    docnums: object = None  # np.ndarray[uint64], sorted
    scores: object = None  # np.ndarray[float64], aligned

    def __init__(self, docnums, scores, boost=1.0):
        object.__setattr__(self, "docnums", docnums)
        object.__setattr__(self, "scores", scores)
        object.__setattr__(self, "boost", boost)


@dataclass(frozen=True)
class NestedParent(Query):
    """COMPOSABLE block-join: ``child`` matches nested docs, the query acts
    as if it matched the owning PARENT doc (greatest ``parents`` match <=
    child docnum; reference nested.py:33-206 NestedParent).  Parent score =
    ``score_fn`` over its matching children's scores ("sum" default, "max"
    or "mean"); ``per_parent_limit`` counts only the first N children per
    parent.  Children before the first parent are dropped (the reference
    matcher deactivates entirely in that case — a cursor quirk we soften;
    declared in TODO.md).  Resolved by a searcher-level rewrite to a
    ScoredDocSet (block intervals straddle segments), so it composes
    inside And/Or/Not like any other node."""

    parents: Optional[Query] = None
    child: Optional[Query] = None
    per_parent_limit: Optional[int] = None
    score_fn: str = "sum"

    def __init__(self, parents, child, per_parent_limit=None, score_fn="sum", boost=1.0):
        object.__setattr__(self, "parents", parents)
        object.__setattr__(self, "child", child)
        object.__setattr__(self, "per_parent_limit", per_parent_limit)
        # the reference passes the builtins (score_fn=sum/max/min)
        score_fn = {sum: "sum", max: "max", min: "min"}.get(score_fn, score_fn)
        if score_fn not in ("sum", "max", "min", "mean"):
            raise ValueError(f"unsupported score_fn {score_fn!r}")
        object.__setattr__(self, "score_fn", score_fn)
        object.__setattr__(self, "boost", boost)

    def children(self) -> tuple:
        return (self.parents, self.child)


@dataclass(frozen=True)
class FuzzyTerm(Query):
    """Matches terms within ``maxdist`` edits sharing ``prefixlength``
    leading chars (reference query/terms.py:436-500; constant-score
    multiterm expansion)."""

    field: str = "text"
    text: str = ""
    maxdist: int = 1
    prefixlength: int = 1
    # participates in equality/hash like the reference's attribute; the
    # executor picks scored-vs-constant expansion by clause count either way
    constantscore: bool = True

    def __init__(self, field, text, maxdist=1, prefixlength=1, boost=1.0,
                 constantscore=True):
        object.__setattr__(self, "field", field)
        object.__setattr__(self, "text", text)
        object.__setattr__(self, "maxdist", maxdist)
        object.__setattr__(self, "prefixlength", prefixlength)
        object.__setattr__(self, "constantscore", constantscore)
        object.__setattr__(self, "boost", boost)


@dataclass(frozen=True)
class Prefix(Query):
    field: str = "text"
    text: str = ""

    def __init__(self, field, text, boost=1.0):
        object.__setattr__(self, "field", field)
        object.__setattr__(self, "text", text)
        object.__setattr__(self, "boost", boost)


    def simplify(self, ixreader):
        s = getattr(ixreader, "_s", ixreader)
        return _simplified_terms(
            self.field, s.lexicon(self.field, prefix=self.text), self.boost
        )

@dataclass(frozen=True)
class Wildcard(Query):
    field: str = "text"
    pattern: str = ""

    def __init__(self, field, pattern, boost=1.0):
        object.__setattr__(self, "field", field)
        object.__setattr__(self, "pattern", pattern)
        object.__setattr__(self, "boost", boost)

    def _find_prefix(self, text: str) -> str:
        """Literal prefix usable for candidate pruning (reference
        Wildcard._find_prefix: everything before the first ``*?[``)."""
        import re as _re

        return _re.match(r"[^*?\[]*", text).group(0)

    def simplify(self, ixreader):
        import re as _re

        from .exec import _wildcard_to_regex

        s = getattr(ixreader, "_s", ixreader)
        cands = s.lexicon(self.field, prefix=self._find_prefix(self.pattern))
        rex = _re.compile(_wildcard_to_regex(self.pattern))
        return _simplified_terms(
            self.field, (t for t in cands if rex.fullmatch(t)), self.boost
        )

@dataclass(frozen=True)
class Regex(Query):
    """Matches docs containing any term the regex MATCHES (anchored at the
    start, ``re.match`` — reference query/terms.py:378-418 Regex).  The
    searcher rewrite prunes candidates with the literal prefix of the
    pattern (reference ``_find_prefix`` incl. the ``*``/``?`` back-off and
    the ``|`` bail-out) and routes through the constant-score multiterm
    auto-selection like Wildcard; ``r".*"`` collapses to Every."""

    field: str = "text"
    text: str = ""

    def __init__(self, field, text, boost=1.0):
        object.__setattr__(self, "field", field)
        object.__setattr__(self, "text", text)
        object.__setattr__(self, "boost", boost)

    def _find_prefix(self, text: str) -> str:
        return regex_prefix(text)

    def simplify(self, ixreader):
        import re as _re

        s = getattr(ixreader, "_s", ixreader)
        cands = s.lexicon(self.field, prefix=regex_prefix(self.text))
        rex = _re.compile(self.text)
        return _simplified_terms(
            self.field, (t for t in cands if rex.match(t)), self.boost
        )


_REGEX_SPECIAL = frozenset("{}()[].?*+^$\\")


def regex_prefix(text: str) -> str:
    """Literal prefix of a regex for candidate pruning — replicates the
    reference Regex._find_prefix (query/terms.py:392-408) exactly,
    including its conservative last-char drop when no special char is
    found and the ``*``/``?`` zero-repeat back-off.  A shorter prefix is
    always safe (it only widens the candidate scan)."""
    if "|" in text:
        return ""
    if text.startswith("^"):
        text = text[1:]
    elif text.startswith("\\A"):
        text = text[2:]
    i = 0
    for i, ch in enumerate(text):
        if ch in _REGEX_SPECIAL:
            break
    prefix = text[:i]
    if len(prefix) < len(text) and text[len(prefix)] in "*?":
        prefix = prefix[:-1]
    return prefix


@dataclass(frozen=True)
class TermRange(Query):
    field: str = "text"
    start: Optional[str] = None
    end: Optional[str] = None
    startexcl: bool = False
    endexcl: bool = False
    constantscore: bool = True  # equality/hash parity with the reference

    def __init__(self, field, start, end, startexcl=False, endexcl=False,
                 boost=1.0, constantscore=True):
        object.__setattr__(self, "field", field)
        object.__setattr__(self, "start", start)
        object.__setattr__(self, "end", end)
        object.__setattr__(self, "startexcl", startexcl)
        object.__setattr__(self, "endexcl", endexcl)
        object.__setattr__(self, "boost", boost)
        object.__setattr__(self, "constantscore", constantscore)

    def simplify(self, ixreader):
        s = getattr(ixreader, "_s", ixreader)

        def keep(t):
            if self.start is not None:
                if self.startexcl and t <= self.start:
                    return False
                if not self.startexcl and t < self.start:
                    return False
            if self.end is not None:
                if self.endexcl and t >= self.end:
                    return False
                if not self.endexcl and t > self.end:
                    return False
            return True

        return _simplified_terms(
            self.field, (t for t in s.lexicon(self.field) if keep(t)), self.boost
        )


def _simplified_terms(field: str, terms, boost: float):
    """MultiTerm.simplify result shape (reference terms.py:182-200):
    no existing terms -> NullQuery; one -> that Term (with the leaf's
    boost); many -> plain Or of boosted Terms."""
    terms = sorted(set(terms))
    if not terms:
        return _NullQuery()
    if len(terms) == 1:
        return Term(field, terms[0], boost=boost)
    return Or([Term(field, t, boost=boost) for t in terms])


class QueryError(Exception):
    """Raised for malformed / unanswerable queries (reference
    qcore.py:39)."""


@dataclass(frozen=True)
class _NullQuery(Query):
    """Matches nothing (reference qcore.py:593-644; the module-level
    ``NullQuery`` is an instance, and calling it returns itself)."""

    def __call__(self):
        return self

    def children(self) -> tuple:
        return ()


NullQuery = _NullQuery()


def DateRange(field, start, end, startexcl=False, endexcl=False,
              boost=1.0, constantscore=True):
    """Datetime range (reference ranges.py:405 DateRange, a thin
    NumericRange veneer).  Datetimes stay native here — the columnar
    evaluator compares timestamps directly, so no datetime_to_long
    conversion is needed; ``constantscore`` is accepted for signature
    parity (ranges already score constant 1.0·boost)."""
    return NumericRange(
        field, start, end, startexcl=startexcl, endexcl=endexcl, boost=boost
    )


@dataclass(frozen=True)
class NumericRange(Query):
    """Range over a columnar (numeric/datetime) field — evaluated as a
    vectorized Parquet predicate instead of the reference's
    tiered-precision term expansion (same doc set)."""

    field: str = ""
    start: object = None
    end: object = None
    startexcl: bool = False
    endexcl: bool = False
    constantscore: bool = True  # equality/hash parity with the reference

    def __init__(self, field, start, end, startexcl=False, endexcl=False,
                 boost=1.0, constantscore=True):
        object.__setattr__(self, "constantscore", constantscore)
        object.__setattr__(self, "field", field)
        object.__setattr__(self, "start", start)
        object.__setattr__(self, "end", end)
        object.__setattr__(self, "startexcl", startexcl)
        object.__setattr__(self, "endexcl", endexcl)
        object.__setattr__(self, "boost", boost)


@dataclass(frozen=True)
class ConstantTerms(Query):
    """Union of pre-expanded terms with CONSTANT score 1.0 per doc
    (replicates the reference's constant-score multiterm path:
    PatternQuery/TermRange default constantscore=True routed through
    ArrayUnionMatcher with scored=False, which sets every score to exactly
    1 and ignores boost — matching/combo.py:216-219).  Produced by the
    searcher's multiterm rewrite, not by users directly."""

    field: str = "text"
    termlist: tuple = ()

    def __init__(self, field, termlist, boost=1.0):
        object.__setattr__(self, "field", field)
        object.__setattr__(self, "termlist", tuple(termlist))
        object.__setattr__(self, "boost", boost)


@dataclass(frozen=True)
class ConstantScoreQuery(Query):
    """Wraps a query; every matching doc scores the constant ``score``
    (reference wrappers.py:147-181 — branch acting as a filter)."""

    child: Optional[Query] = None
    score: float = 1.0

    def __init__(self, child, score=1.0, boost=1.0):
        object.__setattr__(self, "child", child)
        object.__setattr__(self, "score", score)
        object.__setattr__(self, "boost", boost)

    def children(self) -> tuple:
        return (self.child,)


@dataclass(frozen=True)
class ColumnQuery(Query):
    """Docs whose stored column value equals ``condition`` (or satisfies it,
    when callable) — reference qcolumns.py:32-106 over our native Parquet
    columns; constant score 1.0."""

    field: str = ""
    condition: object = None

    def __init__(self, field, condition, boost=1.0):
        object.__setattr__(self, "field", field)
        object.__setattr__(self, "condition", condition)
        object.__setattr__(self, "boost", boost)


@dataclass(frozen=True)
class Every(Query):
    field: Optional[str] = None

    def __init__(self, field=None, boost=1.0):
        object.__setattr__(self, "field", field)
        object.__setattr__(self, "boost", boost)


# ---- reference-exact query strings ------------------------------------------
# Each node's __str__ matches the reference's rendering so constructed and
# parsed trees print identically (reference query/terms.py:69,317,342,386,
# 490,563, compound.py:53,308,455, positional.py:175, ranges.py:48,
# qcore.py:601,712, wrappers.py:106).  Installed as class attributes to keep
# the frozen dataclass bodies data-only.

def _term_str(self):
    t = f"{self.field}:{self.text}"
    if self.boost != 1:
        t += "^" + str(self.boost)
    return t


def _joint_str(joint):
    def _s(self):
        return "(" + joint.join(str(s) for s in self.children()) + ")"

    return _s


def _or_str(self):
    r = "(" + " OR ".join(str(s) for s in self.subqueries) + ")"
    if self.minmatch:
        r += f">{self.minmatch}"
    return r


def _dismax_str(self):
    r = "DisMax(" + " ".join(sorted(str(s) for s in self.subqueries)) + ")"
    if self.tiebreak:
        r += "~" + str(self.tiebreak)
    return r


def _fuzzy_str(self):
    r = f"{self.field}:{self.text}" + "~"
    if self.maxdist > 1:
        r += "%d" % self.maxdist
    if self.boost != 1.0:
        r += f"^{self.boost:f}"
    return r


def _range_str(self):
    startchar = "{" if self.startexcl else "["
    endchar = "}" if self.endexcl else "]"
    start = "" if self.start is None else self.start
    end = "" if self.end is None else self.end
    return f"{self.field}:{startchar}{start} TO {end}{endchar}"


Term.__str__ = _term_str
And.__str__ = _joint_str(" AND ")
Or.__str__ = _or_str
DisMax.__str__ = _dismax_str
AndNot.__str__ = _joint_str(" ANDNOT ")
AndMaybe.__str__ = _joint_str(" ANDMAYBE ")
Require.__str__ = _joint_str(" REQUIRE ")
Otherwise.__str__ = _joint_str(" OTHERWISE ")
Not.__str__ = lambda self: "NOT " + str(self.subquery)
Phrase.__str__ = lambda self: f"{self.field}:\"{' '.join(self.words)}\""
Prefix.__str__ = lambda self: f"{self.field}:{self.text}*"
Wildcard.__str__ = lambda self: f"{self.field}:{self.pattern}"
Regex.__str__ = lambda self: f'{self.field}:r"{self.text}"'
FuzzyTerm.__str__ = _fuzzy_str
Variations.__str__ = lambda self: f"{self.field}:<{self.text}>"
TermRange.__str__ = _range_str
NumericRange.__str__ = _range_str
Every.__str__ = lambda self: f"{self.field}:*"
_NullQuery.__str__ = lambda self: "<_NullQuery>"


# ---- reference operator/sequence sugar ---------------------------------------
# qcore.Query.__or__/__and__/__sub__ (qcore.py:178-204) and CompoundQuery's
# sequence protocol (compound.py:67-74).

def _q_or(self, other):
    return Or([self, other]).normalize()


def _q_and(self, other):
    return And([self, other]).normalize()


def _q_sub(self, other):
    return And([self, Not(other)]).normalize()


Query.__or__ = _q_or
Query.__and__ = _q_and
Query.__sub__ = _q_sub
_Compound.__getitem__ = lambda self, i: self.subqueries[i]
_Compound.__len__ = lambda self: len(self.subqueries)
_Compound.__iter__ = lambda self: iter(self.subqueries)
