"""Query-tree normalization (reference CompoundQuery.normalize,
query/compound.py:116-180 + RangeMixin.overlaps/merge, ranges.py:95-149).

Applied by the parsers (the reference's ``QueryParser.parse`` normalizes by
default; direct AST searches are NOT normalized, matching the reference's
``Searcher.search``).  Scope: flatten nested same-class And/Or with boost
multiplication, merge overlapping TermRanges (intersect under And, union
under Or — NumericRanges intentionally do NOT merge, replicating the
reference's ``isinstance(other, TermRange)`` guard), drop empty groups,
de-duplicate subqueries, unwrap singletons.
"""

from __future__ import annotations

import dataclasses

from . import ast


class _Extreme:
    """Totally ordered sentinel below (or above) every value (reference
    qcore.Lowest/Highest)."""

    def __init__(self, is_low: bool):
        self._low = is_low

    def __eq__(self, o):
        return isinstance(o, _Extreme) and o._low == self._low

    def __lt__(self, o):
        return self._low and not self.__eq__(o)

    def __gt__(self, o):
        return (not self._low) and not self.__eq__(o)

    def __le__(self, o):
        return self._low or self.__eq__(o)

    def __ge__(self, o):
        return (not self._low) or self.__eq__(o)

    def __hash__(self):
        return hash(("_extreme", self._low))


_LOWEST, _HIGHEST = _Extreme(True), _Extreme(False)


def _comparable_start(r: ast.TermRange):
    if r.start is None:
        return (_LOWEST, 0)
    return (r.start, 1 if r.startexcl else 0)


def _comparable_end(r: ast.TermRange):
    if r.end is None:
        return (_HIGHEST, 0)
    return (r.end, -1 if r.endexcl else 0)


def _ranges_overlap(a: ast.TermRange, b: ast.TermRange) -> bool:
    s1, s2 = _comparable_start(a), _comparable_start(b)
    e1, e2 = _comparable_end(a), _comparable_end(b)
    return (
        (s2 <= s1 <= e2)
        or (s2 <= e1 <= e2)
        or (s1 <= s2 <= e1)
        or (s1 <= e2 <= e1)
    )


def _merge_ranges(a: ast.TermRange, b: ast.TermRange, intersect: bool) -> ast.TermRange:
    s1, s2 = _comparable_start(a), _comparable_start(b)
    e1, e2 = _comparable_end(a), _comparable_end(b)
    if s1 >= s2 and e1 <= e2:
        start, end = s2, e2
    elif s2 >= s1 and e2 <= e1:
        start, end = s1, e1
    elif intersect:
        start, end = max(s1, s2), min(e1, e2)
    else:
        start, end = min(s1, s2), max(e1, e2)
    startval = None if isinstance(start[0], _Extreme) else start[0]
    endval = None if isinstance(end[0], _Extreme) else end[0]
    return ast.TermRange(
        a.field,
        startval,
        endval,
        startexcl=start[1] == 1,
        endexcl=end[1] == -1,
        boost=max(a.boost, b.boost),
    )


def _is_empty(q: ast.Query) -> bool:
    if isinstance(q, ast._NullQuery):
        return True
    return isinstance(q, (ast.And, ast.Or, ast.DisMax)) and not q.subqueries


def normalize(q: ast.Query) -> ast.Query:
    if isinstance(q, (ast.And, ast.Or)):
        flat = []
        for s in (normalize(s) for s in q.subqueries):
            if type(s) is type(q):
                # hoist nested same-class group, multiplying its boost in
                flat.extend(
                    dataclasses.replace(ss, boost=ss.boost * s.boost)
                    for ss in s.subqueries
                )
            elif not _is_empty(s):
                flat.append(s)
        # merge overlapping TermRanges on the same field
        i = 0
        while i < len(flat):
            r = flat[i]
            if isinstance(r, ast.TermRange):
                j = i + 1
                while j < len(flat):
                    other = flat[j]
                    if (
                        isinstance(other, ast.TermRange)
                        and other.field == r.field
                        and _ranges_overlap(r, other)
                    ):
                        flat.pop(j)
                        r = _merge_ranges(r, other, intersect=isinstance(q, ast.And))
                    else:
                        j += 1
                # a fully open merged range matches every doc with the
                # field (reference TermRange.normalize, ranges.py)
                if (
                    r.start is None and r.end is None
                    and not r.startexcl and not r.endexcl
                ):
                    r = ast.Every(r.field, boost=r.boost)
                flat[i] = r
            i += 1
        # Every absorption (reference compound.py:133-170): an unfielded
        # Every makes the whole group Every(); a fielded Every drops every
        # other sibling whose Query.field() — the common field of ALL its
        # descendants, None for Not and mixed-field compounds — matches
        # (before OR after it)
        if any(
            isinstance(s, ast.Every) and s.field in (None, "", "*") for s in flat
        ):
            return ast.Every()
        everyfields = {
            s.field for s in flat if isinstance(s, ast.Every)
        }
        if everyfields:
            flat = [
                s
                for s in flat
                if isinstance(s, ast.Every)
                or _field_of(s) not in everyfields
            ]
        # de-duplicate, keeping first occurrence
        out, seen = [], set()
        for s in flat:
            try:
                if s in seen:
                    continue
                seen.add(s)
            except TypeError:  # unhashable payload (e.g. DocSet)
                pass
            out.append(s)
        if not out:
            # reference And/Or.normalize of an empty group -> NullQuery
            # (qcore.py); evaluates to the empty docset
            return ast.NullQuery
        if len(out) == 1:
            s = out[0]
            return dataclasses.replace(s, boost=s.boost * q.boost)
        if isinstance(q, ast.Or):
            # reference Or.normalize carries minmatch/scale onto the
            # normalized copy (compound.py:316-321)
            return ast.Or(out, boost=q.boost, scale=q.scale, minmatch=q.minmatch)
        return type(q)(out, boost=q.boost)
    if isinstance(q, ast.DisMax):
        subs = [s for s in (normalize(s) for s in q.subqueries) if not _is_empty(s)]
        return ast.DisMax(subs, boost=q.boost, tiebreak=q.tiebreak)
    if isinstance(q, ast.Not):
        # Not(NullQuery) -> NullQuery (reference wrappers.py:121-126)
        sub = normalize(q.subquery)
        if _is_empty(sub):
            return ast.Or([])
        return ast.Not(sub, boost=q.boost)
    if isinstance(q, (ast.AndNot, ast.AndMaybe, ast.Require, ast.Otherwise)):
        # binary-query null rewrites (reference compound.py:530-658):
        #   AndNot/AndMaybe: a null -> null; b null -> a
        #   Require:         either null -> null
        #   Otherwise (BinaryQuery base): null side drops away
        a, b = normalize(q.a), normalize(q.b)
        ea, eb = _is_empty(a), _is_empty(b)
        if isinstance(q, (ast.AndNot, ast.AndMaybe)):
            if ea:
                return ast.Or([])
            if eb:
                return a
        elif isinstance(q, ast.Require):
            if ea or eb:
                return ast.Or([])
        else:  # Otherwise
            if ea and eb:
                return ast.Or([])
            if ea:
                return b
            if eb:
                return a
        return type(q)(a, b, boost=q.boost)
    if isinstance(q, ast.Wildcard):
        # reference Wildcard.normalize (terms.py): no wildcard chars ->
        # plain Term; single trailing star -> Prefix
        if "*" not in q.pattern and "?" not in q.pattern:
            return ast.Term(q.field, q.pattern, boost=q.boost)
        core = q.pattern[:-1]
        if q.pattern.endswith("*") and "*" not in core and "?" not in core:
            return ast.Prefix(q.field, core, boost=q.boost)
        return q
    if isinstance(q, ast.TermRange):
        if (
            q.start is None and q.end is None
            and not q.startexcl and not q.endexcl
        ):
            return ast.Every(q.field, boost=q.boost)
        # point range (reference TermRange.normalize, ranges.py:196-203):
        # [x to x] -> Term; {x to x} / [x to x} is empty
        if q.start is not None and q.start == q.end:
            if q.startexcl or q.endexcl:
                return ast.Or([])
            return ast.Term(q.field, q.start, boost=q.boost)
        return q
    return q


_MISSING = object()


def _field_of(q: ast.Query):
    """The reference's ``Query.field()``: the single field a query
    matches in, or None (Not always answers None; compounds answer
    the common field of their children, None when mixed)."""
    if isinstance(q, ast.Not):
        return None
    f = getattr(q, "field", _MISSING)
    if f is not _MISSING:
        return f
    kids = q.children()
    if kids:
        fields = {_field_of(c) for c in kids}
        if len(fields) == 1:
            return next(iter(fields))
    return None
