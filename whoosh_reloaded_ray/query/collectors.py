"""User-facing collector plug-point (reference ``whoosh/collectors.py``).

The reference exposes a doc-at-a-time cursor API (``Collector.collect(id)``
called once per matching document, wrappable by FilterCollector /
FacetCollector / TermsCollector...).  That protocol is inherently
single-process: every matching docnum flows through one Python method.
The Ray-Data-native re-expression is a *segment-partial* protocol — the
same pattern this engine's facet/sort/collapse layer uses internally:

- ``collect(reader, docs, scores)`` runs INSIDE each segment worker (a Ray
  actor on the ray executor), sees that segment's matches as numpy arrays
  plus the reader for column access, and returns a **bounded partial**
  (a count, a per-key dict, a top-n list — never the raw match list).
- ``combine(partials)`` runs on the driver and merges the per-worker
  partials into the final result.

A collector instance must be picklable (it is shipped to the actors); any
state mutated inside ``collect`` will NOT be visible on the driver — all
information must travel through the returned partial.  This is what keeps
a hot query (10^9 matches at 100 TB) from ever materializing on the driver.

Built-ins mirror the reference's wrapping collectors where the semantics
translate; `whoosh.collectors` features that only steer the cursor loop
(``needs_current``, replace intervals) have no analog here by design.
"""

from __future__ import annotations

import numpy as np

__all__ = [
    "VectorCollector",
    "CountCollector",
    "FieldValuesCollector",
    "StatsCollector",
    "TopFieldCollector",
]


class VectorCollector:
    """Base class for custom collectors (reference collectors.py:103).

    Subclass and implement ``collect`` + ``combine``; pass an instance to
    :meth:`IndexSearcher.search_with_collector`.
    """

    #: evaluate the query scored (BM25 etc.) or unscored (constant 1.0)
    scored: bool = True

    def collect(self, reader, docs: np.ndarray, scores: np.ndarray):
        """Reduce one segment's matches to a bounded partial.

        ``reader`` is the segment's SegmentReader: ``reader.column(field)``
        gives the segment's native column (index by
        ``reader.dense_index(docs)``), ``reader.seg`` its metadata.
        Runs on the worker — return value must be picklable and small.
        """
        raise NotImplementedError

    def combine(self, partials: list):
        """Merge the per-segment partials (driver side) into the result."""
        raise NotImplementedError


class CountCollector(VectorCollector):
    """Exact matching-doc count (reference ``Collector.count()``,
    collectors.py:172-186) without keeping a docset."""

    scored = False

    def collect(self, reader, docs, scores):
        return int(docs.size)

    def combine(self, partials):
        return sum(partials)


class FieldValuesCollector(VectorCollector):
    """Per-key match counts over a stored/native column — the reference
    FacetCollector + Count facet map (collectors.py:764, sorting.py:1010)."""

    scored = False

    def __init__(self, field: str):
        self.field = field

    def collect(self, reader, docs, scores):
        if not docs.size:
            return {}
        vals = reader.column(self.field)[reader.dense_index(docs)]
        keys, counts = np.unique(vals, return_counts=True)
        return dict(zip(keys.tolist(), counts.tolist()))

    def combine(self, partials):
        out: dict = {}
        for p in partials:
            for k, n in p.items():
                out[k] = out.get(k, 0) + n
        return out


class StatsCollector(VectorCollector):
    """min/max/sum/count/mean over a numeric column of the matching docs."""

    scored = False

    def __init__(self, field: str):
        self.field = field

    def collect(self, reader, docs, scores):
        if not docs.size:
            return None
        vals = reader.column(self.field)[reader.dense_index(docs)].astype(np.float64)
        return (float(vals.min()), float(vals.max()), float(vals.sum()), int(vals.size))

    def combine(self, partials):
        parts = [p for p in partials if p is not None]
        if not parts:
            return {"min": None, "max": None, "sum": 0.0, "count": 0, "mean": None}
        mn = min(p[0] for p in parts)
        mx = max(p[1] for p in parts)
        s = sum(p[2] for p in parts)
        n = sum(p[3] for p in parts)
        return {"min": mn, "max": mx, "sum": s, "count": n, "mean": s / n}


class TopFieldCollector(VectorCollector):
    """Top-n (score, docnum, field value) rows — each worker truncates to n
    locally, the driver merges at most workers x n rows (the distributed
    TopCollector pattern, reference collectors.py:423)."""

    def __init__(self, field: str, n: int = 10):
        self.field = field
        self.n = n

    def collect(self, reader, docs, scores):
        if not docs.size:
            return []
        order = np.lexsort((docs, -scores))[: self.n]
        vals = reader.column(self.field)[reader.dense_index(docs)]
        return [
            (float(scores[i]), int(docs[i]), vals[i].item() if hasattr(vals[i], "item") else vals[i])
            for i in order
        ]

    def combine(self, partials):
        rows = [r for p in partials for r in p]
        rows.sort(key=lambda r: (-r[0], r[1]))
        return rows[: self.n]
