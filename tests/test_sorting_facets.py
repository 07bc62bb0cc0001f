"""Sorting / faceting / collapse parity vs whoosh (reference
tests/test_sorting.py behaviors: sortedby, groupedby, collapse)."""

from __future__ import annotations

from collections import Counter

import numpy as np
import pyarrow.parquet as pq
import pytest

from whoosh_reloaded_ray.query import Or, Term
from whoosh_reloaded_ray.sources.corpus import generate_transcripts
from whoosh_reloaded_ray.state.searcher import IndexSearcher


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    d = tmp_path_factory.mktemp("scorpus")
    path = str(d / "transcripts.parquet")
    generate_transcripts(path, n_turns=600, avg_turn_words=20, seed=31, rows_per_file=150)
    return path


@pytest.fixture(scope="module")
def our_index(corpus, ray_session, tmp_path_factory):
    from whoosh_reloaded_ray.pipelines.build import build_index

    idx_dir = str(tmp_path_factory.mktemp("sindex"))
    build_index([corpus], idx_dir, num_shards=4, partition_rows=150)
    return IndexSearcher(idx_dir)


@pytest.fixture(scope="module")
def whoosh_index(corpus, whoosh, tmp_path_factory):
    from whoosh import fields, index

    schema = fields.Schema(
        conv_id=fields.ID(stored=True, sortable=True),
        turn_idx=fields.NUMERIC(int, stored=True, sortable=True),
        role=fields.ID(stored=True, sortable=True),
        text=fields.TEXT,
        ts=fields.DATETIME(stored=True, sortable=True),
    )
    d = str(tmp_path_factory.mktemp("swhoosh"))
    ix = index.create_in(d, schema)
    w = ix.writer(limitmb=256)
    for row in pq.read_table(corpus).to_pylist():
        w.add_document(
            conv_id=row["conv_id"],
            turn_idx=row["turn_idx"],
            role=row["role"],
            text=row["text"],
            ts=row["ts"],
        )
    w.commit()
    return ix


@pytest.fixture(scope="module")
def mid_term(corpus):
    from whoosh_reloaded_ray.functions.analysis import make_analyzer, standard_analyzer

    analyze = make_analyzer(standard_analyzer())
    ctr = Counter()
    for t in pq.read_table(corpus, columns=["text"])["text"].to_pylist():
        ctr.update(tok for tok, _ in analyze(t))
    ordered = [w for w, _ in ctr.most_common()]
    return ordered[len(ordered) // 10]


def test_sortedby_numeric(our_index, whoosh_index, mid_term):
    q = Term("text", mid_term)
    ours = our_index.search_sorted(q, "turn_idx", limit=20)
    with whoosh_index.searcher() as s:
        from whoosh.query import Term as WT

        r = s.search(WT("text", mid_term), sortedby="turn_idx", limit=20)
        theirs = [h.docnum for h in r]
    assert ours["docnum"].to_pylist() == theirs


def test_sortedby_string_reverse(our_index, whoosh_index, mid_term):
    q = Term("text", mid_term)
    ours = our_index.search_sorted(q, "conv_id", limit=15, reverse=True)
    with whoosh_index.searcher() as s:
        from whoosh.query import Term as WT

        r = s.search(WT("text", mid_term), sortedby="conv_id", reverse=True, limit=15)
        theirs = [h.docnum for h in r]
    assert ours["docnum"].to_pylist() == theirs


def test_sortedby_multi(our_index, whoosh_index, mid_term):
    q = Term("text", mid_term)
    ours = our_index.search_sorted(q, ["role", "turn_idx"], limit=None)
    with whoosh_index.searcher() as s:
        from whoosh import sorting
        from whoosh.query import Term as WT

        facet = sorting.MultiFacet(["role", "turn_idx"])
        r = s.search(WT("text", mid_term), sortedby=facet, limit=None)
        theirs = [h.docnum for h in r]
    assert ours["docnum"].to_pylist() == theirs


def test_groupedby(our_index, whoosh_index, mid_term):
    q = Term("text", mid_term)
    ours = our_index.search_grouped(q, "role", limit=None)
    with whoosh_index.searcher() as s:
        from whoosh.query import Term as WT

        r = s.search(WT("text", mid_term), groupedby="role", limit=None)
        theirs = r.groups("role")
    assert ours == theirs


def test_facet_counts(our_index, whoosh_index, mid_term):
    q = Term("text", mid_term)
    ours = our_index.facet_counts(q, "role")
    with whoosh_index.searcher() as s:
        from whoosh import sorting
        from whoosh.query import Term as WT

        r = s.search(
            WT("text", mid_term),
            groupedby=sorting.FieldFacet("role", maptype=sorting.Count),
            limit=None,
        )
        theirs = r.groups("role")
    assert ours == theirs


def test_collapse(our_index, whoosh_index, mid_term):
    q = Term("text", mid_term)
    ours = our_index.search_collapsed(q, "conv_id", limit=10, collapse_limit=1)
    with whoosh_index.searcher() as s:
        from whoosh.query import Term as WT

        r = s.search(WT("text", mid_term), collapse="conv_id", collapse_limit=1, limit=10)
        theirs = [(h.docnum, h.score) for h in r]
    assert ours["docnum"].to_pylist() == [d for d, _ in theirs]
    np.testing.assert_allclose(
        ours["score"].to_pylist(), [sc for _, sc in theirs], atol=1e-6
    )


def test_groupedby_multifacet(our_index, whoosh_index, mid_term):
    """MultiFacet grouping: tuple keys, OrderedList order parity."""
    from whoosh import sorting
    from whoosh.query import Term as WT

    q = Term("text", mid_term)
    ours = our_index.search_grouped(q, ["role", "turn_idx"], limit=None)
    with whoosh_index.searcher() as s:
        facet = sorting.MultiFacet(["role", "turn_idx"])
        r = s.search(WT("text", mid_term), groupedby={"rt": facet}, limit=None)
        theirs = r.groups("rt")
    theirs = {tuple(k) if isinstance(k, (list, tuple)) else k: v for k, v in theirs.items()}
    assert ours == theirs


def test_groupedby_best_and_count(our_index, whoosh_index, mid_term):
    """Best / Count facet maps parity."""
    from whoosh import sorting
    from whoosh.query import Term as WT

    q = Term("text", mid_term)
    ours_best = our_index.search_grouped(q, "role", maptype="best")
    ours_count = our_index.search_grouped(q, "role", maptype="count")
    with whoosh_index.searcher() as s:
        r = s.search(
            WT("text", mid_term),
            groupedby={"role": sorting.FieldFacet("role", maptype=sorting.Best)},
            limit=None,
        )
        theirs_best = dict(r.groups("role"))
        r2 = s.search(
            WT("text", mid_term),
            groupedby={"role": sorting.FieldFacet("role", maptype=sorting.Count)},
            limit=None,
        )
        theirs_count = dict(r2.groups("role"))
    assert ours_best == theirs_best
    assert ours_count == theirs_count


def test_facet_counts_range(our_index, whoosh_index, mid_term):
    """RangeFacet counts parity over numeric buckets."""
    from whoosh import sorting
    from whoosh.query import Term as WT

    q = Term("text", mid_term)
    ours = our_index.facet_counts_range(q, "turn_idx", 0, 8, 2)
    with whoosh_index.searcher() as s:
        facet = sorting.RangeFacet("turn_idx", 0, 8, 2, maptype=sorting.Count)
        r = s.search(WT("text", mid_term), groupedby={"b": facet}, limit=None)
        theirs = {k: v for k, v in r.groups("b").items() if k is not None}
    ours_cmp = {(int(lo), int(hi)): n for (lo, hi), n in ours.items()}
    theirs_cmp = {tuple(k): v for k, v in theirs.items()}
    assert ours_cmp == theirs_cmp


def test_facet_counts_daterange(our_index, whoosh_index, mid_term):
    """DateRangeFacet counts parity over datetime buckets (ts column)."""
    import datetime as dt

    import pyarrow.parquet as pq_

    from whoosh import sorting
    from whoosh.query import Term as WT

    q = Term("text", mid_term)
    start = dt.datetime(2026, 1, 1)
    end = dt.datetime(2026, 1, 1, 0, 10)
    gap = dt.timedelta(minutes=2)
    ours = our_index.facet_counts_range(q, "ts", start, end, gap)
    ours_cmp = {
        (np.datetime64(lo, "us").astype("datetime64[s]").item(),
         np.datetime64(hi, "us").astype("datetime64[s]").item()): n
        for (lo, hi), n in ours.items()
    }
    with whoosh_index.searcher() as s:
        facet = sorting.DateRangeFacet("ts", start, end, gap, maptype=sorting.Count)
        r = s.search(WT("text", mid_term), groupedby={"b": facet}, limit=None)
        theirs = {tuple(k): v for k, v in r.groups("b").items() if k is not None}
    assert ours_cmp == theirs
