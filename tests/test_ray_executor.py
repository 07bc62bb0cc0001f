"""The query-side Ray actor-pool executor must return byte-identical
results to the local executor (segments partition the doc space; per-actor
evaluation + driver merge is exact)."""

from __future__ import annotations

from collections import Counter

import numpy as np
import pyarrow.parquet as pq
import pytest

from whoosh_reloaded_ray.query import And, Not, Or, Phrase, Prefix, Term
from whoosh_reloaded_ray.sources.corpus import generate_transcripts
from whoosh_reloaded_ray.state.searcher import IndexSearcher


@pytest.fixture(scope="module")
def idx_dir(ray_session, tmp_path_factory):
    from whoosh_reloaded_ray.pipelines.build import build_index

    d = tmp_path_factory.mktemp("rexcorpus")
    path = str(d / "transcripts.parquet")
    generate_transcripts(path, n_turns=900, avg_turn_words=20, seed=71, rows_per_file=150)
    idx = str(tmp_path_factory.mktemp("rexidx"))
    # several segments so actors actually split work
    build_index([path], idx, num_shards=4, partition_rows=150, rows_per_segment=300)
    return idx


def _vocab(idx_dir):
    import glob

    import pyarrow as pa

    files = glob.glob(f"{idx_dir}/seg-*/terminfo-*.parquet")
    t = pa.concat_tables(pq.read_table(f, columns=["field", "term", "doc_freq"]) for f in files)
    t = t.filter(pa.compute.equal(t["field"], "text"))
    agg = t.group_by("term").aggregate([("doc_freq", "sum")]).sort_by(
        [("doc_freq_sum", "descending")]
    )
    return agg["term"].to_pylist()


def test_ray_executor_matches_local(idx_dir):
    local = IndexSearcher(idx_dir, executor="local")
    rays = IndexSearcher(idx_dir, executor="ray", num_actors=3)
    vocab = _vocab(idx_dir)
    t1, t2 = vocab[2], vocab[40]
    queries = [
        Term("text", t1),
        Or([Term("text", t1), Term("text", t2)]),
        And([Term("text", t1), Not(Term("text", t2))]),
        Phrase("text", [t1, t2]),
        Prefix("text", t1[:2]),
    ]
    for q in queries:
        a = local.search(q, limit=15)
        b = rays.search(q, limit=15)
        np.testing.assert_array_equal(a["docnum"].to_numpy(), b["docnum"].to_numpy())
        np.testing.assert_allclose(a["score"].to_numpy(), b["score"].to_numpy(), atol=0)
    # stats APIs agree too
    assert local.doc_frequency("text", t1) == rays.doc_frequency("text", t1)
    assert local.frequencies([("text", t1)]) == rays.frequencies([("text", t1)])


def test_ray_executor_facets_and_sorting(idx_dir):
    local = IndexSearcher(idx_dir, executor="local")
    rays = IndexSearcher(idx_dir, executor="ray", num_actors=3)
    vocab = _vocab(idx_dir)
    q = Term("text", vocab[3])
    assert local.facet_counts(q, "role") == rays.facet_counts(q, "role")
    a = local.search_sorted(q, "turn_idx", limit=10)
    b = rays.search_sorted(q, "turn_idx", limit=10)
    assert a["docnum"].to_pylist() == b["docnum"].to_pylist()
    assert local.search_grouped(q, "role") == rays.search_grouped(q, "role")


def test_two_phase_wand_matches_local(idx_dir):
    """Multi-segment workers take the two-phase global-theta WAND path;
    results must stay byte-identical to the local executor."""
    local = IndexSearcher(idx_dir, executor="local")
    rays = IndexSearcher(idx_dir, executor="ray", num_actors=1)  # 1 worker, 3 segments
    assert any(n > 1 for n in rays._group_sizes)
    vocab = _vocab(idx_dir)
    for q in (
        Term("text", vocab[0]),                      # hot term
        Or([Term("text", vocab[1]), Term("text", vocab[30])]),
        Or([Term("text", vocab[5], boost=2.0), Term("text", vocab[50])]),
    ):
        for limit in (3, 10):
            a = local.search(q, limit=limit)
            b = rays.search(q, limit=limit)
            np.testing.assert_array_equal(a["docnum"].to_numpy(), b["docnum"].to_numpy())
            np.testing.assert_allclose(a["score"].to_numpy(), b["score"].to_numpy(), atol=0)


def test_export_matches(idx_dir, tmp_path):
    """Streaming per-segment match export equals a driver-side search with
    limit=None; write_parquet round-trips."""
    from whoosh_reloaded_ray.pipelines.export import export_matches, matches_dataset

    local = IndexSearcher(idx_dir)
    vocab = _vocab(idx_dir)
    q = Or([Term("text", vocab[1]), Term("text", vocab[25])])
    want = local.search(q, limit=None)
    ds = matches_dataset(idx_dir, q, columns=["conv_id", "turn_idx"])
    import pyarrow as pa

    got = pa.concat_tables(list(ds.iter_batches(batch_format="pyarrow"))).sort_by("docnum")
    assert got["docnum"].to_pylist() == sorted(want["docnum"].to_pylist())
    bydoc = dict(zip(want["docnum"].to_pylist(), want["score"].to_pylist()))
    np.testing.assert_allclose(
        got["score"].to_numpy(), [bydoc[d] for d in got["docnum"].to_pylist()], atol=0
    )
    out = str(tmp_path / "export")
    n = export_matches(idx_dir, q, out, columns=["conv_id"])
    assert n == want.num_rows


def test_distributed_aggregates_match_local(idx_dir):
    """The per-segment partial-aggregate paths (facet/sort/grouped/collapse/
    parent) must agree between executors and across maptypes/limits."""
    local = IndexSearcher(idx_dir, executor="local")
    rays = IndexSearcher(idx_dir, executor="ray", num_actors=3)
    vocab = _vocab(idx_dir)
    q = Or([Term("text", vocab[1]), Term("text", vocab[10])])

    for maptype in ("count", "best", "ordered"):
        assert local.search_grouped(q, "role", maptype=maptype) == rays.search_grouped(
            q, "role", maptype=maptype
        ), maptype
    # multi-field grouping (MultiFacet tuples)
    assert local.search_grouped(q, ["role", "turn_idx"], maptype="count") == \
        rays.search_grouped(q, ["role", "turn_idx"], maptype="count")
    # bounded (limit) path still matches
    assert local.search_grouped(q, "role", limit=20, maptype="count") == \
        rays.search_grouped(q, "role", limit=20, maptype="count")

    a = local.search_collapsed(q, "role", limit=5, collapse_limit=2)
    b = rays.search_collapsed(q, "role", limit=5, collapse_limit=2)
    assert a["docnum"].to_pylist() == b["docnum"].to_pylist()
    assert a["score"].to_pylist() == b["score"].to_pylist()

    a = local.parent_search(q, "conv_id", limit=10)
    b = rays.parent_search(q, "conv_id", limit=10)
    assert a.to_pydict() == b.to_pydict()

    a = local.search_sorted(q, ["role", "turn_idx"], limit=15, reverse=True)
    b = rays.search_sorted(q, ["role", "turn_idx"], limit=15, reverse=True)
    assert a["docnum"].to_pylist() == b["docnum"].to_pylist()

    assert local.facet_counts_range(q, "turn_idx", 0, 10, 2) == \
        rays.facet_counts_range(q, "turn_idx", 0, 10, 2)
