"""Multi-file corpus builds + result stability (reference
tests/test_results.py test_stability: tie-breaking must be deterministic
across equivalent builds and paging)."""

from __future__ import annotations

import numpy as np
import pyarrow.parquet as pq
import pytest

from whoosh_reloaded_ray.query import Or, Term
from whoosh_reloaded_ray.sources.corpus import generate_transcripts, plan_partitions
from whoosh_reloaded_ray.state.searcher import IndexSearcher


def test_multifile_build_equals_singlefile(ray_session, tmp_path):
    """Splitting the corpus across many parquet files must not change any
    result (docnums come from the sorted-path partition plan)."""
    from whoosh_reloaded_ray.pipelines.build import build_index

    one = str(tmp_path / "one.parquet")
    generate_transcripts(one, n_turns=600, avg_turn_words=20, seed=97, rows_per_file=100)
    # split into 3 files of 200 rows (sorted file names preserve row order)
    tbl = pq.read_table(one)
    paths = []
    for i in range(3):
        p = str(tmp_path / f"part-{i:02d}.parquet")
        pq.write_table(tbl.slice(i * 200, 200), p, row_group_size=100)
        paths.append(p)

    idx1 = str(tmp_path / "idx_one")
    idx3 = str(tmp_path / "idx_three")
    build_index([one], idx1, num_shards=4, partition_rows=100)
    build_index(paths, idx3, num_shards=4, partition_rows=100)

    s1, s3 = IndexSearcher(idx1), IndexSearcher(idx3)
    assert s1.manifest.doc_count == s3.manifest.doc_count == 600
    import glob

    import pyarrow as pa

    files = glob.glob(f"{idx1}/seg-*/terminfo-*.parquet")
    t = pa.concat_tables(pq.read_table(f, columns=["field", "term"]) for f in files)
    t = t.filter(pa.compute.equal(t["field"], "text"))
    terms = sorted(set(t["term"].to_pylist()))[:8]
    for term in terms:
        a = s1.search(Term("text", term), limit=None)
        b = s3.search(Term("text", term), limit=None)
        np.testing.assert_array_equal(a["docnum"].to_numpy(), b["docnum"].to_numpy())
        np.testing.assert_allclose(a["score"].to_numpy(), b["score"].to_numpy(), atol=0)


def test_result_stability_and_paging(ray_session, tmp_path):
    """Reference test_results.py test_stability behavior: identical scores
    order by ascending docnum, and page slices agree with the full list."""
    import pyarrow as pa

    from whoosh_reloaded_ray.pipelines.build import build_index
    from whoosh_reloaded_ray.schema import IndexSchema, id_field, text_field

    # many docs with IDENTICAL text -> all scores tie
    docs = ["same words here"] * 30 + ["other content entirely"] * 5
    path = str(tmp_path / "docs.parquet")
    pq.write_table(
        pa.table({"key": pa.array([str(i) for i in range(len(docs))]), "body": pa.array(docs)}),
        path, row_group_size=10,
    )
    idx = str(tmp_path / "stabidx")
    build_index(
        [path], idx,
        schema=IndexSchema(fields=[id_field("key"), text_field("body")]),
        num_shards=2, partition_rows=10,
    )
    s = IndexSearcher(idx)
    full = s.search(Term("body", "same"), limit=None)
    docs_full = full["docnum"].to_pylist()
    # ties -> ascending docnum
    assert docs_full == sorted(docs_full)
    # page slices must match the full ordering (reference test_stability)
    for pagelen in (5, 7):
        got = []
        for page in range(1, 1 + (len(docs_full) + pagelen - 1) // pagelen):
            r = s.search(Term("body", "same"), limit=page * pagelen)
            got.append(r["docnum"].to_pylist()[(page - 1) * pagelen : page * pagelen])
        flat = [d for chunk in got for d in chunk]
        assert flat == docs_full
