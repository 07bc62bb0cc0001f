"""pyarrow.fs storage seam: the whole index lifecycle over a file:// URI.

Build, manifest commit/load, segment shard writes, query reads, doclens,
and GC all route through state/storage.py's FileSystem resolution instead
of plain os paths — the slot an S3/GCS URI drops into on a real cluster.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow.parquet as pq
import pytest


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    from whoosh_reloaded_ray.sources.corpus import generate_transcripts

    d = tmp_path_factory.mktemp("fscorpus")
    path = str(d / "t.parquet")
    generate_transcripts(path, n_turns=3_000, avg_turn_words=20, seed=17,
                         rows_per_file=1_000)
    return path


def test_fs_uri_index_lifecycle(ray_session, corpus, tmp_path):
    from whoosh_reloaded_ray.pipelines.build import build_index
    from whoosh_reloaded_ray.query import And, Or, Term
    from whoosh_reloaded_ray.state.manifest import load_manifest
    from whoosh_reloaded_ray.state.searcher import IndexSearcher

    plain_dir = str(tmp_path / "plain")
    uri_dir = "file://" + str(tmp_path / "viafs")

    m1 = build_index([corpus], plain_dir, num_shards=4, partition_rows=1_000)
    m2 = build_index([corpus], uri_dir, num_shards=4, partition_rows=1_000)
    assert [s.name for s in m2.segments] == [s.name for s in m1.segments]
    assert m2.field_length("text") == m1.field_length("text")

    # manifest loads back through the URI
    loaded = load_manifest(uri_dir)
    assert loaded is not None and loaded.doc_count == m1.doc_count

    # identical search results through both storage routes
    s_uri = IndexSearcher(uri_dir)
    s_plain = IndexSearcher(plain_dir)
    from collections import Counter

    c = Counter(
        w
        for t in pq.read_table(corpus, columns=["text"])["text"].to_pylist()
        for w in t.lower().split()
    )
    probes = [w for w, _ in c.most_common(40) if len(w) > 3][:4]
    for i in range(0, len(probes), 2):
        q = Or([Term("text", probes[i]), And([Term("text", probes[i + 1])])])
        a = s_uri.search(q, limit=10)
        b = s_plain.search(q, limit=10)
        assert a["docnum"].to_pylist() == b["docnum"].to_pylist()
        assert a["score"].to_pylist() == b["score"].to_pylist()

    # resume over the URI is a no-op (lineage read back through fs)
    m3 = build_index([corpus], uri_dir, num_shards=4, partition_rows=1_000)
    assert m3.generation == m2.generation


def test_fs_uri_delete_merge_gc(ray_session, corpus, tmp_path):
    """Tombstone writes, segment merge, and GC all route through the seam."""
    from whoosh_reloaded_ray.pipelines.build import build_index
    from whoosh_reloaded_ray.pipelines.merge import maybe_merge
    from whoosh_reloaded_ray.pipelines.write_ops import delete_by_term
    from whoosh_reloaded_ray.query import Term
    from whoosh_reloaded_ray.state import storage
    from whoosh_reloaded_ray.state.manifest import clean_files, load_manifest
    from whoosh_reloaded_ray.state.searcher import IndexSearcher

    uri_dir = "file://" + str(tmp_path / "idx")
    # small rows_per_segment -> several segments so the merge has victims
    build_index([corpus], uri_dir, num_shards=2, partition_rows=500,
                rows_per_segment=1_000)

    word = pq.read_table(corpus, columns=["text"])["text"][0].as_py().split()[0].lower()
    n_before = IndexSearcher(uri_dir).search(Term("text", word), limit=None).num_rows
    ndel = delete_by_term(uri_dir, "text", word)
    assert ndel == n_before > 0
    assert IndexSearcher(uri_dir).search(Term("text", word), limit=None).num_rows == 0

    m = maybe_merge(uri_dir, optimize=True)
    assert len(m.segments) == 1
    assert IndexSearcher(uri_dir).search(Term("text", word), limit=None).num_rows == 0

    clean_files(uri_dir, keep_generations=1)
    names = storage.listdir(uri_dir)
    live = {s.name for s in load_manifest(uri_dir).segments}
    assert {n for n in names if n.startswith("seg-")} == live


def test_fs_uri_helpers(tmp_path):
    from whoosh_reloaded_ray.state import storage

    uri = "file://" + str(tmp_path / "sub")
    assert storage.is_uri(uri) and not storage.is_uri(str(tmp_path))
    storage.makedirs(uri)
    assert storage.exists(uri)
    storage.write_text_atomic(storage.join(uri, "a.json"), '{"x": 1}')
    assert storage.read_json(storage.join(uri, "a.json")) == {"x": 1}
    assert storage.listdir(uri) == ["a.json"]
    import pyarrow as pa

    t = pa.table({"v": [1, 2, 3]})
    storage.write_parquet_atomic(t, storage.join(uri, "t.parquet"))
    assert storage.read_parquet(storage.join(uri, "t.parquet")).equals(t)
    assert storage.getsize(storage.join(uri, "t.parquet")) > 0
    storage.remove(storage.join(uri, "a.json"))
    assert storage.listdir(uri) == ["t.parquet"]
    storage.rmtree(uri)
    assert not storage.exists(uri)
    assert storage.listdir("file://" + str(tmp_path / "missing")) == []
