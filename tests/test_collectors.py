"""User collector plug-point (reference collectors.py Collector API,
re-expressed as distributed segment partials — SURVEY §2.12)."""

from __future__ import annotations

import numpy as np
import pyarrow.parquet as pq
import pytest

from whoosh_reloaded_ray.query import (
    CountCollector,
    FieldValuesCollector,
    Or,
    StatsCollector,
    Term,
    TopFieldCollector,
    VectorCollector,
)
from whoosh_reloaded_ray.sources.corpus import generate_transcripts
from whoosh_reloaded_ray.state.searcher import IndexSearcher


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    d = tmp_path_factory.mktemp("ccorpus")
    path = str(d / "transcripts.parquet")
    generate_transcripts(path, n_turns=500, avg_turn_words=20, seed=77, rows_per_file=125)
    return path


@pytest.fixture(scope="module")
def searcher(corpus, ray_session, tmp_path_factory):
    from whoosh_reloaded_ray.pipelines.build import build_index

    idx_dir = str(tmp_path_factory.mktemp("cindex"))
    build_index([corpus], idx_dir, num_shards=2, partition_rows=125)
    return IndexSearcher(idx_dir)


@pytest.fixture(scope="module")
def some_term(corpus):
    from collections import Counter

    from whoosh_reloaded_ray.functions.analysis import make_analyzer, standard_analyzer

    an = make_analyzer(standard_analyzer())
    c = Counter()
    for t in pq.read_table(corpus, columns=["text"])["text"].to_pylist():
        c.update({w for w, _ in an(t)})
    return c.most_common(1)[0][0]


def test_count_collector(searcher, some_term):
    q = Term("text", some_term)
    n = searcher.search_with_collector(q, CountCollector())
    assert n == searcher.search(q, limit=None).num_rows
    assert n > 0


def test_field_values_collector(searcher, some_term):
    q = Term("text", some_term)
    got = searcher.search_with_collector(q, FieldValuesCollector("role"))
    # oracle: group the full result set by the role column
    res = searcher.search(q, limit=None)
    docs = np.sort(res["docnum"].to_numpy())
    roles = searcher._doc_values("role", docs)
    expect: dict = {}
    for r in roles.tolist():
        expect[r] = expect.get(r, 0) + 1
    assert got == expect


def test_stats_collector(searcher, some_term):
    q = Term("text", some_term)
    got = searcher.search_with_collector(q, StatsCollector("turn_idx"))
    res = searcher.search(q, limit=None)
    docs = np.sort(res["docnum"].to_numpy())
    vals = searcher._doc_values("turn_idx", docs).astype(np.float64)
    assert got["count"] == vals.size
    assert got["min"] == vals.min() and got["max"] == vals.max()
    np.testing.assert_allclose(got["mean"], vals.mean())


def test_top_field_collector(searcher, some_term):
    q = Term("text", some_term)
    rows = searcher.search_with_collector(q, TopFieldCollector("conv_id", n=5))
    res = searcher.search(q, limit=5)
    assert [d for _, d, _ in rows] == res["docnum"].to_pylist()
    np.testing.assert_allclose([s for s, _, _ in rows], res["score"].to_pylist())


class _EvenOddCollector(VectorCollector):
    """Custom user collector: count matches by docnum parity."""

    scored = False

    def collect(self, reader, docs, scores):
        even = int((docs % 2 == 0).sum())
        return (even, int(docs.size) - even)

    def combine(self, partials):
        return (sum(p[0] for p in partials), sum(p[1] for p in partials))


def test_custom_collector(searcher, some_term):
    q = Or([Term("text", some_term), Term("role", "user")])
    even, odd = searcher.search_with_collector(q, _EvenOddCollector())
    docs = searcher.search(q, limit=None)["docnum"].to_numpy()
    assert even == int((docs % 2 == 0).sum())
    assert even + odd == docs.size


def test_collector_on_ray_executor(corpus, ray_session, tmp_path_factory, some_term):
    from whoosh_reloaded_ray.pipelines.build import build_index

    idx_dir = str(tmp_path_factory.mktemp("cindex_ray"))
    build_index([corpus], idx_dir, num_shards=2, partition_rows=125)
    s = IndexSearcher(idx_dir, executor="ray", num_actors=2)
    q = Term("text", some_term)
    n = s.search_with_collector(q, CountCollector())
    got = s.search_with_collector(q, FieldValuesCollector("role"))
    local = IndexSearcher(idx_dir)
    assert n == local.search_with_collector(q, CountCollector())
    assert got == local.search_with_collector(q, FieldValuesCollector("role"))
