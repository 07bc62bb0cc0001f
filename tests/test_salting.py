"""Hot-term salting: skewed terms split across reducers, same results.

North-rule requirement: explicit salting/repartitioning handles skewed hot
terms.  The salt splits a hot term's postings by contiguous docnum range
into n_salts sub-shards; queries must return byte-identical results because
the reader re-concatenates the self-contained blocks by doc_min.
"""

from __future__ import annotations

import glob
import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import pytest

from whoosh_reloaded_ray.pipelines.build import build_index, estimate_hot_terms
from whoosh_reloaded_ray.query import And, Or, Phrase, Term
from whoosh_reloaded_ray.sources.corpus import generate_transcripts, plan_partitions
from whoosh_reloaded_ray.schema import transcript_schema
from whoosh_reloaded_ray.state.searcher import IndexSearcher


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    d = tmp_path_factory.mktemp("saltcorpus")
    path = str(d / "transcripts.parquet")
    # zipf vocabulary -> genuinely skewed term frequencies
    generate_transcripts(path, n_turns=2000, avg_turn_words=30, seed=3, rows_per_file=500)
    return path


def _hottest_terms(idx_dir, n=2):
    files = glob.glob(f"{idx_dir}/seg-*/terminfo-*.parquet")
    t = pa.concat_tables(pq.read_table(f, columns=["field", "term", "doc_freq"]) for f in files)
    t = t.filter(pc.equal(t["field"], "text"))
    agg = t.group_by("term").aggregate([("doc_freq", "sum")]).sort_by(
        [("doc_freq_sum", "descending")]
    )
    return agg["term"].to_pylist()[:n]


def test_salted_build_matches_unsalted(corpus, ray_session, tmp_path_factory):
    plain_dir = str(tmp_path_factory.mktemp("plainidx"))
    build_index([corpus], plain_dir, num_shards=4, partition_rows=500)
    hot1, hot2 = _hottest_terms(plain_dir)

    salted_dir = str(tmp_path_factory.mktemp("saltidx"))
    salted = {("text", hot1): 3, ("text", hot2): 2}
    build_index([corpus], salted_dir, num_shards=4, partition_rows=500, salted_terms=salted)

    # the hot term's postings really are spread over several shard files
    s_salt = IndexSearcher(salted_dir)
    seg = s_salt.manifest.segments[0]
    assert seg.salted_terms == {"text": {hot1: 3, hot2: 2}}
    shards_with_hot1 = [
        shard
        for shard in range(seg.num_shards)
        for f in [os.path.join(salted_dir, seg.name, f"postings-{shard:04d}.parquet")]
        if os.path.exists(f)
        and pq.read_table(f, columns=["term"], filters=[("term", "=", hot1)]).num_rows > 0
    ]
    assert len(shards_with_hot1) >= 2, "salting should spread the hot term"

    s_plain = IndexSearcher(plain_dir)
    queries = [
        Term("text", hot1),
        And([Term("text", hot1), Term("text", hot2)]),
        Or([Term("text", hot1), Term("text", hot2)]),
        Phrase("text", [hot1, hot2]),
    ]
    for q in queries:
        a = s_plain.search(q, limit=None)
        b = s_salt.search(q, limit=None)
        np.testing.assert_array_equal(a["docnum"].to_numpy(), b["docnum"].to_numpy())
        np.testing.assert_allclose(a["score"].to_numpy(), b["score"].to_numpy(), atol=0)
    # stats parity through the salted terminfo aggregation
    assert s_plain.doc_frequency("text", hot1) == s_salt.doc_frequency("text", hot1)


def test_merge_preserves_salted_terms(corpus, ray_session, tmp_path_factory):
    """Merging salted segments must union the victims' salt configs into
    the merged SegmentMeta — the postings stay in salted sub-shard files
    after the block concat, and without the config the reader resolves the
    term to the unsalted base shard and finds nothing."""
    from whoosh_reloaded_ray.pipelines.merge import maybe_merge

    idx = str(tmp_path_factory.mktemp("saltmergeidx"))
    # several small segments so optimize has victims to merge
    build_index([corpus], idx, num_shards=4, partition_rows=250, rows_per_segment=500)
    hot1, hot2 = _hottest_terms(idx)
    # rebuild salted
    import shutil

    shutil.rmtree(idx)
    salted = {("text", hot1): 3, ("text", hot2): 2}
    build_index(
        [corpus], idx, num_shards=4, partition_rows=250, rows_per_segment=500,
        salted_terms=salted,
    )
    s = IndexSearcher(idx)
    assert len(s.manifest.segments) > 1
    before = {
        hot1: s.search(Term("text", hot1), limit=None).num_rows,
        hot2: s.search(Term("text", hot2), limit=None).num_rows,
    }
    assert before[hot1] > 0

    maybe_merge(idx, optimize=True)
    s2 = IndexSearcher(idx)
    assert len(s2.manifest.segments) == 1
    merged = s2.manifest.segments[0]
    assert merged.salted_terms.get("text", {}).get(hot1) == 3
    assert merged.salted_terms.get("text", {}).get(hot2) == 2
    assert s2.search(Term("text", hot1), limit=None).num_rows == before[hot1]
    assert s2.search(Term("text", hot2), limit=None).num_rows == before[hot2]
    assert s2.doc_frequency("text", hot1) == s.doc_frequency("text", hot1)


def test_salted_id_field(corpus, ray_session, tmp_path_factory):
    """Salting an id-field term (the vectorized IDTokenizer path) must
    route its postings to the salted sub-shards, not the base shard."""
    plain_dir = str(tmp_path_factory.mktemp("idplain"))
    build_index([corpus], plain_dir, num_shards=4, partition_rows=500)
    s_plain = IndexSearcher(plain_dir)
    expected = s_plain.search(Term("role", "user"), limit=None)
    assert expected.num_rows > 0

    salt_dir = str(tmp_path_factory.mktemp("idsalt"))
    build_index(
        [corpus], salt_dir, num_shards=4, partition_rows=500,
        salted_terms={("role", "user"): 3},
    )
    s_salt = IndexSearcher(salt_dir)
    got = s_salt.search(Term("role", "user"), limit=None)
    np.testing.assert_array_equal(
        expected["docnum"].to_numpy(), got["docnum"].to_numpy()
    )
    seg = s_salt.manifest.segments[0]
    shards_with = [
        shard
        for shard in range(seg.num_shards)
        for f in [os.path.join(salt_dir, seg.name, f"postings-{shard:04d}.parquet")]
        if os.path.exists(f)
        and pq.read_table(f, columns=["term"], filters=[("field", "=", "role"), ("term", "=", "user")]).num_rows > 0
    ]
    assert len(shards_with) >= 2, "salted id term should spread over sub-shards"


def test_estimate_hot_terms(corpus):
    parts = plan_partitions([corpus], target_rows=500)
    hot = estimate_hot_terms(parts, transcript_schema(), df_ratio=0.2, sample_rows=1000)
    assert hot, "zipf corpus should surface hot terms"
    assert all(f == "text" and n >= 2 for (f, _), n in hot.items())


def test_adversarial_skew_autosalt(ray_session, tmp_path):
    """Round-5 adversarial skew stress: one term in ~50% of all turns and
    one conv_id holding ~20% of all rows.  The salt AUTO-DETECTOR
    (salt_df_ratio) must engage on the hot term, spread its postings over
    several sub-shards, and every query + stat must stay byte-identical to
    the unsalted build; the fat conversation must still group/parent-join
    correctly (its docnums co-locate by docnum-range partitioning, not by a
    conv_id hash, so one hot key cannot hot-spot a reducer)."""
    import pyarrow.compute as _pc

    from whoosh_reloaded_ray.state.searcher import IndexSearcher as _S

    src = str(tmp_path / "skew.parquet")
    generate_transcripts(src, n_turns=4000, avg_turn_words=20, seed=11, rows_per_file=500)
    t = pq.read_table(src)
    rng = np.random.default_rng(5)
    texts = t["text"].to_pylist()
    hot_mask = rng.random(len(texts)) < 0.5
    texts = [
        (f"hotspot {x}" if m else x) for x, m in zip(texts, hot_mask)
    ]
    conv = np.array(t["conv_id"].to_pylist(), dtype=object)
    conv[rng.random(len(conv)) < 0.2] = "conv-fat"
    t = t.set_column(t.schema.get_field_index("text"), "text", pa.array(texts))
    t = t.set_column(
        t.schema.get_field_index("conv_id"), "conv_id", pa.array(list(conv))
    )
    pq.write_table(t, src, row_group_size=500)

    plain_dir = str(tmp_path / "plainidx")
    build_index([src], plain_dir, num_shards=4, partition_rows=500)

    salted_dir = str(tmp_path / "saltidx")
    build_index(
        [src], salted_dir, num_shards=4, partition_rows=500,
        salt_df_ratio=0.25, salt_sample_rows=2000,
    )

    s_plain, s_salt = _S(plain_dir), _S(salted_dir)
    seg = s_salt.manifest.segments[0]
    assert "hotspot" in seg.salted_terms.get("text", {}), (
        f"auto-detector missed the 50%-df term: {seg.salted_terms}"
    )
    n_salts = seg.salted_terms["text"]["hotspot"]
    assert n_salts >= 2
    shards_with = [
        shard
        for shard in range(seg.num_shards)
        for f in [os.path.join(salted_dir, seg.name, f"postings-{shard:04d}.parquet")]
        if os.path.exists(f)
        and pq.read_table(
            f, columns=["term"], filters=[("term", "=", "hotspot")]
        ).num_rows > 0
    ]
    assert len(shards_with) >= 2, "hot term not spread across sub-shards"

    queries = [
        Term("text", "hotspot"),
        And([Term("text", "hotspot"), Term("conv_id", "conv-fat")]),
        Or([Term("text", "hotspot"), Term("role", "user")]),
        Phrase("text", ["hotspot"]),
    ]
    for q in queries:
        a = s_plain.search(q, limit=None)
        b = s_salt.search(q, limit=None)
        np.testing.assert_array_equal(a["docnum"].to_numpy(), b["docnum"].to_numpy())
        np.testing.assert_allclose(a["score"].to_numpy(), b["score"].to_numpy(), atol=0)
    assert s_plain.doc_frequency("text", "hotspot") == s_salt.doc_frequency(
        "text", "hotspot"
    )
    # the 50% term really is hot, and the fat conv really is fat
    assert s_plain.doc_frequency("text", "hotspot") >= 1800
    fat = s_salt.search(Term("conv_id", "conv-fat"), limit=None)
    assert fat.num_rows >= 600
    # grouped/parent paths over the skewed conv key stay exact
    assert s_plain.search_grouped(
        Term("text", "hotspot"), "conv_id", maptype="count"
    ) == s_salt.search_grouped(Term("text", "hotspot"), "conv_id", maptype="count")
    a = s_plain.parent_search(Term("text", "hotspot"), "conv_id", limit=10)
    b = s_salt.parent_search(Term("text", "hotspot"), "conv_id", limit=10)
    assert a.to_pydict() == b.to_pydict()
