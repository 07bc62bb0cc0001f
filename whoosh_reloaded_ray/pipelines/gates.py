"""Folded driver-verification gates.

The correctness driver runs the first 50 ``queries()`` entries; round 2 had 73
gates, leaving 23 driver-unverified.  This module folds groups of same-domain
gates into single union gates — each sub-case keeps its full result set, tagged
by a ``which`` column whose value is the original gate name — so every
oracle-checked gate sits inside the driver's window.  Nothing is weakened: the
oracle SQL is the union of the original oracles, so row counts, schemas and
value hashes still verify every sub-case.

Columns absent from one sub-case are padded with typed NULLs.  Both sides of
the compare go through pandas (``Dataset.to_pandas`` vs ``duckdb.sql().df()``),
where a nullable integer column becomes float64/NaN identically, so the
stringified value hashes agree.  Folds never pad *string* columns (pandas
would stringify a missing string as ``nan`` while DuckDB yields ``None``).
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

import pandas as pd


def _to_df(res: Any) -> pd.DataFrame:
    if isinstance(res, pd.DataFrame):
        return res
    return res.to_pandas()


def fold_queries(
    cases: list[tuple[str, Callable[[str], Any]]],
    columns: list[str],
    renames: dict[str, dict[str, str]] | None = None,
) -> Callable[[str], pd.DataFrame]:
    """Union the results of several gate callables into one DataFrame.

    Each sub-result is tagged with ``which`` = the original gate name and
    reindexed to the unified ``columns`` (missing columns become NaN, matching
    the typed-NULL padding on the SQL side).
    """

    def run(sf_dir: str) -> pd.DataFrame:
        parts = []
        for which, fn in cases:
            df = _to_df(fn(sf_dir))
            if renames and which in renames:
                df = df.rename(columns=renames[which])
            df = df.reindex(columns=columns)
            df.insert(0, "which", which)
            parts.append(df)
        return pd.concat(parts, ignore_index=True)

    return run


def fold_sql(
    cases: list[tuple[str, str, dict[str, str | None] | None]],
    columns: list[tuple[str, str]],
) -> str:
    """Build the union oracle: each case is (which, sql, mapping).

    ``mapping`` maps a unified column name to the source column in that case's
    oracle (default: same name) or ``None`` for a typed NULL.  ``columns`` is
    the unified (name, duckdb_type) list; types are used only for NULL pads.
    """
    ctes = ",\n".join(f"c{i} AS ({sql})" for i, (_, sql, _) in enumerate(cases))
    selects = []
    for i, (which, _, mapping) in enumerate(cases):
        mapping = mapping or {}
        exprs = [f"'{which}' AS which"]
        for name, typ in columns:
            src = mapping.get(name, name)
            if src is None:
                exprs.append(f"CAST(NULL AS {typ}) AS {name}")
            else:
                exprs.append(f"{src} AS {name}")
        selects.append(f"SELECT {', '.join(exprs)} FROM c{i}")
    return f"WITH {ctes}\n" + "\nUNION ALL ".join(selects)


# ---------------------------------------------------------------------------
# Fold definitions.  Each returns (query_callable, oracle_sql_or_None).
# ---------------------------------------------------------------------------


def search_top10():
    """Top-10 BM25 searches that share the (doc_id, conv_id, turn_idx,
    score_r, rank) shape: term / and / or / SimpleParser / collapse."""
    from whoosh_reloaded_ray.pipelines import fulltext as ft

    cases = [
        ("search_term_top10", ft.search_term_top10, ft.oracle_search_term_top10()),
        ("search_and_top10", ft.search_and_top10, ft.oracle_search_and_top10()),
        ("search_or_top10", ft.search_or_top10, ft.oracle_search_or_top10()),
        ("search_simple_parser", ft.search_simple_parser, ft.oracle_search_simple_parser()),
        ("collapsed_top_by_role", ft.collapsed_top_by_role, ft.oracle_collapsed_top_by_role()),
    ]
    cols = ["doc_id", "conv_id", "turn_idx", "score_r", "rank"]
    typed = [("doc_id", "BIGINT"), ("conv_id", "VARCHAR"), ("turn_idx", "INTEGER"),
             ("score_r", "DOUBLE"), ("rank", "BIGINT")]
    q = fold_queries([(w, f) for w, f, _ in cases], cols)
    sql = fold_sql([(w, s, None) for w, _, s in cases], typed)
    return q, sql


def match_docsets():
    """All matcher gates that return a bare doc_id set: phrase / NOT / numeric
    range / parsed dates / gt-lt / regex / spans / nested / export."""
    from whoosh_reloaded_ray.pipelines import fulltext as ft

    cases = [
        ("match_phrase", ft.match_phrase, ft.oracle_match_phrase()),
        ("match_not", ft.match_not, ft.oracle_match_not()),
        ("match_and_numrange", ft.match_and_numrange, ft.oracle_match_and_numrange()),
        ("match_parsed_daterange", ft.match_parsed_daterange, ft.oracle_match_parsed_daterange()),
        ("match_parsed_nl_datetime", ft.match_parsed_nl_datetime, ft.oracle_match_parsed_nl_datetime()),
        ("match_gtlt", ft.match_gtlt, ft.oracle_match_gtlt()),
        ("match_regex", ft.match_regex, ft.oracle_match_regex()),
        ("match_span_first", ft.match_span_first, ft.oracle_match_span_first()),
        ("nested_children_turns", ft.nested_children_turns, ft.oracle_nested_children_turns()),
        ("nested_parent_convs", ft.nested_parent_convs, ft.oracle_nested_parent_convs()),
        ("export_matches_spark", ft.export_matches_spark, ft.oracle_export_matches_spark()),
    ]
    cols = ["doc_id"]
    typed = [("doc_id", "BIGINT")]
    q = fold_queries([(w, f) for w, f, _ in cases], cols)
    sql = fold_sql([(w, s, None) for w, _, s in cases], typed)
    return q, sql


def term_stats():
    """Term dictionary stats: prefix-scan TermInfo + global top-df terms."""
    from whoosh_reloaded_ray.pipelines import fulltext as ft

    cases = [
        ("term_stats_prefix", ft.term_stats_prefix, ft.oracle_term_stats_prefix(),
         {"rank": None}),
        ("top_terms_by_df", ft.top_terms_by_df, ft.oracle_top_terms_by_df(),
         {"total_tf": None}),
    ]
    cols = ["term", "df", "total_tf", "rank"]
    typed = [("term", "VARCHAR"), ("df", "BIGINT"), ("total_tf", "BIGINT"), ("rank", "BIGINT")]
    q = fold_queries([(w, f) for w, f, _, _ in cases], cols)
    sql = fold_sql([(w, s, m) for w, _, s, m in cases], typed)
    return q, sql


def facet_buckets():
    """Faceting: grouped-by-field counts + query-facet buckets (key, n)."""
    from whoosh_reloaded_ray.pipelines import fulltext as ft

    cases = [
        ("facet_counts_match", ft.facet_counts_match, ft.oracle_facet_counts_match(),
         {"key": "role"}),
        ("facet_query_buckets", ft.facet_query_buckets, ft.oracle_facet_query_buckets(),
         {"key": "bucket"}),
    ]
    cols = ["key", "n"]
    typed = [("key", "VARCHAR"), ("n", "BIGINT")]
    renames = {"facet_counts_match": {"role": "key"}, "facet_query_buckets": {"bucket": "key"}}
    q = fold_queries([(w, f) for w, f, _, _ in cases], cols, renames=renames)
    sql = fold_sql([(w, s, m) for w, _, s, m in cases], typed)
    return q, sql


def events_matches():
    """Events-schema matcher gates returning bare event_id sets."""
    from whoosh_reloaded_ray.pipelines import events_index as ev

    cases = [
        ("events_search_props", ev.events_search_props, ev.oracle_events_search_props()),
        ("events_recent_by_user", ev.events_recent_by_user, ev.oracle_events_recent_by_user()),
    ]
    cols = ["event_id"]
    typed = [("event_id", "BIGINT")]
    q = fold_queries([(w, f) for w, f, _ in cases], cols)
    sql = fold_sql([(w, s, None) for w, _, s in cases], typed)
    return q, sql


def dedup_survivors():
    """Dedup survivor sets: exact-hash, MinHash-LSH, and decontamination."""
    from whoosh_reloaded_ray.pipelines import corpus_ops as co
    from whoosh_reloaded_ray.pipelines import curation as cu

    cases = [
        ("dedup_exact", co.dedup_exact, co.oracle_dedup_exact()),
        ("dedup_minhash", co.dedup_minhash, co.oracle_dedup_minhash()),
        ("decontaminate", cu.decontaminate, cu.oracle_decontaminate()),
    ]
    cols = ["doc_id"]
    typed = [("doc_id", "BIGINT")]
    q = fold_queries([(w, f) for w, f, _ in cases], cols)
    sql = fold_sql([(w, s, None) for w, _, s in cases], typed)
    return q, sql


def winnow():
    """Winnowing fingerprints + MOSS-style shared-passage pairs."""
    from whoosh_reloaded_ray.pipelines import corpus_ops as co

    cases = [
        ("winnow_fingerprints", co.winnow_fingerprints, co.oracle_winnow_fingerprints(),
         {"a": None, "b": None, "n_shared": None}),
        ("winnow_shared_pairs", co.winnow_shared_pairs, co.oracle_winnow_shared_pairs(),
         {"doc_id": None, "fp": None}),
    ]
    cols = ["doc_id", "fp", "a", "b", "n_shared"]
    typed = [("doc_id", "BIGINT"), ("fp", "BIGINT"), ("a", "BIGINT"),
             ("b", "BIGINT"), ("n_shared", "BIGINT")]
    q = fold_queries([(w, f) for w, f, _, _ in cases], cols)
    sql = fold_sql([(w, s, m) for w, _, s, m in cases], typed)
    return q, sql


def multimodal_meta():
    """Multimodal decode metadata: image / PPM / WAV / frame-sampling."""
    from whoosh_reloaded_ray.stages import multimodal as mm

    all_cols = ["doc_id", "n_bytes", "width", "height", "channels", "mean_pixel",
                "sample_rate", "n_channels", "n_samples", "peak", "n_frames", "n_sampled"]
    per_case = {
        "decode_image_meta": ["doc_id", "n_bytes", "width", "height", "channels"],
        "decode_ppm_meta": ["doc_id", "width", "height", "channels", "mean_pixel"],
        "decode_png_meta": ["doc_id", "width", "height", "channels", "mean_pixel"],
        "decode_wav_meta": ["doc_id", "sample_rate", "n_channels", "n_samples", "peak"],
        "frame_sample_meta": ["doc_id", "n_frames", "n_sampled"],
    }
    cases = [
        ("decode_image_meta", mm.decode_image_meta, mm.oracle_decode_image_meta()),
        ("decode_ppm_meta", mm.decode_ppm_meta, mm.oracle_decode_ppm_meta()),
        ("decode_png_meta", mm.decode_png_meta, mm.oracle_decode_png_meta()),
        ("decode_wav_meta", mm.decode_wav_meta, mm.oracle_decode_wav_meta()),
        ("frame_sample_meta", mm.frame_sample_meta, mm.oracle_frame_sample_meta()),
    ]
    typed = [(c, "DOUBLE" if c == "mean_pixel" else "BIGINT") for c in all_cols]
    q = fold_queries([(w, f) for w, f, _ in cases], all_cols)
    sql = fold_sql(
        [(w, s, {c: (c if c in per_case[w] else None) for c in all_cols}) for w, _, s in cases],
        typed,
    )
    return q, sql


# -- rows-only folds (approximate / non-SQL-expressible sub-cases) ----------


def sketches_approx():
    """Approximate sketches: HLL distinct users + CMS heavy hitters.

    Oracle-verified as of round 4 via a COMMITTED fixture generated by
    independent pure-Python reimplementations of the HLL/CMS specs
    (scripts/gen_gate_fixtures.py — both sketches are deterministic given
    the input, so the naive single-process result is exact).  Freshness
    guarded by tests/test_gate_fixtures.py."""
    import os

    from whoosh_reloaded_ray.pipelines import events_index as ev
    from whoosh_reloaded_ray.pipelines.sketches import heavy_hitters_cms

    cases = [
        ("events_hll_users", ev.events_hll_users),
        ("heavy_hitters_cms", heavy_hitters_cms),
    ]
    renames = {
        "events_hll_users": {"event_type": "key", "approx_users": "n"},
        "heavy_hitters_cms": {"term": "key", "est_count": "n"},
    }
    fix = os.path.join(
        os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
        "tests",
        "fixtures",
        "sketches_approx_sf0.01.parquet",
    )
    sql = f"SELECT which, key, n FROM read_parquet('{fix}') ORDER BY which, key"
    return fold_queries(cases, ["key", "n"], renames=renames), sql


def simhash_all():
    """SimHash fingerprints + Hamming<=8 near-dup pairs.  FULLY oracle-
    verified as of round 4: the word hash is md5-derived (== DuckDB
    ``md5_number_lower``) so the fingerprints, and the all-pairs
    xor/bit_count oracle for the banded pair search (recall 1.0 by
    pigeonhole), are SQL-expressible."""
    from whoosh_reloaded_ray.pipelines import corpus_ops as co

    cases = [
        ("simhash_fingerprints", co.simhash_fingerprints),
        ("simhash_neardup_pairs", lambda sf: co.simhash_neardup_pairs(sf, max_hamming=8)),
    ]
    typed = [("doc_id", "BIGINT"), ("simhash", "BIGINT"), ("a", "BIGINT"),
             ("b", "BIGINT"), ("hamming", "BIGINT")]
    sql = fold_sql(
        [
            ("simhash_fingerprints", co.oracle_simhash_fingerprints(),
             {"a": None, "b": None, "hamming": None}),
            ("simhash_neardup_pairs", co.oracle_simhash_neardup_pairs(8),
             {"doc_id": None, "simhash": None}),
        ],
        typed,
    )
    return fold_queries(cases, ["doc_id", "simhash", "a", "b", "hamming"]), sql


def ann_approx_topk():
    """Approximate ANN top-k: IVF / HNSW / PQ variants.  FULLY
    fixture-oracle-verified as of round 5: the three algorithms are
    deterministic given their seeds (HNSW shards by splitmix64(vec_id), not
    Ray block boundaries), so an independent naive single-process
    implementation (scripts/gen_gate_fixtures.py) reproduces every row and
    the committed fixture is the oracle."""
    from whoosh_reloaded_ray.pipelines import ann

    cases = [
        ("ann_ivf_topk", ann.ann_ivf_topk),
        ("ann_hnsw_topk", ann.ann_hnsw_topk),
        ("ann_pq_topk", ann.ann_pq_topk),
    ]
    return (
        fold_queries(cases, ["qid", "vec_id", "sim_r", "rank"]),
        ann.oracle_ann_approx_topk(),
    )
