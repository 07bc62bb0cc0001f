"""Driver contract for the graft builder (Ray Data target).

The driver's verify calls ``entry()`` as a smoke check (Ray is already
initialised, local mode), runs each ``queries()[name](sf_dir)`` at
sf=0.01 and compares it against the matching ``oracle_sql()[name]`` via
DuckDB (row-count + schema + order-insensitive value-hash).

Ray is initialised by the driver BEFORE this module is imported: nothing
here calls ``ray.init()`` / ``ray.shutdown()``.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable
from typing import Any

_REPO = os.path.dirname(os.path.abspath(__file__))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)


def entry() -> Any:
    """Flagship pipeline on /root/testdata/sf0.001: derive the transcripts
    corpus, build the inverted index (read -> tokenize map_batches ->
    term-shard shuffle -> segment write -> manifest commit), then run a BM25
    search and return the top hits with stored fields."""
    from whoosh_reloaded_ray.pipelines.fulltext import get_searcher
    from whoosh_reloaded_ray.query import And, Or, Term

    s = get_searcher("/root/testdata/sf0.001")
    q = Or([And([Term("text", "window"), Term("text", "hash")]), Term("text", "spark", boost=1.5)])
    return s.search_with_fields(q, limit=20, columns=["conv_id", "turn_idx", "role", "doc_id"])


def _cms():
    from whoosh_reloaded_ray.pipelines.sketches import heavy_hitters_cms

    return heavy_hitters_cms


def queries() -> dict[str, Callable[[str], Any]]:
    from whoosh_reloaded_ray.pipelines import ann
    from whoosh_reloaded_ray.pipelines import bpe
    from whoosh_reloaded_ray.pipelines import curation as cu
    from whoosh_reloaded_ray.pipelines import events_index as ev
    from whoosh_reloaded_ray.pipelines import corpus_ops as co
    from whoosh_reloaded_ray.pipelines import fulltext as ft
    from whoosh_reloaded_ray.pipelines import relational as rel
    from whoosh_reloaded_ray.stages import multimodal as mm

    return {
        # full-text index + BM25 engine
        "search_term_top10": ft.search_term_top10,
        "search_and_top10": ft.search_and_top10,
        "search_or_top10": ft.search_or_top10,
        "match_phrase": ft.match_phrase,
        "match_not": ft.match_not,
        "match_and_numrange": ft.match_and_numrange,
        "term_stats_prefix": ft.term_stats_prefix,
        "doclen_quantized": ft.doclen_quantized,
        "facet_counts_match": ft.facet_counts_match,
        "facet_query_buckets": ft.facet_query_buckets,
        "sorted_by_turn": ft.sorted_by_turn,
        "suggest_misspelled": ft.suggest_misspelled,
        "top_terms_by_df": ft.top_terms_by_df,
        "match_parsed_daterange": ft.match_parsed_daterange,
        "match_parsed_nl_datetime": ft.match_parsed_nl_datetime,
        "conv_match_counts": ft.conv_match_counts,
        "search_simple_parser": ft.search_simple_parser,
        "match_gtlt": ft.match_gtlt,
        "match_regex": ft.match_regex,
        "nested_children_turns": ft.nested_children_turns,
        "nested_parent_convs": ft.nested_parent_convs,
        "collapsed_top_by_role": ft.collapsed_top_by_role,
        "match_span_first": ft.match_span_first,
        "export_matches_spark": ft.export_matches_spark,
        # second corpus: custom schema over the events table
        "events_search_props": ev.events_search_props,
        "events_value_hist": ev.events_value_hist,
        "events_recent_by_user": ev.events_recent_by_user,
        "events_tumbling_counts": ev.events_tumbling_counts,
        "events_sliding_rate": ev.events_sliding_rate,
        "events_asof_signup": ev.events_asof_signup,
        "events_range_join": ev.events_range_join,
        "events_hll_users": ev.events_hll_users,  # rows-only (approximate sketch)
        "events_sessionize": ev.events_sessionize,
        "events_funnel": ev.events_funnel,
        # training-data corpus ops (documents table)
        "dedup_exact": co.dedup_exact,
        "neardup_ngram_jaccard": co.neardup_ngram_jaccard,
        "dedup_minhash": co.dedup_minhash,
        "neardup_clusters": co.neardup_clusters,
        "simhash_fingerprints": co.simhash_fingerprints,  # rows-only (bit ops)
        "text_stats": co.text_stats,
        "fingerprint_docs": co.fingerprint_docs,
        "winnow_fingerprints": co.winnow_fingerprints,
        "winnow_shared_pairs": co.winnow_shared_pairs,
        "lang_id": co.lang_id,
        "stratified_sample": co.stratified_sample,
        "filter_quality": co.filter_quality,
        "bpe_token_counts": bpe.bpe_token_counts,  # rows-only (BPE not SQL-expressible)
        "unigram_logprob": bpe.unigram_logprob,
        # curation: n-gram stats / decontamination / repetition / PII / packing
        "top_ngrams": cu.top_ngrams,
        "decontaminate": cu.decontaminate,
        "repetition_stats": cu.repetition_stats,
        "redact_pii": cu.redact_pii,
        "doc_keywords": cu.doc_keywords,
        "dup_spans": cu.dup_spans,
        "heavy_hitters_cms": _cms(),  # rows-only (seeded multi-hash sketch)
        # relational analytics (TPC-H-style tables)
        "lineitem_pricing_summary": rel.lineitem_pricing_summary,
        "orders_by_segment": rel.orders_by_segment,
        "top_customers_by_spend": rel.top_customers_by_spend,
        "revenue_by_nation": rel.revenue_by_nation,
        "part_type_revenue": rel.part_type_revenue,
        "supplier_revenue": rel.supplier_revenue,
        "pack_sequences": cu.pack_sequences,
        # similarity search (embeddings table)
        "ann_cosine_topk": ann.ann_cosine_topk,
        "neardup_embedding_pairs": ann.neardup_embedding_pairs,
        "neardup_embedding_lsh": ann.neardup_embedding_pairs_lsh,  # rows-only (approx scale mode)
        "ann_ivf_topk": ann.ann_ivf_topk,  # rows-only (approximate)
        "ann_hnsw_topk": ann.ann_hnsw_topk,  # rows-only (approximate)  # rows-only (approximate)
        "ann_pq_topk": ann.ann_pq_topk,  # rows-only (approximate, PQ codes + exact rerank)
        "simhash_neardup_pairs": lambda sf: co.simhash_neardup_pairs(sf, max_hamming=8),  # rows-only
        # multimodal: REAL PPM/WAV decode (pure numpy/stdlib) + stubbed
        # compressed-format decode with real actor-pool plumbing
        "decode_image_meta": mm.decode_image_meta,
        "decode_ppm_meta": mm.decode_ppm_meta,
        "decode_wav_meta": mm.decode_wav_meta,
        "frame_sample_meta": mm.frame_sample_meta,
    }


def oracle_sql() -> dict[str, str]:
    from whoosh_reloaded_ray.pipelines import ann
    from whoosh_reloaded_ray.pipelines import bpe
    from whoosh_reloaded_ray.pipelines import curation as cu
    from whoosh_reloaded_ray.pipelines import events_index as ev
    from whoosh_reloaded_ray.pipelines import corpus_ops as co
    from whoosh_reloaded_ray.pipelines import fulltext as ft
    from whoosh_reloaded_ray.pipelines import relational as rel
    from whoosh_reloaded_ray.stages import multimodal as mm

    return {
        "search_term_top10": ft.oracle_search_term_top10(),
        "search_and_top10": ft.oracle_search_and_top10(),
        "search_or_top10": ft.oracle_search_or_top10(),
        "match_phrase": ft.oracle_match_phrase(),
        "match_not": ft.oracle_match_not(),
        "match_and_numrange": ft.oracle_match_and_numrange(),
        "term_stats_prefix": ft.oracle_term_stats_prefix(),
        "doclen_quantized": ft.oracle_doclen_quantized(),
        "facet_counts_match": ft.oracle_facet_counts_match(),
        "facet_query_buckets": ft.oracle_facet_query_buckets(),
        "sorted_by_turn": ft.oracle_sorted_by_turn(),
        "suggest_misspelled": ft.oracle_suggest_misspelled(),
        "top_terms_by_df": ft.oracle_top_terms_by_df(),
        "match_parsed_daterange": ft.oracle_match_parsed_daterange(),
        "match_parsed_nl_datetime": ft.oracle_match_parsed_nl_datetime(),
        "conv_match_counts": ft.oracle_conv_match_counts(),
        "search_simple_parser": ft.oracle_search_simple_parser(),
        "match_gtlt": ft.oracle_match_gtlt(),
        "match_regex": ft.oracle_match_regex(),
        "nested_children_turns": ft.oracle_nested_children_turns(),
        "nested_parent_convs": ft.oracle_nested_parent_convs(),
        "collapsed_top_by_role": ft.oracle_collapsed_top_by_role(),
        "match_span_first": ft.oracle_match_span_first(),
        "export_matches_spark": ft.oracle_export_matches_spark(),
        "events_search_props": ev.oracle_events_search_props(),
        "events_value_hist": ev.oracle_events_value_hist(),
        "events_recent_by_user": ev.oracle_events_recent_by_user(),
        "events_tumbling_counts": ev.oracle_events_tumbling_counts(),
        "events_sliding_rate": ev.oracle_events_sliding_rate(),
        "events_asof_signup": ev.oracle_events_asof_signup(),
        "events_range_join": ev.oracle_events_range_join(),
        "events_sessionize": ev.oracle_events_sessionize(),
        "events_funnel": ev.oracle_events_funnel(),
        "dedup_exact": co.oracle_dedup_exact(),
        "neardup_ngram_jaccard": co.oracle_neardup_ngram_jaccard(),
        "dedup_minhash": co.oracle_dedup_minhash(),
        "neardup_clusters": co.oracle_neardup_clusters(),
        # simhash_fingerprints: no oracle (64-bit twiddling isn't sane SQL)
        "text_stats": co.oracle_text_stats(),
        "fingerprint_docs": co.oracle_fingerprint_docs(),
        "winnow_fingerprints": co.oracle_winnow_fingerprints(),
        "winnow_shared_pairs": co.oracle_winnow_shared_pairs(),
        "lang_id": co.oracle_lang_id(),
        "stratified_sample": co.oracle_stratified_sample(),
        "filter_quality": co.oracle_filter_quality(),
        "unigram_logprob": bpe.oracle_unigram_logprob(),
        "top_ngrams": cu.oracle_top_ngrams(),
        "decontaminate": cu.oracle_decontaminate(),
        "repetition_stats": cu.oracle_repetition_stats(),
        "redact_pii": cu.oracle_redact_pii(),
        "doc_keywords": cu.oracle_doc_keywords(),
        "dup_spans": cu.oracle_dup_spans(),
        "lineitem_pricing_summary": rel.oracle_lineitem_pricing_summary(),
        "orders_by_segment": rel.oracle_orders_by_segment(),
        "top_customers_by_spend": rel.oracle_top_customers_by_spend(),
        "revenue_by_nation": rel.oracle_revenue_by_nation(),
        "part_type_revenue": rel.oracle_part_type_revenue(),
        "supplier_revenue": rel.oracle_supplier_revenue(),
        "pack_sequences": cu.oracle_pack_sequences(),
        "ann_cosine_topk": ann.oracle_ann_cosine_topk(),
        "neardup_embedding_pairs": ann.oracle_neardup_embedding_pairs(),
        # ann_ivf_topk: no oracle (approximate by design)
        "decode_image_meta": mm.oracle_decode_image_meta(),
        "decode_ppm_meta": mm.oracle_decode_ppm_meta(),
        "decode_wav_meta": mm.oracle_decode_wav_meta(),
        "frame_sample_meta": mm.oracle_frame_sample_meta(),
    }
