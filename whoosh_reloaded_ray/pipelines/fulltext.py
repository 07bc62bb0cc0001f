"""Driver-gate fulltext pipelines: index-backed queries over the transcripts
derived from an sf dir's `documents` table, plus the matching DuckDB oracle
SQL (the CTE in sources/corpus.py mirrors the Python derivation exactly).

Each query returns an Arrow table whose column names match its oracle SQL so
the driver's order-insensitive value-hash comparison passes.  BM25 scores
are rounded to 6 decimals on BOTH sides (identical double arithmetic order;
see query/exec.py scoring notes).
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa

from ..functions.quant import BYTE_TO_LENGTH
from ..query import And, Not, NumericRange, Or, Phrase, Prefix, Term
from ..sources.corpus import TRANSCRIPTS_CTE, derive_transcripts, fetch_rows
from ..state.manifest import load_manifest
from ..state.searcher import IndexSearcher

_searchers: dict = {}

TOKENIZE_SQL = (
    "list_filter(list_transform(regexp_extract_all(text, "
    "'[\\w*]+(?:\\.?[\\w*]+)*'), t -> lower(t)), "
    "t -> length(t) >= 2 AND t NOT IN ({stops}))"
)


def _stops_sql() -> str:
    from ..functions.analysis import STOP_WORDS

    return ", ".join(f"'{w}'" for w in sorted(STOP_WORDS))


def tokenize_sql() -> str:
    return TOKENIZE_SQL.format(stops=_stops_sql())


def quantized_len_sql(col: str) -> str:
    """SQL for byte_to_length(length_to_byte(col)): smallest table value
    >= col (clamped to the 255-byte ceiling)."""
    vals = ", ".join(f"({int(v)})" for v in BYTE_TO_LENGTH)
    return (
        f"(SELECT MIN(v) FROM (VALUES {vals}) qt(v) "
        f"WHERE v >= LEAST({col}, {int(BYTE_TO_LENGTH[255])}))"
    )


def get_searcher(sf_dir: str) -> IndexSearcher:
    """Build (once, resumable) and cache the index for an sf dir."""
    key = os.path.normpath(sf_dir)
    s = _searchers.get(key)
    if s is not None:
        return s
    corpus = derive_transcripts(sf_dir)
    tag = os.path.basename(key)
    index_dir = f"/tmp/wrr_index/{tag}"
    man = load_manifest(index_dir)
    if man is None or os.path.getmtime(corpus) > _manifest_mtime(index_dir):
        from .build import build_index

        build_index([corpus], index_dir, num_shards=8, partition_rows=100_000)
    s = IndexSearcher(index_dir)
    _searchers[key] = s
    return s


def _manifest_mtime(index_dir: str) -> float:
    from ..state import storage

    if storage.is_uri(index_dir):
        # no portable mtime over pyarrow.fs; key the cache on the
        # manifest generation instead (monotonic per commit)
        from ..state.manifest import latest_generation

        return float(latest_generation(index_dir))
    import glob

    files = glob.glob(os.path.join(index_dir, "manifest-*.json"))
    return max((os.path.getmtime(f) for f in files), default=-1.0)


def _hits_with_keys(s: IndexSearcher, res: pa.Table, with_rank=True) -> pa.Table:
    """Attach (doc_id, conv_id, turn_idx) from source rows; keep result order."""
    if res.num_rows == 0:
        cols = {
            "doc_id": pa.array([], pa.int64()),
            "conv_id": pa.array([], pa.string()),
            "turn_idx": pa.array([], pa.int32()),
            "score_r": pa.array([], pa.float64()),
        }
        if with_rank:
            cols["rank"] = pa.array([], pa.int64())
        return pa.table(cols)
    rows = fetch_rows(
        s.manifest.partitions,
        res["docnum"].to_pylist(),
        columns=["conv_id", "turn_idx", "doc_id"],
    )
    lookup = {d: i for i, d in enumerate(rows["docnum"].to_pylist())}
    order = [lookup[d] for d in res["docnum"].to_pylist()]
    rows = rows.take(pa.array(order))
    out = {
        "doc_id": rows["doc_id"],
        "conv_id": rows["conv_id"],
        "turn_idx": rows["turn_idx"],
        "score_r": pa.array(np.round(res["score"].to_numpy(), 6)),
    }
    if with_rank:
        out["rank"] = pa.array(np.arange(1, res.num_rows + 1))
    return pa.table(out)


# ---------------------------------------------------------------------------
# Query entries (engine side)
# ---------------------------------------------------------------------------


def search_term_top10(sf_dir: str) -> pa.Table:
    s = get_searcher(sf_dir)
    return _hits_with_keys(s, s.search(Term("text", "spark"), limit=10))


def search_and_top10(sf_dir: str) -> pa.Table:
    s = get_searcher(sf_dir)
    q = And([Term("text", "window"), Term("text", "hash")])
    return _hits_with_keys(s, s.search(q, limit=10))


def search_or_top10(sf_dir: str) -> pa.Table:
    s = get_searcher(sf_dir)
    q = Or([Term("text", "merge"), Term("text", "scan")])
    return _hits_with_keys(s, s.search(q, limit=10))


def match_phrase(sf_dir: str) -> pa.Table:
    """All docs containing the exact phrase "key order" (doc ids only)."""
    s = get_searcher(sf_dir)
    res = s.search(Phrase("text", ["key", "order"]), limit=None, scored=False)
    rows = _hits_with_keys(s, res, with_rank=False)
    return rows.select(["doc_id"]).sort_by("doc_id")


def match_not(sf_dir: str) -> pa.Table:
    s = get_searcher(sf_dir)
    res = s.search(Not(Term("text", "window")), limit=None, scored=False)
    rows = _hits_with_keys(s, res, with_rank=False)
    return rows.select(["doc_id"]).sort_by("doc_id")


def match_and_numrange(sf_dir: str) -> pa.Table:
    """Docs with 'join' in turns 1-3 of their conversation."""
    s = get_searcher(sf_dir)
    q = And([Term("text", "join"), NumericRange("turn_idx", 1, 3)])
    res = s.search(q, limit=None, scored=False)
    rows = _hits_with_keys(s, res, with_rank=False)
    return rows.select(["doc_id"]).sort_by("doc_id")


def term_stats_prefix(sf_dir: str) -> pa.Table:
    """df + total tf for every text term starting with 's' — bulk tokenizer
    parity check straight off the terminfo files."""
    s = get_searcher(sf_dir)
    import pyarrow.parquet as pq

    parts = []
    for seg in s.manifest.segments:
        for shard in range(seg.num_shards):
            path = os.path.join(
                s.index_dir, seg.name, f"terminfo-{shard:04d}.parquet"
            )
            if os.path.exists(path):
                t = pq.read_table(
                    path,
                    columns=["term", "doc_freq", "weight_sum"],
                    filters=[("field", "=", "text"), ("term", ">=", "s"), ("term", "<", "t")],
                )
                parts.append(t)
    tbl = pa.concat_tables(parts)
    import pyarrow.compute as pc

    agg = (
        tbl.group_by("term")
        .aggregate([("doc_freq", "sum"), ("weight_sum", "sum")])
        .rename_columns(["term", "df", "total_tf"])
    )
    agg = agg.set_column(2, "total_tf", pc.cast(pc.round(agg["total_tf"]), pa.int64()))
    agg = agg.set_column(1, "df", pc.cast(agg["df"], pa.int64()))
    return agg.sort_by("term")


def doclen_quantized(sf_dir: str) -> pa.Table:
    """Per-doc true + quantized text length — quantization parity in bulk."""
    s = get_searcher(sf_dir)
    import pyarrow.parquet as pq

    parts = []
    for seg in s.manifest.segments:
        for shard in range(seg.num_shards):
            path = os.path.join(s.index_dir, seg.name, f"doclens-{shard:04d}.parquet")
            if os.path.exists(path):
                parts.append(pq.read_table(path, filters=[("field", "=", "text")]))
    tbl = pa.concat_tables(parts).sort_by("docnum")
    rows = fetch_rows(s.manifest.partitions, tbl["docnum"].to_pylist(), columns=["doc_id"])
    qlen = BYTE_TO_LENGTH[tbl["len_byte"].to_numpy()]
    return pa.table(
        {
            "doc_id": rows.sort_by("docnum")["doc_id"],
            "length": pa.array(tbl["length"].to_numpy().astype(np.int64)),
            "qlen": pa.array(qlen.astype(np.int64)),
        }
    ).sort_by("doc_id")


def facet_counts_match(sf_dir: str) -> pa.Table:
    """Facet counts by role of docs containing 'data' (groupedby/Count)."""
    from ..query import Term

    s = get_searcher(sf_dir)
    counts = s.facet_counts(Term("text", "data"), "role")
    keys = sorted(counts)
    return pa.table(
        {"role": pa.array(keys), "n": pa.array([counts[k] for k in keys], pa.int64())}
    )


def sorted_by_turn(sf_dir: str) -> pa.Table:
    """Docs containing 'join' sorted by turn_idx (SortingCollector)."""
    from ..query import Term

    s = get_searcher(sf_dir)
    res = s.search_sorted(Term("text", "join"), "turn_idx", limit=20)
    rows = fetch_rows(
        s.manifest.partitions, res["docnum"].to_pylist(), columns=["doc_id"]
    )
    lookup = dict(zip(rows["docnum"].to_pylist(), rows["doc_id"].to_pylist()))
    return pa.table(
        {
            "doc_id": pa.array([lookup[d] for d in res["docnum"].to_pylist()], pa.int64()),
            "turn_idx": pa.array(res["turn_idx"].to_numpy().astype(np.int32), pa.int32()),
            "rank": pa.array(np.arange(1, res.num_rows + 1)),
        }
    )


def suggest_misspelled(sf_dir: str) -> pa.Table:
    """Spelling suggestions for a misspelled query word."""
    s = get_searcher(sf_dir)
    sugs = s.suggest("text", "spak", limit=5, maxdist=2)
    return pa.table(
        {
            "rank": pa.array(np.arange(1, len(sugs) + 1)),
            "term": pa.array(sugs, pa.string()),
        }
    )


def top_terms_by_df(sf_dir: str) -> pa.Table:
    """Top-20 text terms by document frequency (terminfo aggregation)."""
    s = get_searcher(sf_dir)
    import pyarrow.parquet as pq_

    parts = []
    for seg in s.manifest.segments:
        for shard in range(seg.num_shards):
            path = os.path.join(s.index_dir, seg.name, f"terminfo-{shard:04d}.parquet")
            if os.path.exists(path):
                parts.append(
                    pq_.read_table(
                        path, columns=["term", "doc_freq"],
                        filters=[("field", "=", "text")],
                    )
                )
    import pyarrow.compute as pc

    t = pa.concat_tables(parts)
    agg = t.group_by("term").aggregate([("doc_freq", "sum")])
    agg = agg.rename_columns(["term", "df"])
    agg = agg.set_column(1, "df", pc.cast(agg["df"], pa.int64()))
    order = pc.sort_indices(agg, sort_keys=[("df", "descending"), ("term", "ascending")])
    top = agg.take(order).slice(0, 20)
    return top.append_column("rank", pa.array(np.arange(1, top.num_rows + 1)))


# ---------------------------------------------------------------------------
# Oracle SQL (DuckDB) — all over the shared transcripts CTE
# ---------------------------------------------------------------------------


def _bm25_oracle(term_exprs: list, match: str, limit: int = 10) -> str:
    """Build a full BM25F top-k oracle: per-term score CTEs + tie-break by
    the docnum order (conv_id, turn_idx)."""
    toks = tokenize_sql()
    score_sum = " + ".join(f"COALESCE(s{i}.score, 0)" for i in range(len(term_exprs)))
    joins = "\n".join(
        f"LEFT JOIN scores{i} s{i} ON t.doc_id = s{i}.doc_id" for i in range(len(term_exprs))
    )
    score_ctes = ",\n".join(
        f"""scores{i} AS (
  SELECT d.doc_id,
         (LN((SELECT N FROM stats) / ((SELECT COUNT(*) FROM docterms WHERE tf_{i} > 0) + 1)) + 1)
         * (d.tf_{i} * 2.2)
         / (d.tf_{i} + 1.2 * (0.25 + 0.75 * d.qlen / (SELECT avgfl FROM stats))) AS score
  FROM docterms d WHERE d.tf_{i} > 0
)"""
        for i in range(len(term_exprs))
    )
    tf_cols = ",\n         ".join(
        f"len(list_filter(toks, t -> t = '{w}')) AS tf_{i}" for i, w in enumerate(term_exprs)
    )
    return f"""
WITH transcripts AS ({TRANSCRIPTS_CTE}),
tokd AS (
  SELECT doc_id, conv_id, turn_idx, {toks} AS toks FROM transcripts
),
docterms AS (
  SELECT doc_id, conv_id, turn_idx,
         {tf_cols},
         {quantized_len_sql("len(toks)")}::DOUBLE AS qlen,
         len(toks) AS doclen
  FROM tokd
),
stats AS (
  SELECT COUNT(*)::DOUBLE AS N, SUM(doclen)::DOUBLE / COUNT(*) AS avgfl FROM docterms
),
{score_ctes}
SELECT t.doc_id, t.conv_id, t.turn_idx,
       ROUND({score_sum}, 6) AS score_r,
       ROW_NUMBER() OVER (ORDER BY ({score_sum}) DESC, t.conv_id, t.turn_idx) AS rank
FROM docterms t
{joins}
WHERE {match}
ORDER BY rank
LIMIT {limit}
"""


def oracle_search_term_top10() -> str:
    return _bm25_oracle(["spark"], "t.tf_0 > 0")


def oracle_search_and_top10() -> str:
    return _bm25_oracle(["window", "hash"], "t.tf_0 > 0 AND t.tf_1 > 0")


def oracle_search_or_top10() -> str:
    return _bm25_oracle(["merge", "scan"], "t.tf_0 > 0 OR t.tf_1 > 0")


def oracle_match_phrase() -> str:
    toks = tokenize_sql()
    return f"""
WITH transcripts AS ({TRANSCRIPTS_CTE}),
tokd AS (SELECT doc_id, {toks} AS toks FROM transcripts)
SELECT doc_id FROM tokd
WHERE len(list_filter(generate_series(1, len(toks) - 1),
                      i -> toks[i] = 'key' AND toks[i + 1] = 'order')) > 0
ORDER BY doc_id
"""


def oracle_match_not() -> str:
    toks = tokenize_sql()
    return f"""
WITH transcripts AS ({TRANSCRIPTS_CTE}),
tokd AS (SELECT doc_id, {toks} AS toks FROM transcripts)
SELECT doc_id FROM tokd
WHERE NOT list_contains(toks, 'window')
ORDER BY doc_id
"""


def oracle_match_and_numrange() -> str:
    toks = tokenize_sql()
    return f"""
WITH transcripts AS ({TRANSCRIPTS_CTE}),
tokd AS (SELECT doc_id, turn_idx, {toks} AS toks FROM transcripts)
SELECT doc_id FROM tokd
WHERE list_contains(toks, 'join') AND turn_idx BETWEEN 1 AND 3
ORDER BY doc_id
"""


def oracle_term_stats_prefix() -> str:
    toks = tokenize_sql()
    return f"""
WITH transcripts AS ({TRANSCRIPTS_CTE}),
tokd AS (SELECT doc_id, {toks} AS toks FROM transcripts),
exploded AS (SELECT doc_id, unnest(toks) AS term FROM tokd)
SELECT term,
       COUNT(DISTINCT doc_id)::BIGINT AS df,
       COUNT(*)::BIGINT AS total_tf
FROM exploded
WHERE term >= 's' AND term < 't'
GROUP BY term
ORDER BY term
"""


def oracle_doclen_quantized() -> str:
    toks = tokenize_sql()
    return f"""
WITH transcripts AS ({TRANSCRIPTS_CTE}),
tokd AS (SELECT doc_id, {toks} AS toks FROM transcripts)
SELECT doc_id,
       len(toks)::BIGINT AS length,
       {quantized_len_sql("len(toks)")}::BIGINT AS qlen
FROM tokd
ORDER BY doc_id
"""


def oracle_facet_counts_match() -> str:
    toks = tokenize_sql()
    return f"""
WITH transcripts AS ({TRANSCRIPTS_CTE}),
tokd AS (SELECT role, {toks} AS toks FROM transcripts)
SELECT role, COUNT(*)::BIGINT AS n FROM tokd
WHERE list_contains(toks, 'data')
GROUP BY role ORDER BY role
"""


def oracle_sorted_by_turn() -> str:
    toks = tokenize_sql()
    return f"""
WITH transcripts AS ({TRANSCRIPTS_CTE}),
tokd AS (SELECT doc_id, conv_id, turn_idx, {toks} AS toks FROM transcripts)
SELECT doc_id, turn_idx,
       ROW_NUMBER() OVER (ORDER BY turn_idx, conv_id, turn_idx) AS rank
FROM tokd WHERE list_contains(toks, 'join')
ORDER BY rank LIMIT 20
"""


def oracle_suggest_misspelled() -> str:
    """Reference corrector semantics: candidates within levenshtein<=2 of
    'spak' ranked by collection frequency desc; the bounded-heap selection
    keeps lexicographically LATER terms on frequency ties, display order is
    (freq desc, term asc)."""
    toks = tokenize_sql()
    return f"""
WITH transcripts AS ({TRANSCRIPTS_CTE}),
tokd AS (SELECT doc_id, {toks} AS toks FROM transcripts),
exploded AS (SELECT unnest(toks) AS term FROM tokd),
freqs AS (SELECT term, COUNT(*)::DOUBLE AS freq FROM exploded GROUP BY term),
cand AS (
  SELECT term, freq FROM freqs
  WHERE term != 'spak' AND levenshtein(term, 'spak') <= 2),
sel AS (SELECT term, freq FROM cand ORDER BY freq DESC, term DESC LIMIT 5)
SELECT ROW_NUMBER() OVER (ORDER BY freq DESC, term ASC) AS rank, term
FROM sel ORDER BY rank
"""


def oracle_top_terms_by_df() -> str:
    toks = tokenize_sql()
    return f"""
WITH transcripts AS ({TRANSCRIPTS_CTE}),
tokd AS (SELECT doc_id, {toks} AS toks FROM transcripts),
exploded AS (SELECT DISTINCT doc_id, unnest(toks) AS term FROM tokd),
dfs AS (SELECT term, COUNT(*)::BIGINT AS df FROM exploded GROUP BY term)
SELECT term, df, ROW_NUMBER() OVER (ORDER BY df DESC, term ASC) AS rank
FROM dfs ORDER BY df DESC, term ASC LIMIT 20
"""


def match_parsed_daterange(sf_dir: str) -> pa.Table:
    """Query-STRING search with a datetime range (exercises the parser +
    columnar DateRange path): docs containing 'data' in the first 3
    simulated minutes."""
    from ..query import QueryParser
    from ..schema import transcript_schema

    s = get_searcher(sf_dir)
    q = QueryParser("text", transcript_schema()).parse(
        "ts:[2026-01-01 TO 2026-01-01T00:03:00] AND data"
    )
    res = s.search(q, limit=None, scored=False)
    rows = _hits_with_keys(s, res, with_rank=False)
    return rows.select(["doc_id"]).sort_by("doc_id")


def oracle_match_parsed_daterange() -> str:
    toks = tokenize_sql()
    return f"""
WITH transcripts AS ({TRANSCRIPTS_CTE}),
tokd AS (SELECT doc_id, ts, {toks} AS toks FROM transcripts)
SELECT doc_id FROM tokd
WHERE list_contains(toks, 'data')
  AND ts BETWEEN TIMESTAMP '2026-01-01 00:00:00' AND TIMESTAMP '2026-01-01 00:03:00'
ORDER BY doc_id
"""


def match_parsed_nl_datetime(sf_dir: str) -> pa.Table:
    """Query-STRING search with the long-tail natural-language datetime
    grammar (query/dateparse.py): a 'today midnight to +3 mins' to-range
    with a date+time bag start and a plus-minus chain end, resolved
    against a fixed basedate (reference DateParserPlugin semantics).
    A bare time-of-day start ('midnight to ...') errors in the reference
    (timespan.disambiguated AttributeError) so the date-bag form is the
    parseable long-tail case."""
    import datetime as _dt

    from ..query import QueryParser
    from ..schema import transcript_schema

    s = get_searcher(sf_dir)
    base = _dt.datetime(2026, 1, 1, 0, 0, 30)
    q = QueryParser(
        "text", transcript_schema(), dateparse_basedate=base
    ).parse("ts:'today midnight to +3 mins' AND data")
    res = s.search(q, limit=None, scored=False)
    rows = _hits_with_keys(s, res, with_rank=False)
    return rows.select(["doc_id"]).sort_by("doc_id")


def oracle_match_parsed_nl_datetime() -> str:
    # today midnight -> 2026-01-01 00:00:00; +3 mins -> basedate
    # (00:00:30) + 3 minutes = 00:03:30 exact point (span ceil)
    toks = tokenize_sql()
    return f"""
WITH transcripts AS ({TRANSCRIPTS_CTE}),
tokd AS (SELECT doc_id, ts, {toks} AS toks FROM transcripts)
SELECT doc_id FROM tokd
WHERE list_contains(toks, 'data')
  AND ts BETWEEN TIMESTAMP '2026-01-01 00:00:00' AND TIMESTAMP '2026-01-01 00:03:30'
ORDER BY doc_id
"""


def conv_match_counts(sf_dir: str) -> pa.Table:
    """Conversation-level block join (NestedParent analog): conversations
    with any turn containing 'spark', with matching-turn counts."""
    s = get_searcher(sf_dir)
    res = s.parent_search(Term("text", "spark"), parent_field="conv_id")
    return res.select(["conv_id", "n_children"]).rename_columns(
        ["conv_id", "n_match"]
    ).sort_by("conv_id")


def oracle_conv_match_counts() -> str:
    toks = tokenize_sql()
    return f"""
WITH transcripts AS ({TRANSCRIPTS_CTE}),
tokd AS (SELECT conv_id, {toks} AS toks FROM transcripts)
SELECT conv_id, COUNT(*)::BIGINT AS n_match
FROM tokd WHERE list_contains(toks, 'spark')
GROUP BY conv_id ORDER BY conv_id
"""


# ---------------------------------------------------------------------------
# Round-1 additions: parser-family + span + block-join gate queries
# ---------------------------------------------------------------------------


def search_simple_parser(sf_dir: str) -> pa.Table:
    """SimpleParser '+window hash' => AndMaybe(required, optional): docs
    must contain 'window', 'hash' adds its score where present."""
    from ..query.parser import SimpleParser
    from ..schema import transcript_schema

    s = get_searcher(sf_dir)
    q = SimpleParser("text", transcript_schema()).parse("+window hash")
    return _hits_with_keys(s, s.search(q, limit=10))


def oracle_search_simple_parser() -> str:
    return _bm25_oracle(["window", "hash"], "t.tf_0 > 0")


def match_gtlt(sf_dir: str) -> pa.Table:
    """GtLt-parsed 'turn_idx:>0 AND data' (docs past a conversation's
    opening turn containing 'data')."""
    from ..query.parser import QueryParser
    from ..schema import transcript_schema

    s = get_searcher(sf_dir)
    q = QueryParser("text", transcript_schema(), gtlt=True).parse("turn_idx:>0 AND data")
    res = s.search(q, limit=None, scored=False)
    rows = _hits_with_keys(s, res, with_rank=False)
    return rows.select(["doc_id"]).sort_by("doc_id")


def oracle_match_gtlt() -> str:
    toks = tokenize_sql()
    return f"""
WITH transcripts AS ({TRANSCRIPTS_CTE}),
tokd AS (SELECT doc_id, turn_idx, {toks} AS toks FROM transcripts)
SELECT doc_id FROM tokd
WHERE turn_idx > 0 AND list_contains(toks, 'data')
ORDER BY doc_id
"""


def match_regex(sf_dir: str) -> pa.Table:
    """Regex term query (RegexPlugin syntax): docs containing any text
    token the pattern MATCHES at the start (reference query/terms.py:378
    Regex, re.match semantics)."""
    from ..query.parser import QueryParser
    from ..schema import transcript_schema

    s = get_searcher(sf_dir)
    q = QueryParser("text", transcript_schema(), regex=True).parse('r"sc.n"')
    res = s.search(q, limit=None, scored=False)
    rows = _hits_with_keys(s, res, with_rank=False)
    return rows.select(["doc_id"]).sort_by("doc_id")


def oracle_match_regex() -> str:
    toks = tokenize_sql()
    return f"""
WITH transcripts AS ({TRANSCRIPTS_CTE}),
tokd AS (SELECT doc_id, {toks} AS toks FROM transcripts)
SELECT doc_id FROM tokd
WHERE len(list_filter(toks, x -> regexp_matches(x, '^(?:sc.n)'))) > 0
ORDER BY doc_id
"""


def nested_children_turns(sf_dir: str) -> pa.Table:
    """NestedChildren block join: all parents = turn_idx==0 delimiters,
    wanted parents = opening turns containing 'spark'; result = the child
    turns of those conversations."""
    from ..query import And, NestedChildren, NumericRange, Term

    s = get_searcher(sf_dir)
    parents = NumericRange("turn_idx", 0, 0)
    wanted = And([NumericRange("turn_idx", 0, 0), Term("text", "spark")])
    res = s.search(NestedChildren(parents, wanted), limit=None, scored=False)
    rows = _hits_with_keys(s, res, with_rank=False)
    return rows.select(["doc_id"]).sort_by("doc_id")


def oracle_nested_children_turns() -> str:
    toks = tokenize_sql()
    return f"""
WITH transcripts AS ({TRANSCRIPTS_CTE}),
tokd AS (SELECT doc_id, conv_id, turn_idx, {toks} AS toks FROM transcripts),
wanted AS (SELECT conv_id FROM tokd WHERE turn_idx = 0 AND list_contains(toks, 'spark'))
SELECT t.doc_id FROM tokd t JOIN wanted w USING (conv_id)
WHERE t.turn_idx > 0
ORDER BY t.doc_id
"""


def collapsed_top_by_role(sf_dir: str) -> pa.Table:
    """CollapseCollector semantics over the distributed partial path: top
    10 'data' hits after keeping at most 2 best-scoring docs per role."""
    from ..query import Term

    s = get_searcher(sf_dir)
    res = s.search_collapsed(Term("text", "data"), "role", limit=10, collapse_limit=2)
    return _hits_with_keys(s, res)


def oracle_collapsed_top_by_role() -> str:
    toks = tokenize_sql()
    return f"""
WITH transcripts AS ({TRANSCRIPTS_CTE}),
tokd AS (
  SELECT doc_id, conv_id, turn_idx, role, {toks} AS toks FROM transcripts
),
docterms AS (
  SELECT doc_id, conv_id, turn_idx, role,
         len(list_filter(toks, t -> t = 'data')) AS tf_0,
         {quantized_len_sql("len(toks)")}::DOUBLE AS qlen,
         len(toks) AS doclen
  FROM tokd
),
stats AS (
  SELECT COUNT(*)::DOUBLE AS N, SUM(doclen)::DOUBLE / COUNT(*) AS avgfl FROM docterms
),
scored AS (
  SELECT d.*,
         (LN((SELECT N FROM stats) / ((SELECT COUNT(*) FROM docterms WHERE tf_0 > 0) + 1)) + 1)
         * (d.tf_0 * 2.2)
         / (d.tf_0 + 1.2 * (0.25 + 0.75 * d.qlen / (SELECT avgfl FROM stats))) AS score
  FROM docterms d WHERE d.tf_0 > 0
),
kept AS (
  SELECT *,
         ROW_NUMBER() OVER (PARTITION BY role ORDER BY score DESC, conv_id, turn_idx) AS key_rank
  FROM scored
)
SELECT doc_id, conv_id, turn_idx,
       ROUND(score, 6) AS score_r,
       ROW_NUMBER() OVER (ORDER BY score DESC, conv_id, turn_idx) AS rank
FROM kept WHERE key_rank <= 2
ORDER BY rank
LIMIT 10
"""


def nested_parent_convs(sf_dir: str) -> pa.Table:
    """Composable NestedParent block join (reference nested.py:33-206): any
    turn containing 'merge' rolls up to its conversation's turn-0 parent
    doc; result = the parent doc_ids (unscored set semantics for the SQL
    oracle; score parity is covered by tests/test_search_parity.py)."""
    from ..query import NestedParent, NumericRange, Term

    s = get_searcher(sf_dir)
    q = NestedParent(NumericRange("turn_idx", 0, 0), Term("text", "merge"))
    res = s.search(q, limit=None, scored=False)
    rows = _hits_with_keys(s, res, with_rank=False)
    return rows.select(["doc_id"]).sort_by("doc_id")


def oracle_nested_parent_convs() -> str:
    toks = tokenize_sql()
    return f"""
WITH transcripts AS ({TRANSCRIPTS_CTE}),
tokd AS (SELECT doc_id, conv_id, turn_idx, {toks} AS toks FROM transcripts),
hit_convs AS (SELECT DISTINCT conv_id FROM tokd WHERE list_contains(toks, 'merge'))
SELECT t.doc_id FROM tokd t JOIN hit_convs h USING (conv_id)
WHERE t.turn_idx = 0
ORDER BY t.doc_id
"""


def match_span_first(sf_dir: str) -> pa.Table:
    """SpanFirst(Term 'spark', limit=2): docs whose first surviving 'spark'
    occurrence sits within positions 0-2 (post-stop renumbered: the first
    surviving token keeps its RAW position, later survivors go
    consecutive)."""
    from ..query import SpanFirst, Term

    s = get_searcher(sf_dir)
    res = s.search(SpanFirst(Term("text", "spark"), limit=2), limit=None, scored=False)
    rows = _hits_with_keys(s, res, with_rank=False)
    return rows.select(["doc_id"]).sort_by("doc_id")


def oracle_match_span_first() -> str:
    toks = tokenize_sql()
    stops = _stops_sql()
    # position of the k-th survivor (1-based k) = i0 + k - 1, where i0 is
    # the 0-based RAW index of the first surviving token
    return f"""
WITH transcripts AS ({TRANSCRIPTS_CTE}),
raw AS (
  SELECT doc_id,
         list_transform(regexp_extract_all(text, '[\\w*]+(?:\\.?[\\w*]+)*'),
                        t -> lower(t)) AS rawtoks,
         {toks} AS toks
  FROM transcripts
),
pos AS (
  SELECT doc_id,
         list_filter(generate_series(1, len(rawtoks)),
                     i -> length(rawtoks[i]) >= 2
                          AND rawtoks[i] NOT IN ({stops}))[1] - 1 AS i0,
         list_position(toks, 'spark') AS k0
  FROM raw
)
SELECT doc_id FROM pos
WHERE k0 IS NOT NULL AND k0 > 0 AND (i0 + k0 - 1) <= 2
ORDER BY doc_id
"""


def export_matches_spark(sf_dir: str) -> pa.Table:
    """Streaming match export (pipelines/export.py): every row containing
    'spark', evaluated per segment and streamed as a Ray Dataset — the
    driver only concatenates this small gate's batches."""
    from .export import matches_dataset

    s = get_searcher(sf_dir)  # ensures the index exists
    ds = matches_dataset(s.index_dir, Term("text", "spark"), columns=["doc_id"], scored=False)
    tbl = pa.concat_tables(
        [b for b in ds.iter_batches(batch_format="pyarrow")]
        or [pa.schema([("doc_id", pa.int64())]).empty_table()]
    )
    return tbl.select(["doc_id"]).sort_by("doc_id")


def oracle_export_matches_spark() -> str:
    toks = tokenize_sql()
    return f"""
WITH transcripts AS ({TRANSCRIPTS_CTE}),
tokd AS (SELECT doc_id, {toks} AS toks FROM transcripts)
SELECT doc_id FROM tokd WHERE list_contains(toks, 'spark')
ORDER BY doc_id
"""


def facet_query_buckets(sf_dir: str) -> pa.Table:
    """QueryFacet counts: docs containing 'data' bucketed by the FIRST
    matching named query (dict order), remainder under 'rest' —
    exercises the distributed per-bucket exclusion path
    (compat.QueryFacet)."""
    from .. import compat as wrr
    from ..query import Or, Term

    s = get_searcher(sf_dir)  # ensures the index exists
    ix = wrr.open_dir(s.index_dir)
    qd = {
        "merge_scan": Or([Term("text", "merge"), Term("text", "scan")]),
        "joins": Term("text", "join"),
    }
    with ix.searcher() as cs:
        res = cs.search(
            Term("text", "data"), limit=None,
            groupedby=wrr.QueryFacet(qd, other="rest"), maptype="count",
        )
        g = res.groups()
    keys = sorted(g)
    return pa.table(
        {"bucket": pa.array(keys), "n": pa.array([g[k] for k in keys], pa.int64())}
    )


def oracle_facet_query_buckets() -> str:
    toks = tokenize_sql()
    return f"""
WITH transcripts AS ({TRANSCRIPTS_CTE}),
tokd AS (SELECT {toks} AS toks FROM transcripts),
hits AS (
  SELECT CASE
    WHEN list_contains(toks, 'merge') OR list_contains(toks, 'scan')
      THEN 'merge_scan'
    WHEN list_contains(toks, 'join') THEN 'joins'
    ELSE 'rest' END AS bucket
  FROM tokd WHERE list_contains(toks, 'data')
)
SELECT bucket, COUNT(*)::BIGINT AS n FROM hits GROUP BY bucket ORDER BY bucket
"""
