"""Training-data corpus operations over the ``documents`` table.

Large-scale-pipeline building blocks, each a Ray Data pipeline over
``documents.parquet`` (doc_id:int64, text:string, lang:string,
source:string, n_chars:int64) with, where SQL-expressible, a matching
DuckDB oracle (see ``__ray_entry__``):

  * exact dedup        — md5(text) hash-group, keep min doc_id
  * n-gram Jaccard near-dup — word-3-shingle MinHash(64) + LSH banding for
    candidates, EXACT shingle-Jaccard verification (so results equal the
    all-pairs oracle whenever LSH recall is 1 — 16 bands x 4 rows gives
    ~0.9998 recall at tau=0.8)
  * MinHash dedup      — drop any doc with a smaller verified near-dup
  * SimHash            — 64-bit fingerprints + Hamming<=k candidate pairs
  * text stats / quality scoring / token counting / fingerprinting
  * marker-based language ID

Scale notes: every op is map_batches + (at most) one groupby shuffle;
candidate verification fetches only the candidate docs' texts.  At 10^12
docs the LSH band table is the only all-to-all, keyed by (band, hash) which
is uniformly distributed by construction; exact-verify joins are bounded by
the duplicate rate.
"""

from __future__ import annotations

import hashlib
import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

# ---------------------------------------------------------------------------
# shared helpers
# ---------------------------------------------------------------------------

MERSENNE = (1 << 61) - 1
N_PERMS = 64
N_BANDS = 16  # x 4 rows per band
JACCARD_TAU = 0.8

_rng = np.random.default_rng(42)
# a < 2^29 and shingle hashes masked to 32 bits keep a*x + b < 2^62: the
# whole universal-hash family evaluates in native uint64 (no bignum path)
PERM_A = _rng.integers(1, 1 << 29, size=N_PERMS, dtype=np.uint64)
PERM_B = _rng.integers(0, MERSENNE, size=N_PERMS, dtype=np.uint64)
HASH_MASK = np.uint64((1 << 32) - 1)


def _read_documents(sf_dir: str, columns):
    import ray.data

    from .._rayutil import ensure_serializable

    ensure_serializable()
    return ray.data.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=columns
    )


def _shingles(text: str, k: int = 3) -> list:
    """Word k-shingles over ``lower().split(' ')`` — mirrors the SQL oracle's
    ``string_split(lower(text), ' ')`` exactly."""
    w = text.lower().split(" ")
    return [" ".join(w[i : i + k]) for i in range(len(w) - k + 1)]


def _hash64(values: list) -> np.ndarray:
    """Stable 61-bit hashes of strings (blake2b, runs-stable)."""
    return np.array(
        [
            int.from_bytes(hashlib.blake2b(v.encode(), digest_size=8).digest(), "little")
            & MERSENNE
            for v in values
        ],
        dtype=np.uint64,
    )


def _minhash(shingle_hashes: np.ndarray) -> np.ndarray:
    """64-perm MinHash signature of a shingle-hash set (vectorized uint64)."""
    if shingle_hashes.size == 0:
        return np.full(N_PERMS, MERSENNE, dtype=np.uint64)
    x = (shingle_hashes & HASH_MASK)[:, None]  # (n, 1)
    vals = (x * PERM_A + PERM_B) % np.uint64(MERSENNE)
    return vals.min(axis=0)


# ---------------------------------------------------------------------------
# exact dedup
# ---------------------------------------------------------------------------


def dedup_exact(sf_dir: str) -> pa.Table:
    """Kept doc_ids: min doc_id per md5(text) — hash-partitioned groupby."""
    ds = _read_documents(sf_dir, ["doc_id", "text"])

    def add_hash(batch: pa.Table) -> pa.Table:
        hs = [hashlib.md5(t.encode()).hexdigest() for t in batch["text"].to_pylist()]
        return pa.table({"h": pa.array(hs), "doc_id": batch["doc_id"]})

    kept = (
        ds.map_batches(add_hash, batch_format="pyarrow")
        .groupby("h")
        .min("doc_id")
    )
    parts = [b for b in kept.iter_batches(batch_format="pyarrow", batch_size=None)]
    t = pa.table({"doc_id": pa.concat_tables(parts)["min(doc_id)"]})
    return t.sort_by("doc_id")


def oracle_dedup_exact() -> str:
    return """
SELECT MIN(doc_id) AS doc_id FROM documents GROUP BY md5(text) ORDER BY doc_id
"""


# ---------------------------------------------------------------------------
# MinHash + LSH near-duplicate pairs (exact-verified n-gram Jaccard)
# ---------------------------------------------------------------------------


class MinHasher:
    """Actor-pool map_batches stage: text -> (doc_id, band, band_hash) rows.

    Stateful so the permutation table and hashlib setup are built once per
    actor (``__init__``), not per batch."""

    def __init__(self, n_bands: int = N_BANDS):
        self.n_bands = n_bands
        self.rows_per_band = N_PERMS // n_bands

    def __call__(self, batch: pa.Table) -> pa.Table:
        doc_ids, bands, bhashes = [], [], []
        r = self.rows_per_band
        for doc_id, text in zip(batch["doc_id"].to_pylist(), batch["text"].to_pylist()):
            sig = _minhash(_hash64(_shingles(text)))
            for b in range(self.n_bands):
                h = hashlib.blake2b(sig[b * r : (b + 1) * r].tobytes(), digest_size=8)
                doc_ids.append(doc_id)
                bands.append(b)
                bhashes.append(int.from_bytes(h.digest(), "little") >> 1)
        return pa.table(
            {
                "doc_id": pa.array(doc_ids, pa.int64()),
                "band": pa.array(bands, pa.int32()),
                "band_hash": pa.array(bhashes, pa.int64()),
            }
        )


def _lsh_candidate_pairs(sf_dir: str) -> set:
    """LSH bucket groupby -> candidate (a < b) doc_id pairs."""
    ds = _read_documents(sf_dir, ["doc_id", "text"])
    bands = ds.map_batches(MinHasher, concurrency=2, batch_format="pyarrow")

    def pairs_of_bucket(group: pa.Table) -> pa.Table:
        ids = sorted(group["doc_id"].to_pylist())
        a, b = [], []
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                a.append(ids[i])
                b.append(ids[j])
        return pa.table({"a": pa.array(a, pa.int64()), "b": pa.array(b, pa.int64())})

    pair_tbl = (
        bands.groupby(["band", "band_hash"])
        .map_groups(pairs_of_bucket, batch_format="pyarrow")
    )
    out = set()
    for batch in pair_tbl.iter_batches(batch_format="pyarrow", batch_size=None):
        out.update(zip(batch["a"].to_pylist(), batch["b"].to_pylist()))
    return out


def _exact_jaccard(sf_dir: str, pairs: set) -> pa.Table:
    """Exact shingle-set Jaccard for candidate pairs (fetch only those docs)."""
    if not pairs:
        return pa.table(
            {"a": pa.array([], pa.int64()), "b": pa.array([], pa.int64()),
             "jaccard": pa.array([], pa.float64())}
        )
    need = sorted({d for p in pairs for d in p})
    import pyarrow.parquet as pq

    tbl = pq.read_table(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"],
        filters=[("doc_id", "in", need)],
    )
    sh = {
        d: set(_shingles(t))
        for d, t in zip(tbl["doc_id"].to_pylist(), tbl["text"].to_pylist())
    }
    rows = []
    for a, b in sorted(pairs):
        sa, sb = sh[a], sh[b]
        union = len(sa | sb)
        j = len(sa & sb) / union if union else 0.0
        rows.append((a, b, j))
    return pa.table(
        {
            "a": pa.array([r[0] for r in rows], pa.int64()),
            "b": pa.array([r[1] for r in rows], pa.int64()),
            "jaccard": pa.array([r[2] for r in rows], pa.float64()),
        }
    )


def neardup_ngram_jaccard(sf_dir: str) -> pa.Table:
    """Near-duplicate pairs with word-3-shingle Jaccard >= 0.8:
    MinHash-LSH candidates, exact verification."""
    cand = _lsh_candidate_pairs(sf_dir)
    j = _exact_jaccard(sf_dir, cand)
    j = j.filter(pc.greater_equal(j["jaccard"], JACCARD_TAU))
    j = j.set_column(2, "jaccard", pc.round(j["jaccard"], 6))
    return j.sort_by([("a", "ascending"), ("b", "ascending")])


def oracle_neardup_ngram_jaccard() -> str:
    return f"""
WITH toks AS (SELECT doc_id, string_split(lower(text), ' ') w FROM documents),
sh AS (SELECT doc_id,
              list_distinct([w[i]||' '||w[i+1]||' '||w[i+2]
                             for i in generate_series(1, len(w)-2)]) s
       FROM toks),
pairs AS (
  SELECT a.doc_id a, b.doc_id b,
         len(list_intersect(a.s, b.s))::DOUBLE
           / len(list_distinct(list_concat(a.s, b.s))) j
  FROM sh a JOIN sh b ON a.doc_id < b.doc_id)
SELECT a, b, ROUND(j, 6) AS jaccard FROM pairs WHERE j >= {JACCARD_TAU}
ORDER BY a, b
"""


def dedup_minhash(sf_dir: str) -> pa.Table:
    """Kept doc_ids: drop every doc that has a SMALLER verified near-dup
    (deterministic, SQL-expressible alternative to connected components)."""
    dup = neardup_ngram_jaccard(sf_dir)
    dropped = set(dup["b"].to_pylist())
    import pyarrow.parquet as pq

    all_ids = pq.read_table(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id"]
    )["doc_id"].to_pylist()
    kept = sorted(d for d in all_ids if d not in dropped)
    return pa.table({"doc_id": pa.array(kept, pa.int64())})


def oracle_dedup_minhash() -> str:
    return f"""
WITH toks AS (SELECT doc_id, string_split(lower(text), ' ') w FROM documents),
sh AS (SELECT doc_id,
              list_distinct([w[i]||' '||w[i+1]||' '||w[i+2]
                             for i in generate_series(1, len(w)-2)]) s
       FROM toks),
dropped AS (
  SELECT DISTINCT b.doc_id
  FROM sh a JOIN sh b ON a.doc_id < b.doc_id
  WHERE len(list_intersect(a.s, b.s))::DOUBLE
          / len(list_distinct(list_concat(a.s, b.s))) >= {JACCARD_TAU})
SELECT doc_id FROM documents WHERE doc_id NOT IN (SELECT doc_id FROM dropped)
ORDER BY doc_id
"""


# ---------------------------------------------------------------------------
# SimHash (rows-only check: bit-twiddling isn't reasonable ANSI SQL)
# ---------------------------------------------------------------------------


def _simhash64(text: str) -> int:
    """64-bit SimHash over word features (weight = term frequency)."""
    from collections import Counter

    acc = np.zeros(64, dtype=np.int64)
    for word, cnt in Counter(text.lower().split(" ")).items():
        h = int.from_bytes(hashlib.blake2b(word.encode(), digest_size=8).digest(), "little")
        bits = (h >> np.arange(64, dtype=np.uint64)) & 1
        acc += np.where(bits == 1, cnt, -cnt)
    out = 0
    for i in np.flatnonzero(acc > 0):
        out |= 1 << int(i)
    return out


class SimHasher:
    """Actor-pool stage: doc -> 64-bit simhash."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        hs = [_simhash64(t) for t in batch["text"].to_pylist()]
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                # store as int64 via two's complement for parquet friendliness
                "simhash": pa.array(np.array(hs, dtype=np.uint64).astype(np.int64)),
            }
        )


def simhash_fingerprints(sf_dir: str) -> pa.Table:
    ds = _read_documents(sf_dir, ["doc_id", "text"])
    t = pa.concat_tables(
        ds.map_batches(SimHasher, concurrency=2, batch_format="pyarrow").iter_batches(
            batch_format="pyarrow", batch_size=None
        )
    )
    return t.sort_by("doc_id")


def simhash_neardup_pairs(sf_dir: str, max_hamming: int = 3) -> pa.Table:
    """Pairs within Hamming distance <= k via the 4-table pigeonhole trick:
    split 64 bits into k+1 bands; equal-band groupby yields candidates
    (any pair within distance k must agree on >= 1 band), then exact
    popcount verify."""
    sigs = simhash_fingerprints(sf_dir)
    ids = sigs["doc_id"].to_numpy()
    hs = sigs["simhash"].to_numpy().astype(np.uint64)
    nb = max_hamming + 1
    width = 64 // nb
    cands = set()
    for b in range(nb):
        band = (hs >> np.uint64(b * width)) & np.uint64((1 << width) - 1)
        order = np.argsort(band, kind="stable")
        sb = band[order]
        starts = np.flatnonzero(np.r_[True, sb[1:] != sb[:-1]])
        ends = np.r_[starts[1:], sb.size]
        for s, e in zip(starts, ends):
            if e - s > 1:
                grp = np.sort(ids[order[s:e]])
                for i in range(grp.size):
                    for j in range(i + 1, grp.size):
                        cands.add((int(grp[i]), int(grp[j])))
    id2h = dict(zip(ids.tolist(), hs.tolist()))
    rows = [
        (a, b, int(bin(id2h[a] ^ id2h[b]).count("1")))
        for a, b in sorted(cands)
    ]
    rows = [r for r in rows if r[2] <= max_hamming]
    return pa.table(
        {
            "a": pa.array([r[0] for r in rows], pa.int64()),
            "b": pa.array([r[1] for r in rows], pa.int64()),
            "hamming": pa.array([r[2] for r in rows], pa.int64()),
        }
    )


# ---------------------------------------------------------------------------
# text analysis: stats, quality, token counts, fingerprint, language ID
# ---------------------------------------------------------------------------

STOPSET = (
    "a an and are as at be by for from has he in is it its of on that the to was were will with"
).split()


def text_stats(sf_dir: str) -> pa.Table:
    """Per-doc: whitespace token count, regex (BPE-ish) token count, mean
    word length, stopword ratio, quality score — all vectorized per batch,
    SQL-parity formulas."""
    import re

    ds = _read_documents(sf_dir, ["doc_id", "text"])
    bpe_pat = re.compile(r"\w+|[^\w\s]")
    stopset = set(STOPSET)

    def stats(batch: pa.Table) -> pa.Table:
        texts = batch["text"].to_pylist()
        n_tok, n_bpe, mean_len, stop_r, qual = [], [], [], [], []
        for t in texts:
            words = t.lower().split(" ")
            nw = len(words)
            n_tok.append(nw)
            n_bpe.append(len(bpe_pat.findall(t)))
            ml = sum(len(w) for w in words) / nw if nw else 0.0
            mean_len.append(round(ml, 6))
            sr = sum(1 for w in words if w in stopset) / nw if nw else 0.0
            stop_r.append(round(sr, 6))
            # quality: long-enough docs with moderate stopword rate score high
            q = min(nw / 50.0, 1.0) * (1.0 - abs(sr - 0.4))
            qual.append(round(q, 6))
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "n_tokens": pa.array(n_tok, pa.int64()),
                "n_bpe_tokens": pa.array(n_bpe, pa.int64()),
                "mean_word_len": pa.array(mean_len, pa.float64()),
                "stopword_ratio": pa.array(stop_r, pa.float64()),
                "quality": pa.array(qual, pa.float64()),
            }
        )

    t = pa.concat_tables(
        ds.map_batches(stats, batch_format="pyarrow").iter_batches(
            batch_format="pyarrow", batch_size=None
        )
    )
    return t.sort_by("doc_id")


def oracle_text_stats() -> str:
    stops = ", ".join(f"'{w}'" for w in STOPSET)
    return f"""
WITH w AS (SELECT doc_id, text, string_split(lower(text), ' ') words FROM documents),
s AS (
  SELECT doc_id,
         len(words)::BIGINT n_tokens,
         len(regexp_extract_all(text, '\\w+|[^\\w\\s]'))::BIGINT n_bpe_tokens,
         list_sum(list_transform(words, x -> len(x)))::DOUBLE / len(words) ml,
         len(list_filter(words, x -> x IN ({stops})))::DOUBLE / len(words) sr
  FROM w)
SELECT doc_id, n_tokens, n_bpe_tokens,
       ROUND(ml, 6) AS mean_word_len,
       ROUND(sr, 6) AS stopword_ratio,
       ROUND(LEAST(n_tokens / 50.0, 1.0) * (1.0 - ABS(sr - 0.4)), 6) AS quality
FROM s ORDER BY doc_id
"""


def fingerprint_docs(sf_dir: str) -> pa.Table:
    """Deterministic document fingerprint: md5 of whitespace-normalized
    lowered text (the cross-system-stable exact-dedup key)."""
    import re

    ws = re.compile(r"\s+")
    ds = _read_documents(sf_dir, ["doc_id", "text"])

    def fp(batch: pa.Table) -> pa.Table:
        out = [
            hashlib.md5(ws.sub(" ", t.lower()).strip().encode()).hexdigest()
            for t in batch["text"].to_pylist()
        ]
        return pa.table({"doc_id": batch["doc_id"], "fingerprint": pa.array(out)})

    t = pa.concat_tables(
        ds.map_batches(fp, batch_format="pyarrow").iter_batches(
            batch_format="pyarrow", batch_size=None
        )
    )
    return t.sort_by("doc_id")


def oracle_fingerprint_docs() -> str:
    return """
SELECT doc_id,
       md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS fingerprint
FROM documents ORDER BY doc_id
"""


LANG_MARKERS = {
    "en": ["the", "value", "fast", "query", "table"],
    "de": ["der", "und", "wert", "tabelle", "schnell"],
    "es": ["el", "valor", "tabla", "consulta", "rapido"],
    "fr": ["le", "valeur", "table", "requete", "rapide"],
    "zh": ["biao", "zhi", "kuai", "chaxun", "shuju"],
}


def lang_id(sf_dir: str) -> pa.Table:
    """Marker-word language ID (deterministic heuristic): score = count of
    marker tokens per language; predict argmax, ties -> alphabetically
    first language.  A real system swaps the marker table for char-n-gram
    profiles; the pipeline shape (stateless vectorized map) is identical."""
    ds = _read_documents(sf_dir, ["doc_id", "text"])
    langs = sorted(LANG_MARKERS)
    markers = {l: set(LANG_MARKERS[l]) for l in langs}

    def predict(batch: pa.Table) -> pa.Table:
        preds, scores = [], []
        for t in batch["text"].to_pylist():
            words = t.lower().split(" ")
            cnt = {l: sum(1 for w in words if w in markers[l]) for l in langs}
            best = max(langs, key=lambda l: (cnt[l], ))  # ties: first alphabetical
            # max() keeps the FIRST max in iteration order = alphabetical
            preds.append(best)
            scores.append(cnt[best])
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "pred_lang": pa.array(preds),
                "marker_hits": pa.array(scores, pa.int64()),
            }
        )

    t = pa.concat_tables(
        ds.map_batches(predict, batch_format="pyarrow").iter_batches(
            batch_format="pyarrow", batch_size=None
        )
    )
    return t.sort_by("doc_id")


def oracle_lang_id() -> str:
    langs = sorted(LANG_MARKERS)
    score_cols = ",\n         ".join(
        "len(list_filter(words, x -> x IN ({})))::BIGINT s_{}".format(
            ", ".join(f"'{w}'" for w in LANG_MARKERS[l]), l
        )
        for l in langs
    )
    # alphabetical tie-break: first language with score == greatest
    greatest = "GREATEST({})".format(", ".join(f"s_{l}" for l in langs))
    case = "CASE " + " ".join(
        f"WHEN s_{l} = g THEN '{l}'" for l in langs
    ) + " END"
    return f"""
WITH w AS (SELECT doc_id, string_split(lower(text), ' ') words FROM documents),
s AS (SELECT doc_id, {score_cols} FROM w),
g AS (SELECT *, {greatest} g FROM s)
SELECT doc_id, {case} AS pred_lang, g AS marker_hits FROM g ORDER BY doc_id
"""


# ---- winnowing fingerprints (rolling hash) --------------------------------

WINNOW_K = 5       # k-gram length (chars)
WINNOW_W = 4       # winnowing window (hashes)
WINNOW_B = 31      # polynomial base
WINNOW_M = 2_147_483_647  # modulus (2^31 - 1)


def winnow_fingerprints(sf_dir: str) -> pa.Table:
    """Winnowing document fingerprints (Schleimer/Wilkerson/Aiken 2003):
    polynomial rolling hashes of the lowered text's char k-grams, then the
    minimum hash of each sliding window of ``WINNOW_W`` hashes; the
    fingerprint is the DISTINCT set of selected hash values (the tie rule
    picks a position, not a value, so the value set is rule-independent).
    Texts yielding fewer than W hashes contribute their single overall
    minimum.  Exploded (doc_id, fp) rows, sorted."""
    ds = _read_documents(sf_dir, ["doc_id", "text"])
    powers = np.array(
        [WINNOW_B ** (WINNOW_K - 1 - j) for j in range(WINNOW_K)], dtype=np.int64
    )

    def fp(batch: pa.Table) -> pa.Table:
        doc_ids, fps = [], []
        for did, text in zip(batch["doc_id"].to_pylist(), batch["text"].to_pylist()):
            t = (text or "").lower()
            if len(t) < WINNOW_K:
                continue
            codes = np.frombuffer(t.encode("utf-32-le"), dtype=np.uint32).astype(np.int64)
            grams = np.lib.stride_tricks.sliding_window_view(codes, WINNOW_K)
            hashes = (grams @ powers) % WINNOW_M
            if hashes.size >= WINNOW_W:
                wmins = np.lib.stride_tricks.sliding_window_view(
                    hashes, WINNOW_W
                ).min(axis=1)
            else:
                wmins = hashes.min(keepdims=True)
            sel = np.unique(wmins)
            doc_ids.extend([did] * sel.size)
            fps.extend(sel.tolist())
        return pa.table(
            {"doc_id": pa.array(doc_ids, pa.int64()), "fp": pa.array(fps, pa.int64())}
        )

    t = pa.concat_tables(
        ds.map_batches(fp, batch_format="pyarrow").iter_batches(
            batch_format="pyarrow", batch_size=None
        )
    )
    return t.sort_by([("doc_id", "ascending"), ("fp", "ascending")])


def oracle_winnow_fingerprints() -> str:
    k, w, b, m = WINNOW_K, WINNOW_W, WINNOW_B, WINNOW_M
    gram = " + ".join(
        f"ord(substr(t, i + {j}, 1)) * {b ** (k - 1 - j)}" for j in range(k)
    )
    return f"""
WITH lowered AS (
  SELECT doc_id, lower(text) AS t FROM documents WHERE length(text) >= {k}
),
hashed AS (
  SELECT doc_id,
         list_transform(generate_series(1, length(t) - {k} + 1),
                        i -> ({gram}) % {m}) AS hs
  FROM lowered
),
winnowed AS (
  SELECT doc_id,
         CASE WHEN len(hs) >= {w}
              THEN list_transform(generate_series(1, len(hs) - {w} + 1),
                                  p -> list_aggregate(hs[p:p + {w} - 1], 'min'))
              ELSE [list_aggregate(hs, 'min')]
         END AS wmins
  FROM hashed
)
SELECT DISTINCT doc_id, unnest(wmins) AS fp
FROM winnowed ORDER BY doc_id, fp
"""
