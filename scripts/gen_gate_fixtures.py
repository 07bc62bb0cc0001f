"""Generate committed oracle fixtures for gates whose semantics are not
SQL-expressible (iterative BPE training, seeded LSH selection, sketch
estimation).

Each fixture is produced by an INDEPENDENT NAIVE single-process
implementation of the published spec (no Ray, no library pipeline code) so
the driver's fixture-oracle compare genuinely cross-checks the distributed
machinery against a second implementation, exactly like the SQL oracles
cross-check against DuckDB.  ``tests/test_gate_fixtures.py`` re-runs the
naive implementations per round and asserts the committed fixtures are not
stale.

Usage:  python scripts/gen_gate_fixtures.py [sf_dir ...]
        (default: /root/testdata/sf0.01 — the driver's gate scale)
"""

from __future__ import annotations

import hashlib
import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
FIXDIR = os.path.join(REPO, "tests", "fixtures")

END_OF_WORD = "▁"
MAX_VOCAB_WORDS = 50_000
N_MERGES = 200


# ---------------------------------------------------------------------------
# naive BPE (Sennrich et al. 2016 fig. 1, string-space symbol lists)
# ---------------------------------------------------------------------------


def naive_bpe_train(word_counts: dict, n_merges: int) -> list:
    vocab = [(list(w) + [END_OF_WORD], n) for w, n in word_counts.items() if w]
    out: list = []
    for _ in range(n_merges):
        pairs: dict = {}
        for sym, n in vocab:
            for a, b in zip(sym, sym[1:]):
                pairs[(a, b)] = pairs.get((a, b), 0) + n
        if not pairs:
            break
        top = sorted(pairs.items(), key=lambda kv: (-kv[1], kv[0]))[0][0]
        out.append(top)
        nv = []
        for sym, n in vocab:
            ns, i = [], 0
            while i < len(sym):
                if sym[i : i + 2] == [top[0], top[1]]:
                    ns.append(top[0] + top[1])
                    i += 2
                else:
                    ns.append(sym[i])
                    i += 1
            nv.append((ns, n))
        vocab = nv
    return out


def naive_bpe_encode_len(word: str, merges: list) -> int:
    sym = list(word) + [END_OF_WORD]
    for a, b in merges:
        i = 0
        while i < len(sym) - 1:
            if sym[i] == a and sym[i + 1] == b:
                sym[i : i + 2] = [a + b]
            else:
                i += 1
    return len(sym)


def gen_bpe_token_counts(sf_dir: str) -> pa.Table:
    docs = pq.read_table(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
    ).sort_by("doc_id")
    texts = [(t or "").lower().split(" ") for t in docs["text"].to_pylist()]
    counts: dict = {}
    for words in texts:
        for w in words:
            counts[w] = counts.get(w, 0) + 1
    counts.pop("", None)
    if len(counts) > MAX_VOCAB_WORDS:
        keep = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[:MAX_VOCAB_WORDS]
        counts = dict(keep)
    merges = naive_bpe_train(counts, N_MERGES)
    memo: dict = {}
    n_words, n_bpe = [], []
    for words in texts:
        n_words.append(len(words))
        total = 0
        for w in words:
            n = memo.get(w)
            if n is None:
                n = memo[w] = naive_bpe_encode_len(w, merges)
            total += n
        n_bpe.append(total)
    return pa.table(
        {
            "doc_id": docs["doc_id"],
            "n_words": pa.array(n_words, pa.int64()),
            "n_bpe_tokens": pa.array(n_bpe, pa.int64()),
        }
    )


# ---------------------------------------------------------------------------
# naive random-hyperplane LSH near-dup pairs (seeded, deterministic)
# ---------------------------------------------------------------------------


def gen_neardup_embedding_lsh(
    sf_dir: str,
    tau: float = 0.4,
    n_planes: int = 64,
    n_bands: int = 16,
    seed: int = 29,
) -> pa.Table:
    emb = pq.read_table(
        os.path.join(sf_dir, "embeddings.parquet"), columns=["vec_id", "embedding"]
    ).sort_by("vec_id")
    ids = emb["vec_id"].to_numpy()
    X = np.array(emb["embedding"].to_pylist(), dtype=np.float64)
    Xn = X / np.linalg.norm(X, axis=1, keepdims=True)
    H = np.random.default_rng(seed).standard_normal((X.shape[1], n_planes))
    bits = (Xn @ H) > 0
    width = n_planes // n_bands
    pairs: set = set()
    for b in range(n_bands):
        band = bits[:, b * width : (b + 1) * width]
        buckets: dict = {}
        for i in range(len(ids)):
            buckets.setdefault(tuple(band[i]), []).append(i)
        for members in buckets.values():
            for ii in range(len(members)):
                for jj in range(ii + 1, len(members)):
                    i, j = members[ii], members[jj]
                    sim = float(Xn[i] @ Xn[j])
                    if sim >= tau:
                        a, b2 = sorted((int(ids[i]), int(ids[j])))
                        pairs.add((a, b2, float(np.round(sim, 4))))
    rows = sorted(pairs)
    return pa.table(
        {
            "a": pa.array([r[0] for r in rows], pa.int64()),
            "b": pa.array([r[1] for r in rows], pa.int64()),
            "sim_r": pa.array([r[2] for r in rows], pa.float64()),
        }
    )


# ---------------------------------------------------------------------------
# naive sketches: HyperLogLog distinct users + Count-Min heavy hitters.
# Pure-Python int/hashlib reimplementations of the published specs
# (Flajolet et al. 2007; Cormode-Muthukrishnan 2005) with the same
# parameters as the library (p=12; d=4, w=2048) — no numpy vector paths.
# ---------------------------------------------------------------------------

_M64 = (1 << 64) - 1


def _splitmix_hash(uid: int) -> int:
    h = ((uid * 0x9E3779B97F4A7C15) & _M64) ^ 0xBF58476D1CE4E5B9
    h ^= h >> 31
    h = (h * 0x94D049BB133111EB) & _M64
    h ^= h >> 29
    return h


def gen_events_hll_users(sf_dir: str, p: int = 12) -> pa.Table:
    ev = pq.read_table(
        os.path.join(sf_dir, "events.parquet"), columns=["user_id", "event_type"]
    )
    m = 1 << p
    regs: dict = {}
    for uid, et in zip(ev["user_id"].to_pylist(), ev["event_type"].to_pylist()):
        h = _splitmix_hash(int(uid))
        idx = h >> (64 - p)
        rest = ((h << p) & _M64) | (1 << (p - 1))
        rank = (64 - rest.bit_length()) + 1
        r = regs.setdefault(et, [0] * m)
        if rank > r[idx]:
            r[idx] = rank
    rows = []
    for et in sorted(regs):
        r = regs[et]
        est = (0.7213 / (1 + 1.079 / m)) * m * m / sum(2.0 ** -x for x in r)
        zeros = r.count(0)
        if est <= 2.5 * m and zeros:
            import math

            est = m * math.log(m / zeros)
        rows.append((et, int(round(est))))
    return pa.table(
        {
            "event_type": pa.array([t for t, _ in rows], pa.string()),
            "approx_users": pa.array([n for _, n in rows], pa.int64()),
        }
    )


def gen_heavy_hitters_cms(
    sf_dir: str, k: int = 10, d: int = 4, w: int = 2048, n_cand: int = 64
) -> pa.Table:
    docs = pq.read_table(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
    ).sort_by("doc_id")
    counts: dict = {}  # insertion order = first appearance, like value_counts
    for t in docs["text"].to_pylist():
        for word in (t or "").lower().split(" "):
            counts[word] = counts.get(word, 0) + 1
    terms = list(counts)

    def cms_col(term: str, r: int) -> int:
        h = hashlib.blake2b(term.encode(), digest_size=8, salt=bytes([r])).digest()
        return int.from_bytes(h, "little") % w

    sk = [[0] * w for _ in range(d)]
    for t, n in counts.items():
        for r in range(d):
            sk[r][cms_col(t, r)] += n
    # per-batch candidate rule at gate scale (whole corpus = one batch):
    # stable sort by -count over first-appearance order, top n_cand
    cands = sorted(
        sorted(range(len(terms)), key=lambda i: -counts[terms[i]])[:n_cand],
        key=lambda i: terms[i],
    )
    scored = []
    for i in cands:
        t = terms[i]
        scored.append((t, min(sk[r][cms_col(t, r)] for r in range(d))))
    top = sorted(scored, key=lambda te: (-te[1], te[0]))[:k]
    return pa.table(
        {
            "term": pa.array([t for t, _ in top], pa.string()),
            "est_count": pa.array([n for _, n in top], pa.int64()),
        }
    )


def gen_sketches_approx(sf_dir: str) -> pa.Table:
    """The folded ``sketches_approx`` gate shape: which/key/n union of the
    HLL distinct-users and CMS heavy-hitter results."""
    import pandas as pd

    hll = gen_events_hll_users(sf_dir).to_pandas()
    hll.columns = ["key", "n"]
    hll.insert(0, "which", "events_hll_users")
    cms = gen_heavy_hitters_cms(sf_dir).to_pandas()
    cms.columns = ["key", "n"]
    cms.insert(0, "which", "heavy_hitters_cms")
    return pa.Table.from_pandas(
        pd.concat([hll, cms], ignore_index=True), preserve_index=False
    )


def gen_fixtures(sf_dir: str, tag: str) -> None:
    os.makedirs(FIXDIR, exist_ok=True)
    t = gen_bpe_token_counts(sf_dir)
    pq.write_table(t, os.path.join(FIXDIR, f"bpe_token_counts_{tag}.parquet"))
    print(f"bpe_token_counts_{tag}: {t.num_rows} rows")
    t = gen_neardup_embedding_lsh(sf_dir)
    pq.write_table(t, os.path.join(FIXDIR, f"neardup_embedding_lsh_{tag}.parquet"))
    print(f"neardup_embedding_lsh_{tag}: {t.num_rows} rows")
    t = gen_sketches_approx(sf_dir)
    pq.write_table(t, os.path.join(FIXDIR, f"sketches_approx_{tag}.parquet"))
    print(f"sketches_approx_{tag}: {t.num_rows} rows")


if __name__ == "__main__":
    dirs = sys.argv[1:] or ["/root/testdata/sf0.01"]
    for d in dirs:
        gen_fixtures(d, os.path.basename(os.path.normpath(d)))
