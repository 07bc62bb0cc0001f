"""Posting emission: corpus batches -> exploded posting table.

Replaces the reference's row-at-a-time ``add_document`` + PostingPool
(writing.py:748-822): one ``map_batches`` transform turns a batch of
documents into an Arrow posting table

    (field, term, docnum, weight, positions, len_byte, shard)

with one extra *sentinel* row per (scorable-field, doc) carrying the true
field length (term = "\\x00" — the analyzer can never produce it, since its
tokens are non-empty word characters), so doc lengths ride the same shuffle
instead of forcing a second tokenize pass over the corpus.

Weight semantics (parity-critical): BM25's "tf" is the summed token boost
per (doc, term) — 1.0 per occurrence without boosts — and positions are
post-stop-filter, renumbered (reference formats.py:190-236).

``shard = crc32(field:term) % num_shards`` is the shuffle key (stable across
processes, unlike Python's ``hash``); sentinel rows shard by docnum so doc
lengths spread evenly. Hot-term skew: a single term's postings land in one
shard, but a shard holds ~|vocab|/R terms so the skew is bounded by the
hottest term's posting count; see stages/segment_write.py for the block
layout that keeps even a giant posting list streamable.
"""

from __future__ import annotations

import zlib

import numpy as np
import pyarrow as pa

from ..functions.analysis import make_analyzer
from ..functions.quant import length_to_byte
from ..schema import IndexSchema

LEN_SENTINEL = "\x00"

POSTING_SCHEMA = pa.schema(
    [
        ("field", pa.string()),
        ("term", pa.string()),
        ("docnum", pa.uint64()),
        ("weight", pa.float32()),
        ("positions", pa.list_(pa.uint32())),
        ("len_byte", pa.uint8()),
        ("shard", pa.int32()),
    ]
)


def _shard_of(field: str, term: str, num_shards: int) -> int:
    return zlib.crc32(f"{field}:{term}".encode("utf-8")) % num_shards


def _salted_shard_of(field: str, term: str, salt: int, num_shards: int) -> int:
    return zlib.crc32(f"{field}:{term}#{salt}".encode("utf-8")) % num_shards


class Tokenizer:
    """Callable for ``map_batches``: compiles analyzers once per worker.

    Used as a plain function-factory product (stateless task) for cheap
    analyzers; pass the CLASS to map_batches with ``concurrency=`` to get an
    actor pool when analyzers hold heavy state (stemmer LRU cache)."""

    def __init__(
        self,
        schema: IndexSchema,
        num_shards: int = 16,
        salted: dict | None = None,
        doc_range: tuple | None = None,
    ):
        """``salted``: {(field, term): n_salts} — HOT TERMS whose postings
        are split across n_salts sub-shards by contiguous docnum range
        (``doc_range`` = (first_docnum, n_docs) of the segment), so each
        sub-shard's posting blocks cover a disjoint docnum range and the
        reader can concatenate block rows sorted by doc_min (the same
        self-contained-block property the segment merge relies on).  This is
        the skew valve: the hottest term's reduce work fans out over
        n_salts reducers instead of serializing in one."""
        self.schema = schema
        self.num_shards = num_shards
        self.salted = salted or {}
        self.doc_range = doc_range or (0, 1)
        self.analyzers = [
            (f.name, make_analyzer(f.analyzer), f.scorable, f.positions, f.boost)
            for f in schema.indexed_fields
        ]

    def __call__(self, batch: pa.Table) -> pa.Table:
        R = self.num_shards
        salted = self.salted
        doc_lo, doc_n = self.doc_range
        fields_out, terms_out, docs_out = [], [], []
        weights_out, pos_out, lens_out, shard_out = [], [], [], []
        docnums = batch["docnum"].to_numpy(zero_copy_only=False)

        for fname, analyze, scorable, keep_pos, boost in self.analyzers:
            if fname not in batch.column_names:
                continue
            col = batch[fname].to_pylist()
            for i, text in enumerate(col):
                if text is None:
                    continue
                toks = analyze(text)
                if not toks and not scorable:
                    continue
                docnum = int(docnums[i])
                # aggregate per (doc, term): weight = sum of boosts,
                # positions = renumbered post-filter positions
                agg: dict = {}
                for term, pos in toks:
                    e = agg.get(term)
                    if e is None:
                        agg[term] = e = [0.0, []]
                    e[0] += boost
                    e[1].append(pos)
                length = len(toks)
                lb = length_to_byte(length) if scorable else 0
                for term, (w, poss) in agg.items():
                    fields_out.append(fname)
                    terms_out.append(term)
                    docs_out.append(docnum)
                    weights_out.append(w)
                    pos_out.append(poss if keep_pos else None)
                    lens_out.append(lb)
                    n_salts = salted.get((fname, term))
                    if n_salts:
                        salt = (docnum - doc_lo) * n_salts // max(doc_n, 1)
                        shard_out.append(_salted_shard_of(fname, term, salt, R))
                    else:
                        shard_out.append(_shard_of(fname, term, R))
                if scorable:
                    # sentinel doc-length row
                    fields_out.append(fname)
                    terms_out.append(LEN_SENTINEL)
                    docs_out.append(docnum)
                    weights_out.append(float(length))
                    pos_out.append(None)
                    lens_out.append(lb)
                    shard_out.append(docnum % R)

        return pa.Table.from_arrays(
            [
                pa.array(fields_out, type=pa.string()),
                pa.array(terms_out, type=pa.string()),
                pa.array(docs_out, type=pa.uint64()),
                pa.array(weights_out, type=pa.float32()),
                pa.array(pos_out, type=pa.list_(pa.uint32())),
                pa.array(lens_out, type=pa.uint8()),
                pa.array(shard_out, type=pa.int32()),
            ],
            schema=POSTING_SCHEMA,
        )
