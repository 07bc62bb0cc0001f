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
import pyarrow.compute as pc

import itertools
import re as _re

from ..functions.analysis import make_analyzer
from ..functions.quant import length_to_byte, lengths_to_bytes
from ..functions.varint import binary_array_from_offsets, encode_varints, encode_varints_with_offsets
from ..schema import IndexSchema

LEN_SENTINEL = "\x00"

POSTING_SCHEMA = pa.schema(
    [
        ("field", pa.string()),
        ("term", pa.string()),
        ("docnum", pa.uint64()),
        ("weight", pa.float32()),
        # per-posting varint stream: varint(count) + delta-varints — encoded
        # ONCE here so the shuffle moves compact bytes and the segment
        # writer can blockify by pure buffer slicing
        ("positions", pa.binary()),
        # optional char-offset payload (reference Characters format,
        # formats.py:344-409): varint stream [count, s1, e1-s1, s2-e1,
        # e2-s2, ...] per posting; null unless the field spec sets chars
        ("chars", pa.binary()),
        # optional per-position boost payload (reference PositionBoosts /
        # CharacterBoosts formats, formats.py:345-470): varint stream
        # [count, f32bits(b1), f32bits(b2), ...] per posting; null unless
        # the field spec sets boosts (missing payload decodes as all-1.0)
        ("boosts", pa.binary()),
        # generic USER-FORMAT payload (whoosh_reloaded_ray/formats.py —
        # the custom posting Format plug point): varint-length-framed
        # bytes per posting so per-posting boundaries survive the block
        # concatenation in the segment writer; null unless the field spec
        # names a registered format
        ("payload", pa.binary()),
        ("len_byte", pa.uint8()),
        ("shard", pa.int32()),
    ]
)

# Shuffle combiner format: ONE row per (shard, field, term) per tokenizer
# batch instead of one row per posting.  The per-posting columns become
# packed byte blobs (fixed-width dtypes concatenated; variable-width
# binaries as concatenated values + an int32 lengths blob with -1 marking
# null), so the all-to-all exchange moves ~2.5x fewer bytes and ~10x fewer
# rows (a zipfian batch of 8k docs holds ~250k postings but only ~25k
# distinct terms).  The segment writer unpacks back to POSTING_SCHEMA with
# pure buffer arithmetic before its (unchanged) blockify path — final index
# bytes are identical to the unpacked pipeline's.
PACKED_SCHEMA = pa.schema(
    [
        ("field", pa.string()),
        ("term", pa.string()),
        ("shard", pa.int32()),
        ("n", pa.int32()),
        ("docnums", pa.binary()),    # n x uint64
        ("weights", pa.binary()),    # n x float32
        ("len_bytes", pa.binary()),  # n x uint8
        ("positions", pa.binary()), ("positions_lens", pa.binary()),
        ("chars", pa.binary()), ("chars_lens", pa.binary()),
        ("boosts", pa.binary()), ("boosts_lens", pa.binary()),
        ("payload", pa.binary()), ("payload_lens", pa.binary()),
    ]
)


def _runs_binary(starts_bytes: np.ndarray, data_buf, total: int) -> pa.Array:
    """Binary array whose value i is data[starts_bytes[i]:starts_bytes[i+1]]
    — zero-copy: the runs tile the buffer in order, so the packed values
    share the source data buffer and only the offsets are new."""
    offs = np.empty(starts_bytes.size + 1, dtype=np.int32)
    offs[:-1] = starts_bytes
    offs[-1] = total
    return pa.Array.from_buffers(
        pa.binary(), starts_bytes.size,
        [None, pa.py_buffer(offs.tobytes()), data_buf],
    )


def _pack_var_column(col, starts: np.ndarray, ends: np.ndarray) -> tuple:
    """(values, lens) packed arrays for a per-posting binary column."""
    arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    n = len(arr)
    g = starts.size
    if arr.null_count == n or n == 0:
        # uniform-null column (chars/boosts/payload on plain TEXT fields):
        # ship nothing at all — null values + null lens blob
        return pa.nulls(g, pa.binary()), pa.nulls(g, pa.binary())
    if arr.offset != 0:  # defensive: normalize a sliced array
        arr = pa.concat_arrays([arr])
    voff = np.frombuffer(arr.buffers()[1], dtype=np.int32, count=n + 1)
    lens = (voff[1:] - voff[:-1]).astype(np.int32)
    if arr.null_count:
        isnull = pc.is_null(arr).to_numpy(zero_copy_only=False)
        lens[isnull] = -1
    data_buf = arr.buffers()[2] or pa.py_buffer(b"")
    vals = _runs_binary(voff[starts].astype(np.int64), data_buf, int(voff[-1]))
    lens_vals = _runs_binary(
        starts.astype(np.int64) * 4, pa.py_buffer(lens.tobytes()), n * 4
    )
    return vals, lens_vals


def _pack_fixed(npvals: np.ndarray, starts: np.ndarray) -> pa.Array:
    itemsize = npvals.dtype.itemsize
    return _runs_binary(
        starts.astype(np.int64) * itemsize,
        pa.py_buffer(np.ascontiguousarray(npvals).tobytes()),
        npvals.size * itemsize,
    )


def pack_postings(tbl: pa.Table) -> pa.Table:
    """POSTING_SCHEMA -> PACKED_SCHEMA (see PACKED_SCHEMA docstring)."""
    n = tbl.num_rows
    if n == 0:
        return PACKED_SCHEMA.empty_table()
    order = pc.sort_indices(
        tbl,
        sort_keys=[
            ("shard", "ascending"), ("field", "ascending"),
            ("term", "ascending"), ("docnum", "ascending"),
        ],
    )
    tbl = tbl.take(order).combine_chunks()
    fcodes = pc.dictionary_encode(tbl["field"].chunk(0)).indices.to_numpy()
    tcodes = pc.dictionary_encode(tbl["term"].chunk(0)).indices.to_numpy()
    shards = tbl["shard"].to_numpy()
    change = np.empty(n, dtype=bool)
    change[0] = True
    np.not_equal(tcodes[1:], tcodes[:-1], out=change[1:])
    change[1:] |= fcodes[1:] != fcodes[:-1]
    change[1:] |= shards[1:] != shards[:-1]
    starts = np.flatnonzero(change)
    ends = np.append(starts[1:], n)
    take_starts = pa.array(starts)

    cols = {
        "field": tbl["field"].take(take_starts),
        "term": tbl["term"].take(take_starts),
        "shard": tbl["shard"].take(take_starts),
        "n": pa.array((ends - starts).astype(np.int32), pa.int32()),
        "docnums": _pack_fixed(tbl["docnum"].to_numpy(), starts),
        "weights": _pack_fixed(tbl["weight"].to_numpy(), starts),
        "len_bytes": _pack_fixed(tbl["len_byte"].to_numpy(), starts),
    }
    for name in ("positions", "chars", "boosts", "payload"):
        vals, lens = _pack_var_column(tbl[name], starts, ends)
        cols[name] = vals
        cols[f"{name}_lens"] = lens
    return pa.Table.from_arrays(
        [cols[f.name] for f in PACKED_SCHEMA], schema=PACKED_SCHEMA
    )


def _concat_bin(col) -> memoryview:
    """The concatenated bytes of a (null-free) binary column, zero-copy."""
    arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    if len(arr) == 0:
        return memoryview(b"")
    if arr.offset != 0:
        arr = pa.concat_arrays([arr])
    voff = np.frombuffer(arr.buffers()[1], dtype=np.int32, count=len(arr) + 1)
    data = arr.buffers()[2]
    if data is None:
        return memoryview(b"")
    return memoryview(data)[int(voff[0]): int(voff[-1])]


def _unpack_var(values_col, lens_col, total: int, nper: np.ndarray) -> pa.Array:
    lcol = (
        lens_col.combine_chunks()
        if isinstance(lens_col, pa.ChunkedArray)
        else lens_col
    )
    if lcol.null_count == len(lcol):
        return pa.nulls(total, pa.binary())  # uniformly-null packed column
    if lcol.null_count:
        # mix of null-run rows and packed rows: expand null runs to -1 lens
        isnull = pc.is_null(lcol).to_numpy(zero_copy_only=False)
        packed_lens = np.frombuffer(_concat_bin(pc.drop_null(lcol)), dtype=np.int32)
        lens = np.empty(total, dtype=np.int32)
        row_null = np.repeat(isnull, nper)
        lens[row_null] = -1
        lens[~row_null] = packed_lens
        vals_nonnull = pc.drop_null(
            values_col.combine_chunks()
            if isinstance(values_col, pa.ChunkedArray)
            else values_col
        )
        data = _concat_bin(vals_nonnull)
        valid = lens >= 0
        sizes = np.where(valid, lens, 0).astype(np.int64)
        offs = np.empty(total + 1, dtype=np.int32)
        offs[0] = 0
        offs[1:] = np.cumsum(sizes).astype(np.int32)
        validity = pa.py_buffer(np.packbits(valid, bitorder="little").tobytes())
        return pa.Array.from_buffers(
            pa.binary(), total,
            [validity, pa.py_buffer(offs.tobytes()), pa.py_buffer(data)],
            null_count=int(total - valid.sum()),
        )
    lens = np.frombuffer(_concat_bin(lens_col), dtype=np.int32)
    data = _concat_bin(values_col)
    valid = lens >= 0
    sizes = np.where(valid, lens, 0).astype(np.int64)
    offs = np.empty(total + 1, dtype=np.int32)
    offs[0] = 0
    offs[1:] = np.cumsum(sizes).astype(np.int32)
    nulls = int(total - valid.sum())
    validity = None
    if nulls:
        validity = pa.py_buffer(np.packbits(valid, bitorder="little").tobytes())
    return pa.Array.from_buffers(
        pa.binary(), total,
        [validity, pa.py_buffer(offs.tobytes()), pa.py_buffer(data)],
        null_count=nulls,
    )


def unpack_postings(packed: pa.Table) -> pa.Table:
    """PACKED_SCHEMA -> POSTING_SCHEMA (exact inverse of pack_postings up
    to row order, which the segment writer re-sorts anyway)."""
    if packed.num_rows == 0:
        return POSTING_SCHEMA.empty_table()
    packed = packed.combine_chunks()
    nper = packed["n"].to_numpy()
    total = int(nper.sum())
    idx = pa.array(np.repeat(np.arange(packed.num_rows, dtype=np.int64), nper))
    cols = {
        "field": packed["field"].take(idx),
        "term": packed["term"].take(idx),
        "docnum": pa.array(
            np.frombuffer(_concat_bin(packed["docnums"]), dtype=np.uint64),
            pa.uint64(),
        ),
        "weight": pa.array(
            np.frombuffer(_concat_bin(packed["weights"]), dtype=np.float32),
            pa.float32(),
        ),
        "len_byte": pa.array(
            np.frombuffer(_concat_bin(packed["len_bytes"]), dtype=np.uint8),
            pa.uint8(),
        ),
        "shard": packed["shard"].take(idx),
    }
    for name in ("positions", "chars", "boosts", "payload"):
        cols[name] = _unpack_var(packed[name], packed[f"{name}_lens"], total, nper)
    return pa.Table.from_arrays(
        [cols[f.name] for f in POSTING_SCHEMA], schema=POSTING_SCHEMA
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
        pack: bool = True,
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
        # pack=True emits the per-(shard,field,term) combiner format
        # (PACKED_SCHEMA) so the shuffle moves packed runs, not rows
        self.pack = pack
        self.specs = [
            (f.name, f.analyzer, f.scorable, f.positions, f.boost)
            for f in schema.indexed_fields
        ]
        # fields storing char-offset payloads (reference Characters format)
        self.chars_fields = {
            f.name for f in schema.indexed_fields if getattr(f, "chars", False)
        }
        # fields storing per-position boost payloads (reference
        # PositionBoosts/CharacterBoosts formats)
        self.boosts_fields = {
            f.name for f in schema.indexed_fields if getattr(f, "boosts", False)
        }
        # user-registered posting Format codecs (formats.py plug point):
        # resolved HERE on the driver so the codec instances ship to the
        # workers inside the serialized stage
        from ..formats import get_format

        self.custom_formats = {
            f.name: get_format(f.format)
            for f in schema.indexed_fields
            if getattr(f, "format", None)
        }
        self.analyzers = [
            (f.name, make_analyzer(f.analyzer), f.scorable, f.positions, f.boost)
            for f in schema.indexed_fields
        ]
        # separate spelling fields (reference TEXT(spelling=True),
        # fields.py:296-330): unstemmed word forms -> "spell_<name>",
        # weight 1 per unique word per doc (frequency == doc frequency,
        # matching the reference's one-post-per-spellable-word)
        import dataclasses as _dc

        self.spell_specs = [
            (
                f"spell_{f.name}",
                f.name,
                _dc.replace(f.analyzer, kind="standard", stemmer=None),
            )
            for f in schema.indexed_fields
            if getattr(f, "spelling", False)
            and f.analyzer is not None
            and (f.analyzer.stemmer or f.analyzer.kind == "stemming")
        ]
        self._vec_pats: dict = {}

    @staticmethod
    def _row_boosts(fname, batch):
        """Per-row write-time boost (reference writing.py:417-426 via
        add_document's ``_boost`` / ``_<field>_boost`` kwargs): the
        field-specific column REPLACES the doc-level one when present.
        None when neither column exists (the common case — zero cost)."""
        key = f"_{fname}_boost"
        have_f = key in batch.column_names
        have_d = "_boost" in batch.column_names
        if not (have_f or have_d):
            return None
        doc = (
            batch["_boost"].to_numpy(zero_copy_only=False).astype(np.float64)
            if have_d
            else np.ones(len(batch), dtype=np.float64)
        )
        doc = np.where(np.isnan(doc), 1.0, doc)
        if not have_f:
            return doc
        fld = batch[key].to_numpy(zero_copy_only=False).astype(np.float64)
        return np.where(np.isnan(fld), doc, fld)

    @staticmethod
    def _delim_kw(aspec):
        """kwargs of a single trailing ``delimited_attribute`` post filter
        (the boost-payload source), or None for any other chain."""
        pf = getattr(aspec, "post_filters", None) or []
        if len(pf) == 1 and pf[0][0] == "delimited_attribute":
            return dict(pf[0][1])
        return None

    @staticmethod
    def _encode_boosts(blist) -> bytes:
        """Per-posting boost payload: varint stream
        [count, f32bits(b1), ...] — float32 precision, matching the
        stored weight column's precision."""
        arr = np.empty(len(blist) + 1, dtype=np.uint64)
        arr[0] = len(blist)
        arr[1:] = np.asarray(blist, dtype=np.float32).view(np.uint32).astype(np.uint64)
        return encode_varints(arr)

    # ---- vectorized standard/simple path ---------------------------------

    def _vector_field(self, fname, spec_tuple, batch, docnums, out, unit_weight=False):
        """Vectorized analysis for standard/simple analyzers: one regex C
        call per row; pyarrow kernels for lowercase + dictionary encode;
        stop/size masks computed per UNIQUE term; whoosh position
        renumbering and per-(doc,term) aggregation as numpy segment ops —
        no per-token Python loop."""
        _, analyzer_spec, scorable, keep_pos, boost = spec_tuple
        pat = self._vec_pats.setdefault(
            fname, _re.compile(analyzer_spec.pattern, _re.UNICODE)
        )
        stops = analyzer_spec.stopwords
        minsize = analyzer_spec.minsize
        maxsize = analyzer_spec.maxsize

        texts = batch[fname].to_pylist()
        valid = np.array([t is not None for t in texts])
        if pat.groups:
            # group-bearing patterns (e.g. the reference url_pattern) must
            # yield whole matches, not findall's group tuples
            toks_per_row = [
                [m.group(0) for m in pat.finditer(t)] if t is not None else []
                for t in texts
            ]
        else:
            toks_per_row = [pat.findall(t) if t is not None else [] for t in texts]
        counts = np.fromiter((len(r) for r in toks_per_row), dtype=np.int64, count=len(texts))
        n = int(counts.sum())
        row_idx = np.repeat(np.arange(len(texts)), counts)
        arr = pa.array(list(itertools.chain.from_iterable(toks_per_row)), type=pa.string())
        if analyzer_spec.lowercase:
            # arrow's utf8_lower diverges from Python str.lower on a few
            # codepoints (Turkish dotted I, Greek final sigma) — the
            # reference lowers with str.lower, so only use the C kernel for
            # pure-ASCII batches and fall back to Python otherwise
            if n == 0 or pc.all(pc.string_is_ascii(arr)).as_py():
                arr = pc.ascii_lower(arr)
            else:
                arr = pa.array([v.lower() for v in arr.to_pylist()], pa.string())

        # dictionary-encode FIRST: stop/size masks computed once per UNIQUE
        # term (a few thousand) instead of per token (hundreds of thousands)
        denc = pc.dictionary_encode(arr)
        codes = denc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        uniques = denc.dictionary
        nu = len(uniques)
        keep_u = np.ones(nu, dtype=bool)
        ulen = pc.utf8_length(uniques).to_numpy(zero_copy_only=False)
        if minsize:
            keep_u &= ulen >= minsize
        if maxsize is not None:
            keep_u &= ulen <= maxsize
        if stops:
            keep_u &= ~pc.is_in(uniques, value_set=pa.array(list(stops), pa.string())).to_numpy(
                zero_copy_only=False
            )
        keep = keep_u[codes] if n else np.zeros(0, dtype=bool)

        # positions: pre-filter index within row, then whoosh renumbering
        # (first survivor keeps its ORIGINAL index, rest consecutive)
        row_tok_start = np.zeros(len(texts), dtype=np.int64)
        np.cumsum(counts[:-1], out=row_tok_start[1:])
        pre_pos = np.arange(n) - np.repeat(row_tok_start, counts)
        csum = np.cumsum(keep)
        # rows with zero tokens at the END have row_tok_start == n; they
        # contribute nothing via repeat(counts=0) but must not index OOB
        rts_safe = np.minimum(row_tok_start, max(n - 1, 0))
        base = np.repeat(csum[rts_safe] - keep[rts_safe], counts) if n else np.zeros(0, np.int64)
        srank = csum - base  # 1-based survivor rank within row (on survivors)
        survivors_per_row = np.zeros(len(texts), dtype=np.int64)
        if n:
            np.add.at(survivors_per_row, row_idx, keep)
        # first survivor's pre-filter position per row, scattered back
        p_first = np.zeros(len(texts), dtype=np.int64)
        first_mask = keep & (srank == 1)
        p_first[row_idx[first_mask]] = pre_pos[first_mask]
        pos_final = np.repeat(p_first, counts) + srank - 1

        # filtered posting stream
        r_f = row_idx[keep]
        c_f = codes[keep]
        p_f = pos_final[keep]

        # per-(row, term) aggregation via stable sort on the composite key
        key = r_f * nu + c_f
        order = np.argsort(key, kind="stable")  # stable: positions stay ascending
        ks = key[order]
        gstart = np.flatnonzero(np.r_[True, ks[1:] != ks[:-1]]) if ks.size else np.empty(0, np.int64)
        gcount = np.diff(np.r_[gstart, ks.size])
        g_row = r_f[order][gstart] if ks.size else np.empty(0, np.int64)
        g_code = c_f[order][gstart] if ks.size else np.empty(0, np.int64)
        g_doc = docnums[g_row]

        # shard per unique term (salted hot terms shard by docnum range)
        R = self.num_shards
        u_list = uniques.to_pylist()
        u_shard = np.fromiter(
            (_shard_of(fname, t, R) for t in u_list), dtype=np.int32, count=nu
        )
        shard = u_shard[g_code] if ks.size else np.empty(0, np.int32)
        if self.salted:
            doc_lo, doc_n = self.doc_range
            u_index = {t: i for i, t in enumerate(u_list)}
            for (f, t), n_salts in self.salted.items():
                if f != fname or t not in u_index:
                    continue
                m = g_code == u_index[t]
                salt = (g_doc[m] - doc_lo) * n_salts // max(doc_n, 1)
                shard[m] = np.fromiter(
                    (_salted_shard_of(fname, t, int(s), R) for s in salt),
                    dtype=np.int32,
                    count=int(m.sum()),
                )

        lb_rows = lengths_to_bytes(survivors_per_row) if scorable else np.zeros(len(texts), np.uint8)
        g_lb = lb_rows[g_row]

        # positions column: per-posting varint(count)+delta stream
        if keep_pos and ks.size:
            p_s = p_f[order].astype(np.uint64)
            deltas = np.empty_like(p_s)
            if p_s.size:
                deltas[0] = p_s[0]
                np.subtract(p_s[1:], p_s[:-1], out=deltas[1:])
                deltas[gstart] = p_s[gstart]
            ng = len(gstart)
            # interleave count + deltas: count of group g sits at gstart[g]+g
            cpos = gstart + np.arange(ng)
            comb = np.empty(ng + p_s.size, dtype=np.uint64)
            comb[cpos] = gcount.astype(np.uint64)
            mask = np.ones(comb.size, dtype=bool)
            mask[cpos] = False
            comb[mask] = deltas
            buf, off = encode_varints_with_offsets(comb)
            bounds = off[np.append(cpos, comb.size)]
            pos_col = binary_array_from_offsets(buf, bounds, large=False)
        else:
            pos_col = pa.nulls(len(gstart), pa.binary())

        out["field"].append(pa.array(np.full(len(gstart), fname, dtype=object), pa.string()))
        out["term"].append(
            uniques.take(pa.array(g_code, pa.int64())) if ks.size else pa.array([], pa.string())
        )
        out["docnum"].append(pa.array(g_doc.astype(np.uint64), pa.uint64()))
        w = np.ones_like(gcount, dtype=np.float64) if unit_weight else gcount * boost
        rb = self._row_boosts(fname, batch)
        if not unit_weight and rb is not None and ks.size:
            w = w * rb[g_row]
        out["weight"].append(pa.array(w.astype(np.float32), pa.float32()))
        out["positions"].append(pos_col)
        out["chars"].append(pa.nulls(len(gstart), pa.binary()))
        out["boosts"].append(pa.nulls(len(gstart), pa.binary()))
        out["payload"].append(pa.nulls(len(gstart), pa.binary()))
        out["len_byte"].append(pa.array(g_lb, pa.uint8()))
        out["shard"].append(pa.array(shard, pa.int32()))

        if scorable:
            # sentinel doc-length rows for every non-null row
            v = np.flatnonzero(valid)
            out["field"].append(pa.array(np.full(v.size, fname, dtype=object), pa.string()))
            # NB: np.full(n, "\x00") silently yields "" (C-string fill)
            out["term"].append(pa.array([LEN_SENTINEL] * v.size, pa.string()))
            out["docnum"].append(pa.array(docnums[v].astype(np.uint64), pa.uint64()))
            out["weight"].append(pa.array(survivors_per_row[v].astype(np.float32), pa.float32()))
            out["positions"].append(pa.nulls(v.size, pa.binary()))
            out["chars"].append(pa.nulls(v.size, pa.binary()))
            out["boosts"].append(pa.nulls(v.size, pa.binary()))
            out["payload"].append(pa.nulls(v.size, pa.binary()))
            out["len_byte"].append(pa.array(lb_rows[v], pa.uint8()))
            out["shard"].append(pa.array((docnums[v] % R).astype(np.int32), pa.int32()))

    def _vector_id_field(self, fname, aspec, keep_pos, boost, batch, docnums, out):
        """Vectorized IDTokenizer: whole value = one token at pos 1
        (reference analysis/tokenizers.py:44-76); null/empty values emit
        nothing (non-scorable fields only)."""
        col = batch[fname]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        arr = col
        if aspec.lowercase:
            arr = pc.utf8_lower(arr)
        ok = pc.and_(pc.is_valid(arr), pc.not_equal(arr, "")).to_numpy(zero_copy_only=False)
        idx = np.flatnonzero(ok)
        terms = arr.take(pa.array(idx, pa.int64()))
        R = self.num_shards
        # shard per UNIQUE value (id columns are low-cardinality: conv ids,
        # roles, tools — one crc per distinct value, not per row)
        denc = pc.dictionary_encode(terms)
        u_shard = np.fromiter(
            (_shard_of(fname, t, R) for t in denc.dictionary.to_pylist()),
            dtype=np.int32,
            count=len(denc.dictionary),
        )
        codes = denc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        shard = u_shard[codes] if len(idx) else np.empty(0, np.int32)
        if self.salted and len(idx):
            # id values (roles, tools) are exactly the hottest terms — apply
            # the same docnum-range salt routing as _vector_field, else the
            # manifest records the term as salted while its postings sit in
            # the base shard and _shards_for never finds them
            doc_lo, doc_n = self.doc_range
            u_index = {t: i for i, t in enumerate(denc.dictionary.to_pylist())}
            g_doc = docnums[idx]
            for (f, t), n_salts in self.salted.items():
                if f != fname or t not in u_index:
                    continue
                m = codes == u_index[t]
                salt = (g_doc[m].astype(np.int64) - doc_lo) * n_salts // max(doc_n, 1)
                shard[m] = np.fromiter(
                    (_salted_shard_of(fname, t, int(s), R) for s in salt),
                    dtype=np.int32,
                    count=int(m.sum()),
                )
        out["field"].append(pa.array(np.full(idx.size, fname, dtype=object), pa.string()))
        out["term"].append(terms)
        out["docnum"].append(pa.array(docnums[idx].astype(np.uint64), pa.uint64()))
        w_id = np.full(idx.size, boost, dtype=np.float64)
        rb = self._row_boosts(fname, batch)
        if rb is not None and idx.size:
            w_id *= rb[idx]
        out["weight"].append(pa.array(w_id.astype(np.float32), pa.float32()))
        if keep_pos:
            # every id posting is one token at position 1: stream = [1, 1]
            out["positions"].append(
                pa.array([b"\x01\x01"] * idx.size, pa.binary())
            )
        else:
            out["positions"].append(pa.nulls(idx.size, pa.binary()))
        out["chars"].append(pa.nulls(idx.size, pa.binary()))
        out["boosts"].append(pa.nulls(idx.size, pa.binary()))
        out["payload"].append(pa.nulls(idx.size, pa.binary()))
        out["len_byte"].append(pa.array(np.zeros(idx.size, dtype=np.uint8), pa.uint8()))
        out["shard"].append(pa.array(shard, pa.int32()))

    def __call__(self, batch: pa.Table) -> pa.Table:
        docnums = batch["docnum"].to_numpy(zero_copy_only=False)
        out = {
            k: []
            for k in (
                "field", "term", "docnum", "weight", "positions", "chars",
                "boosts", "payload", "len_byte", "shard",
            )
        }
        for i, spec_tuple in enumerate(self.specs):
            fname, aspec, scorable, keep_pos, boost = spec_tuple
            if fname not in batch.column_names:
                continue
            if fname in self.custom_formats:
                # custom Format codec: arbitrary Python encode -> loop path
                self._loop_field(self.analyzers[i], batch, docnums, out)
            elif fname in self.chars_fields and aspec is not None and aspec.kind in (
                "standard", "simple", "stemming",
            ) and (not aspec.post_filters or self._delim_kw(aspec) is not None):
                self._chars_field(fname, spec_tuple, batch, docnums, out)
            elif (
                aspec is not None
                and aspec.kind in ("standard", "simple")
                and aspec.renumber
                and not aspec.gaps  # gap-split mode takes the loop path
                and not aspec.charmap  # charset folding too
                and not aspec.post_filters  # trailing filters too
            ):
                self._vector_field(fname, spec_tuple, batch, docnums, out)
            elif aspec is not None and aspec.kind == "id" and not scorable:
                self._vector_id_field(fname, aspec, keep_pos, boost, batch, docnums, out)
            else:
                self._loop_field(self.analyzers[i], batch, docnums, out)
        for spell_name, src, aspec in self.spell_specs:
            if src not in batch.column_names:
                continue
            shim = pa.table({spell_name: batch[src]})
            self._vector_field(
                spell_name,
                (spell_name, aspec, False, False, 1.0),
                shim,
                docnums,
                out,
                unit_weight=True,
            )
        cols = []
        for name in POSTING_SCHEMA.names:
            chunks = out[name]
            if chunks:
                cols.append(pa.chunked_array(chunks).combine_chunks())
            else:
                cols.append(pa.array([], type=POSTING_SCHEMA.field(name).type))
        tbl = pa.Table.from_arrays(cols, schema=POSTING_SCHEMA)
        return pack_postings(tbl) if self.pack else tbl

    def _chars_field(self, fname, spec_tuple, batch, docnums, out):
        """Loop path for chars-enabled fields (reference Characters format,
        formats.py:344-409): finditer keeps each surviving token's raw
        (startchar, endchar) span alongside the renumbered position; the
        per-posting chars payload is the varint stream
        [count, s1, e1-s1, s2-e1, e2-s2, ...]."""
        _, aspec, scorable, keep_pos, boost = spec_tuple
        pat = self._vec_pats.setdefault(
            fname, _re.compile(aspec.pattern, _re.UNICODE)
        )
        stops, minsize, maxsize = aspec.stopwords, aspec.minsize, aspec.maxsize
        renumber = aspec.renumber
        lower = aspec.lowercase
        stem = None
        if aspec.kind == "stemming":
            # indexed term is the stem; the span still covers the RAW token
            # (whoosh records t.startchar/endchar before StemFilter mutates
            # t.text) — exactly what payload highlighting needs
            from ..functions.analysis import resolve_stemmer

            stem = resolve_stemmer(aspec)
        from ..functions.analysis import charmap_table

        cmap = charmap_table(aspec.charmap) if aspec.charmap else None
        # CharacterBoosts mode: a trailing delimited_attribute filter
        # supplies per-token boosts; the span is trimmed to exclude the
        # delimiter + payload, like the reference (filters.py:473-477)
        dk = self._delim_kw(aspec)
        delim = dk.get("delimiter", "^") if dk is not None else None
        ddefault = dk.get("default", 1.0) if dk is not None else 1.0
        from ..functions.analysis import resolve_delim_typ

        dtyp = resolve_delim_typ(dk.get("typ", float)) if dk is not None else float
        want_boosts = fname in self.boosts_fields
        R = self.num_shards
        salted = self.salted
        doc_lo, doc_n = self.doc_range

        fields_out, terms_out, docs_out = [], [], []
        weights_out, pos_out, chars_out, boosts_out, lens_out, shard_out = (
            [], [], [], [], [], []
        )
        rb = self._row_boosts(fname, batch)
        for i, text in enumerate(batch[fname].to_pylist()):
            if text is None:
                continue
            docnum = int(docnums[i])
            # tokenize with spans, lower, stop+renumber (whoosh rule: first
            # survivor keeps its raw index, later survivors go consecutive)
            surv = []
            pos = None
            for idx, m in enumerate(pat.finditer(text)):
                t = m.group(0)
                end = m.end()
                tb = ddefault
                if delim is not None and (di := t.find(delim)) >= 0:
                    tb = dtyp(t[di + len(delim):])
                    end -= len(t) - di
                    t = t[:di]
                if lower:
                    t = t.lower()
                if cmap is not None:
                    t = t.translate(cmap)
                lt = len(t)
                if (
                    lt >= minsize
                    and (maxsize is None or lt <= maxsize)
                    and (stops is None or t not in stops)
                ):
                    if stem is not None:
                        t = stem(t)
                    if renumber:
                        pos = idx if pos is None else pos + 1
                        surv.append((t, pos, m.start(), end, tb))
                    else:
                        surv.append((t, idx, m.start(), end, tb))
            if not surv and not scorable:
                continue
            agg: dict = {}
            eff_boost = boost if rb is None else boost * rb[i]
            for t, p, s, e, tb in surv:
                entry = agg.get(t)
                if entry is None:
                    agg[t] = entry = [0.0, [], [], []]
                entry[0] += eff_boost * tb
                entry[1].append(p)
                entry[2].append((s, e))
                entry[3].append(tb)
            length = len(surv)
            lb = length_to_byte(length) if scorable else 0
            for term, (w, poss, spans, tboosts) in agg.items():
                fields_out.append(fname)
                terms_out.append(term)
                docs_out.append(docnum)
                weights_out.append(w)
                if keep_pos:
                    pp = np.asarray(poss, dtype=np.uint64)
                    stream = np.empty(pp.size + 1, dtype=np.uint64)
                    stream[0] = pp.size
                    if pp.size:
                        stream[1] = pp[0]
                        np.subtract(pp[1:], pp[:-1], out=stream[2:])
                    pos_out.append(encode_varints(stream))
                else:
                    pos_out.append(None)
                cstream = np.empty(2 * len(spans) + 1, dtype=np.uint64)
                cstream[0] = len(spans)
                prev = 0
                for k, (s, e) in enumerate(spans):
                    cstream[1 + 2 * k] = s - prev
                    cstream[2 + 2 * k] = e - s
                    prev = e
                chars_out.append(encode_varints(cstream))
                boosts_out.append(self._encode_boosts(tboosts) if want_boosts else None)
                lens_out.append(lb)
                n_salts = salted.get((fname, term))
                if n_salts:
                    salt = (docnum - doc_lo) * n_salts // max(doc_n, 1)
                    shard_out.append(_salted_shard_of(fname, term, salt, R))
                else:
                    shard_out.append(_shard_of(fname, term, R))
            if scorable:
                fields_out.append(fname)
                terms_out.append(LEN_SENTINEL)
                docs_out.append(docnum)
                weights_out.append(float(length))
                pos_out.append(None)
                chars_out.append(None)
                boosts_out.append(None)
                lens_out.append(lb)
                shard_out.append(docnum % R)

        out["field"].append(pa.array(fields_out, type=pa.string()))
        out["term"].append(pa.array(terms_out, type=pa.string()))
        out["docnum"].append(pa.array(docs_out, type=pa.uint64()))
        out["weight"].append(pa.array(weights_out, type=pa.float32()))
        out["positions"].append(pa.array(pos_out, type=pa.binary()))
        out["chars"].append(pa.array(chars_out, type=pa.binary()))
        out["boosts"].append(pa.array(boosts_out, type=pa.binary()))
        out["payload"].append(pa.nulls(len(fields_out), pa.binary()))
        out["len_byte"].append(pa.array(lens_out, type=pa.uint8()))
        out["shard"].append(pa.array(shard_out, type=pa.int32()))

    def _loop_field(self, analyzer_tuple, batch, docnums, out):
        """Row-at-a-time fallback for stateful/exotic analyzers (stemming,
        ngram, id, keyword)."""
        R = self.num_shards
        salted = self.salted
        doc_lo, doc_n = self.doc_range
        fields_out, terms_out, docs_out = [], [], []
        weights_out, pos_out, boosts_out, lens_out, shard_out = [], [], [], [], []
        payload_out: list = []

        for fname, analyze, scorable, keep_pos, boost in [analyzer_tuple]:
            want_boosts = fname in self.boosts_fields
            fmt = self.custom_formats.get(fname)
            col = batch[fname].to_pylist()
            rb = self._row_boosts(fname, batch)
            for i, text in enumerate(col):
                if text is None:
                    continue
                toks = analyze(text)
                if not toks and not scorable:
                    continue
                docnum = int(docnums[i])
                eff_boost = boost if rb is None else boost * rb[i]
                # aggregate per (doc, term): weight = sum of boosts,
                # positions = renumbered post-filter positions; a
                # delimited_attribute filter yields (term, pos, boost)
                # 3-tuples (reference PositionBoosts word_values,
                # formats.py:352-366: weight = summed token boost)
                agg: dict = {}
                for tok in toks:
                    term, pos = tok[0], tok[1]
                    tb = tok[2] if len(tok) > 2 else 1.0
                    e = agg.get(term)
                    if e is None:
                        agg[term] = e = [0.0, [], []]
                    e[0] += eff_boost * tb
                    e[1].append(pos)
                    e[2].append(tb)
                length = len(toks)
                lb = length_to_byte(length) if scorable else 0
                for term, (w, poss, tboosts) in agg.items():
                    fields_out.append(fname)
                    terms_out.append(term)
                    docs_out.append(docnum)
                    if fmt is not None:
                        # custom Format: the codec owns weight + payload
                        # (reference word_values, formats.py:84-135); the
                        # payload is varint-length-framed so per-posting
                        # boundaries survive block concatenation
                        from ..formats import Occurrence, _write_varint

                        occs = [
                            Occurrence(int(p), None, None, float(tb))
                            for p, tb in zip(poss, tboosts)
                        ]
                        weights_out.append(fmt.weight(occs) * eff_boost)
                        pl = fmt.encode(occs)
                        if pl is None:
                            payload_out.append(None)
                        else:
                            framed = bytearray()
                            _write_varint(framed, len(pl))
                            framed += pl
                            payload_out.append(bytes(framed))
                    else:
                        weights_out.append(w)
                        payload_out.append(None)
                    if keep_pos:
                        pp = np.asarray(poss, dtype=np.uint64)
                        stream = np.empty(pp.size + 1, dtype=np.uint64)
                        stream[0] = pp.size
                        if pp.size:
                            stream[1] = pp[0]
                            np.subtract(pp[1:], pp[:-1], out=stream[2:])
                        pos_out.append(encode_varints(stream))
                    else:
                        pos_out.append(None)
                    boosts_out.append(
                        self._encode_boosts(tboosts) if want_boosts else None
                    )
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
                    boosts_out.append(None)
                    payload_out.append(None)
                    lens_out.append(lb)
                    shard_out.append(docnum % R)

        out["field"].append(pa.array(fields_out, type=pa.string()))
        out["term"].append(pa.array(terms_out, type=pa.string()))
        out["docnum"].append(pa.array(docs_out, type=pa.uint64()))
        out["weight"].append(pa.array(weights_out, type=pa.float32()))
        out["positions"].append(pa.array(pos_out, type=pa.binary()))
        out["chars"].append(pa.nulls(len(fields_out), pa.binary()))
        out["boosts"].append(pa.array(boosts_out, type=pa.binary()))
        out["payload"].append(pa.array(payload_out, type=pa.binary()))
        out["len_byte"].append(pa.array(lens_out, type=pa.uint8()))
        out["shard"].append(pa.array(shard_out, type=pa.int32()))
