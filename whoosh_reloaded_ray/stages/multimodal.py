"""Multimodal column stages: opaque binary payloads + actor-pool decoders.

Real multimodal corpora carry image/audio/video as opaque ``binary``
columns with typed metadata.  The image/audio libraries are NOT in this
container, so the decode kernels are STUBS — ``_decode_image_real`` raises
``NotImplementedError`` unless PIL is importable, and the deterministic
fake below stands in — but the Ray-side plumbing is real and tested:

  * payloads are a ``large_binary`` column (here derived deterministically
    from ``text`` so the sandbox tables can exercise the path);
  * decoders are CALLABLE CLASSES run via ``map_batches(Cls,
    concurrency=N, batch_size=B)`` — codec setup happens once per actor in
    ``__init__``, per-batch work in ``__call__``;
  * batch_size stays SMALL for binary payloads (a batch x concurrency of
    multi-MB blobs must fit each worker's heap — at 100 TB the payload
    column dominates block size, so ``target_max_block_size`` and
    ``batch_size`` are sized to the payload, not the row count).
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa

FRAME_BYTES = 256  # fake "video" frame granularity
FRAME_SAMPLE_EVERY = 4


def attach_payload(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Derive the deterministic fake binary payload column (utf-8 bytes of
    the text).  A real pipeline reads this column straight from parquet."""
    payload = pa.array(
        [t.encode("utf-8") if t is not None else None for t in batch[text_col].to_pylist()],
        type=pa.large_binary(),
    )
    return batch.append_column("payload", payload)


def _decode_image_real(blob: bytes):
    """Real image decode — STUB: the imaging libraries are not available in
    this environment."""
    try:
        from PIL import Image  # noqa: F401
    except ImportError as e:
        raise NotImplementedError(
            "image decoding requires PIL/pillow, which is not available in "
            "this container; use FakeImageDecoder for the plumbing path"
        ) from e
    raise NotImplementedError("wire PIL decode here when the library exists")


class FakeImageDecoder:
    """Actor-pool decode stage: payload -> (n_bytes, width, height, channels).

    Deterministic fake (first-byte/length arithmetic) so outputs are
    SQL-checkable; the actor shape (init-once state, per-batch vectorized
    work, small batch_size) is exactly what a real decoder uses."""

    def __init__(self):
        # stands in for loading a codec / model checkpoint once per actor
        self.channels = 3

    def __call__(self, batch: pa.Table) -> pa.Table:
        blobs = batch["payload"].to_pylist()
        n_bytes = np.array([len(b) if b else 0 for b in blobs], dtype=np.int64)
        first = np.array([b[0] if b else 0 for b in blobs], dtype=np.int64)
        width = first % 64 + 1
        height = n_bytes % 64 + 1
        out = {name: batch[name] for name in batch.column_names if name != "payload"}
        out.update(
            {
                "n_bytes": pa.array(n_bytes),
                "width": pa.array(width),
                "height": pa.array(height),
                "channels": pa.array(np.full(len(blobs), self.channels, dtype=np.int64)),
            }
        )
        return pa.table(out)


class FrameSampler:
    """Actor-pool "video" stage: split payload into FRAME_BYTES frames and
    keep every FRAME_SAMPLE_EVERY-th — the frame-sampling access pattern of
    a video pipeline, over fake frames."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        blobs = batch["payload"].to_pylist()
        n_bytes = np.array([len(b) if b else 0 for b in blobs], dtype=np.int64)
        n_frames = -(-n_bytes // FRAME_BYTES)  # ceil
        n_sampled = -(-n_frames // FRAME_SAMPLE_EVERY)
        out = {name: batch[name] for name in batch.column_names if name != "payload"}
        out.update(
            {
                "n_frames": pa.array(n_frames),
                "n_sampled": pa.array(n_sampled),
            }
        )
        return pa.table(out)


def decode_image_meta(sf_dir: str) -> pa.Table:
    """Gate query: attach payloads to documents, run the actor-pool decoder,
    return per-doc metadata."""
    import ray.data

    from .._rayutil import ensure_serializable

    ensure_serializable()
    ds = ray.data.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
    )
    ds = ds.map_batches(attach_payload, batch_format="pyarrow")
    ds = ds.drop_columns(["text"])
    ds = ds.map_batches(
        FakeImageDecoder, concurrency=2, batch_size=128, batch_format="pyarrow"
    )
    t = pa.concat_tables(ds.iter_batches(batch_format="pyarrow", batch_size=None))
    return t.sort_by("doc_id")


def oracle_decode_image_meta() -> str:
    return """
SELECT doc_id,
       octet_length(encode(text))::BIGINT AS n_bytes,
       (ascii(text) % 64 + 1)::BIGINT AS width,
       (octet_length(encode(text)) % 64 + 1)::BIGINT AS height,
       3::BIGINT AS channels
FROM documents ORDER BY doc_id
"""


def frame_sample_meta(sf_dir: str) -> pa.Table:
    import ray.data

    from .._rayutil import ensure_serializable

    ensure_serializable()
    ds = ray.data.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
    )
    ds = ds.map_batches(attach_payload, batch_format="pyarrow").drop_columns(["text"])
    ds = ds.map_batches(
        FrameSampler, concurrency=2, batch_size=128, batch_format="pyarrow"
    )
    t = pa.concat_tables(ds.iter_batches(batch_format="pyarrow", batch_size=None))
    return t.sort_by("doc_id")


def oracle_frame_sample_meta() -> str:
    return f"""
SELECT doc_id,
       CEIL(octet_length(encode(text)) / {FRAME_BYTES}.0)::BIGINT AS n_frames,
       CEIL(CEIL(octet_length(encode(text)) / {FRAME_BYTES}.0)
            / {FRAME_SAMPLE_EVERY}.0)::BIGINT AS n_sampled
FROM documents ORDER BY doc_id
"""
