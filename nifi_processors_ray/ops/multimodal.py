"""Multimodal (binary media) column plumbing.

Media payloads are opaque ``binary`` columns with typed metadata —
exactly the reference's FlowFile model (opaque ``byte[]`` content +
typed attributes, ``consumer/GetKinesisStream.java:256-262``), kept
here where it genuinely belongs instead of being replaced by typed
columns as the transcript path does.

Pipeline shape (the part that must be right at 100 TB):

- :func:`attach_media` — a stateless stage that frames each document's
  bytes with a small typed header (magic, width, height, n_frames).
  In production this column comes straight from the source; here it is
  synthesized deterministically from the documents table.
- :class:`MediaFeatureExtractor` — an ACTOR-POOL ``map_batches`` stage:
  the "decoder" is loaded once per actor in ``__init__`` (the
  model-load slot), batches are decoded in ``__call__``.  Real codec
  libraries (PIL/ffmpeg) are not in this environment, so ``_decode``
  is a clearly-marked deterministic stub behind a try-import; the Ray
  plumbing — binary schema, small ``batch_size`` for large payloads,
  actor signature, typed output — is real and tested.
"""

from __future__ import annotations

import hashlib
import struct

import numpy as np
import pyarrow as pa
import ray.data

from ..sources.reader import read_parquet_fanout as read_parquet_clean

MEDIA_MAGIC = b"NPRM"
_HEADER = struct.Struct(">4sHHB")  # magic, width, height, n_frames
HEADER_LEN = _HEADER.size  # 9 bytes

# SQL twin of the synthesized header fields + payload length (the
# documents table is pure ASCII, so octet_length(text) == n_chars).
MEDIA_FEATURES_SQL = f"""
SELECT doc_id,
       n_chars + {HEADER_LEN} AS n_bytes,
       CAST((n_chars * 7) % 1024 + 16 AS BIGINT) AS width,
       CAST((n_chars * 3) % 768 + 16 AS BIGINT) AS height,
       CAST(doc_id % 24 + 1 AS BIGINT) AS n_frames
FROM documents
ORDER BY doc_id
"""


def attach_media(batch: pa.Table) -> pa.Table:
    """documents → (doc_id, media: binary).  Deterministic synthesis.

    Fully vectorized numpy byte assembly (no per-row pack/encode): the
    output binary column is built directly from an offsets array and one
    flat data buffer — headers scattered, text bytes gathered — so the
    fixture-synthesis stage prices like a memcpy, not a Python loop."""
    import pyarrow.compute as pc

    n = batch.num_rows
    if n == 0:
        return pa.table(
            {"doc_id": pa.array([], pa.int64()), "media": pa.array([], pa.binary())}
        )
    ids = np.asarray(batch.column("doc_id"), dtype=np.int64)
    nchars = np.asarray(batch.column("n_chars"), dtype=np.int64)
    bin_arr = pc.cast(
        pc.fill_null(batch.column("text"), ""), pa.binary()
    ).combine_chunks()
    raw_offs = np.frombuffer(bin_arr.buffers()[1], dtype=np.int32)
    offs = raw_offs[bin_arr.offset : bin_arr.offset + n + 1].astype(np.int64)
    data_buf = bin_arr.buffers()[2]  # None when every text is empty
    data = (
        np.frombuffer(data_buf, dtype=np.uint8)
        if data_buf is not None
        else np.empty(0, dtype=np.uint8)
    )
    tlen = offs[1:] - offs[:-1]
    out_offs = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(tlen + HEADER_LEN, out=out_offs[1:])
    if out_offs[-1] >= 2**31:  # binary() offsets are int32 — a silent
        # .astype truncation would build a structurally invalid array
        raise OverflowError(
            f"media payload batch is {int(out_offs[-1])} bytes — exceeds the "
            "2 GiB binary-offset limit; lower the batch size"
        )
    buf = np.empty(int(out_offs[-1]), dtype=np.uint8)
    # headers: (n, 9) block scattered to each row's start (big-endian,
    # byte-identical to _HEADER.pack)
    w = (nchars * 7) % 1024 + 16
    h = (nchars * 3) % 768 + 16
    hdr = np.empty((n, HEADER_LEN), dtype=np.uint8)
    hdr[:, 0:4] = np.frombuffer(MEDIA_MAGIC, dtype=np.uint8)
    hdr[:, 4] = (w >> 8) & 0xFF
    hdr[:, 5] = w & 0xFF
    hdr[:, 6] = (h >> 8) & 0xFF
    hdr[:, 7] = h & 0xFF
    hdr[:, 8] = (ids % 24 + 1) & 0xFF
    buf[(out_offs[:-1, None] + np.arange(HEADER_LEN)).ravel()] = hdr.ravel()
    # text payloads: one flat gather src→dst
    total_text = int(tlen.sum())
    if total_text:
        row = np.repeat(np.arange(n), tlen)
        within = np.arange(total_text) - np.repeat(np.cumsum(tlen) - tlen, tlen)
        buf[out_offs[:-1][row] + HEADER_LEN + within] = data[offs[:-1][row] + within]
    media = pa.Array.from_buffers(
        pa.binary(),
        n,
        [
            None,
            pa.py_buffer(out_offs.astype(np.int32).tobytes()),
            pa.py_buffer(buf.tobytes()),
        ],
    )
    return pa.table({"doc_id": batch.column("doc_id"), "media": media})


class MediaFeatureExtractor:
    """Callable-class actor: decoder loaded once per actor, used per batch.

    ``digest=True`` additionally emits a per-payload sha1 prefix for
    lineage/debugging — inherently scalar work (one hash per payload),
    so the feature path leaves it off and stays fully vectorized.
    """

    def __init__(self, digest: bool = False) -> None:
        # The model-load / codec-init slot: once per actor, NOT per batch.
        self.digest = digest
        try:  # real decoders are absent in this environment
            import PIL.Image  # noqa: F401  # pragma: no cover

            self._codec = "pillow"
        except ImportError:
            self._codec = "stub"

    def _decode(self, payload: bytes) -> tuple[int, int, int]:
        """Parse one typed header → (width, height, n_frames).

        With a real codec installed this is where pixel decode would
        happen; the stub path only reads the header (deterministic) and
        raises on payloads that aren't ours rather than guessing.
        """
        if payload[:4] != MEDIA_MAGIC:
            if self._codec == "stub":
                raise NotImplementedError(
                    "real media decode requires an image/video codec library "
                    "not present in this environment"
                )
            raise ValueError("unknown media container")  # pragma: no cover
        _, width, height, n_frames = _HEADER.unpack(payload[:HEADER_LEN])
        return width, height, n_frames

    def __call__(self, batch: pa.Table) -> pa.Table:
        media = batch.column("media").combine_chunks()
        n = len(media)
        n_bytes = np.asarray(pa.compute.binary_length(media), dtype=np.int64)
        # Vectorized header parse straight off the Arrow binary buffers:
        # one flat uint8 view + per-payload offsets, big-endian fields
        # assembled with fancy indexing — no per-payload Python on the
        # feature path.
        off, buf = _validated_header_offsets(media)
        # gather ONLY the header bytes before widening: widening the whole
        # payload buffer to int64 would transiently allocate 8× the batch's
        # media bytes — fatal at real payload sizes
        hdr = buf[off[:, None] + np.arange(4, HEADER_LEN)].astype(np.int64)
        width = (hdr[:, 0] << 8) | hdr[:, 1]
        height = (hdr[:, 2] << 8) | hdr[:, 3]
        n_frames = hdr[:, 4]
        cols = {
            "doc_id": batch.column("doc_id"),
            "n_bytes": pa.array(n_bytes),
            "width": pa.array(width),
            "height": pa.array(height),
            "n_frames": pa.array(n_frames),
        }
        if self.digest:  # lineage/debug path: per-payload hash is scalar by nature
            cols["sha1_16"] = pa.array(
                [hashlib.sha1(p).hexdigest()[:16] for p in media.to_pylist()], pa.string()
            )
        return pa.table(cols)


def _validated_header_offsets(media: pa.Array) -> tuple[np.ndarray, np.ndarray]:
    """Per-payload start offsets (int64) + flat uint8 view, VALIDATED:
    every payload is ≥ HEADER_LEN bytes and starts with the NPRM magic
    (raises NotImplementedError otherwise — a short/foreign payload
    would otherwise silently read the NEXT payload's bytes).  Handles
    both binary (int32 offsets) and large_binary (int64 offsets); the
    raw buffer read honors any slice offset (BinaryArray exposes no
    .offsets accessor).
    """
    if pa.types.is_large_binary(media.type):
        odt = np.int64
    elif pa.types.is_binary(media.type):
        odt = np.int32
    else:
        raise TypeError(f"media column must be binary/large_binary, got {media.type}")
    n = len(media)
    offsets = np.frombuffer(media.buffers()[1], dtype=odt)[
        media.offset : media.offset + n + 1
    ].astype(np.int64)
    buf = np.frombuffer(media.buffers()[2], dtype=np.uint8)
    off = offsets[:-1]
    if n and (
        (np.diff(offsets) < HEADER_LEN).any()
        or not (buf[off[:, None] + np.arange(4)] == np.frombuffer(MEDIA_MAGIC, np.uint8)).all()
    ):
        raise NotImplementedError(
            "non-NPRM payload: real media decode requires a codec library "
            "not present in this environment"
        )
    return off, buf


FRAME_STRIDE = 4

# SQL twin: explode each doc's synthesized frame count (doc_id % 24 + 1,
# the attach_media header rule) into every FRAME_STRIDE-th frame index.
MEDIA_FRAME_SAMPLE_SQL = f"""
SELECT doc_id,
       unnest(generate_series(0, CAST(doc_id % 24 AS BIGINT), {FRAME_STRIDE})) AS frame_idx,
       CAST(doc_id % 24 + 1 AS BIGINT) AS n_frames
FROM documents
ORDER BY doc_id, frame_idx
"""


def _sample_frames(batch: pa.Table, stride: int) -> pa.Table:
    """Explode each media payload into every ``stride``-th frame row.

    The fan-out (one input row → ceil(n_frames/stride) output rows) is
    fully vectorized: np.repeat for the doc axis, arange arithmetic for
    the frame axis — the flat_map pattern without per-row Python.  A
    real decoder would slice the frame bytes here; the deterministic
    stub keeps the Ray plumbing (explode shape, small batches for big
    payloads, downstream schema) real and SQL-verified.
    """
    media = batch.column("media").combine_chunks()
    # header decode straight off the Arrow buffers (as_py() would copy the
    # WHOLE payload per row just to slice 9 bytes — O(total media bytes)
    # of Python-object churn on the path documented for big payloads);
    # offsets are validated (length + magic) like the feature extractor's
    off, buf = _validated_header_offsets(media)
    n_frames = buf[off + (HEADER_LEN - 1)].astype(np.int64) if len(media) else np.zeros(0, np.int64)
    n_out = (n_frames + stride - 1) // stride
    doc_rep = np.repeat(np.asarray(batch.column("doc_id")), n_out)
    starts = np.concatenate([[0], np.cumsum(n_out)])
    frame_idx = (np.arange(int(starts[-1])) - starts[:-1][np.repeat(np.arange(len(n_out)), n_out)]) * stride
    return pa.table(
        {
            "doc_id": pa.array(doc_rep),
            "frame_idx": pa.array(frame_idx.astype(np.int64)),
            "n_frames": pa.array(np.repeat(n_frames, n_out)),
        }
    )


def media_frame_sample(sf_dir: str, *, stride: int = FRAME_STRIDE, batch_size: int = 256, sort: bool = True) -> ray.data.Dataset:
    """Every ``stride``-th frame of each media payload — the frame-sample
    plumbing stage of a video pipeline (decode stubbed; explode real)."""
    ds = read_parquet_clean(
        f"{sf_dir.rstrip('/')}/documents.parquet", columns=["doc_id", "text", "n_chars"]
    )
    ds = ds.map_batches(attach_media, batch_format="pyarrow")
    ds = ds.map_batches(
        _sample_frames, batch_format="pyarrow", batch_size=batch_size, fn_kwargs={"stride": stride}
    )
    return ds.sort(["doc_id", "frame_idx"]) if sort else ds


def media_features(
    sf_dir: str, *, concurrency: int = 4, batch_size: int = 256
) -> ray.data.Dataset:
    """documents → synthesized media column → actor-pool feature extract.

    ``batch_size`` is deliberately small: with real image/video payloads
    a batch × concurrency must fit in worker heap — the knob is part of
    the contract even though the stub payloads are tiny.
    """
    import ray as _ray

    ds = read_parquet_clean(
        f"{sf_dir.rstrip('/')}/documents.parquet", columns=["doc_id", "text", "n_chars"]
    )
    ds = ds.map_batches(attach_media, batch_format="pyarrow")
    # Autoscaling pool (1..N), with N capped BELOW the cluster's CPU count:
    # a fixed pool equal to the whole cluster pins every slot to actors and
    # starves the upstream read/attach tasks — the streaming executor
    # deadlocks (observed on a 4-CPU test session with concurrency=4).
    try:
        cpus = int(_ray.cluster_resources().get("CPU", 8))
    except Exception:
        cpus = 8
    ds = ds.map_batches(
        MediaFeatureExtractor,
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=(1, max(1, min(concurrency, cpus - 1))),
    )
    # sha1_16 is for lineage/debugging; the SQL twin can't compute it,
    # so the driver-facing result carries only the header features.
    return ds.select_columns(["doc_id", "n_bytes", "width", "height", "n_frames"]).sort(
        "doc_id"
    )
