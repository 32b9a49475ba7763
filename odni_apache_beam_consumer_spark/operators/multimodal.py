"""Multimodal column operators: decode / feature-extract / resize /
frame-sample / audio-segment over binary payloads.

Reference parity: the reference moves opaque bytes (Kafka value: binary,
/root/reference/main.py:85-108) without ever decoding them; this module
is that binary-column convention carried into a typed decode surface.

Convention (SURVEY.md §2.2 LLM-pipeline row): media travels as an opaque
``binary`` payload column plus typed metadata (``media_type`` string, plus
whatever the modality needs).  Decode/resize/frame-sample run as
``mapInPandas`` stages: Arrow-batched (never row-at-a-time Python), schema
declared up front, partition-parallel — each executor core decodes its own
batch stream, which is the correct 100 TB shape for CPU-bound media work.

The actual codecs (PIL/librosa/av) are NOT in this container, so
``decode_payload`` is a deterministic fake keyed on the payload bytes
(length / md5 / derived pseudo-dimensions).  The Spark-side plumbing —
binary schema in, Arrow batch iteration, struct-typed feature schema out —
is real and tested; swapping the fake for a real codec changes only the
body of ``_decode_batch``.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

FEATURE_SCHEMA = (
    "doc_id BIGINT, media_type STRING, n_bytes BIGINT, content_hash STRING, "
    "width BIGINT, height BIGINT, n_channels BIGINT"
)



def decode_features(
    media: DataFrame,
    min_parallelism: int | None = None,
    codec=None,
) -> DataFrame:
    """(doc_id, media_type, payload binary) -> decoded feature rows.

    ``mapInPandas``: Arrow ships each partition to Python in columnar
    batches; output schema is declared so Catalyst plans downstream ops
    without materializing Python objects.

    ``min_parallelism``: decode is CPU-bound Python — when the input has
    fewer partitions than cores (e.g. one parquet file), the stage runs
    serially through one worker.  Rebalancing before the Python stage is
    worth the shuffle for real decode work; at 100 TB the file count
    usually provides parallelism and this stays None.

    ``codec``: the real-decoder seam — ``decode(payload: bytes) ->
    (width, height, n_channels)``, e.g.
    :func:`operators.codecs.pure_python_image_codec` (BMP/PPM, stdlib
    only, exercised by a non-skipped test) or a PIL-backed equivalent in
    a container that has it.  ``None`` keeps the deterministic fake
    (length-derived pseudo-dimensions) the registered oracle query
    reproduces.  Pass a CLOSURE (not a module-level function): the whole
    decode body is serialized by value, so executors do not need this
    package on their own sys.path (an external driver session — e.g. the
    correctness harness — ships no PYTHONPATH to its Python workers)."""
    if min_parallelism is not None:
        media = media.repartition(min_parallelism)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib as _hashlib

        import pandas as _pd

        for pdf in batches:
            if not len(pdf):
                continue
            # Column-wise (not row-tuple-building): only the md5 / codec
            # call is per-element Python; everything else stays in
            # numpy/pandas.
            n = pdf["payload"].map(len)
            if codec is not None:
                dims = pdf["payload"].map(lambda p: codec(bytes(p)))
                width = dims.map(lambda t: t[0])
                height = dims.map(lambda t: t[1])
                channels = dims.map(lambda t: t[2])
            else:
                width, height, channels = n % 640, n % 480, 3
            yield _pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_type": pdf["media_type"],
                    "n_bytes": n,
                    "content_hash": pdf["payload"].map(
                        lambda p: _hashlib.md5(p).hexdigest()
                    ),
                    "width": width,
                    "height": height,
                    "n_channels": channels,
                }
            )

    return media.mapInPandas(gen, schema=FEATURE_SCHEMA)


FRAME_SCHEMA = (
    "doc_id BIGINT, n_bytes BIGINT, n_frames BIGINT, frame_idx BIGINT, "
    "ts_ms BIGINT, frame_hash STRING"
)


def sample_frames(media: DataFrame, stride: int = 4) -> DataFrame:
    """(doc_id, payload binary) -> one row per sampled frame: the
    video-frame-sampling batch shape (a ``mapInPandas`` stage whose output
    has MORE rows than its input — the fan-out contract real frame
    extraction needs, with the frame count decided per payload at decode
    time, unknowable to Catalyst up front).

    Deterministic fake codec (no av/ffmpeg in this container):
    n_frames = (n_bytes % 97) + 8, every ``stride``-th frame sampled,
    ts at 25 fps, frame identity = md5(payload # frame_idx).  Swapping in
    a real demuxer changes only the per-payload codec call; schema, Arrow
    batching and fan-out shape are the real contract.

    The fan-out SKELETON (doc_id/n_bytes/n_frames repeat, frame_idx/ts_ms
    ranges) is vectorized with numpy repeat/arange — only the codec call
    (here the md5 frame hash; in production the frame decode itself) runs
    per output row, so the Python overhead is one C-speed pass plus the
    irreducible per-frame work."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib as _hashlib

        import numpy as _np
        import pandas as _pd

        for pdf in batches:
            if not len(pdf):
                continue
            n = pdf["payload"].map(len).to_numpy(dtype="int64")
            n_frames = (n % 97) + 8
            n_sampled = (n_frames + stride - 1) // stride
            # Vectorized skeleton: repeat per-doc columns by each doc's
            # sampled-frame count; per-frame indices via arange shifted by
            # cumulative offsets (the standard ragged-fan-out idiom).
            doc_rep = _np.repeat(_np.arange(len(pdf)), n_sampled)
            offsets = _np.repeat(
                _np.concatenate(([0], _np.cumsum(n_sampled)[:-1])), n_sampled
            )
            frame_idx = (_np.arange(doc_rep.size) - offsets) * stride
            payloads = pdf["payload"].to_numpy(dtype=object)
            yield _pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].to_numpy()[doc_rep],
                    "n_bytes": n[doc_rep],
                    "n_frames": n_frames[doc_rep],
                    "frame_idx": frame_idx,
                    "ts_ms": frame_idx * 40,
                    # Only the codec call is per-row:
                    "frame_hash": [
                        _hashlib.md5(
                            payloads[d] + b"#" + str(i).encode()
                        ).hexdigest()
                        for d, i in zip(doc_rep, frame_idx)
                    ],
                }
            )

    return media.mapInPandas(gen, schema=FRAME_SCHEMA)


AUDIO_SEGMENT_SCHEMA = (
    "doc_id BIGINT, n_bytes BIGINT, sample_rate BIGINT, duration_ms BIGINT, "
    "seg_idx BIGINT, seg_start_ms BIGINT, seg_end_ms BIGINT, seg_hash STRING"
)


def segment_audio(
    media: DataFrame, window_ms: int = 1000, hop_ms: int = 500, codec=None
) -> DataFrame:
    """(doc_id, payload binary) -> one row per audio segment: the
    fixed-window (overlapping-hop) segmentation every speech/ASR training
    pipeline runs before feature extraction.  Same ``mapInPandas``
    fan-out contract as ``sample_frames``: per-payload metadata (sample
    rate, duration) is decided at decode time, the output has more rows
    than the input, and the skeleton (repeat/arange) is numpy-vectorized
    so only the codec call is per-row.

    Deterministic fake demuxer (no librosa/soundfile in this container):
    sample_rate = 8000 * ((n_bytes % 3) + 1), duration_ms =
    (n_bytes % 9973) + 500, segment identity = md5(payload @ start_ms).

    ``codec``: the real-demuxer seam — ``decode(payload: bytes) ->
    (sample_rate, duration_ms)``, e.g.
    :func:`operators.codecs.pure_python_wav_codec` (stdlib ``wave``,
    exercised by a non-skipped test).  Pass a closure, not a module-level
    function (pickled by value; see decode_features)."""
    if hop_ms <= 0 or window_ms <= 0:
        raise ValueError("window_ms and hop_ms must be positive")

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib as _hashlib

        import numpy as _np
        import pandas as _pd

        for pdf in batches:
            if not len(pdf):
                continue
            n = pdf["payload"].map(len).to_numpy(dtype="int64")
            if codec is not None:
                decoded = pdf["payload"].map(lambda p: codec(bytes(p)))
                rate = decoded.map(lambda t: t[0]).to_numpy(dtype="int64")
                dur = decoded.map(lambda t: t[1]).to_numpy(dtype="int64")
            else:
                rate = 8000 * ((n % 3) + 1)
                dur = (n % 9973) + 500
            n_segs = (dur + hop_ms - 1) // hop_ms  # starts at 0, hop, ... < dur
            doc_rep = _np.repeat(_np.arange(len(pdf)), n_segs)
            offsets = _np.repeat(
                _np.concatenate(([0], _np.cumsum(n_segs)[:-1])), n_segs
            )
            seg_idx = _np.arange(doc_rep.size) - offsets
            start = seg_idx * hop_ms
            end = _np.minimum(start + window_ms, dur[doc_rep])
            payloads = pdf["payload"].to_numpy(dtype=object)
            yield _pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].to_numpy()[doc_rep],
                    "n_bytes": n[doc_rep],
                    "sample_rate": rate[doc_rep],
                    "duration_ms": dur[doc_rep],
                    "seg_idx": seg_idx,
                    "seg_start_ms": start,
                    "seg_end_ms": end,
                    "seg_hash": [
                        _hashlib.md5(
                            payloads[d] + b"@" + str(s).encode()
                        ).hexdigest()
                        for d, s in zip(doc_rep, start)
                    ],
                }
            )

    return media.mapInPandas(gen, schema=AUDIO_SEGMENT_SCHEMA)


def documents_as_media(docs: DataFrame, media_type: str = "image") -> DataFrame:
    """Stand-in media table: document text encoded as the binary payload
    (the container has no real image fixtures; the column types are the
    contract)."""
    return docs.select(
        "doc_id",
        F.lit(media_type).alias("media_type"),
        F.encode("text", "UTF-8").alias("payload"),
    )


RESIZE_SCHEMA = (
    "doc_id BIGINT, media_type STRING, src_bytes BIGINT, dst_width BIGINT, "
    "dst_height BIGINT, dst_bytes BIGINT, resized_hash STRING"
)


def resize_images(
    media: DataFrame, width: int = 224, height: int = 224, codec=None
) -> DataFrame:
    """Batch image resize to a fixed (width, height) — the normalization
    step in front of every vision encoder (training corpora standardize
    to the model's input resolution before tokenization/packing).

    Same contract as ``decode_features``: ``mapInPandas`` with a declared
    schema, Arrow-batched, column-wise pandas ops (only the per-payload
    codec/hash call is per-element Python).

    ``codec``: the real-codec seam — ``decode_raster(payload) -> (width,
    height, n_channels, raster)`` with a top-down row-major raster, e.g.
    :func:`operators.codecs.pure_python_image_raster_codec` (BMP/P6,
    stdlib only, exercised by a non-skipped test with real gradient
    pixels) or a PIL-backed equivalent.  With a codec, the operator
    performs a REAL nearest-neighbor downsample — numpy fancy-indexing
    ``raster[ys][:, xs]`` — and hashes the resized pixel buffer, so a
    wrong source-pixel selection changes the output.  Pass a CLOSURE
    (pickled by value; executors don't import this package).

    ``None`` keeps the deterministic fake (resized identity =
    md5(payload || '@WxH'), size = exact W*H*3 RGB buffer) that the
    registered oracle query reproduces byte-for-byte."""
    suffix = f"@{width}x{height}".encode()
    fake_dst_bytes = width * height * 3

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib as _hashlib

        import numpy as _np
        import pandas as _pd

        ys_cache: dict[tuple[int, int], object] = {}

        def resize_one(p: bytes) -> tuple[int, str]:
            if codec is None:
                return fake_dst_bytes, _hashlib.md5(p + suffix).hexdigest()
            w, h, ch, raster = codec(p)
            arr = _np.frombuffer(raster, dtype=_np.uint8).reshape(h, w, ch)
            if (h, w) not in ys_cache:
                ys_cache[(h, w)] = (
                    (_np.arange(height) * h) // height,
                    (_np.arange(width) * w) // width,
                )
            ys, xs = ys_cache[(h, w)]
            resized = _np.ascontiguousarray(arr[ys][:, xs]).tobytes()
            return len(resized), _hashlib.md5(resized).hexdigest()

        for pdf in batches:
            if not len(pdf):
                continue
            out = pdf["payload"].map(lambda p: resize_one(bytes(p)))
            yield _pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_type": pdf["media_type"],
                    "src_bytes": pdf["payload"].map(len),
                    "dst_width": width,
                    "dst_height": height,
                    "dst_bytes": out.map(lambda t: t[0]),
                    "resized_hash": out.map(lambda t: t[1]),
                }
            )

    return media.mapInPandas(gen, schema=RESIZE_SCHEMA)
