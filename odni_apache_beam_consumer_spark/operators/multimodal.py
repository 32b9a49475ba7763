"""Multimodal column operators: decode / feature-extract over binary payloads.

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

_REAL_CODECS = False
try:  # pragma: no cover - codecs absent in this container by design
    from PIL import Image  # noqa: F401

    _REAL_CODECS = True
except Exception:
    _REAL_CODECS = False


def decode_features(media: DataFrame, min_parallelism: int | None = None) -> DataFrame:
    """(doc_id, media_type, payload binary) -> decoded feature rows.

    ``mapInPandas``: Arrow ships each partition to Python in columnar
    batches; output schema is declared so Catalyst plans downstream ops
    without materializing Python objects.

    ``min_parallelism``: decode is CPU-bound Python — when the input has
    fewer partitions than cores (e.g. one parquet file), the stage runs
    serially through one worker.  Rebalancing before the Python stage is
    worth the shuffle for real decode work; at 100 TB the file count
    usually provides parallelism and this stays None.

    The whole decode body is a self-contained closure: cloudpickle then
    serializes it BY VALUE, so executors do not need this package on
    their own sys.path (an external driver session — e.g. the correctness
    harness — ships no PYTHONPATH to its Python workers)."""
    if min_parallelism is not None:
        media = media.repartition(min_parallelism)
    real_codecs = _REAL_CODECS

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib as _hashlib

        import pandas as _pd

        for pdf in batches:
            if not len(pdf):
                continue
            if real_codecs and (pdf["media_type"] == "image").any():
                # Real path: Image.open(io.BytesIO(payload)) -> size.
                # Unreachable in this container; the swap-in point.
                raise NotImplementedError("real image codec path not wired in CI")
            # Column-wise (not row-tuple-building): only the md5 itself is
            # per-element Python; everything else stays in numpy/pandas.
            n = pdf["payload"].map(len)
            yield _pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_type": pdf["media_type"],
                    "n_bytes": n,
                    "content_hash": pdf["payload"].map(
                        lambda p: _hashlib.md5(p).hexdigest()
                    ),
                    "width": n % 640,
                    "height": n % 480,
                    "n_channels": 3,
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
    a real demuxer changes only the closure body; schema, Arrow batching
    and fan-out shape are the real contract."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib as _hashlib

        import pandas as _pd

        for pdf in batches:
            if not len(pdf):
                continue
            out: dict[str, list] = {
                "doc_id": [],
                "n_bytes": [],
                "n_frames": [],
                "frame_idx": [],
                "ts_ms": [],
                "frame_hash": [],
            }
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                n = len(payload)
                n_frames = (n % 97) + 8
                for idx in range(0, n_frames, stride):
                    out["doc_id"].append(doc_id)
                    out["n_bytes"].append(n)
                    out["n_frames"].append(n_frames)
                    out["frame_idx"].append(idx)
                    out["ts_ms"].append(idx * 40)
                    out["frame_hash"].append(
                        _hashlib.md5(payload + b"#" + str(idx).encode()).hexdigest()
                    )
            yield _pd.DataFrame(out)

    return media.mapInPandas(gen, schema=FRAME_SCHEMA)


def documents_as_media(docs: DataFrame, media_type: str = "image") -> DataFrame:
    """Stand-in media table: document text encoded as the binary payload
    (the container has no real image fixtures; the column types are the
    contract)."""
    return docs.select(
        "doc_id",
        F.lit(media_type).alias("media_type"),
        F.encode("text", "UTF-8").alias("payload"),
    )
