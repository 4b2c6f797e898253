"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Image/audio/video payloads are treated as opaque ``binary`` columns with
typed metadata extracted by Arrow-batched Pandas functions over
``mapInPandas`` — the Spark-side plumbing (schema, batch shape, partition
behavior) is real and tested; the *codec* step is a deterministic fake
(STUB) because decode libraries (PIL/ffmpeg) are not in this runtime.
Swap ``_fake_decode_header`` for a real decoder without touching the plan.

The fake is hash-derived and therefore SQL-reproducible, which lets the
driver's DuckDB oracle value-check the plumbing end to end.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import pandas as pd

DECODE_SCHEMA = (
    "doc_id long, media_type string, byte_len int, width int, height int, "
    "n_frames int, sample_rate int"
)

_REAL_DECODERS_AVAILABLE = False  # PIL / av not present in this runtime


def _fake_decode_header(payload: bytes):
    """STUB decoder: deterministic pseudo-metadata from the payload hash.
    width = 64 + h16(0:4) % 1961; height = 64 + h16(4:8) % 1017;
    n_frames = 1 + h16(8:12) % 240; sample_rate = 8000 + h16(12:16) % 40000
    where h16(a:b) = int(md5(payload)[a:b], 16)."""
    h = hashlib.md5(payload).hexdigest()
    g = lambda a, b, m, off: off + int(h[a:b], 16) % m  # noqa: E731
    return (
        g(0, 4, 1961, 64),
        g(4, 8, 1017, 64),
        g(8, 12, 240, 1),
        g(12, 16, 40000, 8000),
    )


def decode_media_batches(
    batches: Iterator[pd.DataFrame],
) -> Iterator[pd.DataFrame]:
    """mapInPandas kernel: (doc_id, payload, media_type) → DECODE_SCHEMA."""
    if _REAL_DECODERS_AVAILABLE:  # pragma: no cover
        raise NotImplementedError("real codecs not wired in this runtime")
    for pdf in batches:
        metas = [_fake_decode_header(p) for p in pdf["payload"]]
        out = pd.DataFrame(metas, columns=["width", "height", "n_frames", "sample_rate"])
        out.insert(0, "doc_id", pdf["doc_id"].values)
        out.insert(1, "media_type", pdf["media_type"].values)
        out.insert(2, "byte_len", [len(p) for p in pdf["payload"]])
        yield out


def decode_media(df):
    """Declare media decoding over a (doc_id, payload binary, media_type)
    DataFrame. Column-pruned to exactly the three inputs."""
    return df.select("doc_id", "payload", "media_type").mapInPandas(
        decode_media_batches, DECODE_SCHEMA
    )


def sample_frame_indices(decoded, k: int = 8):
    """Uniform frame-sampling plan for video rows: k frame indices evenly
    spaced over n_frames (all frames when n_frames < k), emitted as a CSV
    string so cross-engine value checks are format-stable. The index math
    is pure Catalyst (no codec needed); the subsequent frame *decode* is
    the mapInPandas stub seam. Map-side only — no shuffle."""
    from pyspark.sql import functions as F

    n = F.col("n_frames")
    k_eff = F.least(n, F.lit(k))
    # guard k_eff == 0 (a real decoder may report 0 frames): sequence(0, -1)
    # would step DOWN to [0, -1] — emit an empty index list instead
    indices = F.when(
        k_eff > 0,
        F.transform(
            F.sequence(F.lit(0), k_eff - 1),
            lambda i: F.floor(i * n / k_eff).cast("int"),
        ),
    ).otherwise(F.array().cast("array<int>"))
    return (
        decoded.filter(F.col("media_type") == "video")
        .select(
            "doc_id",
            "n_frames",
            F.array_join(indices, ",").alias("frame_idx_csv"),
        )
    )
