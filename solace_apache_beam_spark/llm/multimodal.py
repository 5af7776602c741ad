"""Multimodal columns: opaque binary payloads + typed metadata, with
decode / feature-extract / frame-sample as Arrow-batched operators.

Pattern (SURVEY.md §7 M4): image/audio/video travel as ``binary``
columns beside a metadata struct; per-item decoding runs in
``mapInPandas`` so each task processes Arrow record batches — the Spark
plumbing (schema, batching, partition parallelism) is real. The actual
media codecs are not in this environment, so ``decode_image`` raises
NotImplementedError behind an import-try, and the tested path uses a
deterministic fake decoder (byte histogram) with the same signature.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "doc_id long, modality string, n_bytes long, checksum string, payload binary"
)

FEATURE_BINS = 16


def attach_binary_payload(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Wrap a source column as a multimodal record: binary payload +
    typed metadata (modality, size, checksum). With real media, payload
    comes off the source as bytes already — this adapter exists because
    the test corpus is text."""
    payload = F.encode(F.col(text_col), "UTF-8")
    return df.select(
        F.col(id_col),
        F.lit("text").alias("modality"),
        F.length(payload).cast("long").alias("n_bytes"),
        F.md5(payload).alias("checksum"),
        payload.alias("payload"),
    )


def decode_image(payload: bytes):
    """Real image decode — requires an image codec library not present
    in this environment. Kept as the explicit extension point."""
    raise NotImplementedError(
        "image codecs unavailable in this environment; use "
        "extract_features (deterministic fake decoder) for the plumbing path"
    )


def _byte_histogram(payload: bytes | None) -> list[float] | None:
    """None payload -> None (absent media has NO features — a zero
    vector would claim 'measured, all-zero'; posexplode then emits no
    rows, matching frame_sample/resize which also skip None). Empty
    payload -> all-zero vector (measured, empty)."""
    if payload is None:
        return None
    counts = [0] * FEATURE_BINS
    if payload:
        for byte in payload:
            counts[byte % FEATURE_BINS] += 1
        total = len(payload)
        return [c / total for c in counts]
    return [0.0] * FEATURE_BINS


def extract_features(df: DataFrame) -> DataFrame:
    """Feature extraction over binary payloads via mapInPandas: each
    Arrow batch maps to a fixed-size feature vector (deterministic fake
    decoder = normalized byte histogram; swap `_byte_histogram` for a
    real decoder where codecs exist). Output: (doc_id, features
    array<double>)."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "features": pdf["payload"].map(_byte_histogram),
                }
            )

    return df.select("doc_id", "payload").mapInPandas(
        op, schema="doc_id long, features array<double>"
    )


def resize_payload(df: DataFrame, target: int = 8) -> DataFrame:
    """Resize for a (fake) image payload: block-average the byte stream
    down to ``target`` cells — byte j lands in cell floor(j*target/n),
    cell value = mean of its bytes. This is the 1-D shape of real
    image resizing (area interpolation): per-item numpy kernel over
    Arrow batches, output scalar rows so the exact value-hash gate
    applies. Integer sums / counts -> one exact division per cell.
    Swap the byte view for a decoded pixel array where codecs exist.
    Output: (doc_id, cell, value); empty payloads produce no rows."""
    import numpy as np

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, cells, vals = [], [], []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                if not payload:
                    continue
                b = np.frombuffer(payload, dtype=np.uint8).astype(np.int64)
                n = len(b)
                cell = (np.arange(n, dtype=np.int64) * target) // n
                sums = np.bincount(cell, weights=b, minlength=target)
                cnts = np.bincount(cell, minlength=target)
                present = np.nonzero(cnts)[0]
                ids.extend([doc_id] * len(present))
                cells.extend(present.tolist())
                vals.extend((sums[present] / cnts[present]).tolist())
            yield pd.DataFrame(
                {"doc_id": ids, "cell": cells, "value": vals}
            )

    return df.select("doc_id", "payload").mapInPandas(
        op, schema="doc_id long, cell int, value double"
    )


def frame_sample(df: DataFrame, frame_bytes: int = 64, stride: int = 4) -> DataFrame:
    """Frame sampling for a (fake) video payload: slice the byte stream
    into fixed-size frames and keep every ``stride``-th — the batch shape
    of real frame extraction. Output one row per sampled frame."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                if payload is None:
                    continue
                n_frames = len(payload) // frame_bytes
                for fi in range(0, n_frames, stride):
                    rows.append(
                        (doc_id, fi, payload[fi * frame_bytes : (fi + 1) * frame_bytes])
                    )
            yield pd.DataFrame(rows, columns=["doc_id", "frame_idx", "frame"])

    return df.select("doc_id", "payload").mapInPandas(
        op, schema="doc_id long, frame_idx int, frame binary"
    )
