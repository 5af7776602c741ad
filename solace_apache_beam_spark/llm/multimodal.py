"""Multimodal columns: opaque binary payloads + typed metadata, with
decode / feature-extract / frame-sample as Arrow-batched operators.

Pattern (SURVEY.md §7 M4): image/audio/video travel as ``binary``
columns beside a metadata struct; per-item decoding runs in
``mapInPandas`` so each task processes Arrow record batches — the Spark
plumbing (schema, batching, partition parallelism) is real.

Codecs (round 14 — VERDICT r13 Next #8): ``decode_image`` is a REAL
pure-python decoder for the two formats expressible without native
libs — 24-bit uncompressed BMP and 8-bit non-interlaced PNG (zlib is
stdlib; all five PNG scanline filters implemented per the spec at
www.w3.org/TR/png-3). Other formats (JPEG etc.) remain the documented
NotImplementedError extension point. ``attach_bmp_payload`` +
``decode_features`` run the decode inside ``mapInPandas`` and are
oracle-gated by the ``multimodal_features`` registry query (the
decoded-pixel histogram of a BMP equals the histogram DuckDB computes
over the wrapped byte range — order-invariant; row order and channel
order are pinned exactly by the pytest vectors instead).
"""

from __future__ import annotations

import struct
import zlib
from collections.abc import Iterator

import numpy as np
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


_PNG_SIG = b"\x89PNG\r\n\x1a\n"
# PNG color type -> channel count (8-bit depth only; no palette)
_PNG_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}


def _png_unfilter(raw: bytes, h: int, w: int, c: int) -> np.ndarray:
    """Undo PNG scanline filtering (spec 7.3: None/Sub/Up/Average/
    Paeth). Each scanline = 1 filter byte + w*c sample bytes; filters
    are defined on the UNFILTERED prior bytes, so rows reconstruct
    sequentially."""
    stride = w * c
    out = np.zeros((h, stride), dtype=np.uint8)
    pos = 0
    prior = np.zeros(stride, dtype=np.intp)
    for r in range(h):
        ftype = raw[pos]
        pos += 1
        line = np.frombuffer(raw, dtype=np.uint8, count=stride, offset=pos).astype(
            np.intp
        )
        pos += stride
        if ftype == 0:  # None
            cur = line
        elif ftype == 1:  # Sub: prior byte c positions left (same row)
            cur = line.copy()
            for i in range(c, stride):
                cur[i] = (cur[i] + cur[i - c]) & 0xFF
        elif ftype == 2:  # Up
            cur = (line + prior) & 0xFF
        elif ftype == 3:  # Average: floor((left + up) / 2)
            cur = line.copy()
            for i in range(stride):
                left = cur[i - c] if i >= c else 0
                cur[i] = (cur[i] + (left + prior[i]) // 2) & 0xFF
        elif ftype == 4:  # Paeth predictor (spec 7.3.6)
            cur = line.copy()
            for i in range(stride):
                a = cur[i - c] if i >= c else 0  # left
                b = prior[i]  # up
                cc = prior[i - c] if i >= c else 0  # upper-left
                p = a + b - cc
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - cc)
                if pa <= pb and pa <= pc:
                    pred = a
                elif pb <= pc:
                    pred = b
                else:
                    pred = cc
                cur[i] = (cur[i] + pred) & 0xFF
        else:
            raise ValueError(f"unknown PNG filter type {ftype}")
        out[r] = cur.astype(np.uint8)
        prior = cur
    return out.reshape(h, w, c)


def _decode_png(payload: bytes) -> np.ndarray:
    pos = len(_PNG_SIG)
    h = w = None
    channels = None
    idat = bytearray()
    while pos + 8 <= len(payload):
        (length,) = struct.unpack(">I", payload[pos : pos + 4])
        ctype = payload[pos + 4 : pos + 8]
        body = payload[pos + 8 : pos + 8 + length]
        pos += 12 + length  # length + type + body + CRC
        if ctype == b"IHDR":
            w, h, depth, color, _comp, _filt, interlace = struct.unpack(
                ">IIBBBBB", body
            )
            if depth != 8:
                raise NotImplementedError(f"PNG bit depth {depth} (only 8)")
            if interlace != 0:
                raise NotImplementedError("interlaced PNG (Adam7)")
            if color not in _PNG_CHANNELS:
                raise NotImplementedError(f"PNG color type {color}")
            channels = _PNG_CHANNELS[color]
        elif ctype == b"IDAT":
            idat.extend(body)
        elif ctype == b"IEND":
            break
    if h is None or channels is None:
        raise ValueError("PNG missing IHDR")
    raw = zlib.decompress(bytes(idat))
    expected = h * (1 + w * channels)
    if len(raw) != expected:
        raise ValueError(f"PNG data {len(raw)} bytes, expected {expected}")
    return _png_unfilter(raw, h, w, channels)


def _decode_bmp(payload: bytes) -> np.ndarray:
    (data_off,) = struct.unpack_from("<I", payload, 10)
    hdr_size, w, h = struct.unpack_from("<Iii", payload, 14)
    if hdr_size < 40:
        raise NotImplementedError(f"BMP header size {hdr_size}")
    planes, bpp, compression = struct.unpack_from("<HHI", payload, 26)
    if bpp != 24 or compression != 0:
        raise NotImplementedError(
            f"BMP bpp={bpp} compression={compression} (only 24-bit BI_RGB)"
        )
    top_down = h < 0
    h = abs(h)
    stride = (3 * w + 3) // 4 * 4  # rows padded to 4 bytes
    px = np.frombuffer(
        payload, dtype=np.uint8, count=h * stride, offset=data_off
    ).reshape(h, stride)[:, : 3 * w]
    rows = px if top_down else px[::-1]  # positive height = bottom-up
    return rows.reshape(h, w, 3)[:, :, ::-1].copy()  # BGR -> RGB


def decode_image(payload: bytes) -> np.ndarray:
    """Decode an image payload to an (height, width, channels) uint8
    array, top-down row order, RGB(A) channel order. Pure-python
    decoders for 24-bit uncompressed BMP and 8-bit non-interlaced PNG
    (all five scanline filters); every other format raises
    NotImplementedError — the extension point for native codecs."""
    if payload[:2] == b"BM":
        return _decode_bmp(payload)
    if payload[: len(_PNG_SIG)] == _PNG_SIG:
        return _decode_png(payload)
    raise NotImplementedError(
        "unsupported image format (pure-python decoders cover 24-bit "
        "BMP and 8-bit non-interlaced PNG; JPEG etc. need native codecs)"
    )


def encode_bmp(pixels: np.ndarray) -> bytes:
    """Encode an (h, w, 3) uint8 RGB array as a 24-bit uncompressed
    BMP (bottom-up rows, BGR samples, 4-byte row padding) — the
    deterministic wrapper ``attach_bmp_payload`` uses and the exact
    inverse of ``_decode_bmp`` (pinned by tests)."""
    h, w, c = pixels.shape
    assert c == 3, "encode_bmp takes RGB"
    stride = (3 * w + 3) // 4 * 4
    body = np.zeros((h, stride), dtype=np.uint8)
    body[:, : 3 * w] = pixels[::-1, :, ::-1].reshape(h, 3 * w)
    data = body.tobytes()
    file_header = struct.pack("<2sIHHI", b"BM", 54 + len(data), 0, 0, 54)
    info_header = struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(data), 0, 0, 0, 0
    )
    return file_header + info_header + data


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


def attach_bmp_payload(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", width: int = 4
) -> DataFrame:
    """Wrap each doc's UTF-8 bytes as a real 24-bit BMP image: byte
    triples become RGB pixels, ``width`` pixels per row, truncated to
    whole rows (docs shorter than one row produce no record — the
    absent-media convention). The test corpus is text, so this adapter
    is how the REAL decode path gets exercised end-to-end; with real
    media the payload arrives as bytes already. ``width=4`` keeps the
    BMP row stride padding-free (12 bytes % 4 == 0), so the decoded
    pixel byte MULTISET equals the wrapped byte range exactly — the
    property the multimodal_features oracle replays in SQL."""
    row_bytes = 3 * width

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, payloads = [], []
            for doc_id, text in zip(pdf[id_col], pdf[text_col]):
                if text is None:
                    continue
                raw = text.encode("utf-8")
                h = len(raw) // row_bytes
                if h == 0:
                    continue
                px = np.frombuffer(raw, dtype=np.uint8, count=h * row_bytes)
                ids.append(doc_id)
                payloads.append(encode_bmp(px.reshape(h, width, 3)))
            yield pd.DataFrame({id_col: ids, "payload": payloads})

    return df.select(id_col, text_col).mapInPandas(
        op, schema=f"{id_col} long, payload binary"
    )


def decode_features(df: DataFrame) -> DataFrame:
    """REAL-decode feature extraction: ``decode_image`` each payload
    (BMP/PNG) inside mapInPandas, then the normalized byte histogram
    over the DECODED pixel samples. Same output contract as
    ``extract_features`` — (doc_id, features array<double>) — but the
    values only come out right if the decoder parsed the container
    correctly (offsets, strides, row order, channel order all feed the
    same sample multiset)."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "features": [
                        None
                        if payload is None
                        else _byte_histogram(decode_image(payload).tobytes())
                        for payload in pdf["payload"]
                    ],
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
