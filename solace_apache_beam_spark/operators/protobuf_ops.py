"""Protobuf decode/encode for the reference's ``Test`` message.

The reference decodes proto2 ``message Test { required string test = 1; }``
(examples/TestProtobuf.proto:5-7) inside a MapElements after reading raw
bytes (SolaceProtoBuffRecordTest.java:189-194; SolaceByteBuffRecord
mapper, common/SolaceByteBuffRecord.java:67-77).

Two decode paths, picked at runtime:

- **Descriptor-driven (JVM)**: ``pyspark.sql.protobuf.functions
  .from_protobuf`` against a ``FileDescriptorSet`` — whole-stage
  JVM-side decode, generalizes to any message shape. The descriptor set
  for ``Test`` is hand-encoded below (a descriptor set is itself just a
  protobuf message, so the same wire-format writers produce it — no
  protoc needed). Requires the spark-protobuf jar on the classpath;
  :func:`spark_protobuf_available` probes for it.
- **Arrow wire parser (fallback)**: the single-field wire format
  (field 1, wire-type 2: tag 0x0A, varint length, UTF-8 bytes) parsed
  in an Arrow-batched pandas UDF. Exact for ``Test``, not a stub —
  and the only path in jars-less environments like this one.

:func:`decode_proto_test_auto` returns the JVM column when the jar is
present and the Arrow UDF column otherwise.
"""

from __future__ import annotations

import os
import tempfile

import pandas as pd
from pyspark.sql import Column, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _encode_one(text: str) -> bytes:
    payload = text.encode("utf-8")
    out = bytearray([0x0A])
    n = len(payload)
    while True:  # varint
        b = n & 0x7F
        n >>= 7
        out.append(b | (0x80 if n else 0))
        if not n:
            break
    out.extend(payload)
    return bytes(out)


def _decode_one(raw: bytes) -> str | None:
    if raw is None or len(raw) < 2 or raw[0] != 0x0A:
        return None
    n, shift, i = 0, 0, 1
    while True:
        if i >= len(raw):
            return None
        b = raw[i]
        n |= (b & 0x7F) << shift
        i += 1
        if not (b & 0x80):
            break
        shift += 7
    if i + n > len(raw):
        return None
    return raw[i : i + n].decode("utf-8")


@F.pandas_udf(T.BinaryType())
def encode_proto_test(texts: pd.Series) -> pd.Series:
    return texts.map(lambda t: None if t is None else _encode_one(t))


@F.pandas_udf(T.StringType())
def decode_proto_test(raws: pd.Series) -> pd.Series:
    return raws.map(_decode_one)


# ---------------------------------------------------------------------------
# Descriptor-driven path (spark-protobuf jar)
# ---------------------------------------------------------------------------

def _varint(n: int) -> bytes:
    out = bytearray()
    while True:
        b = n & 0x7F
        n >>= 7
        out.append(b | (0x80 if n else 0))
        if not n:
            return bytes(out)


def _ld(field: int, payload: bytes) -> bytes:
    """Length-delimited field (wire type 2)."""
    return _varint((field << 3) | 2) + _varint(len(payload)) + payload


def _vi(field: int, value: int) -> bytes:
    """Varint field (wire type 0)."""
    return _varint(field << 3) + _varint(value)


def descriptor_set_for_test_message() -> bytes:
    """``FileDescriptorSet`` for ``message Test { required string test
    = 1; }`` — hand-encoded from the public descriptor.proto schema
    (FieldDescriptorProto: name=1, number=3, label=4, type=5;
    LABEL_REQUIRED=2, TYPE_STRING=9). Byte-equivalent to what
    ``protoc --descriptor_set_out`` emits for TestProtobuf.proto."""
    field = _ld(1, b"test") + _vi(3, 1) + _vi(4, 2) + _vi(5, 9)
    message = _ld(1, b"Test") + _ld(2, field)
    file_proto = _ld(1, b"TestProtobuf.proto") + _ld(4, message) + _ld(12, b"proto2")
    return _ld(1, file_proto)


def spark_protobuf_available(spark: SparkSession) -> bool:
    """True when the spark-protobuf jar is on the session classpath."""
    try:
        spark._jvm.java.lang.Class.forName(
            "org.apache.spark.sql.protobuf.ProtobufDataToCatalyst"
        )
        return True
    except Exception:
        return False


_DESC_PATH: str | None = None


def _descriptor_path() -> str:
    """The descriptor-set temp file, written once per process (the
    bytes never change — rewriting per call would leak temp files)."""
    global _DESC_PATH
    if _DESC_PATH is None or not os.path.exists(_DESC_PATH):
        fd, path = tempfile.mkstemp(suffix=".desc")
        with os.fdopen(fd, "wb") as f:
            f.write(descriptor_set_for_test_message())
        _DESC_PATH = path
    return _DESC_PATH


def decode_proto_test_native(col: Column | str) -> Column:
    """JVM-side decode via from_protobuf + the hand-built descriptor
    set (from_protobuf takes a file path)."""
    from pyspark.sql.protobuf.functions import from_protobuf

    return from_protobuf(col, "Test", descFilePath=_descriptor_path()).getField(
        "test"
    )


def decode_proto_test_auto(spark: SparkSession, col: Column | str) -> Column:
    """Descriptor-driven JVM decode when the jar is present, Arrow wire
    parser otherwise — same output either way."""
    if spark_protobuf_available(spark):
        return decode_proto_test_native(col)
    c = F.col(col) if isinstance(col, str) else col
    return decode_proto_test(c)
