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


def _varint_bytes(n: int) -> bytes:
    if n < 0:
        # proto varints are unsigned here; a negative python int would
        # loop forever (>>= 7 never reaches 0 on negatives)
        raise ValueError(f"varint requires a non-negative int, got {n}")
    out = bytearray()
    while True:
        b = n & 0x7F
        n >>= 7
        out.append(b | (0x80 if n else 0))
        if not n:
            return bytes(out)


def _encode_one(text: str, field: int = 1) -> bytes:
    payload = text.encode("utf-8")
    return (
        _varint_bytes((field << 3) | 2) + _varint_bytes(len(payload)) + payload
    )


def _decode_one(raw: bytes, field: int = 1) -> str | None:
    tag = _varint_bytes((field << 3) | 2)
    if raw is None or not raw.startswith(tag) or len(raw) < len(tag) + 1:
        return None
    n, shift, i = 0, 0, len(tag)
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
    try:
        return raw[i : i + n].decode("utf-8")
    except UnicodeDecodeError:
        # a structurally-valid record with non-UTF-8 payload bytes is a
        # poison record like any other malformed input: decode to NULL
        # instead of raising inside the UDF (one bad message on a 100 TB
        # feed must not fail the task) — same contract as the fake
        # broker's torn-record read path
        return None


def encode_proto_string_field(col: Column | str, field_number: int = 1) -> Column:
    """Arrow encoder for a single-string-field message with the given
    field number (wire type 2)."""

    @F.pandas_udf(T.BinaryType())
    def enc(texts: pd.Series) -> pd.Series:
        return texts.map(
            lambda t: None if t is None else _encode_one(t, field_number)
        )

    c = F.col(col) if isinstance(col, str) else col
    return enc(c)


def decode_proto_string_field(col: Column | str, field_number: int = 1) -> Column:
    """Arrow wire parser for a single-string-field message with the
    given field number — the jar-less fallback path."""

    @F.pandas_udf(T.StringType())
    def dec(raws: pd.Series) -> pd.Series:
        return raws.map(lambda r: _decode_one(r, field_number))

    c = F.col(col) if isinstance(col, str) else col
    return dec(c)


def encode_proto_test(col: Column | str) -> Column:
    """The reference's ``Test`` message: field 1, wire type 2."""
    return encode_proto_string_field(col, 1)


def decode_proto_test(col: Column | str) -> Column:
    return decode_proto_string_field(col, 1)


# ---------------------------------------------------------------------------
# Descriptor-driven path (spark-protobuf jar)
# ---------------------------------------------------------------------------

# one varint encoder for both the wire path and the descriptor builder
# (a second copy here drifted-independently once; alias, don't redefine)
_varint = _varint_bytes


def _ld(field: int, payload: bytes) -> bytes:
    """Length-delimited field (wire type 2)."""
    return _varint((field << 3) | 2) + _varint(len(payload)) + payload


def _vi(field: int, value: int) -> bytes:
    """Varint field (wire type 0)."""
    return _varint(field << 3) + _varint(value)


def descriptor_set_for_string_message(
    message_name: str,
    field_name: str,
    field_number: int = 1,
    file_name: str | None = None,
) -> bytes:
    """``FileDescriptorSet`` for ``message <Name> { required string
    <field> = <number>; }`` — hand-encoded from the public
    descriptor.proto schema (FieldDescriptorProto: name=1, number=3,
    label=4, type=5; LABEL_REQUIRED=2, TYPE_STRING=9). Byte-equivalent
    to ``protoc --descriptor_set_out`` for the same .proto."""
    field = (
        _ld(1, field_name.encode("utf-8"))
        + _vi(3, field_number)
        + _vi(4, 2)
        + _vi(5, 9)
    )
    message = _ld(1, message_name.encode("utf-8")) + _ld(2, field)
    fname = (file_name or f"{message_name}.proto").encode("utf-8")
    file_proto = _ld(1, fname) + _ld(4, message) + _ld(12, b"proto2")
    return _ld(1, file_proto)


def descriptor_set_for_test_message() -> bytes:
    """The reference's ``Test`` message (examples/TestProtobuf.proto:5-7)."""
    return descriptor_set_for_string_message(
        "Test", "test", 1, file_name="TestProtobuf.proto"
    )


def spark_protobuf_available(spark: SparkSession) -> bool:
    """True when the spark-protobuf jar is on the session classpath."""
    try:
        spark._jvm.java.lang.Class.forName(
            "org.apache.spark.sql.protobuf.ProtobufDataToCatalyst"
        )
        return True
    except Exception:
        return False


_DESC_PATHS: dict[bytes, str] = {}


def _descriptor_path(desc_bytes: bytes) -> str:
    """Temp file holding a descriptor set, written once per process per
    distinct content (rewriting per call would leak temp files)."""
    path = _DESC_PATHS.get(desc_bytes)
    if path is None or not os.path.exists(path):
        fd, path = tempfile.mkstemp(suffix=".desc")
        with os.fdopen(fd, "wb") as f:
            f.write(desc_bytes)
        _DESC_PATHS[desc_bytes] = path
    return path


def decode_proto_native(
    col: Column | str, message_name: str, desc_file_path: str
) -> Column:
    """JVM-side decode of ANY message type via ``from_protobuf`` and a
    caller-supplied descriptor-set file (e.g. from ``protoc
    --descriptor_set_out``) — whole-stage codegen decode, returns the
    struct column. Requires the spark-protobuf jar."""
    from pyspark.sql.protobuf.functions import from_protobuf

    return from_protobuf(col, message_name, descFilePath=desc_file_path)


def decode_proto_test_native(col: Column | str) -> Column:
    """JVM-side decode via from_protobuf + the hand-built descriptor
    set (from_protobuf takes a file path)."""
    return decode_proto_native(
        col, "Test", _descriptor_path(descriptor_set_for_test_message())
    ).getField("test")


def decode_proto_test_auto(spark: SparkSession, col: Column | str) -> Column:
    """Descriptor-driven JVM decode when the jar is present, Arrow wire
    parser otherwise — same output either way."""
    if spark_protobuf_available(spark):
        return decode_proto_test_native(col)
    c = F.col(col) if isinstance(col, str) else col
    return decode_proto_test(c)


def decode_proto_string_auto(
    spark: SparkSession,
    col: Column | str,
    message_name: str,
    field_name: str,
    field_number: int = 1,
    desc_file_path: str | None = None,
) -> Column:
    """Generalized auto decode for single-string-field messages: JVM
    ``from_protobuf`` when the jar is present (descriptor set supplied
    by the caller or hand-built here), Arrow wire parser otherwise."""
    if spark_protobuf_available(spark):
        path = desc_file_path or _descriptor_path(
            descriptor_set_for_string_message(
                message_name, field_name, field_number
            )
        )
        return decode_proto_native(col, message_name, path).getField(field_name)
    return decode_proto_string_field(col, field_number)
