"""Protobuf decode/encode for the reference's ``Test`` message.

The reference decodes proto2 ``message Test { required string test = 1; }``
(examples/TestProtobuf.proto:5-7) inside a MapElements after reading raw
bytes (SolaceProtoBuffRecordTest.java:189-194; SolaceByteBuffRecord
mapper, common/SolaceByteBuffRecord.java:67-77).

Spark's first choice would be ``pyspark.sql.protobuf.functions
.from_protobuf`` — that needs the spark-protobuf jar + a descriptor file,
neither baked into this environment, so the wire format (field 1,
wire-type 2: tag 0x0A, varint length, UTF-8 bytes) is parsed in an
Arrow-batched pandas UDF. The single-field message makes the hand parser
exact, not a stub.
"""

from __future__ import annotations

import pandas as pd
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
