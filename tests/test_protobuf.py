"""Protobuf paths: the Arrow wire parser, the hand-built descriptor
set for the descriptor-driven from_protobuf path, and the runtime
selection between them."""

from __future__ import annotations

from pyspark.sql import functions as F

from solace_apache_beam_spark.operators.protobuf_ops import (
    _decode_one,
    _encode_one,
    decode_proto_test_auto,
    spark_protobuf_available,
    descriptor_set_for_test_message,
)


def test_wire_roundtrip_edge_cases():
    for s in ["", "a", "x" * 200, "héllo wörld", "多字节"]:
        assert _decode_one(_encode_one(s)) == s
    assert _decode_one(None) is None
    assert _decode_one(b"") is None
    assert _decode_one(b"\x0a\xff") is None  # truncated length prefix


def test_descriptor_set_bytes_are_exact():
    """The FileDescriptorSet is hand-encoded; pin the exact bytes
    (independently derived from the public descriptor.proto wire
    layout) so a refactor of the writers can't drift."""
    field = bytes.fromhex("0a0474657374") + bytes.fromhex("1801") + bytes.fromhex(
        "2002"
    ) + bytes.fromhex("2809")
    message = bytes.fromhex("0a0454657374") + bytes([0x12, len(field)]) + field
    file_proto = (
        bytes.fromhex("0a12") + b"TestProtobuf.proto"
        + bytes([0x22, len(message)]) + message
        + bytes.fromhex("6206") + b"proto2"
    )
    expected = bytes([0x0A, len(file_proto)]) + file_proto
    assert descriptor_set_for_test_message() == expected


def test_auto_path_decodes_either_way(spark):
    df = spark.createDataFrame([(1, "hello"), (2, "")], "id long, text string")
    from solace_apache_beam_spark.operators.protobuf_ops import encode_proto_test

    enc = df.select("id", encode_proto_test(F.col("text")).alias("payload"))
    out = {
        r.id: r.test
        for r in enc.select(
            "id", decode_proto_test_auto(spark, "payload").alias("test")
        ).collect()
    }
    assert out == {1: "hello", 2: ""}
    # this environment ships no spark-protobuf jar: the probe must say
    # so (on a cluster with the jar, the same call flips to JVM decode)
    assert spark_protobuf_available(spark) is False
