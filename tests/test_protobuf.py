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
    # structurally valid record, payload bytes not UTF-8: poison record
    # decodes to NULL instead of raising inside the UDF
    assert _decode_one(b"\x0a\x02\xff\xfe") is None


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
    if spark_protobuf_available(spark):
        # jar present: the JVM descriptor path must agree with the
        # Arrow wire parser on the same payloads
        from solace_apache_beam_spark.operators.protobuf_ops import (
            decode_proto_test,
            decode_proto_test_native,
        )

        both = enc.select(
            decode_proto_test_native("payload").alias("jvm"),
            decode_proto_test(F.col("payload")).alias("arrow"),
        ).collect()
        assert all(r.jvm == r.arrow for r in both)
    else:
        # jar absent: auto must have taken the Arrow fallback (proved
        # by the successful decode above with no jar to call into)
        assert spark_protobuf_available(spark) is False


def test_second_message_type_roundtrip(spark):
    """The descriptor/wire paths generalize beyond the reference's Test
    message: a different message name and field number round-trip, and
    the hand-encoded descriptor set matches the independently derived
    wire bytes for that message."""
    from solace_apache_beam_spark.operators.protobuf_ops import (
        decode_proto_string_auto,
        descriptor_set_for_string_message,
        encode_proto_string_field,
    )

    # message Payload { required string body = 2; }
    field = (
        bytes.fromhex("0a04626f6479")  # name="body"
        + bytes.fromhex("1802")  # number=2
        + bytes.fromhex("2002")  # label=REQUIRED
        + bytes.fromhex("2809")  # type=STRING
    )
    message = bytes.fromhex("0a075061796c6f6164") + bytes([0x12, len(field)]) + field
    file_proto = (
        bytes.fromhex("0a0d") + b"Payload.proto"
        + bytes([0x22, len(message)]) + message
        + bytes.fromhex("6206") + b"proto2"
    )
    expected = bytes([0x0A, len(file_proto)]) + file_proto
    assert descriptor_set_for_string_message("Payload", "body", 2) == expected

    df = spark.createDataFrame(
        [(1, "second message"), (2, ""), (3, None)], "id long, body string"
    )
    enc = df.select(
        "id", encode_proto_string_field("body", field_number=2).alias("raw")
    )
    got = {
        r.id: r.body
        for r in enc.select(
            "id",
            decode_proto_string_auto(
                spark, "raw", "Payload", "body", field_number=2
            ).alias("body"),
        ).collect()
    }
    assert got == {1: "second message", 2: "", 3: None}


def test_wire_field_number_mismatch_returns_null():
    """A payload encoded under one field number must not decode under
    another (the tag byte differs)."""
    assert _decode_one(_encode_one("x", field=2), field=2) == "x"
    assert _decode_one(_encode_one("x", field=2), field=1) is None
    assert _decode_one(_encode_one("x", field=1), field=2) is None
