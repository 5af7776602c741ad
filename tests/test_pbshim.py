"""vendor/pbshim unit tests — the pure-python google.protobuf shim the
transformWithState engine path rides in containers without the real
wheel (tests/test_stateful_v2.py is the end-to-end proof against the
JVM's real protobuf; these pin the wire format itself).

Byte-level expectations are hand-derived from the public encoding spec
(protobuf.dev/programming-guides/encoding): tag = (field<<3)|wiretype
varint, length-delimited submessages, 64-bit two's-complement varints
for negative ints. The JVM side of the state server speaks canonical
protobuf, so these pins are what interop rests on.
"""

from __future__ import annotations

import pytest

pytest.importorskip(
    "pyspark.sql.streaming.proto.StateMessage_pb2",
    reason="pyspark gencode module unavailable",
)

import pyspark.sql.streaming.proto.StateMessage_pb2 as sm  # noqa: E402

from solace_apache_beam_spark.vendor.pbshim.google.protobuf import (  # noqa: E402
    _wire,
)


def test_varint_encoding_spec_examples():
    # spec: 1 -> 01, 150 -> 9601, 300 -> ac02
    assert _wire.enc_varint(1) == b"\x01"
    assert _wire.enc_varint(150) == b"\x96\x01"
    assert _wire.enc_varint(300) == b"\xac\x02"
    assert _wire.dec_varint(b"\x96\x01", 0) == (150, 2)
    # negative int64: 10-byte two's complement
    enc = _wire.enc_varint(-2)
    assert len(enc) == 10
    val, _ = _wire.dec_varint(enc, 0)
    assert _wire.to_signed64(val) == -2


def test_state_call_command_exact_bytes():
    """Pin the exact wire bytes of the getValueState request the api
    client sends — tag 0x0a stateName, 0x12 schema, 0x22 ttl submsg."""
    cmd = sm.StateCallCommand()
    cmd.stateName = "totals"
    cmd.ttl.durationMs = 5000
    raw = cmd.SerializeToString()
    assert raw == bytes.fromhex("0a06746f74616c732203088827")


def test_set_handle_state_exact_bytes():
    shs = sm.SetHandleState(state=sm.DATA_PROCESSED)
    req = sm.StateRequest(
        statefulProcessorCall=sm.StatefulProcessorCall(setHandleState=shs)
    )
    # field2(StateRequest) -> field1(SetHandleState) -> field1 enum 3
    assert req.SerializeToString() == bytes.fromhex("12040a020803")


def test_empty_oneof_submessage_reaches_wire():
    """RemoveImplicitKey has no fields — the oneof arm must still be
    serialized (tag + len 0 at both nesting levels) or the JVM's
    WhichOneof sees nothing."""
    req = sm.StateRequest(
        implicitGroupingKeyRequest=sm.ImplicitGroupingKeyRequest(
            removeImplicitKey=sm.RemoveImplicitKey()
        )
    )
    raw = req.SerializeToString()
    assert raw == bytes.fromhex("22021200")
    back = sm.StateRequest()
    back.ParseFromString(raw)
    assert back.WhichOneof("method") == "implicitGroupingKeyRequest"
    assert back.implicitGroupingKeyRequest.HasField("removeImplicitKey")


def test_oneof_last_wins():
    call = sm.StatefulProcessorCall(
        getValueState=sm.StateCallCommand(stateName="a")
    )
    call.getMapState.stateName = "b"
    assert call.WhichOneof("method") == "getMapState"
    back = sm.StatefulProcessorCall()
    back.ParseFromString(call.SerializeToString())
    assert back.WhichOneof("method") == "getMapState"
    assert back.getMapState.stateName == "b"


def test_response_scalar_defaults_and_presence():
    """proto3 scalars at default are absent from the wire; parsing a
    sparse message yields defaults."""
    resp = sm.StateResponse(statusCode=0, errorMessage="", value=b"")
    assert resp.SerializeToString() == b""
    back = sm.StateResponse()
    back.ParseFromString(b"")
    assert (back.statusCode, back.errorMessage, back.value) == (0, "", b"")


def test_repeated_message_and_bytes_roundtrip():
    mi = sm.StateResponseWithMapIterator(statusCode=7, requireNextFetch=True)
    mi.kvPair.append(sm.KeyAndValuePair(key=b"k1", value=b"v1"))
    mi.kvPair.add(key=b"k2", value=b"v2")
    back = sm.StateResponseWithMapIterator()
    back.ParseFromString(mi.SerializeToString())
    assert [(p.key, p.value) for p in back.kvPair] == [
        (b"k1", b"v1"),
        (b"k2", b"v2"),
    ]
    assert back.requireNextFetch is True and back.statusCode == 7

    lg = sm.StateResponseWithListGet(statusCode=0, value=[b"a", b"bb"])
    back2 = sm.StateResponseWithListGet()
    back2.ParseFromString(lg.SerializeToString())
    assert list(back2.value) == [b"a", b"bb"]


def test_proto3_optional_field_presence():
    t = sm.TimerInfo(timestampMs=123)
    assert not t.HasField("key")
    back = sm.TimerInfo()
    back.ParseFromString(t.SerializeToString())
    assert back.timestampMs == 123 and not back.HasField("key")
    t2 = sm.TimerInfo(key=b"", timestampMs=5)  # explicitly-set empty key
    back2 = sm.TimerInfo()
    back2.ParseFromString(t2.SerializeToString())
    assert back2.HasField("key") and back2.key == b""


def test_negative_int64_roundtrip():
    r = sm.StateResponseWithLongTypeVal(statusCode=1, value=-42)
    back = sm.StateResponseWithLongTypeVal()
    back.ParseFromString(r.SerializeToString())
    assert back.value == -42


def test_unknown_fields_skipped():
    """Bytes from a NEWER schema (extra field 15, varint) must parse."""
    raw = sm.StateResponse(statusCode=2).SerializeToString()
    raw += _wire.enc_tag(15, _wire.WIRE_VARINT) + _wire.enc_varint(99)
    raw += _wire.enc_tag(16, _wire.WIRE_LEN) + _wire.enc_len_delim(b"xx")
    back = sm.StateResponse()
    back.ParseFromString(raw)
    assert back.statusCode == 2


def test_utf8_string_roundtrip():
    cmd = sm.StateCallCommand(stateName="smörgåsbord \U0001f600")
    back = sm.StateCallCommand()
    back.ParseFromString(cmd.SerializeToString())
    assert back.stateName == "smörgåsbord \U0001f600"
