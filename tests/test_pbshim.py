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


# --- randomized round-trip: any StateRequest the api client could
# construct must survive serialize -> parse bit-exactly (the JVM is a
# canonical-protobuf peer, so serialize(parse(serialize(m))) ==
# serialize(m) is the interop property we can check without the wheel)

from hypothesis import given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402

from tests._fuzz import n_examples  # noqa: E402

_names = st.text(
    st.characters(min_codepoint=32, max_codepoint=0x10FFFF,
                  blacklist_categories=("Cs",)),
    max_size=40,
)
_blobs = st.binary(max_size=64)
_longs = st.integers(min_value=-(2**63), max_value=2**63 - 1)


def _req_strategy():
    state_call = st.builds(
        lambda name, schema, ttl: _mk_state_call(name, schema, ttl),
        _names,
        _names,
        st.one_of(st.none(), st.integers(min_value=0, max_value=2**40)),
    )
    return st.one_of(
        st.builds(
            lambda c: sm.StateRequest(
                statefulProcessorCall=sm.StatefulProcessorCall(getValueState=c)
            ),
            state_call,
        ),
        st.builds(
            lambda c: sm.StateRequest(
                statefulProcessorCall=sm.StatefulProcessorCall(getMapState=c)
            ),
            state_call,
        ),
        st.builds(
            lambda key: sm.StateRequest(
                implicitGroupingKeyRequest=sm.ImplicitGroupingKeyRequest(
                    setImplicitKey=sm.SetImplicitKey(key=key)
                )
            ),
            _blobs,
        ),
        st.builds(
            lambda ms: sm.StateRequest(
                statefulProcessorCall=sm.StatefulProcessorCall(
                    timerStateCall=sm.TimerStateCallCommand(
                        register=sm.RegisterTimer(expiryTimestampMs=ms)
                    )
                )
            ),
            _longs,
        ),
    )


def _mk_state_call(name, schema, ttl):
    c = sm.StateCallCommand()
    c.stateName = name
    c.schema = schema
    if ttl is not None:
        c.ttl.durationMs = ttl
    return c


@settings(max_examples=n_examples(200, 25), deadline=None)
@given(_req_strategy())
def test_request_roundtrip_is_fixed_point(req):
    raw = req.SerializeToString()
    back = sm.StateRequest()
    back.ParseFromString(raw)
    assert back.SerializeToString() == raw
    assert back.WhichOneof("method") == req.WhichOneof("method")


@settings(max_examples=n_examples(200, 25), deadline=None)
@given(
    st.integers(min_value=-(2**31), max_value=2**31 - 1),
    _names,
    st.lists(_blobs, max_size=8),
    st.booleans(),
)
def test_list_response_roundtrip(status, err, values, more):
    r = sm.StateResponseWithListGet(
        statusCode=status, errorMessage=err, value=values,
        requireNextFetch=more,
    )
    back = sm.StateResponseWithListGet()
    back.ParseFromString(r.SerializeToString())
    assert back.statusCode == status
    assert back.errorMessage == err
    assert list(back.value) == values
    assert back.requireNextFetch == more


# --- spec-conformance fixes (ADVICE r12): unsigned fixed widths and
# split-singular-message merge ----------------------------------------


def test_fixed_width_unsigned_spec_semantics():
    """fixed64/fixed32 are UNSIGNED per the encoding spec; sfixed* are
    the signed variants. StateMessage has no fixed fields, so pin the
    semantics on a synthetic descriptor (values >= 2^63 / 2^31 must
    serialize, and must round-trip non-negative)."""
    from solace_apache_beam_spark.vendor.pbshim.google.protobuf import (
        _descriptors as dd,
        _message_impl as mi,
    )

    desc = dd.MessageDesc()
    desc.name = desc.full_name = "FixedProbe"
    for i, (nm, t) in enumerate(
        [
            ("u64", dd.TYPE_FIXED64),
            ("u32", dd.TYPE_FIXED32),
            ("s64", dd.TYPE_SFIXED64),
            ("s32", dd.TYPE_SFIXED32),
        ],
        start=1,
    ):
        f = dd.FieldDesc()
        f.name, f.number, f.type = nm, i, t
        desc.fields.append(f)
    FixedProbe = mi.MessageMeta("FixedProbe", (mi.Message,), {}, desc=desc, pool=None)

    m = FixedProbe(u64=2**64 - 1, u32=2**32 - 1, s64=-2, s32=-2)
    raw = m.SerializeToString()
    # spec LE bytes: tag 0x09 + ff*8, 0x15 + ff*4, 0x19 + fe ff*7, 0x25 + fe ff*3
    assert raw == bytes.fromhex(
        "09ffffffffffffffff15ffffffff19feffffffffffffff25feffffff"
    )
    back = FixedProbe()
    back.ParseFromString(raw)
    assert (back.u64, back.u32, back.s64, back.s32) == (
        2**64 - 1,
        2**32 - 1,
        -2,
        -2,
    )


def test_split_singular_message_field_merges():
    """Spec: repeated wire occurrences of a SINGULAR message field merge
    (a conformant serializer may split one message across chunks).
    Concatenating two serialized messages is the canonical way to hit
    this: each chunk carries one occurrence of getValueState."""
    a = sm.StatefulProcessorCall()
    a.getValueState.stateName = "totals"
    b = sm.StatefulProcessorCall()
    b.getValueState.ttl.durationMs = 5000
    back = sm.StatefulProcessorCall()
    back.ParseFromString(a.SerializeToString() + b.SerializeToString())
    assert back.getValueState.stateName == "totals"
    assert back.getValueState.ttl.durationMs == 5000


# --- differential insurance (VERDICT r12 Next #7) ---------------------
# Build a SECOND, independent family of shim message classes straight
# from the gencode's serialized FileDescriptorProto (private pool) and
# byte-compare serializations over a hypothesis corpus.
#
# - wheel ABSENT (this container): `sm` above resolved to the shim
#   gencode, so the arm proves the descriptor-parse + class-build
#   plumbing reproduces the gencode family bit-exactly (exercised in
#   every preflight — documented in PLANS.md round 13);
# - wheel PRESENT (any CI that ships protobuf): `sm` is REAL protobuf
#   and the same test becomes a true shim-vs-real byte differential,
#   converting the clean-room claim into a continuously verified one.

_FRESH_FAMILY = None


def _fresh_shim_family():
    """StateMessage classes built by the SHIM from serialized_pb, in a
    private pool (never touches the default pool the gencode uses)."""
    global _FRESH_FAMILY
    if _FRESH_FAMILY is None:
        from solace_apache_beam_spark.vendor.pbshim.google.protobuf import (
            _message_impl as mi,
            descriptor_pool as dp,
        )
        from solace_apache_beam_spark.vendor.pbshim.google.protobuf._descriptors import (
            parse_file_descriptor,
        )

        fd = parse_file_descriptor(sm.DESCRIPTOR.serialized_pb)
        pool = dp.DescriptorPool()
        fam = {}
        for m in fd.messages:
            fam[m.name] = mi.build_message_class(m, pool)
        _FRESH_FAMILY = fam
    return _FRESH_FAMILY


_TTLS = st.one_of(st.none(), st.integers(min_value=0, max_value=2**40))
_REQ_SPECS = st.one_of(
    st.tuples(st.just("getValueState"), _names, _names, _TTLS),
    st.tuples(st.just("getMapState"), _names, _names, _TTLS),
    st.tuples(st.just("setImplicitKey"), _blobs),
    st.tuples(st.just("registerTimer"), _longs),
)


def _build_request(get, spec):
    kind = spec[0]
    if kind in ("getValueState", "getMapState"):
        _, name, schema, ttl = spec
        c = get("StateCallCommand")()
        c.stateName = name
        c.schema = schema
        if ttl is not None:
            c.ttl.durationMs = ttl
        return get("StateRequest")(
            statefulProcessorCall=get("StatefulProcessorCall")(**{kind: c})
        )
    if kind == "setImplicitKey":
        return get("StateRequest")(
            implicitGroupingKeyRequest=get("ImplicitGroupingKeyRequest")(
                setImplicitKey=get("SetImplicitKey")(key=spec[1])
            )
        )
    return get("StateRequest")(
        statefulProcessorCall=get("StatefulProcessorCall")(
            timerStateCall=get("TimerStateCallCommand")(
                register=get("RegisterTimer")(expiryTimestampMs=spec[1])
            )
        )
    )


@settings(max_examples=n_examples(200, 25), deadline=None)
@given(_REQ_SPECS)
def test_differential_serialization_vs_gencode_family(spec):
    gencode = _build_request(lambda n: getattr(sm, n), spec)
    fresh = _build_request(_fresh_shim_family().__getitem__, spec)
    raw = gencode.SerializeToString()
    assert fresh.SerializeToString() == raw
    # cross-parse: the fresh shim family parses the gencode bytes back
    # to the identical canonical serialization
    back = _fresh_shim_family()["StateRequest"]()
    back.ParseFromString(raw)
    assert back.SerializeToString() == raw


# --- true differential vs Google's protobuf-java (VERDICT r13 Next #5)
# No python protobuf wheel is reachable in this sandbox (the configured
# pip index publishes none — PLANS.md round 14 records the attempt), so
# the wheel-based arm above cannot become a real differential here. But
# Spark's orc-core jar ships a SHADED copy of the real protobuf-java
# runtime (org.apache.orc.protobuf.*) on the driver classpath — the
# canonical, independently-developed implementation of the wire format.
# Differential: pbshim-serialized bytes must PARSE in protobuf-java and
# RE-SERIALIZE bit-identically (both sides write canonical field-number
# order), over the same hypothesis corpus as the shim-family arm. A
# wrong tag, varint, length prefix, or field ordering on our side fails
# the parse or changes the re-serialization.

_JVM_PB = None


def _jvm_state_request_descriptor(spark):
    global _JVM_PB
    if _JVM_PB is None:
        jvm = spark.sparkContext._jvm
        P = jvm.org.apache.orc.protobuf
        fdp = P.DescriptorProtos.FileDescriptorProto.parseFrom(
            bytes(sm.DESCRIPTOR.serialized_pb)
        )
        # FileDescriptor.buildFrom needs an (empty) FileDescriptor[] —
        # StateMessage.proto imports nothing
        cls = jvm.java.lang.Class.forName(
            "org.apache.orc.protobuf.Descriptors$FileDescriptor"
        )
        deps = jvm.java.lang.reflect.Array.newInstance(cls, 0)
        fd = P.Descriptors.FileDescriptor.buildFrom(fdp, deps)
        _JVM_PB = (P, fd.findMessageTypeByName("StateRequest"))
    return _JVM_PB


@settings(max_examples=n_examples(150, 20), deadline=None)
@given(_REQ_SPECS)
def test_differential_serialization_vs_protobuf_java(spark, spec):
    P, desc = _jvm_state_request_descriptor(spark)
    msg = _build_request(lambda n: getattr(sm, n), spec)
    raw = msg.SerializeToString()
    dm = P.DynamicMessage.parseFrom(desc, raw)
    assert bytes(dm.toByteArray()) == raw
