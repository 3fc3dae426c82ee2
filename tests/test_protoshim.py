"""Unit tests for the vendored minimal protobuf runtime.

The shim (ripcurrent_spark/_vendor/google/protobuf) backs pyspark's
generated StateMessage_pb2 when the real protobuf wheel is absent. The
e2e proof is tests/test_streaming_sessions.py::
test_transform_with_state_running_totals (a live exchange with the
JVM's real protobuf parser); these tests pin the wire format against
hand-computed bytes from the public encoding spec so a regression is
localized here instead of surfacing as an opaque stream failure.
"""

from __future__ import annotations

import pytest

from ripcurrent_spark.protoshim import ensure_protobuf

ensure_protobuf()

from google.protobuf import _mini  # noqa: E402


def _load_pb2():
    import pyspark.sql.streaming.proto.StateMessage_pb2 as sm

    return sm


# ---------------------------------------------------------------- varints
def test_varint_golden_bytes():
    assert _mini._enc_varint(0) == b"\x00"
    assert _mini._enc_varint(1) == b"\x01"
    assert _mini._enc_varint(127) == b"\x7f"
    assert _mini._enc_varint(128) == b"\x80\x01"
    assert _mini._enc_varint(300) == b"\xac\x02"  # spec's worked example
    # negative int64: 10-byte two's complement
    assert _mini._enc_signed_varint(-1) == b"\xff" * 9 + b"\x01"
    for v in (0, 1, 127, 128, 300, 2**32, 2**63 - 1):
        dec, pos = _mini._dec_varint(_mini._enc_varint(v), 0)
        assert dec == v and pos == len(_mini._enc_varint(v))


def test_zigzag():
    cases = {0: 0, -1: 1, 1: 2, -2: 3, 2147483647: 4294967294}
    for plain, zz in cases.items():
        assert _mini._enc_zigzag(plain, 32) == zz
        assert _mini._dec_zigzag(zz) == plain


# ------------------------------------------------------- descriptor parsing
def test_parse_pyspark_state_message_descriptor():
    sm = _load_pb2()
    d = sm.StateRequest.DESCRIPTOR
    assert d.full_name.endswith("state.StateRequest")
    assert set(d.fields_by_name) == {
        "version",
        "statefulProcessorCall",
        "stateVariableRequest",
        "implicitGroupingKeyRequest",
        "timerRequest",
        "utilsRequest",
    }
    assert d.oneofs == ["method"]
    # enum exported both as wrapper and module-level constants
    assert sm.HandleState.Value("INITIALIZED") == sm.INITIALIZED == 2
    assert sm.HandleState.Name(5) == "CLOSED"
    # proto3-optional field is presence-tracked via synthetic oneof
    key_field = sm.TimerInfo.DESCRIPTOR.fields_by_name["key"]
    assert key_field.proto3_optional


# ------------------------------------------------------------ golden bytes
def test_nested_oneof_serialization_golden():
    sm = _load_pb2()
    req = sm.StateRequest(
        statefulProcessorCall=sm.StatefulProcessorCall(
            setHandleState=sm.SetHandleState(state=sm.INITIALIZED)
        )
    )
    # StateRequest{statefulProcessorCall(field 2, LEN){
    #   setHandleState(field 1, LEN){ state(field 1, varint)=2 }}}
    assert req.SerializeToString() == bytes.fromhex("12040a020802")


def test_string_and_int_fields_golden():
    sm = _load_pb2()
    resp = sm.StateResponse(statusCode=1, errorMessage="hi", value=b"\x00\x01")
    # 08 01 | 12 02 'h''i' | 1a 02 00 01
    assert resp.SerializeToString() == bytes.fromhex("0801120268691a020001")
    rt = sm.StateResponse()
    rt.ParseFromString(resp.SerializeToString())
    assert (rt.statusCode, rt.errorMessage, rt.value) == (1, "hi", b"\x00\x01")


def test_default_scalars_omitted_from_wire():
    sm = _load_pb2()
    # proto3: unset / default-valued plain scalars serialize to nothing
    assert sm.StateResponse().SerializeToString() == b""
    assert sm.StateCallCommand(stateName="").SerializeToString() == b""


def test_oneof_last_writer_wins():
    sm = _load_pb2()
    req = sm.StateVariableRequest(valueStateCall=sm.ValueStateCall(stateName="a"))
    assert req.WhichOneof("method") == "valueStateCall"
    req2 = sm.StateVariableRequest(listStateCall=sm.ListStateCall(stateName="b"))
    assert req2.WhichOneof("method") == "listStateCall"
    data = req2.SerializeToString()
    parsed = sm.StateVariableRequest()
    parsed.ParseFromString(data)
    assert parsed.WhichOneof("method") == "listStateCall"
    assert parsed.listStateCall.stateName == "b"


def test_nested_autovivification_presence():
    sm = _load_pb2()
    cmd = sm.StateCallCommand()
    # reading a submessage does NOT create presence...
    _ = cmd.ttl.durationMs
    assert not cmd.HasField("ttl")
    assert cmd.SerializeToString() == b""
    # ...writing through it does, and propagates to the parent chain
    cmd.ttl.durationMs = 30000
    assert cmd.HasField("ttl")
    rt = sm.StateCallCommand()
    rt.ParseFromString(cmd.SerializeToString())
    assert rt.ttl.durationMs == 30000 and rt.HasField("ttl")


def test_repeated_bytes_and_messages_roundtrip():
    sm = _load_pb2()
    resp = sm.StateResponseWithMapIterator(
        statusCode=0,
        kvPair=[
            sm.KeyAndValuePair(key=b"k1", value=b"v1"),
            sm.KeyAndValuePair(key=b"k2", value=b"v2"),
        ],
        requireNextFetch=True,
    )
    rt = sm.StateResponseWithMapIterator()
    rt.ParseFromString(resp.SerializeToString())
    assert [(p.key, p.value) for p in rt.kvPair] == [(b"k1", b"v1"), (b"k2", b"v2")]
    assert rt.requireNextFetch is True

    lst = sm.StateResponseWithListGet(value=[b"a", b"bb", b"ccc"])
    rt2 = sm.StateResponseWithListGet()
    rt2.ParseFromString(lst.SerializeToString())
    assert list(rt2.value) == [b"a", b"bb", b"ccc"]


def test_negative_int64_ten_byte_encoding():
    sm = _load_pb2()
    t = sm.TimerInfo(timestampMs=-1)
    data = t.SerializeToString()
    # field 2 varint tag (0x10) + 10-byte two's complement
    assert data == b"\x10" + b"\xff" * 9 + b"\x01"
    rt = sm.TimerInfo()
    rt.ParseFromString(data)
    assert rt.timestampMs == -1


def test_proto3_optional_bytes_presence():
    sm = _load_pb2()
    absent = sm.TimerInfo(timestampMs=5)
    rt = sm.TimerInfo()
    rt.ParseFromString(absent.SerializeToString())
    assert not rt.HasField("key") and rt.key == b""
    # explicitly-set empty bytes IS serialized and has presence
    present = sm.TimerInfo(key=b"", timestampMs=5)
    rt2 = sm.TimerInfo()
    rt2.ParseFromString(present.SerializeToString())
    assert rt2.HasField("key") and rt2.key == b""


def test_unknown_fields_skipped():
    sm = _load_pb2()
    # statusCode=7 plus unknown field 99 (varint), unknown 98 (LEN)
    data = bytes.fromhex("0807") + b"\xd8\x06\x2a" + b"\xd2\x06\x03abc"
    msg = sm.StateResponse()
    msg.ParseFromString(data)
    assert msg.statusCode == 7


def test_copyfrom_and_clear():
    sm = _load_pb2()
    a = sm.StateCallCommand(stateName="x", schema="s")
    a.ttl.durationMs = 9
    b = sm.StateCallCommand()
    b.CopyFrom(a)
    assert b.stateName == "x" and b.ttl.durationMs == 9
    b.Clear()
    assert b.stateName == "" and not b.HasField("ttl")
    assert a.stateName == "x"  # copy, not alias


def test_constructor_copies_submessages():
    sm = _load_pb2()
    inner = sm.SetHandleState(state=1)
    outer = sm.StatefulProcessorCall(setHandleState=inner)
    inner.state = 5
    assert outer.setHandleState.state == 1


def test_packed_varint_parsing():
    # Synthesize a repeated-varint message descriptor to cover packed
    # decoding (StateMessage has no repeated numerics, but a peer is
    # free to pack any repeated varint field).
    fd = _mini.FieldDescriptorLite()
    fd.name, fd.number, fd.type, fd.label = "xs", 1, _mini.T_INT64, _mini.LABEL_REPEATED
    d = _mini.DescriptorLite("Packed", ".t.Packed")
    d.add_field(fd)
    cls = type("Packed", (_mini.MiniMessage,), {"DESCRIPTOR": d, "__slots__": ()})
    # packed: tag 0a, len 4, varints 1 2 3 300
    msg = cls()
    msg.ParseFromString(bytes.fromhex("0a050102 03ac02".replace(" ", "")))
    assert list(msg.xs) == [1, 2, 3, 300]
    # unpacked form parses equally
    msg2 = cls()
    msg2.ParseFromString(bytes.fromhex("080108020803") + b"\x08\xac\x02")
    assert list(msg2.xs) == [1, 2, 3, 300]
    # and our serializer emits the packed form, which round-trips
    msg3 = cls()
    msg3.ParseFromString(msg.SerializeToString())
    assert list(msg3.xs) == [1, 2, 3, 300]


def test_real_protobuf_wins_when_installed():
    import google.protobuf

    from ripcurrent_spark import protoshim

    mode = protoshim.ensure_protobuf()
    # In this image the vendored shim is expected; on protobuf-bearing
    # images ensure_protobuf must leave the real module untouched.
    if mode == "vendored":
        assert "_vendor" in google.protobuf.__file__
    else:
        assert "_vendor" not in google.protobuf.__file__


def test_merge_from_string_concatenated_messages():
    sm = _load_pb2()
    # Concatenation of two encodings merges: later singular fields win.
    first = sm.StateResponse(statusCode=1, errorMessage="a").SerializeToString()
    second = sm.StateResponse(statusCode=2).SerializeToString()
    msg = sm.StateResponse()
    msg.ParseFromString(first + second)
    assert msg.statusCode == 2 and msg.errorMessage == "a"
