"""Unit tests for the vendored pure-Python protobuf shim.

These run without Spark: they exercise the wire format and descriptor
parsing directly against PySpark's generated StateMessage_pb2 module —
the exact artifact the transformWithState worker protocol uses. The
end-to-end validation (requests encoded by the shim parsed by the JVM
state server, responses encoded by the JVM parsed by the shim) is
tests/test_scale_features.py::test_transform_with_state_fold_matches_oracle.
"""

from __future__ import annotations

import pytest

from kafka_streams_aggregate_spark.protoshim import ensure_protobuf

ensure_protobuf()

sm = pytest.importorskip("pyspark.sql.streaming.proto.StateMessage_pb2")


def test_descriptor_parse_matches_known_schema():
    d = sm.StateRequest.DESCRIPTOR
    assert d.full_name.endswith("state.StateRequest")
    by_name = d.fields_by_name
    assert by_name["version"].number == 1
    assert by_name["statefulProcessorCall"].number == 2
    assert by_name["stateVariableRequest"].number == 3
    assert "method" in d.oneofs_by_name
    assert {f.name for f in d.oneofs_by_name["method"].fields} >= {
        "statefulProcessorCall",
        "stateVariableRequest",
        "implicitGroupingKeyRequest",
    }


def test_scalar_roundtrip_and_known_bytes():
    # varint field 1 (version=150) must encode as 08 96 01 — the
    # canonical example from the public protobuf encoding guide.
    req = sm.StateRequest(version=150)
    assert req.SerializeToString() == b"\x08\x96\x01"
    back = sm.StateRequest()
    back.ParseFromString(b"\x08\x96\x01")
    assert back.version == 150


def test_string_field_known_bytes():
    # field 2 (errorMessage) LEN "hi" -> tag 0x12, len 2.
    resp = sm.StateResponse(errorMessage="hi")
    assert resp.SerializeToString() == b"\x12\x02hi"


def test_negative_int64_ten_byte_varint():
    t = sm.TimerInfo(timestampMs=-1)
    raw = t.SerializeToString()
    # field 2 varint: tag 0x10 then ten 64-bit two's-complement bytes
    assert raw[0] == 0x10 and len(raw) == 11
    back = sm.TimerInfo()
    back.ParseFromString(raw)
    assert back.timestampMs == -1


def test_oneof_set_clears_previous_member():
    req = sm.StateRequest(
        statefulProcessorCall=sm.StatefulProcessorCall(
            setHandleState=sm.SetHandleState(state=sm.CREATED)
        )
    )
    assert req.WhichOneof("method") == "statefulProcessorCall"
    req.stateVariableRequest.CopyFrom(sm.StateVariableRequest())
    # direct assignment path
    req2 = sm.StateRequest(
        implicitGroupingKeyRequest=sm.ImplicitGroupingKeyRequest(
            removeImplicitKey=sm.RemoveImplicitKey()
        )
    )
    assert req2.WhichOneof("method") == "implicitGroupingKeyRequest"
    parsed = sm.StateRequest()
    parsed.ParseFromString(req2.SerializeToString())
    assert parsed.WhichOneof("method") == "implicitGroupingKeyRequest"
    assert parsed.implicitGroupingKeyRequest.WhichOneof("method") == (
        "removeImplicitKey"
    )


def test_empty_oneof_message_member_survives_roundtrip():
    # Exists() carries zero bytes of payload; only oneof presence says
    # which method was called — losing it would break the protocol.
    call = sm.ValueStateCall(stateName="s", exists=sm.Exists())
    back = sm.ValueStateCall()
    back.ParseFromString(call.SerializeToString())
    assert back.WhichOneof("method") == "exists"
    assert back.stateName == "s"


def test_submessage_autovivify_mutation():
    # The PySpark client pattern: cmd.ttl.durationMs = N on a fresh cmd.
    cmd = sm.StateCallCommand()
    cmd.stateName = "count"
    cmd.ttl.durationMs = 1234
    back = sm.StateCallCommand()
    back.ParseFromString(cmd.SerializeToString())
    assert back.ttl.durationMs == 1234
    # An auto-vivified but untouched submessage must NOT serialize.
    cmd2 = sm.StateCallCommand(stateName="x")
    _ = cmd2.ttl  # read-only access
    assert b"\x22" not in cmd2.SerializeToString()  # no field-4 tag


def test_repeated_bytes_and_repeated_message():
    resp = sm.StateResponseWithListGet(
        statusCode=0, value=[b"a", b"bb", b""], requireNextFetch=True
    )
    back = sm.StateResponseWithListGet()
    back.ParseFromString(resp.SerializeToString())
    assert list(back.value) == [b"a", b"bb", b""]
    assert back.requireNextFetch is True

    it = sm.StateResponseWithMapIterator(statusCode=2)
    it.kvPair.add(key=b"k1", value=b"v1")
    it.kvPair.add(key=b"k2", value=b"v2")
    back2 = sm.StateResponseWithMapIterator()
    back2.ParseFromString(it.SerializeToString())
    assert [(p.key, p.value) for p in back2.kvPair] == [
        (b"k1", b"v1"),
        (b"k2", b"v2"),
    ]


def test_enum_module_constants_and_wrapper():
    assert sm.PRE_INIT == 0
    assert sm.CLOSED == 5
    assert sm.HandleState.Name(2) == "INITIALIZED"
    assert sm.HandleState.Value("DATA_PROCESSED") == 3


def test_unknown_fields_skipped():
    # field 15 varint (unknown to StateResponse) + known statusCode
    raw = b"\x78\x07" + b"\x08\x05"
    msg = sm.StateResponse()
    msg.ParseFromString(raw)
    assert msg.statusCode == 5


def test_proto3_optional_presence():
    t = sm.TimerInfo(key=b"", timestampMs=9)
    back = sm.TimerInfo()
    back.ParseFromString(t.SerializeToString())
    assert back.HasField("key")
    t2 = sm.TimerInfo(timestampMs=9)
    back2 = sm.TimerInfo()
    back2.ParseFromString(t2.SerializeToString())
    assert not back2.HasField("key")


def test_nested_request_matches_handwritten_encoding():
    # StateRequest{version=2, statefulProcessorCall{getValueState{
    #   stateName="c", schema="s"}}} — assembled by hand from the wire
    # rules: every layer is tag(field,LEN) + len + payload.
    inner = b"\x0a\x01c" + b"\x12\x01s"  # stateName, schema
    call = b"\x12" + bytes([len(inner)]) + inner  # getValueState = field 2
    outer = b"\x08\x02" + b"\x12" + bytes([len(call)]) + call
    req = sm.StateRequest(
        version=2,
        statefulProcessorCall=sm.StatefulProcessorCall(
            getValueState=sm.StateCallCommand(stateName="c", schema="s")
        ),
    )
    assert req.SerializeToString() == outer
