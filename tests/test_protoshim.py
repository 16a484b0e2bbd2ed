"""Unit tests for the vendored protobuf shim
(duckdb_sudan__spark/vendor/protoshim) — the wire subset that lets
transformWithStateInPandas execute without the protobuf wheel.

The integration proof is test_sources_streaming.py::
test_funnel_tws_matches_applyinpandas_and_batch (the JVM parses every
byte the shim emits, and vice versa); these tests pin the wire-format
invariants directly so a shim regression fails fast and locally.
"""

from __future__ import annotations

import os
import sys

import pytest

SHIM = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "duckdb_sudan__spark",
    "vendor",
    "protoshim",
)

try:  # run these tests against whichever runtime the gate would pick
    import google.protobuf  # noqa: F401
except ImportError:
    sys.path.insert(0, SHIM)

sm = pytest.importorskip("pyspark.sql.streaming.proto.StateMessage_pb2")


def test_varint_wire_bytes_match_spec():
    from google.protobuf import _wire

    # worked examples from the public encoding guide
    assert _wire.encode_varint(1) == b"\x01"
    assert _wire.encode_varint(150) == b"\x96\x01"
    assert _wire.decode_varint(b"\x96\x01", 0) == (150, 2)
    # negative int64 is a 10-byte two's-complement varint
    assert len(_wire.encode_varint(-1)) == 10
    assert _wire.to_signed(_wire.decode_varint(_wire.encode_varint(-1), 0)[0], 64) == -1


def test_set_handle_state_exact_bytes():
    """field 2 (statefulProcessorCall) { field 1 (setHandleState)
    { field 1 (state) = 2 } } — hand-computed wire bytes."""
    m = sm.StateRequest(
        statefulProcessorCall=sm.StatefulProcessorCall(
            setHandleState=sm.SetHandleState(state=sm.INITIALIZED)
        )
    )
    assert m.SerializeToString() == bytes.fromhex("12040a020802")


def test_proto3_default_scalars_are_skipped():
    assert sm.StateResponse(statusCode=0, errorMessage="", value=b"").SerializeToString() == b""
    assert sm.ListStatePut(fetchWithArrow=False).SerializeToString() == b""


def test_oneof_member_set_clears_siblings():
    req = sm.StateRequest(
        statefulProcessorCall=sm.StatefulProcessorCall(setHandleState=sm.SetHandleState())
    )
    req.implicitGroupingKeyRequest = sm.ImplicitGroupingKeyRequest(
        removeImplicitKey=sm.RemoveImplicitKey()
    )
    assert not req.HasField("statefulProcessorCall")
    assert req.HasField("implicitGroupingKeyRequest")
    # reading an unset oneof member must NOT clear the set one
    _ = req.statefulProcessorCall
    assert req.HasField("implicitGroupingKeyRequest")


def test_nested_mutation_marks_presence():
    """The pyspark client idiom: cmd.ttl.durationMs = n must serialize
    the ttl submessage."""
    cmd = sm.StateCallCommand()
    cmd.stateName = "s"
    cmd.ttl.durationMs = 5000
    out = sm.StateCallCommand()
    out.ParseFromString(cmd.SerializeToString())
    assert out.ttl.durationMs == 5000
    assert out.stateName == "s"


def test_repeated_message_and_optional_bytes_roundtrip():
    t = sm.StateResponseWithTimer(
        statusCode=1,
        timer=[sm.TimerInfo(timestampMs=123), sm.TimerInfo(key=b"k", timestampMs=-456)],
        requireNextFetch=True,
    )
    out = sm.StateResponseWithTimer()
    out.ParseFromString(t.SerializeToString())
    assert [(ti.key, ti.timestampMs) for ti in out.timer] == [(b"", 123), (b"k", -456)]
    assert out.requireNextFetch is True


def test_repeated_bytes_roundtrip():
    p = sm.ListStatePut(value=[b"a", b"", b"ccc"], fetchWithArrow=True)
    out = sm.ListStatePut()
    out.ParseFromString(p.SerializeToString())
    assert list(out.value) == [b"a", b"", b"ccc"]
    assert out.fetchWithArrow is True


def test_unknown_fields_are_skipped():
    from google.protobuf import _wire

    payload = (
        _wire.encode_tag(1, 0)
        + _wire.encode_varint(7)  # statusCode = 7
        + _wire.encode_length_delimited(99, b"future-field")  # unknown
        + _wire.encode_tag(98, 0)
        + _wire.encode_varint(5)  # unknown varint
    )
    m = sm.StateResponse()
    m.ParseFromString(payload)
    assert m.statusCode == 7


def test_unicode_string_field_roundtrip():
    c = sm.StateCallCommand(stateName="حالة-状態")
    out = sm.StateCallCommand()
    out.ParseFromString(c.SerializeToString())
    assert out.stateName == "حالة-状態"
