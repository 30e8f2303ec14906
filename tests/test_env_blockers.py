"""Round-start probes for the two environment-blocked surfaces
(VERDICT r8 #8): keep the guards describing reality. If the sandbox
ever gains a Kafka broker or google.protobuf, these stop skipping and
fail loudly — the signal to light up the real paths that round instead
of letting the guarded code rot.
"""

from __future__ import annotations

import socket

import pytest

KAFKA_HOST, KAFKA_PORT = "localhost", 9092


def _broker_reachable() -> bool:
    try:
        with socket.create_connection((KAFKA_HOST, KAFKA_PORT), timeout=0.5):
            return True
    except OSError:
        return False


@pytest.mark.skipif(
    not _broker_reachable(),
    reason="no Kafka broker at localhost:9092 in this sandbox — the "
    "kafka_stream/kafka_sink builders stay config-surface-only "
    "(streaming/sources.py kafka_stream, streaming/sinks.py)",
)
def test_kafka_broker_now_available(spark):
    # A broker appeared: the config builders must now round-trip for
    # real. Deliberately failing-by-default once reachable so the
    # round that gains a broker wires the end-to-end path.
    from trisk_spark.streaming.sources import kafka_stream

    df = kafka_stream(spark, f"{KAFKA_HOST}:{KAFKA_PORT}", "trisk-probe")
    assert df.isStreaming
    pytest.fail(
        "Kafka broker reachable — promote the builders to a tested "
        "end-to-end produce/consume path this round"
    )


def _has_protobuf() -> bool:
    try:
        import google.protobuf  # noqa: F401

        return True
    except ImportError:
        return False


@pytest.mark.skipif(
    not _has_protobuf(),
    reason="google.protobuf absent — transformWithStateInPandas "
    "substrate stays guarded (streaming/state_tws.py); GroupState "
    "twins carry all tested semantics",
)
def test_tws_substrate_now_available(spark):
    # protobuf appeared: the TWS twins must now run for real.
    from trisk_spark.streaming import state_tws

    assert state_tws.HAS_PROTOBUF
    pytest.fail(
        "google.protobuf importable — run the transformWithStateInPandas "
        "twins against the GroupState suite this round"
    )


def test_guards_match_probes():
    """The import-guard flags must agree with the live probes — a
    drifted guard (e.g. protobuf installed but HAS_PROTOBUF stuck
    False) would silently keep the real path dark."""
    from trisk_spark.streaming import state_tws

    assert state_tws.HAS_PROTOBUF == _has_protobuf()
