"""Kafka/Zmq/mail event handlers (reference events/KafkaEventHandler.py,
ZmqEventHandler.py, DefaultMailNotificationEventHandler.py) — wire
framing, payload gating and the pooling/backoff state machine driven
through injectable fake transports (client libs absent in-container)."""

import json

import pytest
import ray.data as rd

from logdata_anomaly_miner_ray.schema import violations_table
from logdata_anomaly_miner_ray.stages.sinks import (
    KafkaEventSink,
    MailNotificationSink,
    ZmqEventSink,
    write_queue_sink,
)


class FakeProducer:
    def __init__(self, fail=False):
        self.sent = []
        self.closed = False
        self.fail = fail

    def send(self, topic, value):
        if self.fail:
            raise RuntimeError("broker down")
        self.sent.append((topic, value))

    def close(self):
        self.closed = True


class FakeZmqSocket:
    def __init__(self, fail=False):
        self.frames = []
        self.disconnected = False
        self.fail = fail

    def send_string(self, s, flags=0):
        if self.fail:
            raise RuntimeError("no peer")
        self.frames.append((s, flags))

    def disconnect(self):
        self.disconnected = True


def test_kafka_sink_semantics():
    prod = FakeProducer()
    sink = KafkaEventSink("anomalies", producer_factory=lambda: prod)
    assert sink.send('{"a":1}') is True
    assert prod.sent == [("anomalies", '{"a":1}')]
    # non-string payload rejected (reference: use JsonConverterHandler)
    assert sink.send({"a": 1}) is False
    assert len(prod.sent) == 1
    # producer error -> close + reset, next send reconnects
    prod.fail = True
    assert sink.send("x") is False
    assert prod.closed and sink.producer is None
    prod2 = FakeProducer()
    sink._factory = lambda: prod2
    assert sink.send("y") is True
    assert prod2.sent == [("anomalies", "y")]


def test_kafka_sink_missing_client(capsys):
    def factory():
        raise ImportError("no kafka")

    sink = KafkaEventSink("t", producer_factory=factory)
    assert sink.send("x") is False
    assert "Kafka module not found" in capsys.readouterr().err


def test_zmq_sink_topic_framing():
    sock = FakeZmqSocket()
    sink = ZmqEventSink(topic="aminer", socket_factory=lambda: sock)
    assert sink.send('{"b":2}') is True
    # topic frame first with SNDMORE, then the payload frame
    assert sock.frames == [("aminer", ZmqEventSink.SNDMORE), ('{"b":2}', 0)]
    # no topic -> single frame
    sock2 = FakeZmqSocket()
    sink2 = ZmqEventSink(socket_factory=lambda: sock2)
    assert sink2.send("p") is True
    assert sock2.frames == [("p", 0)]
    # error -> disconnect + reset
    sock.fail = True
    assert sink.send("z") is False
    assert sock.disconnected and sink.producer is None


def test_write_queue_sink_streams_json(ray_session):
    t = violations_table("C", "m", ["k1", "k2"], ["p"], [["v1"], ["v2"]], "")
    prod = FakeProducer()
    n = write_queue_sink(
        rd.from_arrow(t), KafkaEventSink("topic", producer_factory=lambda: prod)
    )
    assert n == 2 and len(prod.sent) == 2
    doc = json.loads(prod.sent[0][1])
    assert "AnalysisComponent" in doc  # JsonConverterHandler shape


class Clock:
    def __init__(self, t=1000.0):
        self.t = t

    def __call__(self):
        return self.t


def _mk_mail(clock, **kw):
    sent = []
    sink = MailNotificationSink(
        "ops@example.com", "aminer@localhost",
        transport=lambda s, r, m: sent.append((s, r, m)),
        clock=clock, **kw,
    )
    return sink, sent


def test_mail_grace_time_drops_events():
    clock = Clock(1000.0)
    sink, sent = _mk_mail(clock, alert_grace_time=50, event_collect_time=0)
    sink.receive_event("early\n")
    assert sink.events_collected == 0 and not sent
    clock.t = 1051.0  # grace elapsed
    sink.receive_event("later\n")
    assert sent and "later" in sent[0][2]


def test_mail_collect_window_pools_then_sends():
    clock = Clock(1000.0)
    sink, sent = _mk_mail(clock, event_collect_time=10)
    sink.receive_event("e1")
    sink.receive_event("e2")
    assert not sent  # still inside the collect window
    clock.t = 1010.0
    sink.do_timer(clock.t)
    assert len(sent) == 1
    s, r, msg = sent[0]
    assert s == "aminer@localhost" and r == "ops@example.com"
    assert msg.startswith("From: aminer@localhost\nTo: ops@example.com\nSubject: ")
    assert "aminer Alerts: Collected Events" in msg
    assert "e1\ne2\n" in msg


def test_mail_alert_gap_backoff_and_reset():
    clock = Clock(1000.0)
    sink, sent = _mk_mail(clock, event_collect_time=0, min_alert_gap=100,
                          max_alert_gap=1000)
    sink.receive_event("a")  # collect_time=0 -> sends immediately
    assert len(sent) == 1 and sink.last_alert_time == 1000.0
    # event arrives BEFORE the gap elapsed: pooled, gap backs off 1.5x
    clock.t = 1050.0
    sink.receive_event("b")
    assert len(sent) == 1
    assert sink.current_alert_gap == 150.0
    assert sink.next_alert_time == 1100.0  # last_alert + previous gap
    clock.t = 1100.0
    sink.do_timer(clock.t)
    assert len(sent) == 2
    assert "in the last 100.0 seconds" in sent[1][2]
    # a QUIET gap resets the backoff to min_alert_gap
    clock.t = 5000.0
    sink.receive_event("c")
    assert len(sent) == 3 and sink.current_alert_gap == 100.0


def test_mail_max_events_per_message_caps_pool():
    clock = Clock(1000.0)
    sink, sent = _mk_mail(clock, event_collect_time=10, max_events_per_message=3)
    for i in range(5):
        sink.receive_event(f"e{i}")
    clock.t = 1010.0
    sink.do_timer(clock.t)
    body = sent[0][2].split("\n\n", 1)[1]
    assert body.strip().split("\n") == ["e0", "e1", "e2"]


def test_mail_address_validation():
    with pytest.raises(ValueError):
        MailNotificationSink("not-an-email", "aminer@localhost",
                             transport=lambda *a: None)
