"""Output sinks and violation post-processing.

Clean-room recasts:
- ``write_csv_projection`` — MatchValueStreamWriter (reference:
  aminer/analysis/MatchValueStreamWriter.py:21-104): AMiner's only
  columnar projection sink (selected paths → CSV stream) becomes
  ``select_columns`` + partitioned ``write_csv``.
- ``score_violations`` — ScoringEventHandler (reference:
  aminer/events/ScoringEventHandler.py:24-117): post-process the
  violations dataset with confidence scores; here the score is the
  rarity of each violation's (check, key-prefix) combination
  (auto-weights analogue: rarer phenomena score higher).
- ``render_event_text`` — StreamPrinterEventHandler text format
  (reference: aminer/events/EventData.py:49-78): canonical
  human-readable rendering of a violation row for golden-output
  comparisons.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data


def write_csv_projection(
    ds: "ray.data.Dataset", paths: list[str], out_dir: str
) -> str:
    """Project selected 'paths' (columns) and stream to CSV files."""
    ds.select_columns(paths).write_csv(out_dir)
    return out_dir


def score_violations(
    violations: "ray.data.Dataset", score_name: str = "confidence"
) -> "ray.data.Dataset":
    """Append a [0,1] confidence score: the self-information of each
    violation's (event_type) frequency among all violations,
    normalized — rarer checks firing → higher score."""
    counts = _counts(violations)
    total = max(sum(counts.values()), 1)
    import math

    info = {k: -math.log(max(v / total, 1e-12)) for k, v in counts.items()}
    max_info = max(info.values()) if info else 1.0
    weights = {k: v / max_info if max_info > 0 else 1.0 for k, v in info.items()}

    def add(batch: pa.Table) -> pa.Table:
        et = batch["event_type"].to_pylist()
        s = [float(weights.get(e, 1.0)) for e in et]
        return batch.append_column(score_name, pa.array(s, pa.float64()))

    return violations.map_batches(
        add, batch_format="pyarrow", batch_size=None, zero_copy_batch=True
    )


def score_violations_weighted(
    violations: "ray.data.Dataset",
    weights: dict[str, float] | None = None,
    auto_weights: bool = False,
    score_name: str = "confidence",
) -> "ray.data.Dataset":
    """Per-value confidence scoring — the ScoringEventHandler's TWO
    modes (reference: aminer/events/ScoringEventHandler.py:24-117):

    - fixed ``weights``: each of a violation's affected values gets
      its configured weight, default 0.5 when absent;
    - ``auto_weights``: weight(value) = 10 / (10 + appearances of
      the value across the violation set) — rarer values score
      higher (the reference counts a rolling 1000-anomaly history, a
      streaming artifact; the batch analogue counts the whole set —
      callers wanting a window pre-filter by ts).

    Appends ``confidence_absolut`` (sum over the row's affected
    values) and ``<score_name>`` (the mean), matching the reference's
    confidence_absolut/confidence_mean output fields."""
    value_counts: dict[str, int] = {}
    if auto_weights:
        import pandas as _pd

        def vc_partial(t: pa.Table) -> pa.Table:
            vals = [v for row in t["affected_values"].to_pylist() for v in row]
            s = _pd.Series(vals, dtype=object).value_counts()
            return pa.table(
                {"v": pa.array(s.index.astype(str)), "__pn": pa.array(s.to_numpy(np.int64))}
            )

        from ray.data.aggregate import Sum as _Sum

        vc = (
            violations.map_batches(vc_partial, batch_format="pyarrow", batch_size=None, zero_copy_batch=True)
            .groupby("v")
            .aggregate(_Sum("__pn", alias_name="n"))
            .to_pandas()
        )
        if not vc.empty:
            value_counts = dict(zip(vc["v"], vc["n"].astype(int)))

    def weight(v: str) -> float:
        if weights is not None and v in weights:
            return float(weights[v])
        if not auto_weights:
            return 0.5
        return 10.0 / (10.0 + value_counts.get(v, 0))

    def add(batch: pa.Table) -> pa.Table:
        avs = batch["affected_values"].to_pylist()
        absolut = [sum(weight(v) for v in row) for row in avs]
        mean = [a / max(len(row), 1) for a, row in zip(absolut, avs)]
        return batch.append_column(
            "confidence_absolut", pa.array(absolut, pa.float64())
        ).append_column(score_name, pa.array(mean, pa.float64()))

    return violations.map_batches(
        add, batch_format="pyarrow", batch_size=None, zero_copy_batch=True
    )


def syslog_chunk_lines(event_id: int, text: str, max_len: int = 800) -> list[str]:
    """The reference SyslogWriterEventHandler's line protocol
    (aminer/events/SyslogWriterEventHandler.py:63-80): each event's
    rendered text is split on newlines, every line is broken into
    ``max_len``-char chunks, and chunks carry ``[id]`` (first) /
    ``[id-serial]`` (continuations) prefixes so multi-line events can
    be reassembled from an interleaved syslog."""
    out: list[str] = []
    serial = 0
    for data_line in text.strip().split("\n"):
        while data_line:
            if serial == 0:
                out.append(f"[{event_id}] {data_line[:max_len]}")
            else:
                out.append(f"[{event_id}-{serial}] {data_line[:max_len]}")
            data_line = data_line[max_len:]
            serial += 1
    return out


def write_syslog_sink(
    violations: "ray.data.Dataset",
    target: str,
    instance_name: str = "aminer",
    max_len: int = 800,
) -> int:
    """Syslog-style sink for the violations dataset — the reference's
    SyslogWriterEventHandler recast (SyslogWriterEventHandler.py:
    23-80): events are rendered with ``render_event_text`` and
    emitted through the ``[id]``/``[id-serial]`` chunking protocol.

    ``target``: a filesystem path ending in ``.log`` appends lines to
    that file; any other path is treated as an AF_UNIX datagram
    socket (the transport /dev/log actually is — stdlib ``syslog``
    needs a live daemon, so the socket/file transports keep the
    protocol testable in-container). Event ids are assigned in the
    dataset's iteration order on the single writer — a syslog is a
    serial sink by nature (same caveat the reference documents);
    bulk output belongs in ``write_parquet``. Returns #lines."""
    import socket as _socket

    use_file = target.endswith(".log")
    sock = None
    fh = None
    if use_file:
        fh = open(target, "a", encoding="utf-8")
    else:
        sock = _socket.socket(_socket.AF_UNIX, _socket.SOCK_DGRAM)
        sock.connect(target)
    n = 0
    try:
        event_id = 0
        for batch in violations.iter_batches(batch_size=1024, batch_format="pandas"):
            for _, row in batch.iterrows():
                text = render_event_text(row.to_dict())
                for line in syslog_chunk_lines(event_id, text, max_len):
                    msg = f"{instance_name}: {line}"
                    if fh is not None:
                        fh.write(msg + "\n")
                    else:
                        sock.send(msg.encode())
                    n += 1
                event_id += 1
    finally:
        if fh is not None:
            fh.close()
        if sock is not None:
            sock.close()
    return n


def _counts(ds: "ray.data.Dataset") -> dict[str, int]:
    out: dict[str, int] = {}
    for b in ds.map_batches(
        lambda t: t.select(["event_type"]),
        batch_format="pyarrow",
        batch_size=None,
        zero_copy_batch=True,
    ).iter_batches(batch_format="pyarrow"):
        for sv in b["event_type"].value_counts():
            out[sv["values"].as_py()] = out.get(sv["values"].as_py(), 0) + sv["counts"].as_py()
    return out


def render_event_text(row: dict) -> str:
    """Canonical text rendering of one violation row (the
    StreamPrinterEventHandler golden-output shape)."""
    vals = ", ".join(
        f"{p}: {v}" for p, v in zip(row.get("affected_paths", []), row.get("affected_values", []))
    )
    return (
        f"{row['event_type']} {row['message']}\n"
        f"  key: {row.get('key', '')}\n"
        f"  affected: [{vals}]\n"
        f"  expected: {row.get('expected', '')}\n"
    )


def render_event_json(
    row: dict,
    component_id: int = 0,
    component_name: str | None = None,
    pretty_print: bool = False,
) -> str:
    """JsonConverterHandler-shaped JSON rendering of one violation
    row (reference: aminer/events/JsonConverterHandler.py:36-120):
    ``AnalysisComponent`` carries identifier / type / name / message
    / affected paths+values (type = the class part of
    ``Analysis.<Class>``), ``LogData`` carries the key as the raw
    line with its timestamp and line count. Deterministic (no
    DetectionTimestamp wall-clock field — a batch engine's outputs
    must be replayable; callers wanting it can inject one)."""
    import json as _json

    et = row["event_type"]
    cls = et.split(".", 1)[1] if "." in et else et
    ts = row.get("ts")
    if ts is not None and not isinstance(ts, (int, float)) and pd.isna(ts):
        ts = None  # pandas NaT has .timestamp but raises on it
    if ts is not None and hasattr(ts, "timestamp"):
        ts = round(ts.timestamp(), 2)
    doc = {
        "AnalysisComponent": {
            "AnalysisComponentIdentifier": component_id,
            "AnalysisComponentType": cls,
            "AnalysisComponentName": component_name or cls,
            "Message": row.get("message", ""),
            "AffectedLogAtomPaths": list(row.get("affected_paths", [])),
            "AffectedLogAtomValues": list(row.get("affected_values", [])),
        },
        "LogData": {
            "RawLogData": [row.get("key", "")],
            "Timestamps": [ts] if ts is not None else [],
            "LogLinesCount": 1,
        },
    }
    if row.get("expected"):
        doc["AnalysisComponent"]["Expected"] = row["expected"]
    if pretty_print:
        return _json.dumps(doc, indent=2, sort_keys=False)
    return _json.dumps(doc, separators=(",", ":"))


def write_json_events(
    violations: "ray.data.Dataset", out_dir: str, component_name: str | None = None
) -> int:
    """Stream the violations dataset to newline-delimited JSON files
    (one per block — the JsonConverterHandler fan-out as a
    partitioned sink). Returns the row count."""
    import pyarrow.dataset  # noqa: F401

    def to_json(batch: pa.Table) -> pa.Table:
        rows = batch.to_pylist()
        return pa.table(
            {"json": pa.array(
                [render_event_json(r, component_id=i, component_name=component_name)
                 for i, r in enumerate(rows)], pa.string()
            )}
        )

    js = violations.map_batches(to_json, batch_format="pyarrow", batch_size=None, zero_copy_batch=True)
    js.write_json(out_dir)
    return js.count()


# ---------------------------------------------------------------------------
# Message-queue + mail event handlers. The client libraries (kafka,
# zmq) and a live SMTP daemon are absent from this container, so each
# handler takes an injectable transport factory; the DEFAULT factory
# import-tries the real client. Everything observable — wire framing,
# payload-type gating, pooling/backoff state machine — is real and
# tested against fake transports.
# ---------------------------------------------------------------------------


class KafkaEventSink:
    """Forward JSON event strings to a Kafka topic — the reference
    KafkaEventHandler recast (events/KafkaEventHandler.py:21-81):
    lazy producer construction on first event (missing client lib →
    False + stderr, never an exception); non-str/bytes payloads are
    REJECTED with the use-JsonConverterHandler warning; a producer
    error closes the producer and returns False (the next event
    reconnects)."""

    def __init__(self, topic: str, options: dict | None = None, producer_factory=None,
                 errors: tuple = None):
        self.topic = topic
        self.options = options or {}
        self.producer = None
        self._factory = producer_factory
        # transport error types that mean "reset producer, return
        # False" — the reference catches only KafkaError
        # (events/KafkaEventHandler.py send branch); a programming
        # error in the payload path must surface, not be swallowed.
        # Injected fakes pass their own error tuple; the real-client
        # default resolves kafka.errors.KafkaError lazily.
        self._errors = errors

    def _transport_errors(self) -> tuple:
        if self._errors is not None:
            return self._errors
        try:
            from kafka.errors import KafkaError  # absent here; injectable

            return (KafkaError,)
        except ImportError:
            return (Exception,)  # fake-transport test path

    def _default_factory(self):
        from kafka import KafkaProducer  # noqa: F401 — absent here; injectable

        return KafkaProducer(**self.options, value_serializer=lambda v: v.encode())

    def send(self, event_data) -> bool:
        import sys as _sys

        if self.producer is None:
            try:
                self.producer = (self._factory or self._default_factory)()
            except ImportError:
                print("ERROR: Kafka module not found.", file=_sys.stderr)
                return False
        if not isinstance(event_data, (str, bytes)):
            print(
                "WARNING: KafkaEventSink received non-string event data. "
                "Use render_event_json to serialize it first.",
                file=_sys.stderr,
            )
            return False
        try:
            self.producer.send(self.topic, event_data)
        except self._transport_errors() as err:
            print(f"Error: {err}", file=_sys.stderr)
            try:
                self.producer.close()
            finally:
                self.producer = None
            return False
        return True


class ZmqEventSink:
    """Forward JSON event strings over a ZeroMQ PUB socket — the
    reference ZmqEventHandler recast (events/ZmqEventHandler.py:22-92):
    lazy bind on first event; optional topic frame sent with SNDMORE
    so subscribers can prefix-filter; non-str payload rejected; a
    send error disconnects and resets so the next event rebinds."""

    SNDMORE = 2  # zmq.SNDMORE flag value (stable public constant)

    def __init__(self, topic: str | None = None, url: str = "ipc:///tmp/aminer",
                 socket_factory=None):
        self.topic = topic
        self.url = url
        self.producer = None
        self._factory = socket_factory

    def _default_factory(self):
        import zmq  # absent here; injectable

        ctx = zmq.Context()
        sock = ctx.socket(zmq.PUB)
        sock.bind(self.url)
        return sock

    def send(self, event_data) -> bool:
        import sys as _sys

        if self.producer is None:
            try:
                self.producer = (self._factory or self._default_factory)()
            except ImportError:
                print("ERROR: ZeroMQ module not found.", file=_sys.stderr)
                return False
        if not isinstance(event_data, (str, bytes)):
            print(
                "WARNING: ZmqEventSink received non-string event data. "
                "Use render_event_json to serialize it first.",
                file=_sys.stderr,
            )
            return False
        try:
            if self.topic:
                self.producer.send_string(self.topic, flags=self.SNDMORE)
            self.producer.send_string(event_data)
        except Exception as err:
            print(f"Error: {err}", file=_sys.stderr)
            try:
                self.producer.disconnect()
            finally:
                self.producer = None
            return False
        return True


def write_queue_sink(violations: "ray.data.Dataset", sink,
                     component_name: str | None = None) -> int:
    """Stream the violations dataset through a KafkaEventSink /
    ZmqEventSink (rendered with ``render_event_json``, the
    JsonConverterHandler step the reference requires before these
    handlers). Queue handlers are serial sinks by nature — bulk
    output belongs in write_parquet/write_json_events. Returns the
    number of ACCEPTED events."""
    n = 0
    i = 0
    for batch in violations.iter_batches(batch_size=1024, batch_format="pandas"):
        for _, row in batch.iterrows():
            if sink.send(render_event_json(row.to_dict(), component_id=i,
                                           component_name=component_name)):
                n += 1
            i += 1
    return n


class MailNotificationSink:
    """Pooled mail alerting — the reference
    DefaultMailNotificationEventHandler state machine recast
    (events/DefaultMailNotificationEventHandler.py:37-179):

    - events during ``alert_grace_time`` after startup are dropped;
    - the first pooled event schedules a send ``event_collect_time``
      later; at most ``max_events_per_message`` texts are pooled;
    - after a send, the next alert must wait ``current_alert_gap``,
      which multiplies by 1.5 (capped at ``max_alert_gap``) whenever
      events arrive before the gap elapses and resets to
      ``min_alert_gap`` once a gap passes quietly;
    - the message is the sendmail-style ``From/To/Subject`` text with
      "in the last N seconds" in the subject of follow-up alerts.

    ``transport(sender, recipient, message)`` is injectable (default
    SMTP to 127.0.0.1:25, the reference's hardcoded transport);
    ``clock`` is injectable for deterministic tests. ``do_timer``
    mirrors the reference's 10-second timer hook."""

    _EMAIL_RE = __import__("re").compile(
        r"(^[a-zA-Z0-9_.+-]+@[a-zA-Z0-9-]+\.[a-zA-Z0-9-]+$)|^[a-zA-Z0-9]+@localhost$"
    )

    def __init__(self, target_address: str, from_address: str,
                 subject_prefix: str = "aminer Alerts:",
                 alert_grace_time: float = 0, event_collect_time: float = 10,
                 min_alert_gap: float = 600, max_alert_gap: float = 600,
                 max_events_per_message: int = 1000,
                 transport=None, clock=None):
        import time as _time

        if not self._EMAIL_RE.match(target_address) or not self._EMAIL_RE.match(from_address):
            raise ValueError("target_address and from_address must be email addresses")
        self.recipient_address = target_address
        self.sender_address = from_address
        self.subject_prefix = subject_prefix
        self.event_collect_time = event_collect_time
        self.min_alert_gap = min_alert_gap
        self.max_alert_gap = max_alert_gap
        self.max_events_per_message = max_events_per_message
        self.clock = clock or _time.time
        self.transport = transport or self._smtp_transport
        self.alert_grace_time_end = (
            self.clock() + alert_grace_time if alert_grace_time > 0 else 0
        )
        self.events_collected = 0
        self.last_alert_time = 0.0
        self.next_alert_time = 0.0
        self.current_alert_gap = min_alert_gap
        self.current_message = ""
        self.sent: int = 0  # messages actually dispatched

    @staticmethod
    def _smtp_transport(sender: str, recipient: str, message: str) -> None:
        from smtplib import SMTP

        smtp = SMTP("127.0.0.1", port=25, timeout=5)
        smtp.sendmail(sender, recipient, message)
        smtp.quit()

    def receive_event(self, event_text: str) -> None:
        now = self.clock()
        if self.alert_grace_time_end != 0:
            if self.alert_grace_time_end >= now:
                return
            self.alert_grace_time_end = 0
        if self.events_collected < self.max_events_per_message:
            self.events_collected += 1
            self.current_message += event_text if event_text.endswith("\n") else event_text + "\n"
        if self.next_alert_time == 0:
            if self.last_alert_time != 0:
                self.next_alert_time = self.last_alert_time + self.current_alert_gap
                if self.next_alert_time < now:
                    # the required gap already elapsed quietly
                    self.current_alert_gap = self.min_alert_gap
                    self.last_alert_time = 0
                    self.next_alert_time = now + self.event_collect_time
                else:
                    self.current_alert_gap = min(
                        self.current_alert_gap * 1.5, self.max_alert_gap
                    )
            else:
                self.next_alert_time = now + self.event_collect_time
        if self.next_alert_time != 0 and now >= self.next_alert_time:
            self.send_notification(now)

    def do_timer(self, trigger_time: float) -> float:
        if self.next_alert_time != 0 and trigger_time >= self.next_alert_time:
            self.send_notification(trigger_time)
        return 10

    def send_notification(self, trigger_time: float) -> None:
        import sys as _sys

        if self.events_collected == 0:
            return
        subject = f"{self.subject_prefix} Collected Events"
        if self.last_alert_time != 0:
            subject += f" in the last {trigger_time - self.last_alert_time} seconds"
        message = (
            f"From: {self.sender_address}\nTo: {self.recipient_address}\n"
            f"Subject: {subject}\n\n{self.current_message}\n"
        )
        try:
            self.transport(self.sender_address, self.recipient_address, message)
            self.sent += 1
        except Exception as e:  # SMTPException with the real transport
            print(e, file=_sys.stderr)
        self.last_alert_time = trigger_time
        self.events_collected = 0
        self.current_message = ""
        self.next_alert_time = 0
