"""Live-tail stream sources: UNIX-socket line ingestion.

Clean-room recast of the reference's socket ingress
(aminer/input/LogStream.py:177-246 UnixSocketLogDataResource — a
``unix://<path>`` AF_UNIX stream read until EOF — fed through
ByteStreamLineAtomizer, aminer/input/ByteStreamLineAtomizer.py:
newline-delimited records, oversized lines truncated with a flag).

Scale note: a socket is a SINGLE serial byte stream, so ingestion is
inherently one reader — the scale path for bulk data is Parquet
(`ray.data.read_parquet`). This source exists for parity with the
reference's live-tail mode: the reader drains the socket into
bounded Arrow record batches and hands them to Ray as a Dataset, so
everything downstream (the whole validate suite) is identical for
tailed and bulk inputs.
"""

from __future__ import annotations

import socket

import pyarrow as pa

import ray.data as rd

DEFAULT_MAX_LINE = 1 << 16


def iter_socket_line_batches(
    path: str,
    batch_rows: int = 4096,
    max_line_bytes: int = DEFAULT_MAX_LINE,
    buffer_size: int = 1 << 16,
):
    """Yield Arrow tables ``(line: binary, truncated: bool)`` from an
    AF_UNIX stream socket until EOF.

    Atomizer semantics (ByteStreamLineAtomizer recast): records are
    split on ``\\n``; a final unterminated chunk at EOF is emitted as
    a record; a line longer than ``max_line_bytes`` is cut there and
    flagged ``truncated`` (the reference emits an "Overlong line
    detected" atom and resynchronizes at the next newline — the
    remainder after the cut likewise starts a new record only after
    the next newline)."""
    sock = socket.socket(socket.AF_UNIX, socket.SOCK_STREAM)
    sock.connect(path)
    buf = bytearray()
    lines: list[bytes] = []
    flags: list[bool] = []
    skipping = False  # inside an overlong line, waiting for newline

    def flush():
        t = pa.table(
            {"line": pa.array(lines, pa.binary()), "truncated": pa.array(flags, pa.bool_())}
        )
        lines.clear()
        flags.clear()
        return t

    try:
        while True:
            chunk = sock.recv(buffer_size)
            if not chunk:
                break
            buf.extend(chunk)
            while True:
                nl = buf.find(b"\n")
                if nl < 0:
                    if skipping:
                        # still inside an overlong line: discard the
                        # remainder so a newline-free stream section
                        # cannot grow the buffer past max_line_bytes
                        del buf[:]
                    elif len(buf) > max_line_bytes:
                        lines.append(bytes(buf[:max_line_bytes]))
                        flags.append(True)
                        skipping = True
                        del buf[:]
                    break
                if skipping:
                    skipping = False
                elif nl > max_line_bytes:
                    lines.append(bytes(buf[:max_line_bytes]))
                    flags.append(True)
                else:
                    lines.append(bytes(buf[:nl]))
                    flags.append(False)
                del buf[: nl + 1]
                if len(lines) >= batch_rows:
                    yield flush()
        if buf and not skipping:
            lines.append(bytes(buf[:max_line_bytes]))
            flags.append(len(buf) > max_line_bytes)
    finally:
        sock.close()
    if lines:
        yield flush()


def read_unix_socket_lines(
    path: str,
    batch_rows: int = 4096,
    max_line_bytes: int = DEFAULT_MAX_LINE,
) -> "rd.Dataset":
    """Drain ``unix://``-style socket ``path`` to EOF and return the
    records as a Dataset of ``(line, truncated)`` rows. The single
    serial reader materializes bounded Arrow batches; downstream
    stages then run distributed as usual."""
    tables = list(iter_socket_line_batches(path, batch_rows, max_line_bytes))
    if not tables:
        return rd.from_arrow(
            pa.table({"line": pa.array([], pa.binary()), "truncated": pa.array([], pa.bool_())})
        )
    return rd.from_arrow(tables)
