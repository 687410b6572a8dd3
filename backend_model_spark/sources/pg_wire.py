"""Minimal pure-Python PostgreSQL frontend (wire protocol v3).

The reference pipeline lands its cleaned table in Postgres through a
Python DB driver (reference ``pipeline.py:18-22``, psycopg2). This
container ships the Postgres *server* binaries but no Python driver and
no JDBC jar, so the capability is proven with a clean-room client
speaking the published frontend/backend protocol
(https://www.postgresql.org/docs/current/protocol.html): startup +
trust auth, the simple-query cycle, and multi-row INSERT batches.

Scope is deliberately tiny — text format only, trust/unix-socket (or
plain TCP) auth only — because the engine's job is batched ingest and
SQL readback, not a general driver. Each Spark partition opens its own
connection (``foreachPartition``), which is exactly how a distributed
writer fans into a warehouse.
"""

from __future__ import annotations

import socket
import struct

PROTOCOL_V3 = 196608  # 3 << 16


class PgError(RuntimeError):
    pass


def _read_exact(sock: socket.socket, n: int) -> bytes:
    buf = bytearray()
    while len(buf) < n:
        chunk = sock.recv(n - len(buf))
        if not chunk:
            raise PgError("server closed connection mid-message")
        buf.extend(chunk)
    return bytes(buf)


def _parse_error(payload: bytes) -> str:
    # sequence of (code byte, cstring) fields, terminated by \x00
    fields = {}
    i = 0
    while i < len(payload) and payload[i] != 0:
        code = chr(payload[i])
        end = payload.index(b"\x00", i + 1)
        fields[code] = payload[i + 1 : end].decode("utf-8", "replace")
        i = end + 1
    return f"{fields.get('S', 'ERROR')}: {fields.get('M', 'unknown')} ({fields.get('C', '?')})"


class PgConnection:
    """One session on the simple-query protocol.

    ``query`` returns ``(columns, rows)`` with every value as text (or
    None for SQL NULL) — callers cast, matching how the engine treats
    external text formats everywhere else (CSV scan discipline).
    """

    def __init__(self, host: str, user: str, database: str, port: int = 5432):
        if host.startswith("/"):
            self._sock = socket.socket(socket.AF_UNIX, socket.SOCK_STREAM)
            self._sock.connect(f"{host}/.s.PGSQL.{port}")
        else:
            self._sock = socket.create_connection((host, port))
        params = (
            b"user\x00" + user.encode() + b"\x00"
            b"database\x00" + database.encode() + b"\x00\x00"
        )
        pkt = struct.pack("!ii", 8 + len(params), PROTOCOL_V3) + params
        self._sock.sendall(pkt)
        self._drain_until_ready(startup=True)

    def _read_message(self) -> tuple[str, bytes]:
        mtype = _read_exact(self._sock, 1).decode()
        (length,) = struct.unpack("!i", _read_exact(self._sock, 4))
        payload = _read_exact(self._sock, length - 4) if length > 4 else b""
        return mtype, payload

    def _drain_until_ready(self, startup: bool = False):
        """Consume messages until ReadyForQuery; collect rows if any."""
        columns: list[str] = []
        rows: list[tuple] = []
        error: str | None = None
        while True:
            mtype, payload = self._read_message()
            if mtype == "R":  # Authentication*
                (code,) = struct.unpack("!i", payload[:4])
                if code != 0:
                    raise PgError(
                        f"server requested auth method {code}; this minimal "
                        "client only supports trust (AuthenticationOk)"
                    )
            elif mtype == "T":  # RowDescription
                (nfields,) = struct.unpack("!h", payload[:2])
                columns, i = [], 2
                for _ in range(nfields):
                    end = payload.index(b"\x00", i)
                    columns.append(payload[i:end].decode())
                    i = end + 1 + 18  # fixed per-field trailer
            elif mtype == "D":  # DataRow
                (nvals,) = struct.unpack("!h", payload[:2])
                vals, i = [], 2
                for _ in range(nvals):
                    (vlen,) = struct.unpack("!i", payload[i : i + 4])
                    i += 4
                    if vlen == -1:
                        vals.append(None)
                    else:
                        vals.append(payload[i : i + vlen].decode())
                        i += vlen
                rows.append(tuple(vals))
            elif mtype == "E":  # ErrorResponse
                error = _parse_error(payload)
            elif mtype == "Z":  # ReadyForQuery
                if error:
                    raise PgError(error)
                return columns, rows
            # 'S' ParameterStatus, 'K' BackendKeyData, 'C' CommandComplete,
            # 'N' NoticeResponse, 'I' EmptyQueryResponse: no client action

    def query(self, sql: str) -> tuple[list[str], list[tuple]]:
        body = sql.encode() + b"\x00"
        self._sock.sendall(b"Q" + struct.pack("!i", 4 + len(body)) + body)
        return self._drain_until_ready()

    def close(self):
        try:
            self._sock.sendall(b"X" + struct.pack("!i", 4))  # Terminate
        except OSError:
            pass
        self._sock.close()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()


def quote_literal(v) -> str:
    """SQL literal for the batched INSERT text (values are engine-
    generated ints/strings, but quoting stays injection-safe anyway)."""
    if v is None:
        return "NULL"
    if isinstance(v, (int, float)):
        return repr(v)
    return "'" + str(v).replace("'", "''") + "'"
