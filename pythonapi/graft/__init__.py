"""graft — minimal Python client for the graft server.

Mirrors the reference engine's embedded Python API shape (reference
src/python/mod.rs:14-60: ``open()`` a database, ``query()`` SQL, get rows
back as a list), with zero dependencies beyond the standard library.
Two wire options against the same auto-detecting server port:

    import graft
    db = graft.open("localhost:5433")      # line protocol, string fields
    rows = db.query("select 1 as x")       # -> [["1"]]
    db.close()

    db = graft.open(port=5433, wire="pg")  # Postgres protocol, TYPED rows
    db.query("select 1, 1=1, null")        # -> [[1, True, None]]

Connection-oriented rather than embedded: the JVM/Spark engine runs in
``sbt "runMain graft.Server"`` (or any long-lived deployment) and any number
of Python clients attach — the same topology as the reference's pgwire
clients. For an EMBEDDED Python surface (no server), use PySpark directly:
``tools/pyspark_smoke.py`` drives the identical engine in-process via py4j.

Values arrive as the server's text rendering (one line per row, fields
tab-separated). ``query`` keeps them as strings — callers that want types
know their schema; ``NULL`` stays the string the server prints.
"""
from __future__ import annotations

import socket


class Error(Exception):
    """Server-reported statement failure (the ``ERR`` terminator line)."""


class Database:
    """One server connection; statements run sequentially on it."""

    def __init__(self, host: str, port: int, timeout: float = 120.0):
        self._sock = socket.create_connection((host, port), timeout=timeout)
        self._buf = b""

    def _readline(self) -> str:
        while b"\n" not in self._buf:
            chunk = self._sock.recv(65536)
            if not chunk:
                raise Error("connection closed by server")
            self._buf += chunk
        line, self._buf = self._buf.split(b"\n", 1)
        return line.decode("utf-8")

    def query(self, sql: str) -> list[list[str]]:
        """Run one statement; return rows as lists of rendered fields.

        DDL/DML return ``[]``. Raises :class:`Error` on an ``ERR`` reply.
        """
        stmt = sql.strip()
        if not stmt.startswith("\\") and not stmt.endswith(";"):
            stmt += ";"
        self._sock.sendall((stmt + "\n").encode("utf-8"))
        rows: list[list[str]] = []
        while True:
            line = self._readline()
            if line.startswith("OK "):
                return rows
            if line.startswith("ERR "):
                raise Error(line[4:])
            if line.startswith(" "):
                # server space-stuffs data lines that could read as a
                # terminator (or that start with a space); drop one space
                line = line[1:]
            rows.append(line.split("\t"))

    # the reference calls this surface `query` only; execute is a
    # convention-friendly alias for DDL/DML call sites
    execute = query

    def close(self) -> None:
        try:
            self._sock.sendall(b"\\q\n")
        except OSError:
            pass
        self._sock.close()

    def __enter__(self) -> "Database":
        return self

    def __exit__(self, *exc) -> None:
        self.close()


class PgDatabase:
    """Postgres-wire connection with TYPED rows — the closer analogue of
    the reference's embedded module (pyo3 returns Python ints/floats/bools,
    not strings). Speaks the v3 simple-query protocol with only the
    standard library; values convert by the RowDescription type OID:
    bool → bool, int2/4/8 → int, float4/8 + numeric → float, everything
    else (text, dates, arrays' text rendering) stays str. NULL → None.
    """

    _INT_OIDS = {20, 21, 23}
    _FLOAT_OIDS = {700, 701, 1700}

    def __init__(self, host: str, port: int, timeout: float = 120.0):
        import struct

        self._struct = struct
        self._sock = socket.create_connection((host, port), timeout=timeout)
        self._buf = b""
        params = b"user\x00graft\x00database\x00graft\x00\x00"
        self._sock.sendall(struct.pack(">ii", 8 + len(params), 196608) + params)
        for tag, body in self._messages():  # drain startup until ReadyForQuery
            if tag == b"E":
                raise Error(self._err(body))
            if tag == b"Z":
                break

    def _recv(self, n: int) -> bytes:
        while len(self._buf) < n:
            chunk = self._sock.recv(65536)
            if not chunk:
                raise Error("connection closed by server")
            self._buf += chunk
        out, self._buf = self._buf[:n], self._buf[n:]
        return out

    def _messages(self):
        while True:
            tag = self._recv(1)
            (length,) = self._struct.unpack(">i", self._recv(4))
            yield tag, self._recv(length - 4)

    @staticmethod
    def _err(body: bytes) -> str:
        # ErrorResponse: \x53severity\0 \x4dmessage\0 ... \0
        for field in body.split(b"\x00"):
            if field[:1] == b"M":
                return field[1:].decode("utf-8", "replace")
        return "server error"

    def _parse_oids(self, body: bytes) -> list[int]:
        (nf,) = self._struct.unpack(">h", body[:2])
        oids, pos = [], 2
        for _ in range(nf):
            end = body.index(b"\x00", pos)
            (oid,) = self._struct.unpack(">i", body[end + 7:end + 11])
            oids.append(oid)
            pos = end + 19
        return oids

    def _decode_row(self, body: bytes, oids: list[int]) -> list:
        (nf,) = self._struct.unpack(">h", body[:2])
        row, pos = [], 2
        for i in range(nf):
            (n,) = self._struct.unpack(">i", body[pos:pos + 4])
            pos += 4
            if n < 0:
                row.append(None)
                continue
            text = body[pos:pos + n].decode("utf-8")
            pos += n
            oid = oids[i] if i < len(oids) else 25
            if oid == 16:
                row.append(text == "t")
            elif oid in self._INT_OIDS:
                row.append(int(text))
            elif oid in self._FLOAT_OIDS:
                row.append(float(text))
            else:
                row.append(text)
        return row

    def query(self, sql: str) -> list[list]:
        self._sock.sendall(
            b"Q" + self._struct.pack(">i", 5 + len(sql.encode("utf-8")))
            + sql.encode("utf-8") + b"\x00")
        rows: list[list] = []
        oids: list[int] = []
        error = None
        for tag, body in self._messages():
            if tag == b"T":
                oids = self._parse_oids(body)
            elif tag == b"D":
                rows.append(self._decode_row(body, oids))
            elif tag == b"E":
                error = self._err(body)
            elif tag == b"Z":
                if error is not None:
                    raise Error(error)
                return rows
        raise Error("connection closed mid-query")

    execute = query

    def cursor(self, sql: str, fetch_size: int = 256):
        """Iterate a query's rows INCREMENTALLY via extended-protocol
        partial fetch (Execute maxRows → PortalSuspended → re-Execute):
        only ``fetch_size`` rows are in flight at a time, so a result far
        bigger than client memory streams through — the same conversation
        pgJDBC has with ``setFetchSize``. Yields typed rows like
        :meth:`query`. The portal is cleaned up (Sync) when iteration
        finishes, errors, or the generator is closed early.
        """
        s = self._struct

        def frame(tag: bytes, payload: bytes) -> bytes:
            return tag + s.pack(">i", 4 + len(payload)) + payload

        def sync_and_drain():
            self._sock.sendall(frame(b"S", b""))
            err = None
            for tag, body in self._messages():
                if tag == b"E":
                    err = self._err(body)
                if tag == b"Z":
                    return err

        enc = sql.encode("utf-8")
        self._sock.sendall(
            frame(b"P", b"\x00" + enc + b"\x00" + s.pack(">h", 0))
            + frame(b"B", b"\x00\x00" + s.pack(">hhh", 0, 0, 0))
            + frame(b"D", b"P\x00") + frame(b"H", b""))
        oids: list[int] = []
        synced = False
        try:
            # expect ParseComplete, BindComplete, RowDescription | NoData
            while True:
                tag, body = next(self._messages())
                if tag == b"E":
                    synced = True
                    sync_and_drain()
                    raise Error(self._err(body))
                if tag == b"T":
                    oids = self._parse_oids(body)
                    break
                if tag == b"n":
                    break
            while True:
                self._sock.sendall(
                    frame(b"E", b"\x00" + s.pack(">i", fetch_size))
                    + frame(b"H", b""))
                outcome = None
                for tag, body in self._messages():
                    if tag == b"D":
                        yield self._decode_row(body, oids)
                    elif tag in (b"s", b"C"):
                        outcome = tag
                        break
                    elif tag == b"E":
                        synced = True
                        err = self._err(body)
                        sync_and_drain()
                        raise Error(err)
                if outcome == b"C":
                    break
            synced = True
            err = sync_and_drain()
            if err is not None:
                raise Error(err)
        finally:
            if not synced:  # generator closed early: resync the session
                sync_and_drain()

    def copy_rows(self, table: str, rows) -> int:
        """Bulk-load ``rows`` (iterables of values) into ``table`` through
        the COPY FROM STDIN subprotocol in TEXT format — the same wire
        conversation ``psql \\copy`` / psycopg's ``copy_expert`` have, and
        the fastest way to push data in. Values render as pg TEXT: None →
        ``\\N``, bools → t/f, everything else ``str()`` with backslash/
        tab/newline/CR escaped. Returns the server's row count.
        """
        s = self._struct

        def field(v) -> str:
            if v is None:
                return "\\N"
            if v is True:
                return "t"
            if v is False:
                return "f"
            return (str(v).replace("\\", "\\\\").replace("\t", "\\t")
                    .replace("\n", "\\n").replace("\r", "\\r"))

        sql = f"copy {table} from stdin (format text)"
        self._sock.sendall(
            b"Q" + s.pack(">i", 5 + len(sql.encode())) + sql.encode() + b"\x00")
        # expect CopyInResponse (or an error before it)
        for tag, body in self._messages():
            if tag == b"E":
                # drain to ReadyForQuery, then surface the error
                err = self._err(body)
                for t2, _ in self._messages():
                    if t2 == b"Z":
                        raise Error(err)
            if tag == b"G":
                break
        buf = bytearray()
        for row in rows:
            buf += ("\t".join(field(v) for v in row) + "\n").encode("utf-8")
            if len(buf) >= 65536:
                self._sock.sendall(b"d" + s.pack(">i", 4 + len(buf)) + bytes(buf))
                buf.clear()
        if buf:
            self._sock.sendall(b"d" + s.pack(">i", 4 + len(buf)) + bytes(buf))
        self._sock.sendall(b"c" + s.pack(">i", 4))  # CopyDone
        n = 0
        error = None
        for tag, body in self._messages():
            if tag == b"C":
                # tag text: "COPY <n>"
                text = body.rstrip(b"\x00").decode("utf-8")
                n = int(text.rsplit(" ", 1)[-1])
            elif tag == b"E":
                error = self._err(body)
            elif tag == b"Z":
                if error is not None:
                    raise Error(error)
                return n
        raise Error("connection closed mid-COPY")

    def close(self) -> None:
        try:
            self._sock.sendall(b"X" + self._struct.pack(">i", 4))
        except OSError:
            pass
        self._sock.close()

    def __enter__(self) -> "PgDatabase":
        return self

    def __exit__(self, *exc) -> None:
        self.close()


def open(addr: str = "localhost:5433", port: int | None = None,
         wire: str = "line"):
    """Open a connection: ``open("host:port")``, ``open(port=5433)``.

    ``wire="line"`` (default) returns the string-rendering line-protocol
    :class:`Database`; ``wire="pg"`` returns the typed Postgres-protocol
    :class:`PgDatabase` on the same port (the server auto-detects).
    """
    if port is None:
        host, _, p = addr.rpartition(":")
        host, port = host or "localhost", int(p)
    else:
        host = "localhost"
    return PgDatabase(host, port) if wire == "pg" else Database(host, port)


if __name__ == "__main__":
    import sys

    db = open(port=int(sys.argv[1]))
    try:
        for stmt in sys.argv[2:]:
            for row in db.query(stmt):
                print("\t".join(row))
            print("--")
    finally:
        db.close()
