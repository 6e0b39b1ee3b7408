"""graft — minimal Python client for the graft server.

Mirrors the reference engine's embedded Python API shape (reference
src/python/mod.rs:14-60: ``open()`` a database, ``query()`` SQL, get rows
back as a list) over the graft server's line protocol, with zero
dependencies beyond the standard library:

    import graft
    db = graft.open("localhost:5433")     # or open(port=5433)
    rows = db.query("select 1 as x")      # -> [["1"]]
    db.close()

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


def open(addr: str = "localhost:5433", port: int | None = None) -> Database:
    """Open a connection: ``open("host:port")``, ``open(port=5433)``."""
    if port is not None:
        return Database("localhost", port)
    host, _, p = addr.rpartition(":")
    return Database(host or "localhost", int(p))


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
