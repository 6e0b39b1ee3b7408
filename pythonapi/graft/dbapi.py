"""graft.dbapi — PEP 249 (DB-API 2.0) driver for the graft server.

The standard Python database interface over the pgwire protocol, so the
ecosystem that speaks DB-API — ``pandas.read_sql``, SQLAlchemy raw
connections, ETL scripts written against psycopg's shape — can point at
a graft server without adaptation:

    from graft import dbapi
    con = dbapi.connect("localhost:5433")
    cur = con.cursor()
    cur.execute("select v, s from t where v > %s", (10,))
    print(cur.description)     # (('v', 23, ...), ('s', 25, ...))
    rows = cur.fetchall()      # typed: ints, floats, bools, None

Parameters use ``pyformat`` (``%s`` / ``%(name)s``, psycopg's style) and
bind over the wire: the client rewrites them to ``$n`` outside quoted
regions and ships the values in Bind as text-format pgwire parameters —
the server renders them as SQL literals with its quoting, so values
never concatenate into the statement text client-side.

Row sets fetch INCREMENTALLY through named portals and Execute's maxRows
(PortalSuspended), ``arraysize`` rows per round trip — a cursor over a
huge result holds one batch in memory, and several cursors can be open
on one connection at once (each owns its portal; Sync — which ends the
implicit transaction and destroys portals — is deferred until no cursor
is suspended). Connections default to autocommit (``commit()`` and
``rollback()`` are no-ops — nothing is ever pending); setting
``con.autocommit = False`` switches to the classic DB-API flow: the
first statement after a commit/rollback opens a server transaction
(``BEGIN``), ``commit()``/``rollback()`` end it — ``rollback()`` really
undoes, restoring every touched table to its transaction-start version.

Threads may share the module, not connections (``threadsafety = 1``).
"""
from __future__ import annotations

import datetime as _dt
import time as _time

from . import PgDatabase, Error as _WireError

apilevel = "2.0"
threadsafety = 1
paramstyle = "pyformat"


# ---------------------------------------------------------------- errors
class Warning(Exception):  # noqa: A001 — PEP 249 name
    pass


class Error(Exception):
    pass


class InterfaceError(Error):
    pass


class DatabaseError(Error):
    pass


class DataError(DatabaseError):
    pass


class OperationalError(DatabaseError):
    pass


class IntegrityError(DatabaseError):
    pass


class InternalError(DatabaseError):
    pass


class ProgrammingError(DatabaseError):
    pass


class NotSupportedError(DatabaseError):
    pass


# ------------------------------------------------------ type singletons
class _TypeObject:
    def __init__(self, *oids: int):
        self._oids = set(oids)

    def __eq__(self, other) -> bool:  # description[i][1] == NUMBER
        return other in self._oids or other is self

    def __ne__(self, other) -> bool:
        return not self.__eq__(other)


STRING = _TypeObject(25, 1043, 18)
BINARY = _TypeObject(17)
NUMBER = _TypeObject(16, 20, 21, 23, 700, 701, 1700)
DATETIME = _TypeObject(1082, 1083, 1114, 1184)
ROWID = _TypeObject(26)

Date = _dt.date
Time = _dt.time
Timestamp = _dt.datetime
Binary = bytes


def DateFromTicks(ticks: float) -> _dt.date:
    return _dt.date(*_time.localtime(ticks)[:3])


def TimeFromTicks(ticks: float) -> _dt.time:
    return _dt.time(*_time.localtime(ticks)[3:6])


def TimestampFromTicks(ticks: float) -> _dt.datetime:
    return _dt.datetime(*_time.localtime(ticks)[:6])


# ------------------------------------------------- parameter translation
def _render(v) -> str | None:
    """Python value → pgwire text-format parameter (None = NULL)."""
    if v is None:
        return None
    if v is True:
        return "true"
    if v is False:
        return "false"
    if isinstance(v, (bytes, bytearray, memoryview)):
        return "\\x" + bytes(v).hex()
    if isinstance(v, _dt.datetime):
        return v.isoformat(sep=" ")
    if isinstance(v, (_dt.date, _dt.time)):
        return v.isoformat()
    return str(v)


def _translate(sql: str, params) -> tuple[str, list[str | None]]:
    """Rewrite pyformat markers to ``$n`` outside quotes; order values."""
    mapping = hasattr(params, "keys")
    seq = None if mapping else list(params)
    out: list[str] = []
    values: list[str | None] = []
    i, n, used = 0, len(sql), 0
    in_sq = in_dq = False
    while i < n:
        c = sql[i]
        if in_sq:
            out.append(c)
            if c == "'":
                in_sq = False
            i += 1
        elif in_dq:
            out.append(c)
            if c == '"':
                in_dq = False
            i += 1
        elif c == "'":
            in_sq = True
            out.append(c)
            i += 1
        elif c == '"':
            in_dq = True
            out.append(c)
            i += 1
        elif c == "%" and i + 1 < n:
            nxt = sql[i + 1]
            if nxt == "%":
                out.append("%")
                i += 2
            elif nxt == "s":
                if mapping:
                    raise ProgrammingError(
                        "positional %s marker with a mapping of parameters")
                if used >= len(seq):
                    raise ProgrammingError(
                        f"statement has more %s markers than the "
                        f"{len(seq)} parameters supplied")
                values.append(_render(seq[used]))
                used += 1
                out.append(f"${len(values)}")
                i += 2
            elif nxt == "(":
                end = sql.index(")", i + 2)
                if sql[end + 1:end + 2] != "s":
                    raise ProgrammingError(
                        f"malformed named marker at index {i}")
                if not mapping:
                    raise ProgrammingError(
                        "named %(name)s marker with a sequence of parameters")
                name = sql[i + 2:end]
                if name not in params:
                    raise ProgrammingError(f"missing parameter '{name}'")
                values.append(_render(params[name]))
                out.append(f"${len(values)}")
                i = end + 2
            else:
                out.append(c)
                i += 1
        else:
            out.append(c)
            i += 1
    if not mapping and used < len(seq):
        raise ProgrammingError(
            f"{len(seq)} parameters supplied but only {used} %s markers")
    return "".join(out), values


# -------------------------------------------------------- value decoding
def _parse_timestamp(text: str) -> _dt.datetime:
    fmt = "%Y-%m-%d %H:%M:%S.%f" if "." in text else "%Y-%m-%d %H:%M:%S"
    return _dt.datetime.strptime(text, fmt)


def _convert(text: str, oid: int):
    if oid == 16:
        return text == "t"
    if oid in (20, 21, 23):
        return int(text)
    if oid in (700, 701, 1700):
        return float(text)
    if oid == 17:
        return bytes.fromhex(text[2:]) if text.startswith("\\x") else \
            text.encode("utf-8")
    if oid == 1082:
        return _dt.date.fromisoformat(text)
    if oid in (1114, 1184):
        return _parse_timestamp(text)
    return text


# --------------------------------------------------------------- cursor
class Cursor:
    """One result at a time; fetches stream through a named portal."""

    def __init__(self, con: "Connection", name: str):
        self._con = con
        self._portal = name.encode("ascii")
        self.arraysize = 256
        self.description: tuple | None = None
        self.rowcount = -1
        self._rows: list[list] = []
        self._oids: list[int] = []
        self._done = True
        self._closed = False

    # -- internal wire helpers (single-threaded per connection) --
    def _invalidate(self) -> None:
        """Connection error recovery destroyed the portal server-side."""
        self._done = True
        self._con._suspended.discard(self)

    def _finish_portal(self) -> None:
        """Close this cursor's portal if it is still suspended."""
        if not self._done:
            con = self._con
            con._send(con._frame(b"C", b"P" + self._portal + b"\x00"),
                      con._frame(b"H", b""))
            for tag, body in con._msgs():
                if tag == b"3":
                    break
                if tag == b"E":
                    con._recover(body)
            self._done = True
            con._suspended.discard(self)
            con._sync_if_idle()

    def _pull_batch(self) -> None:
        """One Execute(maxRows) round trip into the row buffer."""
        con = self._con
        con._send(
            con._frame(b"E", self._portal + b"\x00" +
                       con._struct.pack(">i", max(1, self.arraysize))),
            con._frame(b"H", b""))
        fetched = 0
        for tag, body in con._msgs():
            if tag == b"D":
                self._rows.append(
                    con._decode(body, self._oids))
                fetched += 1
            elif tag == b"s":  # PortalSuspended — more remains
                return
            elif tag in (b"C", b"I"):  # CommandComplete | EmptyQuery
                self._done = True
                con._suspended.discard(self)
                text = body.rstrip(b"\x00").decode("utf-8")
                tail = text.rsplit(" ", 1)[-1]
                self.rowcount = int(tail) if tail.isdigit() else -1
                con._sync_if_idle()
                return
            elif tag == b"E":
                con._recover(body)

    # -- PEP 249 surface --
    def execute(self, operation: str, parameters=None) -> "Cursor":
        if self._closed:
            raise InterfaceError("cursor is closed")
        con = self._con
        con._check_open()
        con._maybe_begin(operation)
        self._finish_portal()
        self.description = None
        self.rowcount = -1
        self._rows = []
        self._oids = []
        if parameters is not None:
            operation, values = _translate(operation, parameters)
        else:
            values = []
        s = con._struct
        enc = operation.encode("utf-8")
        bind = bytearray(self._portal + b"\x00\x00" + s.pack(">h", 0))
        bind += s.pack(">h", len(values))
        for v in values:
            if v is None:
                bind += s.pack(">i", -1)
            else:
                b = v.encode("utf-8")
                bind += s.pack(">i", len(b)) + b
        bind += s.pack(">h", 0)  # result formats: all text
        con._send(
            con._frame(b"P", b"\x00" + enc + b"\x00" + s.pack(">h", 0)),
            con._frame(b"B", bytes(bind)),
            con._frame(b"D", b"P" + self._portal + b"\x00"),
            con._frame(b"H", b""))
        for tag, body in con._msgs():
            if tag == b"T":
                cols = con._parse_desc(body)
                self._oids = [oid for _, oid in cols]
                self.description = tuple(
                    (name, oid, None, None, None, None, None)
                    for name, oid in cols)
                break
            if tag == b"n":  # NoData — DDL/DML
                break
            if tag == b"E":
                con._recover(body)
        self._done = False
        con._suspended.add(self)
        self._pull_batch()  # run the statement; first rows / rowcount
        return self

    def executemany(self, operation: str, seq_of_parameters) -> "Cursor":
        total = 0
        counted = False
        for parameters in seq_of_parameters:
            self.execute(operation, parameters)
            if self.rowcount >= 0:
                total += self.rowcount
                counted = True
        self.rowcount = total if counted else -1
        return self

    def fetchone(self):
        while not self._rows and not self._done:
            self._pull_batch()
        return self._rows.pop(0) if self._rows else None

    def fetchmany(self, size: int | None = None) -> list:
        want = self.arraysize if size is None else size
        while len(self._rows) < want and not self._done:
            self._pull_batch()
        out, self._rows = self._rows[:want], self._rows[want:]
        return out

    def fetchall(self) -> list:
        while not self._done:
            self._pull_batch()
        out, self._rows = self._rows, []
        return out

    def __iter__(self):
        return self

    def __next__(self):
        row = self.fetchone()
        if row is None:
            raise StopIteration
        return row

    def setinputsizes(self, sizes) -> None:
        pass

    def setoutputsize(self, size, column=None) -> None:
        pass

    def close(self) -> None:
        if not self._closed:
            if not self._con._closed:
                self._finish_portal()
            self._closed = True

    def __enter__(self) -> "Cursor":
        return self

    def __exit__(self, *exc) -> None:
        self.close()


# ----------------------------------------------------------- connection
class Connection:
    """One pgwire session; autocommit; cursors share it sequentially."""

    # re-exported per PEP 249 optional extension (error classes on the
    # connection) so framework code can catch con.DatabaseError
    Warning, Error, InterfaceError = Warning, Error, InterfaceError
    DatabaseError, DataError = DatabaseError, DataError
    OperationalError, IntegrityError = OperationalError, IntegrityError
    InternalError, ProgrammingError = InternalError, ProgrammingError
    NotSupportedError = NotSupportedError

    def __init__(self, host: str, port: int, timeout: float = 120.0):
        try:
            self._pg = PgDatabase(host, port, timeout=timeout)
        except (OSError, _WireError) as e:
            raise OperationalError(str(e)) from e
        self._struct = self._pg._struct
        self._closed = False
        self._seq = 0
        self._suspended: set[Cursor] = set()
        self._autocommit = True
        self._in_txn = False
        self._isolation: "str | None" = None

    # -- wire plumbing shared by cursors --
    def _frame(self, tag: bytes, payload: bytes) -> bytes:
        return tag + self._struct.pack(">i", 4 + len(payload)) + payload

    def _send(self, *frames: bytes) -> None:
        try:
            self._pg._sock.sendall(b"".join(frames))
        except OSError as e:
            raise OperationalError(str(e)) from e

    def _msgs(self):
        try:
            yield from self._pg._messages()
        except _WireError as e:
            raise OperationalError(str(e)) from e

    def _decode(self, body: bytes, oids: list[int]) -> list:
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
            row.append(_convert(text, oids[i] if i < len(oids) else 25))
        return row

    def _parse_desc(self, body: bytes) -> list[tuple[str, int]]:
        (nf,) = self._struct.unpack(">h", body[:2])
        cols, pos = [], 2
        for _ in range(nf):
            end = body.index(b"\x00", pos)
            name = body[pos:end].decode("utf-8")
            (oid,) = self._struct.unpack(">i", body[end + 7:end + 11])
            cols.append((name, oid))
            pos = end + 19
        return cols

    def _sync_if_idle(self) -> None:
        """Sync ends the implicit transaction and destroys every portal —
        only safe once no cursor is mid-stream."""
        if not self._suspended:
            self._send(self._frame(b"S", b""))
            for tag, _ in self._msgs():
                if tag == b"Z":
                    return

    def _recover(self, error_body: bytes):
        """Server error: resync the session (which aborts every suspended
        portal) and surface the message."""
        msg = self._pg._err(error_body)
        for cur in list(self._suspended):
            cur._invalidate()
        self._send(self._frame(b"S", b""))
        for tag, _ in self._msgs():
            if tag == b"Z":
                break
        low = msg.lower()
        if "violat" in low or "conflict" in low or "duplicate" in low:
            raise IntegrityError(msg)
        raise ProgrammingError(msg)

    def _check_open(self) -> None:
        if self._closed:
            raise InterfaceError("connection is closed")

    # -- PEP 249 surface --
    def cursor(self) -> Cursor:
        self._check_open()
        self._seq += 1
        return Cursor(self, f"dbapi{self._seq}")

    @property
    def autocommit(self) -> bool:
        return self._autocommit

    @autocommit.setter
    def autocommit(self, value: bool) -> None:
        self._check_open()
        if self._in_txn:
            raise ProgrammingError(
                "cannot change autocommit inside a transaction: "
                "commit() or rollback() first")
        self._autocommit = bool(value)

    _ISOLATION_LEVELS = (
        "read uncommitted", "read committed", "repeatable read",
        "serializable")

    @property
    def isolation_level(self) -> "str | None":
        """psycopg-style: None = server default (read committed). When
        set, the lazily-opened transaction of a non-autocommit connection
        begins with ``BEGIN ISOLATION LEVEL <level>`` — repeatable
        read/serializable get the engine's per-session snapshot reads."""
        return self._isolation

    @isolation_level.setter
    def isolation_level(self, value: "str | None") -> None:
        self._check_open()
        if self._in_txn:
            raise ProgrammingError(
                "cannot change isolation_level inside a transaction: "
                "commit() or rollback() first")
        if value is None:
            self._isolation = None
            return
        norm = " ".join(str(value).lower().split())
        if norm not in self._ISOLATION_LEVELS:
            raise ProgrammingError(
                f"unknown isolation level: {value!r} "
                f"(one of {', '.join(self._ISOLATION_LEVELS)})")
        self._isolation = norm

    def _run_txn_verb(self, sql: str) -> None:
        """BEGIN/COMMIT/ROLLBACK through the unnamed portal — no Sync, so
        suspended cursor portals survive."""
        s = self._struct
        enc = sql.encode("utf-8")
        self._send(
            self._frame(b"P", b"\x00" + enc + b"\x00" + s.pack(">h", 0)),
            self._frame(b"B", b"\x00\x00" + s.pack(">hhh", 0, 0, 0)),
            self._frame(b"E", b"\x00" + s.pack(">i", 0)),
            self._frame(b"H", b""))
        for tag, body in self._msgs():
            if tag == b"C":
                return
            if tag == b"E":
                self._recover(body)

    def _maybe_begin(self, operation: str) -> None:
        """Open the server transaction lazily on the first statement of a
        non-autocommit connection (psycopg-style). Explicit transaction
        verbs issued through cursor.execute() still update _in_txn, so a
        caller-sent BEGIN makes the later commit()/rollback() real verbs
        instead of silent no-ops that would leave the server transaction
        open forever."""
        head = operation.lstrip().split(None, 1)
        kw = head[0].upper().rstrip(";") if head else ""
        if kw in ("BEGIN", "START"):
            self._in_txn = True
            return
        if kw == "ROLLBACK":
            # ROLLBACK TO <savepoint> keeps the transaction open
            rest = head[1].lstrip().upper() if len(head) > 1 else ""
            if not rest.startswith("TO"):
                self._in_txn = False
            return
        if kw in ("COMMIT", "END"):
            self._in_txn = False
            return
        if self._autocommit or self._in_txn:
            return
        iso = getattr(self, "_isolation", None)
        self._run_txn_verb(
            "BEGIN" if iso is None else f"BEGIN ISOLATION LEVEL {iso.upper()}")
        self._in_txn = True

    def commit(self) -> None:
        self._check_open()
        if self._in_txn:
            self._run_txn_verb("COMMIT")
            self._in_txn = False
        # autocommit (or no statement since the last commit): no-op

    def rollback(self) -> None:
        self._check_open()
        if self._in_txn:
            self._run_txn_verb("ROLLBACK")
            self._in_txn = False
        # autocommit: nothing pending — rolling back nothing is a no-op

    def close(self) -> None:
        if not self._closed:
            self._closed = True
            self._pg.close()

    def __enter__(self) -> "Connection":
        return self

    def __exit__(self, *exc) -> None:
        self.close()


def connect(dsn: str = "localhost:5433", host: str | None = None,
            port: int | None = None, timeout: float = 120.0) -> Connection:
    """``connect("host:port")`` or ``connect(host=..., port=...)``."""
    if port is None:
        h, _, p = dsn.rpartition(":")
        host, port = h or "localhost", int(p)
    elif host is None:
        host = "localhost"
    return Connection(host, port, timeout=timeout)
