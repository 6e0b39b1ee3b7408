"""Package tests for the graft Python client.

Runs against a LIVE graft server (`sbt "runMain graft.Server"` or the
ServerSpec harness): `GRAFT_PORT=5433 python3 tests/test_client.py`.
Zero test-framework dependencies — plain asserts, exit code 0 on
success — so the JVM test suite (PythonClientSpec) can drive it from an
installed copy of the package.
"""
import os
import sys

import graft


def test_line_protocol(port: int) -> None:
    db = graft.open(port=port)
    with db:
        db.query("create table pyc(v int not null, s varchar)")
        db.query("insert into pyc values (1,'a'), (2,'b'), (3,'c')")
        rows = db.query("select sum(v) as s, count(*) as n from pyc")
        assert rows == [["6", "3"]], rows
        try:
            db.query("select nope from pyc")
            raise SystemExit("expected graft.Error")
        except graft.Error:
            pass  # connection must survive the error
        assert db.query("select max(s) as m from pyc") == [["c"]]
        # space-stuffed ambiguous rows round-trip losslessly
        assert db.query("select 'OK 1' as s") == [["OK 1"]], "unstuff"


def test_pg_protocol(port: int) -> None:
    db = graft.open(port=port, wire="pg")
    with db:
        rows = db.query(
            "select 1 as i, 2.5 as d, 1 = 1 as b, 'x' as s, null as n, '' as e")
        assert rows == [[1, 2.5, True, "x", None, ""]], rows
        db.query("create table pyt(v int)")
        db.query("insert into pyt values (41)")
        assert db.query("select v + 1 from pyt") == [[42]]
        try:
            db.query("select nope")
            raise SystemExit("expected graft.Error")
        except graft.Error:
            pass
        assert db.query("select count(*) from pyt") == [[1]]
        ts = db.query("select timestamp'2024-01-02 03:04:05' as t, "
                      "timestamp_ntz'2024-01-02 03:04:05.25' as tn")
        assert ts == [["2024-01-02 03:04:05", "2024-01-02 03:04:05.25"]], ts


def test_pg_cursor(port: int) -> None:
    db = graft.open(port=port, wire="pg")
    with db:
        # incremental fetch: 10 rows through fetch_size=3 arrive complete,
        # ordered and typed, across 4 Execute/PortalSuspended round trips
        got = list(db.cursor("select id from range(0, 10) order by id",
                             fetch_size=3))
        assert got == [[i] for i in range(10)], got
        # early close mid-stream resyncs the session for the next query
        cur = db.cursor("select id from range(0, 1000) order by id",
                        fetch_size=2)
        assert next(cur) == [0]
        cur.close()
        assert db.query("select 7 as x") == [[7]]
        # errors surface as graft.Error and leave the session usable
        try:
            list(db.cursor("select nope"))
            raise SystemExit("expected graft.Error")
        except graft.Error:
            pass
        assert db.query("select 8 as x") == [[8]]


def test_pg_copy(port: int) -> None:
    db = graft.open(port=port, wire="pg")
    with db:
        db.query("create table pyc2(v int, s varchar)")
        # adversarial payloads: tab, newline, backslash, None, the \\N lookalike
        rows = [(1, "plain"), (2, "tab\there"), (3, "line\nbreak"),
                (4, "back\\slash"), (5, None), (6, "\\N")]
        n = db.copy_rows("pyc2", rows)
        assert n == 6, n
        got = {r[0]: r[1] for r in db.query("select v, s from pyc2")}
        assert got == {k: v for k, v in rows}, got
        # session stays healthy; COPY into a missing table errors cleanly
        try:
            db.copy_rows("nope_t", [(1,)])
            raise SystemExit("expected graft.Error")
        except graft.Error:
            pass
        assert db.query("select count(*) from pyc2") == [[6]]


def main() -> None:
    port = int(os.environ.get("GRAFT_PORT", "5433"))
    test_line_protocol(port)
    print("PY OK")
    test_pg_protocol(port)
    print("PG OK")
    test_pg_cursor(port)
    print("CURSOR OK")
    test_pg_copy(port)
    print("COPY OK")


if __name__ == "__main__":
    sys.exit(main())
