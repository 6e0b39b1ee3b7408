"""PEP 249 conformance tests for graft.dbapi against a live server.

`GRAFT_PORT=5433 python3 tests/test_dbapi.py` — plain asserts, exit 0
on success, so PythonClientSpec can drive it from an installed copy.
"""
import datetime
import os
import sys

from graft import dbapi


def test_module_globals() -> None:
    assert dbapi.apilevel == "2.0"
    assert dbapi.threadsafety == 1
    assert dbapi.paramstyle == "pyformat"
    # the mandated exception lattice
    assert issubclass(dbapi.InterfaceError, dbapi.Error)
    assert issubclass(dbapi.ProgrammingError, dbapi.DatabaseError)
    assert issubclass(dbapi.DatabaseError, dbapi.Error)


def test_basic_query(con) -> None:
    cur = con.cursor()
    cur.execute("select 1 as i, 2.5 as d, 1=1 as b, 'x' as s, null as n")
    names = [d[0] for d in cur.description]
    assert names == ["i", "d", "b", "s", "n"], names
    assert cur.description[0][1] == dbapi.NUMBER
    assert cur.description[3][1] == dbapi.STRING
    rows = cur.fetchall()
    assert rows == [[1, 2.5, True, "x", None]], rows
    assert cur.fetchone() is None  # drained
    cur.close()


def test_parameters(con) -> None:
    cur = con.cursor()
    cur.execute("create table dba(v int, s varchar)")
    cur.execute("insert into dba values (%s, %s), (%s, %s)",
                (1, "it's", 2, None))
    assert cur.rowcount == 2, cur.rowcount
    # named style; a quoted '%s' is payload, not a marker
    cur.execute("select v, s from dba where v = %(k)s and '%s' = '%s'",
                {"k": 1})
    assert cur.fetchall() == [[1, "it's"]]
    # NULL round-trips as None
    cur.execute("select s from dba where v = %s", (2,))
    assert cur.fetchall() == [[None]]
    # %% escapes to a literal % outside quotes (here: the modulo operator);
    # a % inside a quoted literal is payload and needs no doubling
    cur.execute("select 100 %% 7 as m, 'a%b' as s where 1 = %s", (1,))
    assert cur.fetchall() == [[2, "a%b"]]
    # marker/parameter count mismatches are ProgrammingError client-side
    for sql, params in [("select %s, %s", (1,)), ("select 1", (1, 2))]:
        try:
            cur.execute(sql, params)
            raise SystemExit("expected ProgrammingError")
        except dbapi.ProgrammingError:
            pass
    cur.close()


def test_executemany(con) -> None:
    cur = con.cursor()
    cur.execute("create table dbm(v int)")
    cur.executemany("insert into dbm values (%s)", [(i,) for i in range(5)])
    assert cur.rowcount == 5, cur.rowcount
    cur.execute("select sum(v) from dbm")
    assert cur.fetchall() == [[10]]
    cur.close()


def test_dml_returning(con) -> None:
    # pg-style RETURNING: affected rows come back as a result set and
    # rowcount reflects them
    cur = con.cursor()
    cur.execute("create table dbr(id int, v int default 3)")
    cur.execute("insert into dbr(id) values (1), (2) returning id, v")
    assert sorted(cur.fetchall()) == [[1, 3], [2, 3]]
    cur.execute("update dbr set v = v * 10 where id = 2 returning v")
    assert cur.fetchall() == [[30]]
    cur.execute("delete from dbr returning id")
    assert sorted(r[0] for r in cur.fetchall()) == [1, 2]
    cur.close()


def test_incremental_fetch(con) -> None:
    cur = con.cursor()
    cur.arraysize = 3  # 10 rows through 4 Execute/PortalSuspended trips
    cur.execute("select id from range(0, 10) order by id")
    assert cur.fetchone() == [0]
    assert cur.fetchmany(2) == [[1], [2]]
    assert cur.fetchmany() == [[3], [4], [5]]  # arraysize default
    assert cur.fetchall() == [[6], [7], [8], [9]]
    # iteration protocol
    cur.execute("select id from range(0, 4) order by id")
    assert [r[0] for r in cur] == [0, 1, 2, 3]
    cur.close()


def test_interleaved_cursors(con) -> None:
    # two cursors mid-stream on one connection: each owns a named portal
    c1, c2 = con.cursor(), con.cursor()
    c1.arraysize = c2.arraysize = 2
    c1.execute("select id from range(0, 6) order by id")
    c2.execute("select id * 10 from range(0, 6) order by id")
    out1 = [c1.fetchone()[0] for _ in range(3)]
    out2 = [c2.fetchone()[0] for _ in range(3)]
    out1 += [r[0] for r in c1]
    out2 += [r[0] for r in c2]
    assert out1 == [0, 1, 2, 3, 4, 5], out1
    assert out2 == [0, 10, 20, 30, 40, 50], out2
    c1.close()
    c2.close()


def test_error_recovery(con) -> None:
    cur = con.cursor()
    try:
        cur.execute("select nope_col from nope_table")
        raise SystemExit("expected ProgrammingError")
    except dbapi.ProgrammingError:
        pass
    # the same cursor and connection stay usable
    cur.execute("select 41 + %s", (1,))
    assert cur.fetchall() == [[42]]
    # an error while another cursor is suspended invalidates it honestly
    other = con.cursor()
    other.arraysize = 1
    other.execute("select id from range(0, 5) order by id")
    assert other.fetchone() == [0]
    try:
        cur.execute("select nope")
        raise SystemExit("expected ProgrammingError")
    except dbapi.ProgrammingError:
        pass
    rest = other.fetchall()  # portal destroyed at resync: ends cleanly
    assert all(isinstance(r[0], int) for r in rest)
    other.close()
    cur.close()


def test_transactions(con) -> None:
    con.commit()    # autocommit: no-op, must not raise
    con.rollback()  # autocommit: nothing pending, no-op
    cur = con.cursor()
    cur.execute("create table txp(v int)")
    assert con.autocommit
    con.autocommit = False
    cur.execute("insert into txp values (1)")
    con.rollback()  # really undoes: the insert vanishes
    cur.execute("select count(*) from txp")
    assert cur.fetchone()[0] == 0
    cur.execute("insert into txp values (2)")
    con.commit()
    con.autocommit = True
    cur.execute("select count(*) from txp")
    assert cur.fetchone()[0] == 1
    # manual BEGIN through cursor.execute() must be tracked: the later
    # commit()/rollback() are real verbs, not silent no-ops that would
    # leave the engine transaction open forever
    con.autocommit = False
    cur.execute("BEGIN")
    cur.execute("insert into txp values (3)")
    con.rollback()  # must actually close the manually-begun transaction
    cur.execute("select count(*) from txp")
    assert cur.fetchone()[0] == 1
    con.commit()
    # ROLLBACK TO a savepoint keeps the transaction open
    cur.execute("BEGIN")
    cur.execute("insert into txp values (4)")
    cur.execute("SAVEPOINT sp1")
    cur.execute("insert into txp values (5)")
    cur.execute("ROLLBACK TO sp1")
    con.commit()  # still in txn: commits the surviving insert of 4
    con.autocommit = True
    cur.execute("select count(*) from txp where v in (4, 5)")
    assert cur.fetchone()[0] == 1, "savepoint rollback kept v=4 only"
    cur.execute("drop table txp")
    cur.close()


def test_types(con) -> None:
    cur = con.cursor()
    cur.execute("select date'2024-03-05' as d, "
                "timestamp'2024-03-05 06:07:08.25' as ts, "
                "X'4142' as b")
    row = cur.fetchone()
    assert row[0] == datetime.date(2024, 3, 5), row
    assert row[1] == datetime.datetime(2024, 3, 5, 6, 7, 8, 250000), row
    assert row[2] == b"AB", row
    # datetime parameters bind through their ISO text rendering
    cur.execute("select %s < date'2024-03-06'", (datetime.date(2024, 3, 5),))
    assert cur.fetchall() == [[True]]
    cur.close()


def test_isolation_level(port: int) -> None:
    # psycopg-style isolation_level: a repeatable-read connection's lazy
    # BEGIN pins snapshot reads — a second connection's committed insert
    # stays invisible until commit(); the default connection sees it live
    a = dbapi.connect(port=port)
    b = dbapi.connect(port=port)
    try:
        cb = b.cursor()
        cb.execute("create table iso_py(v int)")
        cb.execute("insert into iso_py values (1)")
        try:
            a.isolation_level = "chaotic read"
            raise SystemExit("expected ProgrammingError for bad level")
        except dbapi.ProgrammingError:
            pass
        a.isolation_level = "REPEATABLE  READ"  # normalized
        assert a.isolation_level == "repeatable read"
        a.autocommit = False
        ca = a.cursor()
        ca.execute("select count(*) from iso_py")  # opens the RR txn, pins
        assert ca.fetchone()[0] == 1
        cb.execute("insert into iso_py values (2)")  # autocommit commit
        ca.execute("select count(*) from iso_py")
        assert ca.fetchone()[0] == 1, "snapshot read saw a foreign commit"
        # inside the open txn the level is locked
        try:
            a.isolation_level = "serializable"
            raise SystemExit("expected ProgrammingError inside txn")
        except dbapi.ProgrammingError:
            pass
        a.commit()
        ca.execute("select count(*) from iso_py")
        assert ca.fetchone()[0] == 2
        a.commit()
        a.autocommit = True
    finally:
        a.close()
        b.close()


def test_context_managers(port: int) -> None:
    with dbapi.connect(port=port) as con:
        with con.cursor() as cur:
            cur.execute("select 7 as x")
            assert cur.fetchall() == [[7]]
    try:
        con.cursor()
        raise SystemExit("expected InterfaceError")
    except dbapi.InterfaceError:
        pass


def test_pandas_read_sql(port: int) -> None:
    # the point of DB-API: ecosystem code works unchanged. pandas is not
    # a dependency of the client — probe it, skip cleanly if absent.
    try:
        import warnings
        with warnings.catch_warnings():
            warnings.simplefilter("ignore")  # non-SQLAlchemy con warning
            import pandas as pd
            con = dbapi.connect(port=port)
            df = pd.read_sql("select id, id * 2 as twice from range(0, 3) "
                             "order by id", con)
            con.close()
        assert list(df.columns) == ["id", "twice"], df.columns
        assert df["twice"].tolist() == [0, 2, 4], df
        print("PANDAS OK")
    except ImportError:
        print("PANDAS SKIPPED")


def main() -> None:
    port = int(os.environ.get("GRAFT_PORT", "5433"))
    test_module_globals()
    con = dbapi.connect(f"localhost:{port}")
    test_basic_query(con)
    test_parameters(con)
    test_executemany(con)
    test_dml_returning(con)
    test_incremental_fetch(con)
    test_interleaved_cursors(con)
    test_error_recovery(con)
    test_transactions(con)
    test_types(con)
    con.close()
    test_isolation_level(port)
    test_context_managers(port)
    test_pandas_read_sql(port)
    print("DBAPI OK")


if __name__ == "__main__":
    sys.exit(main())
