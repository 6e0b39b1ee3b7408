#!/usr/bin/env python3
"""PySpark smoke for the graft engine — the Python-API parity check.

The reference ships an embedded Python API (reference src/python/mod.rs:14-60:
open a database, run SQL, get rows back). graft's Python story is PySpark by
construction: the engine is a Spark library, so every DataFrame/SQL surface it
exposes is reachable from Python through the live JVM (py4j). This script
proves it end to end, three ways:

  1. plain PySpark SQL over the driver testdata (the q1 gate query),
  2. the Scala DataFrame API (`graft.SparkEntry.entry`) called from Python,
  3. the statement engine (`graft.engine.Engine`) driven from Python —
     CREATE / INSERT / SELECT round trip, the reference's Python usage shape.

Run (after `sbt compile`):

    python3 tools/pyspark_smoke.py [sf_dir]

Expected output ends with three PASS lines and `SMOKE OK`; exit code 0.
"""
import glob
import os
import sys
import tempfile

from pyspark.sql import DataFrame, SparkSession

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CLASSES = os.path.join(REPO, "target", "scala-2.13", "classes")
SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"


def main():
    assert os.path.isdir(CLASSES), f"run `sbt compile` first: {CLASSES} missing"
    spark = (
        SparkSession.builder.master("local[4]")
        .appName("graft-pyspark-smoke")
        .config("spark.driver.extraClassPath", CLASSES)
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("WARN")

    # 1. SQL surface: the q1 gate aggregation over the driver parquet.
    for table in ("lineitem",):
        spark.read.parquet(os.path.join(SF_DIR, f"{table}.parquet")) \
            .createOrReplaceTempView(table)
    q1 = spark.sql(
        """SELECT l_returnflag, l_linestatus, sum(l_quantity) AS sum_qty,
                  count(*) AS count_order
           FROM lineitem GROUP BY l_returnflag, l_linestatus
           ORDER BY l_returnflag, l_linestatus"""
    ).collect()
    assert len(q1) == 6, f"q1 expected 6 groups, got {len(q1)}"
    assert all(r.sum_qty > 0 and r.count_order > 0 for r in q1)
    print(f"PASS sql: q1 agg -> {len(q1)} groups")

    # 2. Scala DataFrame API from Python: SparkEntry.entry is the flagship
    # query; py4j reaches the object's static forwarder directly.
    jdf = spark._jvm.graft.SparkEntry.entry(spark._jsparkSession)
    entry = DataFrame(jdf, spark)
    n = entry.count()
    assert n > 0, "SparkEntry.entry returned no rows"
    print(f"PASS dataframe-api: SparkEntry.entry -> {n} rows")

    # 3. Statement engine from Python — the reference's embedded-API shape
    # (create_database / query in src/python/mod.rs): run SQL text, read
    # rows back as Python objects.
    warehouse = tempfile.mkdtemp(prefix="graft-pysmoke-")
    engine = spark._jvm.graft.engine.Engine(spark._jsparkSession, warehouse)
    engine.run("create table pysmoke(v int not null, name varchar)")
    engine.run("insert into pysmoke values (1, 'a'), (2, 'b'), (3, 'c')")
    rows = DataFrame(
        engine.run("select v, name from pysmoke where v >= 2 order by v"), spark
    ).collect()
    assert [(r.v, r.name) for r in rows] == [(2, "b"), (3, "c")], rows
    print("PASS engine: CREATE/INSERT/SELECT round trip -> [(2, b), (3, c)]")

    spark.stop()
    print("SMOKE OK")


if __name__ == "__main__":
    main()
