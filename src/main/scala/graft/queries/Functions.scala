package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, DoubleType}
import graft.Tables

/** Scalar expression surface — SURVEY.md §2.8: arithmetic with
  * div-by-zero→NULL (reference `safen_dividend`,
  * `/root/reference/src/array/ops.rs:759+`), 3VL boolean logic, CASE/IN/
  * BETWEEN/LIKE, string functions (`||`, substring 1-based, replace,
  * repeat), date extract + interval arithmetic, and the cast matrix
  * (`ops.rs:364-607`). Spark runs with ANSI off (Tables.sessionConfs) so
  * div-by-zero → NULL matches both the reference and DuckDB.
  */
object Functions {

  private def sql(text: String): (org.apache.spark.sql.SparkSession, String) => org.apache.spark.sql.DataFrame =
    (s, d) => { Tables.register(s, d); s.sql(text) }

  def all: Registry = {
    // three-valued logic over an inline VALUES relation (identical SQL text
    // runs on both engines)
    val threeVl = """SELECT a, b, a AND b AS and_ab, a OR b AS or_ab,
      |NOT a AS not_a, a <> b AS xor_ab, a IS NULL AS a_is_null
      |FROM (VALUES (true, true), (true, false), (false, false),
      |  (true, CAST(NULL AS BOOLEAN)), (false, CAST(NULL AS BOOLEAN)),
      |  (CAST(NULL AS BOOLEAN), CAST(NULL AS BOOLEAN))) AS t(a, b)
      |ORDER BY a NULLS FIRST, b NULLS FIRST""".stripMargin

    Map(
      // + - * / % with promotion; x/0 and x%0 → NULL on both engines
      "expr_arithmetic" -> Q(
        (s, d) => t(s, d, "part")
          .select(col("p_partkey"),
            (col("p_size") + 10).as("add_"),
            (col("p_size") - 3).as("sub_"),
            (col("p_size") * 2).as("mul_"),
            (col("p_retailprice") / col("p_size")).as("div_"),
            (col("p_size") % 7).as("mod_"),
            (col("p_size") / (col("p_size") - col("p_size"))).as("div_zero"),
            (-col("p_size")).as("neg_"))
          .orderBy("p_partkey"),
        Some("""SELECT p_partkey, p_size + 10 AS add_, p_size - 3 AS sub_,
               |p_size * 2 AS mul_, p_retailprice / p_size AS div_,
               |p_size % 7 AS mod_,
               |p_size / (p_size - p_size) AS div_zero, -p_size AS neg_
               |FROM part ORDER BY p_partkey""".stripMargin)),

      "expr_three_valued_logic" -> Q(sql(threeVl), Some(threeVl)),

      "expr_case_when" -> Q(
        (s, d) => t(s, d, "orders")
          .select(col("o_orderkey"),
            when(col("o_totalprice") > 250000, "big")
              .when(col("o_totalprice") > 100000, "mid")
              .otherwise("small").as("bucket"),
            when(col("o_orderstatus") === "F", 1).as("f_flag"))
          .orderBy("o_orderkey"),
        Some("""SELECT o_orderkey,
               |CASE WHEN o_totalprice > 250000 THEN 'big'
               |     WHEN o_totalprice > 100000 THEN 'mid'
               |     ELSE 'small' END AS bucket,
               |CASE WHEN o_orderstatus = 'F' THEN 1 END AS f_flag
               |FROM orders ORDER BY o_orderkey""".stripMargin)),

      "expr_in_between_like" -> Q(
        (s, d) => t(s, d, "part")
          .filter(col("p_brand").isin("Brand#1", "Brand#3") &&
            col("p_size").between(10, 40) &&
            col("p_type").like("%BRASS%"))
          .select(col("p_partkey"), col("p_brand"), col("p_type"), col("p_size"))
          .orderBy("p_partkey"),
        Some("""SELECT p_partkey, p_brand, p_type, p_size FROM part
               |WHERE p_brand IN ('Brand#1','Brand#3')
               |AND p_size BETWEEN 10 AND 40 AND p_type LIKE '%BRASS%'
               |ORDER BY p_partkey""".stripMargin)),

      // || concat, substring(1-based FROM/FOR), replace, repeat + extensions
      "expr_strings" -> Q(
        (s, d) => t(s, d, "nation")
          .select(col("n_nationkey"),
            concat(col("n_name"), lit("-"), col("n_nationkey").cast("string")).as("concat_"),
            substring(col("n_name"), 2, 3).as("substr_"),
            expr("replace(n_name, 'A', '@')").as("replace_"),
            expr("repeat(n_name, 2)").as("repeat_"),
            lower(col("n_name")).as("lower_"),
            upper(lower(col("n_name"))).as("upper_"),
            length(col("n_name")).as("len_"),
            trim(concat(lit("  "), col("n_name"), lit(" "))).as("trim_"))
          .orderBy("n_nationkey"),
        Some("""SELECT n_nationkey,
               |n_name || '-' || CAST(n_nationkey AS VARCHAR) AS concat_,
               |substring(n_name, 2, 3) AS substr_,
               |replace(n_name, 'A', '@') AS replace_,
               |repeat(n_name, 2) AS repeat_,
               |lower(n_name) AS lower_, upper(lower(n_name)) AS upper_,
               |CAST(length(n_name) AS INT) AS len_,
               |trim('  ' || n_name || ' ') AS trim_
               |FROM nation ORDER BY n_nationkey""".stripMargin)),

      // extract(year/month/day), date_trunc, date ± interval
      "expr_datetime" -> Q(
        (s, d) => t(s, d, "orders")
          .select(col("o_orderkey"),
            year(col("o_orderdate")).as("y"),
            month(col("o_orderdate")).as("m"),
            dayofmonth(col("o_orderdate")).as("dom"),
            date_format(date_trunc("month", col("o_orderdate")), "yyyy-MM-dd").as("month_start"),
            date_format(col("o_orderdate") + expr("INTERVAL 30 DAY"), "yyyy-MM-dd").as("plus30"),
            date_format(col("o_orderdate") - expr("INTERVAL 2 MONTH"), "yyyy-MM-dd").as("minus2mo"))
          .orderBy("o_orderkey"),
        Some("""SELECT o_orderkey,
               |CAST(EXTRACT(YEAR FROM o_orderdate) AS INT) AS y,
               |CAST(EXTRACT(MONTH FROM o_orderdate) AS INT) AS m,
               |CAST(EXTRACT(DAY FROM o_orderdate) AS INT) AS dom,
               |strftime(date_trunc('month', o_orderdate), '%Y-%m-%d') AS month_start,
               |strftime(o_orderdate + INTERVAL 30 DAY, '%Y-%m-%d') AS plus30,
               |strftime(o_orderdate - INTERVAL 2 MONTH, '%Y-%m-%d') AS minus2mo
               |FROM orders ORDER BY o_orderkey""".stripMargin)),

      // cast matrix (double→int is avoided: Spark truncates, DuckDB rounds)
      "expr_cast_matrix" -> Q(
        (s, d) => t(s, d, "customer")
          .select(col("c_custkey"),
            col("c_custkey").cast("string").as("key_str"),
            lit("123").cast("int").as("str_int"),
            lit("12.5").cast("double").as("str_dbl"),
            lit("true").cast("boolean").as("str_bool"),
            lit(true).cast("int").as("bool_int"),
            date_format(lit("2020-05-05").cast("date"), "yyyy-MM-dd").as("str_date"),
            col("c_nationkey").cast("double").as("int_dbl"),
            col("c_acctbal").cast(Dec).cast("string").as("dbl_dec_str"))
          .orderBy("c_custkey"),
        Some("""SELECT c_custkey, CAST(c_custkey AS VARCHAR) AS key_str,
               |CAST('123' AS INT) AS str_int, CAST('12.5' AS DOUBLE) AS str_dbl,
               |CAST('true' AS BOOLEAN) AS str_bool, CAST(true AS INT) AS bool_int,
               |strftime(CAST('2020-05-05' AS DATE), '%Y-%m-%d') AS str_date,
               |CAST(c_nationkey AS DOUBLE) AS int_dbl,
               |CAST(CAST(c_acctbal AS DECIMAL(28,6)) AS VARCHAR) AS dbl_dec_str
               |FROM customer ORDER BY c_custkey""".stripMargin)),

      // decimal precision arithmetic (reference type_.rs:50-80); verify the
      // p/s propagation by string-rendering the results on both engines
      "expr_decimal_arith" -> Q(
        (s, d) => t(s, d, "customer")
          .select(col("c_custkey"),
            (col("c_acctbal").cast(org.apache.spark.sql.types.DecimalType(15, 2)) * 2)
              .cast("double").as("dec_mul"),
            (col("c_acctbal").cast(org.apache.spark.sql.types.DecimalType(15, 2))
              + col("c_custkey").cast(org.apache.spark.sql.types.DecimalType(15, 2)))
              .cast("double").as("dec_add"))
          .orderBy("c_custkey"),
        Some("""SELECT c_custkey,
               |CAST(CAST(c_acctbal AS DECIMAL(15,2)) * 2 AS DOUBLE) AS dec_mul,
               |CAST(CAST(c_acctbal AS DECIMAL(15,2)) + CAST(c_custkey AS DECIMAL(15,2)) AS DOUBLE) AS dec_add
               |FROM customer ORDER BY c_custkey""".stripMargin)),

      // BLOB surface (reference blob.slt: BYTEA literals, concat, length)
      "expr_blob" -> Q(
        (s, d) => t(s, d, "nation")
          .select(col("n_nationkey"),
            hex(col("n_name").cast("binary")).as("hex_"),
            length(col("n_name").cast("binary")).as("blen"),
            concat(col("n_name").cast("binary"), lit("!").cast("binary"))
              .cast("string").as("bconcat_str"))
          .orderBy("n_nationkey"),
        Some("""SELECT n_nationkey, hex(encode(n_name)) AS hex_,
               |CAST(octet_length(encode(n_name)) AS INT) AS blen,
               |CAST(encode(n_name) || encode('!') AS VARCHAR) AS bconcat_str
               |FROM nation ORDER BY n_nationkey""".stripMargin)),

      // VECTOR(n) literal parsing — reference `'[1,2,3]'::VECTOR(3)`
      // (vector.slt); Spark side parses via from_json to array<double>,
      // then applies the native distance expression.
      "expr_vector_literal" -> Q(
        (s, d) => {
          val v = from_json(lit("[3.0,4.0]"), ArrayType(DoubleType))
          t(s, d, "region")
            .select(col("r_regionkey"),
              element_at(v, 1).as("v0"),
              element_at(v, 2).as("v1"),
              size(v).as("dim"),
              graft.expr.VectorFunctions.l2_distance(v,
                from_json(lit("[0.0,0.0]"), ArrayType(DoubleType))).as("norm"))
            .orderBy("r_regionkey")
        },
        Some("""SELECT r_regionkey,
               |list_element(CAST('[3.0,4.0]' AS DOUBLE[]), 1) AS v0,
               |list_element(CAST('[3.0,4.0]' AS DOUBLE[]), 2) AS v1,
               |CAST(len(CAST('[3.0,4.0]' AS DOUBLE[])) AS INT) AS dim,
               |sqrt(3.0*3.0 + 4.0*4.0) AS norm
               |FROM region ORDER BY r_regionkey""".stripMargin)),

      // JSON extraction from the events.props string column (extension;
      // reference has no JSON functions)
      "expr_json_extract" -> Q(
        (s, d) => t(s, d, "events")
          .select(col("event_id"),
            get_json_object(col("props"), "$.k").as("k_str"),
            get_json_object(col("props"), "$.k").cast("int").as("k_int"))
          .orderBy("event_id"),
        Some("""SELECT event_id, json_extract_string(props, '$.k') AS k_str,
               |CAST(json_extract_string(props, '$.k') AS INT) AS k_int
               |FROM events ORDER BY event_id""".stripMargin)),

      // VARIANT (Spark 4 semi-structured type): rebuild a nested document
      // per row, parse it to variant, and shred typed fields back out —
      // binary-encoded traversal, no per-access string re-parse (the
      // lakehouse answer to a JSON-text props column at 100 TB: parse
      // once at ingest, extract many times). A missing path is a typed
      // NULL. The oracle states the round-trip identity directly.
      "expr_variant_shred" -> Q(
        (s, d) => {
          val doc = to_json(struct(
            col("event_type").as("t"),
            get_json_object(col("props"), "$.k").cast("int").as("k")))
          val v = parse_json(doc)
          t(s, d, "events")
            .select(col("event_id"),
              variant_get(v, "$.t", "string").as("t"),
              variant_get(v, "$.k", "int").as("k"),
              variant_get(v, "$.absent", "int").as("miss"))
            .orderBy("event_id")
        },
        Some("""SELECT event_id, event_type AS t,
               |CAST(json_extract_string(props, '$.k') AS INT) AS k,
               |CAST(NULL AS INT) AS miss
               |FROM events ORDER BY event_id""".stripMargin))
    )
  }
}
