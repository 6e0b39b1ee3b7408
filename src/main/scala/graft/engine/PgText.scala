package graft.engine

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Postgres COPY TEXT codec (tab-separated, `\N` nulls, backslash
  * escapes) as pure column expressions — shared by the engine's COPY
  * surface and the gate's round-trip query. Everything is per-row
  * narrow work: scan speed both directions, no driver involvement.
  * Octal/hex escapes (which psql's own COPY TO never emits) are not
  * decoded; a backslash before any other character stays literal.
  */
object PgText {

  /** Escape one rendered string column: backslash first, then the
    * control characters pg COPY escapes (tab, NL, CR, \b, \f, \v).
    */
  def escape(c: Column): Column =
    Seq("\t" -> "\\t", "\n" -> "\\n", "\r" -> "\\r",
      "\u0008" -> "\\b", "\u000C" -> "\\f", "\u000B" -> "\\v")
      .foldLeft(replace(c, lit("\\"), lit("\\\\"))) { case (acc, (raw, esc)) =>
        replace(acc, lit(raw), lit(esc))
      }

  /** Decode one field: split on literal `\\` (so each segment's
    * single-backslash escapes decode independently), then rejoin with
    * the literal backslash the `\\` encoded.
    */
  def unescape(c: Column): Column = {
    val segDecoded = transform(split(c, "\\\\\\\\", -1), seg =>
      Seq("\\t" -> "\t", "\\n" -> "\n", "\\r" -> "\r",
        "\\b" -> "\u0008", "\\f" -> "\u000C", "\\v" -> "\u000B")
        .foldLeft(seg) { case (acc, (esc, raw)) =>
          replace(acc, lit(esc), lit(raw))
        })
    array_join(segDecoded, "\\")
  }

  /** One escaped TEXT line per row: booleans render t/f (pg parity),
    * nulls `\N`, fields tab-joined. The single output column is named
    * `value` — ready for `.write.text`.
    */
  def encodeLines(df: DataFrame): DataFrame = {
    val line = concat_ws("\t", df.schema.fields.map { f =>
      val rendered = f.dataType match {
        case BooleanType => when(col(f.name), lit("t")).otherwise(lit("f"))
        case _ => col(f.name).cast("string")
      }
      coalesce(escape(rendered), lit("\\N"))
    }.toIndexedSeq: _*)
    df.select(line.as("value"))
  }

  /** Parse a `value`-column line frame back into `schema`: raw tab only
    * ever separates (tabs in data arrive escaped), `\N` is NULL, and the
    * legacy `\.` end marker terminates data per the protocol spec.
    */
  def decodeLines(lines: DataFrame, schema: StructType): DataFrame = {
    val arr = split(col("value"), "\t", -1)
    val fields = schema.fields.zipWithIndex.map { case (f, i) =>
      val rf = element_at(arr, i + 1)
      when(rf === "\\N", lit(null))
        .otherwise(unescape(rf))
        .cast(f.dataType).as(f.name)
    }
    lines.filter(col("value") =!= "\\.").select(fields.toIndexedSeq: _*)
  }
}
