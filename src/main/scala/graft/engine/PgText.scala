package graft.engine

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Postgres COPY TEXT codec (delimiter-separated, `\N` nulls, backslash
  * escapes) — shared by the engine's COPY surface and the gate's
  * round-trip query. Encode is pure column expressions; decode is one
  * native line-parser expression ([[graft.expr.PgTextFields]]) that
  * implements the full COPY TEXT escape grammar byte-exactly, including
  * the `\xHH` / `\OOO` forms other COPY TEXT producers (pg_dump bytea)
  * emit and escaped-delimiter splitting for non-tab delimiters. Either
  * way everything is per-row narrow work: scan speed both directions,
  * no driver involvement.
  */
object PgText {

  /** pg requires a single one-byte delimiter in text format; the decode
    * state machine runs over bytes, so enforce it here for both sides.
    * Characters that collide with the escape grammar are REJECTED like pg
    * rejects them, instead of silently corrupting round-trips: a letter/
    * digit delimiter turns escaped data bytes into `\n`-style mnemonics
    * or octal escapes on decode, backslash is the escape itself, a `.`
    * delimiter can make a data line render as the `\.` end-of-data
    * marker, and CR/LF are the row framing.
    */
  private def checkDelim(delim: String): Unit = {
    require(delim.length == 1 && delim.head < 0x80,
      s"COPY delimiter must be a single one-byte character, got '$delim'")
    val c = delim.head
    require(!c.isLetterOrDigit && c != '\\' && c != '.' && c != '\r' && c != '\n',
      s"COPY delimiter cannot be '$c'")
  }

  /** Escape one rendered string column: backslash first, then the
    * control characters pg COPY escapes (tab, NL, CR, \b, \f, \v), then
    * — for a non-tab delimiter — the delimiter itself as `\<delim>`
    * (pg escapes the active delimiter in data, raw after the backslash).
    */
  def escape(c: Column, delim: String = "\t"): Column = {
    checkDelim(delim)
    val base = Seq("\t" -> "\\t", "\n" -> "\\n", "\r" -> "\\r",
      "\u0008" -> "\\b", "\u000C" -> "\\f", "\u000B" -> "\\v")
      .foldLeft(replace(c, lit("\\"), lit("\\\\"))) { case (acc, (raw, esc)) =>
        replace(acc, lit(raw), lit(esc))
      }
    if (delim == "\t") base
    else replace(base, lit(delim), lit("\\" + delim))
  }

  /** Decode one field through the native parser (no splitting). */
  def unescape(c: Column): Column =
    element_at(fieldsOf(c, -1), 1)

  private def fieldsOf(c: Column, delim: Int): Column =
    org.apache.spark.sql.graftbridge.Bridge.column(
      graft.expr.PgTextFields(
        org.apache.spark.sql.graftbridge.Bridge.expression(c), delim))

  /** One escaped TEXT line per row: booleans render t/f (pg parity),
    * nulls `\N`, fields delimiter-joined. The single output column is
    * named `value` — ready for `.write.text`.
    */
  def encodeLines(df: DataFrame, delim: String = "\t"): DataFrame = {
    checkDelim(delim)
    val line = concat_ws(delim, df.schema.fields.map { f =>
      val rendered = f.dataType match {
        case BooleanType => when(col(f.name), lit("t")).otherwise(lit("f"))
        case _ => col(f.name).cast("string")
      }
      coalesce(escape(rendered, delim), lit("\\N"))
    }.toIndexedSeq: _*)
    df.select(line.as("value"))
  }

  /** Parse a `value`-column line frame back into `schema`: the native
    * parser splits on unescaped delimiters only (escapes consume the
    * following byte), maps `\N` fields to NULL, and decodes the full
    * escape grammar; the legacy `\.` end marker terminates data per the
    * protocol spec.
    */
  def decodeLines(lines: DataFrame, schema: StructType,
      delim: String = "\t"): DataFrame = {
    checkDelim(delim)
    val arr = fieldsOf(col("value"), delim.head.toInt)
    val fields = schema.fields.zipWithIndex.map { case (f, i) =>
      element_at(arr, i + 1).cast(f.dataType).as(f.name)
    }
    lines.filter(col("value") =!= "\\.").select(fields.toIndexedSeq: _*)
  }
}
