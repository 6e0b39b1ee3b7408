package graft.expr

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Parse one Postgres COPY TEXT line into its unescaped fields — the
  * byte-exact decoder half of [[graft.engine.PgText]], run per the COPY
  * spec (pg docs "Text Format"): a backslash consumes the next byte, so
  * an escaped delimiter never splits a field; `\b \f \n \r \t \v` map to
  * their control bytes; `\xH[H]` and `\OOO` (1–3 octal digits) produce a
  * raw BYTE (multi-byte UTF-8 arrives as one escape per byte, which is
  * why the whole decode runs over bytes, not chars); a backslash before
  * any other byte yields that byte; the exact raw sequence `\N` as an
  * entire field is SQL NULL. The delimiter must be a single one-byte
  * character (pg enforces the same); a negative `delim` disables
  * splitting — the whole line decodes as one field.
  *
  * CodegenFallback: one JVM call per line replaces a split + per-field
  * expression chain, and COPY ingestion is a one-off scan — the cast
  * and write around it stay in codegen.
  */
case class PgTextFields(child: Expression, delim: Int)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(StringType, containsNull = true)
  override def prettyName: String = "pg_text_fields"
  // null in => null out (nullSafeEval): declaring it lets the optimizer
  // infer IsNotNull on the child attribute instead of wrapping this whole
  // kernel in an interpreted isnotnull(<kernel>) filter (r18 optimization)
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[UTF8String].getBytes
    val n = bytes.length
    val fields = scala.collection.mutable.ArrayBuffer[AnyRef]()
    var segStart = 0
    var i = 0
    while (i < n) {
      val b = bytes(i)
      if (b == '\\' && i + 1 < n) i += 2 // escape: next byte is payload
      else if ((b & 0xFF) == delim) { // delim < 0 = single-field mode
        fields += decodeSeg(bytes, segStart, i)
        segStart = i + 1
        i += 1
      } else i += 1
    }
    fields += decodeSeg(bytes, segStart, n)
    new GenericArrayData(fields.toArray)
  }

  private def decodeSeg(bytes: Array[Byte], start: Int, end: Int): AnyRef = {
    if (end - start == 2 && bytes(start) == '\\' && bytes(start + 1) == 'N')
      return null // the raw \N field IS null (checked before unescaping)
    val out = new java.io.ByteArrayOutputStream(end - start)
    def hexVal(b: Byte): Int =
      if (b >= '0' && b <= '9') b - '0'
      else if (b >= 'a' && b <= 'f') b - 'a' + 10
      else if (b >= 'A' && b <= 'F') b - 'A' + 10
      else -1
    def isOct(b: Byte): Boolean = b >= '0' && b <= '7'
    var j = start
    while (j < end) {
      val b = bytes(j)
      if (b == '\\' && j + 1 < end) {
        val d = (bytes(j + 1) & 0xFF).toChar
        d match {
          case 'b' => out.write(0x08); j += 2
          case 'f' => out.write(0x0C); j += 2
          case 'n' => out.write(0x0A); j += 2
          case 'r' => out.write(0x0D); j += 2
          case 't' => out.write(0x09); j += 2
          case 'v' => out.write(0x0B); j += 2
          case 'x' =>
            var v = 0; var k = j + 2; var nd = 0
            while (k < end && nd < 2 && hexVal(bytes(k)) >= 0) {
              v = v * 16 + hexVal(bytes(k)); k += 1; nd += 1
            }
            // \x with no hex digit is a plain escaped x (pg rule)
            if (nd == 0) { out.write('x'); j += 2 }
            else { out.write(v); j = k }
          case o if o >= '0' && o <= '7' =>
            var v = 0; var k = j + 1; var nd = 0
            while (k < end && nd < 3 && isOct(bytes(k))) {
              v = v * 8 + (bytes(k) - '0'); k += 1; nd += 1
            }
            out.write(v & 0xFF); j = k
          case other => out.write(other); j += 2 // \<any> = itself
        }
      } else { out.write(b); j += 1 }
    }
    UTF8String.fromBytes(out.toByteArray)
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}
