package graft.functions

import org.apache.spark.sql.{Column, DataFrame, Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** One scored top-k candidate. */
case class Scored(id: Long, score: Double)

/** Bounded top-k accumulator ordered by (score desc, id asc).
  *
  * The buffer never exceeds `k` entries, so Spark's partial (map-side)
  * aggregation reduces each input partition to at most k candidates per
  * group BEFORE the shuffle: a top-k over a corpus of n rows moves only
  * nPartitions×k rows per query through the exchange instead of all n.
  * This is the scale-safe replacement for `row_number() OVER (PARTITION BY
  * query)` on an unbounded scored set, which shuffles the entire corpus to
  * one task per query.
  *
  * Determinism: insertion keeps the buffer sorted by (score desc, id asc);
  * merge order across partitions cannot change the final k because the
  * comparator is a total order over distinct ids.
  */
class TopKByScore(k: Int) extends Aggregator[Scored, Seq[Scored], Seq[Scored]] {
  // java.lang.Double.compare gives a TOTAL order (NaN sorts greatest,
  // consistently) — a raw `>` comparator treats NaN as equal to everything
  // while real scores still order, which violates sortWith's contract
  // (TimSort can throw) and ranks NaN neighbors nondeterministically.
  private def beats(a: Scored, b: Scored): Boolean = {
    val c = java.lang.Double.compare(a.score, b.score)
    c > 0 || (c == 0 && a.id < b.id)
  }

  override def zero: Seq[Scored] = Vector.empty

  override def reduce(buf: Seq[Scored], x: Scored): Seq[Scored] =
    if (buf.length >= k && !beats(x, buf.last)) buf // hot path: no allocation
    else ((buf :+ x).sortWith(beats)).take(k)

  override def merge(a: Seq[Scored], b: Seq[Scored]): Seq[Scored] =
    ((a ++ b).sortWith(beats)).take(k)

  override def finish(buf: Seq[Scored]): Seq[Scored] = buf

  override def bufferEncoder: Encoder[Seq[Scored]] = ExpressionEncoder[Seq[Scored]]()
  override def outputEncoder: Encoder[Seq[Scored]] = ExpressionEncoder[Seq[Scored]]()
}

object TopK {

  /** Per-group top-k of `scored` rows: group by `qId`, keep the k best
    * (`scoreCol` desc, `cId` asc) rows, emit (qId, neighbor_id, scoreCol,
    * rnk) with rnk 1-based. Plan shape: partial ObjectHashAggregate with a
    * k-bounded buffer → tiny exchange → final merge → posexplode. No
    * Window over the full scored set.
    */
  def rank(scored: DataFrame, k: Int, qId: String, cId: String,
      scoreCol: String): DataFrame = {
    // the buffer keys candidates by Long — a non-integral id column (e.g.
    // string doc ids) would silently cast to null for every row and return
    // garbage; fail loudly instead
    import org.apache.spark.sql.types._
    scored.schema(cId).dataType match {
      case ByteType | ShortType | IntegerType | LongType =>
      case other => throw new IllegalArgumentException(
        s"TopK.rank: candidate id column '$cId' must be integral, got $other")
    }
    val topk = udaf(new TopKByScore(k), Encoders.product[Scored])
    scored.groupBy(col(qId))
      .agg(topk(col(cId).cast("long"), col(scoreCol)).as("_topk"))
      .select(col(qId), posexplode(col("_topk")).as(Seq("_pos", "_nb")))
      .select(col(qId), col("_nb.id").as("neighbor_id"),
        col("_nb.score").as(scoreCol), (col("_pos") + 1).cast("int").as("rnk"))
  }
}
