package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector distance primitives over `ArrayType(Float|Double)` columns —
  * the reference's `<->` (L2), `<=>` (cosine distance), `<#>` (negative
  * inner product) operators (`/root/reference/src/planner/mod.rs:74-76`,
  * kernels `src/array/ops.rs:655-723`).
  *
  * Implemented as Catalyst higher-order functions with a strict
  * left-to-right fold so the float→double accumulation order is identical
  * on every engine/partitioning — the DuckDB oracle mirrors the same fold.
  */
object Vectors {

  /** Element-wise products folded left-to-right in double precision.
    * HOF form — kept as the reference semantics / parity baseline; the
    * hot-path entry points below delegate to the codegen'd expressions in
    * graft.expr.VectorDistance, which accumulate in the same ascending
    * order and are therefore bit-identical.
    */
  def dotHof(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  def dot(a: Column, b: Column): Column =
    -graft.expr.VectorFunctions.neg_inner_product(a, b)

  def norm2(a: Column): Column = sqrt(dot(a, a))

  /** `<->` L2 distance (native codegen kernel). */
  def l2Distance(a: Column, b: Column): Column =
    graft.expr.VectorFunctions.l2_distance(a, b)

  /** `<=>` cosine distance = 1 - cos similarity. */
  def cosineDistance(a: Column, b: Column): Column =
    lit(1.0) - cosineSimilarity(a, b)

  /** Single-pass native cosine similarity. */
  def cosineSimilarity(a: Column, b: Column): Column =
    graft.expr.VectorFunctions.cosine_sim(a, b)

  /** `<#>` negative inner product (native codegen kernel). */
  def negInnerProduct(a: Column, b: Column): Column =
    graft.expr.VectorFunctions.neg_inner_product(a, b)

  /** Deterministic pseudo-random hyperplane weight for (plane j, dim d):
    * integer-mixed then scaled to (-1, 1]. Same formula in oracle SQL.
    */
  def planeWeight(j: Column, dIdx: Column): Column =
    (((j * 64 + dIdx) * 2654435761L % 1000003L) - lit(500001L)).cast("double") / 500001.0

  /** Sign-of-projection LSH bucket over `nPlanes` deterministic
    * hyperplanes starting at plane index `planeOffset`: bit j = 1 iff
    * dot(w_{offset+j}, v) > 0. Bucket ∈ [0, 2^nPlanes).
    */
  def lshBucket(v: Column, nPlanes: Int, planeOffset: Int = 0): Column =
    aggregate(
      sequence(lit(0), lit(nPlanes - 1)), lit(0L),
      (acc, j) => {
        val proj = aggregate(
          zip_with(v, sequence(lit(0), size(v) - 1),
            (x, dIdx) => x.cast("double") *
              planeWeight(j.cast("long") + planeOffset, dIdx.cast("long"))),
          lit(0.0), (a2, p) => a2 + p)
        acc + when(proj > 0,
          call_function("shiftleft", lit(1L), j.cast("int"))).otherwise(0L)
      })

  /** Multi-table LSH buckets, native kernel — same arithmetic as
    * [[lshBuckets]] in a tight loop (VectorExprSpec proves bit-parity);
    * use on corpus-scale bucketing passes.
    */
  def lshBucketsNative(v: Column, nPlanes: Int, nTables: Int): Column =
    org.apache.spark.sql.graftbridge.Bridge.column(
      graft.expr.LshBucketsExpr(
        org.apache.spark.sql.graftbridge.Bridge.expression(v), nPlanes, nTables))

  /** Multi-table LSH buckets: one independent `nPlanes`-bit bucket per
    * table (plane indices offset by table·nPlanes). Candidate recall for
    * L tables is 1-(1-p^nPlanes)^L per neighbor.
    */
  def lshBuckets(v: Column, nPlanes: Int, nTables: Int): Column =
    transform(sequence(lit(0), lit(nTables - 1)),
      tt => aggregate(
        sequence(lit(0), lit(nPlanes - 1)), lit(0L),
        (acc, j) => {
          val proj = aggregate(
            zip_with(v, sequence(lit(0), size(v) - 1),
              (x, dIdx) => x.cast("double") *
                planeWeight(tt.cast("long") * nPlanes + j.cast("long"), dIdx.cast("long"))),
            lit(0.0), (a2, p) => a2 + p)
          acc + when(proj > 0,
            call_function("shiftleft", lit(1L), j.cast("int"))).otherwise(0L)
        }))
}
