package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native kernel for the CENTROID ASSIGNMENT argmax/argmin — the
  * per-row winner over the collapsed broadcast centroid array that
  * every coarse quantization in the repo rides ([[graft.vector.Ivf.assign]],
  * `assignL2`, [[graft.vector.SemDedup.assignWithScore]], and through
  * them the IVF/k-means index builds, Lloyd refinement rounds, the
  * residual tier and the streaming ingest).
  *
  * Semantically identical to the certified HOF twins:
  *  - `l2 = false`: `array_max(transform(cents, c ->
  *    struct(dot(emb, c.centroid), -c.centroid_id)))` — max dot
  *    product (left-to-right double over float32), smallest
  *    centroid_id on ties; NULL scores sort SMALLEST (a null/ragged
  *    embedding loses to any scored centroid; if every score is null
  *    the smallest id wins with a null score).
  *  - `l2 = true`: `array_min(transform(cents, c ->
  *    struct(|e|²−2e·c+|c|², c.centroid_id)))` — min squared-L2 with
  *    the same three independent left-to-right sums as
  *    [[PqEncode]]/[[DotProduct]], smallest centroid_id on ties; NULL
  *    distances sort FIRST (they WIN the argmin, tie-broken by id —
  *    including the struct(null, null) a null cents element maps to).
  *
  * Result: struct(score double, id bigint) — `score` is the winning
  * dot (or d2), `id` the winning centroid_id; NULL when cents is null
  * or empty (array_max/min of nothing). IvfSpec pins kernel ≡ HOF on
  * corpus rows and adversarial (null/ragged embedding, null element,
  * null id) fixtures for both metrics.
  *
  * Why an expression: with the nLists ∝ N sizing contract the HOF
  * interprets nLists lambda bodies and allocates nLists structs PER
  * ROW — at the bench's 100× point (nLists = 1600) this is the
  * dominant index-BUILD cost (237 s, vs a flat 1.1 s serve). Same
  * static-kernel-in-codegen shape as [[PqEncode]].
  */
case class BestCentroid(left: Expression, right: Expression, l2: Boolean)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType, _),
            ArrayType(StructType(Array(
              StructField(_, LongType, _, _),
              StructField(_, ArrayType(FloatType, _), _, _))), _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) =>
        TypeCheckResult.TypeCheckFailure(
          "graft_best_centroid requires (array<float>, " +
            s"array<struct<centroid_id:bigint, centroid:array<float>>>), got ($l, $r)")
    }

  override def dataType: DataType = StructType(Seq(
    StructField("score", DoubleType, nullable = true),
    StructField("id", LongType, nullable = true)))

  // null only when cents is null or empty — a null EMBEDDING still
  // yields a winner (every score null → the nulls ordering decides)
  override def nullable: Boolean = true

  override def eval(input: InternalRow): Any = {
    val cents = right.eval(input)
    if (cents == null) null
    else BestCentroid.best(
      left.eval(input).asInstanceOf[ArrayData],
      cents.asInstanceOf[ArrayData], l2)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    val l = left.genCode(ctx)
    val r = right.genCode(ctx)
    val javaType = org.apache.spark.sql.catalyst.expressions.codegen
      .CodeGenerator.javaType(dataType)
    ev.copy(code = code"""
      ${r.code}
      boolean ${ev.isNull} = ${r.isNull};
      $javaType ${ev.value} = null;
      if (!${ev.isNull}) {
        ${l.code}
        ${ev.value} = (InternalRow) graft.functions.BestCentroid.best(
          (${l.isNull}) ? null : ${l.value}, ${r.value}, $l2);
        ${ev.isNull} = (${ev.value} == null);
      }""")
  }

  override def prettyName: String = "graft_best_centroid"

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): BestCentroid =
    copy(left = newLeft, right = newRight)
}

object BestCentroid {

  /** Static kernel shared by eval and codegen. Returns the winning
    * (score, id) InternalRow, or null for a null/empty cents array.
    * Null orderings mirror the HOF twins exactly (see the class doc):
    * max-dot treats null scores as smallest and breaks ties toward the
    * smaller id (the -id max); min-L2 treats null distances as
    * smallest (they win) with the same id tie-break; a null cents
    * element contributes (null score, null id); a null id sorts as
    * "nulls first" in its field's ordering direction.
    */
  def best(emb: ArrayData, cents: ArrayData, l2: Boolean): InternalRow = {
    val nc = cents.numElements()
    if (nc == 0) return null
    val embNull = emb == null
    val embLen = if (embNull) 0 else emb.numElements()
    var haveBest = false
    var bestScoreNull = false
    var bestScore = 0.0
    var bestIdNull = false
    var bestId = 0L
    var j = 0
    while (j < nc) {
      val elemNull = cents.isNullAt(j)
      val ce = if (elemNull) null else cents.getStruct(j, 2)
      val idNull = elemNull || ce.isNullAt(0)
      val id = if (idNull) 0L else ce.getLong(0)
      var scoreNull = embNull || elemNull
      var score = 0.0
      if (!scoreNull) {
        if (ce.isNullAt(1)) scoreNull = true
        else {
          val cvec = ce.getArray(1)
          if (cvec.numElements() != embLen) scoreNull = true
          else {
            var saa = 0.0
            var sab = 0.0
            var sbb = 0.0
            var i = 0
            while (i < embLen && !scoreNull) {
              if (emb.isNullAt(i) || cvec.isNullAt(i)) scoreNull = true
              else {
                val a = emb.getFloat(i).toDouble
                val b = cvec.getFloat(i).toDouble
                if (l2) { saa += a * a; sbb += b * b }
                sab += a * b
              }
              i += 1
            }
            if (!scoreNull) score = if (l2) (saa - 2.0 * sab) + sbb else sab
          }
        }
      }
      // l2: array_min over struct(d2, id) — nulls FIRST win the min,
      //     tie toward null-then-smaller id.
      // dot: array_max over struct(score, -id) — nulls SMALLEST lose
      //     the max; tie toward larger -id = smaller id, with a null
      //     -id (null id) sorting smallest (losing the tie).
      val better =
        if (!haveBest) true
        else if (l2) {
          if (scoreNull != bestScoreNull) scoreNull
          else if (!scoreNull && java.lang.Double.compare(score, bestScore) != 0)
            java.lang.Double.compare(score, bestScore) < 0
          else cmpIdAsc(idNull, id, bestIdNull, bestId) < 0
        } else {
          if (scoreNull != bestScoreNull) !scoreNull
          else if (!scoreNull && java.lang.Double.compare(score, bestScore) != 0)
            java.lang.Double.compare(score, bestScore) > 0
          else cmpNegIdDesc(idNull, id, bestIdNull, bestId)
        }
      if (better) {
        haveBest = true
        bestScoreNull = scoreNull
        bestScore = score
        bestIdNull = idNull
        bestId = id
      }
      j += 1
    }
    new GenericInternalRow(Array[Any](
      if (bestScoreNull) null else java.lang.Double.valueOf(bestScore),
      if (bestIdNull) null else java.lang.Long.valueOf(bestId)))
  }

  /** struct field 2 of the L2 form: plain ascending id, nulls first. */
  private def cmpIdAsc(aNull: Boolean, a: Long, bNull: Boolean, b: Long): Int =
    if (aNull && bNull) 0
    else if (aNull) -1
    else if (bNull) 1
    else java.lang.Long.compare(a, b)

  /** struct field 2 of the dot form is -id under array_MAX: candidate
    * wins the tie iff its -id is LARGER — i.e. its id is smaller —
    * and a null -id (null id) sorts smallest, losing to any real id.
    */
  private def cmpNegIdDesc(aNull: Boolean, a: Long, bNull: Boolean, b: Long): Boolean =
    if (aNull) false
    else if (bNull) true
    else a < b
}
