package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Native kernel for the PQ encode argmin — each vector's m codes
  * (nearest sub-centroid per subspace) in one pass over the collapsed
  * codebook row ([[graft.vector.Pq.encode]]).
  *
  * Semantically IDENTICAL to the certified nested higher-order-function
  * form
  * {{{
  *   transform(cb, sc ->
  *     array_min(transform(sc.cents, c ->
  *       struct(sqDist(slice(embedding, sc.sub*dsub+1, dsub), c.centroid),
  *              c.cid))).cid)
  * }}}
  * where sqDist is the |a|² − 2·a·b + |b|² expansion with [[DotProduct]]'s
  * left-to-right double accumulation — including every null shape: a
  * ragged slice (length ≠ centroid length) or a null element poisons
  * that centroid's distance to NULL, array_min's struct ordering puts
  * NULL distances FIRST (they win the argmin, tie-broken by cid), an
  * empty or null cents array yields a NULL code. A NULL cb row yields
  * NULL (transform over null), but a NULL EMBEDDING does NOT: only the
  * slice inside the lambda nulls out, so every centroid's d2 is NULL
  * and each subspace falls back to the nulls-first argmin — the
  * expression is therefore null-propagating on `cb` only. PqSpec pins
  * the equivalence against the HOF twin on clustered, ragged,
  * null-element and null-embedding fixtures.
  *
  * Why an expression: encode is the dominant index-BUILD cost at scale —
  * the HOF form interprets m·ks lambda bodies and allocates a slice +
  * m·ks structs per vector (~84 µs/vector measured at 200k×64d), all of
  * which this kernel replaces with three fused primitive loops and zero
  * per-centroid allocation, inside whole-stage codegen (the generated
  * code calls the static kernel below — the [[DeflateLen]] shape).
  * The three accumulators fuse into ONE loop bitwise-exactly: each sum
  * is independent and left-to-right in the same element order.
  */
case class PqEncode(left: Expression, right: Expression, dsub: Int)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType, _),
            ArrayType(StructType(Array(
              StructField(_, IntegerType, _, _),
              StructField(_, ArrayType(StructType(Array(
                StructField(_, IntegerType, _, _),
                StructField(_, ArrayType(FloatType, _), _, _))), _), _, _))), _))
          if dsub > 0 =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) =>
        TypeCheckResult.TypeCheckFailure(
          "graft_pq_encode requires (array<float>, " +
            s"array<struct<sub:int, cents:array<struct<cid:int, centroid:array<float>>>>>) and dsub > 0, got ($l, $r, dsub=$dsub)")
    }

  // array over subs; an element is null only for a null/empty cents
  // entry (array_min of nothing) — mirrored from the HOF form
  override def dataType: DataType = ArrayType(IntegerType, containsNull = true)

  // null only when cb is null — a null embedding still codes (see doc)
  override def nullable: Boolean = right.nullable

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val cb = right.eval(input)
    if (cb == null) null
    else PqEncode.encodeArrays(
      left.eval(input).asInstanceOf[ArrayData], cb.asInstanceOf[ArrayData], dsub)
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
        ${ev.value} = graft.functions.PqEncode.encodeArrays(
          (${l.isNull}) ? null : ${l.value}, ${r.value}, $dsub);
      }""")
  }

  override def prettyName: String = "graft_pq_encode"

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): PqEncode =
    copy(left = newLeft, right = newRight)
}

object PqEncode {

  /** struct(d2, cid) ascending with NULLS FIRST per field — exactly
    * Spark's interpreted struct ordering that array_min applies.
    */
  private def cmpCid(aNull: Boolean, a: Int, bNull: Boolean, b: Int): Int =
    if (aNull && bNull) 0
    else if (aNull) -1
    else if (bNull) 1
    else Integer.compare(a, b)

  /** Static kernel shared by eval and codegen. One output code per cb
    * element, in array order (cb is sorted by sub upstream). For each
    * subspace: argmin over its centroids of the exact
    * (Σa² − 2·Σab) + Σb² double expansion over the dsub-slice at
    * sub·dsub, with [[DotProduct]]'s null poisoning (slice/centroid
    * length mismatch or any null element ⇒ NULL d2, which sorts FIRST)
    * and cid-ascending tie-break. java.lang.Double.compare matches the
    * SQL double ordering on every value this expansion can produce
    * (sums of squares never yield -0.0; NaN sorts last and equals
    * itself in both).
    *
    * Slice bounds follow Spark's `slice` exactly (the HOF twin's
    * spelling): a NEGATIVE sub yields a from-the-end slice start (never
    * an out-of-bounds read), start 0 fails loudly, and a start beyond
    * either end yields the empty slice. A null cents ELEMENT is a
    * candidate with null d2 AND null cid (the twin's transform maps it
    * to struct(null, null), which wins the nulls-first argmin → NULL
    * code) — not skipped.
    */
  def encodeArrays(emb: ArrayData, cb: ArrayData, dsub: Int): ArrayData = {
    val nSubs = cb.numElements()
    val embNull = emb == null
    val embLen = if (embNull) 0 else emb.numElements()
    val out = new Array[Any](nSubs)
    var si = 0
    while (si < nSubs) {
      if (cb.isNullAt(si)) out(si) = null
      else {
        val se = cb.getStruct(si, 2)
        val subNull = se.isNullAt(0)
        if (se.isNullAt(1)) out(si) = null
        else {
          val cents = se.getArray(1)
          val nc = cents.numElements()
          // Spark slice(embedding, sub*dsub+1, dsub) bounds: 1-based
          // start, negative = from the end, 0 = error, out of range =
          // empty. Only evaluated when the twin would evaluate it: the
          // slice sits inside the per-centroid lambda (so an empty
          // cents array never evaluates it) and a null embedding nulls
          // it before start is inspected.
          var begin = 0
          var sliceLen = 0
          if (!subNull && !embNull && nc > 0) {
            val start = se.getInt(0) * dsub + 1
            if (start == 0)
              throw new IllegalStateException(
                "graft_pq_encode: slice start 0 (SQL array indices start at 1 or end at -1)")
            begin = if (start < 0) embLen + start else start - 1
            sliceLen =
              if (begin < 0 || begin >= embLen) 0
              else math.min(dsub, embLen - begin)
          }
          var haveBest = false
          var bestNull = false
          var bestD2 = 0.0
          var bestCidNull = false
          var bestCid = 0
          var j = 0
          while (j < nc) {
            val elemNull = cents.isNullAt(j)
            val ce = if (elemNull) null else cents.getStruct(j, 2)
            val cidNull = elemNull || ce.isNullAt(0)
            val cid = if (cidNull) 0 else ce.getInt(0)
            // a null embedding nulls every slice, hence every d2; a
            // null cents element has null centroid, hence null d2
            var d2Null = subNull || embNull || elemNull
            var d2 = 0.0
            if (!d2Null) {
              if (ce.isNullAt(1)) d2Null = true
              else {
                val cvec = ce.getArray(1)
                if (cvec.numElements() != sliceLen) d2Null = true
                else {
                  var saa = 0.0
                  var sab = 0.0
                  var sbb = 0.0
                  var i = 0
                  while (i < sliceLen && !d2Null) {
                    if (emb.isNullAt(begin + i) || cvec.isNullAt(i)) d2Null = true
                    else {
                      val a = emb.getFloat(begin + i).toDouble
                      val b = cvec.getFloat(i).toDouble
                      saa += a * a
                      sab += a * b
                      sbb += b * b
                    }
                    i += 1
                  }
                  if (!d2Null) d2 = (saa - 2.0 * sab) + sbb
                }
              }
            }
            val better =
              if (!haveBest) true
              else if (d2Null != bestNull) d2Null
              else if (!d2Null) {
                val c = java.lang.Double.compare(d2, bestD2)
                c < 0 || (c == 0 && cmpCid(cidNull, cid, bestCidNull, bestCid) < 0)
              } else cmpCid(cidNull, cid, bestCidNull, bestCid) < 0
            if (better) {
              haveBest = true
              bestNull = d2Null
              bestD2 = d2
              bestCidNull = cidNull
              bestCid = cid
            }
            j += 1
          }
          out(si) =
            if (!haveBest || bestCidNull) null else Integer.valueOf(bestCid)
        }
      }
      si += 1
    }
    new GenericArrayData(out)
  }
}
