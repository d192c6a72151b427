package graft.functions

import org.apache.spark.sql.{Encoder, Encoders, Row}
import org.apache.spark.sql.expressions.Aggregator

/** Second-moment accumulator: the single-pass, mergeable state behind
  * stddev/variance/correlation. This is the UDAF (custom typed
  * aggregate) surface of the engine — the same partial/merge shape
  * Spark's built-in moments use, so it combines map-side and shuffles
  * only the 6-number state per group.
  */
final case class Moments(
    n: Long, sx: Double, sxx: Double,
    sy: Double, syy: Double, sxy: Double) {
  def add(x: Double, y: Double): Moments =
    Moments(n + 1, sx + x, sxx + x * x, sy + y, syy + y * y, sxy + x * y)
  def merge(o: Moments): Moments =
    Moments(n + o.n, sx + o.sx, sxx + o.sxx, sy + o.sy, syy + o.syy, sxy + o.sxy)
  /** Sample variance of x (n−1 denominator). */
  def varX: Double = (sxx - sx * sx / n) / (n - 1)
  def varY: Double = (syy - sy * sy / n) / (n - 1)
  /** Sample Pearson correlation of (x, y). */
  def corr: Double = {
    val cov = (sxy - sx * sy / n) / (n - 1)
    cov / math.sqrt(varX * varY)
  }
}

object Moments {
  val zero: Moments = Moments(0L, 0, 0, 0, 0, 0)
}

/** Typed Aggregator over (x, y) pairs producing the merged [[Moments]];
  * register with `functions.udaf(new MomentsAggregator)` and finish
  * with the moment of interest. Exercised by UdafSpec against the A09
  * contract hash (stddev/var/corr per group).
  */
class MomentsAggregator extends Aggregator[Row, Moments, Row] {
  override def zero: Moments = Moments.zero
  override def reduce(b: Moments, in: Row): Moments =
    b.add(in.getDouble(0), in.getDouble(1))
  override def merge(a: Moments, b: Moments): Moments = a.merge(b)
  override def finish(m: Moments): Row = Row(m.varX, m.varY, m.corr)
  override def bufferEncoder: Encoder[Moments] = Encoders.product[Moments]
  override def outputEncoder: Encoder[Row] =
    Encoders.row(org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("var_x", org.apache.spark.sql.types.DoubleType),
      org.apache.spark.sql.types.StructField("var_y", org.apache.spark.sql.types.DoubleType),
      org.apache.spark.sql.types.StructField("corr", org.apache.spark.sql.types.DoubleType))))
}
