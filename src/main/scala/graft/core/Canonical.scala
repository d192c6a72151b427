package graft.core

import java.security.MessageDigest
import java.time.{Instant, LocalDate, ZoneOffset}
import java.time.format.DateTimeFormatter

import org.apache.spark.sql.{DataFrame, Row}

/** Canonical result rendering + hashing — the exact protocol of
  * SURVEY.md §2.2 (used there to certify DuckDB ≡ Spark for all 55
  * contract queries). The first 16 hex chars of the SHA-256 must equal
  * the `hash01`/`hash1` columns of SURVEY.md §2.4.
  *
  *  - NULL → "NULL"; boolean → "true"/"false"; integers → decimal string
  *  - float/double/decimal: integral and |v| < 1e15 → integer string,
  *    else "%.6f" with trailing zeros then a trailing '.' stripped
  *  - timestamp → `yyyy-MM-dd HH:mm:ss` (UTC), plus `.ffffff` only when
  *    the microsecond component is nonzero; date → `yyyy-MM-dd`
  *  - array → '[' + comma-joined element tokens + ']'
  *  - tokens joined with '|', rows with '\n', no trailing newline
  */
object Canonical {

  private val tsFmt =
    DateTimeFormatter.ofPattern("yyyy-MM-dd HH:mm:ss").withZone(ZoneOffset.UTC)

  def token(v: Any): String = v match {
    case null => "NULL"
    case b: Boolean => if (b) "true" else "false"
    case i: Int => i.toString
    case l: Long => l.toString
    case s: Short => s.toString
    case b: Byte => b.toString
    case s: String => s
    case f: Float => num(f.toDouble)
    case d: Double => num(d)
    case d: java.math.BigDecimal => dec(BigDecimal(d))
    case d: BigDecimal => dec(d)
    case i: Instant => ts(i)
    case t: java.sql.Timestamp => ts(t.toInstant)
    // TIMESTAMP_NTZ collects as LocalDateTime; interpret as UTC wall time
    case t: java.time.LocalDateTime => ts(t.toInstant(ZoneOffset.UTC))
    case d: LocalDate => d.toString
    case d: java.sql.Date => d.toLocalDate.toString
    case a: scala.collection.Seq[_] =>
      a.map(token).mkString("[", ",", "]")
    case a: Array[_] => a.map(token).mkString("[", ",", "]")
    case r: Row => r.toSeq.map(token).mkString("[", ",", "]")
    case other => other.toString
  }

  private def num(d: Double): String =
    if (d.isWhole && math.abs(d) < 1e15) d.toLong.toString
    else strip(f"$d%.6f")

  private def dec(d: BigDecimal): String = {
    val s = d.bigDecimal.stripTrailingZeros
    if (s.scale <= 0 && d.abs < BigDecimal("1e15"))
      s.toBigIntegerExact.toString
    else strip(s.toPlainString match {
      case p if !p.contains('.') => p
      case p =>
        // re-render at 6 fractional digits like "%.6f"
        new java.math.BigDecimal(p).setScale(6, java.math.RoundingMode.HALF_UP).toPlainString
    })
  }

  private def strip(s: String): String = {
    var out = if (s.contains('.')) s.reverse.dropWhile(_ == '0').reverse else s
    if (out.endsWith(".")) out = out.dropRight(1)
    out
  }

  private def ts(i: Instant): String = {
    val base = tsFmt.format(i)
    val micros = i.getNano / 1000
    if (micros == 0) base else base + f".$micros%06d"
  }

  def renderRow(r: Row): String = r.toSeq.map(token).mkString("|")

  def render(rows: Seq[Row]): String = rows.map(renderRow).mkString("\n")

  def sha256Hex(s: String): String =
    MessageDigest.getInstance("SHA-256")
      .digest(s.getBytes("UTF-8"))
      .map(b => f"$b%02x").mkString

  /** Collect (in the plan's ORDER BY order) and hash; returns the first
    * 16 hex chars — comparable to SURVEY.md §2.4.
    */
  def hash16(df: DataFrame): String =
    sha256Hex(render(df.collect().toSeq)).take(16)
}
