package graft.ops

import java.math.{BigDecimal => JBD}

import org.apache.spark.sql.{DataFrame, Encoder, Encoders, SparkSession}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._
import graft.core.{Det, OSql, Q, Tables}

/** Typed UDAF surface: a custom `Aggregator` registered via
  * `functions.udaf` (SURVEY.md §4.3). The aggregator is a classic
  * commutative-monoid shape — (Σ x·w, Σ w) — so Spark runs it as a
  * partial + final aggregate with map-side combine, exactly like a
  * built-in: no extra shuffle at any scale.
  *
  * Determinism: the buffer accumulates in BigDecimal (exact, so the
  * partition-dependent reduce/merge order cannot change the result —
  * mirrors Det.moneySum), and a zero-weight group yields NULL, matching
  * SQL division semantics in the oracle.
  */
object Udafs {

  case class PriceW(price: Double, w: Double)

  /** Discount-weighted average price; NULL when Σw = 0. */
  object WeightedAvg extends Aggregator[PriceW, (JBD, JBD), java.lang.Double] {
    def zero: (JBD, JBD) = (JBD.ZERO, JBD.ZERO)
    def reduce(b: (JBD, JBD), a: PriceW): (JBD, JBD) =
      (b._1.add(JBD.valueOf(a.price).multiply(JBD.valueOf(a.w))),
        b._2.add(JBD.valueOf(a.w)))
    def merge(x: (JBD, JBD), y: (JBD, JBD)): (JBD, JBD) =
      (x._1.add(y._1), x._2.add(y._2))
    def finish(r: (JBD, JBD)): java.lang.Double =
      if (r._2.signum == 0) null
      else java.lang.Double.valueOf(r._1.doubleValue / r._2.doubleValue)
    def bufferEncoder: Encoder[(JBD, JBD)] =
      Encoders.tuple(Encoders.DECIMAL, Encoders.DECIMAL)
    def outputEncoder: Encoder[java.lang.Double] = Encoders.DOUBLE
  }

  private val udafWeightedAvg = Q(
    "udaf_weighted_avg",
    (s, d) => {
      import s.implicits._
      val wavg = udaf(WeightedAvg, Encoders.product[PriceW])
      Tables.t(s, d, "lineitem")
        .groupBy("l_returnflag")
        .agg(Det.dround(wavg($"l_extendedprice", $"l_discount"), 2).as("wavg_price"))
        .orderBy("l_returnflag")
    },
    // The oracle sums in decimal too (prices/discounts are exact 2dp
    // values, so DECIMAL(18,4)/DECIMAL(8,4) represent them exactly and
    // both engines' sums are order-independent); only the final divide
    // happens in double, identically.
    Some("SELECT l_returnflag, " +
      OSql.sround("CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4)) * " +
        "CAST(l_discount AS DECIMAL(8,4))) AS DOUBLE) / " +
        "CAST(SUM(CAST(l_discount AS DECIMAL(8,4))) AS DOUBLE)", 2) +
      " AS wavg_price FROM lineitem GROUP BY 1 ORDER BY 1"))

  val qs: Seq[Q] = Seq(udafWeightedAvg)
}
