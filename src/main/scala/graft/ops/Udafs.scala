package graft.ops

import org.apache.spark.sql.{DataFrame, Encoder, Encoders, SparkSession}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._
import graft.core.{Det, OSql, Q, Tables}

/** Typed UDAF surface: a custom `Aggregator` registered via
  * `functions.udaf` (SURVEY.md §4.3). The aggregator is a classic
  * commutative-monoid shape — (Σ x·w, Σ w) — so Spark runs it as a
  * partial + final aggregate with map-side combine, exactly like a
  * built-in: no extra shuffle at any scale.
  */
object Udafs {

  case class PriceW(price: Double, w: Double)

  /** Discount-weighted average price. */
  object WeightedAvg extends Aggregator[PriceW, (Double, Double), Double] {
    def zero: (Double, Double) = (0.0, 0.0)
    def reduce(b: (Double, Double), a: PriceW): (Double, Double) =
      (b._1 + a.price * a.w, b._2 + a.w)
    def merge(x: (Double, Double), y: (Double, Double)): (Double, Double) =
      (x._1 + y._1, x._2 + y._2)
    def finish(r: (Double, Double)): Double =
      if (r._2 == 0.0) 0.0 else r._1 / r._2
    def bufferEncoder: Encoder[(Double, Double)] =
      Encoders.tuple(Encoders.scalaDouble, Encoders.scalaDouble)
    def outputEncoder: Encoder[Double] = Encoders.scalaDouble
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
    Some("SELECT l_returnflag, " +
      OSql.sround("SUM(l_extendedprice * l_discount) / SUM(l_discount)", 2) +
      " AS wavg_price FROM lineitem GROUP BY 1 ORDER BY 1"))

  val qs: Seq[Q] = Seq(udafWeightedAvg)
}
