package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Typed UDAF example (SURVEY.md §2.2 UDF/UDAF row): sum of the k
  * largest values per group, as an `Aggregator` with a bounded
  * buffer. The buffer keeps at most k values, so partial aggregation
  * ships k doubles per group per partition — a fixed-size sketch, the
  * same scale contract as approx_count_distinct. (A window row_number
  * ≤ k does the same job with a full shuffle + sort of every row;
  * this is the map-side-combine formulation.)
  *
  * The final sum is computed in BigDecimal(6dp) over the sorted
  * values — exact, order-free, reproducible in the DuckDB oracle.
  */
class TopKSumAgg(k: Int) extends Aggregator[Double, Seq[Double], Double] {

  /** Insert keeping the k largest (buffer sorted ascending). */
  private def insert(buf: Seq[Double], v: Double): Seq[Double] = {
    if (buf.length < k) (buf :+ v).sorted
    else if (v <= buf.head) buf
    else (buf.tail :+ v).sorted
  }

  override def zero: Seq[Double] = Seq.empty
  override def reduce(buf: Seq[Double], v: Double): Seq[Double] = insert(buf, v)
  override def merge(a: Seq[Double], b: Seq[Double]): Seq[Double] =
    b.foldLeft(a)(insert)
  override def finish(buf: Seq[Double]): Double =
    buf.map(java.math.BigDecimal.valueOf(_)
        .setScale(6, java.math.RoundingMode.HALF_UP))
      .foldLeft(java.math.BigDecimal.ZERO)(_.add(_))
      .setScale(2, java.math.RoundingMode.HALF_UP).doubleValue
  override def bufferEncoder: Encoder[Seq[Double]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Double]]()
  override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
}

object TopKSumAgg {
  /** Column form: `df.groupBy(...).agg(TopKSumAgg.topKSum(3, col))`. */
  def topKSum(k: Int, c: Column): Column = {
    implicit val de: Encoder[Double] = Encoders.scalaDouble
    udaf(new TopKSumAgg(k)).apply(c)
  }
}
