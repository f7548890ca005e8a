package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** The cross-engine exactness conventions every timestamp/money gate
  * shares with its DuckDB oracle — kept in ONE place because they are
  * load-bearing: a gate that truncates or scales differently from the
  * rest of the suite silently disagrees with its oracle only at
  * corner values.
  */
object Exact {

  /** Microsecond epoch of the events-table `ts` (TIMESTAMP(NANOS) in
    * parquet, read truncated to µs by Corpus) — exact integers in
    * both engines; the oracle twin is
    * `epoch_us(CAST(ts AS TIMESTAMP))`.
    */
  def micros: Column = expr("unix_micros(cast(ts as timestamp))")

  /** [[micros]] integer-divided by `unitUs` (epoch hours, days, …).
    * Always SQL `div`, never `Column./`: `/` on longs is IEEE double
    * division, which rounds a 1 µs-before-boundary timestamp into the
    * NEXT bucket once epoch-µs outgrows double precision.
    */
  def microsDiv(unitUs: Long): Column =
    expr(s"unix_micros(cast(ts as timestamp)) div $unitUs")

  /** Exact integer cents of a 2-decimal money/value column — the
    * oracle twin is `CAST(round(x * 100) AS BIGINT)`.
    */
  def cents(c: Column): Column = round(c * 100).cast("long")
}
