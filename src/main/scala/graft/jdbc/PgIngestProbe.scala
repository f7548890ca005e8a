package graft.jdbc

import org.apache.spark.sql.SparkSession

import graft.Flaco
import graft.sources.Corpus

/** Live-PG ingest probe — the reference's HEADLINE benchmark shape
  * (`/root/reference/benchmarks/README.md`: full-table ingest of
  * ~600k rows from PostgreSQL into client memory, ≈0.6 s for flaco's
  * native wire client) measured over THIS repo's wire path:
  * PostgreSQL 15 → [[MiniPgDriver]] (v3 simple-query, text format) →
  * Spark JDBC source → DataFrame, fully materialized.
  *
  * Context for the number this prints (recorded in SCALING.md): the
  * production path for PG ingest is pgjdbc (binary-capable, buffered,
  * zero reflection) — [[MiniPgDriver]] exists so the live gates can
  * run in a pgjdbc-less sandbox, and its per-cell costs (text parse +
  * reflective proxy dispatch) are NOT the engine's scan path, which
  * BENCH_r{N} measures over parquet. This probe still bounds the
  * harness driver honestly against the reference's headline, single
  * connection vs single connection, and shows the partitioned read
  * amortizing it.
  *
  * Usage (cluster via scripts/pg_provision.sh):
  *   FLACO_PG_URI='jdbc:postgresql://localhost:5544/postgres?user=postgres' \
  *   SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
  *     sbt "runMain graft.jdbc.PgIngestProbe"
  */
object PgIngestProbe {
  def main(args: Array[String]): Unit = {
    val uri = sys.env.getOrElse("FLACO_PG_URI",
      sys.error("FLACO_PG_URI not set — provision via scripts/pg_provision.sh"))
    val sf = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.types.FlacoPostgresDialect.register()
    MiniPgDriver.ensureRegistered()

    val li = Corpus.read(spark, sf, "lineitem")
    val n = li.count()
    val tLoad0 = System.nanoTime()
    li.write.mode("overwrite").jdbc(uri, "lineitem_probe",
      new java.util.Properties())
    val tLoad = (System.nanoTime() - tLoad0) / 1e9

    // Count via a row hash over EVERY column so Spark cannot prune
    // the JDBC projection down to `SELECT 1` — the timing must cover
    // full-row wire transfer + per-cell decode, like the reference's
    // ingest does.
    def materialize(df: org.apache.spark.sql.DataFrame): Long = {
      val r = df.selectExpr("count(*) AS n",
        "bit_xor(xxhash64(*)) AS h").head()
      require(!r.isNullAt(1))
      r.getLong(0)
    }
    def timed(body: => Long): (Long, Double) = {
      val t0 = System.nanoTime()
      val rows = body
      (rows, (System.nanoTime() - t0) / 1e9)
    }
    // Warm one small read (driver/codegen init out of the timing).
    materialize(Flaco.readSqlToDataFrame(spark, uri,
      "select * from lineitem_probe limit 10")): Unit
    val (r1, t1) = timed(materialize(Flaco.readSqlToDataFrame(spark, uri,
      "select * from lineitem_probe")))
    val (r4, t4) = timed(materialize(Flaco.readSqlToDataFrame(spark, uri,
      "select * from lineitem_probe",
      partitionColumn = Some(("l_orderkey", 0L, 6000000L, 4)))))
    require(r1 == n && r4 == n, s"row drift: $n vs $r1/$r4")
    println(s"""{"metric":"pg_ingest","rows":$n,""" +
      f""""load_via_wire_sec":$tLoad%.2f,"read_1conn_sec":$t1%.2f,""" +
      f""""read_4part_sec":$t4%.2f}""")
    spark.stop()
  }
}
