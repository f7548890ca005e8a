package graft.functions

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.operators.TextAnalysis

/** The MinHash/Jaccard kernels must be bit-identical to the
  * declarative formulations they replace (which are what the DuckDB
  * oracle still computes): signature = per-doc min of 8-hex-char
  * windows over exploded shingle md5s; jaccard = count-the-commons
  * over distinct shingle sets.
  */
class MinHashSpec extends AnyFunSuite {

  private def spark = TestSpark.spark
  private def sf = TestSpark.sf

  private def docs = spark.read.parquet(s"$sf/documents.parquet")

  test("signature kernel equals the declarative explode+min formulation") {
    val viaKernel = docs
      .select(col("doc_id"), MinHashFunctions
        .minhash_signature(TextAnalysis.tokens(col("text"))).as("sig"))
      .filter(col("sig").isNotNull)
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap

    val sh = docs
      .withColumn("toks", TextAnalysis.tokens(col("text")))
      .withColumn("shingle", explode(expr(
        """CASE WHEN size(toks) >= 3
          |THEN transform(sequence(1, size(toks) - 2),
          |               i -> concat(toks[i-1], ' ', toks[i], ' ', toks[i+1]))
          |ELSE array() END""".stripMargin)))
      .select(col("doc_id"), col("shingle"))
    val viaExplode = sh.select(col("doc_id") +: (0 until 8).map { i =>
        val digest = if (i < 4) md5(col("shingle"))
                     else md5(concat(lit("x"), col("shingle")))
        substring(digest, (i % 4) * 8 + 1, 8).as(s"h$i")
      }: _*)
      .groupBy(col("doc_id"))
      .agg(min(col("h0")).as("m0"),
        (1 until 8).map(i => min(col(s"h$i")).as(s"m$i")): _*)
      .collect().map(r => r.getLong(0) -> (0 until 8).map(i => r.getString(i + 1)))
      .toMap

    assert(viaKernel.keySet === viaExplode.keySet)
    assert(viaKernel.nonEmpty)
    viaKernel.foreach { case (id, sig) =>
      assert(sig.toSeq === viaExplode(id).toSeq, s"signature mismatch for doc $id")
    }
  }

  test("signature from sorted shingles equals signature from tokens " +
    "(the r22 shared-pass form)") {
    // The shared-pass banding (q226/q229) derives the signature from
    // the per-doc DISTINCT shingle array instead of the token walk;
    // the two must agree on every corpus doc (min is dedup-invariant).
    val rows = docs
      .select(col("doc_id"),
        MinHashFunctions
          .minhash_signature(TextAnalysis.tokens(col("text"))).as("sig"),
        MinHashFunctions.minhash_signature_from_shingles(
          MinHashFunctions.sorted_shingles(
            TextAnalysis.tokens(col("text")))).as("sig2"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.isNullAt(1) === r.isNullAt(2),
        s"null mismatch for doc ${r.getLong(0)}")
      if (!r.isNullAt(1))
        assert(r.getSeq[String](1) === r.getSeq[String](2),
          s"signature mismatch for doc ${r.getLong(0)}")
    }
  }

  test("signature is null for docs with fewer than 3 tokens") {
    val s = spark
    import s.implicits._
    val got = Seq("one two", "", "a b c").toDF("text")
      .select(MinHashFunctions
        .minhash_signature(TextAnalysis.tokens(col("text"))).as("sig"))
      .collect()
    assert(got(0).isNullAt(0))
    assert(got(1).isNullAt(0))
    assert(!got(2).isNullAt(0))
    assert(got(2).getSeq[String](0).length === 8)
    assert(got(2).getSeq[String](0).forall(_.matches("[0-9a-f]{8}")))
  }

  test("simhash32 kernel equals the declarative explode+vote formulation") {
    val viaKernel = docs
      .select(col("doc_id"), MinHashFunctions
        .simhash32(TextAnalysis.tokens(col("text"))).as("h"))
      .filter(col("h").isNotNull)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

    val d = docs
      .select(col("doc_id"), explode(TextAnalysis.tokens(col("text"))).as("tok"))
      .withColumn("h", md5(col("tok")))
    val voteCols = (1 to 32).map { p =>
      sum(when(conv(col("h").substr(p, 1), 16, 10).cast("int") >= 8, 1)
        .otherwise(-1)).as(s"v$p")
    }
    val weight = (1 to 32).map { p =>
      when(col(s"v$p") > 0, lit(1L << (32 - p))).otherwise(0L)
    }.reduce(_ + _)
    val viaExplode = d.groupBy(col("doc_id"))
      .agg(voteCols.head, voteCols.tail: _*)
      .select(col("doc_id"), weight.as("h"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

    assert(viaKernel === viaExplode)
    assert(viaKernel.nonEmpty)
  }

  test("top_gram_count equals a hand-counted repetition profile") {
    val s = spark
    import s.implicits._
    val got = Seq(
      "a b a b a b",      // 2-grams: "a b"x3, "b a"x2 -> 3
      "x y z",            // all distinct -> 1
      "w w w w",          // "w w"x3 -> 3
      "solo",             // no 2-grams -> null
      "")                 // no tokens -> null
      .toDF("text")
      .select(MinHashFunctions.top_gram_count(
        TextAnalysis.tokens(col("text")), 2).as("c"))
      .collect()
    assert(got(0).getLong(0) === 3L)
    assert(got(1).getLong(0) === 1L)
    assert(got(2).getLong(0) === 3L)
    assert(got(3).isNullAt(0))
    assert(got(4).isNullAt(0))
  }

  test("text kernels are callable from SQL via the session extensions") {
    val r = spark.sql(
      """select simhash32(array('a','b')) as h,
        |  shingle_jaccard(sorted_shingles(array('a','b','c','d')),
        |                  sorted_shingles(array('a','b','c','e'))) as j,
        |  size(minhash_signature(array('a','b','c'))) as m,
        |  top_gram_count(array('a','b','a','b'), 2) as t""".stripMargin)
      .collect().head
    assert(r.getLong(0) > 0L)
    assert(math.abs(r.getDouble(1) - 1.0 / 3) < 1e-12)
    assert(r.getInt(2) === 8)
    assert(r.getLong(3) === 2L)
  }

  private val tokenGen: Gen[Seq[String]] =
    Gen.listOfN(12, Gen.oneOf("a", "b", "c", "dd", "é", "x1"))

  /** Plain-Scala reference Jaccard over distinct 3-gram sets. */
  private def refJaccard(a: Seq[String], b: Seq[String]): Double = {
    def sh(t: Seq[String]) = t.sliding(3).filter(_.size == 3)
      .map(_.mkString(" ")).toSet
    val (sa, sb) = (sh(a), sh(b))
    if (sa.isEmpty || sb.isEmpty) 0.0
    else (sa & sb).size.toDouble / (sa | sb).size
  }

  test("jaccard kernel equals a plain-Scala reference on random token lists [property]") {
    val s = spark
    import s.implicits._
    // Batch the generated cases into ONE Spark job — a job per sample
    // would dominate the suite runtime.
    val cases = Gen.listOfN(60, Gen.zip(tokenGen, tokenGen))
      .sample.getOrElse(Seq.empty).toSeq
    assert(cases.nonEmpty)
    val got = cases.toDF("ta", "tb")
      .select(MinHashFunctions.shingle_jaccard(
        MinHashFunctions.sorted_shingles(col("ta")),
        MinHashFunctions.sorted_shingles(col("tb"))))
      .collect().map(_.getDouble(0))
    cases.zip(got).foreach { case ((a, b), g) =>
      assert(math.abs(g - refJaccard(a, b)) < 1e-12, s"tokens $a vs $b")
    }
    // Keep the Prop machinery honest on the pure-Scala halves too.
    val prop = Prop.forAll(tokenGen, tokenGen) { (a, b) =>
      val j = refJaccard(a, b)
      j >= 0.0 && j <= 1.0 && (refJaccard(a, a) == 1.0 || a.size < 3)
    }
    assert(SCTest.check(SCTest.Parameters.default, prop).passed)
  }

  test("shingle_jaccard equals the declarative distinct-set count") {
    val s = spark
    import s.implicits._
    val pairs = Seq(
      ("a b c d e", "a b c d e"),          // identical -> 1
      ("a b c d e", "x y z w v"),          // disjoint -> 0
      ("a b c d",   "b c d e"),            // {abc,bcd} vs {bcd,cde} -> 1/3
      ("a b c a b c a b c",  "a b c x"),   // duplicate shingles collapse
      ("a b",       "a b c"))              // no shingles on one side -> 0
      .toDF("ta", "tb")
      .select(MinHashFunctions.shingle_jaccard(
        MinHashFunctions.sorted_shingles(TextAnalysis.tokens(col("ta"))),
        MinHashFunctions.sorted_shingles(TextAnalysis.tokens(col("tb")))).as("j"))
      .collect().map(_.getDouble(0))
    assert(pairs(0) === 1.0)
    assert(pairs(1) === 0.0)
    assert(math.abs(pairs(2) - 1.0 / 3) < 1e-12)
    // {abc,bca,cab,abc...} distinct = {a b c, b c a, c a b} vs {a b c, b c x}
    assert(math.abs(pairs(3) - 1.0 / 4) < 1e-12)
    assert(pairs(4) === 0.0)
  }

  test("excise kernels: edge cases the corpus gate may never hit") {
    val s = spark
    import s.implicits._
    val set = new java.util.HashSet[org.apache.spark.unsafe.types.UTF8String]()
    set.add(org.apache.spark.unsafe.types.UTF8String.fromString("a b c"))
    val bc = s.sparkContext.broadcast(set)
    val rows = Seq(
      "a b c",          // fully covered -> ""
      "a b c d",        // positions 0-2 covered -> "d"
      "x a b c y",      // middle covered -> "x y"
      "a b",            // < 3 tokens -> unchanged
      "",               // empty -> ""
      "x y z")          // no hit -> unchanged
      .toDF("t")
      .select(graft.functions.MinHashFunctions
        .excise_shared(TextAnalysis.tokens(col("t")), bc).as("c"))
      .collect().map(_.getString(0))
    assert(rows.toSeq == Seq("", "d", "x y", "a b", "", "x y z"))

    // excise_at must build the identical string from explicit
    // positions — including out-of-range positions ignored (the
    // verified join can never produce them; the kernel still must
    // not crash on a malformed caller).
    val at = Seq(
      ("a b c d", Seq(0L, 1L, 2L)),
      ("x a b c y", Seq(1L, 2L, 3L)),
      ("x y z", Seq.empty[Long]),
      ("x y z", Seq(-1L, 99L)))
      .toDF("t", "p")
      .select(graft.functions.MinHashFunctions
        .excise_at(TextAnalysis.tokens(col("t")), col("p")).as("c"))
      .collect().map(_.getString(0))
    assert(at.toSeq == Seq("d", "x y", "x y z", "x y z"))
  }

  test("excise_shared equals a brute-force reference on random docs") {
    val s = spark
    import s.implicits._
    // Tiny alphabet so shared shingles actually occur.
    val tokGen = Gen.listOfN(12, Gen.oneOf("a", "b", "c")).map(_.mkString(" "))
    val docs = Gen.listOfN(60, tokGen).sample.getOrElse(Nil)
    assert(docs.nonEmpty)
    // Shared set: every 3-gram appearing in >= 2 docs (the q190 rule).
    def grams(t: String): Seq[String] = {
      val w = t.split("\\s+").filter(_.nonEmpty)
      (0 to w.length - 3).map(i => s"${w(i)} ${w(i + 1)} ${w(i + 2)}")
    }
    val df2 = docs.map(d => grams(d).toSet)
      .foldLeft(Map.empty[String, Int]) { (m, g) =>
        g.foldLeft(m)((mm, x) => mm.updated(x, mm.getOrElse(x, 0) + 1))
      }.filter(_._2 >= 2).keySet
    def refExcise(t: String): String = {
      val w = t.split("\\s+").filter(_.nonEmpty)
      val cov = Array.fill(w.length)(false)
      for (i <- 0 to w.length - 3
           if df2(s"${w(i)} ${w(i + 1)} ${w(i + 2)}")) {
        cov(i) = true; cov(i + 1) = true; cov(i + 2) = true
      }
      w.indices.filterNot(cov).map(w).mkString(" ")
    }
    val set = new java.util.HashSet[org.apache.spark.unsafe.types.UTF8String]()
    df2.foreach(g => set.add(
      org.apache.spark.unsafe.types.UTF8String.fromString(g)))
    val bc = s.sparkContext.broadcast(set)
    val got = docs.toDF("t")
      .select(graft.functions.MinHashFunctions
        .excise_shared(TextAnalysis.tokens(col("t")), bc).as("c"))
      .collect().map(_.getString(0))
    docs.zip(got).foreach { case (d, g) =>
      assert(g == refExcise(d), s"doc '$d'")
    }
  }

  test("dsir_buckets kernel equals the declarative md5-prefix " +
    "transform (the q240/qS04 oracle formulation)") {
    val both = docs
      .withColumn("toks", TextAnalysis.tokens(col("text")))
      .select(
        MinHashFunctions.dsir_buckets(col("toks"), 1024).as("k"),
        expr("transform(slice(toks, 1, greatest(size(toks) - 1, 0)), " +
          "(t, i) -> cast(conv(substring(md5(concat(t, ' ', " +
          "toks[i + 1])), 1, 3), 16, 10) as int) % 1024)").as("d"))
      .collect()
    assert(both.nonEmpty)
    both.foreach { r =>
      assert(r.getSeq[Int](0) === r.getSeq[Int](1))
    }
  }
}
