package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.{MediaFunctions, MediaKernel}
import graft.sources.Corpus

/** Multimodal-column plumbing (north-star extension): media payloads
  * travel as opaque `binary` columns with typed metadata alongside.
  * The container has no codec libraries, so payloads are synthesized
  * — but with REAL container headers: [[graft.functions.MediaKernel]]
  * wraps each document's bytes in a spec-conformant PNG (signature +
  * IHDR + CRC32) or BMP (file + info header), and the decode kernel
  * parses width/height/format back OUT of those header bytes. Encode
  * and decode are independent directions of the published byte
  * layouts, so the oracle (which recomputes the dimensions
  * arithmetically) checks a genuine parse, not an echo. The rest of
  * the plumbing is production-shaped: binary column construction via
  * a codegen'd expression, per-partition batch processing via
  * `mapPartitions` (the Scala analogue of `mapInPandas` batch UDFs),
  * typed `Dataset[MediaMeta]` out. A real deployment swaps
  * [[MediaKernel.parse]]'s byte arithmetic for a full codec; every
  * surrounding shape stays.
  */
object Multimodal {

  /** Decoded-media metadata record (what a real image decode yields). */
  case class MediaMeta(
      doc_id: Long, n_bytes: Long, width: Int, height: Int,
      format: String, checksum: String)

  /** Header-parsing decode: dimensions and format come from the
    * payload's PNG IHDR / BMP info-header bytes ([[MediaKernel
    * .parse]]); the checksum digests the full payload. Takes the
    * digest instance from the caller so the per-partition loop
    * allocates it once, not per row.
    */
  def decodeMedia(docId: Long, payload: Array[Byte],
      md: java.security.MessageDigest): MediaMeta = {
    val (w, h, format) = MediaKernel.parse(payload)
    md.reset()
    val checksum = md.digest(payload).map("%02x".format(_)).mkString
    MediaMeta(docId, payload.length.toLong, w, h, format, checksum)
  }

  def decodeMedia(docId: Long, payload: Array[Byte]): MediaMeta =
    decodeMedia(docId, payload, java.security.MessageDigest.getInstance("MD5"))

  /** documents.text wrapped into genuinely-headered binary payloads —
    * stands in for an image bytes column with the same Spark
    * semantics. `content` (the raw bytes) rides along for stats that
    * are content-level rather than container-level.
    */
  def payloads(spark: SparkSession, dir: String): DataFrame =
    Corpus.read(spark, dir, "documents")
      .select(col("doc_id"), col("source"),
        encode(col("text"), "UTF-8").as("content"))
      .withColumn("payload",
        MediaFunctions.media_wrap(col("doc_id"), col("content")))

  /** Per-partition batched decode: Dataset[MediaMeta] out. The
    * partition hook is where a real decoder amortizes setup (codec
    * init, model load); here it amortizes the digest instance.
    */
  def decodeAll(spark: SparkSession, dir: String): Dataset[MediaMeta] = {
    import spark.implicits._
    payloads(spark, dir)
      .select(col("doc_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        val md = java.security.MessageDigest.getInstance("MD5")
        it.map { case (id, bytes) => decodeMedia(id, bytes, md) }
      }
  }

  /** The oracle-checked slice of [[decodeAll]]: everything except the
    * payload checksum (md5 over bytes only Spark assembled — DuckDB
    * cannot rebuild the binary container to digest it). The oracle
    * recomputes n_bytes/width/height/format ARITHMETICALLY from
    * doc_id and text length; the engine recovers them by parsing the
    * header bytes — two independent encodings of the layout, the q46
    * pattern.
    */
  def decodeMeta(spark: SparkSession, dir: String): DataFrame =
    decodeAll(spark, dir).toDF()
      .select(col("doc_id"), col("n_bytes"),
        col("width").cast("long").as("width"),
        col("height").cast("long").as("height"),
        col("format"))
      .orderBy(col("doc_id"))

  /** One payload through parse → fit → re-wrap → re-parse. Corrupt
    * payloads honor parse()'s degrade-don't-throw contract: they come
    * back as a filterable "unknown" row (zero dims, original byte
    * count), never "resized" into a fake 0×0 container and never an
    * exception — a corrupt row in a 100 TB corpus must not fail the
    * job.
    */
  def resizeOne(id: Long, payload: Array[Byte],
      box: Int): (Long, Long, Long, Long, Long, String, Long) = {
    val (w, h, format) = MediaKernel.parse(payload)
    if (format == "unknown") {
      (id, 0L, 0L, 0L, 0L, "unknown", payload.length.toLong)
    } else {
      val (nw, nh) = MediaKernel.fitInto(w, h, box)
      val headerLen = if (format == "png") MediaKernel.PngHeaderBytes
        else MediaKernel.BmpHeaderBytes
      val content = java.util.Arrays.copyOfRange(
        payload, headerLen, payload.length)
      val resized = MediaKernel.wrapDims(format == "png", nw, nh, content)
      val (vw, vh, vf) = MediaKernel.parse(resized)
      (id, w.toLong, h.toLong, vw.toLong, vh.toLong, vf,
        resized.length.toLong)
    }
  }

  /** Resize-to-fit transform: parse each payload's header, compute
    * the fit-into-256×256 target dims (exact integer arithmetic,
    * downscale only), RE-WRAP the content under the new header, and
    * re-parse the resized payload — so the reported new dims come
    * from bytes the transform actually wrote, not from the formula.
    * A real deployment swaps the content passthrough for pixel
    * resampling; header surgery, batch iteration, and the verify-by-
    * reparse loop are the production shape.
    */
  def resizeMeta(spark: SparkSession, dir: String, box: Int = 256): DataFrame = {
    import spark.implicits._
    payloads(spark, dir)
      .select(col("doc_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, payload) => resizeOne(id, payload, box) })
      .toDF("doc_id", "width", "height", "new_width", "new_height",
        "format", "n_bytes")
      .orderBy(col("doc_id"))
  }

  /** Frame sampling over an opaque stream payload (the video/audio
    * stand-in): the content splits into fixed 256-byte frames (last
    * frame may be short) and every 4th frame is sampled — the frame
    * extraction a vision pipeline runs before per-frame decode. The
    * kernel SLICES the real byte ranges and reports what it sliced;
    * the oracle recomputes the counts arithmetically from the content
    * length.
    */
  val FrameBytes = 256
  val FrameStride = 4

  def frameSample(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    payloads(spark, dir)
      .select(col("doc_id"), col("content"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, content) =>
          val frames = content.grouped(FrameBytes).toArray
          val sampled = frames.zipWithIndex
            .collect { case (f, i) if i % FrameStride == 0 => f }
          (id, frames.length.toLong, sampled.length.toLong,
            sampled.map(_.length.toLong).sum)
        }
      }
      .toDF("doc_id", "n_frames", "n_sampled", "sampled_bytes")
      .orderBy(col("doc_id"))
  }

  /** Declarative payload-level stats per source — byte accounting a
    * media pipeline runs before any decode: payload sizes (container
    * overhead included — the oracle checks the exact per-format
    * header cost) and distinct-content count (md5 over the content
    * bytes, which DuckDB mirrors as md5(text)).
    */
  def mediaStats(spark: SparkSession, dir: String): DataFrame =
    payloads(spark, dir)
      .withColumn("n_bytes", octet_length(col("payload")).cast("long"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_media"),
        sum(col("n_bytes")).as("total_bytes"),
        countDistinct(md5(col("content"))).as("n_distinct"))
      .orderBy(col("source"))

  /** ViT patch-grid manifest (q212) — the sequence-budget planning a
    * vision-transformer ingest runs over raw image metadata BEFORE
    * any pixel decode: pad each image up to the patch multiple,
    * count the patch grid, derive the transformer sequence length
    * (+1 CLS token), and flag images whose grid exceeds the patch
    * budget for the downscale path. Dims come from parsing the real
    * container headers ([[decodeAll]]'s PNG/BMP parse); the oracle
    * re-derives them arithmetically — the q33 independent-encoding
    * pattern. All arithmetic exact-integer ceil-division.
    *
    * Scale: one mapPartitions header parse + per-row projection; no
    * shuffle at all (the ORDER BY is the gate's determinism, dropped
    * in production).
    */
  /** q212's default patch budget — named because the oracle SQL
    * interpolates the same value. Chosen so the GATE corpus (sf0.01:
    * dims 64..563 × 64..480) genuinely exercises both branches of
    * the flag (96/500 docs exceed it); a production ViT budget
    * (1024/4096 patches) would leave the flag dead on fixture-sized
    * images.
    */
  val PatchBudget = 600L

  def patchGrid(spark: SparkSession, dir: String,
      patch: Int = 16, maxPatches: Long = PatchBudget): DataFrame =
    decodeAll(spark, dir).toDF()
      .select(col("doc_id"), col("width").cast("long").as("width"),
        col("height").cast("long").as("height"))
      .withColumn("grid_w", expr(s"(width + $patch - 1) div $patch"))
      .withColumn("grid_h", expr(s"(height + $patch - 1) div $patch"))
      .withColumn("pad_w", col("grid_w") * patch - col("width"))
      .withColumn("pad_h", col("grid_h") * patch - col("height"))
      .withColumn("n_patches", col("grid_w") * col("grid_h"))
      .withColumn("seq_len", col("n_patches") + 1)
      .withColumn("needs_downscale",
        (col("n_patches") > maxPatches).cast("long"))
      .orderBy(col("doc_id"))

  /** Max Hamming distance for a q181 perceptual near-dup pair —
    * lossless under 4×16-bit banding (ham ≤ 3 over 4 bands forces at
    * least one identical band, the q161 pigeonhole). Shared with the
    * oracle by name.
    */
  val PHashMaxHam = 3

  /** Hot-band cap for [[phashNearDup]] (the q28 `MaxBandDocs`
    * argument at the pHash band level): a viral image family puts
    * thousands of near-identical fingerprints into the same band
    * buckets, and the candidate join would fan out quadratically in
    * the family size (measured: ratio 4.4 under the skewdocs hot
    * cluster before the cap). Buckets over the cap are dropped from
    * candidate generation — what a saturated bucket loses is
    * mass-duplicated media, which the exact md5 dedup (mediaStats'
    * n_distinct side) removes without any perceptual pass. Shared
    * with the oracle by name.
    */
  val PHashMaxBandDocs = 64

  /** Perceptual-hash media near-dup join (q181) — image dedup the way
    * crawl pipelines actually do it (pHash/aHash over decoded pixels;
    * exact md5 catches only byte-identical files): fingerprint every
    * payload's content bytes with the 64-bit average hash
    * ([[graft.functions.AvgHash64]], one codegen'd scan kernel),
    * block candidates by 16-bit band equality (identical-band
    * pigeonhole — NO all-pairs join ever exists, the q28/q161
    * argument), verify candidates with one xor+popcount. Near-dup
    * media differ in few cells, so they meet in a band; unrelated
    * media share a 16-bit band with probability ~2⁻¹⁶ × occupancy.
    *
    * The ORACLE never packs a 64-bit word (DuckDB BIGINT shifts at
    * bit 63 are UB-adjacent): it re-derives the SET-BIT TABLE from
    * per-character code sums, matches bands as small integers, and
    * counts Hamming as |A|+|B|−2|A∩B| over the bit tables —
    * independent encodings of both the fingerprint and the distance
    * (the q46/q180 pattern). At 100 TB the fingerprint relation is 8
    * bytes/item and the band join shuffles fingerprint rows only;
    * the hot-bucket cap idiom (q28) applies unchanged if a band
    * value saturates.
    */
  def phashNearDup(spark: SparkSession, dir: String,
      maxHam: Int = PHashMaxHam): DataFrame = {
    val ph = payloads(spark, dir).select(col("doc_id"),
      MediaFunctions.avg_hash64(col("content")).as("ph"))
    val banded0 = ph.select(col("doc_id"), col("ph"),
      explode(array((0 until 4).map { j =>
        struct(lit(j).as("band"),
          shiftrightunsigned(col("ph"), 48 - 16 * j)
            .bitwiseAND(lit(0xffffL)).as("bv"))
      }: _*)).as("e"))
      .select(col("doc_id"), col("ph"),
        col("e.band").as("band"), col("e.bv").as("bv"))
    // Hot-band cap (see PHashMaxBandDocs): bound any bucket's pair
    // fanout at cap² regardless of family size.
    val hot = banded0.groupBy(col("band"), col("bv"))
      .agg(count(lit(1)).as("n"))
      .filter(col("n") > PHashMaxBandDocs)
      .select(col("band"), col("bv"))
    val banded = banded0.join(hot, Seq("band", "bv"), "left_anti")
    val cands = banded.as("a").join(banded.as("b"),
        col("a.band") === col("b.band") && col("a.bv") === col("b.bv") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        col("a.ph").as("pa"), col("b.ph").as("pb"))
      .distinct()
    cands
      .withColumn("ham",
        bit_count(col("pa").bitwiseXOR(col("pb"))).cast("long"))
      .filter(col("ham") <= maxHam)
      .select(col("doc_a"), col("doc_b"), col("ham"))
      .orderBy(col("doc_a"), col("doc_b"))
  }
}
