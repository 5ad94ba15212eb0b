package graft.ext

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Multimodal-column plumbing: treat media (image/audio/video) as an
  * opaque `binary` payload column with typed metadata, and run
  * decode / feature-extraction as a partition-batched pass over a
  * typed `Dataset`.
  *
  * Image payloads (PNG/JPEG/GIF/BMP) decode for REAL through the
  * JDK's `javax.imageio` header readers; other payloads (and the
  * audio/video codecs this container does not ship) fall back to a
  * deterministic byte-derived fake, so the pipeline is end-to-end
  * testable and oracle-checkable on any input. Swapping in further
  * codecs changes ONLY the body of [[MediaDecoder.decode]]; the
  * Spark-side contract (binary column in, typed metadata out,
  * partition-batched execution) is identical for both tiers.
  *
  * Scale design (100 TB of media):
  *  - Payloads travel as parquet `binary`; the scan prunes to exactly
  *    the payload + id columns.
  *  - `mapPartitions` (not a per-row UDF) so a real decoder can
  *    amortize per-partition setup — codec init, model load, GPU
  *    context — across the whole partition, the same batching
  *    rationale as Arrow/Pandas UDFs in PySpark.
  *  - Decode output is a narrow typed row; the heavy binary column is
  *    dropped before any shuffle. Downstream relational work (joins,
  *    aggregation) happens on metadata, never on payload bytes.
  */
object Multimodal {

  /** Input contract: id + opaque payload (here: utf-8 bytes of the
    * document text standing in for an encoded media blob).
    */
  final case class MediaPayload(doc_id: Long, payload: Array[Byte])

  /** Decoded-media metadata, the narrow output row. */
  final case class MediaMeta(
      doc_id: Long,
      n_bytes: Long,
      first_byte: Int,
      format: String,
      width: Long,
      height: Long,
      n_frames: Long,
      checksum: Long)

  /** Decoder with two tiers:
    *
    *  1. REAL image decode for payloads whose magic bytes identify a
    *     format the JDK's `javax.imageio` ships a reader for (PNG,
    *     JPEG, GIF, BMP — zero new dependencies): width/height/format
    *     come from the actual image header, `n_frames` from the
    *     reader's image count (animated GIFs > 1). Header-only reads —
    *     `getWidth/getHeight` parse metadata, never the pixel planes —
    *     so cost per blob is O(header), not O(pixels).
    *  2. Deterministic FALLBACK for everything else (and for corrupt
    *     media): metadata derived from the raw bytes, standing in for
    *     the audio/video codecs this container does not ship. The
    *     driver test corpus carries text payloads, so the oracle
    *     checks this tier; the real tier is pinned by unit tests that
    *     encode PNG/JPEG/GIF fixtures with `ImageIO.write` and decode
    *     them back.
    *
    * A production build extends tier 1 with real audio/video
    * libraries; the Spark-side contract (binary in, typed metadata
    * out, partition-batched execution) is unchanged either way.
    */
  object MediaDecoder {

    /** PNG / JPEG / GIF / BMP magic — the formats the JDK can decode.
      * BMP's magic is only the 2 printable bytes 'BM' (and the JDK's
      * BMPImageReaderSpi checks no more), so any TEXT payload starting
      * "BM25…"/"BMW…" would otherwise reach the real reader, which can
      * parse arbitrary bytes as a header and return garbage dims
      * without throwing — silently leaving the fallback tier the
      * oracle models. [[plausibleBmp]] therefore validates the actual
      * header before the real tier may claim a BMP payload.
      */
    private[ext] def looksLikeImage(b: Array[Byte]): Boolean =
      (b.length >= 8 &&
        (b(0) & 0xff) == 0x89 && b(1) == 'P' && b(2) == 'N' && b(3) == 'G') ||
      (b.length >= 3 &&
        (b(0) & 0xff) == 0xff && (b(1) & 0xff) == 0xd8 && (b(2) & 0xff) == 0xff) ||
      (b.length >= 6 && b(0) == 'G' && b(1) == 'I' && b(2) == 'F' && b(3) == '8') ||
      plausibleBmp(b)

    /** Structural BMP validation beyond the 2-byte magic: the header's
      * file-size field must equal the payload length (or be 0 — some
      * writers leave it unset), the DIB infoheader size must be one of
      * the specified variants, and the dims must be positive and
      * plausible. ASCII text bytes (0x20-0x7e in every position) can
      * satisfy none of these.
      */
    private[ext] def plausibleBmp(b: Array[Byte]): Boolean = {
      if (b.length < 26 || b(0) != 'B' || b(1) != 'M') return false
      def u32(off: Int): Long =
        (b(off) & 0xffL) | ((b(off + 1) & 0xffL) << 8) |
          ((b(off + 2) & 0xffL) << 16) | ((b(off + 3) & 0xffL) << 24)
      val fileSize = u32(2)
      val infoSize = u32(14)
      val sizeOk = fileSize == b.length.toLong || fileSize == 0L
      val infoOk = Set(12L, 40L, 56L, 64L, 108L, 124L).contains(infoSize)
      val dimsOk =
        if (infoSize == 12L) { // BITMAPCOREHEADER: u16 dims
          val w = (b(18) & 0xff) | ((b(19) & 0xff) << 8)
          val h = (b(20) & 0xff) | ((b(21) & 0xff) << 8)
          w > 0 && h > 0
        } else { // s32 dims; height < 0 = top-down rows
          val w = u32(18).toInt
          val h = u32(22).toInt
          w > 0 && w <= (1 << 16) && h != 0 && math.abs(h) <= (1 << 16)
        }
      sizeOk && infoOk && dimsOk
    }

    private def realDecode(p: MediaPayload): Option[MediaMeta] = {
      if (!looksLikeImage(p.payload)) return None
      try {
        val iis = javax.imageio.ImageIO.createImageInputStream(
          new java.io.ByteArrayInputStream(p.payload))
        try {
          val readers = javax.imageio.ImageIO.getImageReaders(iis)
          if (!readers.hasNext) None
          else {
            val r = readers.next()
            try {
              r.setInput(iis)
              val frames = r.getNumImages(true)
              Some(MediaMeta(
                doc_id = p.doc_id,
                n_bytes = p.payload.length.toLong,
                first_byte = p.payload(0) & 0xff,
                format = r.getFormatName.toLowerCase,
                width = r.getWidth(0).toLong,
                height = r.getHeight(0).toLong,
                n_frames = math.max(frames, 1).toLong,
                checksum = byteSum(p.payload)))
            } finally r.dispose()
          }
        } finally if (iis != null) iis.close()
      } catch {
        case scala.util.control.NonFatal(_) => None // corrupt media → fallback
      }
    }

    private def byteSum(b: Array[Byte]): Long = {
      var sum = 0L
      var i = 0
      while (i < b.length) { sum += (b(i) & 0xff); i += 1 }
      sum % 65536L
    }

    private def fallbackDecode(p: MediaPayload): MediaMeta = {
      val n = p.payload.length.toLong
      val first = if (p.payload.nonEmpty) p.payload(0) & 0xff else 0
      val fmt = (first % 3) match {
        case 0 => "jpeg"
        case 1 => "png"
        case _ => "webp"
      }
      MediaMeta(
        doc_id = p.doc_id,
        n_bytes = n,
        first_byte = first,
        format = fmt,
        width = 64L + (n % 512L),
        height = 64L + ((n / 7L) % 512L),
        n_frames = 1L + (n % 16L),
        checksum = byteSum(p.payload))
    }

    def decode(p: MediaPayload): MediaMeta =
      realDecode(p).getOrElse(fallbackDecode(p))
  }

  /** The payload table: id + binary column (+ metadata the scan can
    * prune to).
    */
  def payloads(spark: SparkSession, sfDir: String): Dataset[MediaPayload] = {
    import spark.implicits._
    // documentsRaw: no round-robin repartition — the payload bytes must
    // never cross an exchange; decode runs on the scan partitions and
    // only the small metadata shuffles afterwards
    Tables.documentsRaw(spark, sfDir)
      .select(col("doc_id"), col("text").cast("binary").as("payload"))
      .as[MediaPayload]
  }

  /** Partition-batched decode: one decoder instance per partition,
    * streamed over the partition's rows.
    */
  def decodeMeta(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    payloads(spark, sfDir)
      .mapPartitions { it =>
        // per-partition setup happens here (codec/model init in a
        // real decoder); the stub needs none
        it.map(MediaDecoder.decode)
      }
      .toDF()
  }

  /** Frame sampling: explode each media item into every-4th-frame
    * index rows — the row-multiplying shape of video frame extraction
    * (metadata only; a real pipeline would carry the decoded frame
    * tensor alongside).
    */
  def frameSample(spark: SparkSession, sfDir: String): DataFrame =
    decodeMeta(spark, sfDir)
      .select(col("doc_id"), col("n_frames"),
        explode(sequence(lit(0L), col("n_frames") - 1, lit(4L))).as("frame_idx"))
      .select(col("doc_id"), col("frame_idx"), col("n_frames"))

  /** Resize planning: the target geometry for a max-side-224
    * downscale, aspect ratio preserved, never upscaling — the dims a
    * vision-model preprocessor feeds its (stubbed, see [[MediaDecoder]])
    * pixel resampler, kept as pure half-up INTEGER arithmetic
    * (`(dim·224 + m/2) / m`) so the plan is exact on both engines with
    * no float rounding anywhere. Zero-shuffle projection over the
    * decode output; the payload bytes still never cross an exchange.
    */
  def resizeDims(spark: SparkSession, sfDir: String): DataFrame =
    decodeMeta(spark, sfDir)
      .selectExpr(
        "doc_id", "width", "height",
        """CASE WHEN greatest(width, height) <= 224 THEN width
                ELSE (width * 224 + greatest(width, height) div 2)
                     div greatest(width, height) END AS out_w""",
        """CASE WHEN greatest(width, height) <= 224 THEN height
                ELSE (height * 224 + greatest(width, height) div 2)
                     div greatest(width, height) END AS out_h""")

  /** Exact payload dedup — the FIRST dedup pass of any multimodal
    * corpus (identical bytes = identical media, no decode needed):
    * group by the 128-bit content digest, keep the lowest doc_id, count
    * copies. One shuffle on the digest, [[graft.ext.Dedup.exact]]'s
    * shape over the binary column; the payload itself still never
    * crosses an exchange — only the 32-hex digest and two longs do
    * (the digest computes scan-side, before the aggregate's partials).
    * Near-dup (perceptual-hash) detection would follow on the DECODED
    * frames downstream of [[decodeMeta]]; byte-exact dedup is the
    * cheap scan-side screen that removes the mass of literal re-crawls
    * first.
    */
  def payloadDedup(spark: SparkSession, sfDir: String): DataFrame =
    payloads(spark, sfDir)
      .groupBy(md5(col("payload")).as("payload_md5"))
      .agg(min(col("doc_id")).as("keeper_doc_id"), count(lit(1)).as("n_copies"))

  /** Max Hamming distance for [[phashNearDup]] — the
    * [[graft.ext.Dedup.simhashPairs]] threshold, so the text and
    * payload near-dup tiers agree on policy.
    */
  private val PhashMaxHamming = 8

  /** Perceptual-hash near-duplicate payloads — the NEAR-dup tier
    * above [[payloadDedup]]'s byte-exact screen: re-encoded or
    * slightly-corrupted re-crawls of the same media share most of
    * their content bytes but no md5. A 60-bit average-hash (the
    * aHash shape: 60 stride-sampled payload bytes, bit k set iff
    * sample k is above the sample mean — on real decoded media the
    * samples are the 8×8 grayscale tile; here they sample the payload
    * directly, the [[MediaDecoder]] stub discipline) is compared at
    * Hamming ≤ [[PhashMaxHamming]] over the same 15-bit-chunk
    * pigeonhole blocking as [[graft.ext.Dedup.simhashPairs]]
    * (guaranteed recall at distance ≤ 3, approximate above — the
    * documented tradeoff of chunk blocking).
    *
    * Scale shape: the hash is a per-row projection (payload bytes
    * never cross an exchange); only (doc_id, 60-bit hash) rows — 16
    * bytes/doc regardless of media size — reach the 4-chunk explode
    * and the chunk-blocked self-join.
    */
  def phashNearDup(spark: SparkSession, sfDir: String): DataFrame = {
    // self-joined below; (doc_id, 60-bit hash) rows are the one shape
    // the storage-level rule allows in memory (16 bytes/doc) — without
    // the cache both join sides re-run the interpreted HOF hash chain
    // over the full payload scan (the dedup_simhash_pairs discipline)
    val sig = Tables.documentsRaw(spark, sfDir)
      .select(col("doc_id"), hex(col("text").cast("binary")).as("hx"),
        octet_length(col("text").cast("binary")).cast("long").as("nb"))
      .selectExpr("doc_id",
        """transform(sequence(0, 59), k ->
             CAST(conv(substr(hx, CAST(2 * ((k * nb) div 60) + 1 AS INT), 2), 16, 10)
               AS BIGINT)) AS bs""")
      .selectExpr("doc_id", "bs", "aggregate(bs, 0L, (a, x) -> a + x) AS tot")
      .selectExpr("doc_id",
        """aggregate(sequence(0, 59), 0L, (a, k) ->
             a + IF(element_at(bs, CAST(k + 1 AS INT)) * 60 > tot,
                    shiftleft(1L, CAST(k AS INT)), 0L)) AS phash""")
      .cache()
    val chunks = sig
      .withColumn("c", explode(sequence(lit(0), lit(3))))
      .select(col("doc_id"), col("c"),
        expr("shiftright(phash, 15 * c) & 32767").as("chunk"), col("phash"))
    chunks.toDF("doc_a", "c", "chunk", "ph_a")
      .join(chunks.toDF("doc_b", "c_r", "chunk_r", "ph_b"),
        col("c") === col("c_r") && col("chunk") === col("chunk_r") &&
          col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b"),
        expr("CAST(bit_count(ph_a ^ ph_b) AS BIGINT)").as("hamming"))
      .distinct()
      .filter(col("hamming") <= PhashMaxHamming)
  }

  /** Items per GPU batch in [[batchPlan]]. */
  private val BatchSize = 32

  /** GPU-batch packing plan: tensors only stack when shapes match, so
    * items group by their EXACT resize geometry ([[resizeDims]]) and
    * pack into fixed-[[BatchSize]] batches in deterministic doc_id
    * order — the preprocessing manifest a vision-training loader
    * executes. Emitted at batch grain (count + id span per batch).
    *
    * Scale shape: one exchange hashed on the (out_w, out_h) shape
    * bucket serves the row_number window; shape buckets are bounded
    * (dims are bounded by the decode contract), and per-bucket state
    * is a sort over that bucket's metadata rows only — payload bytes
    * long since dropped. At real skew (one dominant shape) the
    * pack would ride a two-level salt like
    * [[graft.operators.Advanced.sampleCapPerSource]]'s heap; batch
    * ASSIGNMENT (rn div B) is order-stable either way.
    */
  def batchPlan(spark: SparkSession, sfDir: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("out_w", "out_h").orderBy(col("doc_id").asc)
    resizeDims(spark, sfDir)
      .select(col("doc_id"), col("out_w"), col("out_h"),
        ((row_number().over(w) - 1) / BatchSize).cast("long").as("batch_id"))
      .groupBy("out_w", "out_h", "batch_id")
      .agg(count(lit(1)).as("n_items"),
        min(col("doc_id")).as("first_doc"),
        max(col("doc_id")).as("last_doc"))
  }

  /** Modality data card: per decoded format, volume and geometry
    * envelope — the corpus-composition read a multimodal training mix
    * is balanced against ([[graft.functions.TextAnalysis.sourceMix]]
    * for media). Scan → |formats|-sized aggregate, one tiny exchange.
    */
  def modalityMix(spark: SparkSession, sfDir: String): DataFrame =
    decodeMeta(spark, sfDir)
      .groupBy("format")
      .agg(count(lit(1)).as("n_items"),
        sum(col("n_bytes")).as("total_bytes"),
        sum(col("n_frames")).as("total_frames"),
        max(col("width")).as("max_w"),
        max(col("height")).as("max_h"))

  val oracleSql: Map[String, String] = Map(
    "mm_batch_plan" ->
      s"""WITH b AS (
           SELECT doc_id, octet_length(encode(text)) AS nb FROM documents),
         d AS (
           SELECT doc_id,
                  CAST(64 + (nb % 512) AS BIGINT) AS width,
                  CAST(64 + ((nb // 7) % 512) AS BIGINT) AS height
           FROM b),
         r AS (
           SELECT doc_id,
                  CAST(CASE WHEN greatest(width, height) <= 224 THEN width
                            ELSE (width * 224 + greatest(width, height) // 2)
                                 // greatest(width, height) END AS BIGINT) AS out_w,
                  CAST(CASE WHEN greatest(width, height) <= 224 THEN height
                            ELSE (height * 224 + greatest(width, height) // 2)
                                 // greatest(width, height) END AS BIGINT) AS out_h
           FROM d),
         packed AS (
           SELECT doc_id, out_w, out_h,
                  CAST((row_number() OVER (PARTITION BY out_w, out_h
                        ORDER BY doc_id ASC) - 1) // $BatchSize AS BIGINT) AS batch_id
           FROM r)
         SELECT out_w, out_h, batch_id, count(*) AS n_items,
                min(doc_id) AS first_doc, max(doc_id) AS last_doc
         FROM packed GROUP BY 1, 2, 3""",
    "mm_modality_mix" ->
      """WITH b AS (
           SELECT doc_id, octet_length(encode(text)) AS nb,
                  hex(encode(text)) AS hx
           FROM documents),
         m AS (
           SELECT doc_id, nb,
                  CASE ((CASE WHEN nb = 0 THEN 0
                              ELSE ('0x' || substr(hx, 1, 2))::INT END) % 3)
                    WHEN 0 THEN 'jpeg' WHEN 1 THEN 'png' ELSE 'webp' END AS format,
                  CAST(64 + (nb % 512) AS BIGINT) AS width,
                  CAST(64 + ((nb // 7) % 512) AS BIGINT) AS height,
                  CAST(1 + (nb % 16) AS BIGINT) AS n_frames
           FROM b)
         SELECT format, count(*) AS n_items,
                CAST(sum(nb) AS BIGINT) AS total_bytes,
                CAST(sum(n_frames) AS BIGINT) AS total_frames,
                max(width) AS max_w, max(height) AS max_h
         FROM m GROUP BY 1""",
    "mm_dedup_payload" ->
      """SELECT md5(text) AS payload_md5,
                min(doc_id) AS keeper_doc_id,
                count(*) AS n_copies
         FROM documents
         GROUP BY 1""",
    "mm_phash_neardup" ->
      """WITH b AS (
           SELECT doc_id, hex(encode(text)) AS hx,
                  octet_length(encode(text)) AS nb
           FROM documents),
         s AS (
           SELECT doc_id,
                  [('0x' || substr(hx, 2*((k*nb)//60)+1, 2))::BIGINT
                   for k in range(60)] AS bs
           FROM b),
         s2 AS (SELECT doc_id, bs, list_sum(bs) AS tot FROM s),
         h AS (
           SELECT doc_id,
                  list_sum([CASE WHEN bs[k+1]*60 > tot
                            THEN (1::BIGINT << k) ELSE 0::BIGINT END
                            for k in range(60)]) AS phash
           FROM s2),
         chunks AS (
           SELECT doc_id, c, (phash >> (15 * c)) & 32767 AS chunk, phash
           FROM h, range(4) t(c))
         SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
                bit_count(xor(a.phash, b.phash)) AS hamming
         FROM chunks a JOIN chunks b
           ON a.c = b.c AND a.chunk = b.chunk AND a.doc_id < b.doc_id
         WHERE bit_count(xor(a.phash, b.phash)) <= 8""",
    "mm_decode_meta" ->
      """WITH b AS (
           SELECT doc_id, hex(encode(text)) AS hx,
                  octet_length(encode(text)) AS nb
           FROM documents)
         SELECT doc_id,
                nb AS n_bytes,
                CASE WHEN nb = 0 THEN 0
                     ELSE ('0x' || substr(hx, 1, 2))::INT END AS first_byte,
                CASE ((CASE WHEN nb = 0 THEN 0
                            ELSE ('0x' || substr(hx, 1, 2))::INT END) % 3)
                  WHEN 0 THEN 'jpeg' WHEN 1 THEN 'png' ELSE 'webp' END AS format,
                64 + (nb % 512) AS width,
                64 + ((nb // 7) % 512) AS height,
                1 + (nb % 16) AS n_frames,
                CAST(coalesce(list_sum(
                  [('0x' || substr(hx, 2*i+1, 2))::BIGINT for i in range(nb)]), 0)
                  % 65536 AS BIGINT) AS checksum
         FROM b""",
    "mm_resize_dims" ->
      """WITH b AS (
           SELECT doc_id, octet_length(encode(text)) AS nb FROM documents),
         d AS (
           SELECT doc_id,
                  CAST(64 + (nb % 512) AS BIGINT) AS width,
                  CAST(64 + ((nb // 7) % 512) AS BIGINT) AS height
           FROM b)
         SELECT doc_id, width, height,
                CAST(CASE WHEN greatest(width, height) <= 224 THEN width
                          ELSE (width * 224 + greatest(width, height) // 2)
                               // greatest(width, height) END AS BIGINT) AS out_w,
                CAST(CASE WHEN greatest(width, height) <= 224 THEN height
                          ELSE (height * 224 + greatest(width, height) // 2)
                               // greatest(width, height) END AS BIGINT) AS out_h
         FROM d""",
    "mm_frame_sample" ->
      """SELECT doc_id, frame_idx, n_frames FROM (
           SELECT doc_id,
                  1 + (octet_length(encode(text)) % 16) AS n_frames,
                  unnest(range(0, 1 + (octet_length(encode(text)) % 16), 4)) AS frame_idx
           FROM documents)""",
  )

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "mm_decode_meta" -> decodeMeta _,
    "mm_dedup_payload" -> payloadDedup _,
    "mm_phash_neardup" -> phashNearDup _,
    "mm_frame_sample" -> frameSample _,
    "mm_resize_dims" -> resizeDims _,
    "mm_batch_plan" -> batchPlan _,
    "mm_modality_mix" -> modalityMix _,
  )
}
