package graft.multimodal

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, IntegerType, LongType}

/** Multimodal column handling: image/audio/video as opaque `binary`
  * columns with typed metadata, processed by per-partition batch
  * functions (the Scala analog of pandas-batched UDFs: one iterator per
  * partition, amortized setup, no per-row dispatch).
  *
  * The actual media codecs are NOT available in this build environment,
  * so the decode kernels are STUBS — clearly marked below — that produce
  * deterministic fake features from the bytes. Everything around them is
  * real and tested: schema, partitioning, batch iteration shape, and the
  * feature pipeline. Swapping a real decoder in changes only the stub
  * body.
  *
  * Scale notes: media rows are large; operators repartition by id so
  * one task never holds a skewed byte total, and feature extraction is a
  * map-only stage (no shuffle of the bytes themselves beyond the keyed
  * repartition).
  */
object Multimodal {

  final case class MediaRow(
      media_id: Long,
      kind: String,            // "image" | "audio" | "video"
      bytes: Array[Byte],
      mime: String,
      meta: Map[String, String])

  final case class MediaFeatures(
      media_id: Long,
      kind: String,
      n_bytes: Long,
      checksum: Long,
      features: Array[Float])

  final case class FrameSample(
      media_id: Long,
      frame_index: Int,
      frame_bytes: Array[Byte])

  // -------------------------------------------------------------------
  // STUB decode kernels — deterministic fakes; replace with real codecs.
  // -------------------------------------------------------------------

  /** STUB: stands in for a real image/audio decode + embedding model.
    * Produces `dim` deterministic floats from the payload's md5 — the
    * t03/q42 md5-derived-arithmetic contract, so the m02 oracle replays
    * every dimension byte-for-byte in SQL (VERDICT r6 next-#6; the
    * former 64-bit LCG was not SQL-expressible and forced a rows-only
    * check): feature j = (md5_60("<payload md5 hex>|f<j>") mod 10^6) /
    * 10^6 as float, i.e. the nearest float of an exact integer/10^6 —
    * DuckDB twin CAST((h60(md5(text)||'|f'||j) % 1000000) / 1000000.0
    * AS REAL). A real decoder swaps in at exactly this point; only this
    * body changes. */
  private[graft] def stubDecodeFeatures(bytes: Array[Byte], dim: Int): Array[Float] = {
    val md = graft.expressions.HashExpressions.localMd5.get()
    md.reset()
    val hex = md.digest(bytes).map("%02x".format(_)).mkString
    val out = new Array[Float](dim)
    var j = 0
    while (j < dim) {
      val h = graft.expressions.HashExpressions.md5Long60(md,
        (hex + "|f" + j).getBytes(java.nio.charset.StandardCharsets.UTF_8))
      out(j) = ((h % 1000000L).toDouble / 1000000.0).toFloat
      j += 1
    }
    out
  }

  /** STUB: stands in for real video frame extraction — slices the byte
    * stream into `every`-th fixed-size windows as fake "frames". */
  private[multimodal] def stubSampleFrames(bytes: Array[Byte], frameSize: Int,
                                           every: Int): Iterator[(Int, Array[Byte])] =
    bytes.grouped(frameSize).zipWithIndex.collect {
      case (frame, idx) if idx % every == 0 => (idx, frame)
    }

  /** 60-bit md5 checksum of the payload — the engine's cross-engine
    * hash ([[graft.expressions.HashExpressions.md5Long60]]), so media
    * checksums are verifiable from SQL: for UTF-8 payloads the DuckDB
    * twin is CAST(('0x'||substr(md5(text),1,15)) AS BIGINT). */
  private def checksum(bytes: Array[Byte]): Long =
    graft.expressions.HashExpressions.md5Long60(
      graft.expressions.HashExpressions.localMd5.get(), bytes)

  // -------------------------------------------------------------------
  // Real Spark plumbing
  // -------------------------------------------------------------------

  /** Deterministic media table derived from the `documents` table: the
    * text payload becomes the opaque binary column (UTF-8 bytes), kind
    * cycles image/audio/video by id. This is the fixture constructor the
    * m* queries use — the binary-column plumbing is exactly what a real
    * media table gets; only the payload provenance is synthetic. */
  def fromDocuments(docs: DataFrame)(implicit spark: SparkSession): Dataset[MediaRow] = {
    import spark.implicits._
    // NULL text would become NULL bytes and NPE in every downstream
    // kernel (r.bytes.length / grouped / digest): a row with no payload
    // is not a media row — drop it here, mirrored by the m01/m03/m04
    // oracles' `text IS NOT NULL`.
    docs.filter(col("text").isNotNull).select(
        col("doc_id").as("media_id"),
        element_at(array(lit("image"), lit("audio"), lit("video")),
          pmod(col("doc_id"), lit(3L)).cast("int") + 1).as("kind"),
        encode(col("text"), "UTF-8").as("bytes"),
        // pmod, not %: Spark % keeps the dividend's sign, so a negative
        // id would hit element_at index 0 (runtime error) or -1
        // (counts from the END - silently wrong kind)
        element_at(array(lit("image/png"), lit("audio/wav"), lit("video/mp4")),
          pmod(col("doc_id"), lit(3L)).cast("int") + 1).as("mime"),
        map(lit("lang"), col("lang"), lit("source"), col("source")).as("meta"))
      .as[MediaRow]
  }

  /** Exact media dedup by payload digest — d01's one-shuffle shape on
    * binary columns: group by (60-bit md5 of the bytes, byte length),
    * keeper = lowest media_id. The (fp, n_bytes) pair key makes an md5
    * collision ALSO require a length collision before two distinct
    * payloads merge. The digest is a codegen'd column expression (the
    * same md5Long the text dedups use), so fingerprinting rides the
    * scan — the only exchange carries (fp, n_bytes, media_id) triples,
    * never the payload bytes. At 100 TB that is the difference between
    * shuffling 16-byte fingerprints and shuffling the media lake. */
  def dedupMedia(media: Dataset[MediaRow]): DataFrame =
    media.toDF()
      .select(graft.functions.GraftFunctions.md5Long(col("bytes")).as("fp"),
        length(col("bytes")).cast(org.apache.spark.sql.types.LongType)
          .as("n_bytes"),
        col("media_id"))
      .groupBy(col("fp"), col("n_bytes"))
      .agg(min(col("media_id")).as("keeper_id"),
        count(lit(1)).as("n_copies"))

  /** Perceptual-hash NEAR-dup pairs — the media twin of d03's token
    * simhash (media payloads have no tokens, so the signature comes
    * from the DECODED content instead): each payload is decoded (the
    * stub decode here is the UTF-8 view — a real image/audio decoder
    * swaps in at exactly this point, same as [[extractFeatures]]),
    * hashed to a 60-bit aHash-style histogram signature
    * ([[graft.expressions.PerceptualHashExpr]] — bucket-over-uniform-
    * share bits, so similar content flips few bits), then paired by
    * Hamming pigeonhole banding with exact popcount verification
    * ([[graft.operators.Dedup.hammingPairs]], the shared LSH
    * bucket-confinement shape).
    *
    * Scale shape: the signature is one compiled map-only pass riding
    * the scan; the only exchange carries (chunk-key, id, sig) triples —
    * never the payload bytes (the dedupMedia contract). Empty payloads
    * yield NULL signatures and never pair. */
  def phashNearDup(media: Dataset[MediaRow], chunks: Int = 4,
                   maxHamming: Int = 3): DataFrame = {
    val sigs = media.toDF()
      .select(col("media_id").as("id"),
        graft.expressions.HashExpressions.phash(
          decode(col("bytes"), "UTF-8")).as("sig"))
      .filter(col("sig").isNotNull)
    graft.operators.Dedup.hammingPairs(sigs, bits = 60,
      chunks = chunks, maxHamming = maxHamming)
  }

  /** Per-partition batched feature extraction over a media Dataset.
    * mapPartitions gives the batch-iterator shape: decoder init happens
    * once per task, rows stream through without per-row setup. */
  def extractFeatures(media: Dataset[MediaRow], dim: Int = 64)(
      implicit spark: SparkSession): Dataset[MediaFeatures] = {
    require(dim >= 1, s"dim must be >= 1, got $dim")
    import spark.implicits._
    media
      .repartition(col("media_id"))
      .mapPartitions { rows =>
        // (real impl: open codec/model context here, once per partition)
        rows.map { r =>
          MediaFeatures(r.media_id, r.kind, r.bytes.length.toLong,
            checksum(r.bytes), stubDecodeFeatures(r.bytes, dim))
        }
      }
  }

  /** Frame sampling for "video" rows: one input row fans out to many
    * frame rows (flatMap over the partition iterator). */
  def sampleFrames(media: Dataset[MediaRow], frameSize: Int = 1024,
                   every: Int = 2)(
      implicit spark: SparkSession): Dataset[FrameSample] = {
    // fail fast on the driver: a zero/negative parameter would otherwise
    // throw mid-job inside an executor task (idx % every, grouped(0))
    require(frameSize >= 1, s"frameSize must be >= 1, got $frameSize")
    require(every >= 1, s"every must be >= 1, got $every")
    import spark.implicits._
    media
      .filter(col("kind") === "video")
      .repartition(col("media_id"))
      .mapPartitions { rows =>
        rows.flatMap { r =>
          stubSampleFrames(r.bytes, frameSize, every).map {
            case (idx, frame) => FrameSample(r.media_id, idx, frame)
          }
        }
      }
  }

  /** STUB: stands in for a real image resize/downsample — keeps every
    * `factor`-th byte (deterministic, size = ceil(n/factor)). A real
    * impl swaps in a codec resize; the batch shape is identical. */
  private[multimodal] def stubResize(bytes: Array[Byte], factor: Int): Array[Byte] = {
    val out = new Array[Byte]((bytes.length + factor - 1) / factor)
    var i = 0
    while (i < out.length) { out(i) = bytes(i * factor); i += 1 }
    out
  }

  /** Batched resize over "image" rows: per-partition batch kernel, one
    * decoder/scaler context per task (mapPartitions), map-only after
    * the keyed repartition. */
  def resizeImages(media: Dataset[MediaRow], factor: Int = 4)(
      implicit spark: SparkSession): Dataset[MediaRow] = {
    require(factor >= 1, s"factor must be >= 1, got $factor")
    import spark.implicits._
    media
      .filter(col("kind") === "image")
      .repartition(col("media_id"))
      .mapPartitions { rows =>
        // (real impl: init image codec/scaler here, once per partition)
        rows.map(r => r.copy(bytes = stubResize(r.bytes, factor)))
      }
  }

  /** Fixed-size byte-range chunking — the media SHARDING step a
    * training pipeline runs before transport or batch assembly (split
    * oversized payloads into cache-line-friendly ranges; reassembly is
    * ordered concat by chunk_index). Unlike the decode kernels this is
    * byte-level truth, fully hash-verified by the m05 oracle.
    *
    * All built-ins (codegen'd): explode of a computed index range plus
    * a binary substring — a map-side fan-out inside the scan stage, no
    * shuffle, no per-element lambdas. Empty payloads emit no chunks
    * (explicit filter: `sequence(0, -1)` would DESCEND and fabricate
    * phantom chunks, the classic Spark sequence gotcha). */
  def chunk(media: Dataset[MediaRow], chunkSize: Int)(
      implicit spark: SparkSession): DataFrame = {
    require(chunkSize >= 1, s"chunkSize must be >= 1, got $chunkSize")
    media.toDF()
      .withColumn("__n_chunks",
        ceil(length(col("bytes")).cast(DoubleType) / chunkSize).cast(IntegerType))
      .filter(col("__n_chunks") > 0)
      .select(col("media_id"), col("bytes"),
        explode(sequence(lit(0), col("__n_chunks") - 1)).as("chunk_index"))
      .select(col("media_id"), col("chunk_index").cast(LongType).as("chunk_index"),
        col("bytes").substr(col("chunk_index") * chunkSize + 1, lit(chunkSize))
          .as("chunk_bytes"))
      .select(col("media_id"), col("chunk_index"),
        length(col("chunk_bytes")).cast(LongType).as("n_chunk_bytes"),
        md5(col("chunk_bytes")).as("chunk_md5"))
  }

  /** STUB text-embedding as a COLUMN — the [[stubDecodeFeatures]]
    * arithmetic applied to a string column (feature j =
    * md5_60("<md5 hex of text>|f<j>") mod 10^6 / 10^6 as float), for
    * the RAG-ingest path where the thing being embedded is chunk TEXT,
    * not media bytes. Backed by ONE custom expression
    * ([[graft.expressions.StubEmbedExpr]]) that evaluates the text
    * exactly once per row: the first cut was a `transform(sequence…)`
    * lambda, and a higher-order function re-evaluates its captured
    * columns PER ELEMENT with no codegen/CSE — over a derived
    * chunk-text child that re-ran tokenize+slice+join 64 times per row
    * (e22 at 10.7 s; sub-second with the expression). The e22 oracle
    * replays every dimension in SQL exactly like m02's. A real
    * text-embedding model swaps in at exactly this point. */
  def stubTextEmbedding(text: Column, dim: Int): Column =
    org.apache.spark.sql.graftbridge.Bridge.column(
      graft.expressions.StubEmbedExpr(
        org.apache.spark.sql.graftbridge.Bridge.expression(text), dim))

  /** Cross-modal (image, caption) alignment scoring — the CLIP-score
    * gate a paired corpus is curated with. Image-tower embedding =
    * [[stubDecodeFeatures]] over the payload bytes; caption-tower
    * embedding = [[stubTextEmbedding]] over the first `capChars` chars
    * of the doc text (the deterministic caption derivation — docs that
    * fit entirely are perfectly-aligned pairs). Output: (media_id,
    * align_cosine rounded to 6, aligned = rounded >= tau). Both towers
    * are the marked md5 stub swap-point; a real CLIP changes only
    * those two bodies.
    *
    * Scale shape: both embeds are map-only and computed BEFORE the
    * pairing join, so the join exchanges only (id, vec) rows — the
    * payload bytes never travel past the feature extraction. */
  def captionAlign(docs: DataFrame, capChars: Int = 100,
                   dim: Int = 64, tau: Double = 0.8)(
      implicit spark: SparkSession): DataFrame = {
    import graft.expressions.VectorExpressions
    val img = extractFeatures(
        fromDocuments(docs).filter(col("kind") === "image"), dim)
      .select(col("media_id"), col("features").as("img_f"))
    val cap = docs
      .filter(col("text").isNotNull && pmod(col("doc_id"), lit(3L)) === 0)
      .select(col("doc_id").as("media_id"),
        substring(col("text"), 1, capChars).as("caption"))
      .withColumn("cap_f", stubTextEmbedding(col("caption"), dim))
    // the full degenerate-vector contract (norm > 0 AND finite), not
    // just the zero-norm half: a real tower emitting a NaN/Inf vector
    // must EXCLUDE the row, or the thresholded NaN cosine classifies
    // differently across engines (Similarity.nonDegenerate's contract)
    img.join(cap, Seq("media_id"))
      .filter(graft.operators.Similarity.nonDegenerate(
          col("img_f").cast("array<double>")) &&
        graft.operators.Similarity.nonDegenerate(
          col("cap_f").cast("array<double>")))
      .withColumn("align_cosine",
        round(VectorExpressions.cosine(col("img_f"), col("cap_f")), 6))
      .select(col("media_id"), col("align_cosine"),
        (col("align_cosine") >= tau).as("aligned"))
  }

  /** Join extracted media features back onto a relational table — the
    * shape a multimodal training pipeline ends in (metadata + features
    * co-located, bytes dropped before any wide shuffle). */
  def featureTable(media: Dataset[MediaRow], dim: Int = 64)(
      implicit spark: SparkSession): DataFrame =
    extractFeatures(media, dim)
      .withColumnRenamed("features", "embedding")
      .drop("kind")
}
