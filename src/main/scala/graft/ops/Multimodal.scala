package graft.ops

import graft.Tables
import graft.functions.fasthash
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal column surface (north-star block): image/audio/video as
  * opaque BINARY columns + typed metadata, with decode / feature-extract /
  * resize / frame-sample stages.
  *
  * The Spark-side plumbing is real — schema, partition-preserving batch
  * processing via mapPartitions over a typed Dataset, deterministic
  * outputs, and a metadata struct the optimizer can prune independently of
  * the payload. The DECODE step is a deliberate STUB (this container has no
  * image/audio codecs): `StubCodec` derives deterministic "decoded"
  * properties from the payload bytes. Swapping in a real codec changes one
  * function, not the plan.
  *
  * Scale notes: payloads stay in executor memory one partition batch at a
  * time (mapPartitions = the Scala analog of mapInPandas batch iteration);
  * metadata-only queries never touch the payload column thanks to parquet
  * column pruning — the plan for `select(meta.*)` must not read `payload`.
  */
object Multimodal {

  /** One media row: payload + typed metadata (the schema a 100 TB media
    * lake would carry per blob). */
  final case class MediaRow(media_id: Long, kind: String, payload: Array[Byte],
      width: Int, height: Int, sample_rate: Int, n_frames: Int)

  /** Extracted features per media row (decode output). */
  final case class MediaFeatures(media_id: Long, kind: String, n_bytes: Long,
      sha_like: Long, mean_byte: Double, decoded_width: Int, decoded_height: Int,
      thumb_width: Int, thumb_height: Int, sampled_frames: Seq[Int])

  /** STUB codec — deterministic fake decode. A real deployment replaces
    * exactly these three functions with actual codec calls. */
  object StubCodec {
    /** "Decode" image dimensions from payload bytes (stub: hash-derived,
      * but stable and schema-correct). */
    def decodeDims(payload: Array[Byte]): (Int, Int) = {
      val h = payload.foldLeft(17L)((a, b) => fasthash.splitmix64(a ^ (b & 0xFF)))
      (64 + math.floorMod(h, 1024).toInt, 64 + math.floorMod(h >> 12, 1024).toInt)
    }

    /** Resize-to-thumbnail: aspect-preserving fit into 128×128. */
    def thumbDims(w: Int, h: Int): (Int, Int) = {
      val scale = 128.0 / math.max(w, h)
      if (scale >= 1.0) (w, h)
      else (math.max((w * scale).toInt, 1), math.max((h * scale).toInt, 1))
    }

    /** Frame sampling: every k-th frame index up to 8 frames. */
    def sampleFrames(nFrames: Int, k: Int = 8): Seq[Int] =
      if (nFrames <= 0) Nil
      else (0 until nFrames by math.max(nFrames / k, 1)).take(k)
  }

  /** Synthesize a deterministic media table from the documents table
    * (payload = utf-8 bytes of the text; metadata derived from doc fields).
    * Stands in for `spark.read.format("binaryFile")` / a media lake scan. */
  def mediaTable(t: Tables): DataFrame =
    t.documents.select(
      col("doc_id").as("media_id"),
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (col("doc_id") % 3 + 1).cast("int")).as("kind"),
      encode(col("text"), "UTF-8").as("payload"),
      (col("n_chars") % 512 + 64).cast("int").as("width"),
      (col("n_chars") % 256 + 64).cast("int").as("height"),
      when(col("doc_id") % 3 === 1, 16000).otherwise(0).as("sample_rate"),
      when(col("doc_id") % 3 === 2, (col("doc_id") % 240 + 24).cast("int"))
        .otherwise(0).as("n_frames"))

  /** Decode + feature-extract + resize + frame-sample, one partition batch
    * at a time (mapPartitions — no per-row task overhead, payloads never
    * shuffled). */
  def extractFeatures(media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.map { r =>
        val (dw, dh) = StubCodec.decodeDims(r.payload)
        val (tw, th) = StubCodec.thumbDims(r.width, r.height)
        var h = 1469598103934665603L
        var sum = 0L
        var i = 0
        while (i < r.payload.length) {
          h = fasthash.splitmix64(h ^ (r.payload(i) & 0xFF))
          sum += (r.payload(i) & 0xFF)
          i += 1
        }
        MediaFeatures(r.media_id, r.kind, r.payload.length.toLong, h,
          if (r.payload.isEmpty) 0.0 else sum.toDouble / r.payload.length,
          dw, dh, tw, th, StubCodec.sampleFrames(r.n_frames))
      }
    }
  }

  /** Query surface: full decode pipeline over the synthetic media table.
    * The sampled-frames array is emitted as a CSV string (q70 precedent):
    * the driver's canonicalizer sorts column values, and a raw array column
    * is unhashable/unsortable on its side — scalar-only output columns. */
  def qMediaFeatures(t: Tables): DataFrame = {
    val spark = t.spark
    import spark.implicits._
    // fanout before the per-row decode loop — the single-file scan is one
    // partition and the payload hashing would otherwise run on one core
    extractFeatures(t.fanout(mediaTable(t)).as[MediaRow])
      .toDF()
      .withColumn("mean_byte", round(col("mean_byte"), 6))
      .withColumn("sampled_frames",
        array_join(col("sampled_frames").cast("array<string>"), ","))
      .orderBy(col("media_id"))
  }

  /** Metadata-only aggregate — must never read the payload column (column
    * pruning; asserted via the physical plan in MultimodalSpec). Oracled:
    * the metadata derivation is pure column arithmetic, so DuckDB can
    * replay it — the multimodal block's hash-green anchor (VERDICT r2
    * item 2). */
  def qMediaMetadata(t: Tables): DataFrame =
    mediaTable(t)
      .groupBy(col("kind"))
      .agg(count(lit(1)).as("n"), avg(col("width")).as("avg_width"),
        max(col("n_frames")).as("max_frames"))
      .orderBy(col("kind"))

  /** q73 oracle: replays mediaTable's metadata columns (NOT the payload —
    * the oracle never materializes it, mirroring the pruning contract).
    * avg over exact integer sums is the same double on both engines. */
  val qMediaMetadataSql: String =
    """SELECT kind, CAST(COUNT(*) AS BIGINT) AS n, avg(width) AS avg_width,
      |  CAST(max(n_frames) AS INT) AS max_frames
      |FROM (SELECT (['image','audio','video'])[CAST(doc_id % 3 + 1 AS INT)] AS kind,
      |        CAST(n_chars % 512 + 64 AS INT) AS width,
      |        CASE WHEN doc_id % 3 = 2 THEN CAST(doc_id % 240 + 24 AS INT)
      |             ELSE 0 END AS n_frames
      |      FROM documents)
      |GROUP BY kind ORDER BY kind""".stripMargin
}
