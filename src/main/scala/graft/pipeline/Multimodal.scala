package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

import graft.Tables
import graft.functions.GraftFunctions.{byte_histogram, sample_bytes}
import graft.registry.Q

/** Multimodal-column plumbing (north star, SURVEY.md §7.5): media as
  * opaque `binary` columns + typed metadata struct, with decode /
  * feature-extract / resize / frame-sample as per-row narrow operators.
  *
  * The container has no image/audio codecs, so the DECODE step is a
  * clearly-marked deterministic fake (byte histogram / byte sampling via
  * native codegen'd expressions); everything around it — binary columns,
  * metadata structs, fixed-width numeric feature output, narrow
  * (shuffle-free) per-row execution — is the real engine surface a codec
  * UDF would plug into.
  *
  * Oracle trick: the synthetic corpus is pure ASCII, where byte == char,
  * so DuckDB reproduces byte-level results via ord(substr(text, i, 1)).
  */
object Multimodal {

  /** documents -> (doc_id, bytes BINARY, meta STRUCT<format,width,height,n_bytes>). */
  def withAssets(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      encode(col("text"), "UTF-8").as("bytes"),
      struct(
        lit("fake/raw").as("format"),
        (length(col("text")) % 64 + 1).cast(LongType).as("width"),
        (length(col("text")) % 48 + 1).cast(LongType).as("height"),
        octet_length(encode(col("text"), "UTF-8")).cast(LongType).as("n_bytes"))
        .as("meta"))

  /** Decode stub: 16-bin byte histogram as the "extracted features". */
  def decodeFeatures(assets: DataFrame): DataFrame =
    assets.select(
      col("doc_id"),
      col("meta.width").as("width"),
      col("meta.height").as("height"),
      byte_histogram(col("bytes")).as("features"))

  /** Frame-sample stub: every k-th byte of the payload. */
  def frameSample(assets: DataFrame, k: Int): DataFrame =
    assets.select(
      col("doc_id"),
      sample_bytes(col("bytes"), lit(k)).as("frames"))

  final case class Asset(doc_id: Long, bytes: Array[Byte])
  final case class Features(doc_id: Long, features: Array[Long])

  /** The iterator-shaped decode path (preference (d), mapPartitions):
    * where a REAL codec plugs in — per-partition init (load model/codec
    * once), then row-at-a-time decode. The fake decode is the same byte
    * histogram, asserted equal to the expression path in
    * MultimodalTypedSpec; the batch shape (Iterator => Iterator, no
    * per-row setup) is the part a production decode inherits. */
  def decodeFeaturesTyped(assets: DataFrame): DataFrame = {
    val spark = assets.sparkSession
    import spark.implicits._
    assets.select(col("doc_id"), col("bytes")).as[Asset]
      .mapPartitions { it =>
        // per-partition "codec init" happens here, once
        it.map { a =>
          val h = new Array[Long](16)
          var i = 0
          while (i < a.bytes.length) { h((a.bytes(i) & 0xFF) >>> 4) += 1; i += 1 }
          Features(a.doc_id, h)
        }
      }
      .toDF()
  }

  /** mapInArrow-shaped VECTORIZED decode (VERDICT r2 #10): rows flow
    * through each partition as columnar batches of `batchSize` — ids and
    * payloads transposed into parallel arrays, ONE codec invocation per
    * batch — the Scala analogue of PySpark's mapInArrow
    * (Iterator[RecordBatch] => Iterator[RecordBatch]). A real vectorized
    * codec (JNI batch decoder, Arrow-backed model runtime) plugs into
    * decodeBatch: dispatch cost drops from O(rows) to O(rows/batchSize)
    * and the batch it sees is contiguous. Output equals decodeFeatures
    * exactly (ExpressionsSpec + the m_decode_batch oracle). */
  def decodeFeaturesBatch(assets: DataFrame, batchSize: Int = 512): DataFrame = {
    val spark = assets.sparkSession
    import spark.implicits._
    assets.select(col("doc_id"), col("bytes")).as[Asset]
      .mapPartitions { it =>
        it.grouped(batchSize).flatMap { batch =>
          val n = batch.size
          val ids = new Array[Long](n)
          val payloads = new Array[Array[Byte]](n)
          var i = 0
          while (i < n) {
            ids(i) = batch(i).doc_id; payloads(i) = batch(i).bytes; i += 1
          }
          decodeBatch(ids, payloads)
        }
      }
      .toDF()
  }

  /** The per-BATCH "codec" call — the seam where a real batch decoder
    * goes; the fake is the same byte histogram as the expression path. */
  private def decodeBatch(ids: Array[Long],
      payloads: Array[Array[Byte]]): Iterator[Features] = {
    val out = new Array[Features](ids.length)
    var i = 0
    while (i < ids.length) {
      val h = new Array[Long](16)
      val b = payloads(i)
      var j = 0
      while (j < b.length) { h((b(j) & 0xFF) >>> 4) += 1; j += 1 }
      out(i) = Features(ids(i), h)
      i += 1
    }
    out.iterator
  }

  // ---- registry entries -------------------------------------------------

  private def histBinsSql: String =
    (0 until 16).map { b =>
      s"len(list_filter(generate_series(1, length(text)), i -> (ord(substr(text, i, 1)) // 16) = $b))"
    }.mkString("[", ", ", "]")

  val decodeQ: Q = Q(
    "m_decode_features",
    Some(s"""SELECT doc_id,
            |  CAST(length(text) % 64 + 1 AS BIGINT) AS width,
            |  CAST(length(text) % 48 + 1 AS BIGINT) AS height,
            |  array_to_string($histBinsSql, ',') AS hist
            |FROM documents ORDER BY doc_id""".stripMargin),
    (s, d) =>
      decodeFeatures(withAssets(Tables.documents(s, d)))
        .select(col("doc_id"), col("width"), col("height"),
          array_join(transform(col("features"), x => x.cast("string")), ",").as("hist"))
        .orderBy(col("doc_id")))

  val frameSampleQ: Q = Q(
    "m_frame_sample",
    Some("""SELECT doc_id,
           |  md5(array_to_string(list_transform(
           |    generate_series(1, (length(text) + 6) // 7),
           |    i -> substr(text, (i - 1) * 7 + 1, 1)), '')) AS frame_fp
           |FROM documents ORDER BY doc_id""".stripMargin),
    (s, d) =>
      frameSample(withAssets(Tables.documents(s, d)), 7)
        .select(col("doc_id"), md5(col("frames")).as("frame_fp"))
        .orderBy(col("doc_id")))

  val decodeBatchQ: Q = Q(
    "m_decode_batch",
    Some(s"""SELECT doc_id, array_to_string($histBinsSql, ',') AS hist
            |FROM documents ORDER BY doc_id""".stripMargin),
    (s, d) =>
      decodeFeaturesBatch(withAssets(Tables.documents(s, d)))
        .select(col("doc_id"),
          array_join(transform(col("features"), x => x.cast("string")), ",").as("hist"))
        .orderBy(col("doc_id")))

  val all: Seq[Q] = Seq(decodeQ, frameSampleQ, decodeBatchQ)
}
