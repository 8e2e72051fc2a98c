package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

import graft.Tables
import graft.functions.GraftFunctions.{encode_wds, gunzip_bytes, gzip_bytes, parse_bmp_header, tar_members}
import graft.registry.Q

/** WebDataset ingestion — the standard tar-shard layout for large
  * multimodal training corpora: each sample is a member group keyed by
  * id ({id}.txt, {id}.bmp, {id}.json). The shard walk (TarCodec:
  * ustar checksums, octal framing, zero padding, end blocks) explodes
  * members; routing by extension dispatches each to its modality's
  * real decoder — the same route-by-sniff discipline as the mixed
  * capstone, but keyed by NAME, the way WebDataset actually routes.
  * Everything is narrow until the output sort; .tar.gz composes with
  * gunzip_bytes upstream like the WARC lane. */
object WebDataset {

  /** documents -> (doc_id, shard BINARY): one sample shard each. */
  def withShards(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
      encode_wds(col("doc_id"), col("text"), col("lang")).as("shard"))

  /** Member-level parse: (doc_id, name, size). */
  def parseMembers(shards: DataFrame): DataFrame =
    shards.select(col("doc_id"), explode(tar_members(col("shard"))).as("m"))
      .select(col("doc_id"), col("m.name").as("name"),
        col("m.size").as("size"))

  /** Extension routing: each member to its modality's decoder —
    * txt -> char count, bmp -> REAL header parse (pixel count),
    * json -> field extraction. One row per sample. */
  def routeSamples(shards: DataFrame): DataFrame = {
    val m = shards
      .select(col("doc_id"), explode(tar_members(col("shard"))).as("m"))
      .select(col("doc_id"), col("m.name").as("name"),
        col("m.data").as("data"))
    val routed = m.select(col("doc_id"),
      when(col("name").endsWith(".txt"),
        length(col("data").cast("string")).cast(LongType)).as("n_chars"),
      when(col("name").endsWith(".bmp"),
        parse_bmp_header(col("data")).getField("width") *
          parse_bmp_header(col("data")).getField("height")).as("n_px"),
      when(col("name").endsWith(".json"),
        get_json_object(col("data").cast("string"), "$.lang")).as("lang"))
    routed.groupBy(col("doc_id"))
      .agg(max(col("n_chars")).as("n_chars"), max(col("n_px")).as("n_px"),
        max(col("lang")).as("lang"))
  }

  // Member SIZES are tar-header byte counts, so the oracle measures
  // UTF-8 BYTES (octet_length over the encoded text), not characters —
  // the byte-vs-char distinction WarcCodec documents (ADVICE r10 #2).
  // The BMP geometry moduli stay CHAR-driven on both sides (TarCodec
  // uses text.length); WebDatasetSpec pins the ASCII-corpus assumption
  // that keeps chars == bytes == UTF-16 units for that arithmetic.
  private val ParseOracle =
    """SELECT doc_id, name, size FROM (
      |  SELECT doc_id, CAST(doc_id AS VARCHAR) || '.txt' AS name,
      |    CAST(octet_length(encode(text)) AS BIGINT) AS size FROM documents
      |  UNION ALL
      |  SELECT doc_id, CAST(doc_id AS VARCHAR) || '.bmp',
      |    CAST(54 + ((3 * (length(text) % 64 + 1) + 3) // 4 * 4)
      |      * (length(text) % 48 + 1) AS BIGINT) FROM documents
      |  UNION ALL
      |  SELECT doc_id, CAST(doc_id AS VARCHAR) || '.json',
      |    CAST(length('{"id":' || CAST(doc_id AS VARCHAR)
      |      || ',"lang":"' || lang || '"}') AS BIGINT) FROM documents)
      |ORDER BY doc_id, name""".stripMargin

  private val RouteOracle =
    """SELECT doc_id,
      |  CAST(length(text) AS BIGINT) AS n_chars,
      |  CAST((length(text) % 64 + 1) * (length(text) % 48 + 1) AS BIGINT) AS n_px,
      |  lang
      |FROM documents ORDER BY doc_id""".stripMargin

  val wdsParseQ: Q = Q(
    "m_webdataset_parse",
    Some(ParseOracle),
    (s, d) =>
      parseMembers(withShards(Tables.documents(s, d)))
        .orderBy(col("doc_id"), col("name")))

  val wdsRouteQ: Q = Q(
    "m_webdataset_route",
    Some(RouteOracle),
    (s, d) =>
      routeSamples(withShards(Tables.documents(s, d)))
        .orderBy(col("doc_id")))

  /** The .tar.gz path: shards gzipped whole (tar members are already
    * block-framed, so unlike WARC the compression unit IS the shard),
    * parsed through gunzip → the same walk — one query, same oracle,
    * compression transparent. */
  val wdsGzParseQ: Q = Q(
    "m_webdataset_gz_parse",
    Some(ParseOracle),
    (s, d) =>
      parseMembers(
        withShards(Tables.fanout(Tables.documents(s, d)))
          .select(col("doc_id"),
            gunzip_bytes(gzip_bytes(col("shard"))).as("shard")))
        .orderBy(col("doc_id"), col("name")))

  /** The SINK side: export each document AS a WebDataset sample shard
    * and audit the produced bytes — member count recovered by
    * re-parsing our own output (write-then-read honesty), shard size
    * pinned by the oracle's pure tar arithmetic (3 headers + members
    * padded to 512-byte blocks + the two end blocks), so a framing or
    * padding bug in the WRITER hash-fails even though the reader would
    * happily accept its own mistake. */
  val wdsExportQ: Q = Q(
    "m_webdataset_export",
    Some("""SELECT doc_id,
           |  CAST(3 AS BIGINT) AS n_members,
           |  CAST(3 * 512
           |    + (octet_length(encode(text)) + 511) // 512 * 512
           |    + (54 + ((3 * (length(text) % 64 + 1) + 3) // 4 * 4)
           |        * (length(text) % 48 + 1) + 511) // 512 * 512
           |    + (length('{"id":' || CAST(doc_id AS VARCHAR)
           |        || ',"lang":"' || lang || '"}') + 511) // 512 * 512
           |    + 1024 AS BIGINT) AS shard_bytes
           |FROM documents ORDER BY doc_id""".stripMargin),
    (s, d) =>
      withShards(Tables.documents(s, d))
        .select(col("doc_id"),
          size(tar_members(col("shard"))).cast(LongType).as("n_members"),
          length(col("shard")).cast(LongType).as("shard_bytes"))
        .orderBy(col("doc_id")))

  val all: Seq[Q] = Seq(wdsParseQ, wdsRouteQ, wdsGzParseQ, wdsExportQ)
}
