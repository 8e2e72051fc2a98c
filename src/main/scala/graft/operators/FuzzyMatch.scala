package graft.operators

import org.apache.spark.sql.functions._

import graft.Tables
import graft.registry.Q

/** Blocked fuzzy matching (entity resolution) over part names — the
  * canonicalize -> block -> match shape production ER uses at scale:
  *
  *   1. CANONICALIZE: collapse the corpus-sized table to its DISTINCT
  *      name values with carrier counts — the edit-distance kernel must
  *      run per distinct-value pair, never per row pair (a 100-TB table
  *      has bounded vocabulary; rows scale, entities don't);
  *   2. BLOCK: candidate pairs share a cheap key (the head noun) — the
  *      classic quadratic-bound lever; a pair in different blocks is
  *      never scored;
  *   3. MATCH: exact integer Levenshtein <= 3 on the candidates only.
  *
  * Output carries both names, the distance, and each name's carrier
  * count, so the result is sf-sensitive even though the name vocabulary
  * is fixed. Everything is exact-integer/string — Levenshtein is the
  * standard unit-cost edit distance in both engines. */
object FuzzyMatch {

  val fuzzyQ: Q = Q(
    "x_fuzzy_match",
    Some("""WITH n AS (
           |  SELECT p_name AS nm, CAST(count(*) AS BIGINT) AS cnt
           |  FROM part GROUP BY p_name),
           |c AS (
           |  SELECT a.nm AS a_name, b.nm AS b_name,
           |    CAST(levenshtein(a.nm, b.nm) AS BIGINT) AS dist,
           |    a.cnt AS a_parts, b.cnt AS b_parts
           |  FROM n a JOIN n b
           |    ON split_part(a.nm, ' ', 2) = split_part(b.nm, ' ', 2)
           |    AND a.nm < b.nm)
           |SELECT a_name, b_name, dist, a_parts, b_parts
           |FROM c WHERE dist <= 3 ORDER BY a_name, b_name""".stripMargin),
    (s, d) => {
      val names = Tables.part(s, d)
        .groupBy(col("p_name").as("nm")).agg(count(lit(1)).as("cnt"))
        .withColumn("blk", element_at(split(col("nm"), " "), 2))
      val a = names.select(col("nm").as("a_name"), col("cnt").as("a_parts"),
        col("blk"))
      val b = names.select(col("nm").as("b_name"), col("cnt").as("b_parts"),
        col("blk"))
      a.join(b, Seq("blk"))
        .where(col("a_name") < col("b_name"))
        .withColumn("dist",
          levenshtein(col("a_name"), col("b_name")).cast("long"))
        .filter(col("dist") <= 3)
        .select(col("a_name"), col("b_name"), col("dist"),
          col("a_parts"), col("b_parts"))
        .orderBy(col("a_name"), col("b_name"))
    })

  val all: Seq[Q] = Seq(fuzzyQ)
}
