package graft

import org.apache.spark.sql.functions._

/** Latent corpus assumptions, pinned so a testdata regeneration fails
  * LOUDLY instead of silently un-greening oracles (ADVICE r10 #2/#3).
  *
  * Two oracle families lean on properties of the shipped documents
  * corpus rather than of the operators:
  *  - the WebDataset member-geometry arithmetic equates DuckDB
  *    char length(text), Scala UTF-16 text.length, and UTF-8 byte
  *    length for the BMP moduli (member SIZES are byte-true via
  *    octet_length since r11) — only identical when text is ASCII;
  *  - the Chat oracle attributes has_empty solely to the doc_id%13
  *    plant, which needs every doc to hold at least max-n_turns (5)
  *    whitespace tokens, or a short doc's naturally-empty slice would
  *    hash-fail t_chat_validate.
  *
  * The gram-based lanes (lang-id char trigrams, shingles, winnowing)
  * do NOT lean on this pin anymore: charNgramsArray slides by Unicode
  * code point (sketchExpressions.scala), matching DuckDB's code-point
  * substr on any input, and t_lang_id_unicode + LangIdUnicodeSpec keep
  * that true on a derived non-ASCII (incl. non-BMP) corpus. The ASCII
  * pin below protects only the byte-geometry (WebDataset) and token
  * (Chat) invariants listed above.
  */
class CorpusInvariantSpec extends SparkSpec {

  for (dir <- Seq("0.001", "0.01")) {
    test(s"sf$dir documents.text is pure ASCII (chars == UTF-8 bytes == UTF-16 units)") {
      val nonAscii = Tables.documents(spark, sf(dir))
        .filter(length(col("text")) =!= octet_length(col("text")))
        .count()
      assert(nonAscii === 0L,
        "non-ASCII text breaks the WebDataset char-driven BMP geometry " +
          "oracle — regenerate the oracle arithmetic byte-true before " +
          "shipping a non-ASCII corpus")
    }

    test(s"sf$dir every document has >= 5 whitespace tokens (chat slice floor)") {
      val tooShort = Tables.documents(spark, sf(dir))
        .filter(size(split(trim(col("text")), "\\s+")) < 5)
        .count()
      assert(tooShort === 0L,
        "a document with fewer tokens than its chat's n_turns yields a " +
          "naturally-empty turn the Chat oracle attributes to the %13 " +
          "plant — clamp n_turns or regenerate the corpus")
    }
  }
}
