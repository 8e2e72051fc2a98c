package graft

import org.apache.spark.sql.functions.col

import graft.pipeline.Chat

/** Chat-validation contracts: the corpus plants all three defect
  * classes, verdicts recover them from the PARSED JSON, and the
  * construction round-trips through real JSON (no shortcut past the
  * parse). */
class ChatSpec extends SparkSpec {

  test("every defect class is planted AND recovered from the parse") {
    val out = Chat.validate(Chat.withChats(Tables.documents(spark, sf())))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2),
        r.getBoolean(3), r.getBoolean(4), r.getBoolean(5)))
    assert(out.nonEmpty)
    out.foreach { case (id, nTurns, alt, empty, ends, valid) =>
      assert(alt === (id % 11 != 3), s"doc $id alternation")
      assert(empty === (id % 13 == 5), s"doc $id empty turn")
      assert(ends === (id % 17 != 7), s"doc $id dangling prompt")
      assert(valid === (alt && !empty && ends), s"doc $id composite")
      assert(nTurns === 2 * (id % 2 + 1) + (if (id % 17 == 7) 1 else 0))
    }
    // all three defect classes and the clean class must be live
    assert(out.exists(!_._3) && out.exists(_._4) && out.exists(!_._5))
    assert(out.exists(_._6))
  }

  test("the chat column is real JSON: a turn array with role/content fields") {
    val one = Chat.withChats(Tables.documents(spark, sf()))
      .filter(col("doc_id") === 0L).collect().head.getString(1)
    assert(one.startsWith("[{") && one.endsWith("}]"))
    assert(one.contains("\"role\":\"user\"") &&
      one.contains("\"role\":\"assistant\""))
    assert(one.contains("\"content\":\""))
  }
}
