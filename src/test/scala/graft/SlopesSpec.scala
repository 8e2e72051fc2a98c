package graft

import org.scalatest.funsuite.AnyFunSuite

/** The slope drift gate's pure parts (VERDICT r12 #6): exponent fit
  * against measured mass, the >0.15 worsening flag, prior-artifact
  * selection by (dirA, dirB) pair, and the per-entry mass basis. */
class SlopesSpec extends AnyFunSuite {

  test("fitExponent: linear is 1.0 against the TRUE mass ratio") {
    // 13.6x mass, 13.6x wall -> exactly linear; against a nominal 10x
    // the same wall would read a bogus 1.13 (gate-workflow lesson #9)
    assert(math.abs(Slopes.fitExponent(2.0, 27.2, 100, 1360) - 1.0) < 1e-9)
    assert(Slopes.fitExponent(2.0, 27.2, 100, 1000) > 1.1)
    // quadratic reads 2.0
    assert(math.abs(Slopes.fitExponent(1.0, 100.0, 10, 100) - 2.0) < 1e-9)
    // degenerate inputs are NaN, never thrown
    assert(Slopes.fitExponent(0.0, 1.0, 1, 10).isNaN)
    assert(Slopes.fitExponent(1.0, 1.0, 10, 10).isNaN)
  }

  test("slopeDriftAgainst flags only >0.15 worsening on >=5s walls") {
    val prior = Map(
      "a" -> (1.0, 9.0), "b" -> (1.0, 9.0), "c" -> (2.0, 9.0),
      "d" -> (1.0, 9.0), "f" -> (1.0, 9.0), "g" -> (1.0, 1.0))
    val cur = Map(
      "a" -> (1.3, 9.0),          // +0.30 on big walls: flagged
      "b" -> (1.1, 9.0),          // +0.10: within noise
      "c" -> (1.2, 9.0),          // improved: never flagged
      "d" -> (Double.NaN, 9.0),   // unfittable: never flagged
      "e" -> (3.0, 9.0),          // no prior: never flagged
      // sub-5s walls: the gate's own first fire measured ±0.4 Δp of
      // pure run-over-run noise at this size — never flagged
      "f" -> (1.6, 2.0),          // cur wall too small
      "g" -> (1.6, 9.0))          // prior wall too small
    assert(Slopes.slopeDriftAgainst(prior, cur) === Seq(("a", 1.3, 1.0)))
  }

  test("priorSlopes picks the newest committed artifact with the SAME dir pair") {
    val dir = java.nio.file.Files.createTempDirectory("slopes")
    def write(name: String, dirA: String, dirB: String, p: String,
        detail: String = "{}"): Unit =
      java.nio.file.Files.writeString(dir.resolve(name),
        s"""{"dirA":"$dirA","dirB":"$dirB","p":{$p},"detail":$detail}""")
    write("SLOPES_r12.json", "/sf0.1", "/sf1", "\"q\":1.05",
      """{"q":{"wallA":1.0,"wallB":12.5,"basis":"rows"}}""")
    write("SLOPES_r13.json", "/sf0.1", "/sf10", "\"q\":2.0") // other pair
    java.nio.file.Files.writeString(dir.resolve("SLOPES_r14.json"), "{broken")
    val got = Slopes.priorSlopes(dir.toString, "/sf0.1", "/sf1")
    assert(got.map(_._1) === Some("SLOPES_r12"))
    assert(got.get._2("q") === ((1.05, 12.5)))
    assert(Slopes.priorSlopes(dir.toString, "/x", "/y") === None)
  }

  test("mass basis routes each family to the denominator it rides") {
    assert(Slopes.basisOf("g_pagerank") === "edges")
    assert(Slopes.basisOf("sim_ann_ivf") === "embeddings")
    assert(Slopes.basisOf("d_dedup_embedding_lsh") === "embeddings")
    assert(Slopes.basisOf("d_cluster_kmeans") === "embeddings")
    assert(Slopes.basisOf("t_token_bpe") === "text_bytes")
    assert(Slopes.basisOf("d_dup_span") === "text_bytes")
    assert(Slopes.basisOf("m_jpeg_decode") === "docs")
    assert(Slopes.basisOf("m_flac_loudness") === "text_bytes")
    assert(Slopes.basisOf("m_wav_decode") === "text_bytes")
    assert(Slopes.basisOf("m_gzip_decode") === "text_bytes")
    assert(Slopes.basisOf("m_audio_fp") === "text_bytes")
    assert(Slopes.basisOf("q1_agg") === "rows")
    assert(Slopes.basisOf("x_asof_join_native") === "rows")
    assert(Slopes.basisOf("st_dedup") === "rows")
  }
}
