package graft

import scala.jdk.CollectionConverters._

import graft.analytics.CitationAnalytics
import graft.sources.CitationLoaders

/** Reference parity at the reference's PUBLISHED scale: the mirror is
  * missing the real `citations.txt` blob (.MISSING_LARGE_BLOBS), so this
  * spec synthesizes a deterministic citation graph whose per-year node
  * and edge counts equal the reference's published cumulative numbers
  * (data/output/densities.csv: 37,201 nodes / 347,414 edges by 2002),
  * writes it in the reference text formats, runs the real CLI dispatch
  * (Main.runTask) end-to-end, and pins the density output file against
  * the reference's own golden densities.csv byte-for-byte.
  */
class CitationScaleSpec extends SparkSpec {

  /** (year, cumulative nodes, cumulative edges) from the golden file. */
  private lazy val golden: Seq[(Int, Long, Long)] =
    java.nio.file.Files
      .readAllLines(java.nio.file.Paths.get(
        "/root/reference/data/output/densities.csv")).asScala.toSeq
      .drop(1)
      .map(_.split(",")).map(a => (a(0).toInt, a(1).toLong, a(2).toLong))

  /** Deterministic synthesizer: node ids are assigned chronologically
    * (1..N in year order) so "cites a node published <= my year" is just
    * "to < yearEndId". Edges for year y have a from-node published in y
    * (density attributes an edge to its from-year) and cite a strictly
    * earlier id via an LCG; pairs are deduplicated so the edge count is
    * exact. Returns the input dir. */
  private def synthesize(): String = {
    val dir = java.nio.file.Files.createTempDirectory("citescale")
    val pd = new StringBuilder("# id\tdate\n")
    val ct = new StringBuilder("# FromNodeId\tToNodeId\n")
    var prevN = 0L
    var prevE = 0L
    var seed = 20260812L
    def lcg(): Long = { seed = (seed * 6364136223846793005L + 1442695040888963407L) & Long.MaxValue; seed }
    val seen = new scala.collection.mutable.HashSet[Long]()
    for ((year, nCum, eCum) <- golden) {
      val nInc = (nCum - prevN).toInt
      val eInc = (eCum - prevE).toInt
      val yearStart = prevN + 1 // first id published this year
      for (i <- 0 until nInc)
        pd.append(s"${yearStart + i}\t$year-01-01\n")
      var made = 0
      var k = 0
      while (made < eInc) {
        val from = yearStart + (k % math.max(nInc, 1))
        // cite any strictly earlier id (chronological ids => published <= year)
        val to = 1L + (lcg() % math.max(from - 1, 1L))
        val key = from * 100000L + to
        if (to != from && !seen.contains(key)) {
          seen += key
          ct.append(s"$from\t$to\n")
          made += 1
        }
        k += 1
      }
      prevN = nCum
      prevE = eCum
    }
    java.nio.file.Files.writeString(dir.resolve("published-dates.txt"), pd.toString)
    java.nio.file.Files.writeString(dir.resolve("citations.txt"), ct.toString)
    dir.toString
  }

  private lazy val inDir = synthesize()

  test("CLI density at published scale reproduces the golden densities.csv") {
    val outDir = java.nio.file.Files.createTempDirectory("citescale_out").toString
    Main.runTask(spark, "density", inDir, outDir)

    val part = new java.io.File(s"$outDir/densities").listFiles()
      .filter(_.getName.startsWith("part-")).head
    val got = java.nio.file.Files.readAllLines(part.toPath).asScala.toSeq
    val want = java.nio.file.Files.readAllLines(java.nio.file.Paths.get(
      "/root/reference/data/output/densities.csv")).asScala.toSeq
    assert(got === want)
  }

  test("loaders at published scale: 37201 nodes, 347414 edges") {
    assert(CitationLoaders.loadPublishedDates(spark, s"$inDir/published-dates.txt")
      .count() === 37201L)
    assert(CitationLoaders.loadCitations(spark, s"$inDir/citations.txt")
      .count() === 347414L)
  }

  test("CLI diameter honors a precomputed nodepairs.csv denominator") {
    // toy fixture + a nodepairs file with the known 1998 total (55 pairs):
    // output must equal the computed-denominator run
    val fixtures = "/root/reference/data/testing"
    val in = java.nio.file.Files.createTempDirectory("np_in")
    for (f <- Seq("citations.txt", "published-dates.txt"))
      java.nio.file.Files.copy(java.nio.file.Paths.get(s"$fixtures/$f"), in.resolve(f))
    java.nio.file.Files.writeString(in.resolve("nodepairs.csv"), "1998,55\n")
    val outA = java.nio.file.Files.createTempDirectory("np_a").toString
    val outB = java.nio.file.Files.createTempDirectory("np_b").toString
    Main.runTask(spark, "diameter", in.toString, outA, Seq(1998))
    Main.runTask(spark, "diameter", fixtures, outB, Seq(1998))
    def lines(dir: String) = new java.io.File(s"$dir/diameter_1998").listFiles()
      .filter(_.getName.startsWith("part-")).head
    assert(java.nio.file.Files.readAllLines(lines(outA).toPath)
      === java.nio.file.Files.readAllLines(lines(outB).toPath))
  }

  test("CLI diameter on the 1992 snapshot: reference shape + 90% early stop") {
    val outDir = java.nio.file.Files.createTempDirectory("citescale_d").toString
    Main.runTask(spark, "diameter", inDir, outDir, Seq(1992))

    val part = new java.io.File(s"$outDir/diameter_1992").listFiles()
      .filter(_.getName.startsWith("part-")).head
    val lines = java.nio.file.Files.readAllLines(part.toPath).asScala.toSeq
    assert(lines.head === "d,\"g(d)\",percent_of_total" ||
      lines.head === "d,g(d),percent_of_total")
    val rows = lines.tail.map(_.split(",")).map(a =>
      (a(0).toInt, a(1).toLong, a(2).toDouble))
    assert(rows.nonEmpty)
    assert(rows.map(_._1) === (1 to rows.size)) // consecutive hop distances
    assert(rows.map(_._2) === rows.map(_._2).sorted) // g(d) non-decreasing
    // reference stop rule: all rows before the last are below 90%
    assert(rows.init.forall(_._3 < 0.9))
  }
}
