package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.ZstdCodec

/** The dictionary half of the zstd lane: raw-content dictionaries as
  * virtual history (RFC 8878 §5), Common Crawl's leading-skippable-
  * frame stream convention, Spark-trained dictionary mining, and the
  * measured small-record compression win the convention exists for.
  * CLI interop (-D) is pinned in both directions, availability-
  * guarded like ZstdCodecSpec's. */
class ZstdDictSpec extends AnyFunSuite {

  private def page(i: Int): Array[Byte] =
    (s"<html><head><title>Doc $i</title></head><body>" +
      s"<nav><a href='/'>Home</a> <a href='/a'>About</a></nav>" +
      s"<div class='main'>unique payload $i ${i * 31}</div>" +
      "<footer>&copy; 2026 example</footer></body></html>").getBytes("UTF-8")

  /** A dict of the template fragments the pages share. */
  private val dict: Array[Byte] =
    ("<footer>&copy; 2026 example</footer></body></html>" +
      "<html><head><title>Doc </title></head><body>" +
      "<nav><a href='/'>Home</a> <a href='/a'>About</a></nav>" +
      "<div class='main'>unique payload ").getBytes("UTF-8")

  private val zstdBin: Option[String] =
    Seq("/root/miniconda/bin/zstd", "/usr/bin/zstd", "/usr/local/bin/zstd")
      .find(p => new java.io.File(p).canExecute)

  private def cli(args: Seq[String], in: Array[Byte]): (Int, Array[Byte]) = {
    val pb = new ProcessBuilder((zstdBin.get +: args): _*)
    val proc = pb.start()
    val out = new java.io.ByteArrayOutputStream()
    val writer = new Thread(() => {
      try { proc.getOutputStream.write(in); proc.getOutputStream.close() }
      catch { case _: Throwable => () }
    })
    writer.start()
    val is = proc.getInputStream
    val buf = new Array[Byte](65536)
    var r = is.read(buf)
    while (r >= 0) { out.write(buf, 0, r); r = is.read(buf) }
    writer.join()
    (proc.waitFor(), out.toByteArray)
  }

  test("dict round-trip + the small-record win the convention exists for") {
    var plain = 0L
    var dicted = 0L
    for (i <- 0 until 50) {
      val data = page(i)
      val z = ZstdCodec.compressWithDict(data, dict)
      assert(z != null)
      val back = ZstdCodec.decompressWithDict(z, dict)
      assert(back != null && java.util.Arrays.equals(back, data), s"page $i")
      // a dictionary frame must NOT decode without its dict (matches
      // reach into history the dict-less decoder doesn't have)
      assert(ZstdCodec.decompress(z) == null, s"page $i leaked past the dict")
      plain += ZstdCodec.compress(data).length
      dicted += z.length
    }
    assert(dicted.toDouble / plain < 0.65,
      s"dict must shrink template-heavy small records: $dicted vs $plain")
  }

  test("CC stream convention: leading 0x184D2A5D dict frame makes the stream self-contained") {
    val a = page(1); val b = page(2)
    val out = new java.io.ByteArrayOutputStream()
    out.write(ZstdCodec.dictFrame(dict))
    out.write(ZstdCodec.compressWithDict(a, dict))
    out.write(ZstdCodec.compressWithDict(b, dict))
    val back = ZstdCodec.decompress(out.toByteArray) // NO out-of-band dict
    assert(back != null && back.length === a.length + b.length)
    assert(java.util.Arrays.equals(
      java.util.Arrays.copyOfRange(back, 0, a.length), a))
    // the zstd-compressed-dict payload form (also seen in the wild)
    val out2 = new java.io.ByteArrayOutputStream()
    out2.write(ZstdCodec.dictFrame(ZstdCodec.compress(dict)))
    out2.write(ZstdCodec.compressWithDict(a, dict))
    assert(java.util.Arrays.equals(ZstdCodec.decompress(out2.toByteArray), a))
    // a dict frame NOT at the stream start is skipped, not adopted
    val out3 = new java.io.ByteArrayOutputStream()
    out3.write(ZstdCodec.compress(a))
    out3.write(ZstdCodec.dictFrame(dict))
    out3.write(ZstdCodec.compressWithDict(b, dict))
    assert(ZstdCodec.decompress(out3.toByteArray) == null,
      "mid-stream dict frames are not the convention — frames after it have no dict")
  }

  test("INTEROP: reference CLI decodes our dict frames with -D; we decode its") {
    assume(zstdBin.isDefined, "zstd binary not on this host")
    val dictFile = java.nio.file.Files.createTempFile("graftdict", ".bin")
    java.nio.file.Files.write(dictFile, dict)
    val data = page(7)
    // ours -> CLI
    val z = ZstdCodec.compressWithDict(data, dict)
    val (c1, got) = cli(Seq("-d", "-D", dictFile.toString, "-c"), z)
    assert(c1 === 0, "CLI rejected our dict frame")
    assert(java.util.Arrays.equals(got, data))
    // CLI -> ours (the CLI emits raw-content-dict frames for a
    // non-structured dict file)
    val (c2, zc) = cli(Seq("-3", "-D", dictFile.toString, "-c"), data)
    assert(c2 === 0)
    val back = ZstdCodec.decompressWithDict(zc, dict)
    assert(back != null, "our decoder nulled a CLI raw-dict frame")
    assert(java.util.Arrays.equals(back, data))
  }

  test("INTEROP: STRUCTURED dict (zstd --train) — ID-matched frames, primed entropy tables") {
    assume(zstdBin.isDefined, "zstd binary not on this host")
    // train a real structured dictionary (magic 0xEC30A437: dict ID,
    // pre-shared Huffman/FSE tables, repcodes, content) on sample
    // files, exactly the production workflow
    val dir = java.nio.file.Files.createTempDirectory("zstdtrain")
    val samples = (0 until 120).map { i =>
      val f = dir.resolve(s"s$i.bin")
      java.nio.file.Files.write(f, page(i))
      f.toString
    }
    val dictPath = dir.resolve("trained.dict").toString
    val pb = new ProcessBuilder(
      (Seq(zstdBin.get, "--train", "--maxdict=2048", "-o", dictPath) ++ samples): _*)
    pb.redirectErrorStream(true)
    val proc = pb.start()
    proc.getInputStream.readAllBytes()
    assume(proc.waitFor() == 0, "zstd --train unavailable/failed on this corpus")
    val trained = java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(dictPath))
    assert((trained(0) & 0xFF) === 0x37 && (trained(1) & 0xFF) === 0xA4,
      "--train must emit a structured dict (magic EC 30 A4 37 LE)")
    // CLI compresses WITH the structured dict -> frames carry its ID
    // and lean on its entropy tables + content; our decoder must
    // resolve all of it
    val data = page(200) // unseen by training
    val (c1, z) = cli(Seq("-3", "-D", dictPath, "-c"), data)
    assert(c1 === 0)
    val back = ZstdCodec.decompressWithDict(z, trained)
    assert(back != null, "our decoder nulled a structured-dict frame")
    assert(java.util.Arrays.equals(back, data))
    // ID enforcement: the same frames against the WRONG dict must null
    assert(ZstdCodec.decompressWithDict(z, dict) == null,
      "a frame naming dict ID X must not decode against raw dict Y")
    assert(ZstdCodec.decompress(z) == null,
      "a frame naming a dict ID must not decode dict-less")
  }

  test("fuzz: 1500 single-bit flips on a dict stream decode correct-or-null") {
    val data = page(3)
    val stream = {
      val o = new java.io.ByteArrayOutputStream()
      o.write(ZstdCodec.dictFrame(dict))
      o.write(ZstdCodec.compressWithDict(data, dict))
      o.toByteArray
    }
    var x = 0x777L
    var undetected = 0
    var i = 0
    while (i < 1500) {
      x ^= x << 13; x ^= x >>> 7; x ^= x << 17
      val pos = math.floorMod(x, stream.length * 8L).toInt
      val zc = stream.clone()
      zc(pos / 8) = (zc(pos / 8) ^ (1 << (pos % 8))).toByte
      val back = ZstdCodec.decompress(zc) // must not throw / hang
      // flips INSIDE the dict payload change the virtual history the
      // frames decode against — the frame checksum catches any that
      // alter the output; flips that only touch dict bytes no match
      // references are legitimately invisible
      if (back != null && !java.util.Arrays.equals(back, data)) undetected += 1
      i += 1
    }
    assert(undetected === 0, s"$undetected flips decoded to wrong bytes")
  }
}

/** The seekable format (zstd contrib spec): a trailing seek-table
  * skippable frame enables record-level random access. */
class ZstdSeekableSpec extends AnyFunSuite {

  private def rec(i: Int): Array[Byte] =
    (s"record $i " + ("payload " * (10 + i % 7)) + i).getBytes("UTF-8")

  test("seekExtract decodes exactly one frame, size- and checksum-verified") {
    val records = (0 until 9).map(rec).toArray
    val z = graft.functions.ZstdCodec.encodeSeekable(records)
    assert(z != null)
    assert(graft.functions.ZstdCodec.seekFrameCount(z) === 9)
    for (i <- records.indices) {
      val got = graft.functions.ZstdCodec.seekExtract(z, i)
      assert(got != null && java.util.Arrays.equals(got, records(i)), s"frame $i")
    }
    assert(graft.functions.ZstdCodec.seekExtract(z, 9) == null)
    assert(graft.functions.ZstdCodec.seekExtract(z, -1) == null)
  }

  test("a seekable stream is ALSO a plain multi-frame stream (table frame skips)") {
    val records = (0 until 4).map(rec).toArray
    val z = graft.functions.ZstdCodec.encodeSeekable(records)
    val whole = graft.functions.ZstdCodec.decompress(z)
    assert(whole != null)
    assert(java.util.Arrays.equals(whole,
      records.reduce((a, b) => a ++ b)))
  }

  test("seek-table corruption nulls: footer magic, entry sums, checksums") {
    val records = (0 until 3).map(rec).toArray
    val z = graft.functions.ZstdCodec.encodeSeekable(records)
    def mutated(f: Array[Byte] => Unit): Array[Byte] = {
      val c = z.clone(); f(c); c
    }
    // footer magic flip -> no table at all
    assert(graft.functions.ZstdCodec.seekFrameCount(
      mutated(b => b(b.length - 1) = 0)) === -1)
    // an entry's checksum flip -> that frame nulls, others survive
    val entry0sum = z.length - 9 - 3 * 12 + 8 // first entry's checksum
    val zc = mutated(b => b(entry0sum) = (b(entry0sum) ^ 1).toByte)
    assert(graft.functions.ZstdCodec.seekExtract(zc, 0) == null)
    assert(graft.functions.ZstdCodec.seekExtract(zc, 1) != null)
    // an entry's compressedSize flip -> entries no longer tile the data
    val entry0c = z.length - 9 - 3 * 12
    assert(graft.functions.ZstdCodec.seekExtract(
      mutated(b => b(entry0c) = (b(entry0c) ^ 1).toByte), 0) == null)
  }
}

/** Spark-side dictionary training + the registered CC-convention
  * ingest lane's non-oracle claims. */
class ZstdDictTrainSpec extends SparkSpec {

  test("trained dict is deterministic, bounded, and template-heavy") {
    val pages = graft.pipeline.Html.withHtml(Tables.documents(spark, sf()))
    val d1 = graft.pipeline.ZstdDict.train(pages)
    val d2 = graft.pipeline.ZstdDict.train(pages)
    assert(java.util.Arrays.equals(d1, d2), "training must be deterministic")
    assert(d1.length <= 4096 && d1.length > 0)
    val s = new String(d1, "UTF-8")
    assert(s.contains("<") || s.contains("example"),
      "the mined grams should carry the shared page template")
  }

  test("trained dict beats no-dict on the corpus' own WARC records") {
    val docs = Tables.documents(spark, sf()).limit(60)
    val pages = graft.pipeline.Html.withHtml(docs)
    val dict = graft.pipeline.ZstdDict.train(pages)
    val rows = pages.collect()
    var plain = 0L
    var dicted = 0L
    rows.foreach { r =>
      val rec = graft.functions.WarcCodec.encode(r.getLong(0),
        s"http://w${r.getLong(0) % 50}.example/p${r.getLong(0)}", r.getString(1))
      plain += ZstdCodec.compress(rec).length
      dicted += ZstdCodec.compressWithDict(rec, dict).length
    }
    assert(dicted < plain,
      s"the Spark-trained dict must help on its own corpus: $dicted vs $plain")
  }

  test("bare shipped-dict shards: NOT self-contained, dict round-trips them") {
    // the train-once/ship twin's wire property (VERDICT r12 #7): the
    // bare stream carries no leading dict frame, so a dict-less decode
    // must REFUSE (offsets reach virtual history that isn't there),
    // while decompressWithDict recovers the exact records
    val docId = 42L
    val html = "<html><body>" + ("the same boilerplate " * 80) + "</body></html>"
    val dict = ("the same boilerplate " * 40).getBytes("UTF-8")
    val bare = graft.functions.WarcCodec.encodeZstDictBare(
      docId, s"http://w42.example/p42", html, dict)
    assert(bare != null)
    assert(ZstdCodec.decompress(bare) == null,
      "a bare shard must not decode without its dictionary")
    val back = ZstdCodec.decompressWithDict(bare, dict, ZstdCodec.MaxOutBytes)
    assert(back != null && new String(back, "UTF-8").contains("WARC/1.0"))
  }

  test("the registered stream is self-contained and layout-stable") {
    val docs = Tables.documents(spark, sf())
    val dict = graft.pipeline.ZstdDict.train(graft.pipeline.Html.withHtml(docs))
    val out = graft.pipeline.ZstdDict.withWarcZstDict(docs, dict)
      .select(col("doc_id"),
        length(graft.functions.GraftFunctions.unzstd_bytes(col("warczstd")))
          .as("n"))
      .collect()
    assert(out.nonEmpty)
    assert(out.forall(r => !r.isNullAt(1) && r.getInt(1) > 0),
      "every stream must decode with NO out-of-band dict")
  }
}
