package graft.functions

import java.nio.charset.StandardCharsets
import java.security.MessageDigest
import java.util.regex.Pattern

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Per-row text-sketch kernels (MinHash signature, SimHash, distinct word
  * shingles) shared by the codegen'd expressions below and by
  * graft.pipeline.Sketches (which owns the aggregate-based reference
  * builds the DedupSpec cross-checks these against).
  *
  * Why per-row: a MinHash/SimHash sketch is a function of ONE document, so
  * computing it with explode + window + groupBy (three shuffles of the
  * exploded postings) is pure overhead — at 100 TB the sketch build should
  * be a map-only scan. These kernels reproduce, bit-for-bit, the values of
  * the aggregate formulation (same md5-derived token hashes, same
  * permutation constants, same tie behavior), which is what keeps the
  * DuckDB oracles green.
  *
  * Determinism contract (graft rules): token split = java regex "\\s+" on
  * a space-trimmed string with limit -1 == Spark `split(trim(text),
  * '\\s+')` == DuckDB `string_split_regex(trim(text), '\\s+')`; base hash
  * = first 15 hex chars of md5 (60 bits, positive) mod P = 1e9+7.
  */
object SketchUtil {

  val P = 1000000007L
  val NumHashes = 32
  val SimHashBits = 60

  /** Knuth-multiplier permutation constants — must wrap the modulus (tiny
    * multipliers are order-preserving for small h and collapse the
    * signature; see Sketches scaladoc for the measured failure). */
  val permA: Array[Long] = Array.tabulate(NumHashes)(i => (2654435761L * (i + 1)) % P)
  val permB: Array[Long] = Array.tabulate(NumHashes)(i => (1779033703L * (i + 1) + 113L) % P)

  private val ws = Pattern.compile("\\s+")

  /** Spark split(trim(text), "\\s+") semantics: trim spaces (0x20) only,
    * regex split with limit -1 (an empty string yields one "" token). */
  def tokens(text: UTF8String): Array[String] =
    ws.split(text.trim().toString, -1)

  /** First 15 hex chars of md5(s) as a long, mod P — identical to Spark
    * `conv(substr(md5(s),1,15),16,10) % P` and DuckDB
    * `CAST('0x'||substr(md5(s),1,15) AS BIGINT) % P`, without the hex
    * round-trip: 15 hex chars = bytes 0..6 plus the high nibble of byte 7.
    */
  def md5Mod(s: String): Long = md5Raw60(s) % P

  /** Distinct word-3-grams in first-occurrence order (the set the 3-gram
    * Jaccard measures); null when the doc has fewer than 3 tokens. */
  def distinctShingles(text: UTF8String): Array[String] = {
    val t = tokens(text)
    if (t.length < 3) return null
    val seen = new java.util.LinkedHashSet[String](t.length * 2)
    var i = 0
    while (i + 2 < t.length) {
      seen.add(t(i) + " " + t(i + 1) + " " + t(i + 2))
      i += 1
    }
    seen.toArray(new Array[String](seen.size))
  }

  /** 32-slot MinHash signature over the distinct-shingle hash set; null
    * when the doc has no complete shingle (matches the aggregate build,
    * where such docs simply have no postings row). */
  def minhashSig(text: UTF8String): GenericArrayData = {
    val gs = distinctShingles(text)
    if (gs == null) return null
    val hs = new Array[Long](gs.length)
    var j = 0
    while (j < gs.length) { hs(j) = md5Mod(gs(j)); j += 1 }
    val sig = new Array[Long](NumHashes)
    var i = 0
    while (i < NumHashes) {
      val a = permA(i); val b = permB(i)
      var m = Long.MaxValue
      j = 0
      while (j < hs.length) {
        val v = (hs(j) * a + b) % P
        if (v < m) m = v
        j += 1
      }
      sig(i) = m
      i += 1
    }
    new GenericArrayData(sig)
  }

  /** First 15 hex chars of md5(s) as a raw 60-bit long — NO mod-P
    * reduction: SimHash needs entropy in all 60 bit positions (mod P with
    * P < 2^30 zeroes bits 30..59, degenerating the pigeonhole chunks to
    * the full cross product). */
  def md5Raw60(s: String): Long = {
    val d = MessageDigest.getInstance("MD5")
      .digest(s.getBytes(StandardCharsets.UTF_8))
    var v = 0L
    var i = 0
    while (i < 7) { v = (v << 8) | (d(i) & 0xFFL); i += 1 }
    (v << 4) | ((d(7) & 0xF0L) >>> 4)
  }

  /** Frequency-weighted 60-bit SimHash over token occurrences (bag
    * semantics — Charikar): bit b set iff strictly more than half the
    * token occurrences hash with bit b set. Defined for every non-null
    * text (an empty text has the single "" token, as in the aggregate
    * build). */
  def simhash60(text: UTF8String): Long = {
    val t = tokens(text)
    val counts = new Array[Int](SimHashBits)
    var i = 0
    while (i < t.length) {
      val h = md5Raw60(t(i))
      var b = 0
      while (b < SimHashBits) {
        if (((h >>> b) & 1L) == 1L) counts(b) += 1
        b += 1
      }
      i += 1
    }
    var out = 0L
    val n = t.length
    var b = 0
    while (b < SimHashBits) {
      if (counts(b) * 2 > n) out |= (1L << b)
      b += 1
    }
    out
  }

  /** Word n-grams in ONE per-row pass — the generalized kernel behind
    * [[distinctShingles]] (n=3, distinct) that the 5/8-gram operators
    * (decontaminate, dup-span, novelty) previously built with Spark's
    * higher-order `transform(sequence(...), ...)`, which evaluates
    * INTERPRETED per element (the ArrayDot lesson, measured 20x there;
    * here the interpreted build ran once per plan BRANCH — the honest
    * toRdd bench exposed 22-36s per query where this kernel does the
    * same work in ~2-4s). `distinct` keeps first-occurrence order.
    * Null below n tokens — explode() then skips the row, matching the
    * `size(toks) >= n` filter of the transform build. */
  def ngramsArray(text: UTF8String, n: Int, distinct: Boolean): GenericArrayData = {
    val t = tokens(text)
    if (t.length < n) return null
    val count = t.length - n + 1
    val sb = new java.lang.StringBuilder(64)
    if (distinct) {
      val seen = new java.util.LinkedHashSet[String](count * 2)
      var i = 0
      while (i < count) {
        sb.setLength(0)
        var k = 0
        while (k < n) {
          if (k > 0) sb.append(' ')
          sb.append(t(i + k))
          k += 1
        }
        seen.add(sb.toString)
        i += 1
      }
      val out = new Array[AnyRef](seen.size)
      val it = seen.iterator()
      var j = 0
      while (it.hasNext) { out(j) = UTF8String.fromString(it.next()); j += 1 }
      new GenericArrayData(out)
    } else {
      val out = new Array[AnyRef](count)
      var i = 0
      while (i < count) {
        sb.setLength(0)
        var k = 0
        while (k < n) {
          if (k > 0) sb.append(' ')
          sb.append(t(i + k))
          k += 1
        }
        out(i) = UTF8String.fromString(sb.toString)
        i += 1
      }
      new GenericArrayData(out)
    }
  }

  /** Character n-grams in one per-row pass — the lang-id model's
    * feature extractor (char trigrams are the classic language-ID
    * feature; Cavnar & Trenkle 1994). Sliding window over the RAW
    * string (spaces included — word boundaries carry language signal),
    * every position kept (occurrence counts are the NB statistics).
    * Null below n chars, like [[ngramsArray]]. */
  def charNgramsArray(text: UTF8String, n: Int): GenericArrayData = {
    val s = text.toString
    // Slide by CODE POINT, not UTF-16 unit (ADVICE r11 #2): the lang-id
    // DuckDB oracle's length/substr count code points, so UTF-16
    // slicing would diverge on any non-BMP character AND split
    // surrogate pairs mid-character. On the (spec-pinned, ASCII)
    // shipped corpus the two walks are identical; the fast path below
    // keeps the hot loop free of the offset array.
    val len16 = s.length
    var hasSurrogate = false
    var j = 0
    while (j < len16 && !hasSurrogate) {
      if (Character.isHighSurrogate(s.charAt(j))) hasSurrogate = true
      j += 1
    }
    if (!hasSurrogate) {
      if (len16 < n) return null
      val count = len16 - n + 1
      val out = new Array[AnyRef](count)
      var i = 0
      while (i < count) {
        out(i) = UTF8String.fromString(s.substring(i, i + n))
        i += 1
      }
      new GenericArrayData(out)
    } else {
      // code-point start offsets (UTF-16 indices); window i spans
      // offsets(i) until offsets(i+n) exclusive
      val offs = new Array[Int](len16 + 1)
      var cp = 0
      var k = 0
      while (k < len16) {
        offs(cp) = k
        k += Character.charCount(s.codePointAt(k))
        cp += 1
      }
      offs(cp) = len16
      if (cp < n) return null
      val count = cp - n + 1
      val out = new Array[AnyRef](count)
      var i = 0
      while (i < count) {
        out(i) = UTF8String.fromString(s.substring(offs(i), offs(i + n)))
        i += 1
      }
      new GenericArrayData(out)
    }
  }

  /** Winnowed minimizer grams (Schleimer et al. 2003) in ONE per-row
    * pass: word n-grams, md5Mod hashes packed with position
    * (h * 1e5 + i — the same total order DuckDB replays), per-w-window
    * minima, distinct selected positions, selected gram strings out.
    * O(grams·w) primitive ops, zero per-window allocation. This kernel
    * exists because the higher-order build
    * (transform(sequence) + slice + array_min per window) evaluates
    * INTERPRETED with a fresh array ALLOCATED per window — measured
    * 34s at sf0.1 / 380s at sf1 against ~2s for the exact d_dup_span
    * whose shuffle it is supposed to SHRINK (the ngramsArray lesson,
    * repeated). Null below n tokens, like [[ngramsArray]]. */
  def winnowGrams(text: UTF8String, n: Int, w: Int): GenericArrayData = {
    val t = tokens(text)
    if (t.length < n) return null
    val count = t.length - n + 1
    // Position fits the low 21 bits of the packed key (ADVICE r9: the
    // old h*1e5+i packing collided above 1e5 grams, silently breaking
    // the (hash, position) total order AND oracle parity on very long
    // documents). Docs beyond 2^21 grams (~2M tokens) are outside the
    // fingerprint contract — null, same as the sub-n short-doc case.
    if (count > (1 << 21)) return null
    val grams = new Array[String](count)
    val sb = new java.lang.StringBuilder(64)
    var i = 0
    while (i < count) {
      sb.setLength(0)
      var k = 0
      while (k < n) {
        if (k > 0) sb.append(' ')
        sb.append(t(i + k))
        k += 1
      }
      grams(i) = sb.toString
      i += 1
    }
    val keys = new Array[Long](count)
    i = 0
    // (hash << 21) | pos: md5Mod < 2^30, pos < 2^21 → 51 bits, no
    // overflow, no cross-(hash,pos) collisions. The DuckDB oracle
    // mirrors this exact packing (hash * 2097152 + pos, pos = key %
    // 2097152).
    while (i < count) { keys(i) = (md5Mod(grams(i)) << 21) | i.toLong; i += 1 }
    val sel = new Array[Boolean](count)
    if (count < w) {
      var m = 0
      var j = 1
      while (j < count) { if (keys(j) < keys(m)) m = j; j += 1 }
      sel(m) = true
    } else {
      var s = 0
      while (s <= count - w) {
        var m = s
        var j = s + 1
        while (j < s + w) { if (keys(j) < keys(m)) m = j; j += 1 }
        sel(m) = true
        s += 1
      }
    }
    var nSel = 0
    i = 0
    while (i < count) { if (sel(i)) nSel += 1; i += 1 }
    val out = new Array[AnyRef](nSel)
    var o = 0
    i = 0
    while (i < count) {
      if (sel(i)) { out(o) = UTF8String.fromString(grams(i)); o += 1 }
      i += 1
    }
    new GenericArrayData(out)
  }

  /** distinctShingles boxed for Catalyst (array<string>). */
  def shinglesArray(text: UTF8String): GenericArrayData = {
    val gs = distinctShingles(text)
    if (gs == null) return null
    val out = new Array[AnyRef](gs.length)
    var i = 0
    while (i < gs.length) { out(i) = UTF8String.fromString(gs(i)); i += 1 }
    new GenericArrayData(out)
  }
}

/** array<long>[32] MinHash signature of a text column, computed in one
  * per-row pass (no explode/window/groupBy — the map-only 100-TB sketch
  * shape). NULL for docs with < 3 tokens. */
case class MinHashSig(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def nullSafeEval(v: Any): Any =
    SketchUtil.minhashSig(v.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val r = ctx.freshName("sig")
      s"""
         |org.apache.spark.sql.catalyst.util.GenericArrayData $r =
         |  graft.functions.SketchUtil.minhashSig($c);
         |${ev.isNull} = ($r == null);
         |${ev.value} = $r;
       """.stripMargin
    })
  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)
}

/** 60-bit frequency-weighted SimHash of a text column, one per-row pass. */
case class SimHash60(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullSafeEval(v: Any): Any =
    SketchUtil.simhash60(v.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.SketchUtil.simhash60($c)")
  override protected def withNewChildInternal(newChild: Expression): SimHash60 =
    copy(child = newChild)
}

/** Distinct word-3-grams of a text column as array<string> (NULL below 3
  * tokens); explode(word_shingles(text)) replaces the former
  * explode + window-lead + global-distinct postings build. */
case class WordShingles(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = true
  override def nullSafeEval(v: Any): Any =
    SketchUtil.shinglesArray(v.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val r = ctx.freshName("gs")
      s"""
         |org.apache.spark.sql.catalyst.util.GenericArrayData $r =
         |  graft.functions.SketchUtil.shinglesArray($c);
         |${ev.isNull} = ($r == null);
         |${ev.value} = $r;
       """.stripMargin
    })
  override protected def withNewChildInternal(newChild: Expression): WordShingles =
    copy(child = newChild)
}

/** Word n-grams of a text column as array<string> (NULL below n tokens),
  * one codegen'd per-row pass — the generalized [[WordShingles]] the
  * 5/8-gram pipeline operators share (SketchUtil.ngramsArray has the
  * measured why). `n` and `distinct` are plan-time constants. */
case class WordNgrams(child: Expression, n: Int, distinct: Boolean)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = true
  override def nullSafeEval(v: Any): Any =
    SketchUtil.ngramsArray(v.asInstanceOf[UTF8String], n, distinct)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val r = ctx.freshName("ngs")
      s"""
         |org.apache.spark.sql.catalyst.util.GenericArrayData $r =
         |  graft.functions.SketchUtil.ngramsArray($c, $n, $distinct);
         |${ev.isNull} = ($r == null);
         |${ev.value} = $r;
       """.stripMargin
    })
  override protected def withNewChildInternal(newChild: Expression): WordNgrams =
    copy(child = newChild)
}

/** Character n-grams of a text column (SketchUtil.charNgramsArray) in
  * one codegen'd per-row pass; `n` is a plan-time constant. Null below
  * n chars (explode() then skips the row). */
case class CharNgrams(child: Expression, n: Int)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = true
  override def nullSafeEval(v: Any): Any =
    SketchUtil.charNgramsArray(v.asInstanceOf[UTF8String], n)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val r = ctx.freshName("cgs")
      s"""
         |org.apache.spark.sql.catalyst.util.GenericArrayData $r =
         |  graft.functions.SketchUtil.charNgramsArray($c, $n);
         |${ev.isNull} = ($r == null);
         |${ev.value} = $r;
       """.stripMargin
    })
  override protected def withNewChildInternal(newChild: Expression): CharNgrams =
    copy(child = newChild)
}

/** Winnowed minimizer grams of a text column (SketchUtil.winnowGrams)
  * in one codegen'd per-row pass; `n` and `w` are plan-time constants.
  * Null below n tokens (explode() then skips the row). */
case class WinnowGrams(child: Expression, n: Int, w: Int)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = true
  override def nullSafeEval(v: Any): Any =
    SketchUtil.winnowGrams(v.asInstanceOf[UTF8String], n, w)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val r = ctx.freshName("wgs")
      s"""
         |org.apache.spark.sql.catalyst.util.GenericArrayData $r =
         |  graft.functions.SketchUtil.winnowGrams($c, $n, $w);
         |${ev.isNull} = ($r == null);
         |${ev.value} = $r;
       """.stripMargin
    })
  override protected def withNewChildInternal(newChild: Expression): WinnowGrams =
    copy(child = newChild)
}

object SketchFunctions {
  def minhash_sig(c: Column): Column =
    GraftColumnBridge.column(MinHashSig(GraftColumnBridge.expression(c)))
  def simhash60(c: Column): Column =
    GraftColumnBridge.column(SimHash60(GraftColumnBridge.expression(c)))
  def word_shingles(c: Column): Column =
    GraftColumnBridge.column(WordShingles(GraftColumnBridge.expression(c)))
  def word_ngrams(c: Column, n: Int, distinct: Boolean = false): Column =
    GraftColumnBridge.column(
      WordNgrams(GraftColumnBridge.expression(c), n, distinct))

  def winnow_grams(c: Column, n: Int, w: Int): Column =
    GraftColumnBridge.column(
      WinnowGrams(GraftColumnBridge.expression(c), n, w))

  def char_ngrams(c: Column, n: Int): Column =
    GraftColumnBridge.column(CharNgrams(GraftColumnBridge.expression(c), n))
}
