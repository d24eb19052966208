/* Hosted under org.apache.spark.sql because Catalyst's extension surface
 * (AbstractDataType, ExpressionUtils) is private[sql] — the standard
 * placement for third-party native expressions. */
package org.apache.spark.sql.graft

import java.security.MessageDigest
import java.util.Arrays

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Tight-loop kernels behind the native text-hash expressions.
  *
  * The Column-level formulation of the dedup/fingerprint pipeline
  * (`transform(shingles(tokens), s => conv(substr(md5(s),1,15),16,10))`)
  * evaluates interpreted: higher-order functions get no whole-stage codegen
  * and no common-subexpression elimination, and every element pays lambda
  * dispatch + a hex string + radix parse. These kernels compute identical
  * values (md5 → first 60 bits, exactly `conv(substring(md5(s),1,15),16,10)`,
  * the hash the DuckDB oracle can reproduce) in one primitive loop per row —
  * shingle bytes are assembled directly and digested, no intermediate hex.
  *
  * Reference analog: the segment-build hash kernels
  * (`pinot-segment-local/.../dedup`, `BaseTableUpsertMetadataManager`) are
  * likewise native single-pass code, not expression trees. */
object TextKernels {
  /** MinHash modulus (Mersenne prime 2^31-1) — see TextAnalysis.MinHashP. */
  val P: Long = 2147483647L

  private val mdLocal = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest =
      MessageDigest.getInstance("MD5")
  }

  private def hash60Bytes(bytes: Array[Byte]): Long = {
    val md = mdLocal.get()
    md.reset()
    val d = md.digest(bytes)
    // first 15 hex chars = bytes 0..6 plus the high nibble of byte 7
    var acc = 0L
    var i = 0
    while (i < 7) { acc = (acc << 8) | (d(i) & 0xffL); i += 1 }
    (acc << 4) | ((d(7) & 0xffL) >>> 4)
  }

  /** == conv(substring(md5(s), 1, 15), 16, 10)::long */
  def hash60(s: UTF8String): Long = hash60Bytes(s.getBytes)

  /** Hash60 of every k-token shingle (tokens joined by a single space).
    * Precondition: the token array has no null elements (true for
    * TextAnalysis.tokens output by construction — split never yields
    * nulls; the HOF twin's concat_ws would silently drop them instead).
    * Shingle semantics match TextAnalysis.shingles: fewer than k tokens →
    * ONE shingle of all tokens (the empty string for an empty array), unless
    * `emptyAsEmpty` maps a zero-token array to a zero-length result (the
    * per-token `transform` semantics used by tokenHashes).
    * `modP` reduces each hash mod [[P]]; `sortedDistinct` returns the
    * ascending distinct hash set (the n-gram Jaccard precompute). */
  def shingleHash60(toks: ArrayData, k: Int, modP: Boolean,
                    sortedDistinct: Boolean, emptyAsEmpty: Boolean)
  : ArrayData = {
    val n = toks.numElements()
    if (n == 0 && emptyAsEmpty) return new GenericArrayData(Array.emptyLongArray)
    val m = if (n < k) 1 else n - k + 1
    val width = math.min(k, n)
    val out = new Array[Long](m)
    var i = 0
    while (i < m) {
      // assemble the shingle's UTF-8 bytes directly (single space joiner)
      var len = 0
      var j = 0
      while (j < width) {
        len += toks.getUTF8String(i + j).numBytes() + (if (j > 0) 1 else 0)
        j += 1
      }
      val buf = new Array[Byte](len)
      var pos = 0
      j = 0
      while (j < width) {
        if (j > 0) { buf(pos) = ' '; pos += 1 }
        val t = toks.getUTF8String(i + j)
        t.writeToMemory(buf, org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET + pos)
        pos += t.numBytes()
        j += 1
      }
      val h = hash60Bytes(buf)
      out(i) = if (modP) h % P else h
      i += 1
    }
    if (sortedDistinct) {
      Arrays.sort(out)
      var w = 0
      var r = 0
      while (r < m) {
        if (r == 0 || out(r) != out(r - 1)) { out(w) = out(r); w += 1 }
        r += 1
      }
      new GenericArrayData(Arrays.copyOf(out, w))
    } else new GenericArrayData(out)
  }

  /** Affine-permutation coefficients — same formula as
    * TextAnalysis.minHashCoeffs (shared with the oracle SQL generator). */
  def coeffA(i: Int): Long = {
    val a = (i * 2654435761L + 1013904223L) % P
    if (a == 0) 1L else a
  }
  def coeffB(i: Int): Long = (i * 97531L + 12345L) % P

  /** MinHash signature: sig(j) = min over base x of (a_j·x + b_j) mod P.
    * One pass over the base array computes every seed (the Column version
    * re-walks the array per seed). Products stay < 2^62 (x, a < 2^31). */
  def minHashSig(base: ArrayData, seeds: Int): ArrayData = {
    val n = base.numElements()
    if (n == 0) {
      // array(array_min(transform(empty)) …) yields null elements
      return new GenericArrayData(Array.fill[Any](seeds)(null))
    }
    val as = new Array[Long](seeds)
    val bs = new Array[Long](seeds)
    var j = 0
    while (j < seeds) { as(j) = coeffA(j); bs(j) = coeffB(j); j += 1 }
    val out = new Array[Long](seeds)
    Arrays.fill(out, Long.MaxValue)
    var i = 0
    while (i < n) {
      val x = base.getLong(i)
      j = 0
      while (j < seeds) {
        val v = (as(j) * x + bs(j)) % P
        if (v < out(j)) out(j) = v
        j += 1
      }
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Count of elements (with duplicates) present in `dict` — the
    * stopword-hit kernel behind language ID and quality scoring. */
  def countInSet(toks: ArrayData, dict: java.util.HashSet[UTF8String]): Int = {
    val n = toks.numElements()
    var c = 0
    var i = 0
    while (i < n) {
      if (dict.contains(toks.getUTF8String(i))) c += 1
      i += 1
    }
    c
  }

  /** NFC normalization (see [[NfcNormalizeExpr]]). Pure-ASCII input (the
    * common case) is detected with one byte scan and returned as-is —
    * ASCII is NFC by construction, and the scan avoids the UTF-16
    * round-trip entirely; other already-NFC strings return the original
    * UTF8String after the isNormalized check. */
  def nfcNormalize(s: UTF8String): UTF8String = {
    val b = s.getBytes
    var i = 0
    while (i < b.length && b(i) >= 0) i += 1
    if (i == b.length) return s // pure ASCII
    val str = s.toString
    if (java.text.Normalizer.isNormalized(str,
        java.text.Normalizer.Form.NFC)) s
    else UTF8String.fromString(
      java.text.Normalizer.normalize(str, java.text.Normalizer.Form.NFC))
  }

  /** Canonicalization tail (see [[CanonTailExpr]]): one pass over the
    * UTF-8 bytes of an already-lowercased string; maximal runs of bytes
    * outside [a-z0-9] become one interior space, ends trimmed. Output is
    * pure ASCII, at most as long as the input. */
  def canonTail(s: UTF8String): UTF8String = {
    val in = s.getBytes
    val n = in.length
    val out = new Array[Byte](n)
    var pos = 0
    var pendingSpace = false
    var i = 0
    while (i < n) {
      val b = in(i)
      if ((b >= 'a' && b <= 'z') || (b >= '0' && b <= '9')) {
        if (pendingSpace && pos > 0) { out(pos) = ' '; pos += 1 }
        out(pos) = b
        pos += 1
        pendingSpace = false
      } else {
        pendingSpace = true
      }
      i += 1
    }
    UTF8String.fromBytes(out, 0, pos)
  }

  /** BPE-ish subword estimate: Σ ceil(numChars/4) over tokens — matches
    * aggregate(tokens, 0, acc + ceil(length(t)/4.0)). */
  def subwordCount(toks: ArrayData): Long = {
    val n = toks.numElements()
    var acc = 0L
    var i = 0
    while (i < n) {
      acc += (toks.getUTF8String(i).numChars() + 3) / 4
      i += 1
    }
    acc
  }

  /** nBits-bit SimHash from token hashes: bit b set iff Σ ±1 votes ≥ 0
    * (+1 when bit b of the hash is set). Matches
    * TextAnalysis.simHashFromHashes including the empty-input case (zero
    * votes → every bit set). */
  def simHash(hs: ArrayData, nBits: Int): Long = {
    val n = hs.numElements()
    val votes = new Array[Long](nBits)
    var i = 0
    while (i < n) {
      val h = hs.getLong(i)
      var b = 0
      while (b < nBits) {
        votes(b) += ((h >> b) & 1L) * 2 - 1
        b += 1
      }
      i += 1
    }
    var acc = 0L
    var b = 0
    while (b < nBits) {
      if (votes(b) >= 0) acc |= 1L << b
      b += 1
    }
    acc
  }
}

/** `hash60(str)` as a native expression (whole-stage codegen via a static
  * kernel call) — == `conv(substring(md5(s),1,15),16,10)::long`. */
case class Hash60Expr(child: Expression)
  extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = LongType
  override def prettyName: String = "hash60"
  override protected def nullSafeEval(s: Any): Any =
    TextKernels.hash60(s.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode)
  : ExprCode =
    defineCodeGen(ctx, ev,
      c => s"org.apache.spark.sql.graft.TextKernels.hash60($c)")
  override protected def withNewChildInternal(nc: Expression): Hash60Expr =
    copy(child = nc)
}

/** Shingle-and-hash in one operator: array<string> tokens → array<long>
  * hash60 of each k-shingle. Flags select the dedup pipelines' variants. */
case class ShingleHash60(child: Expression, k: Int, modP: Boolean,
                         sortedDistinct: Boolean, emptyAsEmpty: Boolean)
  extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(StringType))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "shingle_hash60"
  override protected def nullSafeEval(a: Any): Any =
    TextKernels.shingleHash60(a.asInstanceOf[ArrayData], k, modP,
      sortedDistinct, emptyAsEmpty)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode)
  : ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"org.apache.spark.sql.graft.TextKernels.shingleHash60($c, $k, $modP, " +
        s"$sortedDistinct, $emptyAsEmpty)")
  override protected def withNewChildInternal(nc: Expression): ShingleHash60 =
    copy(child = nc)
}

/** MinHash signature from a precomputed base-hash array: every seed's min
  * in a single pass (array<long> → array<long> of length `seeds`). */
case class MinHashSigExpr(child: Expression, seeds: Int)
  extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(LongType))
  override def dataType: DataType = ArrayType(LongType, containsNull = true)
  override def prettyName: String = "minhash_sig"
  override protected def nullSafeEval(a: Any): Any =
    TextKernels.minHashSig(a.asInstanceOf[ArrayData], seeds)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode)
  : ExprCode =
    defineCodeGen(ctx, ev,
      c => s"org.apache.spark.sql.graft.TextKernels.minHashSig($c, $seeds)")
  override protected def withNewChildInternal(nc: Expression): MinHashSigExpr =
    copy(child = nc)
}

/** SimHash from a token-hash array — one pass, all bit votes at once. */
case class SimHashExpr(child: Expression, nBits: Int)
  extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(LongType))
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash"
  override protected def nullSafeEval(a: Any): Any =
    TextKernels.simHash(a.asInstanceOf[ArrayData], nBits)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode)
  : ExprCode =
    defineCodeGen(ctx, ev,
      c => s"org.apache.spark.sql.graft.TextKernels.simHash($c, $nBits)")
  override protected def withNewChildInternal(nc: Expression): SimHashExpr =
    copy(child = nc)
}

/** Membership count against a constant dictionary: array<string> → int.
  * The dictionary ships as a reference object into generated code (an
  * O(1) HashSet probe per token instead of an interpreted isin chain). */
case class CountInSet(child: Expression, dict: Seq[String])
  extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(StringType))
  override def dataType: DataType = org.apache.spark.sql.types.IntegerType
  override def prettyName: String = "count_in_set"

  @transient private lazy val set: java.util.HashSet[UTF8String] = {
    val s = new java.util.HashSet[UTF8String](dict.size * 2)
    dict.foreach(d => s.add(UTF8String.fromString(d)))
    s
  }
  override protected def nullSafeEval(a: Any): Any =
    TextKernels.countInSet(a.asInstanceOf[ArrayData], set)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode)
  : ExprCode = {
    val ref = ctx.addReferenceObj("dict", set, "java.util.HashSet")
    defineCodeGen(ctx, ev,
      c => s"org.apache.spark.sql.graft.TextKernels.countInSet($c, $ref)")
  }
  override protected def withNewChildInternal(nc: Expression): CountInSet =
    copy(child = nc)
}

/** Σ ceil(chars/4) over a token array — the whitespace-token BPE
  * estimate as one codegen'd pass. */
case class SubwordCount(child: Expression)
  extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(StringType))
  override def dataType: DataType = LongType
  override def prettyName: String = "subword_count"
  override protected def nullSafeEval(a: Any): Any =
    TextKernels.subwordCount(a.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode)
  : ExprCode =
    defineCodeGen(ctx, ev,
      c => s"org.apache.spark.sql.graft.TextKernels.subwordCount($c)")
  override protected def withNewChildInternal(nc: Expression): SubwordCount =
    copy(child = nc)
}

/** Unicode NFC normalization (java.text.Normalizer, the JDK's Unicode
  * implementation): composes decomposed sequences (e + U+0301 → é) so
  * byte-level dedup/hashing sees one canonical form of visually identical
  * text — the standard cleaning step before exact dedup on multilingual
  * web corpora. NFC is specified by Unicode (UAX #15), so any conforming
  * engine produces identical bytes — the DuckDB oracle replays it with
  * `nfc_normalize`. Fast path: Normalizer.isNormalized short-circuits
  * pure-ASCII (the common case) without allocating. */
case class NfcNormalizeExpr(child: Expression)
  extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = StringType
  override def prettyName: String = "nfc_normalize"
  override protected def nullSafeEval(s: Any): Any =
    TextKernels.nfcNormalize(s.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode)
  : ExprCode =
    defineCodeGen(ctx, ev,
      c => s"org.apache.spark.sql.graft.TextKernels.nfcNormalize($c)")
  override protected def withNewChildInternal(nc: Expression)
  : NfcNormalizeExpr = copy(child = nc)
}

/** Dedup canonicalization tail as ONE byte scan: on an already-lowercased
  * string, every maximal run of bytes outside [a-z0-9] collapses to a
  * single space, with leading/trailing runs dropped. Byte-equal to
  * `trim(regexp_replace(regexp_replace(<lowered>, "[^a-z0-9\\s]", " "),
  * "\\s+", " "))`: the first regexp turns each non-alnum non-whitespace
  * CHAR into a space (a multi-byte char's one space and its bytes' several
  * spaces collapse identically under the second regexp), whitespace and
  * replacement spaces then merge into one, and trim strips the ends —
  * i.e. exactly "runs of non-[a-z0-9] become one interior space". Fusing
  * the two regex engines + trim into a single pass removes the
  * char-dominated cost the 10× scale curve shows on `q_text_canon`. */
case class CanonTailExpr(child: Expression)
  extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = StringType
  override def prettyName: String = "canon_tail"
  override protected def nullSafeEval(s: Any): Any =
    TextKernels.canonTail(s.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode)
  : ExprCode =
    defineCodeGen(ctx, ev,
      c => s"org.apache.spark.sql.graft.TextKernels.canonTail($c)")
  override protected def withNewChildInternal(nc: Expression): CanonTailExpr =
    copy(child = nc)
}

/** Column builders for graft code outside the sql package. */
object TextHashExprs {
  def canonTail(c: Column): Column =
    ExpressionUtils.column(CanonTailExpr(ExpressionUtils.expression(c)))
  def nfcNormalize(c: Column): Column =
    ExpressionUtils.column(NfcNormalizeExpr(ExpressionUtils.expression(c)))
  def hash60(c: Column): Column =
    ExpressionUtils.column(Hash60Expr(ExpressionUtils.expression(c)))
  def shingleHash60(toks: Column, k: Int, modP: Boolean = false,
                    sortedDistinct: Boolean = false,
                    emptyAsEmpty: Boolean = false): Column =
    ExpressionUtils.column(ShingleHash60(ExpressionUtils.expression(toks),
      k, modP, sortedDistinct, emptyAsEmpty))
  def minHashSig(base: Column, seeds: Int): Column =
    ExpressionUtils.column(
      MinHashSigExpr(ExpressionUtils.expression(base), seeds))
  def simHash(hs: Column, nBits: Int): Column =
    ExpressionUtils.column(SimHashExpr(ExpressionUtils.expression(hs), nBits))
  def countInSet(toks: Column, dict: Seq[String]): Column =
    ExpressionUtils.column(
      CountInSet(ExpressionUtils.expression(toks), dict))
  def subwordCount(toks: Column): Column =
    ExpressionUtils.column(SubwordCount(ExpressionUtils.expression(toks)))
}
