package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftx.{Shim => ExpressionUtils}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Tight-loop kernels behind the dedup hash expressions.
  *
  * The fingerprint primitive everywhere is the oracle-parity 60-bit hash
  * `conv(substring(md5(concat(salt, ':', s)), 1, 15), 16, 10)` (see
  * `graft.operators.Dedup.md5Long`). Composing that per token per bit out
  * of higher-order functions is catastrophically slow: Spark evaluates
  * lambda bodies interpreted (no codegen inside `transform`/`aggregate`),
  * so each md5 pays Concat -> Md5 -> hex UTF8String -> Substring -> Conv
  * radix parse, boxed, per evaluation. These kernels compute the same
  * 60 bits directly from the digest bytes (first 15 hex chars == first
  * 8 big-endian bytes >>> 4) with a thread-local MessageDigest, and run
  * the whole per-document loop in one JVM call.
  */
object HashKernels {

  private val md = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest = MessageDigest.getInstance("MD5")
  }

  /** Salt prefixes "0:", "1:", ... shared by minhash permutations. */
  private val saltPrefix: Array[Array[Byte]] =
    Array.tabulate(64)(i => s"$i:".getBytes("UTF-8"))

  private val space = UTF8String.fromString(" ")

  /** Whitespace tokens, empties dropped — byte-for-byte the semantics of
    * `filter(split(text, ' '), t -> t != '')` (split on the literal
    * single space, then drop empty segments). Safe to scan bytewise:
    * UTF-8 continuation bytes are >= 0x80 and can never alias 0x20.
    */
  def tokenize(text: UTF8String): Array[UTF8String] = {
    val bytes = text.getBytes
    val out = new scala.collection.mutable.ArrayBuffer[UTF8String](16)
    var start = 0
    var i = 0
    while (i <= bytes.length) {
      if (i == bytes.length || bytes(i) == ' '.toByte) {
        if (i > start) out += UTF8String.fromBytes(bytes, start, i - start)
        start = i + 1
      }
      i += 1
    }
    out.toArray
  }

  /** Distinct word n-gram shingles, first-occurrence order — identical to
    * `array_distinct(TextAnalysis.shingles(text, n))`: documents shorter
    * than n tokens fall back to the whole text as a single shingle.
    */
  def shingleSet(text: UTF8String, n: Int): ArrayData = {
    val toks = tokenize(text)
    if (toks.length < n)
      return new GenericArrayData(Array[Any](text))
    val seen = new java.util.LinkedHashSet[UTF8String]()
    var i = 0
    while (i + n <= toks.length) {
      val parts = new Array[UTF8String](n)
      var o = 0
      while (o < n) { parts(o) = toks(i + o); o += 1 }
      seen.add(UTF8String.concatWs(space, parts: _*))
      i += 1
    }
    new GenericArrayData(seen.toArray(new Array[AnyRef](seen.size)).asInstanceOf[Array[Any]])
  }

  /** 60-bit salted hash of a UTF8 string; identical to
    * `conv(substring(md5(concat('<salt>:', s)), 1, 15), 16, 10)`.
    */
  def md5Long60(salt: Int, s: UTF8String): Long = {
    val d = md.get()
    d.update(saltPrefix(salt))
    d.update(s.getBytes)
    val b = d.digest() // digest() resets the instance
    val hi8 =
      ((b(0) & 0xffL) << 56) | ((b(1) & 0xffL) << 48) | ((b(2) & 0xffL) << 40) |
        ((b(3) & 0xffL) << 32) | ((b(4) & 0xffL) << 24) | ((b(5) & 0xffL) << 16) |
        ((b(6) & 0xffL) << 8) | (b(7) & 0xffL)
    hi8 >>> 4
  }

  /** 60-bit SimHash of a token array: per token, the salted (salt=0)
    * 60-bit hash votes +1/-1 on each bit position; the signature sets bit
    * b iff the vote sum is positive. Single md5 pass per token.
    */
  def simhash60(toks: ArrayData): Long = {
    val n = toks.numElements()
    val counters = new Array[Int](60)
    var i = 0
    while (i < n) {
      val h = md5Long60(0, toks.getUTF8String(i))
      var b = 0
      while (b < 60) {
        counters(b) += (((h >>> b) & 1L).toInt * 2) - 1
        b += 1
      }
      i += 1
    }
    var sim = 0L
    var b = 0
    while (b < 60) {
      if (counters(b) > 0) sim |= 1L << b
      b += 1
    }
    sim
  }

  /** SimHash straight from the raw text: tokenize + hash in one call, so
    * the expression has no higher-order-function children (HOFs are
    * CodegenFallback and would break the whole-stage-codegen span).
    */
  def simhash60Text(text: UTF8String): Long = {
    val toks = tokenize(text)
    val counters = new Array[Int](60)
    var i = 0
    while (i < toks.length) {
      val h = md5Long60(0, toks(i))
      var b = 0
      while (b < 60) {
        counters(b) += (((h >>> b) & 1L).toInt * 2) - 1
        b += 1
      }
      i += 1
    }
    var sim = 0L
    var b = 0
    while (b < 60) {
      if (counters(b) > 0) sim |= 1L << b
      b += 1
    }
    sim
  }

  /** Rolling-hash document fingerprint (winnowing-style): per token the
    * salt-0 60-bit hash mod M, then a degree-`w` polynomial combine over
    * each length-`w` token window (base B mod M), fingerprint = min over
    * windows. Documents shorter than `w` tokens hash their whole token
    * stream as one window; no tokens => -1. B and M chosen so
    * `acc * B + h` never overflows a signed 64-bit in either engine.
    */
  final val RollB = 257L
  final val RollM = 1000000007L

  def rollingFingerprint(text: UTF8String, w: Int): Long = {
    val toks = tokenize(text)
    val n = toks.length
    if (n == 0) return -1L
    val hs = new Array[Long](n)
    var i = 0
    while (i < n) { hs(i) = md5Long60(0, toks(i)) % RollM; i += 1 }
    val nWin = math.max(1, n - w + 1)
    var minH = Long.MaxValue
    var s = 0
    while (s < nWin) {
      var acc = 0L
      var j = s
      val end = math.min(n, s + w)
      while (j < end) { acc = (acc * RollB + hs(j)) % RollM; j += 1 }
      if (acc < minH) minH = acc
      s += 1
    }
    minH
  }

  private val hexDigits = "0123456789abcdef".getBytes("US-ASCII")

  /** Lowercase hex of a 16-byte md5 digest — byte-identical to the
    * engines' `md5()` string form.
    */
  private def hex16(b: Array[Byte]): UTF8String = {
    val out = new Array[Byte](32)
    var i = 0
    while (i < 16) {
      out(2 * i) = hexDigits((b(i) >> 4) & 0xf)
      out(2 * i + 1) = hexDigits(b(i) & 0xf)
      i += 1
    }
    UTF8String.fromBytes(out)
  }

  /** Unsigned bytewise less-than over 16-byte digests. The nibble→hex-char
    * map is monotone ('0'..'9' < 'a'..'f'), so this IS lexicographic order
    * of the hex strings — the min can be tracked on raw digests and
    * hex-encoded once at the end.
    */
  private def digestLess(a: Array[Byte], b: Array[Byte]): Boolean = {
    var i = 0
    while (i < 16) {
      val ai = a(i) & 0xff
      val bi = b(i) & 0xff
      if (ai != bi) return ai < bi
      i += 1
    }
    false
  }

  /** md5 hex of the space-normalized token stream — identical to
    * `md5(concat_ws(' ', tokenize(text)))` without the interpreted
    * `filter` HOF in the plan.
    */
  def normalizedMd5(text: UTF8String): UTF8String = {
    val toks = tokenize(text)
    val d = md.get()
    var i = 0
    while (i < toks.length) {
      if (i > 0) d.update(' '.toByte)
      d.update(toks(i).getBytes)
      i += 1
    }
    hex16(d.digest())
  }

  /** Min md5 hex over word n-gram shingles (1-permutation MinHash as a
    * string key) — identical to `array_min(transform(shingles(text, n),
    * md5))`, whose per-shingle md5 ran INTERPRETED inside the transform
    * lambda. Docs shorter than n tokens hash the raw text (the whole-doc
    * fallback shingle); one digest per window, min tracked on raw digest
    * bytes.
    */
  def minShingleFp(text: UTF8String, n: Int): UTF8String = {
    val d = md.get()
    val toks = tokenize(text)
    if (toks.length < n) {
      d.update(text.getBytes)
      return hex16(d.digest())
    }
    var minD: Array[Byte] = null
    var i = 0
    while (i + n <= toks.length) {
      var o = 0
      while (o < n) {
        if (o > 0) d.update(' '.toByte)
        d.update(toks(i + o).getBytes)
        o += 1
      }
      val cur = d.digest()
      if (minD == null || digestLess(cur, minD)) minD = cur
      i += 1
    }
    hex16(minD)
  }

  /** k-permutation MinHash signature: element i is the min over shingles
    * of the salt-i 60-bit hash. Empty input yields all-null (the
    * `array_min` of an empty array), matching the column-algebra form.
    */
  def minhashSig(sh: ArrayData, k: Int): ArrayData = {
    val n = sh.numElements()
    if (n == 0) return new GenericArrayData(Array.fill[Any](k)(null))
    val mins = Array.fill(k)(Long.MaxValue)
    var i = 0
    while (i < n) {
      val s = sh.getUTF8String(i)
      var p = 0
      while (p < k) {
        val h = md5Long60(p, s)
        if (h < mins(p)) mins(p) = h
        p += 1
      }
      i += 1
    }
    new GenericArrayData(mins.map(Long.box(_): Any))
  }
}

/** 60-bit SimHash — native codegen form of the reference algebra in
  * `Dedup.simhashExpr`'s scaladoc. Accepts either raw text (StringType;
  * tokenizes internally, keeping the plan free of CodegenFallback HOFs)
  * or a pre-tokenized `array<string>`.
  */
case class SimHash60(child: Expression)
    extends UnaryExpression with Serializable {
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash60"

  private def fromText: Boolean = child.dataType == StringType

  override protected def nullSafeEval(in: Any): Any =
    if (fromText) HashKernels.simhash60Text(in.asInstanceOf[UTF8String])
    else HashKernels.simhash60(in.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val fn = if (fromText) "simhash60Text" else "simhash60"
    defineCodeGen(ctx, ev, c => s"graft.functions.HashKernels.$fn($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): SimHash60 =
    copy(child = newChild)
}

object SimHash60 {
  def apply(toks: Column): Column =
    ExpressionUtils.column(SimHash60(ExpressionUtils.expression(toks)))
}

/** k-permutation MinHash signature over `array<string>` shingles. */
case class MinHashSig(child: Expression, k: Int)
    extends UnaryExpression with Serializable {
  override def dataType: DataType = ArrayType(LongType, containsNull = true)
  override def prettyName: String = "minhash_sig"

  override protected def nullSafeEval(sh: Any): Any =
    HashKernels.minhashSig(sh.asInstanceOf[ArrayData], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.HashKernels.minhashSig($c, $k)")

  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)
}

object MinHashSig {
  def apply(sh: Column, k: Int): Column =
    ExpressionUtils.column(MinHashSig(ExpressionUtils.expression(sh), k))
}

/** Distinct word n-gram shingle set from raw text — native form of
  * `array_distinct(TextAnalysis.shingles(text, n))`, codegen-clean.
  */
case class ShingleSetExpr(child: Expression, n: Int)
    extends UnaryExpression with Serializable {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "shingle_set"

  override protected def nullSafeEval(text: Any): Any =
    HashKernels.shingleSet(text.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.HashKernels.shingleSet($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): ShingleSetExpr =
    copy(child = newChild)
}

object ShingleSetExpr {
  def apply(text: Column, n: Int): Column =
    ExpressionUtils.column(ShingleSetExpr(ExpressionUtils.expression(text), n))
}

/** Winnowing-style rolling-hash fingerprint over the token stream. */
case class RollingFingerprintExpr(child: Expression, w: Int)
    extends UnaryExpression with Serializable {
  override def dataType: DataType = LongType
  override def prettyName: String = "rolling_fp"

  override protected def nullSafeEval(text: Any): Any =
    HashKernels.rollingFingerprint(text.asInstanceOf[UTF8String], w)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.HashKernels.rollingFingerprint($c, $w)")

  override protected def withNewChildInternal(newChild: Expression): RollingFingerprintExpr =
    copy(child = newChild)
}

object RollingFingerprintExpr {
  def apply(text: Column, w: Int): Column =
    ExpressionUtils.column(RollingFingerprintExpr(ExpressionUtils.expression(text), w))
}

/** md5 hex of the space-normalized token stream (whole-doc fingerprint). */
case class NormalizedMd5Expr(child: Expression)
    extends UnaryExpression with Serializable {
  override def dataType: DataType = StringType
  override def prettyName: String = "norm_md5"

  override protected def nullSafeEval(text: Any): Any =
    HashKernels.normalizedMd5(text.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.HashKernels.normalizedMd5($c)")

  override protected def withNewChildInternal(newChild: Expression): NormalizedMd5Expr =
    copy(child = newChild)
}

object NormalizedMd5Expr {
  def apply(text: Column): Column =
    ExpressionUtils.column(NormalizedMd5Expr(ExpressionUtils.expression(text)))
}

/** Min md5 hex over word n-gram shingles (1-permutation MinHash key). */
case class MinShingleFpExpr(child: Expression, n: Int)
    extends UnaryExpression with Serializable {
  override def dataType: DataType = StringType
  override def prettyName: String = "min_shingle_fp"

  override protected def nullSafeEval(text: Any): Any =
    HashKernels.minShingleFp(text.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.HashKernels.minShingleFp($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): MinShingleFpExpr =
    copy(child = newChild)
}

object MinShingleFpExpr {
  def apply(text: Column, n: Int): Column =
    ExpressionUtils.column(MinShingleFpExpr(ExpressionUtils.expression(text), n))
}

/** Single salted 60-bit hash of a string — native form of
  * `Dedup.md5Long` for hot join-key paths.
  */
case class Md5Long60Expr(child: Expression, salt: Int)
    extends UnaryExpression with Serializable {
  override def dataType: DataType = LongType
  override def prettyName: String = "md5long60"

  override protected def nullSafeEval(s: Any): Any =
    HashKernels.md5Long60(salt, s.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.HashKernels.md5Long60($salt, $c)")

  override protected def withNewChildInternal(newChild: Expression): Md5Long60Expr =
    copy(child = newChild)
}

object Md5Long60Expr {
  def apply(s: Column, salt: Int): Column =
    ExpressionUtils.column(Md5Long60Expr(ExpressionUtils.expression(s), salt))
}
