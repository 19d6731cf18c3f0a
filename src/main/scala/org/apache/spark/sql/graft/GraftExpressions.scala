package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Native Catalyst expressions (with `doGenCode`) for the hot loops that
  * Spark's higher-order functions (`transform`/`aggregate`) leave
  * interpreted: per-element lambdas cost ~10× a compiled loop, which
  * dominates the similarity/dedup operators at scale.
  *
  * Each expression computes EXACTLY the same arithmetic, in the same
  * order, as the Column-fold formulation it replaces (and as the DuckDB
  * oracle SQL) — swapping one in changes plan speed, never results.
  */

/** 16-bit SimHash over an array<long> of element hashes: bit j of the
  * result is set iff Σ over elements of (bit j set ? +1 : −1) is > 0.
  * Null on empty arrays (mirrors array_min/aggregate-on-empty semantics).
  */
case class SimHash16(child: Expression) extends UnaryExpression with ExpectsInputTypes {
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(LongType))

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    if (n == 0) return null
    val counts = new Array[Int](16)
    var i = 0
    while (i < n) {
      val h = arr.getLong(i)
      var j = 0
      while (j < 16) {
        if (((h >> j) & 1L) == 1L) counts(j) += 1 else counts(j) -= 1
        j += 1
      }
      i += 1
    }
    var result = 0L
    var j = 0
    while (j < 16) { if (counts(j) > 0) result |= (1L << j); j += 1 }
    result
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, arr => {
      val n = ctx.freshName("n")
      val counts = ctx.freshName("counts")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val h = ctx.freshName("h")
      s"""
        int $n = $arr.numElements();
        if ($n == 0) { ${ev.isNull} = true; } else {
          int[] $counts = new int[16];
          for (int $i = 0; $i < $n; $i++) {
            long $h = $arr.getLong($i);
            for (int $j = 0; $j < 16; $j++) {
              if ((($h >> $j) & 1L) == 1L) $counts[$j]++; else $counts[$j]--;
            }
          }
          ${ev.value} = 0L;
          for (int $j = 0; $j < 16; $j++) {
            if ($counts[$j] > 0) ${ev.value} |= (1L << $j);
          }
        }
      """
    })

  override protected def withNewChildInternal(newChild: Expression): SimHash16 =
    copy(child = newChild)
}

/** Shared 64-bit SimHash loop (callable from generated code). */
object GraftSimHashUtil {
  def simhash64(arr: ArrayData): Long = {
    val n = arr.numElements()
    val counts = new Array[Int](64)
    var i = 0
    while (i < n) {
      val h = arr.getLong(i)
      var j = 0
      while (j < 64) {
        if (((h >> j) & 1L) == 1L) counts(j) += 1 else counts(j) -= 1
        j += 1
      }
      i += 1
    }
    var result = 0L
    var j = 0
    while (j < 64) { if (counts(j) > 0) result |= (1L << j); j += 1 }
    result
  }
}

/** 64-bit SimHash over an array<long> of element hashes — the scale-path
  * fingerprint ([[SimHash16]] is the compact variant; the Σ±1
  * construction is identical at any width): bit j of the result is set
  * iff Σ over elements of (bit j set ? +1 : −1) is > 0. With w-bit
  * element hashes only the low w bits carry signal (the rest count to
  * −n and stay 0), which keeps the value non-negative for w < 64.
  * Null on empty arrays (mirrors aggregate-on-empty semantics).
  */
case class SimHash64(child: Expression) extends UnaryExpression with ExpectsInputTypes {
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(LongType))

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    if (arr.numElements() == 0) null else GraftSimHashUtil.simhash64(arr)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, arr => s"""
        if ($arr.numElements() == 0) { ${ev.isNull} = true; }
        else { ${ev.value} = org.apache.spark.sql.graft.GraftSimHashUtil.simhash64($arr); }
      """)

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}

/** Full MinHash signature in one pass: for each of the fixed permutations
  * (a_k, b_k), the min over elements of (a_k·h + b_k) mod P. Returns
  * array<long> of length [[MinHashSig.Perms]].size; null on empty input
  * (mirrors array_min-on-empty).
  */
case class MinHashSig(child: Expression) extends UnaryExpression with ExpectsInputTypes {
  import MinHashSig._
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(LongType))

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    if (n == 0) return null
    val mins = Array.fill(NumPerms)(Long.MaxValue)
    var i = 0
    while (i < n) {
      val h = arr.getLong(i)
      var k = 0
      while (k < NumPerms) {
        val v = (h * A(k) + B(k)) % P
        if (v < mins(k)) mins(k) = v
        k += 1
      }
      i += 1
    }
    new GenericArrayData(mins)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val aRef = ctx.addReferenceObj("minhashA", A, "long[]")
    val bRef = ctx.addReferenceObj("minhashB", B, "long[]")
    nullSafeCodeGen(ctx, ev, arr => {
      val n = ctx.freshName("n")
      val mins = ctx.freshName("mins")
      val i = ctx.freshName("i")
      val k = ctx.freshName("k")
      val h = ctx.freshName("h")
      val v = ctx.freshName("v")
      s"""
        int $n = $arr.numElements();
        if ($n == 0) { ${ev.isNull} = true; } else {
          long[] $mins = new long[$NumPerms];
          java.util.Arrays.fill($mins, Long.MAX_VALUE);
          for (int $i = 0; $i < $n; $i++) {
            long $h = $arr.getLong($i);
            for (int $k = 0; $k < $NumPerms; $k++) {
              long $v = ($h * $aRef[$k] + $bRef[$k]) % ${P}L;
              if ($v < $mins[$k]) $mins[$k] = $v;
            }
          }
          ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($mins);
        }
      """
    })
  }

  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)
}

object MinHashSig {
  /** Mirrors [[graft.functions.TextOps.Perms]] / the oracle SQL constants. */
  val A: Array[Long] = Array(1000003L, 999983L, 876543L, 765431L, 654323L,
    543217L, 432109L, 321017L, 234567L, 198491L, 162947L, 131071L)
  val B: Array[Long] = Array(12345L, 54321L, 11111L, 99999L, 77777L, 33333L,
    88888L, 22222L, 66666L, 44444L, 55555L, 13579L)
  val P: Long = 16777259L
  val NumPerms: Int = 12
}

/** Dot product of two array<float> columns, accumulated in double with a
  * strict left fold — identical association order (and therefore bits) to
  * `aggregate(zip_with(a,b,_*_), 0d, _+_)` and the oracle's LIST_REDUCE.
  * Null semantics match the fold form exactly: mismatched lengths
  * (zip_with pads with nulls) or any null element make the result NULL —
  * never a plausible-looking partial dot product.
  */
case class FloatDot(left: Expression, right: Expression) extends BinaryExpression with ImplicitCastInputTypes {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(FloatType), ArrayType(FloatType))

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    if (x.numElements() != y.numElements()) return null
    val n = x.numElements()
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      acc += x.getFloat(i).toDouble * y.getFloat(i).toDouble
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
        if ($x.numElements() != $y.numElements()) { ${ev.isNull} = true; } else {
          int $n = $x.numElements();
          double $acc = 0.0;
          for (int $i = 0; $i < $n; $i++) {
            if ($x.isNullAt($i) || $y.isNullAt($i)) { ${ev.isNull} = true; break; }
            $acc += ((double) $x.getFloat($i)) * ((double) $y.getFloat($i));
          }
          if (!${ev.isNull}) { ${ev.value} = $acc; }
        }
      """
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): FloatDot =
    copy(left = newLeft, right = newRight)
}

/** Cosine similarity of two array<float> columns in ONE pass: the three
  * accumulators (x·y, x·x, y·y) advance together per element, each as its
  * own strict left fold — so every sum is bit-identical to the separate
  * FloatDot/norm formulation (dot(a,b) / (sqrt(dot(a,a)) · sqrt(dot(b,b)))
  * and the oracle's LIST_REDUCE mirrors), while the arrays are walked once
  * instead of three times (the inner loop of every brute-force similarity
  * scan). Null semantics match FloatDot: mismatched lengths or null
  * elements → NULL.
  */
case class CosineSim(left: Expression, right: Expression) extends BinaryExpression with ImplicitCastInputTypes {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(FloatType), ArrayType(FloatType))

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    if (x.numElements() != y.numElements()) return null
    val n = x.numElements()
    var xy = 0.0
    var xx = 0.0
    var yy = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      val xi = x.getFloat(i).toDouble
      val yi = y.getFloat(i).toDouble
      xy += xi * yi
      xx += xi * xi
      yy += yi * yi
      i += 1
    }
    xy / (math.sqrt(xx) * math.sqrt(yy))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val xy = ctx.freshName("xy")
      val xx = ctx.freshName("xx")
      val yy = ctx.freshName("yy")
      val xi = ctx.freshName("xi")
      val yi = ctx.freshName("yi")
      s"""
        if ($x.numElements() != $y.numElements()) { ${ev.isNull} = true; } else {
          int $n = $x.numElements();
          double $xy = 0.0; double $xx = 0.0; double $yy = 0.0;
          for (int $i = 0; $i < $n; $i++) {
            if ($x.isNullAt($i) || $y.isNullAt($i)) { ${ev.isNull} = true; break; }
            double $xi = (double) $x.getFloat($i);
            double $yi = (double) $y.getFloat($i);
            $xy += $xi * $yi; $xx += $xi * $xi; $yy += $yi * $yi;
          }
          if (!${ev.isNull}) {
            ${ev.value} = $xy / (java.lang.Math.sqrt($xx) * java.lang.Math.sqrt($yy));
          }
        }
      """
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineSim =
    copy(left = newLeft, right = newRight)
}

/** Thread-local md5 helper callable from generated code (static forwarder
  * on the companion-less top-level object).
  */
object GraftHashUtil {
  private val digest = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** First 24 bits (big-endian) of md5(bytes) — identical to parsing the
    * first 6 hex chars of the md5 hex digest, i.e. to
    * `conv(substring(md5(x),1,6),16,10)` and the oracle's
    * `CAST('0x' || SUBSTR(MD5(x),1,6) AS BIGINT)`.
    */
  def hash24(s: org.apache.spark.unsafe.types.UTF8String): Long = {
    val md = digest.get()
    md.reset()
    val d = md.digest(s.getBytes)
    (((d(0) & 0xffL) << 16) | ((d(1) & 0xffL) << 8) | (d(2) & 0xffL))
  }

  /** `windows` Poisson weights from ONE md5: the 24-bit big-endian
    * window at bytes 3p..3p+2 (≡ hex chars 6p+1..6p+6, i.e. the
    * oracle's `CAST('0x' || SUBSTR(MD5(x), p*6+1, 6) AS BIGINT)`) is
    * mapped through the inverse-CDF threshold ladder: weight = first k
    * with u < th(k), else th.length. Window p = 0 is exactly
    * [[hash24]]'s draw, so ladders keyed on the first window reproduce
    * the per-draw formulation bit-for-bit.
    */
  def poissonWindows(s: org.apache.spark.unsafe.types.UTF8String,
      th: Array[Long], windows: Int): Array[Long] = {
    val md = digest.get()
    md.reset()
    val d = md.digest(s.getBytes)
    val out = new Array[Long](windows)
    var p = 0
    while (p < windows) {
      val u = ((d(3 * p) & 0xffL) << 16) |
        ((d(3 * p + 1) & 0xffL) << 8) | (d(3 * p + 2) & 0xffL)
      var k = 0
      while (k < th.length && u >= th(k)) k += 1
      out(p) = k.toLong
      p += 1
    }
    out
  }

  /** First 60 bits (big-endian) of md5(bytes) — identical to parsing the
    * first 15 hex chars of the md5 hex digest, i.e. to the oracle's
    * `CAST('0x' || SUBSTR(MD5(x),1,15) AS BIGINT)`. 15 chars, not 16:
    * a full 64-bit parse would overflow the positive signed range.
    */
  def hash60(s: org.apache.spark.unsafe.types.UTF8String): Long = {
    val md = digest.get()
    md.reset()
    val d = md.digest(s.getBytes)
    var r = 0L
    var i = 0
    while (i < 7) { r = (r << 8) | (d(i) & 0xffL); i += 1 }
    (r << 4) | ((d(7) >> 4) & 0xfL)
  }
}

/** Per-element 24-bit md5 hashes of an array<string>, in one compiled
  * pass (replaces the interpreted `transform(arr, md5 ∘ conv)` lambda —
  * the dominant cost of the dedup family at scale). Identical values to
  * [[graft.functions.TextOps.hash24]], INCLUDING null elements: a null
  * slot hashes to a null slot (as the transform-fold does), and the
  * output's containsNull mirrors the input's. The hot path (non-null
  * element type, which is what the shingle pipeline produces) keeps the
  * primitive long[] loop.
  */
case class Hash24Array(child: Expression) extends UnaryExpression with ExpectsInputTypes {
  private def elementsNullable: Boolean = child.dataType match {
    case ArrayType(_, cn) => cn
    case _ => false
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = elementsNullable)
  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(StringType))

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    if (!elementsNullable) {
      val out = new Array[Long](n)
      var i = 0
      while (i < n) {
        out(i) = GraftHashUtil.hash24(arr.getUTF8String(i))
        i += 1
      }
      new GenericArrayData(out)
    } else {
      val out = new Array[Any](n)
      var i = 0
      while (i < n) {
        if (!arr.isNullAt(i))
          out(i) = java.lang.Long.valueOf(GraftHashUtil.hash24(arr.getUTF8String(i)))
        i += 1
      }
      new GenericArrayData(out)
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    if (!elementsNullable) {
      nullSafeCodeGen(ctx, ev, arr => {
        val n = ctx.freshName("n")
        val i = ctx.freshName("i")
        val out = ctx.freshName("out")
        s"""
          int $n = $arr.numElements();
          long[] $out = new long[$n];
          for (int $i = 0; $i < $n; $i++) {
            $out[$i] = org.apache.spark.sql.graft.GraftHashUtil.hash24($arr.getUTF8String($i));
          }
          ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
        """
      })
    } else {
      val expr = ctx.addReferenceObj("hash24Array", this, classOf[Hash24Array].getName)
      nullSafeCodeGen(ctx, ev, arr =>
        s"${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData) $expr.nullSafeEval($arr);")
    }

  override protected def withNewChildInternal(newChild: Expression): Hash24Array =
    copy(child = newChild)
}

/** The bootstrap operators' per-key Poisson draw block: md5(key) →
  * `windows` Poisson(1) weights via [[GraftHashUtil.poissonWindows]] —
  * one compiled digest with direct byte slicing, replacing `windows`
  * hex `conv(substring(md5(...)))` parses (the md5 hex-string
  * allocation plus five string-to-long base-16 scans dominated
  * bootstrap_mean_ci's per-draw cost). Values are EXACTLY the hex
  * SUBSTR windows the DuckDB oracle parses, mapped through the same
  * threshold ladder.
  */
case class Md5PoissonWindows(child: Expression, thresholds: Seq[Long],
    windows: Int)
  extends UnaryExpression with ExpectsInputTypes {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  private lazy val th = thresholds.toArray

  override def nullSafeEval(input: Any): Any =
    new GenericArrayData(GraftHashUtil.poissonWindows(
      input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String],
      th, windows))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s => {
      val thRef = ctx.addReferenceObj("poissonThresholds", th, "long[]")
      s"""
        ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(
          org.apache.spark.sql.graft.GraftHashUtil.poissonWindows(
            $s, $thRef, $windows));
      """
    })

  override protected def withNewChildInternal(newChild: Expression): Md5PoissonWindows =
    copy(child = newChild)
}

/** Count of common elements between two SORTED arrays of distinct
  * strings — a compiled sorted-merge, replacing per-pair
  * `size(array_intersect(a,b))` (interpreted, hash-set based). Exact set
  * semantics: binary UTF8 comparison, the same ordering array_sort uses.
  */
case class SortedCommonCount(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {
  override def dataType: DataType = LongType
  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(StringType), ArrayType(StringType))

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    var i = 0
    var j = 0
    var c = 0L
    while (i < x.numElements() && j < y.numElements()) {
      // Null slots (array_sort places them last) are skipped, never
      // dereferenced — only non-null common elements count.
      if (x.isNullAt(i)) i += 1
      else if (y.isNullAt(j)) j += 1
      else {
        val cmp = x.getUTF8String(i).compareTo(y.getUTF8String(j))
        if (cmp == 0) { c += 1; i += 1; j += 1 }
        else if (cmp < 0) i += 1
        else j += 1
      }
    }
    c
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val c = ctx.freshName("c")
      val cmp = ctx.freshName("cmp")
      s"""
        int $i = 0; int $j = 0; long $c = 0L;
        while ($i < $x.numElements() && $j < $y.numElements()) {
          if ($x.isNullAt($i)) { $i++; }
          else if ($y.isNullAt($j)) { $j++; }
          else {
            int $cmp = $x.getUTF8String($i).compareTo($y.getUTF8String($j));
            if ($cmp == 0) { $c++; $i++; $j++; }
            else if ($cmp < 0) { $i++; } else { $j++; }
          }
        }
        ${ev.value} = $c;
      """
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SortedCommonCount =
    copy(left = newLeft, right = newRight)
}

/** Shared compiled shingling helpers (callable from generated code). */
object GraftShingleUtil {
  import org.apache.spark.unsafe.types.UTF8String

  /** Whitespace tokens with limit -1: Java's default split DROPS trailing
    * empty tokens, but Spark's `split(col, "\\s+")` and DuckDB's
    * STRING_SPLIT_REGEX both KEEP them — text ending in whitespace would
    * otherwise shingle differently here than in the oracle.
    */
  private def tokens(text: UTF8String): Array[String] =
    text.toString.split("\\s+", -1)

  /** Distinct 3-word shingles hashed by `f` — fused equivalent of
    * f ∘ array_distinct ∘ shingles3 ∘ words (element order differs,
    * which no consumer observes: MinHash takes a min, SimHash sums over
    * the distinct set).
    */
  private def shingleHashes(text: UTF8String, f: UTF8String => Long): ArrayData = {
    val w = tokens(text)
    if (w.length < 3) return new GenericArrayData(Array.emptyLongArray)
    val seen = new java.util.LinkedHashSet[String]()
    var i = 0
    while (i + 2 < w.length) {
      seen.add(w(i) + " " + w(i + 1) + " " + w(i + 2))
      i += 1
    }
    val out = new Array[Long](seen.size)
    val it = seen.iterator()
    var k = 0
    while (it.hasNext) {
      out(k) = f(UTF8String.fromString(it.next()))
      k += 1
    }
    new GenericArrayData(out)
  }

  /** Distinct 3-word shingles at 24 bits (MinHash/Jaccard pipelines). */
  def shingleHash24(text: UTF8String): ArrayData =
    shingleHashes(text, GraftHashUtil.hash24)

  /** Distinct 3-word shingles at 60 bits (the SimHash64 fingerprint —
    * 24-bit element hashes would leave fingerprint bits 24..63 dead).
    */
  def shingleHash60(text: UTF8String): ArrayData =
    shingleHashes(text, GraftHashUtil.hash60)

  /** Sorted distinct 3-word shingles — fused equivalent of
    * array_sort ∘ array_distinct ∘ shingles3 ∘ words (binary UTF8 order,
    * the same ordering array_sort uses).
    */
  def sortedShingles3(text: UTF8String): ArrayData = {
    val w = tokens(text)
    if (w.length < 3) return new GenericArrayData(Array.empty[Any])
    val set = new java.util.TreeSet[UTF8String]()
    var i = 0
    while (i + 2 < w.length) {
      set.add(UTF8String.fromString(w(i) + " " + w(i + 1) + " " + w(i + 2)))
      i += 1
    }
    new GenericArrayData(set.toArray.asInstanceOf[Array[AnyRef]])
  }
}

/** text → array<long>: distinct 3-shingle 24-bit hashes in one pass. */
case class ShingleHash24(child: Expression) extends UnaryExpression with ExpectsInputTypes {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)

  override def nullSafeEval(input: Any): Any =
    GraftShingleUtil.shingleHash24(input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, t =>
      s"${ev.value} = org.apache.spark.sql.graft.GraftShingleUtil.shingleHash24($t);")

  override protected def withNewChildInternal(newChild: Expression): ShingleHash24 =
    copy(child = newChild)
}

/** text → array<long>: distinct 3-shingle 60-bit hashes in one pass. */
case class ShingleHash60(child: Expression) extends UnaryExpression with ExpectsInputTypes {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)

  override def nullSafeEval(input: Any): Any =
    GraftShingleUtil.shingleHash60(input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, t =>
      s"${ev.value} = org.apache.spark.sql.graft.GraftShingleUtil.shingleHash60($t);")

  override protected def withNewChildInternal(newChild: Expression): ShingleHash60 =
    copy(child = newChild)
}

/** text → array<string>: sorted distinct 3-shingles in one pass. */
case class SortedShingles3(child: Expression) extends UnaryExpression with ExpectsInputTypes {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)

  override def nullSafeEval(input: Any): Any =
    GraftShingleUtil.sortedShingles3(input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, t =>
      s"${ev.value} = org.apache.spark.sql.graft.GraftShingleUtil.sortedShingles3($t);")

  override protected def withNewChildInternal(newChild: Expression): SortedShingles3 =
    copy(child = newChild)
}

/** Distinct-common-element count helper (UTF8String arrays, order-free). */
object GraftIntersectUtil {
  import org.apache.spark.unsafe.types.UTF8String
  def commonCount(a: ArrayData, b: ArrayData): Int = {
    val bs = new java.util.HashSet[UTF8String]()
    var i = 0
    while (i < b.numElements()) { bs.add(b.getUTF8String(i)); i += 1 }
    val seen = new java.util.HashSet[UTF8String]()
    var c = 0
    i = 0
    while (i < a.numElements()) {
      val v = a.getUTF8String(i)
      if (bs.contains(v) && seen.add(v)) c += 1
      i += 1
    }
    c
  }
}

/** `size(array_intersect(a, b))` without materializing the intersection
  * array — the target of [[graft.RewriteIntersectCount]], Catalyst's
  * optimizer rewriting the composed form to this automatically.
  * Exact same value: count of distinct elements of `a` present in `b`.
  */
case class CommonCount(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {
  override def dataType: DataType = IntegerType
  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(StringType), ArrayType(StringType))

  override def nullSafeEval(a: Any, b: Any): Any =
    GraftIntersectUtil.commonCount(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = org.apache.spark.sql.graft.GraftIntersectUtil.commonCount($a, $b);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CommonCount =
    copy(left = newLeft, right = newRight)
}

/** text → struct(n_tokens, n_kept, text_filtered): whitespace-split,
  * stopword-filter (order/duplicates preserved), rejoin — one pass,
  * replacing an interpreted `filter(w, ¬array_contains(sw, t))` lambda
  * that costs O(tokens × stopwords) per row at the scan. Split uses
  * limit -1 (keep trailing empties) to mirror Spark's `split` and the
  * oracle's STRING_SPLIT_REGEX exactly.
  */
case class StopwordStats(child: Expression, stopwords: Seq[String])
    extends UnaryExpression with ExpectsInputTypes {
  override def dataType: DataType = StructType(Seq(
    StructField("n_tokens", LongType, nullable = false),
    StructField("n_kept", LongType, nullable = false),
    StructField("text_filtered", StringType, nullable = false)))
  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)

  @transient private lazy val stopSet: Set[String] = stopwords.toSet

  override def nullSafeEval(input: Any): Any = {
    val w = input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String]
      .toString.split("\\s+", -1)
    val kept = w.filterNot(stopSet.contains)
    InternalRow(
      w.length.toLong, kept.length.toLong,
      org.apache.spark.unsafe.types.UTF8String.fromString(kept.mkString(" ")))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val expr = ctx.addReferenceObj("stopwordStats", this, classOf[StopwordStats].getName)
    nullSafeCodeGen(ctx, ev, t =>
      s"${ev.value} = (org.apache.spark.sql.catalyst.InternalRow) $expr.nullSafeEval($t);")
  }

  override protected def withNewChildInternal(newChild: Expression): StopwordStats =
    copy(child = newChild)
}

/** text → array<string> of word bigrams (multiset, order preserved) in
  * one compiled pass — ≡ transform(sequence(1, n-1), i -> w[i]||' '||w[i+1]).
  */
case class Bigrams(child: Expression) extends UnaryExpression with ExpectsInputTypes {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)

  override def nullSafeEval(input: Any): Any = {
    // limit -1: keep trailing empty tokens, matching Spark split / the
    // oracle's STRING_SPLIT_REGEX (see GraftShingleUtil.tokens).
    val w = input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String]
      .toString.split("\\s+", -1)
    if (w.length < 2) return new GenericArrayData(Array.empty[Any])
    val out = new Array[AnyRef](w.length - 1)
    var i = 0
    while (i < w.length - 1) {
      out(i) = org.apache.spark.unsafe.types.UTF8String.fromString(w(i) + " " + w(i + 1))
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val expr = ctx.addReferenceObj("bigramsExpr", this, classOf[Bigrams].getName)
    nullSafeCodeGen(ctx, ev, t =>
      s"${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData) $expr.nullSafeEval($t);")
  }

  override protected def withNewChildInternal(newChild: Expression): Bigrams =
    copy(child = newChild)
}

/** Bloom-filter membership probe over a pre-built sketch, in codegen —
  * the native replacement for `udf(bloom.mightContainString)`: the UDF
  * breaks whole-stage codegen around the probe (boxing + catalyst⇄scala
  * conversion per row), which matters when the probe runs once per
  * shingle over the whole corpus. The sketch rides along with the
  * expression, so it ships to executors once per stage via the task
  * binary broadcast, like Spark's own BloomFilterMightContain.
  *
  * Probes with the UTF-8 bytes directly (`mightContainBinary`), which is
  * exactly what `mightContainString` hashes — no String allocation per
  * row.
  */
case class BloomMightContain(
    child: Expression,
    bloom: org.apache.spark.util.sketch.BloomFilter)
    extends UnaryExpression with ExpectsInputTypes {
  override def dataType: DataType = BooleanType
  override def nullable: Boolean = child.nullable
  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)

  override def nullSafeEval(input: Any): Any =
    bloom.mightContainBinary(
      input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String].getBytes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bloomRef = ctx.addReferenceObj("bloomFilter", bloom,
      classOf[org.apache.spark.util.sketch.BloomFilter].getName)
    nullSafeCodeGen(ctx, ev, s =>
      s"${ev.value} = $bloomRef.mightContainBinary($s.getBytes());")
  }

  override protected def withNewChildInternal(newChild: Expression): BloomMightContain =
    copy(child = newChild)
}

/** Count-min-sketch frequency probe over a pre-built sketch, in codegen —
  * completes the sketch family next to [[BloomMightContain]] (membership)
  * and the HLL/percentile sketches (built-ins): per-key frequency
  * ESTIMATES without carrying per-key state. CMS never under-estimates
  * (hash collisions only ADD), so `estimate >= threshold` keeps a
  * superset of the true heavy hitters — the exact-recheck pass that
  * follows trims the collisions, same two-stage discipline as the bloom
  * decontamination path. The sketch ships to executors once per stage
  * via the task-binary reference, never per row.
  */
case class CmsEstimate(
    child: Expression,
    cms: org.apache.spark.util.sketch.CountMinSketch)
    extends UnaryExpression with ExpectsInputTypes {
  override def dataType: DataType = LongType
  override def nullable: Boolean = child.nullable
  override def inputTypes: Seq[AbstractDataType] = Seq(LongType)

  override def nullSafeEval(input: Any): Any =
    cms.estimateCount(input.asInstanceOf[java.lang.Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cmsRef = ctx.addReferenceObj("cmSketch", cms,
      classOf[org.apache.spark.util.sketch.CountMinSketch].getName)
    nullSafeCodeGen(ctx, ev, s =>
      s"${ev.value} = $cmsRef.estimateCount((Object) java.lang.Long.valueOf($s));")
  }

  override protected def withNewChildInternal(newChild: Expression): CmsEstimate =
    copy(child = newChild)
}

/** Shared single-pass character-class counter (callable from generated
  * code). Classes are the ASCII sets the regex formulation counts —
  * `[a-z]`, `[A-Z]`, `[0-9]`, Java-regex `\s` = { space, \t, \n, \x0B,
  * \f, \r } — plus the CODE-POINT length in slot 0. Iterates UTF-8
  * BYTES: every class byte is ASCII, and multi-byte sequences never
  * produce bytes < 0x80, so non-ASCII characters fall through to the
  * derived "other" bucket exactly as the regexes classify them.
  */
object GraftCharClassUtil {
  def counts(s: org.apache.spark.unsafe.types.UTF8String): ArrayData = {
    val b = s.getBytes
    var lower = 0L; var upper = 0L; var digit = 0L; var space = 0L
    var i = 0
    while (i < b.length) {
      val c = b(i)
      if (c >= 'a' && c <= 'z') lower += 1
      else if (c >= 'A' && c <= 'Z') upper += 1
      else if (c >= '0' && c <= '9') digit += 1
      else if (c == ' ' || c == '\t' || c == '\n' || c == 0x0B
        || c == '\f' || c == '\r') space += 1
      i += 1
    }
    new GenericArrayData(Array(s.numChars().toLong, lower, upper, digit, space))
  }
}

/** Fused character-class profile of a string column: ONE pass over the
  * bytes instead of five regexp_count scans (each of which re-walks the
  * string through the regex engine). Returns array<long>
  * [n_chars, n_lower, n_upper, n_digit, n_space]; "other" is derived by
  * subtraction downstream. Same results as the regex formulation —
  * [[graft.ExpressionSpec]] pins the equivalence.
  */
case class CharClassCounts(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = child.nullable
  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)

  override def nullSafeEval(input: Any): Any =
    GraftCharClassUtil.counts(
      input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s =>
      s"${ev.value} = org.apache.spark.sql.graft.GraftCharClassUtil.counts($s);")

  override protected def withNewChildInternal(newChild: Expression): CharClassCounts =
    copy(child = newChild)
}

/** [[BloomMightContain]]'s BIGINT twin (mightContainLong) — for runtime
  * semi-join reduction on integer keys: the filtered build side's key
  * set rides to every executor as KB of bloom bits and prunes the probe
  * scan BEFORE any shuffle. False positives only — the exact join
  * downstream keeps results deterministic.
  */
case class BloomMightContainLong(
    child: Expression,
    bloom: org.apache.spark.util.sketch.BloomFilter)
    extends UnaryExpression with ExpectsInputTypes {
  override def dataType: DataType = BooleanType
  override def nullable: Boolean = child.nullable
  override def inputTypes: Seq[AbstractDataType] = Seq(LongType)

  override def nullSafeEval(input: Any): Any =
    bloom.mightContainLong(input.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bloomRef = ctx.addReferenceObj("bloomFilter", bloom,
      classOf[org.apache.spark.util.sketch.BloomFilter].getName)
    nullSafeCodeGen(ctx, ev, s =>
      s"${ev.value} = $bloomRef.mightContainLong($s);")
  }

  override protected def withNewChildInternal(newChild: Expression): BloomMightContainLong =
    copy(child = newChild)
}
