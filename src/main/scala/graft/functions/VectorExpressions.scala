package graft.functions

import org.apache.spark.sql.{Column, SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression,
  ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native Catalyst kernels for the vector math on the similarity hot path.
  *
  * The HOF formulation (`aggregate(zip_with(a, b, *), 0.0, +)`) allocates an
  * intermediate products array and evaluates two lambdas per element in the
  * interpreter — measurably slow inside an N×P pair loop. These expressions
  * fuse the loop into one codegen'd pass (tier (b) of the custom-operator
  * ladder: a native `Expression` with `doGenCode`, before reaching for a
  * custom physical operator).
  *
  * Accumulation order is left-to-right, identical to the HOF fold and to
  * DuckDB's list_cosine_similarity — the produced doubles are bit-identical,
  * so swapping kernels cannot move an oracle hash.
  */
case class VectorDot(left: Expression, right: Expression)
    extends BinaryExpression {

  override def nullIntolerant: Boolean = true
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_vector_dot"

  /** Always nullable: length-mismatched or null-element inputs yield null
    * even when both children are non-nullable. Without this, codegen's
    * `ev.isNull` is the literal `false` and the generated `ev.isNull = true`
    * assignment does not compile (silent per-stage interpreter fallback).
    */
  override def nullable: Boolean = true

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    if (left.dataType == ArrayType(DoubleType, true) ||
        left.dataType == ArrayType(DoubleType, false)) {
      if (right.dataType == ArrayType(DoubleType, true) ||
          right.dataType == ArrayType(DoubleType, false)) {
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      } else org.apache.spark.sql.catalyst.analysis.TypeCheckResult
        .TypeCheckFailure(s"right must be array<double>, got ${right.dataType}")
    } else org.apache.spark.sql.catalyst.analysis.TypeCheckResult
      .TypeCheckFailure(s"left must be array<double>, got ${left.dataType}")
  }

  /** Null ELEMENTS and length-mismatched arrays propagate to a null result —
    * the same semantics as the HOF fold (`zip_with` pads the shorter array
    * with nulls, x*y with null is null, the sum absorbs it). DuckDB's
    * `list_cosine_similarity` errors on ragged input instead; the engine's
    * queries only ever dot fixed-dimension embeddings, where the two agree.
    */
  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (y.numElements() != n) return null
    var s = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      s += x.getDouble(i) * y.getDouble(i)
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      s"""
        int $n = $a.numElements();
        double $s = 0.0;
        if ($b.numElements() != $n) { ${ev.isNull} = true; }
        for (int $i = 0; !${ev.isNull} && $i < $n; $i++) {
          if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
          $s += $a.getDouble($i) * $b.getDouble($i);
        }
        if (!${ev.isNull}) { ${ev.value} = $s; }
      """
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): VectorDot =
    copy(left = newLeft, right = newRight)
}

/** L2 norm as a fused single pass (sqrt of self-dot). */
case class VectorNorm(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def nullIntolerant: Boolean = true
  override def dataType: DataType = DoubleType

  /** Null elements yield null even from a non-nullable child — keep
    * `nullable` consistent with that so codegen's isNull is a real variable.
    */
  override def nullable: Boolean = child.nullable || (child.dataType match {
    case ArrayType(_, containsNull) => containsNull
    case _ => true // unresolved/mistyped child: stay safe pre-typecheck
  })

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == ArrayType(DoubleType, true) ||
        child.dataType == ArrayType(DoubleType, false)) {
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    } else org.apache.spark.sql.catalyst.analysis.TypeCheckResult
      .TypeCheckFailure(s"child must be array<double>, got ${child.dataType}")
  override def prettyName: String = "graft_vector_norm"

  override def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val n = x.numElements()
    var s = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i)) return null
      val v = x.getDouble(i); s += v * v; i += 1
    }
    math.sqrt(s)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      val v = ctx.freshName("v")
      // when !nullable, nullSafeCodeGen never DECLARES ev.isNull (it swaps
      // in a false-literal for consumers) — any reference to the name is an
      // undeclared identifier, so both the element null-check (dead code:
      // containsNull=false) and the final guard must vanish entirely
      val nullCheck =
        if (nullable) s"if ($a.isNullAt($i)) { ${ev.isNull} = true; break; }"
        else ""
      val guard = if (nullable) s"if (!${ev.isNull}) " else ""
      s"""
        int $n = $a.numElements();
        double $s = 0.0;
        for (int $i = 0; $i < $n; $i++) {
          $nullCheck
          double $v = $a.getDouble($i);
          $s += $v * $v;
        }
        $guard{ ${ev.value} = java.lang.Math.sqrt($s); }
      """
    })

  override protected def withNewChildInternal(newChild: Expression): VectorNorm =
    copy(child = newChild)
}

/** 16-bit SimHash of a token array in ONE fused pass — the upgrade path
  * SCALE.md recorded for the 16-HOF-pass formulation in q_dedup_simhash
  * ("single-pass custom expression like VectorDot — measured-then-
  * optimized"). Bit-exact with that formulation: per token, the hash is the
  * first 4 md5 hex chars (= first 2 digest bytes, big-endian) exactly as
  * `conv(substring(md5(t),1,4),16,10)` computes, bit b of the result is set
  * iff strictly more than half the token hashes have bit b set — so the
  * existing DuckDB oracle keeps matching unchanged.
  */
case class SimHash16(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  import org.apache.spark.sql.types.{LongType, StringType}

  override def nullIntolerant: Boolean = true
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_simhash16"

  /** Null ELEMENTS yield null — DELIBERATELY STRICTER than the 16-pass HOF
    * fold, which coerces the nulled per-bit aggregate to a 0 vote via
    * `when(...).otherwise(0)` and returns 0: a null token is corrupt input,
    * not 16 silent zero-votes. Unreachable from q_dedup_simhash (split()
    * never yields null elements); the divergence is pinned by its own test.
    */
  override def nullable: Boolean = true

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t => org.apache.spark.sql.catalyst.analysis.TypeCheckResult
        .TypeCheckFailure(s"child must be array<string>, got $t")
    }

  override def nullSafeEval(a: Any): Any =
    SimHash16.compute(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val r = ctx.freshName("sh")
      // the md5 loop lives in a static helper — the expression still fuses
      // into the enclosing WholeStageCodegen stage (one call per row, no
      // interpreter fallback), which is the part that matters
      s"""
        java.lang.Long $r = graft.functions.SimHash16.compute($a);
        if ($r == null) { ${ev.isNull} = true; }
        else { ${ev.value} = $r.longValue(); }
      """
    })

  override protected def withNewChildInternal(newChild: Expression): SimHash16 =
    copy(child = newChild)
}

/** Per-thread MD5 instance shared by the fused kernels: `getInstance` does a
  * provider lookup + allocation per call, measurable overhead when invoked
  * once per ROW inside a codegen'd loop. Kernel threads are task threads, so
  * a ThreadLocal is contention-free; callers must `reset()` before use (the
  * shared `get()` does it).
  */
private[functions] object Md5 {
  private val tl: ThreadLocal[java.security.MessageDigest] =
    ThreadLocal.withInitial(() => java.security.MessageDigest.getInstance("MD5"))
  def get(): java.security.MessageDigest = {
    val md = tl.get()
    md.reset()
    md
  }
}

object SimHash16 {
  /** One pass: per token md5 → first 2 bytes → 16 bit-counters; majority
    * vote per bit. Returns null on a null token (stricter than the HOF
    * fold's 0 — see the `nullable` scaladoc).
    */
  def compute(arr: ArrayData): java.lang.Long = {
    val n = arr.numElements()
    val ones = new Array[Int](16)
    val md = Md5.get()
    var i = 0
    while (i < n) {
      if (arr.isNullAt(i)) return null
      md.reset()
      val h = md.digest(arr.getUTF8String(i).getBytes)
      val v = ((h(0) & 0xff) << 8) | (h(1) & 0xff)
      var b = 0
      while (b < 16) { ones(b) += (v >> b) & 1; b += 1 }
      i += 1
    }
    var r = 0L
    var b = 0
    while (b < 16) { if (2L * ones(b) > n) r |= 1L << b; b += 1 }
    java.lang.Long.valueOf(r)
  }
}

/** Rolling polynomial fingerprint of a token array in one fused pass:
  * fp = fold((acc·31 + h(token)) mod 1e9+7, init 7), h = first 4 md5 hex
  * chars — bit-exact with q_text_fingerprint's interpreted
  * transform+aggregate formulation (and its DuckDB list_reduce oracle).
  */
case class RollingFp(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  import org.apache.spark.sql.types.{LongType, StringType}

  override def nullIntolerant: Boolean = true
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_rollfp"
  override def nullable: Boolean = true // null ELEMENTS yield null

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t => org.apache.spark.sql.catalyst.analysis.TypeCheckResult
        .TypeCheckFailure(s"child must be array<string>, got $t")
    }

  override def nullSafeEval(a: Any): Any =
    RollingFp.compute(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val r = ctx.freshName("fp")
      s"""
        java.lang.Long $r = graft.functions.RollingFp.compute($a);
        if ($r == null) { ${ev.isNull} = true; }
        else { ${ev.value} = $r.longValue(); }
      """
    })

  override protected def withNewChildInternal(newChild: Expression): RollingFp =
    copy(child = newChild)
}

object RollingFp {
  def compute(arr: ArrayData): java.lang.Long = {
    val n = arr.numElements()
    val md = Md5.get()
    var acc = 7L
    var i = 0
    while (i < n) {
      if (arr.isNullAt(i)) return null
      md.reset()
      val h = md.digest(arr.getUTF8String(i).getBytes)
      val v = ((h(0) & 0xff) << 8) | (h(1) & 0xff)
      acc = (acc * 31 + v) % 1000000007L // acc·31+v < 2^35: no overflow
      i += 1
    }
    java.lang.Long.valueOf(acc)
  }
}

/** MinHash LSH band keys of a token array in ONE fused pass: 3-token
  * shingles (one per starting position, end-clamped — exactly
  * `transform(sequence(1, greatest(n-2,1)), i => concat_ws(" ",
  * slice(toks, i, 3)))`), one md5 hex digest per shingle, 4 hash functions
  * as the digest's 4 disjoint 8-hex-char slices, minima taken
  * lexicographically (binary compare over lowercase hex — identical in
  * Spark, Java and DuckDB), banded 2×2 → `[min0‖min1, min2‖min3]`.
  * Bit-exact with q_dedup_minhash's interpreted shingle→md5→4×array_min
  * formulation on every null-free array, so its DuckDB oracle is unchanged
  * (split() never yields null elements). On a NULL ELEMENT the kernel
  * null-poisons the whole result — deliberately stricter than the
  * interpreted form, whose `concat_ws` silently DROPS null tokens from the
  * shingle and emits real band keys for corrupt input. The interpreted
  * form allocates the shingle array, the digest array and 4 sliced copies
  * per doc; this kernel allocates none of them.
  */
case class MinHashBands(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  import org.apache.spark.sql.types.StringType

  override def nullIntolerant: Boolean = true
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_minhash_bands"
  override def nullable: Boolean = true // null ELEMENTS yield null

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t => org.apache.spark.sql.catalyst.analysis.TypeCheckResult
        .TypeCheckFailure(s"child must be array<string>, got $t")
    }

  override def nullSafeEval(a: Any): Any =
    MinHashBands.compute(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val r = ctx.freshName("mhb")
      s"""
        org.apache.spark.sql.catalyst.util.ArrayData $r =
          graft.functions.MinHashBands.compute($a);
        if ($r == null) { ${ev.isNull} = true; }
        else { ${ev.value} = $r; }
      """
    })

  override protected def withNewChildInternal(newChild: Expression): MinHashBands =
    copy(child = newChild)
}

object MinHashBands {

  private val HexChars = "0123456789abcdef".toCharArray

  private val Space = Array[Byte](' ')

  def compute(arr: ArrayData): ArrayData = {
    val n = arr.numElements()
    val m = math.max(n - 2, 1) // shingle count, 1-based starts 1..m
    val md = Md5.get()
    val mins = new Array[String](4)
    val hex = new Array[Char](32)
    var i = 0
    while (i < m) {
      md.reset()
      val end = math.min(i + 2, n - 1) // slice(toks, i+1, 3), end-clamped
      var j = i
      while (j <= end) {
        if (arr.isNullAt(j)) return null
        if (j > i) md.update(Space)
        // digest the RAW UTF8String bytes — a round-trip through
        // java.lang.String would substitute U+FFFD for invalid UTF-8 (legal
        // in Spark's unvalidated UTF8String) and diverge from the
        // interpreted md5(concat_ws(...)) form and the DuckDB oracle
        md.update(arr.getUTF8String(j).getBytes)
        j += 1
      }
      val d = md.digest()
      var b = 0
      while (b < 16) {
        hex(2 * b) = HexChars((d(b) >> 4) & 0xf)
        hex(2 * b + 1) = HexChars(d(b) & 0xf)
        b += 1
      }
      val h = new String(hex)
      var k = 0
      while (k < 4) {
        val s = h.substring(k * 8, k * 8 + 8)
        if (mins(k) == null || s.compareTo(mins(k)) < 0) mins(k) = s
        k += 1
      }
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(Array[Any](
      org.apache.spark.unsafe.types.UTF8String.fromString(mins(0) + mins(1)),
      org.apache.spark.unsafe.types.UTF8String.fromString(mins(2) + mins(3))))
  }
}

/** Intersection COUNT of two SORTED, duplicate-free int arrays in one fused
  * merge walk — the exact-verify kernel of the PPJoin family
  * (q_dedup_setjoin): `size(array_intersect(a, b))` builds a hash set and an
  * intermediate array per pair just to take its length; on sorted token-rank
  * arrays the same number is a two-pointer walk with zero allocation
  * (measured on the 3.3M-pair verify stage). Inputs MUST be sorted
  * ascending and distinct (the `sort_array(collect_list(rk))` contract —
  * per-doc token sets are distinct by construction); null elements yield
  * null like the other kernels.
  */
case class SortedIntersectCount(left: Expression, right: Expression)
    extends BinaryExpression {

  import org.apache.spark.sql.types.{IntegerType, LongType}

  override def nullIntolerant: Boolean = true
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_sorted_intersect_count"
  override def nullable: Boolean = true // null ELEMENTS yield null

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(IntegerType, _), ArrayType(IntegerType, _)) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case (l, r) => org.apache.spark.sql.catalyst.analysis.TypeCheckResult
        .TypeCheckFailure(s"both children must be array<int>, got $l, $r")
    }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val nx = x.numElements()
    val ny = y.numElements()
    var i = 0
    var j = 0
    var c = 0L
    while (i < nx && j < ny) {
      if (x.isNullAt(i) || y.isNullAt(j)) return null
      val xv = x.getInt(i)
      val yv = y.getInt(j)
      if (xv == yv) { c += 1L; i += 1; j += 1 }
      else if (xv < yv) i += 1
      else j += 1
    }
    c
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val c = ctx.freshName("c")
      val nx = ctx.freshName("nx")
      val ny = ctx.freshName("ny")
      val xv = ctx.freshName("xv")
      val yv = ctx.freshName("yv")
      s"""
        int $nx = $a.numElements();
        int $ny = $b.numElements();
        int $i = 0; int $j = 0; long $c = 0L;
        while (!${ev.isNull} && $i < $nx && $j < $ny) {
          if ($a.isNullAt($i) || $b.isNullAt($j)) { ${ev.isNull} = true; break; }
          int $xv = $a.getInt($i);
          int $yv = $b.getInt($j);
          if ($xv == $yv) { $c++; $i++; $j++; }
          else if ($xv < $yv) { $i++; } else { $j++; }
        }
        if (!${ev.isNull}) { ${ev.value} = $c; }
      """
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SortedIntersectCount =
    copy(left = newLeft, right = newRight)
}

/** Longest-common-subsequence LENGTH of two string arrays in the classic
  * one-row DP — the ROUGE-L kernel (q_eval_rouge): the pure-HOF nested fold
  * allocates a fresh row array per DP CELL (O(n·m²) allocations — measured
  * 32 s at sf0.1), where this evaluates the identical recurrence over one
  * reused int row (0.6 s). Bit-identical to the fold (same max/equality
  * semantics, parity pinned in VectorExpressionsSpec); null elements yield
  * null like the other kernels.
  */
case class LcsLength(left: Expression, right: Expression)
    extends BinaryExpression {

  import org.apache.spark.sql.types.{LongType, StringType}

  override def nullIntolerant: Boolean = true
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_lcs_length"
  override def nullable: Boolean = true // null ELEMENTS yield null

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(StringType, _), ArrayType(StringType, _)) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case (l, r) => org.apache.spark.sql.catalyst.analysis.TypeCheckResult
        .TypeCheckFailure(s"both children must be array<string>, got $l, $r")
    }

  override def nullSafeEval(a: Any, b: Any): Any =
    LcsLength.compute(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val r = ctx.freshName("lcs")
      s"""
        Long $r = graft.functions.LcsLength.compute($a, $b);
        if ($r == null) { ${ev.isNull} = true; }
        else { ${ev.value} = $r.longValue(); }
      """
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): LcsLength =
    copy(left = newLeft, right = newRight)
}

object LcsLength {
  /** Boxed Long so codegen can signal null-element inputs with null. */
  def compute(a: ArrayData, b: ArrayData): java.lang.Long = {
    val m = a.numElements()
    val n = b.numElements()
    var j = 0
    val ra = new Array[org.apache.spark.unsafe.types.UTF8String](m)
    while (j < m) {
      if (a.isNullAt(j)) return null
      ra(j) = a.getUTF8String(j)
      j += 1
    }
    val dp = new Array[Int](m + 1)
    var i = 0
    while (i < n) {
      if (b.isNullAt(i)) return null
      val c = b.getUTF8String(i)
      var prevDiag = 0
      j = 1
      while (j <= m) {
        val tmp = dp(j)
        if (ra(j - 1).equals(c)) dp(j) = prevDiag + 1
        else if (dp(j - 1) > dp(j)) dp(j) = dp(j - 1)
        prevDiag = tmp
        j += 1
      }
      i += 1
    }
    java.lang.Long.valueOf(dp(m).toLong)
  }
}

/** Clipped n-gram match counts for BLEU (Papineni et al. 2002), n = 1..4 in
  * ONE pass: for each order n, counts Σ_g min(count_cand(g), count_ref(g))
  * over the candidate's n-grams, where g joins n consecutive tokens with a
  * single space — byte-identical to `concat_ws(' ', slice(toks, i, n))`, so
  * the result equals the explode → groupBy(doc, n, gram) → least(ccand,
  * cref) plan the pure-DataFrame form runs (parity pinned in
  * VectorExpressionsSpec). Returns array<long>[4] = [m1, m2, m3, m4].
  *
  * The DataFrame form shuffles every n-gram of every doc twice (two
  * gram-count aggs) and joins them back — measured 5.8 s at sf0.1 where this
  * per-row hash-count runs the whole corpus map-only (clipping is per-doc
  * state, so it IS per-row work). Null elements yield null.
  */
case class NgramClippedMatches(left: Expression, right: Expression)
    extends BinaryExpression {

  import org.apache.spark.sql.types.{LongType, StringType}

  override def nullIntolerant: Boolean = true
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_ngram_clipped_matches"
  override def nullable: Boolean = true // null ELEMENTS yield null

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(StringType, _), ArrayType(StringType, _)) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case (l, r) => org.apache.spark.sql.catalyst.analysis.TypeCheckResult
        .TypeCheckFailure(s"both children must be array<string>, got $l, $r")
    }

  override def nullSafeEval(a: Any, b: Any): Any =
    NgramClippedMatches.compute(
      a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val r = ctx.freshName("clipped")
      s"""
        org.apache.spark.sql.catalyst.util.ArrayData $r =
          graft.functions.NgramClippedMatches.compute($a, $b);
        if ($r == null) { ${ev.isNull} = true; }
        else { ${ev.value} = $r; }
      """
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): NgramClippedMatches =
    copy(left = newLeft, right = newRight)
}

object NgramClippedMatches {

  import org.apache.spark.unsafe.types.UTF8String

  private val SPACE = UTF8String.fromString(" ")

  /** Joined n-gram starting at token i — the concat_ws(' ', slice) twin. */
  private def gram(
      toks: Array[UTF8String], i: Int, n: Int): UTF8String =
    if (n == 1) toks(i)
    else UTF8String.concatWs(SPACE, java.util.Arrays.copyOfRange(toks, i, i + n): _*)

  /** Null (boxed) on null-element input so codegen can branch. */
  def compute(ref: ArrayData, cand: ArrayData)
      : org.apache.spark.sql.catalyst.util.GenericArrayData = {
    val nr = ref.numElements()
    val nc = cand.numElements()
    val rt = new Array[UTF8String](nr)
    var i = 0
    while (i < nr) {
      if (ref.isNullAt(i)) return null
      rt(i) = ref.getUTF8String(i)
      i += 1
    }
    val ct = new Array[UTF8String](nc)
    i = 0
    while (i < nc) {
      if (cand.isNullAt(i)) return null
      ct(i) = cand.getUTF8String(i)
      i += 1
    }
    val out = new Array[Long](4)
    var n = 1
    while (n <= 4) {
      val counts = new java.util.HashMap[UTF8String, Integer]()
      i = 0
      while (i + n <= nr) {
        val g = gram(rt, i, n)
        val c = counts.get(g)
        counts.put(g, if (c == null) 1 else c + 1)
        i += 1
      }
      var m = 0L
      i = 0
      while (i + n <= nc) {
        val g = gram(ct, i, n)
        val c = counts.get(g)
        if (c != null && c > 0) { m += 1L; counts.put(g, c - 1) }
        i += 1
      }
      out(n - 1) = m
      n += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }
}

/** 64-bit average-hash (aHash) of the first 256 characters viewed as a
  * 16×16 grid of 8×8 2×2-blocks — the q_multimodal_phash signature in one
  * pass: bit (16k + m) = 1 iff block (16k + m)'s char-code sum × 64 beats
  * the grid total (exact cross-multiplied ints, no division). Byte-for-bit
  * identical to the HOF form (64 block sums via 256 interpreted
  * ascii(substring(...)) calls + four 16-step band folds — measured the
  * whole query at 4.2 s at sf0.1; parity pinned in VectorExpressionsSpec).
  * Bands recover as (h >> 16k) & 0xFFFF. Null input → null (unary,
  * null-intolerant).
  */
case class AHash64(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  import org.apache.spark.sql.types.{LongType, StringType}

  override def nullIntolerant: Boolean = true
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_ahash64"

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t => org.apache.spark.sql.catalyst.analysis.TypeCheckResult
        .TypeCheckFailure(s"child must be string, got $t")
    }

  override def nullSafeEval(a: Any): Any =
    AHash64.compute(a.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a => s"graft.functions.AHash64.compute($a)")

  override protected def withNewChildInternal(nc: Expression): AHash64 =
    copy(child = nc)
}

object AHash64 {
  /** Char-code grid semantics (ascii(substring(text, p, 1)) twin), so the
    * kernel agrees with the HOF on any string Spark's `ascii` handles.
    */
  def compute(s: org.apache.spark.unsafe.types.UTF8String): Long = {
    // code-point array: substring() slices and ascii() reads CODE POINTS,
    // so the kernel must index the same units (not UTF-16 chars)
    val cps = s.toString.codePoints().toArray
    val n = cps.length
    val bs = new Array[Long](64)
    var ts = 0L
    var b = 0
    while (b < 64) {
      val row = 2 * (b / 8)
      val colBase = 2 * (b % 8)
      var sum = 0L
      var dr = 0
      while (dr < 2) {
        var dc = 0
        while (dc < 2) {
          val p = (row + dr) * 16 + colBase + dc // 0-based code-point index
          if (p < n) sum += cps(p).toLong
          dc += 1
        }
        dr += 1
      }
      bs(b) = sum
      ts += sum
      b += 1
    }
    var h = 0L
    b = 0
    while (b < 64) {
      if (bs(b) * 64 > ts) h |= (1L << b)
      b += 1
    }
    h
  }
}

object VectorExpressions {

  import org.apache.spark.sql.GraftColumnShim

  /** Column wrappers (no registry needed — direct expression construction). */
  def vectorDot(a: Column, b: Column): Column =
    GraftColumnShim.column(VectorDot(expr(a), expr(b)))
  def vectorNorm(a: Column): Column =
    GraftColumnShim.column(VectorNorm(expr(a)))
  def simhash16(tokens: Column): Column =
    GraftColumnShim.column(SimHash16(expr(tokens)))
  def rollfp(tokens: Column): Column =
    GraftColumnShim.column(RollingFp(expr(tokens)))
  def minhashBands(tokens: Column): Column =
    GraftColumnShim.column(MinHashBands(expr(tokens)))
  def sortedIntersectCount(a: Column, b: Column): Column =
    GraftColumnShim.column(SortedIntersectCount(expr(a), expr(b)))
  def lcsLength(a: Column, b: Column): Column =
    GraftColumnShim.column(LcsLength(expr(a), expr(b)))
  def ngramClippedMatches(ref: Column, cand: Column): Column =
    GraftColumnShim.column(NgramClippedMatches(expr(ref), expr(cand)))
  def ahash64(text: Column): Column =
    GraftColumnShim.column(AHash64(expr(text)))

  private def expr(c: Column): Expression = GraftColumnShim.expression(c)

  /** SQL registration on an arbitrary session (idempotent) — makes
    * `graft_vector_dot`/`graft_vector_norm` usable from spark.sql text on
    * sessions we did not build (the driver's).
    */
  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.registerFunction(
      FunctionIdentifier("graft_vector_dot"),
      new ExpressionInfo(classOf[VectorDot].getName, "graft_vector_dot"),
      (children: Seq[Expression]) => VectorDot(children.head, children(1)))
    reg.registerFunction(
      FunctionIdentifier("graft_vector_norm"),
      new ExpressionInfo(classOf[VectorNorm].getName, "graft_vector_norm"),
      (children: Seq[Expression]) => VectorNorm(children.head))
    reg.registerFunction(
      FunctionIdentifier("graft_simhash16"),
      new ExpressionInfo(classOf[SimHash16].getName, "graft_simhash16"),
      (children: Seq[Expression]) => SimHash16(children.head))
    reg.registerFunction(
      FunctionIdentifier("graft_rollfp"),
      new ExpressionInfo(classOf[RollingFp].getName, "graft_rollfp"),
      (children: Seq[Expression]) => RollingFp(children.head))
    reg.registerFunction(
      FunctionIdentifier("graft_minhash_bands"),
      new ExpressionInfo(classOf[MinHashBands].getName, "graft_minhash_bands"),
      (children: Seq[Expression]) => MinHashBands(children.head))
    reg.registerFunction(
      FunctionIdentifier("graft_sorted_intersect_count"),
      new ExpressionInfo(classOf[SortedIntersectCount].getName,
        "graft_sorted_intersect_count"),
      (children: Seq[Expression]) =>
        SortedIntersectCount(children.head, children(1)))
    reg.registerFunction(
      FunctionIdentifier("graft_lcs_length"),
      new ExpressionInfo(classOf[LcsLength].getName, "graft_lcs_length"),
      (children: Seq[Expression]) => LcsLength(children.head, children(1)))
    reg.registerFunction(
      FunctionIdentifier("graft_ngram_clipped_matches"),
      new ExpressionInfo(classOf[NgramClippedMatches].getName,
        "graft_ngram_clipped_matches"),
      (children: Seq[Expression]) =>
        NgramClippedMatches(children.head, children(1)))
    reg.registerFunction(
      FunctionIdentifier("graft_ahash64"),
      new ExpressionInfo(classOf[AHash64].getName, "graft_ahash64"),
      (children: Seq[Expression]) => AHash64(children.head))
  }
}

/** `spark.sql.extensions=graft.functions.GraftExtensions` installs the vector
  * kernels at session build time — the standard extension hook for sessions
  * configured declaratively.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("graft_vector_dot"),
      new ExpressionInfo(classOf[VectorDot].getName, "graft_vector_dot"),
      (children: Seq[Expression]) => VectorDot(children.head, children(1))))
    ext.injectFunction((
      FunctionIdentifier("graft_vector_norm"),
      new ExpressionInfo(classOf[VectorNorm].getName, "graft_vector_norm"),
      (children: Seq[Expression]) => VectorNorm(children.head)))
    ext.injectFunction((
      FunctionIdentifier("graft_simhash16"),
      new ExpressionInfo(classOf[SimHash16].getName, "graft_simhash16"),
      (children: Seq[Expression]) => SimHash16(children.head)))
    ext.injectFunction((
      FunctionIdentifier("graft_rollfp"),
      new ExpressionInfo(classOf[RollingFp].getName, "graft_rollfp"),
      (children: Seq[Expression]) => RollingFp(children.head)))
    ext.injectFunction((
      FunctionIdentifier("graft_minhash_bands"),
      new ExpressionInfo(classOf[MinHashBands].getName, "graft_minhash_bands"),
      (children: Seq[Expression]) => MinHashBands(children.head)))
    ext.injectFunction((
      FunctionIdentifier("graft_sorted_intersect_count"),
      new ExpressionInfo(classOf[SortedIntersectCount].getName,
        "graft_sorted_intersect_count"),
      (children: Seq[Expression]) =>
        SortedIntersectCount(children.head, children(1))))
    ext.injectFunction((
      FunctionIdentifier("graft_lcs_length"),
      new ExpressionInfo(classOf[LcsLength].getName, "graft_lcs_length"),
      (children: Seq[Expression]) => LcsLength(children.head, children(1))))
    ext.injectFunction((
      FunctionIdentifier("graft_ngram_clipped_matches"),
      new ExpressionInfo(classOf[NgramClippedMatches].getName,
        "graft_ngram_clipped_matches"),
      (children: Seq[Expression]) =>
        NgramClippedMatches(children.head, children(1))))
    ext.injectFunction((
      FunctionIdentifier("graft_ahash64"),
      new ExpressionInfo(classOf[AHash64].getName, "graft_ahash64"),
      (children: Seq[Expression]) => AHash64(children.head)))
  }
}
