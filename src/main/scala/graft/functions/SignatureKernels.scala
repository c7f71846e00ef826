package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression, XXH64, XxHash64Function}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native codegen kernels for the remaining signature hot loops (see
  * MinHashSignatureExpr for the rationale: higher-order functions run
  * interpreted per-lambda, these loop nests run fused inside whole-stage
  * codegen with identical results).
  */

/** Random-hyperplane sign signature over an array<double> vector: bit j =
  * sign(<v, h_j>) with the ±1 planes precomputed on the driver. Output
  * array<int> of 0/1, matching Similarity.hyperplaneSignatureHof. */
case class HyperplaneSignatureExpr(child: Expression, bits: Int, dim: Int)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"hyperplane_signature requires array<double>, got ${other.catalogString}")
  }
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "hyperplane_signature"

  // flattened [bits × dim] ±1 plane matrix
  private lazy val planes: Array[Double] =
    Array.tabulate(bits * dim)(k => SignatureKernels.planeSign(k / dim, k % dim))

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = math.min(arr.numElements(), dim)
    val out = new Array[Int](bits)
    var j = 0
    while (j < bits) {
      var proj = 0.0
      var i = 0
      while (i < n) { proj += arr.getDouble(i) * planes(j * dim + i); i += 1 }
      out(j) = if (proj >= 0) 1 else 0
      j += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val pRef = ctx.addReferenceObj("planes", planes, "double[]")
    nullSafeCodeGen(ctx, ev, arr => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val proj = ctx.freshName("proj")
      val out = ctx.freshName("out")
      s"""
         |int $n = java.lang.Math.min($arr.numElements(), $dim);
         |int[] $out = new int[$bits];
         |for (int $j = 0; $j < $bits; $j++) {
         |  double $proj = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $proj += $arr.getDouble($i) * $pRef[$j * $dim + $i];
         |  }
         |  $out[$j] = ($proj >= 0) ? 1 : 0;
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): HyperplaneSignatureExpr =
    copy(child = newChild)
}

/** 64-bit SimHash over an array<long> of token hashes: bit b set iff at
  * least half the hashes have bit b set. Single pass over the hashes with a
  * 64-counter accumulator; identical to Dedup.simhashOfHashes. */
case class SimHashExpr(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"simhash requires array<bigint>, got ${other.catalogString}")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash"

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val counts = new Array[Int](64)
    var i = 0
    while (i < n) {
      val h = arr.getLong(i)
      var b = 0
      while (b < 64) { counts(b) += ((h >>> b) & 1L).toInt; b += 1 }
      i += 1
    }
    var sig = 0L
    var b = 0
    while (b < 64) { if (2 * counts(b) >= n) sig |= 1L << b; b += 1 }
    sig
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, arr => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val b = ctx.freshName("b")
      val h = ctx.freshName("h")
      val counts = ctx.freshName("counts")
      val sig = ctx.freshName("sig")
      s"""
         |int $n = $arr.numElements();
         |int[] $counts = new int[64];
         |for (int $i = 0; $i < $n; $i++) {
         |  long $h = $arr.getLong($i);
         |  for (int $b = 0; $b < 64; $b++) {
         |    $counts[$b] += (int) (($h >>> $b) & 1L);
         |  }
         |}
         |long $sig = 0L;
         |for (int $b = 0; $b < 64; $b++) {
         |  if (2 * $counts[$b] >= $n) $sig |= 1L << $b;
         |}
         |${ev.value} = $sig;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): SimHashExpr =
    copy(child = newChild)
}

/** Fused dot product of two array<double> columns — the verify-stage hot
  * loop of every similarity operator. Left-to-right accumulation, matching
  * the HOF `aggregate(zip_with(...))` formulation bit-for-bit. Null if
  * either side is null; iterates min(len) like zip semantics on equal-dim
  * vectors. */
case class DotProductExpr(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _), ArrayType(DoubleType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"dot requires two array<double>, got ${l.catalogString}, ${r.catalogString}")
    }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "dot_product"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) { acc += x.getDouble(i) * y.getDouble(i); i += 1 }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += $a.getDouble($i) * $b.getDouble($i);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProductExpr =
    copy(left = newLeft, right = newRight)
}

/** Fused word-shingle hashing: from the token array (and the normalized
  * full text, the < n-token fallback shingle) straight to the distinct
  * `pmod(xxhash64(shingle), 2^31-1)` base-hash array that MinHash consumes —
  * value-identical to the HOF pipeline
  * `shingleHashes(shingles(text, n))` (asserted in tests; ordering/dedup
  * differences are irrelevant to the downstream min-reduction).
  *
  * Why: the HOF pipeline evaluates ~(tokens × 3) interpreted lambdas per
  * row (slice + concat_ws + hash per shingle), the dominant per-row cost of
  * minhashPairs AND the main victim of session-wide megamorphic-call-site
  * pollution (its in-bench cost grew 5× once 30+ other plans had run). This
  * kernel does one monomorphic native loop per row. Hashes match Spark's
  * `xxhash64` (seed 42) exactly via XxHash64Function. */
case class ShingleHashesExpr(tokens: Expression, normText: Expression, n: Int)
    extends BinaryExpression {

  override def left: Expression = tokens
  override def right: Expression = normText

  override def checkInputDataTypes(): TypeCheckResult =
    (tokens.dataType, normText.dataType) match {
      case (ArrayType(StringType, _), StringType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"shingle_hashes requires (array<string>, string), got ${l.catalogString}, ${r.catalogString}")
    }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "shingle_hashes"

  private val P = MinHashSignatureExpr.P
  private def pmodP(h: Long): Long = { val r = h % P; if (r < 0) r + P else r }

  /** Native per-row loop shared by eval and codegen. Shingle bytes are
    * assembled into one REUSED buffer and hashed in place with the same
    * `XXH64.hashUnsafeBytes` the xxhash64 expression applies to a
    * UTF8String's bytes — identical input bytes, identical hash, zero
    * per-shingle UTF8String/concat allocations (token bytes are
    * extracted once per row, not once per shingle membership). */
  def hashRow(arr: ArrayData, full: UTF8String): ArrayData = {
    val m = arr.numElements()
    if (m < n) {
      new GenericArrayData(Array(pmodP(
        XxHash64Function.hash(full, StringType, 42L))))
    } else {
      val tokBytes = new Array[Array[Byte]](m)
      var i = 0
      while (i < m) { tokBytes(i) = arr.getUTF8String(i).getBytes; i += 1 }
      val seen = new java.util.LinkedHashSet[java.lang.Long]()
      var buf = new Array[Byte](64)
      i = 0
      while (i <= m - n) {
        var len = n - 1 // single-space joiners, same bytes as concatWs(" ")
        var j = 0
        while (j < n) { len += tokBytes(i + j).length; j += 1 }
        if (buf.length < len) buf = new Array[Byte](math.max(len, buf.length * 2))
        var p = 0
        j = 0
        while (j < n) {
          if (j > 0) { buf(p) = ' '; p += 1 }
          val tb = tokBytes(i + j)
          System.arraycopy(tb, 0, buf, p, tb.length)
          p += tb.length
          j += 1
        }
        seen.add(pmodP(XXH64.hashUnsafeBytes(
          buf, org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET, len, 42L)))
        i += 1
      }
      val out = new Array[Long](seen.size())
      val it = seen.iterator()
      var k = 0
      while (it.hasNext) { out(k) = it.next(); k += 1 }
      new GenericArrayData(out)
    }
  }

  override def nullSafeEval(a: Any, b: Any): Any =
    hashRow(a.asInstanceOf[ArrayData], b.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // Call back into this instance's native loop from generated code — the
    // loop is one monomorphic JIT-compiled method, and the surrounding
    // whole-stage-codegen span stays intact.
    val self = ctx.addReferenceObj("shingleHasher", this,
      classOf[ShingleHashesExpr].getName)
    nullSafeCodeGen(ctx, ev, (arr, full) =>
      s"${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData) $self.hashRow($arr, $full);")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ShingleHashesExpr =
    copy(tokens = newLeft, normText = newRight)
}

/** Dot products of a vector against a fixed centroid matrix, fused into a
  * single codegen pass: output(j) = <v, centroid_j>. The IVF coarse
  * quantizer's hot loop — the HOF formulation (`transform(centroidLit,
  * c => aggregate(zip_with(...)))`) runs k interpreted lambda passes per
  * row; this runs the k×dim loop nest in generated Java. Centroids are
  * captured at construction (driver side) and shipped as one flattened
  * reference array. */
case class CentroidDotsExpr(child: Expression, centroids: Seq[Seq[Double]])
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"centroid_dots requires array<double>, got ${other.catalogString}")
  }
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "centroid_dots"

  private lazy val k = centroids.length
  private lazy val dim = if (centroids.isEmpty) 0 else centroids.head.length
  // flattened [k × dim] centroid matrix
  private lazy val flat: Array[Double] = {
    val out = new Array[Double](k * dim)
    var j = 0
    while (j < k) {
      val c = centroids(j)
      var i = 0
      while (i < dim) { out(j * dim + i) = c(i); i += 1 }
      j += 1
    }
    out
  }

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = math.min(arr.numElements(), dim)
    val out = new Array[Double](k)
    var j = 0
    while (j < k) {
      var acc = 0.0
      var i = 0
      while (i < n) { acc += arr.getDouble(i) * flat(j * dim + i); i += 1 }
      out(j) = acc
      j += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cRef = ctx.addReferenceObj("centroidsFlat", flat, "double[]")
    nullSafeCodeGen(ctx, ev, arr => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val acc = ctx.freshName("acc")
      val out = ctx.freshName("out")
      s"""
         |int $n = java.lang.Math.min($arr.numElements(), $dim);
         |double[] $out = new double[$k];
         |for (int $j = 0; $j < $k; $j++) {
         |  double $acc = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $acc += $arr.getDouble($i) * $cRef[$j * $dim + $i];
         |  }
         |  $out[$j] = $acc;
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): CentroidDotsExpr =
    copy(child = newChild)
}

/** Count of common elements between two SORTED array<long> columns — a
  * zero-allocation merge loop. The Jaccard verify stage's hot op: per
  * candidate pair, `size(array_intersect(a, b))` builds a hash set and an
  * output array per row; over a quadratic pair count that's the dominant
  * allocation cost. Inputs must be sorted ascending and distinct
  * (array_sort ∘ array_distinct), which is computed once per DOCUMENT, not
  * per pair. */
case class SortedIntersectCountExpr(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"sorted_intersect_count requires two array<bigint>, got ${l.catalogString}, ${r.catalogString}")
    }
  override def dataType: DataType = IntegerType
  override def prettyName: String = "sorted_intersect_count"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements(); val m = y.numElements()
    var i = 0; var j = 0; var c = 0
    while (i < n && j < m) {
      val xv = x.getLong(i); val yv = y.getLong(j)
      if (xv == yv) { c += 1; i += 1; j += 1 }
      else if (xv < yv) i += 1
      else j += 1
    }
    c
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n"); val m = ctx.freshName("m")
      val i = ctx.freshName("i"); val j = ctx.freshName("j")
      val c = ctx.freshName("c")
      val xv = ctx.freshName("xv"); val yv = ctx.freshName("yv")
      s"""
         |int $n = $a.numElements(); int $m = $b.numElements();
         |int $i = 0; int $j = 0; int $c = 0;
         |while ($i < $n && $j < $m) {
         |  long $xv = $a.getLong($i); long $yv = $b.getLong($j);
         |  if ($xv == $yv) { $c++; $i++; $j++; }
         |  else if ($xv < $yv) { $i++; } else { $j++; }
         |}
         |${ev.value} = $c;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SortedIntersectCountExpr =
    copy(left = newLeft, right = newRight)
}

/** Word n-gram strings from a token array: space-joined windows advancing
  * by `stride` (1 = sliding grams; `stride = n` = non-overlapping chunks,
  * keeping a final partial chunk), in order (`distinct=false`) or
  * first-seen-deduped (`distinct=true`); empty array when the document
  * has fewer than `n` tokens (stride 1) / no tokens (chunking).
  * Value-identical to the HOF formulation
  * `transform(sequence(0, size(tk)-n), i => concat_ws(" ", slice(tk, i+1, n)))`
  * at stride 1 (asserted in tests). Same rationale as ShingleHashesExpr:
  * the HOF form pays ~(tokens × 3) interpreted lambda evaluations per
  * row — the dominant cost of decontamination and repetition scoring —
  * where this is one monomorphic native loop inside the codegen span. */
case class WordNgramsExpr(child: Expression, n: Int, distinct: Boolean,
                          stride: Int = 1)
    extends UnaryExpression {
  require(n > 0, "n must be positive")
  require(stride > 0, "stride must be positive")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"word_ngrams requires array<string>, got ${other.catalogString}")
  }
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "word_ngrams"

  /** Native per-row loop shared by eval and codegen. */
  def gramsRow(arr: ArrayData): ArrayData = {
    val m = arr.numElements()
    // stride 1 = sliding grams (need a full window); stride > 1 =
    // chunking (a final partial window is a legal chunk)
    if (m == 0 || (stride == 1 && m < n)) return new GenericArrayData(Array.empty[Any])
    val space = UTF8String.fromString(" ")
    val out = new java.util.ArrayList[UTF8String](m / stride + 1)
    val seen = if (distinct) new java.util.HashSet[UTF8String]() else null
    var i = 0
    while (i < m && (stride > 1 || i <= m - n)) {
      val w = math.min(n, m - i)
      val buf = new Array[UTF8String](w)
      var j = 0
      while (j < w) { buf(j) = arr.getUTF8String(i + j); j += 1 }
      val s = UTF8String.concatWs(space, buf: _*)
      if (seen == null || seen.add(s)) out.add(s)
      i += stride
    }
    new GenericArrayData(out.toArray)
  }

  override def nullSafeEval(input: Any): Any =
    gramsRow(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("wordNgrams", this,
      classOf[WordNgramsExpr].getName)
    nullSafeCodeGen(ctx, ev, arr =>
      s"${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData) $self.gramsRow($arr);")
  }

  override protected def withNewChildInternal(newChild: Expression): WordNgramsExpr =
    copy(child = newChild)
}

object SignatureKernels {
  /** Deterministic ±1 hyperplane components (splitmix64-style mix) shared
    * by the native kernel and the HOF cross-check formulation. */
  def planeSign(j: Int, i: Int): Double = {
    var z = j.toLong * 0x9E3779B97F4A7C15L + i.toLong * 0xBF58476D1CE4E5B9L + 0x94D049BB133111EBL
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^= z >>> 31
    if ((z & 1L) == 0L) 1.0 else -1.0
  }
}

/** Shannon entropy over a string's characters (bits/char): sort the char
  * array, count equal runs, accumulate -p·log2(p) in ASCENDING char order
  * — a fixed summation order any re-implementation (and the DuckDB
  * oracle, modulo last-ulp libm differences the caller rounds away) can
  * reproduce. Map-only and codegen'd; the per-row cost is the sort
  * (O(len log len)), which beats the explode → groupBy(doc, char) →
  * re-join shape by two shuffles at any scale. Empty string → 0.0. */
case class CharEntropyExpr(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"char_entropy requires string, got ${other.catalogString}")
  }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "char_entropy"

  override def nullSafeEval(input: Any): Any = {
    val cs = input.asInstanceOf[UTF8String].toString.toCharArray
    java.util.Arrays.sort(cs)
    val n = cs.length
    if (n == 0) 0.0
    else {
      var ent = 0.0
      var i = 0
      while (i < n) {
        var j = i
        while (j < n && cs(j) == cs(i)) j += 1
        val p = (j - i).toDouble / n
        ent -= p * (Math.log(p) / Math.log(2.0))
        i = j
      }
      ent
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, str => {
      val cs = ctx.freshName("cs")
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val p = ctx.freshName("p")
      val ent = ctx.freshName("ent")
      s"""
         |char[] $cs = $str.toString().toCharArray();
         |java.util.Arrays.sort($cs);
         |int $n = $cs.length;
         |double $ent = 0.0;
         |int $i = 0;
         |while ($i < $n) {
         |  int $j = $i;
         |  while ($j < $n && $cs[$j] == $cs[$i]) $j++;
         |  double $p = (double) ($j - $i) / $n;
         |  $ent -= $p * (Math.log($p) / Math.log(2.0));
         |  $i = $j;
         |}
         |${ev.value} = $ent;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): CharEntropyExpr =
    copy(child = newChild)
}

/** Unordered-pair expansion kernel for collocation mining: a SORTED
  * DISTINCT token array expands to every (a, b) pair with a before b —
  * array<struct<a, b>> in one native O(d²) loop. The HOF formulation
  * (`flatten(transform(ts, a => transform(filter(ts, b => b > a), …)))`,
  * kept as the cross-check) walks the array d times through interpreted
  * lambdas and allocates a nested array per element; this runs fused
  * inside the scan's codegen stage. Positional order implies the a < b
  * invariant because the INPUT is sorted — the kernel does not re-sort. */
case class TokenPairsExpr(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"token_pairs requires array<string>, got ${other.catalogString}")
  }
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("a", StringType, nullable = false),
    StructField("b", StringType, nullable = false))), containsNull = false)
  override def prettyName: String = "token_pairs"

  /** Native per-row loop shared by eval and codegen. Null elements
    * (possible via the SQL surface) are skipped. */
  def pairsRow(arr: ArrayData): ArrayData = {
    val m = arr.numElements()
    val toks = new java.util.ArrayList[UTF8String](m)
    var i = 0
    while (i < m) {
      if (!arr.isNullAt(i)) toks.add(arr.getUTF8String(i))
      i += 1
    }
    val d = toks.size()
    if (d < 2) return new GenericArrayData(Array.empty[Any])
    // O(d²) expansion needs an explicit guard: past ~46k distinct tokens
    // the Int size arithmetic would wrap negative, and well before that a
    // single row's pair array exhausts executor memory. Fail with a
    // actionable message instead of a NegativeArraySizeException/OOM.
    if (d > 16384) throw new IllegalStateException(
      s"token_pairs: $d distinct tokens expand to ${d.toLong * (d - 1) / 2} " +
        "pairs in one row; cap or pre-filter documents (e.g. top-k tokens " +
        "per doc) before pair expansion")
    val out = new Array[Any](d * (d - 1) / 2)
    var k = 0
    i = 0
    while (i < d) {
      var j = i + 1
      while (j < d) {
        out(k) = org.apache.spark.sql.catalyst.InternalRow(toks.get(i), toks.get(j))
        k += 1
        j += 1
      }
      i += 1
    }
    new GenericArrayData(out)
  }

  override def nullSafeEval(input: Any): Any =
    pairsRow(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("tokenPairs", this,
      classOf[TokenPairsExpr].getName)
    nullSafeCodeGen(ctx, ev, arr =>
      s"${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData) $self.pairsRow($arr);")
  }

  override protected def withNewChildInternal(newChild: Expression): TokenPairsExpr =
    copy(child = newChild)
}

/** Fused document-length + per-term frequency kernel for BM25 scoring:
  * ONE pass over the token array produces [dl, tf(term0), tf(term1), …]
  * as array<int>. The HOF formulation (one `filter` lambda per query
  * term) re-walks the tokens q times INTERPRETED — per-lambda eval
  * outside whole-stage codegen; this loop runs fused inside the scan's
  * codegen stage and touches each token once, comparing against the
  * (small, literal) term list. The [""] single-empty-token artifact of
  * splitting an empty normalized string counts as dl = 0, matching
  * TextOps.tokenCount. Null ELEMENTS (possible via the user-exposed SQL
  * function, never from TextOps.tokens) count toward dl but match no
  * term — the same result the HOF cross-check's `x === term` filter
  * yields, instead of an executor NPE. */
case class TermFreqsExpr(child: Expression, terms: Seq[String])
    extends UnaryExpression {
  require(terms.nonEmpty, "terms must be non-empty")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"term_freqs requires array<string>, got ${other.catalogString}")
  }
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "term_freqs"

  @transient private lazy val termBytes: Array[UTF8String] =
    terms.map(UTF8String.fromString).toArray

  /** Native per-row loop shared by eval and codegen. */
  def freqsRow(arr: ArrayData): ArrayData = {
    val m = arr.numElements()
    val out = new Array[Int](termBytes.length + 1)
    val empty = m == 1 && !arr.isNullAt(0) && arr.getUTF8String(0).numBytes() == 0
    out(0) = if (empty) 0 else m
    if (!empty) {
      var i = 0
      while (i < m) {
        if (!arr.isNullAt(i)) {
          val tok = arr.getUTF8String(i)
          var t = 0
          while (t < termBytes.length) {
            if (termBytes(t).equals(tok)) out(t + 1) += 1
            t += 1
          }
        }
        i += 1
      }
    }
    new GenericArrayData(out)
  }

  override def nullSafeEval(input: Any): Any =
    freqsRow(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("termFreqs", this,
      classOf[TermFreqsExpr].getName)
    nullSafeCodeGen(ctx, ev, arr =>
      s"${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData) $self.freqsRow($arr);")
  }

  override protected def withNewChildInternal(newChild: Expression): TermFreqsExpr =
    copy(child = newChild)
}

/** Fused whitespace tokenizer: lower-case + split-on-whitespace-runs in
  * ONE byte scan — value-identical (asserted in tests) to the engine's
  * canonical composition `split(trim(regexp_replace(lower(c), "\\s+",
  * " ")), " ")` and to every DuckDB oracle's
  * `string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ')`,
  * including the `[""]` artifact on empty / whitespace-only / null-free
  * input. That composition runs TWO regex passes plus a lower-case
  * allocation per document and sat on the hot path of every text
  * operator (tokens feed tf/df counts, shingles, n-gram scrubs, LM
  * folds); this kernel runs one UTF8String.toLowerCase plus a single
  * byte-level scan.
  *
  * Unicode safety: Java's regex `\s` is ASCII-only
  * (`[ \t\n\x0B\f\r]`), and those six byte values never occur inside a
  * UTF-8 multibyte sequence, so scanning BYTES for separator runs can
  * neither split a multibyte character nor disagree with the regex.
  * Lower-casing first (full UTF8String.toLowerCase, same as `lower()`)
  * matches the composition's operation order; lower-casing never
  * introduces or removes whitespace. */
case class WhitespaceTokensExpr(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"ws_tokens requires string, got ${other.catalogString}")
  }
  // exactly split()'s type (array<string>, nullable elements) so plans
  // and dumped schemas are indistinguishable from the regex composition
  override def dataType: DataType = ArrayType(StringType)
  override def prettyName: String = "ws_tokens"

  private def isWs(b: Byte): Boolean =
    b == 0x20 || b == 0x09 || b == 0x0a || b == 0x0b || b == 0x0c || b == 0x0d

  /** Native per-row loop shared by eval and codegen. */
  def tokenize(s: UTF8String): ArrayData = {
    val lower = s.toLowerCase
    val bytes = lower.getBytes
    val n = bytes.length
    val out = new java.util.ArrayList[AnyRef](16)
    var i = 0
    while (i < n) {
      while (i < n && isWs(bytes(i))) i += 1
      if (i < n) {
        val start = i
        while (i < n && !isWs(bytes(i))) i += 1
        out.add(UTF8String.fromBytes(bytes, start, i - start))
      }
    }
    if (out.isEmpty) // split("", " ") == [""] — the trimmed-empty artifact
      new GenericArrayData(Array[Any](UTF8String.EMPTY_UTF8))
    else
      new GenericArrayData(out.toArray)
  }

  override def nullSafeEval(input: Any): Any =
    tokenize(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // call back into this instance's native loop from generated code —
    // one monomorphic JIT method, whole-stage-codegen span stays intact
    val self = ctx.addReferenceObj("wsTokenizer", this,
      classOf[WhitespaceTokensExpr].getName)
    nullSafeCodeGen(ctx, ev, s =>
      s"${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData) $self.tokenize($s);")
  }

  override protected def withNewChildInternal(newChild: Expression): WhitespaceTokensExpr =
    copy(child = newChild)
}

/** Count of characters drawn from a fixed ASCII class, in one byte scan
  * — value-identical to `length(regexp_replace(c, "[^<members>]", ""))`
  * for ASCII-only classes: each member is one byte AND one codepoint,
  * and UTF-8 lead/continuation bytes (>= 0x80, negative as signed
  * bytes) can never equal an ASCII byte, so the byte count IS the
  * removed-string's character count. Replaces a full regex rewrite pass
  * (which materializes the stripped string just to measure it) on the
  * quality-feature hot path. */
case class AsciiClassCountExpr(child: Expression, members: String)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"ascii_class_count requires string, got ${other.catalogString}")
  }
  override def dataType: DataType = IntegerType // matches length()
  override def prettyName: String = "ascii_class_count"
  require(members.forall(_ < 128), "ascii_class_count members must be ASCII")

  @transient private lazy val table: Array[Boolean] = {
    val t = new Array[Boolean](128)
    members.foreach(ch => t(ch) = true)
    t
  }

  /** Native per-row loop shared by eval and codegen. */
  def count(s: UTF8String): Int = {
    val bytes = s.getBytes
    var i = 0
    var n = 0
    while (i < bytes.length) {
      val b = bytes(i)
      if (b >= 0 && table(b)) n += 1
      i += 1
    }
    n
  }

  override def nullSafeEval(input: Any): Any =
    count(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("asciiClassCounter", this,
      classOf[AsciiClassCountExpr].getName)
    nullSafeCodeGen(ctx, ev, s => s"${ev.value} = $self.count($s);")
  }

  override protected def withNewChildInternal(newChild: Expression): AsciiClassCountExpr =
    copy(child = newChild)
}

/** Membership-count of array<string> elements in a fixed word set via
  * one hash probe per element — value-identical to
  * `size(filter(arr, t => t.isin(words: _*)))` (null elements never
  * match, a null array stays null), minus the interpreted
  * ArrayFilter lambda and its O(|words|) linear In-list scan per token.
  * The stopword counters (language ID runs one per candidate language,
  * the quality features one over the union list) were the last
  * interpreted per-token loops on the text path. */
case class MemberCountExpr(child: Expression, words: Seq[String])
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"member_count requires array<string>, got ${other.catalogString}")
  }
  override def dataType: DataType = IntegerType // matches size()
  override def prettyName: String = "member_count"

  @transient private lazy val set: java.util.HashSet[UTF8String] = {
    val s = new java.util.HashSet[UTF8String](words.size * 2)
    words.foreach(w => s.add(UTF8String.fromString(w)))
    s
  }

  /** Native per-row loop shared by eval and codegen. */
  def count(arr: ArrayData): Int = {
    val m = arr.numElements()
    var i = 0
    var n = 0
    while (i < m) {
      if (!arr.isNullAt(i) && set.contains(arr.getUTF8String(i))) n += 1
      i += 1
    }
    n
  }

  override def nullSafeEval(input: Any): Any =
    count(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("memberCounter", this,
      classOf[MemberCountExpr].getName)
    nullSafeCodeGen(ctx, ev, arr => s"${ev.value} = $self.count($arr);")
  }

  override protected def withNewChildInternal(newChild: Expression): MemberCountExpr =
    copy(child = newChild)
}
