package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.GraftExpectsInputTypes
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.GraftShim
import org.apache.spark.sql.types._

/** ArrayData-level adapters so generated code is a single static call.
  * (Scala objects emit static forwarders — whole-stage codegen calls
  * `graft.functions.ExprKernels.cosineAD(a, b)` directly.)
  */
object ExprKernels {

  /** Zero-copy cosine over ArrayData: element accessors instead of
    * toFloatArray() — the copies were two fresh float[] per evaluation,
    * and the ANN/dedup verify paths evaluate this millions of times per
    * stage. Accumulation order (index order, double) is unchanged, so
    * oracle agreement to the last ulp is preserved.
    */
  def cosineAD(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val x = a.getFloat(i).toDouble; val y = b.getFloat(i).toDouble
      dot += x * y; na += x * x; nb += y * y
      i += 1
    }
    if (na == 0.0 || nb == 0.0) 0.0 else dot / (math.sqrt(na) * math.sqrt(nb))
  }

  /** Zero-copy token hashing: each token is hashed straight off the
    * UTF8String's backing region ([[Kernels.hash64Region]] — bit-identical
    * to hash64 over a materialized copy), so the MinHash/SimHash kernels
    * never allocate an Array[Byte] per token. One primitive long[] of
    * token hashes per evaluation is the only allocation.
    */
  private def tokenHashes(arr: ArrayData): Array[Long] = {
    val n = arr.numElements()
    val out = new Array[Long](n)
    var i = 0
    while (i < n) {
      val s = arr.getUTF8String(i)
      out(i) =
        if (s == null) Kernels.hash64(Array.emptyByteArray)
        else Kernels.hash64Region(s.getBaseObject, s.getBaseOffset, s.numBytes())
      i += 1
    }
    out
  }

  def minhashSigAD(tokens: ArrayData, k: Int): ArrayData =
    new GenericArrayData(Kernels.minhashSigFromHashes(tokenHashes(tokens), k))

  def simhash64AD(tokens: ArrayData): Long =
    Kernels.simhash64FromHashes(tokenHashes(tokens))

  /** Zero-copy LSH bucket: sign projections read the vector through
    * ArrayData accessors (one per (bit, dim)) instead of materializing
    * a float[] per evaluation.
    */
  def lshBucketAD(vec: ArrayData, nbits: Int, seed: Long): Int = {
    val n = vec.numElements()
    var bucket = 0
    var j = 0
    while (j < nbits) {
      var s = 0.0
      var d = 0
      while (d < n) {
        val r = if ((Kernels.mix64(seed * 0x100000001b3L + (j.toLong << 32) + d) & 1L) == 1L) 1.0 else -1.0
        s += vec.getFloat(d) * r
        d += 1
      }
      if (s >= 0) bucket |= (1 << j)
      j += 1
    }
    bucket
  }

  /** Zero-copy sorted-merge intersection over ArrayData (the join
    * conditions of the dedup verify phase evaluate this up to three
    * times per candidate row — pushdown inlines the threshold into the
    * join condition — so the two toLongArray() copies per call were
    * gigabytes of garbage per million candidates).
    */
  def sortedIntersectAD(a: ArrayData, b: ArrayData): Int = {
    val an = a.numElements(); val bn = b.numElements()
    var i = 0; var j = 0; var n = 0
    while (i < an && j < bn) {
      val x = a.getLong(i); val y = b.getLong(j)
      if (x == y) { n += 1; i += 1; j += 1 }
      else if (x < y) i += 1
      else j += 1
    }
    n
  }

  /** One-pass fingerprint normalization over an (already lowercased)
    * string: every code point outside [a-z0-9 ] becomes a space, space
    * runs collapse to one, leading/trailing spaces drop — byte-for-byte
    * what `trim(regexp_replace(regexp_replace(s, "[^a-z0-9 ]", " "),
    * " +", " "))` produces (Java regex replaces per CODE POINT, so a
    * multi-byte UTF-8 sequence — lead byte + continuations — emits
    * exactly one space here too). The two regex passes allocated
    * multiple intermediate strings per document and measured 5.6-6.7
    * cpu-s alone on the sf0.1 corpus; this is one scan, one output
    * allocation.
    */
  def normalizeAlnumAD(s: org.apache.spark.unsafe.types.UTF8String): org.apache.spark.unsafe.types.UTF8String = {
    val n = s.numBytes()
    val out = new Array[Byte](n)
    var w = 0
    var pendingSpace = false
    var i = 0
    while (i < n) {
      val b = org.apache.spark.unsafe.Platform.getByte(s.getBaseObject, s.getBaseOffset + i)
      val keep = (b >= 'a' && b <= 'z') || (b >= '0' && b <= '9')
      if (keep) {
        if (pendingSpace && w > 0) { out(w) = ' '; w += 1 }
        pendingSpace = false
        out(w) = b; w += 1
      } else if ((b & 0xc0) != 0x80) {
        // any non-kept code point (incl. the space char itself) opens a
        // pending single space; continuation bytes (10xxxxxx) are part
        // of an already-spaced lead and emit nothing
        pendingSpace = true
      }
      i += 1
    }
    org.apache.spark.unsafe.types.UTF8String.fromBytes(java.util.Arrays.copyOf(out, w))
  }

  /** Count of tokens contained in a small stopword set — the one-pass,
    * zero-allocation form of `size(filter(toks, t => t.isin(stops)))`
    * (which materialized a filtered array per evaluation; the language-ID
    * scorer runs FOUR of these per row). Null tokens never match, like
    * isin's null semantics under filter. Linear probe over the ≤8-entry
    * set — cheaper than hashing at these sizes.
    */
  def stopCountAD(arr: ArrayData, stops: Array[org.apache.spark.unsafe.types.UTF8String]): Long = {
    val n = arr.numElements()
    var count = 0L
    var i = 0
    while (i < n) {
      val t = arr.getUTF8String(i)
      if (t != null) {
        var j = 0
        while (j < stops.length) {
          if (stops(j).equals(t)) { count += 1; j = stops.length }
          else j += 1
        }
      }
      i += 1
    }
    count
  }

  /** Exact distinct-token count — `size(array_distinct(toks))` without
    * materializing the deduplicated array (array_distinct builds a new
    * array per row just to take its size). Same null semantics:
    * array_distinct keeps one null, so a null token counts once.
    */
  def distinctTokensAD(arr: ArrayData): Int = {
    val n = arr.numElements()
    val seen = new java.util.HashSet[org.apache.spark.unsafe.types.UTF8String](math.max(16, n * 2))
    var nullSeen = false
    var count = 0
    var i = 0
    while (i < n) {
      val t = arr.getUTF8String(i)
      if (t == null) { if (!nullSeen) { nullSeen = true; count += 1 } }
      else if (seen.add(t)) count += 1
      i += 1
    }
    count
  }

  def trigramHashSetAD(tokens: ArrayData): ArrayData = {
    val n = tokens.numElements()
    val th = new Array[Long](n)
    var i = 0
    while (i < n) {
      val s = tokens.getUTF8String(i)
      th(i) =
        if (s == null) Kernels.mix64(0L)
        else Kernels.hash64Region(s.getBaseObject, s.getBaseOffset, s.numBytes())
      i += 1
    }
    new GenericArrayData(Kernels.trigramHashSet(th))
  }

}

/** cosine_sim(array<float>, array<float>) → double.
  *
  * The engine's float4[] compute analog of the reference's C array
  * kernels (reference: FromRow.hs:305-318, cbits/array_conversion.c):
  * where pgstream decodes float4[] fast, graft *computes* over it fast —
  * a native Catalyst expression with codegen, so the similarity loop sits
  * inside the whole-stage-generated operator body (no UDF serialization,
  * no boxing per element).
  */
case class CosineSim(left: Expression, right: Expression)
    extends BinaryExpression with GraftExpectsInputTypes {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "cosine_sim"
  // Declared input types make Catalyst coerce array<double> literals (or
  // reject non-arrays) at analysis time — without them ArrayData.getFloat
  // would silently misread the element bytes of a wrong-typed column.
  override def graftInputTypes: Seq[DataType] =
    Seq(ArrayType(FloatType), ArrayType(FloatType))

  override protected def nullSafeEval(a: Any, b: Any): Any =
    ExprKernels.cosineAD(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.ExprKernels.cosineAD($a, $b)")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** minhash_sig(array<string>, k) → array<bigint>: k-permutation MinHash
  * signature of a token/shingle set (Broder 1997). Signature equality per
  * band drives LSH candidate generation — the linear-shuffle alternative
  * to O(n²) pair enumeration.
  */
case class MinHashSig(child: Expression, k: Int)
    extends UnaryExpression with GraftExpectsInputTypes {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_sig"
  override def graftInputTypes: Seq[DataType] = Seq(ArrayType(StringType))

  override protected def nullSafeEval(tokens: Any): Any =
    ExprKernels.minhashSigAD(tokens.asInstanceOf[ArrayData], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.ExprKernels.minhashSigAD($c, $k)")

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** simhash64(array<string>) → bigint: 64-bit SimHash (Charikar 2002) of a
  * token multiset; near-duplicate docs land within a small Hamming radius.
  */
case class SimHash64(child: Expression)
    extends UnaryExpression with GraftExpectsInputTypes {
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash64"
  override def graftInputTypes: Seq[DataType] = Seq(ArrayType(StringType))

  override protected def nullSafeEval(tokens: Any): Any =
    ExprKernels.simhash64AD(tokens.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.ExprKernels.simhash64AD($c)")

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** lsh_bucket(array<float>, nbits, seed) → int: random-hyperplane LSH
  * bucket id. Vectors in the same bucket are angularly close with
  * probability (1 - θ/π)^nbits — the candidate-generation key for
  * approximate nearest-neighbor search at scale.
  */
case class LshBucket(child: Expression, nbits: Int, seed: Long)
    extends UnaryExpression with GraftExpectsInputTypes {
  override def dataType: DataType = IntegerType
  override def prettyName: String = "lsh_bucket"
  override def graftInputTypes: Seq[DataType] = Seq(ArrayType(FloatType))

  override protected def nullSafeEval(vec: Any): Any =
    ExprKernels.lshBucketAD(vec.asInstanceOf[ArrayData], nbits, seed)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.ExprKernels.lshBucketAD($c, $nbits, ${seed}L)")

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** sorted_intersect_count(array<bigint>, array<bigint>) → int:
  * intersection size of two ascending-sorted distinct long arrays via a
  * zero-allocation merge — the set-similarity join's inner loop.
  */
case class SortedIntersectCount(left: Expression, right: Expression)
    extends BinaryExpression with GraftExpectsInputTypes {
  override def dataType: DataType = IntegerType
  override def prettyName: String = "sorted_intersect_count"
  override def graftInputTypes: Seq[DataType] =
    Seq(ArrayType(LongType), ArrayType(LongType))

  override protected def nullSafeEval(a: Any, b: Any): Any =
    ExprKernels.sortedIntersectAD(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.ExprKernels.sortedIntersectAD($a, $b)")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** trigram_hash_set(array<string>) → array<bigint>: ascending-sorted
  * DISTINCT 64-bit hashes of all word trigrams — the one-pass kernel
  * form of `array_sort(transform(array_distinct(trigrams), xxhash64))`:
  * each token's bytes hashed once, no per-trigram string allocation,
  * dedup+sort on primitive longs. Output feeds the posting-index
  * explode and [[SortedIntersectCount]] verification directly.
  */
case class TrigramHashSet(child: Expression)
    extends UnaryExpression with GraftExpectsInputTypes {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "trigram_hash_set"
  override def graftInputTypes: Seq[DataType] = Seq(ArrayType(StringType))

  override protected def nullSafeEval(tokens: Any): Any =
    ExprKernels.trigramHashSetAD(tokens.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.ExprKernels.trigramHashSetAD($c)")

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** normalize_alnum(string) → string: the fingerprint normalization
  * ladder's collapse step as one pass (see
  * [[ExprKernels.normalizeAlnumAD]]); callers compose it under lower()
  * and md5() so the Unicode lowercasing and hashing stay the builtins'.
  */
case class NormalizeAlnum(child: Expression)
    extends UnaryExpression with GraftExpectsInputTypes {
  override def dataType: DataType = StringType
  override def prettyName: String = "normalize_alnum"
  override def graftInputTypes: Seq[DataType] = Seq(StringType)

  override protected def nullSafeEval(s: Any): Any =
    ExprKernels.normalizeAlnumAD(s.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.ExprKernels.normalizeAlnumAD($c)")

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** stop_count(array<string>, stops) → bigint: tokens ∈ stops, one pass,
  * no filtered-array allocation — the kernel form of
  * `size(filter(toks, t => t.isin(stops: _*)))`, count-identical
  * including null-token handling.
  */
case class StopCount(child: Expression, stops: Seq[String])
    extends UnaryExpression with GraftExpectsInputTypes {
  override def dataType: DataType = LongType
  override def prettyName: String = "stop_count"
  override def graftInputTypes: Seq[DataType] = Seq(ArrayType(StringType))

  @transient private lazy val stopArr: Array[org.apache.spark.unsafe.types.UTF8String] =
    stops.map(org.apache.spark.unsafe.types.UTF8String.fromString).toArray

  override protected def nullSafeEval(tokens: Any): Any =
    ExprKernels.stopCountAD(tokens.asInstanceOf[ArrayData], stopArr)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("graftStops", stopArr,
      "org.apache.spark.unsafe.types.UTF8String[]")
    defineCodeGen(ctx, ev, c => s"graft.functions.ExprKernels.stopCountAD($c, $ref)")
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** distinct_tokens(array<string>) → int: exact distinct count — the
  * kernel form of `size(array_distinct(toks))` without the intermediate
  * deduplicated array (null counts once, like array_distinct).
  */
case class DistinctTokens(child: Expression)
    extends UnaryExpression with GraftExpectsInputTypes {
  override def dataType: DataType = IntegerType
  override def prettyName: String = "distinct_tokens"
  override def graftInputTypes: Seq[DataType] = Seq(ArrayType(StringType))

  override protected def nullSafeEval(tokens: Any): Any =
    ExprKernels.distinctTokensAD(tokens.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.ExprKernels.distinctTokensAD($c)")

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** bloom_might_contain(bigint) → boolean: membership probe against a
  * pre-built [[org.apache.spark.util.sketch.BloomFilter]] (Spark's own
  * public sketch — the same structure InjectRuntimeFilter broadcasts).
  * Used for explicit runtime join pruning: build the filter over the
  * small side's keys, push this predicate onto the big side's scan, and
  * rows that cannot join never leave the scan stage. False positives
  * only (never drops a joinable row); the filter rides whole-stage
  * codegen as a plan-reference object, one `mightContainLong` per row.
  */
case class BloomMightContain(child: Expression,
                             bloom: org.apache.spark.util.sketch.BloomFilter)
    extends UnaryExpression with GraftExpectsInputTypes {
  override def dataType: DataType = BooleanType
  override def prettyName: String = "bloom_might_contain"
  override def graftInputTypes: Seq[DataType] = Seq(LongType)

  override protected def nullSafeEval(v: Any): Any =
    bloom.mightContainLong(v.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("graftBloom", bloom,
      classOf[org.apache.spark.util.sketch.BloomFilter].getName)
    defineCodeGen(ctx, ev, c => s"$ref.mightContainLong($c)")
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Column-API surface for the custom expressions (plus SQL names via
  * [[GraftExtensions]]). These compose with any DataFrame code exactly
  * like `org.apache.spark.sql.functions` builtins.
  */
object functions {
  private def lit(e: Column): Expression = GraftShim.expression(e)

  def cosine_sim(a: Column, b: Column): Column =
    GraftShim.column(CosineSim(lit(a), lit(b)))

  def minhash_sig(tokens: Column, k: Int): Column =
    GraftShim.column(MinHashSig(lit(tokens), k))

  def simhash64(tokens: Column): Column =
    GraftShim.column(SimHash64(lit(tokens)))

  def lsh_bucket(vec: Column, nbits: Int, seed: Long): Column =
    GraftShim.column(LshBucket(lit(vec), nbits, seed))

  def sorted_intersect_count(a: Column, b: Column): Column =
    GraftShim.column(SortedIntersectCount(lit(a), lit(b)))

  def trigram_hash_set(tokens: Column): Column =
    GraftShim.column(TrigramHashSet(lit(tokens)))

  def bloom_might_contain(c: Column, bloom: org.apache.spark.util.sketch.BloomFilter): Column =
    GraftShim.column(BloomMightContain(lit(c), bloom))

  def stop_count(toks: Column, stops: Seq[String]): Column =
    GraftShim.column(StopCount(lit(toks), stops))

  def distinct_tokens(toks: Column): Column =
    GraftShim.column(DistinctTokens(lit(toks)))

  def normalize_alnum(text: Column): Column =
    GraftShim.column(NormalizeAlnum(lit(text)))
}
