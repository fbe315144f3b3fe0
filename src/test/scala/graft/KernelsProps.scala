package graft

import org.scalacheck.{Gen, Prop, Properties}
import org.scalacheck.Prop.forAll
import graft.functions.Kernels

/** Generative properties for the codegen kernels — the algebraic laws
  * that must hold for ANY input, complementing the fixed-value checks
  * in FunctionsSpec. ScalaCheck Properties run under `sbt test` via
  * sbt's native ScalaCheck framework support.
  */
object KernelsProps extends Properties("Kernels") {

  private val sortedDistinctLongs: Gen[Array[Long]] =
    Gen.listOf(Gen.chooseNum(-1000L, 1000L)).map(_.distinct.sorted.toArray)

  private val tokenSet: Gen[Array[Array[Byte]]] =
    Gen.listOf(Gen.alphaNumStr.suchThat(_.nonEmpty))
      .map(_.distinct.map(_.getBytes("UTF-8")).toArray)

  private val floatVec: Gen[Array[Float]] =
    Gen.nonEmptyListOf(Gen.chooseNum(-10.0f, 10.0f)).map(_.toArray)

  property("sortedIntersectCount equals set intersection size") =
    forAll(sortedDistinctLongs, sortedDistinctLongs) { (a, b) =>
      Kernels.sortedIntersectCount(a, b) == (a.toSet & b.toSet).size
    }

  property("sortedIntersectCount is symmetric") =
    forAll(sortedDistinctLongs, sortedDistinctLongs) { (a, b) =>
      Kernels.sortedIntersectCount(a, b) == Kernels.sortedIntersectCount(b, a)
    }

  property("cosine is symmetric and bounded in [-1, 1]") =
    forAll(floatVec, floatVec) { (a, b) =>
      val n = math.min(a.length, b.length)
      val (x, y) = (a.take(n), b.take(n))
      val c = Kernels.cosine(x, y)
      c == Kernels.cosine(y, x) && c >= -1.0 - 1e-9 && c <= 1.0 + 1e-9
    }

  property("cosine of a nonzero vector with itself is 1") =
    forAll(floatVec.suchThat(_.exists(v => math.abs(v) > 1e-3))) { v =>
      math.abs(Kernels.cosine(v, v) - 1.0) < 1e-6
    }

  property("minhash signature of a union is the elementwise min") =
    // THE MinHash law: sig(A ∪ B)[i] = min(sig(A)[i], sig(B)[i]) — what
    // makes signatures mergeable and the band equality estimator work
    forAll(tokenSet.suchThat(_.nonEmpty), tokenSet.suchThat(_.nonEmpty)) { (a, b) =>
      val k = 32
      val union = (a.map(_.toSeq) ++ b.map(_.toSeq)).distinct.map(_.toArray)
      val su = Kernels.minhashSig(union, k)
      val sa = Kernels.minhashSig(a, k)
      val sb = Kernels.minhashSig(b, k)
      su.indices.forall(i => su(i) == math.min(sa(i), sb(i)))
    }

  property("simhash is token-order invariant (a multiset hash)") =
    forAll(tokenSet.suchThat(_.length > 1)) { toks =>
      Kernels.simhash64(toks) == Kernels.simhash64(toks.reverse)
    }

  property("hash64Region is bit-identical to hash64 on the same bytes") =
    // the zero-copy contract: the expression layer hashes tokens off the
    // UTF8String backing region; that must equal the byte-array hash
    forAll(Gen.listOf(Gen.chooseNum(Byte.MinValue, Byte.MaxValue))) { bs =>
      val arr = bs.toArray
      Kernels.hash64Region(arr, org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET,
        arr.length) == Kernels.hash64(arr)
    }

  property("minhash/simhash from pre-hashed tokens match the byte-array forms") =
    forAll(tokenSet) { toks =>
      val hs = toks.map(Kernels.hash64)
      Kernels.minhashSigFromHashes(hs, 16).sameElements(Kernels.minhashSig(toks, 16)) &&
        Kernels.simhash64FromHashes(hs) == Kernels.simhash64(toks)
    }

  property("lshBucket stays in [0, 2^nbits) and is deterministic") =
    forAll(floatVec, Gen.chooseNum(1, 16), Gen.chooseNum(0L, 1L << 40)) { (v, bits, seed) =>
      val b = Kernels.lshBucket(v, bits, seed)
      b >= 0 && b < (1 << bits) && b == Kernels.lshBucket(v, bits, seed)
    }

  property("rollingHashes emits one window hash per position") =
    forAll(Gen.alphaNumStr.suchThat(_.length >= 4)) { s =>
      val bytes = s.getBytes("UTF-8")
      val w = 4
      val hs = Kernels.rollingHashes(bytes, w)
      hs.length == bytes.length - w + 1 &&
        // each window hash must equal a fresh hash of that window alone
        hs.indices.forall(i => hs(i) == Kernels.rollingHashes(bytes.slice(i, i + w), w)(0))
    }

  property("hash64 avalanche: one flipped bit changes many output bits") =
    forAll(Gen.nonEmptyListOf(Gen.chooseNum(Byte.MinValue, Byte.MaxValue))) { bs =>
      val a = bs.toArray
      val b = a.clone(); b(0) = (b(0) ^ 1).toByte
      val dist = java.lang.Long.bitCount(Kernels.hash64(a) ^ Kernels.hash64(b))
      Prop.collect(dist)(dist >= 8) // 64-bit avalanche: expect ~32, require >= 8
    }
}
