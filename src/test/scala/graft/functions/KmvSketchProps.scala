package graft.functions

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

/** ScalaCheck properties for the parameterized [[KmvSketch]] (the
  * one-scan profile's estimator): the negative-sentinel skip, the
  * exact-under-k guarantee, and merge-equivalence (partials merged in any
  * split must equal the single-pass sketch — the property that makes it
  * shippable to 1000 executors) must hold for ALL inputs, not just the
  * orders fixture `CompactionSpec` pins.
  */
object KmvSketchProps extends Properties("KmvSketch") {

  // hashes in the real domain [0, 2^32): conv() of 8 md5 hex digits
  private val hash: Gen[Long] = Gen.choose(0L, (1L << 32) - 1)
  private val stream: Gen[List[Long]] = Gen.listOf(hash)
  private val k: Gen[Int] = Gen.choose(2, 64)

  private def sketchOf(agg: KmvSketch, xs: Seq[Long]): KmvBuf =
    xs.foldLeft(agg.zero)(agg.reduce)

  property("negative inputs are ignored entirely") =
    forAll(stream, k) { (s, kk) =>
      val agg = new KmvSketch(kk)
      val withNeg = s.flatMap(h => Seq(h, -1L, Long.MinValue))
      agg.finish(sketchOf(agg, withNeg)) == agg.finish(sketchOf(agg, s))
    }

  property("under k distinct values the count is EXACT") =
    forAll(stream, k) { (s, kk) =>
      val agg = new KmvSketch(kk)
      val distinct = s.distinct
      distinct.size >= kk ||
        agg.finish(sketchOf(agg, s)) == distinct.size.toLong
    }

  property("merge of any split equals the single-pass sketch") =
    forAll(stream, k, Gen.choose(0, 100)) { (s, kk, cut) =>
      val agg = new KmvSketch(kk)
      val at = if (s.isEmpty) 0 else cut % (s.size + 1)
      val (a, b) = s.splitAt(at)
      agg.finish(agg.merge(sketchOf(agg, a), sketchOf(agg, b))) ==
        agg.finish(sketchOf(agg, s))
    }

  property("estimate is duplicate-insensitive") =
    forAll(stream, k) { (s, kk) =>
      val agg = new KmvSketch(kk)
      agg.finish(sketchOf(agg, s ++ s ++ s)) == agg.finish(sketchOf(agg, s))
    }

  // the r16 Array[Long] buffer primitives, pinned against the naive spec:
  // the buffer must BE the sorted k smallest distinct values at all times

  property("buffer is exactly the sorted k-minima of the input") =
    forAll(stream, k) { (s, kk) =>
      val agg = new KmvSketch(kk)
      val expect = s.distinct.sorted.take(kk)
      sketchOf(agg, s).hs.toList == expect
    }

  property("mergeSorted is the k-minima of the union, in any order") =
    forAll(stream, stream, k) { (a, b, kk) =>
      val agg = new KmvSketch(kk)
      val (sa, sb) = (sketchOf(agg, a), sketchOf(agg, b))
      val expect = (a ++ b).distinct.sorted.take(kk)
      agg.merge(sa, sb).hs.toList == expect &&
        agg.merge(sb, sa).hs.toList == expect
    }

  property("KmvMinima finishes to the buffer KmvSketch estimates from") =
    forAll(stream, k) { (s, kk) =>
      val mins = new KmvMinima(kk)
      val est = new KmvSketch(kk)
      val buf = s.foldLeft(mins.zero)(mins.reduce)
      mins.finish(buf).toList == s.distinct.sorted.take(kk) &&
        KmvBuf.estimate(mins.finish(buf), kk) == est.finish(sketchOf(est, s))
    }
}
