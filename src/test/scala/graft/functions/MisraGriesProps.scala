package graft.functions

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

/** ScalaCheck properties for the Misra–Gries summary: the presence /
  * underestimate guarantees and merge-equivalence must hold for ALL
  * streams and capacities, not just the Zipf fixtures the example specs
  * pin.
  */
object MisraGriesProps extends Properties("MisraGries") {

  // small alphabet so collisions and evictions actually happen
  private val item: Gen[String] = Gen.oneOf((1 to 12).map(i => s"t$i"))
  private val stream: Gen[List[String]] = Gen.nonEmptyListOf(item)
  private val cap: Gen[Int] = Gen.choose(1, 8)

  private def build(s: Seq[String], capacity: Int): MisraGries =
    s.foldLeft(new MisraGries(capacity))((m, x) => m.add(x))

  property("size <= capacity and total = |stream|") =
    forAll(stream, cap) { (s, c) =>
      val mg = build(s, c)
      mg.size <= c && mg.total == s.size.toLong
    }

  property("every item above n/(capacity+1) is present") =
    forAll(stream, cap) { (s, c) =>
      val mg = build(s, c)
      val bound = s.size.toLong / (c + 1)
      s.groupBy(identity).forall { case (item, occ) =>
        occ.size <= bound || mg.candidates.contains(item)
      }
    }

  property("estimates underestimate by at most n/(capacity+1)") =
    forAll(stream, cap) { (s, c) =>
      val exact = s.groupBy(identity).view.mapValues(_.size.toLong).toMap
      val mg = build(s, c)
      val bound = s.size.toLong / (c + 1)
      exact.forall { case (item, t) =>
        val e = mg.estimate(item)
        e <= t && t - e <= bound
      }
    }

  property("merged split keeps guarantees over the combined stream") =
    forAll(stream, stream, cap) { (s1, s2, c) =>
      val merged = build(s1, c).merge(build(s2, c))
      val all = s1 ++ s2
      val bound = all.size.toLong / (c + 1)
      val exact = all.groupBy(identity).view.mapValues(_.size.toLong).toMap
      merged.total == all.size.toLong && merged.size <= c &&
        exact.forall { case (item, t) =>
          val e = merged.estimate(item)
          e <= t && t - e <= bound &&
            (t <= bound || merged.candidates.contains(item))
        }
    }

  property("weighted add equals repeated unit adds") =
    forAll(Gen.nonEmptyListOf(Gen.zip(item, Gen.choose(1, 9))), cap) {
      (pairs, c) =>
        val weighted = pairs.foldLeft(new MisraGries(c)) {
          case (m, (x, w)) => m.add(x, w.toLong)
        }
        val unit = pairs.foldLeft(new MisraGries(c)) {
          case (m, (x, w)) => (1 to w).foldLeft(m)((mm, _) => mm.add(x))
        }
        // batched-decrement eviction is an optimization of unit adds with
        // the SAME counters only when no eviction interleaves; the shared
        // contract is the guarantee pair, which both must satisfy — and
        // totals must agree exactly
        val n = pairs.map(_._2.toLong).sum
        val bound = n / (c + 1)
        val exact = pairs.groupBy(_._1).view
          .mapValues(_.map(_._2.toLong).sum).toMap
        Seq(weighted, unit).forall { mg =>
          mg.total == n && mg.size <= c &&
            exact.forall { case (item, t) =>
              val e = mg.estimate(item)
              e <= t && t - e <= bound && (t <= bound || mg.candidates.contains(item))
            }
        }
    }
}
