package graft.operators

import graft.SparkSpec
import graft.functions.MisraGries

/** Misra–Gries summary properties + the two-pass heavy-hitter operator
  * vs the exact distribution (no-oracle algorithmic internals; the
  * registry key itself IS oracle-checked because pass 2 is exact).
  */
class HeavyHitterSpec extends SparkSpec {

  /** Deterministic skewed stream: item i appears ~n/(i+1) times
    * (Zipf-ish), interleaved so evictions actually churn.
    */
  private def zipfStream(nItems: Int, scale: Int): Seq[String] =
    (0 until nItems).flatMap(i => Seq.fill(scale / (i + 1))(s"item$i"))
      .zipWithIndex.sortBy { case (_, ix) => (ix * 7919) % 104729 }
      .map(_._1)

  test("MG guarantee: every item above n/(capacity+1) survives, counts within bound") {
    val stream = zipfStream(200, 2000)
    val exact = stream.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val n = stream.size.toLong
    for (cap <- Seq(5, 20, 80)) {
      val mg = stream.foldLeft(new MisraGries(cap))((m, s) => m.add(s))
      assert(mg.total == n)
      assert(mg.size <= cap)
      val bound = n / (cap + 1)
      exact.foreach { case (item, freq) =>
        if (freq > bound)
          assert(mg.candidates.contains(item),
            s"cap=$cap lost $item (freq $freq > bound $bound)")
      }
      // every kept counter underestimates by at most n/(cap+1)
      mg.candidates.foreach { item =>
        val est = mg.estimate(item)
        val t = exact(item)
        assert(est <= t && t - est <= bound, s"cap=$cap $item est=$est true=$t")
      }
    }
  }

  test("MG merge preserves the guarantee across a partitioned stream") {
    val stream = zipfStream(100, 1500)
    val n = stream.size.toLong
    val cap = 30
    val parts = stream.grouped(97).toSeq // uneven partition sizes
    val merged = parts
      .map(p => p.foldLeft(new MisraGries(cap))((m, s) => m.add(s)))
      .reduce((a, b) => a.merge(b))
    assert(merged.total == n && merged.size <= cap)
    val exact = stream.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val bound = n / (cap + 1)
    exact.foreach { case (item, freq) =>
      if (freq > bound) assert(merged.candidates.contains(item))
    }
    merged.candidates.foreach { item =>
      val est = merged.estimate(item)
      assert(est <= exact(item) && exact(item) - est <= bound)
    }
  }

  test("heavyHitters equals the exact GROUP BY/HAVING answer under forced eviction") {
    import spark.implicits._
    val stream = zipfStream(300, 3000)
    val df = stream.toDF("token")
    // capacity 60 ≪ 300 distinct items forces heavy churn in pass 1
    // (while keeping the guarantee: 60 + 1 > support 50)
    val got = Aggregations.heavyHitters(df, support = 50, capacity = 60)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val n = stream.size.toLong
    val expected = stream.groupBy(identity).view.mapValues(_.size.toLong)
      .filter { case (_, c) => c * 50 > n }
      .toSeq.sortBy { case (t, c) => (-c, t) }
    assert(got.toSeq == expected && got.nonEmpty)
  }

  test("heavyHitters output is invariant under repartitioning") {
    import spark.implicits._
    val stream = zipfStream(300, 3000)
    val df = stream.toDF("token")
    // pass 1's treeAggregate merge order (hence the candidate SET) depends
    // on partitioning, but pass 2's exact re-count must erase that
    val base = Aggregations.heavyHitters(df, 50, 60)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    Seq(1, 7, 64).foreach { n =>
      val got = Aggregations.heavyHitters(df.repartition(n), 50, 60)
        .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
      assert(got == base, s"partitions=$n changed the answer")
    }
  }

  test("MG weight-0 add is a no-op and cannot poison eviction") {
    val mg = new MisraGries(2)
    mg.add("a", 0) // must NOT plant a 0-valued counter
    mg.add("b", 5)
    (1 to 1000).foreach(_ => mg.add("c"))
    assert(mg.total == 1005)
    // c is ~99% of the stream — the guarantee requires it present
    assert(mg.candidates.contains("c"))
    intercept[IllegalArgumentException](mg.add("d", -1))
  }

  test("heavyHitters ignores null items in both passes") {
    import spark.implicits._
    // nulls are 60% of the raw column; the contract counts only non-null
    // items, so "a" (3 of 4 non-null) is the lone >50% hitter
    val df = Seq("a", null, "a", null, null, "a", "b", null, null, null)
      .toDF("token")
    val got = Aggregations.heavyHitters(df, support = 2, capacity = 10)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(got == Seq(("a", 3L)))
  }

  test("heavyHitters rejects a capacity that cannot cover the support") {
    import spark.implicits._
    val df = Seq("a").toDF("token")
    intercept[IllegalArgumentException](
      Aggregations.heavyHitters(df, support = 50, capacity = 10))
  }

  test("registry op returns the >2% tokens of the document corpus") {
    val rows = Aggregations.aggHeavyHittersMg.fn(spark, sf).collect()
    assert(rows.nonEmpty)
    val cnts = rows.map(_.getLong(1))
    assert(cnts.sameElements(cnts.sorted(Ordering[Long].reverse)))
  }
}
