package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.agg.Stats

/** Exact distributed quantiles: hand-checked nearest-rank selection
  * (incl. ties and a single-element group), the all-integer boundary cases,
  * partition invariance, and the plan shape (no Window, broadcast target
  * join).
  */
class StatsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val qs = Seq((0, 1), (1, 4), (1, 2), (3, 4), (1, 1))

  // g1: 1..9 (n=9); g2: ties everywhere; g3: single element; nulls dropped
  private val df = (
    (1 to 9).map(i => ("g1", java.lang.Long.valueOf(i.toLong))) ++
    Seq("g2" -> 5L, "g2" -> 5L, "g2" -> 5L, "g2" -> 7L).map { case (g, v) => (g, java.lang.Long.valueOf(v)) } ++
    Seq(("g3", java.lang.Long.valueOf(42L)), ("g1", null.asInstanceOf[java.lang.Long]))
  ).toDF("g", "v")

  private def run(d: org.apache.spark.sql.DataFrame) =
    Stats.exactQuantilesBy(d, "g", "v", qs)
      .as[(String, Int, Int, Long, Long, Long)].collect()
      .map(r => (r._1, r._2, r._3) -> (r._4, r._5, r._6)).toMap

  test("nearest-rank values match hand computation (n=9: ranks 1,3,5,7,9)") {
    val got = run(df)
    // target_rank = 1 + (num*(n-1)) div den over n=9 -> 1,3,5,7,9
    assert(got(("g1", 0, 1)) === ((9L, 1L, 1L)))
    assert(got(("g1", 1, 4)) === ((9L, 3L, 3L)))
    assert(got(("g1", 1, 2)) === ((9L, 5L, 5L)))
    assert(got(("g1", 3, 4)) === ((9L, 7L, 7L)))
    assert(got(("g1", 1, 1)) === ((9L, 9L, 9L)))
  }

  test("ties and single-element groups") {
    val got = run(df)
    // g2 sorted: 5,5,5,7 (n=4) -> ranks 1,1,2,3,4 -> values 5,5,5,5,7
    assert(got(("g2", 0, 1))._3 === 5L)
    assert(got(("g2", 1, 2))._3 === 5L)
    assert(got(("g2", 3, 4))._3 === 5L)
    assert(got(("g2", 1, 1))._3 === 7L)
    // g3: every quantile is the single element
    qs.foreach { case (a, b) => assert(got(("g3", a, b))._3 === 42L) }
    // the null row never counted: g1 n stayed 9
    assert(got(("g1", 1, 1))._1 === 9L)
  }

  test("partition invariance: 1 vs 11 partitions") {
    assert(run(df.repartition(1)) === run(df.repartition(11)))
  }

  test("matches percentile_disc-style brute force on a seeded random table") {
    val rng = new scala.util.Random(77)
    val rows = (0 until 2000).map(_ => (s"g${rng.nextInt(4)}", rng.nextInt(1000).toLong))
    val d = rows.toDF("g", "v").repartition(7)
    val got = run(d)
    rows.groupBy(_._1).foreach { case (g, xs) =>
      val sorted = xs.map(_._2).sorted
      val n = sorted.length.toLong
      qs.foreach { case (a, b) =>
        val tr = 1L + (a.toLong * (n - 1)) / b.toLong
        assert(got((g, a, b)) === ((n, tr, sorted((tr - 1).toInt))), s"g=$g q=$a/$b")
      }
    }
  }

  test("plan: no Window node, broadcast target selection") {
    val plan = Stats.exactQuantilesBy(df, "g", "v", qs)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"),
      s"per-group window crept in (one task per group at scale):\n$plan")
    assert(plan.contains("BroadcastHashJoin"),
      s"expected the broadcast target join:\n$plan")
  }
}
