package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.ann.Similarity

/** Product-quantization ANN (pqTopK): planted exact duplicates are
  * ADC-minimal by construction, determinism under reruns and
  * repartitioning, loud dim/subspace mismatch, empty corpus, and the
  * fused/broadcast plan shape. Cross-engine exactness is carried by the
  * q_ann_pq DuckDB oracle + supp_ann_pq python port.
  */
class PqSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def fixture() = {
    val rng = new scala.util.Random(17)
    def vec() = Array.fill(32)(rng.nextFloat() * 2 - 1)
    val base = (0 until 200).map(i => (i.toLong, vec()))
    // exact duplicates (identical floats) of query ids 0..4
    val dups = (0 until 5).map(i => (500L + i, base(i)._2))
    (base ++ dups).toDF("vec_id", "embedding")
  }

  test("exact duplicate is ADC-minimal: shares the query's codes, so its adc " +
       "is the per-query minimum (sum of min table entries)") {
    val out = Similarity.pqTopK(fixture(), "vec_id", "embedding",
      queryIds = (0L until 5L), k = 10, numSub = 4, numCodes = 16,
      iters = 2, quantizerSampleMod = 1L)
      .select("qid", "neighbor_id", "adc")
      .as[(Long, Long, Double)].collect()
    (0 until 5).foreach { i =>
      val mine = out.filter(_._1 == i.toLong)
      val dup = mine.find(_._2 == 500L + i)
      assert(dup.isDefined, s"exact duplicate missed for q$i")
      // code(dup) == code(q) per subspace ⇒ adc(dup) = Σ min_j dt[m][j],
      // a lower bound on every candidate's adc
      assert(dup.get._3 === mine.map(_._3).min, s"duplicate not ADC-minimal for q$i")
    }
  }

  test("deterministic across reruns and repartitioning (order-independent training)") {
    val df = fixture()
    def run(d: org.apache.spark.sql.DataFrame) =
      Similarity.pqTopK(d, "vec_id", "embedding", queryIds = (0L until 5L),
        k = 10, numSub = 4, numCodes = 16, iters = 2, quantizerSampleMod = 1L)
        .as[(Long, Int, Long, Double)].collect().toSet
    val a = run(df)
    assert(run(df) === a)
    assert(run(df.repartition(7)) === a)
  }

  test("dim not divisible by numSub fails loudly") {
    val e = intercept[IllegalArgumentException] {
      Similarity.pqTopK(fixture(), "vec_id", "embedding",
        queryIds = Seq(0L), k = 5, numSub = 5)
    }
    assert(e.getMessage.contains("not divisible"))
  }

  test("empty corpus returns an empty result with the contract schema") {
    val empty = Seq.empty[(Long, Array[Float])].toDF("vec_id", "embedding")
    val out = Similarity.pqTopK(empty, "vec_id", "embedding",
      queryIds = Seq(0L), k = 5)
    assert(out.columns.toSeq === Seq("qid", "rank", "neighbor_id", "adc"))
    assert(out.count() === 0)
  }

  test("ivfPqTopK with nProbe = nLists (all lists probed) is EXACTLY pqTopK " +
       "(identical codebooks, pruning disabled)") {
    val df = fixture()
    val pq = Similarity.pqTopK(df, "vec_id", "embedding",
      queryIds = (0L until 5L), k = 10, numSub = 4, numCodes = 16,
      iters = 2, quantizerSampleMod = 1L)
      .as[(Long, Int, Long, Double)].collect().toSet
    val ivfpq = Similarity.ivfPqTopK(df, "vec_id", "embedding",
      queryIds = (0L until 5L), k = 10, nLists = 8, nProbe = 8,
      coarseIters = 2, numSub = 4, numCodes = 16, pqIters = 2,
      quantizerSampleMod = 1L)
      .as[(Long, Int, Long, Double)].collect().toSet
    assert(ivfpq === pq)
  }

  test("ivfPqTopK: exact duplicate shares the query's cluster AND codes — " +
       "always a candidate, always ADC-minimal") {
    val out = Similarity.ivfPqTopK(fixture(), "vec_id", "embedding",
      queryIds = (0L until 5L), k = 10, nLists = 8, nProbe = 2,
      quantizerSampleMod = 1L)
      .select("qid", "neighbor_id", "adc")
      .as[(Long, Long, Double)].collect()
    (0 until 5).foreach { i =>
      val mine = out.filter(_._1 == i.toLong)
      val dup = mine.find(_._2 == 500L + i)
      assert(dup.isDefined, s"exact duplicate missed for q$i")
      assert(dup.get._3 === mine.map(_._3).min, s"duplicate not ADC-minimal for q$i")
    }
  }

  test("plan: fused encode (no ScalaUDF), broadcast candidate join (no SortMergeJoin)") {
    // repartition blocks ConvertToLocalRelation, which would otherwise
    // evaluate the whole encode projection at optimization time on a
    // literal fixture (leaving no expressions to inspect)
    val qe = Similarity.pqTopK(fixture().repartition(2), "vec_id", "embedding",
      queryIds = (0L until 5L), k = 10, quantizerSampleMod = 1L)
      .queryExecution
    // expression strings get elided (the codebook literals are huge) —
    // inspect the tree, not the string
    val exprs = qe.optimizedPlan.collect { case p => p.expressions }.flatten
    assert(exprs.exists(
      _.find(_.isInstanceOf[graft.expr.NearestCentroid]).isDefined),
      "fused encode missing")
    assert(exprs.forall(_.find(
      _.isInstanceOf[org.apache.spark.sql.catalyst.expressions.ScalaUDF]).isEmpty),
      "UDF on the encode path")
    val plan = qe.executedPlan.toString
    assert(plan.contains("BroadcastNestedLoopJoin"), s"query join not broadcast:\n$plan")
    assert(!plan.contains("SortMergeJoin"), s"unexpected shuffle join:\n$plan")
  }
}
