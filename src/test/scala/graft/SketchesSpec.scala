package graft

import graft.operators.Sketches
import graft.operators.Sketches.MisraGries

/** Sketch-then-verify heavy hitters: the Misra–Gries superset guarantee
  * under eviction pressure (vocabulary ≫ k) and arbitrary partitioning,
  * with the exact verify pass making the final answer sketch-invisible. */
class SketchesSpec extends SparkTestBase {
  import spark.implicits._

  // heavy-tail stream: 3 heavy terms (1200/800/400) over 2000 rare ones —
  // vocabulary (2003) is far above k, so eviction and merge-shrink both fire
  private lazy val stream: Seq[String] = {
    val rnd = new scala.util.Random(23)
    val heavy = Seq.fill(1200)("alpha") ++ Seq.fill(800)("beta") ++
      Seq.fill(400)("gamma")
    val tail = Seq.fill(2000)("rare" + rnd.nextInt(2000))
    rnd.shuffle(heavy ++ tail)
  }

  private def brute(denom: Int): Map[String, Long] = {
    val n = stream.size.toLong
    stream.groupBy(identity).view.mapValues(_.size.toLong)
      .filter { case (_, c) => c * denom >= n }.toMap
  }

  test("heavyHitters is exact under eviction pressure, any partitioning") {
    for (parts <- Seq(1, 7)) {
      val ds = stream.toDS().repartition(parts)
      val got = Sketches.heavyHitters(ds, denom = 10, k = 64)
        .as[(String, Long)].collect().toMap
      assert(got == brute(10), s"parts=$parts")
    }
    // alpha (27%), beta (18%) clear total/10; gamma (9%) does not
    assert(brute(10).keySet == Set("alpha", "beta"))
  }

  test("MisraGries summary keeps every item above N/(k+1) positive") {
    val mg = new MisraGries(8)
    val summary = stream.foldLeft(mg.zero)(mg.reduce)
    // N = 4400; bound N/(k+1) ≈ 489: alpha and beta MUST survive
    assert(summary.contains("alpha") && summary.contains("beta"))
    assert(summary.size <= 8)
    // merge of split halves preserves the guarantee
    val (l, r) = stream.splitAt(stream.size / 2)
    val merged = mg.merge(l.foldLeft(mg.zero)(mg.reduce),
      r.foldLeft(mg.zero)(mg.reduce))
    assert(merged.contains("alpha") && merged.contains("beta"))
    assert(merged.size <= 8)
    // undercount bound: stored count never exceeds the true count
    val truth = stream.groupBy(identity).view.mapValues(_.size.toLong).toMap
    summary.foreach { case (t, c) => assert(c <= truth(t), t) }
  }
}
