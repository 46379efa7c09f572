package graft

import org.apache.spark.sql.functions._
import graft.operators.Similarity

class SimilaritySpec extends SparkTestBase {
  import spark.implicits._

  private val dim = 16
  /** clustered vectors: 8 centroids + noise, so ANN buckets are meaningful */
  private lazy val vecs: Seq[(Long, Array[Float])] = {
    val rnd = new scala.util.Random(11)
    val centroids = Array.fill(8, dim)(rnd.nextGaussian().toFloat)
    (0L until 500L).map { i =>
      val c = centroids((i % 8).toInt)
      i -> c.map(x => x + rnd.nextGaussian().toFloat * 0.15f)
    }
  }

  private def cosine(a: Array[Float], b: Array[Float]): Double = {
    var dot = 0.0; var na = 0.0; var nb = 0.0
    for (j <- 0 until dim) {
      dot += a(j).toDouble * b(j).toDouble
      na += a(j).toDouble * a(j).toDouble
      nb += b(j).toDouble * b(j).toDouble
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  private lazy val data = vecs.filter(_._1 >= 10).toDF("vec_id", "embedding")
  private lazy val queries = vecs.filter(_._1 < 10)
    .map { case (i, v) => (i, v) }.toDF("q_id", "q_vec")

  private def bruteOracle(k: Int): Map[Long, Seq[Long]] =
    vecs.filter(_._1 < 10).map { case (qid, qv) =>
      qid -> vecs.filter(_._1 >= 10)
        .map { case (i, v) => (-cosine(v, qv), i) }.sortBy(identity).take(k).map(_._2)
    }.toMap

  test("bruteForceTopK matches the scalar oracle exactly") {
    val k = 5
    val got = Similarity.bruteForceTopK(data, queries, k)
      .select($"q_id", $"sim_rank", $"vec_id").as[(Long, Int, Long)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(_._2).map(_._3).toSeq).toMap
    assert(got == bruteOracle(k))
  }

  test("annTopK achieves high recall@5 on clustered vectors") {
    val k = 5
    val exact = bruteOracle(k)
    val got = Similarity.annTopK(data, queries, k, nPlanes = 16, bands = 8)
      .select($"q_id", $"sim_rank", $"vec_id").as[(Long, Int, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._3).toSet).toMap
    val recalls = exact.map { case (q, ids) =>
      ids.count(got.getOrElse(q, Set()).contains).toDouble / k
    }
    val mean = recalls.sum / recalls.size
    assert(mean >= 0.8, s"mean recall@5 = $mean")
  }

  test("cosine column agrees with scalar cosine to 1e-12") {
    val df = Seq((vecs(0)._2, vecs(1)._2)).toDF("a", "b")
      .select(Similarity.cosine($"a", $"b").as("c")).as[Double]
    assert(math.abs(df.head() - cosine(vecs(0)._2, vecs(1)._2)) < 1e-12)
  }
}
