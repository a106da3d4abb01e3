package graft.llmops

import graft.{SparkTestBase, Tables}
import org.apache.spark.sql.functions._

class IvfSpec extends SparkTestBase {
  import spark.implicits._

  lazy val emb = Tables.embeddings(spark, sf0001).cache()
  lazy val q = emb.filter($"vec_id" < 10)
    .select($"vec_id".as("query_id"), $"embedding".as("query_vec"))

  test("IVF recall vs brute force on the clustered corpus") {
    val exact = VectorFuncs.bruteForceTopK(emb, q, k = 5)
      .filter($"query_id" =!= $"vec_id")
      .select($"query_id", $"vec_id").as[(Long, Long)].collect().toSet
    val approx = Ivf.ivfTopK(emb, q, k = 5, nlist = 8, nprobe = 3)
      .select($"query_id", $"vec_id").as[(Long, Long)].collect().toSet
    val recall = exact.count(approx.contains).toDouble / exact.size
    assert(recall >= 0.6, s"IVF recall too low: $recall")
  }

  test("assignment is deterministic and lists are non-degenerate") {
    val cents = Ivf.sampleCentroids(emb, 8)
    assert(cents.length == 8 && cents.forall(_.length == 64))
    val a1 = emb.select($"vec_id",
      element_at(Ivf.nearest_centroids($"embedding", cents, 1), 1).as("l"))
    val a2 = emb.select($"vec_id",
      element_at(Ivf.nearest_centroids($"embedding", cents, 1), 1).as("l"))
    assert(a1.collect().toSeq == a2.collect().toSeq)
    val lists = a1.groupBy($"l").count().collect()
    assert(lists.length >= 2, "all vectors fell into one list")
  }

  test("k-means refinement does not hurt recall and improves the objective") {
    def objective(cents: Array[Array[Float]]): Double = {
      // mean cosine of each vector to its assigned centroid (higher = tighter)
      val assigned = emb.select($"embedding",
        element_at(Ivf.nearest_centroids($"embedding", cents, 1), 1).as("l"))
        .collect()
      val sims = assigned.map { r =>
        val v = r.getSeq[Float](0)
        val c = cents(r.getInt(1))
        val dot = v.indices.map(i => v(i).toDouble * c(i)).sum
        val nv = math.sqrt(v.map(x => x.toDouble * x).sum)
        val nc = math.sqrt(c.map(x => x.toDouble * x).sum)
        if (nv == 0 || nc == 0) 0.0 else dot / (nv * nc)
      }
      sims.sum / sims.length
    }
    val sampled = Ivf.sampleCentroids(emb, 8)
    val refined = Ivf.kmeansCentroids(emb, 8, iters = 3)
    assert(objective(refined) >= objective(sampled) - 1e-9,
      s"kmeans worsened the quantizer: ${objective(refined)} < ${objective(sampled)}")

    val exact = VectorFuncs.bruteForceTopK(emb, q, k = 5)
      .filter($"query_id" =!= $"vec_id")
      .select($"query_id", $"vec_id").as[(Long, Long)].collect().toSet
    val viaKmeans = Ivf.ivfTopK(emb, q, k = 5, nlist = 8, nprobe = 3,
        kmeansIters = 3)
      .select($"query_id", $"vec_id").as[(Long, Long)].collect().toSet
    val recall = exact.count(viaKmeans.contains).toDouble / exact.size
    assert(recall >= 0.6, s"IVF+kmeans recall too low: $recall")
  }

  test("nprobe widens the candidate set monotonically") {
    val r1 = Ivf.ivfTopK(emb, q, k = 5, nlist = 8, nprobe = 1).count()
    val r3 = Ivf.ivfTopK(emb, q, k = 5, nlist = 8, nprobe = 3).count()
    assert(r3 >= r1)
  }
}
