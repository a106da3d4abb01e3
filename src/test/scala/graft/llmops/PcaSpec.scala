package graft.llmops

import graft.SparkTestBase

class PcaSpec extends SparkTestBase {
  import spark.implicits._

  private def dot(a: Array[Double], b: Array[Double]): Double =
    a.zip(b).map { case (x, y) => x * y }.sum

  test("planted 2-plane corpus: components recover the plane, " +
      "explained variance descends, components orthonormal") {
    // vectors = a·e1' + b·e2' + tiny noise, where e1', e2' are fixed
    // non-axis directions in R^6
    val d1 = Array(1.0, 1.0, 0.0, 0.0, 0.0, 0.0).map(_ / math.sqrt(2))
    val d2 = Array(0.0, 0.0, 1.0, -1.0, 0.0, 0.0).map(_ / math.sqrt(2))
    val rows = (0 until 200).map { i =>
      val a = math.sin(i * 1.7) * 5
      val b = math.cos(i * 2.3) * 2
      val eps = 0.01 * math.sin(i * 9.1)
      (i.toLong, (0 until 6).map(j =>
        (a * d1(j) + b * d2(j) + (if (j == 5) eps else 0.0)).toFloat)
        .toArray)
    }
    val vecs = rows.toDF("vec_id", "embedding")
    val m = Pca.fit(vecs, k = 3)
    assert(m.d == 6 && m.k == 3)
    // explained variance descends and the first two carry ~everything
    assert(m.explained(0) >= m.explained(1))
    assert(m.explained(1) >= m.explained(2))
    assert(m.explained(2) < 0.01 * m.explained(0),
      s"rank-2 data: third component ~0, got ${m.explained.toSeq}")
    // top component aligns with the dominant planted direction
    assert(math.abs(dot(m.components(0), d1)) > 0.99,
      s"c0=${m.components(0).toSeq}")
    assert(math.abs(dot(m.components(1), d2)) > 0.99)
    // orthonormality
    assert(math.abs(dot(m.components(0), m.components(0)) - 1.0) < 1e-6)
    assert(math.abs(dot(m.components(0), m.components(1))) < 1e-6)
  }

  test("project: centered coordinates; rank-k projection preserves " +
      "pairwise dot structure of low-rank data") {
    val d1 = Array(1.0, 0.0, 0.0, 0.0)
    val rows = (0 until 50).map { i =>
      (i.toLong, Array((i % 7).toFloat, 0f, 0f, 0f))
    }
    val vecs = rows.toDF("vec_id", "embedding")
    val m = Pca.fit(vecs, k = 1)
    val proj = Pca.project(vecs, m)
      .select($"vec_id", $"pca").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).head).toMap
    // projection of x is (x - mean)·c0: differences preserved exactly
    val diff01 = proj(1L) - proj(0L)
    assert(math.abs(math.abs(diff01) - 1.0) < 1e-4, s"$diff01")
    // null vectors project to null
    val withNull = (rows :+ (99L, null.asInstanceOf[Array[Float]]))
      .toDF("vec_id", "embedding")
    val pn = Pca.project(withNull, m)
      .where($"vec_id" === 99L).head()
    assert(pn.isNullAt(1))
  }

  test("project at production dims (d=512, k=64): kernel projection " +
      "compiles with codegen fallback disabled") {
    val d = 512
    val k = 64
    // components = first-k basis vectors, mean = 0.5 everywhere, so
    // the expected projection is simply x(c) − 0.5
    val mat = Array.tabulate(k, d)((c, j) => if (j == c) 1.0 else 0.0)
    val model = Pca.PcaModel(mat, Array.fill(k)(1.0), Array.fill(d)(0.5))
    val vecs = (0 until 8).map(i =>
      (i.toLong, Array.tabulate(d)(j => ((i + j) % 5).toFloat)))
      .toDF("vec_id", "embedding")
    val prevFallback = spark.conf.get("spark.sql.codegen.fallback", "true")
    val prevFactory =
      spark.conf.get("spark.sql.codegen.factoryMode", "FALLBACK")
    try {
      // the k×d literal-tree formulation dies here at these dims
      // (generated method past the codegen limit → fallback); the
      // kernel must compile outright
      spark.conf.set("spark.sql.codegen.fallback", "false")
      spark.conf.set("spark.sql.codegen.factoryMode", "CODEGEN_ONLY")
      val out = Pca.project(vecs, model)
        .select($"vec_id", $"pca").collect()
        .map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
      assert(out(3L).length == k)
      (0 until k).foreach { c =>
        val expect = ((3 + c) % 5).toFloat - 0.5f
        assert(math.abs(out(3L)(c) - expect) < 1e-6, s"c=$c")
      }
      // double-precision variant for contract queries
      val dbl = vecs.where($"vec_id" === 3L)
        .select(Pca.projection($"embedding", model, asFloat = false)
          .as("pc"))
        .head().getSeq[Double](0)
      assert(dbl.length == k)
      (0 until k).foreach { c =>
        assert(math.abs(dbl(c) - (((3 + c) % 5) - 0.5)) < 1e-12, s"c=$c")
      }
    } finally {
      spark.conf.set("spark.sql.codegen.fallback", prevFallback)
      spark.conf.set("spark.sql.codegen.factoryMode", prevFactory)
    }
  }

  test("project: dim-mismatched vector projects to null, not garbage") {
    val model = Pca.PcaModel(Array(Array(1.0, 0.0)), Array(1.0),
      Array(0.0, 0.0))
    val vecs = Seq((1L, Array(1f, 2f)), (2L, Array(1f, 2f, 3f)))
      .toDF("vec_id", "embedding")
    val out = Pca.project(vecs, model).select($"vec_id", $"pca")
      .collect().map(r => r.getLong(0) -> r.isNullAt(1)).toMap
    assert(!out(1L) && out(2L))
  }

  test("fit with no non-null vectors fails with a clear message") {
    val empty = Seq((1L, null.asInstanceOf[Array[Float]]))
      .toDF("vec_id", "embedding")
    val e = intercept[IllegalArgumentException] { Pca.fit(empty, k = 2) }
    assert(e.getMessage.contains("no non-null vectors"))
  }

  test("isotropyReport: rank-1 data collapses (top1 ~1, PR ~1), " +
      "isotropic data spreads (PR ~d), trace identity holds") {
    // rank-1: all variance on one axis
    val rank1 = (0 until 100).map(i =>
      (i.toLong, Array((i % 11).toFloat, 0f, 0f, 0f)))
      .toDF("vec_id", "embedding")
    val r1 = Pca.isotropyReport(rank1).head()
    assert(r1.getAs[Long]("n_vectors") == 100L)
    assert(r1.getAs[Int]("dim") == 4)
    assert(r1.getAs[Double]("top1_share") > 0.999)
    assert(r1.getAs[Double]("participation_ratio") < 1.01)
    assert(r1.getAs[Boolean]("trace_ok"))
    // isotropic-ish: a DIFFERENT frequency per axis decorrelates the
    // coordinates (same-frequency phase shifts would span a 2-plane)
    val freqs = Array(1.1, 2.3, 3.7, 5.1)
    val iso = (0 until 200).map(i =>
      (i.toLong, Array.tabulate(4)(j =>
        math.sin(i * freqs(j)).toFloat)))
      .toDF("vec_id", "embedding")
    val ri = Pca.isotropyReport(iso).head()
    assert(ri.getAs[Double]("participation_ratio") > 3.0,
      s"PR=${ri.getAs[Double]("participation_ratio")}")
    assert(ri.getAs[Double]("effective_rank_frac") > 0.75)
    assert(ri.getAs[Boolean]("trace_ok"))
    // empty input: clear message
    val e = intercept[IllegalArgumentException] {
      Pca.isotropyReport(
        Seq((1L, null.asInstanceOf[Array[Float]]))
          .toDF("vec_id", "embedding"))
    }
    assert(e.getMessage.contains("no non-null vectors"))
  }

  test("determinism: same input, same model, bit for bit") {
    val rows = (0 until 60).map(i =>
      (i.toLong, Array.tabulate(5)(j =>
        math.sin(i * 3.1 + j * 1.3).toFloat)))
    val vecs = rows.toDF("vec_id", "embedding")
    val a = Pca.fit(vecs, k = 2)
    val b = Pca.fit(vecs.repartition(7), k = 2)
    // mean and explained agree across partitionings (scatter merge is
    // exact up to float addition order — compare at 1e-9)
    a.mean.zip(b.mean).foreach { case (x, y) =>
      assert(math.abs(x - y) < 1e-9) }
    a.components(0).zip(b.components(0)).foreach { case (x, y) =>
      assert(math.abs(x - y) < 1e-6) }
  }
}
