package graft.llmops

import graft.{SparkTestBase, Tables}
import org.apache.spark.sql.functions._

class OpqSpec extends SparkTestBase {
  import spark.implicits._

  lazy val emb = Tables.embeddings(spark, sf0001).cache()
  lazy val q = emb.filter($"vec_id" < 5)
    .select($"vec_id".as("query_id"), $"embedding".as("query_vec"))

  /** d=8 corpus whose variance lives on directions that straddle PQ
    * subspace boundaries: z dims 0–3 sit on a 5-level lattice (dims
    * 4–7 are near-zero noise), then a fixed Hadamard rotation smears
    * every lattice dim across ALL coordinates. With m=8 / dsub=1
    * subspaces, the unmixed axes are 5-valued discrete (k=8 codewords
    * quantize them near-exactly) while the mixed axes are dense
    * lattice mixtures k=8 cannot cover. Plain PQ is stuck with the
    * mixed axes; OPQ can learn the unmixing rotation.
    */
  lazy val mixed = {
    val rnd = new scala.util.Random(42)
    // H8: entries ±1/√8, rows orthonormal (Sylvester construction)
    val s = (1.0 / math.sqrt(8)).toFloat
    val h = Array.tabulate(8, 8)((i, j) =>
      if (Integer.bitCount(i & j) % 2 == 0) s else -s)
    val scales = Array(2.5f, 2f, 1.5f, 1f) // distinct spectrum, as real
    val rows = (0L until 400L).map { id =>  // embedding spectra decay
      val z = Array.tabulate(8)(i =>
        if (i < 4) (rnd.nextInt(5) - 2) * scales(i) + rnd.nextFloat() * 0.1f
        else rnd.nextFloat() * 0.1f)
      val x = Array.tabulate(8)(i =>
        (0 until 8).map(j => h(i)(j) * z(j)).sum)
      (id, x)
    }
    rows.toDF("vec_id", "embedding").cache()
  }

  test("mat_vec applies the matrix; identity is exact; dim mismatch nulls") {
    val mat = Array(Array(1f, 2f), Array(0f, -1f))
    val out = Seq((1L, Array(3f, 4f))).toDF("id", "v")
      .select(Opq.mat_vec($"v", mat).as("r"))
      .head().getSeq[Float](0)
    assert(out == Seq(11f, -4f))

    val id4 = Opq.identityRotation(4)
    val v = Array(0.5f, -1.25f, 3e-7f, 42f)
    val round = Seq((1L, v)).toDF("id", "v")
      .select(Opq.mat_vec($"v", id4).as("r"))
      .head().getSeq[Float](0)
    assert(round == v.toSeq, "identity rotation must be bit-exact")

    val bad = Seq((1L, Array(1f, 2f, 3f))).toDF("id", "v")
      .select(Opq.mat_vec($"v", mat).as("r"))
      .head()
    assert(bad.isNullAt(0), "dim mismatch must null, not truncate")
  }

  test("opqIters = 0 degenerates to plain PQ exactly") {
    val (rot, books) = Opq.trainOpq(emb, m = 8, k = 16,
      pqIters = 1, opqIters = 0, init = "identity")
    assert(rot.indices.forall(i => rot(i).indices.forall(j =>
      rot(i)(j) == (if (i == j) 1f else 0f))), "opqIters=0 must return I")
    val viaOpq = Opq.opqTopKWithModels(emb, q, k = 5, rot, books)
      .orderBy($"query_id", $"rk").collect().toSeq
    val viaPq = Ivf.pqTopKWithBooks(emb, q, k = 5, books)
      .orderBy($"query_id", $"rk").collect().toSeq
    assert(viaOpq == viaPq)
  }

  test("trained rotation is orthogonal") {
    val (rot, _) = Opq.trainOpq(emb, m = 8, k = 16,
      pqIters = 1, opqIters = 2)
    val d = rot.length
    assert(d == 64)
    for (i <- 0 until d; j <- 0 until d) {
      val dot = (0 until d).map(t => rot(t)(i).toDouble * rot(t)(j)).sum
      val expect = if (i == j) 1.0 else 0.0
      assert(math.abs(dot - expect) < 1e-3,
        s"RtR($i,$j) = $dot, expected $expect")
    }
  }

  test("OPQ beats plain PQ on cross-subspace-correlated data") {
    val m = 8; val k = 8
    val pqBooks = Ivf.pqCodebooks(mixed, m, k, iters = 3)
    val pqMse = Opq.reconstructionMse(mixed, Opq.identityRotation(8), pqBooks)
    val (rot, books) = Opq.trainOpq(mixed, m, k, pqIters = 3, opqIters = 6)
    val opqMse = Opq.reconstructionMse(mixed, rot, books)
    assert(opqMse < pqMse * 0.5,
      s"OPQ should cut reconstruction MSE on mixed data: opq=$opqMse pq=$pqMse")
  }

  test("rotation preserves inner products (orthogonality in the scan)") {
    val (rot, _) = Opq.trainOpq(emb, m = 8, k = 16,
      pqIters = 1, opqIters = 1)
    val pairs = emb.filter($"vec_id" < 20)
      .select($"vec_id", $"embedding",
        Opq.mat_vec($"embedding", rot).as("rot"))
      .collect()
    pairs.foreach { r =>
      val x = r.getSeq[Float](1); val rx = r.getSeq[Float](2)
      val raw = x.map(v => v.toDouble * v).sum
      val rotN = rx.map(v => v.toDouble * v).sum
      assert(math.abs(raw - rotN) < 1e-3 * math.max(raw, 1.0),
        s"norm not preserved for vec ${r.getLong(0)}: $raw vs $rotN")
    }
  }

  test("OPQ models round-trip through parquet and serve identically") {
    val (rot, books) = Opq.trainOpq(emb, m = 8, k = 16,
      pqIters = 1, opqIters = 1)
    val dir = java.nio.file.Files.createTempDirectory("opq-model").toString
    Models.saveOpq(spark, dir, rot, books)
    val (rot2, books2) = Models.loadOpq(spark, dir)
    assert(rot2.map(_.toSeq).toSeq == rot.map(_.toSeq).toSeq)
    assert(books2.map(_.map(_.toSeq).toSeq).toSeq ==
      books.map(_.map(_.toSeq).toSeq).toSeq)
    val served = Opq.opqTopKWithModels(emb, q, k = 5, rot2, books2)
      .orderBy($"query_id", $"rk").collect().toSeq
    val inMem = Opq.opqTopKWithModels(emb, q, k = 5, rot, books)
      .orderBy($"query_id", $"rk").collect().toSeq
    assert(served == inMem, "persisted-model serve must be bit-identical")
  }
}
