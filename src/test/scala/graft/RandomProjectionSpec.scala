package graft

import org.apache.spark.sql.functions._

import graft.pipeline.Similarity

/** JL random projection: the distance-preservation property that
  * justifies projecting before the quadratic ANN stages, plus edge
  * handling.
  */
class RandomProjectionSpec extends SparkSuite {

  private def emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    .select(col("vec_id"), col("embedding").cast("array<double>").as("emb"))

  test("pairwise distances survive 64 -> 16 within JL-plausible distortion") {
    val r = Similarity.randomProjection(emb, "emb", "rp", dims = 64, k = 16)
    val rows = r.select("emb", "rp").limit(60).collect()
      .map(x => (x.getSeq[Double](0).toArray, x.getSeq[Double](1).toArray))
    def dist(a: Array[Double], b: Array[Double]) =
      math.sqrt(a.indices.map(i => (a(i) - b(i)) * (a(i) - b(i))).sum)
    val ratios = for {
      i <- rows.indices; j <- (i + 1) until rows.length
      d0 = dist(rows(i)._1, rows(j)._1) if d0 > 1e-9
    } yield dist(rows(i)._2, rows(j)._2) / d0
    // k=16 gives loose per-pair bounds; the MEDIAN ratio must sit
    // near 1 (unbiasedness) and no pair may collapse to ~0
    val sorted = ratios.sorted
    val median = sorted(sorted.length / 2)
    assert(median > 0.7 && median < 1.3, s"median distortion $median")
    assert(sorted.head > 0.05, s"a pair collapsed: ${sorted.head}")
  }

  test("null vectors stay null; wrong dimensionality fails loudly") {
    val s = spark; import s.implicits._
    val df = Seq((1L, Some(Seq(1.0, 2.0, 3.0, 4.0))), (2L, None))
      .toDF("id", "v")
    val ok = Similarity.randomProjection(df, "v", "rp", dims = 4, k = 2)
    val got = ok.orderBy("id").collect()
    assert(got(0).getSeq[Double](2).length == 2)
    assert(got(1).isNullAt(2))
    val bad = Similarity.randomProjection(df.where(col("id") === 1), "v", "rp", dims = 5, k = 2)
    val e = intercept[Exception] { bad.collect() }
    assert(e.getMessage != null)
  }
}
