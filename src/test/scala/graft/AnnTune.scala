package graft

import graft.core.{GraftSession, Tables}
import graft.operators.Similarity
import org.apache.spark.sql.functions._

/** Scratch tuning harness (test scope, not shipped): measures LSH / JL
  * recall@5 vs the exact x05 answer over a parameter grid at a given SF
  * dir, to pick scale-aware defaults. Run:
  *   SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 sbt "Test/runMain graft.AnnTune"
  */
object AnnTune {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.getOrCreate("ann-tune")
    val emb = Tables.load(spark, dir, "embeddings").cache()
    val n = emb.count()
    val queries = emb.filter(col("vec_id") < 20)
      .select(col("vec_id").as("query_id"), col("embedding").as("qvec")).cache()
    queries.count()
    val exact = SparkEntry.queries("x05_cosine_knn")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    println(s"n=$n exact=${exact.size}")

    def rec(df: org.apache.spark.sql.DataFrame): Double = {
      val s = df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      (exact intersect s).size.toDouble / exact.size
    }

    for (nc <- Seq(8, 16, 32); li <- Seq(3, 8); np <- Seq(1, 2, 4)) {
      val t0 = System.nanoTime()
      val idx = Similarity.ivfIndex(emb, nCentroids = nc, lloydIters = li)
      val r = rec(Similarity.ivfTopK(idx, queries, 5, nProbe = np))
      println(f"IVF nc=$nc lloyd=$li nProbe=$np recall=$r%.3f  (${(System.nanoTime()-t0)/1e9}%.1f s)")
    }
    for (t <- Seq(12, 16, 20, 24); b <- Seq(5, 6, 7)) {
      val t0 = System.nanoTime()
      val r = rec(Similarity.lshTopK(emb, queries, 5, nTables = t, bits = b))
      println(f"LSH tables=$t bits=$b recall=$r%.3f  (${(System.nanoTime()-t0)/1e9}%.1f s)")
    }
    for (c <- Seq(100, 200, 400, 800); od <- Seq(32, 40)) {
      val t0 = System.nanoTime()
      val r = rec(Similarity.jlTopK(emb, queries, 5, outDim = od, candidates = c))
      println(f"JL cand=$c outDim=$od recall=$r%.3f  (${(System.nanoTime()-t0)/1e9}%.1f s)")
    }
    spark.stop()
  }
}
