package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Tables

/** The user-facing corpus-preparation entry point: one DataFrame program
  * composing the training-data stages this library provides —
  *
  *   1. held-out exclusion: reference (eval) slices never enter the
  *      training corpus;
  *   2. length gating (too-short documents);
  *   3. exact deduplication (min-id keeper wins);
  *   4. train/test decontamination (k-token span overlap with the
  *      reference slice, see [[Dedup.decontaminate]]).
  *
  * Instead of silently deleting rows, `prepare` returns EVERY input
  * document with a `drop_reason` column (null = kept) — the provenance
  * shape a data pipeline audits, samples, and re-runs with different
  * thresholds without re-reading the corpus. Reasons apply in the
  * precedence listed above; exactly one is reported.
  *
  * Scale shape: the length gate is a narrow projection; dedup is one
  * hash aggregate on the content key plus an equi-join back (at 100 TB
  * both sides would key on xxhash64(text) to keep the shuffle narrow —
  * kept as the raw text here so the report is cross-engine exact);
  * decontamination broadcasts the reference's distinct grams. Nothing
  * shuffles the corpus more than once per stage, and no stage is
  * quadratic.
  */
object DocPrep {

  def prepare(docs: DataFrame, refSources: Seq[String] = Seq("src0", "src1"),
              minTokens: Int = 40, k: Int = 4): DataFrame = {
    val isRef = col("source").isin(refSources.map(x => x: Any): _*)
    val withTok = docs.withColumn("n_tokens",
      size(TextAnalysis.wsTokens(col("text"))).cast("long"))
    val keepers = docs.groupBy(col("text")).agg(min(col("doc_id")).as("keep_id"))
    val contaminated = Dedup
      .decontaminate(docs.filter(!isRef), docs.filter(isRef), k)
      .filter(col("n_hit_spans") >= 1)
      .select(col("doc_id"), lit(true).as("contam"))
    withTok
      .join(keepers, Seq("text"), "left")
      .join(contaminated, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_tokens"),
        when(isRef, "reference")
          .when(col("n_tokens") < minTokens, "too_short")
          .when(col("doc_id") =!= col("keep_id"), "duplicate")
          .when(col("contam"), "contaminated")
          .as("drop_reason"))
  }

  def prepQuery(spark: SparkSession, dir: String): DataFrame =
    prepare(Tables.load(spark, dir, "documents")).orderBy(col("doc_id"))
}
