package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §2 for the inventory. */
object SparkEntry {

  /** Every registered capability, keyed as in SURVEY.md §2. */
  def registry: Map[String, QueryDef] =
    operators.Relational.defs ++
      operators.RelationalExt.defs ++
      operators.Cleaning.defs ++
      operators.Dwh.defs ++
      operators.Analytics.defs ++
      operators.GraphExt.defs ++
      operators.EventOps.defs ++
      operators.EventScience.defs ++
      operators.TextAnalysis.defs ++
      operators.Dedup.defs ++
      operators.Similarity.defs ++
      operators.Clustering.defs ++
      operators.Coreset.defs ++
      operators.Quantization.defs ++
      operators.Objectives.defs ++
      operators.Multimodal.defs ++
      operators.Quality.defs ++
      operators.Retrieval.defs ++
      operators.Sampling.defs ++
      operators.Tokenizer.defs ++
      operators.Lakehouse.defs ++
      operators.StatTests.defs ++
      operators.Inference.defs ++
      operators.CorpusExt.defs ++
      operators.Toxicity.defs ++
      operators.EventExt.defs ++
      operators.Scheduling.defs ++
      sources.Ingest.defs ++
      sources.ApiEnrich.defs

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    operators.Relational.q1Agg(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    registry.map { case (k, d) => k -> d.fn }

  /** DuckDB-equivalent SQL for each hash-checked query (rows-only ops omitted). */
  def oracleSql: Map[String, String] =
    registry.collect { case (k, QueryDef(_, Some(sql))) => k -> sql }
}
