package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every operator claimed in SURVEY.md §2 appears in [[queries]]; each
  * SQL-expressible query also has a DuckDB oracle in [[oracleSql]] with
  * identical column names and decimal-exact arithmetic.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks
    * rows>0. Runs the full JSON request → analyze → plan pipeline. */
  def entry(spark: SparkSession): DataFrame =
    operators.SemanticQueries.run(operators.SemanticQueries.sem02Json)(
      spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    operators.Relational.queries ++ operators.TextOps.queries ++
      operators.Dedup.queries ++ operators.Similarity.queries ++
      operators.SemanticQueries.queries ++ operators.SketchQueries.queries ++
      operators.Extended.queries ++ operators.Sampling.queries ++
      operators.Events.queries ++ streaming.Streaming.queries ++
      operators.Pipeline.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    operators.Relational.oracle ++ operators.TextOps.oracle ++
      operators.Dedup.oracle ++ operators.Similarity.oracle ++
      operators.SemanticQueries.oracle ++ operators.SketchQueries.oracle ++
      operators.Extended.oracle ++ operators.Sampling.oracle ++
      operators.Events.oracle ++ streaming.Streaming.oracle ++
      operators.Pipeline.oracle
}
