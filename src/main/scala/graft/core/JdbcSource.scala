package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}

/** JDBC dimension/fact sources — the code path standing in for the
  * reference's Oracle/Presto/Postgres/BigQuery executors
  * (oracle/.../OracleQueryExecutor.scala:18-125 etc.): where maha keeps
  * one executor per engine rendering engine-specific SQL, here every
  * external engine is just `spark.read.jdbc` producing the same
  * DataFrame the parquet loaders produce — one engine downstream.
  *
  * Scale notes baked into the API:
  *  - a SMALL dimension reads unpartitioned (one round-trip) and is
  *    broadcast into fact joins;
  *  - a LARGE table must read range-partitioned (partitionColumn /
  *    lowerBound / upperBound / numPartitions) so executors pull
  *    disjoint slices in parallel instead of one connection streaming
  *    everything through the driver;
  *  - filters and column pruning push into the remote engine as SQL
  *    (visible as PushedFilters on the JDBCRelation scan).
  */
object JdbcSource {

  /** Small dimension table: single-partition read, broadcast-ready. */
  def dim(s: SparkSession, url: String, table: String,
      props: java.util.Properties = new java.util.Properties): DataFrame =
    s.read.jdbc(url, table, props)

  /** Large table: range-partitioned parallel read. */
  def partitioned(s: SparkSession, url: String, table: String,
      partitionColumn: String, lowerBound: Long, upperBound: Long,
      numPartitions: Int,
      props: java.util.Properties = new java.util.Properties): DataFrame =
    s.read.jdbc(url, table, partitionColumn, lowerBound, upperBound,
      numPartitions, props)
}
