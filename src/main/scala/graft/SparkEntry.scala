package graft

import graft.operators.Relational
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * All engine queries live in per-family registries ([[GraftQuery]] seqs);
  * this object is just the flattened driver-facing view. Column names are
  * aliased identically in the Spark code and the DuckDB oracle SQL because
  * the driver's compare sorts columns by name before hashing.
  */
object SparkEntry {

  /** Every registered query, in registry order. */
  def registry: Seq[GraftQuery] =
    Relational.all ++
      operators.Joins.all ++
      operators.VectorQueries.all ++
      operators.TextQueries.all ++
      operators.DedupQueries.all ++
      operators.CurationQueries.all ++
      operators.CveQueries.all ++
      operators.MultimodalQueries.all ++
      operators.LayoutQueries.all

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The reference's headline semantics (SURVEY.md §3.2): score-thresholded
    * top-k cosine retrieval joined back to metadata. */
  def entry(spark: SparkSession): DataFrame =
    operators.VectorQueries.flagship(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    registry.map(q => q.name -> q.run).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    registry.flatMap(q => q.oracle.map(sql => q.name -> sql)).toMap
}
