package graft.layout

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Physical-layout utilities for the 100 TB deployment shape
  * (SURVEY.md §4): partition pruning, bucketed co-located joins, and
  * skew salting. These decide how much data a query TOUCHES — at scale
  * they matter more than any per-row optimization.
  */
object Layout {

  /** Write a table partitioned by a derived column (e.g.
    * `year(date_published)`): date-range queries then prune whole
    * directories at planning time (PartitionFilters in the scan), so a
    * one-year query over a 100 TB / 20-year table reads ~5 TB. */
  def writePartitioned(df: DataFrame, path: String, partCol: String,
      partExpr: Column): Unit =
    df.withColumn(partCol, partExpr)
      .write.mode("overwrite").partitionBy(partCol).parquet(path)

  /** Write both sides of a recurring equi-join bucketed AND sorted on
    * the join key: Spark then plans a sort-merge join with NO exchange
    * and NO sort on either side — the shuffle is paid once at layout
    * time instead of per query. Requires the session catalog (bucket
    * metadata lives in the table definition, not the files). */
  def writeBucketed(df: DataFrame, table: String, key: String,
      buckets: Int): Unit =
    df.write.mode("overwrite")
      .bucketBy(buckets, key).sortBy(key)
      .format("parquet").saveAsTable(table)

  /** Salted equi-join for skewed keys — see
    * [[graft.operators.Joins.saltedJoin]], the single implementation
    * (deterministic salt from a caller-named unique left column,
    * registry-exposed as q85). AQE's skew-join handles moderate skew
    * automatically; explicit salting is for the pathological single-key
    * case (one key = half the table). */
  def saltedJoin(left: DataFrame, right: DataFrame, key: String,
      saltBy: String, salts: Int): DataFrame =
    graft.operators.Joins.saltedJoin(left, right, key, saltBy, salts)

  /** True when the executed plan of `df` contains no shuffle exchange —
    * the check that a bucketed join actually co-located. */
  def isShuffleFree(df: DataFrame): Boolean =
    !df.queryExecution.executedPlan.toString.contains("Exchange hashpartitioning")

  /** Scan predicate pushdown report: (PartitionFilters, PushedFilters)
    * lines of the executed plan, for asserting pruning in tests. */
  def scanFilters(df: DataFrame): String = {
    val plan = df.queryExecution.executedPlan.toString
    plan.linesIterator
      .filter(l => l.contains("PartitionFilters") || l.contains("PushedFilters"))
      .mkString("\n")
  }
}
