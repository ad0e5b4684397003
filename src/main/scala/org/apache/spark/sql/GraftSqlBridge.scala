package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge into `private[sql]` Column <-> Expression conversions (Spark
  * 4 split the public Column API from Catalyst). This is the standard
  * extension-library technique for registering custom expressions
  * without a SparkSessionExtensions round-trip. */
object GraftSqlBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)

  /** Wrap a logical plan back into a DataFrame on `s` — re-enters
    * analysis+optimization, which is how specs prove optimizer rules
    * are idempotent when a plan passes through the optimizer twice
    * (AQE re-optimization, nested-view reuse). */
  def ofRows(s: SparkSession,
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): DataFrame =
    classic.Dataset.ofRows(s.asInstanceOf[classic.SparkSession], plan)

  /** Re-tag a batch DataFrame's physical rows as a STREAMING frame —
    * what a V1 `Source.getBatch` must return so `MicroBatchExecution`
    * accepts the plan (the same `internalCreateDataFrame(isStreaming
    * = true)` trick Spark's own file stream source uses). The rows
    * are the batch plan's `toRdd`, so the micro-batch executes the
    * ordinary optimized scan. */
  def streamingFrame(df: DataFrame): DataFrame = {
    val ds = df.asInstanceOf[classic.Dataset[Row]]
    ds.sparkSession.internalCreateDataFrame(
      ds.queryExecution.toRdd, df.schema, isStreaming = true)
  }

  /** The inverse of [[streamingFrame]]: re-tag a V1 `Sink.addBatch`
    * micro-batch (streaming-tagged, not directly writable) as an
    * ordinary BATCH frame over the same physical rows, so a sink can
    * hand it to any batch writer. `toRdd` executes the micro-batch's
    * incremental plan once, exactly as `foreachBatch` would. */
  def batchFrame(df: DataFrame): DataFrame = {
    val ds = df.asInstanceOf[classic.Dataset[Row]]
    ds.sparkSession.internalCreateDataFrame(
      ds.queryExecution.toRdd, df.schema, isStreaming = false)
  }

  /** Stable unique id of a session for the life of the JVM — unlike an
    * identity hash, never reused after the session is GC'd. Falls back
    * to a class@identity tag for non-classic sessions (connect), where
    * cache staleness is the caller's concern anyway. */
  def sessionKey(s: SparkSession): String = s match {
    case c: classic.SparkSession => c.sessionUUID
    case other => s"${other.getClass.getName}@${System.identityHashCode(other)}"
  }
}
