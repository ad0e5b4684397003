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

  /** Write `df` range-partitioned and sorted by `sortCol` into `n`
    * files: each file then covers a narrow, near-disjoint slice of the
    * column's range, so its parquet footer min/max lets a selective
    * predicate skip the whole row group without decoding a page —
    * min/max (zone-map) pruning, the fourth layout lever beside
    * partitioning, bucketing, and runtime filters. Unlike Hive
    * partitioning this costs no directory explosion and composes with
    * it (partition by coarse key, range-sort within partitions by the
    * fine one). The write's range shuffle is the one-time layout
    * price, same as bucketing's. */
  def writeRangeSorted(df: DataFrame, path: String, n: Int,
      sortCol: String): Unit =
    df.repartitionByRange(n, col(sortCol))
      .sortWithinPartitions(sortCol)
      .write.mode("overwrite").parquet(path)

  /** Write `df` clustered on the Morton interleave of TWO columns
    * ([[graft.expressions.ZOrderValue]]) into `n` files: each file then
    * covers a near-square tile of the 2-D key space — ~1/sqrt(n) of
    * EACH column's range — so footer min/max stats skip most row
    * groups for a selective predicate on EITHER column. This is the
    * layout for a fact table with two independent hot filter columns,
    * where [[writeRangeSorted]]'s single-axis sort would leave the
    * second column unprunable. The one extra cost over a plain range
    * sort is a single (min, max) aggregate per column to fix the grid.
    * Both columns must be integral (cast dates/timestamps to long
    * first); null keys sort into the zval-null partition untiled, so
    * callers with nullable keys should filter or coalesce them. */
  def writeZOrdered(df: DataFrame, path: String, n: Int,
      colA: String, colB: String): Unit = {
    import org.apache.spark.sql.GraftSqlBridge
    val r = df.agg(min(colA), max(colA), min(colB), max(colB))
      .head()
    def lv(i: Int): Long = r.get(i) match {
      case null => 0L
      case x: Number => x.longValue()
    }
    val zcol = GraftSqlBridge.column(graft.expressions.ZOrderValue(
      GraftSqlBridge.expression(col(colA).cast("long")),
      GraftSqlBridge.expression(col(colB).cast("long")),
      lv(0), lv(1), lv(2), lv(3)))
    df.withColumn("__zval", zcol)
      .repartitionByRange(n, col("__zval"))
      .sortWithinPartitions("__zval")
      .drop("__zval")
      .write.mode("overwrite").parquet(path)
  }

  /** Per-row-group (min, max, rowCount) of a numeric-statted column
    * (INT32/INT64 physical — ints, longs, dates, timestamps), read
    * straight from the parquet footers of every part file under
    * `path`. This is the exact metadata the scan's row-group skip
    * consults, so asserting on it tests the pruning CONTRACT rather
    * than timing it. Driver-side by design: footers are O(files)
    * metadata, the same listing cost planning already pays. */
  def rowGroupRanges(spark: SparkSession, path: String,
      column: String): Seq[(Long, Long, Long)] = {
    import scala.jdk.CollectionConverters._
    val conf = spark.sessionState.newHadoopConf()
    val root = new org.apache.hadoop.fs.Path(path)
    val fs = root.getFileSystem(conf)
    fs.listStatus(root).toSeq
      .filter(_.getPath.getName.endsWith(".parquet"))
      .sortBy(_.getPath.getName)
      .flatMap { st =>
        val rd = org.apache.parquet.hadoop.ParquetFileReader.open(
          org.apache.parquet.hadoop.util.HadoopInputFile
            .fromPath(st.getPath, conf))
        try rd.getFooter.getBlocks.asScala.toSeq.map { block =>
          val col = block.getColumns.asScala
            .find(_.getPath.toDotString == column)
            .getOrElse(sys.error(
              s"rowGroupRanges: no column '$column' in ${st.getPath}"))
          val stats = col.getStatistics
          require(stats != null && stats.hasNonNullValue,
            s"rowGroupRanges: no min/max stats for '$column' in ${st.getPath}")
          (stats.genericGetMin.asInstanceOf[Number].longValue(),
            stats.genericGetMax.asInstanceOf[Number].longValue(),
            block.getRowCount)
        } finally rd.close()
      }
  }

  /** (overlapping, total) row-group counts for a closed-interval
    * predicate `[lo, hi]` on `column` — the fraction a min/max-pruned
    * scan of `path` actually decodes. */
  def overlappingRowGroups(spark: SparkSession, path: String,
      column: String, lo: Long, hi: Long): (Int, Int) = {
    val ranges = rowGroupRanges(spark, path, column)
    (ranges.count { case (mn, mx, _) => mx >= lo && mn <= hi },
      ranges.size)
  }

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
