package graft.sinks

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col

/** Layout maintenance for long-lived append-target parquet tables.
  *
  * The streaming sinks ([[graft.streaming.Streams.dedupSinkWriter]],
  * `nearDupSinkWriter`) append ONE file per micro-batch to the tables
  * they also re-scan each batch (fingerprints, LSH bands, corpus), so
  * file count grows linearly with batches. At micro-batch cadence that
  * is thousands of files per day, and per-file listing + footer
  * overhead — not bytes — becomes the dominant per-batch cost
  * (measured: the 200-batch admission probe in STREAMBENCH.md, where
  * un-coalesced multi-file appends doubled steady-state batch time).
  * Periodic compaction during a quiet window resets that term.
  *
  * Same crash-safety dance as the ANN index compactor
  * ([[graft.vector.IvfPq.compact]]): write the compacted copy fully to
  * a sibling temp dir, then swap by two renames. An interruption before
  * the first rename leaves the live table untouched; between the
  * renames the previous table is intact under `.precompact`. Assumes a
  * quiet window (no concurrent readers/appenders mid-swap) and
  * rename-atomic storage; on object stores schedule accordingly.
  *
  * Content is preserved row-for-row: `sortCols` (when given) only fixes
  * file-internal row order so recompaction is deterministic and range
  * metadata (min/max zone maps) stays tight for readers that filter on
  * those columns.
  */
object Maintenance {

  /** Rewrite the parquet table at `path` into
    * `max(minFiles, ceil(tableBytes / targetFileBytes))` files (at
    * least one). Returns the file count before compaction (callers
    * log/alert on it).
    *
    * `minFiles` matters whenever the table is HOT — re-scanned per
    * micro-batch by a sink, probed per query: a table under
    * `targetFileBytes` compacts to ONE file, which is ONE input split
    * (a single-row-group parquet file cannot be split), so every later
    * scan of it runs single-threaded no matter the cluster. Measured:
    * the 200-batch admission probe with a naive one-file cadence ran
    * SLOWER late-stream than no compaction at all — file-count cost
    * fell but the growing band-table scan serialized. Hot-table
    * callers pass `defaultParallelism`; archive-style tables keep 1. */
  def compactParquet(spark: SparkSession, path: String,
      targetFileBytes: Long = 128L << 20,
      sortCols: Seq[String] = Nil,
      minFiles: Int = 1): Long = {
    require(targetFileBytes > 0, "targetFileBytes must be positive")
    require(minFiles >= 1, "minFiles must be at least 1")
    val conf = spark.sessionState.newHadoopConf()
    val live = new org.apache.hadoop.fs.Path(path)
    val fs = live.getFileSystem(conf)
    require(fs.exists(live), s"compactParquet: no table at $path")
    // count DATA files only (skip _SUCCESS and other marker files —
    // they are not a per-read cost and would skew the reported count)
    var nFiles = 0L
    var tableBytes = 0L
    val it = fs.listFiles(live, true)
    while (it.hasNext) {
      val f = it.next()
      val n = f.getPath.getName
      if (!n.startsWith("_") && !n.startsWith(".")) {
        nFiles += 1
        tableBytes += f.getLen
      }
    }
    // a directory with no data files (only markers — e.g. a sink that
    // has appended nothing but empty frames) has nothing to compact,
    // and reading it would fail schema inference
    if (nFiles == 0) return 0L
    val nOut = math.max(minFiles.toLong,
      (tableBytes + targetFileBytes - 1) / targetFileBytes).toInt
    val tmp = new org.apache.hadoop.fs.Path(s"$path.compacting")
    val old = new org.apache.hadoop.fs.Path(s"$path.precompact")
    fs.delete(tmp, true)
    fs.delete(old, true)
    val df = spark.read.parquet(path).repartition(nOut)
    val sorted =
      if (sortCols.isEmpty) df
      else df.sortWithinPartitions(sortCols.map(col): _*)
    sorted.write.mode("overwrite").parquet(tmp.toString)
    require(fs.rename(live, old),
      s"compactParquet: could not move $path aside")
    require(fs.rename(tmp, live),
      s"compactParquet: could not swap in $tmp")
    fs.delete(old, true)
    nFiles
  }
}
