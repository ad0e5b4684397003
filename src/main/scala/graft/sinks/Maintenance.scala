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
  * Crash-safety protocol (shared with the ANN index compactor,
  * [[graft.vector.IvfPq.compact]], via [[writeAndSwap]]): write the
  * compacted copy fully to a sibling temp dir, then swap by two
  * renames. An interruption before the first rename leaves the live
  * table untouched; between the renames the previous table sits under
  * `.precompact` and [[recoverPrecompact]] — run by every swap entry
  * point AND the streaming sinks' table reads — renames it back before
  * anything else happens. Assumes a quiet window (no concurrent
  * readers/appenders mid-swap) and rename-atomic storage; on object
  * stores schedule accordingly.
  *
  * Content is preserved row-for-row: `sortCols` (when given) only fixes
  * file-internal row order so recompaction is deterministic and range
  * metadata (min/max zone maps) stays tight for readers that filter on
  * those columns.
  */
object Maintenance {

  private def fsOf(spark: SparkSession, path: String)
      : (org.apache.hadoop.fs.FileSystem, org.apache.hadoop.fs.Path) = {
    val p = new org.apache.hadoop.fs.Path(path)
    (p.getFileSystem(spark.sessionState.newHadoopConf()), p)
  }

  /** Repair the crash states the rename-swap protocol can leave
    * behind. Three are possible, distinguished by what exists:
    *
    *  - live present, no `.precompact`: healthy (a stray `.compacting`
    *    from a pre-swap crash is inert; the next swap deletes it);
    *  - live ABSENT, `.precompact` present: crash BETWEEN the two
    *    renames — the previous table is the only complete copy, and
    *    treating the path as empty would silently lose the whole
    *    table (a dedup sink would re-admit everything, and a later
    *    compaction's cleanup would then delete the stranded copy
    *    forever). Rename it back.
    *  - live present AND `.precompact` present: crash AFTER the
    *    second rename but before cleanup — the live table is the
    *    finished compaction; the leftover is a stale duplicate.
    *    Delete it, or every future existence check stays ambiguous.
    *
    * Returns true iff a missing live table was restored. Idempotent
    * and cheap (two existence probes) — safe on every sink batch. */
  def recoverPrecompact(spark: SparkSession, path: String): Boolean = {
    val (fs, live) = fsOf(spark, path)
    val old = new org.apache.hadoop.fs.Path(s"$path.precompact")
    if (!fs.exists(old)) false
    else if (fs.exists(live)) { fs.delete(old, true); false }
    else {
      require(fs.rename(old, live),
        s"recoverPrecompact: found interrupted compaction of $path " +
          s"but could not restore $old — fix storage before reading")
      true
    }
  }

  /** The single implementation of the crash-safe swap: `write` the
    * replacement layout fully into a sibling `.compacting` dir, then
    * swap it in (live → `.precompact`, temp → live) and drop the old
    * copy. Runs [[recoverPrecompact]] first, so a swap attempted on a
    * mid-crash table repairs it instead of deleting the only copy.
    * Both compactors ([[compactParquet]], [[graft.vector.IvfPq
    * .compact]]) are thin wrappers — the crash-safety contract has
    * exactly one implementation. */
  private[graft] def writeAndSwap(spark: SparkSession, path: String)
      (write: String => Unit): Unit = {
    val (fs, live) = fsOf(spark, path)
    recoverPrecompact(spark, path)
    require(fs.exists(live), s"writeAndSwap: no table at $path")
    val tmp = new org.apache.hadoop.fs.Path(s"$path.compacting")
    val old = new org.apache.hadoop.fs.Path(s"$path.precompact")
    fs.delete(tmp, true)
    write(tmp.toString)
    // carry over underscore SIDE entries (e.g. a scored posting
    // table's `_stats`, a CMS table's `_applied`): `spark.read` skips
    // them, so a rewrite never reproduces them, and losing them in
    // the swap would silently break the table's readers. COPY, not
    // rename — live must stay complete until the renames commit.
    // `_SUCCESS` is excluded (the tmp write makes its own); anything
    // the writer already put in tmp wins.
    val conf = spark.sessionState.newHadoopConf()
    fs.listStatus(live).foreach { st =>
      val n = st.getPath.getName
      val dst = new org.apache.hadoop.fs.Path(tmp, n)
      if (n.startsWith("_") && n != "_SUCCESS" && !fs.exists(dst))
        org.apache.hadoop.fs.FileUtil.copy(fs, st.getPath, fs, dst,
          false, conf)
    }
    require(fs.rename(live, old),
      s"writeAndSwap: could not move $path aside")
    require(fs.rename(tmp, live),
      s"writeAndSwap: could not swap in $tmp")
    fs.delete(old, true)
  }

  /** Rewrite the FLAT parquet table at `path` into
    * `max(minFiles, ceil(tableBytes / targetFileBytes))` files (at
    * least one). Returns the file count before compaction (callers
    * log/alert on it).
    *
    * Flat tables ONLY: a Hive-partitioned layout read through
    * `spark.read.parquet(root)` infers the partition column from the
    * directory names and a flat rewrite would persist it as a DATA
    * column — silently changing the schema and destroying partition
    * pruning for every reader. Refused loudly; partitioned layouts go
    * through [[compactPartitioned]] (per-leaf, layout-preserving), and
    * the bucket-partitioned ANN index through
    * [[graft.vector.IvfPq.compact]].
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
    val (fs, live) = fsOf(spark, path)
    recoverPrecompact(spark, path)
    require(fs.exists(live), s"compactParquet: no table at $path")
    // count DATA files only (skip _SUCCESS and other marker files —
    // they are not a per-read cost and would skew the reported count)
    var nFiles = 0L
    var tableBytes = 0L
    fs.listStatus(live).foreach { st =>
      val n = st.getPath.getName
      if (!n.startsWith("_") && !n.startsWith(".")) {
        require(!st.isDirectory,
          s"compactParquet: subdirectory '$n' under $path — this " +
            "compactor is flat-table-only (a partitioned layout would " +
            "be flattened, its partition column rewritten as a data " +
            "column); use compactPartitioned for Hive layouts or " +
            "IvfPq.compact for bucket-partitioned indexes")
        nFiles += 1
        tableBytes += st.getLen
      }
    }
    // a directory with no data files (only markers — e.g. a sink that
    // has appended nothing but empty frames) has nothing to compact,
    // and reading it would fail schema inference
    if (nFiles == 0) return 0L
    val nOut = math.max(minFiles.toLong,
      (tableBytes + targetFileBytes - 1) / targetFileBytes).toInt
    writeAndSwap(spark, path) { tmp =>
      val df = spark.read.parquet(path).repartition(nOut)
      val sorted =
        if (sortCols.isEmpty) df
        else df.sortWithinPartitions(sortCols.map(col): _*)
      sorted.write.mode("overwrite").parquet(tmp)
    }
    nFiles
  }

  /** Layout-preserving compaction for a Hive-partitioned table
    * (`root/part=v1/`, `root/part=v1/sub=v2/`, …): every LEAF
    * partition directory is itself a flat parquet table, so each leaf
    * gets its own [[compactParquet]] pass — same crash-safe swap, same
    * sizing — while the directory tree (and with it the partition
    * columns and partition pruning) is never touched. Reading a leaf
    * directly never re-infers the partition column, so rows keep
    * exactly their data columns; the directory name keeps carrying the
    * partition value. This closes the gap [[compactParquet]] refuses
    * loudly (a flat rewrite of the root would flatten the layout).
    *
    * `minFilesPerLeaf` defaults to 1 — unlike a hot FLAT table, a
    * partitioned table's scan parallelism comes from its partition
    * count, so single-file leaves do not serialize whole-table scans
    * (only single-PARTITION scans, which partition pruning makes the
    * common fast path anyway). Leaves at or under `skipAtOrUnderFiles`
    * files are left alone: compaction is for resetting append-driven
    * file-count growth, and rewriting an already-compact leaf is pure
    * write amplification — on a 100 TB table with thousands of
    * partitions, the skip turns a full-table rewrite into a touch of
    * only the partitions a sink actually appended to.
    *
    * Returns (leaves compacted, data files before compaction across
    * them). Crash mid-run leaves every completed leaf compacted, the
    * in-flight leaf recoverable by [[recoverPrecompact]] (which the
    * per-leaf swap runs first), and the remaining leaves untouched —
    * re-running converges. */
  def compactPartitioned(spark: SparkSession, root: String,
      targetFileBytes: Long = 128L << 20,
      sortCols: Seq[String] = Nil,
      minFilesPerLeaf: Int = 1,
      skipAtOrUnderFiles: Int = 1): (Long, Long) = {
    val (fs, rootPath) = fsOf(spark, root)
    require(fs.exists(rootPath), s"compactPartitioned: no table at $root")
    // FIRST, repair swap debris from a previous run that crashed
    // mid-leaf: a `<leaf>.precompact` sibling is either the only
    // complete copy of a leaf whose swap died between renames (restore
    // it) or a stale duplicate after the second rename (delete it) —
    // recoverPrecompact distinguishes the two. A `<leaf>.compacting`
    // dir is always a dead partial write. Without this sweep the leaf
    // enumeration below would treat BOTH as partition directories:
    // the crashed leaf would never be restored, and a root read would
    // invent partition values like 'year=2024.precompact' with
    // duplicated rows.
    def repair(dir: org.apache.hadoop.fs.Path): Unit =
      fs.listStatus(dir).foreach { st =>
        val n = st.getPath.getName
        if (st.isDirectory && !n.startsWith("_") && !n.startsWith(".")) {
          if (n.endsWith(".compacting")) fs.delete(st.getPath, true)
          else if (n.endsWith(".precompact"))
            recoverPrecompact(spark, st.getPath.toString
              .stripSuffix(".precompact"))
          else repair(st.getPath)
        }
      }
    repair(rootPath)
    // collect leaf partition dirs: directories containing data files.
    // Hive layouts never mix data files and partition subdirs in one
    // directory — refuse loudly if this one does (compacting such a
    // leaf flat would orphan the subdirs' rows from the leaf's copy).
    def leaves(dir: org.apache.hadoop.fs.Path)
        : Seq[org.apache.hadoop.fs.Path] = {
      val entries = fs.listStatus(dir).filterNot { st =>
        val n = st.getPath.getName
        n.startsWith("_") || n.startsWith(".")
      }
      val (dirs, files) = entries.partition(_.isDirectory)
      if (files.nonEmpty) {
        require(dirs.isEmpty,
          s"compactPartitioned: $dir mixes data files and " +
            "subdirectories — not a Hive-partitioned layout")
        Seq(dir)
      } else dirs.toSeq.flatMap(d => leaves(d.getPath))
    }
    val leafDirs =
      if (fs.listStatus(rootPath).exists(st => st.isDirectory &&
          !st.getPath.getName.startsWith("_") &&
          !st.getPath.getName.startsWith("."))) leaves(rootPath)
      else Seq(rootPath) // flat table: degrade to one leaf
    var leavesCompacted = 0L
    var filesBefore = 0L
    leafDirs.foreach { leaf =>
      val nData = fs.listStatus(leaf).count { st =>
        val n = st.getPath.getName
        !st.isDirectory && !n.startsWith("_") && !n.startsWith(".")
      }
      if (nData > skipAtOrUnderFiles) {
        filesBefore += compactParquet(spark, leaf.toString,
          targetFileBytes, sortCols, minFilesPerLeaf)
        leavesCompacted += 1
      }
    }
    (leavesCompacted, filesBefore)
  }
}
