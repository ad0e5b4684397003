package graft.sinks

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** A minimal manifest-backed table: versioned snapshots over immutable
  * data directories, with atomic commits by rename — the metadata
  * pattern behind every modern table format (Iceberg/Delta/Hudi),
  * reduced to the part a 100 TB pipeline cannot do without.
  *
  * Why a manifest at scale: a plain parquet directory makes EVERY scan
  * pay an O(files) recursive listing before planning starts — at
  * micro-batch append cadence that is millions of files, and on object
  * stores each LIST is a metered RPC. A manifest inverts the
  * dependency: the reader consults ONE small versioned file list (the
  * newest `manifest/v*` parquet, itself found by listing a
  * directory whose size is the snapshot count, bounded by [[vacuum]]),
  * and plans directly against the exact data directories of that
  * snapshot. Appends never rewrite data: each commit adds one
  * immutable `data/c%08d` directory and a NEW manifest that is the old
  * list plus one entry (copy-on-write metadata, like Iceberg's).
  *
  * Guarantees (single writer, standard streaming-sink ownership):
  *  - COMMIT IS ATOMIC: the manifest parquet is written fully to a
  *    `.tmp-` sibling and renamed into place; a reader lists either
  *    the old max version or the new one, never a partial commit.
  *  - SNAPSHOT ISOLATION: data dirs are immutable and a resolved
  *    snapshot references only dirs that existed at its commit, so a
  *    reader holding version v sees exactly v's rows no matter how
  *    many appends/compactions land meanwhile. [[readVersion]] is
  *    time travel to any un-vacuumed snapshot.
  *  - CRASH SAFETY: a crash after the data write but before the
  *    manifest rename leaves an ORPHAN data dir no manifest
  *    references — invisible to every reader; the next append at that
  *    version deletes and rewrites it, and [[vacuum]] reaps any
  *    stragglers. A crash mid-manifest-write leaves only a `.tmp-`
  *    dir, ignored by version listing and cleaned on the next commit.
  *  - [[compact]] is a METADATA swap: rewrite current content into
  *    one new data dir and commit a manifest pointing at it; older
  *    snapshots keep reading their original dirs until [[vacuum]]
  *    drops them (retention is an explicit choice, not a side effect).
  */
object ManifestTable {

  private def fsOf(spark: SparkSession, path: String)
      : (org.apache.hadoop.fs.FileSystem, org.apache.hadoop.fs.Path) = {
    val p = new org.apache.hadoop.fs.Path(path)
    (p.getFileSystem(spark.sessionState.newHadoopConf()), p)
  }

  private def vName(v: Long): String = f"v$v%08d"
  private def cName(v: Long): String = f"c$v%08d"

  /** Committed snapshot versions at `path`, ascending (empty for a
    * fresh or absent table). */
  def versions(spark: SparkSession, path: String): Seq[Long] = {
    val (fs, _) = fsOf(spark, path)
    val m = new org.apache.hadoop.fs.Path(s"$path/manifest")
    if (!fs.exists(m)) Seq.empty
    else fs.listStatus(m).toSeq
      .map(_.getPath.getName)
      // parse by shape, not length: vName pads to 8 digits but grows
      // past them (version 1e8+ must stay visible or append clobbers
      // a committed snapshot and then deadlocks on the rename)
      .filter(n => n.length > 1 && n.startsWith("v") &&
        n.drop(1).forall(_.isDigit))
      .map(_.drop(1).toLong).sorted
  }

  def latestVersion(spark: SparkSession, path: String): Option[Long] =
    versions(spark, path).lastOption

  /** One manifest entry: a data dir, the commit tag that added it
    * (streaming batch watermark; -1 for batch appends), and optional
    * min/max stats of one long-castable column for dir-level pruning. */
  final case class Entry(dir: String, tag: Long, statCol: String,
      statMin: java.lang.Long, statMax: java.lang.Long)

  private def entriesOf(spark: SparkSession, path: String,
      v: Long): Seq[Entry] = {
    import spark.implicits._
    spark.read.parquet(s"$path/manifest/${vName(v)}")
      .select("dir", "tag", "statCol", "statMin", "statMax")
      .as[(String, Long, Option[String], Option[Long], Option[Long])]
      .collect().sortBy(_._1)
      .map(t => Entry(t._1, t._2, t._3.orNull,
        t._4.map(Long.box).orNull, t._5.map(Long.box).orNull)).toSeq
  }

  /** The data directories snapshot `v` references (absolute paths). */
  private def dirsOf(spark: SparkSession, path: String,
      v: Long): Seq[String] =
    entriesOf(spark, path, v).map(e => s"$path/data/${e.dir}")

  private def hasDataFiles(fs: org.apache.hadoop.fs.FileSystem,
      dir: String): Boolean = {
    val p = new org.apache.hadoop.fs.Path(dir)
    fs.exists(p) && fs.listStatus(p).exists { st =>
      val n = st.getPath.getName
      !n.startsWith("_") && !n.startsWith(".")
    }
  }

  /** The ONE read path for a dir selection: skips file-less dirs
    * (empty-batch commits write dirs Spark cannot infer a schema
    * from), and when the selection is empty (or all file-less)
    * returns an empty frame with the snapshot's schema, derived from
    * any readable dir of the snapshot. Shared by [[readVersion]],
    * [[readPruned]], and [[readSince]] so the empty/file-less edge
    * cases have exactly one implementation. */
  private def readDirs(spark: SparkSession, path: String,
      snapshot: Seq[Entry], selected: Seq[Entry]): DataFrame = {
    val (fs, _) = fsOf(spark, path)
    val sel = selected.map(e => s"$path/data/${e.dir}")
      .filter(hasDataFiles(fs, _))
    if (sel.nonEmpty) spark.read.parquet(sel: _*)
    else {
      val any = snapshot.map(e => s"$path/data/${e.dir}")
        .find(hasDataFiles(fs, _))
        .getOrElse(sys.error(
          s"ManifestTable: no readable data files at $path — cannot " +
            "derive a schema for the (empty) result"))
      spark.read.parquet(any).limit(0)
    }
  }

  /** The highest commit tag in the latest snapshot (-1 if the table
    * is empty or only untagged) — the streaming sink's exactly-once
    * watermark: the tag travels INSIDE the atomically-renamed
    * manifest, so "rows of batch B are in the table" and "watermark
    * says B" are one filesystem operation. */
  def latestTag(spark: SparkSession, path: String): Long =
    latestVersion(spark, path)
      .map(v => entriesOf(spark, path, v).map(_.tag).foldLeft(-1L)(math.max))
      .getOrElse(-1L)

  /** Append `df` as one immutable data directory + one new manifest.
    * `tag` is recorded on the new entry (streaming watermark);
    * `statsCol` additionally records the new dir's min/max of that
    * long-castable column, enabling [[readPruned]] to skip whole dirs
    * from the manifest alone. Returns the committed version.
    * Single-writer. */
  def append(spark: SparkSession, df: DataFrame, path: String,
      tag: Long = -1L, statsCol: Option[String] = None): Long = {
    val (fs, _) = fsOf(spark, path)
    val prev = latestVersion(spark, path)
    val v = prev.map(_ + 1).getOrElse(1L)
    val dataDir = new org.apache.hadoop.fs.Path(s"$path/data/${cName(v)}")
    // a crashed earlier attempt at THIS version left an orphan no
    // manifest references — rewrite it
    fs.delete(dataDir, true)
    df.write.mode("overwrite").parquet(dataDir.toString)
    // stats from the WRITTEN dir, not from `df`: a second evaluation
    // of an unpersisted frame could disagree with what was written
    // (source mutated between jobs, non-deterministic column) and a
    // too-narrow recorded range would make readPruned silently drop
    // matching rows. The written dir is immutable — its stats are the
    // truth, for one cheap columnar read of the batch-sized dir.
    // All-null or empty -> null stats (never pruned: conservative).
    val stats = statsCol.flatMap { c =>
      // Try: an empty batch may write a file-less dir Spark can't read
      scala.util.Try {
        val r = spark.read.parquet(dataDir.toString)
          .agg(min(col(c).cast("long")), max(col(c).cast("long"))).head()
        if (r.isNullAt(0)) None else Some((c, r.getLong(0), r.getLong(1)))
      }.toOption.flatten
    }
    val prevEntries = prev.map(pv => entriesOf(spark, path, pv))
      .getOrElse(Seq.empty)
    val entry = Entry(cName(v), tag, stats.map(_._1).orNull,
      stats.map(s => Long.box(s._2)).orNull,
      stats.map(s => Long.box(s._3)).orNull)
    commit(spark, path, v, prevEntries :+ entry)
    v
  }

  private def commit(spark: SparkSession, path: String, v: Long,
      entries: Seq[Entry]): Unit = {
    import spark.implicits._
    val (fs, _) = fsOf(spark, path)
    val mDir = new org.apache.hadoop.fs.Path(s"$path/manifest")
    fs.mkdirs(mDir)
    // drop tmp debris from any crashed earlier commit
    fs.listStatus(mDir).filter(_.getPath.getName.startsWith(".tmp-"))
      .foreach(st => fs.delete(st.getPath, true))
    val tmp = new org.apache.hadoop.fs.Path(s"$path/manifest/.tmp-${vName(v)}")
    entries.map(e => (e.dir, e.tag, Option(e.statCol),
        Option(e.statMin).map(Long.unbox), Option(e.statMax).map(Long.unbox)))
      .toDF("dir", "tag", "statCol", "statMin", "statMax")
      .repartition(1)
      .write.mode("overwrite").parquet(tmp.toString)
    val fin = new org.apache.hadoop.fs.Path(s"$path/manifest/${vName(v)}")
    require(fs.rename(tmp, fin),
      s"ManifestTable.commit: could not publish ${vName(v)} at $path")
  }

  /** Latest snapshot restricted to data dirs whose recorded
    * `[statMin, statMax]` overlaps `[lo, hi]` on `statsCol` — dir
    * granularity pruning decided from the MANIFEST alone, before any
    * data file is listed or opened (the Iceberg-manifest-stats idea
    * at its smallest). Dirs with no stats (or stats on a different
    * column) are conservatively kept; an empty survivor set returns
    * an empty frame with the snapshot's schema. The caller still
    * applies its row filter — pruning only cuts which dirs can
    * contain matches, exactly like parquet's own row-group skip one
    * level down. */
  def readPruned(spark: SparkSession, path: String, statsCol: String,
      lo: Long, hi: Long): DataFrame = {
    val v = latestVersion(spark, path).getOrElse(
      sys.error(s"ManifestTable.readPruned: no committed version at $path"))
    val entries = entriesOf(spark, path, v)
    val keep = entries.filter(e =>
      e.statCol != statsCol || e.statMin == null ||
        (e.statMax >= lo && e.statMin <= hi))
    readDirs(spark, path, entries, keep)
  }

  /** Latest snapshot as a DataFrame. The file list is resolved NOW, so
    * the returned frame keeps reading this snapshot's (immutable) dirs
    * even if appends or compactions commit afterwards. */
  def read(spark: SparkSession, path: String): DataFrame =
    readVersion(spark, path,
      latestVersion(spark, path).getOrElse(
        sys.error(s"ManifestTable.read: no committed version at $path")))

  /** Time travel: snapshot `v` exactly as committed (fails if `v` was
    * never committed or was vacuumed). */
  def readVersion(spark: SparkSession, path: String, v: Long): DataFrame = {
    require(versions(spark, path).contains(v),
      s"ManifestTable: ${vName(v)} is not a committed snapshot at " +
        s"$path (never committed, or vacuumed)")
    val entries = entriesOf(spark, path, v)
    readDirs(spark, path, entries, entries)
  }

  /** Rewrite the CURRENT snapshot's content into one fresh data dir
    * (sized like [[Maintenance.compactParquet]]: `targetFileBytes`
    * per file, floored at `minFiles` splits) and commit it as a new
    * version. Pure metadata swap for readers — older snapshots still
    * reference their original dirs until [[vacuum]]. Returns the new
    * version. */
  def compact(spark: SparkSession, path: String,
      targetFileBytes: Long = 128L << 20, minFiles: Int = 1): Long = {
    val (fs, _) = fsOf(spark, path)
    val prev = latestVersion(spark, path).getOrElse(
      sys.error(s"ManifestTable.compact: no committed version at $path"))
    val entries = entriesOf(spark, path, prev)
    val dirs = entries.map(e => s"$path/data/${e.dir}")
    val bytes = dirs.map(d => fs.getContentSummary(
      new org.apache.hadoop.fs.Path(d)).getLength).sum
    val nOut = math.max(minFiles.toLong,
      (bytes + targetFileBytes - 1) / targetFileBytes).toInt
    val v = prev + 1
    val dataDir = new org.apache.hadoop.fs.Path(s"$path/data/${cName(v)}")
    fs.delete(dataDir, true)
    spark.read.parquet(dirs: _*).repartition(nOut)
      .write.mode("overwrite").parquet(dataDir.toString)
    // the merged entry PRESERVES the watermark (max tag — compaction
    // must not make a replayed batch look fresh) and folds the stats
    // (min of mins / max of maxes when every entry carries the same
    // stats column; dropped otherwise — conservative, never wrong)
    val tag = entries.map(_.tag).foldLeft(-1L)(math.max)
    val statCols = entries.map(e => Option(e.statCol)).distinct
    val merged = statCols match {
      case Seq(Some(c)) if entries.forall(_.statMin != null) =>
        Entry(cName(v), tag, c,
          Long.box(entries.map(e => Long.unbox(e.statMin)).min),
          Long.box(entries.map(e => Long.unbox(e.statMax)).max))
      case _ => Entry(cName(v), tag, null, null, null)
    }
    commit(spark, path, v, Seq(merged))
    v
  }

  /** Incremental consumption: rows committed AFTER snapshot
    * `sinceVersion` — the dirs of the latest snapshot minus the dirs
    * of `sinceVersion`, resolved from two manifest reads (no data
    * listing, no content diff). This is the change-data-capture read
    * a downstream incremental job wants: checkpoint the version you
    * processed, ask for everything since, repeat — each commit is
    * consumed exactly once because dirs are immutable and append-only.
    *
    * Semantics are DIR-IDENTITY based, which is what makes them free:
    * a [[compact]] or [[deleteRange]] rewrites identity, so the new
    * dirs would all look "new" to a stale checkpoint. Incremental
    * consumers must drain up to the current version before table
    * maintenance runs (the standard CDC-vs-compaction contract).
    * `sinceVersion <= 0` is the bootstrap read (the whole table); a
    * vacuumed checkpoint fails with the contract named. Returns an
    * empty frame (snapshot schema) when nothing is new. */
  def readSince(spark: SparkSession, path: String,
      sinceVersion: Long): DataFrame = {
    val vs = versions(spark, path)
    val latest = vs.lastOption.getOrElse(
      sys.error(s"ManifestTable.readSince: no committed version at $path"))
    val now = entriesOf(spark, path, latest)
    // sinceVersion <= 0 is the bootstrap read (whole table); a
    // VACUUMED checkpoint fails with the contract named, not a raw
    // file-not-found — the consumer lagged past retention and must
    // re-bootstrap
    val seen =
      if (sinceVersion <= 0) Set.empty[String]
      else {
        require(vs.contains(sinceVersion),
          s"ManifestTable.readSince: checkpoint ${vName(sinceVersion)} " +
            s"is not a committed snapshot at $path — vacuumed (lagged " +
            "past retention; re-bootstrap with sinceVersion = 0) or " +
            "never committed")
        entriesOf(spark, path, sinceVersion).map(_.dir).toSet
      }
    readDirs(spark, path, now, now.filterNot(e => seen.contains(e.dir)))
  }

  /** Copy-on-write row-level delete of `[lo, hi]` on `statsCol`:
    * ONLY the data dirs whose recorded stats overlap the range are
    * rewritten (filtered, restatted, possibly dropped entirely when
    * emptied); every other dir keeps its identity — no rewrite, no
    * new files, same entry, just copied into the new manifest. That
    * is the delete shape a 100 TB table needs: cost proportional to
    * the data that CONTAINS matches, not to the table (with a
    * monotone stats column like event time, a retention delete
    * touches exactly the expired dirs). Dirs without stats on
    * `statsCol` are conservatively rewritten (they might contain
    * matches). Old snapshots still see the deleted rows until
    * [[vacuum]] — deletion is a new version, not an edit. Returns
    * (new version, dirs rewritten). */
  def deleteRange(spark: SparkSession, path: String, statsCol: String,
      lo: Long, hi: Long): (Long, Int) = {
    val (fs, _) = fsOf(spark, path)
    val prev = latestVersion(spark, path).getOrElse(
      sys.error(s"ManifestTable.deleteRange: no committed version at $path"))
    val entries = entriesOf(spark, path, prev)
    val (touch0, keep0) = entries.partition(e =>
      e.statCol != statsCol || e.statMin == null ||
        (e.statMax >= lo && e.statMin <= hi))
    // a file-less dir (empty-batch commit) holds nothing to delete —
    // keep its entry untouched instead of crashing on a schema-less
    // read
    val (touch, keepEmpty) = touch0.partition(e =>
      hasDataFiles(fs, s"$path/data/${e.dir}"))
    val keep = keep0 ++ keepEmpty
    val v = prev + 1
    val rewritten = touch.zipWithIndex.flatMap { case (e, i) =>
      val newDir = f"${cName(v)}_$i%04d"
      val target = new org.apache.hadoop.fs.Path(s"$path/data/$newDir")
      fs.delete(target, true) // crashed earlier attempt at this version
      // null keys are never "in range" — they must survive a range
      // delete (a bare !between would evaluate null and drop them)
      val kept = spark.read.parquet(s"$path/data/${e.dir}")
        .filter(col(statsCol).isNull ||
          !col(statsCol).cast("long").between(lo, hi))
      if (kept.head(1).isEmpty) None // dir fully deleted: no entry
      else {
        kept.write.mode("overwrite").parquet(target.toString)
        // re-stat from the WRITTEN dir (same consistency rule as
        // append — the written files are the truth); all-null-key
        // survivors get null stats (kept by every future prune:
        // conservative, exactly right)
        val stats = spark.read.parquet(target.toString)
          .agg(min(col(statsCol).cast("long")),
            max(col(statsCol).cast("long"))).head()
        if (stats.isNullAt(0)) Some(Entry(newDir, e.tag, null, null, null))
        else Some(Entry(newDir, e.tag, statsCol,
          Long.box(stats.getLong(0)), Long.box(stats.getLong(1))))
      }
    }
    // the exactly-once watermark is COMMIT-level: if the delete
    // dropped the dir carrying the table's max tag, a replay of that
    // batch would look fresh and double-ingest — re-pin the max tag
    // on a surviving entry (an emptied table genuinely resets to -1)
    val survivors = keep ++ rewritten
    val tableTag = entries.map(_.tag).foldLeft(-1L)(math.max)
    val committed =
      if (survivors.isEmpty || survivors.exists(_.tag >= tableTag))
        survivors
      else survivors.init :+ survivors.last.copy(tag = tableTag)
    commit(spark, path, v, committed)
    (v, touch.size)
  }

  /** Drop snapshots older than the newest `keepVersions` and delete
    * every data dir none of the kept snapshots references (orphans
    * from crashed appends included). Returns (manifests dropped, data
    * dirs deleted). After vacuum, time travel reaches only the kept
    * versions — retention is this ONE explicit knob. */
  def vacuum(spark: SparkSession, path: String,
      keepVersions: Int = 1): (Int, Int) = {
    require(keepVersions >= 1, "vacuum: must keep at least one version")
    val (fs, _) = fsOf(spark, path)
    val vs = versions(spark, path)
    val (drop, keep) = vs.splitAt(math.max(0, vs.size - keepVersions))
    val referenced = keep.flatMap(v => dirsOf(spark, path, v)
      .map(_.split('/').last)).toSet
    drop.foreach(v => fs.delete(
      new org.apache.hadoop.fs.Path(s"$path/manifest/${vName(v)}"), true))
    val dataRoot = new org.apache.hadoop.fs.Path(s"$path/data")
    val removed =
      if (!fs.exists(dataRoot)) 0
      else fs.listStatus(dataRoot).count { st =>
        val keepIt = referenced.contains(st.getPath.getName)
        if (!keepIt) fs.delete(st.getPath, true)
        !keepIt
      }
    (drop.size, removed)
  }
}
