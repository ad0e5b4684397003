package graft.sinks

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Hidden-partitioning transforms for [[ManifestTable]] — the
  * Iceberg idea (partition values are DERIVED from data columns by a
  * declared transform, not stored as extra user-visible columns)
  * reduced to the four transforms a 100 TB ingest layout actually
  * uses. The reference pins its one table's layout inside Snowflake
  * (`/root/reference/processor.py:55-62` — ingest-date semantics are
  * implicit in the load job); here the layout is explicit, versioned
  * table metadata.
  *
  * Why transforms instead of raw Hive partition columns: the user
  * writes `ts` once and queries `ts` — the engine derives `days(ts)`
  * at write time and prunes with it, so there is no second
  * partition column to keep in sync, no double-write bug, and the
  * partition scheme can be told apart from the data (it lives in the
  * manifest's `_graft_partspec` sidecar, not in the schema).
  *
  * Every transform's value is a STRING (what a directory name and a
  * manifest map cell can both carry losslessly); a null source value
  * partitions into [[PartitionTransform.NullValue]] — Hive's own
  * default-partition sentinel, kept verbatim so the null partition
  * is addressable by [[ManifestTable.dropPartitions]] like any
  * other. Transforms are DETERMINISTIC row functions, so any rewrite
  * can recompute them — metadata is reconstructible, never guessed.
  */
sealed trait PartitionTransform {
  /** Source data column the value derives from. */
  def src: String

  /** The derived partition field name (manifest-map key and
    * predicate name in partition reads/drops). */
  def field: String

  /** The string-valued derivation; null source rows derive null
    * (stored/addressed as [[PartitionTransform.NullValue]]). */
  def toExpr: Column

  /** Persisted one-line form (parsed back by
    * [[PartitionTransform.parse]]). */
  def render: String
}

object PartitionTransform {

  /** Hive's default-partition sentinel — the manifest stores a null
    * partition value as this string, and a predicate may name it to
    * address the null partition explicitly. */
  val NullValue = "__HIVE_DEFAULT_PARTITION__"

  /** Partition by the column's own (stringified) value. */
  final case class PIdentity(src: String) extends PartitionTransform {
    def field: String = src
    def toExpr: Column = col(src).cast("string")
    def render: String = s"identity:$src"
  }

  /** Partition by the UTC calendar day of a timestamp column —
    * derived by EXACT epoch arithmetic over `unix_micros` (integer
    * floor-div via pmod, no doubles), so the same instant lands in
    * the same partition whatever the writer's or reader's session
    * timezone; the SQL-path pruning converts filter literals under
    * the same UTC rule. One caveat rides the Spark cast semantics:
    * a TIMESTAMP_NTZ source column is interpreted as a session-zone
    * wall clock by the `cast` below, so for NTZ columns keep writer
    * and reader sessions in one timezone (tz-aware timestamps are
    * zone-independent end to end). */
  final case class PDays(src: String) extends PartitionTransform {
    def field: String = s"${src}_day"
    def toExpr: Column = {
      val us = unix_micros(col(src).cast("timestamp"))
      val day = lit(86400000000L)
      val epochDay = ((us - pmod(us, day)) / day).cast("int")
      date_from_unix_date(epochDay).cast("string")
    }
    def render: String = s"days:$src"
  }

  /** Partition into `n` stable hash buckets (Spark's Murmur3 — a
    * published, version-stable algorithm, so the bucket of a key
    * never moves between writes). Null keys derive null, not bucket
    * `hash(seed) % n` — a null must stay addressable as the null
    * partition, exactly like Iceberg's bucket transform. */
  final case class PBucket(n: Int, src: String)
      extends PartitionTransform {
    require(n >= 1, s"bucket($n, $src): n must be >= 1")
    def field: String = s"${src}_bucket"
    def toExpr: Column =
      when(col(src).isNull, lit(null))
        .otherwise(pmod(hash(col(src)), lit(n))).cast("string")
    def render: String = s"bucket:$n:$src"
  }

  /** Partition by the first `len` characters of the stringified
    * value (string-prefix truncate — the URL-host / id-prefix
    * layout). */
  final case class PTruncate(len: Int, src: String)
      extends PartitionTransform {
    require(len >= 1, s"truncate($len, $src): len must be >= 1")
    def field: String = s"${src}_trunc"
    def toExpr: Column = substring(col(src).cast("string"), 1, len)
    def render: String = s"truncate:$len:$src"
  }

  /** Parse one [[render]]ed line back. Loud on anything else — a
    * corrupt spec sidecar must never silently change a table's
    * layout. */
  def parse(line: String): PartitionTransform =
    line.split(":").toSeq match {
      case Seq("identity", s) => PIdentity(s)
      case Seq("days", s) => PDays(s)
      case Seq("bucket", n, s) => PBucket(n.toInt, s)
      case Seq("truncate", n, s) => PTruncate(n.toInt, s)
      case _ => sys.error(
        s"PartitionTransform.parse: unrecognized transform '$line'")
    }

  /** The persisted sidecar body for a spec (one transform per
    * line). */
  def renderSpec(spec: Seq[PartitionTransform]): String =
    spec.map(_.render).mkString("", "\n", "\n")

  /** Parse a sidecar body (inverse of [[renderSpec]]). */
  def parseSpec(body: String): Seq[PartitionTransform] =
    body.linesIterator.map(_.trim).filter(_.nonEmpty)
      .map(parse).toSeq

  /** Decode one Hive-escaped path-segment value (the `%xx` escaping
    * `partitionBy` applies to special characters in directory names
    * — a public Hive convention). Returns None for the
    * default-partition sentinel (a null source value). */
  def unescapePathValue(s: String): Option[String] =
    if (s == NullValue) None
    else {
      val out = new StringBuilder(s.length)
      var i = 0
      while (i < s.length) {
        val c = s.charAt(i)
        if (c == '%' && i + 2 < s.length &&
            isHex(s.charAt(i + 1)) && isHex(s.charAt(i + 2))) {
          out.append(Integer.parseInt(s.substring(i + 1, i + 3), 16)
            .toChar)
          i += 3
        } else { out.append(c); i += 1 }
      }
      Some(out.toString)
    }

  private def isHex(c: Char): Boolean =
    (c >= '0' && c <= '9') || (c >= 'A' && c <= 'F') ||
      (c >= 'a' && c <= 'f')
}
