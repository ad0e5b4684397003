package graft.sinks

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

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
    * (stored/addressed as [[PartitionTransform.NullValue]]).
    * Takes the frame's schema because a temporal transform is
    * TYPE-DISPATCHED ([[PartitionTransform.PDays]]): the rule that
    * derives a tz-aware timestamp's day is not the rule for an NTZ
    * wall clock or a DATE, and deriving through a blind session-zone
    * cast would disagree with the SQL-prune side's literal
    * conversion — silently wrong pruning. */
  def toExpr(schema: StructType): Column

  /** Persisted one-line form (parsed back by
    * [[PartitionTransform.parse]]). */
  def render: String
}

object PartitionTransform {

  /** Hive's default-partition sentinel — the manifest stores a null
    * partition value as this string, and a predicate may name it to
    * address the null partition explicitly. */
  val NullValue = "__HIVE_DEFAULT_PARTITION__"

  /** The ISO calendar-day string of a temporal column, derived by a
    * ZONE-INDEPENDENT rule per source type — the shared core of the
    * days/months/years transforms (month and year are monotone
    * truncations of it, so write side and prune side stay exact by
    * construction):
    *  - tz-aware TIMESTAMP: the UTC day by EXACT epoch arithmetic
    *    over `unix_micros` (integer floor-div via pmod, no doubles,
    *    no session-zone cast) — the same instant lands in the same
    *    partition whatever the writer's or reader's session timezone;
    *  - TIMESTAMP_NTZ: the WALL-CLOCK day (`cast` to date truncates
    *    the wall clock — no zone is involved for NTZ, and the
    *    SQL-prune side converts NTZ literals as wall clocks too);
    *  - DATE: the value itself (already a day).
    * Any other source type is REJECTED loudly: the old behavior
    * (cast to timestamp via the session zone) derived values the
    * prune side could disagree with — silently wrong results. */
  /** Exact `floor(c / unit)` over a long column — the numerator is
    * made divisible by pmod, then divided in DECIMAL (Spark's `/` on
    * longs is double division, whose 53-bit mantissa truncates the
    * quotient one short for micros past ~2^53, i.e. timestamps past
    * year ~2255 — an off-by-one-day partition value). */
  private def floorDivExact(c: Column, unit: Long): Column =
    ((c - pmod(c, lit(unit)))
      .cast(org.apache.spark.sql.types.DecimalType(30, 0)) / lit(unit))
      .cast("long")

  private[sinks] def dayExprOf(src: String, schema: StructType,
      render: String): Column = {
    import org.apache.spark.sql.types.{DateType, TimestampNTZType, TimestampType}
    val dt = schema.fields.find(_.name == src).map(_.dataType)
      .getOrElse(sys.error(
        s"PartitionTransform($render): source column '$src' is " +
          s"missing from the schema (${schema.fieldNames.mkString(", ")})"))
    dt match {
      case TimestampType =>
        val us = unix_micros(col(src))
        date_from_unix_date(
          floorDivExact(us, 86400000000L).cast("int")).cast("string")
      case TimestampNTZType => col(src).cast("date").cast("string")
      case DateType => col(src).cast("string")
      case other => sys.error(
        s"PartitionTransform($render): source column '$src' is " +
          s"${other.catalogString} — temporal transforms are defined " +
          "on TIMESTAMP, TIMESTAMP_NTZ and DATE columns only (a " +
          "session-zone cast from any other type would derive values " +
          "the prune side cannot reproduce)")
    }
  }

  /** Partition by the column's own (stringified) value. */
  final case class PIdentity(src: String) extends PartitionTransform {
    def field: String = src
    def toExpr(schema: StructType): Column = col(src).cast("string")
    def render: String = s"identity:$src"
  }

  /** Partition by the calendar day of a temporal column — see
    * [[PartitionTransform.dayExprOf]] for the per-type
    * zone-independence rule (the SQL-path pruning converts filter
    * literals under the same rules, so writer and reader sessions in
    * different timezones always agree). */
  final case class PDays(src: String) extends PartitionTransform {
    def field: String = s"${src}_day"
    def toExpr(schema: StructType): Column =
      dayExprOf(src, schema, render)
    def render: String = s"days:$src"
  }

  /** Partition by calendar month ("yyyy-MM") — the first 7 chars of
    * the ISO day string, a monotone truncation of [[PDays]]'s value,
    * so every zone-independence property carries over verbatim and
    * the prune side derives month bounds by the same truncation. */
  final case class PMonths(src: String) extends PartitionTransform {
    def field: String = s"${src}_month"
    def toExpr(schema: StructType): Column =
      substring(dayExprOf(src, schema, render), 1, 7)
    def render: String = s"months:$src"
  }

  /** Partition by calendar year ("yyyy") — first 4 chars of the ISO
    * day string (see [[PMonths]]). */
  final case class PYears(src: String) extends PartitionTransform {
    def field: String = s"${src}_year"
    def toExpr(schema: StructType): Column =
      substring(dayExprOf(src, schema, render), 1, 4)
    def render: String = s"years:$src"
  }

  /** Partition by hour ("yyyy-MM-dd-HH", Iceberg's hour format) —
    * for tz-aware TIMESTAMP the UTC hour by exact epoch arithmetic;
    * for TIMESTAMP_NTZ the wall-clock hour read off the NTZ string
    * cast (zone-free by definition). DATE has no hour: rejected at
    * derivation, which spec validation reaches on the first write. */
  final case class PHours(src: String) extends PartitionTransform {
    def field: String = s"${src}_hour"
    def toExpr(schema: StructType): Column = {
      import org.apache.spark.sql.types.{TimestampNTZType, TimestampType}
      val dt = schema.fields.find(_.name == src).map(_.dataType)
        .getOrElse(sys.error(
          s"PartitionTransform($render): source column '$src' is " +
            s"missing from the schema (${schema.fieldNames.mkString(", ")})"))
      dt match {
        case TimestampType =>
          val us = unix_micros(col(src))
          val epochHour = floorDivExact(us, 3600000000L)
          val epochDay = floorDivExact(us, 86400000000L).cast("int")
          concat(date_from_unix_date(epochDay).cast("string"),
            lit("-"), lpad(pmod(epochHour, lit(24L)).cast("string"),
              2, "0"))
        case TimestampNTZType =>
          // zone-free by construction: an NTZ→DATE cast reads the
          // wall-clock day and hour() the wall-clock hour — no
          // string-format slicing, so years outside 0001-9999 (which
          // render with a sign/extra digit) still derive the right
          // value (the prune side keeps such non-ISO-comparable
          // values conservatively)
          concat(col(src).cast("date").cast("string"), lit("-"),
            lpad(hour(col(src)).cast("string"), 2, "0"))
        case other => sys.error(
          s"PartitionTransform($render): source column '$src' is " +
            s"${other.catalogString} — hours() is defined on " +
            "TIMESTAMP and TIMESTAMP_NTZ columns only")
      }
    }
    def render: String = s"hours:$src"
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
    def toExpr(schema: StructType): Column =
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
    def toExpr(schema: StructType): Column =
      substring(col(src).cast("string"), 1, len)
    def render: String = s"truncate:$len:$src"
  }

  /** Parse one [[render]]ed line back. Loud on anything else — a
    * corrupt spec sidecar must never silently change a table's
    * layout. */
  def parse(line: String): PartitionTransform =
    line.split(":").toSeq match {
      case Seq("identity", s) => PIdentity(s)
      case Seq("days", s) => PDays(s)
      case Seq("months", s) => PMonths(s)
      case Seq("years", s) => PYears(s)
      case Seq("hours", s) => PHours(s)
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
