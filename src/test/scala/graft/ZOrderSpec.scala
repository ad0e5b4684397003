package graft

import graft.expressions.ZOrderValue
import graft.layout.Layout
import org.apache.spark.sql.GraftSqlBridge
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** Pins the Z-order layout's contract from the parquet footers
  * themselves (the metadata the scan's row-group skip consults), not
  * from timing: a 2-D Morton clustering must give min/max pruning on
  * BOTH columns, where the single-axis sort control gives it only on
  * its lead column. Plus value-level pins of the interleave expression
  * under codegen.
  */
class ZOrderSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("zorder_value interleaves scaled cells; codegen matches known values") {
    val df = Seq((0L, 0L), (65535L, 65535L), (65535L, 0L), (0L, 65535L),
      (-5L, 70000L)).toDF("a", "b")
    val z = GraftSqlBridge.column(ZOrderValue(
      GraftSqlBridge.expression(col("a")),
      GraftSqlBridge.expression(col("b")), 0L, 65535L, 0L, 65535L))
    val got = df.select(z.as("z")).as[Long].collect().toSeq
    // span == grid: cells are the values themselves; corners of the
    // 2^32 Morton square, and out-of-range inputs clamp to the edges
    assert(got == Seq(0L, 0xFFFFFFFFL, 0x55555555L, 0xAAAAAAAAL,
      0xAAAAAAAAL))
    // null intolerance: null key -> null zval
    val withNull = Seq((Some(1L), None: Option[Long])).toDF("a", "b")
      .select(GraftSqlBridge.column(ZOrderValue(
        GraftSqlBridge.expression(col("a")),
        GraftSqlBridge.expression(col("b")), 0L, 10L, 0L, 10L)).as("z"))
    assert(withNull.collect().head.isNullAt(0))
  }

  test("z-ordered layout prunes row groups on BOTH columns; single sort only on its lead") {
    val d = "/root/testdata/sf0.001"
    val li = Tables.lineitem(spark, d)
    val tmp = Files.createTempDirectory("graft-zorder").toString
    Layout.writeZOrdered(li, s"$tmp/zorder", 64, "l_partkey", "l_suppkey")
    // the control: same rows, same file count, sorted on partkey alone
    Layout.writeRangeSorted(li, s"$tmp/bypart", 64, "l_partkey")

    // a ~10% slab of each key's range, derived from the data so the
    // spec holds at any scale factor
    val r = li.agg(min("l_partkey"), max("l_partkey"),
      min("l_suppkey"), max("l_suppkey")).head()
    def slab(lo: Long, hi: Long): (Long, Long) = {
      val span = hi - lo
      (lo + span * 45 / 100, lo + span * 55 / 100)
    }
    val (pLo, pHi) = slab(r.getLong(0), r.getLong(1))
    val (sLo, sHi) = slab(r.getLong(2), r.getLong(3))

    val (zp, zpT) = Layout.overlappingRowGroups(
      spark, s"$tmp/zorder", "l_partkey", pLo, pHi)
    val (zs, zsT) = Layout.overlappingRowGroups(
      spark, s"$tmp/zorder", "l_suppkey", sLo, sHi)
    val (bp, bpT) = Layout.overlappingRowGroups(
      spark, s"$tmp/bypart", "l_partkey", pLo, pHi)
    val (bs, bsT) = Layout.overlappingRowGroups(
      spark, s"$tmp/bypart", "l_suppkey", sLo, sHi)

    // z-order: a 10% slab on EITHER axis decodes well under half the
    // groups (ideal 2-D tiling gives ~ slab + 1/sqrt(files) ~ 25%)
    assert(zpT >= 16 && zp <= zpT / 2, s"zorder partkey: $zp/$zpT overlap")
    assert(zs <= zsT / 2, s"zorder suppkey: $zs/$zsT overlap")
    // the single-axis control: strong on its lead column...
    assert(bp <= bpT / 4, s"bypart partkey: $bp/$bpT overlap")
    // ...and useless on the other (every file spans ~the full suppkey
    // range) — the gap z-order exists to close
    assert(bs >= bsT * 9 / 10, s"bypart suppkey: $bs/$bsT overlap")

    // footers cover the table exactly; clustering lost no rows
    val rows = Layout.rowGroupRanges(spark, s"$tmp/zorder", "l_partkey")
      .map(_._3).sum
    assert(rows == li.count())
  }

  test("q121 runs off the z-ordered copy with both predicates pushed; answer matches plain") {
    val d = "/root/testdata/sf0.001"
    val q = graft.operators.LayoutQueries.all
      .find(_.name == "q121_zorder_two_col_scan").get
    val df = q.run(spark, d)
    val filters = Layout.scanFilters(df)
    assert(filters.contains("PushedFilters") &&
      filters.contains("l_partkey") && filters.contains("l_suppkey"),
      filters)
    val li = Tables.lineitem(spark, d)
    val plain = li.filter(col("l_partkey").between(100, 220) ||
      col("l_suppkey").between(10, 15)).count()
    assert(df.agg(sum("n")).head().getLong(0) == plain && plain > 0)
  }
}
