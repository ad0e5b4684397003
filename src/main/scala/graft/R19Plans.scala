package graft

import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}

/** Dev tool (round-19 optimization evidence): dump
  * `.explain("formatted")` output for named queries to
  * `plans/r19/<name>_<suffix>.txt`.
  *
  * Usage: `sbt "runMain graft.R19Plans <suffix> <query...>"`
  * (suffix = "before" | "after"; uses sf0.01 like PlanDump).
  */
object R19Plans {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: R19Plans <suffix> <query...>")
    val suffix = args.head
    val names = args.tail.toSeq
    val spark = SparkSession.builder().master("local[8]")
      .withExtensions(new GraftExtensions)
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = "/root/testdata/sf0.01"
    val outDir = Paths.get("/root/repo/plans/r19")
    Files.createDirectories(outDir)
    names.foreach { n =>
      val df = SparkEntry.queries(n)(spark, d)
      val formatted = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      Files.writeString(outDir.resolve(s"${n}_$suffix.txt"), formatted)
      println(s"WROTE plans/r19/${n}_$suffix.txt")
    }
    spark.stop()
  }
}
