package graft

import graft.sinks.ManifestTable
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** The name world beyond SELECT/DML (GraftNames): the V1 format's
  * `path` option, the metadata TVFs, `spark.readStream.table`, the
  * change-feed stream, and the CDC follower all accept
  * `catalog.ns.table` — a user who created a table by name never has
  * to find its path. No test here mentions a path for the surfaces
  * under test.
  */
class NameResolutionSpec extends AnyFunSuite {
  private lazy val spark = {
    val s = TestSpark.spark
    val wh = Files.createTempDirectory("graft-names-wh").toString
    s.conf.set("spark.sql.catalog.gn",
      classOf[graft.catalog.GraftCatalog].getName)
    s.conf.set("spark.sql.catalog.gn.warehouse", wh)
    s.sql("CREATE NAMESPACE IF NOT EXISTS gn.db")
    s
  }
  import spark.implicits._

  test("batch format reads and the metadata TVFs resolve names") {
    spark.sql("CREATE TABLE gn.db.t (id BIGINT, s STRING) " +
      "USING `graft-manifest` TBLPROPERTIES ('statsCols'='id')")
    spark.sql("INSERT INTO gn.db.t VALUES (1, 'a'), (2, 'b')")
    spark.sql("INSERT INTO gn.db.t VALUES (3, 'c')")
    // the V1 format's load() takes the name
    assert(spark.read.format("graft-manifest").load("gn.db.t")
      .collect().map(_.getLong(0)).sorted.toSeq == Seq(1L, 2L, 3L))
    // time-travel options ride along
    assert(spark.read.format("graft-manifest")
      .option("versionAsOf", "2").load("gn.db.t").count() == 2)
    // TVFs by name — zero paths in the statements
    assert(spark.sql("SELECT * FROM graft_history('gn.db.t')")
      .count() == 3) // create + 2 inserts
    assert(spark.sql(
      "SELECT * FROM graft_changes('gn.db.t', 0) WHERE id = 3")
      .collect().map(r => (r.getAs[String]("_change_type"),
        r.getAs[Long]("_commit_version"))).toSeq == Seq(("insert", 3L)))
    val detail = spark.sql("SELECT * FROM graft_detail('gn.db.t')")
      .collect()
    assert(detail.length == 1)
    // a missing table behind a REAL catalog is loud, never "a path"
    val ex = intercept[Exception] {
      spark.sql("SELECT * FROM graft_history('gn.db.nope')").collect()
    }
    assert(ex.getMessage.contains("nope"), s"got: ${ex.getMessage}")
  }

  test("readStream.table drains by name; readChangeFeed option rides") {
    val ckpt = Files.createTempDirectory("graft-names-ck").toString
    spark.sql("CREATE TABLE gn.db.st (id BIGINT, s STRING) " +
      "USING `graft-manifest`")
    spark.sql("INSERT INTO gn.db.st VALUES (1, 'a')")
    val q = spark.readStream.table("gn.db.st")
      .writeStream.format("memory").queryName("gn_mem")
      .option("checkpointLocation", s"$ckpt/plain").start()
    q.processAllAvailable()
    assert(spark.table("gn_mem").collect().map(_.getLong(0)).toSeq ==
      Seq(1L))
    spark.sql("INSERT INTO gn.db.st VALUES (2, 'b')")
    q.processAllAvailable()
    q.stop()
    assert(spark.table("gn_mem").collect().map(_.getLong(0)).sorted
      .toSeq == Seq(1L, 2L))
    // the change feed by NAME: metadata columns appear even though
    // the table schema doesn't carry them
    val q2 = spark.readStream.option("readChangeFeed", "true")
      .table("gn.db.st")
      .writeStream.format("memory").queryName("gn_cdf")
      .option("checkpointLocation", s"$ckpt/cdf").start()
    q2.processAllAvailable()
    q2.stop()
    val cdf = spark.table("gn_cdf").collect()
      .map(r => (r.getAs[Long]("id"), r.getAs[String]("_change_type"),
        r.getAs[Long]("_commit_version"))).sorted.toSeq
    assert(cdf == Seq((1L, "insert", 2L), (2L, "insert", 3L)),
      s"got $cdf")
  }

  test("the CDC follower replicates name to name") {
    val ckpt = Files.createTempDirectory("graft-names-cdc").toString
    spark.sql("CREATE TABLE gn.db.src (id BIGINT, s STRING) " +
      "USING `graft-manifest` TBLPROPERTIES ('statsCols'='id')")
    spark.sql("CREATE TABLE gn.db.replica (id BIGINT, s STRING) " +
      "USING `graft-manifest` TBLPROPERTIES ('statsCols'='id')")
    spark.sql("INSERT INTO gn.db.src VALUES (1, 'a'), (2, 'b')")
    val q = graft.streaming.Streams.applyChangesSinkWriter(
      spark.readStream.option("readChangeFeed", "true")
        .table("gn.db.src"),
      "gn.db.replica", "id", s"$ckpt/f", statsCols = Seq("id")).start()
    q.processAllAvailable()
    spark.sql("UPDATE gn.db.src SET s = 'B' WHERE id BETWEEN 2 AND 2")
    spark.sql("INSERT INTO gn.db.src VALUES (5, 'e')")
    q.processAllAvailable()
    q.stop()
    def state(name: String): Seq[(Long, String)] =
      spark.sql(s"SELECT * FROM $name").collect()
        .map(r => (r.getLong(0), r.getString(1))).sorted.toSeq
    assert(state("gn.db.replica") == Seq((1L, "a"), (2L, "B"), (5L, "e"))
      && state("gn.db.replica") == state("gn.db.src"),
      s"follower diverged: ${state("gn.db.replica")}")
  }
}
