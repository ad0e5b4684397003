package graft

import graft.sinks.Shards
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class SinksSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  /** Independent md5-bucket reference (java.security, not Spark). */
  private def expectedShard(key: String, n: Int): Int = {
    val hex = java.security.MessageDigest.getInstance("MD5")
      .digest(key.getBytes("UTF-8")).map("%02x".format(_)).mkString
    (java.lang.Long.parseLong(hex.take(8), 16) % n).toInt
  }

  test("writeShards lands every row in its stable md5 shard, sorted") {
    val n = 4
    val docs = (0L until 100L).map(i => (i, s"doc $i")).toDF("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("shards").toString
    Shards.writeShards(docs, "doc_id", n, dir)

    val back = spark.read.parquet(dir)
    assert(back.count() === 100L)
    // every row sits in the shard the independent md5 reference picks
    val misplaced = back
      .select(col("doc_id"), col("shard").cast("int").as("shard"))
      .collect()
      .filter(r => r.getInt(1) != expectedShard(r.getLong(0).toString, n))
    assert(misplaced.isEmpty, s"misplaced: ${misplaced.take(5).mkString}")
    // layout: one directory per shard, each holding ONE parquet file
    // (the shard-column repartition puts a shard in exactly one task)
    val shardDirs = new java.io.File(dir).listFiles()
      .filter(_.getName.startsWith("shard=")).sortBy(_.getName)
    assert(shardDirs.map(_.getName).toSet ===
      (0 until n).map(i => s"shard=$i").toSet)
    shardDirs.foreach { sd =>
      assert(sd.listFiles().count(_.getName.endsWith(".parquet")) === 1)
    }
    // within a shard the rows are key-sorted (reproducible order):
    // a single-file read preserves file order
    val one = spark.read.parquet(s"$dir/shard=0")
      .select("doc_id").as[Long].collect()
    assert(one.toSeq === one.sorted.toSeq)
  }

  test("shard assignment is invariant to input partitioning") {
    val docs = (0L until 50L).map(i => (i, s"d$i")).toDF("doc_id", "text")
    val a = Shards.withShard(docs.repartition(7), "doc_id", 8)
      .select("doc_id", "shard").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val b = Shards.withShard(docs.coalesce(1), "doc_id", 8)
      .select("doc_id", "shard").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(a === b)
  }
}
