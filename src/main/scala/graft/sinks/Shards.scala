package graft.sinks

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic training-shard export — the last step of a curation
  * pipeline: materialize the cleaned corpus as N stable shards a
  * training job can map to data-loader workers.
  *
  * Shard assignment is a stable md5 bucket of the key column (the same
  * cross-engine-stable hashing the split/sample operators use — see
  * q37/q75), NOT a round-robin or a partition id: re-running the export
  * over the same rows lands every row in the same shard regardless of
  * cluster size, input split order, or previous runs, so downstream
  * resume/compare logic can rely on shard contents.
  *
  * Scale shape: one hash shuffle on the shard id (repartition by the
  * column, so all rows of a shard land in one task), an in-task sort by
  * the key for reproducible row order, then a parquet
  * `partitionBy(shard)` layout — one directory per shard, readable
  * selectively (`.../shard=3/`) with partition pruning. nShards should
  * be sized so a shard fits a data-loader worker (thousands at 100 TB;
  * the shuffle is uniform because md5 is).
  */
object Shards {

  /** Stable shard id in [0, nShards) from the md5 of a key column. */
  def shardId(key: Column, nShards: Int): Column =
    pmod(conv(substring(md5(key.cast("string")), 1, 8), 16, 10)
      .cast("long"), lit(nShards)).cast("int")

  /** Add a `shard` column. Exposed separately so callers can inspect
    * or re-balance before writing. */
  def withShard(df: DataFrame, keyCol: String, nShards: Int): DataFrame =
    df.withColumn("shard", shardId(col(keyCol), nShards))

  /** Write `df` as `nShards` deterministic parquet shards under `path`
    * (layout: `path/shard=K/part-*.parquet`), each shard sorted by
    * `keyCol` for reproducible row order. */
  def writeShards(df: DataFrame, keyCol: String, nShards: Int,
      path: String): Unit =
    withShard(df, keyCol, nShards)
      .repartition(col("shard"))
      .sortWithinPartitions(col("shard"), col(keyCol))
      .write.mode("overwrite")
      .partitionBy("shard")
      .parquet(path)
}
