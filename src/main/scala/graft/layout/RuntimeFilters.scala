package graft.layout

import java.io.ByteArrayOutputStream

import graft.expressions.BloomMightContain
import org.apache.spark.sql.{Column, DataFrame, GraftSqlBridge}

/** Runtime row-level join filters (SURVEY.md §4 "minimize shuffles"):
  * build a Bloom filter over the SMALL side's join keys, probe it in
  * the BIG side's scan stage, exact-join the survivors. The shuffle
  * then carries only (matches + fpp-bounded false positives) instead
  * of the whole fact table.
  *
  * The build is a distributed sketch aggregation
  * (`Dataset.stat.bloomFilter` — treeAggregate of fixed-size bit
  * arrays, NOT a row collect); only the finished ~`1.2 * n * ln(1/fpp)
  * / ln(2)^2` bits come to the driver, and they ship back to executors
  * once per stage inside the serialized plan. Size the filter from the
  * dim's real cardinality: at fpp 0.01 a 10M-key dim is ~12 MB — the
  * same order as a broadcast hash table, but probed pre-shuffle where
  * a broadcast join is off the table because the OTHER side also needs
  * the shuffle (e.g. it feeds a grouped agg on a different key).
  */
object RuntimeFilters {

  /** Serialized Bloom filter over `keyCol` of `dim` (expected
    * cardinality `expectedItems`, false-positive rate `fpp`). */
  def bloomBytes(dim: DataFrame, keyCol: String, expectedItems: Long,
      fpp: Double): Array[Byte] = {
    val bf = dim.stat.bloomFilter(keyCol, expectedItems, fpp)
    val out = new ByteArrayOutputStream()
    bf.writeTo(out)
    out.toByteArray
  }

  /** Column probe: true when `key` MAY be in the filter (never a false
    * negative). Codegen'd — see [[graft.expressions.BloomMightContain]]. */
  def mightContain(key: Column, bloom: Array[Byte]): Column =
    GraftSqlBridge.column(
      BloomMightContain(GraftSqlBridge.expression(key), bloom))
}
