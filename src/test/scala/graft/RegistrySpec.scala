package graft

import org.scalatest.funsuite.AnyFunSuite

/** Registry-wide smoke: every registered query runs at sf0.001 and
  * returns a deterministic row count across two executions. Catches a
  * broken query before the driver's full DuckDB gate does. */
class RegistrySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val d = "/root/testdata/sf0.001"

  test("every registered query has oracle SQL or is explicitly rows-only") {
    // sketch outputs are engine-specific by design (HLL, GK quantiles)
    // and k-means codebooks are not ANSI-SQL-expressible; their
    // accuracy/recall bounds are asserted in OperatorSpec / PQSpec
    val noOracle = SparkEntry.registry.filter(_.oracle.isEmpty).map(_.name)
    assert(noOracle == Seq("q94_approx_percentiles", "q63_approx_distinct",
        "q100_pq_ann", "q110_ivf_pq_ann"),
      s"unexpected rows-only queries: $noOracle")
  }

  test("registry names are unique") {
    val names = SparkEntry.registry.map(_.name)
    assert(names.distinct.size == names.size)
  }

  SparkEntry.registry.foreach { q =>
    test(s"${q.name} runs and is deterministic at sf0.001") {
      val n1 = q.run(spark, d).count()
      val n2 = q.run(spark, d).count()
      assert(n1 == n2)
      assert(n1 >= 0)
    }
  }

  test("entry returns rows (driver smoke contract)") {
    assert(SparkEntry.entry(spark).count() > 0)
  }
}
