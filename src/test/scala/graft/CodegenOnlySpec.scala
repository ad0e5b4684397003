package graft

import org.scalatest.funsuite.AnyFunSuite

/** Registry-wide codegen compilation sweep: run every registered query
  * once at sf0.001 with `spark.sql.codegen.factoryMode=CODEGEN_ONLY`,
  * which turns Spark's SILENT interpreted fallback on a codegen compile
  * failure into a hard error.
  *
  * Why this exists: a broken `doGenCode` template (e.g. the
  * margin-char corruption pinned in TextFunctionsSpec) keeps every
  * correctness gate green — the interpreted path computes the same
  * values — while quietly costing the compiled execution the native
  * expressions exist for. The only default-config symptom is an ERROR
  * log line buried in test output. This sweep makes "every registry
  * query compiles end-to-end under codegen" an asserted invariant
  * instead of a log-grep. Expressions Spark itself marks
  * CodegenFallback still embed interpreted calls inside compiled code
  * and pass — the sweep catches code that FAILS TO COMPILE, which is
  * exactly the regression class we've hit. */
class CodegenOnlySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val d = "/root/testdata/sf0.001"

  test("every registered query compiles under CODEGEN_ONLY") {
    // Two silent-fallback paths must BOTH be closed for this to be the
    // "compiles end-to-end" invariant it claims:
    //  - factoryMode=CODEGEN_ONLY: a standalone projection/predicate
    //    codegen failure errors instead of running interpreted;
    //  - codegen.fallback=false: a WHOLE-STAGE compile failure errors
    //    instead of silently re-running the stage un-fused — a
    //    doGenCode defect that only manifests when inlined into fused
    //    stage code (fine as a lone projection) would otherwise pass.
    val prevFactory = spark.conf.getOption("spark.sql.codegen.factoryMode")
    val prevFallback = spark.conf.getOption("spark.sql.codegen.fallback")
    spark.conf.set("spark.sql.codegen.factoryMode", "CODEGEN_ONLY")
    spark.conf.set("spark.sql.codegen.fallback", "false")
    try {
      val failures = SparkEntry.registry.flatMap { q =>
        try { q.run(spark, d).count(); None }
        catch { case e: Throwable =>
          Some(s"${q.name}: ${e.getClass.getSimpleName} ${e.getMessage}")
        }
      }
      assert(failures.isEmpty,
        s"queries failing under CODEGEN_ONLY:\n${failures.mkString("\n")}")
    } finally {
      prevFactory.fold(spark.conf.unset("spark.sql.codegen.factoryMode"))(
        v => spark.conf.set("spark.sql.codegen.factoryMode", v))
      prevFallback.fold(spark.conf.unset("spark.sql.codegen.fallback"))(
        v => spark.conf.set("spark.sql.codegen.fallback", v))
    }
  }
}
