package graft

import graft.functions.Hamming64
import graft.functions.Hamming64.hamming64
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class Hamming64Spec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("hamming64 matches Long.bitCount(xor) across the codegen path") {
    import spark.implicits._
    val r = new scala.util.Random(99)
    val rows = Seq.fill(500)((r.nextLong(), r.nextLong()))
    val got = rows.toDF("a", "b")
      .select(hamming64(col("a"), col("b"))).as[Int].collect()
    val want = rows.map { case (a, b) => java.lang.Long.bitCount(a ^ b) }
    assert(got.toSeq === want)
  }

  test("hamming64 null handling") {
    import spark.implicits._
    val df = Seq((Some(1L), None: Option[Long]), (Some(3L), Some(1L)))
      .toDF("a", "b")
      .select(hamming64(col("a"), col("b")).as("h"))
    val r = df.collect()
    assert(r(0).isNullAt(0))
    assert(r(1).getInt(0) === 1)
  }

  test("hamming64 registered for SQL") {
    Hamming64.register(spark)
    val r = spark.sql("SELECT hamming64(7, 1) AS h").head.getInt(0)
    assert(r === 2)
  }

  test("hamming64 stays inside whole-stage codegen") {
    import spark.implicits._
    // read from parquet so the scan feeds a codegen stage (a local
    // relation of literals is constant-folded before reaching codegen)
    val df = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
      .select(hamming64(col("l_orderkey"), col("l_partkey")).as("h"))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("*(") || plan.contains("WholeStageCodegen"),
      s"plan lacks codegen:\n$plan")
    assert(df.agg(sum("h")).head.getLong(0) > 0)
  }
}
