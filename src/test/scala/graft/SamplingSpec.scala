package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Sampling

class SamplingSpec extends AnyFunSuite {
  import SparkTestSession._

  private val fractions = Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)

  test("hash split is a pure function of the key: repartition-invariant") {
    val d = Tables.documents(spark, SfDir)
    def splits(df: org.apache.spark.sql.DataFrame) =
      Sampling.withHashSplit(df, "doc_id", fractions)
        .select("doc_id", "split").collect()
        .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(splits(d) == splits(d.repartition(7)))
  }

  test("split proportions track the requested fractions") {
    val d = Tables.documents(spark, SfDir)
    val n = d.count().toDouble
    val got = Sampling.withHashSplit(d, "doc_id", fractions)
      .groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1) / n).toMap
    fractions.foreach { case (name, f) =>
      val p = got.getOrElse(name, 0.0)
      // md5 uniformity over 500 keys: ±6 percentage points is generous
      assert(math.abs(p - f) < 0.06, s"$name: got $p, wanted ~$f")
    }
  }

  test("rejects NULL keys at runtime instead of silently bucketing them") {
    import spark.implicits._
    val d = Seq(Some(1L), None).toDF("doc_id")
    val ex = intercept[Exception] {
      Sampling.withHashSplit(d, "doc_id", fractions).collect()
    }
    // Spark wraps the raise_error in a SparkRuntimeException whose message
    // carries the user payload
    assert(ex.getMessage.contains("null key") || ex.getMessage.contains("NULL doc_id"),
      s"unexpected error: ${ex.getMessage}")
  }

  test("rejects non-normalized fractions and split-column collisions") {
    val d = Tables.documents(spark, SfDir)
    intercept[IllegalArgumentException] {
      Sampling.withHashSplit(d, "doc_id", Seq("a" -> 0.5, "b" -> 0.4))
    }
    intercept[IllegalArgumentException] {
      Sampling.withHashSplit(
        Sampling.withHashSplit(d, "doc_id", fractions), "doc_id", fractions)
    }
  }
}
