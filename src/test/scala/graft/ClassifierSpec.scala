package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Classifier

class ClassifierSpec extends AnyFunSuite {
  import SparkTestSession._

  test("logreg separates a linearly separable toy set; refit is bitwise identical") {
    import spark.implicits._
    val rows = (0 until 200).map { i =>
      val x = (i % 100) / 100.0
      (i.toLong, 1.0, x, if (x > 0.5) 1.0 else 0.0)
    }
    val df = rows.toDF("id", "x0", "x1", "y").repartition(4)
    val w1 = Classifier.trainLogreg(df, Seq("x0", "x1"), "y", iters = 50, lr = 5.0)
    val w2 = Classifier.trainLogreg(df, Seq("x0", "x1"), "y", iters = 50, lr = 5.0)
    // the whole oracle premise: per-iteration 6-decimal quantization absorbs
    // partition-order float-sum wiggle, so two fits agree BITWISE
    assert(w1.toSeq == w2.toSeq)
    val scored = df
      .select(col("y"), Classifier.margin(Seq("x0", "x1"), w1.toSeq).as("z"))
      .collect()
    val acc = scored.count(r => (r.getDouble(1) > 0) == (r.getDouble(0) > 0.5)).toDouble /
      scored.length
    assert(acc >= 0.9, s"separable toy set should fit, got accuracy $acc")
  }

  test("standardize: quantized z-scores, constant columns center to zero without NaN") {
    import spark.implicits._
    val df = Seq((1.0, 5.0), (3.0, 5.0), (5.0, 5.0)).toDF("a", "b")
    val (out, stats) = Classifier.standardize(df, Seq("a", "b"))
    assert(stats(0) == ((3.0, round6(math.sqrt(8.0 / 3.0)))))
    assert(stats(1) == ((5.0, 1.0))) // zero std -> divisor 1, never NaN
    val rows = out.collect().map(r => (r.getDouble(0), r.getDouble(1)))
    assert(rows.forall(r => !r._1.isNaN && r._2 == 0.0))
    assert(math.abs(rows.map(_._1).sum) < 1e-6) // centered
  }

  test("classifier_quality beats the majority-class baseline on the real fixture") {
    val out = QueriesLlm.queries("classifier_quality")(spark, SfDir).collect()
    assert(out.nonEmpty)
    val acc = out.count(r => r.getBoolean(2) == (r.getLong(3) == 1L)).toDouble / out.length
    val posFrac = out.count(_.getLong(3) == 1L).toDouble / out.length
    val majority = math.max(posFrac, 1 - posFrac)
    assert(posFrac > 0.2 && posFrac < 0.8, s"bootstrap labels should be balanced, got $posFrac")
    assert(acc > majority + 0.1,
      s"learned filter should clearly beat always-majority: acc=$acc majority=$majority")
  }

  private def round6(v: Double): Double =
    BigDecimal(v).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("guards: dimension mismatch and degenerate hyperparameters fail loudly") {
    import spark.implicits._
    val df = Seq((1.0, 1.0)).toDF("x0", "y")
    intercept[IllegalArgumentException](Classifier.margin(Seq("x0"), Seq(1.0, 2.0)))
    intercept[IllegalArgumentException](
      Classifier.trainLogreg(df, Seq.empty, "y", iters = 1, lr = 1.0))
    intercept[IllegalArgumentException](
      Classifier.trainLogreg(df, Seq("x0"), "y", iters = 0, lr = 1.0))
    intercept[IllegalArgumentException](
      Classifier.trainLogreg(df, Seq("x0"), "y", iters = 1, lr = 0.0))
  }
}
