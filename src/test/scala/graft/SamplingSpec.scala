package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Sampling

class SamplingSpec extends AnyFunSuite {
  import SparkTestSession._

  private val fractions = Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)

  test("mixtureWeights: sqrt temperature in exact ppm, tail share upweighted") {
    import spark.implicits._
    val mk = (n: Int) => (1 to n).map(i => s"t$i").mkString(" ")
    val docs = Seq(("a", 1L, mk(20)), ("b", 2L, mk(80)))
      .toDF("source", "doc_id", "text")
    val got = Sampling.mixtureWeights(docs).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    // sqrt(0.2)·1e6 = 447213.59… → 447213; sqrt(0.8)·1e6 = 894427.19… → 894427
    assert(got("a") == ((1L, 20L, 447213L)))
    assert(got("b") == ((1L, 80L, 894427L)))
    // the α=0.5 propensity lifts the tail above its raw 20% share
    val (wa, wb) = (got("a")._3.toDouble, got("b")._3.toDouble)
    assert(wa / (wa + wb) > 0.2)
  }

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

  test("stratified sample: per-stratum rates honored, non-listed strata untouched, nested in the fraction") {
    import org.apache.spark.sql.functions._
    val d = Tables.documents(spark, SfDir)
      .withColumn("stratum", when(col("doc_id") % 2 === 0, "even").otherwise("odd"))
    def ids(f: Double) =
      Sampling.hashSampleByStratum(d, "doc_id", col("stratum"), Map("even" -> f))
        .select("doc_id").collect().map(_.getLong(0)).toSet
    val all = d.select("doc_id").collect().map(_.getLong(0)).toSet
    val odd = all.filter(_ % 2 == 1)
    val at25 = ids(0.25)
    val at50 = ids(0.5)
    // non-listed stratum passes through at the default fraction 1.0
    assert(odd.subsetOf(at25) && odd.subsetOf(at50))
    // thinned stratum is a strict subsample at a plausible rate
    val evenKept = (at25 -- odd).size.toDouble / (all.size - odd.size)
    assert(evenKept > 0.1 && evenKept < 0.45, s"even kept rate $evenKept far from 0.25")
    // monotone thresholds: raising the rate only ADDS docs (nested samples)
    assert(at25.subsetOf(at50), "sample at 0.25 must be nested inside sample at 0.5")
    // membership is a pure key function: repartitioning changes nothing
    assert(ids(0.25) == Sampling.hashSampleByStratum(
      d.repartition(7), "doc_id", col("stratum"), Map("even" -> 0.25))
      .select("doc_id").collect().map(_.getLong(0)).toSet)
  }

  test("stratified sample rejects out-of-range fractions") {
    import org.apache.spark.sql.functions._
    val d = Tables.documents(spark, SfDir)
    intercept[IllegalArgumentException] {
      Sampling.hashSampleByStratum(d, "doc_id", col("text"), Map("x" -> 1.5))
    }
    intercept[IllegalArgumentException] {
      Sampling.hashSampleByStratum(d, "doc_id", col("text"), Map.empty)
    }
  }

  test("rejects NULL keys at runtime instead of silently bucketing them") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val d = Seq(Some(1L), None).toDF("doc_id")
    val ex = intercept[Exception] {
      Sampling.withHashSplit(d, "doc_id", fractions).collect()
    }
    // Spark wraps the raise_error in a SparkRuntimeException whose message
    // carries the user payload
    assert(ex.getMessage.contains("null key") || ex.getMessage.contains("NULL doc_id"),
      s"unexpected error: ${ex.getMessage}")
    val ex2 = intercept[Exception] {
      Sampling.hashSampleByStratum(
        d.withColumn("stratum", lit("x")), "doc_id", col("stratum"), Map("x" -> 0.5))
        .collect()
    }
    assert(ex2.getMessage.contains("NULL doc_id"), s"unexpected error: ${ex2.getMessage}")
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

  test("dsir: target-vocabulary docs score positive, off-target docs negative") {
    import spark.implicits._
    val raw = Seq(
      (1L, "alpha beta alpha beta alpha beta"),
      (2L, "alpha beta alpha beta gamma alpha"),
      (3L, "zulu yankee zulu yankee zulu yankee"),
      (4L, "zulu yankee xray zulu yankee zulu")).toDF("doc_id", "text")
    val w = Sampling.dsirWeights(raw, raw.where(col("doc_id") <= 2)).collect()
      .map(r => r.getLong(0) -> (r.getDouble(1), r.getBoolean(2))).toMap
    assert(w(1L)._2 && w(2L)._2, s"target members must look target-like: $w")
    assert(!w(3L)._2 && !w(4L)._2, s"off-target docs must score negative: $w")
    // selected is exactly the sign of the quantized weight
    w.values.foreach { case (lw, sel) => assert(sel == lw > 0) }
  }

  test("dsir on the real corpus: one row per 2+-token doc, both verdicts present") {
    val docs = Tables.documents(spark, SfDir)
    val out = QueriesLlm.queries("dsir_weights")(spark, SfDir).collect()
    val expected = docs
      .where(size(graft.operators.TextAnalysis.tokens(col("text"))) >= 2).count()
    assert(out.length == expected)
    assert(out.map(_.getLong(0)).distinct.length == out.length)
    val sel = out.count(_.getBoolean(2))
    assert(sel > 0 && sel < out.length,
      s"weights should separate the corpus, got $sel/${out.length} selected")
  }

  test("neymanSample: allocation favors dispersion, caps at population, pins membership") {
    import spark.implicits._
    // stratum a: 10 rows, constant value (spread 1, w = 10)
    // stratum b: 5 rows, values 0..900 step 225 (spread 901, w = 4505)
    // stratum c: 2 rows, spread 2001 (w = 4002) — population cap binds
    val rows =
      (0 until 10).map(i => (100L + i, "a", 50L)) ++
        (0 until 5).map(i => (200L + i, "b", i * 225L)) ++
        Seq((301L, "c", 0L), (302L, "c", 2000L))
    val df = rows.toDF("doc_id", "src", "v")
    val got = Sampling.neymanSample(df, "doc_id", col("src"), col("v"), budget = 8L)
      .collect()
      .map(r => r.getString(0) ->
        ((r.getAs[Long]("n_pop"), r.getAs[Long]("spread"),
          r.getAs[Long]("alloc"), r.getAs[Long]("n_sampled"), r.getAs[Long]("sum_key"))))
      .toMap
    assert(got.keySet == Set("a", "b", "c"))
    assert(got("a")._2 == 1L && got("b")._2 == 901L && got("c")._2 == 2001L)
    // w_total = 8517; floors are a=0 (rem 80), b=4 (rem 1972), c=3
    // (rem 6465); the single Hamilton leftover seat goes to c (largest
    // remainder) whose 2-row population then caps the quota
    assert(got("a")._3 == 0L && got("b")._3 == 4L && got("c")._3 == 2L, s"got $got")
    assert(got("c")._4 == 2L && got("c")._5 == 301L + 302L)
    // the high-dispersion strata outdraw the constant one
    assert(got("b")._3 > got("a")._3 && got("c")._3 > got("a")._3)
    // realized == allocated everywhere, never above population
    got.values.foreach { case (nPop, _, alloc, nSampled, _) =>
      assert(nSampled == alloc && alloc <= nPop)
    }
    // membership is a pure function of the data: a second run pins the
    // identical sum_key per stratum
    val again = Sampling.neymanSample(df, "doc_id", col("src"), col("v"), budget = 8L)
      .collect().map(r => r.getString(0) -> r.getAs[Long]("sum_key")).toMap
    assert(again == got.view.mapValues(_._5).toMap)
  }

  test("weightedSample: w=1 priority is the plain key hash; max-of-w only grows it") {
    import spark.implicits._
    val keys = (1L to 50L).toDF("doc_id")
    def prios(w: Int) = Sampling
      .weightedSample(keys, "doc_id", lit(w), k = 50, maxWeight = 8)
      .collect().map(r => r.getLong(0) -> r.getAs[Long]("priority")).toMap
    val p1 = prios(1)
    // w=1 is exactly one hash of "key#1"
    val direct = keys
      .select(col("doc_id"),
        Sampling.hashLong(concat(col("doc_id").cast("string"), lit("#1"))).as("h"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(p1 == direct)
    // adding hashes to the max can only raise a key's priority (the
    // monotonicity that makes weight upgrades stable)
    val p4 = prios(4)
    assert(p1.forall { case (k, v) => p4(k) >= v })
    assert(p4.exists { case (k, v) => v > p1(k) })
  }

  test("weightedSample: heavier keys win more slots, and the cut is the exact top-k") {
    import spark.implicits._
    // 200 keys, half weight 1, half weight 8
    val df = (1L to 200L).toDF("doc_id")
      .withColumn("w", when(col("doc_id") <= 100, 1L).otherwise(8L))
    val got = Sampling.weightedSample(df, "doc_id", col("w"), k = 50, maxWeight = 8)
      .collect()
    assert(got.length == 50)
    val heavy = got.count(_.getLong(0) > 100)
    // E[heavy] ≈ 44 of 50 under the 8:1 odds; anything near-even means the
    // weighting is broken. Deterministic fixture, so no flake margin needed.
    assert(heavy > 35, s"weight-8 keys won only $heavy of 50 slots")
    // the selected set is EXACTLY the top-k of the full priority ranking
    val all = Sampling.weightedSample(df, "doc_id", col("w"), k = 200, maxWeight = 8)
      .collect().sortBy(r => (-r.getAs[Long]("priority"), r.getLong(0)))
    assert(got.map(_.getLong(0)).toSeq == all.take(50).map(_.getLong(0)).toSeq)
  }

  test("weightedSample rejects out-of-range and fractional weights at runtime") {
    import spark.implicits._
    val df = Seq(1L, 2L).toDF("doc_id")
    def run(w: org.apache.spark.sql.Column) =
      Sampling.weightedSample(df, "doc_id", w, k = 2, maxWeight = 8).collect()
    intercept[Exception](run(lit(0)))
    intercept[Exception](run(lit(9)))
    intercept[Exception](run(lit(2.5)))
    intercept[IllegalArgumentException](
      Sampling.weightedSample(df, "doc_id", lit(1), k = 0, maxWeight = 8))
  }

  test("perKeySample: equals the window-rank reference, k bounds every group") {
    val docs = Tables.documents(spark, SfDir)
    val got = Sampling.perKeySample(docs, col("source"), "doc_id", k = 3).collect()
    // every group emits at most k, ranks are 1..n
    got.groupBy(_.getString(0)).foreach { case (_, rs) =>
      assert(rs.length <= 3)
      assert(rs.map(_.getLong(1)).sorted.toSeq == (1L to rs.length).toSeq)
    }
    // reference: the window-rank idiom over the same (hash DESC, string ASC)
    import org.apache.spark.sql.expressions.Window
    val ref = docs
      .select(col("source"), col("doc_id").cast("string").as("ks"))
      .withColumn("priority", Sampling.hashLong(col("ks")))
      .withColumn("rank", row_number().over(
        Window.partitionBy(col("source"))
          .orderBy(col("priority").desc, col("ks"))))
      .where(col("rank") <= 3)
      .select(col("source"), col("rank").cast("long"),
        col("ks").cast("long"), col("priority"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet == ref.toSet)
  }

  test("groupKFold: groups stay whole, folds balanced to one group, NULL groups refused") {
    import spark.implicits._
    // 10 groups x 3 rows; k=4 -> fold sizes differ by at most one GROUP
    val df = (0 until 10).flatMap(g => (0 until 3).map(i => (s"g$g", g * 3 + i)))
      .toDF("grp", "x")
    val out = Sampling.groupKFold(df, col("grp"), k = 4, seed = "kf-test")
    assert(out.count() == 30L, "the output is the input plus a fold column")
    assert(out.columns.toSeq == Seq("grp", "x", "fold"))
    val perGroup = out.groupBy("grp").agg(countDistinct(col("fold")).as("nf"))
      .collect().map(_.getLong(1))
    assert(perGroup.forall(_ == 1L), "every row of a group lands in ONE fold")
    val groupsPerFold = out.select("grp", "fold").distinct()
      .groupBy("fold").count().collect().map(_.getLong(1))
    assert(groupsPerFold.sum == 10L && groupsPerFold.max - groupsPerFold.min <= 1L,
      s"folds balance by group count, got ${groupsPerFold.toSeq}")
    // deterministic: same seed reproduces the same assignment
    val again = Sampling.groupKFold(df, col("grp"), k = 4, seed = "kf-test")
    assert(out.select("grp", "fold").distinct().collect().toSet ==
      again.select("grp", "fold").distinct().collect().toSet)
    // NULL group key refused loudly, not silently dropped (the r11 bug)
    val withNull = df.union(Seq((null.asInstanceOf[String], 99)).toDF("grp", "x"))
    val ex = intercept[Exception] {
      Sampling.groupKFold(withNull, col("grp"), k = 4, seed = "kf-test").collect()
    }
    assert(ex.getMessage.contains("NULL group key"), s"unexpected: ${ex.getMessage}")
  }
}
