package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Backward as-of join — for each left row, the most recent right row with
  * `right.ts <= left.ts` on the same key (the standard time-series
  * enrichment: "state as of this event": last trade before the quote, last
  * config push before the request, last purchase before the pageview).
  *
  * Spark has no built-in as-of join, and the naive formulation — a theta
  * join on `l.key = r.key AND r.ts <= l.ts` plus an argmax — plans as an
  * equi-join whose output EXPLODES to Σ_key |L_k|·|R_k(≤t)| rows before the
  * per-row argmax prunes them: quadratic per hot key at 100 TB. This
  * implementation is the union-sort formulation instead: tag both sides,
  * union, and forward-fill the latest right payload over a
  * (key)-partitioned (ts, side) ordering — ONE hash exchange on the key and
  * a sort, O((|L|+|R|) log) per partition, no intermediate blow-up, and the
  * window is AQE/skew-split friendly. Right rows order BEFORE left rows at
  * equal timestamps, giving exact `<=` semantics.
  *
  * Determinism contract: at most one right row per (key, ts) — pre-aggregate
  * duplicates (the fixture queries take max(value)) or the "latest" row at a
  * tied timestamp is undefined in ANY as-of engine. `requireUniqueRightTs`
  * is not enforced at runtime (it would cost a shuffle); the oracle-checked
  * queries dedupe explicitly.
  *
  * `toleranceSec`: with `Some(n)`, a match older than `n` whole seconds
  * before the left timestamp is nulled out (pandas `merge_asof(tolerance)`
  * semantics), computed on `unix_timestamp` whole seconds to match the
  * engine's session-gap arithmetic.
  */
object AsofJoin {

  def asofBackward(
      left: DataFrame,
      right: DataFrame,
      key: String,
      leftTs: String,
      rightTs: String,
      rightVals: Seq[String],
      toleranceSec: Option[Long] = None): DataFrame = {
    val clash = rightVals.toSet.intersect(left.columns.toSet)
    require(clash.isEmpty, s"right value columns collide with left columns: ${clash.mkString(", ")}")
    val helpers = Seq("__asof_side", "__t", "__rv", "__rts", "__m")
    val tainted = (left.columns ++ right.columns).toSet.intersect(helpers.toSet)
    require(tainted.isEmpty,
      s"inputs must not carry the as-of helper columns: ${tainted.mkString(", ")}")

    val r = right.select(
      col(key),
      col(rightTs).as("__t"),
      lit(0).as("__asof_side"),
      struct(col(rightTs).as("__rts") +: rightVals.map(col): _*).as("__rv"))
    val l = left.select(
      col(key) +: col(leftTs).as("__t") +: lit(1).as("__asof_side") +:
        left.columns.filterNot(_ == key).map(col).toSeq: _*)

    // left rows lack __rv, right rows lack the left payload — unionByName
    // null-extends both; the window then threads the latest right struct
    // through to every later row of the key
    val unioned = r.unionByName(l, allowMissingColumns = true)
    val w = Window.partitionBy(col(key))
      .orderBy(col("__t"), col("__asof_side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val filled = unioned.withColumn("__m", last(col("__rv"), ignoreNulls = true).over(w))

    val inTolerance = toleranceSec match {
      case Some(n) =>
        unix_timestamp(col("__t")) - unix_timestamp(col("__m").getField("__rts")) <= n
      case None => lit(true)
    }
    val matched = when(col("__m").isNotNull && inTolerance, col("__m"))

    val outCols = (col(key) +: left.columns.filterNot(_ == key).map(col).toSeq) ++
      rightVals.map(v => matched.getField(v).as(v))
    filled.where(col("__asof_side") === 1).select(outCols: _*)
  }

  /** Forward as-of join — for each left row, the EARLIEST right row with
    * `right.ts >= left.ts` on the same key ("what happened next": next
    * restock after the stock-out, next deploy after the alert, next
    * purchase after the pageview). Same union-sort formulation as
    * [[asofBackward]] mirrored in time — ONE keyed exchange, a
    * backward-fill window over (ts, side) with LEFT rows ordering before
    * right rows at equal timestamps (exact `>=` semantics), no
    * intermediate pair blow-up. `toleranceSec`: a match more than `n`
    * whole seconds AFTER the left timestamp is nulled out. Same
    * determinism contract: at most one right row per (key, ts).
    */
  def asofForward(
      left: DataFrame,
      right: DataFrame,
      key: String,
      leftTs: String,
      rightTs: String,
      rightVals: Seq[String],
      toleranceSec: Option[Long] = None): DataFrame = {
    val clash = rightVals.toSet.intersect(left.columns.toSet)
    require(clash.isEmpty, s"right value columns collide with left columns: ${clash.mkString(", ")}")
    val helpers = Seq("__asof_side", "__t", "__rv", "__rts", "__m")
    val tainted = (left.columns ++ right.columns).toSet.intersect(helpers.toSet)
    require(tainted.isEmpty,
      s"inputs must not carry the as-of helper columns: ${tainted.mkString(", ")}")

    // left rows take side 0 so they sort BEFORE an equal-timestamp right
    // row and see it in their forward frame (the mirror of backward's
    // right-before-left ordering)
    val r = right.select(
      col(key),
      col(rightTs).as("__t"),
      lit(1).as("__asof_side"),
      struct(col(rightTs).as("__rts") +: rightVals.map(col): _*).as("__rv"))
    val l = left.select(
      col(key) +: col(leftTs).as("__t") +: lit(0).as("__asof_side") +:
        left.columns.filterNot(_ == key).map(col).toSeq: _*)

    val unioned = r.unionByName(l, allowMissingColumns = true)
    val w = Window.partitionBy(col(key))
      .orderBy(col("__t"), col("__asof_side"))
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val filled = unioned.withColumn("__m", first(col("__rv"), ignoreNulls = true).over(w))

    val inTolerance = toleranceSec match {
      case Some(n) =>
        unix_timestamp(col("__m").getField("__rts")) - unix_timestamp(col("__t")) <= n
      case None => lit(true)
    }
    val matched = when(col("__m").isNotNull && inTolerance, col("__m"))

    val outCols = (col(key) +: left.columns.filterNot(_ == key).map(col).toSeq) ++
      rightVals.map(v => matched.getField(v).as(v))
    filled.where(col("__asof_side") === 0).select(outCols: _*)
  }

  /** POINT-IN-TIME MULTI-FEATURE JOIN — the feature-store backfill shape:
    * enrich every request row with the latest value of EVERY feature
    * relation as of the request timestamp (`feature.ts <= request.ts`),
    * with K features resolved in ONE union + ONE key-partitioned window
    * pass. K chained [[asofBackward]]s would pay K key-shuffles and K
    * sorts over the (growing) request relation; here the shuffle count is
    * independent of K — the property that makes 100-feature training-set
    * backfills tractable (the public point-in-time-correctness discipline
    * every feature platform documents: no value from the future may leak
    * into a training row).
    *
    * Contract: each feature is `(name, df)` where `df` carries exactly
    * `(key, ts, value)` under the caller's key/ts column names; at most
    * one row per `(key, ts)` per feature (pre-aggregate duplicates — the
    * [[asofBackward]] determinism contract). Feature rows order BEFORE
    * requests at equal timestamps, giving exact `<=` semantics. Output:
    * the request rows plus one nullable column per feature name (null =
    * no observation at or before the request).
    */
  def pitJoinMulti(
      requests: DataFrame,
      key: String,
      ts: String,
      features: Seq[(String, DataFrame)]): DataFrame = {
    require(features.nonEmpty, "pitJoinMulti: need at least one feature")
    val names = features.map(_._1)
    require(names.distinct == names, s"pitJoinMulti: duplicate feature names in $names")
    val k = features.size
    val legs = features.zipWithIndex.map { case ((name, df), i) =>
      require(df.columns.length == 3,
        s"pitJoinMulti: feature '$name' must carry exactly (key, ts, value), got ${df.columns.toSeq}")
      val valueCol = df.columns.filterNot(c => c == key || c == ts).head
      df.select(
        col(key) +: col(ts).as("__t") +: lit(i).as("__side") +:
          names.zipWithIndex.map { case (n, j) =>
            (if (j == i) col(valueCol) else lit(null)).as(s"__f_$n")
          }: _*)
    }
    // requests sort AFTER every equal-timestamp feature row (<= semantics)
    val reqLeg = requests.select(
      col(key) +: col(ts).as("__t") +: lit(k).as("__side") +:
        (requests.columns.filterNot(c => c == key || c == ts).map(col).toSeq ++
          names.map(n => lit(null).as(s"__f_$n"))): _*)
    val unioned = legs.reduce(_ unionByName _)
      .unionByName(reqLeg, allowMissingColumns = true)
    val w = Window.partitionBy(col(key))
      .orderBy(col("__t"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val filled = names.foldLeft(unioned) { (df, n) =>
      df.withColumn(s"__f_$n", last(col(s"__f_$n"), ignoreNulls = true).over(w))
    }
    filled.where(col("__side") === k)
      .select(
        (col(key) +: col("__t").as(ts) +:
          requests.columns.filterNot(c => c == key || c == ts).map(col).toSeq) ++
          names.map(n => col(s"__f_$n").as(n)): _*)
  }
}
