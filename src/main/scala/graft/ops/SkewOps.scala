package graft.ops

import graft.Cols

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for joins whose hot keys overwhelm single reducers —
  * the manual fallback for cases AQE's skew-join splitting can't reach
  * (e.g. a non-shuffle-join forced by strategy, or pre-4.x clusters).
  *
  * `saltedJoin` replicates the small side `saltFactor` times with an added
  * salt column and salts the big side deterministically (hash of the whole
  * row modulo the factor), so each hot key fans out over `saltFactor`
  * reducers. Results are identical to the unsalted equi-join; only the
  * partitioning changes. AQE (on by default in Spark 4) remains the first
  * line of defense — use this when a specific key's skew is known ahead of
  * time.
  */
object SkewOps {

  def saltedJoin(
      big: DataFrame,
      small: DataFrame,
      bigKey: String,
      smallKey: String,
      saltFactor: Int = 8,
      joinType: String = "inner"): DataFrame = {
    require(saltFactor > 0)
    // Deterministic salt: hash of all big-side columns, not rand() —
    // keeps the operator reproducible (oracle-comparable) run to run.
    val bigSalted = big.withColumn("_salt",
      pmod(xxhash64(big.columns.map(Cols.q).toIndexedSeq: _*), lit(saltFactor)).cast("int"))
    val saltSeq = explode(array((0 until saltFactor).map(lit): _*))
    val smallSalted = small.withColumn("_salt", saltSeq)
    bigSalted.join(smallSalted,
        bigSalted("_salt") === smallSalted("_salt") &&
          Cols.q(bigKey) === Cols.q(smallKey), joinType)
      .drop("_salt")
  }

  /** Two-phase (salted) aggregation for heavily skewed group keys: partial
    * aggregate on (key, salt), then final aggregate on key. Spark's
    * hash-aggregate already does map-side partials; this adds an extra
    * reduce tier for the pathological case where even one reducer per key
    * is too much (billions of rows behind a handful of keys).
    */
  def saltedCountSum(
      df: DataFrame,
      keyCol: String,
      valueCol: String,
      saltFactor: Int = 8): DataFrame =
    df.withColumn("_salt",
        pmod(xxhash64(Cols.q(valueCol)), lit(saltFactor)).cast("int"))
      .groupBy(Cols.q(keyCol), col("_salt"))
      .agg(count(lit(1)).as("_n"), sum(Cols.q(valueCol)).as("_s"))
      .groupBy(Cols.q(keyCol))
      .agg(sum(col("_n")).as("n"), sum(col("_s")).as("sum"))

  /** Heavy-hitter (key-skew) report: the `topK` most frequent values of
    * `keyCol` per group, with each key's share of the group's rows and
    * the running (cumulative) share in micro units — the diagnostic a
    * skew investigation starts from ("which 10 keys hold 80% of this
    * join input?"). Ties rank deterministically by key value.
    *
    * All-integer: counts are exact longs and both shares are single
    * integral `div`s of `count·10⁶`, so the report hash-oracles.
    *
    * Scale: one hash shuffle onto (group, key) cells with map-side
    * partial counts — raw rows never move wholesale — then a per-group
    * window over the REDUCED cell relation (|distinct keys| rows, not
    * |rows|). A group with billions of distinct keys would make that
    * window sort the bottleneck; cap it by pre-filtering cells on a
    * minimum count before ranking, exactly as `topKPerGroup` does.
    */
  def heavyHitters(
      df: DataFrame,
      groupCols: Seq[String],
      keyCol: String,
      topK: Int): DataFrame = {
    require(topK > 0, "heavyHitters needs topK > 0")
    val g = groupCols.map(Cols.q)
    import org.apache.spark.sql.expressions.Window
    val grp = Window.partitionBy(g: _*)
    val ord = grp.orderBy(col("cnt").desc, Cols.q(keyCol))
    df.groupBy(g :+ Cols.q(keyCol): _*)
      .agg(count(lit(1)).as("cnt"))
      .withColumn("_hh_total", sum(col("cnt")).over(grp))
      .withColumn("hh_rank", row_number().over(ord).cast("long"))
      .withColumn("_hh_cum", sum(col("cnt")).over(
        ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .filter(col("hh_rank") <= topK)
      .select(g ++ Seq(Cols.q(keyCol), col("hh_rank"), col("cnt"),
        expr("cnt * 1000000 div _hh_total").as("share_micro"),
        expr("_hh_cum * 1000000 div _hh_total").as("cum_share_micro")): _*)
  }
}
