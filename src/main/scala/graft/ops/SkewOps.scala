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
}
