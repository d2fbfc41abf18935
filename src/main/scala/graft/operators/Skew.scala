package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for joins (SURVEY.md §5).
  *
  * `saltedJoin` splits each hot key into `saltFactor` sub-keys: the
  * fact side gets a deterministic per-row salt, the (small) dim side
  * is replicated once per salt value, and the join key becomes
  * (key, salt). A key holding X% of the fact rows then spreads over
  * `saltFactor` reducers instead of one. Result set is identical to
  * the unsalted join (oracle-checked by `q24_salted_join`).
  *
  * This is the manual tool; AQE's skew-join split handles the same
  * problem at runtime when statistics reveal it (see SkewSpec).
  */
object Skew {

  /** @param factSaltSource any fact column with high cardinality
    *        (e.g. a row id) — hashed into [0, saltFactor) to spread
    *        rows deterministically.
    */
  def saltedJoin(facts: DataFrame, dims: DataFrame, key: String,
                 factSaltSource: Column, saltFactor: Int = 8,
                 joinType: String = "inner"): DataFrame = {
    require(saltFactor > 0)
    val salted = facts.withColumn("__salt",
      pmod(xxhash64(factSaltSource), lit(saltFactor.toLong)).cast("int"))
    val replicated = dims.withColumn("__salt",
      explode(sequence(lit(0), lit(saltFactor - 1))))
    salted.join(replicated, Seq(key, "__salt"), joinType).drop("__salt")
  }
}
