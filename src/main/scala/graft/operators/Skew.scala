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

  /** SKETCH-DRIVEN skew detection: the join keys whose frequency
    * exceeds `fraction` of the fact rows, recovered by one
    * frequent-items sketch pass ([[graft.plans.Freq]] — Misra-Gries,
    * NO_FALSE_NEGATIVES above its error bound, so a key hot enough
    * to matter cannot be missed; a few cold false positives only
    * cost harmless extra salting). One light aggregation over the
    * key column; the result is model-sized by construction.
    */
  def detectHeavyKeys(facts: DataFrame, key: String,
                      fraction: Double = 0.05,
                      maxMapSize: Int = 1024): Seq[String] = {
    import graft.plans.Freq
    val row = facts
      .agg(Freq.sketch(col(key).cast("string"), maxMapSize).as("sk"),
        count(lit(1)).as("n"))
      .select(explode(Freq.topItems(col("sk"), maxMapSize)).as("hh"),
        col("n"))
      .select(col("hh.item"), col("hh.estimate"), col("n"))
      .collect()
    row.filter(r => r.getLong(1) >= fraction * r.getLong(2))
      .map(_.getString(0)).toSeq.sorted
  }

  /** PARTIAL salting driven by [[detectHeavyKeys]]: only the hot
    * keys pay the salt — their fact rows spread over `saltFactor`
    * sub-keys and only their dim rows replicate; the cold majority
    * joins completely unsalted. Blind salting replicates the WHOLE
    * dim side `saltFactor` times; at 100 TB with a large dim that
    * replication is itself the bottleneck, which is why detection
    * must come first. Result set identical to the plain join
    * (spec-pinned).
    */
  def adaptiveSaltedJoin(facts: DataFrame, dims: DataFrame, key: String,
                         factSaltSource: Column, saltFactor: Int = 8,
                         fraction: Double = 0.05,
                         maxMapSize: Int = 1024): DataFrame = {
    val heavy = detectHeavyKeys(facts, key, fraction, maxMapSize)
    if (heavy.isEmpty) facts.join(dims, Seq(key))
    else {
      val isHeavy = col(key).cast("string").isin(heavy: _*)
      val cold = facts.filter(!isHeavy).join(dims.filter(!isHeavy), Seq(key))
      val hot = saltedJoin(facts.filter(isHeavy), dims.filter(isHeavy),
        key, factSaltSource, saltFactor)
      cold.unionByName(hot)
    }
  }
}
