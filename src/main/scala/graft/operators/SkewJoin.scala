package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Salted equi-join for pathologically hot keys.
  *
  * AQE's skew-join split handles most skew by splitting oversized
  * partitions — but a shuffle join still requires all rows of ONE key
  * to meet in one place per side pairing, so a single key carrying a
  * double-digit percentage of a 100 TB fact table stalls its executor
  * regardless of splits. Salting breaks that key apart: the fact side
  * gets a deterministic salt in [0, saltFactor); the (small) dim side
  * is replicated once per salt value; the join key becomes
  * (key, salt), spreading the hot key over saltFactor tasks.
  *
  * Cost model: dim side grows by saltFactor (fine for dim-sized
  * inputs — use AQE/broadcast instead when the dim fits in memory
  * anyway; salting matters when the dim is too big to broadcast but
  * far smaller than the facts).
  */
object SkewJoin {

  /** Deterministic per-row salt: hash of the salt columns (stable
    * across retries — a random salt would break task re-execution
    * idempotency under speculative execution).
    */
  def salt(saltFactor: Int, stableCols: Column*): Column =
    pmod(xxhash64(stableCols: _*), lit(saltFactor.toLong)).cast("int")

  /** `factSaltCols` MUST vary within a single join-key group (use a
    * row-unique column like a primary key): the salt is a deterministic
    * hash of these columns, so columns constant within the hot key —
    * the join key itself being the degenerate case — give every hot-key
    * row the SAME salt and the operator silently degenerates to a plain
    * join while still paying the saltFactor× dim replication.
    */
  def saltedJoin(
      facts: DataFrame,
      dim: DataFrame,
      key: String,
      saltFactor: Int,
      factSaltCols: Seq[String]
  ): DataFrame = {
    require(
      !factSaltCols.toSet.subsetOf(Set(key)),
      s"factSaltCols $factSaltCols must include a column that varies within join key '$key'; " +
        "salting on the key alone assigns one salt per key and degenerates to a plain join"
    )
    val saltedFacts = facts.withColumn("__salt", salt(saltFactor, factSaltCols.map(col): _*))
    val saltedDim = dim
      .withColumn("__salt", explode(sequence(lit(0), lit(saltFactor - 1))))
    saltedFacts.join(saltedDim, Seq(key, "__salt")).drop("__salt")
  }

  /** Debug diagnostic for the degenerate-salt trap the scaladoc above
    * warns about: the `require` can reject only the literal
    * key-as-salt case — it cannot prove VALUE-level variance, so salt
    * columns that happen to be constant within a hot key (a date
    * column, a tenant id) still silently degenerate to a plain join
    * while paying saltFactor× dim replication. This returns, for the
    * `topKeys` hottest join keys on a deterministic `fraction` sample
    * of the facts, the row count and the number of DISTINCT salts the
    * key's rows receive: a hot key showing 1 salt means the chosen
    * factSaltCols do not vary within it. Run once when wiring a new
    * salted join (one sampled aggregate); not on the hot path.
    */
  def saltSpread(
      facts: DataFrame,
      key: String,
      saltFactor: Int,
      factSaltCols: Seq[String],
      topKeys: Int = 5,
      fraction: Double = 0.01
  ): DataFrame =
    facts
      .sample(withReplacement = false, fraction, seed = 7L)
      .withColumn("__salt", salt(saltFactor, factSaltCols.map(col): _*))
      .groupBy(col(key))
      .agg(count(lit(1)).as("n_rows"), countDistinct(col("__salt")).as("n_salts"))
      .orderBy(col("n_rows").desc, col(key))
      .limit(topKeys)
}
