package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-aware equi-join: salt the skewed (big) side into `salt`
  * sub-keys and replicate the other side once per sub-key, so a hot key
  * spreads over `salt` reducers instead of melting one.
  *
  * When to use: AQE's skew-join handles sort-merge skew automatically
  * at runtime; explicit salting remains the tool when (a) the join is
  * broadcast-ineligible AND a few keys dominate so badly that even
  * AQE's split granularity (shuffle-block sized) leaves stragglers, or
  * (b) the skew is known ahead of time and you want a deterministic
  * plan. The salt is derived from the big side's row content (hash of
  * all columns mod salt) — deterministic, no RNG state on executors.
  *
  * Cost model: big side unchanged (one shuffle on (key, salt)); small
  * side replicated ×salt (explode) — choose salt ≈ hot-key volume /
  * target-partition volume, keeping smallDf × salt well under the big
  * side.
  */
object SkewJoin {

  /** Join types salting is sound for: the small side is replicated once
    * per salt value, so any join that can emit UNMATCHED small-side rows
    * (right/full outer) would emit each of them `salt` times.
    */
  private val SoundJoinTypes =
    Set("inner", "left", "leftouter", "leftsemi", "semi", "leftanti", "anti")

  def saltedEquiJoin(big: DataFrame, small: DataFrame, key: String,
      salt: Int, joinType: String = "inner"): DataFrame = {
    require(salt >= 1, "salt must be >= 1")
    val normalized = joinType.toLowerCase.replace("_", "")
    require(SoundJoinTypes.contains(normalized),
      s"saltedEquiJoin supports inner/left-style joins only (got '$joinType'): " +
        "with right/full outer each unmatched small-side row is replicated " +
        "once per salt value and would be emitted salt times")
    val bigCols = big.columns
    val salted = big.withColumn("__salt",
      pmod(hash(bigCols.map(col): _*), lit(salt)))
    val replicated = small.withColumn("__salt",
      explode(sequence(lit(0), lit(salt - 1))))
    salted.join(replicated, Seq(key, "__salt"), joinType).drop("__salt")
  }

  /** Convenience: salt only rows whose key is in `hotKeys`; everything
    * else joins unsalted (no replication cost for the long tail). The
    * two-branch union keeps the common case at salt=1.
    */
  def saltedEquiJoinHotKeys(big: DataFrame, small: DataFrame, key: String,
      hotKeys: Seq[Any], salt: Int, joinType: String = "inner"): DataFrame = {
    // null keys route to the COLD branch: isin() evaluates to null for a
    // null key, so a plain !isHot filter would drop null-key rows from
    // both branches — null-safe-compare against true keeps them (they
    // never equi-match, but a left join must still emit them)
    val isHot: Column = col(key).isin(hotKeys: _*) <=> lit(true)
    val hot = saltedEquiJoin(big.filter(isHot), small.filter(isHot), key,
      salt, joinType)
    val cold = big.filter(!isHot).join(small.filter(!isHot), Seq(key), joinType)
    hot.unionByName(cold)
  }
}
