package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Equi-join resilient to heavy key skew — the 100 TB failure mode where
 * one hot key lands an entire shuffle partition on a single straggler
 * task. The large (skewed) side gets a per-row salt in [0, salts); the
 * small side is replicated once per salt value, so a hot key's rows
 * spread over `salts` tasks. Result-identical to the unsalted join:
 * every large row matches exactly the one replica carrying its salt.
 *
 * This is the static form of what AQE's skew-join split does at runtime;
 * use it when the skew is known ahead of time (power-law user ids,
 * null-heavy FKs) or when AQE's per-partition threshold would still
 * leave a monster key intact. Inner and left joins preserve semantics.
 */
object SkewJoin {

  def saltedJoin(
      large: DataFrame,
      small: DataFrame,
      keys: Seq[String],
      salts: Int = 16,
      joinType: String = "inner"): DataFrame = {
    require(joinType == "inner" || joinType == "left" || joinType == "left_outer",
      s"salting preserves semantics for inner/left joins only, got $joinType")
    // salts < 1 would explode an empty replica array and silently drop
    // every small-side row (a left join would return all-null matches).
    require(salts >= 1, s"salts must be >= 1, got $salts")
    // The salt column must not collide with a real column on either input
    // (withColumn would silently overwrite it and corrupt the join).
    val saltCol = Iterator.from(0).map(i => s"__salt$i")
      .find(n => !large.columns.contains(n) && !small.columns.contains(n)).get
    // rand(seed) is fine here: the salt only routes rows to replicas, it
    // never changes the join result, so determinism is not load-bearing.
    val salted = large.withColumn(saltCol, (rand(42) * salts).cast("int"))
    val replicated = small.withColumn(saltCol,
      explode(array((0 until salts).map(lit(_)): _*)))
    salted.join(replicated, keys :+ saltCol, joinType).drop(saltCol)
  }
}
