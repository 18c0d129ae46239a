package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Salted equi-join for skewed keys — the manual fallback when AQE's
  * skew-join split (which handles most cases at runtime) can't help:
  * e.g. a single hot (store, product) pair that dwarfs every shuffle
  * partition, or a skewed aggregation feeding a join.
  *
  * Left rows get a random salt in [0, factor); right rows are
  * replicated once per salt value (via a small exploded range — the
  * replication is bounded by `factor × |right|`, so use it for the
  * SMALLER side). The join then runs on (keys..., salt), spreading a
  * hot key over `factor` shuffle partitions. Result multiset is
  * identical to the unsalted join — proved by SkewJoinSpec.
  *
  * At 100 TB: pick `factor` ≈ hot-key rows / target-partition rows;
  * salting composes with shuffle_hash hints and AQE (which will still
  * coalesce the non-hot partitions).
  */
object SkewJoin {

  private val SaltCol = "__graft_salt"

  /** The salt derivations, exposed for spread tests: random (per-row
    * uniform) and deterministic (hash of stable columns). */
  private[graft] def randSalt(factor: Int, seed: Long): Column =
    floor(rand(seed) * lit(factor)).cast("int")
  private[graft] def hashSalt(saltSource: Column, factor: Int): Column =
    pmod(hash(saltSource), lit(factor))

  private def saltedWith(left: DataFrame, right: DataFrame,
      keys: Seq[String], factor: Int, salt: Column): DataFrame = {
    require(factor >= 1, s"salt factor must be >= 1, got $factor")
    left.withColumn(SaltCol, salt)
      .join(right.withColumn(SaltCol,
        explode(sequence(lit(0), lit(factor - 1)))), keys :+ SaltCol)
      .drop(SaltCol)
  }

  /** Inner equi-join of `left` ⋈ `right` on `keys`, salted `factor`
    * ways. `right` is the replicated (smaller) side. */
  def salted(left: DataFrame, right: DataFrame, keys: Seq[String],
      factor: Int, seed: Long = 42L): DataFrame =
    saltedWith(left, right, keys, factor, randSalt(factor, seed))

  /** Deterministic variant: salt derived from stable columns of the
    * left row instead of rand() — reproducible across retries, which
    * matters when tasks can be speculatively re-executed (rand() salts
    * are only stable within one deterministic task replay). */
  def saltedBy(left: DataFrame, right: DataFrame, keys: Seq[String],
      factor: Int, saltSource: Column): DataFrame =
    saltedWith(left, right, keys, factor, hashSalt(saltSource, factor))
}
