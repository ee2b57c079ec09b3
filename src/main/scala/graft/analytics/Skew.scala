package graft.analytics

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew mitigation for hot-key joins — the manual counterpart to AQE's
  * runtime skew-join splitting (which BucketingSpec's cousin, SkewSpec,
  * demonstrates). Use salting when the skew is known ahead of time and the
  * non-skewed side is too big to broadcast but cheap to replicate a few
  * times: AQE can only split a skewed partition AFTER shuffling it; a
  * salted join never builds the hot partition in the first place.
  *
  * At 100 TB: `nSalts` multiplies the replicated side's shuffle volume and
  * divides the hot key's per-task row count — pick it from the measured
  * skew factor (hot-key rows / average-key rows), typically 8–64.
  */
object Skew {

  /** Equi-join `facts ⋈ dim` on `key`, with the hot keys of `facts` spread
    * across `nSalts` sub-keys. Each fact row deterministically picks one
    * salt (hash of the whole row — a pure function of the data, so the
    * plan stays reproducible run-to-run); `dim` is replicated once per
    * salt. Result is row-for-row identical to the plain join.
    */
  def saltedJoin(facts: DataFrame, dim: DataFrame, key: String,
      nSalts: Int): DataFrame = {
    require(nSalts > 0, s"nSalts must be positive, got $nSalts")
    require(!facts.columns.contains("graft_salt") && !dim.columns.contains("graft_salt"),
      "saltedJoin reserves the column name 'graft_salt'; rename it on the input")
    val salted = facts.withColumn("graft_salt",
      pmod(xxhash64(struct(facts.columns.map(col): _*)), lit(nSalts.toLong)))
    val replicated = dim
      .withColumn("graft_salt",
        explode(expr(s"sequence(0L, ${nSalts - 1}L)")))
    salted
      .join(replicated,
        salted(key) === replicated(key) &&
          salted("graft_salt") === replicated("graft_salt"))
      .drop(replicated(key)).drop("graft_salt")
  }
}
