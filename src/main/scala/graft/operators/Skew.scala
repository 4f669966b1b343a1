package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew-mitigation utilities (SURVEY.md §4).
  *
  * AQE's skew-join split handles most hot keys at runtime; explicit
  * salting is the static fallback for joins whose skew is known and
  * extreme (a handful of grid cells holding most of a layer, a header
  * value shared by half a corpus). Salting trades an S-fold replication
  * of the small side for an S-way split of every hot key's hash bucket —
  * result sets are identical to the plain join.
  */
object Skew {

  /** Equi-join `big` with `small` on `key`, splitting each of big's key
    * buckets `salts` ways. The big side gets a per-row deterministic-
    * within-the-run salt; the small side is replicated once per salt
    * value via a literal explode (no shuffle — it rides the join's own
    * exchange). */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
                 salts: Int): DataFrame = {
    val salted = big.withColumn("_salt",
      pmod(hash(monotonically_increasing_id()), lit(salts)))
    val replicated = small.withColumn("_salt",
      explode(sequence(lit(0), lit(salts - 1))))
    salted.join(replicated, Seq(key, "_salt")).drop("_salt")
  }
}
