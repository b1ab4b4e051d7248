package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigated equi-join (SURVEY §2B scale notes; the manual
  * fallback when AQE's skew-join split can't apply, e.g. the skewed
  * side feeds a co-grouped operation).
  *
  * The skewed (big) side gets a deterministic salt derived from a
  * high-cardinality column, splitting each hot key into `numSalts`
  * shuffle partitions; the small side is exploded `numSalts`× so every
  * (key, salt) pair still finds its match. Result set is identical to
  * the unsalted join — only the shuffle layout changes.
  */
object SaltedJoin {
  def apply(
      skewed: DataFrame,
      small: DataFrame,
      keys: Seq[String],
      numSalts: Int,
      saltSource: Column): DataFrame = {
    val salted = skewed.withColumn("__salt", pmod(hash(saltSource), lit(numSalts)))
    val expanded = small.withColumn(
      "__salt", explode(sequence(lit(0), lit(numSalts - 1))))
    salted.join(expanded, keys :+ "__salt").drop("__salt")
  }
}
