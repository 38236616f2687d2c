package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for equi-joins (the 100 TB hot-key story; SURVEY §1.3).
  * AQE's skew-join handling covers sort-merge joins automatically; this
  * explicit salting utility is for the cases AQE can't split (e.g. a
  * build-side that must be replicated, or pre-AQE engines).
  *
  * The probe side gets a deterministic per-row salt (hash of the whole row,
  * so identical rows salt identically and results stay reproducible); the
  * build side is replicated once per salt value. Join keys become
  * (key, salt), spreading a hot key over `salts` reducers. The joined
  * multiset is exactly that of the unsalted join.
  */
object Skew {
  def saltedJoin(probe: DataFrame, build: DataFrame,
      probeKey: String, buildKey: String, salts: Int,
      joinType: String = "inner"): DataFrame = {
    require(salts > 0)
    // the build side is REPLICATED per salt, so any join type that emits
    // unmatched BUILD rows (right/full outer) would emit them `salts`
    // times — breaking the documented same-multiset contract. Refuse
    // loudly; only probe-side-preserving types are salt-safe.
    val jt = org.apache.spark.sql.catalyst.plans.JoinType(joinType).toString
    require(Set("Inner", "LeftOuter", "LeftSemi", "LeftAnti", "Cross")(jt),
      s"saltedJoin supports inner/left_outer/left_semi/left_anti/cross; " +
        s"$joinType would duplicate unmatched build rows $salts times")
    val saltCol: Column =
      pmod(xxhash64(struct(probe.columns.toIndexedSeq.map(col): _*)), lit(salts))
    val p = probe.withColumn("__salt", saltCol.cast("int"))
    val b = build.withColumn("__salt",
      explode(sequence(lit(0), lit(salts - 1))))
    p.join(b, p(probeKey) === b(buildKey) && p("__salt") === b("__salt"),
        joinType)
      .drop("__salt")
  }
}
