package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, DataType, MapType, StructType}

/** Skew mitigation for equi-joins (the 100 TB hot-key story; SURVEY §1.3).
  * AQE's skew-join handling covers sort-merge joins automatically; this
  * explicit salting utility is for the cases AQE can't split (e.g. a
  * build-side that must be replicated, or pre-AQE engines).
  *
  * The probe side gets a deterministic per-row salt (hash of the row's
  * hashable columns, so identical rows salt identically and results stay
  * reproducible); the build side is replicated once per salt value. Join
  * keys become (key, salt), spreading a hot key over `salts` reducers. The
  * joined multiset is exactly that of the unsalted join — correctness
  * needs only salt ∈ [0, salts) per probe row; WHICH salt a row gets is
  * purely a spread concern.
  */
object Skew {
  /** True if the type can feed `xxhash64` (hash rejects MapType at any
    * nesting depth — map iteration order is undefined, so hashing one
    * would be nondeterministic anyway).
    */
  private def hashable(dt: DataType): Boolean = dt match {
    case _: MapType => false
    case s: StructType => s.fields.forall(f => hashable(f.dataType))
    case a: ArrayType => hashable(a.elementType)
    case _ => true
  }

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
    // a user column literally named like the salt must not be silently
    // overwritten-then-dropped (the output would LOSE that column); pick
    // a name free on both sides instead
    val taken = (probe.columns ++ build.columns).toSet
    val salt = Iterator.from(0).map(i => s"__salt$i")
      .find(!taken(_)).get
    // backtick-quote references: a column named "user.id" must resolve as
    // the top-level column it is, not as nested-field access (r11 review).
    // Map-typed columns are excluded from the hash (xxhash64 rejects them);
    // a frame with NO hashable columns degrades to salt 0 — correct, just
    // unspread, and a caller in that corner has no deterministic row
    // identity to salt by anyway.
    def ref(df: DataFrame, name: String): Column =
      df.col(s"`${name.replace("`", "``")}`")
    val hashCols = probe.schema.fields
      .filter(f => hashable(f.dataType)).map(f => ref(probe, f.name))
    val saltCol: Column =
      if (hashCols.isEmpty) lit(0)
      else pmod(xxhash64(struct(hashCols.toIndexedSeq: _*)), lit(salts))
    val p = probe.withColumn(salt, saltCol.cast("int"))
    val b = build.withColumn(salt,
      explode(sequence(lit(0), lit(salts - 1))))
    p.join(b, ref(p, probeKey) === ref(b, buildKey) &&
        p(salt) === b(salt), joinType)
      .drop(salt)
  }
}
