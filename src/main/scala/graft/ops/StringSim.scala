package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Scalable edit-distance similarity SELF-JOIN — the surface-form-variant
  * miner entity resolution runs before linking ("Acme Corp" / "Acme Corp."
  * / OCR one-char corruptions): all pairs with Levenshtein distance ≤ k,
  * found without the O(n²) cross join q17 deliberately bounds.
  *
  * Blocking is the FastSS / SymSpell DELETION NEIGHBORHOOD (Bocek et al.
  * 2007, the scheme SymSpell popularized): D_k(s) = every string reachable
  * from s by deleting ≤ k characters. If ed(a, b) ≤ k then D_k(a) ∩ D_k(b)
  * ≠ ∅ (align the two strings; deleting the unaligned characters of each
  * side lands both on the alignment's common subsequence), so an equi join
  * on variants finds every true pair — then an exact `levenshtein` verify
  * discards the false candidates (a shared variant does NOT imply ed ≤ k).
  * The house blocking+verify shape, same standing as minhash/simhash.
  *
  * Scale: |D_1(s)| = len+1, |D_2(s)| = O(len²) — variants are emitted as
  * 64-bit HASHES (the join key carries (hash, id) only; strings never
  * shuffle), so the exchange is (Σ len) longs for k=1. Hot variant buckets
  * (shared prefixes, short strings) are capped at `maxBucket` with the
  * drop COUNTED AND WARNED in-operator (the no-silent-caps rule;
  * accounting is the checkpoint's materializing action, so it costs no
  * extra job). Verify joins the two string columns back by id and runs
  * inside whole-stage codegen (`levenshtein` with the threshold argument
  * short-circuits at k+1 in Spark 4).
  */
object StringSim {

  /** Distinct-id pairs (id_a < id_b, both string-compared) with
    * ed(str_a, str_b) ≤ maxDist, plus the exact distance. Null strings
    * never pair. k ∈ {1, 2}. */
  def editDistanceJoin(df: DataFrame, idCol: String, strCol: String,
      maxDist: Int = 1, maxBucket: Int = 1000): DataFrame = {
    require(maxDist == 1 || maxDist == 2, "editDistanceJoin: maxDist must be 1 or 2")
    require(maxBucket > 1, "editDistanceJoin: maxBucket must be > 1")

    // r6: checkpoint the cleaned (id, s) projection — it feeds the
    // variant expansion AND both exact-verify joins (three input scans
    // as pure lineage), and its count gate-hints the verify joins
    // (§3.1): the candidate pair table then never shuffles within the
    // gate; beyond it the SMJs are unchanged.
    val base = graft.Materialize(
      df.select(col(idCol).cast("string").as("id"), col(strCol).as("s"))
        .where(col("s").isNotNull), eager = false)
    val nBase = base.count()

    // deletion neighborhood as pure codegen SQL HOFs: one deletion pass per
    // distance unit, flattened + deduped per row, then hashed. Lambda vars
    // are numbered per pass (nesting the same name would collide).
    def delPass(arrSql: String, v: String, i: String): String =
      s"array_distinct(flatten(transform($arrSql, $v -> " +
        s"transform(sequence(0, length($v) - 1), $i -> " +
        s"concat(substr($v, 1, $i), substr($v, $i + 2))))))"
    // __d1 is bound as its own column: Catalyst does not CSE HOF lambdas,
    // so inlining d1 twice at k=2 would evaluate the first pass twice
    val variants = base
      .withColumn("__v", array(col("s")))
      .withColumn("__d1", expr(delPass("__v", "s0", "i0")))
      .withColumn("__n", maxDist match {
        case 1 => expr("array_union(__v, __d1)")
        case 2 => expr(s"array_union(__v, array_union(__d1, ${delPass("__d1", "s1", "i1")}))")
      })
      .select(col("id"), explode(col("__n")).as("__var"))
      .select(col("id"), xxhash64(col("__var")).as("h"))
      .distinct()
    val hashed = graft.Materialize(variants, eager = false)

    // cap hot buckets, counted+warned in-operator (the minhash discipline,
    // via the shared Audit.capAccounting step)
    val sizes = graft.Materialize(hashed.groupBy("h").count(), eager = false)
    graft.Audit.capAccounting(sizes, maxBucket, "editDistanceJoin") {
      (nBuckets, nRows) =>
        s"editDistanceJoin: dropping $nBuckets over-cap variant buckets " +
          s"covering $nRows (id, variant) rows (maxBucket=$maxBucket); " +
          "pairs found ONLY through dropped variants are not emitted — " +
          "raise maxBucket"
    }
    val kept = hashed.join(sizes.where(col("count") <= maxBucket), Seq("h"))

    val cand = kept.select(col("h"), col("id").as("id_a"))
      .join(kept.select(col("h"), col("id").as("id_b")), Seq("h"))
      .where(col("id_a") < col("id_b"))
      .select("id_a", "id_b").distinct()

    // exact verify: join the strings back, codegen'd bounded levenshtein
    cand
      .join(graft.Hints.bcastIf(
        base.select(col("id").as("id_a"), col("s").as("__sa")), nBase), Seq("id_a"))
      .join(graft.Hints.bcastIf(
        base.select(col("id").as("id_b"), col("s").as("__sb")), nBase), Seq("id_b"))
      .withColumn("dist", levenshtein(col("__sa"), col("__sb"), maxDist))
      .where(col("dist") >= 0)
      .select(col("id_a"), col("id_b"), col("dist").cast("long").as("dist"))
  }
}
