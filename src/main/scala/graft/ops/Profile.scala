package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** One-pass column profiler — the data-quality report a pipeline runs
  * before pointing 10^12 docs at extraction (null fractions catch a
  * broken upstream export; distinct counts catch key collapse; min/max
  * catch sentinel garbage like 1970 timestamps or "" keys).
  *
  * One `agg` computes (count, nulls, exact distinct, min, max) for every
  * requested column; Catalyst plans the multi-distinct via a single
  * Expand + two-phase aggregate — one shuffle total, rows × #cols
  * intermediate, each partial map-side combined. min/max surface as
  * strings so the long-format report has one schema for mixed column
  * types (the cast is deterministic for string/integral columns; callers
  * profiling floats should pre-round if they need cross-engine stable
  * text).
  *
  * Output: one row per column — (column, n_rows, n_null, n_distinct,
  * min_val, max_val); n_distinct counts non-null values.
  */
object Profile {

  def columns(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "Profile.columns: cols must be non-empty")
    require(cols.distinct == cols, "Profile.columns: cols must be distinct")
    val metrics = cols.flatMap { c =>
      Seq(count(lit(1)).as(s"__n_$c"),
        count(col(c)).as(s"__nn_$c"),
        countDistinct(col(c)).as(s"__nd_$c"),
        min(col(c)).cast("string").as(s"__min_$c"),
        max(col(c)).cast("string").as(s"__max_$c"))
    }
    val one = df.agg(metrics.head, metrics.tail: _*)
    val rows = cols.map { c =>
      struct(lit(c).as("column"),
        col(s"__n_$c").as("n_rows"),
        (col(s"__n_$c") - col(s"__nn_$c")).as("n_null"),
        col(s"__nd_$c").as("n_distinct"),
        col(s"__min_$c").as("min_val"),
        col(s"__max_$c").as("max_val"))
    }
    one.select(explode(array(rows: _*)).as("p")).select("p.*")
  }

  /** Per-group z-score outliers over an INTEGRAL column, with EXACT
    * integer moments: Σv and Σv² accumulate as longs (order-free, so the
    * flagged set is a pure function of the data — a float Σ would make
    * "is this row an outlier" depend on partition layout at the margin),
    * then mean/sample-variance/z are a FIXED double expression both
    * engines evaluate identically (`sqrt` is IEEE-exact; no libm
    * transcendentals). The sentinel-row detector the profiler's min/max
    * hints at: truncated texts, unit-confused amounts, epoch dates.
    *
    * Caller contract: values integral with group Σv² < 2^63 (violations
    * would silently wrap — hence the cast-to-long is explicit here, not
    * hidden). Groups with fewer than `minN` values or zero variance
    * yield no outliers (z is undefined). One stats aggregate + one
    * group-keyed join back (co-keyed, SMJ/BHJ-able); two scans of the
    * input. Output: input keys + (value, z@4dp), |z| > threshold only. */
  def outliers(df: DataFrame, keyCols: Seq[String], valueCol: String,
      threshold: Double = 2.0, minN: Long = 2L): DataFrame = {
    require(keyCols.nonEmpty, "Profile.outliers: keyCols must be non-empty")
    require(threshold > 0, "Profile.outliers: threshold must be > 0")
    val k = keyCols.map(col)
    val v = col(valueCol).cast("long")
    val base = df
      .where(keyCols.map(col(_).isNotNull).reduce(_ && _) && v.isNotNull)
      .select(k :+ v.as("value"): _*)
    val stats = base.groupBy(k: _*)
      .agg(count(lit(1)).as("__n"), sum(col("value")).as("__s"),
        sum(col("value") * col("value")).as("__sq"))
      .where(col("__n") >= minN)
      .withColumn("__mu", col("__s").cast("double") / col("__n"))
      .withColumn("__var",
        (col("__sq").cast("double") -
          col("__s").cast("double") * col("__s").cast("double") / col("__n")) /
          (col("__n") - 1))
      .where(col("__var") > 0)
      .withColumn("__sigma", sqrt(col("__var")))
    base.join(stats, keyCols)
      .withColumn("z", (col("value").cast("double") - col("__mu")) / col("__sigma"))
      .where(abs(col("z")) > threshold)
      .select(k :+ col("value") :+ round(col("z"), 4).as("z"): _*)
  }

  /** EXACT per-group percentiles (SQL-standard `percentile_disc`: the
    * smallest value whose cumulative fraction ≥ p) over an INTEGRAL
    * column — p50/p95/p99 length/latency profiles where an approximate
    * sketch's rank error moves the reported tail. Exact at scale
    * because the heavy machinery runs at VALUE-scale, not row-scale:
    * one (group, value) count aggregate (map-side combined — the only
    * row-scale exchange), a per-group cumulative window over DISTINCT
    * values (bounded by the value domain, the q90 argument), then one
    * conditional-min per requested p riding a final group aggregate.
    * The p·n threshold compare is a single IEEE multiply both engines
    * evaluate identically. Output long-format: (group..., p, value) —
    * groups with data always emit every p (a group's max value always
    * qualifies at p ≤ 1). Null keys/values drop. */
  def quantiles(df: DataFrame, keyCols: Seq[String], valueCol: String,
      ps: Seq[Double]): DataFrame = {
    require(keyCols.nonEmpty, "Profile.quantiles: keyCols must be non-empty")
    require(ps.nonEmpty && ps.forall(p => p > 0 && p <= 1),
      "Profile.quantiles: each p must be in (0, 1]")
    require(ps.distinct == ps, "Profile.quantiles: ps must be distinct")
    val k = keyCols.map(col)
    val v = col(valueCol).cast("long")
    val base = df
      .where(keyCols.map(col(_).isNotNull).reduce(_ && _) && v.isNotNull)
      .select(k :+ v.as("__v"): _*)
    val counts = base.groupBy(k :+ col("__v"): _*).agg(count(lit(1)).as("__n"))
    val wCum = org.apache.spark.sql.expressions.Window
      .partitionBy(keyCols.map(col): _*).orderBy(col("__v"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    val wAll = org.apache.spark.sql.expressions.Window
      .partitionBy(keyCols.map(col): _*)
    val cum = counts
      .withColumn("__cum", sum(col("__n")).over(wCum))
      .withColumn("__tot", sum(col("__n")).over(wAll))
    val aggs = ps.zipWithIndex.map { case (p, i) =>
      min(when(col("__cum").cast("double") >=
        lit(p) * col("__tot").cast("double"), col("__v"))).as(s"__q$i")
    }
    val wide = cum.groupBy(k: _*).agg(aggs.head, aggs.tail: _*)
    val pairs = ps.zipWithIndex.map { case (p, i) =>
      struct(lit(p).as("p"), col(s"__q$i").as("value"))
    }
    wide.select(k :+ explode(array(pairs: _*)).as("__q"): _*)
      .select(k :+ col("__q.p") :+ col("__q.value"): _*)
  }

  /** Inclusion-dependency (FK-candidate) discovery: for each candidate
    * (fk column ⊆ pk column) pair, the fraction of the fk side's
    * DISTINCT values present on the pk side — the schema-discovery
    * profiler that tells a KG builder which columns actually join
    * before it wires a 10^12-row join on a broken key. Per candidate:
    * two distinct-value reductions (row-scale, map-side combined) and
    * one LEFT ANTI count at distinct-value scale; values compare as
    * strings so heterogeneous key types (int vs string exports) still
    * profile. Candidates are independent subplans — Spark runs them as
    * one union job. Output: (fk_rel, fk_col, pk_rel, pk_col,
    * n_fk_distinct, n_missing, containment@6dp); containment = 1.0 is
    * a verified FK, null fk sides report containment null. */
  def inclusion(cands: Seq[(String, DataFrame, String, String, DataFrame, String)]): DataFrame = {
    require(cands.nonEmpty, "Profile.inclusion: cands must be non-empty")
    val reports = cands.map { case (fkRel, fkDf, fkCol, pkRel, pkDf, pkCol) =>
      val fk = fkDf.where(col(fkCol).isNotNull)
        .select(col(fkCol).cast("string").as("__k")).distinct()
      val pk = pkDf.where(col(pkCol).isNotNull)
        .select(col(pkCol).cast("string").as("__k")).distinct()
      val missing = fk.join(pk, Seq("__k"), "left_anti")
        .agg(count(lit(1)).as("__miss"))
      fk.agg(count(lit(1)).as("__nd")).crossJoin(missing)
        .select(lit(fkRel).as("fk_rel"), lit(fkCol).as("fk_col"),
          lit(pkRel).as("pk_rel"), lit(pkCol).as("pk_col"),
          col("__nd").as("n_fk_distinct"), col("__miss").as("n_missing"),
          when(col("__nd") > 0, round((col("__nd") - col("__miss"))
            .cast("double") / col("__nd").cast("double"), 6))
            .as("containment"))
    }
    reports.reduce(_ unionAll _)
  }

  /** Exact functional-dependency discovery lhs → rhs_i (the Metanome/
    * TANE-style profiling primitive; for KG construction it decides which
    * predicates are single-valued and which need multi-valued modeling):
    * an FD holds iff no lhs value maps to two distinct rhs values. ALL
    * candidate rhs columns are checked in ONE lhs-keyed aggregation pass
    * (count_distinct per rhs inside the same groupBy — partial aggregation
    * collapses the scan map-side), then the per-lhs-group vector unpivots
    * and one tiny second aggregate summarizes each candidate. NULL rhs
    * values are ignored (SQL semantics: an unknown can't witness a
    * violation). Two shuffles total regardless of how many candidates. */
  def functionalDeps(df: DataFrame, lhs: String, rhs: Seq[String]): DataFrame = {
    require(rhs.nonEmpty, "Profile.functionalDeps: rhs must be non-empty")
    require(!rhs.contains(lhs), "lhs cannot appear in rhs")
    val perGroup = df.where(col(lhs).isNotNull)
      .groupBy(col(lhs))
      .agg(countDistinct(col(rhs.head)).as(rhs.head),
        rhs.tail.map(c => countDistinct(col(c)).as(c)): _*)
    val unpivoted = perGroup.select(explode(array(rhs.map(c =>
      struct(lit(c).as("rhs"), col(c).as("nd"))): _*)).as("e"))
      .select(col("e.rhs"), col("e.nd"))
    unpivoted.groupBy(col("rhs"))
      .agg(count(lit(1)).as("n_lhs"),
        sum(when(col("nd") > 1, 1L).otherwise(0L)).as("n_violating"))
      .select(lit(lhs).as("lhs"), col("rhs"), col("n_lhs"),
        col("n_violating"), (col("n_violating") === 0).as("holds"))
  }

  /** Benford first-significant-digit audit (Newcomb 1881, Benford 1938;
    * Nigrini's fraud-detection standard) — natural multi-scale quantities
    * (prices, populations, file sizes) put ~30.1% of first digits at 1;
    * fabricated or truncated data doesn't. A cheap corpus-forensics pass
    * for a curation pipeline: flag sources whose numeric columns drift
    * from the law.
    *
    * Engine-portable by construction: the first digit comes from the
    * DECIMAL STRING of floor(|v|) (no log10 — float logs differ in the
    * last ulp across engines), observed shares are integer ppm
    * (n_d·10^6 div N), and the Benford expectations are committed integer
    * constants (floor(log10(1+1/d)·10^6)), so deviation is pure integer
    * arithmetic. Values in (−1, 1) have no first significant integer
    * digit at this resolution and are excluded (documented, counted by
    * the caller if needed). One digit-keyed aggregate over a narrow
    * Project — embarrassingly parallel. */
  val BenfordPpm: Map[Int, Long] = Map(1 -> 301029L, 2 -> 176091L,
    3 -> 124938L, 4 -> 96910L, 5 -> 79181L, 6 -> 66946L, 7 -> 57991L,
    8 -> 51152L, 9 -> 45757L)

  def benford(df: DataFrame, valueCol: String): DataFrame = {
    val i = floor(abs(col(valueCol))).cast("long")
    val digit = substring(i.cast("string"), 1, 1).cast("int")
    val expected = BenfordPpm.toSeq.sortBy(_._1)
      .foldLeft(lit(null).cast("long")) { case (acc, (d, p)) =>
        when(col("digit") === d, lit(p)).otherwise(acc)
      }
    val counts = df.where(col(valueCol).isNotNull && i >= 1)
      .select(digit.as("digit"))
      .groupBy("digit").agg(count(lit(1)).as("n"))
    val total = counts.agg(sum("n").as("total"))
    counts.crossJoin(broadcast(total))
      .select(col("digit"), col("n"),
        call_function("div", col("n") * 1000000L, col("total")).as("obs_ppm"),
        expected.as("exp_ppm"))
      .withColumn("dev_ppm", abs(col("obs_ppm") - col("exp_ppm")))
  }

  /** Equi-width histogram of an INTEGRAL column: `nBins` equal integer-
    * width bins spanning the observed [min, max] (width = ⌈span/nBins⌉,
    * so bounds are exact integers — no float bin-edge ambiguity at scale
    * and any engine reproduces the same assignment), plus per-bin count
    * and exact bounds. Empty bins are emitted with count 0 (a histogram
    * with holes reads wrong). Two jobs: a 1-row min/max aggregate folded
    * in via broadcast cross join (the PageRank dangling idiom — no
    * driver collect in the lineage), then one bin-keyed count; the bin
    * spine is a `sequence` explode of the 1-row bounds. Null values
    * drop; a constant column yields one bin. */
  def histogram(df: DataFrame, valueCol: String, nBins: Int = 20): DataFrame = {
    require(nBins >= 1, "Profile.histogram: nBins must be >= 1")
    val v = col(valueCol).cast("long")
    val base = df.where(v.isNotNull).select(v.as("__v"))
    val bounds = base.agg(min(col("__v")).as("__lo"), max(col("__v")).as("__hi"))
      .withColumn("__w",
        greatest(expr(s"(__hi - __lo + $nBins) div $nBins"), lit(1L)))
    val binned = base.crossJoin(broadcast(bounds))
      .select(expr("(__v - __lo) div __w").as("bin"),
        col("__lo"), col("__w"))
      .groupBy("bin", "__lo", "__w").agg(count(lit(1)).as("n"))
    val spine = bounds
      .select(explode(sequence(lit(0L), lit(nBins.toLong - 1L))).as("bin"),
        col("__lo"), col("__w"))
      .where(col("__lo") + col("bin") * col("__w") <= col("__hi"))
    spine.join(binned, Seq("bin", "__lo", "__w"), "left")
      .select(col("bin"),
        (col("__lo") + col("bin") * col("__w")).as("lo"),
        (col("__lo") + (col("bin") + 1) * col("__w")).as("hi"),
        coalesce(col("n"), lit(0L)).as("n"))
  }

  /** Per-group TRIMMED mean — the robust center the plain avg() isn't
    * (one OCR-garbled amount of 10¹² drags a vendor's mean into
    * nonsense): drop the lowest and highest floor(n·trim) rows by value
    * rank, average the rest. Values are LONG fixed-point units (cents),
    * so the kept-sum is an exact long and the mean is ONE IEEE division —
    * deterministic at any layout (the q107 discipline). Rank ties among
    * equal values are interchangeable for a mean, so row_number's
    * arbitrary tie order cannot change the result. One per-group value
    * sort (window partitioned by group — spills per group like q90,
    * never corpus-scale in one partition) + one keyed aggregate.
    * Returns (group…, n, n_kept, sum_kept, trimmed_mean). Groups where
    * trimming leaves nothing (n ≤ 2·floor(n·trim)) report null mean. */
  def trimmedMean(df: DataFrame, keyCols: Seq[String], valueCol: String,
      trim: Double): DataFrame = {
    require(trim >= 0 && trim < 0.5, s"trimmedMean: trim must be in [0, 0.5), got $trim")
    val g = keyCols.map(col)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(g: _*).orderBy(col("__v"))
    df.where(col(valueCol).isNotNull)
      .select(g :+ col(valueCol).cast("long").as("__v"): _*)
      .withColumn("__rn", row_number().over(w))
      .withColumn("__n", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy(g: _*)))
      .withColumn("__k", floor(col("__n") * trim).cast("long"))
      .groupBy(g: _*)
      .agg(max(col("__n")).as("n"),
        sum(when(col("__rn") > col("__k") && col("__rn") <= col("__n") - col("__k"), 1L)
          .otherwise(0L)).as("n_kept"),
        sum(when(col("__rn") > col("__k") && col("__rn") <= col("__n") - col("__k"),
          col("__v"))).as("sum_kept"))
      .withColumn("trimmed_mean",
        when(col("n_kept") > 0,
          round(col("sum_kept").cast("double") / col("n_kept"), 6)))
  }

  /** Gini–Simpson diversity per group (Simpson, Nature 1948): the
    * probability two random rows of the group differ in category —
    * the corpus-mix audit ("is this source one language stamped 10^9
    * times, or a real mixture?") that needs NO logarithms: with category
    * counts c_i and n = Σc_i,
    *   simpson_ppm = 10^6 − (Σ c_i(c_i−1)) · 10^6 div (n(n−1))
    * — exact integers end to end (the entropy version would put an
    * order-sensitive float Σ of logs between engines). n < 2 → null (a
    * one-row group has no pair to disagree). One groupBy(group, category)
    * + one groupBy(group): two keyed exchanges over the raw table.
    * 0 = monoculture, → 10^6 = every row its own category. */
  def diversity(df: DataFrame, groupCol: String, catCol: String): DataFrame = {
    val idiv = (a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =>
      call_function("div", a, b)
    df.where(col(groupCol).isNotNull && col(catCol).isNotNull)
      .groupBy(col(groupCol).as("grp"), col(catCol).as("cat"))
      .agg(count(lit(1)).as("c"))
      .groupBy("grp")
      .agg(sum("c").as("n_rows"), count(lit(1)).as("n_categories"),
        sum(col("c") * (col("c") - 1L)).as("same_pairs_x2"))
      .select(col("grp"), col("n_rows"), col("n_categories"),
        when(col("n_rows") >= 2,
          lit(1000000L) - idiv(col("same_pairs_x2") * 1000000L,
            col("n_rows") * (col("n_rows") - 1L))).as("simpson_ppm"))
  }
}
