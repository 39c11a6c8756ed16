package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Feature propagation over the graph — one round of MEAN message passing
  * (the GraphSAGE / LightGCN aggregation primitive): every node receives
  * the element-wise mean of its IN-neighbors' feature vectors. In a KG
  * context this is embedding smoothing (an entity's representation pulled
  * toward its neighborhood), cold-start imputation (a node with no
  * embedding inherits its neighbors' mean), and the building block a
  * multi-round propagation stacks.
  *
  * Plan shape: edges ⋈ features on src (the one edge-scale equi join) →
  * dst-keyed aggregation with `VecMeanAgg`, a typed Aggregator whose
  * buffer is (element-wise double sums, count) — fully decomposable, so
  * the shuffle carries ONE partial vector per (upstream partition, dst):
  * a mega-hub aggregates map-side instead of shipping its whole
  * neighborhood to one reducer (the collect_list anti-pattern). Rounds
  * compose by feeding the output back as features; each round is one
  * join + one aggregate.
  *
  * Output: (id, mean) for every node with ≥1 in-neighbor THAT HAS a
  * feature vector; mean is Seq[Double] (float inputs are summed in
  * doubles — a float Σ over a big neighborhood loses bits).
  */
object Propagate {

  def neighborMean(edges: DataFrame, features: DataFrame,
      srcCol: String = "src", dstCol: String = "dst",
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val spark = edges.sparkSession
    import spark.implicits._
    val agg = udaf(new graft.functions.VecMeanAgg)
    edges
      .select(col(srcCol).as("__src"), col(dstCol).as("id"))
      .where(col("__src").isNotNull && col("id").isNotNull)
      // cast UP to double (float features lossless, double features — e.g.
      // a previous round's output — untruncated); vectors with null
      // ELEMENTS are malformed features and drop (the primitive-seq
      // encoder would reject them mid-aggregation otherwise)
      .join(features.select(col(idCol).as("__src"),
        col(vecCol).cast("array<double>").as("__v"))
        .where(col("__v").isNotNull &&
          forall(col("__v"), x => x.isNotNull)), Seq("__src"))
      .groupBy("id")
      .agg(agg(col("__v")).as("mean"))
      .where(col("mean").isNotNull)
  }
}
