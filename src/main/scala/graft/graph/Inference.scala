package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** RDFS materialization — forward-chaining entailment over the triple
  * store, the inference pass a KG-construction pipeline runs after
  * extraction so consumers query the ENTAILED graph with plain BGPs
  * instead of re-deriving hierarchy walks per query. Covers the core
  * RDFS rule set:
  *
  *  - rdfs5/11: subPropertyOf / subClassOf are transitive
  *  - rdfs7:    (s p o) ∧ (p subPropertyOf⁺ r)  →  (s r o)
  *  - rdfs2:    (s p o) ∧ (p domain C)          →  (s type C)
  *  - rdfs3:    (s p o) ∧ (p range  C)          →  (o type C)
  *  - rdfs9:    (x type C) ∧ (C subClassOf⁺ D)  →  (x type D)
  *
  * Rule ORDER makes one pass a fixpoint (the WebPIE observation — Urbani
  * et al., "OWL reasoning with WebPIE", ESWC 2010 — that made RDFS
  * materialization MapReduce-able): subproperty entailment first (it can
  * create new uses of domain/range-bearing predicates), then domain/range
  * (they create type triples), then subclass inheritance over ALL type
  * triples. Under the standard schema-static assumption (the ontology is
  * the given schema triples; predicates like rdf:type / rdfs:subClassOf
  * are not themselves sub-properties of anything — the meta-modeling
  * corner scalable reasoners exclude), no rule can fire again after the
  * pass, so the loop-free chain below IS the closure.
  *
  * Scale shape: the two transitive closures run over SCHEMA-sized edge
  * sets (ontologies are tiny next to data) via the semi-naive
  * `GraphQuery.reachable`; every entailment rule is then ONE equi join of
  * the data against a schema-closure table — joins the optimizer
  * broadcasts, since the schema side is small. Data is scanned a bounded
  * number of times, never iterated; the final `distinct()` is the one
  * data-scale shuffle (dedup of derived + given triples), exactly the
  * shape of the WebPIE reduce.
  */
object Inference {

  /** triples: (subj, pred, obj) — data AND schema rows in one table (the
    * store model; schema rows are the ones whose pred is a vocabulary
    * predicate below). Returns the entailed graph: the given triples plus
    * every derived triple, distinct. */
  def rdfsClosure(triples: DataFrame,
      typePred: String = "rdf:type",
      subClassOf: String = "rdfs:subClassOf",
      subPropertyOf: String = "rdfs:subPropertyOf",
      domainPred: String = "rdfs:domain",
      rangePred: String = "rdfs:range"): DataFrame = {
    val t = triples.select(col("subj").cast("string").as("subj"),
      col("pred").cast("string").as("pred"), col("obj").cast("string").as("obj"))

    // transitive closures of the schema hierarchies (schema-scale inputs)
    val scPlus = GraphQuery.reachable(
      t.where(col("pred") === subClassOf).select(col("subj").as("src"), col("obj").as("dst")))
    val spPlus = GraphQuery.reachable(
      t.where(col("pred") === subPropertyOf).select(col("subj").as("src"), col("obj").as("dst")))

    // rdfs7: property entailment over the data (broadcast-sized sp side).
    // withProps feeds FOUR downstream branches (the output union, domain,
    // range, type collection) — materialized once so the data scan + join
    // don't replay per branch.
    val spEnt = t.join(spPlus, t("pred") === spPlus("src"))
      .select(col("subj"), col("dst").as("pred"), col("obj"))
    val withProps = graft.Materialize(
      t.select("subj", "pred", "obj").union(spEnt), eager = false)
      .where(col("subj").isNotNull) // constraint barrier (GraphQuery.reachable)

    // rdfs2/3: domain/range over given AND sp-entailed triples
    val dom = t.where(col("pred") === domainPred)
      .select(col("subj").as("d_p"), col("obj").as("d_c"))
    val rng = t.where(col("pred") === rangePred)
      .select(col("subj").as("r_p"), col("obj").as("r_c"))
    val domEnt = withProps.join(dom, withProps("pred") === col("d_p"))
      .select(col("subj"), lit(typePred).as("pred"), col("d_c").as("obj"))
    val rngEnt = withProps.join(rng, withProps("pred") === col("r_p"))
      .select(col("obj").as("subj"), lit(typePred).as("pred"), col("r_c").as("obj"))

    // rdfs9: subclass inheritance over ALL type triples (given + derived);
    // two consumers (the inheritance join and the output union) → one
    // lazy materialization
    val types = graft.Materialize(
      withProps.where(col("pred") === typePred)
        .select("subj", "pred", "obj").union(domEnt).union(rngEnt),
      eager = false)
      .where(col("subj").isNotNull) // constraint barrier
    val scEnt = types.join(scPlus, types("obj") === scPlus("src"))
      .select(col("subj"), lit(typePred).as("pred"), col("dst").as("obj"))

    // rdfs5/11: the entailed hierarchy edges are themselves triples
    val scTriples = scPlus.select(col("src").as("subj"), lit(subClassOf).as("pred"),
      col("dst").as("obj"))
    val spTriples = spPlus.select(col("src").as("subj"), lit(subPropertyOf).as("pred"),
      col("dst").as("obj"))

    withProps.union(domEnt).union(rngEnt).union(scEnt)
      .union(scTriples).union(spTriples)
      .distinct()
  }

  /** OWL property-rule materialization (the ter Horst pD* property
    * fragment: owl:SymmetricProperty / owl:inverseOf /
    * owl:TransitiveProperty — rules rdfp3/rdfp8ax-bx/rdfp4) — the
    * entailments a KG needs beyond RDFS so that `locatedIn`/`contains`,
    * `partOf` chains, and symmetric `adjacentTo` links are queryable in
    * BOTH directions with plain BGPs.
    *
    * Evaluation strategy: symmetric/inverse declarations only ever REWRITE
    * a triple's predicate and orientation, so they form a tiny undirected
    * automaton over (pred, direction) states — symmetric p links (p,→) to
    * (p,←); inverseOf(p,q) links (p,→) to (q,←) and (p,←) to (q,→). Its
    * connected components (computed driver-side: the rule lists are
    * SCHEMA, not data) give every entailed (pred', flip) image of every
    * pred; ONE broadcast join expands the data to all images.
    * TransitiveProperty then closes each declared pred over the EXPANDED
    * edge set (one semi-naive `GraphQuery.reachable` call, preds kept
    * apart by a \u0001-composite node key — pred names never contain
    * \u0001; node ids may, the decode splits at the FIRST separator),
    * and one final image-expansion of the new closure triples makes the
    * whole thing a fixpoint: a pred class's edge sets are isomorphic
    * under reversal/renaming, and transitive closure commutes with both,
    * so T(class member) = image(T(p)) — nothing can fire again.
    * (The inverse/symmetric images of a transitive pred are therefore
    * transitively closed too — the pD* entailment that per-rule engines
    * only get when every class member is separately declared.)
    *
    * Scale shape: two broadcast joins against a schema-sized image map,
    * one semi-naive closure whose input is the transitive-pred slice
    * (hierarchy-scale, not corpus-scale), one final distinct — the same
    * WebPIE shape as rdfsClosure. */
  def owlPropertyClosure(triples: DataFrame,
      symmetric: Seq[String] = Seq.empty,
      inverses: Seq[(String, String)] = Seq.empty,
      transitive: Seq[String] = Seq.empty): DataFrame = {
    val t = triples.select(col("subj").cast("string").as("subj"),
      col("pred").cast("string").as("pred"),
      col("obj").cast("string").as("obj"))
      .where(col("subj").isNotNull && col("pred").isNotNull &&
        col("obj").isNotNull)

    // (pred, dir) automaton closure, driver-side (schema-scale): dir 0 =
    // as-written, 1 = reversed
    val adj = scala.collection.mutable.Map
      .empty[(String, Int), Set[(String, Int)]].withDefaultValue(Set.empty)
    def link(a: (String, Int), b: (String, Int)): Unit = {
      adj(a) += b; adj(b) += a
    }
    symmetric.foreach(p => link((p, 0), (p, 1)))
    inverses.foreach { case (p, q) =>
      link((p, 0), (q, 1)); link((p, 1), (q, 0))
    }
    val mentioned = (symmetric.map((_, 0)) ++
      inverses.flatMap { case (p, q) => Seq((p, 0), (q, 0)) }).distinct
    def reach(s: (String, Int)): Set[(String, Int)] = {
      var seen = Set(s); var frontier = Set(s)
      while (frontier.nonEmpty) {
        val next = frontier.flatMap(adj) -- seen
        seen ++= next; frontier = next
      }
      seen
    }
    val images: Seq[(String, String, Int)] = mentioned.flatMap { case (p, _) =>
      reach((p, 0)).map { case (q, flip) => (p, q, flip) }
    }.distinct

    val spark = triples.sparkSession
    import spark.implicits._
    val imageMap = broadcast(
      images.toDF("pred", "img_pred", "flip"))
    def expand(df: DataFrame): DataFrame = {
      val derived = df.join(imageMap, Seq("pred"))
        .select(
          when(col("flip") === 1, col("obj")).otherwise(col("subj")).as("subj"),
          col("img_pred").as("pred"),
          when(col("flip") === 1, col("subj")).otherwise(col("obj")).as("obj"))
      df.select("subj", "pred", "obj").union(derived)
    }

    val expanded = graft.Materialize(expand(t).distinct(), eager = false)
      .where(col("subj").isNotNull) // constraint barrier (see rdfsClosure)

    if (transitive.isEmpty) expanded.distinct()
    else {
      val sep = "\u0001"
      val transSet = transitive.toSet
      val tEdges = expanded
        .where(col("pred").isin(transSet.toSeq: _*))
        .select(concat(col("pred"), lit(sep), col("subj")).as("src"),
          concat(col("pred"), lit(sep), col("obj")).as("dst"))
      // decode at the FIRST separator (pred names cannot contain it;
      // node ids may): node = everything past "pred + sep"
      def nodeOf(c: org.apache.spark.sql.Column, pred: org.apache.spark.sql.Column) =
        c.substr(length(pred) + 2, length(c))
      val predOf = substring_index(col("src"), sep, 1)
      val closed = GraphQuery.reachable(tEdges)
        .select(predOf.as("pred"),
          nodeOf(col("src"), predOf).as("subj"),
          nodeOf(col("dst"), substring_index(col("dst"), sep, 1)).as("obj"))
        .select("subj", "pred", "obj")
      expanded.union(expand(closed)).distinct()
    }
  }
}
