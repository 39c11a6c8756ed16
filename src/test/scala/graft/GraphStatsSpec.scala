package graft

import graft.graph.GraphStats

class GraphStatsSpec extends SparkSuite {
  import spark.implicits._

  private def triples(rows: (String, String, String)*) =
    rows.toDF("subj", "pred", "obj")

  private def sets(df: org.apache.spark.sql.DataFrame) =
    df.as[(String, Long, Long)].collect()
      .map(t => (t._1, (t._2, t._3))).toMap

  test("subjects group by their distinct predicate set; counts are exact") {
    val out = sets(GraphStats.characteristicSets(triples(
      ("a", "name", "x"), ("a", "amount", "1"),
      ("b", "name", "y"), ("b", "amount", "2"),
      ("c", "name", "z"),
      ("d", "amount", "3"), ("d", "name", "w"), ("d", "amount", "4"))))
    // a, b, d share the shape {amount, name} (d has TWO amount triples —
    // multiplicity lands in n_triples, not the shape); c is {name} alone
    assert(out == Map(
      "amount,name" -> ((3L, 7L)),
      "name" -> ((1L, 1L))))
  }

  test("the predicate set is order- and duplicate-insensitive") {
    val a = sets(GraphStats.characteristicSets(triples(
      ("s", "p1", "1"), ("s", "p2", "2"))))
    val b = sets(GraphStats.characteristicSets(triples(
      ("s", "p2", "2"), ("s", "p1", "1"), ("s", "p2", "9"))))
    assert(a.keySet == b.keySet && a.keySet == Set("p1,p2"))
    assert(b(("p1,p2"))._2 == 3L)
  }

  test("empty input yields an empty summary; layout invariance") {
    assert(GraphStats.characteristicSets(triples()).count() == 0)
    val t9 = triples(
      ("a", "p", "1"), ("b", "q", "2"), ("a", "q", "3"), ("c", "p", "4"))
    assert(sets(GraphStats.characteristicSets(t9.repartition(7))) ==
      sets(GraphStats.characteristicSets(t9.coalesce(1))))
  }
}
