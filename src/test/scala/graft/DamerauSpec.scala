package graft

import graft.functions.Damerau
import org.apache.spark.sql.functions._

class DamerauSpec extends SparkSuite {
  import spark.implicits._

  test("full DL, not OSA: ca->abc is 2 (delete + prepend via the " +
    "unrestricted transposition table)") {
    assert(Damerau.distance("ca", "abc") == 2)
    assert(Damerau.distance("abc", "ca") == 2)
  }

  test("canonical cases: transposition = 1, classic distances, empties") {
    assert(Damerau.distance("ab", "ba") == 1)
    assert(Damerau.distance("abcd", "acbd") == 1)
    assert(Damerau.distance("kitten", "sitting") == 3)
    assert(Damerau.distance("fee", "feed") == 1)
    assert(Damerau.distance("", "abc") == 3)
    assert(Damerau.distance("abc", "") == 3)
    assert(Damerau.distance("same", "same") == 0)
    assert(Damerau.distance("recieve", "receive") == 1)
  }

  test("codepoint contract: an accent is one edit; bounded by levenshtein") {
    assert(Damerau.distance("café", "cafe") == 1)
    var seed = 0x12345L
    def next(): Long = { seed = seed * 6364136223846793005L + 1442695040888963407L; seed }
    val words = (0 until 60).map(_ =>
      (0 until (math.abs(next()) % 8 + 1).toInt)
        .map(_ => ('a' + (math.abs(next()) % 4)).toChar).mkString)
    for (a <- words; b <- words) {
      val dl = Damerau.distance(a, b)
      val lev = {
        val d = Array.tabulate(a.length + 1, b.length + 1)((i, j) =>
          if (i == 0) j else if (j == 0) i else 0)
        for (i <- 1 to a.length; j <- 1 to b.length)
          d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
            d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
        d(a.length)(b.length)
      }
      assert(dl <= lev, s"'$a' vs '$b': dl=$dl > lev=$lev")
      assert(dl >= math.abs(a.length - b.length))
      assert(dl == Damerau.distance(b, a)) // symmetry
    }
  }

  test("expression: codegen path, null safety, Column == scalar") {
    val df = Seq(("ab", Some("ba")), ("kitten", Some("sitting")),
      ("x", None)).toDF("a", "b")
    val out = df.select(col("a"),
        Damerau.distCol(col("a"), col("b")).as("d"))
      .as[(String, Option[Int])].collect().toMap
    assert(out("ab").contains(1) && out("kitten").contains(3))
    assert(out("x").isEmpty)
  }
}
