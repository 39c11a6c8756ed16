package graft

import graft.ops.Bloom
import org.apache.spark.sql.functions._

class BloomSpec extends SparkSuite {
  import spark.implicits._

  test("no false negatives, ever: every built key probes maybe_present " +
    "across widths and k") {
    val vals = (0 until 300).map(i => s"key_$i")
    for (k <- Seq(1, 2, 4); m <- Seq(256, 1 << 12)) {
      val bits = Bloom.bits(vals.toDF("v"), "v", k, m)
      val got = Bloom.probe(bits, vals.toDF("v"), "v", k, m)
        .as[(String, Boolean)].collect().toMap
      assert(got.size == 300 && got.values.forall(identity),
        s"false negative at k=$k m=$m")
    }
  }

  test("definite absences exist at sane load, and known-absent keys that " +
    "probe positive are the (rare) designed false positives") {
    val present = (0 until 500).map(i => s"in_$i")
    val absent = (0 until 500).map(i => s"out_$i")
    val bits = Bloom.bits(present.toDF("v"), "v", 4, 1 << 14)
    val got = Bloom.probe(bits, absent.toDF("v"), "v", 4, 1 << 14)
      .as[(String, Boolean)].collect()
    val fp = got.count(_._2)
    // load kn/m = 2000/16384 → fp rate ≈ (1-e^-0.122)^4 ≈ 1.7e-4
    assert(fp <= 5, s"implausible false-positive count $fp/500")
    assert(got.length == 500)
  }

  test("packed registers round-trip exactly to the bit table, and the " +
    "filter is a pure function of the value SET (dups, layout no-ops)") {
    val vals = (0 until 200).map(i => s"v$i")
    val bits = Bloom.bits(vals.toDF("v"), "v")
    val rt = Bloom.unpack(Bloom.packed(bits))
    assert(rt.exceptAll(bits).count() == 0 && bits.exceptAll(rt).count() == 0)
    val dupd = Bloom.bits((vals ++ vals ++ vals).toDF("v").repartition(13), "v")
    assert(dupd.exceptAll(bits).count() == 0 && bits.exceptAll(dupd).count() == 0)
  }

  test("nulls are ignored on both sides; bit positions stay within [0, m)") {
    val bits = Bloom.bits(Seq(Some("a"), None, Some("b")).toDF("v"), "v",
      4, 256)
    val range = bits.agg(min("bit"), max("bit")).head()
    assert(range.getInt(0) >= 0 && range.getInt(1) < 256)
    val probes = Bloom.probe(bits, Seq(Some("a"), None).toDF("v"), "v", 4, 256)
    assert(probes.count() == 1)
  }
}
