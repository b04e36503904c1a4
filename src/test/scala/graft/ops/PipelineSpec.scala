package graft.ops

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

class PipelineSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  test("dd_resolve: canonical ids are transitive cluster minima") {
    val pairs = Dedup.ddSimhashPairs(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val canon = Pipeline.ddResolve(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(pairs.nonEmpty && canon.nonEmpty)
    // every paired doc resolves, to an id <= itself, and pair-mates agree
    pairs.foreach { case (a, b) =>
      assert(canon.contains(a) && canon.contains(b))
      assert(canon(a) == canon(b), s"pair ($a,$b) split across clusters")
      assert(canon(a) <= a)
    }
    // a canonical id is its own canonical id (keep-first is idempotent)
    canon.values.foreach(c => assert(canon(c) == c))
    // transitivity beyond direct pairs: chains a~b, b~c collapse
    val viaChain = pairs.groupBy(_._1).view.mapValues(_.map(_._2))
    for ((a, bs) <- viaChain; b <- bs; c <- viaChain.getOrElse(b, Array.empty[Long]))
      assert(canon(a) == canon(c), s"chain $a~$b~$c not collapsed")
  }

  test("ta_chunk: window arithmetic matches the token counts") {
    val nTokens = TextAnalysis.taTokens(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val chunks = Pipeline.taChunk(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getString(3)))
    val byDoc = chunks.groupBy(_._1)
    assert(byDoc.keySet == nTokens.keySet)
    for ((doc, cs) <- byDoc) {
      val len = nTokens(doc)
      val expected = 1 + (if (len > 32) (len - 32 + 23) / 24 else 0)
      assert(cs.length == expected, s"doc $doc: ${cs.length} chunks for $len tokens")
      // all but possibly the last chunk are full windows; none exceed 32
      assert(cs.forall(_._3 <= 32))
      assert(cs.sortBy(_._2).dropRight(1).forall(_._3 == 32))
      // chunk text round-trips its token count
      cs.foreach(c => assert(c._4.split(" ").length == c._3))
    }
  }

  test("ta_redact: no PII survives redaction; synthesized PII is detected") {
    val rows = Pipeline.taRedact(spark, sf).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getString(3)))
    assert(rows.nonEmpty)
    rows.foreach { case (id, nEmails, nPhones, red) =>
      assert(!red.matches(".*[a-z0-9]+@[a-z]+\\.[a-z]+.*"), s"email survived in $id")
      assert(!red.contains("+1-555-"), s"phone survived in $id")
      if (id % 3 == 0) {
        assert(nEmails >= 1 && nPhones >= 1, s"synthesized PII missed in $id")
        assert(red.contains("<EMAIL>") && red.contains("<PHONE>"))
      }
    }
  }

  test("ds_split: deterministic, total, and near the 75/12.5/12.5 design") {
    val a = Pipeline.dsSplit(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(3)))
    val b = Pipeline.dsSplit(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(3)))
    assert(a.toSeq == b.toSeq) // reproducible
    val n = a.length.toDouble
    val frac = a.groupBy(_._2).view.mapValues(_.length / n).toMap
    assert(a.map(_._1).distinct.length == a.length) // each doc exactly once
    assert(math.abs(frac("train") - 0.75) < 0.08, frac.toString)
    assert(math.abs(frac.getOrElse("val", 0.0) - 0.125) < 0.06, frac.toString)
    assert(math.abs(frac.getOrElse("test", 0.0) - 0.125) < 0.06, frac.toString)
  }
}
