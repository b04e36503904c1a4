package graft.graph

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

import scala.collection.mutable

class BfsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def inMemoryBfs(edges: Seq[(Long, Long)], sources: Seq[Long]): Map[Long, Int] = {
    val adj = edges.groupBy(_._1).map { case (k, v) => k -> v.map(_._2) }
    val dist = mutable.HashMap.empty[Long, Int]
    val q = mutable.Queue.empty[Long]
    sources.distinct.foreach { s => dist(s) = 0; q.enqueue(s) }
    while (q.nonEmpty) {
      val u = q.dequeue()
      for (v <- adj.getOrElse(u, Nil) if !dist.contains(v)) {
        dist(v) = dist(u) + 1
        q.enqueue(v)
      }
    }
    dist.toMap
  }

  test("distributed BFS equals in-memory BFS on random graphs (bfs/bfs.java)") {
    import spark.implicits._
    for (seed <- 1 to 3) {
      val rng = new scala.util.Random(seed)
      val n = 30
      val edges = for {
        u <- 0L until n; v <- 0L until n
        if u != v && rng.nextDouble() < 0.08
      } yield (u, v)
      val df = edges.toDF("src", "dst")
      val got = Bfs.run(spark, df, Seq(0L)).as[(Long, Int)].collect().toMap
      val want = inMemoryBfs(edges, Seq(0L))
      assert(got == want, s"seed=$seed")
    }
  }

  test("multi-source BFS and maxDepth cap") {
    import spark.implicits._
    val chain = (0L until 10L).sliding(2).map(p => (p(0), p(1))).toSeq
    val df = chain.toDF("src", "dst")
    val got = Bfs.run(spark, df, Seq(0L, 5L), maxDepth = 2).as[(Long, Int)].collect().toMap
    assert(got == Map(0L -> 0, 5L -> 0, 1L -> 1, 6L -> 1, 2L -> 2, 7L -> 2))
  }
}
