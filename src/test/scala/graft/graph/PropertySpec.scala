package graft.graph

import org.scalacheck.{Gen, Prop}
import org.scalatest.funsuite.AnyFunSuite

/** Property-based invariants (SURVEY §5): edge algebra, path potential,
  * concat splicing, acceptor admission — pure-function layers checked over
  * generated inputs, mirroring the reference's runtime assertion set
  * (ff1/Edge.java:60-71, ff1/Excess.java:49-50, ff2/Edge.java:34).
  */
class PropertySpec extends AnyFunSuite {

  private def check(p: Prop): Unit = {
    val res = org.scalacheck.Test.check(org.scalacheck.Test.Parameters.default, p)
    assert(res.passed, res.status.toString)
  }

  private val genAdj: Gen[Adj] = for {
    nbr <- Gen.choose(3L, 100L)
    capOut <- Gen.choose(0L, 50L)
    capIn <- Gen.choose(0L, 50L)
    flow <- Gen.choose(-capIn, capOut)
  } yield Adj(nbr, flow, capOut, capIn)

  test("edge residuals: both directions non-negative, sum = capOut+capIn") {
    check(Prop.forAll(genAdj) { a =>
      a.residualOut >= 0 && a.residualIn >= 0 &&
        a.residualOut + a.residualIn == a.capOut + a.capIn
    })
  }

  private val genPath: Gen[PathState] = for {
    n <- Gen.choose(2, 8)
    nodes <- Gen.listOfN(n, Gen.choose(3L, 60L)).map(_.distinct)
    if nodes.length >= 2
    caps <- Gen.listOfN(nodes.length - 1, Gen.choose(1L, 30L))
    flows <- Gen.sequence[List[Long], Long](caps.map(c => Gen.choose(-5L, c)))
  } yield PathState(nodes.toArray, flows.toArray, caps.toArray)

  test("path potential = min hop residual, positive iff every hop has room") {
    check(Prop.forAll(genPath) { p =>
      val residuals = p.caps.zip(p.flows).map { case (c, f) => c - f }
      p.potential == residuals.min &&
        ((p.potential > 0) == residuals.forall(_ > 0))
    })
  }

  test("concat output is a simple 1→…→2 path whenever it is produced") {
    val genPair = for {
      mid <- Gen.choose(10L, 20L)
      sLen <- Gen.choose(0, 4)
      tLen <- Gen.choose(0, 4)
      sMids <- Gen.listOfN(sLen, Gen.choose(30L, 40L)).map(_.distinct)
      tMids <- Gen.listOfN(tLen, Gen.choose(35L, 45L)).map(_.distinct)
    } yield {
      val sNodes = (1L +: sMids :+ mid).toArray
      val tNodes = (mid +: tMids :+ 2L).toArray
      (PathState(sNodes, Array.fill(sNodes.length - 1)(0L),
        Array.fill(sNodes.length - 1)(5L)),
        PathState(tNodes, Array.fill(tNodes.length - 1)(0L),
          Array.fill(tNodes.length - 1)(5L)))
    }
    check(Prop.forAll(genPair) { case (sp, tp) =>
      MaxFlow.concat(sp, tp) match {
        case None => Prop.passed
        case Some(c) =>
          Prop(c.nodes.head == 1L && c.nodes.last == 2L &&
            c.nodes.distinct.length == c.nodes.length &&
            c.flows.length == c.nodes.length - 1 &&
            c.caps.length == c.nodes.length - 1)
      }
    })
  }

  test("acceptor: total = sum of admitted, admissions never exceed residuals") {
    val genCand: Gen[Candidate] = for {
      n <- Gen.choose(2, 6)
      mids <- Gen.listOfN(n - 2, Gen.choose(3L, 12L)).map(_.distinct)
      caps <- Gen.listOfN(mids.length + 1, Gen.choose(1L, 10L))
    } yield {
      val nodes = (1L +: mids :+ 2L).toArray
      Candidate(nodes, Array.fill(nodes.length - 1)(0L), caps.toArray)
    }
    check(Prop.forAll(Gen.listOfN(8, genCand), Gen.choose(0L, 999L)) { (cs, seed) =>
      val (total, delta, paths) = MaxFlow.accept(cs.toArray, seed)
      val pathSum = paths.map(_._2).sum
      // conservation of the admitted delta relative to candidate snapshots:
      // per directed pair, net admitted flow must fit within some candidate
      // capacity (coarse), and totals agree
      total == pathSum && total >= 0 && delta.values.forall(_ > 0)
    })
  }
}
