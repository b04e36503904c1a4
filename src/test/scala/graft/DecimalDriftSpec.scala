package graft

import org.apache.spark.sql.types.DecimalType
import org.scalatest.funsuite.AnyFunSuite

/** Type-drift gate (round-9 verdict item #3): the driver hashes textual/
  * typed values, so a Spark DECIMAL column ("0.250000") vs a DuckDB DOUBLE
  * oracle column ("0.25") hash-differs even when every value is numerically
  * equal — exactly how ds_kanon shipped red in round 9 (`ROUND(1.0 / n, 6)`
  * types DECIMAL because the literal 1.0 is DECIMAL(2,1)).
  *
  * This spec materializes the SCHEMA of every `SparkEntry.queries` entry at
  * sf0.001 and asserts no output column is DecimalType unless the query is
  * on the explicit both-sides-decimal whitelist (oracle column is DECIMAL
  * too, so the driver hash agrees — e.g. ev_sequential's decimal-exact
  * moments).
  */
class DecimalDriftSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  /** Queries whose DECIMAL output is intentional: the DuckDB oracle yields
    * DECIMAL for the same column, so textual hashes agree (verified green
    * in CORRECTNESS_r09 for every entry listed here).
    */
  private val bothSidesDecimal: Set[String] = Set.empty

  test("no query outputs DecimalType unless its oracle is decimal too") {
    val hits = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        val decCols = fn(spark, sf).schema.fields.collect {
          case f if f.dataType.isInstanceOf[DecimalType] =>
            s"$name.${f.name}: ${f.dataType.simpleString}"
        }
        if (bothSidesDecimal.contains(name)) Nil else decCols
    }
    assert(hits.isEmpty,
      s"DecimalType output columns (driver hash would drift vs a DOUBLE " +
        s"oracle):\n  ${hits.mkString("\n  ")}")
  }
}
