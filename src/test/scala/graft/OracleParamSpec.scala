package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the round-14 verdict item-5 fix: every published-table
  * `read_parquet` path in every oracle must be DERIVED from the data dir
  * (the `d.split('/').last` slug rule the queries lambdas use), never an
  * sf string literal — a literal path goes stale the moment the driver
  * verifies at a different sf.
  */
class OracleParamSpec extends AnyFunSuite {

  private val ReadParquet = raw"read_parquet\('([^']+)'\)".r

  test("every oracle read_parquet path carries the dir-derived sf slug") {
    val probe = "sfPROBE9"
    val oracles = SparkEntry.oracleSqlFor(s"/data/$probe")
    assert(oracles.nonEmpty)
    val bad = for {
      (name, sql) <- oracles.toSeq
      m <- ReadParquet.findAllMatchIn(sql)
      p = m.group(1)
      if !p.contains(probe)
    } yield s"$name: $p"
    assert(bad.isEmpty,
      s"oracle read_parquet paths not derived from the data dir:\n" +
        bad.mkString("\n"))
  }

  test("no oracle embeds a literal sf0.01 path") {
    val bad = SparkEntry.oracleSqlFor("/data/sfPROBE9").collect {
      case (name, sql) if sql.contains("sf0.01") => name
    }
    assert(bad.isEmpty, s"literal sf0.01 in oracles: $bad")
  }

  test("the contract-shaped oracleSql pins the driver's correctness sf") {
    // the driver's fixed Map[String,String] surface must stay equivalent
    // to the derived map at the driver's correctness dir
    assert(SparkEntry.oracleSql == SparkEntry.oracleSqlFor("/root/testdata/sf0.01"))
  }
}
