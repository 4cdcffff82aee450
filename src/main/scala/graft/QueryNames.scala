package graft

/** Print every [[SparkEntry.queries]] key, one per line — the live
  * query surface for scripts/round_close.sh's bench-coverage gate
  * (round-11 verdict item 1: the round-close checklist is asserted,
  * not prose). No Spark session: the map literal never runs a query.
  */
object QueryNames {
  def main(args: Array[String]): Unit =
    SparkEntry.queries.keys.toSeq.sorted.foreach(println)
}
