package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Incremental, Quality}

/** Semantics of the incremental-maintenance and data-quality operators
  * on hand-built frames where every expected value is enumerable — the
  * DuckDB oracle covers exact values at sf0.01; these pin the edge cases
  * the fixture tables can't reach (empty batches, delete-of-missing-key,
  * merge associativity over arbitrary splits).
  */
class IncrementalSpec extends AnyFunSuite {

  lazy val spark: SparkSession = graft.engine.Sessions
    .builder("graft-test").master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .getOrCreate()

  // ── mergeable stats ────────────────────────────────────────────────

  test("merged batch stats equal direct whole-table stats for any split") {
    import spark.implicits._
    val rows = (1 to 97).map(i => (s"s${i % 3}", i.toLong))
    val docs = rows.toDF("source", "n_chars")
    val direct = Incremental.finalizeStats(
      Incremental.statsPartial(docs, "source", "n_chars"))

    // three different split arities, including a batch that misses a group
    for (k <- Seq(2, 5, 7)) {
      val states = (0 until k).map(i =>
        Incremental.statsPartial(
          docs.where(pmod(xxhash64(col("n_chars")), lit(k)) === i),
          "source", "n_chars"))
      val merged = Incremental.finalizeStats(
        states.reduce(Incremental.mergeStats))
      assert(merged.collect().toSeq === direct.collect().toSeq,
        s"merge of $k batches diverged from direct stats")
    }
  }

  test("merging an empty state is the identity") {
    import spark.implicits._
    val docs = Seq(("a", 10L), ("a", 20L), ("b", 5L)).toDF("source", "n_chars")
    val state = Incremental.statsPartial(docs, "source", "n_chars")
    val empty = Incremental.statsPartial(
      docs.where(lit(false)), "source", "n_chars")
    val merged = Incremental.finalizeStats(Incremental.mergeStats(state, empty))
    assert(merged.collect().toSeq ===
      Incremental.finalizeStats(state).collect().toSeq)
  }

  // ── CDC changeset apply ────────────────────────────────────────────

  test("applyChangeset: latest seq wins, deletes drop, inserts land, untouched pass through") {
    import spark.implicits._
    val base = Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0))
      .toDF("k", "name", "amount")
    val changes = Seq(
      (2L, "b2", 21.0, "U", 1L),   // update key 2…
      (2L, "b3", 22.0, "U", 2L),   // …then update again: seq 2 wins
      (3L, "c", 30.0, "D", 1L),    // delete key 3
      (4L, "d", 40.0, "I", 1L),    // insert new key 4
      (5L, "e", 50.0, "D", 1L),    // delete of a missing key: no-op
      (6L, "f", 60.0, "I", 1L),    // insert key 6…
      (6L, "f", 60.0, "D", 2L))    // …then delete it: never appears
      .toDF("k", "name", "amount", "op", "seq")
    val out = Incremental.applyChangeset(base, changes, "k")
      .orderBy("k").as[(Long, String, Double)].collect().toSeq
    assert(out === Seq(
      (1L, "a", 10.0),    // untouched
      (2L, "b3", 22.0),   // latest update
      (4L, "d", 40.0)))   // insert
  }

  test("applyChangeset with an empty changeset returns the base unchanged") {
    import spark.implicits._
    val base = Seq((1L, "a", 10.0), (2L, "b", 20.0)).toDF("k", "name", "amount")
    val changes = Seq.empty[(Long, String, Double, String, Long)]
      .toDF("k", "name", "amount", "op", "seq")
    val out = Incremental.applyChangeset(base, changes, "k")
      .orderBy("k").as[(Long, String, Double)].collect().toSeq
    assert(out === Seq((1L, "a", 10.0), (2L, "b", 20.0)))
  }

  // ── constraint suite ───────────────────────────────────────────────

  test("checkConstraints counts each violation class exactly") {
    import spark.implicits._
    val df = Seq[(java.lang.Long, String, java.lang.Double)](
      (1L, "O", 10.0),
      (2L, "F", -5.0),     // range violation
      (null, "O", 20.0),   // null key
      (4L, "X", 30.0),     // bad status
      (4L, "O", 1e9),      // duplicate key + range violation
      (9L, "O", 40.0))     // FK miss (dim has 1..5)
      .toDF("k", "status", "amount")
    val dim = (1L to 5L).toDF("dk")
    val report = Quality.checkConstraints(df, Seq(
      Quality.NotNull("k"),
      Quality.InRange("amount", 0.0, 100.0),
      Quality.AcceptedValues("status", Seq("O", "F")),
      Quality.Unique(Seq("k")),
      Quality.ReferencedIn("k", dim, "dk", "dim")))
      .as[(String, Long, Long, Boolean)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap

    assert(report("not_null(k)") === ((1L, 6L, false)))
    assert(report("range(amount)") === ((2L, 6L, false)))
    assert(report("accepted_values(status)") === ((1L, 6L, false)))
    // 5 non-null keys, 4 distinct → 1 duplicate row
    assert(report("unique(k)") === ((1L, 6L, false)))
    // evaluated = 5 non-null keys; 9 misses the dim
    assert(report("fk(k->dim.dk)") === ((1L, 5L, false)))
  }

  test("checkConstraints on an empty table reports zero violations, all passed") {
    import spark.implicits._
    val df = Seq.empty[(java.lang.Long, Double)].toDF("k", "amount")
    val report = Quality.checkConstraints(df, Seq(
      Quality.NotNull("k"), Quality.InRange("amount", 0.0, 100.0)))
      .as[(String, Long, Long, Boolean)].collect().toSeq
    assert(report === Seq(
      ("not_null(k)", 0L, 0L, true),
      ("range(amount)", 0L, 0L, true)),
      "an empty table violates nothing — nulls in the report would poison a streaming DQ series")
  }

  test("checkConstraints rejects duplicate constraint names up front") {
    import spark.implicits._
    val df = Seq((1L, 10.0)).toDF("k", "amount")
    // two InRange on one column generate the same name — without the
    // guard this surfaced as an opaque ambiguous-reference error
    val e = intercept[IllegalArgumentException] {
      Quality.checkConstraints(df, Seq(
        Quality.InRange("amount", 0.0, 100.0),
        Quality.InRange("amount", 0.0, 50.0)))
    }
    assert(e.getMessage.contains("range(amount)"),
      s"expected the duplicate name in the error, got: ${e.getMessage}")
  }

  test("checkConstraints passes on a clean table") {
    import spark.implicits._
    val df = Seq((1L, "O", 10.0), (2L, "F", 20.0)).toDF("k", "status", "amount")
    val dim = (1L to 5L).toDF("dk")
    val report = Quality.checkConstraints(df, Seq(
      Quality.NotNull("k"),
      Quality.InRange("amount", 0.0, 100.0),
      Quality.Unique(Seq("k")),
      Quality.ReferencedIn("k", dim, "dk", "dim")))
    assert(report.where(!col("passed")).count() === 0)
  }
}
