package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.engine.Tables
import graft.operators.Dedup

/** Anchors the non-oracle-checkable LSH operators (xxhash64-based) to the
  * exact, oracle-checked n-gram jaccard pairs: LSH candidates must recover
  * the planted near-dup structure of the testdata (pairs ≥0.9 jaccard,
  * background <0.3 — verified empirically, see Dedup scaladoc).
  */
class DedupSpec extends AnyFunSuite {
  private val sf = "/root/testdata/sf0.001"

  lazy val spark: SparkSession = graft.engine.Sessions
    .builder("graft-test").master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .getOrCreate()

  private def truePairs: Set[(Long, Long)] =
    Dedup.ngramJaccardPairs(Tables.documents(spark, sf))
      .select("doc_a", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

  test("minhash LSH recovers the exact-jaccard near-dup pairs") {
    val exact = truePairs
    assert(exact.nonEmpty, "testdata should contain planted near-dup pairs")
    val lsh = Dedup.minhashLshPairs(Tables.documents(spark, sf))
      .select("doc_a", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // 8x4 banding at j>=0.9 has ~100% candidate probability; estimation
    // noise on 32 hashes can drop a pair at the 0.5 cutoff, so require
    // high recall and full precision rather than exact equality.
    val recall = (exact & lsh).size.toDouble / exact.size
    assert(recall >= 0.8, s"LSH recall $recall too low (exact=$exact lsh=$lsh)")
    assert((lsh -- exact).isEmpty, s"LSH false positives: ${lsh -- exact}")
  }

  test("simhash candidate pairs overlap the true near-dups") {
    val exact = truePairs
    val sim = Dedup.simhashPairs(Tables.documents(spark, sf))
      .select("doc_a", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (exact & sim).size.toDouble / exact.size
    assert(recall >= 0.6, s"simhash recall $recall too low")
  }

  test("exact dedup keeps one row per distinct normalized text") {
    val docs = Tables.documents(spark, sf)
    val n = Dedup.exactDedup(docs).count()
    assert(n > 0 && n <= docs.count())
  }

  test("embedding cosine pairs are symmetric-free and above threshold") {
    val pairs = Dedup.embeddingCosinePairs(Tables.embeddings(spark, sf), 0.4)
      .collect()
    assert(pairs.forall(r => r.getLong(0) < r.getLong(1)))
    assert(pairs.forall(r => r.getDouble(2) >= 0.4))
  }
}
