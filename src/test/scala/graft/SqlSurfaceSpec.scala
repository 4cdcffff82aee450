package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.SqlSurface

/** The SQL-surface operator entry points (round-15 verdict item 7):
  * registerLlmViews must expose the dedup/ANN/text families as tables a
  * pure `spark.sql` user can SELECT from, validate its arguments loudly
  * at registration, and the view results must equal the Column-API
  * operator outputs (same lazy plan underneath).
  */
class SqlSurfaceSpec extends AnyFunSuite {
  private val sf = "/root/testdata/sf0.001"

  lazy val spark: SparkSession = graft.engine.Sessions
    .builder("graft-test").master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .getOrCreate()

  test("registerLlmViews: all three operator views are SELECTable and match the Column API") {
    val wh = java.nio.file.Files.createTempDirectory("graft-sqlwh").toString
    SqlSurface.registerLlmViews(spark, sf, baseDir = wh)
    // minhash pairs: the SQL view equals the operator frame row-for-row
    val viaSql = spark.sql(
      "SELECT doc_a, doc_b, jaccard FROM graft_minhash_pairs ORDER BY doc_a, doc_b")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    val viaApi = graft.operators.Dedup.minhashLshVerifiedPairs(
      graft.engine.Tables.documents(spark, sf))
      .orderBy("doc_a", "doc_b")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(viaSql.nonEmpty && viaSql === viaApi,
      "SQL view diverged from the Column-API operator")
    // IVF top-k: SELECTable, k rows per query, served from the published
    // centroid table (the second SELECT must not retrain — same rows)
    val ivf1 = spark.sql(
      "SELECT query_id, rank, vec_id, cosine FROM graft_ivf_topk ORDER BY query_id, rank")
      .collect()
    assert(ivf1.nonEmpty && ivf1.length % 5 == 0,
      s"expected k=5 rows per query, got ${ivf1.length}")
    val ivf2 = spark.sql(
      "SELECT query_id, rank, vec_id, cosine FROM graft_ivf_topk ORDER BY query_id, rank")
      .collect()
    assert(ivf1.map(_.toString).toSeq === ivf2.map(_.toString).toSeq,
      "re-SELECT must serve the same published-table values")
    // BM25: SELECTable with the expected shape
    val bm = spark.sql("SELECT * FROM graft_bm25_topk").collect()
    assert(bm.nonEmpty, "bm25 view returned no rows")
    // SQL composes over the views: aggregation over the operator output
    val agg = spark.sql(
      """SELECT count(*) AS n, count(DISTINCT doc_a) AS nq
        |FROM graft_minhash_pairs WHERE jaccard >= 0.5""".stripMargin).head()
    assert(agg.getLong(0) === viaSql.size.toLong && agg.getLong(1) >= 1L)
  }

  test("registerSearchViews: caller query views serve through SQL and match the Column API") {
    import org.apache.spark.sql.functions.col
    val wh = java.nio.file.Files.createTempDirectory("graft-sqlwh2").toString
    val emb = graft.engine.Tables.embeddings(spark, sf)
    emb.where(col("vec_id") % 89 === 2).select("vec_id", "embedding")
      .createOrReplaceTempView("spec_ivf_queries")
    spark.createDataFrame(Seq(
      Tuple1("vector"), Tuple1("stream"), Tuple1("zzz_no_such_term")))
      .toDF("term").createOrReplaceTempView("spec_bm25_queries")
    SqlSurface.registerSearchViews(spark, sf,
      ivfQueryView = Some("spec_ivf_queries"),
      bm25QueryView = Some("spec_bm25_queries"), baseDir = wh)
    // IVF: SQL view == Column API with the same external query table
    val viaSql = spark.sql(
      "SELECT query_id, rank, vec_id, cosine FROM graft_ivf_search ORDER BY query_id, rank")
      .collect().map(_.toString).toSeq
    val viaApi = graft.operators.Similarity.ivfTopKPublished(
      emb, wh, s"sqlivf_${sf.split('/').last}",
      queryTable = Some(emb.where(col("vec_id") % 89 === 2)
        .select("vec_id", "embedding")))
      .orderBy("query_id", "rank").collect().map(_.toString).toSeq
    assert(viaSql.nonEmpty && viaSql === viaApi,
      "graft_ivf_search diverged from the Column-API external-query serve")
    // BM25: SQL view == Column API; the unknown term drops out naturally
    val bmSql = spark.sql(
      "SELECT query_term, rank, doc_id, score FROM graft_bm25_search ORDER BY query_term, rank")
      .collect().map(_.toString).toSeq
    val bmApi = graft.operators.TextAnalysis.bm25TopK(
      graft.engine.Tables.documents(spark, sf),
      queryTable = Some(spark.table("spec_bm25_queries")))
      .orderBy("query_term", "rank").collect().map(_.toString).toSeq
    assert(bmSql.nonEmpty && bmSql === bmApi,
      "graft_bm25_search diverged from the Column-API external-query serve")
    assert(!bmSql.exists(_.contains("zzz_no_such_term")),
      "a term with no postings must drop out, not NULL-pad")
  }

  test("registerSearchViews: missing views and columns fail loudly at registration") {
    def bad(f: => Unit): String =
      intercept[IllegalArgumentException](f).getMessage
    assert(bad(SqlSurface.registerSearchViews(spark, sf))
      .contains("at least one query view"))
    assert(bad(SqlSurface.registerSearchViews(spark, sf,
      ivfQueryView = Some("no_such_view_anywhere")))
      .contains("not registered"))
    spark.createDataFrame(Seq(Tuple1(1L))).toDF("wrong_col")
      .createOrReplaceTempView("spec_bad_queries")
    assert(bad(SqlSurface.registerSearchViews(spark, sf,
      ivfQueryView = Some("spec_bad_queries")))
      .contains("missing column"))
    assert(bad(SqlSurface.registerSearchViews(spark, sf,
      bm25QueryView = Some("spec_bad_queries")))
      .contains("missing column"))
    assert(bad(SqlSurface.registerSearchViews(spark, sf,
      ivfQueryView = Some("spec_bad_queries"), nprobe = 9, nlist = 8))
      .contains("nprobe"))
  }

  test("registerLlmViews: argument validation fails loudly at registration") {
    def bad(f: => Unit): String =
      intercept[IllegalArgumentException](f).getMessage
    assert(bad(SqlSurface.registerLlmViews(spark, ""))
      .contains("sfDir"))
    assert(bad(SqlSurface.registerLlmViews(spark, sf, baseDir = ""))
      .contains("baseDir"))
    assert(bad(SqlSurface.registerLlmViews(spark, sf, minhashThreshold = 0.0))
      .contains("minhashThreshold"))
    assert(bad(SqlSurface.registerLlmViews(spark, sf, minhashThreshold = 1.5))
      .contains("minhashThreshold"))
    assert(bad(SqlSurface.registerLlmViews(spark, sf, ivfK = 0))
      .contains("ivfK"))
    assert(bad(SqlSurface.registerLlmViews(spark, sf, nprobe = 9, nlist = 8))
      .contains("nprobe"))
    assert(bad(SqlSurface.registerLlmViews(spark, sf, bm25TopDocs = -1))
      .contains("bm25"))
  }
}
