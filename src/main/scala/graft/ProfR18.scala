package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.engine.{OpCache, Tables}
import graft.operators.{Curation, Dedup, Graph, Multimodal}

/** Round-18 phase profiler (throwaway): isolates the per-call setup vs
  * loop cost of the iterative graph family and the gate-enrichment cost
  * of the curation gates, so the optimization targets are measured
  * before they are touched. Modes: `graph` (default), `gates`, `dedup2`.
  */
object ProfR18 {
  def main(args: Array[String]): Unit = {
    val mode = args.headOption.getOrElse("graph")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.engine.Sessions.builder("graft-prof-r18")
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // warm the data like the bench does
    Tables.names.foreach { tn =>
      try Tables.load(spark, sfDir, tn)
        .selectExpr("bit_xor(xxhash64(struct(*)))").collect()
      catch { case _: Throwable => }
    }
    def sweep(): Unit = {
      OpCache.release(spark)
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
    }
    def t(name: String, clear: Boolean = true)(f: => Long): Double = {
      val t0 = System.nanoTime()
      val n = f
      val el = (System.nanoTime() - t0) / 1e9
      println(f"[prof] $name%-36s $el%8.2f s  rows=$n")
      if (clear) sweep()
      el
    }
    def noop(df: DataFrame): Long = {
      df.write.format("noop").mode("overwrite").save(); -1L
    }

    val orders = Tables.orders(spark, sfDir)
    val lineitem = Tables.lineitem(spark, sfDir)
    val docs = Tables.documents(spark, sfDir)

    if (mode == "graph") {
      for (i <- 1 to 2) {
        // phase 1: shared edge reuse (fingerprint verify + memo hit)
        t(s"#$i sharedTradeEdges reuse+count")(
          Graph.sharedTradeEdges(orders, lineitem, cacheKey = sfDir).count())
        val edges = Graph.sharedTradeEdges(orders, lineitem, cacheKey = sfDir)
        // phase 2: sym + deg join + checkpoint (pageRank preamble, step 1)
        val sym = edges.select(col("u"), col("v"))
          .union(edges.select(col("v"), col("u")))
        val deg = sym.groupBy(col("u")).agg(count(lit(1)).as("deg"))
        t(s"#$i sym+deg ckpt", clear = false) {
          val (e0, _) = OpCache.checkpointWithHandle(sym.join(deg, "u"))
          e0.count()
        }
        sweep()
        val (e0b, freeE0b) = OpCache.checkpointWithHandle(sym.join(deg, "u"))
        val parts = Dedup.ccLoopPartitions(
          e0b.count(), spark.sparkContext.defaultParallelism)
        // phase 3: repartition + checkpoint (step 2)
        t(s"#$i repartition ckpt", clear = false) {
          val (e, _) = OpCache.checkpointWithHandle(
            e0b.repartition(parts, col("u")))
          e.count()
        }
        val (e, _) = OpCache.checkpointWithHandle(
          e0b.repartition(parts, col("u")))
        freeE0b()
        // phase 4: distinct node count
        t(s"#$i distinct n count", clear = false)(
          e.select(col("u")).distinct().count())
        val n = e.select(col("u")).distinct().count()
        // phase 5: the 5-round lazy loop + noop, broadcast regime
        t(s"#$i loop bc 5 rounds+noop", clear = false) {
          val teleport = 0.15 / n
          var ranks = e.select(col("u")).distinct()
            .select(col("u"), lit(1.0 / n).as("rank"))
          for (_ <- 1 to 5) {
            val contribs = e.join(broadcast(ranks), "u")
              .select(col("v"), (col("rank") / col("deg")).as("c"))
            ranks = contribs.groupBy(col("v").as("u"))
              .agg((lit(teleport) + lit(0.85) * sum(col("c"))).as("rank"))
          }
          noop(ranks)
        }
        // phase 5b: same loop, shuffled-hash hint instead of broadcast
        t(s"#$i loop shj 5 rounds+noop") {
          val teleport = 0.15 / n
          var ranks = e.select(col("u")).distinct()
            .select(col("u"), lit(1.0 / n).as("rank"))
          for (_ <- 1 to 5) {
            val contribs = e.join(ranks.hint("SHUFFLE_HASH"), "u")
              .select(col("v"), (col("rank") / col("deg")).as("c"))
            ranks = contribs.groupBy(col("v").as("u"))
              .agg((lit(teleport) + lit(0.85) * sum(col("c"))).as("rank"))
          }
          noop(ranks)
        }
        // full queries for reference
        t(s"#$i pageRank full+noop")(
          noop(Graph.pageRank(
            Graph.sharedTradeEdges(orders, lineitem, cacheKey = sfDir))))
        t(s"#$i reach full+noop")(
          noop(Graph.reach(
            Graph.sharedTradeEdges(orders, lineitem, cacheKey = sfDir),
            Tables.customer(spark, sfDir).where(col("c_nationkey") === 1)
              .select(concat(lit("c:"), col("c_custkey")).as("node")),
            maxHops = 3)))
        t(s"#$i hits full+noop")(
          noop(Graph.hits(
            Graph.sharedTradeEdges(orders, lineitem, cacheKey = sfDir))))
        t(s"#$i betweenness full+noop")(
          noop(Graph.betweennessSampled(
            Graph.sharedTradeEdges(orders, lineitem, cacheKey = sfDir),
            orders.where(col("o_custkey") < 10)
              .select(concat(lit("c:"), col("o_custkey")).as("src"))
              .distinct())))
      }
    } else if (mode == "gates") {
      for (i <- 1 to 2) {
        t(s"#$i docs fingerprint(doc_id,text)") {
          graft.engine.PublishGuard.fingerprint(
            docs, Seq(col("doc_id"), col("text"))).rows
        }
        t(s"#$i sharedNearDupClusters reuse")(
          Dedup.sharedNearDupClusters(docs, cacheKey = sfDir).count())
        t(s"#$i gateEnrichment scan+noop") {
          noop(docs.select(col("doc_id"), col("text"),
              graft.operators.TextAnalysis.tokens(col("text")).as("toks"))
            .select(col("doc_id"),
              graft.operators.TextAnalysis.langPredOf(col("toks"))
                .as("lang_pred"),
              graft.operators.TextAnalysis.qualityOf(col("text"), col("toks"))
                .as("quality"),
              size(col("toks")).as("n_tokens")))
        }
        t(s"#$i curated_corpus full+noop")(
          noop(Curation.curatedCorpusFromClusters(docs,
            Dedup.sharedNearDupClusters(docs, cacheKey = sfDir))))
        t(s"#$i mm clusters reuse only") {
          Multimodal.sharedImageClusters(spark, docs, cacheKey = sfDir).count() +
          Multimodal.sharedAudioClusters(spark, docs, cacheKey = sfDir).count() +
          Multimodal.sharedVideoClusters(spark, docs, cacheKey = sfDir).count()
        }
        t(s"#$i mm_gate_full full+noop")(
          noop(Curation.multimodalReleaseGateFull(docs,
            Dedup.sharedNearDupClusters(docs, cacheKey = sfDir),
            Multimodal.sharedImageClusters(spark, docs, cacheKey = sfDir),
            Multimodal.sharedAudioClusters(spark, docs, cacheKey = sfDir),
            Multimodal.sharedVideoClusters(spark, docs, cacheKey = sfDir))))
        t(s"#$i release_gate full+noop")(
          noop(Curation.releaseGate(docs,
            Dedup.sharedNearDupClusters(docs, cacheKey = sfDir),
            docs.where(col("doc_id") % 50 === 0))))
      }
    } else if (mode == "fp") {
      import graft.engine.PublishGuard
      for (i <- 1 to 3) {
        t(s"#$i fingerprint(orders)") {
          PublishGuard.fingerprint(orders,
            Seq(col("o_orderkey"), col("o_custkey"))).rows
        }
        t(s"#$i fingerprint(lineitem)") {
          PublishGuard.fingerprint(lineitem,
            Seq(col("l_orderkey"), col("l_suppkey"))).rows
        }
        t(s"#$i fingerprint(docs text)") {
          PublishGuard.fingerprint(docs,
            Seq(col("doc_id"), col("text"))).rows
        }
        t(s"#$i sharedTradeEdges call only") {
          graft.operators.Graph.sharedTradeEdges(
            orders, lineitem, cacheKey = sfDir); 0L
        }
        t(s"#$i sharedTradeEdges + count") {
          graft.operators.Graph.sharedTradeEdges(
            orders, lineitem, cacheKey = sfDir).count()
        }
      }
    } else if (mode == "ann") {
      import graft.operators.Graph
      for (i <- 1 to 2) {
        t(s"#$i sharedTradeEdges reuse")(
          Graph.sharedTradeEdges(orders, lineitem, cacheKey = sfDir).count())
        val edges = Graph.sharedTradeEdges(orders, lineitem, cacheKey = sfDir)
        t(s"#$i sharedWalkCorpus reuse")(
          Graph.sharedWalkCorpus(edges, cacheKey = sfDir).count())
        val corpus = Graph.sharedWalkCorpus(edges, cacheKey = sfDir)
        t(s"#$i publishedNodeEmbeddings reuse")(
          Graph.publishedNodeEmbeddings(corpus,
            baseDir = "/tmp/graft_warehouse",
            slug = s"node_emb_${sfDir.split('/').last}").count())
        val emb = Graph.publishedNodeEmbeddings(corpus,
          baseDir = "/tmp/graft_warehouse",
          slug = s"node_emb_${sfDir.split('/').last}")
        val cohort = orders.where(col("o_custkey") < 10)
          .select(concat(lit("c:"), col("o_custkey")).as("node")).distinct()
        t(s"#$i nbrs_ivf_pruned serve+noop")(
          noop(Graph.embeddingNeighborsIvfPruned(emb, cohort,
            baseDir = "/tmp/graft_warehouse",
            slug = s"node_emb_ivf_${sfDir.split('/').last}")))
        t(s"#$i nbrs_ivf full+noop")(
          noop(Graph.embeddingNeighborsIvf(emb, cohort,
            baseDir = "/tmp/graft_warehouse",
            slug = s"node_emb_ivf_${sfDir.split('/').last}")))
        t(s"#$i linkpred_ivf full+noop")(
          noop(Graph.linkPredictionIvf(emb, edges, cohort,
            baseDir = "/tmp/graft_warehouse",
            slug = s"node_emb_ivf_${sfDir.split('/').last}")))
      }
    } else if (mode == "dedup2") {
      for (i <- 1 to 2) {
        t(s"#$i crossCorpusPairs full+noop")(
          noop(Dedup.crossCorpusPairs(
            docs.where(col("doc_id") % 5 === 0),
            docs.where(col("doc_id") % 5 =!= 0))))
        t(s"#$i containmentPairs full+noop")(
          noop(Dedup.containmentPairs(docs)))
        t(s"#$i nearDupClusters full+noop")(
          noop(Dedup.nearDupClusters(docs)))
      }
    }
    spark.stop()
  }
}
