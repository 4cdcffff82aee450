package graft

import java.sql.Timestamp

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.Rsvp

/** Property-based tests (SURVEY.md §5 strategy #3): structural invariants
  * over scalacheck-generated inputs, run through real Spark plans.
  * (Raw Gen sampling with fixed seeds — the scalatest/scalacheck bridge
  * artifact is not in the offline dependency cache.)
  */
class PropertySpec extends AnyFunSuite {

  lazy val spark: SparkSession = graft.engine.Sessions
    .builder("graft-prop-test").master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .getOrCreate()

  /** Deterministic sample stream from a Gen. */
  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(42L + i)))

  test("collect_set equals sorted-distinct of inputs") {
    import spark.implicits._
    samples(Gen.nonEmptyListOf(Gen.chooseNum(0, 20)), 10).foreach { xs =>
      val got = xs.toDF("x")
        .agg(sort_array(collect_set(col("x"))).as("s"))
        .collect().head.getAs[scala.collection.Seq[Int]]("s")
      assert(got.toList == xs.distinct.sorted, s"input $xs")
    }
  }

  test("from_json . to_json round-trips generated (city, country) structs") {
    import spark.implicits._
    val gen = for {
      city <- Gen.nonEmptyListOf(Gen.alphaLowerChar).map(_.mkString.take(12))
      country <- Gen.oneOf("us", "de", "fr")
    } yield (city, country)
    samples(gen, 10).foreach { case (city, country) =>
      val df = Seq((city, country)).toDF("group_city", "group_country")
      val back = df
        .select(to_json(struct(col("group_city"), col("group_country"))).as("j"))
        .select(from_json(col("j"),
          org.apache.spark.sql.types.StructType.fromDDL(
            "group_city STRING, group_country STRING")).as("s"))
        .select("s.*").collect().head
      assert(back.getString(0) == city && back.getString(1) == country)
    }
  }

  test("1-minute windows partition the time axis (each ts in exactly its bucket)") {
    import spark.implicits._
    val tsGen = Gen.chooseNum(0L, 86400L * 30)
      .map(s => new Timestamp(1704067200000L + s * 1000))
    samples(Gen.nonEmptyListOf(tsGen), 10).foreach { ts =>
      val rows = ts.toDF("ts")
        .select(col("ts"), window(col("ts"), "1 minute").as("w"))
        .select(col("ts"), col("w.start").as("s"), col("w.end").as("e"))
        .collect()
      rows.foreach { r =>
        val t = r.getTimestamp(0).getTime
        val s = r.getTimestamp(1).getTime
        val e = r.getTimestamp(2).getTime
        assert(s <= t && t < e && e - s == 60000L && s % 60000L == 0,
          s"ts $t window [$s,$e)")
      }
    }
  }

  test("OracleRound.round2 is idempotent and within half-cent") {
    import spark.implicits._
    samples(Gen.chooseNum(0.0, 1e6), 20).foreach { x =>
      val r = Seq(x).toDF("x")
        .select(graft.functions.OracleRound.round2(col("x")).as("a"))
        .select(col("a"), graft.functions.OracleRound.round2(col("a")).as("b"))
        .collect().head
      val (once, twice) = (r.getDouble(0), r.getDouble(1))
      assert(once == twice, s"round2 not idempotent for $x")
      assert(math.abs(once - x) <= 0.005 + 1e-9, s"round2($x) = $once")
    }
  }

  test("prefix-filtered jaccard is complete on random corpora and thresholds") {
    import spark.implicits._
    import graft.operators.Dedup
    // small vocab forces real overlaps; doc lengths span the tiny-doc
    // guard boundary; thresholds include non-dyadic values near the
    // ceil-rounding edge the prefix length computation must respect
    val docGen = Gen.chooseNum(1, 14).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf("a", "b", "c", "d", "e", "f", "g", "h"))
        .map(_.mkString(" ")))
    val corpusGen = Gen.listOfN(12, docGen)
    val thresholds = Seq(0.3, 0.5, 0.7)
    samples(corpusGen, 5).zipWithIndex.foreach { case (texts, i) =>
      val docs = texts.zipWithIndex.map { case (t, id) => (id.toLong, t) }
        .toDF("doc_id", "text")
      val t = thresholds(i % thresholds.size)
      val naive = {
        // docs with no k-shingle can't pair (the operator generates no
        // postings for them); the naive side must skip them too or the
        // union-size denominator hits 0/0 under ANSI mode
        val e = docs.select(col("doc_id"), Dedup.shingles(col("text")).as("shs"))
          .where(size(col("shs")) > 0)
        val a = e.select(col("doc_id").as("doc_a"), col("shs").as("sa"))
        val b = e.select(col("doc_id").as("doc_b"), col("shs").as("sb"))
        a.join(b, col("doc_a") < col("doc_b"))
          .withColumn("inter", size(array_intersect(col("sa"), col("sb"))).cast("double"))
          .select(col("doc_a"), col("doc_b"),
            (col("inter") / (size(col("sa")) + size(col("sb")) - col("inter"))
              .cast("double")).as("j"))
          .where(col("j") >= t)
          .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      }
      val fast = Dedup.ngramJaccardPairs(docs, threshold = t)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(fast == naive,
        s"t=$t corpus=$texts missing=${naive -- fast} extra=${fast -- naive}")
    }
  }

  test("graft_bottom_k keys beyond 64 KiB survive the spill round-trip") {
    // writeUTF's 2-byte length field capped keys at 64 KiB and failed only
    // at shuffle time; serialization is now length-prefixed UTF-8, so a
    // 100 KiB key must round-trip through partial-agg serialize/merge
    import spark.implicits._
    graft.functions.GraftFunctions.register(spark)
    val big = "x" * 100000
    val rows = (1L to 40L).map(i => (i % 2, f"$big${100 - i}%03d", i))
    val got = rows.toDF("g", "k", "v")
      .repartition(8) // force serialized partial buffers across tasks
      .groupBy("g").agg(expr("graft_bottom_k(k, v, 2)").as("ids"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toList).toMap
    // keys share the huge prefix and sort by the zero-padded (100 - i)
    // suffix, so each group's smallest keys belong to its LARGEST i values
    assert(got(0L) == List(40L, 38L) && got(1L) == List(39L, 37L))
  }

  test("graft_bottom_k rejects mis-typed arguments at analysis time") {
    import spark.implicits._
    graft.functions.GraftFunctions.register(spark)
    val df = Seq((1, 2)).toDF("a", "b")
    df.createOrReplaceTempView("bk_types")
    val e = intercept[org.apache.spark.sql.AnalysisException] {
      // int key (not string), int value (not long): must fail in analysis,
      // not as an executor-side ClassCastException
      spark.sql("SELECT graft_bottom_k(a, b, 2) FROM bk_types").collect()
    }
    assert(e.getMessage.toLowerCase.contains("type"))
  }

  test("ensureParallelism rejects post-shuffle frames before running any job") {
    import spark.implicits._
    val shuffled = Seq((1L, "a"), (2L, "b")).toDF("doc_id", "text")
      .groupBy("doc_id").agg(count(lit(1)).as("n"))
    val jobsBefore = spark.sparkContext.statusTracker.getJobIdsForGroup(null).length
    val e = intercept[IllegalArgumentException] {
      graft.engine.Partitioning.ensureParallelism(shuffled, col("doc_id"))
    }
    assert(e.getMessage.contains("scan-only"))
    val jobsAfter = spark.sparkContext.statusTracker.getJobIdsForGroup(null).length
    assert(jobsAfter == jobsBefore, "the rejected probe must not run a hidden job")
    // and the legitimate shape — scan + map-side ops — still passes
    val ok = graft.engine.Partitioning.ensureParallelism(
      Seq((1L, "a")).toDF("doc_id", "text").where(col("doc_id") > 0), col("doc_id"))
    assert(ok.count() == 1)
  }

  test("RSVP schema nullability: corrupt JSON yields null struct, not a crash") {
    import spark.implicits._
    val bad = Seq("{not json", """{"rsvp_id": "str"}""", "")
      .toDF("value").withColumn("timestamp", lit("2021-06-06 12:00:00"))
    val parsed = Rsvp.parse(bad)
    assert(parsed.count() == 3) // permissive mode: rows survive, fields null
    assert(parsed.where(col("rsvp_id").isNotNull).count() == 0)
  }

  test("intervalJoin equals the naive overlap join on generated intervals") {
    import spark.implicits._
    val ptsGen = Gen.listOfN(60, Gen.chooseNum(-500L, 500L))
    val ivGen = Gen.listOfN(25, for {
      lo <- Gen.chooseNum(-500L, 500L)
      len <- Gen.chooseNum(-20L, 300L) // negative → empty interval
    } yield (lo, lo + len))
    (0 until 5).foreach { round =>
      val pts = samples(ptsGen, 1).head.zipWithIndex
        .map { case (v, i) => (i.toLong + round * 1000L, v) }.toDF("pid", "pt")
      val ivs = samples(ivGen, 1).head.zipWithIndex
        .map { case ((lo, hi), i) => (i.toLong, lo, hi) }.toDF("iid", "lo", "hi")
      val naive = pts.join(ivs, col("pt") >= col("lo") && col("pt") <= col("hi"))
        .select("pid", "iid").collect()
        .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
      for (width <- Seq(3L, 64L, 1000L)) {
        val got = graft.operators.Relational
          .intervalJoin(pts, "pt", ivs, "lo", "hi", width)
          .select("pid", "iid").collect()
          .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
        assert(got == naive, s"round $round width $width diverged")
      }
    }
  }

  test("BandedRangeJoinRule preserves results on generated bands") {
    import spark.implicits._
    val valsGen = Gen.listOfN(80, Gen.chooseNum(-300L, 300L))
    val bandGen = for {
      lo <- Gen.chooseNum(-50L, 50L)
      w <- Gen.chooseNum(1L, 120L)
    } yield (lo, lo + w)
    (0 until 5).foreach { round =>
      val l = samples(valsGen, 1).head.zipWithIndex
        .map { case (v, i) => (i.toLong, v) }.toDF("lid", "lv")
      val r = samples(valsGen, 1).head.reverse.zipWithIndex
        .map { case (v, i) => (i.toLong, v) }.toDF("rid", "rv")
      val (lo, hi) = samples(bandGen, 1)(0)
      val cond = col("lv") >= col("rv") + lit(lo) && col("lv") <= col("rv") + lit(hi)
      val naive = l.join(r, cond).select("lid", "rid").collect()
        .map(x => (x.getLong(0), x.getLong(1))).sorted.toSeq
      spark.experimental.extraOptimizations =
        Seq(graft.plans.BandedRangeJoinRule)
      try {
        val banded = l.join(r, cond)
        assert(banded.queryExecution.optimizedPlan.toString.contains("__graft_band"),
          s"round $round band [$lo,$hi] not rewritten")
        val got = banded.select("lid", "rid").collect()
          .map(x => (x.getLong(0), x.getLong(1))).sorted.toSeq
        assert(got == naive, s"round $round band [$lo,$hi] diverged")
      } finally spark.experimental.extraOptimizations = Nil
    }
  }

  test("applyChangeset equals a sequential map-model fold on generated changesets") {
    import spark.implicits._
    import graft.operators.Incremental
    // model: fold changes in seq order into a Map — the reference
    // semantics (latest seq wins because later folds overwrite)
    val keyGen = Gen.chooseNum(0L, 15L)   // small key space → dense collisions
    val changeGen = for {
      key <- keyGen
      op <- Gen.oneOf("I", "U", "D")
      v <- Gen.chooseNum(0, 999)
    } yield (key, op, v.toDouble)
    for (round <- 0 until 8) {
      val baseRows = samples(keyGen, 12).zipWithIndex
        .map { case (k, i) => (k, i.toDouble) }
        .distinctBy(_._1)
      val changes = samples(changeGen, 20).zipWithIndex
        .map { case ((k, op, v), i) => (k, v, op, i.toLong + 1) }
      val model = changes.sortBy(_._4).foldLeft(baseRows.toMap) {
        case (m, (k, v, op, _)) =>
          if (op == "D") m - k else m.updated(k, v)
      }
      val got = Incremental.applyChangeset(
        baseRows.toDF("k", "v"),
        changes.toDF("k", "v", "op", "seq"), "k")
        .as[(Long, Double)].collect().toMap
      assert(got == model,
        s"round $round: missing=${model.toSet -- got.toSet} spurious=${got.toSet -- model.toSet}")
    }
  }

  test("mergeStats is associative and commutative over generated batch splits") {
    import spark.implicits._
    import graft.operators.Incremental
    val rowGen = for {
      src <- Gen.oneOf("a", "b", "c")
      v <- Gen.chooseNum(1L, 500L)
    } yield (src, v)
    for (round <- 0 until 5) {
      val rows = samples(rowGen, 40 + round)
      def part(i: Int) = Incremental.statsPartial(
        rows.zipWithIndex.filter(_._2 % 3 == i).map(_._1)
          .toDF("source", "n_chars"))
      val Seq(p0, p1, p2) = (0 to 2).map(part)
      def fin(df: org.apache.spark.sql.DataFrame) =
        Incremental.finalizeStats(df).collect().toSeq
      val leftFold = fin(Incremental.mergeStats(Incremental.mergeStats(p0, p1), p2))
      val rightFold = fin(Incremental.mergeStats(p0, Incremental.mergeStats(p1, p2)))
      val swapped = fin(Incremental.mergeStats(Incremental.mergeStats(p2, p0), p1))
      val direct = fin(Incremental.statsPartial(rows.toDF("source", "n_chars")))
      assert(leftFold == direct && rightFold == direct && swapped == direct,
        s"round $round: fold order changed the merged stats")
    }
  }

  test("duplicatedSpans equals a sequential reference on generated corpora") {
    import spark.implicits._
    import graft.operators.Dedup
    val n = 3
    // tiny vocabulary forces dense duplicate structure; tokens are already
    // normalized so tokenization is the identity split
    val docGen = Gen.listOfN(8,
      Gen.chooseNum(3, 14).flatMap(len =>
        Gen.listOfN(len, Gen.oneOf("ant", "bee", "cat", "dog", "elk", "fox"))))
    def reference(docs: Seq[(Long, Seq[String])]): Set[(Long, Int, Int)] = {
      val grams = docs.flatMap { case (id, toks) =>
        (0 to toks.size - n).map(p => (id, p, toks.slice(p, p + n).mkString(" ")))
      }
      val counts = grams.groupBy(_._3).view.mapValues(_.size).toMap
      val dup = grams.filter(g => counts(g._3) > 1)
      dup.groupBy(_._1).flatMap { case (id, ps) =>
        val sorted = ps.map(_._2).sorted
        val islands = sorted.tail.foldLeft(List(List(sorted.head))) {
          case (acc @ cur :: rest, p) =>
            if (p - cur.head <= n) (p :: cur) :: rest else List(p) :: acc
          case (Nil, p) => List(List(p))
        }
        islands.map(isl => (id, isl.min, isl.max + n - 1))
      }.toSet
    }
    samples(docGen, 6).zipWithIndex.foreach { case (docs, round) =>
      val withIds = docs.zipWithIndex.map { case (toks, i) => (i.toLong, toks) }
      val df = withIds.map { case (id, toks) => (id, toks.mkString(" ")) }
        .toDF("doc_id", "text")
      val got = Dedup.duplicatedSpans(df, n = n).collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getInt(2))).toSet
      assert(got == reference(withIds),
        s"round $round: spans diverge from the reference on $withIds")
    }
  }

  test("triangle counting equals the naive enumeration on generated graphs") {
    import spark.implicits._
    import graft.operators.Graph
    val edgeGen = Gen.listOfN(40,
      Gen.zip(Gen.chooseNum(1L, 12L), Gen.chooseNum(1L, 12L)))
      .map(_.collect { case (a, b) if a != b => (math.min(a, b), math.max(a, b)) }
        .distinct)
      .suchThat(_.nonEmpty)
    samples(edgeGen, 5).zipWithIndex.foreach { case (edges, round) =>
      val df = edges.toDF("p1", "p2")
      val fast = Graph.triangleCounts(df).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      val naive = Graph.triangleCountsNaive(df).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(fast == naive, s"round $round: $edges → $fast vs $naive")
    }
  }

  test("pageRank matches a sequential reference within rounding on generated graphs") {
    import spark.implicits._
    import graft.operators.Graph
    val edgeGen = Gen.listOfN(30,
      Gen.zip(Gen.chooseNum(1L, 10L), Gen.chooseNum(1L, 10L)))
      .map(_.collect { case (a, b) if a != b => (s"n${math.min(a, b)}", s"n${math.max(a, b)}") }
        .distinct)
      .suchThat(_.nonEmpty)
    def reference(edges: Seq[(String, String)], iters: Int, d: Double): Map[String, Double] = {
      val sym = edges.flatMap { case (u, v) => Seq((u, v), (v, u)) }
      val deg = sym.groupBy(_._1).view.mapValues(_.size).toMap
      val nodes = deg.keys.toSeq.sorted
      var r = nodes.map(_ -> 1.0 / nodes.size).toMap
      for (_ <- 1 to iters) {
        val contrib = scala.collection.mutable.Map.empty[String, Double].withDefaultValue(0.0)
        sym.foreach { case (u, v) => contrib(v) += r(u) / deg(u) }
        r = nodes.map(v => v -> ((1.0 - d) / nodes.size + d * contrib(v))).toMap
      }
      r
    }
    samples(edgeGen, 4).zipWithIndex.foreach { case (edges, round) =>
      val got = Graph.pageRank(edges.toDF("u", "v"), iters = 3).collect()
        .map(r => r.getString(0) -> r.getDouble(1)).toMap
      val want = reference(edges, 3, 0.85)
      assert(got.keySet == want.keySet, s"round $round: node sets differ")
      got.foreach { case (node, rank) =>
        // reference sums in a different order; 6 dp rounding plus a 1-ulp
        // grain bounds the allowed divergence
        assert(math.abs(rank - want(node)) <= 2e-6,
          s"round $round: $node rank $rank vs reference ${want(node)}")
      }
      assert(math.abs(got.values.sum - 1.0) <= got.size * 5e-7,
        s"round $round: mass ${got.values.sum}")
    }
  }

  test("graft_cms on random streams: never undercounts, exact without collisions, partition-invariant") {
    import spark.implicits._
    graft.functions.GraftFunctions.register(spark)
    val gen = Gen.nonEmptyListOf(Gen.oneOf("a", "b", "cc", "dd", "e1", "f2", "g", "h"))
    samples(gen, 8).foreach { xs =>
      val exact = xs.groupBy(identity).map { case (k, v) => (k, v.length.toLong) }
      def countersOf(parts: Int): Seq[Long] =
        xs.toDF("term").repartition(parts)
          .select(expr("graft_cms(term, 3, 64)").as("c"))
          .head.getAs[scala.collection.Seq[Long]]("c").toSeq
      val c1 = countersOf(1)
      // the monoid merge: 1-partition and 4-partition folds agree exactly
      assert(c1 == countersOf(4), s"merge not partition-invariant on $xs")
      // point estimates: min over rows, never below the true count; with
      // 8 keys in 64 buckets collisions are possible per row but three
      // independent rows make systematic overcounting unlikely — assert
      // the one-sided sketch GUARANTEE only (est >= exact), plus the
      // total-mass identity per row
      exact.foreach { case (k, n) =>
        val est = (0 until 3).map { d =>
          c1(d * 64 + graft.functions.CountMinAgg.bucket(d, k, 64))
        }.min
        assert(est >= n, s"CMS undercounts '$k' on $xs: $est < $n")
      }
      (0 until 3).foreach { d =>
        assert(c1.slice(d * 64, (d + 1) * 64).sum == xs.length.toLong,
          s"row $d mass mismatch on $xs")
      }
    }
  }

  test("cms bucket: the column expression equals the JVM derivation") {
    import spark.implicits._
    val terms = Seq("the", "quick", "brown", "fox", "0", "a1b2c3")
    val got = terms.toDF("term")
      .select(col("term"),
        conv(substring(md5(concat(lit("cms2:"), col("term"))), 1, 13), 16, 10)
          .cast("long").%(64).as("b"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    terms.foreach { t =>
      assert(got(t) == graft.functions.CountMinAgg.bucket(2, t, 64).toLong, t)
    }
  }
}
