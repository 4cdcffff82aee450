package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.engine.Tables
import graft.operators.Bpe

/** BPE invariants, pinned by a THIRD derivation: a plain-Scala imperative
  * BPE (explicit symbol lists, no delimiter-string trick) must reproduce
  * both training's merge sequence and serving's segmentations exactly.
  * The DuckDB oracle already re-derives training in SQL at sf0.01; this
  * closes the triangle engine-independently at sf0.001.
  */
class BpeSpec extends AnyFunSuite {
  private val sf = "/root/testdata/sf0.001"

  lazy val spark: SparkSession = graft.engine.Sessions
    .builder("graft-test").master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .getOrCreate()

  /** TextAnalysis.normalize/tokens, replicated imperatively. */
  private def tokensOf(text: String): Seq[String] =
    text.toLowerCase.replaceAll("[^a-z0-9]+", " ").trim
      .split(" ").toSeq.filter(_.nonEmpty)

  /** One greedy left-to-right application of merge (a, b). */
  private def applyOnce(syms: List[String], a: String, b: String): List[String] =
    syms match {
      case x :: y :: rest if x == a && y == b => (a + b) :: applyOnce(rest, a, b)
      case x :: rest => x :: applyOnce(rest, a, b)
      case Nil => Nil
    }

  private lazy val wordFreqs: Map[String, Long] = {
    import spark.implicits._
    Tables.documents(spark, sf).select("text").as[String].collect()
      .flatMap(tokensOf).groupBy(identity)
      .map { case (w, ws) => (w, ws.length.toLong) }
  }

  /** Reference trainer: explicit pair counting over symbol lists. */
  private def refTrain(k: Int): Seq[(String, String, Long)] = {
    var words: Map[List[String], Long] = wordFreqs
      .filter(_._2 >= Bpe.MinFreq)
      .map { case (w, f) => (w.map(_.toString).toList, f) }
    (1 to k).map { _ =>
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      words.foreach { case (syms, f) =>
        syms.zip(syms.drop(1)).foreach { p =>
          counts(p) = counts.getOrElse(p, 0L) + f
        }
      }
      val ((a, b), cnt) = counts.minBy { case ((x, y), c) => (-c, x, y) }
      words = words.groupBy { case (syms, _) => applyOnce(syms, a, b) }
        .map { case (syms, m) => (syms, m.values.sum) }
      (a, b, cnt)
    }
  }

  test("trainMerges equals the imperative reference trainer, round for round") {
    val k = 8
    val got = Bpe.trainMerges(Tables.documents(spark, sf), k)
    val want = refTrain(k)
    got.zip(want).zipWithIndex.foreach { case ((m, (a, b, cnt)), i) =>
      assert((m.lhs, m.rhs, m.count) === ((a, b, cnt)), s"merge ${i + 1}")
      assert(m.rank === i + 1)
    }
    // the selected pair count is non-increasing across rounds (merging
    // only lowers existing pair counts; pairs born from a merge are
    // bounded by that merge's count)
    val cs = got.map(_.count)
    assert(cs.zip(cs.tail).forall { case (x, y) => x >= y }, cs.toSeq)
  }

  test("segmentations reassemble their words and match imperative merge application") {
    val dir = java.nio.file.Files.createTempDirectory("graft-bpe").toString
    val docs = Tables.documents(spark, sf)
    val k = 8
    val merges = Bpe.publishedMerges(docs, dir, "bpe_spec", numMerges = k)
    val segs = Bpe.topSegmentations(docs, dir, "bpe_spec", numMerges = k,
      topK = 50).collect()
    // sf0.001's vocabulary may be smaller than topK — take what exists
    assert(segs.length === math.min(50, wordFreqs.size))
    segs.foreach { r =>
      val word = r.getString(0)
      val syms = r.getString(2).split(" ").toList
      assert(syms.mkString("") === word, s"segmentation loses bytes: $word")
      assert(syms.forall(_.nonEmpty))
      val ref = merges.foldLeft(word.map(_.toString).toList) { (s, m) =>
        applyOnce(s, m.lhs, m.rhs)
      }
      assert(syms === ref, s"segmentation of '$word' diverges from greedy BPE")
    }
  }

  test("tokenizeStats: subword count bounded by char count, floored by word count") {
    val dir = java.nio.file.Files.createTempDirectory("graft-bpe2").toString
    val docs = Tables.documents(spark, sf)
    val stats = Bpe.tokenizeStats(docs, dir, "bpe_spec2", numMerges = 8).collect()
    assert(stats.nonEmpty)
    stats.foreach { r =>
      val (nw, ns) = (r.getLong(1), r.getLong(2))
      assert(ns >= nw, s"fewer subwords than words for doc ${r.getLong(0)}")
      val ratio = r.getDouble(3)
      assert(ratio >= 1.0 && ratio <= 64.0)
    }
    // merges actually fire: somewhere the ratio beats the no-merge bound
    // (chars per word), i.e. subwords < characters overall
    import spark.implicits._
    val totalChars = docs.select("text").as[String].collect()
      .flatMap(tokensOf).map(_.length.toLong).sum
    val totalSub = stats.map(_.getLong(2)).sum
    assert(totalSub < totalChars, "no merge ever applied")
  }
}
