package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** BPE learning vs a brute-force Sennrich reference: identical merge
  * sequence and segmentations under the shared determinism contract
  * (overlapping pair stats; (count DESC, left, right) tie-break;
  * leftmost-nonoverlap rewrite), plus the run-parity edge the
  * window implementation must get right (left == right chains). */
class BpeSpec extends SparkSpec {

  // canonical leftmost-nonoverlap rewrite
  private def bruteMerge(syms: Vector[String], l: String, r: String)
      : Vector[String] = {
    val out = Vector.newBuilder[String]
    var i = 0
    while (i < syms.length) {
      if (i + 1 < syms.length && syms(i) == l && syms(i + 1) == r) {
        out += (l + r); i += 2
      } else { out += syms(i); i += 1 }
    }
    out.result()
  }

  // Sennrich get_stats + argmax under the engine tie-break
  private def bruteLearn(words0: Map[String, Long], steps: Int)
      : (Seq[(String, String, Long)], Map[String, Vector[String]]) = {
    var segs = words0.keys.map(w =>
      w -> w.map(_.toString).toVector).toMap
    val merges = Seq.newBuilder[(String, String, Long)]
    for (_ <- 1 to steps) {
      val stats = segs.toSeq.flatMap { case (w, syms) =>
        syms.sliding(2).filter(_.length == 2)
          .map(p => (p(0), p(1)) -> words0(w))
      }.groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
      if (stats.nonEmpty) {
        val ((l, r), c) = stats.minBy { case ((l, r), c) => (-c, l, r) }
        merges += ((l, r, c))
        segs = segs.map { case (w, s) => w -> bruteMerge(s, l, r) }
      }
    }
    (merges.result(), segs)
  }

  private def docsOf(words: Map[String, Long]) = {
    val s = spark
    import s.implicits._
    // one doc per word carrying its multiplicity
    words.toSeq.map { case (w, n) => ((w + " ") * n.toInt).trim }
      .zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
  }

  test("classic fixture: merge sequence and segmentations equal the " +
      "brute-force reference, ties broken (count DESC, left, right)") {
    val words = Map("low" -> 5L, "lower" -> 2L, "newest" -> 6L,
      "widest" -> 3L)
    val (bm, bs) = bruteLearn(words, steps = 4)
    val (mdf, syms) = Bpe.learn(docsOf(words), steps = 4, topWords = 10)
    val gm = mdf.orderBy("step").collect()
      .map(r => (r.getString(1), r.getString(2), r.getLong(3))).toSeq
    assert(gm == bm, s"got $gm want $bm")
    // (e,s) must beat the equal-count (s,t) on the lexicographic rule
    assert(gm.head._1 == "e" && gm.head._2 == "s")
    val gs = Bpe.segmentation(syms).collect()
      .map(r => r.getString(0) -> r.getString(2)).toMap
    assert(gs == bs.map { case (w, s) => w -> s.mkString(" ") },
      s"got $gs")
  }

  test("left == right runs: overlapping stats counted, rewrite is " +
      "leftmost-nonoverlap by run parity (aaaa -> aa aa, aaa -> aa a)") {
    val words = Map("aaaa" -> 2L, "aaa" -> 1L, "ba" -> 9L)
    val (mdf, syms) = Bpe.learn(docsOf(words), steps = 1, topWords = 10)
    val m = mdf.collect().head
    // (a,a): aaaa gives 3 overlapping pairs x2 + aaa gives 2 -> 8;
    // (b,a) has 9 and wins — so force step 2 to see (a,a)
    assert((m.getString(1), m.getString(2), m.getLong(3)) == ("b", "a", 9L))
    val (mdf2, syms2) = Bpe.learn(docsOf(words), steps = 2, topWords = 10)
    val m2 = mdf2.orderBy("step").collect()(1)
    assert((m2.getString(1), m2.getString(2), m2.getLong(3)) ==
      ("a", "a", 8L))
    val segs = Bpe.segmentation(syms2).collect()
      .map(r => r.getString(0) -> r.getString(2)).toMap
    assert(segs("aaaa") == "aa aa")
    assert(segs("aaa") == "aa a")
    assert(segs("ba") == "ba")
  }

  test("encodeTokenCounts: in-vocab words count learned symbols, OOV " +
      "words fall back to characters, wordless docs are absent") {
    val s = spark
    import s.implicits._
    val words = Map("aaaa" -> 3L, "bb" -> 2L)
    val (_, syms) = Bpe.learn(docsOf(words), steps = 1, topWords = 10)
    // best pair (a,a): aaaa -> [aa, aa] (2 syms), bb stays [b, b]
    val docs = Seq(
      (100L, "aaaa bb zz"),  // 2 + 2 + 2(OOV chars) = 6 tokens, 3 words
      (101L, "aaaa aaaa"),   // 4 tokens, 2 words
      (102L, "123 !!")       // no letter tokens -> absent
    ).toDF("doc_id", "text")
    val out = Bpe.encodeTokenCounts(docs, syms).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(out == Map(100L -> ((6L, 3L)), 101L -> ((4L, 2L))), s"$out")
  }

  test("property: random small-alphabet corpora equal the brute-force " +
      "reference over 3 steps (ties and left==right chains are the " +
      "common case at alphabet size 3)") {
    val rng = new scala.util.Random(7)
    for (round <- 1 to 3) {
      val words = (1 to 15).map { _ =>
        val len = 2 + rng.nextInt(6)
        (1 to len).map(_ => ('a' + rng.nextInt(3)).toChar).mkString
      }.distinct.map(w => w -> (1L + rng.nextInt(9))).toMap
      val (bm, bs) = bruteLearn(words, steps = 3)
      val (mdf, syms) = Bpe.learn(docsOf(words), steps = 3,
        topWords = 50)
      val gm = mdf.orderBy("step").collect()
        .map(r => (r.getString(1), r.getString(2), r.getLong(3))).toSeq
      assert(gm == bm, s"round $round: got $gm want $bm words $words")
      val gs = Bpe.segmentation(syms).collect()
        .map(r => r.getString(0) -> r.getString(2)).toMap
      assert(gs == bs.map { case (w, s) => w -> s.mkString(" ") },
        s"round $round: words $words")
    }
  }

  test("partitioning invariance and the topWords bound") {
    // letter-only words: the [\p{L}]+ tokenizer strips digits
    val words = (1 to 40).map { i =>
      ("wq" + ('a' + i / 26).toChar.toString +
        ('a' + i % 26).toChar.toString) -> (i + 10).toLong
    }.toMap
    val df = docsOf(words)
    def run(d: org.apache.spark.sql.DataFrame) = {
      val (m, s) = Bpe.learn(d, steps = 2, topWords = 12)
      (m.orderBy("step").collect().map(_.toSeq).toSeq,
        Bpe.segmentation(s).collect()
          .map(r => (r.getString(0), r.getLong(1), r.getString(2))).toSet)
    }
    val a = run(df)
    val b = run(df.repartition(7))
    assert(a == b)
    assert(a._2.size == 12) // the bound holds and selection is stable
  }
}
