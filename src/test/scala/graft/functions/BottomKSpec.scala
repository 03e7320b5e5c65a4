package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.Encoders
import org.apache.spark.sql.functions._

/** Bottom-k / KMV sketch: pure algebra (sorted-distinct insert, min-k
  * cap, min-payload tiebreak), the determinism claim the oracle rows
  * lean on (state is a pure function of the input SET — any
  * partitioning, any merge order, any regime), estimator accuracy,
  * and persisted-merge == one-shot. */
class BottomKSpec extends SparkSpec {

  private val enc = Encoders.tuple(Encoders.scalaLong, Encoders.scalaDouble)

  private def state(k: Int, items: Seq[(Long, Double)]): BkState =
    items.foldLeft(new BottomK(k).zero)((b, x) => new BottomK(k).reduce(b, x))

  test("reduce: sorted insert, cap at k, skip above the k-th, " +
      "duplicate hash keeps min payload") {
    val st = state(3, Seq((50L, 5.0), (10L, 1.0), (99L, 9.0), (30L, 3.0)))
    assert(st.hashes.toSeq == Seq(10L, 30L, 50L)) // 99 evicted
    assert(st.values.toSeq == Seq(1.0, 3.0, 5.0))
    // above the current k-th: no-op
    val st2 = new BottomK(3).reduce(st, (60L, 6.0))
    assert(st2.hashes.toSeq == Seq(10L, 30L, 50L))
    // duplicate hash: min payload wins regardless of arrival order
    val d1 = state(3, Seq((10L, 2.0), (10L, 1.0)))
    val d2 = state(3, Seq((10L, 1.0), (10L, 2.0)))
    assert(d1.hashes.toSeq == Seq(10L) && d1.values.toSeq == Seq(1.0))
    assert(d2.values.toSeq == Seq(1.0))
  }

  test("merge: equals one-shot over the concatenated input, at any " +
      "split point, including the k-cap and cross-side duplicates") {
    val k = 4
    val items = Seq((7L, 7.0), (3L, 3.0), (11L, 11.0), (5L, 5.0),
      (3L, 2.0), (1L, 1.0), (9L, 9.0))
    val oneShot = state(k, items)
    assert(oneShot.hashes.toSeq == Seq(1L, 3L, 5L, 7L))
    assert(oneShot.values.toSeq == Seq(1.0, 2.0, 5.0, 7.0)) // min at 3
    for (split <- 0 to items.length) {
      val (a, b) = items.splitAt(split)
      val m1 = BottomK.mergeStates(state(k, a), state(k, b), k)
      val m2 = BottomK.mergeStates(state(k, b), state(k, a), k)
      assert(m1.hashes.toSeq == oneShot.hashes.toSeq, s"split=$split")
      assert(m1.values.toSeq == oneShot.values.toSeq, s"split=$split")
      assert(m2.hashes.toSeq == oneShot.hashes.toSeq, s"order, split=$split")
      assert(m2.values.toSeq == oneShot.values.toSeq, s"order, split=$split")
    }
  }

  test("distributed determinism: identical state arrays under 1/3/7 " +
      "partitions in the APPROXIMATE regime (the claim every oracle " +
      "row leans on)") {
    val s = spark
    import s.implicits._
    // 500 distinct keys, k=32 — deep in the approximate regime
    val df = (0L until 500L).map(i => s"user$i").toDF("u")
    val bk = udaf(new BottomK(32), enc)
    val states = Seq(1, 3, 7).map { nPart =>
      df.repartition(nPart)
        .agg(bk(BottomK.hash64(col("u")), lit(0.0)).as("sk"))
        .select("sk.*").as[BkState].head()
    }
    assert(states.forall(_.hashes.length == 32))
    assert(states.forall(_.hashes.toSeq == states.head.hashes.toSeq))
    // duplicates collapse: the sketch of the double-unioned input is
    // the same set's sketch
    val dup = df.union(df).repartition(5)
      .agg(bk(BottomK.hash64(col("u")), lit(0.0)).as("sk"))
      .select("sk.*").as[BkState].head()
    assert(dup.hashes.toSeq == states.head.hashes.toSeq)
  }

  test("estimateDistinct: exact below k; within 4/sqrt(k) relative " +
      "error above it (CLT bound, deterministic for the fixed hash)") {
    val s = spark
    import s.implicits._
    val bk = udaf(new BottomK(256), enc)
    def estOf(n: Long): Double =
      (0L until n).map(i => s"id$i").toDF("u")
        .agg(bk(BottomK.hash64(col("u")), lit(0.0)).as("sk"))
        .select(BottomK.estimateDistinct(col("sk"), 256))
        .head().getDouble(0)
    assert(estOf(100L) == 100.0) // sub-k: exact by construction
    val est = estOf(20000L)
    val relErr = math.abs(est - 20000.0) / 20000.0
    assert(relErr < 4.0 / math.sqrt(256.0), s"est=$est relErr=$relErr")
  }

  test("BottomKMerge over a parquet round-trip == one-shot sketch " +
      "(the events_cardinality_kmv workflow, minus the oracle)") {
    val s = spark
    import s.implicits._
    val df = (0L until 3000L).map(i => (i, s"u${i % 700}"))
      .toDF("id", "u")
    val bk = udaf(new BottomK(64), enc)
    val mrg = udaf(new BottomKMerge(64), Encoders.product[BkState])
    val oneShot = df.agg(bk(BottomK.hash64(col("u")), lit(0.0)).as("sk"))
      .select("sk.*").as[BkState].head()
    val tmp = java.nio.file.Files.createTempDirectory("graft_bk_spec")
    try {
      df.filter($"id" % 2 === 0)
        .agg(bk(BottomK.hash64(col("u")), lit(0.0)).as("sk"))
        .write.mode("overwrite").parquet(s"$tmp/sk")
      val merged = spark.read.parquet(s"$tmp/sk")
        .unionByName(df.filter($"id" % 2 === 1)
          .agg(bk(BottomK.hash64(col("u")), lit(0.0)).as("sk")))
        .agg(mrg(col("sk.hashes"), col("sk.values")).as("sk"))
        .select("sk.*").as[BkState].head()
      assert(merged.hashes.toSeq == oneShot.hashes.toSeq)
      assert(merged.values.toSeq == oneShot.values.toSeq)
    } finally {
      def del(f: java.io.File): Unit = {
        if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(del))
        f.delete(); ()
      }
      del(tmp.toFile)
    }
  }

  test("hash64 matches the DuckDB restatement on crafted values " +
      "(spot-check of the cross-engine recipe)") {
    val s = spark
    import s.implicits._
    // DuckDB: SELECT ('0x' || substr(md5('42'), 1, 15))::BIGINT
    //           -> 728752383503378226 (verified by the oracle gate;
    //              pinned here so a md5/conv regression fails fast)
    val got = Seq("42").toDF("v")
      .select(BottomK.hash64(col("v"))).head().getLong(0)
    assert(got == 728752383503378226L)
  }
}
