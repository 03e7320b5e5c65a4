package graft.llm

import org.apache.spark.ml.feature.{HashingTF, IDF, RegexTokenizer}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Text featurization for downstream ML: TF-IDF vectors over hashed
  * token space (SURVEY.md §7 extension list).
  *
  * Scale notes: the tokenize→HashingTF stages are narrow, stateless
  * per-row transforms (hashing, not vocabulary fitting — no fit pass,
  * no OOV at any corpus size). Only `IDF.fit` aggregates: one
  * treeAggregate computing per-bucket document frequencies, a
  * fixed-size (numFeatures) driver result broadcast back into the
  * transform. One scan to fit, one to transform. */
object TextFeatures {

  def tfidf(
      docs: DataFrame,
      textCol: String = "text",
      idCol: String = "doc_id",
      numFeatures: Int = 1 << 18,
      outputCol: String = "tfidf"): DataFrame = {
    val tokens = new RegexTokenizer()
      .setInputCol(textCol).setOutputCol("tokens")
      .setPattern("[^\\p{L}\\p{N}]+")
      .transform(docs.select(col(idCol), col(textCol)))
    val tf = new HashingTF()
      .setInputCol("tokens").setOutputCol("tf").setNumFeatures(numFeatures)
      .transform(tokens)
    new IDF().setInputCol("tf").setOutputCol(outputCol)
      .fit(tf)
      .transform(tf)
      .select(col(idCol), col(outputCol))
  }

  /** Exact (un-hashed) TF-IDF with per-document top-k terms — the
    * keyword-extraction / doc-signature query. Unlike [[tfidf]]'s
    * fixed hash space this keeps real terms, so results are
    * SQL-oracle-checkable and human-readable. Tokenization matches the
    * dedup/repetition family (lowercase, split on non-alphanumeric).
    * `tfidf = tf · (ln((N+1)/(df+1)) + 1)` — the standard smoothed-idf
    * formulation (sklearn TfidfTransformer semantics, public).
    *
    * Ranking is by the all-integer key (tf DESC, df ASC, term ASC) —
    * a total order per doc (terms are distinct within a doc) that
    * agrees with tfidf ordering wherever tfidf differs through df
    * alone, and is bit-reproducible across engines, unlike a float
    * sort key; the float tfidf value rides along rounded to 6dp.
    *
    * Scale notes: three partial-aggregated shuffles, each on a
    * different natural key — explode→groupBy(doc, term) for tf (map-side
    * combine absorbs within-partition repeats), groupBy(term) over the
    * already-distinct (doc, term) pairs for df (output = vocabulary
    * size ≪ corpus), a term-keyed join to attach df (AQE broadcasts it
    * when the vocabulary is small), and a doc-keyed window whose
    * row_number ≤ k filter plans as WindowGroupLimit — the per-partition
    * top-k cap that keeps the sort local and the output bounded at
    * k·docs rows. N (corpus size) is the one driver-side scalar (a
    * fixed-size count, the RobustScaling quantile-triple pattern). */
  def tfidfExact(
      docs: DataFrame,
      textCol: String = "text",
      idCol: String = "doc_id",
      topK: Int = 3): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val nDocs = docs.count()
    val toks = filter(split(lower(col(textCol)), "[^\\p{L}\\p{N}]+"),
      w => length(w) > 0)
    val tf = docs
      .select(col(idCol), explode(toks).as("term"))
      .groupBy(col(idCol), col("term"))
      .agg(count(lit(1)).as("tf"))
    val df = tf.groupBy(col("term")).agg(count(lit(1)).as("df_docs"))
    val w = Window.partitionBy(col(idCol))
      .orderBy(col("tf").desc, col("df_docs").asc, col("term").asc)
    tf.join(df, "term")
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= topK)
      .withColumn("tfidf",
        round(col("tf") *
          (log((lit(nDocs + 1.0)) / (col("df_docs") + lit(1.0))) + 1.0), 6))
      .select(col(idCol), col("term"), col("tf"), col("df_docs"),
        col("tfidf"), col("rank"))
  }
}
