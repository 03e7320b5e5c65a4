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
}
