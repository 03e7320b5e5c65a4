package graft.features

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Train/test split-flag column + the predefined-split filters.
  *
  * Reference semantics (`add_split_column`,
  * spark_ml_features.py:248-265 / spark_ml_features_local.py:248-265):
  * append `is_train: int`, either
  *   - "random": `int(rand() < 0.7)` — the reference leaves `rand()`
  *     unseeded (SURVEY.md Q4); we take a seed defaulting to a fixed
  *     value so reruns are reproducible, and
  *   - custom: `int(label != excluded)` — the local variant compares the
  *     indexed label to 0; generalized here to any deterministic
  *     predicate so it stays oracle-checkable.
  *
  * `predefined_split` filters (spark_ml_features.py:227-228):
  * `is_train == 1` / `== 0` — plain pushdown-friendly predicates; at
  * 100 TB these reach the parquet scan as `PushedFilters`, no shuffle.
  */
object SplitColumn {
  val DefaultSeed = 42L

  /** `is_train = int(rand(seed) < trainFraction)`. */
  def random(df: DataFrame, trainFraction: Double = 0.7,
      seed: Long = DefaultSeed): DataFrame =
    df.withColumn("is_train", (rand(seed) < trainFraction).cast("int"))

  /** `is_train = int(predicate)` — the reference's "custom" branch
    * (`label != excludedValue`), generalized. */
  def custom(df: DataFrame, predicate: Column): DataFrame =
    df.withColumn("is_train", predicate.cast("int"))

  /** Custom branch exactly as the reference writes it: everything whose
    * label differs from `excluded` trains. */
  def customByLabel(df: DataFrame, labelCol: String, excluded: Any): DataFrame =
    custom(df, col(labelCol) =!= lit(excluded))

  /** The reference's `predefined_split` train/test filters. */
  def trainSplit(df: DataFrame, splitCol: String = "is_train"): DataFrame =
    df.filter(col(splitCol) === 1)
  def testSplit(df: DataFrame, splitCol: String = "is_train"): DataFrame =
    df.filter(col(splitCol) === 0)
}
