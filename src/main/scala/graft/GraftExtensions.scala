package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}

import graft.functions.{CosineSimilarity, HyperplaneSignature, ImageMeta, MinhashSignature, RollingChunkHashes, SimhashSignature, WordNgrams}

/** SparkSessionExtensions entry point exposing graft's custom Catalyst
  * expressions as SQL functions:
  *
  *   spark.sql.extensions=graft.GraftExtensions
  *
  * then `SELECT cosine_similarity(a.embedding, b.embedding)`,
  * `SELECT rolling_chunk_hashes(text [, avgChunkBits [, minChunk]])` and
  * `SELECT hyperplane_signature(emb [, numTables [, bitsPerTable [, seed]]])`
  * work from plain SQL. For a session that already exists (the driver
  * harness owns creation), use
  * `org.apache.spark.sql.GraftSql.registerFunctions(spark)` instead.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftExtensions.functions.foreach(ext.injectFunction)
}

object GraftExtensions {
  private def intLit(e: Expression, what: String): Int = e match {
    case Literal(v: Int, _) => v
    case other => throw new IllegalArgumentException(
      s"$what must be an integer literal, got $other")
  }

  private def longLit(e: Expression, what: String): Long = e match {
    case Literal(v: Long, _) => v
    case Literal(v: Int, _) => v.toLong
    case other => throw new IllegalArgumentException(
      s"$what must be an integer literal, got $other")
  }

  val functions: Seq[(FunctionIdentifier, ExpressionInfo,
      Seq[Expression] => Expression)] = Seq(
    (FunctionIdentifier("cosine_similarity"),
      new ExpressionInfo(classOf[CosineSimilarity].getName,
        "cosine_similarity"),
      (args: Seq[Expression]) => {
        require(args.length == 2,
          s"cosine_similarity takes 2 arguments, got ${args.length}")
        CosineSimilarity(args.head, args(1))
      }),
    (FunctionIdentifier("rolling_chunk_hashes"),
      new ExpressionInfo(classOf[RollingChunkHashes].getName,
        "rolling_chunk_hashes"),
      (args: Seq[Expression]) => {
        require(args.nonEmpty && args.length <= 3,
          s"rolling_chunk_hashes takes 1-3 arguments, got ${args.length}")
        RollingChunkHashes(args.head,
          avgChunkBits =
            if (args.length > 1) intLit(args(1), "avgChunkBits") else 6,
          window = if (args.length > 2) intLit(args(2), "minChunk") else 16)
      }),
    (FunctionIdentifier("hyperplane_signature"),
      new ExpressionInfo(classOf[HyperplaneSignature].getName,
        "hyperplane_signature"),
      (args: Seq[Expression]) => {
        require(args.nonEmpty && args.length <= 4,
          s"hyperplane_signature takes 1-4 arguments, got ${args.length}")
        HyperplaneSignature(args.head,
          numTables =
            if (args.length > 1) intLit(args(1), "numTables") else 8,
          bitsPerTable =
            if (args.length > 2) intLit(args(2), "bitsPerTable") else 16,
          seed = if (args.length > 3) longLit(args(3), "seed") else 42L)
      }),
    (FunctionIdentifier("minhash_signature"),
      new ExpressionInfo(classOf[MinhashSignature].getName,
        "minhash_signature"),
      (args: Seq[Expression]) => {
        require(args.nonEmpty && args.length <= 3,
          s"minhash_signature takes 1-3 arguments, got ${args.length}")
        MinhashSignature(args.head,
          numHashes =
            if (args.length > 1) intLit(args(1), "numHashes") else 64,
          seed = if (args.length > 2) longLit(args(2), "seed") else 42L)
      }),
    (FunctionIdentifier("word_ngrams"),
      new ExpressionInfo(classOf[WordNgrams].getName, "word_ngrams"),
      (args: Seq[Expression]) => {
        require(args.length >= 2 && args.length <= 3,
          s"word_ngrams takes 2-3 arguments, got ${args.length}")
        WordNgrams(args.head, n = intLit(args(1), "n"),
          strictFallback = args.length > 2 && (args(2) match {
            case Literal(v: Boolean, _) => v
            case other => throw new IllegalArgumentException(
              s"strictFallback must be a boolean literal, got $other")
          }))
      }),
    (FunctionIdentifier("simhash_signature"),
      new ExpressionInfo(classOf[SimhashSignature].getName,
        "simhash_signature"),
      (args: Seq[Expression]) => {
        require(args.length == 1,
          s"simhash_signature takes 1 argument, got ${args.length}")
        SimhashSignature(args.head)
      }),
    (FunctionIdentifier("image_meta"),
      new ExpressionInfo(classOf[ImageMeta].getName, "image_meta"),
      (args: Seq[Expression]) => {
        require(args.length == 1,
          s"image_meta takes 1 argument, got ${args.length}")
        ImageMeta(args.head)
      }))
}
