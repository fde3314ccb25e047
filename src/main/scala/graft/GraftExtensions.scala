package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.{JaccardSorted, LangIdExpr, MinHashFromHashes, MinHashSignature, MinHashTokens, NormalizeTextExpr, ShingleHashes, ShingleHashesSorted, SimHash64, TextStatsExpr}

/** Session extension registering graft's native expressions for SQL use:
  *
  * {{{
  *   spark.sql.extensions=graft.GraftExtensions
  *   SELECT simhash64(split(text, ' ')), minhash_tokens(split(text, ' '), 3, 64) FROM docs
  * }}}
  *
  * The expressions stay codegen'd through SQL exactly as through the Column
  * API (same Catalyst nodes).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def info(clazz: String, name: String) =
    new ExpressionInfo(clazz, name)

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((FunctionIdentifier("simhash64"),
      info("graft.functions.SimHash64", "simhash64"),
      (exprs: Seq[Expression]) => SimHash64(exprs.head)))

    ext.injectFunction((FunctionIdentifier("minhash_signature"),
      info("graft.functions.MinHashSignature", "minhash_signature"),
      (exprs: Seq[Expression]) => MinHashSignature(exprs.head,
        if (exprs.length > 1) intArg(exprs(1), "numHashes") else 64)))

    ext.injectFunction((FunctionIdentifier("minhash_tokens"),
      info("graft.functions.MinHashTokens", "minhash_tokens"),
      (exprs: Seq[Expression]) => MinHashTokens(exprs.head,
        if (exprs.length > 1) intArg(exprs(1), "shingleSize") else 3,
        if (exprs.length > 2) intArg(exprs(2), "numHashes") else 64)))

    ext.injectFunction((FunctionIdentifier("shingle_hashes"),
      info("graft.functions.ShingleHashes", "shingle_hashes"),
      (exprs: Seq[Expression]) => ShingleHashes(exprs.head,
        if (exprs.length > 1) intArg(exprs(1), "shingleSize") else 3)))

    ext.injectFunction((FunctionIdentifier("shingle_hashes_sorted"),
      info("graft.functions.ShingleHashesSorted", "shingle_hashes_sorted"),
      (exprs: Seq[Expression]) => ShingleHashesSorted(exprs.head,
        if (exprs.length > 1) intArg(exprs(1), "shingleSize") else 3)))

    ext.injectFunction((FunctionIdentifier("minhash_from_hashes"),
      info("graft.functions.MinHashFromHashes", "minhash_from_hashes"),
      (exprs: Seq[Expression]) => MinHashFromHashes(exprs.head,
        if (exprs.length > 1) intArg(exprs(1), "numHashes") else 64)))

    ext.injectFunction((FunctionIdentifier("jaccard_sorted"),
      info("graft.functions.JaccardSorted", "jaccard_sorted"),
      (exprs: Seq[Expression]) => JaccardSorted(exprs(0), exprs(1))))

    ext.injectFunction((FunctionIdentifier("text_stats"),
      info("graft.functions.TextStatsExpr", "text_stats"),
      (exprs: Seq[Expression]) => TextStatsExpr(exprs.head)))

    ext.injectFunction((FunctionIdentifier("lang_id"),
      info("graft.functions.LangIdExpr", "lang_id"),
      (exprs: Seq[Expression]) => LangIdExpr(exprs.head)))

    ext.injectFunction((FunctionIdentifier("normalize_text"),
      info("graft.functions.NormalizeTextExpr", "normalize_text"),
      (exprs: Seq[Expression]) => NormalizeTextExpr(exprs.head)))

    ext.injectFunction((FunctionIdentifier("cosine_sim"),
      info("graft.functions.CosineSimFloat", "cosine_sim"),
      (exprs: Seq[Expression]) => graft.functions.CosineSimFloat(exprs(0), exprs(1))))
  }

  private def intArg(e: Expression, name: String): Int = e match {
    case lit: org.apache.spark.sql.catalyst.expressions.Literal =>
      lit.value.toString.toInt
    case other => throw new IllegalArgumentException(
      s"$name must be an integer literal, got $other")
  }
}
