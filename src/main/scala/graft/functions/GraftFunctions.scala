package graft.functions

import org.apache.spark.sql.{Column, SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.functions.call_function

/** Registration + Column-API surface for the engine's native expressions.
  *
  * Two paths, same expressions:
  *  - [[register]]: runtime temp-function registration (used by the
  *    engine itself — works on any session the driver hands us);
  *  - [[GraftExtensions]]: a SparkSessionExtensions installer for users
  *    who configure `spark.sql.extensions=graft.functions.GraftExtensions`
  *    and want the functions in plain SQL from session start.
  */
object GraftFunctions {

  private val builders: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "graft_minhash"       -> (exprs => MinHashSignature(exprs.head)),
    "graft_minhash_bands" -> (exprs => MinHashBands(exprs.head)))

  def register(spark: SparkSession): Unit =
    builders.foreach { case (name, builder) =>
      spark.sessionState.functionRegistry
        .createOrReplaceTempFunction(name, builder, "built-in")
    }

  /** Column API: 64-permutation MinHash signature of a shingle array. */
  def minhashSignature(shingles: Column)(implicit spark: SparkSession): Column = {
    register(spark)
    call_function("graft_minhash", shingles)
  }

  /** Column API: 16 LSH band-bucket hashes of a shingle array. */
  def minhashBands(shingles: Column)(implicit spark: SparkSession): Column = {
    register(spark)
    call_function("graft_minhash_bands", shingles)
  }
}

/** `spark.sql.extensions` installer. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction((
      FunctionIdentifier("graft_minhash"),
      new ExpressionInfo(classOf[MinHashSignature].getName, "graft_minhash"),
      (exprs: Seq[Expression]) => MinHashSignature(exprs.head)))
    e.injectFunction((
      FunctionIdentifier("graft_minhash_bands"),
      new ExpressionInfo(classOf[MinHashBands].getName, "graft_minhash_bands"),
      (exprs: Seq[Expression]) => MinHashBands(exprs.head)))
  }
}
