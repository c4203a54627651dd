package graft

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.types.IntegerType

import graft.expressions.{DotProduct, GramHashes, HyperplaneSignature, MinhashSignature, RollingFingerprint, SimhashSignature, SimhashSignatureMd5, WinnowSelect}

/** SQL registration of the engine's native expressions, so
  * `spark.sql("SELECT graft_dot(a, b) ...")` works alongside the
  * Column API:
  *
  *  - `graft_dot(array<double>, array<double>) → double`
  *  - `graft_hyperplane_sig(array<double>, planes int literal) → bigint`
  *  - `graft_minhash_sig(array<string>, numHashes int literal) → array<bigint>`
  *  - `graft_simhash(array<string>) → bigint`
  *  - `graft_simhash_md5(array<string>) → bigint` (engine-neutral md5 token hash)
  *  - `graft_rolling_fp(array<string>) → bigint`
  *  - `graft_gram_hashes(array<string>, n int literal) → array<bigint>`
  *  - `graft_winnow(array<bigint>, w int literal) → array<int>` (winnowing
  *    fingerprint positions — rightmost window minima)
  *
  * Two entry points: `GraftFunctions.register(spark)` injects into an
  * existing session's function registry; `GraftExtensions` is the
  * `spark.sql.extensions=graft.GraftExtensions` route for sessions
  * built from config (cluster deployments, spark-sql shells).
  */
object GraftFunctions {

  private def info(clazz: Class[_], name: String): ExpressionInfo =
    new ExpressionInfo(clazz.getName, name)

  val functions: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] =
    Seq(
      (FunctionIdentifier("graft_dot"),
        info(classOf[DotProduct], "graft_dot"),
        { args =>
          require(args.size == 2, "graft_dot(vecA, vecB) takes 2 arguments")
          DotProduct(args.head, args(1))
        }),
      (FunctionIdentifier("graft_hyperplane_sig"),
        info(classOf[HyperplaneSignature], "graft_hyperplane_sig"),
        { args =>
          require(args.size == 2,
            "graft_hyperplane_sig(vec, planes) takes 2 arguments")
          val planes = args(1) match {
            case Literal(v: Int, IntegerType) => v
            case _ => throw new IllegalArgumentException(
              "graft_hyperplane_sig: planes must be an integer literal " +
                "(the plane count shapes the expression at plan build)")
          }
          HyperplaneSignature(args.head, planes)
        }),
      (FunctionIdentifier("graft_minhash_sig"),
        info(classOf[MinhashSignature], "graft_minhash_sig"),
        { args =>
          require(args.size == 2,
            "graft_minhash_sig(shingles, numHashes) takes 2 arguments")
          val numHashes = args(1) match {
            case Literal(v: Int, IntegerType) => v
            case _ => throw new IllegalArgumentException(
              "graft_minhash_sig: numHashes must be an integer literal " +
                "(the signature width shapes the expression at plan build)")
          }
          MinhashSignature(args.head, numHashes)
        }),
      (FunctionIdentifier("graft_simhash"),
        info(classOf[SimhashSignature], "graft_simhash"),
        { args =>
          require(args.size == 1, "graft_simhash(tokens) takes 1 argument")
          SimhashSignature(args.head)
        }),
      (FunctionIdentifier("graft_simhash_md5"),
        info(classOf[SimhashSignatureMd5], "graft_simhash_md5"),
        { args =>
          require(args.size == 1, "graft_simhash_md5(tokens) takes 1 argument")
          SimhashSignatureMd5(args.head)
        }),
      (FunctionIdentifier("graft_rolling_fp"),
        info(classOf[RollingFingerprint], "graft_rolling_fp"),
        { args =>
          require(args.size == 1, "graft_rolling_fp(tokens) takes 1 argument")
          RollingFingerprint(args.head)
        }),
      (FunctionIdentifier("graft_gram_hashes"),
        info(classOf[GramHashes], "graft_gram_hashes"),
        { args =>
          require(args.size == 2,
            "graft_gram_hashes(tokens, n) takes 2 arguments")
          val n = args(1) match {
            case Literal(v: Int, IntegerType) => v
            case _ => throw new IllegalArgumentException(
              "graft_gram_hashes: n must be an integer literal " +
                "(the gram size shapes the expression at plan build)")
          }
          GramHashes(args.head, n)
        }),
      (FunctionIdentifier("graft_winnow"),
        info(classOf[WinnowSelect], "graft_winnow"),
        { args =>
          require(args.size == 2,
            "graft_winnow(gramHashes, w) takes 2 arguments")
          val w = args(1) match {
            case Literal(v: Int, IntegerType) => v
            case _ => throw new IllegalArgumentException(
              "graft_winnow: w must be an integer literal " +
                "(the window size shapes the expression at plan build)")
          }
          WinnowSelect(args.head, w)
        }))

  /** Imperative registration into a live session. */
  def register(spark: SparkSession): Unit =
    functions.foreach { case (id, inf, builder) =>
      spark.sessionState.functionRegistry.registerFunction(id, inf, builder)
    }
}

/** `spark.sql.extensions` entry point. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftFunctions.functions.foreach(ext.injectFunction)
}
