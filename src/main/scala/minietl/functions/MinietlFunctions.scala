package minietl.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SQL registration for the native expressions, so `spark.sql` users can
  * call them directly (`vec_dot`, `jaccard_sorted`, `intersect_sorted_count`,
  * `minhash_signature`, `simhash64`, `shingle_hashes`, `minhash_estimate`).
  *
  * Two entry points:
  *  - [[MinietlExtensions]] for `spark.sql.extensions=minietl.functions.MinietlExtensions`
  *    (cluster-wide, survives session cloning);
  *  - [[MinietlFunctions.register]] to add to an already-running session.
  */
object MinietlFunctions {

  private def intArg(e: Expression, what: String): Int = e match {
    case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
    case org.apache.spark.sql.catalyst.expressions.Literal(v: Long, _) => v.toInt
    case other => throw new IllegalArgumentException(s"$what must be an integer literal, got $other")
  }
  private def longArg(e: Expression, what: String): Long = e match {
    case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v.toLong
    case org.apache.spark.sql.catalyst.expressions.Literal(v: Long, _) => v
    case other => throw new IllegalArgumentException(s"$what must be an integer literal, got $other")
  }

  val registry: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "vec_dot" -> { args =>
      require(args.size == 2, "vec_dot(a, b)")
      DotProductDouble(args(0), args(1))
    },
    "jaccard_sorted" -> { args =>
      require(args.size == 2, "jaccard_sorted(a, b)")
      JaccardSortedLong(args(0), args(1))
    },
    "intersect_sorted_count" -> { args =>
      require(args.size == 2, "intersect_sorted_count(a, b)")
      IntersectSortedCount(args(0), args(1))
    },
    "minhash_signature" -> { args =>
      require(args.size == 3, "minhash_signature(hashes, k, seed)")
      MinHashSignature64(args(0), intArg(args(1), "k"), longArg(args(2), "seed"))
    },
    "minhash_estimate" -> { args =>
      require(args.size == 2, "minhash_estimate(sigA, sigB)")
      MinHashEstimate(args(0), args(1))
    },
    "simhash64" -> { args =>
      require(args.size == 1, "simhash64(hashes)")
      SimHash64(args(0))
    },
    "shingle_hashes" -> { args =>
      require(args.size == 2, "shingle_hashes(tokens, n)")
      ShingleHashes64(args(0), intArg(args(1), "n"))
    })

  private def info(name: String): ExpressionInfo =
    new ExpressionInfo("minietl.functions", name)

  /** Register into a live session's function catalog. */
  def register(spark: SparkSession): Unit =
    registry.foreach { case (name, builder) =>
      spark.sessionState.functionRegistry.registerFunction(
        FunctionIdentifier(name), info(name), builder)
    }
}

/** `spark.sql.extensions` entry point. */
class MinietlExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    MinietlFunctions.registry.foreach { case (name, builder) =>
      ext.injectFunction((FunctionIdentifier(name),
        new ExpressionInfo("minietl.functions", name), builder))
    }
}
