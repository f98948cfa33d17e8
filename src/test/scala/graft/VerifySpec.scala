package graft

import org.scalatest.funspec.AnyFunSpec
import org.apache.spark.sql.types.{ArrayType, MapType, StructType}

/** Gate-shape rehearsal. The driver's correctness harness sorts result
  * rows with pandas, which cannot hash numpy arrays — a registered
  * query with a nested output column crashes the compare and silently
  * counts as unverified (rounds 6-8 shipped five such queries before
  * this was caught). Pin the contract here: every registered output
  * column is a scalar, and every query has its oracle (or is one of
  * the documented rows-only sketch demos).
  */
class VerifySpec extends AnyFunSpec {
  import SharedSpark.spark
  private val dir = "/root/testdata/sf0.001"

  private def nestedCols(schema: StructType): Seq[String] =
    schema.fields.collect {
      case f if f.dataType.isInstanceOf[ArrayType] ||
        f.dataType.isInstanceOf[StructType] ||
        f.dataType.isInstanceOf[MapType] => f.name
    }.toSeq

  describe("registered query surface") {
    it("emits only scalar (gate-sortable) output columns, and no plan goes Cartesian") {
      val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
        case (name, fn) =>
          val df = fn(spark, dir)
          val bad = nestedCols(df.schema).map(c => s"$name: nested column $c")
          // an unconstrained Cartesian product in any registered plan is
          // a scale bug, full stop (broadcast one-row model attaches
          // plan as BroadcastNestedLoopJoin, not CartesianProduct)
          val cart = df.queryExecution.sparkPlan.collectWithSubqueries {
            case c: org.apache.spark.sql.execution.joins.CartesianProductExec => c
          }.map(_ => s"$name: CartesianProduct in plan")
          bad ++ cart
      }
      assert(offenders.isEmpty, s"gate-surface violations:\n${offenders.mkString("\n")}")
    }

    it("pairs every query with an oracle (rows-only sketches excepted)") {
      val rowsOnly = Set("q_approx_distinct", "q_cms_frequency", "q_quantile_sketch")
      val missing = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet -- rowsOnly
      assert(missing.isEmpty, s"queries without an oracle: $missing")
      val orphans = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
      assert(orphans.isEmpty, s"oracles without a query: $orphans")
    }
  }
}
