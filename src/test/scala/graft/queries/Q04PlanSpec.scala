package graft.queries

import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Join, LogicalPlan}
import org.scalatest.funsuite.AnyFunSuite
import graft.{GraftSession, SparkEntry}

/** Pins q04's load-bearing plan shape: the per-custkey partial aggregate
  * must sit BETWEEN the lineitem⋈orders join and the customer join.
  * Catalyst neither introduces nor removes aggregates across joins, so
  * this shape is authored in the query — but a future edit (or an
  * optimizer change that starts collapsing adjacent aggregates) that
  * pushed the aggregate above the customer join would re-send every
  * lineitem row through the custkey exchange: at the fifth decade that is
  * a 600 M-row shuffle tier (~47 s measured) reappearing with no
  * correctness signal, visible only as a bench regression. Cheap to pin
  * structurally, so pin it here.
  */
class Q04PlanSpec extends AnyFunSuite {

  test("q04 partial-aggregates by custkey below the customer join") {
    val spark = GraftSession.get("q04-plan-spec")
    val plan: LogicalPlan =
      SparkEntry.queries("q04_revenue_by_nation")(spark, "/root/testdata/sf0.001")
        .queryExecution.optimizedPlan

    // the per-custkey partial aggregate: groups on o_custkey and still
    // has the lineitem⋈orders join (an l_ column) in its subtree
    val perCust = plan.collect {
      case a: Aggregate
        if a.groupingExpressions.exists(_.references.exists(_.name == "o_custkey")) &&
          a.collect { case j: Join => j }.nonEmpty => a
    }
    assert(perCust.nonEmpty,
      s"q04 lost its per-custkey partial aggregate:\n${plan.treeString.take(3000)}")

    // ...and the customer relation must NOT appear below it: the
    // aggregate runs before the customer join, so the custkey exchange
    // carries one partial row per customer, not one row per lineitem.
    // Relations are identified at the SCAN LEAVES, where column names are
    // the parquet schema (an alias in the query adds a Project above the
    // scan, it cannot rename the leaf's output) — and the below-aggregate
    // check then goes by exprId, so a rename introduced between the scan
    // and the aggregate cannot make this pass vacuously.
    def leavesWith(p: LogicalPlan, col: String): Seq[LogicalPlan] =
      p.collectLeaves().filter(_.output.exists(_.name == col))
    val custIds = leavesWith(plan, "c_custkey").flatMap(_.output).map(_.exprId).toSet
    assert(custIds.nonEmpty, "no customer scan found in q04's plan at all")
    val custBelow = perCust.head.collect {
      case p: LogicalPlan if p.output.exists(a => custIds(a.exprId)) => p
    }
    assert(custBelow.isEmpty,
      "customer relation found BELOW the partial aggregate - the " +
        "aggregate no longer runs between the two big joins:\n" +
        perCust.head.treeString.take(3000))

    // the aggregate's subtree must scan exactly lineitem and orders:
    // the partial aggregate compresses the lineitem⋈orders result, and
    // any third relation sneaking under it would change what the custkey
    // exchange carries
    val aggLeaves = perCust.head.collectLeaves()
    assert(aggLeaves.size == 2 &&
      leavesWith(perCust.head, "l_orderkey").size == 1 &&
      leavesWith(perCust.head, "o_custkey").size == 1,
      s"partial aggregate's subtree should scan exactly lineitem+orders, " +
        s"found ${aggLeaves.size} leaves:\n${perCust.head.treeString.take(3000)}")
  }
}
