package graft

import org.scalatest.funsuite.AnyFunSuite

/** Machine-checked scale invariants over [[PlanAudit.plans]] — the same
  * representative plans the audit main prints. Round 4 verified "every
  * heavy window partitions by (key, slice)" and "no SinglePartition
  * exchange" by reading stdout; this spec turns those claims into
  * assertions so a regression (a lost partitioning key turning a window
  * global, a bucketing default degenerating to a cross join) fails CI.
  */
class PlanAuditSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"

  private lazy val audited = PlanAudit.plans(spark, dir)
    .map(a => (a, a.df.queryExecution.executedPlan.toString))

  test("plans flagged noSinglePartition have no Exchange SinglePartition") {
    val flagged = audited.filter(_._1.noSinglePartition)
    assert(flagged.nonEmpty)
    for ((a, plan) <- flagged)
      assert(!plan.contains("Exchange SinglePartition"),
        s"${a.name}:\n$plan")
  }

  test("sliced plans window over a (key, __graft_slice) partitioning") {
    val flagged = audited.filter(_._1.keySlicedWindows)
    assert(flagged.nonEmpty)
    val slicedExchange = """hashpartitioning\([^)]*__graft_slice""".r
    val slicedWindow = """windowspecdefinition\([^)]*__graft_slice""".r
    for ((a, plan) <- flagged) {
      assert(slicedExchange.findFirstIn(plan).isDefined,
        s"${a.name}: no (key, slice) exchange\n$plan")
      assert(slicedWindow.findFirstIn(plan).isDefined,
        s"${a.name}: no window over (key, slice)\n$plan")
    }
  }

  test("rank-limit plans push a partial WindowGroupLimit below the key shuffle") {
    val flagged = audited.filter(_._1.windowGroupLimit)
    assert(flagged.nonEmpty)
    for ((a, plan) <- flagged)
      assert(plan.contains("WindowGroupLimit"), s"${a.name}:\n$plan")
  }

  test("top-k plans use TakeOrderedAndProject, never a whole-input sort") {
    val flagged = audited.filter(_._1.takeOrdered)
    assert(flagged.nonEmpty)
    for ((a, plan) <- flagged)
      assert(plan.contains("TakeOrderedAndProject"), s"${a.name}:\n$plan")
  }

  test("plans flagged noShuffle contain no Exchange at all") {
    val flagged = audited.filter(_._1.noShuffle)
    assert(flagged.nonEmpty)
    for ((a, plan) <- flagged)
      assert(!plan.contains("Exchange"), s"${a.name}:\n$plan")
  }

  test("broadcast-probe plans join via BroadcastHashJoin, never SortMergeJoin") {
    val flagged = audited.filter(_._1.broadcastProbe)
    assert(flagged.nonEmpty)
    for ((a, plan) <- flagged) {
      assert(plan.contains("BroadcastHashJoin"), s"${a.name}:\n$plan")
      assert(!plan.contains("SortMergeJoin"), s"${a.name}:\n$plan")
    }
  }

  test("broadcast-scan plans stream the corpus against a broadcast side (ADC shape)") {
    val flagged = audited.filter(_._1.broadcastScan)
    assert(flagged.nonEmpty)
    for ((a, plan) <- flagged) {
      assert(plan.contains("BroadcastNestedLoopJoin"), s"${a.name}:\n$plan")
      assert(!plan.contains("SortMergeJoin"), s"${a.name}:\n$plan")
      assert(!plan.contains("CartesianProduct"), s"${a.name}:\n$plan")
    }
  }

  test("bucketed candidate generators plan equijoins, not cartesian/nested-loop") {
    val flagged = audited.filter(_._1.equiJoinOnly)
    assert(flagged.nonEmpty)
    for ((a, plan) <- flagged) {
      assert(!plan.contains("CartesianProduct"), s"${a.name}:\n$plan")
      assert(!plan.contains("NestedLoop"), s"${a.name}:\n$plan")
    }
  }
}
