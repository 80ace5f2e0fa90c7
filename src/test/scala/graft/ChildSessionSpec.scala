package graft

import org.scalatest.funsuite.AnyFunSuite

/** Contract of [[GraftSession.child]] — the consolidated posture-child
  * helper that replaced three independent implementations (CC star loop,
  * streaming latency session, vector dense session). The properties below
  * are exactly the ways the three copies had started to drift.
  */
class ChildSessionSpec extends AnyFunSuite {

  test("memoized per (parent, tag); distinct tags give distinct sessions") {
    val parent = GraftSession.get("child-spec")
    val a1 = GraftSession.child(parent, "spec-a")
    val a2 = GraftSession.child(parent, "spec-a")
    val b = GraftSession.child(parent, "spec-b")
    assert(a1 eq a2, "same (parent, tag) must return the same session")
    assert(!(a1 eq b), "distinct tags must not share a session (conf races)")
    assert(!(a1 eq parent) && (a1.sparkContext eq parent.sparkContext),
      "child is a separate session on the shared SparkContext")
  }

  test("no grandchild: a session carrying the tag is returned as-is") {
    val parent = GraftSession.get("child-spec")
    val c = GraftSession.child(parent, "spec-self")
    assert(GraftSession.child(c, "spec-self") eq c,
      "re-entering from the child itself must not chain a grandchild")
  }

  test("per-call conf re-application: stale sizing never leaks into reuse") {
    val parent = GraftSession.get("child-spec")
    val c1 = GraftSession.child(parent, "spec-size",
      aqe = false, shufflePartitions = Some(2))
    assert(c1.conf.get("spark.sql.shuffle.partitions") == "2")
    assert(c1.conf.get("spark.sql.adaptive.enabled") == "false")
    // the round-7 backfill bug: a later large use must get ITS sizing, not
    // the tiny micro-batch posture the previous caller left behind
    val c2 = GraftSession.child(parent, "spec-size",
      aqe = true, shufflePartitions = Some(32))
    assert(c2 eq c1)
    assert(c2.conf.get("spark.sql.shuffle.partitions") == "32")
    assert(c2.conf.get("spark.sql.adaptive.enabled") == "true")
  }

  test("parent conf is untouched; listing threshold lands on the child") {
    val parent = GraftSession.get("child-spec")
    val before = (parent.conf.get("spark.sql.adaptive.enabled"),
      parent.conf.get("spark.sql.shuffle.partitions"))
    val c = GraftSession.child(parent, "spec-conf",
      aqe = false, shufflePartitions = Some(3), listingThreshold = Some(4096))
    assert(c.conf.get(
      "spark.sql.sources.parallelPartitionDiscovery.threshold") == "4096")
    assert((parent.conf.get("spark.sql.adaptive.enabled"),
      parent.conf.get("spark.sql.shuffle.partitions")) == before,
      "tuning a child must never mutate the parent's conf")
  }
}
