package graft

import org.scalatest.funsuite.AnyFunSuite

/** Registry↔EXPLAINS pin-set sync gate (round-9, after q260 landed
  * unpinned): every registered query must be either pinned in
  * `Explain.pinned` (it gets a plan dump + what-to-look-for note in
  * EXPLAINS.md) or listed in `Explain.excluded` (a conscious
  * decision that its plan shape is covered by a pinned sibling).
  * No Spark session needed — this is a pure set partition check.
  */
class ExplainPinSpec extends AnyFunSuite {

  test("every registered query is consciously pinned or excluded") {
    val pinned = graft.tools.Explain.pinned.map(_._1).toSet
    val excluded = graft.tools.Explain.excluded
    val registry = SparkEntry.queries.keySet
    val overlap = pinned.intersect(excluded)
    assert(overlap.isEmpty, s"pinned AND excluded: ${overlap.mkString(", ")}")
    val unclaimed = registry -- pinned -- excluded
    assert(unclaimed.isEmpty,
      s"registered but neither pinned nor excluded: ${unclaimed.mkString(", ")}")
    val stale = (pinned ++ excluded) -- registry
    assert(stale.isEmpty,
      s"pinned/excluded but not registered: ${stale.mkString(", ")}")
  }

  test("pinned names are unique (no duplicate pin rows)") {
    val names = graft.tools.Explain.pinned.map(_._1)
    val dups = names.groupBy(identity).collect { case (n, g) if g.size > 1 => n }
    assert(dups.isEmpty, s"duplicate pins: ${dups.mkString(", ")}")
  }
}
