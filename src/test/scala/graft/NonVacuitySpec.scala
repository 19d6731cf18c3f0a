package graft

/** Registry-wide non-vacuity gate (r13 verdict directive 4): every
  * registered query must return at least one row at EVERY test scale
  * factor. A green hash-match on an empty frame proves only that two
  * empty sets are equal — q7_volume shipped that way for 13 rounds
  * (it filtered nation names 'FRANCE'/'GERMANY' that the synthetic
  * NATION_0..24 table never contains, so 0 = 0 passed at every SF),
  * and word-level hapax and langid_mix were each caught case-by-case
  * before it. This spec turns the case-by-case discipline into a
  * standing class-level gate: the q7 class cannot recur silently.
  *
  * The allowlist for legitimately-empty results is EMPTY and must stay
  * that way unless an operator's CONTRACT is emptiness on clean input
  * (an audit that reports violations, say, where the testdata holds
  * none). Any such entry must carry a justification string — and
  * before reaching for one, prefer redefining the operator so its
  * output is non-vacuous (report the checked population WITH its
  * violation count, rather than violations only), which is what
  * q7/hapax/langid_mix all got.
  *
  * Cost control: emptiness is probed with LIMIT 1 (`isEmpty`), not a
  * full collect, and the three SFs run as three suite cases so a
  * failure names the SF. sf0.001 is where emptiness is most likely
  * (smallest data) but NOT sufficient — q7 was empty at every SF, and
  * a filter could pass at one SF and die at another (a date-window
  * predicate against a SF-dependent time span, say), so all three run.
  */
class NonVacuitySpec extends SparkSpec {

  /** name -> justification. Empty by design; see the class doc. */
  private val legitimatelyEmpty: Map[String, String] = Map.empty

  private def offenders(dir: String): Seq[String] =
    SparkEntry.queries.toSeq.sortBy(_._1)
      .filterNot { case (name, _) => legitimatelyEmpty.contains(name) }
      .flatMap { case (name, q) =>
        val empty =
          try q(spark, dir).isEmpty
          catch { case e: Exception =>
            fail(s"$name failed to build/run at $dir: $e")
          }
        if (empty) Some(name) else None
      }

  test("allowlist entries name real registry keys") {
    val stale = legitimatelyEmpty.keys.filterNot(SparkEntry.queries.contains)
    assert(stale.isEmpty, s"allowlist names unknown queries: $stale")
  }

  for (sf <- Seq("sf0.001", "sf0.01", "sf0.1")) {
    test(s"every registered query returns >= 1 row at $sf") {
      val bad = offenders(s"/root/testdata/$sf")
      assert(bad.isEmpty,
        s"vacuous at $sf (empty result, so any oracle match proves " +
          s"nothing): ${bad.mkString(", ")}")
    }
  }
}
