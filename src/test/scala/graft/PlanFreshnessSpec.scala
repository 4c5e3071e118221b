package graft

/** Pins PLANS.md to the live plans: for every headline query the
  * operator-name skeleton of the committed PLANS.md section must
  * equal the skeleton of the freshly-built plan. PlanSpec pins plan
  * *properties* (pushdown, no-window, join strategies); this spec
  * pins the *document*, so a plan-affecting change that skips
  * `sbt "runMain graft.PlanDump PLANS.md"` fails the suite instead
  * of leaving stale plans for the next reader (the round-4 failure
  * mode, and again in round 5 when q36's reordered Sort landed
  * without a regen). */
class PlanFreshnessSpec extends SparkSuite {

  private lazy val sections: Map[String, String] = {
    val text = new String(
      java.nio.file.Files.readAllBytes(java.nio.file.Paths.get("PLANS.md")), "UTF-8")
    // "## name\n\n```\n<plan>\n```" blocks.
    raw"(?s)## (\S+)\n\n```\n(.*?)```".r
      .findAllMatchIn(text)
      .map(m => m.group(1) -> m.group(2))
      .toMap
  }

  test("PLANS.md section list matches the headline query list") {
    assert(sections.keySet === PlanDump.headlineNames.toSet,
      "PLANS.md sections drifted from PlanDump.headlineNames — re-run PlanDump")
  }

  for (name <- PlanDump.headlineNames) {
    test(s"PLANS.md is fresh for $name") {
      val doc = sections.getOrElse(name, fail(s"PLANS.md has no section for $name"))
      val live = SparkEntry.queries(name)(spark, sfDir)
        .queryExecution.explainString(
          org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
      assert(PlanDump.skeleton(doc) === PlanDump.skeleton(live),
        s"plan skeleton for $name changed — re-run `sbt \"runMain graft.PlanDump PLANS.md\"`")
    }
  }
}
