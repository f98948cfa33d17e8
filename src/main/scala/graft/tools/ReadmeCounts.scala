package graft.tools

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

/** Single source of truth for the README's verification counts.
  *
  * The verification-status table and the enumerated full-oracle query
  * list are DERIVED from `SparkEntry.queries` / `SparkEntry.oracleSql`
  * and written between HTML markers in README.md by this main;
  * `ReadmeCountsSpec` re-renders the block and fails the suite when the
  * committed README disagrees with the registry — so the counts can
  * rot in exactly zero places. (Round-11 audit found four artifacts
  * quoting four different totals; this is the fix.)
  *
  * Usage: `sbt "runMain graft.tools.ReadmeCounts"` after registering or
  * removing a query, then commit the README diff.
  */
object ReadmeCounts {
  val BeginMarker = "<!-- GENERATED:verification-counts (sbt \"runMain graft.tools.ReadmeCounts\") -->"
  val EndMarker = "<!-- /GENERATED:verification-counts -->"

  /** Every rows-only (no-oracle) query must carry a why — a new
    * no-oracle registration without a note fails the spec loudly. */
  val rowsOnlyNotes: Map[String, String] = Map(
    "q_approx_distinct" -> ("HLL estimates — ±1.6% rsd contract in SketchesSpec; the same " +
      "code path gets a FULL oracle via `q_hll_exact` sparse-mode exactness"),
    "q_cms_frequency" -> ("CMS point estimates — eps·N over-count bound in SketchesSpec; " +
      "the registered query itself joins estimates to exact counts in one plan, and the " +
      "same sketch→merge→read path gets a FULL oracle via `q_cms_exact` collision-free exactness"),
    "q_quantile_sketch" -> ("KLL at corpus scale — rank-error contract in SketchesSpec; " +
      "the same code path gets a FULL oracle via `q_kll_quantiles` under-capacity exactness"))

  def fullOracle: Seq[String] = graft.SparkEntry.oracleSql.keys.toSeq.sorted
  def rowsOnly: Seq[String] =
    (graft.SparkEntry.queries.keySet -- graft.SparkEntry.oracleSql.keySet).toSeq.sorted

  def render: String = {
    val orphanSql = graft.SparkEntry.oracleSql.keySet -- graft.SparkEntry.queries.keySet
    require(orphanSql.isEmpty, s"oracleSql entries without a query: $orphanSql")
    val unnoted = rowsOnly.filterNot(rowsOnlyNotes.contains)
    require(unnoted.isEmpty,
      s"rows-only queries missing a design note in ReadmeCounts.rowsOnlyNotes: $unnoted")
    val rowsOnlyCell = rowsOnly
      .map(q => s"`$q` (${rowsOnlyNotes(q)})").mkString(", ")
    val listed = fullOracle.map(q => s"`$q`").grouped(6).map(_.mkString(", ")).mkString(",\n")
    s"""$BeginMarker
       |
       || Level | Count | Queries |
       ||---|---|---|
       || Full oracle | ${fullOracle.size} | every `q_*` below |
       || Rows-only (by design) | ${rowsOnly.size} | $rowsOnlyCell |
       || Suite-verified (no query output) | — | parquet/CSV sinks (`Sinks`), CREATE TABLE DDL, Kafka wire codecs + MemoryStream e2e (`KafkaSpec`; a real-broker round trip runs when `KAFKA_BOOTSTRAP` is set — no broker/connector jar exists in this sandbox), source freshness gates (`FreshnessSpec`) |
       |
       |Full-oracle queries (${fullOracle.size}):
       |
       |$listed
       |
       |$EndMarker""".stripMargin
  }

  /** Rewrite the generated block iff it is stale; returns true when the
    * file changed. Called by `Verify.main` so the round-end snapshot
    * path self-heals (round-12 drift: eight queries registered in the
    * final snapshot commit without a manual regen). */
  def heal(path: java.nio.file.Path): Boolean = {
    val readme = new String(Files.readAllBytes(path), StandardCharsets.UTF_8)
    val begin = readme.indexOf(BeginMarker)
    val end = readme.indexOf(EndMarker)
    require(begin >= 0 && end > begin, s"markers not found in $path")
    val committed = readme.substring(begin, end + EndMarker.length)
    val fresh = render
    if (committed == fresh) false
    else {
      val patched = readme.substring(0, begin) + fresh +
        readme.substring(end + EndMarker.length)
      Files.write(path, patched.getBytes(StandardCharsets.UTF_8))
      true
    }
  }

  def main(args: Array[String]): Unit = {
    val path = Paths.get(args.headOption.getOrElse("README.md"))
    heal(path)
    println(s"README verification section regenerated: " +
      s"${fullOracle.size} full-oracle + ${rowsOnly.size} rows-only queries")
  }
}
