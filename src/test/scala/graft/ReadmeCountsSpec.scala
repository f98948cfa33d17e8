package graft

import org.scalatest.funspec.AnyFunSpec
import graft.tools.ReadmeCounts

/** The README's verification table is GENERATED from the query
  * registry (`graft.tools.ReadmeCounts`); this spec fails the suite
  * whenever the committed README and the registry disagree — add or
  * remove a query without re-running the generator and the build says
  * so. (Round-11 audit: four artifacts quoted four different totals.) */
class ReadmeCountsSpec extends AnyFunSpec {

  describe("README verification counts") {
    it("committed README block equals the registry-derived render") {
      val readme = new String(
        java.nio.file.Files.readAllBytes(java.nio.file.Paths.get("README.md")),
        java.nio.charset.StandardCharsets.UTF_8)
      val begin = readme.indexOf(ReadmeCounts.BeginMarker)
      val end = readme.indexOf(ReadmeCounts.EndMarker)
      assert(begin >= 0 && end > begin, "generation markers missing from README.md")
      val committed = readme.substring(begin, end + ReadmeCounts.EndMarker.length)
      assert(committed == ReadmeCounts.render,
        "README verification section is stale — run `sbt \"runMain graft.tools.ReadmeCounts\"` and commit")
    }

    it("every rows-only query has a design note and every oracle has a query") {
      // render() itself enforces both invariants via require
      assert(ReadmeCounts.render.nonEmpty)
      assert(ReadmeCounts.rowsOnly.toSet ==
        SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet)
    }

    it("no hardcoded full-oracle total survives outside the generated block") {
      val readme = new String(
        java.nio.file.Files.readAllBytes(java.nio.file.Paths.get("README.md")),
        java.nio.charset.StandardCharsets.UTF_8)
      val begin = readme.indexOf(ReadmeCounts.BeginMarker)
      val end = readme.indexOf(ReadmeCounts.EndMarker)
      val outside = readme.substring(0, begin) + readme.substring(end)
      val total = ReadmeCounts.fullOracle.size
      // the exact "N/N" gate phrasing must only appear generated
      assert(!outside.contains(s"$total/$total"),
        s"hardcoded count $total/$total found outside the generated block")
    }
  }
}
