package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Registry hygiene: Scala Map literals resolve duplicate keys
  * LAST-WINS with no warning, so a query registered twice silently
  * drops one implementation out of the correctness gate (round 12
  * found two: `w_ewma` across files and `lake_compact_roundtrip`
  * twice in one map). This spec counts the `"name" -> ((s, dir)`
  * entry literals in the query sources and requires the merged map to
  * be exactly that size — any future duplicate fails loudly here
  * instead of shadowing. */
class QueryRegistrySpec extends AnyFunSuite with Matchers {

  private val entryPattern = """"([a-z0-9_]+)" -> \(\(s, dir\)""".r

  /** Drop line comments so a commented-out entry can't inflate the
    * source-side count. The strip is textual (it also truncates oracle
    * SQL lines containing DuckDB's `//` integer division), which is
    * harmless: only the `"name" -> ((s, dir)` entry literal is counted
    * afterwards, and no string content can form one. Block comments are
    * stripped too, non-greedily. */
  private def stripComments(src: String): String =
    src.replaceAll("(?s)/\\*.*?\\*/", "")
      .linesIterator.map { l =>
        val i = l.indexOf("//")
        if (i >= 0) l.substring(0, i) else l
      }.mkString("\n")

  test("every source-level query entry survives into SparkEntry.queries") {
    val dir = new java.io.File("src/main/scala/graft/queries")
    val names = dir.listFiles().filter(_.getName.endsWith(".scala")).toSeq
      .flatMap { f =>
        val src = stripComments(new String(
          java.nio.file.Files.readAllBytes(f.toPath), "UTF-8"))
        entryPattern.findAllMatchIn(src).map(_.group(1)).toSeq
      }
    val dupes = names.groupBy(identity).filter(_._2.size > 1).keys.toSeq
    withClue(s"duplicate query keys (last-wins shadowing): $dupes — ") {
      dupes shouldBe empty
    }
    names.size shouldBe SparkEntry.queries.size
  }

  test("every oracle key has a matching query; no orphaned oracle SQL") {
    val orphans = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    withClue(s"oracle entries without a query: $orphans — ") {
      orphans shouldBe empty
    }
  }
}
