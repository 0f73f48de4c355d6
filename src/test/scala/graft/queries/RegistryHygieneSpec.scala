package graft.queries

import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.should.Matchers

/** Registry integrity: a gate name defined twice is SILENT data loss —
  * Scala Map literals keep the last duplicate key, so a second
  * `"q_x" -> ...` entry quietly replaces the first and the registry count
  * stays plausible (exactly what happened in round 8: a new
  * q_js_divergence shadowed the round-7 one inside the same Map literal,
  * detectable only by diffing counts against CORRECTNESS_r07).
  *
  * The Map itself cannot reveal intra-literal duplicates after
  * construction, so this spec checks the SOURCE: every registry key
  * literal (`"q_*" ->` / `"ifs_*" ->` at entry position) must appear
  * exactly twice per module file — once in `queries`, once in `oracles` —
  * and exactly once per map. Cross-module collisions are caught by
  * comparing the union size against the per-module sum.
  */
class RegistryHygieneSpec extends AnyFlatSpec with Matchers {

  private val moduleDir = new java.io.File("src/main/scala/graft/queries")

  behavior of "query registry"

  it should "declare every gate key exactly once per map (no silent " +
    "duplicate-key shadowing)" in {
    val keyRe = """^\s*"((?:q|ifs)_\w+)" ->""".r
    val files = moduleDir.listFiles().filter(_.getName.endsWith(".scala"))
    files should not be empty
    files.foreach { f =>
      val lines = scala.io.Source.fromFile(f, "UTF-8").getLines().toSeq
      val keys = lines.flatMap(l => keyRe.findFirstMatchIn(l).map(_.group(1)))
      val counts = keys.groupBy(identity).view.mapValues(_.size).toMap
      counts.foreach { case (k, n) =>
        withClue(s"${f.getName}: key $k appears $n times " +
          "(expected 2: one gate + one oracle, or 1: rows-only gate): ") {
          n should be <= 2
        }
      }
    }
  }

  it should "have no cross-module key collisions" in {
    val modules = Seq(
      Relational.queries, IfsQueries.queries, EventQueries.queries,
      TextQueries.queries, EmbeddingQueries.queries, GraphQueries.queries,
      SourceQueries.queries, TemporalQueries.queries, UserQueries.queries,
      StatQueries.queries)
    val union = modules.map(_.keySet).reduce(_ ++ _)
    withClue("module key sets overlap (Map ++ silently last-wins): ") {
      union.size shouldBe modules.map(_.size).sum
    }
    // every gate with an oracle is a registered gate
    val orphans = graft.SparkEntry.oracleSql.keySet --
      graft.SparkEntry.queries.keySet
    withClue(s"oracles without gates: $orphans: ") { orphans shouldBe empty }
  }

  it should "never alias a wide-typed cast as an oracle output column" in {
    // The r8 q_table_fingerprint lesson: an output column whose VALUE
    // rides a HUGEINT/DECIMAL(38,·) cast has cross-build
    // canonicalization surface in the driver's typed hash. Wide types
    // are fine as intermediates (always re-cast to BIGINT/DOUBLE before
    // aliasing); this tripwire catches the cast-then-alias shape
    // textually, and tools/check_oracle.py enforces the authoritative
    // DESCRIBE-level allowlist (BIGINT/DOUBLE/VARCHAR/BOOLEAN/
    // TIMESTAMP/DATE/INTEGER) on every oracle's actual result relation.
    // Scoped to the FINAL select clause — wide casts aliased inside CTEs
    // are sanctioned intermediates (consumers re-cast before output).
    // `AS DOUBLE`/`AS BIGINT` after the close-paren is an ENCLOSING cast
    // narrowing the wide value — the sanctioned spelling, not an alias.
    val wideAliased =
      ("""(?is)AS\s+(?:DECIMAL\s*\(\s*3[0-9][^)]*\)|HUGEINT)\s*\)\s*""" +
        """AS\s+(?!DOUBLE\b|BIGINT\b)\w+""").r
    graft.SparkEntry.oracleSql.foreach { case (name, sql) =>
      val finalSelect = sql.lastIndexOf("SELECT") match {
        case -1 => sql
        case i  => sql.substring(i)
      }
      withClue(s"$name: wide-typed cast aliased directly as an output " +
        "column (re-cast to BIGINT/DOUBLE first): ") {
        wideAliased.findFirstIn(finalSelect) shouldBe None
      }
    }
  }
}
