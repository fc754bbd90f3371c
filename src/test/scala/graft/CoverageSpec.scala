package graft

import org.scalatest.funsuite.AnyFunSuite

/** COVERAGE.md must provably span the registry: every registered query
  * id appears in some COVERAGE.md `oracle:` tag (single ids, comma/plus
  * lists, and `q03-q10` style ranges all count). This is the check that
  * keeps the coverage index honest as the registry grows — a query
  * added without documentation fails the build, so "COVERAGE.md spans
  * the registry" is an invariant, not a claim.
  */
class CoverageSpec extends AnyFunSuite {

  private val IdTok = "([a-z])(\\d+)([a-z]?)".r
  private val RangeTok = "([a-z])(\\d+)-([a-z])?(\\d+)".r

  /** All query ids tagged in COVERAGE.md, ranges expanded. */
  private def taggedIds: Set[String] = {
    val md = scala.io.Source.fromFile("COVERAGE.md", "UTF-8").mkString
    "oracles?:([A-Za-z0-9,+/;.-]+)".r.findAllMatchIn(md)
      .flatMap(_.group(1).split("[,+/;.]").toSeq)
      .flatMap {
        case RangeTok(p, lo, p2, hi) if p2 == null || p2 == p =>
          val w = lo.length
          (lo.toInt to hi.toInt).map(i => f"$p%s${i.formatted(s"%0${w}d")}%s")
        case IdTok(p, n, suf) => Seq(s"$p$n$suf")
        case _ => Nil // header's literal "qNN" etc.
      }.toSet
  }

  private def registryIds: Set[String] =
    SparkEntry.queries.keySet.map(_.takeWhile(_ != '_'))

  test("every registered query id is documented in COVERAGE.md") {
    val missing = registryIds -- taggedIds
    assert(missing.isEmpty,
      s"registered query ids with no COVERAGE.md oracle tag: " +
        missing.toSeq.sorted.mkString(", "))
  }

  test("no stale oracle tags: every COVERAGE.md oracle id has a registered query") {
    // ids covered by a base id's row (e.g. q30b documented inside
    // q30's row) are fine; only flag tags with no registry id at all
    val stale = taggedIds.filterNot { t =>
      registryIds.contains(t) || registryIds.exists(_.startsWith(t))
    }
    assert(stale.isEmpty,
      s"COVERAGE.md oracle tags with no registered query: " +
        stale.toSeq.sorted.mkString(", "))
  }
}
