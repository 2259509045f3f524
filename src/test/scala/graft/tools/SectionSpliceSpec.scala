package graft.tools

import org.scalatest.funsuite.AnyFunSuite

/** SCALE.md is shared by two generators — ShuffleAudit owns the audit
  * base, ScaleSmoke owns the `## Derived …` measurement sections (main
  * fixture + deep-multiplier subset). These splice rules are what keep a
  * regeneration of any one part from silently destroying the others'
  * committed evidence (the pre-r16 behavior: ShuffleAudit overwrote the
  * whole file, so run order decided whether smoke sections survived).
  */
class SectionSpliceSpec extends AnyFunSuite {

  private val base = "# Measured byte flows\n\n| q | bytes |\n|---|---|\n"
  private val fixture10 =
    "\n## Derived 10x fixture (replicated)\n\nbody-10x\n\n### CC rounds\n\ncc\n"
  private val subset100 =
    "\n## Derived 100x subset smoke (cu20)\n\nbody-100x\n"

  test("a fixture rerun replaces only the fixture section, keeping base " +
    "and subset sections verbatim") {
    val existing = base + fixture10 + subset100
    val fresh = "\n## Derived 10x fixture (replicated)\n\nNEW-10x\n"
    val out = ScaleSmoke.spliceSection(existing, fresh, subsetKind = false)
    assert(out == base + subset100 + fresh)
  }

  test("a subset rerun replaces only the subset section, keeping base " +
    "and fixture sections verbatim (including fixture sub-###s)") {
    val existing = base + fixture10 + subset100
    val fresh = "\n## Derived 100x subset smoke (cu20, dd21)\n\nNEW-100x\n"
    val out = ScaleSmoke.spliceSection(existing, fresh, subsetKind = true)
    assert(out == base + fixture10 + fresh)
  }

  test("first-ever write of each kind simply appends") {
    assert(ScaleSmoke.spliceSection(base, fixture10, subsetKind = false)
      == base + fixture10)
    assert(ScaleSmoke.spliceSection(base + fixture10, subset100,
      subsetKind = true) == base + fixture10 + subset100)
  }

  test("kind is decided by the HEADER LINE only: a fixture section whose " +
    "body merely MENTIONS the subset smoke is not misclassified (ADVICE r16)") {
    // the hazard: ShuffleAudit claim prose already contains the phrase
    // 'x subset smoke', so a body-wide contains() would delete the main
    // fixture section on a subset rerun (or keep two copies on a fixture
    // rerun) — exactly the committed-evidence destruction the splice
    // rule exists to prevent
    val fixtureWithMention =
      "\n## Derived 10x fixture (replicated)\n\nsee the 100x subset smoke " +
        "section below for the deep-multiplier arm\n"
    val existing = base + fixtureWithMention + subset100
    val freshSubset = "\n## Derived 100x subset smoke (dd21)\n\nNEW\n"
    assert(ScaleSmoke.spliceSection(existing, freshSubset, subsetKind = true)
      == base + fixtureWithMention + freshSubset)
    val freshFixture = "\n## Derived 10x fixture (replicated)\n\nNEW-FIX\n"
    assert(ScaleSmoke.spliceSection(existing, freshFixture, subsetKind = false)
      == base + subset100 + freshFixture)
  }

  test("ShuffleAudit's regeneration preserves every Derived section " +
    "verbatim and drops only its own base") {
    val existing = base + fixture10 + subset100
    assert(ShuffleAudit.preservedDerived(existing) == fixture10 + subset100)
    assert(ShuffleAudit.preservedDerived(base) == "")
    assert(ShuffleAudit.preservedDerived("") == "")
    // composition: a fresh audit base + preserved sections is exactly
    // what a post-audit SCALE.md should hold
    val newBase = "# Measured byte flows (regenerated)\n"
    assert(newBase + ShuffleAudit.preservedDerived(existing)
      == newBase + fixture10 + subset100)
  }
}
