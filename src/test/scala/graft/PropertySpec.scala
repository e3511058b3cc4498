package graft

import graft.ops.Names
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalacheck.Prop.forAll
import org.scalatest.funsuite.AnyFunSuite

/** ScalaCheck properties for the pure (driver-side) functions. Spark-side
  * properties (LWW convergence under arbitrary batch splits, merge
  * idempotence) live in CdcSpec to keep job counts bounded. */
class PropertySpec extends AnyFunSuite {

  private def check(p: Prop): Unit = {
    val r = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(200), p)
    assert(r.passed, r.status.toString)
  }

  private val nameGen: Gen[String] =
    Gen.listOf(Gen.oneOf(Gen.alphaNumChar, Gen.oneOf(" -./%+()'".toSeq)))
      .map(_.mkString).suchThat(_.nonEmpty)

  test("underscore is idempotent and always yields a valid identifier or empty") {
    check(forAll(nameGen) { s =>
      val u = Names.underscore(s)
      Names.underscore(u) == u && (u.isEmpty || Names.isValid(u))
    })
  }

  test("escape/extract round-trip: extractText(escape(s) in a tag) == collapse(s)") {
    val textGen = Gen.listOf(Gen.oneOf(
        Gen.alphaNumChar, Gen.oneOf(" &<>\"'".toSeq)))
      .map(_.mkString)
    check(forAll(textGen) { s =>
      val collapsed = s.replaceAll("[ \\t\\n\\r\\f]+", " ").trim
      val html = "<html><body><p>" + graft.cdc.EventGen.escape(s) + "</p></body></html>"
      graft.functions.TextExtract.extractText(html) == collapsed
    })
  }

  test("md5Hex is stable and 32 hex chars") {
    check(forAll { (s: String) =>
      val h = graft.ops.Checksums.md5Hex(s)
      h.length == 32 && h == graft.ops.Checksums.md5Hex(s)
    })
  }

  test("event generator is a pure function of (lsn, seed)") {
    val cfg = graft.cdc.EventGen.Config(nEvents = 1000)
    check(forAll(Gen.choose(0L, 100000L)) { lsn =>
      val a = graft.cdc.EventGen.genEvent(lsn, cfg)
      val b = graft.cdc.EventGen.genEvent(lsn, cfg)
      a.url == b.url && a.text == b.text && a.op == b.op &&
        java.util.Arrays.equals(a.html, b.html)
    })
  }
}
