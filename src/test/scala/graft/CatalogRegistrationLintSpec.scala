package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Suite-level lint (the r14 verdict's ask): a test catalog registered
  * inside a `lazy val` is invisible to Spark until something forces the
  * val — the first `spark.sql("... <cat>.db ...")` then resolves the name
  * under `spark_catalog` and throws REQUIRES_SINGLE_PART_NAMESPACE. This
  * bit SqlConcurrencyProperties/ChangeFeedProperties in r14: the suites
  * deterministically errored on every property from a clean JVM.
  *
  * Rule enforced statically over every test source: if a file registers
  * `spark.sql.catalog.$<var>` inside a `lazy val <reg>` block, then the
  * first textual use of `$<var>.` AFTER that block must be preceded by a
  * forcing reference to `<reg>`. Textual order tracks runtime order in
  * this tree (suites run tests in declaration order; helper defs force
  * the val before issuing catalog SQL), so the lint is sound for the bug
  * class it targets without needing full dataflow analysis. */
class CatalogRegistrationLintSpec extends AnyFunSuite with Matchers {

  test("lazy-val catalog registrations are forced before first catalog SQL") {
    val dir = new java.io.File("src/test/scala/graft")
    val regPattern =
      """lazy\s+val\s+(\w+)[\s\S]{0,400}?spark\.sql\.catalog\.\$(\w+)""".r
    val offenders = dir.listFiles.toSeq
      .filter(_.getName.endsWith(".scala"))
      .filterNot(_.getName == "CatalogRegistrationLintSpec.scala")
      .flatMap { f =>
        val src = new String(
          java.nio.file.Files.readAllBytes(f.toPath), "UTF-8")
        regPattern.findFirstMatchIn(src).toSeq.flatMap { m =>
          val regName = m.group(1) // the lazy val holding the registration
          val catVar = m.group(2)  // the interpolated catalog-name val
          // End of the registration block: the first closing brace at the
          // lazy val's indent after the match.
          val blockEnd = src.indexOf("\n  }", m.end) match {
            case -1 => m.end
            case i  => i + 4
          }
          val firstUse = src.indexOf(s"$$$catVar.", blockEnd)
          val firstForce =
            s"""(?<![\\w.])$regName\\b""".r
              .findAllMatchIn(src.substring(blockEnd))
              .map(_.start + blockEnd)
              .toSeq.headOption.getOrElse(Int.MaxValue)
          if (firstUse >= 0 && firstForce > firstUse)
            Some(s"${f.getName}: catalog `$$$catVar` used at offset " +
              s"$firstUse before `$regName` is forced " +
              s"(first force at ${if (firstForce == Int.MaxValue) "never"
              else firstForce.toString})")
          else None
        }
      }
    withClue(offenders.mkString("\n")) { offenders shouldBe empty }
  }
}
