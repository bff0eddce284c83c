package graft

import org.apache.spark.sql.types.{ArrayType, MapType, StructType}
import org.scalatest.matchers.should.Matchers

/** Gate-compatibility lint over the WHOLE query surface.
  *
  * The differential driver hashes result rows through a pandas sort, which
  * cannot order list/map/struct cells (`unhashable type: numpy.ndarray`) —
  * so a query emitting a top-level nested column can NEVER pass the gate,
  * regardless of values. Round 3 shipped three such keys (x_hof,
  * x_regex_extract, x_audio_frames) red; this spec turns that defect class
  * into a test failure at build time. Nested data belongs serialized
  * (array_join / to_json) or exploded before the final projection.
  *
  * Construction only resolves each plan's analyzed schema; for the handful
  * of keys whose builders run bounded control-plane jobs (BPE argmax,
  * fixpoint loops) the work happens at sf0.001.
  */
class SchemaLintSpec extends SparkSpec with Matchers {

  test("no query emits a top-level array/map/struct column") {
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (key, mk) =>
        mk(spark, sf0001).schema.fields.collect {
          case f if f.dataType.isInstanceOf[ArrayType] ||
                    f.dataType.isInstanceOf[MapType] ||
                    f.dataType.isInstanceOf[StructType] =>
            s"$key.${f.name}: ${f.dataType.simpleString}"
        }
    }
    withClue("driver gate cannot hash nested columns; serialize them: ") {
      offenders shouldBe empty
    }
  }
}
