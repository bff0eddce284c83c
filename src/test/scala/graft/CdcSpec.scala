package graft

import java.sql.Timestamp

import org.scalatest.matchers.should.Matchers

import graft.cdc.ChangeDetection

/** Tri-state CDC semantics (reference verifica_carga_slmandicprd.py:87-100):
  * literal fixtures pin each branch exactly. */
class CdcSpec extends SparkSpec with Matchers {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  private def catalog = Seq(
    ("never_ingested", ts("2024-01-10 00:00:00")),
    ("null_update", null.asInstanceOf[Timestamp]), // no history → rule 1 includes it
    ("null_stale", null.asInstanceOf[Timestamp]),  // has history → rule 2 skips it
    ("stale", ts("2024-01-05 00:00:00")),          // not newer than history
    ("changed", ts("2024-01-20 00:00:00")),        // strictly newer
    ("equal_time", ts("2024-01-05 00:00:00"))      // equal, NOT strictly newer
  ).toDF("table_name", "update_time")

  private def history = Seq(
    ("stale", ts("2024-01-06 00:00:00")),
    ("stale", ts("2024-01-07 00:00:00")),
    ("null_stale", ts("2024-01-07 00:00:00")),
    ("changed", ts("2024-01-15 00:00:00")),
    ("equal_time", ts("2024-01-05 00:00:00"))
  ).toDF("table_name", "execution_time")

  test("changedTables keeps exactly the never-ingested and strictly-newer tables") {
    val got = ChangeDetection.changedTables(catalog, history)
      .select("table_name").as[String].collect().toSeq
    got shouldBe Seq("changed", "never_ingested", "null_update")
  }

  test("never-ingested wins over null update_time (reference rule order)") {
    // the reference checks the no-history branch FIRST
    // (verifica_carga_slmandicprd.py:95-96), so a never-ingested table with
    // NULL update_time is still included
    val cat = Seq(("only_null", null.asInstanceOf[Timestamp]))
      .toDF("table_name", "update_time")
    val hist = Seq.empty[(String, Timestamp)].toDF("table_name", "execution_time")
    ChangeDetection.changedTables(cat, hist).count() shouldBe 1L
  }

  test("latestRuns picks MAX execution_time per table") {
    val got = ChangeDetection.latestRuns(history)
      .as[(String, Timestamp)].collect().toMap
    got("stale") shouldBe ts("2024-01-07 00:00:00")
  }

  test("neverIngested is the anti-join of catalog vs history") {
    val got = ChangeDetection.neverIngested(catalog, history)
      .select("table_name").as[String].collect().toSeq
    got shouldBe Seq("never_ingested", "null_update")
  }

  test("changed set is always a subset of the catalog and shrinks as history grows") {
    val all = ChangeDetection.changedTables(catalog, history)
      .select("table_name").as[String].collect().toSet
    val catNames = catalog.select("table_name").as[String].collect().toSet
    all.subsetOf(catNames) shouldBe true
    // ingesting "changed" now removes it from the next round
    val newHistory = history.union(
      Seq(("changed", ts("2024-01-20 00:00:00"))).toDF("table_name", "execution_time"))
    val next = ChangeDetection.changedTables(catalog, newHistory)
      .select("table_name").as[String].collect().toSet
    next shouldBe Set("never_ingested", "null_update")
  }
}
