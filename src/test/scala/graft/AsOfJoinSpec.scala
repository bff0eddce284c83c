package graft

import java.sql.Timestamp

import org.scalatest.matchers.should.Matchers

import graft.relational.AsOfJoin

class AsOfJoinSpec extends SparkSpec with Matchers {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("asof picks the latest right row at or before each left row") {
    val left = Seq(
      (1L, 7L, ts("2024-01-01 10:00:00")), // after p1 → matches p1
      (2L, 7L, ts("2024-01-01 12:00:00")), // exactly at p2 → inclusive match
      (3L, 7L, ts("2024-01-01 09:00:00")), // before any purchase → null
      (4L, 8L, ts("2024-01-01 10:00:00"))  // other key, no right rows → null
    ).toDF("event_id", "user_id", "ts_s")
    val right = Seq(
      (7L, ts("2024-01-01 09:30:00"), 10.0), // p1
      (7L, ts("2024-01-01 12:00:00"), 20.0)  // p2
    ).toDF("user_id", "ts_s", "p_value")

    val got = AsOfJoin.asof(left, right, "user_id", "ts_s", "p_value",
        "m_ts", "m_val")
      .select("event_id", "m_val")
      .as[(Long, Option[Double])].collect().toMap
    got shouldBe Map(
      1L -> Some(10.0), 2L -> Some(20.0), 3L -> None, 4L -> None)
  }

  test("asofForward picks the earliest right row at or after each left row") {
    val left = Seq(
      (1L, 7L, ts("2024-01-01 09:00:00")), // before p1 → matches p1
      (2L, 7L, ts("2024-01-01 12:00:00")), // exactly at p2 → inclusive match
      (3L, 7L, ts("2024-01-01 13:00:00")), // after every purchase → null
      (4L, 8L, ts("2024-01-01 10:00:00"))  // other key, no right rows → null
    ).toDF("event_id", "user_id", "ts_s")
    val right = Seq(
      (7L, ts("2024-01-01 09:30:00"), 10.0), // p1
      (7L, ts("2024-01-01 12:00:00"), 20.0)  // p2
    ).toDF("user_id", "ts_s", "p_value")

    val got = AsOfJoin.asofForward(left, right, "user_id", "ts_s", "p_value",
        "m_ts", "m_val")
      .select("event_id", "m_val")
      .as[(Long, Option[Double])].collect().toMap
    got shouldBe Map(
      1L -> Some(10.0), 2L -> Some(20.0), 3L -> None, 4L -> None)
  }
}
