package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import graft.ops.Joins

class JoinsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  // quotes: (key, time, rate, id) — two keys, interleaved history
  private lazy val quotes = Seq(
    (1L, ts("2024-01-01 10:00:00"), 100.0, 1L),
    (1L, ts("2024-01-01 12:00:00"), 110.0, 2L),
    (1L, ts("2024-01-01 14:00:00"), 120.0, 3L),
    (2L, ts("2024-01-01 11:00:00"), 500.0, 4L)
  ).toDF("qk", "qt", "rate", "qid")

  test("asofJoin: latest at-or-before per key, left-join nulls, no amplification") {
    val trades = Seq(
      (10L, 1L, ts("2024-01-01 11:30:00")), // -> 100 (10:00 quote)
      (11L, 1L, ts("2024-01-01 12:00:00")), // tie: inclusive -> 110
      (12L, 1L, ts("2024-01-01 23:00:00")), // -> 120 (latest)
      (13L, 1L, ts("2024-01-01 09:00:00")), // before any quote -> null
      (14L, 2L, ts("2024-01-01 11:00:01")), // -> 500
      (15L, 3L, ts("2024-01-01 12:00:00")), // unknown key -> null
      (16L, 1L, null.asInstanceOf[Timestamp]) // null time -> null
    ).toDF("tid", "tk", "tt")
    val out = Joins.asofJoin(trades, quotes, "tk", "qk", "tt", "qt", Seq("rate", "qid"))
    assert(out.count() == trades.count()) // pure left semantics, no dup rows
    val m = out.collect().map(r => r.getLong(0) -> Option(r.get(3)).map(_.asInstanceOf[Double])).toMap
    assert(m(10L).contains(100.0) && m(11L).contains(110.0) && m(12L).contains(120.0))
    assert(m(13L).isEmpty && m(15L).isEmpty && m(16L).isEmpty)
    assert(m(14L).contains(500.0))
    // all left columns preserved, right cols appended
    assert(out.columns.toSeq == Seq("tid", "tk", "tt", "rate", "qid"))
  }

  test("asofJoin: strict (<) excludes the equal-time row; tolerance expires stale matches") {
    val trades = Seq(
      (11L, 1L, ts("2024-01-01 12:00:00")), // strict -> 100, not the 12:00 quote
      (12L, 1L, ts("2024-01-01 23:00:00"))  // last quote 14:00 is 9h old
    ).toDF("tid", "tk", "tt")
    val strict = Joins.asofJoin(trades, quotes, "tk", "qk", "tt", "qt",
        Seq("rate"), inclusive = false)
      .collect().map(r => r.getLong(0) -> Option(r.get(3))).toMap
    assert(strict(11L).contains(100.0))
    val tol = Joins.asofJoin(trades, quotes, "tk", "qk", "tt", "qt",
        Seq("rate"), toleranceSec = Some(3600.0))
      .collect().map(r => r.getLong(0) -> Option(r.get(3))).toMap
    assert(tol(11L).contains(110.0)) // 0s old: inside tolerance
    assert(tol(12L).isEmpty)         // 9h old: expired
  }

  test("asofJoin: tieBreak reduces duplicate (key,time) rows to the max-id one") {
    val dup = quotes.unionByName(Seq(
      (1L, ts("2024-01-01 12:00:00"), 111.0, 99L)).toDF("qk", "qt", "rate", "qid"))
    val trades = Seq((11L, 1L, ts("2024-01-01 12:30:00"))).toDF("tid", "tk", "tt")
    val out = Joins.asofJoin(trades, dup, "tk", "qk", "tt", "qt",
      Seq("rate", "qid"), tieBreak = Some("qid"))
    val r = out.head()
    assert(r.getDouble(3) == 111.0 && r.getLong(4) == 99L)
    assert(out.count() == 1)
  }

  test("asofJoin: null right key/time rows never match; numeric time axis works") {
    val right = Seq(
      (Option(1L), Option(10L), "a"),
      (Option.empty[Long], Option(50L), "nullkey"),
      (Option(1L), Option.empty[Long], "nulltime")
    ).toDF("rk", "rt", "tag")
    val left = Seq((1L, 60L), (1L, 5L)).toDF("lk", "lt")
    val m = Joins.asofJoin(left, right, "lk", "rk", "lt", "rt", Seq("tag"))
      .collect().map(r => r.getLong(1) -> Option(r.getString(2))).toMap
    assert(m(60L).contains("a") && m(5L).isEmpty)
  }

  test("asofJoin: guards — missing cols, collisions, type mismatches") {
    val l = Seq((1L, 2L)).toDF("k", "t")
    val r = Seq((1L, 2L, "x")).toDF("k", "t", "v")
    intercept[IllegalArgumentException](Joins.asofJoin(l, r, "nope", "k", "t", "t", Seq("v")))
    intercept[IllegalArgumentException](Joins.asofJoin(l, r, "k", "k", "t", "t", Seq.empty))
    intercept[IllegalArgumentException](Joins.asofJoin(l, r, "k", "k", "t", "t", Seq("t"))) // collision
    intercept[IllegalArgumentException](Joins.asofJoin(l, r, "k", "v", "t", "t", Seq("v"))) // key type
    intercept[IllegalArgumentException](Joins.asofJoin(l, r, "k", "k", "t", "v", Seq("v"))) // time type
    intercept[IllegalArgumentException](
      Joins.asofJoin(l, r, "k", "k", "t", "t", Seq("v"), toleranceSec = Some(-1)))
  }

  test("rangeJoinBucketed: half-open containment, multi-bucket intervals, N-way matches") {
    // numeric axis, width 10: intervals crossing bucket borders must still match
    val windows = Seq(
      (100L, 5L, 25L, "w1"),   // spans buckets 0,1,2
      (101L, 25L, 26L, "w2"),  // tiny, inside bucket 2
      (102L, 30L, 30L, "w3"),  // empty -> drops
      (103L, 40L, 30L, "w4")   // inverted -> drops
    ).toDF("wid", "s", "e", "tag")
    val points = Seq(
      (1L, 5L),   // w1 start inclusive
      (2L, 24L),  // w1 (bucket 2, start in bucket 0)
      (3L, 25L),  // w1 end EXCLUSIVE; w2 start -> only w2
      (4L, 26L),  // w2 end exclusive -> nothing
      (5L, 30L)   // empty/inverted windows -> nothing
    ).toDF("pid", "t")
    val out = Joins.rangeJoinBucketed(points, windows, "t", "s", "e",
      Seq("wid", "tag"), bucketWidth = 10)
    val got = out.collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    assert(got == Set((1L, 100L), (2L, 100L), (3L, 101L)))
    assert(out.columns.toSeq == Seq("pid", "t", "wid", "tag"))
    // a point inside TWO overlapping windows yields two rows
    val overl = Seq((200L, 0L, 50L, "a"), (201L, 20L, 30L, "b")).toDF("wid", "s", "e", "tag")
    assert(Joins.rangeJoinBucketed(Seq((9L, 24L)).toDF("pid", "t"),
      overl, "t", "s", "e", Seq("wid"), 10).count() == 2)
  }

  test("rangeJoinBucketed: timestamp axis + key equality + exact boundary bucketing") {
    val windows = Seq(
      (1L, ts("2024-01-01 10:00:00"), ts("2024-01-01 12:00:00"), "promoA"),
      (2L, ts("2024-01-01 10:00:00"), ts("2024-01-01 12:00:00"), "promoB")
    ).toDF("wu", "ws", "we", "promo")
    val evs = Seq(
      (10L, 1L, ts("2024-01-01 10:00:00")), // start inclusive, user 1
      (11L, 1L, ts("2024-01-01 12:00:00")), // end exclusive
      (12L, 2L, ts("2024-01-01 11:59:59")), // user 2 -> promoB only
      (13L, 3L, ts("2024-01-01 11:00:00"))  // unknown user -> nothing
    ).toDF("eid", "eu", "et")
    val out = Joins.rangeJoinBucketed(evs, windows, "et", "ws", "we",
      Seq("promo"), bucketWidth = 3600, keyCols = Some(("eu", "wu")))
    val got = out.collect().map(r => (r.getLong(0), r.getString(3))).toSet
    assert(got == Set((10L, "promoA"), (12L, "promoB")))
    // width guards
    intercept[IllegalArgumentException](Joins.rangeJoinBucketed(
      evs, windows, "et", "ws", "we", Seq("promo"), 0))
    intercept[IllegalArgumentException](Joins.rangeJoinBucketed(
      evs, windows, "et", "ws", "we", Seq("eid"), 10)) // collision
  }

  test("rangeJoinBucketed: negative numeric axis buckets correctly (floor, not truncate)") {
    val w = Seq((1L, -25L, -5L, "neg")).toDF("wid", "s", "e", "tag")
    val p = Seq((1L, -25L), (2L, -6L), (3L, -5L), (4L, -26L)).toDF("pid", "t")
    val got = Joins.rangeJoinBucketed(p, w, "t", "s", "e", Seq("wid"), 10)
      .collect().map(_.getLong(0)).toSet
    assert(got == Set(1L, 2L))
  }
}
