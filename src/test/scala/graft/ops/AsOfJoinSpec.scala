package graft.ops

import graft.SparkSpec

class AsOfJoinSpec extends SparkSpec {
  import spark.implicits._

  test("asOf: latest at-or-before match, inclusive ties, null when none") {
    val probe = Seq((1L, 10L, 100L), (1L, 5L, 101L), (1L, 20L, 102L), (2L, 7L, 103L))
      .toDF("k", "ts", "pid")
    val build = Seq((1L, 5L, 900L), (1L, 15L, 901L), (3L, 1L, 902L))
      .toDF("k", "ts", "bid")
    val out = AsOfJoin.asOf(probe, build, "k", "ts", Seq("bid"))
      .collect().map(r => (r.getLong(2), if (r.isNullAt(3)) -1L else r.getLong(3)))
      .sortBy(_._1).toSeq
    assert(out == Seq(
      (100L, 900L), // ts 10 -> build ts 5
      (101L, 900L), // ts 5 -> tie is inclusive (>=)
      (102L, 901L), // ts 20 -> build ts 15
      (103L, -1L))) // key 2 has no build rows -> null
  }

  test("asOf: a NULL field in the latest build row stays NULL (no per-column backfill)") {
    // build at ts 5 has amt=50; build at ts 15 (the latest for probe ts
    // 20) has amt=NULL — the match must carry (901, NULL), not reach
    // back to ts 5's amt
    val probe = Seq((1L, 20L, 100L)).toDF("k", "ts", "pid")
    val build = Seq((1L, 5L, 900L, Some(50L)), (1L, 15L, 901L, Option.empty[Long]))
      .toDF("k", "ts", "bid", "amt")
    val out = AsOfJoin.asOf(probe, build, "k", "ts", Seq("bid", "amt")).collect()
    assert(out.length == 1)
    assert(out(0).getLong(3) == 901L)
    assert(out(0).isNullAt(4), "latest build row's NULL amt must not be backfilled")
  }

  test("asOf fuzz: matches a brute-force reference on seeded random input") {
    val rnd = new scala.util.Random(2026)
    val probe = (1 to 1500).map { i =>
      (1L + rnd.nextInt(8), rnd.nextInt(200).toLong, i.toLong)
    }
    // build unique per (k, ts) as the contract requires; amt sometimes null
    val build = rnd.shuffle(
      (for (k <- 1L to 6L; ts <- 0L to 199L) yield (k, ts)).toSeq)
      .take(400)
      .map { case (k, ts) =>
        (k, ts, k * 1000 + ts, if (rnd.nextBoolean()) Some(ts * 2) else None)
      }
    val expected = probe.map { case (k, ts, pid) =>
      val m = build.filter(b => b._1 == k && b._2 <= ts)
        .sortBy(_._2).lastOption
      (pid, m.map(_._3), m.flatMap(_._4))
    }.toSet
    import spark.implicits._
    val out = AsOfJoin.asOf(
      probe.toDF("k", "ts", "pid").repartition(5),
      build.toDF("k", "ts", "bid", "amt").repartition(3),
      "k", "ts", Seq("bid", "amt"))
    val got = out.collect().map { r =>
      (r.getLong(2),
        if (r.isNullAt(3)) None else Some(r.getLong(3)),
        if (r.isNullAt(4)) None else Some(r.getLong(4)))
    }.toSet
    assert(got == expected)
  }

  test("asOf: probe keeps exactly its row count (left semantics)") {
    val probe = Seq((1L, 1L, 1L), (1L, 2L, 2L), (1L, 3L, 3L)).toDF("k", "ts", "pid")
    val build = Seq((1L, 2L, 9L)).toDF("k", "ts", "bid")
    val out = AsOfJoin.asOf(probe, build, "k", "ts", Seq("bid"))
    assert(out.count() == 3)
    assert(out.columns.toSeq == Seq("k", "ts", "pid", "matched_bid"))
  }
}
