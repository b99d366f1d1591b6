package graft.war

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

/** Golden-fixture tests for the baserunning value family (reference
  * `leaderboards/baserunning.py`, `war_calculation/batting.py:102-114,
  * 260-356`) — every expected number below is hand-computed from the
  * reference formulas over the 9-play fixture.
  */
class BaserunningSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def eps(a: Double, b: Double, e: Double = 1e-9) = assert(math.abs(a - b) < e, s"$a vs $b")

  // (contest, play, batter, team, teamName, r1, r1name, r2, r2name, r3, event, desc, outs_before)
  private lazy val pbp = Seq(
    (1L, 1, "BT1", "T1", "Tigers", "A", "Al", null, null, null, "SB", "Al steals second", 0),
    (1L, 2, "B", "T1", "Tigers", null, null, "A", "Al", null, "1B", "B singled, Al scored", 0),
    (1L, 3, "C", "T1", "Tigers", "B", "Bo", null, null, null, "2B", "C doubled, Bo out at home", 0),
    (1L, 4, "D", "T1", "Tigers", "C", "Cy", null, null, null, "OUT", "D grounded into double play", 1),
    (1L, 5, "E", "T1", "Tigers", "D", "Dan", null, null, null, "1B", "E singled", 2),
    (1L, 6, "F", "T1", "Tigers", null, null, null, null, "D", "OUT", "F flied out", 2),
    (2L, 1, "BT2", "T2", "Bears", "A", "Al", null, null, null, "CS", "Al caught stealing", 0),
    (2L, 2, "G", "T2", "Bears", null, null, "B", "Bo", null, "SB", "Bo steals third", 0),
    (2L, 3, "X", "T2", "Bears", "C", "Cy", null, null, null, "1B", "X singled", 0))
    .toDF("contest_id", "play_id", "batter_id", "bat_team_id", "bat_team_name",
      "r1_id", "r1_name", "r2_id", "r2_name", "r3_id", "event_type",
      "play_description", "outs_before")

  private def byId(df: org.apache.spark.sql.DataFrame, keyCol: String) =
    df.collect().map(r => r.getString(r.fieldIndex(keyCol)) -> r).toMap

  test("playerStealStats: opportunities, attempts and rates per runner-base") {
    val m = byId(Baserunning.playerStealStats(pbp), "player_id")
    assert(m.keySet === Set("A", "B", "C", "D"))
    val a = m("A")
    assert(a.getLong(a.fieldIndex("games")) === 2)
    assert(a.getLong(a.fieldIndex("att_2b")) === 2)
    assert(a.getLong(a.fieldIndex("sb_2b")) === 1)
    assert(a.getLong(a.fieldIndex("cs_2b")) === 1)
    assert(a.getLong(a.fieldIndex("opp_2b")) === 0)
    assert(a.getLong(a.fieldIndex("opp_3b")) === 1) // r2 on the g1p2 single
    eps(a.getDouble(a.fieldIndex("sb_pct")), 0.5)
    eps(a.getDouble(a.fieldIndex("att_2b_per_game")), 1.0)
    val b = m("B")
    assert(b.getLong(b.fieldIndex("opp_2b")) === 1)
    assert(b.getLong(b.fieldIndex("att_3b")) === 1)
    assert(b.getLong(b.fieldIndex("sb_3b")) === 1)
    val c = m("C")
    assert(c.getLong(c.fieldIndex("games")) === 2)
    assert(c.getLong(c.fieldIndex("opp_2b")) === 2)
  }

  test("wgdp: league-rate-scaled double-play runs by batter") {
    val m = byId(Baserunning.wgdp(pbp, "batter_id", "player_id"), "player_id")
    // 5 opps (r1 on, <2 outs): BT1, C, D(gdp), BT2, X → lg_rate 0.2
    assert(m.keySet === Set("BT1", "C", "D", "BT2", "X"))
    eps(m("D").getDouble(m("D").fieldIndex("wgdp")), (1 * 0.2 - 1) * 0.5)
    eps(m("C").getDouble(m("C").fieldIndex("wgdp")), 0.1)
    assert(m("D").getLong(m("D").fieldIndex("gdp")) === 1)
  }

  test("webt (leaderboard flavor): taken/out/hold vs league rates") {
    val m = byId(Baserunning.webt(pbp, runsOut = 0.2), "player_id")
    assert(m.keySet === Set("A", "B", "C", "D"))
    // 13 scenario: D taken (r3 next play), C neither taken nor out-at → hold
    // lg taken rate 0.5 → D: 1-0.5 = 0.5, C: 0-0.5 = -0.5
    eps(m("D").getDouble(m("D").fieldIndex("webt")), 0.5)
    eps(m("C").getDouble(m("C").fieldIndex("webt")), -0.5)
    assert(m("C").getLong(m("C").fieldIndex("hold_13")) === 1)
    assert(m("D").getLong(m("D").fieldIndex("taken_13")) === 1)
    // 2h: A scored on the single (lead runner, "scored" cue), sole opp → 0
    eps(m("A").getDouble(m("A").fieldIndex("webt")), 0.0)
    assert(m("A").getLong(m("A").fieldIndex("taken_2h")) === 1)
    // 1h: B thrown out at home ("out at" cue), sole opp → 0
    eps(m("B").getDouble(m("B").fieldIndex("webt")), 0.0)
    assert(m("B").getLong(m("B").fieldIndex("out_1h")) === 1)
  }

  test("webtWar (WAR flavor): destination-only semantics diverge on text cues") {
    val m = byId(Baserunning.webtWar(pbp, runsOut = 0.2), "player_id")
    // C's runner vanishes with no out-at text: WAR flavor counts it an
    // out (dest==0); D taken. succ rate 0.5, out rate 0.5.
    eps(m("D").getDouble(m("D").fieldIndex("webt")), 0.5 + 0.5 * 0.2)
    eps(m("C").getDouble(m("C").fieldIndex("webt")), -0.5 - 0.5 * 0.2)
    // A scored (text) but dest==0: WAR flavor says out — sole opp → 0
    eps(m("A").getDouble(m("A").fieldIndex("webt")), 0.0)
    assert(m("D").getLong(m("D").fieldIndex("ebt")) === 1)
    assert(m("D").getLong(m("D").fieldIndex("ebt_opps")) === 1)
  }

  test("playerBaserunning: wSB + composite = wsb + wgdp + webt") {
    val m = byId(
      Baserunning.playerBaserunning(pbp, runsSb = 0.2, runsCs = -0.475, runsOut = 0.2),
      "player_id")
    // lgwSB = (2*0.2 + 1*(-0.475)) / 3 = -0.025
    eps(m("A").getDouble(m("A").fieldIndex("wsb")), 0.2 - 0.475 + 0.025 * 2)
    eps(m("B").getDouble(m("B").fieldIndex("wsb")), 0.2 + 0.025)
    eps(m("D").getDouble(m("D").fieldIndex("wsb")), 0.0)
    // D: wsb 0 + wgdp(-0.4, as batter on g1p4) + webt 0.5
    eps(m("D").getDouble(m("D").fieldIndex("baserunning")), 0.0 - 0.4 + 0.5)
    // name map: first appearance wins
    assert(m("A").getString(m("A").fieldIndex("player_name")) === "Al")
    assert(m("A").getString(m("A").fieldIndex("team_id")) === "T1")
    assert(m("C").getString(m("C").fieldIndex("team_id")) === "T1")
  }

  test("teamBaserunning: team steals, team wGDP, runner-mapped wEBT roll-up") {
    val m = byId(
      Baserunning.teamBaserunning(pbp, runsSb = 0.2, runsCs = -0.475, runsOut = 0.2),
      "team_id")
    assert(m.keySet === Set("T1", "T2"))
    val t1 = m("T1"); val t2 = m("T2")
    assert(t1.getLong(t1.fieldIndex("opp_2b")) === 3)
    assert(t1.getLong(t1.fieldIndex("att_2b")) === 1)
    assert(t2.getLong(t2.fieldIndex("att_3b")) === 1)
    assert(t2.getLong(t2.fieldIndex("cs_2b")) === 1)
    // team wSB: lg totals as in the player test
    eps(t1.getDouble(t1.fieldIndex("wsb")), 0.2 + 0.025)
    eps(t2.getDouble(t2.fieldIndex("wsb")), 0.2 - 0.475 + 0.025 * 2)
    // team wGDP: T1 3 opps 1 gdp, T2 2 opps 0 gdp, rate 0.2
    eps(t1.getDouble(t1.fieldIndex("wgdp")), (3 * 0.2 - 1) * 0.5)
    eps(t2.getDouble(t2.fieldIndex("wgdp")), 0.2)
    // C's wEBT (-0.5) attributes to T1 (first appearance g1p4), so
    // T1 webt = 0 + 0 - 0.5 + 0.5 = 0; T2 has no mapped runners → 0
    eps(t1.getDouble(t1.fieldIndex("webt")), 0.0)
    eps(t2.getDouble(t2.fieldIndex("webt")), 0.0)
    assert(t1.getLong(t1.fieldIndex("ebt_opps")) === 4)
    eps(t1.getDouble(t1.fieldIndex("baserunning")),
      0.225 + (3 * 0.2 - 1) * 0.5 + 0.0)
  }

  test("property: playerStealStats equals a naive Scala loop on random games") {
    val rnd = new scala.util.Random(7)
    val events = Seq("SB", "CS", "1B", "2B", "OUT")
    case class P(contest: Long, play: Int, r1: Option[String], r2: Option[String], et: String)
    val plays = (0 until 400).map { i =>
      P(rnd.nextInt(20).toLong, i,
        if (rnd.nextBoolean()) Some(s"p${rnd.nextInt(15)}") else None,
        if (rnd.nextInt(3) == 0) Some(s"p${rnd.nextInt(15)}") else None,
        events(rnd.nextInt(events.length)))
    }
    val df = plays.map(p => (p.contest, p.play, "b", "t", "tn",
        p.r1.orNull, p.r1.map("N" + _).orNull, p.r2.orNull, p.r2.map("N" + _).orNull,
        null: String, p.et, "desc", 0))
      .toDF("contest_id", "play_id", "batter_id", "bat_team_id", "bat_team_name",
        "r1_id", "r1_name", "r2_id", "r2_name", "r3_id", "event_type",
        "play_description", "outs_before")

    // naive per-play accumulation
    case class Acc(var games: Set[Long] = Set.empty,
      var opp2: Long = 0, var att2: Long = 0, var sb2: Long = 0, var cs2: Long = 0,
      var opp3: Long = 0, var att3: Long = 0, var sb3: Long = 0, var cs3: Long = 0)
    val acc = scala.collection.mutable.Map.empty[String, Acc]
    plays.foreach { p =>
      val isAtt = p.et == "SB" || p.et == "CS"
      p.r1.foreach { r =>
        val a = acc.getOrElseUpdate(r, Acc()); a.games += p.contest
        if (isAtt) { a.att2 += 1; if (p.et == "SB") a.sb2 += 1 else a.cs2 += 1 }
        else a.opp2 += 1
      }
      p.r2.foreach { r =>
        val a = acc.getOrElseUpdate(r, Acc()); a.games += p.contest
        if (isAtt) { a.att3 += 1; if (p.et == "SB") a.sb3 += 1 else a.cs3 += 1 }
        else a.opp3 += 1
      }
    }

    val got = Baserunning.playerStealStats(df).collect()
      .map(r => r.getString(r.fieldIndex("player_id")) -> r).toMap
    assert(got.keySet === acc.keySet)
    acc.foreach { case (pid, a) =>
      val r = got(pid)
      assert(r.getLong(r.fieldIndex("games")) === a.games.size, pid)
      assert(r.getLong(r.fieldIndex("opp_2b")) === a.opp2, pid)
      assert(r.getLong(r.fieldIndex("att_2b")) === a.att2, pid)
      assert(r.getLong(r.fieldIndex("sb_2b")) === a.sb2, pid)
      assert(r.getLong(r.fieldIndex("cs_2b")) === a.cs2, pid)
      assert(r.getLong(r.fieldIndex("opp_3b")) === a.opp3, pid)
      assert(r.getLong(r.fieldIndex("att_3b")) === a.att3, pid)
      assert(r.getLong(r.fieldIndex("sb_3b")) === a.sb3, pid)
      assert(r.getLong(r.fieldIndex("cs_3b")) === a.cs3, pid)
    }
  }

  test("property: webtWar destinations equal a naive next-play lookup") {
    val rnd = new scala.util.Random(11)
    case class P(contest: Long, play: Int, r1: Option[String], r2: Option[String],
      r3: Option[String], et: String)
    val plays = (0 until 300).map { i =>
      def rp() = if (rnd.nextBoolean()) Some(s"p${rnd.nextInt(10)}") else None
      P(rnd.nextInt(12).toLong, i, rp(), rp(), rp(),
        Seq("1B", "2B", "OUT")(rnd.nextInt(3)))
    }
    val df = plays.map(p => (p.contest, p.play, "b", "t", "tn",
        p.r1.orNull, p.r2.orNull, p.r3.orNull, p.et, "d", 0))
      .toDF("contest_id", "play_id", "batter_id", "bat_team_id", "bat_team_name",
        "r1_id", "r2_id", "r3_id", "event_type", "play_description", "outs_before")

    // naive: per contest ordered by play, dest from the NEXT play's bases
    val byContest = plays.groupBy(_.contest).view.mapValues(_.sortBy(_.play))
    case class W(var opp13: Long = 0, var taken13: Long = 0, var out13: Long = 0,
      var opp2h: Long = 0, var taken2h: Long = 0, var out2h: Long = 0,
      var opp1h: Long = 0, var taken1h: Long = 0, var out1h: Long = 0)
    val acc = scala.collection.mutable.Map.empty[String, W]
    byContest.foreach { case (_, ps) =>
      ps.zipWithIndex.foreach { case (p, i) =>
        val next = if (i + 1 < ps.length) Some(ps(i + 1)) else None
        def dest(r: String): Int =
          next match {
            case Some(n) =>
              if (n.r1.contains(r)) 1 else if (n.r2.contains(r)) 2
              else if (n.r3.contains(r)) 3 else 0
            case None => 0
          }
        p.r1.foreach { r =>
          if (p.et == "1B") {
            val a = acc.getOrElseUpdate(r, W()); a.opp13 += 1
            if (dest(r) == 3) a.taken13 += 1
            if (dest(r) == 0) a.out13 += 1
          }
          if (p.et == "2B") {
            val a = acc.getOrElseUpdate(r, W()); a.opp1h += 1
            if (dest(r) != 0) a.taken1h += 1 else a.out1h += 1
          }
        }
        p.r2.foreach { r =>
          if (p.et == "1B") {
            val a = acc.getOrElseUpdate(r, W()); a.opp2h += 1
            if (dest(r) != 0) a.taken2h += 1 else a.out2h += 1
          }
        }
      }
    }

    val got = Baserunning.webtWar(df, runsOut = 0.2).collect()
      .map(r => r.getString(r.fieldIndex("player_id")) -> r).toMap
    assert(got.keySet === acc.keySet)
    acc.foreach { case (pid, w) =>
      val r = got(pid)
      assert(r.getLong(r.fieldIndex("ebt_opps")) === w.opp13 + w.opp2h + w.opp1h, pid)
      assert(r.getLong(r.fieldIndex("ebt")) === w.taken13 + w.taken2h + w.taken1h, pid)
    }
  }

  test("wsbFromBatting matches the season-stats opportunity formula") {
    // batting.py:102-114: opps = 1b+bb+hbp-ibb (clipped), run_cs = -(2*runs_out+0.075)
    val bat = Seq(
      ("p1", 40.0, 10.0, 2.0, 1.0, 10.0, 2.0),
      ("p2", 20.0, 5.0, 1.0, 0.0, 2.0, 4.0))
      .toDF("player_id", "1b", "bb", "hbp", "ibb", "sb", "cs")
    val m = byId(Baserunning.addWsbFromBatting(bat, runsOut = 0.2), "player_id")
    val runCs = -(2 * 0.2 + 0.075)
    val lgW = (12 * 0.2 + 6 * runCs) / (51 + 26)
    eps(m("p1").getDouble(m("p1").fieldIndex("wsb")), 10 * 0.2 + 2 * runCs - lgW * 51)
    eps(m("p2").getDouble(m("p2").fieldIndex("wsb")), 2 * 0.2 + 4 * runCs - lgW * 26)
  }
}
