package graft.pbp

import graft.GraftSession

/** CLI drive of the full pbp parser stage on an inline game — the
  * runnable surface for the X-family (no pbp table exists in the
  * harness testdata; real input would be `spark.read.csv` with the
  * same columns). */
object PbpDemo {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.get("graft-pbp-demo")
    import spark.implicits._
    val raw = Seq(
      (1L, 1, 1, "Adams singled to left", null),
      (1L, 2, 1, "Brown walked", null),
      (1L, 3, 1, "Cole homered, 3 RBI; Adams scored; Brown scored", null),
      (1L, 4, 1, "Dunn struck out swinging", null),
      (1L, 5, 1, null, "Evans grounded into double play"),
      (1L, 6, 1, null, "Pinch pinch hit for Evans"),
      (1L, 7, 2, "Foley flied out to cf", null))
      .toDF("contest_id", "seq", "inning", "away_text", "home_text")
    val parsed = PbpPipeline.parse(raw)
    parsed.select("contest_id", "play_id", "half", "play_description", "event_type",
        "batted_ball_type", "outs_on_play", "outs_before", "runs_on_play", "runs_roi",
        "bases_before", "bases_after", "batter_name", "sub_fl", "sub_in", "sub_pos")
      .orderBy("contest_id", "play_id")
      .show(20, truncate = false)
    println(s"PBP_ROWS=${parsed.count()}")
    spark.stop()
  }
}
