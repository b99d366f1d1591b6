package graft.tools
import graft.pbp.{Parsing, BaseState}
object MicroParse {
  def main(args: Array[String]): Unit = {
    val texts = Array(
      "P12 Smith3 singled to left",
      "P7 Smith14 doubled to right, RBI; P44 Smith1 scored",
      "P3 Smith9 walked",
      "P31 Smith11 struck out swinging",
      "P22 Smith2 flied out to cf")
    val n = 100000
    def bench(label: String)(f: Int => Unit): Unit = {
      f(10000) // warmup
      val t0 = System.nanoTime()
      f(n)
      println(f"MICRO $label%-24s ${(System.nanoTime() - t0) / 1e3 / n}%8.2f us/row")
    }
    bench("splitPlayersText") { k => var i = 0; while (i < k) { Parsing.splitPlayersText(texts(i % 5)); i += 1 } }
    bench("parseSubstitution") { k => var i = 0; while (i < k) { Parsing.parseSubstitution(texts(i % 5)); i += 1 } }
    bench("outsOnPlay") { k => var i = 0; while (i < k) { Parsing.outsOnPlay(texts(i % 5), "", "", ""); i += 1 } }
    bench("classifyEventType") { k => var i = 0; while (i < k) { Parsing.classifyEventType(texts(i % 5), texts(i % 5), false); i += 1 } }
    bench("classifyBattedBall") { k => var i = 0; while (i < k) { Parsing.classifyBattedBall(texts(i % 5), "single"); i += 1 } }
    bench("extractBatterName") { k => var i = 0; while (i < k) { Parsing.extractBatterName(texts(i % 5), false); i += 1 } }
    val play = BaseState.Play(false, false, false, "", "", texts(1), "P44 Smith1 scored", "", "")
    bench("baseState.step") { k => var i = 0; var st = BaseState.emptyState; while (i < k) { st = BaseState.step(st, play)._1; i += 1 } }
  }
}
