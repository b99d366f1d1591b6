package graft.war

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** One output-schema field: name, Spark type, nullability and the
  * default used to fill missing/NaN values (reference
  * `war_calculation/models.py:88-139` — pandas `int64` vs nullable
  * `Int64` maps onto non-nullable-with-default vs nullable). */
final case class FieldSpec(
    name: String, dataType: DataType, nullable: Boolean, default: Any)

/**
 * Declarative output-schema enforcement (the Spark form of the
 * reference's Pydantic `ensure_columns` + `finalize`): add missing
 * columns with defaults, scrub non-finite doubles to null
 * (calculator.py:220-221), cast, fill non-nullable columns, select in
 * schema order.
 */
object SchemaFinalize {

  def intCol(name: String, default: Long = 0L): FieldSpec =
    FieldSpec(name, LongType, nullable = false, default)
  def intColNullable(name: String): FieldSpec =
    FieldSpec(name, LongType, nullable = true, null)
  def floatCol(name: String): FieldSpec =
    FieldSpec(name, DoubleType, nullable = true, null)
  def strCol(name: String, default: String = ""): FieldSpec =
    FieldSpec(name, StringType, nullable = false, default)

  private def scrub(c: Column, dt: DataType): Column = dt match {
    case DoubleType => when(isnan(c) || c === Double.PositiveInfinity ||
      c === Double.NegativeInfinity, lit(null)).otherwise(c)
    case _ => c
  }

  def finalizeSchema(df: DataFrame, fields: Seq[FieldSpec]): DataFrame = {
    val ensured = fields.foldLeft(df) { (d, f) =>
      if (d.columns.contains(f.name)) d
      else d.withColumn(f.name, lit(f.default).cast(f.dataType))
    }
    ensured.select(fields.map { f =>
      val c0 = col(f.name).cast(f.dataType)
      val c = if (f.dataType == DoubleType) scrub(c0, DoubleType) else c0
      (if (f.nullable) c else coalesce(c, lit(f.default).cast(f.dataType))).as(f.name)
    }: _*)
  }

  /** The batting-WAR output schema core (models.py:232-330; the full
    * reference list also carries every rate stat — extend as those
    * land in the pipeline). */
  val battingWar: Seq[FieldSpec] = Seq(
    strCol("player_name"), intColNullable("cube_player_id"), strCol("player_id"),
    strCol("bats"), strCol("pos"),
    strCol("team_name"), strCol("team_id"), strCol("conference"),
    strCol("division"), intCol("year"),
    intCol("gp"), intCol("ab"), intCol("pa"), intCol("h"),
    intCol("2b"), intCol("3b"), intCol("hr"), intCol("r"), intCol("bb"),
    intCol("ibb"), intCol("hbp"), intCol("k"), intCol("sf"), intCol("sh"),
    intCol("sb"), intCol("cs"),
    floatCol("woba"), floatCol("wraa"), floatCol("batting"),
    floatCol("baserunning"), floatCol("positional_adjustment"),
    floatCol("replacement_level_runs"), floatCol("league_adjustment"),
    floatCol("war"), floatCol("sos_adj_war"))

  /** The pitching-WAR output schema core (models.py:333-420 analogue of
    * [[battingWar]]). */
  val pitchingWar: Seq[FieldSpec] = Seq(
    strCol("player_name"), intColNullable("cube_player_id"), strCol("player_id"),
    strCol("throws"), strCol("team_name"), strCol("team_id"), strCol("conference"),
    strCol("division"), intCol("year"),
    intCol("app"), intCol("gs"), intCol("w"), intCol("l"), intCol("sv"),
    floatCol("ip_float"), intCol("h"), intCol("r"), intCol("er"),
    intCol("bb"), intCol("so"), intCol("hbp"), intCol("bf"), intCol("hr_a"),
    intCol("fo"), intCol("go"), intCol("fb"),
    floatCol("era"), floatCol("ra9"), floatCol("conf_ra9"),
    floatCol("park_adj_ra9"), floatCol("raap9"), floatCol("drpw"),
    floatCol("replacement_level"), floatCol("gmli"),
    floatCol("prea"), floatCol("pwpa"), floatCol("pwpa_li"), floatCol("clutch"),
    floatCol("war"), floatCol("sos_adj_war"))
}
