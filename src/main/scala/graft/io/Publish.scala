package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import scala.jdk.CollectionConverters._

/**
 * S9: the config-driven publish driver (reference
 * `scripts/upload_to_db.py:31-61,71-181` + `db_table_config.json`):
 * walk a data root, fnmatch each file's relative path against an
 * ordered (pattern → table) config, group the matches per table, and
 * load each table into a JDBC store with the reference's refresh
 * semantics — optional per-year slice (DELETE the year, append the
 * year's rows), keep-first dedup on the table's keys, full replace
 * when no year column is in play.
 *
 * Spark-first deviations from the SQLite script, kept deliberately:
 *  - the per-table file set is ONE `spark.read.csv` scan (the
 *    reference loops pandas per file); keep-first order across files
 *    comes from the sorted-path file index, resolved via
 *    `input_file_name`, not from driver-side concat order;
 *  - the reference's post-append `DELETE ... MIN(rowid)` dedup is a
 *    SQLite-specific trick; the portable equivalent is batch dedup
 *    BEFORE the append plus — for keyed tables whose keys do NOT
 *    contain the slice column (pbp, lineups, schedules) — an
 *    anti-join of the incoming slice against the surviving table keys
 *    (MIN(rowid) keeps the first-loaded row, so existing rows win);
 *  - within one file, conflicting duplicate payloads have no defined
 *    winner (a parallel scan has no stable intra-file row order); the
 *    reference's uploads only ever conflict across files (year
 *    re-uploads), which the file index orders deterministically.
 */
object Publish {

  /** One config entry: first matching pattern wins (upload_to_db.py:37-41). */
  final case class Mapping(pattern: String, table: String)

  /** Per-table load report: files consumed, rows in the table after
    * the load — the no-silent-caps surface for skipped/deduped rows. */
  final case class LoadReport(table: String, files: Seq[String], rowsLoaded: Long)

  /** db_table_config.json loader (a JSON array of {pattern, table}),
    * order-preserving. */
  def loadConfig(path: String): Seq[Mapping] = {
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val tree = mapper.readTree(new java.io.File(path))
    tree.elements.asScala
      .map(n => Mapping(n.get("pattern").asText, n.get("table").asText))
      .toSeq
  }

  /** Python `fnmatch.fnmatch` translation: `*` crosses path
    * separators (fnmatch has no globstar), `?` one char, `[seq]` /
    * `[!seq]` classes (the `!` negation becomes `^`; class contents
    * pass through verbatim as in fnmatch); an unterminated `[` is a
    * literal bracket, matching CPython's fnmatch.translate. */
  private[io] def globToRegex(glob: String): java.util.regex.Pattern = {
    val sb = new StringBuilder("^")
    var i = 0
    while (i < glob.length) {
      glob.charAt(i) match {
        case '*' => sb.append(".*")
        case '?' => sb.append('.')
        case '[' =>
          // find the closing ']': a ']' in first position (after
          // optional '!') is part of the class, per fnmatch
          var j = i + 1
          if (j < glob.length && glob.charAt(j) == '!') j += 1
          if (j < glob.length && glob.charAt(j) == ']') j += 1
          while (j < glob.length && glob.charAt(j) != ']') j += 1
          if (j >= glob.length) sb.append("\\[") // unterminated: literal
          else {
            val body0 = glob.substring(i + 1, j)
            val body = (if (body0.startsWith("!")) "^" + body0.tail else body0)
              .replace("\\", "\\\\")
            sb.append('[').append(body).append(']')
            i = j
          }
        case c if "\\.^$+{}()|".contains(c) => sb.append('\\').append(c)
        case c => sb.append(c)
      }
      i += 1
    }
    java.util.regex.Pattern.compile(sb.append('$').toString)
  }

  /** First config entry whose pattern matches the relative path. */
  def matchTable(relPath: String, config: Seq[Mapping]): Option[String] = {
    val compiled = config.map(m => globToRegex(m.pattern) -> m.table)
    compiled.collectFirst { case (p, t) if p.matcher(relPath).matches() => t }
  }

  /** Trailing `_YYYY` file-stem year (upload_to_db.py:15,44-46). */
  def extractYear(fileName: String): Option[Int] = {
    val stem = fileName.stripSuffix(".csv")
    "_(\\d{4})$".r.findFirstMatchIn(stem).map(_.group(1).toInt)
  }

  /**
   * Walk `dataRoot` for `*.csv`, skipping `excludedDirs` path
   * segments and (when `year` is set) files whose stem carries a
   * DIFFERENT year suffix; group by matched table
   * (upload_to_db.py:49-61). Paths are sorted — that order is the
   * keep-first dedup order downstream.
   */
  def collectFiles(
      dataRoot: String,
      year: Option[Int],
      config: Seq[Mapping],
      excludedDirs: Set[String] = Set("_tmp", "headshots")): Map[String, Seq[String]] = {
    val root = java.nio.file.Paths.get(dataRoot)
    val walk = java.nio.file.Files.walk(root)
    val all =
      try walk.iterator().asScala
        .filter(p => p.toString.endsWith(".csv") && java.nio.file.Files.isRegularFile(p))
        .map(p => root.relativize(p).toString)
        .filterNot(rel => rel.split('/').exists(excludedDirs.contains))
        .toSeq.sorted
      finally walk.close() // Files.walk holds open directory handles
    val compiled = config.map(m => globToRegex(m.pattern) -> m.table)
    all.flatMap { rel =>
      val fileYear = extractYear(rel.split('/').last)
      val skip = year.isDefined && fileYear.isDefined && fileYear != year
      if (skip) None
      else compiled.collectFirst { case (p, t) if p.matcher(rel).matches() => t }
        .map(t => t -> s"$dataRoot/$rel")
    }.groupBy(_._1).map { case (t, pairs) => t -> pairs.map(_._2) }
  }

  /** One table's sorted file set as a single schema-merged scan with
    * a deterministic per-file index for the keep-first order. */
  private def readFiles(spark: SparkSession, files: Seq[String]): DataFrame = {
    val byFile = files.zipWithIndex.map { case (f, i) =>
      // one read per file keeps per-file schema inference independent
      // (the reference reads each CSV with its own pandas dtypes); the
      // union is by COLUMN NAME so file column order can differ
      spark.read.option("header", "true").option("inferSchema", "true").csv(f)
        .withColumn("__file_idx", lit(i))
    }
    byFile.reduceLeft((a, b) => a.unionByName(b, allowMissingColumns = true))
  }

  /** Keep-first on `keys` in sorted-file order (upload_to_db.py
    * drop_duplicates keep="first" / MIN(rowid)). */
  private def dedupKeepFirst(df: DataFrame, keys: Seq[String]): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(col("__file_idx"))
    df.withColumn("__rn", row_number().over(w)).filter(col("__rn") === 1).drop("__rn")
  }

  /** Derby and friends reject Spark's default CLOB mapping for string
    * columns in keys — emit explicit VARCHAR DDL for every string col. */
  private def varcharTypes(df: DataFrame): Option[String] = {
    val strings = df.schema.fields.collect {
      case f if f.dataType == org.apache.spark.sql.types.StringType =>
        s"${f.name} VARCHAR(512)"
    }
    if (strings.isEmpty) None else Some(strings.mkString(", "))
  }

  /**
   * Publish every configured table found under `dataRoot` into the
   * JDBC store at `url` (upload_to_db.py:96-142 bulk semantics):
   *
   *  - dedup keep-first on `dedupKeys(table)` when all key columns
   *    are present;
   *  - `year` set and a `year` column present: DELETE the year's
   *    slice and append the year's rows (first load takes the whole
   *    frame, matching the reference's table-absent branch);
   *  - otherwise: full replace.
   *
   * Returns one [[LoadReport]] per table, table-name order — the
   * printed row counts of the reference loop, as data.
   */
  def publish(
      spark: SparkSession,
      dataRoot: String,
      config: Seq[Mapping],
      url: String,
      year: Option[Int] = None,
      dedupKeys: Map[String, Seq[String]] = defaultDedupKeys,
      excludedDirs: Set[String] = Set("_tmp", "headshots")): Seq[LoadReport] = {

    collectFiles(dataRoot, year, config, excludedDirs).toSeq.sortBy(_._1).map {
      case (table, files) =>
        val raw = readFiles(spark, files)
        val keys = dedupKeys.get(table).filter(_.forall(raw.columns.contains))
        val deduped = keys.fold(raw)(dedupKeepFirst(raw, _)).drop("__file_idx")
        val hasYearCol = deduped.columns.contains("year")

        (year, hasYearCol) match {
          case (Some(y), true) =>
            val tableExists = {
              val conn = java.sql.DriverManager.getConnection(url)
              try {
                val rs = conn.getMetaData.getTables(null, null, null, Array("TABLE"))
                var found = false
                while (rs.next() && !found)
                  found = rs.getString("TABLE_NAME").equalsIgnoreCase(table)
                found
              } finally conn.close()
            }
            if (tableExists) {
              val slice0 = deduped.filter(col("year") === y)
              // reference semantics for keyed tables whose keys do NOT
              // contain the slice column (pbp, lineups, schedules): the
              // post-append MIN(rowid) dedup keeps the FIRST-loaded row,
              // i.e. existing rows win over the incoming batch — the
              // portable form is an anti-join against the surviving
              // (post-delete) keys. Skipped when keys ⊇ {year}: the
              // deleted slice is exactly the key range being rewritten.
              val slice = keys match {
                case Some(k) if !k.contains("year") =>
                  val existing = spark.read.format("jdbc")
                    .option("url", url).option("dbtable", table).load()
                    .filter(col("year") =!= y)
                    .select(k.map(col): _*)
                  slice0.join(existing, k, "left_anti")
                case _ => slice0
              }
              // empty dedupKeys when no registry entry applies: the
              // batch must NOT be deduped on an arbitrary column
              // (partitioning the one-year slice by "year" would keep
              // a single row). Quoted "year": Spark's JDBC writer
              // creates columns via quoteIdentifier, and `year` is
              // SQL-92-reserved anyway.
              Sinks.jdbcUpsert(slice, url, table, keys.getOrElse(Seq.empty),
                col("year"), deleteWhere = Some(s""""year" = $y"""),
                columnTypes = varcharTypes(slice))
            } else {
              val writer = deduped.write.mode("overwrite")
              varcharTypes(deduped).fold(writer)(ct =>
                writer.option("createTableColumnTypes", ct))
                .jdbc(url, table, new java.util.Properties())
            }
          case _ =>
            val writer = deduped.write.mode("overwrite")
            varcharTypes(deduped).fold(writer)(ct =>
              writer.option("createTableColumnTypes", ct))
              .jdbc(url, table, new java.util.Properties())
        }

        val count = spark.read.format("jdbc")
          .option("url", url).option("dbtable", table).load().count()
        LoadReport(table, files, count)
    }
  }

  /** Data-layout migration: rename every `d{1,2,3}_*` file under
    * `dataRoot` to `ncaa_{N}_*` (reference
    * `scripts/rename_division_prefixes.py`). Returns the sorted
    * (old, new) relative-path list; `dryRun` reports without touching
    * the filesystem. Driver-side by design — this is a metadata
    * operation over the landing layout, not a data pass. */
  def renameDivisionPrefixes(dataRoot: String, dryRun: Boolean = false): Seq[(String, String)] = {
    val root = java.nio.file.Paths.get(dataRoot)
    val rx = "^d([123])_(.+)$".r
    val walk = java.nio.file.Files.walk(root)
    val moves =
      try walk.iterator().asScala
        .filter(java.nio.file.Files.isRegularFile(_))
        .flatMap { p =>
          p.getFileName.toString match {
            case rx(div, rest) =>
              Some(root.relativize(p).toString ->
                root.relativize(p.resolveSibling(s"ncaa_${div}_$rest")).toString)
            case _ => None
          }
        }.toSeq.sorted
      finally walk.close()
    if (!dryRun) moves.foreach { case (from, to) =>
      java.nio.file.Files.move(root.resolve(from), root.resolve(to)): Unit
    }
    moves
  }

  /** The reference's key registry (upload_to_db.py:17-28). */
  val defaultDedupKeys: Map[String, Seq[String]] = Map(
    "pbp" -> Seq("contest_id", "play_id"),
    "batting" -> Seq("player_id", "year", "division"),
    "pitching" -> Seq("player_id", "year", "division"),
    "batting_team" -> Seq("team_id", "year", "division"),
    "pitching_team" -> Seq("team_id", "year", "division"),
    "batting_lineups" -> Seq("player_id", "contest_id", "position"),
    "pitching_lineups" -> Seq("player_id", "contest_id"),
    "expected_runs" -> Seq("division", "year", "bases"),
    "guts_constants" -> Seq("division", "year"),
    "schedules" -> Seq("contest_id"))
}
