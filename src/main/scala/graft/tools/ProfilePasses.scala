package graft.tools

import graft.SparkEntry

/**
 * Per-pass JVM telemetry for one registered query — `runMain
 * graft.tools.ProfilePasses [queryName] [passes] [sfDir]` (defaults:
 * `pbp01_parse_enrich`, 6, sf0.1). Diagnoses the VERDICT r8 item-7
 * question: when a query's later in-JVM passes inflate (pbp01
 * 3.7 → 11.3 s inside one median loop of the contended driver run),
 * is the slowdown engine-side (GC pressure from accumulated generated
 * classes, JIT deopt/recompile churn) or plain CPU contention?
 *
 * Prints, per pass: wall seconds, GC time DELTA (summed across
 * collectors), JIT compilation-time delta, loaded-class count, and
 * the 1-minute load average. An engine-side problem shows as gc_ms or
 * jit_ms growing with the wall time on a QUIET machine; contention
 * shows as wall growing while gc/jit stay flat and loadavg is high.
 */
object ProfilePasses {
  def main(args: Array[String]): Unit = {
    val name = args.headOption.getOrElse("pbp01_parse_enrich")
    val passes = args.lift(1).map(_.toInt).getOrElse(6)
    val sfDir = args.lift(2).getOrElse("/root/testdata/sf0.1")
    val spark = ToolSession.local(s"graft-profile-passes-$name")
    val q = SparkEntry.queries.getOrElse(name,
      sys.error(s"unknown query '$name'"))

    import scala.jdk.CollectionConverters._
    val gcBeans = java.lang.management.ManagementFactory.getGarbageCollectorMXBeans.asScala
    val jit = java.lang.management.ManagementFactory.getCompilationMXBean
    val cls = java.lang.management.ManagementFactory.getClassLoadingMXBean
    val os = java.lang.management.ManagementFactory.getOperatingSystemMXBean
    def gcMs = gcBeans.map(_.getCollectionTime).sum

    var lastGc = gcMs
    var lastJit = jit.getTotalCompilationTime
    (1 to passes).foreach { p =>
      val t0 = System.nanoTime()
      val n = q(spark, sfDir).count()
      val wall = (System.nanoTime() - t0) / 1e9
      val (g, j) = (gcMs, jit.getTotalCompilationTime)
      println(f"PASS $p%2d wall=$wall%6.2fs gc_ms=${g - lastGc}%6d " +
        f"jit_ms=${j - lastJit}%6d classes=${cls.getLoadedClassCount}%7d " +
        f"load=${os.getSystemLoadAverage}%5.2f rows=$n")
      lastGc = g; lastJit = j
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
