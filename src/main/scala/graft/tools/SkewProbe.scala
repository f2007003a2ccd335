package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Skew-mitigation probe (VERDICT r5 next §6): one deterministic
  * Zipf-shaped join measured five ways, so BASELINE.md can state WHEN
  * the manual salt in ops.Skew beats AQE's runtime skew-join split and
  * when it is unnecessary.
  *
  * Workload: `facts(n)` where HALF of all rows carry key 0 and the rest
  * spread uniformly over 1000 keys (one pathological logical hot key —
  * the shape AQE's OptimizeSkewedJoin targets), joined to a 1000-row
  * dim, then rolled up to 7 groups. Variants:
  *   bcast      — broadcast join (the floor: a small dim should never
  *                shuffle at all; skew is irrelevant)
  *   aqe_skew   — broadcast disabled (TB-scale dim regime), sort-merge
  *                join with AQE skewJoin ON at DEFAULT thresholds
  *   aqe_tuned  — same with lowered skew thresholds (32 MB / 16 MB
  *                advisory), probing whether the split engages at all
  *   smj_plain  — broadcast disabled, skewJoin OFF: the straggler
  *                baseline (one task owns half the input)
  *   salted     — broadcast disabled, skewJoin OFF, ops.Skew.saltedJoin
  *                with 8 salts: the hot key is split BEFORE the
  *                exchange by construction
  *
  * Each variant runs `passes` times (min taken) in its own forked
  * session so confs cannot leak. Emits one JSON line.
  */
object SkewProbe {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val n = sys.env.getOrElse("SKEW_PROBE_N", "20000000").toLong
    val passes = sys.env.getOrElse("SKEW_PROBE_PASSES", "3").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.local.dir", sys.env.getOrElse("SPARK_LOCAL_DIRS", "/dev/shm/graft-spark"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def facts(s: SparkSession): DataFrame =
      s.range(n).select(
        col("id"),
        when(pmod(col("id"), lit(2)) === 0, lit(0L))
          .otherwise(pmod(xxhash64(col("id")), lit(1000L))).as("key"),
        (col("id") % 97).cast("double").as("v"))
    def dim(s: SparkSession): DataFrame =
      s.range(1000).select(col("id").as("key"),
        concat(lit("g"), pmod(col("id"), lit(7))).as("grp"))
    def rollup(joined: DataFrame): DataFrame =
      joined.groupBy("grp").agg(count(lit(1)).as("cnt"), sum("v").as("sv"))

    def scoped(confs: (String, String)*): SparkSession = {
      val s = spark.newSession()
      confs.foreach { case (k, v) => s.conf.set(k, v) }
      s
    }
    val noBcast = Seq("spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1")

    val variants: Seq[(String, () => DataFrame)] = Seq(
      "bcast" -> (() => {
        val s = scoped()
        rollup(facts(s).join(broadcast(dim(s)), Seq("key")))
      }),
      "aqe_skew" -> (() => {
        val s = scoped(noBcast :+ ("spark.sql.adaptive.skewJoin.enabled" -> "true"): _*)
        rollup(facts(s).join(dim(s), Seq("key")))
      }),
      "aqe_tuned" -> (() => {
        // AQE only splits a partition larger than BOTH factor×median AND
        // skewedPartitionThresholdInBytes (256 MB default) — a hot key
        // under that still serializes one task. Tuned thresholds make
        // the split fire on this workload.
        val s = scoped(noBcast ++ Seq(
          "spark.sql.adaptive.skewJoin.enabled" -> "true",
          "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "32MB",
          "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "16MB"): _*)
        rollup(facts(s).join(dim(s), Seq("key")))
      }),
      "smj_plain" -> (() => {
        val s = scoped(noBcast :+ ("spark.sql.adaptive.skewJoin.enabled" -> "false"): _*)
        rollup(facts(s).join(dim(s), Seq("key")))
      }),
      "salted" -> (() => {
        val s = scoped(noBcast :+ ("spark.sql.adaptive.skewJoin.enabled" -> "false"): _*)
        rollup(graft.ops.Skew.saltedJoin(facts(s), dim(s), "key",
          salts = 8, saltFrom = Seq("id")))
      }))

    // one untimed warmup each (codegen/JIT), then `passes` timed runs
    val results = variants.map { case (name, build) =>
      build().write.format("noop").mode("overwrite").save()
      val secs = (1 to passes).map { _ =>
        val t0 = System.nanoTime()
        build().write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      name -> math.rint(secs.min * 1000) / 1000
    }
    println(results.map { case (k, v) => s""""$k":$v""" }
      .mkString(s"""{"n":$n,"passes":$passes,""", ",", "}"))
    spark.stop()
  }
}
