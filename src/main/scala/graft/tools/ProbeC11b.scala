package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Scratch bisection probe for the r20 optimization round (dev-only). */
object ProbeC11b {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.text.TextAnalysis
    val docs = graft.Tables.documents(spark, sfDir)
    docs.count()
    def time(name: String)(f: => Long): Unit =
      (1 to 3).foreach { i =>
        val t0 = System.nanoTime(); val n = f
        println(f"[probe] $name rep$i ${(System.nanoTime() - t0) / 1e9}%.3f rows=$n")
      }
    val withKey = TextAnalysis.classifierScore(
        docs.filter(col("doc_id").isNotNull), col("text"),
        col("doc_id"), TextAnalysis.defaultClassifierWeights(64),
        bias = -0.25,
        carry = Seq("source" -> col("source"), "lang" -> col("lang")))
      .select(col("doc_id"), col("source"), col("lang"), col("n_tokens"),
        col("logit_micro").as("quality"))
    time("scored_only") { withKey.count() }
    val cal = TextAnalysis.tokenCalibration(docs, col("text"), col("lang"))
      .select(col("lang"), col("bpe_per_ws"))
    time("cal_only") { cal.count() }
    val cal2 = cal.select(col("lang").as("__clang"),
      round(col("bpe_per_ws") * 1000000.0, 0).cast("long").as("__ratio"))
    val joined = withKey.join(broadcast(cal2),
        col("lang") <=> col("__clang"), "left")
      .withColumn("est_bpe_micro",
        col("n_tokens") * coalesce(col("__ratio"), lit(1000000L)))
      .drop("__clang", "__ratio")
    time("join_no_window") { joined.count() }
    val w = Window.partitionBy(col("source"))
      .orderBy(col("quality").desc, col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = joined.withColumn("cum_bpe_micro", sum(col("est_bpe_micro")).over(w))
      .filter(col("cum_bpe_micro") <= 3000L * 1000000L)
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onStageCompleted(
            sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
          val si = sc.stageInfo
          val dur = for {
            s <- si.submissionTime; c <- si.completionTime
          } yield c - s
          val tm = si.taskMetrics
          println(s"[stage] id=${si.stageId} tasks=${si.numTasks} " +
            s"durMs=${dur.getOrElse(-1L)} " +
            s"runMs=${tm.executorRunTime} cpuMs=${tm.executorCpuTime / 1000000} " +
            s"deserMs=${tm.executorDeserializeTime} " +
            s"details=${si.details.linesIterator.take(3).mkString(" | ").take(200)}")
        }
      })
    time("with_window") { cum.count() }
    time("full_sorted") {
      cum.orderBy(col("source"), col("quality").desc, col("doc_id")).count()
    }
    val wk2 = withKey.withColumn("est_bpe_micro", col("n_tokens") * 1000000L)
    val cum2 = wk2.withColumn("cum_bpe_micro", sum(col("est_bpe_micro")).over(w))
      .filter(col("cum_bpe_micro") <= 3000L * 1000000L)
    time("window_no_cal") { cum2.count() }
    // variant: checkpoint the 5-row cal frame (truncates its subtree)
    val calCk = cal2.localCheckpoint(true)
    val joinedCk = withKey.join(broadcast(calCk),
        col("lang") <=> col("__clang"), "left")
      .withColumn("est_bpe_micro",
        col("n_tokens") * coalesce(col("__ratio"), lit(1000000L)))
      .drop("__clang", "__ratio")
    val cumCk = joinedCk
      .withColumn("cum_bpe_micro", sum(col("est_bpe_micro")).over(w))
      .filter(col("cum_bpe_micro") <= 3000L * 1000000L)
    time("window_cal_ckpt") { cumCk.count() }
    // variant: classifier replaced by a cheap column, cal kept live
    val wkCheap = docs.filter(col("doc_id").isNotNull && col("text").isNotNull)
      .select(col("doc_id"), col("source"), col("lang"),
        size(split(col("text"), " ")).cast("long").as("n_tokens"),
        (col("doc_id") % 1000).as("quality"))
    val joinedCheap = wkCheap.join(broadcast(cal2),
        col("lang") <=> col("__clang"), "left")
      .withColumn("est_bpe_micro",
        col("n_tokens") * coalesce(col("__ratio"), lit(1000000L)))
      .drop("__clang", "__ratio")
    val cumCheap = joinedCheap
      .withColumn("cum_bpe_micro", sum(col("est_bpe_micro")).over(w))
      .filter(col("cum_bpe_micro") <= 3000L * 1000000L)
    time("window_cheap_quality") { cumCheap.count() }
    // variant: no broadcast hint
    val joinedNb = withKey.join(cal2, col("lang") <=> col("__clang"), "left")
      .withColumn("est_bpe_micro",
        col("n_tokens") * coalesce(col("__ratio"), lit(1000000L)))
      .drop("__clang", "__ratio")
    val cumNb = joinedNb
      .withColumn("cum_bpe_micro", sum(col("est_bpe_micro")).over(w))
      .filter(col("cum_bpe_micro") <= 3000L * 1000000L)
    time("window_nobcast") { cumNb.count() }
    // the production path as the gate runs it (post-change)
    time("gate_path") {
      graft.curation.Curation.tokenBudgetMixCalibrated(withKey,
          col("n_tokens"), col("lang"), col("source"),
          Seq(col("quality").desc, col("doc_id")), budget = 3000L,
          calibration = cal)
        .select(col("doc_id"), col("source"), col("lang"), col("n_tokens"),
          col("quality"), col("est_bpe_micro"), col("cum_bpe_micro"))
        .orderBy(col("source"), col("quality").desc, col("doc_id"))
        .count()
    }
    spark.stop()
  }
}
