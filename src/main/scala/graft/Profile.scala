package graft

import org.apache.spark.scheduler._
import org.apache.spark.sql.SparkSession

/** Per-query profiler for the optimization rounds: runs named queries
  * under the bench session settings and prints, per query,
  *   - wall seconds for the noop-sink action,
  *   - every job (description, seconds) and every stage (id, name,
  *     seconds, task count, shuffle read/write bytes),
  *   - optionally the formatted plan to plans/<tag>/<query>_<suffix>.txt.
  *
  * Usage:
  *   SPARK_GRAFT_SF_DIR=... SPARK_GRAFT_CPUS=32 \
  *     sbt "runMain graft.Profile q_a,q_b [planDir] [suffix]"
  *
  * This is measurement tooling only (guide §1): it never changes what a
  * query computes, and the bench/driver surfaces are untouched.
  */
object Profile {
  private final class StageListener extends SparkListener {
    import scala.collection.mutable
    val stages = mutable.ArrayBuffer[(Int, String, Double, Int, Long, Long)]()
    val jobs = mutable.ArrayBuffer[(Int, String, Double)]()
    private val jobStart = mutable.Map[Int, (Long, String)]()
    override def onStageCompleted(e: SparkListenerStageCompleted): Unit = {
      val i = e.stageInfo
      val sec = (for {
        a <- i.submissionTime; b <- i.completionTime
      } yield (b - a) / 1e3).getOrElse(0.0)
      val m = i.taskMetrics
      stages += ((i.stageId, i.name.takeWhile(_ != '\n').take(90), sec,
        i.numTasks, m.shuffleReadMetrics.totalBytesRead,
        m.shuffleWriteMetrics.bytesWritten))
    }
    override def onJobStart(e: SparkListenerJobStart): Unit =
      jobStart(e.jobId) = (e.time,
        Option(e.properties)
          .flatMap(p => Option(p.getProperty("spark.job.description")))
          .getOrElse(""))
    override def onJobEnd(e: SparkListenerJobEnd): Unit =
      jobStart.remove(e.jobId).foreach { case (t0, d) =>
        jobs += ((e.jobId, d.take(80), (e.time - t0) / 1e3))
      }
    def reset(): Unit = { stages.clear(); jobs.clear() }
  }

  def main(args: Array[String]): Unit = {
    val names = args.headOption
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
      .getOrElse(Seq.empty)
    require(names.nonEmpty, "usage: Profile q_a,q_b [planDir] [suffix]")
    val planDir = if (args.length > 1) Some(args(1)) else None
    val suffix = if (args.length > 2) args(2) else "before"
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.windowExec.buffer.spill.threshold", "4194304")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val lst = new StageListener
    spark.sparkContext.addSparkListener(lst)
    Tables.names.foreach(n => Tables(spark, sfDir, n).count())
    val unknown = names.filterNot(SparkEntry.queries.contains)
    require(unknown.isEmpty, s"unknown queries: ${unknown.mkString(",")}")
    names.foreach { name =>
      val fn = SparkEntry.queries(name)
      // two runs: first is plan+codegen warm-up, second is the timed one
      // (mirrors the bench's min-of-3 discipline on a budget)
      (1 to 2).foreach { pass =>
        spark.catalog.clearCache()
        org.apache.spark.GraftCoreBridge.drainListenerBus(spark.sparkContext)
        lst.reset()
        spark.sparkContext.setJobDescription(s"$name pass$pass")
        val t0 = System.nanoTime()
        val df = fn(spark, sfDir)
        val built = (System.nanoTime() - t0) / 1e9
        val t1 = System.nanoTime()
        df.write.format("noop").mode("overwrite").save()
        val sec = (System.nanoTime() - t1) / 1e9
        org.apache.spark.GraftCoreBridge.drainListenerBus(spark.sparkContext)
        println(f"== $name pass$pass: build ${built}%.2fs action $sec%.2fs, " +
          s"${lst.jobs.size} jobs, ${lst.stages.size} stages")
        if (pass == 2) {
          lst.jobs.foreach { case (id, d, s) =>
            println(f"  job $id%3d $s%7.2fs  $d")
          }
          lst.stages.sortBy(-_._3).take(30).foreach {
            case (id, nm, s, nt, r, w) =>
              println(f"  stage $id%4d $s%7.2fs tasks=$nt%3d " +
                f"sr=${r / 1e6}%8.2fMB sw=${w / 1e6}%8.2fMB  $nm")
          }
          planDir.foreach { pd =>
            val p = java.nio.file.Paths.get(pd)
            java.nio.file.Files.createDirectories(p)
            java.nio.file.Files.write(p.resolve(s"${name}_$suffix.txt"),
              fn(spark, sfDir).queryExecution.explainString(
                org.apache.spark.sql.execution.FormattedMode)
                .getBytes("UTF-8"))
          }
        }
      }
    }
    spark.stop()
  }
}
