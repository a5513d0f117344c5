package graft.tools

import scala.collection.mutable
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart, SparkListenerStageCompleted}

/** Scratch: per-Spark-job wall times for one warm run of a named query. */
object JobProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val name = args(1)
    val spark = graft.GraftSession.get()
    spark.read.parquet(s"$dir/documents.parquet").count()
    val fn = graft.SparkEntry.queries(name)
    fn(spark, dir).write.format("noop").mode("overwrite").save() // warmup
    val starts = mutable.Map.empty[Int, (Long, String)]
    val lines = mutable.ArrayBuffer.empty[String]
    val listener = new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = {
        val desc = Option(j.properties.getProperty("spark.job.description")).getOrElse("")
        val site = Option(j.properties.getProperty("callSite.short")).getOrElse("")
        starts(j.jobId) = (j.time, s"stages=${j.stageIds.mkString(",")} $site $desc".take(120))
      }
      override def onJobEnd(j: SparkListenerJobEnd): Unit =
        starts.get(j.jobId).foreach { case (t0, d) =>
          lines += f"JOB ${j.jobId}%3d ${(j.time - t0) / 1e3}%6.2fs  $d"
        }
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
        val i = s.stageInfo
        val run = i.taskMetrics.executorRunTime / 1e3
        val cpu = i.taskMetrics.executorCpuTime / 1e9
        // first graft frame in the callsite stack: the AQE future wrapper
        // hides the real site in `name`, but `details` keeps the stack
        val site = i.details.linesIterator
          .find(l => l.contains("graft.") && !l.contains("JobProbe"))
          .map(_.trim.take(70)).getOrElse(i.name.take(60))
        lines += f"  STAGE ${i.stageId}%3d tasks=${i.numTasks}%3d run=$run%7.2fs cpu=$cpu%7.2fs $site"
      }
    }
    spark.sparkContext.addSparkListener(listener)
    val t0 = System.nanoTime()
    val df = fn(spark, dir)
    val tBuild = (System.nanoTime() - t0) / 1e9
    df.write.format("noop").mode("overwrite").save()
    val total = (System.nanoTime() - t0) / 1e9
    println(f"BUILD $tBuild%.2f")
    spark.sparkContext.removeSparkListener(listener)
    Thread.sleep(1000)
    lines.foreach(println)
    println(f"TOTAL $total%.2f")
    spark.stop()
  }
}
