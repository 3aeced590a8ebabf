package graft.tools

import org.apache.spark.scheduler._
import org.apache.spark.sql.SparkSession
import scala.collection.mutable.ArrayBuffer

/** Scratch probe: per-stage wall/task attribution for one query — shows
  * whether an iterative plan's seconds sit in data stages, in the serial
  * AQE stage chain, or in driver gaps (planning/codegen) between stages.
  */
object StageProf {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    case class St(id: Int, name: String, sub: Long, done: Long, tasks: Int,
      taskMs: Long)
    val stages = ArrayBuffer[St]()
    val lock = new Object
    spark.sparkContext.addSparkListener(new SparkListener {
      val subTime = scala.collection.mutable.Map[Int, Long]()
      val taskMs = scala.collection.mutable.Map[Int, Long]()
      val nTask = scala.collection.mutable.Map[Int, Int]()
      override def onStageSubmitted(e: SparkListenerStageSubmitted): Unit =
        lock.synchronized {
          subTime(e.stageInfo.stageId) = System.currentTimeMillis()
        }
      override def onTaskEnd(e: SparkListenerTaskEnd): Unit =
        lock.synchronized {
          taskMs(e.stageId) = taskMs.getOrElse(e.stageId, 0L) +
            e.taskInfo.duration
          nTask(e.stageId) = nTask.getOrElse(e.stageId, 0) + 1
        }
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit =
        lock.synchronized {
          val id = e.stageInfo.stageId
          stages += St(id, e.stageInfo.name.takeWhile(_ != '\n').take(60),
            subTime.getOrElse(id, 0L), System.currentTimeMillis(),
            nTask.getOrElse(id, 0), taskMs.getOrElse(id, 0L))
        }
    })
    // warmup
    graft.SparkEntry.entry(spark).write.format("noop").mode("overwrite").save()
    for (q <- args) {
      // warm pass first, then the measured pass
      graft.SparkEntry.queries(q)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      lock.synchronized(stages.clear())
      val t0 = System.currentTimeMillis()
      graft.SparkEntry.queries(q)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      val t1 = System.currentTimeMillis()
      Thread.sleep(300)
      lock.synchronized {
        val ss = stages.sortBy(_.sub)
        println(s"===== $q  wall=${(t1 - t0) / 1000.0}s  nstages=${ss.size}")
        var lastEnd = t0
        for (s2 <- ss) {
          val gap = s2.sub - lastEnd
          println(f"  stage ${s2.id}%4d +${(s2.sub - t0) / 1000.0}%6.2fs " +
            f"gap=${gap / 1000.0}%5.2fs dur=${(s2.done - s2.sub) / 1000.0}%5.2fs " +
            f"tasks=${s2.tasks}%3d taskSum=${s2.taskMs / 1000.0}%6.2fs ${s2.name}")
          lastEnd = math.max(lastEnd, s2.done)
        }
        println(f"  tail gap to end: ${(t1 - lastEnd) / 1000.0}%5.2fs")
      }
    }
    spark.stop()
  }
}
