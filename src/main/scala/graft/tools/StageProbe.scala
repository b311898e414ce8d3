package graft.tools

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Per-stage profile of one entry query: runs the query warm (JIT),
  * then once under a SparkListener that records every completed
  * stage's duration, task count, shuffle read/write bytes and spill —
  * the guide-§7 "which stage is the money" table without the UI
  * (disabled in this sandbox). Stage names carry the call site, which
  * maps back to operators.
  *
  * Usage: runMain graft.tools.StageProbe <query> [warmReps]
  */
object StageProbe {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: StageProbe <query> [warmReps]")
    val name = args(0)
    val warmReps = if (args.length > 1) args(1).toInt else 2
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val builder = SparkSession.builder()
      .master(s"local[$cpus]")
      .withExtensions(new graft.GraftExtensions)
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
    sys.env.get("SPARK_GRAFT_EXTRA_CONF").foreach(_.split(";").foreach { kv =>
      kv.split("=", 2) match {
        case Array(k, v) if k.nonEmpty => builder.config(k.trim, v.trim)
        case _ => ()
      }
    })
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def run(): Long =
      graft.SparkEntry.queries(name)(spark, sfDir).queryExecution.toRdd.count()
    for (_ <- 1 to warmReps) run()
    val stages = ArrayBuffer.empty[(Int, String, Long, Int, Long, Long, Long, Long)]
    val listener = new SparkListener {
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit = {
        val si = e.stageInfo
        val m = si.taskMetrics
        val dur = (for {
          s <- si.submissionTime; c <- si.completionTime
        } yield c - s).getOrElse(-1L)
        stages += ((si.stageId, si.name.takeWhile(_ != '\n'), dur,
          si.numTasks, m.shuffleReadMetrics.totalBytesRead,
          m.shuffleWriteMetrics.bytesWritten, m.memoryBytesSpilled,
          m.executorRunTime))
      }
    }
    spark.sparkContext.addSparkListener(listener)
    val t0 = System.nanoTime()
    val rows = run()
    val wall = (System.nanoTime() - t0) / 1e9
    Thread.sleep(500) // let the listener bus drain the final stage events
    println(f"[stage-probe] q=$name wall=$wall%.3f s rows=$rows")
    println(f"${"stage"}%6s ${"wall_ms"}%8s ${"tasks"}%5s ${"exec_ms"}%9s " +
      f"${"shuf_rd"}%10s ${"shuf_wr"}%10s ${"spill"}%10s  name")
    stages.sortBy(-_._3).foreach {
      case (id, nm, dur, tasks, rd, wr, sp, execMs) =>
        println(f"$id%6d $dur%8d $tasks%5d $execMs%9d $rd%10d $wr%10d $sp%10d  $nm")
    }
    spark.stop()
  }
}
