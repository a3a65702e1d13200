package graft.tools

/** Shared prologue for the diagnostic mains (QProf/CbProf/CcProf/
  * MediaProf/…): one bench-identical local session builder, one
  * wall+cpu timer, one executor-stack sampler — so a fix to the
  * measurement method lands in one place.
  */
object Prof {
  def session(name: String): org.apache.spark.sql.SparkSession = {
    val s = org.apache.spark.sql.SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .appName(name).getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  private val osBean = java.lang.management.ManagementFactory
    .getOperatingSystemMXBean
    .asInstanceOf[com.sun.management.OperatingSystemMXBean]

  /** Print `== label: Ws wall Cs cpu (result)` around `f`. */
  def time[A](label: String)(f: => A): A = {
    val t0 = System.nanoTime; val c0 = osBean.getProcessCpuTime
    val r = f
    val suffix = r match {
      case () => ""
      case v  => s" ($v)"
    }
    println(f"== $label: ${(System.nanoTime - t0) / 1e9}%.2fs wall " +
      f"${(osBean.getProcessCpuTime - c0) / 1e9}%.1fs cpu$suffix")
    r
  }

  /** Sample executor-task stacks for ~`secs` seconds on a daemon thread;
    * prints the top `top` 3-frame prefixes as `== HOT[count] frames`.
    * Join the returned thread (bounded) after the measured work.
    */
  def sampler(secs: Int, top: Int = 10): Thread = {
    import scala.jdk.CollectionConverters._
    val t = new Thread(() => {
      val counts = scala.collection.mutable.Map.empty[String, Int]
      (1 to secs * 10).foreach { _ =>
        Thread.getAllStackTraces.asScala.foreach { case (th, st) =>
          if (th.getName.startsWith("Executor task") && st.nonEmpty) {
            val hot = st.take(3).mkString(" <- ")
            counts(hot) = counts.getOrElse(hot, 0) + 1
          }
        }
        Thread.sleep(100)
      }
      counts.toSeq.sortBy(-_._2).take(top).foreach { case (f, c) =>
        println(s"== HOT[$c] $f") }
    })
    t.setDaemon(true); t.start(); t
  }
}
