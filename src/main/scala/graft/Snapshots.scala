package graft

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Crash-safe multi-part parquet snapshots for the artifact save/load
  * family (admission index, pair tables, gram counts + ledger, TF tables,
  * media features).
  *
  * A bare `mode("overwrite")` per part is NOT a safe snapshot protocol:
  * the overwrite deletes the previous data before the new write commits,
  * so a crash mid-save destroys the only snapshot — and a multi-part
  * artifact (pairs + unit arrays + probe table) written part-by-part can
  * be left with MIXED versions, which a later load would serve as a
  * silently inconsistent artifact (verdicts from one corpus state, probe
  * buckets from another).
  *
  * Protocol: every save writes ALL its parts into a fresh version
  * directory `v<N>` under the snapshot root, stamps the version with a
  * `_DONE` flag once every part is down, and then commits by replacing
  * the root's `_LATEST` marker (tmp-file + rename — atomic on local/HDFS,
  * single-object PUT on object stores). Loads resolve the marker and read
  * every part from THAT version. Crash anywhere mid-save ⇒ the previous
  * committed version is untouched and fully consistent; the partial
  * version directory is garbage that the next successful save prunes.
  * The brief marker-replacement window is covered by the fallback:
  * resolution without a usable marker picks the highest `_DONE` version,
  * which at that instant is exactly the version being committed.
  *
  * Legacy layout (parts directly under the root, pre-versioning saves) is
  * still readable: resolution falls through to the root itself when no
  * versioned snapshot exists.
  *
  * Concurrency contract (unchanged from the bare layout): save and load
  * of the SAME root are serialized by the owning artifact's per-key lock;
  * this helper adds crash-safety, not multi-writer coordination — two
  * UNCOORDINATED writers to one root could still interleave prunes with
  * reads. At lake scale the same protocol is what table formats implement
  * properly (Delta/Iceberg transaction logs); swap the root for a table
  * URI there.
  */
object Snapshots {
  private val Marker = "_LATEST"
  private val Done = "_DONE"

  private def fsOf(spark: SparkSession, p: Path) =
    p.getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def versionsOf(fs: org.apache.hadoop.fs.FileSystem,
                         root: Path): Seq[(Int, Path)] =
    if (!fs.exists(root)) Seq.empty
    else fs.listStatus(root).toSeq.flatMap { st =>
      val n = st.getPath.getName
      if (st.isDirectory && n.length > 1 && n.startsWith("v") &&
        n.drop(1).forall(_.isDigit))
        Some((n.drop(1).toInt, st.getPath))
      else None
    }

  /** Write `parts` as one committed snapshot version under `root`. Only
    * returns after the version is committed; prior committed versions and
    * any crashed partial versions are pruned afterwards (best-effort).
    */
  def write(spark: SparkSession, root: String,
            parts: Seq[(String, DataFrame)]): Unit = {
    val rootP = new Path(root)
    val fs = fsOf(spark, rootP)
    val existing = versionsOf(fs, rootP)
    val next = (existing.map(_._1) :+ 0).max + 1
    val vdir = new Path(rootP, s"v$next")
    parts.foreach { case (name, df) =>
      df.write.mode("overwrite").parquet(new Path(vdir, name).toString)
    }
    fs.create(new Path(vdir, Done), true).close()
    val tmp = new Path(rootP, s"$Marker.v$next.tmp")
    val out = fs.create(tmp, true)
    try out.write(s"v$next".getBytes("UTF-8")) finally out.close()
    val marker = new Path(rootP, Marker)
    if (fs.exists(marker)) fs.delete(marker, false)
    fs.rename(tmp, marker)
    existing.foreach { case (_, p) =>
      try fs.delete(p, true) catch { case _: Exception => () }
    }
  }

  /** Resolve the directory holding the committed snapshot's parts:
    * the `_LATEST` version if usable, else the highest `_DONE` version,
    * else `root` itself (legacy un-versioned layout).
    */
  def resolveDir(spark: SparkSession, root: String): String = {
    val rootP = new Path(root)
    val fs = fsOf(spark, rootP)
    def complete(p: Path) = fs.exists(new Path(p, Done))
    val marker = new Path(rootP, Marker)
    val fromMarker =
      if (!fs.exists(marker)) None
      else {
        val in = fs.open(marker)
        val name =
          try scala.io.Source.fromInputStream(in, "UTF-8").mkString.trim
          finally in.close()
        val p = new Path(rootP, name)
        if (name.nonEmpty && name.forall(c => c.isLetterOrDigit) &&
          fs.exists(p) && complete(p)) Some(p.toString)
        else None
      }
    fromMarker.getOrElse {
      val done = versionsOf(fs, rootP).filter(v => complete(v._2))
      if (done.nonEmpty) done.maxBy(_._1)._2.toString else root
    }
  }
}
