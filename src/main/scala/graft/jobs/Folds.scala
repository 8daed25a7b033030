package graft.jobs

/** The ONE fold-supersession protocol, shared by every store that
  * compacts a streaming directory ([[BuildTextIndex.compactStreamed]],
  * [[BuildSketchStore.compactStreamed]]) so their guarantees cannot
  * diverge. A fold records its streamed FILE SET in a `folded/<id>`
  * sidecar OUTSIDE every Spark-written directory (no overwrite or
  * consolidation can strip it), written FIRST so any fold that wrote
  * durable state is always retirable; a later fold whose file set is a
  * SUPERSET retires the stale fold's directories after its own write
  * commits, and a partial overlap that is not a superset refuses
  * loudly before any state changes (two folds that each own files the
  * other lacks cannot be reconciled).
  */
private[jobs] object Folds {

  def sidecarPath(outPath: String, id: String) =
    new org.apache.hadoop.fs.Path(s"$outPath/folded/$id")

  def writeSidecar(fs: org.apache.hadoop.fs.FileSystem, outPath: String,
      id: String, files: Seq[String]): Unit = {
    val out = fs.create(sidecarPath(outPath, id), true)
    try out.write((files.mkString("\n") + "\n").getBytes("UTF-8"))
    finally out.close()
  }

  def readSidecar(fs: org.apache.hadoop.fs.FileSystem,
      p: org.apache.hadoop.fs.Path): Set[String] = {
    val in = fs.open(p)
    try scala.io.Source.fromInputStream(in, "UTF-8")
      .getLines().filter(_.nonEmpty).toSet
    finally in.close()
  }

  /** Every fold sidecar of a store as (batchId, path): the `folded/`
    * files plus — when `legacyTableRoot` is given — any LEGACY r10
    * `_folded_files` still inside one of its batch directories (a
    * mid-migration crash counts once: the relocated copy wins).
    */
  def sidecars(fs: org.apache.hadoop.fs.FileSystem, outPath: String,
      legacyTableRoot: Option[String] = None)
      : Seq[(String, org.apache.hadoop.fs.Path)] = {
    val foldedRoot = new org.apache.hadoop.fs.Path(s"$outPath/folded")
    val relocated = (if (fs.exists(foldedRoot))
        fs.listStatus(foldedRoot).toSeq else Seq.empty)
      .filter(_.isFile).map(s => s.getPath.getName -> s.getPath)
    val legacy = legacyTableRoot.toSeq.flatMap { tr =>
      val root = new org.apache.hadoop.fs.Path(tr)
      (if (fs.exists(root)) fs.listStatus(root).toSeq else Seq.empty)
        .filter(s => s.isDirectory && s.getPath.getName.startsWith("batch="))
        .flatMap { s =>
          val p = new org.apache.hadoop.fs.Path(s.getPath, "_folded_files")
          if (fs.exists(p))
            Some(s.getPath.getName.stripPrefix("batch=") -> p)
          else None
        }
    }
    val seen = relocated.map(_._1).toSet
    relocated ++ legacy.filterNot { case (b, _) => seen(b) }
  }

  /** The supersession census for a fold about to be written: batch ids
    * whose file sets this fold covers (retire AFTER the new write
    * commits); refuses loudly on an unreconcilable partial overlap.
    */
  def superseded(fs: org.apache.hadoop.fs.FileSystem, outPath: String,
      id: String, mine: Set[String], op: String,
      legacyTableRoot: Option[String] = None): Seq[String] =
    sidecars(fs, outPath, legacyTableRoot).flatMap { case (b, sc) =>
      if (b == id) None
      else {
        val theirs = readSidecar(fs, sc)
        if (theirs.subsetOf(mine)) Some(b)
        else if (theirs.intersect(mine).nonEmpty)
          throw new IllegalStateException(
            s"$op: prior fold batch=$b shares " +
              s"${theirs.intersect(mine).size} streamed files with this fold " +
              "but also owns files this fold lacks — the two cannot be " +
              "reconciled; fold the union, or retire the streamed dir " +
              "between cycles as documented")
        else None
      }
    }
}
