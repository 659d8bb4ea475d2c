package graft.pipeline

import org.apache.spark.sql.SparkSession

/** GENERATIONAL index root — the manifest-flip lifecycle shared by every
  * persisted index in this library (IVF/IVF-PQ vector indexes, the
  * MinHash-LSH band index):
  *
  * {{{
  * root/
  *   _manifest/v00000001   (text: the current generation's dir name)
  *   gen-00000001/         (a complete index dir, sidecar(s) inside)
  *   gen-00000002/
  * }}}
  *
  * The manifest is VERSIONED, not overwritten: installing a new
  * generation creates ONE new file (`create(..., overwrite=false)` — a
  * single atomic visibility event on HDFS-like stores, and a new key on
  * object stores, where delete+rewrite of a single pointer file would
  * have a read-nothing window). Readers list `_manifest`, take the
  * HIGHEST version, and resolve its generation — a reader racing a swap
  * sees either the old or the new index, never a torn one (the
  * generation dir and its sidecars are fully written BEFORE the manifest
  * entry exists). Old generations stay readable until
  * [[retireOldGenerations]] deletes them — the swap and the retire are
  * separate steps on purpose (in-flight queries resolved the old path;
  * retire after their horizon passes). */
private[pipeline] object IndexManifest {

  private val ManifestDir = "_manifest"
  private val GenPrefix = "gen-"
  private val VersionRe = "v(\\d{8})".r
  private val GenRe = "gen-(\\d{8})".r

  private def fs(spark: SparkSession, path: String) = {
    val p = new org.apache.hadoop.fs.Path(path)
    (p.getFileSystem(spark.sparkContext.hadoopConfiguration), p)
  }

  /** (version, generation dir name) pairs present in the manifest,
    * ascending; empty if the root has no manifest yet. */
  def entries(spark: SparkSession, rootPath: String): Seq[(Int, String)] = {
    val (f, p) = fs(spark, s"$rootPath/$ManifestDir")
    if (!f.exists(p)) Seq.empty
    else f.listStatus(p).toSeq.flatMap { st =>
      st.getPath.getName match {
        case VersionRe(v) =>
          val in = f.open(st.getPath)
          val gen = try scala.io.Source.fromInputStream(in, "UTF-8").mkString.trim
            finally in.close()
          Some((v.toInt, gen))
        case _ => None
      }
    }.sortBy(_._1)
  }

  /** Current index DATA path under a versioned root; `buildHint` names
    * the entry point that creates one (error-message ergonomics). */
  def currentPath(spark: SparkSession, rootPath: String, buildHint: String): String = {
    val es = entries(spark, rootPath)
    require(es.nonEmpty,
      s"no $ManifestDir at $rootPath — not a versioned index root " +
        s"(build one with $buildHint)")
    s"$rootPath/${es.last._2}"
  }

  /** Install `genName` as the current generation: one no-overwrite
    * create of the next manifest version file. Throws if a concurrent
    * installer won the version (the caller's generation dir remains,
    * unreferenced — safe to retry or retire). */
  def installGeneration(spark: SparkSession, rootPath: String,
      genName: String): Unit = {
    val next = entries(spark, rootPath).lastOption.map(_._1).getOrElse(0) + 1
    val (f, p) = fs(spark, f"$rootPath/$ManifestDir/v$next%08d")
    val out = f.create(p, false) // overwrite=false: the atomicity guarantee
    try out.write(genName.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
  }

  /** Name of the next generation dir under the root. Regex, not a bare
    * toInt on the suffix: a stray `gen-tmp` scratch dir under the root
    * must not kill every future build. */
  def nextGenName(spark: SparkSession, rootPath: String): String = {
    val (f, p) = fs(spark, rootPath)
    val existing = if (!f.exists(p)) Seq.empty else f.listStatus(p).toSeq
      .map(_.getPath.getName).collect { case GenRe(n) => n.toInt }
    f"$GenPrefix${existing.maxOption.getOrElse(0) + 1}%08d"
  }

  /** Delete every generation dir STRICTLY OLDER than the current one
    * (the retire half of the swap). Returns the deleted paths.
    * Strictly-older, not merely non-current: a concurrent builder may
    * have fully written a HIGHER generation it has not yet installed —
    * deleting it here would leave its imminent manifest flip pointing
    * at a missing directory. Newer-than-current dirs are either about
    * to be installed or are crash leftovers; crash leftovers are
    * reclaimed on a later retire, once a newer generation installs
    * above them. */
  def retireOldGenerations(spark: SparkSession, rootPath: String,
      buildHint: String): Seq[String] = {
    val current = currentPath(spark, rootPath, buildHint)
    val currentGen = current.substring(current.lastIndexOf('/') + 1) match {
      case GenRe(n) => n.toInt
      case other => throw new IllegalStateException(
        s"manifest points at a non-generation dir: $other")
    }
    val (f, p) = fs(spark, rootPath)
    f.listStatus(p).toSeq
      .map(_.getPath)
      .filter(gp => gp.getName match {
        case GenRe(n) => n.toInt < currentGen
        case _ => false
      })
      .map { gp => f.delete(gp, true); s"$rootPath/${gp.getName}" }
  }
}
