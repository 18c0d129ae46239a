package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Bucketed-table helpers — the shuffle-elimination story for repeated
  * big-big joins at 100 TB (SURVEY §7.1: "bucketing for co-located
  * joins").
  *
  * Writing both fact tables bucketed by the join key (same bucket
  * count) makes every subsequent equi-join on that key exchange-free:
  * each task reads matching bucket files from both sides. The write
  * pays one shuffle ONCE; every downstream join, groupBy, or
  * `dropDuplicates` on the bucket key then skips its exchange —
  * the right trade whenever a fact is joined more often than it is
  * rewritten. BucketingSpec asserts the exchange-free plan.
  */
object Bucketing {

  /** Write `df` as a bucketed managed table (sorted within buckets for
    * sort-merge-ready reads). */
  def writeBucketed(df: DataFrame, table: String, buckets: Int,
      keys: Seq[String]): Unit =
    // repartition on the bucket keys first: otherwise every input task
    // opens a writer per bucket (tasks x buckets small files) and
    // multi-file buckets forfeit the sortBy guarantee downstream
    df.repartition(buckets, keys.map(df.col): _*)
      .write
      .mode(SaveMode.Overwrite)
      .bucketBy(buckets, keys.head, keys.tail: _*)
      .sortBy(keys.head, keys.tail: _*)
      .format("parquet")
      .saveAsTable(table)

  /** Join two same-bucketed tables on their bucket keys; the physical
    * plan contains no Exchange for either side. */
  def coLocatedJoin(spark: SparkSession, leftTable: String, rightTable: String,
      keys: Seq[String]): DataFrame =
    spark.table(leftTable).join(spark.table(rightTable), keys)

  /** Drop any stale version of `table` — catalog entry AND warehouse
    * directory (an in-memory catalog forgets its tables across JVMs
    * but the directories persist, and saveAsTable(Overwrite) refuses a
    * dir it has no catalog entry for) — then write fresh. The location
    * comes from the catalog's own path resolution (not warehouse-dir
    * string munging), so non-default databases, URI-escaped paths, and
    * non-local warehouses all clean correctly. */
  def rewriteBucketed(df: DataFrame, table: String, buckets: Int,
      keys: Seq[String]): Unit = {
    dropManaged(df.sparkSession, table)
    writeBucketed(df, table, buckets, keys)
  }

  /** Drop a managed table AND its warehouse directory (an in-memory
    * catalog forgets its tables across JVMs but the directories
    * persist, and a managed-table write refuses a location it has no
    * catalog entry for). Shared by the bucketed rewrites and the
    * streaming probe's sink table. */
  def dropManaged(spark: SparkSession, table: String): Unit = {
    spark.sql(s"DROP TABLE IF EXISTS `$table`")
    val loc = new org.apache.hadoop.fs.Path(
      spark.sessionState.catalog.defaultTablePath(
        org.apache.spark.sql.catalyst.TableIdentifier(table)))
    val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(loc)) fs.delete(loc, true): Unit
  }

  /** Digest of a source table's file listing — qualified root path +
    * per-file (relative path, size, mtime) — for [[ensureBucketed]]'s
    * freshness decision. None (missing/unreadable) => caller rebuilds,
    * the safe direction. Same contract as the served ANN index's
    * corpus fingerprint. */
  def sourceFingerprint(spark: SparkSession, path: String): Option[String] =
    try {
      val root = new org.apache.hadoop.fs.Path(path)
      val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (!fs.exists(root)) None
      else {
        val rootStr = fs.makeQualified(root).toString
        val perFile = scala.collection.mutable.ArrayBuffer.empty[String]
        var n = 0
        if (fs.getFileStatus(root).isDirectory) {
          val it = fs.listFiles(root, true)
          while (it.hasNext) {
            val st = it.next()
            n += 1
            perFile += s"${st.getPath.toString.stripPrefix(rootStr)}#${st.getLen}#${st.getModificationTime}"
          }
        } else {
          val st = fs.getFileStatus(root)
          n = 1
          perFile += s"#${st.getLen}#${st.getModificationTime}"
        }
        if (n == 0) None
        else Some(rootStr + "@" + Integer.toHexString(
          scala.util.hashing.MurmurHash3.orderedHash(perFile.sorted.toSeq)))
      }
    } catch { case scala.util.control.NonFatal(_) => None }

  /** Stamps of bucket tables this JVM has built: table -> stamp.
    * In-JVM only, deliberately: cross-JVM reuse would require
    * re-registering the bucket spec in a fresh in-memory catalog,
    * and a rebuild is the safe answer there. */
  private val builtStamps = scala.collection.concurrent.TrieMap.empty[String, String]
  private[graft] def resetBuiltStamps(): Unit = builtStamps.clear()
  /** Observability probe for the spec: rebuilds performed by
    * [[ensureBucketed]] (same pattern as Tables.listingWalks). */
  private[graft] val ensureRebuilds = new java.util.concurrent.atomic.AtomicLong

  /** Build `table` from `df` only when this JVM has not already built
    * it from identical source state — the production bucketing shape:
    * a fact is bucketed when it is (re)loaded, then joined many times
    * at rest; paying the bucket shuffle once per join would cancel the
    * point of bucketing. `fingerprint` (from [[sourceFingerprint]])
    * keys the decision: None always rebuilds, a changed source
    * fingerprint (regenerated table, different sfDir in the same JVM)
    * rebuilds, an unchanged one skips. Serialized in-JVM; concurrent
    * cross-process builders of the SAME warehouse are out of contract
    * (as with the served ANN index, production serializes table
    * maintenance in the scheduler). */
  def ensureBucketed(df: DataFrame, table: String, buckets: Int,
      keys: Seq[String], fingerprint: Option[String]): Unit = synchronized {
    val stamp = fingerprint.map(fp =>
      s"v1#b$buckets#k${keys.mkString(",")}#$fp")
    val fresh = stamp.exists(s => builtStamps.get(table).contains(s)) &&
      df.sparkSession.catalog.tableExists(table)
    if (!fresh) {
      ensureRebuilds.incrementAndGet(): Unit
      rewriteBucketed(df, table, buckets, keys)
      stamp match {
        case Some(s) => builtStamps(table) = s
        case None    => builtStamps.remove(table): Unit
      }
    }
  }
}
