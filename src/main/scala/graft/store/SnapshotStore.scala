package graft.store

import java.nio.file.{Files, Path, Paths, StandardCopyOption, StandardOpenOption}
import java.util.concurrent.ConcurrentHashMap
import java.util.concurrent.locks.ReentrantLock

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Versioned copy-on-write table store — the Spark-side replacement for the
  * reference's mutable Redshift table.
  *
  * The reference mutates one warehouse table in place under an exclusive
  * lock (`BEGIN; LOCK TABLE … IN EXCLUSIVE MODE; …; COMMIT;`,
  * lambda/lambda_function.py:266-273). Spark tables are immutable, so each
  * mutation produces a new immutable snapshot version and atomically swaps a
  * pointer:
  *
  * {{{
  *   root/<table>/v00001/          parquet snapshot (immutable)
  *   root/<table>/v00002/
  *   root/<table>/LATEST           pointer file, atomically replaced
  * }}}
  *
  * Guarantees:
  *  - readers always see a complete snapshot (the pointer flips only after
  *    the parquet write finished),
  *  - writers serialize per table (JVM lock here ≙ the reference's
  *    LOCK TABLE; on a real multi-driver deployment the lock would live in a
  *    catalog service — the snapshot layout itself needs no change),
  *  - old versions remain readable (time travel / schema-evolution history,
  *    SURVEY §7.4 item 3).
  *
  * Snapshots are written sorted within partitions by the sort key
  * (≙ `SORTKEY(s_no)`, ddl_create_tables.sql:26) so parquet row-group
  * min/max stats prune point lookups (P4) the way Redshift zone maps did.
  */
final class SnapshotStore(rootDir: String, spark: SparkSession) {

  private val root: Path = Paths.get(rootDir)
  private val locks = new ConcurrentHashMap[String, ReentrantLock]()

  private def lockFor(table: String): ReentrantLock =
    locks.computeIfAbsent(table, _ => new ReentrantLock())

  private def tableDir(table: String): Path = root.resolve(table)
  private def pointer(table: String): Path = tableDir(table).resolve("LATEST")
  private def versionDir(table: String, v: Long): Path =
    tableDir(table).resolve(f"v$v%05d")

  private[store] def session: SparkSession = spark
  private[store] def versionDirOf(table: String, v: Long): Path =
    versionDir(table, v)

  /** The schema recorded at commit time for `version`, if present —
    * shared by loadVersion and ZoneMap.prunedScan so both read paths
    * plan without a parquet footer-inference job. */
  private[store] def recordedSchema(table: String, version: Long)
      : Option[org.apache.spark.sql.types.StructType] =
    metaForVersion(table, version).get(SchemaKey).map { s64 =>
      val json = new String(java.util.Base64.getDecoder.decode(s64), "UTF-8")
      org.apache.spark.sql.types.DataType.fromJson(json)
        .asInstanceOf[org.apache.spark.sql.types.StructType]
    }

  /** Current version number, 0 if the table does not exist. */
  def currentVersion(table: String): Long = {
    val p = pointer(table)
    if (Files.exists(p)) Files.readString(p).trim.toLong else 0L
  }

  def exists(table: String): Boolean = currentVersion(table) > 0

  /** Every table with a committed snapshot (a LATEST pointer) under the
    * store root, sorted — the enumeration [[graft.Graft.maintainAll]]
    * dispatches over. */
  def tables: Seq[String] = {
    if (!Files.exists(root)) return Seq.empty
    // Files.list holds a directory fd until closed — maintainAll runs
    // from schedulers, so leaked fds would accumulate until GC.
    val s = Files.list(root)
    try s.iterator().asScala
      .filter(p => Files.isDirectory(p) && Files.exists(p.resolve("LATEST")))
      .map(_.getFileName.toString).toSeq.sorted
    finally s.close()
  }

  /** All committed versions, ascending (history stays readable). */
  def versions(table: String): Seq[Long] = {
    val d = tableDir(table)
    if (!Files.exists(d)) Seq.empty
    else {
      val s = Files.list(d)
      try s.iterator().asScala
        .map(_.getFileName.toString)
        .filter(_.startsWith("v"))
        .map(_.drop(1).toLong).toSeq.sorted
      finally s.close()
    }
  }

  /** Load the latest snapshot. */
  def load(table: String): DataFrame = loadVersion(table, currentVersion(table))

  /** Time travel: load a specific committed version.
    *
    * The version's schema was recorded at commit time, so the read plans
    * WITHOUT a parquet footer-inference job — each schema job is a
    * driver round trip that multiplies under host degradation, and the
    * index append paths pay one per snapshot touched (r9 verdict item
    * 1). Pre-upgrade version dirs (no recorded schema) fall back to
    * inference. */
  def loadVersion(table: String, version: Long): DataFrame = {
    require(version > 0, s"table $table has no committed snapshot")
    val dir = versionDir(table, version).toString
    recordedSchema(table, version) match {
      case Some(schema) => spark.read.schema(schema).parquet(dir)
      case None         => spark.read.parquet(dir)
    }
  }

  def loadIfExists(table: String): Option[DataFrame] =
    if (exists(table)) Some(load(table)) else None

  /** Commit `df` as the next version of `table` and return that version.
    * Sorted within partitions by `sortKey` when given (SORTKEY analog).
    *
    * `meta` entries are merged over the previous version's metadata and
    * written INSIDE the new version directory before the pointer flip —
    * so metadata is exactly as atomic and durable as the data it rides
    * with (used for streaming batch-id watermarks, ST1 exactly-once).
    *
    * `statsCols` opts the version into a file-level zone map ([[ZoneMap]]):
    * after the parquet write, per-file min/max for those columns are
    * harvested from the freshly written footers (footer-only — no second
    * data pass, no Spark job at local file counts) into a `_graft_zones`
    * sidecar, written before the pointer flip so it shares the snapshot's
    * atomicity. `bloomCols` turns on the parquet writer's per-column
    * bloom sketches ([[BloomSkip]] — for hash-uniform keys zones cannot
    * prune; built inline by the writer, no extra pass). Empty (the
    * defaults) cost nothing. */
  def commit(table: String, df: DataFrame, sortKey: Option[String] = None,
             meta: Map[String, String] = Map.empty,
             statsCols: Seq[String] = Nil,
             bloomCols: Seq[String] = Nil,
             metaDeferred: () => Map[String, String] = () => Map.empty): Long = {
    val l = lockFor(table)
    l.lock()
    try {
      val next = currentVersion(table) + 1
      val dest = versionDir(table, next)
      // Crash recovery: a writer that died after the parquet write but
      // before the pointer flip leaves an orphaned next-version directory.
      // Anything past LATEST is by construction an aborted commit (the
      // pointer flips last, under this lock), so clear it rather than wedge
      // every future commit on SaveMode.ErrorIfExists — the liveness half
      // of exactly-once replay (the replayed batch must be able to land).
      if (Files.exists(dest)) deleteRecursively(dest)
      val sorted = sortKey match {
        case Some(k) if df.columns.contains(k) => df.sortWithinPartitions(k)
        case _ => df
      }
      sorted.write.mode(SaveMode.ErrorIfExists)
        .options(BloomSkip.writeOptions(bloomCols.distinct))
        .parquet(dest.toString)
      if (statsCols.nonEmpty) ZoneMap.writeSidecar(dest, statsCols.distinct, spark)
      // Record THIS version's schema (all-nullable, matching what parquet
      // inference would report) so loadVersion skips the footer job. Set
      // fresh every commit — never carried forward — so schema evolution
      // (M6) stays per-version correct.
      val schema64 = java.util.Base64.getEncoder.encodeToString(
        allNullable(sorted.schema).json.getBytes("UTF-8"))
      // `metaDeferred` runs AFTER the parquet write, before the pointer
      // flip: metadata whose values ride the write pass itself (the
      // ObservedStats single-pass nDocs/sumDl) lands as atomically as
      // the eager map. Same crash window as `meta` — a writer dying
      // here leaves an orphaned dir, cleared by the next commit.
      val merged = latestMeta(table) ++ meta ++ metaDeferred() +
        (SchemaKey -> schema64)
      writeMeta(dest, merged)
      writePointerAtomically(table, next)
      next
    } finally l.unlock()
  }

  private val SchemaKey = "_graft.schema64"

  private def allNullable(s: org.apache.spark.sql.types.StructType)
      : org.apache.spark.sql.types.StructType = {
    import org.apache.spark.sql.types._
    def go(dt: DataType): DataType = dt match {
      case st: StructType =>
        StructType(st.fields.map(f =>
          f.copy(dataType = go(f.dataType), nullable = true)))
      case at: ArrayType =>
        at.copy(elementType = go(at.elementType), containsNull = true)
      case mt: MapType =>
        mt.copy(valueType = go(mt.valueType), valueContainsNull = true)
      case other => other
    }
    go(s).asInstanceOf[StructType]
  }

  private def metaFile(dir: Path): Path = dir.resolve("_graft_meta")

  private def writeMeta(versionDir: Path, meta: Map[String, String]): Unit = {
    val body = meta.toSeq.sorted.map { case (k, v) => s"$k=$v" }.mkString("\n")
    Files.writeString(metaFile(versionDir), body,
      StandardOpenOption.CREATE, StandardOpenOption.TRUNCATE_EXISTING)
  }

  /** Table metadata as of the latest committed version (empty if none).
    * Carried forward by every commit, so a key survives unrelated writes. */
  def latestMeta(table: String): Map[String, String] =
    metaForVersion(table, currentVersion(table))

  /** Table metadata as of a SPECIFIC committed version. Version dirs are
    * immutable once the pointer has flipped, so resolving a version number
    * once and reading both its data and its meta gives readers a
    * CONSISTENT lock-free view — two independent "latest" reads could
    * straddle a concurrent commit and pair one version's data with
    * another's metadata. */
  def metaForVersion(table: String, version: Long): Map[String, String] = {
    if (version == 0) Map.empty
    else {
      val f = metaFile(versionDir(table, version))
      if (!Files.exists(f)) Map.empty
      else Files.readString(f).linesIterator.filter(_.contains("="))
        .map { l => val i = l.indexOf('='); l.take(i) -> l.drop(i + 1) }.toMap
    }
  }

  /** Run `fn` on the current snapshot and commit its result as the next
    * version — the `BEGIN … COMMIT` read-modify-write transaction analog.
    * The per-table lock makes concurrent transactions serialize, so
    * max+1 key generation (M1/M2) is race-free like the reference's
    * LOCK TABLE discipline. */
  def transact(table: String, sortKey: Option[String] = None)
              (fn: Option[DataFrame] => DataFrame): Long = {
    val l = lockFor(table)
    l.lock()
    try commit(table, fn(loadIfExists(table)), sortKey)
    finally l.unlock()
  }

  /** Abortable transaction: `fn` sees the locked snapshot and returns
    * Right(df) to commit or Left(a) to abort (nothing is written). Guards
    * evaluated inside `fn` see the SAME snapshot the commit builds on —
    * the check-then-act window of guard-outside-transact (two concurrent
    * creates both passing a duplicate-name check, the exact race the
    * reference's `LOCK TABLE` closes, lambda_function.py:267-272) cannot
    * occur. */
  def transactEither[A](table: String, sortKey: Option[String] = None,
                        meta: Map[String, String] = Map.empty)
              (fn: Option[DataFrame] => Either[A, DataFrame]): Either[A, Long] = {
    val l = lockFor(table)
    l.lock()
    try fn(loadIfExists(table)) match {
      case Left(a)   => Left(a)
      case Right(df) => Right(commit(table, df, sortKey, meta))
    } finally l.unlock()
  }

  /** Like transactEither, but `fn` also returns the metadata entries to
    * commit — for metadata that must be COMPUTED under the table lock
    * (e.g. a delta chain's parent-version list, which a concurrent commit
    * would invalidate if read before locking). */
  def transactWith[A](table: String, sortKey: Option[String] = None)
      (fn: Option[DataFrame] => Either[A, (DataFrame, Map[String, String])])
      : Either[A, Long] = {
    val l = lockFor(table)
    l.lock()
    try fn(loadIfExists(table)) match {
      case Left(a) => Left(a)
      case Right((df, meta)) => Right(commit(table, df, sortKey, meta))
    } finally l.unlock()
  }

  /** [[transactWith]] for callers that do NOT need the locked snapshot
    * handed to them (the delta-chain index appends read their table via
    * currentVersion/metaForVersion/loadVersion themselves): skips the
    * eager loadIfExists, whose schema-inference job was pure overhead —
    * one fewer driver round trip per append. */
  def transactMeta[A](table: String, sortKey: Option[String] = None,
                      statsCols: Seq[String] = Nil,
                      bloomCols: Seq[String] = Nil)
      (fn: => Either[A, (DataFrame, Map[String, String])])
      : Either[A, Long] = {
    val l = lockFor(table)
    l.lock()
    try fn match {
      case Left(a) => Left(a)
      case Right((df, meta)) =>
        Right(commit(table, df, sortKey, meta, statsCols, bloomCols))
    } finally l.unlock()
  }

  /** [[transactMeta]] whose Right additionally carries a DEFERRED
    * metadata thunk, evaluated after the commit's parquet write — for
    * metadata computed BY the write pass itself (ObservedStats: the
    * nDocs/sumDl observation resolves only once the write job has
    * streamed the tokenized rows). */
  def transactMetaDeferred[A](table: String, sortKey: Option[String] = None,
                              statsCols: Seq[String] = Nil,
                              bloomCols: Seq[String] = Nil)
      (fn: => Either[A, (DataFrame, Map[String, String], () => Map[String, String])])
      : Either[A, Long] = {
    val l = lockFor(table)
    l.lock()
    try fn match {
      case Left(a) => Left(a)
      case Right((df, meta, deferred)) =>
        Right(commit(table, df, sortKey, meta, statsCols, bloomCols, deferred))
    } finally l.unlock()
  }

  private def writePointerAtomically(table: String, version: Long): Unit = {
    val tmp = tableDir(table).resolve(s".LATEST.tmp.${Thread.currentThread().getId}")
    Files.createDirectories(tableDir(table))
    Files.writeString(tmp, version.toString,
      StandardOpenOption.CREATE, StandardOpenOption.TRUNCATE_EXISTING)
    Files.move(tmp, pointer(table),
      StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)
  }

  /** Drop all versions strictly older than `keepFrom` (vacuum). NOT for
    * delta-chained index tables — a chained version references older dirs;
    * use VectorIndex.vacuumIndex there, which keeps the live chain. */
  def vacuum(table: String, keepFrom: Long): Unit = {
    val l = lockFor(table)
    l.lock()
    try versions(table).filter(_ < keepFrom).foreach { v =>
      deleteRecursively(versionDir(table, v))
    } finally l.unlock()
  }

  /** Drop a specific set of committed versions (chain-aware vacuum
    * support). The current version is never dropped; the caller computes
    * which versions are safe (VectorIndex.vacuumIndex keeps the live
    * delta chain). */
  def dropVersions(table: String, drop: Set[Long]): Unit = {
    val l = lockFor(table)
    l.lock()
    try {
      val cur = currentVersion(table)
      versions(table).filter(v => drop.contains(v) && v != cur)
        .foreach(v => deleteRecursively(versionDir(table, v)))
    } finally l.unlock()
  }

  private def deleteRecursively(p: Path): Unit = {
    if (Files.isDirectory(p)) {
      val s = Files.list(p)
      // materialize before deleting: mutating the directory while its
      // stream is open is unspecified, and the stream fd must close
      val children = try s.iterator().asScala.toList finally s.close()
      children.foreach(deleteRecursively)
    }
    Files.deleteIfExists(p)
  }
}
