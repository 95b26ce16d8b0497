package graft.store

import java.nio.file.{Files, Path}

import scala.jdk.CollectionConverters._

import org.apache.hadoop.conf.Configuration
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile

/** Per-file bloom-filter skipping — the membership complement of
  * [[ZoneMap]] for HASH-UNIFORM keys.
  *
  * Zone maps prune on clustered/sortable columns; a fingerprint or band
  * key is uniform over the hash domain, so every file's [min,max] spans
  * everything and zones can never skip (ZoneMap scaladoc). Parquet's
  * column bloom filters cover exactly this case: the writer records a
  * compact membership sketch per row group, and an equality/IN probe
  * can rule a file out WITHOUT reading any data pages. Commits opt in
  * per column ([[SnapshotStore.commit]] `bloomCols` — plumbed to the
  * parquet writer's `parquet.bloom.filter.enabled#col` switch, no
  * second pass over the data), and [[filesMaybeContaining]] probes the
  * written sketches at read time.
  *
  * Strictly an optimization, like zones: a bloom answers "definitely
  * absent" or "maybe present" — surviving files still run the real
  * join/filter, and files without a sketch (pre-bloom versions, other
  * writers) are conservatively kept. Cost shape: probing opens footer +
  * sketch (~KBs) per file instead of streaming the file's rows —
  * O(files × probes) driver-side hashing vs O(corpus) executor scan.
  * The win case is the TRICKLE append: a small batch against a large
  * index where most files reject every probe and the collision scan
  * collapses to the handful of files that might actually collide. For
  * backfill-sized batches the broadcast-join scan stays the right
  * plan — gate on batch size, not always-on ([[FingerprintIndex]]
  * wires it behind `bloomProbeMaxKeys`). */
object BloomSkip {

  /** The parquet writer options enabling bloom sketches for `cols`
    * (merged into the commit's write options — the sketches are built
    * inline by the writer, no extra data pass).
    *
    * Sketch density is the whole game for multi-probe batches: a batch
    * of b probes keeps a file with probability 1-(1-p)^b, so p must sit
    * well under 1/b. Two knobs are co-designed here: the sketch budget
    * rises from parquet's 1 MB default to 4 MB, and the row-group size
    * drops 128→32 MB for bloom-indexed tables (narrow index rows pack
    * millions of keys per group — smaller groups mean fewer keys per
    * sketch AND finer row-group skipping for the scans that do run).
    * A 32 MB group of 16-byte rows holds ~2M keys → ≥16 bits/key →
    * p ≈ 0.1%, good to b ≈ 100-probe batches. */
  private[store] def writeOptions(cols: Seq[String]): Map[String, String] =
    if (cols.isEmpty) Map.empty
    else cols.map(c => s"parquet.bloom.filter.enabled#$c" -> "true").toMap +
      ("parquet.bloom.filter.max.bytes" -> (4 * 1024 * 1024).toString) +
      // parquet's adaptive sketch targets 1% FP by default — at 1% a
      // 5-probe batch over 64 files keeps ~3 false-positive files
      // (measured); 0.1% makes multi-probe batches clean.
      ("parquet.bloom.filter.fpp" -> "0.001") +
      ("parquet.block.size" -> (32 * 1024 * 1024).toString)

  private def dataFiles(dir: Path): Seq[Path] = {
    val s = Files.list(dir) // close the directory fd (trickle probes repeat)
    try s.iterator().asScala
      .filter { p =>
        val n = p.getFileName.toString
        n.endsWith(".parquet") && !n.startsWith("_") && !n.startsWith(".")
      }.toSeq.sortBy(_.getFileName.toString)
    finally s.close()
  }

  /** The files under `dir` that MIGHT contain any of `values` in long
    * column `column`, plus the total file count. A file is dropped only
    * when every row group has a bloom sketch for the column and every
    * sketch rejects every value; missing sketches keep the file.
    *
    * Sketches are CACHED across calls: the first probe of a file pays
    * the footer + sketch read (a few MB), every later probe is a pure
    * in-memory bitset check — the steady state a trickle ingest lives
    * in (probe per micro-batch against the same immutable version
    * dirs). Version dirs never change after the pointer flip, so the
    * cache needs no invalidation; it is dropped wholesale when it
    * crosses [[MaxCacheBytes]]. */
  def filesMaybeContaining(dir: Path, column: String,
                           values: Array[Long]): (Seq[Path], Int) = {
    val files = dataFiles(dir)
    if (values.isEmpty) return (Seq.empty, files.size)
    val kept = files.filter { f =>
      val ss = sketchesFor(f, column)
      ss.isEmpty || // no usable sketch layout → keep
        ss.exists(s => s == null || values.exists(v => s.findHash(s.hash(v))))
    }
    (kept, files.size)
  }

  // Sized for ~0.1%-FP sketches of a few hundred 32 MB row groups
  // (≈3 MB each): a 3 GB index's full sketch set is ~400 MB. The cap
  // only bounds pathological accumulation across many large tables.
  private val MaxCacheBytes = 2048L * 1024 * 1024
  private val cache = new java.util.concurrent.ConcurrentHashMap[
    String, Array[org.apache.parquet.column.values.bloomfilter.BloomFilter]]()
  private val cachedBytes = new java.util.concurrent.atomic.AtomicLong(0L)

  /** One entry per row group; `null` entries mean "this group has no
    * sketch — keep". A zero-length array means the file's layout is
    * unusable (column absent / unreadable footer) → always keep. */
  private def sketchesFor(file: Path, column: String)
      : Array[org.apache.parquet.column.values.bloomfilter.BloomFilter] = {
    val key = file.toAbsolutePath.toString + "#" + column
    val hit = cache.get(key)
    if (hit != null) return hit
    var reader: ParquetFileReader = null
    val loaded =
      try {
        reader = ParquetFileReader.open(HadoopInputFile.fromPath(
          new org.apache.hadoop.fs.Path(file.toUri), new Configuration()))
        val blocks = reader.getFooter.getBlocks.asScala.toArray
        val out = blocks.map { b =>
          b.getColumns.asScala.find(_.getPath.toDotString == column) match {
            case None => return cachePut(key, Array.empty) // schema drift
            case Some(cc) => reader.getBloomFilterDataReader(b).readBloomFilter(cc)
          }
        }
        if (blocks.isEmpty) Array.empty[org.apache.parquet.column.values.bloomfilter.BloomFilter]
        else out
      } catch { case _: Exception =>
        Array.empty[org.apache.parquet.column.values.bloomfilter.BloomFilter]
      } finally if (reader != null) reader.close()
    cachePut(key, loaded)
  }

  private def cachePut(key: String,
      v: Array[org.apache.parquet.column.values.bloomfilter.BloomFilter])
      : Array[org.apache.parquet.column.values.bloomfilter.BloomFilter] = {
    val bytes = v.map(s => if (s == null) 0L else s.getBitsetSize.toLong).sum
    if (cachedBytes.get() + bytes > MaxCacheBytes) {
      cache.clear(); cachedBytes.set(0L)
    }
    cache.put(key, v)
    cachedBytes.addAndGet(bytes)
    v
  }
}
