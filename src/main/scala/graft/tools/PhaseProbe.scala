package graft.tools

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageCompleted, SparkListenerTaskEnd}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.{Sessions, Tables}
import graft.functions.{Dedup, TextFunctions => TF}
import graft.queries.ExtensionQueries
import graft.store._

/** Per-PHASE job/stage/task decomposition of the multi-phase fixtures
  * (build → delete → serve), for the r19 optimization round: BenchProfile
  * reports one counter row per QUERY; this tool breaks the heavy fixture
  * queries into their store-operation phases so the job budget can be
  * attributed (which phase pays which jobs) before and after a change.
  * Measurement only — never run by Bench/Verify.
  *
  * Usage: runMain graft.tools.PhaseProbe [fixture,...]
  * Env: SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS (BenchProfile contract).
  */
object PhaseProbe {
  private val jobs = new AtomicLong
  private val stages = new AtomicLong
  private val tasks = new AtomicLong
  private var spark: SparkSession = _

  private def drain(): Unit = {
    var i = 0
    while (i < 50 && spark.sparkContext.statusTracker.getActiveJobIds().nonEmpty) {
      Thread.sleep(100); i += 1
    }
    Thread.sleep(300)
  }

  private def phase[A](fixture: String, name: String)(body: => A): A = {
    drain()
    jobs.set(0); stages.set(0); tasks.set(0)
    spark.sparkContext.setJobDescription(s"$fixture/$name")
    val t0 = System.nanoTime()
    val r = body
    drain()
    val ms = (System.nanoTime() - t0) / 1000000
    println(s"PHASE f=$fixture p=$name jobs=${jobs.get} stages=${stages.get} " +
      s"tasks=${tasks.get} wall_ms=$ms")
    r
  }

  private def docs(d: String) = ExtensionQueries.docs(spark, d)
  private def embs(d: String) = ExtensionQueries.embs(spark, d)
  private def qvecs(d: String) = ExtensionQueries.queryVectors(spark, d)

  private def textDeleteIds(d: String): DataFrame =
    docs(d).filter(col("doc_id") % 7 === 3 &&
      size(TF.tokens(lower(col("text")))) > 0)
      .select(col("doc_id"))

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val filter = args.toSeq.flatMap(_.split(',')).map(_.trim).filter(_.nonEmpty)
    def selected(name: String): Boolean =
      filter.isEmpty || filter.exists(name.contains)
    spark = Sessions.local(cpus, "graft-phaseprobe")
    Tables.names.foreach(n => Tables.load(spark, sfDir, n).count())
    val verbose = sys.env.get("SPARK_GRAFT_PROBE_VERBOSE").contains("1")
    val listener = new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = {
        jobs.incrementAndGet()
        if (verbose) {
          val site = j.stageInfos.lastOption.map(_.name).getOrElse("?")
          val desc = Option(j.properties)
            .flatMap(p => Option(p.getProperty("spark.job.description")))
            .getOrElse("")
          println(s"JOB id=${j.jobId} stages=${j.stageInfos.length} " +
            s"site=$site desc=$desc")
        }
      }
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit =
        stages.incrementAndGet()
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit =
        tasks.incrementAndGet()
    }
    spark.sparkContext.addSparkListener(listener)
    val d = sfDir

    if (selected("retrieve_bm25_deleted")) {
      val f = "retrieve_bm25_deleted"
      val ds = docs(d).select(col("doc_id"), col("text"))
      val store = new SnapshotStore(tmp("pp-bm25del"), spark)
      phase(f, "build")(PhraseIndex.build(store, "docs_text", ds, "text", "doc_id"))
      phase(f, "delete")(TextIndex.deleteDocs(store, "docs_text", textDeleteIds(d)))
      val qs = ds.filter(col("doc_id") < 3)
        .select(col("doc_id").as("query_id"), col("text").as("qtext"))
      phase(f, "serve")(TextIndex.query(store, "docs_text", qs, "query_id", "qtext", k = 10)
        .select(col("query_id"), col("neighbor_id"), col("rank")).count())
    }

    if (selected("retrieve_phrase_deleted")) {
      val f = "retrieve_phrase_deleted"
      val ds = docs(d).select(col("doc_id"), col("text"))
      val store = new SnapshotStore(tmp("pp-phdel"), spark)
      phase(f, "build")(PhraseIndex.build(store, "docs_text", ds, "text", "doc_id"))
      phase(f, "delete")(TextIndex.deleteDocs(store, "docs_text", textDeleteIds(d)))
      val qs = ds.filter(col("doc_id").isin(0L, 10L, 42L))
        .select(col("doc_id").as("query_id"),
          array_join(slice(TF.tokens(lower(col("text"))), 1, 3), " ").as("ph"))
        .filter(size(TF.tokens(col("ph"))) === 3)
      phase(f, "serve")(PhraseIndex.phraseQuery(store, "docs_text", qs, "query_id", "ph").count())
    }

    if (selected("dedup_incr_fp_deleted")) {
      val f = "dedup_incr_fp_deleted"
      val base = docs(d).filter(col("doc_id") < 500)
        .select(col("doc_id"), col("text"))
      val store = new SnapshotStore(tmp("pp-fpdel"), spark)
      phase(f, "build")(FingerprintIndex.build(store, "docs_fp", base, "text", "doc_id"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(TF.fingerprint(col("text")))
      val delIds = base.withColumn("gsz", count(lit(1)).over(w))
        .filter(col("gsz") === 1 && col("doc_id") % 31 === 5)
        .select(col("doc_id").as("id"))
      phase(f, "delete")(FingerprintIndex.deleteDocs(store, "docs_fp", delIds))
      phase(f, "resolve")(FingerprintIndex.resolve(store, "docs_fp",
        base.select((col("doc_id") + 20000).as("doc_id"), col("text")),
        "text", "doc_id").count())
    }

    if (selected("dedup_minhash_deleted")) {
      val f = "dedup_minhash_deleted"
      val base = docs(d).filter(col("doc_id") < 300)
        .select(col("doc_id"), col("text"))
      val store = new SnapshotStore(tmp("pp-mhdel"), spark)
      phase(f, "build")(DedupIndex.build(store, "docs_minhash", base, "text", "doc_id"))
      phase(f, "delete")(DedupIndex.deleteDocs(store, "docs_minhash",
        base.filter(col("doc_id") % 17 === 2).select(col("doc_id").as("id"))))
      phase(f, "pairs")(DedupIndex.pairsForCommitted(store, "docs_minhash",
        base.select(col("doc_id").as("id")), threshold = 0.5).count())
    }

    if (selected("dedup_simhash_deleted")) {
      val f = "dedup_simhash_deleted"
      val hashed = docs(d)
        .filter(col("doc_id") < 300 && size(TF.tokens(col("text"))) > 0)
        .select(col("doc_id").as("id"), Dedup.simhash64Md5(col("text")).as("sh64"))
      val store = new SnapshotStore(tmp("pp-shdel"), spark)
      phase(f, "build")(SimHashIndex.build(store, "docs_simhash", hashed,
        nBlocks = Dedup.simhashAutoBlocks(300L, 6), maxHamming = 6))
      phase(f, "delete")(SimHashIndex.deleteDocs(store, "docs_simhash",
        hashed.filter(col("id") % 17 === 2).select(col("id"))))
      phase(f, "pairs")(SimHashIndex.pairsForCommitted(store, "docs_simhash",
        hashed.select(col("id"))).count())
    }

    if (selected("dedup_embed_deleted")) {
      val f = "dedup_embed_deleted"
      val base = embs(d).filter(col("vec_id") < 300)
        .select(col("vec_id").as("id"), col("embedding").as("vec"))
      val planted = embs(d).filter(col("vec_id") === 0)
      val p1 = planted.select((col("vec_id") + 10300).as("id"), col("embedding").as("vec"))
      val p2 = planted.select((col("vec_id") + 10301).as("id"), col("embedding").as("vec"))
      val store = new SnapshotStore(tmp("pp-embdel"), spark)
      phase(f, "build")(EmbedIndex.build(store, "vecs_embed", base.unionByName(p2),
        dim = 64, threshold = 0.99, expectedCorpus = 360L))
      phase(f, "delete")(EmbedIndex.deleteDocs(store, "vecs_embed", p2.select(col("id"))))
      phase(f, "append")(EmbedIndex.appendBatchOnce(store, "vecs_embed", p1,
        streamId = "verify", batchId = 0L).get.count())
    }

    if (selected("semdedup_deleted")) {
      val f = "semdedup_deleted"
      val base = embs(d).filter(col("vec_id") < 300)
        .select(col("vec_id").as("id"), col("embedding").as("vec"))
      val planted = embs(d).filter(col("vec_id") === 0)
      val p1 = planted.select((col("vec_id") + 10300).as("id"), col("embedding").as("vec"))
      val p2 = planted.select((col("vec_id") + 10301).as("id"), col("embedding").as("vec"))
      val store = new SnapshotStore(tmp("pp-semdel"), spark)
      phase(f, "build")(SemIndex.build(store, "vecs_sem", base.unionByName(p2),
        dim = 64, eps = 0.99, nClusters = 1))
      phase(f, "delete")(SemIndex.deleteDocs(store, "vecs_sem", p2.select(col("id"))))
      phase(f, "append")(SemIndex.appendBatchOnce(store, "vecs_sem", p1,
        streamId = "verify", batchId = 0L).get.count())
    }

    if (selected("sim_index_deleted")) {
      val f = "sim_index_deleted"
      val store = new SnapshotStore(tmp("pp-videl"), spark)
      phase(f, "build")(VectorIndex.build(store, "emb_ivfpq", embs(d), "vec_id",
        "embedding", dim = 64, nLists = 16, m = 16, kCodes = 16))
      phase(f, "delete")(VectorIndex.deleteDocs(store, "emb_ivfpq",
        embs(d).filter(col("vec_id") % 13 === 4).select(col("vec_id").as("neighbor_id"))))
      phase(f, "serve")(VectorIndex.queryRefined(store, "emb_ivfpq", embs(d), "vec_id",
        "embedding", qvecs(d), "query_id", "qvec",
        k = 10, nProbe = 16, refine = 1000).count())
    }

    if (selected("train_ctl")) {
      // CONTROL: the driver-side centroid/codebook training jobs alone —
      // attribution for the SemIndex/VectorIndex build phases.
      val f = "train_ctl"
      val base = embs(d).filter(col("vec_id") < 300)
        .select(col("vec_id").as("id"), col("embedding").as("vec"))
      phase(f, "sem_train")(
        graft.functions.Similarity.trainIvfCentroids(base, "vec", 1))
      phase(f, "ivf_train")(
        graft.functions.Similarity.trainIvfCentroids(embs(d), "embedding", 16))
    }

    if (selected("bm25_ctl")) {
      // CONTROL: same build + serve as retrieve_bm25_deleted, no delete —
      // isolates the tombstone visibility overhead on the serve path.
      val f = "bm25_ctl"
      val ds = docs(d).select(col("doc_id"), col("text"))
      val store = new SnapshotStore(tmp("pp-bm25ctl"), spark)
      phase(f, "build")(PhraseIndex.build(store, "docs_text", ds, "text", "doc_id"))
      val qs = ds.filter(col("doc_id") < 3)
        .select(col("doc_id").as("query_id"), col("text").as("qtext"))
      phase(f, "serve")(TextIndex.query(store, "docs_text", qs, "query_id", "qtext", k = 10)
        .select(col("query_id"), col("neighbor_id"), col("rank")).count())
    }

    if (selected("mh_ctl")) {
      // CONTROL: pairsForCommitted with no tombstones pending.
      val f = "mh_ctl"
      val base = docs(d).filter(col("doc_id") < 300)
        .select(col("doc_id"), col("text"))
      val store = new SnapshotStore(tmp("pp-mhctl"), spark)
      phase(f, "build")(DedupIndex.build(store, "docs_minhash", base, "text", "doc_id"))
      phase(f, "pairs")(DedupIndex.pairsForCommitted(store, "docs_minhash",
        base.select(col("doc_id").as("id")), threshold = 0.5).count())
    }

    if (selected("dedup_incr_oracle")) {
      val f = "dedup_incr_oracle"
      val base = docs(d).filter(col("doc_id") < 300)
        .select(col("doc_id"), col("text"))
      val store = new SnapshotStore(tmp("pp-dincr"), spark)
      phase(f, "build")(DedupIndex.build(store, "docs_minhash", base.limit(0), "text", "doc_id"))
      val p0 = phase(f, "append0")(DedupIndex.appendBatchOnce(store, "docs_minhash",
        base.filter(col("doc_id") % 2 === 0).coalesce(1), "text", "doc_id",
        streamId = "verify", batchId = 0, threshold = 0.5).get)
      val p1 = phase(f, "append1")(DedupIndex.appendBatchOnce(store, "docs_minhash",
        base.filter(col("doc_id") % 2 === 1).coalesce(1), "text", "doc_id",
        streamId = "verify", batchId = 1, threshold = 0.5).get)
      phase(f, "union")(p0.unionByName(p1).select(col("id_a"), col("id_b")).count())
    }

    if (selected("retrieve_bm25_maintained")) {
      val f = "retrieve_bm25_maintained"
      val ds = docs(d).select(col("doc_id"), col("text"))
      val store = new SnapshotStore(tmp("pp-bm25mnt"), spark)
      phase(f, "build")(PhraseIndex.build(store, "docs_text",
        ds.filter(col("doc_id") % 2 === 0), "text", "doc_id"))
      phase(f, "champ1")(TextIndex.refreshChampions(store, "docs_text", m = 3))
      phase(f, "append")(TextIndex.append(store, "docs_text",
        ds.filter(col("doc_id") % 2 =!= 0), "text", "doc_id", compactEvery = 100))
      // maintainAll decomposed (refresh-first discipline of TextIndex.maintain)
      phase(f, "champ2")(TextIndex.refreshChampions(store, "docs_text", m = 3))
      phase(f, "fold")(TextIndex.compactIndex(store, "docs_text"))
      phase(f, "vacuum")(TextIndex.vacuumIndex(store, "docs_text"))
      phase(f, "requirePhrase")(
        PhraseIndex.phraseQuery(store, "docs_text",
          ds.filter(col("doc_id") === 0)
            .select(col("doc_id").as("query_id"),
              array_join(slice(graft.functions.TextFunctions.tokens(
                lower(col("text"))), 1, 3), " ").as("phrase")),
          "query_id", "phrase").isEmpty)
      val qs = ds.filter(col("doc_id") < 3)
        .select(col("doc_id").as("query_id"), col("text").as("qtext"))
      phase(f, "serve")(TextIndex.queryChampions(store, "docs_text", qs,
        "query_id", "qtext", k = 10, fallbackToExact = false).count())
    }

    if (selected("retrieve_bm25_maxscore")) {
      val f = "retrieve_bm25_maxscore"
      val ds = docs(d).select(col("doc_id"), col("text"))
      val store = new SnapshotStore(tmp("pp-bm25msx"), spark)
      phase(f, "build")(PhraseIndex.build(store, "docs_text", ds, "text", "doc_id"))
      phase(f, "champ")(TextIndex.refreshChampions(store, "docs_text", m = 8))
      val qs = ds.filter(col("doc_id") < 3)
        .select(col("doc_id").as("query_id"), col("text").as("qtext"))
      phase(f, "serve")(TextIndex.queryMaxScore(store, "docs_text", qs,
        "query_id", "qtext", k = 10).count())
    }

    if (selected("dedup_embed_float_oracle")) {
      val f = "dedup_embed_float_oracle"
      phase(f, "all")(ExtensionQueries.dedupEmbedFloatOracle(spark, d).count())
    }

    spark.stop()
  }
}
