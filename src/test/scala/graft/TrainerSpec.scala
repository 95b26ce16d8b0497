package graft

import java.security.MessageDigest

import org.apache.spark.sql.functions._

import graft.functions.Featurize

/** In-engine perceptron training: the distributed all-integer trainer
  * must match a sequential JVM twin EXACTLY (no tolerance — that is the
  * whole point of integer gradients), be invariant to partitioning, and
  * actually learn a planted linear separator. */
class TrainerSpec extends SparkSpec {
  import spark.implicits._

  private val Dim = 32

  // deterministic toy corpus: ~90 docs of 5-14 vocab words
  private val corpus: Seq[(Long, String)] = {
    val rnd = new scala.util.Random(41)
    val vocab = Vector("alpha", "beta", "gamma", "delta", "eps", "zeta",
      "eta", "theta", "iota", "kappa", "lambda", "mu", "nu", "xi")
    (0L until 90L).map { i =>
      i -> Seq.fill(5 + rnd.nextInt(10))(vocab(rnd.nextInt(vocab.size))).mkString(" ")
    }
  }

  // ---- sequential twin of the whole pipeline ----

  private def md5hex(s: String): String =
    MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString

  /** The hashing-trick features, sequentially: bucket from md5 nibbles
    * 1-2, sign from nibble 3's parity, zero-sum buckets dropped —
    * byte-for-byte the HashedFeatures recipe. */
  private def featuresOf(text: String, dim: Int): Map[Int, Long] = {
    val toks = text.trim.split("\\s+").filter(_.nonEmpty)
    val m = scala.collection.mutable.Map.empty[Int, Long].withDefaultValue(0L)
    toks.foreach { t =>
      val h = md5hex(t)
      def nib(i: Int) = Integer.parseInt(h.substring(i, i + 1), 16)
      m((nib(0) * 16 + nib(1)) % dim) += (if (nib(2) % 2 == 1) 1L else -1L)
    }
    m.filter(_._2 != 0L).toMap
  }

  private def twinMargin(f: Map[Int, Long], w: Array[Long], bias: Long): Long =
    f.map { case (b, x) => w(b) * x }.sum + bias

  private def trainTwin(data: Seq[(String, Long)], dim: Int, iters: Int)
      : (Seq[Long], Long) = {
    val w = Array.fill(dim)(0L); var bias = 0L
    for (_ <- 0 until iters) {
      val g = Array.fill(dim)(0L); var gb = 0L
      data.foreach { case (text, y) =>
        val f = featuresOf(text, dim)
        if (y * twinMargin(f, w, bias) <= 0L) {
          f.foreach { case (b, x) => g(b) += y * x }
          gb += y
        }
      }
      var i = 0; while (i < dim) { w(i) += g(i); i += 1 }
      bias += gb
    }
    (w.toSeq, bias)
  }

  /** Labels from the fixture-weight margin, thresholded at the corpus
    * MEDIAN margin so the classes are balanced — a skewed cut lets the
    * majority-class constant predictor look as good as a learner and
    * the learnability assertion below would test nothing. Still a
    * planted LINEAR separator (w·x − T ≥ 0 is linear with a bias). */
  private def labeled(dim: Int) = {
    val fw = Featurize.fixtureWeights(dim).toArray
    val margins = corpus.map { case (id, text) =>
      (id, text, twinMargin(featuresOf(text, dim), fw, 0L))
    }
    val cut = margins.map(_._3).sorted.apply(margins.size / 2)
    margins.map { case (id, text, m) =>
      (id, text, if (m >= cut) 1L else -1L)
    }
  }

  test("distributed trainer equals the sequential twin EXACTLY") {
    val data = labeled(Dim)
    val df = data.toDF("doc_id", "text", "y")
    val (w, b) = Featurize.trainPerceptron(df, "text", "y", dim = Dim, iters = 3)
    val (tw, tb) = trainTwin(data.map(d => (d._2, d._3)), Dim, iters = 3)
    assert(w === tw)
    assert(b === tb)
    // and the engine-scored margins equal the twin's under those weights
    val scored = df.select(col("doc_id"),
        Featurize.qualityMargin(col("text"), w, b).as("m"))
      .as[(Long, Long)].collect().toMap
    data.foreach { case (id, text, _) =>
      assert(scored(id) === twinMargin(featuresOf(text, Dim), tw.toArray, tb))
    }
  }

  test("training is invariant to partitioning (integer gradients commute)") {
    val df = labeled(Dim).toDF("doc_id", "text", "y")
    val a = Featurize.trainPerceptron(df.repartition(1), "text", "y", Dim, 4)
    val c = Featurize.trainPerceptron(df.repartition(13), "text", "y", Dim, 4)
    assert(a === c)
  }

  test("the trainer learns the planted separator (accuracy climbs)") {
    val data = labeled(Dim)
    val df = data.toDF("doc_id", "text", "y")
    def accuracyAt(iters: Int): Double = {
      val (w, b) = Featurize.trainPerceptron(df, "text", "y", Dim, iters)
      val preds = df.select(col("doc_id"),
          when(Featurize.qualityMargin(col("text"), w, b) >= 0, 1L)
            .otherwise(-1L).as("p"))
        .as[(Long, Long)].collect().toMap
      data.count { case (id, _, y) => preds(id) == y }.toDouble / data.size
    }
    val a6 = accuracyAt(6)
    // labels ARE a linear function of the features, so a trained linear
    // model must do far better than the majority-class baseline
    val majority = math.max(data.count(_._3 > 0), data.count(_._3 < 0))
      .toDouble / data.size
    assert(a6 > majority + 0.05,
      s"6-iteration accuracy $a6 not above majority baseline $majority")
    assert(a6 >= 0.75, s"6-iteration accuracy $a6 unexpectedly low")
  }
}
