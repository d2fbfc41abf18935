package graft.operators

import org.apache.spark.sql.{DataFrame, Encoders}
import org.apache.spark.sql.functions._

/** Hashing-trick text classifier (SURVEY §2c row 62) — the
  * fastText-style quality-filter shape: logistic regression over
  * hashed n-gram bag-of-words features, trained distributed, scored
  * as a projection. This is the supervised sibling of [[Dsir]]
  * (which needs no labels): train on "known good" vs "known bad"
  * seed sets, score the whole corpus, keep the high-probability tail
  * — the CCNet/GPT-3-style quality filter.
  *
  * Scale shape:
  *  - features are bucket ids (`xxhash64(ngram) mod B`), computed in
  *    codegen HOFs at the scan — the per-doc feature row is an
  *    int array, never n-gram strings;
  *  - each training iteration is ONE pass over the cached feature
  *    dataset: per-partition gradient accumulation into a B+1-sized
  *    array (the treeAggregate shape of distributed LR), combined on
  *    the driver — per-iteration driver traffic is O(partitions × B)
  *    doubles, model state O(B), data rows never move;
  *  - scoring broadcasts the model and maps partitions — a pure
  *    projection, no shuffle.
  *
  * Deterministic by construction: zero init, fixed learning
  * rate/iterations, per-partition accumulation order fixed by the
  * cached partitioning, partial gradients folded in partition order.
  * Same corpus, same model, bit for bit.
  */
object QualityClassifier {

  val DefaultBuckets = 4096

  case class Model(weights: Array[Double], bias: Double, buckets: Int) {
    def marginOf(featureBuckets: Seq[Int]): Double = {
      val len = math.max(featureBuckets.length, 1)
      var m = bias
      featureBuckets.foreach(b => m += weights(b) / len)
      m
    }
    def probOf(featureBuckets: Seq[Int]): Double =
      1.0 / (1.0 + math.exp(-marginOf(featureBuckets)))
  }

  /** (id, label, feature buckets) — hashed unigram+bigram bucket ids,
    * duplicates kept (term frequency), length-normalized at use.
    */
  private def featureDs(df: DataFrame, idCol: String, textCol: String,
                        labelCol: Option[String], buckets: Int) = {
    val bks = transform(Dsir.ngrams(col(textCol)),
      g => pmod(xxhash64(g), lit(buckets)).cast("int"))
    val lbl = labelCol.map(c => col(c).cast("double"))
      .getOrElse(lit(0.0)).as("__y")
    df.select(col(idCol).cast("long"), lbl, bks.as("__b"))
      .as[(Long, Double, Seq[Int])](Encoders.product[(Long, Double, Seq[Int])])
  }

  /** Train logistic regression with `iters` full-batch gradient steps.
    * `labelCol` must be 0/1 (or boolean-castable).
    */
  def train(df: DataFrame, idCol: String, textCol: String, labelCol: String,
            buckets: Int = DefaultBuckets, iters: Int = 200,
            learningRate: Double = 1.0, l2: Double = 1e-6): Model = {
    val ds = featureDs(df,
      idCol, textCol, Some(labelCol), buckets).cache()
    try {
      val sc = df.sparkSession.sparkContext
      val w = new Array[Double](buckets)
      // AdaGrad accumulators: average-pooled features give the bias
      // and the feature weights gradients on very different scales;
      // per-coordinate step normalization converges in tens of
      // full-batch passes where plain GD needs thousands. Still
      // deterministic — no randomness anywhere in the schedule.
      val g2 = new Array[Double](buckets + 1)
      var bias = 0.0
      var t = 0
      while (t < iters) {
        val bcW = sc.broadcast(w)
        val bcBias = bias
        // per-partition gradient: [0..B) feature grads, [B] bias grad,
        // [B+1] example count — one pass, nothing data-sized moves
        val partials = ds.mapPartitions { it =>
          val g = new Array[Double](buckets + 2)
          val wv = bcW.value
          it.foreach { case (_, y, bks) =>
            val len = math.max(bks.length, 1)
            var m = bcBias
            bks.foreach(b => m += wv(b) / len)
            val r = 1.0 / (1.0 + math.exp(-m)) - y
            bks.foreach(b => g(b) += r / len)
            g(buckets) += r
            g(buckets + 1) += 1
          }
          Iterator(g)
        }(Encoders.javaSerialization[Array[Double]]).collect()
        bcW.destroy()
        val total = new Array[Double](buckets + 2)
        partials.foreach { p =>
          var i = 0
          while (i < p.length) { total(i) += p(i); i += 1 }
        }
        val n = math.max(total(buckets + 1), 1.0)
        var i = 0
        while (i < buckets) {
          val g = total(i) / n + l2 * w(i)
          g2(i) += g * g
          if (g2(i) > 0) w(i) -= learningRate * g / math.sqrt(g2(i) + 1e-12)
          i += 1
        }
        val gb = total(buckets) / n
        g2(buckets) += gb * gb
        if (g2(buckets) > 0)
          bias -= learningRate * gb / math.sqrt(g2(buckets) + 1e-12)
        t += 1
      }
      Model(w, bias, buckets)
    } finally ds.unpersist()
  }

  /** Score: (id, prob) — broadcast model, partition-mapped projection. */
  def score(df: DataFrame, idCol: String, textCol: String,
            model: Model): DataFrame = {
    val bc = df.sparkSession.sparkContext.broadcast(model)
    featureDs(df, idCol, textCol, None, model.buckets)
      .mapPartitions { it =>
        val m = bc.value
        it.map { case (id, _, bks) => (id, m.probOf(bks)) }
      }(Encoders.product[(Long, Double)])
      .toDF(idCol, "prob")
  }
}
