package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Dev tool: LSH recall/cost sweep over (bands × bandBits × flips) at the
  * two-level ANN fixture (r17 verdict #3 — the LSH tier's single-query
  * recall@10 read 0.5 at the 20k/64-d geometry, the weakest number on the
  * recall card; this names the knee before the production geometry moves).
  *
  * Recall here is a pure function of the banding geometry + probe
  * expansion + exact re-rank (the store layout only changes WHERE the
  * candidates are read from), so the sweep bands the corpus IN MEMORY per
  * geometry instead of building ~a dozen on-disk stores: a geometry's
  * recall@10 for query q = |candidates(q) ∩ exactTop10(q)| / 10 — the
  * re-rank scores candidates by the same exact cosine the ground truth
  * ranks by, so every exact-top-10 member among the candidates survives
  * the re-rank cut by construction.
  *
  * Cost columns per geometry: buckets one probe opens
  * (bands·(1+Σ C(bits,f)) literal predicates — the seq-read leg), mean
  * candidate rows re-ranked (the random-fetch leg the tier advisor
  * prices), and stored index rows (n·bands — the storage leg).
  *
  * Usage: runMain graft.DevLshSweep [fixtureDir] [n=20000] [qids=16]
  */
object DevLshSweep {
  def main(args: Array[String]): Unit = {
    import graft.operators.AnnIndex
    import graft.operators.AnnIndex.LshGeom
    val dir = args.find(_.startsWith("/")).getOrElse("/tmp/graft_ann_twolevel")
    val n = args.find(_.startsWith("n=")).map(_.stripPrefix("n=").toInt).getOrElse(20000)
    val nq = args.find(_.startsWith("qids=")).map(_.stripPrefix("qids=").toInt).getOrElse(16)
    val spark = GraftSession.create()
    import spark.implicits._
    DevAnnFixture.ensure(spark, dir, n)

    val corpus = spark.read.parquet(s"$dir/embeddings.parquet")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    corpus.cache().count()
    val queries = corpus.where(col("vec_id") < nq)
      .select(col("vec_id").as("qid"), col("v").as("qv"))

    // ground truth: exact cosine top-10 per qid, self excluded — one
    // broadcast of the nq-row query frame over the cached corpus
    val exactTop: Map[Long, Set[Long]] = corpus
      .crossJoin(broadcast(queries))
      .where(col("vec_id") =!= col("qid"))
      .select(col("qid"), col("vec_id"), expr("cosine_sim(v, qv)").as("sim"))
      .withColumn("r", row_number().over(org.apache.spark.sql.expressions.Window
        .partitionBy("qid").orderBy(desc("sim"), asc("vec_id"))))
      .where(col("r") <= 10)
      .select("qid", "vec_id").collect()
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap
    require(exactTop.size == nq && exactTop.values.forall(_.size == 10))

    val adaptiveBits = AnnIndex.lshBandBits(n)
    println(s"[lshsweep] n=$n d=${DevAnnFixture.Dim} qids=$nq " +
      s"production geom: bands=${AnnIndex.LshBands} bits=$adaptiveBits " +
      s"flips=${AnnIndex.LshProbeFlips}")
    println(f"${"bands"}%5s ${"bits"}%4s ${"flips"}%5s ${"buckets"}%7s " +
      f"${"idx_rows"}%8s ${"cand_mean"}%9s ${"recall_mean"}%11s ${"recall_min"}%10s ${"qids<0.7"}%8s")

    def listArg(key: String, default: Seq[Int]): Seq[Int] =
      args.find(_.startsWith(key)).map(_.stripPrefix(key)
        .split(",").toSeq.map(_.trim.toInt)).getOrElse(default)
    val bandsList = listArg("bands=", Seq(4, 6, 8))
    val bitsList = listArg("bits=",
      Seq(adaptiveBits - 2, adaptiveBits - 1, adaptiveBits, adaptiveBits + 2))
    val grid = for {
      bands <- bandsList
      bits <- bitsList
      flips <- Seq(1)
    } yield (bands, bits, flips)
    // plus the probe-only alternative: production storage, wider probe
    val full = grid ++ Seq((AnnIndex.LshBands, adaptiveBits, 2))

    full.foreach { case (bands, bits, flips) =>
      val geom = LshGeom(bands, bits, AnnIndex.LshSeed)
      val banded = AnnIndex.bandify(corpus, geom)
      val masks = AnnIndex.flipMasks(bits, flips)
      // query bucket coordinates + multi-probe expansion, as literal rows
      val qPairs = AnnIndex.bandify(
          queries.select(col("qid").as("vec_id"), col("qv").as("v")), geom)
        .collect()
        .flatMap { r =>
          val (q, b, k) = (r.getLong(0), r.getInt(1), r.getLong(2))
          (k +: masks.map(k ^ _)).map(kk => (q, b, kk))
        }.distinct.toSeq
      val probeDf = qPairs.toDF("qid", "band_id", "band_key")
      val cand: Map[Long, Set[Long]] = banded
        .join(broadcast(probeDf), Seq("band_id", "band_key"))
        .where(col("vec_id") =!= col("qid"))
        .select("qid", "vec_id").distinct()
        .collect()
        .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap
      val recalls = (0L until nq.toLong).map(q =>
        exactTop(q).intersect(cand.getOrElse(q, Set.empty)).size / 10.0)
      val candMean = (0L until nq.toLong).map(q =>
        cand.getOrElse(q, Set.empty).size).sum.toDouble / nq
      val buckets = bands * (1 + masks.size)
      println(f"$bands%5d $bits%4d $flips%5d $buckets%7d ${n.toLong * bands}%8d " +
        f"$candMean%9.0f ${recalls.sum / nq}%11.3f ${recalls.min}%10.2f " +
        f"${recalls.count(_ < 0.7)}%8d")
    }
    spark.stop()
  }
}
