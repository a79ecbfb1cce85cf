package graft

import org.apache.spark.sql.functions._
import graft.operators.{AnnIndex, PqIndex}

/** Dev probe: PQ candidate recall — for each batch query, where in the
  * ADC ranking do the exact top-10 neighbors sit? Sizes the re-rank
  * pool (the PQ sibling of the int8 path's 50).
  * Args: sfDir [k (exact depth, default 10)]
  */
object DevPqRecall {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.create()
    import spark.implicits._
    val dir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val k = args.lift(1).map(_.toInt).getOrElse(10)
    val ver = AnnIndex.corpusVersion(spark, dir)
    val cbs = PqIndex.codebooks(spark, dir, ver)
    val emb = graft.sources.Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    for (qid <- 0L until graft.operators.Similarity.BatchQueries.toLong) {
      val qv = emb.where(col("vec_id") === qid).head().getSeq[Double](1).toArray
      val lutDf = Seq(Tuple1(PqIndex.lut(qv, cbs).toSeq)).toDF("lut")
      val adcRank = PqIndex.store(spark, dir, ver)
        .where(col("vec_id") =!= qid)
        .crossJoin(broadcast(lutDf))
        .select(col("vec_id"), expr(s"pq_adc(codes, lut, ${PqIndex.Ksub})").as("adc"))
        .orderBy(desc("adc"), asc("vec_id"))
        .collect().map(_.getLong(0)).zipWithIndex.toMap
      val q = emb.where(col("vec_id") === qid).select(col("v").as("qv"))
      val exactTop = emb.where(col("vec_id") =!= qid)
        .crossJoin(broadcast(q))
        .select(col("vec_id"), round(expr("cosine_sim(v, qv)"), 6).as("sim"))
        .orderBy(desc("sim"), asc("vec_id")).limit(k)
        .collect().map(_.getLong(0))
      val ranks = exactTop.map(id => adcRank(id)).sorted
      println(s"[pqrecall] qid=$qid worstRank=${ranks.max} ranks=${ranks.mkString(",")}")
    }
    spark.stop()
  }
}
