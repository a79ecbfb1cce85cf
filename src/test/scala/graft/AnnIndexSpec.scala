package graft

import java.nio.file.{Files, Paths, StandardCopyOption}

import org.apache.spark.sql.functions._
import graft.operators.AnnIndex
import graft.sources.Tables

/** The materialized ANN index: build-once semantics, corpus coverage,
  * version staleness. Probe correctness lives in DedupSimilaritySpec
  * (IVF ≡ brute force on shared candidates) and plan shape in PlanSpec.
  */
class AnnIndexSpec extends SparkSpec {

  test("inverted file covers the corpus exactly once with valid cells") {
    val idx = AnnIndex.ivf(spark, sf)
    val corpusN = Tables.embeddings(spark, sf).count()
    assert(idx.count() == corpusN)
    assert(idx.select("vec_id").distinct().count() == corpusN,
      "each vector appears in exactly one cell")
    val cells = idx.select("cluster").distinct().collect().map(_.getInt(0))
    assert(cells.forall(c => c >= 0 && c < AnnIndex.NPivots))
  }

  test("index cells agree with a fresh argmax assignment") {
    val idx = AnnIndex.ivf(spark, sf).select(col("vec_id"), col("cluster"))
    val fresh = AnnIndex.assign(
      Tables.embeddings(spark, sf)
        .select(col("vec_id"), col("embedding").cast("array<double>").as("v")),
      AnnIndex.codebook(spark, sf))
      .select(col("vec_id"), col("cluster").cast("int").as("cluster"))
    assert(idx.exceptAll(fresh).isEmpty && fresh.exceptAll(idx).isEmpty)
  }

  test("ensureIvf is build-once per corpus version; a changed corpus gets a fresh index and evicts the old") {
    // private corpus copy: the shared testdata dir must never be written
    val corpus = Files.createTempDirectory("ann_corpus")
    Files.copy(Paths.get(s"$sf/embeddings.parquet"),
      corpus.resolve("embeddings.parquet"), StandardCopyOption.REPLACE_EXISTING)
    val dir = corpus.toString

    val path1 = AnnIndex.ensureIvf(spark, dir)
    val success1 = Paths.get(path1.stripPrefix("file:"), "_SUCCESS")
    val mtime1 = Files.getLastModifiedTime(success1)
    assert(AnnIndex.ensureIvf(spark, dir) == path1)
    assert(Files.getLastModifiedTime(success1) == mtime1, "no rebuild on re-probe")

    // corpus changes (append a file) → new fingerprint → new index path,
    // and the superseded version is deleted from the index root
    Files.write(corpus.resolve("embeddings_2.parquet"),
      Files.readAllBytes(corpus.resolve("embeddings.parquet")))
    val path2 = AnnIndex.ensureIvf(spark, dir)
    assert(path2 != path1, "changed corpus must get a fresh index version")
    assert(!Files.exists(Paths.get(path1.stripPrefix("file:"))),
      "superseded index version must be evicted")
  }
}
