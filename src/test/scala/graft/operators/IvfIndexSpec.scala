package graft.operators

import java.nio.file.Files

import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{Tables, TestSpark}

/** The materialized IVF layout: cell partitions on disk, probe = pruning. */
class IvfIndexSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("probe reads only nprobe cell partitions and reranks exactly") {
    val dir = Files.createTempDirectory("graft-ivf-index").toString
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.001")
    Similarity.ivfWriteIndex(emb, "vec_id", "embedding", dir, centroidEvery = 50)

    val cellDirs = new java.io.File(s"$dir/data").listFiles()
      .count(f => f.isDirectory && f.getName.startsWith("cell="))
    assert(cellDirs == 10) // 500 rows, centroids at vec_id % 50 == 0

    val qvec = emb.filter(col("vec_id") === 0)
      .select(Similarity.vecD(col("embedding"))).head.getSeq[Double](0)
    val res = Similarity.ivfTopKIndexed(spark, dir, "vec_id", "embedding",
      qvec, k = 5, nprobe = 2)

    // partition pruning is visible in the physical plan: the data scan
    // selects exactly the probed cells, not all 10
    val scanned = res.queryExecution.executedPlan.collect {
      case f: FileSourceScanExec if f.metadata.get("Location").exists(_.contains("data")) =>
        f.selectedPartitions.partitionCount
    }
    assert(scanned.nonEmpty && scanned.forall(_ == 2))

    val rows = res.collect()
    assert(rows.head.getLong(0) == 0L)        // the query vector itself...
    assert(rows.head.getDouble(2) == 1.0)     // ...at cosine exactly 1
    assert(rows.length == 5)
    // every result must come from a probed cell
    // NB: cell is a partition directory column, so it reads back as the
    // inferred integer type, not the long it was written from
    val probedCells = rows.map(_.getAs[Number](1).longValue).toSet
    assert(probedCells.size <= 2)
  }
}
