package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Partition-pruning posture of the persisted ANN indexes: a probe that
  * touches `nprobe` of k lists must SCAN only those lists' files, not
  * the whole index — at 100 TB the difference between reading ~nprobe/k
  * of the postings and reading all of them.
  *
  * The pruning is Spark's dynamic partition pruning (DPP): postings are
  * written PARTITIONED BY centroid_id, the probe joins them (broadcast)
  * on centroid_id, and the optimizer inserts a pruning subquery that
  * reuses the broadcast — no collect, no static filter, fully
  * declarative. DPP has a structural precondition these tests pin:
  * the QUERY side must be file-backed (its selective filter survives to
  * the optimizer). A driver-built local frame constant-folds its filter
  * away and probes WITHOUT pruning — correct results, full scan; see
  * the [[IvfIndex]] scaladoc note.
  */
class IvfPruningSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  test("persisted IVF-PQ probe prunes postings partitions via DPP") {
    val dir = java.nio.file.Files.createTempDirectory("ivfpq_dpp").toString
    val emb = graft.Tables.embeddings(spark, sfDir)
    val (cents, cb) = IvfIndex.savePq(emb, "vec_id", "embedding", k = 16, dir)
    val probe = Similarity.ivfPqProbe(IvfIndex.loadPqPostings(spark, dir),
      emb.filter(col("vec_id") < 8), "vec_id", "embedding", cents, cb,
      nprobe = 4, k = 5)
    probe.collect() should not be empty
    val plan = probe.queryExecution.executedPlan.toString
    withClue("postings scan lost its dynamic pruning subquery:\n") {
      plan should include("dynamicpruning")
    }
  }

  test("persisted IVF probe prunes postings partitions via DPP") {
    val dir = java.nio.file.Files.createTempDirectory("ivf_dpp").toString
    val emb = graft.Tables.embeddings(spark, sfDir)
    val cents = IvfIndex.save(emb, "vec_id", "embedding", k = 16, dir)
    val probe = Similarity.ivfProbe(IvfIndex.loadPostings(spark, dir),
      emb.filter(col("vec_id") < 8), "vec_id", "embedding", cents,
      nprobe = 4, k = 5)
    probe.collect() should not be empty
    val plan = probe.queryExecution.executedPlan.toString
    withClue("postings scan lost its dynamic pruning subquery:\n") {
      plan should include("dynamicpruning")
    }
  }
}
