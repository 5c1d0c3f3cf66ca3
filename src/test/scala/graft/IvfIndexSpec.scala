package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.ops.Similarity

/** Partitioned IVF index: label predicates must prune partitions at the
  * source (the on-disk face of the probed search). */
class IvfIndexSpec extends SparkSpec {
  import spark.implicits._

  test("label predicate prunes partitions of the on-disk index") {
    val dir = Files.createTempDirectory("graft-ivf").toString
    val e = io.Tables.embeddings(spark, sfDir)
    Similarity.writeIvfIndex(e, "label", s"$dir/ivf")
    val back = Similarity.readIvfIndex(spark, s"$dir/ivf")
    assert(back.count() == e.count())

    val probed = back.filter($"label".isin(1, 3))
    probed.collect()
    val scan = probed.queryExecution.executedPlan.toString()
    val pf = scan.linesIterator.find(_.contains("PartitionFilters")).getOrElse("")
    assert(pf.contains("label"), scan) // pruning predicate reached the scan
    // and only the probed buckets' rows are read
    val expected = e.filter($"label".isin(1, 3)).count()
    assert(probed.count() == expected)
  }

  test("probed search over the on-disk index matches in-memory ivfTopK") {
    val dir = Files.createTempDirectory("graft-ivf2").toString
    val e = io.Tables.embeddings(spark, sfDir)
    Similarity.writeIvfIndex(e, "label", s"$dir/ivf")
    val disk = Similarity.readIvfIndex(spark, s"$dir/ivf")
      .select("vec_id", "embedding", "label") // partition col moves last on disk
    val query = e.filter($"vec_id" === 7L).select($"embedding".as("qvec"))
    val a = Similarity.ivfTopK(e, "vec_id", "embedding", "label", query, "qvec", 3, 10, 0.0)
      .as[(Long, Double)].collect().toSeq
    val b = Similarity.ivfTopK(disk, "vec_id", "embedding", "label", query, "qvec", 3, 10, 0.0)
      .as[(Long, Double)].collect().toSeq
    assert(a == b)
  }

  test("recall audit certifies the SHIPPED index: round-tripped parquet equals in-memory") {
    // the governance artifact (q122) must hold for the index users
    // actually query — the partitioned parquet written by writeIvfIndex —
    // not just the in-memory frame it was built from
    val dir = Files.createTempDirectory("graft-ivf3").toString
    val e = io.Tables.embeddings(spark, sfDir)
    Similarity.writeIvfIndex(e, "label", s"$dir/ivf")
    val disk = Similarity.readIvfIndex(spark, s"$dir/ivf")
      .select("vec_id", "embedding", "label") // partition col moves last on disk
    val qs = e.filter($"vec_id" % 100 === 7L)
      .select($"vec_id".as("q_id"), $"embedding".as("qvec"))
    def audit(ix: org.apache.spark.sql.DataFrame) =
      Similarity.ivfRecallAudit(ix, "vec_id", "embedding", "label",
          qs, "q_id", "qvec", nprobe = 3, k = 10)
        .as[(Long, Long, Long)].collect().sortBy(_._1).toSeq
    val mem = audit(e)
    val shipped = audit(disk)
    assert(mem.nonEmpty && shipped == mem)
  }
}
