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

  test("upsert routes through the frozen quantizer and rewrites only affected cells") {
    val dir = Files.createTempDirectory("graft-ivf4").toString
    val e = io.Tables.embeddings(spark, sfDir)
    Similarity.writeIvfIndex(e, "label", s"$dir/ivf")
    val quant = Similarity.readIvfQuantizer(spark, s"$dir/ivf")
      .as[(Int, Seq[Double])].collect().toMap

    // the batch: three existing vectors replayed under fresh ids — each
    // must land in the cell whose FROZEN centroid is cosine-nearest
    val batch = e.filter($"vec_id".isin(3L, 17L, 42L))
      .select(($"vec_id" + 100000L).as("vec_id"), $"embedding")
    def expectLabel(vec: Seq[Float]): Int =
      quant.map { case (l, c) =>
        val dot = c.zip(vec).map { case (a, b) => a * b.toDouble }.sum
        val nc = math.sqrt(c.map(x => x * x).sum)
        val nv = math.sqrt(vec.map(x => x.toDouble * x).sum)
        (l, BigDecimal(dot / (nc * nv)).setScale(6,
          BigDecimal.RoundingMode.HALF_UP).toDouble)
      }.toSeq.minBy { case (l, s) => (-s, l) }._1
    val expected = e.filter($"vec_id".isin(3L, 17L, 42L))
      .as[(Long, Seq[Float], Int)].collect()
      .map(r => (r._1 + 100000L) -> expectLabel(r._2)).toMap

    // snapshot of every cell's files before the upsert
    def cellFiles(): Map[String, Seq[(String, Long)]] =
      new java.io.File(s"$dir/ivf").listFiles().toSeq
        .filter(f => f.isDirectory && f.getName.startsWith("label="))
        .map(d => d.getName ->
          d.listFiles().toSeq.map(f => (f.getName, f.lastModified())).sorted)
        .toMap
    val before = cellFiles()

    val summary = Similarity.upsertIvfIndex(spark, s"$dir/ivf",
        batch, "vec_id", "embedding", "label")
      .as[(Int, Long, Long)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    val after = cellFiles()

    val back = Similarity.readIvfIndex(spark, s"$dir/ivf")
    assert(back.count() == e.count() + 3)
    val landed = back.filter($"vec_id" >= 100000L)
      .select($"vec_id", $"label").as[(Long, Int)].collect().toMap
    assert(landed == expected, "assignment must match the frozen quantizer")

    // only the affected cells were rewritten; every other cell's files
    // are byte-identical (same names, same mtimes)
    val affected = expected.values.toSet.map((l: Int) => s"label=$l")
    for ((cell, files) <- before if !affected(cell))
      assert(after(cell) == files, s"untouched cell $cell was rewritten")
    for (cell <- affected)
      assert(after(cell) != before(cell), s"affected cell $cell unchanged")
    // the summary accounts for every routed row against the new totals
    assert(summary.values.map(_._1).sum == 3L)
    for ((l, (added, total)) <- summary)
      assert(total == e.filter($"label" === l).count() + added)
    // the quantizer is frozen: byte-identical after the upsert
    val quantAfter = Similarity.readIvfQuantizer(spark, s"$dir/ivf")
      .as[(Int, Seq[Double])].collect().toMap
    assert(quantAfter == quant)
  }
}
