package graft

import org.apache.spark.sql.functions._

import graft.ops.Shard

/** Export sharding semantics: stable stateless assignment, an order-
  * independent manifest, and a partitioned write a consumer can verify
  * shard-by-shard. */
class ShardSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = (0L until 200L).toDF("id")
    .withColumn("text", concat(lit("doc number "), $"id"))

  test("assignShards is deterministic, in-range, and roughly balanced") {
    val a = Shard.assignShards(docs, "id", 8).select($"id", $"shard")
      .as[(Long, Long)].collect().toMap
    val b = Shard.assignShards(docs, "id", 8).select($"id", $"shard")
      .as[(Long, Long)].collect().toMap
    assert(a == b)
    assert(a.values.forall(s => s >= 0 && s < 8))
    val sizes = a.values.groupBy(identity).view.mapValues(_.size)
    // 200 rows over 8 shards: expectation 25; hash balance within ±60%
    assert(sizes.size == 8 && sizes.values.forall(n => n > 10 && n < 40), sizes.toMap)
  }

  test("manifest checksum is order-independent and detects a changed row set") {
    val sharded = Shard.assignShards(docs, "id", 4)
    val m1 = Shard.manifest(sharded, "shard", "id", lit(1L))
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1).toSeq
    // same rows, different partitioning → identical manifest
    val m2 = Shard.manifest(sharded.repartition(13), "shard", "id", lit(1L))
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1).toSeq
    assert(m1 == m2)
    // dropping one row changes exactly its shard's checksum and count
    val dropped = Shard.manifest(sharded.filter($"id" =!= 7L), "shard", "id", lit(1L))
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1).toSeq
    assert(m1 != dropped)
    assert(m1.zip(dropped).count { case (x, y) => x != y } == 1)
  }

  test("writeShards produces one partition dir per shard and a matching manifest") {
    val out = java.nio.file.Files.createTempDirectory("graft_shards").toString
    val m = Shard.writeShards(docs, out, "id", 4, lit(1L))
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1).toSeq
    val dirs = new java.io.File(out).listFiles().filter(_.getName.startsWith("shard="))
    assert(dirs.map(_.getName).sorted.toSeq == (0 until 4).map(s => s"shard=$s"))
    // read-back of each shard agrees with the manifest row counts
    val readBack = spark.read.parquet(out).groupBy($"shard")
      .agg(count(lit(1)).as("n")).as[(Long, Long)].collect().toMap
    m.foreach { case (shard, nRows, _, _) => assert(readBack(shard) == nRows) }
    // partition pruning: reading one shard touches one partition dir
    val one = spark.read.parquet(out).filter($"shard" === 2L)
    val scanned = one.queryExecution.executedPlan.toString()
    assert(one.count() == m.find(_._1 == 2L).get._2)
    assert(scanned.contains("PartitionFilters") || scanned.contains("shard"), scanned)
  }
}
