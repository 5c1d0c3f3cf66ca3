package graft

import org.apache.spark.sql.functions._

import org.apache.spark.sql.graftbridge.Bridge

/** Canary for the three non-public Spark behaviors the two-phase
  * rank/cumsum primitive ([[graft.ops.Ids]]) leans on — see the
  * compatibility contract on [[Bridge.dataFrameFromInternalRdd]]. A Spark
  * upgrade that moves any of them must fail HERE, with the assumption
  * named, not deep inside a 64×-scale verify run. */
class BridgeCanarySpec extends SparkSpec {
  import spark.implicits._

  test("canary 1: jobs against one captured toRdd share its layout (counts stable across jobs)") {
    val sorted = spark.range(0, 5000)
      .select(($"id" * 2654435761L % 9973).as("k"), $"id")
      .repartitionByRange(8, $"k".asc, $"id".asc)
      .sortWithinPartitions($"k".asc, $"id".asc)
    val rdd = sorted.queryExecution.toRdd
    def counts() = rdd.sparkContext.runJob(rdd,
      (it: Iterator[org.apache.spark.sql.catalyst.InternalRow]) => {
        var n = 0L; while (it.hasNext) { it.next(); n += 1 }; n
      }).toSeq
    val first = counts()
    assert(first.sum == 5000L && first.size == 8)
    // a second job over the SAME instance must see the identical layout —
    // this is what lets the offset pass trust the count pass
    assert(counts() == first)
  }

  test("canary 2: monotonically_increasing_id packs partitionId<<33 | dense 0-based position") {
    // a crafted 2-partition frame with known per-partition sizes
    val rows = spark.range(0, 7, 1, 2)
      .select($"id", monotonically_increasing_id().as("mid"),
        spark_partition_id().as("pid"))
      .collect()
    rows.foreach { r =>
      assert(r.getLong(1) >> 33 == r.getInt(2).toLong,
        s"MID upper bits != partition id in $r")
    }
    rows.groupBy(_.getInt(2)).foreach { case (pid, rs) =>
      val pos = rs.map(r => r.getLong(1) & ((1L << 33) - 1)).sorted.toSeq
      assert(pos == (0L until pos.size.toLong), s"positions in pid=$pid: $pos")
    }
  }

  test("canary 3: internalCreateDataFrame preserves the captured RDD's partitioning and rows") {
    val sorted = spark.range(0, 1000)
      .select(($"id" % 31).as("k"), $"id")
      .repartitionByRange(5, $"k".asc, $"id".asc)
      .sortWithinPartitions($"k".asc, $"id".asc)
    val rdd = sorted.queryExecution.toRdd
    val back = Bridge.dataFrameFromInternalRdd(spark, rdd, sorted.schema)
    assert(back.rdd.getNumPartitions == rdd.getNumPartitions)
    // per-partition contents identical (pid attached BEFORE any exchange
    // could reorder): the rebuilt frame enumerates the rdd verbatim
    val got = back.select(spark_partition_id().as("pid"), $"k", $"id")
      .as[(Int, Long, Long)].collect().toSeq.sorted
    val want = rdd.mapPartitionsWithIndex { case (pid, it) =>
      it.map(r => (pid, r.getLong(0), r.getLong(1)))
    }.collect().toSeq.sorted
    assert(got == want)
  }

  test("canary 4: localCheckpointHashPartitioned — declared layout is real, keyed agg is exchange-free, results exact") {
    val df = spark.range(10000)
      .select($"id", ($"id" % 97).as("k"))
    val ck = Bridge.localCheckpointHashPartitioned(df, Seq("k"), 6)
    // the declared partitioning matches the physical layout: every key's
    // rows live in exactly the partition Murmur3(k) % 6 names
    val byPart = ck.select(spark_partition_id().as("pid"), $"k")
      .distinct().as[(Int, Long)].collect()
    assert(byPart.map(_._2).distinct.length == 97)
    assert(byPart.groupBy(_._2).forall(_._2.length == 1),
      "a key appeared in two partitions — declared partitioning is a lie")
    assert(ck.rdd.getNumPartitions == 6,
      "explicit-N repartition root was coalesced — AQE contract moved")
    // the keyed aggregation plans NO exchange against the declaration...
    val agg = ck.groupBy($"k").agg(sum($"id").as("s"))
    agg.collect()
    val finalPlan = agg.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    assert(!finalPlan.contains("Exchange hashpartitioning"), finalPlan)
    // ...and computes the same integers as the undeclared plan
    val want = df.groupBy($"k").agg(sum($"id").as("s"))
      .as[(Long, Long)].collect().toMap
    val got = agg.as[(Long, Long)].collect().toMap
    assert(got == want)
  }
}
