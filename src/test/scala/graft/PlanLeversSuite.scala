package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The three runtime plan levers a 100 TB deployment leans on, pinned as
  * executable evidence: dynamic partition pruning (a dim filter prunes the
  * fact's partition scan at runtime), runtime bloom filters (a selective
  * build side injects a might_contain screen into the probe scan), and
  * AQE skew-join splitting (an oversized shuffle partition is split after
  * the map stage materializes). Thresholds are lowered to fire at test
  * scale — the PLAN features are what is being pinned, not the sizes.
  */
class PlanLeversSuite extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def withConf(pairs: (String, String)*)(body: => Unit): Unit = {
    val prev = pairs.map { case (k, _) => k -> spark.conf.getOption(k) }
    try { pairs.foreach { case (k, v) => spark.conf.set(k, v) }; body }
    finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("dynamic partition pruning: dim filter prunes the fact partition scan") {
    val dir = java.nio.file.Files.createTempDirectory("graft_dpp")
    try {
      Tables.df(spark, TestSpark.sfDir, "orders")
        .withColumn("yr", year(col("o_orderdate")))
        .write.mode("overwrite").partitionBy("yr").parquet(dir.toString)
      val fact = spark.read.parquet(dir.toString)
      val dim = spark.range(1990, 2010).select(col("id").as("dyr"))
        .withColumn("pick", col("dyr") === 1996)
      val joined = fact.join(dim.filter(col("pick")), col("yr") === col("dyr"))
        .groupBy("yr").agg(count(lit(1)).as("n"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.toLowerCase.contains("dynamicpruning"),
        s"partition-column join under a selective dim filter must plan DPP:\n$plan")
      assert(joined.collect().map(_.getInt(0)).toSeq == Seq(1996))
    } finally {
      def rm(p: java.nio.file.Path): Unit = {
        if (java.nio.file.Files.isDirectory(p))
          java.nio.file.Files.list(p).forEach(rm)
        java.nio.file.Files.deleteIfExists(p)
      }
      rm(dir)
    }
  }

  test("runtime bloom filter: selective build side screens the probe scan") {
    withConf(
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold" -> "100MB",
      // force the shuffle-join path: bloom injection only helps non-broadcast joins
      "spark.sql.autoBroadcastJoinThreshold" -> "-1") {
      val fact = Tables.df(spark, TestSpark.sfDir, "lineitem")
      val dim = Tables.df(spark, TestSpark.sfDir, "orders")
        .filter(col("o_totalprice") > 400000) // selective
      val joined = fact.join(dim, col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_orderpriority").agg(count(lit(1)).as("n"))
      val opt = joined.queryExecution.optimizedPlan.toString
      assert(opt.contains("might_contain"),
        s"selective shuffle join must inject a runtime bloom filter:\n$opt")
    }
  }

  test("AQE splits a skewed join partition") {
    withConf(
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "30KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "10KB",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1") {
      // 90% of rows land on one hot key; the rest spread over 64 keys
      val left = spark.range(0, 100000).select(
        when(col("id") % 10 =!= 0, lit(0L)).otherwise(col("id") % 64 + 1).as("k"),
        concat(lit("payload_payload_payload_"), col("id")).as("v"))
      val right = spark.range(0, 65).select(col("id").as("k"),
        concat(lit("dim_"), col("id")).as("d"))
      // aggregate over the payload so column pruning cannot strip it from
      // the shuffle — the skewed partition must actually carry the bytes
      val joined = left.join(right, "k")
        .select(max(length(col("v"))).as("mx"), count(lit(1)).as("n"))
      joined.collect() // materialize THIS queryExecution so AQE finalizes it
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"),
        s"the hot key's partition must be marked split by AQE:\n$plan")
    }
  }

  test("q243's skewed lineitem join runs with AQE skew splits on the real table") {
    graft.queries.Joins.withSkewJoinConfs(spark) {
      val df = graft.queries.Joins.aqeSkewJoinPlan(spark, TestSpark.sfDir)
      val rows = df.collect() // finalize the adaptive plan
      assert(rows.nonEmpty && rows.map(_.getLong(0)).toSet.subsetOf((1L to 7L).toSet),
        "per-weight-class aggregates expected")
      val plan = df.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"),
        s"q243's join must carry AQE skew splits at execution:\n$plan")
      assert(!plan.contains("BroadcastHashJoin"),
        "broadcast must stay disabled or there is no shuffle to split")
    }
  }

  test("JDBC: predicate pushes to the remote side; partitioned read opens N cursors") {
    val db = java.nio.file.Files.createTempDirectory("graft_jdbc_t") + "/plandb"
    val url = s"jdbc:derby:$db;create=true"
    Tables.df(spark, TestSpark.sfDir, "orders")
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
      .write.format("jdbc").option("url", url)
      .option("dbtable", "ORDERS_P")
      .option("driver", "org.apache.derby.jdbc.EmbeddedDriver").save()
    val single = spark.read.format("jdbc").option("url", url)
      .option("dbtable", "ORDERS_P")
      .option("driver", "org.apache.derby.jdbc.EmbeddedDriver").load()
      .filter(col("o_totalprice") > 200000.0)
    // the filter must reach the remote SQL, not run Spark-side post-fetch
    val plan = single.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("GreaterThan(o_totalprice"),
      s"JDBC filter must be pushed down:\n$plan")
    // the 100 TB path: partitionColumn splits the read into stride-bounded
    // cursors, one per executor slot
    val partitioned = spark.read.format("jdbc").option("url", url)
      .option("dbtable", "ORDERS_P")
      .option("driver", "org.apache.derby.jdbc.EmbeddedDriver")
      .option("partitionColumn", "o_orderkey")
      .option("lowerBound", "1").option("upperBound", "60001")
      .option("numPartitions", "4").load()
    assert(partitioned.rdd.getNumPartitions === 4,
      "partitioned JDBC read must open one cursor slice per partition")
    assert(partitioned.count() === single.sparkSession.read.format("jdbc")
      .option("url", url).option("dbtable", "ORDERS_P")
      .option("driver", "org.apache.derby.jdbc.EmbeddedDriver").load().count(),
      "partition slicing must not lose or duplicate rows")
  }
}
