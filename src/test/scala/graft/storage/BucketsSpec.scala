package graft.storage

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** Bucketed layout: equal-bucket equi-joins must plan with NO shuffle
  * exchange on either side. */
class BucketsSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  test("bucketed join is shuffle-free; unbucketed join is not") {
    val db = "graft_buckets_test"
    val loc = tempDir("buckets_db")
    spark.sql(s"CREATE DATABASE IF NOT EXISTS $db LOCATION '$loc'")
    try {
      val left = (1L to 10000L).map(i => (i, s"l$i")).toDF("id", "lv")
      val right = (1L to 10000L).map(i => (i, s"r$i")).toDF("id", "rv")
      Buckets.writeBucketed(left, s"$db.left_b", 8, Seq("id"), Seq("id"))
      Buckets.writeBucketed(right, s"$db.right_b", 8, Seq("id"), Seq("id"))

      // force a non-broadcast join so the shuffle (or its absence) shows
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      try {
        val joined = Buckets.readTable(spark, s"$db.left_b")
          .join(Buckets.readTable(spark, s"$db.right_b"), Seq("id"))
        val plan = joined.queryExecution.executedPlan.toString
        assert(!plan.contains("Exchange hashpartitioning"),
          s"bucketed join should not shuffle:\n$plan")
        assert(joined.count() == 10000)

        // control: the same join over plain (unbucketed) frames shuffles
        val plain = left.join(right, Seq("id"))
        assert(plain.queryExecution.executedPlan.toString
          .contains("Exchange hashpartitioning"))
      } finally
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    } finally {
      spark.sql(s"DROP DATABASE IF EXISTS $db CASCADE")
    }
  }

  test("groupBy on the bucket key skips the shuffle") {
    val db = "graft_buckets_test2"
    val loc = tempDir("buckets_db2")
    spark.sql(s"CREATE DATABASE IF NOT EXISTS $db LOCATION '$loc'")
    try {
      val df = (1L to 1000L).map(i => (i % 100, i.toDouble)).toDF("k", "v")
      Buckets.writeBucketed(df, s"$db.agg_b", 8, Seq("k"))
      val agg = Buckets.readTable(spark, s"$db.agg_b")
        .groupBy("k").count()
      assert(!agg.queryExecution.executedPlan.toString.contains("Exchange"))
      assert(agg.count() == 100)
    } finally {
      spark.sql(s"DROP DATABASE IF EXISTS $db CASCADE")
    }
  }
}
