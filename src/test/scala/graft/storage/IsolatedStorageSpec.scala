package graft.storage

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** Live round-trips of the isolation wrapper (reference delegation tests:
  * test/storage/test_isolation.py:192-333, re-expressed without mocks). */
class IsolatedStorageSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private def data = Seq((1L, "a"), (2L, "b")).toDF("id", "v")

  /** Fresh mount dir with an existing isolation folder, conf pointed at it. */
  private def withMount(context: String)(body: (IsolatedStorage, String) => Unit): Unit = {
    val mnt = tempDir("mnt")
    new java.io.File(s"$mnt/jorvik_isolation").mkdirs()
    spark.conf.set("io.jorvik.storage.mount_point", mnt)
    try {
      val st = new IsolatedStorage(new BasicStorage(spark), spark,
        isolationProvider = () => context)
      body(st, mnt)
    } finally spark.conf.unset("io.jorvik.storage.mount_point")
  }

  test("write targets the isolated path; read falls back to production") {
    withMount("feature-x") { (st, mnt) =>
      val prod = s"$mnt/data/table"
      // seed production data directly
      new BasicStorage(spark).write(data, prod, "parquet", "overwrite")
      // read: no isolated copy yet -> production
      assertDfEqual(st.read(prod, "parquet"), data)
      // write: goes to the isolated path, production untouched
      val updated = Seq((3L, "c")).toDF("id", "v")
      st.write(updated, prod, "parquet", "overwrite")
      assert(st.exists(s"$mnt/jorvik_isolation/feature-x/data/table"))
      assertDfEqual(new BasicStorage(spark).read(prod, "parquet"), data)
      // read now prefers the isolated copy
      assertDfEqual(st.read(prod, "parquet"), updated)
      // read_production_data still sees production
      assertDfEqual(st.readProductionData(prod, "parquet"), data)
    }
  }

  test("readProductionData strips isolation segments from the path") {
    withMount("feature-x") { (st, mnt) =>
      val prod = s"$mnt/data/table"
      new BasicStorage(spark).write(data, prod, "parquet", "overwrite")
      spark.conf.set("io.jorvik.storage.isolation_folder", "jorvik_isolation")
      try {
        val iso = s"$mnt/jorvik_isolation/feature-x/data/table"
        assertDfEqual(st.readProductionData(iso, "parquet"), data)
      } finally spark.conf.unset("io.jorvik.storage.isolation_folder")
    }
  }

  test("merge targets isolated copy when present, production otherwise") {
    withMount("feature-x") { (st, mnt) =>
      val prod = s"$mnt/data/mtable"
      val basic = new BasicStorage(spark)
      basic.write(data, prod, "delta", "overwrite")
      // no isolated copy: merge writes through to production
      st.merge(Seq((3L, "c")).toDF("id", "v"), prod, "full.id == incremental.id")
      assert(basic.read(prod, "delta").count() == 3)
      // create isolated copy; merge now only touches it
      st.write(basic.read(prod, "delta"), prod, "delta", "overwrite")
      st.merge(Seq((4L, "d")).toDF("id", "v"), prod, "full.id == incremental.id")
      assert(basic.read(prod, "delta").count() == 3)
      assert(st.read(prod, "delta").count() == 4)
    }
  }

  test("missing isolation folder is a clear error") {
    val mnt = tempDir("mnt_no_iso")
    spark.conf.set("io.jorvik.storage.mount_point", mnt)
    try {
      val st = new IsolatedStorage(new BasicStorage(spark), spark,
        isolationProvider = () => "b")
      val e = intercept[RuntimeException] { st.read(s"$mnt/t", "parquet") }
      assert(e.getMessage.contains("does not exist! Have you mounted it?"))
    } finally spark.conf.unset("io.jorvik.storage.mount_point")
  }

  test("configure: production context gets basic storage, other contexts isolated") {
    assert(GraftStorage.configure(spark).isInstanceOf[BasicStorage])
    assert(GraftStorage.configure(spark, Some(() => "main"))
      .isInstanceOf[BasicStorage])
    assert(GraftStorage.configure(spark, Some(() => "feature-x"))
      .isInstanceOf[IsolatedStorage])
  }
}
