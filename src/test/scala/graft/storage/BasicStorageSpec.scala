package graft.storage

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** Ports of test/storage/test_basic.py round-trip, exists and format
  * tests (merge cases live in MergeSpec). */
class BasicStorageSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private def data =
    Seq((1L, "Alice", 1.0), (2L, "Bob", 2.0), (3L, "Cathy", 3.0))
      .toDF("id", "name", "value")

  private def storage = new BasicStorage(spark)

  for (format <- Seq("parquet", "json", "csv", "delta", "orc"))
    test(s"read and write round-trip: $format") {
      val dir = tempDir(s"rt_$format")
      storage.write(data, dir, format, "overwrite")
      var result = storage.read(dir, format)
      if (format == "csv") // csv inferSchema reads id back as int
        result = result.withColumn("id", result("id").cast("long"))
      assertDfEqual(result, data)
    }

  for (format <- Seq("parquet", "json", "delta", "orc"))
    test(s"stream round-trip: $format") {
      val dir = tempDir(s"st_$format")
      storage.write(data, dir, format, "overwrite")
      val stream = storage.readStream(dir, format)
      val out = tempDir(s"st_out_$format")
      val checkpoint = tempDir(s"st_cp_$format")
      val q = storage.writeStream(stream, out, format, checkpoint)
      q.processAllAvailable()
      q.stop()
      assertDfEqual(storage.read(out, format), data)
    }

  test("mixed formats fail (csv written, parquet read)") {
    val dir = tempDir("mixed")
    storage.write(data, dir, "csv", "overwrite")
    intercept[Exception] { storage.read(dir, "parquet").collect() }
  }

  test("unsupported format rejected") {
    intercept[IllegalArgumentException] { storage.read("/tmp/x", "avro") }
    intercept[IllegalArgumentException] {
      storage.write(data, "/tmp/x", "xml", "overwrite")
    }
  }

  test("exists: empty folder exists, deleted folder does not") {
    val dir = tempDir("exists")
    assert(storage.exists(dir))
    Fs.delete(spark, dir)
    assert(!storage.exists(dir))
  }

  for (format <- Seq("parquet", "json", "csv", "delta", "orc"))
    test(s"exists after write: $format") {
      val dir = tempDir(s"exists_$format")
      storage.write(data, dir, format, "overwrite")
      assert(storage.exists(dir))
      Fs.delete(spark, dir)
      assert(!storage.exists(dir))
    }

  test("delta write records WRITE in the op log; parquet does not") {
    val dir = tempDir("log_delta")
    storage.write(data, dir, "delta", "overwrite")
    assert(GraftLog.isManagedTable(spark, dir))
    val ops = GraftLog.history(spark, dir).select("operation")
      .as[String].collect().toSeq
    assert(ops == Seq("WRITE"))
    val plain = tempDir("log_parquet")
    storage.write(data, plain, "parquet", "overwrite")
    assert(!GraftLog.isManagedTable(spark, plain))
  }

  test("observers notified on write with the output path") {
    val dir = tempDir("obs")
    var seen: List[String] = Nil
    val st = storage
    st.registerOutputObserver((_, p) => seen = p :: seen)
    st.write(data, dir, "parquet", "overwrite")
    assert(seen == List(dir))
  }
}
