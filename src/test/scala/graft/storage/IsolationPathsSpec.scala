package graft.storage

import org.scalatest.funsuite.AnyFunSuite

/** Golden ports of test/storage/test_isolation.py:47-129 — pure string
  * logic, no Spark. */
class IsolationPathsSpec extends AnyFunSuite {

  test("create isolation path (parametrized golden cases)") {
    val cases = Seq(
      ("", "folder/", "branch", "/mnt/data/file.parquet", "/mnt/folder/branch/data/file.parquet"),
      ("", "folder", "/branch/", "/mnt/data/file.parquet", "/mnt/folder/branch/data/file.parquet"),
      ("/mnt/", "folder/", "branch", "/mnt/data/file.parquet", "/mnt/folder/branch/data/file.parquet"),
      ("/mnt/", "/folder/", "/branch/", "/mnt/data/file.parquet", "/mnt/folder/branch/data/file.parquet"),
      ("data", "iso", "dev", "/data/file.parquet", "/data/iso/dev/file.parquet"),
      ("/data", "iso", "dev", "/data/file.parquet", "/data/iso/dev/file.parquet"))
    for ((mp, folder, ctx, input, expected) <- cases)
      assert(IsolationPaths.createIsolationPath(mp, folder, ctx, input) == expected,
        s"($mp, $folder, $ctx, $input)")
  }

  test("remove isolation path (parametrized golden cases)") {
    val cases = Seq(
      ("/mnt/data/file.parquet", "container", "branch", "/mnt/data/file.parquet"),
      ("/mnt/container/branch/data/file.parquet", "container", "branch", "/mnt/data/file.parquet"),
      ("/mnt/foo/bar/data/file.parquet", "container", "branch", "/mnt/foo/bar/data/file.parquet"))
    for ((input, folder, ctx, expected) <- cases)
      assert(IsolationPaths.removeIsolationPath(folder, ctx, input) == expected,
        s"($input, $folder, $ctx)")
  }

  test("verbose table name (parametrized golden cases)") {
    val cases = Seq(
      ("/mnt/folder/bronze/my_table", "", "folder...bronze/my_table"),
      ("/dbfs///folder/bronze/foo/bar/table", "", "folder...bar/table"),
      ("/mnt/data/folder/file/////", "", "data...folder/file"),
      ("/mnt/bronze/my_table", "", "bronze...my_table"),
      ("/mnt/justone", "", "justone"),
      ("/mnt/", "", "Unknown"),
      ("", "", "Unknown"),
      ("/", "", "Unknown"))
    for ((input, mp, expected) <- cases)
      assert(IsolationPaths.verboseTableName(mp, input) == expected, s"($input)")
  }

  test("verbose path line dots alignment (parametrized golden cases)") {
    val cases = Seq(
      ("/mnt/container/bronze/my_table", "", "Reading",
       "Reading: container...bronze/my_table .............. path: /mnt/container/bronze/my_table"),
      ("/mnt/container/my_table", "", "Writing",
       "Writing: container...my_table ..................... path: /mnt/container/my_table"),
      ("/mnt/data/folder/file", "", "Saving",
       "Saving: data...folder/file ........................ path: /mnt/data/folder/file"),
      ("/custom/bronze/my_table", "custom", "Listing",
       "Listing: bronze...my_table ........................ path: /custom/bronze/my_table"),
      ("/mnt/just_right", "", "Exploring",
       "Exploring: just_right ............................. path: /mnt/just_right"),
      ("/dbfs/container/bronze/table", "", "Scanning",
       "Scanning: container...bronze/table ................ path: /dbfs/container/bronze/table"),
      ("/mnt/", "", "Inspecting",
       "Inspecting: Unknown ............................... path: /mnt/"))
    for ((path, mp, op, expected) <- cases)
      assert(IsolationPaths.verbosePathLine(mp, path, op) == expected, s"($path, $op)")
  }

  test("last-updated message formatting") {
    val elapsed = 2L * 86400 + 5L * 3600 + 13L * 60 + 7
    assert(IsolationPaths.lastUpdatedMessage(elapsed) ==
      "Table was last updated: 2 days, 5 hours, 13 minutes ago.\n")
  }
}
