package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.ops.{Dedup, Multimodal, Packing, Pca, Similarity, TextAnalysis}
import graft.storage.BasicStorage

import Tables._

/** The declared query inventory — every [Q] row of SURVEY.md §2 plus the
  * LLM-pipeline extension operators (§2.11), each with a DuckDB oracle
  * where SQL-expressible.
  *
  * Determinism rules (SURVEY.md §7): total-order sort on a unique key,
  * explicit column lists, decimal-accumulated float aggregates cast back
  * to double, DuckDB-side casts matching Spark's output types (INT vs
  * BIGINT), and no raw event timestamps in outputs (the parquet stores
  * nanoseconds; Spark truncates to micros, DuckDB does not — only
  * derived values like hour()/to_date() are stable across both).
  */
object GraftQueries {

  type Q = (SparkSession, String) => DataFrame

  private def entry(name: String, q: Q, oracle: String = null)
    : (String, (Q, Option[String])) =
    name -> (q, Option(oracle))

  // ---------------------------------------------------------------- flagship

  /** Flagship: the reference's showcase shape — groupBy-agg → left join →
    * CASE segmentation (reference: examples/databricks/transactions/silver/
    * nb_create_customer_summary.py:25-64) on the TPC-H-ish tables. */
  val customerSummary: Q = (spark, dir) => {
    val orders = t(spark, dir, "orders")
    val customer = t(spark, dir, "customer")
    val agg = orders
      .groupBy(col("o_custkey"))
      .agg(
        count(lit(1)).as("order_count"),
        dsum(col("o_totalprice")).as("total_spent"),
        davg(col("o_totalprice")).as("avg_spent"),
        min(col("o_totalprice")).as("min_order"),
        max(col("o_totalprice")).as("max_order"))
    agg
      .join(customer, col("o_custkey") === col("c_custkey"), "left")
      .withColumn(
        "segment",
        when(col("total_spent") >= 1500000, "High Value")
          .when(col("total_spent") >= 500000, "Medium Value")
          .otherwise("Low Value"))
      .select("o_custkey", "c_name", "c_mktsegment", "order_count",
        "total_spent", "avg_spent", "min_order", "max_order", "segment")
      .orderBy("o_custkey")
  }

  val customerSummarySql: String =
    s"""SELECT o_custkey, c_name, c_mktsegment,
       |  count(*) AS order_count,
       |  ${sqlDsum("o_totalprice")} AS total_spent,
       |  ${sqlDavg("o_totalprice")} AS avg_spent,
       |  min(o_totalprice) AS min_order,
       |  max(o_totalprice) AS max_order,
       |  CASE WHEN ${sqlDsum("o_totalprice")} >= 1500000 THEN 'High Value'
       |       WHEN ${sqlDsum("o_totalprice")} >= 500000 THEN 'Medium Value'
       |       ELSE 'Low Value' END AS segment
       |FROM orders LEFT JOIN customer ON o_custkey = c_custkey
       |GROUP BY o_custkey, c_name, c_mktsegment
       |ORDER BY o_custkey""".stripMargin

  // ------------------------------------------- §2.3 projections / filters

  val selectProject: Q = (spark, dir) =>
    t(spark, dir, "lineitem")
      .select("l_orderkey", "l_linenumber", "l_quantity", "l_returnflag")
      .orderBy("l_orderkey", "l_linenumber")

  val filterString: Q = (spark, dir) =>
    t(spark, dir, "lineitem")
      .filter("l_quantity > 30 AND l_returnflag = 'R'")
      .select("l_orderkey", "l_linenumber", "l_quantity", "l_discount")
      .orderBy("l_orderkey", "l_linenumber")

  val withColumnCast: Q = (spark, dir) =>
    t(spark, dir, "lineitem")
      // reference pattern: (qty * price).cast('float'),
      // nb_clean_transactions.py:42
      .withColumn("revenue",
        (col("l_extendedprice") * (lit(1) - col("l_discount"))).cast("float"))
      .withColumn("ship_date", date_format(col("l_shipdate"), "yyyy-MM-dd"))
      .select("l_orderkey", "l_linenumber", "revenue", "ship_date")
      .orderBy("l_orderkey", "l_linenumber")

  val renameCase: Q = (spark, dir) =>
    t(spark, dir, "orders")
      .withColumnRenamed("o_totalprice", "total_price")
      .withColumn("priority_class",
        when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), "urgent")
          .when(col("o_orderpriority") === "3-MEDIUM", "normal")
          .otherwise("low"))
      .withColumn("null_fill", lit(null).cast("double"))
      .select("o_orderkey", "total_price", "priority_class", "null_fill")
      .orderBy("o_orderkey")

  // ----------------------------------------------------------- §2.4 joins

  val joinInner: Q = (spark, dir) => {
    val o = t(spark, dir, "orders")
    val c = t(spark, dir, "customer")
    o.join(c, o("o_custkey") === c("c_custkey"), "inner")
      .select("o_orderkey", "o_custkey", "c_name", "o_totalprice")
      .orderBy("o_orderkey")
  }

  val joinLeft: Q = (spark, dir) => {
    val c = t(spark, dir, "customer")
    val n = t(spark, dir, "nation")
    c.join(n, c("c_nationkey") === n("n_nationkey"), "left")
      .select("c_custkey", "c_name", "n_name")
      .orderBy("c_custkey")
  }

  /** Snapshot diff (CDC): a synthetic "next" version of orders —
    * keys %13 deleted, prices bumped for %7, new keys appended for
    * %53 — classified against the base by Diff.snapshotDiff (one
    * full-outer join on the key, null-safe value compare), unchanged
    * rows filtered out. */
  val tableDiff: Q = (spark, dir) => {
    val prev = t(spark, dir, "orders")
      .select("o_orderkey", "o_custkey", "o_totalprice")
    val next = prev.filter(col("o_orderkey") % 13 =!= 0)
      .withColumn("o_totalprice",
        when(col("o_orderkey") % 7 === 0,
          round(col("o_totalprice") * 1.1d, 2))
          .otherwise(col("o_totalprice")))
      .unionByName(prev.filter(col("o_orderkey") % 53 === 0)
        .withColumn("o_orderkey", col("o_orderkey") + 10000000L))
    graft.ops.Diff.snapshotDiff(prev, next, Seq("o_orderkey"))
      .filter(col("change_type") =!= "unchanged")
      .orderBy("o_orderkey")
  }

  val tableDiffSql: String =
    """WITH prev AS (SELECT o_orderkey, o_custkey, o_totalprice FROM orders),
      |next AS (
      |  SELECT o_orderkey, o_custkey,
      |    CASE WHEN o_orderkey % 7 = 0 THEN round(o_totalprice * 1.1, 2)
      |         ELSE o_totalprice END AS o_totalprice
      |  FROM orders WHERE o_orderkey % 13 != 0
      |  UNION ALL
      |  SELECT o_orderkey + 10000000, o_custkey, o_totalprice
      |  FROM orders WHERE o_orderkey % 53 = 0),
      |d AS (
      |  SELECT coalesce(n.o_orderkey, p.o_orderkey) AS o_orderkey,
      |    CASE WHEN p.o_orderkey IS NULL THEN 'insert'
      |         WHEN n.o_orderkey IS NULL THEN 'delete'
      |         WHEN p.o_custkey IS DISTINCT FROM n.o_custkey
      |           OR p.o_totalprice IS DISTINCT FROM n.o_totalprice
      |           THEN 'update'
      |         ELSE 'unchanged' END AS change_type
      |  FROM prev p FULL OUTER JOIN next n ON p.o_orderkey = n.o_orderkey)
      |SELECT o_orderkey, change_type FROM d
      |WHERE change_type != 'unchanged' ORDER BY o_orderkey""".stripMargin

  /** Blocked fuzzy match: part names corrupted deterministically
    * (char dropped at position 3 / suffix appended) matched back to
    * the clean vocabulary at edit distance ≤ 1 — prefix(2) blocking +
    * length band keeps candidates block-local (never all-pairs). The
    * planted edits sit past the prefix, so blocking is recall-complete
    * here (the general caveat lives in FuzzyJoin's scaladoc). */
  val fuzzyMatch: Q = (spark, dir) => {
    val names = t(spark, dir, "part").select("p_name").distinct()
    val dirty = names.select(
      when(length(col("p_name")) % 2 === 1,
        concat(substring(col("p_name"), 1, 2), expr("substr(p_name, 4)")))
        .otherwise(concat(col("p_name"), lit("x"))).as("dirty_name"))
    val clean = names.select(col("p_name").as("clean_name"))
    graft.ops.FuzzyJoin.editDistanceJoin(
        dirty, "dirty_name", clean, "clean_name", maxDist = 1)
      .select(col("dirty_name"), col("clean_name"), col("dist"))
      .orderBy("dirty_name", "clean_name")
  }

  val fuzzyMatchSql: String =
    """WITH names AS (SELECT DISTINCT p_name FROM part),
      |dirty AS (
      |  SELECT CASE WHEN length(p_name) % 2 = 1
      |      THEN substr(p_name, 1, 2) || substr(p_name, 4)
      |      ELSE p_name || 'x' END AS dirty_name
      |  FROM names),
      |clean AS (SELECT p_name AS clean_name FROM names),
      |cand AS (
      |  SELECT dirty_name, clean_name FROM dirty JOIN clean
      |    ON substr(dirty_name, 1, 2) = substr(clean_name, 1, 2)
      |   AND abs(length(dirty_name) - length(clean_name)) <= 1),
      |m AS (SELECT dirty_name, clean_name,
      |        levenshtein(dirty_name, clean_name) AS dist FROM cand)
      |SELECT dirty_name, clean_name, CAST(dist AS INT) AS dist
      |FROM m WHERE dist <= 1 ORDER BY dirty_name, clean_name""".stripMargin

  /** Full outer equi-join: high-balance customers vs per-customer
    * urgent-order rollups — unmatched rows survive from BOTH sides
    * (the reconciliation shape: who spends without being a premium
    * account, which premium accounts are dormant). */
  val joinFull: Q = (spark, dir) => {
    val hv = t(spark, dir, "customer")
      .filter(col("c_acctbal") > 9000)
      .select("c_custkey", "c_name", "c_acctbal")
    val oc = t(spark, dir, "orders")
      .filter(col("o_orderpriority") === "1-URGENT")
      .groupBy("o_custkey")
      .agg(count(lit(1)).as("n_urgent"),
        round(dsum(col("o_totalprice")), 4).as("urgent_value"))
    hv.join(oc, hv("c_custkey") === oc("o_custkey"), "full_outer")
      .select(coalesce(col("c_custkey"), col("o_custkey")).as("custkey"),
        col("c_name"), col("c_acctbal"), col("n_urgent"),
        col("urgent_value"))
      .orderBy("custkey")
  }

  val joinFullSql: String =
    s"""WITH hv AS (SELECT c_custkey, c_name, c_acctbal FROM customer
       |  WHERE c_acctbal > 9000),
       |oc AS (SELECT o_custkey, count(*) AS n_urgent,
       |    round(${sqlDsum("o_totalprice")}, 4) AS urgent_value
       |  FROM orders WHERE o_orderpriority = '1-URGENT'
       |  GROUP BY o_custkey)
       |SELECT coalesce(hv.c_custkey, oc.o_custkey) AS custkey,
       |  c_name, c_acctbal, n_urgent, urgent_value
       |FROM hv FULL OUTER JOIN oc ON hv.c_custkey = oc.o_custkey
       |ORDER BY custkey""".stripMargin

  /** Explicit cross join (small×small only — the API surface; at scale
    * a cartesian is always a bug unless one side is tiny and broadcast,
    * which is exactly the plan Spark picks here). */
  val crossJoin: Q = (spark, dir) => {
    val r = t(spark, dir, "region").select(col("r_name"))
    val n = t(spark, dir, "nation")
      .select(col("n_name"), col("n_regionkey"))
    r.crossJoin(n)
      .select(col("r_name"), col("n_name"),
        (length(col("r_name")) + length(col("n_name"))).as("pair_len"))
      .orderBy("r_name", "n_name")
  }

  val crossJoinSql: String =
    """SELECT r_name, n_name,
      |  CAST(length(r_name) + length(n_name) AS INT) AS pair_len
      |FROM region CROSS JOIN nation
      |ORDER BY r_name, n_name""".stripMargin

  val semiJoin: Q = (spark, dir) => {
    val c = t(spark, dir, "customer")
    val o = t(spark, dir, "orders").filter(col("o_totalprice") > 400000)
    c.join(o, c("c_custkey") === o("o_custkey"), "left_semi")
      .select("c_custkey", "c_name")
      .orderBy("c_custkey")
  }

  val antiJoin: Q = (spark, dir) => {
    val c = t(spark, dir, "customer")
    val o = t(spark, dir, "orders").filter(col("o_totalprice") > 400000)
    c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
      .select("c_custkey", "c_name")
      .orderBy("c_custkey")
  }

  /** The reference's one non-trivial operator (storage/basic.py:136-191):
    * a real MERGE through the storage layer — full table from orders
    * (keys not divisible by 5), incremental with bumped prices (keys
    * divisible by 3), conditional update + unconditional insert — then
    * read the merged table back. The oracle re-derives the same result
    * relationally (FULL OUTER JOIN + CASE). */
  private def mergeUpsertOn(partitionFields: Seq[String]): Q = (spark, dir) => {
    val st = new BasicStorage(spark)
    val orders = t(spark, dir, "orders")
      .select("o_orderkey", "o_custkey", "o_totalprice", "o_orderstatus")
    val full = orders.filter(col("o_orderkey") % 5 =!= 0)
    val incremental = orders.filter(col("o_orderkey") % 3 === 0)
      // ×1.1 via scaled integers (cents·110/10^4): round()/decimal casts
      // of doubles both disagree across engines on edge values
      .withColumn("o_totalprice",
        (iscale(col("o_totalprice"), 2) * lit(110L)).cast("double") /
          lit(10000.0))
      .withColumn("o_orderstatus", lit("U"))
    val path = java.nio.file.Files
      .createTempDirectory("graft_merge_q").toString + "/t"
    // Partitioned writes: pre-shuffle on the partition key so each
    // partition dir gets one file instead of one per shuffle partition
    // (32×3 small files otherwise) — standard partitioned-layout
    // practice, and what Optimize would restore anyway.
    val toWrite =
      if (partitionFields.isEmpty) full
      else full.repartition(partitionFields.map(col): _*)
    st.write(toWrite, path, "delta", "overwrite", partitionFields)
    st.merge(incremental, path, "full.o_orderkey = incremental.o_orderkey",
      partitionFields = partitionFields,
      updateCondition = Some("incremental.o_totalprice > 200000"))
    st.read(path, "delta")
      .select("o_orderkey", "o_custkey", "o_totalprice", "o_orderstatus")
      .orderBy("o_orderkey")
  }

  val mergeUpsert: Q = mergeUpsertOn(Nil)

  /** Same merge over a status-partitioned table: exercises the
    * partition-pruned rewrite path (only partitions touched by the
    * incremental are rewritten) — same relational semantics, same
    * oracle. */
  val mergeUpsertPartitioned: Q = mergeUpsertOn(Seq("o_orderstatus"))

  val mergeUpsertSql: String =
    """WITH base AS (
      |  SELECT o_orderkey, o_custkey, o_totalprice, o_orderstatus FROM orders),
      |f AS (SELECT * FROM base WHERE o_orderkey % 5 != 0),
      |i AS (SELECT o_orderkey, o_custkey,
      |             CAST(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) * 110 AS DOUBLE) / 10000.0 AS o_totalprice,
      |             'U' AS o_orderstatus FROM base WHERE o_orderkey % 3 = 0)
      |SELECT
      |  CASE WHEN i.o_orderkey IS NOT NULL AND (f.o_orderkey IS NULL OR i.o_totalprice > 200000)
      |       THEN i.o_orderkey ELSE f.o_orderkey END AS o_orderkey,
      |  CASE WHEN i.o_orderkey IS NOT NULL AND (f.o_orderkey IS NULL OR i.o_totalprice > 200000)
      |       THEN i.o_custkey ELSE f.o_custkey END AS o_custkey,
      |  CASE WHEN i.o_orderkey IS NOT NULL AND (f.o_orderkey IS NULL OR i.o_totalprice > 200000)
      |       THEN i.o_totalprice ELSE f.o_totalprice END AS o_totalprice,
      |  CASE WHEN i.o_orderkey IS NOT NULL AND (f.o_orderkey IS NULL OR i.o_totalprice > 200000)
      |       THEN i.o_orderstatus ELSE f.o_orderstatus END AS o_orderstatus
      |FROM f FULL OUTER JOIN i ON f.o_orderkey = i.o_orderkey
      |ORDER BY 1""".stripMargin

  /** Three-clause MERGE: WHEN MATCHED AND del THEN DELETE, WHEN
    * MATCHED AND upd THEN UPDATE, WHEN NOT MATCHED THEN INSERT — the
    * full Delta clause set (delete evaluated first, Delta's order)
    * through the same COW storage path as q_merge_upsert. */
  val mergeDelete: Q = (spark, dir) => {
    val st = new BasicStorage(spark)
    val orders = t(spark, dir, "orders")
      .select("o_orderkey", "o_custkey", "o_totalprice", "o_orderstatus")
    val full = orders.filter(col("o_orderkey") % 5 =!= 0)
    val incremental = orders.filter(col("o_orderkey") % 3 === 0)
      .withColumn("o_totalprice",
        (iscale(col("o_totalprice"), 2) * lit(110L)).cast("double") /
          lit(10000.0))
      .withColumn("o_orderstatus", lit("U"))
    val path = java.nio.file.Files
      .createTempDirectory("graft_merge_del_q").toString + "/t"
    st.write(full, path, "delta", "overwrite")
    st.merge(incremental, path, "full.o_orderkey = incremental.o_orderkey",
      updateCondition = Some("incremental.o_totalprice > 200000"),
      deleteCondition = Some("incremental.o_custkey % 7 = 0"))
    st.read(path, "delta")
      .select("o_orderkey", "o_custkey", "o_totalprice", "o_orderstatus")
      .orderBy("o_orderkey")
  }

  val mergeDeleteSql: String =
    """WITH base AS (
      |  SELECT o_orderkey, o_custkey, o_totalprice, o_orderstatus FROM orders),
      |f AS (SELECT * FROM base WHERE o_orderkey % 5 != 0),
      |i AS (SELECT o_orderkey, o_custkey,
      |             CAST(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) * 110 AS DOUBLE) / 10000.0 AS o_totalprice,
      |             'U' AS o_orderstatus FROM base WHERE o_orderkey % 3 = 0)
      |SELECT
      |  CASE WHEN i.o_orderkey IS NOT NULL AND (f.o_orderkey IS NULL OR i.o_totalprice > 200000)
      |       THEN i.o_orderkey ELSE f.o_orderkey END AS o_orderkey,
      |  CASE WHEN i.o_orderkey IS NOT NULL AND (f.o_orderkey IS NULL OR i.o_totalprice > 200000)
      |       THEN i.o_custkey ELSE f.o_custkey END AS o_custkey,
      |  CASE WHEN i.o_orderkey IS NOT NULL AND (f.o_orderkey IS NULL OR i.o_totalprice > 200000)
      |       THEN i.o_totalprice ELSE f.o_totalprice END AS o_totalprice,
      |  CASE WHEN i.o_orderkey IS NOT NULL AND (f.o_orderkey IS NULL OR i.o_totalprice > 200000)
      |       THEN i.o_orderstatus ELSE f.o_orderstatus END AS o_orderstatus
      |FROM f FULL OUTER JOIN i ON f.o_orderkey = i.o_orderkey
      |WHERE NOT (f.o_orderkey IS NOT NULL AND i.o_orderkey IS NOT NULL
      |           AND i.o_custkey % 7 = 0)
      |ORDER BY 1""".stripMargin

  /** Concurrent-writer safety ([[graft.storage.Txn]]): writer A's
    * merge lands; writer B then attempts against a table whose commit
    * lock another writer holds and is REFUSED loudly (the engine's
    * answer to the silent lost update — without the lock, B's rewrite
    * would discard A's committed rows with no error anywhere); the
    * operator breaks the crashed holder's lock ([[graft.storage
    * .Txn.breakLock]]) and B's retry lands. Two marker rows pin the
    * refusal and the untouched-under-refusal guarantee into the
    * oracle hash: the oracle expects 1.0 for both, so a merge that
    * slipped past the lock (or a refusal that mutated anything)
    * hash-mismatches. Final content = the SERIAL result of A then B,
    * re-derived relationally by the oracle. */
  val concurrentMerge: Q = (spark, dir) => {
    import graft.storage.{ConcurrentWriteException, Fs, Txn}
    val st = new BasicStorage(spark)
    val orders = t(spark, dir, "orders")
      .select("o_orderkey", "o_totalprice")
    val base = orders.filter(col("o_orderkey") % 5 =!= 0)
    // exact-double deltas (+1.0 / +2.0 on 2-decimal prices) keep the
    // hash engine-portable; both writers derive from ORIGINAL orders
    val writerA = orders.filter(col("o_orderkey") % 3 === 0)
      .withColumn("o_totalprice", col("o_totalprice") + lit(1.0))
    val writerB = orders.filter(col("o_orderkey") % 7 === 0)
      .withColumn("o_totalprice", col("o_totalprice") + lit(2.0))
    val path = java.nio.file.Files
      .createTempDirectory("graft_conc_merge_q").toString + "/t"
    st.write(base, path, "delta", "overwrite")
    st.merge(writerA, path, "full.o_orderkey = incremental.o_orderkey")
    // a second writer "crashed" holding the commit lock
    Fs.writeText(spark, Txn.lockPath(path), "dead-holder-token\nMERGE")
    val countAfterA = st.read(path, "delta").count()
    val refused =
      try { st.merge(writerB, path,
        "full.o_orderkey = incremental.o_orderkey"); false }
      catch { case _: ConcurrentWriteException => true }
    val untouched = st.read(path, "delta").count() == countAfterA
    Txn.breakLock(spark, path) // operator override for a dead holder
    // the marker rows ride writer B's retry — both outcomes are known
    // by now, and a separate marker merge would be one more full COW
    // rewrite for no extra coverage
    val markers = spark.createDataFrame(Seq(
        (999999001L, if (refused) 1.0 else 0.0),
        (999999002L, if (untouched) 1.0 else 0.0)))
      .toDF("o_orderkey", "o_totalprice")
    st.merge(writerB.unionByName(markers), path,
      "full.o_orderkey = incremental.o_orderkey")
    st.read(path, "delta").select("o_orderkey", "o_totalprice")
      .orderBy("o_orderkey")
  }

  val concurrentMergeSql: String =
    """WITH base AS (
      |  SELECT o_orderkey, o_totalprice FROM orders WHERE o_orderkey % 5 != 0),
      |a AS (SELECT o_orderkey, o_totalprice + 1.0 AS o_totalprice
      |      FROM orders WHERE o_orderkey % 3 = 0),
      |b AS (SELECT o_orderkey, o_totalprice + 2.0 AS o_totalprice
      |      FROM orders WHERE o_orderkey % 7 = 0),
      |m1 AS (
      |  SELECT coalesce(a.o_orderkey, base.o_orderkey) AS o_orderkey,
      |         coalesce(a.o_totalprice, base.o_totalprice) AS o_totalprice
      |  FROM base FULL OUTER JOIN a ON base.o_orderkey = a.o_orderkey),
      |m2 AS (
      |  SELECT coalesce(b.o_orderkey, m1.o_orderkey) AS o_orderkey,
      |         coalesce(b.o_totalprice, m1.o_totalprice) AS o_totalprice
      |  FROM m1 FULL OUTER JOIN b ON m1.o_orderkey = b.o_orderkey)
      |SELECT o_orderkey, o_totalprice FROM m2
      |UNION ALL SELECT 999999001, 1.0
      |UNION ALL SELECT 999999002, 1.0
      |ORDER BY 1""".stripMargin

  /** CLONE ([[graft.storage.Clone]]): an independent managed table
    * from a source snapshot — Delta's CREATE TABLE CLONE analogue.
    * The query clones the post-merge source, then DELETES half the
    * SOURCE's rows; the output is the CLONE, which must still equal
    * the pre-delete (post-merge) state the oracle re-derives — clone
    * independence pinned straight into the hash (a clone that shared
    * files or history with the source would lose rows here). */
  val cloneTable: Q = (spark, dir) => {
    val st = new BasicStorage(spark)
    val orders = t(spark, dir, "orders")
      .select("o_orderkey", "o_totalprice")
    val base = orders.filter(col("o_orderkey") % 5 =!= 0)
    val inc = orders.filter(col("o_orderkey") % 3 === 0)
      .withColumn("o_totalprice", col("o_totalprice") + lit(1.0))
    val root = java.nio.file.Files
      .createTempDirectory("graft_clone_q").toString
    val src = root + "/src"
    val dst = root + "/dst"
    st.write(base, src, "delta", "overwrite")
    st.merge(inc, src, "full.o_orderkey = incremental.o_orderkey")
    graft.storage.Clone.table(spark, st, src, dst)
    // the source keeps evolving AFTER the clone; the clone must not move
    graft.storage.Delete.where(spark, st, src, "o_orderkey % 2 = 0")
    st.read(dst, "delta").select("o_orderkey", "o_totalprice")
      .orderBy("o_orderkey")
  }

  val cloneTableSql: String =
    """WITH base AS (
      |  SELECT o_orderkey, o_totalprice FROM orders WHERE o_orderkey % 5 != 0),
      |a AS (SELECT o_orderkey, o_totalprice + 1.0 AS o_totalprice
      |      FROM orders WHERE o_orderkey % 3 = 0)
      |SELECT coalesce(a.o_orderkey, base.o_orderkey) AS o_orderkey,
      |       coalesce(a.o_totalprice, base.o_totalprice) AS o_totalprice
      |FROM base FULL OUTER JOIN a ON base.o_orderkey = a.o_orderkey
      |ORDER BY 1""".stripMargin

  /** ALTER TABLE column surgery ([[graft.storage.Alter]]): RENAME
    * COLUMN + DROP COLUMN as copy-on-write mutations on a managed
    * table with a live change feed — the feed fences (captured
    * batches name the old column), constraints and MoR keys refuse,
    * and the table keeps merging under the new schema. The oracle
    * re-derives the post-merge content with the rename as an alias
    * and the dropped column omitted. */
  val alterTable: Q = (spark, dir) => {
    val st = new BasicStorage(spark)
    val orders = t(spark, dir, "orders")
      .select("o_orderkey", "o_custkey", "o_totalprice", "o_orderstatus")
    val base = orders.filter(col("o_orderkey") % 5 =!= 0)
    val inc = orders.filter(col("o_orderkey") % 3 === 0)
      .withColumn("o_totalprice", col("o_totalprice") + lit(1.0))
    val path = java.nio.file.Files
      .createTempDirectory("graft_alter_q").toString + "/t"
    st.write(base, path, "delta", "overwrite")
    st.merge(inc, path, "full.o_orderkey = incremental.o_orderkey",
      captureChanges = true)
    // surgery refuses while the feed retains old-schema batches
    // (replicas would silently diverge) — the production sequence is
    // prune, re-seed replicas, THEN alter; the alter's own barrier
    // keeps pruned-era stamps refusing
    val tip = graft.storage.Merge.changeFeed(spark, path)
      .agg(max(col("batch"))).head().getLong(0)
    graft.storage.Merge.pruneChangeFeed(spark, path, tip)
    graft.storage.Alter.renameColumn(spark, st, path,
      "o_totalprice", "price")
    graft.storage.Alter.dropColumn(spark, st, path, "o_orderstatus")
    // ADD needs no prune (old batches replay as null — the evolution
    // contract); existing rows read typed null
    graft.storage.Alter.addColumn(spark, st, path, "note", "string")
    // the altered table keeps working: one more merge under the NEW
    // schema, populating the added column for its one row
    st.merge(
      spark.createDataFrame(Seq((999999001L, 1L, 1.5, "fresh")))
        .toDF("o_orderkey", "o_custkey", "price", "note"),
      path, "full.o_orderkey = incremental.o_orderkey")
    st.read(path, "delta")
      .select("o_orderkey", "o_custkey", "price", "note")
      .orderBy("o_orderkey")
  }

  val alterTableSql: String =
    """WITH base AS (
      |  SELECT o_orderkey, o_custkey, o_totalprice FROM orders
      |  WHERE o_orderkey % 5 != 0),
      |i AS (SELECT o_orderkey, o_custkey, o_totalprice + 1.0 AS o_totalprice
      |      FROM orders WHERE o_orderkey % 3 = 0)
      |SELECT coalesce(i.o_orderkey, base.o_orderkey) AS o_orderkey,
      |       coalesce(i.o_custkey, base.o_custkey) AS o_custkey,
      |       coalesce(i.o_totalprice, base.o_totalprice) AS price,
      |       CAST(NULL AS VARCHAR) AS note
      |FROM base FULL OUTER JOIN i ON base.o_orderkey = i.o_orderkey
      |UNION ALL SELECT 999999001, 1, 1.5, 'fresh'
      |ORDER BY 1""".stripMargin

  /** METADATA-ONLY ALTER via the column-mapping sidecar
    * ([[graft.storage.ColumnMapping]], Delta's name-mapping mode):
    * RENAME + DROP with ZERO data files rewritten — the (path, size,
    * mtime) fingerprint of every data file is asserted unchanged
    * IN-QUERY, so a regression to a rewrite fails the oracle gate, not
    * just a unit test. The mapped table then keeps MERGING under the
    * new logical schema (new files written under physical names
    * through the mapping), and [[graft.storage.Alter.materializeMapping]]
    * clears the indirection with one explicit COW rewrite, content
    * unchanged. At 100 TB this is the difference between a petabyte
    * rewrite and one sidecar swap for a rename. */
  val alterMapped: Q = (spark, dir) => {
    val st = new BasicStorage(spark)
    val orders = t(spark, dir, "orders")
      .select("o_orderkey", "o_custkey", "o_totalprice", "o_orderstatus")
    val base = orders.filter(col("o_orderkey") % 5 =!= 0)
    val inc = orders.filter(col("o_orderkey") % 3 === 0)
      .withColumn("price", col("o_totalprice") + lit(1.0))
      .select("o_orderkey", "o_custkey", "price")
    val path = java.nio.file.Files
      .createTempDirectory("graft_alter_mapped_q").toString + "/t"
    st.write(base, path, "delta", "overwrite")
    def fingerprint: Seq[(String, Long, Long)] = {
      val fs = new org.apache.hadoop.fs.Path(path)
        .getFileSystem(spark.sessionState.newHadoopConf())
      graft.storage.Fs.dataFiles(spark, path).map { case (p, len) =>
        (p, len, fs.getFileStatus(new org.apache.hadoop.fs.Path(p))
          .getModificationTime)
      }.sortBy(_._1)
    }
    val before = fingerprint
    graft.storage.Alter.renameColumnMetadata(spark, st, path,
      "o_totalprice", "price")
    graft.storage.Alter.dropColumnMetadata(spark, st, path,
      "o_orderstatus")
    require(fingerprint == before,
      "metadata-only alter must not touch a single data file")
    // the mapped table keeps merging in LOGICAL space; the merge's
    // rewrite carries the mapping and writes physical names
    st.merge(inc, path, "full.o_orderkey = incremental.o_orderkey")
    // materialize: one explicit COW rewrite clears the sidecar
    require(graft.storage.Alter.materializeMapping(spark, st, path),
      "a mapped table must have a mapping to materialize")
    require(graft.storage.ColumnMapping.load(spark, path).isEmpty,
      "materializing must clear the mapping sidecar")
    st.read(path, "delta")
      .select("o_orderkey", "o_custkey", "price")
      .orderBy("o_orderkey")
  }

  val alterMappedSql: String =
    """WITH base AS (
      |  SELECT o_orderkey, o_custkey, o_totalprice FROM orders
      |  WHERE o_orderkey % 5 != 0),
      |i AS (SELECT o_orderkey, o_custkey, o_totalprice + 1.0 AS price
      |      FROM orders WHERE o_orderkey % 3 = 0)
      |SELECT coalesce(i.o_orderkey, base.o_orderkey) AS o_orderkey,
      |       coalesce(i.o_custkey, base.o_custkey) AS o_custkey,
      |       coalesce(i.price, base.o_totalprice) AS price
      |FROM base FULL OUTER JOIN i ON base.o_orderkey = i.o_orderkey
      |ORDER BY 1""".stripMargin

  /** Change Data Feed from a three-clause merge (captureChanges):
    * row-level insert / update_preimage / update_postimage / delete
    * records the downstream-incremental-consumer pattern needs —
    * Delta's table_changes, re-expressed on the sidecar layout. */
  val mergeCdf: Q = (spark, dir) => {
    val st = new BasicStorage(spark)
    val orders = t(spark, dir, "orders")
      .select("o_orderkey", "o_custkey", "o_totalprice", "o_orderstatus")
    val full = orders.filter(col("o_orderkey") % 5 =!= 0)
    val incremental = orders.filter(col("o_orderkey") % 3 === 0)
      .withColumn("o_totalprice",
        (iscale(col("o_totalprice"), 2) * lit(110L)).cast("double") /
          lit(10000.0))
      .withColumn("o_orderstatus", lit("U"))
    val path = java.nio.file.Files
      .createTempDirectory("graft_merge_cdf_q").toString + "/t"
    st.write(full, path, "delta", "overwrite")
    st.merge(incremental, path, "full.o_orderkey = incremental.o_orderkey",
      updateCondition = Some("incremental.o_totalprice > 200000"),
      deleteCondition = Some("incremental.o_custkey % 7 = 0"),
      captureChanges = true)
    graft.storage.Merge.changeFeed(spark, path)
      .select("o_orderkey", "o_custkey", "o_totalprice", "o_orderstatus",
        "_change_type")
      .orderBy("o_orderkey", "_change_type")
  }

  val mergeCdfSql: String =
    """WITH base AS (
      |  SELECT o_orderkey, o_custkey, o_totalprice, o_orderstatus FROM orders),
      |f AS (SELECT * FROM base WHERE o_orderkey % 5 != 0),
      |i AS (SELECT o_orderkey, o_custkey,
      |             CAST(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) * 110 AS DOUBLE) / 10000.0 AS o_totalprice,
      |             'U' AS o_orderstatus FROM base WHERE o_orderkey % 3 = 0),
      |m AS (
      |  SELECT f.o_orderkey fk, f.o_custkey fc, f.o_totalprice fp,
      |         f.o_orderstatus fs, i.o_orderkey ik, i.o_custkey ic,
      |         i.o_totalprice ip, i.o_orderstatus istat
      |  FROM f JOIN i ON f.o_orderkey = i.o_orderkey),
      |changes AS (
      |  SELECT fk AS o_orderkey, fc AS o_custkey, fp AS o_totalprice,
      |         fs AS o_orderstatus, 'delete' AS _change_type
      |  FROM m WHERE ic % 7 = 0
      |  UNION ALL
      |  SELECT fk, fc, fp, fs, 'update_preimage'
      |  FROM m WHERE ic % 7 <> 0 AND ip > 200000
      |  UNION ALL
      |  SELECT ik, ic, ip, istat, 'update_postimage'
      |  FROM m WHERE ic % 7 <> 0 AND ip > 200000
      |  UNION ALL
      |  SELECT i.o_orderkey, i.o_custkey, i.o_totalprice, i.o_orderstatus,
      |         'insert'
      |  FROM i WHERE NOT EXISTS (
      |    SELECT 1 FROM f WHERE f.o_orderkey = i.o_orderkey))
      |SELECT o_orderkey, o_custkey, o_totalprice, o_orderstatus,
      |  _change_type
      |FROM changes ORDER BY o_orderkey, _change_type""".stripMargin

  /** Time travel via inverse CDF replay ([[graft.storage.Merge
    * .readAsOf]]): after TWO captured merges (updates, inserts, and a
    * delete), stepping back through both batches must reproduce the
    * ORIGINAL table exactly — which is the (trivially SQL-expressible)
    * oracle. MergeSpec pins the single-step hop == the between-merges
    * snapshot. */
  val timeTravelQ: Q = (spark, dir) => {
    val st = new BasicStorage(spark)
    val orders = t(spark, dir, "orders")
      .select("o_orderkey", "o_custkey", "o_totalprice", "o_orderstatus")
    val base = orders.filter(col("o_orderkey") % 5 =!= 0)
    val path = java.nio.file.Files
      .createTempDirectory("graft_tt_q").toString + "/t"
    st.write(base, path, "delta", "overwrite")
    // merge 1: price bump on %3 keys (updates + inserts)
    st.merge(orders.filter(col("o_orderkey") % 3 === 0)
        .withColumn("o_totalprice", col("o_totalprice") + 1000.0),
      path, "full.o_orderkey = incremental.o_orderkey",
      captureChanges = true)
    // merge 2: status flip on %7 keys + delete %11 customers
    st.merge(orders.filter(col("o_orderkey") % 7 === 0)
        .withColumn("o_orderstatus", lit("T")),
      path, "full.o_orderkey = incremental.o_orderkey",
      deleteCondition = Some("incremental.o_custkey % 11 = 0"),
      captureChanges = true)
    graft.storage.Merge.readAsOf(spark, st, path,
        Seq("o_orderkey"), Long.MinValue)
      .orderBy("o_orderkey")
  }

  val timeTravelSql: String =
    """SELECT o_orderkey, o_custkey, o_totalprice, o_orderstatus
      |FROM orders WHERE o_orderkey % 5 != 0
      |ORDER BY o_orderkey""".stripMargin

  /** RESTORE ([[graft.storage.Restore.toStamp]] — Delta's RESTORE
    * analogue): after two captured merges, restore the table to the
    * between-merges stamp. The restore is itself a CAPTURED mutation:
    * its change batch (the row diff undoing merge 2) lands with the
    * merge crash ordering and replicas replay it; time travel to the
    * UNDONE post-merge-2 state still serves (history is extended,
    * never rewritten — checked in-query and emitted as `undone_ok`).
    * The oracle recomputes the restored table (base + merge 1) and
    * the restore batch's per-kind change counts from raw `orders`. */
  val restoreQ: Q = (spark, dir) => {
    val st = new BasicStorage(spark)
    val orders = t(spark, dir, "orders")
      .select("o_orderkey", "o_custkey", "o_totalprice", "o_orderstatus")
    val path = java.nio.file.Files
      .createTempDirectory("graft_restore_q").toString + "/t"
    st.write(orders.filter(col("o_orderkey") % 5 =!= 0),
      path, "delta", "overwrite")
    // merge 1: price bump on %3 keys (updates + inserts)
    st.merge(orders.filter(col("o_orderkey") % 3 === 0)
        .withColumn("o_totalprice", col("o_totalprice") + 1000.0),
      path, "full.o_orderkey = incremental.o_orderkey",
      captureChanges = true)
    // merge 2: status flip on %7 keys + delete %11 customers
    st.merge(orders.filter(col("o_orderkey") % 7 === 0)
        .withColumn("o_orderstatus", lit("T")),
      path, "full.o_orderkey = incremental.o_orderkey",
      deleteCondition = Some("incremental.o_custkey % 11 = 0"),
      captureChanges = true)
    val stamps = graft.storage.Merge.changeFeed(spark, path)
      .select("batch").distinct().collect().map(_.getLong(0)).sorted
    def census(df: org.apache.spark.sql.DataFrame): (Long, Double) = {
      val r = df.agg(count(lit(1)), dsum(col("o_totalprice"))).head()
      (r.getLong(0), r.getDouble(1))
    }
    val afterMerge2 = census(st.read(path, "delta"))
    val rs = graft.storage.Restore.toStamp(spark, st, path,
      Seq("o_orderkey"), stamps.head).get
    val kinds = graft.storage.Merge.changeFeed(spark, path)
      .filter(col("batch") === rs)
      .groupBy("_change_type").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // the pre/post image sides of an update must pair up exactly
    val nUpd =
      if (kinds.getOrElse("update_preimage", 0L) ==
          kinds.getOrElse("update_postimage", 0L))
        kinds.getOrElse("update_postimage", 0L)
      else -1L
    // the state the restore UNDID is still served at its own stamp
    val undoneOk = census(graft.storage.Merge.readAsOf(spark, st, path,
      Seq("o_orderkey"), stamps.last)) == afterMerge2
    st.read(path, "delta")
      .withColumn("n_restore_del", lit(kinds.getOrElse("delete", 0L)))
      .withColumn("n_restore_ins", lit(kinds.getOrElse("insert", 0L)))
      .withColumn("n_restore_upd", lit(nUpd))
      .withColumn("undone_ok", lit(undoneOk))
      .orderBy("o_orderkey")
  }

  /** state1 = keys with (%5 != 0 OR %3 = 0), price +1000 where %3 = 0.
    * The restore batch undoes merge 2 against state1: its deletes are
    * merge 2's inserts (%7 keys absent from state1), its inserts are
    * merge 2's deletes (%7 keys in state1 with %11 custkeys), its
    * update pairs are merge 2's surviving updates. */
  val restoreSql: String =
    """WITH state1 AS (
      |  SELECT o_orderkey, o_custkey,
      |    CASE WHEN o_orderkey % 3 = 0 THEN o_totalprice + 1000.0
      |         ELSE o_totalprice END AS o_totalprice,
      |    o_orderstatus
      |  FROM orders WHERE o_orderkey % 5 <> 0 OR o_orderkey % 3 = 0)
      |SELECT o_orderkey, o_custkey, o_totalprice, o_orderstatus,
      |  (SELECT count(*) FROM orders WHERE o_orderkey % 7 = 0
      |     AND o_orderkey % 5 = 0 AND o_orderkey % 3 <> 0)
      |    AS n_restore_del,
      |  (SELECT count(*) FROM state1 WHERE o_orderkey % 7 = 0
      |     AND o_custkey % 11 = 0) AS n_restore_ins,
      |  (SELECT count(*) FROM state1 WHERE o_orderkey % 7 = 0
      |     AND o_custkey % 11 <> 0) AS n_restore_upd,
      |  TRUE AS undone_ok
      |FROM state1 ORDER BY o_orderkey""".stripMargin

  /** Persistent CHECK constraints ([[graft.storage.Constraints]]):
    * register two constraints on a managed table, append a clean
    * batch (passes the gate), then prove a violating append is
    * REFUSED with nothing written — final content equals base +
    * clean batch only, which is the oracle. */
  val constraintsQ: Q = (spark, dir) => {
    val st = new BasicStorage(spark)
    val out = java.nio.file.Files
      .createTempDirectory("graft_constraints_q").toString + "/t"
    val orders = t(spark, dir, "orders")
      .select("o_orderkey", "o_totalprice", "o_orderstatus")
    st.write(orders.filter(col("o_orderkey") % 2 === 0),
      out, "delta", "overwrite")
    graft.storage.Constraints.add(spark, st, out,
      "price_pos", "o_totalprice > 0")
    graft.storage.Constraints.add(spark, st, out,
      "status_known", "o_orderstatus IN ('O', 'F', 'P')")
    st.write(orders.filter(col("o_orderkey") % 2 =!= 0),
      out, "delta", "append")
    val rejected =
      try {
        st.write(orders.limit(5).withColumn("o_totalprice", lit(-1.0)),
          out, "delta", "append")
        -1L // unreachable: the gate must throw
      } catch {
        case e: graft.storage.ConstraintViolationException =>
          e.violations.map(_._2).sum
      }
    st.read(out, "delta")
      .agg(count(lit(1)).as("n"), dsum(col("o_totalprice")).as("total"))
      .withColumn("rejected_rows", lit(rejected))
  }

  val constraintsSql: String =
    s"""SELECT count(*) AS n, ${sqlDsum("o_totalprice")} AS total,
       |  CAST(5 AS BIGINT) AS rejected_rows FROM orders""".stripMargin

  /** Replica maintenance from the change feed (Merge.replayChanges):
    * capture a merge's CDF, replay it onto the PRE-merge snapshot, and
    * the replica equals the post-merge table — pinned by sharing
    * q_merge_delete's oracle verbatim. The ship-batches-not-tables
    * replication loop. */
  val cdfReplay: Q = (spark, dir) => {
    val st = new BasicStorage(spark)
    val orders = t(spark, dir, "orders")
      .select("o_orderkey", "o_custkey", "o_totalprice", "o_orderstatus")
    val full = orders.filter(col("o_orderkey") % 5 =!= 0)
    val incremental = orders.filter(col("o_orderkey") % 3 === 0)
      .withColumn("o_totalprice",
        (iscale(col("o_totalprice"), 2) * lit(110L)).cast("double") /
          lit(10000.0))
      .withColumn("o_orderstatus", lit("U"))
    val path = java.nio.file.Files
      .createTempDirectory("graft_cdf_replay_q").toString + "/t"
    val replica = java.nio.file.Files
      .createTempDirectory("graft_cdf_replay_q").toString + "/replica"
    st.write(full, path, "delta", "overwrite")
    st.write(full, replica, "delta", "overwrite") // pre-merge snapshot
    st.merge(incremental, path, "full.o_orderkey = incremental.o_orderkey",
      updateCondition = Some("incremental.o_totalprice > 200000"),
      deleteCondition = Some("incremental.o_custkey % 7 = 0"),
      captureChanges = true)
    graft.storage.Merge.replayChanges(
        st.read(replica, "delta"),
        graft.storage.Merge.changeFeed(spark, path),
        keyCols = Seq("o_orderkey"))
      .select("o_orderkey", "o_custkey", "o_totalprice", "o_orderstatus")
      .orderBy("o_orderkey")
  }

  /** The replica loop as a STREAM (StreamingOps.replicateStream):
    * change-feed batch files stream through foreachBatch replay into
    * the replica table; after the drain the replica equals the
    * post-merge source — same oracle as q_merge_delete. */
  val streamCdfReplicate: Q = (spark, dir) => {
    val st = new BasicStorage(spark)
    val orders = t(spark, dir, "orders")
      .select("o_orderkey", "o_custkey", "o_totalprice", "o_orderstatus")
    val full = orders.filter(col("o_orderkey") % 5 =!= 0)
    val incremental = orders.filter(col("o_orderkey") % 3 === 0)
      .withColumn("o_totalprice",
        (iscale(col("o_totalprice"), 2) * lit(110L)).cast("double") /
          lit(10000.0))
      .withColumn("o_orderstatus", lit("U"))
    val root = java.nio.file.Files
      .createTempDirectory("graft_stream_cdf_q").toString
    val src = root + "/src"
    val rep = root + "/replica"
    st.write(full, src, "delta", "overwrite")
    st.write(full, rep, "delta", "overwrite")
    st.merge(incremental, src, "full.o_orderkey = incremental.o_orderkey",
      updateCondition = Some("incremental.o_totalprice > 200000"),
      deleteCondition = Some("incremental.o_custkey % 7 = 0"),
      captureChanges = true)
    val q = graft.streaming.StreamingOps.replicateStream(spark, st,
      src, rep, keyCols = Seq("o_orderkey"), checkpoint = root + "/cp")
    try q.processAllAvailable() finally q.stop()
    st.read(rep, "delta")
      .select("o_orderkey", "o_custkey", "o_totalprice", "o_orderstatus")
      .orderBy("o_orderkey")
  }

  // ---------------------------------------------------- §2.5 aggregations

  /** TPC-H Q1-shaped pricing summary (count/sum/avg/min/max + aliases —
    * the reference's groupBy-agg vocabulary). */
  val groupbyAgg: Q = (spark, dir) =>
    t(spark, dir, "lineitem")
      .filter(to_date(col("l_shipdate")) <= lit("1998-09-02"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        dsum(col("l_quantity")).as("sum_qty"),
        dsum(col("l_extendedprice")).as("sum_base_price"),
        // price·(1-disc) via scaled integers: p4·(10^4 - d4) summed
        // exactly, one final double division — see Tables.iscale
        (sum((iscale(col("l_extendedprice"), 4) *
          (lit(10000L) - iscale(col("l_discount"), 4)))
          .cast(DecimalType(38, 0))).cast("double") / lit(1e8))
          .cast("double").as("sum_disc_price"),
        davg(col("l_quantity")).as("avg_qty"),
        min(col("l_quantity")).as("min_qty"),
        max(col("l_quantity")).as("max_qty"),
        count(lit(1)).as("count_order"))
      .orderBy("l_returnflag", "l_linestatus")

  val groupbyAggSql: String =
    s"""SELECT l_returnflag, l_linestatus,
       |  ${sqlDsum("l_quantity")} AS sum_qty,
       |  ${sqlDsum("l_extendedprice")} AS sum_base_price,
       |  CAST(CAST(sum(CAST(${sqlIscale("l_extendedprice", 4)} * (10000 - ${sqlIscale("l_discount", 4)}) AS DECIMAL(38,0))) AS DOUBLE) / 1e8 AS DOUBLE) AS sum_disc_price,
       |  ${sqlDavg("l_quantity")} AS avg_qty,
       |  min(l_quantity) AS min_qty,
       |  max(l_quantity) AS max_qty,
       |  count(*) AS count_order
       |FROM lineitem
       |WHERE CAST(l_shipdate AS DATE) <= DATE '1998-09-02'
       |GROUP BY l_returnflag, l_linestatus
       |ORDER BY l_returnflag, l_linestatus""".stripMargin

  /** ROLLUP hierarchy totals (subtotal + grand-total rows). NULL
    * ordering pinned explicitly — Spark defaults NULLS FIRST, DuckDB
    * NULLS LAST. */
  val rollupAgg: Q = (spark, dir) =>
    t(spark, dir, "lineitem")
      .rollup(col("l_returnflag"), col("l_linestatus"))
      .agg(count(lit(1)).as("n"), dsum(col("l_quantity")).as("sum_qty"))
      .orderBy(col("l_returnflag").asc_nulls_first,
        col("l_linestatus").asc_nulls_first)

  val rollupAggSql: String =
    s"""SELECT l_returnflag, l_linestatus, count(*) AS n,
       |  ${sqlDsum("l_quantity")} AS sum_qty
       |FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
       |ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""".stripMargin

  /** CUBE: all grouping combinations of (returnflag, linestatus) —
    * rollup's sibling, one Catalyst built-in, exact DuckDB equivalent. */
  val cubeAgg: Q = (spark, dir) =>
    t(spark, dir, "lineitem")
      .cube(col("l_returnflag"), col("l_linestatus"))
      .agg(count(lit(1)).as("n"), dsum(col("l_quantity")).as("sum_qty"))
      .orderBy(col("l_returnflag").asc_nulls_first,
        col("l_linestatus").asc_nulls_first)

  val cubeAggSql: String =
    s"""SELECT l_returnflag, l_linestatus, count(*) AS n,
       |  ${sqlDsum("l_quantity")} AS sum_qty
       |FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
       |ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""".stripMargin

  /** Price histogram: fixed-width bucketing by one floor-division —
    * the profiling pass before choosing clustering/partition ranges.
    * floor(x/w) is a single IEEE op, identical across engines. */
  val histogram: Q = (spark, dir) =>
    t(spark, dir, "lineitem")
      .withColumn("bucket",
        floor(col("l_extendedprice") / lit(10000.0)).cast("long"))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n"), dsum(col("l_extendedprice")).as("sum_price"))
      .orderBy("bucket")

  val histogramSql: String =
    s"""SELECT CAST(floor(l_extendedprice / 10000.0) AS BIGINT) AS bucket,
       |  count(*) AS n, ${sqlDsum("l_extendedprice")} AS sum_price
       |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin

  /** Pearson correlation from exact integer sums: quantity (int-valued)
    * vs discount (2-decimal quantized). Spark's corr() accumulates
    * doubles in partition order — irreproducible; this form sums exact
    * longs (every sum < 2^53, so the double casts are exact) and runs
    * ONE deterministic double expression at the end. The profiling
    * discipline for any cross-engine-checked statistic. */
  val corrStats: Q = (spark, dir) => {
    val d = (c: org.apache.spark.sql.Column) => c.cast("double")
    t(spark, dir, "lineitem")
      .select(col("l_returnflag"), col("l_quantity").cast("long").as("q"),
        iscale(col("l_discount"), 2).as("dd"))
      .groupBy("l_returnflag")
      .agg(count(lit(1)).as("n"), sum("q").as("sq"), sum("dd").as("sd"),
        sum(col("q") * col("q")).as("sqq"),
        sum(col("dd") * col("dd")).as("sdd"),
        sum(col("q") * col("dd")).as("sqd"))
      .select(col("l_returnflag"), col("n"),
        round((d(col("n")) * d(col("sqd")) - d(col("sq")) * d(col("sd"))) /
          (sqrt(d(col("n")) * d(col("sqq")) - d(col("sq")) * d(col("sq"))) *
           sqrt(d(col("n")) * d(col("sdd")) - d(col("sd")) * d(col("sd")))), 6)
          .as("corr_qty_disc"))
      .orderBy("l_returnflag")
  }

  val corrStatsSql: String =
    s"""WITH s AS (
       |  SELECT l_returnflag, count(*) AS n,
       |    sum(CAST(l_quantity AS BIGINT)) AS sq,
       |    sum(${sqlIscale("l_discount", 2)}) AS sd,
       |    sum(CAST(l_quantity AS BIGINT) * CAST(l_quantity AS BIGINT)) AS sqq,
       |    sum(${sqlIscale("l_discount", 2)} * ${sqlIscale("l_discount", 2)}) AS sdd,
       |    sum(CAST(l_quantity AS BIGINT) * ${sqlIscale("l_discount", 2)}) AS sqd
       |  FROM lineitem GROUP BY l_returnflag)
       |SELECT l_returnflag, n,
       |  round((CAST(n AS DOUBLE) * CAST(sqd AS DOUBLE) - CAST(sq AS DOUBLE) * CAST(sd AS DOUBLE)) /
       |    (sqrt(CAST(n AS DOUBLE) * CAST(sqq AS DOUBLE) - CAST(sq AS DOUBLE) * CAST(sq AS DOUBLE)) *
       |     sqrt(CAST(n AS DOUBLE) * CAST(sdd AS DOUBLE) - CAST(sd AS DOUBLE) * CAST(sd AS DOUBLE))), 6)
       |    AS corr_qty_disc
       |FROM s ORDER BY l_returnflag""".stripMargin

  /** GROUPING SETS beyond rollup/cube's reach: a non-hierarchical set
    * list — (flag, status), (status) alone, and the grand total.
    * Rollup can only nest prefixes; this is the general form. */
  val groupingSetsAgg: Q = (spark, dir) =>
    t(spark, dir, "lineitem")
      .groupingSets(
        Seq(Seq(col("l_returnflag"), col("l_linestatus")),
          Seq(col("l_linestatus")), Seq()),
        col("l_returnflag"), col("l_linestatus"))
      .agg(count(lit(1)).as("n"), dsum(col("l_quantity")).as("sum_qty"))
      .orderBy(col("l_returnflag").asc_nulls_first,
        col("l_linestatus").asc_nulls_first)

  val groupingSetsAggSql: String =
    s"""SELECT l_returnflag, l_linestatus, count(*) AS n,
       |  ${sqlDsum("l_quantity")} AS sum_qty
       |FROM lineitem
       |GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_linestatus), ())
       |ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""".stripMargin

  /** Skew-salted join: lineitem⨝part on the (skew-prone) part key with
    * an 8-way salt — hot keys spread over 8 reducers instead of one.
    * Salting must be result-invisible: the oracle is the PLAIN join. */
  val saltedJoin: Q = (spark, dir) => {
    val li = t(spark, dir, "lineitem")
      .select("l_orderkey", "l_linenumber", "l_partkey", "l_quantity")
      .withColumn("__rowid",
        concat_ws("|", col("l_orderkey"), col("l_linenumber")))
    val part = t(spark, dir, "part").select("p_partkey", "p_brand")
      .withColumnRenamed("p_partkey", "l_partkey")
    graft.ops.Skew.saltedJoin(li, part, Seq("l_partkey"), "__rowid", 8)
      .groupBy("p_brand")
      .agg(count(lit(1)).as("n"), dsum(col("l_quantity")).as("sum_qty"))
      .orderBy("p_brand")
  }

  val saltedJoinSql: String =
    s"""SELECT p_brand, count(*) AS n, ${sqlDsum("l_quantity")} AS sum_qty
       |FROM lineitem JOIN part ON l_partkey = p_partkey
       |GROUP BY p_brand ORDER BY p_brand""".stripMargin

  /** JSON property extraction: events.props carries a JSON payload;
    * pull a typed field out and aggregate — get_json_object stays a
    * codegen'd expression (no UDF). */
  val jsonExtract: Q = (spark, dir) =>
    t(spark, dir, "events")
      .withColumn("k", get_json_object(col("props"), "$.k").cast("int"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"), sum(col("k")).as("sum_k"),
        min(col("k")).as("min_k"), max(col("k")).as("max_k"))
      .orderBy("event_type")

  val jsonExtractSql: String =
    """SELECT event_type, count(*) AS n,
      |  CAST(sum(CAST(props->>'k' AS INT)) AS BIGINT) AS sum_k,
      |  min(CAST(props->>'k' AS INT)) AS min_k,
      |  max(CAST(props->>'k' AS INT)) AS max_k
      |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin

  /** Schema-typed JSON parsing (`from_json` into a struct, field
    * access, `to_json` round-trip) — the typed cousin of
    * q_json_extract's path strings; parsing to a STRUCT lets Catalyst
    * prune and push the inner fields. */
  val jsonTyped: Q = (spark, dir) =>
    t(spark, dir, "events")
      .withColumn("p",
        from_json(col("props"), "k INT", Map.empty[String, String]))
      .select(col("event_id"), col("p.k").as("k"),
        to_json(struct(col("p.k").as("k"))).as("rejson"),
        (col("p.k") >= 50).as("k_high"))
      .orderBy("event_id")

  val jsonTypedSql: String =
    """SELECT event_id, CAST(props->>'k' AS INT) AS k,
      |  '{"k":' || (props->>'k') || '}' AS rejson,
      |  CAST(props->>'k' AS INT) >= 50 AS k_high
      |FROM events ORDER BY event_id""".stripMargin

  /** TPC-H Q10-shaped returned-item revenue: which customers returned
    * goods in a quarter and what revenue walked out — lineitem return
    * filter, quarter-bounded orders, customer+nation dims. */
  val tpchQ10: Q = (spark, dir) => {
    val orders = t(spark, dir, "orders")
      .filter(col("o_orderdate") >= lit("1996-10-01").cast("timestamp") &&
        col("o_orderdate") < lit("1997-01-01").cast("timestamp"))
      .select("o_orderkey", "o_custkey")
    val line = t(spark, dir, "lineitem")
      .filter(col("l_returnflag") === "R")
      .select("l_orderkey", "l_extendedprice", "l_discount")
    val cust = t(spark, dir, "customer")
      .select("c_custkey", "c_name", "c_acctbal", "c_nationkey")
    val nation = t(spark, dir, "nation").select("n_nationkey", "n_name")
    line
      .join(orders, col("l_orderkey") === col("o_orderkey"))
      .join(cust, col("o_custkey") === col("c_custkey"))
      .join(broadcast(nation), col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("c_custkey"), col("c_name"), col("c_acctbal"),
        col("n_name"))
      .agg(dsum(col("l_extendedprice") * (lit(1) - col("l_discount")))
        .as("revenue"))
      .orderBy(desc("revenue"), col("c_custkey"))
      .limit(20)
  }

  val tpchQ10Sql: String =
    s"""SELECT c_custkey, c_name, c_acctbal, n_name,
       |  ${sqlDsum("l_extendedprice * (1 - l_discount)")} AS revenue
       |FROM lineitem
       |JOIN orders ON l_orderkey = o_orderkey
       |JOIN customer ON o_custkey = c_custkey
       |JOIN nation ON c_nationkey = n_nationkey
       |WHERE l_returnflag = 'R'
       |  AND o_orderdate >= TIMESTAMP '1996-10-01'
       |  AND o_orderdate < TIMESTAMP '1997-01-01'
       |GROUP BY c_custkey, c_name, c_acctbal, n_name
       |ORDER BY revenue DESC, c_custkey LIMIT 20""".stripMargin

  /** String-function battery over customer: substring, case, padding,
    * regex extraction, replace, reverse — each with an exact DuckDB
    * twin. */
  val stringFunctions: Q = (spark, dir) =>
    t(spark, dir, "customer")
      .select(
        col("c_custkey"),
        substring(col("c_name"), 1, 8).as("prefix"),
        upper(col("c_mktsegment")).as("seg_upper"),
        lpad(col("c_custkey").cast("string"), 10, "0").as("key_padded"),
        regexp_extract(col("c_name"), "([0-9]+)", 1).as("key_digits"),
        regexp_replace(col("c_name"), "Customer#", "C-").as("renamed"),
        reverse(col("c_mktsegment")).as("seg_rev"),
        length(col("c_name")).as("name_len"))
      .orderBy("c_custkey")

  val stringFunctionsSql: String =
    """SELECT c_custkey,
      |  substr(c_name, 1, 8) AS prefix,
      |  upper(c_mktsegment) AS seg_upper,
      |  lpad(CAST(c_custkey AS VARCHAR), 10, '0') AS key_padded,
      |  regexp_extract(c_name, '([0-9]+)', 1) AS key_digits,
      |  regexp_replace(c_name, 'Customer#', 'C-', 'g') AS renamed,
      |  reverse(c_mktsegment) AS seg_rev,
      |  CAST(length(c_name) AS INT) AS name_len
      |FROM customer ORDER BY c_custkey""".stripMargin

  /** Exact interpolated percentiles (Spark `percentile` ≙ DuckDB
    * `quantile_cont` — both linear interpolation over the sorted
    * values); rounded to 4dp to absorb the one interpolation multiply. */
  val percentileAgg: Q = (spark, dir) =>
    t(spark, dir, "lineitem")
      .groupBy("l_returnflag")
      .agg(
        round(expr("percentile(l_extendedprice, 0.5)"), 4).as("p50"),
        round(expr("percentile(l_extendedprice, 0.95)"), 4).as("p95"),
        count(lit(1)).as("n"))
      .orderBy("l_returnflag")

  val percentileAggSql: String =
    """SELECT l_returnflag,
      |  round(quantile_cont(l_extendedprice, 0.5), 4) AS p50,
      |  round(quantile_cont(l_extendedprice, 0.95), 4) AS p95,
      |  count(*) AS n
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  /** Array aggregation: per-customer sorted order-key list.
    * collect_list is unordered across partitions — sort_array makes it
    * deterministic; emitted as a joined string so the cross-engine
    * value compare is unambiguous. */
  val arrayAgg: Q = (spark, dir) =>
    t(spark, dir, "orders")
      .groupBy("o_custkey")
      .agg(
        count(lit(1)).as("n"),
        array_join(sort_array(collect_list(col("o_orderkey"))), ",")
          .as("order_keys"))
      .orderBy("o_custkey")

  val arrayAggSql: String =
    """SELECT o_custkey, count(*) AS n,
      |  list_aggregate(
      |    list_transform(list_sort(list(o_orderkey)), x -> CAST(x AS VARCHAR)),
      |    'string_agg', ',') AS order_keys
      |FROM orders GROUP BY o_custkey ORDER BY o_custkey""".stripMargin

  /** Global aggregate (reference: isolation.py:110 F.max select). */
  val globalAgg: Q = (spark, dir) =>
    t(spark, dir, "orders")
      .agg(
        count(lit(1)).as("n_orders"),
        min(col("o_totalprice")).as("min_price"),
        max(col("o_totalprice")).as("max_price"),
        date_format(max(to_date(col("o_orderdate"))), "yyyy-MM-dd")
          .as("last_order_date"))

  val globalAggSql: String =
    """SELECT count(*) AS n_orders, min(o_totalprice) AS min_price,
      |  max(o_totalprice) AS max_price,
      |  strftime(max(CAST(o_orderdate AS DATE)), '%Y-%m-%d') AS last_order_date
      |FROM orders""".stripMargin

  val countDistinctQ: Q = (spark, dir) =>
    t(spark, dir, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(
        countDistinct(col("l_orderkey")).as("n_orders"),
        countDistinct(col("l_suppkey")).as("n_suppliers"),
        count(lit(1)).as("n_rows"))
      .orderBy("l_returnflag")

  val countDistinctSql: String =
    """SELECT l_returnflag, count(DISTINCT l_orderkey) AS n_orders,
      |  count(DISTINCT l_suppkey) AS n_suppliers, count(*) AS n_rows
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  /** HyperLogLog++ approximate distinct — the at-scale variant of
    * count-distinct (§2.11). Sketch values are Spark-specific, so no
    * oracle (rows-only); exactness is asserted relative to the exact
    * counts in the ops test suite. */
  val approxDistinct: Q = (spark, dir) =>
    t(spark, dir, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(
        approx_count_distinct(col("l_orderkey"), rsd = 0.02).as("approx_orders"),
        countDistinct(col("l_orderkey")).as("exact_orders"))
      .orderBy("l_returnflag")

  // ------------------------------------------------- §2.6 sort / top-k

  val topK: Q = (spark, dir) =>
    t(spark, dir, "orders")
      .orderBy(desc("o_totalprice"), asc("o_orderkey"))
      .limit(50)
      .select("o_orderkey", "o_custkey", "o_totalprice")

  val topKSql: String =
    """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
      |ORDER BY o_totalprice DESC, o_orderkey LIMIT 50""".stripMargin

  // ---------------------------------------------------- §2.7 set ops

  val unionByNameQ: Q = (spark, dir) => {
    val hi = t(spark, dir, "orders").filter(col("o_totalprice") > 450000)
      .select(col("o_orderkey"), col("o_totalprice"), lit("high").as("bucket"))
    // deliberately different column order — unionByName's whole point
    val lo = t(spark, dir, "orders").filter(col("o_totalprice") < 5000)
      .select(lit("low").as("bucket"), col("o_totalprice"), col("o_orderkey"))
    hi.unionByName(lo)
      .select("o_orderkey", "o_totalprice", "bucket")
      .orderBy("o_orderkey")
  }

  val unionByNameSql: String =
    """SELECT o_orderkey, o_totalprice, bucket FROM (
      |  SELECT o_orderkey, o_totalprice, 'high' AS bucket FROM orders WHERE o_totalprice > 450000
      |  UNION ALL BY NAME
      |  SELECT 'low' AS bucket, o_totalprice, o_orderkey FROM orders WHERE o_totalprice < 5000)
      |ORDER BY o_orderkey""".stripMargin

  val exceptQ: Q = (spark, dir) => {
    val all = t(spark, dir, "customer").select("c_custkey")
    val active = t(spark, dir, "orders").select(col("o_custkey").as("c_custkey"))
    all.except(active).orderBy("c_custkey")
  }

  val exceptSql: String =
    """SELECT c_custkey FROM customer
      |EXCEPT
      |SELECT o_custkey AS c_custkey FROM orders
      |ORDER BY c_custkey""".stripMargin

  val intersectQ: Q = (spark, dir) => {
    val buyers = t(spark, dir, "orders").select(col("o_custkey").as("custkey"))
    val machinery = t(spark, dir, "customer")
      .filter(col("c_mktsegment") === "MACHINERY")
      .select(col("c_custkey").as("custkey"))
    buyers.intersect(machinery).orderBy("custkey")
  }

  val intersectSql: String =
    """SELECT o_custkey AS custkey FROM orders
      |INTERSECT
      |SELECT c_custkey AS custkey FROM customer WHERE c_mktsegment = 'MACHINERY'
      |ORDER BY custkey""".stripMargin

  /** Multiset set ops — EXCEPT ALL / INTERSECT ALL keep multiplicity
    * (a customer with 3 big orders and 1 flagged order survives
    * EXCEPT ALL twice), unlike their DISTINCT cousins above. */
  val exceptAllQ: Q = (spark, dir) => {
    val big = t(spark, dir, "orders")
      .filter(col("o_totalprice") > 300000)
      .select(col("o_custkey").as("custkey"))
    val flagged = t(spark, dir, "orders")
      .filter(col("o_orderstatus") === "F")
      .select(col("o_custkey").as("custkey"))
    big.exceptAll(flagged).orderBy("custkey")
  }

  val exceptAllSql: String =
    """SELECT o_custkey AS custkey FROM orders WHERE o_totalprice > 300000
      |EXCEPT ALL
      |SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'F'
      |ORDER BY custkey""".stripMargin

  val intersectAllQ: Q = (spark, dir) => {
    val big = t(spark, dir, "orders")
      .filter(col("o_totalprice") > 300000)
      .select(col("o_custkey").as("custkey"))
    val urgent = t(spark, dir, "orders")
      .filter(col("o_orderpriority") === "1-URGENT")
      .select(col("o_custkey").as("custkey"))
    big.intersectAll(urgent).orderBy("custkey")
  }

  val intersectAllSql: String =
    """SELECT o_custkey AS custkey FROM orders WHERE o_totalprice > 300000
      |INTERSECT ALL
      |SELECT o_custkey AS custkey FROM orders WHERE o_orderpriority = '1-URGENT'
      |ORDER BY custkey""".stripMargin

  /** Distribution window battery: ntile quartiles, percent_rank,
    * cume_dist over account balance within market segment — the §2.9
    * distribution trio; the window order is totalized with the key so
    * ntile bucket boundaries are deterministic under ties. */
  val windowDistQ: Q = (spark, dir) => {
    val w = Window.partitionBy(col("c_mktsegment"))
      .orderBy(col("c_acctbal"), col("c_custkey"))
    t(spark, dir, "customer")
      .select(col("c_custkey"), col("c_mktsegment"), col("c_acctbal"),
        ntile(4).over(w).as("balance_quartile"),
        round(percent_rank().over(w), 6).as("pct_rank"),
        round(cume_dist().over(w), 6).as("cume"))
      .orderBy("c_custkey")
  }

  val windowDistSql: String =
    """SELECT c_custkey, c_mktsegment, c_acctbal,
      |  CAST(ntile(4) OVER w AS INT) AS balance_quartile,
      |  round(percent_rank() OVER w, 6) AS pct_rank,
      |  round(cume_dist() OVER w, 6) AS cume
      |FROM customer
      |WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal, c_custkey)
      |ORDER BY c_custkey""".stripMargin

  // --------------------------------------------- §2.8 date/string scalars

  val dateFunctions: Q = (spark, dir) =>
    t(spark, dir, "events")
      .select(
        col("event_id"),
        date_format(to_date(col("ts")), "yyyy-MM-dd").as("event_date"),
        hour(col("ts")).as("event_hour"),
        col("event_type"))
      .orderBy("event_id")

  val dateFunctionsSql: String =
    """SELECT event_id, strftime(CAST(ts AS DATE), '%Y-%m-%d') AS event_date,
      |  CAST(hour(ts) AS INT) AS event_hour, event_type
      |FROM events ORDER BY event_id""".stripMargin

  // ----------------------------------------------- §2.11 window functions

  val windowRowNumber: Q = (spark, dir) => {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts").asc, col("event_id").asc)
    t(spark, dir, "events")
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3)
      .select("user_id", "rn", "event_id", "event_type")
      .orderBy("user_id", "rn")
  }

  val windowRowNumberSql: String =
    """SELECT user_id, CAST(row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS INT) AS rn,
      |  event_id, event_type
      |FROM events
      |QUALIFY rn <= 3
      |ORDER BY user_id, rn""".stripMargin

  val windowLag: Q = (spark, dir) => {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts").asc, col("event_id").asc)
    t(spark, dir, "events")
      .select(
        col("user_id"), col("event_id"), col("value"),
        lag(col("value"), 1).over(w).as("prev_value"),
        rank().over(Window.partitionBy(col("user_id"))
          .orderBy(col("value").desc, col("event_id").asc)).as("value_rank"))
      .orderBy("user_id", "event_id")
  }

  val windowLagSql: String =
    """SELECT user_id, event_id, value,
      |  lag(value, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_value,
      |  CAST(rank() OVER (PARTITION BY user_id ORDER BY value DESC, event_id) AS INT) AS value_rank
      |FROM events ORDER BY user_id, event_id""".stripMargin

  /** Sliding-frame aggregate; scaled-integer accumulation keeps the
    * rolling sum bit-identical across engines (double frame sums
    * re-associate; decimal casts of doubles diverge — Tables.iscale). */
  val windowFrame: Q = (spark, dir) => {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts").asc, col("event_id").asc)
      .rowsBetween(-2, 0)
    t(spark, dir, "events")
      .select(col("user_id"), col("event_id"),
        (sum(iscale(col("value"), 6)).over(w).cast("double") / lit(1e6))
          .cast("double").as("rolling_value"))
      .orderBy("user_id", "event_id")
  }

  val windowFrameSql: String =
    s"""SELECT user_id, event_id,
       |  CAST(CAST(sum(${sqlIscale("value", 6)}) OVER (
       |    PARTITION BY user_id ORDER BY ts, event_id
       |    ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS DOUBLE) / 1e6 AS DOUBLE) AS rolling_value
       |FROM events ORDER BY user_id, event_id""".stripMargin

  /** As-of join: each event picks the user's most recent order at event
    * time (union + running-last — see [[graft.ops.AsOfJoin]]); DuckDB's
    * native ASOF JOIN is the oracle. Orders pre-deduped to one per
    * (customer, day) so ties have a defined winner in both engines. */
  val asofJoin: Q = (spark, dir) => {
    val events = t(spark, dir, "events")
      .select(col("event_id"), col("user_id"),
        unix_timestamp(col("ts")).as("es"))
    val orders = t(spark, dir, "orders")
      .groupBy(col("o_custkey"),
        unix_timestamp(col("o_orderdate")).as("oes"))
      .agg(max(struct(col("o_orderkey"), col("o_totalprice"))).as("__m"))
      .select(col("o_custkey"), col("oes"),
        col("__m.o_orderkey").as("o_orderkey"),
        col("__m.o_totalprice").as("o_totalprice"))
    graft.ops.AsOfJoin.asOf(events, orders,
        leftKey = "user_id", rightKey = "o_custkey",
        leftTime = "es", rightTime = "oes",
        rightCols = Seq("o_orderkey", "o_totalprice"))
      .select("event_id", "user_id", "o_orderkey", "o_totalprice")
      .orderBy("event_id")
  }

  val asofJoinSql: String =
    """WITH e AS (SELECT event_id, user_id, CAST(floor(epoch(ts)) AS BIGINT) AS es FROM events),
      |o AS (SELECT o_custkey, CAST(floor(epoch(o_orderdate)) AS BIGINT) AS oes,
      |        max(o_orderkey) AS o_orderkey,
      |        arg_max(o_totalprice, o_orderkey) AS o_totalprice
      |      FROM orders GROUP BY 1, 2)
      |SELECT e.event_id, e.user_id, o.o_orderkey, o.o_totalprice
      |FROM e ASOF LEFT JOIN o ON e.user_id = o.o_custkey AND e.es >= o.oes
      |ORDER BY e.event_id""".stripMargin

  /** Forward as-of: each event attached to the user's EARLIEST order
    * at-or-after the event (pandas merge_asof direction='forward');
    * DuckDB's ASOF JOIN flips direction with the inequality. */
  val asofForward: Q = (spark, dir) => {
    val events = t(spark, dir, "events")
      .select(col("event_id"), col("user_id"),
        unix_timestamp(col("ts")).as("es"))
    val orders = t(spark, dir, "orders")
      .groupBy(col("o_custkey"),
        unix_timestamp(col("o_orderdate")).as("oes"))
      .agg(max(struct(col("o_orderkey"), col("o_totalprice"))).as("__m"))
      .select(col("o_custkey"), col("oes"),
        col("__m.o_orderkey").as("o_orderkey"),
        col("__m.o_totalprice").as("o_totalprice"))
    graft.ops.AsOfJoin.asOfForward(events, orders,
        leftKey = "user_id", rightKey = "o_custkey",
        leftTime = "es", rightTime = "oes",
        rightCols = Seq("o_orderkey", "o_totalprice"))
      .select("event_id", "user_id", "o_orderkey", "o_totalprice")
      .orderBy("event_id")
  }

  val asofForwardSql: String =
    """WITH e AS (SELECT event_id, user_id, CAST(floor(epoch(ts)) AS BIGINT) AS es FROM events),
      |o AS (SELECT o_custkey, CAST(floor(epoch(o_orderdate)) AS BIGINT) AS oes,
      |        max(o_orderkey) AS o_orderkey,
      |        arg_max(o_totalprice, o_orderkey) AS o_totalprice
      |      FROM orders GROUP BY 1, 2)
      |SELECT e.event_id, e.user_id, o.o_orderkey, o.o_totalprice
      |FROM e ASOF LEFT JOIN o ON e.user_id = o.o_custkey AND e.es <= o.oes
      |ORDER BY e.event_id""".stripMargin

  /** Nearest as-of: each event attached to the user's closest-in-time
    * order, backward on ties (merge_asof direction='nearest'); the
    * oracle composes DuckDB's two directional ASOF joins and picks the
    * nearer match with the same tie-break. */
  val asofNearest: Q = (spark, dir) => {
    val events = t(spark, dir, "events")
      .select(col("event_id"), col("user_id"),
        unix_timestamp(col("ts")).as("es"))
    val orders = t(spark, dir, "orders")
      .groupBy(col("o_custkey"),
        unix_timestamp(col("o_orderdate")).as("oes"))
      .agg(max(struct(col("o_orderkey"), col("o_totalprice"))).as("__m"))
      .select(col("o_custkey"), col("oes"),
        col("__m.o_orderkey").as("o_orderkey"),
        col("__m.o_totalprice").as("o_totalprice"))
    graft.ops.AsOfJoin.asOfNearest(events, orders,
        leftKey = "user_id", rightKey = "o_custkey",
        leftTime = "es", rightTime = "oes",
        rightCols = Seq("o_orderkey", "o_totalprice"))
      .select("event_id", "user_id", "o_orderkey", "o_totalprice")
      .orderBy("event_id")
  }

  val asofNearestSql: String =
    """WITH e AS (SELECT event_id, user_id, CAST(floor(epoch(ts)) AS BIGINT) AS es FROM events),
      |o AS (SELECT o_custkey, CAST(floor(epoch(o_orderdate)) AS BIGINT) AS oes,
      |        max(o_orderkey) AS o_orderkey,
      |        arg_max(o_totalprice, o_orderkey) AS o_totalprice
      |      FROM orders GROUP BY 1, 2),
      |b AS (SELECT e.event_id, e.user_id, e.es, o.oes AS boes,
      |        o.o_orderkey AS bok, o.o_totalprice AS btp
      |      FROM e ASOF LEFT JOIN o ON e.user_id = o.o_custkey AND e.es >= o.oes),
      |f AS (SELECT e.event_id, o.oes AS foes, o.o_orderkey AS fok,
      |        o.o_totalprice AS ftp
      |      FROM e ASOF LEFT JOIN o ON e.user_id = o.o_custkey AND e.es <= o.oes)
      |SELECT b.event_id, b.user_id,
      |  CASE WHEN boes IS NULL THEN fok
      |       WHEN foes IS NULL THEN bok
      |       WHEN (b.es - boes) <= (foes - b.es) THEN bok ELSE fok END AS o_orderkey,
      |  CASE WHEN boes IS NULL THEN ftp
      |       WHEN foes IS NULL THEN btp
      |       WHEN (b.es - boes) <= (foes - b.es) THEN btp ELSE ftp END AS o_totalprice
      |FROM b JOIN f USING (event_id)
      |ORDER BY event_id""".stripMargin

  /** Sessionization: 30-minute inactivity gap, per-session rollup.
    * Integer epoch arithmetic end to end — exact oracle. */
  val sessionize: Q = (spark, dir) =>
    graft.ops.Sessionize.sessions(
        t(spark, dir, "events"), "user_id", "ts", "event_id",
        gapSeconds = 1800)
      .select("user_id", "session_id", "n_events", "first_event",
        "duration_sec")
      .orderBy("user_id", "session_id")

  val sessionizeSql: String =
    """WITH marked AS (
      |  SELECT user_id, event_id,
      |    CAST(floor(epoch(ts)) AS BIGINT) AS es,
      |    CASE WHEN CAST(floor(epoch(ts)) AS BIGINT)
      |           - lag(CAST(floor(epoch(ts)) AS BIGINT)) OVER w IS NULL
      |         OR CAST(floor(epoch(ts)) AS BIGINT)
      |           - lag(CAST(floor(epoch(ts)) AS BIGINT)) OVER w > 1800
      |         THEN 1 ELSE 0 END AS is_start
      |  FROM events
      |  WINDOW w AS (PARTITION BY user_id
      |               ORDER BY CAST(floor(epoch(ts)) AS BIGINT), event_id)),
      |ids AS (
      |  SELECT user_id, event_id, es,
      |    CAST(sum(is_start) OVER (PARTITION BY user_id ORDER BY es, event_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS INT) AS session_id
      |  FROM marked)
      |SELECT user_id, session_id, count(*) AS n_events,
      |  min(event_id) AS first_event, max(es) - min(es) AS duration_sec
      |FROM ids GROUP BY user_id, session_id
      |ORDER BY user_id, session_id""".stripMargin

  // ------------------------------------------------ §2.11 dedup operators

  /** Exact dedup, deterministic survivor. Input doubles the documents
    * table (sf docs have no duplicates — the operator must find the
    * planted ones). */
  val dedupExact: Q = (spark, dir) => {
    val docs = t(spark, dir, "documents")
    val doubled = docs.select("doc_id", "text", "lang")
      .unionByName(docs.select((col("doc_id") + 1000000).as("doc_id"),
        col("text"), col("lang")))
    Dedup.exactDeterministic(doubled, Seq("text", "lang"), "doc_id")
      .select("doc_id", "lang")
      .orderBy("doc_id")
  }

  val dedupExactSql: String =
    """WITH doubled AS (
      |  SELECT doc_id, text, lang FROM documents
      |  UNION ALL
      |  SELECT doc_id + 1000000 AS doc_id, text, lang FROM documents)
      |SELECT min(doc_id) AS doc_id, lang FROM doubled
      |GROUP BY text, lang ORDER BY doc_id""".stripMargin

  /** Near-dup by normalized sha256 text hash. */
  val dedupHash: Q = (spark, dir) => {
    val docs = t(spark, dir, "documents")
    val doubled = docs.select("doc_id", "text")
      .unionByName(docs.select((col("doc_id") + 1000000).as("doc_id"),
        upper(col("text")).as("text")))
    Dedup.byNormalizedHash(doubled, "text", "doc_id")
      .select("text_hash", "doc_id", "dup_count")
      .orderBy("doc_id")
  }

  val dedupHashSql: String =
    """WITH doubled AS (
      |  SELECT doc_id, text FROM documents
      |  UNION ALL
      |  SELECT doc_id + 1000000 AS doc_id, upper(text) AS text FROM documents)
      |SELECT sha256(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS text_hash,
      |  min(doc_id) AS doc_id, count(*) AS dup_count
      |FROM doubled GROUP BY 1 ORDER BY doc_id""".stripMargin

  /** MinHash-LSH fuzzy dedup over planted duplicates (hash family is
    * Spark's xxhash64 — no SQL oracle; driver records rows-only). */
  val minhashDedup: Q = (spark, dir) => {
    val docs = t(spark, dir, "documents")
    val doubled = docs.select("doc_id", "text")
      .unionByName(docs.limit(200).select(
        (col("doc_id") + 1000000).as("doc_id"), col("text")))
    Dedup.minHashLshPairs(doubled, "doc_id", "text",
      numHashes = 32, bands = 8, jaccardThreshold = 0.8)
      .orderBy("id_a", "id_b")
  }

  /** Transitive duplicate grouping + corpus-level dedup: MinHash pairs →
    * connected components → one representative per group.
    *
    * ORACLE-CHECKED (round 15): every LSH stage is deterministic
    * (xxhash64 is a fixed function, the corpus is the fixed sf table
    * with copies of the deterministic `doc_id < 300` subset), and the
    * emitted pairs are exact-Jaccard-verified — the only hash
    * dependence left is candidate RECALL, i.e. whether every
    * truth pair (word-trigram Jaccard ≥ 0.9) lands in some shared
    * LSH bucket. At 32 hashes / 8 bands the per-pair miss odds are
    * (1−J⁴)⁸ ≤ 2·10⁻⁴ and the empirical check over the actual sf
    * tables shows FULL recall, so the DuckDB oracle recomputes the
    * same groups from exact all-shared-gram Jaccard + unrolled
    * min-label propagation. A future data refresh that planted a
    * pathological near-dup pair would surface as a loud hash
    * mismatch, not silent acceptance. */
  val dedupGroups: Q = (spark, dir) => {
    val docs = t(spark, dir, "documents")
    val doubled = docs.select("doc_id", "text")
      .unionByName(docs.filter(col("doc_id") < 300).select(
        (col("doc_id") + 1000000).as("doc_id"), col("text")))
    val pairs = Dedup.minHashLshPairs(doubled, "doc_id", "text",
      numHashes = 32, bands = 8, jaccardThreshold = 0.9)
    Dedup.duplicateGroups(pairs)
      .groupBy("label")
      .agg(count(lit(1)).as("group_size"), max("id").as("max_id"))
      .orderBy("label")
  }

  /** The oracle recomputes the truth the LSH pipeline approximates —
    * exact word-trigram-set Jaccard over shared-gram candidate pairs
    * (a J ≥ 0.9 pair must share a gram, so the candidate join is
    * exact, not a recall trade) — then the same min-label connected
    * components, unrolled as bounded CTE iterations (the exact-integer
    * trick q_pagerank uses): 6 rounds of "my label = min(mine, my
    * neighbors')" fixes every component whose min-label tree is ≤ 6
    * hops deep, far beyond the planted pair/cluster shapes. */
  val dedupGroupsSql: String =
    """WITH base AS (SELECT doc_id, text FROM documents),
      |corpus AS (
      |  SELECT doc_id, text FROM base
      |  UNION ALL
      |  SELECT doc_id + 1000000 AS doc_id, text FROM base
      |  WHERE doc_id < 300),
      |norm AS (SELECT doc_id,
      |    string_split(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ') AS toks
      |  FROM corpus),
      |grams AS (
      |  SELECT doc_id, list_distinct(CASE WHEN len(toks) >= 3
      |    THEN list_transform(generate_series(1, len(toks) - 2),
      |         i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])
      |    ELSE [array_to_string(toks, ' ')] END) AS g
      |  FROM norm),
      |flat AS (SELECT doc_id, unnest(g) AS gr FROM grams),
      |cand AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
      |         FROM flat a JOIN flat b
      |           ON a.gr = b.gr AND a.doc_id < b.doc_id),
      |pairs AS (
      |  SELECT c.id_a, c.id_b
      |  FROM cand c JOIN grams ga ON ga.doc_id = c.id_a
      |              JOIN grams gb ON gb.doc_id = c.id_b
      |  WHERE len(list_intersect(ga.g, gb.g))::DOUBLE /
      |        (len(ga.g) + len(gb.g) - len(list_intersect(ga.g, gb.g)))
      |        >= 0.9),
      |edges AS (SELECT id_a AS src, id_b AS dst FROM pairs
      |          UNION SELECT id_b AS src, id_a AS dst FROM pairs),
      |l0 AS (SELECT DISTINCT src AS id, src AS label FROM edges),
      |l1 AS (SELECT i.id, least(i.label, coalesce(min(n.label), i.label)) AS label
      |       FROM l0 i LEFT JOIN edges e ON e.src = i.id
      |                 LEFT JOIN l0 n ON n.id = e.dst
      |       GROUP BY i.id, i.label),
      |l2 AS (SELECT i.id, least(i.label, coalesce(min(n.label), i.label)) AS label
      |       FROM l1 i LEFT JOIN edges e ON e.src = i.id
      |                 LEFT JOIN l1 n ON n.id = e.dst
      |       GROUP BY i.id, i.label),
      |l3 AS (SELECT i.id, least(i.label, coalesce(min(n.label), i.label)) AS label
      |       FROM l2 i LEFT JOIN edges e ON e.src = i.id
      |                 LEFT JOIN l2 n ON n.id = e.dst
      |       GROUP BY i.id, i.label),
      |l4 AS (SELECT i.id, least(i.label, coalesce(min(n.label), i.label)) AS label
      |       FROM l3 i LEFT JOIN edges e ON e.src = i.id
      |                 LEFT JOIN l3 n ON n.id = e.dst
      |       GROUP BY i.id, i.label),
      |l5 AS (SELECT i.id, least(i.label, coalesce(min(n.label), i.label)) AS label
      |       FROM l4 i LEFT JOIN edges e ON e.src = i.id
      |                 LEFT JOIN l4 n ON n.id = e.dst
      |       GROUP BY i.id, i.label),
      |l6 AS (SELECT i.id, least(i.label, coalesce(min(n.label), i.label)) AS label
      |       FROM l5 i LEFT JOIN edges e ON e.src = i.id
      |                 LEFT JOIN l5 n ON n.id = e.dst
      |       GROUP BY i.id, i.label)
      |SELECT label, count(*) AS group_size, max(id) AS max_id
      |FROM l6 GROUP BY label ORDER BY label""".stripMargin

  /** SimHash near-dup pairs (custom Catalyst expression; no oracle). */
  val simhashDedup: Q = (spark, dir) => {
    val docs = t(spark, dir, "documents")
    val doubled = docs.select("doc_id", "text")
      .unionByName(docs.limit(200).select(
        (col("doc_id") + 1000000).as("doc_id"), col("text")))
    Dedup.simHashPairs(doubled, "doc_id", "text", maxHamming = 3)
      .orderBy("id_a", "id_b")
  }

  /** Char-trigram Jaccard near-dup pairs over a corpus with planted
    * suffix-modified copies, via the MinHash-LSH-bucketed scale path:
    * candidates come from band buckets (never the all-pairs product)
    * and every candidate is verified with the exact gram-set Jaccard,
    * so the result is byte-identical to the all-pairs DuckDB oracle.
    * The O(n²) form survives as [[Dedup.jaccardNgramPairs]] for
    * capped audits. */
  val jaccardNgram: Q = (spark, dir) => {
    val docs = t(spark, dir, "documents").filter(col("doc_id") < 100)
    val modified = docs.filter(col("doc_id") < 50)
      .select((col("doc_id") + 1000000).as("doc_id"),
        concat(col("text"), lit(" extra")).as("text"))
    val corpus = docs.select("doc_id", "text").unionByName(modified)
    Dedup.jaccardNgramPairsLsh(corpus, "doc_id", "text", n = 3,
        threshold = 0.8)
      .withColumn("jaccard", round(col("jaccard"), 6))
      .orderBy("id_a", "id_b")
  }

  val jaccardNgramSql: String =
    """WITH base AS (SELECT doc_id, text FROM documents WHERE doc_id < 100),
      |corpus AS (
      |  SELECT doc_id, text FROM base
      |  UNION ALL
      |  SELECT doc_id + 1000000 AS doc_id, text || ' extra' AS text
      |  FROM base WHERE doc_id < 50),
      |grams AS (
      |  SELECT doc_id,
      |    list_distinct(CASE WHEN length(t) >= 3
      |      THEN list_transform(generate_series(1, length(t) - 2), i -> substr(t, i, 3))
      |      ELSE [t] END) AS g
      |  FROM (SELECT doc_id,
      |          regexp_replace(lower(trim(text)), '\s+', ' ', 'g') AS t
      |        FROM corpus)),
      |pairs AS (
      |  SELECT a.doc_id AS id_a, b.doc_id AS id_b,
      |    CAST(len(list_intersect(a.g, b.g)) AS INT) AS common,
      |    CAST(len(list_intersect(a.g, b.g)) AS DOUBLE) /
      |      CAST(len(a.g) + len(b.g) - len(list_intersect(a.g, b.g)) AS DOUBLE) AS jaccard
      |  FROM grams a JOIN grams b ON a.doc_id < b.doc_id)
      |SELECT id_a, id_b, common, round(jaccard, 6) AS jaccard
      |FROM pairs WHERE jaccard >= 0.8 ORDER BY id_a, id_b""".stripMargin

  /** Information-density quality cut: per-doc token entropy (nats) via
    * the map-only run-length pass (no explode, no shuffle — see
    * TextAnalysis.tokenEntropy), docs under 2.5 nats dropped. The
    * filter compares the UNROUNDED entropy; rounding is presentation
    * only, mirrored in the oracle (which re-derives entropy the
    * relational way: unnest → per-token counts → Σ c·ln c). */
  val entropyFilterQ: Q = (spark, dir) =>
    TextAnalysis.entropyFilter(
        t(spark, dir, "documents").select("doc_id", "text"),
        "doc_id", "text", minEntropy = 2.5d)
      .select(col("doc_id"), col("n_tokens"),
        round(col("entropy"), 6).as("entropy"))
      .orderBy("doc_id")

  val entropyFilterSql: String =
    """WITH toks AS (
      |  SELECT doc_id,
      |    unnest(string_split_regex(trim(lower(text)), '\s+')) AS tok
      |  FROM documents),
      |tc AS (SELECT doc_id, tok, count(*) AS cnt FROM toks GROUP BY 1, 2),
      |h AS (SELECT doc_id, CAST(sum(cnt) AS INT) AS n_tokens,
      |        ln(CAST(sum(cnt) AS DOUBLE))
      |          - sum(cnt * ln(CAST(cnt AS DOUBLE))) / sum(cnt) AS e
      |      FROM tc GROUP BY doc_id)
      |SELECT doc_id, n_tokens, round(e, 6) AS entropy
      |FROM h WHERE e >= 2.5 ORDER BY doc_id""".stripMargin

  /** Gap-filled daily activity series: events bucketed per (user, day),
    * re-gridded over each user's min..max day so silent days appear as
    * explicit zeros — the activity-matrix prep no model sees raw event
    * streams without. One data-sized shuffle; grid explode and join run
    * over the compact bucket frame (TimeSeries.resample). */
  val resampleQ: Q = (spark, dir) =>
    graft.ops.TimeSeries.resample(
        t(spark, dir, "events"), "user_id", "ts", "day", "1 day",
        Seq(count(lit(1)).as("__ne"), sum(col("value")).as("__vs")))
      .select(col("user_id"), col("bucket").as("day"),
        coalesce(col("__ne"), lit(0L)).as("n_events"),
        coalesce(round(col("__vs"), 6), lit(0.0d)).as("value_sum"))
      .orderBy("user_id", "day")

  val resampleSql: String =
    """WITH b AS (
      |  SELECT user_id, date_trunc('day', ts) AS d,
      |         count(*) AS n_events, round(sum(value), 6) AS value_sum
      |  FROM events GROUP BY 1, 2),
      |r AS (SELECT user_id, min(d) AS mn, max(d) AS mx FROM b GROUP BY 1),
      |grid AS (
      |  SELECT user_id, unnest(generate_series(mn, mx, INTERVAL 1 DAY)) AS d
      |  FROM r)
      |SELECT g.user_id, g.d AS day,
      |       coalesce(b.n_events, 0) AS n_events,
      |       coalesce(b.value_sum, 0.0) AS value_sum
      |FROM grid g LEFT JOIN b ON g.user_id = b.user_id AND g.d = b.d
      |ORDER BY g.user_id, day""".stripMargin

  /** Forward fill: event values nulled on a deterministic pattern
    * (event_id % 3 = 0 — simulating sparse sensor reads), then each
    * user's last known value carried forward in (ts, event_id) order.
    * Leading nulls stay null (nothing to carry). One shuffle + sort;
    * every fill column shares the window (TimeSeries.forwardFill). */
  val forwardFillQ: Q = (spark, dir) =>
    graft.ops.TimeSeries.forwardFill(
        t(spark, dir, "events")
          .select(col("event_id"), col("user_id"), col("ts"),
            when(col("event_id") % 3 =!= 0, col("value")).as("v")),
        "user_id", Seq("ts", "event_id"), Seq("v"))
      .select(col("event_id"), col("user_id"), col("v"), col("v_filled"))
      .orderBy("event_id")

  val forwardFillSql: String =
    """WITH nulled AS (
      |  SELECT event_id, user_id, ts,
      |         CASE WHEN event_id % 3 = 0 THEN NULL ELSE value END AS v
      |  FROM events)
      |SELECT event_id, user_id, v,
      |  last_value(v IGNORE NULLS) OVER (
      |    PARTITION BY user_id ORDER BY ts, event_id
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS v_filled
      |FROM nulled ORDER BY event_id""".stripMargin

  /** Column profile of the orders table: exact per-column row/null/
    * distinct counts and numeric ranges in ONE aggregation pass,
    * unpivoted to a row per column (Profile.numericProfile) — the
    * stored-and-diffed data-quality reconnaissance artifact. */
  val columnProfile: Q = (spark, dir) =>
    graft.ops.Profile.numericProfile(
        t(spark, dir, "orders"),
        Seq("o_orderkey", "o_custkey", "o_totalprice"))
      .orderBy("col_name")

  val columnProfileSql: String =
    """SELECT 'o_orderkey' AS col_name, count(*) AS n_rows,
      |       count(*) - count(o_orderkey) AS n_nulls,
      |       count(DISTINCT o_orderkey) AS n_distinct,
      |       CAST(min(o_orderkey) AS DOUBLE) AS min_v,
      |       CAST(max(o_orderkey) AS DOUBLE) AS max_v FROM orders
      |UNION ALL
      |SELECT 'o_custkey', count(*), count(*) - count(o_custkey),
      |       count(DISTINCT o_custkey),
      |       CAST(min(o_custkey) AS DOUBLE),
      |       CAST(max(o_custkey) AS DOUBLE) FROM orders
      |UNION ALL
      |SELECT 'o_totalprice', count(*), count(*) - count(o_totalprice),
      |       count(DISTINCT o_totalprice),
      |       CAST(min(o_totalprice) AS DOUBLE),
      |       CAST(max(o_totalprice) AS DOUBLE) FROM orders
      |ORDER BY col_name""".stripMargin

  /** Ordered conversion funnel view → click → purchase, each step
    * within 24 h of the previous — greedy-earliest stage times, one
    * shuffle, no self-joins (Analytics.funnel). */
  val funnelQ: Q = (spark, dir) =>
    graft.ops.Analytics.funnel(t(spark, dir, "events"),
        "user_id", "ts", "event_type",
        Seq("view", "click", "purchase"), "24 hours")
      .orderBy("stage")

  val funnelSql: String =
    """WITH s1 AS (SELECT user_id, min(ts) AS t1 FROM events
      |            WHERE event_type = 'view' GROUP BY 1),
      |s2 AS (SELECT e.user_id, min(e.ts) AS t2
      |       FROM events e JOIN s1 USING (user_id)
      |       WHERE e.event_type = 'click' AND e.ts > s1.t1
      |         AND e.ts <= s1.t1 + INTERVAL 24 HOUR GROUP BY 1),
      |s3 AS (SELECT e.user_id, min(e.ts) AS t3
      |       FROM events e JOIN s2 USING (user_id)
      |       WHERE e.event_type = 'purchase' AND e.ts > s2.t2
      |         AND e.ts <= s2.t2 + INTERVAL 24 HOUR GROUP BY 1)
      |SELECT 1 AS stage, count(*) AS users FROM s1
      |UNION ALL SELECT 2, count(*) FROM s2
      |UNION ALL SELECT 3, count(*) FROM s3 ORDER BY stage""".stripMargin

  /** Cohort retention curve: users bucketed by first-activity day,
    * distinct-counted per (cohort, day offset). Cohort day is a
    * per-user window min — one shuffle, no join, no second event scan
    * (Analytics.cohortRetention). */
  val cohortRetentionQ: Q = (spark, dir) =>
    graft.ops.Analytics.cohortRetention(
        t(spark, dir, "events"), "user_id", "ts")
      .orderBy("cohort_day", "day_offset")

  val cohortRetentionSql: String =
    """WITH d AS (SELECT user_id, date_trunc('day', ts) AS day FROM events),
      |coh AS (SELECT user_id, min(day) AS cohort_day FROM d GROUP BY 1)
      |SELECT cohort_day,
      |  CAST(datediff('day', cohort_day, day) AS INT) AS day_offset,
      |       count(DISTINCT d.user_id) AS n_users
      |FROM d JOIN coh USING (user_id)
      |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  /** Per-type z-score outliers: |value − μ(type)| > 2σ(type) — the
    * monitoring cut. Stats frame broadcast back; flag compares the
    * UNROUNDED z, rounding is presentation (Analytics.zScoreOutliers). */
  val outliersQ: Q = (spark, dir) =>
    graft.ops.Analytics.zScoreOutliers(
        t(spark, dir, "events"), "event_type", "value", 2.0)
      .select(col("event_id"), col("event_type"),
        round(col("z"), 6).as("z"))
      .orderBy("event_id")

  val outliersSql: String =
    """WITH s AS (SELECT event_type, avg(value) AS mu,
      |                  stddev_samp(value) AS sd
      |           FROM events GROUP BY 1)
      |SELECT e.event_id, e.event_type,
      |       round((e.value - s.mu) / s.sd, 6) AS z
      |FROM events e JOIN s USING (event_type)
      |WHERE abs((e.value - s.mu) / s.sd) > 2 ORDER BY e.event_id""".stripMargin

  /** Wide → long unpivot of order metrics via the native Dataset API
    * (metric name + value rows) — the melt/stack surface; map-only
    * Expand, no shuffle. */
  val unpivotQ: Q = (spark, dir) =>
    t(spark, dir, "orders")
      .select(col("o_orderkey"),
        col("o_custkey").cast("double").as("o_custkey"),
        col("o_totalprice"))
      .unpivot(Array(col("o_orderkey")),
        Array(col("o_custkey"), col("o_totalprice")), "metric", "value")
      .orderBy("o_orderkey", "metric")

  val unpivotSql: String =
    """SELECT o_orderkey, 'o_custkey' AS metric,
      |       CAST(o_custkey AS DOUBLE) AS value FROM orders
      |UNION ALL
      |SELECT o_orderkey, 'o_totalprice', o_totalprice FROM orders
      |ORDER BY o_orderkey, metric""".stripMargin

  /** Unigram-LM quality score: per-doc mean −ln p(token) under the
    * corpus's own unigram distribution — the cheap perplexity proxy
    * (TextAnalysis.unigramLogProb); rounding is presentation only. */
  val unigramLogprobQ: Q = (spark, dir) =>
    TextAnalysis.unigramLogProb(
        t(spark, dir, "documents"), "doc_id", "text")
      .select(col("doc_id"), col("n_tokens"),
        round(col("avg_neg_logprob"), 6).as("avg_neg_logprob"))
      .orderBy("doc_id")

  val unigramLogprobSql: String =
    """WITH toks AS (
      |  SELECT doc_id,
      |    unnest(string_split_regex(trim(lower(text)), '\s+')) AS tok
      |  FROM documents),
      |freq AS (SELECT tok, count(*) AS c FROM toks GROUP BY 1),
      |total AS (SELECT sum(c) AS n FROM freq)
      |SELECT t.doc_id, count(*) AS n_tokens,
      |       round(avg(-(ln(f.c) - ln(total.n))), 6) AS avg_neg_logprob
      |FROM toks t JOIN freq f USING (tok) CROSS JOIN total
      |GROUP BY t.doc_id ORDER BY t.doc_id""".stripMargin

  /** Native session_window twin of the column-algebra sessionizer:
    * per-user gap sessions (30 min) with end = last event + gap —
    * batch here, identical code path streams
    * (StreamingOps.sessionWindowCounts). */
  val sessionWindowBatch: Q = (spark, dir) =>
    graft.streaming.StreamingOps.sessionWindowCounts(
        t(spark, dir, "events"), "ts", "user_id", "30 minutes")
      .orderBy("user_id", "session_start")

  val sessionWindowBatchSql: String =
    """WITH o AS (
      |  SELECT user_id, ts,
      |    CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
      |              IS NULL OR
      |              ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
      |              > INTERVAL 30 MINUTE
      |         THEN 1 ELSE 0 END AS new_s
      |  FROM events),
      |g AS (SELECT user_id, ts,
      |        sum(new_s) OVER (PARTITION BY user_id ORDER BY ts
      |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
      |      FROM o)
      |SELECT user_id, min(ts) AS session_start,
      |       max(ts) + INTERVAL 30 MINUTE AS session_end,
      |       count(*) AS n_events
      |FROM g GROUP BY user_id, sid
      |ORDER BY user_id, session_start""".stripMargin

  /** Operation history of a managed table (DESCRIBE HISTORY analogue):
    * a scratch table goes through write → merge → delete and the op
    * log comes back as ordered (step, operation, partition_fields) —
    * merge and delete recover the partitioning from the log itself
    * (self-describing layout), which the literal oracle pins. */
  val tableHistory: Q = (spark, dir) => {
    val st = new BasicStorage(spark)
    // the oracle pins the op LOG, not the data — a thin slice keeps the
    // three table operations cheap in BENCH without weakening the check
    val orders = t(spark, dir, "orders")
      .select("o_orderkey", "o_custkey", "o_totalprice", "o_orderstatus")
      .filter(col("o_orderkey") % 17 === 0)
    val path = java.nio.file.Files
      .createTempDirectory("graft_hist_q").toString + "/t"
    st.write(orders.filter(col("o_orderkey") % 5 =!= 0)
        .repartition(col("o_orderstatus")),
      path, "delta", "overwrite", Seq("o_orderstatus"))
    st.merge(orders.filter(col("o_orderkey") % 3 === 0), path,
      "full.o_orderkey = incremental.o_orderkey")
    graft.storage.Delete.where(spark, st, path, "o_totalprice > 400000")
    graft.storage.GraftLog.history(spark, path)
      .withColumn("step", row_number().over(
        Window.orderBy(col("timestamp").asc, col("seq").asc)))
      .select(col("step"), col("operation"), col("partition_fields"))
      .orderBy("step")
  }

  val tableHistorySql: String =
    """SELECT * FROM (VALUES
      |  (1, 'WRITE', 'o_orderstatus'),
      |  (2, 'MERGE', 'o_orderstatus'),
      |  (3, 'DELETE', 'o_orderstatus'))
      |  AS t(step, operation, partition_fields)
      |ORDER BY step""".stripMargin

  /** Declarative data-quality gate: five expectation rules (null-free,
    * unique key, value range, accepted set, regex shape) evaluated in
    * ONE aggregation pass and unpivoted to (rule, violations) — the
    * row-level sibling of the schema audit (Expectations.check). */
  val expectationsQ: Q = (spark, dir) =>
    graft.core.Expectations.check(t(spark, dir, "customer"), Seq(
        graft.core.Expectations.NotNull("c_name"),
        graft.core.Expectations.Unique(Seq("c_custkey")),
        graft.core.Expectations.InRange("c_acctbal", -900, 9000),
        graft.core.Expectations.OneOf("c_mktsegment",
          Seq("AUTOMOBILE", "BUILDING", "FURNITURE", "MACHINERY")),
        graft.core.Expectations.Matches("c_name", "^Customer#[0-9]{9}$"),
        graft.core.Expectations.Satisfies("name_matches_key",
          "c_name = format_string('Customer#%09d', c_custkey)")))
      .orderBy("rule")

  val expectationsSql: String =
    """SELECT 'in_range(c_acctbal)' AS rule,
      |       count(*) FILTER (c_acctbal IS NOT NULL
      |         AND (CAST(c_acctbal AS DOUBLE) < -900
      |              OR CAST(c_acctbal AS DOUBLE) > 9000)) AS violations
      |FROM customer
      |UNION ALL SELECT 'matches(c_name)',
      |  count(*) FILTER (c_name IS NOT NULL
      |    AND NOT regexp_matches(c_name, '^Customer#[0-9]{9}$'))
      |FROM customer
      |UNION ALL SELECT 'not_null(c_name)',
      |  count(*) FILTER (c_name IS NULL) FROM customer
      |UNION ALL SELECT 'one_of(c_mktsegment)',
      |  count(*) FILTER (c_mktsegment IS NOT NULL AND c_mktsegment
      |    NOT IN ('AUTOMOBILE','BUILDING','FURNITURE','MACHINERY'))
      |FROM customer
      |UNION ALL SELECT 'satisfies(name_matches_key)',
      |  count(*) FILTER
      |    (NOT (c_name = printf('Customer#%09d', c_custkey)))
      |FROM customer
      |UNION ALL SELECT 'unique(c_custkey)',
      |  count(*) FILTER (c_custkey IS NOT NULL) - count(DISTINCT c_custkey)
      |FROM customer
      |ORDER BY rule""".stripMargin

  /** Referential-integrity audit (dbt "relationships" test): orders→
    * customer is clean by construction; lineitem is checked against a
    * deliberately RESTRICTED order set (keys divisible by 7 removed)
    * so the orphan count is non-zero and the counting path is
    * actually exercised (Expectations.checkReferential; left-anti
    * joins, one count row each, unioned). */
  val referentialQ: Q = (spark, dir) =>
    graft.core.Expectations.checkReferential(
        t(spark, dir, "orders"), "o_custkey",
        t(spark, dir, "customer"), "c_custkey", "customer")
      .unionByName(graft.core.Expectations.checkReferential(
        t(spark, dir, "lineitem"), "l_orderkey",
        t(spark, dir, "orders").filter(col("o_orderkey") % 7 =!= 0),
        "o_orderkey", "orders_no7"))
      .orderBy("rule")

  val referentialSql: String =
    """SELECT 'referential(o_custkey->customer.c_custkey)' AS rule,
      |  count(*) FILTER (o_custkey IS NOT NULL AND o_custkey NOT IN
      |    (SELECT c_custkey FROM customer WHERE c_custkey IS NOT NULL))
      |    AS violations
      |FROM orders
      |UNION ALL
      |SELECT 'referential(l_orderkey->orders_no7.o_orderkey)',
      |  count(*) FILTER (l_orderkey IS NOT NULL AND l_orderkey NOT IN
      |    (SELECT o_orderkey FROM orders
      |     WHERE o_orderkey IS NOT NULL AND o_orderkey % 7 <> 0))
      |FROM lineitem
      |ORDER BY rule""".stripMargin

  /** Robust (median/MAD) per-type outliers at 3 robust sigmas — the
    * cut that survives mean/stddev self-masking
    * (Analytics.madOutliers); flag on the UNROUNDED robust z, rounding
    * is presentation. */
  val madOutliersQ: Q = (spark, dir) =>
    graft.ops.Analytics.madOutliers(
        t(spark, dir, "events"), "event_type", "value", 3.0)
      .select(col("event_id"), col("event_type"),
        round(col("z_mad"), 6).as("z_mad"))
      .orderBy("event_id")

  val madOutliersSql: String =
    """WITH m AS (SELECT event_type, median(value) AS med
      |           FROM events GROUP BY 1),
      |d AS (SELECT e.event_id, e.event_type, e.value, m.med
      |      FROM events e JOIN m USING (event_type)),
      |s AS (SELECT event_type, median(abs(value - med)) AS mad
      |      FROM d GROUP BY 1)
      |SELECT d.event_id, d.event_type,
      |       round((d.value - d.med) / (1.4826 * s.mad), 6) AS z_mad
      |FROM d JOIN s USING (event_type)
      |WHERE s.mad > 0
      |  AND abs((d.value - d.med) / (1.4826 * s.mad)) > 3
      |ORDER BY d.event_id""".stripMargin

  /** Deterministic 5-doc reservoir per language via the bounded
    * custom top-k aggregate — at most k values per group per partition
    * cross the shuffle, never the group's row set
    * (Sampling.reservoirPerGroup over functions.BoundedTopKAgg). */
  val reservoirSampleQ: Q = (spark, dir) =>
    graft.ops.Sampling.reservoirPerGroup(
        t(spark, dir, "documents"), "lang", "doc_id", 5)
      .orderBy("lang", "doc_id")

  val reservoirSampleSql: String =
    """SELECT lang, doc_id FROM documents
      |QUALIFY row_number() OVER (PARTITION BY lang
      |  ORDER BY ((doc_id % 2147483648) * 2654435761)
      |           % 4294967296 % 1000000, doc_id) <= 5
      |ORDER BY lang, doc_id""".stripMargin

  /** User growth curve: first-seen day per user → daily new users →
    * running cumulative total (the exact decomposition of a cumulative
    * count-distinct, which windows can't express directly)
    * (Analytics.cumulativeUsers). */
  val cumulativeUsersQ: Q = (spark, dir) =>
    graft.ops.Analytics.cumulativeUsers(
        t(spark, dir, "events"), "user_id", "ts")
      .orderBy("day")

  val cumulativeUsersSql: String =
    """WITH f AS (SELECT user_id, min(date_trunc('day', ts)) AS day
      |           FROM events GROUP BY 1),
      |n AS (SELECT day, count(*) AS new_users FROM f GROUP BY 1)
      |SELECT day, new_users,
      |       CAST(sum(new_users) OVER (ORDER BY day
      |         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      |         AS BIGINT) AS cum_users
      |FROM n ORDER BY day""".stripMargin

  /** Batch twin of the streaming per-window top-k: 3 largest-value
    * events per epoch-aligned UTC day, ranked (value desc, id asc) via
    * the bounded aggregate — identical code path streams with ≤ k
    * state entries per window (StreamingOps.windowTopK). */
  val windowTopKBatch: Q = (spark, dir) =>
    graft.streaming.StreamingOps.windowTopK(
        t(spark, dir, "events"), "ts", "event_id", "value", "1 day", 3)
      .select(date_format(col("window_start"), "yyyy-MM-dd").as("window_day"),
        col("rank"), col("event_id"), round(col("value"), 6).as("value"))
      .orderBy("window_day", "rank")

  val windowTopKBatchSql: String =
    """SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS window_day,
      |  CAST(row_number() OVER (PARTITION BY date_trunc('day', ts)
      |    ORDER BY value DESC, event_id) AS INT) AS rank,
      |  event_id, round(value, 6) AS value
      |FROM events WHERE value IS NOT NULL
      |QUALIFY rank <= 3 ORDER BY window_day, rank""".stripMargin

  /** Rolling 7-day active users per observed day — exact trailing
    * distinct via user-day fan-out bounded to real event days
    * (Analytics.rollingActive). */
  val rollingActiveQ: Q = (spark, dir) =>
    graft.ops.Analytics.rollingActive(
        t(spark, dir, "events"), "user_id", "ts", 7)
      .orderBy("obs_day")

  val rollingActiveSql: String =
    """WITH d AS (SELECT DISTINCT user_id, date_trunc('day', ts) AS day
      |           FROM events),
      |x AS (SELECT user_id, day + INTERVAL (o) DAY AS obs_day
      |      FROM d, generate_series(0, 6) AS g(o))
      |SELECT obs_day, count(DISTINCT user_id) AS active_users
      |FROM x WHERE obs_day IN (SELECT day FROM d)
      |GROUP BY 1 ORDER BY 1""".stripMargin

  /** Gopher-style repetition scrub: duplicate-token and top-bigram
    * fractions per doc, flagged when either crosses its threshold
    * (0.5 / 0.2) — flag computed on UNROUNDED fractions, mirrored
    * exactly in the oracle. */
  val repetitionFilter: Q = (spark, dir) =>
    TextAnalysis.repetitionStats(t(spark, dir, "documents"), "doc_id", "text")
      .withColumn("flagged",
        (col("top_bigram_frac") > 0.2d || col("dup_token_frac") > 0.5d)
          .cast("int"))
      .select(col("doc_id"), col("n_tokens"),
        round(col("dup_token_frac"), 6).as("dup_token_frac"),
        round(col("top_bigram_frac"), 6).as("top_bigram_frac"),
        col("flagged"))
      .orderBy("doc_id")

  val repetitionFilterSql: String =
    """WITH base AS (
      |  SELECT doc_id, ts, len(ts) AS n_tokens,
      |    len(list_distinct(ts)) AS n_distinct
      |  FROM (SELECT doc_id,
      |          string_split_regex(trim(lower(text)), '\s+') AS ts
      |        FROM documents)
      |  WHERE len(ts) >= 4),
      |bg AS (
      |  SELECT doc_id, unnest(list_transform(generate_series(1, len(ts) - 1),
      |    i -> ts[i] || ' ' || ts[i+1])) AS bigram
      |  FROM base),
      |top AS (
      |  SELECT doc_id, max(c) AS top_cnt
      |  FROM (SELECT doc_id, bigram, count(*) AS c FROM bg GROUP BY 1, 2)
      |  GROUP BY doc_id)
      |SELECT b.doc_id, CAST(b.n_tokens AS INT) AS n_tokens,
      |  round(1.0 - CAST(n_distinct AS DOUBLE) / CAST(n_tokens AS DOUBLE), 6)
      |    AS dup_token_frac,
      |  round(CAST(top_cnt AS DOUBLE) * 2.0 / CAST(n_tokens AS DOUBLE), 6)
      |    AS top_bigram_frac,
      |  CAST(CASE WHEN CAST(top_cnt AS DOUBLE) * 2.0 / CAST(n_tokens AS DOUBLE) > 0.2
      |         OR 1.0 - CAST(n_distinct AS DOUBLE) / CAST(n_tokens AS DOUBLE) > 0.5
      |       THEN 1 ELSE 0 END AS INT) AS flagged
      |FROM base b JOIN top USING (doc_id) ORDER BY b.doc_id""".stripMargin

  /** Benchmark decontamination: training docs (doc_id % 10 != 0)
    * sharing any 5-word-gram with the eval slice (doc_id % 10 == 0)
    * are flagged with their distinct-shared-gram count. One join keyed
    * by the gram itself — never corpus × corpus. */
  val decontaminate: Q = (spark, dir) => {
    val docs = t(spark, dir, "documents").select("doc_id", "text")
    val train = docs.filter(col("doc_id") % 10 =!= 0)
    val eval = docs.filter(col("doc_id") % 10 === 0)
    Dedup.contaminationOverlap(train, eval, "doc_id", "text", n = 5)
      .orderBy("doc_id")
  }

  val decontaminateSql: String =
    """WITH toks AS (
      |  SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS ts
      |  FROM documents),
      |grams AS (
      |  SELECT DISTINCT doc_id, gram
      |  FROM (SELECT doc_id, unnest(CASE WHEN len(ts) >= 5
      |      THEN list_transform(generate_series(1, len(ts) - 4),
      |        i -> array_to_string(ts[i:i+4], ' '))
      |      ELSE [array_to_string(ts, ' ')] END) AS gram
      |    FROM toks)),
      |eval_g AS (
      |  SELECT DISTINCT gram FROM grams WHERE doc_id % 10 = 0)
      |SELECT g.doc_id, count(*) AS shared_grams
      |FROM grams g JOIN eval_g e USING (gram)
      |WHERE g.doc_id % 10 != 0
      |GROUP BY g.doc_id ORDER BY g.doc_id""".stripMargin

  /** Sequence packing: fill 512-token bins with documents, packing in
    * doc_id order within independent 50-doc shards (the unit of
    * parallelism — a global greedy pack would serialize; see
    * [[Packing]]). Reports per-(shard, bin) doc and token totals. */
  val sequencePack: Q = (spark, dir) =>
    Packing.packingSummary(t(spark, dir, "documents"), "doc_id", "text",
        shard = floor(col("doc_id") / 50).cast("long"), budget = 512)
      .orderBy("shard", "bin")

  val sequencePackSql: String =
    """WITH d AS (
      |  SELECT doc_id, doc_id // 50 AS shard,
      |    CAST(len(string_split_regex(trim(lower(text)), '\s+')) AS BIGINT)
      |      AS n_tokens
      |  FROM documents),
      |c AS (
      |  SELECT doc_id, shard, n_tokens,
      |    sum(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id
      |      ROWS UNBOUNDED PRECEDING) AS cum
      |  FROM d)
      |SELECT shard, CAST((cum - n_tokens) // 512 AS BIGINT) AS bin,
      |  count(*) AS n_docs, CAST(sum(n_tokens) AS BIGINT) AS bin_tokens
      |FROM c GROUP BY shard, bin ORDER BY shard, bin""".stripMargin

  /** Max-abs int8 embedding quantization: per-vector scale + quantized
    * components (spot-checked head values and full checksum — the
    * whole vector is compared through qsum without 64 output
    * columns). */
  val embeddingQuantize: Q = (spark, dir) =>
    t(spark, dir, "embeddings")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      .withColumn("__ma", Similarity.maxAbs(col("v")))
      .withColumn("__q", Similarity.quantizeInt8(col("v"), col("__ma")))
      .select(col("vec_id"),
        round(col("__ma") / 127.0d, 6).as("scale"),
        element_at(col("__q"), 1).as("q0"),
        element_at(col("__q"), 2).as("q1"),
        aggregate(col("__q"), lit(0L), (acc, x) => acc + x).as("qsum"))
      .orderBy("vec_id")

  val embeddingQuantizeSql: String =
    """WITH m AS (
      |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
      |    list_max(list_transform(CAST(embedding AS DOUBLE[]),
      |      x -> abs(x))) AS maxabs
      |  FROM embeddings),
      |q AS (
      |  SELECT vec_id, maxabs,
      |    CASE WHEN maxabs = 0 THEN list_transform(v, x -> 0)
      |      ELSE list_transform(v, x -> CAST(round(x / maxabs * 127) AS INT))
      |    END AS qv
      |  FROM m)
      |SELECT vec_id, round(maxabs / 127, 6) AS scale,
      |  qv[1] AS q0, qv[2] AS q1,
      |  CAST(list_sum(qv) AS BIGINT) AS qsum
      |FROM q ORDER BY vec_id""".stripMargin

  /** Bloom-prefilter join: orders Bloom-filtered map-side by the
    * BUILDING customers' keys before the exact join — row-identical to
    * the plain join (the oracle IS the plain join; false positives die
    * in the exact join), but only plausible matches reach the join's
    * exchange. The sketch moves to the driver, never the keys. */
  val bloomJoin: Q = (spark, dir) => {
    val cust = t(spark, dir, "customer")
      .filter(col("c_mktsegment") === "BUILDING")
      .select(col("c_custkey"), col("c_name"))
    val orders = t(spark, dir, "orders")
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
    graft.ops.BloomJoin.bloomPrefilterJoin(
        orders, "o_custkey", cust, "c_custkey", expectedItems = 100000L)
      .select("o_orderkey", "o_custkey", "c_name", "o_totalprice")
      .orderBy("o_orderkey")
  }

  val bloomJoinSql: String =
    """SELECT o_orderkey, o_custkey, c_name, o_totalprice
      |FROM orders JOIN customer ON o_custkey = c_custkey
      |WHERE c_mktsegment = 'BUILDING'
      |ORDER BY o_orderkey""".stripMargin

  /** Range (point-in-interval) join: every lineitem row lands in its
    * quantity band via a broadcast nested-loop join — the small interval
    * table broadcasts, the fact table streams through one pass with no
    * shuffle before the final aggregation. */
  val rangeJoin: Q = (spark, dir) => {
    val bands = spark.createDataFrame(Seq(
      (0.0d, 10.0d, "low"), (10.0d, 25.0d, "mid"), (25.0d, 51.0d, "high")))
      .toDF("lo", "hi", "band")
    t(spark, dir, "lineitem")
      .join(broadcast(bands),
        col("l_quantity") >= col("lo") && col("l_quantity") < col("hi"))
      .groupBy("band")
      .agg(count(lit(1)).as("n"), dsum(col("l_extendedprice")).as("total_price"))
      .orderBy("band")
  }

  val rangeJoinSql: String =
    s"""SELECT band, count(*) AS n, ${sqlDsum("l_extendedprice")} AS total_price
       |FROM lineitem
       |JOIN (VALUES (0.0, 10.0, 'low'), (10.0, 25.0, 'mid'), (25.0, 51.0, 'high'))
       |  AS bands(lo, hi, band)
       |  ON l_quantity >= lo AND l_quantity < hi
       |GROUP BY band ORDER BY band""".stripMargin

  // ------------------------------------------- §2.11 similarity search

  /** Per-label mean embedding (class centroids), exploded to
    * (label, n, pos, value) rows so the oracle compares scalars;
    * averaged in double on both engines, round 6. */
  val embeddingCentroid: Q = (spark, dir) =>
    Similarity.labelCentroids(t(spark, dir, "embeddings"), "label", "embedding")
      .select(col("label"), col("n"),
        posexplode(col("centroid")).as(Seq("pos", "cv")))
      .select(col("label"), col("n"), col("pos"), round(col("cv"), 6).as("cv"))
      .orderBy("label", "pos")

  val embeddingCentroidSql: String =
    """WITH ex AS (
      |  SELECT label, unnest(embedding)::DOUBLE AS v,
      |    CAST(generate_subscripts(embedding, 1) - 1 AS INT) AS pos
      |  FROM embeddings)
      |SELECT label, count(*) AS n, pos, round(avg(v), 6) AS cv
      |FROM ex GROUP BY label, pos ORDER BY label, pos""".stripMargin

  /** Brute-force cosine top-k (exact baseline). Cosines computed in
    * double with identical fold order on both engines; ordering ties
    * broken on the rounded value + neighbor id so both engines rank
    * identically. */
  val cosineTopK: Q = (spark, dir) => {
    val emb = t(spark, dir, "embeddings")
    val queries = emb.filter(col("vec_id") < 5)
    Similarity.bruteForceTopK(queries, emb, "vec_id", "vec_id", "embedding", 10)
      .withColumn("cos", round(col("cos"), 6))
      .select("query_id", "neighbor_id", "rank", "cos")
      .orderBy("query_id", "rank")
  }

  val cosineTopKSql: String =
    """WITH q AS (SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv
      |           FROM embeddings WHERE vec_id < 5),
      |c AS (SELECT vec_id AS neighbor_id, CAST(embedding AS DOUBLE[]) AS cv FROM embeddings),
      |scored AS (
      |  SELECT query_id, neighbor_id,
      |    list_dot_product(qv, cv) / (sqrt(list_dot_product(qv, qv)) * sqrt(list_dot_product(cv, cv))) AS cos
      |  FROM c CROSS JOIN q WHERE neighbor_id != query_id),
      |ranked AS (
      |  SELECT query_id, neighbor_id,
      |    CAST(row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS INT) AS rank,
      |    round(cos, 6) AS cos
      |  FROM scored)
      |SELECT query_id, neighbor_id, rank, cos FROM ranked
      |WHERE rank <= 10 ORDER BY query_id, rank""".stripMargin

  /** kNN majority-vote classification: 20 query vectors labeled by
    * their 10 exact-cosine nearest neighbors' modal label — the
    * auto-tagging shape (topic/domain labels propagated from a seed
    * set). Every tie deterministic: rank on (cos desc, id), vote on
    * (votes desc, label asc). */
  val knnLabel: Q = (spark, dir) => {
    val emb = t(spark, dir, "embeddings")
    Similarity.knnClassify(emb.filter(col("vec_id") < 20), emb,
        "vec_id", "vec_id", "embedding", "label", 10)
      .orderBy("query_id")
  }

  val knnLabelSql: String =
    """WITH q AS (SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv
      |           FROM embeddings WHERE vec_id < 20),
      |c AS (SELECT vec_id AS neighbor_id, label,
      |        CAST(embedding AS DOUBLE[]) AS cv FROM embeddings),
      |scored AS (
      |  SELECT query_id, neighbor_id, label,
      |    list_dot_product(qv, cv) / (sqrt(list_dot_product(qv, qv)) * sqrt(list_dot_product(cv, cv))) AS cos
      |  FROM c CROSS JOIN q WHERE neighbor_id != query_id),
      |ranked AS (
      |  SELECT query_id, label,
      |    row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rank
      |  FROM scored),
      |votes AS (
      |  SELECT query_id, label, count(*) AS votes FROM ranked
      |  WHERE rank <= 10 GROUP BY 1, 2),
      |best AS (
      |  SELECT query_id, label AS predicted_label, votes,
      |    row_number() OVER (PARTITION BY query_id ORDER BY votes DESC, label) AS rn
      |  FROM votes)
      |SELECT query_id, predicted_label, votes FROM best
      |WHERE rn = 1 ORDER BY query_id""".stripMargin

  /** Embedding-cosine near-dup detection: the corpus unioned with a
    * scaled copy of itself (cosine is scale-invariant → planted pairs at
    * cos 1.0; natural pairs top out at ~0.51 on this data), scored via
    * the sign-LSH-bucketed scale path — only pairs sharing a hyperplane
    * bucket are scored, the all-pairs product never materializes. At
    * threshold 0.99 the candidate set is recall-complete: a vector and
    * its positive-scale copy have identical signs against every
    * hyperplane, so they share every bucket. Brute force survives as
    * [[Similarity.bruteForceNearDupPairs]] for capped audits. */
  val embeddingNearDup: Q = (spark, dir) => {
    val emb = t(spark, dir, "embeddings").filter(col("vec_id") < 1000)
    val scaled = emb.select((col("vec_id") + 1000000).as("vec_id"),
      transform(col("embedding").cast("array<double>"), x => x * 1.01)
        .as("embedding"))
    val corpus = emb.select(col("vec_id"),
      col("embedding").cast("array<double>").as("embedding"))
      .unionByName(scaled)
    Similarity.lshNearDupPairs(corpus, "vec_id", "embedding", 0.99,
        dim = 64)
      .withColumn("cos", round(col("cos"), 6))
      .orderBy("id_a", "id_b")
  }

  val embeddingNearDupSql: String =
    """WITH base AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings WHERE vec_id < 1000),
      |corpus AS (
      |  SELECT vec_id, v FROM base
      |  UNION ALL
      |  SELECT vec_id + 1000000 AS vec_id, list_transform(v, x -> x * 1.01) AS v FROM base),
      |pairs AS (
      |  SELECT a.vec_id AS id_a, b.vec_id AS id_b,
      |    list_dot_product(a.v, b.v) / (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v))) AS cos
      |  FROM corpus a CROSS JOIN corpus b WHERE a.vec_id < b.vec_id)
      |SELECT id_a, id_b, round(cos, 6) AS cos FROM pairs
      |WHERE cos >= 0.99 ORDER BY id_a, id_b""".stripMargin

  /** LSH-bucketed ANN (the 100 TB scale path; no oracle — rows-only). */
  val annLsh: Q = (spark, dir) => {
    val emb = t(spark, dir, "embeddings")
    val queries = emb.filter(col("vec_id") < 5)
    Similarity.lshTopK(queries, emb, "vec_id", "vec_id", "embedding",
      k = 10, dim = 64, nPlanes = 4, nTables = 8)
      .withColumn("cos", round(col("cos"), 6))
      .orderBy("query_id", "rank")
  }

  /** IVF ANN: learned-centroid cells + nProbe search with spilled
    * corpus assignment (no oracle; recall@10 ≥ 0.9 floor pinned in
    * OpsSpec at exactly these parameters). */
  val annIvf: Q = (spark, dir) => {
    val emb = t(spark, dir, "embeddings")
    val queries = emb.filter(col("vec_id") < 5)
    Similarity.ivfTopK(queries, emb, "vec_id", "vec_id", "embedding",
      k = 10, nCentroids = 16, nProbe = 6, iterations = 2,
      trainSampleMod = 4, corpusSpill = 2)
      .withColumn("cos", round(col("cos"), 6))
      .orderBy("query_id", "rank")
  }

  /** IVF-PQ (IVFADC) composed ANN ([[Similarity.ivfPqSearch]]): cell
    * pruning bounds WHICH rows score, PQ codes bound what each score
    * COSTS — the billion-scale index shape. Queries are planted
    * corpus copies (new ids), so the self-retrieval contract is
    * checkable; no oracle BY DESIGN (Spark-hash cell seeding + float
    * centroid averages), copy-retrieval floor pinned in `OpsSpec`. */
  val annIvfPq: Q = (spark, dir) => {
    val emb = t(spark, dir, "embeddings")
    val queries = emb.filter(col("vec_id") < 5)
      .select((col("vec_id") + 1000000).as("vec_id"), col("embedding"))
    Similarity.ivfPqSearch(queries, emb, "vec_id", "vec_id", "embedding",
      topK = 10, nCentroids = 16, nProbe = 6, ivfIterations = 2,
      trainSampleMod = 4, corpusSpill = 2, m = 4, pqK = 16,
      pqIterations = 2)
      .orderBy("query_id", "rank")
  }

  // ---------------------------------------------- §2.11 text analysis

  val textStats: Q = (spark, dir) =>
    // tokens projected ONCE: Catalyst does not eliminate the common
    // split/regexp subtree across lambda-bearing expressions, and
    // recomputing it per stat is 13x slower (measured at sf0.1)
    t(spark, dir, "documents")
      .withColumn("__toks", TextAnalysis.tokens(col("text")))
      .select(
        col("doc_id"),
        length(col("text")).as("n_chars"),
        size(col("__toks")).as("n_tokens"),
        round(aggregate(col("__toks"), lit(0), (a, w) => a + length(w))
          .cast("double") / size(col("__toks")).cast("double"), 6)
          .as("mean_token_len"),
        TextAnalysis.fingerprint(col("text")).as("fingerprint"))
      .orderBy("doc_id")

  val textStatsSql: String =
    """SELECT doc_id, CAST(length(text) AS INT) AS n_chars,
      |  CAST(len(string_split_regex(trim(lower(text)), '\s+')) AS INT) AS n_tokens,
      |  round(CAST(length(replace(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ', '')) AS DOUBLE)
      |        / CAST(len(string_split_regex(trim(lower(text)), '\s+')) AS DOUBLE), 6) AS mean_token_len,
      |  sha256(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS fingerprint
      |FROM documents ORDER BY doc_id""".stripMargin

  /** Language histogram over the declared lang column (lang-filter [Q]);
    * the heuristic classifier's agreement with it rides along as a
    * Spark-only metric in q_lang_predict (no oracle). */
  val langFilter: Q = (spark, dir) =>
    t(spark, dir, "documents")
      .filter(col("lang").isin("en", "de", "fr"))
      .groupBy("lang", "source")
      .agg(count(lit(1)).as("n"), dsum(col("n_chars")).as("total_chars"))
      .orderBy("lang", "source")

  val langFilterSql: String =
    s"""SELECT lang, source, count(*) AS n, ${sqlDsum("n_chars")} AS total_chars
       |FROM documents WHERE lang IN ('en','de','fr')
       |GROUP BY lang, source ORDER BY lang, source""".stripMargin

  /** URL decomposition for web-corpus curation: synthesize a
    * well-formed URL per doc (the corpus ships no URL column), then
    * split it with Spark's native parse_url — host, registrable
    * domain, path, one query parameter. Map-only; the oracle
    * re-derives each part with RE2 regexes (independent of
    * java.net.URI). */
  val urlParse: Q = (spark, dir) =>
    t(spark, dir, "documents")
      .withColumn("url", concat(
        lit("https://"), col("source"), lit(".example.com/docs/"),
        col("doc_id").cast("string"), lit("?lang="), col("lang")))
      .select(col("doc_id"),
        graft.ops.Urls.host(col("url")).as("host"),
        graft.ops.Urls.registeredDomain(col("url")).as("domain"),
        graft.ops.Urls.path(col("url")).as("path"),
        graft.ops.Urls.queryParam(col("url"), "lang").as("lang_param"))
      .orderBy("doc_id")

  val urlParseSql: String =
    """WITH u AS (
      |  SELECT doc_id, 'https://' || source || '.example.com/docs/'
      |    || CAST(doc_id AS VARCHAR) || '?lang=' || lang AS url
      |  FROM documents)
      |SELECT doc_id,
      |  regexp_extract(url, '^[a-z]+://([^/?#]+)', 1) AS host,
      |  regexp_extract(regexp_extract(url, '^[a-z]+://([^/?#]+)', 1),
      |    '([^.]+\.[^.]+)$', 1) AS domain,
      |  regexp_extract(url, '^[a-z]+://[^/?#]+([^?#]*)', 1) AS path,
      |  regexp_extract(url, 'lang=([^&]*)', 1) AS lang_param
      |FROM u ORDER BY doc_id""".stripMargin

  /** PII scrub: plant deterministic emails/IPs into the corpus, redact
    * with typed placeholders, audit the match counts. Regexes are an
    * RE2-safe subset so Spark and DuckDB match identically. */
  val piiRedact: Q = (spark, dir) => {
    val raw = concat(col("text"),
      lit(" contact user"), col("doc_id"), lit("@example.com or 10.0."),
      col("doc_id") % 200, lit(".7 for details"))
    t(spark, dir, "documents")
      .select(col("doc_id"), raw.as("__raw"))
      .select(
        col("doc_id"),
        TextAnalysis.piiCount(col("__raw")).as("pii_count"),
        sha2(TextAnalysis.redactPii(col("__raw")), 256).as("redacted_hash"))
      .orderBy("doc_id")
  }

  val piiRedactSql: String = {
    val email = TextAnalysis.EmailPattern
    val phone = TextAnalysis.PhonePattern
    val ip = TextAnalysis.Ipv4Pattern
    s"""WITH planted AS (
       |  SELECT doc_id, text || ' contact user' || doc_id || '@example.com or 10.0.' ||
       |         (doc_id % 200) || '.7 for details' AS raw
       |  FROM documents)
       |SELECT doc_id,
       |  CAST(len(string_split_regex(raw, '$email')) - 1
       |     + len(string_split_regex(raw, '$ip')) - 1
       |     + len(string_split_regex(raw, '$phone')) - 1 AS INT) AS pii_count,
       |  sha256(regexp_replace(regexp_replace(regexp_replace(raw,
       |    '$email', '<EMAIL>', 'g'), '$ip', '<IP>', 'g'), '$phone', '<PHONE>', 'g')) AS redacted_hash
       |FROM planted ORDER BY doc_id""".stripMargin
  }

  /** Heuristic language-ID + quality scoring (Spark-only marker vocab —
    * no oracle). */
  val langPredict: Q = (spark, dir) =>
    t(spark, dir, "documents")
      .select(col("doc_id"), col("lang"),
        TextAnalysis.langId(col("text")).as("predicted_lang"),
        TextAnalysis.qualityScore(col("text")).as("quality"))
      .orderBy("doc_id")

  /** Vocabulary top-k: explode tokens → count → top 100. The
    * explode-aggregate-topk shape of corpus vocabulary analysis; count
    * ties broken by term. */
  val topTerms: Q = (spark, dir) =>
    t(spark, dir, "documents")
      // alias barrier: the generate-filter rule would re-run the
      // tokenizer in its size()>0 filter if it wrapped the raw expr
      .select(TextAnalysis.tokens(col("text")).as("__toks"))
      .select(explode(col("__toks")).as("term"))
      .filter(length(col("term")) > 0)
      .groupBy("term")
      .agg(count(lit(1)).as("n"))
      .orderBy(desc("n"), asc("term"))
      .limit(100)

  val topTermsSql: String =
    """SELECT term, count(*) AS n FROM (
      |  SELECT unnest(string_split_regex(trim(lower(text)), '\s+')) AS term
      |  FROM documents)
      |WHERE length(term) > 0
      |GROUP BY term ORDER BY n DESC, term LIMIT 100""".stripMargin

  /** Positional token explode: one row per (doc, position, token) — the
    * flatten step under inverted indexes and n-gram models. posexplode ≙
    * DuckDB list indexing over generate_series. Bounded to 100 docs so
    * the oracle dump stays small; the operator itself is map-only. */
  val explodePos: Q = (spark, dir) =>
    t(spark, dir, "documents")
      .filter(col("doc_id") < 100)
      .select(col("doc_id"), TextAnalysis.tokens(col("text")).as("__toks"))
      .select(col("doc_id"),
        posexplode(col("__toks")).as(Seq("pos", "token")))
      .filter(length(col("token")) > 0)
      .orderBy("doc_id", "pos")

  val explodePosSql: String =
    """WITH toks AS (
      |  SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS ts
      |  FROM documents WHERE doc_id < 100)
      |SELECT doc_id, CAST(i - 1 AS INT) AS pos, ts[i] AS token
      |FROM toks, unnest(generate_series(1, len(ts))) AS g(i)
      |WHERE length(ts[i]) > 0
      |ORDER BY doc_id, pos""".stripMargin

  /** Rolling-hash document fingerprint: min over all character-8-gram
    * polynomial hashes (Rabin-Karp) of the ASCII-projected normalized
    * text. Integer arithmetic end-to-end — unlike xxhash winnowing this
    * is reproducible in any engine, so it carries a full oracle. */
  val fingerprintQ: Q = (spark, dir) =>
    TextAnalysis.rollingFingerprints(
        t(spark, dir, "documents"), "doc_id", "text", k = 8)
      .select(col("doc_id"), col("n_grams").cast("int").as("n_grams"),
        col("fingerprint"))
      .orderBy("doc_id")

  val fingerprintSql: String = {
    // Σ_{j=0..7} ascii(c_{i+j})·31^j, written out termwise
    val terms = (0 until 8).map(j =>
      s"CAST(ascii(substr(t, i + $j, 1)) AS BIGINT) * " +
        s"${(0 until j).foldLeft(1L)((a, _) => a * 31L)}")
      .mkString(" + ")
    """WITH norm AS (
      |  SELECT doc_id,
      |    regexp_replace(regexp_replace(lower(trim(coalesce(text, ''))), '\s+', ' ', 'g'),
      |                   '[^ -~]', '', 'g') AS t0
      |  FROM documents),
      |pad AS (
      |  SELECT doc_id,
      |    rpad(t0, CAST(greatest(length(t0), 8) AS INTEGER), ' ') AS t
      |  FROM norm),
      |grams AS (
      |  SELECT doc_id, length(t) - 7 AS n_grams, TERMS AS h
      |  FROM pad, unnest(generate_series(1, length(t) - 7)) AS g(i))
      |SELECT doc_id, CAST(n_grams AS INT) AS n_grams,
      |  min(h) AS fingerprint
      |FROM grams GROUP BY doc_id, n_grams ORDER BY doc_id""".stripMargin
      .replace("TERMS", terms)
  }

  /** Corpus statistics per language: doc/token/char totals — the audit
    * summary a data pipeline reports after each cleaning stage. */
  val corpusStats: Q = (spark, dir) =>
    t(spark, dir, "documents")
      .withColumn("__toks", TextAnalysis.tokens(col("text")))
      .groupBy("lang")
      .agg(
        count(lit(1)).as("n_docs"),
        sum(size(col("__toks"))).as("total_tokens"),
        sum(length(col("text"))).as("total_chars"),
        countDistinct(col("source")).as("n_sources"))
      .orderBy("lang")

  val corpusStatsSql: String =
    """SELECT lang, count(*) AS n_docs,
      |  CAST(sum(len(string_split_regex(trim(lower(text)), '\s+'))) AS BIGINT) AS total_tokens,
      |  CAST(sum(length(text)) AS BIGINT) AS total_chars,
      |  count(DISTINCT source) AS n_sources
      |FROM documents GROUP BY lang ORDER BY lang""".stripMargin

  /** Quality filtering: keep documents whose heuristic quality score
    * clears a bar — the standard pre-training corpus scrub. The score
    * mixes token count, mean word length and punctuation ratio; every
    * component is mirrored exactly in the DuckDB oracle (single
    * divisions, same operation order). */
  val qualityFilter: Q = (spark, dir) =>
    t(spark, dir, "documents")
      .withColumn("quality", TextAnalysis.qualityScore(col("text")))
      .filter(col("quality") >= 0.99)
      .select("doc_id", "lang", "quality")
      .orderBy("doc_id")

  val qualityFilterSql: String =
    """WITH q AS (
      |  SELECT doc_id, lang,
      |    round(
      |      least(CAST(len(string_split_regex(trim(lower(text)), '\s+')) AS DOUBLE) / 20.0, 1.0) * 0.4
      |      + (CASE WHEN (CAST(length(replace(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ', '')) AS DOUBLE)
      |                    / CAST(len(string_split_regex(trim(lower(text)), '\s+')) AS DOUBLE))
      |                   BETWEEN 3.0 AND 10.0
      |              THEN 1.0 ELSE 0.5 END) * 0.3
      |      + (1.0 - least(CAST(length(regexp_replace(text, '[\p{L}\p{N}\s]', '', 'g')) AS DOUBLE)
      |                     / CAST(greatest(length(text), 1) AS DOUBLE) * 5.0, 1.0)) * 0.3
      |    , 6) AS quality
      |  FROM documents)
      |SELECT doc_id, lang, quality FROM q
      |WHERE quality >= 0.99 ORDER BY doc_id""".stripMargin

  /** Token budgeting per source: whitespace tokens plus the BPE-ish
    * subword estimate (words + punctuation + 1 per 6 chars of long
    * words) — the numbers a training-data pipeline reports before a
    * tokenizer run. Integer arithmetic end-to-end. */
  val tokenBudget: Q = (spark, dir) =>
    // tokens projected ONCE (see textStats: recomputing the split per
    // stat is the measured pathology), punctuation count likewise
    t(spark, dir, "documents")
      .withColumn("__toks", TextAnalysis.tokens(col("text")))
      .withColumn("__punct",
        length(regexp_replace(col("text"), "[\\p{L}\\p{N}\\s]", "")))
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        sum(size(col("__toks"))).as("ws_tokens"),
        sum(size(col("__toks")) + col("__punct") +
          aggregate(col("__toks"), lit(0), (acc, w) =>
            acc + greatest(lit(0), floor((length(w) - 1) / 6).cast("int"))))
          .as("bpe_tokens"))
      .orderBy("source")

  val tokenBudgetSql: String =
    """WITH toks AS (
      |  SELECT source, string_split_regex(trim(lower(text)), '\s+') AS t,
      |    length(regexp_replace(text, '[\p{L}\p{N}\s]', '', 'g')) AS punct
      |  FROM documents)
      |SELECT source, count(*) AS n_docs,
      |  CAST(sum(len(t)) AS BIGINT) AS ws_tokens,
      |  CAST(sum(len(t) + punct +
      |    list_sum(list_transform(t, w -> greatest(0, (length(w) - 1) // 6)))) AS BIGINT) AS bpe_tokens
      |FROM toks GROUP BY source ORDER BY source""".stripMargin

  /** Document chunking: 32-token windows, 8-token overlap — the
    * context-window prep shape (map-only generator; the oracle mirrors
    * the shared tokenizer and the 1-based slice arithmetic). */
  val docChunks: Q = (spark, dir) =>
    TextAnalysis.chunkDocuments(t(spark, dir, "documents"),
        "doc_id", "text", chunkTokens = 32, overlapTokens = 8)
      .orderBy("doc_id", "chunk_id")

  val docChunksSql: String =
    """WITH tok AS (
      |  SELECT doc_id, string_split(
      |    regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ') AS toks
      |  FROM documents),
      |st AS (
      |  SELECT doc_id, toks,
      |    unnest(range(1, greatest(len(toks) - 8, 1) + 1, 24)) AS start_pos
      |  FROM tok)
      |SELECT doc_id, CAST((start_pos - 1) // 24 AS INT) AS chunk_id,
      |  CAST(len(toks[start_pos : start_pos + 31]) AS INT) AS n_tokens,
      |  array_to_string(toks[start_pos : start_pos + 31], ' ') AS chunk_text
      |FROM st ORDER BY doc_id, chunk_id""".stripMargin

  /** Top-30 corpus bigrams by occurrence (collocations); total order
    * via (count desc, gram) so the rank-30 cut is engine-stable. */
  val ngramCountsQ: Q = (spark, dir) =>
    TextAnalysis.ngramCounts(t(spark, dir, "documents"),
        "doc_id", "text", n = 2)
      .orderBy(col("n_occurrences").desc, col("ngram"))
      .limit(30)

  val ngramCountsSql: String =
    """WITH tok AS (
      |  SELECT doc_id, string_split(
      |    regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ') AS toks
      |  FROM documents),
      |g AS (
      |  SELECT doc_id, unnest(CASE WHEN len(toks) >= 2
      |    THEN list_transform(range(1, len(toks)),
      |      i -> array_to_string(toks[i : i + 1], ' '))
      |    ELSE [] END) AS ngram
      |  FROM tok)
      |SELECT ngram, count(DISTINCT doc_id) AS n_docs,
      |  count(*) AS n_occurrences
      |FROM g GROUP BY ngram
      |ORDER BY n_occurrences DESC, ngram LIMIT 30""".stripMargin

  /** Pivot: per-user event-type count matrix (explicit value list keeps
    * the output schema deterministic); oracle via FILTER aggregation. */
  val pivotEvents: Q = (spark, dir) =>
    t(spark, dir, "events")
      .groupBy("user_id")
      .pivot("event_type", Seq("click", "error", "purchase", "signup", "view"))
      .agg(count(lit(1)))
      .na.fill(0L)
      .orderBy("user_id")

  val pivotEventsSql: String =
    """SELECT user_id,
      |  count(*) FILTER (event_type = 'click') AS click,
      |  count(*) FILTER (event_type = 'error') AS error,
      |  count(*) FILTER (event_type = 'purchase') AS purchase,
      |  count(*) FILTER (event_type = 'signup') AS signup,
      |  count(*) FILTER (event_type = 'view') AS view
      |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin

  // ------------------------------------------------ §2.11 multimodal

  /** Binary media plumbing over text-as-bytes payloads: byte length +
    * magic-number mime sniffing (real logic, oracle-checkable). */
  val multimodalMeta: Q = (spark, dir) =>
    Multimodal.withMediaMeta(
        t(spark, dir, "documents")
          .select(col("doc_id"), col("text").cast("binary").as("media")),
        "media")
      .select(col("doc_id"),
        col("media_meta.mime").as("mime"),
        col("media_meta.byte_length").as("byte_length"),
        col("media_meta.sample_rate").as("sample_rate"),
        col("media_meta.channels").as("channels"))
      .orderBy("doc_id")

  /** Text-as-bytes payloads carry no audio container, so the declared
    * audio fields are null by the unparseable⇒null rule (real WAV
    * parsing is unit-pinned on synthesized headers). */
  val multimodalMetaSql: String =
    """SELECT doc_id, 'application/octet-stream' AS mime,
      |  CAST(octet_length(CAST(text AS BLOB)) AS BIGINT) AS byte_length,
      |  CAST(NULL AS INT) AS sample_rate, CAST(NULL AS INT) AS channels
      |FROM documents ORDER BY doc_id""".stripMargin

  /** Feature extraction over binary payloads (mapPartitions batch
    * plumbing; text payloads take the deterministic byte-block branch,
    * real images the imageio luma-grid branch — no oracle). */
  val multimodalFeatures: Q = (spark, dir) => {
    val media = t(spark, dir, "documents")
      .select(col("doc_id"), col("text").cast("binary").as("media"))
    Multimodal.extractFeatures(media, "media", dim = 8)
      .select(col("doc_id"), round(element_at(col("features"), 1), 4).as("f0"))
      .orderBy("doc_id")
  }

  /** Resize over binary payloads: text-as-bytes payloads are not
    * decodable images, so they exercise the deterministic byte-resample
    * branch of [[Multimodal.resize]] (fixed 8×4 output) — byte-for-byte
    * oracle-checkable (DuckDB reproduces the sampling with blob
    * substring algebra). The real imageio decode branch is pinned by
    * unit tests on synthesized PNGs (no image column exists in the
    * test tables). */
  val multimodalResize: Q = (spark, dir) => {
    // empty payloads excluded on BOTH sides: the fallback emits 32 zero
    // bytes for them while the oracle's substr algebra emits '' — the
    // one case where the two formulations differ
    val media = t(spark, dir, "documents")
      .filter(length(col("text")) > 0)
      .select(col("doc_id"), col("text").cast("binary").as("media"))
    Multimodal.resize(media, "media", 8, 4)
      .select(col("doc_id"), upper(hex(col("resized"))).as("resized_hex"))
      .orderBy("doc_id")
  }

  val multimodalResizeSql: String =
    """SELECT doc_id,
      |  upper(list_aggregate(
      |    list_transform(generate_series(0, 31),
      |      i -> substr(h, CAST(2 * ((i * n) // 32) AS INT) + 1, 2)),
      |    'string_agg', '')) AS resized_hex
      |FROM (SELECT doc_id, hex(CAST(text AS BLOB)) AS h,
      |        octet_length(CAST(text AS BLOB)) AS n
      |      FROM documents WHERE length(text) > 0)
      |ORDER BY doc_id""".stripMargin

  /** Array-function battery over token arrays: size/element_at/
    * contains/position/sort+slice/distinct — each with an exact DuckDB
    * list-function twin. Spark's array_position returns 0 for absent
    * (DuckDB NULL — coalesced to 0 in the oracle). */
  val arrayFunctions: Q = (spark, dir) =>
    t(spark, dir, "documents").filter(col("doc_id") < 200)
      .withColumn("__toks", TextAnalysis.tokens(col("text")))
      .select(
        col("doc_id"),
        size(col("__toks")).as("n_tokens"),
        element_at(col("__toks"), 1).as("first_token"),
        array_contains(col("__toks"), "the").cast("int").as("has_the"),
        array_position(col("__toks"), "the").cast("int").as("pos_the"),
        array_join(slice(sort_array(col("__toks")), 1, 3), ",")
          .as("first3_sorted"),
        size(array_distinct(col("__toks"))).as("n_distinct"))
      .orderBy("doc_id")

  val arrayFunctionsSql: String =
    """WITH toks AS (
      |  SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS ts
      |  FROM documents WHERE doc_id < 200)
      |SELECT doc_id,
      |  CAST(len(ts) AS INT) AS n_tokens,
      |  ts[1] AS first_token,
      |  CAST(list_contains(ts, 'the') AS INT) AS has_the,
      |  CAST(coalesce(list_position(ts, 'the'), 0) AS INT) AS pos_the,
      |  array_to_string(list_slice(list_sort(ts), 1, 3), ',') AS first3_sorted,
      |  CAST(len(list_distinct(ts)) AS INT) AS n_distinct
      |FROM toks ORDER BY doc_id""".stripMargin

  /** Date-arithmetic battery: add/trunc/last_day/diff/derived month
    * index/day-of-week, emitted as strings or ints per the determinism
    * rules (dates never compare raw through pandas). Spark's dayofweek
    * is 1-based Sunday; DuckDB's 0-based — shifted in the oracle. */
  val dateArith: Q = (spark, dir) =>
    t(spark, dir, "orders")
      .withColumn("d", to_date(col("o_orderdate")))
      .select(
        col("o_orderkey"),
        date_format(col("d"), "yyyy-MM-dd").as("order_date"),
        date_format(date_add(col("d"), 30), "yyyy-MM-dd").as("due_date"),
        date_format(trunc(col("d"), "month"), "yyyy-MM-dd").as("month_start"),
        date_format(last_day(col("d")), "yyyy-MM-dd").as("month_end"),
        datediff(col("d"), lit("1995-01-01").cast("date"))
          .cast("int").as("days_since_95"),
        ((year(col("d")) - 1995) * 12 + month(col("d")) - 1)
          .cast("int").as("months_since_95"),
        dayofweek(col("d")).cast("int").as("dow"))
      .orderBy("o_orderkey")

  val dateArithSql: String =
    """WITH b AS (SELECT o_orderkey, CAST(o_orderdate AS DATE) AS d FROM orders)
      |SELECT o_orderkey,
      |  strftime(d, '%Y-%m-%d') AS order_date,
      |  strftime(CAST(d + INTERVAL 30 DAY AS DATE), '%Y-%m-%d') AS due_date,
      |  strftime(date_trunc('month', d), '%Y-%m-%d') AS month_start,
      |  strftime(last_day(d), '%Y-%m-%d') AS month_end,
      |  CAST(date_diff('day', DATE '1995-01-01', d) AS INT) AS days_since_95,
      |  CAST((year(d) - 1995) * 12 + month(d) - 1 AS INT) AS months_since_95,
      |  CAST(dayofweek(d) + 1 AS INT) AS dow
      |FROM b ORDER BY o_orderkey""".stripMargin

  /** Struct battery: build nested structs (named_struct), access
    * fields through the nesting, and compare whole structs — DuckDB's
    * struct_pack/dot-access twins. Output is flattened scalars (struct
    * columns don't hash stably through pandas). */
  val structFunctions: Q = (spark, dir) =>
    t(spark, dir, "customer")
      .withColumn("cust", struct(
        col("c_custkey").as("key"),
        col("c_name").as("name"),
        struct(col("c_mktsegment").as("segment"),
          col("c_nationkey").as("nation")).as("mkt")))
      .select(
        col("cust.key").as("c_custkey"),
        col("cust.name").as("name"),
        col("cust.mkt.segment").as("segment"),
        (col("cust.mkt.nation") * 2).as("nation_x2"),
        (col("cust") === struct(
          col("cust.key").as("key"), col("cust.name").as("name"),
          struct(lit("BUILDING").as("segment"),
            col("cust.mkt.nation").as("nation")).as("mkt")))
          .cast("int").as("is_building"))
      .orderBy("c_custkey")

  val structFunctionsSql: String =
    """WITH s AS (
      |  SELECT struct_pack(key := c_custkey, name := c_name,
      |    mkt := struct_pack(segment := c_mktsegment, nation := c_nationkey)) AS cust
      |  FROM customer)
      |SELECT cust.key AS c_custkey, cust.name AS name,
      |  cust.mkt.segment AS segment,
      |  cust.mkt.nation * 2 AS nation_x2,
      |  CAST(cust = struct_pack(key := cust.key, name := cust.name,
      |    mkt := struct_pack(segment := 'BUILDING', nation := cust.mkt.nation)) AS INT)
      |    AS is_building
      |FROM s ORDER BY c_custkey""".stripMargin

  /** Map battery: per-nation segment→count maps built with
    * map_from_entries, then interrogated with map_keys / try_element_at
    * (ANSI-safe missing-key → null) / map_filter / aggregate over
    * map_values. Output is flattened scalars (maps don't hash stably
    * through pandas); the oracle re-derives each scalar relationally
    * from the same (nation, segment) rollup. */
  val mapFunctions: Q = (spark, dir) =>
    t(spark, dir, "customer")
      .groupBy(col("c_nationkey"), col("c_mktsegment"))
      .agg(count(lit(1)).as("cnt"))
      .groupBy(col("c_nationkey"))
      .agg(map_from_entries(sort_array(collect_list(
        struct(col("c_mktsegment"), col("cnt"))))).as("segmap"))
      .select(
        col("c_nationkey"),
        size(map_keys(col("segmap"))).as("n_segments"),
        try_element_at(col("segmap"), lit("BUILDING")).as("n_building"),
        try_element_at(col("segmap"), lit("MACHINERY")).as("n_machinery"),
        try_element_at(col("segmap"), lit("AEROSPACE")).as("n_missing"),
        size(map_filter(col("segmap"), (_, v) => v >= 12)).as("n_popular"),
        aggregate(map_values(col("segmap")), lit(0L), (a, v) => a + v)
          .as("n_total"))
      .orderBy("c_nationkey")

  val mapFunctionsSql: String =
    """WITH sc AS (
      |  SELECT c_nationkey, c_mktsegment, count(*) AS cnt
      |  FROM customer GROUP BY 1, 2)
      |SELECT c_nationkey,
      |  CAST(count(*) AS INT) AS n_segments,
      |  max(cnt) FILTER (c_mktsegment = 'BUILDING') AS n_building,
      |  max(cnt) FILTER (c_mktsegment = 'MACHINERY') AS n_machinery,
      |  CAST(NULL AS BIGINT) AS n_missing,
      |  CAST(count(*) FILTER (cnt >= 12) AS INT) AS n_popular,
      |  CAST(sum(cnt) AS BIGINT) AS n_total
      |FROM sc GROUP BY c_nationkey ORDER BY c_nationkey""".stripMargin

  // -------------------------------------- §2.1/2.2 format round-trips

  /** ORC round-trip through the storage façade: write orders to ORC,
    * read back, project. ORC is lossless for every column type here —
    * the sink/source pair must be byte-faithful, so the oracle is the
    * plain projection of the original table. */
  val orcRoundtrip: Q = (spark, dir) => {
    val st = new BasicStorage(spark)
    val out = java.nio.file.Files
      .createTempDirectory("graft_orc_q").toString + "/t"
    val orders = t(spark, dir, "orders")
      .select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice")
    st.write(orders, out, "orc", "overwrite")
    st.read(out, "orc")
      .select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice")
      .orderBy("o_orderkey")
  }

  val orcRoundtripSql: String =
    """SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice
      |FROM orders ORDER BY o_orderkey""".stripMargin

  /** JSON round-trip (longs + strings — the types JSON carries without
    * loss; doubles go through decimal text and are excluded by
    * construction). Exercises the schema-carrying JSON read path. */
  val jsonRoundtrip: Q = (spark, dir) => {
    val st = new BasicStorage(spark)
    val out = java.nio.file.Files
      .createTempDirectory("graft_json_q").toString + "/t"
    val customer = t(spark, dir, "customer")
      .select("c_custkey", "c_name", "c_mktsegment", "c_nationkey")
    st.write(customer, out, "json", "overwrite")
    spark.read.schema(customer.schema).json(out)
      .select("c_custkey", "c_name", "c_mktsegment", "c_nationkey")
      .orderBy("c_custkey")
  }

  val jsonRoundtripSql: String =
    """SELECT c_custkey, c_name, c_mktsegment, c_nationkey
      |FROM customer ORDER BY c_custkey""".stripMargin

  /** CSV round-trip through the storage façade — exercises the
    * reference's csv defaults (header=true on write, header+inferSchema
    * on read, basic.py:35-37): longs infer back as longs, strings as
    * strings, so the projection is lossless. */
  val csvRoundtrip: Q = (spark, dir) => {
    val st = new BasicStorage(spark)
    val out = java.nio.file.Files
      .createTempDirectory("graft_csv_q").toString + "/t"
    val nation = t(spark, dir, "nation")
      .select("n_nationkey", "n_name", "n_regionkey")
    st.write(nation, out, "csv", "overwrite")
    st.read(out, "csv")
      .select("n_nationkey", "n_name", "n_regionkey")
      .orderBy("n_nationkey")
  }

  val csvRoundtripSql: String =
    """SELECT n_nationkey, n_name, n_regionkey
      |FROM nation ORDER BY n_nationkey""".stripMargin

  /** Schema evolution on read: two parquet batches with different
    * schemas land in one directory (month N has no `o_orderpriority`,
    * month N+1 adds it); mergeSchema=true unions them with nulls for
    * the missing column — the long-lived-dataset shape where columns
    * arrive over time. Schema merging is footer-metadata work, not a
    * data pass. */
  val schemaEvolution: Q = (spark, dir) => {
    val st = new BasicStorage(spark)
    val out = java.nio.file.Files
      .createTempDirectory("graft_evo_q").toString + "/t"
    val orders = t(spark, dir, "orders")
    st.write(orders.filter(col("o_orderkey") % 2 === 0)
        .select("o_orderkey", "o_totalprice"),
      out, "parquet", "overwrite")
    orders.filter(col("o_orderkey") % 2 === 1)
      .select("o_orderkey", "o_totalprice", "o_orderpriority")
      .write.mode("append").parquet(out)
    st.read(out, "parquet", Map("mergeSchema" -> "true"))
      .select("o_orderkey", "o_totalprice", "o_orderpriority")
      .orderBy("o_orderkey")
  }

  val schemaEvolutionSql: String =
    """SELECT o_orderkey, o_totalprice,
      |  CAST(NULL AS VARCHAR) AS o_orderpriority
      |FROM orders WHERE o_orderkey % 2 = 0
      |UNION ALL
      |SELECT o_orderkey, o_totalprice, o_orderpriority
      |FROM orders WHERE o_orderkey % 2 = 1
      |ORDER BY o_orderkey""".stripMargin

  // ------------------------------------------- §2.11 dataset sampling

  /** Deterministic train/holdout split: membership is a pure function
    * of the key (Knuth multiplicative hash), stable across engines,
    * runs and layouts — what df.sample() (seeded RNG, partition-
    * dependent) cannot give a reproducible pipeline. Map-only. */
  val hashSample: Q = (spark, dir) =>
    graft.ops.Sampling.sampleByHash(
        t(spark, dir, "orders")
          .select("o_orderkey", "o_custkey", "o_totalprice"),
        "o_orderkey", 10)
      .orderBy("o_orderkey")

  val hashSampleSql: String =
    s"""SELECT o_orderkey, o_custkey, o_totalprice FROM orders
       |WHERE (((o_orderkey % ${graft.ops.Sampling.M31}) * ${graft.ops.Sampling.HashA}) % 4294967296) % 100 < 10
       |ORDER BY o_orderkey""".stripMargin

  /** Stratified sample: exactly ceil(20% · |stratum|) docs per
    * language, chosen by hash rank — balanced subcorpora with
    * deterministic membership. One shuffle (both windows share the
    * stratum partitioning). */
  val stratifiedSample: Q = (spark, dir) =>
    graft.ops.Sampling.stratified(
        t(spark, dir, "documents").select("doc_id", "lang", "source"),
        "lang", "doc_id", 20)
      .orderBy("doc_id")

  val stratifiedSampleSql: String =
    s"""WITH ranked AS (
       |  SELECT doc_id, lang, source,
       |    row_number() OVER (PARTITION BY lang
       |      ORDER BY (((doc_id % ${graft.ops.Sampling.M31}) * ${graft.ops.Sampling.HashA}) % 4294967296) % 1000000,
       |               doc_id) AS rn,
       |    count(*) OVER (PARTITION BY lang) AS n
       |  FROM documents)
       |SELECT doc_id, lang, source FROM ranked
       |WHERE rn <= ceil((n * 20) / 100.0)
       |ORDER BY doc_id""".stripMargin

  /** Domain-mixture sampling: the data-recipe step — upsample curated
    * sources to 100%/60%, downsample the bulk tail to 25%, with
    * hash-of-key membership so the mixture is reproducible across
    * engines and re-runs. Map-only. */
  val domainMixture: Q = (spark, dir) =>
    graft.ops.Sampling.mixtureSample(
        t(spark, dir, "documents")
          .select("doc_id", "source", "lang", "n_chars"),
        "source", "doc_id",
        Map("src0" -> 100, "src1" -> 100, "src2" -> 60, "src3" -> 60),
        defaultPct = 25)
      .orderBy("doc_id")

  val domainMixtureSql: String =
    s"""SELECT doc_id, source, lang, n_chars FROM documents
       |WHERE (((doc_id % ${graft.ops.Sampling.M31}) * ${graft.ops.Sampling.HashA}) % 4294967296) % 100 <
       |  CASE WHEN source = 'src0' THEN 100 WHEN source = 'src1' THEN 100
       |       WHEN source = 'src2' THEN 60 WHEN source = 'src3' THEN 60
       |       ELSE 25 END
       |ORDER BY doc_id""".stripMargin

  /** Weighted mixture with UPSAMPLING: curated src0 seen 2.5×, src1
    * 1.5×, the crawl tail halved — fractional copies decided by the
    * same portable hash, so the epoch recipe is reproducible across
    * engines. Map-only (explode(sequence)); copy_idx keeps replicas
    * distinguishable downstream. */
  val upsampleMixtureQ: Q = (spark, dir) =>
    graft.ops.Sampling.upsampleMixture(
        t(spark, dir, "documents").select("doc_id", "source", "lang"),
        "source", "doc_id",
        Map("src0" -> 2500, "src1" -> 1500), defaultPerMille = 500)
      .orderBy("doc_id", "copy_idx")

  val upsampleMixtureSql: String =
    s"""WITH f AS (SELECT doc_id, source, lang,
       |    CASE WHEN source = 'src0' THEN 2500
       |         WHEN source = 'src1' THEN 1500 ELSE 500 END AS fm,
       |    (((doc_id % ${graft.ops.Sampling.M31}) * ${graft.ops.Sampling.HashA}) % 4294967296) % 1000 AS hb
       |  FROM documents),
       |c AS (SELECT doc_id, source, lang,
       |    CAST(fm // 1000 AS INT)
       |      + CASE WHEN hb < fm % 1000 THEN 1 ELSE 0 END AS n_copies
       |  FROM f),
       |s AS (SELECT unnest(range(1, 4)) AS gs)
       |SELECT doc_id, source, lang, CAST(gs AS INT) AS copy_idx
       |FROM c JOIN s ON s.gs <= c.n_copies
       |ORDER BY doc_id, copy_idx""".stripMargin

  /** Adaptive length cut: keep documents inside the corpus's exact
    * [p5, p95] n_chars band — percentile bounds computed in one
    * one-row aggregate, broadcast back (no corpus shuffle). */
  val lengthBand: Q = (spark, dir) =>
    graft.ops.TextAnalysis.quantileBandFilter(
        t(spark, dir, "documents").select("doc_id", "n_chars"),
        "n_chars", 0.05, 0.95)
      .orderBy("doc_id")

  val lengthBandSql: String =
    """SELECT doc_id, n_chars FROM documents,
      |  (SELECT quantile_cont(n_chars, 0.05) AS lo,
      |          quantile_cont(n_chars, 0.95) AS hi FROM documents) b
      |WHERE n_chars >= lo AND n_chars <= hi
      |ORDER BY doc_id""".stripMargin

  // ------------------------------------- §2.11 corpus line/chunk dedup

  /** C4-style corpus-level chunk dedup: each distinct 8-token chunk
    * survives only at its first (doc_id, pos) occurrence; documents are
    * reassembled from surviving chunks. Two skew-resistant shuffles
    * (map-side partial min on the chunk key — see Dedup.dedupUnits). */
  val lineDedup: Q = (spark, dir) =>
    graft.ops.Dedup.dedupTokenChunks(
        t(spark, dir, "documents"), "doc_id", "text", 8)
      .orderBy("doc_id")

  val lineDedupSql: String =
    """WITH toks AS (
      |  SELECT doc_id,
      |    string_split(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ') AS tk
      |  FROM documents),
      |pos AS (
      |  SELECT doc_id, tk,
      |    unnest(generate_series(1, CAST(ceil(len(tk) / 8.0) AS BIGINT))) AS pos
      |  FROM toks),
      |units AS (
      |  SELECT doc_id, pos,
      |    array_to_string(tk[(pos - 1) * 8 + 1 : pos * 8], ' ') AS unit
      |  FROM pos),
      |kept AS (
      |  SELECT doc_id, pos, unit,
      |    row_number() OVER (PARTITION BY unit ORDER BY doc_id, pos) AS rn
      |  FROM units)
      |SELECT doc_id, count(*) AS n_kept,
      |  string_agg(unit, ' ' ORDER BY pos) AS text_clean
      |FROM kept WHERE rn = 1
      |GROUP BY doc_id ORDER BY doc_id""".stripMargin

  /** Incremental dedup: an increment (new docs ∪ 50 planted copies of
    * base docs) deduped AGAINST the base corpus — the planted copies
    * vanish, genuinely-new docs survive, and the base is never
    * re-deduped. */
  val dedupIncremental: Q = (spark, dir) => {
    val docs = t(spark, dir, "documents")
    val base = docs.filter(col("doc_id") < 400)
    val inc = docs.filter(col("doc_id") >= 400)
      .unionByName(docs.filter(col("doc_id") < 50)
        .select((col("doc_id") + 10000).as("doc_id"), col("text"),
          col("lang"), col("source"), col("n_chars")))
    graft.ops.Dedup.dedupAgainst(base, inc, "text")
      .select("doc_id", "source", "n_chars")
      .orderBy("doc_id")
  }

  val dedupIncrementalSql: String =
    """WITH base AS (SELECT * FROM documents WHERE doc_id < 400),
      |inc AS (
      |  SELECT * FROM documents WHERE doc_id >= 400
      |  UNION ALL
      |  SELECT doc_id + 10000 AS doc_id, text, lang, source, n_chars
      |  FROM documents WHERE doc_id < 50)
      |SELECT doc_id, source, n_chars FROM inc
      |WHERE NOT EXISTS (SELECT 1 FROM base
      |  WHERE sha256(regexp_replace(lower(trim(base.text)), '\s+', ' ', 'g'))
      |      = sha256(regexp_replace(lower(trim(inc.text)), '\s+', ' ', 'g')))
      |ORDER BY doc_id""".stripMargin

  /** PERSISTED-index incremental EXACT dedup
    * ([[graft.ops.Dedup.saveHashIndex]] /
    * [[graft.ops.Dedup.dedupAgainstHashIndex]] /
    * [[graft.ops.Dedup.appendToHashIndex]]): two ingest increments
    * dedup against the stored normalized-text digests — the corpus
    * text is never re-read — and the first increment's survivors are
    * APPENDED to the index as an `inc-N` generation, which must then
    * catch the second increment's clones of first-increment docs.
    * Oracle: the same two-level NOT EXISTS over normalized text
    * (exact equality — digest vs text predicate are the same
    * equivalence classes). */
  val dedupIndexed: Q = (spark, dir) => {
    val docs = t(spark, dir, "documents")
    def copies(pred: org.apache.spark.sql.Column, offset: Long) =
      docs.filter(pred).select((col("doc_id") + offset).as("doc_id"),
        col("text"), col("lang"), col("source"), col("n_chars"))
    val base = docs.filter(col("doc_id") < 400)
    val incA = docs.filter(col("doc_id") >= 400 && col("doc_id") < 450)
      .unionByName(copies(col("doc_id") < 25, 100000L))
    val incB = docs.filter(col("doc_id") >= 450)
      .unionByName(copies(
        col("doc_id") >= 400 && col("doc_id") < 425, 200000L))
      .unionByName(copies(
        col("doc_id") >= 25 && col("doc_id") < 50, 300000L))
    val idx = java.nio.file.Files
      .createTempDirectory("graft_hashidx_q").toString + "/idx"
    graft.ops.Dedup.saveHashIndex(spark, idx, base, "text")
    val survA = graft.ops.Dedup.dedupAgainstHashIndex(spark, idx,
      incA, "text").localCheckpoint(true)
    graft.ops.Dedup.appendToHashIndex(spark, idx, survA, "text")
    val survB = graft.ops.Dedup.dedupAgainstHashIndex(spark, idx,
      incB, "text")
    survA.unionByName(survB)
      .select("doc_id", "source", "n_chars")
      .orderBy("doc_id")
  }

  val dedupIndexedSql: String =
    """WITH norm AS (
      |  SELECT doc_id, regexp_replace(lower(trim(text)), '\s+', ' ', 'g')
      |    AS nt, source, n_chars
      |  FROM documents),
      |base AS (SELECT * FROM norm WHERE doc_id < 400),
      |incA AS (
      |  SELECT doc_id, nt, source, n_chars FROM norm
      |  WHERE doc_id >= 400 AND doc_id < 450
      |  UNION ALL
      |  SELECT doc_id + 100000, nt, source, n_chars FROM norm
      |  WHERE doc_id < 25),
      |sA AS (SELECT * FROM incA i WHERE NOT EXISTS (
      |  SELECT 1 FROM base b WHERE b.nt = i.nt)),
      |incB AS (
      |  SELECT doc_id, nt, source, n_chars FROM norm WHERE doc_id >= 450
      |  UNION ALL
      |  SELECT doc_id + 200000, nt, source, n_chars FROM norm
      |  WHERE doc_id >= 400 AND doc_id < 425
      |  UNION ALL
      |  SELECT doc_id + 300000, nt, source, n_chars FROM norm
      |  WHERE doc_id >= 25 AND doc_id < 50),
      |idxB AS (SELECT nt FROM base UNION ALL SELECT nt FROM sA),
      |sB AS (SELECT * FROM incB i WHERE NOT EXISTS (
      |  SELECT 1 FROM idxB x WHERE x.nt = i.nt))
      |SELECT doc_id, source, n_chars FROM sA
      |UNION ALL
      |SELECT doc_id, source, n_chars FROM sB
      |ORDER BY doc_id""".stripMargin

  /** Incremental NEAR-dup dedup (no oracle — MinHash family): the
    * increment (new docs ∪ 30 planted copies of base docs) deduped
    * against the base by bipartite LSH + exact Jaccard verification;
    * recall pinned by OpsSpec's planted-copy test. */
  val nearDedupIncremental: Q = (spark, dir) => {
    val docs = t(spark, dir, "documents")
    val base = docs.filter(col("doc_id") < 400)
    val inc = docs.filter(col("doc_id") >= 400)
      .unionByName(docs.filter(col("doc_id") < 30)
        .select((col("doc_id") + 10000).as("doc_id"), col("text"),
          col("lang"), col("source"), col("n_chars")))
    graft.ops.Dedup.nearDedupAgainst(base, inc, "doc_id", "text",
        jaccardThreshold = 0.9)
      .select("doc_id", "source", "n_chars")
      .orderBy("doc_id")
  }

  /** PERSISTED-index incremental near-dup dedup
    * ([[graft.ops.Dedup.saveNearDupIndex]] /
    * [[graft.ops.Dedup.nearDedupAgainstIndex]]): the index is built
    * once over the base corpus and the increment dedups against the
    * STORED bands + shingle hashes — the base text is never re-read.
    * Oracle-checked (unlike `q_neardedup_incremental`'s Spark-hash
    * MinHash acceptance): the verify stage is exact word-shingle
    * Jaccard, so surfaced drops equal the all-pairs bipartite SQL,
    * subject only to LSH candidate recall (the `q_jaccard_ngram`
    * acceptance — planted suffix-clones sit at jac ≈ 0.97 where
    * recall is ≈ 1). Spec pins indexed == inline bit-identical. */
  val nearDedupIndexed: Q = (spark, dir) => {
    val docs = t(spark, dir, "documents")
    val base = docs.filter(col("doc_id") < 400)
    val inc = docs.filter(col("doc_id") >= 400)
      .select("doc_id", "text", "n_chars")
      .unionByName(docs.filter(col("doc_id") < 30)
        .select((col("doc_id") + 10000).as("doc_id"),
          concat(col("text"), lit(" extra")).as("text"),
          col("n_chars")))
    val idx = java.nio.file.Files
      .createTempDirectory("graft_dedupidx_q").toString + "/idx"
    graft.ops.Dedup.saveNearDupIndex(spark, idx, base, "doc_id", "text")
    graft.ops.Dedup.nearDedupAgainstIndex(spark, idx, inc,
        "doc_id", "text", jaccardThreshold = 0.8)
      .select("doc_id", "n_chars")
      .orderBy("doc_id")
  }

  val nearDedupIndexedSql: String =
    """WITH base AS (SELECT doc_id, text FROM documents WHERE doc_id < 400),
      |inc AS (
      |  SELECT doc_id, text, n_chars FROM documents WHERE doc_id >= 400
      |  UNION ALL
      |  SELECT doc_id + 10000 AS doc_id, text || ' extra' AS text, n_chars
      |  FROM documents WHERE doc_id < 30),
      |bg AS (
      |  SELECT doc_id,
      |    list_distinct(CASE WHEN len(ts) >= 3
      |      THEN list_transform(generate_series(1, len(ts) - 2),
      |        i -> array_to_string(ts[i:i+2], ' '))
      |      ELSE [array_to_string(ts, ' ')] END) AS g
      |  FROM (SELECT doc_id,
      |          string_split_regex(trim(lower(text)), '\s+') AS ts
      |        FROM base)),
      |ig AS (
      |  SELECT doc_id,
      |    list_distinct(CASE WHEN len(ts) >= 3
      |      THEN list_transform(generate_series(1, len(ts) - 2),
      |        i -> array_to_string(ts[i:i+2], ' '))
      |      ELSE [array_to_string(ts, ' ')] END) AS g
      |  FROM (SELECT doc_id,
      |          string_split_regex(trim(lower(text)), '\s+') AS ts
      |        FROM inc)),
      |dropped AS (
      |  SELECT DISTINCT i.doc_id
      |  FROM ig i JOIN bg b ON
      |    CAST(len(list_intersect(i.g, b.g)) AS DOUBLE) /
      |    CAST(len(i.g) + len(b.g) - len(list_intersect(i.g, b.g)) AS DOUBLE)
      |    >= 0.8)
      |SELECT doc_id, n_chars FROM inc
      |WHERE doc_id NOT IN (SELECT doc_id FROM dropped)
      |ORDER BY doc_id""".stripMargin

  /** Boilerplate scrub: 2-token chunks occurring in ≥25 distinct docs
    * are removed from EVERY document (C4's cookie-banner rule); docs
    * reassemble from what remains. The frequent-chunk set is small by
    * construction → broadcast anti-join. */
  val boilerplateFilter: Q = (spark, dir) =>
    graft.ops.Dedup.removeBoilerplate(
        t(spark, dir, "documents"), "doc_id", "text",
        chunkTokens = 2, minDocs = 25)
      .orderBy("doc_id")

  val boilerplateFilterSql: String =
    """WITH toks AS (
      |  SELECT doc_id,
      |    string_split(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ') AS tk
      |  FROM documents),
      |pos AS (
      |  SELECT doc_id, tk,
      |    unnest(generate_series(1, CAST(ceil(len(tk) / 2.0) AS BIGINT))) AS pos
      |  FROM toks),
      |units AS (
      |  SELECT doc_id, pos,
      |    array_to_string(tk[(pos - 1) * 2 + 1 : pos * 2], ' ') AS unit
      |  FROM pos),
      |bp AS (
      |  SELECT unit FROM units GROUP BY unit
      |  HAVING count(DISTINCT doc_id) >= 25)
      |SELECT doc_id, count(*) AS n_kept,
      |  string_agg(unit, ' ' ORDER BY pos) AS text_clean
      |FROM units WHERE unit NOT IN (SELECT unit FROM bp)
      |GROUP BY doc_id ORDER BY doc_id""".stripMargin

  /** Vocabulary build: top-50 corpus terms with dense rank ids — the
    * token-id table a tokenizer trains against. Counts shuffle once;
    * the rank window runs over 50 rows post-limit. */
  val vocabBuild: Q = (spark, dir) => {
    val counts = t(spark, dir, "documents")
      .select(TextAnalysis.tokens(col("text")).as("__toks"))
      .select(explode(col("__toks")).as("term"))
      .filter(length(col("term")) > 0)
      .groupBy("term")
      .agg(count(lit(1)).as("n"))
      .orderBy(desc("n"), asc("term"))
      .limit(50)
    counts.withColumn("vocab_id",
        row_number().over(Window.orderBy(desc("n"), asc("term"))))
      .orderBy("vocab_id")
  }

  val vocabBuildSql: String =
    """WITH counts AS (
      |  SELECT term, count(*) AS n FROM (
      |    SELECT unnest(string_split_regex(trim(lower(text)), '\s+')) AS term
      |    FROM documents)
      |  WHERE length(term) > 0
      |  GROUP BY term ORDER BY n DESC, term LIMIT 50)
      |SELECT term, n,
      |  CAST(row_number() OVER (ORDER BY n DESC, term) AS INT) AS vocab_id
      |FROM counts ORDER BY vocab_id""".stripMargin

  /** Token-id encoding of the first 50 docs through the corpus top-20
    * vocabulary (so OOV → -1 is exercised); positions keep sequences
    * reassemblable. */
  val termIdsQ: Q = (spark, dir) => {
    val docs = t(spark, dir, "documents")
    val vocab = docs
      .select(TextAnalysis.tokens(col("text")).as("__toks"))
      .select(explode(col("__toks")).as("term"))
      .filter(length(col("term")) > 0)
      .groupBy("term")
      .agg(count(lit(1)).as("n"))
      .orderBy(desc("n"), asc("term"))
      .limit(20)
      .withColumn("vocab_id",
        row_number().over(Window.orderBy(desc("n"), asc("term"))))
    TextAnalysis.termIds(docs.filter(col("doc_id") < 50),
        "doc_id", "text", vocab)
      .orderBy("doc_id", "pos")
  }

  val termIdsSql: String =
    """WITH counts AS (
      |  SELECT term, count(*) AS n FROM (
      |    SELECT unnest(string_split_regex(trim(lower(text)), '\s+')) AS term
      |    FROM documents)
      |  WHERE length(term) > 0
      |  GROUP BY term ORDER BY n DESC, term LIMIT 20),
      |vocab AS (
      |  SELECT term,
      |    CAST(row_number() OVER (ORDER BY n DESC, term) AS INT) AS vocab_id
      |  FROM counts),
      |toks AS (
      |  SELECT doc_id,
      |    unnest(string_split(
      |      regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ')) AS term,
      |    CAST(unnest(range(1, len(string_split(
      |      regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ')) + 1)) - 1
      |      AS INT) AS pos
      |  FROM documents WHERE doc_id < 50)
      |SELECT t.doc_id, t.pos, COALESCE(v.vocab_id, -1) AS term_id
      |FROM toks t LEFT JOIN vocab v USING (term)
      |ORDER BY doc_id, pos""".stripMargin

  /** TF-IDF per (doc, term) — corpus statistics (df, N) computed over
    * ALL documents, output bounded to the first 50 docs. */
  val tfidfQ: Q = (spark, dir) =>
    graft.ops.TextAnalysis.tfIdf(t(spark, dir, "documents"), "doc_id", "text")
      .filter(col("doc_id") < 50)
      .orderBy("doc_id", "term")

  val tfidfSql: String =
    """WITH terms AS (
      |  SELECT doc_id,
      |    unnest(string_split_regex(trim(lower(text)), '\s+')) AS term
      |  FROM documents),
      |tf AS (
      |  SELECT doc_id, term, count(*) AS tf FROM terms
      |  WHERE length(term) > 0 GROUP BY doc_id, term),
      |dfq AS (SELECT term, count(*) AS df_docs FROM tf GROUP BY term),
      |n AS (SELECT count(DISTINCT doc_id) AS n_docs FROM documents)
      |SELECT doc_id, tf.term, tf,
      |  round(tf * ln(CAST(n_docs AS DOUBLE) / df_docs), 6) AS tfidf
      |FROM tf JOIN dfq USING (term), n
      |WHERE doc_id < 50 ORDER BY doc_id, tf.term""".stripMargin

  /** Stateful sessionization (flatMapGroupsWithState), batch twin: the
    * custom-state streaming operator run on the batch events frame —
    * same handler code path; StreamingOpsSpec pins stream == batch.
    * Sessions identified by (user, session_start) instead of an
    * ordinal id, so the output is stable without a window. */
  val sessionizeStateful: Q = (spark, dir) =>
    graft.streaming.StreamingOps.sessionizeStream(
        t(spark, dir, "events"), "user_id", "ts", "event_id", "value",
        gapSeconds = 1800)
      .toDF()
      .select(col("user_id"), col("session_start"), col("n_events"),
        col("duration_sec"), round(col("total_value"), 4).as("total_value"))
      .orderBy("user_id", "session_start")

  val sessionizeStatefulSql: String =
    """WITH marked AS (
      |  SELECT user_id, event_id, value,
      |    CAST(floor(epoch(ts)) AS BIGINT) AS es,
      |    CASE WHEN CAST(floor(epoch(ts)) AS BIGINT)
      |           - lag(CAST(floor(epoch(ts)) AS BIGINT)) OVER w IS NULL
      |         OR CAST(floor(epoch(ts)) AS BIGINT)
      |           - lag(CAST(floor(epoch(ts)) AS BIGINT)) OVER w > 1800
      |         THEN 1 ELSE 0 END AS is_start
      |  FROM events
      |  WINDOW w AS (PARTITION BY user_id
      |               ORDER BY CAST(floor(epoch(ts)) AS BIGINT), event_id)),
      |ids AS (
      |  SELECT user_id, value, es,
      |    sum(is_start) OVER (PARTITION BY user_id ORDER BY es, event_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
      |  FROM marked)
      |SELECT CAST(user_id AS BIGINT) AS user_id,
      |  min(es) AS session_start, count(*) AS n_events,
      |  max(es) - min(es) AS duration_sec,
      |  round(sum(value), 4) AS total_value
      |FROM ids GROUP BY user_id, session_id
      |ORDER BY user_id, session_start""".stripMargin

  /** Sliding (hopping) windows, batch twin: 1-day windows hopping
    * every 12 h — each event lands in exactly two windows. Oracle
    * reproduces Spark's epoch-aligned window starts with integer
    * epoch arithmetic over the two hop offsets. */
  val windowSlidingBatch: Q = (spark, dir) =>
    graft.streaming.StreamingOps.slidingCounts(
        t(spark, dir, "events").select("event_id", "ts", "event_type", "value"),
        "ts", "event_type", "1 day", "12 hours")
      .select(date_format(col("window_start"), "yyyy-MM-dd HH:mm")
          .as("window_start"),
        col("event_type"), col("n"),
        round(col("total_value"), 4).as("total_value"))
      .orderBy("window_start", "event_type")

  val windowSlidingBatchSql: String =
    """SELECT strftime(make_timestamp(
      |    ((CAST(floor(epoch(ts) / 43200) AS BIGINT) - k) * 43200) * 1000000),
      |    '%Y-%m-%d %H:%M') AS window_start,
      |  event_type, count(*) AS n, round(sum(value), 4) AS total_value
      |FROM events, (SELECT unnest([0, 1]) AS k) offs
      |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  // --------------------------------------- §2.9 extended window ranks

  /** Rank-family battery: dense_rank / ntile / percent_rank /
    * cume_dist over one shared window (single sort per partition);
    * ties broken by key so every rank is deterministic. */
  val windowRanks: Q = (spark, dir) => {
    val w = Window.partitionBy(col("c_mktsegment"))
      .orderBy(col("c_acctbal").desc, col("c_custkey"))
    t(spark, dir, "customer")
      .select(col("c_custkey"), col("c_mktsegment"), col("c_acctbal"),
        dense_rank().over(w).as("drank"),
        ntile(4).over(w).as("quartile"),
        round(percent_rank().over(w), 6).as("pct_rank"),
        round(cume_dist().over(w), 6).as("cdist"))
      .orderBy("c_custkey")
  }

  val windowRanksSql: String =
    """SELECT c_custkey, c_mktsegment, c_acctbal,
      |  CAST(dense_rank() OVER w AS INT) AS drank,
      |  CAST(ntile(4) OVER w AS INT) AS quartile,
      |  round(percent_rank() OVER w, 6) AS pct_rank,
      |  round(cume_dist() OVER w, 6) AS cdist
      |FROM customer
      |WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey)
      |ORDER BY c_custkey""".stripMargin

  /** Stream-stream interval join, batch twin: clicks attributed to
    * same-user views within the preceding 30 min. The oracle mirrors
    * Spark's µs timestamp comparison with epoch_us (the parquet
    * carries ns — comparing raw ns timestamps could flip boundary
    * pairs). */
  val intervalJoinBatch: Q = (spark, dir) => {
    val ev = t(spark, dir, "events")
      .select("event_id", "ts", "user_id", "event_type")
    graft.streaming.StreamingOps.intervalJoin(
        ev.filter(col("event_type") === "click"),
        ev.filter(col("event_type") === "view"),
        "user_id", "ts", lookbackSeconds = 1800)
      .select(col("event_id").as("click_id"),
        col("event_id_r").as("view_id"), col("user_id"))
      .orderBy("click_id", "view_id")
  }

  val intervalJoinBatchSql: String =
    """SELECT c.event_id AS click_id, v.event_id AS view_id, c.user_id
      |FROM events c JOIN events v
      |  ON c.event_type = 'click' AND v.event_type = 'view'
      | AND c.user_id = v.user_id
      | AND epoch_us(v.ts) BETWEEN epoch_us(c.ts) - 1800000000
      |                        AND epoch_us(c.ts)
      |ORDER BY click_id, view_id""".stripMargin

  /** Stream-stream LEFT OUTER interval join, batch twin: clicks with
    * or without an attributable same-user view in the lookback — the
    * "unattributed conversions survive" variant. On streams the outer
    * rows emit once the watermark proves no match can arrive
    * (StreamingOpsSpec pins stream == this batch twin). */
  val intervalJoinLeftBatch: Q = (spark, dir) => {
    val ev = t(spark, dir, "events")
      .select("event_id", "ts", "user_id", "event_type")
    graft.streaming.StreamingOps.intervalJoin(
        ev.filter(col("event_type") === "click"),
        ev.filter(col("event_type") === "view"),
        "user_id", "ts", lookbackSeconds = 1800, joinType = "left_outer")
      .select(col("event_id").as("click_id"),
        col("event_id_r").as("view_id"), col("user_id"))
      .orderBy("click_id", "view_id")
  }

  val intervalJoinLeftBatchSql: String =
    """SELECT c.event_id AS click_id, v.event_id AS view_id, c.user_id
      |FROM (SELECT * FROM events WHERE event_type = 'click') c
      |LEFT JOIN (SELECT * FROM events WHERE event_type = 'view') v
      |  ON c.user_id = v.user_id
      | AND epoch_us(v.ts) BETWEEN epoch_us(c.ts) - 1800000000
      |                        AND epoch_us(c.ts)
      |ORDER BY click_id, view_id""".stripMargin

  /** Corrupt-record rescue (`from_json` PERMISSIVE +
    * columnNameOfCorruptRecord): every 7th doc is deterministically
    * truncated mid-object; malformed rows land in the rescue column
    * with parsed fields null — NOT dropped (the quarantine-don't-lose
    * ingest contract). Oracle mirrors with json_valid. */
  val jsonRescue: Q = (spark, dir) => {
    val doc = when(col("event_id") % 7 === 0,
        expr("substring(props, 1, length(props) - 1)"))
      .otherwise(col("props"))
    t(spark, dir, "events")
      .select(col("event_id"), doc.as("doc"))
      .withColumn("p", from_json(col("doc"),
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("k",
            org.apache.spark.sql.types.IntegerType),
          org.apache.spark.sql.types.StructField("_corrupt",
            org.apache.spark.sql.types.StringType))),
        Map("columnNameOfCorruptRecord" -> "_corrupt")))
      .select(col("event_id"), col("p.k").as("k"),
        col("p._corrupt").isNotNull.as("is_corrupt"),
        coalesce(col("p._corrupt"), lit("")).as("rescued"))
      .orderBy("event_id")
  }

  val jsonRescueSql: String =
    """WITH j AS (
      |  SELECT event_id,
      |    CASE WHEN event_id % 7 = 0
      |         THEN substring(props, 1, length(props) - 1)
      |         ELSE props END AS doc
      |  FROM events)
      |SELECT event_id,
      |  CASE WHEN json_valid(doc)
      |       THEN CAST(json_extract(doc, '$.k') AS INT) END AS k,
      |  NOT json_valid(doc) AS is_corrupt,
      |  CASE WHEN json_valid(doc) THEN '' ELSE doc END AS rescued
      |FROM j ORDER BY event_id""".stripMargin

  /** Write-Audit-Publish ([[graft.storage.WriteAuditPublish]]): stage →
    * value-audit the written files → publish. The published table's
    * aggregate must equal the source's (audit passed, nothing mutated);
    * the abort path (bad data never readable at the live path) is
    * pinned in WapSpec. */
  val wapQ: Q = (spark, dir) => {
    val st = new BasicStorage(spark)
    val out = java.nio.file.Files
      .createTempDirectory("graft_wap_q").toString + "/t"
    val ev = t(spark, dir, "events")
      .select("event_id", "user_id", "event_type", "value")
    val report = graft.storage.WriteAuditPublish.run(spark, st, ev, out,
      Seq(
        graft.core.Expectations.NotNull("event_id"),
        graft.core.Expectations.InRange("value", 0.0, 1000.0),
        graft.core.Expectations.OneOf("event_type",
          Seq("click", "view", "purchase", "signup", "error"))))
    val nRules = report.count() // driver-side: rules-count rows
    st.read(out, "parquet")
      .agg(count(lit(1)).as("n"), dsum(col("value")).as("total_value"))
      .withColumn("rules_passed", lit(nRules))
  }

  val wapSql: String =
    s"""SELECT count(*) AS n, ${sqlDsum("value")} AS total_value,
       |  CAST(3 AS BIGINT) AS rules_passed FROM events""".stripMargin

  /** Chained stateful operators, batch twin
    * ([[graft.streaming.StreamingOps.attributedWindowCounts]]):
    * stream-stream interval join → tumbling window count in one
    * query — two state stores back to back on streams
    * (StreamingOpsSpec pins stream == this twin). Oracle: the same
    * join + day-truncated grouping in SQL. */
  val attrWindowBatch: Q = (spark, dir) => {
    val ev = t(spark, dir, "events")
      .select("event_id", "ts", "user_id", "event_type")
    graft.streaming.StreamingOps.attributedWindowCounts(
        ev.filter(col("event_type") === "click"),
        ev.filter(col("event_type") === "view"),
        "user_id", "ts", lookbackSeconds = 1800, windowLen = "1 day")
      .select(date_format(col("window_start"), "yyyy-MM-dd")
        .as("window_day"), col("n_pairs"))
      .orderBy("window_day")
  }

  val attrWindowBatchSql: String =
    """SELECT strftime(date_trunc('day', c.ts), '%Y-%m-%d') AS window_day,
      |  count(*) AS n_pairs
      |FROM events c JOIN events v
      |  ON c.event_type = 'click' AND v.event_type = 'view'
      | AND c.user_id = v.user_id
      | AND epoch_us(v.ts) BETWEEN epoch_us(c.ts) - 1800000000
      |                        AND epoch_us(c.ts)
      |GROUP BY 1 ORDER BY window_day""".stripMargin

  /** TPC-H Q18 shape (large-volume customers): the aggregated-semi-join
    * pattern — a HAVING subquery reduces lineitem to qualifying order
    * keys (partial-agg shuffle), orders are SEMI-joined against that
    * compact set before any wide join, and the top-100 leaves as
    * TakeOrderedAndProject. */
  val tpchQ18: Q = (spark, dir) => {
    val li = t(spark, dir, "lineitem")
    val big = li.groupBy(col("l_orderkey"))
      .agg(sum(col("l_quantity")).as("__q"))
      .filter(col("__q") > 300).select("l_orderkey")
    val o = t(spark, dir, "orders")
      .join(big, col("o_orderkey") === big("l_orderkey"), "left_semi")
    o.join(t(spark, dir, "customer"),
        col("o_custkey") === col("c_custkey"))
      .join(li, col("o_orderkey") === li("l_orderkey"))
      .groupBy(col("c_name"), col("c_custkey"), col("o_orderkey"),
        col("o_totalprice"))
      .agg(dsum(col("l_quantity")).as("total_qty"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .limit(100)
  }

  val tpchQ18Sql: String =
    s"""SELECT c_name, c_custkey, o_orderkey, o_totalprice,
       |  ${sqlDsum("l_quantity")} AS total_qty
       |FROM customer, orders, lineitem
       |WHERE o_orderkey IN (
       |  SELECT l_orderkey FROM lineitem
       |  GROUP BY l_orderkey HAVING sum(l_quantity) > 300)
       |  AND c_custkey = o_custkey AND o_orderkey = l_orderkey
       |GROUP BY c_name, c_custkey, o_orderkey, o_totalprice
       |ORDER BY o_totalprice DESC, o_orderkey LIMIT 100""".stripMargin

  /** DataFrame `observe` metrics ([[org.apache.spark.sql.Observation]]):
    * the production write-metrics API — aggregates computed ON THE
    * WRITE PASS itself (no second scan of the written data) and
    * delivered to the driver through the listener bus. The output row
    * is built from the observed values, so the oracle checks the
    * metrics path end to end. */
  val observeQ: Q = (spark, dir) => {
    val st = new BasicStorage(spark)
    val out = java.nio.file.Files
      .createTempDirectory("graft_obs_q").toString + "/t"
    val obs = org.apache.spark.sql.Observation("write_metrics")
    val ev = t(spark, dir, "events")
      .select("event_id", "user_id", "value")
      .observe(obs, count(lit(1)).as("n"),
        sum(iscale(col("value"), 2)).as("cents"))
    st.write(ev, out, "parquet", "overwrite")
    val m = obs.get
    import spark.implicits._
    Seq((m("n").asInstanceOf[Long], m("cents").asInstanceOf[Long]))
      .toDF("n", "cents")
  }

  val observeSql: String =
    s"""SELECT count(*) AS n,
       |  CAST(sum(${sqlIscale("value", 2)}) AS BIGINT) AS cents
       |FROM events""".stripMargin

  /** User-path mining ([[graft.ops.Analytics.userPaths]]): each
    * user's first-5 event-type journey, counted across users — ties
    * broken by event_id so the path is engine-deterministic. */
  val userPathsQ: Q = (spark, dir) =>
    graft.ops.Analytics.userPaths(
        t(spark, dir, "events"), "user_id",
        Seq(col("ts"), col("event_id")), "event_type", depth = 5)
      .orderBy(col("n_users").desc, col("path"))

  val userPathsSql: String =
    """WITH r AS (
      |  SELECT user_id, event_type,
      |    row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id)
      |      AS rk
      |  FROM events),
      |p AS (
      |  SELECT user_id,
      |    string_agg(event_type, '>' ORDER BY rk) AS path
      |  FROM r WHERE rk <= 5 GROUP BY user_id)
      |SELECT path, count(*) AS n_users FROM p GROUP BY path
      |ORDER BY n_users DESC, path""".stripMargin

  /** Null-handling battery: null-introducing casts, `na.fill` (typed
    * map form) and `na.drop` (column subset) — the DataFrameNaFunctions
    * surface — all map-only. */
  val nullHandling: Q = (spark, dir) =>
    t(spark, dir, "customer")
      .select(col("c_custkey"),
        when(col("c_mktsegment") === "BUILDING", lit(null).cast("string"))
          .otherwise(col("c_mktsegment")).as("segment_filled"),
        when(col("c_acctbal") < 0, lit(null).cast("double"))
          .otherwise(col("c_acctbal")).as("bal"))
      .na.fill(Map("segment_filled" -> "UNKNOWN"))
      .na.drop("any", Seq("bal"))
      .orderBy("c_custkey")

  val nullHandlingSql: String =
    """SELECT c_custkey,
      |  CASE WHEN c_mktsegment = 'BUILDING' THEN 'UNKNOWN'
      |       ELSE c_mktsegment END AS segment_filled,
      |  c_acctbal AS bal
      |FROM customer WHERE c_acctbal >= 0
      |ORDER BY c_custkey""".stripMargin

  /** Group-wise top-k: top-5 terms per language. Aggregate-then-
    * BOUNDED-aggregate: term counts partial-agg map-side, then the
    * per-language pick is `minK(struct(−n, term), 5)` — ≤ 5 terms per
    * language per partition cross the second shuffle. The former rank
    * window partitioned by `lang` funneled every distinct term of a
    * language through ONE reducer — the low-cardinality-partition
    * hot spot (a handful of languages = a handful of busy cores at
    * 100 TB). Sign-flipped count gives (n desc, term asc), the
    * row_number ordering, exactly. */
  val topTermsPerLang: Q = (spark, dir) => {
    val counts = t(spark, dir, "documents")
      .select(col("lang"), TextAnalysis.tokens(col("text")).as("__toks"))
      .select(col("lang"), explode(col("__toks")).as("term"))
      .filter(length(col("term")) > 0)
      .groupBy("lang", "term")
      .agg(count(lit(1)).as("n"))
    counts.groupBy(col("lang"))
      .agg(graft.functions.BoundedTopKAgg.minK(
        struct((-col("n")).as("nn"), col("term").as("term")), 5)
        .as("__top"))
      .select(col("lang"), posexplode(col("__top")).as(Seq("__pos", "__s")))
      .select(col("lang"), col("__s.term").as("term"),
        (-col("__s.nn")).as("n"), (col("__pos") + 1).cast("int").as("rnk"))
      .orderBy("lang", "rnk")
  }

  val topTermsPerLangSql: String =
    """WITH counts AS (
      |  SELECT lang, term, count(*) AS n FROM (
      |    SELECT lang,
      |      unnest(string_split_regex(trim(lower(text)), '\s+')) AS term
      |    FROM documents)
      |  WHERE length(term) > 0 GROUP BY lang, term)
      |SELECT lang, term, n,
      |  CAST(row_number() OVER (PARTITION BY lang ORDER BY n DESC, term) AS INT) AS rnk
      |FROM counts QUALIFY rnk <= 5
      |ORDER BY lang, rnk""".stripMargin

  // ------------------------------------------- §2.5 argmin/argmax agg

  /** max_by/min_by (argmax/argmin) with a composite (value, key)
    * ordering struct — deterministic under value ties without a
    * window. One hash-shuffle aggregate. */
  val minmaxBy: Q = (spark, dir) =>
    t(spark, dir, "supplier")
      .groupBy(col("s_nationkey"))
      .agg(
        max_by(col("s_name"),
          struct(col("s_acctbal"), col("s_suppkey"))).as("top_supplier"),
        max(col("s_acctbal")).as("top_acctbal"),
        min_by(col("s_name"),
          struct(col("s_acctbal"), col("s_suppkey"))).as("bottom_supplier"),
        min(col("s_acctbal")).as("bottom_acctbal"))
      .orderBy("s_nationkey")

  /** Oracle mirrors the struct ordering with explicit tie-break
    * windows: max_by(struct(v, k)) == first name by (v DESC, k DESC);
    * min_by == first by (v ASC, k ASC). */
  val minmaxBySql: String =
    """WITH ranked AS (
      |  SELECT s_nationkey, s_name, s_acctbal,
      |    row_number() OVER (PARTITION BY s_nationkey
      |      ORDER BY s_acctbal DESC, s_suppkey DESC) AS rmax,
      |    row_number() OVER (PARTITION BY s_nationkey
      |      ORDER BY s_acctbal ASC, s_suppkey ASC) AS rmin
      |  FROM supplier)
      |SELECT s_nationkey,
      |  max(CASE WHEN rmax = 1 THEN s_name END) AS top_supplier,
      |  max(s_acctbal) AS top_acctbal,
      |  max(CASE WHEN rmin = 1 THEN s_name END) AS bottom_supplier,
      |  min(s_acctbal) AS bottom_acctbal
      |FROM ranked GROUP BY s_nationkey ORDER BY s_nationkey""".stripMargin

  // ------------------------------------------- §2.8 regexp functions

  /** Regexp battery: extract (group), global replace, match-count,
    * rlike — all RE2-safe patterns (no backrefs/lookaround) so Spark's
    * java.util.regex and DuckDB's RE2 agree. */
  val regexpFunctions: Q = (spark, dir) =>
    t(spark, dir, "part")
      .select(col("p_partkey"),
        regexp_extract(col("p_name"), "^(\\w+)", 1).as("first_word"),
        regexp_extract(col("p_brand"), "([0-9]+)$", 1).as("brand_num"),
        regexp_replace(col("p_name"), "[aeiou]", "_").as("devoweled"),
        size(regexp_extract_all(col("p_name"), lit("[aeiou]"), lit(0)))
          .as("n_vowels"),
        col("p_type").rlike("^(ECONOMY|SMALL)$").as("is_small_econ"))
      .orderBy("p_partkey")

  val regexpFunctionsSql: String =
    """SELECT p_partkey,
      |  regexp_extract(p_name, '^(\w+)', 1) AS first_word,
      |  regexp_extract(p_brand, '([0-9]+)$', 1) AS brand_num,
      |  regexp_replace(p_name, '[aeiou]', '_', 'g') AS devoweled,
      |  CAST(len(regexp_extract_all(p_name, '[aeiou]')) AS INT) AS n_vowels,
      |  regexp_matches(p_type, '^(ECONOMY|SMALL)$') AS is_small_econ
      |FROM part ORDER BY p_partkey""".stripMargin

  // ------------------------------------------------ §2.10 streaming

  /** File-stream passthrough: readStream (schema probe) → writeStream →
    * drain → read result (reference streaming surface; no oracle). */
  val streamPassthrough: Q = (spark, dir) => {
    val st = new BasicStorage(spark)
    val out = java.nio.file.Files
      .createTempDirectory("graft_stream_q").toString
    // File-stream sources watch directories; stage the events into one
    // (the reference's own stream tests follow the same batch-write →
    // stream-read shape, test/storage/test_basic.py:46-69).
    val staged = t(spark, dir, "events")
      .select("event_id", "user_id", "event_type", "value")
    st.write(staged, s"$out/in", "parquet", "overwrite")
    val stream = st.readStream(s"$out/in", "parquet")
    val q = st.writeStream(stream, s"$out/data", "parquet", s"$out/cp")
    try q.processAllAvailable()
    finally q.stop() // also on failure — don't leak a running query
    st.read(s"$out/data", "parquet")
      .select("event_id", "user_id", "event_type", "value")
      .orderBy("event_id")
  }

  /** Passthrough means exactly that — the sink must hold the staged
    * rows byte-for-byte, so the oracle is the plain projection. */
  val streamPassthroughSql: String =
    """SELECT event_id, user_id, event_type, value
      |FROM events ORDER BY event_id""".stripMargin

  /** Stream-static enrichment: a REAL file stream of events left-joins
    * the static customer dimension (broadcast per micro-batch, no
    * state store) on its way to the sink; the oracle is the plain
    * batch left join — streaming must not change join results. */
  val streamStaticJoin: Q = (spark, dir) => {
    val st = new BasicStorage(spark)
    val out = java.nio.file.Files
      .createTempDirectory("graft_stream_sj").toString
    val staged = t(spark, dir, "events")
      .select("event_id", "user_id", "event_type", "value")
    st.write(staged, s"$out/in", "parquet", "overwrite")
    val dim = t(spark, dir, "customer")
      .select(col("c_custkey"), col("c_mktsegment"))
    val enriched = graft.streaming.StreamingOps.enrichStream(
      st.readStream(s"$out/in", "parquet"), dim, "user_id", "c_custkey")
    val q = st.writeStream(enriched, s"$out/data", "parquet", s"$out/cp")
    try q.processAllAvailable()
    finally q.stop()
    st.read(s"$out/data", "parquet")
      .select("event_id", "user_id", "event_type", "value", "c_mktsegment")
      .orderBy("event_id")
  }

  val streamStaticJoinSql: String =
    """SELECT e.event_id, e.user_id, e.event_type, e.value, c.c_mktsegment
      |FROM events e LEFT JOIN customer c ON e.user_id = c.c_custkey
      |ORDER BY event_id""".stripMargin

  /** Batch-mode twin of [[streamWindow]]: the SAME
    * [[graft.streaming.StreamingOps.tumblingCounts]] aggregation over
    * the batch events frame (one code path for both — Spark semantics
    * guarantee the batch result equals the stream's final state). This
    * twin gives the shared aggregation a DuckDB oracle; the
    * stream-equals-batch half of the argument is pinned in
    * StreamingOpsSpec, which closes the oracle gap on the streaming
    * declaration. */
  val windowTumblingBatch: Q = (spark, dir) =>
    graft.streaming.StreamingOps.tumblingCounts(
        t(spark, dir, "events").select("event_id", "ts", "event_type", "value"),
        "ts", "event_type", "1 day")
      .select(date_format(col("window_start"), "yyyy-MM-dd").as("window_day"),
        col("event_type"), col("n"),
        round(col("total_value"), 4).as("total_value"))
      .orderBy("window_day", "event_type")

  /** Spark's "1 day" tumbling windows are epoch-aligned UTC days (the
    * session timezone is UTC), so date_trunc reproduces the window
    * start exactly. */
  val windowTumblingBatchSql: String =
    """SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS window_day,
      |  event_type, count(*) AS n, round(sum(value), 4) AS total_value
      |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  /** Watermarked tumbling-window streaming aggregation (extension past
    * the reference's passthrough streaming, SURVEY §2.10). Two staged
    * input files processed one per micro-batch; a far-future sentinel
    * event in the second batch advances the watermark so every real
    * window flushes to the append-mode sink. No oracle (streaming) —
    * but the aggregation itself is oracle-checked through its batch
    * twin [[windowTumblingBatch]], and stream==batch is pinned in
    * StreamingOpsSpec. */
  val streamWindow: Q = (spark, dir) => {
    val st = new BasicStorage(spark)
    val out = java.nio.file.Files
      .createTempDirectory("graft_streamw_q").toString
    val events = t(spark, dir, "events")
      .select("event_id", "ts", "event_type", "value")
    // one file per stage: with maxFilesPerTrigger=1 each staged FILE is
    // a micro-batch — an uncoalesced write would mean one batch per
    // shuffle partition (32 batches of fixed overhead each)
    st.write(events.coalesce(1), s"$out/in", "parquet", "overwrite")
    // The file source orders same-mtime files arbitrarily; the sentinel
    // must be the LAST micro-batch or the watermark drops everything as
    // late. Identify it by diffing the listing and push its mtime well
    // past the staged data's.
    val inPath = new org.apache.hadoop.fs.Path(s"$out/in")
    val fs = inPath.getFileSystem(spark.sessionState.newHadoopConf())
    def parquetFiles = fs.listStatus(inPath)
      .filter(_.getPath.getName.endsWith(".parquet"))
    val before = parquetFiles.map(_.getPath.getName).toSet
    val sentinel = events.orderBy("event_id").limit(1)
      .withColumn("ts", col("ts") + expr("INTERVAL 365 DAYS"))
    sentinel.coalesce(1).write.mode("append").parquet(s"$out/in")
    val latest = parquetFiles.map(_.getModificationTime).max
    parquetFiles.filterNot(f => before(f.getPath.getName)).foreach(f =>
      fs.setTimes(f.getPath, latest + 60000, -1))
    val stream = spark.readStream.schema(events.schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(s"$out/in")
    val agg = graft.streaming.StreamingOps.tumblingCounts(
      stream, "ts", "event_type", "1 day")
    // Stateful streaming pins shuffle partitions at first checkpoint
    // and instantiates one state store per partition per micro-batch;
    // at this state size (days × event types) 4 partitions carry the
    // load and 32 would be 8× fixed store overhead per batch.
    val prevShuffle = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "4")
    var q: org.apache.spark.sql.streaming.StreamingQuery = null
    try {
      q = agg.writeStream.outputMode("append")
        .option("checkpointLocation", s"$out/cp")
        .format("parquet").start(s"$out/data")
      q.processAllAvailable()
    } finally {
      spark.conf.set("spark.sql.shuffle.partitions", prevShuffle)
      if (q != null) q.stop() // also on failure — a leaked query would
                              // keep running against the temp checkpoint
    }
    st.read(s"$out/data", "parquet")
      .select(date_format(col("window_start"), "yyyy-MM-dd").as("window_day"),
        col("event_type"), col("n"),
        round(col("total_value"), 4).as("total_value"))
      .orderBy("window_day", "event_type")
  }

  /** Streaming deduplication: a second staged file replays exact copies
    * of ~1/7th of the events; stateful dropDuplicates on the key emits
    * each event once across micro-batches. Replayed rows are identical
    * in every column, so the surviving set is batch-order independent —
    * the oracle is the plain distinct projection. */
  val streamDedup: Q = (spark, dir) => {
    val st = new BasicStorage(spark)
    val out = java.nio.file.Files
      .createTempDirectory("graft_streamdd_q").toString
    val events = t(spark, dir, "events")
      .select("event_id", "user_id", "event_type", "value")
    st.write(events.coalesce(1), s"$out/in", "parquet", "overwrite")
    events.filter(col("event_id") % 7 === 0)
      .coalesce(1).write.mode("append").parquet(s"$out/in")
    val stream = spark.readStream.schema(events.schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(s"$out/in")
    val deduped = stream.dropDuplicates("event_id")
    // one state store per shuffle partition per micro-batch — size the
    // state shuffle like q_stream_window does
    val prevShuffle = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "4")
    var q: org.apache.spark.sql.streaming.StreamingQuery = null
    try {
      q = deduped.writeStream.outputMode("append")
        .option("checkpointLocation", s"$out/cp")
        .format("parquet").start(s"$out/data")
      q.processAllAvailable()
    } finally {
      spark.conf.set("spark.sql.shuffle.partitions", prevShuffle)
      if (q != null) q.stop() // also on failure — don't leak the query
    }
    st.read(s"$out/data", "parquet")
      .select("event_id", "user_id", "event_type", "value")
      .orderBy("event_id")
  }

  val streamDedupSql: String =
    """SELECT event_id, user_id, event_type, value
      |FROM events ORDER BY event_id""".stripMargin

  /** Streaming dedup with BOUNDED state: dropDuplicatesWithinWatermark
    * evicts key state once the watermark passes it (plain streaming
    * dropDuplicates grows state forever — this is the indefinitely-
    * running ingest shape). Replays land inside the horizon here, so
    * the surviving set is the plain distinct projection, which is the
    * oracle; event timestamps stay out of the output (nanos rule). */
  val streamDedupWatermark: Q = (spark, dir) => {
    val st = new BasicStorage(spark)
    val out = java.nio.file.Files
      .createTempDirectory("graft_streamwdd_q").toString
    val events = t(spark, dir, "events")
      .select("event_id", "ts", "user_id", "event_type")
    st.write(events.coalesce(1), s"$out/in", "parquet", "overwrite")
    events.filter(col("event_id") % 7 === 0)
      .coalesce(1).write.mode("append").parquet(s"$out/in")
    val stream = spark.readStream.schema(events.schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(s"$out/in")
    val deduped = graft.streaming.StreamingOps.dedupWithinWatermark(
      stream, "ts", "1 day", Seq("event_id"))
    val prevShuffle = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "4")
    var q: org.apache.spark.sql.streaming.StreamingQuery = null
    try {
      q = deduped.writeStream.outputMode("append")
        .option("checkpointLocation", s"$out/cp")
        .format("parquet").start(s"$out/data")
      q.processAllAvailable()
    } finally {
      spark.conf.set("spark.sql.shuffle.partitions", prevShuffle)
      if (q != null) q.stop() // also on failure — don't leak the query
    }
    st.read(s"$out/data", "parquet")
      .select("event_id", "user_id", "event_type")
      .orderBy("event_id")
  }

  val streamDedupWatermarkSql: String =
    """SELECT event_id, user_id, event_type
      |FROM events ORDER BY event_id""".stripMargin

  /** File-level data skipping: write lineitem range-clustered on
    * l_orderkey, collect per-file min/max footer stats into the
    * `_graft_stats` sidecar, then answer a selective key-range query
    * reading ONLY the files whose range intersects — partition-pruning
    * power on a non-partition column (the poor man's Z-order). The
    * oracle is the same aggregation over the raw table: pruning must be
    * invisible to results. */
  val dataSkipping: Q = (spark, dir) => {
    val out = java.nio.file.Files
      .createTempDirectory("graft_skip_q").toString + "/t"
    val li = t(spark, dir, "lineitem")
      .select("l_orderkey", "l_quantity", "l_extendedprice")
    li.repartitionByRange(8, col("l_orderkey")).write.parquet(out)
    graft.storage.DataSkipping.collectStats(spark, out,
      Seq("l_orderkey", "l_quantity"))
    // conjunctive pruning: the key range prunes files (clustered
    // layout); the quantity range rides along (scattered — prunes
    // nothing, must also drop nothing)
    graft.storage.DataSkipping
      .prunedReadMulti(spark, out, Seq(
        ("l_orderkey", Some(1000L), Some(2000L)),
        ("l_quantity", Some(5.0d), None)))
      .filter(col("l_orderkey").between(1000L, 2000L) &&
        col("l_quantity") >= 5.0d)
      .agg(count(lit(1)).as("n"),
        dsum(col("l_extendedprice")).as("total_price"),
        min(col("l_orderkey")).as("min_key"),
        max(col("l_orderkey")).as("max_key"))
  }

  val dataSkippingSql: String =
    s"""SELECT count(*) AS n, ${sqlDsum("l_extendedprice")} AS total_price,
       |  min(l_orderkey) AS min_key, max(l_orderkey) AS max_key
       |FROM lineitem
       |WHERE l_orderkey BETWEEN 1000 AND 2000 AND l_quantity >= 5.0""".stripMargin

  /** Bloom file skipping ([[graft.storage.DataSkipping.collectBloom]]):
    * point lookups on a HIGH-CARDINALITY scattered column — min/max
    * stats prune nothing there (every file spans the id range), the
    * per-file Bloom sidecar prunes to ~the one file per needle.
    * Conservative superset + exact row filter; the oracle is the plain
    * IN-list query, so pruning must be result-invisible. OpsSpec pins
    * that files are actually dropped. */
  val bloomSkipping: Q = (spark, dir) => {
    val out = java.nio.file.Files
      .createTempDirectory("graft_bloomskip_q").toString + "/t"
    val ev = t(spark, dir, "events").select("event_id", "user_id", "value")
    // hash-scatter into 8 files: ids interleave, min/max can't prune
    ev.repartition(8, col("event_id")).write.parquet(out)
    graft.storage.DataSkipping.collectBloom(spark, out, "event_id",
      expectedItemsPerFile = 100000L)
    val wanted = Seq(42L, 4242L, 7777L, 999999999L) // last one absent
    graft.storage.DataSkipping
      .prunedReadBloom(spark, out, "event_id", wanted)
      .filter(col("event_id").isin(wanted: _*))
      .select("event_id", "user_id", "value")
      .orderBy("event_id")
  }

  val bloomSkippingSql: String =
    """SELECT event_id, user_id, value FROM events
      |WHERE event_id IN (42, 4242, 7777, 999999999)
      |ORDER BY event_id""".stripMargin

  /** Merge-on-read DELETE ([[graft.storage.MorDelete]]): two
    * tombstone deletes (no data rewrite — spec pins files
    * byte-identical), the MoR view aggregated and MATERIALIZED, then
    * compaction folds tombstones into one COW rewrite and the plain
    * read must agree — the whole deletion-vector lifecycle against
    * one oracle. */
  val deleteMorQ: Q = (spark, dir) => {
    val st = new BasicStorage(spark)
    val out = java.nio.file.Files
      .createTempDirectory("graft_mor_q").toString + "/t"
    val ev = t(spark, dir, "events")
      .select("event_id", "user_id", "event_type", "value")
    st.write(ev, out, "delta", "overwrite")
    graft.storage.MorDelete.deleteWhere(spark, st, out,
      "event_type = 'error'", Seq("event_id"))
    graft.storage.MorDelete.deleteWhere(spark, st, out,
      "value > 400", Seq("event_id"))
    def agg(df: DataFrame, phase: String) = df.agg(
        count(lit(1)).as("n"), dsum(col("value")).as("total_value"),
        min(col("event_id")).as("min_id"),
        max(col("event_id")).as("max_id"))
      .withColumn("phase", lit(phase))
    // materialize the MoR view BEFORE compacting — this row must come
    // from the tombstone-subtracting read path, not the rewritten table
    val morRow = agg(graft.storage.MorDelete.read(spark, st, out,
      Seq("event_id")), "mor").localCheckpoint(true)
    graft.storage.MorDelete.compact(spark, st, out, Seq("event_id"))
    morRow.union(agg(st.read(out, "delta"), "compacted"))
      .select("phase", "n", "total_value", "min_id", "max_id")
      .orderBy("phase")
  }

  val deleteMorSql: String =
    s"""SELECT phase, count(*) AS n, ${sqlDsum("value")} AS total_value,
       |  min(event_id) AS min_id, max(event_id) AS max_id
       |FROM events, (VALUES ('compacted'), ('mor')) p(phase)
       |WHERE NOT (event_type = 'error' OR value > 400)
       |GROUP BY phase ORDER BY phase""".stripMargin

  /** Metadata-only aggregates
    * ([[graft.storage.DataSkipping.metadataProfile]]): count / nulls /
    * min / max answered from the footer-stats sidecar with ZERO data
    * files opened — the Delta-log instant-stats shape. The oracle
    * computes the same from the raw rows, so the sidecar must be an
    * exact account of the table. */
  val metadataAggQ: Q = (spark, dir) => {
    val out = java.nio.file.Files
      .createTempDirectory("graft_meta_q").toString + "/t"
    val li = t(spark, dir, "lineitem").select("l_orderkey", "l_quantity")
    li.repartition(6).write.parquet(out)
    graft.storage.DataSkipping.collectStats(spark, out,
      Seq("l_orderkey", "l_quantity"))
    graft.storage.DataSkipping.metadataProfile(spark, out, "l_orderkey")
      .union(graft.storage.DataSkipping
        .metadataProfile(spark, out, "l_quantity"))
      .select(col("column").as("col_name"), col("dtype"),
        col("n_rows"), col("n_nulls"),
        col("min_v").cast("double").as("min_d"),
        col("max_v").cast("double").as("max_d"))
      .orderBy("col_name")
  }

  val metadataAggSql: String =
    """SELECT 'l_orderkey' AS col_name, 'long' AS dtype,
      |  count(*) AS n_rows, CAST(0 AS BIGINT) AS n_nulls,
      |  CAST(min(l_orderkey) AS DOUBLE) AS min_d,
      |  CAST(max(l_orderkey) AS DOUBLE) AS max_d
      |FROM lineitem
      |UNION ALL
      |SELECT 'l_quantity', 'double', count(*), CAST(0 AS BIGINT),
      |  min(l_quantity), max(l_quantity)
      |FROM lineitem ORDER BY col_name""".stripMargin

  /** OPTIMIZE: a fragmented managed table (16 scattered files) is
    * compacted and range-clustered on user_id, skipping stats refresh,
    * and a selective key-range aggregate runs over the pruned file
    * list. The oracle is the same aggregate over the raw events table —
    * compaction, clustering, and pruning must all be result-invisible. */
  val optimizeTable: Q = (spark, dir) => {
    val st = new BasicStorage(spark)
    val out = java.nio.file.Files
      .createTempDirectory("graft_opt_q").toString + "/t"
    val ev = t(spark, dir, "events").select("event_id", "user_id", "value")
    st.write(ev.repartition(16), out, "delta", "overwrite")
    graft.storage.Optimize.run(spark, st, out,
      clusterBy = Seq("user_id"), targetFileBytes = 256L * 1024)
    graft.storage.DataSkipping.collectStats(spark, out, Seq("user_id"))
    graft.storage.DataSkipping
      .prunedRead(spark, out, "user_id", Some(10L), Some(20L))
      .filter(col("user_id").between(10L, 20L))
      .groupBy("user_id")
      .agg(count(lit(1)).as("n"), dsum(col("value")).as("total_value"))
      .orderBy("user_id")
  }

  val optimizeTableSql: String =
    s"""SELECT user_id, count(*) AS n, ${sqlDsum("value")} AS total_value
       |FROM events WHERE user_id BETWEEN 10 AND 20
       |GROUP BY user_id ORDER BY user_id""".stripMargin

  /** OPTIMIZE WHERE (Delta's partition-scoped compaction): a
    * fragmented priority-partitioned table has only its two hot
    * partitions compacted — the daily-maintenance shape at 100 TB,
    * where a full-table rewrite is never on the table. Scoping and
    * byte-untouched cold partitions are pinned in OptimizeSpec; the
    * oracle pins content-invisibility (the aggregate over the
    * optimized table must equal the raw-table aggregate). */
  val optimizeWhere: Q = (spark, dir) => {
    val st = new BasicStorage(spark)
    val out = java.nio.file.Files
      .createTempDirectory("graft_optw_q").toString + "/t"
    val orders = t(spark, dir, "orders")
      .select("o_orderkey", "o_totalprice", "o_orderpriority")
    st.write(orders.repartition(8), out, "delta", "overwrite",
      partitionFields = Seq("o_orderpriority"))
    graft.storage.Optimize.run(spark, st, out,
      where = Some(
        "o_orderpriority = '1-URGENT' OR o_orderpriority = '2-HIGH'"),
      targetFileBytes = 64L * 1024 * 1024)
    st.read(out, "delta")
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n"),
        dsum(col("o_totalprice")).as("total_price"))
      .orderBy("o_orderpriority")
  }

  val optimizeWhereSql: String =
    s"""SELECT o_orderpriority, count(*) AS n,
       |  ${sqlDsum("o_totalprice")} AS total_price
       |FROM orders GROUP BY o_orderpriority
       |ORDER BY o_orderpriority""".stripMargin

  /** Predicate DELETE (GDPR / retention expiry) on a partitioned
    * managed table: one partition (1-URGENT) deleted entirely — its
    * directory is cleared, dynamic overwrite would have skipped it —
    * one partition partially (2-HIGH over a price cut), the other
    * three never rewritten (partition-pruned). The oracle is the
    * survivor set from the raw table. */
  val deleteWhere: Q = (spark, dir) => {
    val st = new BasicStorage(spark)
    val out = java.nio.file.Files
      .createTempDirectory("graft_del_q").toString + "/t"
    val orders = t(spark, dir, "orders")
      .select("o_orderkey", "o_totalprice", "o_orderpriority")
    st.write(orders, out, "delta", "overwrite",
      partitionFields = Seq("o_orderpriority"))
    graft.storage.Delete.where(spark, st, out,
      "o_orderpriority = '1-URGENT' OR " +
        "(o_orderpriority = '2-HIGH' AND o_totalprice > 300000)")
    st.read(out, "delta")
      .select("o_orderkey", "o_totalprice", "o_orderpriority")
      .orderBy("o_orderkey")
  }

  val deleteWhereSql: String =
    """SELECT o_orderkey, o_totalprice, o_orderpriority FROM orders
      |WHERE NOT (o_orderpriority = '1-URGENT'
      |  OR (o_orderpriority = '2-HIGH' AND o_totalprice > 300000))
      |ORDER BY o_orderkey""".stripMargin

  /** Captured DELETE + time travel ([[graft.storage.Delete.where]]
    * with `captureChanges` — the Delta-CDF contract for DELETE): the
    * deleted rows land in the change feed as a `delete` batch, so
    * pre-delete snapshots stay reconstructible and replicas can
    * replay the delete downstream. The query returns the PRE-delete
    * snapshot rebuilt by [[graft.storage.Merge.readAsOf]] AFTER the
    * delete ran; the oracle is the post-merge state, which only
    * hash-matches if the feed's delete batch restored every deleted
    * row exactly (an uncaptured delete would refuse here — see the
    * barrier fence pinned in DeleteSpec). */
  val deleteCdfQ: Q = (spark, dir) => {
    val st = new BasicStorage(spark)
    val path = java.nio.file.Files
      .createTempDirectory("graft_delcdf_q").toString + "/t"
    val orders = t(spark, dir, "orders")
      .select("o_orderkey", "o_totalprice", "o_orderstatus")
    st.write(orders.filter(col("o_orderkey") % 7 === 0),
      path, "delta", "overwrite")
    st.merge(orders.filter(col("o_orderkey") % 3 === 0)
        .withColumn("o_totalprice", col("o_totalprice") + 500.0),
      path, "full.o_orderkey = incremental.o_orderkey",
      captureChanges = true)
    val stamp = graft.storage.Merge.changeFeed(spark, path)
      .agg(max(col("batch"))).head().getLong(0)
    graft.storage.Delete.where(spark, st, path,
      "o_totalprice > 200000", captureChanges = true)
    graft.storage.Merge.readAsOf(spark, st, path,
        Seq("o_orderkey"), stamp)
      .orderBy("o_orderkey")
  }

  val deleteCdfSql: String =
    """SELECT o_orderkey,
      |  CASE WHEN o_orderkey % 3 = 0 THEN o_totalprice + 500.0
      |       ELSE o_totalprice END AS o_totalprice,
      |  o_orderstatus
      |FROM orders
      |WHERE o_orderkey % 7 = 0 OR o_orderkey % 3 = 0
      |ORDER BY o_orderkey""".stripMargin

  /** Bucketed co-located join: both sides written as bucketed parquet
    * tables on the join key (8 buckets, bucket-sorted), then joined —
    * the scan's bucket partitioning satisfies the join's distribution
    * requirement, so the join runs WITHOUT a shuffle exchange (pinned
    * in PlanShapeSpec). The storage answer for a recurring fact⋈fact
    * join at 100 TB: two one-time bucketed writes replace two
    * full-table exchanges per run. The oracle is the plain join over
    * the raw tables — bucketing must be result-invisible. */
  val bucketedJoin: Q = (spark, dir) => {
    val loc = java.nio.file.Files
      .createTempDirectory("graft_buck_q").toString
    graft.storage.Buckets.ensureDatabase(spark, "graft_buckets", loc)
    graft.storage.Buckets.writeBucketed(
      t(spark, dir, "customer")
        .select("c_custkey", "c_mktsegment"),
      "graft_buckets.customer_b", 8, Seq("c_custkey"), Seq("c_custkey"))
    graft.storage.Buckets.writeBucketed(
      t(spark, dir, "orders").select("o_custkey", "o_totalprice"),
      "graft_buckets.orders_b", 8, Seq("o_custkey"), Seq("o_custkey"))
    val c = spark.table("graft_buckets.customer_b")
    val o = spark.table("graft_buckets.orders_b")
    c.join(o, c("c_custkey") === o("o_custkey"))
      .groupBy("c_mktsegment")
      .agg(count(lit(1)).as("n_orders"),
        round(dsum(col("o_totalprice")), 4).as("total_value"))
      .orderBy("c_mktsegment")
  }

  val bucketedJoinSql: String =
    s"""SELECT c_mktsegment, count(*) AS n_orders,
       |  round(${sqlDsum("o_totalprice")}, 4) AS total_value
       |FROM customer JOIN orders ON c_custkey = o_custkey
       |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin

  /** OPTIMIZE ZORDER: rewrite lineitem interleaving (l_orderkey,
    * l_partkey) bits, then answer range predicates on EACH column over
    * the pruned file list — multi-dimensional skipping that
    * lexicographic clustering cannot give (pinned in OptimizeSpec).
    * The oracle is the same union of aggregates on the raw table:
    * layout + pruning must be result-invisible. */
  val zorderTable: Q = (spark, dir) => {
    val st = new BasicStorage(spark)
    val out = java.nio.file.Files
      .createTempDirectory("graft_zorder_q").toString + "/t"
    val li = t(spark, dir, "lineitem")
      .select("l_orderkey", "l_partkey", "l_quantity")
    st.write(li.repartition(16), out, "delta", "overwrite")
    graft.storage.Optimize.run(spark, st, out,
      clusterBy = Seq("l_orderkey", "l_partkey"),
      targetFileBytes = 256L * 1024, zOrder = true)
    graft.storage.DataSkipping.collectStats(spark, out,
      Seq("l_orderkey", "l_partkey"))
    val byKey = graft.storage.DataSkipping
      .prunedRead(spark, out, "l_orderkey", Some(1000L), Some(3000L))
      .filter(col("l_orderkey").between(1000L, 3000L))
      .agg(count(lit(1)).as("n"), dsum(col("l_quantity")).as("sum_qty"))
      .withColumn("dim", lit("orderkey"))
    val byPart = graft.storage.DataSkipping
      .prunedRead(spark, out, "l_partkey", Some(100L), Some(500L))
      .filter(col("l_partkey").between(100L, 500L))
      .agg(count(lit(1)).as("n"), dsum(col("l_quantity")).as("sum_qty"))
      .withColumn("dim", lit("partkey"))
    byKey.unionByName(byPart).select("dim", "n", "sum_qty").orderBy("dim")
  }

  val zorderTableSql: String =
    s"""SELECT 'orderkey' AS dim, count(*) AS n, ${sqlDsum("l_quantity")} AS sum_qty
       |FROM lineitem WHERE l_orderkey BETWEEN 1000 AND 3000
       |UNION ALL
       |SELECT 'partkey' AS dim, count(*) AS n, ${sqlDsum("l_quantity")} AS sum_qty
       |FROM lineitem WHERE l_partkey BETWEEN 100 AND 500
       |ORDER BY dim""".stripMargin

  /** Streaming MERGE (CDC upsert): a staged update stream applied to a
    * managed table batch-by-batch through foreachBatch + storage.merge.
    * Update keys are unique and the batches disjoint, so the final
    * table state is independent of micro-batch order — which makes this
    * streaming query fully oracle-checkable (FULL OUTER JOIN + CASE),
    * unlike windowed aggregations. */
  val streamMerge: Q = (spark, dir) => {
    val st = new BasicStorage(spark)
    val out = java.nio.file.Files
      .createTempDirectory("graft_streammerge_q").toString
    val orders = t(spark, dir, "orders")
      .select("o_orderkey", "o_custkey", "o_totalprice", "o_orderstatus")
    val full = orders.filter(col("o_orderkey") % 5 =!= 0)
    st.write(full, s"$out/t", "delta", "overwrite")
    val updates = orders.filter(col("o_orderkey") % 3 === 0)
      .withColumn("o_orderstatus", lit("U"))
    // two disjoint staged files -> two micro-batches (keys unique
    // across batches, so final state is batching-order independent)
    updates.filter(col("o_orderkey") % 2 === 0)
      .coalesce(1).write.parquet(s"$out/in")
    updates.filter(col("o_orderkey") % 2 =!= 0)
      .coalesce(1).write.mode("append").parquet(s"$out/in")
    val stream = spark.readStream.schema(updates.schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(s"$out/in")
    val q = graft.streaming.StreamingOps.mergeStream(st, stream, s"$out/t",
      "full.o_orderkey = incremental.o_orderkey", s"$out/cp")
    try q.processAllAvailable()
    finally q.stop() // also on failure — don't leak a running query
    st.read(s"$out/t", "delta")
      .select("o_orderkey", "o_custkey", "o_totalprice", "o_orderstatus")
      .orderBy("o_orderkey")
  }

  val streamMergeSql: String =
    """WITH base AS (
      |  SELECT o_orderkey, o_custkey, o_totalprice, o_orderstatus FROM orders),
      |f AS (SELECT * FROM base WHERE o_orderkey % 5 != 0),
      |i AS (SELECT o_orderkey, o_custkey, o_totalprice, 'U' AS o_orderstatus
      |      FROM base WHERE o_orderkey % 3 = 0)
      |SELECT
      |  CASE WHEN i.o_orderkey IS NOT NULL THEN i.o_orderkey ELSE f.o_orderkey END AS o_orderkey,
      |  CASE WHEN i.o_orderkey IS NOT NULL THEN i.o_custkey ELSE f.o_custkey END AS o_custkey,
      |  CASE WHEN i.o_orderkey IS NOT NULL THEN i.o_totalprice ELSE f.o_totalprice END AS o_totalprice,
      |  CASE WHEN i.o_orderkey IS NOT NULL THEN i.o_orderstatus ELSE f.o_orderstatus END AS o_orderstatus
      |FROM f FULL OUTER JOIN i ON f.o_orderkey = i.o_orderkey
      |ORDER BY 1""".stripMargin

  /** CONTINUOUS MATERIALIZED-VIEW MAINTENANCE ([[graft.streaming
    * .StreamingOps.maintainMatView]]): the view stays fresh through a
    * LIVE stream triggered by the source's op log while captured
    * merges AND an uncaptured delete land — the refresh classification
    * (fold vs rebuild) runs inside the stream, and the final pin is
    * that a manual refresh after the stream stops is a NOOP: the
    * stream left nothing stale. Oracle-checkable because the output
    * is the final view, which must equal the aggregate of the final
    * table whatever micro-batch boundaries the stream took. */
  val streamMatview: Q = (spark, dir) => {
    import graft.storage.MatView
    val st = new BasicStorage(spark)
    val orders = t(spark, dir, "orders")
      .select("o_orderkey", "o_custkey", "o_totalprice")
    val base = orders.filter(col("o_orderkey") % 5 =!= 0)
    val root = java.nio.file.Files
      .createTempDirectory("graft_streammv_q").toString
    val (path, view, cp) = (root + "/t", root + "/v", root + "/cp")
    st.write(base, path, "delta", "overwrite")
    MatView.create(spark, st, path, view, Seq("o_custkey"), "o_totalprice")
    val q = graft.streaming.StreamingOps.maintainMatView(spark, st,
      view, cp)
    try {
      st.merge(orders.filter(col("o_orderkey") % 3 === 0)
          .withColumn("o_totalprice", col("o_totalprice") + 1000.0),
        path, "full.o_orderkey = incremental.o_orderkey",
        captureChanges = true)
      q.processAllAvailable()
      // uncaptured delete: the stream's refresh must REBUILD
      graft.storage.Delete.where(spark, st, path, "o_totalprice < 10000")
      q.processAllAvailable()
      st.merge(orders.filter(col("o_orderkey") % 7 === 0)
          .withColumn("o_totalprice", col("o_totalprice") + 500.0),
        path, "full.o_orderkey = incremental.o_orderkey",
        captureChanges = true)
      q.processAllAvailable()
    } finally q.stop()
    require(MatView.refresh(spark, st, view).mode == "noop",
      "the stream must leave the view fully fresh")
    MatView.read(spark, view)
      .select(col("o_custkey"), col("cnt"),
        col("sum").cast("double").as("total"),
        col("min"), col("max"),
        round(col("sum").cast("double") / col("cnt"), 6).as("avg_price"))
      .orderBy("o_custkey")
  }

  val streamMatviewSql: String =
    """WITH base AS (
      |  SELECT o_orderkey, o_custkey, o_totalprice FROM orders
      |  WHERE o_orderkey % 5 != 0),
      |i1 AS (SELECT o_orderkey, o_custkey, o_totalprice + 1000.0 AS o_totalprice
      |       FROM orders WHERE o_orderkey % 3 = 0),
      |m1 AS (SELECT coalesce(i1.o_orderkey, base.o_orderkey) AS o_orderkey,
      |              coalesce(i1.o_custkey, base.o_custkey) AS o_custkey,
      |              coalesce(i1.o_totalprice, base.o_totalprice) AS o_totalprice
      |       FROM base FULL OUTER JOIN i1 ON base.o_orderkey = i1.o_orderkey),
      |f AS (SELECT * FROM m1 WHERE NOT (o_totalprice < 10000)),
      |i2 AS (SELECT o_orderkey, o_custkey, o_totalprice + 500.0 AS o_totalprice
      |       FROM orders WHERE o_orderkey % 7 = 0),
      |m2 AS (SELECT coalesce(i2.o_orderkey, f.o_orderkey) AS o_orderkey,
      |              coalesce(i2.o_custkey, f.o_custkey) AS o_custkey,
      |              coalesce(i2.o_totalprice, f.o_totalprice) AS o_totalprice
      |       FROM f FULL OUTER JOIN i2 ON f.o_orderkey = i2.o_orderkey)
      |SELECT o_custkey, count(*) AS cnt,
      |  CAST(sum(CAST(o_totalprice AS DECIMAL(28,6))) AS DOUBLE) AS total,
      |  min(o_totalprice) AS min, max(o_totalprice) AS max,
      |  round(CAST(sum(CAST(o_totalprice AS DECIMAL(28,6))) AS DOUBLE)
      |    / count(*), 6) AS avg_price
      |FROM m2 GROUP BY o_custkey ORDER BY o_custkey""".stripMargin

  // ------------------------------------------- round-5: sketches & retrieval

  /** Sketch-table rollup (the pattern that justifies the custom
    * mergeable quantile sketch, SURVEY round-5): per-(day, event_type)
    * binary sketches — the rows a 100 TB pipeline would PERSIST once
    * per partition — merged per event_type and queried for quantiles
    * without ever rescanning raw values. No oracle: past k values the
    * sketch is approximate and merge-order dependent by design
    * (rows-only check; exactness + error bounds pinned in
    * QuantileSketchSpec, same precedent as q_approx_distinct). */
  val sketchRollup: Q = (spark, dir) => {
    import graft.functions.QSketch
    val daily = t(spark, dir, "events")
      .groupBy(to_date(col("ts")).as("day"), col("event_type"))
      .agg(QSketch.sketchAgg(col("value")).as("sk"),
        count(col("value")).as("n"))
    daily.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_sketches"),
        sum(col("n")).as("n_values"),
        QSketch.sketchQuantiles(QSketch.sketchMerge(col("sk")),
          Seq(0.25, 0.5, 0.9)).as("__q"))
      .select(col("event_type"), col("n_sketches"), col("n_values"),
        round(col("__q").getItem(0), 4).as("p25"),
        round(col("__q").getItem(1), 4).as("p50"),
        round(col("__q").getItem(2), 4).as("p90"))
      .orderBy("event_type")
  }

  /** HLL sketch rollup — same persisted-sketch pattern for distinct
    * counts, on Spark's built-in Datasketches HLL aggregates: per-day
    * user sketches unioned per event_type. No oracle (approximate;
    * DuckDB's approx_count_distinct is a different sketch);
    * StreamingOpsSpec-style ±5% floor pinned in OpsSpec. */
  val hllRollup: Q = (spark, dir) => {
    val daily = t(spark, dir, "events")
      .groupBy(to_date(col("ts")).as("day"), col("event_type"))
      .agg(hll_sketch_agg(col("user_id")).as("hll"))
    daily.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_days"),
        hll_sketch_estimate(hll_union_agg(col("hll"))).as("approx_users"))
      .orderBy("event_type")
  }

  /** Group-mean imputation ([[graft.ops.Analytics.imputeGroupMean]]):
    * values deterministically nulled (every 9th event), refilled with
    * the per-type exact mean of the survivors — broadcast means,
    * map-only fill, mirrored arithmetic in DuckDB. */
  val imputeQ: Q = (spark, dir) =>
    graft.ops.Analytics.imputeGroupMean(
        t(spark, dir, "events")
          .withColumn("value",
            when(col("event_id") % 9 === 0, lit(null).cast("double"))
              .otherwise(col("value"))),
        "event_type", "value")
      .select(col("event_id"), col("event_type"),
        round(col("value_f"), 6).as("value_f"), col("value_was_null"))
      .orderBy("event_id")

  val imputeSql: String =
    s"""WITH v AS (
       |  SELECT event_id, event_type,
       |    CASE WHEN event_id % 9 = 0 THEN NULL ELSE value END AS value
       |  FROM events),
       |m AS (
       |  SELECT event_type, ${sqlDavg("value")} AS gm
       |  FROM v WHERE value IS NOT NULL GROUP BY event_type)
       |SELECT event_id, v.event_type,
       |  round(coalesce(v.value, m.gm), 6) AS value_f,
       |  v.value IS NULL AS value_was_null
       |FROM v LEFT JOIN m ON v.event_type = m.event_type
       |ORDER BY event_id""".stripMargin

  /** HTML boilerplate strip ([[TextAnalysis.stripHtml]]): documents
    * wrapped in a deterministic HTML shell (script with embedded
    * angle brackets, style, comment, entities) must come back as
    * exactly their whitespace-normalized text — DuckDB runs the
    * identical RE2-safe regexp chain. */
  val htmlStripQ: Q = (spark, dir) => {
    val shell = concat(
      lit("<html><HEAD><style>p{color:red}</style></HEAD>" +
        "<body><p class=\"x\">"),
      col("text"),
      lit("</p><script type=\"t\">var x=\"<tag>\";</script>" +
        "<!-- note --><br/>&amp;done</body></html>"))
    t(spark, dir, "documents")
      .select(col("doc_id"),
        TextAnalysis.stripHtml(shell).as("stripped"))
      .select(col("doc_id"), length(col("stripped")).as("len"),
        substring(col("stripped"), 1, 60).as("head60"))
      .orderBy("doc_id")
  }

  val htmlStripSql: String =
    """WITH shell AS (
      |  SELECT doc_id,
      |    '<html><HEAD><style>p{color:red}</style></HEAD><body><p class="x">'
      |    || text ||
      |    '</p><script type="t">var x="<tag>";</script><!-- note --><br/>&amp;done</body></html>'
      |      AS h
      |  FROM documents),
      |s1 AS (SELECT doc_id, regexp_replace(h,
      |  '(?i)<script[^>]*>[\s\S]*?</script>', ' ', 'g') AS t FROM shell),
      |s2 AS (SELECT doc_id, regexp_replace(t,
      |  '(?i)<style[^>]*>[\s\S]*?</style>', ' ', 'g') AS t FROM s1),
      |s3 AS (SELECT doc_id, regexp_replace(t,
      |  '<!--[\s\S]*?-->', ' ', 'g') AS t FROM s2),
      |s4 AS (SELECT doc_id, regexp_replace(t,
      |  '<[^>]+>', ' ', 'g') AS t FROM s3),
      |s5 AS (SELECT doc_id, regexp_replace(regexp_replace(
      |  regexp_replace(t, '&lt;', '<', 'g'), '&gt;', '>', 'g'),
      |  '&quot;', '"', 'g') AS t FROM s4),
      |s6 AS (SELECT doc_id, regexp_replace(regexp_replace(
      |  regexp_replace(t, '&#39;', CHR(39), 'g'), '&nbsp;', ' ', 'g'),
      |  '&amp;', '&', 'g') AS t FROM s5),
      |s AS (SELECT doc_id,
      |  trim(regexp_replace(t, '\s+', ' ', 'g')) AS stripped FROM s6)
      |SELECT doc_id, CAST(length(stripped) AS INT) AS len,
      |  substring(stripped, 1, 60) AS head60
      |FROM s ORDER BY doc_id""".stripMargin

  /** A/B readout ([[graft.ops.Analytics.abTest]]): users split into
    * deterministic arms by id parity, per-event-type Welch z on the
    * value metric — exact decimal moments, one aggregation pass, the
    * identical arithmetic mirrored in DuckDB. */
  val abTestQ: Q = (spark, dir) =>
    graft.ops.Analytics.abTest(
        t(spark, dir, "events")
          // null user_ids have no arm — excluded on BOTH engines (a
          // null otherwise()-arm here vs CASE-no-match there would
          // diverge the moment a data refresh introduces nulls)
          .filter(col("user_id").isNotNull)
          .withColumn("arm",
            when(col("user_id") % 2 === 0, "control")
              .otherwise("treatment")),
        "event_type", "arm", "value", "control", "treatment")
      .select(col("event_type"), col("n_a"), col("n_b"),
        round(col("mean_a"), 6).as("mean_a"),
        round(col("mean_b"), 6).as("mean_b"),
        round(col("diff"), 6).as("diff"),
        round(col("z"), 6).as("z"))
      .orderBy("event_type")

  val abTestSql: String = {
    def sx(arm: String) =
      s"sum(CASE WHEN user_id % 2 = ${if (arm == "a") 0 else 1} " +
        s"THEN CAST(${sqlIscale("value", 4)} AS DECIMAL(38,0)) " +
        "ELSE CAST(0 AS DECIMAL(38,0)) END)"
    def sxx(arm: String) =
      s"sum(CASE WHEN user_id % 2 = ${if (arm == "a") 0 else 1} " +
        s"THEN CAST(${sqlIscale("value", 4)} AS DECIMAL(18,0)) * " +
        s"CAST(${sqlIscale("value", 4)} AS DECIMAL(18,0)) " +
        "ELSE CAST(0 AS DECIMAL(36,0)) END)"
    def n(arm: String) =
      s"sum(CASE WHEN user_id % 2 = ${if (arm == "a") 0 else 1} " +
        "THEN 1 ELSE 0 END)"
    s"""WITH agg AS (
       |  SELECT event_type,
       |    CAST(${n("a")} AS BIGINT) AS n_a,
       |    CAST(${n("b")} AS BIGINT) AS n_b,
       |    ${sx("a")} AS sx_a, ${sxx("a")} AS sxx_a,
       |    ${sx("b")} AS sx_b, ${sxx("b")} AS sxx_b
       |  FROM events
       |  WHERE value IS NOT NULL AND user_id IS NOT NULL
       |  GROUP BY event_type),
       |m AS (
       |  SELECT event_type, n_a, n_b,
       |    CASE WHEN n_a >= 1
       |      THEN (CAST(sx_a AS DOUBLE) / n_a) / 10000.0 END AS mean_a,
       |    CASE WHEN n_b >= 1
       |      THEN (CAST(sx_b AS DOUBLE) / n_b) / 10000.0 END AS mean_b,
       |    (CAST(n_a * sxx_a - sx_a * sx_a AS DOUBLE) /
       |      (CAST(n_a AS DOUBLE) * CAST(n_a - 1 AS DOUBLE))) / 1e8 AS v_a,
       |    (CAST(n_b * sxx_b - sx_b * sx_b AS DOUBLE) /
       |      (CAST(n_b AS DOUBLE) * CAST(n_b - 1 AS DOUBLE))) / 1e8 AS v_b
       |  FROM agg)
       |SELECT event_type, n_a, n_b,
       |  round(mean_a, 6) AS mean_a, round(mean_b, 6) AS mean_b,
       |  round(mean_b - mean_a, 6) AS diff,
       |  CASE WHEN n_a >= 2 AND n_b >= 2 THEN
       |    round((mean_b - mean_a) / sqrt(v_a / n_a + v_b / n_b), 6)
       |  END AS z
       |FROM m ORDER BY event_type""".stripMargin
  }

  /** Market-basket lift over per-user event-type sets: for every type
    * pair, observed co-occurrence vs independence —
    * lift = P(a,b) / (P(a)·P(b)) with user-level probabilities. The
    * cross-sell / journey-affinity signal. One distinct pass, one
    * self-join keyed on user (each user carries ≤ |types| rows), and
    * broadcast totals; exact integer counts through one double ratio,
    * so the oracle hash-matches. */
  val itemLiftQ: Q = (spark, dir) => {
    // null user_ids carry no basket — excluded on BOTH engines (Spark
    // would count a (null, type) distinct row in c_a/n_users while
    // DuckDB's count(DISTINCT)/equi-join drop nulls; same guard as
    // abTestQ so a data refresh with nulls cannot diverge the oracle)
    val u = t(spark, dir, "events")
      .filter(col("user_id").isNotNull)
      .select(col("user_id"), col("event_type")).distinct()
    val totals = u.select(col("user_id")).distinct()
      .agg(count(lit(1)).as("n_users"))
    val typeCounts = u.groupBy(col("event_type"))
      .agg(count(lit(1)).as("cnt"))
    val pairs = u.select(col("user_id"), col("event_type").as("a"))
      .join(u.select(col("user_id"), col("event_type").as("b")),
        Seq("user_id"))
      .filter(col("a") < col("b"))
      .groupBy(col("a"), col("b")).agg(count(lit(1)).as("c_ab"))
    pairs
      .join(typeCounts.select(col("event_type").as("a"),
        col("cnt").as("c_a")), Seq("a"))
      .join(typeCounts.select(col("event_type").as("b"),
        col("cnt").as("c_b")), Seq("b"))
      .crossJoin(broadcast(totals))
      .select(col("a"), col("b"), col("c_ab"),
        round((col("c_ab").cast("double") * col("n_users")) /
          (col("c_a").cast("double") * col("c_b")), 6).as("lift"))
      .orderBy("a", "b")
  }

  val itemLiftSql: String =
    """WITH u AS (SELECT DISTINCT user_id, event_type FROM events
      |       WHERE user_id IS NOT NULL),
      |t AS (SELECT event_type, count(*) AS cnt FROM u GROUP BY 1),
      |n AS (SELECT count(DISTINCT user_id) AS n_users FROM u),
      |p AS (
      |  SELECT ua.event_type AS a, ub.event_type AS b, count(*) AS c_ab
      |  FROM u ua JOIN u ub ON ua.user_id = ub.user_id
      |   AND ua.event_type < ub.event_type
      |  GROUP BY 1, 2)
      |SELECT p.a, p.b, p.c_ab,
      |  round((CAST(p.c_ab AS DOUBLE) * n.n_users) /
      |    (CAST(ta.cnt AS DOUBLE) * tb.cnt), 6) AS lift
      |FROM p JOIN t ta ON p.a = ta.event_type
      |       JOIN t tb ON p.b = tb.event_type
      |CROSS JOIN n ORDER BY a, b""".stripMargin

  /** Theta-sketch audience set algebra
    * ([[graft.functions.ThetaSketch]]): per-event-type user sketches
    * built independently, then INTERSECTED and DIFFERENCED — the
    * overlap question HLL cannot answer. Theta is exact below its
    * nominal entries (4096), so at this scale the estimates
    * hash-match the exact SQL oracle; at corpus scale the same plan
    * degrades to ±2% instead of failing. */
  val thetaSetsQ: Q = (spark, dir) => {
    import graft.functions.ThetaSketch._
    // thetaAgg skips nulls; the oracle's count(*)-over-DISTINCT would
    // count a NULL row — guard both engines (mirrors abTestQ/itemLiftQ)
    val sk = t(spark, dir, "events")
      .filter(col("user_id").isNotNull)
      .groupBy(col("event_type"))
      .agg(thetaAgg(col("user_id")).as("sk"))
    val a = sk.filter(col("event_type") === "click")
      .select(col("sk").as("a"))
    val b = sk.filter(col("event_type") === "purchase")
      .select(col("sk").as("b"))
    a.crossJoin(b).select(
      thetaEstimate(col("a")).as("n_click"),
      thetaEstimate(col("b")).as("n_purchase"),
      thetaEstimate(thetaIntersect(col("a"), col("b"))).as("n_both"),
      thetaEstimate(thetaDiff(col("a"), col("b"))).as("n_click_only"))
  }

  val thetaSetsSql: String =
    """WITH c AS (SELECT DISTINCT user_id FROM events
      |           WHERE event_type = 'click' AND user_id IS NOT NULL),
      |p AS (SELECT DISTINCT user_id FROM events
      |      WHERE event_type = 'purchase' AND user_id IS NOT NULL)
      |SELECT CAST((SELECT count(*) FROM c) AS DOUBLE) AS n_click,
      |  CAST((SELECT count(*) FROM p) AS DOUBLE) AS n_purchase,
      |  CAST((SELECT count(*) FROM c JOIN p USING (user_id)) AS DOUBLE)
      |    AS n_both,
      |  CAST((SELECT count(*) FROM c WHERE user_id NOT IN
      |    (SELECT user_id FROM p)) AS DOUBLE) AS n_click_only""".stripMargin

  /** BM25 ranked retrieval for a fixed query over the document corpus
    * — sparse-retrieval complement of the dense cosine/ANN family. */
  val bm25Q: Q = (spark, dir) =>
    TextAnalysis.bm25(t(spark, dir, "documents"), "doc_id", "text",
        Seq("join", "vector", "stream"))
      .orderBy(desc("bm25"), asc("doc_id"))
      .limit(20)
      .select("doc_id", "bm25", "n_terms_hit")

  /** Mirrors [[graft.ops.TextAnalysis.bm25]] op-for-op: every float
    * expression parenthesized identically (same IEEE evaluation
    * order), constants spelled as the same arithmetic (1.2 + 1.0, not
    * 2.2 — the sums differ in the last ulp). */
  val bm25Sql: String =
    """WITH toks AS (
      |  SELECT doc_id,
      |    unnest(string_split_regex(trim(lower(text)), '\s+')) AS term,
      |    len(string_split_regex(trim(lower(text)), '\s+')) AS dl
      |  FROM documents),
      |tf AS (
      |  SELECT doc_id, term, count(*) AS tf, max(dl) AS dl FROM toks
      |  WHERE term IN ('join', 'vector', 'stream') GROUP BY doc_id, term),
      |dfq AS (SELECT term, count(*) AS dfd FROM tf GROUP BY term),
      |corpus AS (
      |  SELECT count(*) AS n,
      |    sum(len(string_split_regex(trim(lower(text)), '\s+'))) AS totlen
      |  FROM documents)
      |SELECT doc_id,
      |  round(sum(
      |    ln(1.0 + (n - dfd + 0.5) / (dfd + 0.5)) * tf * (1.2 + 1.0) /
      |      (tf + 1.2 * (0.25 + 0.75 * dl / (CAST(totlen AS DOUBLE) / n)))
      |  ), 6) AS bm25,
      |  count(*) AS n_terms_hit
      |FROM tf JOIN dfq USING (term), corpus
      |GROUP BY doc_id
      |ORDER BY bm25 DESC, doc_id LIMIT 20""".stripMargin

  /** Contiguous 0..n-1 global row numbering, distributed (no global
    * single-reducer sort — see [[graft.ops.Indexing.globalIndex]]). */
  val globalIndexQ: Q = (spark, dir) =>
    graft.ops.Indexing.globalIndex(
        t(spark, dir, "events").select("event_id", "user_id"),
        "event_id", "row_idx")
      .select("event_id", "user_id", "row_idx")
      .orderBy("event_id")

  val globalIndexSql: String =
    """SELECT event_id, user_id,
      |  CAST(row_number() OVER (ORDER BY event_id) - 1 AS BIGINT) AS row_idx
      |FROM events ORDER BY event_id""".stripMargin

  /** Incremental aggregate maintenance: state built from pre-1996
    * orders, the 1996+ batch folded in — the oracle recomputes from
    * the full table, proving fold == recompute. */
  val incrementalAggQ: Q = (spark, dir) => {
    import graft.ops.IncrementalAgg
    val orders = t(spark, dir, "orders")
    val cut = lit("1996-01-01").cast("timestamp")
    val state = IncrementalAgg.partials(
      orders.filter(col("o_orderdate") < cut), Seq("o_custkey"), "o_totalprice")
    val merged = IncrementalAgg.merge(
      state,
      IncrementalAgg.partials(
        orders.filter(col("o_orderdate") >= cut), Seq("o_custkey"), "o_totalprice"),
      Seq("o_custkey"))
    merged.select(col("o_custkey"), col("cnt"),
        col("sum").cast("double").as("total"),
        col("min"), col("max"),
        round(col("sum").cast("double") / col("cnt"), 6).as("avg_price"))
      .orderBy("o_custkey")
  }

  val incrementalAggSql: String =
    """SELECT o_custkey, count(*) AS cnt,
      |  CAST(sum(CAST(o_totalprice AS DECIMAL(28,6))) AS DOUBLE) AS total,
      |  min(o_totalprice) AS min, max(o_totalprice) AS max,
      |  round(CAST(sum(CAST(o_totalprice AS DECIMAL(28,6))) AS DOUBLE)
      |    / count(*), 6) AS avg_price
      |FROM orders GROUP BY o_custkey ORDER BY o_custkey""".stripMargin

  /** Per-day value percentiles through the sketch aggregate's
    * streaming-state path, batch twin (stream==batch pinned in
    * StreamingOpsSpec). k=8192 >> any day's row count through sf1, so
    * the sketch is in its EXACT regime and percentile_disc is a true
    * oracle (ceil(p·n) rank rule verified identical). */
  val windowQuantileBatch: Q = (spark, dir) =>
    graft.streaming.StreamingOps.windowQuantiles(
        t(spark, dir, "events").select("ts", "event_type", "value"),
        "ts", "event_type", "value", "1 day", sketchK = 8192)
      .select(date_format(col("window_start"), "yyyy-MM-dd").as("window_day"),
        col("event_type"), col("n"),
        round(col("p50"), 6).as("p50"),
        round(col("p90"), 6).as("p90"),
        round(col("p99"), 6).as("p99"))
      .orderBy("window_day", "event_type")

  val windowQuantileBatchSql: String =
    """SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS window_day,
      |  event_type, count(value) AS n,
      |  round(percentile_disc(0.5) WITHIN GROUP (ORDER BY value), 6) AS p50,
      |  round(percentile_disc(0.9) WITHIN GROUP (ORDER BY value), 6) AS p90,
      |  round(percentile_disc(0.99) WITHIN GROUP (ORDER BY value), 6) AS p99
      |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  /** Persisted-state refresh — the load-boundary lifecycle every
    * "persistable index" in this engine gestures at, done end-to-end:
    * bootstrap state from history-so-far and WRITE it through storage;
    * later, RELOAD the stored state (the raw pre-cut history is never
    * rescanned), fold the next increment with [[graft.ops.IncrementalAgg]],
    * persist the new snapshot; answer the final question from stored
    * state + the newest increment only. The oracle recomputes from the
    * FULL history — fold-of-snapshots == recompute, exactly (decimal
    * partials are partition-order independent, so even the hash
    * matches). At 100 TB the two `write`s are the point: each refresh
    * touches |state| + |batch|, never the archive. */
  val stateRefreshQ: Q = (spark, dir) => {
    import graft.ops.IncrementalAgg
    val st = new BasicStorage(spark)
    val orders = t(spark, dir, "orders")
    val cut1 = lit("1995-01-01").cast("timestamp")
    val cut2 = lit("1996-01-01").cast("timestamp")
    val base = java.nio.file.Files
      .createTempDirectory("graft_state_q").toString
    val (v1, v2) = (base + "/state_v1", base + "/state_v2")
    // epoch 1: bootstrap from the initial history, persist snapshot v1
    st.write(IncrementalAgg.partials(
        orders.filter(col("o_orderdate") < cut1),
        Seq("o_custkey"), "o_totalprice"),
      v1, "parquet", "overwrite")
    // epoch 2: reload v1 (NOT the raw history), fold 1995, persist v2
    st.write(IncrementalAgg.merge(
        st.read(v1, "parquet"),
        IncrementalAgg.partials(
          orders.filter(col("o_orderdate") >= cut1 &&
            col("o_orderdate") < cut2),
          Seq("o_custkey"), "o_totalprice"),
        Seq("o_custkey")),
      v2, "parquet", "overwrite")
    // epoch 3: answer from stored v2 + the newest increment
    val merged = IncrementalAgg.merge(
      st.read(v2, "parquet"),
      IncrementalAgg.partials(
        orders.filter(col("o_orderdate") >= cut2),
        Seq("o_custkey"), "o_totalprice"),
      Seq("o_custkey"))
    merged.select(col("o_custkey"), col("cnt"),
        col("sum").cast("double").as("total"),
        col("min"), col("max"),
        round(col("sum").cast("double") / col("cnt"), 6).as("avg_price"))
      .orderBy("o_custkey")
  }

  /** The oracle is the FULL-history re-aggregation — the exact result
    * the three-epoch snapshot fold must reproduce. */
  val stateRefreshSql: String =
    """SELECT o_custkey, count(*) AS cnt,
      |  CAST(sum(CAST(o_totalprice AS DECIMAL(28,6))) AS DOUBLE) AS total,
      |  min(o_totalprice) AS min, max(o_totalprice) AS max,
      |  round(CAST(sum(CAST(o_totalprice AS DECIMAL(28,6))) AS DOUBLE)
      |    / count(*), 6) AS avg_price
      |FROM orders GROUP BY o_custkey ORDER BY o_custkey""".stripMargin

  /** CDF-DRIVEN MATERIALIZED VIEW ([[graft.storage.MatView]]): the
    * incremental-maintenance lifecycle `q_state_refresh` gestures at,
    * completed — the view refreshes from the table's OWN change feed
    * under arbitrary captured DML, never from caller-handed batches.
    * The full lifecycle runs IN-QUERY with its modes asserted (a
    * regression to silent full recompute fails the oracle gate, not
    * just a unit test): create (rebuild) → captured merge → refresh
    * must take the INCREMENTAL path → captured delete that removes
    * group minima → refresh must stay incremental AND rescan at least
    * one poisoned group (min is not invertible under deletes — the
    * rescan is the correct, group-scoped recovery). The oracle
    * recomputes the aggregate from the final table: fold == recompute
    * exactly (decimal partials, hash-matchable). At 100 TB each
    * refresh touches |changes| + |poisoned groups|, never the fact
    * table. */
  /** MAINTENANCE LAG (§2.11 indexing/state;
    * [[graft.streaming.StreamingOps.lag]]): the operational
    * how-far-behind-am-I surface over a maintained replica AND a
    * maintained matview. The in-query requires pin the MID-CYCLE
    * state (one committed batch pending on both, plus one pending op
    * on the view) — the nondeterministic age column is dropped; the
    * oracle checks the deterministic post-drain contract: both
    * targets fully applied, zero pending, up to date. */
  val maintenanceLagQ: Q = (spark, dir) => {
    import graft.storage.MatView
    import graft.streaming.StreamingOps
    val st = new BasicStorage(spark)
    val orders = t(spark, dir, "orders")
      .select("o_orderkey", "o_custkey", "o_totalprice")
      .filter(col("o_orderkey") % 5 =!= 0)
    val root = java.nio.file.Files
      .createTempDirectory("graft_lag_q").toString
    val (path, rep, view) = (root + "/t", root + "/rep", root + "/v")
    st.write(orders, path, "delta", "overwrite")
    st.write(orders, rep, "delta", "overwrite")
    MatView.create(spark, st, path, view, Seq("o_custkey"), "o_totalprice")
    // seed the feed era, then drain both maintenance streams
    st.merge(orders.limit(50).withColumn("o_totalprice", lit(1.0)),
      path, "full.o_orderkey = incremental.o_orderkey",
      captureChanges = true)
    val q1 = StreamingOps.replicateStream(spark, st, path, rep,
      keyCols = Seq("o_orderkey"), checkpoint = root + "/cp_rep")
    val q2 = StreamingOps.maintainMatView(spark, st, view, root + "/cp_mv")
    try { q1.processAllAvailable(); q2.processAllAvailable() }
    finally { q1.stop(); q2.stop() }
    // streams STOPPED: the mid-cycle probe is deterministic (a live
    // file-triggered stream could drain the merge before the probe)
    st.merge(orders.limit(20).withColumn("o_totalprice", lit(2.0)),
      path, "full.o_orderkey = incremental.o_orderkey",
      captureChanges = true)
    val midR = StreamingOps.lag(spark, rep).head()
    val midV = StreamingOps.lag(spark, view).head()
    require(midR.getAs[Long]("pending_batches") == 1L &&
      !midR.getAs[Boolean]("up_to_date"),
      s"undrained replica must lag: $midR")
    require(midV.getAs[Long]("pending_batches") == 1L &&
      midV.getAs[Long]("pending_ops") == 1L &&
      !midV.getAs[Boolean]("up_to_date"),
      s"undrained matview must lag: $midV")
    // restart on the SAME checkpoints (recovery is idempotent), drain
    val q1b = StreamingOps.replicateStream(spark, st, path, rep,
      keyCols = Seq("o_orderkey"), checkpoint = root + "/cp_rep")
    val q2b = StreamingOps.maintainMatView(spark, st, view, root + "/cp_mv")
    try { q1b.processAllAvailable(); q2b.processAllAvailable() }
    finally { q1b.stop(); q2b.stop() }
    StreamingOps.lag(spark, rep)
      .unionByName(StreamingOps.lag(spark, view))
      .select(col("kind"), col("pending_batches"), col("pending_ops"),
        (col("applied_batch") === col("source_max_committed"))
          .as("applied_is_max"), col("up_to_date"))
      .orderBy("kind")
  }

  val maintenanceLagSql: String =
    """SELECT 'matview' AS kind, CAST(0 AS BIGINT) AS pending_batches,
      |       CAST(0 AS BIGINT) AS pending_ops,
      |       true AS applied_is_max, true AS up_to_date
      |UNION ALL
      |SELECT 'replica', CAST(0 AS BIGINT), CAST(0 AS BIGINT), true, true
      |ORDER BY kind""".stripMargin

  val matviewQ: Q = (spark, dir) => {
    import graft.storage.MatView
    val st = new BasicStorage(spark)
    val orders = t(spark, dir, "orders")
      .select("o_orderkey", "o_custkey", "o_totalprice")
    val base = orders.filter(col("o_orderkey") % 5 =!= 0)
    val root = java.nio.file.Files
      .createTempDirectory("graft_matview_q").toString
    val (path, view) = (root + "/t", root + "/v")
    st.write(base, path, "delta", "overwrite")
    val r0 = MatView.create(spark, st, path, view,
      Seq("o_custkey"), "o_totalprice")
    require(r0.mode == "rebuild", s"create must rebuild, took ${r0.mode}")
    // captured merge: price bump on %3 keys (updates + inserts)
    st.merge(orders.filter(col("o_orderkey") % 3 === 0)
        .withColumn("o_totalprice", col("o_totalprice") + 1000.0),
      path, "full.o_orderkey = incremental.o_orderkey",
      captureChanges = true)
    val r1 = MatView.refresh(spark, st, view)
    require(r1.mode == "incremental" && r1.batchesApplied == 1,
      s"the captured merge must fold incrementally, got $r1")
    // captured delete of every sub-10k order: each affected group
    // loses its minimum, so the refresh must rescan those groups
    graft.storage.Delete.where(spark, st, path,
      "o_totalprice < 10000", captureChanges = true)
    val r2 = MatView.refresh(spark, st, view)
    require(r2.mode == "incremental" && r2.batchesApplied == 1,
      s"the captured delete must fold incrementally, got $r2")
    require(r2.groupsRescanned > 0,
      "deleting group minima must rescan the poisoned groups")
    MatView.read(spark, view)
      .select(col("o_custkey"), col("cnt"),
        col("sum").cast("double").as("total"),
        col("min"), col("max"),
        round(col("sum").cast("double") / col("cnt"), 6).as("avg_price"))
      .orderBy("o_custkey")
  }

  /** The oracle replays the same DML in SQL and recomputes the
    * aggregate from the final table — exactly what the incremental
    * view must equal. */
  val matviewSql: String =
    """WITH base AS (
      |  SELECT o_orderkey, o_custkey, o_totalprice FROM orders
      |  WHERE o_orderkey % 5 != 0),
      |i AS (SELECT o_orderkey, o_custkey, o_totalprice + 1000.0 AS o_totalprice
      |      FROM orders WHERE o_orderkey % 3 = 0),
      |m AS (SELECT coalesce(i.o_orderkey, base.o_orderkey) AS o_orderkey,
      |             coalesce(i.o_custkey, base.o_custkey) AS o_custkey,
      |             coalesce(i.o_totalprice, base.o_totalprice) AS o_totalprice
      |      FROM base FULL OUTER JOIN i ON base.o_orderkey = i.o_orderkey),
      |f AS (SELECT * FROM m WHERE NOT (o_totalprice < 10000))
      |SELECT o_custkey, count(*) AS cnt,
      |  CAST(sum(CAST(o_totalprice AS DECIMAL(28,6))) AS DOUBLE) AS total,
      |  min(o_totalprice) AS min, max(o_totalprice) AS max,
      |  round(CAST(sum(CAST(o_totalprice AS DECIMAL(28,6))) AS DOUBLE)
      |    / count(*), 6) AS avg_price
      |FROM f GROUP BY o_custkey ORDER BY o_custkey""".stripMargin

  /** MULTI-METRIC, NO-MIN/MAX materialized view ([[graft.storage
    * .MatView.createMulti]]): two value columns share one feed read
    * and one state swap per refresh — N metrics over the same keys
    * cost one refresh, not N — and `withMinMax = false` keeps only
    * the abelian partials (cnt, nncnt, sum), so deletes fold exactly
    * and the refresh NEVER attaches the fact table (no rescan branch
    * exists; MatViewSpec proves it by hiding the source's data
    * files). The query pins the sharpest contrast with `q_matview`
    * into the oracle gate: the SAME sub-10k delete that poisons
    * groups there must fold here with groupsRescanned == 0. At
    * 100 TB this is the strictly-cheaper mode for sum/count/avg
    * rollups that don't need extremes — refresh cost is |changes|,
    * with no poisoned-group tail under ANY delete pattern. */
  val matviewMultiQ: Q = (spark, dir) => {
    import graft.storage.MatView
    val st = new BasicStorage(spark)
    val orders = t(spark, dir, "orders")
      .select("o_orderkey", "o_custkey", "o_totalprice")
    val base = orders.filter(col("o_orderkey") % 5 =!= 0)
    val root = java.nio.file.Files
      .createTempDirectory("graft_matview_multi_q").toString
    val (path, view) = (root + "/t", root + "/v")
    st.write(base, path, "delta", "overwrite")
    val r0 = MatView.createMulti(spark, st, path, view,
      Seq("o_custkey"), Seq("o_totalprice", "o_orderkey"),
      withMinMax = false)
    require(r0.mode == "rebuild", s"create must rebuild, took ${r0.mode}")
    st.merge(orders.filter(col("o_orderkey") % 3 === 0)
        .withColumn("o_totalprice", col("o_totalprice") + 1000.0),
      path, "full.o_orderkey = incremental.o_orderkey",
      captureChanges = true)
    graft.storage.Delete.where(spark, st, path,
      "o_totalprice < 10000", captureChanges = true)
    val r1 = MatView.refresh(spark, st, view)
    require(r1.mode == "incremental" && r1.batchesApplied == 2,
      s"both captured batches must fold incrementally, got $r1")
    require(r1.groupsRescanned == 0,
      "the abelian state must fold extreme-removing deletes with " +
        s"ZERO rescans, got $r1")
    MatView.read(spark, view)
      .select(col("o_custkey"), col("cnt"),
        col("nncnt_o_totalprice").as("n_price"),
        col("sum_o_totalprice").cast("double").as("total_price"),
        col("sum_o_orderkey").cast("double").as("total_key"),
        round(col("sum_o_totalprice").cast("double") / col("cnt"), 6)
          .as("avg_price"))
      .orderBy("o_custkey")
  }

  /** Same DML replayed in SQL, both metrics recomputed from the final
    * table — the fold must equal the recompute column-for-column. */
  val matviewMultiSql: String =
    """WITH base AS (
      |  SELECT o_orderkey, o_custkey, o_totalprice FROM orders
      |  WHERE o_orderkey % 5 != 0),
      |i AS (SELECT o_orderkey, o_custkey, o_totalprice + 1000.0 AS o_totalprice
      |      FROM orders WHERE o_orderkey % 3 = 0),
      |m AS (SELECT coalesce(i.o_orderkey, base.o_orderkey) AS o_orderkey,
      |             coalesce(i.o_custkey, base.o_custkey) AS o_custkey,
      |             coalesce(i.o_totalprice, base.o_totalprice) AS o_totalprice
      |      FROM base FULL OUTER JOIN i ON base.o_orderkey = i.o_orderkey),
      |f AS (SELECT * FROM m WHERE NOT (o_totalprice < 10000))
      |SELECT o_custkey, count(*) AS cnt,
      |  count(CAST(o_totalprice AS DECIMAL(28,6))) AS n_price,
      |  CAST(sum(CAST(o_totalprice AS DECIMAL(28,6))) AS DOUBLE) AS total_price,
      |  CAST(sum(CAST(o_orderkey AS DECIMAL(28,6))) AS DOUBLE) AS total_key,
      |  round(CAST(sum(CAST(o_totalprice AS DECIMAL(28,6))) AS DOUBLE)
      |    / count(*), 6) AS avg_price
      |FROM f GROUP BY o_custkey ORDER BY o_custkey""".stripMargin

  /** OP-LOG COMPACTION ([[graft.storage.Maintenance.compactLog]]):
    * every mutation appends a one-row parquet file to the op log, and
    * every metadata read (Txn.snapshot, travel horizons, txn
    * watermarks, DESCRIBE) lists and opens ALL of them — thousands of
    * file opens per metadata operation after years of mutations at
    * 100 TB. Compaction collapses the log to ONE file, content and
    * ordering unchanged, under the commit lock. The query pins the
    * whole contract into the oracle gate: one file at rest, every
    * history row preserved, time travel still reconstructing the
    * pre-mutation snapshot ACROSS the compaction, and a post-compact
    * captured merge proving the table keeps mutating. */
  val logCompactQ: Q = (spark, dir) => {
    import graft.storage.{GraftLog, Maintenance}
    val st = new BasicStorage(spark)
    val orders = t(spark, dir, "orders")
      .select("o_orderkey", "o_custkey", "o_totalprice")
    val base = orders.filter(col("o_orderkey") % 5 =!= 0)
    val path = java.nio.file.Files
      .createTempDirectory("graft_logc_q").toString + "/t"
    st.write(base, path, "delta", "overwrite")
    st.merge(orders.filter(col("o_orderkey") % 3 === 0)
        .withColumn("o_totalprice", col("o_totalprice") + 1000.0),
      path, "full.o_orderkey = incremental.o_orderkey",
      captureChanges = true)
    graft.storage.Delete.where(spark, st, path,
      "o_totalprice < 10000", captureChanges = true)
    val histBefore = GraftLog.history(spark, path).count()
    require(Maintenance.compactLog(spark, path) >= 3,
      "three mutations must have left at least three log files")
    require(graft.storage.Fs.listFiles(spark, GraftLog.logPath(path))
        .count(f => !f.startsWith("_") && !f.startsWith(".")) == 1,
      "the compacted log must rest at ONE file")
    require(GraftLog.history(spark, path).count() == histBefore + 1,
      "compaction must preserve every row and add only its own record")
    require(graft.storage.Merge.readAsOf(spark, st, path,
        Seq("o_orderkey"), Long.MinValue).count() == base.count(),
      "time travel must still serve across the compacted log")
    // the table keeps mutating: status-quo merge on %7 keys
    st.merge(orders.filter(col("o_orderkey") % 7 === 0)
        .withColumn("o_totalprice", col("o_totalprice") + 500.0),
      path, "full.o_orderkey = incremental.o_orderkey",
      captureChanges = true)
    st.read(path, "delta")
      .select(col("o_orderkey"), col("o_custkey"),
        col("o_totalprice").as("price"))
      .orderBy("o_orderkey")
  }

  val logCompactSql: String =
    """WITH base AS (
      |  SELECT o_orderkey, o_custkey, o_totalprice FROM orders
      |  WHERE o_orderkey % 5 != 0),
      |i1 AS (SELECT o_orderkey, o_custkey, o_totalprice + 1000.0 AS o_totalprice
      |       FROM orders WHERE o_orderkey % 3 = 0),
      |m1 AS (SELECT coalesce(i1.o_orderkey, base.o_orderkey) AS o_orderkey,
      |              coalesce(i1.o_custkey, base.o_custkey) AS o_custkey,
      |              coalesce(i1.o_totalprice, base.o_totalprice) AS o_totalprice
      |       FROM base FULL OUTER JOIN i1 ON base.o_orderkey = i1.o_orderkey),
      |f AS (SELECT * FROM m1 WHERE NOT (o_totalprice < 10000)),
      |i2 AS (SELECT o_orderkey, o_custkey, o_totalprice + 500.0 AS o_totalprice
      |       FROM orders WHERE o_orderkey % 7 = 0)
      |SELECT coalesce(i2.o_orderkey, f.o_orderkey) AS o_orderkey,
      |       coalesce(i2.o_custkey, f.o_custkey) AS o_custkey,
      |       coalesce(i2.o_totalprice, f.o_totalprice) AS price
      |FROM f FULL OUTER JOIN i2 ON f.o_orderkey = i2.o_orderkey
      |ORDER BY 1""".stripMargin

  /** Multi-query BM25 over a literal query table — three queries, one
    * with zero hits (emits no rows on both engines); top-10 per query
    * through the bounded aggregate (window-free; pinned in
    * PlanShapeSpec). */
  val bm25MultiQ: Q = (spark, dir) => {
    import spark.implicits._
    val queries = Seq(
      ("q_spark", Seq("join", "vector", "stream")),
      ("q_quality", Seq("data", "quality")),
      ("q_nohit", Seq("zzz_unseen_term"))).toDF("query_id", "terms")
    TextAnalysis.bm25Multi(t(spark, dir, "documents"), "doc_id", "text",
        queries, "query_id", "terms", topK = 10)
      .orderBy("query_id", "rank")
  }

  val bm25MultiSql: String =
    """WITH queries(query_id, term) AS (VALUES
      |    ('q_spark', 'join'), ('q_spark', 'vector'), ('q_spark', 'stream'),
      |    ('q_quality', 'data'), ('q_quality', 'quality'),
      |    ('q_nohit', 'zzz_unseen_term')),
      |toks AS (
      |  SELECT doc_id,
      |    unnest(string_split_regex(trim(lower(text)), '\s+')) AS term,
      |    len(string_split_regex(trim(lower(text)), '\s+')) AS dl
      |  FROM documents),
      |tf AS (
      |  SELECT doc_id, term, count(*) AS tf, max(dl) AS dl FROM toks
      |  WHERE term IN (SELECT term FROM queries) GROUP BY doc_id, term),
      |dfq AS (SELECT term, count(*) AS dfd FROM tf GROUP BY term),
      |corpus AS (
      |  SELECT count(*) AS n,
      |    sum(len(string_split_regex(trim(lower(text)), '\s+'))) AS totlen
      |  FROM documents),
      |perdoc AS (
      |  SELECT q.query_id, t.doc_id,
      |    round(sum(
      |      ln(1.0 + (n - dfd + 0.5) / (dfd + 0.5)) * tf * (1.2 + 1.0) /
      |        (tf + 1.2 * (0.25 + 0.75 * dl / (CAST(totlen AS DOUBLE) / n)))
      |    ), 6) AS bm25,
      |    count(*) AS n_terms_hit
      |  FROM tf t JOIN dfq USING (term) JOIN queries q USING (term), corpus
      |  GROUP BY q.query_id, t.doc_id)
      |SELECT query_id, CAST(rnk AS INT) AS rank, doc_id, bm25, n_terms_hit
      |FROM (SELECT *, row_number() OVER (
      |        PARTITION BY query_id ORDER BY bm25 DESC, doc_id) AS rnk
      |      FROM perdoc)
      |WHERE rnk <= 10
      |ORDER BY query_id, rank""".stripMargin

  // ---------------- §2.11 round-7: sketch-recount / index / graph / kmeans

  /** EXACT corpus heavy hitters (terms ≥ 2% of all tokens) via the
    * two-pass Misra-Gries sketch → broadcast-candidates → filtered
    * recount (TextAnalysis.heavyHitterTerms). The answer is provably
    * the full groupBy answer (minFrac 0.02 ≫ the m=512 sketch bound
    * 1/513) but the shuffle never carries the vocabulary — the oracle
    * below IS the naive full groupBy, which is the point. */
  val heavyHittersQ: Q = (spark, dir) =>
    TextAnalysis.heavyHitterTerms(t(spark, dir, "documents"), "text",
        minFrac = 0.02, m = 512)
      .orderBy(col("cnt").desc, col("term"))

  val heavyHittersSql: String =
    """WITH toks AS (
      |  SELECT unnest(string_split_regex(trim(lower(text)), '\s+')) AS term
      |  FROM documents),
      |tot AS (SELECT count(*) AS n FROM toks)
      |SELECT term, count(*) AS cnt FROM toks, tot GROUP BY term, n
      |HAVING CAST(count(*) AS HUGEINT) * 1000000000
      |  >= CAST(n AS HUGEINT) * 20000000
      |ORDER BY cnt DESC, term""".stripMargin

  /** Inverted index with bounded postings: per term, document
    * frequency + the 20 smallest doc ids (TextAnalysis.invertedIndex —
    * BoundedTopKAgg postings, so stopword terms never materialize full
    * lists). Postings joined to a string for unambiguous compare. */
  val invertedIndexQ: Q = (spark, dir) =>
    TextAnalysis.invertedIndex(t(spark, dir, "documents"),
        "doc_id", "text", maxPostings = 20)
      .select(col("term"), col("df_docs"),
        array_join(col("postings"), ",").as("postings"))
      .orderBy("term")

  val invertedIndexSql: String =
    """WITH toks AS (
      |  SELECT DISTINCT doc_id,
      |    unnest(string_split_regex(trim(lower(text)), '\s+')) AS term
      |  FROM documents)
      |SELECT term, count(*) AS df_docs,
      |  list_aggregate(
      |    list_transform(list_sort(list(doc_id))[1:20], x -> CAST(x AS VARCHAR)),
      |    'string_agg', ',') AS postings
      |FROM toks GROUP BY term ORDER BY term""".stripMargin

  /** Markov transition counts between consecutive event types per user
    * (Graph.transitionCounts): one window shuffle, (prev→curr) counts
    * partial-agg to |states|². */
  val transitionCountsQ: Q = (spark, dir) =>
    graft.ops.Graph.transitionCounts(t(spark, dir, "events"),
        "user_id", "ts", "event_id", "event_type")
      .orderBy("prev_state", "state")

  val transitionCountsSql: String =
    """WITH seq AS (
      |  SELECT user_id, event_type AS state,
      |    lag(event_type) OVER (
      |      PARTITION BY user_id ORDER BY ts, event_id) AS prev_state
      |  FROM events)
      |SELECT prev_state, state, count(*) AS cnt FROM seq
      |WHERE prev_state IS NOT NULL
      |GROUP BY prev_state, state ORDER BY prev_state, state""".stripMargin

  /** PageRank over the event-type transition graph, 5 power
    * iterations in scaled-integer arithmetic (Graph.pageRankScaled) —
    * deterministic to the bit, so the oracle is the identical unrolled
    * computation in SQL, hash-matched. */
  val pageRankQ: Q = (spark, dir) => {
    val edges = graft.ops.Graph.transitionCounts(t(spark, dir, "events"),
      "user_id", "ts", "event_id", "event_type")
    graft.ops.Graph.pageRankScaled(edges, "prev_state", "state", "cnt",
        iterations = 5)
      .orderBy("node")
  }

  val pageRankSql: String = {
    val iters = (1 to 5).map { i =>
      s"""c$i AS (
         |  SELECT dst,
         |    sum(CAST(floor(rank_scaled * p / 1000000) AS BIGINT)) AS inflow
         |  FROM r${i - 1} r JOIN prob ON r.node = prob.src GROUP BY dst),
         |r$i AS (
         |  SELECT b.node,
         |    CAST(floor(b.base * 15 / 100) AS BIGINT)
         |      + CAST(floor(85 * coalesce(c$i.inflow, 0) / 100) AS BIGINT)
         |      AS rank_scaled
         |  FROM base b LEFT JOIN c$i ON b.node = c$i.dst)""".stripMargin
    }.mkString(",\n")
    s"""WITH seq AS (
       |  SELECT user_id, event_type AS state,
       |    lag(event_type) OVER (
       |      PARTITION BY user_id ORDER BY ts, event_id) AS prev_state
       |  FROM events),
       |e AS (
       |  SELECT prev_state AS src, state AS dst, count(*) AS w FROM seq
       |  WHERE prev_state IS NOT NULL GROUP BY prev_state, state),
       |outw AS (SELECT src, sum(w) AS ow FROM e GROUP BY src),
       |prob AS (
       |  SELECT src, dst, CAST(floor(w * 1000000 / ow) AS BIGINT) AS p
       |  FROM e JOIN outw USING (src)),
       |nodes AS (SELECT src AS node FROM prob
       |          UNION SELECT dst AS node FROM prob),
       |nv AS (SELECT count(*) AS n FROM nodes),
       |base AS (
       |  SELECT node, CAST(floor(1000000000 / n) AS BIGINT) AS base
       |  FROM nodes, nv),
       |r0 AS (SELECT node, base AS rank_scaled FROM base),
       |$iters
       |SELECT node, rank_scaled,
       |  CAST(rank_scaled AS DOUBLE) / 1e9 AS rank
       |FROM r5 ORDER BY node""".stripMargin
  }

  /** K-means (k=8, 2 Lloyd iterations) over the embeddings in exact
    * scaled-integer arithmetic (Similarity.kmeansAssign) — the full
    * iterated clustering hash-matches the identical unrolled SQL. */
  val kmeansQ: Q = (spark, dir) =>
    Similarity.kmeansAssign(t(spark, dir, "embeddings"),
        "vec_id", "embedding", k = 8, iterations = 2)
      .orderBy("vec_id")

  val kmeansSql: String = {
    val steps = (0 until 2).map { t =>
      s"""s$t AS (
         |  SELECT id, vq, cluster,
         |    CAST(list_sum(list_transform(generate_series(1, len(vq)),
         |      i -> (vq[i] - cv[i]) * (vq[i] - cv[i]))) AS BIGINT) AS d2
         |  FROM base CROSS JOIN c$t),
         |a$t AS (
         |  SELECT id, vq, cluster, d2 FROM (
         |    SELECT *, row_number() OVER (
         |      PARTITION BY id ORDER BY d2, cluster) AS rn FROM s$t)
         |  WHERE rn = 1),
         |c${t + 1} AS (
         |  SELECT cluster, list(c ORDER BY pos) AS cv FROM (
         |    SELECT cluster, pos,
         |      CAST(floor(CAST(sum(v) AS DOUBLE) / count(*)) AS BIGINT) AS c
         |    FROM (SELECT cluster, unnest(vq) AS v,
         |            generate_subscripts(vq, 1) AS pos FROM a$t)
         |    GROUP BY cluster, pos)
         |  GROUP BY cluster)""".stripMargin
    }.mkString(",\n")
    s"""WITH base AS (
       |  SELECT vec_id AS id,
       |    list_transform(CAST(embedding AS DOUBLE[]),
       |      x -> CAST(floor(x * 1000000 + 0.5) AS BIGINT)) AS vq
       |  FROM embeddings),
       |c0 AS (
       |  SELECT CAST(row_number() OVER (ORDER BY id) - 1 AS INT) AS cluster,
       |    vq AS cv
       |  FROM base WHERE id < 8),
       |$steps,
       |fin AS (
       |  SELECT id, cluster, d2 FROM (
       |    SELECT id, cluster, d2, row_number() OVER (
       |      PARTITION BY id ORDER BY d2, cluster) AS rn
       |    FROM (SELECT id, cluster,
       |        CAST(list_sum(list_transform(generate_series(1, len(vq)),
       |          i -> (vq[i] - cv[i]) * (vq[i] - cv[i]))) AS BIGINT) AS d2
       |      FROM base CROSS JOIN c2))
       |  WHERE rn = 1)
       |SELECT id AS vec_id, cluster, d2 FROM fin ORDER BY vec_id""".stripMargin
  }

  /** Bounded-window EWMA over each user's value series
    * (TimeSeries.ewma, span 8, α 0.3): the unrolled weighted lag sum —
    * identical fold order both engines, rounded at 6. */
  val ewmaQ: Q = (spark, dir) =>
    graft.ops.TimeSeries.ewma(
        t(spark, dir, "events").filter(col("value").isNotNull),
        "user_id", Seq("ts", "event_id"), "value", alpha = 0.3, span = 8)
      .select(col("user_id"), col("event_id"), col("value"),
        round(col("value_ewma"), 6).as("value_ewma"))
      .orderBy("user_id", "event_id")

  val ewmaSql: String = {
    val terms = (0 until 8).map { j =>
      val wj = math.pow(1.0 - 0.3, j)
      val x = if (j == 0) "value" else s"lag(value, $j) OVER w"
      (s"(CASE WHEN $x IS NOT NULL THEN $x * $wj ELSE 0.0 END)",
        s"(CASE WHEN $x IS NOT NULL THEN CAST($wj AS DOUBLE) ELSE 0.0 END)")
    }
    s"""SELECT user_id, event_id, value,
       |  round((${terms.map(_._1).mkString(" + ")})
       |    / (${terms.map(_._2).mkString(" + ")}), 6) AS value_ewma
       |FROM events WHERE value IS NOT NULL
       |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
       |ORDER BY user_id, event_id""".stripMargin
  }

  /** BPE merge-candidate pair counts (TextAnalysis.bpePairCounts):
    * corpus → word-frequency table (one shuffle) → vocab-sized pair
    * arithmetic. The top pair is the next tokenizer merge. */
  val bpePairsQ: Q = (spark, dir) =>
    TextAnalysis.bpePairCounts(t(spark, dir, "documents"), "text")
      .orderBy(col("cnt").desc, col("pair"))

  val bpePairsSql: String =
    """WITH words AS (
      |  SELECT unnest(string_split_regex(trim(lower(text)), '\s+')) AS w
      |  FROM documents),
      |wf AS (
      |  SELECT w, count(*) AS wf FROM words WHERE length(w) >= 2 GROUP BY w),
      |pairs AS (
      |  SELECT substr(w, i, 2) AS pair, wf
      |  FROM (SELECT w, wf,
      |          unnest(generate_series(1, length(w) - 1)) AS i
      |        FROM wf))
      |SELECT pair, CAST(sum(wf) AS BIGINT) AS cnt FROM pairs
      |GROUP BY pair ORDER BY cnt DESC, pair""".stripMargin

  /** Deterministic 80/10/10 train/val/test split
    * (Sampling.datasetSplit): membership a pure hash of doc_id —
    * leakage-stable across runs/engines/layouts; summarized per split. */
  val datasetSplitQ: Q = (spark, dir) =>
    graft.ops.Sampling.datasetSplit(
        t(spark, dir, "documents"), "doc_id", pctTrain = 80, pctVal = 10)
      .groupBy(col("split"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("total_chars"))
      .orderBy("split")

  val datasetSplitSql: String =
    s"""SELECT CASE WHEN b < 80 THEN 'train'
       |            WHEN b < 90 THEN 'val'
       |            ELSE 'test' END AS split,
       |  count(*) AS n_docs, CAST(sum(n_chars) AS BIGINT) AS total_chars
       |FROM (SELECT n_chars,
       |        ((doc_id % ${graft.ops.Sampling.M31}) * ${graft.ops.Sampling.HashA}
       |          % 4294967296) % 100 AS b
       |      FROM documents)
       |GROUP BY split ORDER BY split""".stripMargin

  /** Temperature-scaled mixture sample (τ=2, 50% global budget —
    * Sampling.temperatureSample): small sources keep a larger share
    * than their natural proportion; per-source kept counts. */
  val temperatureSampleQ: Q = (spark, dir) =>
    graft.ops.Sampling.temperatureSample(
        t(spark, dir, "documents"), "source", "doc_id",
        budgetPerMille = 500, tau = 2.0)
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_kept"))
      .orderBy("source")

  val temperatureSampleSql: String =
    s"""WITH counts AS (
       |  SELECT source, count(*) AS c FROM documents GROUP BY source),
       |q AS (
       |  SELECT source, c,
       |    CAST(floor(sqrt(CAST(c AS DOUBLE)) * 1000000.0) AS BIGINT) AS qd
       |  FROM counts),
       |tot AS (
       |  SELECT CAST(sum(c) AS BIGINT) AS n, CAST(sum(qd) AS BIGINT) AS sq
       |  FROM q),
       |rates AS (
       |  SELECT source,
       |    least(1000.0,
       |      floor(1000.0 * floor(CAST(n AS DOUBLE) * 500 / 1000.0)
       |        * CAST(qd AS DOUBLE)
       |        / (CAST(sq AS DOUBLE) * CAST(c AS DOUBLE)))) AS rate
       |  FROM q, tot)
       |SELECT d.source, count(*) AS n_kept
       |FROM documents d JOIN rates r ON d.source = r.source
       |WHERE ((d.doc_id % ${graft.ops.Sampling.M31})
       |    * ${graft.ops.Sampling.HashA} % 4294967296) % 1000 < r.rate
       |GROUP BY d.source ORDER BY d.source""".stripMargin

  /** TF-IDF cosine similarity self-join (TextAnalysis.tfidfCosineJoin):
    * document pairs at cosine ≥ 0.8 over integer-quantized sparse
    * vectors — lexical near-dup/entity-resolution. Bounded to a fixed
    * 150-doc slice: this corpus's 31-term vocabulary makes every term
    * a stopword (df ≈ |corpus|), so the df-cap blocking the operator
    * relies on at scale cannot thin THESE candidates — the slice keeps
    * the declared pair join constant-sized per sf while the operator's
    * df knob stays exercised in-plan. */
  val tfidfCosineQ: Q = (spark, dir) =>
    TextAnalysis.tfidfCosineJoin(
        t(spark, dir, "documents").filter(col("doc_id") < 150),
        "doc_id", "text", threshold = 0.8, maxDf = 150L)
      .orderBy("id_a", "id_b")

  val tfidfCosineSql: String =
    """WITH d AS (SELECT doc_id, text FROM documents WHERE doc_id < 150),
      |toks AS (
      |  SELECT doc_id,
      |    unnest(string_split_regex(trim(lower(text)), '\s+')) AS term
      |  FROM d),
      |tf AS (
      |  SELECT doc_id, term, count(*) AS tf FROM toks
      |  WHERE length(term) > 0 GROUP BY 1, 2),
      |dfq AS (
      |  SELECT term, count(*) AS dfd FROM tf
      |  GROUP BY term HAVING count(*) <= 150),
      |nd AS (SELECT count(DISTINCT doc_id) AS n FROM d),
      |w AS (
      |  SELECT doc_id, term,
      |    CAST(floor(tf * ln(1.0 + CAST(n AS DOUBLE) / CAST(dfd AS DOUBLE))
      |      * 10000.0 + 0.5) AS BIGINT) AS wq
      |  FROM tf JOIN dfq USING (term), nd),
      |norms AS (
      |  SELECT doc_id, CAST(sum(wq * wq) AS BIGINT) AS n2
      |  FROM w GROUP BY doc_id),
      |dots AS (
      |  SELECT a.doc_id AS id_a, b.doc_id AS id_b,
      |    CAST(sum(a.wq * b.wq) AS BIGINT) AS dot
      |  FROM w a JOIN w b ON a.term = b.term AND a.doc_id < b.doc_id
      |  GROUP BY 1, 2)
      |SELECT id_a, id_b, round(cos, 6) AS cos FROM (
      |  SELECT id_a, id_b, CAST(dot AS DOUBLE) /
      |    (sqrt(CAST(na.n2 AS DOUBLE)) * sqrt(CAST(nb.n2 AS DOUBLE))) AS cos
      |  FROM dots JOIN norms na ON dots.id_a = na.doc_id
      |            JOIN norms nb ON dots.id_b = nb.doc_id)
      |WHERE cos >= 0.8 ORDER BY id_a, id_b""".stripMargin

  /** SemDeDup-style semantic near-dup (Similarity.semanticNearDupPairs):
    * exact-integer k-means buckets the corpus (k=8, one Lloyd round),
    * cosine scored only within clusters. Planted exact copies
    * (ids + 1e6) co-cluster deterministically and surface at cos 1.0;
    * the all-pairs product never materializes (Σ_c |c|² candidate
    * bound). Same 1000-vector slice as q_embedding_neardup. */
  val semDedupQ: Q = (spark, dir) => {
    val emb = t(spark, dir, "embeddings").filter(col("vec_id") < 1000)
      .select(col("vec_id"), col("embedding"))
    val copy = emb.select((col("vec_id") + 1000000).as("vec_id"),
      col("embedding"))
    Similarity.semanticNearDupPairs(emb.unionByName(copy),
        "vec_id", "embedding", k = 8, iterations = 1, threshold = 0.99)
      .orderBy("id_a", "id_b")
  }

  val semDedupSql: String = {
    val steps = (0 until 1).map { t =>
      s"""s$t AS (
         |  SELECT id, vq, cluster,
         |    CAST(list_sum(list_transform(generate_series(1, len(vq)),
         |      i -> (vq[i] - cv[i]) * (vq[i] - cv[i]))) AS BIGINT) AS d2
         |  FROM base CROSS JOIN c$t),
         |a$t AS (
         |  SELECT id, vq, cluster, d2 FROM (
         |    SELECT *, row_number() OVER (
         |      PARTITION BY id ORDER BY d2, cluster) AS rn FROM s$t)
         |  WHERE rn = 1),
         |c${t + 1} AS (
         |  SELECT cluster, list(c ORDER BY pos) AS cv FROM (
         |    SELECT cluster, pos,
         |      CAST(floor(CAST(sum(v) AS DOUBLE) / count(*)) AS BIGINT) AS c
         |    FROM (SELECT cluster, unnest(vq) AS v,
         |            generate_subscripts(vq, 1) AS pos FROM a$t)
         |    GROUP BY cluster, pos)
         |  GROUP BY cluster)""".stripMargin
    }.mkString(",\n")
    s"""WITH eb AS (
       |  SELECT vec_id AS id, CAST(embedding AS DOUBLE[]) AS v
       |  FROM embeddings WHERE vec_id < 1000),
       |u AS (SELECT id, v FROM eb
       |      UNION ALL SELECT id + 1000000 AS id, v FROM eb),
       |base AS (
       |  SELECT id, list_transform(v,
       |    x -> CAST(floor(x * 1000000 + 0.5) AS BIGINT)) AS vq
       |  FROM u),
       |c0 AS (
       |  SELECT CAST(row_number() OVER (ORDER BY id) - 1 AS INT) AS cluster,
       |    vq AS cv
       |  FROM base WHERE id < 8),
       |$steps,
       |fin AS (
       |  SELECT id, cluster FROM (
       |    SELECT id, cluster, row_number() OVER (
       |      PARTITION BY id ORDER BY d2, cluster) AS rn
       |    FROM (SELECT id, cluster,
       |        CAST(list_sum(list_transform(generate_series(1, len(vq)),
       |          i -> (vq[i] - cv[i]) * (vq[i] - cv[i]))) AS BIGINT) AS d2
       |      FROM base CROSS JOIN c1))
       |  WHERE rn = 1),
       |withn AS (
       |  SELECT f.id, f.cluster, u.v,
       |    sqrt(list_dot_product(u.v, u.v)) AS nrm
       |  FROM fin f JOIN u ON f.id = u.id),
       |pairs AS (
       |  SELECT a.id AS id_a, b.id AS id_b, a.cluster AS cluster,
       |    list_dot_product(a.v, b.v) / (a.nrm * b.nrm) AS cos
       |  FROM withn a JOIN withn b
       |    ON a.cluster = b.cluster AND a.id < b.id)
       |SELECT id_a, id_b, cluster, round(cos, 6) AS cos FROM pairs
       |WHERE cos >= 0.99 ORDER BY id_a, id_b""".stripMargin
  }

  // ------------------------------------- classic warehouse star-join suite

  /** TPC-H Q3-shaped shipping-priority revenue: segment-filtered
    * customers gate date-bounded orders (semi-join — the customer table
    * contributes no columns, so it must not widen the row), then the
    * open lineitems aggregate revenue per order. The canonical
    * selective star join: both date filters reach the parquet scans,
    * the semi-join side is aggregate-free, and the top-10 collapses to
    * TakeOrderedAndProject — no global sort materializes. */
  val tpchQ3: Q = (spark, dir) => {
    val cutoff = lit("1997-07-01").cast("timestamp")
    val cust = t(spark, dir, "customer")
      .filter(col("c_mktsegment") === "BUILDING")
      .select("c_custkey")
    val orders = t(spark, dir, "orders")
      .filter(col("o_orderdate") < cutoff)
      .join(cust, col("o_custkey") === col("c_custkey"), "left_semi")
      .select("o_orderkey", "o_orderdate")
    t(spark, dir, "lineitem")
      .filter(col("l_shipdate") > cutoff)
      .select("l_orderkey", "l_extendedprice", "l_discount")
      .join(orders, col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("l_orderkey"), col("o_orderdate"))
      .agg(dsum(col("l_extendedprice") * (lit(1) - col("l_discount")))
        .as("revenue"))
      .select(col("l_orderkey"), col("revenue"),
        date_format(col("o_orderdate"), "yyyy-MM-dd").as("order_date"))
      .orderBy(desc("revenue"), col("l_orderkey"))
      .limit(10)
  }

  val tpchQ3Sql: String =
    s"""SELECT l_orderkey,
       |  ${sqlDsum("l_extendedprice * (1 - l_discount)")} AS revenue,
       |  strftime(o_orderdate, '%Y-%m-%d') AS order_date
       |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
       |WHERE o_orderdate < TIMESTAMP '1997-07-01'
       |  AND l_shipdate > TIMESTAMP '1997-07-01'
       |  AND EXISTS (SELECT 1 FROM customer
       |    WHERE c_custkey = o_custkey AND c_mktsegment = 'BUILDING')
       |GROUP BY l_orderkey, o_orderdate
       |ORDER BY revenue DESC, l_orderkey LIMIT 10""".stripMargin

  /** TPC-H Q5-shaped local-supplier volume: the six-table star —
    * region⨝nation collapse to a broadcast dim, orders carry the year
    * filter to the scan, and the customer⨝supplier same-nation
    * condition rides the supplier equi-join (no extra shuffle). The
    * fact table shuffles exactly twice (orders key, supplier key);
    * every dimension arrives broadcast. */
  val tpchQ5: Q = (spark, dir) => {
    val natAsia = t(spark, dir, "nation")
      .join(t(spark, dir, "region").filter(col("r_name") === "ASIA"),
        col("n_regionkey") === col("r_regionkey"))
      .select("n_nationkey", "n_name")
    val orders = t(spark, dir, "orders")
      .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
        col("o_orderdate") < lit("1997-01-01").cast("timestamp"))
      .select("o_orderkey", "o_custkey")
    val cust = t(spark, dir, "customer").select("c_custkey", "c_nationkey")
    val supp = t(spark, dir, "supplier").select("s_suppkey", "s_nationkey")
    t(spark, dir, "lineitem")
      .select("l_orderkey", "l_suppkey", "l_extendedprice", "l_discount")
      .join(orders, col("l_orderkey") === col("o_orderkey"))
      .join(cust, col("o_custkey") === col("c_custkey"))
      .join(supp, col("l_suppkey") === col("s_suppkey") &&
        col("c_nationkey") === col("s_nationkey"))
      .join(broadcast(natAsia), col("s_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"))
      .agg(dsum(col("l_extendedprice") * (lit(1) - col("l_discount")))
        .as("revenue"))
      .orderBy(desc("revenue"), col("n_name"))
  }

  val tpchQ5Sql: String =
    s"""SELECT n_name,
       |  ${sqlDsum("l_extendedprice * (1 - l_discount)")} AS revenue
       |FROM lineitem
       |JOIN orders ON l_orderkey = o_orderkey
       |JOIN customer ON o_custkey = c_custkey
       |JOIN supplier ON l_suppkey = s_suppkey
       |  AND c_nationkey = s_nationkey
       |JOIN nation ON s_nationkey = n_nationkey
       |JOIN region ON n_regionkey = r_regionkey
       |WHERE r_name = 'ASIA'
       |  AND o_orderdate >= TIMESTAMP '1996-01-01'
       |  AND o_orderdate < TIMESTAMP '1997-01-01'
       |GROUP BY n_name ORDER BY revenue DESC, n_name""".stripMargin

  /** First/last-touch attribution over the event stream
    * (Analytics.attribution): running IGNORE-NULLS first/last touch in
    * one per-user window pass, both models from the same sorted scan. */
  val attributionQ: Q = (spark, dir) =>
    graft.ops.Analytics.attribution(t(spark, dir, "events"),
        "user_id", Seq("ts", "event_id"), "event_type", "value",
        touchTypes = Seq("click", "view"), conversionType = "purchase")
      .orderBy("model", "channel")

  val attributionSql: String =
    s"""WITH cr AS (
       |  SELECT user_id, event_type, value,
       |    first_value(CASE WHEN event_type IN ('click','view')
       |        THEN event_type END IGNORE NULLS) OVER w AS f,
       |    last_value(CASE WHEN event_type IN ('click','view')
       |        THEN event_type END IGNORE NULLS) OVER w AS l
       |  FROM events
       |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
       |cv AS (SELECT * FROM cr WHERE event_type = 'purchase'),
       |u AS (
       |  SELECT coalesce(f, 'direct') AS channel,
       |    'first_touch' AS model, value FROM cv
       |  UNION ALL
       |  SELECT coalesce(l, 'direct') AS channel,
       |    'last_touch' AS model, value FROM cv)
       |SELECT channel, model, count(*) AS conversions,
       |  ${sqlDsum("value")} AS revenue
       |FROM u GROUP BY channel, model ORDER BY model, channel""".stripMargin

  /** SCD Type-2 dimension history from the event feed
    * (Scd.scd2FromChanges): per-user event_type runs with validity
    * intervals, versions, and the open-interval flag. Interval bounds
    * serialize as microsecond strings — identical text both engines. */
  val scd2Q: Q = (spark, dir) =>
    graft.ops.Scd.scd2FromChanges(
        t(spark, dir, "events").withColumnRenamed("event_type", "state"),
        "user_id", Seq("ts", "event_id"), Seq("state"))
      .select(col("user_id"), col("state"),
        date_format(col("effective_from"), "yyyy-MM-dd HH:mm:ss.SSSSSS")
          .as("effective_from"),
        date_format(col("effective_to"), "yyyy-MM-dd HH:mm:ss.SSSSSS")
          .as("effective_to"),
        col("version"), col("is_current"))
      .orderBy("user_id", "version")

  val scd2Sql: String =
    """WITH chg AS (
      |  SELECT user_id, ts, event_id, event_type AS state,
      |    lag(event_type) OVER (
      |      PARTITION BY user_id ORDER BY ts, event_id) AS prev
      |  FROM events),
      |runs AS (
      |  SELECT user_id, ts, event_id, state FROM chg
      |  WHERE prev IS NULL OR state <> prev),
      |num AS (
      |  SELECT user_id, state, ts AS effective_from,
      |    lead(ts) OVER w AS effective_to,
      |    CAST(row_number() OVER w AS INT) AS version
      |  FROM runs
      |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
      |SELECT user_id, state,
      |  strftime(effective_from, '%Y-%m-%d %H:%M:%S.%f') AS effective_from,
      |  strftime(effective_to, '%Y-%m-%d %H:%M:%S.%f') AS effective_to,
      |  version, effective_to IS NULL AS is_current
      |FROM num ORDER BY user_id, version""".stripMargin

  /** Point-in-time dimension lookup against the SCD2 history: each
    * purchase event joined to the state version IN EFFECT at its
    * timestamp — the fact-to-versioned-dim pattern SCD2 exists for.
    * [from, to) intervals partition each key's timeline, so every
    * event matches exactly one version. Key-equi join + interval
    * filter: per-key fanout is that key's version count (use the
    * as-of join family for high-churn dims). */
  val scd2LookupQ: Q = (spark, dir) => {
    val ev = t(spark, dir, "events")
    val dim = graft.ops.Scd.scd2FromChanges(
      ev.withColumnRenamed("event_type", "state"),
      "user_id", Seq("ts", "event_id"), Seq("state"))
    ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts"), col("event_id"))
      .join(dim.select(col("user_id"), col("state"), col("version"),
        col("effective_from"), col("effective_to")), Seq("user_id"))
      .filter(col("ts") >= col("effective_from") &&
        (col("effective_to").isNull || col("ts") < col("effective_to")))
      .select(col("user_id"), col("event_id"), col("state"), col("version"))
      .orderBy("user_id", "event_id")
  }

  val scd2LookupSql: String =
    """WITH chg AS (
      |  SELECT user_id, ts, event_id, event_type AS state,
      |    lag(event_type) OVER (
      |      PARTITION BY user_id ORDER BY ts, event_id) AS prev
      |  FROM events),
      |runs AS (
      |  SELECT user_id, ts, event_id, state FROM chg
      |  WHERE prev IS NULL OR state <> prev),
      |num AS (
      |  SELECT user_id, state, ts AS effective_from,
      |    lead(ts) OVER w AS effective_to,
      |    CAST(row_number() OVER w AS INT) AS version
      |  FROM runs
      |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
      |p AS (SELECT user_id, ts, event_id FROM events
      |      WHERE event_type = 'purchase')
      |SELECT p.user_id, p.event_id, n.state, n.version
      |FROM p JOIN num n ON p.user_id = n.user_id
      |  AND p.ts >= n.effective_from
      |  AND (n.effective_to IS NULL OR p.ts < n.effective_to)
      |ORDER BY p.user_id, p.event_id""".stripMargin

  /** k-anonymity / l-diversity audit (Privacy.kAnonymityAudit) over
    * banded customer quasi-identifiers — the release-blocking
    * equivalence classes. */
  val kAnonymityQ: Q = (spark, dir) => {
    val c = t(spark, dir, "customer")
      .withColumn("acctbal_band",
        graft.ops.Privacy.band(col("c_acctbal"), 2000L))
    graft.ops.Privacy.kAnonymityAudit(c,
        Seq("c_mktsegment", "c_nationkey", "acctbal_band"),
        sensitiveCol = "c_acctbal", k = 3, l = 3)
      .orderBy("c_mktsegment", "c_nationkey", "acctbal_band")
  }

  val kAnonymitySql: String =
    """WITH g AS (
      |  SELECT c_mktsegment, c_nationkey,
      |    CAST(floor(c_acctbal / 2000) * 2000 AS BIGINT) AS acctbal_band,
      |    count(*) AS group_n,
      |    count(DISTINCT c_acctbal) AS sensitive_distinct
      |  FROM customer GROUP BY 1, 2, 3)
      |SELECT c_mktsegment, c_nationkey, acctbal_band, group_n,
      |  sensitive_distinct,
      |  group_n < 3 AS k_violation,
      |  sensitive_distinct < 3 AS l_violation
      |FROM g WHERE group_n < 3 OR sensitive_distinct < 3
      |ORDER BY c_mktsegment, c_nationkey, acctbal_band""".stripMargin

  /** Systematic PPS weighted sample (Sampling.systematicSample):
    * ~200 orders with probability ∝ o_totalprice, RNG-free exact
    * integer selection — distributed cumulative weights, broadcast
    * thresholds. */
  val weightedSampleQ: Q = (spark, dir) =>
    graft.ops.Sampling.systematicSample(
        t(spark, dir, "orders").select("o_orderkey", "o_totalprice"),
        "o_orderkey", "o_totalprice", n = 200)
      .orderBy("o_orderkey")

  val weightedSampleSql: String =
    """WITH w AS (
      |  SELECT o_orderkey, o_totalprice,
      |    CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS wq
      |  FROM orders
      |  WHERE CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) > 0),
      |c AS (
      |  SELECT o_orderkey, o_totalprice, wq,
      |    sum(wq) OVER (ORDER BY o_orderkey) AS cum FROM w),
      |tot AS (SELECT sum(wq) AS W FROM w),
      |th AS (SELECT (i * W + 199) // 200 AS t FROM range(1, 201) r(i), tot)
      |SELECT o_orderkey, o_totalprice FROM c
      |WHERE EXISTS (SELECT 1 FROM th
      |  WHERE th.t > c.cum - c.wq AND th.t <= c.cum)
      |ORDER BY o_orderkey""".stripMargin

  /** Exact prefix-filtered set-similarity self-join
    * (SetSimJoin.jaccardJoin): document pairs with 3-shingle-set
    * Jaccard ≥ 0.8 — lossless PPJoin-style blocking, oracle is the
    * unfiltered all-pairs semantics. Shingles, not words: this
    * corpus's vocabulary is ~31 tokens, so word-set Jaccard is a
    * degenerate metric (every doc resembles every doc and no exact
    * filter can prune); 3-shingles sharpen df and make the metric
    * sequence-sensitive. */
  val setsimJoinQ: Q = (spark, dir) =>
    graft.ops.SetSimJoin.jaccardJoin(t(spark, dir, "documents"),
        "doc_id", "text", threshold = 0.8, shingle = 3)
      .orderBy(desc("jac"), col("id_a"), col("id_b"))
      .limit(100)

  val setsimJoinSql: String =
    """WITH tok AS (
      |  SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS ts
      |  FROM documents),
      |toks AS (
      |  SELECT DISTINCT doc_id, array_to_string(ts[i:i+2], ' ') AS term
      |  FROM (SELECT doc_id, ts,
      |          unnest(generate_series(1, len(ts) - 2)) AS i
      |        FROM tok WHERE len(ts) >= 3)),
      |sz AS (SELECT doc_id, count(*) AS n FROM toks GROUP BY doc_id),
      |com AS (
      |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS common
      |  FROM toks a JOIN toks b
      |    ON a.term = b.term AND a.doc_id < b.doc_id
      |  GROUP BY 1, 2)
      |SELECT id_a, id_b, common, sa.n AS size_a, sb.n AS size_b,
      |  round(CAST(common AS DOUBLE) / (sa.n + sb.n - common), 6) AS jac
      |FROM com
      |JOIN sz sa ON sa.doc_id = id_a
      |JOIN sz sb ON sb.doc_id = id_b
      |WHERE CAST(common AS DOUBLE) / (sa.n + sb.n - common) >= 0.8
      |ORDER BY jac DESC, id_a, id_b LIMIT 100""".stripMargin

  /** Per-document duplicated 13-gram span statistics
    * (Dedup.duplicateSpans) — the Lee-et-al. exact-substring dedup
    * signal; one gram-keyed shuffle. */
  val dupSpansQ: Q = (spark, dir) =>
    graft.ops.Dedup.duplicateSpans(t(spark, dir, "documents"),
        "doc_id", "text", n = 13, minCount = 2)
      .orderBy("doc_id")

  val dupSpansSql: String =
    """WITH tok AS (
      |  SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS ts
      |  FROM documents),
      |g AS (
      |  SELECT doc_id, array_to_string(ts[i:i+12], ' ') AS gram
      |  FROM (SELECT doc_id, ts,
      |          unnest(generate_series(1, len(ts) - 12)) AS i
      |        FROM tok WHERE len(ts) >= 13)),
      |c AS (SELECT doc_id,
      |        count(*) OVER (PARTITION BY gram) AS total FROM g),
      |d AS (
      |  SELECT doc_id, count(*) AS n_spans,
      |    count(*) FILTER (WHERE total >= 2) AS n_dup_spans
      |  FROM c GROUP BY doc_id)
      |SELECT doc_id, n_spans, n_dup_spans,
      |  round(CAST(n_dup_spans AS DOUBLE) / n_spans, 6) AS dup_frac
      |FROM d ORDER BY doc_id""".stripMargin

  /** Unicode canonicalization (UnicodeNormalizeExpr — codegen'd
    * java.text.Normalizer): NFC text plus a folded variant (lower →
    * NFD → strip combining marks → NFC → collapse whitespace) — the
    * canonical-spelling step every hash/join/dedup should run first.
    * Map-only. */
  val unicodeNormalizeQ: Q = (spark, dir) => {
    import graft.functions.UnicodeNormalizeExpr.unicodeNormalize
    t(spark, dir, "documents")
      .select(col("doc_id"),
        unicodeNormalize(col("text"), "NFC").as("text_nfc"),
        regexp_replace(trim(unicodeNormalize(
            regexp_replace(unicodeNormalize(lower(
              unicodeNormalize(col("text"), "NFC")), "NFD"),
              "\\p{Mn}", ""), "NFC")), "\\s+", " ").as("text_fold"))
      .withColumn("changed", col("text_nfc") =!= col("text_fold"))
      .orderBy("doc_id")
  }

  val unicodeNormalizeSql: String =
    """SELECT doc_id, nfc_normalize(text) AS text_nfc,
      |  regexp_replace(trim(strip_accents(lower(nfc_normalize(text)))),
      |    '\s+', ' ', 'g') AS text_fold,
      |  nfc_normalize(text) <>
      |    regexp_replace(trim(strip_accents(lower(nfc_normalize(text)))),
      |      '\s+', ' ', 'g') AS changed
      |FROM documents ORDER BY doc_id""".stripMargin

  /** Deflate compression ratio as a quality signal
    * (DeflateRatioExpr): repetition/boilerplate compresses far below
    * natural prose. zlib output is JVM-specific — no SQL oracle; the
    * ordering contract is spec-pinned (`UnicodeDeflateSpec`). */
  val compressRatioQ: Q = (spark, dir) => {
    import graft.functions.DeflateRatioExpr.deflateRatio
    t(spark, dir, "documents")
      .select(col("doc_id"), col("n_chars"),
        round(deflateRatio(col("text")), 4).as("deflate_ratio"))
      .orderBy("doc_id")
  }

  /** Product-quantization encode (Similarity.pqEncode): m=4 subspace
    * codebooks (k=4, 1 Lloyd round) in exact scaled-integer
    * arithmetic — training AND encoding hash-match the unrolled
    * per-subspace SQL, the same determinism q_kmeans pins. */
  val pqEncodeQ: Q = (spark, dir) =>
    Similarity.pqEncode(t(spark, dir, "embeddings"),
        "vec_id", "embedding", m = 4, k = 4, iterations = 1)
      .orderBy("vec_id")

  val pqEncodeSql: String = {
    val m = 4; val k = 4; val sub = 16
    def chain(s: Int): String = {
      val lo = s * sub + 1; val hi = (s + 1) * sub
      s"""base$s AS (
         |  SELECT vec_id AS id,
         |    list_transform(CAST(embedding[$lo:$hi] AS DOUBLE[]),
         |      x -> CAST(floor(x * 1000000 + 0.5) AS BIGINT)) AS vq
         |  FROM embeddings),
         |c${s}_0 AS (
         |  SELECT CAST(row_number() OVER (ORDER BY id) - 1 AS INT) AS cluster,
         |    vq AS cv
         |  FROM base$s WHERE id < $k),
         |a${s}_0 AS (
         |  SELECT id, vq, cluster, d2 FROM (
         |    SELECT *, row_number() OVER (
         |      PARTITION BY id ORDER BY d2, cluster) AS rn
         |    FROM (SELECT b.id, b.vq, c.cluster,
         |        CAST(list_sum(list_transform(generate_series(1, len(b.vq)),
         |          i -> (b.vq[i] - c.cv[i]) * (b.vq[i] - c.cv[i])))
         |          AS BIGINT) AS d2
         |      FROM base$s b CROSS JOIN c${s}_0 c))
         |  WHERE rn = 1),
         |c${s}_1 AS (
         |  SELECT cluster, list(c ORDER BY pos) AS cv FROM (
         |    SELECT cluster, pos,
         |      CAST(floor(CAST(sum(v) AS DOUBLE) / count(*)) AS BIGINT) AS c
         |    FROM (SELECT cluster, unnest(vq) AS v,
         |            generate_subscripts(vq, 1) AS pos FROM a${s}_0)
         |    GROUP BY cluster, pos)
         |  GROUP BY cluster),
         |fin$s AS (
         |  SELECT id, cluster AS code_$s, d2 AS d2_$s FROM (
         |    SELECT id, cluster, d2, row_number() OVER (
         |      PARTITION BY id ORDER BY d2, cluster) AS rn
         |    FROM (SELECT b.id, c.cluster,
         |        CAST(list_sum(list_transform(generate_series(1, len(b.vq)),
         |          i -> (b.vq[i] - c.cv[i]) * (b.vq[i] - c.cv[i])))
         |          AS BIGINT) AS d2
         |      FROM base$s b CROSS JOIN c${s}_1 c))
         |  WHERE rn = 1)""".stripMargin
    }
    s"""WITH ${(0 until m).map(chain).mkString(",\n")}
       |SELECT fin0.id AS vec_id, code_0, code_1, code_2, code_3,
       |  (d2_0 + d2_1 + d2_2 + d2_3) AS recon_d2
       |FROM fin0 JOIN fin1 USING (id) JOIN fin2 USING (id)
       |  JOIN fin3 USING (id)
       |ORDER BY vec_id""".stripMargin
  }

  /** ADC top-10 search over PQ codes (Similarity.pqSearch): no SQL
    * oracle by design — the code path is deterministic but the
    * unrolled 4-subspace × table-lookup SQL twin adds nothing the
    * encode oracle doesn't already pin; the ADC==reconstruction-L2
    * identity and exact-copy-ranks-first are spec-pinned (`PqSpec`). */
  val pqSearchQ: Q = (spark, dir) => {
    val emb = t(spark, dir, "embeddings")
    Similarity.pqSearch(emb, "vec_id", "embedding",
        emb.filter(col("vec_id") < 5)
          .select(col("vec_id").as("qid"), col("embedding")),
        "qid", m = 4, k = 4, iterations = 1, topK = 10)
      .orderBy("query_id", "rank")
  }

  /** BPE tokenization end-to-end (TextAnalysis.bpeTrain +
    * BpeEncodeExpr): merges learned driver-side from the collapsed
    * word-frequency table (one corpus shuffle), encoding map-only via
    * the codegen'd expression. No SQL oracle by design — the greedy
    * merge loop has no SQL twin; `BpeSpec` pins hand-computed merges,
    * train/encode agreement, and determinism. */
  val bpeEncodeQ: Q = (spark, dir) => {
    import graft.functions.BpeEncodeExpr.bpeEncode
    val docs = t(spark, dir, "documents")
    val merges = TextAnalysis.bpeTrain(docs, "text", numMerges = 30)
    docs
      .select(col("doc_id"),
        bpeEncode(TextAnalysis.normalize(col("text")), merges).as("__toks"))
      .select(col("doc_id"),
        size(col("__toks")).cast("long").as("n_subwords"),
        concat_ws(" ", slice(col("__toks"), 1, 8)).as("subword_preview"))
      .orderBy("doc_id")
  }

  /** Closed-form OLS per group: slope/intercept of extendedprice on
    * quantity per return flag — every moment (Σx, Σy, Σxy, Σx²)
    * accumulates EXACTLY (quantized integers in decimal(38,0), the
    * dsum discipline), numerator and denominator cast to double once,
    * one IEEE division — so an iterative-free regression hash-matches
    * across engines, where `regr_slope`'s float folds never would. */
  val linregQ: Q = (spark, dir) => {
    val x = iscale(col("l_quantity"), 2)
    val y = iscale(col("l_extendedprice"), 2)
    val d38 = DecimalType(38, 0)
    t(spark, dir, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n"),
        sum(x.cast(d38)).as("__sx"),
        sum(y.cast(d38)).as("__sy"),
        sum((x * y).cast(d38)).as("__sxy"),
        sum((x * x).cast(d38)).as("__sxx"))
      .withColumn("__num",
        (col("n") * col("__sxy") - col("__sx") * col("__sy"))
          .cast("double"))
      .withColumn("__den",
        (col("n") * col("__sxx") - col("__sx") * col("__sx"))
          .cast("double"))
      .withColumn("slope", round(col("__num") / col("__den"), 6))
      .withColumn("intercept", round(
        ((col("__sy").cast("double") -
          (col("__num") / col("__den")) * col("__sx").cast("double")) /
          col("n")) / lit(100.0), 6))
      .select(col("l_returnflag"), col("n"), col("slope"),
        col("intercept"))
      .orderBy("l_returnflag")
  }

  val linregSql: String = {
    val x = sqlIscale("l_quantity", 2)
    val y = sqlIscale("l_extendedprice", 2)
    s"""WITH m AS (
       |  SELECT l_returnflag, count(*) AS n,
       |    sum(CAST($x AS DECIMAL(38,0))) AS sx,
       |    sum(CAST($y AS DECIMAL(38,0))) AS sy,
       |    sum(CAST($x * $y AS DECIMAL(38,0))) AS sxy,
       |    sum(CAST($x * $x AS DECIMAL(38,0))) AS sxx
       |  FROM lineitem GROUP BY l_returnflag),
       |d AS (
       |  SELECT l_returnflag, n,
       |    CAST(n * sxy - sx * sy AS DOUBLE) AS num,
       |    CAST(n * sxx - sx * sx AS DOUBLE) AS den,
       |    CAST(sy AS DOUBLE) AS syd, CAST(sx AS DOUBLE) AS sxd
       |  FROM m)
       |SELECT l_returnflag, n, round(num / den, 6) AS slope,
       |  round(((syd - (num / den) * sxd) / n) / 100.0, 6) AS intercept
       |FROM d ORDER BY l_returnflag""".stripMargin
  }

  /** Seasonal decomposition + anomaly flags over the daily event
    * volume (TimeSeries.seasonalDecompose): centered-MA trend
    * (unrolled fold), per-phase exact seasonal means, MAD-flavored
    * residual threshold — hash-matched end to end. */
  val seasonalQ: Q = (spark, dir) => {
    val daily = t(spark, dir, "events")
      .groupBy(to_date(col("ts")).as("day"))
      .agg(dsum(col("value")).as("total"))
    graft.ops.TimeSeries.seasonalDecompose(daily, "day", "total",
        period = 7, k = 2.0)
      .select(date_format(col("day"), "yyyy-MM-dd").as("day"),
        round(col("total"), 6).as("total"), col("phase"),
        round(col("trend"), 6).as("trend"),
        round(col("seasonal"), 6).as("seasonal"),
        round(col("residual"), 6).as("residual"), col("is_anomaly"))
      .orderBy("day")
  }

  val seasonalSql: String = {
    val lags = Seq("lag(total, 3) OVER w", "lag(total, 2) OVER w",
      "lag(total, 1) OVER w", "total", "lead(total, 1) OVER w",
      "lead(total, 2) OVER w", "lead(total, 3) OVER w")
    s"""WITH daily AS (
       |  SELECT CAST(ts AS DATE) AS day, ${sqlDsum("value")} AS total
       |  FROM events GROUP BY 1),
       |t AS (
       |  SELECT day, total,
       |    CASE WHEN ${lags.map(l => s"($l) IS NOT NULL").mkString(" AND ")}
       |      THEN (${lags.mkString(" + ")}) / 7.0 END AS trend,
       |    CAST(datediff('day', DATE '1970-01-01', day) % 7 AS INT)
       |      AS phase
       |  FROM daily WINDOW w AS (ORDER BY day)),
       |d AS (SELECT *, total - trend AS detrended FROM t),
       |s AS (SELECT phase, ${sqlDavg("detrended")} AS seasonal
       |      FROM d WHERE detrended IS NOT NULL GROUP BY phase),
       |r AS (
       |  SELECT d.day, d.total, d.phase, d.trend, s.seasonal,
       |    CASE WHEN d.detrended IS NOT NULL
       |      THEN d.detrended - s.seasonal END AS residual
       |  FROM d LEFT JOIN s ON d.phase = s.phase),
       |m AS (SELECT ${sqlDavg("abs(residual)")} AS mabs FROM r
       |      WHERE residual IS NOT NULL)
       |SELECT strftime(r.day, '%Y-%m-%d') AS day,
       |  round(r.total, 6) AS total, r.phase,
       |  round(r.trend, 6) AS trend, round(r.seasonal, 6) AS seasonal,
       |  round(r.residual, 6) AS residual,
       |  CASE WHEN r.residual IS NOT NULL
       |    THEN abs(r.residual) > 2.0 * m.mabs END AS is_anomaly
       |FROM r, m ORDER BY day""".stripMargin
  }

  /** Per-dimension embedding standardization (z-score feature
    * scaling): each dimension's mean and variance from EXACT
    * decimal-quantized moment sums (partition-order independent —
    * native avg/stddev float folds are not), one sqrt + one division
    * in doubles. The whiten-before-distance step of vector prep;
    * output exploded (vec_id, pos, z) for the hash compare. */
  val featureScaleQ: Q = (spark, dir) => {
    val d38 = DecimalType(38, 0)
    val dims = t(spark, dir, "embeddings")
      .select(col("vec_id"),
        posexplode(col("embedding").cast("array<double>"))
          .as(Seq("pos", "x")))
    val xq = iscale(col("x"), 6)
    val stats = dims.groupBy(col("pos"))
      .agg(count(lit(1)).as("n"),
        sum(xq.cast(d38)).as("__sx"),
        sum((xq * xq).cast(d38)).as("__sxx"))
      .withColumn("mean",
        (col("__sx").cast("double") / col("n")) / lit(1e6))
      .withColumn("sd", sqrt(
        ((col("n") * col("__sxx") - col("__sx") * col("__sx"))
          .cast("double") /
          (col("n").cast("double") * (col("n") - lit(1)).cast("double"))) /
          lit(1e12)))
      .select(col("pos"), col("mean"), col("sd"))
    dims.join(broadcast(stats), Seq("pos"))
      .select(col("vec_id"), col("pos"),
        round((col("x") - col("mean")) / col("sd"), 6).as("z"))
      .orderBy("vec_id", "pos")
  }

  val featureScaleSql: String = {
    val xq = sqlIscale("x", 6)
    s"""WITH dims AS (
       |  SELECT vec_id, CAST(i - 1 AS INT) AS pos,
       |    CAST(embedding[i] AS DOUBLE) AS x
       |  FROM (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS embedding,
       |          unnest(generate_series(1, len(embedding))) AS i
       |        FROM embeddings)),
       |stats AS (
       |  SELECT pos, count(*) AS n,
       |    sum(CAST($xq AS DECIMAL(38,0))) AS sx,
       |    sum(CAST($xq * $xq AS DECIMAL(38,0))) AS sxx
       |  FROM dims GROUP BY pos),
       |ms AS (
       |  SELECT pos,
       |    (CAST(sx AS DOUBLE) / n) / 1e6 AS mean,
       |    sqrt((CAST(n * sxx - sx * sx AS DOUBLE) /
       |      (CAST(n AS DOUBLE) * CAST(n - 1 AS DOUBLE))) / 1e12) AS sd
       |  FROM stats)
       |SELECT d.vec_id, d.pos, round((d.x - ms.mean) / ms.sd, 6) AS z
       |FROM dims d JOIN ms ON d.pos = ms.pos
       |ORDER BY d.vec_id, d.pos""".stripMargin
  }

  /** Exact covariance matrix of the leading embedding dims
    * ([[Pca.covariance]]): the one-pass reduction that makes PCA
    * cluster-shaped — shuffle volume is O(dims²) regardless of row
    * count (map-side partial agg collapses the exploded pairs).
    * Quantized decimal sums make the matrix exact, hence
    * hash-matchable against DuckDB doing the same arithmetic. Leading
    * 8 dims declared (36 upper-triangle entries); PcaSpec exercises
    * the full 64. */
  val embeddingCovQ: Q = (spark, dir) =>
    Pca.covariance(t(spark, dir, "embeddings"), "embedding", dims = 8)
      .orderBy("i", "j")

  val embeddingCovSql: String =
    s"""WITH v AS (
       |  SELECT CAST(embedding[1:8] AS DOUBLE[]) AS e FROM embeddings),
       |p AS (
       |  SELECT CAST(t1.i - 1 AS INT) AS i, CAST(t2.j - 1 AS INT) AS j,
       |    e[t1.i] AS xi, e[t2.j] AS xj
       |  FROM v, generate_series(1, 8) t1(i), generate_series(1, 8) t2(j)
       |  WHERE t2.j >= t1.i)
       |SELECT i, j,
       |  (CAST(sum(CAST(${sqlIscale("(xi * xj)", 8)} AS DECIMAL(38,0)))
       |     AS DOUBLE) / count(*)) / 1e8 -
       |  ((CAST(sum(CAST(${sqlIscale("xi", 6)} AS DECIMAL(38,0)))
       |     AS DOUBLE) / count(*)) / 1e6) *
       |  ((CAST(sum(CAST(${sqlIscale("xj", 6)} AS DECIMAL(38,0)))
       |     AS DOUBLE) / count(*)) / 1e6) AS cov
       |FROM p GROUP BY i, j ORDER BY i, j""".stripMargin

  /** PCA projection ([[Pca.fit]] + [[Pca.project]]): full-64-dim fit
    * (one covariance pass + driver Jacobi eigensolve of the 64×64
    * matrix), then a map-only projection — k fused dot products per
    * row against broadcast-literal components, no shuffle. No oracle
    * BY DESIGN (no eigensolve in SQL); PcaSpec pins component
    * orthonormality, eigenvalue ordering + trace preservation,
    * projected variance == eigenvalue, reconstruction-error monotone
    * in k, and bit-identical refit under repartitioning. Output is
    * flattened to scalar pc_0..pc_3 columns (not array<double>) so
    * generic result harnesses can sort/hash the frame. */
  val pcaProjectQ: Q = (spark, dir) => {
    val emb = t(spark, dir, "embeddings")
    val model = Pca.fit(emb, "embedding", dims = 64, k = 4)
    val flat = (0 until 4).map(i =>
      round(col("pc").getItem(i), 6).as(s"pc_$i"))
    Pca.project(emb, "embedding", model)
      .select(col("vec_id") +: flat: _*)
      .orderBy("vec_id")
  }

  /** Spark 4 VARIANT ingestion: the open-ended semi-structured path —
    * `parse_json` once into the binary VARIANT encoding, then typed
    * `variant_get` extractions navigate it WITHOUT re-parsing the
    * string per field (the scale win over repeated get_json_object: at
    * 100 TB the parse happens once per row, fields decode from the
    * binary form, and a VARIANT column written to parquet is shredded
    * for pushdown). Exercises nested paths, a missing-path
    * `try_variant_get` → NULL, a failed typed cast → NULL, and JSON
    * null vs SQL NULL (`is_variant_null`). The doc is assembled from
    * table columns (ints + enum strings only — float rendering is not
    * cross-engine-stable) so DuckDB can build the identical JSON and
    * mirror with its json functions. */
  val variantJson: Q = (spark, dir) => {
    val doc = concat(
      lit("""{"meta":{"type":""""), col("event_type"),
      lit("""","cents":"""), iscale(col("value"), 2),
      lit("""},"props":"""), col("props"),
      lit(""","maybe":"""),
      when(col("event_type") === "purchase",
        iscale(col("value"), 2).cast("string")).otherwise(lit("null")),
      lit("}"))
    t(spark, dir, "events")
      .select(col("event_id"), parse_json(doc).as("v"))
      .select(
        col("event_id"),
        variant_get(col("v"), "$.meta.type", "string").as("vtype"),
        variant_get(col("v"), "$.meta.cents", "long").as("cents"),
        variant_get(col("v"), "$.props.k", "int").as("k"),
        try_variant_get(col("v"), "$.nope", "string").as("missing"),
        try_variant_get(col("v"), "$.meta.type", "int").as("bad_cast"),
        is_variant_null(variant_get(col("v"), "$.maybe", "variant"))
          .as("maybe_is_jnull"))
      .orderBy("event_id")
  }

  val variantJsonSql: String =
    s"""WITH j AS (
       |  SELECT event_id,
       |    '{"meta":{"type":"' || event_type || '","cents":' ||
       |    CAST(${sqlIscale("value", 2)} AS VARCHAR) ||
       |    '},"props":' || props || ',"maybe":' ||
       |    CASE WHEN event_type = 'purchase'
       |         THEN CAST(${sqlIscale("value", 2)} AS VARCHAR)
       |         ELSE 'null' END || '}' AS doc
       |  FROM events)
       |SELECT event_id,
       |  json_extract_string(doc, '$$.meta.type') AS vtype,
       |  CAST(json_extract(doc, '$$.meta.cents') AS BIGINT) AS cents,
       |  CAST(json_extract(doc, '$$.props.k') AS INT) AS k,
       |  CAST(NULL AS VARCHAR) AS missing,
       |  TRY_CAST(json_extract_string(doc, '$$.meta.type') AS INT)
       |    AS bad_cast,
       |  json_type(doc, '$$.maybe') = 'NULL' AS maybe_is_jnull
       |FROM j ORDER BY event_id""".stripMargin

  /** Interval-union coverage ([[graft.ops.TimeSeries.intervalUnion]]):
    * events become [s, s+60+floor(value)]-second intervals per user;
    * the sweep-line merge unions overlaps, then one per-user rollup
    * reports covered seconds / merged blocks / raw intervals. Naive
    * sum(e-s) would double-count — the oracle runs the identical
    * gaps-and-islands SQL in DuckDB. */
  val intervalUnionQ: Q = (spark, dir) => {
    val iv = t(spark, dir, "events")
      .select(col("user_id"),
        unix_timestamp(col("ts")).as("s"),
        (unix_timestamp(col("ts")) + lit(60) +
          floor(col("value")).cast("long")).as("e"))
    graft.ops.TimeSeries.intervalUnion(iv, "user_id", "s", "e")
      .groupBy(col("user_id"))
      .agg(
        sum(col("block_end") - col("block_start")).as("covered_sec"),
        count(lit(1)).as("n_blocks"),
        sum(col("n_intervals")).as("n_intervals"))
      .orderBy("user_id")
  }

  val intervalUnionSql: String =
    """WITH iv AS (
      |  SELECT user_id, CAST(floor(epoch(ts)) AS BIGINT) AS s,
      |    CAST(floor(epoch(ts)) AS BIGINT) + 60 +
      |      CAST(floor(value) AS BIGINT) AS e
      |  FROM events),
      |marked AS (
      |  SELECT user_id, s, e,
      |    CASE WHEN max(e) OVER (PARTITION BY user_id ORDER BY s, e
      |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
      |           IS NULL
      |      OR s > max(e) OVER (PARTITION BY user_id ORDER BY s, e
      |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
      |      THEN 1 ELSE 0 END AS new_block
      |  FROM iv),
      |blocks AS (
      |  SELECT user_id, s, e,
      |    sum(new_block) OVER (PARTITION BY user_id ORDER BY s, e
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS b
      |  FROM marked),
      |merged AS (
      |  SELECT user_id, b, min(s) AS bs, max(e) AS be, count(*) AS n
      |  FROM blocks GROUP BY user_id, b)
      |SELECT user_id, CAST(sum(be - bs) AS BIGINT) AS covered_sec,
      |  count(*) AS n_blocks, CAST(sum(n) AS BIGINT) AS n_intervals
      |FROM merged GROUP BY user_id ORDER BY user_id""".stripMargin

  /** transformWithState running totals ([[graft.streaming.StreamingOps
    * .runningTotals]]): a REAL two-micro-batch stream through Spark 4's
    * arbitrary-state operator (ValueState in the RocksDB store). Each
    * batch emits cumulative per-key snapshots; the final snapshot per
    * key (max — n is monotone) must equal the full-history aggregate,
    * which is the oracle. Money rides as pre-quantized integer cents so
    * the running sum is exact and batch-slicing independent. */
  val streamRunningTotals: Q = (spark, dir) => {
    val st = new BasicStorage(spark)
    val out = java.nio.file.Files
      .createTempDirectory("graft_tws_q").toString
    val events = t(spark, dir, "events")
      .select(col("user_id"), iscale(col("value"), 2).as("cents"))
    st.write(events.filter(col("user_id") % 2 === 0).coalesce(1),
      s"$out/in", "parquet", "overwrite")
    events.filter(col("user_id") % 2 === 1)
      .coalesce(1).write.mode("append").parquet(s"$out/in")
    val stream = spark.readStream.schema(events.schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(s"$out/in")
    val totals = graft.streaming.StreamingOps.runningTotals(
      stream, "user_id", "cents")
    val prevShuffle = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "4")
    var q: org.apache.spark.sql.streaming.StreamingQuery = null
    try graft.streaming.StreamingOps.withRocksDbProvider(spark) {
      q = totals.toDF().writeStream.outputMode("append")
        .option("checkpointLocation", s"$out/cp")
        .format("parquet").start(s"$out/data")
      q.processAllAvailable()
    } finally {
      spark.conf.set("spark.sql.shuffle.partitions", prevShuffle)
      if (q != null) q.stop() // also on failure — don't leak the query
    }
    st.read(s"$out/data", "parquet")
      .groupBy(col("user_id"))
      .agg(max(col("n_events")).as("n_events"),
        max(col("total_cents")).as("total_cents"))
      .orderBy("user_id")
  }

  val streamRunningTotalsSql: String =
    s"""SELECT user_id, count(*) AS n_events,
       |  CAST(sum(${sqlIscale("value", 2)}) AS BIGINT) AS total_cents
       |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin

  /** PMI collocations ([[TextAnalysis.collocations]]): adjacent-bigram
    * pointwise mutual information with a min-count floor. Exact integer
    * counts through one ln — the double is deterministic on both
    * engines, so the oracle hash-matches. */
  val collocationsQ: Q = (spark, dir) =>
    TextAnalysis.collocations(t(spark, dir, "documents"), "text",
        minCount = 5)
      .orderBy("w1", "w2")

  val collocationsSql: String =
    """WITH toks AS (
      |  SELECT string_split(
      |    regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ') AS t
      |  FROM documents),
      |uni AS (SELECT unnest(t) AS w FROM toks),
      |uc AS (SELECT w, count(*) AS cw FROM uni GROUP BY w),
      |bg AS (
      |  SELECT t[i] AS w1, t[i + 1] AS w2
      |  FROM (SELECT t, unnest(generate_series(1, len(t) - 1)) AS i
      |        FROM toks)),
      |pc AS (
      |  SELECT w1, w2, count(*) AS c12 FROM bg GROUP BY w1, w2
      |  HAVING count(*) >= 5),
      |tot AS (
      |  SELECT (SELECT count(*) FROM bg) AS p,
      |         (SELECT count(*) FROM uni) AS u)
      |SELECT pc.w1, pc.w2, pc.c12,
      |  round(ln((CAST(pc.c12 AS DOUBLE) * tot.u * tot.u) /
      |    (CAST(tot.p AS DOUBLE) * u1.cw * u2.cw)), 6) AS pmi
      |FROM pc
      |JOIN uc u1 ON pc.w1 = u1.w
      |JOIN uc u2 ON pc.w2 = u2.w
      |CROSS JOIN tot
      |ORDER BY pc.w1, pc.w2""".stripMargin

  /** Winsorized clipping ([[graft.ops.Analytics.winsorize]]): values
    * capped to the per-event-type exact [p05, p95] band; broadcast
    * bounds, map-only clip. Output rounded to 4 (the same masking the
    * q_percentile oracle relies on for interpolated bounds). */
  val winsorizeQ: Q = (spark, dir) =>
    graft.ops.Analytics.winsorize(
        t(spark, dir, "events"), "event_type", "value", 0.05, 0.95)
      .select(col("event_id"), col("event_type"), col("value"),
        round(col("value_w"), 4).as("value_w"))
      .orderBy("event_id")

  val winsorizeSql: String =
    """WITH b AS (
      |  SELECT event_type,
      |    quantile_cont(value, 0.05) AS lo,
      |    quantile_cont(value, 0.95) AS hi
      |  FROM events GROUP BY event_type)
      |SELECT event_id, e.event_type, value,
      |  round(least(greatest(value, b.lo), b.hi), 4) AS value_w
      |FROM events e JOIN b USING (event_type)
      |ORDER BY event_id""".stripMargin

  /** CUSUM change-point ([[graft.ops.TimeSeries.changePoint]]): per
    * user, the event where cumulative deviation from the user's mean
    * spend peaks — exact scaled-integer CUSUM, deterministic argmax
    * with earliest-position tie-break, one key-partitioned shuffle. */
  val changePointQ: Q = (spark, dir) =>
    graft.ops.TimeSeries.changePoint(
        t(spark, dir, "events")
          .select(col("user_id"), col("event_id"),
            iscale(col("value"), 2).as("cents")),
        "user_id", "event_id", "cents")
      .orderBy("user_id")

  val changePointSql: String =
    s"""WITH q AS (
       |  SELECT user_id, event_id, ${sqlIscale("value", 2)} AS c
       |  FROM events),
       |s AS (
       |  SELECT user_id, event_id,
       |    sum(c) OVER (PARTITION BY user_id ORDER BY event_id
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
       |    CAST(row_number() OVER (PARTITION BY user_id ORDER BY event_id)
       |      AS BIGINT) AS i,
       |    sum(c) OVER (PARTITION BY user_id) AS tot,
       |    count(*) OVER (PARTITION BY user_id) AS n
       |  FROM q),
       |t AS (
       |  SELECT user_id, event_id, n * cum - i * tot AS t, n,
       |    row_number() OVER (PARTITION BY user_id
       |      ORDER BY abs(n * cum - i * tot) DESC, event_id) AS rk
       |  FROM s)
       |SELECT user_id, event_id AS cp_event_id, CAST(t AS BIGINT) AS cusum,
       |  n FROM t WHERE rk = 1 ORDER BY user_id""".stripMargin

  /** transformWithState last-N feature assembly
    * ([[graft.streaming.StreamingOps.recentFeatures]]): a real
    * two-micro-batch stream maintaining each user's 8 newest event
    * values as bounded ListState; the final snapshot per key
    * (max_by on the strictly-growing n_seen) must equal the
    * full-history top-8-by-recency — the oracle. */
  val streamRecentFeatures: Q = (spark, dir) => {
    val st = new BasicStorage(spark)
    val out = java.nio.file.Files
      .createTempDirectory("graft_rf_q").toString
    val events = t(spark, dir, "events")
      .select(col("user_id"), col("event_id"),
        iscale(col("value"), 2).as("cents"))
    // split by event id so most users appear in BOTH micro-batches —
    // the cross-batch state merge is what's under test
    st.write(events.filter(col("event_id") % 2 === 0).coalesce(1),
      s"$out/in", "parquet", "overwrite")
    events.filter(col("event_id") % 2 === 1)
      .coalesce(1).write.mode("append").parquet(s"$out/in")
    val stream = spark.readStream.schema(events.schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(s"$out/in")
    val feats = graft.streaming.StreamingOps.recentFeatures(
      stream, "user_id", "event_id", "cents", n = 8)
    val prevShuffle = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "4")
    var q: org.apache.spark.sql.streaming.StreamingQuery = null
    try graft.streaming.StreamingOps.withRocksDbProvider(spark) {
      q = feats.toDF().writeStream.outputMode("append")
        .option("checkpointLocation", s"$out/cp")
        .format("parquet").start(s"$out/data")
      q.processAllAvailable()
    } finally {
      spark.conf.set("spark.sql.shuffle.partitions", prevShuffle)
      if (q != null) q.stop() // also on failure — don't leak the query
    }
    st.read(s"$out/data", "parquet")
      .groupBy(col("user_id"))
      .agg(max(col("n_seen")).as("n_seen"),
        max_by(col("recent"), col("n_seen")).as("recent"))
      .orderBy("user_id")
  }

  val streamRecentFeaturesSql: String =
    s"""WITH q AS (
       |  SELECT user_id, event_id, ${sqlIscale("value", 2)} AS c,
       |    row_number() OVER (PARTITION BY user_id
       |      ORDER BY event_id DESC) AS rk,
       |    count(*) OVER (PARTITION BY user_id) AS n
       |  FROM events)
       |SELECT user_id, CAST(max(n) AS BIGINT) AS n_seen,
       |  string_agg(CAST(c AS VARCHAR), ',' ORDER BY event_id DESC)
       |    AS recent
       |FROM q WHERE rk <= 8 GROUP BY user_id ORDER BY user_id""".stripMargin

  /** Johnson–Lindenstrauss random projection
    * ([[Pca.randomProjection]]): data-independent 64→8 reduction via
    * the seeded Rademacher matrix — map-only, zero passes over the
    * data to "fit". The oracle regenerates the SAME matrix driver-side
    * and unrolls it into SQL (the q_pq_encode technique): identical
    * left-associated multiply-add order makes the doubles
    * bit-identical, so the compare hash-matches. */
  val randomProjectionQ: Q = (spark, dir) =>
    Pca.randomProjection(t(spark, dir, "embeddings"), "embedding",
        dims = 64, k = 8, seed = 7)
      .select(col("vec_id"), posexplode(col("rp")).as(Seq("c", "v")))
      .select(col("vec_id"), col("c"), round(col("v"), 6).as("v"))
      .orderBy("vec_id", "c")

  val randomProjectionSql: String = {
    val m = Pca.rpMatrix(8, 64, 7)
    m.zipWithIndex.map { case (row, c) =>
      val sum = row.zipWithIndex.map { case (w, i) =>
        s"CAST(embedding[${i + 1}] AS DOUBLE) * ($w)" }.mkString(" + ")
      s"SELECT vec_id, CAST($c AS INT) AS c, round($sum, 6) AS v " +
        "FROM embeddings"
    }.mkString("", "\nUNION ALL\n", "\nORDER BY vec_id, c")
  }

  /** transformWithState MapState histograms
    * ([[graft.streaming.StreamingOps.categoryCounts]]): a real
    * two-micro-batch stream maintaining per-user event-type counts as
    * map state; each batch re-emits a touched key's full histogram,
    * so the final snapshot per (user, type) — max, counts are
    * cumulative — must equal the full-history groupBy, the oracle. */
  val streamCategoryCounts: Q = (spark, dir) => {
    val st = new BasicStorage(spark)
    val out = java.nio.file.Files
      .createTempDirectory("graft_cc_q").toString
    val events = t(spark, dir, "events")
      .select(col("user_id"), col("event_id"), col("event_type"))
    st.write(events.filter(col("event_id") % 2 === 0).coalesce(1),
      s"$out/in", "parquet", "overwrite")
    events.filter(col("event_id") % 2 === 1)
      .coalesce(1).write.mode("append").parquet(s"$out/in")
    val stream = spark.readStream.schema(events.schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(s"$out/in")
    val counts = graft.streaming.StreamingOps.categoryCounts(
      stream.drop("event_id"), "user_id", "event_type")
    val prevShuffle = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "4")
    var q: org.apache.spark.sql.streaming.StreamingQuery = null
    try graft.streaming.StreamingOps.withRocksDbProvider(spark) {
      q = counts.toDF().writeStream.outputMode("append")
        .option("checkpointLocation", s"$out/cp")
        .format("parquet").start(s"$out/data")
      q.processAllAvailable()
    } finally {
      spark.conf.set("spark.sql.shuffle.partitions", prevShuffle)
      if (q != null) q.stop() // also on failure — don't leak the query
    }
    st.read(s"$out/data", "parquet")
      .groupBy(col("user_id"), col("category"))
      .agg(max(col("cnt")).as("cnt"))
      .orderBy("user_id", "category")
  }

  val streamCategoryCountsSql: String =
    """SELECT user_id, event_type AS category, count(*) AS cnt
      |FROM events GROUP BY user_id, event_type
      |ORDER BY user_id, category""".stripMargin

  /** Event-time timer expiry ([[graft.streaming.StreamingOps
    * .inactivityExpiry]]): a real stream where a far-future sentinel
    * pushes the watermark past every key's inactivity deadline, so
    * the TIMER path emits each user's final profile — which must
    * equal the full-history per-user aggregate, the oracle. The
    * watermark delay exceeds the data span so cross-batch staging
    * drops nothing. */
  val streamInactivity: Q = (spark, dir) => {
    val st = new BasicStorage(spark)
    val out = java.nio.file.Files
      .createTempDirectory("graft_inact_q").toString
    val events = t(spark, dir, "events").select("user_id", "ts", "event_id")
    st.write(events.filter(col("event_id") % 2 === 0).coalesce(1),
      s"$out/in", "parquet", "overwrite")
    events.filter(col("event_id") % 2 === 1)
      .coalesce(1).write.mode("append").parquet(s"$out/in")
    // far-future sentinel (fresh user): watermark = its ts − delay,
    // landing past every real deadline but before its own
    val inPath = new org.apache.hadoop.fs.Path(s"$out/in")
    val fs = inPath.getFileSystem(spark.sessionState.newHadoopConf())
    def parquetFiles = fs.listStatus(inPath)
      .filter(_.getPath.getName.endsWith(".parquet"))
    val before = parquetFiles.map(_.getPath.getName).toSet
    val prev = parquetFiles.map(_.getModificationTime).max
    events.orderBy("event_id").limit(1)
      .withColumn("user_id", lit(999999L))
      .withColumn("ts", col("ts") + expr("INTERVAL 4000 DAYS"))
      .coalesce(1).write.mode("append").parquet(s"$out/in")
    parquetFiles.filterNot(f => before(f.getPath.getName))
      .foreach(f => fs.setTimes(f.getPath, prev + 60000, -1))
    val stream = spark.readStream.schema(events.schema)
      .option("maxFilesPerTrigger", "1").parquet(s"$out/in")
    val expired = graft.streaming.StreamingOps.inactivityExpiry(
      stream.drop("event_id"), "user_id", "ts", gapSeconds = 1800,
      watermarkDelay = "3700 days")
    val prevShuffle = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "4")
    var q: org.apache.spark.sql.streaming.StreamingQuery = null
    try graft.streaming.StreamingOps.withRocksDbProvider(spark) {
      q = expired.toDF().writeStream.outputMode("append")
        .option("checkpointLocation", s"$out/cp")
        .format("parquet").start(s"$out/data")
      q.processAllAvailable()
    } finally {
      spark.conf.set("spark.sql.shuffle.partitions", prevShuffle)
      if (q != null) q.stop() // also on failure — don't leak the query
    }
    st.read(s"$out/data", "parquet")
      .filter(col("user_id") =!= 999999L)
      .select("user_id", "last_seen", "n_events")
      .orderBy("user_id")
  }

  val streamInactivitySql: String =
    """SELECT user_id, CAST(max(floor(epoch(ts))) AS BIGINT) AS last_seen,
      |  count(*) AS n_events
      |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin

  /** DESCRIBE DETAIL analogue (GraftLog.tableDetail): physical + log
    * facts of a managed table built with a controlled layout, so every
    * fact is a known constant — the oracle is that constant row
    * (size_bytes excluded: parquet encoding bytes are not a
    * cross-version contract). */
  val tableDetailQ: Q = (spark, dir) => {
    val st = new BasicStorage(spark)
    val path = java.nio.file.Files
      .createTempDirectory("graft_detail_q").toString + "/t"
    val c = t(spark, dir, "customer").coalesce(1)
    st.write(c, path, "delta", "overwrite")
    st.write(c.filter(col("c_custkey") <= 10).coalesce(1),
      path, "delta", "append")
    graft.storage.GraftLog.tableDetail(spark, path)
      .select(col("format"), col("num_files"), col("partition_columns"),
        col("num_operations"), col("last_operation"),
        // lock observability: null holder on an unlocked table is part
        // of the pinned contract (a non-null here would mean a
        // mutation leaked its lock)
        col("lock_holder_op"))
  }

  val tableDetailSql: String =
    """SELECT 'delta' AS format, CAST(2 AS BIGINT) AS num_files,
      |  '' AS partition_columns, CAST(2 AS BIGINT) AS num_operations,
      |  'WRITE' AS last_operation,
      |  CAST(NULL AS VARCHAR) AS lock_holder_op""".stripMargin

  /** End-to-end pretraining curation
    * ([[graft.examples.pretrain.PretrainPipeline.curate]]) declared as
    * ONE oracle-checked query: NFC normalize → quality filter → exact
    * dedup → near-dup dedup → duplicated-span drop → benchmark
    * decontamination → 64/16 context-window chunking → 512-token
    * packing, reported as the per-(shard, bin) packed summary. Any
    * stage diverging moves chunk_uids and repacks downstream bins, so
    * this one output pins the WHOLE chain against the identical chain
    * in DuckDB. The fuzzy stage is the PRODUCTION default —
    * word-3-shingle MinHash-LSH — which is oracle-mirrorable because
    * its verify stage computes EXACT shingle-set Jaccard on every
    * candidate: surfaced pairs equal the all-pairs SQL, subject only
    * to LSH candidate recall (≥ 1−10⁻³ per true pair at s = 0.8 with
    * 64/16 banding — the `q_jaccard_ngram` acceptance; char n-grams
    * would NOT work here: the synthetic corpus's tiny vocabulary makes
    * trigram sets near-identical corpus-wide, degenerating the LSH
    * buckets — the measured `q_setsim_join` low-entropy pathology,
    * word shingles restore discrimination). Two remaining portability
    * swaps, each demonstrated by its own declared query: the deflate
    * band is wide open (zlib output is JVM-only; pinned by
    * `UnicodeDeflateSpec` + `q_compress_ratio` instead), and packing
    * shards by `chunk_uid % 8` rather than xxhash64
    * (`q_sequence_pack`'s portability move). Eval slice =
    * doc_id % 10 == 0, as `q_decontaminate`. */
  val pretrainE2eQ: Q = (spark, dir) => {
    import graft.examples.pretrain.PretrainPipeline
    val docs = t(spark, dir, "documents").select("doc_id", "text")
    val (packed, _) = PretrainPipeline.curate(
      docs.filter(col("doc_id") % 10 =!= 0),
      docs.filter(col("doc_id") % 10 === 0),
      minQuality = 0.5, deflateBounds = (0.0, 1e9),
      jaccardThreshold = 0.8, maxDupFrac = 0.5, spanGram = 13,
      decontamGram = 8, chunkTokens = 64, overlapTokens = 16,
      packBudget = 512, shards = 8,
      shardExpr = Some(pmod(col("chunk_uid"), lit(8L))))
    packed.groupBy(col("shard"), col("bin"))
      .agg(count(lit(1)).as("n_chunks"),
        sum(col("n_tokens")).as("bin_tokens"))
      .orderBy("shard", "bin")
  }

  val pretrainE2eSql: String =
    """WITH train AS (
      |  SELECT doc_id, nfc_normalize(text) AS text
      |  FROM documents WHERE doc_id % 10 != 0),
      |q AS (
      |  SELECT doc_id, text FROM train
      |  WHERE round(
      |    least(CAST(len(string_split_regex(trim(lower(text)), '\s+')) AS DOUBLE) / 20.0, 1.0) * 0.4
      |    + (CASE WHEN (CAST(length(replace(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ', '')) AS DOUBLE)
      |                  / CAST(len(string_split_regex(trim(lower(text)), '\s+')) AS DOUBLE))
      |                 BETWEEN 3.0 AND 10.0
      |            THEN 1.0 ELSE 0.5 END) * 0.3
      |    + (1.0 - least(CAST(length(regexp_replace(text, '[\p{L}\p{N}\s]', '', 'g')) AS DOUBLE)
      |                   / CAST(greatest(length(text), 1) AS DOUBLE) * 5.0, 1.0)) * 0.3
      |  , 6) >= 0.5),
      |ex AS (
      |  SELECT doc_id, text FROM (
      |    SELECT doc_id, text, row_number() OVER (
      |      PARTITION BY regexp_replace(lower(trim(text)), '\s+', ' ', 'g')
      |      ORDER BY doc_id) AS rn
      |    FROM q) WHERE rn = 1),
      |gr AS (
      |  SELECT doc_id,
      |    list_distinct(CASE WHEN len(ts) >= 3
      |      THEN list_transform(generate_series(1, len(ts) - 2),
      |        i -> array_to_string(ts[i:i+2], ' '))
      |      ELSE [array_to_string(ts, ' ')] END) AS g
      |  FROM (SELECT doc_id,
      |          string_split_regex(trim(lower(text)), '\s+') AS ts
      |        FROM ex)),
      |fdrop AS (
      |  SELECT DISTINCT b.doc_id
      |  FROM gr a JOIN gr b ON a.doc_id < b.doc_id
      |  WHERE CAST(len(list_intersect(a.g, b.g)) AS DOUBLE) /
      |        CAST(len(a.g) + len(b.g) - len(list_intersect(a.g, b.g)) AS DOUBLE)
      |        >= 0.8),
      |fz AS (SELECT doc_id, text FROM ex
      |       WHERE doc_id NOT IN (SELECT doc_id FROM fdrop)),
      |sp_g AS (
      |  SELECT doc_id, array_to_string(ts[i:i+12], ' ') AS gram
      |  FROM (SELECT doc_id, ts, unnest(generate_series(1, len(ts) - 12)) AS i
      |        FROM (SELECT doc_id,
      |                string_split_regex(trim(lower(text)), '\s+') AS ts
      |              FROM fz)
      |        WHERE len(ts) >= 13)),
      |sp_c AS (SELECT doc_id,
      |           count(*) OVER (PARTITION BY gram) AS total FROM sp_g),
      |sp_drop AS (
      |  SELECT doc_id FROM (
      |    SELECT doc_id, count(*) AS n_spans,
      |      count(*) FILTER (WHERE total >= 2) AS n_dup
      |    FROM sp_c GROUP BY doc_id)
      |  WHERE round(CAST(n_dup AS DOUBLE) / n_spans, 6) > 0.5),
      |ds AS (SELECT doc_id, text FROM fz
      |       WHERE doc_id NOT IN (SELECT doc_id FROM sp_drop)),
      |tr_g AS (
      |  SELECT DISTINCT doc_id, gram FROM (
      |    SELECT doc_id, unnest(CASE WHEN len(ts) >= 8
      |      THEN list_transform(generate_series(1, len(ts) - 7),
      |        i -> array_to_string(ts[i:i+7], ' '))
      |      ELSE [array_to_string(ts, ' ')] END) AS gram
      |    FROM (SELECT doc_id,
      |            string_split_regex(trim(lower(text)), '\s+') AS ts
      |          FROM ds))),
      |ev_g AS (
      |  SELECT DISTINCT gram FROM (
      |    SELECT unnest(CASE WHEN len(ts) >= 8
      |      THEN list_transform(generate_series(1, len(ts) - 7),
      |        i -> array_to_string(ts[i:i+7], ' '))
      |      ELSE [array_to_string(ts, ' ')] END) AS gram
      |    FROM (SELECT string_split_regex(trim(lower(text)), '\s+') AS ts
      |          FROM documents WHERE doc_id % 10 = 0))),
      |contam AS (SELECT DISTINCT doc_id FROM tr_g JOIN ev_g USING (gram)),
      |cl AS (SELECT doc_id, text FROM ds
      |       WHERE doc_id NOT IN (SELECT doc_id FROM contam)),
      |ck AS (
      |  SELECT doc_id, CAST((start_pos - 1) // 48 AS INT) AS chunk_id,
      |    CAST(len(toks[start_pos : start_pos + 63]) AS BIGINT) AS n_tokens
      |  FROM (SELECT doc_id, toks,
      |          unnest(range(1, greatest(len(toks) - 16, 1) + 1, 48)) AS start_pos
      |        FROM (SELECT doc_id, string_split(
      |                regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ') AS toks
      |              FROM cl))),
      |pk AS (
      |  SELECT doc_id * 1048576 + chunk_id AS chunk_uid, n_tokens,
      |    (doc_id * 1048576 + chunk_id) % 8 AS shard
      |  FROM ck),
      |pc AS (
      |  SELECT shard, n_tokens,
      |    sum(n_tokens) OVER (PARTITION BY shard ORDER BY chunk_uid
      |      ROWS UNBOUNDED PRECEDING) AS cum
      |  FROM pk)
      |SELECT shard, CAST((cum - n_tokens) // 512 AS BIGINT) AS bin,
      |  count(*) AS n_chunks, CAST(sum(n_tokens) AS BIGINT) AS bin_tokens
      |FROM pc GROUP BY shard, bin ORDER BY shard, bin""".stripMargin

  /** Leakage-safe dataset split ([[graft.ops.Sampling
    * .leakageSafeSplit]]): duplicate clusters are atomic split units —
    * membership hashes on the GROUP label, so a near-dup pair can
    * never straddle the train/eval fence. Planted exact duplicates
    * (the doubled corpus of `q_dedup_exact`) make the pair graph
    * deterministic: pairs connect every same-normalized-text id pair,
    * so the min-label components the oracle can express as
    * `min(doc_id) OVER (PARTITION BY normalized_text)` equal the
    * propagation result exactly. Output pins per-split doc counts,
    * unit counts, and the id checksum — a single member on the wrong
    * side moves two aggregates. */
  val leakageSplitQ: Q = (spark, dir) => {
    val docs = t(spark, dir, "documents").select("doc_id", "text")
    val doubled = docs.unionByName(docs.select(
      (col("doc_id") + 1000000).as("doc_id"), col("text")))
    val hashed = doubled.select(col("doc_id"),
      graft.ops.Dedup.normalizedHash(col("text")).as("__h"))
    val pairs = hashed.alias("a").join(hashed.alias("b"),
        col("a.__h") === col("b.__h") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"))
    graft.ops.Sampling
      .leakageSafeSplit(doubled, "doc_id", pairs, 80, 10)
      .groupBy(col("split"))
      .agg(count(lit(1)).as("n_docs"),
        countDistinct(col("split_unit")).as("n_units"),
        sum(col("doc_id")).as("id_sum"))
      .orderBy("split")
  }

  val leakageSplitSql: String =
    """WITH doubled AS (
      |  SELECT doc_id, text FROM documents
      |  UNION ALL
      |  SELECT doc_id + 1000000 AS doc_id, text FROM documents),
      |lab AS (
      |  SELECT doc_id,
      |    min(doc_id) OVER (
      |      PARTITION BY regexp_replace(lower(trim(text)), '\s+', ' ', 'g'))
      |      AS unit
      |  FROM doubled),
      |s AS (
      |  SELECT doc_id, unit,
      |    CASE WHEN b < 80 THEN 'train'
      |         WHEN b < 90 THEN 'val'
      |         ELSE 'test' END AS split
      |  FROM (SELECT doc_id, unit,
      |          ((unit % 2147483648) * 2654435761 % 4294967296) % 100 AS b
      |        FROM lab))
      |SELECT split, count(*) AS n_docs,
      |  CAST(count(DISTINCT unit) AS BIGINT) AS n_units,
      |  CAST(sum(doc_id) AS BIGINT) AS id_sum
      |FROM s GROUP BY split ORDER BY split""".stripMargin

  /** ANN index persistence ([[graft.ops.AnnIndex]] +
    * [[Similarity.ivfPqFit]]/[[Similarity.ivfPqSearchWith]]): the
    * production vector-serving loop — fit ONCE, save the index (two
    * metadata-sized parquet dirs), load it back, serve a query batch
    * with encode + ADC work only. The declared query runs the whole
    * cycle; `OpsSpec` pins that the loaded index serves BIT-IDENTICAL
    * results to the in-memory one. No oracle (Spark-hash IVF seeding,
    * float centroid averages), rows-only. */
  val annIndexRoundtrip: Q = (spark, dir) => {
    val emb = t(spark, dir, "embeddings")
    val queries = emb.filter(col("vec_id") < 5)
      .select((col("vec_id") + 1000000).as("vec_id"), col("embedding"))
    val idxDir = java.nio.file.Files
      .createTempDirectory("graft_annidx_q").toString + "/idx"
    val idx = Similarity.ivfPqFit(emb, "vec_id", "embedding",
      nCentroids = 8, ivfIterations = 1, trainSampleMod = 4,
      m = 4, pqK = 8, pqIterations = 1)
    graft.ops.AnnIndex.save(spark, idxDir, idx)
    Similarity.ivfPqSearchWith(
        graft.ops.AnnIndex.load(spark, idxDir),
        queries, emb, "vec_id", "vec_id", "embedding",
        topK = 10, nProbe = 4, corpusSpill = 2)
      .orderBy("query_id", "rank")
  }

  /** Streaming ANN serving ([[graft.streaming.StreamingOps
    * .annSearchStream]] over a CODED index): the corpus is encoded
    * once ([[Similarity.ivfPqEncodeCorpus]]) and saved WITH the index
    * as one staged generation; a two-micro-batch query stream then
    * serves entirely from the stored small-int codes — no raw corpus
    * vector in any serving plan. No oracle (ANN family); stream ==
    * batch and coded == re-encoding are both spec-pinned
    * (StreamingOpsSpec / OpsSpec). */
  val streamAnn: Q = (spark, dir) => {
    val emb = t(spark, dir, "embeddings")
    val out = java.nio.file.Files
      .createTempDirectory("graft_annstream_q").toString
    val idx = Similarity.ivfPqFit(emb, "vec_id", "embedding",
      nCentroids = 8, ivfIterations = 1, trainSampleMod = 4,
      m = 4, pqK = 8, pqIterations = 1)
    graft.ops.AnnIndex.save(spark, s"$out/idx", idx,
      Some(Similarity.ivfPqEncodeCorpus(idx, emb, "vec_id", "embedding",
        corpusSpill = 2)))
    val queries = emb.filter(col("vec_id") < 10)
      .select((col("vec_id") + 1000000).as("vec_id"), col("embedding"))
    queries.filter(col("vec_id") < 1000005)
      .coalesce(1).write.parquet(s"$out/in")
    queries.filter(col("vec_id") >= 1000005)
      .coalesce(1).write.mode("append").parquet(s"$out/in")
    val stream = spark.readStream
      .schema(org.apache.spark.sql.types.StructType(queries.schema.fields))
      .option("maxFilesPerTrigger", "1")
      .parquet(s"$out/in")
    val q = graft.streaming.StreamingOps.annSearchStream(stream,
      s"$out/idx", "vec_id", "embedding", s"$out/results", s"$out/cp",
      topK = 10, nProbe = 4)
    try q.processAllAvailable()
    finally q.stop()
    spark.read.parquet(s"$out/results").orderBy("query_id", "rank")
  }

  /** Crawl-curation URL pass ([[graft.ops.Urls.canonicalize]] +
    * [[graft.ops.Sampling.reservoirPerGroup]]): per doc, three messy
    * variants of the same page URL (campaign-tagged, tracker-prefixed,
    * fragment-suffixed, mixed-case host) must collapse to ONE
    * canonical dedup key; the deduped page list is then capped at 3
    * representative pages per registrable domain by the deterministic
    * hash-rank reservoir — the FineWeb-style per-site cap that stops a
    * single domain from dominating a crawl slice. The canonicalize
    * regexp chain is RE2-portable by design, so the oracle runs the
    * SAME expressions in DuckDB (`\\1` backreference spelling is the
    * only dialect difference). */
  val urlDedupQ: Q = (spark, dir) => {
    import graft.ops.{Sampling, Urls}
    val base = concat(lit("https://"), col("source"), lit("-"),
      col("lang"), lit(".COM/docs/"), col("doc_id").cast("string"))
    val variants = t(spark, dir, "documents")
      .select(col("doc_id"), explode(array(
        concat(base, lit("?lang="), col("lang"),
          lit("&utm_campaign=news#sec")),
        concat(base, lit("?utm_source=feed&lang="), col("lang")),
        concat(base, lit("?lang="), col("lang"), lit("#top"))))
        .as("url"))
    val deduped = variants
      .select(col("doc_id"), Urls.canonicalize(col("url")).as("curl"))
      .groupBy(col("curl"))
      .agg(min(col("doc_id")).as("doc_id"),
        count(lit(1)).as("n_variants"))
      .withColumn("domain", Urls.registeredDomain(col("curl")))
    Sampling.reservoirPerGroup(deduped, "domain", "doc_id", 3)
      .join(deduped, Seq("domain", "doc_id"))
      .select("domain", "curl", "doc_id", "n_variants")
      .orderBy("domain", "curl")
  }

  val urlDedupSql: String =
    """WITH v AS (
      |  SELECT doc_id, unnest([
      |      base || '?lang=' || lang || '&utm_campaign=news#sec',
      |      base || '?utm_source=feed&lang=' || lang,
      |      base || '?lang=' || lang || '#top']) AS url
      |  FROM (SELECT doc_id, lang,
      |          'https://' || source || '-' || lang || '.COM/docs/' ||
      |            CAST(doc_id AS VARCHAR) AS base
      |        FROM documents)),
      |c AS (
      |  SELECT doc_id,
      |    regexp_replace(
      |      regexp_replace(regexp_replace(regexp_replace(
      |        regexp_replace(
      |          regexp_replace(
      |            lower(regexp_extract(url, '^([^/]*//[^/?#]*)', 1)) ||
      |              regexp_replace(url, '^[^/]*//[^/?#]*', '', 'g'),
      |            '#.*$', '', 'g'),
      |          '(?i)([?&])(?:utm_[a-z]+|fbclid|gclid)=[^&#]*', '\1', 'g'),
      |        '&&+', '&', 'g'), '\?&', '?', 'g'), '[?&]+$', '', 'g'),
      |      '([^/])/$', '\1', 'g') AS curl
      |  FROM v),
      |d AS (
      |  SELECT curl, min(doc_id) AS doc_id, count(*) AS n_variants
      |  FROM c GROUP BY curl),
      |dom AS (
      |  SELECT curl, doc_id, n_variants,
      |    regexp_extract(
      |      regexp_extract(curl, '^[^/]*//([^/?#]*)', 1),
      |      '([^.]+\.[^.]+)$', 1) AS domain
      |  FROM d),
      |kept AS (
      |  SELECT domain, doc_id FROM (
      |    SELECT domain, doc_id,
      |      row_number() OVER (PARTITION BY domain
      |        ORDER BY ((doc_id % 2147483648) * 2654435761
      |                   % 4294967296) % 1000000, doc_id) AS rn
      |    FROM dom) WHERE rn <= 3)
      |SELECT domain, curl, doc_id, n_variants
      |FROM dom JOIN kept USING (domain, doc_id)
      |ORDER BY domain, curl""".stripMargin

  /** Continuous-ingest dedup STREAM ([[graft.streaming.StreamingOps
    * .ingestDedupStream]]): a real two-micro-batch file stream feeds a
    * managed corpus; every batch carries planted CLONES of corpus
    * texts under new ids, which the per-batch index anti-join must
    * drop while fresh texts append. Determinism by construction: the
    * input is first reduced to one representative per normalized text
    * (so no same-text pair exists WITHIN the stream — cross-batch
    * arrival order cannot change survivors), and every clone's text is
    * already in the base corpus (dropped regardless of batch order).
    * The final corpus is then exactly the unique-text representative
    * set — which is the oracle — and per-source id checksums pin
    * survivor identity, not just counts. */
  val streamIngestDedup: Q = (spark, dir) => {
    val st = new BasicStorage(spark)
    val out = java.nio.file.Files
      .createTempDirectory("graft_ingestdedup_q").toString
    val docs = t(spark, dir, "documents").select("doc_id", "text", "source")
    val uniq = graft.ops.Dedup.exactDeterministic(
        docs.withColumn("__t",
          graft.ops.Dedup.normalizedHash(col("text"))),
        Seq("__t"), "doc_id")
      .drop("__t")
    val base = uniq.filter(col("doc_id") % 3 === 0)
    st.write(base, s"$out/corpus", "delta", "overwrite")
    def clones(of: org.apache.spark.sql.DataFrame, offset: Long) =
      of.select((col("doc_id") + offset).as("doc_id"),
        col("text"), col("source"))
    uniq.filter(col("doc_id") % 3 === 1)
      .unionByName(clones(base.filter(col("doc_id") % 2 === 0), 1000000L))
      .coalesce(1).write.parquet(s"$out/in")
    uniq.filter(col("doc_id") % 3 === 2)
      .unionByName(clones(base.filter(col("doc_id") % 2 =!= 0), 2000000L))
      .coalesce(1).write.mode("append").parquet(s"$out/in")
    val stream = spark.readStream
      .schema(org.apache.spark.sql.types.StructType(base.schema.fields))
      .option("maxFilesPerTrigger", "1")
      .parquet(s"$out/in")
    val q = graft.streaming.StreamingOps.ingestDedupStream(
      st, stream, s"$out/corpus", "doc_id", "text", s"$out/cp")
    try q.processAllAvailable()
    finally q.stop()
    st.read(s"$out/corpus", "delta")
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"), sum(col("doc_id")).as("id_sum"))
      .orderBy("source")
  }

  val streamIngestDedupSql: String =
    """WITH uniq AS (
      |  SELECT doc_id, source FROM (
      |    SELECT doc_id, source, row_number() OVER (
      |      PARTITION BY regexp_replace(lower(trim(text)), '\s+', ' ', 'g')
      |      ORDER BY doc_id) AS rn
      |    FROM documents) WHERE rn = 1)
      |SELECT source, count(*) AS n_docs,
      |  CAST(sum(doc_id) AS BIGINT) AS id_sum
      |FROM uniq GROUP BY source ORDER BY source""".stripMargin

  /** Continuous-ingest NEAR-dup dedup STREAM
    * ([[graft.streaming.StreamingOps.ingestNearDedupStream]]): a real
    * three-micro-batch file stream bootstraps a corpus + persisted
    * MinHash-LSH index from batch 1, then appends one `inc-N` index
    * generation per batch — batch 3's planted near-clones of batch-2
    * docs are caught ONLY if the appended generation actually serves.
    * Order is forced (one file per batch, ascending mtimes).
    * Oracle-checked on the q_neardedup_indexed acceptance: the verify
    * stage is exact word-trigram Jaccard, so the survivor set equals
    * the two-level all-pairs SQL (batch-2 survivors vs batch 1;
    * batch-3 survivors vs batch 1 ∪ batch-2 survivors), subject only
    * to LSH candidate recall (clones sit at jac ≈ 0.97). Exact-dup
    * structure is clone-free by construction (every text is a unique
    * representative or a suffixed clone), so the SQL needs no exact
    * stage. */
  val streamIngestNearDedup: Q = (spark, dir) => {
    val st = new BasicStorage(spark)
    val out = java.nio.file.Files
      .createTempDirectory("graft_ingestnear_q").toString
    val docs = t(spark, dir, "documents").select("doc_id", "text", "source")
    val uniq = graft.ops.Dedup.exactDeterministic(
        docs.withColumn("__t",
          graft.ops.Dedup.normalizedHash(col("text"))),
        Seq("__t"), "doc_id")
      .drop("__t")
    def clones(of: org.apache.spark.sql.DataFrame, offset: Long) =
      of.select((col("doc_id") + offset).as("doc_id"),
        concat(col("text"), lit(" extra")).as("text"), col("source"))
    val b1 = uniq.filter(col("doc_id") < 300)
    val b2 = uniq.filter(col("doc_id") >= 300 && col("doc_id") < 400)
      .unionByName(clones(uniq.filter(col("doc_id") < 30), 1000000L))
    val b3 = uniq.filter(col("doc_id") >= 400)
      .unionByName(clones(
        uniq.filter(col("doc_id") >= 300 && col("doc_id") < 330),
        2000000L))
    val inPath = new org.apache.hadoop.fs.Path(s"$out/in")
    val fs = inPath.getFileSystem(spark.sessionState.newHadoopConf())
    var stamped = Set.empty[String]
    Seq(b1, b2, b3).zipWithIndex.foreach { case (b, i) =>
      b.coalesce(1).write.mode("append").parquet(s"$out/in")
      fs.listStatus(inPath).map(_.getPath)
        .filter(p => p.getName.endsWith(".parquet") && !stamped(p.getName))
        .foreach { p =>
          fs.setTimes(p, 1000000000000L + i * 60000L, -1)
          stamped += p.getName
        }
    }
    val stream = spark.readStream
      .schema(org.apache.spark.sql.types.StructType(b1.schema.fields))
      .option("maxFilesPerTrigger", "1")
      .parquet(s"$out/in")
    val q = graft.streaming.StreamingOps.ingestNearDedupStream(
      st, stream, s"$out/corpus", s"$out/idx", "doc_id", "text",
      s"$out/cp", jaccardThreshold = 0.8)
    try q.processAllAvailable()
    finally q.stop()
    st.read(s"$out/corpus", "delta")
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"), sum(col("doc_id")).as("id_sum"))
      .orderBy("source")
  }

  private val ingestGramSql: String =
    """list_distinct(CASE WHEN len(ts) >= 3
      |      THEN list_transform(generate_series(1, len(ts) - 2),
      |        i -> array_to_string(ts[i:i+2], ' '))
      |      ELSE [array_to_string(ts, ' ')] END)""".stripMargin

  val streamIngestNearDedupSql: String =
    s"""WITH uniq AS (
      |  SELECT doc_id, text, source FROM (
      |    SELECT doc_id, text, source, row_number() OVER (
      |      PARTITION BY regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')
      |      ORDER BY doc_id) AS rn
      |    FROM documents) WHERE rn = 1),
      |b1 AS (SELECT doc_id, text, source FROM uniq WHERE doc_id < 300),
      |b2 AS (
      |  SELECT doc_id, text, source FROM uniq
      |  WHERE doc_id >= 300 AND doc_id < 400
      |  UNION ALL
      |  SELECT doc_id + 1000000, text || ' extra', source FROM uniq
      |  WHERE doc_id < 30),
      |b3 AS (
      |  SELECT doc_id, text, source FROM uniq WHERE doc_id >= 400
      |  UNION ALL
      |  SELECT doc_id + 2000000, text || ' extra', source FROM uniq
      |  WHERE doc_id >= 300 AND doc_id < 330),
      |g1 AS (
      |  SELECT doc_id, $ingestGramSql AS g
      |  FROM (SELECT doc_id,
      |          string_split_regex(trim(lower(text)), '\\s+') AS ts
      |        FROM b1)),
      |g2 AS (
      |  SELECT doc_id, $ingestGramSql AS g
      |  FROM (SELECT doc_id,
      |          string_split_regex(trim(lower(text)), '\\s+') AS ts
      |        FROM b2)),
      |drop2 AS (
      |  SELECT DISTINCT i.doc_id
      |  FROM g2 i JOIN g1 b ON
      |    CAST(len(list_intersect(i.g, b.g)) AS DOUBLE) /
      |    CAST(len(i.g) + len(b.g) - len(list_intersect(i.g, b.g)) AS DOUBLE)
      |    >= 0.8),
      |s2 AS (SELECT * FROM b2
      |  WHERE doc_id NOT IN (SELECT doc_id FROM drop2)),
      |c2 AS (SELECT * FROM b1 UNION ALL SELECT * FROM s2),
      |gc2 AS (
      |  SELECT doc_id, $ingestGramSql AS g
      |  FROM (SELECT doc_id,
      |          string_split_regex(trim(lower(text)), '\\s+') AS ts
      |        FROM c2)),
      |g3 AS (
      |  SELECT doc_id, $ingestGramSql AS g
      |  FROM (SELECT doc_id,
      |          string_split_regex(trim(lower(text)), '\\s+') AS ts
      |        FROM b3)),
      |drop3 AS (
      |  SELECT DISTINCT i.doc_id
      |  FROM g3 i JOIN gc2 b ON
      |    CAST(len(list_intersect(i.g, b.g)) AS DOUBLE) /
      |    CAST(len(i.g) + len(b.g) - len(list_intersect(i.g, b.g)) AS DOUBLE)
      |    >= 0.8),
      |s3 AS (SELECT * FROM b3
      |  WHERE doc_id NOT IN (SELECT doc_id FROM drop3)),
      |final AS (SELECT * FROM c2 UNION ALL SELECT * FROM s3)
      |SELECT source, count(*) AS n_docs,
      |  CAST(sum(doc_id) AS BIGINT) AS id_sum
      |FROM final GROUP BY source ORDER BY source""".stripMargin

  /** Debris vacuum ([[graft.storage.Maintenance.vacuum]]): a managed
    * table is planted with one instance of every debris class a
    * crashed swap can leave (COW staging + aside beside the root,
    * sidecar staging + stale aside, an orphaned index generation, an
    * aside whose live dir is GONE — the heal case — plus two
    * marker-less change batches: one stamped past the orphan age
    * horizon (genuinely dead — fenced then swept) and one fresh
    * (indistinguishable from a live in-flight capture — skip-reported
    * and left alone, the guard that keeps a vacuum cron from silently
    * diverging a replica)), dry-run listed, vacuumed, force-vacuumed
    * (age 0), and re-vacuumed. The oracle pins the planned action
    * counts per kind, that the heal restored rather than deleted,
    * that the young batch survived the default sweep, the post-vacuum
    * residual (zero), and that live data is untouched. */
  val vacuumQ: Q = (spark, dir) => {
    val st = new BasicStorage(spark)
    val out = java.nio.file.Files
      .createTempDirectory("graft_vacuum_q").toString
    val path = s"$out/t"
    st.write(t(spark, dir, "customer")
        .filter(col("c_custkey") <= 100)
        .select("c_custkey", "c_name", "c_acctbal"),
      path, "delta", "overwrite")
    graft.storage.MorDelete.deleteWhere(spark, st, path,
      "c_custkey = 1", Seq("c_custkey"))
    def plant(p: String): Unit = {
      new java.io.File(p).mkdirs()
      java.nio.file.Files.write(
        java.nio.file.Paths.get(p, "junk.parquet"), Array[Byte](1))
    }
    plant(s"${path}__graft_tmp")         // crashed COW staging
    plant(s"${path}__graft_old")         // post-swap aside debris
    plant(s"$path/_graft_tombstones__tmp") // sidecar staging
    plant(s"$path/_graft_tombstones__old") // stale sidecar aside
    plant(s"$path/_myindex/inc-1__tmp/bands") // crashed index append
    plant(s"$path/_aux__old")            // orphaned aside → heal
    val changes = s"$path/${graft.storage.Merge.ChangesDirName}"
    // dead capture: marker-less, stamped 25 h ago — past the 24 h
    // default horizon, so it is crash debris (fence + sweep)
    val oldStamp =
      (System.currentTimeMillis() - 25L * 3600 * 1000) * 1000000L
    plant(s"$changes/batch=$oldStamp")
    // live capture mid-flight: fresh stamp, marker lands last by
    // design — a racing vacuum must NOT sweep it
    val young = System.currentTimeMillis() * 1000000L // fresh stamp
    plant(s"$changes/batch=$young")
    val plan = graft.storage.Maintenance.vacuum(spark, path,
      dryRun = true)
    val dryIntact = // the dry run must not have touched anything
      new java.io.File(s"${path}__graft_tmp").exists() &&
      new java.io.File(s"$path/_graft_tombstones__old").exists()
    graft.storage.Maintenance.vacuum(spark, path)
    val healed = new java.io.File(s"$path/_aux").exists() &&
      !new java.io.File(s"$path/_aux__old").exists()
    val youngSurvived = // the in-flight capture outlives the sweep...
      new java.io.File(s"$changes/batch=$young").exists() &&
      !new java.io.File(s"$changes/batch=$oldStamp").exists()
    // ...until an operator who KNOWS no capture is in flight forces
    // the sweep (age 0) — then it too is fenced and removed
    graft.storage.Maintenance.vacuum(spark, path,
      orphanMinAgeMs = Some(0L))
    val forcedSwept = !new java.io.File(s"$changes/batch=$young").exists()
    val residual = graft.storage.Maintenance.vacuum(spark, path).size
    st.read(path, "delta")
      .agg(count(lit(1)).as("rows_after"),
        sum(col("c_custkey")).as("key_sum"))
      .withColumn("n_planned", lit(plan.size.toLong))
      .withColumn("n_heals", lit(plan.count(_.kind == "heal").toLong))
      .withColumn("n_skips", lit(plan.count(_.kind == "skip").toLong))
      .withColumn("n_fences", lit(plan.count(_.kind == "fence").toLong))
      .withColumn("dry_run_intact", lit(dryIntact))
      .withColumn("healed_restored", lit(healed))
      .withColumn("young_survived", lit(youngSurvived))
      .withColumn("forced_swept", lit(forcedSwept))
      .withColumn("n_residual", lit(residual.toLong))
  }

  val vacuumSql: String =
    """SELECT count(*) AS rows_after,
      |  CAST(sum(c_custkey) AS BIGINT) AS key_sum,
      |  CAST(9 AS BIGINT) AS n_planned, CAST(1 AS BIGINT) AS n_heals,
      |  CAST(1 AS BIGINT) AS n_skips, CAST(1 AS BIGINT) AS n_fences,
      |  TRUE AS dry_run_intact, TRUE AS healed_restored,
      |  TRUE AS young_survived, TRUE AS forced_swept,
      |  CAST(0 AS BIGINT) AS n_residual
      |FROM customer WHERE c_custkey <= 100""".stripMargin

  // ---------------------------------------------------------- registry

  /** name → (spark query, optional oracle SQL) */
  def all: Map[String, (Q, Option[String])] = Map(
    entry("q_stream_ingest_neardedup", streamIngestNearDedup,
      streamIngestNearDedupSql),
    entry("q_vacuum", vacuumQ, vacuumSql),
    entry("customer_summary", customerSummary, customerSummarySql),
    entry("q_select_project", selectProject,
      """SELECT l_orderkey, l_linenumber, l_quantity, l_returnflag
        |FROM lineitem ORDER BY l_orderkey, l_linenumber""".stripMargin),
    entry("q_filter_string", filterString,
      """SELECT l_orderkey, l_linenumber, l_quantity, l_discount
        |FROM lineitem WHERE l_quantity > 30 AND l_returnflag = 'R'
        |ORDER BY l_orderkey, l_linenumber""".stripMargin),
    entry("q_withcolumn_cast", withColumnCast,
      """SELECT l_orderkey, l_linenumber,
        |  CAST(l_extendedprice * (1 - l_discount) AS REAL) AS revenue,
        |  strftime(l_shipdate, '%Y-%m-%d') AS ship_date
        |FROM lineitem ORDER BY l_orderkey, l_linenumber""".stripMargin),
    entry("q_rename_case_isin", renameCase,
      """SELECT o_orderkey, o_totalprice AS total_price,
        |  CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 'urgent'
        |       WHEN o_orderpriority = '3-MEDIUM' THEN 'normal'
        |       ELSE 'low' END AS priority_class,
        |  CAST(NULL AS DOUBLE) AS null_fill
        |FROM orders ORDER BY o_orderkey""".stripMargin),
    entry("q_join_inner", joinInner,
      """SELECT o_orderkey, o_custkey, c_name, o_totalprice
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |ORDER BY o_orderkey""".stripMargin),
    entry("q_join_left", joinLeft,
      """SELECT c_custkey, c_name, n_name
        |FROM customer LEFT JOIN nation ON c_nationkey = n_nationkey
        |ORDER BY c_custkey""".stripMargin),
    entry("q_join_full", joinFull, joinFullSql),
    entry("q_table_diff", tableDiff, tableDiffSql),
    entry("q_fuzzy_match", fuzzyMatch, fuzzyMatchSql),
    entry("q_cross_join", crossJoin, crossJoinSql),
    entry("q_semi_join", semiJoin,
      """SELECT c_custkey, c_name FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders
        |  WHERE o_custkey = c_custkey AND o_totalprice > 400000)
        |ORDER BY c_custkey""".stripMargin),
    entry("q_anti_join", antiJoin,
      """SELECT c_custkey, c_name FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders
        |  WHERE o_custkey = c_custkey AND o_totalprice > 400000)
        |ORDER BY c_custkey""".stripMargin),
    entry("q_merge_upsert", mergeUpsert, mergeUpsertSql),
    entry("q_merge_partitioned", mergeUpsertPartitioned, mergeUpsertSql),
    entry("q_merge_delete", mergeDelete, mergeDeleteSql),
    entry("q_concurrent_merge", concurrentMerge, concurrentMergeSql),
    entry("q_clone", cloneTable, cloneTableSql),
    entry("q_alter_table", alterTable, alterTableSql),
    entry("q_alter_mapped", alterMapped, alterMappedSql),
    entry("q_merge_cdf", mergeCdf, mergeCdfSql),
    entry("q_cdf_replay", cdfReplay, mergeDeleteSql),
    entry("q_stream_cdf_replicate", streamCdfReplicate, mergeDeleteSql),
    entry("q_groupby_agg", groupbyAgg, groupbyAggSql),
    entry("q_rollup", rollupAgg, rollupAggSql),
    entry("q_cube", cubeAgg, cubeAggSql),
    entry("q_grouping_sets", groupingSetsAgg, groupingSetsAggSql),
    entry("q_histogram", histogram, histogramSql),
    entry("q_corr_stats", corrStats, corrStatsSql),
    entry("q_json_extract", jsonExtract, jsonExtractSql),
    entry("q_string_functions", stringFunctions, stringFunctionsSql),
    entry("q_percentile", percentileAgg, percentileAggSql),
    entry("q_array_agg", arrayAgg, arrayAggSql),
    entry("q_salted_join", saltedJoin, saltedJoinSql),
    entry("q_global_agg", globalAgg, globalAggSql),
    entry("q_count_distinct", countDistinctQ, countDistinctSql),
    entry("q_approx_distinct", approxDistinct),
    entry("q_topk", topK, topKSql),
    entry("q_union_by_name", unionByNameQ, unionByNameSql),
    entry("q_except", exceptQ, exceptSql),
    entry("q_intersect", intersectQ, intersectSql),
    entry("q_except_all", exceptAllQ, exceptAllSql),
    entry("q_intersect_all", intersectAllQ, intersectAllSql),
    entry("q_window_dist", windowDistQ, windowDistSql),
    entry("q_date_functions", dateFunctions, dateFunctionsSql),
    entry("q_date_arith", dateArith, dateArithSql),
    entry("q_array_functions", arrayFunctions, arrayFunctionsSql),
    entry("q_struct_functions", structFunctions, structFunctionsSql),
    entry("q_map_functions", mapFunctions, mapFunctionsSql),
    entry("q_url_parse", urlParse, urlParseSql),
    entry("q_entropy_filter", entropyFilterQ, entropyFilterSql),
    entry("q_resample", resampleQ, resampleSql),
    entry("q_forward_fill", forwardFillQ, forwardFillSql),
    entry("q_column_profile", columnProfile, columnProfileSql),
    entry("q_funnel", funnelQ, funnelSql),
    entry("q_cohort_retention", cohortRetentionQ, cohortRetentionSql),
    entry("q_outliers", outliersQ, outliersSql),
    entry("q_unpivot", unpivotQ, unpivotSql),
    entry("q_unigram_logprob", unigramLogprobQ, unigramLogprobSql),
    entry("q_session_window_batch", sessionWindowBatch,
      sessionWindowBatchSql),
    entry("q_table_history", tableHistory, tableHistorySql),
    entry("q_expectations", expectationsQ, expectationsSql),
    entry("q_referential", referentialQ, referentialSql),
    entry("q_mad_outliers", madOutliersQ, madOutliersSql),
    entry("q_reservoir_sample", reservoirSampleQ, reservoirSampleSql),
    entry("q_cumulative_users", cumulativeUsersQ, cumulativeUsersSql),
    entry("q_rolling_active", rollingActiveQ, rollingActiveSql),
    entry("q_window_topk_batch", windowTopKBatch, windowTopKBatchSql),
    entry("q_asof_join", asofJoin, asofJoinSql),
    entry("q_asof_forward", asofForward, asofForwardSql),
    entry("q_asof_nearest", asofNearest, asofNearestSql),
    entry("q_sessionize", sessionize, sessionizeSql),
    entry("q_window_rownum", windowRowNumber, windowRowNumberSql),
    entry("q_window_lag", windowLag, windowLagSql),
    entry("q_window_frame", windowFrame, windowFrameSql),
    entry("q_dedup_exact", dedupExact, dedupExactSql),
    entry("q_dedup_hash", dedupHash, dedupHashSql),
    entry("q_minhash_dedup", minhashDedup),
    entry("q_dedup_groups", dedupGroups, dedupGroupsSql),
    entry("q_simhash_dedup", simhashDedup),
    entry("q_cosine_topk", cosineTopK, cosineTopKSql),
    entry("q_knn_label", knnLabel, knnLabelSql),
    entry("q_embedding_centroid", embeddingCentroid, embeddingCentroidSql),
    entry("q_embedding_neardup", embeddingNearDup, embeddingNearDupSql),
    entry("q_ann_lsh", annLsh),
    entry("q_ann_ivf", annIvf),
    entry("q_ann_ivfpq", annIvfPq),
    entry("q_ann_index_roundtrip", annIndexRoundtrip),
    entry("q_stream_ann", streamAnn),
    entry("q_text_stats", textStats, textStatsSql),
    entry("q_top_terms", topTerms, topTermsSql),
    entry("q_explode_pos", explodePos, explodePosSql),
    entry("q_fingerprint", fingerprintQ, fingerprintSql),
    entry("q_orc_roundtrip", orcRoundtrip, orcRoundtripSql),
    entry("q_json_roundtrip", jsonRoundtrip, jsonRoundtripSql),
    entry("q_csv_roundtrip", csvRoundtrip, csvRoundtripSql),
    entry("q_schema_evolution", schemaEvolution, schemaEvolutionSql),
    entry("q_hash_sample", hashSample, hashSampleSql),
    entry("q_stratified_sample", stratifiedSample, stratifiedSampleSql),
    entry("q_domain_mixture", domainMixture, domainMixtureSql),
    entry("q_upsample_mixture", upsampleMixtureQ, upsampleMixtureSql),
    entry("q_length_band", lengthBand, lengthBandSql),
    entry("q_line_dedup", lineDedup, lineDedupSql),
    entry("q_dedup_incremental", dedupIncremental, dedupIncrementalSql),
    entry("q_dedup_indexed", dedupIndexed, dedupIndexedSql),
    entry("q_neardedup_incremental", nearDedupIncremental),
    entry("q_neardedup_indexed", nearDedupIndexed, nearDedupIndexedSql),
    entry("q_boilerplate_filter", boilerplateFilter, boilerplateFilterSql),
    entry("q_vocab_build", vocabBuild, vocabBuildSql),
    entry("q_tfidf", tfidfQ, tfidfSql),
    entry("q_window_sliding_batch", windowSlidingBatch,
      windowSlidingBatchSql),
    entry("q_sessionize_stateful", sessionizeStateful,
      sessionizeStatefulSql),
    entry("q_window_ranks", windowRanks, windowRanksSql),
    entry("q_minmax_by", minmaxBy, minmaxBySql),
    entry("q_regexp_functions", regexpFunctions, regexpFunctionsSql),
    entry("q_null_handling", nullHandling, nullHandlingSql),
    entry("q_top_terms_per_lang", topTermsPerLang, topTermsPerLangSql),
    entry("q_interval_join_batch", intervalJoinBatch, intervalJoinBatchSql),
    entry("q_jaccard_ngram", jaccardNgram, jaccardNgramSql),
    entry("q_repetition_filter", repetitionFilter, repetitionFilterSql),
    entry("q_decontaminate", decontaminate, decontaminateSql),
    entry("q_sequence_pack", sequencePack, sequencePackSql),
    entry("q_embedding_quantize", embeddingQuantize, embeddingQuantizeSql),
    entry("q_data_skipping", dataSkipping, dataSkippingSql),
    entry("q_optimize", optimizeTable, optimizeTableSql),
    entry("q_optimize_where", optimizeWhere, optimizeWhereSql),
    entry("q_bucketed_join", bucketedJoin, bucketedJoinSql),
    entry("q_delete_where", deleteWhere, deleteWhereSql),
    entry("q_zorder", zorderTable, zorderTableSql),
    entry("q_range_join", rangeJoin, rangeJoinSql),
    entry("q_bloom_join", bloomJoin, bloomJoinSql),
    entry("q_corpus_stats", corpusStats, corpusStatsSql),
    entry("q_pivot_events", pivotEvents, pivotEventsSql),
    entry("q_lang_filter", langFilter, langFilterSql),
    entry("q_quality_filter", qualityFilter, qualityFilterSql),
    entry("q_token_budget", tokenBudget, tokenBudgetSql),
    entry("q_doc_chunks", docChunks, docChunksSql),
    entry("q_ngram_counts", ngramCountsQ, ngramCountsSql),
    entry("q_term_ids", termIdsQ, termIdsSql),
    entry("q_pii_redact", piiRedact, piiRedactSql),
    entry("q_lang_predict", langPredict),
    entry("q_multimodal_meta", multimodalMeta, multimodalMetaSql),
    entry("q_multimodal_features", multimodalFeatures),
    entry("q_multimodal_resize", multimodalResize, multimodalResizeSql),
    entry("q_stream_passthrough", streamPassthrough, streamPassthroughSql),
    entry("q_stream_static_join", streamStaticJoin, streamStaticJoinSql),
    entry("q_stream_window", streamWindow),
    entry("q_window_tumbling_batch", windowTumblingBatch,
      windowTumblingBatchSql),
    entry("q_stream_dedup", streamDedup, streamDedupSql),
    entry("q_stream_dedup_watermark", streamDedupWatermark,
      streamDedupWatermarkSql),
    entry("q_stream_merge", streamMerge, streamMergeSql),
    entry("q_stream_matview", streamMatview, streamMatviewSql),
    entry("q_sketch_quantile", sketchRollup),
    entry("q_hll_rollup", hllRollup),
    entry("q_bm25", bm25Q, bm25Sql),
    entry("q_global_index", globalIndexQ, globalIndexSql),
    entry("q_incremental_agg", incrementalAggQ, incrementalAggSql),
    entry("q_state_refresh", stateRefreshQ, stateRefreshSql),
    entry("q_matview", matviewQ, matviewSql),
    entry("q_matview_multi", matviewMultiQ, matviewMultiSql),
    entry("q_maintenance_lag", maintenanceLagQ, maintenanceLagSql),
    entry("q_log_compact", logCompactQ, logCompactSql),
    entry("q_bm25_multi", bm25MultiQ, bm25MultiSql),
    entry("q_heavy_hitters", heavyHittersQ, heavyHittersSql),
    entry("q_inverted_index", invertedIndexQ, invertedIndexSql),
    entry("q_transition_counts", transitionCountsQ, transitionCountsSql),
    entry("q_pagerank", pageRankQ, pageRankSql),
    entry("q_kmeans", kmeansQ, kmeansSql),
    entry("q_ewma", ewmaQ, ewmaSql),
    entry("q_bpe_pairs", bpePairsQ, bpePairsSql),
    entry("q_tfidf_cosine", tfidfCosineQ, tfidfCosineSql),
    entry("q_semdedup", semDedupQ, semDedupSql),
    entry("q_dataset_split", datasetSplitQ, datasetSplitSql),
    entry("q_temperature_sample", temperatureSampleQ, temperatureSampleSql),
    entry("q_window_quantile_batch", windowQuantileBatch,
      windowQuantileBatchSql),
    entry("q_tpch_q3", tpchQ3, tpchQ3Sql),
    entry("q_tpch_q5", tpchQ5, tpchQ5Sql),
    entry("q_tpch_q10", tpchQ10, tpchQ10Sql),
    entry("q_json_typed", jsonTyped, jsonTypedSql),
    entry("q_attribution", attributionQ, attributionSql),
    entry("q_scd2", scd2Q, scd2Sql),
    entry("q_scd2_lookup", scd2LookupQ, scd2LookupSql),
    entry("q_k_anonymity", kAnonymityQ, kAnonymitySql),
    entry("q_weighted_sample", weightedSampleQ, weightedSampleSql),
    entry("q_setsim_join", setsimJoinQ, setsimJoinSql),
    entry("q_dup_spans", dupSpansQ, dupSpansSql),
    entry("q_unicode_normalize", unicodeNormalizeQ, unicodeNormalizeSql),
    entry("q_compress_ratio", compressRatioQ),
    entry("q_pq_encode", pqEncodeQ, pqEncodeSql),
    entry("q_pq_search", pqSearchQ),
    entry("q_bpe_encode", bpeEncodeQ),
    entry("q_seasonal", seasonalQ, seasonalSql),
    entry("q_linreg", linregQ, linregSql),
    entry("q_table_detail", tableDetailQ, tableDetailSql),
    entry("q_feature_scale", featureScaleQ, featureScaleSql),
    entry("q_embedding_cov", embeddingCovQ, embeddingCovSql),
    entry("q_pca_project", pcaProjectQ),
    entry("q_variant_json", variantJson, variantJsonSql),
    entry("q_interval_union", intervalUnionQ, intervalUnionSql),
    entry("q_stream_running_totals", streamRunningTotals,
      streamRunningTotalsSql),
    entry("q_collocations", collocationsQ, collocationsSql),
    entry("q_winsorize", winsorizeQ, winsorizeSql),
    entry("q_changepoint", changePointQ, changePointSql),
    entry("q_interval_join_left_batch", intervalJoinLeftBatch,
      intervalJoinLeftBatchSql),
    entry("q_stream_recent_features", streamRecentFeatures,
      streamRecentFeaturesSql),
    entry("q_random_projection", randomProjectionQ, randomProjectionSql),
    entry("q_stream_category_counts", streamCategoryCounts,
      streamCategoryCountsSql),
    entry("q_bloom_skipping", bloomSkipping, bloomSkippingSql),
    entry("q_delete_mor", deleteMorQ, deleteMorSql),
    entry("q_delete_cdf", deleteCdfQ, deleteCdfSql),
    entry("q_metadata_agg", metadataAggQ, metadataAggSql),
    entry("q_json_rescue", jsonRescue, jsonRescueSql),
    entry("q_wap", wapQ, wapSql),
    entry("q_attr_window_batch", attrWindowBatch, attrWindowBatchSql),
    entry("q_time_travel", timeTravelQ, timeTravelSql),
    entry("q_restore", restoreQ, restoreSql),
    entry("q_constraints", constraintsQ, constraintsSql),
    entry("q_tpch_q18", tpchQ18, tpchQ18Sql),
    entry("q_observe", observeQ, observeSql),
    entry("q_user_paths", userPathsQ, userPathsSql),
    entry("q_theta_sets", thetaSetsQ, thetaSetsSql),
    entry("q_stream_inactivity", streamInactivity, streamInactivitySql),
    entry("q_item_lift", itemLiftQ, itemLiftSql),
    entry("q_ab_test", abTestQ, abTestSql),
    entry("q_impute", imputeQ, imputeSql),
    entry("q_html_strip", htmlStripQ, htmlStripSql),
    entry("q_pretrain_e2e", pretrainE2eQ, pretrainE2eSql),
    entry("q_leakage_split", leakageSplitQ, leakageSplitSql),
    entry("q_url_dedup", urlDedupQ, urlDedupSql),
    entry("q_stream_ingest_dedup", streamIngestDedup, streamIngestDedupSql)
  )
}
