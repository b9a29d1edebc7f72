package graft.queries

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StructField, StructType, LongType}
import graft.core.{SnapshotStore, Tables}
import graft.ops._

/** Oracle-checked queries exercising the reference's standard-method
  * operator set (SURVEY §2.1) end-to-end: csvexport→csvimport→dataset_type
  * round-trips, sort order capture, hashpart integrity, merge, unroundrobin,
  * checksum invariance, and chain iteration with zone-map skipping.
  */
object Operators {

  private def tmpDir(sub: String): String = {
    val d = s"${sys.props("user.dir")}/target/qtmp/$sub"
    new java.io.File(d).mkdirs()
    d
  }

  /** Attach the physical row position after a sort — captures the *actual*
    * produced order (not a window re-derivation), so order bugs can't hide.
    */
  private def withPosition(df: DataFrame, posCol: String): DataFrame = {
    val schema = StructType(df.schema.fields :+ StructField(posCol, LongType, false))
    val rdd = df.rdd.zipWithIndex().map { case (r, i) => Row.fromSeq(r.toSeq :+ i) }
    df.sparkSession.createDataFrame(rdd, schema)
  }

  /** csvexport(nation) → csvimport → dataset_type == nation. */
  def csvRoundtrip(s: SparkSession, dir: String): DataFrame = {
    val path = tmpDir("csv_rt") + "/nation.csv"
    CsvExport(Tables.nation(s, dir), path,
      CsvExportConfig(quoteMode = "lazy", header = true))
    val imported = CsvImport(s, path).data
    DatasetType(imported, Map(
      "n_nationkey" -> "int32", "n_name" -> "unicode", "n_regionkey" -> "int32"
    )).good
  }

  /** Stringify lineitem columns in-flight, then dataset_type them back —
    * covers number, datetime:%fmt, garbage-tolerant int64i, strbool.
    */
  def datasetType(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(s, dir).select(
      col("l_orderkey"), col("l_linenumber"),
      col("l_quantity").cast("string").as("qty"),
      date_format(col("l_shipdate"), "yyyy-MM-dd HH:mm:ss").as("ship"),
      concat(lit("id="), col("l_orderkey"), lit(";end")).as("messy_id"),
      when(col("l_returnflag") === "R", "yes").otherwise("off").as("flag"))
    DatasetType(li, Map(
      "qty" -> "number",
      "ship" -> "datetime:%Y-%m-%d %H:%M:%S",
      "messy_id" -> "int64i",
      "flag" -> "strbool")).good
  }

  /** Round-2 spec families: numeric_comma floats, complex64, strip
    * variants, bits32/bits64 (unsigned), timezone-aware datetime, java
    * epoch millis — each value derived from a lineitem column and parsed
    * back, so the oracle is plain arithmetic on the original columns.
    */
  def datasetType2(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(s, dir).select(
      col("l_orderkey"), col("l_linenumber"),
      translate(col("l_quantity").cast("string"), ".", ",").as("qty_comma"),
      concat(col("l_orderkey"), lit("+"), col("l_linenumber"), lit("j")).as("cplx"),
      concat(lit("  "), col("l_returnflag"), lit(" \t")).as("flag_pad"),
      col("l_orderkey").cast("string").as("bkey"),
      col("l_linenumber").cast("string").as("bnum"),
      date_format(col("l_shipdate"), "yyyy-MM-dd HH:mm:ss").as("ship_local"),
      // l_shipdate is TIMESTAMP_NTZ; session TZ is UTC so the cast is the
      // identity instant
      unix_millis(col("l_shipdate").cast("timestamp")).cast("string").as("ship_java"))
    val typed = DatasetType(li, Map(
      "qty_comma" -> "float64",
      "cplx" -> "complex64",
      "flag_pad" -> "unicodestrip",
      "bkey" -> "bits64",
      "bnum" -> "bits32",
      "ship_local" -> "datetime",
      "ship_java" -> "javadatetime"),
      opts = TypeOptions(numericComma = true, timezone = Some("Asia/Kolkata"))).good
    typed.select(col("l_orderkey"), col("l_linenumber"), col("qty_comma"),
      col("cplx.re").as("cplx_re"), col("cplx.im").as("cplx_im"),
      col("flag_pad").as("flag"), col("bkey").cast("double").as("bkey"),
      col("bnum"), col("ship_local"), col("ship_java"))
  }

  /** Zip of two CSV halves of nation → csvimport_zip → chained union must
    * reproduce the table, with member provenance.
    */
  def csvimportZip(s: SparkSession, dir: String): DataFrame = {
    val tmp = tmpDir("csv_zip")
    val nation = Tables.nation(s, dir).select("n_nationkey", "n_name", "n_regionkey")
    CsvExport(nation.filter(col("n_nationkey") < 13), s"$tmp/part1.csv",
      CsvExportConfig())
    CsvExport(nation.filter(col("n_nationkey") >= 13), s"$tmp/part2.csv",
      CsvExportConfig())
    val zipPath = s"$tmp/nation.zip"
    val zos = new java.util.zip.ZipOutputStream(
      java.nio.file.Files.newOutputStream(java.nio.file.Paths.get(zipPath)))
    try Seq("part1.csv", "part2.csv").foreach { n =>
      zos.putNextEntry(new java.util.zip.ZipEntry(n))
      zos.write(java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(s"$tmp/$n")))
      zos.closeEntry()
    } finally zos.close()
    val results = CsvImportZip(s, zipPath)
    val u = CsvImportZip.unioned(results)
    DatasetType(u, Map("n_nationkey" -> "int32", "n_regionkey" -> "int32")).good
      .select(col("n_nationkey"), col("n_name"), col("n_regionkey"), col("member"))
  }

  /** Global sort; returns the first 100 rows with their physical position. */
  def sortOrder(s: SparkSession, dir: String): DataFrame = {
    val sorted = DatasetSort(
      Tables.lineitem(s, dir)
        .select(col("l_orderkey"), col("l_linenumber"), col("l_shipdate")),
      Seq(DatasetSort.SortCol("l_shipdate", asc = false),
          DatasetSort.SortCol("l_orderkey"), DatasetSort.SortCol("l_linenumber")),
      acrossSlices = true)
    withPosition(sorted, "pos").filter(col("pos") < 100)
  }

  /** After hashpart, every key lives in exactly one partition. */
  def hashpartIntegrity(s: SparkSession, dir: String): DataFrame = {
    DatasetHashpart(Tables.lineitem(s, dir), "l_suppkey", 32)
      .withColumn("pid", spark_partition_id())
      .groupBy(col("l_suppkey"))
      .agg(count(lit(1)).as("n"),
           countDistinct(col("pid")).cast("long").as("nparts"))
  }

  /** Split customer column-wise, merge back by key == original. */
  def mergeRoundtrip(s: SparkSession, dir: String): DataFrame = {
    val cust = Tables.customer(s, dir)
    val left = cust.select("c_custkey", "c_name", "c_nationkey")
    val right = cust.select("c_custkey", "c_acctbal", "c_mktsegment")
    DatasetMerge.byKey(left, right, "c_custkey")
      .select("c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment")
  }

  /** Round-robin scatter then unroundrobin restore; verify physical order. */
  def unroundrobin(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir).select(col("event_id"), col("event_type"))
    val scattered = Roundrobin(ev, 32)
    val restored = Unroundrobin(scattered, "event_id", slices = 8)
    withPosition(restored, "pos").filter(col("pos") < 200)
  }

  /** Checksum is identical across different partitionings/orders of the
    * same data, and changes when a row changes. Fully lazy: the three
    * checksums and the min-key lookup are all part of ONE declarative plan
    * (min goes through a broadcast scalar join, not a driver collect).
    */
  def checksumInvariant(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(s, dir)
    def cs(df: DataFrame, p: String): DataFrame =
      DatasetChecksum(df).select(col("sum_hi").as(s"${p}_hi"),
        col("sum_lo").as(s"${p}_lo"), col("lines").as(s"${p}_lines"))
    val a = cs(li.repartition(7), "a")
    val b = cs(li.orderBy(col("l_extendedprice").desc).repartition(3), "b")
    val minKey = li.agg(min("l_orderkey").as("__mink"))
    val mutated = li.crossJoin(broadcast(minKey))
      .withColumn("l_quantity",
        when(col("l_orderkey") === col("__mink"), col("l_quantity") + 1)
          .otherwise(col("l_quantity")))
      .drop("__mink")
    val c = cs(mutated, "c")
    a.crossJoin(b).crossJoin(c).select(
      (col("a_hi") === col("b_hi") && col("a_lo") === col("b_lo") &&
       col("a_lines") === col("b_lines")).as("layouts_equal"),
      (col("a_hi") === col("c_hi") && col("a_lo") === col("c_lo")).as("mutation_equal"),
      col("a_lines").as("lines"))
  }

  /** 3-snapshot chain of orders by year; range-iterate skips snapshots via
    * zone maps, result must equal a plain SQL range filter.
    */
  def chainRange(s: SparkSession, dir: String): DataFrame = {
    val store = new SnapshotStore(s, tmpDir("store"))
    val ord = Tables.orders(s, dir)
    def yr(a: String, b: String) =
      ord.filter(col("o_orderdate") >= lit(a).cast("timestamp") &&
                 col("o_orderdate") < lit(b).cast("timestamp"))
    store.write(yr("1990-01-01", "1994-01-01"), "orders_a", slices = 4)
    store.write(yr("1994-01-01", "1996-01-01"), "orders_b",
      previous = Some("orders_a"), slices = 4)
    store.write(yr("1996-01-01", "2000-01-01"), "orders_c",
      previous = Some("orders_b"), slices = 4)
    val it = store.iterateChain("orders_c",
      columns = Seq("o_orderkey", "o_orderdate", "o_totalprice", "o_orderstatus"),
      range = Some(("o_orderdate", "1994-06-01", "1995-06-01")))
    it.groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("n"),
           sum(col("o_totalprice").cast("decimal(18,2)")).cast("double").as("volume"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "op_csv_roundtrip" -> csvRoundtrip _,
    "op_dataset_type" -> datasetType _,
    "op_dataset_type2" -> datasetType2 _,
    "op_csvimport_zip" -> csvimportZip _,
    "op_sort_order" -> sortOrder _,
    "op_hashpart_integrity" -> hashpartIntegrity _,
    "op_merge_roundtrip" -> mergeRoundtrip _,
    "op_unroundrobin" -> unroundrobin _,
    "op_checksum_invariant" -> checksumInvariant _,
    "op_chain_range" -> chainRange _,
  )

  val oracle: Map[String, String] = Map(
    "op_csv_roundtrip" ->
      "SELECT n_nationkey, n_name, n_regionkey FROM nation",
    "op_dataset_type" ->
      """SELECT l_orderkey, l_linenumber, l_quantity AS qty, l_shipdate AS ship,
         l_orderkey AS messy_id, (l_returnflag = 'R') AS flag FROM lineitem""",
    "op_dataset_type2" ->
      """SELECT l_orderkey, l_linenumber,
         l_quantity AS qty_comma,
         l_orderkey::DOUBLE AS cplx_re, l_linenumber::DOUBLE AS cplx_im,
         l_returnflag AS flag,
         l_orderkey::DOUBLE AS bkey,
         l_linenumber::BIGINT AS bnum,
         l_shipdate - INTERVAL '5 hours 30 minutes' AS ship_local,
         l_shipdate AS ship_java
         FROM lineitem""",
    "op_csvimport_zip" ->
      """SELECT n_nationkey, n_name, n_regionkey,
         CASE WHEN n_nationkey < 13 THEN 'part1.csv' ELSE 'part2.csv' END AS member
         FROM nation""",
    "op_sort_order" ->
      """SELECT l_orderkey, l_linenumber, l_shipdate, pos FROM (
           SELECT l_orderkey, l_linenumber, l_shipdate,
             row_number() OVER (ORDER BY l_shipdate DESC, l_orderkey ASC, l_linenumber ASC) - 1 AS pos
           FROM lineitem) t WHERE pos < 100""",
    "op_hashpart_integrity" ->
      "SELECT l_suppkey, count(*) AS n, CAST(1 AS BIGINT) AS nparts FROM lineitem GROUP BY l_suppkey",
    "op_merge_roundtrip" ->
      "SELECT c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment FROM customer",
    "op_unroundrobin" ->
      """SELECT event_id, event_type, pos FROM (
           SELECT event_id, event_type,
             row_number() OVER (ORDER BY event_id ASC) - 1 AS pos
           FROM events) t WHERE pos < 200""",
    "op_checksum_invariant" ->
      """SELECT true AS layouts_equal, false AS mutation_equal,
         (SELECT count(*) FROM lineitem) AS lines""",
    "op_chain_range" ->
      """SELECT o_orderstatus, count(*) AS n,
         CAST(sum(o_totalprice::DECIMAL(18,2)) AS DOUBLE) AS volume
         FROM orders
         WHERE o_orderdate >= TIMESTAMP '1994-06-01'
           AND o_orderdate < TIMESTAMP '1995-06-01'
         GROUP BY o_orderstatus""",
  )
}
