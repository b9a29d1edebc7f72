package graft.queries

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StructField, StructType, LongType}
import graft.cli.Shell
import graft.core.{IterateControl, SnapshotStore, Tables}
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
  private[queries] def withPosition(df: DataFrame, posCol: String): DataFrame = {
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

  /** number:bignum end-to-end — the reference's arbitrary-precision
    * `number` range (±2^1007, dataset_type.py:804) as canonical strings:
    * canonicalization of signed/zero-padded text, NUMERIC ordering via the
    * lexicographic sort key, and exact big-integer sums. The oracle
    * cross-checks everything DuckDB can express: sums/min/max in the
    * ≤38-digit DECIMAL domain, and >38-digit ordering via arg_max over
    * (length, digits) — numeric order for positive integers regardless of
    * width. The beyond-oracle domain (300-digit arithmetic) is
    * spec-checked against java.math.BigInteger in BigNumSpec.
    */
  def bignumQ(s: SparkSession, dir: String): DataFrame = {
    import graft.functions.{BigNumFunctions => B}
    val ks = col("k").cast("string")
    val raw = when(col("k") % 7 === 0, concat(lit("-000"), repeat(ks, 3)))
      .when(col("k") % 7 === 1, concat(lit("+"), repeat(ks, 5)))
      .when(col("k") % 7 === 2, lit(" 000 "))
      .when(col("k") % 7 === 3, concat(lit("-0"), ks))
      .otherwise(repeat(ks, 4))
    val o = Tables.orders(s, dir).select(col("o_orderkey").as("k"))
      .select(col("k"), raw.as("raw"), repeat(ks, 9).as("raw45"))
    val t = DatasetType(o,
      Map("raw" -> "number:bignum", "raw45" -> "number:bignum")).good
    t.groupBy((col("k") % 5).as("grp"))
      .agg(
        count(lit(1)).as("n"),
        B.sum(col("raw")).as("sum_big"),
        min_by(col("raw"), B.sortKey(col("raw"))).as("min_big"),
        max_by(col("raw"), B.sortKey(col("raw"))).as("max_big"),
        max_by(col("raw45"), B.sortKey(col("raw45"))).as("max_big45"),
        max(length(col("raw45"))).cast("long").as("max_digits45"))
  }

  /** Zip of two CSV halves of nation → csvimport_zip → chained union must
    * reproduce the table, with member provenance. The zip file is a
    * memoized fixture; the operator under test is the import.
    */
  def csvimportZip(s: SparkSession, dir: String): DataFrame = {
    val (_, out) = Fixtures(s, dir, "fix_csvimport_zip") { _ =>
      val tmp = Fixtures.filesDir(dir, "fix_csvimport_zip")
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
      Map("zip" -> zipPath)
    }
    val results = CsvImportZip(s, out("zip"))
    val u = CsvImportZip.unioned(results)
    DatasetType(u, Map("n_nationkey" -> "int32", "n_regionkey" -> "int32")).good
      .select(col("n_nationkey"), col("n_name"), col("n_regionkey"), col("member"))
  }

  /** Non-UTF-8 round trip (the round-3 fidelity gap): nation names
    * re-spelled with high-bit characters are written as raw ISO-8859-1
    * bytes AND as UTF-8 bytes, imported through the byte-preserving path
    * (encoding = "bytes" — reference csvimport.py:173-300 never decodes),
    * then decoded by dataset_type `unicode:<codec>` / octal-escaped by
    * `ascii` (dataset_type.py:789-800). A UTF-8-decoding reader would
    * mangle the latin-1 bytes into U+FFFD and the oracle hash catches it.
    */
  def csvLatin1(s: SparkSession, dir: String): DataFrame = {
    import java.nio.charset.StandardCharsets
    import java.nio.file.{Files, Paths}
    val bytesCfg = CsvImportConfig(encoding = "bytes")
    val (_, out) = Fixtures(s, dir, "fix_csv_latin1") { _ =>
      val tmp = Fixtures.filesDir(dir, "fix_csv_latin1")
      val rows = Tables.nation(s, dir).select("n_nationkey", "n_name")
        .orderBy("n_nationkey").collect() // 25-row fixture build, driver-side
      def body(label: String) =
        s"n_nationkey,$label\n" + rows.map { r =>
          s"${r.get(0)},${r.getString(1).replace("A", "Ä")}ß"
        }.mkString("", "\n", "\n")
      Files.write(Paths.get(s"$tmp/nation_l1.csv"),
        body("name_l1").getBytes(StandardCharsets.ISO_8859_1))
      Files.write(Paths.get(s"$tmp/nation_u8.csv"),
        body("name_u8").getBytes(StandardCharsets.UTF_8))
      // byte-faithful EXPORT built INSIDE the memoized fixture (it is a
      // write job — rebuilding it on every query construction would both
      // re-run the export and race concurrent builders on the same path):
      // decoded latin-1 text back out as latin-1 bytes, re-imported below
      val rtPath = s"$tmp/nation_rt.csv"
      val rt = DatasetType(CsvImport(s, s"$tmp/nation_l1.csv", bytesCfg).data,
        Map("n_nationkey" -> "int32", "name_l1" -> "unicode:iso-8859-1")).good
      CsvExport(rt.select(col("n_nationkey"), col("name_l1").as("name_rt")),
        rtPath, CsvExportConfig(encoding = "iso-8859-1"))
      Map("l1" -> s"$tmp/nation_l1.csv", "u8" -> s"$tmp/nation_u8.csv",
          "rt" -> rtPath)
    }
    val imp1 = CsvImport(s, out("l1"), bytesCfg).data
      .withColumn("name_ascii", col("name_l1"))
    val t1 = DatasetType(imp1, Map(
      "n_nationkey" -> "int32",
      "name_l1" -> "unicode:iso-8859-1",
      "name_ascii" -> "ascii")).good
    val imp2 = CsvImport(s, out("u8"), bytesCfg).data
    val t2 = DatasetType(imp2, Map(
      "n_nationkey" -> "int32", "name_u8" -> "unicode:utf-8")).good
    // name_rt proves the bytes-in → type → bytes-out → bytes-in round trip
    val t3 = DatasetType(CsvImport(s, out("rt"), bytesCfg).data, Map(
      "n_nationkey" -> "int32", "name_rt" -> "unicode:iso-8859-1")).good
    t1.join(t2, "n_nationkey").join(t3, "n_nationkey")
      .select("n_nationkey", "name_l1", "name_ascii", "name_u8", "name_rt")
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
    val (store, _) = Fixtures(s, dir, "fix_chain_range") { st =>
      val ord = Tables.orders(s, dir)
      def yr(a: String, b: String) =
        ord.filter(col("o_orderdate") >= lit(a).cast("timestamp") &&
                   col("o_orderdate") < lit(b).cast("timestamp"))
      st.write(yr("1990-01-01", "1994-01-01"), "cr_orders_a", slices = 4)
      st.write(yr("1994-01-01", "1996-01-01"), "cr_orders_b",
        previous = Some("cr_orders_a"), slices = 4)
      st.write(yr("1996-01-01", "2000-01-01"), "cr_orders_c",
        previous = Some("cr_orders_b"), slices = 4)
      Map("tip" -> "cr_orders_c")
    }
    val it = store.iterateChain("cr_orders_c",
      columns = Seq("o_orderkey", "o_orderdate", "o_totalprice", "o_orderstatus"),
      range = Some(("o_orderdate", "1994-06-01", "1995-06-01")))
    it.groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("n"),
           sum(col("o_totalprice").cast("decimal(18,2)")).cast("double").as("volume"))
  }

  /** Build a chain of year-partitioned orders snapshots: bounds
    * ("b0","b1","b2",…) → snapshots `<prefix>a` [b0,b1), `<prefix>b`
    * [b1,b2), … linked by `previous`. Returns the chain tip's name.
    */
  private def yearChain(store: SnapshotStore, ord: DataFrame,
                        bounds: Seq[String], prefix: String): String = {
    var prev: Option[String] = None
    bounds.sliding(2).zipWithIndex.foreach { case (Seq(a, b), i) =>
      val nm = s"$prefix${('a' + i).toChar}"
      store.write(
        ord.filter(col("o_orderdate") >= lit(a).cast("timestamp") &&
                   col("o_orderdate") < lit(b).cast("timestamp")),
        nm, previous = prev, slices = 4)
      prev = Some(nm)
    }
    prev.get
  }

  /** filter_columns is metadata-only (reference a_dataset_filter_columns.py
    * — "no data copy"): asserted structurally (the slim snapshot has no
    * data dir of its own and points at the parent's), and the resolved read
    * exposes exactly the kept columns.
    */
  def filterColumnsQ(s: SparkSession, dir: String): DataFrame = {
    val (store, _) = Fixtures(s, dir, "fix_filter_columns") { st =>
      st.write(Tables.customer(s, dir), "fc_cust_full", slices = 4)
      Map("base" -> "fc_cust_full")
    }
    val snap = store.filterColumns("fc_cust_full", "fc_cust_slim",
      Seq("c_custkey", "c_name", "c_mktsegment"))
    val shared =
      !java.nio.file.Files.exists(java.nio.file.Paths.get(snap.dir, "data")) &&
      snap.meta.dataDir.contains(s"${store.get("fc_cust_full").dir}/data")
    store.readResolved("fc_cust_slim").withColumn("data_shared", lit(shared))
  }

  /** dataset_checksum_chain (reference a_dataset_checksum_chain.py:36-51):
    * per-snapshot checksums over a chain combine (sums add) to the checksum
    * of the whole — verified against the checksum of the unpartitioned
    * table. Fully lazy: all four checksums live in ONE plan via broadcast
    * crossJoins of 1-row aggregates.
    */
  def checksumChain(s: SparkSession, dir: String): DataFrame = {
    val ord = Tables.orders(s, dir)
    // testdata orders span 1995..2001 — bounds must cover the whole table
    val (store, out) = Fixtures(s, dir, "fix_checksum_chain") { st =>
      Map("tip" -> yearChain(st, ord,
        Seq("1990-01-01", "1996-01-01", "1998-01-01", "2010-01-01"), "cc_orders_"))
    }
    val tip = out("tip")
    val parts = store.chain(tip).reverse.zipWithIndex.map { case (sn, i) =>
      DatasetChecksum(store.readResolved(sn.meta.name))
        .select(col("sum_hi").as(s"hi$i"), col("sum_lo").as(s"lo$i"),
                col("lines").as(s"ln$i"))
    }
    val whole = DatasetChecksum(ord)
      .select(col("sum_hi").as("whi"), col("sum_lo").as("wlo"), col("lines").as("wln"))
    parts.reduce(_.crossJoin(_)).crossJoin(whole).select(
      (col("hi0") + col("hi1") + col("hi2") === col("whi") &&
       col("lo0") + col("lo1") + col("lo2") === col("wlo") &&
       col("ln0") + col("ln1") + col("ln2") === col("wln")).as("chain_equals_whole"),
      col("wln").as("lines"))
  }

  /** hashlabel enforcement + rehash on iterate (reference
    * dataset.py:615-622): a chain whose snapshots are hashed on different
    * columns iterates under `hashlabel=c_nationkey, rehash=true` — after
    * the rehash repartition every key must live in exactly one partition.
    */
  def rehashIterate(s: SparkSession, dir: String): DataFrame = {
    val (store, _) = Fixtures(s, dir, "fix_rehash_iterate") { st =>
      val cust = Tables.customer(s, dir)
      st.write(cust.filter(col("c_custkey") % 3 === 0), "rh_cust_a",
        hashlabel = Some("c_nationkey"), slices = 8)
      st.write(cust.filter(col("c_custkey") % 3 =!= 0), "rh_cust_b",
        hashlabel = Some("c_custkey"), previous = Some("rh_cust_a"), slices = 8)
      Map("tip" -> "rh_cust_b")
    }
    val it = store.iterateChain("rh_cust_b",
      columns = Seq("c_custkey", "c_nationkey"),
      hashlabel = Some("c_nationkey"), rehash = true)
    it.withColumn("pid", spark_partition_id())
      .groupBy(col("c_nationkey"))
      .agg(count(lit(1)).as("n"),
           countDistinct(col("pid")).cast("long").as("nparts"))
  }

  /** pre/post callbacks with Skip/Stop control (reference
    * dataset.py:752-837): pre skips snapshot b, post stops the chain after
    * snapshot c — so of a→b→c→d exactly {a, c} are iterated, and the post
    * hook fired for exactly those, in chain order.
    */
  def iterateCallbacks(s: SparkSession, dir: String): DataFrame = {
    val (store, out) = Fixtures(s, dir, "fix_iterate_callbacks") { st =>
      Map("tip" -> yearChain(st, Tables.orders(s, dir),
        Seq("1990-01-01", "1996-01-01", "1997-01-01", "1998-01-01", "2010-01-01"),
        "cb_orders_"))
    }
    val tip = out("tip")
    val postSeen = scala.collection.mutable.ArrayBuffer.empty[String]
    val it = store.iterateChain(tip,
      columns = Seq("o_orderstatus", "o_totalprice", "o_orderdate"),
      preCallback = Some { sn =>
        if (sn.meta.name == "cb_orders_b") throw IterateControl.SkipDataset
      },
      postCallback = Some { sn =>
        postSeen += sn.meta.name
        if (sn.meta.name == "cb_orders_c") throw IterateControl.StopIteration
      })
    // callbacks run driver-side during chain planning, so postSeen is final
    val cbOk = postSeen.toSeq == Seq("cb_orders_a", "cb_orders_c")
    it.groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("n"),
           sum(col("o_totalprice").cast("decimal(18,2)")).cast("double").as("volume"))
      .withColumn("callbacks_ok", lit(cbOk))
  }

  /** slice= iteration windows (reference dataset.py:551-596): a 3-snapshot
    * chain with an explicit lineno; the window [total/3-7, 2*total/3+11)
    * cuts into the first and last snapshots (offset/limit on the order
    * column) and covers the middle one fully; the stop bound is passed
    * NEGATIVE to exercise resolution against total chain lines.
    */
  def sliceWindowQ(s: SparkSession, dir: String): DataFrame = {
    val (store, out) = Fixtures(s, dir, "fix_slice_window") { st =>
      // global numbering via range-sort + zipWithIndex (withPosition) —
      // no single-partition window even in fixture code, and no
      // WindowExec warning polluting the bench tail
      val numbered = withPosition(
        Tables.orders(s, dir)
          .select(col("o_orderkey"), col("o_totalprice"))
          .orderBy(col("o_orderkey")),
        "lineno")
      val total = numbered.count()
      val n1 = total / 3
      val n2 = 2 * total / 3
      st.write(numbered.filter(col("lineno") < n1), "sw_a", slices = 4)
      st.write(numbered.filter(col("lineno") >= n1 && col("lineno") < n2),
        "sw_b", previous = Some("sw_a"), slices = 4)
      st.write(numbered.filter(col("lineno") >= n2), "sw_c",
        previous = Some("sw_b"), slices = 4)
      Map("total" -> total.toString)
    }
    val total = out("total").toLong
    val n1 = total / 3
    val n2 = 2 * total / 3
    store.iterateChain("sw_c",
      columns = Seq("lineno", "o_orderkey", "o_totalprice"),
      sliceWindow = Some((Some(n1 - 7), Some(-(total - n2 - 11)))),
      orderCol = Some("lineno"))
  }

  /** parent column-append + link_to_here (reference dataset.py:864-941,
    * 292-327): the child snapshot stores ONLY rowid + the appended columns
    * (zero-copy, asserted structurally), the link stores no data at all,
    * and the resolved read-through-the-link yields parent ++ appended.
    */
  def parentAppend(s: SparkSession, dir: String): DataFrame = {
    val (store, _) = Fixtures(s, dir, "fix_parent_append") { st =>
      st.write(st.withRowId(Tables.customer(s, dir)), "pa_base", slices = 4)
      st.appendColumns("pa_base", "pa_ext") { df =>
        df.select(col(SnapshotStore.RowIdName),
          (col("c_acctbal") > 0).as("positive"),
          lower(col("c_mktsegment")).as("seg_l"))
      }
      st.linkToHere("pa_ext", "pa_link")
      Map("link" -> "pa_link")
    }
    val childCols = store.get("pa_ext").read(s).columns.toSet
    val zeroCopy =
      childCols == Set(SnapshotStore.RowIdName, "positive", "seg_l") &&
      store.get("pa_link").meta.dataDir.isDefined
    store.readResolved("pa_link")
      .select(col("c_custkey"), col("c_name"), col("positive"), col("seg_l"))
      .withColumn("zero_copy", lit(zeroCopy))
  }

  /** copy_mode column replacement (reference dataset.py:537-543, 963-994):
    * an operator that transforms 2 of customer's columns stores ONLY those
    * 2 (+rowid) — untouched columns are never rewritten (asserted
    * structurally) and the resolved read shadows the parent's versions.
    */
  def copyModeQ(s: SparkSession, dir: String): DataFrame = {
    val (store, _) = Fixtures(s, dir, "fix_copy_mode") { st =>
      st.write(st.withRowId(Tables.customer(s, dir)), "cm_base", slices = 4)
      st.appendColumns("cm_base", "cm_upd", replace = true) { df =>
        df.select(col(SnapshotStore.RowIdName),
          substring(col("c_mktsegment"), 1, 4).as("c_mktsegment"),
          (col("c_acctbal") * 2).as("bal2x"))
      }
      Map("tip" -> "cm_upd")
    }
    val childCols = store.get("cm_upd").read(s).columns.toSet
    val zeroCopy =
      childCols == Set(SnapshotStore.RowIdName, "c_mktsegment", "bal2x")
    store.readResolved("cm_upd")
      .select(col("c_custkey"), col("c_name"), col("c_acctbal"),
        col("c_mktsegment"), col("bal2x"))
      .withColumn("zero_copy", lit(zeroCopy))
  }

  /** shell `ax grep` over a 2-snapshot chain (reference shell/grep.py:
    * regex matched against every selected column): the result is exactly
    * the SQL OR-of-regexes over the union — a distributed scan+filter, not
    * a driver loop.
    */
  def shellGrep(s: SparkSession, dir: String): DataFrame = {
    val (store, _) = Fixtures(s, dir, "fix_shell_grep") { st =>
      val cust = Tables.customer(s, dir)
      st.write(cust.filter(col("c_custkey") % 2 === 0), "sh_cust_a", slices = 4)
      st.write(cust.filter(col("c_custkey") % 2 =!= 0), "sh_cust_b",
        previous = Some("sh_cust_a"), slices = 4)
      Map("tip" -> "sh_cust_b")
    }
    Shell.grepDf(store, Shell.Args(store.root, "sh_cust_b",
      Seq("c_custkey", "c_name", "c_mktsegment", "c_nationkey"),
      pattern = "BUILDING|007$", chain = 2))
  }

  /** Multi-dataset column-zip csvexport (reference a_csvexport.py:52,
    * 191-197): two line-aligned projections of customer exported
    * column-concatenated into ONE file, re-imported, and compared to the
    * original (≡ a SQL join on the alignment rowid).
    */
  def csvexportZipQ(s: SparkSession, dir: String): DataFrame = {
    // fixture: the rowid'd base snapshot (an rdd zipWithIndex pass);
    // the zipped EXPORT + import are the operators under test and stay live
    val (store, _) = Fixtures(s, dir, "fix_csvexport_zip") { st =>
      st.write(st.withRowId(Tables.customer(s, dir)), "cz_base", slices = 4)
      Map("base" -> "cz_base")
    }
    val base = store.readResolved("cz_base")
    val left = base.select(col(SnapshotStore.RowIdName), col("c_custkey"), col("c_name"))
    val right = base.select(col(SnapshotStore.RowIdName), col("c_nationkey"), col("c_mktsegment"))
    val path = tmpDir("csv_zipcols") + "/cust_zip.csv"
    CsvExport.zipped(Seq(left, right), SnapshotStore.RowIdName, path)
    val imported = CsvImport(s, path).data
    DatasetType(imported, Map("c_custkey" -> "int64", "c_nationkey" -> "int64")).good
      .select("c_custkey", "c_name", "c_nationkey", "c_mktsegment")
  }

  /** Hostile-input dataset_type fuzz, oracle-gated: every messy string is
    * CONSTRUCTED from lineitem values (so DuckDB can recompute the expected
    * typed value from the clean columns), covering the corner-case families
    * of the reference's a_test_dataset_type_corner_cases.py — garbage
    * prefixes/suffixes around ints (int64i), sign absorption from
    * surrounding junk, whitespace-padded floats, locale decimal commas
    * (numeric_comma), e-notation, 0x hex with base auto-detect, pre-1970
    * and far-future epoch seconds, strbool's whitespace-is-true rule, and
    * filter_bad dropping rows whose strict int parse fails. The
    * numeric_comma column types in a SECOND DatasetType pass because the
    * option is per-call and would corrupt the dot-decimal floats.
    *
    * String derivations use a WIDTH-STABLE key, pmod(l_orderkey, 1e9):
    * the identity at every gated scale (base keys are far below 1e9, so
    * the oracle is untouched), but under ScaleCheck's replica synthesis —
    * which offsets keys by replica·1e9 — it strips the offset so the
    * digit strings keep replica-0 width. Without it the per-CHARACTER
    * parse columns did ~1.5x more work per row at 10x and the scale row
    * measured the synthesis artifact, not the engine (SCALE_CHECK r14
    * adjudication note; the only >1 slope in the table).
    */
  def typeFuzz(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(s, dir).select(
      col("l_orderkey"), col("l_linenumber"),
      col("l_quantity").cast("decimal(18,2)").as("q2"))
    val wk = pmod(col("l_orderkey"), lit(1000000000L))
    val messy = li.select(
      col("l_orderkey"), col("l_linenumber"),
      concat(lit("#"), wk, lit(":"), col("l_linenumber"), lit("#"))
        .as("messy_int"),
      // the junk '-' right before the digits is absorbed by the first-int
      // regex: 'junk-123tail' parses as -123 (reference int64i semantics)
      concat(lit("junk-"), wk, lit("tail")).as("neg_int"),
      concat(lit("   "), col("q2"), lit(" \t")).as("ws_float"),
      translate(col("q2").cast("string"), ".", ",").as("comma_float"),
      concat(col("q2"), lit("e-2")).as("sci_float"),
      concat(lit("0x"), hex(wk)).as("hex_int"),
      (pmod(wk * 7919L + col("l_linenumber"), lit(4000000000L))
        - 2000000000L).cast("string").as("epoch_ts"),
      element_at(array(lit("FALSE"), lit("0"), lit("off"),
        lit("TRUE"), lit("   "), lit("nope")),
        (col("l_linenumber") % 6 + 1).cast("int")).as("bool_mix"),
      when(col("l_orderkey") % 97 === 0, lit("garbage!"))
        .otherwise(wk.cast("string")).as("strict_int"))
    val typed = DatasetType(messy, Map(
      "messy_int" -> "int64i",
      "neg_int" -> "int64i",
      "ws_float" -> "float64",
      "sci_float" -> "float64",
      "hex_int" -> "int64_0",
      "epoch_ts" -> "datetime:%s",
      "bool_mix" -> "strbool",
      "strict_int" -> "int64"), filterBad = true).good
    DatasetType(typed, Map("comma_float" -> "float64"),
      opts = graft.ops.TypeOptions(numericComma = true)).good
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "op_csv_roundtrip" -> csvRoundtrip _,
    "op_csv_latin1" -> csvLatin1 _,
    "op_dataset_type" -> datasetType _,
    "op_dataset_type2" -> datasetType2 _,
    "op_bignum" -> bignumQ _,
    "op_csvimport_zip" -> csvimportZip _,
    "op_sort_order" -> sortOrder _,
    "op_hashpart_integrity" -> hashpartIntegrity _,
    "op_merge_roundtrip" -> mergeRoundtrip _,
    "op_unroundrobin" -> unroundrobin _,
    "op_checksum_invariant" -> checksumInvariant _,
    "op_chain_range" -> chainRange _,
    "op_filter_columns" -> filterColumnsQ _,
    "op_checksum_chain" -> checksumChain _,
    "op_rehash_iterate" -> rehashIterate _,
    "op_iterate_callbacks" -> iterateCallbacks _,
    "op_slice_window" -> sliceWindowQ _,
    "op_parent_append" -> parentAppend _,
    "op_copy_mode" -> copyModeQ _,
    "op_shell_grep" -> shellGrep _,
    "op_csvexport_zip" -> csvexportZipQ _,
    "op_type_fuzz" -> typeFuzz _,
  )

  val oracle: Map[String, String] = Map(
    "op_csv_roundtrip" ->
      "SELECT n_nationkey, n_name, n_regionkey FROM nation",
    // every expected value recomputed from the CLEAN columns — the messy
    // strings only ever exist on the Spark side (except sci_float, where
    // both engines cast the identical decimal-string: correctly-rounded
    // IEEE parse agrees). bool_mix truth table: indexes 0-2 are falsy
    // spellings, 3-5 truthy (including the whitespace-only-is-true rule).
    "op_type_fuzz" ->
      """SELECT l_orderkey, l_linenumber,
         l_orderkey AS messy_int,
         -l_orderkey AS neg_int,
         CAST(l_quantity AS DECIMAL(18,2))::DOUBLE AS ws_float,
         CAST(l_quantity AS DECIMAL(18,2))::DOUBLE AS comma_float,
         ((CAST(l_quantity AS DECIMAL(18,2)))::VARCHAR || 'e-2')::DOUBLE AS sci_float,
         l_orderkey AS hex_int,
         to_timestamp(((l_orderkey * 7919 + l_linenumber) % 4000000000) - 2000000000)::TIMESTAMP AS epoch_ts,
         (l_linenumber % 6) >= 3 AS bool_mix,
         l_orderkey AS strict_int
         FROM lineitem WHERE l_orderkey % 97 <> 0""",
    // '\304'/'\337' are literal backslash-octal text (no escape processing
    // in SQL single quotes) — the ascii spec's rendering of 0xC4/0xDF
    "op_csv_latin1" ->
      """SELECT n_nationkey,
         replace(n_name, 'A', 'Ä') || 'ß' AS name_l1,
         replace(n_name, 'A', '\304') || '\337' AS name_ascii,
         replace(n_name, 'A', 'Ä') || 'ß' AS name_u8,
         replace(n_name, 'A', 'Ä') || 'ß' AS name_rt
         FROM nation""",
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
    // sums/min/max replay in DECIMAL(38,0) (inputs are <=30 digits by
    // construction, group sums <=36); the >38-digit max replays as
    // arg_max over (length, digits) — numeric order for positive ints
    "op_bignum" ->
      """WITH o AS (SELECT o_orderkey AS k, o_orderkey::VARCHAR AS ks FROM orders),
         d AS (SELECT k,
             CASE WHEN k % 7 = 0 THEN -(repeat(ks, 3)::DECIMAL(38,0))
                  WHEN k % 7 = 1 THEN repeat(ks, 5)::DECIMAL(38,0)
                  WHEN k % 7 = 2 THEN 0::DECIMAL(38,0)
                  WHEN k % 7 = 3 THEN -(ks::DECIMAL(38,0))
                  ELSE repeat(ks, 4)::DECIMAL(38,0) END AS v,
             repeat(ks, 9) AS raw45
           FROM o)
         SELECT k % 5 AS grp, count(*) AS n,
           sum(v)::VARCHAR AS sum_big,
           min(v)::VARCHAR AS min_big,
           max(v)::VARCHAR AS max_big,
           arg_max(raw45, lpad(length(raw45)::VARCHAR, 4, '0') || raw45) AS max_big45,
           max(length(raw45))::BIGINT AS max_digits45
         FROM d GROUP BY 1""",
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
    "op_filter_columns" ->
      "SELECT c_custkey, c_name, c_mktsegment, true AS data_shared FROM customer",
    "op_checksum_chain" ->
      "SELECT true AS chain_equals_whole, count(*) AS lines FROM orders",
    "op_rehash_iterate" ->
      """SELECT c_nationkey, count(*) AS n, CAST(1 AS BIGINT) AS nparts
         FROM customer GROUP BY c_nationkey""",
    "op_iterate_callbacks" ->
      """SELECT o_orderstatus, count(*) AS n,
         CAST(sum(o_totalprice::DECIMAL(18,2)) AS DOUBLE) AS volume,
         true AS callbacks_ok
         FROM orders
         WHERE o_orderdate < TIMESTAMP '1996-01-01'
            OR (o_orderdate >= TIMESTAMP '1997-01-01'
                AND o_orderdate < TIMESTAMP '1998-01-01')
         GROUP BY o_orderstatus""",
    "op_slice_window" ->
      """SELECT lineno, o_orderkey, o_totalprice FROM (
           SELECT row_number() OVER (ORDER BY o_orderkey) - 1 AS lineno,
                  o_orderkey, o_totalprice FROM orders) t
         WHERE lineno >= (SELECT count(*)//3 - 7 FROM orders)
           AND lineno < (SELECT 2*count(*)//3 + 11 FROM orders)""",
    "op_parent_append" ->
      """SELECT c_custkey, c_name, (c_acctbal > 0) AS positive,
         lower(c_mktsegment) AS seg_l, true AS zero_copy FROM customer""",
    "op_copy_mode" ->
      """SELECT c_custkey, c_name, c_acctbal,
         substr(c_mktsegment, 1, 4) AS c_mktsegment,
         c_acctbal * 2 AS bal2x, true AS zero_copy FROM customer""",
    "op_shell_grep" ->
      """SELECT c_custkey, c_name, c_mktsegment, c_nationkey FROM customer
         WHERE regexp_matches(c_custkey::VARCHAR, 'BUILDING|007$')
            OR regexp_matches(c_name, 'BUILDING|007$')
            OR regexp_matches(c_mktsegment, 'BUILDING|007$')
            OR regexp_matches(c_nationkey::VARCHAR, 'BUILDING|007$')""",
    "op_csvexport_zip" ->
      "SELECT c_custkey, c_name, c_nationkey, c_mktsegment FROM customer",
  )
}
