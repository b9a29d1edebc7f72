package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.core.SnapshotStore
import graft.ops.{CsvExport, CsvExportConfig, CsvImport, DatasetType, FilterColumns}
import TestSpark.{spark, tmpDir}

/** Hostile column names through the core stack, mirroring the reference's
  * a_test_dataset_column_names.py / a_test_dataset_empty_colname.py: the
  * reference guarantees arbitrary unicode column names survive
  * write→iterate→csvexport→csvimport→dataset_type. Spark's own footgun is
  * different from Python's (identifier cleaning): `col(name)` PARSES the
  * name — dots become struct-field access, backticks break quoting — so
  * any operator that round-trips user column names through col() must
  * quote them. These specs pin that contract for snapshot write/read
  * (zone maps aggregate every column), filter_columns, hashpart-on-weird
  * -label, and the CSV round-trip.
  */
class ColumnNamesSpec extends AnyFunSuite {

  // the reference's list, extended with Spark's own hazards: dots, backticks
  private val hostile = Seq(
    "-", "a b", "42", "print", "print@", "None", "a.b", "tick`t", "på tvären")

  private def df() = {
    val s = spark
    import s.implicits._
    val base = Seq((1L, "x1"), (2L, "x2"), (3L, "x3")).toDF("id", "v")
    hostile.zipWithIndex.foldLeft(base) { case (d, (n, i)) =>
      d.withColumn(n, concat(lit(s"c$i "), col("id")))
    }
  }

  test("snapshot write/read/zone-maps survive hostile column names") {
    val store = new SnapshotStore(spark, tmpDir("colnames_store"))
    val snap = store.write(df(), "weird", slices = 2)
    assert(snap.meta.lines == 3)
    // zone maps computed for every column, including the weird ones
    val mm = snap.meta.columns.map(c => c.name -> (c.min, c.max)).toMap
    assert(mm("a.b")._1.contains("c6 1") && mm("a.b")._2.contains("c6 3"))
    assert(mm("tick`t")._1.contains("c7 1"))
    val back = store.readResolved("weird")
    assert(back.columns.toSet == df().columns.toSet)
    assert(back.count() == 3)
  }

  test("hashpart on a hostile hashlabel keeps co-location") {
    val store = new SnapshotStore(spark, tmpDir("colnames_hash"))
    val snap = store.write(df(), "weird_h", hashlabel = Some("a b"), slices = 2)
    assert(snap.meta.hashlabel.contains("a b"))
    assert(store.readResolved("weird_h").count() == 3)
  }

  test("filter_columns keeps/discards hostile names") {
    val kept = FilterColumns.keep(df(), Seq("id", "a.b", "a b"))
    assert(kept.columns.toSeq == Seq("id", "a.b", "a b"))
    assert(kept.count() == 3)
    val dropped = FilterColumns.discard(df(), Set("a.b", "tick`t"))
    assert(!dropped.columns.contains("a.b") && dropped.columns.contains("a b"))
    assert(dropped.count() == 3)
  }

  test("dataset_checksum and shell cat/grep handle hostile names") {
    val store = new SnapshotStore(spark, tmpDir("colnames_misc"))
    store.write(df(), "weird_m", slices = 2)
    // checksum hashes every column's payload, by name
    val sum1 = graft.ops.DatasetChecksum(store.readResolved("weird_m"),
      columns = Seq("a.b", "tick`t", "a b")).collect()
    assert(sum1.nonEmpty)
    // shell cat projects by name; grep matches across hostile columns
    val cat = graft.cli.Shell.catDf(store,
      graft.cli.Shell.Args(store.root, "weird_m", Seq("id", "a.b")))
    assert(cat.columns.toSeq == Seq("id", "a.b") && cat.count() == 3)
    val hits = graft.cli.Shell.grepDf(store,
      graft.cli.Shell.Args(store.root, "weird_m", Seq("id"),
        pattern = "c6 2", grepCols = Seq("a.b")))
    assert(hits.collect().map(_.getLong(0)).toSeq == Seq(2L),
      "grep -g on a dotted column must match only that column")
  }

  test("csvexport -> csvimport -> dataset_type round-trips hostile names") {
    val path = tmpDir("colnames_csv") + "/weird.csv"
    CsvExport(df(), path, CsvExportConfig(quoteMode = "lazy", header = true))
    val imported = CsvImport(spark, path).data
    assert(imported.columns.toSet == df().columns.toSet)
    val typed = DatasetType(imported, Map("id" -> "int64", "a.b" -> "unicode")).good
    val got = typed.select(col("id"), col("`a.b`"))
      .collect().map(r => (r.getLong(0), r.getString(1))).sortBy(_._1).toSeq
    assert(got == Seq((1L, "c6 1"), (2L, "c6 2"), (3L, "c6 3")))
  }
}
