package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.apache.spark.sql.functions._
import graft.ops.{CsvExport, CsvExportConfig, CsvImport, DatasetHashpart,
  DatasetChecksum, DatasetMerge, DatasetSort, DatasetType}
import TestSpark.{spark, tmpDir}

/** Generative twin of [[ColumnNamesSpec]]: instead of a fixed hostile
  * list, drive the WHOLE operator chain — csvexport → csvimport →
  * dataset_type → dataset_sort → dataset_hashpart → dataset_merge →
  * csvexport → csvimport → dataset_type — with GENERATED column names
  * (spaces, dots, backticks, double quotes, commas, unicode, reserved
  * words, digit-leading, symbol salad) and assert the order-independent
  * dataset_checksum survives the round trip bit-for-bit. Any quoting
  * hole anywhere in the chain (a `col(name)` that parses, a CSV header
  * cell that doesn't quote, a JSON field that collides) breaks the
  * checksum and names the failing schema in the assertion.
  *
  * Mirrors the reference's arbitrary-column-name guarantee
  * (a_test_dataset_column_names.py) extended to Spark's own hazards:
  * dots resolve as struct access, backticks break quoting, and analyzer
  * case-insensitivity makes case-colliding names ambiguous (the
  * generator therefore keeps names distinct after lowercasing, which is
  * also the reference-compatible portable subset).
  */
class HostileSchemaPropertySpec extends AnyFunSuite {

  private def sample[A](g: Gen[A], i: Int): A =
    g.pureApply(Gen.Parameters.default, Seed(31337L + i))

  // name fragments: every class of hostile input in one alphabet
  private val fragment: Gen[String] = Gen.frequency(
    4 -> Gen.alphaNumChar.map(_.toString),
    2 -> Gen.oneOf(" ", ".", "`", "\"", ",", "@", "-", "%", "#", "'"),
    2 -> Gen.oneOf("å", "π", "日", "ß", "ñ", "Ж"),
    1 -> Gen.oneOf("select", "from", "where", "order", "group", "table",
      "None", "print", "42", "__dummy__", "id "))

  private val nameGen: Gen[String] =
    Gen.choose(1, 4).flatMap(n => Gen.listOfN(n, fragment).map(_.mkString))
      .suchThat(s => s.trim.nonEmpty && !s.contains("\n") && !s.contains("\r"))

  /** 2-5 hostile names, distinct after lowercasing, never "id". */
  private val schemaGen: Gen[List[String]] =
    Gen.choose(2, 5).flatMap(n => Gen.listOfN(n * 3, nameGen)).map { raw =>
      raw.filter(_.toLowerCase != "id")
        .foldLeft(List.empty[String]) { (acc, n) =>
          if (acc.exists(_.toLowerCase == n.toLowerCase)) acc else n :: acc
        }.reverse.take(5)
    }.suchThat(_.size >= 2)

  test("generated hostile schemas survive the full operator chain (checksum round-trip)") {
    val s = spark
    import s.implicits._
    for (iter <- 1 to 12) {
      val names = sample(schemaGen, iter)
      val clue = s"iter $iter schema ${names.map(n => s"[$n]").mkString(" ")}"
      System.err.println(s"[hostile-fuzz] $clue")
      // 8 rows; values include CSV-hostile text so header AND cell quoting
      // are both exercised in the same file
      val base0 = (0L until 8L).toDF("id")
      val df = names.zipWithIndex.foldLeft(base0) { case (d, (n, i)) =>
        d.withColumn(n, concat(lit(s"v$i,\"x\" "), col("id")))
      }
      val dir = tmpDir(s"hostile_$iter")
      val out1 = s"$dir/one.csv"
      CsvExport(df, out1, CsvExportConfig(quoteMode = "lazy", header = true))
      val imported = CsvImport(s, out1).data
      assert(imported.columns.toSet == df.columns.toSet, clue)
      val types = Map("id" -> "int64") ++ names.map(_ -> "unicode")
      val typed = DatasetType(imported, types).good
      // sort by a hostile column (values embed the id, so the order is
      // total), stable-tiebroken by id
      val sorted = DatasetSort(typed,
        Seq(DatasetSort.SortCol(names.head)), stableTiebreak = Some("id"))
      // hashpart on a hostile hashlabel
      val parted = DatasetHashpart(sorted, names.head, slices = 3)
      // split column-wise and merge back by id (later side wins on dups —
      // none here, so this is a pure reassembly)
      val left = parted.select(graft.core.Cols.q("id"),
        graft.core.Cols.q(names.head))
      val right = parted.select((graft.core.Cols.q("id") +:
        names.tail.map(graft.core.Cols.q)).toIndexedSeq: _*)
      val merged = DatasetMerge.byKey(left, right, "id")
      // second CSV round trip over the merged shape
      val out2 = s"$dir/two.csv"
      CsvExport(merged, out2, CsvExportConfig(quoteMode = "lazy", header = true))
      val back = DatasetType(CsvImport(s, out2).data, types).good
      val want = DatasetChecksum.value(df)
      assert(DatasetChecksum.value(merged) == want, s"$clue (merge stage)")
      assert(DatasetChecksum.value(back) == want, s"$clue (csv round trip)")
    }
  }
}
