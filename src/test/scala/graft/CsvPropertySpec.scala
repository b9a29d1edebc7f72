package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.ops.CsvImport

/** Property tests (ScalaCheck generators, deterministic seeds): any
  * single-line cell content survives the render-quote/split round trip
  * (the reference proves this with its corner-case generator,
  * a_test_csvimport_corner_cases.py byteline).
  */
class CsvPropertySpec extends AnyFunSuite {

  // single-line cells: printable chars plus separators/quotes — the
  // line-based format excludes record separators by construction
  private val cell: Gen[String] =
    Gen.listOf(Gen.oneOf(Gen.alphaNumChar, Gen.oneOf(',', '"', '\'', ';',
      ' ', '\t', 'å', '中', '|', '=', '.'))).map(_.mkString)

  private def sample[A](g: Gen[A], i: Int): A =
    g.pureApply(Gen.Parameters.default, Seed(42L + i))

  private def renderLine(cells: Seq[String], sep: Char): String =
    cells.map { c =>
      val needs = c.contains(sep) || c.contains('"')
      if (needs) "\"" + c.replace("\"", "\"\"") + "\"" else c
    }.mkString(sep.toString)

  test("lazy-quoted render splits back to the original cells (500 cases)") {
    val seps = Seq(',', ';', '\t')
    (0 until 500).foreach { i =>
      val cells = sample(Gen.listOfN(3, cell), i)
      val sep = seps(i % seps.size)
      val line = renderLine(cells, sep)
      val split = CsvImport.splitLine(line, sep, Set('"'))
      assert(split.toSeq == cells,
        s"case $i: line=$line sep=$sep split=${split.toSeq} cells=$cells")
    }
  }

  test("always-quoted render splits back too (500 cases)") {
    (0 until 500).foreach { i =>
      val cells = sample(Gen.listOfN(4, cell), 10000 + i)
      val line = cells.map(c => "\"" + c.replace("\"", "\"\"") + "\"").mkString(",")
      val split = CsvImport.splitLine(line, ',', Set('"'))
      assert(split.toSeq == cells, s"case $i: line=$line")
    }
  }
}
