package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.ops.{DatasetSort, DatasetChecksum, DatasetHashpart, DatasetMerge}
import TestSpark.spark

/** Sort semantics (a_test_sorting.py), checksum invariance
  * (a_dataset_checksum.py) and hashpart/merge contracts.
  */
class SortAndOpsSpec extends AnyFunSuite {

  test("sort: nulls smallest for numerics, largest for timestamps") {
    val s = spark
    import s.implicits._
    val df = Seq[(java.lang.Long, String)]((3L, "c"), (null, "n"), (1L, "a"))
      .toDF("k", "v")
    val got = DatasetSort(df, Seq(DatasetSort.SortCol("k")), acrossSlices = true)
      .collect().map(_.getString(1)).toSeq
    assert(got == Seq("n", "a", "c"), "null sorts first for numeric")

    val ts = Seq(("2020-01-02", "b"), (null, "n"), ("2020-01-01", "a"))
      .toDF("t", "v").withColumn("t", col("t").cast("timestamp"))
    val got2 = DatasetSort(ts, Seq(DatasetSort.SortCol("t")), acrossSlices = true)
      .collect().map(_.getString(1)).toSeq
    assert(got2 == Seq("a", "b", "n"), "null sorts last for datetime family")
  }

  test("sort: NaN sorts largest (reference filter_unsortable placement)") {
    val s = spark
    import s.implicits._
    val df = Seq((1.0, "a"), (Double.NaN, "nan"), (99.0, "z")).toDF("k", "v")
    val got = DatasetSort(df, Seq(DatasetSort.SortCol("k")), acrossSlices = true)
      .collect().map(_.getString(1)).toSeq
    assert(got == Seq("a", "z", "nan"))
  }

  test("sort: stable via explicit tiebreak column") {
    val s = spark
    import s.implicits._
    val df = (0 until 100).map(i => (i % 3, i.toLong)).toDF("k", "seq")
      .repartition(7)
    val got = DatasetSort(df, Seq(DatasetSort.SortCol("k")),
      acrossSlices = true, stableTiebreak = Some("seq"))
      .collect().map(r => (r.getInt(0), r.getLong(1))).toSeq
    assert(got == got.sorted, "equal keys must preserve seq order")
  }

  test("trigger_column: equal trigger values never straddle partitions") {
    val s = spark
    import s.implicits._
    val df = (0 until 1000).map(i => (i % 10, i)).toDF("trig", "v")
      .repartition(8)
    val sorted = DatasetSort(df,
      Seq(DatasetSort.SortCol("trig"), DatasetSort.SortCol("v")),
      triggerColumn = Some("trig"))
    val placement = sorted.select(col("trig"), spark_partition_id().as("pid"))
      .distinct().collect().map(r => (r.getInt(0), r.getInt(1))).toSeq
    val byTrig = placement.groupBy(_._1).view.mapValues(_.map(_._2).distinct.size)
    assert(byTrig.values.forall(_ == 1),
      s"each trigger value must live in exactly one partition: $placement")
    // and the rows are globally ordered when read partition-by-partition
    val rows = sorted.select(col("trig"), col("v")).collect()
      .map(r => (r.getInt(0), r.getInt(1))).toSeq
    assert(rows == rows.sorted)
  }

  test("checksum: invariant to partitioning and order, sensitive to data") {
    val s = spark
    import s.implicits._
    val df = (0 until 500).map(i => (i, s"row$i", i * 1.5)).toDF("a", "b", "c")
    val x = DatasetChecksum.value(df.repartition(11))
    val y = DatasetChecksum.value(df.orderBy(col("c").desc).repartition(2))
    assert(x == y)
    val mutated = (0 until 500).map(i => (i, s"row$i", if (i == 250) 0.0 else i * 1.5))
      .toDF("a", "b", "c")
    assert(x != DatasetChecksum.value(mutated))
  }

  test("checksum chain: sums add across snapshots") {
    val s = spark
    import s.implicits._
    val a = Seq((1, "x")).toDF("k", "v")
    val b = Seq((2, "y")).toDF("k", "v")
    val whole = a.unionByName(b)
    assert(DatasetChecksum.chain(Seq(a, b)) == DatasetChecksum.value(whole))
  }

  test("hashpart: each key in exactly one partition") {
    val s = spark
    import s.implicits._
    val df = (0 until 1000).map(i => (i % 37, i)).toDF("k", "v")
    val parts = DatasetHashpart(df, "k", 8)
      .select(col("k"), spark_partition_id().as("pid")).distinct()
      .groupBy("k").count().collect().map(_.getLong(1))
    assert(parts.forall(_ == 1L))
  }

  test("merge byKey: later dataset wins on column conflicts") {
    val s = spark
    import s.implicits._
    val a = Seq((1, "old", 10)).toDF("k", "name", "x")
    val b = Seq((1, "new")).toDF("k", "name")
    val m = DatasetMerge.byKey(a, b, "k").collect().head
    assert(m.getAs[String]("name") == "new")
    assert(m.getAs[Int]("x") == 10)
  }
}
