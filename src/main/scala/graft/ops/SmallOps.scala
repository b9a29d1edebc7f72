package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType
import graft.core.Cols.{q => Q}

/** dataset_hashpart (reference standard_methods/a_dataset_hashpart.py:32-135):
  * rewrite a dataset partitioned by a new hashlabel. In Spark this is a
  * single hash-shuffle; co-partitioned consumers (joins/aggs on the
  * hashlabel) then run shuffle-free. Murmur3 replaces the reference's
  * SipHash-2-4 (bit compat is a non-goal, SURVEY §1.3).
  */
object DatasetHashpart {
  /** @param spreadNone round-robin the NULL rows across slices instead of
    *   hashing them all into one (reference spread_None,
    *   dsutilmodule.c:559-560) — with a null-heavy hashlabel the
    *   all-nulls partition is a real straggler at scale. Null placement
    *   is not semantic (iteration by hashlabel only guarantees non-null
    *   co-location), so the spread term is a deterministic hash of the
    *   WHOLE row — never a position-derived id like
    *   monotonically_increasing_id, whose value changes when a map task
    *   is recomputed after a fetch failure (SPARK-23207: reducers that
    *   already fetched the old assignment lose or duplicate rows).
    *   Byte-identical null-key duplicates co-bucket under a content
    *   hash, which is acceptable: they carry no skewed key by definition.
    */
  def apply(df: DataFrame, hashlabel: String, slices: Int,
            spreadNone: Boolean = false): DataFrame =
    if (!spreadNone) df.repartition(slices, Q(hashlabel))
    else df.repartition(slices,
      when(Q(hashlabel).isNotNull, Q(hashlabel).cast("string"))
        .otherwise(concat(lit("\u0000spread\u0000"),
          pmod(hash(struct(df.columns.toIndexedSeq.map(Q): _*)),
            lit(slices)).cast("string"))))

  /** `as_chain` (a_dataset_hashpart.py as_chain=True): instead of merging
    * the whole source chain into one dataset, hashpart each chained
    * snapshot separately and emit a parallel chain — incremental consumers
    * keep their per-snapshot boundaries.
    */
  def asChain(store: graft.core.SnapshotStore, sourceName: String,
              hashlabel: String, slices: Int, outPrefix: String): Seq[graft.core.Snapshot] = {
    val sources = store.chain(sourceName).reverse // oldest first
    var prev: Option[String] = None
    sources.map { src =>
      val outName = s"$outPrefix.${src.meta.name}"
      val snap = store.write(
        apply(store.readResolved(src.meta.name), hashlabel, slices),
        outName, hashlabel = Some(hashlabel), previous = prev, slices = slices)
      prev = Some(outName)
      snap
    }
  }
}

/** dataset_filter_columns (reference a_dataset_filter_columns.py:27-44):
  * keep/discard columns. Metadata-only in the reference; in Spark a `select`
  * — Catalyst column pruning makes it zero-cost (the scan never reads the
  * dropped columns).
  */
object FilterColumns {
  def keep(df: DataFrame, cols: Seq[String]): DataFrame =
    df.select(cols.map(Q): _*)
  def discard(df: DataFrame, cols: Set[String]): DataFrame =
    df.select(df.columns.filterNot(cols.contains).map(Q).toSeq: _*)
}

/** dataset_merge (reference a_dataset_merge.py:19-39 → dataset.py:329-377):
  * column-wise merge of line-aligned datasets, later datasets' columns win.
  *
  * Two strategies:
  *  - `byKey`: both sides carry a row-identity column (lineno or any unique
  *    key) → plain join; at scale this is a shuffle-join on the key unless
  *    both sides are already co-partitioned on it.
  *  - `zip`: RDD zip for same-partitioning same-count inputs (the
  *    reference's actual precondition — "related, line-count-aligned");
  *    no shuffle at all.
  */
object DatasetMerge {
  /** Merge two SNAPSHOTS with the reference's hashlabel-conflict guard
    * (dataset.py:341-350): merging datasets hashed on different columns
    * silently breaks co-partitioning assumptions — error unless
    * `allowUnrelated`.
    */
  def snapshots(store: graft.core.SnapshotStore, a: String, b: String,
                key: String, allowUnrelated: Boolean = false): DataFrame = {
    val (ma, mb) = (store.get(a).meta, store.get(b).meta)
    if (!allowUnrelated)
      (ma.hashlabel, mb.hashlabel) match {
        case (Some(ha), Some(hb)) if ha != hb =>
          throw new IllegalArgumentException(
            s"dataset_merge: conflicting hashlabels $ha vs $hb (allowUnrelated to override)")
        case _ =>
      }
    // line alignment from METADATA (free — the reference errors on
    // non-aligned datasets the same way, dataset.py:334-339)
    require(ma.lines == mb.lines,
      s"dataset_merge: $a has ${ma.lines} lines but $b has ${mb.lines} — not line-aligned")
    byKey(store.readResolved(a), store.readResolved(b), key, checkAligned = false)
  }

  /** @param checkAligned verify (one agg pass per side) that both inputs
    *   have the same row count and unique keys — an inner join would
    *   otherwise silently DROP rows whose key is missing on one side or
    *   fan out on duplicates (the reference errors on non-aligned
    *   datasets). Callers holding metadata proof can pass false.
    */
  def byKey(a: DataFrame, b: DataFrame, key: String,
            checkAligned: Boolean = true): DataFrame = {
    if (checkAligned) {
      val Seq((na, nda), (nb, ndb)) = Seq(a, b).map { d =>
        val r = d.agg(count(lit(1)), count_distinct(Q(key))).collect()(0)
        (r.getLong(0), r.getLong(1))
      }
      require(na == nb, s"dataset_merge: inputs are not line-aligned ($na vs $nb rows)")
      require(na == nda && nb == ndb,
        s"dataset_merge: key '$key' has duplicates ($nda/$ndb distinct of $na rows)")
    }
    val overlap = a.columns.toSet.intersect(b.columns.toSet) - key
    // later dataset wins on column conflicts (dataset.py:361-366)
    val aKept = a.select((a.columns.filterNot(overlap.contains)).map(Q).toSeq: _*)
    aKept.join(b, Seq(key))
  }

  def zip(a: DataFrame, b: DataFrame): DataFrame = {
    val overlap = a.columns.toSet.intersect(b.columns.toSet)
    val aKept = a.select(a.columns.filterNot(overlap.contains).map(Q).toSeq: _*)
    val schema = StructType(aKept.schema.fields ++ b.schema.fields)
    val rdd = aKept.rdd.zip(b.rdd).map { case (x, y) => Row.fromSeq(x.toSeq ++ y.toSeq) }
    a.sparkSession.createDataFrame(rdd, schema)
  }
}

/** dataset_unroundrobin (reference a_dataset_unroundrobin.py:38-100):
  * restore original (file) order. Our snapshots carry an explicit lineno
  * column (SURVEY §7.4: Spark has no stable slice identity, so order is a
  * *column*, deterministic and shuffle-definable), so unroundrobin is an
  * orderBy — or, to keep it partitioned, repartitionByRange on lineno which
  * restores global order across partitions.
  */
object Unroundrobin {
  /** @param triggerColumn keep runs of equal trigger values inside one
    *   slice while restoring file order (a_dataset_unroundrobin.py
    *   trigger_column) — range-partition on the trigger instead of the
    *   lineno, then order by lineno within each slice.
    */
  def apply(df: DataFrame, lineno: String, slices: Int = 0,
            triggerColumn: Option[String] = None): DataFrame = {
    require(triggerColumn.isEmpty || slices > 0,
      "unroundrobin: triggerColumn only takes effect with slices > 0 " +
      "(it governs which slice a run of equal values lands in)")
    val ranged = (slices, triggerColumn) match {
      case (n, Some(t)) if n > 0 => df.repartitionByRange(n, Q(t))
      case (n, None) if n > 0    => df.repartitionByRange(n, Q(lineno))
      case _                     => df
    }
    ranged.sortWithinPartitions(Q(lineno))
  }
}

/** Round-robin redistribution (the writer-side counterpart the reference
  * uses when no hashlabel is set, dataset.py:1321-1386): Spark's
  * `repartition(n)` without columns IS round-robin.
  */
object Roundrobin {
  def apply(df: DataFrame, slices: Int): DataFrame = df.repartition(slices)
}
