package graft.ops

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions._

/** Write-layout operators: how a 100 TB table should land on disk so that
  * DOWNSTREAM scans are cheap (north-star extension; the reference's only
  * sink is a 5-row JSON document, SparkApplication.scala:90-95).
  *
  * Parquet keeps min/max statistics per row group and per file; a scan
  * with a range predicate skips row groups whose stats exclude it. That
  * skipping is only effective if the writer CLUSTERS rows by the predicate
  * column — a randomly-ordered table has every file spanning the whole key
  * domain, so nothing skips. Range-clustering is the 1-D answer (and the
  * building block Delta/Iceberg OPTIMIZE uses); each output file covers a
  * narrow, pairwise-disjoint key range.
  */
object Layout {

  /** Range-clustered parquet write: `repartitionByRange` on the cluster
    * key (Spark samples the key distribution to build balanced range
    * boundaries — skew-safe by construction) + `sortWithinPartitions`, so
    * files are pairwise disjoint in the cluster key AND internally sorted
    * (row groups inside a file get monotone min/max too). One shuffle,
    * then a streaming per-partition sort that spills — no driver
    * involvement at any size.
    *
    * Secondary `sortCols` order rows WITHIN equal cluster-key runs, for
    * composite access patterns (e.g. cluster by date, sort by key).
    */
  def writeRangeClustered(df: DataFrame, path: String, numFiles: Int,
                          clusterCol: String, sortCols: String*): Unit =
    df.repartitionByRange(numFiles, col(clusterCol))
      .sortWithinPartitions((clusterCol +: sortCols).map(col): _*)
      .write.mode(SaveMode.Overwrite).parquet(path)
}
