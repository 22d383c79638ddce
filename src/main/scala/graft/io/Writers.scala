package graft.io

import org.apache.spark.sql.DataFrame

/** Parquet sinks (S12 — the reference persists nothing but raw cached
  * files; parquet is our canonical tabular sink, SURVEY §2.1).
  */
object Writers {

  /** Plain parquet write. */
  def parquet(df: DataFrame, path: String, mode: String = "overwrite"): Unit =
    df.write.mode(mode).parquet(path)

  /** Hive-style partitioned parquet — the 100 TB layout: partition
    * columns become directories (enabling partition pruning on read);
    * `targetFileCount` repartitions by the partition keys first so each
    * partition writes few large files instead of one file per task.
    */
  def parquetPartitioned(
      df: DataFrame,
      path: String,
      partitionCols: Seq[String],
      targetFileCount: Int = 0,
      mode: String = "overwrite"): Unit = {
    val arranged =
      if (targetFileCount > 0)
        df.repartition(targetFileCount,
          partitionCols.map(org.apache.spark.sql.functions.col): _*)
      else df
    arranged.write.mode(mode).partitionBy(partitionCols: _*).parquet(path)
  }
}
