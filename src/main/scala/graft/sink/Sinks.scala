package graft.sink

import org.apache.spark.sql.{DataFrame, Observation, SaveMode, SparkSession}
import org.apache.spark.sql.functions.{count, lit}

/** Table sinks (reference A14-A15: idempotent DDL + batched insert,
  * sqlite_connector.py:131-222).
  *
  * The reference's SQLite sink becomes three Spark-native options:
  *  - [[saveTable]]: managed table via `saveAsTable` (append = the
  *    reference's insert-into-existing semantics; DDL-if-absent is
  *    implicit). Parquet under the hood — the 100 TB path, partitioned
  *    by any caller-supplied columns.
  *  - [[saveParquet]]: plain parquet directory sink.
  *  - [[saveJdbc]]: JDBC batch insert, `batchsize` mirroring the
  *    reference's executemany batch_size=1000. Per-partition
  *    transactions (weaker than the reference's single global
  *    commit+rollback — documented; stage to a temp table for exactly-
  *    once).
  */
object Sinks {

  /** Returns the row count written (the reference's insert_data return,
    * A19 metrics). The count rides the write via `observe()` — ONE pass
    * over the data, not a count scan plus a write scan.
    */
  def saveTable(df: DataFrame, table: String,
      partitionBy: Seq[String] = Nil, mode: SaveMode = SaveMode.Append): Long = {
    val obs = Observation()
    val observed = df.observe(obs, count(lit(1)).as("n"))
    val w = observed.write.mode(mode)
    (if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w).saveAsTable(table)
    obs.get("n").asInstanceOf[Long]
  }

  def saveParquet(df: DataFrame, path: String,
      partitionBy: Seq[String] = Nil, mode: SaveMode = SaveMode.Overwrite): Unit = {
    val w = df.write.mode(mode)
    (if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w).parquet(path)
  }

  /** DYNAMIC partition overwrite: replaces exactly the partitions
    * present in `df`, leaving every other partition untouched — the
    * restatement primitive of a partitioned warehouse (static
    * Overwrite would drop ALL partitions first; Append would
    * duplicate). The session flag is set for this write only and
    * restored after, so other writers keep the session default.
    */
  def overwritePartitionsDynamic(df: DataFrame, path: String,
      partitionBy: Seq[String]): Unit = {
    require(partitionBy.nonEmpty, "dynamic overwrite needs partition columns")
    val s = df.sparkSession
    val key = "spark.sql.sources.partitionOverwriteMode"
    val prev = s.conf.getOption(key)
    s.conf.set(key, "dynamic")
    try df.write.mode(SaveMode.Overwrite).partitionBy(partitionBy: _*).parquet(path)
    finally prev.fold(s.conf.unset(key))(v => s.conf.set(key, v))
  }

  def saveJdbc(df: DataFrame, url: String, table: String,
      batchSize: Int = 1000, mode: SaveMode = SaveMode.Append): Unit =
    df.write.mode(mode)
      .format("jdbc")
      .option("url", url)
      .option("dbtable", table)
      .option("batchsize", batchSize)
      .save()

  def tableExists(spark: SparkSession, table: String): Boolean =
    spark.catalog.tableExists(table)

  /** Key-based idempotent append ("insert new records only"): appends
    * the incoming rows whose key is absent from the table, making
    * re-ingestion of an overlapping batch safe — the reference's
    * append-only insert (sqlite_connector.py:178-222) silently
    * duplicates on replay. A key repeated WITHIN the incoming batch is
    * also collapsed to one row (deterministically: the row whose
    * non-key values sort first), so the table's key uniqueness can
    * never be broken — `dropDuplicates` would pick a partition-order-
    * dependent row and change under retry. Returns the number of rows
    * actually added.
    *
    * Scale shape: one shuffle on the key serves both the in-batch
    * dedup window and the left-anti join against existing keys (AQE
    * broadcasts the existing-keys side when it is small); nothing is
    * collected to the driver.
    */
  def upsertTable(spark: SparkSession, table: String, incoming: DataFrame,
      keys: Seq[String]): Long = {
    import org.apache.spark.sql.functions.{col, row_number}
    require(keys.nonEmpty, "upsert needs at least one key column")
    val nonKey = incoming.columns.filterNot(keys.contains).toSeq
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(keys.map(col): _*)
      .orderBy((if (nonKey.nonEmpty) nonKey else keys).map(col): _*)
    val deduped = incoming.withColumn("_graft_rn", row_number().over(w))
      .filter(col("_graft_rn") === 1).drop("_graft_rn")
    val existingKeys = spark.table(table).select(keys.map(col): _*)
    saveTable(deduped.join(existingKeys, keys, "left_anti"), table)
  }

  /** Incremental aggregate maintenance: fold a batch of PARTIAL
    * aggregates into a stored aggregate table by union + re-combine on
    * `keys`. Every non-key column must be a decomposable aggregate —
    * COUNT/SUM partials, combined here by SUM (the AVG pattern is
    * sum+count stored separately, divided at read time). Per-batch cost
    * is one combine over |stored keys| + |batch keys| rows, never a
    * recompute over history — the materialized-view idiom that keeps
    * corpus-level statistics affordable when history is 100 TB.
    *
    * The merged plan is materialized (localCheckpoint) before the
    * overwrite: Spark cannot overwrite a table from a plan that is
    * still reading it.
    */
  def mergeAggregates(spark: SparkSession, table: String, batch: DataFrame,
      keys: Seq[String]): Unit = {
    import org.apache.spark.sql.functions.{col, sum}
    require(keys.nonEmpty, "merge needs at least one key column")
    if (!tableExists(spark, table)) { saveTable(batch, table, mode = SaveMode.Overwrite); () }
    else {
      val valueCols = batch.columns.filterNot(keys.contains).toSeq
      require(valueCols.nonEmpty, "merge needs at least one value column")
      val merged = spark.table(table).unionByName(batch)
        .groupBy(keys.map(col): _*)
        .agg(sum(col(valueCols.head)).as(valueCols.head),
          valueCols.tail.map(c => sum(col(c)).as(c)): _*)
        .localCheckpoint(true)
      saveTable(merged, table, mode = SaveMode.Overwrite)
      ()
    }
  }

  /** Bucketed managed table: pre-partitions (and optionally pre-sorts)
    * by the join/agg key so repeated joins between co-bucketed tables
    * run shuffle-free — the cluster-scale answer to "this join's
    * shuffle becomes the bottleneck at 100 TB". Verified by
    * SinksSpec: a join of two co-bucketed tables plans with no
    * shuffle Exchange.
    */
  def saveBucketedTable(df: DataFrame, table: String, bucketCols: Seq[String],
      numBuckets: Int, sortCols: Seq[String] = Nil,
      mode: SaveMode = SaveMode.Overwrite): Unit = {
    require(bucketCols.nonEmpty)
    val w = df.write.mode(mode)
      .bucketBy(numBuckets, bucketCols.head, bucketCols.tail: _*)
    (if (sortCols.nonEmpty) w.sortBy(sortCols.head, sortCols.tail: _*) else w)
      .format("parquet")
      .saveAsTable(table)
  }

  /** Part files of a parquet directory (data files only, no _SUCCESS /
    * checksums).
    */
  def parquetPartFiles(spark: SparkSession, path: String): Seq[String] = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) Nil
    else fs.listStatus(p).toSeq.map(_.getPath.getName)
      .filter(n => n.endsWith(".parquet") && !n.startsWith("."))
  }

  /** Small-files compaction: rewrite a parquet directory into
    * `targetFiles` files. The small-files problem is THE operational
    * failure mode of continuous ingestion at scale (every micro-batch
    * lands a file per partition; a month later the NameNode/listing
    * and per-file open costs dominate scans). One round-robin exchange
    * sized to the target count; content is untouched. Returns
    * (files before, files after).
    *
    * This is the one-shot primitive; `Layout.compact` (cmp01) is the
    * maintenance lifecycle on top — byte-budget sizing, versioned
    * marker-sealed output, optional range clustering.
    */
  def compactParquet(spark: SparkSession, inPath: String, outPath: String,
      targetFiles: Int): (Int, Int) = {
    require(targetFiles >= 1)
    spark.read.parquet(inPath)
      .repartition(targetFiles)
      .write.mode(SaveMode.Overwrite).parquet(outPath)
    (parquetPartFiles(spark, inPath).size, parquetPartFiles(spark, outPath).size)
  }
}
