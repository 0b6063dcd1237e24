package graft.ingest

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, lit}
import org.apache.spark.sql.types.StructType

/** Mixed-format lake ingestion — the extension classifier's dispatch
  * (reference file_scanner.py:15-30, FileScanner.ExtensionMap) carried
  * end-to-end: ONE landing prefix holding whatever formats upstream
  * teams produce (jsonl, csv, parquet, orc, avro) is discovered once,
  * each format read by its native reader, and the slices unified by
  * NAME onto a caller-declared schema (the A12 union-NULL-fill
  * contract, with explicit types instead of §1.2's all-string
  * normalization — a LAKE reader serves analytics, so numeric columns
  * must stay numeric; the reference-exact string pipeline remains
  * [[JsonIngestor]]).
  *
  * Scale shape: one listing (FileScanner's single recursive
  * `listFiles` — one bulk LIST per prefix on object stores), then at
  * most five scans, one per format actually present — never a scan
  * per file. The JSON leg reads LINE-DELIMITED files under the
  * declared schema (splittable by byte range — the right landing
  * shape at scale; whole-file multiLine semantics stay in
  * JsonIngestor). CSV reads the declared schema positionally with a
  * header row. Column pruning and predicate pushdown ride each
  * columnar leg natively; the avro leg projects via reader-schema
  * resolution (AvroIngestor).
  */
object LakeIngestor {

  def ingestMixed(spark: SparkSession, dir: String, schema: StructType,
      excludePatterns: Seq[String] = FileScanner.DefaultIgnorePatterns): DataFrame = {
    val found = FileScanner.discover(dir,
      Seq("json", "csv", "parquet", "orc", "avro"), recursive = true,
      Nil, excludePatterns, spark.sessionState.newHadoopConf())
    // unify by NAME onto the declared schema: a column absent from a
    // slice lands as typed NULL (A12), present columns are cast
    def conform(df: DataFrame): DataFrame = {
      val present = df.columns.toSet
      df.select(schema.fields.toSeq.map { f =>
        (if (present(f.name)) col(f.name) else lit(null))
          .cast(f.dataType).as(f.name)
      }: _*)
    }
    val legs = Seq[(String, Seq[String] => DataFrame)](
      "json" -> (fs => spark.read.schema(schema).json(fs: _*)),
      "csv" -> (fs => spark.read.option("header", "true").schema(schema).csv(fs: _*)),
      "parquet" -> (fs => spark.read.parquet(fs: _*)),
      "orc" -> (fs => spark.read.orc(fs: _*)),
      // the avro leg reads EXACTLY the files this listing discovered
      // (readAvroFiles — a re-discovery under default excludes could
      // silently diverge from the caller's patterns), and projects the
      // INTERSECTION of declared and writer columns so a column absent
      // from the avro slice NULL-fills through conform() like every
      // other leg (A12) instead of failing the strict projection. The
      // intersection is passed as Some(...) even when EMPTY: Some(Nil)
      // is "project nothing" (rows decode field-free, conform NULL-
      // fills them), where Nil-as-no-projection would silently invert
      // the intent and decode every writer field
      "avro" -> { fs =>
        val writerCols = AvroIngestor
          .toSparkSchema(AvroIngestor.writerSchema(spark, fs.head))
          .fieldNames.toSet
        AvroIngestor.readAvroFiles(spark, fs,
          columns = Some(schema.fieldNames.toSeq.filter(writerCols)))
      },
    ).collect { case (fmt, read) if found(fmt).nonEmpty => conform(read(found(fmt))) }
    require(legs.nonEmpty, s"no supported lake files under $dir")
    legs.reduce(_.unionByName(_))
  }
}
