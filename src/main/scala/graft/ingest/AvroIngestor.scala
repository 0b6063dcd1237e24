package graft.ingest

import scala.jdk.CollectionConverters._

import org.apache.avro.Schema
import org.apache.avro.file.{DataFileStream, DataFileWriter, DataFileReader, SeekableByteArrayInput}
import org.apache.avro.generic.{GenericData, GenericDatumReader, GenericDatumWriter, GenericRecord}
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, Encoders, Row, SparkSession}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types._

/** Avro container-file ingestion — the remaining common lake format
  * after json/csv/parquet (reference file_scanner.py:15-30's
  * classifier model) and ORC (ing16). This distribution ships the
  * Avro LIBRARY but not the `spark-avro` datasource module, so the
  * leg is built the way the multimodal codecs are (Multimodal.scala):
  * a `binaryFile` scan feeding a batched `mapPartitions` decode —
  * whole-file semantics, matching Avro's container framing.
  *
  * Scale shape, stated honestly: Avro is a row-major format — there
  * is no predicate pushdown into blocks (nothing like parquet's
  * row-group stats exists to prune on), so filters run post-decode in
  * the same stage. What Avro DOES support natively is COLUMN
  * projection via reader-schema resolution: a reader schema holding a
  * subset of the writer's fields makes the decoder SKIP unrequested
  * fields (schema-resolution skip, not read-then-drop) — [[readAvro]]
  * accepts the projected column list and builds that reader schema,
  * the avro-native analog of parquet's ReadSchema pruning. File-level
  * pruning (pathGlobFilter, partition dirs) rides the binaryFile scan
  * unchanged. One decoded file never amplifies: each mapPartitions
  * task decodes only the files in its own partition, streaming blocks
  * through one reusable GenericRecord.
  */
object AvroIngestor {

  /** Spark → Avro schema for the primitive column types the lake
    * tables use; every field is a nullable union, Avro's idiom for
    * SQL nullability.
    */
  def toAvroSchema(schema: StructType, name: String = "row"): Schema = {
    def prim(dt: DataType): Schema = dt match {
      case LongType => Schema.create(Schema.Type.LONG)
      case IntegerType => Schema.create(Schema.Type.INT)
      case DoubleType => Schema.create(Schema.Type.DOUBLE)
      case FloatType => Schema.create(Schema.Type.FLOAT)
      case BooleanType => Schema.create(Schema.Type.BOOLEAN)
      case StringType => Schema.create(Schema.Type.STRING)
      case BinaryType => Schema.create(Schema.Type.BYTES)
      case other => throw new IllegalArgumentException(
        s"unsupported Avro ingest column type: $other")
    }
    val fields = schema.fields.map { f =>
      new Schema.Field(f.name,
        Schema.createUnion(Schema.create(Schema.Type.NULL), prim(f.dataType)),
        null, Schema.Field.NULL_DEFAULT_VALUE)
    }
    Schema.createRecord(name, null, "graft", false, fields.toList.asJava)
  }

  /** Avro → Spark schema (primitives + [null, T] unions). */
  def toSparkSchema(avro: Schema): StructType = {
    def unwrap(s: Schema): Schema =
      if (s.getType == Schema.Type.UNION)
        s.getTypes.asScala.find(_.getType != Schema.Type.NULL)
          .getOrElse(throw new IllegalArgumentException(s"all-null union: $s"))
      else s
    def dt(s: Schema): DataType = unwrap(s).getType match {
      case Schema.Type.LONG => LongType
      case Schema.Type.INT => IntegerType
      case Schema.Type.DOUBLE => DoubleType
      case Schema.Type.FLOAT => FloatType
      case Schema.Type.BOOLEAN => BooleanType
      case Schema.Type.STRING => StringType
      case Schema.Type.BYTES => BinaryType
      case other => throw new IllegalArgumentException(
        s"unsupported Avro ingest field type: $other")
    }
    StructType(avro.getFields.asScala.toSeq.map(f =>
      StructField(f.name, dt(f.schema), nullable = true)))
  }

  /** Writer schema from one container file's HEADER — a bounded
    * stream open (DataFileStream parses the header before any block),
    * never a whole-file read: schema discovery on a million-file
    * prefix touches one file's first kilobytes.
    */
  def writerSchema(s: SparkSession, file: String): Schema = {
    val p = new Path(file)
    val fs = p.getFileSystem(s.sessionState.newHadoopConf())
    val in = fs.open(p)
    try {
      val dfs = new DataFileStream[GenericRecord](in,
        new GenericDatumReader[GenericRecord]())
      try dfs.getSchema finally dfs.close()
    } finally in.close()
  }

  /** Write `df` as Avro container files under `dir`, one file per
    * partition (part-<n>.avro), each task streaming its own partition
    * through a DataFileWriter. Commit protocol: stale part files are
    * cleared DRIVER-SIDE before the job launches (so an overwrite of a
    * reused dir never keeps a previous job's data), then each attempt
    * writes a task-attempt-unique dot-prefixed temp name and commits
    * by RENAME ONLY — a task never deletes the final name, so a
    * lagging retry/speculative twin cannot destroy an already-
    * committed file: its rename fails against the existing complete
    * file and is treated as the twin having won (both attempts hold
    * the same rows). A failed attempt's temp file is deleted on the
    * spot and, being dot-prefixed, invisible to the discovery walk
    * (FileScanner's default ignore patterns) even if the delete dies.
    */
  def writeAvro(df: DataFrame, dir: String): Unit = {
    val schema = df.schema
    val avroJson = toAvroSchema(schema).toString
    val hconf = df.sparkSession.sessionState.newHadoopConf()
    val confS = new org.apache.spark.util.SerializableConfiguration(hconf)
    // driver-side pre-clean, BEFORE any task can commit: a stale
    // part-*.avro from a previous job must not survive an overwrite,
    // and doing it here (not in tasks) keeps the task protocol
    // rename-only — no attempt ever deletes a committed file
    val root = new Path(dir)
    val rootFs = root.getFileSystem(hconf)
    if (rootFs.exists(root))
      rootFs.listStatus(root).foreach { st =>
        // \d+ not \d{5}: %05d WIDENS past 100k partitions, and a stale
        // survivor would silently ride into the new dataset (or make a
        // twin-rename read as "already committed"); a failed delete
        // must fail the write for the same reason. Orphaned attempt
        // temps (a crashed JVM whose finally never ran) are cleared
        // too — dot-prefixed, so they never pollute reads, but a
        // reused dir must not accumulate them forever
        val name = st.getPath.getName
        if ((name.matches("part-\\d+\\.avro") ||
            name.matches("\\.part-\\d+-attempt-\\d+\\.avro\\.tmp")) &&
            !rootFs.delete(st.getPath, false))
          throw new java.io.IOException(
            s"could not clear stale avro part ${st.getPath}")
      }
    df.foreachPartition { (it: Iterator[Row]) =>
      val tc = org.apache.spark.TaskContext.get()
      val pid = tc.partitionId()
      val avro = new Schema.Parser().parse(avroJson)
      val p = new Path(f"$dir/part-$pid%05d.avro")
      val tmp = new Path(f"$dir/.part-$pid%05d-attempt-${tc.taskAttemptId()}%d.avro.tmp")
      val fs = p.getFileSystem(confS.value)
      val out = fs.create(tmp, true)
      val w = new DataFileWriter[GenericRecord](
        new GenericDatumWriter[GenericRecord](avro))
      w.create(avro, out) // DataFileWriter closes `out` on close()
      var committed = false
      try {
        it.foreach { row =>
          val rec = new GenericData.Record(avro)
          var i = 0
          while (i < schema.length) {
            rec.put(i, if (row.isNullAt(i)) null else row.get(i) match {
              case s: String => s
              case b: Array[Byte] => java.nio.ByteBuffer.wrap(b)
              case v => v
            })
            i += 1
          }
          w.append(rec)
        }
        w.close() // flush + close BEFORE rename: the final name only
        //          ever holds complete files
        if (!fs.rename(tmp, p)) {
          // rename-only commit: failure against an EXISTING final file
          // means a twin attempt already committed the same rows — the
          // loser cleans its temp and succeeds; any other failure is real
          if (!fs.exists(p))
            throw new java.io.IOException(s"avro commit rename failed: $tmp -> $p")
          fs.delete(tmp, false): Unit
        }
        committed = true
      } finally {
        if (!committed) {
          try w.close() catch { case _: Throwable => () }
          try { fs.delete(tmp, false); () } catch { case _: Throwable => () }
        }
      }
    }
  }

  /** Read Avro container files under `pathGlob` into a DataFrame,
    * with optional column projection (`columns`) applied as an Avro
    * READER schema so the decoder skips unrequested fields, plus
    * `_source_file` lineage (the A11 contract every ingest leg
    * carries).
    */
  def readAvro(s: SparkSession, pathGlob: String,
      columns: Seq[String] = Nil): DataFrame = {
    val files = FileScanner.discover(pathGlob, fileTypes = Seq("avro"),
      hadoopConf = s.sessionState.newHadoopConf())
    // legacy convenience surface: Nil means "no projection" here;
    // callers that need to distinguish "project nothing" use
    // readAvroFiles' Option directly (LakeIngestor's intersection)
    readAvroFiles(s, files("avro"), if (columns.isEmpty) None else Some(columns))
  }

  /** [[readAvro]] over an already-discovered file list — the entry a
    * caller that ran its own listing under its own ignore/include
    * semantics uses (LakeIngestor), so the Avro leg can never re-list
    * a prefix under DIFFERENT exclude rules than the dispatch did.
    */
  def readAvroFiles(s: SparkSession, paths: Seq[String],
      columns: Option[Seq[String]] = None): DataFrame = {
    require(paths.nonEmpty, "no .avro files to read")
    val writer = writerSchema(s, paths.head)
    // None = no projection (full writer schema); Some(Nil) = project
    // NOTHING — an empty reader record, so the decoder skips every
    // writer field and rows carry only lineage (a caller whose
    // declared schema shares no columns with the writer must get
    // correctly-counted all-NULL rows, not a silent full decode)
    val reader = columns match {
      case None => writer
      case Some(cols) =>
        val byName = writer.getFields.asScala.map(f => f.name -> f).toMap
        val picked = cols.map(c => byName.getOrElse(c,
          throw new IllegalArgumentException(s"column $c not in Avro schema")))
        Schema.createRecord(writer.getName, null, writer.getNamespace, false,
          picked.map(f => new Schema.Field(f.name, f.schema, null,
            Schema.Field.NULL_DEFAULT_VALUE)).asJava)
    }
    val outSchema = toSparkSchema(reader)
      .add(StructField("_source_file", StringType, nullable = false))
    val readerJson = reader.toString
    val writerJson = writer.toString
    val bin = s.read.format("binaryFile").load(paths: _*)
      .select(col("path"), col("content"))
    val n = outSchema.length - 1
    bin.mapPartitions { it =>
      val rs = new Schema.Parser().parse(readerJson)
      val ws = new Schema.Parser().parse(writerJson)
      it.flatMap { fileRow =>
        val name = fileRow.getString(0).split('/').last
        val bytes = fileRow.getAs[Array[Byte]](1)
        val dr = new DataFileReader[GenericRecord](
          new SeekableByteArrayInput(bytes),
          new GenericDatumReader[GenericRecord](ws, rs))
        // drain eagerly: the iterator must not outlive the reader
        val rows = Vector.newBuilder[Row]
        try {
          var rec: GenericRecord = null
          while (dr.hasNext) {
            rec = dr.next(rec) // one reusable record per file
            val vals = new Array[Any](n + 1)
            var i = 0
            while (i < n) {
              vals(i) = rec.get(i) match {
                case null => null
                case u: org.apache.avro.util.Utf8 => u.toString
                case bb: java.nio.ByteBuffer =>
                  val a = new Array[Byte](bb.remaining()); bb.get(a); a
                case v => v
              }
              i += 1
            }
            vals(n) = name
            rows += Row.fromSeq(vals.toIndexedSeq)
          }
        } finally dr.close()
        rows.result()
      }
    }(Encoders.row(outSchema)).toDF()
  }
}
