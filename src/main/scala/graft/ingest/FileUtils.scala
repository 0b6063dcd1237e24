package graft.ingest

import java.nio.charset.StandardCharsets

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileUtil, Path}

/** File utilities around ingestion (reference A21,
  * file_handler.py:181-371): copy/move/delete, content md5, atomic
  * write. Hadoop FileSystem API so the same code works on local disks
  * and object stores.
  */
object FileUtils {

  private def fs(p: Path, conf: Configuration) = p.getFileSystem(conf)

  def copy(src: String, dst: String, conf: Configuration = new Configuration()): Boolean = {
    val (s, d) = (new Path(src), new Path(dst))
    FileUtil.copy(fs(s, conf), s, fs(d, conf), d, false, conf)
  }

  def move(src: String, dst: String, conf: Configuration = new Configuration()): Boolean = {
    val (s, d) = (new Path(src), new Path(dst))
    fs(s, conf).rename(s, d)
  }

  def delete(path: String, recursive: Boolean = false,
      conf: Configuration = new Configuration()): Boolean = {
    val p = new Path(path)
    fs(p, conf).delete(p, recursive)
  }

  def exists(path: String, conf: Configuration = new Configuration()): Boolean = {
    val p = new Path(path)
    fs(p, conf).exists(p)
  }

  /** Recursive delete, tolerant of a missing path (Unit-returning so
    * lifecycle code calls it for effect) — the one shared spelling of
    * "remove this index/temp tree via the Hadoop FS API".
    */
  def rmr(path: String, conf: Configuration = new Configuration()): Unit = {
    delete(path, recursive = true, conf)
    ()
  }

  def mkdirs(path: String, conf: Configuration = new Configuration()): Boolean = {
    val p = new Path(path)
    fs(p, conf).mkdirs(p)
  }

  /** Create an empty marker file (create-if-absent, never overwrite —
    * the commit-marker semantics the persisted-index lifecycles need:
    * a marker can only appear once per batch dir).
    */
  def touch(path: String, conf: Configuration = new Configuration()): Unit = {
    val p = new Path(path)
    fs(p, conf).create(p, false).close()
  }

  /** Immediate child DIRECTORIES of `path` as fully-qualified path
    * strings, sorted; Nil when `path` doesn't exist. One listStatus
    * call — a single LIST per prefix on object stores.
    */
  def listSubdirs(path: String, conf: Configuration = new Configuration()): Seq[String] = {
    val p = new Path(path)
    val filesystem = fs(p, conf)
    if (!filesystem.exists(p)) Nil
    else filesystem.listStatus(p).toSeq
      .filter(_.isDirectory).map(_.getPath.toString).sorted
  }

  /** Content md5 as lowercase hex (reference md5-hashes files <10MB;
    * streaming digest here has no size limit).
    */
  def md5(path: String, conf: Configuration = new Configuration()): String = {
    val p = new Path(path)
    val in = fs(p, conf).open(p)
    try {
      val digest = java.security.MessageDigest.getInstance("MD5")
      val buf = new Array[Byte](64 * 1024)
      var n = in.read(buf)
      while (n >= 0) { digest.update(buf, 0, n); n = in.read(buf) }
      digest.digest().map("%02x".format(_)).mkString
    } finally in.close()
  }

  /** Timestamped backup copy next to the file (reference
    * `FileHandler._create_backup`, file_handler.py:387-392:
    * `<stem>.backup_<yyyyMMdd_HHmmss><ext>` sibling via copy). Returns
    * the backup path; same-second collisions get a numeric suffix (the
    * reference would silently overwrite — strictly safer here).
    */
  def backup(path: String, conf: Configuration = new Configuration()): String = {
    val p = new Path(path)
    val filesystem = fs(p, conf)
    require(filesystem.exists(p), s"cannot back up missing file: $path")
    val ts = java.time.LocalDateTime.now()
      .format(java.time.format.DateTimeFormatter.ofPattern("yyyyMMdd_HHmmss"))
    val (stem, ext) = p.getName.lastIndexOf('.') match {
      case i if i > 0 => (p.getName.substring(0, i), p.getName.substring(i))
      case _ => (p.getName, "")
    }
    var bak = new Path(p.getParent, s"$stem.backup_$ts$ext")
    var i = 1
    while (filesystem.exists(bak)) {
      bak = new Path(p.getParent, s"$stem.backup_${ts}_$i$ext")
      i += 1
    }
    copy(path, bak.toString, conf)
    bak.toString
  }

  /** Atomic text write: write to a temp sibling then rename into place
    * (reference's tmp-file atomic JSON write, file_handler.py:181-231).
    */
  def atomicWrite(path: String, content: String,
      conf: Configuration = new Configuration()): Unit = {
    val target = new Path(path)
    val tmp = new Path(target.getParent, s".${target.getName}.tmp")
    val filesystem = fs(target, conf)
    val out = filesystem.create(tmp, true)
    try out.write(content.getBytes(StandardCharsets.UTF_8)) finally out.close()
    if (filesystem.exists(target)) filesystem.delete(target, false)
    if (!filesystem.rename(tmp, target))
      throw new java.io.IOException(s"atomic rename failed: $tmp -> $target")
  }
}
