package graft.ingest

import java.nio.charset.StandardCharsets

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path

/** The atomic-create primitive behind every claim and lease in the
  * engine's persisted-state lifecycles (batch-id claims, `_SAVING`
  * leases, `_APPENDED` seals — FileUtils.claimSeqDir / withSaveLease /
  * createExclusive), extracted behind a seam so the concurrency
  * guarantees hold where 100 TB actually lives, not just on
  * HDFS/file:.
  *
  * The contract is exactly one sentence: `createExclusive(path)`
  * returns true iff THIS call established the marker at `path`, under
  * any number of concurrent callers. Two implementations ship:
  *
  *  - [[FsClaimBackend]] (default): the filesystem's own atomic
  *    no-overwrite create — an atomic NameNode op on HDFS, O_EXCL via
  *    NIO on the local scheme. Correct wherever the Hadoop FS contract
  *    for `create(overwrite = false)` is honest.
  *  - [[ConditionalPutClaimBackend]]: the object-store shape — a
  *    conditional PUT (`If-None-Match: *` semantics) of a
  *    caller-unique token through a [[ConditionalStore]], followed by
  *    a read-back VERIFY of the token. On a store whose conditional
  *    PUT is truly atomic (S3 since 2024, GCS preconditions, Azure
  *    If-None-Match) the verify is a defense-in-depth tripwire; on a
  *    store whose "no-overwrite" is secretly check-then-write, the
  *    verify is what turns silent mutual success into a DETECTED lost
  *    claim — the overwritten caller sees a foreign token and reports
  *    false, so claimSeqDir retries with the next id instead of two
  *    writers sharing one batch dir (pinned in ClaimBackendSpec with a
  *    deliberately racy store).
  *
  * Markers stay real files either way ([[HadoopFsConditionalStore]]
  * writes through the FS API), so claim ENUMERATION — the other half
  * of the claimSeqDir protocol — keeps working unchanged.
  */
trait ClaimBackend {
  /** Short stable name (logs, SPARK_GRAFT_CLAIM_BACKEND matching). */
  def name: String

  /** Establish `path` as a claim/lease marker iff absent: true means
    * THIS call owns it, false means someone else does (a lost race is
    * ALWAYS false, never corruption).
    */
  def createExclusive(path: String, conf: Configuration): Boolean
}

/** Default backend: the filesystem's atomic no-overwrite create. On
  * HDFS, `create(overwrite = false)` is an atomic NameNode operation;
  * the local filesystem needs O_EXCL (NIO createFile), because
  * RawLocalFileSystem's no-overwrite create is exists-then-create and
  * two racers could both pass the check — this is the only place
  * engine code touches java.nio file APIs, and only for the file:
  * scheme.
  */
object FsClaimBackend extends ClaimBackend {
  val name = "fs"

  def createExclusive(path: String, conf: Configuration): Boolean = {
    val p = new Path(path)
    val filesystem = p.getFileSystem(conf)
    if ("file" == filesystem.getUri.getScheme) {
      val local = java.nio.file.Paths.get(p.toUri.getPath)
      try {
        Option(local.getParent).foreach(d => java.nio.file.Files.createDirectories(d))
        java.nio.file.Files.createFile(local)
        true
      } catch { case _: java.nio.file.FileAlreadyExistsException => false }
    } else {
      try { filesystem.create(p, false).close(); true }
      catch {
        case _: org.apache.hadoop.fs.FileAlreadyExistsException => false
        case e: java.io.IOException =>
          if (filesystem.exists(p)) false else throw e
      }
    }
  }
}

/** The object-store write surface [[ConditionalPutClaimBackend]]
  * claims through: a conditional PUT plus a read. A deployment against
  * a real object store binds these to the store's own primitives
  * (S3 `PutObject` with `If-None-Match: *`, GCS
  * `ifGenerationMatch(0)`, Azure `If-None-Match: *`); the shipped
  * [[HadoopFsConditionalStore]] maps them onto the Hadoop FS API so
  * the backend is drivable end to end here.
  */
trait ConditionalStore {
  /** PUT `body` at `path` iff no object exists there
    * (`If-None-Match: *`). True = the store ACCEPTED the write; on an
    * atomic store that implies ownership, on a racy one it does not —
    * which is exactly why the backend verifies by read-back.
    */
  def putIfAbsent(path: String, body: Array[Byte], conf: Configuration): Boolean

  /** Current object content, None if absent. */
  def get(path: String, conf: Configuration): Option[Array[Byte]]
}

/** [[ConditionalStore]] over the Hadoop FS API: putIfAbsent rides the
  * same atomic no-overwrite create as [[FsClaimBackend]] (with the
  * token as content), get is a plain read. Used to drive the
  * conditional-PUT protocol end to end against real directories (the
  * ConcurrentAppendSpec backends matrix).
  */
object HadoopFsConditionalStore extends ConditionalStore {
  def putIfAbsent(path: String, body: Array[Byte],
      conf: Configuration): Boolean = {
    val p = new Path(path)
    val filesystem = p.getFileSystem(conf)
    if ("file" == filesystem.getUri.getScheme) {
      val local = java.nio.file.Paths.get(p.toUri.getPath)
      try {
        Option(local.getParent).foreach(d => java.nio.file.Files.createDirectories(d))
        java.nio.file.Files.write(local, body,
          java.nio.file.StandardOpenOption.CREATE_NEW,
          java.nio.file.StandardOpenOption.WRITE)
        true
      } catch { case _: java.nio.file.FileAlreadyExistsException => false }
    } else {
      try {
        val out = filesystem.create(p, false)
        try out.write(body) finally out.close()
        true
      } catch {
        case _: org.apache.hadoop.fs.FileAlreadyExistsException => false
        case e: java.io.IOException =>
          if (filesystem.exists(p)) false else throw e
      }
    }
  }

  def get(path: String, conf: Configuration): Option[Array[Byte]] = {
    val p = new Path(path)
    val filesystem = p.getFileSystem(conf)
    if (!filesystem.exists(p)) None
    else {
      val in = filesystem.open(p)
      try {
        val buf = new java.io.ByteArrayOutputStream()
        val chunk = new Array[Byte](8 * 1024)
        var n = in.read(chunk)
        while (n >= 0) { buf.write(chunk, 0, n); n = in.read(chunk) }
        Some(buf.toByteArray)
      } finally in.close()
    }
  }
}

/** Conditional-PUT claim protocol: write a caller-unique token with
  * If-None-Match semantics, then read back and verify the token is
  * OURS. A rejected PUT is a clean lost race. An accepted PUT whose
  * read-back shows a foreign token means the store let two writers
  * through (racy no-overwrite) and we were overwritten — the claim is
  * LOST and detected, never silently shared.
  *
  * Honest limit: read-back verification closes the mutual-success
  * window only up to the store's own atomicity — a racy store can
  * still overwrite a winner AFTER its verify passed (the TOCTOU
  * remainder no client protocol can remove; it is why S3 grew a real
  * conditional PUT). The backend therefore REQUIRES a store whose
  * conditional PUT is atomic for full safety; against such a store the
  * verify never fires and costs one GET per claim. What the verify
  * guarantees unconditionally: in any schedule where the competing
  * writes land before the verifies (the dangerous interleaving a
  * check-then-write store admits), at most ONE claimer reports
  * ownership — pinned deterministically in ClaimBackendSpec.
  */
final class ConditionalPutClaimBackend(store: ConditionalStore)
    extends ClaimBackend {
  val name = "cput"

  def createExclusive(path: String, conf: Configuration): Boolean = {
    val token = java.util.UUID.randomUUID().toString
      .getBytes(StandardCharsets.UTF_8)
    store.putIfAbsent(path, token, conf) &&
      store.get(path, conf).exists(java.util.Arrays.equals(_, token))
  }
}
