package graft.ingest

import java.util.concurrent.{CyclicBarrier, Executors, TimeUnit}

import org.apache.hadoop.conf.Configuration
import org.scalatest.funsuite.AnyFunSuite

/** Shared fakes for the S3 claim-store contract: an [[S3ObjectApi]]
  * that materializes objects as REAL local files (so claimSeqDir's
  * enumeration half keeps working — the same property
  * HadoopFsConditionalStore gives the cput backend), plus fault
  * wrappers returning each member of S3's failure taxonomy on
  * schedule. Used here and by ConcurrentAppendSpec's backend matrix.
  */
object S3Fakes {

  /** Atomic If-None-Match over the local filesystem: (bucket, key) →
    * `/key` (keys come from S3ConditionalStore.parse's no-scheme
    * fallback, which strips the leading slash of an absolute path).
    */
  final class FsBackedS3Api extends S3ObjectApi {
    def putIfNoneMatch(bucket: String, key: String,
        body: Array[Byte]): S3PutResult = {
      val local = java.nio.file.Paths.get("/" + key)
      try {
        Option(local.getParent)
          .foreach(d => java.nio.file.Files.createDirectories(d))
        java.nio.file.Files.write(local, body,
          java.nio.file.StandardOpenOption.CREATE_NEW,
          java.nio.file.StandardOpenOption.WRITE)
        S3PutResult.Created
      } catch {
        case _: java.nio.file.FileAlreadyExistsException =>
          S3PutResult.PreconditionFailed
      }
    }
    def get(bucket: String, key: String): Option[Array[Byte]] = {
      val local = java.nio.file.Paths.get("/" + key)
      if (java.nio.file.Files.exists(local))
        Some(java.nio.file.Files.readAllBytes(local))
      else None
    }
  }

  /** Fault wrapper: the FIRST conditional PUT on each key fails with
    * the given transient status (503 SlowDown by default) — every
    * claim must survive one retry to land.
    */
  final class FirstPutFlakyApi(inner: S3ObjectApi, status: Int = 503)
      extends S3ObjectApi {
    private val seen =
      java.util.concurrent.ConcurrentHashMap.newKeySet[String]()
    def putIfNoneMatch(bucket: String, key: String,
        body: Array[Byte]): S3PutResult =
      if (seen.add(s"$bucket/$key"))
        S3PutResult.Retryable(status, "injected transient fault")
      else inner.putIfNoneMatch(bucket, key, body)
    def get(bucket: String, key: String): Option[Array[Byte]] =
      inner.get(bucket, key)
  }
}

/** The S3-shaped last mile of the claim protocol: bucket/key parsing,
  * the retry/lost-race split over S3's failure taxonomy, the racy-
  * store schedule through the S3 path, and the classpath gate for the
  * real SDK binding.
  */
class S3ClaimStoreSpec extends AnyFunSuite {

  private val conf = new Configuration()

  /** In-memory atomic S3: CAS put, taxonomy-exact. */
  private final class MemS3 extends S3ObjectApi {
    val objects =
      new java.util.concurrent.ConcurrentHashMap[String, Array[Byte]]()
    def putIfNoneMatch(b: String, k: String, body: Array[Byte]): S3PutResult =
      if (objects.putIfAbsent(s"$b/$k", body) == null) S3PutResult.Created
      else S3PutResult.PreconditionFailed
    def get(b: String, k: String): Option[Array[Byte]] =
      Option(objects.get(s"$b/$k"))
  }

  /** Scripted put results ahead of a delegate — the fault seam. */
  private final class ScriptedApi(script: Seq[S3PutResult],
      inner: S3ObjectApi) extends S3ObjectApi {
    private val i = new java.util.concurrent.atomic.AtomicInteger
    def putIfNoneMatch(b: String, k: String, body: Array[Byte]): S3PutResult = {
      val n = i.getAndIncrement()
      if (n < script.length) script(n) else inner.putIfNoneMatch(b, k, body)
    }
    def get(b: String, k: String): Option[Array[Byte]] = inner.get(b, k)
  }

  test("path parsing: s3 schemes carry their own bucket; bare paths use the conf bucket") {
    assert(S3ConditionalStore.parse("s3a://lake/claims/b0.claim", conf) ==
      ("lake", "claims/b0.claim"))
    assert(S3ConditionalStore.parse("s3://lake/x", conf) == ("lake", "x"))
    assert(S3ConditionalStore.parse("/tmp/idx/_SAVING", conf) ==
      ("graft-claims", "tmp/idx/_SAVING"))
    val c2 = new Configuration()
    c2.set(S3ConditionalStore.BucketConfKey, "mybucket")
    assert(S3ConditionalStore.parse("/tmp/x", c2) == ("mybucket", "tmp/x"))
  }

  test("strict parsing (the production path) refuses scheme-less paths loudly") {
    // a bare or hdfs:// path under the s3 backend would split the
    // claim protocol across two namespaces (SDK PUTs into the conf
    // bucket, listing/lease-delete on the Hadoop FS path) — leases
    // never released, claim ids reused. The production store fails
    // loudly instead; s3 schemes keep working.
    assert(S3ConditionalStore.parse("s3a://lake/claims/b0.claim", conf,
      strict = true) == ("lake", "claims/b0.claim"))
    for (bad <- Seq("/tmp/idx/_SAVING", "hdfs://nn/idx/_SAVING", "rel/path")) {
      val e = intercept[IllegalArgumentException](
        S3ConditionalStore.parse(bad, conf, strict = true))
      assert(e.getMessage.contains("s3a://") &&
        e.getMessage.contains("two namespaces"),
        s"strict parse of $bad must name the split-namespace hazard: ${e.getMessage}")
    }
    // the strict store refuses end to end (not just the parser)
    val strictStore = new S3ConditionalStore(new MemS3, strictScheme = true)
    intercept[IllegalArgumentException](
      strictStore.putIfAbsent("/tmp/idx/_SAVING", Array[Byte](1), conf))
    intercept[IllegalArgumentException](strictStore.get("/tmp/idx/_SAVING", conf))
  }

  test("atomic S3: exactly one of N concurrent claimers wins through the adapter") {
    val backend = new ConditionalPutClaimBackend(
      new S3ConditionalStore(new MemS3))
    val pool = Executors.newFixedThreadPool(8)
    try {
      val start = new CyclicBarrier(8)
      val fs = Seq.fill(8)(pool.submit(
        new java.util.concurrent.Callable[Boolean] {
          def call(): Boolean = {
            start.await(10, TimeUnit.SECONDS)
            backend.createExclusive("s3a://lake/claims/b0.claim", conf)
          }
        }))
      val wins = fs.map(_.get(30, TimeUnit.SECONDS): Boolean)
      assert(wins.count(identity) == 1, s"wins=$wins")
    } finally { pool.shutdownNow(); () }
  }

  test("409 conflict retries into a clean loss; transient 5xx retries into a win") {
    val mem = new MemS3
    mem.objects.put("lake/k", "other".getBytes)
    // concurrent-conditional-write conflict, then the settled 412
    val lost = new S3ConditionalStore(
      new ScriptedApi(Seq(S3PutResult.ConcurrentConflict), mem),
      backoffMs = 1L)
    assert(!lost.putIfAbsent("s3a://lake/k", "me".getBytes, conf),
      "409-then-412 must be a clean lost race")
    // two SlowDowns, then the store accepts
    val won = new S3ConditionalStore(
      new ScriptedApi(Seq(S3PutResult.Retryable(503, "slow down"),
        S3PutResult.Retryable(500, "internal")), new MemS3),
      backoffMs = 1L)
    assert(won.putIfAbsent("s3a://lake/k2", "me".getBytes, conf))
  }

  test("exhausted retries throw loudly — never a false that walks past an undecided claim") {
    val flaky = new ScriptedApi(
      Seq.fill(9)(S3PutResult.Retryable(503, "slow down")), new MemS3)
    val store = new S3ConditionalStore(flaky, maxAttempts = 3, backoffMs = 1L)
    val e = intercept[java.io.IOException](
      store.putIfAbsent("s3a://lake/k", "me".getBytes, conf))
    assert(e.getMessage.contains("cannot decide claim ownership"))
  }

  test("racy pre-conditional-PUT store through the S3 path: at most one DETECTED owner") {
    // exists-then-write with barriers forcing the dangerous schedule —
    // the ClaimBackendSpec RacyStore scenario bound to the S3 surface
    final class RacyS3(racers: Int) extends S3ObjectApi {
      val objects =
        new java.util.concurrent.ConcurrentHashMap[String, Array[Byte]]()
      private val writeBarrier = new CyclicBarrier(racers)
      private val verifyBarrier = new CyclicBarrier(racers)
      def putIfNoneMatch(b: String, k: String, body: Array[Byte]): S3PutResult = {
        val absent = !objects.containsKey(s"$b/$k")
        writeBarrier.await(10, TimeUnit.SECONDS)
        if (absent) { objects.put(s"$b/$k", body); S3PutResult.Created }
        else S3PutResult.PreconditionFailed
      }
      def get(b: String, k: String): Option[Array[Byte]] = {
        verifyBarrier.await(10, TimeUnit.SECONDS)
        Option(objects.get(s"$b/$k"))
      }
    }
    val store = new RacyS3(2)
    val backend = new ConditionalPutClaimBackend(new S3ConditionalStore(store))
    val pool = Executors.newFixedThreadPool(2)
    try {
      val start = new CyclicBarrier(2)
      val fs = Seq.fill(2)(pool.submit(
        new java.util.concurrent.Callable[Boolean] {
          def call(): Boolean = {
            start.await(10, TimeUnit.SECONDS)
            backend.createExclusive("s3a://lake/claims/b0.claim", conf)
          }
        }))
      val wins = fs.map(_.get(30, TimeUnit.SECONDS): Boolean)
      assert(wins.count(identity) == 1, s"wins=$wins")
      assert(store.objects.size == 1)
    } finally { pool.shutdownNow(); () }
  }

  test("fs-backed S3 api: claims are real files, claimSeqDir enumeration sees them") {
    val dir = java.nio.file.Files.createTempDirectory("graft-s3claims")
    val backend = new ConditionalPutClaimBackend(
      new S3ConditionalStore(new S3Fakes.FsBackedS3Api))
    FileUtils.withClaimBackend(backend) {
      val d0 = FileUtils.claimSeqDir(dir.toString, "b", conf)
      assert(d0.endsWith("/b0"))
      // crashed claimer: the id is burned, never reused
      val d1 = FileUtils.claimSeqDir(dir.toString, "b", conf)
      assert(d1.endsWith("/b1"), s"id 0 was reused: $d1")
    }
  }

  test("classpath gate: without the AWS SDK, the s3 backend fails loudly naming the jar") {
    assert(!AwsSdkS3ObjectApi.available,
      "this build must not carry the AWS SDK (zero-egress container)")
    val e = intercept[IllegalArgumentException](
      S3ConditionalStore.fromClasspath())
    assert(e.getMessage.contains("software.amazon.awssdk"),
      s"the gate must name the missing dependency: ${e.getMessage}")
  }
}
