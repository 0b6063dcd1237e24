package graft.ingest

import org.apache.hadoop.conf.Configuration

/** S3-shaped [[ConditionalStore]] — the last mile of the claim/lease
  * portability story: [[ConditionalPutClaimBackend]] already speaks
  * the conditional-PUT token protocol against any ConditionalStore;
  * this file binds that protocol to the S3 object API's own
  * primitives (`PutObject` with `If-None-Match: *` — atomic since S3's
  * 2024 conditional-write GA — and `GetObject`), so the engine's
  * batch claims, `_SAVING` leases, and generation markers are safe
  * where 100 TB actually lives, not just on HDFS/file:.
  *
  * Two layers, split so the protocol is testable without the wire:
  *
  *  - [[S3ObjectApi]]: the minimal HTTP-shaped surface with S3's OWN
  *    failure taxonomy (412 Precondition Failed = "object exists",
  *    409 = a concurrent conditional write in flight — S3 documents
  *    "retry", 5xx/SlowDown = transient). This is the injected fault
  *    seam: the contract suite (ClaimBackendSpec /
  *    ConcurrentAppendSpec) drives the full claim protocol through
  *    fakes that return each taxonomy member on schedule.
  *  - [[S3ConditionalStore]]: maps the ConditionalStore contract onto
  *    an S3ObjectApi — s3a://bucket/key parsing, bounded
  *    backoff-retry on the RETRYABLE statuses only (412 is a clean
  *    lost race, never retried into a spin).
  *
  * The real binding [[AwsSdkS3ObjectApi]] is CLASSPATH-GATED exactly
  * like the `.zst` codec in FileScanner: constructed reflectively from
  * the AWS SDK v2 when `software.amazon.awssdk.services.s3.S3Client`
  * is present, and `SPARK_GRAFT_CLAIM_BACKEND=s3` fails loudly naming
  * the missing jar when it is not — never a silent fallback to a
  * weaker backend.
  *
  * Enumeration note: claim ENUMERATION (claimSeqDir's listing half)
  * rides the Hadoop FS API as always; on a real S3 deployment the
  * paths are s3a:// URIs, so the S3A filesystem lists the very objects
  * the SDK wrote — one namespace, two access paths.
  */
sealed trait S3PutResult
object S3PutResult {
  /** 200 — the store created the object under If-None-Match: *. */
  case object Created extends S3PutResult
  /** 412 — an object already exists: a CLEAN lost race, never retried. */
  case object PreconditionFailed extends S3PutResult
  /** 409 ConditionalRequestConflict — a concurrent conditional write
    * on the same key is in flight; S3's documented remedy is retry
    * (the retry then sees 200 if we won the re-race or 412 if the
    * other writer's object landed).
    */
  case object ConcurrentConflict extends S3PutResult
  /** 5xx / SlowDown — transient service trouble, bounded-retried. */
  final case class Retryable(status: Int, detail: String) extends S3PutResult
}

/** Minimal S3 object surface the store needs — and the FAULT SEAM the
  * contract suite injects: fakes return 412/409/5xx on schedule to
  * prove the retry/lost-race split, and a deliberately racy fake
  * (accept-both-writes) proves the token read-back catches silent
  * overwrites.
  */
trait S3ObjectApi {
  def putIfNoneMatch(bucket: String, key: String, body: Array[Byte]): S3PutResult
  /** Object bytes, None on 404. */
  def get(bucket: String, key: String): Option[Array[Byte]]
}

/** [[ConditionalStore]] over an [[S3ObjectApi]]. Retry policy: only
  * [[S3PutResult.ConcurrentConflict]] and [[S3PutResult.Retryable]]
  * are retried (bounded, linear backoff); 412 returns false
  * immediately (the protocol's lost-race signal), and exhausting the
  * retry budget throws LOUDLY — returning false there would claim
  * "someone else owns the marker" on evidence of nothing but a flaky
  * service, and a caller would walk past a lease it might actually
  * hold.
  */
final class S3ConditionalStore(
    api: S3ObjectApi,
    maxAttempts: Int = 5,
    backoffMs: Long = 50L,
    strictScheme: Boolean = false) extends ConditionalStore {
  require(maxAttempts >= 1, s"maxAttempts must be >= 1, got $maxAttempts")

  def putIfAbsent(path: String, body: Array[Byte],
      conf: Configuration): Boolean = {
    val (bucket, key) = S3ConditionalStore.parse(path, conf, strictScheme)
    var attempt = 0
    while (true) {
      attempt += 1
      api.putIfNoneMatch(bucket, key, body) match {
        case S3PutResult.Created => return true
        case S3PutResult.PreconditionFailed => return false
        case r @ (S3PutResult.ConcurrentConflict | S3PutResult.Retryable(_, _)) =>
          if (attempt >= maxAttempts)
            throw new java.io.IOException(
              s"s3 conditional PUT of $bucket/$key kept failing after " +
                s"$maxAttempts attempts (last: $r) — cannot decide claim " +
                "ownership; surface, don't guess")
          Thread.sleep(backoffMs * attempt)
      }
    }
    false // unreachable
  }

  def get(path: String, conf: Configuration): Option[Array[Byte]] = {
    val (bucket, key) = S3ConditionalStore.parse(path, conf, strictScheme)
    api.get(bucket, key)
  }
}

object S3ConditionalStore {
  /** Conf key for the claim bucket when paths carry no s3 scheme —
    * TEST-ONLY (the contract suite drives the claim protocol on local
    * paths through a fake [[S3ObjectApi]]). The production store
    * ([[fromClasspath]], i.e. `SPARK_GRAFT_CLAIM_BACKEND=s3`) REFUSES
    * scheme-less paths instead of using this fallback: a local or
    * hdfs:// index path would split the protocol across two
    * namespaces — claim PUTs into the configured bucket via the SDK
    * while the enumeration/exists/lease-delete half rides the Hadoop
    * FS on the original path — so the lease object would never be
    * deleted (every later save fails 412 forever), awaitNoLease would
    * never see a held lease, and abandoned claim ids would be reused.
    * Only s3/s3a/s3n paths keep the two access paths on ONE namespace.
    */
  val BucketConfKey = "graft.s3.claim.bucket"

  /** `s3a://bucket/key` (also s3://, s3n://) → (bucket, key). Any
    * other path: with `strict` (the production path) fail LOUDLY —
    * the misconfiguration is otherwise silent (see [[BucketConfKey]]);
    * without it (test seam) keep the full slash-stripped form as the
    * key under the configured claim bucket.
    */
  private[ingest] def parse(path: String, conf: Configuration,
      strict: Boolean = false): (String, String) = {
    val u = try new java.net.URI(path) catch {
      case _: java.net.URISyntaxException => null
    }
    if (u != null && u.getScheme != null &&
        Set("s3", "s3a", "s3n")(u.getScheme) && u.getHost != null)
      (u.getHost, u.getPath.stripPrefix("/"))
    else {
      require(!strict,
        s"SPARK_GRAFT_CLAIM_BACKEND=s3 requires s3://, s3a:// or s3n:// " +
          s"paths, got '$path' — a scheme-less path would write claim " +
          "objects into the configured bucket while the listing/lease " +
          "half of the protocol rides the Hadoop FS on the original " +
          "path (two namespaces: leases never released, claims reused); " +
          "point the index root at the object store itself")
      (conf.get(BucketConfKey, "graft-claims"), path.stripPrefix("/"))
    }
  }

  /** The production store: the reflective AWS SDK binding, or a LOUD
    * failure naming the missing jar (the FileScanner .zst gate idiom —
    * an unavailable codec classifies as a named skip, never a silent
    * downgrade).
    */
  def fromClasspath(): S3ConditionalStore = {
    require(AwsSdkS3ObjectApi.available,
      "SPARK_GRAFT_CLAIM_BACKEND=s3 needs the AWS SDK v2 s3 client " +
        s"(${AwsSdkS3ObjectApi.ClientClass}) on the classpath; add " +
        "software.amazon.awssdk:s3 — claims will NOT silently fall " +
        "back to a weaker backend")
    // strictScheme: the production binding refuses scheme-less paths
    // (see parse) — the conf-bucket fallback is the TEST seam only
    new S3ConditionalStore(AwsSdkS3ObjectApi(), strictScheme = true)
  }
}

/** Reflective AWS SDK v2 binding — reflection keeps the SDK a
  * DEPLOYMENT choice (this build has no AWS jars and must not), the
  * same reasoning as FileScanner's classpath-gated .zst codec. Maps
  * the SDK's exception taxonomy onto [[S3PutResult]]:
  * S3Exception.statusCode 412 → PreconditionFailed, 409 →
  * ConcurrentConflict, 5xx → Retryable, 404 on GET → None; anything
  * else propagates (an auth failure must surface as itself, not as a
  * lost claim).
  */
object AwsSdkS3ObjectApi {
  val ClientClass = "software.amazon.awssdk.services.s3.S3Client"

  def available: Boolean =
    try { Class.forName(ClientClass); true }
    catch { case _: ClassNotFoundException | _: NoClassDefFoundError => false }

  def apply(): S3ObjectApi = {
    val clientCls = Class.forName(ClientClass)
    new AwsSdkS3ObjectApi(clientCls.getMethod("create").invoke(null))
  }
}

final class AwsSdkS3ObjectApi private[ingest] (client: AnyRef)
    extends S3ObjectApi {

  private val loader = client.getClass.getClassLoader
  private def cls(n: String) = Class.forName(n, true, loader)

  /** Invoke a public method by name/arity on `target` (SDK builder
    * impls are package-private; their public interface methods need
    * setAccessible for reflective dispatch).
    */
  private def call(target: AnyRef, name: String, args: AnyRef*): AnyRef = {
    val m = target.getClass.getMethods.find(m =>
        m.getName == name && m.getParameterCount == args.length &&
          m.getParameterTypes.zip(args).forall { case (t, a) =>
            a == null || t.isInstance(a) || t.isPrimitive
          })
      .getOrElse(throw new NoSuchMethodException(
        s"${target.getClass.getName}.$name/${args.length}"))
    try m.setAccessible(true) catch { case _: Exception => () }
    m.invoke(target, args: _*)
  }

  private def buildRequest(reqCls: String, bucket: String,
      key: String, extra: Seq[(String, AnyRef)]): AnyRef = {
    var b = cls(reqCls).getMethod("builder").invoke(null)
    b = call(b, "bucket", bucket)
    b = call(b, "key", key)
    extra.foreach { case (m, v) => b = call(b, m, v) }
    call(b, "build")
  }

  /** HTTP status from an SDK service exception (AwsServiceException
    * .statusCode), -1 when the throwable is not one.
    */
  private def statusOf(t: Throwable): Int =
    t.getClass.getMethods.find(m =>
        m.getName == "statusCode" && m.getParameterCount == 0)
      .map(m => m.invoke(t).asInstanceOf[java.lang.Integer].intValue())
      .getOrElse(-1)

  private def unwrap(e: java.lang.reflect.InvocationTargetException): Throwable =
    Option(e.getCause).getOrElse(e)

  def putIfNoneMatch(bucket: String, key: String,
      body: Array[Byte]): S3PutResult = {
    val req = buildRequest(
      "software.amazon.awssdk.services.s3.model.PutObjectRequest",
      bucket, key, Seq(("ifNoneMatch", "*")))
    val reqBody = cls("software.amazon.awssdk.core.sync.RequestBody")
      .getMethod("fromBytes", classOf[Array[Byte]]).invoke(null, body)
    try { call(client, "putObject", req, reqBody); S3PutResult.Created }
    catch {
      case e: java.lang.reflect.InvocationTargetException =>
        val cause = unwrap(e)
        statusOf(cause) match {
          case 412 => S3PutResult.PreconditionFailed
          case 409 => S3PutResult.ConcurrentConflict
          case s if s >= 500 =>
            S3PutResult.Retryable(s, String.valueOf(cause.getMessage))
          case _ => throw cause
        }
    }
  }

  def get(bucket: String, key: String): Option[Array[Byte]] = {
    val req = buildRequest(
      "software.amazon.awssdk.services.s3.model.GetObjectRequest",
      bucket, key, Nil)
    try {
      val resBytes = call(client, "getObjectAsBytes", req)
      Some(call(resBytes, "asByteArray").asInstanceOf[Array[Byte]])
    } catch {
      case e: java.lang.reflect.InvocationTargetException =>
        val cause = unwrap(e)
        if (statusOf(cause) == 404) None else throw cause
    }
  }
}
