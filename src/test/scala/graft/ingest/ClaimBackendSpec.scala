package graft.ingest

import java.util.concurrent.{CyclicBarrier, Executors, TimeUnit}

import org.apache.hadoop.conf.Configuration
import org.scalatest.funsuite.AnyFunSuite

/** The claim protocol itself, unit-proved against stores of varying
  * honesty:
  *  - an ATOMIC conditional store (the modern object-store primitive):
  *    plain mutual exclusion, verify never fires;
  *  - a DELIBERATELY RACY store whose "no-overwrite" put is
  *    exists-then-write (the pre-conditional-PUT S3 shape), driven
  *    through the dangerous interleaving — both writers pass the
  *    absence check, both write, verifies run after both writes: the
  *    token read-back must turn the mutual PUT success into at most
  *    ONE claimed ownership (the overwritten writer DETECTS the lost
  *    claim), never two winners sharing a batch dir.
  */
class ClaimBackendSpec extends AnyFunSuite {

  private val conf = new Configuration()

  /** If-None-Match honored atomically (ConcurrentHashMap CAS). */
  private final class AtomicStore extends ConditionalStore {
    val objects = new java.util.concurrent.ConcurrentHashMap[String, Array[Byte]]()
    def putIfAbsent(path: String, body: Array[Byte], c: Configuration): Boolean =
      objects.putIfAbsent(path, body) == null
    def get(path: String, c: Configuration): Option[Array[Byte]] =
      Option(objects.get(path))
  }

  /** Exists-then-write with barriers forcing the dangerous schedule:
    * all racers pass the absence check before any writes; all writes
    * land before any verify reads. Last writer's token survives.
    */
  private final class RacyStore(racers: Int) extends ConditionalStore {
    val objects = new java.util.concurrent.ConcurrentHashMap[String, Array[Byte]]()
    private val writeBarrier = new CyclicBarrier(racers)
    private val verifyBarrier = new CyclicBarrier(racers)
    def putIfAbsent(path: String, body: Array[Byte], c: Configuration): Boolean = {
      val absent = !objects.containsKey(path) // the unsound check
      writeBarrier.await(10, TimeUnit.SECONDS)
      if (absent) { objects.put(path, body); true } // racy overwrite
      else false
    }
    def get(path: String, c: Configuration): Option[Array[Byte]] = {
      verifyBarrier.await(10, TimeUnit.SECONDS)
      Option(objects.get(path))
    }
  }

  private def race(n: Int)(claim: () => Boolean): Seq[Boolean] = {
    val pool = Executors.newFixedThreadPool(n)
    try {
      val start = new CyclicBarrier(n)
      val fs = Seq.fill(n)(pool.submit(
        new java.util.concurrent.Callable[Boolean] {
          def call(): Boolean = { start.await(10, TimeUnit.SECONDS); claim() }
        }))
      fs.map(_.get(30, TimeUnit.SECONDS): Boolean)
    } finally { pool.shutdownNow(); () }
  }

  test("atomic conditional store: exactly one of N concurrent claimers wins") {
    val backend = new ConditionalPutClaimBackend(new AtomicStore)
    val wins = race(8)(() => backend.createExclusive("claims/b0.claim", conf))
    assert(wins.count(identity) == 1, s"wins=$wins")
    // and a later claim on the same key is a clean loss, not an error
    assert(!backend.createExclusive("claims/b0.claim", conf))
  }

  test("racy store, dangerous schedule: mutual PUT success collapses to at most one DETECTED owner") {
    val store = new RacyStore(2)
    val backend = new ConditionalPutClaimBackend(store)
    val wins = race(2)(() => backend.createExclusive("claims/b0.claim", conf))
    // both putIfAbsent calls "succeeded" at the store level (the racy
    // overwrite) — exactly one token survived, so exactly one verify
    // can pass: the loser LEARNED it lost instead of proceeding to
    // write into a shared batch dir
    assert(wins.count(identity) == 1, s"wins=$wins")
    assert(store.objects.size == 1)
  }

  test("fs backend and cput-over-fs backend agree on the create-exclusive contract") {
    val dir = java.nio.file.Files.createTempDirectory("graft-claimbackend")
    Seq[(String, ClaimBackend)](
      ("fs", FsClaimBackend),
      ("cput", new ConditionalPutClaimBackend(HadoopFsConditionalStore)),
    ).foreach { case (tag, b) =>
      val p = s"$dir/$tag/claim_a"
      assert(b.createExclusive(p, conf), s"$tag: first create must win")
      assert(!b.createExclusive(p, conf), s"$tag: second create must lose")
      // the claim is a REAL file either way — enumeration (the other
      // half of claimSeqDir's protocol) keeps seeing it
      assert(FileUtils.listChildFiles(s"$dir/$tag", conf)
        .exists(_.endsWith("claim_a")), s"$tag: claim must be listable")
    }
  }

  test("cput over the real filesystem: N concurrent claimers, one winner") {
    val dir = java.nio.file.Files.createTempDirectory("graft-claimrace")
    val backend = new ConditionalPutClaimBackend(HadoopFsConditionalStore)
    val wins = race(8)(() => backend.createExclusive(s"$dir/lease", conf))
    assert(wins.count(identity) == 1, s"wins=$wins")
  }
}
