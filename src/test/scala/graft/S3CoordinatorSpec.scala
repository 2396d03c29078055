package graft

import java.util.concurrent.ConcurrentHashMap
import java.util.concurrent.atomic.AtomicInteger

import org.apache.hadoop.fs.Path
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.FsAtomic
import graft.sources.FsAtomic.{ConditionalObjectStore, ConditionalPutCoordinator}

/** The raw-S3 coordinator against a MOCK conditional-put object store —
  * the contract-level proof the round-16 seam asked for: the same
  * serialization guarantees the local link coordinator gives the
  * versioned-manifest ladder (exactly one winner per slot, winner's
  * content intact, losers slide), plus the failure modes only an object
  * store has — AMBIGUOUS put outcomes (timeout after the server may or
  * may not have applied the write), including the delayed-apply case
  * where a misattributed loss would double-commit. */
class S3CoordinatorSpec extends AnyFunSuite {

  /** In-memory store with S3 semantics: conditional put is atomic
    * (ConcurrentHashMap.putIfAbsent), reads are strongly consistent.
    * `failNext` injects one ambiguous outcome: `applied=true` models a
    * timeout AFTER the server applied the write, `applied=false` one
    * before; `delayApply` holds an applied-but-timed-out write
    * INVISIBLE until released — the delayed-apply window. */
  private final class MockStore extends ConditionalObjectStore {
    private val objects = new ConcurrentHashMap[String, Array[Byte]]()
    @volatile var failNextApplied: Option[Boolean] = None
    @volatile private var delayArmed = false
    @volatile private var delayedWrite: Option[(String, Array[Byte])] = None
    val puts = new AtomicInteger(0)

    def delayNextApply(): Unit = synchronized { delayArmed = true }
    def releaseDelayed(): Unit = synchronized {
      delayedWrite.foreach { case (k, v) => objects.putIfAbsent(k, v) }
      delayedWrite = None
    }

    def putIfAbsent(key: String, content: Array[Byte]): Boolean = synchronized {
      puts.incrementAndGet()
      if (delayArmed) {
        // applied server-side LATER; the client sees a timeout now
        delayArmed = false
        delayedWrite = Some((key, content))
        throw new java.io.IOException("mock: request timed out (will apply late)")
      }
      failNextApplied match {
        case Some(applied) =>
          failNextApplied = None
          if (applied) objects.putIfAbsent(key, content)
          throw new java.io.IOException("mock: ambiguous outcome")
        case None =>
          objects.putIfAbsent(key, content) == null
      }
    }
    def get(key: String): Option[Array[Byte]] = {
      // a delayed write is NOT yet visible — that is the point
      Option(objects.get(key))
    }
    def stored(key: String): Option[String] =
      Option(objects.get(key)).map(new String(_, "UTF-8"))
  }

  private val fsNull: org.apache.hadoop.fs.FileSystem = null

  test("two racing writers: exactly one wins, the winner's bytes stand") {
    val store = new MockStore
    val coord = new ConditionalPutCoordinator(store)
    val results = new ConcurrentHashMap[String, Boolean]()
    val threads = Seq("A", "B").map { w =>
      new Thread(() => {
        results.put(w, coord.createExclusive(
          fsNull, new Path(s"s3a://bucket/t/_versions/v1.json"),
          s"""{"version":1,"writer":"$w"}"""))
      })
    }
    threads.foreach(_.start()); threads.foreach(_.join())
    import scala.jdk.CollectionConverters._
    val winners = results.values().asScala.count(identity[Boolean])
    assert(winners == 1, s"exactly one writer must win: $results")
    val winner = Seq("A", "B").find(w => results.get(w)).get
    assert(store.stored("s3a://bucket/t/_versions/v1.json")
      .contains(s"""{"version":1,"writer":"$winner"}"""),
      "the loser must never clobber the winner's bytes")
  }

  test("ambiguous outcome, write applied: read-back attributes the win") {
    val store = new MockStore
    val coord = new ConditionalPutCoordinator(store)
    store.failNextApplied = Some(true)
    assert(coord.createExclusive(fsNull,
      new Path("s3a://b/t/v2.json"), """{"v":2,"w":"me"}"""),
      "a timed-out put that DID land is a win, not a retry-forever")
    assert(store.stored("s3a://b/t/v2.json").contains("""{"v":2,"w":"me"}"""))
  }

  test("ambiguous outcome, write not applied: the retry wins cleanly") {
    val store = new MockStore
    val coord = new ConditionalPutCoordinator(store)
    store.failNextApplied = Some(false)
    assert(coord.createExclusive(fsNull,
      new Path("s3a://b/t/v3.json"), """{"v":3}"""))
    assert(store.puts.get() == 2, "one failed attempt + one clean retry")
  }

  test("ambiguous outcome, another writer occupied the slot: loss reported") {
    val store = new MockStore
    val coord = new ConditionalPutCoordinator(store)
    assert(coord.createExclusive(fsNull,
      new Path("s3a://b/t/v4.json"), """{"v":4,"w":"other"}"""))
    store.failNextApplied = Some(false)
    assert(!coord.createExclusive(fsNull,
      new Path("s3a://b/t/v4.json"), """{"v":4,"w":"me"}"""),
      "read-back must attribute the slot to the other writer")
    assert(store.stored("s3a://b/t/v4.json").exists(_.contains(""""w":"other"""")))
  }

  test("delayed apply: a put that lands AFTER its read-back is still OUR win " +
      "(misreading it as lost would double-commit)") {
    val store = new MockStore
    val coord = new ConditionalPutCoordinator(store)
    store.delayNextApply()
    // release the delayed write while the coordinator sleeps between
    // its read-back (absent) and the retry put (which will then see
    // the slot occupied — by our own bytes)
    val releaser = new Thread(() => { Thread.sleep(20L); store.releaseDelayed() })
    releaser.start()
    val won = coord.createExclusive(fsNull,
      new Path("s3a://b/t/v5.json"), """{"v":5,"w":"me"}""")
    releaser.join()
    assert(won, "the occupant is our own delayed put — a win, not a loss")
    assert(store.stored("s3a://b/t/v5.json").exists(_.contains(""""w":"me"""")))
  }

  test("four writers publishing through the version ladder serialize " +
      "without gaps, duplicates, or lost commits") {
    val store = new MockStore
    val coord = new ConditionalPutCoordinator(store)
    val perWriter = 10
    val committed = new ConcurrentHashMap[Long, String]()
    val threads = (0 until 4).map { w =>
      new Thread(() => {
        var next = 0L
        (0 until perWriter).foreach { i =>
          // the publish loop: try version numbers until one sticks
          var v = next
          var done = false
          while (!done) {
            val content = s"""{"version":$v,"writer":$w,"commit":$i}"""
            if (coord.createExclusive(fsNull,
                new Path(s"s3a://b/t/_versions/v$v.json"), content)) {
              assert(committed.putIfAbsent(v, content) == null,
                s"version $v won twice")
              next = v + 1
              done = true
            } else v += 1
          }
        }
      })
    }
    threads.foreach(_.start()); threads.foreach(_.join())
    assert(committed.size() == 40, s"lost commits: ${committed.size()}")
    (0L until 40L).foreach { v =>
      assert(committed.containsKey(v), s"gap at version $v")
      assert(store.stored(s"s3a://b/t/_versions/v$v.json")
        .contains(committed.get(v)), s"version $v bytes clobbered")
    }
  }

  test("the coordinator registers for s3a and dispatches ahead of the built-ins") {
    val store = new MockStore
    val coord = new ConditionalPutCoordinator(store)
    FsAtomic.register("s3a", coord)
    try {
      val localFs = new Path("/tmp").getFileSystem(
        new org.apache.hadoop.conf.Configuration())
      assert(FsAtomic.coordinatorFor(localFs, new Path("s3a://b/k.json")) eq coord)
      assert(FsAtomic.createExclusive(localFs,
        new Path("s3a://b/k.json"), """{"k":1}"""))
      assert(!FsAtomic.createExclusive(localFs,
        new Path("s3a://b/k.json"), """{"k":2}"""))
      assert(store.stored("s3a://b/k.json").contains("""{"k":1}"""))
    } finally FsAtomic.unregister("s3a")
  }
}
