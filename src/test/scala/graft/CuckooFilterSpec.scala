package graft

import graft.filter.CuckooFilter
import org.scalatest.funsuite.AnyFunSuite

/** Property-style tests with seeded generators (scalatestplus bridge is
  * not in the offline cache; determinism is a feature here anyway). */
class CuckooFilterSpec extends AnyFunSuite {

  private def randomKeys(seed: Long, n: Int): Seq[Long] = {
    val r = new scala.util.Random(seed)
    Seq.fill(n)(r.nextLong())
  }

  test("no false negatives at design load (30 seeded trials)") {
    (0 until 30).foreach { trial =>
      val keys = randomKeys(trial, 50 + trial * 37)
      val f = CuckooFilter(math.max(16, keys.size))
      keys.foreach(f.insert)
      keys.foreach(k => assert(f.mightContain(k), s"trial $trial: false negative $k"))
    }
  }

  test("no false negatives even at heavy overload (overflow set catches)") {
    val f = CuckooFilter.withBuckets(16) // 64 slots
    val keys = (0L until 200L).map(_ * 7919L + 13L)
    keys.foreach(f.insert)
    keys.foreach(k => assert(f.mightContain(k)))
  }

  test("false positive rate bounded (~8/2^16 per probe)") {
    val n = 20000
    val f = CuckooFilter(n)
    (0 until n).foreach(i => f.insert(i.toLong * 2654435761L))
    val probes = 200000
    val fps = (0 until probes).count(i => f.mightContain(-1L - i * 104729L))
    assert(fps.toDouble / probes < 0.005, s"FP rate ${fps.toDouble / probes}")
  }

  test("serialize/deserialize roundtrip preserves membership") {
    val f = CuckooFilter(1000)
    val keys = (0L until 1000L).map(_ * 31L + 7L)
    keys.foreach(f.insert)
    val g = CuckooFilter.deserialize(f.serialize())
    keys.foreach(k => assert(g.mightContain(k)))
    assert(g.count === f.count)
  }

  test("merge keeps all members from both sides, either merge order (20 trials)") {
    (0 until 20).foreach { trial =>
      val a = randomKeys(1000 + trial, 30 + trial * 11)
      val b = randomKeys(2000 + trial, 20 + trial * 13)
      val buckets = 1 << 10
      def mk(keys: Seq[Long]) = {
        val f = CuckooFilter.withBuckets(buckets)
        keys.sorted.foreach(f.insert); f
      }
      val ab = mk(a); ab.mergeFrom(mk(b))
      val ba = mk(b); ba.mergeFrom(mk(a))
      (a ++ b).foreach { k =>
        assert(ab.mightContain(k), s"trial $trial: ab lost $k")
        assert(ba.mightContain(k), s"trial $trial: ba lost $k")
      }
    }
  }

  test("sorted build is byte-deterministic regardless of input order") {
    val keys = (0L until 5000L).map(_ * 6364136223846793005L + 11L)
    val f1 = CuckooFilter.build(keys.iterator, keys.size)
    val shuffled = new scala.util.Random(7).shuffle(keys)
    val f2 = CuckooFilter.build(shuffled.iterator, keys.size)
    assert(f1.serialize().toSeq === f2.serialize().toSeq)
  }
}
