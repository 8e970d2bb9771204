package graft.model

import org.scalatest.funsuite.AnyFunSuite

/** Cursor algebra laws — ports of the reference TCK's ordering and
  * checkpoint round-trip behavior (`MessiStreamingConsumerTck.java:
  * 417-468`, `MessiClientTck.java:387-431`) as seeded property loops.
  */
class CursorSpec extends AnyFunSuite {

  private val rnd = new java.util.Random(42)
  private def randSeq(): String = f"${math.abs(rnd.nextLong()) % 1000000000000L}%012d"

  test("checkpoint round-trip is identity (200 random cursors)") {
    (1 to 200).foreach { _ =>
      val c = Cursor.atSequence("shardId-000000000000", randSeq(), rnd.nextBoolean())
      assert(Cursor.fromCheckpoint(c.checkpoint) == c)
    }
  }

  test("checkpoint round-trip survives hostile shard ids") {
    val c = Cursor.atSequence("sh\"ard\\weird", "000000000007", inclusive = true)
    assert(Cursor.fromCheckpoint(c.checkpoint) == c)
  }

  test("ordering: lexicographic by sequence, inclusive before exclusive") {
    (1 to 200).foreach { _ =>
      val (s1, s2) = (randSeq(), randSeq())
      val aInc = Cursor.atSequence("s", s1, inclusive = true)
      val aExc = Cursor.atSequence("s", s1, inclusive = false)
      val bInc = Cursor.atSequence("s", s2, inclusive = true)
      if (s1 < s2) assert(aInc.isBefore(bInc) && bInc.isAfter(aInc))
      if (s1 == s2) assert(aInc.isSame(bInc))
      assert(aInc.isBefore(aExc)) // replay-the-message starts earlier
      assert(aInc.isSame(aInc))
    }
  }

  test("ordering is transitive and antisymmetric (200 random triples)") {
    (1 to 200).foreach { _ =>
      val Seq(a, b, c) = Seq.fill(3)(randSeq()).map(Cursor.atSequence("s", _, inclusive = true))
      if (a.isBefore(b) && b.isBefore(c)) assert(a.isBefore(c))
      if (a.isBefore(b)) assert(!b.isBefore(a))
    }
  }

  test("incomparable cursors throw") {
    val seq = Cursor.atSequence("s", "000000000001", inclusive = true)
    intercept[IllegalArgumentException](Cursor.now("s").isBefore(seq))
    intercept[IllegalArgumentException](
      seq.isBefore(Cursor.atSequence("other-shard", "000000000002", inclusive = true)))
  }

  test("only AT_PROVIDER_SEQUENCE cursors checkpoint") {
    intercept[IllegalStateException](Cursor.now("s").checkpoint)
    intercept[IllegalStateException](Cursor.trimHorizon("s").checkpoint)
    intercept[IllegalStateException](Cursor.atTime("s", 123L).checkpoint)
  }

  test("cursorAt / cursorAfter read the provider stamp and validate") {
    val m = Message.simple("pk1", "a").copy(
      provider = Some(Provider("graft", 1000L, "sh", "000000000005")))
    assert(Cursor.at(m) == Cursor.atSequence("sh", "000000000005", inclusive = true))
    assert(Cursor.after(m) == Cursor.atSequence("sh", "000000000005", inclusive = false))
    intercept[IllegalArgumentException](Cursor.at(Message.simple("pk1", "a")))
  }

  test("ulid monotonic generator is strictly increasing across clock stalls") {
    var t = 1000L
    val gen = new UlidGenerator(seed = 7, clock = () => t)
    val us = (1 to 1000).map { i => if (i % 3 == 0) t += 1; gen.next() }
    us.sliding(2).foreach { case Seq(a, b) => assert(a < b) }
    assert(us.head.timestampMillis == 1000L)
  }

  test("ulid canonical string is 26 chars and order-preserving") {
    var t = 5000L
    val gen = new UlidGenerator(seed = 9, clock = () => { t += 1; t })
    val us = (1 to 500).map(_ => gen.next())
    us.foreach(u => assert(u.toCanonicalString.length == 26))
    us.sliding(2).foreach { case Seq(a, b) =>
      assert(a.toCanonicalString < b.toCanonicalString)
    }
  }
}
