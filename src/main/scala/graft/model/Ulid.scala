package graft.model

import java.util.concurrent.atomic.AtomicReference

/** 128-bit ULID (48-bit millisecond timestamp + 80-bit entropy), split
  * msb/lsb exactly like the reference wire format
  * (`KinesisMessiProducer.java:68-79` assigns one per published message
  * when absent).
  */
final case class Ulid(msb: Long, lsb: Long) extends Ordered[Ulid] {
  /** Milliseconds since epoch — the top 48 bits of msb. */
  def timestampMillis: Long = msb >>> 16

  override def compare(that: Ulid): Int = {
    val c = java.lang.Long.compareUnsigned(msb, that.msb)
    if (c != 0) c else java.lang.Long.compareUnsigned(lsb, that.lsb)
  }

  /** Crockford base-32, 26 chars, canonical ULID text form. */
  def toCanonicalString: String = {
    val alphabet = "0123456789ABCDEFGHJKMNPQRSTVWXYZ"
    val out = new Array[Char](26)
    // 128 bits -> 26 x 5-bit groups (top group has 2 significant bits)
    var i = 25
    var lo = lsb
    var hi = msb
    while (i >= 0) {
      out(i) = alphabet((lo & 0x1f).toInt)
      // 128-bit right shift by 5
      lo = (lo >>> 5) | (hi << 59)
      hi = hi >>> 5
      i -= 1
    }
    new String(out)
  }
}

object Ulid {
  /** Fresh ULID at `tsMillis` with entropy from `rnd`. */
  def apply(tsMillis: Long, rnd: java.util.Random): Ulid = {
    val msb = (tsMillis << 16) | (rnd.nextInt() & 0xffffL)
    Ulid(msb, rnd.nextLong())
  }

  /** Strictly-increasing successor: +1 on the 128-bit value. */
  def increment(u: Ulid): Ulid =
    if (u.lsb != -1L) u.copy(lsb = u.lsb + 1)
    else Ulid(u.msb + 1, 0L)

  /** The reference's per-producer monotonic assignment
    * (`KinesisMessiProducer.java:68-80`): a fresh ULID unless the clock
    * hasn't advanced past `prev`, in which case increment.
    */
  def nextMonotonic(prev: Ulid, tsMillis: Long, rnd: java.util.Random): Ulid =
    if (prev == null || tsMillis > prev.timestampMillis) Ulid(tsMillis, rnd)
    else increment(prev)
}

/** Per-producer monotonic ULID generator (thread-safe, like the
  * reference's AtomicReference prevUlid at
  * `KinesisMessiProducer.java:32-33`).
  */
final class UlidGenerator(seed: Long = System.nanoTime(),
                          clock: () => Long = () => System.currentTimeMillis()) {
  private val rnd = new java.util.Random(seed)
  private val prev = new AtomicReference[Ulid](null)

  def next(): Ulid = prev.synchronized {
    val u = Ulid.nextMonotonic(prev.get(), clock(), rnd)
    prev.set(u)
    u
  }
}
