package graft.functions

import scala.util.Random

import org.scalatest.funsuite.AnyFunSuite

/** The TypedImperativeAggregate's data structure proven directly: the
  * capped heap must agree with the obvious sort-based reference on random
  * inputs, survive partial/merge splits in any partitioning (the
  * distributed map-side-combine path), and round-trip serialization.
  */
class TopKAggSpec extends AnyFunSuite {

  private def reference(xs: Seq[(Double, Long)], k: Int): Seq[(Double, Long)] =
    xs.sortBy { case (v, id) => (-v, id) }.take(k)

  private def drain(b: TopKBuffer): Seq[(Double, Long)] =
    (0 until b.size).map(i => (b.values(i), b.ids(i)))
      .sortBy { case (v, id) => (-v, id) }

  test("heap agrees with the sort-based reference on random inputs") {
    val rnd = new Random(42)
    for (trial <- 1 to 50) {
      val n = rnd.nextInt(200)
      // duplicate values force tie-breaks through the id order
      val xs = Seq.fill(n)((rnd.nextInt(20).toDouble, rnd.nextLong().abs))
      val k = 1 + rnd.nextInt(8)
      val b = new TopKBuffer(k)
      xs.foreach { case (v, id) => b.offer(v, id) }
      assert(drain(b) === reference(xs, k), s"trial $trial k=$k n=$n")
    }
  }

  test("partial buffers merged in any split equal the single-pass result") {
    val rnd = new Random(7)
    val xs = Seq.fill(500)((rnd.nextInt(50).toDouble, rnd.nextLong().abs))
    val agg = TopKByValue(null, 5)
    for (nParts <- Seq(1, 2, 3, 7, 500)) {
      val parts = xs.grouped(math.max(1, xs.size / nParts)).toSeq
      val partials = parts.map { p =>
        val b = new TopKBuffer(5)
        p.foreach { case (v, id) => b.offer(v, id) }
        b
      }
      val merged = partials.reduce { (a, b2) => agg.merge(a, b2) }
      assert(drain(merged) === reference(xs, 5), s"nParts=$nParts")
    }
  }

  test("serialization round-trips the buffer") {
    val rnd = new Random(99)
    val agg = TopKByValue(null, 4)
    val b = new TopKBuffer(4)
    Seq.fill(100)((rnd.nextDouble(), rnd.nextLong().abs))
      .foreach { case (v, id) => b.offer(v, id) }
    val back = agg.deserialize(agg.serialize(b))
    assert(drain(back) === drain(b))
  }
}
