package graft

import graft.functions.text
import org.apache.spark.sql.functions._

class TextFunctionsSpec extends SparkSpec {

  test("porter stemmer matches published algorithm goldens") {
    // Golden pairs from Porter's published example vocabularies.
    val goldens = Seq(
      "caresses" -> "caress", "ponies" -> "poni", "ties" -> "ti",
      "caress" -> "caress", "cats" -> "cat",
      "feed" -> "feed", "agreed" -> "agre", "plastered" -> "plaster",
      "bled" -> "bled", "motoring" -> "motor", "sing" -> "sing",
      "conflated" -> "conflat", "troubled" -> "troubl", "sized" -> "size",
      "hopping" -> "hop", "tanned" -> "tan", "falling" -> "fall",
      "hissing" -> "hiss", "failing" -> "fail", "filing" -> "file",
      "happy" -> "happi", "sky" -> "sky",
      "relational" -> "relat", "conditional" -> "condit", "rational" -> "ration",
      "digitizer" -> "digit", "operator" -> "oper",
      "feudalism" -> "feudal", "decisiveness" -> "decis", "hopefulness" -> "hope",
      "triplicate" -> "triplic", "formative" -> "form", "formalize" -> "formal",
      "electrical" -> "electr", "hopeful" -> "hope", "goodness" -> "good",
      "revival" -> "reviv", "allowance" -> "allow", "inference" -> "infer",
      "adjustable" -> "adjust", "defensible" -> "defens",
      "replacement" -> "replac", "adjustment" -> "adjust", "dependent" -> "depend",
      "adoption" -> "adopt", "communism" -> "commun", "activate" -> "activ",
      "effective" -> "effect", "rate" -> "rate", "cease" -> "ceas",
      "controlling" -> "control", "rolling" -> "roll")
    val bad = goldens.filter { case (w, want) => text.porterStem(w) != want }
      .map { case (w, want) => s"$w: got ${text.porterStem(w)}, want $want" }
    assert(bad.isEmpty, bad.mkString("; "))
  }

  test("fuzz ratio definition cases and 80-threshold boundary") {
    assert(text.fuzzRatio("hello", "hello") == 100)
    assert(text.fuzzRatio("", "") == 100)
    assert(text.fuzzRatio("a", "") == 0)
    assert(text.fuzzRatio("ab", "cd") == 0)
    // LCS(abcd,bcde)=3 → 2·3/8 = 75
    assert(text.fuzzRatio("abcd", "bcde") == 75)
    // LCS(kitten,sitting)=4 → 2·4/13 = 61.5 → 62
    assert(text.fuzzRatio("kitten", "sitting") == 62)
    // exactly 80: 10-char strings, LCS 8 → 2·8/20 = 80 — NOT >80
    assert(text.fuzzRatio("abcdefghij", "abcdefghXY") == 80)
    assert(text.fuzzRatio("abcdefghij", "abcdefghiX") == 90)
    // symmetry
    assert(text.fuzzRatio("abcdef", "abcf") == text.fuzzRatio("abcf", "abcdef"))
    // half-even at .5 (Python 3 round parity): LCS(aaaaabbb,aaaaaccc)=5
    // → 2·5/16 = 62.5 → 62, not 63
    assert(text.fuzzRatio("aaaaabbb", "aaaaaccc") == 62)
  }

  test("ngram map reproduces the reference's inline example (utils.py:32)") {
    import spark.implicits._
    val df = Seq("Donald Trump and Robert Mueller").toDF("s")
    val got = df.select(text.ngramMap(split(col("s"), "\\s+"), 3).as("m"))
      .head().getMap[Int, Seq[String]](0)
    assert(got(1).toSet == Set("Donald", "Trump", "and", "Robert", "Mueller"))
    assert(got(2).toSet == Set("Donald Trump", "Trump and", "and Robert", "Robert Mueller"))
    assert(got(3).toSet == Set("Donald Trump and", "Trump and Robert", "and Robert Mueller"))
  }

  test("sentence split + tokenize behave on punctuation") {
    import spark.implicits._
    val df = Seq("First one. Second two! Third three? No").toDF("s")
    val sents = df.select(text.sentences(col("s")).as("x")).head().getSeq[String](0)
    assert(sents == Seq("First one.", "Second two!", "Third three?", "No"))
    val toks = df.select(text.tokenize(col("s")).as("x")).head().getSeq[String](0)
    assert(toks == Seq("first", "one", "second", "two", "third", "three", "no"))
  }

  test("language id flags CJK and common English") {
    import spark.implicits._
    val df = Seq(
      ("the cat sat on the mat and it was happy", "en"),
      ("der Hund ist nicht mit der Katze", "de"),
      ("新闻分析系统", "zh")).toDF("s", "want")
    val got = df.select(text.langId(col("s")).as("got"), col("want"))
      .collect().map(r => (r.getString(0), r.getString(1)))
    got.foreach { case (g, w) => assert(g == w, s"got $g want $w") }
  }

  test("rolling fingerprint: O(1) slide matches naive per-window recompute") {
    import graft.functions.fasthash
    def naive(s0: String, k: Int): Long = {
      val s = s0.toLowerCase
      if (s.length < k) return fasthash.rollingFingerprint(s0, k)
      (0 to s.length - k).map { p =>
        var h = 0L
        s.substring(p, p + k).foreach(c => h = h * 1000003L + c)
        fasthash.splitmix64(h)
      }.min
    }
    val samples = Seq("the quick brown fox jumps over the lazy dog",
      "aaaaaaaaaaaaaaa", "ab", "", "Sphinx of black quartz, judge my vow!")
    samples.foreach { s =>
      assert(fasthash.rollingFingerprint(s, 8) == naive(s, 8), s"'$s'")
    }
    // identical text collides; a one-char change (usually) doesn't
    assert(fasthash.rollingFingerprint(samples.head, 8) ==
      fasthash.rollingFingerprint(new String(samples.head.toCharArray), 8))
  }

  test("fingerprint is stable and collides for identical text") {
    import spark.implicits._
    val df = Seq("some document text here", "some document text here",
      "totally different content").toDF("s")
    val fps = df.select(text.fingerprint(col("s"))).collect().map(_.getLong(0))
    assert(fps(0) == fps(1))
    assert(fps(0) != fps(2))
  }

  test("q287 readability: matches a JVM regex recompute of the Flesch inputs") {
    val t = sf0001
    val docs = t.documents.select("source", "text").collect()
      .map(r => (r.getString(0), r.getString(1)))
    def words(s: String) = s.toLowerCase.split("[^a-z0-9']+").count(_.nonEmpty).toLong
    def marks(s: String) = math.max("[.!?]+".r.findAllIn(s).length.toLong, 1L)
    def syll(s: String) = "[aeiouy]+".r.findAllIn(s.toLowerCase).length.toLong
    val exp = docs.groupBy(_._1).map { case (src, ds) =>
      src -> ((ds.length.toLong, ds.toSeq.map(d => words(d._2)).sum,
        ds.toSeq.map(d => marks(d._2)).sum, ds.toSeq.map(d => syll(d._2)).sum))
    }
    val got = graft.ops.TextAnalysis.qReadability(t).collect()
    assert(got.map(_.getString(0)).toSeq == got.map(_.getString(0)).toSeq.sorted)
    got.foreach { r =>
      val e = exp(r.getString(0))
      assert((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)) == e)
      val f = 206.835 - 1.015 * (e._2.toDouble / e._3.toDouble) -
        84.6 * (e._4.toDouble / e._2.toDouble)
      assert(math.abs(r.getDouble(5) - f) < 1e-9)
    }
    assert(exp.keySet == got.map(_.getString(0)).toSet)
  }

  test("q292 Hill tail: matches an in-memory order-statistic recompute") {
    val t = sf0001
    val freq = t.documents.select("text").collect().map(_.getString(0))
      .flatMap(_.toLowerCase.split("[^a-z0-9']+").filter(_.nonEmpty))
      .groupBy(identity).map { case (tok, xs) => tok -> xs.length.toLong }
    val ranked = freq.toSeq.sortBy { case (tok, f) => (-f, tok) }
    assert(ranked.length >= 21, "template vocab must cover k+1=21 ranks")
    val fref = ranked(20)._2
    val got = graft.ops.TextAnalysis.qHillTail(t).collect()
    assert(got.length == 20)
    var sumLr = 0L
    got.zipWithIndex.foreach { case (r, i) =>
      assert(r.getLong(0) == i + 1L)
      assert(r.getString(1) == ranked(i)._1)
      assert(r.getLong(2) == ranked(i)._2)
      assert(r.getLong(3) == fref)
      val lr = math.round(math.log(ranked(i)._2.toDouble / fref.toDouble) * 1e6)
      assert(r.getLong(4) == lr)
      sumLr += lr
    }
    got.foreach { r =>
      assert(r.getLong(5) == sumLr)
      assert(math.abs(r.getDouble(6) - 20000000.0 / sumLr.toDouble) < 1e-9)
    }
  }

  test("q298 postings audit: matches an in-memory gap-code recompute") {
    val t = sf0001
    val posts = t.documents.select("doc_id", "text").collect()
      .flatMap { r =>
        r.getString(1).toLowerCase.split("[^a-z0-9']+").filter(_.nonEmpty)
          .distinct.map(tok => tok -> r.getLong(0)) }
      .groupBy(_._1).map { case (tok, xs) => tok -> xs.map(_._2).sorted }
    val got = graft.ops.TextAnalysis.qPostingsAudit(t).collect()
    assert(got.map(_.getString(0)).toSet == posts.keySet)
    got.foreach { r =>
      val ids = posts(r.getString(0))
      val gaps = (ids.head + 1L) +: ids.sliding(2).collect {
        case arr if arr.length == 2 => arr(1) - arr(0) }.toSeq
      val bits = gaps.map(g => java.lang.Long.toBinaryString(g).length.toLong)
      assert(r.getLong(1) == ids.length.toLong)
      assert(r.getLong(2) == 64L * ids.length)
      assert(r.getLong(3) == bits.map(b => 2L * b - 1L).sum)
      assert(r.getLong(4) == bits.map(b => (b + 6L) / 7L).sum)
      assert(math.abs(r.getDouble(5) -
        bits.map(b => 2L * b - 1L).sum.toDouble / (64.0 * ids.length)) < 1e-12)
    }
  }

  test("q300 QLM retrieval: matches an in-memory Dirichlet-smoothed recompute") {
    val t = sf0001
    def microAway(x: Double): Long = {
      val m = x * 1000000.0
      (if (m >= 0) math.floor(m + 0.5) else math.ceil(m - 0.5)).toLong
    }
    val query = Seq("spark", "window", "join"); val mu = 2000.0
    val docs = t.documents.select("doc_id", "text").collect()
      .map(r => r.getLong(0) ->
        r.getString(1).toLowerCase.split("[^a-z0-9']+").filter(_.nonEmpty))
    val tot = docs.map(_._2.length.toLong).sum
    val cf = query.map(q =>
      q -> docs.map(_._2.count(_ == q).toLong).sum).filter(_._2 > 0L).toMap
    val scores = docs.map { case (id, toks) =>
      val len = toks.length.toLong
      val matchMicro = cf.map { case (q, c) =>
        val tf = toks.count(_ == q).toLong
        if (tf == 0L) 0L
        else microAway(math.log(tf.toDouble + mu * c.toDouble / tot.toDouble)) -
          microAway(math.log(mu * c.toDouble / tot.toDouble))
      }.sum
      val pen = query.length.toLong * microAway(math.log(len.toDouble + mu))
      (id, matchMicro - pen)
    }
    val top = scores.sortBy { case (id, s) => (-s, id) }.take(20)
    val got = graft.ops.TextAnalysis.qQlmRetrieval(t).collect()
    assert(got.length == top.length)
    got.zip(top).zipWithIndex.foreach { case ((r, (id, s)), i) =>
      assert(r.getLong(0) == i + 1L)
      assert(r.getLong(1) == id)
      assert(r.getLong(2) == s)
      assert(math.abs(r.getDouble(4) - s.toDouble / 1e6) < 1e-12)
    }
  }

  test("q303 unigram segmentation: matches an in-memory Viterbi recompute") {
    val t = sf0001
    def microAway(x: Double): Long = {
      val m = x * 1000000.0
      (if (m >= 0) math.floor(m + 0.5) else math.ceil(m - 0.5)).toLong
    }
    val words = t.documents.select("text").collect().map(_.getString(0))
      .flatMap(_.toLowerCase.split("[^a-z0-9']+").filter(_.nonEmpty))
      .groupBy(identity).map { case (w, xs) => w -> xs.length.toLong }
      .filter(_._1.length <= 12)
    val cf = collection.mutable.Map[String, Long]().withDefaultValue(0L)
    words.foreach { case (w, c) =>
      for (s <- 0 until w.length; l <- 1 to math.min(4, w.length - s))
        cf(w.substring(s, s + l)) += c
    }
    val f = cf.values.sum
    val cost = cf.map { case (p, c) =>
      p -> microAway(-math.log(c.toDouble / f.toDouble)) }
    def viterbi(w: String): (Long, Long) = {
      val dp = Array.fill(w.length + 1)(Long.MaxValue); dp(0) = 0L
      for (p <- 1 to w.length; l <- 1 to math.min(4, p))
        if (dp(p - l) != Long.MaxValue) {
          val cand = dp(p - l) + cost(w.substring(p - l, p)) * 16L + 1L
          if (cand < dp(p)) dp(p) = cand
        }
      (dp(w.length) / 16L, dp(w.length) % 16L)
    }
    val got = graft.ops.TextAnalysis.qUnigramSegmentation(t).collect()
    assert(got.map(_.getString(0)).toSet == words.keySet)
    got.foreach { r =>
      val w = r.getString(0)
      val (c, np) = viterbi(w)
      assert(r.getLong(1) == words(w))
      assert(r.getLong(2) == w.length.toLong)
      assert(r.getLong(3) == c)
      assert(r.getLong(4) == np)
      assert(np >= 1L && np <= w.length.toLong)
    }
  }

  test("q306 Simpson's audit: matches an in-memory 2x2 recompute") {
    val t = sf0001
    val stop = graft.functions.text.stopwords
    val xy = t.documents.select("source", "text").collect().map { r =>
      val s = r.getString(1)
      val toks = s.toLowerCase.split("[^a-z0-9']+").filter(_.nonEmpty)
      val nt = toks.length.toLong
      val nc = s.toLowerCase.replaceAll("[^a-z0-9']", "").length.toLong
      val ns = toks.count(stop.contains).toLong
      val nd = toks.distinct.length.toLong
      val y = if (nt >= 20 && nt <= 80 && nc >= nt * 4 && nc <= nt * 5 &&
        ns * 20 >= nt && nd * 2 >= nt) 1L else 0L
      (r.getString(0), if (nt >= 50) 1L else 0L, y)
    }
    val cells = xy.groupBy(_._1).map { case (src, xs) =>
      (src, xs.count(v => v._2 == 1 && v._3 == 1).toLong,
        xs.count(v => v._2 == 1 && v._3 == 0).toLong,
        xs.count(v => v._2 == 0 && v._3 == 1).toLong,
        xs.count(v => v._2 == 0 && v._3 == 0).toLong)
    }.toSeq.sortBy(_._1)
    val pa = cells.map(_._2).sum; val pb = cells.map(_._3).sum
    val pc = cells.map(_._4).sum; val pd = cells.map(_._5).sum
    val pooled = pa * pd - pb * pc
    val got = graft.ops.TextAnalysis.qSimpsonsAudit(t).collect()
    assert(got.length == cells.length)
    got.zip(cells).foreach { case (r, (src, a, b, c, d)) =>
      assert(r.getString(0) == src)
      assert((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)) == ((a, b, c, d)))
      val assoc = a * d - b * c
      assert(r.getLong(5) == assoc)
      assert(r.getLong(6) == pooled)
      assert(r.getBoolean(8) ==
        ((assoc > 0 && pooled < 0) || (assoc < 0 && pooled > 0)))
    }
  }

  test("q308 Wasserstein: matches an in-memory exact CDF-transport recompute") {
    val t = sf0001
    val vals = t.documents.select("source", "text").collect().map { r =>
      (r.getString(0),
        r.getString(1).toLowerCase.split("[^a-z0-9']+").count(_.nonEmpty).toLong)
    }
    val bySrc = vals.groupBy(_._1).map { case (s, xs) => s -> xs.map(_._2) }
    val support = vals.map(_._2).distinct.sorted
    def w1(sa: String, sb: String): (Long, Long, Long) = {
      val (va, vb) = (bySrc(sa), bySrc(sb))
      val (na, nb) = (va.length.toLong, vb.length.toLong)
      var num = 0L
      for (k <- 0 until support.length - 1) {
        val v = support(k)
        val cumA = va.count(_ <= v).toLong; val cumB = vb.count(_ <= v).toLong
        num += math.abs(cumA * nb - cumB * na) * (support(k + 1) - v)
      }
      (na, nb, num)
    }
    val got = graft.ops.TextAnalysis.qWassersteinMatrix(t).collect()
    val srcs = bySrc.keys.toSeq.sorted
    assert(got.length == srcs.length * (srcs.length - 1) / 2)
    got.foreach { r =>
      val (na, nb, num) = w1(r.getString(0), r.getString(1))
      assert(r.getLong(2) == na); assert(r.getLong(3) == nb)
      assert(r.getLong(4) == num)
      assert(math.abs(r.getDouble(5) - num.toDouble / (na * nb).toDouble) < 1e-12)
    }
  }

  test("q312 Good-Turing: matches an in-memory bigram freq-of-freq recompute") {
    val t = sf0001
    val bigrams = t.documents.select("text").collect().map(_.getString(0))
      .map(_.toLowerCase.split("[^a-z0-9']+").filter(_.nonEmpty))
      .filter(_.length >= 2)
      .flatMap(ts => ts.sliding(2).map(p => p(0) + " " + p(1)))
    val freq = bigrams.groupBy(identity).map { case (_, xs) => xs.length.toLong }
    val nr = freq.groupBy(identity).map { case (r, xs) => r -> xs.size.toLong }
    val nTotal = nr.map { case (r, n) => r * n }.sum
    val n1 = nr.getOrElse(1L, 0L)
    val ladder = nr.keys.toSeq.sorted.take(10)
    val got = graft.ops.TextAnalysis.qGoodTuring(t).collect()
    assert(got.map(_.getLong(0)).toSeq == ladder)
    got.foreach { r =>
      val rv = r.getLong(0)
      assert(r.getLong(1) == nr(rv))
      assert(r.getLong(2) == nr.getOrElse(rv + 1L, 0L))
      assert(r.getLong(3) == nTotal); assert(r.getLong(4) == n1)
      assert(math.abs(r.getDouble(5) -
        ((rv + 1L) * nr.getOrElse(rv + 1L, 0L)).toDouble / nr(rv).toDouble) < 1e-12)
      assert(math.abs(r.getDouble(6) - n1.toDouble / nTotal.toDouble) < 1e-12)
    }
  }

  test("q315 Cramer-von Mises: matches an in-memory squared-gap recompute") {
    val t = sf0001
    def picoAway(x: Double): Long = {
      val m = x * 1.0e12
      (if (m >= 0) math.floor(m + 0.5) else math.ceil(m - 0.5)).toLong
    }
    val vals = t.documents.select("source", "text").collect().map { r =>
      (r.getString(0),
        r.getString(1).toLowerCase.split("[^a-z0-9']+").count(_.nonEmpty).toLong)
    }
    val bySrc = vals.groupBy(_._1).map { case (s, xs) => s -> xs.map(_._2) }
    val support = vals.map(_._2).distinct.sorted
    val got = graft.ops.TextAnalysis.qCramerVonMises(t).collect()
    got.foreach { r =>
      val (sa, sb) = (r.getString(0), r.getString(1))
      val (va, vb) = (bySrc(sa), bySrc(sb))
      val (na, nb) = (va.length.toLong, vb.length.toLong)
      val sum = support.map { v =>
        val ca = va.count(_ == v).toLong; val cb = vb.count(_ == v).toLong
        val gap = va.count(_ <= v).toLong * nb - vb.count(_ <= v).toLong * na
        picoAway((ca + cb).toDouble *
          (gap.toDouble / (na * nb).toDouble) * (gap.toDouble / (na * nb).toDouble))
      }.sum
      assert(r.getLong(2) == na); assert(r.getLong(3) == nb)
      assert(r.getLong(4) == sum)
      val tExp = (na * nb).toDouble / ((na + nb) * (na + nb)).toDouble *
        (sum.toDouble / 1.0e12)
      assert(math.abs(r.getDouble(5) - tExp) < 1e-12)
    }
  }

  test("q319 Burrows delta: matches an in-memory z-score recompute") {
    val t = sf0001
    val stop = graft.functions.text.stopwords
    val docs = t.documents.select("source", "text").collect()
      .map(r => (r.getString(0),
        r.getString(1).toLowerCase.split("[^a-z0-9']+").filter(_.nonEmpty)))
    val bySrc = docs.groupBy(_._1).map { case (s, xs) => s -> xs.flatMap(_._2) }
    val srcs = bySrc.keys.toSeq.sorted
    val words = bySrc.values.flatten.filter(stop.contains).toSeq.distinct
    val fm = (for (w <- words; s <- srcs) yield {
      val tot = bySrc(s).length.toLong
      val cnt = bySrc(s).count(_ == w).toLong
      (w, s) -> math.round(cnt.toDouble / tot.toDouble * 1e6)
    }).toMap
    val zOf = words.flatMap { w =>
      val vals = srcs.map(s => fm((w, s)))
      val g = vals.length.toLong
      val sf = vals.sum; val sf2 = vals.map(v => v * v).sum
      val varnum = g * sf2 - sf * sf
      if (varnum <= 0L) Nil
      else srcs.map(s => (w, s) ->
        ((fm((w, s)).toDouble * g.toDouble - sf.toDouble) /
          math.sqrt(varnum.toDouble * g.toDouble)))
    }.toMap
    val activeWords = zOf.keys.map(_._1).toSeq.distinct
    val got = graft.ops.TextAnalysis.qBurrowsDelta(t).collect()
    got.foreach { r =>
      val (sa, sb) = (r.getString(0), r.getString(1))
      val terms = activeWords.map(w =>
        math.round(math.abs(zOf((w, sa)) - zOf((w, sb))) * 1e6))
      assert(r.getLong(2) == activeWords.length.toLong)
      assert(r.getLong(3) == terms.sum)
      assert(math.abs(r.getDouble(4) -
        terms.sum.toDouble / (terms.length * 1e6)) < 1e-12)
    }
    assert(got.length == srcs.length * (srcs.length - 1) / 2)
  }
}
