package graft.functions

import scala.collection.mutable

/** Averaged-perceptron part-of-speech tagger (F6) — the real algorithm
  * behind the reference's `nltk.tag.pos_tag` (lda.py:7,25): Collins 2002
  * ("Discriminative Training Methods for HMMs", EMNLP) structured
  * perceptron with weight averaging, in the greedy left-to-right form
  * popularized by Honnibal 2013 ("A Good Part-of-Speech Tagger in about
  * 200 Lines of Python") that NLTK ships as `PerceptronTagger`.
  *
  * NLTK's pretrained Penn-Treebank weight file is not redistributable
  * here (zero egress, and the WSJ corpus is licensed), so the weight
  * table is TRAINED IN-PROCESS from the embedded hand-tagged news-domain
  * seed corpus below (~56 sentences, PTB tagset) — a real trained model,
  * not a suffix heuristic. Two deviations from NLTK, both documented:
  *  - two extra boolean features (initial-capital, all-caps) compensate
  *    for the tiny vocabulary: NLTK's normalization lowercases every
  *    word and relies on a 50k-word tagdict to recognize proper nouns,
  *    which a seed corpus cannot provide; capitalization is the standard
  *    fallback signal (Ratnaparkhi 1996 uses the same feature).
  *  - training is fully deterministic: fixed-seed shuffles, insertion-
  *    ordered maps, lexicographic tie-breaks — so every executor JVM
  *    trains the IDENTICAL model and tagging is reproducible cross-run
  *    (the repo-wide determinism contract).
  *
  * Accuracy on held-out news titles is far below WSJ-trained NLTK, but
  * the MODEL CLASS is now faithful: downstream consumers (posFilterTokens
  * → q44 LDA) exercise a genuine context-sensitive tagger rather than a
  * per-token capitalization test.
  */
object PerceptronPos {

  private val Start = Array("-START-", "-START2-")
  private val End = Array("-END-", "-END2-")

  /** One weight row per feature: tag -> weight. LinkedHashMap keeps
    * update-insertion order so averaging iterates deterministically. */
  final class AveragedPerceptron {
    val weights = mutable.LinkedHashMap.empty[String, mutable.LinkedHashMap[String, Double]]
    var classes: Vector[String] = Vector.empty
    private val totals = mutable.LinkedHashMap.empty[(String, String), Double]
    private val tstamps = mutable.LinkedHashMap.empty[(String, String), Int]
    private var i = 0

    def predict(features: Iterable[(String, Int)]): String = {
      val scores = mutable.HashMap.empty[String, Double].withDefaultValue(0.0)
      features.foreach { case (f, v) =>
        if (v != 0) weights.get(f).foreach { row =>
          row.foreach { case (tag, w) => scores(tag) += v * w }
        }
      }
      // max score, ties broken lexicographically — deterministic
      classes.maxBy(t => (scores(t), t))(
        Ordering.Tuple2(Ordering.Double.TotalOrdering, Ordering.String.reverse))
    }

    def update(truth: String, guess: String, features: Iterable[(String, Int)]): Unit = {
      i += 1
      if (truth == guess) return
      features.foreach { case (f, _) =>
        val row = weights.getOrElseUpdate(f, mutable.LinkedHashMap.empty)
        updFeat(truth, f, row.getOrElse(truth, 0.0), 1.0, row)
        updFeat(guess, f, row.getOrElse(guess, 0.0), -1.0, row)
      }
    }

    private def updFeat(tag: String, f: String, w: Double, v: Double,
        row: mutable.LinkedHashMap[String, Double]): Unit = {
      val key = (f, tag)
      totals(key) = totals.getOrElse(key, 0.0) + (i - tstamps.getOrElse(key, 0)) * w
      tstamps(key) = i
      row(tag) = w + v
    }

    /** Collins averaging: final weight = lifetime mean, 3-decimal rounded
      * (Honnibal's serialization precision — also kills FP noise). */
    def averageWeights(): Unit = {
      weights.foreach { case (f, row) =>
        row.keys.toSeq.foreach { tag =>
          val key = (f, tag)
          val total = totals.getOrElse(key, 0.0) +
            (i - tstamps.getOrElse(key, 0)) * row(tag)
          val avg = total / math.max(i, 1)
          row(tag) = math.rint(avg * 1000.0) / 1000.0
        }
      }
    }
  }

  private def normalize(word: String): String =
    if (word.contains("-") && word.nonEmpty && word.head != '-') "!HYPHEN"
    else if (word.length == 4 && word.forall(_.isDigit)) "!YEAR"
    else if (word.nonEmpty && word.head.isDigit) "!DIGITS"
    else word.toLowerCase

  /** Honnibal's feature template + the two capitalization features. The
    * `context` array is normalized words padded with START/END markers;
    * `i` is the position within the PADDED array. */
  private def features(i: Int, word: String, context: Array[String],
      prev: String, prev2: String): List[(String, Int)] = {
    def suf(w: String, n: Int) = if (w.length >= n) w.substring(w.length - n) else w
    val b = List.newBuilder[(String, Int)]
    def add(name: String, args: String*): Unit =
      b += (((name +: args).mkString(" "), 1))
    add("bias")
    add("i suffix", suf(word, 3))
    add("i pref1", word.take(1))
    add("i-1 tag", prev)
    add("i-2 tag", prev2)
    add("i tag+i-2 tag", prev, prev2)
    add("i word", context(i))
    add("i-1 tag+i word", prev, context(i))
    add("i-1 word", context(i - 1))
    add("i-1 suffix", suf(context(i - 1), 3))
    add("i-2 word", context(i - 2))
    add("i+1 word", context(i + 1))
    add("i+1 suffix", suf(context(i + 1), 3))
    add("i+2 word", context(i + 2))
    if (word.nonEmpty && word.head.isUpper) add("i istitle")
    if (word.length > 1 && word.forall(c => !c.isLetter || c.isUpper)) add("i isupper")
    b.result()
  }

  /** Hand-tagged news-domain seed corpus (PTB tagset). Coverage targets
    * the tags the reference filter cares about (NNP, NNS) plus enough
    * DT/IN/JJ/verb/CC/PRP/CD/MD context for the sequence features to
    * learn transition structure. */
  private val seedCorpus: Seq[Seq[(String, String)]] = Seq(
    "The/DT company/NN reported/VBD strong/JJ profits/NNS on/IN Tuesday/NNP ./.",
    "Shares/NNS of/IN Apple/NNP rose/VBD sharply/RB after/IN the/DT announcement/NN ./.",
    "Investors/NNS bought/VBD stocks/NNS and/CC bonds/NNS last/JJ week/NN ./.",
    "Microsoft/NNP and/CC Google/NNP announced/VBD new/JJ products/NNS in/IN January/NNP ./.",
    "The/DT president/NN met/VBD with/IN European/JJ leaders/NNS in/IN Brussels/NNP ./.",
    "Economists/NNS expect/VBP higher/JJR rates/NNS this/DT year/NN ./.",
    "The/DT markets/NNS closed/VBD lower/JJR on/IN Friday/NNP ./.",
    "Researchers/NNS published/VBD results/NNS in/IN three/CD journals/NNS ./.",
    "The/DT government/NN raised/VBD taxes/NNS on/IN imports/NNS ./.",
    "Analysts/NNS said/VBD the/DT deal/NN would/MD close/VB in/IN March/NNP ./.",
    "London/NNP and/CC Paris/NNP signed/VBD the/DT agreement/NN on/IN Monday/NNP ./.",
    "The/DT court/NN ruled/VBD against/IN the/DT banks/NNS on/IN Thursday/NNP ./.",
    "Prices/NNS of/IN oil/NN fell/VBD during/IN the/DT summer/NN ./.",
    "The/DT senator/NN from/IN Texas/NNP proposed/VBD new/JJ rules/NNS ./.",
    "Companies/NNS in/IN Japan/NNP hired/VBD thousands/NNS of/IN workers/NNS ./.",
    "The/DT committee/NN approved/VBD the/DT budget/NN for/IN schools/NNS ./.",
    "Scientists/NNS at/IN Stanford/NNP discovered/VBD a/DT new/JJ material/NN ./.",
    "The/DT union/NN demanded/VBD better/JJR wages/NNS for/IN drivers/NNS ./.",
    "Reporters/NNS asked/VBD questions/NNS about/IN the/DT election/NN ./.",
    "The/DT bank/NN lowered/VBD fees/NNS for/IN customers/NNS in/IN April/NNP ./.",
    "Farmers/NNS sold/VBD crops/NNS to/TO buyers/NNS in/IN China/NNP ./.",
    "The/DT minister/NN visited/VBD hospitals/NNS and/CC schools/NNS in/IN Berlin/NNP ./.",
    "Regulators/NNS fined/VBD the/DT firms/NNS millions/NNS of/IN dollars/NNS ./.",
    "The/DT team/NN won/VBD five/CD games/NNS in/IN October/NNP ./.",
    "Officials/NNS announced/VBD plans/NNS for/IN new/JJ roads/NNS ./.",
    "The/DT mayor/NN of/IN Chicago/NNP opened/VBD two/CD libraries/NNS ./.",
    "Teachers/NNS trained/VBD students/NNS for/IN national/JJ exams/NNS ./.",
    "The/DT airline/NN canceled/VBD flights/NNS to/TO Madrid/NNP on/IN Sunday/NNP ./.",
    "Engineers/NNS built/VBD bridges/NNS across/IN the/DT river/NN ./.",
    "The/DT study/NN linked/VBD diets/NNS to/TO lower/JJR risks/NNS ./.",
    "Voters/NNS in/IN Ohio/NNP supported/VBD the/DT measure/NN ./.",
    "The/DT festival/NN attracted/VBD visitors/NNS from/IN Italy/NNP and/CC Spain/NNP ./.",
    "Lawyers/NNS filed/VBD claims/NNS against/IN the/DT insurer/NN ./.",
    "The/DT museum/NN displayed/VBD paintings/NNS from/IN France/NNP ./.",
    "Doctors/NNS treated/VBD patients/NNS in/IN rural/JJ clinics/NNS ./.",
    "The/DT startup/NN raised/VBD funds/NNS from/IN investors/NNS in/IN Boston/NNP ./.",
    "Workers/NNS repaired/VBD roads/NNS after/IN the/DT storm/NN ./.",
    "The/DT editor/NN rejected/VBD articles/NNS about/IN celebrities/NNS ./.",
    "Students/NNS organized/VBD protests/NNS at/IN universities/NNS in/IN Madrid/NNP ./.",
    "The/DT chef/NN opened/VBD restaurants/NNS in/IN Rome/NNP and/CC Milan/NNP ./.",
    "He/PRP said/VBD that/IN sales/NNS would/MD grow/VB ./.",
    "She/PRP leads/VBZ the/DT division/NN that/WDT makes/VBZ engines/NNS ./.",
    "They/PRP are/VBP building/VBG houses/NNS near/IN the/DT coast/NN ./.",
    "It/PRP was/VBD the/DT largest/JJS merger/NN in/IN history/NN ./.",
    "The/DT shares/NNS have/VBP fallen/VBN since/IN June/NNP ./.",
    "Many/JJ cities/NNS banned/VBD cars/NNS from/IN central/JJ districts/NNS ./.",
    "Small/JJ businesses/NNS hired/VBD more/JJR employees/NNS in/IN December/NNP ./.",
    "The/DT report/NN showed/VBD rising/VBG costs/NNS for/IN families/NNS ./.",
    "Police/NNS arrested/VBD suspects/NNS near/IN the/DT station/NN ./.",
    "The/DT journal/NN published/VBD papers/NNS by/IN researchers/NNS from/IN Oxford/NNP ./.",
    "Germany/NNP exported/VBD machines/NNS and/CC vehicles/NNS in/IN 2019/CD ./.",
    "Senators/NNS debated/VBD the/DT bill/NN in/IN Washington/NNP on/IN Wednesday/NNP ./.",
    "The/DT coach/NN praised/VBD players/NNS after/IN the/DT match/NN in/IN Manchester/NNP ./.",
    "Tourists/NNS visited/VBD beaches/NNS in/IN Greece/NNP during/IN August/NNP ./.",
    "The/DT network/NN broadcast/VBD interviews/NNS with/IN candidates/NNS in/IN Iowa/NNP ./.",
    "Publishers/NNS printed/VBD copies/NNS of/IN the/DT novel/NN in/IN May/NNP ./.",
    "The/DT senators/NNS rejected/VBD the/DT proposals/NNS on/IN Tuesday/NNP ./.",
    "The/DT ministers/NNS discussed/VBD tariffs/NNS with/IN officials/NNS ./.",
    "The/DT banks/NNS reported/VBD losses/NNS in/IN September/NNP ./.",
    "The/DT workers/NNS joined/VBD unions/NNS in/IN November/NNP ./.",
    "The/DT investors/NNS sought/VBD returns/NNS in/IN foreign/JJ markets/NNS ./.",
    "The/DT doctors/NNS warned/VBD parents/NNS about/IN infections/NNS ./.",
    "The/DT lawyers/NNS reviewed/VBD contracts/NNS for/IN clients/NNS ./.",
    "The/DT farmers/NNS planted/VBD seeds/NNS in/IN spring/NN ./.",
    "Exports/NNS grew/VBD last/JJ month/NN ./.",
    "Prices/NNS of/IN copper/NN rose/VBD this/DT quarter/NN ./.",
    "Stocks/NNS fell/VBD in/IN London/NNP ./.",
    "Sales/NNS fell/VBD after/IN the/DT holidays/NNS ./."
  ).map(_.split(" ").toSeq.map { wt =>
    val k = wt.lastIndexOf('/')
    (wt.substring(0, k), wt.substring(k + 1))
  })

  /** Unambiguous-frequent-word shortcut dictionary (Honnibal's tagdict):
    * words seen >= 3 times with a single tag bypass prediction. */
  private def buildTagDict(corpus: Seq[Seq[(String, String)]]): Map[String, String] = {
    val counts = mutable.LinkedHashMap.empty[String, mutable.LinkedHashMap[String, Int]]
    corpus.foreach(_.foreach { case (w, t) =>
      val row = counts.getOrElseUpdate(normalize(w), mutable.LinkedHashMap.empty)
      row(t) = row.getOrElse(t, 0) + 1
    })
    counts.iterator.collect {
      case (w, row) if row.values.sum >= 3 && row.size == 1 =>
        w -> row.head._1
    }.toMap
  }

  private def padded(words: Seq[String]): Array[String] =
    (Start ++ words.map(normalize) ++ End)

  /** Model: trained once per JVM at first use; ~56 sentences × 8 epochs
    * is sub-millisecond work. Fully deterministic (see scaladoc). */
  lazy val (model: AveragedPerceptron, tagDict: Map[String, String]) = {
    val ap = new AveragedPerceptron
    val dict = buildTagDict(seedCorpus)
    ap.classes = seedCorpus.flatten.map(_._2).distinct.sorted.toVector
    val rng = new scala.util.Random(1)
    var order = seedCorpus.indices.toVector
    (1 to 8).foreach { _ =>
      order.foreach { si =>
        val sent = seedCorpus(si)
        val context = padded(sent.map(_._1))
        var prev = Start(0)
        var prev2 = Start(1)
        sent.zipWithIndex.foreach { case ((word, truth), j) =>
          val guess = dict.getOrElse(normalize(word), {
            val f = features(j + 2, word, context, prev, prev2)
            val g = ap.predict(f)
            ap.update(truth, g, f)
            g
          })
          prev2 = prev
          prev = guess
        }
      }
      order = rng.shuffle(order)
    }
    ap.averageWeights()
    (ap, dict)
  }

  /** Greedy left-to-right tagging of one sentence (NLTK `pos_tag` shape). */
  def tag(words: Seq[String]): Seq[(String, String)] = {
    if (words.isEmpty) return Nil
    val (ap, dict) = (model, tagDict)
    val context = padded(words)
    var prev = Start(0)
    var prev2 = Start(1)
    words.zipWithIndex.map { case (word, j) =>
      val t = dict.getOrElse(normalize(word),
        ap.predict(features(j + 2, word, context, prev, prev2)))
      prev2 = prev
      prev = t
      (word, t)
    }
  }
}
