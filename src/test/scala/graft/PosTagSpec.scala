package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.functions.{text, PerceptronPos}

/** F6 — averaged-perceptron POS tagger goldens (plain JVM, no Spark).
  * The golden sentences mix seed-corpus vocabulary with words the model
  * has NEVER seen (Norway, Tesla, Portugal, Chile, borrowers, factories,
  * ministers, copper) so they exercise the suffix/capitalization/context
  * generalization, not dictionary recall. Goldens pin the full tag
  * sequence: a seed-corpus or feature change that shifts any tag must
  * consciously re-bless these. */
class PosTagSpec extends AnyFunSuite {

  private def tagged(s: String): String =
    PerceptronPos.tag(s.split(" ").toSeq).map { case (w, t) => s"$w/$t" }.mkString(" ")

  test("golden tag sequences on news-style sentences with unseen words") {
    assert(tagged("The company reported strong profits on Tuesday") ==
      "The/DT company/NN reported/VBD strong/JJ profits/NNS on/IN Tuesday/NNP")
    assert(tagged("Investors in Norway bought shares of Tesla") ==
      "Investors/NNS in/IN Norway/NNP bought/VBD shares/NNS of/IN Tesla/NNP")
    assert(tagged("The ministers visited factories in Portugal") ==
      "The/DT ministers/NNS visited/VBD factories/NNS in/IN Portugal/NNP")
    assert(tagged("She said the banks raised fees for borrowers") ==
      "She/PRP said/VBD the/DT banks/NNS raised/VBD fees/NNS for/IN borrowers/NNS")
    assert(tagged("Prices of copper fell in Chile last month") ==
      "Prices/NNS of/IN copper/NN fell/VBD in/IN Chile/NNP last/JJ month/NN")
  }

  test("unambiguous frequent words ride the tagdict, capitalized or not") {
    assert(PerceptronPos.tagDict.get("the").contains("DT"))
    assert(PerceptronPos.tagDict.get("in").contains("IN"))
    assert(PerceptronPos.tag(Seq("The")).head._2 == "DT")
    assert(PerceptronPos.tag(Seq("the")).head._2 == "DT")
  }

  test("tagging is deterministic and the averaged model is non-trivial") {
    val s = "Regulators in Brussels approved mergers between insurers".split(" ").toSeq
    assert(PerceptronPos.tag(s) == PerceptronPos.tag(s))
    assert(PerceptronPos.model.classes.contains("NNP"))
    assert(PerceptronPos.model.classes.contains("NNS"))
    assert(PerceptronPos.model.weights.nonEmpty)
    // averaging happened: weights are 3-decimal lifetime means, so some
    // row must hold a non-integer value (pure perceptron weights are ints)
    assert(PerceptronPos.model.weights.values
      .exists(_.values.exists(w => w != math.rint(w))))
  }

  test("posFilterTokens keeps perceptron-tagged NNP/NNS, stems, drops query") {
    val toks = text.posFilterTokens(
      "Prices of copper fell in Chile last month", Set("chile"))
    // Prices/NNS -> price, copper/NN dropped, fell/VBD dropped,
    // Chile/NNP query-dropped, month/NN dropped
    assert(toks == Seq("price"), s"got $toks")
    val t2 = text.posFilterTokens(
      "Investors in Norway bought shares of Tesla", Set.empty)
    assert(t2.contains("investor") && t2.contains("share"))
    assert(t2.exists(_.startsWith("norwa")) && t2.exists(_.startsWith("tesla")))
    assert(!t2.contains("bought"))
    assert(text.posFilterTokens(null, Set.empty).isEmpty)
    assert(text.posFilterTokens("", Set.empty).isEmpty)
  }
}
