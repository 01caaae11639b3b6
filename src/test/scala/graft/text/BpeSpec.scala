package graft.text

import graft.pipeline.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** BPE tokenizer: deterministic training, greedy-pass semantics, and
  * the column face == reference-Scala face equivalence that underwrites
  * the cross-engine oracle (the DuckDB face is generated from the same
  * merge table and checked by ta_bpe_tokenize).
  */
class BpeSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("training is deterministic: counts then the lexicographic tie rule") {
    val m = BpeTokenizer.trainMerges(Seq(("low", 1L), ("lower", 1L), ("lowest", 1L)), 4)
    // (l,o) and (o,w) tie at count 3 -> lexicographic picks (l,o);
    // then (lo,w) at 3; then (low,e) at 2
    assert(m.take(3) == Seq(("l", "o"), ("lo", "w"), ("low", "e")), m.toString)
    // training is a pure function: same inputs, same table
    assert(m == BpeTokenizer.trainMerges(Seq(("low", 1L), ("lower", 1L), ("lowest", 1L)), 4))
  }

  test("greedy single-pass overlap semantics: aaa + (a,a) -> [aa, a]") {
    assert(BpeTokenizer.applyMergeOnce(Vector("a", "a", "a"), ("a", "a")) ==
      Vector("aa", "a"))
    assert(BpeTokenizer.applyMergeOnce(Vector("a", "a", "a", "a"), ("a", "a")) ==
      Vector("aa", "aa"))
  }

  test("no trained merge crosses a word boundary") {
    assert(BpeTokenizer.Merges.nonEmpty)
    assert(BpeTokenizer.Merges.forall { case (a, b) => !(a + b).exists(_.isWhitespace) })
  }

  test("column face == reference tokenizer, including adversarial inputs") {
    val texts = Seq(
      "key agg row scan slow fast table value part hash",
      "the window the window the window",
      "aaa unseen-word zz99 mixed",
      "a", " ", "  double  spaces  ", "",
      "it's got 'quotes' and $dollar (parens)")
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
      .select(col("doc_id"),
        BpeTokenizer.encodeCol(lower(col("text"))).as("enc"))
      .select(col("doc_id"),
        BpeTokenizer.tokensFromEncCol(col("enc")).as("toks"),
        BpeTokenizer.countFromEncCol(col("enc")).as("n"))
    val got = df.as[(Long, String, Long)].collect().sortBy(_._1)
    texts.zipWithIndex.foreach { case (t, i) =>
      val ref = BpeTokenizer.tokenize(t.toLowerCase)
      val (_, toks, n) = got(i)
      assert(toks == ref.mkString(" "), s"tokens diverged on '$t': got '$toks'")
      assert(n == ref.length.toLong, s"count diverged on '$t': got $n want ${ref.length}")
    }
    // subword sanity on the driver vocabulary: frequent-pair words
    // compress below their character count, and a word outside the
    // seed vocab still tokenizes (to finer pieces, never an error)
    val vocabToks = BpeTokenizer.tokenize("window")
    assert(vocabToks.length < "window".length, s"no compression: $vocabToks")
    assert(BpeTokenizer.tokenize("zzqx").length == 4, "unseen chars stay char-level")
  }
}
