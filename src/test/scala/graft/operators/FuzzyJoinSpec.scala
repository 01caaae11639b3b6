package graft.operators

import graft.pipeline.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** FuzzyJoin's whole claim is LOSSLESSNESS — the blocked join must
  * equal the brute-force `levenshtein(a,b) <= d` predicate join
  * bit-for-bit. Fuzzed here over adversarial regimes: low-entropy
  * alphabets (hot grams), strings shorter than the gram width, empty
  * strings, and every edit type, for (d, q) in {1,2} x {2,3}.
  */
class FuzzyJoinSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def lev(a: String, b: String): Int = {
    val dp = Array.tabulate(b.length + 1)(identity)
    for (i <- 1 to a.length) {
      var prev = dp(0); dp(0) = i
      for (j <- 1 to b.length) {
        val cur = dp(j)
        dp(j) = math.min(math.min(dp(j) + 1, dp(j - 1) + 1),
          prev + (if (a(i - 1) == b(j - 1)) 0 else 1))
        prev = cur
      }
    }
    dp(b.length)
  }

  private def check(ls: Seq[String], rs: Seq[String], d: Int, q: Int): Unit = {
    val l = ls.zipWithIndex.map { case (s, i) => (i.toLong, s) }.toDF("l_id", "l_s")
    val r = rs.zipWithIndex.map { case (s, i) => (i.toLong, s) }.toDF("r_id", "r_s")
    val got = FuzzyJoin.fuzzyJoin(l, "l_id", "l_s", r, "r_id", "r_s", d, q)
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getLong(2))).toSet
    val want = (for {
      (a, i) <- ls.zipWithIndex; (b, j) <- rs.zipWithIndex
      dist = lev(a, b) if dist <= d
    } yield (i.toLong, j.toLong, dist.toLong)).toSet
    assert(got == want,
      s"d=$d q=$q missing=${(want -- got).take(5)} extra=${(got -- want).take(5)}")
  }

  test("fuzz: blocked join equals brute force over low-entropy random strings") {
    val rnd = new scala.util.Random(41)
    def mk(n: Int, alpha: String, maxLen: Int) =
      Seq.fill(n)((0 until rnd.nextInt(maxLen + 1)).map(_ =>
        alpha(rnd.nextInt(alpha.length))).mkString)
    for (d <- Seq(1, 2); q <- Seq(2, 3)) {
      check(mk(80, "ab", 10), mk(80, "ab", 10), d, q)      // hot grams, shorts
      check(mk(60, "abcdef", 16), mk(60, "abcdef", 16), d, q)
    }
  }

  test("fuzz: planted single edits and empty strings all recovered") {
    val rnd = new scala.util.Random(43)
    val canon = Seq.fill(50)((0 until 12).map(_ =>
      ('a' + rnd.nextInt(26)).toChar).mkString)
    val dirty = canon.map { s =>
      val p = rnd.nextInt(s.length)
      rnd.nextInt(3) match {
        case 0 => s.updated(p, ('a' + rnd.nextInt(26)).toChar)
        case 1 => s.take(p) + s.drop(p + 1)
        case _ => s.take(p) + "z" + s.drop(p)
      }
    } ++ Seq("", "a")
    check(canon ++ Seq("", "ab"), dirty, d = 2, q = 3)
  }

  test("degenerate hot-gram regime: all-identical corpus still exact (output is the true quadratic pair set)") {
    // every string equal -> every gram group is maximally hot and the
    // TRUE answer is all n^2 pairs; the blocking must neither lose
    // pairs nor duplicate them (groupBy-per-pair + disjoint branches)
    val n = 40
    val same = Seq.fill(n)("abcdefghijkl")
    val l = same.zipWithIndex.map { case (s, i) => (i.toLong, s) }.toDF("l_id", "l_s")
    val r = same.zipWithIndex.map { case (s, i) => (i.toLong, s) }.toDF("r_id", "r_s")
    val got = FuzzyJoin.fuzzyJoin(l, "l_id", "l_s", r, "r_id", "r_s", 2, 3).collect()
    assert(got.length == n * n, s"expected ${n * n} rows, got ${got.length}")
    assert(got.forall(_.getLong(2) == 0L))
  }

  test("null strings drop, not throw") {
    val l = Seq((0L, "abc"), (1L, null)).toDF("l_id", "l_s")
    val r = Seq((0L, "abd"), (1L, null)).toDF("r_id", "r_s")
    val got = FuzzyJoin.fuzzyJoin(l, "l_id", "l_s", r, "r_id", "r_s", 2, 3)
      .collect().map(x => (x.getLong(0), x.getLong(1))).toSet
    assert(got == Set((0L, 0L)))
  }

  test("fixture derivation: Spark columns equal their SQL twins' semantics") {
    // canonical is 12 chars; dirty is 11/12/13 by mode; each (i, i)
    // pair sits within distance 1 of its canonical
    val df = spark.range(0, 300).select(col("id"),
      FuzzyJoin.canonicalCol(col("id")).as("c"),
      FuzzyJoin.dirtyCol(col("id")).as("y"))
    val rows = df.collect()
    rows.foreach { r =>
      val (id, c, y) = (r.getLong(0), r.getString(1), r.getString(2))
      assert(c.length == 12)
      assert(y.length == 12 - (id % 3 match { case 0 => 0; case 1 => 1; case _ => -1 }))
      assert(lev(c, y) <= 1, s"id=$id c=$c y=$y")
    }
    // high-entropy: no two canonicals collide in this range
    assert(rows.map(_.getString(1)).distinct.length == 300)
  }
}
