package graft.cli

import org.apache.spark.sql.SparkSession

/** Dev-only: distributed exactness sweep — every output span compared
  * to the oracle inside the job (mismatches counted, first few shown).
  */
object ExactSweep {
  def main(args: Array[String]): Unit = {
    val nDocs = if (args.nonEmpty) args(0).toInt else 20000
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    // half the image spans served as PNG (same render, different codec
    // path): the sweep covers BOTH media formats through the full
    // pipeline. The schemes share field layout, so a prefix swap keeps
    // the oracle (expectedSpans parses either).
    val docs = graft.fixtures.DocGen.synthetic(spark, nDocs, seed = 4242L,
        maxSpans = 8, imageRatio = 0.6, skewed = true, sentencesPerImage = 4)
      .map { d =>
        if (d.doc_id.hashCode % 2 != 0) d
        else d.copy(spans = d.spans.map { sp =>
          if (sp.kind == "image")
            sp.copy(media_ref = graft.image.SynthMediaStore.PngScheme +
              sp.media_ref.stripPrefix(graft.image.SynthMediaStore.Scheme))
          else sp
        })
      }
    val inputByKey = docs
    val out = graft.pipeline.ExtractionJob.extract(spark, docs)
    // recompute the oracle per doc INSIDE the job (pure function of the
    // input row) and compare
    val joined = inputByKey.joinWith(out, inputByKey("doc_id") === out("doc_id"))
    val bad = joined.flatMap { case (in, got) =>
      val want = graft.fixtures.DocGen.expectedSpans(in)
      if (got.spans == want) None
      else Some((in.doc_id, want.map(_.text).mkString("|").take(120),
        got.spans.map(_.text).mkString("|").take(120)))
    }.collect()
    println(s"[sweep] docs=$nDocs mismatches=${bad.length}")
    bad.take(5).foreach { case (id, w, g) => println(s"  $id\n   want=$w\n   got =$g") }
    spark.stop()
    if (bad.nonEmpty) sys.exit(1)
  }
}
