package graft.ext

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** DSIR contracts: weights must actually pull toward the target slice,
  * and the Gumbel resample must over-index it without collapsing. */
class DsirSpec extends SparkSuite {

  private lazy val docs =
    graft.sources.Tables(spark, "/root/testdata/sf0.001", "documents")

  test("target-language docs carry higher mean importance weight") {
    val w = Dsir.importanceWeights(docs, targetLang = "en")
      .join(docs.select("doc_id", "lang"), Seq("doc_id"))
    val byLang = w.groupBy("lang").agg(avg("avg_logw_r").as("m"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    info(s"mean avg_logw by lang: $byLang")
    val others = byLang.filterNot(_._1 == "en").values
    assert(others.nonEmpty && byLang("en") > others.max,
      "en docs must outscore every other language on average")
  }

  test("resample over-indexes the target language but keeps tail mass") {
    val audit = Dsir.selectionAudit(docs, k = 60, targetLang = "en")
      .collect()
      .map(r => r.getString(0) -> (r.getAs[Long]("n_docs"),
        r.getAs[Long]("n_kept"))).toMap
    val (enDocs, enKept) = audit("en")
    val (otherDocs, otherKept) =
      audit.filterNot(_._1 == "en").values
        .foldLeft((0L, 0L)) { case ((d, k2), (dd, kk)) => (d + dd, k2 + kk) }
    val enShare = enKept.toDouble / enDocs
    val otherShare = otherKept.toDouble / otherDocs
    info(s"keep share: en=$enShare other=$otherShare")
    assert(enShare > otherShare, "selection must over-index the target slice")
    assert(otherKept > 0L,
      "Gumbel noise must keep nonzero tail mass outside the target")
    assert(audit.values.map(_._2).sum === 60L, "exactly k docs selected")
  }

  test("weights are deterministic across recomputation") {
    val a = Dsir.importanceWeights(docs).collect().map(_.toString).sorted
    val b = Dsir.importanceWeights(docs).collect().map(_.toString).sorted
    assert(a.sameElements(b))
  }
}
