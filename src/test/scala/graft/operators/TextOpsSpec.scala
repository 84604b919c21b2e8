package graft.operators

import graft.SparkSpec

class TextOpsSpec extends SparkSpec {

  test("fingerprint equals the driver-side polynomial hash") {
    val texts = t.documents.select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val got = TextOps.fingerprint(t).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    texts.foreach { case (id, txt) =>
      val expected = txt.foldLeft(0L)((h, c) => (h * 31L + c.toLong) % 1000000007L)
      assert(got(id) == expected, s"doc $id")
    }
  }

  test("token counts: bpe tokens never exceed characters, ws tokens never exceed bpe") {
    val rows = TextOps.tokenCounts(t).collect()
    rows.foreach { r =>
      val (ws, bpe) = (r.getLong(1), r.getLong(2))
      assert(ws <= bpe, s"doc ${r.getLong(0)}")
    }
  }

  test("quality ratios are in [0,1] and counts are consistent") {
    val rows = TextOps.textQuality(t).collect()
    rows.foreach { r =>
      assert(r.getLong(3) <= r.getLong(2)) // n_stop <= n_words
      assert(r.getDouble(6) >= 0.0 && r.getDouble(6) <= 1.0)
      assert(r.getDouble(7) >= 0.0 && r.getDouble(7) <= 1.0)
    }
  }

  test("lang id is deterministic and total") {
    val a = TextOps.langId(t).collect().map(r => (r.getLong(0), r.getString(1)))
    val b = TextOps.langId(t).collect().map(r => (r.getLong(0), r.getString(1)))
    assert(a.sameElements(b))
    assert(a.forall(x => Set("en", "es", "fr", "de", "zh", "und").contains(x._2)))
  }
}
