package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.Warc

class WarcSpec extends AnyFunSuite with SharedSpark {

  test("audio fingerprint: every snippet matches its source at dt=1") {
    import org.apache.spark.sql.functions._
    val m = graft.operators.AudioFp.fingerprintMatch(
      graft.Tables.load(spark, SfDir, "documents"))
      .agg(count(lit(1)).as("n"),
        sum(when(col("hit"), 1L).otherwise(0L)).as("ok")).head()
    assert(m.getLong(0) > 0)
    assert(m.getLong(1) === m.getLong(0),
      "a snippet failed to fingerprint-match its own track")
  }

  test("record/parseRecord roundtrip preserves multi-byte payloads exactly") {
    val payload = "héllo wörld — ünïcode ✓".getBytes("UTF-8")
    val rec = Warc.record(42L, "web", payload)
    val (fields, got) = Warc.parseRecord(rec)
    assert(got.sameElements(payload))
    assert(fields("WARC-Record-ID") == "<urn:graft:doc-42>")
    assert(fields("WARC-Type") == "resource")
    assert(fields("Content-Length").toInt == payload.length)
    assert(fields("WARC-Target-URI") == "graft://web/doc/42")
    // truncating the payload breaks Content-Length framing loudly
    intercept[IllegalArgumentException] {
      Warc.parseRecord(rec.dropRight(5) ++ "\r\n\r\n".getBytes("UTF-8"))
    }
  }

  test("writeFiles/readFiles over the corpus: every doc survives, files are sized") {
    import spark.implicits._
    val docs = graft.Tables.load(spark, SfDir, "documents")
      .select(col("doc_id"), col("source"), col("text"))
    val files = Warc.writeFiles(docs, docsPerFile = 16).cache()
    val nDocs = docs.count()
    assert(files.agg(sum("n_records")).head.getLong(0) === nDocs)
    val back = Warc.readFiles(files)
      .select(col("doc_id"),
        decode(col("payload"), "UTF-8").as("text2"))
    val joined = docs.join(back, "doc_id")
    assert(joined.count() === nDocs)
    assert(joined.filter(col("text") =!= col("text2")).count() === 0)
    // a flipped byte inside a member surfaces as a loud failure, not a
    // silently sheared record
    val blob = files.orderBy("warc_file").head.getAs[Array[Byte]]("bytes")
    val bad = blob.clone(); bad(30) = (bad(30) ^ 0x10).toByte
    intercept[Exception] {
      Warc.readFiles(Seq((0L, 1, bad)).toDF("warc_file", "n_records", "bytes"))
        .count()
    }
    files.unpersist()
  }
}
