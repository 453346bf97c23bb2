package graft

import java.nio.charset.StandardCharsets.UTF_8

import graft.sources.ParsingTools

/** Round-10: WARC record parsing. */
class Round10jSpec extends SparkSpec {

  private def http(body: String): String =
    s"HTTP/1.1 200 OK\r\nContent-Type: text/plain\r\n\r\n$body"

  private def record(tpe: String, payload: String,
      uri: String = "https://x.test/"): String = {
    val p = payload.getBytes(UTF_8)
    s"WARC/1.0\r\nWARC-Type: $tpe\r\nWARC-Target-URI: $uri\r\n" +
      s"Content-Length: ${p.length}\r\n\r\n$payload\r\n\r\n"
  }

  test("warc: records walk by Content-Length, not by markers") {
    // the FIRST body embeds a literal "WARC/1.0" record-looking string —
    // length-honoring parsing must keep it inside the payload
    val trap = "page says WARC/1.0\r\nWARC-Type: fake\r\n\r\n boom"
    val bytes = (record("warcinfo", "software: x\r\n") +
      record("response", http(trap)) +
      record("response", http("second page"))).getBytes(UTF_8)
    val recs = ParsingTools.warcRecords(bytes)
    assert(recs.map(_.recordType) == Seq("warcinfo", "response", "response"))
    val docs = ParsingTools.warcToString(bytes)
    assert(docs == Seq(trap, "second page"))
  }

  test("warc: request records and non-HTTP payloads") {
    val bytes = (record("request", "GET / HTTP/1.1\r\n\r\n") +
      record("response", "raw bytes, no http envelope") +
      record("metadata", "k: v\r\n")).getBytes(UTF_8)
    // only responses surface as documents; a non-HTTP payload passes whole
    assert(ParsingTools.warcToString(bytes) ==
      Seq("raw bytes, no http envelope"))
    val recs = ParsingTools.warcRecords(bytes)
    assert(recs.size == 3)
    assert(recs(0).targetUri == "https://x.test/")
  }

  test("warc: resyncs over garbage between records; tolerates truncation") {
    val bytes = ("some leading junk\n" + record("response", http("a")) +
      "mid garbage" + record("response", http("b"))).getBytes(UTF_8)
    assert(ParsingTools.warcToString(bytes) == Seq("a", "b"))
    // truncated final record: payload clipped at EOF, no crash
    val full = record("response", http("hello world"))
    val truncated = full.substring(0, full.length - 10).getBytes(UTF_8)
    val docs = ParsingTools.warcToString(truncated)
    assert(docs.size == 1 && docs.head.startsWith("hello"))
  }

  test("warc: multi-byte UTF-8 bodies round-trip (lengths are bytes)") {
    val body = "naïve café — 你好"
    val bytes = record("response", http(body)).getBytes(UTF_8)
    assert(ParsingTools.warcToString(bytes) == Seq(body))
  }

  test("warc.gz: per-record gzip members parse transparently (CC shape)") {
    def gzMember(s: String): Array[Byte] = {
      val out = new java.io.ByteArrayOutputStream()
      val gz = new java.util.zip.GZIPOutputStream(out)
      gz.write(s.getBytes(UTF_8)); gz.close()
      out.toByteArray
    }
    // Common Crawl gzips EACH record as its own member, concatenated
    val bytes = gzMember(record("warcinfo", "software: x\r\n")) ++
      gzMember(record("response", http("page one"))) ++
      gzMember(record("response", http("page two")))
    assert(ParsingTools.warcToString(bytes) == Seq("page one", "page two"))
  }

  test("the tokenizer example pipeline runs end to end") {
    val yaml = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("examples/tokenizer_pipeline.yaml")))
    val out = graft.api.Pipeline.runYaml(yaml, spark)
    val rows = out.collect()
    assert(rows.nonEmpty)
    assert(out.columns.toSet == Set("doc_id", "n_tokens", "n_oov", "oov_rate"))
    // the tiny vocab must miss something but not everything
    val rates = rows.map(_.getAs[Double]("oov_rate"))
    assert(rates.exists(_ > 0.0) && rates.forall(_ <= 1.0))
  }

  test("the crawl-curation example pipeline runs end to end") {
    val yaml = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("examples/crawl_curation_pipeline.yaml")))
    val out = graft.api.Pipeline.runYaml(yaml, spark)
    val rows = out.collect()
    assert(rows.nonEmpty)
    assert(out.columns.toSet.intersect(Set("url_canon", "domain",
      "text_dedup", "text_trunc", "n_sentences")).size == 5)
    rows.foreach { r =>
      // PSL-table domain, canonical URL, bounded token count all applied
      assert(r.getAs[String]("domain") == "example.co.uk")
      val u = r.getAs[String]("url_canon")
      assert(u.startsWith("https://www.") && !u.contains("utm_") &&
        !u.contains("#") && !u.contains(":443"))
      assert(r.getAs[Long]("text_trunc_tokens") <= 65) // 64 + marker
    }
  }

  test("the classifier-filter example pipeline runs end to end") {
    val yaml = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("examples/classifier_filter_pipeline.yaml")))
    val out = graft.api.Pipeline.runYaml(yaml, spark)
    val rows = out.collect()
    assert(rows.nonEmpty)
    assert(out.columns.contains("text") && out.columns.contains("nb_score"))
    // everything kept is predicted trusted, and the trusted slice itself
    // classifies correctly (training-set separation)
    assert(rows.forall(_.getAs[String]("pred_label") == "trusted"))
    assert(rows.exists(_.getAs[String]("source") == "src0"))
  }

  test("warc writer/parser round-trip via the ParseOp surface") {
    import org.apache.spark.sql.functions._
    val docs = Seq(("https://a/1", "doc one"), ("https://a/2", "doc two"))
    val warc = ParsingTools.makeWarc(docs)
    val dir = java.nio.file.Files.createTempDirectory("r10warc")
    java.nio.file.Files.write(dir.resolve("f.warc"), warc)
    val files = spark.read.format("binaryFile").load(dir.toString)
    val out = graft.sources.ParseOp(files,
      graft.sources.ParseOp.Config(function = "warc", posKey = Some("i")))
      .orderBy("i").select("text").collect().map(_.getString(0)).toSeq
    assert(out == Seq("doc one", "doc two"))
  }
}
