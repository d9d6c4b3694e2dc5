package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ext.CorpusPipeline
import graft.ext.CorpusPipeline.CurationConfig

/** The curation funnel end-to-end on a fixture with one of everything:
  * an exact duplicate, a near duplicate, a language miss, a quality miss. */
class CorpusPipelineSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("curate removes exact dups, near dups, filtered docs; packs the rest") {
    // d1/d2: different text, IDENTICAL shingle set {b c b, c b c} ->
    //        identical minhash signatures -> guaranteed LSH near-dup pair
    //        (kept rep d1 is then a language miss: no stopwords -> 'und')
    // d3/d4: byte-identical -> exact dup
    // d5:    punctuation-only -> 'und' language + rock-bottom quality
    val docs = Seq(
      (1L, "s1", "b c b c b"),
      (2L, "s1", "c b c b c"),
      (3L, "s1", "the cat sat on the mat"),
      (4L, "s2", "the cat sat on the mat"),
      (5L, "s1", "!!! ??? ### !!!")
    ).toDF("doc_id", "source", "text")

    val (packed, report) = CorpusPipeline.curate(docs,
      CurationConfig(langs = Set("en"), minQuality = 0.3, packBudgetTokens = 4))

    assert(report.input == 5)
    assert(report.afterExactDedup == 4, "d4 (byte-identical to d3) drops")
    assert(report.afterNearDedup == 3, "d2 (same shingle set as d1) drops")
    // d1 has no stopwords -> 'und'; d5 is 'und' AND low quality -> only d3
    assert(report.afterFilters == 1, s"report: $report")
    assert(report.afterMix == 1 && report.nPacks > 0)

    val rows = packed.select("doc_id", "pack_id").as[(Long, Long)].collect()
    assert(rows.toSeq == Seq((3L, 0L)))
  }

  test("redaction runs before dedup: docs differing only in an email collapse") {
    val docs = Seq(
      (1L, "s1", "the report is from alice@corp.example about the quarter"),
      (2L, "s1", "the report is from bob.jones@other.example about the quarter")
    ).toDF("doc_id", "source", "text")
    val (packed, report) = CorpusPipeline.curate(docs,
      CurationConfig(langs = Set("en"), minQuality = 0.0, packBudgetTokens = 64))
    assert(report.afterExactDedup == 1, "redacted twins must exact-dedup")
    val kept = packed.select("doc_id", "text").as[(Long, String)].collect().head
    assert(kept._1 == 1L && kept._2.contains("<EMAIL>"))
  }

  test("normalization before dedup: case/accent/spacing variants collapse") {
    // the same english sentence as a case variant with accents and a
    // doubled space — byte-distinct, so without normalize they all survive
    // exact dedup; with it they share a digest and collapse
    val docs = Seq(
      (1L, "s1", "the cafe menu lists the creme brulee today"),
      (2L, "s1", "the caf\u00e9 menu lists the cr\u00e8me br\u00fbl\u00e9e today"),
      (3L, "s1", "The  cafe menu lists the creme brulee today"),
      (4L, "s1", "a wholly different document about the weather")
    ).toDF("doc_id", "source", "text")

    val (_, withoutNorm) = CorpusPipeline.curate(docs,
      CurationConfig(langs = Set("en"), minQuality = 0.0, packBudgetTokens = 64))
    assert(withoutNorm.afterExactDedup == 4,
      "byte-distinct variants must all survive without normalization")

    val (packed, withNorm) = CorpusPipeline.curate(docs,
      CurationConfig(langs = Set("en"), minQuality = 0.0, packBudgetTokens = 64,
        normalize = true))
    assert(withNorm.afterExactDedup == 2,
      "folded variants must share a digest and exact-dedup")
    val kept = packed.select("doc_id", "text").as[(Long, String)].collect()
      .toMap
    assert(kept.keySet == Set(1L, 4L), "smallest doc_id wins per fold group")
    assert(kept(1L) == "the cafe menu lists the creme brulee today",
      "surviving text is the normalized form")
  }

  test("decontamination stage drops the doc leaking a benchmark n-gram") {
    // four good english docs; doc 2 embeds the benchmark's 8-gram verbatim
    val leak = "the quick brown fox jumps over the lazy"
    val docs = Seq(
      (1L, "s1", "the cat sat on the mat with a hat today"),
      (2L, "s1", s"prefix words then $leak dog and more trailing text here"),
      (3L, "s1", "a wholly different document about the weather this week"),
      (4L, "s1", "the last document talks about cooking dinner for the family")
    ).toDF("doc_id", "source", "text")
    val benchmark = Seq((100L, "bench", leak)).toDF("doc_id", "source", "text")

    val (packed, report) = CorpusPipeline.curate(docs,
      CurationConfig(langs = Set("en"), minQuality = 0.0, packBudgetTokens = 64),
      benchmark = Some(benchmark))
    assert(report.afterFilters == 4 && report.afterDecontam == 3,
      s"exactly the leaking doc must drop: $report")
    assert(!packed.select("doc_id").as[Long].collect().contains(2L))

    // without a benchmark the stage is a no-op and the counts agree
    val (_, noBench) = CorpusPipeline.curate(docs,
      CurationConfig(langs = Set("en"), minQuality = 0.0, packBudgetTokens = 64))
    assert(noBench.afterDecontam == noBench.afterFilters)
  }

  test("decontamination shuffles carry n-gram hashes, never n-gram strings") {
    val docs = (1L to 6L).map(i => (i, "s1", s"the d$i document of k$i speaks q$i j$i z$i w$i about things"))
      .toDF("doc_id", "source", "text")
    val bench = Seq((9L, "the d1 document of k1 speaks q1 j1 z1 w1"))
      .toDF("doc_id", "text")
    val df = graft.ext.Decontaminate.contamination(docs, bench, n = 8)
    val p = df.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    val exchange = """Exchange\nInput \[\d+\]: \[([^\]]+)\]""".r
    val inputs = exchange.findAllMatchIn(p).map(_.group(1)).toSeq
    assert(inputs.nonEmpty, s"no exchange found in plan:\n$p")
    inputs.foreach { cols =>
      assert(!cols.contains("__ng"),
        s"an exchange carries n-gram strings: [$cols]")
    }
  }

  test("source strides apply to the post-filter population") {
    // ten good english docs in one source, stride 2 -> keep 5. Every
    // shingle embeds the doc index so the docs share NO shingles — the
    // near-dedup stage must not collapse them.
    val docs = (1L to 10L).map(i => (i, "s1", s"the w$i of k$i is q$i j$i z$i"))
      .toDF("doc_id", "source", "text")
    val (_, report) = CorpusPipeline.curate(docs,
      CurationConfig(langs = Set("en"), minQuality = 0.0,
        sourceStrides = Map("s1" -> 2), packBudgetTokens = 8))
    assert(report.afterFilters == 10)
    assert(report.afterMix == 5)
  }

  test("LM-surprise filter drops the out-of-distribution doc") {
    // five docs of heavily shared VOCABULARY but disjoint SHINGLES (a
    // doc-unique token sits in every trigram window, so near-dedup cannot
    // pair them) + one doc of pure singleton tokens. Under the survivors'
    // own unigram LM every token of the odd doc has count 1 -> avg
    // surprise = ln(N) ~= 4.1; the common docs sit at ln(N) - ~1.0 ~= 3.1.
    // A 3.5 ceiling splits them with margin on both sides.
    val common = (1L to 5L).map(i =>
      (i, "s1", s"the k$i cat q$i sat w$i on z$i the v$i mat"))
    val odd = Seq((6L, "s1", "zxqv wbnk pltr ghsd yfmc"))
    val docs = (common ++ odd).toDF("doc_id", "source", "text")

    val base = CurationConfig(langs = Set("en"), minQuality = 0.0,
      packBudgetTokens = 64)
    // the odd doc has no stopwords -> 'und' language -> it would drop at
    // the lang filter first; keep it alive with langs = en+und so the test
    // isolates the LM stage.
    val (_, report) = CorpusPipeline.curate(docs,
      base.copy(langs = Set("en", "und"), maxSurprise = Some(3.5)))
    assert(report.afterFilters == 6 && report.afterLmFilter == 5,
      s"exactly the singleton-token doc must drop: $report")

    // disabled -> stage is a no-op and the counts agree
    val (_, off) = CorpusPipeline.curate(docs,
      base.copy(langs = Set("en", "und")))
    assert(off.afterLmFilter == off.afterFilters)
  }

  test("span-dedup stage strips repeated boilerplate and drops emptied docs") {
    import org.apache.spark.sql.functions.col
    // docs 1-3 share the same 4-token footer; doc 4 is NOTHING BUT that
    // footer (a cookie banner page) and must vanish at the span stage
    // bodies are 12 distinct tokens each so the shared footer's shingles
    // stay a small minority — the LSH stage upstream must NOT merge these
    // docs (no verification pass runs on candidates)
    val footer = "all rights reserved corp"
    val body1 = "the cat sat on a warm mat and then it slept deeply"
    val body2 = "the dog ran across a wide field chasing one big red ball"
    val body3 = "the bird flew over two tall trees toward its very own nest"
    val docs = Seq(
      (1L, "s1", s"$body1 $footer"),
      (2L, "s1", s"$body2 $footer"),
      (3L, "s1", s"$body3 $footer"),
      (4L, "s1", footer)
    ).toDF("doc_id", "source", "text")
    val base = CurationConfig(langs = Set("en"), minQuality = 0.0,
      packBudgetTokens = 64)
    val (packed, report) = CorpusPipeline.curate(docs,
      base.copy(spanDedupTokens = Some(4)))
    // doc 1 keeps its footer (first occurrence); 2 and 3 lose theirs; 4 is
    // emptied and dropped
    assert(report.afterNearDedup == 4 && report.afterSpanDedup == 3,
      s"the footer-only doc must drop at the span stage: $report")
    val texts = packed.select(col("doc_id"), col("text"))
      .as[(Long, String)].collect().toMap
    assert(texts(1L) == s"$body1 $footer", "first occurrence keeps the footer")
    assert(texts(2L) == body2 && texts(3L) == body3,
      s"later docs lose the boilerplate: $texts")

    // disabled -> stage is a no-op and the counts agree
    val (_, off) = CorpusPipeline.curate(docs, base)
    assert(off.afterSpanDedup == off.afterNearDedup)
  }

  test("temperature mixing flattens the source mix from the survivors' own counts") {
    import spark.implicits._
    // s1 has 9 english docs, s2 has 1 -> tau=2 strides (9)^0.5=3 and 1:
    // s1 keeps its 1st/4th/7th surviving docs, s2 keeps its one
    val docs = ((1L to 9L).map(i =>
      (i, "s1", s"the w$i cat k$i sat q$i on z$i the v$i mat")) ++
      Seq((10L, "s2", "the last doc is about the family dinner")))
      .toDF("doc_id", "source", "text")
    val (packed, report) = CorpusPipeline.curate(docs,
      CurationConfig(langs = Set("en"), minQuality = 0.0,
        packBudgetTokens = 64, mixTemperature = Some(2.0)))
    assert(report.afterFilters == 10, s"all docs reach the mix: $report")
    val kept = packed.select("doc_id").as[Long].collect().toSet
    assert(kept == Set(1L, 4L, 7L, 10L),
      s"tau=2 must keep s1 3:1 and all of s2: $kept")
  }

  test("per-source cap keeps the k best-quality docs of each source") {
    // s1 has three docs of sharply different quality (length + stopword
    // ratio drive the score); s2 has one. cap=2 keeps s1's two best and
    // all of s2.
    val docs = Seq(
      (1L, "s1", "the cat sat on the mat and the dog sat on the rug today"),
      (2L, "s1", "the quick brown fox is in the yard and the barn this week"),
      (3L, "s1", "qq zz xx"), // short, no stopwords -> lowest score
      (4L, "s2", "the last document is about cooking dinner for the family")
    ).toDF("doc_id", "source", "text")
    val (packed, report) = CorpusPipeline.curate(docs,
      CurationConfig(langs = Set("en", "und"), minQuality = 0.0,
        packBudgetTokens = 64, perSourceCap = Some(2)))
    assert(report.afterCap == 3, s"cap=2 on s1 + 1 doc in s2: $report")
    import spark.implicits._
    val kept = packed.select("doc_id").as[Long].collect().toSet
    assert(kept == Set(1L, 2L, 4L), s"doc 3 (lowest quality) must drop: $kept")
  }
}
