package graft

import org.apache.spark.sql.functions._
import graft.operators.Chunking

/** Semantic coverage for token-window chunking (x41). Cell-exact
  * cross-engine agreement is the driver oracle's job; these pin the
  * window geometry, the tiling/overlap invariants, and the zero-shuffle
  * plan shape the operator's scale story rests on. */
class ChunkingSpec extends SparkSpec {
  import spark.implicits._

  private def doc(id: Long, text: String) = Seq((id, text)).toDF("doc_id", "text")

  private def chunksOf(text: String, size: Int, stride: Int): Seq[(Long, Long, String)] =
    Chunking.chunkDocuments(doc(1L, text), $"doc_id", $"text", size, stride)
      .select($"chunk_id", $"n_chunk_tokens", $"chunk")
      .orderBy($"chunk_id")
      .as[(Long, Long, String)].collect().toSeq

  test("window geometry: starts every stride, trailing windows shorten") {
    // 10 tokens, size 4, stride 3 → starts 0,3,6,9 → lengths 4,4,4,1
    val text = (0 until 10).map(i => s"t$i").mkString(" ")
    val got = chunksOf(text, size = 4, stride = 3)
    assert(got == Seq(
      (0L, 4L, "t0 t1 t2 t3"),
      (1L, 4L, "t3 t4 t5 t6"),
      (2L, 4L, "t6 t7 t8 t9"),
      (3L, 1L, "t9")))
  }

  test("stride == chunkSize tiles exactly: concatenation rebuilds the doc") {
    val text = (0 until 11).map(i => s"w$i").mkString(" ")
    val got = chunksOf(text, size = 4, stride = 4)
    assert(got.map(_._2).sum == 11, "tiling must cover every token exactly once")
    assert(got.map(_._3).mkString(" ") == text)
  }

  test("empty and null texts yield no chunks; whitespace runs collapse") {
    val d = Seq((1L, ""), (2L, null), (3L, "  a   b  ")).toDF("doc_id", "text")
    val got = Chunking.chunkDocuments(d, $"doc_id", $"text", 4, 4)
      .select($"_id", $"chunk").as[(Long, String)].collect().toSeq
    assert(got == Seq((3L, "a b")))
  }

  test("bad geometry is rejected up front") {
    val d = doc(1L, "a b")
    intercept[IllegalArgumentException](Chunking.chunkDocuments(d, $"doc_id", $"text", 0, 1))
    intercept[IllegalArgumentException](Chunking.chunkDocuments(d, $"doc_id", $"text", 4, 0))
    intercept[IllegalArgumentException](Chunking.chunkDocuments(d, $"doc_id", $"text", 4, 5))
  }

  test("chunking is a pure narrow generator: zero exchanges in the plan") {
    val docs = graft.core.Tables.load(spark, sf("sf0.001"), "documents")
    val plan = Chunking.chunkDocuments(docs, $"doc_id", $"text", 64, 48)
      .queryExecution.executedPlan
    val exchanges = plan.collect {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeLike => e
    }
    assert(exchanges.isEmpty, s"chunking should not shuffle:\n$plan")
  }

  test("every chunk of the corpus is non-empty and within size bound") {
    val docs = graft.core.Tables.load(spark, sf("sf0.001"), "documents")
    val bad = Chunking.chunkDocuments(docs, $"doc_id", $"text", 64, 48)
      .filter($"n_chunk_tokens" <= 0 || $"n_chunk_tokens" > 64)
      .count()
    assert(bad == 0)
  }

  test("x72: CDC chunks partition the token stream; concatenation round-trips") {
    val docs = graft.core.Tables.load(spark, sf("sf0.001"), "documents")
    val chunks = Chunking.cdcChunks(docs, $"doc_id", $"text", Chunking.CdcDivisor)
    // chunk texts, re-joined in chunk order, reproduce the tokenized doc
    // (order carried in the structs — collect_list alone has no order)
    val rejoined = chunks.groupBy($"_id")
      .agg(array_join(
        transform(array_sort(collect_list(struct($"chunk_id", $"chunk"))),
          x => x.getField("chunk")), " ").as("r"))
    val orig = docs.select($"doc_id".as("_id"),
      array_join(graft.operators.TextAnalysis.wsTokens($"text"), " ").as("o"))
    val diffs = rejoined.join(orig, "_id")
      .filter($"r" =!= $"o").count()
    assert(diffs == 0, "CDC chunks lost or reordered tokens")
    // boundary rule: every chunk's LAST token is a boundary token or the
    // doc end; no interior token is a boundary
    val mean = chunks.agg(avg($"n_chunk_tokens")).head().getDouble(0)
    assert(mean > 2 && mean < 40, s"degenerate chunking: mean=$mean")
  }

  test("x72: CDC re-synchronizes after an insertion (the fixed-stride counterexample)") {
    // one long doc; insert a token near the front; every chunk after the
    // first boundary following the edit must be byte-identical
    val base = (1 to 400).map(i => s"w${i % 83}").mkString(" ")
    val edited = {
      val toks = base.split(" ").toVector
      (toks.take(3) ++ Vector("INSERTED") ++ toks.drop(3)).mkString(" ")
    }
    val two = Seq((1L, base), (2L, edited)).toDF("doc_id", "text")
    val chunks = Chunking.cdcChunks(two, $"doc_id", $"text", Chunking.CdcDivisor)
      .select($"_id", $"chunk_id", $"chunk")
      .as[(Long, Long, String)].collect()
    val c1 = chunks.filter(_._1 == 1L).sortBy(_._2).map(_._3).toVector
    val c2 = chunks.filter(_._1 == 2L).sortBy(_._2).map(_._3).toVector
    // after the (at most one) divergent leading chunk, suffixes agree
    val common = c1.reverse.zip(c2.reverse).takeWhile { case (a, b) => a == b }.length
    assert(common >= c1.length - 2,
      s"CDC failed to resync: only $common of ${c1.length} trailing chunks shared")
    assert(c1.length >= 10, s"vacuous: ${c1.length} chunks")
    // the fixed-stride chunker does NOT resync (negative control): the
    // same edit shifts every subsequent window
    val fixed = Chunking.chunkDocuments(two, $"doc_id", $"text", 16, 16)
      .select($"_id", $"chunk_id", $"chunk")
      .as[(Long, Long, String)].collect()
    val f1 = fixed.filter(_._1 == 1L).sortBy(_._2).map(_._3).toVector
    val f2 = fixed.filter(_._1 == 2L).sortBy(_._2).map(_._3).toVector
    val fixedCommon = f1.reverse.zip(f2.reverse).takeWhile { case (a, b) => a == b }.length
    assert(fixedCommon < common,
      s"negative control failed: fixed stride shared $fixedCommon >= CDC's $common")
  }
}
