package graft.operators

/** DuckDB oracle SQL for the LLM-pipeline extras that are cross-engine
  * exact: integer-valued outputs (counts, ids, ranks, rolling hashes) or
  * rank-only projections whose float similarity gaps were measured to be
  * orders of magnitude above cross-engine noise (see Similarity).
  *
  * Signature-based ops (MinHash/SimHash/sign-LSH) hash with Spark's
  * xxhash64, which DuckDB does not implement — those queries are
  * rows-only for the driver and get semantic coverage in ScalaTest
  * (known near-dup pairs found, ANN recall vs brute force).
  */
object ExtrasOracle {

  /** DuckDB twin of TextAnalysis.detectLang, generated from the SAME
    * profile tables so SQL and Scala cannot drift. Per language:
    * (stopword-token hits + unspaced-script char hits) * 3 + profile-
    * trigram hits; detected = first declared language reaching the max
    * score, 'und' when every score is 0. Token membership w ∈
    * split(lower(text),' ') is equivalent to ' '||lower(text)||' '
    * containing ' '||w||' ' (single-space delimiting on both engines);
    * char/trigram hits are plain substring containment on the UNPADDED
    * lowered text, exactly like SubstringHits. */
  private def langIdSql: String = {
    def hit(needle: String, padded: Boolean): String = {
      val hay = if (padded) "' ' || lower(text) || ' '" else "lower(text)"
      val lit = "'" + needle.replace("'", "''") + "'"
      s"(CASE WHEN contains($hay, $lit) THEN 1 ELSE 0 END)"
    }
    val tris = TextAnalysis.trigramProfiles.toMap
    val scoreCols = TextAnalysis.stopwordProfiles.map { case (lang, words) =>
      val (charWords, tokenWords) = words.partition(w => w.length == 1 && w.head > 127)
      val tokenHits = (tokenWords.map(w => hit(" " + w + " ", padded = true)) ++
        charWords.map(w => hit(w, padded = false))) match {
        case Nil => "0"
        case hs => hs.mkString(" + ")
      }
      val triHits = tris.get(lang).map(_.map(hit(_, padded = false)).mkString(" + ")).getOrElse("0")
      s"($tokenHits) * 3 + ($triHits) AS s_$lang"
    }
    val langs = TextAnalysis.stopwordProfiles.map(_._1)
    val best = langs.map(l => s"s_$l").mkString("greatest(", ", ", ")")
    val argmax = langs.init.map(l => s"WHEN s_$l = best THEN '$l'").mkString("\n         ")
    s"""WITH scored AS (
       |  SELECT lang, ${scoreCols.mkString(",\n    ")}
       |  FROM documents),
       |det AS (
       |  SELECT lang, $best AS best, *
       |  FROM scored),
       |labeled AS (
       |  SELECT lang,
       |    CASE WHEN best <= 0 THEN 'und'
       |         $argmax
       |         ELSE '${langs.last}' END AS detected
       |  FROM det)
       |SELECT lang, detected, COUNT(*) AS n
       |FROM labeled GROUP BY lang, detected
       |ORDER BY lang, detected""".stripMargin
  }

  /** Shared by x01 (raw-text grouping) and x44 (hashed-key grouping):
    * the two Spark plans compute one selection. */
  private val exactDedupSql: String =
    """SELECT MIN(doc_id) AS keep_id, COUNT(*) AS n_copies
      |FROM documents GROUP BY text ORDER BY keep_id""".stripMargin

  /** Shared by x16 (broadcast exact semi-join) and x55 (bloom-prefiltered
    * probe): the two Spark plans compute one contamination report. */
  private val decontaminateSql: String =
    """WITH toks AS (
      |  SELECT doc_id, source, list_filter(string_split(text, ' '), x -> x <> '') AS w
      |  FROM documents),
      |refg AS (
      |  SELECT DISTINCT w[g] || ' ' || w[g+1] || ' ' || w[g+2] || ' ' || w[g+3] AS gram
      |  FROM toks, UNNEST(range(1, greatest(len(w) - 2, 1))) AS t(g)
      |  WHERE source IN ('src0', 'src1')),
      |cand AS (SELECT doc_id, w FROM toks WHERE source NOT IN ('src0', 'src1')),
      |candg AS (
      |  SELECT doc_id, w[g] || ' ' || w[g+1] || ' ' || w[g+2] || ' ' || w[g+3] AS gram
      |  FROM cand, UNNEST(range(1, greatest(len(w) - 2, 1))) AS t(g)),
      |hits AS (
      |  SELECT doc_id, COUNT(*) AS nh FROM candg
      |  WHERE gram IN (SELECT gram FROM refg) GROUP BY 1)
      |SELECT c.doc_id,
      |  CAST(greatest(len(w) - 3, 0) AS BIGINT) AS n_spans,
      |  CAST(coalesce(nh, 0) AS BIGINT) AS n_hit_spans
      |FROM cand c LEFT JOIN hits USING (doc_id)
      |ORDER BY doc_id""".stripMargin

  val sql: Map[String, String] = Map(
    // x147: the Gopher rule battery — all-integer gates, shared
    // constants with TextAnalysis so thresholds cannot drift.
    "x147_gopher_rules" -> gopherSql,
    // x148: Flesch-style readability — each ratio one round-at-6
    // double division (the x134 discipline), ::DOUBLE literals so
    // DuckDB does not fall into decimal arithmetic.
    "x148_readability" -> readabilitySql,
    // x149: distinct 4-grams shared between split pairs — the x19
    // split CASE (shared splitCaseSql) over the x16 span grain.
    "x149_gram_leakage" -> gramLeakageSql,
    // x150: global (n_tokens, doc_id) rank + integer quartile bands.
    "x150_curriculum" -> curriculumSql,
    // x151: x16's hit spans excised token-by-token, md5 of the rebuilt
    // text; DuckDB positions are 1-based, Spark's 0-based — internal
    // only, the emitted image is identical.
    "x151_contam_excise" -> exciseSql,
    // x152: per-doc distinct-gram overlap with each OTHER split — the
    // engine joins on xxhash64 keys, the twin on raw grams (same counts
    // up to hash collision, the x44 equivalence).
    "x152_leak_probe" -> leakProbeSql,
    // x153: DSIR avg log-ratio weights — cross-engine md5 token buckets
    // (bucket identity changes counts, so no engine-local hash here),
    // each ln through the x67 round-at-6 decimal discipline.
    "x153_dsir_weights" -> dsirSql,
    // x163: the fused quality panel — x147/x148/x154/x97 columns from
    // one scan; RAW corpus (no plants), so dup/PII legs exercise their
    // zero paths while gopher/readability carry the live signal.
    "x163_quality_panel" -> qualityPanelSql,
    // x168: the panel rolled up per source — the feed scorecard.
    "x168_source_scorecard" -> sourceScorecardSql,
    // x154: within-doc duplicate-line mass over x139's fixed-width
    // lines, planted by prepending each id%6==0 doc's own first line.
    "x154_line_rep" -> lineRepSql,
    // x155: seed-labeled NB quality classifier — md5 feature buckets
    // (x153's cross-engine discipline), each ln rounded at 6 into
    // DECIMAL, log-odds an exact decimal dot product + prior.
    "x155_nb_quality" -> nbQualitySql,
    // x156: DoReMi exponentiated-gradient domain reweighting — excess
    // cross-entropy under the corpus bucket model, round-at-6 before
    // AND after the exp, exact decimal normalization sum.
    "x156_doremi" -> doremiSql,
    // x157: exact-substring self-dedup — corpus-repeated 4-gram spans
    // cut everywhere but the min-(doc,pos) occurrence; same rewrite
    // tail as x151 (1-based positions internal only).
    "x157_self_excise" -> selfExciseSql,
    // x158: embedding principal axis — exact decimal Gram matrix, the
    // power iteration UNROLLED as CTE stages with the engine's
    // round-at-6 re-synchronization at every step, x45's sequential
    // double fold for the projection.
    "x158_pca_proj" -> pcaProjSql,
    // x159: CCNet perplexity buckets — the x67 LM body verbatim, the
    // window form of the engine's distributed global rank, exact
    // integer band edges (the x150 equivalence).
    "x159_ccnet_buckets" -> ccnetSql,
    // x160: data-budget plan — the x156 core verbatim plus the
    // single-pass epoch-capped allocation arithmetic.
    "x160_data_budget" -> dataBudgetSql,
    // x161: iterated BPE merges — the engine's leftmost-greedy in-row
    // fold re-expressed as run-parity window SQL (same non-overlapping
    // semantics), steps unrolled; chr(1) pair keys match the engine's
    // separator byte so tie-break ordering is identical.
    "x161_bpe_merges" -> bpeMergesSql,
    // x162: top-two PCA by Hotelling deflation — PC1's chain, λ₁ and
    // the deflated Gram re-rounded where the engine rounds, PC2's
    // chain, both projections.
    "x162_pca_two" -> pcaProj2Sql,
    "x08_lang_id" -> langIdSql,
    "x01_dedup_exact" -> exactDedupSql,
    // x44 is the hashed-shuffle-key plan of the SAME selection as x01 —
    // one oracle text, two physical strategies (cf. x26/x37).
    "x44_dedup_hash" -> exactDedupSql,
    // ::DOUBLE[] so DuckDB accumulates the cosine at the SAME precision
    // as Spark's double kernel: membership IS the result here, and a
    // float-precision DuckDB sim could disagree with Spark's double on a
    // pair within ~1e-6 of the threshold (sf0.1 has one 8.6e-6 away).
    // With both engines in double the residual disagreement is ~1e-15;
    // ExtrasSpec asserts every pair clears the threshold by > 1e-9.
    "x45_embed_neardup" ->
      s"""SELECT a.vec_id AS id1, b.vec_id AS id2
         |FROM embeddings a JOIN embeddings b
         |  ON a.label = b.label AND a.vec_id < b.vec_id
         |WHERE list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[])
         |      >= ${graft.operators.Similarity.NearDupThreshold}
         |ORDER BY id1, id2""".stripMargin,

    "x03_ngram_pairs" ->
      """WITH toks AS (
        |  SELECT doc_id, lang, list_filter(string_split(text, ' '), x -> x <> '') AS w
        |  FROM documents),
        |grams AS (
        |  SELECT DISTINCT doc_id, lang, w[g] || ' ' || w[g+1] || ' ' || w[g+2] AS gram
        |  FROM toks, UNNEST(range(1, greatest(len(w) - 1, 1))) AS t(g)),
        |rare AS (SELECT gram FROM grams GROUP BY gram HAVING COUNT(*) <= 20),
        |rg AS (SELECT g.* FROM grams g JOIN rare USING (gram))
        |SELECT a.lang AS lang, a.doc_id AS d1, b.doc_id AS d2, COUNT(*) AS inter
        |FROM rg a JOIN rg b ON a.gram = b.gram AND a.lang = b.lang AND a.doc_id < b.doc_id
        |GROUP BY 1, 2, 3
        |HAVING COUNT(*) >= 2
        |ORDER BY 1, 2, 3""".stripMargin,

    "x46_jaccard_pairs" -> verifiedPairsSql,
    // x169: the bipartite x46 — candidate-vs-reference near-dups with
    // the same planted cross blocks and the same exact-Jaccard accept.
    "x169_cross_probe" -> crossProbeSql,
    // x171: the INCREMENTAL form of x169 — same planted corpus, same
    // accept semantics, so the batch twin is shared verbatim (the
    // probe-vs-index equality is the x106/x91 discipline).
    "x171_cross_probe_incr" -> crossProbeSql,
    // x170: the SEMANTIC tier of the acceptance audit — x92's
    // within-cluster cosine test restricted to cross-side pairs.
    "x170_sem_probe" -> crossSemSql,
    // x178: PSI drift over the frozen codebook's cluster-occupancy
    // bins — the scheduled-rebuild trigger for x175 maintenance.
    "x178_sem_drift" -> semDriftSql,
    // x180: the x170 probe widened to nProbe clusters per candidate.
    "x180_sem_probe_budget" -> crossSemBudgetSql,
    // x174: the three acceptance tiers fused to one verdict table.
    "x174_acceptance" -> acceptanceSql,
    // x176: the tiers at PER-DOCUMENT grain — the live gate's batch face.
    "x176_acceptance_gate" -> acceptanceGateSql,
    // x179: the cross-delivery ledger diff over the x174 report chain.
    "x179_acceptance_ledger" -> acceptanceLedgerSql,
    // x181: the report's tier-attribution breakdown (the "why" table).
    "x181_tier_breakdown" -> acceptanceTierSql,
    "x182_tier_shift" -> acceptanceTierShiftSql,
    "x52_contamination" -> contaminationSql,
    "x47_heavy_hitters" -> heavyHittersSql,

    "x12_repetition" ->
      """WITH toks AS (
        |  SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS w
        |  FROM documents),
        |tok AS (SELECT doc_id, t.term FROM toks, UNNEST(w) AS t(term)),
        |tokc AS (SELECT doc_id, term, COUNT(*) AS c FROM tok GROUP BY 1, 2),
        |tokstats AS (
        |  SELECT doc_id, SUM(c) AS n_tok, COUNT(*) AS n_uniq_tok, MAX(c) AS top_tok_n
        |  FROM tokc GROUP BY 1),
        |grams AS (
        |  SELECT doc_id, w[g] || ' ' || w[g+1] AS term
        |  FROM toks, UNNEST(range(1, greatest(len(w), 1))) AS t(g)),
        |gramc AS (SELECT doc_id, term, COUNT(*) AS c FROM grams GROUP BY 1, 2),
        |gramstats AS (
        |  SELECT doc_id, SUM(c) AS n_2gram, COUNT(*) AS n_uniq_2gram, MAX(c) AS top_2gram_n
        |  FROM gramc GROUP BY 1)
        |SELECT d.doc_id,
        |  CAST(coalesce(n_tok, 0) AS BIGINT) AS n_tok,
        |  CAST(coalesce(n_uniq_tok, 0) AS BIGINT) AS n_uniq_tok,
        |  CAST(coalesce(top_tok_n, 0) AS BIGINT) AS top_tok_n,
        |  CAST(coalesce(n_2gram, 0) AS BIGINT) AS n_2gram,
        |  CAST(coalesce(n_uniq_2gram, 0) AS BIGINT) AS n_uniq_2gram,
        |  CAST(coalesce(top_2gram_n, 0) AS BIGINT) AS top_2gram_n
        |FROM documents d
        |LEFT JOIN tokstats USING (doc_id)
        |LEFT JOIN gramstats USING (doc_id)
        |ORDER BY doc_id""".stripMargin,

    "x13_dup_spans" ->
      """WITH toks AS (
        |  SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS w
        |  FROM documents),
        |grams AS (
        |  SELECT doc_id, w[g] || ' ' || w[g+1] || ' ' || w[g+2] || ' ' || w[g+3] AS gram
        |  FROM toks, UNNEST(range(1, greatest(len(w) - 2, 1))) AS t(g)),
        |dup AS (SELECT gram FROM grams GROUP BY gram HAVING COUNT(DISTINCT doc_id) >= 2),
        |perdoc AS (
        |  SELECT doc_id, COUNT(*) AS nds FROM grams JOIN dup USING (gram) GROUP BY 1)
        |SELECT t.doc_id,
        |  CAST(greatest(len(w) - 3, 0) AS BIGINT) AS n_spans,
        |  CAST(coalesce(nds, 0) AS BIGINT) AS n_dup_spans
        |FROM toks t LEFT JOIN perdoc USING (doc_id)
        |ORDER BY doc_id""".stripMargin,

    "x16_decontaminate" -> decontaminateSql,
    // x55 is the bloom-prefiltered plan of the SAME report as x16 — one
    // oracle text, two physical strategies (cf. x01/x44, x26/x37).
    "x55_bloom_decontaminate" -> decontaminateSql,

    "x18_doc_prep" ->
      """WITH tok AS (
        |  SELECT doc_id, source, text,
        |         len(list_filter(string_split(text, ' '), x -> x <> '')) AS n_tokens
        |  FROM documents),
        |keep AS (SELECT text, MIN(doc_id) AS keep_id FROM documents GROUP BY text),
        |toks AS (
        |  SELECT doc_id, source, list_filter(string_split(text, ' '), x -> x <> '') AS w
        |  FROM documents),
        |refg AS (
        |  SELECT DISTINCT w[g] || ' ' || w[g+1] || ' ' || w[g+2] || ' ' || w[g+3] AS gram
        |  FROM toks, UNNEST(range(1, greatest(len(w) - 2, 1))) AS t(g)
        |  WHERE source IN ('src0', 'src1')),
        |contam AS (
        |  SELECT DISTINCT cg.doc_id
        |  FROM (SELECT doc_id, w[g] || ' ' || w[g+1] || ' ' || w[g+2] || ' ' || w[g+3] AS gram
        |        FROM toks, UNNEST(range(1, greatest(len(w) - 2, 1))) AS t(g)
        |        WHERE source NOT IN ('src0', 'src1')) cg
        |  JOIN refg USING (gram))
        |SELECT t.doc_id,
        |  CAST(n_tokens AS BIGINT) AS n_tokens,
        |  CASE WHEN source IN ('src0', 'src1') THEN 'reference'
        |       WHEN n_tokens < 40 THEN 'too_short'
        |       WHEN t.doc_id <> k.keep_id THEN 'duplicate'
        |       WHEN c.doc_id IS NOT NULL THEN 'contaminated'
        |       ELSE NULL END AS drop_reason
        |FROM tok t
        |LEFT JOIN keep k USING (text)
        |LEFT JOIN contam c ON c.doc_id = t.doc_id
        |ORDER BY t.doc_id""".stripMargin,

    // x14: connected components of the x03 candidate graph. DuckDB's
    // recursive CTE computes the exact transitive closure (UNION dedups,
    // so cycles terminate); min reachable id == hash-min fixpoint label.
    "x14_dup_clusters" ->
      s"""$dupClusterCte
        |SELECT n AS doc_id, CAST(MIN(m) AS BIGINT) AS cluster_id
        |FROM reach GROUP BY n ORDER BY doc_id""".stripMargin,

    // x31: canonical winner per x14 cluster — most ws-tokens, tie lowest
    // id; same clusters CTE so the two oracles cannot drift.
    "x31_canonical" ->
      s"""$dupClusterCte,
        |clusters AS (
        |  SELECT n AS doc_id, CAST(MIN(m) AS BIGINT) AS cluster_id
        |  FROM reach GROUP BY n),
        |scored AS (
        |  SELECT c.cluster_id, c.doc_id,
        |    len(list_filter(string_split(d.text, ' '), x -> x <> '')) AS n_tokens
        |  FROM clusters c JOIN documents d USING (doc_id)),
        |ranked AS (
        |  SELECT cluster_id, doc_id,
        |    row_number() OVER (PARTITION BY cluster_id ORDER BY n_tokens DESC, doc_id) AS rn
        |  FROM scored)
        |SELECT cluster_id, MAX(CASE WHEN rn = 1 THEN doc_id END) AS keep_id,
        |       CAST(COUNT(*) AS BIGINT) AS n_members
        |FROM ranked GROUP BY cluster_id ORDER BY cluster_id""".stripMargin,

    "x05_cosine_knn" ->
      """WITH q AS (SELECT vec_id AS query_id, embedding AS qe FROM embeddings WHERE vec_id < 20),
        |sims AS (
        |  SELECT query_id, vec_id AS neighbor_id, list_cosine_similarity(qe, embedding) AS sim
        |  FROM q, embeddings WHERE vec_id <> query_id),
        |ranked AS (
        |  SELECT query_id, neighbor_id,
        |    CAST(ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY sim DESC, neighbor_id) AS INT) AS "rank"
        |  FROM sims)
        |SELECT query_id, neighbor_id, "rank" FROM ranked
        |WHERE "rank" <= 5 ORDER BY query_id, "rank"""".stripMargin,

    "x07_embed_top1" ->
      """WITH sims AS (
        |  SELECT a.vec_id, b.vec_id AS nid, list_cosine_similarity(a.embedding, b.embedding) AS sim
        |  FROM embeddings a JOIN embeddings b ON a.label = b.label AND a.vec_id <> b.vec_id),
        |ranked AS (
        |  SELECT vec_id, nid, ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY sim DESC, nid) AS rk
        |  FROM sims)
        |SELECT vec_id, nid AS best_id FROM ranked WHERE rk = 1 ORDER BY vec_id""".stripMargin,

    "x09_text_quality" ->
      """SELECT lang, COUNT(*) AS n_docs,
        |  CAST(SUM(len(list_filter(string_split(text, ' '), x -> x <> ''))) AS BIGINT) AS sum_tokens,
        |  CAST(SUM(length(regexp_replace(text, '[^.!?,;:]', '', 'g'))) AS BIGINT) AS sum_punct,
        |  CAST(SUM(length(regexp_replace(text, '[^0-9]', '', 'g'))) AS BIGINT) AS sum_digits,
        |  CAST(SUM(length(regexp_replace(text, ' ', '', 'g'))) AS BIGINT) AS sum_nonspace
        |FROM documents GROUP BY lang ORDER BY lang""".stripMargin,

    "x10_token_count" ->
      """SELECT source, COUNT(*) AS n_docs,
        |  CAST(SUM(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]'))) AS BIGINT) AS sum_bpe_tokens
        |FROM documents GROUP BY source ORDER BY source""".stripMargin,

    "x11_fingerprint" ->
      """SELECT doc_id,
        |  CASE WHEN text IS NULL OR length(text) = 0 THEN CAST(7 AS BIGINT)
        |       ELSE list_reduce(
        |         list_prepend(CAST(7 AS BIGINT), [CAST(ord(x) AS BIGINT) FOR x IN split(text, '')]),
        |         (acc, c) -> (acc * 31 + c) % 2147483647)
        |  END AS fp
        |FROM documents ORDER BY doc_id""".stripMargin,

    "x19_split" -> splitSql,
    "x20_mix" -> mixSql,
    "x22_mix_weighted" -> mixWeightedSql,
    "x23_bm25" -> bm25Sql,
    "x24_sessions" -> sessionSql,
    "x25_fuzzy_join" -> fuzzySql,
    "x26_stratified" -> stratifiedSql,
    "x36_dense_ids" -> denseIdsSql,
    // x37 is the bounded-heap plan of the SAME selection as x26 — the
    // oracle SQL is shared verbatim, which is the point.
    "x37_stratified_heap" -> stratifiedSql,
    "x38_salted_join" -> saltedJoinSql,
    "x39_pagerank" -> pageRankSql,
    "x40_weighted_sample" -> weightedSampleSql,
    "x41_chunks" -> chunkSql,
    "x42_weighted_group" -> weightedGroupSql,
    "x43_top_terms" -> topTermsSql,
    "x48_tfidf" -> tfIdfSql,
    "x50_upsample" -> upsampleSql,
    "x53_quality_deciles" ->
      s"""SELECT doc_id, lang,
         |  CAST(len(list_filter(string_split(text, ' '), x -> x <> '')) AS BIGINT)
         |    AS n_tokens,
         |  ntile(${TextAnalysis.QualityDeciles}) OVER (
         |    PARTITION BY lang
         |    ORDER BY len(list_filter(string_split(text, ' '), x -> x <> '')), doc_id)
         |    AS decile
         |FROM documents
         |ORDER BY doc_id""".stripMargin,
    "x27_scd2" -> scd2Sql,
    "x28_percentiles" -> percentileSql,
    "x56_token_budget" -> tokenBudgetSql,
    "x57_ngram_lm" -> ngramLmSql,
    "x58_winsorize" -> winsorSql,
    "x59_interval_join" -> intervalJoinSql,
    "x60_mad_outliers" -> madOutlierSql,
    "x61_interval_topk" -> intervalTopKSql,
    "x63_oov" -> oovSql,
    "x64_snm_pairs" -> snmSql,
    "x65_data_card" -> dataCardSql,
    "x66_length_hist" -> lengthHistSql,
    "x67_lm_score" -> lmScoreSql,
    "x68_temp_mix" -> temperatureMixSql,
    "x69_split_leakage" -> splitLeakageSql,
    "x70_pmi" -> pmiSql,
    "x71_pit_enrich" -> pitEnrichSql,
    "x72_cdc_chunks" -> cdcSql,
    "x73_centroid_outliers" -> centroidOutlierSql,
    "x77_zonemap" -> zonemapSql,
    "x78_kmeans" -> kmeansSql,
    "x83_ann_exact" -> annExactSql,
    "x87_containment" -> containmentSql,
    "x88_snapshot_diff" -> snapshotDiffSql,
    "x89_boilerplate" -> boilerplateSql,
    "x90_novelty" -> noveltySql,
    "x91_novelty_incr" -> noveltyIncrSql,
    "x92_semdedup" -> semDedupSql,
    "x94_margin" -> marginSql,
    "x95_source_overlap" -> sourceOverlapSql,
    "x96_growth" -> growthSql,

    "x97_pii_audit" -> piiSql,
    // x164: encoding-damage battery over the same deterministic plant.
    "x164_encoding" -> encodingSql,
    // x165: the context-length tradeoff sweep (x144's grid discipline).
    "x165_context_sweep" -> contextSweepSql,
    // x173: the sweep winner fed into x21's packing as its bin budget.
    "x173_pack_winner" -> packWinnerSql,
    // x167: Bradley-Terry — the same planted comparison model, the MM
    // fixed point unrolled as CTE stages with the x158 decimal-resync
    // discipline at every inexact step.
    "x167_bradley_terry" -> bradleyTerrySql,
    // x172: the x167 ladder frozen, each comparison scored against it.
    "x172_bt_upsets" -> btUpsetsSql,
    // x177: reliability diagram + ECE over a planted prediction stream.
    "x177_calibration" -> calibrationSql,
    "x98_source_cap" -> sourceCapSql,
    "x99_annotator" -> annotatorSql,
    "x101_dawid_skene" -> dawidSkeneSql,
    "x102_url_canon" -> urlCanonSql,
    "x103_markup_strip" -> markupSql,
    "x104_url_dedup" -> urlDedupSql,
    "x105_kripp_alpha" -> krippSql,
    "x106_dedup_incr" -> dedupIncrSql,
    "x107_waterfall" -> waterfallSql,
    "x108_script_mix" -> scriptMixSql,
    "x109_bpe_pairs" -> bpePairsSql,
    "x110_pack_audit" -> packAuditSql,
    "x111_decay_pop" -> decayPopSql,
    "x112_zipf_slope" -> zipfSlopeSql,
    "x113_truncation" -> truncationSql,
    "x114_link_graph" -> linkGraphSql,
    "x115_split_balance" -> splitBalanceSql,
    "x116_anchor_text" -> anchorTextSql,
    "x117_conversion_lag" -> conversionLagSql,
    "x118_vocab90" -> vocabCoverageSql,
    "x119_host_reputation" -> hostReputationSql,
    "x120_hard_negatives" -> hardNegativesSql,
    "x121_fertility" -> fertilitySql,
    "x122_cooccur_lift" -> cooccurLiftSql,
    "x123_link_degrees" -> linkDegreesSql,
    "x124_robots_gate" -> robotsGateSql,
    "x125_dialog_audit" -> dialogAuditSql,
    // x146: the same total (ts, event_id) thread order as x125, lag'd
    // role/event/ts, alternating pairs only, floor-epoch gap.
    "x146_sft_pairs" ->
      """WITH ev AS MATERIALIZED (
        |  SELECT user_id AS thread_id, event_type AS role, ts, event_id
        |  FROM events
        |  WHERE user_id IS NOT NULL AND ts IS NOT NULL
        |    AND event_type IS NOT NULL),
        |lagged AS (
        |  SELECT thread_id, role, ts, event_id,
        |    lag(role) OVER w AS prev_role,
        |    lag(event_id) OVER w AS prev_event,
        |    lag(ts) OVER w AS prev_ts,
        |    CAST(row_number() OVER w AS BIGINT) AS turn_idx
        |  FROM ev
        |  WINDOW w AS (PARTITION BY thread_id ORDER BY ts, event_id))
        |SELECT thread_id, turn_idx,
        |  prev_event AS prompt_event, event_id AS response_event,
        |  prev_role AS prompt_role, role AS response_role,
        |  CAST(floor(epoch(ts)) - floor(epoch(prev_ts)) AS BIGINT) AS gap_sec
        |FROM lagged
        |WHERE prev_role IS NOT NULL AND prev_role <> role
        |ORDER BY thread_id, turn_idx""".stripMargin,
    "x126_rate_bursts" -> rateBurstsSql,
    "x127_ks_audit" -> ksAuditSql,
    "x128_psi_drift" -> psiDriftSql,
    "x130_snapshot_psi" -> snapshotPsiSql,
    "x131_skew_profile" -> skewProfileSql,
    "x132_exact_split" -> exactSplitSql,
    // x133: same md5 keying in both engines — the shuffle-key is part
    // of the contract, and DuckDB's md5() agrees byte-for-byte.
    // x135: the x81/x82 entropy discipline over the split x source cells.
    "x135_split_diversity" -> splitDiversitySql,
    // x136: same md5 family keys, same pinned 1/k image.
    "x136_effective_tokens" ->
      """WITH toks AS MATERIALIZED (
        |  SELECT source, md5(text) AS k,
        |    CAST(len(list_filter(string_split(text, ' '), x -> x <> ''))
        |         AS BIGINT) AS n_tokens
        |  FROM documents),
        |fam AS MATERIALIZED (
        |  SELECT k, CAST(COUNT(*) AS BIGINT) AS fam FROM toks GROUP BY k)
        |SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
        |  CAST(SUM(n_tokens) AS BIGINT) AS tokens_raw,
        |  CAST(SUM(n_tokens * CAST(ROUND(1.0 / CAST(fam AS DOUBLE), 6)
        |                           AS DECIMAL(18,6))) AS DOUBLE)
        |    AS tokens_effective
        |FROM toks JOIN fam USING (k)
        |GROUP BY source ORDER BY source""".stripMargin,

    // x137: both leg ranks rebuilt brute-force (distinct-3gram overlap
    // + DOUBLE[]-accumulated cosine rounded at 6), identical RRF term
    // pinning, rank INT like the x05 twin.
    "x137_hybrid_rrf" -> hybridRrfSql,
    // x138: x114's edges + x119's host verdicts as seeds, all-integer
    // symmetrized majority vote.
    "x138_label_prop" -> labelPropSql,
    // x139: the same fixed-width line chunking, corpus line counts,
    // ordered reassembly; md5 of the rebuilt text agrees byte-for-byte.
    "x139_line_dedup" -> lineDedupSql,
    // x141: the same md5(doc:ord:epoch) permutation key, rank per epoch.
    "x141_epoch_order" ->
      s"""WITH e AS (
         |  SELECT doc_id, CAST(t.epoch AS BIGINT) AS epoch,
         |    md5(CAST(doc_id AS VARCHAR) || ':ord:' || CAST(t.epoch AS VARCHAR))
         |      AS k
         |  FROM documents,
         |    UNNEST(range(0, ${Sampling.EpochCount})) AS t(epoch))
         |SELECT epoch, doc_id,
         |  CAST(row_number() OVER (PARTITION BY epoch ORDER BY k, doc_id)
         |       AS BIGINT) AS ord
         |FROM e ORDER BY epoch, ord""".stripMargin,
    // x166: span corruption — stride-aligned cells, the same bucket
    // arithmetic, sentinel ordinals via one per-doc window.
    "x166_span_corrupt" -> spanCorruptSql,
    // x142: the shared bucket arithmetic picks the identical mask
    // positions; masked text re-joined in position order, md5-pinned.
    "x142_mlm_mask" -> mlmMaskSql,
    // x143: x21's bin assignment rolled to pack grain with exclusive
    // prefix-sum offsets; id/offset lists as comma-joined strings.
    "x143_pack_manifest" -> packManifestSql,
    // x145: x114's edges, undirected dedup, oriented wedge closure.
    "x145_triangles" -> triangleSql,
    // x144: x46's vpairs swept over the literal grid with the same
    // integer test inter*100 >= t*uni.
    "x144_threshold_sweep" ->
      s"""WITH $verifiedPairsCte,
         |grid AS (SELECT CAST(t.t AS BIGINT) AS threshold_pct
         |         FROM UNNEST([${Dedup.SweepThresholds.mkString(", ")}]) AS t(t))
         |SELECT threshold_pct,
         |  CAST(SUM(CASE WHEN inter * 100 >= threshold_pct * uni
         |           THEN 1 ELSE 0 END) AS BIGINT) AS n_pairs
         |FROM vpairs CROSS JOIN grid
         |GROUP BY threshold_pct ORDER BY threshold_pct""".stripMargin,

    // x134: same total (value, doc_id) rank order, same closed form;
    // SUM(d*d) accumulates in HUGEINT (exact, like Spark's
    // DECIMAL(38,0)) and is emitted as its correctly-rounded double.
    "x134_spearman" ->
      """WITH v AS MATERIALIZED (
        |  SELECT source, doc_id,
        |    CAST(len(list_filter(string_split(text, ' '), x -> x <> ''))
        |         AS BIGINT) AS len,
        |    CAST(len(regexp_extract_all(text, '[.!?,;:]')) AS BIGINT) AS punct
        |  FROM documents),
        |r AS (
        |  SELECT source,
        |    CAST(row_number() OVER (PARTITION BY source ORDER BY len, doc_id)
        |         AS BIGINT) AS rx,
        |    CAST(row_number() OVER (PARTITION BY source ORDER BY punct, doc_id)
        |         AS BIGINT) AS ry
        |  FROM v)
        |SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
        |  CAST(SUM((rx - ry) * (rx - ry)) AS DOUBLE) AS sum_d2,
        |  ROUND(1.0 - 6.0 * CAST(SUM((rx - ry) * (rx - ry)) AS DOUBLE)
        |    / CAST(CAST(COUNT(*) AS HUGEINT)
        |           * (CAST(COUNT(*) AS HUGEINT) * COUNT(*) - 1) AS DOUBLE),
        |      6) AS rho
        |FROM r GROUP BY source ORDER BY source""".stripMargin,

    "x133_dup_histogram" ->
      """WITH g AS MATERIALIZED (
        |  SELECT md5(text) AS k, CAST(COUNT(*) AS BIGINT) AS group_size
        |  FROM documents GROUP BY 1)
        |SELECT group_size, CAST(COUNT(*) AS BIGINT) AS n_groups,
        |  CAST(group_size * COUNT(*) AS BIGINT) AS n_docs,
        |  CAST((group_size - 1) * COUNT(*) AS BIGINT) AS removable_dups
        |FROM g GROUP BY group_size ORDER BY group_size""".stripMargin,
    "x100_edit_pairs" -> editPairsSql,

    // x93: the k-anonymity audit — one metadata aggregate; the size
    // bucket is x66's integer-exact power-of-two magnitude.
    "x93_kanon" ->
      s"""SELECT lang, source,
         |  CAST(length(bin(n_chars)) AS BIGINT) AS size_bucket,
         |  CAST(COUNT(*) AS BIGINT) AS n_docs,
         |  CAST(CASE WHEN COUNT(*) < ${DocPrep.KAnonK} THEN 1 ELSE 0 END
         |    AS BIGINT) AS at_risk
         |FROM documents
         |GROUP BY 1, 2, 3
         |ORDER BY lang, source, size_bucket""".stripMargin,

    // x84: exact twin of the HLL rollup — COUNT(DISTINCT) at the same
    // grouping sets with the same TOTAL presentation.
    "x84_distinct_exact" ->
      """SELECT CASE WHEN GROUPING(l_returnflag) = 1 THEN 'TOTAL'
        |            ELSE l_returnflag END AS grp,
        |  CAST(COUNT(DISTINCT l_partkey) AS BIGINT) AS n_distinct
        |FROM lineitem
        |GROUP BY ROLLUP(l_returnflag)
        |ORDER BY grp NULLS FIRST""".stripMargin,

    // x85: exact discrete quantiles at the KLL rollup's grouping sets —
    // histogram once, TOTAL derived from the histogram, cumulative
    // counts windowed over the aggregate, value at integer index
    // ceil(p*n) ((n+1)//2 and (19n+19)//20 — no float index math).
    "x85_quantiles_exact" ->
      """WITH hist AS MATERIALIZED (
        |  SELECT l_returnflag AS grp, l_extendedprice AS v, COUNT(*) AS c
        |  FROM lineitem GROUP BY 1, 2),
        |allh AS MATERIALIZED (
        |  SELECT grp, v, c FROM hist
        |  UNION ALL
        |  SELECT 'TOTAL', v, SUM(c) FROM hist GROUP BY 2),
        |cum AS (
        |  SELECT grp, v,
        |    SUM(c) OVER (PARTITION BY grp ORDER BY v) AS cum,
        |    SUM(c) OVER (PARTITION BY grp) AS n
        |  FROM allh)
        |SELECT grp, CAST(MAX(n) AS BIGINT) AS n,
        |  MIN(CASE WHEN cum >= (n + 1) // 2 THEN v END) AS p50,
        |  MIN(CASE WHEN cum >= (19 * n + 19) // 20 THEN v END) AS p95
        |FROM cum GROUP BY grp
        |ORDER BY grp NULLS FIRST""".stripMargin,

    // x86: exact heavy hitters at the frequent-items rollup's grouping
    // sets — true counts, same integer heaviness test (c*share >= n).
    "x86_freq_exact" ->
      s"""WITH toks AS MATERIALIZED (
         |  SELECT lang, list_filter(string_split(text, ' '), x -> x <> '') AS w
         |  FROM documents),
         |big AS MATERIALIZED (
         |  SELECT lang, w[g] || ' ' || w[g+1] AS item
         |  FROM toks, UNNEST(range(1, greatest(len(w), 1))) AS t(g)),
         |counts AS MATERIALIZED (
         |  SELECT lang, item, COUNT(*) AS c FROM big GROUP BY 1, 2),
         |allc AS MATERIALIZED (
         |  SELECT lang AS grp, item, c FROM counts
         |  UNION ALL
         |  SELECT 'TOTAL', item, SUM(c) FROM counts GROUP BY 2),
         |m AS (SELECT grp, item, c, SUM(c) OVER (PARTITION BY grp) AS n FROM allc)
         |SELECT grp, CAST(n AS BIGINT) AS n, item, CAST(c AS BIGINT) AS freq
         |FROM m WHERE c * ${Sketches.FreqShare} >= n
         |ORDER BY grp NULLS FIRST, freq DESC, item""".stripMargin,
    "x79_funnel" -> qualityFunnelSql,
    "x81_token_entropy" -> tokenEntropySql,
    "x82_kl_drift" -> klDriftSql,
    // x80: OLS trend from exact moments — x/y sums are integer/decimal
    // (order-independent); each moment casts to DOUBLE once and the
    // closed forms use the SAME parenthesization as the Spark face.
    "x80_trend" ->
      """WITH e AS (
        |  SELECT event_type,
        |    date_diff('day', (SELECT MIN(CAST(ts AS DATE)) FROM events
        |                      WHERE value IS NOT NULL AND ts IS NOT NULL),
        |              CAST(ts AS DATE)) AS x,
        |    CAST(value AS DECIMAL(18,4)) AS y
        |  FROM events WHERE value IS NOT NULL AND ts IS NOT NULL),
        |m AS (
        |  SELECT event_type, COUNT(*) AS n, SUM(x) AS sx, SUM(x*x) AS sxx,
        |    CAST(SUM(y) AS DOUBLE) AS sy,
        |    CAST(SUM(x*y) AS DOUBLE) AS sxy,
        |    CAST(SUM(y*y) AS DOUBLE) AS syy
        |  FROM e GROUP BY 1)
        |SELECT event_type, CAST(n AS BIGINT) AS n,
        |  round((CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
        |    / nullif(CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
        |             - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE), 0), 6) AS slope,
        |  round((sy * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * sxy)
        |    / nullif(CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
        |             - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE), 0), 6) AS intercept,
        |  round((CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
        |    * (CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
        |    / (nullif(CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
        |              - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE), 0)
        |       * (CAST(n AS DOUBLE) * syy - sy * sy)), 6) AS r2
        |FROM m ORDER BY event_type""".stripMargin,
    // x76: the ground truth IS the check — the unpruned brute-force
    // similarity join; the engine's prefix filter must be lossless.
    "x76_ppjoin" ->
      """WITH toks AS (
        |  SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS w
        |  FROM documents),
        |grams AS MATERIALIZED (
        |  SELECT DISTINCT doc_id, w[g] || ' ' || w[g+1] || ' ' || w[g+2] AS gram
        |  FROM toks, UNNEST(range(1, greatest(len(w) - 1, 1))) AS t(g)),
        |gsz AS MATERIALIZED (SELECT doc_id, COUNT(*) AS n FROM grams GROUP BY doc_id),
        |vint AS (
        |  SELECT g1.doc_id AS d1, g2.doc_id AS d2, COUNT(*) AS inter
        |  FROM grams g1 JOIN grams g2 ON g1.gram = g2.gram AND g1.doc_id < g2.doc_id
        |  GROUP BY 1, 2)
        |SELECT v.d1, v.d2, CAST(v.inter AS BIGINT) AS inter,
        |  CAST(s1.n + s2.n - v.inter AS BIGINT) AS uni
        |FROM vint v JOIN gsz s1 ON s1.doc_id = v.d1 JOIN gsz s2 ON s2.doc_id = v.d2
        |WHERE v.inter * 2 >= s1.n + s2.n - v.inter
        |ORDER BY d1, d2""".stripMargin,
    // x74: CUBE over (lang, source) — doc/token volumes for all four
    // grouping sets in one scan; 'ALL' marks the subtotal rows.
    "x74_cube" ->
      """WITH t AS (
        |  SELECT lang, source,
        |    CAST(len(list_filter(string_split(text, ' '), x -> x <> '')) AS BIGINT) AS nt
        |  FROM documents)
        |SELECT coalesce(lang, 'ALL') AS lang, coalesce(source, 'ALL') AS source,
        |  CAST(COUNT(*) AS BIGINT) AS n_docs,
        |  CAST(SUM(nt) AS BIGINT) AS n_tokens
        |FROM t GROUP BY CUBE(lang, source)
        |ORDER BY lang, source""".stripMargin,
    // x75: the per-user consecutive-event transition matrix with the
    // per-from marginal as a window over the aggregated table.
    "x75_transitions" ->
      """WITH nxt AS (
        |  SELECT event_type AS from_type,
        |    LEAD(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS to_type
        |  FROM events),
        |pc AS (
        |  SELECT from_type, to_type, CAST(COUNT(*) AS BIGINT) AS n
        |  FROM nxt WHERE to_type IS NOT NULL GROUP BY 1, 2)
        |SELECT from_type, to_type, n,
        |  CAST(SUM(n) OVER (PARTITION BY from_type) AS BIGINT) AS n_from
        |-- NULLS FIRST pinned: Spark asc defaults nulls-first, DuckDB
        |-- nulls-last — divergent only if event_type were ever null,
        |-- but the twin should not depend on corpus non-nullness
        |FROM pc ORDER BY from_type NULLS FIRST, to_type NULLS FIRST""".stripMargin,
    // x62: DuckDB's nfc_normalize + RE2 \s twin of the native
    // normalize_text kernel (the kernel collapses exactly RE2's \s
    // class so the two agree byte-for-byte)
    "x62_normalize" ->
      """SELECT doc_id,
        |  trim(regexp_replace(lower(nfc_normalize(text)), '\s+', ' ', 'g')) AS norm_text,
        |  CAST(length(trim(regexp_replace(lower(nfc_normalize(text)), '\s+', ' ', 'g'))) AS BIGINT)
        |    AS n_chars_norm
        |FROM documents ORDER BY doc_id""".stripMargin,
    "x29_pivot" -> pivotSql,
    "x30_unpivot" -> unpivotSql,
    "x32_moving_avg" -> movingAvgSql,
    "x33_anomaly" -> anomalySql,
    "x34_funnel" -> funnelSql,
    "x35_retention" -> retentionSql,

    "x21_pack" ->
      """WITH t AS (
        |  SELECT doc_id,
        |    CAST(len(list_filter(string_split(text, ' '), x -> x <> '')) AS BIGINT) AS n_tokens,
        |    doc_id % 32 AS shard
        |  FROM documents),
        |c AS (
        |  SELECT doc_id, n_tokens, shard,
        |    SUM(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id
        |                        ROWS UNBOUNDED PRECEDING) AS cum
        |  FROM t)
        |SELECT doc_id, n_tokens, shard,
        |  shard * 1099511627776 + CAST(FLOOR((cum - n_tokens) / 2000.0) AS BIGINT) AS pack_id
        |FROM c ORDER BY doc_id""".stripMargin,
  )

  /** x03's candidate-pair graph as a CTE body (toks → … → pairs →
    * symmetrized edges), shared by the closure (x14/x31) and PageRank
    * (x39) oracles so the three cannot drift from the x03 semantics.
    *
    * Every stage is `AS MATERIALIZED`: DuckDB's default is to INLINE a
    * CTE at each reference, and these are referenced multiply — `grams`
    * twice directly, and the whole pipeline once per downstream use.
    * Inlining grows the evaluation tree multiplicatively (the unrolled
    * x39 iterations took it to ~3^6× — measured >10 min at sf0.01 vs
    * 0.9 s materialized, identical rows), so a non-materialized form is
    * not budget-safe for the driver's correctness phase. */
  private def pairsCteBody: String =
    """toks AS MATERIALIZED (
      |  SELECT doc_id, lang, list_filter(string_split(text, ' '), x -> x <> '') AS w
      |  FROM documents),
      |grams AS MATERIALIZED (
      |  SELECT DISTINCT doc_id, lang, w[g] || ' ' || w[g+1] || ' ' || w[g+2] AS gram
      |  FROM toks, UNNEST(range(1, greatest(len(w) - 1, 1))) AS t(g)),
      |rare AS MATERIALIZED (SELECT gram FROM grams GROUP BY gram HAVING COUNT(*) <= 20),
      |rg AS MATERIALIZED (SELECT g.* FROM grams g JOIN rare USING (gram)),
      |pairs AS MATERIALIZED (
      |  SELECT a.doc_id AS d1, b.doc_id AS d2
      |  FROM rg a JOIN rg b ON a.gram = b.gram AND a.lang = b.lang AND a.doc_id < b.doc_id
      |  GROUP BY 1, 2
      |  HAVING COUNT(*) >= 2),
      |edges AS MATERIALIZED (SELECT d1 AS u, d2 AS v FROM pairs UNION ALL SELECT d2, d1 FROM pairs)""".stripMargin

  /** x46: exact-Jaccard verification of [[pairsCteBody]]'s candidates —
    * the intersection is re-counted over ALL grams (candidates only
    * counted rare ones), and the 0.5 threshold test is exact integer
    * arithmetic (inter*2 >= union), so membership cannot flake on float
    * precision. MATERIALIZED for the same budget-safety reason as every
    * other consumer of the shared gram pipeline. */
  /** The accepted near-dup pair set as a CTE chain ending at `vpairs`
    * (d1, d2, inter, uni) — shared by the x46 listing and the x52
    * contamination matrix so the accept semantics cannot drift. */
  private def verifiedPairsCte: String =
    s"""$pairsCteBody,
       |gsz AS MATERIALIZED (SELECT doc_id, COUNT(*) AS n FROM grams GROUP BY doc_id),
       |vint AS MATERIALIZED (
       |  SELECT p.d1, p.d2, COUNT(*) AS inter
       |  FROM pairs p JOIN grams g1 ON g1.doc_id = p.d1
       |               JOIN grams g2 ON g2.doc_id = p.d2 AND g2.gram = g1.gram
       |  GROUP BY 1, 2),
       |vpairs AS MATERIALIZED (
       |  SELECT v.d1, v.d2, v.inter, s1.n + s2.n - v.inter AS uni
       |  FROM vint v JOIN gsz s1 ON s1.doc_id = v.d1 JOIN gsz s2 ON s2.doc_id = v.d2
       |  WHERE v.inter * 2 >= s1.n + s2.n - v.inter)""".stripMargin

  private def verifiedPairsSql: String =
    s"""WITH $verifiedPairsCte
       |SELECT d1, d2, inter, uni FROM vpairs ORDER BY d1, d2""".stripMargin

  /** DuckDB twin of Dedup.crossProbeQuery (x169): the x46 chain over
    * the PLANTED bipartite corpus, pairs kept only when exactly one
    * side is reference, then oriented (cand_id, ref_id). maxDf = 100
    * as in the engine face. */
  private def crossProbeSql: String =
    s"""WITH $crossProbeCtes
       |SELECT CASE WHEN r1 THEN d2 ELSE d1 END AS cand_id,
       |  CASE WHEN r1 THEN d1 ELSE d2 END AS ref_id,
       |  CAST(inter AS BIGINT) AS inter, CAST(uni AS BIGINT) AS uni
       |FROM vpairs
       |ORDER BY cand_id, ref_id""".stripMargin

  /** The planted-bipartite CTE chain x169/x171/x174 share: `base` (the
    * planted corpus with its isref flag) through `vpairs` (accepted
    * cross pairs with exact inter/uni evidence). */
  private def crossProbeCtes: String =
    s"""$plantedGramCtes,
       |rare AS MATERIALIZED (SELECT gram FROM grams GROUP BY gram HAVING COUNT(*) <= 100),
       |rg AS MATERIALIZED (SELECT g.* FROM grams g JOIN rare USING (gram)),
       |pairs AS MATERIALIZED (
       |  SELECT a.doc_id AS d1, b.doc_id AS d2
       |  FROM rg a JOIN rg b ON a.gram = b.gram AND a.lang = b.lang AND a.doc_id < b.doc_id
       |  GROUP BY 1, 2
       |  HAVING COUNT(*) >= 2),
       |xp AS MATERIALIZED (
       |  SELECT p.d1, p.d2, f1.isref AS r1
       |  FROM pairs p JOIN base f1 ON f1.doc_id = p.d1
       |               JOIN base f2 ON f2.doc_id = p.d2
       |  WHERE f1.isref <> f2.isref),
       |vint AS MATERIALIZED (
       |  SELECT p.d1, p.d2, p.r1, COUNT(*) AS inter
       |  FROM xp p JOIN grams g1 ON g1.doc_id = p.d1
       |            JOIN grams g2 ON g2.doc_id = p.d2 AND g2.gram = g1.gram
       |  GROUP BY 1, 2, 3),
       |vpairs AS MATERIALIZED (
       |  SELECT v.d1, v.d2, v.r1, v.inter, s1.n + s2.n - v.inter AS uni
       |  FROM vint v JOIN gsz s1 ON s1.doc_id = v.d1 JOIN gsz s2 ON s2.doc_id = v.d2
       |  WHERE v.inter * 2 >= s1.n + s2.n - v.inter)""".stripMargin

  /** The planted corpus → distinct grams → per-doc sizes prefix the
    * x169/x171/x174 union-df chain and the x176 per-doc chain share. */
  private def plantedGramCtes: String =
    """base AS MATERIALIZED (
      |  SELECT doc_id, source IN ('src0', 'src1') AS isref,
      |    CASE WHEN source NOT IN ('src0', 'src1') AND doc_id % 23 = 0 THEN
      |      'planteddup' || CAST((doc_id // 23) % 3 AS VARCHAR) ||
      |        repeat(' block' || CAST((doc_id // 23) % 3 AS VARCHAR), 25)
      |    WHEN source IN ('src0', 'src1') AND doc_id % 11 = 0 THEN
      |      'planteddup' || CAST((doc_id // 11) % 3 AS VARCHAR) ||
      |        repeat(' block' || CAST((doc_id // 11) % 3 AS VARCHAR), 25)
      |    ELSE text END AS text,
      |    CASE WHEN source NOT IN ('src0', 'src1') AND doc_id % 23 = 0
      |         THEN 'zz' || CAST((doc_id // 23) % 3 AS VARCHAR)
      |    WHEN source IN ('src0', 'src1') AND doc_id % 11 = 0
      |         THEN 'zz' || CAST((doc_id // 11) % 3 AS VARCHAR)
      |    ELSE lang END AS lang
      |  FROM documents),
      |toks AS MATERIALIZED (
      |  SELECT doc_id, lang, list_filter(string_split(text, ' '), x -> x <> '') AS w
      |  FROM base),
      |grams AS MATERIALIZED (
      |  SELECT DISTINCT doc_id, lang, w[g] || ' ' || w[g+1] || ' ' || w[g+2] AS gram
      |  FROM toks, UNNEST(range(1, greatest(len(w) - 1, 1))) AS t(g)),
      |gsz AS MATERIALIZED (SELECT doc_id, COUNT(*) AS n FROM grams GROUP BY doc_id)""".stripMargin

  /** DuckDB twin of Dedup.acceptanceQuery (x174): the x169 chain's
    * per-candidate surface counts, an exact-text tier over the same
    * planted `base`, and the x170 semantic chain with the embedding
    * halves split by the documents' source (vec_id == doc_id) — all
    * left-joined onto the candidate list with the same verdict CASE. */
  private def acceptanceSql: String =
    s"""WITH $crossProbeCtes,
       |surf AS (
       |  SELECT CASE WHEN r1 THEN d2 ELSE d1 END AS cand_id,
       |    CAST(COUNT(*) AS BIGINT) AS n_surface
       |  FROM vpairs GROUP BY 1),
       |$acceptanceCommonCtes
       |$acceptanceFinalSql""".stripMargin

  /** DuckDB twin of Dedup.acceptanceLedgerQuery (x179): the x174
    * report chain verbatim as a CTE, split into even/odd-cand_id
    * "deliveries", then the 3-class verdict histogram diff — counts,
    * deltas, Laplace-smoothed round-6 shares, x82-pinned-ln PSI terms,
    * the exact-decimal PSI sum, and the round-6 threshold verdict. */
  private def acceptanceLedgerSql: String =
    s"""WITH $crossProbeCtes,
       |surf AS (
       |  SELECT CASE WHEN r1 THEN d2 ELSE d1 END AS cand_id,
       |    CAST(COUNT(*) AS BIGINT) AS n_surface
       |  FROM vpairs GROUP BY 1),
       |$acceptanceCommonCtes,
       |rep AS MATERIALIZED (
       |$acceptanceFinalSql),
       |vd AS (SELECT unnest(['admit', 'review', 'reject']) AS verdict),
       |hp AS (SELECT verdict, COUNT(*) AS n FROM rep
       |       WHERE cand_id % 2 = 0 GROUP BY 1),
       |hc AS (SELECT verdict, COUNT(*) AS n FROM rep
       |       WHERE cand_id % 2 <> 0 GROUP BY 1),
       |j AS (
       |  SELECT vd.verdict,
       |    CAST(coalesce(hp.n, 0) AS BIGINT) AS n_prev,
       |    CAST(coalesce(hc.n, 0) AS BIGINT) AS n_curr
       |  FROM vd LEFT JOIN hp ON hp.verdict = vd.verdict
       |          LEFT JOIN hc ON hc.verdict = vd.verdict),
       |tot AS (SELECT SUM(n_prev) AS tp, SUM(n_curr) AS tc FROM j),
       |per AS MATERIALIZED (
       |  SELECT verdict, n_prev, n_curr, n_curr - n_prev AS delta,
       |    round(CAST(n_prev + 1 AS DOUBLE) / CAST(tp + 3 AS DOUBLE), 6)
       |      AS share_prev,
       |    round(CAST(n_curr + 1 AS DOUBLE) / CAST(tc + 3 AS DOUBLE), 6)
       |      AS share_curr
       |  FROM j CROSS JOIN tot),
       |per2 AS MATERIALIZED (
       |  SELECT *, round((share_curr - share_prev)
       |    * round(ln(share_curr / share_prev), 6), 6) AS psi_term
       |  FROM per),
       |t2 AS (
       |  SELECT round(CAST(SUM(CAST(psi_term AS DECIMAL(18,6))) AS DOUBLE),
       |    6) AS psi
       |  FROM per2)
       |SELECT verdict, n_prev, n_curr, delta, share_prev, share_curr,
       |  psi_term, psi,
       |  CAST(CASE WHEN psi >= ${Dedup.AcceptShiftThreshold} THEN 1
       |       ELSE 0 END AS BIGINT) AS shifted
       |FROM per2 CROSS JOIN t2 ORDER BY verdict""".stripMargin

  /** DuckDB twin of Dedup.acceptanceTierQuery (x181): the x174 report
    * chain as a CTE, flags from the tier columns, one group on at most
    * 8 keys, the shared verdict CASE, round-6 shares. */
  private def acceptanceTierSql: String =
    s"""WITH $crossProbeCtes,
       |surf AS (
       |  SELECT CASE WHEN r1 THEN d2 ELSE d1 END AS cand_id,
       |    CAST(COUNT(*) AS BIGINT) AS n_surface
       |  FROM vpairs GROUP BY 1),
       |$acceptanceCommonCtes,
       |rep AS MATERIALIZED (
       |$acceptanceFinalSql),
       |flags AS (
       |  SELECT CASE WHEN exact_ref IS NOT NULL THEN 1 ELSE 0 END AS exact,
       |    CASE WHEN n_surface > 0 THEN 1 ELSE 0 END AS surface,
       |    CASE WHEN n_sem > 0 THEN 1 ELSE 0 END AS sem
       |  FROM rep),
       |g AS MATERIALIZED (
       |  SELECT CAST(exact AS BIGINT) AS exact,
       |    CAST(surface AS BIGINT) AS surface, CAST(sem AS BIGINT) AS sem,
       |    CAST(COUNT(*) AS BIGINT) AS n
       |  FROM flags GROUP BY 1, 2, 3),
       |tot AS (SELECT SUM(n) AS t FROM g)
       |SELECT exact, surface, sem,
       |  CASE WHEN exact = 1 THEN 'reject'
       |       WHEN surface + sem > 0 THEN 'review'
       |       ELSE 'admit' END AS verdict,
       |  n, round(CAST(n AS DOUBLE) / CAST(t AS DOUBLE), 6) AS share
       |FROM g CROSS JOIN tot
       |ORDER BY exact, surface, sem""".stripMargin

  /** DuckDB twin of Dedup.acceptanceTierShiftQuery (x182): the x174
    * report chain as a CTE, the x179 even/odd delivery split, tier
    * flags per side, the FULL 8-combination support, Laplace smoothing
    * over 8 cells, x82-pinned-ln PSI terms, the exact-decimal PSI sum,
    * the shared verdict CASE, and the repeated threshold flag. */
  private def acceptanceTierShiftSql: String =
    s"""WITH $crossProbeCtes,
       |surf AS (
       |  SELECT CASE WHEN r1 THEN d2 ELSE d1 END AS cand_id,
       |    CAST(COUNT(*) AS BIGINT) AS n_surface
       |  FROM vpairs GROUP BY 1),
       |$acceptanceCommonCtes,
       |rep AS MATERIALIZED (
       |$acceptanceFinalSql),
       |flags AS MATERIALIZED (
       |  SELECT cand_id,
       |    CASE WHEN exact_ref IS NOT NULL THEN 1 ELSE 0 END AS exact,
       |    CASE WHEN n_surface > 0 THEN 1 ELSE 0 END AS surface,
       |    CASE WHEN n_sem > 0 THEN 1 ELSE 0 END AS sem
       |  FROM rep),
       |sup AS (
       |  SELECT CAST(e.v AS BIGINT) AS exact, CAST(s.v AS BIGINT) AS surface,
       |    CAST(m.v AS BIGINT) AS sem
       |  FROM (VALUES (0), (1)) e(v), (VALUES (0), (1)) s(v),
       |    (VALUES (0), (1)) m(v)),
       |hp AS (SELECT exact, surface, sem, COUNT(*) AS n FROM flags
       |       WHERE cand_id % 2 = 0 GROUP BY 1, 2, 3),
       |hc AS (SELECT exact, surface, sem, COUNT(*) AS n FROM flags
       |       WHERE cand_id % 2 <> 0 GROUP BY 1, 2, 3),
       |j AS (
       |  SELECT sup.exact, sup.surface, sup.sem,
       |    CAST(coalesce(hp.n, 0) AS BIGINT) AS n_prev,
       |    CAST(coalesce(hc.n, 0) AS BIGINT) AS n_curr
       |  FROM sup
       |  LEFT JOIN hp ON hp.exact = sup.exact AND hp.surface = sup.surface
       |    AND hp.sem = sup.sem
       |  LEFT JOIN hc ON hc.exact = sup.exact AND hc.surface = sup.surface
       |    AND hc.sem = sup.sem),
       |tot AS (SELECT SUM(n_prev) AS tp, SUM(n_curr) AS tc FROM j),
       |per AS MATERIALIZED (
       |  SELECT exact, surface, sem,
       |    CASE WHEN exact = 1 THEN 'reject'
       |         WHEN surface + sem > 0 THEN 'review'
       |         ELSE 'admit' END AS verdict,
       |    n_prev, n_curr, n_curr - n_prev AS delta,
       |    round(CAST(n_prev + 1 AS DOUBLE) / CAST(tp + 8 AS DOUBLE), 6)
       |      AS share_prev,
       |    round(CAST(n_curr + 1 AS DOUBLE) / CAST(tc + 8 AS DOUBLE), 6)
       |      AS share_curr
       |  FROM j CROSS JOIN tot),
       |per2 AS MATERIALIZED (
       |  SELECT *, round((share_curr - share_prev)
       |    * round(ln(share_curr / share_prev), 6), 6) AS psi_term
       |  FROM per),
       |t2 AS (
       |  SELECT round(CAST(SUM(CAST(psi_term AS DECIMAL(18,6))) AS DOUBLE),
       |    6) AS psi
       |  FROM per2)
       |SELECT exact, surface, sem, verdict, n_prev, n_curr, delta,
       |  share_prev, share_curr, psi_term, psi,
       |  CAST(CASE WHEN psi >= ${Dedup.AcceptShiftThreshold} THEN 1
       |       ELSE 0 END AS BIGINT) AS shifted
       |FROM per2 CROSS JOIN t2 ORDER BY exact, surface, sem""".stripMargin

  /** DuckDB twin of Dedup.acceptanceGateQuery (x176): the same exact +
    * semantic tiers, but the surface tier at PER-DOCUMENT grain — the
    * rarity test is frozen-reference df + the arriving doc's own
    * occurrence (df + 1 <= maxDf), pairs mined candidate-gram against
    * reference postings, the same exact-Jaccard accept. */
  private def acceptanceGateSql: String =
    s"""WITH $plantedGramCtes,
       |rgrams AS MATERIALIZED (
       |  SELECT g.* FROM grams g JOIN base b USING (doc_id) WHERE b.isref),
       |cgrams AS MATERIALIZED (
       |  SELECT g.* FROM grams g JOIN base b USING (doc_id) WHERE NOT b.isref),
       |rdf AS MATERIALIZED (SELECT gram, COUNT(*) AS df FROM rgrams GROUP BY gram),
       |grare AS MATERIALIZED (SELECT gram FROM rdf WHERE df + 1 <= 100),
       |gpairs AS MATERIALIZED (
       |  SELECT c.doc_id AS cand_id, r.doc_id AS ref_id
       |  FROM cgrams c JOIN grare USING (gram)
       |  JOIN rgrams r ON r.gram = c.gram AND r.lang = c.lang
       |  GROUP BY 1, 2
       |  HAVING COUNT(*) >= 2),
       |gint AS MATERIALIZED (
       |  SELECT p.cand_id, p.ref_id, COUNT(*) AS inter
       |  FROM gpairs p JOIN grams g1 ON g1.doc_id = p.cand_id
       |  JOIN grams g2 ON g2.doc_id = p.ref_id AND g2.gram = g1.gram
       |  GROUP BY 1, 2),
       |surf AS (
       |  SELECT cand_id, CAST(COUNT(*) AS BIGINT) AS n_surface FROM (
       |    SELECT i.cand_id FROM gint i
       |    JOIN gsz s1 ON s1.doc_id = i.cand_id
       |    JOIN gsz s2 ON s2.doc_id = i.ref_id
       |    WHERE i.inter * 2 >= s1.n + s2.n - i.inter)
       |  GROUP BY 1),
       |$acceptanceCommonCtes
       |$acceptanceFinalSql""".stripMargin

  /** The exact-text and semantic tiers + candidate list x174 and x176
    * share (both twins join their own `surf` to these). */
  private def acceptanceCommonCtes: String = {
    val rounds = (1 to Similarity.KmeansIters).map { i =>
      kmAssignCte(s"a$i", s"c${i - 1}") + ",\n" +
        kmUpdateCte(s"c$i", s"a$i", s"c${i - 1}")
    }.mkString(",\n")
    s"""cands AS MATERIALIZED (SELECT doc_id, text FROM base WHERE NOT isref),
       |ex AS (
       |  SELECT c.doc_id AS cand_id, r.exact_ref FROM cands c
       |  JOIN (SELECT text, MIN(doc_id) AS exact_ref FROM base
       |        WHERE isref GROUP BY text) r ON r.text = c.text),
       |e AS MATERIALIZED (
       |  SELECT em.vec_id, em.embedding::DOUBLE[] AS v
       |  FROM embeddings em JOIN documents d ON d.doc_id = em.vec_id
       |  WHERE em.embedding IS NOT NULL AND d.source IN ('src0', 'src1')),
       |cde AS MATERIALIZED (
       |  SELECT em.vec_id, em.embedding::DOUBLE[] AS v
       |  FROM embeddings em JOIN documents d ON d.doc_id = em.vec_id
       |  WHERE em.embedding IS NOT NULL AND d.source NOT IN ('src0', 'src1')),
       |c0 AS MATERIALIZED (
       |  SELECT vec_id AS cid, v AS cv FROM e
       |  ORDER BY vec_id LIMIT ${Similarity.KmeansK}),
       |$rounds,
       |${kmAssignCte("afin", s"c${Similarity.KmeansIters}")},
       |${kmAssignCte("ca", s"c${Similarity.KmeansIters}", "cde")},
       |semc AS (
       |  SELECT ca.vec_id AS cand_id, CAST(COUNT(*) AS BIGINT) AS n_sem
       |  FROM ca JOIN afin a ON a.cid = ca.cid
       |  JOIN cde ce ON ce.vec_id = ca.vec_id
       |  JOIN e re ON re.vec_id = a.vec_id
       |  WHERE round(list_cosine_similarity(ce.v, re.v), 6)
       |    >= ${Similarity.SemDedupTau}
       |  GROUP BY 1)""".stripMargin
  }

  private def acceptanceFinalSql: String =
    """SELECT c.doc_id AS cand_id,
      |  CAST(ex.exact_ref AS BIGINT) AS exact_ref,
      |  CAST(coalesce(surf.n_surface, 0) AS BIGINT) AS n_surface,
      |  CAST(coalesce(semc.n_sem, 0) AS BIGINT) AS n_sem,
      |  CASE WHEN ex.exact_ref IS NOT NULL THEN 'reject'
      |       WHEN coalesce(surf.n_surface, 0) + coalesce(semc.n_sem, 0) > 0
      |         THEN 'review'
      |       ELSE 'admit' END AS verdict
      |FROM cands c
      |LEFT JOIN ex ON ex.cand_id = c.doc_id
      |LEFT JOIN surf ON surf.cand_id = c.doc_id
      |LEFT JOIN semc ON semc.cand_id = c.doc_id
      |ORDER BY cand_id""".stripMargin

  /** x87: containment over the SAME candidate graph — the intersection
    * recount of x46 but accepted on inter·den ≥ min(n1,n2)·num (the
    * asymmetric subset-duplication test). */
  private def containmentSql: String =
    s"""WITH $pairsCteBody,
       |gsz AS MATERIALIZED (SELECT doc_id, COUNT(*) AS n FROM grams GROUP BY doc_id),
       |cint AS MATERIALIZED (
       |  SELECT p.d1, p.d2, COUNT(*) AS inter
       |  FROM pairs p JOIN grams g1 ON g1.doc_id = p.d1
       |               JOIN grams g2 ON g2.doc_id = p.d2 AND g2.gram = g1.gram
       |  GROUP BY 1, 2)
       |SELECT c.d1, c.d2, c.inter, s1.n AS n1, s2.n AS n2
       |FROM cint c JOIN gsz s1 ON s1.doc_id = c.d1
       |            JOIN gsz s2 ON s2.doc_id = c.d2
       |WHERE c.inter * ${Dedup.ContainDen} >= least(s1.n, s2.n) * ${Dedup.ContainNum}
       |ORDER BY d1, d2""".stripMargin

  /** x88: the snapshot-diff twin — rebuilds the same two deterministic
    * snapshots (mod-17/19 membership, mod-23 last-token edit) and
    * full-outer-diffs them per source. */
  private def snapshotDiffSql: String =
    """WITH w AS MATERIALIZED (
      |  SELECT doc_id, source, text,
      |    list_filter(string_split(text, ' '), x -> x <> '') AS w
      |  FROM documents),
      |o AS MATERIALIZED (
      |  SELECT doc_id, source,
      |    CASE WHEN doc_id % 23 = 0
      |         THEN array_to_string(w[1:len(w)-1], ' ')
      |         ELSE text END AS text
      |  FROM w WHERE doc_id % 17 <> 0),
      |n AS MATERIALIZED (
      |  SELECT doc_id, source, text FROM w WHERE doc_id % 19 <> 0)
      |SELECT coalesce(n.source, o.source) AS source,
      |  CAST(SUM(CASE WHEN o.doc_id IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_added,
      |  CAST(SUM(CASE WHEN n.doc_id IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_removed,
      |  CAST(SUM(CASE WHEN o.doc_id IS NOT NULL AND n.doc_id IS NOT NULL
      |                 AND o.text <> n.text THEN 1 ELSE 0 END) AS BIGINT) AS n_changed,
      |  CAST(SUM(CASE WHEN o.doc_id IS NOT NULL AND n.doc_id IS NOT NULL
      |                 AND o.text = n.text THEN 1 ELSE 0 END) AS BIGINT) AS n_unchanged
      |FROM o FULL OUTER JOIN n ON o.doc_id = n.doc_id
      |GROUP BY 1 ORDER BY source NULLS FIRST""".stripMargin

  /** x89: per-doc boilerplate share — positional trigrams against the
    * common-gram set cut at df·share ≥ n_docs. */
  private def boilerplateSql: String =
    s"""WITH toks AS MATERIALIZED (
       |  SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS w
       |  FROM documents),
       |pos AS MATERIALIZED (
       |  SELECT doc_id, w[g] || ' ' || w[g+1] || ' ' || w[g+2] AS gram
       |  FROM toks, UNNEST(range(1, greatest(len(w) - 1, 1))) AS t(g)),
       |df AS MATERIALIZED (
       |  SELECT gram, COUNT(*) AS df
       |  FROM (SELECT DISTINCT doc_id, gram FROM pos) GROUP BY gram),
       |nd AS (SELECT COUNT(*) AS n_docs FROM documents),
       |common AS MATERIALIZED (
       |  SELECT gram FROM df, nd WHERE df * ${TextAnalysis.BoilerDocShare} >= n_docs),
       |per AS (
       |  SELECT p.doc_id, COUNT(*) AS n_grams,
       |    CAST(SUM(CASE WHEN c.gram IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_boiler
       |  FROM pos p LEFT JOIN common c ON c.gram = p.gram
       |  GROUP BY 1)
       |SELECT d.doc_id, CAST(coalesce(n_grams, 0) AS BIGINT) AS n_grams,
       |  CAST(coalesce(n_boiler, 0) AS BIGINT) AS n_boiler,
       |  CASE WHEN n_grams > 0 THEN CAST(n_boiler AS DOUBLE) / n_grams END AS boiler_share
       |FROM documents d LEFT JOIN per USING (doc_id)
       |ORDER BY d.doc_id""".stripMargin

  /** x91: novelty of the arriving batch (doc_id ≥ split) against the
    * corpus-so-far's distinct gram set (doc_id < split) — the
    * incremental-index face of x90. */
  private def noveltyIncrSql: String =
    s"""WITH toks AS MATERIALIZED (
       |  SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS w
       |  FROM documents),
       |dg AS MATERIALIZED (
       |  SELECT DISTINCT doc_id, w[g] || ' ' || w[g+1] || ' ' || w[g+2] AS gram
       |  FROM toks, UNNEST(range(1, greatest(len(w) - 1, 1))) AS t(g)),
       |idx AS MATERIALIZED (
       |  SELECT DISTINCT gram FROM dg
       |  WHERE doc_id < ${TextAnalysis.NoveltySplitId}),
       |per AS (
       |  SELECT dg.doc_id, COUNT(*) AS n_grams,
       |    CAST(SUM(CASE WHEN i.gram IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_unseen
       |  FROM dg LEFT JOIN idx i USING (gram)
       |  WHERE dg.doc_id >= ${TextAnalysis.NoveltySplitId}
       |  GROUP BY 1)
       |SELECT d.doc_id, CAST(coalesce(n_grams, 0) AS BIGINT) AS n_grams,
       |  CAST(coalesce(n_unseen, 0) AS BIGINT) AS n_unseen,
       |  CASE WHEN n_grams > 0 THEN CAST(n_unseen AS DOUBLE) / n_grams END AS novelty
       |FROM (SELECT doc_id FROM documents
       |      WHERE doc_id >= ${TextAnalysis.NoveltySplitId}) d
       |LEFT JOIN per USING (doc_id)
       |ORDER BY d.doc_id""".stripMargin

  /** x90: per-doc gram novelty — first-seen owner per DISTINCT gram is
    * min(doc_id); novelty is the share a doc owns. */
  private def noveltySql: String =
    """WITH toks AS MATERIALIZED (
      |  SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS w
      |  FROM documents),
      |dg AS MATERIALIZED (
      |  SELECT DISTINCT doc_id, w[g] || ' ' || w[g+1] || ' ' || w[g+2] AS gram
      |  FROM toks, UNNEST(range(1, greatest(len(w) - 1, 1))) AS t(g)),
      |fs AS MATERIALIZED (SELECT gram, MIN(doc_id) AS first_doc FROM dg GROUP BY gram),
      |per AS (
      |  SELECT dg.doc_id, COUNT(*) AS n_grams,
      |    CAST(SUM(CASE WHEN fs.first_doc = dg.doc_id THEN 1 ELSE 0 END) AS BIGINT) AS n_new
      |  FROM dg JOIN fs USING (gram) GROUP BY 1)
      |SELECT d.doc_id, CAST(coalesce(n_grams, 0) AS BIGINT) AS n_grams,
      |  CAST(coalesce(n_new, 0) AS BIGINT) AS n_new,
      |  CASE WHEN n_grams > 0 THEN CAST(n_new AS DOUBLE) / n_grams END AS novelty
      |FROM documents d LEFT JOIN per USING (doc_id)
      |ORDER BY d.doc_id""".stripMargin

  /** x52: the cross-source contamination matrix over the SAME accepted
    * pair set (source pair normalized so (a,b) and (b,a) share a cell). */
  private def contaminationSql: String =
    s"""WITH $verifiedPairsCte
       |SELECT least(a.source, b.source) AS source_a,
       |       greatest(a.source, b.source) AS source_b,
       |       COUNT(*) AS n_pairs
       |FROM vpairs p JOIN documents a ON a.doc_id = p.d1
       |              JOIN documents b ON b.doc_id = p.d2
       |GROUP BY 1, 2
       |ORDER BY source_a, source_b""".stripMargin

  /** x47: the plain one-aggregate twin of the Misra-Gries two-pass heavy
    * hitters — same selection, share constant taken from the engine face
    * so the two cannot drift. */
  private def heavyHittersSql: String =
    s"""WITH toks AS MATERIALIZED (
       |  SELECT list_filter(string_split(text, ' '), x -> x <> '') AS w FROM documents),
       |big AS MATERIALIZED (
       |  SELECT w[g] || ' ' || w[g+1] AS bigram
       |  FROM toks, UNNEST(range(1, greatest(len(w), 1))) AS t(g)),
       |tot AS (SELECT COUNT(*) AS n FROM big)
       |SELECT bigram, COUNT(*) AS freq
       |FROM big, tot
       |GROUP BY bigram, tot.n
       |HAVING COUNT(*) * ${TextAnalysis.HeavyShare} >= tot.n
       |ORDER BY freq DESC, bigram""".stripMargin

  /** Shared clusters CTE (x14 + x31): [[pairsCteBody]]'s candidate graph,
    * then the exact transitive closure; ends at the `reach` relation so
    * callers append either the label projection (x14) or the winner
    * selection (x31). */
  private def dupClusterCte: String =
    s"""WITH RECURSIVE $pairsCteBody,
      |reach(n, m) AS (
      |  SELECT doc_id, doc_id FROM documents
      |  UNION
      |  SELECT r.n, e.v FROM reach r JOIN edges e ON e.u = r.m)""".stripMargin

  /** DuckDB face of [[Sampling.hashBucket]]. The hex-prefix-to-int read
    * matches Spark's conv(substring(md5,1,8),16,10) bit-for-bit. */
  private def bucketSql(keySql: String, salt: String): String =
    s"('0x' || substr(md5($keySql || ':$salt'), 1, 8))::BIGINT"

  /** DuckDB twin of Similarity.centroidOutlierQuery (x73): identical
    * per-component DECIMAL(18,4) sums (order-independent centroid),
    * list built in component order, list_cosine_similarity over
    * DOUBLE[] (same sequential double arithmetic class as x45), cosine
    * through the 6-decimal rounding discipline before the rank.
    *
    * The component cast goes FLOAT → DOUBLE → DECIMAL explicitly:
    * DuckDB's direct FLOAT→DECIMAL rounds the float's shortest decimal
    * REPRESENTATION (half-even on a manufactured tie — measured:
    * -0.30825001f → -0.3082), while Spark rounds the exact widened
    * value (→ -0.3083). The double hop makes both engines round the
    * same exact value, where the no-ties argument of
    * [[graft.core.Determinism]] applies. */
  private def centroidOutlierSql: String =
    s"""WITH comp AS (
       |  SELECT label, p AS pos,
       |    CAST(SUM(CAST(CAST(embedding[p] AS DOUBLE) AS DECIMAL(18,4))) AS DOUBLE) AS c
       |  FROM embeddings, UNNEST(range(1, len(embedding) + 1)) AS t(p)
       |  GROUP BY 1, 2),
       |cent AS (
       |  SELECT label, list(c ORDER BY pos) AS centroid FROM comp GROUP BY label),
       |scored AS (
       |  SELECT e.label, e.vec_id,
       |    CAST(CAST(round(
       |      list_cosine_similarity(e.embedding::DOUBLE[], c.centroid), 6)
       |      AS DECIMAL(18,6)) AS DOUBLE) AS cos_c
       |  FROM embeddings e JOIN cent c USING (label)),
       |ranked AS (
       |  SELECT label, vec_id, cos_c,
       |    ROW_NUMBER() OVER (PARTITION BY label ORDER BY cos_c, vec_id) AS rank
       |  FROM scored)
       |SELECT label, vec_id, cos_c, CAST(rank AS INT) AS rank
       |FROM ranked WHERE rank <= ${Similarity.CentroidOutlierK}
       |ORDER BY label, rank""".stripMargin

  /** DuckDB twin of Chunking.cdcQuery (x72): identical md5 token
    * buckets, identical boundary rule, chunk text re-joined in position
    * order. */
  private def cdcSql: String =
    s"""WITH toks AS (
       |  SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS w
       |  FROM documents),
       |t AS (
       |  SELECT doc_id, g AS pos, w[g] AS tok
       |  FROM toks, UNNEST(range(1, len(w) + 1)) AS u(g)),
       |b AS (
       |  SELECT doc_id, pos, tok,
       |    CASE WHEN ${bucketSql("tok", "cdc")} % ${Chunking.CdcDivisor} = 0
       |         THEN 1 ELSE 0 END AS bd
       |  FROM t),
       |c AS (
       |  SELECT doc_id, pos, tok,
       |    COALESCE(SUM(bd) OVER (PARTITION BY doc_id ORDER BY pos
       |             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS chunk_id
       |  FROM b)
       |SELECT doc_id, CAST(chunk_id AS BIGINT) AS chunk_id,
       |  CAST(COUNT(*) AS BIGINT) AS n_chunk_tokens,
       |  string_agg(tok, ' ' ORDER BY pos) AS chunk
       |FROM c GROUP BY doc_id, chunk_id
       |ORDER BY doc_id, chunk_id""".stripMargin

  /** The x19 split assignment as a CASE expression over `keySql` —
    * generated from the SAME fraction table and threshold arithmetic
    * (cum * 2^32 computed in this JVM, emitted as an exact double
    * literal), shared by the x19 listing and the x69 leakage audit so
    * the two cannot drift. */
  private def splitCaseSql(keySql: String): String = {
    val bucket = bucketSql(s"$keySql::VARCHAR", "graft")
    val whens = Sampling.splitCums.map { case (name, cum) =>
      s"WHEN $bucket < ${cum * Sampling.BucketSpace} THEN '$name'"
    }.mkString("\n       ")
    s"""CASE WHEN $keySql IS NULL THEN NULL
       |       $whens
       |       ELSE '${Sampling.splitFractions.last._1}' END""".stripMargin
  }

  /** DuckDB twin of Sampling.splitQuery. */
  private def splitSql: String =
    s"""SELECT doc_id,
       |  ${splitCaseSql("doc_id")} AS split
       |FROM documents
       |ORDER BY doc_id""".stripMargin

  /** DuckDB twin of Sampling.splitLeakageQuery (x69): x46's accepted
    * near-dup pair set (the SHARED verifiedPairsCte, so the accept
    * semantics cannot drift) × the SAME x19 split CASE applied to each
    * pair's own ids. */
  private def splitLeakageSql: String =
    s"""WITH $verifiedPairsCte,
       |sp AS (
       |  SELECT ${splitCaseSql("d1")} AS s1,
       |         ${splitCaseSql("d2")} AS s2
       |  FROM vpairs)
       |SELECT least(s1, s2) AS split_a, greatest(s1, s2) AS split_b,
       |       CAST(COUNT(*) AS BIGINT) AS n_pairs
       |FROM sp WHERE s1 <> s2
       |GROUP BY 1, 2
       |ORDER BY split_a, split_b""".stripMargin

  /** DuckDB twin of TextAnalysis.dataCardQuery (x65): same rollup, same
    * md5 text keys; every SUM/COUNT image cast off HUGEINT (the gate's
    * hash-unsafe class). */
  private def dataCardSql: String =
    """WITH t AS (
      |  SELECT source, lang, md5(text) AS tk,
      |    CAST(len(list_filter(string_split(text, ' '), x -> x <> '')) AS BIGINT) AS nt
      |  FROM documents)
      |SELECT coalesce(source, 'TOTAL') AS source,
      |  CAST(COUNT(*) AS BIGINT) AS n_docs,
      |  CAST(SUM(nt) AS BIGINT) AS n_tokens,
      |  CAST(COUNT(DISTINCT lang) AS BIGINT) AS n_langs,
      |  CAST(COUNT(DISTINCT tk) AS BIGINT) AS n_uniq_texts,
      |  MIN(nt) AS min_tokens, MAX(nt) AS max_tokens,
      |  CAST(COUNT(*) - COUNT(DISTINCT tk) AS BIGINT) AS n_dup_docs
      |FROM t GROUP BY ROLLUP(source)
      |ORDER BY source""".stripMargin

  /** DuckDB twin of Sampling.lengthHistQuery (x66): the binary-string
    * length IS floor(log2)+1 — integer-exact, no libm log2 at a
    * power-of-two boundary. */
  private def lengthHistSql: String =
    """WITH t AS (
      |  SELECT source,
      |    CAST(len(list_filter(string_split(text, ' '), x -> x <> '')) AS BIGINT) AS nt
      |  FROM documents)
      |SELECT source, CAST(length(bin(nt)) AS INTEGER) AS bucket,
      |  CAST(COUNT(*) AS BIGINT) AS n_docs,
      |  CAST(SUM(nt) AS BIGINT) AS sum_tokens,
      |  MIN(nt) AS min_tokens, MAX(nt) AS max_tokens
      |FROM t GROUP BY 1, 2
      |-- NULLS FIRST pinned to match Spark's asc default (safe even if
      |-- source were ever null; bucket is non-null by construction)
      |ORDER BY source NULLS FIRST, bucket""".stripMargin

  /** DuckDB twin of Sampling.temperatureMixQuery (x68): same counts,
    * same α = 0.5 arithmetic — one IEEE division and one sqrt, both
    * correctly-rounded, so the keep thresholds are bit-identical. */
  private def temperatureMixSql: String =
    s"""WITH c AS (SELECT source, COUNT(*) AS n FROM documents GROUP BY source),
       |m AS (SELECT MIN(n) AS n_min FROM c),
       |r AS (SELECT source, sqrt(CAST(n_min AS DOUBLE) / n) AS rate
       |      FROM c CROSS JOIN m)
       |SELECT d.doc_id, d.source
       |FROM documents d JOIN r USING (source)
       |WHERE ${bucketSql("d.doc_id::VARCHAR", "temp")} < rate * ${Sampling.BucketSpace}
       |ORDER BY d.doc_id""".stripMargin

  /** DuckDB twin of TextAnalysis.lmScoreQuery (x67): identical add-one
    * bigram LM, each ln through the 6-decimal rounding discipline, the
    * per-doc mean an exact decimal dot-product over one double division.
    * MATERIALIZED per the budget discipline (toks/docbg/corpus are each
    * referenced more than once). */
  private def lmScoreSql: String =
    """WITH toks AS MATERIALIZED (
      |  SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS w
      |  FROM documents),
      |bg AS MATERIALIZED (
      |  SELECT doc_id, w[g] AS w1, w[g+1] AS w2
      |  FROM toks, UNNEST(range(1, greatest(len(w), 1))) AS t(g)),
      |docbg AS MATERIALIZED (
      |  SELECT doc_id, w1, w2, CAST(COUNT(*) AS BIGINT) AS dc
      |  FROM bg GROUP BY 1, 2, 3),
      |corpus AS MATERIALIZED (
      |  SELECT w1, w2, CAST(SUM(dc) AS BIGINT) AS c12 FROM docbg GROUP BY 1, 2),
      |ctx AS MATERIALIZED (
      |  SELECT w1, CAST(SUM(c12) AS BIGINT) AS c1 FROM corpus GROUP BY 1),
      |v AS (SELECT COUNT(DISTINCT t.term) AS v
      |      FROM toks, UNNEST(w) AS t(term)),
      |scored AS (
      |  SELECT doc_id, dc,
      |    CAST(round(ln(CAST(c12 + 1 AS DOUBLE) / CAST(c1 + v AS DOUBLE)), 6)
      |         AS DECIMAL(18,6)) AS lp
      |  FROM docbg JOIN corpus USING (w1, w2) JOIN ctx USING (w1) CROSS JOIN v),
      |per AS (
      |  SELECT doc_id, CAST(SUM(dc) AS BIGINT) AS n_bigrams,
      |    CAST(SUM(dc * lp) AS DOUBLE) / SUM(dc) AS avg_logp
      |  FROM scored GROUP BY 1)
      |SELECT d.doc_id,
      |  CAST(coalesce(n_bigrams, 0) AS BIGINT) AS n_bigrams, avg_logp
      |FROM documents d LEFT JOIN per USING (doc_id)
      |ORDER BY d.doc_id""".stripMargin

  /** DuckDB twin of Sampling.ccnetBucketsQuery (x159): the x67 LM
    * pipeline verbatim, then the window form of the engine's
    * distributed (avg_logp, doc_id) rank over the SCORED population
    * and integer band edges — x150's strategy equivalence. */
  private def ccnetSql: String = {
    val b = Sampling.CcnetBuckets
    s"""WITH toks AS MATERIALIZED (
       |  SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS w
       |  FROM documents),
       |bg AS MATERIALIZED (
       |  SELECT doc_id, w[g] AS w1, w[g+1] AS w2
       |  FROM toks, UNNEST(range(1, greatest(len(w), 1))) AS t(g)),
       |docbg AS MATERIALIZED (
       |  SELECT doc_id, w1, w2, CAST(COUNT(*) AS BIGINT) AS dc
       |  FROM bg GROUP BY 1, 2, 3),
       |corpus AS MATERIALIZED (
       |  SELECT w1, w2, CAST(SUM(dc) AS BIGINT) AS c12 FROM docbg GROUP BY 1, 2),
       |ctx AS MATERIALIZED (
       |  SELECT w1, CAST(SUM(c12) AS BIGINT) AS c1 FROM corpus GROUP BY 1),
       |v AS (SELECT COUNT(DISTINCT t.term) AS v
       |      FROM toks, UNNEST(w) AS t(term)),
       |scored AS (
       |  SELECT doc_id, dc,
       |    CAST(round(ln(CAST(c12 + 1 AS DOUBLE) / CAST(c1 + v AS DOUBLE)), 6)
       |         AS DECIMAL(18,6)) AS lp
       |  FROM docbg JOIN corpus USING (w1, w2) JOIN ctx USING (w1) CROSS JOIN v),
       |per AS MATERIALIZED (
       |  SELECT doc_id, CAST(SUM(dc) AS BIGINT) AS n_bigrams,
       |    CAST(SUM(dc * lp) AS DOUBLE) / SUM(dc) AS avg_logp
       |  FROM scored GROUP BY 1),
       |ranked AS (
       |  SELECT doc_id,
       |    CAST(row_number() OVER (ORDER BY avg_logp, doc_id) AS BIGINT)
       |      AS "rank",
       |    CAST(COUNT(*) OVER () AS BIGINT) AS n
       |  FROM per WHERE avg_logp IS NOT NULL)
       |SELECT d.doc_id,
       |  CAST(coalesce(p.n_bigrams, 0) AS BIGINT) AS n_bigrams,
       |  p.avg_logp, r."rank",
       |  CAST(($b * (r."rank" - 1)) // r.n AS BIGINT) AS bucket
       |FROM documents d
       |LEFT JOIN per p USING (doc_id)
       |LEFT JOIN ranked r ON d.doc_id = r.doc_id
       |ORDER BY d.doc_id""".stripMargin
  }

  /** DuckDB twin of TextAnalysis.pmiQuery (x70): exact integer marginal
    * window sums; the float image is the SAME expression shape on both
    * engines — (c12/c1) * (t/c2), each step correctly-rounded — then
    * the 6-decimal ln discipline. */
  private def pmiSql: String =
    s"""WITH toks AS MATERIALIZED (
       |  SELECT list_filter(string_split(text, ' '), x -> x <> '') AS w
       |  FROM documents),
       |bg AS MATERIALIZED (
       |  SELECT w[g] AS w1, w[g+1] AS w2
       |  FROM toks, UNNEST(range(1, greatest(len(w), 1))) AS t(g)),
       |pc AS MATERIALIZED (
       |  SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS c12 FROM bg GROUP BY 1, 2),
       |tot AS (SELECT CAST(SUM(c12) AS BIGINT) AS t FROM pc),
       |marg AS (
       |  SELECT w1, w2, c12,
       |    CAST(SUM(c12) OVER (PARTITION BY w1) AS BIGINT) AS c1,
       |    CAST(SUM(c12) OVER (PARTITION BY w2) AS BIGINT) AS c2
       |  FROM pc)
       |SELECT w1, w2, c12,
       |  CAST(CAST(round(ln((CAST(c12 AS DOUBLE) / c1) * (CAST(t AS DOUBLE) / c2)), 6)
       |            AS DECIMAL(18,6)) AS DOUBLE) AS pmi
       |FROM marg CROSS JOIN tot
       |WHERE c12 >= ${TextAnalysis.PmiMinCount}
       |ORDER BY pmi DESC, w1, w2
       |LIMIT ${TextAnalysis.PmiTopN}""".stripMargin

  /** DuckDB twin of Sampling.mixQuery, rates from the SAME map. */
  private def mixSql: String = {
    val rates = Sampling.mixRates.toSeq.sortBy(_._1)
      .map { case (src, r) => s"WHEN '$src' THEN $r" }.mkString(" ")
    s"""SELECT doc_id, source FROM documents
       |WHERE ${bucketSql("doc_id::VARCHAR", "mix")}
       |      < (CASE source $rates ELSE 1.0 END) * ${Sampling.BucketSpace}
       |ORDER BY doc_id""".stripMargin
  }

  /** DuckDB twin of Sampling.upsampleQuery (x50), weights from the SAME
    * map, CAST AS DOUBLE so both engines compute the identical IEEE
    * fraction (DuckDB would otherwise read 1.7 as DECIMAL; and its
    * FLOOR(double) is double, matching Spark's w - floor(w) bitwise). */
  private def upsampleSql: String = {
    val whens = Sampling.epochWeights.toSeq.sortBy(_._1)
      .map { case (src, r) => s"WHEN '$src' THEN CAST($r AS DOUBLE)" }
      .mkString(" ")
    s"""WITH w AS (
       |  SELECT doc_id, source,
       |    CASE source $whens ELSE CAST(1.0 AS DOUBLE) END AS ew
       |  FROM documents),
       |c AS (
       |  SELECT doc_id, source,
       |    CAST(FLOOR(ew) AS BIGINT) +
       |    CASE WHEN ${bucketSql("doc_id::VARCHAR", "epoch")}
       |              < (ew - FLOOR(ew)) * ${Sampling.BucketSpace}
       |         THEN 1 ELSE 0 END AS n
       |  FROM w)
       |SELECT doc_id, source, unnest(range(n)) AS copy
       |FROM c WHERE n > 0
       |ORDER BY doc_id, copy""".stripMargin
  }

  /** DuckDB twin of TextSearch.bm25Query, generated from the SAME query
    * set and scoring constants (interpolated as this JVM's shortest
    * round-trip double literals, CAST AS DOUBLE so DuckDB cannot slip
    * into exact-decimal arithmetic Spark doesn't do). Contributions are
    * rounded to 6 decimals and decimal-summed — order-independent; see
    * TextSearch for the ln-ulp analysis. */
  private def bm25Sql: String = {
    val qvals = TextSearch.demoQueries.flatMap { case (qid, text) =>
      text.split(" ").filter(_.nonEmpty).distinct.map(t => s"($qid, '$t')")
    }.mkString(", ")
    val k1 = TextSearch.DefaultK1
    val b = TextSearch.DefaultB
    def d(x: Double) = s"CAST($x AS DOUBLE)"
    s"""WITH q(query_id, term) AS (VALUES $qvals),
       |dl AS (
       |  SELECT doc_id, len(list_filter(string_split(text, ' '), x -> x <> '')) AS dl
       |  FROM documents),
       |stats AS (
       |  SELECT COUNT(*) AS n_docs, CAST(SUM(dl) AS DOUBLE) / COUNT(*) AS avgdl
       |  FROM dl),
       |tf AS (
       |  SELECT doc_id, term, COUNT(*) AS tf
       |  FROM (SELECT doc_id,
       |          unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS term
       |        FROM documents)
       |  WHERE term IN (SELECT term FROM q)
       |  GROUP BY doc_id, term),
       |df AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY term),
       |contrib AS (
       |  SELECT q.query_id, tf.doc_id,
       |    CAST(round(
       |      ln(1 + (stats.n_docs - df.df + ${d(0.5)}) / (df.df + ${d(0.5)})) *
       |      (tf.tf * ${d(k1 + 1)}) /
       |      (tf.tf + ${d(k1)} * (1 - ${d(b)} + ${d(b)} * dl.dl / stats.avgdl)),
       |      6) AS DECIMAL(18,6)) AS c
       |  FROM q JOIN tf ON q.term = tf.term
       |  JOIN df ON q.term = df.term
       |  JOIN dl ON tf.doc_id = dl.doc_id
       |  CROSS JOIN stats),
       |scored AS (
       |  SELECT query_id, doc_id, CAST(SUM(c) AS DOUBLE) AS score
       |  FROM contrib GROUP BY query_id, doc_id),
       |ranked AS (
       |  SELECT query_id, doc_id, score,
       |         row_number() OVER (PARTITION BY query_id ORDER BY score DESC, doc_id) AS rank
       |  FROM scored)
       |SELECT query_id, doc_id, score, rank FROM ranked WHERE rank <= 10
       |ORDER BY query_id, rank""".stripMargin
  }

  /** DuckDB twin of TextAnalysis.tfIdfQuery (x48): same tokenization,
    * same tf/df derivation, and the same x23 determinism discipline —
    * score rounded to 6 decimals through DECIMAL(18,6) before the rank
    * comparison, so the one transcendental (ln) cannot flip a rank
    * across engines. k is interpolated from the SAME Scala constant as
    * the engine face. */
  private def tfIdfSql: String =
    s"""WITH toks AS MATERIALIZED (
       |  SELECT doc_id,
       |    unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS term
       |  FROM documents),
       |tf AS MATERIALIZED (
       |  SELECT doc_id, term, COUNT(*) AS tf FROM toks GROUP BY doc_id, term),
       |n AS (SELECT COUNT(*) AS n_docs FROM documents),
       |post AS (
       |  SELECT doc_id, term, tf, COUNT(*) OVER (PARTITION BY term) AS df
       |  FROM tf),
       |scored AS (
       |  SELECT doc_id, term, tf, df,
       |    CAST(CAST(round(tf * ln(CAST(n.n_docs AS DOUBLE) / df), 6)
       |              AS DECIMAL(18,6)) AS DOUBLE) AS score
       |  FROM post CROSS JOIN n),
       |ranked AS (
       |  SELECT doc_id, term, tf, df, score,
       |         row_number() OVER (PARTITION BY doc_id
       |                            ORDER BY score DESC, term) AS rank
       |  FROM scored)
       |SELECT doc_id, term, tf, df, score, rank
       |FROM ranked WHERE rank <= ${TextAnalysis.TfIdfK}
       |ORDER BY doc_id, rank""".stripMargin

  /** DuckDB twin of Sessionize.sessionQuery: identical lag/cumsum window
    * pair, microsecond epoch diffs, decimal-summed values. The windowed
    * SUM is cast to BIGINT: DuckDB widens SUM(int) OVER to HUGEINT,
    * which the driver's hasher serializes differently from Spark's
    * BIGINT even though every value fits int64 (the r8 x24 hash fail). */
  private def sessionSql: String =
    s"""WITH o AS (
       |  SELECT user_id, event_id, ts, value,
       |    CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
       |         OR epoch_us(ts) - lag(epoch_us(ts)) OVER w > ${Sessionize.DefaultGapUs}
       |         THEN 1 ELSE 0 END AS new_s
       |  FROM events
       |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
       |s AS (
       |  SELECT user_id, ts, value,
       |    CAST(SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
       |                          ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_idx
       |  FROM o)
       |SELECT user_id, session_idx, COUNT(*) AS n_events,
       |       MIN(ts) AS session_start, MAX(ts) AS session_end,
       |       CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value
       |FROM s GROUP BY user_id, session_idx
       |ORDER BY user_id, session_idx""".stripMargin

  /** DuckDB twin of Linkage.fuzzyQuery — deliberately the BRUTE-FORCE
    * cross join (ground truth), so a recall hole in the deletion-
    * neighborhood blocking would surface as a row-count mismatch. */
  private def fuzzySql: String = {
    val probes = Linkage.fuzzyProbes
      .map { case (id, p) => s"($id, '${p.replace("'", "''")}')" }.mkString(", ")
    s"""WITH p(probe_id, probe) AS (VALUES $probes),
       |n AS (SELECT DISTINCT p_name FROM part)
       |SELECT p.probe_id, p.probe, n.p_name, levenshtein(p.probe, n.p_name) AS dist
       |FROM p CROSS JOIN n
       |WHERE levenshtein(p.probe, n.p_name) <= 2
       |ORDER BY probe_id, dist, p_name""".stripMargin
  }

  /** DuckDB twin of Sampling.denseIdQuery — the window form the Spark
    * face deliberately avoids (fine at oracle scale, a one-partition
    * global sort at 100 TB). */
  private def denseIdsSql: String =
    """SELECT doc_id, source,
      |  CAST(row_number() OVER (ORDER BY source, doc_id) - 1 AS BIGINT) AS dense_id
      |FROM documents ORDER BY doc_id""".stripMargin

  /** DuckDB twin of SkewTools.saltedJoinQuery: the PLAIN join — salting
    * must be result-invisible. */
  private def saltedJoinSql: String =
    """SELECT l.l_orderkey, l.l_linenumber, l.l_partkey AS partkey, p.p_brand
      |FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
      |ORDER BY l.l_orderkey, l.l_linenumber""".stripMargin

  /** DuckDB twin of Sampling.weightedSampleQuery, sharing WeightedN and
    * the (key, salt) bucket arithmetic. u = (bucket+1)/2^32 ∈ (0,1] is
    * exact (dyadic denominator); pow/1-over-w match the Spark ops. */
  private def weightedSampleSql: String =
    s"""WITH t AS (
       |  SELECT doc_id, source,
       |    CAST(len(list_filter(string_split(text, ' '), x -> x <> '')) AS BIGINT) AS n_tokens,
       |    ${bucketSql("doc_id::VARCHAR", "aes")} AS b
       |  FROM documents)
       |SELECT doc_id, source FROM (
       |  SELECT doc_id, source, POW((b + 1) / ${Sampling.BucketSpace}, 1.0 / n_tokens) AS k
       |  FROM t WHERE n_tokens > 0
       |  ORDER BY k DESC, doc_id LIMIT ${Sampling.WeightedN})
       |ORDER BY doc_id""".stripMargin

  /** DuckDB twin of Graph.pageRankQuery: the same five damped iterations
    * UNROLLED as chained CTEs over [[pairsCteBody]]'s edge list, in the
    * SAME fixed-point integer arithmetic as the Spark face — truncating
    * `//` mirrors Spark's `div`, BIGINT sums are exact, and the one
    * float op (the final display division) is exact-then-correctly-
    * rounded on both engines. Zero-tolerance hash check by construction. */
  private def pageRankSql: String = {
    val dp = Graph.PageRankDampingPct
    val units = Graph.RankUnits
    val iterCtes = (1 to Graph.PageRankIters).map { i =>
      val prev = s"r${i - 1}"
      // Each r_i is referenced 3× by iteration i+1 (d/m/r) — without
      // MATERIALIZED the inlined tree grows 3^iters-fold.
      s"""d$i AS MATERIALIZED (
         |  SELECT COALESCE(SUM(r.rank), 0) AS ds
         |  FROM $prev r LEFT JOIN deg ON deg.id = r.id WHERE deg.id IS NULL),
         |m$i AS MATERIALIZED (
         |  SELECT e.v AS id, SUM(r.rank // deg.deg) AS msg
         |  FROM edges e JOIN $prev r ON e.u = r.id JOIN deg ON deg.id = r.id
         |  GROUP BY e.v),
         |r$i AS MATERIALIZED (
         |  SELECT r.id, CAST(c.base +
         |      ($dp * (d$i.ds // c.n + COALESCE(m$i.msg, 0))) // 100 AS BIGINT) AS rank
         |  FROM $prev r CROSS JOIN d$i CROSS JOIN c
         |  LEFT JOIN m$i ON m$i.id = r.id)""".stripMargin
    }.mkString(",\n")
    s"""WITH $pairsCteBody,
       |deg AS MATERIALIZED (SELECT u AS id, COUNT(*) AS deg FROM edges GROUP BY u),
       |c AS MATERIALIZED (SELECT COUNT(*) AS n, $units // COUNT(*) AS unit,
       |             ((100 - $dp) * ($units // COUNT(*))) // 100 AS base
       |      FROM documents),
       |r0 AS MATERIALIZED (SELECT doc_id AS id, CAST(c.unit AS BIGINT) AS rank
       |       FROM documents CROSS JOIN c),
       |$iterCtes
       |SELECT id AS doc_id, CAST(rank AS DOUBLE) / $units.0 AS rank
       |FROM r${Graph.PageRankIters} ORDER BY doc_id""".stripMargin
  }

  /** DuckDB twin of Chunking.chunkQuery: identical window geometry —
    * UNNEST(range(0, n, stride)) starts, 1-based end-inclusive list
    * slice = Spark's 1-based (start, length) slice. */
  private def chunkSql: String = {
    val (c, s) = (Chunking.ChunkSize, Chunking.ChunkStride)
    s"""WITH t AS (
       |  SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS w
       |  FROM documents),
       |c AS (
       |  SELECT doc_id, CAST(s // $s AS BIGINT) AS chunk_id, w[s+1:s+$c] AS ch
       |  FROM t, UNNEST(range(0, len(w), $s)) AS u(s)
       |  WHERE len(w) > 0)
       |SELECT doc_id, chunk_id, CAST(len(ch) AS BIGINT) AS n_chunk_tokens,
       |       array_to_string(ch, ' ') AS chunk
       |FROM c ORDER BY doc_id, chunk_id""".stripMargin
  }

  /** DuckDB twin of Sampling.weightedGroupSampleQuery: x40's A-ES
    * arithmetic, ranked within source by the row_number window the heap
    * form replaces. */
  private def weightedGroupSql: String =
    s"""WITH t AS (
       |  SELECT doc_id, source,
       |    CAST(len(list_filter(string_split(text, ' '), x -> x <> '')) AS BIGINT) AS n_tokens,
       |    ${bucketSql("doc_id::VARCHAR", "aesg")} AS b
       |  FROM documents),
       |s AS (
       |  SELECT doc_id, source, POW((b + 1) / ${Sampling.BucketSpace}, 1.0 / n_tokens) AS k
       |  FROM t WHERE n_tokens > 0),
       |r AS (
       |  SELECT doc_id, source,
       |    row_number() OVER (PARTITION BY source ORDER BY k DESC, doc_id) AS rn
       |  FROM s)
       |SELECT doc_id, source FROM r WHERE rn <= ${Sampling.WeightedPerGroupN}
       |ORDER BY doc_id""".stripMargin

  /** DuckDB twin of TextAnalysis.topTermsQuery: per-doc DISTINCT tokens →
    * (lang, token) document frequency → the row_number window form of the
    * heap's (df desc, token asc) selection. */
  private def topTermsSql: String =
    s"""WITH toks AS (
       |  SELECT lang, UNNEST(list_distinct(list_filter(string_split(text, ' '), x -> x <> ''))) AS token
       |  FROM documents),
       |d AS (SELECT lang, token, COUNT(*) AS df FROM toks GROUP BY 1, 2),
       |r AS (SELECT lang, token, df,
       |        row_number() OVER (PARTITION BY lang ORDER BY df DESC, token) AS rn
       |      FROM d)
       |SELECT lang, token, df FROM r WHERE rn <= ${TextAnalysis.TopTermsK}
       |ORDER BY lang, df DESC, token""".stripMargin

  /** DuckDB twin of Sampling.stratifiedQuery (and x37's heap form): same
    * bucket, same per-stratum bottom-12 by (bucket, doc_id). */
  private def stratifiedSql: String =
    s"""WITH b AS (
       |  SELECT doc_id, source, ${bucketSql("doc_id::VARCHAR", "strat")} AS bucket
       |  FROM documents),
       |r AS (
       |  SELECT doc_id, source,
       |         row_number() OVER (PARTITION BY source ORDER BY bucket, doc_id) AS rn
       |  FROM b)
       |SELECT doc_id, source FROM r WHERE rn <= ${Sampling.StratifiedN} ORDER BY doc_id""".stripMargin

  /** DuckDB twin of Analytics.scd2Query: lag-change filter (IS DISTINCT
    * FROM = Spark's null-safe `<=>` negated), then lead/row_number over
    * the change rows — identical (ts, event_id) total order on both
    * engines. */
  /** The x27 history build as a CTE chain ending at `hist` — shared by
    * the x27 listing and the x71 point-in-time lookup (which builds the
    * history from the non-click dimension log) so the run semantics
    * cannot drift. `where` filters the change-log slice ("" = all). */
  private def scd2Cte(where: String = ""): String =
    s"""o AS (
      |  SELECT user_id, event_type, ts, event_id,
      |    ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn,
      |    LAG(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_type
      |  FROM events $where),
      |changes AS (
      |  -- rn = 1 unconditionally: LAG's null sentinel must not swallow
      |  -- an entity whose history STARTS with a null attribute value
      |  SELECT user_id, event_type, ts, event_id FROM o
      |  WHERE rn = 1 OR event_type IS DISTINCT FROM prev_type),
      |hist AS (
      |  SELECT user_id, event_type AS attr, ts AS effective_from,
      |    LEAD(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS effective_to,
      |    CAST(ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS BIGINT) AS version
      |  FROM changes)""".stripMargin

  private def scd2Sql: String =
    s"""WITH ${scd2Cte()}
      |SELECT user_id, attr, effective_from, effective_to, version,
      |  (effective_to IS NULL) AS is_current
      |FROM hist ORDER BY user_id, version""".stripMargin

  /** DuckDB twin of Analytics.pitEnrichQuery (x71): DuckDB's own ASOF
    * LEFT JOIN of the click slice against the SHARED x27 history build
    * over the non-click dimension log — cross-engine check of the
    * native as-of exec composed with the SCD2 build (the q21 discipline
    * on the x27 artifact). */
  private def pitEnrichSql: String =
    s"""WITH ${scd2Cte("WHERE event_type <> 'click'")},
       |clicks AS (
       |  SELECT event_id, user_id, ts FROM events
       |  WHERE event_type = 'click' AND user_id IS NOT NULL AND ts IS NOT NULL)
       |SELECT c.event_id, c.user_id, c.ts, h.attr
       |FROM clicks c ASOF LEFT JOIN
       |     (SELECT user_id, attr, effective_from FROM hist) h
       |  ON c.user_id = h.user_id AND h.effective_from <= c.ts
       |ORDER BY c.event_id""".stripMargin

  /** DuckDB twin of Analytics.percentileQuery: quantile_cont is the same
    * linear interpolation over the same sorted doubles as Spark's exact
    * `percentile`; both images go through DECIMAL(18,4). */
  /** DuckDB twin of Sampling.tokenBudgetQuery: the straightforward
    * per-source running-sum window — the very plan the engine face's
    * distributed prefix scan avoids; same budget constant interpolated
    * from the one definition. */
  private def tokenBudgetSql: String =
    s"""WITH t AS (
       |  SELECT doc_id, source,
       |    CAST(len(list_filter(string_split(text, ' '), x -> x <> '')) AS BIGINT) AS n_tokens
       |  FROM documents),
       |c AS (
       |  SELECT doc_id, source, n_tokens,
       |    SUM(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
       |                        ROWS UNBOUNDED PRECEDING) AS cum_tokens
       |  FROM t)
       |SELECT doc_id, source, n_tokens,
       |  CAST(cum_tokens AS BIGINT) AS cum_tokens,
       |  cum_tokens - n_tokens < ${Sampling.TokenBudgetPerSource} AS kept
       |FROM c ORDER BY doc_id""".stripMargin

  /** DuckDB twin of TextAnalysis.ngramLmQuery: positional bigrams by
    * adjacent-index pairing, exact counts, continuation stats as windows
    * over the aggregated table, one (cnt desc, w1, w2) total order. */
  private def ngramLmSql: String =
    s"""WITH toks AS (
       |  SELECT list_filter(string_split(text, ' '), x -> x <> '') AS w FROM documents),
       |big AS (
       |  SELECT w[g] AS w1, w[g+1] AS w2
       |  FROM toks, UNNEST(range(1, greatest(len(w), 1))) AS t(g)),
       |pc AS (SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS cnt FROM big GROUP BY 1, 2)
       |SELECT w1, w2, cnt,
       |  CAST(COUNT(*) OVER (PARTITION BY w1) AS BIGINT) AS n_right,
       |  CAST(COUNT(*) OVER (PARTITION BY w2) AS BIGINT) AS n_left
       |FROM pc
       |ORDER BY cnt DESC, w1, w2
       |LIMIT ${TextAnalysis.NgramLmTopN}""".stripMargin

  /** DuckDB twin of IntervalJoin.intervalCountQuery: the declarative
    * BETWEEN join (DuckDB's IEJoin handles the inequality natively —
    * the engine face bins precisely because Spark has no IEJoin). */
  private def intervalJoinSql: String =
    s"""WITH iv AS (
       |  SELECT o_orderkey, CAST(o_orderdate AS DATE) AS d0,
       |         CAST(o_orderdate AS DATE)
       |           + CAST(o_orderkey % ${IntervalJoin.WindowModDays} AS INTEGER) AS d1
       |  FROM orders),
       |pts AS (
       |  SELECT CAST(l_shipdate AS DATE) AS d FROM lineitem
       |  WHERE l_quantity >= ${IntervalJoin.PointQuantityMin}),
       |hits AS (
       |  SELECT o_orderkey, COUNT(*) AS nh
       |  FROM iv JOIN pts ON pts.d BETWEEN iv.d0 AND iv.d1
       |  GROUP BY 1)
       |SELECT i.o_orderkey, CAST(coalesce(nh, 0) AS BIGINT) AS n_hits
       |FROM iv i LEFT JOIN hits USING (o_orderkey)
       |ORDER BY o_orderkey""".stripMargin

  /** DuckDB twin of Dedup.snmQuery: the same sort key (the x62
    * nfc_normalize image), rank-window candidates, and x46's exact
    * integer Jaccard accept test. Every multiply-referenced CTE is
    * MATERIALIZED (the budget discipline). */
  private def snmSql: String =
    s"""WITH ranked AS MATERIALIZED (
      |  SELECT doc_id,
      |    ROW_NUMBER() OVER (
      |      ORDER BY trim(regexp_replace(lower(nfc_normalize(text)), '\\s+', ' ', 'g')),
      |               doc_id) AS rk
      |  FROM documents),
      |cand AS MATERIALIZED (
      |  SELECT least(a.doc_id, b.doc_id) AS d1, greatest(a.doc_id, b.doc_id) AS d2
      |  FROM ranked a JOIN ranked b ON b.rk - a.rk BETWEEN 1 AND ${Dedup.SnmWindow - 1}),
      |grams AS MATERIALIZED (
      |  SELECT DISTINCT doc_id, w[g] || ' ' || w[g+1] || ' ' || w[g+2] AS gram
      |  FROM (SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS w
      |        FROM documents),
      |       UNNEST(range(1, greatest(len(w) - 1, 1))) AS t(g)),
      |gsz AS MATERIALIZED (SELECT doc_id, COUNT(*) AS n FROM grams GROUP BY doc_id),
      |vint AS MATERIALIZED (
      |  SELECT c.d1, c.d2, COUNT(*) AS inter
      |  FROM cand c JOIN grams g1 ON g1.doc_id = c.d1
      |              JOIN grams g2 ON g2.doc_id = c.d2 AND g2.gram = g1.gram
      |  GROUP BY 1, 2)
      |SELECT v.d1, v.d2, CAST(v.inter AS BIGINT) AS inter,
      |  CAST(s1.n + s2.n - v.inter AS BIGINT) AS uni
      |FROM vint v JOIN gsz s1 ON s1.doc_id = v.d1 JOIN gsz s2 ON s2.doc_id = v.d2
      |WHERE v.inter * 2 >= s1.n + s2.n - v.inter
      |ORDER BY d1, d2""".stripMargin

  /** DuckDB twin of TextAnalysis.oovQuery: same top-N vocabulary cut
    * ((cnt desc, term) total order), same exact integer counts. */
  private def oovSql: String =
    s"""WITH toks AS (
       |  SELECT doc_id, unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS term
       |  FROM documents),
       |vocab AS (
       |  SELECT term FROM (
       |    SELECT term, COUNT(*) AS c FROM toks GROUP BY term
       |    ORDER BY c DESC, term LIMIT ${TextAnalysis.OovVocabN})),
       |hits AS (
       |  SELECT doc_id, COUNT(*) AS n_iv FROM toks
       |  WHERE term IN (SELECT term FROM vocab) GROUP BY doc_id)
       |SELECT d.doc_id,
       |  CAST(len(list_filter(string_split(text, ' '), x -> x <> '')) AS BIGINT) AS n_tokens,
       |  CAST(len(list_filter(string_split(text, ' '), x -> x <> '')) - coalesce(n_iv, 0) AS BIGINT) AS n_oov
       |FROM documents d LEFT JOIN hits USING (doc_id)
       |ORDER BY doc_id""".stripMargin

  /** DuckDB twin of IntervalJoin.topKIntervalQuery: BETWEEN join +
    * row_number over the (score desc, point id) total order. */
  private def intervalTopKSql: String =
    s"""WITH iv AS (
       |  SELECT o_orderkey, CAST(o_orderdate AS DATE) AS d0,
       |         CAST(o_orderdate AS DATE)
       |           + CAST(o_orderkey % ${IntervalJoin.WindowModDays} AS INTEGER) AS d1
       |  FROM orders),
       |pts AS (
       |  SELECT CAST(l_shipdate AS DATE) AS d, l_orderkey AS pt_orderkey,
       |         l_linenumber AS pt_linenumber, l_extendedprice AS score
       |  FROM lineitem WHERE l_quantity >= ${IntervalJoin.PointQuantityMin}),
       |ranked AS (
       |  SELECT o_orderkey, pt_orderkey, pt_linenumber, score,
       |         ROW_NUMBER() OVER (PARTITION BY o_orderkey
       |                            ORDER BY score DESC, pt_orderkey, pt_linenumber) AS rank
       |  FROM iv JOIN pts ON pts.d BETWEEN iv.d0 AND iv.d1)
       |SELECT o_orderkey, CAST(rank AS INTEGER) AS rank, pt_orderkey, pt_linenumber, score
       |FROM ranked WHERE rank <= ${IntervalJoin.TopKPerInterval}
       |ORDER BY o_orderkey, rank""".stripMargin

  /** DuckDB twin of Analytics.madOutlierQuery: same three-pass shape,
    * same DECIMAL(18,4) discipline on medians, deviations, and the
    * threshold product — flag membership is exact in both engines. */
  private def madOutlierSql: String =
    """WITH base AS (
      |  SELECT event_id, event_type, CAST(value AS DECIMAL(18,4)) AS v
      |  FROM events WHERE value IS NOT NULL),
      |med AS (
      |  SELECT event_type, CAST(quantile_cont(value, 0.5) AS DECIMAL(18,4)) AS med
      |  FROM events WHERE value IS NOT NULL GROUP BY event_type),
      |dev AS (
      |  SELECT event_id, b.event_type, abs(v - med) AS dv
      |  FROM base b JOIN med USING (event_type)),
      |mad AS (
      |  SELECT event_type, CAST(quantile_cont(CAST(dv AS DOUBLE), 0.5) AS DECIMAL(18,4)) AS mad
      |  FROM dev GROUP BY event_type)
      |SELECT event_id, d.event_type
      |FROM dev d JOIN mad USING (event_type)
      |WHERE dv > CAST(4.4478 AS DECIMAL(18,4)) * mad
      |ORDER BY event_id""".stripMargin

  /** DuckDB twin of Analytics.winsorQuery: same two-pass shape, same
    * DECIMAL(18,4) discipline on bounds, clip compares, and the
    * winsorized sum; nulls dropped before the clip in both faces. */
  private def winsorSql: String =
    s"""WITH b AS (
       |  SELECT event_type,
       |    CAST(quantile_cont(value, ${Analytics.WinsorLo}) AS DECIMAL(18,4)) AS p_lo,
       |    CAST(quantile_cont(value, ${Analytics.WinsorHi}) AS DECIMAL(18,4)) AS p_hi
       |  FROM events GROUP BY event_type),
       |v AS (
       |  SELECT e.event_type, CAST(value AS DECIMAL(18,4)) AS v, p_lo, p_hi
       |  FROM events e JOIN b USING (event_type)
       |  WHERE value IS NOT NULL)
       |SELECT event_type,
       |  CAST(COUNT(v) AS BIGINT) AS n,
       |  CAST(COUNT(CASE WHEN v < p_lo THEN 1 END) AS BIGINT) AS n_lo,
       |  CAST(COUNT(CASE WHEN v > p_hi THEN 1 END) AS BIGINT) AS n_hi,
       |  -- bounds present as DOUBLE ON OUTPUT only (no decimal-typed
       |  -- output column hashes stably cross-engine — r9 falsified
       |  -- wide decimals too); the clip compared the exact
       |  -- DECIMAL(18,4) images above
       |  CAST(ANY_VALUE(p_lo) AS DOUBLE) AS p_lo,
       |  CAST(ANY_VALUE(p_hi) AS DOUBLE) AS p_hi,
       |  -- DuckDB's least/greatest promote DECIMAL args to DOUBLE; the
       |  -- clipped value IS one of three DECIMAL(18,4)s (each exact in
       |  -- double), so casting back before the SUM restores the exact
       |  -- decimal sum Spark computes
       |  CAST(SUM(CAST(least(greatest(v, p_lo), p_hi) AS DECIMAL(18,4))) AS DOUBLE) AS sum_w
       |FROM v GROUP BY event_type ORDER BY event_type""".stripMargin

  /** The DECIMAL(18,4) image is the exact arithmetic; the outer DOUBLE
    * is the hash-safe presentation type — decimal output columns of any
    * precision hash differently through the driver (r8 proved p≤18
    * unsafe, r9 falsified p=38 with value-identical dumps), while a
    * 4-decimal value converts to double correctly-rounded and
    * identically in both engines. */
  private def percentileSql: String = {
    val cols = Analytics.percentileSpec.map { case (name, p) =>
      s"CAST(CAST(quantile_cont(value, $p) AS DECIMAL(18,4)) AS DOUBLE) AS $name"
    }.mkString(",\n  ")
    s"""SELECT event_type,
       |  $cols
       |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin
  }

  /** DuckDB twin of Analytics.pivotQuery: conditional aggregation with
    * the same explicit year columns and the same decimal-sum image. */
  private def pivotSql: String = {
    val cols = Analytics.pivotYears.map { y =>
      s"""CAST(SUM(CASE WHEN year(o_orderdate) = $y THEN CAST(o_totalprice AS DECIMAL(18,4)) END) AS DOUBLE) AS y$y"""
    }.mkString(",\n  ")
    s"""SELECT n_name,
       |  $cols
       |FROM orders
       |JOIN customer ON o_custkey = c_custkey
       |JOIN nation ON c_nationkey = n_nationkey
       |GROUP BY n_name ORDER BY n_name""".stripMargin
  }

  /** DuckDB twin of Analytics.unpivotQuery — the direct long-form
    * aggregation the wide pivot melts back into. */
  private def unpivotSql: String =
    """SELECT n_name, 'y' || year(o_orderdate) AS yr,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS revenue
      |FROM orders
      |JOIN customer ON o_custkey = c_custkey
      |JOIN nation ON c_nationkey = n_nationkey
      |GROUP BY n_name, yr ORDER BY n_name, yr""".stripMargin

  /** DuckDB twin of Analytics.movingAvgQuery: the same trailing-7-day
    * RANGE frame over epoch micros, decimal-summed / counted. The
    * divisor stays COUNT(value): DuckDB's NaN->DECIMAL cast errors
    * rather than nulling, so the Spark faces' NaN semantics are not
    * expressible here — identical on the NaN-free events corpus the
    * gate runs on. */
  private def movingAvgSql: String =
    s"""SELECT event_id, user_id, ts,
       |  CAST(SUM(CAST(value AS DECIMAL(18,4))) OVER w AS DOUBLE)
       |    / COUNT(value) OVER w AS mavg
       |FROM events
       |WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts)
       |             RANGE BETWEEN ${Analytics.MovingAvgWindowUs} PRECEDING AND CURRENT ROW)
       |ORDER BY event_id""".stripMargin

  /** DuckDB twin of Analytics.anomalyQuery: identical decimal moments →
    * identical doubles → identical mean/std/threshold arithmetic. */
  private def anomalySql: String =
    """WITH s AS (
      |  SELECT event_type,
      |    CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS s1,
      |    CAST(SUM(CAST(value*value AS DECIMAL(18,4))) AS DOUBLE) AS s2,
      |    COUNT(value) AS n
      |  FROM events GROUP BY event_type)
      |SELECT e.event_id, e.event_type, e.value,
      |  -- inner cast = exact rounding; outer = hash-safe DOUBLE
      |  CAST(CAST((e.value - s1/n) / sqrt(s2/n - (s1/n)*(s1/n)) AS DECIMAL(18,4))
      |       AS DOUBLE) AS z
      |FROM events e JOIN s USING (event_type)
      |WHERE abs(e.value - s1/n) > """.stripMargin +
      s"${Analytics.AnomalyK} * sqrt(s2/n - (s1/n)*(s1/n))\nORDER BY event_id"

  /** DuckDB twin of Analytics.funnelQuery — stages and the conversion
    * window from the SAME Scala constants. */
  private def funnelSql: String = {
    val w = Analytics.FunnelWindowUs
    val stages = Analytics.FunnelStages
    val ctes = stages.zipWithIndex.map { case (stage, i) =>
      if (i == 0)
        s"s0 AS (SELECT user_id, MIN(ts) AS st FROM events WHERE event_type = '$stage' GROUP BY user_id)"
      else
        s"""s$i AS (
           |  SELECT e.user_id, MIN(e.ts) AS st FROM events e JOIN s${i - 1} p ON e.user_id = p.user_id
           |  WHERE e.event_type = '$stage' AND e.ts > p.st
           |    AND epoch_us(e.ts) - epoch_us(p.st) <= $w GROUP BY e.user_id)""".stripMargin
    }.mkString(",\n")
    val counts = stages.zipWithIndex.map { case (stage, i) =>
      s"SELECT '${Analytics.stageLabel(i, stage)}' AS stage, CAST(COUNT(*) AS BIGINT) AS n_users FROM s$i"
    }.mkString("\nUNION ALL ")
    s"WITH $ctes\nSELECT * FROM (\n$counts)\nORDER BY stage"
  }

  /** DuckDB twin of Analytics.retentionQuery: Monday-truncated weeks,
    * integer day-diff / 7. */
  private def retentionSql: String =
    """WITH f AS (
      |  SELECT user_id, CAST(date_trunc('week', MIN(ts)) AS DATE) AS cohort_week
      |  FROM events GROUP BY user_id),
      |activity AS (
      |  SELECT DISTINCT e.user_id, f.cohort_week,
      |    CAST(date_diff('day', f.cohort_week, CAST(date_trunc('week', e.ts) AS DATE)) / 7 AS INT) AS week_k
      |  FROM events e JOIN f ON e.user_id = f.user_id)
      |SELECT cohort_week, week_k, CAST(COUNT(*) AS BIGINT) AS n_users
      |FROM activity GROUP BY cohort_week, week_k
      |ORDER BY cohort_week, week_k""".stripMargin

  /** DuckDB twin of Sampling.mixWeightedQuery: a weights-table LEFT JOIN
    * with a coalesce fallback — the same decision the broadcast-join
    * form makes, from the SAME rate map. */
  private def mixWeightedSql: String = {
    val rows = Sampling.weightedMixRates.toSeq.sortBy(_._1)
      .map { case (src, r) => s"('$src', ${r}::DOUBLE)" }.mkString(", ")
    s"""WITH w(source, rate) AS (VALUES $rows)
       |SELECT d.doc_id, d.source FROM documents d
       |LEFT JOIN w ON d.source = w.source
       |WHERE ${bucketSql("d.doc_id::VARCHAR", "mixw")}
       |      < coalesce(w.rate, ${Sampling.weightedMixDefault}) * ${Sampling.BucketSpace}
       |ORDER BY d.doc_id""".stripMargin
  }

  /** DuckDB twin of TextAnalysis.qualityFunnel (x79). The per-doc signal
    * CTEs are the proven x09/x12 fragments; the stage predicates are the
    * SAME [[TextAnalysis.FunnelStages]] strings the Spark face `expr`s,
    * interpolated into one first-match CASE; the funnel arithmetic is a
    * window cumsum over the |rules|-row aggregate. */
  private def qualityFunnelSql: String = {
    val cases = TextAnalysis.FunnelStages.zipWithIndex
      .map { case ((_, pred), i) => s"WHEN $pred THEN ${i + 1}" }
      .mkString(" ")
    val values = TextAnalysis.FunnelStages.zipWithIndex
      .map { case ((name, _), i) => s"(${i + 1}, '$name')" }
      .mkString(", ")
    s"""WITH toks AS (
       |  SELECT doc_id, text,
       |    list_filter(string_split(text, ' '), x -> x <> '') AS w
       |  FROM documents),
       |tokc AS (SELECT doc_id, t.term, COUNT(*) AS c
       |  FROM toks, UNNEST(w) AS t(term) GROUP BY 1, 2),
       |tokstats AS (
       |  SELECT doc_id, SUM(c) AS n_tok, COUNT(*) AS n_uniq_tok
       |  FROM tokc GROUP BY 1),
       |gramc AS (
       |  SELECT doc_id, term, COUNT(*) AS c FROM (
       |    SELECT doc_id, w[g] || ' ' || w[g+1] AS term
       |    FROM toks, UNNEST(range(1, greatest(len(w), 1))) AS t(g))
       |  GROUP BY 1, 2),
       |gramstats AS (
       |  SELECT doc_id, SUM(c) AS n_2gram, MAX(c) AS top_2gram_n
       |  FROM gramc GROUP BY 1),
       |sig AS MATERIALIZED (
       |  SELECT t.doc_id,
       |    CAST(len(w) AS BIGINT) AS n_tokens,
       |    CAST(length(regexp_replace(text, ' ', '', 'g')) AS BIGINT) AS n_nonspace,
       |    CAST(coalesce(n_tok, 0) AS BIGINT) AS n_tok,
       |    CAST(coalesce(n_uniq_tok, 0) AS BIGINT) AS n_uniq_tok,
       |    CAST(coalesce(n_2gram, 0) AS BIGINT) AS n_2gram,
       |    CAST(coalesce(top_2gram_n, 0) AS BIGINT) AS top_2gram_n
       |  FROM toks t LEFT JOIN tokstats USING (doc_id)
       |  LEFT JOIN gramstats USING (doc_id)),
       |dropped AS (
       |  SELECT CASE $cases END AS stage FROM sig),
       |c AS (SELECT stage, COUNT(*) AS c FROM dropped
       |  WHERE stage IS NOT NULL GROUP BY 1),
       |st(stage, rule) AS (VALUES $values),
       |tot AS (SELECT COUNT(*) AS n_total FROM sig),
       |f AS (
       |  SELECT st.stage, st.rule, coalesce(c.c, 0) AS n_dropped, tot.n_total
       |  FROM st LEFT JOIN c ON c.stage = st.stage CROSS JOIN tot)
       |SELECT CAST(stage AS BIGINT) AS stage, rule,
       |  CAST(n_total - coalesce(SUM(n_dropped) OVER (ORDER BY stage
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS n_in,
       |  CAST(n_dropped AS BIGINT) AS n_dropped,
       |  CAST(n_total - coalesce(SUM(n_dropped) OVER (ORDER BY stage
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
       |    - n_dropped AS BIGINT) AS n_out
       |FROM f ORDER BY stage""".stripMargin
  }

  /** DuckDB twin of Similarity.kmeansQuery (x78), generated for the SAME
    * [[Similarity.KmeansK]]/[[Similarity.KmeansIters]] the Spark face
    * runs with. Each Lloyd round is a pair of MATERIALIZED CTEs (assign,
    * update) so DuckDB computes each round once instead of inlining the
    * whole chain at every reference (the r6 timeout failure mode).
    * Assignment quantizes the one float op — the cosine — to 6 decimals
    * before the argmin rank (ties to the smaller centroid id); centroid
    * updates are exact DECIMAL(18,4) component sums with an emptied
    * cluster keeping its previous centroid via the LEFT JOIN coalesce. */
  private def kmAssignCte(a: String, c: String, e: String = "e"): String =
    s"""$a AS MATERIALIZED (
       |  SELECT vec_id, cid, sim FROM (
       |    SELECT $e.vec_id, c.cid,
       |      CAST(round(list_cosine_similarity($e.v, c.cv), 6) AS DECIMAL(18,6)) AS sim,
       |      ROW_NUMBER() OVER (PARTITION BY $e.vec_id
       |        ORDER BY round(list_cosine_similarity($e.v, c.cv), 6) DESC, c.cid) AS rn
       |    FROM $e CROSS JOIN $c c) WHERE rn = 1)""".stripMargin

  private def kmUpdateCte(c: String, a: String, prev: String,
                          e: String = "e"): String =
    s"""$c AS MATERIALIZED (
       |  SELECT $prev.cid, coalesce(s.cv, $prev.cv) AS cv
       |  FROM $prev LEFT JOIN (
       |    SELECT cid, list(c ORDER BY pos) AS cv FROM (
       |      SELECT a.cid, p AS pos,
       |        CAST(SUM(CAST($e.v[p] AS DECIMAL(18,4))) AS DOUBLE) AS c
       |      FROM $a a JOIN $e USING (vec_id),
       |        UNNEST(range(1, len($e.v) + 1)) AS t(p)
       |      GROUP BY 1, 2) GROUP BY cid) s ON s.cid = $prev.cid)""".stripMargin

  /** The shared deterministic-k-means CTE chain (x78 + x83): cleaned
    * vectors `e`, init codebook `c0`, [[Similarity.KmeansIters]] Lloyd
    * rounds ending at `c<iters>`, final assignment `afin`. */
  private def kmCtes: String = {
    val rounds = (1 to Similarity.KmeansIters).map { i =>
      kmAssignCte(s"a$i", s"c${i - 1}") + ",\n" + kmUpdateCte(s"c$i", s"a$i", s"c${i - 1}")
    }.mkString(",\n")
    s"""e AS MATERIALIZED (
       |  SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
       |  WHERE embedding IS NOT NULL),
       |c0 AS MATERIALIZED (
       |  SELECT vec_id AS cid, v AS cv FROM e
       |  ORDER BY vec_id LIMIT ${Similarity.KmeansK}),
       |$rounds,
       |${kmAssignCte("afin", s"c${Similarity.KmeansIters}")}""".stripMargin
  }

  private def kmeansSql: String =
    s"""WITH $kmCtes
       |SELECT vec_id, CAST(cid AS BIGINT) AS cluster, CAST(sim AS DOUBLE) AS cos_c
       |FROM afin ORDER BY vec_id""".stripMargin

  /** DuckDB twin of Similarity.annExactQuery (x83): the IVF probe over
    * the x78-pinned codebook — probe rank and candidate rank both by
    * round-6 cosine with id tie-breaks, candidates only from each
    * query's probed clusters (afin IS the posting-list assignment). */
  private def annExactSql: String =
    s"""WITH $kmCtes,
       |q AS MATERIALIZED (
       |  SELECT vec_id AS query_id, v AS qv FROM e
       |  WHERE vec_id < ${Similarity.AnnExactQueryIds}),
       |pr AS MATERIALIZED (
       |  SELECT query_id, qv, cid FROM (
       |    SELECT q.query_id, q.qv, c.cid,
       |      ROW_NUMBER() OVER (PARTITION BY q.query_id
       |        ORDER BY round(list_cosine_similarity(q.qv, c.cv), 6) DESC, c.cid) AS prn
       |    FROM q CROSS JOIN c${Similarity.KmeansIters} c)
       |  WHERE prn <= ${Similarity.AnnExactProbes}),
       |scored AS (
       |  SELECT pr.query_id, a.vec_id AS neighbor_id,
       |    ROW_NUMBER() OVER (PARTITION BY pr.query_id
       |      ORDER BY round(list_cosine_similarity(pr.qv, e.v), 6) DESC, a.vec_id)
       |      AS "rank"
       |  FROM pr JOIN afin a ON a.cid = pr.cid AND a.vec_id <> pr.query_id
       |  JOIN e ON e.vec_id = a.vec_id)
       |SELECT query_id, neighbor_id, CAST("rank" AS INT) AS "rank"
       |FROM scored WHERE "rank" <= ${Similarity.AnnExactK}
       |ORDER BY query_id, "rank"""".stripMargin

  /** DuckDB twin of Similarity.semDedupQuery (x92): the x78 k-means CTE
    * chain, then within-cluster lower-id-wins duplicate counting at the
    * same round-6 cosine threshold. */
  private def semDedupSql: String =
    s"""WITH $kmCtes,
       |p AS (
       |  SELECT a2.vec_id AS vec_id, COUNT(*) AS n_dups
       |  FROM afin a1 JOIN afin a2 ON a1.cid = a2.cid AND a1.vec_id < a2.vec_id
       |  JOIN e e1 ON e1.vec_id = a1.vec_id
       |  JOIN e e2 ON e2.vec_id = a2.vec_id
       |  WHERE round(list_cosine_similarity(e1.v, e2.v), 6) >= ${Similarity.SemDedupTau}
       |  GROUP BY 1)
       |SELECT a.vec_id, CAST(a.cid AS BIGINT) AS cluster,
       |  CAST(coalesce(p.n_dups, 0) AS BIGINT) AS n_dups,
       |  CAST(CASE WHEN p.n_dups IS NULL THEN 1 ELSE 0 END AS BIGINT) AS keep
       |FROM afin a LEFT JOIN p USING (vec_id)
       |ORDER BY a.vec_id""".stripMargin

  /** DuckDB twin of Similarity.crossSemProbeQuery (x170): the x78
    * k-means chain fit on the REFERENCE half only (init = the k
    * smallest reference vec_ids), both halves assigned against the
    * final codebook, then the per-candidate cross-side verdict at the
    * same round-6 cosine threshold — best match ranked (sim DESC,
    * ref_id) exactly like the engine's max(struct(sim, -ref_id)). */
  private def crossSemSql: String = {
    val rounds = (1 to Similarity.KmeansIters).map { i =>
      kmAssignCte(s"a$i", s"c${i - 1}") + ",\n" +
        kmUpdateCte(s"c$i", s"a$i", s"c${i - 1}")
    }.mkString(",\n")
    s"""WITH e AS MATERIALIZED (
       |  SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
       |  WHERE embedding IS NOT NULL AND vec_id % 2 = 0),
       |cde AS MATERIALIZED (
       |  SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
       |  WHERE embedding IS NOT NULL AND vec_id % 2 = 1),
       |c0 AS MATERIALIZED (
       |  SELECT vec_id AS cid, v AS cv FROM e
       |  ORDER BY vec_id LIMIT ${Similarity.KmeansK}),
       |$rounds,
       |${kmAssignCte("afin", s"c${Similarity.KmeansIters}")},
       |${kmAssignCte("ca", s"c${Similarity.KmeansIters}", "cde")},
       |hits AS MATERIALIZED (
       |  SELECT ca.vec_id AS cand_id, a.vec_id AS ref_id,
       |    round(list_cosine_similarity(ce.v, re.v), 6) AS sim
       |  FROM ca JOIN afin a ON a.cid = ca.cid
       |  JOIN cde ce ON ce.vec_id = ca.vec_id
       |  JOIN e re ON re.vec_id = a.vec_id
       |  WHERE round(list_cosine_similarity(ce.v, re.v), 6)
       |    >= ${Similarity.SemDedupTau}),
       |best AS (
       |  SELECT cand_id, ref_id, sim FROM (
       |    SELECT cand_id, ref_id, sim,
       |      ROW_NUMBER() OVER (PARTITION BY cand_id
       |        ORDER BY sim DESC, ref_id) AS rn
       |    FROM hits) WHERE rn = 1),
       |agg AS (
       |  SELECT cand_id, CAST(COUNT(*) AS BIGINT) AS n_dups
       |  FROM hits GROUP BY cand_id)
       |SELECT ca.vec_id AS cand_id, CAST(ca.cid AS BIGINT) AS cluster,
       |  CAST(coalesce(agg.n_dups, 0) AS BIGINT) AS n_dups,
       |  CAST(CASE WHEN agg.cand_id IS NULL THEN 1 ELSE 0 END AS BIGINT)
       |    AS keep,
       |  CAST(best.ref_id AS BIGINT) AS best_ref_id,
       |  CAST(best.sim AS DOUBLE) AS best_cos
       |FROM ca LEFT JOIN agg ON agg.cand_id = ca.vec_id
       |        LEFT JOIN best ON best.cand_id = ca.vec_id
       |ORDER BY cand_id""".stripMargin
  }

  /** DuckDB twin of Similarity.crossSemProbeBudgetQuery (x180): the
    * x170 chain with the candidate assignment widened to the top
    * [[Similarity.SemProbeNProbe]] clusters (ROW_NUMBER over round-6
    * cosine DESC, cid ASC — the engine's reversed struct sort), hits
    * unioned across probed clusters, verdict at candidate grain with
    * the rank-1 cluster reported. */
  private def crossSemBudgetSql: String = {
    val rounds = (1 to Similarity.KmeansIters).map { i =>
      kmAssignCte(s"a$i", s"c${i - 1}") + ",\n" +
        kmUpdateCte(s"c$i", s"a$i", s"c${i - 1}")
    }.mkString(",\n")
    s"""WITH e AS MATERIALIZED (
       |  SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
       |  WHERE embedding IS NOT NULL AND vec_id % 2 = 0),
       |cde AS MATERIALIZED (
       |  SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
       |  WHERE embedding IS NOT NULL AND vec_id % 2 = 1),
       |c0 AS MATERIALIZED (
       |  SELECT vec_id AS cid, v AS cv FROM e
       |  ORDER BY vec_id LIMIT ${Similarity.KmeansK}),
       |$rounds,
       |${kmAssignCte("afin", s"c${Similarity.KmeansIters}")},
       |can AS MATERIALIZED (
       |  SELECT vec_id, cid, rn FROM (
       |    SELECT cde.vec_id, c.cid,
       |      ROW_NUMBER() OVER (PARTITION BY cde.vec_id
       |        ORDER BY round(list_cosine_similarity(cde.v, c.cv), 6) DESC,
       |          c.cid) AS rn
       |    FROM cde CROSS JOIN c${Similarity.KmeansIters} c)
       |  WHERE rn <= ${Similarity.SemProbeNProbe}),
       |hits AS MATERIALIZED (
       |  SELECT ca.vec_id AS cand_id, a.vec_id AS ref_id,
       |    round(list_cosine_similarity(ce.v, re.v), 6) AS sim
       |  FROM can ca JOIN afin a ON a.cid = ca.cid
       |  JOIN cde ce ON ce.vec_id = ca.vec_id
       |  JOIN e re ON re.vec_id = a.vec_id
       |  WHERE round(list_cosine_similarity(ce.v, re.v), 6)
       |    >= ${Similarity.SemDedupTau}),
       |best AS (
       |  SELECT cand_id, ref_id, sim FROM (
       |    SELECT cand_id, ref_id, sim,
       |      ROW_NUMBER() OVER (PARTITION BY cand_id
       |        ORDER BY sim DESC, ref_id) AS rn
       |    FROM hits) WHERE rn = 1),
       |agg AS (
       |  SELECT cand_id, CAST(COUNT(*) AS BIGINT) AS n_dups
       |  FROM hits GROUP BY cand_id)
       |SELECT ca.vec_id AS cand_id, CAST(ca.cid AS BIGINT) AS cluster,
       |  CAST(coalesce(agg.n_dups, 0) AS BIGINT) AS n_dups,
       |  CAST(CASE WHEN agg.cand_id IS NULL THEN 1 ELSE 0 END AS BIGINT)
       |    AS keep,
       |  CAST(best.ref_id AS BIGINT) AS best_ref_id,
       |  CAST(best.sim AS DOUBLE) AS best_cos
       |FROM (SELECT vec_id, cid FROM can WHERE rn = 1) ca
       |LEFT JOIN agg ON agg.cand_id = ca.vec_id
       |LEFT JOIN best ON best.cand_id = ca.vec_id
       |ORDER BY cand_id""".stripMargin
  }

  /** DuckDB twin of Similarity.semDriftQuery (x178): the x170 CTE
    * prologue (even-id reference fit, odd-id recent assignment under
    * the frozen codebook), then Laplace-smoothed round-6 occupancy
    * shares, the x82 pinned-ln PSI terms, the exact-decimal PSI sum,
    * and the round-6 threshold verdict. */
  private def semDriftSql: String = {
    val rounds = (1 to Similarity.KmeansIters).map { i =>
      kmAssignCte(s"a$i", s"c${i - 1}") + ",\n" +
        kmUpdateCte(s"c$i", s"a$i", s"c${i - 1}")
    }.mkString(",\n")
    val k = Similarity.KmeansK
    s"""WITH e AS MATERIALIZED (
       |  SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
       |  WHERE embedding IS NOT NULL AND vec_id % 2 = 0),
       |cde AS MATERIALIZED (
       |  SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
       |  WHERE embedding IS NOT NULL AND vec_id % 2 = 1),
       |c0 AS MATERIALIZED (
       |  SELECT vec_id AS cid, v AS cv FROM e
       |  ORDER BY vec_id LIMIT $k),
       |$rounds,
       |${kmAssignCte("afin", s"c${Similarity.KmeansIters}")},
       |${kmAssignCte("ca", s"c${Similarity.KmeansIters}", "cde")},
       |cl AS (SELECT cid FROM c${Similarity.KmeansIters}),
       |rh AS (SELECT cid, COUNT(*) AS n_ref FROM afin GROUP BY 1),
       |ch AS (SELECT cid, COUNT(*) AS n_recent FROM ca GROUP BY 1),
       |tot AS (SELECT (SELECT COUNT(*) FROM afin) AS tr,
       |               (SELECT COUNT(*) FROM ca) AS tc),
       |per AS MATERIALIZED (
       |  SELECT cl.cid AS cluster,
       |    CAST(coalesce(rh.n_ref, 0) AS BIGINT) AS n_ref,
       |    CAST(coalesce(ch.n_recent, 0) AS BIGINT) AS n_recent,
       |    round(CAST(coalesce(rh.n_ref, 0) + 1 AS DOUBLE)
       |      / CAST(tr + $k AS DOUBLE), 6) AS ref_share,
       |    round(CAST(coalesce(ch.n_recent, 0) + 1 AS DOUBLE)
       |      / CAST(tc + $k AS DOUBLE), 6) AS recent_share
       |  FROM cl LEFT JOIN rh ON rh.cid = cl.cid
       |          LEFT JOIN ch ON ch.cid = cl.cid
       |          CROSS JOIN tot),
       |per2 AS MATERIALIZED (
       |  SELECT *, round((recent_share - ref_share)
       |    * round(ln(recent_share / ref_share), 6), 6) AS psi_term
       |  FROM per),
       |tot2 AS (
       |  SELECT round(CAST(SUM(CAST(psi_term AS DECIMAL(18,6))) AS DOUBLE),
       |    6) AS psi
       |  FROM per2)
       |SELECT cluster, n_ref, n_recent, ref_share, recent_share, psi_term,
       |  psi,
       |  CAST(CASE WHEN psi >= ${Similarity.SemDriftThreshold} THEN 1
       |       ELSE 0 END AS BIGINT) AS rebuild
       |FROM per2 CROSS JOIN tot2 ORDER BY cluster""".stripMargin
  }

  /** DuckDB twin of Similarity.marginQuery (x94): round-6 cosine rank
    * with id tie-breaks, exact decimal top-k sum, the margin as the
    * SAME two-op float image (cos1·k)/sum. */
  private def marginSql: String =
    s"""WITH e AS MATERIALIZED (
       |  SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
       |  WHERE embedding IS NOT NULL),
       |q AS (SELECT vec_id AS query_id, v AS qv FROM e
       |      WHERE vec_id < ${Similarity.MarginQueryIds}),
       |sc AS MATERIALIZED (
       |  SELECT q.query_id, e.vec_id AS neighbor_id,
       |    CAST(round(list_cosine_similarity(q.qv, e.v), 6) AS DECIMAL(18,6)) AS sim,
       |    ROW_NUMBER() OVER (PARTITION BY q.query_id
       |      ORDER BY round(list_cosine_similarity(q.qv, e.v), 6) DESC, e.vec_id) AS rn
       |  FROM q JOIN e ON e.vec_id <> q.query_id)
       |SELECT query_id,
       |  CAST(MAX(CASE WHEN rn = 1 THEN neighbor_id END) AS BIGINT) AS best_id,
       |  -- COUNT(*), not the constant k: with < k candidates the mean
       |  -- must divide by what was summed (matches the Spark face)
       |  CAST(MAX(CASE WHEN rn = 1 THEN sim END) AS DOUBLE) * COUNT(*)
       |    / CAST(SUM(sim) AS DOUBLE) AS margin
       |FROM sc WHERE rn <= ${Similarity.MarginK}
       |GROUP BY query_id ORDER BY query_id""".stripMargin

  /** DuckDB twin of TextAnalysis.sourceOverlapQuery (x95): distinct
    * trigram sets per source, gram-keyed intersection counts, the full
    * ordered pair grid left-joined so empty intersections read 0. */
  private def sourceOverlapSql: String =
    """WITH toks AS (
      |  SELECT doc_id, source,
      |    list_filter(string_split(text, ' '), x -> x <> '') AS w
      |  FROM documents),
      |sg AS MATERIALIZED (
      |  SELECT DISTINCT source, w[g] || ' ' || w[g+1] || ' ' || w[g+2] AS gram
      |  FROM toks, UNNEST(range(1, greatest(len(w) - 1, 1))) AS t(g)),
      |sizes AS MATERIALIZED (SELECT source, COUNT(*) AS n FROM sg GROUP BY 1),
      |inter AS (
      |  SELECT a.source AS source_a, b.source AS source_b, COUNT(*) AS n_inter
      |  FROM sg a JOIN sg b USING (gram)
      |  WHERE a.source < b.source GROUP BY 1, 2),
      |grid AS (
      |  SELECT a.source AS source_a, a.n AS n_a, b.source AS source_b, b.n AS n_b
      |  FROM sizes a CROSS JOIN sizes b WHERE a.source < b.source)
      |SELECT source_a, source_b,
      |  CAST(n_a AS BIGINT) AS n_a, CAST(n_b AS BIGINT) AS n_b,
      |  CAST(coalesce(n_inter, 0) AS BIGINT) AS n_inter,
      |  CAST(n_a + n_b - coalesce(n_inter, 0) AS BIGINT) AS n_union,
      |  CAST(coalesce(n_inter, 0) AS DOUBLE)
      |    / (n_a + n_b - coalesce(n_inter, 0)) AS jaccard
      |FROM grid LEFT JOIN inter USING (source_a, source_b)
      |ORDER BY source_a, source_b""".stripMargin

  /** DuckDB twin of TextAnalysis.growthCurveQuery (x96): per-bucket doc
    * and token volumes, first-seen gram counts (x90's min-owner frame),
    * and the running distinct-gram total over the bucket-grain table. */
  private def growthSql: String =
    s"""WITH toks AS MATERIALIZED (
       |  SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS w
       |  FROM documents),
       |per AS (
       |  SELECT doc_id // ${TextAnalysis.GrowthBucketDocs} AS bucket,
       |    COUNT(*) AS n_docs, SUM(len(w)) AS n_tokens
       |  FROM toks GROUP BY 1),
       |dg AS MATERIALIZED (
       |  SELECT DISTINCT doc_id, w[g] || ' ' || w[g+1] || ' ' || w[g+2] AS gram
       |  FROM toks, UNNEST(range(1, greatest(len(w) - 1, 1))) AS t(g)),
       |fs AS (SELECT gram, MIN(doc_id) AS first_doc FROM dg GROUP BY 1),
       |ng AS (SELECT first_doc // ${TextAnalysis.GrowthBucketDocs} AS bucket,
       |       COUNT(*) AS n_new_grams FROM fs GROUP BY 1)
       |SELECT CAST(p.bucket AS BIGINT) AS bucket,
       |  CAST(n_docs AS BIGINT) AS n_docs,
       |  CAST(n_tokens AS BIGINT) AS n_tokens,
       |  CAST(coalesce(n_new_grams, 0) AS BIGINT) AS n_new_grams,
       |  CAST(SUM(coalesce(n_new_grams, 0)) OVER (ORDER BY p.bucket
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_grams
       |FROM per p LEFT JOIN ng USING (bucket)
       |ORDER BY bucket""".stripMargin

  /** The Morton interleave of two bucket ordinals as a SQL bit-op sum —
    * generated from the SAME [[Layout.ZmBits]] the native
    * `interleave_bits` kernel runs with, so the twins cannot drift. */
  private def zInterleaveSql(a: String, b: String): String =
    (0 until Layout.ZmBits).map { i =>
      s"((($a >> $i) & 1) << ${2 * i}) + ((($b >> $i) & 1) << ${2 * i + 1})"
    }.mkString(" + ")

  /** DuckDB twin of Layout.zonemapQuery (x77). Bucket ordinals are the
    * EXPLICIT floor((v−lo)·2^bits/span) arithmetic (cast-to-double
    * first, exactly like the Spark face) — every step IEEE
    * correctly-rounded, so the two engines agree bit-for-bit; the
    * interleave and everything after is integer-exact, and the per-zone
    * min/max emit stored values untouched. */
  private def zonemapSql: String = {
    val n = 1L << Layout.ZmBits
    def bucket(v: String, lo: String, span: String): String =
      s"""CASE WHEN $span = 0 THEN 0
         |      ELSE least(${n - 1}, greatest(0,
         |        CAST(floor(((CAST($v AS DOUBLE) - $lo) * $n.0) / $span) AS BIGINT))) END"""
        .stripMargin.replaceAll("\n\\s*", " ")
    s"""WITH e AS (
       |  SELECT user_id, value FROM events
       |  WHERE user_id IS NOT NULL AND value IS NOT NULL),
       |r AS (
       |  SELECT CAST(min(user_id) AS DOUBLE) AS lo_u,
       |         CAST(max(user_id) - min(user_id) AS DOUBLE) AS span_u,
       |         min(value) AS lo_v, max(value) - min(value) AS span_v
       |  FROM e),
       |b AS (
       |  SELECT user_id, value,
       |    ${bucket("user_id", "lo_u", "span_u")} AS bu,
       |    ${bucket("value", "lo_v", "span_v")} AS bv
       |  FROM e, r),
       |z AS (
       |  SELECT user_id, value,
       |    (${zInterleaveSql("bu", "bv")}) >> ${Layout.ZmShift} AS zbucket
       |  FROM b)
       |SELECT CAST(zbucket AS BIGINT) AS zbucket,
       |  CAST(COUNT(*) AS BIGINT) AS n,
       |  MIN(user_id) AS min_u, MAX(user_id) AS max_u,
       |  MIN(value) AS min_v, MAX(value) AS max_v
       |FROM z GROUP BY 1 ORDER BY zbucket""".stripMargin
  }

  /** DuckDB twin of TextAnalysis.tokenEntropyQuery (x81): same (doc,
    * term) counts, same 6-decimal-rounded ln into DECIMAL(18,6), same
    * exact decimal dot product divided once in double. */
  private def tokenEntropySql: String =
    """WITH tok AS (
      |  SELECT doc_id, unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS t
      |  FROM documents),
      |tc AS (SELECT doc_id, t, COUNT(*) AS c FROM tok GROUP BY 1, 2),
      |m AS (SELECT doc_id, c, SUM(c) OVER (PARTITION BY doc_id) AS n FROM tc),
      |per AS (
      |  SELECT doc_id, CAST(ANY_VALUE(n) AS BIGINT) AS n_tokens,
      |    CAST(COUNT(*) AS BIGINT) AS n_types,
      |    CAST(SUM(c * CAST(round(ln(CAST(n AS DOUBLE) / CAST(c AS DOUBLE)), 6)
      |                      AS DECIMAL(18,6))) AS DOUBLE)
      |      / ANY_VALUE(n) AS entropy
      |  FROM m GROUP BY doc_id)
      |SELECT d.doc_id, CAST(coalesce(n_tokens, 0) AS BIGINT) AS n_tokens,
      |  CAST(coalesce(n_types, 0) AS BIGINT) AS n_types, entropy
      |FROM documents d LEFT JOIN per USING (doc_id)
      |ORDER BY d.doc_id""".stripMargin

  /** DuckDB twin of TextAnalysis.klDriftQuery (x82): same windowed
    * marginals over the (source, term) aggregate, same x70-shaped
    * double ratios into the rounded ln, same decimal dot product. */
  private def klDriftSql: String =
    """WITH tok AS (
      |  SELECT source, unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS t
      |  FROM documents),
      |tc AS (SELECT source, t, COUNT(*) AS c FROM tok GROUP BY 1, 2),
      |tot AS (SELECT CAST(SUM(c) AS BIGINT) AS n FROM tc),
      |m AS (
      |  SELECT source, c,
      |    SUM(c) OVER (PARTITION BY source) AS ns,
      |    SUM(c) OVER (PARTITION BY t) AS ct
      |  FROM tc)
      |SELECT source, CAST(ANY_VALUE(ns) AS BIGINT) AS n_tokens,
      |  CAST(COUNT(*) AS BIGINT) AS n_types,
      |  CAST(SUM(c * CAST(round(ln((CAST(c AS DOUBLE) / ns) * (CAST(n AS DOUBLE) / ct)), 6)
      |                    AS DECIMAL(18,6))) AS DOUBLE)
      |    / ANY_VALUE(ns) AS kl
      |FROM m CROSS JOIN tot
      |-- NULLS FIRST pinned to match Spark's asc default (source is
      |-- non-null in the corpus; the twin should not depend on that)
      |GROUP BY source ORDER BY source NULLS FIRST""".stripMargin

  /** DuckDB twin of DocPrep.piiQuery (x97): the SAME planted-PII
    * corpus rebuilt from doc_id residues, the SAME regex constants
    * interpolated from [[DocPrep]] (single source of truth — both
    * engines compile the identical pattern text), counts via
    * len(regexp_extract_all) (= Spark's regexp_count non-overlapping
    * scan), redaction via the same SEQUENTIAL three replaces with the
    * 'g' flag (DuckDB replaces only the first match by default —
    * Spark replaces all). */
  private def piiSql: String = {
    val (em, ph, ip) = (DocPrep.PiiEmailRe, DocPrep.PiiPhoneRe, DocPrep.PiiIpRe)
    s"""WITH planted AS MATERIALIZED (
       |  SELECT doc_id, text ||
       |    CASE WHEN doc_id % 5 = 0 THEN ' contact user' ||
       |      CAST(doc_id AS VARCHAR) || '@example.com ok' ELSE '' END ||
       |    CASE WHEN doc_id % 7 = 0 THEN ' call 555-867-' ||
       |      lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') || ' now' ELSE '' END ||
       |    CASE WHEN doc_id % 11 = 0 THEN ' host 10.' ||
       |      CAST(doc_id % 256 AS VARCHAR) || '.0.1 up' ELSE '' END AS text
       |  FROM documents)
       |SELECT doc_id,
       |  CAST(len(regexp_extract_all(text, '$em')) AS BIGINT) AS n_email,
       |  CAST(len(regexp_extract_all(text, '$ph')) AS BIGINT) AS n_phone,
       |  CAST(len(regexp_extract_all(text, '$ip')) AS BIGINT) AS n_ip,
       |  CAST(len(regexp_extract_all(text, '$em')) +
       |       len(regexp_extract_all(text, '$ph')) +
       |       len(regexp_extract_all(text, '$ip')) AS BIGINT) AS pii_total,
       |  CAST(length(text) AS BIGINT) AS raw_len,
       |  CAST(length(regexp_replace(regexp_replace(regexp_replace(text,
       |    '$em', '[EMAIL]', 'g'), '$ph', '[PHONE]', 'g'), '$ip', '[IP]', 'g'))
       |    AS BIGINT) AS redacted_len
       |FROM planted ORDER BY doc_id""".stripMargin
  }

  /** DuckDB twin of DocPrep.encodingQuery (x164): the SAME planted
    * damage rebuilt from doc_id residues (replacement char / BEL /
    * four-space run via chr()), the SAME pattern constants
    * interpolated from [[DocPrep]] — char classes only, identical to
    * Java regex and RE2. */
  private def encodingSql: String = {
    val (ctrl, nonAscii, longSp) =
      (DocPrep.CtrlRe, DocPrep.NonAsciiRe, DocPrep.LongSpaceRe)
    s"""WITH planted AS MATERIALIZED (
       |  SELECT doc_id, text ||
       |    CASE WHEN doc_id % 9 = 0
       |      THEN ' bad' || chr(65533) || 'decode' ELSE '' END ||
       |    CASE WHEN doc_id % 13 = 0
       |      THEN ' bell' || chr(7) || 'byte' ELSE '' END ||
       |    CASE WHEN doc_id % 17 = 0 THEN ' wide    gap' ELSE '' END AS text
       |  FROM documents),
       |m AS (
       |  SELECT doc_id,
       |    CAST(length(text) AS BIGINT) AS n_chars,
       |    CAST(len(regexp_extract_all(text, chr(65533))) AS BIGINT) AS n_repl,
       |    CAST(len(regexp_extract_all(text, '$ctrl')) AS BIGINT) AS n_ctrl,
       |    CAST(length(regexp_replace(text, '$nonAscii', '', 'g')) AS BIGINT) AS n_ascii,
       |    CAST(len(regexp_extract_all(text, '$longSp')) AS BIGINT) AS n_longspace
       |  FROM planted)
       |SELECT doc_id, n_chars, n_repl, n_ctrl, n_ascii, n_longspace,
       |  CAST(CASE WHEN n_repl = 0 AND n_ctrl = 0 AND n_longspace = 0
       |       THEN 1 ELSE 0 END AS BIGINT) AS clean
       |FROM m ORDER BY doc_id""".stripMargin
  }

  /** DuckDB twin of DocPrep.contextSweepQuery (x165): the same grid
    * exploded over the per-doc token count, exact BIGINT sums, two
    * round-at-6 rates. */
  private def contextSweepSql: String = {
    val grid = DocPrep.ContextGrid.map(l => s"$l::BIGINT").mkString(", ")
    s"""WITH nn AS MATERIALIZED (
       |  SELECT CAST(len(list_filter(string_split(text, ' '), x -> x <> ''))
       |    AS BIGINT) AS n
       |  FROM documents),
       |g AS (SELECT n, max_len FROM nn, UNNEST([$grid]) AS t(max_len)),
       |a AS (
       |  SELECT max_len, CAST(COUNT(*) AS BIGINT) AS n_docs,
       |    CAST(SUM(CASE WHEN n > max_len THEN 1 ELSE 0 END) AS BIGINT) AS n_truncated,
       |    CAST(SUM(n) AS BIGINT) AS tokens_total,
       |    CAST(SUM(least(n, max_len)) AS BIGINT) AS tokens_kept,
       |    CAST(SUM(max_len - least(n, max_len)) AS BIGINT) AS pad_tokens
       |  FROM g GROUP BY max_len)
       |SELECT max_len, n_docs, n_truncated, tokens_total, tokens_kept,
       |  tokens_total - tokens_kept AS tokens_dropped, pad_tokens,
       |  round(CAST(tokens_total - tokens_kept AS DOUBLE)
       |    / CAST(tokens_total AS DOUBLE), 6) AS drop_rate,
       |  round(CAST(tokens_kept AS DOUBLE)
       |    / CAST(n_docs * max_len AS DOUBLE), 6) AS util
       |FROM a ORDER BY max_len""".stripMargin
  }

  /** DuckDB twin of Analytics.calibrationQuery (x177): the planted
    * (conf, correct) stream rebuilt from the same residue arithmetic,
    * per-bin exact decimal sums with one rounded division each, the
    * round-6 |gap|, and the bin = −1 summary as n-weighted means of
    * the round-6 per-bin images — every inexact step where the engine
    * lands it. */
  private def calibrationSql: String = {
    val b = Analytics.CalibBins
    s"""WITH p AS MATERIALIZED (
       |  SELECT round(((event_id % 97) + 0.5) / 97.0, 6) AS conf,
       |    CASE WHEN user_id % 97 < event_id % 97 THEN 1 ELSE 0 END AS c
       |  FROM events WHERE event_id IS NOT NULL AND user_id IS NOT NULL),
       |binned AS (
       |  SELECT greatest(CAST(0 AS BIGINT),
       |    least(CAST(FLOOR(conf * $b) AS BIGINT), ${b - 1})) AS bin,
       |    conf, c
       |  FROM p),
       |per AS MATERIALIZED (
       |  SELECT bin, CAST(COUNT(*) AS BIGINT) AS n,
       |    round(CAST(SUM(CAST(conf AS DECIMAL(18,6))) AS DOUBLE)
       |      / CAST(COUNT(*) AS DOUBLE), 6) AS avg_conf,
       |    round(CAST(SUM(c) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE), 6)
       |      AS accuracy
       |  FROM binned GROUP BY bin),
       |per2 AS MATERIALIZED (
       |  SELECT bin, n, avg_conf, accuracy,
       |    round(abs(accuracy - avg_conf), 6) AS gap
       |  FROM per),
       |tot AS (
       |  SELECT CAST(SUM(n) AS BIGINT) AS n,
       |    round(CAST(SUM(CAST(avg_conf AS DECIMAL(18,6)) * n) AS DOUBLE)
       |      / CAST(SUM(n) AS DOUBLE), 6) AS avg_conf,
       |    round(CAST(SUM(CAST(accuracy AS DECIMAL(18,6)) * n) AS DOUBLE)
       |      / CAST(SUM(n) AS DOUBLE), 6) AS accuracy,
       |    round(CAST(SUM(CAST(gap AS DECIMAL(18,6)) * n) AS DOUBLE)
       |      / CAST(SUM(n) AS DOUBLE), 6) AS gap
       |  FROM per2)
       |SELECT bin, n, avg_conf, accuracy, gap FROM per2
       |UNION ALL
       |SELECT CAST(-1 AS BIGINT), n, avg_conf, accuracy, gap FROM tot
       |ORDER BY bin""".stripMargin
  }

  /** DuckDB twin of Sampling.packWinnerQuery (x173): the x165 sweep
    * aggregates rebuilt, the constrained argmax (round-6 drop/util
    * images of exact integers, ties to the smaller L), then the x21
    * pack chain with the winner as both truncation cap and bin
    * budget. */
  private def packWinnerSql: String = {
    val grid = DocPrep.ContextGrid.map(l => s"$l::BIGINT").mkString(", ")
    s"""WITH t AS MATERIALIZED (
       |  SELECT doc_id,
       |    CAST(len(list_filter(string_split(text, ' '), x -> x <> ''))
       |      AS BIGINT) AS n,
       |    doc_id % 32 AS shard
       |  FROM documents),
       |g AS (SELECT n, max_len FROM t, UNNEST([$grid]) AS u(max_len)),
       |a AS (
       |  SELECT max_len, CAST(COUNT(*) AS BIGINT) AS n_docs,
       |    CAST(SUM(n) AS BIGINT) AS tot,
       |    CAST(SUM(least(n, max_len)) AS BIGINT) AS kept
       |  FROM g GROUP BY max_len),
       |win AS (
       |  SELECT max_len FROM a
       |  WHERE round(CAST(tot - kept AS DOUBLE) / CAST(tot AS DOUBLE), 6)
       |    <= ${Sampling.PackWinnerMaxDrop}
       |  ORDER BY round(CAST(kept AS DOUBLE)
       |    / CAST(n_docs * max_len AS DOUBLE), 6) DESC, max_len
       |  LIMIT 1),
       |c AS (
       |  SELECT t.doc_id, least(t.n, w.max_len) AS n_tokens, t.shard,
       |    w.max_len,
       |    SUM(least(t.n, w.max_len)) OVER (PARTITION BY t.shard
       |      ORDER BY t.doc_id ROWS UNBOUNDED PRECEDING) AS cum
       |  FROM t CROSS JOIN win w)
       |SELECT doc_id, n_tokens, shard,
       |  shard * 1099511627776
       |    + CAST(FLOOR((cum - n_tokens) / (max_len * 1.0)) AS BIGINT)
       |    AS pack_id,
       |  max_len
       |FROM c ORDER BY doc_id""".stripMargin
  }

  /** DuckDB twin of Analytics.bradleyTerryQuery (x167): the planted
    * comparison frame rebuilt from the same residue arithmetic, the
    * pair aggregate in exact BIGINTs, and [[Analytics.BtIters]] MM
    * iterations UNROLLED — each n'/(wᵢ+wⱼ) term rounds at 6 into
    * DECIMAL(18,6) before the exact decimal denominator sum, the
    * update and the normalization round at 6 — exactly where the
    * engine's driver-side loop rounds, so the two cannot drift. */
  private def bradleyTerrySql: String =
    s"""WITH $btCtes
       |SELECT g.item, g.n_games, g.n_wins,
       |  CAST(w.w AS DOUBLE) AS strength
       |FROM w${Analytics.BtIters} w JOIN games g ON g.item = w.item
       |ORDER BY g.item""".stripMargin

  /** DuckDB twin of Analytics.btUpsetsQuery (x172): the x167 ladder
    * CTEs verbatim, then each planted comparison joined to the final
    * round-6 weights — the same double add + divide on the same
    * operands, the one p_win image rounded at 6 (the x94 multi-float-op
    * discipline). */
  private def btUpsetsSql: String = {
    val p = s"round(CAST(ww.w AS DOUBLE) / (CAST(ww.w AS DOUBLE)" +
      s" + CAST(wl.w AS DOUBLE)), 6)"
    s"""WITH $btCtes
       |SELECT c.cmp_id, c.winner, c.loser, $p AS p_win,
       |  CAST(CASE WHEN $p < 0.5 THEN 1 ELSE 0 END AS BIGINT) AS upset
       |FROM cmp c
       |JOIN w${Analytics.BtIters} ww ON ww.item = c.winner
       |JOIN w${Analytics.BtIters} wl ON wl.item = c.loser
       |ORDER BY c.cmp_id""".stripMargin
  }

  /** The shared x167/x172 CTE chain: planted comparisons (with their
    * cmp_id), smoothed directed pair counts, and [[Analytics.BtIters]]
    * unrolled MM rounds ending at `w<iters>` (+ the raw `games`
    * tallies). */
  private def btCtes: String = {
    val steps = (1 to Analytics.BtIters).map { t =>
      val prev = s"w${t - 1}"
      s"""d$t AS (
         |  SELECT d.item,
         |    SUM(CAST(round(CAST(d.n2 AS DOUBLE)
         |          / (CAST(wi.w AS DOUBLE) + CAST(wj.w AS DOUBLE)), 6)
         |        AS DECIMAL(18,6))) AS den
         |  FROM dir d
         |  JOIN $prev wi ON wi.item = d.item
         |  JOIN $prev wj ON wj.item = d.other
         |  GROUP BY d.item),
         |r$t AS (
         |  SELECT t.item,
         |    CAST(round(CAST(wt.wtot AS DOUBLE) / CAST(t.den AS DOUBLE), 6)
         |      AS DECIMAL(18,6)) AS r
         |  FROM d$t t JOIN wtot wt ON wt.item = t.item),
         |m$t AS (SELECT SUM(r) AS mass FROM r$t),
         |w$t AS MATERIALIZED (
         |  SELECT item,
         |    CAST(round(CAST(r AS DOUBLE) * kk.k / CAST(mass AS DOUBLE), 6)
         |      AS DECIMAL(18,6)) AS w
         |  FROM r$t CROSS JOIN m$t CROSS JOIN kk)""".stripMargin
    }.mkString(",\n")
    s"""base AS MATERIALIZED (
       |  SELECT user_id % 5 AS pa,
       |    (user_id % 5 + 1 + user_id % 4) % 5 AS pb,
       |    event_id
       |  FROM events WHERE event_id IS NOT NULL AND user_id IS NOT NULL),
       |cmp AS MATERIALIZED (
       |  SELECT event_id AS cmp_id,
       |         CASE WHEN event_id % (pa + pb + 2) < pa + 1
       |              THEN pa ELSE pb END AS winner,
       |         CASE WHEN event_id % (pa + pb + 2) < pa + 1
       |              THEN pb ELSE pa END AS loser
       |  FROM base),
       |agg AS MATERIALIZED (
       |  SELECT least(winner, loser) AS a, greatest(winner, loser) AS b,
       |    CAST(COUNT(*) AS BIGINT) AS n,
       |    CAST(SUM(CASE WHEN winner < loser THEN 1 ELSE 0 END) AS BIGINT)
       |      AS wins_a
       |  FROM cmp GROUP BY 1, 2),
       |dir AS MATERIALIZED (
       |  SELECT a AS item, b AS other, n + 2 AS n2, wins_a + 1 AS wins
       |  FROM agg
       |  UNION ALL
       |  SELECT b, a, n + 2, n - wins_a + 1 FROM agg),
       |wtot AS MATERIALIZED (
       |  SELECT item, CAST(SUM(wins) AS BIGINT) AS wtot FROM dir GROUP BY item),
       |kk AS (SELECT CAST(COUNT(*) AS BIGINT) AS k FROM wtot),
       |games AS (
       |  SELECT item, CAST(SUM(n) AS BIGINT) AS n_games,
       |    CAST(SUM(wr) AS BIGINT) AS n_wins
       |  FROM (SELECT a AS item, n, wins_a AS wr FROM agg
       |        UNION ALL SELECT b, n, n - wins_a FROM agg)
       |  GROUP BY item),
       |w0 AS (SELECT item, CAST(1.000000 AS DECIMAL(18,6)) AS w FROM wtot),
       |$steps""".stripMargin
  }

  /** DuckDB twin of Sampling.sourceCapQuery (x98): the same md5
    * priority ([[bucketSql]] = Sampling.hashBucket bit-for-bit), the
    * same per-source rank window, the same cap verdict. */
  private def sourceCapSql: String =
    s"""WITH ranked AS (
       |  SELECT doc_id, source,
       |    ROW_NUMBER() OVER (PARTITION BY source
       |      ORDER BY ${bucketSql("CAST(doc_id AS VARCHAR)", "cap")}, doc_id)
       |      AS rk
       |  FROM documents)
       |SELECT doc_id, source, CAST(rk AS BIGINT) AS rk,
       |  CAST(CASE WHEN rk <= ${Sampling.SourceCapN} THEN 1 ELSE 0 END
       |    AS BIGINT) AS kept
       |FROM ranked ORDER BY doc_id""".stripMargin

  /** DuckDB twin of Analytics.annotatorQuery (x99): same synthetic
    * vote frame from events, arg_min first-vote dedup (= Spark's
    * min_by), the same count-desc/label-asc majority tie-break, exact
    * BIGINT counts with the one double division (round 6, x80's
    * presentation discipline) at the end. */
  private def annotatorSql: String =
    """WITH votes AS MATERIALIZED (
      |  SELECT user_id % 7 AS annotator, event_id % 500 AS item,
      |    event_type AS label, event_id AS vote_id
      |  FROM events
      |  WHERE event_type IS NOT NULL AND user_id IS NOT NULL),
      |firstv AS MATERIALIZED (
      |  SELECT item, annotator, arg_min(label, vote_id) AS label
      |  FROM votes GROUP BY 1, 2),
      |maj AS (
      |  SELECT item, label AS maj_label FROM (
      |    SELECT item, label,
      |      ROW_NUMBER() OVER (PARTITION BY item
      |        ORDER BY COUNT(*) DESC, label) AS r
      |    FROM firstv GROUP BY item, label)
      |  WHERE r = 1)
      |SELECT f.annotator, CAST(COUNT(*) AS BIGINT) AS n_items,
      |  CAST(SUM(CASE WHEN f.label = m.maj_label THEN 1 ELSE 0 END)
      |    AS BIGINT) AS n_agree,
      |  round(CAST(SUM(CASE WHEN f.label = m.maj_label THEN 1 ELSE 0 END)
      |          AS DOUBLE)
      |        / CAST(COUNT(*) AS DOUBLE), 6) AS agreement
      |FROM firstv f JOIN maj m USING (item)
      |GROUP BY f.annotator ORDER BY annotator""".stripMargin

  /** DuckDB twin of Analytics.dawidSkeneQuery (x101): x99's frame plus
    * the integer weight `(1000000 * n_agree) // n_items` (DuckDB `//`
    * = floor division = Spark's `div` on non-negative BIGINTs), exact
    * BIGINT weight sums, the same (weight desc, label asc) argmax. */
  private def dawidSkeneSql: String =
    """WITH votes AS MATERIALIZED (
      |  SELECT user_id % 7 AS annotator, event_id % 500 AS item,
      |    event_type AS label, event_id AS vote_id
      |  FROM events
      |  WHERE event_type IS NOT NULL AND user_id IS NOT NULL),
      |firstv AS MATERIALIZED (
      |  SELECT item, annotator, arg_min(label, vote_id) AS label
      |  FROM votes GROUP BY 1, 2),
      |maj AS MATERIALIZED (
      |  SELECT item, label AS maj_label FROM (
      |    SELECT item, label,
      |      ROW_NUMBER() OVER (PARTITION BY item
      |        ORDER BY COUNT(*) DESC, label) AS r
      |    FROM firstv GROUP BY item, label)
      |  WHERE r = 1),
      |wts AS MATERIALIZED (
      |  SELECT f.annotator,
      |    (1000000 * SUM(CASE WHEN f.label = m.maj_label THEN 1 ELSE 0 END))
      |      // COUNT(*) AS iw
      |  FROM firstv f JOIN maj m USING (item)
      |  GROUP BY f.annotator),
      |revote AS (
      |  SELECT item, label AS ds_label FROM (
      |    SELECT f.item, f.label,
      |      ROW_NUMBER() OVER (PARTITION BY f.item
      |        ORDER BY SUM(w.iw) DESC, f.label) AS r
      |    FROM firstv f JOIN wts w USING (annotator)
      |    GROUP BY f.item, f.label)
      |  WHERE r = 1),
      |nv AS (SELECT item, COUNT(*) AS n_votes FROM firstv GROUP BY item)
      |SELECT n.item, CAST(n.n_votes AS BIGINT) AS n_votes,
      |  m.maj_label, r.ds_label,
      |  CAST(CASE WHEN m.maj_label <> r.ds_label THEN 1 ELSE 0 END
      |    AS BIGINT) AS flipped
      |FROM nv n JOIN maj m USING (item) JOIN revote r USING (item)
      |ORDER BY item""".stripMargin

  /** DuckDB twin of WebPrep.urlQuery (x102): the same planted URL, the
    * same canonicalization ladder in the same order. Every replace
    * carries the 'g' flag (Spark's regexp_replace is always global;
    * DuckDB's defaults to first-match-only) and group references use
    * RE2's `\1` where Spark writes `$1`. */
  private def urlCanonSql: String =
    """WITH planted AS MATERIALIZED (
      |  SELECT doc_id,
      |    (CASE WHEN doc_id % 2 = 0 THEN 'HTTPS://' ELSE 'https://' END) ||
      |    (CASE WHEN doc_id % 3 = 0 THEN 'WWW.' ELSE '' END) ||
      |    source || '.example.com/Docs/' || CAST(doc_id AS VARCHAR) ||
      |    (CASE WHEN doc_id % 7 = 0 THEN '/' ELSE '' END) ||
      |    (CASE WHEN doc_id % 5 = 0
      |      THEN '?utm_source=feed&page=' || CAST(doc_id % 4 AS VARCHAR)
      |      ELSE '' END) ||
      |    (CASE WHEN doc_id % 11 = 0 THEN '#sec2' ELSE '' END) AS url
      |  FROM documents),
      |tidy AS (
      |  SELECT doc_id, url,
      |    regexp_replace(
      |      regexp_replace(
      |        regexp_replace(
      |          regexp_replace(url, '#.*$', '', 'g'),
      |          '([?&])(utm_[A-Za-z0-9_]*|fbclid|gclid)=[^&#]*', '\1', 'g'),
      |        '([?&])&+', '\1', 'g'),
      |      '[?&]$', '', 'g') AS t
      |  FROM planted),
      |hosted AS (
      |  SELECT doc_id, url,
      |    CASE WHEN regexp_matches(t, '^[A-Za-z][A-Za-z0-9+.-]*://')
      |      THEN lower(regexp_extract(t, '^([A-Za-z][A-Za-z0-9+.-]*://[^/]*)', 1))
      |           || regexp_extract(t, '^[A-Za-z][A-Za-z0-9+.-]*://[^/]*(.*)$', 1)
      |      ELSE t END AS h
      |  FROM tidy),
      |canoned AS (
      |  SELECT doc_id, url,
      |    regexp_replace(
      |      regexp_replace(
      |        regexp_replace(h, '^[a-z][a-z0-9+.-]*://', '', 'g'),
      |        '^www\.', '', 'g'),
      |      '(.)/$', '\1', 'g') AS canon
      |  FROM hosted)
      |SELECT doc_id, canon,
      |  regexp_replace(regexp_extract(canon, '^([^/?#]*)', 1), ':[0-9]+$', '', 'g')
      |    AS host,
      |  CAST(CASE WHEN url <> canon THEN 1 ELSE 0 END AS BIGINT) AS changed
      |FROM canoned ORDER BY doc_id""".stripMargin

  /** DuckDB twin of TextAnalysis.scriptMixQuery (x108): the same
    * planted script blocks, the same literal-range character classes
    * (interpolated from the shared constants), the same fixed-order
    * dominance CASE. */
  private def scriptMixSql: String = {
    import TextAnalysis.{LatinRe, CyrillicRe, GreekRe, CjkRe}
    s"""WITH planted AS MATERIALIZED (
       |  SELECT doc_id, text ||
       |    (CASE WHEN doc_id % 4 = 0 THEN ' привет мир да' ELSE '' END) ||
       |    (CASE WHEN doc_id % 6 = 0 THEN ' αβγ δεζ' ELSE '' END) ||
       |    (CASE WHEN doc_id % 9 = 0 THEN ' 你好世界' ELSE '' END) AS text
       |  FROM documents),
       |counted AS (
       |  SELECT doc_id,
       |    CAST(len(regexp_extract_all(text, '$LatinRe')) AS BIGINT) AS n_latin,
       |    CAST(len(regexp_extract_all(text, '$CyrillicRe')) AS BIGINT) AS n_cyrillic,
       |    CAST(len(regexp_extract_all(text, '$GreekRe')) AS BIGINT) AS n_greek,
       |    CAST(len(regexp_extract_all(text, '$CjkRe')) AS BIGINT) AS n_cjk,
       |    CAST(len(regexp_extract_all(text, '[0-9]')) AS BIGINT) AS n_digit
       |  FROM planted)
       |SELECT doc_id, n_latin, n_cyrillic, n_greek, n_cjk, n_digit,
       |  CASE WHEN n_cyrillic > n_latin AND n_cyrillic >= n_greek
       |            AND n_cyrillic >= n_cjk THEN 'cyrillic'
       |       WHEN n_greek > n_latin AND n_greek > n_cyrillic
       |            AND n_greek >= n_cjk THEN 'greek'
       |       WHEN n_cjk > n_latin AND n_cjk > n_cyrillic
       |            AND n_cjk > n_greek THEN 'cjk'
       |       ELSE 'latin' END AS script
       |FROM counted ORDER BY doc_id""".stripMargin
  }

  /** DuckDB twin of DocPrep.waterfallQuery (x107): the x18 gate
    * attribution (same CTEs, same precedence) rolled up per source and
    * stage with token accounting; shared CTEs MATERIALIZED (budget
    * discipline). */
  private def waterfallSql: String =
    """WITH tok AS MATERIALIZED (
      |  SELECT doc_id, source, text,
      |         len(list_filter(string_split(text, ' '), x -> x <> '')) AS n_tokens
      |  FROM documents),
      |keep AS MATERIALIZED (
      |  SELECT text, MIN(doc_id) AS keep_id FROM documents GROUP BY text),
      |toks AS MATERIALIZED (
      |  SELECT doc_id, source, list_filter(string_split(text, ' '), x -> x <> '') AS w
      |  FROM documents),
      |refg AS MATERIALIZED (
      |  SELECT DISTINCT w[g] || ' ' || w[g+1] || ' ' || w[g+2] || ' ' || w[g+3] AS gram
      |  FROM toks, UNNEST(range(1, greatest(len(w) - 2, 1))) AS t(g)
      |  WHERE source IN ('src0', 'src1')),
      |contam AS MATERIALIZED (
      |  SELECT DISTINCT cg.doc_id
      |  FROM (SELECT doc_id, w[g] || ' ' || w[g+1] || ' ' || w[g+2] || ' ' || w[g+3] AS gram
      |        FROM toks, UNNEST(range(1, greatest(len(w) - 2, 1))) AS t(g)
      |        WHERE source NOT IN ('src0', 'src1')) cg
      |  JOIN refg USING (gram)),
      |prep AS (
      |  SELECT t.source, n_tokens,
      |    CASE WHEN source IN ('src0', 'src1') THEN 'reference'
      |         WHEN n_tokens < 40 THEN 'too_short'
      |         WHEN t.doc_id <> k.keep_id THEN 'duplicate'
      |         WHEN c.doc_id IS NOT NULL THEN 'contaminated'
      |         ELSE 'kept' END AS stage
      |  FROM tok t
      |  LEFT JOIN keep k USING (text)
      |  LEFT JOIN contam c ON c.doc_id = t.doc_id)
      |SELECT source, stage, CAST(COUNT(*) AS BIGINT) AS n_docs,
      |  CAST(SUM(n_tokens) AS BIGINT) AS n_tokens
      |FROM prep GROUP BY 1, 2
      |ORDER BY source, stage""".stripMargin

  /** DuckDB twin of TextAnalysis.bpePairsQuery (x109): same word
    * stream (un-deduplicated — BPE weights by occurrence), same
    * adjacent-pair extraction (list_transform over generate_series,
    * char-based substr in both engines), same total order. */
  private def bpePairsSql: String =
    s"""WITH words AS MATERIALIZED (
       |  SELECT unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS w
       |  FROM documents),
       |pairs AS (
       |  SELECT unnest(list_transform(generate_series(1, len(w) - 1),
       |                               i -> substr(w, i, 2))) AS pair
       |  FROM words WHERE len(w) >= 2)
       |SELECT pair, CAST(COUNT(*) AS BIGINT) AS n_pair
       |FROM pairs GROUP BY pair
       |ORDER BY n_pair DESC, pair
       |LIMIT ${TextAnalysis.BpeTopPairs}""".stripMargin

  /** DuckDB twin of Sampling.packAuditQuery (x110): the same integer
    * bit-length capacity (`1 << length(bin(n-1))`, n=1 pinned), exact
    * integer accounting, one double division for efficiency. */
  private def packAuditSql: String =
    """WITH tok AS MATERIALIZED (
      |  SELECT CAST(len(list_filter(string_split(text, ' '), x -> x <> ''))
      |              AS BIGINT) AS n_tokens
      |  FROM documents),
      |b AS (
      |  SELECT n_tokens,
      |    CASE WHEN n_tokens = 1 THEN CAST(1 AS BIGINT)
      |         ELSE (CAST(1 AS BIGINT) << length(bin(n_tokens - 1))) END
      |      AS capacity
      |  FROM tok WHERE n_tokens >= 1)
      |SELECT capacity, CAST(COUNT(*) AS BIGINT) AS n_docs,
      |  CAST(SUM(n_tokens) AS BIGINT) AS n_tokens,
      |  CAST(COUNT(*) * capacity AS BIGINT) AS padded_slots,
      |  CAST(COUNT(*) * capacity - SUM(n_tokens) AS BIGINT) AS padding,
      |  ROUND(CAST(SUM(n_tokens) AS DOUBLE)
      |        / CAST(COUNT(*) * capacity AS DOUBLE), 6) AS efficiency
      |FROM b GROUP BY capacity ORDER BY capacity""".stripMargin

  /** DuckDB twin of Analytics.decayPopularityQuery (x111): the same
    * data-derived reference day, integer day ages, per-event weight
    * pinned at 6 decimals into DECIMAL(18,6), exact decimal sum. */
  private def decayPopSql: String =
    s"""WITH ref AS MATERIALIZED (
       |  SELECT MAX(CAST(ts AS DATE)) AS d1 FROM events WHERE ts IS NOT NULL),
       |w AS (
       |  SELECT event_type,
       |    CAST(ROUND(pow(0.5,
       |      CAST(date_diff('day', CAST(ts AS DATE), d1) AS DOUBLE)
       |        / ${Analytics.DecayHalflifeDays}), 6) AS DECIMAL(18,6)) AS w
       |  FROM events, ref WHERE ts IS NOT NULL)
       |SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_events,
       |  CAST(SUM(w) AS DOUBLE) AS decayed_count
       |FROM w GROUP BY event_type ORDER BY event_type""".stripMargin

  /** DuckDB twin of TextAnalysis.zipfSlopeQuery (x112): same totally-
    * ordered ranks (count desc, term asc), same 6-decimal ln images,
    * exact decimal moments, one closed-form double slope (x80's
    * parenthesization). */
  private def zipfSlopeSql: String =
    s"""WITH words AS MATERIALIZED (
       |  SELECT source,
       |    unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS t
       |  FROM documents),
       |tc AS (SELECT source, t, COUNT(*) AS c FROM words GROUP BY source, t),
       |ranked AS (
       |  SELECT source, c,
       |    row_number() OVER (PARTITION BY source ORDER BY c DESC, t) AS r
       |  FROM tc),
       |xy AS (
       |  SELECT source,
       |    CAST(ROUND(ln(CAST(r AS DOUBLE)), 6) AS DECIMAL(18,6)) AS x,
       |    CAST(ROUND(ln(CAST(c AS DOUBLE)), 6) AS DECIMAL(18,6)) AS y
       |  FROM ranked WHERE r <= ${TextAnalysis.ZipfTopTerms}),
       |m AS (
       |  SELECT source, CAST(COUNT(*) AS BIGINT) AS n_terms,
       |    CAST(SUM(x) AS DOUBLE) AS sx, CAST(SUM(y) AS DOUBLE) AS sy,
       |    CAST(SUM(x * y) AS DOUBLE) AS sxy, CAST(SUM(x * x) AS DOUBLE) AS sxx
       |  FROM xy GROUP BY source)
       |SELECT source, n_terms,
       |  ROUND((CAST(n_terms AS DOUBLE) * sxy - sx * sy)
       |    / nullif(CAST(n_terms AS DOUBLE) * sxx - sx * sx, 0), 6)
       |    AS zipf_slope
       |FROM m ORDER BY source""".stripMargin

  /** DuckDB twin of DocPrep.truncationLossQuery (x113): all-integer
    * token accounting at the shared budget, one double division. */
  private def truncationSql: String =
    s"""WITH tok AS MATERIALIZED (
       |  SELECT source,
       |    CAST(len(list_filter(string_split(text, ' '), x -> x <> ''))
       |         AS BIGINT) AS n
       |  FROM documents)
       |SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
       |  CAST(SUM(CASE WHEN n > ${DocPrep.TruncMaxTokens} THEN 1 ELSE 0 END)
       |       AS BIGINT) AS n_truncated,
       |  CAST(SUM(n) AS BIGINT) AS tokens_total,
       |  CAST(SUM(LEAST(n, ${DocPrep.TruncMaxTokens})) AS BIGINT) AS tokens_kept,
       |  CAST(SUM(n) - SUM(LEAST(n, ${DocPrep.TruncMaxTokens})) AS BIGINT)
       |    AS tokens_dropped,
       |  ROUND(CAST(SUM(n) - SUM(LEAST(n, ${DocPrep.TruncMaxTokens})) AS DOUBLE)
       |        / CAST(SUM(n) AS DOUBLE), 6) AS drop_rate
       |FROM tok GROUP BY source ORDER BY source""".stripMargin

  /** DuckDB twin of WebPrep.linkGraphQuery (x114): the same planted
    * markup, the same href extraction, the same canonicalization
    * ladder and host cut as the x102/x104 twins, edge-grain counts. */
  private def linkGraphSql: String =
    """WITH planted AS MATERIALIZED (
      |  SELECT doc_id, source,
      |    '<p>see <a href="https://src' || CAST((doc_id * 7) % 20 AS VARCHAR) ||
      |    '.example.com/p/' || CAST(doc_id % 13 AS VARCHAR) || '">a</a>' ||
      |    (CASE WHEN doc_id % 3 = 0
      |      THEN '<a href="HTTPS://WWW.src' || CAST((doc_id * 3) % 20 AS VARCHAR)
      |           || '.example.com/q?utm_source=feed&x=1">b</a>' ELSE '' END) ||
      |    (CASE WHEN doc_id % 5 = 0
      |      THEN '<a href="https://hub.example.com/h#frag">c</a>' ELSE '' END) ||
      |    '</p>' AS html
      |  FROM documents),
      |urls AS (
      |  SELECT source || '.example.com' AS src_host,
      |    unnest(regexp_extract_all(html, 'href="([^"]+)"', 1)) AS url
      |  FROM planted),
      |tidy AS (
      |  SELECT src_host,
      |    regexp_replace(
      |      regexp_replace(
      |        regexp_replace(
      |          regexp_replace(url, '#.*$', '', 'g'),
      |          '([?&])(utm_[A-Za-z0-9_]*|fbclid|gclid)=[^&#]*', '\1', 'g'),
      |        '([?&])&+', '\1', 'g'),
      |      '[?&]$', '', 'g') AS t
      |  FROM urls),
      |canoned AS (
      |  SELECT src_host,
      |    regexp_replace(
      |      regexp_replace(
      |        regexp_replace(
      |          CASE WHEN regexp_matches(t, '^[A-Za-z][A-Za-z0-9+.-]*://')
      |            THEN lower(regexp_extract(t, '^([A-Za-z][A-Za-z0-9+.-]*://[^/]*)', 1))
      |                 || regexp_extract(t, '^[A-Za-z][A-Za-z0-9+.-]*://[^/]*(.*)$', 1)
      |            ELSE t END,
      |          '^[a-z][a-z0-9+.-]*://', '', 'g'),
      |        '^www\.', '', 'g'),
      |      '(.)/$', '\1', 'g') AS canon
      |  FROM tidy)
      |SELECT src_host,
      |  regexp_replace(regexp_extract(canon, '^([^/?#]*)', 1), ':[0-9]+$', '', 'g')
      |    AS dst_host,
      |  CAST(COUNT(*) AS BIGINT) AS n_links
      |FROM canoned GROUP BY 1, 2
      |ORDER BY src_host, dst_host""".stripMargin

  /** DuckDB twin of Sampling.splitBalanceQuery (x115): the SAME x19
    * split CASE (shared splitCaseSql — the assignment cannot drift),
    * exact integer marginals, identical closed-form expected /
    * chi-square-term arithmetic (three int->double conversions, two
    * IEEE ops, same parenthesization), round 6. */
  private def splitBalanceSql: String =
    s"""WITH cell AS MATERIALIZED (
       |  SELECT ${splitCaseSql("doc_id")} AS split,
       |    lang, CAST(COUNT(*) AS BIGINT) AS n_docs
       |  FROM documents GROUP BY 1, 2),
       |m AS (
       |  SELECT split, lang, n_docs,
       |    CAST(SUM(n_docs) OVER (PARTITION BY split) AS BIGINT) AS split_total,
       |    CAST(SUM(n_docs) OVER (PARTITION BY lang) AS BIGINT) AS lang_total,
       |    (SELECT CAST(SUM(n_docs) AS BIGINT) FROM cell) AS total
       |  FROM cell)
       |SELECT split, lang, n_docs,
       |  ROUND(CAST(split_total AS DOUBLE) * CAST(lang_total AS DOUBLE)
       |        / CAST(total AS DOUBLE), 6) AS expected,
       |  ROUND((CAST(n_docs AS DOUBLE)
       |          - CAST(split_total AS DOUBLE) * CAST(lang_total AS DOUBLE)
       |            / CAST(total AS DOUBLE))
       |        * (CAST(n_docs AS DOUBLE)
       |          - CAST(split_total AS DOUBLE) * CAST(lang_total AS DOUBLE)
       |            / CAST(total AS DOUBLE))
       |        / (CAST(split_total AS DOUBLE) * CAST(lang_total AS DOUBLE)
       |           / CAST(total AS DOUBLE)), 6) AS chi2_term
       |FROM m ORDER BY split, lang""".stripMargin

  /** DuckDB twin of WebPrep.anchorTextQuery (x116): the same planted
    * anchors, the same whole-tag extraction then per-tag href/text
    * pulls, the x102 ladder + host cut on the destination. */
  private def anchorTextSql: String =
    """WITH planted AS MATERIALIZED (
      |  SELECT doc_id,
      |    '<p><a href="https://src' || CAST((doc_id * 7) % 20 AS VARCHAR) ||
      |    '.example.com/p/' || CAST(doc_id % 13 AS VARCHAR) ||
      |    '">read src' || CAST((doc_id * 7) % 20 AS VARCHAR) ||
      |    ' item ' || CAST(doc_id % 13 AS VARCHAR) || '</a>' ||
      |    (CASE WHEN doc_id % 3 = 0
      |      THEN '<a href="HTTPS://WWW.src' || CAST((doc_id * 3) % 20 AS VARCHAR)
      |           || '.example.com/q?utm_source=x">visit src'
      |           || CAST((doc_id * 3) % 20 AS VARCHAR) || ' now</a>'
      |      ELSE '' END) || '</p>' AS html
      |  FROM documents),
      |anchors AS (
      |  SELECT unnest(regexp_extract_all(html,
      |    '<a href="[^"]*"[^>]*>[^<]*</a>')) AS a
      |  FROM planted),
      |parts AS (
      |  SELECT regexp_extract(a, 'href="([^"]+)"', 1) AS url,
      |    regexp_extract(a, '>([^<]*)</a>', 1) AS atext
      |  FROM anchors),
      |tidy AS (
      |  SELECT atext,
      |    regexp_replace(
      |      regexp_replace(
      |        regexp_replace(
      |          regexp_replace(url, '#.*$', '', 'g'),
      |          '([?&])(utm_[A-Za-z0-9_]*|fbclid|gclid)=[^&#]*', '\1', 'g'),
      |        '([?&])&+', '\1', 'g'),
      |      '[?&]$', '', 'g') AS t
      |  FROM parts),
      |canoned AS (
      |  SELECT atext,
      |    regexp_replace(
      |      regexp_replace(
      |        regexp_replace(
      |          CASE WHEN regexp_matches(t, '^[A-Za-z][A-Za-z0-9+.-]*://')
      |            THEN lower(regexp_extract(t, '^([A-Za-z][A-Za-z0-9+.-]*://[^/]*)', 1))
      |                 || regexp_extract(t, '^[A-Za-z][A-Za-z0-9+.-]*://[^/]*(.*)$', 1)
      |            ELSE t END,
      |          '^[a-z][a-z0-9+.-]*://', '', 'g'),
      |        '^www\.', '', 'g'),
      |      '(.)/$', '\1', 'g') AS canon
      |  FROM tidy),
      |terms AS (
      |  SELECT
      |    regexp_replace(regexp_extract(canon, '^([^/?#]*)', 1),
      |      ':[0-9]+$', '', 'g') AS dst_host,
      |    unnest(list_filter(string_split(atext, ' '), x -> x <> '')) AS term
      |  FROM canoned)
      |SELECT dst_host, term, CAST(COUNT(*) AS BIGINT) AS n_anchors
      |FROM terms GROUP BY 1, 2
      |ORDER BY dst_host, term""".stripMargin

  /** DuckDB twin of Analytics.conversionLagQuery (x117): first-touch
    * min timestamps per side, the same join + direction filter,
    * epoch-second integers (both engines floor the microseconds). */
  private def conversionLagSql: String =
    """WITH f AS MATERIALIZED (
      |  SELECT user_id, MIN(ts) AS t_from FROM events
      |  WHERE event_type = 'view' AND ts IS NOT NULL AND user_id IS NOT NULL
      |  GROUP BY user_id),
      |t AS MATERIALIZED (
      |  SELECT user_id, MIN(ts) AS t_to FROM events
      |  WHERE event_type = 'purchase' AND ts IS NOT NULL AND user_id IS NOT NULL
      |  GROUP BY user_id)
      |SELECT f.user_id,
      |  CAST(floor(epoch(t_from)) AS BIGINT) AS from_sec,
      |  CAST(floor(epoch(t_to)) AS BIGINT) AS to_sec,
      |  CAST(floor(epoch(t_to)) - floor(epoch(t_from)) AS BIGINT) AS lag_sec
      |FROM f JOIN t ON f.user_id = t.user_id
      |WHERE t_to >= t_from
      |ORDER BY f.user_id""".stripMargin

  /** DuckDB twin of TextAnalysis.vocabCoverageQuery (x118): the same
    * totally-ordered ranks and running sums, the same all-integer
    * `cum*100 >= pct*total` cut, one double division at the end. */
  private def vocabCoverageSql: String =
    s"""WITH words AS MATERIALIZED (
       |  SELECT source,
       |    unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS t
       |  FROM documents),
       |tc AS (SELECT source, t, COUNT(*) AS c FROM words GROUP BY source, t),
       |ranked AS (
       |  SELECT source, c,
       |    row_number() OVER (PARTITION BY source ORDER BY c DESC, t) AS r,
       |    SUM(c) OVER (PARTITION BY source ORDER BY c DESC, t
       |                 ROWS UNBOUNDED PRECEDING) AS cum,
       |    SUM(c) OVER (PARTITION BY source) AS total
       |  FROM tc)
       |SELECT source, CAST(COUNT(*) AS BIGINT) AS n_types,
       |  CAST(MIN(total) AS BIGINT) AS n_tokens,
       |  CAST(MIN(CASE WHEN cum * 100 >= ${TextAnalysis.VocabCoverPct} * total
       |                THEN r END) AS BIGINT) AS head_types,
       |  CAST(MIN(CASE WHEN cum * 100 >= ${TextAnalysis.VocabCoverPct} * total
       |                THEN cum END) AS BIGINT) AS head_tokens,
       |  ROUND(CAST(MIN(CASE WHEN cum * 100 >= ${TextAnalysis.VocabCoverPct} * total
       |                  THEN cum END) AS DOUBLE)
       |        / CAST(MIN(total) AS DOUBLE), 6) AS head_share
       |FROM ranked GROUP BY source ORDER BY source""".stripMargin

  /** DuckDB twin of WebPrep.hostReputationQuery (x119): the same
    * planted host, the same all-integer 2*pass >= docs cut. */
  private def hostReputationSql: String =
    s"""WITH scored AS MATERIALIZED (
       |  SELECT doc_id, source || '.example.com' AS host,
       |    CASE WHEN len(list_filter(string_split(text, ' '), x -> x <> ''))
       |           >= ${WebPrep.HostRepMinTokens} THEN 1 ELSE 0 END AS pass
       |  FROM documents),
       |rep AS MATERIALIZED (
       |  SELECT host, CAST(COUNT(*) AS BIGINT) AS host_docs,
       |    CAST(SUM(pass) AS BIGINT) AS host_pass
       |  FROM scored GROUP BY host)
       |SELECT s.doc_id, s.host, r.host_docs, r.host_pass,
       |  CAST(CASE WHEN r.host_pass * 2 >= r.host_docs THEN 1 ELSE 0 END
       |       AS BIGINT) AS admitted
       |FROM scored s JOIN rep r USING (host)
       |ORDER BY s.doc_id""".stripMargin

  /** DuckDB twin of Similarity.hardNegativesQuery (x120): brute-force
    * sims accumulated in DOUBLE (the ::DOUBLE[] cast — DuckDB folds
    * FLOAT lists in float otherwise), the same two-leg (anchor x
    * is_pos) rank window on round(sim, 6) with the nid tie-break
    * (x45/x73 argmax discipline), ids only (x05/x07 discipline). */
  private def hardNegativesSql: String =
    """WITH v AS MATERIALIZED (
      |  SELECT vec_id, label, embedding FROM embeddings WHERE vec_id < 200),
      |sims AS (
      |  SELECT a.vec_id, b.vec_id AS nid, (a.label = b.label) AS is_pos,
      |    ROUND(list_cosine_similarity(a.embedding::DOUBLE[],
      |                                 b.embedding::DOUBLE[]), 6) AS sim
      |  FROM v a JOIN v b ON a.vec_id <> b.vec_id),
      |r AS (
      |  SELECT vec_id, nid, is_pos,
      |    ROW_NUMBER() OVER (PARTITION BY vec_id, is_pos
      |                       ORDER BY sim DESC, nid) AS rk
      |  FROM sims)
      |SELECT vec_id,
      |  MIN(CASE WHEN is_pos THEN nid END) AS pos_id,
      |  MIN(CASE WHEN NOT is_pos THEN nid END) AS neg_id
      |FROM r WHERE rk = 1 GROUP BY vec_id ORDER BY vec_id""".stripMargin

  /** DuckDB twin of TextAnalysis.fertilityQuery (x121): exact integer
    * sums (x10's lexer expression), two double divisions, round 6. */
  private def fertilitySql: String =
    s"""WITH agg AS MATERIALIZED (
       |  SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
       |    CAST(SUM(len(list_filter(string_split(text, ' '), x -> x <> '')))
       |         AS BIGINT) AS n_words,
       |    CAST(SUM(len(regexp_extract_all(text, '${TextAnalysis.tokenPattern}')))
       |         AS BIGINT) AS n_bpe,
       |    CAST(SUM(length(text)) AS BIGINT) AS n_chars
       |  FROM documents GROUP BY lang)
       |SELECT lang, n_docs, n_words, n_bpe, n_chars,
       |  ROUND(CAST(n_bpe AS DOUBLE) / CAST(n_words AS DOUBLE), 6) AS fertility,
       |  ROUND(CAST(n_chars AS DOUBLE) / CAST(n_bpe AS DOUBLE), 6)
       |    AS chars_per_token
       |FROM agg ORDER BY lang""".stripMargin

  /** DuckDB twin of Analytics.cooccurrenceLiftQuery (x122): the same
    * distinct (user, type) frame, unordered pairs, exact supports,
    * identical double-first lift parenthesization. */
  private def cooccurLiftSql: String =
    """WITH ut AS MATERIALIZED (
      |  SELECT DISTINCT user_id, event_type FROM events
      |  WHERE user_id IS NOT NULL AND event_type IS NOT NULL),
      |marg AS MATERIALIZED (
      |  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_t FROM ut GROUP BY 1),
      |tot AS MATERIALIZED (
      |  SELECT CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users FROM ut),
      |pairs AS (
      |  SELECT a.event_type AS type_a, b.event_type AS type_b,
      |    CAST(COUNT(*) AS BIGINT) AS n_ab
      |  FROM ut a JOIN ut b
      |    ON a.user_id = b.user_id AND a.event_type < b.event_type
      |  GROUP BY 1, 2)
      |SELECT type_a, type_b, ma.n_t AS n_a, mb.n_t AS n_b, n_ab,
      |  ROUND(CAST(n_users AS DOUBLE) * CAST(n_ab AS DOUBLE)
      |        / (CAST(ma.n_t AS DOUBLE) * CAST(mb.n_t AS DOUBLE)), 6) AS lift
      |FROM pairs
      |JOIN marg ma ON ma.event_type = type_a
      |JOIN marg mb ON mb.event_type = type_b, tot
      |ORDER BY type_a, type_b""".stripMargin

  /** DuckDB twin of WebPrep.linkDegreesQuery (x123): x114's twin as the
    * edge CTE (the same planted graph), self-loop-free reciprocity via
    * EXISTS on the swapped key. */
  private def linkDegreesSql: String =
    // the edge CTE is concatenated OUTSIDE stripMargin: linkGraphSql has
    // continuation lines that BEGIN with the `||` concat operator, and a
    // second stripMargin pass would eat one pipe ('||' -> '|', a binder
    // error in DuckDB)
    "WITH edges AS MATERIALIZED (\n" +
      linkGraphSql.linesIterator.map("  " + _).mkString("\n") + "\n),\n" +
    """outs AS (
       |  SELECT src_host AS host, CAST(COUNT(*) AS BIGINT) AS out_deg,
       |    CAST(SUM(n_links) AS BIGINT) AS out_links
       |  FROM edges GROUP BY 1),
       |ins AS (
       |  SELECT dst_host AS host, CAST(COUNT(*) AS BIGINT) AS in_deg,
       |    CAST(SUM(n_links) AS BIGINT) AS in_links
       |  FROM edges GROUP BY 1),
       |ks AS MATERIALIZED (
       |  SELECT src_host, dst_host FROM edges WHERE src_host <> dst_host),
       |recip AS (
       |  SELECT k.src_host AS host, CAST(COUNT(*) AS BIGINT) AS recip_deg
       |  FROM ks k
       |  WHERE EXISTS (SELECT 1 FROM ks r
       |                WHERE r.src_host = k.dst_host
       |                  AND r.dst_host = k.src_host)
       |  GROUP BY 1)
       |SELECT COALESCE(o.host, i.host) AS host,
       |  COALESCE(out_deg, CAST(0 AS BIGINT)) AS out_deg,
       |  COALESCE(out_links, CAST(0 AS BIGINT)) AS out_links,
       |  COALESCE(in_deg, CAST(0 AS BIGINT)) AS in_deg,
       |  COALESCE(in_links, CAST(0 AS BIGINT)) AS in_links,
       |  COALESCE(recip_deg, CAST(0 AS BIGINT)) AS recip_deg
       |FROM outs o
       |FULL OUTER JOIN ins i ON o.host = i.host
       |LEFT JOIN recip r ON r.host = COALESCE(o.host, i.host)
       |ORDER BY host""".stripMargin

  /** DuckDB twin of WebPrep.labelPropagationQuery (x138): x114's twin
    * as the edge CTE, the x119 host verdict rebuilt at host grain as
    * seeds, the same symmetrized vote and majority/tie rules. */
  private def labelPropSql: String =
    "WITH edges AS MATERIALIZED (\n" +
      linkGraphSql.linesIterator.map("  " + _).mkString("\n") + "\n),\n" +
    s"""seeds AS MATERIALIZED (
       |  SELECT source || '.example.com' AS host,
       |    CAST(CASE WHEN SUM(CASE WHEN len(list_filter(string_split(text, ' '),
       |                   x -> x <> '')) >= ${WebPrep.HostRepMinTokens}
       |                 THEN 1 ELSE 0 END) * 2 >= COUNT(*)
       |         THEN 1 ELSE 0 END AS BIGINT) AS seed
       |  FROM documents GROUP BY 1),
       |ks AS (
       |  SELECT src_host, dst_host, n_links FROM edges
       |  WHERE src_host <> dst_host),
       |und AS (
       |  SELECT host, nbr, SUM(n_links) AS w FROM (
       |    SELECT src_host AS host, dst_host AS nbr, n_links FROM ks
       |    UNION ALL
       |    SELECT dst_host AS host, src_host AS nbr, n_links FROM ks)
       |  GROUP BY 1, 2),
       |votes AS (
       |  SELECT u.host,
       |    CAST(SUM(CASE WHEN s.seed = 1 THEN u.w ELSE 0 END) AS BIGINT)
       |      AS votes_ok,
       |    CAST(SUM(CASE WHEN s.seed = 0 THEN u.w ELSE 0 END) AS BIGINT)
       |      AS votes_bad
       |  FROM und u LEFT JOIN seeds s ON s.host = u.nbr
       |  GROUP BY 1)
       |SELECT v.host, CAST(COALESCE(s.seed, -1) AS BIGINT) AS seed,
       |  votes_ok, votes_bad,
       |  CAST(CASE WHEN votes_ok > votes_bad THEN 1
       |            WHEN votes_bad > votes_ok THEN 0
       |            ELSE COALESCE(s.seed, -1) END AS BIGINT) AS propagated
       |FROM votes v LEFT JOIN seeds s ON s.host = v.host
       |ORDER BY v.host""".stripMargin

  /** DuckDB twin of WebPrep.triangleQuery (x145): x114's twin as the
    * edge CTE, the same undirected dedup, oriented wedge closure, and
    * corner credit; degree<2 hosts read NULL clustering. */
  private def triangleSql: String =
    "WITH edges AS MATERIALIZED (\n" +
      linkGraphSql.linesIterator.map("  " + _).mkString("\n") + "\n),\n" +
    """und AS MATERIALIZED (
       |  SELECT DISTINCT least(src_host, dst_host) AS a,
       |    greatest(src_host, dst_host) AS b
       |  FROM edges WHERE src_host <> dst_host),
       |deg AS (
       |  SELECT host, CAST(COUNT(*) AS BIGINT) AS degree FROM (
       |    SELECT a AS host FROM und UNION ALL SELECT b AS host FROM und)
       |  GROUP BY 1),
       |tri AS (
       |  SELECT host, CAST(COUNT(*) AS BIGINT) AS n_triangles FROM (
       |    SELECT UNNEST([e1.a, e1.b, e2.b]) AS host
       |    FROM und e1
       |    JOIN und e2 ON e2.a = e1.b
       |    JOIN und e3 ON e3.a = e1.a AND e3.b = e2.b)
       |  GROUP BY 1)
       |SELECT d.host, d.degree,
       |  COALESCE(t.n_triangles, CAST(0 AS BIGINT)) AS n_triangles,
       |  CASE WHEN d.degree >= 2 THEN
       |    ROUND(CAST(2 * COALESCE(t.n_triangles, 0) AS DOUBLE)
       |          / CAST(d.degree * (d.degree - 1) AS DOUBLE), 6)
       |  END AS clustering
       |FROM deg d LEFT JOIN tri t ON t.host = d.host
       |ORDER BY d.host""".stripMargin

  /** DuckDB twin of Dedup.lineDedupQuery (x139): identical 1-based
    * fixed-width line slicing, occurrence-count cut, string_agg ordered
    * by line index (COALESCE'd to '' so the all-dropped doc hashes the
    * empty string like Spark's concat_ws over an empty array). */
  private def lineDedupSql: String = {
    val (lt, min) = (Dedup.LineTokens, Dedup.LineDupMin)
    s"""WITH toks AS MATERIALIZED (
       |  SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS w
       |  FROM documents),
       |lines AS MATERIALIZED (
       |  SELECT doc_id, CAST(i AS BIGINT) AS idx,
       |    array_to_string(w[(i*$lt+1):(i*$lt+$lt)], ' ') AS line
       |  FROM toks,
       |    UNNEST(range(0, CAST(ceil(len(w) / $lt.0) AS BIGINT))) AS t(i)),
       |freq AS MATERIALIZED (
       |  SELECT line, COUNT(*) AS c FROM lines GROUP BY 1),
       |per AS (
       |  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_lines,
       |    CAST(SUM(CASE WHEN c < $min THEN 0 ELSE 1 END) AS BIGINT)
       |      AS n_dropped,
       |    COALESCE(string_agg(CASE WHEN c < $min THEN line END, ' '
       |                        ORDER BY idx), '') AS out
       |  FROM lines JOIN freq USING (line)
       |  GROUP BY doc_id)
       |SELECT d.doc_id,
       |  COALESCE(n_lines, CAST(0 AS BIGINT)) AS n_lines,
       |  COALESCE(n_dropped, CAST(0 AS BIGINT)) AS n_dropped,
       |  CAST(len(list_filter(string_split(COALESCE(out, ''), ' '),
       |                       x -> x <> '')) AS BIGINT) AS n_tokens_kept,
       |  md5(COALESCE(out, '')) AS out_key
       |FROM documents d LEFT JOIN per ON d.doc_id = per.doc_id
       |ORDER BY d.doc_id""".stripMargin
  }

  /** DuckDB twin of DocPrep.mlmMaskQuery (x142): positional tokens,
    * the shared keepAtRate bucket test on 'doc:pos', '[MASK]'
    * substitution, position-ordered string_agg (COALESCE'd to '' for
    * token-less docs, matching Spark's empty concat_ws). */
  private def mlmMaskSql: String = {
    val thresh = DocPrep.MaskRate * Sampling.BucketSpace
    s"""WITH toks AS MATERIALIZED (
       |  SELECT doc_id, CAST(g - 1 AS BIGINT) AS pos, w[g] AS tok
       |  FROM (SELECT doc_id,
       |          list_filter(string_split(text, ' '), x -> x <> '') AS w
       |        FROM documents),
       |    UNNEST(range(1, len(w) + 1)) AS t(g)),
       |m AS (
       |  SELECT doc_id, pos,
       |    CASE WHEN ${bucketSql(
                  "CAST(doc_id AS VARCHAR) || ':' || CAST(pos AS VARCHAR)",
                  "mask")} < $thresh
       |      THEN 1 ELSE 0 END AS msk,
       |    tok
       |  FROM toks),
       |per AS (
       |  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_tokens,
       |    CAST(SUM(msk) AS BIGINT) AS n_masked,
       |    COALESCE(string_agg(CASE WHEN msk = 1 THEN '[MASK]' ELSE tok END,
       |                        ' ' ORDER BY pos), '') AS out
       |  FROM m GROUP BY doc_id)
       |SELECT d.doc_id,
       |  COALESCE(n_tokens, CAST(0 AS BIGINT)) AS n_tokens,
       |  COALESCE(n_masked, CAST(0 AS BIGINT)) AS n_masked,
       |  md5(COALESCE(out, '')) AS masked_key
       |FROM documents d LEFT JOIN per ON d.doc_id = per.doc_id
       |ORDER BY d.doc_id""".stripMargin
  }

  /** DuckDB twin of DocPrep.spanCorruptQuery (x166): positional
    * tokens, the shared keepAtRate bucket test on each token's
    * ALIGNED cell start 'doc:cell', sentinel ordinals via one per-doc
    * running count window, in-span tokens dropped (string_agg skips
    * the NULL pieces). */
  private def spanCorruptSql: String = {
    val l = DocPrep.SpanLen
    val thresh = DocPrep.SpanRate * Sampling.BucketSpace
    s"""WITH toks AS MATERIALIZED (
       |  SELECT doc_id, CAST(g - 1 AS BIGINT) AS pos, w[g] AS tok
       |  FROM (SELECT doc_id,
       |          list_filter(string_split(text, ' '), x -> x <> '') AS w
       |        FROM documents),
       |    UNNEST(range(1, len(w) + 1)) AS t(g)),
       |m AS (
       |  SELECT doc_id, pos, tok,
       |    CASE WHEN ${bucketSql(
                  "CAST(doc_id AS VARCHAR) || ':' || CAST(pos - pos % " + l +
                    " AS VARCHAR)",
                  DocPrep.SpanSalt)} < $thresh
       |      THEN 1 ELSE 0 END AS hit
       |  FROM toks),
       |k AS (
       |  SELECT doc_id, pos, tok, hit,
       |    CASE WHEN hit = 1 AND pos % $l = 0 THEN 1 ELSE 0 END AS st,
       |    SUM(CASE WHEN hit = 1 AND pos % $l = 0 THEN 1 ELSE 0 END)
       |      OVER (PARTITION BY doc_id ORDER BY pos) AS ks
       |  FROM m),
       |per AS (
       |  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_tokens,
       |    CAST(SUM(st) AS BIGINT) AS n_spans,
       |    CAST(SUM(hit) AS BIGINT) AS n_masked,
       |    COALESCE(string_agg(
       |      CASE WHEN st = 1 THEN '<extra_id_' || CAST(ks - 1 AS VARCHAR) || '>'
       |           WHEN hit = 1 THEN NULL ELSE tok END, ' ' ORDER BY pos),
       |      '') AS out
       |  FROM k GROUP BY doc_id)
       |SELECT d.doc_id,
       |  COALESCE(n_tokens, CAST(0 AS BIGINT)) AS n_tokens,
       |  COALESCE(n_spans, CAST(0 AS BIGINT)) AS n_spans,
       |  COALESCE(n_masked, CAST(0 AS BIGINT)) AS n_masked,
       |  md5(COALESCE(out, '')) AS masked_key
       |FROM documents d LEFT JOIN per ON d.doc_id = per.doc_id
       |ORDER BY d.doc_id""".stripMargin
  }

  /** DuckDB twin of Sampling.packManifestQuery (x143): x21's twin
    * arithmetic to pack ids, exclusive prefix-sum offsets, id/offset
    * lists as comma-joined strings in doc_id order. */
  private def packManifestSql: String =
    """WITH t AS (
      |  SELECT doc_id,
      |    CAST(len(list_filter(string_split(text, ' '), x -> x <> ''))
      |         AS BIGINT) AS n_tokens,
      |    doc_id % 32 AS shard
      |  FROM documents),
      |c AS (
      |  SELECT doc_id, n_tokens, shard,
      |    SUM(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id
      |                        ROWS UNBOUNDED PRECEDING) AS cum
      |  FROM t),
      |p AS (
      |  SELECT doc_id, n_tokens,
      |    shard * 1099511627776
      |      + CAST(FLOOR((cum - n_tokens) / 2000.0) AS BIGINT) AS pack_id
      |  FROM c),
      |o AS (
      |  SELECT pack_id, doc_id, n_tokens,
      |    SUM(n_tokens) OVER (PARTITION BY pack_id ORDER BY doc_id
      |                        ROWS UNBOUNDED PRECEDING) - n_tokens AS off
      |  FROM p)
      |SELECT pack_id, CAST(COUNT(*) AS BIGINT) AS n_docs,
      |  CAST(SUM(n_tokens) AS BIGINT) AS pack_tokens,
      |  string_agg(CAST(doc_id AS VARCHAR), ',' ORDER BY doc_id) AS doc_ids,
      |  string_agg(CAST(off AS VARCHAR), ',' ORDER BY doc_id) AS offsets
      |FROM o GROUP BY pack_id ORDER BY pack_id""".stripMargin

  /** DuckDB twin of WebPrep.robotsGateQuery (x124): the x104 plant and
    * ladder, the rule VALUES generated from the SAME RobotsRules
    * constant, host-equality + starts_with prefix match, lexicographic
    * MAX = longest matching prefix (matching prefixes are nested). */
  private def robotsGateSql: String = {
    val ruleRows = WebPrep.RobotsRules
      .map { case (h, p) => s"('$h', '$p')" }.mkString(", ")
    s"""WITH planted AS MATERIALIZED (
       |  SELECT doc_id,
       |    (CASE WHEN doc_id % 2 = 0 THEN 'HTTPS://' ELSE 'https://' END) ||
       |    (CASE WHEN doc_id % 3 = 0 THEN 'WWW.' ELSE '' END) ||
       |    source || '.example.com/p/' || CAST(doc_id % 23 AS VARCHAR) ||
       |    (CASE WHEN doc_id % 5 = 0 THEN '?utm_source=feed' ELSE '' END) ||
       |    (CASE WHEN doc_id % 11 = 0 THEN '#sec2' ELSE '' END) AS url
       |  FROM documents),
       |tidy AS (
       |  SELECT doc_id,
       |    regexp_replace(
       |      regexp_replace(
       |        regexp_replace(
       |          regexp_replace(url, '#.*$$', '', 'g'),
       |          '([?&])(utm_[A-Za-z0-9_]*|fbclid|gclid)=[^&#]*', '\\1', 'g'),
       |        '([?&])&+', '\\1', 'g'),
       |      '[?&]$$', '', 'g') AS t
       |  FROM planted),
       |canoned AS MATERIALIZED (
       |  SELECT doc_id,
       |    regexp_replace(
       |      regexp_replace(
       |        regexp_replace(
       |          CASE WHEN regexp_matches(t, '^[A-Za-z][A-Za-z0-9+.-]*://')
       |            THEN lower(regexp_extract(t, '^([A-Za-z][A-Za-z0-9+.-]*://[^/]*)', 1))
       |                 || regexp_extract(t, '^[A-Za-z][A-Za-z0-9+.-]*://[^/]*(.*)$$', 1)
       |            ELSE t END,
       |          '^[a-z][a-z0-9+.-]*://', '', 'g'),
       |        '^www\\.', '', 'g'),
       |      '(.)/$$', '\\1', 'g') AS canon
       |  FROM tidy),
       |c2 AS (
       |  SELECT doc_id, canon,
       |    regexp_replace(regexp_extract(canon, '^([^/?#]*)', 1),
       |      ':[0-9]+$$', '', 'g') AS host,
       |    regexp_extract(canon, '(/.*)$$', 1) AS path
       |  FROM canoned),
       |rules(host, path_prefix) AS (VALUES $ruleRows),
       |m AS (
       |  SELECT c.doc_id, c.canon, c.host, MAX(r.path_prefix) AS matched_prefix
       |  FROM c2 c LEFT JOIN rules r
       |    ON r.host = c.host AND starts_with(c.path, r.path_prefix)
       |  GROUP BY 1, 2, 3)
       |SELECT doc_id, canon, host, matched_prefix,
       |  CAST(CASE WHEN matched_prefix IS NULL THEN 1 ELSE 0 END AS BIGINT)
       |    AS admitted
       |FROM m ORDER BY doc_id""".stripMargin
  }

  /** DuckDB twin of Analytics.dialogAuditQuery (x125): the same total
    * (ts, event_id) lag order, floored-epoch span. */
  private def dialogAuditSql: String =
    """WITH ev AS MATERIALIZED (
      |  SELECT user_id AS thread_id, event_type AS role, ts, event_id
      |  FROM events
      |  WHERE user_id IS NOT NULL AND ts IS NOT NULL
      |    AND event_type IS NOT NULL),
      |lagged AS (
      |  SELECT thread_id, role, ts,
      |    lag(role) OVER (PARTITION BY thread_id ORDER BY ts, event_id)
      |      AS prev_role
      |  FROM ev)
      |SELECT thread_id, CAST(COUNT(*) AS BIGINT) AS n_turns,
      |  CAST(COUNT(DISTINCT role) AS BIGINT) AS n_roles,
      |  CAST(SUM(CASE WHEN role = prev_role THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_breaks,
      |  CAST(floor(epoch(MAX(ts))) - floor(epoch(MIN(ts))) AS BIGINT)
      |    AS span_sec
      |FROM lagged GROUP BY thread_id ORDER BY thread_id""".stripMargin

  /** DuckDB twin of Analytics.rateBurstsQuery (x126): exact integer
    * bucket counts and moments, the identical closed-form z (x80's
    * parenthesization), round 6, the same round-then-compare burst
    * flag. */
  private def rateBurstsSql: String =
    s"""WITH b AS MATERIALIZED (
       |  SELECT event_type,
       |    CAST(floor(epoch(date_trunc('hour', ts))) AS BIGINT) AS hour_sec,
       |    CAST(COUNT(*) AS BIGINT) AS c
       |  FROM events WHERE ts IS NOT NULL GROUP BY 1, 2),
       |m AS MATERIALIZED (
       |  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
       |    CAST(SUM(c) AS BIGINT) AS sc, CAST(SUM(c * c) AS BIGINT) AS scc
       |  FROM b GROUP BY 1),
       |j AS (
       |  SELECT b.event_type, hour_sec, c,
       |    ROUND((CAST(c AS DOUBLE) - CAST(sc AS DOUBLE) / CAST(n AS DOUBLE))
       |      / nullif(sqrt((CAST(n AS DOUBLE) * CAST(scc AS DOUBLE)
       |                     - CAST(sc AS DOUBLE) * CAST(sc AS DOUBLE))
       |                    / nullif(CAST(n AS DOUBLE)
       |                             * (CAST(n AS DOUBLE) - 1), 0)), 0), 6) AS z
       |  FROM b JOIN m ON m.event_type = b.event_type)
       |SELECT event_type, hour_sec, c, z,
       |  CAST(CASE WHEN z >= ${Analytics.BurstZ} THEN 1 ELSE 0 END AS BIGINT)
       |    AS burst
       |FROM j ORDER BY event_type, hour_sec""".stripMargin

  /** DuckDB twin of Sampling.ksSplitAuditQuery (x127): the shared x19
    * split CASE, exact cumulative counts over a total length order,
    * identical double ECDF-gap tree, order-free MAX, round 6. */
  private def ksAuditSql: String =
    s"""WITH tagged AS MATERIALIZED (
       |  SELECT source, ${splitCaseSql("doc_id")} AS split,
       |    CAST(len(list_filter(string_split(text, ' '), x -> x <> ''))
       |         AS BIGINT) AS len
       |  FROM documents),
       |f AS (
       |  SELECT source, len,
       |    SUM(CASE WHEN split = 'train' THEN 1 ELSE 0 END) AS c1,
       |    SUM(CASE WHEN split = 'val' THEN 1 ELSE 0 END) AS c2
       |  FROM tagged WHERE split IN ('train', 'val') GROUP BY 1, 2),
       |cum AS (
       |  SELECT source,
       |    SUM(c1) OVER (PARTITION BY source ORDER BY len
       |                  ROWS UNBOUNDED PRECEDING) AS cum1,
       |    SUM(c2) OVER (PARTITION BY source ORDER BY len
       |                  ROWS UNBOUNDED PRECEDING) AS cum2,
       |    SUM(c1) OVER (PARTITION BY source) AS n1,
       |    SUM(c2) OVER (PARTITION BY source) AS n2
       |  FROM f)
       |SELECT source, CAST(MIN(n1) AS BIGINT) AS n_train,
       |  CAST(MIN(n2) AS BIGINT) AS n_val,
       |  ROUND(MAX(ABS(
       |    CAST(cum1 AS DOUBLE) / NULLIF(CAST(n1 AS DOUBLE), 0)
       |    - CAST(cum2 AS DOUBLE) / NULLIF(CAST(n2 AS DOUBLE), 0))), 6) AS ks
       |FROM cum GROUP BY source ORDER BY source""".stripMargin

  /** DuckDB twin of Sampling.psiSplitAuditQuery (x128): the x110 bucket
    * expression, +1 Laplace smoothing over the source's observed
    * buckets, per-bucket term pinned at 6 into DECIMAL(18,6) with the
    * identical (p−q)·round6(ln(p/q)) tree, exact decimal sum. */
  private def psiDriftSql: String =
    s"""WITH tagged AS MATERIALIZED (
       |  SELECT source, ${splitCaseSql("doc_id")} AS split,
       |    CAST(len(list_filter(string_split(text, ' '), x -> x <> ''))
       |         AS BIGINT) AS len
       |  FROM documents),
       |b AS (
       |  SELECT source,
       |    CASE WHEN len = 1 THEN CAST(1 AS BIGINT)
       |         ELSE (CAST(1 AS BIGINT) << length(bin(len - 1))) END AS bucket,
       |    SUM(CASE WHEN split = 'train' THEN 1 ELSE 0 END) AS c1,
       |    SUM(CASE WHEN split = 'val' THEN 1 ELSE 0 END) AS c2
       |  FROM tagged WHERE split IN ('train', 'val') AND len >= 1
       |  GROUP BY 1, 2),
       |w AS (
       |  SELECT source, c1, c2,
       |    SUM(c1) OVER (PARTITION BY source) AS n1,
       |    SUM(c2) OVER (PARTITION BY source) AS n2,
       |    COUNT(*) OVER (PARTITION BY source) AS nb
       |  FROM b),
       |t AS (
       |  SELECT source, n1, n2, nb,
       |    CAST(ROUND((CAST(c1 + 1 AS DOUBLE) / CAST(n1 + nb AS DOUBLE)
       |                - CAST(c2 + 1 AS DOUBLE) / CAST(n2 + nb AS DOUBLE))
       |      * ROUND(ln((CAST(c1 + 1 AS DOUBLE) / CAST(n1 + nb AS DOUBLE))
       |                 / (CAST(c2 + 1 AS DOUBLE) / CAST(n2 + nb AS DOUBLE))),
       |              6), 6) AS DECIMAL(18,6)) AS term
       |  FROM w)
       |SELECT source, CAST(MIN(n1) AS BIGINT) AS n_train,
       |  CAST(MIN(n2) AS BIGINT) AS n_val,
       |  CAST(MIN(nb) AS BIGINT) AS n_buckets,
       |  CAST(SUM(term) AS DOUBLE) AS psi
       |FROM t GROUP BY source ORDER BY source""".stripMargin

  /** DuckDB twin of Sampling.snapshotPsiQuery (x130): the x88 snapshot
    * plant, the x128 PSI arithmetic verbatim (shared psiCore on the
    * Spark side; shared term/window shape here). */
  private def snapshotPsiSql: String =
    """WITH w AS MATERIALIZED (
      |  SELECT doc_id, source,
      |    list_filter(string_split(text, ' '), x -> x <> '') AS w
      |  FROM documents),
      |tagged AS MATERIALIZED (
      |  SELECT source, TRUE AS is_a,
      |    CAST(CASE WHEN doc_id % 23 = 0 THEN greatest(len(w) - 1, 0)
      |              ELSE len(w) END AS BIGINT) AS len
      |  FROM w WHERE doc_id % 17 <> 0
      |  UNION ALL
      |  SELECT source, FALSE AS is_a, CAST(len(w) AS BIGINT) AS len
      |  FROM w WHERE doc_id % 19 <> 0),
      |b AS (
      |  SELECT source,
      |    CASE WHEN len = 1 THEN CAST(1 AS BIGINT)
      |         ELSE (CAST(1 AS BIGINT) << length(bin(len - 1))) END AS bucket,
      |    SUM(CASE WHEN is_a THEN 1 ELSE 0 END) AS c1,
      |    SUM(CASE WHEN NOT is_a THEN 1 ELSE 0 END) AS c2
      |  FROM tagged WHERE len >= 1 GROUP BY 1, 2),
      |ww AS (
      |  SELECT source, c1, c2,
      |    SUM(c1) OVER (PARTITION BY source) AS n1,
      |    SUM(c2) OVER (PARTITION BY source) AS n2,
      |    COUNT(*) OVER (PARTITION BY source) AS nb
      |  FROM b),
      |t AS (
      |  SELECT source, n1, n2, nb,
      |    CAST(ROUND((CAST(c1 + 1 AS DOUBLE) / CAST(n1 + nb AS DOUBLE)
      |                - CAST(c2 + 1 AS DOUBLE) / CAST(n2 + nb AS DOUBLE))
      |      * ROUND(ln((CAST(c1 + 1 AS DOUBLE) / CAST(n1 + nb AS DOUBLE))
      |                 / (CAST(c2 + 1 AS DOUBLE) / CAST(n2 + nb AS DOUBLE))),
      |              6), 6) AS DECIMAL(18,6)) AS term
      |  FROM ww)
      |SELECT source, CAST(MIN(n1) AS BIGINT) AS n_old,
      |  CAST(MIN(n2) AS BIGINT) AS n_new,
      |  CAST(MIN(nb) AS BIGINT) AS n_buckets,
      |  CAST(SUM(term) AS DOUBLE) AS psi
      |FROM t GROUP BY source ORDER BY source""".stripMargin

  /** DuckDB twin of SkewTools.skewProfileQuery (x131): per-key counts,
    * quantile_cont through DECIMAL(18,4) (the x28 percentile idiom),
    * identical three-conversion skew tree. */
  private def skewProfileSql: String = {
    def one(table: String, key: String) =
      s"""SELECT '$table.$key' AS key_name,
         |    CAST(COUNT(*) AS BIGINT) AS n_keys,
         |    CAST(SUM(c) AS BIGINT) AS n_rows,
         |    CAST(MAX(c) AS BIGINT) AS max_c,
         |    CAST(CAST(quantile_cont(c, 0.5) AS DECIMAL(18,4)) AS DOUBLE) AS p50_c,
         |    CAST(CAST(quantile_cont(c, 0.99) AS DECIMAL(18,4)) AS DOUBLE) AS p99_c
         |  FROM (SELECT $key, COUNT(*) AS c FROM $table GROUP BY 1)""".stripMargin
    s"""WITH u AS (
       |  ${one("lineitem", "l_orderkey")}
       |  UNION ALL
       |  ${one("orders", "o_custkey")})
       |SELECT key_name, n_keys, n_rows, max_c, p50_c, p99_c,
       |  ROUND(CAST(max_c AS DOUBLE) * CAST(n_keys AS DOUBLE)
       |        / CAST(n_rows AS DOUBLE), 6) AS skew
       |FROM u ORDER BY key_name""".stripMargin
  }

  /** DuckDB twin of Sampling.exactSplitQuery (x132): the same
    * (bucket, doc_id) total rank, the same integer floor thresholds
    * (DuckDB // = Spark div). */
  private def exactSplitSql: String = {
    val bucket = bucketSql("doc_id::VARCHAR", "graft")
    s"""WITH r AS MATERIALIZED (
       |  SELECT doc_id, source,
       |    row_number() OVER (PARTITION BY source
       |                       ORDER BY $bucket, doc_id) AS r,
       |    COUNT(*) OVER (PARTITION BY source) AS n
       |  FROM documents)
       |SELECT doc_id, source,
       |  CASE WHEN r <= n * 8 // 10 THEN 'train'
       |       WHEN r <= n * 9 // 10 THEN 'val'
       |       ELSE 'test' END AS split
       |FROM r ORDER BY doc_id""".stripMargin
  }

  /** DuckDB twin of Sampling.splitDiversityQuery (x135): the shared
    * x19 split CASE, the x81/x82 pinned-ln decimal dot product. */
  private def splitDiversitySql: String =
    s"""WITH cell AS MATERIALIZED (
       |  SELECT ${splitCaseSql("doc_id")} AS split,
       |    source, CAST(COUNT(*) AS BIGINT) AS c
       |  FROM documents GROUP BY 1, 2),
       |t AS (
       |  SELECT split, c,
       |    SUM(c) OVER (PARTITION BY split) AS n,
       |    CAST(ROUND(ln(CAST(SUM(c) OVER (PARTITION BY split) AS DOUBLE)
       |                  / CAST(c AS DOUBLE)), 6) AS DECIMAL(18,6)) AS lp
       |  FROM cell)
       |SELECT split, CAST(MIN(n) AS BIGINT) AS n_docs,
       |  CAST(COUNT(*) AS BIGINT) AS n_sources,
       |  CAST(SUM(c * lp) AS DOUBLE) / CAST(MIN(n) AS BIGINT) AS entropy
       |FROM t GROUP BY split ORDER BY split""".stripMargin

  /** DuckDB twin of Dedup.dedupIncrQuery (x106): the same planted
    * batch (echo of doc id−400, shared synthetic family), the corpus
    * index rebuilt in SQL (min keeper per distinct text below the
    * split), identical corpus-wins-then-batch-min keeper rule. Joins
    * are IS NOT DISTINCT FROM, mirroring the Spark face's null-safe
    * `<=>`: a NULL-text doc forms its own dup family instead of being
    * dropped at the inner bk join. */
  private def dedupIncrSql: String =
    s"""WITH base AS MATERIALIZED (SELECT doc_id, text FROM documents),
       |batch AS MATERIALIZED (
       |  SELECT b.doc_id,
       |    CASE WHEN b.doc_id % 3 = 0 THEN e.text
       |         WHEN b.doc_id % 7 = 0
       |           THEN 'novel shared batch text ' || CAST(b.doc_id % 2 AS VARCHAR)
       |         ELSE b.text END AS text
       |  FROM base b LEFT JOIN base e
       |    ON e.doc_id = b.doc_id - ${Dedup.DedupSplitId}
       |  WHERE b.doc_id >= ${Dedup.DedupSplitId}),
       |idx AS MATERIALIZED (
       |  SELECT text, MIN(doc_id) AS corpus_keep FROM base
       |  WHERE doc_id < ${Dedup.DedupSplitId} GROUP BY text),
       |bk AS MATERIALIZED (
       |  SELECT text, MIN(doc_id) AS batch_keep FROM batch GROUP BY text)
       |SELECT t.doc_id,
       |  COALESCE(i.corpus_keep, k.batch_keep) AS keep_id,
       |  CAST(CASE WHEN t.doc_id <> COALESCE(i.corpus_keep, k.batch_keep)
       |       THEN 1 ELSE 0 END AS BIGINT) AS dup,
       |  CAST(CASE WHEN i.corpus_keep IS NULL AND t.doc_id = k.batch_keep
       |       THEN 1 ELSE 0 END AS BIGINT) AS novel
       |FROM batch t
       |LEFT JOIN idx i ON i.text IS NOT DISTINCT FROM t.text
       |JOIN bk k ON k.text IS NOT DISTINCT FROM t.text
       |ORDER BY t.doc_id""".stripMargin

  /** DuckDB twin of WebPrep.urlDedupQuery (x104): the same colliding
    * plant (path = doc_id mod 23), the same canonicalization ladder,
    * min-keeper per canonical key. */
  private def urlDedupSql: String =
    """WITH planted AS MATERIALIZED (
      |  SELECT doc_id,
      |    (CASE WHEN doc_id % 2 = 0 THEN 'HTTPS://' ELSE 'https://' END) ||
      |    (CASE WHEN doc_id % 3 = 0 THEN 'WWW.' ELSE '' END) ||
      |    source || '.example.com/p/' || CAST(doc_id % 23 AS VARCHAR) ||
      |    (CASE WHEN doc_id % 5 = 0 THEN '?utm_source=feed' ELSE '' END) ||
      |    (CASE WHEN doc_id % 11 = 0 THEN '#sec2' ELSE '' END) AS url
      |  FROM documents),
      |tidy AS (
      |  SELECT doc_id,
      |    regexp_replace(
      |      regexp_replace(
      |        regexp_replace(
      |          regexp_replace(url, '#.*$', '', 'g'),
      |          '([?&])(utm_[A-Za-z0-9_]*|fbclid|gclid)=[^&#]*', '\1', 'g'),
      |        '([?&])&+', '\1', 'g'),
      |      '[?&]$', '', 'g') AS t
      |  FROM planted),
      |canoned AS MATERIALIZED (
      |  SELECT doc_id,
      |    regexp_replace(
      |      regexp_replace(
      |        regexp_replace(
      |          CASE WHEN regexp_matches(t, '^[A-Za-z][A-Za-z0-9+.-]*://')
      |            THEN lower(regexp_extract(t, '^([A-Za-z][A-Za-z0-9+.-]*://[^/]*)', 1))
      |                 || regexp_extract(t, '^[A-Za-z][A-Za-z0-9+.-]*://[^/]*(.*)$', 1)
      |            ELSE t END,
      |          '^[a-z][a-z0-9+.-]*://', '', 'g'),
      |        '^www\.', '', 'g'),
      |      '(.)/$', '\1', 'g') AS canon
      |  FROM tidy)
      |SELECT c.doc_id, c.canon, k.keep_id,
      |  CAST(CASE WHEN c.doc_id <> k.keep_id THEN 1 ELSE 0 END AS BIGINT)
      |    AS dup
      |FROM canoned c
      |JOIN (SELECT canon, MIN(doc_id) AS keep_id FROM canoned GROUP BY canon) k
      |  USING (canon)
      |ORDER BY doc_id""".stripMargin

  /** DuckDB twin of Analytics.krippendorffQuery (x105): identical
    * aggregates; the Do term rounds to 6 decimals and sums as
    * DECIMAL(18,6) (x82's order-independent discipline), De is pure
    * BIGINT, and alpha's final two-division/one-subtraction DOUBLE
    * image spells the same parenthesization as the Spark face. */
  private def krippSql: String =
    """WITH votes AS MATERIALIZED (
      |  SELECT user_id % 7 AS annotator, event_id % 500 AS item,
      |    event_type AS label, event_id AS vote_id
      |  FROM events
      |  WHERE event_type IS NOT NULL AND user_id IS NOT NULL),
      |firstv AS MATERIALIZED (
      |  SELECT item, annotator, arg_min(label, vote_id) AS label
      |  FROM votes GROUP BY 1, 2),
      |byil AS MATERIALIZED (
      |  SELECT item, label, COUNT(*) AS n_il FROM firstv GROUP BY 1, 2),
      |byi AS MATERIALIZED (
      |  SELECT item, SUM(n_il) AS n_i FROM byil GROUP BY 1
      |  HAVING SUM(n_il) >= 2),
      |il AS MATERIALIZED (
      |  SELECT b.item, b.label, b.n_il, i.n_i FROM byil b JOIN byi i USING (item)),
      |dosum AS (
      |  SELECT SUM(CAST(round(CAST(n_il * (n_i - n_il) AS DOUBLE)
      |                          / CAST(n_i - 1 AS DOUBLE), 6)
      |               AS DECIMAL(18,6))) AS do_sum
      |  FROM il),
      |tot AS (SELECT CAST(SUM(n_i) AS BIGINT) AS n,
      |               CAST(COUNT(*) AS BIGINT) AS n_items FROM byi),
      |denum AS (
      |  SELECT CAST(SUM(n_l * (n - n_l)) AS BIGINT) AS de_num, n, n_items
      |  FROM (SELECT label, SUM(n_il) AS n_l FROM il GROUP BY label)
      |       CROSS JOIN tot
      |  GROUP BY n, n_items)
      |SELECT n, n_items,
      |  round(1.0 - (CAST(do_sum AS DOUBLE) / CAST(n AS DOUBLE))
      |              / (CAST(de_num AS DOUBLE)
      |                 / CAST(n * (n - 1) AS DOUBLE)), 6) AS alpha
      |FROM denum CROSS JOIN dosum
      |ORDER BY n""".stripMargin

  /** DuckDB twin of WebPrep.markupQuery (x103): identical planted
    * markup, identical tag-strip + whitespace-collapse image, title
    * group extract, link count via len(regexp_extract_all). */
  private def markupSql: String =
    """WITH planted AS MATERIALIZED (
      |  SELECT doc_id,
      |    '<html><head><title>Doc ' || CAST(doc_id AS VARCHAR) ||
      |    '</title></head><body><p>' || text || '</p>' ||
      |    (CASE WHEN doc_id % 3 = 0 THEN '<a href="/x">x</a>' ELSE '' END) ||
      |    (CASE WHEN doc_id % 9 = 0 THEN '<a href="/y">y</a>' ELSE '' END) ||
      |    '</body></html>' AS html
      |  FROM documents),
      |s AS (
      |  SELECT doc_id, html,
      |    trim(regexp_replace(regexp_replace(html, '<[^>]*>', ' ', 'g'),
      |      '\s+', ' ', 'g')) AS text
      |  FROM planted)
      |SELECT doc_id,
      |  regexp_extract(html, '<title>([^<]*)</title>', 1) AS title,
      |  CAST(len(regexp_extract_all(html, '<a ')) AS BIGINT) AS n_links,
      |  text, CAST(length(text) AS BIGINT) AS clean_len
      |FROM s ORDER BY doc_id""".stripMargin

  /** DuckDB twin of Dedup.editPairsQuery (x100): the same canonical
    * prefix (NFC + lower + whitespace collapse + trim, then the first
    * EditPrefix chars), the same sorted-neighborhood candidate frame
    * (x64's), levenshtein over the prefixes with the same integer
    * accept test. Distance and lengths are symmetric, so pa/pb
    * orientation (rank order here, id order in Spark) cannot differ. */
  private def editPairsSql: String =
    s"""WITH norm AS MATERIALIZED (
       |  SELECT doc_id,
       |    substr(trim(regexp_replace(lower(nfc_normalize(text)),
       |      '\\s+', ' ', 'g')), 1, ${Dedup.EditPrefix}) AS pfx
       |  FROM documents),
       |ranked AS MATERIALIZED (
       |  SELECT doc_id, pfx,
       |    ROW_NUMBER() OVER (ORDER BY pfx, doc_id) AS rk
       |  FROM norm)
       |SELECT least(a.doc_id, b.doc_id) AS d1,
       |  greatest(a.doc_id, b.doc_id) AS d2,
       |  CAST(levenshtein(a.pfx, b.pfx) AS BIGINT) AS dist,
       |  CAST(CASE WHEN levenshtein(a.pfx, b.pfx) * 10
       |         <= greatest(length(a.pfx), length(b.pfx))
       |       THEN 1 ELSE 0 END AS BIGINT) AS near
       |FROM ranked a JOIN ranked b
       |  ON b.rk - a.rk BETWEEN 1 AND ${Dedup.SnmWindow - 1}
       |ORDER BY d1, d2""".stripMargin

  /** DuckDB twin of TextSearch.hybridQuery (x137): the lexical leg's
    * distinct-3gram intersection counts, the vector leg's cosine in
    * DOUBLE accumulation rounded at 6 (the x120 discipline), the same
    * integer rank windows, each RRF term one rounded division pinned
    * into DECIMAL(18,6), exact decimal fusion sum, rank INT (x05). */
  private def hybridRrfSql: String = {
    val (rrfK, legK, topK, qMax) = (TextSearch.RrfK, TextSearch.HybridLegK,
      TextSearch.HybridTopK, TextSearch.HybridQueryMax)
    s"""WITH toks AS MATERIALIZED (
       |  SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS w
       |  FROM documents),
       |dg AS MATERIALIZED (
       |  SELECT DISTINCT doc_id, w[g] || ' ' || w[g+1] || ' ' || w[g+2] AS gram
       |  FROM toks, UNNEST(range(1, greatest(len(w) - 1, 1))) AS t(g)),
       |qg AS MATERIALIZED (
       |  SELECT doc_id AS query_id, gram FROM dg WHERE doc_id < $qMax),
       |lexinter AS (
       |  SELECT q.query_id, d.doc_id, COUNT(*) AS inter
       |  FROM qg q JOIN dg d USING (gram)
       |  WHERE d.doc_id <> q.query_id
       |  GROUP BY 1, 2),
       |lex AS (
       |  SELECT query_id, doc_id, r FROM (
       |    SELECT query_id, doc_id,
       |      ROW_NUMBER() OVER (PARTITION BY query_id
       |                         ORDER BY inter DESC, doc_id) AS r
       |    FROM lexinter) WHERE r <= $legK),
       |sims AS (
       |  SELECT q.vec_id AS query_id, v.vec_id AS doc_id,
       |    ROUND(list_cosine_similarity(q.embedding::DOUBLE[],
       |                                 v.embedding::DOUBLE[]), 6) AS sim
       |  FROM embeddings q JOIN embeddings v
       |    ON q.vec_id < $qMax AND v.vec_id <> q.vec_id),
       |vec AS (
       |  SELECT query_id, doc_id, r FROM (
       |    SELECT query_id, doc_id,
       |      ROW_NUMBER() OVER (PARTITION BY query_id
       |                         ORDER BY sim DESC, doc_id) AS r
       |    FROM sims) WHERE r <= $legK),
       |fused AS (
       |  SELECT query_id, doc_id,
       |    CAST(SUM(CAST(ROUND(1.0 / CAST($rrfK + r AS DOUBLE), 6)
       |                  AS DECIMAL(18,6))) AS DOUBLE) AS score
       |  FROM (SELECT * FROM lex UNION ALL SELECT * FROM vec)
       |  GROUP BY 1, 2)
       |SELECT query_id, doc_id, score,
       |  CAST("rank" AS INT) AS "rank"
       |FROM (
       |  SELECT query_id, doc_id, score,
       |    ROW_NUMBER() OVER (PARTITION BY query_id
       |                       ORDER BY score DESC, doc_id) AS "rank"
       |  FROM fused)
       |WHERE "rank" <= $topK ORDER BY query_id, "rank"""".stripMargin
  }

  /** DuckDB twin of TextAnalysis.gopherQuery (x147): same integer
    * gates, same shared constants. */
  private def gopherSql: String = {
    val stops = TextAnalysis.GopherStops.map(s => s"'$s'").mkString(", ")
    s"""WITH t AS MATERIALIZED (
       |  SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS w,
       |    CAST(length(replace(text, ' ', '')) AS BIGINT) AS n_chars
       |  FROM documents),
       |m AS MATERIALIZED (
       |  SELECT doc_id, CAST(len(w) AS BIGINT) AS n_tokens, n_chars,
       |    CAST(len(list_filter(w, x -> regexp_matches(x, '[A-Za-z]'))) AS BIGINT) AS n_alpha,
       |    CAST(len(list_intersect(list_distinct(w), [$stops])) AS BIGINT) AS n_stop
       |  FROM t)
       |SELECT doc_id, n_tokens, n_chars, n_alpha, n_stop,
       |  CAST(CASE WHEN n_tokens BETWEEN ${TextAnalysis.GopherMinTokens}
       |                 AND ${TextAnalysis.GopherMaxTokens}
       |            AND 3 * n_tokens <= n_chars AND n_chars <= 10 * n_tokens
       |            AND 5 * n_alpha >= 4 * n_tokens
       |            AND n_stop >= 2 THEN 1 ELSE 0 END AS BIGINT) AS admitted
       |FROM m ORDER BY doc_id""".stripMargin
  }

  /** DuckDB twin of TextAnalysis.readabilityQuery (x148): vowel-group
    * syllables, [.!?]+ sentences, round-at-6 ratios; every constant
    * ::DOUBLE so DuckDB's decimal-literal default cannot change the
    * arithmetic. */
  private def readabilitySql: String =
    """WITH m AS MATERIALIZED (
      |  SELECT doc_id,
      |    CAST(len(list_filter(string_split(text, ' '), x -> x <> '')) AS BIGINT) AS n_words,
      |    CAST(greatest(len(regexp_extract_all(text, '[.!?]+')), 1) AS BIGINT) AS n_sentences,
      |    CAST(len(regexp_extract_all(lower(text), '[aeiouy]+')) AS BIGINT) AS n_syllables
      |  FROM documents)
      |SELECT doc_id, n_words, n_sentences, n_syllables,
      |  CASE WHEN n_words > 0 THEN
      |    ROUND(206.835::DOUBLE
      |      - 1.015::DOUBLE * ROUND(CAST(n_words AS DOUBLE) / CAST(n_sentences AS DOUBLE), 6)
      |      - 84.6::DOUBLE * ROUND(CAST(n_syllables AS DOUBLE) / CAST(n_words AS DOUBLE), 6), 6)
      |  END AS flesch
      |FROM m ORDER BY doc_id""".stripMargin

  /** DuckDB twin of Sampling.gramLeakageQuery (x149): per-split
    * DISTINCT 4-gram sets, pair grid from the split list so empty
    * overlaps still emit. */
  private def gramLeakageSql: String =
    s"""WITH toks AS MATERIALIZED (
       |  SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS w
       |  FROM documents),
       |g4 AS MATERIALIZED (
       |  SELECT DISTINCT ${splitCaseSql("doc_id")} AS split,
       |    w[g] || ' ' || w[g+1] || ' ' || w[g+2] || ' ' || w[g+3] AS gram
       |  FROM toks, UNNEST(range(1, greatest(len(w) - 2, 1))) AS t(g)),
       |sz AS MATERIALIZED (
       |  SELECT split, CAST(COUNT(*) AS BIGINT) AS n FROM g4 GROUP BY split),
       |sh AS MATERIALIZED (
       |  SELECT a.split AS split_a, b.split AS split_b,
       |    CAST(COUNT(*) AS BIGINT) AS shared
       |  FROM g4 a JOIN g4 b ON a.gram = b.gram AND a.split < b.split
       |  GROUP BY 1, 2)
       |SELECT p.split_a, p.split_b, p.grams_a, p.grams_b,
       |  CAST(coalesce(sh.shared, 0) AS BIGINT) AS shared_grams
       |FROM (SELECT a.split AS split_a, b.split AS split_b,
       |        a.n AS grams_a, b.n AS grams_b
       |      FROM sz a JOIN sz b ON a.split < b.split) p
       |LEFT JOIN sh ON sh.split_a = p.split_a AND sh.split_b = p.split_b
       |ORDER BY p.split_a, p.split_b""".stripMargin

  /** DuckDB twin of Sampling.leakProbeQuery (x152): per-doc distinct
    * grams joined against the per-split distinct gram sets, own split
    * excluded; raw grams where the engine carries xxhash64 keys (same
    * counts — the x44 hashed-key equivalence). */
  private def leakProbeSql: String =
    s"""WITH toks AS MATERIALIZED (
       |  SELECT doc_id, ${splitCaseSql("doc_id")} AS own,
       |    list_filter(string_split(text, ' '), x -> x <> '') AS w
       |  FROM documents),
       |dg AS MATERIALIZED (
       |  SELECT DISTINCT doc_id, own,
       |    w[g] || ' ' || w[g+1] || ' ' || w[g+2] || ' ' || w[g+3] AS gram
       |  FROM toks, UNNEST(range(1, greatest(len(w) - 2, 1))) AS t(g)),
       |idx AS MATERIALIZED (
       |  SELECT DISTINCT own AS split, gram FROM dg)
       |SELECT d.doc_id, i.split, CAST(COUNT(*) AS BIGINT) AS shared_grams
       |FROM dg d JOIN idx i ON d.gram = i.gram AND i.split <> d.own
       |GROUP BY 1, 2
       |ORDER BY d.doc_id, i.split""".stripMargin

  /** DuckDB twin of Sampling.dsirQuery (x153): identical md5 token
    * buckets, add-one smoothing, each ln rounded at 6 into
    * DECIMAL(18,6), λ an exact decimal subtraction, per-doc mean the
    * exact decimal dot product over one double division (x67's shape). */
  private def dsirSql: String = {
    val b = Sampling.DsirBuckets
    def bkt(tok: String) = s"${bucketSql(tok, Sampling.DsirSalt)} % $b"
    s"""WITH ttok AS MATERIALIZED (
       |  SELECT ${bkt("t.term")} AS b
       |  FROM (SELECT unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS term
       |        FROM documents WHERE source = 'src0') t),
       |tc AS MATERIALIZED (
       |  SELECT b, CAST(COUNT(*) AS BIGINT) AS tc FROM ttok GROUP BY b),
       |rtok AS MATERIALIZED (
       |  SELECT doc_id, ${bkt("t.term")} AS b
       |  FROM (SELECT doc_id, unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS term
       |        FROM documents WHERE source <> 'src0') t),
       |rbd AS MATERIALIZED (
       |  SELECT doc_id, b, CAST(COUNT(*) AS BIGINT) AS n FROM rtok GROUP BY 1, 2),
       |rc AS MATERIALIZED (
       |  SELECT b, CAST(SUM(n) AS BIGINT) AS rc FROM rbd GROUP BY b),
       |tot AS (
       |  SELECT (SELECT coalesce(SUM(tc), 0) FROM tc) AS tt,
       |         (SELECT coalesce(SUM(rc), 0) FROM rc) AS rt),
       |lam AS MATERIALIZED (
       |  SELECT rc.b,
       |    CAST(round(ln(CAST(coalesce(tc.tc, 0) + 1 AS DOUBLE)
       |                  / CAST(tot.tt + $b AS DOUBLE)), 6) AS DECIMAL(18,6))
       |    - CAST(round(ln(CAST(rc.rc + 1 AS DOUBLE)
       |                    / CAST(tot.rt + $b AS DOUBLE)), 6) AS DECIMAL(18,6)) AS lam
       |  FROM rc LEFT JOIN tc USING (b) CROSS JOIN tot),
       |per AS (
       |  SELECT doc_id, CAST(SUM(n) AS BIGINT) AS n_tokens,
       |    CAST(SUM(n * lam) AS DOUBLE) / SUM(n) AS avg_lr
       |  FROM rbd JOIN lam USING (b) GROUP BY doc_id)
       |SELECT d.doc_id, CAST(coalesce(n_tokens, 0) AS BIGINT) AS n_tokens, avg_lr
       |FROM (SELECT doc_id FROM documents WHERE source <> 'src0') d
       |LEFT JOIN per USING (doc_id)
       |ORDER BY d.doc_id""".stripMargin
  }

  /** DuckDB twin of TextAnalysis.nbQualityQuery (x155): identical md5
    * unigram+bigram feature buckets, add-one smoothed class
    * conditionals, each ln rounded at 6 into DECIMAL(18,6), the
    * per-doc log-odds an exact decimal dot product plus the prior,
    * cast to double once at the output (x153's discipline). */
  private def nbQualitySql: String = {
    val b = TextAnalysis.NbBuckets
    def bkt(tok: String) = s"${bucketSql(tok, TextAnalysis.NbSalt)} % $b"
    s"""WITH lab AS MATERIALIZED (
       |  SELECT doc_id,
       |    CAST(CASE WHEN source IN ('src0', 'src1') THEN 1 ELSE 0 END
       |         AS BIGINT) AS y,
       |    text
       |  FROM documents),
       |toks AS MATERIALIZED (
       |  SELECT doc_id, y,
       |    list_filter(string_split(text, ' '), x -> x <> '') AS w
       |  FROM lab WHERE text IS NOT NULL),
       |feats AS MATERIALIZED (
       |  SELECT doc_id, y, ${bkt("t.term")} AS bk FROM (
       |    SELECT doc_id, y, unnest(w) AS term FROM toks
       |    UNION ALL
       |    SELECT doc_id, y, w[g] || ' ' || w[g+1] AS term
       |    FROM toks, UNNEST(range(1, len(w))) AS t(g)) t),
       |dbc AS MATERIALIZED (
       |  SELECT doc_id, y, bk, CAST(COUNT(*) AS BIGINT) AS n
       |  FROM feats GROUP BY 1, 2, 3),
       |cb AS MATERIALIZED (
       |  SELECT bk,
       |    CAST(SUM(CASE WHEN y = 1 THEN n ELSE 0 END) AS BIGINT) AS pc,
       |    CAST(SUM(CASE WHEN y = 0 THEN n ELSE 0 END) AS BIGINT) AS nc
       |  FROM dbc GROUP BY bk),
       |tot AS (
       |  SELECT CAST(coalesce(SUM(pc), 0) AS BIGINT) AS pt,
       |         CAST(coalesce(SUM(nc), 0) AS BIGINT) AS nt FROM cb),
       |wts AS MATERIALIZED (
       |  SELECT bk,
       |    CAST(round(ln(CAST(pc + 1 AS DOUBLE) / CAST(pt + $b AS DOUBLE)), 6)
       |         AS DECIMAL(18,6))
       |    - CAST(round(ln(CAST(nc + 1 AS DOUBLE) / CAST(nt + $b AS DOUBLE)), 6)
       |           AS DECIMAL(18,6)) AS wb
       |  FROM cb CROSS JOIN tot),
       |pri AS (
       |  SELECT CAST(round(ln(CAST(coalesce(SUM(y), 0) + 1 AS DOUBLE)
       |      / CAST(COUNT(*) - coalesce(SUM(y), 0) + 1 AS DOUBLE)), 6)
       |    AS DECIMAL(18,6)) AS w0
       |  FROM lab),
       |sc AS (
       |  SELECT doc_id, CAST(SUM(n) AS BIGINT) AS n_feats,
       |    SUM(n * wb) AS s
       |  FROM dbc JOIN wts USING (bk) GROUP BY doc_id)
       |SELECT l.doc_id, l.y,
       |  CAST(coalesce(n_feats, 0) AS BIGINT) AS n_feats,
       |  CAST(w0 + coalesce(s, CAST(0 AS DECIMAL(18,6))) AS DOUBLE) AS log_odds,
       |  CAST(CASE WHEN w0 + coalesce(s, CAST(0 AS DECIMAL(18,6))) > 0
       |       THEN 1 ELSE 0 END AS BIGINT) AS pred
       |FROM lab l LEFT JOIN sc USING (doc_id) CROSS JOIN pri
       |ORDER BY l.doc_id""".stripMargin
  }

  /** DuckDB twin of Sampling.doremiQuery (x156): identical md5 token
    * buckets, round-at-6 decimal log-probs, exact decimal dot products
    * with one double division per domain, round-at-6 before and after
    * the exp, exact decimal normalization sum, ::DOUBLE literals so the
    * linear form never enters DuckDB decimal arithmetic. */
  /** The x156 weight pipeline as a WITH-clause prefix ending in a
    * `wts2(source, n_tokens, ce, excess, weight)` CTE — shared verbatim
    * by the x156 face and the x160 planner built on it. */
  private def doremiCoreSql: String = {
    val b = Sampling.DoremiBuckets
    val keep = s"(${Sampling.DoremiKeep})::DOUBLE"
    val smooth = s"(${Sampling.DoremiSmooth})::DOUBLE"
    val eta = s"(${Sampling.DoremiEta})::DOUBLE"
    def bkt(tok: String) = s"${bucketSql(tok, Sampling.DoremiSalt)} % $b"
    s"""WITH tok AS MATERIALIZED (
       |  SELECT source, ${bkt("t.term")} AS b FROM (
       |    SELECT source,
       |      unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS term
       |    FROM documents) t),
       |sbc AS MATERIALIZED (
       |  SELECT source, b, CAST(COUNT(*) AS BIGINT) AS n
       |  FROM tok GROUP BY 1, 2),
       |cb AS MATERIALIZED (
       |  SELECT b, CAST(SUM(n) AS BIGINT) AS cn FROM sbc GROUP BY b),
       |nt AS (SELECT CAST(coalesce(SUM(cn), 0) AS BIGINT) AS nn FROM cb),
       |lp AS MATERIALIZED (
       |  SELECT b, cn,
       |    CAST(round(ln(CAST(cn AS DOUBLE) / CAST(nn AS DOUBLE)), 6)
       |         AS DECIMAL(18,6)) AS lp
       |  FROM cb CROSS JOIN nt),
       |h AS (
       |  SELECT -CAST(SUM(cn * lp) AS DOUBLE)
       |    / CAST((SELECT nn FROM nt) AS DOUBLE) AS h FROM lp),
       |ce AS (
       |  SELECT source, CAST(SUM(n) AS BIGINT) AS n_tokens,
       |    -CAST(SUM(n * lp) AS DOUBLE) / CAST(SUM(n) AS DOUBLE) AS ce
       |  FROM sbc JOIN lp USING (b) GROUP BY source),
       |ex AS MATERIALIZED (
       |  SELECT source, n_tokens, ce,
       |    greatest(round(ce - h, 6), (0)::DOUBLE) AS excess,
       |    CAST(round(exp($eta * greatest(round(ce - h, 6), (0)::DOUBLE)), 6)
       |         AS DECIMAL(18,6)) AS e
       |  FROM ce CROSS JOIN h),
       |nrm AS (
       |  SELECT SUM(e) AS se, CAST(COUNT(*) AS DOUBLE) AS k FROM ex),
       |wts2 AS MATERIALIZED (
       |  SELECT source, n_tokens, ce, excess,
       |    $keep * (CAST(e AS DOUBLE) / CAST(se AS DOUBLE)) + $smooth / k
       |      AS weight
       |  FROM ex CROSS JOIN nrm)""".stripMargin
  }

  private def doremiSql: String =
    s"""$doremiCoreSql
       |SELECT source, n_tokens, ce, excess, weight
       |FROM wts2
       |ORDER BY source""".stripMargin

  /** DuckDB twin of Sampling.dataBudgetQuery (x160): the x156 core
    * verbatim, then the single-pass epoch-capped allocation —
    * round-at-6 demand, exact-double cap, `least`, round-at-6 ratio. */
  private def dataBudgetSql: String = {
    val bf = s"(${Sampling.BudgetFactor})::DOUBLE"
    val cap = s"(${Sampling.BudgetEpochCap})::DOUBLE"
    s"""$doremiCoreSql,
       |tot AS (SELECT CAST(coalesce(SUM(n_tokens), 0) AS DOUBLE) AS t
       |        FROM wts2),
       |plan2 AS (
       |  SELECT source, n_tokens, weight,
       |    round($bf * t * weight, 6) AS demand
       |  FROM wts2 CROSS JOIN tot),
       |alloc2 AS (
       |  SELECT source, n_tokens, weight, demand,
       |    least(demand, $cap * CAST(n_tokens AS DOUBLE)) AS alloc
       |  FROM plan2)
       |SELECT source, n_tokens, weight, demand, alloc,
       |  round(alloc / CAST(n_tokens AS DOUBLE), 6) AS epochs
       |FROM alloc2
       |ORDER BY source""".stripMargin
  }

  /** DuckDB twin of Dedup.lineRepetitionQuery (x154): identical
    * first-line plant, fixed-width lines, exact integer repeat mass. */
  private def lineRepSql: String = {
    val lt = Dedup.LineTokens
    s"""WITH planted AS MATERIALIZED (
       |  SELECT doc_id,
       |    CASE WHEN doc_id % 6 = 0 AND text IS NOT NULL THEN
       |      array_to_string(
       |        list_filter(string_split(text, ' '), x -> x <> '')[1:$lt], ' ')
       |      || ' ' || text
       |    ELSE text END AS text
       |  FROM documents),
       |toks AS MATERIALIZED (
       |  SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS w
       |  FROM planted),
       |lines AS MATERIALIZED (
       |  SELECT doc_id,
       |    array_to_string(w[(i*$lt+1):(i*$lt+$lt)], ' ') AS line
       |  FROM toks,
       |    UNNEST(range(0, CAST(ceil(len(w) / $lt.0) AS BIGINT))) AS t(i)),
       |grp AS (
       |  SELECT doc_id, line, CAST(COUNT(*) AS BIGINT) AS c,
       |    CAST(len(list_filter(string_split(line, ' '), x -> x <> ''))
       |         AS BIGINT) AS len
       |  FROM lines GROUP BY doc_id, line),
       |per AS (
       |  SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_lines,
       |    CAST(SUM(CASE WHEN c > 1 THEN c ELSE 0 END) AS BIGINT)
       |      AS n_dup_lines,
       |    CAST(SUM(CASE WHEN c > 1 THEN (c - 1) * len ELSE 0 END) AS BIGINT)
       |      AS dup_tokens
       |  FROM grp GROUP BY doc_id)
       |SELECT d.doc_id,
       |  COALESCE(n_lines, CAST(0 AS BIGINT)) AS n_lines,
       |  COALESCE(n_dup_lines, CAST(0 AS BIGINT)) AS n_dup_lines,
       |  COALESCE(dup_tokens, CAST(0 AS BIGINT)) AS dup_tokens
       |FROM documents d LEFT JOIN per ON d.doc_id = per.doc_id
       |ORDER BY d.doc_id""".stripMargin
  }

  /** DuckDB twin of TextAnalysis.qualityPanelQuery (x163): the
    * x147/x148/x154/x97 twins' arithmetic verbatim over the RAW corpus
    * (no plants), stitched on doc_id — DuckDB's strategy for the fused
    * scan is its own business; the engine's is one projection. */
  private def qualityPanelSql: String =
    qualityPanelInnerSql + "\nORDER BY gm.doc_id"

  /** The x163 per-doc panel query WITHOUT presentation order — shared
    * by the x168 rollup twin. */
  private def qualityPanelInnerSql: String = {
    val stops = TextAnalysis.GopherStops.map(s => s"'$s'").mkString(", ")
    val lt = Dedup.LineTokens
    val (em, ph, ip) = (DocPrep.PiiEmailRe, DocPrep.PiiPhoneRe, DocPrep.PiiIpRe)
    val (ctrl, nonAscii, longSp) =
      (DocPrep.CtrlRe, DocPrep.NonAsciiRe, DocPrep.LongSpaceRe)
    s"""WITH t AS MATERIALIZED (
       |  SELECT doc_id, text,
       |    list_filter(string_split(text, ' '), x -> x <> '') AS w,
       |    CAST(length(replace(text, ' ', '')) AS BIGINT) AS n_chars
       |  FROM documents),
       |gm AS MATERIALIZED (
       |  SELECT doc_id, CAST(len(w) AS BIGINT) AS n_tokens, n_chars,
       |    CAST(len(list_filter(w, x -> regexp_matches(x, '[A-Za-z]'))) AS BIGINT) AS n_alpha,
       |    CAST(len(list_intersect(list_distinct(w), [$stops])) AS BIGINT) AS n_stop
       |  FROM t),
       |rm AS MATERIALIZED (
       |  SELECT doc_id, CAST(len(w) AS BIGINT) AS n_words,
       |    CAST(greatest(len(regexp_extract_all(text, '[.!?]+')), 1) AS BIGINT) AS n_sentences,
       |    CAST(len(regexp_extract_all(lower(text), '[aeiouy]+')) AS BIGINT) AS n_syllables
       |  FROM t),
       |lines AS MATERIALIZED (
       |  SELECT doc_id,
       |    array_to_string(w[(i*$lt+1):(i*$lt+$lt)], ' ') AS line
       |  FROM t,
       |    UNNEST(range(0, CAST(ceil(len(w) / $lt.0) AS BIGINT))) AS t2(i)),
       |grp AS (
       |  SELECT doc_id, line, CAST(COUNT(*) AS BIGINT) AS c,
       |    CAST(len(list_filter(string_split(line, ' '), x -> x <> ''))
       |         AS BIGINT) AS len
       |  FROM lines GROUP BY doc_id, line),
       |per AS MATERIALIZED (
       |  SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_lines,
       |    CAST(SUM(CASE WHEN c > 1 THEN c ELSE 0 END) AS BIGINT)
       |      AS n_dup_lines,
       |    CAST(SUM(CASE WHEN c > 1 THEN (c - 1) * len ELSE 0 END) AS BIGINT)
       |      AS dup_tokens
       |  FROM grp GROUP BY doc_id),
       |pa AS MATERIALIZED (
       |  SELECT doc_id,
       |    CAST(len(regexp_extract_all(text, '$em')) AS BIGINT) AS n_email,
       |    CAST(len(regexp_extract_all(text, '$ph')) AS BIGINT) AS n_phone,
       |    CAST(len(regexp_extract_all(text, '$ip')) AS BIGINT) AS n_ip,
       |    CAST(length(text) AS BIGINT) AS raw_len,
       |    CAST(length(regexp_replace(regexp_replace(regexp_replace(text,
       |      '$em', '[EMAIL]', 'g'), '$ph', '[PHONE]', 'g'), '$ip', '[IP]', 'g'))
       |      AS BIGINT) AS redacted_len
       |  FROM t),
       |enc AS MATERIALIZED (
       |  SELECT doc_id,
       |    CAST(len(regexp_extract_all(text, chr(65533))) AS BIGINT) AS n_repl,
       |    CAST(len(regexp_extract_all(text, '$ctrl')) AS BIGINT) AS n_ctrl,
       |    CAST(length(regexp_replace(text, '$nonAscii', '', 'g')) AS BIGINT) AS n_ascii,
       |    CAST(len(regexp_extract_all(text, '$longSp')) AS BIGINT) AS n_longspace
       |  FROM t)
       |SELECT gm.doc_id, gm.n_tokens, gm.n_chars, gm.n_alpha, gm.n_stop,
       |  CAST(CASE WHEN gm.n_tokens BETWEEN ${TextAnalysis.GopherMinTokens}
       |                 AND ${TextAnalysis.GopherMaxTokens}
       |            AND 3 * gm.n_tokens <= gm.n_chars
       |            AND gm.n_chars <= 10 * gm.n_tokens
       |            AND 5 * gm.n_alpha >= 4 * gm.n_tokens
       |            AND gm.n_stop >= 2 THEN 1 ELSE 0 END AS BIGINT) AS admitted,
       |  rm.n_words, rm.n_sentences, rm.n_syllables,
       |  CASE WHEN rm.n_words > 0 THEN
       |    ROUND(206.835::DOUBLE
       |      - 1.015::DOUBLE * ROUND(CAST(rm.n_words AS DOUBLE) / CAST(rm.n_sentences AS DOUBLE), 6)
       |      - 84.6::DOUBLE * ROUND(CAST(rm.n_syllables AS DOUBLE) / CAST(rm.n_words AS DOUBLE), 6), 6)
       |  END AS flesch,
       |  COALESCE(per.n_lines, CAST(0 AS BIGINT)) AS n_lines,
       |  COALESCE(per.n_dup_lines, CAST(0 AS BIGINT)) AS n_dup_lines,
       |  COALESCE(per.dup_tokens, CAST(0 AS BIGINT)) AS dup_tokens,
       |  pa.n_email, pa.n_phone, pa.n_ip,
       |  pa.n_email + pa.n_phone + pa.n_ip AS pii_total,
       |  pa.raw_len, pa.redacted_len,
       |  enc.n_repl, enc.n_ctrl, enc.n_ascii, enc.n_longspace,
       |  CAST(CASE WHEN enc.n_repl = 0 AND enc.n_ctrl = 0
       |             AND enc.n_longspace = 0
       |       THEN 1 ELSE 0 END AS BIGINT) AS clean
       |FROM gm JOIN rm USING (doc_id) LEFT JOIN per USING (doc_id)
       |  JOIN pa USING (doc_id) JOIN enc USING (doc_id)""".stripMargin
  }

  /** DuckDB twin of TextAnalysis.sourceScorecardQuery (x168): the
    * x163 panel body verbatim, rolled up per source — exact BIGINT
    * counts, one decimal-summed round-6 mean. */
  private def sourceScorecardSql: String =
    s"""WITH panel AS MATERIALIZED (
       |${qualityPanelInnerSql}
       |)
       |SELECT d.source, CAST(COUNT(*) AS BIGINT) AS n_docs,
       |  CAST(SUM(p.admitted) AS BIGINT) AS n_admitted,
       |  CAST(SUM(p.clean) AS BIGINT) AS n_clean,
       |  CAST(SUM(CASE WHEN p.pii_total > 0 THEN 1 ELSE 0 END) AS BIGINT)
       |    AS n_pii_docs,
       |  CAST(SUM(CASE WHEN p.n_dup_lines > 0 THEN 1 ELSE 0 END) AS BIGINT)
       |    AS n_dup_docs,
       |  CAST(COALESCE(SUM(p.n_tokens), 0) AS BIGINT) AS n_tokens,
       |  CASE WHEN COUNT(p.flesch) > 0 THEN
       |    round(CAST(SUM(CAST(p.flesch AS DECIMAL(18,6))) AS DOUBLE)
       |      / COUNT(p.flesch), 6) END AS avg_flesch
       |FROM panel p JOIN documents d USING (doc_id)
       |GROUP BY d.source
       |ORDER BY d.source""".stripMargin

  /** DuckDB twin of Dedup.exciseQuery (x151). */
  private def exciseSql: String =
    """WITH toksr AS MATERIALIZED (
      |  SELECT list_filter(string_split(text, ' '), x -> x <> '') AS w
      |  FROM documents WHERE source IN ('src0', 'src1')),
      |refg AS MATERIALIZED (
      |  SELECT DISTINCT w[g] || ' ' || w[g+1] || ' ' || w[g+2] || ' ' || w[g+3] AS gram
      |  FROM toksr, UNNEST(range(1, greatest(len(w) - 2, 1))) AS t(g)),
      |cand AS MATERIALIZED (
      |  SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS w
      |  FROM documents
      |  WHERE source NOT IN ('src0', 'src1') AND text IS NOT NULL),
      |grams AS (
      |  SELECT doc_id, g, w[g] || ' ' || w[g+1] || ' ' || w[g+2] || ' ' || w[g+3] AS gram
      |  FROM cand, UNNEST(range(1, greatest(len(w) - 2, 1))) AS t(g)),
      |hits AS MATERIALIZED (
      |  SELECT DISTINCT doc_id, g FROM grams JOIN refg USING (gram)),
      |dropped AS MATERIALIZED (
      |  SELECT DISTINCT doc_id, p FROM hits, UNNEST(range(g, g + 4)) AS t(p)),
      |tokens AS (
      |  SELECT doc_id, p, w[p] AS tok
      |  FROM cand, UNNEST(range(1, len(w) + 1)) AS t(p)),
      |kept AS (
      |  SELECT t.doc_id, t.p, t.tok FROM tokens t
      |  ANTI JOIN dropped d ON t.doc_id = d.doc_id AND t.p = d.p),
      |agg AS (
      |  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_kept,
      |    string_agg(tok, ' ' ORDER BY p) AS out
      |  FROM kept GROUP BY doc_id)
      |SELECT c.doc_id, CAST(len(c.w) AS BIGINT) AS n_tokens,
      |  CAST(len(c.w) - coalesce(n_kept, 0) AS BIGINT) AS n_dropped,
      |  md5(coalesce(out, '')) AS out_key
      |FROM cand c LEFT JOIN agg USING (doc_id)
      |ORDER BY doc_id""".stripMargin

  /** DuckDB twin of Dedup.selfExciseQuery (x157): identical keeper
    * rule (lexicographic min over (doc_id, position) for each
    * duplicated gram's occurrences — a struct argmin, exact for any
    * document length; both engines' position bases shift every
    * occurrence of a doc equally, so the argmin picks the same one),
    * x151's rewrite tail. */
  private def selfExciseSql: String =
    s"""WITH cand AS MATERIALIZED (
       |  SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS w
       |  FROM documents WHERE text IS NOT NULL),
       |occ AS MATERIALIZED (
       |  SELECT doc_id, g,
       |    w[g] || ' ' || w[g+1] || ' ' || w[g+2] || ' ' || w[g+3] AS gram
       |  FROM cand, UNNEST(range(1, greatest(len(w) - 2, 1))) AS t(g)),
       |keepers AS MATERIALIZED (
       |  SELECT gram, CAST(COUNT(*) AS BIGINT) AS cnt,
       |    MIN({'doc_id': doc_id, 'g': g}) AS keep_oid
       |  FROM occ GROUP BY gram),
       |cut AS MATERIALIZED (
       |  SELECT o.doc_id, o.g
       |  FROM occ o JOIN keepers k USING (gram)
       |  WHERE k.cnt >= 2
       |    AND {'doc_id': o.doc_id, 'g': o.g} <> k.keep_oid),
       |dropped AS MATERIALIZED (
       |  SELECT DISTINCT doc_id, p FROM cut, UNNEST(range(g, g + 4)) AS t(p)),
       |tokens AS (
       |  SELECT doc_id, p, w[p] AS tok
       |  FROM cand, UNNEST(range(1, len(w) + 1)) AS t(p)),
       |kept AS (
       |  SELECT t.doc_id, t.p, t.tok FROM tokens t
       |  ANTI JOIN dropped d ON t.doc_id = d.doc_id AND t.p = d.p),
       |agg AS (
       |  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_kept,
       |    string_agg(tok, ' ' ORDER BY p) AS out
       |  FROM kept GROUP BY doc_id)
       |SELECT c.doc_id, CAST(len(c.w) AS BIGINT) AS n_tokens,
       |  CAST(len(c.w) - coalesce(n_kept, 0) AS BIGINT) AS n_dropped,
       |  md5(coalesce(out, '')) AS out_key
       |FROM cand c LEFT JOIN agg USING (doc_id)
       |ORDER BY doc_id""".stripMargin

  // --- x158/x162 PCA twins: the exact decimal Gram matrix (components
  // through the x73 FLOAT→DOUBLE→DECIMAL(18,4) hop), power-iteration
  // steps UNROLLED as CTE stages — each step one exact decimal matvec
  // (scale 14), the engine's round-at-6 double re-synchronization, one
  // exact decimal norm (scale 12) — and the x45 sequential-fold
  // projection. Value-identical to the engine's driver-side BigDecimal
  // iteration because every inexact operation happens in the same
  // place with the same rounding.

  /** One unrolled power-iteration chain over Gram CTE `g` with
    * variable prefix `xp` (CTEs `<xp>{y|n|}t`), starting from
    * `${xp}0`. Shared by the x158 twin and x162's two chains. */
  private def pcaStepsSql(g: String, xp: String, iters: Int): String =
    (1 to iters).map { t =>
      s"""${xp}y$t AS MATERIALIZED (
         |  SELECT $g.j AS i, SUM($g.gv * $xp${t - 1}.x) AS y
         |  FROM $g JOIN $xp${t - 1} ON $g.i = $xp${t - 1}.i GROUP BY $g.j),
         |${xp}n$t AS (
         |  SELECT sqrt(CAST(SUM(yd * yd) AS DOUBLE)) AS nrm FROM
         |    (SELECT CAST(round(CAST(y AS DOUBLE), 6) AS DECIMAL(18,6)) AS yd
         |     FROM ${xp}y$t) s),
         |$xp$t AS MATERIALIZED (
         |  SELECT i, CAST(round(round(CAST(y AS DOUBLE), 6) / nrm, 6)
         |         AS DECIMAL(12,6)) AS x
         |  FROM ${xp}y$t, ${xp}n$t)""".stripMargin
    }.mkString(",\n")

  /** The shared x158/x162 Gram + dims + uniform-start prefix. */
  private def pcaGramSql: String =
    """g AS MATERIALIZED (
      |  SELECT i, j,
      |    CAST(SUM(CAST(CAST(embedding[i] AS DOUBLE) AS DECIMAL(18,4))
      |           * CAST(CAST(embedding[j] AS DOUBLE) AS DECIMAL(18,4)))
      |         AS DECIMAL(24,8)) AS gv
      |  FROM embeddings,
      |    UNNEST(range(1, len(embedding) + 1)) AS a(i),
      |    UNNEST(range(1, len(embedding) + 1)) AS b(j)
      |  GROUP BY 1, 2),
      |dims AS (SELECT DISTINCT i FROM g),
      |x0 AS MATERIALIZED (
      |  SELECT i, CAST(round(1.0 / sqrt((SELECT CAST(COUNT(*) AS DOUBLE)
      |                                   FROM dims)), 6)
      |         AS DECIMAL(12,6)) AS x
      |  FROM dims)""".stripMargin

  private def pcaProjSql: String = {
    val iters = Similarity.PcaIters
    s"""WITH $pcaGramSql,
       |${pcaStepsSql("g", "x", iters)},
       |axis AS (
       |  SELECT list(CAST(x AS DOUBLE) ORDER BY i) AS a FROM x$iters)
       |SELECT vec_id, label,
       |  CAST(CAST(round(list_dot_product(embedding::DOUBLE[], axis.a), 6)
       |       AS DECIMAL(18,6)) AS DOUBLE) AS proj
       |FROM embeddings, axis
       |ORDER BY vec_id""".stripMargin
  }
  /** DuckDB twin of Similarity.pcaProjection2Query (x162): PC1's
    * chain, Hotelling deflation (λ₁ from the rounded matvec image, each
    * deflated cell re-rounded at 8 through the double image), PC2's
    * chain over g2, both projections — every inexact step lands where
    * the engine's driver-side BigDecimal mirror lands it. */
  private def pcaProj2Sql: String = {
    val iters = Similarity.PcaIters
    s"""WITH $pcaGramSql,
       |${pcaStepsSql("g", "x", iters)},
       |ylam AS (
       |  SELECT g.j AS i, SUM(g.gv * x$iters.x) AS y
       |  FROM g JOIN x$iters ON g.i = x$iters.i GROUP BY g.j),
       |lam AS (
       |  SELECT CAST(round(CAST(SUM(s.yd * xx.x) AS DOUBLE), 6)
       |         AS DECIMAL(18,6)) AS l
       |  FROM (SELECT i, CAST(round(CAST(y AS DOUBLE), 6) AS DECIMAL(18,6))
       |          AS yd FROM ylam) s
       |  JOIN x$iters xx ON s.i = xx.i),
       |z0 AS MATERIALIZED (SELECT i, x FROM x0),
       |g2 AS MATERIALIZED (
       |  SELECT gg.i, gg.j,
       |    CAST(round(CAST(gg.gv
       |      - lam.l * CAST(round(CAST(xi.x * xj.x AS DOUBLE), 6)
       |                     AS DECIMAL(18,6))
       |      AS DOUBLE), 8) AS DECIMAL(24,8)) AS gv
       |  FROM g gg
       |  JOIN x$iters xi ON gg.i = xi.i
       |  JOIN x$iters xj ON gg.j = xj.i
       |  CROSS JOIN lam),
       |${pcaStepsSql("g2", "z", iters)},
       |axis1 AS (
       |  SELECT list(CAST(x AS DOUBLE) ORDER BY i) AS a FROM x$iters),
       |axis2 AS (
       |  SELECT list(CAST(x AS DOUBLE) ORDER BY i) AS a FROM z$iters)
       |SELECT vec_id, label,
       |  CAST(CAST(round(list_dot_product(embedding::DOUBLE[], axis1.a), 6)
       |       AS DECIMAL(18,6)) AS DOUBLE) AS proj1,
       |  CAST(CAST(round(list_dot_product(embedding::DOUBLE[], axis2.a), 6)
       |       AS DECIMAL(18,6)) AS DOUBLE) AS proj2
       |FROM embeddings, axis1, axis2
       |ORDER BY vec_id""".stripMargin
  }

  /** DuckDB twin of TextAnalysis.bpeMergeQuery (x161): the merge loop
    * UNROLLED at the engine's distinct-word grain — w0 aggregates
    * occurrences to (word, n) once, each step counts pairs weighted by
    * n (the same statistic as counting raw occurrences), takes the
    * (count DESC, key ASC) top-1, and applies the leftmost-greedy
    * non-overlapping rewrite via run-parity windows (islands of
    * consecutive matches; even offsets merge, odd ones are consumed) —
    * provably the same rewrite as the engine's left fold, since a
    * merged symbol can never restart the same pair. The word string
    * itself is the partition key (distinct words stay distinct under
    * every merge), so no synthetic row ids are needed. */
  private def bpeMergesSql: String = {
    val steps = (1 to TextAnalysis.BpeMergeSteps).map { t =>
      val prev = s"w${t - 1}"
      s"""p$t AS (
         |  SELECT s[i] || chr(1) || s[i+1] AS p, n
         |  FROM $prev, UNNEST(range(1, len(s))) AS t(i)
         |  WHERE len(s) >= 2),
         |top$t AS MATERIALIZED (
         |  SELECT split_part(p, chr(1), 1) AS a,
         |         split_part(p, chr(1), 2) AS b,
         |         CAST(SUM(n) AS BIGINT) AS n
         |  FROM p$t GROUP BY p ORDER BY n DESC, p LIMIT 1),
         |pos$t AS (
         |  SELECT wid, n, i, s[i] AS sym
         |  FROM $prev, UNNEST(range(1, len(s) + 1)) AS t(i)),
         |m$t AS (
         |  SELECT wid, n, i, sym,
         |    lead(sym) OVER (PARTITION BY wid ORDER BY i) AS nxt,
         |    CASE WHEN sym = (SELECT a FROM top$t)
         |          AND lead(sym) OVER (PARTITION BY wid ORDER BY i)
         |              = (SELECT b FROM top$t)
         |         THEN 1 ELSE 0 END AS m
         |  FROM pos$t),
         |r$t AS (
         |  SELECT wid, n, i, sym, nxt, m,
         |    CASE WHEN m = 1 THEN
         |      i - row_number() OVER (PARTITION BY wid, m ORDER BY i) END AS grp
         |  FROM m$t),
         |k$t AS (
         |  SELECT wid, n, i, sym, nxt, m,
         |    CASE WHEN m = 1
         |          AND (i - MIN(i) OVER (PARTITION BY wid, grp)) % 2 = 0
         |         THEN 1 ELSE 0 END AS take
         |  FROM r$t),
         |e$t AS (
         |  SELECT wid, n, i,
         |    CASE WHEN take = 1 THEN sym || nxt ELSE sym END AS sym,
         |    lag(take) OVER (PARTITION BY wid ORDER BY i) AS consumed
         |  FROM k$t),
         |w$t AS MATERIALIZED (
         |  SELECT wid, n, list(sym ORDER BY i) AS s
         |  FROM e$t WHERE coalesce(consumed, 0) = 0
         |  GROUP BY wid, n)""".stripMargin
    }.mkString(",\n")
    val unions = (1 to TextAnalysis.BpeMergeSteps).map { t =>
      s"""SELECT CAST($t AS INT) AS step, a AS lhs, b AS rhs,
         |  a || b AS merged, n AS n_pair FROM top$t""".stripMargin
    }.mkString("\nUNION ALL\n")
    s"""WITH w0 AS MATERIALIZED (
       |  SELECT w AS wid, CAST(COUNT(*) AS BIGINT) AS n, string_split(w, '') AS s
       |  FROM (SELECT unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS w
       |        FROM documents) t
       |  WHERE len(w) >= 2
       |  GROUP BY w),
       |$steps
       |$unions
       |ORDER BY step""".stripMargin
  }

  /** DuckDB twin of Sampling.curriculumQuery (x150): the window form
    * of the engine's distributed global rank; integer band edges. */
  private def curriculumSql: String =
    s"""WITH t AS MATERIALIZED (
       |  SELECT doc_id,
       |    CAST(len(list_filter(string_split(text, ' '), x -> x <> '')) AS BIGINT) AS n_tokens
       |  FROM documents),
       |r AS (
       |  SELECT doc_id, n_tokens,
       |    CAST(row_number() OVER (ORDER BY n_tokens, doc_id) AS BIGINT) AS "rank",
       |    CAST(COUNT(*) OVER () AS BIGINT) AS n
       |  FROM t)
       |SELECT doc_id, n_tokens, "rank",
       |  CAST((${Sampling.CurriculumBands} * ("rank" - 1)) // n AS BIGINT) AS band
       |FROM r ORDER BY doc_id""".stripMargin
}
