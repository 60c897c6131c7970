package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.operators.{Analytics, Chunking, Dedup, DocPrep, ExtrasOracle, Graph, Layout, Linkage, Relational, RelationalOracle, Sampling, Sessionize, Similarity, Sketches, SkewTools, TextAnalysis, TextSearch, WebPrep}
import graft.pipeline.SensorPipeline

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * Every key in `queries` with a DuckDB-expressible semantics has a
  * matching key in `oracleSql` with identical output column names and
  * identical total ordering.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Relational.q03JoinAgg(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q01_filter_project" -> (Relational.q01FilterProject _),
    "q02_agg"            -> (Relational.q02Agg _),
    "q03_join_agg"       -> (Relational.q03JoinAgg _),
    "q04_topk"           -> (Relational.q04TopK _),
    "q05_outer_join"     -> (Relational.q05OuterJoin _),
    "q05_full_outer"     -> (Relational.q05FullOuter _),
    "q06_semi_join"      -> (Relational.q06Semi _),
    "q06_anti_join"      -> (Relational.q06Anti _),
    "q07_range_join"     -> (Relational.q07RangeJoin _),
    "q08_window_rank"    -> (Relational.q08WindowRank _),
    "q09_window_frame"   -> (Relational.q09WindowFrame _),
    "q10_rollup"         -> (Relational.q10Rollup _),
    "q11_count_distinct" -> (Relational.q11CountDistinct _),
    "q12_intersect"      -> (Relational.q12Intersect _),
    "q12_except"         -> (Relational.q12Except _),
    "q12_intersect_all"  -> (Relational.q12IntersectAll _),
    "q12_except_all"     -> (Relational.q12ExceptAll _),
    "q13_string_fns"     -> (Relational.q13StringFns _),
    "q14_date_fns"       -> (Relational.q14DateFns _),
    "q15_json_fns"       -> (Relational.q15JsonFns _),
    "q16_array_fns"      -> (Relational.q16ArrayFns _),
    "q17_explode_topk"   -> (Relational.q17ExplodeTopK _),
    "q18_union_dedup"    -> (Relational.q18UnionDedup _),
    "q19_tumbling_window" -> (Relational.q19TumblingWindow _),
    // Q21: the custom as-of join exec (native Catalyst operator), checked
    // against DuckDB's built-in ASOF JOIN.
    "q21_asof_join"      -> (Relational.q21AsOfJoin _),
    // Q22: the FORWARD direction (next purchase after each click),
    // checked against DuckDB ASOF in the >= direction.
    "q22_asof_forward"   -> (Relational.q22AsOfForward _),
    // Q20: the SIMPSS pipeline itself (batch form). Inputs are the
    // committed deterministic fixtures, not the sf tables.
    "q20_sensor_pipeline" -> ((s: SparkSession, _: String) =>
      SensorPipeline.run(s, Fixtures.sensorNdjson, Fixtures.sensorDim)),
    // LLM-training-data pipeline extras (north star): dedup at three cost
    // tiers, similarity search (exact + ANN), text analysis.
    "x01_dedup_exact"   -> (Dedup.exactDedupQuery _),
    "x02_minhash_pairs" -> (Dedup.minhashQuery _),
    "x03_ngram_pairs"   -> (Dedup.ngramPairsQuery _),
    "x04_simhash"       -> (Dedup.simhashQuery _),
    "x05_cosine_knn"    -> (Similarity.knnQuery _),
    "x06_ann_lsh"       -> (Similarity.annQuery _),
    "x06_ann_ivf"       -> (Similarity.ivfQuery _),
    "x07_embed_top1"    -> (Similarity.top1WithinLabel _),
    "x08_lang_id"       -> (TextAnalysis.langIdReport _),
    "x09_text_quality"  -> (TextAnalysis.qualityByLang _),
    "x10_token_count"   -> (TextAnalysis.tokenCountBySource _),
    "x11_fingerprint"   -> (TextAnalysis.fingerprints _),
    "x12_repetition"    -> (TextAnalysis.repetitionQuery _),
    "x13_dup_spans"     -> (Dedup.dupSpansQuery _),
    "x14_dup_clusters"  -> (Dedup.dupClustersQuery _),
    "x15_hll_rollup"    -> (Sketches.hllRollupQuery _),
    "x16_decontaminate" -> (Dedup.decontaminateQuery _),
    "x17_quant_knn"     -> (Similarity.quantizedQuery _),
    // x18: the composed corpus-prep pipeline (held-out exclusion, length
    // gate, exact dedup, decontamination) with per-doc drop provenance.
    "x18_doc_prep"      -> (DocPrep.prepQuery _),
    // x19-x21: corpus assembly — deterministic hash-based train/val/test
    // split, per-source mixing weights, and token-budget sequence packing.
    "x19_split"         -> (Sampling.splitQuery _),
    "x20_mix"           -> (Sampling.mixQuery _),
    "x21_pack"          -> (Sampling.packQuery _),
    // x22: the broadcast-weights-table mix (the beyond-10^3-sources form
    // of x20), oracle-checked against a DuckDB weights-table join.
    "x22_mix_weighted"  -> (Sampling.mixWeightedQuery _),
    // x23-x26: retrieval + behavioral analytics — BM25 full-text top-k,
    // gap sessionization, edit-distance record linkage (deletion-
    // neighborhood blocking vs a brute-force oracle), and exact-count
    // stratified sampling.
    "x23_bm25"          -> (TextSearch.bm25Query _),
    "x24_sessions"      -> (Sessionize.sessionQuery _),
    "x25_fuzzy_join"    -> (Linkage.fuzzyQuery _),
    "x26_stratified"    -> (Sampling.stratifiedQuery _),
    // x27-x29: warehouse analytics — SCD2 history build (the type-2 face
    // of the reference's type-1 upsert store), exact percentile rollup,
    // and an explicit-values revenue pivot.
    "x27_scd2"          -> (Analytics.scd2Query _),
    "x28_percentiles"   -> (Analytics.percentileQuery _),
    "x29_pivot"         -> (Analytics.pivotQuery _),
    // x30-x33: unpivot round-trip, post-clustering canonical-doc
    // selection, time-range moving average, decimal-moment z-score
    // anomalies.
    "x30_unpivot"       -> (Analytics.unpivotQuery _),
    "x31_canonical"     -> (Dedup.canonicalQuery _),
    "x32_moving_avg"    -> (Analytics.movingAvgQuery _),
    "x33_anomaly"       -> (Analytics.anomalyQuery _),
    // x34-x35: behavioral analytics — windowed conversion funnel and
    // weekly cohort retention.
    "x34_funnel"        -> (Analytics.funnelQuery _),
    "x35_retention"     -> (Analytics.retentionQuery _),
    // x36-x40: scale-path primitives, each oracle-checked against the
    // simple form it replaces — dense global ids without a global sort
    // (vs row_number), the bounded-heap stratified sample (vs x26's
    // window, SAME oracle SQL), the salted skew join (vs the plain
    // join), fixed-point integer PageRank on the x03 graph, and A-ES
    // weighted sampling (vs the same arithmetic in DuckDB).
    "x36_dense_ids"       -> (Sampling.denseIdQuery _),
    "x37_stratified_heap" -> (Sampling.stratifiedHeapQuery _),
    "x38_salted_join"     -> (SkewTools.saltedJoinQuery _),
    "x39_pagerank"        -> (Graph.pageRankQuery _),
    "x40_weighted_sample" -> (Sampling.weightedSampleQuery _),
    // x41-x43: token-window chunking (docs → overlapping context
    // windows), per-group A-ES weighted sampling, and per-language
    // top-terms vocabulary discovery on a bounded term heap.
    "x41_chunks"          -> (Chunking.chunkQuery _),
    "x42_weighted_group"  -> (Sampling.weightedGroupSampleQuery _),
    "x43_top_terms"       -> (TextAnalysis.topTermsQuery _),
    // x44: x01's exact dedup with hashed (20-byte) shuffle keys instead
    // of whole-document keys — the 100 TB plan, same oracle SQL as x01.
    "x44_dedup_hash"      -> (Dedup.exactDedupHashQuery _),
    // x45: embedding-cosine near-dup pairs (label-blocked exact config;
    // the LSH/IVF-blocked production faces are spec-gated).
    "x45_embed_neardup"   -> (Similarity.nearDupQuery _),
    // x46: Jaccard-VERIFIED near-dup pairs — the accept/reject step after
    // candidate generation, with candidates from the x03 inverted index
    // so the whole decision is oracle-checkable (x02's LSH path runs the
    // same verify rows-only).
    "x46_jaccard_pairs"   -> (Dedup.verifiedPairsQuery _),
    // x47: exact heavy-hitter bigrams on a Misra-Gries two-pass plan —
    // identical output to the plain groupBy/HAVING twin, but the
    // vocabulary's long tail never enters the shuffle.
    "x47_heavy_hitters"   -> (TextAnalysis.heavyHittersQuery _),
    // x48: per-document top-5 TF-IDF terms — the keyword extractor,
    // rank-stable cross-engine via the x23 decimal-rounding discipline.
    "x48_tfidf"           -> (TextAnalysis.tfIdfQuery _),
    // x49: KLL quantile-sketch rollup (the percentile counterpart of
    // x15's HLL rollup): per-flag sketches + a TOTAL row by sketch
    // union, never a second scan. Estimates are rows-only (randomized
    // compaction); accuracy/mergeability are spec-asserted.
    "x49_kll_quantiles"   -> (Sketches.kllRollupQuery _),
    // x50: epoch-weighted corpus upsampling WITH repetition — the >1x
    // form of x20/x22 (fractional epochs: floor(w) copies + a hash-
    // deterministic extra), stable (doc, copy) ordinals out.
    "x50_upsample"        -> (Sampling.upsampleQuery _),
    // x51: the multimodal pipeline (real PNG/WAV/GIF decodes of the
    // committed fixtures + synthetic payloads) as a deterministic
    // integer report; rows-only (no DuckDB media decode).
    "x51_media_probe"     -> (graft.functions.Multimodal.mediaProbeQuery _),
    // x52: cross-source near-dup contamination matrix over x46's
    // accepted pair set — which feeds copy which.
    "x52_contamination"   -> (Dedup.contaminationQuery _),
    // x53: per-language quality deciles (ntile over a total order) —
    // the "train on the top-k deciles" binning primitive.
    "x53_quality_deciles" -> (TextAnalysis.qualityDecilesQuery _),
    // x54: frequent-items sketch rollup — the mergeable, bounded-memory
    // face of x47's exact heavy hitters; rows-only (merge-order-
    // dependent estimates), bounds spec-asserted.
    "x54_freq_topk"       -> (Sketches.freqRollupQuery _),
    // x55: x16's decontamination with a Bloom prefilter on the candidate
    // gram stream (Spark's own BloomFilterAggregate / might_contain, the
    // runtime-filter kernel) — the >memory-reference scale path; no
    // false negatives + exact verify ⇒ same oracle SQL as x16.
    "x55_bloom_decontaminate" -> (Dedup.decontaminateBloomQuery _),
    // x56: greedy per-source token-budget selection on a distributed
    // prefix scan (two jobs over one range shuffle — no per-source
    // single-task window sort).
    "x56_token_budget"    -> (Sampling.tokenBudgetQuery _),
    // x57: bigram LM count table with Kneser-Ney continuation counts —
    // one corpus scan, windows over the aggregated vocabulary only.
    "x57_ngram_lm"        -> (TextAnalysis.ngramLmQuery _),
    // x58: winsorized per-group statistics (clip to exact p05/p95,
    // report clipped counts + decimal-exact winsorized sum).
    "x58_winsorize"       -> (Analytics.winsorQuery _),
    // x59: point-in-interval join with NO equi key — binned bucket
    // equi-join + exact residual instead of the BroadcastNestedLoopJoin
    // Spark would otherwise plan for a bare BETWEEN.
    "x59_interval_join"   -> (operators.IntervalJoin.intervalCountQuery _),
    // x60: median/MAD robust outliers — the breakdown-resistant twin of
    // x33's z-score detector, exact through the decimal discipline.
    "x60_mad_outliers"    -> (Analytics.madOutlierQuery _),
    // x61: top-k points per interval — x59's general-payload face; the
    // point side pre-reduces to per-day top-k before the bucket join.
    "x61_interval_topk"   -> (operators.IntervalJoin.topKIntervalQuery _),
    // x62: canonical text normalization (native NFC/casefold/whitespace
    // kernel) — the pre-dedup projection, DuckDB nfc_normalize twin.
    "x62_normalize"       -> (TextAnalysis.normalizeQuery _),
    // x63: per-document OOV counts vs the corpus top-50 vocabulary —
    // the tokenizer/corpus coverage metric (broadcast vocab semi-join).
    "x63_oov"             -> (TextAnalysis.oovQuery _),
    // x64: sorted-neighborhood (SNM) blocking — the third near-dup
    // candidate strategy (normalize-sort, rank-window pairs, x46's
    // exact Jaccard accept); skew-immune candidate count by design.
    "x64_snm_pairs"       -> (Dedup.snmQuery _),
    // x65: the per-source DATA CARD (docs, tokens, langs, dup share,
    // extremes) plus a TOTAL row from the same scan via rollup.
    "x65_data_card"       -> (TextAnalysis.dataCardQuery _),
    // x66: power-of-two length histogram (inference batching prep) —
    // the bucket is length(bin(n)), integer-exact on both engines.
    "x66_length_hist"     -> (Sampling.lengthHistQuery _),
    // x67: per-doc mean bigram log-prob under the corpus's add-one LM —
    // the KenLM-style perplexity-proxy quality filter, ln through the
    // x23/x48 6-decimal rounding discipline.
    "x67_lm_score"        -> (TextAnalysis.lmScoreQuery _),
    // x68: temperature-balanced source mix at α = 0.5 — keep rate
    // sqrt(n_min/n_s); division and sqrt are IEEE correctly-rounded, so
    // the decision thresholds are bit-identical cross-engine.
    "x68_temp_mix"        -> (Sampling.temperatureMixQuery _),
    // x69: split-leakage audit — x46's VERIFIED near-dup pairs (n-gram
    // candidates + exact Jaccard accept) that straddle two of x19's
    // splits (train/test answer leakage), with the straddle predicate
    // pushed below the Jaccard verify via candidateFilter.
    "x69_split_leakage"   -> (Sampling.splitLeakageQuery _),
    // x70: top-100 PMI collocations over the positional bigram table —
    // the association-mining face of x57 (phrase / tokenizer-merge
    // discovery), marginals as exact integer window sums.
    "x70_pmi"             -> (TextAnalysis.pmiQuery _),
    // x71: point-in-time enrichment — facts annotated with their SCD2
    // attribute as of fact time (native as-of exec over the x27
    // history; DuckDB ASOF twin).
    "x71_pit_enrich"      -> (Analytics.pitEnrichQuery _),
    // x72: content-defined chunking — gear/rolling-hash boundaries
    // (token closes a chunk when its md5 bucket ≡ 0 mod 8), the
    // insertion-resilient dedup-storage chunker next to x41's fixed
    // stride; chunks re-sync after edits (spec-proven).
    "x72_cdc_chunks"      -> (Chunking.cdcQuery _),
    // x73: label-centroid outliers — bottom-5 vectors per label by
    // cosine to the exact decimal-summed class centroid (embedding
    // label-consistency curation; cosine scale-invariance drops the
    // mean's division entirely).
    "x73_centroid_outliers" -> (Similarity.centroidOutlierQuery _),
    // x74: CUBE(lang, source) doc/token volumes — all four grouping
    // sets from one scan (completes the grouping-sets family: q10
    // ROLLUP, x65 rollup, x15/x49 grouping sets).
    "x74_cube"            -> (Analytics.cubeVolumesQuery _),
    // x75: user-behavior transition matrix — consecutive-event
    // (from, to) counts + per-from marginal (Markov/session modeling,
    // x34's sequence-mining companion).
    "x75_transitions"     -> (Analytics.transitionQuery _),
    // x76: COMPLETE exact similarity join via prefix filtering (PPJoin
    // family) — the fourth, LOSSLESS blocking strategy; the oracle is
    // the brute-force join, so completeness is the driver-checked
    // property itself.
    "x76_ppjoin"          -> (Dedup.ppJoinQuery _),
    // x77: the Z-order zone map — per-zone (count, min/max of BOTH
    // dimensions) over the Morton curve of (user_id, value); the
    // data-skipping statistics a lakehouse OPTIMIZE ZORDER buys, made
    // an inspectable (and here oracle-checked) table.
    "x77_zonemap"         -> (Layout.zonemapQuery _),
    // x78: deterministic spherical k-means — per-vector cluster
    // assignments after fixed Lloyd rounds, every step cross-engine
    // exact (decimal-sum centroids, 6-decimal cosine quantization).
    "x78_kmeans"          -> (Similarity.kmeansQuery _),
    // x79: the corpus-curation funnel report — per quality rule, how
    // many documents enter, drop, and survive under sequential
    // precedence; the dataset-card headline table.
    "x79_funnel"          -> (TextAnalysis.funnelQuery _),
    // x80: per-event-type least-squares value-over-time trend (slope /
    // intercept / r2) from exact integer+decimal moments — the metric
    // drift detector, engine-exact up to one rounded double expression.
    "x80_trend"           -> (Analytics.trendQuery _),
    // x81: per-document token Shannon entropy — the distribution-shape
    // quality signal (0 = one token repeated, ln(n) = no repeats);
    // rounded-ln + exact decimal dot product, the x67 discipline.
    "x81_token_entropy"   -> (TextAnalysis.tokenEntropyQuery _),
    // x82: per-source unigram KL divergence from the corpus blend —
    // the mix-drift detector feeding the x20/x22/x68 re-weighting;
    // windowed marginals over the (source, term) aggregate, x70's
    // double-ratio shape into the rounded ln.
    "x82_kl_drift"        -> (TextAnalysis.klDriftQuery _),
    // x83: ORACLE-CHECKED ANN — the IVF probe shape (centroid rank →
    // posting-list equi-join → exact top-k in probed lists) under the
    // x78-pinned deterministic codebook, graduating the ANN family's
    // probe mechanics from rows-only to driver-hash-gated (x06's
    // engine-hashing variants keep their recall specs).
    "x83_ann_exact"       -> (Similarity.annExactQuery _),
    // x84-x86: EXACT faces of the three sketch rollups (x15 HLL distinct,
    // x49 KLL quantiles, x54 frequent items) — same grouping sets, same
    // TOTAL presentation, true answers. The sketch estimates stay
    // rows-only (engine-specific); these oracle-check the grouping/
    // rollup plumbing around them and price the exact alternative the
    // sketches exist to avoid.
    "x84_distinct_exact"  -> (Sketches.distinctExactQuery _),
    "x85_quantiles_exact" -> (Sketches.quantilesExactQuery _),
    "x86_freq_exact"      -> (Sketches.freqExactQuery _),
    // x87: asymmetric n-gram containment pairs — the subset-duplication
    // detector (quotes, wrapped reposts) the Jaccard-gated dedup family
    // structurally misses; same rare-gram candidate shape as x46, exact
    // integer accept test.
    "x87_containment"     -> (Dedup.containmentQuery _),
    // x88: corpus snapshot diff — per-source added/removed/changed/
    // unchanged between two releases (full-outer key join + narrow
    // classification), the dataset-versioning report.
    "x88_snapshot_diff"   -> (DocPrep.snapshotDiffQuery _),
    // x89: per-doc boilerplate share — fraction of positional grams that
    // recur across >= 1/20 of the corpus (template/chrome detector, the
    // rare-gram dedup signal inverted).
    "x89_boilerplate"     -> (TextAnalysis.boilerplateQuery _),
    // x90: per-doc gram novelty under ingestion order — share of a doc's
    // distinct grams first seen at that doc (diminishing-returns screen
    // for appending crawl batches).
    "x90_novelty"         -> (TextAnalysis.noveltyQuery _),
    // x91: x90's production face — the arriving batch scored against the
    // corpus-so-far's (persistable) gram index; batch cost O(batch
    // grams), independent of corpus size. Persisted-index + streaming
    // faces spec-gated.
    "x91_novelty_incr"    -> (TextAnalysis.noveltyIncrQuery _),
    // x92: SEMANTIC dedup (SemDeDup) — within-cluster lower-id-wins
    // drop verdicts under the x78 deterministic codebook + round-6
    // cosine, making the whole keep/drop decision driver-hash-gated.
    "x92_semdedup"        -> (Similarity.semDedupQuery _),
    // x93: k-anonymity audit over (lang, source, size-magnitude) —
    // the release-governance gate; one metadata-only aggregate.
    "x93_kanon"           -> (DocPrep.kAnonQuery _),
    // x94: margin-scored neighbor mining (CCMatrix criterion) —
    // cos(best) over mean(top-k), hub-corrected match confidence;
    // shape-pinned two-op float image over exact decimal inputs.
    "x94_margin"          -> (Similarity.marginQuery _),
    // x95: source-overlap matrix — exact pairwise Jaccard between
    // sources' distinct gram sets (corpus-level redundancy between
    // feeds; the source-granular face of x90's novelty).
    "x95_source_overlap"  -> (TextAnalysis.sourceOverlapQuery _),
    // x96: corpus growth curve — per ingestion bucket: docs/tokens
    // added, grams first seen, cumulative distinct grams (the
    // diminishing-returns report; x90 per doc, this per batch).
    "x96_growth"          -> (TextAnalysis.growthCurveQuery _),
    // x97: PII detection + redaction audit — per-doc email/phone/IPv4
    // counts and post-redaction length over a deterministically
    // planted corpus (the privacy gate before release; patterns
    // chosen for identical Java-regex/RE2 semantics).
    "x97_pii_audit"       -> (DocPrep.piiQuery _),
    // x98: per-source quota cap — the C4/CCNet host-cap discipline:
    // md5-priority rank within source, keep the first N, audit shape
    // (every doc with rank + verdict, not a silent filter).
    "x98_source_cap"      -> (Sampling.sourceCapQuery _),
    // x99: annotator agreement — RLHF preference-label QC: first-vote
    // dedup, deterministic majority (count desc, label asc), per-rater
    // agreement rate (exact counts, one rounded division).
    "x99_annotator"       -> (Analytics.annotatorQuery _),
    // x100: edit-distance verified near-dup pairs — levenshtein over
    // canonical 80-char prefixes on the x64 sorted-neighborhood
    // candidate frame; the typo-level verify tier Jaccard misses.
    "x100_edit_pairs"     -> (Dedup.editPairsQuery _),
    // x101: one Dawid-Skene EM step — accuracy-weighted revote over
    // x99's vote frame with integer floor-division weights (exact
    // BIGINT sums, no float in any aggregate), flip report per item.
    "x101_dawid_skene"    -> (Analytics.dawidSkeneQuery _),
    // x102: URL canonicalization — fragment/tracking-param strip,
    // host lowercasing, scheme/www/trailing-slash removal on a
    // deterministically planted URL column; the crawl-dedup key and
    // x98's host-cap input. Map-only.
    "x102_url_canon"      -> (WebPrep.urlQuery _),
    // x103: markup strip + field extraction — title pull, link count,
    // tag strip with whitespace collapse over deterministic synthetic
    // HTML; the raw-crawl-to-text stage. Map-only.
    "x103_markup_strip"   -> (WebPrep.markupQuery _),
    // x104: canonical-URL dedup — x01's min-keeper rule on x102's
    // canonical key over a plant that genuinely collides; the
    // crawl-frontier tier that fires before any fetch.
    "x104_url_dedup"      -> (WebPrep.urlDedupQuery _),
    // x105: Krippendorff's alpha (nominal) — campaign-level
    // inter-rater reliability over x99's frame; decimal-summed Do
    // terms, BIGINT De, pinned final double image.
    "x105_kripp_alpha"    -> (Analytics.krippendorffQuery _),
    // x106: incremental exact dedup — an arriving batch deduped
    // against the frozen corpus keeper index plus itself (corpus
    // keeper wins, else batch min-id), novel-content flag per first
    // sighting; batch cost O(batch keys), never O(corpus).
    "x106_dedup_incr"     -> (Dedup.dedupIncrQuery _),
    // x107: corpus-assembly waterfall — per (source, gate) doc + token
    // accounting over x18's attribution; the release report that
    // justifies each gate and alarms on drift.
    "x107_waterfall"      -> (DocPrep.waterfallQuery _),
    // x108: script mix — per-doc writing-system character counts +
    // fixed-order dominance; the pre-language-ID routing step for a
    // multilingual crawl. Literal-range classes (the Java∩RE2 dialect),
    // planted script blocks, map-only.
    "x108_script_mix"     -> (TextAnalysis.scriptMixQuery _),
    // x109: one BPE merge iteration — the most frequent adjacent
    // character pairs inside words, occurrence-weighted; run to a
    // fixed point this IS tokenizer vocab induction.
    "x109_bpe_pairs"      -> (TextAnalysis.bpePairsQuery _),
    // x110: length-bucket packing audit — padding waste + fill
    // efficiency under power-of-two bucketed batching; the quantified
    // argument for sequence packing (x21) over padding.
    "x110_pack_audit"     -> (Sampling.packAuditQuery _),
    // x111: time-decayed popularity — exponentially-decayed event
    // counts at the corpus max day (halflife 7d); the recency-aware
    // leaderboard. Live form: StreamingOps.decayStream.
    "x111_decay_pop"      -> (Analytics.decayPopularityQuery _),
    // x112: per-source Zipf slope — OLS of ln(freq) on ln(rank) over
    // top terms; intrinsic distributional health per feed (flat head =
    // boilerplate, steep = degenerate repetition).
    "x112_zipf_slope"     -> (TextAnalysis.zipfSlopeQuery _),
    // x113: truncation-loss accounting at a fixed context budget — per
    // source, tokens kept/dropped if cut at L tokens; decides
    // truncation vs chunked ingestion (x41) per feed.
    "x113_truncation"     -> (DocPrep.truncationLossQuery _),
    // x114: link-graph construction from raw markup — href extraction,
    // x102 canonicalization, host-grain edge aggregation; the PageRank
    // (x39) input built from the crawl itself.
    "x114_link_graph"     -> (WebPrep.linkGraphQuery _),
    // x115: split label-balance audit — chi-square contingency between
    // x19's hash splits and the language label; the WITHIN-assignment
    // balance check complementing x69's cross-split leakage audit.
    "x115_split_balance"  -> (Sampling.splitBalanceQuery _),
    // x116: anchor-text aggregation — terms inside <a> tags pooled per
    // canonical destination host; the off-page relevance signal
    // companion to x114's edge counts.
    "x116_anchor_text"    -> (WebPrep.anchorTextQuery _),
    // x117: conversion lag — seconds between each user's first view
    // and first purchase (first-touch); the latency dimension x34's
    // funnel counts don't carry.
    "x117_conversion_lag" -> (Analytics.conversionLagQuery _),
    // x118: vocabulary concentration — top terms covering 90% of each
    // source's token mass; the empirical operating point next to
    // x112's parametric Zipf slope.
    "x118_vocab90"        -> (TextAnalysis.vocabCoverageQuery _),
    // x119: host-reputation gate — domain-level filtering: admit each
    // doc by its HOST's length-gate pass share (all-integer 2·pass ≥
    // docs cut); the CCNet/RefinedWeb domain-filtering move.
    "x119_host_reputation" -> (WebPrep.hostReputationQuery _),
    // x120: hard-negative mining — nearest same-label (positive) and
    // nearest different-label (hardest negative) per anchor; the
    // triplet-mining step for contrastive training. Exact baseline
    // face; the scale path mines from ANN candidates.
    "x120_hard_negatives" -> (Similarity.hardNegativesQuery _),
    // x121: tokenizer fertility per language — BPE-ish tokens per word
    // + chars per token; the vocabulary-rebalancing statistic.
    "x121_fertility"      -> (TextAnalysis.fertilityQuery _),
    // x122: event co-occurrence lift — unordered type pairs at the user
    // grain with N·n_ab/(n_a·n_b); the order-free association view next
    // to x75's sequential transitions.
    "x122_cooccur_lift"   -> (Analytics.cooccurrenceLiftQuery _),
    // x123: link-graph degree/reciprocity profile per host over x114's
    // edge grain — the crawl-prioritizer features next to x119's
    // content reputation (link farms reciprocate; organic graphs don't).
    "x123_link_degrees"   -> (WebPrep.linkDegreesQuery _),
    // x124: robots-style path blocklist — (host, path_prefix) disallow
    // table on the canonical key, longest matched prefix as the audit
    // trail; the fetch-policy gate between frontier dedup and fetch.
    "x124_robots_gate"    -> (WebPrep.robotsGateQuery _),
    // x125: dialog/sequence-integrity audit — per thread: turns, roles,
    // alternation breaks in a total (ts, event_id) order, span; the
    // malformed-conversation screen for instruction data.
    "x125_dialog_audit"   -> (Analytics.dialogAuditQuery _),
    // x126: rate-burst detection — hourly counts per type z-scored
    // against the type's own hourly distribution; the volume-anomaly
    // complement to x33's value anomalies.
    "x126_rate_bursts"    -> (Analytics.rateBurstsQuery _),
    // x127: two-sample KS between train and val token-length ECDFs per
    // source — the continuous-variable split audit next to x115's
    // label contingency.
    "x127_ks_audit"       -> (Sampling.ksSplitAuditQuery _),
    // x128: PSI between train/val token-length buckets (Laplace +1 over
    // observed buckets) per source — the binned drift metric; the same
    // shape later certifies corpus snapshots against each other.
    "x128_psi_drift"      -> (Sampling.psiSplitAuditQuery _),
    // x129: fixed-size nearest-neighbor image resize (the vision-encoder
    // preprocessing stage) over fixtures + synthetic payloads; pixel
    // hash pins the raster, PNG bytes stay out of the output.
    "x129_media_resize"   -> (graft.functions.Multimodal.mediaResizeQuery _),
    // x130: snapshot PSI — x128's drift metric between the x88 old/new
    // corpus snapshots; the one-number release gate that fires on a
    // distributional shift even when doc counts look normal.
    "x130_snapshot_psi"   -> (Sampling.snapshotPsiQuery _),
    // x131: join-key skew profile — distinct keys, heaviest key, exact
    // frequency percentiles, max/mean skew ratio; the measurement that
    // decides when x38's salting is worth its overhead.
    "x131_skew_profile"   -> (SkewTools.skewProfileQuery _),
    // x132: exact-proportion stratified split — md5-rank within source
    // cut at integer thresholds; guarantees per-stratum counts where
    // x19's hash ranges only guarantee expectations.
    "x132_exact_split"    -> (Sampling.exactSplitQuery _),
    // x133: exact-dup cluster-size histogram — the dedup savings curve
    // (few huge families vs a long tail of pairs decides whether exact
    // dedup alone pays); md5-keyed shuffle, all-integer.
    "x133_dup_histogram"  -> (Dedup.dupSizeHistogramQuery _),
    // x134: Spearman rank correlation (tokens vs punctuation) per
    // source — the is-quality-just-length confounding check; integer
    // permutation ranks, one double division.
    "x134_spearman"       -> (Analytics.spearmanQuery _),
    // x135: source diversity per split — Shannon entropy of the source
    // mixture inside each x19 split; the one-number mixture score next
    // to x115's cell-level chi-square.
    "x135_split_diversity" -> (Sampling.splitDiversityQuery _),
    // x136: effective token mass under exact dedup — each identical-
    // content family's tokens counted once, credit split over copies;
    // the post-dedup mixture-weighting input.
    "x136_effective_tokens" -> (Dedup.effectiveTokensQuery _),
    // x137: hybrid retrieval fusion — lexical 3-gram rank + exact
    // cosine rank merged by reciprocal-rank fusion (no score
    // calibration; rank is the only currency).
    "x137_hybrid_rrf"     -> (TextSearch.hybridQuery _),
    // x138: one label-propagation step over the x114 link graph with
    // x119's host verdicts as seeds — guilt-by-association labeling
    // for hosts the content model never saw.
    "x138_label_prop"     -> (WebPrep.labelPropagationQuery _),
    // x139: CCNet-style line-level dedup — corpus-repeated fixed-width
    // lines drop everywhere, documents reassemble from what survives.
    "x139_line_dedup"     -> (Dedup.lineDedupQuery _),
    // x140: top-k retrieval in the Johnson-Lindenstrauss-projected
    // space (64 -> 32 dims) — the index-shrinking move; recall vs the
    // exact x05 answer is spec- and bench-tracked.
    "x140_jl_knn"         -> (Similarity.jlKnnQuery _),
    // x141: per-epoch deterministic training order — a reproducible
    // full permutation per epoch, ranked by the distributed grouped
    // prefix scan (no one-task-per-epoch window sort).
    "x141_epoch_order"    -> (Sampling.epochOrderQuery _),
    // x142: deterministic BERT-style 15% masking — the same positions
    // mask on every engine/run/worker; masked text pinned by md5.
    "x142_mlm_mask"       -> (DocPrep.mlmMaskQuery _),
    // x143: the pack manifest — x21's bins rolled to pack grain with
    // doc-boundary offsets, the dataloader's consumption format.
    "x143_pack_manifest"  -> (Sampling.packManifestQuery _),
    // x144: the dedup threshold sweep — pairs surviving each Jaccard
    // cut from one pass over x46's verified-pair table.
    "x144_threshold_sweep" -> (Dedup.thresholdSweepQuery _),
    // x145: triangles + clustering coefficient per host — the density
    // signature separating link farms (cliques) from organic hubs.
    "x145_triangles"      -> (WebPrep.triangleQuery _),
    // x146: SFT turn-pair extraction — alternating (prompt, response)
    // adjacent turns per thread, the step x125's audit gates.
    "x146_sft_pairs"      -> (Analytics.sftPairsQuery _),
    // x147: the Gopher rule battery (Rae et al. 2021) — all-integer
    // published quality gates, every metric emitted beside the verdict.
    "x147_gopher_rules"   -> (TextAnalysis.gopherQuery _),
    // x148: Flesch-style readability — vowel-group syllables, [.!?]+
    // sentences, each ratio one round-at-6 division (x134 discipline).
    "x148_readability"    -> (TextAnalysis.readabilityQuery _),
    // x149: split gram-leakage summary — distinct 4-grams shared
    // between every x19 split pair, the release-note contamination
    // headline over x69's doc-pair listing.
    "x149_gram_leakage"   -> (Sampling.gramLeakageQuery _),
    // x150: curriculum length bands — global (n_tokens, doc_id) rank
    // via the distributed prefix scan (constant group), integer
    // quartile band edges.
    "x150_curriculum"     -> (Sampling.curriculumQuery _),
    // x151: contamination excision — x16's hit spans CUT from the
    // document instead of dropping it; reassembly audit grain (x139).
    "x151_contam_excise"  -> (Dedup.exciseQuery _),
    // x152: per-doc leakage probe — the doc-grain drill-down under
    // x149's split-pair headline (which documents leak, into which
    // split, by how many grams); hashed-gram join, hit-grain output.
    "x152_leak_probe"     -> (Sampling.leakProbeQuery _),
    // x153: DSIR importance weights — per-doc avg log-ratio of
    // target-vs-raw hashed-token likelihood (Xie et al. 2023); the
    // importance-resampling signal behind target-driven data selection.
    "x153_dsir_weights"   -> (Sampling.dsirQuery _),
    // x154: within-doc duplicate-line signals — the Gopher dup-line
    // rule grain between x12 (tokens) and x139 (corpus lines); exact
    // integer line/token repeat mass per document.
    "x154_line_rep"       -> (Dedup.lineRepetitionQuery _),
    // x155: seed-labeled NB quality classifier (CCNet/fastText) —
    // hashed unigram+bigram features, curated-vs-crawl log-odds plus
    // prior, and the gate decision; x153's supervised counterpart.
    "x155_nb_quality"     -> (TextAnalysis.nbQualityQuery _),
    // x156: DoReMi-style domain reweighting — one exponentiated-
    // gradient step on the mixture, driven by each source's excess
    // cross-entropy under the corpus token model; x68's needs-based
    // upgrade.
    "x156_doremi"         -> (Sampling.doremiQuery _),
    // x157: exact-substring self-dedup (Lee et al. 2022) — every
    // corpus-repeated k-gram span cut from all but its globally first
    // occurrence; the rewrite x13 only counts.
    "x157_self_excise"    -> (Dedup.selfExciseQuery _),
    // x158: embedding principal axis + per-vector projection — power
    // iteration on the exact decimal Gram matrix (drift/whitening/
    // anisotropy audits); only d² rows ever cross the wire.
    "x158_pca_proj"       -> (Similarity.pcaProjectionQuery _),
    // x159: CCNet perplexity buckets — the x67 LM score turned into
    // the published head/middle/tail curation grain via the
    // distributed global rank; samplers consume the band.
    "x159_ccnet_buckets"  -> (Sampling.ccnetBucketsQuery _),
    // x160: the data-budget plan — x156's mixture weights turned into
    // per-domain token allocations under a training budget and the
    // published ~4-epoch repeat cap; the provisioning table.
    "x160_data_budget"    -> (Sampling.dataBudgetQuery _),
    // x161: iterated BPE vocabulary induction — k full merge rounds
    // over the corpus; the output IS the trained tokenizer's merge
    // table (x109 is one round's statistic, x161 runs the loop).
    "x161_bpe_merges"     -> (TextAnalysis.bpeMergeQuery _),
    // x162: top-two principal components by Hotelling deflation — the
    // 2-D PCA map (cluster structure, drift plane) with x158's
    // cross-engine exactness budget.
    "x162_pca_two"        -> (Similarity.pcaProjection2Query _),
    // x163: one-scan quality panel — x147/x148/x154/x97 fused into a
    // single narrow projection (the run-all-audits release job reads
    // the corpus once, not four times).
    "x163_quality_panel"  -> (TextAnalysis.qualityPanelQuery _),
    // x164: encoding-damage audit — replacement-char / control-byte /
    // layout-run battery, the "is this even text" gate before any
    // model-based filter (deterministically planted damage).
    "x164_encoding"       -> (DocPrep.encodingQuery _),
    // x165: context-length provisioning sweep — the truncation-vs-
    // padding tradeoff curve over candidate max_len values (x113 is
    // one point of this table).
    "x165_context_sweep"  -> (DocPrep.contextSweepQuery _),
    // x166: T5-style span corruption — stride-aligned cells, unique
    // <extra_id_k> sentinels, deterministic hash-driven spans (x142
    // is the BERT token-grain sibling).
    "x166_span_corrupt"   -> (DocPrep.spanCorruptQuery _),
    // x167: Bradley-Terry preference-strength fit — the RLHF
    // comparison-data quality ladder (MM fixed point on the collected
    // pair table; the planted winner rule IS a BT model).
    "x167_bradley_terry"  -> (Analytics.bradleyTerryQuery _),
    // x168: per-source quality scorecard — the x163 panel rolled up
    // to the per-feed dashboard (same one-scan projection, one
    // |sources|-key aggregate on top).
    "x168_source_scorecard" -> (TextAnalysis.sourceScorecardQuery _),
    // x169: cross-corpus near-dup probe — the bipartite x46: which
    // candidate docs near-duplicate the frozen reference corpus
    // (the pre-ingestion "do we already have this" acceptance audit).
    "x169_cross_probe"    -> (Dedup.crossProbeQuery _),
    // x170: bipartite SemDeDup — the SEMANTIC tier of the acceptance
    // audit: candidate-vs-frozen-reference drop verdicts under the
    // reference-fit x78 codebook (paraphrased duplicates the surface
    // x169 probe structurally misses).
    "x170_sem_probe"      -> (Similarity.crossSemProbeQuery _),
    // x171: x169's incremental form — the delivery probes the frozen
    // reference gram index (grams/df/sizes) instead of refusing the
    // union each time; result-identical to x169 by construction.
    "x171_cross_probe_incr" -> (Dedup.crossProbeIncrQuery _),
    // x172: upset scoring against the frozen x167 ladder — expected
    // win probability + upset flag per comparison (the live rater/
    // variant drift monitor's batch face).
    "x172_bt_upsets"      -> (Analytics.btUpsetsQuery _),
    // x173: x165's provisioning decision made executable — the sweep's
    // constrained-argmax context length becomes x21's truncation cap
    // and bin budget.
    "x173_pack_winner"    -> (Sampling.packWinnerQuery _),
    // x174: the delivery acceptance REPORT — exact (x106 grain) +
    // surface (x169) + semantic (x170) tiers fused into one
    // per-candidate verdict (reject / review / admit), composed from
    // the proven tier faces so it cannot drift from them.
    "x174_acceptance"     -> (Dedup.acceptanceQuery _),
    // x176: the acceptance battery at PER-DOCUMENT grain — the live
    // ingestion gate's batch face (per-doc rarity: frozen reference
    // df + 1, because a live gate cannot know the rest of the
    // delivery; everything downstream of rarity is x174's shared code).
    "x176_acceptance_gate" -> (Dedup.acceptanceGateQuery _),
    // x177: calibration audit — reliability diagram + ECE (Guo et al.
    // 2017) over (confidence, correct) pairs; the reward-model check
    // run before trusting scores to gate data.
    "x177_calibration"    -> (Analytics.calibrationQuery _),
    // x178: semantic-index drift check — PSI over the frozen codebook's
    // cluster-occupancy bins (reference vs recent sample), the
    // scheduled-rebuild trigger x175's frozen-codebook maintenance
    // defers to.
    "x178_sem_drift"      -> (Similarity.semDriftQuery _),
    // x179: acceptance LEDGER — the cross-delivery diff of two x174
    // report generations (verdict-mix deltas + PSI), the release-notes
    // audit trail a curation pipeline keeps per delivery.
    "x179_acceptance_ledger" -> (Dedup.acceptanceLedgerQuery _),
    // x180: the x170 semantic probe at an nProbe>1 budget — the
    // runner-up cluster buys back the Voronoi-boundary paraphrases the
    // rank-1 probe structurally misses (IVF nProbe discipline on the
    // same index artifact).
    "x180_sem_probe_budget" -> (Similarity.crossSemProbeBudgetQuery _),
    // x181: tier ATTRIBUTION over the acceptance report — the "why"
    // breakdown (exact/surface/sem firing combinations with counts and
    // shares) a curator reads next to the verdict mix.
    "x181_tier_breakdown" -> (Dedup.acceptanceTierQuery _),
    // x182: the x179 x x181 composition — the cross-delivery PSI
    // movement attributed per tier-firing combination, so the ledger
    // diff says WHICH tier drove the shift, not just that one happened.
    "x182_tier_shift"     -> (Dedup.acceptanceTierShiftQuery _),
  )

  /** Queries with no DuckDB oracle (engine-specific hashing: xxhash64
    * signatures / LSH bucket assignment / Datasketches HLL estimates).
    * The driver records a rows-only check; semantic coverage lives in
    * ScalaTest (known-dup recall, ANN recall vs brute force, sketch
    * accuracy + mergeability). */
  val rowsOnly: Set[String] =
    Set("x02_minhash_pairs", "x04_simhash", "x06_ann_lsh", "x06_ann_ivf",
      "x15_hll_rollup", "x17_quant_knn", "x49_kll_quantiles",
      "x51_media_probe", "x54_freq_topk", "x129_media_resize",
      "x140_jl_knn")

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    RelationalOracle.sql ++ ExtrasOracle.sql ++
      Map("q20_sensor_pipeline" -> Fixtures.q20OracleSql)
}

/** Committed deterministic fixtures (tools/gen_sensor_fixture.py). */
object Fixtures {
  val sensorNdjson = "/root/repo/data/sensor_readings.ndjson"
  val sensorDirtyNdjson = "/root/repo/data/sensor_readings_dirty.ndjson"
  val sensorDim = "/root/repo/data/sensor_group.csv"
  /** 7x5 RGB PNG (committed) for the real ImageIO decode path. */
  val tinyPng = "/root/repo/data/tiny_7x5.png"
  /** 220-frame 8kHz mono WAV (committed) for the real audio decode path. */
  val tinyWav = "/root/repo/data/tiny_220f.wav"
  /** 4-frame 9x7 animated GIF (committed; generator at
    * tools/MakeGifFixture.java) for the real video frame decode path.
    * Frame f is a solid color: red, green, blue, yellow. */
  val tinyGif = "/root/repo/data/tiny_9x7_4f.gif"
  /** 2-frame INTER-FRAME-OPTIMIZED GIF (10x8 logical screen, all red;
    * frame 1 stored as only a 4x3 green changed-rect patch at (2,1)) —
    * the shape real GIF optimizers emit; exercises frame compositing. */
  val tinyGifPatch = "/root/repo/data/tiny_10x8_patch.gif"

  /** DuckDB image of SensorPipeline.run over the same fixture files. */
  val q20OracleSql: String =
    s"""WITH src AS (
       |  SELECT * FROM read_json('$sensorNdjson',
       |    format='newline_delimited',
       |    columns={id:'INTEGER', uptime:'INTEGER', "T":'INTEGER', "P":'INTEGER',
       |             "H":'INTEGER', "Ix":'INTEGER', "Iy":'INTEGER', "Iz":'INTEGER',
       |             "M":'INTEGER', time_received:'TIMESTAMP', seq:'BIGINT'})),
       |dim AS (
       |  SELECT sensor_id, trim(group_id) AS group_id
       |  FROM read_csv('$sensorDim', header=true,
       |    columns={sensor_id:'INTEGER', group_id:'VARCHAR'})),
       |renamed AS (
       |  SELECT time_received, d.group_id AS sensor_group, s.id AS sensor_id, s.uptime,
       |         s."T" AS temperature, s."P" AS pressure, s."H" AS humidity,
       |         s."Ix" AS ix, s."Iy" AS iy, s."Iz" AS iz, s."M" AS mask, s.seq
       |  FROM src s JOIN dim d ON s.id = d.sensor_id)
       |SELECT time_received, sensor_group, sensor_id, uptime, temperature, pressure,
       |       humidity, ix, iy, iz, mask
       |FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY sensor_group, sensor_id, time_received
       |                                   ORDER BY seq DESC) rn FROM renamed)
       |WHERE rn = 1
       |ORDER BY sensor_group, sensor_id, time_received""".stripMargin
}
