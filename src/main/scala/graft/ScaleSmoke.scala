package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Dev harness (like [[PerfLab]], not graded): scale-smoke the dedup
 * family at Nx the sf0.1 corpus by unioning id-shifted copies —
 * checks that candidate volumes and wall-clock grow roughly linearly
 * (bucketed candidate generation), not quadratically, as the 100 TB
 * design claims. Shifted copies are exact near-dup families by
 * construction, so this also stresses the mass-duplicate path.
 *
 *   SPARK_GRAFT_SCALE=10 sbt "runMain graft.ScaleSmoke"
 *
 * `SPARK_GRAFT_SMOKE_ONLY=ngram,minhash` restricts to ops whose name
 * starts with a listed prefix — the 100x runs (r7 verdict item 5) push
 * one family at a time well past the 10x table without paying for the
 * rest of the list.
 *
 * `SPARK_GRAFT_SMOKE_MODE=disjoint` suffixes every TOKEN of copy i
 * with a copy tag, so copies share no shingles: per-shingle df stays
 * at its 1x value and the corpus is genuinely N× larger — the
 * independent-growth axis. The default (`dup`) keeps copies
 * byte-identical — the mass-duplicate axis. The two modes bracket a
 * real crawl: at 100x the dup axis is DEGENERATE BY DESIGN for the
 * shingle detectors (every cross-copy shingle's df is ≥ mult > the
 * stop-shingle cap of 50, so candidate generation finds nothing — the
 * cap doing exactly its anti-quadratic job; `text_exact_then_lsh`
 * shows the production answer), so 100x growth curves are measured on
 * the disjoint axis.
 */
object ScaleSmoke {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val mult = sys.env.getOrElse("SPARK_GRAFT_SCALE", "10").toInt
    val only = sys.env.get("SPARK_GRAFT_SMOKE_ONLY")
      .map(_.split(",").toSeq.filter(_.nonEmpty))
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val mode = sys.env.getOrElse("SPARK_GRAFT_SMOKE_MODE", "dup")
    val base = graft.ingest.Tables.documents(spark, sfDir)
      .select("doc_id", "text", "lang", "source")
    val big = (0 until mult).map { i =>
      val shifted =
        base.withColumn("doc_id", col("doc_id") + lit(i.toLong * 1000000L))
      if (mode == "disjoint")
        shifted.withColumn("text",
          regexp_replace(col("text"), "([^ ]+)", "$1c" + i))
      else shifted
    }.reduce(_ union _)
    val n = big.count()
    // Heap high-water per op: reset the per-pool peak counters before,
    // read-and-sum after — the "does the plan fit" number the 100 TB
    // claim needs alongside wall-clock (executor memory is the binding
    // constraint on a real cluster, not the driver's).
    import scala.jdk.CollectionConverters._
    def heapPools = java.lang.management.ManagementFactory
      .getMemoryPoolMXBeans.asScala
      .filter(_.getType == java.lang.management.MemoryType.HEAP)
    def time(name: String)(df: => DataFrame): Unit = {
      if (only.forall(_.exists(name.startsWith))) {
        heapPools.foreach(_.resetPeakUsage())
        val t0 = System.nanoTime()
        val rows = df.count()
        val peakGb = heapPools.map(_.getPeakUsage.getUsed).sum / 1e9
        println(f"[scale-smoke] $name%-28s ${(System.nanoTime() - t0) / 1e9}%7.1f s  $rows%10d rows  ($n docs, peak heap $peakGb%.1f GB)")
        graft.ops.Reuse.freeAll(spark)
      }
    }
    time("exact_dedup") { graft.ops.Dedup.exact(big) }
    time("ngram_jaccard_pairs") { graft.ops.Dedup.ngramJaccard(big) }
    time("minhash_lsh_pairs") { graft.ops.Dedup.minhashLsh(big) }
    // The production text-dedup composition (mirror of
    // embed_exact_then_lsh below): EXACT dedup first — identical texts
    // collapse to one keeper via a single keyed shuffle on the content
    // hash — then banded LSH only on the survivors. Shifted copies are
    // byte-identical, so each mult-sized family shares every band and
    // in-bucket candidate generation alone is quadratic in family size;
    // removing exact copies first is what keeps the LSH stage linear at
    // any corpus redundancy.
    time("text_exact_then_lsh") {
      val keepers = big.groupBy(md5(col("text")).as("h"))
        .agg(min("doc_id").as("doc_id"))
      graft.ops.Dedup.minhashLsh(big.join(keepers.select("doc_id"), "doc_id"))
    }
    time("simhash_pairs") { graft.ops.Dedup.simhashPairs(big) }
    time("simhash_pairs_wide") { graft.ops.Dedup.simhashPairsWide(big) }
    time("dedup_clusters") {
      graft.ops.Components.connectedComponents(
        graft.ops.Dedup.minhashLsh(big).select("id_a", "id_b"))
    }
    time("lm_quality") { graft.ops.TextOps.lmQuality(big) }
    // r5 additions. Winnowing and chunking are per-doc local (expect
    // linear); leakage-safe split rides the LSH pair graph + components
    // (the cluster-map join must stay broadcast/linear); shard
    // assignment's sort parallelism is nShards — smoked at 64 shards so
    // the per-shard sort, not an 8-task bottleneck, is what's measured.
    time("winnowing_fps") { graft.ops.TextOps.winnowingFingerprints(big) }
    time("chunk_overlap") { graft.ops.TextOps.chunkWithOverlap(big) }
    time("leakage_safe_split") {
      graft.ops.Splits.assignLeakageSafe(big,
        graft.ops.Dedup.minhashLsh(big).select("id_a", "id_b"))
    }
    time("shard_assign_64") {
      graft.ops.Splits.shardAssign(big, col("doc_id"), 64)
    }
    time("boilerplate_removal") {
      graft.ops.TextOps.boilerplateRemoval(big)
    }
    time("hist_quantiles") {
      graft.ops.Sketches.logHistogramQuantiles(big, Seq("lang"),
        length(col("text")))
    }
    // r6 additions: both are single keyed aggregates — expect flat-ish
    // wall-clock and row counts bounded by strata/shards, not corpus.
    time("token_ledger") {
      graft.ops.Sampling.tokenLedger(big, 10000000L, Seq("source"))
    }
    time("shard_manifest_64") {
      graft.ops.Splits.shardManifest(big, col("doc_id"), 64)
    }
    // r7 additions (r6 verdict item 3). Novelty: the df aggregate is one
    // long per distinct shingle and the shifted copies make every
    // shingle's df >= mult — expect near-linear time and EVERY novelty
    // score 0 (nothing is unique in a corpus of exact copies: the
    // mass-duplicate degenerate case, confirmed by row count == docs).
    // Source overlap: the shifted copies stay within their source, so
    // distinct (source, shingle) is ~flat vs 1x while the key-df cap's
    // input grows 10x — what's measured is the capped join holding its
    // maxKeyFreq^2 fan-out bound (output stays <= |sources|^2 rows).
    time("novelty_scores") { graft.ops.Dedup.noveltyScores(big) }
    time("source_overlap") { graft.ops.Dedup.keyOverlap(big) }
    // r8 additions. dup_span_mass: in dup mode every span is shared
    // with the doc's 9 copies, so the degenerate check is the mirror
    // of novelty's (all coverage 1e6, rows == docs); the min/max-per-h
    // aggregate and the 1:1 join back are the only corpus-sized work.
    // pii_audit: stateless codegen scan, |sources| output rows.
    time("dup_span_mass") { graft.ops.Dedup.dupSpanMass(big) }
    time("pii_audit") { graft.ops.TextOps.piiAudit(big) }
    // Surgery reconstructs every doc: in dup mode all but the lowest
    // copy of each family empty to '' (everything they hold is kept by
    // an earlier doc), so output rows == docs with ~(mult-1)/mult of
    // token mass cut — the degenerate check — and the cost is the
    // token-level reassembly aggregate on top of dup_span_mass's scan.
    time("dup_span_surgery") { graft.ops.Dedup.dupSpanSurgery(big) }
    // Output bounded at depth x width cells no matter the corpus —
    // the broadcast-sized-artifact claim, measured.
    time("countmin_counters") { graft.ops.Sketches.countMinCounters(big) }
    // Embeddings family at Nx: shifted copies are exact duplicate
    // vectors, so each id-family is a planted all-pairs near-dup
    // cluster (the mass-duplicate stress case for banded LSH).
    val baseEmb = graft.ingest.Tables.embeddings(spark, sfDir)
      .select("vec_id", "embedding")
    val bigEmb = (0 until mult).map { i =>
      baseEmb.withColumn("vec_id", col("vec_id") + lit(i.toLong * 1000000L))
    }.reduce(_ union _)
    println(s"[scale-smoke] embeddings: ${bigEmb.count()} vectors")
    time("random_projection") {
      graft.ops.Similarity.randomProject(bigEmb)
    }
    // ext16's compact default (16 bits / 4-bit bands = 16 buckets per
    // band) saturates at this density — ~1250 vectors per bucket makes
    // the banded self-join near-quadratic. The production setting
    // widens the bands exactly like simhashPairsWide: 32 bits / 8-bit
    // bands = 256 buckets per band, same plan shape, same recall
    // structure (4 bands).
    time("embed_neardup_pairs") {
      graft.ops.Similarity.cosineNearDupPairs(bigEmb)
    }
    time("embed_neardup_wide") {
      graft.ops.Similarity.cosineNearDupPairs(bigEmb,
        nBits = 32, bandBits = 8)
    }
    // The production composition: EXACT dedup first (identical vectors
    // collapse to one keeper — one keyed shuffle on a vector hash), LSH
    // near-dup only on the survivors. A mass-duplicate family shares
    // every band at ANY band width (the bucket IS the family), so
    // banded candidate generation alone is quadratic in family size;
    // removing exact copies first is how a real pipeline keeps the LSH
    // stage linear. (xxhash64 here is engine-local — fine for a smoke;
    // the oracle-checked exact dedup hashes text via md5, ext01.)
    time("embed_exact_then_lsh") {
      val q = bigEmb.select(col("vec_id"),
        graft.ops.Similarity.quantize(col("embedding")).as("q"))
      val keepers = q.groupBy(xxhash64(col("q")).as("qh"))
        .agg(min("vec_id").as("vec_id"))
      val kept = bigEmb.join(keepers.select("vec_id"), "vec_id")
      graft.ops.Similarity.cosineNearDupPairs(kept)
    }
    // r7 label-audit family. Shifted copies keep their label, so the
    // per-label centroids are IDENTICAL to 1x (the mean of a duplicated
    // set) — what must grow linearly is the centroid build's posexplode
    // + the scoring scan; output stays |labels| * topN rows at any
    // mult. The kNN audit is a FIXED 20-query broadcast against the
    // grown corpus — linear scan, output 20 rows at any mult.
    val bigEmbL = (0 until mult).map { i =>
      graft.ingest.Tables.embeddings(spark, sfDir)
        .withColumn("vec_id", col("vec_id") + lit(i.toLong * 1000000L))
    }.reduce(_ union _)
    time("label_centroid_outliers") {
      graft.ops.LabelAudit.labelCentroidOutliers(bigEmbL)
    }
    time("knn_label_audit_20q") {
      graft.ops.LabelAudit.knnLabelAudit(bigEmbL,
        bigEmbL.filter(col("vec_id") < 20), 5)
    }
    // r8: two full rankings + a rank-set join; output is one row at
    // any corpus size, cost is the two linear broadcast-query scans.
    time("int8_fidelity_20q") {
      graft.ops.Similarity.int8FidelityAudit(bigEmbL,
        bigEmbL.filter(col("vec_id") < 20), 3)
    }
    // r7 ext78-81 additions. packEfficiency: one scan, |budgets| output
    // rows at any mult. dedupWeights: the cluster map at Nx rides the
    // (already-timed) LSH pair graph; what's added is one cluster-keyed
    // count + one doc-keyed join — expect linear, output == docs.
    // oovRate: instance counts grow Nx but the TYPE set is constant, so
    // the relative threshold scales with the corpus and the rare set
    // stays the same types — linear explode+join, output == docs.
    // snapshotDiff: shifted copies carry identical TEXT, so both halves
    // collapse to the same distinct-hash set — output lands all-`both`
    // at any mult (the degenerate mass-duplicate case), and the distinct
    // is the only corpus-sized work.
    time("pack_efficiency") {
      graft.ops.Packing.packEfficiency(big,
        size(split(col("text"), " ")), Seq(128L, 512L, 1024L))
    }
    time("dedup_weights") {
      graft.ops.Dedup.dedupWeights(big,
        graft.ops.Components.connectedComponents(
          graft.ops.Dedup.minhashLsh(big).select("id_a", "id_b"))
          .select(col("id").as("doc_id"), col("cluster_id")))
    }
    time("oov_rate") { graft.ops.TextOps.oovRate(big) }
    time("snapshot_diff") {
      graft.ops.Dedup.snapshotDiff(
        big.filter(col("doc_id") % 2 === 0),
        big.filter(col("doc_id") % 2 === 1))
    }
    // r8 batch-2 additions (ext101-107).
    // semdedup: shifted copies are IDENTICAL vectors, so every family
    // lands whole in one kmeans bucket — the within-bucket pair join is
    // quadratic in family size (the mass-duplicate hazard every banded
    // detector shares); the measured number prices it, and the exact-
    // first composition (embed_exact_then_lsh above) is the production
    // answer here too. Expect all non-min copies dropped (kept ==
    // base-corpus keeps).
    time("semdedup") {
      graft.ops.Similarity.semDedup(bigEmb,
        graft.ops.Similarity.kmeansBuckets(bigEmb))
    }
    // rebalanced twin of the fixed-k exclusion (r9 verdict item 1):
    // one hierarchical split level caps bucket size, so the dup-mode
    // 100x row that was a reasoned exclusion at fixed k=8 is a
    // runnable number — the pair join's worst term is bounded by the
    // cap, not by corpus/k. A child still over the cap (an identical
    // family larger than the cap cannot split — every copy is
    // equidistant to every centroid; that floor is exact dedup's job)
    // would take a second application of the same operator.
    time("semdedup_rebalanced") {
      val bk = graft.ops.Similarity.kmeansBuckets(bigEmb)
        .localCheckpoint(true)
      val reb = graft.ops.Similarity.splitOversizedBuckets(bigEmb, bk,
        maxBucket = 2000L, split = 32).localCheckpoint(true)
      graft.ops.Similarity.semDedup(bigEmb, reb)
    }
    // pq encode: one linear scan + broadcast M×K codebook argmin;
    // output = M rows per vector at any mult. The Lloyd's build cost
    // is the same m-keyed chain at Nx input.
    time("pq_encode") {
      graft.ops.Similarity.pqCodes(bigEmb,
        graft.ops.Similarity.pqCodebooks(bigEmb))
    }
    // fixed 20-query audit against the grown corpus: linear scans,
    // 1-row output at any mult (the ext93 smoke's shape).
    time("pq_fidelity_20q") {
      graft.ops.Similarity.pqFidelityAudit(bigEmbL,
        bigEmbL.filter(col("vec_id") < 20), 3)
    }
    // bloom probe: bench/bit sets are FIXED (the base corpus' docs
    // < 20); the corpus side grows Nx but never shuffles for the
    // membership probe — expect linear, 1-row card.
    time("bloom_decontaminate") {
      graft.ops.Sketches.bloomContaminationAudit(
        big.filter(col("doc_id") % 1000000L >= 20),
        base.filter(col("doc_id") < 20))
    }
    // vocab overlap: in dup mode the TYPE set is constant while
    // instances grow Nx — the explode+count is the only corpus-sized
    // work, the pair join stays vocab-bounded, output C(|langs|,2).
    time("vocab_overlap") { graft.ops.TextOps.vocabOverlap(big) }
    // per-doc repetition card: doc-local everywhere — expect linear,
    // rows == docs.
    time("gopher_repetition") {
      graft.ops.TextOps.gopherRepetitionCard(big)
    }
    // cap audit: WindowGroupLimit kept-side + plain totals agg — the
    // point is that NO full per-stratum sort appears at Nx.
    time("cap_audit_15") {
      graft.ops.Sampling.capAudit(big, Seq("source"), col("doc_id"),
        size(split(col("text"), " ")).cast("long"), 15)
    }
    // normalization dups: two corpus-distincts on md5 digests — the
    // only corpus-sized state; in dup mode distinct counts stay at the
    // 1x values (copies collapse), the degenerate check.
    time("normalization_dups") {
      graft.ops.TextOps.normalizationDupCard(big)
    }
    // bpe learn: ONE corpus pass builds the word-frequency table; in
    // dup mode the TYPE set (and so the whole iterating symbol state)
    // is IDENTICAL to 1x — only the counts scale — so the rounds'
    // cost must stay ~flat while the initial pass grows Nx: the
    // "state is the vocab, not the data" claim, measured.
    time("bpe_merges_3") { graft.ops.TextOps.bpeMerges(big, 3) }
    // r9 additions (r8 verdict items 4 and 6): the batch-3 family's
    // claimed scale shapes, measured past 10x.
    // containment: shares ngramJaccard's one bucketed shingle pass and
    // its in-list pair combos under the stop-shingle cap; like the
    // other shingle detectors its dup-mode curve is degenerate by
    // design (cap kills cross-copy shingles) — growth is measured on
    // the disjoint axis.
    time("containment_pairs") { graft.ops.Dedup.containmentPairs(big) }
    // signal correlation: ONE map-side-combined moment aggregate over
    // the scan; output C(4,2) rows at any corpus size — wall-clock
    // must track the scan, the pair tail is constant.
    time("signal_correlation") {
      graft.ops.Reporting.signalCorrelations(big, Seq(
        "n_toks" -> size(split(col("text"), " ")).cast("long"),
        "n_chars" -> length(col("text")).cast("long"),
        "ttr_ppm" -> expr("(size(array_distinct(split(text, ' '))) " +
          "* 1000000) DIV size(split(text, ' '))"),
        "wlen_ppm" -> expr("((length(text) - (size(split(text, ' ')) " +
          "- 1)) * 1000000) DIV size(split(text, ' '))")))
    }
    // bpe at tokenizer-ish depth (select via
    // SPARK_GRAFT_SMOKE_ONLY=bpe_merges_32): every round is keyed on
    // `word` over the vocab-bounded symbol state, so per-round cost
    // must stay ~flat from rank 1 to rank 32 — the flat-round-cost
    // claim at depth, not just at nMerges=3.
    time("bpe_merges_32") { graft.ops.TextOps.bpeMerges(big, 32) }
    // the composed retrieval operator (ext117): fixed 20-query probe
    // against the grown corpus — the ADC scan reads M codes per target
    // restricted to probed buckets; output <= 60 rows at any mult.
    time("ivfpq_topk_20q") {
      val idx = graft.ops.Similarity.kmeansProbeBuckets(bigEmbL,
        k = 8, iters = 2, probes = 2).localCheckpoint(true)
      graft.ops.Similarity.ivfPqTopK(bigEmbL,
        bigEmbL.filter(col("vec_id") < 20), idx, 3)
    }
    // rebalance THREADED THROUGH the composed retrieval (r10 verdict
    // item 7): same fixed 20-query probe, but the coded corpus is
    // bucket-tagged with the SPLIT assignment and each query's parent
    // probe fans out to the child buckets (ivfPqTopKRebalanced —
    // layout-transparent, spec-asserted == unsplit at test SF). In dup
    // mode every identical-vector family lands whole in one bucket, so
    // the unsplit probe drags the entire family through ADC + rerank
    // per query; the cap bounds the probed candidate mass per child.
    time("ivfpq_rebalanced_20q") {
      val idx = graft.ops.Similarity.kmeansProbeBuckets(bigEmbL,
        k = 8, iters = 2, probes = 2).localCheckpoint(true)
      val reb = graft.ops.Similarity.splitOversizedBuckets(bigEmbL,
          idx.filter(col("probe_rank") === 1).select("vec_id", "bucket"),
          maxBucket = 2000L, split = 32).localCheckpoint(true)
      graft.ops.Similarity.ivfPqTopKRebalanced(bigEmbL,
        bigEmbL.filter(col("vec_id") < 20), idx, reb, split = 32, k = 3)
    }
    // prototype pruning (ext119): centroid build + broadcast scoring
    // are linear; the per-bucket rank sort is the exact-rank price —
    // output == vectors at any mult.
    time("prototype_pruning") {
      val bk = graft.ops.Similarity.kmeansBuckets(bigEmb)
        .localCheckpoint(true)
      graft.ops.Similarity.prototypePruning(bigEmb, bk, keep = "hard")
    }
    // knn density (ext120): the same-bucket pair join is quadratic in
    // bucket size — in dup mode every identical-vector family lands
    // whole in one bucket (the semdedup mass-duplicate hazard, and the
    // same production answer: exact-dedup first, k grows with the
    // corpus). The 10x number prices it; 100x takes semdedup's
    // reasoned exclusion at fixed k=8.
    time("knn_density") {
      val bk = graft.ops.Similarity.kmeansBuckets(bigEmb)
        .localCheckpoint(true)
      graft.ops.Similarity.knnDensity(bigEmb, bk, 5)
    }
    // rebalanced twin (r9 verdict item 1) — same story as
    // semdedup_rebalanced: the split cap bounds the same-bucket pair
    // join that made fixed-k=8 knn density a 100x dup-mode exclusion.
    time("knn_density_rebalanced") {
      val bk = graft.ops.Similarity.kmeansBuckets(bigEmb)
        .localCheckpoint(true)
      val reb = graft.ops.Similarity.splitOversizedBuckets(bigEmb, bk,
        maxBucket = 2000L, split = 32).localCheckpoint(true)
      graft.ops.Similarity.knnDensity(bigEmb, reb, 5)
    }
    // semantic decontamination (ext122): fixed 20-vector bench
    // broadcast against the grown corpus — one linear scan, rows ==
    // corpus (the bloom_decontaminate shape in embedding space).
    time("semantic_decontaminate") {
      graft.ops.Similarity.semanticDecontaminate(
        bigEmbL.filter(col("vec_id") % 1000000L >= 20),
        baseEmb.filter(col("vec_id") < 20))
    }
    // anneal ledger (ext121): one keyed counts aggregate + two
    // broadcast totals — |strata| x 2 rows at any mult.
    time("anneal_ledger") {
      graft.ops.Sampling.annealLedger(big, 10000000L, 100000L,
        Seq("source"))
    }
    // within-doc repetition surgery (ext123): doc-local everywhere —
    // expect linear, rows == docs; in dup mode every copy's intra-doc
    // structure is identical, so per-doc outputs repeat exactly.
    time("repetition_surgery") {
      graft.ops.Dedup.repetitionSurgery(big)
    }
    // r12 additions. k-center: k map-only rounds + TakeOrdered(1)
    // argmax each — expect linear in corpus at constant round count
    // (driver state = k vectors); in dup mode duplicate vectors tie at
    // distance 0 and the min-id tie-break keeps selection stable.
    time("kcenter_coreset") {
      graft.ops.Similarity.kCenterCoreset(bigEmb)
    }
    // balanced folds: group masses map-side combine, TakeOrdered head,
    // broadcast head join + hash-projection tail — linear; the cluster
    // side rides the same LSH pair graph as leakage_safe_split.
    time("balanced_folds") {
      graft.ops.Splits.balancedFolds(big,
        graft.ops.Components.connectedComponents(
          graft.ops.Dedup.minhashLsh(big).select("id_a", "id_b"))
          .select(col("id").as("doc_id"), col("cluster_id")),
        5, length(col("text")))
    }
    // code-switch segments: doc-local posexplode, window scores
    // collapse map-side, bounded per-doc window relation — expect
    // linear; per-copy segment structure repeats exactly in dup mode.
    time("lang_segments") {
      graft.ops.TextOps.langSegments(big)
    }
    // r13 (r12 verdict item 4): TextRank at Nx — the last iterative
    // operator without a priced 100x row. The claim: the power
    // iteration's cost is bounded by the EDGE GRAPH, not the corpus —
    // in dup mode the graph is IDENTICAL to 1x (copies add edge-count
    // mass, not vertices or edges), in disjoint mode vocab grows ~Nx
    // and the companion graph row below measures the vocab² bound
    // actually holding (natural-text adjacency is sparse: edges ≪
    // vocab², and minWout floors the vertex set).
    time("textrank") { graft.ops.TextOps.textRank(big) }
    // r13: stupid-backoff LM scoring at Nx — the claim: corpus-linear
    // (one bigram explode + three joins against vocab-bounded count
    // tables); in dup mode the LM tables are the 1x tables with count
    // mass x mult, in disjoint mode vocab grows ~mult and the tables
    // stay graph-sized either way.
    time("lm_backoff") { graft.ops.TextOps.stupidBackoffScores(big) }
    // r13: selection quantiles at Nx — the claim: ROUNDS are bounded
    // by the value-domain width (log2(max-min)), NOT the corpus, so
    // wall grows ~linearly with corpus (each round is one map-side
    // count pass) while the round count stays flat.
    time("selection_quantiles") {
      graft.ops.Sketches.selectionQuantiles(big, Seq("lang"),
        length(col("text")))
    }
    // r14 (r13 verdict item 2): ENCODE at tokenizer-ish depth — the
    // one-pass apply's claim: ONE distributed pass regardless of table
    // depth (the r13 relational replay chained one stage per rank;
    // bpe_merges_32 above prices the LEARN loop's 32 keyed rounds).
    // Cost must be ~the vocab groupBy + a per-word local replay
    // bounded by achievable merges — i.e. ~flat from depth 3 to 32,
    // and a small fraction of the learn loop's wall.
    if (only.forall(_.exists("bpe_apply".startsWith))) {
      val t32 = graft.ops.TextOps.bpeMerges(big, 32).localCheckpoint(true)
      graft.ops.Reuse.freeAll(spark)
      time("bpe_apply_3") { graft.ops.TextOps.bpeApplyCounts(big, t32, 3) }
      time("bpe_apply_32") {
        graft.ops.TextOps.bpeApplyCounts(big, t32, 32)
      }
      // production table depth (r13 verdict item 2's explicit ask): a
      // 1000-rank table — the corpus can't LEARN 1000 real merges, so
      // ranks past the learned table are never-occurring symbol pairs,
      // which is exactly how a stored web-scale table looks to any one
      // document (most ranks don't apply). Cost must stay ~flat: the
      // replay's rank-map floor scan touches only ACHIEVABLE merges.
      val t1000 = t32.unionByName(
        spark.range(32, 1000).selectExpr(
          "id AS merge_rank",
          "concat(' pad', id) AS left_sym",
          "concat(' pad', id) AS right_sym",
          "CAST(1 AS BIGINT) AS pair_count")).localCheckpoint(true)
      time("bpe_apply_1000") {
        graft.ops.TextOps.bpeApplyCounts(big, t1000, 1000)
      }
      // bpeEncodeSink throughput (the serving stream): the mult-x
      // corpus through the one-pass encode in 12 micro-batches.
      val tmpE = java.nio.file.Files.createTempDirectory("graft-bpesink")
      big.repartition(12).write.parquet(s"$tmpE/src")
      val tE0 = System.nanoTime()
      val qE = graft.stream.StreamingPipeline.bpeEncodeSink(
          graft.stream.StreamingPipeline.parquetStream(spark,
            s"$tmpE/src", maxFilesPerTrigger = Some(1)),
          t1000, 1000, s"$tmpE/out")
        .option("checkpointLocation", s"$tmpE/ckpt").start()
      qE.processAllAvailable()
      qE.stop()
      val secE = (System.nanoTime() - tE0) / 1e9
      println(f"[scale-smoke] bpe_encode_sink_1000  $secE%.1f s  " +
        f"${n / secE}%.0f docs/s  (12 batches, depth-1000 table)")
      graft.ops.Reuse.freeAll(spark)
    }
    // r14: Moore-Lewis — ONE corpus bigram explode (flag riding along)
    // feeds all four vocab-bounded count tables; scoring is two passes
    // of the lm_backoff join shape over the SAME shared bigram
    // relation: expect ~2x lm_backoff, corpus-linear.
    time("moore_lewis") {
      graft.ops.TextOps.mooreLewisScores(big, col("lang") === "en")
    }
    // r14: char entropy — one doc-local char explode into a (id, ch)
    // map-side-combined groupBy bounded by alphabet x docs (far under
    // token counts): expect linear, rows == docs.
    time("char_entropy") { graft.ops.TextOps.charEntropy(big) }
    // r14: PCA power iteration — 3 corpus scans, zero joins, 64
    // decimal rows per round; expect linear in vectors at constant
    // round count (driver state: 64 longs).
    time("pca_power") {
      graft.ops.Similarity.pcaPowerDirection(bigEmb)
    }
    // r14 batch 3: PMI — one bigram + one unigram explode into vocab-
    // bounded counts (dup mode: vocab flat, counts x mult), TakeOrdered
    // head; length bucketing — one <= ~40-key groupBy; freq spectrum —
    // vocab-bounded count table + <= 11-row class join. All linear,
    // bounded outputs.
    time("pmi_collocations") {
      graft.ops.TextOps.pmiCollocations(big)
    }
    time("length_bucketing") {
      graft.ops.Packing.lengthBucketing(big,
        size(split(col("text"), " ")))
    }
    time("freq_spectrum") { graft.ops.TextOps.freqSpectrum(big) }
    if (only.forall(_.exists("textrank".startsWith))) {
      val pairs = graft.ops.TextOps.bigramRows(big.select("text"))
        .filter(col("t1") =!= col("t2"))
        .select(col("t1").as("src"), col("t2").as("dst"))
      val und = pairs.union(
        pairs.select(col("dst").as("src"), col("src").as("dst")))
      val all = und.groupBy("src", "dst").agg(count(lit(1)).as("w"))
      val keep = all.groupBy("src").agg(sum("w").as("w0"))
        .filter(col("w0") >= 5).select("src")
      val v = keep.count()
      val e = all.join(keep, "src")
        .join(keep.select(col("src").as("dst")), "dst").count()
      println(s"[scale-smoke] textrank_graph vocab=$v edges=$e " +
        s"vocab2=${v * v} edge_fill_ppm=${
          if (v > 0) e * 1000000L / (v * v) else 0}")
      graft.ops.Reuse.freeAll(spark)
    }
    // IVF margin mining: the scored relation is Σ|bucketA|×|bucketB|
    // over shared buckets — per-label buckets grow linearly with mult,
    // so THIS number prices quadratic in-bucket candidate mass growth;
    // the production answer at larger scale is the same as semdedup /
    // knn_density: kmeansProbeBuckets + splitOversizedBuckets to cap
    // the per-bucket mass (the margin algebra consumes any ranked
    // lists — marginFromRanked is the seam).
    time("margin_mine_ivf") {
      // base-vector bucket: every dup copy lands in its base's bucket —
      // the mass-duplicate hazard case the cap answers
      val lab = bigEmb.withColumn("label",
        pmod(pmod(col("vec_id"), lit(1000000L)), lit(10L)).cast("int"))
      graft.ops.Similarity.marginMineIvf(
        lab.filter(col("vec_id") % 2 === 0),
        lab.filter(col("vec_id") % 2 === 1))
    }
    // r13 (r12 verdict item 2): the capped composition — the same
    // parity-split margin mining fed splitOversizedBuckets' rebalanced
    // kmeans assignment through marginMineBucketed (the production
    // path EXPLAINS named; recall priced by ext147). In dup mode every
    // copy of a base vector is identical, so kmeans piles whole
    // families into hot buckets and the split caps everything EXCEPT
    // unsplittable identical families (argmin ties keep them together
    // — exact dedup's job first, the ext87 composition): candidate
    // mass drops from Σ|bucketA|·|bucketB| over mult-scaled buckets to
    // Σ capped-bucket products — sub-quadratic growth is what this row
    // vs margin_mine_ivf measures.
    // The cap here is ABSOLUTE and the splitter is RE-APPLIED until
    // every bucket fits (the self-composition its contract promises) —
    // ext147's single-level mean-size cap mirrors ext124's replayable
    // statistic, but a mean cap scales WITH the corpus and can't give
    // sub-quadratic growth; a fixed cap can, because dup-mode identical
    // families never straddle the even/odd corpus split (copy offsets
    // preserve vec_id parity), so cross-family candidates are exactly
    // what recursive splitting separates.
    time("margin_mine_capped") {
      val fixedCap = 1000L
      var asg = graft.ops.Similarity.kmeansBuckets(bigEmb)
        .localCheckpoint(true)
      def maxBucket = asg.groupBy("bucket").agg(count(lit(1)).as("c"))
        .agg(max("c")).head().getLong(0)
      var lvl = 0
      var mx = maxBucket
      // split=8 with up to 8 levels: low-vid seeds are arbitrarily
      // placed, so per-level shrink of the densest child can be far
      // below the ideal 1/split (measured /1.6 per level at split=4);
      // a wider split per level converges in fewer (expensive) Lloyd's
      // rounds
      while (mx > fixedCap && lvl < 8) {
        asg = graft.ops.Similarity
          .splitOversizedBuckets(bigEmb, asg, fixedCap, split = 8)
          .localCheckpoint(true)
        lvl += 1
        mx = maxBucket
        println(s"[scale-smoke] margin_cap_level=$lvl maxBucket=$mx")
      }
      println(s"[scale-smoke] margin_cap_levels=$lvl maxBucket=$mx " +
        s"cap=$fixedCap")
      graft.ops.Similarity.marginMineBucketed(
        bigEmb.filter(col("vec_id") % 2 === 0),
        bigEmb.filter(col("vec_id") % 2 === 1), asg)
    }
    // funnel / aligned trending / z-order price on a mult-x SYNTHETIC
    // event stream (the parquet events table is fixed-size): users
    // fixed at 2000, so the funnel's broadcast survivor relation stays
    // bounded while events grow — the claim each of these plans makes.
    if (only.forall(_.exists("events_ops".startsWith))) {
      val nE = mult.toLong * 100000L
      val ev = spark.range(nE).select(
        col("id").as("event_id"),
        expr("timestamp_millis(1704067200000 + (id * 7919) % 2592000000)")
          .as("ts"),
        (col("id") % 2000).as("user_id"),
        element_at(array(lit("signup"), lit("view"), lit("click"),
          lit("purchase"), lit("error")),
          (col("id") % 5 + 1).cast("int")).as("event_type"))
        .localCheckpoint(true)
      time("events_ops_funnel") {
        graft.agg.Windows.funnel(ev, col("user_id"),
          Seq("signup", "view", "click", "purchase"))
      }
      time("events_ops_trending") {
        graft.ops.Decay.trendingTopKAligned(ev, col("event_type"),
          col("user_id"), col("ts"), 86400000000L, 10)
      }
      time("events_ops_zorder") {
        graft.ops.Layout.zOrderAudit(
          ev.select(col("user_id"),
            expr("unix_micros(ts) DIV 86400000000").as("day")),
          col("user_id"), col("day"))
      }
    }
    // r13 (r12 verdict item 1): the funnel with USERS scaling WITH the
    // corpus — the case the removed broadcast(prev) hint would OOM:
    // the survivor relation is O(|users|), corpus-proportional, so at
    // Nx events AND Nx distinct users the step joins must run as
    // uid-keyed shuffle joins with flat heap (AQE may still downgrade
    // to broadcast only when the survivor side is genuinely small).
    // The companion line prints the physical join strategies chosen.
    if (only.forall(_.exists("funnel_scaled_users".startsWith))) {
      val nE = mult.toLong * 100000L
      val evU = spark.range(nE).select(
        col("id").as("event_id"),
        expr("timestamp_millis(1704067200000 + (id * 7919) % 2592000000)")
          .as("ts"),
        (col("id") % (mult.toLong * 2000L)).as("user_id"),
        // type cycles with each user's OCCURRENCE index (id DIV |users|),
        // not with id itself: |users| is divisible by 5, so any function
        // of id alone is CONSTANT per user and nobody would ever
        // progress past step 1
        element_at(array(lit("signup"), lit("view"), lit("click"),
          lit("purchase"), lit("error")),
          ((col("id") / (mult.toLong * 2000L)).cast("long") % 5 + 1)
            .cast("int")).as("event_type"))
        .localCheckpoint(true)
      time("funnel_scaled_users") {
        graft.agg.Windows.funnel(evU, col("user_id"),
          Seq("signup", "view", "click", "purchase"))
      }
      val plan = graft.agg.Windows.funnel(evU, col("user_id"),
          Seq("signup", "view", "click", "purchase"))
        .queryExecution.executedPlan.toString
      def cnt(m: String) = m.r.findAllMatchIn(plan).size
      println(s"[scale-smoke] funnel_join_strategies " +
        s"shuffleJoins=${cnt("SortMergeJoin") + cnt("ShuffledHashJoin")} " +
        s"broadcastJoins=${cnt("BroadcastHashJoin")} " +
        s"forcedHints=${cnt("ResolvedHint")}")
      graft.ops.Reuse.freeAll(spark)
    }
    // r13 (r12 verdict item 5): price funnelStateSink's state. The
    // eviction law (ts > t1(u) + horizon ⇒ dead forever) is
    // spec-proved; this measures it — events arrive in rough time
    // order over ~10 horizons of event time across many batches driven
    // through the EXPOSED per-batch seam (processFunnelBatch), and the
    // snapshot row count after each batch must PLATEAU at the
    // horizon-windowed funnel-event mass (each user's first week)
    // instead of growing with stream length. Also witnesses the r13
    // snapshot GC: at most 2 snap dirs ever on disk.
    if (only.forall(_.exists("funnel_state_plateau".startsWith))) {
      val steps = Seq("signup", "view", "click", "purchase")
      val horizonUs = 7L * 86400000000L
      val nBatches = 12
      val nE = mult.toLong * 100000L
      val perB = nE / nBatches
      val tmpS = java.nio.file.Files
        .createTempDirectory("graft-smoke-fs").toString
      val sizes = (0 until nBatches).map { bi =>
        // ~70 days of event time over 12 batches: time advances with
        // the batch index, users cycle — every user's funnel window
        // closes long before the stream ends.
        val b = spark.range(bi * perB, (bi + 1) * perB).select(
          col("id").as("event_id"),
          expr("timestamp_micros(1704067200000000 + id * " +
            s"${70L * 86400000000L / nE})").as("ts"),
          concat(lit("u"), col("id") % 2000).as("user_id"),
          // occurrence-indexed type (see funnel_scaled_users): every
          // user signs up on their FIRST occurrence, so t1 is known
          // early and the eviction law has teeth — the plateau is the
          // horizon-windowed mass, ~|users| x (horizon/occurrence
          // spacing) events, reached once event time passes t1+horizon
          element_at(array(lit("signup"), lit("view"), lit("click"),
            lit("purchase"), lit("error")),
            ((col("id") / 2000L).cast("long") % 5 + 1).cast("int"))
            .as("event_type"))
        graft.stream.StreamingPipeline.processFunnelBatch(
          b, bi.toLong, steps, tmpS, horizonUs)
        val snaps = new java.io.File(tmpS).listFiles()
          .filter(_.isDirectory).map(_.toString).sorted
        (spark.read.parquet(snaps.max).count(), snaps.length)
      }
      println(s"[scale-smoke] funnel_state_plateau " +
        s"events=$nE batches=$nBatches " +
        s"stateRows=[${sizes.map(_._1).mkString(",")}] " +
        s"snapDirsOnDisk=${sizes.map(_._2).max} " +
        s"finalOverMidRatio_pct=${
          if (sizes(nBatches / 2)._1 > 0)
            sizes.last._1 * 100 / sizes(nBatches / 2)._1 else -1}")
      graft.ops.Reuse.freeAll(spark)
    }
    // end-to-end curation chain (ext126): gopher → rep surgery → span
    // surgery → semantic + bloom decon → mixture → pack, each stage an
    // operator with its own smoke row above — the chain must cost
    // roughly the SUM of its stages (it adds no new shuffle shape).
    // Bench = doc_id < 20 (copy 0 only, fixed at any mult).
    time("curation_pipeline") {
      graft.ops.Curation.pipelineCard(big, bigEmbL, 20L, 10000000L)
    }
    // r12: the one-shuffle full-payload aggregation vs the composite
    // witness on a mult-x synthetic tweet corpus — the claim being
    // priced: fusing stats + deduped bounded examples into ONE grouped
    // aggregate (TopKTweets) beats the three-pass shape (stats groupBy
    // + window-sort dedupe + sorted-collect + join) and the gap widens
    // with corpus size, since the composite's window sort touches every
    // row where the aggregator ships <= k structs per group-partition.
    if (only.forall(_.exists("payloads".startsWith))) {
      val nT = mult.toLong * 200000L
      val tweets = spark.range(nT).select(
        expr("timestamp_millis(1704067200000 + id * 500)").as("ts"),
        col("id"),
        concat(lit("tweet "), col("id")).as("text"),
        concat(lit("u"), col("id") % 2000).as("screenName"),
        when(col("id") % 5 === 0, col("id") % 1000)
          .otherwise(lit(-1L)).as("originalTweetId"),
        (col("id") * 37 % 10000).as("followerCount"),
        array(concat(lit("tag"), col("id") % 1000)).as("hashtags"))
        .localCheckpoint(true)
      time("payloads_one_shuffle") {
        graft.agg.Payloads.topEntityPayloads(tweets, col("hashtags"))
      }
      time("payloads_composite") {
        graft.agg.Payloads.topEntityPayloadsComposite(tweets,
          col("hashtags"))
      }
    }
    // r14 batch-2: phash candidate mass at the WIDE radius (12x32
    // buckets — the documented fan-out ceiling: each bucket holds
    // ~n/32 assets, candidate pairs ~12n²/64 on the dup axis where
    // copies share every chunk), bm25 (hits relation bounded by docs
    // containing a query term — corpus-linear here since the synthetic
    // vocab is shared), burstiness (matrix shuffle + 4-agg fold).
    if (only.forall(_.exists(p =>
        "r14b2".startsWith(p) || p.startsWith("r14b2")))) {
      time("r14b2_phash_wide") {
        graft.ops.Multimodal.phashPairs(
          graft.ops.Multimodal.assetsFromDocuments(big), 11, 12)
      }
      time("r14b2_phash_img_radius") {
        graft.ops.Multimodal.phashPairs(
          graft.ops.Multimodal.assetsFromDocuments(big), 3, 4)
      }
      time("r14b2_bm25") {
        graft.ops.TextOps.bm25TopK(big,
          Seq("spark", "window", "join"))
      }
      val nE14 = mult.toLong * 100000L
      val ev14 = spark.range(nE14).select(
        col("id").as("event_id"),
        expr("timestamp_millis(1704067200000 + (id * 7919) % 2592000000)")
          .as("ts"),
        (col("id") % 2000).as("user_id"),
        element_at(array(lit("signup"), lit("view"), lit("click"),
          lit("purchase"), lit("error")),
          (col("id") % 5 + 1).cast("int")).as("event_type"))
        .localCheckpoint(true)
      time("r14b2_burstiness") {
        graft.agg.Windows.burstiness(ev14, col("event_type"))
      }
      graft.ops.Reuse.freeAll(spark)
    }
    // r14 batch-3: label association (one distinct presence explode,
    // vocab x label cells) and the bloom semi-join CUT — plain shuffle
    // join vs probe-then-join on a mult-x synthetic fact table with a
    // 5% dim hit rate (the pattern's home turf: most fact rows must
    // NOT survive to the exchange).
    if (only.forall(_.exists(p =>
        "r14b3".startsWith(p) || p.startsWith("r14b3")))) {
      time("r14b3_label_assoc") {
        graft.ops.TextOps.labelAssociation(big, col("lang"))
      }
      val nEv = mult.toLong * 100000L
      val evT = spark.range(nEv).select(
        col("id").as("event_id"),
        expr("timestamp_millis(1704067200000 + (id * 7919) % 2592000000)")
          .as("ts"),
        (col("id") % 2000).as("user_id"))
        .localCheckpoint(true)
      time("r14b3_temporal_split") {
        graft.ops.Splits.temporalSplit(evT, col("user_id"))
      }
      val nF = mult.toLong * 1000000L
      val fact = spark.range(nF).select(
        col("id").as("row_id"), (col("id") % 100000L).as("fk"))
        .localCheckpoint(true)
      val dim = spark.range(5000L).select((col("id") * 20L).as("dk"))
        .localCheckpoint(true) // 5000 of the 100k key values match
      time("r14b3_plain_join") {
        fact.join(dim, col("fk") === col("dk"))
      }
      time("r14b3_bloom_join") {
        graft.ops.Sketches.bloomSemiJoin(fact, dim, col("fk"),
            col("dk"))
          .join(dim, col("fk") === col("dk"))
      }
      // home turf: dim too big to broadcast (2M keys -> sort-merge
      // join), 5% fact hit rate, bloom m scaled to the key count
      // (2^25 bits, 4 MB literal) — the fact shuffle is what the
      // probe now cuts
      val bigDim = spark.range(2000000L).select(
        (col("id") * 20L).as("dk")).localCheckpoint(true)
      val fact2 = spark.range(nF).select(
        col("id").as("row_id"), (col("id") % 40000000L).as("fk"))
        .localCheckpoint(true)
      time("r14b3_plain_join_smj") {
        fact2.join(bigDim, col("fk") === col("dk"))
      }
      time("r14b3_bloom_join_smj") {
        graft.ops.Sketches.bloomSemiJoin(fact2, bigDim, col("fk"),
            col("dk"), m = 1L << 25)
          .join(bigDim, col("fk") === col("dk"))
      }
      graft.ops.Reuse.freeAll(spark)
    }
    // Composed streaming curation sink (r11 item 6): the mult-x corpus
    // through `curationSink` as MANY micro-batches. The sink's claim is
    // that per-batch localCheckpoint + free bounds the block-manager
    // footprint by ONE batch (plus the pinned snapshot artifacts), so
    // per-batch wall time and peak cached bytes must stay FLAT across
    // the stream — growth with batch index would mean state leaking
    // from batch to batch. A poller thread samples cached-RDD bytes at
    // 100 ms so the peak is measured DURING batches, not between them.
    if (only.forall(_.exists("curation_sink_stream".startsWith))) {
      val nBatches = 12
      val snap = graft.ops.Curation.snapshot(big, bigEmbL, 20L)
      val keepers = snap.keeperSpans.localCheckpoint(true)
      val bv = snap.benchVecs.localCheckpoint(true)
      val bh = snap.benchShingles.localCheckpoint(true)
      val bits = snap.bloomBits.localCheckpoint(true)
      val embSnap = bigEmbL.localCheckpoint(true)
      graft.ops.Reuse.freeAll(spark)
      val tmp = java.nio.file.Files.createTempDirectory("graft-smoke-cs")
      val srcDir = s"$tmp/src"
      big.filter(col("doc_id") % 1000000L >= 20)
        .repartition(nBatches).write.parquet(srcDir)
      @volatile var peakBytes = 0L
      @volatile var peakRdds = 0
      @volatile var stopPoll = false
      val poller = new Thread(() => while (!stopPoll) {
        val infos = spark.sparkContext.getRDDStorageInfo
        val b = infos.map(_.memSize).sum
        if (b > peakBytes) peakBytes = b
        if (infos.length > peakRdds) peakRdds = infos.length
        Thread.sleep(100)
      })
      poller.setDaemon(true); poller.start()
      val t0 = System.nanoTime()
      val q = graft.stream.StreamingPipeline.curationSink(
          graft.stream.StreamingPipeline.parquetStream(spark, srcDir,
            maxFilesPerTrigger = Some(1)),
          embSnap, keepers, bv, bh, bits, s"$tmp/out")
        .option("checkpointLocation", s"$tmp/ckpt").start()
      q.processAllAvailable()
      val secs = (System.nanoTime() - t0) / 1e9
      val durs = q.recentProgress.toSeq
        .filter(_.numInputRows > 0)
        .map(p => p.batchId ->
          p.durationMs.get("triggerExecution").toLong / 1e3)
        .sortBy(_._1)
      q.stop(); stopPoll = true
      def med(xs: Seq[Double]) =
        if (xs.isEmpty) 0.0 else xs.sorted.apply(xs.size / 2)
      val (h1, h2) = durs.map(_._2).splitAt(durs.size / 2)
      val survivors = spark.read.parquet(s"$tmp/out").count()
      println(f"[scale-smoke] curation_sink_stream_${mult}x  " +
        f"batches=${durs.size}  total=$secs%.1f s  " +
        f"medFirstHalf=${med(h1)}%.1f s  medSecondHalf=${med(h2)}%.1f s  " +
        f"perBatch=[${durs.map(d => f"${d._2}%.1f").mkString(",")}]  " +
        f"peakCachedRdds=$peakRdds  peakCachedMB=${peakBytes / 1e6}%.0f  " +
        f"survivors=$survivors")
      graft.ops.Reuse.freeAll(spark)
    }
    // r15: price the hybrid SERVE path (r14 verdict item 2's "Done"
    // asks a pricing row) — stored-artifact retrieval vs the recompute
    // form at the smoke corpus. Build-once store cost reported
    // separately; the serve row reads both legs from parquet (no
    // corpus text scan, codes+postings only) and should hold roughly
    // flat as queries repeat while recompute pays the full build +
    // text scan every time.
    if (only.forall(_.exists(p =>
        "r15hybrid".startsWith(p) || p.startsWith("r15hybrid")))) {
      val S = graft.ops.Similarity
      val emb = graft.ingest.Tables.embeddings(spark, sfDir)
      val docs = base
      val qIds = (0L until 8L).toSeq
      val tmp = java.nio.file.Files
        .createTempDirectory("graft-smoke-hybrid").toString
      val tb0 = System.nanoTime()
      val cents0 = S.kmeansCentroids(emb)
      val cb0 = S.pqCodebooks(emb).localCheckpoint(true)
      S.ivfPqCodedCorpus(emb, cb0,
          S.kmeansProbeBuckets(emb, probes = 1)
            .filter(col("probe_rank") === 1).select("vec_id", "bucket"))
        .write.parquet(s"$tmp/coded")
      cents0.write.parquet(s"$tmp/cents")
      cb0.write.parquet(s"$tmp/cb")
      graft.ops.TextOps.bm25IndexPartials(docs)
        .write.parquet(s"$tmp/index")
      val buildS = (System.nanoTime() - tb0) / 1e9
      graft.ops.Reuse.freeAll(spark)
      def servedOnce(): Long = {
        val r = S.hybridFromStores(qIds,
          spark.read.parquet(s"$tmp/cents"),
          spark.read.parquet(s"$tmp/cb"),
          spark.read.parquet(s"$tmp/coded"),
          emb, spark.read.parquet(s"$tmp/index")).count()
        graft.ops.Reuse.freeAll(spark); spark.catalog.clearCache()
        r
      }
      def recomputedOnce(): Long = {
        val cents = S.kmeansCentroids(emb)
        val cb = S.pqCodebooks(emb).localCheckpoint(true)
        val coded = S.ivfPqCodedCorpus(emb, cb,
          S.kmeansProbeBuckets(emb, probes = 1)
            .filter(col("probe_rank") === 1).select("vec_id", "bucket"))
        val queries = emb.filter(col("vec_id").isin(qIds: _*))
        val r = S.rrfFuse(Seq(
          S.ivfPqSearch(queries, cents, cb, coded, emb, 10),
          graft.ops.TextOps.bm25PerQuery(docs,
            docs.filter(col("doc_id").isin(qIds: _*)), 10)), 5).count()
        graft.ops.Reuse.freeAll(spark); spark.catalog.clearCache()
        r
      }
      servedOnce(); recomputedOnce() // warm codegen/readers untimed
      val ts0 = System.nanoTime()
      val servedRows = servedOnce()
      val serveS = (System.nanoTime() - ts0) / 1e9
      val tr0 = System.nanoTime()
      val recompRows = recomputedOnce()
      val recompS = (System.nanoTime() - tr0) / 1e9
      println(f"[scale-smoke] hybrid_serve_vs_recompute  " +
        f"build=$buildS%.1f s  serve=$serveS%.1f s  " +
        f"recompute=$recompS%.1f s  rows=$servedRows/$recompRows")
    }
    // r15: budget-select bisection — rounds are ~constant in corpus
    // size (score domain ≤ 1e6 → ~20, id domain → ~log₂ span), each a
    // map-side-combined conditional sum over the cached projection, so
    // wall-clock should grow ~linearly with the corpus while the
    // ROUND COUNT stays flat. Budget scales with mult so the cut stays
    // at the same relative depth.
    if (only.forall(_.exists(p =>
        "r15budget".startsWith(p) || p.startsWith("r15budget")))) {
      val scored = graft.ops.TextOps.quality(big)
        .withColumn("score_ppm", expr(ExtEntry.ScorePpmExpr))
      time("r15budget_select") {
        graft.ops.Sampling.budgetSelectCard(scored, col("score_ppm"),
          10000L * mult)
      }
    }
    // r16: the fill curve's "K budgets cost ONE cut" claim, measured
    // — the 3-rung curve vs three single cards over the same corpus
    // (probe sums shared across budgets vs repeated). Own gate name
    // so SMOKE_ONLY selects it by what the output reports.
    if (only.forall(_.exists(p =>
        "r16curve".startsWith(p) || p.startsWith("r16curve")))) {
      val scored = graft.ops.TextOps.quality(big)
        .withColumn("score_ppm", expr(ExtEntry.ScorePpmExpr))
      val rungs = Seq(2500L * mult, 10000L * mult, 40000L * mult)
      val tc0 = System.nanoTime()
      val curveRows = graft.ops.Sampling.budgetFillCurve(scored,
        col("score_ppm"), rungs).count()
      val curveS = (System.nanoTime() - tc0) / 1e9
      graft.ops.Reuse.freeAll(spark)
      val ts0 = System.nanoTime()
      rungs.foreach { b =>
        graft.ops.Sampling.budgetSelectCard(scored, col("score_ppm"),
          b).count()
        graft.ops.Reuse.freeAll(spark)
      }
      val soloS = (System.nanoTime() - ts0) / 1e9
      println(f"[scale-smoke] r16curve_fill  rungs=${rungs.size}" +
        f"  curve=$curveS%.1f s  ${rungs.size}xsingle=$soloS%.1f s" +
        f"  rows=$curveRows")
    }
    // ext173's claim: N strata cost the same rounds as ONE cut — the
    // batched stratified cards vs one single-stratum cut per lang
    // over the same corpus. Own gate matching the printed name.
    if (only.forall(_.exists(p =>
        "r16strata".startsWith(p) || p.startsWith("r16strata")))) {
      val scored = graft.ops.TextOps.quality(big)
        .withColumn("score_ppm", expr(ExtEntry.ScorePpmExpr))
      val tst0 = System.nanoTime()
      val strataRows = graft.ops.Sampling.budgetSelectCardsByStratum(
        scored, "lang", col("score_ppm"), 2500L * mult).count()
      val strataS = (System.nanoTime() - tst0) / 1e9
      graft.ops.Reuse.freeAll(spark)
      val langs = scored.select("lang").distinct()
        .collect().map(_.getString(0)).sorted
      val tso0 = System.nanoTime()
      langs.foreach { l =>
        graft.ops.Sampling.budgetSelectCard(
          scored.filter(col("lang") === l), col("score_ppm"),
          2500L * mult).count()
        graft.ops.Reuse.freeAll(spark)
      }
      val soloStrataS = (System.nanoTime() - tso0) / 1e9
      println(f"[scale-smoke] r16strata_cuts  strata=${langs.size}" +
        f"  batched=$strataS%.1f s  ${langs.size}xsingle=" +
        f"$soloStrataS%.1f s  rows=$strataRows")
    }
    // ext175's claim, priced (r16 verdict item 6): stage 1 is the
    // batched stratified bisections, survivors are a SCAN PREDICATE
    // off the broadcast cap envelope (never materialized to the
    // driver), stage 2 bisects over that filtered projection — so
    // the job count is corpus-size-independent and wall should grow
    // ~linearly with heap flat (the shared projection is the only
    // state). Caps/budget scale with mult to keep the cut at the
    // same relative depth. time() prints wall + peak heap.
    if (only.forall(_.exists(p =>
        "r17twolevel".startsWith(p) || p.startsWith("r17twolevel")))) {
      val scored = graft.ops.TextOps.quality(big)
        .withColumn("score_ppm", expr(ExtEntry.ScorePpmExpr))
      time("r17twolevel_card") {
        graft.ops.Sampling.twoLevelBudgetCard(scored, "lang",
          col("score_ppm"), 2500L * mult, 6000L * mult)
      }
    }
    // r17: the batched-matrix claims, priced — the per-stratum fill
    // curve (|strata| × K cards) vs running |strata| × K single
    // cards, and the cap sweep (K two-level cards) vs K direct
    // two-level cards, over the same corpus.
    if (only.forall(_.exists(p =>
        "r17matrix".startsWith(p) || p.startsWith("r17matrix")))) {
      val scored = graft.ops.TextOps.quality(big)
        .withColumn("score_ppm", expr(ExtEntry.ScorePpmExpr))
      val rungs = Seq(800L * mult, 2500L * mult, 20000L * mult)
      val tc0 = System.nanoTime()
      val curveRows = graft.ops.Sampling.budgetFillCurveByStratum(
        scored, "lang", col("score_ppm"), rungs).count()
      val curveS = (System.nanoTime() - tc0) / 1e9
      graft.ops.Reuse.freeAll(spark)
      val langs = scored.select("lang").distinct()
        .collect().map(_.getString(0)).sorted
      val ts0 = System.nanoTime()
      langs.foreach { l =>
        rungs.foreach { b =>
          graft.ops.Sampling.budgetSelectCard(
            scored.filter(col("lang") === l), col("score_ppm"), b)
            .count()
          graft.ops.Reuse.freeAll(spark)
        }
      }
      val soloS = (System.nanoTime() - ts0) / 1e9
      println(f"[scale-smoke] r17matrix_curve  strata=${langs.size}" +
        f" rungs=${rungs.size}  batched=$curveS%.1f s  " +
        f"${langs.size * rungs.size}xsingle=$soloS%.1f s" +
        f"  rows=$curveRows")
      val g = 6000L * mult
      val tw0 = System.nanoTime()
      val sweepRows = graft.ops.Sampling.twoLevelCapSweep(scored,
        "lang", col("score_ppm"), rungs, g).count()
      val sweepS = (System.nanoTime() - tw0) / 1e9
      graft.ops.Reuse.freeAll(spark)
      val tv0 = System.nanoTime()
      rungs.foreach { c =>
        graft.ops.Sampling.twoLevelBudgetCard(scored, "lang",
          col("score_ppm"), c, g).count()
        graft.ops.Reuse.freeAll(spark)
      }
      val soloSweepS = (System.nanoTime() - tv0) / 1e9
      println(f"[scale-smoke] r17matrix_sweep  caps=${rungs.size}" +
        f"  batched=$sweepS%.1f s  ${rungs.size}xtwoLevel=" +
        f"$soloSweepS%.1f s  rows=$sweepRows")
    }
    // r18 (r17 verdict item 6): the batched-matrix operators' 100×
    // wall+heap rows WITHOUT the per-cell comparison loops (those
    // priced the batching at 10×; at 100× the solos alone would run
    // ~30 min and prove nothing new). time() reports wall, rows and
    // peak heap — the "job count independent of corpus size" claim
    // as the same measured shape ext175's r17twolevel_card row got.
    // Opt-IN only (`exists`, not the other gates' `forall`): an
    // unfiltered run already times these exact calls inside
    // r17matrix — running both would repeat ~40 s of identical work
    // (r18 review).
    if (only.exists(_.exists(p =>
        "r18matrix".startsWith(p) || p.startsWith("r18matrix")))) {
      val scored = graft.ops.TextOps.quality(big)
        .withColumn("score_ppm", expr(ExtEntry.ScorePpmExpr))
      val rungs = Seq(800L * mult, 2500L * mult, 20000L * mult)
      time("r18matrix_curve") {
        graft.ops.Sampling.budgetFillCurveByStratum(scored, "lang",
          col("score_ppm"), rungs)
      }
      time("r18matrix_sweep") {
        graft.ops.Sampling.twoLevelCapSweep(scored, "lang",
          col("score_ppm"), rungs, 6000L * mult)
      }
    }
    // r16: price retryingServe under a REAL concurrent compaction
    // loop (r15 verdict item 6) — the race specs prove recovery on
    // injected/probe-driven signatures; this measures the serve path
    // against a LIVE compact thread: reads completed, retries paid,
    // exhaustions (should be 0), and the added latency per read vs an
    // uncontended baseline over the same store. The contention is the
    // SWAP FREQUENCY, not data volume (the race lives in file
    // listings and the rename window), so the store is file-shaped
    // like production — batch=N dirs × date partitions — at modest
    // rows.
    if (only.forall(_.exists(p =>
        "r16serve".startsWith(p) || p.startsWith("r16serve")))) {
      val AS = graft.stream.AggregateStore
      val tmp = java.nio.file.Files
        .createTempDirectory("graft-smoke-serve").toString
      val store = s"$tmp/hashtags"
      def batchDf(b: Int) = spark.range(100000L).select(
        (lit(b.toLong * 86400L) + (col("id") % 100L) * 600L)
          .as("window_end"),
        concat(lit("e"), col("id") % 1000L).as("entity"),
        (col("id") % 97L).as("follower_sum"),
        lit(1L).as("tweet_count"))
      (0 until 16).foreach(b =>
        AS.writeRanked(batchDf(b), store, 10, b.toLong))
      val reads = 60
      def readOnce(): Long = {
        val r = AS.readRange(spark, store, 0L, 16L * 86400L).count()
        spark.catalog.clearCache(); r
      }
      readOnce() // warm codegen/readers untimed
      val tb = System.nanoTime()
      (0 until reads).foreach(_ => readOnce())
      val uncontendedS = (System.nanoTime() - tb) / 1e9
      @volatile var stopCompacts = false
      // atomics: read on the main thread after join — plain vars
      // would have no happens-before edge from the compactor
      val compacts = new java.util.concurrent.atomic.AtomicInteger
      val compactErrs = new java.util.concurrent.atomic.AtomicInteger
      val compactor = new Thread(() => {
        while (!stopCompacts) {
          try { AS.compact(spark, store); compacts.incrementAndGet() }
          catch { case _: Throwable => compactErrs.incrementAndGet() }
        }
      }, "smoke-compactor")
      compactor.setDaemon(true)
      compactor.start()
      var retries = 0
      var exhausted = 0
      val tc = System.nanoTime()
      (0 until reads).foreach { _ =>
        try graft.serve.Serve.retryingServe(storePath = store,
          onRetry = (_, _) => retries += 1)(readOnce())
        catch { case _: Throwable => exhausted += 1 }
      }
      val contendedS = (System.nanoTime() - tc) / 1e9
      stopCompacts = true
      compactor.join(60000)
      println(f"[scale-smoke] serve_under_compaction  reads=$reads  " +
        f"uncontended=$uncontendedS%.1f s  contended=$contendedS%.1f s" +
        f"  addedPerRead=${(contendedS - uncontendedS) * 1000 / reads}%.0f ms" +
        f"  retries=$retries  exhausted=$exhausted  " +
        f"compacts=${compacts.get}  compactErrs=${compactErrs.get}" +
        f"  compactorJoined=${!compactor.isAlive}")
    }
    spark.stop()
  }
}
