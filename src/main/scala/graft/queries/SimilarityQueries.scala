package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.ops.{Experiment, IvfIndex, Pca, Retrieval, Similarity}

/** Similarity search over the `embeddings` table (array<float>, dim 64).
  *
  * `sim_cosine_topk` carries a full DuckDB oracle: both engines compute
  * cosine in double (the oracle casts the float lists to DOUBLE[] first)
  * and the result surfaces as REAL, so a 1-ulp reduction-order divergence
  * cannot survive the downcast.
  *
  * The LSH and IVF entries are on the hard signal too, via data-derived
  * index parameters: hyperplanes are the corpus vectors with vec_id
  * 16..16+bits, IVF centroids the vectors with vec_id < 16 (optionally
  * Lloyd-refined through DECIMAL(30,12) sums) — all recomputable by any
  * engine that can read the same rows, so DuckDB rebuilds the identical
  * index in SQL. Both sides accumulate dot products left-to-right in
  * double, giving bit-identical signatures/assignments away from exact
  * decision-boundary ties. (The seeded-random-centroid ivfTopK default
  * stays a library capability covered by SimilaritySpec; it carries no
  * query entry — a permanently unverifiable twin of the data-derived
  * entries would be inventory noise.)
  */
object SimilarityQueries {

  val dim = 64

  /** Persisted-index dir, built ONCE per (JVM, sfDir): the bench runs
    * every query 3× and medians, so with the build cached the
    * sim_ivf_persisted median measures the PROBE (load + pruned scan +
    * top-k) while sim_ivf_build measures the build+persist+load leg on
    * its own — the round-5 single number mixed index-write I/O into the
    * probe latency and hid probe regressions. Correctness is unaffected:
    * the index is a pure function of the sfDir's embeddings, which never
    * change within a process. */
  private val ivfIndexCache =
    new java.util.concurrent.ConcurrentHashMap[String, String]()
  private def ivfIndexDir(s: SparkSession, dir: String): String =
    ivfIndexCache.computeIfAbsent(dir, _ => {
      val tmp = QuerySql.tempDir("graft_ivfidx")
      IvfIndex.save(Tables.embeddings(s, dir), "vec_id", "embedding",
        k = 16, tmp)
      tmp
    })

  /** Once-per-(JVM, sfDir) COMPOSED IVF-PQ index (see [[ivfIndexDir]]'s
    * caching rationale): sim_ivfpq_persisted's median then measures the
    * probe (load + pruned code scan + ADC top-k), not the build. */
  private val ivfPqIndexCache =
    new java.util.concurrent.ConcurrentHashMap[String, String]()
  private def ivfPqIndexDir(s: SparkSession, dir: String): String =
    ivfPqIndexCache.computeIfAbsent(dir, _ => {
      val tmp = QuerySql.tempDir("graft_ivfpqidx")
      IvfIndex.savePq(Tables.embeddings(s, dir), "vec_id", "embedding",
        k = 16, tmp)
      tmp
    })

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    "sim_cosine_topk" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir)
      Similarity.bruteForceTopK(
          queries = emb.filter(col("vec_id") < 8),
          candidates = emb, id = "vec_id", vec = "embedding", k = 5)
        .select(col("query_id"), col("neighbor_id"),
          col("cosine").cast("float").as("cosine"), col("rank"))
        .orderBy(col("query_id"), col("rank"))
    }),

    // FILTERED vector search — the production "WHERE lang = 'en' AND
    // nearest" hybrid: the metadata predicate narrows the candidate set
    // BEFORE scoring (a semi-join against the paired documents row),
    // then exact cosine top-k among survivors. Pre-filtering beats
    // post-filtering an ANN list, which silently returns < k when the
    // filter decimates the neighborhood.
    "sim_filtered_topk" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir)
      val en = Tables.documents(s, dir).filter(col("lang") === "en")
        .select(col("doc_id").as("vec_id"))
      Similarity.bruteForceTopK(
          queries = emb.filter(col("vec_id") < 8),
          candidates = emb.join(en, Seq("vec_id"), "left_semi"),
          id = "vec_id", vec = "embedding", k = 5)
        .select(col("query_id"), col("neighbor_id"),
          col("cosine").cast("float").as("cosine"), col("rank"))
        .orderBy(col("query_id"), col("rank"))
    }),

    // Per-dimension embedding drift: standardized mean difference
    // between two vector batches (parity split as the deterministic
    // stand-in for old-vs-new) — the ML-ops gate that catches a
    // re-embedded or renormalized dimension before it poisons an index;
    // the vector complement of dq_psi_drift/dq_ks_drift. Decimal-exact
    // per-dim sums, one Welch-style double chain, FLOAT out.
    "emb_drift_smd" -> ((s, dir) => {
      // floor-quantize to integer nanos: floor has no round-half tie to
      // break, so both engines quantize every float-origin value
      // identically (decimal CAST rounding modes differ at exact .5
      // boundaries — the mismatch this op originally hit)
      val pos = Tables.embeddings(s, dir)
        .select(pmod(col("vec_id"), lit(2)).as("grp"),
          posexplode(col("embedding")).as(Seq("dim", "x")))
        .select(col("grp"), col("dim").cast("long").as("dim"),
          floor(col("x").cast("double") * lit(1e9)).cast("long").as("xn"))
      val d38 = (c: org.apache.spark.sql.Column) => c.cast("decimal(38,0)")
      val byGrp = pos.groupBy(col("grp"), col("dim"))
        .agg(count(lit(1)).as("n"), sum(d38(col("xn"))).as("s"),
          sum(d38(col("xn")) * d38(col("xn"))).as("ss"))
      def side(g: Int, tag: String) = byGrp.filter(col("grp") === g)
        .select(col("dim"), col("n").as(s"n_$tag"),
          col("s").as(s"__s_$tag"), col("ss").as(s"__ss_$tag"))
      // nano-unit means/variances: the scale cancels inside smd, and the
      // surfaced means divide by 1e9 as the last step of a fixed chain
      def meanN(t: String) =
        col(s"__s_$t").cast("double") / col(s"n_$t").cast("double")
      def varianceN(t: String) =
        (col(s"__ss_$t").cast("double") -
          (col(s"__s_$t").cast("double") * col(s"__s_$t").cast("double")) /
            col(s"n_$t").cast("double")) /
          (col(s"n_$t").cast("double") - lit(1.0))
      side(0, "a").join(side(1, "b"), Seq("dim"))
        .withColumn("__ma", meanN("a")).withColumn("__mb", meanN("b"))
        .withColumn("smd",
          ((col("__ma") - col("__mb")) /
            nullif(sqrt((varianceN("a") + varianceN("b")) / lit(2.0)),
              lit(0.0))).cast("float"))
        .select(col("dim"), col("n_a"), col("n_b"),
          (col("__ma") / lit(1e9)).as("mean_a"),
          (col("__mb") / lit(1e9)).as("mean_b"), col("smd"))
        .orderBy(col("dim"))
    }),

    // Greedy k-center coreset (k=8): farthest-point diversity selection
    // over cosine distance — the seed set for coreset-based training-
    // data selection; the trajectory (and its nonincreasing coverage
    // radius) replays center-for-center in the oracle.
    "emb_kcenter_coreset" -> ((s, dir) =>
      Similarity.kCenterCoreset(Tables.embeddings(s, dir),
          id = "vec_id", vec = "embedding", k = 8)
        .orderBy(col("pick_order"))),

    // LOF density outliers over cosine distance (k=10): the
    // embedding-space cleaning queue a global cutoff misses — scores
    // ≫ 1 flag points whose neighborhood is far sparser than their
    // neighbors'. Exact brute-force baseline; the reach/lrd/ratio tail
    // is IVF-swappable at scale.
    "emb_lof_outliers" -> ((s, dir) =>
      Similarity.lofOutliers(Tables.embeddings(s, dir),
          id = "vec_id", vec = "embedding", k = 10)
        .orderBy(col("vec_id"))),

    // The SCALABLE LOF: kNN from the IVF shortlist (data-derived
    // centroids, so the whole pipeline — assignment, probe, shortlist
    // cut, then the exact reach/lrd tail shared with emb_lof_outliers —
    // replays in the oracle engine-for-engine). Approximation lives
    // only in the shortlist; starvation (a point with < k neighbors in
    // its probed lists) fails loudly instead of biasing lrd.
    "emb_lof_outliers_ivf" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir)
      val cents = Similarity.dataCentroids(emb, "vec_id", "embedding", k = 16)
      Similarity.lofOutliersIvf(emb, id = "vec_id", vec = "embedding",
          k = 10, dim = dim, nCentroids = 16, nprobe = 4,
          centroids = Some(cents))
        .orderBy(col("vec_id"))
    }),

    // LOF as a pure READ-SIDE operator: the kNN shortlist probes the
    // PERSISTED index (same data-derived centroids the build wrote),
    // so the expensive assignment pass never re-runs — and the result
    // is bit-identical to emb_lof_outliers_ivf, sharing its oracle:
    // the regression gate for swapping index builds under a standing
    // outlier job.
    "emb_lof_outliers_ivf_persisted" -> ((s, dir) =>
      Similarity.lofOutliersIvfPersisted(ivfIndexDir(s, dir),
          Tables.embeddings(s, dir), id = "vec_id", vec = "embedding",
          k = 10, nprobe = 4)
        .orderBy(col("vec_id"))),

    // Contrastive-pair mining: per anchor, the hardest same-label
    // positive and hardest other-label negative by exact cosine, plus
    // the margin — the triplet-curation pass of embedding-model
    // training (negative margins = the label-review queue). The pick is
    // a map-side max(struct(cosine, −id)) aggregate, not a window over
    // the full score frame.
    "emb_hard_negatives" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir)
      Similarity.hardExamples(
          anchors = emb.filter(col("vec_id") < 16),
          candidates = emb, id = "vec_id", vec = "embedding",
          labelCol = "label")
        .orderBy(col("anchor_id"))
    }),

    // Exact sample covariance of the embedding space (upper triangle,
    // 0-based cells) — the statistics pass under whitening/PCA, its
    // shuffle bounded at d² cells by map-side partial aggregation
    "emb_covariance" -> ((s, dir) =>
      Pca.covariance(Tables.embeddings(s, dir), "embedding")
        .select(col("i").cast("long").as("i"), col("j").cast("long").as("j"),
          col("cov").cast("float").as("cov"))
        .orderBy(col("i"), col("j"))),

    // PCA projection onto the dominant component — including the
    // EIGENSOLVER on the oracle's hard signal: six power iterations
    // from e₁ over the covariance cells, every sum decimal-quantized,
    // so DuckDB reruns the identical arithmetic and the projections
    // hash-match after the float downcast. Convergence quality at this
    // budget is pinned separately by PcaSpec on a known matrix.
    "emb_pca_project" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir)
      val cov = Pca.covariance(emb, "embedding")
      val comp = Pca.topComponent(cov, dim = 64, iters = 6)
      Pca.project(emb, "vec_id", "embedding", comp)
        .select(col("vec_id"), col("pc1").cast("float").as("pc1"))
        .orderBy(col("vec_id"))
    }),

    // HYBRID retrieval: the same four probe documents ranked lexically
    // (BM25 over text) and semantically (cosine over the paired
    // embeddings), fused by reciprocal rank — rank-based fusion needs no
    // score calibration between the two spaces. n_lists records whether
    // a hit came from one or both rankers.
    "retrieval_rrf_fusion" -> ((s, dir) => {
      val probeIds = Seq(7L, 123L, 321L, 444L)
      val docs = Tables.documents(s, dir)
      val emb = Tables.embeddings(s, dir)
      val probes = docs.filter(col("doc_id").isin(probeIds: _*))
        .select(col("doc_id").as("query_id"), col("text").as("qtext"))
      val lex = Retrieval.bm25TopK(docs, probes, k = 10, excludeSelf = true)
        .select(col("query_id"), col("doc_id"), col("rank"))
      val sem = Similarity.bruteForceTopK(
          queries = emb.filter(col("vec_id").isin(probeIds: _*)),
          candidates = emb, id = "vec_id", vec = "embedding", k = 10)
        .select(col("query_id"), col("neighbor_id").as("doc_id"), col("rank"))
      Retrieval.rrfFuse(Seq(lex, sem), k = 10)
        .orderBy(col("query_id"), col("rank"))
    }),

    // INDEX LIFECYCLE probe leg: load → probe against the once-per-JVM
    // persisted index (see ivfIndexDir — the build leg is measured by
    // sim_ivf_build). Parquet round-trips the vectors bit-exactly and
    // the centroids are data-derived, so the persisted path shares
    // sim_ivf_data_topk's oracle verbatim — same result, but the probe
    // scans only the nprobe centroid partitions off disk.
    "sim_ivf_persisted" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir)
      val tmp = ivfIndexDir(s, dir)
      val cents = IvfIndex.loadCentroids(s, tmp)
      Similarity.ivfProbe(IvfIndex.loadPostings(s, tmp),
          queries = emb.filter(col("vec_id") < 8), id = "vec_id",
          vec = "embedding", cents = cents, nprobe = 4, k = 5)
        .select(col("query_id"), col("neighbor_id"),
          col("cosine").cast("float").as("cosine"), col("rank"))
        .orderBy(col("query_id"), col("rank"))
    }),

    // INDEX LIFECYCLE build leg: a FRESH build + partitioned persist +
    // centroid load-back per invocation (no cache — this entry IS the
    // build timing), surfacing the loaded centroids long-form. Centroids
    // are the first 16 corpus vectors, so the save→load round-trip is on
    // the hard signal: any write/read corruption flips the hash.
    "sim_ivf_build" -> ((s, dir) => {
      import s.implicits._
      val tmp = QuerySql.tempDir("graft_ivfbuild")
      IvfIndex.save(Tables.embeddings(s, dir), "vec_id", "embedding",
        k = 16, tmp)
      IvfIndex.loadCentroids(s, tmp)
        .zipWithIndex.flatMap { case (c, i) =>
          c.zipWithIndex.map { case (x, j) => (i.toLong, j.toLong, x) }
        }.toSeq.toDF("centroid_id", "j", "comp")
        .orderBy(col("centroid_id"), col("j"))
    }),

    // INDEX LIFECYCLE incremental leg: build on the base corpus, APPEND
    // a late batch against the existing centroids (no rebuild), probe.
    // Keeping vec_id < 16 in the base makes the data-derived centroids
    // identical to the full-corpus build, so the appended index must
    // probe exactly like sim_ivf_data_topk — the shared oracle verifies
    // the whole append path on the hard signal.
    "sim_ivf_append" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir)
      val late = col("vec_id") % 5 === 4 && col("vec_id") >= 16
      val tmp = QuerySql.tempDir("graft_ivfappend")
      IvfIndex.save(emb.filter(!late), "vec_id", "embedding", k = 16, tmp)
      IvfIndex.append(emb.filter(late), "vec_id", "embedding", tmp)
      val cents = IvfIndex.loadCentroids(s, tmp)
      Similarity.ivfProbe(IvfIndex.loadPostings(s, tmp),
          queries = emb.filter(col("vec_id") < 8), id = "vec_id",
          vec = "embedding", cents = cents, nprobe = 4, k = 5)
        .select(col("query_id"), col("neighbor_id"),
          col("cosine").cast("float").as("cosine"), col("rank"))
        .orderBy(col("query_id"), col("rank"))
    }),

    // SEMANTIC decontamination: max cosine from each corpus vector
    // (vec_id ≥ 8) to the probe/test set (vec_id < 8), flagged at the
    // semantic-dedup threshold — catches the paraphrased benchmark
    // leakage the n-gram decontamination pass cannot see.
    "emb_semantic_decontam" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir)
      Similarity.semanticContamination(
          corpus = emb.filter(col("vec_id") >= 8),
          probes = emb.filter(col("vec_id") < 8),
          id = "vec_id", vec = "embedding", threshold = 0.35)
        .select(col("vec_id"),
          col("max_probe_cosine").cast("float").as("max_probe_cosine"),
          col("contaminated"))
        .orderBy(col("vec_id"))
    }),

    // ANN QUALITY EVAL in-engine: recall@5 and top-1 coverage of the
    // IVF probe path against the exact brute-force ranking, per query —
    // the measurement loop that turns "approximate" from a shrug into a
    // number (and, run per index build, the regression gate a 100 TB
    // vector lake needs before swapping indexes).
    "sim_recall_eval" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir)
      val exact = Similarity.bruteForceTopK(
          emb.filter(col("vec_id") < 8), emb, "vec_id", "embedding", k = 5)
        .select(col("query_id"), col("neighbor_id"),
          col("rank").as("exact_rank"))
      val cents = Similarity.dataCentroids(emb, "vec_id", "embedding", k = 16)
      val approx = Similarity.ivfTopK(
          queries = emb.filter(col("vec_id") < 8), candidates = emb,
          id = "vec_id", vec = "embedding", dim = dim, k = 5,
          nCentroids = 16, nprobe = 4, centroids = Some(cents))
        .select(col("query_id"), col("neighbor_id"),
          col("rank").as("approx_rank"))
      exact.join(approx, Seq("query_id", "neighbor_id"), "left")
        .groupBy(col("query_id"))
        .agg(count(col("approx_rank")).as("n_found"),
          (count(col("approx_rank")).cast("double") / lit(5.0))
            .cast("float").as("recall_at_5"),
          (max(when(col("exact_rank") === 1 && col("approx_rank").isNotNull,
            1L).otherwise(0L)) === 1).as("top1_found"))
        .orderBy(col("query_id"))
    }),

    // nDCG@5 of the IVF path against the exact ranking — the graded
    // companion of sim_recall_eval (recall says WHETHER the true
    // neighbors surfaced; nDCG says how well their ORDER survived).
    // Gains are the integer 6−exact_rank; each DCG term quantizes to
    // DECIMAL(20,12) so the per-query sums are order-free and exact.
    "sim_ndcg_eval" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir)
      val exact = Similarity.bruteForceTopK(
          emb.filter(col("vec_id") < 8), emb, "vec_id", "embedding", k = 5)
        .select(col("query_id"), col("neighbor_id"),
          col("rank").as("exact_rank"))
      val cents = Similarity.dataCentroids(emb, "vec_id", "embedding", k = 16)
      val approx = Similarity.ivfTopK(
          queries = emb.filter(col("vec_id") < 8), candidates = emb,
          id = "vec_id", vec = "embedding", dim = dim, k = 5,
          nCentroids = 16, nprobe = 4, centroids = Some(cents))
        .select(col("query_id"), col("neighbor_id"),
          col("rank").as("approx_rank"))
      val gain = (lit(6) - col("exact_rank")).cast("double")
      exact.join(approx, Seq("query_id", "neighbor_id"), "left")
        .withColumn("term", when(col("approx_rank").isNotNull,
            (gain / log2(col("approx_rank") + 1)).cast("decimal(20,12)"))
          .otherwise(lit(0).cast("decimal(20,12)")))
        .withColumn("ideal",
          (gain / log2(col("exact_rank") + 1)).cast("decimal(20,12)"))
        .groupBy(col("query_id"))
        .agg(sum(col("term")).as("dcg"), sum(col("ideal")).as("idcg"))
        .select(col("query_id"),
          (col("dcg").cast("double") / col("idcg").cast("double"))
            .cast("float").as("ndcg_at_5"))
        .orderBy(col("query_id"))
    }),

    // MMR diversified re-rank: cosine top-10 shortlist per query, then
    // 5 greedy λ=0.5 rounds trading relevance against similarity to the
    // already-picked set — the near-dup-suppressing final ranker. The
    // whole greedy trajectory (argmax per round, ties by id) is
    // deterministic, so the oracle replays every pick.
    "retrieval_mmr_diversify" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir)
      val top = Similarity.bruteForceTopK(
        emb.filter(col("vec_id") < 4), emb, "vec_id", "embedding", k = 10)
      val cand = top.join(
          emb.select(col("vec_id").as("neighbor_id"), col("embedding").as("cv")),
          Seq("neighbor_id"))
        .select(col("query_id"), col("neighbor_id"),
          col("cosine").as("rel"), col("cv"))
      Retrieval.mmrDiversify(cand, k = 5, lambda = 0.5, id = "neighbor_id")
        .select(col("query_id"), col("neighbor_id"),
          col("rel").cast("float").as("rel"), col("mmr_rank"))
        .orderBy(col("query_id"), col("mmr_rank"))
    }),

    // BINARY-quantized ANN: 1-bit sign codes (two 32-bit words for
    // dim 64 — 32× compression), integer-popcount Hamming shortlist
    // (40 per query, deterministic (hamming, id) cut), exact-cosine
    // rerank over a |shortlist|-sized vector fetch-back — the
    // scan-codes-then-refine lifecycle production vector stores run
    // when the float corpus no longer fits the cache tier.
    "sim_binary_topk" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir)
      Similarity.binaryTopK(
          queries = emb.filter(col("vec_id") < 8), candidates = emb,
          id = "vec_id", vec = "embedding", dim = 64, k = 5, shortlist = 40)
        .select(col("query_id"), col("neighbor_id"),
          col("cosine").cast("float").as("cosine"), col("rank"))
        .orderBy(col("query_id"), col("rank"))
    }),

    // per-label class prototypes via DECIMAL elementwise means
    "emb_label_centroids" -> ((s, dir) =>
      Similarity.labelCentroids(Tables.embeddings(s, dir),
          label = "label", vec = "embedding")
        .orderBy(col("label"), col("j"))),

    // label-quality audit: confusion matrix of the nearest-centroid
    // classifier vs the gold labels — off-diagonal cells are the
    // label/embedding disagreement review queue. Broadcast |labels|
    // prototypes, one streamed scan, map-side argmax.
    // Per-dimension label separability as a rank AUC: for each embedding
    // dimension, the probability a class-0 vector scores above a rest
    // vector (ties at ½) — U/(n₁n₀) from the SAME tie-corrected
    // Mann–Whitney machinery the experiment tier uses, with dimension as
    // the group. The single-feature-AUC screen is also THE target-leakage
    // detector shape: a dimension (or feature) whose AUC sits near 0 or 1
    // encodes the label almost alone. One posexplode (pure map) + the
    // MWU histogram aggregation per dimension — never a per-row sort.
    "emb_dim_auc" -> ((s, dir) => {
      val dims = Tables.embeddings(s, dir)
        .filter(col("label").isNotNull)
        .select(
          when(col("label") === 0, "A").otherwise("B").as("variant"),
          posexplode(col("embedding")).as(Seq("dim", "v")))
      Experiment.mannWhitneyU(dims, group = "dim", variant = "variant",
          value = "v")
        .select(col("dim"), col("n_a"), col("n_b"),
          (col("u_stat") / (col("n_a") * col("n_b")).cast("double"))
            .cast("float").as("auc"))
        .orderBy(col("dim"))
    }),

    "emb_centroid_confusion" -> ((s, dir) =>
      Similarity.centroidLabelConfusion(Tables.embeddings(s, dir),
          id = "vec_id", vec = "embedding", label = "label")
        .orderBy(col("gold"), col("pred"))),

    // the confusion matrix's chance-corrected summary: accuracy and
    // Cohen's kappa, marginal products in DECIMAL(38,0) then one
    // double chain
    "emb_centroid_kappa" -> ((s, dir) =>
      Similarity.cohenKappa(
        Similarity.centroidLabelConfusion(Tables.embeddings(s, dir),
          id = "vec_id", vec = "embedding", label = "label"))),

    // per-dimension z-score scaling; long-form so the oracle replays the
    // DECIMAL moment sums dimension by dimension
    "emb_standardize" -> ((s, dir) =>
      Similarity.standardizeEmbeddings(Tables.embeddings(s, dir),
          id = "vec_id", vec = "embedding")
        .orderBy(col("vec_id"), col("j"))),

    // JL projection onto corpus vectors 0..15 as directions; long-form
    // (vec_id, plane j, component) so the oracle needs no array assembly
    "emb_project" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir)
      Similarity.projectEmbeddings(emb, "vec_id", "embedding", outDim = 16)
        .select(col("vec_id"),
          posexplode(col("proj")).as(Seq("j", "comp")))
        .select(col("vec_id"), col("j").cast("long").as("j"), col("comp"))
        .orderBy(col("vec_id"), col("j"))
    }),

    // hyperplanes = corpus vectors 16..31 → DuckDB rebuilds the same buckets
    "sim_lsh_buckets" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir)
      val planes = Similarity.dataVectors(emb, "vec_id", "embedding", from = 16, n = 16)
      Similarity.lshSignatureWith(emb, "embedding", planes)
        .select(col("vec_id"), col("lsh_bucket"))
        .orderBy(col("vec_id"))
    }),

    // one Lloyd pass over the data-centroid seed before probing — the
    // refinement is DECIMAL-exact and the seed readable, so the oracle
    // replays the whole assign→mean→probe chain in SQL (the index-build
    // collect is k×dim doubles, not data)
    "sim_ivf_refined_topk" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir)
      val cents = Similarity.refineCentroidsWith(emb, "embedding",
        Similarity.dataCentroids(emb, "vec_id", "embedding", k = 16))
      Similarity.ivfTopK(
          queries = emb.filter(col("vec_id") < 8),
          candidates = emb, id = "vec_id", vec = "embedding",
          dim = dim, k = 5, nCentroids = 16, nprobe = 4,
          centroids = Some(cents))
        .select(col("query_id"), col("neighbor_id"),
          col("cosine").cast("float").as("cosine"), col("rank"))
        .orderBy(col("query_id"), col("rank"))
    }),

    // Fully-oracled IVF: centroids are the first 16 corpus vectors, so
    // DuckDB can rebuild the identical index and probe path in SQL —
    // ANN semantics verified end-to-end on the hard signal.
    "sim_ivf_data_topk" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir)
      val cents = Similarity.dataCentroids(emb, "vec_id", "embedding", k = 16)
      Similarity.ivfTopK(
          queries = emb.filter(col("vec_id") < 8),
          candidates = emb, id = "vec_id", vec = "embedding",
          dim = dim, k = 5, nCentroids = 16, nprobe = 4,
          centroids = Some(cents))
        .select(col("query_id"), col("neighbor_id"),
          col("cosine").cast("float").as("cosine"), col("rank"))
        .orderBy(col("query_id"), col("rank"))
    }),

    // embedding DQ audit: the pre-index gate a 100 TB vector lake runs
    // before building ANN structures (zero vectors break cosine; dim
    // drift breaks every kernel) — one aggregate pass, no shuffle
    "emb_audit" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir)
      val d = Similarity.dot(col("embedding"), col("embedding"))
      emb.agg(
        count(lit(1)).as("n_vectors"),
        sum(when(col("embedding").isNull, 1).otherwise(0)).cast("long").as("n_null"),
        sum(when(col("embedding").isNotNull && d === 0.0, 1).otherwise(0))
          .cast("long").as("n_zero_norm"),
        min(size(col("embedding"))).cast("long").as("dim_min"),
        max(size(col("embedding"))).cast("long").as("dim_max"))
    }),

    // product-quantization ANN: codebooks = subspace slices of vectors
    // 32..47; corpus scanned as 8-code rows, ADC = dot(q, reconstruction)
    // — fully oracled (codebooks data-derived, dot order left-to-right)
    "sim_pq_topk" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir)
      val cb = Similarity.pqCodebooks(emb, "vec_id", "embedding", dim,
        m = 8, k = 16, from = 32)
      Similarity.pqTopK(
          queries = emb.filter(col("vec_id") < 8),
          candidates = emb, id = "vec_id", vec = "embedding",
          codebooks = cb, k = 5)
        .select(col("query_id"), col("neighbor_id"),
          col("cosine").cast("float").as("adc_score"), col("rank"))
        .orderBy(col("query_id"), col("rank"))
    }),

    // COMPOSED IVF-PQ — the billion-scale production layout: PQ codes
    // stored inside the IVF postings, probed with ADC over only the
    // nprobe nearest lists. Centroids = vectors 0..15, codebooks =
    // subspace slices of vectors 32..47 — both data-derived, so the
    // whole composition (assign ∘ encode ∘ pruned ADC) replays in SQL
    // on the hard signal.
    "sim_ivfpq_topk" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir)
      val cents = Similarity.dataCentroids(emb, "vec_id", "embedding", k = 16)
      val cb = Similarity.pqCodebooks(emb, "vec_id", "embedding", dim,
        m = 8, k = 16, from = 32)
      Similarity.ivfPqTopK(
          queries = emb.filter(col("vec_id") < 8),
          candidates = emb, id = "vec_id", vec = "embedding",
          cents = cents, codebooks = cb, nprobe = 4, k = 5)
        .select(col("query_id"), col("neighbor_id"),
          col("cosine").cast("float").as("adc_score"), col("rank"))
        .orderBy(col("query_id"), col("rank"))
    }),

    // INDEX LIFECYCLE leg of the composition: probe the once-per-JVM
    // PERSISTED IVF-PQ index — postings come off the lake as m-int
    // codes (partition-pruned to the probed lists), centroids and
    // codebooks load back bit-exactly, so the persisted path shares
    // sim_ivfpq_topk's oracle verbatim.
    "sim_ivfpq_persisted" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir)
      val tmp = ivfPqIndexDir(s, dir)
      Similarity.ivfPqProbe(IvfIndex.loadPqPostings(s, tmp),
          queries = emb.filter(col("vec_id") < 8), id = "vec_id",
          vec = "embedding", cents = IvfIndex.loadCentroids(s, tmp),
          codebooks = IvfIndex.loadCodebooks(s, tmp), nprobe = 4, k = 5)
        .select(col("query_id"), col("neighbor_id"),
          col("cosine").cast("float").as("adc_score"), col("rank"))
        .orderBy(col("query_id"), col("rank"))
    }),

    // ANN quality metric computed BY the engine on itself: recall@5 of
    // the data-centroid IVF probe against brute-force ground truth, per
    // query. Both sides are already-verified queries; this entry verifies
    // the evaluation join. (nprobe=4 of 16 lists ⇒ recall < 1 is the
    // expected, honest answer on unclustered data.)
    "sim_recall_ivf" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir)
      val q8 = emb.filter(col("vec_id") < 8)
      val bf = Similarity.bruteForceTopK(q8, emb, "vec_id", "embedding", k = 5)
        .select(col("query_id"), col("neighbor_id"))
      val cents = Similarity.dataCentroids(emb, "vec_id", "embedding", k = 16)
      val ivf = Similarity.ivfTopK(q8, emb, "vec_id", "embedding",
          dim = dim, k = 5, nCentroids = 16, nprobe = 4,
          centroids = Some(cents))
        .select(col("query_id"), col("neighbor_id"))
      recallAt5(bf, ivf)
    }),

    // the symmetric audit for the PQ path: recall@5 of ADC top-k against
    // brute-force ground truth, same query set and k — quantization loss
    // becomes a measured number instead of an assumption
    "sim_recall_pq" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir)
      val q8 = emb.filter(col("vec_id") < 8)
      val bf = Similarity.bruteForceTopK(q8, emb, "vec_id", "embedding", k = 5)
        .select(col("query_id"), col("neighbor_id"))
      val cb = Similarity.pqCodebooks(emb, "vec_id", "embedding", dim,
        m = 8, k = 16, from = 32)
      val pq = Similarity.pqTopK(queries = q8, candidates = emb,
          id = "vec_id", vec = "embedding", codebooks = cb, k = 5)
        .select(col("query_id"), col("neighbor_id"))
      recallAt5(bf, pq)
    }),

    // INDEX LIFECYCLE incremental leg of the composition: build on the
    // base corpus, APPEND a late batch as codes against the existing
    // centroids AND codebooks (no rebuild), probe. Keeping every
    // index-defining row (vec_id < 48: centroids 0..15, codebook seeds
    // 32..47) in the base makes the appended index bit-identical to the
    // full build, so the shared oracle verifies the whole append path
    // on the hard signal.
    "sim_ivfpq_append" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir)
      val late = col("vec_id") % 5 === 4 && col("vec_id") >= 48
      val tmp = QuerySql.tempDir("graft_ivfpqapp")
      IvfIndex.savePq(emb.filter(!late), "vec_id", "embedding", k = 16, tmp)
      IvfIndex.appendPq(emb.filter(late), "vec_id", "embedding", tmp)
      Similarity.ivfPqProbe(IvfIndex.loadPqPostings(s, tmp),
          queries = emb.filter(col("vec_id") < 8), id = "vec_id",
          vec = "embedding", cents = IvfIndex.loadCentroids(s, tmp),
          codebooks = IvfIndex.loadCodebooks(s, tmp), nprobe = 4, k = 5)
        .select(col("query_id"), col("neighbor_id"),
          col("cosine").cast("float").as("adc_score"), col("rank"))
        .orderBy(col("query_id"), col("rank"))
    }),

    // STREAMING ANN index maintenance — the production continual-ingest
    // loop on the real engine: a file-source stream of late vectors
    // folds into the persisted IVF-PQ index via foreachBatch + appendPq
    // (assign + encode against the frozen centroids/codebooks, append
    // code postings), then the index is probed. Every index-defining
    // row (vec_id < 48) stays in the base build, so the streamed-into
    // index is bit-identical to a full build and the probe shares
    // sim_ivfpq_topk's oracle — checkpointed streaming ingest verified
    // on the hard signal. stream_ prefix: construction runs a real
    // streaming job, so the plan audit (rightly) skips it.
    "stream_ann_ingest_live" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir)
      val late = col("vec_id") % 5 === 4 && col("vec_id") >= 48
      val tmp = QuerySql.tempDir("graft_sann")
      IvfIndex.savePq(emb.filter(!late), "vec_id", "embedding", k = 16,
        s"$tmp/idx")
      emb.filter(late).coalesce(1).write.parquet(s"$tmp/src")
      val q = s.readStream.schema(emb.schema).parquet(s"$tmp/src")
        .writeStream
        .foreachBatch { (batch: DataFrame, _: Long) =>
          IvfIndex.appendPq(batch, "vec_id", "embedding", s"$tmp/idx"); ()
        }
        .option("checkpointLocation", s"$tmp/ckpt")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      Similarity.ivfPqProbe(IvfIndex.loadPqPostings(s, s"$tmp/idx"),
          queries = emb.filter(col("vec_id") < 8), id = "vec_id",
          vec = "embedding", cents = IvfIndex.loadCentroids(s, s"$tmp/idx"),
          codebooks = IvfIndex.loadCodebooks(s, s"$tmp/idx"), nprobe = 4, k = 5)
        .select(col("query_id"), col("neighbor_id"),
          col("cosine").cast("float").as("adc_score"), col("rank"))
        .orderBy(col("query_id"), col("rank"))
    }),

    // RESIDUAL-encoded composition (the FAISS default): codes quantize
    // x − centroid(x), reconstruction adds the centroid back. On
    // clustered corpora residual space is smaller-diameter so the same
    // code budget quantizes finer; on THESE unclustered synthetic
    // embeddings the measured effect is parity (recall@5 0.275 both
    // encodings) — sim_recall_ivfpq_res keeps that comparison a
    // number, not folklore. Codebooks are the seed rows' residuals
    // (driver-replicated assignment, bit-identical to the plan's), so
    // the whole chain still replays in SQL.
    "sim_ivfpq_res_topk" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir)
      val cents = Similarity.dataCentroids(emb, "vec_id", "embedding", k = 16)
      val cb = Similarity.pqResidualCodebooks(emb, "vec_id", "embedding",
        cents, m = 8, k = 16, from = 32)
      Similarity.ivfPqResidualTopK(
          queries = emb.filter(col("vec_id") < 8),
          candidates = emb, id = "vec_id", vec = "embedding",
          cents = cents, codebooks = cb, nprobe = 4, k = 5)
        .select(col("query_id"), col("neighbor_id"),
          col("cosine").cast("float").as("adc_score"), col("rank"))
        .orderBy(col("query_id"), col("rank"))
    }),

    // recall audit of the residual composition, same ground truth and
    // k as every other recall entry — the raw-vs-residual encoding
    // choice becomes a measured number instead of folklore
    "sim_recall_ivfpq_res" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir)
      val q8 = emb.filter(col("vec_id") < 8)
      val bf = Similarity.bruteForceTopK(q8, emb, "vec_id", "embedding", k = 5)
        .select(col("query_id"), col("neighbor_id"))
      val cents = Similarity.dataCentroids(emb, "vec_id", "embedding", k = 16)
      val cb = Similarity.pqResidualCodebooks(emb, "vec_id", "embedding",
        cents, m = 8, k = 16, from = 32)
      val approx = Similarity.ivfPqResidualTopK(q8, emb, "vec_id", "embedding",
          cents = cents, codebooks = cb, nprobe = 4, k = 5)
        .select(col("query_id"), col("neighbor_id"))
      recallAt5(bf, approx)
    }),

    // SemDeDup-shape semantic dedup: IVF-cluster the embeddings, mark
    // within-cluster pairs above cosine 0.35 as semantic duplicates,
    // keep the min-id representative per connected group. Assignment,
    // pairs and the transitive grouping all replay in SQL (recursive
    // CTE) — clustering-based curation on the hard signal.
    "emb_semantic_dedup" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir)
      val cents = Similarity.dataCentroids(emb, "vec_id", "embedding", k = 16)
      Similarity.semanticDedup(emb, "vec_id", "embedding", cents,
          threshold = 0.35)
        .orderBy(col("vec_id"))
    }),

    // SQ8 scalar quantization — per-dimension [min,max] grids, 4×
    // compression (the third standard index family next to IVF and
    // PQ). Bounds are exact min/max (no accumulation), so the whole
    // encode→reconstruct→ADC chain replays in SQL bit-for-bit.
    "sim_sq8_topk" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir)
      val (mins, maxs) = Similarity.sqBounds(emb, "embedding")
      Similarity.sq8TopK(
          queries = emb.filter(col("vec_id") < 8),
          candidates = emb, id = "vec_id", vec = "embedding",
          mins = mins, maxs = maxs, k = 5)
        .select(col("query_id"), col("neighbor_id"),
          col("cosine").cast("float").as("adc_score"), col("rank"))
        .orderBy(col("query_id"), col("rank"))
    }),

    // SQ8's recall audit — completes the per-family recall matrix
    // (IVF, PQ, IVF-PQ, IVF-PQ-residual, SQ8) on the same ground
    // truth: the compression/recall frontier as measured numbers
    "sim_recall_sq8" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir)
      val q8 = emb.filter(col("vec_id") < 8)
      val bf = Similarity.bruteForceTopK(q8, emb, "vec_id", "embedding", k = 5)
        .select(col("query_id"), col("neighbor_id"))
      val (mins, maxs) = Similarity.sqBounds(emb, "embedding")
      val approx = Similarity.sq8TopK(q8, emb, "vec_id", "embedding",
          mins, maxs, k = 5)
        .select(col("query_id"), col("neighbor_id"))
      recallAt5(bf, approx)
    }),

    // recall audit of the COMPOSED index: quantization loss ON TOP of
    // list pruning, against the same brute-force ground truth — the
    // number a production ANN service dials nprobe/codebook size by.
    // (Expect ≤ both sim_recall_ivf and sim_recall_pq: the composition
    // inherits both approximations.)
    "sim_recall_ivfpq" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir)
      val q8 = emb.filter(col("vec_id") < 8)
      val bf = Similarity.bruteForceTopK(q8, emb, "vec_id", "embedding", k = 5)
        .select(col("query_id"), col("neighbor_id"))
      val cents = Similarity.dataCentroids(emb, "vec_id", "embedding", k = 16)
      val cb = Similarity.pqCodebooks(emb, "vec_id", "embedding", dim,
        m = 8, k = 16, from = 32)
      val ivfpq = Similarity.ivfPqTopK(q8, emb, "vec_id", "embedding",
          cents = cents, codebooks = cb, nprobe = 4, k = 5)
        .select(col("query_id"), col("neighbor_id"))
      recallAt5(bf, ivfpq)
    }),

    // near-dup candidates in data-derived LSH buckets (planes = vectors
    // 16..23) — fully oracled end-to-end
    "emb_near_dup" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir)
      val planes = Similarity.dataVectors(emb, "vec_id", "embedding", from = 16, n = 8)
      Similarity.nearDupInBuckets(emb,
          id = "vec_id", vec = "embedding", dim = dim, bits = 8, perBucket = 3,
          planes = Some(planes))
        .select(col("lsh_bucket"), col("id_a"), col("id_b"),
          col("cosine").cast("float").as("cosine"), col("rank"))
        .orderBy(col("lsh_bucket"), col("rank"), col("id_a"), col("id_b"))
    })
  )

  /** Shared recall@5 evaluation join: fraction of brute-force ground
    * truth (query_id, neighbor_id) pairs an approximate leg recovered,
    * per query — ONE definition so every recall audit (IVF, PQ) scores
    * identically, mirrored by [[recallOracleSql]]. */
  private def recallAt5(bf: DataFrame, approx: DataFrame): DataFrame = {
    val hits = bf.join(approx, Seq("query_id", "neighbor_id"))
      .groupBy(col("query_id")).agg(count(lit(1)).as("n_hits"))
    bf.select(col("query_id")).distinct()
      .join(hits, Seq("query_id"), "left")
      .select(col("query_id"),
        (coalesce(col("n_hits"), lit(0L)) / lit(5.0)).cast("float").as("recall_at_5"))
      .orderBy(col("query_id"))
  }

  /** SQL twin of [[recallAt5]]: composes the exact and approximate
    * replays (each an already-verified oracle) as CTEs. */
  private def recallOracleSql(approxSql: String): String =
    s"""WITH bf AS (SELECT query_id, neighbor_id FROM ($simCosineTopkSql) x),
       | ap AS (SELECT query_id, neighbor_id FROM ($approxSql) y),
       | h AS (SELECT bf.query_id, count(*) AS n
       |       FROM bf JOIN ap USING (query_id, neighbor_id)
       |       GROUP BY bf.query_id),
       | qs AS (SELECT DISTINCT query_id FROM bf)
       |SELECT qs.query_id,
       |  CAST(COALESCE(h.n, 0) / 5.0 AS REAL) AS recall_at_5
       |FROM qs LEFT JOIN h ON qs.query_id = h.query_id
       |ORDER BY qs.query_id""".stripMargin

  // PQ replay: codebooks from vectors 32..47 (8 subspaces x 8 dims),
  // encode by argmax(2*x*c - |c|^2, ties to higher code), reconstruct by
  // flattening the codewords in subspace order, ADC = one left-to-right
  // dot over the full 64 dims - bit-identical to the Spark loop. Shared
  // by sim_pq_topk and the sim_recall_pq composition.
  private val simPqTopkSql =
    """WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS dv FROM embeddings),
      | seed AS (SELECT vec_id - 32 AS code, dv FROM v
      |          WHERE vec_id >= 32 AND vec_id < 48),
      | cbn AS (SELECT s, code, list_slice(dv, s*8 + 1, s*8 + 8) AS cw,
      |     list_dot_product(list_slice(dv, s*8 + 1, s*8 + 8),
      |                      list_slice(dv, s*8 + 1, s*8 + 8)) AS c2
      |   FROM seed CROSS JOIN range(0, 8) t(s)),
      | encs AS (SELECT v.vec_id, c.s, c.code,
      |     row_number() OVER (PARTITION BY v.vec_id, c.s ORDER BY
      |       2 * list_dot_product(list_slice(v.dv, c.s*8 + 1, c.s*8 + 8), c.cw)
      |         - c.c2 DESC,
      |       c.code DESC) AS rn
      |   FROM v CROSS JOIN cbn c),
      | rec AS (SELECT e.vec_id, flatten(list(c.cw ORDER BY e.s)) AS rv
      |   FROM (SELECT * FROM encs WHERE rn = 1) e
      |   JOIN cbn c ON c.s = e.s AND c.code = e.code
      |   GROUP BY e.vec_id),
      | q AS (SELECT vec_id AS query_id, dv AS qv FROM v WHERE vec_id < 8),
      | scored AS (SELECT q.query_id, r.vec_id AS neighbor_id,
      |     list_dot_product(q.qv, r.rv) AS adc
      |   FROM q CROSS JOIN rec r WHERE q.query_id <> r.vec_id),
      | rk AS (SELECT query_id, neighbor_id, adc,
      |     row_number() OVER (PARTITION BY query_id
      |       ORDER BY adc DESC, neighbor_id) AS rank
      |   FROM scored)
      |SELECT query_id, neighbor_id, CAST(adc AS REAL) AS adc_score,
      |  CAST(rank AS BIGINT) AS rank
      |FROM rk WHERE rank <= 5
      |ORDER BY query_id, rank""".stripMargin

  // Composed IVF-PQ replay: the sim_ivf_data_topk assignment/probe CTEs
  // (centroids = vectors 0..15, argmax cosine with ties to the HIGHER
  // centroid id, zero vectors coalesced to -2) wrapped around the
  // sim_pq_topk encode/reconstruct CTEs (codebooks = subspace slices of
  // vectors 32..47, argmax 2·x·c − |c|² with ties to the higher code).
  // Scoring is ADC (one left-to-right dot over the 64-dim
  // reconstruction) over only the nprobe=4 probed lists — bit-identical
  // to the Spark composition. Shared by sim_ivfpq_topk,
  // sim_ivfpq_persisted (parquet round-trips codes/centroids/codebooks
  // bit-exactly) and the sim_recall_ivfpq composition.
  private val simIvfPqTopkSql =
    """WITH cent AS (SELECT vec_id AS centroid_id, CAST(embedding AS DOUBLE[]) AS cvec
      |              FROM embeddings WHERE vec_id < 16),
      | v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS dv FROM embeddings),
      | assign AS (SELECT vec_id, centroid_id, dv,
      |     row_number() OVER (PARTITION BY vec_id ORDER BY
      |       COALESCE(list_cosine_similarity(dv, cvec), -2) DESC,
      |       centroid_id DESC) AS rn
      |   FROM v CROSS JOIN cent),
      | asg AS (SELECT vec_id, centroid_id FROM assign WHERE rn = 1),
      | seed AS (SELECT vec_id - 32 AS code, dv FROM v
      |          WHERE vec_id >= 32 AND vec_id < 48),
      | cbn AS (SELECT s, code, list_slice(dv, s*8 + 1, s*8 + 8) AS cw,
      |     list_dot_product(list_slice(dv, s*8 + 1, s*8 + 8),
      |                      list_slice(dv, s*8 + 1, s*8 + 8)) AS c2
      |   FROM seed CROSS JOIN range(0, 8) t(s)),
      | encs AS (SELECT v.vec_id, c.s, c.code,
      |     row_number() OVER (PARTITION BY v.vec_id, c.s ORDER BY
      |       2 * list_dot_product(list_slice(v.dv, c.s*8 + 1, c.s*8 + 8), c.cw)
      |         - c.c2 DESC,
      |       c.code DESC) AS rn
      |   FROM v CROSS JOIN cbn c),
      | rec AS (SELECT e.vec_id, flatten(list(c.cw ORDER BY e.s)) AS rv
      |   FROM (SELECT * FROM encs WHERE rn = 1) e
      |   JOIN cbn c ON c.s = e.s AND c.code = e.code
      |   GROUP BY e.vec_id),
      | post AS (SELECT rec.vec_id AS neighbor_id, asg.centroid_id, rec.rv
      |          FROM rec JOIN asg ON rec.vec_id = asg.vec_id),
      | q AS (SELECT vec_id AS query_id, dv AS qv FROM v WHERE vec_id < 8),
      | probes AS (SELECT query_id, qv, centroid_id,
      |     row_number() OVER (PARTITION BY query_id ORDER BY
      |       COALESCE(list_cosine_similarity(qv, cvec), -2) DESC,
      |       centroid_id DESC) AS pr
      |   FROM q CROSS JOIN cent),
      | scored AS (SELECT p.query_id, post.neighbor_id,
      |     list_dot_product(p.qv, post.rv) AS adc
      |   FROM (SELECT query_id, qv, centroid_id FROM probes WHERE pr <= 4) p
      |   JOIN post USING (centroid_id)
      |   WHERE p.query_id <> post.neighbor_id),
      | rk AS (SELECT query_id, neighbor_id, adc,
      |     row_number() OVER (PARTITION BY query_id
      |       ORDER BY adc DESC, neighbor_id) AS rank
      |   FROM scored)
      |SELECT query_id, neighbor_id, CAST(adc AS REAL) AS adc_score,
      |  CAST(rank AS BIGINT) AS rank
      |FROM rk WHERE rank <= 5
      |ORDER BY query_id, rank""".stripMargin

  // Residual-encoded IVF-PQ replay: assignment and probe CTEs as in
  // simIvfPqTopkSql, but codebooks are the seed rows' RESIDUALS w.r.t.
  // their assigned centroid, encoding runs over every vector's residual,
  // and reconstruction is centroid + flattened codewords (element-wise
  // IEEE add, mirrored exactly by Spark's zip_with). The long-form
  // residual/reconstruction lists are built with the proven
  // cross-join-range + list(ORDER BY) pattern (sim_ivf_refined_topk).
  private val simIvfPqResTopkSql =
    """WITH cent AS (SELECT vec_id AS centroid_id, CAST(embedding AS DOUBLE[]) AS cvec
      |              FROM embeddings WHERE vec_id < 16),
      | v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS dv FROM embeddings),
      | a0 AS (SELECT vec_id, centroid_id, dv,
      |     row_number() OVER (PARTITION BY vec_id ORDER BY
      |       COALESCE(list_cosine_similarity(dv, cvec), -2) DESC,
      |       centroid_id DESC) AS rn
      |   FROM v CROSS JOIN cent),
      | asg AS (SELECT vec_id, centroid_id, dv FROM a0 WHERE rn = 1),
      | res AS (SELECT a.vec_id, a.centroid_id,
      |     list(a.dv[CAST(j AS INTEGER)] - c.cvec[CAST(j AS INTEGER)]
      |          ORDER BY j) AS rv
      |   FROM asg a JOIN cent c USING (centroid_id)
      |   CROSS JOIN range(1, 65) t(j)
      |   GROUP BY a.vec_id, a.centroid_id),
      | cbn AS (SELECT s, r.vec_id - 32 AS code,
      |     list_slice(r.rv, s*8 + 1, s*8 + 8) AS cw,
      |     list_dot_product(list_slice(r.rv, s*8 + 1, s*8 + 8),
      |                      list_slice(r.rv, s*8 + 1, s*8 + 8)) AS c2
      |   FROM res r CROSS JOIN range(0, 8) t(s)
      |   WHERE r.vec_id >= 32 AND r.vec_id < 48),
      | encs AS (SELECT r.vec_id, c.s, c.code,
      |     row_number() OVER (PARTITION BY r.vec_id, c.s ORDER BY
      |       2 * list_dot_product(list_slice(r.rv, c.s*8 + 1, c.s*8 + 8), c.cw)
      |         - c.c2 DESC,
      |       c.code DESC) AS rn
      |   FROM res r CROSS JOIN cbn c),
      | rec AS (SELECT e.vec_id, flatten(list(c.cw ORDER BY e.s)) AS rr
      |   FROM (SELECT * FROM encs WHERE rn = 1) e
      |   JOIN cbn c ON c.s = e.s AND c.code = e.code
      |   GROUP BY e.vec_id),
      | post AS (SELECT a.vec_id AS neighbor_id, a.centroid_id,
      |     list(c.cvec[CAST(j AS INTEGER)] + rec.rr[CAST(j AS INTEGER)]
      |          ORDER BY j) AS fv
      |   FROM asg a JOIN cent c USING (centroid_id)
      |   JOIN rec ON rec.vec_id = a.vec_id
      |   CROSS JOIN range(1, 65) t(j)
      |   GROUP BY a.vec_id, a.centroid_id),
      | q AS (SELECT vec_id AS query_id, dv AS qv FROM v WHERE vec_id < 8),
      | probes AS (SELECT query_id, qv, centroid_id,
      |     row_number() OVER (PARTITION BY query_id ORDER BY
      |       COALESCE(list_cosine_similarity(qv, cvec), -2) DESC,
      |       centroid_id DESC) AS pr
      |   FROM q CROSS JOIN cent),
      | scored AS (SELECT p.query_id, post.neighbor_id,
      |     list_dot_product(p.qv, post.fv) AS adc
      |   FROM (SELECT query_id, qv, centroid_id FROM probes WHERE pr <= 4) p
      |   JOIN post USING (centroid_id)
      |   WHERE p.query_id <> post.neighbor_id),
      | rk AS (SELECT query_id, neighbor_id, adc,
      |     row_number() OVER (PARTITION BY query_id
      |       ORDER BY adc DESC, neighbor_id) AS rank
      |   FROM scored)
      |SELECT query_id, neighbor_id, CAST(adc AS REAL) AS adc_score,
      |  CAST(rank AS BIGINT) AS rank
      |FROM rk WHERE rank <= 5
      |ORDER BY query_id, rank""".stripMargin

  private val simSq8TopkSql =
    """WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS dv FROM embeddings),
      | comps AS (SELECT vec_id, generate_subscripts(dv, 1) AS j,
      |     unnest(dv) AS x FROM v),
      | b AS (SELECT j, min(x) AS mn, max(x) AS mx FROM comps GROUP BY j),
      | rec AS (SELECT c.vec_id,
      |     list(CASE WHEN b.mx - b.mn = 0 THEN b.mn
      |          ELSE b.mn + (LEAST(255, GREATEST(0,
      |               CAST(floor((c.x - b.mn) / (b.mx - b.mn) * 256) AS BIGINT)))
      |               + 0.5) * (b.mx - b.mn) / 256
      |          END ORDER BY c.j) AS rv
      |   FROM comps c JOIN b USING (j) GROUP BY c.vec_id),
      | q AS (SELECT vec_id AS query_id, dv AS qv FROM v WHERE vec_id < 8),
      | scored AS (SELECT q.query_id, r.vec_id AS neighbor_id,
      |     list_dot_product(q.qv, r.rv) AS adc
      |   FROM q CROSS JOIN rec r WHERE q.query_id <> r.vec_id),
      | rk AS (SELECT query_id, neighbor_id, adc,
      |     row_number() OVER (PARTITION BY query_id
      |       ORDER BY adc DESC, neighbor_id) AS rank
      |   FROM scored)
      |SELECT query_id, neighbor_id, CAST(adc AS REAL) AS adc_score,
      |  CAST(rank AS BIGINT) AS rank
      |FROM rk WHERE rank <= 5
      |ORDER BY query_id, rank""".stripMargin

  /** Covariance cell CTEs shared by the emb_covariance and
    * emb_pca_project oracles (0-based cells; quantized product sums —
    * mirrors [[graft.ops.Pca.covariance]] op-for-op; MATERIALIZED: the
    * pca oracle references these once per iteration and DuckDB's
    * default inlining would recompute the 1M-row pair join each time). */
  private val pcaCovCtes =
    """x AS MATERIALIZED (SELECT vec_id,
      |    unnest(range(1, len(e) + 1)) AS i, unnest(e) AS xi
      |  FROM (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e
      |        FROM embeddings WHERE embedding IS NOT NULL)),
      | p AS (SELECT a.i AS i, b.i AS j,
      |     CAST(round((a.xi * b.xi) * 1e12) AS BIGINT) AS p
      |   FROM x a JOIN x b ON a.vec_id = b.vec_id AND a.i <= b.i),
      | sums AS (SELECT i, j, CAST(sum(p) AS DOUBLE) / 1e12 AS s_ij
      |   FROM p GROUP BY 1, 2),
      | ds AS (SELECT i,
      |     CAST(sum(CAST(round(xi * 1e12) AS BIGINT)) AS DOUBLE) / 1e12 AS s
      |   FROM x GROUP BY 1),
      | nn AS (SELECT count(*) AS n FROM (SELECT DISTINCT vec_id FROM x)),
      | cov AS MATERIALIZED (SELECT sums.i - 1 AS i, sums.j - 1 AS j,
      |     (s_ij - (di.s * dj.s) / n) / (n - 1) AS cov
      |   FROM sums JOIN ds di ON di.i = sums.i
      |   JOIN ds dj ON dj.i = sums.j CROSS JOIN nn)""".stripMargin

  /** One power-iteration CTE block per round (mat-vec with quantized
    * sums, then L2 normalization — sqrt is IEEE-exact), chained v0→vN:
    * the same generated-replay pattern as the BPE train oracle. */
  private val pcaIters = 6
  private def pcaIterCtes: String = (1 to pcaIters).map { k =>
    s""" m$k AS (SELECT c.i,
       |     CAST(sum(CAST(c.cov * v.val AS DECIMAL(30,12))) AS DOUBLE) AS mv
       |   FROM covfull c JOIN v${k - 1} v ON c.j = v.i GROUP BY 1),
       | n$k AS (SELECT sqrt(CAST(sum(CAST(mv * mv AS DECIMAL(30,12)))
       |     AS DOUBLE)) AS nrm FROM m$k),
       | v$k AS (SELECT i, mv / nrm AS val FROM m$k, n$k)""".stripMargin
  }.mkString(",\n")

  private val embPcaProjectSql =
    s"""WITH $pcaCovCtes,
       | covfull AS MATERIALIZED (SELECT i, j, cov FROM cov
       |   UNION ALL SELECT j, i, cov FROM cov WHERE i <> j),
       | v0 AS (SELECT i,
       |     CAST(CASE WHEN i = 0 THEN 1 ELSE 0 END AS DOUBLE) AS val
       |   FROM (SELECT DISTINCT i FROM covfull)),
       |$pcaIterCtes,
       | proj AS (SELECT e.vec_id,
       |     CAST(sum(CAST(e.xi * v.val AS DECIMAL(30,12))) AS DOUBLE) AS pc1
       |   FROM x e JOIN v$pcaIters v ON e.i - 1 = v.i GROUP BY 1)
       |SELECT vec_id, CAST(pc1 AS REAL) AS pc1
       |FROM proj ORDER BY vec_id""".stripMargin

  /** k-center greedy replay: per round, every non-center's min cosine
    * distance to the standing center set, argmax with ties to the
    * smaller id — center-for-center [[graft.ops.Similarity.kCenterCoreset]]. */
  private def kCenterCtes(k: Int): String = (2 to k).map { r =>
    s""" m$r AS (SELECT p.vec_id,
       |     min(CAST(1 AS DOUBLE) - list_cosine_similarity(p.dv, c.dv)) AS mind
       |   FROM v p CROSS JOIN ctr${r - 1} c
       |   WHERE p.vec_id NOT IN (SELECT vec_id FROM ctr${r - 1})
       |   GROUP BY 1),
       | c$r AS MATERIALIZED (SELECT v.vec_id, v.dv,
       |     CAST($r AS BIGINT) AS pick_order, m$r.mind AS radius
       |   FROM m$r JOIN v USING (vec_id)
       |   ORDER BY m$r.mind DESC, m$r.vec_id LIMIT 1),
       | ctr$r AS MATERIALIZED (SELECT * FROM ctr${r - 1}
       |   UNION ALL SELECT * FROM c$r)""".stripMargin
  }.mkString(",\n")

  private val embKCenterSql =
    s"""WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS dv
       |           FROM embeddings),
       | ctr1 AS (SELECT vec_id, dv, CAST(1 AS BIGINT) AS pick_order,
       |     CAST(NULL AS DOUBLE) AS radius
       |   FROM v ORDER BY vec_id LIMIT 1),
       |${kCenterCtes(8)}
       |SELECT vec_id, pick_order, CAST(radius AS REAL) AS radius
       |FROM ctr8 ORDER BY pick_order""".stripMargin

  private val simCosineTopkSql =
    """WITH q AS (SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv
      |           FROM embeddings WHERE vec_id < 8),
      | c AS (SELECT vec_id AS neighbor_id, CAST(embedding AS DOUBLE[]) AS cv
      |       FROM embeddings),
      | s AS (SELECT query_id, neighbor_id,
      |         list_cosine_similarity(qv, cv) AS cos
      |       FROM q JOIN c ON query_id <> neighbor_id),
      | r AS (SELECT query_id, neighbor_id, cos,
      |         row_number() OVER (PARTITION BY query_id
      |           ORDER BY cos DESC, neighbor_id) AS rank
      |       FROM s)
      |SELECT query_id, neighbor_id, CAST(cos AS REAL) AS cosine,
      |  CAST(rank AS BIGINT) AS rank
      |FROM r WHERE rank <= 5
      |ORDER BY query_id, rank""".stripMargin

  /** Shared by the emb_centroid_confusion and emb_centroid_kappa
    * oracles: FLOAT label prototypes (bit-identical to the
    * emb_label_centroids contract), nearest-centroid prediction with
    * the (cos DESC, label) tie order, confusion counts. */
  private val centroidConfusionCtes =
    """v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS dv, label
      |     FROM embeddings WHERE label IS NOT NULL),
      | comp AS (SELECT label, generate_subscripts(embedding, 1) AS j,
      |     CAST(unnest(embedding) AS DOUBLE) AS x
      |   FROM embeddings WHERE label IS NOT NULL),
      | cent AS (SELECT label, j,
      |     CAST(CAST(SUM(CAST(x AS DECIMAL(30,12))) AS DOUBLE) / count(*)
      |       AS REAL) AS c
      |   FROM comp GROUP BY 1, 2),
      | cl AS (SELECT label AS pl, list(CAST(c AS DOUBLE) ORDER BY j) AS cv
      |   FROM cent GROUP BY 1),
      | sc AS (SELECT v.vec_id, v.label AS gold, cl.pl,
      |     list_cosine_similarity(v.dv, cl.cv) AS cos
      |   FROM v CROSS JOIN cl),
      | pick AS (SELECT vec_id, gold, pl, row_number() OVER (
      |     PARTITION BY vec_id ORDER BY cos DESC, pl) AS rn FROM sc),
      | conf AS (SELECT gold, pl AS pred, count(*) AS n
      |   FROM pick WHERE rn = 1 GROUP BY 1, 2)""".stripMargin

  private val simIvfDataTopkSql =
    """WITH cent AS (SELECT vec_id AS centroid_id, CAST(embedding AS DOUBLE[]) AS cvec
      |              FROM embeddings WHERE vec_id < 16),
      | v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS dv FROM embeddings),
      | assign AS (SELECT vec_id, centroid_id, dv,
      |     row_number() OVER (PARTITION BY vec_id ORDER BY
      |       COALESCE(list_cosine_similarity(dv, cvec), -2) DESC,
      |       centroid_id DESC) AS rn
      |   FROM v CROSS JOIN cent),
      | idx AS (SELECT vec_id AS neighbor_id, centroid_id, dv AS cv
      |         FROM assign WHERE rn = 1),
      | q AS (SELECT vec_id AS query_id, dv AS qv FROM v WHERE vec_id < 8),
      | probes AS (SELECT query_id, qv, centroid_id,
      |     row_number() OVER (PARTITION BY query_id ORDER BY
      |       COALESCE(list_cosine_similarity(qv, cvec), -2) DESC,
      |       centroid_id DESC) AS pr
      |   FROM q CROSS JOIN cent),
      | scored AS (SELECT p.query_id, i.neighbor_id,
      |     list_cosine_similarity(p.qv, i.cv) AS cos
      |   FROM (SELECT query_id, qv, centroid_id FROM probes WHERE pr <= 4) p
      |   JOIN idx i USING (centroid_id)
      |   WHERE p.query_id <> i.neighbor_id),
      | r AS (SELECT query_id, neighbor_id, cos,
      |     row_number() OVER (PARTITION BY query_id
      |       ORDER BY cos DESC, neighbor_id) AS rank
      |   FROM scored)
      |SELECT query_id, neighbor_id, CAST(cos AS REAL) AS cosine,
      |  CAST(rank AS BIGINT) AS rank
      |FROM r WHERE rank <= 5
      |ORDER BY query_id, rank""".stripMargin

  private val embLofIvfSql: String =
    """WITH cent AS (SELECT vec_id AS centroid_id,
        |              CAST(embedding AS DOUBLE[]) AS cvec
        |              FROM embeddings WHERE vec_id < 16),
        | v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS dv
        |       FROM embeddings),
        | assign AS (SELECT vec_id, centroid_id, dv,
        |     row_number() OVER (PARTITION BY vec_id ORDER BY
        |       COALESCE(list_cosine_similarity(dv, cvec), -2) DESC,
        |       centroid_id DESC) AS arn
        |   FROM v CROSS JOIN cent),
        | idx AS MATERIALIZED (SELECT vec_id AS neighbor_id, centroid_id,
        |       dv AS cv
        |     FROM assign WHERE arn = 1),
        | probes AS (SELECT q.vec_id AS query_id, q.dv AS qv, centroid_id,
        |     row_number() OVER (PARTITION BY q.vec_id ORDER BY
        |       COALESCE(list_cosine_similarity(q.dv, cvec), -2) DESC,
        |       centroid_id DESC) AS pr
        |   FROM v q CROSS JOIN cent),
        | scored AS (SELECT p.query_id, i.neighbor_id,
        |     list_cosine_similarity(p.qv, i.cv) AS cos
        |   FROM (SELECT query_id, qv, centroid_id FROM probes WHERE pr <= 4) p
        |   JOIN idx i USING (centroid_id)
        |   WHERE p.query_id <> i.neighbor_id),
        | r AS (SELECT query_id AS p, neighbor_id AS o,
        |     CAST(1 AS DOUBLE) - cos AS dist,
        |     row_number() OVER (PARTITION BY query_id
        |       ORDER BY cos DESC, neighbor_id) AS rn
        |   FROM scored),
        | nk AS MATERIALIZED (SELECT p, o, dist FROM r WHERE rn <= 10),
        | dk AS MATERIALIZED (SELECT p, dist AS dkv FROM r WHERE rn = 10),
        | rc AS (SELECT nk.p, nk.o, greatest(d2.dkv, nk.dist) AS reach
        |       FROM nk JOIN dk d2 ON d2.p = nk.o),
        | lrd AS MATERIALIZED (SELECT p, CAST(10 AS DOUBLE) /
        |        nullif(CAST(sum(CAST(reach AS DECIMAL(20,12))) AS DOUBLE), 0)
        |          AS lrdv
        |       FROM rc GROUP BY 1),
        | lf AS (SELECT nk.p,
        |        CAST(sum(CAST(lo.lrdv / lp.lrdv AS DECIMAL(20,12))) AS DOUBLE)
        |          / CAST(10 AS DOUBLE) AS lof
        |       FROM nk JOIN lrd lo ON lo.p = nk.o
        |       JOIN lrd lp ON lp.p = nk.p
        |       GROUP BY 1)
        |SELECT p AS vec_id, CAST(lof AS REAL) AS lof
        |FROM lf ORDER BY vec_id""".stripMargin

  val oracle: Map[String, String] = Map(
    "sim_cosine_topk" -> simCosineTopkSql,

    "emb_semantic_decontam" ->
      """WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS dv FROM embeddings),
        | q AS (SELECT vec_id AS query_id, dv AS qv FROM v WHERE vec_id < 8),
        | c AS (SELECT vec_id AS neighbor_id, dv AS cv FROM v WHERE vec_id >= 8)
        |SELECT neighbor_id AS vec_id,
        |  CAST(max(list_cosine_similarity(qv, cv)) AS REAL) AS max_probe_cosine,
        |  max(list_cosine_similarity(qv, cv)) >= 0.35 AS contaminated
        |FROM q JOIN c ON query_id <> neighbor_id
        |GROUP BY 1 ORDER BY vec_id""".stripMargin,

    // recall replay: the exact ranking (sim_cosine_topk's CTEs) left-
    // joined against the IVF ranking (sim_ivf_data_topk's CTEs), both
    // verbatim, folded to per-query hit counts
    "sim_recall_eval" ->
      """WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS dv FROM embeddings),
        | q AS (SELECT vec_id AS query_id, dv AS qv FROM v WHERE vec_id < 8),
        | ex AS (SELECT query_id, neighbor_id, rank FROM (
        |     SELECT query_id, vec_id AS neighbor_id,
        |       row_number() OVER (PARTITION BY query_id
        |         ORDER BY list_cosine_similarity(qv, dv) DESC, vec_id) AS rank
        |     FROM q JOIN v ON query_id <> vec_id) z WHERE rank <= 5),
        | cent AS (SELECT vec_id AS centroid_id, dv AS cvec FROM v WHERE vec_id < 16),
        | assign AS (SELECT vec_id, centroid_id, dv,
        |     row_number() OVER (PARTITION BY vec_id ORDER BY
        |       COALESCE(list_cosine_similarity(dv, cvec), -2) DESC,
        |       centroid_id DESC) AS rn
        |   FROM v CROSS JOIN cent),
        | idx AS (SELECT vec_id AS neighbor_id, centroid_id, dv AS cv
        |         FROM assign WHERE rn = 1),
        | probes AS (SELECT query_id, qv, centroid_id,
        |     row_number() OVER (PARTITION BY query_id ORDER BY
        |       COALESCE(list_cosine_similarity(qv, cvec), -2) DESC,
        |       centroid_id DESC) AS pr
        |   FROM q CROSS JOIN cent),
        | ap AS (SELECT query_id, neighbor_id FROM (
        |     SELECT p.query_id, i.neighbor_id,
        |       row_number() OVER (PARTITION BY p.query_id ORDER BY
        |         list_cosine_similarity(p.qv, i.cv) DESC, i.neighbor_id) AS rank
        |     FROM (SELECT query_id, qv, centroid_id FROM probes WHERE pr <= 4) p
        |     JOIN idx i USING (centroid_id)
        |     WHERE p.query_id <> i.neighbor_id) z WHERE rank <= 5)
        |SELECT e.query_id,
        |  CAST(count(a.neighbor_id) AS BIGINT) AS n_found,
        |  CAST(CAST(count(a.neighbor_id) AS DOUBLE) / CAST(5.0 AS DOUBLE)
        |    AS REAL) AS recall_at_5,
        |  max(CASE WHEN e.rank = 1 AND a.neighbor_id IS NOT NULL
        |      THEN 1 ELSE 0 END) = 1 AS top1_found
        |FROM ex e LEFT JOIN ap a
        |  ON a.query_id = e.query_id AND a.neighbor_id = e.neighbor_id
        |GROUP BY 1 ORDER BY e.query_id""".stripMargin,

    // nDCG replay: the recall-eval CTEs with the approx rank kept,
    // integer gains, quantized DCG terms
    "sim_ndcg_eval" ->
      """WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS dv FROM embeddings),
        | q AS (SELECT vec_id AS query_id, dv AS qv FROM v WHERE vec_id < 8),
        | ex AS (SELECT query_id, neighbor_id, rank FROM (
        |     SELECT query_id, vec_id AS neighbor_id,
        |       row_number() OVER (PARTITION BY query_id
        |         ORDER BY list_cosine_similarity(qv, dv) DESC, vec_id) AS rank
        |     FROM q JOIN v ON query_id <> vec_id) z WHERE rank <= 5),
        | cent AS (SELECT vec_id AS centroid_id, dv AS cvec FROM v WHERE vec_id < 16),
        | assign AS (SELECT vec_id, centroid_id, dv,
        |     row_number() OVER (PARTITION BY vec_id ORDER BY
        |       COALESCE(list_cosine_similarity(dv, cvec), -2) DESC,
        |       centroid_id DESC) AS rn
        |   FROM v CROSS JOIN cent),
        | idx AS (SELECT vec_id AS neighbor_id, centroid_id, dv AS cv
        |         FROM assign WHERE rn = 1),
        | probes AS (SELECT query_id, qv, centroid_id,
        |     row_number() OVER (PARTITION BY query_id ORDER BY
        |       COALESCE(list_cosine_similarity(qv, cvec), -2) DESC,
        |       centroid_id DESC) AS pr
        |   FROM q CROSS JOIN cent),
        | ap AS (SELECT query_id, neighbor_id, rank AS arank FROM (
        |     SELECT p.query_id, i.neighbor_id,
        |       row_number() OVER (PARTITION BY p.query_id ORDER BY
        |         list_cosine_similarity(p.qv, i.cv) DESC, i.neighbor_id) AS rank
        |     FROM (SELECT query_id, qv, centroid_id FROM probes WHERE pr <= 4) p
        |     JOIN idx i USING (centroid_id)
        |     WHERE p.query_id <> i.neighbor_id) z WHERE rank <= 5)
        |SELECT e.query_id,
        |  CAST(CAST(sum(CASE WHEN a.neighbor_id IS NOT NULL
        |      THEN CAST(CAST(6 - e.rank AS DOUBLE) / log2(a.arank + 1)
        |        AS DECIMAL(20,12))
        |      ELSE CAST(0 AS DECIMAL(20,12)) END) AS DOUBLE) /
        |    CAST(sum(CAST(CAST(6 - e.rank AS DOUBLE) / log2(e.rank + 1)
        |      AS DECIMAL(20,12))) AS DOUBLE) AS REAL) AS ndcg_at_5
        |FROM ex e LEFT JOIN ap a
        |  ON a.query_id = e.query_id AND a.neighbor_id = e.neighbor_id
        |GROUP BY 1 ORDER BY e.query_id""".stripMargin,

    // MMR replay: same top-10 shortlist, then the five greedy rounds
    // unrolled — each round's argmax is a row_number pick over
    // (score desc, id), score = 0.5·rel − 0.5·max-cosine-to-picked
    "retrieval_mmr_diversify" -> {
      val rounds = (2 to 5).map { i =>
        s""" ms$i AS (SELECT r.query_id, r.neighbor_id,
           |     max(list_cosine_similarity(r.cv, s.cv)) AS msim
           |   FROM rem${i - 1} r JOIN sel${i - 1} s USING (query_id)
           |   GROUP BY 1, 2),
           | sc$i AS (SELECT r.query_id, r.neighbor_id, r.rel, r.cv,
           |     CAST(0.5 AS DOUBLE) * r.rel - CAST(0.5 AS DOUBLE) * m.msim AS score
           |   FROM rem${i - 1} r JOIN ms$i m
           |     ON m.query_id = r.query_id AND m.neighbor_id = r.neighbor_id),
           | p$i AS (SELECT query_id, neighbor_id, rel, cv,
           |     CAST($i AS BIGINT) AS mmr_rank FROM (
           |     SELECT *, row_number() OVER (PARTITION BY query_id
           |       ORDER BY score DESC, neighbor_id) AS rn FROM sc$i) z
           |   WHERE rn = 1),
           | sel$i AS (SELECT * FROM sel${i - 1} UNION ALL SELECT * FROM p$i),
           | rem$i AS (SELECT r.* FROM rem${i - 1} r
           |   WHERE NOT EXISTS (SELECT 1 FROM p$i p
           |     WHERE p.query_id = r.query_id AND p.neighbor_id = r.neighbor_id))""".stripMargin
      }.mkString(",\n")
      s"""WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS dv FROM embeddings),
         | q AS (SELECT vec_id AS query_id, dv AS qv FROM v WHERE vec_id < 4),
         | s0 AS (SELECT query_id, vec_id AS neighbor_id,
         |     list_cosine_similarity(qv, dv) AS rel, dv AS cv
         |   FROM q JOIN v ON query_id <> vec_id),
         | cand AS (SELECT query_id, neighbor_id, rel, cv FROM (
         |     SELECT *, row_number() OVER (PARTITION BY query_id
         |       ORDER BY rel DESC, neighbor_id) AS rn FROM s0) z
         |   WHERE rn <= 10),
         | p1 AS (SELECT query_id, neighbor_id, rel, cv,
         |     CAST(1 AS BIGINT) AS mmr_rank FROM (
         |     SELECT *, row_number() OVER (PARTITION BY query_id
         |       ORDER BY rel DESC, neighbor_id) AS rn FROM cand) z
         |   WHERE rn = 1),
         | sel1 AS (SELECT * FROM p1),
         | rem1 AS (SELECT c.* FROM cand c
         |   WHERE NOT EXISTS (SELECT 1 FROM p1 p
         |     WHERE p.query_id = c.query_id AND p.neighbor_id = c.neighbor_id)),
         |$rounds
         |SELECT query_id, neighbor_id, CAST(rel AS REAL) AS rel, mmr_rank
         |FROM sel5 ORDER BY query_id, mmr_rank""".stripMargin
    },

    // binary sign codes as two 32-bit words (bit 63 via 1<<63 would
    // overflow DuckDB's signed shift — the word split avoids it in both
    // engines), popcount Hamming, deterministic shortlist, exact rerank
    "sim_binary_topk" ->
      """WITH w AS (SELECT vec_id,
        |     CAST(sum(CASE WHEN x > 0 AND i <= 32
        |       THEN CAST(1 AS BIGINT) << (CAST(i AS INTEGER) - 1)
        |       ELSE 0 END) AS BIGINT) AS w0,
        |     CAST(sum(CASE WHEN x > 0 AND i > 32
        |       THEN CAST(1 AS BIGINT) << (CAST(i AS INTEGER) - 33)
        |       ELSE 0 END) AS BIGINT) AS w1
        |   FROM (SELECT vec_id, unnest(embedding) AS x,
        |           generate_subscripts(embedding, 1) AS i FROM embeddings)
        |   GROUP BY 1),
        | v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS dv FROM embeddings),
        | q AS (SELECT v.vec_id AS query_id, v.dv AS qv, w.w0 AS q0, w.w1 AS q1
        |       FROM v JOIN w USING (vec_id) WHERE v.vec_id < 8),
        | c AS (SELECT v.vec_id AS neighbor_id, w.w0 AS c0, w.w1 AS c1
        |       FROM v JOIN w USING (vec_id)),
        | hm AS (SELECT query_id, neighbor_id, qv,
        |          bit_count(xor(q0, c0)) + bit_count(xor(q1, c1)) AS hamming
        |        FROM q JOIN c ON query_id <> neighbor_id),
        | sl AS (SELECT query_id, neighbor_id, qv FROM (
        |     SELECT *, row_number() OVER (PARTITION BY query_id
        |       ORDER BY hamming, neighbor_id) AS srn FROM hm) z
        |   WHERE srn <= 40),
        | r AS (SELECT s.query_id, s.neighbor_id,
        |          list_cosine_similarity(s.qv, v.dv) AS cos
        |        FROM sl s JOIN v ON v.vec_id = s.neighbor_id),
        | rk AS (SELECT query_id, neighbor_id, cos,
        |          row_number() OVER (PARTITION BY query_id
        |            ORDER BY cos DESC, neighbor_id) AS rank FROM r)
        |SELECT query_id, neighbor_id, CAST(cos AS REAL) AS cosine,
        |  CAST(rank AS BIGINT) AS rank
        |FROM rk WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin,

    "emb_drift_smd" ->
      """WITH pos AS (SELECT vec_id % 2 AS grp, p - 1 AS dim,
        |          CAST(floor(dv[p] * 1e9) AS BIGINT) AS xn
        |       FROM (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS dv,
        |               unnest(range(1, len(embedding) + 1)) AS p
        |             FROM embeddings) z),
        | g AS (SELECT grp, dim, count(*) AS n,
        |        sum(CAST(xn AS HUGEINT)) AS s,
        |        sum(CAST(xn AS HUGEINT) * xn) AS ss
        |       FROM pos GROUP BY 1, 2),
        | j AS (SELECT a.dim, a.n AS n_a, b.n AS n_b,
        |        CAST(a.s AS DOUBLE) / CAST(a.n AS DOUBLE) AS ma,
        |        CAST(b.s AS DOUBLE) / CAST(b.n AS DOUBLE) AS mb,
        |        (CAST(a.ss AS DOUBLE) - (CAST(a.s AS DOUBLE) * CAST(a.s AS DOUBLE))
        |            / CAST(a.n AS DOUBLE)) / (CAST(a.n AS DOUBLE) - 1.0) AS va,
        |        (CAST(b.ss AS DOUBLE) - (CAST(b.s AS DOUBLE) * CAST(b.s AS DOUBLE))
        |            / CAST(b.n AS DOUBLE)) / (CAST(b.n AS DOUBLE) - 1.0) AS vb
        |       FROM g a JOIN g b USING (dim)
        |       WHERE a.grp = 0 AND b.grp = 1)
        |SELECT CAST(dim AS BIGINT) AS dim, n_a, n_b,
        | ma / 1e9 AS mean_a, mb / 1e9 AS mean_b,
        | CAST((ma - mb) / nullif(sqrt((va + vb) / 2.0), 0) AS REAL) AS smd
        |FROM j ORDER BY dim""".stripMargin,

    "emb_kcenter_coreset" -> embKCenterSql,

    "emb_lof_outliers" ->
      """WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS dv
        |           FROM embeddings),
        | s AS (SELECT a.vec_id AS p, b.vec_id AS o,
        |        CAST(1 AS DOUBLE) - list_cosine_similarity(a.dv, b.dv) AS dist
        |       FROM v a JOIN v b ON a.vec_id <> b.vec_id),
        | r AS (SELECT *, row_number() OVER (PARTITION BY p
        |          ORDER BY dist, o) AS rn FROM s),
        | nk AS MATERIALIZED (SELECT p, o, dist FROM r WHERE rn <= 10),
        | dk AS MATERIALIZED (SELECT p, dist AS dkv FROM r WHERE rn = 10),
        | rc AS (SELECT nk.p, nk.o, greatest(d2.dkv, nk.dist) AS reach
        |       FROM nk JOIN dk d2 ON d2.p = nk.o),
        | lrd AS MATERIALIZED (SELECT p, CAST(10 AS DOUBLE) /
        |        nullif(CAST(sum(CAST(reach AS DECIMAL(20,12))) AS DOUBLE), 0)
        |          AS lrdv
        |       FROM rc GROUP BY 1),
        | lf AS (SELECT nk.p,
        |        CAST(sum(CAST(lo.lrdv / lp.lrdv AS DECIMAL(20,12))) AS DOUBLE)
        |          / CAST(10 AS DOUBLE) AS lof
        |       FROM nk JOIN lrd lo ON lo.p = nk.o
        |       JOIN lrd lp ON lp.p = nk.p
        |       GROUP BY 1)
        |SELECT p AS vec_id, CAST(lof AS REAL) AS lof
        |FROM lf ORDER BY vec_id""".stripMargin,

    "emb_lof_outliers_ivf" -> embLofIvfSql,

    // the persisted-index run is bit-identical to the ephemeral one —
    // same data-derived centroids, same probe — so it SHARES the
    // oracle: any save/load divergence flips the hash
    "emb_lof_outliers_ivf_persisted" -> embLofIvfSql,

    "emb_hard_negatives" ->
      """WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS dv, label
        |           FROM embeddings),
        | q AS (SELECT vec_id AS anchor_id, dv AS qv, label AS al FROM v
        |       WHERE vec_id < 16),
        | s AS (SELECT q.anchor_id, c.vec_id AS cand_id,
        |        list_cosine_similarity(q.qv, c.dv) AS cos,
        |        (c.label = q.al) AS is_pos
        |       FROM q JOIN v c ON c.vec_id <> q.anchor_id),
        | b AS (SELECT anchor_id, is_pos, cand_id, cos,
        |        row_number() OVER (PARTITION BY anchor_id, is_pos
        |          ORDER BY cos DESC, cand_id) AS rn
        |       FROM s),
        | p AS (SELECT anchor_id, cand_id AS pos_id, cos AS pc
        |       FROM b WHERE is_pos AND rn = 1),
        | n AS (SELECT anchor_id, cand_id AS neg_id, cos AS nc
        |       FROM b WHERE NOT is_pos AND rn = 1)
        |SELECT p.anchor_id, pos_id, CAST(pc AS REAL) AS pos_cos,
        | neg_id, CAST(nc AS REAL) AS neg_cos,
        | CAST(pc - nc AS REAL) AS margin
        |FROM p JOIN n USING (anchor_id) ORDER BY anchor_id""".stripMargin,

    "emb_covariance" ->
      s"""WITH $pcaCovCtes
         |SELECT i, j, CAST(cov AS REAL) AS cov
         |FROM cov ORDER BY i, j""".stripMargin,

    // the eigensolver replay: identical quantized arithmetic per
    // iteration, so equality holds at ANY fixed iteration budget
    "emb_pca_project" -> embPcaProjectSql,

    // same machinery as sim_cosine_topk with the candidate set
    // pre-narrowed to embeddings whose paired document is English
    "sim_filtered_topk" ->
      """WITH q AS (SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv
        |           FROM embeddings WHERE vec_id < 8),
        | c AS (SELECT vec_id AS neighbor_id, CAST(embedding AS DOUBLE[]) AS cv
        |       FROM embeddings e
        |       WHERE EXISTS (SELECT 1 FROM documents d
        |         WHERE d.doc_id = e.vec_id AND d.lang = 'en')),
        | s AS (SELECT query_id, neighbor_id,
        |         list_cosine_similarity(qv, cv) AS cos
        |       FROM q JOIN c ON query_id <> neighbor_id),
        | r AS (SELECT query_id, neighbor_id, cos,
        |         row_number() OVER (PARTITION BY query_id
        |           ORDER BY cos DESC, neighbor_id) AS rank
        |       FROM s)
        |SELECT query_id, neighbor_id, CAST(cos AS REAL) AS cosine,
        |  CAST(rank AS BIGINT) AS rank
        |FROM r WHERE rank <= 5
        |ORDER BY query_id, rank""".stripMargin,

    // the BM25 block is the shared QuerySql.bm25Ctes (cannot drift from
    // text_bm25_topk's); the semantic list replays sim_cosine_topk's
    // machinery at k = 10; fusion is 1/(60 + rank) per list, quantized
    // like every cross-engine double sum
    "retrieval_rrf_fusion" ->
      s"""WITH ${QuerySql.bm25Ctes("7, 123, 321, 444")},
         | eq AS (SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv
         |        FROM embeddings WHERE vec_id IN (7, 123, 321, 444)),
         | ec AS (SELECT vec_id AS neighbor_id, CAST(embedding AS DOUBLE[]) AS cv
         |        FROM embeddings),
         | es AS (SELECT query_id, neighbor_id,
         |          list_cosine_similarity(qv, cv) AS cos
         |        FROM eq JOIN ec ON query_id <> neighbor_id),
         | er AS (SELECT query_id, neighbor_id AS doc_id,
         |          row_number() OVER (PARTITION BY query_id
         |            ORDER BY cos DESC, neighbor_id) AS rank
         |        FROM es),
         | lists AS (
         |   SELECT query_id, doc_id, rank FROM bm25r WHERE rank <= 10
         |   UNION ALL
         |   SELECT query_id, doc_id, rank FROM er WHERE rank <= 10),
         | fused AS (SELECT query_id, doc_id,
         |     CAST(sum(CAST(1.0 / (CAST(60 AS DOUBLE) + CAST(rank AS DOUBLE))
         |       AS DECIMAL(20,12))) AS DOUBLE) AS rrf_score,
         |     count(*) AS n_lists
         |   FROM lists GROUP BY 1, 2),
         | fr AS (SELECT query_id, doc_id, rrf_score, n_lists,
         |     row_number() OVER (PARTITION BY query_id
         |       ORDER BY rrf_score DESC, doc_id) AS rank
         |   FROM fused)
         |SELECT query_id, doc_id, CAST(rrf_score AS REAL) AS rrf_score,
         |  CAST(n_lists AS BIGINT) AS n_lists, CAST(rank AS BIGINT) AS rank
         |FROM fr WHERE rank <= 10
         |ORDER BY query_id, rank""".stripMargin,

    "emb_label_centroids" ->
      """WITH c AS (SELECT label, generate_subscripts(embedding, 1) AS j,
        |             CAST(unnest(embedding) AS DOUBLE) AS x
        |           FROM embeddings)
        |SELECT label, CAST(j AS BIGINT) AS j,
        |  CAST(CAST(SUM(CAST(x AS DECIMAL(30,12))) AS DOUBLE) / count(*) AS REAL) AS c,
        |  count(*) AS n
        |FROM c GROUP BY label, j
        |ORDER BY label, j""".stripMargin,

    // the experiment tier's tie-corrected rank-sum replay, grouped by
    // dimension; AUC = U / (n_a·n_b)
    "emb_dim_auc" ->
      """WITH e AS (SELECT
        |     CASE WHEN label = 0 THEN 'A' ELSE 'B' END AS variant,
        |     generate_subscripts(embedding, 1) - 1 AS dim,
        |     unnest(embedding) AS v
        |   FROM embeddings WHERE label IS NOT NULL),
        | tie AS (SELECT dim, v, count(*) AS c,
        |     sum(CASE WHEN variant = 'A' THEN 1 ELSE 0 END) AS ca
        |   FROM e GROUP BY 1, 2),
        | cw AS (SELECT *, sum(c) OVER (PARTITION BY dim ORDER BY v
        |     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
        |   FROM tie),
        | g AS (SELECT dim, CAST(sum(ca) AS BIGINT) AS n_a,
        |     CAST(sum(c - ca) AS BIGINT) AS n_b,
        |     CAST(sum(ca * (2 * cum - c + 1)) AS BIGINT) AS r1x2
        |   FROM cw GROUP BY 1
        |   HAVING sum(ca) >= 1 AND sum(c - ca) >= 1 AND sum(c) >= 2)
        |SELECT CAST(dim AS INT) AS dim, n_a, n_b,
        |  CAST((CAST(r1x2 - n_a * (n_a + 1) AS DOUBLE) / 2.0) /
        |    CAST(n_a * n_b AS DOUBLE) AS REAL) AS auc
        |FROM g ORDER BY dim""".stripMargin,

    "emb_centroid_confusion" ->
      s"""WITH $centroidConfusionCtes
         |SELECT gold, pred, CAST(n AS BIGINT) AS n
         |FROM conf ORDER BY gold, pred""".stripMargin,

    "emb_centroid_kappa" ->
      s"""WITH $centroidConfusionCtes,
         | tot AS (SELECT sum(n) AS nn,
         |     sum(CASE WHEN gold = pred THEN n ELSE 0 END) AS agree
         |   FROM conf),
         | rs AS (SELECT gold AS l, sum(n) AS r FROM conf GROUP BY 1),
         | cs AS (SELECT pred AS l, sum(n) AS c FROM conf GROUP BY 1),
         | pe AS (SELECT COALESCE(sum(CAST(COALESCE(r, 0) AS HUGEINT)
         |       * COALESCE(c, 0)), 0) AS penum
         |   FROM rs FULL JOIN cs USING (l))
         |SELECT CAST(nn AS BIGINT) AS n, CAST(agree AS BIGINT) AS n_agree,
         | CAST(CAST(agree AS DOUBLE) / CAST(nn AS DOUBLE) AS REAL)
         |   AS accuracy,
         | CAST(CAST(CAST(agree AS HUGEINT) * nn - penum AS DOUBLE) /
         |   nullif(CAST(CAST(nn AS HUGEINT) * nn - penum AS DOUBLE), 0)
         |   AS REAL) AS kappa
         |FROM tot CROSS JOIN pe""".stripMargin,

    "emb_standardize" ->
      """WITH c AS (SELECT vec_id, generate_subscripts(embedding, 1) AS j,
        |             CAST(unnest(embedding) AS DOUBLE) AS x
        |           FROM embeddings),
        | s AS (SELECT j,
        |     CAST(SUM(CAST(x AS DECIMAL(30,12))) AS DOUBLE) / count(*) AS mean,
        |     CAST(SUM(CAST(x*x AS DECIMAL(30,12))) AS DOUBLE) / count(*) AS meansq
        |   FROM c GROUP BY j),
        | st AS (SELECT j, mean,
        |     sqrt(greatest(meansq - mean*mean, 0.0)) AS std FROM s)
        |SELECT c.vec_id, CAST(c.j AS BIGINT) AS j,
        |  CAST((c.x - st.mean) / nullif(st.std, 0.0) AS REAL) AS z
        |FROM c JOIN st USING (j)
        |ORDER BY vec_id, j""".stripMargin,

    "emb_project" ->
      """WITH p AS (SELECT vec_id AS j, CAST(embedding AS DOUBLE[]) AS pv
        |           FROM embeddings WHERE vec_id < 16),
        | e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS ev FROM embeddings)
        |SELECT e.vec_id, CAST(p.j AS BIGINT) AS j,
        |  CAST(list_dot_product(e.ev, p.pv) AS REAL) AS comp
        |FROM e CROSS JOIN p
        |ORDER BY vec_id, j""".stripMargin,

    // Recall evaluation composed from the two verified queries above and
    // below (each embedded as a WITH-bearing subquery).
    "sim_recall_ivf" -> recallOracleSql(simIvfDataTopkSql),

    "sim_recall_pq" -> recallOracleSql(simPqTopkSql),

    // Mirrors ivfTopK with dataCentroids exactly: the assignment argmax is
    // array_max over (cos, id) structs — highest cosine, ties to the
    // HIGHER centroid id — hence ORDER BY cos DESC, centroid_id DESC;
    // the probe list uses the same ordering; zero vectors coalesce to -2.
    "sim_ivf_data_topk" -> simIvfDataTopkSql,

    // the persisted index is bit-identical to the in-memory data-derived
    // one (see the query comment), so the oracle is shared
    "sim_ivf_persisted" -> simIvfDataTopkSql,

    // append path: base-build + late-batch append must equal the
    // full-corpus index (same centroids by construction)
    "sim_ivf_append" -> simIvfDataTopkSql,

    // the persisted centroids are the first 16 corpus vectors widened to
    // double — parquet round-trips them bit-exactly
    "sim_ivf_build" ->
      """SELECT vec_id AS centroid_id,
        | CAST(generate_subscripts(embedding, 1) - 1 AS BIGINT) AS j,
        | CAST(unnest(embedding) AS DOUBLE) AS comp
        |FROM embeddings WHERE vec_id < 16
        |ORDER BY centroid_id, j""".stripMargin,

    "emb_audit" ->
      """SELECT CAST(count(*) AS BIGINT) AS n_vectors,
        |  CAST(sum(CASE WHEN embedding IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null,
        |  CAST(sum(CASE WHEN embedding IS NOT NULL
        |    AND list_dot_product(CAST(embedding AS DOUBLE[]), CAST(embedding AS DOUBLE[])) = 0
        |    THEN 1 ELSE 0 END) AS BIGINT) AS n_zero_norm,
        |  CAST(min(len(embedding)) AS BIGINT) AS dim_min,
        |  CAST(max(len(embedding)) AS BIGINT) AS dim_max
        |FROM embeddings""".stripMargin,

    // PQ replay: codebooks from vectors 32..47 (8 subspaces × 8 dims),
    // encode by argmax(2·x·c − |c|², ties to higher code), reconstruct by
    // flattening the codewords in subspace order, ADC = one left-to-right
    // dot over the full 64 dims — bit-identical to the Spark loop.
    "sim_pq_topk" -> simPqTopkSql,

    // composed index: IVF assignment/probe wrapped around PQ
    // encode/reconstruct — see simIvfPqTopkSql's comment
    "sim_ivfpq_topk" -> simIvfPqTopkSql,

    // the persisted composition is bit-identical to the in-memory one
    // (parquet round-trips codes, centroids and codebooks exactly)
    "sim_ivfpq_persisted" -> simIvfPqTopkSql,

    "sim_recall_ivfpq" -> recallOracleSql(simIvfPqTopkSql),

    // base-build + code append must equal the full-corpus composition
    // (identical centroids and codebooks by construction)
    "sim_ivfpq_append" -> simIvfPqTopkSql,

    // the streamed-in index is bit-identical to the full build (same
    // argument as the batch append; the stream only changes WHO calls
    // appendPq), so the probe shares the composition oracle
    "stream_ann_ingest_live" -> simIvfPqTopkSql,

    // residual-encoded composition — see simIvfPqResTopkSql's comment
    "sim_ivfpq_res_topk" -> simIvfPqResTopkSql,

    // SQ8 replay: per-dim exact min/max bounds, code = clamp(floor(
    // (x−mn)/(mx−mn)·256)), mid-bucket reconstruction, left-to-right
    // ADC dot — every step an IEEE exact-rounded double op mirrored by
    // the Spark zip_with chain (constant dims code 0 / reconstruct mn)
    "sim_sq8_topk" -> simSq8TopkSql,

    "sim_recall_sq8" -> recallOracleSql(simSq8TopkSql),

    // SemDeDup replay: data-centroid assignment (ties to the higher
    // id, zero vectors → −2), within-cluster pairs at cosine ≥ 0.35,
    // transitive closure via recursive CTE, group label = least(id,
    // min reachable), kept = "I am my group's label"; rows in no pair
    // group to themselves
    "emb_semantic_dedup" ->
      """WITH RECURSIVE cent AS (SELECT vec_id AS centroid_id,
        |     CAST(embedding AS DOUBLE[]) AS cvec
        |   FROM embeddings WHERE vec_id < 16),
        | v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS dv FROM embeddings),
        | a0 AS (SELECT vec_id, centroid_id, dv,
        |     row_number() OVER (PARTITION BY vec_id ORDER BY
        |       COALESCE(list_cosine_similarity(dv, cvec), -2) DESC,
        |       centroid_id DESC) AS rn
        |   FROM v CROSS JOIN cent),
        | asg AS (SELECT vec_id, centroid_id, dv FROM a0 WHERE rn = 1),
        | pr AS (SELECT a.vec_id AS id_a, b.vec_id AS id_b
        |   FROM asg a JOIN asg b
        |     ON a.centroid_id = b.centroid_id AND a.vec_id < b.vec_id
        |   WHERE list_cosine_similarity(a.dv, b.dv) >= 0.35),
        | e AS (SELECT id_a AS src, id_b AS dst FROM pr
        |       UNION SELECT id_b, id_a FROM pr),
        | reach(a, b) AS (
        |   SELECT src, dst FROM e
        |   UNION
        |   SELECT r.a, e.dst FROM reach r JOIN e ON r.b = e.src),
        | comp AS (SELECT a AS vec_id, least(a, min(b)) AS grp
        |          FROM reach GROUP BY a)
        |SELECT v.vec_id,
        |  CAST(COALESCE(c.grp, v.vec_id) AS BIGINT) AS group_id,
        |  (COALESCE(c.grp, v.vec_id) = v.vec_id) AS kept
        |FROM v LEFT JOIN comp c ON v.vec_id = c.vec_id
        |ORDER BY v.vec_id""".stripMargin,

    "sim_recall_ivfpq_res" -> recallOracleSql(simIvfPqResTopkSql),

    // Planes are corpus vectors 16..31; bit i = (v · plane_i) > 0. Both
    // engines accumulate the dot left-to-right in double, so the sign —
    // and hence the bucket — is bit-identical away from exact-zero dots.
    "sim_lsh_buckets" ->
      """WITH p AS (SELECT vec_id - 16 AS i, CAST(embedding AS DOUBLE[]) AS pv
        |           FROM embeddings WHERE vec_id >= 16 AND vec_id < 32),
        | v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS dv FROM embeddings)
        |SELECT v.vec_id,
        |  CAST(coalesce(sum(CASE WHEN list_dot_product(dv, pv) > 0
        |    THEN (CAST(1 AS BIGINT) << CAST(i AS INTEGER)) ELSE 0 END), 0) AS BIGINT) AS lsh_bucket
        |FROM v CROSS JOIN p
        |GROUP BY v.vec_id ORDER BY v.vec_id""".stripMargin,

    // Same bucketing with 8 planes (vectors 16..23), then the top-3
    // most-similar pairs inside each bucket.
    "emb_near_dup" ->
      """WITH p AS (SELECT vec_id - 16 AS i, CAST(embedding AS DOUBLE[]) AS pv
        |           FROM embeddings WHERE vec_id >= 16 AND vec_id < 24),
        | v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS dv FROM embeddings),
        | so AS (SELECT v.vec_id,
        |     CAST(coalesce(sum(CASE WHEN list_dot_product(dv, pv) > 0
        |       THEN (CAST(1 AS BIGINT) << CAST(i AS INTEGER)) ELSE 0 END), 0) AS BIGINT) AS lsh_bucket
        |   FROM v CROSS JOIN p GROUP BY v.vec_id),
        | sig AS (SELECT so.vec_id, so.lsh_bucket, v.dv
        |         FROM so JOIN v ON so.vec_id = v.vec_id),
        | pairs AS (SELECT a.lsh_bucket, a.vec_id AS id_a, b.vec_id AS id_b,
        |     list_cosine_similarity(a.dv, b.dv) AS cos
        |   FROM sig a JOIN sig b
        |     ON a.lsh_bucket = b.lsh_bucket AND a.vec_id < b.vec_id),
        | r AS (SELECT *, row_number() OVER (PARTITION BY lsh_bucket
        |         ORDER BY cos DESC, id_a, id_b) AS rank FROM pairs)
        |SELECT lsh_bucket, id_a, id_b, CAST(cos AS REAL) AS cosine,
        |  CAST(rank AS BIGINT) AS rank
        |FROM r WHERE rank <= 3
        |ORDER BY lsh_bucket, rank, id_a, id_b""".stripMargin,

    // Replays the full Lloyd-refined IVF chain: assign to the data-centroid
    // seed (argmax cosine, ties to the HIGHER centroid id), per-centroid
    // elementwise means through DECIMAL(30,12) sums (reduction-order-proof
    // in both engines; decimal→double then double÷count mirrors the Scala
    // getDecimal.doubleValue/n exactly), empty centroids keep their seed
    // vector, then the same probe/top-k as sim_ivf_data_topk.
    "sim_ivf_refined_topk" ->
      """WITH cent0 AS (SELECT vec_id AS centroid_id, CAST(embedding AS DOUBLE[]) AS cvec
        |               FROM embeddings WHERE vec_id < 16),
        | v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS dv FROM embeddings),
        | a0 AS (SELECT vec_id, centroid_id, dv,
        |     row_number() OVER (PARTITION BY vec_id ORDER BY
        |       COALESCE(list_cosine_similarity(dv, cvec), -2) DESC,
        |       centroid_id DESC) AS rn
        |   FROM v CROSS JOIN cent0),
        | a1 AS (SELECT vec_id, centroid_id, dv FROM a0 WHERE rn = 1),
        | comp AS (SELECT centroid_id, j,
        |     CAST(SUM(CAST(dv[CAST(j AS INTEGER)] AS DECIMAL(30,12))) AS DOUBLE)
        |       / COUNT(*) AS c
        |   FROM a1 CROSS JOIN range(1, 65) t(j)
        |   GROUP BY centroid_id, j),
        | rf AS (SELECT centroid_id, list(c ORDER BY j) AS cvec
        |        FROM comp GROUP BY centroid_id),
        | cent AS (SELECT c0.centroid_id, COALESCE(rf.cvec, c0.cvec) AS cvec
        |          FROM cent0 c0 LEFT JOIN rf USING (centroid_id)),
        | assign AS (SELECT vec_id, centroid_id, dv,
        |     row_number() OVER (PARTITION BY vec_id ORDER BY
        |       COALESCE(list_cosine_similarity(dv, cvec), -2) DESC,
        |       centroid_id DESC) AS rn
        |   FROM v CROSS JOIN cent),
        | idx AS (SELECT vec_id AS neighbor_id, centroid_id, dv AS cv
        |         FROM assign WHERE rn = 1),
        | q AS (SELECT vec_id AS query_id, dv AS qv FROM v WHERE vec_id < 8),
        | probes AS (SELECT query_id, qv, centroid_id,
        |     row_number() OVER (PARTITION BY query_id ORDER BY
        |       COALESCE(list_cosine_similarity(qv, cvec), -2) DESC,
        |       centroid_id DESC) AS pr
        |   FROM q CROSS JOIN cent),
        | scored AS (SELECT p.query_id, i.neighbor_id,
        |     list_cosine_similarity(p.qv, i.cv) AS cos
        |   FROM (SELECT query_id, qv, centroid_id FROM probes WHERE pr <= 4) p
        |   JOIN idx i USING (centroid_id)
        |   WHERE p.query_id <> i.neighbor_id),
        | r AS (SELECT query_id, neighbor_id, cos,
        |     row_number() OVER (PARTITION BY query_id
        |       ORDER BY cos DESC, neighbor_id) AS rank
        |   FROM scored)
        |SELECT query_id, neighbor_id, CAST(cos AS REAL) AS cosine,
        |  CAST(rank AS BIGINT) AS rank
        |FROM r WHERE rank <= 5
        |ORDER BY query_id, rank""".stripMargin
  )
}
