package graft

import org.scalatest.funsuite.AnyFunSuite

/**
 * The SQL-asymmetry regression gate: every oracle query's operator must be
 * reachable from a SQL-only session (Spark Connect, thrift server, a
 * notebook with no Scala cell), and the claim is enforced by enumeration —
 * a NEW query cannot land without classifying its SQL route, and a route
 * claim cannot outlive the TVF/function it names.
 *
 * Classification policy (one or more routes per query):
 *  - `tvf:<name>`   — the query's operator (or the persisted-artifact form
 *                     of its family) is exposed as that registered
 *                     table-valued function. The route must reach the same
 *                     RESULT semantics; variants differing only in which
 *                     knob is fixed (live vs stored model, recall-contract
 *                     twin queries) share their family's TVF.
 *  - `expr:<name>`  — the kernel is a registered scalar function and the
 *                     rest of the query is plain SQL around it (e.g.
 *                     brute-force cosine top-k over `graft_dot`; the LSH/
 *                     bucketed ACCELERATIONS of the same result contract
 *                     are API-side physical strategies, not semantics).
 *  - `sql`          — plain ANSI/Spark SQL over the raw tables reproduces
 *                     the result with NO trained-model literals; the
 *                     query's own DuckDB oracle is the constructive proof.
 *
 * Round-11 verdict context: `packReport` shipped without a TVF — the one
 * operator a SQL user couldn't reach — re-opening an asymmetry class this
 * spec now closes structurally.
 */
class SqlReachabilitySpec extends AnyFunSuite {

  private val Routes: Map[String, Seq[String]] = Map(
    // -- ANN / vector retrieval ------------------------------------------
    "ann_topk" -> Seq("expr:graft_dot", "sql"),
    "ann_lsh_topk" -> Seq("expr:graft_dot"),
    "ann_lsh_recall" -> Seq("expr:graft_dot"),
    "ann_ivf_topk" -> Seq("tvf:graft_ivf_screen"),
    "ann_ivf_topk_indexed" -> Seq("tvf:graft_ivf_screen"),
    "ann_ivf_recall" -> Seq("tvf:graft_ivf_screen"),
    "ann_range" -> Seq("tvf:graft_range_search"),
    "ann_range_indexed" -> Seq("tvf:graft_range_search"),
    "pq_codes" -> Seq("tvf:graft_pq_screen"),
    "pq_topk" -> Seq("tvf:graft_pq_screen"),
    "pq_topk_indexed" -> Seq("tvf:graft_pq_screen"),
    "pq_recall" -> Seq("tvf:graft_pq_screen"),
    "ivfpq_topk" -> Seq("tvf:graft_ivfpq_screen"),
    "ivfpq_topk_indexed" -> Seq("tvf:graft_ivfpq_screen"),
    "knn_classify" -> Seq("tvf:graft_knn_classify"),
    "knn_classify_indexed" -> Seq("tvf:graft_knn_screen"),
    "knn_classify_pq" -> Seq("tvf:graft_knn_screen_pq"),
    // -- embedding audits / clustering -----------------------------------
    "embed_stats" -> Seq("sql"),
    "embed_dim_stats" -> Seq("tvf:graft_embed_dim_stats"),
    "embed_energy" -> Seq("tvf:graft_embed_energy"),
    "embed_quantize" -> Seq("sql"),
    "embed_outliers" -> Seq("tvf:graft_embed_outliers"),
    "embed_outliers_scored" -> Seq("tvf:graft_embed_outliers"),
    "embed_cluster" -> Seq("tvf:graft_embed_cluster"),
    "embed_cluster_model" -> Seq("tvf:graft_embed_cluster"),
    "cluster_sample" -> Seq("tvf:graft_cluster_sample"),
    "cluster_sample_model" -> Seq("tvf:graft_cluster_sample"),
    "cluster_drift" -> Seq("tvf:graft_cluster_drift"),
    "embed_neardup" -> Seq("expr:graft_dot"),
    "embed_neardup_lsh" -> Seq("expr:graft_dot"),
    "embed_neardup_lsh_check" -> Seq("expr:graft_dot"),
    "semantic_dedup" -> Seq("tvf:graft_embed_cluster", "expr:graft_dot"),
    // -- dedup family -----------------------------------------------------
    "dedup_exact" -> Seq("sql"),
    "neardup_pairs" -> Seq("tvf:graft_neardup"),
    "neardup_join" -> Seq("tvf:graft_neardup"),
    "neardup_clusters" -> Seq("tvf:graft_neardup"),
    "neardup_containment" -> Seq("sql"),
    "dedup_keep_best" -> Seq("tvf:graft_dedup_keep_best"),
    "dedup_keep_best_scored" -> Seq("tvf:graft_dedup_keep_best"),
    "dedup_report" -> Seq("tvf:graft_neardup", "sql"),
    "jaccard_ngram" -> Seq("sql"),
    "minhash_sig" -> Seq("sql"),
    "simhash" -> Seq("sql"),
    "simhash_pairs" -> Seq("sql"),
    "chunk_dedup" -> Seq("sql"),
    "chunk_dedup_cdc" -> Seq("sql"),
    "chunk_dedup_indexed" -> Seq("tvf:graft_chunk_screen"),
    "chunk_novelty" -> Seq("tvf:graft_chunk_novelty"),
    "winnow_fingerprints" -> Seq("sql"),
    "winnow_overlap" -> Seq("sql"),
    "span_dupes" -> Seq("tvf:graft_span_dupes"),
    "span_screen" -> Seq("tvf:graft_span_screen"),
    "span_scrub" -> Seq("tvf:graft_span_scrub"),
    "span_scrub_ref" -> Seq("tvf:graft_span_scrub_indexed"),
    "decontaminate" -> Seq("tvf:graft_decontaminate"),
    "decontaminate_multi" -> Seq("tvf:graft_decontaminate_multi"),
    // -- ingestion loop ----------------------------------------------------
    "ingest_dedup" -> Seq("tvf:graft_neardup"),
    "ingest_dedup_indexed" -> Seq("tvf:graft_ingest_screen"),
    "ingest_screen" -> Seq("tvf:graft_ingest_screen"),
    "ingest_screen_gated" -> Seq("tvf:graft_ingest_screen2"),
    "ingest_screen_tokens" ->
      Seq("tvf:graft_ingest_screen", "tvf:graft_bpe_count"),
    // -- text analysis / retrieval ----------------------------------------
    "doc_stats" -> Seq("sql"),
    "lang_id_eval" -> Seq("sql"),
    "quality_gopher" -> Seq("tvf:graft_quality_gopher"),
    "quality_repetition" -> Seq("sql"),
    "lm_score" -> Seq("sql"),
    "nb_classify" -> Seq("tvf:graft_nb_score"),
    "nb_score_bounded" -> Seq("tvf:graft_nb_score"),
    "tfidf_topterms" -> Seq("sql"),
    "bm25_topk" -> Seq("tvf:graft_bm25"),
    "bm25_batch" -> Seq("tvf:graft_bm25_batch"),
    "bm25_batch_model" -> Seq("tvf:graft_bm25_batch"),
    "term_freq" -> Seq("sql"),
    "token_hist" -> Seq("sql"),
    "pii_scrub" -> Seq("sql"),
    "corpus_drift" -> Seq("tvf:graft_corpus_drift"),
    "source_report" -> Seq("tvf:graft_source_report"),
    // -- mix / sampling / split -------------------------------------------
    "corpus_mix" -> Seq("sql"),
    "corpus_mix_tokens" -> Seq("tvf:graft_mix_tokens"),
    "mix_temperature" -> Seq("tvf:graft_mix_temperature"),
    "mix_temperature_bpe" ->
      Seq("tvf:graft_mix_temperature", "tvf:graft_bpe_count"),
    "mix_temperature_fill" ->
      Seq("tvf:graft_mix_temperature", "tvf:graft_mix_tokens"),
    "importance_sample" -> Seq("tvf:graft_importance_sample"),
    "source_cap" -> Seq("tvf:graft_source_cap"),
    "source_cap_hash" -> Seq("tvf:graft_source_cap"),
    "split_assign" -> Seq("tvf:graft_split_assign"),
    "split_assign_grouped" -> Seq("tvf:graft_split_assign"),
    "curate_sample_split" ->
      Seq("tvf:graft_importance_sample", "tvf:graft_split_assign"),
    "sample_shuffle" -> Seq("sql"),
    "sample_split" -> Seq("sql"),
    "sample_stratified" -> Seq("sql"),
    "sample_weighted" -> Seq("sql"),
    "seq_pack" -> Seq("sql"),
    "pack_report" -> Seq("tvf:graft_pack_report"),
    // no-split packing: one TVF serves both strategies (strategy is an
    // argument) and the padding audit is a plain GROUP BY over it.
    "pack_nosplit" -> Seq("tvf:graft_pack_nosplit"),
    "pack_nosplit_nextfit" -> Seq("tvf:graft_pack_nosplit"),
    "pack_nosplit_report" -> Seq("tvf:graft_pack_nosplit"),
    // the padded-bin SFT export: train persists, then one TVF
    // materializes the whole-doc id bins with boundary offsets.
    "pack_nosplit_ids" ->
      Seq("tvf:graft_bpe_train", "tvf:graft_pack_nosplit_ids"),
    // coverage audit: train persists, encode-to-ids reads the persisted
    // model, unk counting is plain SQL over the ids.
    "bpe_coverage" ->
      Seq("tvf:graft_bpe_train", "tvf:graft_bpe_encode_ids"),
    // FIM: md5 draws + substr are plain SQL too (the oracle proves it);
    // the TVF is the one-call form.
    "fim_transform" -> Seq("tvf:graft_fim_transform", "sql"),
    "shuffle_audit" -> Seq("tvf:graft_shuffle_audit", "sql"),
    // leakage audit = the near-dup TVF's pairs + the split_assign SQL
    // rolled up — plain SQL around the family TVF.
    "split_leakage" -> Seq("tvf:graft_neardup", "sql"),
    // leak-gate decision = the near-dup family's indexed pairs + the
    // split_assign SQL + a CASE — plain SQL around the family TVFs.
    "ingest_leak_gate" -> Seq("tvf:graft_neardup", "tvf:graft_split_assign"),
    "bpe_count" -> Seq("tvf:graft_bpe_train", "tvf:graft_bpe_count"),
    "bpe_count_byte" -> Seq("tvf:graft_bpe_train", "tvf:graft_bpe_count"),
    "bpe_compression" -> Seq("tvf:graft_bpe_count", "sql"),
    "bpe_vocab" -> Seq("tvf:graft_bpe_encode", "sql"),
    "bpe_encode" -> Seq("tvf:graft_bpe_train", "tvf:graft_bpe_encode"),
    // id-level surface: train persists (5/6-arg graft_bpe_train), then
    // encode-to-ids / ship-the-vocab read the persisted model.
    "bpe_encode_ids" ->
      Seq("tvf:graft_bpe_train", "tvf:graft_bpe_encode_ids"),
    "bpe_vocab_ids" -> Seq("tvf:graft_bpe_train", "tvf:graft_bpe_vocab"),
    // the pretokenizer is a TRAIN-time mode (6-arg graft_bpe_train);
    // counting reads the persisted model, which carries the mode.
    "bpe_count_pretok" -> Seq("tvf:graft_bpe_train", "tvf:graft_bpe_count"),
    // the packed-id export artifact: train persists, then one TVF
    // materializes the sharded ARRAY<INT> sequences.
    "pack_ids" -> Seq("tvf:graft_bpe_train", "tvf:graft_pack_ids"),
    // integrity digest: a plain GROUP BY over the family TVF's exploded
    // ids (the pack_nosplit_report pattern).
    "pack_ids_digest" ->
      Seq("tvf:graft_bpe_train", "tvf:graft_pack_digest"),
    // the manifest = the digest TVF's rollup + constant columns.
    "export_manifest" ->
      Seq("tvf:graft_bpe_train", "tvf:graft_pack_digest"),
    "pack_nosplit_digest" ->
      Seq("tvf:graft_bpe_train", "tvf:graft_pack_nosplit_ids"),
    // segment table: pure seq_pack layout arithmetic, no model literals
    // — the range-unnest oracle is the constructive proof.
    "pack_segments" -> Seq("tvf:graft_pack_segments", "sql"),
    // cross-epoch audit: md5 layout + lag windows, plain SQL replay.
    "epoch_shuffle" -> Seq("tvf:graft_epoch_shuffle", "sql"),
    // fertility: the family count TVF + a plain rollup (the
    // bpe_compression pattern).
    "bpe_fertility" ->
      Seq("tvf:graft_bpe_train", "tvf:graft_bpe_fertility"),
    // hybrid fusion: both ranker families are TVFs; the RRF arithmetic
    // is plain integer SQL over their bounded outputs. The indexed form
    // is the family TVF's own 5-arg persisted-artifact arity.
    "hybrid_topk" -> Seq("tvf:graft_hybrid_topk"),
    "hybrid_topk_indexed" -> Seq("tvf:graft_hybrid_topk"),
    // binary-artifact validators: graft_bin_digest reads the exported
    // .bin/.idx files themselves (kind-dispatched on the commit
    // marker), emitting the rows pack_ids_digest/pack_nosplit_digest
    // compute from the relational twin; graft_bin_read is the same
    // file surface as rows (the digest = a GROUP BY over its exploded
    // ids — the pack_nosplit_report pattern) plus the O(1) point
    // lookup arity.
    // (graft_bin_manifest is the marker-identity row the validator
    // session joins against the producer's manifest first;
    // graft_bin_export is the PRODUCER side of the same loop — a
    // SQL-only session trains, exports, and validates end to end.)
    "bin_digest" -> Seq("tvf:graft_bin_export", "tvf:graft_bin_digest",
      "tvf:graft_bin_read", "tvf:graft_bin_manifest"),
    "bin_digest_sft" ->
      Seq("tvf:graft_bin_export", "tvf:graft_bin_digest",
        "tvf:graft_bin_read", "tvf:graft_bin_manifest"),
    // the managed epoch-append family: graft_bin_append is the SQL
    // producer (append + fold via BinFamily); the digest/manifest
    // validators resolve the managed root through CURRENT.
    "bin_append_digest" ->
      Seq("tvf:graft_bin_append", "tvf:graft_bin_digest",
        "tvf:graft_bin_manifest"),
    "bin_fold_digest" ->
      Seq("tvf:graft_bin_append", "tvf:graft_bin_digest"),
    "bin_append_digest_sft" ->
      Seq("tvf:graft_bin_append", "tvf:graft_bin_digest",
        "tvf:graft_bin_manifest"),
    // the SFT manifest = the no-split export digest + constant columns.
    "export_manifest_sft" ->
      Seq("tvf:graft_bpe_train", "tvf:graft_pack_nosplit_ids"),
    // multi-epoch export: the digest TVF once per epoch salt, unioned.
    "epoch_export" ->
      Seq("tvf:graft_bpe_train", "tvf:graft_pack_digest"),
    "pack_report_bpe" ->
      Seq("tvf:graft_pack_report", "tvf:graft_bpe_count"),
    // -- composite pipelines ----------------------------------------------
    "corpus_curate" -> Seq("tvf:graft_curate"),
    "pipeline_clean" -> Seq("tvf:graft_neardup", "sql"),
    // -- multimodal --------------------------------------------------------
    "multimodal_features" -> Seq("sql"),
    "multimodal_frames" -> Seq("sql"),
    // -- jaws alarm surface ------------------------------------------------
    "jaws_effective_alarms" -> Seq("sql"),
    "jaws_effective_notifications" -> Seq("sql"),
    "jaws_latest_activation" -> Seq("sql"),
    "jaws_mask_emissions" -> Seq("sql"),
    "jaws_override_set" -> Seq("sql"),
    "jaws_registrations" -> Seq("sql"),
    // -- relational / SQL rubric ------------------------------------------
    "approx_distinct" -> Seq("sql"),
    "asof_join" -> Seq("sql"),
    "grouping_sets" -> Seq("sql"),
    "json_extract" -> Seq("sql"),
    "pivot_events" -> Seq("sql"),
    "profile_table" -> Seq("sql"),
    "quantiles" -> Seq("sql"),
    "quantiles_approx" -> Seq("sql"),
    "range_join" -> Seq("sql"),
    "salted_join" -> Seq("sql"),
    "scalar_funcs" -> Seq("sql"),
    "semi_anti" -> Seq("sql"),
    "sessionize" -> Seq("sql"),
    "set_ops" -> Seq("sql"),
    "sliding_window" -> Seq("sql"),
    "sql_surface" -> Seq("sql"),
    "topk_parts" -> Seq("sql"),
    "topn_per_group" -> Seq("sql"),
    "tpch_q1" -> Seq("sql"),
    "tpch_q3" -> Seq("sql"),
    "tpch_q6" -> Seq("sql"),
    "tumbling_window" -> Seq("sql"),
    "window_running" -> Seq("sql"))

  test("every SparkEntry query has a classified SQL route (completeness both ways)") {
    val queries = SparkEntry.queries.keySet
    val classified = Routes.keySet
    val unclassified = queries -- classified
    assert(unclassified.isEmpty,
      s"queries with NO SQL-reachability classification (add them to " +
        s"Routes with a tvf:/expr:/sql route): ${unclassified.toSeq.sorted}")
    val stale = classified -- queries
    assert(stale.isEmpty,
      s"Routes names queries that no longer exist: ${stale.toSeq.sorted}")
  }

  test("every claimed tvf:/expr: route names a REGISTERED function") {
    val tvfs = GraftExtensions.tableFunctions.map(_._1.funcName).toSet
    val exprs = GraftExtensions.functions.map(_._1.funcName).toSet
    val bad = for {
      (q, routes) <- Routes.toSeq
      r <- routes
      ok = r match {
        case s if s.startsWith("tvf:") => tvfs(s.stripPrefix("tvf:"))
        case s if s.startsWith("expr:") => exprs(s.stripPrefix("expr:"))
        case "sql" => true
        case _ => false
      }
      if !ok
    } yield s"$q -> $r"
    assert(bad.isEmpty,
      s"routes claiming unregistered functions (or malformed): $bad")
    assert(Routes.values.forall(_.nonEmpty), "a query with zero routes")
  }

  test("every registered TVF backs at least one oracle query's route") {
    // The reverse direction: a TVF nobody can tie to an oracle-checked
    // query is either dead surface or an operator whose correctness is
    // not oracle-gated. Exemptions are EXPLICIT and justified.
    val exempt = Set(
      // storage-maintenance audit over the managed index roots; exercised
      // end-to-end by the ingest demos (DemoSurfaceSpec) and its own TVF
      // spec — there is no parquet-table oracle for filesystem layout.
      "graft_index_report")
    val cited = Routes.values.flatten.collect {
      case r if r.startsWith("tvf:") => r.stripPrefix("tvf:")
    }.toSet
    val tvfs = GraftExtensions.tableFunctions.map(_._1.funcName).toSet
    val orphans = tvfs -- cited -- exempt
    assert(orphans.isEmpty,
      s"TVFs no oracle query cites (classify or exempt with a reason): " +
        s"${orphans.toSeq.sorted}")
  }
}
