package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Each `queries` entry is one operator from SURVEY.md §2's inventory (or a
  * training-data-pipeline extension), and each has a DuckDB-runnable oracle
  * in [[oracleSql]] with identical column names/types. Non-SQL-expressible
  * operators (crypto round trips, wire codecs) are covered by ScalaTest specs
  * and appear here as rows-only checks where meaningful.
  */
object SparkEntry {
  import graft.queries._

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    RelationalQueries.q01PricingSummary(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q01_pricing_summary" -> (RelationalQueries.q01PricingSummary _),
    "q02_revenue_filter" -> (RelationalQueries.q02Revenue _),
    "q03_top_customers" -> (RelationalQueries.q03TopCustomers _),
    "q04_region_revenue" -> (RelationalQueries.q04RegionRevenue _),
    "q05_running_total" -> (RelationalQueries.q05RunningTotal _),
    "q06_top_orders" -> (RelationalQueries.q06TopOrders _),
    "q07_key_sets" -> (RelationalQueries.q07KeySets _),
    "q08_event_types" -> (RelationalQueries.q08EventTypes _),
    "q09_object_keys" -> (RelationalQueries.q09ObjectKeys _),
    "q10_hourly_events" -> (RelationalQueries.q10HourlyEvents _),
    "q11_event_regroup" -> (RelationalQueries.q11EventRegroup _),
    "q14_salted_agg" -> (RelationalQueries.q14SaltedAgg _),
    "q15_semi_anti" -> (RelationalQueries.q15SemiAnti _),
    "q16_rollup" -> (RelationalQueries.q16Rollup _),
    "q19_salted_join" -> (RelationalQueries.q19SaltedJoin _),
    "q27_partial_salt" -> (RelationalQueries.q27PartialSaltedJoin _),
    "q20_topk_operator" -> (RelationalQueries.q20TopKOperator _),
    "q17_json_props" -> (RelationalQueries.q17JsonProps _),
    "w01_asof_funnel" -> (RelationalQueries.w01AsofFunnel _),
    "w02_sessions" -> (RelationalQueries.w02Sessions _),
    "i01_interval_join" -> (RelationalQueries.i01IntervalJoin _),
    "i02_band_join_auto" -> (RelationalQueries.i02BandJoinAuto _),
    "i04_band_agg_pushdown" -> (RelationalQueries.i04BandAggPushdown _),
    "i05_band_stats" -> (RelationalQueries.i05BandStats _),
    // oracle-gated since r3: output = exact values + in-bounds flags the
    // live sketches must satisfy (oracle emits literal-true flags)
    "a01_sketches" -> (RelationalQueries.a01Sketches _),
    "q18_exact_quantiles" -> (RelationalQueries.q18ExactQuantiles _),
    "q12_chunk_index" -> (SegmentQueries.q12ChunkIndex _),
    "q13_chunks_for_range" -> (SegmentQueries.q13ChunksForRange _),
    "r01_format_route" -> (SegmentQueries.r01FormatRoute _),
    "r02_iceberg_stats" -> (SegmentQueries.r02IcebergStats _),
    "r03_time_range_scan" -> (SegmentQueries.r03TimeRangeScan _),
    "t01_token_stats" -> (TextQueries.t01TokenStats _),
    "t02_quality" -> (TextQueries.t02Quality _),
    "t03_langid" -> (TextQueries.t03LangId _),
    "t04_fingerprint" -> (TextQueries.t04Fingerprint _),
    "t05_ngram_profile" -> (TextQueries.t05NgramProfile _),
    "d01_dedup_groups" -> (TextQueries.d01DedupGroups _),
    "d02_minhash_sig" -> (TextQueries.d02MinHashSig _),
    "d03_minhash_pairs" -> (TextQueries.d03MinHashPairs _),
    "d04_simhash" -> (TextQueries.d04SimHash _),
    "d05_jaccard_pairs" -> (TextQueries.d05JaccardPairs _),
    "d06_bitset_jaccard" -> (TextQueries.d06BitsetJaccardExpr _),
    "d07_dedup_clusters" -> (TextQueries.d07DedupClusters _),
    "d08_decontaminate" -> (TextQueries.d08Decontaminate _),
    "d10_bloom_decontaminate" -> (TextQueries.d10BloomDecontaminate _),
    "t08_repetition" -> (TextQueries.t08Repetition _),
    "t09_salient_terms" -> (TextQueries.t09SalientTerms _),
    "t10_mix_sample" -> (TextQueries.t10MixSample _),
    "p01_clean_corpus" -> (TextQueries.p01CleanCorpus _),
    "p03_curation_funnel" -> (TextQueries.p03CurationFunnel _),
    "x01_token_windows" -> (TextQueries.x01TokenWindows _),
    "x02_pack_bins" -> (TextQueries.x02PackBins _),
    "t06_stratified_sample" -> (TextQueries.t06StratifiedSample _),
    "t07_vocab_mask" -> (TextQueries.t07VocabMask _),
    "m01_media_features" -> (MultimodalQueries.m01MediaFeatures _),
    "m02_frame_sample" -> (MultimodalQueries.m02FrameSample _),
    "m03_media_codec" -> (MultimodalQueries.m03MediaCodec _),
    "m04_image_resize" -> (MultimodalQueries.m04ImageResize _),
    "m05_audio_features" -> (MultimodalQueries.m05AudioFeatures _),
    "m06_scene_cuts" -> (MultimodalQueries.m06SceneCuts _),
    "m07_phash_neardup" -> (MultimodalQueries.m07PhashNearDup _),
    "m08_corrupt_quarantine" -> (MultimodalQueries.m08CorruptQuarantine _),
    "s01_ann_topk" -> (SimilarityQueries.s01AnnTopK _),
    "s02_embed_neardup" -> (SimilarityQueries.s02EmbedNearDup _),
    "s03_ann_lsh" -> (SimilarityQueries.s03AnnLsh _),
    "s04_ann_ivf" -> (SimilarityQueries.s04AnnIvf _),
    "s05_quantize" -> (SimilarityQueries.s05Quantize _),
    "s06_kmeans" -> (SimilarityQueries.s06KMeans _),
    "s07_pq_encode" -> (SimilarityQueries.s07PqEncode _),
    "s08_ann_recall" -> (SimilarityQueries.s08AnnRecall _),
    "b01_bm25" -> (TextQueries.b01Bm25 _),
    "t11_merge_pairs" -> (TextQueries.t11MergePairs _),
    "x03_shuffle_shards" -> (TextQueries.x03ShuffleShards _),
    "q21_bloom_join" -> (RelationalQueries.q21BloomJoin _),
    "q22_pivot" -> (RelationalQueries.q22Pivot _),
    "q23_latest_per_key" -> (RelationalQueries.q23LatestPerKey _),
    "a02_key_skew" -> (RelationalQueries.a02KeySkew _),
    "a03_table_stats" -> (RelationalQueries.a03TableStats _),
    "d09_simhash_pairs" -> (TextQueries.d09SimhashPairs _),
    "w03_trailing_window" -> (RelationalQueries.w03TrailingWindow _),
    "q24_cube" -> (RelationalQueries.q24Cube _),
    "s09_ann_multiprobe" -> (SimilarityQueries.s09AnnMultiprobe _),
    "q25_sliding_windows" -> (RelationalQueries.q25SlidingWindows _),
    "q26_correlated_subquery" -> (RelationalQueries.q26CorrelatedSubquery _),
    "w04_window_zoo" -> (RelationalQueries.w04WindowZoo _),
    "w05_scd2_dim" -> (RelationalQueries.w05Scd2Join _),
    "a04_histogram" -> (RelationalQueries.a04Histogram _),
    "g01_pagerank" -> (TextQueries.g01PageRank _),
    "w06_gap_fill" -> (RelationalQueries.w06GapFill _),
    "t12_term_redact" -> (TextQueries.t12TermRedact _),
    "d11_dup_spans" -> (TextQueries.d11DupSpans _),
    "d12_span_cut" -> (TextQueries.d12SpanCut _),
    "t13_rare_bigrams" -> (TextQueries.t13RareBigrams _),
    "s10_range_search" -> (SimilarityQueries.s10RangeSearch _),
    "s11_ivfpq_adc" -> (SimilarityQueries.s11IvfPqAdc _),
    "t14_split_assign" -> (TextQueries.t14SplitAssign _),
    "t15_zipf_histogram" -> (TextQueries.t15ZipfHistogram _),
    "d14_source_quota" -> (TextQueries.d14SourceQuota _),
    "w07_retention" -> (RelationalQueries.w07Retention _),
    "w08_funnel" -> (RelationalQueries.w08Funnel _),
    "i03_active_hours" -> (RelationalQueries.i03ActiveHours _),
    "q28_grouping_sets" -> (RelationalQueries.q28GroupingSets _),
    "b02_phrase_search" -> (TextQueries.b02PhraseSearch _),
    "b03_proximity_search" -> (TextQueries.b03ProximitySearch _),
    "g02_triangles" -> (TextQueries.g02Triangles _),
    "a05_exact_quantiles" -> (RelationalQueries.a05ExactQuantiles _),
    "a06_heavy_hitters" -> (TextQueries.a06HeavyHitters _),
    "d13_semantic_dedup" -> (SimilarityQueries.d13SemanticDedup _),
    "ts01_series_knn" -> (TimeSeriesQueries.ts01SeriesKnn _),
    "ts02_paa_candidates" -> (TimeSeriesQueries.ts02PaaCandidates _),
    "ts03_motif" -> (TimeSeriesQueries.ts03Motif _),
    "ts04_seasonality" -> (TimeSeriesQueries.ts04Seasonality _),
    "p02_semantic_curation" -> (SimilarityQueries.p02SemanticCuration _),
    "x04_curriculum" -> (TextQueries.x04Curriculum _),
    "ts05_change_point" -> (TimeSeriesQueries.ts05ChangePoint _),
    "ts06_lead_lag" -> (TimeSeriesQueries.ts06LeadLag _),
    "x05_mixture_sample" -> (TextQueries.x05MixtureSample _),
    "p04_dataset_card" -> (TextQueries.p04DatasetCard _),
    "s12_triplet_mining" -> (SimilarityQueries.s12TripletMining _),
    "w09_anomaly" -> (RelationalQueries.w09Anomaly _),
    "w10_sliding_distinct" -> (RelationalQueries.w10SlidingDistinct _),
    "t16_dsir_weights" -> (TextQueries.t16DsirWeights _),
    "x08_pareto_skyline" -> (TextQueries.x08ParetoSkyline _),
    "g03_kcore" -> (TextQueries.g03KCore _),
    "g04_label_prop" -> (TextQueries.g04LabelProp _),
    "ts09_ewma_smooth" -> (TimeSeriesQueries.ts09EwmaSmooth _),
    "x09_eval_apportion" -> (TextQueries.x09EvalApportion _),
    "m09_voice_activity" -> (MultimodalQueries.m09VoiceActivity _),
    "w11_attribution" -> (RelationalQueries.w11Attribution _),
    "d15_containment" -> (TextQueries.d15Containment _),
    "ts08_ohlc_bars" -> (TimeSeriesQueries.ts08OhlcBars _),
    "x07_split_leakage" -> (TextQueries.x07SplitLeakage _),
    "ts07_downsample" -> (TimeSeriesQueries.ts07Downsample _),
    "s13_mmr_rerank" -> (SimilarityQueries.s13MmrRerank _),
  )

  // DuckDB-dialect fragments shared with the text/similarity oracles.
  private val dNorm = TextQueries.NormSqlDuck
  private val dToks = TextQueries.ToksSqlDuck
  private def dStop(xs: Seq[String]) =
    s"len(list_filter(toks, x -> list_contains([${TextQueries.sqlList(xs)}], x)))"
  private val dNrmCte =
    """nrm AS (SELECT vec_id, embedding::DOUBLE[] AS v,
      |  sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS nrm FROM embeddings)""".stripMargin

  def oracleSql: Map[String, String] = Map(
    "q01_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        | CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        | CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
        | CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS sum_disc_price,
        | CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) * (1.0 + l_tax) AS DECIMAL(18,6))) AS DOUBLE) AS sum_charge,
        | COUNT(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        |GROUP BY l_returnflag, l_linestatus""".stripMargin,
    "q02_revenue_filter" ->
      """SELECT CAST(SUM(CAST(l_extendedprice * l_discount AS DECIMAL(18,6))) AS DOUBLE) AS revenue
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1995-01-01 00:00:00'
        |  AND l_shipdate < TIMESTAMP '1996-01-01 00:00:00'
        |  AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24""".stripMargin,
    "q03_top_customers" ->
      """SELECT c_custkey, c_name, CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
        |       COUNT(*) AS order_cnt
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY c_custkey, c_name
        |ORDER BY revenue DESC, c_custkey LIMIT 10""".stripMargin,
    "q04_region_revenue" ->
      """SELECT n_name, CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |WHERE r_name = 'ASIA'
        |GROUP BY n_name""".stripMargin,
    "q19_salted_join" ->
      """SELECT o_orderpriority,
        |       CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS revenue,
        |       COUNT(*) AS n_items
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY o_orderpriority""".stripMargin,
    "w05_scd2_dim" ->
      """WITH dim AS (SELECT o_custkey AS d_custkey, o_orderkey AS d_orderkey,
        |               o_orderdate AS valid_from, o_orderpriority AS prio,
        |               lead(o_orderdate) OVER (PARTITION BY o_custkey
        |                 ORDER BY o_orderdate, o_orderkey) AS valid_to
        |             FROM orders),
        |f AS (SELECT o.o_custkey, l.l_shipdate, l.l_extendedprice, l.l_discount
        |      FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey)
        |SELECT d.prio AS prio_at_ship,
        |       CAST(SUM(CAST(f.l_extendedprice * (1.0 - f.l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS revenue,
        |       COUNT(*) AS n_items
        |FROM f JOIN dim d ON f.o_custkey = d.d_custkey
        |  AND f.l_shipdate >= d.valid_from
        |  AND (d.valid_to IS NULL OR f.l_shipdate < d.valid_to)
        |GROUP BY 1""".stripMargin,
    "q27_partial_salt" ->
      """SELECT o_orderpriority,
        |       CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS revenue,
        |       COUNT(*) AS n_items
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY o_orderpriority""".stripMargin,
    "q20_topk_operator" ->
      """WITH r AS (SELECT o_orderpriority, o_orderkey,
        |             CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DOUBLE) AS total,
        |             row_number() OVER (PARTITION BY o_orderpriority
        |               ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
        |           FROM orders)
        |SELECT o_orderpriority, o_orderkey, total FROM r WHERE rn <= 3""".stripMargin,
    "q05_running_total" ->
      """SELECT o_custkey, o_orderkey,
        | CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
        |   OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_total
        |FROM orders WHERE o_custkey <= 200""".stripMargin,
    "q06_top_orders" ->
      """SELECT o_orderkey, o_totalprice AS totalprice, o_orderpriority
        |FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 20""".stripMargin,
    "q07_key_sets" ->
      """SELECT
        | (SELECT COUNT(*) FROM (SELECT c_nationkey AS nk FROM customer UNION
        |                        SELECT s_nationkey FROM supplier) u) AS union_count,
        | (SELECT COUNT(*) FROM (SELECT DISTINCT c_nationkey FROM customer INTERSECT
        |                        SELECT DISTINCT s_nationkey FROM supplier) i) AS intersect_count,
        | (SELECT COUNT(*) FROM (SELECT DISTINCT c_nationkey FROM customer EXCEPT
        |                        SELECT DISTINCT s_nationkey FROM supplier) e) AS except_count""".stripMargin,
    // exact columns reproduced; flags are the CLAIM the sketches must meet —
    // a drifting sketch flips a flag on the Spark side and fails the hash
    "a01_sketches" ->
      """SELECT event_type, COUNT(DISTINCT user_id) AS exact_users, COUNT(*) AS n,
        |       CAST(1 AS BIGINT) AS users_in_bounds,
        |       CAST(1 AS BIGINT) AS p50_rank_ok,
        |       CAST(1 AS BIGINT) AS p95_rank_ok
        |FROM events GROUP BY event_type""".stripMargin,
    "q08_event_types" ->
      """SELECT event_type, COUNT(*) AS n_events, COUNT(DISTINCT user_id) AS n_users,
        |       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
        |FROM events GROUP BY event_type HAVING COUNT(*) > 10""".stripMargin,
    "q09_object_keys" ->
      """SELECT o_orderkey,
        | lpad(CAST(o_orderkey AS VARCHAR), 20, '0') AS padded_offset,
        | concat_ws('/', 'topic', CAST(o_custkey AS VARCHAR),
        |           lpad(CAST(o_orderkey AS VARCHAR), 20, '0')) AS object_key,
        | md5(o_orderpriority) AS priority_md5,
        | base64(encode(o_orderstatus)) AS status_b64,
        | substring(o_orderpriority, 1, 1) AS priority_prefix
        |FROM orders WHERE o_orderkey <= 100""".stripMargin,
    "q10_hourly_events" ->
      """SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour, event_type, COUNT(*) AS n,
        |       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS hourly_value
        |FROM events GROUP BY date_trunc('hour', ts), event_type""".stripMargin,
    "q11_event_regroup" ->
      """SELECT user_id, COUNT(*) AS n, strftime(MIN(ts), '%Y-%m-%d %H:%M:%S') AS first_ts,
        |       strftime(MAX(ts), '%Y-%m-%d %H:%M:%S') AS last_ts,
        |       string_agg(event_type, ',' ORDER BY ts, event_id) AS trace
        |FROM events WHERE user_id <= 500 GROUP BY user_id""".stripMargin,
    "q15_semi_anti" ->
      """SELECT 'with_orders' AS segment, COUNT(*) AS n,
        |       CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS bal
        |FROM customer WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |UNION ALL
        |SELECT 'without_orders', COUNT(*),
        |       CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE)
        |FROM customer WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)""".stripMargin,
    "q14_salted_agg" ->
      """SELECT event_type, COUNT(*) AS n_events,
        |       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
        |FROM events GROUP BY event_type""".stripMargin,
    "q16_rollup" ->
      """SELECT r_name, n_name,
        | CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS revenue,
        | COUNT(*) AS n_items
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY ROLLUP(r_name, n_name)""".stripMargin,
    "q24_cube" ->
      """SELECT r_name, n_name,
        | CAST(GROUPING(r_name) * 2 + GROUPING(n_name) AS BIGINT) AS gid,
        | CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS revenue,
        | COUNT(*) AS n_items
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY CUBE(r_name, n_name)""".stripMargin,
    "w03_trailing_window" ->
      """WITH e AS (SELECT event_id, user_id, epoch_us(ts) AS us, value FROM events)
        |SELECT event_id, user_id, us,
        |  COUNT(*) OVER w AS n_1h,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER w AS DOUBLE) AS v_1h
        |FROM e
        |WINDOW w AS (PARTITION BY user_id ORDER BY us
        |             RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)""".stripMargin,
    // w04: same total order on both sides makes every ranking/navigation
    // function deterministic; percent_rank/cume_dist are integer-ratio
    // doubles (identical operands -> identical rounding)
    "w04_window_zoo" ->
      """SELECT o_orderpriority, o_orderkey,
        |  CAST(row_number() OVER w AS BIGINT) AS rn,
        |  CAST(ntile(4) OVER w AS BIGINT) AS quartile,
        |  lag(o_orderkey, 1) OVER w AS prev_key,
        |  lead(o_orderkey, 1) OVER w AS next_key,
        |  first_value(o_orderkey) OVER w AS top_key,
        |  percent_rank() OVER w AS pr,
        |  cume_dist() OVER w AS cd
        |FROM orders WHERE o_custkey <= 100
        |WINDOW w AS (PARTITION BY o_orderpriority
        |             ORDER BY o_totalprice DESC, o_orderkey)""".stripMargin,
    // a04: integer-cents binning — bin and bounds are pure integer
    // arithmetic, no double division to disagree about
    "a04_histogram" ->
      s"""WITH c AS (SELECT CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS c FROM orders),
         |m AS (SELECT MIN(c) AS mn, MAX(c) AS mx FROM c),
         |b AS (SELECT (c.c - m.mn) * ${RelationalQueries.HistBins} // (m.mx - m.mn + 1) AS bin, m.mn, m.mx
         |      FROM c, m)
         |SELECT bin, COUNT(*) AS n,
         |       MIN(mn) + (bin * (MIN(mx) - MIN(mn) + 1)) // ${RelationalQueries.HistBins} AS lo_cents,
         |       MIN(mn) + ((bin + 1) * (MIN(mx) - MIN(mn) + 1)) // ${RelationalQueries.HistBins} - 1 AS hi_cents
         |FROM b GROUP BY bin""".stripMargin,
    // q26: the identical correlated-subquery SQL (threshold rearranged to
    // exact-decimal multiplication on both sides)
    "q26_correlated_subquery" ->
      """SELECT l_partkey, COUNT(*) AS n_small,
        |       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS small_revenue
        |FROM lineitem l1
        |WHERE CAST(l_quantity AS DECIMAL(18,2)) * 5 *
        |      (SELECT COUNT(*) FROM lineitem l2 WHERE l2.l_partkey = l1.l_partkey)
        |      < (SELECT SUM(CAST(l_quantity AS DECIMAL(18,2))) FROM lineitem l3
        |         WHERE l3.l_partkey = l1.l_partkey)
        |GROUP BY l_partkey""".stripMargin,
    // q25: each event belongs to width/slide = 4 epoch-aligned windows —
    // starts at slide * (us//slide - k), k in 0..3 (Spark's window() uses
    // the same 1970-origin alignment)
    "q25_sliding_windows" ->
      """WITH e AS (SELECT epoch_us(ts) AS us, event_type, value FROM events),
        |w AS (SELECT event_type, value, 900000000 * ((us // 900000000) - k.k) AS wstart
        |      FROM e, (SELECT unnest([0, 1, 2, 3]) AS k) k)
        |SELECT wstart, event_type, COUNT(*) AS n,
        |       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS win_value
        |FROM w GROUP BY wstart, event_type""".stripMargin,
    "q17_json_props" ->
      """SELECT event_type, COUNT(*) AS n,
        | CAST(SUM(CAST(json_extract_string(props, 'k') AS BIGINT)) AS BIGINT) AS sum_k,
        | MIN(CAST(json_extract_string(props, 'k') AS BIGINT)) AS min_k,
        | MAX(CAST(json_extract_string(props, 'k') AS BIGINT)) AS max_k
        |FROM events GROUP BY event_type""".stripMargin,
    "w01_asof_funnel" ->
      """WITH w AS (SELECT event_id, user_id, ts, event_type,
        |  MAX(CASE WHEN event_type = 'view' THEN ts END) OVER
        |    (PARTITION BY user_id ORDER BY ts, event_id
        |     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS last_view_ts,
        |  COUNT(CASE WHEN event_type = 'view' THEN 1 END) OVER
        |    (PARTITION BY user_id ORDER BY ts, event_id
        |     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS views_before
        | FROM events)
        |SELECT event_id, user_id, strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts,
        |       strftime(last_view_ts, '%Y-%m-%d %H:%M:%S') AS last_view_ts, views_before
        |FROM w WHERE event_type = 'purchase'""".stripMargin,
    "w02_sessions" ->
      """WITH e AS (SELECT user_id, ts, event_id, value, epoch_us(ts) AS us FROM events),
        |l AS (SELECT *, lag(us) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_us FROM e),
        |f AS (SELECT *, CASE WHEN prev_us IS NULL OR us - prev_us > 1800000000
        |                     THEN 1 ELSE 0 END AS new_sess FROM l),
        |s AS (SELECT *, CAST(SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS sess FROM f)
        |SELECT user_id, sess, COUNT(*) AS n_events,
        |       strftime(MIN(ts), '%Y-%m-%d %H:%M:%S') AS first_ts,
        |       strftime(MAX(ts), '%Y-%m-%d %H:%M:%S') AS last_ts,
        |       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sess_value
        |FROM s GROUP BY user_id, sess""".stripMargin,
    "i01_interval_join" ->
      """SELECT e.event_id, e.user_id, strftime(e.ts, '%Y-%m-%d %H:%M:%S') AS ts,
        |       COUNT(a.event_id) AS n_prior
        |FROM events e LEFT JOIN events a
        |  ON a.user_id = e.user_id
        | AND epoch_us(a.ts) >= epoch_us(e.ts) - 300000000
        | AND epoch_us(a.ts) < epoch_us(e.ts)
        |WHERE e.event_type = 'error'
        |GROUP BY e.event_id, e.user_id, e.ts""".stripMargin,
    "i02_band_join_auto" ->
      """SELECT e.event_id, e.user_id, strftime(e.ts, '%Y-%m-%d %H:%M:%S') AS ts,
        |       COUNT(*) AS n_window
        |FROM events e JOIN events a
        |  ON epoch_us(a.ts) >= epoch_us(e.ts) - 3600000000
        | AND epoch_us(a.ts) < epoch_us(e.ts)
        |WHERE e.event_type = 'error'
        |GROUP BY e.event_id, e.user_id, e.ts""".stripMargin,
    // i05: all five decomposable aggregate kinds over the same naive band
    // join; cents via DECIMAL(18,2) so sums and the avg division are
    // exact identical doubles
    "i05_band_stats" ->
      """WITH a AS (SELECT epoch_us(ts) AS us,
        |             CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
        |           FROM events),
        |e AS (SELECT event_id, epoch_us(ts) AS err_us FROM events
        |      WHERE event_type = 'error')
        |SELECT e.event_id, CAST(COUNT(*) AS BIGINT) AS n_window,
        |       CAST(SUM(a.cents) AS BIGINT) AS sum_cents,
        |       CAST(MIN(a.cents) AS BIGINT) AS min_cents,
        |       CAST(MAX(a.cents) AS BIGINT) AS max_cents,
        |       CAST(SUM(a.cents) AS DOUBLE) / COUNT(*) AS avg_cents
        |FROM e JOIN a ON a.us >= e.err_us - 3600000000 AND a.us < e.err_us
        |GROUP BY e.event_id""".stripMargin,
    // i04: IDENTICAL naive SQL — the BandAggPushdown rewrite is
    // semantics-preserving, so the oracle for the decomposed plan is the
    // plain pair-enumerating band join
    "i04_band_agg_pushdown" ->
      """SELECT e.event_id, e.user_id, strftime(e.ts, '%Y-%m-%d %H:%M:%S') AS ts,
        |       COUNT(*) AS n_window
        |FROM events e JOIN events a
        |  ON epoch_us(a.ts) >= epoch_us(e.ts) - 3600000000
        | AND epoch_us(a.ts) < epoch_us(e.ts)
        |WHERE e.event_type = 'error'
        |GROUP BY e.event_id, e.user_id, e.ts""".stripMargin,
    "x01_token_windows" ->
      s"""WITH t AS (SELECT doc_id, $dToks AS toks FROM documents),
         |e AS (SELECT doc_id, toks,
         |        unnest(generate_series(0, greatest(CAST(floor((len(toks) - 1) / ${TextQueries.WindowTokens - TextQueries.WindowOverlap}) AS INT), 0))) AS window_id
         |      FROM t),
         |w AS (SELECT doc_id, window_id,
         |        list_slice(toks, window_id * ${TextQueries.WindowTokens - TextQueries.WindowOverlap} + 1,
         |                   window_id * ${TextQueries.WindowTokens - TextQueries.WindowOverlap} + ${TextQueries.WindowTokens}) AS w
         |      FROM e)
         |SELECT doc_id, CAST(window_id AS BIGINT) AS window_id,
         |       coalesce(array_to_string(w, ' '), '') AS chunk_text, CAST(len(w) AS BIGINT) AS n_tokens
         |FROM w""".stripMargin,
    "x02_pack_bins" ->
      s"""WITH t AS (SELECT doc_id, lang, CAST(len($dToks) AS BIGINT) AS n_tokens FROM documents),
         |w AS (SELECT doc_id, lang, n_tokens,
         |        coalesce(SUM(n_tokens) OVER (PARTITION BY lang ORDER BY doc_id
         |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS prev_tokens
         |      FROM t)
         |SELECT doc_id, lang, n_tokens,
         |       CAST(floor(prev_tokens / ${TextQueries.PackBudget}.0) AS BIGINT) AS bin_id
         |FROM w""".stripMargin,
    "b01_bm25" -> {
      val ts = TextQueries.Bm25Terms
      val tfDefs = ts.zipWithIndex.map { case (t, i) =>
        s"CAST(len(list_filter(toks, x -> x = '$t')) AS BIGINT) AS tfi$i"
      }.mkString(", ")
      val dfDefs = ts.indices.map(i =>
        s"SUM(CASE WHEN tfi$i > 0 THEN 1 ELSE 0 END) AS dfi$i").mkString(", ")
      val dblDefs = ts.indices.flatMap(i => Seq(
        s"CAST(tfi$i AS DOUBLE) AS tf$i", s"CAST(dfi$i AS DOUBLE) AS df$i")).mkString(", ")
      val outTf = ts.zipWithIndex.map { case (t, i) =>
        s"CAST(tf$i AS BIGINT) AS tf_$t"
      }.mkString(", ")
      // the scoring fragment is the SAME string the Spark plan runs —
      // bm25ScoreSql is engine-agnostic, fully parenthesized, ln-free
      s"""WITH tk AS (SELECT doc_id, $dToks AS toks FROM documents),
         |tf AS (SELECT doc_id, CAST(len(toks) AS BIGINT) AS dli, $tfDefs FROM tk),
         |st AS (SELECT COUNT(*) AS ni, SUM(dli) AS sdl, $dfDefs FROM tf),
         |db AS (SELECT doc_id, CAST(dli AS DOUBLE) AS dl, CAST(ni AS DOUBLE) AS n_docs,
         |         CAST(sdl AS DOUBLE) / CAST(ni AS DOUBLE) AS avgdl, $dblDefs
         |       FROM tf CROSS JOIN st)
         |SELECT doc_id, ${TextQueries.bm25ScoreSql} AS bm25, $outTf FROM db""".stripMargin
    },
    "t11_merge_pairs" ->
      s"""WITH tk AS (SELECT $dToks AS toks FROM documents),
         |p AS (SELECT unnest(list_transform(range(1, len(toks)),
         |                    i -> toks[i] || ' ' || toks[i + 1])) AS pair
         |      FROM tk WHERE len(toks) >= 2),
         |c AS (SELECT pair, COUNT(*) AS n FROM p GROUP BY 1)
         |SELECT pair, n, CAST(row_number() OVER (ORDER BY n DESC, pair) AS BIGINT) AS rnk
         |FROM c ORDER BY n DESC, pair LIMIT ${TextQueries.MergePairK}""".stripMargin,
    "x03_shuffle_shards" ->
      s"""WITH r AS (SELECT doc_id, md5(CAST(doc_id AS VARCHAR)) AS rk FROM documents),
         |s AS (SELECT doc_id, rk,
         |        CAST((instr('0123456789abcdef', substr(rk, 1, 1)) - 1) % ${TextQueries.ShuffleShards} AS BIGINT) AS shard
         |      FROM r)
         |SELECT doc_id, shard,
         |       CAST(row_number() OVER (PARTITION BY shard ORDER BY rk, doc_id) AS BIGINT) AS pos
         |FROM s""".stripMargin,
    "a03_table_stats" ->
      """SELECT COUNT(*) AS n_rows,
        |       COUNT(DISTINCT l_orderkey) AS d_orderkeys,
        |       COUNT(DISTINCT l_partkey) AS d_parts,
        |       COUNT(DISTINCT l_suppkey) AS d_supps,
        |       CAST(SUM(CASE WHEN l_discount IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS null_discount,
        |       strftime(MIN(l_shipdate), '%Y-%m-%d') AS min_ship,
        |       strftime(MAX(l_shipdate), '%Y-%m-%d') AS max_ship,
        |       MIN(l_extendedprice) AS min_price,
        |       MAX(l_extendedprice) AS max_price
        |FROM lineitem""".stripMargin,
    "q23_latest_per_key" ->
      """WITH r AS (SELECT user_id, ts, event_id, event_type,
        |             row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rnk
        |           FROM events)
        |SELECT user_id, strftime(ts, '%Y-%m-%d %H:%M:%S') AS last_ts,
        |       event_id AS last_event_id, event_type AS last_event_type
        |FROM r WHERE rnk = 1""".stripMargin,
    "q22_pivot" -> {
      val cols = RelationalQueries.PivotEventTypes.map(t =>
        s"CAST(SUM(CASE WHEN event_type = '$t' THEN 1 ELSE 0 END) AS BIGINT) AS n_$t").mkString(", ")
      s"""SELECT CAST(month(ts) AS BIGINT) AS mth, $cols
         |FROM events GROUP BY 1""".stripMargin
    },
    "a02_key_skew" ->
      s"""WITH c AS (SELECT l_orderkey, COUNT(*) AS cnt FROM lineitem GROUP BY 1),
         |t AS (SELECT CAST(SUM(cnt) AS BIGINT) AS total, COUNT(*) AS n_keys FROM c)
         |SELECT l_orderkey, cnt, CAST(cnt AS DOUBLE) / CAST(total AS DOUBLE) AS share, n_keys
         |FROM c CROSS JOIN t
         |ORDER BY cnt DESC, l_orderkey LIMIT ${RelationalQueries.SkewTopN}""".stripMargin,
    "q21_bloom_join" ->
      """SELECT CAST(month(o_orderdate) AS BIGINT) AS mth,
        |       CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS revenue,
        |       COUNT(*) AS n_items
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |WHERE o_orderpriority = '1-URGENT'
        |GROUP BY 1""".stripMargin,
    "t06_stratified_sample" ->
      s"""WITH r AS (SELECT doc_id, lang,
         |             row_number() OVER (PARTITION BY lang
         |               ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rnk
         |           FROM documents)
         |SELECT doc_id, lang, CAST(rnk AS BIGINT) AS rnk
         |FROM r WHERE rnk <= ${TextQueries.SampleK}""".stripMargin,
    "t07_vocab_mask" ->
      s"""WITH tk AS (SELECT doc_id, lang, $dToks AS toks FROM documents),
         |t AS (SELECT doc_id, lang, unnest(toks) AS tok,
         |        generate_subscripts(toks, 1) AS pos FROM tk),
         |ld AS (SELECT lang, count(*) AS n_docs FROM documents GROUP BY lang),
         |d AS (SELECT lang, tok, count(DISTINCT doc_id) AS df FROM t GROUP BY 1, 2),
         |m AS (SELECT t.doc_id, t.pos,
         |        CASE WHEN d.df < ${TextQueries.MaskDfRatio} * ld.n_docs THEN '<unk>' ELSE t.tok END AS masked,
         |        CASE WHEN d.df < ${TextQueries.MaskDfRatio} * ld.n_docs THEN 1 ELSE 0 END AS is_m
         |      FROM t JOIN d ON t.lang = d.lang AND t.tok = d.tok
         |             JOIN ld ON t.lang = ld.lang)
         |SELECT doc_id, string_agg(masked, ' ' ORDER BY pos) AS masked_text,
         |       CAST(SUM(is_m) AS BIGINT) AS n_masked
         |FROM m GROUP BY doc_id""".stripMargin,
    "q12_chunk_index" ->
      """SELECT doc_id, n_chars,
        | CASE WHEN n_chars = 0 THEN 0 ELSE (n_chars + 63) // 64 END AS chunk_count,
        | CASE WHEN n_chars = 0 THEN 0
        |      ELSE n_chars - ((n_chars + 63) // 64 - 1) * 64 END AS final_chunk_size,
        | CASE WHEN n_chars = 0 THEN 0
        |      ELSE ((n_chars + 63) // 64 - 1) * 92
        |           + (n_chars - ((n_chars + 63) // 64 - 1) * 64) + 28 END AS transformed_size
        |FROM documents""".stripMargin,
    "q13_chunks_for_range" ->
      """WITH docs AS (
        |  SELECT doc_id, n_chars,
        |         CASE WHEN n_chars = 0 THEN 0 ELSE (n_chars + 63) // 64 END AS chunk_count
        |  FROM documents),
        |exploded AS (
        |  SELECT doc_id, n_chars, chunk_count,
        |         unnest(generate_series(0, chunk_count - 1)) AS chunk_id
        |  FROM docs WHERE chunk_count > 0)
        |SELECT doc_id, chunk_id, chunk_id * 64 AS orig_pos,
        |       CASE WHEN chunk_id = chunk_count - 1
        |            THEN n_chars - (chunk_count - 1) * 64 ELSE 64 END AS orig_size,
        |       chunk_id * 92 AS trans_pos
        |FROM exploded
        |WHERE chunk_id * 64 <= 300
        |  AND chunk_id * 64 + (CASE WHEN chunk_id = chunk_count - 1
        |                         THEN n_chars - (chunk_count - 1) * 64 ELSE 64 END) > 100""".stripMargin,
    "r01_format_route" ->
      """WITH k AS (SELECT doc_id AS kid, 'kafka' AS kfmt, CAST(n_chars AS BIGINT) AS kn
        |           FROM documents WHERE doc_id % 3 != 0),
        |r AS (SELECT doc_id AS rid, 'records' AS rfmt, CAST(n_chars AS BIGINT) AS rn
        |      FROM documents WHERE doc_id % 2 = 0)
        |SELECT coalesce(kid, rid) AS segment_id,
        |       coalesce(kfmt, rfmt) AS route,
        |       coalesce(kn, rn) AS n_chars
        |FROM k FULL OUTER JOIN r ON kid = rid""".stripMargin,
    "r02_iceberg_stats" ->
      s"""SELECT doc_id % ${SegmentQueries.R02Buckets} AS bucket,
         |       COUNT(*) AS n_rows, MIN(doc_id) AS min_off, MAX(doc_id) AS max_off
         |FROM documents GROUP BY 1""".stripMargin,
    "r03_time_range_scan" ->
      """SELECT CAST(doc_id AS BIGINT) AS doc_id,
        |       CAST(1700000000000 + doc_id AS BIGINT) AS ts,
        |       CAST(length(text) AS BIGINT) AS n_chars
        |FROM documents
        |WHERE doc_id >= 100 AND doc_id <= 1100""".stripMargin,
    "q18_exact_quantiles" ->
      """WITH r AS (SELECT event_type, value,
        |    row_number() OVER (PARTITION BY event_type ORDER BY value, event_id) AS r,
        |    COUNT(*) OVER (PARTITION BY event_type) AS n
        |  FROM events),
        |f AS (SELECT event_type, value, n,
        |    r = CAST(ceil(0.5 * n) AS BIGINT) AS is_p50,
        |    r = CAST(ceil(0.95 * n) AS BIGINT) AS is_p95
        |  FROM r WHERE r = CAST(ceil(0.5 * n) AS BIGINT) OR r = CAST(ceil(0.95 * n) AS BIGINT))
        |SELECT event_type,
        |  MAX(CASE WHEN is_p50 THEN value END) AS p50_value,
        |  MAX(CASE WHEN is_p95 THEN value END) AS p95_value,
        |  MAX(n) AS n
        |FROM f GROUP BY event_type""".stripMargin,
    "m01_media_features" ->
      """SELECT doc_id, CAST(length(text) AS BIGINT) AS n_bytes,
        | CAST(CASE WHEN length(text) = 0 THEN 0 ELSE (length(text) + 15) // 16 END AS BIGINT) AS n_frames,
        | CASE WHEN length(text) = 0 THEN NULL ELSE md5(substring(text, 1, 16)) END AS first_frame_md5
        |FROM documents""".stripMargin,
    "m02_frame_sample" ->
      s"""WITH f AS (SELECT doc_id, text,
         |             unnest(generate_series(0, CAST(floor((length(text) - 1) / 16) AS INT))) AS frame_idx
         |           FROM documents WHERE length(text) > 0),
         |s AS (SELECT doc_id, frame_idx, substring(text, frame_idx * 16 + 1, 16) AS frame
         |      FROM f WHERE frame_idx % ${MultimodalQueries.SampleEvery} = 0)
         |SELECT doc_id, CAST(frame_idx AS BIGINT) AS frame_idx,
         |       md5(frame) AS frame_md5, CAST(length(frame) AS BIGINT) AS frame_len
         |FROM s""".stripMargin,
    "m03_media_codec" -> {
      import MultimodalQueries.{M03Width => W, M03Height => H, M03Samples => N}
      s"""WITH px AS (SELECT doc_id, unnest(generate_series(0, ${W - 1})) AS x FROM documents),
         |pxy AS (SELECT doc_id, x, unnest(generate_series(0, ${H - 1})) AS y FROM px),
         |img AS (SELECT doc_id,
         |    CAST(SUM((doc_id*7 + x*3 + y*5) % 256) AS BIGINT) AS r_sum,
         |    CAST(SUM((doc_id*11 + x*13 + y) % 256) AS BIGINT) AS g_sum,
         |    CAST(SUM((x*y + doc_id) % 256) AS BIGINT) AS b_sum
         |  FROM pxy GROUP BY doc_id),
         |smp AS (SELECT doc_id, unnest(generate_series(0, ${N - 1})) AS t FROM documents),
         |aud AS (SELECT doc_id, COUNT(*) AS pcm_n,
         |    CAST(SUM(s) AS BIGINT) AS pcm_sum, CAST(SUM(abs(s)) AS BIGINT) AS pcm_abs
         |  FROM (SELECT doc_id, ((doc_id*31 + t*17) % 4001) - 2000 AS s FROM smp)
         |  GROUP BY doc_id)
         |SELECT i.doc_id, CAST($W AS BIGINT) AS img_w, CAST($H AS BIGINT) AS img_h,
         |       r_sum, g_sum, b_sum, pcm_n, pcm_sum, pcm_abs
         |FROM img i JOIN aud a ON i.doc_id = a.doc_id""".stripMargin
    },
    // m08: quarantine verdicts in closed form — corruption injected iff
    // doc_id % 7 == 3 (two guaranteed-undecodable classes at %14 ∈ {3,10});
    // healthy rows carry the m03 red-channel sum, quarantined rows zeros.
    "m08_corrupt_quarantine" -> {
      import MultimodalQueries.{M03Width => W, M03Height => H}
      s"""WITH px AS (SELECT doc_id, unnest(generate_series(0, ${W - 1})) AS x FROM documents),
         |pxy AS (SELECT doc_id, x, unnest(generate_series(0, ${H - 1})) AS y FROM px),
         |img AS (SELECT doc_id,
         |    CAST(SUM((doc_id*7 + x*3 + y*5) % 256) AS BIGINT) AS r_sum
         |  FROM pxy GROUP BY doc_id)
         |SELECT doc_id,
         |       CAST(CASE WHEN doc_id % 7 = 3 THEN 0 ELSE 1 END AS BIGINT) AS ok,
         |       CASE WHEN doc_id % 7 = 3 THEN 'undecodable' ELSE '' END AS issue,
         |       CAST(CASE WHEN doc_id % 7 = 3 THEN 0 ELSE $W END AS BIGINT) AS img_w,
         |       CAST(CASE WHEN doc_id % 7 = 3 THEN 0 ELSE $H END AS BIGINT) AS img_h,
         |       CAST(CASE WHEN doc_id % 7 = 3 THEN 0 ELSE r_sum END AS BIGINT) AS r_sum
         |FROM img""".stripMargin
    },
    // m04: every output pixel of the 2x2 box-filter resize recomputed from
    // the closed form — floor-average of the four covered input pixels per
    // channel; px_fp verifies each resized byte (comma-joined unsigned
    // values in (y, x, channel) order, matching the engine's layout).
    "m04_image_resize" -> {
      import MultimodalQueries.{M03Width => W, M03Height => H}
      val (ow, oh) = (W / 2, H / 2)
      def ch(f: (String, String) => String): String =
        s"(${f("2*x", "2*y")} + ${f("2*x+1", "2*y")} + ${f("2*x", "2*y+1")} + ${f("2*x+1", "2*y+1")}) // 4"
      val r2 = ch((x, y) => s"(doc_id*7 + ($x)*3 + ($y)*5) % 256")
      val g2 = ch((x, y) => s"(doc_id*11 + ($x)*13 + ($y)) % 256")
      val b2 = ch((x, y) => s"(($x)*($y) + doc_id) % 256")
      s"""WITH px AS (SELECT doc_id, unnest(generate_series(0, ${ow - 1})) AS x FROM documents),
         |pxy AS (SELECT doc_id, x, unnest(generate_series(0, ${oh - 1})) AS y FROM px),
         |v AS (SELECT doc_id, x, y, $r2 AS r2, $g2 AS g2, $b2 AS b2 FROM pxy)
         |SELECT doc_id, CAST($ow AS BIGINT) AS out_w, CAST($oh AS BIGINT) AS out_h,
         |       CAST(SUM(r2) AS BIGINT) AS r2_sum, CAST(SUM(g2) AS BIGINT) AS g2_sum,
         |       CAST(SUM(b2) AS BIGINT) AS b2_sum,
         |       md5(string_agg(CAST(r2 AS VARCHAR) || ',' || CAST(g2 AS VARCHAR) || ',' ||
         |                      CAST(b2 AS VARCHAR), ',' ORDER BY y, x)) AS px_fp
         |FROM v GROUP BY doc_id""".stripMargin
    },
    // m07 = dHash near-dup: the oracle recomputes the box-averaged cells
    // (m04's verified floor-average closed form), luminance gradient
    // signs → the 42-bit hash, then the exact Hamming pair relation —
    // collapsed to DISTINCT signatures (exact identity: every doc's own
    // signature is Hamming-0 from itself, so n_near = Σ counts of
    // signatures within T minus self, and rep = min doc_id over the near
    // signature set ∪ self = that set's min). Keeps the oracle O(D²)
    // pairs, D = distinct hashes, instead of O(n²) rows — tractable at
    // the 100× replica where n = 500k but D ≈ 220. The ENGINE gets the
    // same bits from real PNG decode + banded joins; agreement proves
    // codec + banding.
    "m07_phash_neardup" -> {
      import MultimodalQueries.{M03Width => W, M03Height => H, PhashHammingMax => T}
      val (ow, oh) = (W / 2, H / 2)
      def ch(f: (String, String) => String): String =
        s"(${f("2*x", "2*y")} + ${f("2*x+1", "2*y")} + ${f("2*x", "2*y+1")} + ${f("2*x+1", "2*y+1")}) // 4"
      val r2 = ch((x, y) => s"(doc_id*7 + ($x)*3 + ($y)*5) % 256")
      val g2 = ch((x, y) => s"(doc_id*11 + ($x)*13 + ($y)) % 256")
      val b2 = ch((x, y) => s"(($x)*($y) + doc_id) % 256")
      s"""WITH px AS (SELECT doc_id, unnest(generate_series(0, ${ow - 1})) AS x FROM documents),
         |pxy AS (SELECT doc_id, x, unnest(generate_series(0, ${oh - 1})) AS y FROM px),
         |v AS (SELECT doc_id, x, y, ($r2) + ($g2) + ($b2) AS gray FROM pxy),
         |bits AS (SELECT a.doc_id, a.x, a.y,
         |           CASE WHEN a.gray > b.gray THEN 1 ELSE 0 END AS bit
         |         FROM v a JOIN v b ON b.doc_id = a.doc_id AND b.y = a.y AND b.x = a.x + 1
         |         WHERE a.x < ${ow - 1}),
         |ph AS (SELECT doc_id,
         |         CAST(SUM(CAST(bit AS BIGINT) << (y * ${ow - 1} + x)) AS BIGINT) AS phash
         |       FROM bits GROUP BY doc_id),
         |phd AS (SELECT phash, COUNT(*) AS cnt, MIN(doc_id) AS min_id FROM ph GROUP BY phash),
         |near AS (SELECT a.phash, SUM(b.cnt) AS near_cnt, MIN(b.min_id) AS near_min
         |         FROM phd a JOIN phd b ON bit_count(xor(a.phash, b.phash)) <= $T
         |         GROUP BY a.phash)
         |SELECT s.doc_id, s.phash, CAST(n.near_cnt - 1 AS BIGINT) AS n_near,
         |       CAST(n.near_min AS BIGINT) AS rep
         |FROM ph s JOIN near n ON n.phash = s.phash""".stripMargin
    },
    // m05: every frame's features recomputed from the closed-form waveform
    // — block-local zero crossings (off > 0 mirrors the engine's n > 0
    // guard), integer energy, 512 samples per decoder block.
    // r9: the lag(s) window collapsed to the closed form s(t-1) inlined
    // per row — valid because t is dense 0..N-1 and s is a pure function
    // of (doc_id, t), so lag(s) ≡ ((doc_id*31+(t-1)*17)%4001)-2000 for
    // every row the off>0 guard admits; proven row-identical to the window
    // form in DuckDB at sf0.01/sf0.1 before the swap. The window form
    // sorts the N-per-doc sample relation (2.0B rows at 100x) and timed
    // out at /tmp/sf10; the closed form streams through a hash agg.
    "m05_audio_features" -> {
      import MultimodalQueries.{M03Samples => N}
      s"""WITH smp AS (SELECT doc_id, unnest(generate_series(0, ${N - 1})) AS t FROM documents),
         |v AS (SELECT doc_id, t, t // 512 AS frame_idx,
         |        ((doc_id*31 + t*17) % 4001) - 2000 AS s,
         |        ((doc_id*31 + (t-1)*17) % 4001) - 2000 AS ps,
         |        t % 512 AS off FROM smp)
         |SELECT doc_id, CAST(frame_idx AS BIGINT) AS frame_idx,
         |       CAST(COUNT(*) AS BIGINT) AS n_samples,
         |       CAST(SUM(s * s) AS BIGINT) AS energy,
         |       CAST(SUM(CASE WHEN off > 0 AND ((ps < 0 AND s > 0) OR (ps > 0 AND s < 0))
         |                     THEN 1 ELSE 0 END) AS BIGINT) AS zero_crossings
         |FROM v GROUP BY 1, 2""".stripMargin
    },
    // m06 = scene-cut detection: the oracle re-derives every pixel of the
    // closed-form frame sequence (scene index s = running count of the
    // boundary schedule), recomputes each frame-pair SAD and applies the
    // identical threshold rule. The ENGINE sees only real-PNG-decoded
    // bytes; agreement proves codec round-trip + detector together.
    // r9: the frame-pair SELF-JOIN on (doc, f-1, x, y) collapsed to a
    // lag(s) window + inlined previous-frame channel formulas — proven
    // row-identical to the join form in DuckDB at sf0.01/sf0.1/sf1 before
    // the swap (the ts08 lesson: a 576M-row hash join at 100x is the
    // oracle's only intractable part; the arithmetic is unchanged).
    "m06_scene_cuts" -> {
      import MultimodalQueries.{M06Frames => F, M06Width => W, M06Height => H, M06CutThreshold => T}
      s"""WITH fr AS (SELECT doc_id, unnest(generate_series(0, ${F - 1})) AS f FROM documents),
         |sc AS (SELECT doc_id, f,
         |         SUM(CASE WHEN f > 0 AND (doc_id*13 + f*29) % 7 = 0 THEN 1 ELSE 0 END)
         |           OVER (PARTITION BY doc_id ORDER BY f) AS s
         |       FROM fr),
         |sl AS (SELECT doc_id, f, s, lag(s) OVER (PARTITION BY doc_id ORDER BY f) AS sp
         |       FROM sc),
         |px AS (SELECT doc_id, f, s, sp, unnest(generate_series(0, ${W - 1})) AS x
         |       FROM sl WHERE f > 0),
         |pxy AS (SELECT doc_id, f, s, sp, x, unnest(generate_series(0, ${H - 1})) AS y FROM px),
         |sad AS (SELECT doc_id, f,
         |          SUM(abs((doc_id*7 + s*97 + x*3 + y*5 + f) % 256
         |                - (doc_id*7 + sp*97 + x*3 + y*5 + f - 1) % 256)
         |            + abs((doc_id*11 + s*131 + x*13 + y + 2*f) % 256
         |                - (doc_id*11 + sp*131 + x*13 + y + 2*(f-1)) % 256)
         |            + abs((x*y + doc_id + s*53 + 3*f) % 256
         |                - (x*y + doc_id + sp*53 + 3*(f-1)) % 256)) AS sad
         |        FROM pxy GROUP BY 1, 2),
         |cuts AS (SELECT doc_id, COUNT(*) AS n_cuts,
         |           md5(string_agg(CAST(f AS VARCHAR), ',' ORDER BY f)) AS cuts_md5
         |         FROM sad WHERE sad > $T GROUP BY 1),
         |tot AS (SELECT doc_id, CAST(SUM(sad) AS BIGINT) AS sad_total FROM sad GROUP BY 1)
         |SELECT d.doc_id, CAST($F AS BIGINT) AS n_frames,
         |       coalesce(c.n_cuts, 0) AS n_cuts,
         |       coalesce(c.cuts_md5, md5('')) AS cuts_md5,
         |       t.sad_total
         |FROM documents d
         |JOIN tot t ON t.doc_id = d.doc_id
         |LEFT JOIN cuts c ON c.doc_id = d.doc_id""".stripMargin
    },
    "t01_token_stats" ->
      s"""SELECT doc_id, len($dToks) AS ws_tokens,
         | len(regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9\\s]')) AS re_tokens
         |FROM documents""".stripMargin,
    "t02_quality" -> t02Sql,
    "t03_langid" -> t03Sql,
    // p03: cumulative stage survivors; same t02/t03/d07 CTEs as p01 plus
    // the d14 quota cut over stage-4 survivors
    "p03_curation_funnel" ->
      s"""WITH q AS ($t02Sql), l AS ($t03Sql), c AS ($d07Sql),
         |s2 AS (SELECT doc_id FROM l WHERE pred_lang = lang),
         |s3 AS (SELECT q.doc_id, q.n_distinct FROM s2 JOIN q ON s2.doc_id = q.doc_id
         |       WHERE q.n_tokens >= ${TextQueries.CleanMinTokens}
         |         AND q.ttr >= ${TextQueries.CleanMinTtr}),
         |s4 AS (SELECT s3.doc_id, s3.n_distinct FROM s3
         |       JOIN c ON s3.doc_id = c.doc_id AND c.doc_id = c.cluster_rep),
         |s5 AS (SELECT doc_id FROM (
         |         SELECT s4.doc_id,
         |           row_number() OVER (PARTITION BY d.source
         |             ORDER BY s4.n_distinct DESC, s4.doc_id) AS rk
         |         FROM s4 JOIN documents d ON s4.doc_id = d.doc_id)
         |       WHERE rk <= ${TextQueries.SourceQuota})
         |SELECT CAST(1 AS BIGINT) AS stage, 'raw' AS stage_name,
         |       CAST((SELECT COUNT(*) FROM documents) AS BIGINT) AS n_docs
         |UNION ALL SELECT 2, 'lang', (SELECT COUNT(*) FROM s2)
         |UNION ALL SELECT 3, 'quality', (SELECT COUNT(*) FROM s3)
         |UNION ALL SELECT 4, 'dedup', (SELECT COUNT(*) FROM s4)
         |UNION ALL SELECT 5, 'quota', (SELECT COUNT(*) FROM s5)""".stripMargin,
    "p01_clean_corpus" ->
      s"""WITH q AS ($t02Sql), l AS ($t03Sql), c AS ($d07Sql)
         |SELECT q.doc_id, l.lang, q.n_tokens, q.ttr
         |FROM c JOIN q ON c.doc_id = q.doc_id JOIN l ON c.doc_id = l.doc_id
         |WHERE c.doc_id = c.cluster_rep AND l.pred_lang = l.lang
         |  AND q.n_tokens >= ${TextQueries.CleanMinTokens} AND q.ttr >= ${TextQueries.CleanMinTtr}""".stripMargin,
    "t04_fingerprint" ->
      s"""WITH n AS (SELECT doc_id, text, $dNorm AS norm FROM documents),
         |p AS (SELECT doc_id, norm, md5(text) AS full_md5, md5(norm) AS norm_md5,
         |        md5(array_to_string(list_sort(string_split(norm, ' ')), ' ')) AS bag_md5,
         |        unnest(generate_series(1, greatest(length(norm) - ${TextQueries.ShingleSize - 1}, 1))) AS pos
         |      FROM n)
         |SELECT doc_id, full_md5, norm_md5, bag_md5,
         |       min(md5(substring(norm, pos, ${TextQueries.ShingleSize}))) AS min_shingle_md5
         |FROM p GROUP BY doc_id, full_md5, norm_md5, bag_md5""".stripMargin,
    "t05_ngram_profile" ->
      s"""WITH n AS (SELECT lang, $dNorm AS norm FROM documents),
         |p AS (SELECT lang, norm,
         |        unnest(generate_series(1, greatest(length(norm) - 2, 1))) AS pos FROM n),
         |tri AS (SELECT lang, substring(norm, pos, 3) AS tri FROM p),
         |cnt AS (SELECT lang, tri, count(*) AS n FROM tri GROUP BY lang, tri),
         |r AS (SELECT lang, tri, n,
         |        row_number() OVER (PARTITION BY lang ORDER BY n DESC, tri) AS rnk FROM cnt)
         |SELECT lang, tri, n, rnk FROM r WHERE rnk <= 10""".stripMargin,
    "d01_dedup_groups" ->
      s"""WITH b AS (SELECT doc_id,
         |  md5(array_to_string(list_sort(list_distinct($dToks)), ' ')) AS bag_md5 FROM documents)
         |SELECT bag_md5, min(doc_id) AS keeper, count(*) AS dup_cnt
         |FROM b GROUP BY bag_md5 HAVING count(*) >= 2""".stripMargin,
    "g01_pagerank" -> pageRankSql,
    "d02_minhash_sig" -> minHashSigSql,
    "d03_minhash_pairs" -> minHashPairsSql,
    "d04_simhash" -> simhashSql,
    // d09 = the all-pairs Hamming scan, summarized per doc; the Spark
    // side's banded candidates are a complete cover for hamming <= 3, so
    // the sets match exactly
    "d09_simhash_pairs" ->
      s"""WITH sig AS ($simhashSql),
         |p AS (SELECT a.doc_id AS x, b.doc_id AS y FROM sig a JOIN sig b
         |      ON a.doc_id <> b.doc_id
         |      WHERE bit_count(xor(a.simhash, b.simhash)) <= ${TextQueries.SimhashHammingMax})
         |SELECT s.doc_id, COUNT(p.y) AS n_near,
         |       CAST(least(coalesce(MIN(p.y), s.doc_id), s.doc_id) AS BIGINT) AS rep
         |FROM sig s LEFT JOIN p ON p.x = s.doc_id
         |GROUP BY s.doc_id""".stripMargin,
    "d05_jaccard_pairs" ->
      s"""WITH toks AS (SELECT doc_id, lang, list_distinct($dToks) AS t FROM documents),
         |tt AS (SELECT doc_id, lang, len(t) AS nt, unnest(t) AS tok FROM toks),
         |j AS (SELECT a.doc_id AS a, b.doc_id AS b, a.nt AS na, b.nt AS nb, count(*) AS inter
         |      FROM tt a JOIN tt b ON a.tok = b.tok AND a.lang = b.lang AND a.doc_id < b.doc_id
         |      GROUP BY 1, 2, 3, 4)
         |SELECT a, b, CAST(inter AS DOUBLE) / (na + nb - inter) AS jaccard
         |FROM j WHERE CAST(inter AS DOUBLE) / (na + nb - inter) >= ${TextQueries.JaccardThreshold}""".stripMargin,
    // d06 = LSH candidates (the d03 pair set) verified by the hashed-bitset
    // Jaccard: bit = first-5-hex-digits of md5(token) mod HashBits. The
    // oracle computes the identical function on position SETS (popcount of
    // AND/OR == intersection/union of distinct hashed positions).
    "d06_bitset_jaccard" -> d06Sql,
    "s04_ann_ivf" ->
      s"""WITH $dNrmCte,
         |anch AS (SELECT vec_id - ${SimilarityQueries.AnchorFrom} AS anchor_id, v AS av, nrm AS anrm
         |         FROM nrm WHERE vec_id >= ${SimilarityQueries.AnchorFrom}
         |           AND vec_id < ${SimilarityQueries.AnchorFrom + SimilarityQueries.AnchorCount}),
         |scored AS (SELECT n.vec_id, n.v, n.nrm, a.anchor_id,
         |             list_dot_product(n.v, a.av) / (n.nrm * a.anrm) AS acos,
         |             row_number() OVER (PARTITION BY n.vec_id
         |                                ORDER BY list_dot_product(n.v, a.av) / (n.nrm * a.anrm) DESC,
         |                                         a.anchor_id) AS rk
         |           FROM nrm n, anch a),
         |celled AS (SELECT vec_id, v, nrm, anchor_id AS cell FROM scored WHERE rk = 1),
         |q AS (SELECT vec_id AS query_id, v AS qv, nrm AS qnrm, cell FROM celled
         |      WHERE vec_id < ${SimilarityQueries.QueryCount}),
         |c AS (SELECT query_id, q.cell, vec_id, list_dot_product(qv, v) / (qnrm * nrm) AS cosine
         |      FROM q JOIN celled ON q.cell = celled.cell AND celled.vec_id != q.query_id),
         |r AS (SELECT query_id, cell, vec_id, cosine,
         |        row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, vec_id) AS rnk
         |      FROM c)
         |SELECT query_id, cell, vec_id AS neighbor_id, cosine
         |FROM r WHERE rnk = 1""".stripMargin,
    "s05_quantize" ->
      s"""WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
         |m AS (SELECT vec_id, v, list_min(v) AS mn, list_max(v) AS mx FROM v),
         |q AS (SELECT vec_id, v, mn, mx,
         |        CASE WHEN mx = mn THEN list_transform(v, x -> 0)
         |             ELSE list_transform(v, x -> CAST(round((x - mn) / (mx - mn) * 255) AS INT)) END AS q
         |      FROM m)
         |SELECT vec_id, mn, mx,
         |       md5(array_to_string(q, ',')) AS q_md5,
         |       CASE WHEN mx = mn THEN CAST(0 AS DOUBLE)
         |            ELSE list_max(list_transform(list_zip(q, v),
         |                   s -> abs(struct_extract(s, 1) / 255.0 * (mx - mn) + mn - struct_extract(s, 2)))) END AS max_err
         |FROM q""".stripMargin,
    "s06_kmeans" ->
      s"""WITH q AS (SELECT vec_id,
         |             list_transform(embedding::DOUBLE[],
         |               x -> CAST(CAST(round(x * ${SimilarityQueries.KMeansQScale}) AS INT) AS DOUBLE)) AS qd
         |           FROM embeddings),
         |qn AS (SELECT vec_id, qd, list_dot_product(qd, qd) AS qq FROM q),
         |c0 AS (SELECT vec_id AS k, qd AS cd, list_dot_product(qd, qd) AS cc
         |       FROM q WHERE vec_id < ${SimilarityQueries.KMeansK}),
         |d1 AS (SELECT a.vec_id, c.k, a.qq + c.cc - 2 * list_dot_product(a.qd, c.cd) AS dist
         |       FROM qn a CROSS JOIN c0 c),
         |m1 AS (SELECT vec_id, min(dist) AS md FROM d1 GROUP BY 1),
         |s1 AS (SELECT d1.vec_id, min(d1.k) AS cluster
         |       FROM d1 JOIN m1 ON d1.vec_id = m1.vec_id AND d1.dist = m1.md GROUP BY 1),
         |e1 AS (SELECT s1.cluster, unnest(q.qd) AS val, unnest(range(1, len(q.qd) + 1)) AS pos
         |       FROM q JOIN s1 USING (vec_id)),
         |u1 AS (SELECT cluster, pos, floor(SUM(val) / COUNT(*)) AS cv FROM e1 GROUP BY 1, 2),
         |l1 AS (SELECT cluster, list(cv ORDER BY pos) AS cd FROM u1 GROUP BY 1),
         |c1 AS (SELECT c0.k, COALESCE(l1.cd, c0.cd) AS cd,
         |              list_dot_product(COALESCE(l1.cd, c0.cd), COALESCE(l1.cd, c0.cd)) AS cc
         |       FROM c0 LEFT JOIN l1 ON c0.k = l1.cluster),
         |d2 AS (SELECT a.vec_id, c.k, a.qq + c.cc - 2 * list_dot_product(a.qd, c.cd) AS dist
         |       FROM qn a CROSS JOIN c1 c),
         |m2 AS (SELECT vec_id, min(dist) AS md FROM d2 GROUP BY 1),
         |s2 AS (SELECT d2.vec_id, min(d2.k) AS cluster, min(m2.md) AS dist
         |       FROM d2 JOIN m2 ON d2.vec_id = m2.vec_id AND d2.dist = m2.md GROUP BY 1)
         |SELECT cluster, COUNT(*) AS n_vecs, CAST(SUM(dist) AS BIGINT) AS inertia
         |FROM s2 GROUP BY cluster""".stripMargin,
    "s07_pq_encode" -> {
      val nSub = SimilarityQueries.PqSubspaces
      val subCtes = (0 until nSub).map { m =>
        val lo = m * SimilarityQueries.PqSubDim + 1
        val hi = (m + 1) * SimilarityQueries.PqSubDim
        s"""d$m AS (SELECT q.vec_id, c.k,
           |  list_dot_product(q.qd[$lo:$hi], q.qd[$lo:$hi]) + list_dot_product(c.qd[$lo:$hi], c.qd[$lo:$hi])
           |    - 2 * list_dot_product(q.qd[$lo:$hi], c.qd[$lo:$hi]) AS dist
           |  FROM q, c0 c),
           |m$m AS (SELECT vec_id, min(dist) AS md FROM d$m GROUP BY 1),
           |s$m AS (SELECT d.vec_id, min(d.k) AS code$m, min(m.md) AS err$m
           |        FROM d$m d JOIN m$m m ON d.vec_id = m.vec_id AND d.dist = m.md GROUP BY 1)""".stripMargin
      }
      val joins = (1 until nSub).map(m => s"JOIN s$m USING (vec_id)").mkString(" ")
      s"""WITH q AS (SELECT vec_id,
         |             list_transform(embedding::DOUBLE[],
         |               x -> CAST(CAST(round(x * ${SimilarityQueries.KMeansQScale}) AS INT) AS DOUBLE)) AS qd
         |           FROM embeddings),
         |c0 AS (SELECT vec_id AS k, qd FROM q WHERE vec_id < ${SimilarityQueries.PqCodes}),
         |${subCtes.mkString(",\n")}
         |SELECT s0.vec_id, ${(0 until nSub).map(m => s"code$m").mkString(", ")},
         |       CAST(${(0 until nSub).map(m => s"err$m").mkString(" + ")} AS BIGINT) AS recon_err
         |FROM s0 $joins""".stripMargin
    },
    // s11: IVF-PQ + ADC — cells/codes/tables all on quantized integers;
    // argmins tie-break (dist, k) = the engine's array_position-of-first-min;
    // ADC is the sum of the query's per-subspace table entries at the
    // candidate's codes. The multiply-referenced CTEs are MATERIALIZED:
    // DuckDB 1.0 inlines CTEs by default, and this pipeline's 6-deep
    // multiply-referenced chain (r → cel → cdst → q, fanned into d0..d3,
    // sd and cand) explodes exponentially under inlining — >12 min /
    // >100 GB at the 10× replica; materialized it runs in ~0.5 s there
    // (same rows, semantics-free hint).
    "s11_ivfpq_adc" -> {
      import SimilarityQueries.{AnchorFrom, AnchorCount, PqCodes, PqSubspaces, PqSubDim, QueryCount, KMeansQScale}
      val subCtes = (0 until PqSubspaces).map { m =>
        val lo = m * PqSubDim + 1
        val hi = (m + 1) * PqSubDim
        s"""d$m AS MATERIALIZED (SELECT r.vec_id, s.sk,
           |  list_dot_product(r.r[$lo:$hi], r.r[$lo:$hi]) + list_dot_product(s.sr[$lo:$hi], s.sr[$lo:$hi])
           |    - 2 * list_dot_product(r.r[$lo:$hi], s.sr[$lo:$hi]) AS dist
           |  FROM r, sd s),
           |cod$m AS (SELECT vec_id, sk AS code$m FROM
           |  (SELECT vec_id, sk, row_number() OVER (PARTITION BY vec_id ORDER BY dist, sk) AS rk FROM d$m)
           |  WHERE rk = 1)""".stripMargin
      }
      val codeJoins = (0 until PqSubspaces).map(m => s"JOIN cod$m USING (vec_id)").mkString(" ")
      val codeCols = (0 until PqSubspaces).map(m => s"code$m").mkString(", ")
      val tblJoins = (0 until PqSubspaces)
        .map(m => s"JOIN d$m qt$m ON qt$m.vec_id = qs.query_id AND qt$m.sk = c.code$m").mkString("\n|         ")
      val adcSum = (0 until PqSubspaces).map(m => s"qt$m.dist").mkString(" + ")
      s"""WITH q AS MATERIALIZED (SELECT vec_id,
         |             list_transform(embedding::DOUBLE[],
         |               x -> CAST(CAST(round(x * $KMeansQScale) AS INT) AS DOUBLE)) AS qd
         |           FROM embeddings),
         |a AS MATERIALIZED (SELECT vec_id - $AnchorFrom AS k, qd AS ad FROM q
         |      WHERE vec_id >= $AnchorFrom AND vec_id < ${AnchorFrom + AnchorCount}),
         |cdst AS (SELECT q.vec_id, a.k,
         |           list_dot_product(q.qd, q.qd) + list_dot_product(a.ad, a.ad)
         |             - 2 * list_dot_product(q.qd, a.ad) AS dist
         |         FROM q, a),
         |cel AS MATERIALIZED (SELECT vec_id, k AS cell FROM
         |          (SELECT vec_id, k, row_number() OVER (PARTITION BY vec_id ORDER BY dist, k) AS rk FROM cdst)
         |        WHERE rk = 1),
         |r AS MATERIALIZED (SELECT q.vec_id, cel.cell,
         |        list_transform(list_zip(q.qd, a.ad),
         |          s -> struct_extract(s, 1) - struct_extract(s, 2)) AS r
         |      FROM q JOIN cel ON q.vec_id = cel.vec_id JOIN a ON a.k = cel.cell),
         |sd AS MATERIALIZED (SELECT vec_id AS sk, r AS sr FROM r WHERE vec_id < $PqCodes),
         |${subCtes.mkString(",\n")},
         |qs AS (SELECT vec_id AS query_id, cell AS qcell FROM cel WHERE vec_id < $QueryCount),
         |cand AS (SELECT qs.query_id, c.cell, c.vec_id, ($adcSum) AS adc
         |         FROM qs
         |         JOIN (SELECT r.vec_id, r.cell, $codeCols FROM r $codeJoins) c
         |           ON c.cell = qs.qcell AND c.vec_id != qs.query_id
         |         $tblJoins),
         |fin AS (SELECT query_id, cell, vec_id, adc,
         |          row_number() OVER (PARTITION BY query_id ORDER BY adc, vec_id) AS rk
         |        FROM cand)
         |SELECT query_id, CAST(cell AS BIGINT) AS cell, vec_id AS neighbor_id,
         |       CAST(adc AS BIGINT) AS adc_dist
         |FROM fin WHERE rk = 1""".stripMargin
    },
    "d07_dedup_clusters" -> d07Sql,
    "d08_decontaminate" -> d08Sql,
    // the bloom pre-filter is semantics-free (FPs re-checked by the exact
    // join, no FNs) — d10's oracle IS d08's
    "d10_bloom_decontaminate" -> d08Sql,
    "t08_repetition" ->
      s"""WITH t AS (SELECT doc_id, $dToks AS toks FROM documents),
         |base AS (SELECT doc_id, CAST(len(toks) AS BIGINT) AS n_toks,
         |                CAST(len(list_distinct(toks)) AS BIGINT) AS n_uniq FROM t),
         |g2 AS (SELECT doc_id, array_to_string(toks[pos:pos + 1], ' ') AS gram
         |       FROM (SELECT doc_id, toks,
         |               unnest(generate_series(1, greatest(len(toks) - 1, 1))) AS pos FROM t)),
         |c2 AS (SELECT doc_id, gram, COUNT(*) AS cnt FROM g2 GROUP BY 1, 2),
         |a2 AS (SELECT doc_id, SUM(cnt) AS g2_total, MAX(cnt) AS g2_max FROM c2 GROUP BY 1),
         |g3 AS (SELECT doc_id, array_to_string(toks[pos:pos + 2], ' ') AS gram
         |       FROM (SELECT doc_id, toks,
         |               unnest(generate_series(1, greatest(len(toks) - 2, 1))) AS pos FROM t)),
         |c3 AS (SELECT doc_id, gram, COUNT(*) AS cnt FROM g3 GROUP BY 1, 2),
         |a3 AS (SELECT doc_id, SUM(cnt) AS g3_total,
         |              SUM(CASE WHEN cnt > 1 THEN cnt ELSE 0 END) AS g3_dup FROM c3 GROUP BY 1)
         |SELECT base.doc_id, n_toks, n_uniq,
         |       CAST(n_uniq AS DOUBLE) / n_toks AS uniq_ratio,
         |       CAST(g2_max AS DOUBLE) / g2_total AS top2_frac,
         |       CAST(g3_dup AS DOUBLE) / g3_total AS dup3_frac
         |FROM base JOIN a2 USING (doc_id) JOIN a3 USING (doc_id)""".stripMargin,
    "t09_salient_terms" ->
      s"""WITH t AS (SELECT doc_id, unnest($dToks) AS tok FROM documents),
         |tf AS (SELECT doc_id, tok, COUNT(*) AS tf FROM t GROUP BY 1, 2),
         |df AS (SELECT tok, COUNT(*) AS df FROM tf GROUP BY 1),
         |r AS (SELECT tf.doc_id, tf.tok, tf.tf, df.df,
         |        CAST(row_number() OVER (PARTITION BY tf.doc_id
         |               ORDER BY tf.tf DESC, df.df ASC, tf.tok ASC) AS BIGINT) AS rnk
         |      FROM tf JOIN df USING (tok))
         |SELECT doc_id, rnk, tok, tf, df FROM r
         |WHERE rnk <= ${TextQueries.SalientK}""".stripMargin,
    "t10_mix_sample" ->
      s"""WITH h AS (SELECT doc_id, source,
         |             CAST(substring(source, 4) AS INT) AS src_idx,
         |             md5(CAST(doc_id AS VARCHAR)) AS h FROM documents),
         |b AS (SELECT source, 10 * (1 + src_idx % 9) AS rate_pct,
         |             (${TextQueries.hex4Sql("strpos")}) % 100 AS bucket FROM h)
         |SELECT source, CAST(rate_pct AS BIGINT) AS rate_pct, COUNT(*) AS n_kept
         |FROM b WHERE bucket < rate_pct GROUP BY 1, 2""".stripMargin,
    "s01_ann_topk" ->
      s"""WITH $dNrmCte,
         |q AS (SELECT vec_id AS query_id, v AS qv, nrm AS qnrm FROM nrm
         |      WHERE vec_id < ${SimilarityQueries.QueryCount}),
         |c AS (SELECT query_id, vec_id, list_dot_product(qv, v) / (qnrm * nrm) AS cosine
         |      FROM q, nrm WHERE vec_id != query_id),
         |r AS (SELECT query_id, vec_id, cosine,
         |        row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, vec_id) AS rnk
         |      FROM c)
         |SELECT query_id, vec_id AS neighbor_id, rnk, cosine
         |FROM r WHERE rnk <= ${SimilarityQueries.TopK}""".stripMargin,
    "s02_embed_neardup" ->
      s"""WITH $dNrmCte
         |SELECT a.vec_id AS a, b.vec_id AS b,
         |       list_dot_product(a.v, b.v) / (a.nrm * b.nrm) AS cosine
         |FROM nrm a, nrm b
         |WHERE a.vec_id < b.vec_id
         |  AND list_dot_product(a.v, b.v) / (a.nrm * b.nrm) >= ${SimilarityQueries.NearDupThreshold}""".stripMargin,
    "s03_ann_lsh" ->
      s"""WITH $dNrmCte,
         |anch AS (SELECT vec_id - ${SimilarityQueries.AnchorFrom} AS anchor_id, v AS av FROM nrm
         |         WHERE vec_id >= ${SimilarityQueries.AnchorFrom}
         |           AND vec_id < ${SimilarityQueries.AnchorFrom + SimilarityQueries.AnchorCount}),
         |bkt AS (SELECT n.vec_id,
         |          CAST(SUM(CASE WHEN list_dot_product(n.v, a.av) > 0
         |                   THEN CAST(pow(2, a.anchor_id) AS BIGINT) ELSE 0 END) AS BIGINT) AS bucket
         |        FROM nrm n, anch a GROUP BY n.vec_id),
         |b2 AS (SELECT nrm.vec_id, nrm.v, nrm.nrm, bkt.bucket FROM nrm JOIN bkt USING (vec_id)),
         |q AS (SELECT vec_id AS query_id, v AS qv, nrm AS qnrm, bucket FROM b2
         |      WHERE vec_id < ${SimilarityQueries.QueryCount}),
         |c AS (SELECT query_id, q.bucket, vec_id, list_dot_product(qv, v) / (qnrm * nrm) AS cosine
         |      FROM q JOIN b2 ON q.bucket = b2.bucket AND b2.vec_id != q.query_id),
         |r AS (SELECT query_id, bucket, vec_id, cosine,
         |        row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, vec_id) AS rnk
         |      FROM c)
         |SELECT query_id, bucket, vec_id AS neighbor_id, cosine
         |FROM r WHERE rnk = 1""".stripMargin,
    // s09: s03's bucket assignment + Hamming-1 probe fan-out on the query
    // side; the all-probe candidate union re-ranked by exact cosine
    "s09_ann_multiprobe" -> {
      val probes = ("bucket" +: (0 until SimilarityQueries.AnchorCount)
        .map(k => s"xor(bucket, ${1L << k})")).mkString("[", ", ", "]")
      s"""WITH $dNrmCte,
         |anch AS (SELECT vec_id - ${SimilarityQueries.AnchorFrom} AS anchor_id, v AS av FROM nrm
         |         WHERE vec_id >= ${SimilarityQueries.AnchorFrom}
         |           AND vec_id < ${SimilarityQueries.AnchorFrom + SimilarityQueries.AnchorCount}),
         |bkt AS (SELECT n.vec_id,
         |          CAST(SUM(CASE WHEN list_dot_product(n.v, a.av) > 0
         |                   THEN CAST(pow(2, a.anchor_id) AS BIGINT) ELSE 0 END) AS BIGINT) AS bucket
         |        FROM nrm n, anch a GROUP BY n.vec_id),
         |b2 AS (SELECT nrm.vec_id, nrm.v, nrm.nrm, bkt.bucket FROM nrm JOIN bkt USING (vec_id)),
         |q AS (SELECT vec_id AS query_id, v AS qv, nrm AS qnrm, bucket FROM b2
         |      WHERE vec_id < ${SimilarityQueries.QueryCount}),
         |p AS (SELECT query_id, qv, qnrm, unnest($probes) AS probe FROM q),
         |c AS (SELECT query_id, vec_id, list_dot_product(qv, v) / (qnrm * nrm) AS cosine
         |      FROM p JOIN b2 ON p.probe = b2.bucket AND b2.vec_id != p.query_id),
         |r AS (SELECT query_id, vec_id, cosine,
         |        row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, vec_id) AS rnk,
         |        count(*) OVER (PARTITION BY query_id) AS n_cand
         |      FROM c)
         |SELECT query_id, vec_id AS neighbor_id, cosine, n_cand FROM r WHERE rnk = 1""".stripMargin
    },
    // s08: the s01 (brute) and s03 (LSH) oracle bodies verbatim, CTEs
    // renamed b*/l* to compose in one scope; evaluation joins on query_id
    "s08_ann_recall" ->
      s"""WITH $dNrmCte,
         |bq AS (SELECT vec_id AS query_id, v AS qv, nrm AS qnrm FROM nrm
         |       WHERE vec_id < ${SimilarityQueries.QueryCount}),
         |bc AS (SELECT query_id, vec_id, list_dot_product(qv, v) / (qnrm * nrm) AS cosine
         |       FROM bq, nrm WHERE vec_id != query_id),
         |br AS (SELECT query_id, vec_id, cosine,
         |         row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, vec_id) AS rnk
         |       FROM bc),
         |bs AS (SELECT query_id, list_sort(list(vec_id)) AS brute_ids,
         |         MAX(CASE WHEN rnk = 1 THEN cosine END) AS best_cos
         |       FROM br WHERE rnk <= ${SimilarityQueries.TopK} GROUP BY 1),
         |anch AS (SELECT vec_id - ${SimilarityQueries.AnchorFrom} AS anchor_id, v AS av FROM nrm
         |         WHERE vec_id >= ${SimilarityQueries.AnchorFrom}
         |           AND vec_id < ${SimilarityQueries.AnchorFrom + SimilarityQueries.AnchorCount}),
         |bkt AS (SELECT n.vec_id,
         |          CAST(SUM(CASE WHEN list_dot_product(n.v, a.av) > 0
         |                   THEN CAST(pow(2, a.anchor_id) AS BIGINT) ELSE 0 END) AS BIGINT) AS bucket
         |        FROM nrm n, anch a GROUP BY n.vec_id),
         |b2 AS (SELECT nrm.vec_id, nrm.v, nrm.nrm, bkt.bucket FROM nrm JOIN bkt USING (vec_id)),
         |lq AS (SELECT vec_id AS query_id, v AS qv, nrm AS qnrm, bucket FROM b2
         |       WHERE vec_id < ${SimilarityQueries.QueryCount}),
         |lc AS (SELECT query_id, lq.bucket, vec_id, list_dot_product(qv, v) / (qnrm * nrm) AS cosine
         |       FROM lq JOIN b2 ON lq.bucket = b2.bucket AND b2.vec_id != lq.query_id),
         |lr AS (SELECT query_id, vec_id, cosine,
         |         row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, vec_id) AS rnk
         |       FROM lc)
         |SELECT query_id, lr.vec_id AS lsh_neighbor,
         |       CAST(CASE WHEN list_contains(bs.brute_ids, lr.vec_id) THEN 1 ELSE 0 END AS BIGINT) AS hit,
         |       bs.best_cos - lr.cosine AS cos_gap
         |FROM bs JOIN lr USING (query_id) WHERE lr.rnk = 1""".stripMargin,
    // w06: dense hour spine from the observed range (list-form range() —
    // DuckDB 1.0's table-function form rejects non-constant args), LOCF
    // via last_value IGNORE NULLS over the same (type, hour) order Spark
    // uses; values stay DECIMAL until the final DOUBLE cast on both sides.
    "w06_gap_fill" ->
      s"""WITH h AS (SELECT epoch_us(date_trunc('hour', MIN(ts))) AS mn,
         |                  epoch_us(date_trunc('hour', MAX(ts))) AS mx FROM events),
         |hours AS (SELECT unnest(list_transform(
         |            range(0, CAST((mx - mn) / ${RelationalQueries.GapFillStepUs} AS BIGINT) + 1),
         |            i -> mn + i * ${RelationalQueries.GapFillStepUs})) AS hr_us FROM h),
         |types AS (SELECT DISTINCT event_type FROM events),
         |hourly AS (SELECT event_type, epoch_us(date_trunc('hour', ts)) AS hr_us,
         |                  COUNT(*) AS n_obs, SUM(CAST(value AS DECIMAL(18,2))) AS v
         |           FROM events GROUP BY 1, 2)
         |SELECT t.event_type,
         |       strftime(make_timestamp(g.hr_us), '%Y-%m-%d %H:%M:%S') AS hour,
         |       COALESCE(h2.n_obs, 0) AS n,
         |       CAST(h2.n_obs IS NULL AS BIGINT) AS is_gap,
         |       CAST(COALESCE(last_value(h2.v IGNORE NULLS) OVER (
         |              PARTITION BY t.event_type ORDER BY g.hr_us
         |              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 0) AS DOUBLE) AS locf_value
         |FROM hours g CROSS JOIN types t
         |LEFT JOIN hourly h2 ON h2.event_type = t.event_type AND h2.hr_us = g.hr_us""".stripMargin,
    // t12: the regex is interpolated VERBATIM from TextQueries.RedactPattern
    // (Java∩RE2 common dialect); 'g' makes DuckDB's regexp_replace global,
    // matching Java replaceAll.
    "t12_term_redact" ->
      s"""SELECT doc_id,
         |  CAST(len(regexp_extract_all(text, '${TextQueries.RedactPattern}')) AS BIGINT) AS n_masked,
         |  md5(regexp_replace(text, '${TextQueries.RedactPattern}', '[MASKED]', 'g')) AS redacted_fp,
         |  CAST(length(regexp_replace(text, '${TextQueries.RedactPattern}', '[MASKED]', 'g')) AS BIGINT) AS redacted_len
         |FROM documents""".stripMargin,
    "d11_dup_spans" ->
      s"""WITH t AS (SELECT doc_id, $dToks AS toks FROM documents),
         |w AS (SELECT doc_id, pos,
         |        md5(array_to_string(toks[pos:pos + ${TextQueries.DupSpanW - 1}], ' ')) AS whash
         |      FROM (SELECT doc_id, toks,
         |              unnest(generate_series(1, len(toks) - ${TextQueries.DupSpanW - 1})) AS pos
         |            FROM t WHERE len(toks) >= ${TextQueries.DupSpanW})),
         |dup AS (SELECT whash FROM
         |          (SELECT whash, COUNT(DISTINCT doc_id) AS ndocs FROM w GROUP BY 1)
         |        WHERE ndocs >= 2)
         |SELECT w.doc_id, CAST(COUNT(*) AS BIGINT) AS n_windows,
         |       CAST(SUM(CASE WHEN dup.whash IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_windows,
         |       CAST(COUNT(DISTINCT dup.whash) AS BIGINT) AS n_dup_spans
         |FROM w LEFT JOIN dup ON w.whash = dup.whash
         |GROUP BY 1""".stripMargin,
    // d12: the cut mirrors d11's dup-window detection, explodes coverage
    // (each dup window covers positions pos..pos+W-1), and reassembles the
    // surviving tokens in order; string_agg skips NULLs and an all-removed
    // doc fingerprints the empty string on both engines.
    "d12_span_cut" ->
      s"""WITH t AS (SELECT doc_id, $dToks AS toks FROM documents),
         |w AS (SELECT doc_id, pos,
         |        md5(array_to_string(toks[pos:pos + ${TextQueries.DupSpanW - 1}], ' ')) AS whash
         |      FROM (SELECT doc_id, toks,
         |              unnest(generate_series(1, len(toks) - ${TextQueries.DupSpanW - 1})) AS pos
         |            FROM t WHERE len(toks) >= ${TextQueries.DupSpanW})),
         |dup AS (SELECT whash FROM
         |          (SELECT whash, COUNT(DISTINCT doc_id) AS ndocs FROM w GROUP BY 1)
         |        WHERE ndocs >= 2),
         |cov AS (SELECT DISTINCT w.doc_id, w.pos + o.off AS pos
         |        FROM w JOIN dup USING (whash)
         |        CROSS JOIN (SELECT unnest(generate_series(0, ${TextQueries.DupSpanW - 1})) AS off) o),
         |tok AS (SELECT doc_id, pos, toks[pos] AS tok
         |        FROM (SELECT doc_id, toks, unnest(generate_series(1, len(toks))) AS pos FROM t))
         |SELECT tok.doc_id,
         |       CAST(COUNT(*) AS BIGINT) AS n_tokens,
         |       CAST(SUM(CASE WHEN cov.pos IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_removed,
         |       md5(COALESCE(string_agg(CASE WHEN cov.pos IS NULL THEN tok.tok END,
         |                               ' ' ORDER BY tok.pos), '')) AS cleaned_fp
         |FROM tok LEFT JOIN cov ON tok.doc_id = cov.doc_id AND tok.pos = cov.pos
         |GROUP BY 1""".stripMargin,
    "t13_rare_bigrams" ->
      s"""WITH t AS (SELECT doc_id, $dToks AS toks FROM documents),
         |pd AS (SELECT doc_id, bigram, COUNT(*) AS tf FROM
         |         (SELECT doc_id, array_to_string(toks[pos:pos + 1], ' ') AS bigram
         |          FROM (SELECT doc_id, toks,
         |                  unnest(generate_series(1, len(toks) - 1)) AS pos
         |                FROM t WHERE len(toks) >= 2))
         |       GROUP BY 1, 2),
         |cf AS (SELECT bigram, SUM(tf) AS cf FROM pd GROUP BY 1)
         |SELECT doc_id, CAST(SUM(tf) AS BIGINT) AS n_bigrams,
         |       CAST(SUM(CASE WHEN cf <= ${TextQueries.RareCfMax} THEN tf ELSE 0 END) AS BIGINT) AS n_rare,
         |       CAST(SUM(CASE WHEN cf = 1 THEN tf ELSE 0 END) AS BIGINT) AS n_hapax,
         |       CAST(SUM(CASE WHEN cf <= ${TextQueries.RareCfMax} THEN tf ELSE 0 END) AS DOUBLE)
         |         / SUM(tf) AS rare_ratio
         |FROM pd JOIN cf USING (bigram)
         |GROUP BY 1""".stripMargin,
    "s10_range_search" ->
      s"""WITH $dNrmCte,
         |q AS (SELECT vec_id AS query_id, v AS qv, nrm AS qnrm FROM nrm
         |      WHERE vec_id < ${SimilarityQueries.QueryCount})
         |SELECT query_id, vec_id AS neighbor_id,
         |       list_dot_product(qv, v) / (qnrm * nrm) AS cosine
         |FROM q, nrm
         |WHERE vec_id != query_id
         |  AND list_dot_product(qv, v) / (qnrm * nrm) >= ${SimilarityQueries.RangeTau}""".stripMargin,
    // d14: per-source cap by (n_distinct DESC, doc_id) — integer-exact
    // total order, row_number ≤ K
    "d14_source_quota" ->
      s"""WITH sc AS (SELECT doc_id, source,
         |        CAST(len(list_distinct($dToks)) AS BIGINT) AS n_distinct
         |      FROM documents),
         |r AS (SELECT doc_id, source, n_distinct,
         |        CAST(row_number() OVER (PARTITION BY source
         |          ORDER BY n_distinct DESC, doc_id) AS BIGINT) AS rnk
         |      FROM sc)
         |SELECT doc_id, source, n_distinct, rnk
         |FROM r WHERE rnk <= ${TextQueries.SourceQuota}""".stripMargin,
    // t15: class = binary-digit count − 1 == floor(log2) exactly on both
    // engines; no floating log anywhere
    "t15_zipf_histogram" ->
      s"""WITH t AS (SELECT $dToks AS toks FROM documents),
         |uni AS (SELECT 'tok' AS stream, unnest(toks) AS item FROM t),
         |bi AS (SELECT 'bigram' AS stream, toks[pos] || ' ' || toks[pos + 1] AS item
         |       FROM (SELECT toks, unnest(generate_series(1, len(toks) - 1)) AS pos
         |             FROM t WHERE len(toks) >= 2)),
         |items AS (SELECT * FROM uni WHERE item <> '' UNION ALL SELECT * FROM bi),
         |tc AS (SELECT stream, item, COUNT(*) AS cnt FROM items GROUP BY 1, 2)
         |SELECT stream, CAST(length(bin(cnt)) - 1 AS BIGINT) AS count_class,
         |       CAST(COUNT(*) AS BIGINT) AS n_types,
         |       CAST(SUM(cnt) AS BIGINT) AS n_tokens,
         |       CAST(MIN(cnt) AS BIGINT) AS min_count,
         |       CAST(MAX(cnt) AS BIGINT) AS max_count
         |FROM tc GROUP BY 1, 2""".stripMargin,
    "t14_split_assign" ->
      s"""WITH RECURSIVE $d07Ctes,
         |h AS (SELECT doc_id, cluster_rep,
         |        md5(CAST(cluster_rep AS VARCHAR)) AS h FROM clusters),
         |b AS (SELECT doc_id, cluster_rep,
         |        CAST((${TextQueries.hex4Sql("strpos")}) % 100 AS BIGINT) AS bucket FROM h)
         |SELECT doc_id, cluster_rep, bucket,
         |       CASE WHEN bucket >= ${TextQueries.TestFromBucket} THEN 'test'
         |            WHEN bucket >= ${TextQueries.ValFromBucket} THEN 'val'
         |            ELSE 'train' END AS split
         |FROM b""".stripMargin,
    "w07_retention" ->
      """WITH wk AS (SELECT DISTINCT user_id,
        |              CAST(date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) // 7 AS BIGINT) AS week
        |            FROM events),
        |f AS (SELECT user_id, MIN(week) AS cohort_week FROM wk GROUP BY 1)
        |SELECT cohort_week, CAST(week - cohort_week AS BIGINT) AS week_offset,
        |       COUNT(DISTINCT wk.user_id) AS n_users
        |FROM wk JOIN f USING (user_id)
        |GROUP BY 1, 2""".stripMargin,
    // w08: strict event-time funnel — step k's min(ts) only counts events
    // after the user's step-(k-1) time; ratios are single double divisions
    // of exact counts.
    "w08_funnel" -> {
      val st = RelationalQueries.FunnelSteps
      s"""WITH s1 AS (SELECT user_id, MIN(ts) AS ts1 FROM events
         |            WHERE event_type = '${st(0)}' GROUP BY 1),
         |s2 AS (SELECT e.user_id, MIN(e.ts) AS ts2 FROM events e
         |       JOIN s1 ON e.user_id = s1.user_id
         |       WHERE e.event_type = '${st(1)}' AND e.ts > s1.ts1 GROUP BY 1),
         |s3 AS (SELECT e.user_id, MIN(e.ts) AS ts3 FROM events e
         |       JOIN s2 ON e.user_id = s2.user_id
         |       WHERE e.event_type = '${st(2)}' AND e.ts > s2.ts2 GROUP BY 1),
         |c AS (SELECT (SELECT COUNT(*) FROM s1) AS n1,
         |             (SELECT COUNT(*) FROM s2) AS n2,
         |             (SELECT COUNT(*) FROM s3) AS n3)
         |SELECT CAST(1 AS BIGINT) AS step, '${st(0)}' AS step_name,
         |       CAST(n1 AS BIGINT) AS n_users, CAST(1.0 AS DOUBLE) AS conv_from_prev FROM c
         |UNION ALL
         |SELECT CAST(2 AS BIGINT), '${st(1)}', CAST(n2 AS BIGINT), CAST(n2 AS DOUBLE) / n1 FROM c
         |UNION ALL
         |SELECT CAST(3 AS BIGINT), '${st(2)}', CAST(n3 AS BIGINT), CAST(n3 AS DOUBLE) / n2 FROM c""".stripMargin
    },
    // i03: sweep-line concurrency — active(h) = cumStarts(h) − cumEnds(h−1)
    // over integer hour indexes; durations via DECIMAL(18,2) minutes so both
    // engines compute identical integer micros.
    "i03_active_hours" ->
      """WITH iv AS (SELECT epoch_us(ts) AS s_us,
        |              epoch_us(ts) + CAST(CAST(value AS DECIMAL(18,2)) * 60000000 AS BIGINT) AS e_us
        |            FROM events),
        |b AS (SELECT s_us // 3600000000 AS hs, e_us // 3600000000 AS he FROM iv),
        |st AS (SELECT hs AS h, COUNT(*) AS n FROM b GROUP BY 1),
        |en AS (SELECT he AS h, COUNT(*) AS n FROM b GROUP BY 1),
        |g AS (SELECT unnest(generate_series((SELECT MIN(hs) FROM b), (SELECT MAX(he) FROM b))) AS h),
        |j AS (SELECT g.h, COALESCE(st.n, 0) AS ns, COALESCE(en.n, 0) AS ne
        |      FROM g LEFT JOIN st ON g.h = st.h LEFT JOIN en ON g.h = en.h)
        |SELECT h AS hour_idx, CAST(ns AS BIGINT) AS n_starts, CAST(ne AS BIGINT) AS n_ends,
        |       CAST(SUM(ns) OVER w - (SUM(ne) OVER w - ne) AS BIGINT) AS n_active
        |FROM j WINDOW w AS (ORDER BY h ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)""".stripMargin,
    // q28: pre-aggregated GROUPING SETS, same gid bit order as q24's cube
    "q28_grouping_sets" ->
      """WITH b AS (SELECT o_orderpriority AS prio,
        |             CAST(year(o_orderdate) AS BIGINT) AS yr,
        |             SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS rev, COUNT(*) AS cnt
        |           FROM orders GROUP BY 1, 2)
        |SELECT prio, yr,
        |       CAST(GROUPING(prio) * 2 + GROUPING(yr) AS BIGINT) AS gid,
        |       CAST(SUM(rev) AS DOUBLE) AS revenue,
        |       CAST(SUM(cnt) AS BIGINT) AS n_orders
        |FROM b GROUP BY GROUPING SETS ((prio), (yr), ())""".stripMargin,
    // b02: positional posting lists aligned on the anchor (pos − i), n-way
    // intersection on (doc_id, anchor)
    // b03: unordered proximity — position combinations of all terms with
    // span ≤ W, co-keyed posting-list joins on both engines
    "b03_proximity_search" -> {
      val terms = TextQueries.ProximityTerms
      val legs = terms.zipWithIndex.map { case (t, i) =>
        s"l$i AS (SELECT doc_id, pos AS p$i FROM p WHERE tok = '$t')"
      }
      val joins = (1 until terms.length).map(i => s"JOIN l$i USING (doc_id)").mkString(" ")
      val ps = terms.indices.map(i => s"p$i").mkString(", ")
      s"""WITH t AS (SELECT doc_id, $dToks AS toks FROM documents),
         |p AS (SELECT doc_id, pos, toks[pos] AS tok
         |      FROM (SELECT doc_id, toks, unnest(generate_series(1, len(toks))) AS pos FROM t)),
         |${legs.mkString(",\n")},
         |m AS (SELECT doc_id, greatest($ps) - least($ps) AS span
         |      FROM l0 $joins)
         |SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_matches,
         |       CAST(MIN(span) AS BIGINT) AS min_span
         |FROM m WHERE span <= ${TextQueries.ProximityWindow}
         |GROUP BY 1""".stripMargin
    },
    "b02_phrase_search" -> {
      val legs = TextQueries.PhraseTerms.zipWithIndex.map { case (t, i) =>
        s"l$i AS (SELECT doc_id, pos - $i AS mpos FROM p WHERE tok = '$t')"
      }
      val joins = (1 until TextQueries.PhraseTerms.length)
        .map(i => s"JOIN l$i USING (doc_id, mpos)").mkString(" ")
      s"""WITH t AS (SELECT doc_id, $dToks AS toks FROM documents),
         |p AS (SELECT doc_id, pos, toks[pos] AS tok
         |      FROM (SELECT doc_id, toks, unnest(generate_series(1, len(toks))) AS pos FROM t)),
         |${legs.mkString(",\n")}
         |SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_matches,
         |       CAST(MIN(mpos) AS BIGINT) AS first_pos
         |FROM l0 $joins GROUP BY 1""".stripMargin
    },
    // g02: node-ordered triangle enumeration over the FULL-signature edge
    // set (both MinHash bands equal — tight clique edges; r6: the d03
    // half-signature edges densified 161x at the 10x probe) — each
    // triangle counted once (x<y<z), every corner credited.
    "g02_triangles" ->
      s"""WITH sig AS ($minHashSigSql),
         |e AS (SELECT a.doc_id AS a, b.doc_id AS b FROM sig a JOIN sig b
         |      ON a.band0 = b.band0 AND a.band1 = b.band1 AND a.doc_id < b.doc_id),
         |w AS (SELECT e1.a AS x, e1.b AS y, e2.b AS z
         |      FROM e e1 JOIN e e2 ON e1.b = e2.a),
         |tri AS (SELECT w.x, w.y, w.z
         |        FROM w JOIN e ON w.x = e.a AND w.z = e.b),
         |corners AS (SELECT x AS doc_id FROM tri
         |            UNION ALL SELECT y FROM tri
         |            UNION ALL SELECT z FROM tri)
         |SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_triangles
         |FROM corners GROUP BY 1""".stripMargin,
    // a05: percentile_disc by explicit rank arithmetic — identical integer
    // comparisons on both engines; default ORDER BY frame is safe because
    // values are DISTINCT within a group after the pre-aggregate.
    "a05_exact_quantiles" ->
      """WITH vc AS (SELECT event_type, value AS v, COUNT(*) AS cnt FROM events GROUP BY 1, 2),
        |r AS (SELECT event_type, v, cnt,
        |        SUM(cnt) OVER (PARTITION BY event_type ORDER BY v
        |                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
        |        SUM(cnt) OVER (PARTITION BY event_type) AS n
        |      FROM vc)
        |SELECT event_type, CAST(MAX(n) AS BIGINT) AS n_values,
        |       MIN(CASE WHEN cum * 2 >= n THEN v END) AS median,
        |       MIN(CASE WHEN cum * 10 >= n * 9 THEN v END) AS p90
        |FROM r GROUP BY 1""".stripMargin,
    // a06 = a01's gating pattern for the native Misra-Gries aggregate: the
    // deterministic side is the EXACT count of every guaranteed heavy
    // hitter (cnt·(k+1) > n); the sketch side only contributes its two
    // merge-order-independent guarantee flags, which the oracle mirrors as
    // literal 1s — a sketch drifting out of bounds flips a flag and fails
    // rows+hash.
    "a06_heavy_hitters" -> {
      val kc = TextQueries.MgCharK
      val kl = TextQueries.MgLangK
      s"""WITH toks AS (SELECT unnest($dToks) AS tok FROM documents),
         |ch AS (SELECT substring(tok, 1, 1) AS item FROM toks WHERE tok <> ''),
         |chc AS (SELECT item, COUNT(*) AS cnt FROM ch GROUP BY 1),
         |chn AS (SELECT CAST(SUM(cnt) AS BIGINT) AS n FROM chc),
         |lc AS (SELECT lang AS item, COUNT(*) AS cnt FROM documents GROUP BY 1),
         |ln AS (SELECT CAST(SUM(cnt) AS BIGINT) AS n FROM lc)
         |SELECT 'ch' AS stream, item, cnt, n,
         |       CAST(1 AS BIGINT) AS present_ok, CAST(1 AS BIGINT) AS est_ok
         |FROM chc, chn WHERE cnt * ${kc + 1} > n
         |UNION ALL
         |SELECT 'lang', item, cnt, n, CAST(1 AS BIGINT), CAST(1 AS BIGINT)
         |FROM lc, ln WHERE cnt * ${kl + 1} > n""".stripMargin
    },
    // d13 = SemDeDup: s04's cell assignment (argmax cosine over the 8
    // anchors, ties to the first) + within-cell greedy keeper — a vector
    // is dropped iff a smaller-id same-cell vector is within the cosine
    // threshold; rep = the smallest such pruner (self when kept).
    "d13_semantic_dedup" -> d13Sql,
    // p02 = cross-modal curation: d13's embedding-space keepers ∩ the t02
    // quality gate at p01's thresholds, joined on the shared doc id.
    "p02_semantic_curation" ->
      s"""WITH d13 AS ($d13Sql), q AS ($t02Sql)
         |SELECT d13.vec_id AS doc_id, d13.cell, q.n_tokens, q.ttr
         |FROM d13 JOIN q ON q.doc_id = d13.vec_id
         |WHERE d13.keep = 1
         |  AND q.n_tokens >= ${TextQueries.CleanMinTokens}
         |  AND q.ttr >= ${TextQueries.CleanMinTtr}""".stripMargin,
    // x04 = curriculum order: the oracle's single global window IS the
    // engine's three-level decomposition (stage offsets + sub offsets +
    // within-(stage, sub) ranks sum to the same row_number).
    "x04_curriculum" ->
      s"""WITH t AS (SELECT doc_id, len($dToks) AS n_tokens FROM documents),
         |st AS (SELECT doc_id,
         |         CASE WHEN n_tokens < ${TextQueries.CurriculumStage1} THEN 0
         |              WHEN n_tokens < ${TextQueries.CurriculumStage2} THEN 1
         |              ELSE 2 END AS stage,
         |         md5(CAST(doc_id AS VARCHAR)) AS rk FROM t)
         |SELECT doc_id, CAST(stage AS BIGINT) AS stage,
         |       CAST(row_number() OVER (ORDER BY stage, rk, doc_id) AS BIGINT) AS pos
         |FROM st""".stripMargin,
    // x05 = temperature mixture: quota_s = ceil(target·⌊√n_s⌋ / Σ⌊√n⌋) in
    // pure integer arithmetic (the only float is one correctly-rounded
    // IEEE sqrt of an exact integer, floored identically on both engines);
    // selection is the same md5 rank both engines order byte-identically.
    "x05_mixture_sample" ->
      s"""WITH c AS (SELECT source, COUNT(*) AS n FROM documents GROUP BY source),
         |w AS (SELECT source, CAST(n AS BIGINT) AS n,
         |        CAST(floor(sqrt(CAST(n AS DOUBLE))) AS BIGINT) AS w FROM c),
         |t AS (SELECT CAST(SUM(n) AS BIGINT) // 2 AS target,
         |             CAST(SUM(w) AS BIGINT) AS wsum FROM w),
         |q AS (SELECT source,
         |        CAST((t.target * w.w + t.wsum - 1) // t.wsum AS BIGINT) AS quota
         |      FROM w, t),
         |h AS (SELECT doc_id, source, md5(CAST(doc_id AS VARCHAR)) AS h FROM documents),
         |r AS (SELECT doc_id, source,
         |        CAST(row_number() OVER (PARTITION BY source ORDER BY h, doc_id) AS BIGINT) AS rnk
         |      FROM h)
         |SELECT r.doc_id, r.source, r.rnk, q.quota
         |FROM r JOIN q ON q.source = r.source WHERE r.rnk <= q.quota""".stripMargin,
    // p04 = dataset card: integer aggregates only; the quality predicate
    // is p01's exact form (same doubles, same compare on both engines).
    "p04_dataset_card" ->
      s"""WITH t AS (SELECT source, lang, $dToks AS toks FROM documents),
         |pd AS (SELECT source, lang, toks,
         |         CAST(len(toks) AS BIGINT) AS n_toks,
         |         CAST(len(list_distinct(toks)) AS BIGINT) AS n_uniq FROM t),
         |base AS (SELECT source, lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
         |           CAST(SUM(n_toks) AS BIGINT) AS total_tokens,
         |           CAST(MIN(n_toks) AS BIGINT) AS min_doc_tokens,
         |           CAST(MAX(n_toks) AS BIGINT) AS max_doc_tokens,
         |           CAST(SUM(CASE WHEN n_toks >= ${TextQueries.CleanMinTokens}
         |                          AND CAST(n_uniq AS DOUBLE) / n_toks >= ${TextQueries.CleanMinTtr}
         |                     THEN 1 ELSE 0 END) AS BIGINT) AS n_quality
         |         FROM pd GROUP BY 1, 2),
         |v AS (SELECT source, lang, CAST(COUNT(DISTINCT tok) AS BIGINT) AS vocab
         |      FROM (SELECT source, lang, unnest(toks) AS tok FROM pd) u
         |      WHERE tok <> '' GROUP BY 1, 2)
         |SELECT base.source, base.lang, n_docs, total_tokens, min_doc_tokens,
         |       max_doc_tokens, n_quality, v.vocab
         |FROM base JOIN v ON v.source = base.source AND v.lang = base.lang""".stripMargin,
    // s12 = triplet mining: the d13 lexicographic-struct-max discipline —
    // {cosine, -vec_id, vec_id} ≡ (cosine DESC, vec_id ASC) — conditional
    // on label parity; cosines are the pinned sequential-fold dot product,
    // so the margin subtraction is bit-identical.
    "s12_triplet_mining" ->
      s"""WITH nrm AS (SELECT vec_id, label, embedding::DOUBLE[] AS v,
         |  sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS nrm
         |  FROM embeddings),
         |a AS (SELECT vec_id AS anchor_id, label AS albl, v AS qv, nrm AS qnrm
         |      FROM nrm WHERE vec_id < ${SimilarityQueries.TripletAnchorCount}),
         |sc AS (SELECT a.anchor_id, a.albl, n.label, n.vec_id,
         |         list_dot_product(a.qv, n.v) / (a.qnrm * n.nrm) AS c
         |       FROM a, nrm n WHERE n.vec_id <> a.anchor_id),
         |g AS (SELECT anchor_id, albl,
         |        max(CASE WHEN label = albl
         |                 THEN {'c': c, 'ni': -vec_id, 'id': vec_id} END) AS bp,
         |        max(CASE WHEN label <> albl
         |                 THEN {'c': c, 'ni': -vec_id, 'id': vec_id} END) AS bn
         |      FROM sc GROUP BY 1, 2)
         |SELECT anchor_id, CAST(albl AS BIGINT) AS label,
         |       CAST(struct_extract(bp, 'id') AS BIGINT) AS pos_id,
         |       struct_extract(bp, 'c') AS pos_cos,
         |       CAST(struct_extract(bn, 'id') AS BIGINT) AS neg_id,
         |       struct_extract(bn, 'c') AS neg_cos,
         |       struct_extract(bp, 'c') - struct_extract(bn, 'c') AS margin
         |FROM g""".stripMargin,
  ) ++ tsOracles

  // SemDeDup oracle, shared by d13 and p02. Cell assignment is a single
  // streaming aggregate: max over the lexicographic struct
  // {score, -anchor_id, anchor_id} ≡ row_number(ORDER BY score DESC,
  // anchor_id ASC) = 1, without materializing the n×K scored relation
  // through a window (DuckDB kept the 64-double vectors alive across that
  // window — >100 GB at the 100× replica; the aggregate form holds one
  // running struct per vec_id).
  private def d13Sql: String =
      s"""WITH $dNrmCte,
         |anch AS (SELECT vec_id - ${SimilarityQueries.AnchorFrom} AS anchor_id, v AS av, nrm AS anrm
         |         FROM nrm WHERE vec_id >= ${SimilarityQueries.AnchorFrom}
         |           AND vec_id < ${SimilarityQueries.AnchorFrom}
         |             + (SELECT greatest(8, CAST(ceil(sqrt(count(*))) AS BIGINT)) FROM embeddings)),
         |celled0 AS (SELECT n.vec_id,
         |              max({'s': list_dot_product(n.v, a.av) / (n.nrm * a.anrm),
         |                   'na': -a.anchor_id, 'aid': a.anchor_id}) AS best
         |            FROM nrm n, anch a GROUP BY n.vec_id),
         |celled AS (SELECT c.vec_id, n.v, n.nrm,
         |             CAST(struct_extract(c.best, 'aid') AS BIGINT) AS cell
         |           FROM celled0 c JOIN nrm n ON n.vec_id = c.vec_id),
         |p AS (SELECT a.vec_id AS x, min(b.vec_id) AS pruned_by
         |      FROM celled a JOIN celled b ON a.cell = b.cell AND b.vec_id < a.vec_id
         |      WHERE list_dot_product(a.v, b.v) / (a.nrm * b.nrm) >= ${SimilarityQueries.NearDupThreshold}
         |      GROUP BY a.vec_id)
         |SELECT c.vec_id, c.cell, coalesce(p.pruned_by, c.vec_id) AS rep,
         |       CAST(CASE WHEN p.pruned_by IS NULL THEN 1 ELSE 0 END AS BIGINT) AS keep
         |FROM celled c LEFT JOIN p ON p.x = c.vec_id""".stripMargin

  // The time-series family's oracles, split out of the main literal.
  private def tsOracles: Map[String, String] = Map(
    // ts01/ts02 = per-user event-value series, ordered by (ts, event_id),
    // first SeriesLen points; distances are dot(a,a)+dot(b,b)-2·dot(a,b)
    // with the same sequential fold both engines use (bit-identical).
    "ts01_series_knn" -> {
      import TimeSeriesQueries.{SeriesLen => L, TsQueryUsers => Q}
      s"""WITH ser AS (SELECT user_id, list(value ORDER BY ts, event_id)[1:$L] AS v
         |             FROM events GROUP BY user_id HAVING COUNT(*) >= $L),
         |q AS (SELECT user_id AS query_id, v AS qv FROM ser WHERE user_id < $Q),
         |dd AS (SELECT query_id, s.user_id,
         |         list_dot_product(qv, qv) + list_dot_product(s.v, s.v)
         |           - 2 * list_dot_product(qv, s.v) AS dist
         |       FROM q JOIN ser s ON s.user_id <> q.query_id),
         |r AS (SELECT query_id, user_id, dist,
         |        row_number() OVER (PARTITION BY query_id ORDER BY dist, user_id) AS rk
         |      FROM dd)
         |SELECT query_id, user_id AS neighbor_id, dist FROM r WHERE rk = 1""".stripMargin
    },
    "ts02_paa_candidates" -> {
      import TimeSeriesQueries.{SeriesLen => L, PaaSegments => S, PaaSegLen => G, PaaBucket => W}
      val buckets = (0 until S).map { seg =>
        val terms = (1 to G).map(i => s"v[${seg * G + i}]").mkString(" + ")
        s"CAST(floor(($terms) / $G / $W) AS BIGINT) AS b$seg"
      }.mkString(",\n|        ")
      val joinCond = (0 until S).map(i => s"a.b$i = b.b$i").mkString(" AND ")
      val wordCols = (0 until S).map(i => s"a.b$i").mkString(", ")
      s"""WITH ser AS (SELECT user_id, list(value ORDER BY ts, event_id)[1:$L] AS v
         |             FROM events GROUP BY user_id HAVING COUNT(*) >= $L),
         |w AS (SELECT user_id, v,
         |        $buckets
         |      FROM ser)
         |SELECT a.user_id AS a, b.user_id AS b,
         |       concat_ws(',', $wordCols) AS word,
         |       list_dot_product(a.v, a.v) + list_dot_product(b.v, b.v)
         |         - 2 * list_dot_product(a.v, b.v) AS dist
         |FROM w a JOIN w b ON $joinCond AND a.user_id < b.user_id""".stripMargin
    },
    // ts03 = per-user motif: closest non-overlapping window pair, min by
    // (dist, i, j) — the engine kernel's strict-< first-hit scan in
    // row-major (i, j) order is exactly this ordering.
    "ts03_motif" -> {
      import TimeSeriesQueries.{MotifSeriesLen => L, MotifLen => M}
      val w = L - M + 1
      s"""WITH ser AS (SELECT user_id, list(value ORDER BY ts, event_id)[1:$L] AS v
         |             FROM events GROUP BY user_id HAVING COUNT(*) >= $L),
         |w AS (SELECT user_id, v, unnest(generate_series(0, ${w - 1})) AS i FROM ser),
         |p AS (SELECT a.user_id, a.i, b.i AS j, a.v
         |      FROM w a JOIN w b ON a.user_id = b.user_id AND b.i >= a.i + $M),
         |dd AS (SELECT user_id, i, j,
         |         list_dot_product(v[i+1:i+$M], v[i+1:i+$M])
         |         + list_dot_product(v[j+1:j+$M], v[j+1:j+$M])
         |         - 2 * list_dot_product(v[i+1:i+$M], v[j+1:j+$M]) AS dist
         |       FROM p),
         |r AS (SELECT user_id, i, j, dist,
         |        row_number() OVER (PARTITION BY user_id ORDER BY dist, i, j) AS rk
         |      FROM dd)
         |SELECT user_id, CAST(i AS BIGINT) AS i, CAST(j AS BIGINT) AS j, dist
         |FROM r WHERE rk = 1""".stripMargin
    },
    // ts04 = integer-exact autocovariance: values quantize to cents, the
    // mean-centered covariance runs scale-free over integers (n·v − S
    // form), integer sums are order-independent — no fold pinning needed.
    "ts04_seasonality" -> {
      import TimeSeriesQueries.{MotifSeriesLen => N, AcfMaxLag => K}
      s"""WITH ser AS (SELECT user_id,
         |               list(CAST(round(value * 100) AS BIGINT) ORDER BY ts, event_id)[1:$N] AS v
         |             FROM events GROUP BY user_id HAVING COUNT(*) >= $N),
         |s AS (SELECT user_id, v, list_sum(v) AS sv FROM ser),
         |l AS (SELECT user_id, v, sv, unnest(generate_series(1, $K)) AS lag FROM s),
         |tt AS (SELECT user_id, lag, v, sv, unnest(generate_series(0, $N - 1 - lag)) AS t FROM l),
         |c AS (SELECT user_id, lag,
         |        CAST(SUM(($N * v[t + 1] - sv) * ($N * v[t + lag + 1] - sv)) AS BIGINT) AS cov
         |      FROM tt GROUP BY 1, 2),
         |r AS (SELECT user_id, lag, cov,
         |        row_number() OVER (PARTITION BY user_id ORDER BY cov DESC, lag) AS rk
         |      FROM c)
         |SELECT user_id, CAST(lag AS BIGINT) AS best_lag, cov AS best_cov
         |FROM r WHERE rk = 1""".stripMargin
    },
    // ts05 = integer-exact CUSUM: C(k) = n·prefix(k) − k·total over cents;
    // argmax |C| with ties to the smaller k — division-free, so both
    // engines compare identical integers.
    // ts06: best lag by (score DESC, |lag|, lag) over the PAA-word
    // candidate pairs; slices + dot folds identical on both engines
    "ts06_lead_lag" -> {
      import TimeSeriesQueries.{SeriesLen => L, PaaSegments => S, PaaSegLen => G,
        PaaBucket => W, XcorrMaxLag => M}
      val buckets = (0 until S).map { seg =>
        val terms = (1 to G).map(i => s"v[${seg * G + i}]").mkString(" + ")
        s"CAST(floor(($terms) / $G / $W) AS BIGINT) AS b$seg"
      }.mkString(",\n|        ")
      val joinCond = (0 until S).map(i => s"a.b$i = b.b$i").mkString(" AND ")
      s"""WITH ser AS (SELECT user_id, list(value ORDER BY ts, event_id)[1:$L] AS v
         |             FROM events GROUP BY user_id HAVING COUNT(*) >= $L),
         |w AS (SELECT user_id, v,
         |        $buckets
         |      FROM ser),
         |pairs AS (SELECT a.user_id AS a, b.user_id AS b, a.v AS av, b.v AS bv
         |          FROM w a JOIN w b ON $joinCond AND a.user_id < b.user_id),
         |lags AS (SELECT a, b, av, bv, unnest(generate_series(-$M, $M)) AS lag FROM pairs),
         |sc AS (SELECT a, b, lag,
         |         list_dot_product(
         |           av[1 + greatest(lag, 0) : greatest(lag, 0) + $L - abs(lag)],
         |           bv[1 + greatest(-lag, 0) : greatest(-lag, 0) + $L - abs(lag)]) AS score,
         |         CAST($L - abs(lag) AS BIGINT) AS overlap
         |       FROM lags),
         |r AS (SELECT a, b, lag, score, overlap,
         |        row_number() OVER (PARTITION BY a, b
         |          ORDER BY score DESC, abs(lag), lag) AS rk
         |      FROM sc)
         |SELECT a, b, CAST(lag AS BIGINT) AS best_lag, score AS best_score, overlap
         |FROM r WHERE rk = 1""".stripMargin
    },
    "ts05_change_point" -> {
      import TimeSeriesQueries.{MotifSeriesLen => N}
      s"""WITH ser AS (SELECT user_id,
         |               list(CAST(round(value * 100) AS BIGINT) ORDER BY ts, event_id)[1:$N] AS v
         |             FROM events GROUP BY user_id HAVING COUNT(*) >= $N),
         |e AS (SELECT user_id, unnest(v) AS x,
         |        unnest(generate_series(1, $N)) AS pos, list_sum(v) AS total
         |      FROM ser),
         |p AS (SELECT user_id, pos AS k,
         |        $N * SUM(x) OVER (PARTITION BY user_id ORDER BY pos) - pos * total AS c
         |      FROM e),
         |r AS (SELECT user_id, k, abs(c) AS ca, CASE WHEN c > 0 THEN 1 WHEN c < 0 THEN -1 ELSE 0 END AS sg,
         |        row_number() OVER (PARTITION BY user_id ORDER BY abs(c) DESC, k) AS rk
         |      FROM p WHERE k < $N)
         |SELECT user_id, CAST(k AS BIGINT) AS split_k,
         |       CAST(ca AS BIGINT) AS cusum_abs, CAST(sg AS BIGINT) AS shift_sign
         |FROM r WHERE rk = 1""".stripMargin
    },
    "w09_anomaly" -> {
      val n = RelationalQueries.AnomWin
      val t2 = RelationalQueries.AnomTau * RelationalQueries.AnomTau
      s"""WITH e AS (SELECT event_id, user_id, ts, epoch_us(ts) AS us,
         |             CAST(round(value * 100) AS BIGINT) AS v FROM events),
         |w AS (SELECT event_id, user_id, us, v,
         |        count(*) OVER win AS nw,
         |        CAST(sum(v) OVER win AS BIGINT) AS s1,
         |        CAST(sum(v * v) OVER win AS BIGINT) AS s2
         |      FROM e WINDOW win AS (PARTITION BY user_id ORDER BY ts, event_id
         |        ROWS BETWEEN ${n - 1} PRECEDING AND CURRENT ROW))
         |SELECT event_id, user_id, us, v,
         |       ($n * v - s1) * ($n * v - s1) AS dev2,
         |       $t2 * ($n * s2 - s1 * s1) AS bound
         |FROM w WHERE nw = $n
         |  AND ($n * v - s1) * ($n * v - s1) > $t2 * ($n * s2 - s1 * s1)""".stripMargin
    },
    // w10 oracle: the NAIVE window-join spelling (each (user, day) pair
    // joins every window start it falls in) — deliberately different from
    // the engine's delta decomposition, so the gate checks the rewrite.
    "w10_sliding_distinct" -> {
      val w = RelationalQueries.SlideWinDays
      s"""WITH e AS (SELECT user_id, epoch_us(ts) // 86400000000 AS day FROM events),
         |b AS (SELECT min(day) AS mn, max(day) AS mx FROM e),
         |g AS (SELECT unnest(generate_series(mn, mx)) AS ws FROM b),
         |u AS (SELECT DISTINCT user_id, day FROM e),
         |nu AS (SELECT g.ws, count(DISTINCT u.user_id) AS n_users
         |       FROM g JOIN u ON u.day >= g.ws AND u.day < g.ws + $w GROUP BY g.ws),
         |ne AS (SELECT g.ws, count(*) AS n_events
         |       FROM g JOIN e ON e.day >= g.ws AND e.day < g.ws + $w GROUP BY g.ws)
         |SELECT g.ws AS window_start_day,
         |       coalesce(nu.n_users, 0) AS n_users,
         |       coalesce(ne.n_events, 0) AS n_events
         |FROM g LEFT JOIN nu ON nu.ws = g.ws LEFT JOIN ne ON ne.ws = g.ws""".stripMargin
    },
    "t16_dsir_weights" -> {
      val b = TextQueries.DsirBuckets
      val tgt = TextQueries.DsirTargetLang
      val sc = TextQueries.DsirScale
      s"""WITH tk AS (SELECT doc_id, lang, $dToks AS t FROM documents),
         |g0 AS (SELECT doc_id, lang, t, unnest(generate_series(1, len(t) - 1)) AS i
         |       FROM tk WHERE len(t) >= 2),
         |g AS (SELECT doc_id, lang, substring(md5(t[i] || ' ' || t[i + 1]), 1, 2) AS b
         |      FROM g0),
         |m AS (SELECT b, CAST(count(*) AS BIGINT) AS cs,
         |        CAST(sum(CASE WHEN lang = '$tgt' THEN 1 ELSE 0 END) AS BIGINT) AS ct
         |      FROM g GROUP BY b),
         |tt AS (SELECT CAST(sum(cs) AS BIGINT) AS s_total,
         |         CAST(sum(ct) AS BIGINT) AS t_total FROM m),
         |q AS (SELECT b, CAST(floor(CAST($sc AS DOUBLE) *
         |        ((CAST(num AS DOUBLE) - CAST(den AS DOUBLE)) /
         |         (CAST(num AS DOUBLE) + CAST(den AS DOUBLE)))) AS BIGINT) AS qb
         |      FROM (SELECT b, (ct + 1) * (s_total + $b) AS num,
         |              (cs + 1) * (t_total + $b) AS den FROM m, tt))
         |SELECT doc_id, count(*) AS n_grams, CAST(sum(qb) AS BIGINT) AS dsir_score
         |FROM g JOIN q USING (b) GROUP BY doc_id""".stripMargin
    },
    // x08 oracle: the dominance anti-join over DISTINCT metric tuples
    // (dominance depends only on the tuple, and docs inherit their tuple's
    // skyline membership — proven row-identical to the naive doc-level
    // NOT EXISTS at sf0.01/sf0.1/sf1 before the swap; 1110 tuples vs 500k
    // docs at the 100x replica keeps the quadratic test trivial there).
    "x08_pareto_skyline" ->
      s"""WITH t AS (SELECT doc_id, $dToks AS toks FROM documents),
         |g2 AS (SELECT doc_id, array_to_string(toks[pos:pos + 1], ' ') AS gram
         |       FROM (SELECT doc_id, toks,
         |               unnest(generate_series(1, greatest(len(toks) - 1, 1))) AS pos FROM t)),
         |c2 AS (SELECT doc_id, gram, COUNT(*) AS cnt FROM g2 GROUP BY 1, 2),
         |a2 AS (SELECT doc_id, CAST(MAX(cnt) AS BIGINT) AS g2_max FROM c2 GROUP BY 1),
         |m AS (SELECT t.doc_id, CAST(len(toks) AS BIGINT) AS n_tokens,
         |        CAST(floor(1000000.0 * (CAST(len(list_distinct(toks)) AS DOUBLE) /
         |                                CAST(len(toks) AS DOUBLE))) AS BIGINT) AS ttr_fp,
         |        a2.g2_max
         |      FROM t JOIN a2 ON a2.doc_id = t.doc_id),
         |dm AS (SELECT DISTINCT n_tokens, ttr_fp, g2_max FROM m),
         |sky AS (SELECT n_tokens, ttr_fp, g2_max FROM dm a
         |        WHERE NOT EXISTS (
         |          SELECT 1 FROM dm x
         |          WHERE x.n_tokens >= a.n_tokens AND x.ttr_fp >= a.ttr_fp
         |            AND x.g2_max <= a.g2_max
         |            AND (x.n_tokens > a.n_tokens OR x.ttr_fp > a.ttr_fp
         |                 OR x.g2_max < a.g2_max)))
         |SELECT m.doc_id, m.n_tokens, m.ttr_fp, m.g2_max
         |FROM m JOIN sky USING (n_tokens, ttr_fp, g2_max)""".stripMargin,
    // g03 oracle: the peeling recurrence unrolled CoreMaxRounds times
    // (aggregation inside recursive CTEs is not expressible; the engine
    // REQUIRES its fixpoint lands within the same bound, so a_R is the
    // core). MATERIALIZED pins every multiply-referenced CTE — the s11
    // exponential-inlining lesson.
    "g03_kcore" -> {
      val k = TextQueries.CoreK
      val rounds = (1 to TextQueries.CoreMaxRounds).map { i =>
        s"""d$i AS MATERIALIZED (SELECT e.x AS doc_id, count(*) AS dg FROM e
           |  JOIN a${i - 1} ax ON ax.doc_id = e.x
           |  JOIN a${i - 1} ay ON ay.doc_id = e.y GROUP BY e.x),
           |a$i AS MATERIALIZED (SELECT doc_id FROM d$i WHERE dg >= $k)""".stripMargin
      }.mkString(",\n")
      val last = s"a${TextQueries.CoreMaxRounds}"
      s"""WITH sig AS MATERIALIZED ($minHashSigSql),
         |p AS MATERIALIZED (SELECT a.doc_id AS a, b.doc_id AS b FROM sig a JOIN sig b
         |     ON a.band0 = b.band0 AND a.band1 = b.band1 AND a.doc_id < b.doc_id),
         |e AS MATERIALIZED (SELECT a AS x, b AS y FROM p UNION ALL SELECT b, a FROM p),
         |a0 AS MATERIALIZED (SELECT DISTINCT x AS doc_id FROM e),
         |$rounds
         |SELECT e.x AS doc_id, CAST(count(*) AS BIGINT) AS core_degree FROM e
         |  JOIN $last ax ON ax.doc_id = e.x
         |  JOIN $last ay ON ay.doc_id = e.y GROUP BY e.x""".stripMargin
    },
    // g04 oracle: the synchronous mode-relabeling unrolled exactly
    // LpaRounds times — per round, neighbor-label counts then a
    // row_number arg-max over SCALAR rows (cnt DESC, label ASC), the
    // d13/ts08 no-payload-through-windows lesson. MATERIALIZED pins the
    // multiply-referenced sig/e/l$i chain (the s11 inlining lesson).
    "g04_label_prop" -> {
      val rounds = (1 to TextQueries.LpaRounds).map { i =>
        s"""c$i AS MATERIALIZED (SELECT e.x, l.label, count(*) AS cnt
           |  FROM e JOIN l${i - 1} l ON l.doc_id = e.y GROUP BY e.x, l.label),
           |l$i AS MATERIALIZED (SELECT x AS doc_id, label FROM (
           |  SELECT x, label, row_number() OVER (PARTITION BY x
           |    ORDER BY cnt DESC, label ASC) AS rk FROM c$i) WHERE rk = 1)""".stripMargin
      }.mkString(",\n")
      val last = s"l${TextQueries.LpaRounds}"
      s"""WITH sig AS MATERIALIZED ($minHashSigSql),
         |p AS MATERIALIZED (SELECT a.doc_id AS a, b.doc_id AS b FROM sig a JOIN sig b
         |     ON a.band0 = b.band0 AND a.band1 = b.band1 AND a.doc_id < b.doc_id),
         |e AS MATERIALIZED (SELECT a AS x, b AS y FROM p UNION ALL SELECT b, a FROM p),
         |l0 AS MATERIALIZED (SELECT DISTINCT x AS doc_id, x AS label FROM e),
         |$rounds,
         |sz AS MATERIALIZED (SELECT label AS community, count(*) AS comm_size
         |     FROM $last GROUP BY label)
         |SELECT l.doc_id, l.label AS community, sz.comm_size
         |FROM $last l JOIN sz ON sz.community = l.label""".stripMargin
    },
    // ts09 oracle: the identical 16-lag chain — integer numerator and
    // renormalizing denominator, one double division at the end.
    "ts09_ewma_smooth" -> {
      val dpt = TimeSeriesQueries.EwmaDepth
      val lags = (1 until dpt).map(k => s"lag(v, $k) OVER win AS l$k").mkString(", ")
      val num = (s"v * ${1L << (dpt - 1)}" +:
        (1 until dpt).map(k => s"coalesce(l$k * ${1L << (dpt - 1 - k)}, 0)")).mkString(" + ")
      val den = (s"${1L << (dpt - 1)}" +:
        (1 until dpt).map(k =>
          s"CASE WHEN l$k IS NULL THEN 0 ELSE ${1L << (dpt - 1 - k)} END")).mkString(" + ")
      s"""WITH e AS (SELECT event_id, user_id, epoch_us(ts) AS us, ts,
         |             CAST(round(value * 100) AS BIGINT) AS v FROM events),
         |l AS (SELECT event_id, user_id, us, v, $lags
         |      FROM e WINDOW win AS (PARTITION BY user_id ORDER BY ts, event_id)),
         |f AS (SELECT event_id, user_id, us, v,
         |        CAST($num AS BIGINT) AS ewma_num,
         |        CAST($den AS BIGINT) AS ewma_den FROM l)
         |SELECT event_id, user_id, us, v, ewma_num, ewma_den,
         |       CAST(ewma_num AS DOUBLE) / CAST(ewma_den AS DOUBLE) AS ewma_cents
         |FROM f""".stripMargin
    },
    // x09 oracle: Hamilton's method spelled directly — integer floor
    // quotas + largest remainders take the leftover seats; md5-rank prefix
    // per stratum.
    "x09_eval_apportion" -> {
      val dn = TextQueries.EvalDenom
      s"""WITH st AS (SELECT source, lang, CAST(count(*) AS BIGINT) AS n
         |            FROM documents GROUP BY 1, 2),
         |tt AS (SELECT CAST(sum(n) AS BIGINT) AS nn,
         |         CAST(sum(n) // $dn AS BIGINT) AS b FROM st),
         |q0 AS (SELECT source, lang, n, (b * n) // nn AS base, (b * n) % nn AS rem
         |       FROM st, tt),
         |xt AS (SELECT CAST((SELECT b FROM tt) - sum(base) AS BIGINT) AS extra FROM q0),
         |r AS (SELECT source, lang, base,
         |        row_number() OVER (ORDER BY rem DESC, source, lang) AS rr FROM q0),
         |q AS (SELECT source, lang,
         |        CAST(base + CASE WHEN rr <= (SELECT extra FROM xt) THEN 1 ELSE 0 END
         |             AS BIGINT) AS quota FROM r),
         |h AS (SELECT doc_id, source, lang, md5(CAST(doc_id AS VARCHAR)) AS h
         |      FROM documents),
         |rk AS (SELECT doc_id, source, lang,
         |         CAST(row_number() OVER (PARTITION BY source, lang ORDER BY h, doc_id)
         |              AS BIGINT) AS rk FROM h)
         |SELECT rk.doc_id, rk.source, rk.lang, rk.rk, q.quota
         |FROM rk JOIN q USING (source, lang) WHERE rk.rk <= q.quota""".stripMargin
    },
    // m09 oracle: every sample re-derived from the closed form (the m05
    // frame CTE), identical integer threshold, identical islands identity.
    "m09_voice_activity" -> {
      import MultimodalQueries.{M03Samples => N, M09VadThreshold => Thr}
      s"""WITH smp AS (SELECT doc_id, unnest(generate_series(0, ${N - 1})) AS t FROM documents),
         |v AS (SELECT doc_id, t, t // 512 AS frame_idx,
         |        ((doc_id*31 + t*17) % 4001) - 2000 AS s FROM smp),
         |f AS (SELECT doc_id, CAST(frame_idx AS BIGINT) AS frame_idx,
         |        CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(s * s) AS BIGINT) AS e
         |      FROM v GROUP BY 1, 2),
         |a AS (SELECT doc_id, frame_idx, e >= n * $Thr AS active FROM f),
         |i AS (SELECT doc_id, frame_idx,
         |        frame_idx - row_number() OVER (PARTITION BY doc_id ORDER BY frame_idx) AS isl
         |      FROM a WHERE active),
         |sg AS (SELECT doc_id, isl, COUNT(*) AS seg_len FROM i GROUP BY 1, 2),
         |segs AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_segments,
         |           CAST(MAX(seg_len) AS BIGINT) AS longest_segment FROM sg GROUP BY 1),
         |per AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_active,
         |          CAST(MIN(frame_idx) AS BIGINT) AS first_active,
         |          CAST(MAX(frame_idx) AS BIGINT) AS last_active FROM i GROUP BY 1),
         |nf AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_frames FROM a GROUP BY 1)
         |SELECT nf.doc_id, nf.n_frames,
         |       coalesce(per.n_active, 0) AS n_active,
         |       coalesce(segs.n_segments, 0) AS n_segments,
         |       coalesce(segs.longest_segment, 0) AS longest_segment,
         |       coalesce(per.first_active, -1) AS first_active,
         |       coalesce(per.last_active, -1) AS last_active
         |FROM nf LEFT JOIN per ON per.doc_id = nf.doc_id
         |LEFT JOIN segs ON segs.doc_id = nf.doc_id""".stripMargin
    },
    // w11 oracle: the identical carry-forward windows (IGNORE NULLS over a
    // strictly-preceding frame) and the identical lookback rule.
    "w11_attribution" -> {
      val lb = RelationalQueries.AttribLookbackUs
      s"""WITH e AS (SELECT event_id, user_id, epoch_us(ts) AS us, event_type,
         |             CAST(round(value * 100) AS BIGINT) AS v FROM events),
         |c AS (SELECT event_id, user_id, us, event_type, v,
         |        last_value(CASE WHEN event_type IN ('click', 'view') THEN us END
         |                   IGNORE NULLS) OVER win AS t_us,
         |        last_value(CASE WHEN event_type IN ('click', 'view') THEN event_id END
         |                   IGNORE NULLS) OVER win AS t_id,
         |        last_value(CASE WHEN event_type IN ('click', 'view') THEN event_type END
         |                   IGNORE NULLS) OVER win AS t_type
         |      FROM e WINDOW win AS (PARTITION BY user_id ORDER BY us, event_id
         |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING))
         |SELECT event_id AS purchase_id, user_id, us, v AS credit_cents,
         |       CASE WHEN t_us IS NOT NULL AND us - t_us <= $lb
         |            THEN t_id ELSE -1 END AS touch_id,
         |       CASE WHEN t_us IS NOT NULL AND us - t_us <= $lb
         |            THEN t_type ELSE 'direct' END AS touch_type,
         |       CASE WHEN t_us IS NOT NULL AND us - t_us <= $lb
         |            THEN us - t_us ELSE -1 END AS gap_us
         |FROM c WHERE event_type = 'purchase'""".stripMargin
    },
    "ts07_downsample" -> {
      val w = TimeSeriesQueries.DownsampleBucket
      s"""WITH e AS (SELECT user_id, ts, event_id, epoch_us(ts) AS us,
         |             CAST(round(value * 100) AS BIGINT) AS y FROM events),
         |b AS (SELECT user_id, event_id, y,
         |        CAST(row_number() OVER w AS BIGINT) AS idx,
         |        count(*) OVER (PARTITION BY user_id) AS n,
         |        (us - min(us) OVER (PARTITION BY user_id)) // 1000000 AS x
         |      FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
         |c AS (SELECT *, lag(x) OVER w AS xp, lag(y) OVER w AS yp,
         |        lead(x) OVER w AS xn, lead(y) OVER w AS yn
         |      FROM b WINDOW w AS (PARTITION BY user_id ORDER BY idx)),
         |g AS (SELECT *, idx > 1 AND idx < n AS interior,
         |        abs((xp - xn) * (y - yp) - (xp - x) * (yn - yp)) AS area2,
         |        CASE WHEN idx > 1 AND idx < n THEN (idx - 2) // $w ELSE -1 END AS bucket
         |      FROM c),
         |r AS (SELECT *, row_number()
         |        OVER (PARTITION BY user_id, bucket ORDER BY area2 DESC, idx) AS rn
         |      FROM g)
         |SELECT user_id, idx, x AS x_s, y AS v100,
         |       CASE WHEN interior THEN area2 ELSE 0 END AS area2
         |FROM r WHERE idx = 1 OR idx = n OR (interior AND rn = 1)""".stripMargin
    },
    "s13_mmr_rerank" -> s13Sql,
    "d15_containment" -> {
      val t = TextQueries.ContainThreshold
      s"""WITH pairs AS MATERIALIZED ($minHashPairsSql),
         |tk AS (SELECT doc_id, list_distinct($dToks) AS t FROM documents),
         |pos AS MATERIALIZED (SELECT doc_id, list_distinct(list_transform(t, tok -> $hashPosSql)) AS ps
         |        FROM tk WHERE len(t) > 0),
         |j AS (SELECT p.a, p.b, len(list_intersect(pa.ps, pb.ps)) AS inter,
         |             len(pa.ps) AS na, len(pb.ps) AS nb
         |      FROM pairs p JOIN pos pa ON pa.doc_id = p.a JOIN pos pb ON pb.doc_id = p.b),
         |c AS (SELECT a, b, CAST(inter AS DOUBLE) / na AS c_a_in_b,
         |             CAST(inter AS DOUBLE) / nb AS c_b_in_a
         |      FROM j)
         |SELECT a, b, c_a_in_b, c_b_in_a,
         |       CASE WHEN c_a_in_b >= $t AND c_b_in_a >= $t THEN 'mutual'
         |            WHEN c_a_in_b >= $t THEN 'a_in_b'
         |            ELSE 'b_in_a' END AS relation
         |FROM c WHERE c_a_in_b >= $t OR c_b_in_a >= $t""".stripMargin
    },
    // open/close are arg-min/arg-max of v by (us, event_id). The obvious
    // struct-min/max spelling (min({'u','e','v'})) is quadratic-memory in
    // DuckDB 1.0's grouped hash aggregate at 10M input rows (OOM-killed at
    // the 100x replica); row_number windows over scalar payloads are
    // sort-based and bounded — proven row-identical to the struct form at
    // sf0.01/sf0.1/sf1 before the swap.
    "ts08_ohlc_bars" ->
      """WITH e AS (SELECT user_id, epoch_us(ts) AS us, event_id,
        |             CAST(round(value * 100) AS BIGINT) AS v FROM events),
        |r AS (SELECT user_id, us // 3600000000 AS hour, us, event_id, v,
        |        row_number() OVER (PARTITION BY user_id, us // 3600000000
        |                           ORDER BY us, event_id) AS rn_a,
        |        row_number() OVER (PARTITION BY user_id, us // 3600000000
        |                           ORDER BY us DESC, event_id DESC) AS rn_d
        |      FROM e)
        |SELECT user_id, hour,
        |       max(CASE WHEN rn_a = 1 THEN v END) AS open,
        |       max(v) AS high, min(v) AS low,
        |       max(CASE WHEN rn_d = 1 THEN v END) AS close,
        |       count(*) AS n_events, CAST(sum(v) AS BIGINT) AS v_sum
        |FROM r GROUP BY user_id, hour""".stripMargin,
    "x07_split_leakage" ->
      s"""WITH dup AS MATERIALIZED ($d06Sql),
         |sp AS (SELECT doc_id,
         |         ${TextQueries.splitCaseSql("md5(CAST(doc_id AS VARCHAR))")} AS split
         |       FROM documents)
         |SELECT least(sa.split, sb.split) AS split_lo,
         |       greatest(sa.split, sb.split) AS split_hi,
         |       count(*) AS n_pairs,
         |       least(sa.split, sb.split) != greatest(sa.split, sb.split) AS cross_split
         |FROM dup JOIN sp sa ON sa.doc_id = dup.a JOIN sp sb ON sb.doc_id = dup.b
         |GROUP BY 1, 2""".stripMargin,
  )

  /** s13 oracle: the greedy MMR loop unrolled into [[SimilarityQueries.MmrK]]
    * chained CTE rounds — each round scores the not-yet-selected candidates
    * (rel − max integer-dot to the selected set), struct-max picks the
    * argmax with the (score DESC, cand_id ASC) tie-break, and the pick is
    * joined back to the pool to recover its vector for the next round.
    * MATERIALIZED hints keep DuckDB from re-inlining the multiply-referenced
    * pool/selection CTEs (exponential otherwise), and the top-C window runs
    * over SCALAR (query, cand, rel) rows — vectors rejoin after the cut, so
    * no list payload is dragged through a window (the d13-lesson pattern
    * that keeps this oracle tractable at the 100× replica). Integer dots
    * ≤ ~1.8e7 are double-exact, so `list_dot_product` over DOUBLE-cast
    * lists equals Spark's long fold bit-for-bit. */
  private def s13Sql: String = {
    val q = SimilarityQueries.MmrQueries
    val c = SimilarityQueries.MmrCand
    val k = SimilarityQueries.MmrK
    val sb = new StringBuilder
    sb ++= s"""WITH iv AS MATERIALIZED (SELECT vec_id,
              |  list_transform(embedding, e -> CAST(round(e * 1000) AS BIGINT)) AS q
              |  FROM embeddings),
              |qs AS MATERIALIZED (SELECT vec_id AS query_id, q AS qv FROM iv WHERE vec_id < $q),
              |rl AS MATERIALIZED (
              |  SELECT query_id, c.vec_id AS cand_id,
              |         CAST(list_dot_product(qv::DOUBLE[], c.q::DOUBLE[]) AS BIGINT) AS rel
              |  FROM qs, iv c WHERE c.vec_id <> qs.query_id),
              |ck AS MATERIALIZED (
              |  SELECT query_id, cand_id, rel FROM (
              |    SELECT *, row_number() OVER (PARTITION BY query_id
              |      ORDER BY rel DESC, cand_id) AS rk FROM rl)
              |  WHERE rk <= $c),
              |cand AS MATERIALIZED (
              |  SELECT ck.query_id, ck.cand_id, ck.rel, iv.q AS cv
              |  FROM ck JOIN iv ON iv.vec_id = ck.cand_id),
              |p1 AS MATERIALIZED (
              |  SELECT query_id, max({'s': rel, 'ni': -cand_id, 'id': cand_id}) AS m
              |  FROM cand GROUP BY query_id),
              |all1 AS MATERIALIZED (
              |  SELECT c.query_id, CAST(1 AS BIGINT) AS pick, c.cand_id, c.rel,
              |         c.rel AS score, c.cv
              |  FROM cand c JOIN p1 ON p1.query_id = c.query_id
              |    AND struct_extract(p1.m, 'id') = c.cand_id)""".stripMargin
    for (i <- 2 to k) {
      val prev = s"all${i - 1}"
      sb ++= s""",
                |sc$i AS MATERIALIZED (
                |  SELECT c.query_id, c.cand_id, c.rel,
                |    c.rel - max(CAST(list_dot_product(c.cv::DOUBLE[], s.cv::DOUBLE[]) AS BIGINT)) AS score
                |  FROM cand c JOIN $prev s ON s.query_id = c.query_id
                |  WHERE NOT EXISTS (SELECT 1 FROM $prev a
                |    WHERE a.query_id = c.query_id AND a.cand_id = c.cand_id)
                |  GROUP BY c.query_id, c.cand_id, c.rel),
                |p$i AS MATERIALIZED (
                |  SELECT query_id, max({'s': score, 'ni': -cand_id, 'id': cand_id}) AS m
                |  FROM sc$i GROUP BY query_id),
                |all$i AS MATERIALIZED (
                |  SELECT * FROM $prev
                |  UNION ALL
                |  SELECT c.query_id, CAST($i AS BIGINT) AS pick, c.cand_id, c.rel,
                |         CAST(struct_extract(p$i.m, 's') AS BIGINT) AS score, c.cv
                |  FROM cand c JOIN p$i ON p$i.query_id = c.query_id
                |    AND struct_extract(p$i.m, 'id') = c.cand_id)""".stripMargin
    }
    sb ++= s"\nSELECT query_id, pick, cand_id, rel, score FROM all$k"
    sb.toString
  }

  /** DuckDB mirror of [[graft.plans.TokensToHashBitset]]'s bit index: the
    * first 5 hex digits of md5(tok) as a base-16 integer, mod HashBits —
    * spelled as hex-digit arithmetic (DuckDB 1.0 has no base-16 conv). */
  private def hashPosSql: String = {
    val digits = (0 until 5).map { i =>
      val weight = 1 << (4 * (4 - i))
      s"(strpos('0123456789abcdef', substring(md5(tok), ${i + 1}, 1)) - 1) * $weight"
    }.mkString(" + ")
    s"($digits) % ${TextQueries.HashBits}"
  }

  /** Shared oracle fragments (also composed into p01_clean_corpus). */
  /** d06's verified near-dup pair SQL — also composed into x07's
    * split-leakage audit. Bit = first-5-hex-digits of md5(token) mod
    * HashBits; the oracle computes the identical function on position
    * SETS (popcount of AND/OR == intersection/union of distinct hashed
    * positions). */
  private def d06Sql: String =
    s"""WITH pairs AS MATERIALIZED ($minHashPairsSql),
       |tk AS (SELECT doc_id, list_distinct($dToks) AS t FROM documents),
       |pos AS MATERIALIZED (SELECT doc_id, list_distinct(list_transform(t, tok -> $hashPosSql)) AS ps FROM tk),
       |j AS (SELECT p.a, p.b, len(list_intersect(pa.ps, pb.ps)) AS inter,
       |             len(pa.ps) AS na, len(pb.ps) AS nb
       |      FROM pairs p JOIN pos pa ON pa.doc_id = p.a JOIN pos pb ON pb.doc_id = p.b)
       |SELECT a, b, CAST(inter AS DOUBLE) / (na + nb - inter) AS jaccard
       |FROM j WHERE CAST(inter AS DOUBLE) / (na + nb - inter) >= ${TextQueries.JaccardThreshold}""".stripMargin

  private def d08Sql: String =
    s"""WITH t AS (SELECT doc_id, $dToks AS toks FROM documents),
       |g AS (SELECT doc_id,
       |        array_to_string(toks[pos:pos + ${TextQueries.DecontamN - 1}], ' ') AS gram
       |      FROM (SELECT doc_id, toks,
       |              unnest(generate_series(1, greatest(len(toks) - ${TextQueries.DecontamN - 1}, 1))) AS pos
       |            FROM t)),
       |b AS (SELECT DISTINCT gram FROM g WHERE doc_id % ${TextQueries.BenchmarkMod} = 0),
       |c AS (SELECT DISTINCT doc_id, gram FROM g WHERE doc_id % ${TextQueries.BenchmarkMod} <> 0)
       |SELECT c.doc_id, COUNT(*) AS n_overlap,
       |       COUNT(*) >= ${TextQueries.ContamMin} AS contaminated
       |FROM c JOIN b USING (gram) GROUP BY c.doc_id""".stripMargin

  private def t02Sql: String =
    s"""WITH t AS (SELECT doc_id, CAST(length(text) AS BIGINT) AS n_chars_txt, $dToks AS toks FROM documents),
       |c AS (SELECT doc_id, n_chars_txt, len(toks) AS n_tokens, len(list_distinct(toks)) AS n_distinct,
       |        ${dStop(TextQueries.StopEn)} AS n_stop,
       |        CAST(list_sum(list_transform(toks, x -> length(x))) AS BIGINT) AS sum_tok_len
       |      FROM t)
       |SELECT doc_id, n_chars_txt, n_tokens, n_distinct, n_stop, sum_tok_len,
       | CAST(n_distinct AS DOUBLE) / n_tokens AS ttr,
       | CAST(n_stop AS DOUBLE) / n_tokens AS stop_ratio,
       | CAST(sum_tok_len AS DOUBLE) / n_tokens AS avg_tok_len
       |FROM c""".stripMargin

  private def t03Sql: String =
    s"""WITH t AS (SELECT doc_id, lang, $dToks AS toks FROM documents),
       |h AS (SELECT doc_id, lang,
       |        ${dStop(TextQueries.StopEn)} AS en_hits, ${dStop(TextQueries.StopDe)} AS de_hits,
       |        ${dStop(TextQueries.StopFr)} AS fr_hits, ${dStop(TextQueries.StopEs)} AS es_hits
       |      FROM t)
       |SELECT doc_id, lang, en_hits, de_hits, fr_hits, es_hits,
       | CASE WHEN en_hits >= de_hits AND en_hits >= fr_hits AND en_hits >= es_hits THEN 'en'
       |      WHEN de_hits >= fr_hits AND de_hits >= es_hits THEN 'de'
       |      WHEN fr_hits >= es_hits THEN 'fr'
       |      ELSE 'es' END AS pred_lang
       |FROM h""".stripMargin

  /** The d07 component computation as a reusable CTE chain (recursive
    * closure over the LSH candidate graph, min-id representative) —
    * composed by d07Sql and by t14's cluster-keyed split. */
  private def d07Ctes: String =
    s"""pairs AS ($minHashPairsSql),
       |edges AS (SELECT a AS x, b AS y FROM pairs UNION ALL SELECT b, a FROM pairs),
       |reach(src, dst) AS (
       |  SELECT doc_id, doc_id FROM documents
       |  UNION
       |  SELECT r.src, e.y FROM reach r JOIN edges e ON e.x = r.dst),
       |clusters AS (SELECT src AS doc_id, min(dst) AS cluster_rep FROM reach GROUP BY src)""".stripMargin

  private def d07Sql: String =
    s"""WITH RECURSIVE $d07Ctes
       |SELECT doc_id, cluster_rep FROM clusters""".stripMargin

  /** DuckDB mirror of [[graft.queries.TextQueries.g01PageRank]]: the same
    * integer fixed-point recurrence unrolled PrIters times. */
  private def pageRankSql: String = {
    val S = TextQueries.PrScale
    val body = (1 to TextQueries.PrIters).map { i =>
      s"""c$i AS (SELECT e.dst, SUM(r${i - 1}.r // dg.deg) AS s
         |      FROM edges e JOIN r${i - 1} ON e.src = r${i - 1}.doc_id
         |      JOIN deg dg ON e.src = dg.src GROUP BY e.dst),
         |r$i AS (SELECT n.doc_id,
         |          CAST((15 * $S) // 100 + (85 * coalesce(c$i.s, 0)) // 100 AS BIGINT) AS r
         |        FROM n LEFT JOIN c$i ON n.doc_id = c$i.dst)""".stripMargin
    }.mkString(",\n")
    s"""WITH pairs AS ($minHashPairsSql),
       |edges AS (SELECT a AS src, b AS dst FROM pairs UNION ALL SELECT b, a FROM pairs),
       |deg AS (SELECT src, count(*) AS deg FROM edges GROUP BY src),
       |n AS (SELECT doc_id FROM documents),
       |r0 AS (SELECT doc_id, CAST($S AS BIGINT) AS r FROM n),
       |$body
       |SELECT doc_id, r FROM r${TextQueries.PrIters}""".stripMargin
  }

  /** DuckDB mirror of [[graft.queries.TextQueries.d04SimHash]] — shared by
    * the d04 oracle and d09's all-pairs Hamming verification. */
  private def simhashSql: String =
    s"""WITH toks AS (SELECT doc_id, unnest($dToks) AS tok FROM documents),
       |h AS (SELECT doc_id, md5(tok) AS h FROM toks),
       |b AS (SELECT doc_id, ${TextQueries.simhashBitExprs("//", "strpos").mkString(",\n       |  ")}
       |      FROM h GROUP BY doc_id)
       |SELECT doc_id, CAST(${TextQueries.simhashAssembleExpr} AS BIGINT) AS simhash FROM b""".stripMargin

  /** DuckDB mirror of [[graft.queries.TextQueries.d03MinHashPairs]].
    * MATERIALIZED hints only (identical semantics): `sig` is referenced
    * twice by `bands`, and the pairs relation is itself multiply-referenced
    * by the d06/d15/x07 oracles — without the hints DuckDB re-inlines the
    * whole shingle→md5→min pipeline per reference (the s11 exponential-
    * inlining failure), which is what made this family look intractable at
    * the 100× replica. */
  private def minHashPairsSql: String =
    s"""WITH sig AS MATERIALIZED ($minHashSigSql),
       |bands AS MATERIALIZED (SELECT doc_id, band0 AS band FROM sig UNION ALL SELECT doc_id, band1 FROM sig)
       |SELECT DISTINCT a.doc_id AS a, b.doc_id AS b
       |FROM bands a JOIN bands b ON a.band = b.band AND a.doc_id < b.doc_id""".stripMargin

  /** DuckDB mirror of [[graft.queries.TextQueries.d02MinHashSig]]: k 32-bit
    * hash functions as disjoint 8-hex slices of one md5 per shingle. */
  private def minHashSigSql: String = {
    // 8 slices from TWO digests per shingle (second salted with '!'),
    // mirroring d02From's kernel exactly; bands of 4 hashes each
    val mins = ((0 until 4).map(i => s"min(substring(m, ${i * 8 + 1}, 8)) AS h$i") ++
      (0 until 4).map(i => s"min(substring(m2, ${i * 8 + 1}, 8)) AS h${i + 4}")).mkString(", ")
    s"""WITH n AS (SELECT doc_id, $dNorm AS norm FROM documents),
       |sh0 AS (SELECT doc_id, norm,
       |          unnest(generate_series(1, greatest(length(norm) - ${TextQueries.ShingleSize - 1}, 1))) AS pos
       |        FROM n),
       |sh AS (SELECT doc_id, md5(substring(norm, pos, ${TextQueries.ShingleSize})) AS m,
       |              md5(substring(norm, pos, ${TextQueries.ShingleSize}) || '!') AS m2 FROM sh0),
       |sig AS (SELECT doc_id, $mins FROM sh GROUP BY doc_id)
       |SELECT doc_id, h0, h1, h2, h3, h4, h5, h6, h7,
       |       md5(h0 || h1 || h2 || h3) AS band0, md5(h4 || h5 || h6 || h7) AS band1 FROM sig""".stripMargin
  }
}
