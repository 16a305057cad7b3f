package graft.catalog

/** DuckDB oracle SQL for the text-analysis, sampling and pipeline query family —
  * split out of [[graft.SparkEntry]] (round 11) so the catalog stays
  * reviewable as it grows. Keys map 1:1 to `SparkEntry.queries`;
  * bodies are byte-identical to the pre-split map (CatalogDump-diffed).
  */
private[graft] object TextOracles {

  /** Shared by `text_domain_mix` and `text_domain_mix_scale` (the scale twin
    * consumes it projected to (doc_id, lang, kept): computing a global
    * `mix_rank` for EVERY row is inherently a full per-language ranking —
    * selection needs only the kept flag).
    */
  private val DomainMixOracle: String =
    """WITH d AS (
      | SELECT doc_id, lang,
      |  list_reduce(list_transform(string_split(coalesce(text, ''), ''), c -> CAST(ascii(c) AS BIGINT)),
      |    (acc, x) -> (acc * 43 + x) % 1000000007) AS h
      | FROM documents),
      |cap AS (SELECT min(n) AS cap FROM (SELECT count(*) AS n FROM d GROUP BY lang)),
      |r AS (SELECT doc_id, lang,
      |  CAST(row_number() OVER (PARTITION BY lang ORDER BY h, doc_id) AS BIGINT) AS mix_rank
      | FROM d)
      |SELECT doc_id, lang, mix_rank, mix_rank <= cap AS kept FROM r, cap""".stripMargin


  /** Gopher rule battery ground truth — shared by `text_gopher_rules`,
    * the composed `pipeline_c4` chain, and `text_source_stats`.
    */
  private val GopherOracle: String =
    """WITH g AS (
        | SELECT doc_id,
        |  CAST(len(regexp_split_to_array(trim(text), '\s+')) AS BIGINT) AS n_words,
        |  CAST(list_sum(list_transform(regexp_split_to_array(trim(text), '\s+'),
        |    t -> len(t))) AS BIGINT) AS sum_word_chars,
        |  CAST(len(regexp_extract_all(text, '#|\.\.\.')) AS BIGINT) AS n_symbols,
        |  CAST(len(string_split(text, chr(10))) AS BIGINT) AS n_lines,
        |  CAST(len(list_filter(string_split(text, chr(10)),
        |    l -> regexp_matches(ltrim(l), '^[-*]'))) AS BIGINT) AS n_bullet_lines,
        |  CAST(len(list_filter(string_split(text, chr(10)),
        |    l -> rtrim(l) LIKE '%...')) AS BIGINT) AS n_ellipsis_lines,
        |  CAST(len(list_filter(regexp_split_to_array(trim(text), '\s+'),
        |    t -> list_contains(['the','a','an','and','or','of','to','in','is','it','on','for','with','as','at'], lower(t)))) AS BIGINT) AS n_stopword_hits,
        |  CAST(len(list_filter(regexp_split_to_array(trim(text), '\s+'),
        |    t -> regexp_matches(t, '[a-zA-Z]'))) AS BIGINT) AS n_alpha_words
        | FROM documents)
        |SELECT *,
        | (rule_word_count AND rule_mean_word_len AND rule_symbol_ratio AND
        |  rule_bullet_lines AND rule_ellipsis_lines AND rule_stopwords AND
        |  rule_alpha_words) AS keep
        |FROM (
        | SELECT *,
        |  n_words >= 50 AND n_words <= 100000 AS rule_word_count,
        |  sum_word_chars >= n_words * 3 AND sum_word_chars <= n_words * 10 AS rule_mean_word_len,
        |  n_symbols * 10 <= n_words AS rule_symbol_ratio,
        |  n_bullet_lines * 10 <= n_lines * 9 AS rule_bullet_lines,
        |  n_ellipsis_lines * 10 <= n_lines * 3 AS rule_ellipsis_lines,
        |  n_stopword_hits >= 2 AS rule_stopwords,
        |  n_alpha_words * 5 >= n_words * 4 AS rule_alpha_words
        | FROM g)""".stripMargin


  /** Shared by `text_dsir` and the composed `pipeline_dsir` (which selects
    * on top of these exact weights), so the two rows cannot drift.
    */
  /** Exact corpus-self-trained bigram-LM cross-entropy (micro-nats). */
  private val LmXentOracle: String =
    """WITH t AS (SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS w FROM documents),
      |v AS (SELECT count(DISTINCT tok) AS vocab FROM (SELECT unnest(w) AS tok FROM t)),
      |b AS (
      | SELECT doc_id, unnest(list_transform(range(1, len(w)),
      |   i -> [w[CAST(i AS INTEGER)], w[CAST(i AS INTEGER) + 1]])) AS bg
      | FROM t WHERE len(w) >= 2),
      |bb AS (SELECT doc_id, bg[1] AS prev, bg[1] || ' ' || bg[2] AS bigram FROM b),
      |cp AS (SELECT bigram, count(*) AS c_pair FROM bb GROUP BY 1),
      |cx AS (SELECT prev, count(*) AS c_prev FROM bb GROUP BY 1),
      |cost AS (
      | SELECT bb.doc_id,
      |  CAST(round(ln((cp.c_pair + 1.0) / (cx.c_prev + v.vocab)) * 1000000) AS BIGINT) AS c
      | FROM bb JOIN cp USING (bigram) JOIN cx USING (prev) CROSS JOIN v)
      |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
      | CAST((-sum(c)) // count(*) AS BIGINT) AS xent_micronats
      |FROM cost GROUP BY doc_id""".stripMargin


  /** The pruned-LM twin: top-8 successors per context by (count desc,
    * 60-bit fingerprint asc) — the fingerprint (mirroring
    * `Portable.polyHash60Native`: base-31 mod 1e9+7 shifted by 2^30,
    * plus base-37 mod 998244353 low bits) exists ONLY to replicate
    * `graft_topk`'s id tie-break; pruned occurrences cost the add-one
    * backoff `ln(1/(c_prev+V))`. K = 16 mirrors the Spark default.
    */
  private val LmXentPrunedOracle: String =
    """WITH t AS (SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS w FROM documents),
      |v AS (SELECT count(DISTINCT tok) AS vocab FROM (SELECT unnest(w) AS tok FROM t)),
      |b AS (
      | SELECT doc_id, unnest(list_transform(range(1, len(w)),
      |   i -> [w[CAST(i AS INTEGER)], w[CAST(i AS INTEGER) + 1]])) AS bg
      | FROM t WHERE len(w) >= 2),
      |bb AS (SELECT doc_id, bg[1] AS prev, bg[1] || ' ' || bg[2] AS bigram FROM b),
      |cp AS (SELECT bigram, min(prev) AS prev, count(*) AS c_pair FROM bb GROUP BY 1),
      |cx AS (SELECT prev, count(*) AS c_prev FROM bb GROUP BY 1),
      |fp AS (
      | SELECT bigram,
      |  (list_reduce(list_transform(string_split(bigram, ''), c -> CAST(ascii(c) AS BIGINT)),
      |     (acc, x) -> (acc * 31 + x) % 1000000007) * 1073741824)
      |  + (list_reduce(list_transform(string_split(bigram, ''), c -> CAST(ascii(c) AS BIGINT)),
      |     (acc, x) -> (acc * 37 + x) % 998244353) % 1073741824) AS fp_pair
      | FROM cp),
      |kept AS (
      | SELECT bigram FROM (
      |  SELECT cp.bigram,
      |   row_number() OVER (PARTITION BY cp.prev ORDER BY cp.c_pair DESC, fp.fp_pair ASC) AS rn
      |  FROM cp JOIN fp USING (bigram))
      | WHERE rn <= 24),
      |cost AS (
      | SELECT bb.doc_id,
      |  CASE WHEN kept.bigram IS NOT NULL
      |   THEN CAST(round(ln((cp.c_pair + 1.0) / (cx.c_prev + v.vocab)) * 1000000) AS BIGINT)
      |   ELSE CAST(round(ln(1.0 / (cx.c_prev + v.vocab)) * 1000000) AS BIGINT) END AS c
      | FROM bb JOIN cp USING (bigram) JOIN cx ON bb.prev = cx.prev
      |  LEFT JOIN kept USING (bigram) CROSS JOIN v)
      |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
      | CAST((-sum(c)) // count(*) AS BIGINT) AS xent_micronats
      |FROM cost GROUP BY doc_id""".stripMargin


  private val DsirOracle: String =
    """WITH t AS (SELECT doc_id, lang, regexp_split_to_array(trim(text), '\s+') AS w FROM documents),
      |uni AS (SELECT doc_id, lang, unnest(w) AS f FROM t),
      |bi AS (
      | SELECT doc_id, lang, unnest(list_transform(range(1, len(w)),
      |   i -> w[CAST(i AS INTEGER)] || ' ' || w[CAST(i AS INTEGER) + 1])) AS f
      | FROM t WHERE len(w) >= 2),
      |hb AS (
      | SELECT doc_id, lang,
      |  list_reduce(list_transform(string_split(f, ''), c -> CAST(ascii(c) AS BIGINT)),
      |    (acc, x) -> (acc * 31 + x) % 1000000007) % 1024 AS b
      | FROM (SELECT * FROM uni UNION ALL SELECT * FROM bi) WHERE f != ''),
      |raw AS (SELECT b, count(*) AS c_r FROM hb GROUP BY b),
      |tgt AS (SELECT b, count(*) AS c_t FROM hb WHERE lang = 'en' GROUP BY b),
      |tot AS (SELECT (SELECT count(*) FROM hb) AS r_tot,
      |        (SELECT count(*) FROM hb WHERE lang = 'en') AS t_tot),
      |cost AS (
      | SELECT raw.b,
      |  CAST(round(ln((COALESCE(tgt.c_t, 0) + 1.0) / (tot.t_tot + 1024)) * 1000000) AS BIGINT)
      |  - CAST(round(ln((raw.c_r + 1.0) / (tot.r_tot + 1024)) * 1000000) AS BIGINT) AS c
      | FROM raw LEFT JOIN tgt USING (b) CROSS JOIN tot)
      |SELECT hb.doc_id, CAST(count(*) AS BIGINT) AS n_feats,
      | CAST(sum(cost.c) AS BIGINT) AS logw_micronats
      |FROM hb JOIN cost USING (b) GROUP BY hb.doc_id""".stripMargin


  private val lineDedupOracle: String =
    """WITH base AS (
      | SELECT doc_id, string_split(coalesce(text, ''), ' ') AS w,
      |  CAST(ceil(len(string_split(coalesce(text, ''), ' ')) / 10.0) AS BIGINT) AS n_segments
      | FROM documents),
      |segs AS (
      | SELECT doc_id, CAST(k AS BIGINT) AS pos,
      |  array_to_string(list_slice(w, CAST(k * 10 + 1 AS BIGINT), CAST(k * 10 + 10 AS BIGINT)), ' ') AS seg
      | FROM (SELECT doc_id, w, unnest(range(n_segments)) AS k FROM base)),
      |boiler AS (
      | SELECT seg FROM segs GROUP BY seg HAVING count(DISTINCT doc_id) >= 2),
      |kept AS (
      | SELECT segs.doc_id, segs.pos, segs.seg FROM segs ANTI JOIN boiler USING (seg)),
      |agg AS (
      | SELECT doc_id, CAST(count(*) AS BIGINT) AS n_kept,
      |  string_agg(seg, ' ' ORDER BY pos) AS clean_text
      | FROM kept GROUP BY doc_id)
      |SELECT b.doc_id, b.n_segments,
      | COALESCE(a.n_kept, 0) AS n_kept,
      | b.n_segments - COALESCE(a.n_kept, 0) AS n_removed,
      | md5(COALESCE(a.clean_text, '')) AS clean_md5
      |FROM base b LEFT JOIN agg a USING (doc_id)""".stripMargin

  private val base: Map[String, String] = Map(
    "text_token_count" ->
      """SELECT doc_id,
        | CAST(len(regexp_split_to_array(trim(text), '\s+')) AS BIGINT) AS n_tokens,
        | -- COALESCE: list_sum of an EMPTY list is NULL in DuckDB, while the
        | -- engine's aggregate(..., 0L, ...) fold is 0 — a whitespace-only
        | -- document must count 0 subword tokens on both sides (r15 sweep)
        | -- NULL text stays NULL (SQL transparency, r16) — the COALESCE is
        | -- only for the EMPTY-list fold, so guard it with the input
        | CASE WHEN text IS NULL THEN NULL ELSE
        |  CAST(COALESCE(list_sum(list_transform(list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'), p -> p != ''),
        |   p -> CAST(ceil(len(p) / 4.0) AS BIGINT))), 0) AS BIGINT) END AS n_subword_est,
        | CAST(len(text) AS BIGINT) AS n_chars_measured
        |FROM documents""".stripMargin,
    "text_token_budget" ->
      """WITH q AS (
        | SELECT doc_id,
        |  CAST(len(regexp_split_to_array(trim(text), '\s+')) AS BIGINT) AS n_tokens,
        |  CAST(len(regexp_extract_all(text, '[a-zA-Z]')) AS BIGINT) AS n_alpha,
        |  CAST(len(text) AS BIGINT) AS n_chars
        | FROM documents WHERE len(text) > 0),
        |c AS (
        | SELECT *, n_alpha * 1000 // n_chars AS quality_key,
        |  sum(n_tokens) OVER (ORDER BY n_alpha * 1000 // n_chars DESC, doc_id ASC
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
        | FROM q)
        |SELECT doc_id, n_tokens, n_alpha, n_chars, quality_key
        |FROM c WHERE cum <= 20000""".stripMargin,
    "text_quality" ->
      """SELECT doc_id,
        | CAST(len(text) AS BIGINT) AS n_chars,
        | CAST(len(regexp_split_to_array(trim(text), '\s+')) AS BIGINT) AS n_tokens,
        | CAST(len(list_filter(regexp_split_to_array(trim(text), '\s+'),
        |   t -> list_contains(['the','a','an','and','or','of','to','in','is','it','on','for','with','as','at'], lower(t)))) AS BIGINT) AS n_stopwords,
        | CAST(len(regexp_extract_all(text, '[.,;:!?]')) AS BIGINT) AS n_punct,
        | CAST(len(regexp_extract_all(text, '[a-zA-Z]')) AS BIGINT) AS n_alpha,
        | CAST(len(list_filter(regexp_split_to_array(trim(text), '\s+'),
        |   t -> list_contains(['the','a','an','and','or','of','to','in','is','it','on','for','with','as','at'], lower(t)))) AS DOUBLE)
        |   / len(regexp_split_to_array(trim(text), '\s+')) AS stopword_ratio,
        | CAST(len(regexp_extract_all(text, '[a-zA-Z]')) AS DOUBLE) / len(text) AS alpha_ratio,
        | CAST(len(text) - (len(regexp_split_to_array(trim(text), '\s+')) - 1) AS DOUBLE)
        |   / len(regexp_split_to_array(trim(text), '\s+')) AS mean_word_len
        |FROM documents""".stripMargin,
    "text_gopher_rules" -> GopherOracle,
    // the composed chain: gopher keep -> exact dedup (min-id per text) ->
    // langid -> per-language rollup; every stage shares its standalone
    // row's SQL so composition == composition of the pieces
    "pipeline_c4" ->
      s"""WITH g AS ($GopherOracle),
        |k AS (
        | SELECT d.doc_id, d.text FROM documents d
        | JOIN g ON d.doc_id = g.doc_id WHERE g.keep),
        |c AS (SELECT min(doc_id) AS doc_id, text FROM k GROUP BY text),
        |l AS (
        | SELECT doc_id, text,
        |  CAST(len(regexp_extract_all(lower(text), '\b(the|and|of|to|in|is)\b')) AS BIGINT) AS n_en,
        |  CAST(len(regexp_extract_all(lower(text), '\b(der|die|und|das|ist|nicht)\b')) AS BIGINT) AS n_de,
        |  CAST(len(regexp_extract_all(lower(text), '\b(el|la|los|que|es|una)\b')) AS BIGINT) AS n_es,
        |  CAST(len(regexp_extract_all(lower(text), '\b(le|la|les|est|une|dans)\b')) AS BIGINT) AS n_fr
        | FROM c)
        |SELECT CASE WHEN n_en >= n_de AND n_en >= n_es AND n_en >= n_fr THEN 'en'
        |            WHEN n_de >= n_es AND n_de >= n_fr THEN 'de'
        |            WHEN n_es >= n_fr THEN 'es'
        |            ELSE 'fr' END AS lang_pred,
        | CAST(count(*) AS BIGINT) AS n_docs,
        | CAST(sum(len(regexp_split_to_array(trim(text), '\\s+'))) AS BIGINT) AS n_tokens
        |FROM l GROUP BY 1""".stripMargin,
    // per-source accounting: counts, token share and alpha ratio in
    // integer permille, gopher keep counts — the provenance dashboard
    "text_source_stats" ->
      s"""WITH g AS ($GopherOracle),
        |j AS (
        | SELECT d.source, d.text, g.n_words, g.keep,
        |  CAST(len(regexp_extract_all(d.text, '[a-zA-Z]')) AS BIGINT) AS n_alpha,
        |  CAST(len(d.text) AS BIGINT) AS n_chars
        | FROM documents d JOIN g ON d.doc_id = g.doc_id),
        |s AS (
        | SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(n_words) AS BIGINT) AS n_tokens,
        |  CAST(sum(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
        |  CAST(sum(n_alpha) AS BIGINT) AS sum_alpha,
        |  CAST(sum(n_chars) AS BIGINT) AS sum_chars
        | FROM j GROUP BY source),
        |t AS (SELECT sum(n_tokens) AS corpus_tokens FROM s)
        |SELECT source, n_docs, n_tokens, n_kept,
        | CAST(n_tokens * 1000 // corpus_tokens AS BIGINT) AS token_share_permille,
        | CAST(sum_alpha * 1000 // sum_chars AS BIGINT) AS alpha_permille
        |FROM s CROSS JOIN t""".stripMargin,
    "text_langid" ->
      """SELECT doc_id,
        | CAST(len(regexp_extract_all(lower(text), '\b(the|and|of|to|in|is)\b')) AS BIGINT) AS n_en,
        | CAST(len(regexp_extract_all(lower(text), '\b(der|die|und|das|ist|nicht)\b')) AS BIGINT) AS n_de,
        | CAST(len(regexp_extract_all(lower(text), '\b(el|la|los|que|es|una)\b')) AS BIGINT) AS n_es,
        | CAST(len(regexp_extract_all(lower(text), '\b(le|la|les|est|une|dans)\b')) AS BIGINT) AS n_fr,
        | CASE WHEN n_en >= n_de AND n_en >= n_es AND n_en >= n_fr THEN 'en'
        |      WHEN n_de >= n_es AND n_de >= n_fr THEN 'de'
        |      WHEN n_es >= n_fr THEN 'es'
        |      ELSE 'fr' END AS lang_pred
        |FROM documents""".stripMargin,
    "text_fingerprint" ->
      """SELECT doc_id,
        | list_reduce(list_transform(string_split(text, ''), c -> CAST(ascii(c) AS BIGINT)),
        |   (acc, x) -> (acc * 31 + x) % 1000000007) AS fp31,
        | list_reduce(list_transform(string_split(text, ''), c -> CAST(ascii(c) AS BIGINT)),
        |   (acc, x) -> (acc * 37 + x) % 998244353) AS fp37,
        | list_min(list_transform(range(1, greatest(len(text) - 4, 1) + 1),
        |   i -> list_reduce(list_transform(string_split(substr(text, CAST(i AS INTEGER), 5), ''), c -> CAST(ascii(c) AS BIGINT)),
        |     (acc, x) -> (acc * 31 + x) % 1000000007))) AS fp_min5gram
        |FROM documents""".stripMargin,
    "sample_split" ->
      """SELECT doc_id, lang, bucket,
        | CASE WHEN bucket < 10 THEN 'test' WHEN bucket < 20 THEN 'valid' ELSE 'train' END AS split,
        | bucket % 5 = 0 AS in_stratified_20pct
        |FROM (
        | SELECT doc_id, lang,
        |  list_reduce(list_transform(string_split(coalesce(text, ''), ''), c -> CAST(ascii(c) AS BIGINT)),
        |    (acc, x) -> (acc * 41 + x) % 999999937) % 100 AS bucket
        | FROM documents)""".stripMargin,
    "text_pii" ->
      """SELECT doc_id,
        | CAST(len(regexp_extract_all(text, '[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{2,}')) AS BIGINT) AS n_emails,
        | CAST(len(regexp_extract_all(text, 'https?://[^\s]+')) AS BIGINT) AS n_urls,
        | CAST(len(regexp_extract_all(text, '\b[0-9]+\b')) AS BIGINT) AS n_number_tokens,
        | CAST(len(regexp_extract_all(text, '\b[A-Z][a-z]+\b')) AS BIGINT) AS n_capitalized,
        | regexp_replace(text, 'spark', '[TERM]', 'g') AS redacted,
        | len(regexp_extract_all(text, '[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{2,}')) = 0 AS pii_clean
        |FROM documents""".stripMargin,
    "text_decontaminate" ->
      """WITH g AS (
        | SELECT doc_id, list_distinct(list_transform(range(1, len(w) - 6),
        |   i -> w[CAST(i AS INTEGER)] || ' ' || w[CAST(i+1 AS INTEGER)] || ' ' || w[CAST(i+2 AS INTEGER)]
        |      || ' ' || w[CAST(i+3 AS INTEGER)] || ' ' || w[CAST(i+4 AS INTEGER)] || ' ' || w[CAST(i+5 AS INTEGER)]
        |      || ' ' || w[CAST(i+6 AS INTEGER)] || ' ' || w[CAST(i+7 AS INTEGER)])) AS grams
        | FROM (SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS w FROM documents)
        | WHERE len(w) >= 8),
        |eg AS (SELECT DISTINCT unnest(grams) AS gram FROM g WHERE doc_id < 20),
        |hits AS (
        | SELECT t.doc_id, count(*) AS n
        | FROM (SELECT doc_id, unnest(grams) AS gram FROM g WHERE doc_id >= 20) t
        | JOIN eg USING (gram) GROUP BY t.doc_id)
        |SELECT d.doc_id, CAST(COALESCE(h.n, 0) AS BIGINT) AS n_shared_grams,
        | COALESCE(h.n, 0) > 0 AS contaminated
        |FROM (SELECT doc_id FROM documents WHERE doc_id >= 20) d
        |LEFT JOIN hits h ON d.doc_id = h.doc_id""".stripMargin,
    "text_contamination_score" ->
      """WITH g AS (
        | SELECT doc_id, list_distinct(list_transform(range(1, len(w) - 6),
        |   i -> w[CAST(i AS INTEGER)] || ' ' || w[CAST(i+1 AS INTEGER)] || ' ' || w[CAST(i+2 AS INTEGER)]
        |      || ' ' || w[CAST(i+3 AS INTEGER)] || ' ' || w[CAST(i+4 AS INTEGER)] || ' ' || w[CAST(i+5 AS INTEGER)]
        |      || ' ' || w[CAST(i+6 AS INTEGER)] || ' ' || w[CAST(i+7 AS INTEGER)])) AS grams
        | FROM (SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS w FROM documents)
        | WHERE len(w) >= 8),
        |eg AS (SELECT DISTINCT unnest(grams) AS gram FROM g WHERE doc_id < 20),
        |hits AS (
        | SELECT t.doc_id, count(*) AS n
        | FROM (SELECT doc_id, unnest(grams) AS gram FROM g WHERE doc_id >= 20) t
        | JOIN eg USING (gram) GROUP BY t.doc_id)
        |SELECT g.doc_id, CAST(len(g.grams) AS BIGINT) AS n_grams,
        | CAST(COALESCE(h.n, 0) AS BIGINT) AS n_shared_grams,
        | CAST(COALESCE(h.n, 0) AS DOUBLE) / len(g.grams) AS contamination_frac
        |FROM g LEFT JOIN hits h ON g.doc_id = h.doc_id
        |WHERE g.doc_id >= 20""".stripMargin,
    // the booleans are the gate (recall 1.0, FPR under budget); the exact
    // column is the contaminated-doc count the Bloom superset must cover
    "text_decontaminate_bloom_check" ->
      """WITH g AS (
        | SELECT doc_id, list_distinct(list_transform(range(1, len(w) - 6),
        |   i -> w[CAST(i AS INTEGER)] || ' ' || w[CAST(i+1 AS INTEGER)] || ' ' || w[CAST(i+2 AS INTEGER)]
        |      || ' ' || w[CAST(i+3 AS INTEGER)] || ' ' || w[CAST(i+4 AS INTEGER)] || ' ' || w[CAST(i+5 AS INTEGER)]
        |      || ' ' || w[CAST(i+6 AS INTEGER)] || ' ' || w[CAST(i+7 AS INTEGER)])) AS grams
        | FROM (SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS w FROM documents)
        | WHERE len(w) >= 8),
        |eg AS (SELECT DISTINCT unnest(grams) AS gram FROM g WHERE doc_id < 20),
        |hits AS (
        | SELECT t.doc_id, count(*) AS n
        | FROM (SELECT doc_id, unnest(grams) AS gram FROM g WHERE doc_id >= 20) t
        | JOIN eg USING (gram) GROUP BY t.doc_id)
        |SELECT CAST(count(*) AS BIGINT) AS n_contaminated,
        | TRUE AS no_false_negatives, TRUE AS fp_frac_bounded
        |FROM hits WHERE n > 0""".stripMargin,
    // bigram LM cross-entropy: identical tokenization, counts, smoothing and
    // micro-nat quantization — the exact-string form of the engine's
    // fingerprinted plan, so a fingerprint collision would hash-mismatch
    "text_lm_xent" -> LmXentOracle,
    "text_lm_xent_pruned" -> LmXentPrunedOracle,
    // shares LmXentOracle verbatim as its CTE so the scores cannot drift;
    // value-atomic terciles: b_k = smallest xent whose cumulative count
    // (RANGE frame — peers included) reaches k*n/3
    // r10 continuation: per-source calibrated keep — shares LmXentOracle
    // verbatim; value-atomic milli-nat threshold via integer cross-multiply
    "text_quality_calibrated" ->
      s"""WITH ppl AS ($LmXentOracle),
        |j AS (
        | SELECT p.doc_id, d.source, p.xent_micronats, p.xent_micronats // 1000 AS xent_milli
        | FROM ppl p JOIN documents d ON d.doc_id = p.doc_id),
        |n AS (SELECT source, CAST(count(*) AS BIGINT) AS n FROM j GROUP BY 1),
        |h AS (SELECT source, xent_milli, CAST(count(*) AS BIGINT) AS c FROM j GROUP BY 1, 2),
        |cc AS (
        | SELECT source, xent_milli,
        |  sum(c) OVER (PARTITION BY source ORDER BY xent_milli ASC) AS cum
        | FROM h),
        |thr AS (
        | SELECT cc.source, min(xent_milli) AS thr_milli
        | FROM cc JOIN n ON n.source = cc.source
        | WHERE cum * 1000 >= n.n * 300
        | GROUP BY 1)
        |SELECT j.doc_id, j.source, j.xent_micronats, j.xent_milli, thr.thr_milli,
        | j.xent_milli <= thr.thr_milli AS kept
        |FROM j JOIN thr ON thr.source = j.source""".stripMargin,
    "pipeline_ppl_buckets" ->
      s"""WITH ppl AS ($LmXentOracle),
        |c AS (
        | SELECT *, count(*) OVER (ORDER BY xent_micronats) AS cum,
        |  count(*) OVER () AS n
        | FROM ppl),
        |b AS (
        | SELECT min(CASE WHEN cum * 3 >= n THEN xent_micronats END) AS b1,
        |  min(CASE WHEN cum * 3 >= n * 2 THEN xent_micronats END) AS b2
        | FROM c)
        |SELECT doc_id, n_bigrams, xent_micronats,
        | CASE WHEN xent_micronats <= b1 THEN 'head'
        |      WHEN xent_micronats <= b2 THEN 'middle'
        |      ELSE 'tail' END AS ppl_bucket
        |FROM ppl CROSS JOIN b""".stripMargin,
    // integer delta rollup of the two scorers above — all-integer, so the
    // monotone invariant (violations = 0) and the permille bound are exact
    "text_lm_xent_pruned_check" ->
      s"""WITH e AS ($LmXentOracle), p AS ($LmXentPrunedOracle)
        |SELECT CAST(count(*) AS BIGINT) AS n_docs,
        | CAST(sum(CASE WHEN p.xent_micronats < e.xent_micronats THEN 1 ELSE 0 END) AS BIGINT)
        |  AS n_violations,
        | CAST(sum(e.xent_micronats) AS BIGINT) AS sum_exact,
        | CAST(sum(p.xent_micronats - e.xent_micronats) AS BIGINT) AS sum_delta,
        | sum(p.xent_micronats - e.xent_micronats) * 1000 <= sum(e.xent_micronats) * 450
        |  AS delta_within_bound
        |FROM e JOIN p USING (doc_id)""".stripMargin,
    // mirrors dsirWeights bit-for-bit: same poly-hash buckets, same
    // per-bucket micro-nat quantization of both lns before the difference
    "text_dsir" -> DsirOracle,
    // the merge table itself has no single-statement SQL form (iterative
    // argmax); the gate pins 16 productive merges + reference equality
    "text_bpe_check" ->
      """SELECT CAST(16 AS BIGINT) AS n_merges,
        | TRUE AS merge_table_matches_reference""".stripMargin,
    // encode itself has no single-statement SQL form (iterative rank-order
    // merging); the gate pins the lossless round trip over every word
    "text_bpe_encode_check" ->
      """SELECT CAST(count(*) AS BIGINT) AS n_docs,
        | CAST(0 AS BIGINT) AS n_roundtrip_mismatches,
        | TRUE AS encoder_lossless
        |FROM documents""".stripMargin,
    // FFD assignment itself has no SQL form; n_docs/n_oversize are
    // independently derivable and the two invariants are pinned TRUE
    "text_pack_bins_check" ->
      """SELECT CAST(count(*) AS BIGINT) AS n_docs,
        | CAST(sum(CASE WHEN len(regexp_split_to_array(trim(text), '\s+')) > 1024
        |  THEN 1 ELSE 0 END) AS BIGINT) AS n_oversize,
        | TRUE AS zero_overflow_bins,
        | TRUE AS bins_within_2x
        |FROM documents""".stripMargin,
    // the composed selection: exact top-N docs by those weights (ties to
    // lower doc_id — the heap's order), rolled up per lang
    "pipeline_dsir" ->
      s"""WITH w AS ($DsirOracle),
        |sel AS (SELECT doc_id FROM w ORDER BY logw_micronats DESC, doc_id LIMIT 200)
        |SELECT lang, CAST(count(*) AS BIGINT) AS n_selected,
        | CAST(sum(length(text)) AS BIGINT) AS total_chars
        |FROM documents JOIN sel USING (doc_id) GROUP BY lang""".stripMargin,
    "text_pack_sequences" ->
      """SELECT doc_id, CAST(doc_id % 8 AS INTEGER) AS shard, n_tokens, start_offset,
        | start_offset // 1024 AS bin_id
        |FROM (
        | SELECT doc_id, n_tokens,
        |  CAST(COALESCE(sum(n_tokens) OVER (PARTITION BY doc_id % 8 ORDER BY doc_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS start_offset
        | FROM (SELECT doc_id,
        |   CAST(len(regexp_split_to_array(trim(text), '\s+')) AS BIGINT) AS n_tokens
        |  FROM documents))""".stripMargin,
    "text_domain_mix" -> DomainMixOracle,
    "text_domain_mix_scale" -> s"SELECT doc_id, lang, kept FROM ($DomainMixOracle)",
    // bucketed pair CTEs shared with the dedup family (r14): the naive
    // all-pairs form time-boxed out of the sf0.1 adjudication
    "pipeline_summary" ->
      (s"WITH RECURSIVE ${DedupOracles.JaccardPairsCtes},\n" +
      """edges AS (
        | SELECT id_a AS src, id_b AS dst FROM pairs
        | UNION ALL SELECT id_b, id_a FROM pairs),
        |reach(id, label) AS (
        | SELECT src, src FROM edges
        | UNION
        | SELECT e.src, r.label FROM edges e JOIN reach r ON e.dst = r.id),
        |clusters AS (SELECT id AS doc_id, min(label) AS cluster_id FROM reach GROUP BY id),
        |survivors AS (
        | SELECT min(doc_id) AS doc_id FROM clusters GROUP BY cluster_id
        | UNION ALL
        | SELECT d.doc_id FROM documents d LEFT JOIN clusters c ON d.doc_id = c.doc_id
        | WHERE c.doc_id IS NULL),
        |q AS (
        | SELECT doc_id, lang,
        |  CAST(len(regexp_split_to_array(trim(text), '\s+')) AS BIGINT) AS n_tokens
        | FROM documents
        | WHERE 2 * len(regexp_extract_all(text, '[a-zA-Z]')) >= len(text))
        |SELECT q.lang, CAST(count(*) AS BIGINT) AS n_kept,
        | CAST(sum(q.n_tokens) AS BIGINT) AS total_tokens,
        | (CAST(sum(q.n_tokens) AS BIGINT) + 1023) // 1024 AS n_bins
        |FROM q JOIN survivors s ON q.doc_id = s.doc_id
        |GROUP BY q.lang""".stripMargin),
    // round-4 composition: boilerplate-intact docs -> hashing-trick
    // vectors -> per-lang L1/dimension rollup
    "pipeline_vectorize" ->
      """WITH base AS (
        | SELECT doc_id, string_split(coalesce(text, ''), ' ') AS w,
        |  CAST(ceil(len(string_split(coalesce(text, ''), ' ')) / 10.0) AS BIGINT) AS n_segments
        | FROM documents),
        |segs AS (
        | SELECT doc_id,
        |  array_to_string(list_slice(w, CAST(k * 10 + 1 AS BIGINT), CAST(k * 10 + 10 AS BIGINT)), ' ') AS seg
        | FROM (SELECT doc_id, w, unnest(range(n_segments)) AS k FROM base)),
        |boiler AS (
        | SELECT seg FROM segs GROUP BY seg HAVING count(DISTINCT doc_id) >= 2),
        |intact AS (
        | SELECT doc_id FROM base WHERE doc_id NOT IN (
        |  SELECT DISTINCT doc_id FROM segs WHERE seg IN (SELECT seg FROM boiler))),
        |tok AS (
        | SELECT doc_id, unnest(regexp_split_to_array(trim(text), '\s+')) AS token
        | FROM documents),
        |h AS (
        | SELECT doc_id,
        |  list_reduce(list_transform(string_split(token, ''), c -> CAST(ascii(c) AS BIGINT)),
        |    (acc, x) -> (acc * 31 + x) % 1000000007) AS hv
        | FROM tok WHERE token != ''),
        |emb AS (
        | SELECT doc_id, hv % 16 AS dim_idx,
        |  CAST(sum(CASE WHEN (hv // 16) % 2 = 1 THEN 1 ELSE -1 END) AS BIGINT) AS weight
        | FROM h GROUP BY doc_id, hv % 16),
        |l1 AS (
        | SELECT doc_id, CAST(sum(abs(weight)) AS BIGINT) AS l1,
        |  CAST(count(*) AS BIGINT) AS n_dims
        | FROM emb GROUP BY doc_id)
        |SELECT d.lang, CAST(count(*) AS BIGINT) AS n_docs,
        | CAST(sum(coalesce(l1.l1, 0)) AS BIGINT) AS total_l1,
        | CAST(sum(coalesce(l1.n_dims, 0)) AS BIGINT) AS total_dims
        |FROM documents d JOIN intact USING (doc_id) LEFT JOIN l1 USING (doc_id)
        |GROUP BY d.lang""".stripMargin,
    "text_repetition" ->
      """SELECT doc_id, CAST(len(g) AS BIGINT) AS n_grams,
        | CAST(len(list_distinct(g)) AS BIGINT) AS n_distinct,
        | CASE WHEN len(g) > 0
        |   THEN CAST(len(g) - len(list_distinct(g)) AS DOUBLE) / len(g)
        |   ELSE 0.0 END AS dup_ratio
        |FROM (
        | SELECT doc_id, CASE WHEN len(w) >= 3 THEN list_transform(range(1, len(w) - 1),
        |   i -> w[CAST(i AS INTEGER)] || ' ' || w[CAST(i+1 AS INTEGER)] || ' ' || w[CAST(i+2 AS INTEGER)])
        |  ELSE CAST([] AS VARCHAR[]) END AS g
        | FROM (SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS w FROM documents))""".stripMargin,
    // C4-style line dedup: "lines" are aligned 10-word segments; a segment
    // in >= 2 distinct docs is boilerplate and removed everywhere.
    // The hashed twin (fingerprint-keyed shuffles, r13) shares the
    // exact-string oracle verbatim — green proves the rewrite changed the
    // shuffle payload, not the answer.
    "text_line_dedup" -> lineDedupOracle,
    "text_line_dedup_hashed" -> lineDedupOracle,
    "text_substring_dup" ->
      """WITH w AS (
        | SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS w FROM documents),
        |g AS (
        | SELECT doc_id, unnest(list_distinct(list_transform(range(1, len(w) - 25 + 2),
        |   i -> array_to_string(w[CAST(i AS INTEGER):CAST(i + 24 AS INTEGER)], ' ')))) AS gram
        | FROM w WHERE len(w) >= 25),
        |df AS (SELECT gram, count(DISTINCT doc_id) AS n_docs FROM g GROUP BY gram)
        |SELECT doc_id,
        | CAST(count(*) AS BIGINT) AS n_windows,
        | CAST(sum(CASE WHEN n_docs >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_windows,
        | CAST(sum(CASE WHEN n_docs >= 2 THEN 1 ELSE 0 END) AS DOUBLE) / count(*) AS dup_frac
        |FROM g JOIN df USING (gram) GROUP BY doc_id""".stripMargin,
    "text_chunk" ->
      """WITH starts AS (
        | SELECT doc_id, text,
        |  unnest(range(1, greatest(len(text), 1) + 1, 150)) AS i
        | FROM documents)
        |SELECT doc_id,
        | CAST((i - 1) // 150 AS BIGINT) AS chunk_id,
        | CAST(i AS BIGINT) AS chunk_start,
        | substr(text, CAST(i AS INT), 200) AS chunk_text,
        | CAST(len(substr(text, CAST(i AS INT), 200)) AS BIGINT) AS chunk_len
        |FROM starts""".stripMargin,
    // the hashing trick is exact integer arithmetic — reproducible in SQL
    "text_hash_embedding" ->
      """WITH tok AS (
        | SELECT doc_id, unnest(regexp_split_to_array(trim(text), '\s+')) AS token
        | FROM documents),
        |h AS (
        | SELECT doc_id,
        |  list_reduce(list_transform(string_split(token, ''), c -> CAST(ascii(c) AS BIGINT)),
        |    (acc, x) -> (acc * 31 + x) % 1000000007) AS hv
        | FROM tok WHERE token != '')
        |SELECT doc_id, hv % 16 AS dim_idx,
        | CAST(sum(CASE WHEN (hv // 16) % 2 = 1 THEN 1 ELSE -1 END) AS BIGINT) AS weight
        |FROM h GROUP BY doc_id, hv % 16""".stripMargin,
    "pipeline_shard_manifest" ->
      """WITH keyed AS (
        | SELECT doc_id, text,
        |  list_reduce(list_transform(string_split(coalesce(text, ''), ''), c -> CAST(ascii(c) AS BIGINT)),
        |    (acc, x) -> (acc * 43 + x) % 999999893) % 8 AS shard
        | FROM documents)
        |SELECT shard, CAST(count(*) AS BIGINT) AS n_docs,
        | CAST(sum(len(regexp_split_to_array(trim(text), '\s+'))) AS BIGINT) AS n_tokens,
        | CAST(sum(list_sum(list_transform(list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'), p -> p != ''),
        |   p -> CAST(ceil(len(p) / 4.0) AS BIGINT)))) AS BIGINT) AS n_subwords_est,
        | CAST(sum(len(text)) AS BIGINT) AS n_chars
        |FROM keyed GROUP BY shard""".stripMargin,
    "sample_shuffle_shards" ->
      """WITH keyed AS (
        | SELECT doc_id,
        |  list_reduce(list_transform(string_split(coalesce(text, ''), ''), c -> CAST(ascii(c) AS BIGINT)),
        |    (acc, x) -> (acc * 43 + x) % 999999893) AS skey
        | FROM documents)
        |SELECT doc_id, CAST(skey % 8 AS BIGINT) AS shard,
        | CAST(row_number() OVER (PARTITION BY skey % 8 ORDER BY skey, doc_id) AS BIGINT) AS pos
        |FROM keyed""".stripMargin,
    "text_domain_shift" ->
      """WITH toks AS (
        | SELECT source, unnest(regexp_split_to_array(trim(text), '\s+')) AS tok
        | FROM documents WHERE len(text) > 0),
        |bs AS (
        | SELECT source, tok, CAST(count(*) AS BIGINT) AS cs
        | FROM toks GROUP BY 1, 2),
        |c AS (SELECT tok, CAST(count(*) AS BIGINT) AS c FROM toks GROUP BY 1),
        |t AS (SELECT CAST(sum(c) AS BIGINT) AS t FROM c),
        |ts AS (SELECT source, CAST(sum(cs) AS BIGINT) AS ts FROM bs GROUP BY 1),
        |terms AS (
        | SELECT bs.source, ts.ts,
        |  bs.cs * CAST(round(ln((bs.cs * CAST(t.t AS DOUBLE)) / (ts.ts * CAST(c.c AS DOUBLE))) * 1000000) AS BIGINT) AS term
        | FROM bs JOIN c USING (tok) JOIN ts USING (source) CROSS JOIN t)
        |SELECT source, CAST(max(ts) AS BIGINT) AS n_tokens,
        | count(*) AS n_terms,
        | CAST(sum(term) AS BIGINT) // CAST(max(ts) AS BIGINT) AS kl_micro
        |FROM terms GROUP BY source""".stripMargin,
    "text_bm25" ->
      """WITH d AS (
        | SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS w
        | FROM documents WHERE len(text) > 0),
        |toks AS (SELECT doc_id, unnest(w) AS tok FROM d),
        |dl AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS dl FROM toks GROUP BY 1),
        |corpus AS (SELECT count(*) AS nd, CAST(sum(dl) AS BIGINT) AS tt FROM dl),
        |tf AS (
        | SELECT doc_id, tok, CAST(count(*) AS BIGINT) AS tf
        | FROM toks WHERE tok IN ('spark', 'table', 'query') GROUP BY 1, 2),
        |dfc AS (SELECT tok, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY tok),
        |s AS (
        | SELECT tf.doc_id,
        |  (CAST(round(ln(1.0 + (2 * nd - 2 * df + 1.0) / (2 * df + 1.0)) * 1000000) AS BIGINT)
        |    * 44 * tf * tt) // (20 * tf * tt + 6 * tt + 18 * dl.dl * nd) AS term_score_micro
        | FROM tf JOIN dfc USING (tok) JOIN dl USING (doc_id) CROSS JOIN corpus)
        |SELECT doc_id, CAST(sum(term_score_micro) AS BIGINT) AS bm25_micro,
        | count(*) AS n_query_terms
        |FROM s GROUP BY doc_id""".stripMargin,
    "text_cooccur" ->
      """WITH d AS (
        | SELECT doc_id, list_distinct(regexp_split_to_array(trim(text), '\s+')) AS toks
        | FROM documents),
        |n AS (SELECT count(*) AS n_docs FROM d),
        |td AS (SELECT doc_id, unnest(toks) AS token FROM d),
        |dfc AS (SELECT token, CAST(count(*) AS BIGINT) AS df FROM td GROUP BY token),
        |freq AS (SELECT token, df FROM dfc ORDER BY df DESC, token LIMIT 32),
        |h AS (SELECT td.doc_id, td.token, f.df FROM td JOIN freq f USING (token)),
        |p AS (
        | SELECT a.token AS tok_a, b.token AS tok_b,
        |  CAST(count(*) AS BIGINT) AS support, min(a.df) AS df_a, min(b.df) AS df_b
        | FROM h a JOIN h b ON a.doc_id = b.doc_id AND a.token < b.token
        | GROUP BY 1, 2)
        |SELECT tok_a, tok_b, support, df_a, df_b,
        | CAST(CAST(support AS HUGEINT) * n_docs * 1000 // (CAST(df_a AS HUGEINT) * df_b) AS BIGINT) AS lift_permille
        |FROM p CROSS JOIN n
        |WHERE support >= 10""".stripMargin,
    // identical integer clock pipeline: Knuth hash -> exact rational u ->
    // quantized -ln(u) micro-nats -> scaled integer division by weight
    "sample_weighted" ->
      """WITH s AS (
        | SELECT doc_id, CAST(len(regexp_split_to_array(trim(text), '\s+')) AS BIGINT) AS w
        | FROM documents),
        |c AS (
        | SELECT doc_id, w, ((doc_id % 1000000007) * 654435747) % 1000000007 + 1 AS num FROM s),
        |k AS (
        | SELECT doc_id, w,
        |  CAST(round(-ln(CAST(num AS DOUBLE) / 1000000008) * 1000000) AS BIGINT) AS lnu_micro
        | FROM c),
        |r AS (
        | SELECT doc_id, w, (lnu_micro * 1048576) // w AS clock,
        |  row_number() OVER (ORDER BY (lnu_micro * 1048576) // w ASC, doc_id ASC) AS rank
        | FROM k)
        |SELECT doc_id, w, CAST(clock AS BIGINT) AS clock, CAST(rank AS BIGINT) AS rank
        |FROM r WHERE rank <= 100""".stripMargin,
    "text_term_stats" ->
      """SELECT token, CAST(count(DISTINCT doc_id) AS BIGINT) AS df, CAST(count(*) AS BIGINT) AS tf
        |FROM (SELECT doc_id, unnest(regexp_split_to_array(trim(text), '\s+')) AS token FROM documents)
        |GROUP BY token ORDER BY df DESC, token LIMIT 20""".stripMargin,
    // chr(769) = U+0301 combining acute, chr(778) = U+030A combining ring:
    // the same decomposed plants; nfc_normalize implements the same
    // Unicode standard as the engine's graft_nfc
    "text_normalize" ->
      """WITH a AS (
        | SELECT doc_id, text || CASE CAST(doc_id % 3 AS INTEGER)
        |   WHEN 0 THEN ' Cafe' || chr(769)
        |   WHEN 1 THEN ' A' || chr(778)
        |   ELSE '' END AS aug
        | FROM documents),
        |n AS (SELECT doc_id, aug, nfc_normalize(aug) AS norm FROM a)
        |SELECT doc_id, aug != norm AS changed,
        | CAST(len(aug) AS BIGINT) AS n_chars_raw,
        | CAST(len(norm) AS BIGINT) AS n_chars_nfc,
        | right(norm, 6) AS tail_nfc
        |FROM n""".stripMargin,
    "text_tfidf" ->
      """WITH d AS (
        | SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS w
        | FROM documents WHERE len(text) > 0),
        |n AS (SELECT count(*) AS n FROM d),
        |tf AS (
        | SELECT doc_id, tok, CAST(count(*) AS BIGINT) AS tf
        | FROM (SELECT doc_id, unnest(w) AS tok FROM d) GROUP BY 1, 2),
        |dfc AS (SELECT tok, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY tok),
        |s AS (
        | SELECT tf.doc_id, tf.tok AS token, tf.tf, dfc.df,
        |  tf.tf * CAST(round(ln((n.n + 1.0) / (dfc.df + 1.0)) * 1000000) AS BIGINT) AS tfidf_micro
        | FROM tf JOIN dfc USING (tok) CROSS JOIN n),
        |r AS (
        | SELECT *, CAST(row_number() OVER (PARTITION BY doc_id ORDER BY tfidf_micro DESC, token ASC) AS BIGINT) AS rank
        | FROM s)
        |SELECT doc_id, token, tf, df, tfidf_micro, rank FROM r WHERE rank <= 5""".stripMargin,
    "pipeline_curate" ->
      """WITH w AS (
        | SELECT doc_id, lang, text, regexp_split_to_array(trim(text), '\s+') AS toks
        | FROM documents),
        |g AS (
        | SELECT doc_id, unnest(list_distinct(list_transform(range(1, len(toks) - 25 + 2),
        |   i -> array_to_string(toks[CAST(i AS INTEGER):CAST(i + 24 AS INTEGER)], ' ')))) AS gram
        | FROM w WHERE len(toks) >= 25),
        |df AS (SELECT gram, count(DISTINCT doc_id) AS nd FROM g GROUP BY gram),
        |dup AS (SELECT DISTINCT doc_id FROM g JOIN df USING (gram) WHERE nd >= 2),
        |surv AS (
        | SELECT w.doc_id, w.lang,
        |  list_reduce(list_transform(string_split(coalesce(w.text, ''), ''), c -> CAST(ascii(c) AS BIGINT)),
        |    (acc, x) -> (acc * 43 + x) % 999999893) AS rank_hash,
        |  CAST(len(w.toks) AS BIGINT) AS n_tokens
        | FROM w ANTI JOIN dup USING (doc_id)),
        |wt AS (SELECT lang, CAST(floor(sqrt(CAST(count(*) AS DOUBLE))) AS BIGINT) AS s
        |       FROM surv GROUP BY lang),
        |tgt AS (SELECT lang, (150 * s) // (SELECT sum(s) FROM wt) AS target FROM wt),
        |mix AS (
        | SELECT doc_id, lang FROM (
        |  SELECT doc_id, lang,
        |   CAST(row_number() OVER (PARTITION BY lang ORDER BY rank_hash, doc_id) AS BIGINT)
        |    AS mix_rank
        |  FROM surv) r JOIN tgt USING (lang) WHERE mix_rank <= target)
        |SELECT m.lang AS lang, CAST(count(*) AS BIGINT) AS n_docs,
        | CAST(sum(s.n_tokens) AS BIGINT) AS total_tokens
        |FROM mix m JOIN surv s ON m.doc_id = s.doc_id
        |GROUP BY m.lang""".stripMargin,
    "pipeline_chunks" ->
      """WITH filtered AS (
        | SELECT doc_id, lang, text,
        |  list_reduce(list_transform(string_split(coalesce(text, ''), ''), c -> CAST(ascii(c) AS BIGINT)),
        |    (acc, x) -> (acc * 43 + x) % 999999893) AS rank_hash
        | FROM documents
        | WHERE CAST(len(regexp_extract_all(text, '[a-zA-Z]')) AS BIGINT) * 2 >= len(text)),
        |sampled AS (
        | SELECT doc_id, lang, text
        | FROM (SELECT *, row_number() OVER (PARTITION BY lang ORDER BY rank_hash, doc_id) AS rk
        |       FROM filtered)
        | WHERE rk <= 20),
        |chunks AS (
        | SELECT doc_id, lang,
        |  CAST(len(substr(text, CAST(i AS INT), 200)) AS BIGINT) AS chunk_len
        | FROM (SELECT doc_id, lang, text,
        |        unnest(range(1, greatest(len(text), 1) + 1, 150)) AS i
        |       FROM sampled))
        |SELECT lang, CAST(count(*) AS BIGINT) AS n_chunks,
        | CAST(sum(chunk_len) AS BIGINT) AS total_chunk_chars,
        | CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs
        |FROM chunks GROUP BY lang""".stripMargin,
    "sample_stratified" ->
      """WITH h AS (
        | SELECT doc_id, lang,
        |  list_reduce(list_transform(string_split(coalesce(text, ''), ''), c -> CAST(ascii(c) AS BIGINT)),
        |    (acc, x) -> (acc * 43 + x) % 999999893) AS rank_hash
        | FROM documents)
        |SELECT doc_id, lang, rank_hash,
        | CAST(row_number() OVER (PARTITION BY lang ORDER BY rank_hash, doc_id) AS BIGINT)
        |  AS stratum_rank
        |FROM h
        |QUALIFY stratum_rank <= 20""".stripMargin,
    "sample_stratified_topk" ->
      """WITH h AS (
        | SELECT doc_id, lang,
        |  list_reduce(list_transform(string_split(coalesce(text, ''), ''), c -> CAST(ascii(c) AS BIGINT)),
        |    (acc, x) -> (acc * 43 + x) % 999999893) AS rank_hash
        | FROM documents)
        |SELECT doc_id, lang, rank_hash,
        | CAST(row_number() OVER (PARTITION BY lang ORDER BY rank_hash, doc_id) AS BIGINT)
        |  AS stratum_rank
        |FROM h
        |QUALIFY stratum_rank <= 20""".stripMargin,
    "sample_mixture" ->
      """WITH h AS (
        | SELECT doc_id, lang,
        |  list_reduce(list_transform(string_split(coalesce(text, ''), ''), c -> CAST(ascii(c) AS BIGINT)),
        |    (acc, x) -> (acc * 43 + x) % 999999893) AS rank_hash
        | FROM documents)
        |SELECT doc_id, lang, mix_rank FROM (
        | SELECT doc_id, lang,
        |  CAST(row_number() OVER (PARTITION BY lang ORDER BY rank_hash, doc_id) AS BIGINT)
        |   AS mix_rank
        | FROM h)
        |WHERE mix_rank <= CASE lang WHEN 'en' THEN 60 WHEN 'zh' THEN 30
        | WHEN 'de' THEN 30 WHEN 'es' THEN 15 WHEN 'fr' THEN 15 ELSE 0 END""".stripMargin,
    "sample_temperature" ->
      """WITH h AS (
        | SELECT doc_id, lang,
        |  list_reduce(list_transform(string_split(coalesce(text, ''), ''), c -> CAST(ascii(c) AS BIGINT)),
        |    (acc, x) -> (acc * 43 + x) % 999999893) AS rank_hash
        | FROM documents),
        |w AS (
        | SELECT lang, CAST(floor(sqrt(CAST(count(*) AS DOUBLE))) AS BIGINT) AS wt
        | FROM documents GROUP BY lang),
        |tgt AS (
        | SELECT lang, (200 * wt) // (SELECT sum(wt) FROM w) AS target FROM w)
        |SELECT doc_id, lang, mix_rank FROM (
        | SELECT doc_id, lang,
        |  CAST(row_number() OVER (PARTITION BY lang ORDER BY rank_hash, doc_id) AS BIGINT)
        |   AS mix_rank
        | FROM h) r
        |JOIN tgt USING (lang)
        |WHERE mix_rank <= target""".stripMargin,
  )

  /** Skew-safe / derived twins share their plain twin's oracle
    * verbatim — a green row proves the rewrite changed the plan,
    * not the answer.
    */
  val sql: Map[String, String] = base ++ Map(
    // r10 continuation: positional postings, phrase = adjacency join
    "text_phrase_search" ->
      """WITH tok AS (
        | SELECT doc_id, t.tok AS term, t.pos
        | FROM documents, LATERAL (
        |  SELECT unnest(string_split(lower(text), ' ')) AS tok,
        |   generate_subscripts(string_split(lower(text), ' '), 1) AS pos) t)
        |SELECT a.doc_id, CAST(count(*) AS BIGINT) AS n_matches,
        | CAST(min(a.pos) AS BIGINT) AS first_pos
        |FROM tok a JOIN tok b ON b.doc_id = a.doc_id AND b.pos = a.pos + 1
        |WHERE a.term = 'fast' AND b.term = 'table'
        |GROUP BY 1""".stripMargin,
    // r10 continuation: brute-force containment ground truth — the Spark
    // side must reproduce it exactly through the prefix-filter cut;
    // shingles as the identical 60-bit poly-hash integers
    "text_containment" ->
      """WITH sh AS (
        | SELECT DISTINCT doc_id,
        |  list_reduce(list_transform(string_split(substr(text, CAST(i AS INTEGER), 12), ''), c -> CAST(ascii(c) AS BIGINT)),
        |    (acc, x) -> (acc * 31 + x) % 1000000007) * 1073741824
        |  + list_reduce(list_transform(string_split(substr(text, CAST(i AS INTEGER), 12), ''), c -> CAST(ascii(c) AS BIGINT)),
        |    (acc, x) -> (acc * 37 + x) % 998244353) % 1073741824 AS s
        | FROM documents, LATERAL unnest(generate_series(1, len(text) - 11)) t(i)
        | WHERE len(text) >= 12),
        |sz AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS size_a FROM sh GROUP BY doc_id),
        |pair AS (
        | SELECT a.doc_id AS a_id, b.doc_id AS b_id, CAST(count(*) AS BIGINT) AS n_common
        | FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id != b.doc_id
        | GROUP BY 1, 2)
        |SELECT a_id, b_id, size_a, n_common, 1000 * n_common // size_a AS containment_milli
        |FROM pair JOIN sz ON a_id = sz.doc_id
        |WHERE 1000 * n_common // size_a >= 800""".stripMargin,
    // r10 continuation: MOSS winnowing — rightmost window-min selection
    // stated as the (h ASC, pos DESC) rank-1 rule; k=8, w=4
    "text_winnowing" ->
      """WITH d AS (SELECT doc_id, text FROM documents WHERE len(text) >= 11),
        |g AS (
        | SELECT doc_id, CAST(i AS BIGINT) AS pos,
        |  list_reduce(list_transform(string_split(substr(text, CAST(i AS INTEGER), 8), ''), c -> CAST(ascii(c) AS BIGINT)),
        |    (acc, x) -> (acc * 31 + x) % 1000000007) AS h
        | FROM d, LATERAL unnest(generate_series(1, len(text) - 7)) t(i)),
        |ng AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_grams FROM g GROUP BY 1),
        |wins AS (
        | SELECT doc_id, CAST(j AS BIGINT) AS j
        | FROM ng, LATERAL unnest(generate_series(1, n_grams - 3)) t(j)),
        |sel0 AS (
        | SELECT w.doc_id, w.j, g.pos, g.h,
        |  row_number() OVER (PARTITION BY w.doc_id, w.j ORDER BY g.h ASC, g.pos DESC) AS rk
        | FROM wins w JOIN g ON g.doc_id = w.doc_id AND g.pos BETWEEN w.j AND w.j + 3),
        |sel AS (SELECT DISTINCT doc_id, pos, h FROM sel0 WHERE rk = 1)
        |SELECT s.doc_id, ng.n_grams, CAST(count(*) AS BIGINT) AS n_selected,
        | CAST(count(DISTINCT s.h) AS BIGINT) AS n_distinct_h,
        | CAST(sum(s.h) AS BIGINT) AS h_checksum,
        | 1000 * count(*) // (ng.n_grams - 3) AS density_milli
        |FROM sel s JOIN ng ON s.doc_id = ng.doc_id
        |GROUP BY 1, 2""".stripMargin,
    "text_winnowing_overlap" ->
      """WITH d AS (SELECT doc_id, text FROM documents WHERE len(text) >= 11),
        |g AS (
        | SELECT doc_id, CAST(i AS BIGINT) AS pos,
        |  list_reduce(list_transform(string_split(substr(text, CAST(i AS INTEGER), 8), ''), c -> CAST(ascii(c) AS BIGINT)),
        |    (acc, x) -> (acc * 31 + x) % 1000000007) AS h
        | FROM d, LATERAL unnest(generate_series(1, len(text) - 7)) t(i)),
        |ng AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_grams FROM g GROUP BY 1),
        |wins AS (
        | SELECT doc_id, CAST(j AS BIGINT) AS j
        | FROM ng, LATERAL unnest(generate_series(1, n_grams - 3)) t(j)),
        |sel0 AS (
        | SELECT w.doc_id, w.j, g.pos, g.h,
        |  row_number() OVER (PARTITION BY w.doc_id, w.j ORDER BY g.h ASC, g.pos DESC) AS rk
        | FROM wins w JOIN g ON g.doc_id = w.doc_id AND g.pos BETWEEN w.j AND w.j + 3),
        |ph AS (SELECT DISTINCT doc_id, h FROM sel0 WHERE rk = 1),
        |df AS (SELECT h, CAST(count(*) AS BIGINT) AS dfreq FROM ph GROUP BY 1),
        |nd AS (SELECT CAST(count(DISTINCT doc_id) AS BIGINT) AS nd FROM ph),
        |keep AS (
        | SELECT ph.doc_id, ph.h FROM ph JOIN df USING (h), nd
        | WHERE dfreq * 1000 <= nd * 20),
        |cnt AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS c FROM keep GROUP BY 1),
        |pair AS (
        | SELECT a.doc_id AS a_id, b.doc_id AS b_id, CAST(count(*) AS BIGINT) AS n_shared
        | FROM keep a JOIN keep b ON a.h = b.h AND a.doc_id < b.doc_id
        | GROUP BY 1, 2)
        |SELECT a_id, b_id, n_shared,
        | 1000 * n_shared // least(ca.c, cb.c) AS shared_milli
        |FROM pair JOIN cnt ca ON ca.doc_id = a_id JOIN cnt cb ON cb.doc_id = b_id
        |WHERE least(ca.c, cb.c) >= 20
        | AND 1000 * n_shared // least(ca.c, cb.c) >= 500""".stripMargin,
    // r10 continuation: distinct-3 diversity per source over poly-hashed
    // word trigrams (the same hash-keyed dedup discipline as the dedups)
    "text_distinct_ngrams" ->
      """WITH tk AS (
        | SELECT doc_id, source, regexp_split_to_array(trim(text), '\s+') AS tk
        | FROM documents),
        |g AS (
        | SELECT source,
        |  list_reduce(list_transform(string_split(
        |    tk[CAST(i AS INTEGER)] || ' ' || tk[CAST(i + 1 AS INTEGER)] || ' ' || tk[CAST(i + 2 AS INTEGER)], ''),
        |    c -> CAST(ascii(c) AS BIGINT)), (acc, x) -> (acc * 31 + x) % 1000000007) AS h
        | FROM tk, LATERAL unnest(generate_series(1, greatest(len(tk) - 2, 0))) t(i)),
        |agg AS (
        | SELECT source, CAST(count(DISTINCT h) AS BIGINT) AS n_distinct,
        |  CAST(count(*) AS BIGINT) AS n_instances
        | FROM g GROUP BY 1),
        |tt AS (
        | SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(len(tk)) AS BIGINT) AS n_tokens
        | FROM tk GROUP BY 1)
        |SELECT tt.source, tt.n_docs, tt.n_tokens,
        | coalesce(agg.n_instances, 0) AS n_instances,
        | coalesce(agg.n_distinct, 0) AS n_distinct,
        | CASE WHEN coalesce(agg.n_instances, 0) > 0
        |  THEN 1000 * agg.n_distinct // agg.n_instances END AS distinct_milli
        |FROM tt LEFT JOIN agg ON tt.source = agg.source""".stripMargin,
  )
}
