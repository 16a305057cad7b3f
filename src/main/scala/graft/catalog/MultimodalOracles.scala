package graft.catalog

/** DuckDB oracle SQL for the multimodal query family —
  * split out of [[graft.SparkEntry]] (round 11) so the catalog stays
  * reviewable as it grows. Keys map 1:1 to `SparkEntry.queries`;
  * bodies are byte-identical to the pre-split map (CatalogDump-diffed).
  */
private[graft] object MultimodalOracles {

  val sql: Map[String, String] = Map(
    "multimodal_meta" ->
      """SELECT doc_id, CAST(strlen(text) AS BIGINT) AS byte_len, md5(text) AS payload_md5,
        | substr(text, 1, 1) AS head_char
        |FROM documents""".stripMargin,
    "multimodal_frames" ->
      """SELECT doc_id, n_frames, frame_idx,
        | md5(substr(text, CAST(frame_idx * 64 + 1 AS INTEGER), 64)) AS frame_md5
        |FROM (
        | SELECT doc_id, text, CAST((len(text) + 63) // 64 AS BIGINT) AS n_frames,
        |  unnest(range(0, CAST((len(text) + 63) // 64 AS BIGINT), 10)) AS frame_idx
        | FROM documents)""".stripMargin,
    // BYTE-true (r15 sweep): the engine decodes the UTF-8 PAYLOAD — its
    // byte_len and checksum are over bytes, not codepoints. The old
    // codepoint formulation matched only because the fixture was ASCII
    // (the latent-divergence class the r14 advice flagged on the ANN
    // oracles). Bytes reach SQL via hex(): two nibbles per byte, decoded
    // with strpos arithmetic.
    "multimodal_decode" ->
      """SELECT doc_id, 'text/fake' AS media_type,
        | len AS byte_len,
        | CAST(16 + cs % 624 AS INTEGER) AS width,
        | CAST(16 + cs % 464 AS INTEGER) AS height,
        | cs AS checksum
        |FROM (
        | SELECT doc_id, len,
        |  CAST(COALESCE(list_sum(list_transform(range(len),
        |   i -> (strpos('0123456789ABCDEF', substr(h, CAST(2 * i + 1 AS INTEGER), 1)) - 1) * 16
        |      + (strpos('0123456789ABCDEF', substr(h, CAST(2 * i + 2 AS INTEGER), 1)) - 1))), 0) AS BIGINT)
        |    % 1000000007 AS cs
        | FROM (
        |  SELECT doc_id, hex(encode(coalesce(text, ''))) AS h,
        |   CAST(octet_length(encode(coalesce(text, ''))) AS BIGINT) AS len
        |  FROM documents))""".stripMargin,
    // width/height are pure doc_id arithmetic; every 7th row is corrupt by
    // construction and must come back quarantined (-1 dims, parsed=false)
    "multimodal_headers" ->
      """SELECT doc_id,
        | CASE CAST(doc_id % 3 AS INTEGER)
        |  WHEN 0 THEN 'image/jpeg' WHEN 1 THEN 'image/png' ELSE 'image/gif'
        | END AS media_type,
        | CASE WHEN doc_id % 7 = 0 THEN -1
        |  ELSE CAST(16 + doc_id % 624 AS INTEGER) END AS width,
        | CASE WHEN doc_id % 7 = 0 THEN -1
        |  ELSE CAST(16 + doc_id % 464 AS INTEGER) END AS height,
        | doc_id % 7 <> 0 AS parsed,
        | CASE WHEN doc_id % 3 = 2 AND doc_id % 7 <> 0
        |  THEN CAST(1 + doc_id % 5 AS INTEGER) ELSE -1 END AS frames,
        | CASE WHEN doc_id % 3 = 0 AND doc_id % 7 <> 0
        |  THEN CAST(1 + doc_id % 8 AS INTEGER) ELSE -1 END AS orientation
        |FROM documents""".stripMargin,
    // recomputes every PCM feature from the doc_id arithmetic the planted
    // WAV samples were built from — the engine must recover them from BYTES
    "mm_audio_pcm" ->
      """WITH par AS (
        | SELECT doc_id, 2 * (32 + doc_id % 64) AS n, 1 + doc_id % 2 AS ch,
        |  8000 + (doc_id % 5) * 1000 AS rate, doc_id % 7 = 0 AS corrupt
        | FROM documents),
        |v AS (
        | SELECT doc_id, i, ((doc_id * 31 + i * 131) % 2003) - 1001 AS v
        | FROM (SELECT doc_id, unnest(range(0, n)) AS i FROM par)),
        |z AS (
        | SELECT doc_id, sum(v * v) AS energy, sum(abs(v)) AS abs_sum,
        |  max(abs(v)) AS peak,
        |  sum(CASE WHEN pv * v < 0 THEN 1 ELSE 0 END) AS zc
        | FROM (SELECT doc_id, v, lag(v) OVER (PARTITION BY doc_id ORDER BY i) AS pv FROM v)
        | GROUP BY doc_id)
        |SELECT p.doc_id, NOT p.corrupt AS parsed,
        | CAST(CASE WHEN p.corrupt THEN -1 ELSE p.rate END AS BIGINT) AS sample_rate,
        | CAST(CASE WHEN p.corrupt THEN -1 ELSE p.ch END AS BIGINT) AS channels,
        | CAST(CASE WHEN p.corrupt THEN -1 ELSE p.n END AS BIGINT) AS n_samples,
        | CAST(CASE WHEN p.corrupt THEN -1 ELSE z.energy END AS BIGINT) AS energy,
        | CAST(CASE WHEN p.corrupt THEN -1 ELSE z.abs_sum END AS BIGINT) AS abs_sum,
        | CAST(CASE WHEN p.corrupt THEN -1 ELSE z.peak END AS BIGINT) AS peak,
        | CAST(CASE WHEN p.corrupt THEN -1 ELSE z.zc END AS BIGINT) AS zero_cross
        |FROM par p JOIN z USING (doc_id)""".stripMargin,
    // frequency-domain gate: energy_freq is computed THROUGH the FFT in
    // Spark (Parseval) but derived straight from the planted samples here
    // — equality proves the transform conserves energy; dc_sum pins X_0
    "mm_audio_spectrum" ->
      """WITH par AS (
        | SELECT doc_id, 2 * (32 + doc_id % 64) AS n, doc_id % 7 = 0 AS corrupt
        | FROM documents),
        |v AS (
        | SELECT doc_id, ((doc_id * 31 + i * 131) % 2003) - 1001 AS v
        | FROM (SELECT doc_id, unnest(range(0, 32 * (n // 32))) AS i FROM par)),
        |z AS (
        | SELECT doc_id, sum(v * v) AS e, sum(v) AS dc FROM v GROUP BY doc_id)
        |SELECT p.doc_id, NOT p.corrupt AS parsed,
        | CAST(CASE WHEN p.corrupt THEN -1 ELSE p.n // 32 END AS BIGINT) AS n_fft_frames,
        | CAST(CASE WHEN p.corrupt THEN -1 ELSE z.e END AS BIGINT) AS energy_time,
        | CAST(CASE WHEN p.corrupt THEN -1 ELSE z.e END AS BIGINT) AS energy_freq,
        | CAST(CASE WHEN p.corrupt THEN -1 ELSE z.dc END AS BIGINT) AS dc_sum
        |FROM par p JOIN z USING (doc_id)""".stripMargin,
    "mm_image_dhash" ->
      """WITH par AS (SELECT doc_id, doc_id % 7 = 0 AS corrupt FROM documents),
        |grid AS (
        | SELECT doc_id, tx.range AS x, ty.range AS y,
        |  (299 * ((doc_id * 5 + tx.range * 19 + ty.range * 29) % 256)
        |   + 587 * ((doc_id * 11 + tx.range * 17 + ty.range * 23) % 256)
        |   + 114 * ((doc_id * 7 + tx.range * 13 + ty.range * 31) % 256)) // 1000 AS gray
        | FROM par, range(0, 9) tx, range(0, 8) ty
        | WHERE NOT corrupt),
        |bits AS (
        | SELECT a.doc_id, a.x, a.y,
        |  CASE WHEN b.gray > a.gray THEN 1 ELSE 0 END AS bit
        | FROM grid a JOIN grid b
        |  ON a.doc_id = b.doc_id AND b.x = a.x + 1 AND b.y = a.y
        | WHERE a.x < 8),
        |hash AS (
        | SELECT doc_id,
        |  sum(CASE WHEN y < 4 THEN bit * (CAST(1 AS BIGINT) << (y * 8 + x)) ELSE 0 END) AS hi,
        |  sum(CASE WHEN y >= 4 THEN bit * (CAST(1 AS BIGINT) << ((y - 4) * 8 + x)) ELSE 0 END) AS lo
        | FROM bits GROUP BY doc_id)
        |SELECT p.doc_id, NOT p.corrupt AS parsed,
        | CAST(CASE WHEN p.corrupt THEN -1 ELSE 9 END AS BIGINT) AS width,
        | CAST(CASE WHEN p.corrupt THEN -1 ELSE 8 END AS BIGINT) AS height,
        | CAST(COALESCE(h.hi, -1) AS BIGINT) AS dhash_hi,
        | CAST(COALESCE(h.lo, -1) AS BIGINT) AS dhash_lo
        |FROM par p LEFT JOIN hash h USING (doc_id)""".stripMargin,
    "mm_image_ppm" ->
      """WITH par AS (SELECT doc_id, doc_id % 5 = 0 AS corrupt FROM documents),
        |px AS (
        | SELECT doc_id, tx.range AS x, ty.range AS y,
        |  (doc_id * 5 + tx.range * 19 + ty.range * 29) % 256 AS r,
        |  (doc_id * 11 + tx.range * 17 + ty.range * 23) % 256 AS g,
        |  (doc_id * 7 + tx.range * 13 + ty.range * 31) % 256 AS b
        | FROM par, range(0, 8) tx, range(0, 6) ty
        | WHERE NOT corrupt),
        |agg AS (
        | SELECT doc_id, sum(r) AS sr, sum(g) AS sg, sum(b) AS sb,
        |  sum(((299 * r + 587 * g + 114 * b) // 1000) * (1 + x + 7 * y)) AS cks
        | FROM px GROUP BY doc_id)
        |SELECT p.doc_id, NOT p.corrupt AS parsed,
        | CAST(CASE WHEN p.corrupt THEN -1 ELSE 8 END AS BIGINT) AS width,
        | CAST(CASE WHEN p.corrupt THEN -1 ELSE 6 END AS BIGINT) AS height,
        | CAST(COALESCE(a.sr, -1) AS BIGINT) AS sum_r,
        | CAST(COALESCE(a.sg, -1) AS BIGINT) AS sum_g,
        | CAST(COALESCE(a.sb, -1) AS BIGINT) AS sum_b,
        | CAST(COALESCE(a.cks, -1) AS BIGINT) AS luma_checksum
        |FROM par p LEFT JOIN agg a USING (doc_id)""".stripMargin,
    "mm_audio_frames" ->
      """WITH par AS (
        | SELECT doc_id, 2 * (32 + doc_id % 64) AS n, doc_id % 7 = 0 AS corrupt
        | FROM documents),
        |v AS (
        | SELECT doc_id, i, ((doc_id * 31 + i * 131) % 2003) - 1001 AS v
        | FROM (SELECT doc_id, unnest(range(0, n)) AS i FROM par WHERE NOT corrupt))
        |SELECT doc_id, CAST(i // 32 AS BIGINT) AS frame_idx,
        | CAST(count(*) AS BIGINT) AS n_in_frame,
        | CAST(sum(v * v) AS BIGINT) AS frame_energy
        |FROM v GROUP BY doc_id, i // 32""".stripMargin,
    // BYTE-true (r15 sweep): the engine stride-samples PAYLOAD BYTES
    // (out(i) = payload[i*len/256]) — on non-ASCII text that differs from
    // sampling characters (a sample can land inside a multi-byte
    // sequence, yielding bytes that are not valid UTF-8). Both sides
    // digest the HEX of the sampled bytes (md5(hex(payload)) engine-side):
    // the oracle assembles the same hex pairs at the same byte positions.
    "multimodal_resize" ->
      """SELECT doc_id, CAST(16 AS INTEGER) AS width, CAST(16 AS INTEGER) AS height,
        | md5(array_to_string(list_transform(range(0, 256),
        |   i -> substr(h, CAST(2 * (i * len // 256) + 1 AS INTEGER), 2)), '')) AS thumb_md5
        |FROM (
        | SELECT doc_id, hex(encode(text)) AS h,
        |  CAST(octet_length(encode(text)) AS BIGINT) AS len
        | FROM documents WHERE length(text) > 0)""".stripMargin,
  )
}
