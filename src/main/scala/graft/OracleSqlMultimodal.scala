package graft

/** Oracle SQL for the multimodal family (payload profiling, PPM/BMP/WAV decode stats, dHash near-dup).
  * Split from the single-file registry (r15 verdict item 7); every key
  * mirrors a [[SparkEntry.queries]] registration with IDENTICAL column
  * names/aliases. Shared CTE derivations live in [[OracleSqlShared]]. */
private[graft] object OracleSqlMultimodal {
  import OracleSqlShared._
  import SparkEntry.{ScoringCoefficients, ScoringIntercepts, PcaScoringLoadings}
  import graft.features.DimReduction

  /** The 64 shift-and-mask hamming terms between two `d0..d7` rows —
    * ONE generator for every near-dup oracle in this file (r18 review:
    * five character-identical local copies had accumulated; a future
    * bit-layout change must apply everywhere or nowhere). */
  private def hamSql(a: String, b: String): String =
    (for (y <- 0 until 8; bit <- 0 until 8) yield
      s"((xor($a.d$y, $b.d$y) >> $bit) & 1)").mkString(" + ")

  private val hdsSql: String = (0 until 8).map(y => s"h.d$y").mkString(", ")

  /** The incremental twin's survivor rules: a batch image survives iff
    * NO history image and NO smaller-id batch image sits within
    * hamming ≤ 2 — the brute-force restatement of the banded candidate
    * joins, exact by the multiprobe recall guarantee. The planted
    * frame extends the pairs fixture with width/height (clones reuse
    * their original's BMP geometry — payloads are byte-identical). */
  private val dhashIncrementalOracle: String = {
    dhashRowsCtesSql + s"""
      |, pall AS (
      |  SELECT h.doc_id, b.w, b.h, $hdsSql
      |  FROM hashes h JOIN bmp b USING (doc_id)
      |  UNION ALL
      |  SELECT h.doc_id + 3000000, b.w, b.h, $hdsSql
      |  FROM hashes h JOIN bmp b USING (doc_id) WHERE h.doc_id % 29 = 0
      |), batch AS (
      |  SELECT * FROM pall WHERE doc_id % 10 >= 8 OR doc_id >= 3000000
      |), hist AS (
      |  SELECT * FROM pall WHERE doc_id % 10 < 8 AND doc_id < 3000000
      |)
      |SELECT bt.doc_id, CAST(1 AS INT) AS is_bmp, bt.w AS width,
      |  bt.h AS height, bt.d0, bt.d1, bt.d2, bt.d3, bt.d4, bt.d5,
      |  bt.d6, bt.d7
      |FROM batch bt
      |WHERE NOT EXISTS (
      |    SELECT 1 FROM hist hh WHERE ${hamSql("bt", "hh")} <= 2)
      |  AND NOT EXISTS (
      |    SELECT 1 FROM batch b2 WHERE b2.doc_id < bt.doc_id
      |      AND ${hamSql("bt", "b2")} <= 2)""".stripMargin
  }

  /** The streaming keeper's survivor rules — brute-force keep-min
    * over the planted fixture: a row survives iff NO smaller-id row
    * sits within hamming ≤ 2. Exact by CONSTRUCTION of the keeper
    * machine (pigeonhole recall to hamming ≤ 7 + full-Hamming verify
    * against registered entries — no keeper-chain escapes), not a
    * fixture property. */
  private val dhashStreamNearOracle: String = {
    dhashRowsCtesSql + s"""
      |, pall AS (
      |  SELECT h.doc_id, b.w, b.h, $hdsSql
      |  FROM hashes h JOIN bmp b USING (doc_id)
      |  UNION ALL
      |  SELECT h.doc_id + 3000000, b.w, b.h, $hdsSql
      |  FROM hashes h JOIN bmp b USING (doc_id) WHERE h.doc_id % 29 = 0
      |), drops AS (
      |  SELECT DISTINCT b2.doc_id
      |  FROM pall a JOIN pall b2 ON a.doc_id < b2.doc_id
      |  WHERE ${hamSql("a", "b2")} <= 2
      |)
      |SELECT doc_id, CAST(1 AS INT) AS is_bmp, w AS width, h AS height,
      |  d0, d1, d2, d3, d4, d5, d6, d7
      |FROM pall WHERE doc_id NOT IN (SELECT doc_id FROM drops)""".stripMargin
  }

  /** Corpus PageRank over the symmetrized phash pair relation: the
    * shared phpairs CTE feeding the events_pagerank iteration SQL
    * verbatim (1-weight edges, w_out = degree, 3 steps each
    * 6dp-floor-rounded before the next). */
  private val dhashPageRankOracle: String = {
    val base = dhashPairsCtesSql + """
      |, sym AS (
      |  SELECT id_a AS src, id_b AS dst FROM phpairs
      |  UNION ALL
      |  SELECT id_b AS src, id_a AS dst FROM phpairs
      |), edges AS (
      |  SELECT src, dst, CAST(1 AS BIGINT) AS n FROM sym
      |), outw AS (
      |  SELECT src, CAST(SUM(n) AS BIGINT) AS w_out FROM edges GROUP BY 1
      |), we AS (
      |  SELECT e.src, e.dst, e.n, o.w_out
      |  FROM edges e JOIN outw o USING (src)
      |), nodes AS (
      |  SELECT DISTINCT src AS node FROM sym
      |), pr0 AS (
      |  SELECT node, CAST(1000000 AS BIGINT) AS pri FROM nodes
      |)""".stripMargin
    base + pageRankStepsSql + pageRankTailSql("doc_id")
  }

  /** The audio dHash re-derived from the WAV fixture CONSTRUCTION
    * (round 18 — the dhashRowsCtesSql recipe on the time axis):
    * mixdown sample at position i = sum over channels of the signed LE
    * int16 at text bytes ((⌊i·nf/65⌋·ch + cc)·2, +1), one bit per
    * adjacent comparison, row bytes packed by `SUM(bit · (1 << x))`.
    * The Spark side chunk-walks the ACTUAL RIFF bytes (variable junk
    * chunk ⇒ variable data offset) — two independent paths to the
    * same 64 bits. Shared by the fingerprint, pairs, and incremental
    * rows; `withVariants` adds the +6M one-character-substitution
    * near-variants (audioCloneFixture's second plant — same geometry,
    * one moved sample byte) the pairs/incremental fixtures carry. */
  private def audioHashCtesSql(withVariants: Boolean): String = {
    val dCols = (0 until 8).map(y =>
      s"    MAX(CASE WHEN gy = $y THEN d END) AS d$y").mkString(",\n")
    val variantArm = if (withVariants)
      s"""
       |  UNION ALL
       |  SELECT doc_id + 6000000 AS doc_id,
       |    CAST(doc_id % 2 + 1 AS INT) AS ch,
       |    CAST(n_chars % 33 + 32 AS INT) AS nf,
       |    CAST(doc_id % 1000 + 8000 AS INT) AS sr,
       |    rpad(concat(substr(text, 1, 9), 'Q', substr(text, 11)), 256, 'x')
       |      AS padded
       |  FROM documents WHERE doc_id % 41 = 0""".stripMargin
    else ""
    s"""WITH wavp AS (
       |  SELECT doc_id, CAST(doc_id % 2 + 1 AS INT) AS ch,
       |    CAST(n_chars % 33 + 32 AS INT) AS nf,
       |    CAST(doc_id % 1000 + 8000 AS INT) AS sr,
       |    rpad(text, 256, 'x') AS padded
       |  FROM documents$variantArm
       |), raw AS (
       |  SELECT w.doc_id, i.ii,
       |    unicode(substr(w.padded,
       |      CAST((((i.ii * w.nf) // 65) * w.ch + c.cc) * 2 + 1 AS INT), 1))
       |    + 256 * unicode(substr(w.padded,
       |      CAST((((i.ii * w.nf) // 65) * w.ch + c.cc) * 2 + 2 AS INT), 1))
       |    AS u
       |  FROM wavp w
       |  CROSS JOIN (SELECT unnest(range(0, 65)) AS ii) i
       |  CROSS JOIN (SELECT unnest(range(0, 2)) AS cc) c
       |  WHERE c.cc < w.ch
       |), smp AS (
       |  SELECT doc_id, ii,
       |    CAST(SUM(CASE WHEN u >= 32768 THEN u - 65536 ELSE u END) AS INT)
       |      AS v
       |  FROM raw GROUP BY 1, 2
       |), abits AS (
       |  SELECT a.doc_id, a.ii AS j,
       |    CASE WHEN a.v < b.v THEN 1 ELSE 0 END AS bit
       |  FROM smp a JOIN smp b ON a.doc_id = b.doc_id AND b.ii = a.ii + 1
       |  WHERE a.ii < 64
       |), adrows AS (
       |  SELECT doc_id, j // 8 AS gy,
       |    CAST(SUM(bit * (1 << (j % 8))) AS INT) AS d
       |  FROM abits GROUP BY 1, 2
       |), ahashes AS (
       |  SELECT doc_id,
       |$dCols
       |  FROM adrows GROUP BY 1
       |)""".stripMargin
  }

  private val audioFingerprintOracle: String =
    audioHashCtesSql(false) + """
      |SELECT w.doc_id, CAST(1 AS INT) AS is_wav, w.ch AS channels,
      |  w.sr AS sample_rate, CAST(w.nf AS BIGINT) AS n_frames,
      |  h.d0, h.d1, h.d2, h.d3, h.d4, h.d5, h.d6, h.d7
      |FROM ahashes h JOIN wavp w USING (doc_id)""".stripMargin

  /** Star-first like the Spark side (the dhashPairsCtesSql shape on
    * audio hashes): identical-hash members star to their min-id keeper
    * at hamming 0; only DISTINCT hashes enter the band join — 8
    * one-byte bands are recall-complete to hamming ≤ 7 by pigeonhole,
    * covering the ≤ 2 bar. Clones planted at +3M reuse their
    * original's payload, so their bits are the original's rows. */
  private val audioPairsCtesSql: String = {
    val ds = (0 until 8).map(y => s"d$y").mkString(", ")
    val bandV = (0 until 8).map(y => s"WHEN $y THEN d$y").mkString(" ")
    audioHashCtesSql(true) + s"""
      |, planted AS (
      |  SELECT doc_id, $ds FROM ahashes
      |  UNION ALL
      |  SELECT doc_id + 3000000, $ds FROM ahashes
      |  WHERE doc_id % 29 = 0 AND doc_id < 6000000
      |), keyed AS (
      |  SELECT doc_id, $ds,
      |    MIN(doc_id) OVER (PARTITION BY $ds) AS keeper
      |  FROM planted
      |), star AS (
      |  SELECT keeper AS id_a, doc_id AS id_b, 0 AS hamming
      |  FROM keyed WHERE doc_id <> keeper
      |), reps AS (
      |  SELECT doc_id, $ds FROM keyed WHERE doc_id = keeper
      |), bands AS (
      |  SELECT doc_id, b.i AS band, CASE b.i $bandV END AS v
      |  FROM reps CROSS JOIN (SELECT unnest(range(0, 8)) AS i) b
      |), cand AS (
      |  SELECT DISTINCT a.doc_id AS id_a, bb.doc_id AS id_b
      |  FROM bands a JOIN bands bb ON a.band = bb.band AND a.v = bb.v
      |    AND a.doc_id < bb.doc_id
      |), ham AS (
      |  SELECT c.id_a, c.id_b,
      |    ${hamSql("pa", "pb")} AS hamming
      |  FROM cand c JOIN reps pa ON pa.doc_id = c.id_a
      |    JOIN reps pb ON pb.doc_id = c.id_b
      |), apairs AS (
      |  SELECT id_a, id_b, hamming FROM star
      |  UNION ALL
      |  SELECT id_a, id_b, hamming FROM ham WHERE hamming <= 4
      |)""".stripMargin
  }

  private val audioPairsOracle: String =
    audioPairsCtesSql + """
      |SELECT id_a, id_b, hamming FROM apairs""".stripMargin

  /** Components over the audio star+near edge set — the
    * dedup_components recursive min-label closure on the audio
    * modality (the dhashClustersOracle recipe). */
  private val audioClustersOracle: String =
    audioPairsCtesSql.replaceFirst("WITH ", "WITH RECURSIVE ") + """
      |, asym AS (
      |  SELECT id_a AS src, id_b AS dst FROM apairs
      |  UNION
      |  SELECT id_b AS src, id_a AS dst FROM apairs
      |), areach AS (
      |  SELECT DISTINCT src AS id, src AS comp FROM asym
      |  UNION
      |  SELECT s.dst AS id, r.comp FROM areach r JOIN asym s ON s.src = r.id
      |)
      |SELECT id, min(comp) AS component FROM areach GROUP BY id""".stripMargin

  /** The audio incremental twin's survivor rules — the
    * dhashIncrementalOracle recipe on audio hashes: a batch clip
    * survives iff NO history clip and NO smaller-id batch clip sits
    * within hamming ≤ 2; exact by the multiprobe recall guarantee.
    * Geometry columns come from the ORIGINAL doc's wavp row (clones
    * are payload-identical, and +3M preserves doc_id mod 2 and mod
    * 1000, so the parsed channels/sample_rate equal the originals'). */
  /** hashes + parsed geometry for the full planted audio relation
    * (base + clones at +3M; the +6M variants already ride `ahashes`)
    * — the one pall CTE the incremental and streaming survivor
    * oracles share (r18 review: it had been pasted twice). Clones
    * join geometry by the ORIGINAL doc_id: payloads are
    * byte-identical and +3M preserves doc_id mod 2 / mod 1000, so
    * the parsed channels/sample_rate equal the originals'. */
  private val audioPallSql: String = s"""
      |, pall AS (
      |  SELECT h.doc_id, w.ch, w.sr, w.nf, $hdsSql
      |  FROM ahashes h JOIN wavp w USING (doc_id)
      |  UNION ALL
      |  SELECT h.doc_id + 3000000, w.ch, w.sr, w.nf, $hdsSql
      |  FROM ahashes h JOIN wavp w USING (doc_id)
      |  WHERE h.doc_id % 29 = 0 AND h.doc_id < 6000000
      |)""".stripMargin

  private val audioIncrementalOracle: String = {
    audioHashCtesSql(true) + audioPallSql + s"""
      |, batch AS (
      |  SELECT * FROM pall WHERE doc_id % 10 >= 8 OR doc_id >= 3000000
      |), hist AS (
      |  SELECT * FROM pall WHERE doc_id % 10 < 8 AND doc_id < 3000000
      |)
      |SELECT bt.doc_id, CAST(1 AS INT) AS is_wav, bt.ch AS channels,
      |  bt.sr AS sample_rate, CAST(bt.nf AS BIGINT) AS n_frames,
      |  bt.d0, bt.d1, bt.d2, bt.d3, bt.d4, bt.d5, bt.d6, bt.d7
      |FROM batch bt
      |WHERE NOT EXISTS (
      |    SELECT 1 FROM hist hh WHERE ${hamSql("bt", "hh")} <= 2)
      |  AND NOT EXISTS (
      |    SELECT 1 FROM batch b2 WHERE b2.doc_id < bt.doc_id
      |      AND ${hamSql("bt", "b2")} <= 2)""".stripMargin
  }

  /** The audio streaming keeper's survivor rules — the
    * dhashStreamNearOracle recipe on the audio relation: a row
    * survives iff NO smaller-id row (original, clone, or one-sample
    * variant) sits within hamming ≤ 2. Exact by CONSTRUCTION of the
    * keeper machine, not a fixture property. */
  private val audioStreamNearOracle: String = {
    audioHashCtesSql(true) + audioPallSql + s"""
      |, drops AS (
      |  SELECT DISTINCT b2.doc_id
      |  FROM pall a JOIN pall b2 ON a.doc_id < b2.doc_id
      |  WHERE ${hamSql("a", "b2")} <= 2
      |)
      |SELECT doc_id, CAST(1 AS INT) AS is_wav, ch AS channels,
      |  sr AS sample_rate, CAST(nf AS BIGINT) AS n_frames,
      |  d0, d1, d2, d3, d4, d5, d6, d7
      |FROM pall WHERE doc_id NOT IN (SELECT doc_id FROM drops)""".stripMargin
  }

  // Seq, not Map (r17 advice #5 applied to the oracle registry too):
  // a within-family duplicate key survives to OracleSql.all's
  // duplicate require instead of last-wins-collapsing silently.
  val entries: Seq[(String, String)] = Seq(
    "multimodal_audio_fingerprint" -> audioFingerprintOracle,
    "multimodal_audio_pairs" -> audioPairsOracle,
    "multimodal_audio_clusters" -> audioClustersOracle,
    "multimodal_audio_incremental" -> audioIncrementalOracle,
    "stream_audio_near" -> audioStreamNearOracle,
    "multimodal_phash_pagerank" -> dhashPageRankOracle,

    "multimodal_profile" ->
      """SELECT d.doc_id, d.lang, d.source,
        |  CAST(length(d.text) AS INT) AS n_chars_calc,
        |  CAST(len(regexp_extract_all(d.text, '\S+')) AS INT) AS ws_token_count,
        |  CAST(len(regexp_extract_all(d.text, '[\p{L}]+|[\p{N}]+|[^\p{L}\p{N}\s]')) AS INT) AS bpe_token_count,
        |  e.label,
        |  CAST(len(e.embedding) AS INT) AS emb_dim,
        |  ROUND(sqrt(list_sum(list_transform(CAST(e.embedding AS DOUBLE[]), x -> x * x))), 6) AS emb_norm
        |FROM documents d JOIN embeddings e ON d.doc_id = e.vec_id""".stripMargin,

    "multimodal_binary_stats" ->
      """SELECT doc_id,
        |  CAST(octet_length(encode(text)) AS INT) AS byte_len,
        |  md5(text) AS content_md5
        |FROM documents""".stripMargin,

    // byte slicing via the hex string (2 chars/byte): frame i covers
    // bytes [i*stride, i*stride+16) with stride = floor(len/4) bytes,
    // exactly Spark's substring-on-binary offsets.
    "multimodal_frame_sample" ->
      """WITH b AS (
        |  SELECT doc_id, hex(encode(text)) AS h,
        |    GREATEST(octet_length(encode(text)) // 4, 1) AS stride
        |  FROM documents
        |)
        |SELECT doc_id,
        |  substring(h, 0 * stride * 2 + 1, 32) AS frame_0,
        |  substring(h, 1 * stride * 2 + 1, 32) AS frame_1,
        |  substring(h, 2 * stride * 2 + 1, 32) AS frame_2,
        |  substring(h, 3 * stride * 2 + 1, 32) AS frame_3
        |FROM b""".stripMargin,

    // nearest-neighbor twin: same integer index formula, char-based
    // substr/rpad semantics identical across engines on the ASCII
    // fixture (p: x = p%8, y = p//8; src = (y*8//4)*16 + x*16//8).
    "multimodal_resize" ->
      """WITH r AS (
        |  SELECT doc_id, rpad(substr(text, 1, 128), 128, 'x') AS raster
        |  FROM documents
        |)
        |SELECT doc_id,
        |  array_to_string(list_transform(range(0, 32),
        |    p -> substr(raster,
        |      ((p // 8) * 8 // 4) * 16 + ((p % 8) * 16 // 8) + 1, 1)),
        |    '') AS resized
        |FROM r""".stripMargin,

    "multimodal_payload_meta" ->
      """WITH b AS (
        |  SELECT doc_id, encode(text) AS payload,
        |    substring(hex(encode(text)), 1, 8) AS head_hex
        |  FROM documents
        |)
        |SELECT doc_id, head_hex,
        |  CASE WHEN starts_with(head_hex, '89504E47') THEN 'image/png'
        |       WHEN starts_with(head_hex, 'FFD8FF') THEN 'image/jpeg'
        |       WHEN starts_with(head_hex, '52494646') THEN 'audio/wav'
        |       ELSE 'application/octet-stream' END AS mime,
        |  CAST(octet_length(payload) AS INT) AS bytes
        |FROM b""".stripMargin,

    // The oracle recomputes the PLANTED values from the source columns
    // (mediaFixture's arithmetic), never touching bytes — the Spark
    // side must recover the same numbers by parsing the headers it
    // built, so agreement proves the byte-level decode.
    "multimodal_decode" ->
      """WITH m AS (
        |  SELECT doc_id,
        |    CAST(doc_id % 4 AS INT) AS kind,
        |    CAST(doc_id % 797 + 1 AS INT) AS w,
        |    CAST(n_chars % 613 + 1 AS INT) AS h,
        |    CAST(doc_id % 5 AS INT) AS m5
        |  FROM documents)
        |SELECT doc_id,
        |  CASE kind WHEN 0 THEN 'png' WHEN 1 THEN 'jpeg'
        |    WHEN 2 THEN 'wav' ELSE 'unknown' END AS format,
        |  CAST(CASE WHEN kind IN (0, 1) THEN w END AS INT) AS width,
        |  CAST(CASE WHEN kind IN (0, 1) THEN h END AS INT) AS height,
        |  CAST(CASE WHEN kind IN (0, 1) THEN 8
        |    WHEN kind = 2 THEN 16 END AS INT) AS bit_depth,
        |  CAST(CASE
        |    WHEN kind = 0 THEN
        |      CASE m5 WHEN 0 THEN 1 WHEN 1 THEN 3 WHEN 2 THEN 1
        |        WHEN 3 THEN 2 ELSE 4 END
        |    WHEN kind = 1 THEN CASE WHEN doc_id % 8 = 1 THEN 1 ELSE 3 END
        |    WHEN kind = 2 THEN CASE WHEN doc_id % 16 = 2 THEN 1 ELSE 2 END
        |  END AS INT) AS channels
        |FROM m""".stripMargin,

    // PPM pixel-path oracle (round 12): recompute the 4×4 thumbnail
    // channel stats from the fixture CONSTRUCTION — geometry from
    // (doc_id, n_chars), pixel bytes from the ASCII text (unicode(ch)
    // == byte, the pinned charset) padded with 'x', thumbnail source
    // index ⌊y·h/4⌋·w + ⌊x·w/4⌋, channel byte at src·3 + c. The Spark
    // side reads geometry and bytes from the ACTUAL payload, so the
    // hash proves the header parse and byte-offset arithmetic.
    "multimodal_ppm_stats" ->
      """WITH ppm AS (
        |  SELECT doc_id,
        |    CAST(doc_id % 7 + 2 AS INT) AS w,
        |    CAST(n_chars % 5 + 2 AS INT) AS h,
        |    rpad(text, 144, 'x') AS padded
        |  FROM documents
        |), pix AS (
        |  SELECT doc_id, w, h, c.cc,
        |    unicode(substr(padded,
        |      CAST((((y.yy * h) // 4) * w + ((x.xx * w) // 4)) * 3
        |        + c.cc + 1 AS INT), 1)) AS v
        |  FROM ppm
        |  CROSS JOIN (SELECT unnest(range(0, 4)) AS yy) y
        |  CROSS JOIN (SELECT unnest(range(0, 4)) AS xx) x
        |  CROSS JOIN (SELECT unnest(range(0, 3)) AS cc) c
        |)
        |SELECT doc_id, CAST(1 AS INT) AS is_ppm, w AS width, h AS height,
        |  ROUND(AVG(CASE WHEN cc = 0 THEN v END), 6) AS r_mean,
        |  CAST(MIN(CASE WHEN cc = 0 THEN v END) AS INT) AS r_min,
        |  CAST(MAX(CASE WHEN cc = 0 THEN v END) AS INT) AS r_max,
        |  ROUND(AVG(CASE WHEN cc = 1 THEN v END), 6) AS g_mean,
        |  CAST(MIN(CASE WHEN cc = 1 THEN v END) AS INT) AS g_min,
        |  CAST(MAX(CASE WHEN cc = 1 THEN v END) AS INT) AS g_max,
        |  ROUND(AVG(CASE WHEN cc = 2 THEN v END), 6) AS b_mean,
        |  CAST(MIN(CASE WHEN cc = 2 THEN v END) AS INT) AS b_min,
        |  CAST(MAX(CASE WHEN cc = 2 THEN v END) AS INT) AS b_max
        |FROM pix GROUP BY doc_id, w, h""".stripMargin,

    // BMP pixel-path oracle (round 13): recompute the 4×4 thumbnail
    // stats from the fixture CONSTRUCTION — geometry from (n_chars,
    // doc_id), and the bottom-up + BGR layout folded into the TEXT
    // index formula: image pixel (sx, sy) file-channel fc lives at
    // text byte ((h−1−sy)·w + sx)·3 + fc (file row h−1−sy carries
    // text slice h−1−sy). Output r/g/b = file channels 2/1/0. The
    // Spark side reads LE header fields, data offset, stride and flip
    // from the ACTUAL bytes — two independent paths to one answer.
    "multimodal_phash" -> dhashOracle,

    "multimodal_phash_pairs" -> dhashPairsOracle,

    "multimodal_phash_clusters" -> dhashClustersOracle,

    // Incremental image dedup (r16): brute-force all-pairs NOT EXISTS
    // restatement — exact because the Spark side's multiprobe banding
    // has guaranteed recall to hamming <= 7 (maxHamming = 2 here) and
    // its within-batch drop set is exactly keep-min (clones star to
    // their keeper, keeper pairs recall-complete). Hamming spelled as
    // the shared 64 shift-and-mask terms.
    "multimodal_phash_incremental" -> dhashIncrementalOracle,

    "stream_phash_near" -> dhashStreamNearOracle,

    "multimodal_bmp_stats" ->
      """WITH bmp AS (
        |  SELECT doc_id,
        |    CAST(n_chars % 7 + 2 AS INT) AS w,
        |    CAST(doc_id % 5 + 2 AS INT) AS h,
        |    rpad(text, 144, 'x') AS padded
        |  FROM documents
        |), pix AS (
        |  SELECT doc_id, w, h, c.fc,
        |    unicode(substr(padded,
        |      CAST(((h - 1 - ((y.yy * h) // 4)) * w + ((x.xx * w) // 4)) * 3
        |        + c.fc + 1 AS INT), 1)) AS v
        |  FROM bmp
        |  CROSS JOIN (SELECT unnest(range(0, 4)) AS yy) y
        |  CROSS JOIN (SELECT unnest(range(0, 4)) AS xx) x
        |  CROSS JOIN (SELECT unnest(range(0, 3)) AS fc) c
        |)
        |SELECT doc_id, CAST(1 AS INT) AS is_bmp, w AS width, h AS height,
        |  ROUND(AVG(CASE WHEN fc = 2 THEN v END), 6) AS r_mean,
        |  CAST(MIN(CASE WHEN fc = 2 THEN v END) AS INT) AS r_min,
        |  CAST(MAX(CASE WHEN fc = 2 THEN v END) AS INT) AS r_max,
        |  ROUND(AVG(CASE WHEN fc = 1 THEN v END), 6) AS g_mean,
        |  CAST(MIN(CASE WHEN fc = 1 THEN v END) AS INT) AS g_min,
        |  CAST(MAX(CASE WHEN fc = 1 THEN v END) AS INT) AS g_max,
        |  ROUND(AVG(CASE WHEN fc = 0 THEN v END), 6) AS b_mean,
        |  CAST(MIN(CASE WHEN fc = 0 THEN v END) AS INT) AS b_min,
        |  CAST(MAX(CASE WHEN fc = 0 THEN v END) AS INT) AS b_max
        |FROM pix GROUP BY doc_id, w, h""".stripMargin,

    // WAV sample-path oracle (round 13): recompute the k=8 sampled
    // per-channel stats from the fixture CONSTRUCTION — geometry from
    // (doc_id, n_chars), sample i of channel cc at text bytes
    // ((⌊i·nf/8⌋·ch + cc)·2, +1) as signed LE int16. The Spark side
    // chunk-walks the ACTUAL bytes (junk chunk ⇒ variable data
    // offset) — two independent paths to one answer. A mono doc's
    // channel-2 aggregates run over zero rows ⇒ NULL, matching the
    // operator's null c2 contract.
    "multimodal_wav_stats" ->
      """WITH wav AS (
        |  SELECT doc_id,
        |    CAST(doc_id % 2 + 1 AS INT) AS ch,
        |    CAST(n_chars % 9 + 4 AS INT) AS nf,
        |    CAST(doc_id % 1000 + 8000 AS INT) AS sr,
        |    rpad(text, 48, 'x') AS padded
        |  FROM documents
        |), smp AS (
        |  SELECT doc_id, ch, nf, sr, c.cc,
        |    unicode(substr(padded,
        |      CAST((((i.ii * nf) // 8) * ch + c.cc) * 2 + 1 AS INT), 1))
        |    + 256 * unicode(substr(padded,
        |      CAST((((i.ii * nf) // 8) * ch + c.cc) * 2 + 2 AS INT), 1)) AS u
        |  FROM wav
        |  CROSS JOIN (SELECT unnest(range(0, 8)) AS ii) i
        |  CROSS JOIN (SELECT unnest(range(0, 2)) AS cc) c
        |  WHERE c.cc < ch
        |), sgn AS (
        |  SELECT doc_id, ch, nf, sr, cc,
        |    CASE WHEN u >= 32768 THEN u - 65536 ELSE u END AS s
        |  FROM smp
        |)
        |SELECT doc_id, CAST(1 AS INT) AS is_wav, ch AS channels,
        |  sr AS sample_rate, CAST(nf AS BIGINT) AS n_frames,
        |  ROUND(AVG(CASE WHEN cc = 0 THEN s END), 6) AS c1_mean,
        |  CAST(MIN(CASE WHEN cc = 0 THEN s END) AS INT) AS c1_min,
        |  CAST(MAX(CASE WHEN cc = 0 THEN s END) AS INT) AS c1_max,
        |  ROUND(AVG(CASE WHEN cc = 1 THEN s END), 6) AS c2_mean,
        |  CAST(MIN(CASE WHEN cc = 1 THEN s END) AS INT) AS c2_min,
        |  CAST(MAX(CASE WHEN cc = 1 THEN s END) AS INT) AS c2_max
        |FROM sgn GROUP BY doc_id, ch, nf, sr""".stripMargin,
  )
}
