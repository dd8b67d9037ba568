package graft

import graft.functions.{NanOps, TextFunctions}
import graft.operators.{AggSpec, Dedup, Dsir, Ewm, GraphOps, GroupBy, GroupScatter, Joins, LangModel, Margins, Multimodal, Pca, Pq, Privacy, Resample, Reshape, RollingOps, Sampling, SelectionOps, Similarity, Snapshot, Vocab}
import graft.streaming.{EventStreams, StatefulSessions}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Driver contract — one `queries` entry (+ DuckDB `oracleSql`) per
  * implemented operator from SURVEY.md §2.
  *
  * Determinism policy (so Spark parquet output hash-matches the
  * DuckDB oracle bit-for-bit regardless of partitioning):
  *   - floating sums/means go through exact decimal accumulation on
  *     BOTH sides (`graft.functions.Num` ⇔ `CAST(SUM(CAST(x AS
  *     DECIMAL(28,6))) AS DOUBLE)`),
  *   - results are explicitly ordered by a unique key,
  *   - algorithm-dependent aggregates (var/std) are rounded on both
  *     sides.
  */
object SparkEntry {

  // ------------------------------------------------------------ helpers

  private def T(s: SparkSession, dir: String, name: String): DataFrame =
    s.read.parquet(s"$dir/$name.parquet")

  private def liKeys = Seq(col("l_returnflag"), col("l_linestatus"))
  private def shipMask: Column =
    col("l_shipdate") <= to_timestamp(lit("1998-09-02 00:00:00"))

  /** Unique physical-order surrogate for lineitem (SURVEY §7.4: Spark
    * has no implicit row order, so positional ops key on this).
    */
  private def liOrd: Column = col("l_orderkey") * 10 + col("l_linenumber")

  /** SQL-side twin of Num.exactSum. */
  private def dsum(x: String): String =
    s"CAST(SUM(CAST($x AS DECIMAL(28,6))) AS DOUBLE)"
  private def dmean(x: String): String = s"${dsum(x)} / COUNT($x)"

  private final case class Q(
      name: String,
      fn: (SparkSession, String) => DataFrame,
      sql: Option[String])

  /** DuckDB replay of Vocab.learnBpeMerges as unrolled CTEs: per
    * round, adjacent-pair counts over the current symbol table, the
    * (freq DESC, left ASC, right ASC) argmax, and the greedy
    * left-to-right rewrite as a list_reduce fold (elements lifted to
    * single-element lists so the accumulator type matches — the same
    * trick as PortableHash's fold). `corpusSql` must yield a `text`
    * column. Kept in lockstep with the engine.
    */
  private def bpeMergesSql(corpusSql: String, rounds: Int): String = {
    val iterCtes = (0 until rounds).map { i =>
      s""" p$i AS (SELECT syms[i] AS a, syms[i+1] AS b, SUM(freq) AS pf
         |   FROM s$i, unnest(generate_series(1, len(syms)-1)) t(i)
         |   WHERE len(syms) >= 2 GROUP BY 1, 2),
         | m$i AS (SELECT a, b, pf FROM p$i ORDER BY pf DESC, a, b LIMIT 1),
         | s${i + 1} AS (SELECT freq,
         |   list_reduce(list_prepend(CAST([] AS VARCHAR[]), list_transform(syms, x -> [x])),
         |     (acc, xs) -> CASE WHEN len(acc) > 0 AND acc[-1] = m.a AND xs[1] = m.b
         |                  THEN list_append(acc[1:len(acc)-1], m.a || m.b)
         |                  ELSE list_append(acc, xs[1]) END) AS syms
         |   FROM s$i CROSS JOIN m$i m)""".stripMargin
    }.mkString(",\n")
    val unions = (0 until rounds).map { i =>
      s"SELECT CAST(${i + 1} AS INT) AS merge_rank, a AS \"left\", b AS \"right\", " +
        s"a || b AS merged, CAST(pf AS BIGINT) AS pair_freq FROM m$i"
    }.mkString("\nUNION ALL ")
    s"""WITH w0 AS (SELECT unnest(string_split(text, ' ')) AS word FROM ($corpusSql)),
       | wf AS (SELECT word, CAST(COUNT(*) AS BIGINT) AS freq FROM w0
       |   WHERE word <> '' GROUP BY 1),
       | s0 AS (SELECT list_transform(generate_series(1, length(word)),
       |     i -> substr(word, i, 1)) AS syms, freq FROM wf),
       |$iterCtes
       |$unions
       |ORDER BY merge_rank""".stripMargin
  }

  /** DuckDB replay of Dedup.ngramJaccardPairs (word-bigram shingles,
    * exact Jaccard, thresholded), with the optional doc-frequency cap
    * applied before pairing exactly as the engine does. The SAME SQL
    * oracles the plain inverted-index path and the prefix-filtered
    * path (`prefixFilter = true`): prefix filtering is lossless, so
    * both must hash-match this all-pairs ground truth.
    */
  private def ngramOracleSql(threshold: Double, cap: Option[Int]): String = {
    val universe = cap match {
      case scala.Some(c) =>
        s"""| keep AS (SELECT s FROM sh0 GROUP BY s HAVING COUNT(*) <= $c),
            | sh AS (SELECT sh0.doc_id, sh0.s FROM sh0 JOIN keep USING (s)),"""
          .stripMargin
      case scala.None => " sh AS (SELECT doc_id, s FROM sh0),"
    }
    s"""WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
       | sh0 AS (SELECT DISTINCT doc_id,
       |   unnest(list_transform(range(1, len(ws)), i -> ws[i] || ' ' || ws[i+1])) AS s
       |   FROM w),
       |$universe
       | cnt AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY 1),
       | inter AS (SELECT a.doc_id AS ida, b.doc_id AS idb, COUNT(*) AS i
       |   FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id GROUP BY 1, 2)
       |SELECT ida, idb, i * 1.0 / (ca.n + cb.n - i) AS jaccard
       |FROM inter JOIN cnt ca ON ida = ca.doc_id JOIN cnt cb ON idb = cb.doc_id
       |WHERE i * 1.0 / (ca.n + cb.n - i) >= $threshold
       |ORDER BY ida, idb""".stripMargin
  }

  /** DuckDB replay of Dedup.dedupByClusters over the all-pairs n-gram
    * Jaccard edge set: same shingle/intersection CTEs as
    * [[ngramOracleSql]], then connected components via a RECURSIVE
    * reachability CTE (every vertex accumulates all reachable labels;
    * the min is the component id — set-semantics UNION terminates it),
    * then one representative per cluster by minimal
    * `(-length(text), doc_id)`. An independent formulation of
    * transitive closure: the engine's alternating star rounds never
    * enumerate reachability.
    */
  private def ccOracleSql(threshold: Double): String =
    s"""WITH RECURSIVE w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
       | sh0 AS (SELECT DISTINCT doc_id,
       |   unnest(list_transform(range(1, len(ws)), i -> ws[i] || ' ' || ws[i+1])) AS s
       |   FROM w),
       | cnt AS (SELECT doc_id, COUNT(*) AS n FROM sh0 GROUP BY 1),
       | inter AS (SELECT a.doc_id AS ida, b.doc_id AS idb, COUNT(*) AS i
       |   FROM sh0 a JOIN sh0 b ON a.s = b.s AND a.doc_id < b.doc_id GROUP BY 1, 2),
       | prs AS (SELECT ida, idb FROM inter JOIN cnt ca ON ida = ca.doc_id
       |   JOIN cnt cb ON idb = cb.doc_id
       |   WHERE i * 1.0 / (ca.n + cb.n - i) >= $threshold),
       | edges AS (SELECT ida AS u, idb AS v FROM prs UNION SELECT idb, ida FROM prs),
       | verts AS (SELECT DISTINCT u AS v FROM edges),
       | reach(v, lbl) AS (
       |   SELECT v, v FROM verts
       |   UNION
       |   SELECT e.u, r.lbl FROM edges e JOIN reach r ON e.v = r.v
       | ),
       | cc AS (SELECT v AS doc_id, MIN(lbl) AS cluster_id FROM reach GROUP BY v),
       | lab AS (SELECT d.doc_id, -length(d.text) AS o,
       |   COALESCE(cc.cluster_id, d.doc_id) AS cluster_id
       |   FROM documents d LEFT JOIN cc USING (doc_id)),
       | rep AS (SELECT cluster_id, (MIN(struct_pack(o := o, d := doc_id))).d AS r
       |   FROM lab GROUP BY cluster_id)
       |SELECT lab.doc_id, lab.cluster_id, lab.doc_id = rep.r AS kept
       |FROM lab JOIN rep USING (cluster_id) ORDER BY lab.doc_id""".stripMargin

  /** DuckDB replay of TextFunctions.redactPii/piiStats: the SAME
    * injected-PII input expression, then the redaction table from
    * [[graft.functions.TextFunctions.PiiPatterns]] (single source of
    * truth — patterns are never re-stated here) applied in order with
    * the 'g' flag (DuckDB replaces first-match by default; Spark
    * replaces all), counting each category on the text as redacted so
    * far, exactly as piiStats does.
    */
  private def piiOracleSql: String = {
    val inj = "text || ' reach user' || CAST(doc_id AS VARCHAR) || " +
      "'@test.org from 10.0.' || CAST(doc_id % 256 AS VARCHAR) || " +
      "'.7 id 123-45-6789 tel +4915123456789 alt 212-555-0187'"
    val (cleanExpr, cntCols) =
      graft.functions.TextFunctions.PiiPatterns.foldLeft((inj, Seq.empty[String])) {
        case ((e, acc), (cat, pat, tok)) =>
          (s"regexp_replace($e, '$pat', '$tok', 'g')",
            acc :+ s"CAST(len(regexp_extract_all($e, '$pat')) AS BIGINT) AS n_$cat")
      }
    s"""SELECT doc_id, $cleanExpr AS clean, ${cntCols.mkString(", ")}
       |FROM documents ORDER BY doc_id""".stripMargin
  }

  /** DuckDB replay of TextFunctions.scriptFractions/langIdScript: the
    * SAME scripted-text injection, the script character classes taken
    * from [[graft.functions.TextFunctions.ScriptClasses]] (single
    * source of truth — the \x{...} ranges are never re-stated here),
    * fractions over non-whitespace characters, and the threshold
    * cascade with the Latin marker langId as the fall-through.
    */
  private def scriptsOracleSql: String = {
    import graft.functions.TextFunctions.{GarbageClass, ScriptClasses}
    val cnts = (ScriptClasses :+ ("garbage" -> GarbageClass)).map {
      case (name, cls) =>
        s"len(regexp_extract_all(t, '$cls')) AS c_$name"
    }.mkString(",\n        |  ")
    val fracs = (ScriptClasses.map(_._1) :+ "garbage").map { name =>
      s"CASE WHEN nw = 0 THEN NULL ELSE CAST(c_$name AS DOUBLE) / CAST(nw AS DOUBLE) END AS f_$name"
    }.mkString(",\n        |  ")
    s"""WITH s AS (SELECT doc_id,
        |  CASE CAST(doc_id % 7 AS INT)
        |    WHEN 1 THEN 'Привет это тест кириллицы в документе'
        |    WHEN 2 THEN 'مرحبا بالعالم هذا نص عربي للاختبار'
        |    WHEN 3 THEN '你好世界这是一个中文测试文档'
        |    WHEN 4 THEN 'こんにちは世界これはテストです'
        |    WHEN 5 THEN '안녕하세요 세계 이것은 한국어 테스트'
        |    WHEN 6 THEN 'noisy' || chr(7) || chr(7) || chr(7) || 'data'
        |    ELSE text END AS t
        |  FROM documents),
        |c AS (SELECT doc_id, t,
        |  len(regexp_replace(t, '\\s', '', 'g')) AS nw,
        |  $cnts,
        |  len(list_filter(string_split(t,' '), w -> w IN ('the','of','and','is','to'))) AS c_en,
        |  len(list_filter(string_split(t,' '), w -> w IN ('der','die','das','und','ist'))) AS c_de,
        |  len(list_filter(string_split(t,' '), w -> w IN ('le','la','et','est','les'))) AS c_fr,
        |  len(list_filter(string_split(t,' '), w -> w IN ('el','los','es','y','las'))) AS c_es
        |  FROM s),
        |f AS (SELECT doc_id, nw, c_en, c_de, c_fr, c_es,
        |  GREATEST(c_en, c_de, c_fr, c_es) AS best,
        |  $fracs
        |  FROM c)
        |SELECT doc_id, f_latin, f_cyrillic, f_arabic, f_han, f_kana, f_hangul, f_garbage,
        |  CASE WHEN f_hangul > 0.3 THEN 'ko'
        |       WHEN f_kana > 0.05 THEN 'ja'
        |       WHEN f_han > 0.3 THEN 'zh'
        |       WHEN f_cyrillic > 0.3 THEN 'ru'
        |       WHEN f_arabic > 0.3 THEN 'ar'
        |       WHEN c_en = best AND best > 0 THEN 'en'
        |       WHEN c_de = best AND best > 0 THEN 'de'
        |       WHEN c_fr = best AND best > 0 THEN 'fr'
        |       WHEN c_es = best AND best > 0 THEN 'es'
        |       ELSE 'und' END AS lang
        |FROM f ORDER BY doc_id""".stripMargin
  }

  /** DuckDB replay of Similarity.bm25TopK: same one-pass corpus stats
    * (N, avgdl, per-term df), the same RATIONAL idf, and the scoring
    * expression with identical literal values (k1/b chosen exactly
    * representable in the gate) and left-to-right association, so the
    * doubles match bit-for-bit.
    */
  private def bm25OracleSql(terms: Seq[String], k: Int, k1: Double,
      b: Double): String = {
    val dfCols = terms.indices.map { i =>
      s"SUM(CASE WHEN list_contains(toks, '${terms(i)}') THEN 1 ELSE 0 END) AS df$i"
    }.mkString(", ")
    val tfCols = terms.indices.map { i =>
      s"CAST(len(list_filter(toks, x -> x = '${terms(i)}')) AS DOUBLE) AS tf$i"
    }.mkString(", ")
    val scoreSql = terms.indices.map { i =>
      s"((CAST(n AS DOUBLE) - CAST(df$i AS DOUBLE) + 0.5) / " +
        s"(CAST(df$i AS DOUBLE) + 0.5)) * (tf$i * ${k1 + 1.0}) / " +
        s"(tf$i + $k1 * (${1.0 - b} + $b * dl / avgdl))"
    }.mkString(" + ")
    s"""WITH w AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
       | st AS (SELECT COUNT(*) AS n,
       |   CAST(SUM(len(toks)) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS avgdl,
       |   $dfCols FROM w),
       | sc AS (SELECT doc_id, CAST(len(toks) AS DOUBLE) AS dl, $tfCols FROM w),
       | scored AS (SELECT doc_id, $scoreSql AS score FROM sc, st),
       | ranked AS (SELECT doc_id, score,
       |   ROW_NUMBER() OVER (ORDER BY score DESC, doc_id) AS rank
       |   FROM scored WHERE score > 0)
       |SELECT doc_id, score, CAST(rank AS BIGINT) AS rank
       |FROM ranked WHERE rank <= $k ORDER BY rank""".stripMargin
  }

  /** DuckDB replay of Sampling.packSequences: ring-position shards
    * (the shared [[graft.operators.Sampling.ringPositionSql]]
    * rendering), per-shard doc order by (doc_id), then the greedy
    * first-fit recurrence as a linear RECURSIVE CTE stepping rn → rn+1
    * within each shard — the sequential semantics the distributed
    * per-shard walk must reproduce row-for-row.
    */
  private def packOracleSql(maxTokens: Long, shards: Int, seed: Long): String = {
    val ring = graft.operators.Sampling.ringPositionSql("doc_id", seed)
    s"""WITH RECURSIVE s0 AS (
       |  SELECT doc_id, CAST($ring % $shards AS INT) AS shard,
       |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
       |  FROM documents),
       | s AS (SELECT *, row_number() OVER (PARTITION BY shard ORDER BY doc_id) AS rn FROM s0),
       | pack(shard, rn, doc_id, n_tokens, fill, pack_id) AS (
       |   SELECT shard, rn, doc_id, n_tokens, n_tokens, CAST(0 AS BIGINT) FROM s WHERE rn = 1
       |   UNION ALL
       |   SELECT s.shard, s.rn, s.doc_id, s.n_tokens,
       |     CASE WHEN p.fill + s.n_tokens > $maxTokens THEN s.n_tokens
       |          ELSE p.fill + s.n_tokens END,
       |     CASE WHEN p.fill + s.n_tokens > $maxTokens THEN p.pack_id + 1
       |          ELSE p.pack_id END
       |   FROM s JOIN pack p ON s.shard = p.shard AND s.rn = p.rn + 1
       | )
       |SELECT doc_id, shard, pack_id, n_tokens FROM pack ORDER BY doc_id""".stripMargin
  }

  /** DuckDB replay of Dedup.minHashPairs over PortableHash.polyHash:
    * word-bigram shingles → per-doc k-min signatures (the exact
    * (a_j·x + b_j) mod p permutations, coefficients shared via
    * Dedup.minHashCoeffs) → banding as SLICE EQUALITY (the engine
    * buckets on the slice itself, so candidacy is replayable) →
    * signature-agreement Jaccard estimate, thresholded. Quadratic
    * doc×doc join — oracle-side only, at gate scale.
    */
  private def minHashOracleSql(k: Int, bands: Int, threshold: Double,
      seed: Long): String = {
    import graft.functions.PortableHash
    val p = PortableHash.P
    val minTerms = Dedup.minHashCoeffs(k, seed).zipWithIndex.map {
      case ((a, b), j) => s"MIN(($a * x + $b) % $p) AS h$j"
    }.mkString(", ")
    val sigList = (0 until k).map(j => s"h$j").mkString("[", ", ", "]")
    val rpb = k / bands
    // slice bounds mirror the engine's remainder-absorbing last band
    // (lambda var is `bb` — `b` is taken by the pair-join table alias)
    val hi = s"CASE WHEN bb = ${bands - 1} THEN $k ELSE (bb + 1) * $rpb END"
    s"""WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
       |sh AS (SELECT DISTINCT doc_id, s FROM (
       |  SELECT doc_id, unnest(list_transform(generate_series(1, len(ws) - 1),
       |    i -> ws[i] || ' ' || ws[i + 1])) AS s FROM w)),
       |hx AS (SELECT doc_id, ${PortableHash.polyHashSql("s")} AS x FROM sh),
       |sg0 AS (SELECT doc_id, $minTerms FROM hx GROUP BY doc_id),
       |sg AS (SELECT doc_id, $sigList AS sig FROM sg0),
       |cand AS (SELECT a.doc_id AS ida, b.doc_id AS idb, a.sig AS sa, b.sig AS sb
       |  FROM sg a JOIN sg b ON a.doc_id < b.doc_id
       |  WHERE list_contains(list_transform(generate_series(0, ${bands - 1}),
       |    bb -> a.sig[(bb * $rpb + 1):($hi)] = b.sig[(bb * $rpb + 1):($hi)]), true)),
       |est AS (SELECT ida, idb,
       |  list_sum(list_transform(generate_series(1, $k),
       |    j -> CASE WHEN sa[j] = sb[j] THEN 1 ELSE 0 END)) / CAST($k AS DOUBLE)
       |    AS est_jaccard FROM cand)
       |SELECT ida, idb, est_jaccard FROM est
       |WHERE est_jaccard >= $threshold ORDER BY ida, idb""".stripMargin
  }

  /** DuckDB replay of Dedup.minHashKeep (ord = doc_id): signatures as
    * in [[minHashOracleSql]], exploded to per-band bucket slices; each
    * (band, bucket) is claimed by its minimum doc_id, and a document's
    * verdict counts the bands it failed to claim.
    */
  private def minHashKeepOracleSql(k: Int, bands: Int, seed: Long): String = {
    import graft.functions.PortableHash
    val p = PortableHash.P
    val minTerms = Dedup.minHashCoeffs(k, seed).zipWithIndex.map {
      case ((a, b), j) => s"MIN(($a * x + $b) % $p) AS h$j"
    }.mkString(", ")
    val sigList = (0 until k).map(j => s"h$j").mkString("[", ", ", "]")
    val rpb = k / bands
    val hi = s"CASE WHEN g.bb = ${bands - 1} THEN $k ELSE (g.bb + 1) * $rpb END"
    s"""WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
       |sh AS (SELECT DISTINCT doc_id, s FROM (
       |  SELECT doc_id, unnest(list_transform(generate_series(1, len(ws) - 1),
       |    i -> ws[i] || ' ' || ws[i + 1])) AS s FROM w)),
       |hx AS (SELECT doc_id, ${PortableHash.polyHashSql("s")} AS x FROM sh),
       |sg0 AS (SELECT doc_id, $minTerms FROM hx GROUP BY doc_id),
       |sg AS (SELECT doc_id, $sigList AS sig FROM sg0),
       |bkt AS (SELECT doc_id, g.bb AS band,
       |    sig[(g.bb * $rpb + 1):($hi)] AS bucket
       |  FROM sg, generate_series(0, ${bands - 1}) g(bb)),
       |clm AS (SELECT band, bucket, MIN(doc_id) AS claimant
       |  FROM bkt GROUP BY 1, 2)
       |SELECT b.doc_id,
       |  COUNT(CASE WHEN c.claimant <> b.doc_id THEN 1 END) AS lost_bands,
       |  COUNT(CASE WHEN c.claimant <> b.doc_id THEN 1 END) = 0 AS kept
       |FROM bkt b JOIN clm c USING (band, bucket)
       |GROUP BY 1 ORDER BY 1""".stripMargin
  }

  /** DuckDB replay of Similarity.lshTopK(exact=true): the seeded
    * hyperplanes are literal double lists (java.util.Random is a fixed
    * LCG; Double.toString round-trips), bucket-sign dots and cosine
    * norms accumulate in DECIMAL(38,8) exactly as the engine does, so
    * buckets, scores and ranks replay bit-identically.
    */
  private def lshOracleSql(planes: Int, dim: Int, k: Int, seed: Long,
      nProbe: Int = 1): String = {
    val hp = Similarity.hyperplanes(planes, dim, seed)
    // per-plane decimal dots computed once (dots[i] is 1-indexed below)
    val dots = hp.map { w =>
      val wlist = w.mkString("[", ", ", "]")
      s"list_sum(list_transform(generate_series(1, $dim), " +
        s"ii -> CAST(CAST(embedding[ii] AS DOUBLE) * ($wlist)[ii] AS DECIMAL(38,8))))"
    }.mkString("[", ", ", "]")
    val bucket = (0 until planes).map(i =>
      s"(CASE WHEN dots[${i + 1}] >= 0 THEN ${1L << i} ELSE 0 END)").mkString(" + ")
    // probe buckets: own bucket + single-bit flips of the nProbe-1
    // lowest-|dot| planes, ties on the bit mask — mirrors
    // Similarity.lshProbes term for term
    val perPlane = (0 until planes).map(i =>
      s"SELECT vec_id, bucket, abs(dots[${i + 1}]) AS m, " +
        s"CAST(${1L << i} AS BIGINT) AS f FROM b WHERE vec_id < 5")
      .mkString("\n  UNION ALL ")
    val probeCte =
      if (nProbe <= 1) "qp AS (SELECT vec_id, bucket FROM b WHERE vec_id < 5)"
      else s"""pm AS ($perPlane),
        |flips AS (SELECT vec_id, xor(bucket, f) AS bucket FROM
        |  (SELECT vec_id, bucket, f,
        |     ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY m, f) AS rnk FROM pm)
        |  WHERE rnk <= ${nProbe - 1}),
        |qp AS (SELECT vec_id, bucket FROM b WHERE vec_id < 5
        |  UNION ALL SELECT vec_id, bucket FROM flips)""".stripMargin
    s"""WITH d0 AS (SELECT vec_id, embedding, $dots AS dots FROM embeddings),
       |b AS (SELECT vec_id, embedding, $bucket AS bucket, dots FROM d0),
       |$probeCte,
       |cand AS (SELECT q.vec_id AS qid, c.vec_id AS nid,
       |    q.embedding AS qe, c.embedding AS ne
       |  FROM qp p JOIN b q ON p.vec_id = q.vec_id
       |  JOIN b c ON c.bucket = p.bucket AND c.vec_id <> q.vec_id),
       |t AS (SELECT qid, nid, unnest(qe)::DOUBLE AS x, unnest(ne)::DOUBLE AS y
       |  FROM cand),
       |d AS (SELECT qid, nid,
       |  CAST(SUM(CAST(x*y AS DECIMAL(38,8))) AS DOUBLE) AS dot,
       |  CAST(SUM(CAST(x*x AS DECIMAL(38,8))) AS DOUBLE) AS na,
       |  CAST(SUM(CAST(y*y AS DECIMAL(38,8))) AS DOUBLE) AS nb
       |  FROM t GROUP BY 1, 2)
       |SELECT qid, nid, dot / (sqrt(na) * sqrt(nb)) AS cos,
       |  ROW_NUMBER() OVER (PARTITION BY qid
       |    ORDER BY dot / (sqrt(na) * sqrt(nb)) DESC, nid) AS rank
       |FROM d QUALIFY rank <= $k ORDER BY qid, rank""".stripMargin
  }

  /** DuckDB replay of Dedup.embeddingPairs(planes=Some(p), exact=true):
    * the seeded hyperplanes are literal double lists, bucket-sign dots
    * and cosine sums accumulate in DECIMAL(38,8) exactly as the engine
    * does, so the bucket equijoin's candidate set and the thresholded
    * scores replay bit-identically.
    */
  private def embPairsLshOracleSql(planes: Int, dim: Int,
      threshold: Double, seed: Long, tables: Int = 1): String = {
    // one (dots_t, bucket_t) pair per hash table, seeds seed + t —
    // mirrors Dedup.embeddingPairs(tables = ...) term for term
    val perTable = (0 until tables).map { t =>
      val hp = Similarity.hyperplanes(planes, dim, seed + t)
      val dots = hp.map { w =>
        val wlist = w.mkString("[", ", ", "]")
        s"list_sum(list_transform(generate_series(1, $dim), " +
          s"ii -> CAST(CAST(embedding[ii] AS DOUBLE) * ($wlist)[ii] AS DECIMAL(38,8))))"
      }.mkString("[", ", ", "]")
      val bucket = (0 until planes).map(i =>
        s"(CASE WHEN dots$t[${i + 1}] >= 0 THEN ${1L << i} ELSE 0 END)")
        .mkString(" + ")
      (s"$dots AS dots$t", s"$bucket AS bucket$t")
    }
    val dotCols = perTable.map(_._1).mkString(", ")
    val bucketCols = perTable.map(_._2).mkString(", ")
    val anyShared = (0 until tables).map(t => s"x.bucket$t = y.bucket$t")
      .mkString(" OR ")
    s"""WITH d0 AS (SELECT vec_id, embedding, $dotCols FROM embeddings),
       |b AS (SELECT vec_id, embedding, $bucketCols FROM d0),
       |cand AS (SELECT DISTINCT x.vec_id AS ida, y.vec_id AS idb,
       |    x.embedding AS ea, y.embedding AS eb
       |  FROM b x JOIN b y ON ($anyShared) AND x.vec_id < y.vec_id),
       |t AS (SELECT ida, idb, unnest(ea)::DOUBLE AS x, unnest(eb)::DOUBLE AS y
       |  FROM cand),
       |d AS (SELECT ida, idb,
       |  CAST(SUM(CAST(x*y AS DECIMAL(38,8))) AS DOUBLE) AS dot,
       |  CAST(SUM(CAST(x*x AS DECIMAL(38,8))) AS DOUBLE) AS na,
       |  CAST(SUM(CAST(y*y AS DECIMAL(38,8))) AS DOUBLE) AS nb
       |  FROM t GROUP BY 1, 2)
       |SELECT ida, idb, dot / (sqrt(na) * sqrt(nb)) AS cos
       |FROM d WHERE dot / (sqrt(na) * sqrt(nb)) >= $threshold
       |ORDER BY ida, idb""".stripMargin
  }

  /** DuckDB replay of Similarity.ivfTopK(exact=true): seeds are the
    * nCentroids lowest (PortableHash.intHash(id), id) vectors; each
    * unrolled Lloyd iteration assigns every vector to its max-cosine
    * centroid (decimal-exact dots, (cos, cid)-lexicographic argmax =
    * the engine's array_max over (cos, cid) structs) and recomputes
    * decimal-exact element-wise means; queries probe their nProbe
    * best centroids and rank exact cosine within those buckets.
    */
  /** Decimal-exact cosine of a float-list column `e` vs a double-list
    * column `c` — mirrors Similarity.cosExact term for term. Shared by
    * the IVF and SemDeDup oracles.
    */
  private def decCosSql(e: String, c: String, dim: Int): String = {
    def ls(term: String) =
      s"CAST(list_sum(list_transform(generate_series(1, $dim), " +
        s"ii -> CAST($term AS DECIMAL(38,8)))) AS DOUBLE)"
    val dot = ls(s"CAST($e[ii] AS DOUBLE) * $c[ii]")
    val ne = ls(s"CAST($e[ii] AS DOUBLE) * CAST($e[ii] AS DOUBLE)")
    val nc = ls(s"$c[ii] * $c[ii]")
    s"($dot / (sqrt($ne) * sqrt($nc)))"
  }

  /** Shared CTE prefix of the IVF-family oracles: embeddings `e`,
    * seeded `c0`, `iters` unrolled Lloyd iterations (assign →
    * decimal-exact element means → rebuilt centroid lists), and the
    * final per-vector assignment `asg(nid, cid)` against c{iters} —
    * exactly [[Similarity.ivfCentroids]] + [[Similarity.assignCentroid]].
    */
  private def ivfAssignCtes(nCentroids: Int, iters: Int, dim: Int): String = {
    import graft.functions.PortableHash
    def cosSql(e: String, c: String) = decCosSql(e, c, dim)
    val iterCtes = (1 to iters).map { it =>
      val prev = s"c${it - 1}"
      s"""a$it AS (SELECT d.vec_id,
         |  (MAX(struct_pack(c := ${cosSql("d.embedding", "p.cv")}, i := p.cid))).i AS cid
         |  FROM e d CROSS JOIN $prev p GROUP BY d.vec_id),
         |m$it AS (SELECT a.cid, t.i AS pos,
         |  CAST(SUM(CAST(CAST(eb.embedding[t.i] AS DOUBLE) AS DECIMAL(38,8))) AS DOUBLE)
         |    / COUNT(*) AS m
         |  FROM a$it a JOIN e eb ON a.vec_id = eb.vec_id
         |  CROSS JOIN generate_series(1, $dim) AS t(i)
         |  GROUP BY a.cid, t.i),
         |c$it AS (SELECT cid, list(m ORDER BY pos) AS cv FROM m$it GROUP BY cid)"""
        .stripMargin
    }.mkString(",\n")
    val fin = s"c$iters"
    s"""e AS (SELECT vec_id, embedding FROM embeddings),
       |c0 AS (SELECT rn - 1 AS cid,
       |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS cv
       |  FROM (SELECT vec_id, embedding, ROW_NUMBER() OVER (
       |      ORDER BY ${PortableHash.intHashSql("vec_id")}, vec_id) AS rn FROM e)
       |  WHERE rn <= $nCentroids),
       |$iterCtes,
       |asg AS (SELECT d.vec_id AS nid,
       |  (MAX(struct_pack(c := ${cosSql("d.embedding", "p.cv")}, i := p.cid))).i AS cid
       |  FROM e d CROSS JOIN $fin p GROUP BY d.vec_id)""".stripMargin
  }

  /** DuckDB replay of Dedup.semDedup(exact=true) over the
    * ivfCentroids(exact=true) index with ord = vec_id: centroid
    * training + assignment via [[ivfAssignCtes]], then within-cluster
    * decimal-exact cosine pairs and the earliest-mate drop rule.
    */
  private def semDedupOracleSql(nCentroids: Int, iters: Int, dim: Int,
      threshold: Double): String =
    s"""WITH ${ivfAssignCtes(nCentroids, iters, dim)},
       |pr AS (SELECT a.nid AS ida, b.nid AS idb
       |  FROM asg a JOIN asg b ON a.cid = b.cid AND a.nid < b.nid),
       |t AS (SELECT pr.ida, pr.idb, unnest(ea.embedding)::DOUBLE AS x,
       |    unnest(eb.embedding)::DOUBLE AS y
       |  FROM pr JOIN e ea ON pr.ida = ea.vec_id JOIN e eb ON pr.idb = eb.vec_id),
       |d2 AS (SELECT ida, idb,
       |  CAST(SUM(CAST(x*y AS DECIMAL(38,8))) AS DOUBLE) AS dot,
       |  CAST(SUM(CAST(x*x AS DECIMAL(38,8))) AS DOUBLE) AS na,
       |  CAST(SUM(CAST(y*y AS DECIMAL(38,8))) AS DOUBLE) AS nb
       |  FROM t GROUP BY 1, 2),
       |dropped AS (SELECT DISTINCT idb FROM d2
       |  WHERE dot / (sqrt(na) * sqrt(nb)) >= $threshold)
       |SELECT a.nid AS doc_id, a.cid, (d.idb IS NULL) AS kept
       |FROM asg a LEFT JOIN dropped d ON a.nid = d.idb
       |ORDER BY doc_id""".stripMargin

  private def ivfOracleSql(nCentroids: Int, nProbe: Int, iters: Int,
      k: Int, dim: Int): String = {
    def cosSql(e: String, c: String) = decCosSql(e, c, dim)
    val fin = s"c$iters"
    s"""WITH ${ivfAssignCtes(nCentroids, iters, dim)},
       |probes AS (SELECT q.vec_id AS qid, p.cid,
       |  ROW_NUMBER() OVER (PARTITION BY q.vec_id
       |    ORDER BY ${cosSql("q.embedding", "p.cv")} DESC, p.cid DESC) AS pr
       |  FROM e q CROSS JOIN $fin p WHERE q.vec_id < 5
       |  QUALIFY pr <= $nProbe),
       |cand AS (SELECT p.qid, a.nid FROM probes p JOIN asg a ON p.cid = a.cid
       |  WHERE p.qid <> a.nid),
       |t AS (SELECT c.qid, c.nid, unnest(q.embedding)::DOUBLE AS x,
       |    unnest(n.embedding)::DOUBLE AS y
       |  FROM cand c JOIN e q ON c.qid = q.vec_id JOIN e n ON c.nid = n.vec_id),
       |d2 AS (SELECT qid, nid,
       |  CAST(SUM(CAST(x*y AS DECIMAL(38,8))) AS DOUBLE) AS dot,
       |  CAST(SUM(CAST(x*x AS DECIMAL(38,8))) AS DOUBLE) AS na,
       |  CAST(SUM(CAST(y*y AS DECIMAL(38,8))) AS DOUBLE) AS nb
       |  FROM t GROUP BY 1, 2)
       |SELECT qid, nid, dot / (sqrt(na) * sqrt(nb)) AS cos,
       |  ROW_NUMBER() OVER (PARTITION BY qid
       |    ORDER BY dot / (sqrt(na) * sqrt(nb)) DESC, nid) AS rank
       |FROM d2 QUALIFY rank <= $k ORDER BY qid, rank""".stripMargin
  }

  /** DuckDB replay of Dedup.simHashPairs over PortableHash.hash62:
    * per-word 62-bit hashes vote ±1 on bit positions, signs pack into
    * one BIGINT, pairs filter on Hamming distance. The engine's
    * pigeonhole blocking is complete (distance ≤ d ⇒ some block
    * matches exactly), so the blocked-then-filtered engine output
    * equals this all-pairs filter.
    */
  private def simHashOracleSql(maxDistance: Int): String = {
    import graft.functions.PortableHash
    // bits 62-63 of hash62 are constant 0 → their votes are always −1
    // → packed bits 0; emitting 0..61 is equivalent and avoids 1L<<63
    val bitSums = (0 until 62).map(b =>
      s"SUM(CASE WHEN (h >> $b) & 1 = 1 THEN 1 ELSE -1 END) AS s$b").mkString(", ")
    val pack = (0 until 62).map(b =>
      s"CASE WHEN s$b > 0 THEN ${1L << b} ELSE 0 END").mkString(" + ")
    s"""WITH wd AS (SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents),
       |hh AS (SELECT doc_id, ${PortableHash.hash62Sql("w")} AS h FROM wd),
       |bs AS (SELECT doc_id, $bitSums FROM hh GROUP BY doc_id),
       |sh2 AS (SELECT doc_id, $pack AS simhash FROM bs)
       |SELECT a.doc_id AS ida, b.doc_id AS idb,
       |  CAST(bit_count(xor(a.simhash, b.simhash)) AS BIGINT) AS hamming
       |FROM sh2 a JOIN sh2 b ON a.doc_id < b.doc_id
       |WHERE bit_count(xor(a.simhash, b.simhash)) <= $maxDistance
       |ORDER BY ida, idb""".stripMargin
  }

  // ------------------------------------------------------------ queries

  private def all: Seq[Q] =
    coreAgg ++ windowOps ++ reshapeOps ++ nanAndFit ++ pipelineOps ++
      joinOps ++ corpusOps ++ curationOps ++ mlOps

  /** Round-8 ML wave: distributed PCA (one-pass decimal moments +
    * deterministic driver-side power iteration), replayed in DuckDB
    * as unrolled matvec CTEs — fit loadings/eigenvalues and the
    * row-local projection both bit-exact, unrounded.
    */
  private def mlOps: Seq[Q] = {
    val pcaCorpusSql = "SELECT vec_id AS rid, embedding AS v FROM embeddings"
    val (pcaK, pcaIters, pcaDim) = (2, 8, 64)
    Seq(
      Q("pca_fit",
        // 2 components, 8 power rounds over the dim-64 covariance;
        // the oracle replays the moments pass, every matvec/normalize
        // round, the Rayleigh eigenvalue, sign flip, and deflation
        (s, dir) => {
          import s.implicits._
          val m = Pca.fit(T(s, dir, "embeddings"), col("embedding"),
            k = pcaK, iters = pcaIters, dim = Some(pcaDim))
          m.components.zipWithIndex.flatMap { case (c, ci) =>
            c.zipWithIndex.map { case (l, i) => (ci, i, l, m.eigenvalues(ci)) }
          }.toDF("component", "i", "loading", "eigenvalue")
            .orderBy(col("component"), col("i"))
        },
        Some(Pca.fitSql(pcaCorpusSql, pcaDim, pcaK, pcaIters))),

      Q("pca_project",
        // the same fit, then every vector's centered decimal dot with
        // each component — row-local, zero shuffle on the corpus side
        (s, dir) => {
          val embs = T(s, dir, "embeddings")
          val m = Pca.fit(embs, col("embedding"),
            k = pcaK, iters = pcaIters, dim = Some(pcaDim))
          Pca.project(embs, col("embedding"), m)
            .select(col("vec_id").as("rid"), col("pc0"), col("pc1"))
            .orderBy(col("rid"))
        },
        Some(Pca.projectSql(pcaCorpusSql, pcaDim, pcaK, pcaIters))),

      Q("pq_encode",
        // product quantization: 2 subspaces × 4 codes, 2 L2 Lloyd
        // rounds (portable seed hash, decimal-exact distances and
        // means), every row's codes — the oracle unrolls both
        // subspaces' full training and replays the assignment
        (s, dir) => {
          val embs = T(s, dir, "embeddings")
          val model = Pq.fit(embs, col("vec_id"), col("embedding"),
            dim = pqDim, m = pqM, ksub = pqKsub, iters = pqIters,
            exact = true, seedHash = graft.functions.PortableHash.intHash(_))
          Pq.encode(embs.select(col("vec_id").as("rid"), col("embedding")),
              col("embedding"), model, exact = true)
            .select(col("rid"), col("code0"), col("code1"))
            .orderBy(col("rid"))
        },
        Some(pqEncodeSql(pqM, pqKsub, pqIters, pqDim))),

      Q("pq_adc_topk",
        // the same fit + encode, then asymmetric-distance top-5 for 5
        // query vectors: Σ per-subspace ‖q_sub − codebook[code]‖²
        // (exact query, coded corpus), rank by (distance, nid)
        (s, dir) => {
          val embs = T(s, dir, "embeddings")
          val model = Pq.fit(embs, col("vec_id"), col("embedding"),
            dim = pqDim, m = pqM, ksub = pqKsub, iters = pqIters,
            exact = true, seedHash = graft.functions.PortableHash.intHash(_))
          Pq.adcTopK(embs, embs.filter(col("vec_id") < 5),
              col("vec_id"), col("embedding"), k = 5, model, exact = true)
            .withColumn("rank", col("rank").cast("long"))
            .orderBy(col("qid"), col("rank"))
        },
        Some(pqAdcSql(pqM, pqKsub, pqIters, pqDim, k = 5)))
    )
  }

  private val (pqM, pqKsub, pqIters, pqDim) = (2, 4, 2, 64)

  /** Decimal-exact squared-L2 between subspace `j` of embedding
    * expression `e` (1-based full-vector indexing) and a centroid
    * list `c` (1-based sub-indexing) — the SQL twin of Pq.l2sq:
    * scale-8 terms, exact sum, back to double.
    */
  private def pqL2Sql(e: String, c: String, j: Int, dsub: Int): String = {
    val off = j * dsub
    s"CAST(list_sum(list_transform(generate_series(1, $dsub), " +
      s"ii -> CAST((CAST($e[ii + $off] AS DOUBLE) - $c[ii]) * " +
      s"(CAST($e[ii + $off] AS DOUBLE) - $c[ii]) AS DECIMAL(38,8)))) AS DOUBLE)"
  }

  /** Shared CTE prefix of the PQ oracles: seeds by the portable hash,
    * `iters` unrolled Lloyd rounds PER SUBSPACE (argmin assignment →
    * decimal-exact sub-centroid means, empty codes keeping the
    * previous centroid), and the final per-vector assignment
    * `f{j}(vec_id, code)` — exactly [[graft.operators.Pq.fit]] +
    * `encode`.
    */
  private def pqCtes(m: Int, ksub: Int, iters: Int, dim: Int): String = {
    import graft.functions.PortableHash
    val dsub = dim / m
    def assign(name: String, prev: String, j: Int): String =
      s"""$name AS (SELECT d.vec_id,
         |  (MIN(struct_pack(d := ${pqL2Sql("d.embedding", "p.cv", j, dsub)},
         |    c := p.code))).c AS code
         |  FROM e d CROSS JOIN $prev p GROUP BY d.vec_id)""".stripMargin
    val subCtes = (0 until m).map { j =>
      val off = j * dsub
      val seed =
        s"""c${j}_0 AS (SELECT rn - 1 AS code,
           |  list_transform(generate_series(1, $dsub),
           |    ii -> CAST(embedding[ii + $off] AS DOUBLE)) AS cv
           |  FROM sd WHERE rn <= $ksub)""".stripMargin
      val rounds = (1 to iters).map { it =>
        s"""${assign(s"a${j}_$it", s"c${j}_${it - 1}", j)},
           |n${j}_$it AS (SELECT a.code, t.ii AS pos,
           |  CAST(SUM(CAST(CAST(eb.embedding[t.ii + $off] AS DOUBLE)
           |    AS DECIMAL(38,8))) AS DOUBLE) / COUNT(*) AS mn
           |  FROM a${j}_$it a JOIN e eb USING (vec_id)
           |  CROSS JOIN generate_series(1, $dsub) AS t(ii)
           |  GROUP BY a.code, t.ii),
           |g${j}_$it AS (SELECT code, list(mn ORDER BY pos) AS cv
           |  FROM n${j}_$it GROUP BY code),
           |c${j}_$it AS (SELECT p.code, COALESCE(g.cv, p.cv) AS cv
           |  FROM c${j}_${it - 1} p LEFT JOIN g${j}_$it g USING (code))"""
          .stripMargin
      }.mkString(",\n")
      s"$seed,\n$rounds,\n${assign(s"f$j", s"c${j}_$iters", j)}"
    }.mkString(",\n")
    s"""e AS (SELECT vec_id, embedding FROM embeddings),
       |sd AS (SELECT embedding, ROW_NUMBER() OVER (
       |    ORDER BY ${PortableHash.intHashSql("vec_id")}, vec_id) AS rn FROM e),
       |$subCtes""".stripMargin
  }

  /** DuckDB replay of Pq.fit + encode: `(rid, code0..code{m-1})`. */
  private def pqEncodeSql(m: Int, ksub: Int, iters: Int, dim: Int): String = {
    val joins = (0 until m).map(j => s"JOIN f$j USING (vec_id)").mkString(" ")
    val codes = (0 until m).map(j => s"CAST(f$j.code AS INT) AS code$j")
      .mkString(", ")
    s"""WITH ${pqCtes(m, ksub, iters, dim)}
       |SELECT e.vec_id AS rid, $codes
       |FROM e $joins ORDER BY rid""".stripMargin
  }

  /** DuckDB replay of Pq.adcTopK: the fit + encode CTEs, each code
    * joined back to its final sub-centroid, the asymmetric distance
    * as an exact decimal sum of the per-subspace decimal distances,
    * rank by (adist, nid) per query.
    */
  private def pqAdcSql(m: Int, ksub: Int, iters: Int, dim: Int,
      k: Int): String = {
    val dsub = dim / m
    val joins = (0 until m).map(j =>
      s"JOIN f$j USING (vec_id) JOIN c${j}_$iters b$j ON f$j.code = b$j.code")
      .mkString(" ")
    val adist = (0 until m).map(j =>
      s"CAST(${pqL2Sql("q.qv", s"b$j.cv", j, dsub)} AS DECIMAL(38,8))")
      .mkString(" + ")
    s"""WITH ${pqCtes(m, ksub, iters, dim)},
       |qe AS (SELECT vec_id AS qid, embedding AS qv FROM e WHERE vec_id < 5),
       |cand AS (SELECT q.qid, d.vec_id AS nid,
       |  CAST($adist AS DOUBLE) AS adist
       |  FROM e d $joins CROSS JOIN qe q WHERE q.qid <> d.vec_id),
       |rk AS (SELECT qid, nid, adist,
       |  ROW_NUMBER() OVER (PARTITION BY qid ORDER BY adist, nid) AS rank
       |  FROM cand)
       |SELECT qid, nid, adist, rank FROM rk WHERE rank <= $k
       |ORDER BY qid, rank""".stripMargin
  }

  /** Round-10 curation wave: DSIR importance weighting, domain-graph
    * PageRank, k-anonymity suppression — the published data-selection
    * and governance recipes a recurring pretraining pipeline runs on
    * top of the dedup/sampling/scoring families.
    */
  private def curationOps: Seq[Q] = Seq(
    Q("dsir_weights",
      // DSIR (Xie et al. 2023) hashed-unigram log importance ratios:
      // target = doc_id % 4 == 0, raw = the rest, 512 hashed buckets
      // (PortableHash — the oracle rebuilds both models bit-exactly).
      // log_w and the min(1, exp·) acceptance weight round like every
      // log-derived output; n_tokens is exact
      (s, dir) => {
        val d = T(s, dir, "documents")
        val target = d.filter(col("doc_id") % 4 === 0)
        val raw = d.filter(col("doc_id") % 4 =!= 0)
        val b = 512
        val tc = Dsir.bucketCounts(target, col("text"), b)
        val rc = Dsir.bucketCounts(raw, col("text"), b)
        val (tt, rt) = (Dsir.totalOf(tc), Dsir.totalOf(rc))
        Dsir.logImportanceWeights(raw, col("doc_id"), col("text"),
            tc, tt, rc, rt, b)
          .select(col("doc_id"), col("n_tokens"),
            round(col("log_w"), 4).as("log_w"),
            round(Dsir.acceptanceWeight(col("log_w")), 4).as("accept_w"))
          .orderBy(col("doc_id"))
      },
      Some(s"""WITH tk0 AS (SELECT doc_id, unnest(string_split(text, ' ')) AS token
        |  FROM documents),
        | tk AS (SELECT doc_id, ${Dsir.bucketOfSql("token", 512)} AS bucket
        |   FROM tk0 WHERE token <> ''),
        | t AS (SELECT bucket, COUNT(*) AS tcnt FROM tk WHERE doc_id % 4 = 0 GROUP BY 1),
        | r AS (SELECT bucket, COUNT(*) AS rcnt FROM tk WHERE doc_id % 4 <> 0 GROUP BY 1),
        | tt AS (SELECT COALESCE(SUM(tcnt), 0) AS t FROM t),
        | rt AS (SELECT COALESCE(SUM(rcnt), 0) AS t FROM r),
        | j AS (SELECT doc_id,
        |   CAST(COALESCE(t.tcnt, 0) AS DOUBLE) AS tc,
        |   CAST(COALESCE(r.rcnt, 0) AS DOUBLE) AS rc
        |   FROM tk LEFT JOIN t USING (bucket) LEFT JOIN r USING (bucket)
        |   WHERE tk.doc_id % 4 <> 0),
        | agg AS (SELECT doc_id, COUNT(*) AS n_tokens,
        |   CAST(SUM(CAST(ln(tc + 1) - ln(rc + 1) AS DECIMAL(38,8))) AS DOUBLE) AS sumlr
        |   FROM j GROUP BY 1),
        | w AS (SELECT doc_id, n_tokens,
        |   sumlr - n_tokens * (ln((SELECT t FROM tt) + 512.0)
        |     - ln((SELECT t FROM rt) + 512.0)) AS log_w
        |   FROM agg)
        |SELECT doc_id, n_tokens, ROUND(log_w, 4) AS log_w,
        |  ROUND(exp(least(log_w, 0.0)), 4) AS accept_w
        |FROM w ORDER BY doc_id""".stripMargin)),

    Q("domain_pagerank",
      // 3 damped PageRank rounds over the (source → linked-domain)
      // graph, URLs injected like text_urls so every doc links two
      // domains; all domain nodes are dangling, so the uniform
      // mass-redistribution path is exercised every round. Decimal-
      // summed contributions → ranks replay bit-exactly, unrounded
      (s, dir) => {
        val inj = concat(col("text"), lit(" see https://Site"),
          (col("doc_id") % 50).cast("string"),
          lit(".Example.COM/p?q=1 and plain http://d"),
          (col("doc_id") % 7).cast("string"), lit(".org tail"))
        val edges = T(s, dir, "documents")
          .select(col("source").as("src"),
            explode(TextFunctions.textDomains(inj)).as("dst"))
        GraphOps.pageRank(edges, iterations = 3, damping = 0.85)
          .orderBy(col("node"))
      },
      Some(GraphOps.pageRankSql(
        // NOTE: no line here may start with "||" — pageRankSql
        // stripMargins the composed text again, which would eat one
        // pipe of a leading concat operator
        s"""SELECT source AS src, unnest(list_distinct(list_transform(
           |  regexp_extract_all(text || ' see https://Site' || CAST(doc_id % 50 AS VARCHAR) ||
           |    '.Example.COM/p?q=1 and plain http://d' || CAST(doc_id % 7 AS VARCHAR) ||
           |    '.org tail', '${TextFunctions.UrlPattern}'),
           |  u -> lower(regexp_extract(u, '^https?://([^/:?#\\s]+)', 1))))) AS dst
           |FROM documents""".stripMargin, 3, 0.85) + "\nORDER BY node")),

    Q("fuzzy_join",
      // blocked fuzzy (edit-distance) entity-resolution join: parts
      // vs the same parts with the 5th name char replaced — inside
      // the prefix block, so every typo pair is reachable; the oracle
      // replays blocking AND verification (both engines' levenshtein
      // is the standard DP distance)
      (s, dir) => {
        val p = T(s, dir, "part")
        val l = p.select(col("p_partkey").as("id"), col("p_name").as("name"))
        val r = p.select((col("p_partkey") + 1000000L).as("id"),
          concat(substring(col("p_name"), 1, 4), lit("x"),
            substring(col("p_name"), 6, 100000)).as("name"))
        Joins.fuzzyJoin(l, col("id"), col("name"), r, col("id"), col("name"),
            maxDist = 1)
          .withColumn("dist", col("dist").cast("long"))
          .orderBy(col("left_id"), col("right_id"))
      },
      Some("""WITH l0 AS (SELECT p_partkey AS left_id, lower(trim(p_name)) AS lk FROM part),
        | r0 AS (SELECT p_partkey + 1000000 AS right_id,
        |   lower(trim(substr(p_name, 1, 4) || 'x' || substr(p_name, 6))) AS rk FROM part),
        | lb AS (SELECT left_id, lk, substr(lk, 1, 2) AS pfx,
        |   CAST(length(lk) // 4 AS INT) AS bin FROM l0 WHERE lk IS NOT NULL),
        | rb AS (SELECT right_id, rk, substr(rk, 1, 2) AS pfx,
        |   CAST(length(rk) // 4 AS INT) AS bin FROM r0 WHERE rk IS NOT NULL)
        |SELECT left_id, right_id, lk AS left_key, rk AS right_key,
        |  CAST(levenshtein(lk, rk) AS BIGINT) AS dist
        |FROM lb JOIN rb ON lb.pfx = rb.pfx AND rb.bin BETWEEN lb.bin - 1 AND lb.bin + 1
        |WHERE levenshtein(lk, rk) <= 1
        |ORDER BY left_id, right_id""".stripMargin)),

    Q("fuzzy_join_routed_del",
      // the same fixture FORCED through the deletion-neighborhood
      // routed path (maxBlockPairs = 1 routes every block; q = 0 +
      // maxDist = 1 selects FastSS deletion variants): the routed
      // plan is output-invariant, so the oracle is the same blocking
      // + verification replay — this gate proves the deletion path
      // (variant hashing, merge join, attach, structural re-checks)
      // against DuckDB, which no small-block fixture reaches
      (s, dir) => {
        val p = T(s, dir, "part")
        val l = p.select(col("p_partkey").as("id"), col("p_name").as("name"))
        val r = p.select((col("p_partkey") + 1000000L).as("id"),
          concat(substring(col("p_name"), 1, 4), lit("x"),
            substring(col("p_name"), 6, 100000)).as("name"))
        Joins.fuzzyJoin(l, col("id"), col("name"), r, col("id"), col("name"),
            maxDist = 1, maxBlockPairs = 1)
          .withColumn("dist", col("dist").cast("long"))
          .orderBy(col("left_id"), col("right_id"))
      },
      Some("""WITH l0 AS (SELECT p_partkey AS left_id, lower(trim(p_name)) AS lk FROM part),
        | r0 AS (SELECT p_partkey + 1000000 AS right_id,
        |   lower(trim(substr(p_name, 1, 4) || 'x' || substr(p_name, 6))) AS rk FROM part),
        | lb AS (SELECT left_id, lk, substr(lk, 1, 2) AS pfx,
        |   CAST(length(lk) // 4 AS INT) AS bin FROM l0 WHERE lk IS NOT NULL),
        | rb AS (SELECT right_id, rk, substr(rk, 1, 2) AS pfx,
        |   CAST(length(rk) // 4 AS INT) AS bin FROM r0 WHERE rk IS NOT NULL)
        |SELECT left_id, right_id, lk AS left_key, rk AS right_key,
        |  CAST(levenshtein(lk, rk) AS BIGINT) AS dist
        |FROM lb JOIN rb ON lb.pfx = rb.pfx AND rb.bin BETWEEN lb.bin - 1 AND lb.bin + 1
        |WHERE levenshtein(lk, rk) <= 1
        |ORDER BY left_id, right_id""".stripMargin)),

    Q("fuzzy_join_routed_qgram",
      // forced through the OTHER routed path (explicit q = 2 selects
      // the positional q-gram count-filter at the same maxDist): same
      // oracle again — together the three fuzzy gates prove plain,
      // deletion, and q-gram plans all equal the DuckDB replay
      (s, dir) => {
        val p = T(s, dir, "part")
        val l = p.select(col("p_partkey").as("id"), col("p_name").as("name"))
        val r = p.select((col("p_partkey") + 1000000L).as("id"),
          concat(substring(col("p_name"), 1, 4), lit("x"),
            substring(col("p_name"), 6, 100000)).as("name"))
        Joins.fuzzyJoin(l, col("id"), col("name"), r, col("id"), col("name"),
            maxDist = 1, maxBlockPairs = 1, q = 2)
          .withColumn("dist", col("dist").cast("long"))
          .orderBy(col("left_id"), col("right_id"))
      },
      Some("""WITH l0 AS (SELECT p_partkey AS left_id, lower(trim(p_name)) AS lk FROM part),
        | r0 AS (SELECT p_partkey + 1000000 AS right_id,
        |   lower(trim(substr(p_name, 1, 4) || 'x' || substr(p_name, 6))) AS rk FROM part),
        | lb AS (SELECT left_id, lk, substr(lk, 1, 2) AS pfx,
        |   CAST(length(lk) // 4 AS INT) AS bin FROM l0 WHERE lk IS NOT NULL),
        | rb AS (SELECT right_id, rk, substr(rk, 1, 2) AS pfx,
        |   CAST(length(rk) // 4 AS INT) AS bin FROM r0 WHERE rk IS NOT NULL)
        |SELECT left_id, right_id, lk AS left_key, rk AS right_key,
        |  CAST(levenshtein(lk, rk) AS BIGINT) AS dist
        |FROM lb JOIN rb ON lb.pfx = rb.pfx AND rb.bin BETWEEN lb.bin - 1 AND lb.bin + 1
        |WHERE levenshtein(lk, rk) <= 1
        |ORDER BY left_id, right_id""".stripMargin)),

    Q("bpe_merges",
      // BPE merge learning (Sennrich et al. 2016), 6 rounds over the
      // word-frequency table; the oracle replays every round — pair
      // counting, the (freq DESC, pair ASC) argmax, and the greedy
      // left-to-right list-fold rewrite — as unrolled CTEs
      (s, dir) => Vocab.learnBpeMerges(T(s, dir, "documents"),
          col("text"), rounds = 6)
        .orderBy(col("merge_rank")),
      Some(bpeMergesSql("SELECT text FROM documents", 6))),

    Q("profile_skew",
      // key-skew diagnosis: top-N heaviest keys with shares and
      // cumulative shares — deterministic (count DESC, key ASC) rank
      (s, dir) => graft.operators.Profile.keySkew(
          T(s, dir, "events"), col("event_type"), topN = 4)
        .orderBy(col("rank")),
      Some("""WITH c AS (SELECT CAST(event_type AS VARCHAR) AS key, COUNT(*) AS n_rows
        |  FROM events GROUP BY 1),
        | t AS (SELECT COUNT(*) AS total FROM events),
        | r AS (SELECT key, n_rows,
        |   ROW_NUMBER() OVER (ORDER BY n_rows DESC, key) AS rank FROM c)
        |SELECT CAST(rank AS BIGINT) AS rank, key, n_rows,
        | CAST(n_rows AS DOUBLE) / (SELECT total FROM t) AS share,
        | CAST(SUM(n_rows) OVER (ORDER BY rank) AS DOUBLE) / (SELECT total FROM t) AS cum_share
        |FROM r WHERE rank <= 4 ORDER BY rank""".stripMargin)),

    Q("win_funnel",
      // 3-step conversion funnel (view → click → purchase) computed
      // in ONE aggregation (filter → groupBy(entity) → sorted fold);
      // the oracle is the INDEPENDENT relational formulation —
      // chained conditional minima over joins — not a replay of the
      // engine's fold, so a fold bug cannot self-confirm
      (s, dir) => graft.operators.Funnel.funnel(eventsUs(s, dir),
          col("user_id"), col("ts_us"), col("event_type"),
          Seq("view", "click", "purchase"))
        .orderBy(col("entity")),
      Some("""WITH e AS (SELECT user_id, epoch_us(ts) AS ts, event_type FROM events
        |  WHERE event_type IN ('view', 'click', 'purchase')),
        | s1 AS (SELECT user_id, MIN(ts) AS t1 FROM e WHERE event_type = 'view' GROUP BY 1),
        | s2 AS (SELECT e.user_id, MIN(ts) AS t2 FROM e JOIN s1 USING (user_id)
        |   WHERE event_type = 'click' AND ts >= t1 GROUP BY 1),
        | s3 AS (SELECT e.user_id, MIN(ts) AS t3 FROM e JOIN s2 USING (user_id)
        |   WHERE event_type = 'purchase' AND ts >= t2 GROUP BY 1)
        |SELECT u.user_id AS entity, t1 AS step_1_ts, t2 AS step_2_ts, t3 AS step_3_ts,
        |  CAST(CASE WHEN t1 IS NULL THEN 0 WHEN t2 IS NULL THEN 1
        |    WHEN t3 IS NULL THEN 2 ELSE 3 END AS INT) AS steps_completed
        |FROM (SELECT DISTINCT user_id FROM e) u
        |LEFT JOIN s1 USING (user_id) LEFT JOIN s2 USING (user_id)
        |LEFT JOIN s3 USING (user_id)
        |ORDER BY entity""".stripMargin)),

    Q("privacy_k_anon",
      // k-anonymity suppression over (lang, source, size-bin) quasi-
      // identifiers, k=3: rare combinations null out, every row kept
      (s, dir) => Privacy.suppressRare(
          T(s, dir, "documents").select(col("doc_id"), col("lang"),
            col("source"), (col("n_chars") % 20).as("size_bin")),
          Seq(col("lang"), col("source"), col("size_bin")), k = 3)
        .orderBy(col("doc_id")),
      Some("""WITH b AS (SELECT doc_id, lang, source, n_chars % 20 AS size_bin,
        |  COUNT(*) OVER (PARTITION BY lang, source, n_chars % 20) AS qn
        | FROM documents)
        |SELECT doc_id,
        | CASE WHEN qn < 3 THEN NULL ELSE lang END AS lang,
        | CASE WHEN qn < 3 THEN NULL ELSE source END AS source,
        | CASE WHEN qn < 3 THEN NULL ELSE size_bin END AS size_bin,
        | qn < 3 AS suppressed
        |FROM b ORDER BY doc_id""".stripMargin)))

  /** events with a micros-typed ts column, whatever the session's
    * nanos handling produced (long nanos under nanosAsLong, else a
    * timestamp).
    */
  private def eventsUs(s: SparkSession, dir: String): DataFrame = {
    val ev = T(s, dir, "events")
    val tsUs = ev.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType => expr("ts DIV 1000")
      case _ => unix_micros(col("ts"))
    }
    ev.withColumn("ts_us", tsUs)
  }

  /** Temporal joins (scale extensions — SURVEY §2.9 notes the
    * reference has no join surface; these are the merge_asof / interval
    * join analogues a pipeline needs). Oracles use DuckDB's native
    * ASOF JOIN / BETWEEN predicates against the same tables.
    */
  private def joinOps: Seq[Q] = {
    def purchases(s: SparkSession, dir: String): DataFrame =
      eventsUs(s, dir).filter(col("event_type") === "purchase")
        .select(col("user_id"), col("ts_us"),
          col("event_id").as("p_id"), col("value").as("p_value"))
    def nonPurchases(s: SparkSession, dir: String): DataFrame =
      eventsUs(s, dir).filter(col("event_type") =!= "purchase")
        .select(col("user_id"), col("ts_us"), col("event_id"))

    Seq(
      Q("join_asof",
        // last purchase (value+id) at or before each non-purchase event
        (s, dir) => Joins.asof(nonPurchases(s, dir), purchases(s, dir),
            Seq("user_id"), "ts_us", "ts_us",
            rightVals = Seq("purchase_id" -> "p_id", "purchase_value" -> "p_value"))
          .orderBy(col("event_id")),
        Some("""SELECT l.user_id, epoch_us(l.ts) AS ts_us, l.event_id,
          |  r.event_id AS purchase_id, r.value AS purchase_value
          |FROM (SELECT * FROM events WHERE event_type <> 'purchase') l
          |ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'purchase') r
          |  ON l.user_id = r.user_id AND l.ts >= r.ts
          |ORDER BY l.event_id""".stripMargin)),

      Q("join_asof_split",
        // the sliceWidth skew lever must emit EXACTLY the unsplit
        // output — gated against DuckDB's native ASOF JOIN (an
        // independent oracle, not the engine's own unsplit path).
        // 6h slices cut each user's event-time range into ~30 windows.
        (s, dir) => Joins.asof(nonPurchases(s, dir), purchases(s, dir),
            Seq("user_id"), "ts_us", "ts_us",
            rightVals = Seq("purchase_id" -> "p_id", "purchase_value" -> "p_value"),
            sliceWidth = Some(21600000000L))
          .orderBy(col("event_id")),
        Some("""SELECT l.user_id, epoch_us(l.ts) AS ts_us, l.event_id,
          |  r.event_id AS purchase_id, r.value AS purchase_value
          |FROM (SELECT * FROM events WHERE event_type <> 'purchase') l
          |ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'purchase') r
          |  ON l.user_id = r.user_id AND l.ts >= r.ts
          |ORDER BY l.event_id""".stripMargin)),

      Q("join_asof_fwd",
        // next purchase within 24h after each non-purchase event
        (s, dir) => Joins.asof(nonPurchases(s, dir), purchases(s, dir),
            Seq("user_id"), "ts_us", "ts_us",
            rightVals = Seq("next_purchase_id" -> "p_id"),
            direction = Joins.Forward, tolerance = Some(86400000000L),
            matchedTs = Some("next_ts_us"))
          .orderBy(col("event_id")),
        Some("""SELECT l.user_id, epoch_us(l.ts) AS ts_us, l.event_id,
          |  CASE WHEN epoch_us(r.ts) - epoch_us(l.ts) <= 86400000000
          |    THEN epoch_us(r.ts) END AS next_ts_us,
          |  CASE WHEN epoch_us(r.ts) - epoch_us(l.ts) <= 86400000000
          |    THEN r.event_id END AS next_purchase_id
          |FROM (SELECT * FROM events WHERE event_type <> 'purchase') l
          |ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'purchase') r
          |  ON l.user_id = r.user_id AND l.ts <= r.ts
          |ORDER BY l.event_id""".stripMargin)),

      Q("join_asof_nearest",
        // nearest purchase in |time|, either direction; an exact-
        // distance tie prefers the earlier (backward) purchase —
        // pandas direction='nearest'. The oracle is the explicit
        // argmin over all (left, right) pairs, independent of the
        // engine's window formulation.
        (s, dir) => Joins.asof(nonPurchases(s, dir), purchases(s, dir),
            Seq("user_id"), "ts_us", "ts_us",
            rightVals = Seq("near_purchase_id" -> "p_id"),
            direction = Joins.Nearest, matchedTs = Some("near_ts_us"))
          .orderBy(col("event_id")),
        Some("""WITH l AS (SELECT user_id, epoch_us(ts) AS ts_us, event_id
          |  FROM events WHERE event_type <> 'purchase'),
          | r AS (SELECT user_id, epoch_us(ts) AS ts_us, event_id AS p_id
          |  FROM events WHERE event_type = 'purchase'),
          | cand AS (SELECT l.event_id, r.ts_us AS rts, r.p_id,
          |   abs(l.ts_us - r.ts_us) AS d,
          |   CASE WHEN r.ts_us <= l.ts_us THEN 0 ELSE 1 END AS pref
          |   FROM l JOIN r ON l.user_id = r.user_id),
          | best AS (SELECT event_id, rts, p_id FROM (
          |   SELECT *, ROW_NUMBER() OVER (PARTITION BY event_id
          |     ORDER BY d, pref, p_id DESC) AS rn FROM cand) WHERE rn = 1)
          |SELECT l.user_id, l.ts_us, l.event_id, b.rts AS near_ts_us,
          |  b.p_id AS near_purchase_id
          |FROM l LEFT JOIN best b USING (event_id)
          |ORDER BY l.event_id""".stripMargin)),

      Q("join_asof_nearest_split",
        // Nearest under the sliceWidth lever: BOTH directions' slice
        // carries inject (each visible only to its own window frame) —
        // same independent all-pairs oracle as the unsplit gate
        (s, dir) => Joins.asof(nonPurchases(s, dir), purchases(s, dir),
            Seq("user_id"), "ts_us", "ts_us",
            rightVals = Seq("near_purchase_id" -> "p_id"),
            direction = Joins.Nearest, matchedTs = Some("near_ts_us"),
            sliceWidth = Some(21600000000L))
          .orderBy(col("event_id")),
        Some("""WITH l AS (SELECT user_id, epoch_us(ts) AS ts_us, event_id
          |  FROM events WHERE event_type <> 'purchase'),
          | r AS (SELECT user_id, epoch_us(ts) AS ts_us, event_id AS p_id
          |  FROM events WHERE event_type = 'purchase'),
          | cand AS (SELECT l.event_id, r.ts_us AS rts, r.p_id,
          |   abs(l.ts_us - r.ts_us) AS d,
          |   CASE WHEN r.ts_us <= l.ts_us THEN 0 ELSE 1 END AS pref
          |   FROM l JOIN r ON l.user_id = r.user_id),
          | best AS (SELECT event_id, rts, p_id FROM (
          |   SELECT *, ROW_NUMBER() OVER (PARTITION BY event_id
          |     ORDER BY d, pref, p_id DESC) AS rn FROM cand) WHERE rn = 1)
          |SELECT l.user_id, l.ts_us, l.event_id, b.rts AS near_ts_us,
          |  b.p_id AS near_purchase_id
          |FROM l LEFT JOIN best b USING (event_id)
          |ORDER BY l.event_id""".stripMargin)),

      Q("join_range",
        // clicks within ±1h of a same-user purchase (binned equi-join)
        (s, dir) => {
          val clicks = eventsUs(s, dir).filter(col("event_type") === "click")
            .select(col("user_id"), col("event_id"), col("ts_us"))
          val iv = purchases(s, dir).select(col("user_id"),
            col("p_id").as("purchase_id"),
            (col("ts_us") - 3600000000L).as("lo"),
            (col("ts_us") + 3600000000L).as("hi"))
          Joins.rangeJoin(clicks, iv, Seq("user_id"), "ts_us", "lo", "hi",
              bucketWidth = 3600000000L)
            .select(col("event_id"), col("purchase_id"))
            .orderBy(col("event_id"), col("purchase_id"))
        },
        Some("""SELECT l.event_id, r.event_id AS purchase_id
          |FROM (SELECT * FROM events WHERE event_type = 'click') l
          |JOIN (SELECT * FROM events WHERE event_type = 'purchase') r
          |  ON l.user_id = r.user_id
          | AND l.ts BETWEEN r.ts - INTERVAL 1 HOUR AND r.ts + INTERVAL 1 HOUR
          |ORDER BY 1, 2""".stripMargin)),

      Q("join_interval",
        // interval-overlap join: view windows [ts, ts+30m] against
        // same-user purchase windows [ts−15m, ts+15m]; the bucketised
        // engine emits each overlapping pair exactly once (from the
        // overlap-start bucket), oracled by plain range predicates
        (s, dir) => {
          val views = eventsUs(s, dir).filter(col("event_type") === "view")
            .select(col("user_id"), col("event_id"),
              col("ts_us").as("lo"), (col("ts_us") + 1800000000L).as("hi"))
          val pv = purchases(s, dir).select(col("user_id"),
            col("p_id").as("purchase_id"),
            (col("ts_us") - 900000000L).as("plo"),
            (col("ts_us") + 900000000L).as("phi"))
          Joins.intervalJoin(views, pv, Seq("user_id"), "lo", "hi",
              "plo", "phi", bucketWidth = 3600000000L)
            .select(col("event_id"), col("purchase_id"))
            .orderBy(col("event_id"), col("purchase_id"))
        },
        Some("""SELECT l.event_id, r.event_id AS purchase_id
          |FROM (SELECT * FROM events WHERE event_type = 'view') l
          |JOIN (SELECT * FROM events WHERE event_type = 'purchase') r
          |  ON l.user_id = r.user_id
          | AND l.ts <= r.ts + INTERVAL 15 MINUTE
          | AND r.ts - INTERVAL 15 MINUTE <= l.ts + INTERVAL 30 MINUTE
          |ORDER BY 1, 2""".stripMargin))
    )
  }

  /** events-table helpers: user_id grouping, ts ordering ((user_id, ts)
    * is unique in the testdata), event-level output sorted by event_id.
    */
  private def evGb(s: SparkSession, dir: String): GroupBy =
    new GroupBy(T(s, dir, "events"), Seq(col("user_id")))
  private def evOut(df: DataFrame, cols: String*): DataFrame =
    df.select(("event_id" +: "user_id" +: cols).map(col): _*).orderBy("event_id")
  /** value with nulls injected (error rows) to exercise skipNa. */
  private def nullableValue: Column =
    when(col("event_type") === "error", lit(null)).otherwise(col("value"))
  private val nullableValueSql =
    "CASE WHEN event_type = 'error' THEN NULL ELSE value END"
  private val cumFrameSql =
    "PARTITION BY user_id ORDER BY ts ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW"

  private def coreAgg: Seq[Q] = Seq(
    Q("q1_agg",
      (s, dir) => {
        val li = T(s, dir, "lineitem")
        new GroupBy(li, liKeys).aggregate(
          Seq(
            AggSpec("sum", col("l_quantity"), "sum_qty", exact = true),
            AggSpec("sum", col("l_extendedprice"), "sum_base_price", exact = true),
            AggSpec("sum", col("l_extendedprice") * (lit(1) - col("l_discount")),
              "sum_disc_price", exact = true),
            AggSpec("mean", col("l_discount"), "avg_disc", exact = true),
            AggSpec("size", lit(1), "count_order")),
          mask = Some(shipMask))
      },
      Some(s"""SELECT l_returnflag, l_linestatus,
        | ${dsum("l_quantity")} AS sum_qty,
        | ${dsum("l_extendedprice")} AS sum_base_price,
        | ${dsum("l_extendedprice * (1 - l_discount)")} AS sum_disc_price,
        | ${dmean("l_discount")} AS avg_disc,
        | COUNT(*) AS count_order
        |FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin)),

    Q("gb_size",
      (s, dir) => new GroupBy(T(s, dir, "lineitem"), liKeys).size(),
      Some("""SELECT l_returnflag, l_linestatus, COUNT(*) AS size
        |FROM lineitem GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)),

    Q("gb_ngroups",
      // ngroups is an action (a Long); the gate wraps the returned
      // scalar in a one-row frame so the real API path is what's
      // oracle-checked
      (s, dir) => {
        import s.implicits._
        Seq(new GroupBy(T(s, dir, "lineitem"), liKeys).ngroups).toDF("ngroups")
      },
      Some("""SELECT COUNT(*) AS ngroups FROM
        |  (SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem)""".stripMargin)),

    Q("gb_count_masked",
      (s, dir) => new GroupBy(T(s, dir, "lineitem"), liKeys).aggregate(
        Seq(AggSpec("count", col("l_quantity"), "n")),
        mask = Some(col("l_discount") > 0.02)),
      Some("""SELECT l_returnflag, l_linestatus,
        | COUNT(CASE WHEN l_discount > 0.02 THEN l_quantity END) AS n
        |FROM lineitem GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)),

    Q("gb_sum_mask_slice",
      // the reference's slice-mask form (core.py:493-519,
      // mask=slice(start, stop, step)) compiled against the explicit
      // row id: a codegen'd range predicate inside the aggregate
      (s, dir) => new GroupBy(T(s, dir, "events"), Seq(col("event_type")))
        .aggregate(Seq(AggSpec("sum", col("value"), "sum_value", exact = true),
          AggSpec("count", col("value"), "n")),
          mask = Some(GroupBy.maskSlice(col("event_id"), 1000L, 50000L, 7L))),
      // HAVING replays observed-only: all-masked groups drop
      Some(s"""SELECT event_type,
        | CAST(SUM(CASE WHEN event_id >= 1000 AND event_id < 50000
        |   AND (event_id - 1000) % 7 = 0 THEN CAST(value AS DECIMAL(28,6)) END) AS DOUBLE) AS sum_value,
        | COUNT(CASE WHEN event_id >= 1000 AND event_id < 50000
        |   AND (event_id - 1000) % 7 = 0 THEN value END) AS n
        |FROM events GROUP BY 1
        |HAVING COUNT(CASE WHEN event_id >= 1000 AND event_id < 50000
        |   AND (event_id - 1000) % 7 = 0 THEN 1 END) > 0
        |ORDER BY 1""".stripMargin)),

    Q("gb_sum_mask_indices",
      // the fancy-indexer mask form (an integer position array)
      (s, dir) => new GroupBy(T(s, dir, "events"), Seq(col("event_type")))
        .aggregate(Seq(AggSpec("sum", col("value"), "sum_value", exact = true)),
          mask = Some(GroupBy.maskIndices(col("event_id"),
            Seq(11L, 42L, 1000L, 4999L, 12345L)))),
      Some(s"""SELECT event_type,
        | CAST(SUM(CASE WHEN event_id IN (11, 42, 1000, 4999, 12345)
        |   THEN CAST(value AS DECIMAL(28,6)) END) AS DOUBLE) AS sum_value
        |FROM events GROUP BY 1
        |HAVING COUNT(CASE WHEN event_id IN (11, 42, 1000, 4999, 12345)
        |   THEN 1 END) > 0
        |ORDER BY 1""".stripMargin)),

    Q("gb_get_group",
      // get_group(label): one group's rows, a pushdown-friendly filter
      (s, dir) => new GroupBy(T(s, dir, "events"), Seq(col("event_type")))
        .getGroup("purchase")
        .select(col("event_id"), col("event_type"), col("value"))
        .orderBy(col("event_id")),
      Some("""SELECT event_id, event_type, value FROM events
        |WHERE event_type = 'purchase' ORDER BY event_id""".stripMargin)),

    Q("gb_sum",
      (s, dir) => new GroupBy(T(s, dir, "lineitem"), liKeys).sum(
        Seq(col("l_quantity").as("sum_qty"), col("l_extendedprice").as("sum_price")),
        exact = true),
      Some(s"""SELECT l_returnflag, l_linestatus,
        | ${dsum("l_quantity")} AS sum_qty, ${dsum("l_extendedprice")} AS sum_price
        |FROM lineitem GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)),

    Q("gb_mean",
      (s, dir) => new GroupBy(T(s, dir, "lineitem"), liKeys).mean(
        Seq(col("l_quantity").as("avg_qty"), col("l_discount").as("avg_disc")),
        exact = true),
      Some(s"""SELECT l_returnflag, l_linestatus,
        | ${dmean("l_quantity")} AS avg_qty, ${dmean("l_discount")} AS avg_disc
        |FROM lineitem GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)),

    Q("gb_minmax",
      (s, dir) => {
        val li = T(s, dir, "lineitem")
        val out = new GroupBy(li, liKeys).aggregate(Seq(
          AggSpec("min", col("l_extendedprice"), "min_price"),
          AggSpec("max", col("l_extendedprice"), "max_price"),
          AggSpec("min", col("l_shipdate"), "min_ship"),
          AggSpec("max", col("l_shipdate"), "max_ship")))
        // when shipdate reads as TIMESTAMP (LTZ, UTC session), emit
        // NTZ so the parquet dump is tz-naive micros like the oracle's
        // (same wall-clock values; the compare is dtype-strict)
        li.schema("l_shipdate").dataType match {
          case org.apache.spark.sql.types.TimestampType =>
            out.withColumn("min_ship", col("min_ship").cast("timestamp_ntz"))
              .withColumn("max_ship", col("max_ship").cast("timestamp_ntz"))
          case _ => out
        }
      },
      Some("""SELECT l_returnflag, l_linestatus,
        | MIN(l_extendedprice) AS min_price, MAX(l_extendedprice) AS max_price,
        | MIN(l_shipdate) AS min_ship, MAX(l_shipdate) AS max_ship
        |FROM lineitem GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)),

    Q("gb_median",
      (s, dir) => new GroupBy(T(s, dir, "lineitem"), liKeys).median(
        Seq(col("l_quantity").as("med_qty"), col("l_extendedprice").as("med_price"))),
      Some("""SELECT l_returnflag, l_linestatus,
        | MEDIAN(l_quantity) AS med_qty, MEDIAN(l_extendedprice) AS med_price
        |FROM lineitem GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)),

    Q("gb_quantile",
      // exact arbitrary-q quantile (linear interpolation) — q=0.25 and
      // q=0.9; rounded on both sides like var/std (algorithm-identical
      // but float-op-order-sensitive)
      (s, dir) => {
        val g = new GroupBy(T(s, dir, "lineitem"), liKeys)
        g.quantile(Seq(col("l_quantity").as("q25_qty")), 0.25)
          .join(g.quantile(Seq(col("l_extendedprice").as("q90_price")), 0.9),
            Seq("l_returnflag", "l_linestatus"))
          .select(col("l_returnflag"), col("l_linestatus"),
            round(col("q25_qty"), 4).as("q25_qty"),
            round(col("q90_price"), 4).as("q90_price"))
          .orderBy(col("l_returnflag"), col("l_linestatus"))
      },
      Some("""SELECT l_returnflag, l_linestatus,
        | ROUND(quantile_cont(l_quantity, 0.25), 4) AS q25_qty,
        | ROUND(quantile_cont(l_extendedprice, 0.9), 4) AS q90_price
        |FROM lineitem GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)),

    Q("gb_skew_kurt",
      // pandas-semantics adjusted skewness (G1) and excess kurtosis
      // (G2), derived from Spark's population moments; DuckDB's
      // skewness/kurtosis compute the SAME bias-corrected statistics
      // natively — rounded on both sides like var/std
      (s, dir) => new GroupBy(T(s, dir, "lineitem"), liKeys).aggregate(Seq(
          AggSpec("skew", col("l_quantity"), "sk"),
          AggSpec("kurt", col("l_quantity"), "ku")))
        .select(col("l_returnflag"), col("l_linestatus"),
          round(col("sk"), 4).as("skew_qty"), round(col("ku"), 4).as("kurt_qty"))
        .orderBy(col("l_returnflag"), col("l_linestatus")),
      Some("""SELECT l_returnflag, l_linestatus,
        | ROUND(skewness(l_quantity), 4) AS skew_qty,
        | ROUND(kurtosis(l_quantity), 4) AS kurt_qty
        |FROM lineitem GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)),

    Q("gb_var_std",
      (s, dir) => new GroupBy(T(s, dir, "lineitem"), liKeys).aggregate(Seq(
          AggSpec("var", col("l_quantity"), "v1"),
          AggSpec("std", col("l_quantity"), "s1"),
          AggSpec("var", col("l_quantity"), "v0", ddof = 0),
          AggSpec("var", col("l_quantity"), "v2", ddof = 2)))
        .select(col("l_returnflag"), col("l_linestatus"),
          round(col("v1"), 4).as("var_qty"), round(col("s1"), 4).as("std_qty"),
          round(col("v0"), 4).as("varp_qty"), round(col("v2"), 4).as("var2_qty")),
      Some("""SELECT l_returnflag, l_linestatus,
        | ROUND(VAR_SAMP(l_quantity), 4) AS var_qty,
        | ROUND(STDDEV_SAMP(l_quantity), 4) AS std_qty,
        | ROUND(VAR_POP(l_quantity), 4) AS varp_qty,
        | ROUND((SUM(l_quantity*l_quantity) - SUM(l_quantity)*SUM(l_quantity)/COUNT(l_quantity))
        |       / (COUNT(l_quantity) - 2), 4) AS var2_qty
        |FROM lineitem GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)),

    Q("gb_cov_corr",
      // pandas GroupBy.cov / corr for one column pair: pairwise-
      // complete rows, single-pass decimal-exact pair moments. The
      // oracle replays the SAME Σxy identity (not DuckDB's native
      // covar/corr, which use different accumulation), so the
      // statistic is bit-identical before the defensive round.
      (s, dir) => {
        val g = new GroupBy(T(s, dir, "lineitem"), liKeys)
        val x = col("l_quantity"); val y = col("l_extendedprice")
        g.cov(x, y, out = "cov_qp", exact = true)
          .join(g.cov(x, y, ddof = 0, out = "covp_qp", exact = true),
            Seq("l_returnflag", "l_linestatus"))
          .join(g.corr(x, y, out = "corr_qp", exact = true),
            Seq("l_returnflag", "l_linestatus"))
          .select(col("l_returnflag"), col("l_linestatus"),
            round(col("cov_qp"), 4).as("cov_qp"),
            round(col("covp_qp"), 4).as("covp_qp"),
            round(col("corr_qp"), 4).as("corr_qp"))
          .orderBy(col("l_returnflag"), col("l_linestatus"))
      },
      Some("""WITH m AS (SELECT l_returnflag, l_linestatus,
        |  COUNT(CASE WHEN l_quantity IS NOT NULL AND l_extendedprice IS NOT NULL THEN 1 END) AS n,
        |  CAST(SUM(CASE WHEN l_quantity IS NOT NULL AND l_extendedprice IS NOT NULL
        |    THEN CAST(CAST(l_quantity AS DOUBLE) AS DECIMAL(28,6)) END) AS DOUBLE) AS sx,
        |  CAST(SUM(CASE WHEN l_quantity IS NOT NULL AND l_extendedprice IS NOT NULL
        |    THEN CAST(CAST(l_extendedprice AS DOUBLE) AS DECIMAL(28,6)) END) AS DOUBLE) AS sy,
        |  CAST(SUM(CASE WHEN l_quantity IS NOT NULL AND l_extendedprice IS NOT NULL
        |    THEN CAST(CAST(l_quantity AS DOUBLE) * CAST(l_extendedprice AS DOUBLE) AS DECIMAL(38,6)) END) AS DOUBLE) AS sxy,
        |  CAST(SUM(CASE WHEN l_quantity IS NOT NULL AND l_extendedprice IS NOT NULL
        |    THEN CAST(CAST(l_quantity AS DOUBLE) * CAST(l_quantity AS DOUBLE) AS DECIMAL(38,6)) END) AS DOUBLE) AS sxx,
        |  CAST(SUM(CASE WHEN l_quantity IS NOT NULL AND l_extendedprice IS NOT NULL
        |    THEN CAST(CAST(l_extendedprice AS DOUBLE) * CAST(l_extendedprice AS DOUBLE) AS DECIMAL(38,6)) END) AS DOUBLE) AS syy
        | FROM lineitem GROUP BY 1, 2)
        |SELECT l_returnflag, l_linestatus,
        | ROUND(CASE WHEN n > 1 THEN (sxy - sx*sy/n) / (n - 1) END, 4) AS cov_qp,
        | ROUND(CASE WHEN n > 0 THEN (sxy - sx*sy/n) / n END, 4) AS covp_qp,
        | ROUND(CASE WHEN n >= 2 AND (sxx - sx*sx/n) > 0 AND (syy - sy*sy/n) > 0
        |   THEN (sxy - sx*sy/n) / sqrt((sxx - sx*sx/n) * (syy - sy*sy/n)) END, 4) AS corr_qp
        |FROM m ORDER BY 1, 2""".stripMargin)),

    Q("gb_prod_sem",
      // pandas GroupBy.prod (exp-sum-log with zero latch and parity
      // sign, decimal-summed ln terms) and sem (std/√n, ddof 1 and
      // 0), over a masked ~0.5% subset so the product magnitude stays
      // in round-4 range; the oracle replays the identical formula
      (s, dir) => new GroupBy(T(s, dir, "lineitem"), liKeys).aggregate(Seq(
          AggSpec("prod", lit(1.5) - col("l_discount"), "p1"),
          AggSpec("sem", col("l_quantity"), "s1"),
          AggSpec("sem", col("l_quantity"), "s0", ddof = 0)),
          mask = Some(col("l_orderkey") % 211 === 7))
        .select(col("l_returnflag"), col("l_linestatus"),
          round(col("p1"), 4).as("prod_disc"),
          round(col("s1"), 4).as("sem_qty"),
          round(col("s0"), 4).as("sem0_qty"))
        .orderBy(col("l_returnflag"), col("l_linestatus")),
      Some("""WITH m AS (SELECT l_returnflag, l_linestatus,
        |  CAST(1.5 - l_discount AS DOUBLE) AS x, l_quantity AS q
        | FROM lineitem WHERE l_orderkey % 211 = 7),
        | a AS (SELECT l_returnflag, l_linestatus,
        |  COUNT(x) AS cnt, COUNT(CASE WHEN x = 0 THEN 1 END) AS zeros,
        |  COUNT(CASE WHEN x < 0 THEN 1 END) AS negs,
        |  CAST(SUM(CAST(CASE WHEN x <> 0 THEN ln(abs(x)) END AS DECIMAL(38,8))) AS DOUBLE) AS sumln,
        |  STDDEV_SAMP(q) AS sd1, STDDEV_POP(q) AS sd0, COUNT(q) AS nq
        | FROM m GROUP BY 1, 2)
        |SELECT l_returnflag, l_linestatus,
        | ROUND(CASE WHEN cnt = 0 THEN 1.0 WHEN zeros > 0 THEN 0.0
        |   ELSE exp(sumln) * (CASE WHEN negs % 2 = 0 THEN 1.0 ELSE -1.0 END) END, 4) AS prod_disc,
        | ROUND(sd1 / sqrt(CAST(nq AS DOUBLE)), 4) AS sem_qty,
        | ROUND(sd0 / sqrt(CAST(nq AS DOUBLE)), 4) AS sem0_qty
        |FROM a ORDER BY 1, 2""".stripMargin)),

    Q("gb_describe",
      // pandas describe in ONE aggregation pass: count/mean/std/min/
      // quartiles/max; mean decimal-exact, std + the sort-derived
      // quantiles rounded like the var/std family
      (s, dir) => new GroupBy(T(s, dir, "lineitem"), liKeys)
        .describe(col("l_extendedprice"))
        .select(col("l_returnflag"), col("l_linestatus"), col("count"),
          col("mean"), round(col("std"), 4).as("std"), col("min"),
          round(col("q25"), 4).as("q25"), round(col("q50"), 4).as("q50"),
          round(col("q75"), 4).as("q75"), col("max"))
        .orderBy(col("l_returnflag"), col("l_linestatus")),
      Some(s"""SELECT l_returnflag, l_linestatus,
        | COUNT(l_extendedprice) AS count, ${dmean("l_extendedprice")} AS mean,
        | ROUND(STDDEV_SAMP(l_extendedprice), 4) AS std,
        | MIN(l_extendedprice) AS min,
        | ROUND(quantile_cont(l_extendedprice, 0.25), 4) AS q25,
        | ROUND(quantile_cont(l_extendedprice, 0.5), 4) AS q50,
        | ROUND(quantile_cont(l_extendedprice, 0.75), 4) AS q75,
        | MAX(l_extendedprice) AS max
        |FROM lineitem GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)),

    Q("gb_scale",
      // per-group z-score + min-max transforms: bounded moment agg →
      // BROADCAST stats join-back, data rows never shuffle (the
      // winsorize shape — a whole-partition window would serialize a
      // hot key); decimal-exact moments → unrounded bit-exact scores
      (s, dir) => {
        val ev = T(s, dir, "events")
        val g1 = new GroupBy(ev, Seq(col("user_id"))).zscore(col("value"))
        val g2 = new GroupBy(g1, Seq(col("user_id"))).minmaxScale(col("value"))
        g2.select(col("event_id"), col("user_id"), col("zscore"), col("scaled"))
          .orderBy(col("event_id"))
      },
      Some("""WITH st AS (SELECT user_id,
        |  CAST(COUNT(value) AS DOUBLE) AS n,
        |  CAST(SUM(CAST(value AS DECIMAL(28,6))) AS DOUBLE) AS s,
        |  CAST(SUM(CAST(CAST(value AS DOUBLE) * CAST(value AS DOUBLE) AS DECIMAL(38,6))) AS DOUBLE) AS ss,
        |  MIN(value) AS mn, MAX(value) AS mx
        | FROM events GROUP BY user_id)
        |SELECT event_id, e.user_id,
        | CASE WHEN value IS NOT NULL AND n > 1
        |   AND sqrt(GREATEST((ss - s*s/n) / (n - 1), 0.0)) > 0
        |   THEN (CAST(value AS DOUBLE) - s/n) / sqrt(GREATEST((ss - s*s/n) / (n - 1), 0.0)) END AS zscore,
        | CASE WHEN value IS NOT NULL AND mx > mn
        |   THEN (CAST(value AS DOUBLE) - mn) / (mx - mn) END AS scaled
        |FROM events e JOIN st USING (user_id)
        |ORDER BY event_id""".stripMargin)),

    Q("gb_any_all_idx",
      // pandas any/all (skipna, empty-group identities) and
      // idxmin/idxmax (first-occurrence tie rule via lexicographic
      // struct-min — the same composite-key trick as first/last)
      (s, dir) => {
        val ev = eventsUs(s, dir)
        val g = new GroupBy(ev, Seq(col("user_id")))
        g.any(Seq((col("value") > 400).as("any_big")))
          .join(g.all(Seq((col("value") > 0.5).as("all_pos"))), Seq("user_id"))
          .join(g.idxmin(Seq(col("value").as("idx_min")), col("event_id")),
            Seq("user_id"))
          .join(g.idxmax(Seq(col("value").as("idx_max")), col("event_id")),
            Seq("user_id"))
          .orderBy(col("user_id"))
      },
      Some("""SELECT user_id,
        | COALESCE(bool_or(value > 400), false) AS any_big,
        | COALESCE(bool_and(value > 0.5), true) AS all_pos,
        | (MIN(CASE WHEN value IS NOT NULL THEN
        |   struct_pack(v := CAST(value AS DOUBLE), o := event_id) END)).o AS idx_min,
        | (MIN(CASE WHEN value IS NOT NULL THEN
        |   struct_pack(v := -CAST(value AS DOUBLE), o := event_id) END)).o AS idx_max
        |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin)),

    Q("gb_ohlc",
      // pandas GroupBy.ohlc: open/high/low/close in one aggregation
      // pass, (ord, value) composite keys making ties deterministic
      (s, dir) => new GroupBy(eventsUs(s, dir), Seq(col("user_id")))
        .ohlc(col("value"), col("ts_us"))
        .orderBy(col("user_id")),
      Some("""SELECT user_id,
        | (MIN(CASE WHEN value IS NOT NULL THEN
        |   struct_pack(o := epoch_us(ts), v := value) END)).v AS open,
        | MAX(value) AS high, MIN(value) AS low,
        | (MAX(CASE WHEN value IS NOT NULL THEN
        |   struct_pack(o := epoch_us(ts), v := value) END)).v AS close
        |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin)),

    Q("gb_rank",
      // pandas GroupBy.rank as a transform: min / dense / first /
      // average methods + pct, null-safe ordering (nulls sort last so
      // non-null ranks are unaffected); integer ranks cast to double
      // like pandas; average/pct are exact dyadic arithmetic —
      // unrounded
      (s, dir) => {
        val ev = T(s, dir, "events")
        def g(d: DataFrame) = new GroupBy(d, Seq(col("user_id")))
        val r1 = g(ev).rank(col("value"), "min", out = "rank_min")
        val r2 = g(r1).rank(col("value"), "dense", out = "rank_dense")
        val r3 = g(r2).rank(col("value"), "first",
          ord = Some(col("event_id")), out = "rank_first")
        val r4 = g(r3).rank(col("value"), "average", out = "rank_avg")
        val r5 = g(r4).rank(col("value"), "average", pct = true,
          out = "rank_pct")
        // dense+pct divides by the DISTINCT non-null count, not the
        // non-null row count (pandas GH#15630) — round-7 advice item
        val r6 = g(r5).rank(col("value"), "dense", pct = true,
          out = "rank_dense_pct")
        r6.select(col("event_id"), col("user_id"), col("rank_min"),
            col("rank_dense"), col("rank_first"), col("rank_avg"),
            col("rank_pct"), col("rank_dense_pct"))
          .orderBy(col("event_id"))
      },
      Some("""SELECT event_id, user_id,
        | CASE WHEN value IS NOT NULL THEN CAST(RANK() OVER w AS DOUBLE) END AS rank_min,
        | CASE WHEN value IS NOT NULL THEN CAST(DENSE_RANK() OVER w AS DOUBLE) END AS rank_dense,
        | CASE WHEN value IS NOT NULL THEN CAST(ROW_NUMBER() OVER w2 AS DOUBLE) END AS rank_first,
        | CASE WHEN value IS NOT NULL THEN CAST(RANK() OVER w AS DOUBLE)
        |   + (CAST(COUNT(value) OVER wt AS DOUBLE) - 1) / 2.0 END AS rank_avg,
        | CASE WHEN value IS NOT NULL THEN (CAST(RANK() OVER w AS DOUBLE)
        |   + (CAST(COUNT(value) OVER wt AS DOUBLE) - 1) / 2.0)
        |   / CAST(COUNT(value) OVER wu AS DOUBLE) END AS rank_pct,
        | CASE WHEN value IS NOT NULL THEN CAST(DENSE_RANK() OVER w AS DOUBLE)
        |   / CAST(COUNT(DISTINCT value) OVER wu AS DOUBLE) END AS rank_dense_pct
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY value ASC NULLS LAST),
        |  w2 AS (PARTITION BY user_id ORDER BY value ASC NULLS LAST, event_id),
        |  wt AS (PARTITION BY user_id, value),
        |  wu AS (PARTITION BY user_id)
        |ORDER BY event_id""".stripMargin)),

    Q("gb_first_last",
      (s, dir) => {
        // (l_orderkey, l_linenumber) is not unique in the synthetic data,
        // so the order key ties; tie-break by the value itself to keep
        // first/last deterministic on both engines.
        val ordV = struct(liOrd.as("o"), col("l_extendedprice").as("v"))
        new GroupBy(T(s, dir, "lineitem"), liKeys).aggregate(Seq(
          AggSpec("first", col("l_extendedprice"), "first_price", ord = Some(ordV)),
          AggSpec("last", col("l_extendedprice"), "last_price", ord = Some(ordV))))
      },
      Some("""SELECT l_returnflag, l_linestatus,
        | (MIN(CASE WHEN l_extendedprice IS NOT NULL THEN
        |   struct_pack(o := l_orderkey*10 + l_linenumber, v := l_extendedprice) END)).v AS first_price,
        | (MAX(CASE WHEN l_extendedprice IS NOT NULL THEN
        |   struct_pack(o := l_orderkey*10 + l_linenumber, v := l_extendedprice) END)).v AS last_price
        |FROM lineitem GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)),

    Q("gb_agg_zip",
      (s, dir) => new GroupBy(T(s, dir, "lineitem"), liKeys).agg(
        Seq("sum", "mean", "max"),
        Seq(col("l_quantity").as("sum_qty"), col("l_extendedprice").as("avg_price"),
          col("l_discount").as("max_disc")),
        exact = true),
      Some(s"""SELECT l_returnflag, l_linestatus,
        | ${dsum("l_quantity")} AS sum_qty, ${dmean("l_extendedprice")} AS avg_price,
        | MAX(l_discount) AS max_disc
        |FROM lineitem GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)),

    Q("gb_ratio",
      (s, dir) => new GroupBy(T(s, dir, "lineitem"), liKeys).ratio(
        col("l_extendedprice") * col("l_discount"), col("l_extendedprice"),
        name = "disc_ratio", exact = true),
      Some(s"""SELECT l_returnflag, l_linestatus,
        | ${dsum("l_extendedprice * l_discount")} / ${dsum("l_extendedprice")} AS disc_ratio
        |FROM lineitem GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)),

    Q("gb_subset_ratio",
      (s, dir) => new GroupBy(T(s, dir, "lineitem"), liKeys).subsetRatio(
        col("l_quantity"), col("l_discount") > 0.05,
        globalMask = Some(shipMask), exact = true),
      Some(s"""SELECT l_returnflag, l_linestatus,
        | ${dsum("CASE WHEN l_discount > 0.05 AND l_shipdate <= TIMESTAMP '1998-09-02 00:00:00' THEN l_quantity END")}
        |   / ${dsum("CASE WHEN l_shipdate <= TIMESTAMP '1998-09-02 00:00:00' THEN l_quantity END")}
        |   AS subset_ratio
        |FROM lineitem GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)),

    Q("gb_density",
      (s, dir) => new GroupBy(T(s, dir, "lineitem"), liKeys).density(
        col("l_extendedprice"), exact = true),
      Some(s"""SELECT l_returnflag, l_linestatus,
        | ${dsum("l_extendedprice")}
        |   / CAST(SUM(SUM(CAST(l_extendedprice AS DECIMAL(28,6))))
        |       OVER (PARTITION BY l_returnflag) AS DOUBLE)
        |   * 100 AS density
        |FROM lineitem GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)),

    Q("gb_sum_margins",
      (s, dir) => new GroupBy(T(s, dir, "lineitem"), liKeys).sum(
        Seq(col("l_quantity").as("sum_qty")), margins = Margins.All, exact = true),
      Some(s"""SELECT
        | CASE WHEN GROUPING(l_returnflag) = 1 THEN 'All' ELSE l_returnflag END AS l_returnflag,
        | CASE WHEN GROUPING(l_linestatus) = 1 THEN 'All' ELSE l_linestatus END AS l_linestatus,
        | ${dsum("l_quantity")} AS sum_qty
        |FROM lineitem
        |GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_linestatus), (l_returnflag), ())
        |ORDER BY 1, 2""".stripMargin)),

    Q("gb_transform_sum",
      (s, dir) => new GroupBy(T(s, dir, "lineitem"), liKeys)
        .sum(Seq(col("l_quantity").as("qty_total")), transform = true, exact = true)
        .select(col("l_orderkey"), col("l_linenumber"), col("l_returnflag"),
          col("l_linestatus"), col("qty_total"))
        .orderBy(col("l_orderkey"), col("l_linenumber")),
      Some("""SELECT l_orderkey, l_linenumber, l_returnflag, l_linestatus,
        | CAST(SUM(CAST(l_quantity AS DECIMAL(28,6)))
        |   OVER (PARTITION BY l_returnflag, l_linestatus) AS DOUBLE) AS qty_total
        |FROM lineitem ORDER BY l_orderkey, l_linenumber""".stripMargin)),

    Q("gb_value_counts",
      (s, dir) => GroupBy.valueCounts(T(s, dir, "orders"), col("o_orderpriority"),
        normalize = true),
      Some("""SELECT o_orderpriority,
        | CAST(COUNT(*) AS DOUBLE) / CAST((SELECT COUNT(*) FROM orders) AS DOUBLE) AS proportion
        |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin)),

    Q("gb_key_count",
      (s, dir) => new GroupBy(T(s, dir, "orders"), Seq(col("o_orderstatus")))
        .keyCount(),
      Some("""SELECT o_orderstatus, COUNT(*) AS key_count
        |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin)),

    Q("gb_nunique",
      (s, dir) => new GroupBy(T(s, dir, "lineitem"), liKeys).nunique(
        Seq(col("l_partkey").as("n_parts"), col("l_suppkey").as("n_supps"))),
      Some("""SELECT l_returnflag, l_linestatus,
        | COUNT(DISTINCT l_partkey) AS n_parts,
        | COUNT(DISTINCT l_suppkey) AS n_supps
        |FROM lineitem GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)),

    Q("gb_sum_salted",
      // skew-safe two-phase aggregation must equal the plain path —
      // same oracle as gb_sum
      (s, dir) => new GroupBy(T(s, dir, "lineitem"), liKeys).aggregateSalted(
        Seq(AggSpec("sum", col("l_quantity"), "sum_qty", exact = true),
          AggSpec("sum", col("l_extendedprice"), "sum_price", exact = true)),
        saltBuckets = 16),
      Some(s"""SELECT l_returnflag, l_linestatus,
        | ${dsum("l_quantity")} AS sum_qty, ${dsum("l_extendedprice")} AS sum_price
        |FROM lineitem GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)),

    Q("gb_unobserved",
      (s, dir) => {
        // observed_only=False with a categorical domain: counts per
        // (segment, nation) reindexed to the full cartesian domain,
        // unobserved combos zero-filled.
        val cust = T(s, dir, "customer")
        val gb = new GroupBy(cust, Seq(col("c_mktsegment"), col("c_nationkey")))
        val counts = gb.size(name = "n")
        val domain = cust.select(col("c_mktsegment")).distinct()
          .crossJoin(T(s, dir, "nation")
            .select(col("n_nationkey").as("c_nationkey")))
        gb.reindex(counts, domain, fill = Some(0L))
      },
      Some("""SELECT s.c_mktsegment, n.n_nationkey AS c_nationkey,
        | COALESCE(c.n, 0) AS n
        |FROM (SELECT DISTINCT c_mktsegment FROM customer) s
        |CROSS JOIN nation n
        |LEFT JOIN (SELECT c_mktsegment, c_nationkey, COUNT(*) AS n
        |           FROM customer GROUP BY 1, 2) c
        |  ON s.c_mktsegment = c.c_mktsegment AND n.n_nationkey = c.c_nationkey
        |ORDER BY 1, 2""".stripMargin)),

    Q("gb_mean_ts",
      (s, dir) => new GroupBy(T(s, dir, "lineitem"), liKeys).aggregate(Seq(
          AggSpec("mean", unix_micros(col("l_shipdate").cast("timestamp")), "m_us", exact = true),
          AggSpec("size", lit(1), "n")))
        // datetime mean (reference mean_from_sum_count integer-division
        // semantics, util.py:1290): epoch seconds, floored
        .select(col("l_returnflag"), col("l_linestatus"),
          floor(col("m_us") / 1000000.0).cast("long").as("mean_ship_s"), col("n")),
      Some("""SELECT l_returnflag, l_linestatus,
        | CAST(FLOOR(CAST(SUM(CAST(epoch_us(l_shipdate) AS DECIMAL(28,6))) AS DOUBLE)
        |   / COUNT(l_shipdate) / 1000000.0) AS BIGINT) AS mean_ship_s,
        | COUNT(*) AS n
        |FROM lineitem GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)),

    Q("gb_groups",
      // groupsOf returns (key, sorted row-id array); the gate emits the
      // EXPLODED (key, row_id, pos) shape — the driver's comparator
      // sorts rows by every column and cannot hash array cells
      (s, dir) => new GroupBy(T(s, dir, "orders"), Seq(col("o_orderstatus")))
        .groupsOf(col("o_orderkey"))
        .select(col("o_orderstatus"), posexplode(col("row_ids")))
        .select(col("o_orderstatus"), col("col").as("row_id"),
          (col("pos") + 1).cast("long").as("pos"))
        .orderBy(col("o_orderstatus"), col("pos")),
      Some("""SELECT o_orderstatus, o_orderkey AS row_id,
        | ROW_NUMBER() OVER (PARTITION BY o_orderstatus ORDER BY o_orderkey) AS pos
        |FROM orders ORDER BY 1, 3""".stripMargin))
  )

  private def windowOps: Seq[Q] = Seq(
    Q("cum_sum",
      (s, dir) => evOut(new RollingOps(evGb(s, dir))
        .cumsum(col("value"), col("ts"), exact = true), "cumsum"),
      Some(s"""SELECT event_id, user_id,
        | CAST(SUM(CAST(value AS DECIMAL(28,6))) OVER ($cumFrameSql) AS DOUBLE) AS cumsum
        |FROM events ORDER BY event_id""".stripMargin)),

    Q("cum_sum_split",
      // the sliceWidth skew lever must emit EXACTLY the unsplit output —
      // gated against the same independent DuckDB ROWS-BETWEEN oracle as
      // cum_sum, not this engine's own unsplit path (join_asof_split is
      // the template). 6h micros slices cut each user's range into ~30
      // windows; ord is ts_us (integral, per-key-unique).
      (s, dir) => evOut(new RollingOps(
          new GroupBy(eventsUs(s, dir), Seq(col("user_id"))))
        .cumsum(col("value"), col("ts_us"), exact = true,
          sliceWidth = Some(21600000000L)), "cumsum"),
      Some(s"""SELECT event_id, user_id,
        | CAST(SUM(CAST(value AS DECIMAL(28,6))) OVER ($cumFrameSql) AS DOUBLE) AS cumsum
        |FROM events ORDER BY event_id""".stripMargin)),

    Q("cum_sum_masked",
      (s, dir) => evOut(new RollingOps(evGb(s, dir))
        .cumsum(nullableValue, col("ts"), mask = Some(col("event_type") =!= "click"),
          exact = true), "cumsum"),
      Some(s"""SELECT event_id, user_id,
        | CAST(SUM(CAST(CASE WHEN event_type <> 'click' THEN $nullableValueSql END
        |   AS DECIMAL(28,6))) OVER ($cumFrameSql) AS DOUBLE) AS cumsum
        |FROM events ORDER BY event_id""".stripMargin)),

    Q("cum_sum_poison",
      (s, dir) => evOut(new RollingOps(evGb(s, dir))
        .cumsum(nullableValue, col("ts"), skipNa = false, exact = true), "cumsum"),
      Some(s"""SELECT event_id, user_id,
        | CASE WHEN COUNT(CASE WHEN $nullableValueSql IS NULL THEN 1 END)
        |        OVER ($cumFrameSql) = 0
        |   THEN CAST(SUM(CAST($nullableValueSql AS DECIMAL(28,6)))
        |        OVER ($cumFrameSql) AS DOUBLE) END AS cumsum
        |FROM events ORDER BY event_id""".stripMargin)),

    Q("cum_minmax",
      (s, dir) => {
        val d1 = new RollingOps(evGb(s, dir)).cummin(col("value"), col("ts"))
        val d2 = new RollingOps(new GroupBy(d1, Seq(col("user_id"))))
          .cummax(col("value"), col("ts"))
        evOut(d2, "cummin", "cummax")
      },
      Some(s"""SELECT event_id, user_id,
        | MIN(value) OVER ($cumFrameSql) AS cummin,
        | MAX(value) OVER ($cumFrameSql) AS cummax
        |FROM events ORDER BY event_id""".stripMargin)),

    Q("cum_count",
      (s, dir) => {
        val d1 = new RollingOps(evGb(s, dir)).cumcount(col("ts"))
        val d2 = new RollingOps(new GroupBy(d1, Seq(col("user_id"))))
          .cumcount(col("ts"), mask = Some(col("event_type") =!= "click"),
            name = "cumcount_m")
        evOut(d2, "cumcount", "cumcount_m")
      },
      Some(s"""SELECT event_id, user_id,
        | COUNT(*) OVER ($cumFrameSql) - 1 AS cumcount,
        | COUNT(CASE WHEN event_type <> 'click' THEN 1 END)
        |   OVER ($cumFrameSql) - 1 AS cumcount_m
        |FROM events ORDER BY event_id""".stripMargin)),

    Q("shift_lead_lag",
      (s, dir) => {
        val d1 = new RollingOps(evGb(s, dir))
          .shift(col("value"), col("ts"), 1, name = "lag1")
        val d2 = new RollingOps(new GroupBy(d1, Seq(col("user_id"))))
          .shift(col("value"), col("ts"), -2, name = "lead2")
        evOut(d2, "lag1", "lead2")
      },
      Some("""SELECT event_id, user_id,
        | LAG(value, 1) OVER (PARTITION BY user_id ORDER BY ts) AS lag1,
        | LEAD(value, 2) OVER (PARTITION BY user_id ORDER BY ts) AS lead2
        |FROM events ORDER BY event_id""".stripMargin)),

    Q("diff_n",
      (s, dir) => evOut(new RollingOps(evGb(s, dir))
        .diff(col("value"), col("ts"), 1, name = "diff1"), "diff1"),
      Some("""SELECT event_id, user_id,
        | value - LAG(value, 1) OVER (PARTITION BY user_id ORDER BY ts) AS diff1
        |FROM events ORDER BY event_id""".stripMargin)),

    Q("roll_sum_mean",
      (s, dir) => {
        val d1 = new RollingOps(evGb(s, dir)).rollingSum(
          col("value"), col("ts"), 50, minPeriods = Some(1), exact = true)
        val d2 = new RollingOps(new GroupBy(d1, Seq(col("user_id")))).rollingMean(
          col("value"), col("ts"), 50, minPeriods = Some(1), exact = true)
        evOut(d2, "rolling_sum", "rolling_mean")
      },
      Some("""SELECT event_id, user_id,
        | CAST(SUM(CAST(value AS DECIMAL(28,6))) OVER w AS DOUBLE) AS rolling_sum,
        | CAST(SUM(CAST(value AS DECIMAL(28,6))) OVER w AS DOUBLE)
        |   / COUNT(value) OVER w AS rolling_mean
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY ts ROWS BETWEEN 49 PRECEDING AND CURRENT ROW)
        |ORDER BY event_id""".stripMargin)),

    Q("roll_sum_split",
      // sliced rolling vs the same independent ROWS-BETWEEN oracle as
      // roll_sum_mean (not the engine's own unsplit path)
      (s, dir) => evOut(new RollingOps(
          new GroupBy(eventsUs(s, dir), Seq(col("user_id"))))
        .rollingSum(col("value"), col("ts_us"), 50, minPeriods = Some(1),
          exact = true, sliceWidth = Some(21600000000L)), "rolling_sum"),
      Some("""SELECT event_id, user_id,
        | CAST(SUM(CAST(value AS DECIMAL(28,6))) OVER w AS DOUBLE) AS rolling_sum
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY ts ROWS BETWEEN 49 PRECEDING AND CURRENT ROW)
        |ORDER BY event_id""".stripMargin)),

    Q("roll_minmax",
      (s, dir) => {
        val d1 = new RollingOps(evGb(s, dir))
          .rollingMin(col("value"), col("ts"), 10)
        val d2 = new RollingOps(new GroupBy(d1, Seq(col("user_id"))))
          .rollingMax(col("value"), col("ts"), 10, minPeriods = Some(1))
        evOut(d2, "rolling_min", "rolling_max")
      },
      Some("""SELECT event_id, user_id,
        | CASE WHEN COUNT(value) OVER w >= 10 THEN MIN(value) OVER w END AS rolling_min,
        | MAX(value) OVER w AS rolling_max
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY ts ROWS BETWEEN 9 PRECEDING AND CURRENT ROW)
        |ORDER BY event_id""".stripMargin)),

    Q("roll_var_std",
      // pandas rolling var/std (ddof=1) via the Σx² identity over the
      // frame, decimal-exact sums; the oracle replays the identical
      // formula (incl. the 0-clamp), so values agree bit-for-bit —
      // UNROUNDED deliberately: the 2-decimal event values put many
      // variances exactly on .xxxx5 boundaries, where Spark's
      // HALF_UP and DuckDB's ROUND disagree; the raw doubles are the
      // same bits (decimal sums + fixed-order IEEE + correctly-
      // rounded sqrt), so rounding could only ADD divergence
      (s, dir) => {
        val d1 = new RollingOps(evGb(s, dir)).rollingVar(
          col("value"), col("ts"), 20, minPeriods = Some(2), exact = true)
        val d2 = new RollingOps(new GroupBy(d1, Seq(col("user_id")))).rollingStd(
          col("value"), col("ts"), 20, minPeriods = Some(2), exact = true)
        d2.select(col("event_id"), col("user_id"),
            col("rolling_var"), col("rolling_std"))
          .orderBy(col("event_id"))
      },
      Some("""WITH f AS (SELECT event_id, user_id,
        |  COUNT(value) OVER w AS n,
        |  CAST(SUM(CAST(value AS DECIMAL(28,6))) OVER w AS DOUBLE) AS s,
        |  CAST(SUM(CAST(CAST(value AS DOUBLE) * CAST(value AS DOUBLE) AS DECIMAL(38,6))) OVER w AS DOUBLE) AS ss
        | FROM events
        | WINDOW w AS (PARTITION BY user_id ORDER BY ts ROWS BETWEEN 19 PRECEDING AND CURRENT ROW))
        |SELECT event_id, user_id,
        | CASE WHEN n > 1 THEN GREATEST((ss - s*s/n) / (n - 1), 0.0) END AS rolling_var,
        | CASE WHEN n > 1 THEN sqrt(GREATEST((ss - s*s/n) / (n - 1), 0.0)) END AS rolling_std
        |FROM f ORDER BY event_id""".stripMargin)),

    Q("roll_cov_corr",
      // pandas rolling cov/corr for one pair (pairwise-complete frame
      // rows, decimal-exact pair moments); y is a deterministic
      // integer-valued column so every product stays exact at decimal
      // scale 6 — values replay bit-for-bit, unrounded (the
      // roll_var_std lesson: rounding row-scale exact formulas only
      // adds divergence)
      (s, dir) => {
        val y = pmod(col("event_id"), lit(89L)).cast("double")
        // exact = true: the decimal oracle path (bit equality with the
        // DuckDB decimal sums); the user default is the fast double
        // twin, spec-pinned to the exact path at 1e-12 (RollingSpec)
        val d1 = new RollingOps(evGb(s, dir)).rollingCov(
          col("value"), y, col("ts"), 15, minPeriods = Some(5), exact = true)
        val d2 = new RollingOps(new GroupBy(d1, Seq(col("user_id")))).rollingCorr(
          col("value"), y, col("ts"), 15, minPeriods = Some(5), exact = true)
        evOut(d2, "rolling_cov", "rolling_corr")
      },
      Some("""WITH f AS (SELECT event_id, user_id,
        |  COUNT(CASE WHEN value IS NOT NULL THEN 1 END) OVER w AS n,
        |  CAST(SUM(CAST(CASE WHEN value IS NOT NULL THEN CAST(value AS DOUBLE) END AS DECIMAL(28,6))) OVER w AS DOUBLE) AS sx,
        |  CAST(SUM(CAST(CASE WHEN value IS NOT NULL THEN CAST(event_id % 89 AS DOUBLE) END AS DECIMAL(28,6))) OVER w AS DOUBLE) AS sy,
        |  CAST(SUM(CAST(CASE WHEN value IS NOT NULL THEN CAST(value AS DOUBLE) * CAST(event_id % 89 AS DOUBLE) END AS DECIMAL(38,6))) OVER w AS DOUBLE) AS sxy,
        |  CAST(SUM(CAST(CASE WHEN value IS NOT NULL THEN CAST(value AS DOUBLE) * CAST(value AS DOUBLE) END AS DECIMAL(38,6))) OVER w AS DOUBLE) AS sxx,
        |  CAST(SUM(CAST(CASE WHEN value IS NOT NULL THEN CAST(event_id % 89 AS DOUBLE) * CAST(event_id % 89 AS DOUBLE) END AS DECIMAL(38,6))) OVER w AS DOUBLE) AS syy
        | FROM events
        | WINDOW w AS (PARTITION BY user_id ORDER BY ts ROWS BETWEEN 14 PRECEDING AND CURRENT ROW))
        |SELECT event_id, user_id,
        | CASE WHEN n >= 5 THEN (sxy - sx*sy/n) / (n - 1) END AS rolling_cov,
        | CASE WHEN n >= 5 AND (sxx - sx*sx/n) > 0 AND (syy - sy*sy/n) > 0
        |   THEN (sxy - sx*sy/n) / sqrt((sxx - sx*sx/n) * (syy - sy*sy/n)) END AS rolling_corr
        |FROM f ORDER BY event_id""".stripMargin)),

    Q("cum_mean_var",
      // expanding mean/variance (pandas expanding().mean()/var()):
      // the cumulative machinery with mean/var aggregates; decimal
      // running sums → unrounded bit-exact replay
      (s, dir) => {
        val d1 = new RollingOps(evGb(s, dir)).cummean(
          col("value"), col("ts"), exact = true)
        val d2 = new RollingOps(new GroupBy(d1, Seq(col("user_id")))).cumvar(
          col("value"), col("ts"), exact = true)
        evOut(d2, "cummean", "cumvar")
      },
      Some("""WITH f AS (SELECT event_id, user_id,
        |  COUNT(value) OVER w AS n,
        |  CAST(SUM(CAST(value AS DECIMAL(28,6))) OVER w AS DOUBLE) AS s,
        |  CAST(SUM(CAST(CAST(value AS DOUBLE) * CAST(value AS DOUBLE) AS DECIMAL(38,6))) OVER w AS DOUBLE) AS ss
        | FROM events
        | WINDOW w AS (PARTITION BY user_id ORDER BY ts ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
        |SELECT event_id, user_id,
        | CASE WHEN n > 0 THEN s / n END AS cummean,
        | CASE WHEN n > 1 THEN GREATEST((ss - s*s/n) / (n - 1), 0.0) END AS cumvar
        |FROM f ORDER BY event_id""".stripMargin)),

    Q("cum_prod",
      // cumulative product (exp-sum-log path): positive inputs
      // (value/100), gate emits ln(cumprod) rounded — both engines
      // run the identical exp(Σ ln)·ln round-trip; the zero-latch /
      // sign / null-carry semantics are spec-covered
      (s, dir) => evOut(new RollingOps(evGb(s, dir)).cumprod(
          col("value") / 100.0, col("ts")), "cumprod")
        .select(col("event_id"), col("user_id"),
          when(col("cumprod") > 0, round(log(col("cumprod")), 4))
            .as("ln_cumprod")),
      Some("""WITH f AS (SELECT event_id, user_id,
        |  exp(CAST(SUM(CAST(ln(abs(CAST(value AS DOUBLE) / 100.0)) AS DECIMAL(38,8))) OVER w AS DOUBLE)) AS cp
        | FROM events
        | WINDOW w AS (PARTITION BY user_id ORDER BY ts ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
        |SELECT event_id, user_id,
        | CASE WHEN cp > 0 THEN ROUND(ln(cp), 4) END AS ln_cumprod
        |FROM f ORDER BY event_id""".stripMargin)),

    Q("roll_sum_masked",
      (s, dir) => evOut(new RollingOps(evGb(s, dir)).rollingSum(
        col("value"), col("ts"), 10, minPeriods = Some(3),
        mask = Some(col("event_type") =!= "click"), exact = true), "rolling_sum"),
      Some("""SELECT e.event_id, e.user_id, s.rolling_sum
        |FROM events e LEFT JOIN (
        |  SELECT user_id, ts,
        |    CASE WHEN COUNT(value) OVER w >= 3
        |      THEN CAST(SUM(CAST(value AS DECIMAL(28,6))) OVER w AS DOUBLE) END AS rolling_sum
        |  FROM events WHERE event_type <> 'click'
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts ROWS BETWEEN 9 PRECEDING AND CURRENT ROW)
        |) s ON e.user_id = s.user_id AND e.ts = s.ts
        |ORDER BY e.event_id""".stripMargin)),

    Q("roll_sum_masked_split",
      // masked + sliceWidth: the sliced machinery applied to the
      // mask-filtered sub-stream (the round-4 gap — a skewed key stays
      // skewed after filtering), vs the same sub-stream-join oracle as
      // roll_sum_masked
      (s, dir) => evOut(new RollingOps(
          new GroupBy(eventsUs(s, dir), Seq(col("user_id"))))
        .rollingSum(col("value"), col("ts_us"), 10, minPeriods = Some(3),
          mask = Some(col("event_type") =!= "click"), exact = true,
          sliceWidth = Some(21600000000L)), "rolling_sum"),
      Some("""SELECT e.event_id, e.user_id, s.rolling_sum
        |FROM events e LEFT JOIN (
        |  SELECT user_id, ts,
        |    CASE WHEN COUNT(value) OVER w >= 3
        |      THEN CAST(SUM(CAST(value AS DECIMAL(28,6))) OVER w AS DOUBLE) END AS rolling_sum
        |  FROM events WHERE event_type <> 'click'
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts ROWS BETWEEN 9 PRECEDING AND CURRENT ROW)
        |) s ON e.user_id = s.user_id AND e.ts = s.ts
        |ORDER BY e.event_id""".stripMargin)),

    Q("sessionize",
      (s, dir) => {
        // ts arrives as long nanos (nanosAsLong) or as a timestamp,
        // depending on session config; 12h gap either way.
        val ev = T(s, dir, "events")
        val (tsVal, gap) = ev.schema("ts").dataType match {
          case org.apache.spark.sql.types.LongType => (col("ts"), 4.32e13)
          case _ => (unix_micros(col("ts")), 4.32e10)
        }
        evOut(new RollingOps(new GroupBy(ev, Seq(col("user_id"))))
          .groupNearbyMembers(tsVal, col("ts"), gap), "subgroup")
      },
      Some(s"""SELECT event_id, user_id,
        | CAST(SUM(flag) OVER ($cumFrameSql) AS BIGINT) AS subgroup
        |FROM (
        |  SELECT event_id, user_id, ts,
        |    CASE WHEN epoch_us(ts) - LAG(epoch_us(ts))
        |      OVER (PARTITION BY user_id ORDER BY ts) > 43200000000 THEN 1 ELSE 0 END AS flag
        |  FROM events)
        |ORDER BY event_id""".stripMargin)),

    Q("sessionize_split",
      // groupNearbyMembers' sliceWidth lever vs the same independent
      // oracle as sessionize; ord is the integral ts value itself
      // (same order as ts), slices are 6h in its unit
      (s, dir) => {
        val ev = T(s, dir, "events")
        val (tsVal, gap, width) = ev.schema("ts").dataType match {
          case org.apache.spark.sql.types.LongType =>
            (col("ts"), 4.32e13, 21600000000000L)
          case _ => (unix_micros(col("ts")), 4.32e10, 21600000000L)
        }
        evOut(new RollingOps(new GroupBy(ev, Seq(col("user_id"))))
          .groupNearbyMembers(tsVal, tsVal, gap,
            sliceWidth = Some(width)), "subgroup")
      },
      Some(s"""SELECT event_id, user_id,
        | CAST(SUM(flag) OVER ($cumFrameSql) AS BIGINT) AS subgroup
        |FROM (
        |  SELECT event_id, user_id, ts,
        |    CASE WHEN epoch_us(ts) - LAG(epoch_us(ts))
        |      OVER (PARTITION BY user_id ORDER BY ts) > 43200000000 THEN 1 ELSE 0 END AS flag
        |  FROM events)
        |ORDER BY event_id""".stripMargin)),

    Q("roll_range",
      // pandas offset windows (rolling("6h")): RANGE frames over the
      // micros axis — exact-decimal sum, mean, and a masked sum over
      // the filtered sub-stream, all (t−6h, t] closed='right'
      (s, dir) => {
        val span = 21600000000L
        val d1 = new RollingOps(new GroupBy(eventsUs(s, dir),
            Seq(col("user_id"))))
          .rollingSumRange(col("value"), col("ts_us"), span, exact = true)
        val d2 = new RollingOps(new GroupBy(d1, Seq(col("user_id"))))
          .rollingMeanRange(col("value"), col("ts_us"), span, exact = true)
        val d3 = new RollingOps(new GroupBy(d2, Seq(col("user_id"))))
          .rollingSumRange(col("value"), col("ts_us"), span,
            mask = Some(col("event_type") =!= "click"), exact = true,
            name = "rolling_sum_m")
        evOut(d3, "rolling_sum", "rolling_mean", "rolling_sum_m")
      },
      Some("""WITH ev AS (SELECT *, epoch_us(ts) AS ts_us FROM events)
        |SELECT event_id, user_id,
        | CAST(SUM(CAST(value AS DECIMAL(28,6))) OVER w AS DOUBLE) AS rolling_sum,
        | CAST(SUM(CAST(value AS DECIMAL(28,6))) OVER w AS DOUBLE)
        |   / COUNT(value) OVER w AS rolling_mean,
        | m.rolling_sum_m
        |FROM ev LEFT JOIN (
        |  SELECT user_id, ts_us,
        |    CAST(SUM(CAST(value AS DECIMAL(28,6))) OVER wm AS DOUBLE) AS rolling_sum_m
        |  FROM ev WHERE event_type <> 'click'
        |  WINDOW wm AS (PARTITION BY user_id ORDER BY ts_us
        |    RANGE BETWEEN 21599999999 PRECEDING AND CURRENT ROW)
        |) m USING (user_id, ts_us)
        |WINDOW w AS (PARTITION BY user_id ORDER BY ts_us
        |  RANGE BETWEEN 21599999999 PRECEDING AND CURRENT ROW)
        |ORDER BY event_id""".stripMargin)),

    Q("fill_ffill_bfill",
      // pandas GroupBy.ffill/bfill over the null-injected value:
      // plain forward fill, backward fill, and a limit=2 forward fill
      // (propagation distance bounded by row count since the last
      // valid value) — all in one window stage each, no joins
      (s, dir) => {
        val d1 = new RollingOps(evGb(s, dir)).ffill(nullableValue, col("ts"))
        val d2 = new RollingOps(new GroupBy(d1, Seq(col("user_id"))))
          .bfill(nullableValue, col("ts"))
        val d3 = new RollingOps(new GroupBy(d2, Seq(col("user_id"))))
          .ffill(nullableValue, col("ts"), limit = Some(2), name = "ffill_lim")
        evOut(d3, "ffill", "bfill", "ffill_lim")
      },
      Some(s"""WITH ev AS (
        |  SELECT event_id, user_id, ts, $nullableValueSql AS v,
        |    ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts) AS rn
        |  FROM events),
        | f AS (
        |  SELECT event_id, user_id, v, rn,
        |    LAST_VALUE(v IGNORE NULLS) OVER
        |      (PARTITION BY user_id ORDER BY ts
        |       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS ff,
        |    FIRST_VALUE(v IGNORE NULLS) OVER
        |      (PARTITION BY user_id ORDER BY ts
        |       ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS bf,
        |    MAX(CASE WHEN v IS NOT NULL THEN rn END) OVER
        |      (PARTITION BY user_id ORDER BY ts
        |       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS lastv
        |  FROM ev)
        |SELECT event_id, user_id, ff AS ffill, bf AS bfill,
        |  CASE WHEN v IS NOT NULL THEN v
        |       WHEN rn - lastv <= 2 THEN ff END AS ffill_lim
        |FROM f ORDER BY event_id""".stripMargin)),

    Q("ewm_mean_adj",
      // pandas ewm(alpha=0.25, adjust=true, ignore_na=false).mean()
      // over the null-injected value — the weighted-history form; the
      // oracle replays the identical seed / stepwise-decay / blend
      // recurrence as a linear RECURSIVE CTE (the pack_sequences
      // pattern), bit-exact (0.25 and 0.75 are dyadic)
      (s, dir) => new RollingOps(evGb(s, dir))
        .ewmMean(nullableValue, col("ts"), 0.25)
        .select(col("event_id").as("rid"), col("ewm_mean"))
        .orderBy(col("rid")),
      Some("SELECT rid, ewm_mean FROM (" +
        Ewm.meanSql(ewmSrcSql, 0.25, adjust = true, ignoreNa = false) +
        ") ORDER BY rid")),

    Q("ewm_mean_rec",
      // the recursive form with relative-position weights:
      // adjust=false, ignore_na=true (nulls neither decay nor emit)
      (s, dir) => new RollingOps(evGb(s, dir))
        .ewmMean(nullableValue, col("ts"), 0.25, adjust = false,
          ignoreNa = true)
        .select(col("event_id").as("rid"), col("ewm_mean"))
        .orderBy(col("rid")),
      Some("SELECT rid, ewm_mean FROM (" +
        Ewm.meanSql(ewmSrcSql, 0.25, adjust = false, ignoreNa = true) +
        ") ORDER BY rid")),

    Q("ewm_var",
      // pandas ewm(alpha).var(): the full six-field ewmcov state
      // machine (decayed weight sums, blended mean, biased moment,
      // final debias ratio) replayed as the same recursive CTE shape —
      // bit-exact, unrounded
      (s, dir) => new RollingOps(evGb(s, dir))
        .ewmVar(nullableValue, col("ts"), 0.25)
        .select(col("event_id").as("rid"), col("ewm_var"))
        .orderBy(col("rid")),
      Some("SELECT rid, ewm_var FROM (" +
        Ewm.varianceSql(ewmSrcSql, 0.25, adjust = true, ignoreNa = false) +
        ") ORDER BY rid")),

    Q("interp",
      // pandas interpolate(): interior straight-line fill by row
      // position AND by the micros axis, plus a limit=2 run bound —
      // pure IEEE window arithmetic, bit-exact unrounded
      (s, dir) => {
        val d1 = new RollingOps(new GroupBy(eventsUs(s, dir),
            Seq(col("user_id"))))
          .interpolate(nullableValue, col("ts_us"))
        val d2 = new RollingOps(new GroupBy(d1, Seq(col("user_id"))))
          .interpolate(nullableValue, col("ts_us"), method = "index",
            name = "interp_idx")
        val d3 = new RollingOps(new GroupBy(d2, Seq(col("user_id"))))
          .interpolate(nullableValue, col("ts_us"), limit = Some(2),
            name = "interp_lim")
        evOut(d3, "interp", "interp_idx", "interp_lim")
      },
      Some(s"""WITH e1 AS (
        |  SELECT event_id, user_id, epoch_us(ts) AS o, $nullableValueSql AS v,
        |    CAST(ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts) AS DOUBLE) AS rn
        |  FROM events),
        | e2 AS (SELECT *,
        |  LAST_VALUE(v IGNORE NULLS) OVER bk AS pv,
        |  FIRST_VALUE(v IGNORE NULLS) OVER fw AS nv,
        |  LAST_VALUE(CASE WHEN v IS NOT NULL THEN rn END IGNORE NULLS) OVER bk AS pa,
        |  FIRST_VALUE(CASE WHEN v IS NOT NULL THEN rn END IGNORE NULLS) OVER fw AS na,
        |  LAST_VALUE(CASE WHEN v IS NOT NULL THEN CAST(o AS DOUBLE) END IGNORE NULLS) OVER bk AS po,
        |  FIRST_VALUE(CASE WHEN v IS NOT NULL THEN CAST(o AS DOUBLE) END IGNORE NULLS) OVER fw AS nq
        |  FROM e1
        |  WINDOW bk AS (PARTITION BY user_id ORDER BY o
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
        |  fw AS (PARTITION BY user_id ORDER BY o
        |    ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING))
        |SELECT event_id, user_id,
        |  CASE WHEN v IS NOT NULL THEN v
        |       WHEN pv IS NULL THEN NULL
        |       WHEN nv IS NULL THEN pv
        |       ELSE pv + (nv - pv) * (rn - pa) / (na - pa) END AS interp,
        |  CASE WHEN v IS NOT NULL THEN v
        |       WHEN pv IS NULL THEN NULL
        |       WHEN nv IS NULL THEN pv
        |       ELSE pv + (nv - pv) * (CAST(o AS DOUBLE) - po) / (nq - po) END AS interp_idx,
        |  CASE WHEN v IS NOT NULL THEN v
        |       WHEN pv IS NULL THEN NULL
        |       WHEN rn - pa > 2 THEN NULL
        |       WHEN nv IS NULL THEN pv
        |       ELSE pv + (nv - pv) * (rn - pa) / (na - pa) END AS interp_lim
        |FROM e2 ORDER BY event_id""".stripMargin)),

    Q("resample_daily",
      // pandas resample('1D').agg(...): daily buckets over the micros
      // axis with EMPTY BINS EMITTED — count 0 / sum 0.0 / mean null
      // (the pandas min_count=0 identities); the bin domain spans each
      // user's first..last bucket
      (s, dir) => Resample.resample(
        new GroupBy(eventsUs(s, dir), Seq(col("user_id"))),
        col("ts_us"), 86400000000L,
        Seq(AggSpec("count", col("value"), "n"),
          AggSpec("sum", col("value"), "sum_v", exact = true),
          AggSpec("mean", col("value"), "mean_v", exact = true))),
      Some(s"""WITH b AS (SELECT user_id,
        |  CAST((epoch_us(ts) - ((epoch_us(ts) % 86400000000 + 86400000000)
        |    % 86400000000)) / 86400000000 AS BIGINT) AS bucket, value
        |  FROM events),
        | a AS (SELECT user_id, bucket, COUNT(value) AS n,
        |   ${dsum("value")} AS sum_v, ${dmean("value")} AS mean_v
        |   FROM b GROUP BY 1, 2),
        | d AS (SELECT user_id, unnest(generate_series(MIN(bucket), MAX(bucket))) AS bucket
        |   FROM b GROUP BY user_id)
        |SELECT d.user_id, d.bucket, COALESCE(a.n, 0) AS n,
        |  COALESCE(a.sum_v, 0.0) AS sum_v, a.mean_v
        |FROM d LEFT JOIN a USING (user_id, bucket)
        |ORDER BY 1, 2""".stripMargin))
  )

  /** (k, rid, o, v) source for the ewm oracle: events keyed by user,
    * ordered by ts ((user_id, ts) unique), null-injected value.
    */
  private val ewmSrcSql =
    s"SELECT user_id AS k, event_id AS rid, ts AS o, $nullableValueSql AS v FROM events"

  private def ordersOrd = Seq(col("o_orderdate"), col("o_orderkey"))
  private val ordersOrdSql = "o_orderdate, o_orderkey"

  private def reshapeOps: Seq[Q] = Seq(
    Q("sel_head",
      (s, dir) => new SelectionOps(new GroupBy(T(s, dir, "orders"), Seq(col("o_custkey"))))
        .head(2, ordersOrd)
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
        .orderBy(col("o_orderkey")),
      Some(s"""SELECT o_orderkey, o_custkey, o_totalprice FROM (
        |  SELECT *, ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY $ordersOrdSql) AS rn
        |  FROM orders) WHERE rn <= 2 ORDER BY o_orderkey""".stripMargin)),

    Q("sel_tail",
      (s, dir) => new SelectionOps(new GroupBy(T(s, dir, "orders"), Seq(col("o_custkey"))))
        .tail(2, ordersOrd)
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
        .orderBy(col("o_orderkey")),
      Some(s"""SELECT o_orderkey, o_custkey, o_totalprice FROM (
        |  SELECT *, ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
        |  FROM orders) WHERE rn <= 2 ORDER BY o_orderkey""".stripMargin)),

    Q("sel_nlargest",
      // pandas per-group nlargest (keep='first': value DESC, id ASC),
      // null values dropped; nsmallest is the mirrored gate
      (s, dir) => new SelectionOps(new GroupBy(T(s, dir, "orders"),
          Seq(col("o_custkey"))))
        .nlargest(2, col("o_totalprice"), col("o_orderkey"))
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
        .orderBy(col("o_orderkey")),
      Some("""SELECT o_orderkey, o_custkey, o_totalprice FROM (
        |  SELECT *, ROW_NUMBER() OVER (PARTITION BY o_custkey
        |    ORDER BY o_totalprice DESC, o_orderkey) AS rn
        |  FROM orders WHERE o_totalprice IS NOT NULL)
        |WHERE rn <= 2 ORDER BY o_orderkey""".stripMargin)),

    Q("sel_nsmallest",
      (s, dir) => new SelectionOps(new GroupBy(T(s, dir, "orders"),
          Seq(col("o_custkey"))))
        .nsmallest(2, col("o_totalprice"), col("o_orderkey"))
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
        .orderBy(col("o_orderkey")),
      Some("""SELECT o_orderkey, o_custkey, o_totalprice FROM (
        |  SELECT *, ROW_NUMBER() OVER (PARTITION BY o_custkey
        |    ORDER BY o_totalprice ASC, o_orderkey) AS rn
        |  FROM orders WHERE o_totalprice IS NOT NULL)
        |WHERE rn <= 2 ORDER BY o_orderkey""".stripMargin)),

    Q("reshape_melt",
      // pandas melt: wide → long, a row-local stack projection (zero
      // shuffle); null values kept; replayed by a plain UNION ALL
      (s, dir) => Reshape.melt(T(s, dir, "lineitem"),
          Seq("l_orderkey", "l_linenumber"),
          Seq("l_quantity", "l_extendedprice", "l_discount"))
        .orderBy(col("l_orderkey"), col("l_linenumber"), col("variable")),
      Some("""SELECT l_orderkey, l_linenumber, variable, value FROM (
        |  SELECT l_orderkey, l_linenumber, 'l_quantity' AS variable, l_quantity AS value FROM lineitem
        |  UNION ALL
        |  SELECT l_orderkey, l_linenumber, 'l_extendedprice', l_extendedprice FROM lineitem
        |  UNION ALL
        |  SELECT l_orderkey, l_linenumber, 'l_discount', l_discount FROM lineitem)
        |ORDER BY l_orderkey, l_linenumber, variable""".stripMargin)),

    Q("sel_nth",
      (s, dir) => new SelectionOps(new GroupBy(T(s, dir, "orders"), Seq(col("o_custkey"))))
        .nth(-2, ordersOrd)
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
        .orderBy(col("o_orderkey")),
      Some(s"""SELECT o_orderkey, o_custkey, o_totalprice FROM (
        |  SELECT *, ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
        |  FROM orders) WHERE rn = 2 ORDER BY o_orderkey""".stripMargin)),

    Q("sel_find_first_n",
      // index-returning selection: (key, row id, within-group position)
      (s, dir) => new SelectionOps(new GroupBy(T(s, dir, "orders"), Seq(col("o_custkey"))))
        .findFirstN(3, col("o_orderkey"), ordersOrd)
        .orderBy(col("o_custkey"), col("pos")),
      Some(s"""SELECT o_custkey, o_orderkey, rn AS pos FROM (
        |  SELECT o_custkey, o_orderkey,
        |    ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY $ordersOrdSql) AS rn
        |  FROM orders) WHERE rn <= 3 ORDER BY o_custkey, pos""".stripMargin)),

    Q("sel_find_last_n",
      (s, dir) => new SelectionOps(new GroupBy(T(s, dir, "orders"), Seq(col("o_custkey"))))
        .findLastN(3, col("o_orderkey"), ordersOrd)
        .orderBy(col("o_custkey"), col("pos")),
      Some("""SELECT o_custkey, o_orderkey, rn AS pos FROM (
        |  SELECT o_custkey, o_orderkey,
        |    ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
        |  FROM orders) WHERE rn <= 3 ORDER BY o_custkey, pos""".stripMargin)),

    Q("sel_head_split",
      // the §2.2 arm of the hot-key sliceWidth lever (VERDICT r6 #2):
      // same head(2) semantics, computed via per-slice counts + prefix
      // offsets + pruned within-slice row_number instead of one
      // whole-key sort. Single-ord contract (o_orderkey is unique), so
      // the oracle orders by o_orderkey alone; width 50k gives ~12
      // occupied slices per key at sf0.01
      (s, dir) => new SelectionOps(new GroupBy(T(s, dir, "orders"), Seq(col("o_custkey"))))
        .head(2, Seq(col("o_orderkey")), sliceWidth = Some(50000L))
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
        .orderBy(col("o_orderkey")),
      Some("""SELECT o_orderkey, o_custkey, o_totalprice FROM (
        |  SELECT *, ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY o_orderkey) AS rn
        |  FROM orders) WHERE rn <= 2 ORDER BY o_orderkey""".stripMargin)),

    Q("sel_find_last_n_split",
      // descending arm of the sliced selection (offsets accumulate
      // from the LAST slice backwards) on the index-returning variant
      (s, dir) => new SelectionOps(new GroupBy(T(s, dir, "orders"), Seq(col("o_custkey"))))
        .findLastN(3, col("o_orderkey"), Seq(col("o_orderkey")),
          sliceWidth = Some(50000L))
        .orderBy(col("o_custkey"), col("pos")),
      Some("""SELECT o_custkey, o_orderkey, rn AS pos FROM (
        |  SELECT o_custkey, o_orderkey,
        |    ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY o_orderkey DESC) AS rn
        |  FROM orders) WHERE rn <= 3 ORDER BY o_custkey, pos""".stripMargin)),

    Q("ct_crosstab",
      (s, dir) => Reshape.crosstab(T(s, dir, "orders"),
        Seq(col("o_orderstatus")), col("o_orderpriority"),
        margins = Margins.All, fillZero = true),
      Some("""SELECT
        | CASE WHEN GROUPING(o_orderstatus) = 1 THEN 'All' ELSE o_orderstatus END AS o_orderstatus,
        | COUNT(CASE WHEN o_orderpriority = '1-URGENT' THEN 1 END) AS "1-URGENT",
        | COUNT(CASE WHEN o_orderpriority = '2-HIGH' THEN 1 END) AS "2-HIGH",
        | COUNT(CASE WHEN o_orderpriority = '3-MEDIUM' THEN 1 END) AS "3-MEDIUM",
        | COUNT(CASE WHEN o_orderpriority = '4-NOT SPECIFIED' THEN 1 END) AS "4-NOT SPECIFIED",
        | COUNT(CASE WHEN o_orderpriority = '5-LOW' THEN 1 END) AS "5-LOW",
        | COUNT(*) AS "All"
        |FROM orders GROUP BY GROUPING SETS ((o_orderstatus), ()) ORDER BY 1""".stripMargin)),

    Q("ct_crosstab_sum",
      (s, dir) => Reshape.crosstab(T(s, dir, "orders"),
        Seq(col("o_orderstatus")), col("o_orderpriority"),
        value = Some(("sum", col("o_totalprice"))), exact = true),
      Some(s"""SELECT o_orderstatus,
        | ${dsum("CASE WHEN o_orderpriority = '1-URGENT' THEN o_totalprice END")} AS "1-URGENT",
        | ${dsum("CASE WHEN o_orderpriority = '2-HIGH' THEN o_totalprice END")} AS "2-HIGH",
        | ${dsum("CASE WHEN o_orderpriority = '3-MEDIUM' THEN o_totalprice END")} AS "3-MEDIUM",
        | ${dsum("CASE WHEN o_orderpriority = '4-NOT SPECIFIED' THEN o_totalprice END")} AS "4-NOT SPECIFIED",
        | ${dsum("CASE WHEN o_orderpriority = '5-LOW' THEN o_totalprice END")} AS "5-LOW"
        |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin)),

    Q("ct_crosstab_multi",
      (s, dir) => {
        val bin = Reshape.prettyCut(col("l_quantity"), Seq(10d, 25d, 40d))
        Reshape.crosstabMulti(
          T(s, dir, "lineitem").withColumn("qty_bin", bin),
          Seq(col("qty_bin")), Seq(col("l_returnflag"), col("l_linestatus")),
          value = Some(("sum", col("l_extendedprice"))), exact = true)
      },
      Some(s"""SELECT CASE
        |   WHEN l_quantity <= 10 THEN ' <= 10.0'
        |   WHEN l_quantity <= 25 THEN '10.0 - 25.0'
        |   WHEN l_quantity <= 40 THEN '25.0 - 40.0'
        |   ELSE ' > 40.0' END AS qty_bin,
        | ${dsum("CASE WHEN l_returnflag = 'A' AND l_linestatus = 'F' THEN l_extendedprice END")} AS "A|F",
        | ${dsum("CASE WHEN l_returnflag = 'A' AND l_linestatus = 'O' THEN l_extendedprice END")} AS "A|O",
        | ${dsum("CASE WHEN l_returnflag = 'N' AND l_linestatus = 'F' THEN l_extendedprice END")} AS "N|F",
        | ${dsum("CASE WHEN l_returnflag = 'N' AND l_linestatus = 'O' THEN l_extendedprice END")} AS "N|O",
        | ${dsum("CASE WHEN l_returnflag = 'R' AND l_linestatus = 'F' THEN l_extendedprice END")} AS "R|F",
        | ${dsum("CASE WHEN l_returnflag = 'R' AND l_linestatus = 'O' THEN l_extendedprice END")} AS "R|O"
        |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin)),

    Q("pretty_cut",
      (s, dir) => {
        val bin = Reshape.prettyCut(col("o_totalprice"), Seq(50000d, 150000d, 300000d))
        GroupBy.valueCounts(T(s, dir, "orders"), bin.as("price_bin"))
      },
      Some("""SELECT CASE
        |   WHEN o_totalprice <= 50000 THEN ' <= 50000.0'
        |   WHEN o_totalprice <= 150000 THEN '50000.0 - 150000.0'
        |   WHEN o_totalprice <= 300000 THEN '150000.0 - 300000.0'
        |   ELSE ' > 300000.0' END AS price_bin,
        | COUNT(*) AS count
        |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin)),

    Q("bools_cat",
      (s, dir) => {
        val label = Reshape.boolsToCategorical(Seq(
          "disc" -> (col("l_discount") > 0.05),
          "bulk" -> (col("l_quantity") > 25),
          "taxed" -> (col("l_tax") > 0.04)))
        GroupBy.valueCounts(T(s, dir, "lineitem"), label.as("flags"))
      },
      Some("""SELECT COALESCE(NULLIF(concat_ws(' & ',
        |   CASE WHEN l_discount > 0.05 THEN 'disc' END,
        |   CASE WHEN l_quantity > 25 THEN 'bulk' END,
        |   CASE WHEN l_tax > 0.04 THEN 'taxed' END), ''), 'None') AS flags,
        | COUNT(*) AS count
        |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin)),

    Q("ct_normalize",
      // pandas crosstab(normalize=...): row-share cells (index mode,
      // a pure projection) plus one all-mode column (grand-total
      // share, one-row broadcast) over the status x priority counts
      (s, dir) => {
        val ct = Reshape.crosstab(T(s, dir, "orders"),
          Seq(col("o_orderstatus")), col("o_orderpriority"),
          fillZero = true)
        val byIndex = Reshape.normalizeCells(ct, Seq("o_orderstatus"), "index")
        val byAll = Reshape.normalizeCells(ct, Seq("o_orderstatus"), "all")
          .select(col("o_orderstatus"), col("1-URGENT").as("urgent_share_all"))
        byIndex.join(byAll, Seq("o_orderstatus")).orderBy(col("o_orderstatus"))
      },
      Some("""WITH c AS (SELECT o_orderstatus,
        |  CAST(COUNT(CASE WHEN o_orderpriority = '1-URGENT' THEN 1 END) AS DOUBLE) AS c1,
        |  CAST(COUNT(CASE WHEN o_orderpriority = '2-HIGH' THEN 1 END) AS DOUBLE) AS c2,
        |  CAST(COUNT(CASE WHEN o_orderpriority = '3-MEDIUM' THEN 1 END) AS DOUBLE) AS c3,
        |  CAST(COUNT(CASE WHEN o_orderpriority = '4-NOT SPECIFIED' THEN 1 END) AS DOUBLE) AS c4,
        |  CAST(COUNT(CASE WHEN o_orderpriority = '5-LOW' THEN 1 END) AS DOUBLE) AS c5
        |  FROM orders GROUP BY 1),
        | t AS (SELECT SUM(c1) AS t1, SUM(c2) AS t2, SUM(c3) AS t3,
        |   SUM(c4) AS t4, SUM(c5) AS t5 FROM c)
        |SELECT o_orderstatus,
        |  c1 / (c1 + c2 + c3 + c4 + c5) AS "1-URGENT",
        |  c2 / (c1 + c2 + c3 + c4 + c5) AS "2-HIGH",
        |  c3 / (c1 + c2 + c3 + c4 + c5) AS "3-MEDIUM",
        |  c4 / (c1 + c2 + c3 + c4 + c5) AS "4-NOT SPECIFIED",
        |  c5 / (c1 + c2 + c3 + c4 + c5) AS "5-LOW",
        |  c1 / (SELECT t1 + t2 + t3 + t4 + t5 FROM t) AS urgent_share_all
        |FROM c ORDER BY o_orderstatus""".stripMargin)),

    Q("reshape_qcut",
      // pandas qcut(x, 4) bin codes: exact interpolated quartile
      // edges, right-closed intervals, ties to the lower bin
      (s, dir) => Reshape.qcut(T(s, dir, "orders"), col("o_totalprice"), 4)
        .select(col("o_orderkey"), col("qbin").cast("long").as("qbin"))
        .orderBy(col("o_orderkey")),
      Some("""WITH e AS (SELECT quantile_cont(o_totalprice, 0.25) AS e1,
        |  quantile_cont(o_totalprice, 0.5) AS e2,
        |  quantile_cont(o_totalprice, 0.75) AS e3 FROM orders)
        |SELECT o_orderkey, CAST(CASE WHEN o_totalprice IS NULL THEN NULL ELSE
        |  (CASE WHEN o_totalprice > (SELECT e1 FROM e) THEN 1 ELSE 0 END)
        |  + (CASE WHEN o_totalprice > (SELECT e2 FROM e) THEN 1 ELSE 0 END)
        |  + (CASE WHEN o_totalprice > (SELECT e3 FROM e) THEN 1 ELSE 0 END)
        |  END AS BIGINT) AS qbin
        |FROM orders ORDER BY o_orderkey""".stripMargin)),

    Q("encode_dummies",
      // pandas get_dummies over the 5-value priority domain: one 0/1
      // column per value, sorted layout, row-local projection
      (s, dir) => Reshape.getDummies(T(s, dir, "orders"),
          col("o_orderpriority"), prefix = "p")
        .select(col("o_orderkey"), col("p_1-URGENT"), col("p_2-HIGH"),
          col("p_3-MEDIUM"), col("p_4-NOT SPECIFIED"), col("p_5-LOW"))
        .orderBy(col("o_orderkey")),
      Some("""SELECT o_orderkey,
        | CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END AS "p_1-URGENT",
        | CASE WHEN o_orderpriority = '2-HIGH' THEN 1 ELSE 0 END AS "p_2-HIGH",
        | CASE WHEN o_orderpriority = '3-MEDIUM' THEN 1 ELSE 0 END AS "p_3-MEDIUM",
        | CASE WHEN o_orderpriority = '4-NOT SPECIFIED' THEN 1 ELSE 0 END AS "p_4-NOT SPECIFIED",
        | CASE WHEN o_orderpriority = '5-LOW' THEN 1 ELSE 0 END AS "p_5-LOW"
        |FROM orders ORDER BY o_orderkey""".stripMargin)),

    Q("encode_factorize",
      // pandas factorize: codes in order of first appearance (by
      // o_orderkey), value table ranked then broadcast back
      (s, dir) => Reshape.factorize(T(s, dir, "orders"),
          col("o_orderpriority"), col("o_orderkey"))
        .select(col("o_orderkey"), col("code").cast("long").as("code"))
        .orderBy(col("o_orderkey")),
      Some("""WITH t AS (SELECT o_orderpriority AS value, MIN(o_orderkey) AS fo
        |  FROM orders WHERE o_orderpriority IS NOT NULL GROUP BY 1),
        | r AS (SELECT value, ROW_NUMBER() OVER (ORDER BY fo, value) - 1 AS code
        |  FROM t)
        |SELECT o.o_orderkey, COALESCE(r.code, -1) AS code
        |FROM orders o LEFT JOIN r ON o.o_orderpriority = r.value
        |ORDER BY o.o_orderkey""".stripMargin))
  )

  private def nanAndFit: Seq[Q] = Seq(
    Q("nan_reduce",
      (s, dir) => NanOps.reduce(T(s, dir, "lineitem"), Seq(
          NanOps.Red("sum", col("l_extendedprice"), "nansum", exact = true),
          NanOps.Red("count", col("l_extendedprice"), "n"),
          NanOps.Red("mean", col("l_extendedprice"), "nanmean", exact = true),
          NanOps.Red("min", col("l_extendedprice"), "nanmin"),
          NanOps.Red("max", col("l_extendedprice"), "nanmax"),
          NanOps.Red("var", col("l_discount"), "v"),
          NanOps.Red("std", col("l_discount"), "s"),
          NanOps.Red("sum", NanOps.nbDot(
            Seq(col("l_quantity"), col("l_discount")), Seq(2.0, 100.0)),
            "dot_sum", exact = true)))
        .select(col("nansum"), col("n"), col("nanmean"), col("nanmin"),
          col("nanmax"), round(col("v"), 8).as("nanvar"),
          round(col("s"), 8).as("nanstd"), col("dot_sum")),
      Some(s"""SELECT ${dsum("l_extendedprice")} AS nansum,
        | COUNT(l_extendedprice) AS n,
        | ${dmean("l_extendedprice")} AS nanmean,
        | MIN(l_extendedprice) AS nanmin, MAX(l_extendedprice) AS nanmax,
        | ROUND(VAR_SAMP(l_discount), 8) AS nanvar,
        | ROUND(STDDEV_SAMP(l_discount), 8) AS nanstd,
        | ${dsum("l_quantity * 2.0 + l_discount * 100.0")} AS dot_sum
        |FROM lineitem""".stripMargin)),

    Q("group_scatter_bins",
      (s, dir) => GroupScatter.binnedMeans(T(s, dir, "lineitem"),
          col("l_quantity"), col("l_extendedprice"), 10,
          // (l_orderkey, l_linenumber) is NOT unique in the synthetic
          // lineitem, so liOrd alone leaves (x, tieBreak) ties whose bin
          // assignment at ntile boundaries is engine-dependent;
          // l_extendedprice differs within every such tie run, making
          // the order total on both engines.
          tieBreak = Seq(liOrd, col("l_extendedprice")), exact = true,
          // ntile opt-in: the oracle below replays the exact quantile
          // assignment; production default is the distributed path
          exactBins = true)
        .withColumn("bin", col("bin").cast("long")),
      Some(s"""SELECT bin, ${dmean("l_quantity")} AS x_mean,
        | ${dmean("l_extendedprice")} AS y_mean, COUNT(*) AS n
        |FROM (SELECT l_quantity, l_extendedprice,
        |  NTILE(10) OVER (ORDER BY l_quantity, l_orderkey*10 + l_linenumber,
        |                  l_extendedprice) AS bin
        |  FROM lineitem)
        |GROUP BY bin ORDER BY bin""".stripMargin)),

    Q("linreg",
      (s, dir) => {
        val (coefs, r2) = GroupScatter.fit(T(s, dir, "lineitem"),
          col("l_quantity"), col("l_extendedprice"), exact = true)
        import s.implicits._
        Seq((coefs(0), coefs(1), r2)).toDF("slope", "intercept", "r2")
      },
      Some("""WITH mom AS (SELECT
        |  CAST(SUM(CAST(1.0 AS DECIMAL(38,6))) AS DOUBLE) AS m0,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(38,6))) AS DOUBLE) AS m1,
        |  CAST(SUM(CAST(l_quantity*l_quantity AS DECIMAL(38,6))) AS DOUBLE) AS m2,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(38,6))) AS DOUBLE) AS b0,
        |  CAST(SUM(CAST(l_quantity*l_extendedprice AS DECIMAL(38,6))) AS DOUBLE) AS b1,
        |  CAST(SUM(CAST(l_extendedprice*l_extendedprice AS DECIMAL(38,6))) AS DOUBLE) AS syy
        |  FROM lineitem),
        |c1 AS (SELECT *, (m0*b1 - m1*b0) / (m0*m2 - m1*m1) AS slope FROM mom),
        |c2 AS (SELECT *, (b0 - m1*slope) / m0 AS intercept FROM c1)
        |SELECT slope, intercept,
        | 1 - (syy - 2*(intercept*b0 + slope*b1)
        |        + (intercept*intercept*m0 + intercept*slope*m1
        |           + slope*intercept*m1 + slope*slope*m2))
        |     / (syy - b0*b0/m0) AS r2
        |FROM c2""".stripMargin))
  )

  private def pipelineOps: Seq[Q] = Seq(
    Q("dedup_exact",
      (s, dir) => Dedup.exact(T(s, dir, "documents"), col("doc_id"),
        Seq(md5(col("text")).as("h"))).orderBy(col("keep_id")),
      Some("""SELECT md5(text) AS h, MIN(doc_id) AS keep_id, COUNT(*) AS n_dups
        |FROM documents GROUP BY text ORDER BY keep_id""".stripMargin)),

    Q("dedup_exact_normalized",
      // normalization pre-pass composed with exact dedup: every 7th
      // doc is replaced by a case/punctuation variant of its
      // predecessor (lag fixture, built identically in both engines),
      // which only the normalized groupBy collapses — ~14% dup groups
      // at gate scale where raw exact dedup finds none
      (s, dir) => {
        val w = org.apache.spark.sql.expressions.Window.orderBy(col("doc_id"))
        val prev = lag(col("text"), 1).over(w)
        val messy = T(s, dir, "documents").withColumn("text",
          when(col("doc_id") % 7 === 3 && prev.isNotNull,
            concat(upper(prev), lit("!!"))).otherwise(col("text")))
        Dedup.exact(messy, col("doc_id"),
          Seq(TextFunctions.normalizeForDedup(col("text")).as("text")))
          .orderBy(col("keep_id"))
      },
      Some("""WITH messy AS (
        |  SELECT doc_id,
        |    CASE WHEN doc_id % 7 = 3 AND lag(text) OVER (ORDER BY doc_id) IS NOT NULL
        |         THEN upper(lag(text) OVER (ORDER BY doc_id)) || '!!'
        |         ELSE text END AS text
        |  FROM documents),
        | norm AS (SELECT doc_id,
        |   trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9\s]', ' ', 'g'), '\s+', ' ', 'g')) AS nt
        |   FROM messy)
        |SELECT nt AS text, MIN(doc_id) AS keep_id, COUNT(*) AS n_dups
        |FROM norm GROUP BY nt ORDER BY keep_id""".stripMargin)),

    Q("dedup_ngram",
      // maxDocFreq = None is the explicit all-pairs VERIFICATION mode
      // (gate-scale only); production default is the capped path below
      (s, dir) => Dedup.ngramJaccardPairs(T(s, dir, "documents"),
        col("doc_id"), col("text"), n = 2, threshold = 0.2,
        maxDocFreq = scala.None)
        .orderBy(col("ida"), col("idb")),
      Some(ngramOracleSql(threshold = 0.2, cap = scala.None))),

    Q("dedup_ngram_prefix",
      // the prefix-filtered exact path (AllPairs/PPJoin candidate
      // generation + exact verification) at a near-dup threshold —
      // LOSSLESS, so it is gated against the same all-pairs ground
      // truth SQL as dedup_ngram, just at its own threshold: a
      // recall-100% proof, not a spot check.
      (s, dir) => Dedup.ngramJaccardPairs(T(s, dir, "documents"),
        col("doc_id"), col("text"), n = 2, threshold = 0.5,
        maxDocFreq = scala.None, prefixFilter = true)
        .orderBy(col("ida"), col("idb")),
      Some(ngramOracleSql(threshold = 0.5, cap = scala.None))),

    Q("dedup_ngram_capped",
      // the production (default-shaped) path: shingles with doc-freq
      // above the cap are dropped BEFORE pairing, bounding every
      // posting list's join fan-out; Jaccard is over the restricted
      // universe on both sides. Cap 30 actually filters at gate scale
      // (bigram doc-freq tops out at ~46 on sf0.01 documents).
      (s, dir) => Dedup.ngramJaccardPairs(T(s, dir, "documents"),
        col("doc_id"), col("text"), n = 2, threshold = 0.2,
        maxDocFreq = scala.Some(30))
        .orderBy(col("ida"), col("idb")),
      Some(ngramOracleSql(threshold = 0.2, cap = scala.Some(30)))),

    Q("dedup_ngram_capped_prefix",
      // BOTH knobs composed: prefixes are taken over the capped
      // shingle universe (Dedup.scala's documented composition), and
      // prefix filtering stays lossless there — so the output must
      // hash-match the capped all-pairs ground truth exactly
      (s, dir) => Dedup.ngramJaccardPairs(T(s, dir, "documents"),
        col("doc_id"), col("text"), n = 2, threshold = 0.2,
        maxDocFreq = scala.Some(30), prefixFilter = true)
        .orderBy(col("ida"), col("idb")),
      Some(ngramOracleSql(threshold = 0.2, cap = scala.Some(30)))),

    Q("dedup_ngram_char",
      // character-shingle dedup for unsegmented scripts (sep = "" →
      // charNgramArray through the shared gram builder): a synthetic
      // CJK corpus built identically in both engines — every
      // doc_id%10==1 doc shares its 20-char prefix with doc_id-1 (and
      // the generator cycles with period 20, so docs 20 apart are
      // near/exact dups too); char-3-gram Jaccard at 0.5 must find
      // exactly the constructed pairs, replayed by a substr-sliding
      // oracle
      (s, dir) => {
        val A = "的一是不了人我在有他这中大来上国天要出年"
        val base = when(pmod(col("doc_id"), lit(10)) === 1, col("doc_id") - 1)
          .otherwise(col("doc_id"))
        def pick(expr0: Column): Column =
          lit(A).substr((pmod(expr0, lit(20)) + 1).cast("int"), lit(1))
        val prefix = array_join(transform(sequence(lit(0), lit(19)),
          j => pick(base * 7 + j * 3)), "")
        val tail = array_join(transform(sequence(lit(0), lit(4)),
          j => pick(col("doc_id") * 11 + j * 5)), "")
        val cjk = T(s, dir, "documents")
          .select(col("doc_id"), concat(prefix, tail).as("ctext"))
        Dedup.ngramJaccardPairs(cjk, col("doc_id"), col("ctext"), n = 3,
            threshold = 0.5, maxDocFreq = scala.None, sep = "")
          .orderBy(col("ida"), col("idb"))
      },
      Some("""WITH d AS (SELECT doc_id,
        |   doc_id - CASE WHEN doc_id % 10 = 1 THEN 1 ELSE 0 END AS base
        |   FROM documents),
        | t AS (SELECT doc_id,
        |   array_to_string(list_transform(range(0, 20),
        |     j -> substr('的一是不了人我在有他这中大来上国天要出年', CAST((base * 7 + j * 3) % 20 AS INT) + 1, 1)), '')
        |   || array_to_string(list_transform(range(0, 5),
        |     j -> substr('的一是不了人我在有他这中大来上国天要出年', CAST((doc_id * 11 + j * 5) % 20 AS INT) + 1, 1)), '')
        |   AS ctext FROM d),
        | sh AS (SELECT DISTINCT doc_id,
        |   unnest(list_transform(range(1, len(ctext) - 1), i -> substr(ctext, CAST(i AS INT), 3))) AS s
        |   FROM t),
        | cnt AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY 1),
        | inter AS (SELECT a.doc_id AS ida, b.doc_id AS idb, COUNT(*) AS i
        |   FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id GROUP BY 1, 2)
        |SELECT ida, idb, i * 1.0 / (ca.n + cb.n - i) AS jaccard
        |FROM inter JOIN cnt ca ON ida = ca.doc_id JOIN cnt cb ON idb = cb.doc_id
        |WHERE i * 1.0 / (ca.n + cb.n - i) >= 0.5
        |ORDER BY ida, idb""".stripMargin)),

    Q("dedup_clusters",
      // transitive closure of the near-dup pair graph (alternating
      // large-star/small-star rounds) + longest-document
      // representative per cluster; the oracle recomputes the closure
      // by an entirely different method (recursive reachability), so
      // agreement proves the star rounds converge to true components
      (s, dir) => {
        val docs = T(s, dir, "documents")
        val prs = Dedup.ngramJaccardPairs(docs, col("doc_id"),
          col("text"), n = 2, threshold = 0.2, maxDocFreq = scala.None)
        Dedup.dedupByClusters(docs, col("doc_id"), -length(col("text")),
          prs, col("ida"), col("idb"))
          .orderBy(col("doc_id"))
      },
      Some(ccOracleSql(threshold = 0.2))),

    Q("sample_deterministic",
      // hash-ring sampling: a row's fate is a pure function of its id,
      // so the oracle replays the kept set ROW-FOR-ROW (not just the
      // count) — the property that makes samples reproducible across
      // partitionings, retries, cluster sizes, and engines
      (s, dir) => Sampling.deterministicSample(T(s, dir, "documents"),
        col("doc_id"), fraction = 0.35, seed = 7)
        .select(col("doc_id")).orderBy(col("doc_id")),
      Some(s"""SELECT doc_id FROM documents
        |WHERE ${Sampling.ringPositionSql("doc_id", seed = 7)} < ${Sampling.threshold(0.35)}
        |ORDER BY doc_id""".stripMargin)),

    Q("sample_weighted",
      // quality-proportional sampling: per-row keep probability from a
      // DATA-DEPENDENT weight (token count / 100 here), decided on the
      // shared hash ring — the oracle replays the kept set row-for-row
      // including the in-expression floor(w·P) threshold (identical
      // IEEE double math both engines; a float→long CAST would
      // truncate in Spark but round in DuckDB)
      (s, dir) => Sampling.weightedSample(T(s, dir, "documents"),
        col("doc_id"),
        TextFunctions.tokenCountWs(col("text")).cast("double") / lit(100.0),
        seed = 11L)
        .select(col("doc_id")).orderBy(col("doc_id")),
      Some(s"""SELECT doc_id FROM documents
        |WHERE ${Sampling.weightedSampleSql("doc_id",
          "len(string_split(text, ' ')) / 100.0", seed = 11L)}
        |ORDER BY doc_id""".stripMargin)),

    Q("sample_per_stratum",
      // fixed-count per-stratum sampling: ring-position rank within
      // stratum, first 7 win — winners replay row-for-row (the ring
      // is engine-portable), and rank<=n is the WindowGroupLimit
      // pushdown shape, so a dominant stratum never sorts whole
      (s, dir) => Sampling.takePerStratum(T(s, dir, "documents"),
          col("doc_id"), col("lang"), nPer = 7, seed = 11)
        .select(col("doc_id"), col("lang")).orderBy(col("doc_id")),
      Some(s"""SELECT doc_id, lang FROM (
        |  SELECT doc_id, lang, ROW_NUMBER() OVER (PARTITION BY lang
        |    ORDER BY ${Sampling.ringPositionSql("doc_id", seed = 11)}, doc_id) AS rn
        |  FROM documents) WHERE rn <= 7 ORDER BY doc_id""".stripMargin)),

    Q("sample_mixture",
      // mixture rebalance end to end: the oracle recomputes the
      // per-stratum counts, the largest feasible total T, the
      // fractions and the floor thresholds with the same float
      // evaluation order as Sampling.mixtureFractions (c/w, MIN,
      // (w·T)/c, LEAST 1.0) — so the kept rows match exactly even
      // though the fractions are data-dependent
      (s, dir) => Sampling.rebalanceMixture(T(s, dir, "documents"),
        col("doc_id"), col("lang"),
        targets = Map("en" -> 0.5, "de" -> 0.25, "fr" -> 0.25), seed = 7)
        .select(col("doc_id"), col("lang")).orderBy(col("doc_id")),
      Some(s"""WITH cnt AS (SELECT lang, COUNT(*) AS c FROM documents GROUP BY 1),
        | w(lang, wt) AS (VALUES ('en', 0.5), ('de', 0.25), ('fr', 0.25)),
        | t AS (SELECT MIN(c / wt) AS T FROM cnt JOIN w USING (lang)),
        | thr AS (SELECT lang,
        |   CAST(FLOOR(LEAST(1.0, (wt * T) / c) * 2147483647) AS BIGINT) AS th
        |   FROM cnt JOIN w USING (lang), t)
        |SELECT d.doc_id, d.lang FROM documents d JOIN thr USING (lang)
        |WHERE ${Sampling.ringPositionSql("d.doc_id", seed = 7)} < thr.th
        |ORDER BY d.doc_id""".stripMargin)),

    Q("sample_token_budget",
      // data-dependent fraction = budget / Σ tokens: the token total
      // is an exact integer sum, so the fraction (one double
      // division, same on both engines) and its floor threshold
      // replay row-for-row
      (s, dir) => Sampling.takeTokenBudget(T(s, dir, "documents"),
        col("doc_id"),
        graft.functions.TextFunctions.tokenCountWs(col("text")),
        budget = 50000L, seed = 7)
        .select(col("doc_id")).orderBy(col("doc_id")),
      Some(s"""WITH t AS (SELECT SUM(len(string_split(text, ' '))) AS total
        |  FROM documents)
        |SELECT doc_id FROM documents, t
        |WHERE ${Sampling.ringPositionSql("doc_id", seed = 7)} <
        |  CAST(FLOOR((CAST(50000 AS DOUBLE) / total) * 2147483647) AS BIGINT)
        |ORDER BY doc_id""".stripMargin)),

    Q("sample_token_mixture",
      // "N tokens at THIS domain mixture" in one call: the oracle
      // recomputes the per-stratum TOKEN totals, the budget-capped
      // feasible total T = LEAST(MIN(c/w), budget), the per-stratum
      // fractions and floor thresholds, with the same float
      // evaluation order as Sampling.tokenMixtureFractions (c/w, MIN,
      // LEAST budget, (w·T)/c, LEAST 1.0 — weights dyadic so DECIMAL
      // → DOUBLE promotion is exact)
      (s, dir) => Sampling.takeTokenMixture(T(s, dir, "documents"),
        col("doc_id"), col("lang"),
        graft.functions.TextFunctions.tokenCountWs(col("text")),
        targets = Map("en" -> 0.5, "de" -> 0.25, "fr" -> 0.25),
        budget = 15000L, seed = 7)
        .select(col("doc_id"), col("lang")).orderBy(col("doc_id")),
      Some(s"""WITH tk AS (SELECT doc_id, lang,
        |   len(string_split(text, ' ')) AS nt FROM documents),
        | cnt AS (SELECT lang, CAST(SUM(nt) AS DOUBLE) AS c
        |   FROM tk GROUP BY 1),
        | w(lang, wt) AS (VALUES ('en', 0.5), ('de', 0.25), ('fr', 0.25)),
        | t AS (SELECT LEAST(MIN(c / wt), CAST(15000 AS DOUBLE)) AS T
        |   FROM cnt JOIN w USING (lang)),
        | thr AS (SELECT lang,
        |   CAST(FLOOR(LEAST(1.0, (wt * T) / c) * 2147483647) AS BIGINT) AS th
        |   FROM cnt JOIN w USING (lang), t)
        |SELECT d.doc_id, d.lang FROM documents d JOIN thr USING (lang)
        |WHERE ${Sampling.ringPositionSql("d.doc_id", seed = 7)} < thr.th
        |ORDER BY d.doc_id""".stripMargin)),

    Q("sample_temperature",
      // temperature-scaled source mixture (Arivazhagan 2019; the
      // mT5/XLM-R recipe): per-source target weights ∝ p^(1/tau) over
      // token totals, then the mixtureFractions keep-fraction plan.
      // tau = 2 → exponent 0.5; outputs round at 1e-10 (pow/sqrt are
      // only faithfully rounded per engine; everything else is exact)
      (s, dir) => {
        import s.implicits._
        val d = T(s, dir, "documents")
        val totals = d.groupBy(col("lang"))
          .agg(sum(TextFunctions.tokenCountWs(col("text"))).as("c"))
          .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
        val targets = Sampling.temperatureTargets(totals, tau = 2.0)
        val fracs = Sampling.mixtureFractions(totals, targets)
        targets.toSeq.sortBy(_._1)
          .map { case (k, w) => (k, w, fracs(k)) }
          .toDF("lang", "weight", "fraction")
          .select(col("lang"), round(col("weight"), 10).as("weight"),
            round(col("fraction"), 10).as("fraction"))
          .orderBy(col("lang"))
      },
      Some("""WITH tk AS (SELECT lang,
        |   len(string_split(text, ' ')) AS nt FROM documents),
        | cnt AS (SELECT lang, CAST(SUM(nt) AS DOUBLE) AS c
        |   FROM tk GROUP BY 1),
        | tot AS (SELECT SUM(c) AS tc FROM cnt),
        | q AS (SELECT lang, c,
        |   power(c / (SELECT tc FROM tot), 0.5) AS qv FROM cnt),
        | qs AS (SELECT SUM(qv) AS s FROM q),
        | w AS (SELECT lang, c, qv / (SELECT s FROM qs) AS wt FROM q),
        | t AS (SELECT MIN(c / wt) AS T FROM w)
        |SELECT lang, ROUND(wt, 10) AS weight,
        |  ROUND(LEAST(1.0, (wt * (SELECT T FROM t)) / c), 10) AS fraction
        |FROM w ORDER BY lang""".stripMargin)),

    Q("sample_splits",
      // deterministic holdout assignment: the oracle embeds the same
      // driver-computed ring cuts, so every row's split label replays
      (s, dir) => Sampling.assignSplits(T(s, dir, "documents"),
        col("doc_id"),
        splits = Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1), seed = 7)
        .select(col("doc_id"), col("split")).orderBy(col("doc_id")),
      Some {
        val cuts = Sampling.splitCuts(
          Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
        val cases = cuts.init.map { case (l, c) =>
          s"WHEN ring < $c THEN '$l'"
        }.mkString(" ")
        s"""WITH r AS (SELECT doc_id,
          |  ${Sampling.ringPositionSql("doc_id", seed = 7)} AS ring
          |  FROM documents)
          |SELECT doc_id, CASE $cases ELSE '${cuts.last._1}' END AS split
          |FROM r ORDER BY doc_id""".stripMargin
      }),

    Q("sample_folds",
      // deterministic k-fold CV assignment: equal-width ring cut,
      // replayed with DuckDB integer division
      (s, dir) => Sampling.assignFolds(T(s, dir, "documents"),
          col("doc_id"), k = 5, seed = 11)
        .select(col("doc_id"), col("fold")).orderBy(col("doc_id")),
      Some(s"""SELECT doc_id, ${Sampling.foldLabelSql("doc_id", 5, 11)} AS fold
        |FROM documents ORDER BY doc_id""".stripMargin)),

    Q("sample_epochs",
      // deterministic epoch-repetition realization ("2.5 epochs of
      // this source"): whole copies + a ring-decided fractional copy,
      // every (row, copy) pair replayed
      (s, dir) => Sampling.repeatByFactor(T(s, dir, "documents"),
          col("doc_id"), lit(0.5) + pmod(col("doc_id"), lit(4)), seed = 3)
        .select(col("doc_id"), col("copy"))
        .orderBy(col("doc_id"), col("copy")),
      Some(s"""WITH n AS (SELECT doc_id,
        |  ${Sampling.repeatCountSql("doc_id", "0.5 + doc_id % 4", 3)} AS n
        | FROM documents)
        |SELECT doc_id, unnest(generate_series(0, n - 1)) AS copy
        |FROM n WHERE n > 0 ORDER BY doc_id, copy""".stripMargin)),

    Q("pipeline_quality_dedup",
      // composed END-TO-END pipeline gated against one DuckDB replay:
      // quality filter → prefix-filtered exact near-dup removal
      // (anti-join on later pair members) → language-ID → grouped
      // count + decimal-exact mean quality. Catches composition bugs
      // (lineage recomputation, lost aliases, filter/dedup ordering)
      // that single-op rows cannot.
      (s, dir) => {
        val docs = T(s, dir, "documents")
        val good = docs.select(col("doc_id"), col("text"),
            TextFunctions.qualityScore(col("text"), col("n_chars")).as("q"))
          .filter(col("q") > 0.3)
        val dupIds = Dedup.ngramJaccardPairs(good, col("doc_id"), col("text"),
            n = 2, threshold = 0.5, maxDocFreq = scala.None,
            prefixFilter = true)
          .select(col("idb").as("doc_id")).distinct()
        val kept = good.join(dupIds, Seq("doc_id"), "left_anti")
        new GroupBy(kept.select(
            TextFunctions.langId(col("text")).as("lang"), col("q")),
          Seq(col("lang"))).aggregate(Seq(
            AggSpec("size", lit(1), "n_docs"),
            AggSpec("mean", col("q"), "mean_q", exact = true)))
      },
      Some(s"""WITH qd AS (SELECT doc_id, text,
        |  least(1.0, n_chars / 400.0) * 0.5 +
        |    least(1.0, (len(list_filter(string_split(text, ' '),
        |      w -> w IN ('the','a','of','and','to','in','is')))::DOUBLE
        |      / len(string_split(text, ' '))::DOUBLE) * 5.0) * 0.5 AS q
        |  FROM documents),
        | good AS (SELECT * FROM qd WHERE q > 0.3),
        | w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM good),
        | sh AS (SELECT DISTINCT doc_id,
        |   unnest(list_transform(range(1, len(ws)), i -> ws[i] || ' ' || ws[i+1])) AS s
        |   FROM w),
        | cnt AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY 1),
        | inter AS (SELECT a.doc_id AS ida, b.doc_id AS idb, COUNT(*) AS i
        |   FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id GROUP BY 1, 2),
        | dup AS (SELECT DISTINCT idb AS doc_id
        |   FROM inter JOIN cnt ca ON ida = ca.doc_id JOIN cnt cb ON idb = cb.doc_id
        |   WHERE i * 1.0 / (ca.n + cb.n - i) >= 0.5),
        | kept AS (SELECT * FROM good
        |   WHERE doc_id NOT IN (SELECT doc_id FROM dup)),
        | c AS (SELECT q,
        |  len(list_filter(string_split(text,' '), w -> w IN ('the','of','and','is','to'))) AS c_en,
        |  len(list_filter(string_split(text,' '), w -> w IN ('der','die','das','und','ist'))) AS c_de,
        |  len(list_filter(string_split(text,' '), w -> w IN ('le','la','et','est','les'))) AS c_fr,
        |  len(list_filter(string_split(text,' '), w -> w IN ('el','los','es','y','las'))) AS c_es
        |  FROM kept),
        | lng AS (SELECT q, CASE
        |   WHEN c_en = GREATEST(c_en, c_de, c_fr, c_es) AND c_en > 0 THEN 'en'
        |   WHEN c_de = GREATEST(c_en, c_de, c_fr, c_es) AND c_de > 0 THEN 'de'
        |   WHEN c_fr = GREATEST(c_en, c_de, c_fr, c_es) AND c_fr > 0 THEN 'fr'
        |   WHEN c_es = GREATEST(c_en, c_de, c_fr, c_es) AND c_es > 0 THEN 'es'
        |   ELSE 'und' END AS lang FROM c)
        |SELECT lang, COUNT(*) AS n_docs, ${dmean("q")} AS mean_q
        |FROM lng GROUP BY 1 ORDER BY 1""".stripMargin)),

    // MinHash+LSH and SimHash are hash-seeded, so they are oracle-
    // checkable only if the oracle can compute the SAME hashes: the
    // gate variants run on PortableHash (polynomial char hash mod
    // 2^31−1, expressible in DuckDB list lambdas) with the permutation
    // coefficients shared between the operator and the generated SQL.
    // Production default stays xxhash64; the pipeline shape is
    // identical either way.
    Q("dedup_minhash",
      (s, dir) => Dedup.minHashPairs(T(s, dir, "documents"),
        col("doc_id"), col("text"), threshold = 0.5,
        baseHash = graft.functions.PortableHash.polyHash(_))
        .orderBy(col("ida"), col("idb")),
      Some(minHashOracleSql(k = 64, bands = 16, threshold = 0.5, seed = 42L))),

    Q("dedup_minhash_keep",
      // the suppression verdict form (first-claimant-by-ord bucket
      // semantics, no pair materialization) on the portable hash so
      // the whole greedy claim chain replays in DuckDB
      (s, dir) => Dedup.minHashKeep(T(s, dir, "documents"),
        col("doc_id"), col("text"), ord = col("doc_id"),
        baseHash = graft.functions.PortableHash.polyHash(_))
        .orderBy(col("doc_id")),
      Some(minHashKeepOracleSql(k = 64, bands = 16, seed = 42L))),

    Q("dedup_simhash",
      (s, dir) => Dedup.simHashPairs(T(s, dir, "documents"),
        col("doc_id"), col("text"), maxDistance = 4,
        wordHash = graft.functions.PortableHash.hash62(_))
        .withColumn("hamming", col("hamming").cast("long"))
        .orderBy(col("ida"), col("idb")),
      Some(simHashOracleSql(maxDistance = 4))),

    Q("emb_cosine_topk",
      (s, dir) => {
        val emb = T(s, dir, "embeddings")
        Similarity.bruteForceTopK(emb, emb.filter(col("vec_id") < 5),
            col("vec_id"), col("embedding"), 5, exact = true)
          .withColumn("rank", col("rank").cast("long"))
          .orderBy(col("qid"), col("rank"))
      },
      Some("""WITH q AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id < 5),
        | t AS (SELECT q.vec_id AS qid, e.vec_id AS nid,
        |   unnest(q.embedding)::DOUBLE AS x, unnest(e.embedding)::DOUBLE AS y
        |   FROM q CROSS JOIN embeddings e WHERE q.vec_id <> e.vec_id),
        | d AS (SELECT qid, nid,
        |   CAST(SUM(CAST(x*y AS DECIMAL(38,8))) AS DOUBLE) AS dot,
        |   CAST(SUM(CAST(x*x AS DECIMAL(38,8))) AS DOUBLE) AS na,
        |   CAST(SUM(CAST(y*y AS DECIMAL(38,8))) AS DOUBLE) AS nb
        |   FROM t GROUP BY 1, 2)
        |SELECT qid, nid, dot / (sqrt(na) * sqrt(nb)) AS cos,
        |  ROW_NUMBER() OVER (PARTITION BY qid ORDER BY dot / (sqrt(na) * sqrt(nb)) DESC, nid) AS rank
        |FROM d QUALIFY rank <= 5 ORDER BY qid, rank""".stripMargin)),

    Q("sql_cosine_topk",
      // the SQL-callable surface end to end: GraftFunctions.register +
      // a pure spark.sql query over the native graft_cosine expression.
      // Output carries ranks but NOT raw cosines: the native expression
      // accumulates doubles left-to-right while DuckDB sums unnested
      // terms in its own order, so scores agree to ~1 ulp — ranks (with
      // the nid tie-break) are deterministic, last-ulp floats are not.
      (s, dir) => {
        org.apache.spark.sql.graft.GraftFunctions.register(s)
        T(s, dir, "embeddings").createOrReplaceTempView("graft_sql_emb")
        s.sql("""WITH q AS (SELECT vec_id, embedding FROM graft_sql_emb
          |   WHERE vec_id < 5),
          | scored AS (SELECT q.vec_id AS qid, e.vec_id AS nid,
          |   graft_cosine(q.embedding, e.embedding) AS cos
          |   FROM q JOIN graft_sql_emb e ON q.vec_id <> e.vec_id)
          |SELECT qid, nid, CAST(rank AS BIGINT) AS rank FROM (
          |  SELECT qid, nid, ROW_NUMBER() OVER (
          |    PARTITION BY qid ORDER BY cos DESC, nid) AS rank FROM scored)
          |WHERE rank <= 5 ORDER BY qid, rank""".stripMargin)
      },
      Some("""WITH q AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id < 5),
        | t AS (SELECT q.vec_id AS qid, e.vec_id AS nid,
        |   unnest(q.embedding)::DOUBLE AS x, unnest(e.embedding)::DOUBLE AS y
        |   FROM q CROSS JOIN embeddings e WHERE q.vec_id <> e.vec_id),
        | d AS (SELECT qid, nid, SUM(x*y) / (sqrt(SUM(x*x)) * sqrt(SUM(y*y))) AS cos
        |   FROM t GROUP BY 1, 2)
        |SELECT qid, nid,
        |  ROW_NUMBER() OVER (PARTITION BY qid ORDER BY cos DESC, nid) AS rank
        |FROM d QUALIFY rank <= 5 ORDER BY qid, rank""".stripMargin)),

    Q("sql_sample",
      // deterministic sampling from pure SQL: graft_sample embeds the
      // SAME driver-computed floor threshold the Column API uses
      // (literal-pinned fraction/seed), gated against
      // sample_deterministic's existing row-for-row oracle
      (s, dir) => {
        org.apache.spark.sql.graft.GraftFunctions.register(s)
        T(s, dir, "documents").createOrReplaceTempView("graft_sql_docs")
        s.sql("""SELECT doc_id FROM graft_sql_docs
          |WHERE graft_sample(doc_id, 0.35, 7) ORDER BY doc_id""".stripMargin)
      },
      Some(s"""SELECT doc_id FROM documents
        |WHERE ${Sampling.ringPositionSql("doc_id", seed = 7)} < ${Sampling.threshold(0.35)}
        |ORDER BY doc_id""".stripMargin)),

    Q("sql_split",
      // holdout assignment from pure SQL: the variadic
      // graft_split_label builder folds the literal (label, weight)
      // pairs through the same splitCuts the Column API uses, so every
      // row's label replays against sample_splits' oracle shape
      (s, dir) => {
        org.apache.spark.sql.graft.GraftFunctions.register(s)
        T(s, dir, "documents").createOrReplaceTempView("graft_sql_docs2")
        s.sql("""SELECT doc_id,
          |  graft_split_label(doc_id, 7, 'train', 0.8, 'val', 0.1, 'test', 0.1)
          |    AS split
          |FROM graft_sql_docs2 ORDER BY doc_id""".stripMargin)
      },
      Some {
        val cuts = Sampling.splitCuts(
          Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
        val cases = cuts.init.map { case (l, c) =>
          s"WHEN ring < $c THEN '$l'"
        }.mkString(" ")
        s"""WITH r AS (SELECT doc_id,
          |  ${Sampling.ringPositionSql("doc_id", seed = 7)} AS ring
          |  FROM documents)
          |SELECT doc_id, CASE $cases ELSE '${cuts.last._1}' END AS split
          |FROM r ORDER BY doc_id""".stripMargin
      }),

    Q("profile_docs",
      // one-pass column profiling (counts, null fraction, exact
      // distinct for the oracle, min/max as strings, and — round-7
      // verdict item 5 — exact quantiles per numeric column in the
      // SAME aggregation pass) melted to per-column rows; the array
      // column projects to q25/q50/q75 scalars for the harness
      // (the vocab_encode lesson) and rounds like gb_quantile
      // (interpolation is float-op-order-sensitive at the last ulp);
      // the oracle recomputes every statistic
      (s, dir) => graft.operators.Profile.profile(T(s, dir, "documents"),
          Seq("doc_id", "lang", "n_chars"), exactDistinct = true,
          exactQuantiles = true)
        .withColumn("col_id", col("col_id").cast("long"))
        .select(col("col_id"), col("col_name"), col("n_nonnull"),
          col("n_null"), col("null_frac"), col("n_distinct"),
          col("min"), col("max"),
          round(element_at(col("quantiles"), 1), 4).as("q25"),
          round(element_at(col("quantiles"), 2), 4).as("q50"),
          round(element_at(col("quantiles"), 3), 4).as("q75"))
        .orderBy(col("col_id")),
      Some("""WITH t AS (SELECT COUNT(*) AS n,
        |  COUNT(doc_id) AS nn0, COUNT(DISTINCT doc_id) AS nd0,
        |  CAST(MIN(doc_id) AS VARCHAR) AS mn0, CAST(MAX(doc_id) AS VARCHAR) AS mx0,
        |  ROUND(quantile_cont(doc_id, 0.25), 4) AS q025,
        |  ROUND(quantile_cont(doc_id, 0.5), 4) AS q050,
        |  ROUND(quantile_cont(doc_id, 0.75), 4) AS q075,
        |  COUNT(lang) AS nn1, COUNT(DISTINCT lang) AS nd1,
        |  CAST(MIN(lang) AS VARCHAR) AS mn1, CAST(MAX(lang) AS VARCHAR) AS mx1,
        |  COUNT(n_chars) AS nn2, COUNT(DISTINCT n_chars) AS nd2,
        |  CAST(MIN(n_chars) AS VARCHAR) AS mn2, CAST(MAX(n_chars) AS VARCHAR) AS mx2,
        |  ROUND(quantile_cont(n_chars, 0.25), 4) AS q225,
        |  ROUND(quantile_cont(n_chars, 0.5), 4) AS q250,
        |  ROUND(quantile_cont(n_chars, 0.75), 4) AS q275
        |  FROM documents)
        |SELECT * FROM (
        |  SELECT CAST(0 AS BIGINT) AS col_id, 'doc_id' AS col_name,
        |    nn0 AS n_nonnull, n - nn0 AS n_null,
        |    CAST(n - nn0 AS DOUBLE) / CAST(n AS DOUBLE) AS null_frac,
        |    nd0 AS n_distinct, mn0 AS min, mx0 AS max,
        |    q025 AS q25, q050 AS q50, q075 AS q75 FROM t
        |  UNION ALL SELECT 1, 'lang', nn1, n - nn1,
        |    CAST(n - nn1 AS DOUBLE) / CAST(n AS DOUBLE), nd1, mn1, mx1,
        |    NULL, NULL, NULL FROM t
        |  UNION ALL SELECT 2, 'n_chars', nn2, n - nn2,
        |    CAST(n - nn2 AS DOUBLE) / CAST(n AS DOUBLE), nd2, mn2, mx2,
        |    q225, q250, q275 FROM t)
        |ORDER BY col_id""".stripMargin)),

    Q("bm25_topk",
      // lexical retrieval: BM25 term saturation with the rational idf
      // (no transcendentals — bit-exact cross-engine), one bounded
      // stats pass + a row-local scoring projection + orderBy/limit
      // top-k. k1/b exactly representable so every literal replays.
      (s, dir) => Similarity.bm25TopK(T(s, dir, "documents"),
          col("doc_id"), col("text"), Seq("spark", "window", "merge"),
          k = 25, k1 = 1.25, b = 0.75)
        .orderBy(col("rank")),
      Some(bm25OracleSql(Seq("spark", "window", "merge"), k = 25,
        k1 = 1.25, b = 0.75))),

    Q("sql_weighted_sample",
      // quality-proportional sampling from pure SQL (VERDICT r6 #6):
      // graft_weighted_sample builds the IDENTICAL keep-verdict
      // expression tree as Sampling.weightedKeep (per-row weight
      // column, literal-pinned seed), replayed against
      // sample_weighted's existing row-for-row oracle. The weight is
      // cast to double BEFORE the division so SQL decimal promotion
      // cannot change the IEEE math
      (s, dir) => {
        org.apache.spark.sql.graft.GraftFunctions.register(s)
        T(s, dir, "documents").createOrReplaceTempView("graft_sql_docs3")
        s.sql("""SELECT doc_id FROM graft_sql_docs3
          |WHERE graft_weighted_sample(doc_id,
          |  CAST(graft_token_count(text) AS DOUBLE) / 100.0, 11)
          |ORDER BY doc_id""".stripMargin)
      },
      Some(s"""SELECT doc_id FROM documents
        |WHERE ${Sampling.weightedSampleSql("doc_id",
          "len(string_split(text, ' ')) / 100.0", seed = 11L)}
        |ORDER BY doc_id""".stripMargin)),

    Q("sql_stratified_sample",
      // per-stratum sampling from pure SQL: the variadic
      // graft_stratified_sample builder folds the literal
      // (label, fraction) pairs through the same threshold() the
      // Column API uses; unlisted strata drop (fraction 0)
      (s, dir) => {
        org.apache.spark.sql.graft.GraftFunctions.register(s)
        T(s, dir, "documents").createOrReplaceTempView("graft_sql_docs4")
        s.sql("""SELECT doc_id, lang FROM graft_sql_docs4
          |WHERE graft_stratified_sample(doc_id, lang, 7, 'en', 0.5, 'de', 0.25)
          |ORDER BY doc_id""".stripMargin)
      },
      Some(s"""SELECT doc_id, lang FROM documents
        |WHERE ${Sampling.ringPositionSql("doc_id", seed = 7)} <
        |  CASE lang WHEN 'en' THEN ${Sampling.threshold(0.5)}
        |            WHEN 'de' THEN ${Sampling.threshold(0.25)}
        |            ELSE 0 END
        |ORDER BY doc_id""".stripMargin)),

    Q("emb_lsh_topk",
      // exact=true: bucket-sign dots and cosine scores accumulate in
      // decimal, so the seeded hyperplanes (embedded as literals in the
      // SQL below) reproduce the same buckets and ranks in DuckDB
      (s, dir) => {
        val emb = T(s, dir, "embeddings")
        Similarity.lshTopK(emb, emb.filter(col("vec_id") < 5),
            col("vec_id"), col("embedding"), 5, planes = 6, exact = true)
          .withColumn("rank", col("rank").cast("long"))
          .orderBy(col("qid"), col("rank"))
      },
      Some(lshOracleSql(planes = 6, dim = 64, k = 5, seed = 42L))),

    Q("emb_lsh_multiprobe",
      // nProbe=3: each query also probes the two buckets across its
      // lowest-margin hyperplanes — recall recovered at 8 planes where
      // single-probe buckets are too fine. Same decimal-exact replay.
      (s, dir) => {
        val emb = T(s, dir, "embeddings")
        Similarity.lshTopK(emb, emb.filter(col("vec_id") < 5),
            col("vec_id"), col("embedding"), 5, planes = 8, nProbe = 3,
            exact = true)
          .withColumn("rank", col("rank").cast("long"))
          .orderBy(col("qid"), col("rank"))
      },
      Some(lshOracleSql(planes = 8, dim = 64, k = 5, seed = 42L, nProbe = 3))),

    Q("emb_ivf_topk",
      // exact=true + portable seed hash: spherical k-means (seed
      // selection, per-iteration assignment, centroid means, probe
      // ranking, final scores) is decimal-exact end to end, so the two
      // unrolled Lloyd iterations replay bit-identically in the SQL
      (s, dir) => {
        val emb = T(s, dir, "embeddings")
        Similarity.ivfTopK(emb, emb.filter(col("vec_id") < 5),
            col("vec_id"), col("embedding"), 5, nCentroids = 8, nProbe = 3,
            exact = true, seedHash = graft.functions.PortableHash.intHash(_))
          .withColumn("rank", col("rank").cast("long"))
          .orderBy(col("qid"), col("rank"))
      },
      Some(ivfOracleSql(nCentroids = 8, nProbe = 3, iters = 2, k = 5, dim = 64))),

    Q("text_stats",
      (s, dir) => T(s, dir, "documents").select(
        col("doc_id"),
        TextFunctions.tokenCountWs(col("text")).cast("long").as("n_ws"),
        TextFunctions.tokenCountRegex(col("text")).cast("long").as("n_tok"),
        TextFunctions.punctCount(col("text")).cast("long").as("n_punct"),
        TextFunctions.stopwordRatio(col("text")).as("stop_ratio"),
        TextFunctions.meanWordLength(col("text")).as("mean_wlen"),
        TextFunctions.qualityScore(col("text"), col("n_chars")).as("quality"))
        .orderBy(col("doc_id")),
      Some("""SELECT doc_id,
        | len(string_split(text, ' ')) AS n_ws,
        | len(regexp_extract_all(text, '[a-z0-9]+')) AS n_tok,
        | len(regexp_extract_all(text, '[.!?,;:]')) AS n_punct,
        | len(list_filter(string_split(text, ' '),
        |     w -> w IN ('the','a','of','and','to','in','is')))::DOUBLE
        |   / len(string_split(text, ' '))::DOUBLE AS stop_ratio,
        | len(replace(text, ' ', ''))::DOUBLE
        |   / len(string_split(text, ' '))::DOUBLE AS mean_wlen,
        | least(1.0, n_chars / 400.0) * 0.5 +
        |   least(1.0, (len(list_filter(string_split(text, ' '),
        |     w -> w IN ('the','a','of','and','to','in','is')))::DOUBLE
        |     / len(string_split(text, ' '))::DOUBLE) * 5.0) * 0.5 AS quality
        |FROM documents ORDER BY doc_id""".stripMargin)),

    Q("text_langid",
      (s, dir) => T(s, dir, "documents").select(
        col("doc_id"), col("lang"),
        TextFunctions.langId(col("text")).as("pred"))
        .orderBy(col("doc_id")),
      Some("""WITH c AS (SELECT doc_id, lang,
        |  len(list_filter(string_split(text,' '), w -> w IN ('the','of','and','is','to'))) AS c_en,
        |  len(list_filter(string_split(text,' '), w -> w IN ('der','die','das','und','ist'))) AS c_de,
        |  len(list_filter(string_split(text,' '), w -> w IN ('le','la','et','est','les'))) AS c_fr,
        |  len(list_filter(string_split(text,' '), w -> w IN ('el','los','es','y','las'))) AS c_es
        |  FROM documents),
        |b AS (SELECT *, GREATEST(c_en, c_de, c_fr, c_es) AS best FROM c)
        |SELECT doc_id, lang,
        | CASE WHEN c_en = best AND best > 0 THEN 'en'
        |      WHEN c_de = best AND best > 0 THEN 'de'
        |      WHEN c_fr = best AND best > 0 THEN 'fr'
        |      WHEN c_es = best AND best > 0 THEN 'es'
        |      ELSE 'und' END AS pred
        |FROM b ORDER BY doc_id""".stripMargin)),

    Q("text_fingerprint",
      (s, dir) => T(s, dir, "documents").select(
        col("doc_id"), TextFunctions.fingerprint(col("text")).as("fp"))
        .orderBy(col("doc_id")),
      Some("""SELECT doc_id,
        | list_reduce(
        |   list_prepend(CAST(0 AS BIGINT),
        |     list_transform(string_split(text, ' '),
        |       w -> CAST('0x' || substr(md5(w), 1, 8) AS BIGINT))),
        |   (a, b) -> (a * 31 + b) % 1000000007) AS fp
        |FROM documents ORDER BY doc_id""".stripMargin)),

    Q("text_pii",
      // the corpus text carries no PII, so each row gets a per-row
      // synthetic tail (one email, one IP, one SSN, two phone shapes —
      // doc_id-dependent so every row differs) built IDENTICALLY in
      // both engines; the patterns live in the Java-regex ∩ RE2 common
      // subset and are applied in the fixed PiiPatterns order, counts
      // taken on the progressively-redacted text exactly as the
      // operator substitutes
      (s, dir) => {
        val inj = concat(col("text"), lit(" reach user"),
          col("doc_id").cast("string"), lit("@test.org from 10.0."),
          (col("doc_id") % 256).cast("string"),
          lit(".7 id 123-45-6789 tel +4915123456789 alt 212-555-0187"))
        val stats = TextFunctions.piiStats(inj)
        T(s, dir, "documents").select(col("doc_id"),
            TextFunctions.redactPii(inj).as("clean"),
            stats.getField("n_email").as("n_email"),
            stats.getField("n_ip").as("n_ip"),
            stats.getField("n_ssn").as("n_ssn"),
            stats.getField("n_phone").as("n_phone"))
          .orderBy(col("doc_id"))
      },
      Some(piiOracleSql)),

    Q("text_urls",
      // URL extraction + domain normalization + blocklist flag on
      // per-row injected URLs (mixed case exercises the lowercasing;
      // the corpus has none). Domains output SORTED and comma-joined:
      // Spark's array_distinct preserves first-occurrence order but
      // DuckDB's list_distinct does not guarantee one, and scalar
      // output keeps the driver's value compare on safe ground. The
      // literal-array blocklist is the small-blocklist form; large
      // blocklists go through a broadcast semijoin or
      // BloomAnyContain(textDomains(text), bloom) exactly like the
      // decontamination screens.
      (s, dir) => {
        val inj = concat(col("text"), lit(" see https://Site"),
          (col("doc_id") % 50).cast("string"),
          lit(".Example.COM/p?q=1 and plain http://d"),
          (col("doc_id") % 7).cast("string"), lit(".org tail"))
        T(s, dir, "documents").select(col("doc_id"),
            size(TextFunctions.extractUrls(inj)).as("n_urls"),
            array_join(sort_array(TextFunctions.textDomains(inj)), ",")
              .as("domains"),
            arrays_overlap(TextFunctions.textDomains(inj),
              array(lit("d3.org"), lit("d5.org"))).as("blocked"))
          .orderBy(col("doc_id"))
      },
      Some(s"""WITH inj AS (
        |  SELECT doc_id, text || ' see https://Site' || CAST(doc_id % 50 AS VARCHAR)
        |    || '.Example.COM/p?q=1 and plain http://d' || CAST(doc_id % 7 AS VARCHAR)
        |    || '.org tail' AS text
        |  FROM documents),
        | ext AS (SELECT doc_id,
        |   regexp_extract_all(text, '${TextFunctions.UrlPattern}') AS urls
        |   FROM inj),
        | dom AS (SELECT doc_id, urls,
        |   list_distinct(list_transform(urls,
        |     u -> lower(regexp_extract(u, '^https?://([^/:?#\\s]+)', 1)))) AS domains
        |   FROM ext)
        |SELECT doc_id, CAST(len(urls) AS INT) AS n_urls,
        |  array_to_string(list_sort(domains), ',') AS domains,
        |  list_has_any(domains, ['d3.org', 'd5.org']) AS blocked
        |FROM dom ORDER BY doc_id""".stripMargin)),

    Q("text_domain_stats",
      // per-domain corpus report (VERDICT r6 #7) on the same injected
      // URLs as text_urls: docs/tokens per domain plus whole-corpus
      // shares (every doc has >= 1 domain here; the spec covers
      // domain-less rows). Output ordered by domain — deterministic
      // without a top-N tie concern; the topN form is spec-tested.
      (s, dir) => {
        val inj = concat(col("text"), lit(" see https://Site"),
          (col("doc_id") % 50).cast("string"),
          lit(".Example.COM/p?q=1 and plain http://d"),
          (col("doc_id") % 7).cast("string"), lit(".org tail"))
        TextFunctions.domainStats(
            T(s, dir, "documents").withColumn("__inj", inj),
            col("__inj"), TextFunctions.tokenCountWs(col("__inj")))
          .orderBy(col("domain"))
      },
      Some(s"""WITH inj AS (
        |  SELECT doc_id, text || ' see https://Site' || CAST(doc_id % 50 AS VARCHAR)
        |    || '.Example.COM/p?q=1 and plain http://d' || CAST(doc_id % 7 AS VARCHAR)
        |    || '.org tail' AS text
        |  FROM documents),
        | tok AS (SELECT doc_id, text,
        |   CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok FROM inj),
        | tot AS (SELECT COUNT(*) AS nd, SUM(n_tok) AS nt FROM tok),
        | doms AS (SELECT doc_id, n_tok, unnest(list_distinct(list_transform(
        |     regexp_extract_all(text, '${TextFunctions.UrlPattern}'),
        |     u -> lower(regexp_extract(u, '^https?://([^/:?#\\s]+)', 1))))) AS domain
        |   FROM tok),
        | agg AS (SELECT domain, COUNT(*) AS n_docs,
        |   CAST(SUM(n_tok) AS BIGINT) AS n_tokens
        |   FROM doms GROUP BY domain)
        |SELECT domain, n_docs, n_tokens,
        |  CAST(n_docs AS DOUBLE) / CAST(nd AS DOUBLE) AS doc_share,
        |  CAST(n_tokens AS DOUBLE) / CAST(nt AS DOUBLE) AS token_share
        |FROM agg, tot ORDER BY domain""".stripMargin)),

    Q("text_boilerplate",
      // frequency-based boilerplate line removal over the same derived
      // multi-line corpus as dedup_segments: every line appearing in
      // >= 3 distinct documents is dropped from ALL of them (unlike
      // segment dedup's keep-first), documents reassembled; the oracle
      // recomputes line document-frequency and the reassembly
      (s, dir) => {
        val para = T(s, dir, "documents").select(col("doc_id"),
          replace(col("text"), lit(" the "), lit("\n")).as("text"))
        Dedup.removeBoilerplate(para, col("doc_id"), col("text"),
            minDf = 3, sep = "\n")
          .orderBy(col("doc_id"))
      },
      Some("""WITH d AS (SELECT doc_id,
        |  string_split(replace(text, ' the ', chr(10)), chr(10)) AS ss
        |  FROM documents),
        |e AS (SELECT doc_id, unnest(ss) AS seg,
        |  unnest(range(1, len(ss) + 1)) AS pos FROM d),
        |f AS (SELECT seg FROM e WHERE length(seg) >= 2
        |  GROUP BY 1 HAVING COUNT(DISTINCT doc_id) >= 3),
        |m AS (SELECT e.doc_id, e.seg, e.pos, f.seg IS NOT NULL AS bp
        |  FROM e LEFT JOIN f USING (seg))
        |SELECT doc_id,
        |  COALESCE(string_agg(CASE WHEN NOT bp THEN seg END, chr(10) ORDER BY pos), '') AS text,
        |  COUNT(CASE WHEN NOT bp THEN 1 END) AS n_kept,
        |  COUNT(CASE WHEN bp THEN 1 END) AS n_removed
        |FROM m GROUP BY doc_id ORDER BY doc_id""".stripMargin)),

    Q("quality_classifier",
      // fastText-shaped linear scoring: unigram+bigram hashing-trick
      // buckets (dim 64), integer bucket weights from the deterministic
      // pseudo-weight table (intHash-derived — both engines generate
      // it), per-doc exact integer sum then ONE double division; the
      // oracle regenerates features, weights, and score
      (s, dir) => TextFunctions.scoreLinear(T(s, dir, "documents"),
          col("doc_id"), col("text"),
          TextFunctions.pseudoWeights(s, dim = 64, seed = 7), dim = 64)
        .orderBy(col("doc_id")),
      Some(s"""WITH wts AS (${TextFunctions.pseudoWeightsSql(64, 7)}),
        | f AS (SELECT doc_id,
        |   unnest(${TextFunctions.hashFeatureBucketsSql("text", 64)}) AS bucket
        |   FROM documents),
        | a AS (SELECT doc_id, COUNT(bucket) AS n_features,
        |   CAST(COALESCE(SUM(weight), 0) AS BIGINT) AS raw
        |   FROM f LEFT JOIN wts USING (bucket) GROUP BY 1)
        |SELECT doc_id, n_features, raw,
        |  (CAST(raw AS DOUBLE) / 1000.0) / CAST(n_features AS DOUBLE) AS score
        |FROM a ORDER BY doc_id""".stripMargin)),

    Q("shuffle_shards",
      // deterministic global training-order shuffle: shard + dense
      // within-shard position, both pure hash-ring functions of the id;
      // the oracle replays both rings and the per-shard rank
      (s, dir) => Sampling.shuffleShards(
          T(s, dir, "documents").select(col("doc_id")),
          col("doc_id"), numShards = 8, seed = 5)
        .select(col("doc_id"), col("shard"), col("pos"))
        .orderBy(col("doc_id")),
      Some(s"""WITH r AS (SELECT doc_id,
        |  ${Sampling.ringPositionSql("doc_id", 5)} AS r1,
        |  ${Sampling.ringPositionSql("doc_id",
              (5L + Sampling.ShuffleOrderSeedOffset) % graft.functions.PortableHash.P)} AS r2
        |  FROM documents)
        |SELECT doc_id, CAST(r1 % 8 AS INTEGER) AS shard,
        |  CAST(row_number() OVER (PARTITION BY r1 % 8 ORDER BY r2, doc_id) - 1 AS BIGINT) AS pos
        |FROM r ORDER BY doc_id""".stripMargin)),

    Q("chunk_tokens",
      // training-context chunking: sliding 40-token windows, 10-token
      // overlap (step 30); the oracle regenerates every window with
      // generate-series + list_slice — chunk ids, boundaries, the
      // truncated tail, and the per-chunk token recount all replay
      (s, dir) => TextFunctions.chunkByTokens(T(s, dir, "documents"),
          col("doc_id"), col("text"), size = 40, overlap = 10)
        .withColumn("chunk_id", col("chunk_id").cast("long"))
        .withColumn("n_chunk_tokens", col("n_chunk_tokens").cast("long"))
        .orderBy(col("id"), col("chunk_id")),
      Some("""WITH w AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
        | n AS (SELECT doc_id, toks, len(toks) AS n FROM w),
        | c AS (SELECT doc_id, toks,
        |   1 + (greatest(n - 40, 0) + 29) // 30 AS n_chunks FROM n),
        | g AS (SELECT doc_id, toks, unnest(range(0, n_chunks)) AS chunk_id FROM c),
        | s AS (SELECT doc_id, chunk_id,
        |   array_to_string(list_slice(toks, chunk_id * 30 + 1, chunk_id * 30 + 40), ' ') AS chunk_text
        |   FROM g)
        |SELECT doc_id AS id, CAST(chunk_id AS BIGINT) AS chunk_id, chunk_text,
        |  CAST(len(string_split(chunk_text, ' ')) AS BIGINT) AS n_chunk_tokens
        |FROM s ORDER BY id, chunk_id""".stripMargin)),

    Q("text_funnel",
      // one-pass filter-funnel observability: survivors of each
      // cumulative-AND stage prefix (tokens >= 50, then quality > 0.3,
      // then langId = en) counted inside ONE aggregation; the oracle
      // recomputes every predicate and the cumulative counts
      (s, dir) => TextFunctions.funnelReport(T(s, dir, "documents"), Seq(
          "min_tokens" -> (TextFunctions.tokenCountWs(col("text")) >= 50),
          "quality" -> (TextFunctions.qualityScore(col("text"), col("n_chars")) > 0.3),
          "english" -> (TextFunctions.langId(col("text")) === "en")))
        .withColumn("stage_id", col("stage_id").cast("long"))
        .orderBy(col("stage_id")),
      Some("""WITH c AS (SELECT text, n_chars,
        |  len(list_filter(string_split(text,' '), x -> x IN ('the','of','and','is','to'))) AS c_en,
        |  len(list_filter(string_split(text,' '), x -> x IN ('der','die','das','und','ist'))) AS c_de,
        |  len(list_filter(string_split(text,' '), x -> x IN ('le','la','et','est','les'))) AS c_fr,
        |  len(list_filter(string_split(text,' '), x -> x IN ('el','los','es','y','las'))) AS c_es
        |  FROM documents),
        | p AS (SELECT
        |  len(string_split(text, ' ')) >= 50 AS p0,
        |  (least(1.0, n_chars / 400.0) * 0.5 +
        |   least(1.0, (len(list_filter(string_split(text, ' '),
        |     x -> x IN ('the','a','of','and','to','in','is')))::DOUBLE
        |     / len(string_split(text, ' '))::DOUBLE) * 5.0) * 0.5) > 0.3 AS p1,
        |  (CASE WHEN c_en = GREATEST(c_en, c_de, c_fr, c_es) AND c_en > 0
        |        THEN TRUE ELSE FALSE END) AS p2
        |  FROM c),
        | a AS (SELECT COUNT(*) AS n,
        |  COUNT(CASE WHEN p0 THEN 1 END) AS s0,
        |  COUNT(CASE WHEN p0 AND p1 THEN 1 END) AS s1,
        |  COUNT(CASE WHEN p0 AND p1 AND p2 THEN 1 END) AS s2 FROM p)
        |SELECT * FROM (
        |  SELECT CAST(0 AS BIGINT) AS stage_id, 'min_tokens' AS stage,
        |    s0 AS n_pass, s0::DOUBLE / n::DOUBLE AS frac FROM a
        |  UNION ALL SELECT 1, 'quality', s1, s1::DOUBLE / n::DOUBLE FROM a
        |  UNION ALL SELECT 2, 'english', s2, s2::DOUBLE / n::DOUBLE FROM a)
        |ORDER BY stage_id""".stripMargin)),

    Q("text_scripts",
      // script-range charset signals (VERDICT r6 #5): rows doc_id%7 in
      // 1..6 REPLACE the (Latin) corpus text with a pure-script
      // snippet — Cyrillic / Arabic / Han / kana-mixed / Hangul /
      // control-char garbage — so the per-script fractions and every
      // langIdScript threshold branch are exercised; %7==0 rows keep
      // the corpus text and fall through to the Latin marker langId.
      // Character classes are explicit \x{...} code-point ranges (the
      // Java-regex ∩ RE2 escape), replayed verbatim by the oracle.
      (s, dir) => {
        val m = pmod(col("doc_id"), lit(7))
        val scripted = when(m === 1, lit("Привет это тест кириллицы в документе"))
          .when(m === 2, lit("مرحبا بالعالم هذا نص عربي للاختبار"))
          .when(m === 3, lit("你好世界这是一个中文测试文档"))
          .when(m === 4, lit("こんにちは世界これはテストです"))
          .when(m === 5, lit("안녕하세요 세계 이것은 한국어 테스트"))
          .when(m === 6, concat(lit("noisy"), expr("chr(7)"), expr("chr(7)"),
            expr("chr(7)"), lit("data")))
          .otherwise(col("text"))
        val sf = TextFunctions.scriptFractions(scripted)
        T(s, dir, "documents").select(col("doc_id"),
            sf.getField("f_latin").as("f_latin"),
            sf.getField("f_cyrillic").as("f_cyrillic"),
            sf.getField("f_arabic").as("f_arabic"),
            sf.getField("f_han").as("f_han"),
            sf.getField("f_kana").as("f_kana"),
            sf.getField("f_hangul").as("f_hangul"),
            sf.getField("f_garbage").as("f_garbage"),
            TextFunctions.langIdScript(scripted).as("lang"))
          .orderBy(col("doc_id"))
      },
      Some(scriptsOracleSql)),

    Q("pack_sequences",
      // greedy first-fit packing into <= 400-token packs over 8 hash-
      // ring shards; the oracle replays the sequential recurrence with
      // a linear RECURSIVE CTE per shard — row-for-row (doc, shard,
      // pack) agreement proves the distributed walk IS the sequential
      // greedy fill
      (s, dir) => Sampling.packSequences(T(s, dir, "documents"),
        col("doc_id"), TextFunctions.tokenCountWs(col("text")),
        maxTokens = 400L, ord = col("doc_id"), shards = 8, seed = 0L)
        .orderBy(col("doc_id")),
      Some(packOracleSql(maxTokens = 400L, shards = 8, seed = 0L))),

    Q("mm_decode",
      (s, dir) => {
        val bin = Multimodal.attachBinary(T(s, dir, "documents"),
          col("doc_id"), col("text"), mime = "text/plain")
        Multimodal.decodeBatch(bin).toDF()
          .select(col("id"), col("meta.n_bytes").as("n_bytes"),
            col("meta.width").cast("long").as("width"),
            col("meta.height").cast("long").as("height"),
            col("features")(0).cast("double").as("f0"),
            col("features")(1).cast("double").as("f1"))
          .orderBy(col("id"))
      },
      Some("""SELECT doc_id AS id, strlen(text) AS n_bytes,
        | 64 + (CAST('0x' || substr(md5(text), 1, 4) AS BIGINT) % 1024) AS width,
        | 64 + (CAST('0x' || substr(md5(text), 5, 4) AS BIGINT) % 1024) AS height,
        | (CAST(CAST('0x' || substr(md5(text), 9, 4) AS BIGINT) AS FLOAT)
        |   / CAST(65535 AS FLOAT))::DOUBLE AS f0,
        | (CAST(CAST('0x' || substr(md5(text), 13, 4) AS BIGINT) AS FLOAT)
        |   / CAST(65535 AS FLOAT))::DOUBLE AS f1
        |FROM documents ORDER BY doc_id""".stripMargin)),

    Q("mm_decode_headers",
      // REAL header parse (VERDICT r6 #3): Spark synthesizes genuine
      // PNG/JPEG/GIF binary headers (dimensions injected from doc_id),
      // HeaderCodec parses them BACK from the bytes — big-endian IHDR,
      // JPEG marker scan, little-endian GIF screen descriptor — and
      // the oracle replays the injection arithmetic. A parser bug
      // (wrong offset, wrong endianness, wrong channel mapping) breaks
      // the round-trip and the hash.
      (s, dir) => {
        val d = T(s, dir, "documents")
        val w = (lit(100) + pmod(col("doc_id"), lit(900))).cast("int")
        val h = (lit(50) + pmod(col("doc_id"), lit(500))).cast("int")
        def hx(c: Column, n: Int) = lpad(hex(c), n, "0")
        def hxLe(c: Column) = concat(hx(pmod(c, lit(256)), 2),
          hx(((c - pmod(c, lit(256))) / lit(256)).cast("int"), 2))
        val hexStr = when(pmod(col("doc_id"), lit(3)) === 0,
            // PNG: signature + IHDR length/type + w/h (32-bit BE) +
            // bit depth 8 + color type 6 (RGBA -> 4 channels)
            concat(lit("89504E470D0A1A0A0000000D49484452"),
              hx(w, 8), hx(h, 8), lit("0806")))
          .when(pmod(col("doc_id"), lit(3)) === 1,
            // JPEG: SOI + SOF0 (len 11, precision 8, h/w 16-bit BE,
            // 3 components)
            concat(lit("FFD8FFC0000B08"), hx(h, 4), hx(w, 4), lit("03")))
          // GIF89a: w/h 16-bit LITTLE-endian screen descriptor
          .otherwise(concat(lit("474946383961"), hxLe(w), hxLe(h)))
        val bin = d.select(col("doc_id"), unhex(hexStr).as("bytes"))
        Multimodal.decodeHeaders(bin, col("doc_id"), col("bytes")).toDF()
          .select(col("id"), col("format"),
            col("width").cast("long").as("width"),
            col("height").cast("long").as("height"),
            col("channels").cast("long").as("channels"), col("valid"))
          .orderBy(col("id"))
      },
      Some("""SELECT doc_id AS id,
        | CASE doc_id % 3 WHEN 0 THEN 'png' WHEN 1 THEN 'jpeg' ELSE 'gif' END AS format,
        | CAST(100 + doc_id % 900 AS BIGINT) AS width,
        | CAST(50 + doc_id % 500 AS BIGINT) AS height,
        | CAST(CASE doc_id % 3 WHEN 0 THEN 4 WHEN 1 THEN 3 ELSE 3 END AS BIGINT) AS channels,
        | TRUE AS valid
        |FROM documents ORDER BY doc_id""".stripMargin)),

    Q("emb_dup_pairs",
      // planes = None is the explicit all-pairs VERIFICATION mode
      // (quadratic; gate-scale only) — production default is the
      // LSH-bucketed path gated as emb_dup_pairs_lsh below
      (s, dir) => Dedup.embeddingPairs(T(s, dir, "embeddings"),
          col("vec_id"), col("embedding"), threshold = 0.4,
          planes = scala.None, exact = true)
        .orderBy(col("ida"), col("idb")),
      Some("""WITH t AS (SELECT a.vec_id AS ida, b.vec_id AS idb,
        |   unnest(a.embedding)::DOUBLE AS x, unnest(b.embedding)::DOUBLE AS y
        |   FROM embeddings a CROSS JOIN embeddings b WHERE a.vec_id < b.vec_id),
        | d AS (SELECT ida, idb,
        |   CAST(SUM(CAST(x*y AS DECIMAL(38,8))) AS DOUBLE) AS dot,
        |   CAST(SUM(CAST(x*x AS DECIMAL(38,8))) AS DOUBLE) AS na,
        |   CAST(SUM(CAST(y*y AS DECIMAL(38,8))) AS DOUBLE) AS nb
        |   FROM t GROUP BY 1, 2)
        |SELECT ida, idb, dot / (sqrt(na) * sqrt(nb)) AS cos
        |FROM d WHERE dot / (sqrt(na) * sqrt(nb)) >= 0.4
        |ORDER BY ida, idb""".stripMargin)),

    Q("emb_dup_pairs_lsh",
      // the production (default-shaped) LSH-bucketed path: candidates
      // share a random-hyperplane bucket (one map pass + bucket
      // equijoin, never all-pairs); 4 planes at gate scale so the
      // 0.40-0.51-cos dup population keeps bucket collisions. exact=true
      // makes bucket assignment AND scores decimal-exact for the replay.
      (s, dir) => Dedup.embeddingPairs(T(s, dir, "embeddings"),
          col("vec_id"), col("embedding"), threshold = 0.4,
          planes = scala.Some(4), exact = true)
        .orderBy(col("ida"), col("idb")),
      Some(embPairsLshOracleSql(planes = 4, dim = 64, threshold = 0.4,
        seed = 42L))),

    Q("emb_dup_pairs_lsh2",
      // multi-table LSH: finer buckets (6 planes) to bound within-
      // bucket fan-out, two independent hash tables to recover recall;
      // exercises the ids-only pair dedup + vector re-join path
      (s, dir) => Dedup.embeddingPairs(T(s, dir, "embeddings"),
          col("vec_id"), col("embedding"), threshold = 0.4,
          planes = scala.Some(6), exact = true, tables = 2)
        .orderBy(col("ida"), col("idb")),
      Some(embPairsLshOracleSql(planes = 6, dim = 64, threshold = 0.4,
        seed = 42L, tables = 2))),

    Q("win_sliding",
      (s, dir) => EventStreams.sliding(T(s, dir, "events"), "2 days", "1 day")
        .withColumn("bucket", unix_micros(col("bucket")))
        .orderBy(col("bucket"), col("event_type")),
      Some("""SELECT epoch_us(start) AS bucket, event_type, COUNT(*) AS n
        |FROM (SELECT event_type,
        |  unnest([time_bucket(INTERVAL '1 day', ts),
        |          time_bucket(INTERVAL '1 day', ts) - INTERVAL '1 day']) AS start
        |  FROM events)
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)),

    Q("win_tumbling",
      (s, dir) => EventStreams.tumbling(T(s, dir, "events"), "1 day")
        .withColumn("bucket", unix_micros(col("bucket")))
        .orderBy(col("bucket"), col("event_type")),
      Some(s"""SELECT epoch_us(time_bucket(INTERVAL '1 day', ts)) AS bucket, event_type,
        | COUNT(*) AS n, ${dsum("value")} AS sum_value
        |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)),

    Q("win_sessions",
      (s, dir) => EventStreams.sessions(T(s, dir, "events"), "12 hours")
        .withColumn("session_start", unix_micros(col("session_start")))
        .orderBy(col("user_id"), col("session_start")),
      Some("""WITH f AS (SELECT user_id, ts,
        |  CASE WHEN epoch_us(ts) - LAG(epoch_us(ts))
        |    OVER (PARTITION BY user_id ORDER BY ts) > 43200000000 THEN 1 ELSE 0 END AS flag
        |  FROM events),
        |g AS (SELECT user_id, ts, SUM(flag) OVER
        |  (PARTITION BY user_id ORDER BY ts ROWS UNBOUNDED PRECEDING) AS sess
        |  FROM f)
        |SELECT user_id, epoch_us(MIN(ts)) AS session_start, COUNT(*) AS n
        |FROM g GROUP BY user_id, sess ORDER BY user_id, session_start""".stripMargin)),

    Q("win_sessions_state",
      // flatMapGroupsWithState custom-state sessionization, batch mode
      // (same code path Structured Streaming runs incrementally)
      (s, dir) => StatefulSessions.sessionize(
          StatefulSessions.fromEvents(T(s, dir, "events")),
          43200000000L, streaming = false)
        .toDF()
        .select(col("user_id"), col("session_start_us"), col("session_end_us"),
          col("n"), round(col("sum_value"), 6).as("sum_value"))
        .orderBy(col("user_id"), col("session_start_us")),
      Some("""WITH f AS (SELECT user_id, epoch_us(ts) AS ts_us, value,
        |  CASE WHEN epoch_us(ts) - LAG(epoch_us(ts))
        |    OVER (PARTITION BY user_id ORDER BY ts) > 43200000000 THEN 1 ELSE 0 END AS flag
        |  FROM events),
        |g AS (SELECT user_id, ts_us, value, SUM(flag) OVER
        |  (PARTITION BY user_id ORDER BY ts_us ROWS UNBOUNDED PRECEDING) AS sess
        |  FROM f)
        |SELECT user_id, MIN(ts_us) AS session_start_us, MAX(ts_us) AS session_end_us,
        |  COUNT(*) AS n, ROUND(SUM(value), 6) AS sum_value
        |FROM g GROUP BY user_id, sess
        |ORDER BY user_id, session_start_us""".stripMargin)),

    Q("text_repetition",
      // Gopher-style repetition signals. The corpus is single-line, so
      // the segment metrics run over a derived multi-segment text
      // (every literal " the " becomes a segment break — both engines
      // replace all occurrences left-to-right); the top-bigram stats
      // run over the raw text. Fractions divide identical exact
      // integers on both sides, so the doubles are bit-equal.
      (s, dir) => {
        val para = replace(col("text"), lit(" the "), lit("\n"))
        T(s, dir, "documents").select(
          col("doc_id"),
          TextFunctions.duplicateSegmentFraction(para, "\n")
            .as("dup_seg_frac"),
          TextFunctions.duplicateSegmentCharFraction(para, "\n")
            .as("dup_char_frac"),
          TextFunctions.topNgramStats(col("text"), 2).getField("gram")
            .as("top_gram"),
          TextFunctions.topNgramStats(col("text"), 2).getField("cnt")
            .as("top_cnt"),
          TextFunctions.topNgramStats(col("text"), 2).getField("char_frac")
            .as("top_frac"))
          .orderBy(col("doc_id"))
      },
      Some("""WITH d AS (SELECT doc_id,
        |  string_split(replace(text, ' the ', chr(10)), chr(10)) AS ss
        |  FROM documents),
        |dup AS (SELECT doc_id,
        |  (len(ss) - len(list_distinct(ss)))::DOUBLE / len(ss)::DOUBLE
        |    AS dup_seg_frac,
        |  list_sum(list_transform(list_distinct(ss),
        |      seg -> (len(list_filter(ss, x -> x = seg)) - 1) * strlen(seg)))::DOUBLE
        |    / list_sum(list_transform(ss, seg -> strlen(seg)))::DOUBLE
        |    AS dup_char_frac
        |  FROM d),
        |w AS (SELECT doc_id, text, string_split(text, ' ') AS ws FROM documents),
        |g AS (SELECT doc_id, unnest(list_transform(range(1, len(ws)),
        |    i -> ws[i] || ' ' || ws[i+1])) AS g FROM w),
        |c AS (SELECT doc_id, g, COUNT(*) AS cnt FROM g GROUP BY 1, 2),
        |r AS (SELECT doc_id, g, cnt,
        |  row_number() OVER (PARTITION BY doc_id ORDER BY cnt DESC, g DESC) AS rn
        |  FROM c),
        |t AS (SELECT r.doc_id, g AS top_gram, cnt AS top_cnt,
        |  (cnt * strlen(g))::DOUBLE / strlen(w.text)::DOUBLE AS top_frac
        |  FROM r JOIN w ON r.doc_id = w.doc_id WHERE rn = 1)
        |SELECT doc_id, dup_seg_frac, dup_char_frac, top_gram, top_cnt, top_frac
        |FROM dup JOIN t USING (doc_id) ORDER BY doc_id""".stripMargin)),

    Q("dedup_segments",
      // segment-level exact dedup with reassembly, over the same
      // derived multi-segment corpus as text_repetition; ord = doc_id
      // makes the corpus-wide first-occurrence claim deterministic
      (s, dir) => {
        val para = T(s, dir, "documents").select(col("doc_id"),
          replace(col("text"), lit(" the "), lit("\n")).as("text"))
        Dedup.dedupSegments(para, col("doc_id"), col("text"),
            ord = col("doc_id"), sep = "\n")
          .orderBy(col("doc_id"))
      },
      Some("""WITH d AS (SELECT doc_id,
        |  string_split(replace(text, ' the ', chr(10)), chr(10)) AS ss
        |  FROM documents),
        |e AS (SELECT doc_id, unnest(ss) AS seg,
        |  unnest(range(1, len(ss) + 1)) AS pos FROM d),
        |k AS (SELECT doc_id, seg, pos,
        |  row_number() OVER (PARTITION BY seg ORDER BY doc_id, pos) AS rn
        |  FROM e)
        |SELECT doc_id, string_agg(seg, chr(10) ORDER BY pos) AS text,
        |  COUNT(*) AS n_kept
        |FROM k WHERE rn = 1 GROUP BY doc_id ORDER BY doc_id""".stripMargin)),

    Q("dedup_spans",
      // token-granular duplicate-span removal (ExactSubstr at 8-gram
      // resolution): tokens whose every covering 8-gram window is a
      // non-first duplicate vanish; the oracle replays gram claims,
      // window coverage, and token-level reassembly independently
      (s, dir) => Dedup.dedupSpans(T(s, dir, "documents"),
          col("doc_id"), col("text"), ord = col("doc_id"), k = 8)
        .orderBy(col("doc_id")),
      Some("""WITH d AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
        |g AS (SELECT doc_id, toks, len(toks) AS n FROM d),
        |gr0 AS (SELECT doc_id, toks, n, unnest(range(0, n - 8 + 1)) AS pos
        |  FROM g WHERE n >= 8),
        |gr AS (SELECT doc_id, n, pos,
        |  array_to_string(list_slice(toks, pos + 1, pos + 8), ' ') AS gram FROM gr0),
        |cl AS (SELECT gram, COUNT(*) AS cnt,
        |  MIN(struct_pack(o := doc_id, p := pos)) AS w FROM gr GROUP BY 1),
        |fl AS (SELECT gr.doc_id, gr.pos,
        |  cl.cnt > 1 AND NOT (cl.w.o = gr.doc_id AND cl.w.p = gr.pos) AS dup
        |  FROM gr JOIN cl USING (gram)),
        |tk AS (SELECT doc_id, toks, n, unnest(range(0, n)) AS i FROM g),
        |cov AS (SELECT tk.doc_id, tk.i, bool_and(fl.dup) AS alldup
        |  FROM tk JOIN fl ON fl.doc_id = tk.doc_id
        |    AND fl.pos BETWEEN greatest(0, tk.i - 8 + 1) AND least(tk.i, tk.n - 8)
        |  GROUP BY 1, 2),
        |rm AS (SELECT tk.doc_id, tk.toks, tk.i,
        |  COALESCE(cov.alldup, FALSE) AS removed
        |  FROM tk LEFT JOIN cov USING (doc_id, i))
        |SELECT doc_id,
        |  COALESCE(string_agg(CASE WHEN NOT removed THEN toks[i + 1] END, ' ' ORDER BY i), '') AS text,
        |  COUNT(CASE WHEN NOT removed THEN 1 END) AS n_kept,
        |  COUNT(CASE WHEN removed THEN 1 END) AS n_removed
        |FROM rm GROUP BY doc_id ORDER BY doc_id""".stripMargin)),

    Q("decontaminate",
      // eval side = every 20th doc; train side = the rest. 5-word
      // grams on the 31-word-vocabulary corpus give a selective but
      // non-empty overlap. The engine broadcasts the eval gram set —
      // the plan must show a map-side BroadcastHashJoin (PlanAuditSpec
      // asserts it); the oracle recomputes the overlap exactly.
      (s, dir) => {
        val docs = T(s, dir, "documents")
        Dedup.contamination(
            docs.where(col("doc_id") % 20 =!= 0), col("doc_id"), col("text"),
            docs.where(col("doc_id") % 20 === 0), col("text"), n = 5)
          .orderBy(col("doc_id"))
      },
      Some("""WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
        |sh AS (SELECT DISTINCT doc_id,
        |  unnest(list_transform(range(1, len(ws) - 3),
        |    i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] || ' ' ||
        |         ws[i+3] || ' ' || ws[i+4])) AS s
        |  FROM w),
        |ev AS (SELECT DISTINCT s FROM sh WHERE doc_id % 20 = 0)
        |SELECT doc_id, COUNT(*) AS n_shared FROM sh JOIN ev USING (s)
        |WHERE doc_id % 20 <> 0 GROUP BY doc_id ORDER BY doc_id""".stripMargin))
  )

  /** DuckDB replay of Dedup.contaminationFuzzy over
    * PortableHash.polyHash, with the corpus split into train
    * (doc_id % 10 ≠ 0) and eval (doc_id % 10 = 0): signatures exactly
    * as [[minHashOracleSql]], candidacy as band-slice equality across
    * the two sides, the agreement estimate thresholded, grouped per
    * train doc.
    */
  private def fuzzyContamOracleSql(k: Int, bands: Int, threshold: Double,
      seed: Long): String = {
    import graft.functions.PortableHash
    val p = PortableHash.P
    val minTerms = Dedup.minHashCoeffs(k, seed).zipWithIndex.map {
      case ((a, b), j) => s"MIN(($a * x + $b) % $p) AS h$j"
    }.mkString(", ")
    val sigList = (0 until k).map(j => s"h$j").mkString("[", ", ", "]")
    val rpb = k / bands
    val hi = s"CASE WHEN bb = ${bands - 1} THEN $k ELSE (bb + 1) * $rpb END"
    s"""WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
       |sh AS (SELECT DISTINCT doc_id, s FROM (
       |  SELECT doc_id, unnest(list_transform(generate_series(1, len(ws) - 1),
       |    i -> ws[i] || ' ' || ws[i + 1])) AS s FROM w)),
       |hx AS (SELECT doc_id, ${PortableHash.polyHashSql("s")} AS x FROM sh),
       |sg0 AS (SELECT doc_id, $minTerms FROM hx GROUP BY doc_id),
       |sg AS (SELECT doc_id, $sigList AS sig FROM sg0),
       |cand AS (SELECT t.doc_id, v.doc_id AS eval_id, t.sig AS ts, v.sig AS vs
       |  FROM sg t JOIN sg v ON t.doc_id % 10 <> 0 AND v.doc_id % 10 = 0
       |  WHERE list_contains(list_transform(generate_series(0, ${bands - 1}),
       |    bb -> t.sig[(bb * $rpb + 1):($hi)] = v.sig[(bb * $rpb + 1):($hi)]), true)),
       |est AS (SELECT doc_id, eval_id,
       |  list_sum(list_transform(generate_series(1, $k),
       |    j -> CASE WHEN ts[j] = vs[j] THEN 1 ELSE 0 END)) / CAST($k AS DOUBLE)
       |    AS est FROM cand)
       |SELECT doc_id, COUNT(*) AS n_eval_matches, MAX(est) AS max_est
       |FROM est WHERE est >= $threshold
       |GROUP BY doc_id ORDER BY doc_id""".stripMargin
  }

  /** Shared vocab CTEs (token counts → top-`maxSize` with the
    * (freq DESC, token ASC) total order → dense ids from 1): the
    * DuckDB replay of Vocab.buildVocab, ending in
    * `v(token, token_id, freq)`.
    */
  private def vocabCtes(maxSize: Int, minCount: Long): String =
    s"""tk AS (SELECT unnest(string_split(text, ' ')) AS token FROM documents),
       |c AS (SELECT token, COUNT(*) AS freq FROM tk WHERE token <> ''
       |  GROUP BY 1 HAVING COUNT(*) >= $minCount),
       |top AS (SELECT token, freq FROM c ORDER BY freq DESC, token LIMIT $maxSize),
       |v AS (SELECT token,
       |  ROW_NUMBER() OVER (ORDER BY freq DESC, token) AS token_id, freq
       |  FROM top)""".stripMargin

  /** Corpus-lifecycle extension gates: snapshot diff / incremental
    * dedup, fuzzy decontamination, SemDeDup, vocabulary build/encode,
    * group winsorize, pct_change, WAV header decode.
    */
  private def corpusOps: Seq[Q] = Seq(
    Q("corpus_diff",
      // two snapshots simulated from the same corpus: the old one is
      // missing multiples of 7, the new one is missing multiples of 5
      // and rewrites multiples of 11 — so all four statuses occur and
      // the md5 fingerprint drives "changed" detection in both engines
      (s, dir) => {
        val d = T(s, dir, "documents")
        val oldSnap = d.filter(col("doc_id") % 7 =!= 0)
        val newSnap = d.filter(col("doc_id") % 5 =!= 0)
          .withColumn("text", when(col("doc_id") % 11 === 0,
            upper(col("text"))).otherwise(col("text")))
        Snapshot.corpusDiff(oldSnap, newSnap, col("doc_id"), md5(col("text")))
          .orderBy(col("doc_id"))
      },
      Some("""WITH o AS (SELECT doc_id, md5(text) AS old_fp
        |   FROM documents WHERE doc_id % 7 <> 0),
        | n AS (SELECT doc_id,
        |   md5(CASE WHEN doc_id % 11 = 0 THEN upper(text) ELSE text END) AS new_fp
        |   FROM documents WHERE doc_id % 5 <> 0)
        |SELECT COALESCE(o.doc_id, n.doc_id) AS doc_id, o.old_fp, n.new_fp,
        |  CASE WHEN o.old_fp IS NULL THEN 'added'
        |       WHEN n.new_fp IS NULL THEN 'removed'
        |       WHEN o.old_fp = n.new_fp THEN 'unchanged'
        |       ELSE 'changed' END AS status
        |FROM o FULL OUTER JOIN n ON o.doc_id = n.doc_id
        |ORDER BY doc_id""".stripMargin)),

    Q("corpus_diff_summary",
      (s, dir) => {
        val d = T(s, dir, "documents")
        Snapshot.corpusDiffSummary(
          d.filter(col("doc_id") % 7 =!= 0),
          d.filter(col("doc_id") % 5 =!= 0)
            .withColumn("text", when(col("doc_id") % 11 === 0,
              upper(col("text"))).otherwise(col("text"))),
          col("doc_id"), md5(col("text")))
          .orderBy(col("status"))
      },
      Some("""WITH o AS (SELECT doc_id, md5(text) AS old_fp
        |   FROM documents WHERE doc_id % 7 <> 0),
        | n AS (SELECT doc_id,
        |   md5(CASE WHEN doc_id % 11 = 0 THEN upper(text) ELSE text END) AS new_fp
        |   FROM documents WHERE doc_id % 5 <> 0),
        | d AS (SELECT CASE WHEN o.old_fp IS NULL THEN 'added'
        |   WHEN n.new_fp IS NULL THEN 'removed'
        |   WHEN o.old_fp = n.new_fp THEN 'unchanged'
        |   ELSE 'changed' END AS status
        |   FROM o FULL OUTER JOIN n ON o.doc_id = n.doc_id)
        |SELECT status, COUNT(*) AS n_docs FROM d
        |GROUP BY status ORDER BY status""".stripMargin)),

    Q("dedup_incremental",
      // new batch (even ids) against a published prior snapshot
      // (multiples of 3), keyed on the md5 of NORMALIZED text so the
      // screen catches case/punctuation variants exactly as the
      // dedup_exact_normalized pass does
      (s, dir) => {
        val d = T(s, dir, "documents")
        val key = md5(TextFunctions.normalizeForDedup(col("text")))
        Snapshot.dedupAgainst(
            d.filter(col("doc_id") % 2 === 0), key,
            d.filter(col("doc_id") % 3 === 0), key,
            broadcastPrior = true)
          .select(col("doc_id")).orderBy(col("doc_id"))
      },
      Some("""WITH norm AS (SELECT doc_id,
        |   md5(trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9\s]', ' ', 'g'), '\s+', ' ', 'g'))) AS h
        |   FROM documents)
        |SELECT b.doc_id FROM norm b
        |WHERE b.doc_id % 2 = 0 AND NOT EXISTS (
        |  SELECT 1 FROM norm p WHERE p.doc_id % 3 = 0 AND p.h = b.h)
        |ORDER BY b.doc_id""".stripMargin)),

    Q("decontaminate_fuzzy",
      // near-dup (not just exact-gram) train×eval screen on the
      // portable hash: train = doc_id % 10 != 0, eval = the rest —
      // the corpus's near-dup pairs that straddle the split are the
      // contamination signal
      (s, dir) => {
        val d = T(s, dir, "documents")
        Dedup.contaminationFuzzy(
            d.filter(col("doc_id") % 10 =!= 0), col("doc_id"), col("text"),
            d.filter(col("doc_id") % 10 === 0), col("doc_id"), col("text"),
            threshold = 0.5,
            baseHash = graft.functions.PortableHash.polyHash(_))
          .orderBy(col("doc_id"))
      },
      Some(fuzzyContamOracleSql(k = 64, bands = 16, threshold = 0.5,
        seed = 42L))),

    Q("semdedup",
      // SemDeDup over the decimal-exact IVF index (8 clusters, 2 Lloyd
      // iterations, portable seed hash) with ord = vec_id: cluster
      // assignment, within-cluster pair cosines, and the
      // earliest-mate drop verdict all replay bit-identically
      (s, dir) => {
        val emb = T(s, dir, "embeddings")
        val cents = Similarity.ivfCentroids(emb, col("vec_id"),
          col("embedding"), nCentroids = 8, iters = 2, exact = true,
          seedHash = graft.functions.PortableHash.intHash(_))
        Dedup.semDedup(emb, col("vec_id"), col("embedding"),
            col("vec_id"), cents, threshold = 0.4, exact = true)
          .select(col("doc_id"), col("cid").cast("long").as("cid"),
            col("kept"))
          .orderBy(col("doc_id"))
      },
      Some(semDedupOracleSql(nCentroids = 8, iters = 2, dim = 64,
        threshold = 0.4))),

    Q("vocab_build",
      (s, dir) => Vocab.buildVocab(T(s, dir, "documents"), col("text"),
        maxSize = 150, minCount = 2).orderBy(col("token_id")),
      Some(s"""WITH ${vocabCtes(150, 2)}
        |SELECT token, token_id, freq FROM v ORDER BY token_id"""
        .stripMargin)),

    Q("vocab_encode",
      // The ids column is an ARRAY<BIGINT>; the driver harness's
      // pandas comparison cannot sort/hash array cells, so the gate
      // projects it through array_join to a space-joined scalar
      // string — same information, hash-comparable (round-7 verdict
      // item 1).
      (s, dir) => {
        val d = T(s, dir, "documents")
        Vocab.encodeTokens(d, col("doc_id"), col("text"),
            Vocab.buildVocab(d, col("text"), maxSize = 150, minCount = 2))
          .select(col("doc_id"),
            array_join(col("ids"), " ").as("ids_str"))
          .orderBy(col("doc_id"))
      },
      Some(s"""WITH ${vocabCtes(150, 2)},
        |toks AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok,
        |    generate_subscripts(string_split(text, ' '), 1) AS pos
        |  FROM documents),
        |enc AS (SELECT doc_id, pos, COALESCE(v.token_id, 0) AS tid
        |  FROM toks LEFT JOIN v ON toks.tok = v.token)
        |SELECT doc_id,
        |  array_to_string(list(tid ORDER BY pos), ' ') AS ids_str
        |FROM enc GROUP BY doc_id ORDER BY doc_id""".stripMargin)),

    Q("vocab_oov",
      (s, dir) => {
        val d = T(s, dir, "documents")
        Vocab.oovStats(d, col("doc_id"), col("text"),
            Vocab.buildVocab(d, col("text"), maxSize = 150, minCount = 2))
          .orderBy(col("doc_id"))
      },
      Some(s"""WITH ${vocabCtes(150, 2)},
        |toks AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok
        |  FROM documents),
        |j AS (SELECT doc_id, v.token_id
        |  FROM toks LEFT JOIN v ON toks.tok = v.token),
        |agg AS (SELECT doc_id, COUNT(*) AS n_tokens,
        |  COUNT(CASE WHEN token_id IS NULL THEN 1 END) AS n_oov
        |  FROM j GROUP BY doc_id)
        |SELECT doc_id, n_tokens, n_oov,
        |  CAST(n_oov AS DOUBLE) / CAST(n_tokens AS DOUBLE) AS oov_rate
        |FROM agg ORDER BY doc_id""".stripMargin)),

    Q("gb_winsorize",
      // group-quantile clipping; rounded on both sides like
      // gb_quantile (interpolation is float-op-order-sensitive at the
      // last ulp; l_quantity is integer-valued so 4 decimals is far
      // beyond the fence resolution)
      (s, dir) => new GroupBy(T(s, dir, "lineitem"),
          Seq(col("l_returnflag")))
        .winsorize(col("l_quantity"), 0.05, 0.95, out = "wq")
        .select(col("l_orderkey"), col("l_linenumber"),
          col("l_returnflag"), round(col("wq"), 4).as("wq"))
        .orderBy(col("l_orderkey"), col("l_linenumber")),
      Some("""WITH f AS (SELECT l_returnflag,
        |  quantile_cont(l_quantity, 0.05) AS qlo,
        |  quantile_cont(l_quantity, 0.95) AS qhi
        |  FROM lineitem GROUP BY 1)
        |SELECT l.l_orderkey, l.l_linenumber, l.l_returnflag,
        |  ROUND(CASE WHEN l.l_quantity IS NULL THEN NULL
        |    ELSE least(greatest(CAST(l.l_quantity AS DOUBLE), f.qlo), f.qhi)
        |    END, 4) AS wq
        |FROM lineitem l JOIN f USING (l_returnflag)
        |ORDER BY l_orderkey, l_linenumber""".stripMargin)),

    Q("pct_change",
      (s, dir) => evOut(new RollingOps(evGb(s, dir))
        .pctChange(col("value"), col("ts"), 1, name = "pct1"), "pct1"),
      Some("""SELECT event_id, user_id,
        | CASE WHEN LAG(value, 1) OVER w IS NULL OR LAG(value, 1) OVER w = 0
        |      THEN NULL
        |      ELSE (value - LAG(value, 1) OVER w) / LAG(value, 1) OVER w
        | END AS pct1
        |FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts)
        |ORDER BY event_id""".stripMargin)),

    Q("mm_audio_headers",
      // REAL RIFF/WAVE round-trip, the audio twin of
      // mm_decode_headers: Spark synthesizes genuine WAV headers
      // (PCM fmt + data chunk, all fields little-endian, parameters
      // injected from doc_id), AudioCodec walks the chunks BACK from
      // the bytes, and the oracle replays the injection arithmetic.
      // A parser bug (offset, endianness, block-align math) breaks
      // the round-trip and the hash.
      (s, dir) => {
        val d = T(s, dir, "documents")
        def bdiv(c: Column, q: Long): Column = floor(c / lit(q)).cast("long")
        def hx(c: Column, n: Int) = lpad(hex(c), n, "0")
        def le16(c: Column) = concat(hx(pmod(c, lit(256)), 2),
          hx(pmod(bdiv(c, 256L), lit(256)), 2))
        def le32(c: Column) = concat(hx(pmod(c, lit(256)), 2),
          hx(pmod(bdiv(c, 256L), lit(256)), 2),
          hx(pmod(bdiv(c, 65536L), lit(256)), 2),
          hx(pmod(bdiv(c, 16777216L), lit(256)), 2))
        val ch = (lit(1) + pmod(col("doc_id"), lit(2))).cast("long")
        val rate = (lit(8000) + pmod(col("doc_id"), lit(8)) * 1000).cast("long")
        val blockAlign = ch * 2 // 16-bit PCM
        val nFrames = (lit(100) + pmod(col("doc_id"), lit(400))).cast("long")
        val dataSize = nFrames * blockAlign
        val hexStr = concat(
          lit("52494646"), le32(lit(36L) + dataSize), lit("57415645"), // RIFF size WAVE
          lit("666D7420"), le32(lit(16L)),                             // "fmt " 16
          le16(lit(1L)), le16(ch), le32(rate),                        // PCM, channels, rate
          le32(rate * blockAlign), le16(blockAlign), le16(lit(16L)),  // byteRate, align, bits
          lit("64617461"), le32(dataSize))                            // "data" size
        val bin = d.select(col("doc_id"), unhex(hexStr).as("bytes"))
        Multimodal.decodeAudioHeaders(bin, col("doc_id"), col("bytes")).toDF()
          .select(col("id"), col("format"),
            col("channels").cast("long").as("channels"),
            col("sample_rate").cast("long").as("sample_rate"),
            col("bits").cast("long").as("bits"),
            col("n_frames"), col("valid"))
          .orderBy(col("id"))
      },
      Some("""SELECT doc_id AS id, 'wav' AS format,
        | CAST(1 + doc_id % 2 AS BIGINT) AS channels,
        | CAST(8000 + (doc_id % 8) * 1000 AS BIGINT) AS sample_rate,
        | CAST(16 AS BIGINT) AS bits,
        | CAST(100 + doc_id % 400 AS BIGINT) AS n_frames,
        | TRUE AS valid
        |FROM documents ORDER BY doc_id""".stripMargin)),

    Q("mm_video_headers",
      // REAL MP4/ISO-BMFF round-trip, the video sibling of the WAV
      // gate: Spark synthesizes genuine ftyp+moov(mvhd, trak/tkhd)
      // box structures (big-endian sizes, 16.16 fixed-point
      // dimensions, parameters injected from doc_id), VideoCodec
      // walks the boxes BACK from the bytes, and the oracle replays
      // the injection arithmetic — an offset/endianness/box-size bug
      // breaks the round-trip and the hash
      (s, dir) => {
        val d = T(s, dir, "documents")
        def be32(c: Column) = lpad(hex(c.cast("long")), 8, "0")
        val width = lit(160L) + pmod(col("doc_id"), lit(16)) * 16
        val height = lit(120L) + pmod(col("doc_id"), lit(9)) * 8
        val duration = lit(600L) * (lit(1L) + pmod(col("doc_id"), lit(30)))
        val matrix = lit("000100000000000000000000000000000001000000" +
          "000000000000000000000040000000")
        val hexStr = concat(
          // ftyp: size 16, major isom, minor 0
          be32(lit(16L)), lit("66747970"), lit("69736F6D"), be32(lit(0L)),
          // moov: 8 + mvhd(108) + trak(100)
          be32(lit(216L)), lit("6D6F6F76"),
          // mvhd v0: verflags, created, modified, timescale 600,
          // duration, rate 1.0, volume 1.0 + 10 reserved, matrix,
          // 24 predefined, next track id
          be32(lit(108L)), lit("6D766864"), be32(lit(0L)), be32(lit(0L)),
          be32(lit(0L)), be32(lit(600L)), be32(duration), be32(lit(65536L)),
          lit("0100"), lit("0" * 20), matrix, lit("0" * 48), be32(lit(2L)),
          // trak > tkhd v0: verflags(flags 7), created, modified,
          // track id 1, reserved, duration, 8 reserved, layer/alt/
          // volume/reserved, matrix, width<<16, height<<16
          be32(lit(100L)), lit("7472616B"),
          be32(lit(92L)), lit("746B6864"), be32(lit(7L)), be32(lit(0L)),
          be32(lit(0L)), be32(lit(1L)), be32(lit(0L)), be32(duration),
          be32(lit(0L)), be32(lit(0L)), lit("0" * 16), matrix,
          be32(width * 65536L), be32(height * 65536L))
        val bin = d.select(col("doc_id"), unhex(hexStr).as("bytes"))
        Multimodal.decodeVideoHeaders(bin, col("doc_id"), col("bytes")).toDF()
          .select(col("id"), col("format"), col("width"), col("height"),
            col("timescale"), col("duration"), col("valid"))
          .orderBy(col("id"))
      },
      Some("""SELECT doc_id AS id, 'mp4' AS format,
        | CAST(160 + (doc_id % 16) * 16 AS INT) AS width,
        | CAST(120 + (doc_id % 9) * 8 AS INT) AS height,
        | CAST(600 AS BIGINT) AS timescale,
        | CAST(600 * (1 + doc_id % 30) AS BIGINT) AS duration,
        | TRUE AS valid
        |FROM documents ORDER BY doc_id""".stripMargin)),

    Q("gb_mode",
      (s, dir) => new GroupBy(T(s, dir, "lineitem"),
          Seq(col("l_returnflag"))).mode(col("l_quantity")),
      Some("""WITH c AS (SELECT l_returnflag, l_quantity AS v, COUNT(*) AS n
        |  FROM lineitem WHERE l_quantity IS NOT NULL GROUP BY 1, 2)
        |SELECT l_returnflag,
        |  (MIN(struct_pack(nn := -n, v := v))).v AS mode,
        |  -((MIN(struct_pack(nn := -n, v := v))).nn) AS mode_count
        |FROM c GROUP BY 1 ORDER BY 1""".stripMargin)),

    Q("gb_topk_values",
      (s, dir) => new GroupBy(T(s, dir, "orders"),
          Seq(col("o_orderstatus"))).topKValues(col("o_orderpriority"), 3),
      Some("""WITH c AS (SELECT o_orderstatus, o_orderpriority AS value,
        |  COUNT(*) AS value_count FROM orders
        |  WHERE o_orderpriority IS NOT NULL GROUP BY 1, 2)
        |SELECT o_orderstatus, value, value_count, rank FROM (
        |  SELECT *, ROW_NUMBER() OVER (PARTITION BY o_orderstatus
        |    ORDER BY value_count DESC, value) AS rank FROM c)
        |WHERE rank <= 3 ORDER BY o_orderstatus, rank""".stripMargin)),

    Q("lm_score",
      // unigram-LM quality scores (CCNet-family signal) under a
      // reference half of the corpus. mean_logp rounds like var/std:
      // the per-token ln terms are decimal-SUMMED (order-exact), but
      // ln itself is only correctly-rounded-per-engine, so the last
      // ulp of a term can differ; mean_freq is the log-free twin and
      // stays unrounded/hash-exact
      (s, dir) => {
        val d = T(s, dir, "documents")
        val counts = LangModel.unigramCounts(
          d.filter(col("doc_id") % 2 === 0), col("text"))
        val total = LangModel.totalTokens(counts)
        LangModel.scoreByUnigram(d, col("doc_id"), col("text"), counts, total)
          .select(col("doc_id"), col("n_tokens"),
            round(col("mean_logp"), 4).as("mean_logp"), col("mean_freq"))
          .orderBy(col("doc_id"))
      },
      Some("""WITH tk0 AS (SELECT doc_id, unnest(string_split(text, ' ')) AS token
        |  FROM documents),
        | tk AS (SELECT doc_id, token FROM tk0 WHERE token <> ''),
        | ref AS (SELECT token, COUNT(*) AS cnt FROM tk
        |   WHERE doc_id % 2 = 0 GROUP BY 1),
        | tot AS (SELECT SUM(cnt) AS t FROM ref),
        | j AS (SELECT doc_id, CAST(COALESCE(r.cnt, 1) AS DOUBLE) AS c
        |   FROM tk LEFT JOIN ref r USING (token)),
        | agg AS (SELECT doc_id, COUNT(*) AS n_tokens,
        |   CAST(SUM(CAST(ln(c) AS DECIMAL(38,8))) AS DOUBLE) AS sumln,
        |   CAST(SUM(CAST(c / (SELECT t FROM tot) AS DECIMAL(38,8))) AS DOUBLE) AS sumfreq
        |   FROM j GROUP BY 1)
        |SELECT doc_id, n_tokens,
        |  ROUND(sumln / n_tokens - ln((SELECT t FROM tot)), 4) AS mean_logp,
        |  sumfreq / n_tokens AS mean_freq
        |FROM agg ORDER BY doc_id""".stripMargin)),

    Q("lm_kl",
      // corpus-drift probe: KL between one third of the corpus and
      // the rest; rounded like every log-derived output
      (s, dir) => {
        val d = T(s, dir, "documents")
        LangModel.unigramKl(
            d.filter(col("doc_id") % 3 === 0), col("text"),
            d.filter(col("doc_id") % 3 =!= 0), col("text"))
          .select(col("n_tokens_p"), col("n_types_p"),
            round(col("kl_nats"), 4).as("kl_nats"))
      },
      Some("""WITH tk0 AS (SELECT doc_id, unnest(string_split(text, ' ')) AS token
        |  FROM documents),
        | tk AS (SELECT doc_id, token FROM tk0 WHERE token <> ''),
        | p AS (SELECT token, COUNT(*) AS cnt FROM tk
        |   WHERE doc_id % 3 = 0 GROUP BY 1),
        | q AS (SELECT token, COUNT(*) AS qcnt FROM tk
        |   WHERE doc_id % 3 <> 0 GROUP BY 1),
        | qt AS (SELECT SUM(qcnt) AS t FROM q),
        | s AS (SELECT CAST(SUM(p.cnt) AS BIGINT) AS n_tokens_p, COUNT(*) AS n_types_p,
        |   CAST(SUM(CAST((ln(CAST(p.cnt AS DOUBLE)) -
        |     ln(CAST(COALESCE(q.qcnt, 1) AS DOUBLE))) * CAST(p.cnt AS DOUBLE)
        |     AS DECIMAL(38,8))) AS DOUBLE) AS srel
        |   FROM p LEFT JOIN q USING (token))
        |SELECT n_tokens_p, n_types_p,
        |  ROUND(srel / n_tokens_p - ln(CAST(n_tokens_p AS DOUBLE))
        |    + ln(CAST((SELECT t FROM qt) AS DOUBLE)), 4) AS kl_nats
        |FROM s""".stripMargin)),

    Q("lm_score_bigram",
      // bigram LM with stupid backoff (Brants 2007) under the even-id
      // reference half: every ln argument is an integer count, the
      // backoff constant ln(alpha) is interpolated from the SAME
      // Scala double into both engines, per-doc terms decimal-sum;
      // mean_logp rounds like every log-derived output
      (s, dir) => {
        val d = T(s, dir, "documents")
        val ref = d.filter(col("doc_id") % 2 === 0)
        val uni = LangModel.unigramCounts(ref, col("text"))
        val bi = LangModel.bigramCounts(ref, col("text"))
        val total = LangModel.totalTokens(uni)
        LangModel.scoreByBigram(d, col("doc_id"), col("text"), bi, uni,
            total, alpha = 0.4)
          .select(col("doc_id"), col("n_tokens"), col("n_backoff"),
            round(col("mean_logp"), 4).as("mean_logp"))
          .orderBy(col("doc_id"))
      },
      Some(s"""WITH rows0 AS (SELECT doc_id,
        |   list_filter(string_split(text, ' '), w -> w <> '') AS arr
        |   FROM documents),
        | r AS (SELECT doc_id, arr[i] AS token,
        |   CASE WHEN i = 1 THEN NULL ELSE arr[i-1] END AS prev
        |   FROM rows0, unnest(generate_series(1, len(arr))) t(i)),
        | uni AS (SELECT token, COUNT(*) AS cnt FROM r
        |   WHERE doc_id % 2 = 0 GROUP BY 1),
        | bi AS (SELECT prev AS w1, token AS w2, COUNT(*) AS cnt FROM r
        |   WHERE doc_id % 2 = 0 AND prev IS NOT NULL GROUP BY 1, 2),
        | tot AS (SELECT SUM(cnt) AS t FROM uni),
        | j AS (SELECT r.doc_id, r.prev, b.cnt AS bcnt, u.cnt AS ucnt,
        |     p.cnt AS pcnt
        |   FROM r LEFT JOIN bi b ON r.prev = b.w1 AND r.token = b.w2
        |   LEFT JOIN uni u ON r.token = u.token
        |   LEFT JOIN uni p ON r.prev = p.token),
        | terms AS (SELECT doc_id,
        |   CASE
        |     WHEN prev IS NULL THEN ln(CAST(COALESCE(ucnt, 1) AS DOUBLE))
        |       - ln(CAST((SELECT t FROM tot) AS DOUBLE))
        |     WHEN bcnt IS NOT NULL AND pcnt IS NOT NULL THEN
        |       ln(CAST(bcnt AS DOUBLE)) - ln(CAST(pcnt AS DOUBLE))
        |     ELSE ${math.log(0.4)} + (ln(CAST(COALESCE(ucnt, 1) AS DOUBLE))
        |       - ln(CAST((SELECT t FROM tot) AS DOUBLE)))
        |   END AS logp,
        |   CASE WHEN prev IS NOT NULL AND (bcnt IS NULL OR pcnt IS NULL)
        |     THEN 1 ELSE 0 END AS backoff
        |   FROM j)
        |SELECT doc_id, COUNT(*) AS n_tokens,
        |  CAST(SUM(backoff) AS BIGINT) AS n_backoff,
        |  ROUND(CAST(SUM(CAST(logp AS DECIMAL(38,8))) AS DOUBLE)
        |    / CAST(COUNT(*) AS DOUBLE), 4) AS mean_logp
        |FROM terms GROUP BY doc_id ORDER BY doc_id""".stripMargin)),

    Q("quality_train",
      // quality-classifier TRAINING (round-7 verdict item 3): 3
      // full-batch GD rounds of the softsign-link linear model over
      // hashed 1+2-gram term frequencies, label = (lang = 'en'). The
      // oracle replays the unrolled iterations as CTEs (the
      // pageRank/BPE pattern) with identical decimal-cast sums and
      // IEEE update arithmetic — weights compare UNROUNDED.
      (s, dir) => graft.operators.QualityModel.trainQuality(
          T(s, dir, "documents"), col("doc_id"), col("text"),
          col("lang") === "en", dim = 64, iters = 3, lr = 0.5)
        .orderBy(col("bucket")),
      Some(graft.operators.QualityModel.trainQualitySql(
        "lang = 'en'", dim = 64, iters = 3, lr = 0.5))),

    Q("mm_phash_pairs",
      // image content near-dup via the REAL pixel pipeline (round-7
      // verdict item 4): Spark synthesizes genuine binary PGM (P5)
      // rasters 18x16 with pixels p(i) = (base*7 + (base div 251)*29
      // + i*13 + base*i*i + bump) mod 256 — the quadratic base*i*i
      // term gives every base its own gradient PATTERN (a linear-only
      // formula differs between docs by a constant brightness shift,
      // which dHash is invariant to by design) and the div-251 term
      // breaks the mod-256 period in base; every 10th doc pair shares
      // `base`, differing only in a +1 bump on i % 97 = 0 pixels (a
      // near-identical image, ≤ 6 bit flips by construction).
      // GrayCodec parses the bytes BACK, box-resizes to the 9x8 dHash
      // grid, and the pigeonhole hamming join finds the pairs. The
      // oracle replays the pixel/cell/bit arithmetic (HUGEINT-packed
      // to the same signed 64-bit hash) and the pair predicate — a
      // decode bug (header offset, raster index, resize bounds, bit
      // order) breaks the round trip.
      (s, dir) => {
        val d = T(s, dir, "documents").filter(col("doc_id") < 2000)
        val base = col("doc_id") -
          when(pmod(col("doc_id"), lit(10)) === 1, 1).otherwise(0)
        val raster = array_join(transform(sequence(lit(0), lit(287)),
          i => lpad(hex(pmod(base * 7 +
            floor(base / lit(251)).cast("long") * 29 + i * 13 +
            base * i * i +
            when(pmod(col("doc_id"), lit(10)) === 1 && i % 97 === 0, 1)
              .otherwise(0), lit(256))), 2, "0")), "")
        val bin = d.select(col("doc_id"),
          concat(encode(lit("P5\n18 16\n255\n"), "US-ASCII"),
            unhex(raster)).as("bytes"))
        val hashed = Multimodal.imageDHash(bin, col("doc_id"),
          col("bytes")).toDF()
        Dedup.hammingPairs(hashed.filter(col("valid")), col("id"),
            col("dhash"), maxDistance = 6)
          .withColumn("hamming", col("hamming").cast("long"))
          .orderBy(col("ida"), col("idb"))
      },
      Some("""WITH d AS (SELECT doc_id FROM documents WHERE doc_id < 2000),
        | b AS (SELECT doc_id,
        |   doc_id - CASE WHEN doc_id % 10 = 1 THEN 1 ELSE 0 END AS base
        |   FROM d),
        | px AS (SELECT doc_id, i,
        |   (base * 7 + (base // 251) * 29 + i * 13 + base * i * i
        |     + CASE WHEN doc_id % 10 = 1 AND i % 97 = 0 THEN 1 ELSE 0 END)
        |     % 256 AS p
        |   FROM b, unnest(generate_series(0, 287)) t(i)),
        | cell AS (SELECT doc_id, (i // 18) // 2 AS r, (i % 18) // 2 AS c,
        |   SUM(p) // 4 AS v FROM px GROUP BY 1, 2, 3),
        | bits AS (SELECT a.doc_id, a.r * 8 + a.c AS b
        |   FROM cell a JOIN cell n ON a.doc_id = n.doc_id
        |     AND n.r = a.r AND n.c = a.c + 1
        |   WHERE a.c < 8 AND n.v > a.v),
        | dh AS (SELECT d.doc_id, CAST(CASE
        |     WHEN COALESCE(q.s, 0) >= 9223372036854775808
        |       THEN COALESCE(q.s, 0) - 18446744073709551616
        |     ELSE COALESCE(q.s, 0) END AS BIGINT) AS dhash
        |   FROM d LEFT JOIN (SELECT doc_id,
        |     SUM(CAST(1 AS HUGEINT) << b) AS s FROM bits GROUP BY 1) q
        |     USING (doc_id))
        |SELECT a.doc_id AS ida, b.doc_id AS idb,
        |  CAST(bit_count(xor(a.dhash, b.dhash)) AS BIGINT) AS hamming
        |FROM dh a JOIN dh b ON a.doc_id < b.doc_id
        |WHERE bit_count(xor(a.dhash, b.dhash)) <= 6
        |ORDER BY ida, idb""".stripMargin)),

    Q("text_url_canon",
      // URL canonicalization (RFC 3986 §6 syntax rules + tracking-
      // param strip): synthesized URLs exercise mixed-case authority,
      // default ports, tracking-param runs, fragments, and trailing
      // slashes; the oracle replays the same lookaround-free regex
      // chain (RE2 'g' flags, \\1 backreferences) — hash-exact
      (s, dir) => {
        val d = T(s, dir, "documents")
        val u = concat(
          when(col("doc_id") % 2 === 0, lit("HTTPS://Example.COM:443"))
            .otherwise(lit("http://Site.ORG:80")),
          lit("/Path"), (col("doc_id") % 7).cast("string"),
          when(col("doc_id") % 3 === 0, lit("/")).otherwise(lit("")),
          lit("?utm_source=x&utm_campaign="), col("doc_id").cast("string"),
          lit("&id="), (col("doc_id") % 50).cast("string"),
          when(col("doc_id") % 5 === 0, lit("&fbclid=abc")).otherwise(lit("")),
          lit("#frag"))
        d.select(col("doc_id"), u.as("url"),
            TextFunctions.canonicalizeUrl(u).as("canon"))
          .orderBy(col("doc_id"))
      },
      Some("""WITH b AS (SELECT doc_id,
        |   CASE WHEN doc_id % 2 = 0 THEN 'HTTPS://Example.COM:443'
        |     ELSE 'http://Site.ORG:80' END
        |   || '/Path' || CAST(doc_id % 7 AS VARCHAR)
        |   || CASE WHEN doc_id % 3 = 0 THEN '/' ELSE '' END
        |   || '?utm_source=x&utm_campaign=' || CAST(doc_id AS VARCHAR)
        |   || '&id=' || CAST(doc_id % 50 AS VARCHAR)
        |   || CASE WHEN doc_id % 5 = 0 THEN '&fbclid=abc' ELSE '' END
        |   || '#frag' AS url FROM documents),
        | s1 AS (SELECT doc_id, url,
        |   regexp_replace(url, '#.*$', '', 'g') AS t FROM b),
        | s2 AS (SELECT doc_id, url, regexp_replace(regexp_replace(
        |   regexp_replace(regexp_replace(t,
        |     '([?&])(utm_[A-Za-z0-9_]+|fbclid|gclid|msclkid|ref)=[^&]*&?', '\1', 'g'),
        |     '([?&])(utm_[A-Za-z0-9_]+|fbclid|gclid|msclkid|ref)=[^&]*&?', '\1', 'g'),
        |     '([?&])(utm_[A-Za-z0-9_]+|fbclid|gclid|msclkid|ref)=[^&]*&?', '\1', 'g'),
        |     '([?&])(utm_[A-Za-z0-9_]+|fbclid|gclid|msclkid|ref)=[^&]*&?', '\1', 'g')
        |   AS t FROM s1),
        | s3 AS (SELECT doc_id, url,
        |   regexp_replace(t, '[?&]+$', '', 'g') AS t FROM s2),
        | s4 AS (SELECT doc_id, url,
        |   lower(regexp_extract(t, '^([A-Za-z][A-Za-z0-9+.-]*://[^/?#]*)', 1))
        |   || regexp_replace(t, '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*', '')
        |   AS t FROM s3),
        | s5 AS (SELECT doc_id, url, regexp_replace(regexp_replace(t,
        |     '^(https://[^/:?#]+):443([/?#].*)?$', '\1\2'),
        |     '^(http://[^/:?#]+):80([/?#].*)?$', '\1\2') AS t FROM s4)
        |SELECT doc_id, url, regexp_replace(t, '/$', '') AS canon
        |FROM s5 ORDER BY doc_id""".stripMargin)),

    Q("text_gopher_flags",
      // Gopher MassiveWeb quality rules (Rae et al. 2021 Table A1) as
      // one row-local projection; every signal is a single exact
      // division of integer counts, so the row compares unrounded
      (s, dir) => T(s, dir, "documents")
        .select(col("doc_id"),
          TextFunctions.gopherQualityFlags(col("text")).as("g"))
        .select(col("doc_id"), col("g.n_words").as("n_words"),
          col("g.mean_word_len").as("mean_word_len"),
          col("g.symbol_ratio").as("symbol_ratio"),
          col("g.alpha_word_frac").as("alpha_word_frac"),
          col("g.n_required_stops").as("n_required_stops"),
          col("g.pass_word_count").as("pass_word_count"),
          col("g.pass_mean_word_len").as("pass_mean_word_len"),
          col("g.pass_stopwords").as("pass_stopwords"),
          col("g.pass").as("pass"))
        .orderBy(col("doc_id")),
      Some("""WITH w AS (SELECT doc_id, text,
        |   list_filter(string_split(text, ' '), x -> x <> '') AS words
        |   FROM documents),
        | sig AS (SELECT doc_id,
        |   CAST(len(words) AS BIGINT) AS n_words,
        |   CASE WHEN len(words) > 0 THEN
        |     CAST(list_aggregate(list_transform(words, x -> strlen(x)), 'sum')
        |       AS DOUBLE) / CAST(len(words) AS DOUBLE) END AS mean_word_len,
        |   CASE WHEN len(words) > 0 THEN
        |     CAST(len(regexp_extract_all(text, '#|\.\.\.')) AS DOUBLE)
        |       / CAST(len(words) AS DOUBLE) END AS symbol_ratio,
        |   CASE WHEN len(words) > 0 THEN
        |     CAST(len(list_filter(words, x -> regexp_matches(x, '[A-Za-z]')))
        |       AS DOUBLE) / CAST(len(words) AS DOUBLE) END AS alpha_word_frac,
        |   CAST(list_contains(words, 'the') AS BIGINT)
        |     + CAST(list_contains(words, 'be') AS BIGINT)
        |     + CAST(list_contains(words, 'to') AS BIGINT)
        |     + CAST(list_contains(words, 'of') AS BIGINT)
        |     + CAST(list_contains(words, 'and') AS BIGINT)
        |     + CAST(list_contains(words, 'that') AS BIGINT)
        |     + CAST(list_contains(words, 'have') AS BIGINT)
        |     + CAST(list_contains(words, 'with') AS BIGINT) AS n_required_stops,
        |   CAST(len(list_filter(string_split(text, chr(10)), l ->
        |       starts_with(l, '- ') OR starts_with(l, '* '))) AS DOUBLE)
        |     / CAST(len(string_split(text, chr(10))) AS DOUBLE) AS bullet_frac,
        |   CAST(len(list_filter(string_split(text, chr(10)), l ->
        |       ends_with(l, '...'))) AS DOUBLE)
        |     / CAST(len(string_split(text, chr(10))) AS DOUBLE) AS ellipsis_frac
        |   FROM w)
        |SELECT doc_id, n_words, mean_word_len, symbol_ratio,
        |  alpha_word_frac, n_required_stops,
        |  (n_words >= 50 AND n_words <= 100000) AS pass_word_count,
        |  COALESCE(mean_word_len >= 3.0 AND mean_word_len <= 10.0, FALSE)
        |    AS pass_mean_word_len,
        |  (n_required_stops >= 2) AS pass_stopwords,
        |  ((n_words >= 50 AND n_words <= 100000)
        |    AND COALESCE(mean_word_len >= 3.0 AND mean_word_len <= 10.0, FALSE)
        |    AND COALESCE(symbol_ratio <= 0.1, FALSE)
        |    AND bullet_frac < 0.9 AND ellipsis_frac < 0.3
        |    AND COALESCE(alpha_word_frac >= 0.8, FALSE)
        |    AND n_required_stops >= 2) AS pass
        |FROM sig ORDER BY doc_id""".stripMargin)),

    Q("text_c4_filter",
      // C4 line/document cleaning (Raffel et al. 2020 §2.2). The
      // synthetic documents are single-line and punctuation-free, so
      // the gate SYNTHESIZES line-structured pages from them (the mm
      // gate pattern): the raw text line (dropped — no terminal
      // punctuation), a kept sentence, a too-short line, and a
      // per-doc tail that alternates a javascript mention (dropped)
      // with a kept closer — both engines build the same page, so
      // retention, the word floor, and the javascript rule all carry
      // signal; flags and kept text compare hash-exact
      (s, dir) => {
        val page = concat_ws("\n",
          col("text"),
          lit("This line has enough words to pass."),
          lit("Too short."),
          when(col("doc_id") % 3 === 0,
            lit("Except some docs mention javascript libraries, sadly."))
            .otherwise(lit("A perfectly good closing sentence right here!")))
        T(s, dir, "documents")
          .select(col("doc_id"),
            TextFunctions.c4FilteredText(page).as("kept_text"),
            TextFunctions.c4DocFlags(page).as("f"))
          .select(col("doc_id"), col("kept_text"),
            col("f.n_sentences").as("n_sentences"),
            col("f.has_brace").as("has_brace"),
            col("f.has_lorem_ipsum").as("has_lorem_ipsum"),
            col("f.n_kept_lines").as("n_kept_lines"),
            col("f.pass").as("pass"))
          .orderBy(col("doc_id"))
      },
      Some("""WITH pg AS (SELECT doc_id,
        |   text || chr(10) || 'This line has enough words to pass.'
        |     || chr(10) || 'Too short.' || chr(10) ||
        |     CASE WHEN doc_id % 3 = 0
        |       THEN 'Except some docs mention javascript libraries, sadly.'
        |       ELSE 'A perfectly good closing sentence right here!'
        |     END AS t
        |   FROM documents),
        | k AS (SELECT doc_id, t,
        |   list_filter(string_split(t, chr(10)), l ->
        |     right(rtrim(l), 1) IN ('.', '!', '?', '"')
        |     AND len(list_filter(string_split(l, ' '), x -> x <> '')) >= 5
        |     AND NOT contains(lower(l), 'javascript')) AS kept
        |   FROM pg)
        |SELECT doc_id,
        |  COALESCE(array_to_string(kept, chr(10)), '') AS kept_text,
        |  CAST(len(regexp_extract_all(t, '[.!?]')) AS BIGINT) AS n_sentences,
        |  contains(t, '{') AS has_brace,
        |  contains(lower(t), 'lorem ipsum') AS has_lorem_ipsum,
        |  CAST(len(list_filter(kept, l -> l <> '')) AS BIGINT) AS n_kept_lines,
        |  (len(regexp_extract_all(t, '[.!?]')) >= 3
        |    AND NOT contains(t, '{')
        |    AND NOT contains(lower(t), 'lorem ipsum')) AS pass
        |FROM k ORDER BY doc_id""".stripMargin))
  )

  // ----------------------------------------------------------- contract

  /** Flagship query on sf=0.001; driver smoke-checks rows > 0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q1_agg")(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    all.map(q => q.name -> q.fn).toMap

  def oracleSql: Map[String, String] =
    all.flatMap(q => q.sql.map(q.name -> _)).toMap
}
