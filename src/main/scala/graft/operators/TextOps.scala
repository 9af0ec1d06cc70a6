package graft.operators

import graft.QueryGroup
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Training-data text pipeline: deduplication + text analysis over the
  * `documents` table. These extend the reference's surface (it has no
  * text-pipeline operators) with the ops a 100 TB LLM-data curation run
  * needs.
  *
  * Scale design:
  *  - normalization/shingling/minhash signatures are computed entirely
  *    map-side with codegen'd array lambdas — zero shuffle until the
  *    band-bucket join;
  *  - MinHash-LSH shuffles only (band, signature) keys — candidate
  *    generation is linear, never all-pairs;
  *  - the exact-Jaccard verifier runs only on LSH candidates;
  *  - `dd_ngram_jaccard` (all-pairs within a partition key) exists as the
  *    small-data oracle twin that validates the LSH path.
  */
object TextOps extends QueryGroup {

  /** Normalized token array: lowercase, strip non-alphanumerics, split. */
  private def tokensCol: Column =
    filter(
      split(regexp_replace(lower(col("text")), "[^a-z0-9 ]", " "), " +"),
      t => t =!= "")

  /** Word 3-gram shingles of the normalized tokens. */
  private def shinglesCol(tokens: Column): Column =
    transform(
      sequence(lit(1), greatest(size(tokens) - 2, lit(0))),
      i => concat_ws(" ", element_at(tokens, i), element_at(tokens, i + 1), element_at(tokens, i + 2)))

  private def withShingles(s: SparkSession): DataFrame = {
    val t = s.table("documents").withColumn("tokens", tokensCol)
    t.withColumn("shingles", array_distinct(shinglesCol(col("tokens"))))
  }

  /** 64-permutation MinHash signature, computed map-side:
    * sig[i] = min over shingles of xxhash64(shingle, i).
    */
  private def minhashSig: Column =
    transform(sequence(lit(0), lit(63)),
      i => array_min(transform(col("shingles"), sh => xxhash64(sh, i))))

  def defs = Seq(
    // ── exact dedup: hash-groupBy on content digest (one shuffle) ──
    q("dd_exact",
      """SELECT md5(text) AS content_hash, min(doc_id) AS keeper,
        |  count(*) AS n_copies
        |FROM documents
        |GROUP BY md5(text)
        |HAVING count(*) > 0
        |ORDER BY content_hash""".stripMargin) { (s, _) =>
      s.table("documents")
        .groupBy(md5(col("text")).as("content_hash"))
        .agg(min("doc_id").as("keeper"), count(lit(1)).as("n_copies"))
        .orderBy("content_hash")
    },

    // exact-dedup survivor set (what a pipeline would pass downstream)
    q("dd_exact_survivors",
      """SELECT count(*) AS n_docs, count(DISTINCT md5(text)) AS n_unique,
        |  count(*) - count(DISTINCT md5(text)) AS n_dropped
        |FROM documents""".stripMargin) { (s, _) =>
      s.table("documents").agg(
        count(lit(1)).as("n_docs"),
        countDistinct(md5(col("text"))).as("n_unique"),
        (count(lit(1)) - countDistinct(md5(col("text")))).as("n_dropped"))
    },

    // ── MinHash + LSH near-dup candidate pairs (16 bands × 4 rows) ──
    // Engine-specific hashing → no SQL oracle; TextOpsSpec validates the
    // candidates against exact Jaccard ground truth.
    qNoOracle("dd_minhash_lsh") { (s, _) =>
      val docs = withShingles(s).filter(size(col("shingles")) > 0)
        .select(col("doc_id"), col("shingles"), minhashSig.as("sig"))
      val banded = docs.select(
        col("doc_id"),
        posexplode(transform(sequence(lit(0), lit(15)),
          b => slice(col("sig"), b * 4 + 1, lit(4)))).as(Seq("band", "band_sig")))
      val pairs = banded.as("a")
        .join(banded.as("b"),
          col("a.band") === col("b.band")
            && col("a.band_sig") === col("b.band_sig")
            && col("a.doc_id") < col("b.doc_id"))
        .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
        .distinct()
      // verify candidates with exact shingle Jaccard ≥ 0.5
      val sh = withShingles(s).select(col("doc_id"), col("shingles"))
      pairs
        .join(sh.select(col("doc_id").as("doc_a"), col("shingles").as("sh_a")), "doc_a")
        .join(sh.select(col("doc_id").as("doc_b"), col("shingles").as("sh_b")), "doc_b")
        .withColumn("jaccard",
          size(array_intersect(col("sh_a"), col("sh_b"))).cast("double") /
            size(array_union(col("sh_a"), col("sh_b"))))
        .filter(col("jaccard") >= 0.5)
        .select(col("doc_a"), col("doc_b"), round(col("jaccard"), 4).as("jaccard"))
        .orderBy("doc_a", "doc_b")
    },

    // ── SimHash (64-bit) + banded hamming-distance candidate pairs ──
    // bit b of simhash = sign of Σ over tokens of ±1 per token-hash bit;
    // candidates must share one of four 16-bit bands (guarantees recall
    // for hamming ≤ 3), then are filtered by exact bit_count(xor).
    // Fully map-side until the tiny band-bucket self-join.
    qNoOracle("dd_simhash") { (s, _) =>
      s.sql("""WITH toks AS (
              |  SELECT doc_id,
              |    array_distinct(filter(split(regexp_replace(lower(text), '[^a-z0-9 ]', ' '), ' +'), t -> t <> '')) AS tokens
              |  FROM documents),
              |sh AS (
              |  SELECT doc_id,
              |    aggregate(sequence(0, 63), 0L, (acc, b) -> acc + IF(
              |      aggregate(tokens, 0L,
              |        (a, t) -> a + IF((shiftright(xxhash64(t), b) & 1) = 1, 1L, -1L)) > 0,
              |      shiftleft(1L, b), 0L)) AS simhash
              |  FROM toks WHERE size(tokens) > 0),
              |banded AS (
              |  SELECT doc_id, simhash, band,
              |    (shiftright(simhash, band * 16) & 65535) AS band_val
              |  FROM sh LATERAL VIEW explode(sequence(0, 3)) AS band)
              |SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
              |  bit_count(a.simhash ^ b.simhash) AS hamming
              |FROM banded a JOIN banded b
              |  ON a.band = b.band AND a.band_val = b.band_val AND a.doc_id < b.doc_id
              |WHERE bit_count(a.simhash ^ b.simhash) <= 3
              |ORDER BY doc_a, doc_b""".stripMargin)
    },

    // ── exact n-gram Jaccard, all pairs within a source bucket ──
    // (quadratic-within-group: the oracle twin of dd_minhash_lsh)
    q("dd_ngram_jaccard",
      """WITH toks AS (
        |  SELECT doc_id, source,
        |    list_distinct(list_filter(string_split_regex(regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'), ' +'), t -> t <> '')) AS tokens
        |  FROM documents
        |)
        |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
        |  round(CAST(len(list_intersect(a.tokens, b.tokens)) AS DOUBLE)
        |        / len(list_distinct(list_concat(a.tokens, b.tokens))), 4) AS jaccard
        |FROM toks a JOIN toks b
        |  ON a.source = b.source AND a.doc_id < b.doc_id
        |WHERE CAST(len(list_intersect(a.tokens, b.tokens)) AS DOUBLE)
        |      / len(list_distinct(list_concat(a.tokens, b.tokens))) >= 0.8
        |ORDER BY doc_a, doc_b""".stripMargin) { (s, _) =>
      val toks = s.table("documents")
        .select(col("doc_id"), col("source"), array_distinct(tokensCol).as("tokens"))
      val a = toks.select(col("doc_id").as("doc_a"), col("source").as("src_a"), col("tokens").as("tok_a"))
      val b = toks.select(col("doc_id").as("doc_b"), col("source").as("src_b"), col("tokens").as("tok_b"))
      a.join(b, col("src_a") === col("src_b") && col("doc_a") < col("doc_b"))
        .withColumn("jaccard",
          size(array_intersect(col("tok_a"), col("tok_b"))).cast("double") /
            size(array_union(col("tok_a"), col("tok_b"))))
        .filter(col("jaccard") >= 0.8)
        .select(col("doc_a"), col("doc_b"), round(col("jaccard"), 4).as("jaccard"))
        .orderBy("doc_a", "doc_b")
    },

    // ── token counting + quality scoring ──
    q("tx_stats",
      """WITH t AS (
        |  SELECT doc_id, n_chars,
        |    list_filter(string_split_regex(regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'), ' +'), x -> x <> '') AS tokens,
        |    len(regexp_extract_all(text, '[.,!?;:]')) AS n_punct,
        |    len(regexp_extract_all(text, '[0-9]')) AS n_digits,
        |    len(regexp_extract_all(lower(text), '\b(the|a|and|of|to|in)\b')) AS n_stop
        |  FROM documents)
        |SELECT doc_id, n_chars,
        |  len(tokens) AS n_tokens,
        |  len(list_distinct(tokens)) AS n_unique_tokens,
        |  round(CAST(len(list_distinct(tokens)) AS DOUBLE) / len(tokens), 4) AS ttr,
        |  CAST(n_punct AS BIGINT) AS n_punct,
        |  CAST(n_digits AS BIGINT) AS n_digits,
        |  CAST(n_stop AS BIGINT) AS n_stop,
        |  round(CAST(n_stop AS DOUBLE) / len(tokens), 4) AS stop_ratio
        |FROM t
        |ORDER BY doc_id""".stripMargin) { (s, _) =>
      val t = s.table("documents").select(
        col("doc_id"), col("n_chars"), tokensCol.as("tokens"),
        size(regexp_extract_all(col("text"), lit("[.,!?;:]"), lit(0))).cast("bigint").as("n_punct"),
        size(regexp_extract_all(col("text"), lit("[0-9]"), lit(0))).cast("bigint").as("n_digits"),
        size(regexp_extract_all(lower(col("text")), lit("\\b(the|a|and|of|to|in)\\b"), lit(0))).cast("bigint").as("n_stop"))
      t.select(
        col("doc_id"), col("n_chars"),
        size(col("tokens")).as("n_tokens"),
        size(array_distinct(col("tokens"))).as("n_unique_tokens"),
        round(size(array_distinct(col("tokens"))).cast("double") / size(col("tokens")), 4).as("ttr"),
        col("n_punct"), col("n_digits"), col("n_stop"),
        round(col("n_stop").cast("double") / size(col("tokens")), 4).as("stop_ratio"))
        .orderBy("doc_id")
    },

    // ── heuristic language ID by stopword-list voting ──
    q("tx_langid",
      """WITH sc AS (
        |  SELECT doc_id, lang,
        |    len(regexp_extract_all(lower(text), '\b(the|and|of|to|is)\b')) AS s_en,
        |    len(regexp_extract_all(lower(text), '\b(el|la|de|que|es)\b')) AS s_es,
        |    len(regexp_extract_all(lower(text), '\b(der|die|das|und|ist)\b')) AS s_de,
        |    len(regexp_extract_all(lower(text), '\b(le|les|et|est|une)\b')) AS s_fr
        |  FROM documents)
        |SELECT doc_id, lang AS label,
        |  CASE
        |    WHEN s_en >= s_es AND s_en >= s_de AND s_en >= s_fr THEN 'en'
        |    WHEN s_es >= s_de AND s_es >= s_fr THEN 'es'
        |    WHEN s_de >= s_fr THEN 'de'
        |    ELSE 'fr' END AS predicted,
        |  CAST(s_en AS BIGINT) AS s_en, CAST(s_es AS BIGINT) AS s_es,
        |  CAST(s_de AS BIGINT) AS s_de, CAST(s_fr AS BIGINT) AS s_fr
        |FROM sc
        |ORDER BY doc_id""".stripMargin) { (s, _) =>
      def hits(pat: String): Column =
        size(regexp_extract_all(lower(col("text")), lit(pat), lit(0))).cast("bigint")
      val sc = s.table("documents").select(
        col("doc_id"), col("lang").as("label"),
        hits("\\b(the|and|of|to|is)\\b").as("s_en"),
        hits("\\b(el|la|de|que|es)\\b").as("s_es"),
        hits("\\b(der|die|das|und|ist)\\b").as("s_de"),
        hits("\\b(le|les|et|est|une)\\b").as("s_fr"))
      sc.select(
        col("doc_id"), col("label"),
        when(col("s_en") >= col("s_es") && col("s_en") >= col("s_de") && col("s_en") >= col("s_fr"), "en")
          .when(col("s_es") >= col("s_de") && col("s_es") >= col("s_fr"), "es")
          .when(col("s_de") >= col("s_fr"), "de")
          .otherwise("fr").as("predicted"),
        col("s_en"), col("s_es"), col("s_de"), col("s_fr"))
        .orderBy("doc_id")
    },

    // ── document fingerprinting (normalized sorted-unique-token digest) ──
    q("tx_fingerprint",
      """SELECT doc_id,
        |  md5(array_to_string(list_sort(list_distinct(
        |    list_filter(string_split_regex(regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'), ' +'), t -> t <> ''))), ' ')) AS fingerprint
        |FROM documents
        |ORDER BY doc_id""".stripMargin) { (s, _) =>
      s.table("documents").select(
        col("doc_id"),
        md5(array_join(array_sort(array_distinct(tokensCol)), " ")).as("fingerprint"))
        .orderBy("doc_id")
    },
  )
}
