package graft.operators

import graft.QueryGroup
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal columns for the training-data pipeline: media are opaque
  * BINARY payloads + typed metadata, processed with the same distributed
  * plumbing as any other column (the brief's image/audio/video surface).
  *
  * No media codecs exist in this environment, so the *decode* step is a
  * clearly-marked deterministic STUB (`stubDecode`): it derives plausible
  * metadata (width/height/format) from payload size with pure arithmetic.
  * Everything around the stub — binary payload handling, schema shape,
  * per-modality partitioning, chunked frame sampling, feature extraction
  * over byte ranges — is real, distributed, and oracle-checked where the
  * math is engine-neutral.
  *
  * Scale notes: payload ops are all map-side (no shuffle until the final
  * per-modality aggregate); chunking uses substring-on-binary, which
  * never materializes more than one row's payload per task; a real
  * decoder would slot into `stubDecode`'s position as a mapPartitions /
  * Arrow-batch UDF with identical schema.
  */
object MultimodalOps extends QueryGroup {

  /** The synthetic media table: documents' text re-cast as an opaque
    * binary payload, with a deterministic modality assignment.
    */
  private def mediaTable(s: SparkSession): DataFrame =
    s.table("documents").select(
      col("doc_id").as("media_id"),
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (col("doc_id") % 3 + 1).cast("int")).as("modality"),
      encode(col("text"), "UTF-8").as("payload"),
      col("n_chars"))

  /** STUB decoder — deterministic fake standing in for an image/audio
    * decoder (no codec libraries in this container). Metadata derives
    * from payload size only; a real implementation would parse headers.
    */
  private def stubDecode(payloadLen: Column, modality: Column): Column =
    struct(
      (payloadLen % 640 + 16).cast("int").as("width"),
      ((payloadLen * 7) % 480 + 16).cast("int").as("height"),
      when(modality === "image", "png")
        .when(modality === "audio", "wav")
        .otherwise("mp4").as("format"))

  private val FrameBytes = 64

  def defs = Seq(
    // per-modality payload statistics (binary length = stored bytes)
    q("mm_binary_stats",
      """WITH m AS (
        |  SELECT doc_id,
        |    CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS modality,
        |    octet_length(CAST(text AS BLOB)) AS nbytes
        |  FROM documents)
        |SELECT modality, count(*) AS n,
        |  CAST(sum(nbytes) AS BIGINT) AS total_bytes,
        |  CAST(min(nbytes) AS INT) AS min_bytes,
        |  CAST(max(nbytes) AS INT) AS max_bytes
        |FROM m GROUP BY modality ORDER BY modality""".stripMargin) { (s, _) =>
      mediaTable(s)
        .select(col("modality"), length(col("payload")).as("nbytes"))
        .groupBy("modality")
        .agg(count(lit(1)).as("n"),
          sum("nbytes").cast("bigint").as("total_bytes"),
          min("nbytes").cast("int").as("min_bytes"),
          max("nbytes").cast("int").as("max_bytes"))
        .orderBy("modality")
    },

    // stub-decode metadata extraction (schema + plumbing real, codec faked)
    q("mm_decode_meta",
      """SELECT doc_id AS media_id,
        |  CAST(octet_length(CAST(text AS BLOB)) % 640 + 16 AS INT) AS width,
        |  CAST((octet_length(CAST(text AS BLOB)) * 7) % 480 + 16 AS INT) AS height,
        |  CASE doc_id % 3 WHEN 0 THEN 'png' WHEN 1 THEN 'wav' ELSE 'mp4' END AS format
        |FROM documents WHERE doc_id < 200 ORDER BY media_id""".stripMargin) { (s, _) =>
      val m = mediaTable(s).filter(col("media_id") < 200)
      m.select(col("media_id"),
          stubDecode(length(col("payload")).cast("bigint"), col("modality")).as("meta"))
        .select(col("media_id"), col("meta.width").as("width"),
          col("meta.height").as("height"), col("meta.format").as("format"))
        .orderBy("media_id")
    },

    // frame sampling: chunk the payload into fixed-size frames map-side,
    // take every 4th frame ("frame-sample"), count + measure them
    q("mm_frame_sample",
      """WITH m AS (
        |  SELECT doc_id, octet_length(CAST(text AS BLOB)) AS nbytes
        |  FROM documents WHERE doc_id < 200)
        |SELECT doc_id AS media_id,
        |  CAST(ceil(nbytes / 64.0) AS INT) AS n_frames,
        |  CAST(((CAST(ceil(nbytes / 64.0) AS INT) + 3) // 4) AS INT) AS n_sampled,
        |  CAST(least(64, nbytes) AS INT) AS first_frame_bytes
        |FROM m ORDER BY media_id""".stripMargin) { (s, _) =>
      val m = mediaTable(s).filter(col("media_id") < 200)
        .withColumn("nbytes", length(col("payload")))
        .withColumn("frames",
          transform(sequence(lit(0), ceil(col("nbytes") / FrameBytes.toDouble).cast("int") - 1),
            i => col("payload").substr(i * FrameBytes + 1, lit(FrameBytes))))
      m.select(col("media_id"),
          size(col("frames")).as("n_frames"),
          size(filter(col("frames"), (_, i) => i % 4 === 0)).as("n_sampled"),
          length(element_at(col("frames"), 1)).as("first_frame_bytes"))
        .orderBy("media_id")
    },

    // deterministic fake feature extraction: 8 hash-derived floats per
    // payload (stands in for an embedding model over decoded frames) —
    // engine-specific hashing → no SQL oracle; MultimodalSpec pins shape
    // and determinism
    qNoOracle("mm_features") { (s, _) =>
      val m = mediaTable(s)
      m.select(col("media_id"), col("modality"),
          transform(sequence(lit(0), lit(7)),
            i => (xxhash64(col("payload"), i).cast("double") / lit(Long.MaxValue.toDouble)))
            .as("features"))
        .select(col("media_id"), col("modality"),
          size(col("features")).as("dim"),
          round(aggregate(col("features"), lit(0.0), (a, x) => a + x * x), 6).as("sq_norm"))
        .orderBy("media_id")
    },

    // ── feature-extraction ORACLE twin: the row above is no_oracle only
    // because of xxhash64 — this runs the SAME pipeline shape (binary
    // payload → 8 fixed-dim features → squared norm) with the portable
    // char-fold hash over the DECODED payload, seeded per feature index,
    // so DuckDB recomputes every feature bit-for-bit from documents.text
    // (UTF-8 encode/decode is an identity on it). Feature values are
    // integers < 2^31 normalized by 2^31 — exactly representable, so
    // the double square-sum is engine-stable. ──
    q("mm_features_portable",
      """SELECT doc_id AS media_id,
        |  ['image', 'audio', 'video'][CAST(doc_id % 3 + 1 AS INTEGER)] AS modality,
        |  CAST(8 AS BIGINT) AS dim,
        |  round(list_sum(list_transform(range(0, 8), i ->
        |    pow(list_reduce(list_prepend(CAST(7 + i AS BIGINT),
        |          list_transform(string_split(text, ''), c -> CAST(ascii(c) AS BIGINT))),
        |        (a, c) -> (a * 31 + c) % 2147483648) / 2147483648.0, 2))), 6) AS sq_norm
        |FROM documents ORDER BY media_id""".stripMargin) { (s, _) =>
      val m = mediaTable(s)
      m.select(col("media_id"), col("modality"),
          expr("""transform(sequence(0, 7), i ->
                 |  aggregate(transform(split(decode(payload, 'UTF-8'), ''), c -> CAST(ascii(c) AS BIGINT)),
                 |    CAST(7 + i AS BIGINT), (a, c) -> (a * 31 + c) % 2147483648)
                 |  / 2147483648.0D)""".stripMargin).as("features"))
        .select(col("media_id"), col("modality"),
          size(col("features")).cast("long").as("dim"),
          round(aggregate(col("features"), lit(0.0), (a, x) => a + x * x), 6).as("sq_norm"))
        .orderBy("media_id")
    },
  )
}
