package graft.operators

import graft.{GQuery, QueryModule, Tables}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: media as opaque `binary` columns with typed
  * metadata structs, plus decode/feature/resize/frame-sample operators.
  *
  * The container has no image/audio codecs, so DECODE is a clearly-marked
  * deterministic stub — `decode(media, 'UTF-8')` reinterprets the blob as
  * its sample stream (our fixture blobs are utf8 text, so char codes are the
  * "samples"). Everything Spark-side — binary schema, metadata struct,
  * per-row feature loops, partitioning — is real; swapping the stub for a
  * codec is a one-expression change.
  *
  * At 100 TB the pattern is: the binary column stays columnar in parquet,
  * is never collected to the driver, feature extraction happens per row
  * with codegen'd expressions (no serialization boundary), and downstream
  * joins/groupBys see only the small extracted features.
  */
object MultimodalOps extends QueryModule {

  private val mediaExpr = "CAST(text AS BINARY)"
  /** DECODE STUB: real implementation would call a codec on `media`. */
  private val decodeStub = "decode(media, 'UTF-8')"

  def queries: Seq[GQuery] = Seq(
    GQuery(
      "q50_media_metadata",
      (s, d) => {
        import s.implicits._
        Tables.documents(s, d)
          .withColumn("media", expr(mediaExpr))
          .withColumn("meta", struct($"n_chars".as("declared_len"), $"lang".as("codec")))
          .select($"doc_id",
            length($"media").cast("long").as("media_bytes"),
            md5($"media").as("media_md5"),
            $"meta.declared_len".as("declared_len"),
            $"meta.codec".as("codec"))
          .orderBy($"doc_id")
      },
      Some("""
        |SELECT doc_id,
        |       CAST(octet_length(CAST(text AS BLOB)) AS BIGINT) AS media_bytes,
        |       md5(text) AS media_md5,
        |       n_chars AS declared_len,
        |       lang AS codec
        |FROM documents
        |ORDER BY doc_id
        |""".stripMargin)),

    GQuery(
      // Feature extraction: 8-bin sample histogram over the first 64
      // decoded samples.
      "q51_media_histogram",
      (s, d) => {
        import s.implicits._
        val binned = Tables.documents(s, d)
          .withColumn("media", expr(mediaExpr))
          .withColumn("decoded", expr(decodeStub))
          .withColumn("codes", expr(
            "transform(sequence(1, least(length(decoded), 64)), i -> ascii(substring(decoded, i, 1)))"))
          .withColumn("bins", expr(
            "transform(sequence(0, 7), b -> size(filter(codes, c -> c div 32 = b)))"))
        binned.select($"doc_id" +:
          (0 until 8).map(b => element_at($"bins", b + 1).cast("long").as(s"bin$b")): _*)
          .orderBy($"doc_id")
      },
      Some("""
        |WITH c AS (SELECT doc_id,
        |             list_transform(regexp_extract_all(substring(text, 1, 64), '.'),
        |                            ch -> ascii(ch)) AS codes
        |           FROM documents)
        |SELECT doc_id,
        |  CAST(len(list_filter(codes, x -> x // 32 = 0)) AS BIGINT) AS bin0,
        |  CAST(len(list_filter(codes, x -> x // 32 = 1)) AS BIGINT) AS bin1,
        |  CAST(len(list_filter(codes, x -> x // 32 = 2)) AS BIGINT) AS bin2,
        |  CAST(len(list_filter(codes, x -> x // 32 = 3)) AS BIGINT) AS bin3,
        |  CAST(len(list_filter(codes, x -> x // 32 = 4)) AS BIGINT) AS bin4,
        |  CAST(len(list_filter(codes, x -> x // 32 = 5)) AS BIGINT) AS bin5,
        |  CAST(len(list_filter(codes, x -> x // 32 = 6)) AS BIGINT) AS bin6,
        |  CAST(len(list_filter(codes, x -> x // 32 = 7)) AS BIGINT) AS bin7
        |FROM c
        |ORDER BY doc_id
        |""".stripMargin)),

    GQuery(
      // Resize/thumbnail stub: blob prefix; frame-sample stub: every 8th
      // decoded sample.
      "q52_media_resize_sample",
      (s, d) => {
        import s.implicits._
        Tables.documents(s, d)
          .withColumn("media", expr(mediaExpr))
          .withColumn("decoded", expr(decodeStub))
          .withColumn("thumb", expr("substring(media, 1, 32)"))
          .withColumn("frames", expr(
            "transform(sequence(1, length(decoded), 8), i -> ascii(substring(decoded, i, 1)))"))
          .select($"doc_id",
            md5($"thumb").as("thumb_md5"),
            size($"frames").cast("long").as("n_frames"),
            expr("aggregate(frames, 0L, (a, x) -> a + x)").as("frame_sum"))
          .orderBy($"doc_id")
      },
      Some("""
        |WITH f AS (SELECT doc_id, text,
        |             list_transform(regexp_extract_all(text, '.'), ch -> ascii(ch)) AS codes
        |           FROM documents),
        |g AS (SELECT doc_id, text,
        |        list_transform(range(0, len(codes), 8), i -> codes[i+1]) AS frames
        |      FROM f)
        |SELECT doc_id,
        |       md5(substring(text, 1, 32)) AS thumb_md5,
        |       CAST(len(frames) AS BIGINT) AS n_frames,
        |       CAST(list_sum(frames) AS BIGINT) AS frame_sum
        |FROM g
        |ORDER BY doc_id
        |""".stripMargin))
  )
}
