package graft.ext

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Declared multimodal queries + DuckDB oracles. The media table is
  * synthesized deterministically from `documents` (no real media in the
  * container — see [[Multimodal]]); the ORACLE recomputes the same
  * synthesis in SQL, so the binary plumbing (payload bytes, header-derived
  * metadata, frame slicing) is still end-to-end checked.
  */
object MultimodalQueries {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Per-format media stats over the typed envelope: count, payload bytes,
    // distinct widths — the metadata-pushdown shape (no payload decode).
    "q_media_stats" -> { (s, dir) =>
      Multimodal
        .syntheticMedia(Tables.documents(s, dir))
        .groupBy(col("meta.format").as("format"))
        .agg(
          count(lit(1)).as("cnt"),
          sum(length(col("media"))).as("total_bytes"),
          count_distinct(col("meta.width")).as("widths"))
        .orderBy("format")
    },

    // Frame sampling: 4 binary slices per payload, fingerprinted — the
    // explode-before-extract fan-out, fully codegen (binary substr + md5).
    "q_media_frames" -> { (s, dir) =>
      Multimodal
        .sampleFrames(Multimodal.syntheticMedia(Tables.documents(s, dir)), 4)
        .select(col("id"), col("frame_idx"), md5(col("frame")).as("frame_md5"))
        .orderBy("id", "frame_idx")
    },

    // Batched resize through the mapPartitions kernel path (per-partition
    // init, fixed-size batches) with METADATA PROPAGATION — the oracle
    // recomputes the deterministic nearest-neighbor sampling in SQL, so
    // the whole typed Dataset → kernel → envelope round-trip is
    // hash-checked, not just row-counted.
    "q_media_resize" -> { (s, dir) =>
      val media = Multimodal
        .syntheticMedia(Tables.documents(s, dir))
        .filter(length(col("media")) > 0)
      Multimodal
        .resize(Multimodal.asRecords(media), dstW = 8, dstH = 8)
        .select(col("id"), col("meta.width").as("width"), col("meta.height").as("height"),
          md5(col("media")).as("resized_md5"))
        .orderBy("id")
    }
  )

  private val Media = "encode(text)" // DuckDB: VARCHAR → BLOB (UTF-8)
  private val Fmt = "['img','aud','vid'][(doc_id % 3 + 1)::INT]"

  def oracleSql: Map[String, String] = Map(
    "q_media_stats" -> (s"SELECT $Fmt AS format, count(*) AS cnt, " +
      // CAST: DuckDB sum(BIGINT)→HUGEINT→pandas float64 hash artifact
      s"CAST(sum(octet_length($Media)) AS BIGINT) AS total_bytes, " +
      "count(DISTINCT 64 + doc_id % 192) AS widths " +
      "FROM documents GROUP BY 1 ORDER BY 1"),
    // DuckDB substring() has no BLOB overload; the payload is ASCII text,
    // so byte-slicing the blob ≡ char-slicing the VARCHAR (md5 hashes the
    // same bytes either way). PRECONDITION: this equivalence breaks for
    // multi-byte UTF-8 documents (engine slices bytes, oracle slices
    // chars) — fine for the driver's [a-z ] corpus; a non-ASCII fixture
    // would need the oracle dropped to a rows-only check.
    "q_media_frames" -> ("WITH f AS (SELECT doc_id AS id, i AS frame_idx, " +
      "substring(text, i * (length(text) // 4) + 1, length(text) // 4) AS frame " +
      "FROM documents CROSS JOIN generate_series(0, 3) AS g(i)) " +
      "SELECT id, frame_idx, md5(frame) AS frame_md5 FROM f " +
      "WHERE length(frame) > 0 ORDER BY id, frame_idx"),
    // the resize stub's nearest-neighbor sampling, recomputed in SQL:
    // dst pixel (y,x) reads src byte ((y*srcH//8)*srcW + (x*srcW//8)) mod
    // len, row-major; same ASCII byte≡char precondition as q_media_frames
    "q_media_resize" -> ("SELECT doc_id AS id, 8 AS width, 8 AS height, " +
      "md5(list_reduce(list_transform(generate_series(0, 63), i -> " +
      "substring(text, ((((i // 8) * (64 + doc_id % 128)) // 8) * (64 + doc_id % 192) + " +
      "(((i % 8) * (64 + doc_id % 192)) // 8)) % length(text) + 1, 1)), " +
      "(a, b) -> a || b)) AS resized_md5 " +
      "FROM documents WHERE length(text) > 0 ORDER BY id")
  )
}
