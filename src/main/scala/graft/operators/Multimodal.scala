package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** A media row: opaque binary payload + typed metadata — the multimodal
  * column model (image/audio/video as `binary` with schema'd sidecar fields).
  */
case class MediaRow(doc_id: Long, media_type: String, payload: Array[Byte],
    width: Int, height: Int, sample_rate: Int)

/** Extracted per-media features (the decode stage's output schema). */
case class MediaFeatures(doc_id: Long, media_type: String, byte_len: Long,
    mean_byte: Double, max_byte: Int, n_frames: Long)

/** Multimodal-column plumbing for a training-data pipeline: treat media as
  * opaque `binary` columns with typed metadata, and run decode /
  * feature-extract / frame-sample as PARTITION-batched typed transforms
  * (`Dataset.mapPartitions` — the Scala analogue of `mapInPandas`: one
  * iterator per partition, so per-batch setup like codec init happens once
  * per partition, not per row).
  *
  * The actual codec is STUBBED (no image/audio libraries in this
  * container): [[decodeStub]] derives deterministic pseudo-features from the
  * raw bytes, clearly marked. Everything else — the binary column, the
  * metadata schema, the partition batching, the sink shape — is real and
  * tested, which is the plumbing a real codec would drop into.
  *
  * Scale: payloads dominate row size, so `spark.sql.files.maxPartitionBytes`
  * governs batch memory; the feature extract is narrow (no shuffle), and
  * metadata-only queries (mm01) never deserialize the payload thanks to
  * Parquet column pruning — THE reason media belongs in a separate column,
  * not a separate system.
  */
object Multimodal {
  import TextFn.{charFingerprint, charFingerprintSql}

  /** The media table: text bytes stand in for the media payload; metadata
    * (type, dimensions, sample rate) derives deterministically from the
    * document row so the oracle can reproduce it.
    */
  def mediaTable(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .select(col("doc_id"), col("text"), col("n_chars"))
      .withColumn("media_type",
        when(col("doc_id") % 3 === 0, "image")
          .when(col("doc_id") % 3 === 1, "audio").otherwise("video"))
      .withColumn("payload", encode(col("text"), "UTF-8"))
      .withColumn("width", (col("doc_id") % 64 * 16 + 64).cast("int"))
      .withColumn("height", (col("doc_id") % 48 * 16 + 64).cast("int"))
      .withColumn("sample_rate",
        when(col("media_type") === "audio", 16000).otherwise(0).cast("int"))
      .select("doc_id", "media_type", "payload", "width", "height",
        "sample_rate")

  /** STUB decode — stands in for the codec call (`???` in a container with
    * the real libraries): deterministic pseudo-features straight from the
    * payload bytes. Frame sampling: one "frame" per 256-byte block.
    */
  def decodeStub(r: MediaRow): MediaFeatures = {
    // a null payload (e.g. null source text) decodes as empty media, not NPE
    val bytes = if (r.payload == null) Array.emptyByteArray else r.payload
    val n = bytes.length
    var sum = 0L
    var mx = 0
    var i = 0
    while (i < n) {
      val b = bytes(i) & 0xff
      sum += b
      if (b > mx) mx = b
      i += 1
    }
    MediaFeatures(r.doc_id, r.media_type, n.toLong,
      if (n == 0) 0.0 else math.floor(sum.toDouble / n * 1e4 + 0.5) / 1e4,
      mx, n.toLong / 256 + 1)
  }

  /** mm02 — the partition-batched feature-extract stage. */
  def mm02MediaFeatures(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val ds: Dataset[MediaRow] = mediaTable(s, dir).as[MediaRow]
    ds.mapPartitions(_.map(decodeStub)).toDF().orderBy("doc_id")
  }

  /** mm01 — metadata + payload-derived columns expressible in BOTH engines
    * (byte length, frame count, content fingerprint): the column-pruned
    * "catalog view" of the media table, fully oracle-checked.
    */
  def mm01MediaMeta(s: SparkSession, dir: String): DataFrame =
    mediaTable(s, dir)
      .withColumn("byte_len", length(col("payload")).cast("long"))
      // `div`, not `/`: Spark's `/` is double division and DuckDB rounds
      // double→bigint casts where Spark truncates — integer div on both
      // sides is the only portable spelling.
      .withColumn("n_frames", expr("byte_len div 256") + 1)
      .select(col("doc_id"), col("media_type"), col("byte_len"),
        col("n_frames").cast("long"), col("width").cast("long"),
        col("height").cast("long"), col("sample_rate").cast("long"))
      .orderBy("doc_id")

  private val mm01Sql =
    """SELECT doc_id,
      |  CASE WHEN doc_id % 3 = 0 THEN 'image'
      |       WHEN doc_id % 3 = 1 THEN 'audio' ELSE 'video' END AS media_type,
      |  CAST(octet_length(encode(text)) AS BIGINT) AS byte_len,
      |  CAST(octet_length(encode(text)) // 256 + 1 AS BIGINT) AS n_frames,
      |  CAST(doc_id % 64 * 16 + 64 AS BIGINT) AS width,
      |  CAST(doc_id % 48 * 16 + 64 AS BIGINT) AS height,
      |  CAST(CASE WHEN doc_id % 3 = 1 THEN 16000 ELSE 0 END AS BIGINT) AS sample_rate
      |FROM documents ORDER BY doc_id""".stripMargin

  /** mm03 — per-type feature aggregate over the extracted features: the
    * "corpus media profile" (bytes, frames, mean brightness per type).
    * Runs the mapPartitions stage then a 3-group aggregate. The weighted
    * mean re-aggregates 4-dp-rounded doubles: `mean_byte × byte_len` is a
    * 4-dp-exact value (4-dp decimal × integer), so routing it through
    * [[Det.dsum]]'s DECIMAL carrier makes the sum order-independent and
    * the whole profile EXACTLY oracle-checkable — a plain double sum here
    * was the one ulp-order hazard that kept mm03 rows-only.
    */
  def mm03MediaProfile(s: SparkSession, dir: String): DataFrame =
    mm02MediaFeatures(s, dir)
      .groupBy("media_type")
      .agg(count(lit(1)).as("n_media"),
        sum(col("byte_len")).as("total_bytes"),
        sum(col("n_frames")).as("total_frames"),
        Det.r(Det.dsum(col("mean_byte") * col("byte_len"))
          / sum(col("byte_len")).cast("double"), 4)
          .as("weighted_mean_byte"))
      .orderBy("media_type")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "mm01_media_meta" -> (mm01MediaMeta _),
    "mm02_media_features" -> (mm02MediaFeatures _),
    "mm03_media_profile" -> (mm03MediaProfile _))

  /** mm02's stub features ARE oracle-expressible on this ASCII corpus:
    * utf-8 payload bytes == char codes, so the byte fold mirrors as an
    * ascii-list fold; mm03 re-aggregates them through the exact decimal
    * carrier (see its scaladoc) so the profile mirrors too.
    */
  private val mm02Sql = {
    val bsum = "list_reduce(list_prepend(CAST(0 AS BIGINT), " +
      "list_transform(string_split(text, ''), c -> CAST(ascii(c) AS BIGINT))), " +
      "(acc, x) -> acc + x)"
    s"""SELECT doc_id,
       |  CASE WHEN doc_id % 3 = 0 THEN 'image'
       |       WHEN doc_id % 3 = 1 THEN 'audio' ELSE 'video' END AS media_type,
       |  CAST(octet_length(encode(text)) AS BIGINT) AS byte_len,
       |  ${Det.sqlR(s"CAST($bsum AS DOUBLE) / octet_length(encode(text))", 4)} AS mean_byte,
       |  CAST(list_max(list_transform(string_split(text, ''),
       |    c -> ascii(c))) AS INTEGER) AS max_byte,
       |  CAST(octet_length(encode(text)) // 256 + 1 AS BIGINT) AS n_frames
       |FROM documents ORDER BY doc_id""".stripMargin
  }

  private def mm03Sql =
    s"""SELECT media_type,
       |  CAST(count(*) AS BIGINT) AS n_media,
       |  CAST(sum(byte_len) AS BIGINT) AS total_bytes,
       |  CAST(sum(n_frames) AS BIGINT) AS total_frames,
       |  ${Det.sqlR(s"${Det.sqlDsum("mean_byte * byte_len")}" +
          " / CAST(sum(byte_len) AS DOUBLE)", 4)} AS weighted_mean_byte
       |FROM ($mm02Sql)
       |GROUP BY media_type ORDER BY media_type""".stripMargin

  val oracles: Map[String, String] = Map(
    "mm01_media_meta" -> mm01Sql,
    "mm02_media_features" -> mm02Sql,
    "mm03_media_profile" -> mm03Sql)
}
