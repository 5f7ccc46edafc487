package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing for training-data pipelines: media
  * (image/audio/video) travels as an opaque `binary` column with typed
  * metadata beside it; decode/feature-extract/frame-sample run as
  * partition-streamed operators so one task handles a batch of blobs
  * without materializing them all (the Scala analog of `mapInPandas`
  * batch processing).
  *
  * ==STUB NOTICE==
  * This container ships no image/audio codecs, so [[StubDecoder]] is a
  * clearly-marked DETERMINISTIC FAKE: it derives "dimensions" from the
  * content hash and "pixels" from the raw bytes. The Spark-side contract —
  * blob schema, metadata struct, partitioning, per-partition batch shape,
  * and the operator signatures — is real and tested; swapping in a real
  * codec means replacing StubDecoder.decode only.
  */
object Multimodal {

  /** Attach an opaque media blob + typed metadata to a documents table
    * (fixture path: the UTF-8 bytes of `text` stand in for media payloads). */
  def toBlobTable(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      encode(col("text"), "utf-8").as("media"),
      lit("application/octet-stream").as("media_type"),
      struct(
        octet_length(col("text")).cast("long").as("n_bytes"),
        md5(col("text")).as("checksum_md5")).as("media_meta"))

  /** Declarative (codegen-friendly) feature columns that need no codec:
    * sizes, checksums, and the stub "decoded" geometry derived from the
    * checksum. Everything here is expressible in one narrow projection
    * over the scan. */
  def features(blobs: DataFrame, frameBytes: Int = 64): DataFrame = {
    def nib(i: Int) = // hex nibble i of the checksum as 0..15
      expr(s"position(substring(media_meta.checksum_md5, $i, 1) IN '0123456789abcdef') - 1")
    blobs.select(
      col("doc_id"),
      col("media_type"),
      col("media_meta.n_bytes").as("n_bytes"),
      col("media_meta.checksum_md5").as("checksum_md5"),
      // STUB geometry: fake width/height ∈ [16, 271] from checksum nibbles.
      (lit(16) + nib(1) * 16 + nib(2)).cast("long").as("width"),
      (lit(16) + nib(3) * 16 + nib(4)).cast("long").as("height"),
      // frame sampling plan: ceil(n_bytes / frameBytes)
      ((col("media_meta.n_bytes") + (frameBytes - 1)) / frameBytes)
        .cast("long").as("n_frames"))
  }

  /** One sampled "frame" of a decoded blob. `pos_checksum` =
    * Σ (j+1)·byte(j) over the frame — position-weighted, so it pins the
    * byte ORDER of the slice (mean/max/min alone are order-blind);
    * bounded by 64·65·255/2 per frame, exact in a Long. */
  final case class Frame(
      doc_id: Long, frame_idx: Long, n_bytes: Long,
      mean_byte: Double, max_byte: Int, min_byte: Int, pos_checksum: Long)

  /** DETERMINISTIC FAKE decoder: chops the payload into frameBytes-sized
    * "frames" and reduces each to byte statistics — the stand-in for
    * decode→resize→feature-extract. Pure function of the bytes.
    * mean_byte is exactInt/exactInt: one correctly-rounded IEEE division,
    * bit-identical in every engine (Det rule 3). */
  object StubDecoder {
    def decode(docId: Long, payload: Array[Byte], frameBytes: Int,
               sampleEvery: Int): Iterator[Frame] =
      payload.grouped(frameBytes).zipWithIndex
        .filter { case (_, i) => i % sampleEvery == 0 } // frame sampling
        .map { case (chunk, i) =>
          val u = chunk.map(b => b & 0xff)
          val checksum = u.iterator.zipWithIndex
            .map { case (b, j) => (j + 1).toLong * b }.sum
          Frame(docId, i.toLong, chunk.length.toLong,
            u.sum.toDouble / u.length, u.max, u.min, checksum)
        }
  }

  /** Frame sampling + feature extraction, partition-streamed: each task
    * pulls blobs off its partition iterator one at a time (bounded
    * memory), runs the decoder, and emits frames. `parallelism` controls
    * the decode fan-out — at 100 TB this is the knob that matches decode
    * tasks to cluster cores while the scan stays columnar. */
  def decodeFrames(blobs: DataFrame, frameBytes: Int = 64, sampleEvery: Int = 2,
                   parallelism: Option[Int] = None): Dataset[Frame] = {
    val spark = blobs.sparkSession
    import spark.implicits._
    val src = blobs.select(col("doc_id").cast("long"), col("media"))
      .as[(Long, Array[Byte])]
    val part = parallelism.fold(src)(n => src.repartition(n))
    part.mapPartitions(_.flatMap { case (id, bytes) =>
      StubDecoder.decode(id, bytes, frameBytes, sampleEvery)
    })
  }

  /** One bucket of a pooled (resized) blob. */
  final case class Pooled(doc_id: Long, bucket: Long, n_in: Long,
                          sum_bytes: Long, mean_byte: Double)

  /** One sample of a bilinearly-resized blob: `value_num` is the EXACT
    * interpolation numerator (value = value_num / 2P), so the float is
    * one correctly-rounded division off an exact integer. */
  final case class Bilinear(doc_id: Long, sample_idx: Long, src_idx: Long,
                            frac_num: Long, value_num: Long, value: Double)

  /** BILINEAR resize (the round-12 stretch upgrade over [[resizePool]]'s
    * average-pool): the payload byte stream resampled to `samples`
    * points with linear interpolation at half-pixel centers — the 1-D
    * restriction of the standard align_corners=false bilinear image
    * resize (sample j reads source coordinate x = (j+0.5)·n/P − 0.5,
    * value = (1−frac)·b[i0] + frac·b[i0+1], edges clamped).
    *
    * Engine-portable by construction: x lives on the exact rational
    * grid num/(2P) with num = (2j+1)·n − P, so i0 = num div 2P,
    * frac = r/2P with r = num mod 2P, and the interpolated value is the
    * EXACT integer numerator b[i0]·(2P−r) + b[i1]·r (≤ 255·2P) divided
    * once by 2P — no floating intermediate anywhere, the one division
    * correctly rounded in every engine (Det rule 3). Same partition-
    * streamed one-blob-per-task shape as [[resizePool]]; a real codec
    * swaps the byte source, the index algebra is the real thing. */
  def resizeBilinear(blobs: DataFrame, samples: Int = 16,
                     parallelism: Option[Int] = None): Dataset[Bilinear] = {
    require(samples >= 1, "samples must be >= 1")
    val spark = blobs.sparkSession
    import spark.implicits._
    val p = samples
    val twoP = 2L * p
    val src = blobs.select(col("doc_id").cast("long"), col("media"))
      .as[(Long, Array[Byte])]
    val part = parallelism.fold(src)(n => src.repartition(n))
    part.mapPartitions(_.flatMap { case (id, bytes) =>
      val n = bytes.length
      if (n == 0) Iterator.empty
      else (0 until p).iterator.map { j =>
        val num = (2L * j + 1L) * n - p
        val (i0, r) =
          if (num < 0L) (0L, 0L) // clamp below the first byte center
          else {
            val d = num / twoP
            if (d >= n - 1L) (n - 1L, 0L) // clamp above the last center
            else (d, num % twoP)
          }
        val a = bytes(i0.toInt) & 0xff
        val b = bytes(math.min(i0 + 1L, n - 1L).toInt) & 0xff
        val numer = a * (twoP - r) + b * r
        Bilinear(id, j.toLong, i0, r, numer,
          math.floor(numer.toDouble / twoP.toDouble * 1e6 + 0.5) / 1e6)
      }
    })
  }

  /** STUB resize: average-pool the payload byte stream into `buckets`
    * equal index ranges — the fixed-size thumbnail a real image resize
    * produces, with the same partition-streamed batch shape as
    * [[decodeFrames]] (one blob in memory per task at a time). Byte i
    * lands in bucket ⌊i·P/n⌋ (the standard nearest-neighbor downsample
    * index map); bucket means are exactInt/exactInt — one correctly-
    * rounded division snapped to the 1e-6 grid, bit-identical in every
    * engine. Blobs shorter than `buckets` emit only their non-empty
    * buckets; empty blobs emit nothing. Swapping in a real codec means
    * replacing the byte source, not the Spark plumbing. */
  def resizePool(blobs: DataFrame, buckets: Int = 16,
                 parallelism: Option[Int] = None): Dataset[Pooled] = {
    require(buckets >= 1, "buckets must be >= 1")
    val spark = blobs.sparkSession
    import spark.implicits._
    val p = buckets
    val src = blobs.select(col("doc_id").cast("long"), col("media"))
      .as[(Long, Array[Byte])]
    val part = parallelism.fold(src)(n => src.repartition(n))
    part.mapPartitions(_.flatMap { case (id, bytes) =>
      val n = bytes.length
      if (n == 0) Iterator.empty
      else {
        val sums = new Array[Long](p)
        val cnts = new Array[Long](p)
        var i = 0
        while (i < n) {
          val j = ((i.toLong * p) / n).toInt
          sums(j) += (bytes(i) & 0xff)
          cnts(j) += 1L
          i += 1
        }
        (0 until p).iterator.filter(cnts(_) > 0L).map { j =>
          Pooled(id, j.toLong, cnts(j), sums(j),
            math.floor(sums(j).toDouble / cnts(j).toDouble * 1e6 + 0.5) / 1e6)
        }
      }
    })
  }
}
