package graft

import org.apache.spark.sql.functions._

import graft.media.{Media, MediaGen}

class MediaSpec extends SparkSpecBase {
  import spark.implicits._

  test("generator round-trip: header decode recovers kind/width/height") {
    val df = MediaGen.mediaDf(spark, 100L)
    val out = df.select(col("media_id"), col("magic"),
      Media.decodeStub(col("bin")).as("m")).collect()
    out.foreach { r =>
      val id = r.getAs[Long]("media_id")
      val magic = r.getAs[String]("magic")
      val m = r.getStruct(2)
      val expectedKind = magic match {
        case "GIM0" => "image"; case "GAU0" => "audio"
        case "GMV0" => "video"; case _ => "unknown"
      }
      assert(m.getAs[String]("kind") === expectedKind)
      if (expectedKind != "unknown") {
        assert(m.getAs[Long]("width") === 64 + (id * 7) % 192)
        assert(m.getAs[Long]("height") === 48 + (id * 11) % 144)
        assert(m.getAs[Long]("n_frames") === 1 + id % 9)
      } else {
        // unknown container → header fields are null, not garbage
        assert(m.isNullAt(m.fieldIndex("width")))
        assert(m.isNullAt(m.fieldIndex("n_frames")))
      }
    }
  }

  test("truncated/empty/null binaries: no throw, payload_bytes never negative") {
    // blobs cut INSIDE their 8-byte header exist in any real media
    // table (the unclamped length(bin)-8 read -6/-8/-4 — round-5
    // probe). Rows 1/2/4: bad magic → unknown, payload_bytes 0. Row 5
    // is the case the first clamp missed (review finding): VALID magic
    // truncated mid-header — kind honestly reports "image" but
    // width/height/n_frames must be null (a partial big-endian read
    // and floor((5-8)/16) = -1 before the full-header gate). Row 3:
    // NULL blob keeps a NULL payload_bytes — 'absent' must stay
    // distinguishable from 'header-only' (greatest skips nulls; the
    // bare clamp silently turned NULL into 0).
    val df = Seq(
      (1L, Array[Byte](0x89.toByte, 0x50)),
      (2L, Array.empty[Byte]),
      (3L, null: Array[Byte]),
      (4L, Array[Byte](0x52, 0x49, 0x46, 0x46)),
      (5L, Array[Byte]('G', 'I', 'M', '0', 0x01)))
      .toDF("media_id", "bin")
    val out = Media.process(df).collect()
      .map(r => r.getAs[Long]("media_id") -> r).toMap
    assert(out.size === 5)
    Seq(1L, 2L, 4L).foreach { id =>
      val m = out(id).getStruct(out(id).fieldIndex("meta"))
      assert(m.getAs[String]("kind") === "unknown")
      assert(m.getAs[Long]("payload_bytes") === 0L)
    }
    val m3 = out(3L).getStruct(out(3L).fieldIndex("meta"))
    assert(m3.isNullAt(m3.fieldIndex("payload_bytes")))
    val m5 = out(5L).getStruct(out(5L).fieldIndex("meta"))
    assert(m5.getAs[String]("kind") === "image")
    assert(m5.isNullAt(m5.fieldIndex("width")))
    assert(m5.isNullAt(m5.fieldIndex("n_frames")))
    assert(m5.getAs[Long]("payload_bytes") === 0L)
    out.values.foreach(r => assert(r.getAs[Int]("n_sampled") === 0))
  }

  test("frame sampling takes every stride-th frame") {
    val df = MediaGen.mediaDf(spark, 50L)
    val out = df.select(col("media_id"),
      ((length(col("bin")) - 8) / Media.FrameBytes).cast("long").as("nf"),
      size(Media.frames(col("bin"), 4)).as("sampled")).collect()
    out.foreach { r =>
      val nf = r.getAs[Long]("nf")
      val expected = (nf + 3) / 4 // ceil(nf / stride); sampling is pure
      assert(r.getAs[Int]("sampled").toLong === expected) // byte-level plumbing
    }
  }

  test("sampled frames are the right bytes") {
    val df = MediaGen.mediaDf(spark, 10L)
    val row = df.filter(col("media_id") === 8L) // 9 frames
      .select(col("bin"), Media.frames(col("bin"), 4).as("f")).head()
    val bin = row.getAs[Array[Byte]]("bin")
    val frames = row.getSeq[Array[Byte]](1)
    assert(frames.length === 3) // frames 0, 4, 8
    assert(frames(0).toSeq === bin.slice(8, 24).toSeq)
    assert(frames(1).toSeq === bin.slice(8 + 64, 8 + 80).toSeq)
  }

  test("frame features: fixed shape, bounded, deterministic") {
    val df = MediaGen.mediaDf(spark, 30L)
    val feats = Media.process(df, stride = 2)
      .select(explode(col("frame_features")).as("f")).collect()
      .map(_.getSeq[Double](0))
    assert(feats.nonEmpty)
    feats.foreach { f =>
      assert(f.length === 4)
      f.foreach(v => assert(v >= -1.0 && v < 1.0))
    }
    val a = Media.process(df, stride = 2).orderBy("media_id").collect()
    val b = Media.process(MediaGen.mediaDf(spark, 30L), stride = 2)
      .orderBy("media_id").collect()
    assert(a.map(_.toString).toSeq === b.map(_.toString).toSeq)
  }

  test("payload hash ignores header, covers payload") {
    val df = MediaGen.mediaDf(spark, 20L)
    val hashes = df.select(Media.payloadHash(col("bin"))).collect().map(_.getString(0))
    assert(hashes.toSet.size === 20) // payloads all distinct
    assert(hashes.forall(_.length === 64))
  }
}
