package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSpec {

  test("decodeMeta is deterministic and bounded") {
    val m = Multimodal.decodeMeta("hello world, this is a fake png".getBytes("UTF-8"))
    assert(m.width >= 1 && m.width <= 128)
    assert(m.height >= 1 && m.height <= 128)
    assert(m.nBytes === 31)
    assert(m === Multimodal.decodeMeta("hello world, this is a fake png".getBytes("UTF-8")))
  }

  test("byte histogram partitions the payload exactly") {
    val sess = spark
    import sess.implicits._
    val payload = (0 until 500).map(i => (i % 251).toByte).toArray
    val media = Seq(Multimodal.MediaRow(1L, "image", payload)).toDS()
    val hist = Multimodal.byteHistograms(media).collect()(0).getSeq[Long](1)
    assert(hist.length === 16)
    assert(hist.sum === 500, "every byte lands in exactly one bin")
  }

  test("frame sampling yields full fixed-size frames at the stride") {
    val sess = spark
    import sess.implicits._
    val media = Seq((1L, ("x" * 300).getBytes("UTF-8")), (2L, ("y" * 30).getBytes("UTF-8")))
      .toDF("media_id", "payload")
    val frames = Multimodal.sampleFrames(media, stride = 2).collect()
    // 300 bytes -> 4 frames (0..3), stride 2 -> frames 0, 2
    assert(frames.map(r => (r.getLong(0), r.getInt(1))).toSet === Set((1L, 0), (1L, 2)))
    assert(frames.forall(_.getAs[Array[Byte]]("frame").length === 64))
    // media 2 is shorter than one frame -> no rows
  }
}
