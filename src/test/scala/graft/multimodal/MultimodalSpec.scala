package graft.multimodal

import graft.SparkTestSession
import graft.multimodal.MultimodalOps._
import org.scalatest.funsuite.AnyFunSuite

/** The multimodal plumbing around the stubbed decode: header round trip,
  * partition-wise decode, resize header rewrite, frame-sampling shape, and
  * malformed-input tolerance.
  */
class MultimodalSpec extends AnyFunSuite with SparkTestSession {

  private val dir = "/root/testdata/sf0.001"

  test("fake encode/decode header round trip") {
    val payload = "hello multimodal".getBytes("UTF-8")
    val bytes = encodeFake(7L, payload)
    val meta = decodeFake(bytes).get
    assert(meta.kind == "audi") // 7 % 3 == 1
    assert(meta.width == 16 + 7 && meta.height == 9 + 7 && meta.n_frames == 8)
    assert(bytes.drop(HeaderLen).toSeq == payload.toSeq)
  }

  test("malformed binary is dropped, not thrown") {
    assert(decodeFake(Array[Byte](1, 2, 3)).isEmpty)
    assert(decodeFake("XXXX0000000000000000".getBytes).isEmpty)
  }

  test("decodeMeta over the synthetic media table") {
    val decoded = decodeMeta(mediaFromDocuments(spark, dir)).collect()
    assert(decoded.length == 500)
    decoded.foreach { d =>
      assert(Set("imag", "audi", "vide").contains(d.kind))
      assert(d.width == 16 + (d.media_id % 64) && d.n_frames == 1 + (d.media_id % 10))
      assert(d.payload_bytes > 0)
    }
  }

  test("resize rewrites dims and shrinks payload monotonically") {
    import spark.implicits._
    val media = spark.createDataset(Seq(
      Media(40L, encodeFake(40L, Array.fill[Byte](1000)(7)))))
    val resized = resize(media, newWidth = 8, newHeight = 4).collect().head
    val meta = decodeFake(resized.content).get
    assert(meta.width == 8 && meta.height == 4)
    assert(resized.content.length < 1000 + HeaderLen)
  }

  test("frameSample explodes every Nth frame with sliced payloads") {
    import spark.implicits._
    val media = spark.createDataset(Seq(
      Media(9L, encodeFake(9L, Array.tabulate[Byte](100)(_.toByte)))))
    // media 9: n_frames = 1 + 9%10 = 10
    val all = frameSample(media, everyN = 1).collect()
    assert(all.map(_.frame_idx).sorted.toSeq == (0 until 10))
    val sampled = frameSample(media, everyN = 3).collect()
    assert(sampled.map(_.frame_idx).sorted.toSeq == Seq(0, 3, 6, 9))
    // frames partition the payload without overlap
    assert(all.map(_.frame.length).sum <= 100)
  }

  test("q38 media census is deterministic and grouped by kind") {
    val rows = MultimodalOps.q38MediaMeta(spark, dir).collect()
    assert(rows.map(_.getString(0)).toSeq == Seq("audi", "imag", "vide"))
    assert(rows.map(_.getLong(1)).sum == 500)
  }

  test("real BMP container round-trips through a distributed decode") {
    import spark.implicits._
    val media = (1L to 40L).map { id =>
      val w = 4 + (id % 8).toInt; val h = 3 + (id % 5).toInt
      (id, MultimodalOps.encodeBmp(w, h, Array.fill(((w * 3 + 3) & ~3) * h)(id.toByte)))
    }.toDS()
    val decoded = media.mapPartitions(_.flatMap { case (id, bytes) =>
      MultimodalOps.decodeBmpMeta(bytes).map(m => (id, m.width, m.height, m.bpp))
    }).collect().sortBy(_._1)
    assert(decoded.length == 40)
    decoded.foreach { case (id, w, h, bpp) =>
      assert(w == 4 + (id % 8).toInt && h == 3 + (id % 5).toInt && bpp == 24, s"media $id")
    }
    // a real parser would reject garbage the same way
    assert(MultimodalOps.decodeBmpMeta("not a bmp".getBytes).isEmpty)
  }

  test("real WAV container round-trips through a distributed decode") {
    import spark.implicits._
    val media = (1L to 40L).map { id =>
      val rate = 8000 * (1 + (id % 3).toInt); val ch = 1 + (id % 2).toInt
      val frames = 100 + (id % 50).toInt
      (id, MultimodalOps.encodeWavPcm16(rate, ch, new Array[Byte](frames * ch * 2)))
    }.toDS()
    val decoded = media.mapPartitions(_.flatMap { case (id, bytes) =>
      MultimodalOps.decodeWavMeta(bytes).map(m => (id, m.sample_rate, m.channels, m.bits, m.n_frames))
    }).collect().sortBy(_._1)
    assert(decoded.length == 40)
    decoded.foreach { case (id, rate, ch, bits, frames) =>
      assert(rate == 8000 * (1 + (id % 3).toInt) && ch == 1 + (id % 2).toInt, s"media $id")
      assert(bits == 16 && frames == 100 + (id % 50).toInt, s"media $id")
    }
    assert(MultimodalOps.decodeWavMeta(new Array[Byte](10)).isEmpty)
  }
}
