package graft

import graft.multimodal.Multimodal
import graft.multimodal.Multimodal.{MediaFeatures, MediaRow}

/** Multimodal binary-column plumbing: schema, per-partition decode, stub
  * determinism. */
class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  test("decode stub is deterministic and byte-derived") {
    val b = "hello".getBytes("UTF-8")
    assert(Multimodal.decodeStub(b) == Multimodal.decodeStub(b))
    val (n, f, l, sum) = Multimodal.decodeStub(b)
    assert(n == 5 && f == 'h'.toInt && l == 'o'.toInt)
    assert(sum == "5d41402abc4b2a76b9719d911017c592") // well-known md5("hello")
  }

  test("empty payload is safe") {
    val (n, f, l, _) = Multimodal.decodeStub(Array.emptyByteArray)
    assert(n == 0 && f == -1 && l == -1)
  }

  test("extractFeatures runs per-partition over a typed Dataset") {
    val rows = Seq(
      MediaRow(1, "image", "abc".getBytes("UTF-8")),
      MediaRow(2, "audio", Array[Byte](0, 127, -1)))
    val got = Multimodal.extractFeatures(spark.createDataset(rows).repartition(2))
      .collect().sortBy(_.media_id)
    assert(got(0) == MediaFeatures(1, "image", 3, 'a'.toInt, 'c'.toInt,
      "900150983cd24fb0d6963f7d28e17f72"))
    assert(got(1).n_bytes == 3 && got(1).first_byte == 0 && got(1).last_byte == 255)
  }
}
