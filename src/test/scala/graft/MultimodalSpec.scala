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

  test("aHash locality: a one-byte payload change flips only a few bits; " +
      "identical payloads collide exactly") {
    val spark2 = spark
    import spark2.implicits._
    import org.apache.spark.sql.functions._
    val base = "a moderately long media payload standing in for pixels 0123456789"
    // tweak a byte INSIDE the 8×8 (= 64-byte) grid — the payload is 66
    // bytes, so its last two bytes never become pixels
    val tweaked = base.updated(10, 'X')
    val d = Seq((1L, base), (2L, tweaked), (3L, base))
      .toDF("media_id", "text")
      .select(col("media_id"), encode(col("text"), "UTF-8").as("payload"))
    val hashes = Multimodal.aHash(d)
      .select("media_id", "ahash").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(hashes.values.forall(h => h.length == 64 && h.forall("01".contains(_))))
    assert(hashes(1L) == hashes(3L), "identical payloads must collide")
    val dist = hashes(1L).zip(hashes(2L)).count { case (a, b) => a != b }
    assert(dist >= 1 && dist <= 8,
      s"one-byte change should flip few bits, flipped $dist")
  }

  test("native AHash64 matches the HOF SQL formulation on every tiling " +
      "regime (empty / shorter / exact / longer than the 64-byte grid)") {
    val spark2 = spark
    import spark2.implicits._
    import org.apache.spark.sql.functions._
    val payloads = Seq("", "x", "abc", "a" * 63 + "b", "0123456789" * 7,
      (0 until 64).map(i => ('a' + i % 26).toChar).mkString,
      "édge càse bytes beyond ascii ü" * 4)
    val d = payloads.zipWithIndex
      .map { case (s, i) => (i.toLong, s) }.toDF("media_id", "text")
      .select(col("media_id"), encode(col("text"), "UTF-8").as("payload"))
    // the pre-round-10 interpreted formulation, kept here as the spec oracle
    val sqlSide = d
      .withColumn("hx", expr(
        "CASE WHEN length(payload) = 0 THEN repeat('0', 128) " +
          "ELSE substring(repeat(hex(payload), " +
          "CAST(64 div length(payload) AS INT) + 1), 1, 128) END"))
      .withColumn("pix", expr("transform(sequence(0, 63), " +
        "i -> CAST(conv(substring(hx, 2*i + 1, 2), 16, 10) AS BIGINT))"))
      .withColumn("total", expr(
        "aggregate(pix, CAST(0 AS BIGINT), (a, x) -> a + x)"))
      .withColumn("expected", expr(
        "concat_ws('', transform(pix, p -> IF(p * 64 > total, '1', '0')))"))
      .select("media_id", "expected")
    val got = Multimodal.aHash(d).select("media_id", "ahash")
      .join(sqlSide, "media_id").collect()
    got.foreach { r =>
      assert(r.getString(1) == r.getString(2),
        s"media ${r.getLong(0)}: native ${r.getString(1)} != sql ${r.getString(2)}")
    }
  }
}
