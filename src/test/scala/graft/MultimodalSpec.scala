package graft

import graft.ops.Multimodal
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSpec {

  test("media features: deterministic decode stubs, schema intact") {
    val a = Multimodal.qMediaFeatures(sf0001).collect()
    assert(a.length == 500)
    val b = Multimodal.qMediaFeatures(sf0001).collect()
    assert(a.map(_.toSeq).toSeq == b.map(_.toSeq).toSeq)
    a.foreach { r =>
      assert(r.getLong(2) > 0)                  // n_bytes
      assert(r.getInt(5) >= 64 && r.getInt(6) >= 64) // decoded dims
      assert(r.getInt(7) <= 128 && r.getInt(8) <= 128) // thumb fits
    }
  }

  test("video rows get sampled frames, others none") {
    // sampled_frames is CSV-serialized for the driver gate (scalar-only
    // output columns); empty string = no frames
    val rows = Multimodal.qMediaFeatures(sf0001)
      .select("kind", "sampled_frames").collect()
    rows.foreach { r =>
      val s = r.getString(1)
      if (r.getString(0) == "video")
        assert(s.nonEmpty && s.split(",").length <= 8)
      else assert(s.isEmpty)
    }
  }

  test("metadata-only query prunes the payload column from the scan") {
    val plan = Multimodal.qMediaMetadata(sf0001)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("payload"), "payload column not pruned:\n" + plan)
  }

  test("binaryFile source scans real files into payload + metadata rows") {
    // the production ingest path for a media lake: spark's binaryFile
    // source yields (path, modificationTime, length, content)
    val dir = java.nio.file.Files.createTempDirectory("media").toString
    (1 to 3).foreach { i =>
      java.nio.file.Files.write(
        java.nio.file.Paths.get(s"$dir/img_$i.bin"),
        Array.fill[Byte](100 * i)(i.toByte))
    }
    val df = spark.read.format("binaryFile").load(dir)
    assert(df.count() == 3)
    val rows = df.select("path", "length", "content").collect()
    rows.foreach { r =>
      assert(r.getLong(1) > 0)
      assert(r.getAs[Array[Byte]](2).length == r.getLong(1))
    }
  }

  test("thumbnail resize preserves aspect ratio within rounding") {
    val (tw, th) = Multimodal.StubCodec.thumbDims(1024, 512)
    assert(tw == 128 && th == 64)
    assert(Multimodal.StubCodec.thumbDims(100, 100) == ((100, 100)))
    assert(Multimodal.StubCodec.sampleFrames(240).length == 8)
    assert(Multimodal.StubCodec.sampleFrames(0).isEmpty)
  }
}
