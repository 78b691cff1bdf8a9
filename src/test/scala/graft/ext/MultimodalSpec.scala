package graft.ext

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Multimodal plumbing: schema round-trip through parquet (binary + struct
  * metadata), codec determinism, and the mapPartitions batch shape. */
class MultimodalSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  val dir = "/root/testdata/sf0.001"

  test("media schema survives a parquet round-trip (binary payload + metadata struct)") {
    import spark.implicits._
    val corpus = Multimodal.syntheticCorpus(spark, dir)
    val tmp = java.nio.file.Files.createTempDirectory("graft_media").toString + "/media"
    corpus.write.parquet(tmp)
    val back = spark.read.parquet(tmp).as[MediaItem]
    assert(back.schema("payload").dataType.typeName == "binary")
    val orig = corpus.collect().sortBy(_.media_id)
    val rt = back.collect().sortBy(_.media_id)
    assert(orig.length == rt.length)
    assert(orig.zip(rt).forall { case (a, b) =>
      a.media_id == b.media_id && a.meta == b.meta &&
        java.util.Arrays.equals(a.payload, b.payload)
    })
  }

  test("fake codec is deterministic and shape-correct") {
    val payload = "hello world of pixels".getBytes("UTF-8")
    val px = Multimodal.FakeCodec.decode(payload, 10, 6)
    assert(px.length == 60)
    val rs = Multimodal.FakeCodec.resize(px, 10, 6, Multimodal.ResizedDim)
    assert(rs.length == 64)
    assert(Multimodal.FakeCodec.decode(payload, 10, 6).toSeq == px.toSeq)
    val f = Multimodal.FakeCodec.features(rs)
    assert(f.length == 4)
    assert(Multimodal.FakeCodec.features(rs).toSeq == f.toSeq)
  }

  test("extractFeatures: every row exactly once, values equal a direct codec run") {
    val corpus = Multimodal.syntheticCorpus(spark, dir)
    val n = corpus.count()
    val feats = Multimodal.extractFeatures(corpus)
    assert(feats.count() == n)
    assert(feats.select("media_id").distinct().count() == n)

    // distributed result == driver-side single-threaded codec run
    val one = corpus.filter(_.media_id == 3L).head()
    val got = feats.filter(_.media_id == 3L).head()
    val px = Multimodal.FakeCodec.decode(one.payload, one.meta.width, one.meta.height)
    val rs = Multimodal.FakeCodec.resize(px, one.meta.width, one.meta.height, Multimodal.ResizedDim)
    assert(got.resized_checksum == Multimodal.FakeCodec.checksum(rs))
    assert(Seq(got.f0, got.f1, got.f2, got.f3) == Multimodal.FakeCodec.features(rs).toSeq)
  }
}
