package graft.operators

import graft.SparkSpec

class MultimodalSpec extends SparkSpec {

  private lazy val docs = graft.Tables.load(spark, sf0001, "documents")

  test("mediaTable carries payload as binary with typed metadata") {
    val media = Multimodal.mediaTable(docs)
    val schema = media.schema.map(f => f.name -> f.dataType.typeName).toMap
    assert(schema("payload") === "binary")
    assert(schema("kind") === "string")
    assert(media.count() === docs.count())
  }

  test("extractFeatures is deterministic and row-preserving") {
    val media = Multimodal.mediaTable(docs)
    val f1 = Multimodal.extractFeatures(spark, media).collect()
    val f2 = Multimodal.extractFeatures(spark, media).collect()
    assert(f1.length === docs.count())
    assert(f1.map(x => (x.media_id, x.width, x.height)).toSeq ===
      f2.map(x => (x.media_id, x.width, x.height)).toSeq)
  }

  test("stub decode emits video frame counts only for video kind") {
    val media = Multimodal.mediaTable(docs)
    val feats = Multimodal.extractFeatures(spark, media).collect()
    assert(feats.filter(_.kind != "video").forall(_.n_frames === 1))
    assert(feats.filter(_.kind == "video").exists(_.n_frames > 1))
  }

  test("feature vectors have the contracted shape") {
    val media = Multimodal.mediaTable(docs).limit(10)
    val feats = Multimodal.extractFeatures(spark, media).collect()
    assert(feats.forall(_.feat.length === 8))
    assert(feats.forall(f => f.feat.forall(v => v >= 0f && v < 1f)))
  }

  test("fromBinaryFiles ingests real files into the media pipeline") {
    val dir = java.nio.file.Files.createTempDirectory("graft_media_files")
    java.nio.file.Files.write(dir.resolve("a.png"),
      Array[Byte](0x50, 0x4e, 0x47, 1, 2, 3))
    java.nio.file.Files.write(dir.resolve("b.WAV"),
      Array[Byte](0x52, 0x49, 0x46, 0x46))
    java.nio.file.Files.write(dir.resolve("clip.mp4"),
      "framesframesframes".getBytes("UTF-8"))
    java.nio.file.Files.write(dir.resolve("notes.txt"),
      "not media".getBytes("UTF-8"))
    val media = Multimodal.fromBinaryFiles(spark, dir.toString)
    val byKind = media.collect()
      .map(r => r.getString(1) -> r.getAs[Array[Byte]]("payload").length).toMap
    assert(byKind === Map("image" -> 6, "audio" -> 4, "video" -> 18, "binary" -> 9))
    // the ingested table feeds the same decode stage as the synthetic one
    val feats = Multimodal.extractFeatures(spark, media).collect()
    assert(feats.length === 4)
    assert(feats.filter(_.kind == "video").forall(_.n_frames >= 1))
    // media_id is deterministic across re-reads
    val again = Multimodal.fromBinaryFiles(spark, dir.toString)
      .select("media_id").collect().map(_.getLong(0)).toSet
    assert(again === media.select("media_id").collect().map(_.getLong(0)).toSet)
  }

  test("sampleFrames emits every k-th frame of videos only") {
    val media = Multimodal.mediaTable(docs)
    val feats = Multimodal.extractFeatures(spark, media).collect()
      .map(f => f.media_id -> f).toMap
    val frames = Multimodal.sampleFrames(spark, media, everyK = 4).collect()
    assert(frames.nonEmpty)
    val byMedia = frames.groupBy(_.media_id)
    // only video ids appear, with ceil(n_frames / 4) sampled frames each
    byMedia.foreach { case (id, fs) =>
      assert(feats(id).kind === "video")
      val expect = (feats(id).n_frames + 3) / 4
      assert(fs.length === expect, s"media $id")
      assert(fs.map(_.frame_idx).sorted.toSeq ===
        (0 until feats(id).n_frames by 4).map(_.toLong))
    }
    // every video with frames is covered
    assert(byMedia.keySet ===
      feats.values.filter(_.kind == "video").map(_.media_id).toSet)
  }
}
