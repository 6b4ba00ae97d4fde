package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Multimodal, Upsert}

class Queries14Spec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def partFiles(target: String, part: String): Seq[(String, Long, Long)] = {
    val dir = new java.io.File(target, part)
    dir.listFiles().toSeq.filter(_.getName.startsWith("part-"))
      .map(f => (f.getName, f.lastModified(), f.length())).sortBy(_._1)
  }

  test("overwritePartitions rewrites ONLY touched partitions, idempotently") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft_owp").toString
    val target = s"$tmp/t"
    def df(rows: Seq[(Long, String, Double)]) =
      rows.toDF("k", "d", "v").select(col("k"), to_date(col("d")).as("d"), col("v"))

    // bootstrap: two partitions
    Upsert.overwritePartitions(
      df(Seq((1L, "2024-01-01", 1.0), (2L, "2024-01-02", 2.0), (4L, "2024-01-02", 4.0))),
      Seq("k", "d"), "d", target)
    val untouchedBefore = partFiles(target, "d=2024-01-01")

    // incoming touches ONLY the Jan-2 partition: k=2 updated, k=3 new,
    // k=4 absent from incoming but must survive (MERGE, not replace)
    val incoming = df(Seq((2L, "2024-01-02", 20.0), (3L, "2024-01-02", 30.0)))
    Upsert.overwritePartitions(incoming, Seq("k", "d"), "d", target)

    assert(partFiles(target, "d=2024-01-01") == untouchedBefore,
      "untouched partition was rewritten")
    def state() = spark.read.parquet(target)
      .select(col("k"), col("d").cast("string"), col("v"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSet
    val expected = Set((1L, "2024-01-01", 1.0), (2L, "2024-01-02", 20.0),
      (3L, "2024-01-02", 30.0), (4L, "2024-01-02", 4.0))
    assert(state() == expected)

    // re-run with the same incoming: fixpoint, untouched still intact
    Upsert.overwritePartitions(incoming, Seq("k", "d"), "d", target)
    assert(state() == expected, "second run changed the table")
    assert(partFiles(target, "d=2024-01-01") == untouchedBefore)

    // contract: the partition column must be part of the merge key
    intercept[IllegalArgumentException] {
      Upsert.overwritePartitions(incoming, Seq("k"), "d", target)
    }
  }

  test("overwritePartitionsQuarantine routes null keys aside, merges the rest") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft_owq").toString
    val target = s"$tmp/t"
    val quarantine = s"$tmp/q"
    def df(rows: Seq[(Long, String, Double)]) =
      rows.toDF("k", "d", "v").select(col("k"), to_date(col("d")).as("d"), col("v"))

    Upsert.overwritePartitionsQuarantine(
      df(Seq((1L, "2024-01-01", 1.0), (2L, "2024-01-02", 2.0))),
      Seq("k", "d"), "d", target, quarantine)
    // incoming: one merge row, one NULL-date row (to_date(null) = null)
    Upsert.overwritePartitionsQuarantine(
      df(Seq((2L, "2024-01-02", 20.0), (9L, null, 9.0))),
      Seq("k", "d"), "d", target, quarantine)

    val main = spark.read.parquet(target)
      .select(col("k"), col("d").cast("string"), col("v"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSet
    assert(main == Set((1L, "2024-01-01", 1.0), (2L, "2024-01-02", 20.0)))
    val bad = spark.read.parquet(quarantine).collect()
    assert(bad.length == 1)
    val b = bad(0)
    assert(b.getAs[Long]("k") == 9L && b.isNullAt(b.fieldIndex("d")))
    assert(b.getAs[String]("__reason").contains("null partition key"))
  }

  test("decodeImageFeatures: real PNG round-trip, garbage and null are total") {
    import spark.implicits._
    // hand-built 2x1 image with known pixels -> exact channel means
    val img = new java.awt.image.BufferedImage(2, 1,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    img.setRGB(0, 0, (10 << 16) | (20 << 8) | 30)
    img.setRGB(1, 0, (40 << 16) | (60 << 8) | 80)
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", out)
    val media = Seq(
      (1L, out.toByteArray),
      (2L, Array[Byte](1, 2, 3)), // not an image
      (3L, null.asInstanceOf[Array[Byte]])
    ).toDF("media_id", "payload")
    val rows = Multimodal.decodeImageFeatures(media)
      .orderBy("media_id").collect()
    assert(rows(0).getInt(1) == 2 && rows(0).getInt(2) == 1)
    assert(rows(0).getDouble(3) == 25.0 && rows(0).getDouble(4) == 40.0 &&
      rows(0).getDouble(5) == 55.0)
    assert(rows(1).isNullAt(1) && rows(1).isNullAt(3))
    assert(rows(2).isNullAt(1) && rows(2).isNullAt(3))
  }

  test("Profile counts nulls and distincts exactly on a null-heavy column") {
    import spark.implicits._
    val df = Seq[(java.lang.Long, String)](
      (1L, "a"), (2L, null), (3L, "b"), (4L, null), (5L, "a")
    ).toDF("id", "s")
    val rows = graft.operators.Profile.profile(df, Seq("s", "id"))
      .collect().map(r => r.getString(0) -> r).toMap
    val s = rows("s")
    assert(s.getLong(1) == 5 && s.getLong(2) == 3 && s.getLong(3) == 2)
    assert(s.getString(4) == "a" && s.getString(5) == "b")
    val id = rows("id")
    assert(id.getLong(2) == 5 && id.getLong(3) == 5)
    intercept[IllegalArgumentException] {
      graft.operators.Profile.profile(df, Nil)
    }
  }

  test("MAD is robust where stddev is not: one huge outlier") {
    import spark.implicits._
    val base = (1 to 99).map(i => ("g", (i % 9 + 1).toDouble))
    def madOf(rows: Seq[(String, Double)]): Double = {
      val df = rows.toDF("g", "v")
      val med = graft.operators.Percentiles
        .quantilesDisc(df, col("g"), col("v"), Seq(5000))
        .select(col("g"), col("value").as("med"))
      val dev = df.join(med, "g").select(col("g"), abs(col("v") - col("med")).as("d"))
      graft.operators.Percentiles.quantilesDisc(dev, col("g"), col("d"), Seq(5000))
        .collect().head.getDouble(2)
    }
    val clean = madOf(base)
    val poisoned = madOf(base :+ ("g", 1.0e9))
    assert(clean == poisoned, "one outlier moved the MAD")
    // ...while the stddev explodes by orders of magnitude
    val sdClean = base.toDF("g", "v").agg(stddev(col("v"))).collect().head.getDouble(0)
    val sdPois = (base :+ ("g", 1.0e9)).toDF("g", "v")
      .agg(stddev(col("v"))).collect().head.getDouble(0)
    assert(sdPois > sdClean * 1000)
  }

  test("decodeVideoFrames: container parse + per-frame PNG decode, total on bad media") {
    import spark.implicits._
    // hand-built container: one good 2x1 frame + one garbage frame
    val img = new java.awt.image.BufferedImage(2, 1,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    img.setRGB(0, 0, (10 << 16) | (20 << 8) | 30)
    img.setRGB(1, 0, (40 << 16) | (60 << 8) | 80)
    val png = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", png)
    val good = png.toByteArray
    val bad = Array[Byte](1, 2, 3, 4)
    val out = new java.io.ByteArrayOutputStream()
    val dos = new java.io.DataOutputStream(out)
    dos.writeInt(2); dos.writeInt(good.length); dos.writeInt(bad.length)
    out.write(good); out.write(bad)
    val media = Seq(
      (1L, out.toByteArray),
      (2L, Array[Byte](0, 0)), // truncated header -> no rows
      (3L, null.asInstanceOf[Array[Byte]])
    ).toDF("media_id", "payload")
    val rows = Multimodal.decodeVideoFrames(media)
      .orderBy("media_id", "frame_idx").collect()
    assert(rows.length == 2) // two frames of video 1, nothing else
    assert(rows(0).getLong(0) == 1L && rows(0).getInt(1) == 0)
    assert(rows(0).getInt(2) == 2 && rows(0).getDouble(4) == 25.0)
    assert(rows(1).getInt(1) == 1 && rows(1).isNullAt(2) && rows(1).isNullAt(4))
  }

  test("syntheticVideo round-trips to closed-form per-frame statistics") {
    val id = 13L
    val rows = Multimodal.decodeVideoFrames(
      Multimodal.encodeSyntheticVideos(
        spark.range(id, id + 1).select(col("id").as("media_id"))))
      .orderBy("frame_idx").collect()
    assert(rows.length == (2 + id % 4).toInt)
    rows.zipWithIndex.foreach { case (row, f) =>
      val q = id * 100 + f
      val w = (4 + q % 13).toInt
      val h = (4 + (q * 7) % 11).toInt
      assert(row.getInt(2) == w && row.getInt(3) == h)
      val rs = for { y <- 0 until h; x <- 0 until w }
        yield (q * 31 + x * 7 + y * 13) % 256
      assert(row.getDouble(4) == rs.sum.toDouble / (w * h))
    }
  }

  test("decodeAudioFeatures: real WAV round-trip, garbage and null are total") {
    import spark.implicits._
    // hand-built 4-sample mono 16-bit clip with known values
    val samples = Array[Short](100, -200, 300, -400)
    val pcm = new Array[Byte](8)
    samples.zipWithIndex.foreach { case (s, i) =>
      pcm(2 * i) = (s & 0xff).toByte
      pcm(2 * i + 1) = ((s >> 8) & 0xff).toByte
    }
    val fmt = new javax.sound.sampled.AudioFormat(8000f, 16, 1, true, false)
    val out = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(
      new javax.sound.sampled.AudioInputStream(
        new java.io.ByteArrayInputStream(pcm), fmt, 4L),
      javax.sound.sampled.AudioFileFormat.Type.WAVE, out)
    val media = Seq(
      (1L, out.toByteArray),
      (2L, Array[Byte](9, 9, 9)), // not audio
      (3L, null.asInstanceOf[Array[Byte]])
    ).toDF("media_id", "payload")
    val rows = Multimodal.decodeAudioFeatures(media)
      .orderBy("media_id").collect()
    assert(rows(0).getInt(1) == 8000 && rows(0).getInt(2) == 1 &&
      rows(0).getInt(3) == 4)
    assert(rows(0).getDouble(4) == (100 - 200 + 300 - 400) / 4.0)
    assert(rows(0).getDouble(5) ==
      (100.0 * 100 + 200 * 200 + 300 * 300 + 400 * 400) / 4.0)
    assert(rows(1).isNullAt(1) && rows(1).isNullAt(4))
    assert(rows(2).isNullAt(1) && rows(2).isNullAt(4))
  }

  test("syntheticWav decodes back to its closed-form statistics") {
    val id = 7L
    val feats = Multimodal.decodeAudioFeatures(
      Multimodal.encodeSyntheticWavs(
        spark.range(id, id + 1).select(col("id").as("media_id"))))
      .collect().head
    val n = (400 + id % 600).toInt
    assert(feats.getInt(1) == (8000 + (id % 3) * 4000).toInt)
    assert(feats.getInt(3) == n)
    val s = (0 until n).map(i => (id * 31 + i * 17) % 2001 - 1000)
    assert(feats.getDouble(4) == s.sum.toDouble / n)
    assert(feats.getDouble(5) == s.map(v => v * v).sum.toDouble / n)
  }

  test("syntheticPng decodes back to its closed-form statistics") {
    val id = 42L
    val feats = Multimodal.decodeImageFeatures(
      Multimodal.encodeSyntheticPngs(
        spark.range(id, id + 1).select(col("id").as("media_id"))))
      .collect().head
    val w = (4 + id % 13).toInt
    val h = (4 + (id * 7) % 11).toInt
    assert(feats.getInt(1) == w && feats.getInt(2) == h)
    val pixels = for { y <- 0 until h; x <- 0 until w }
      yield ((id * 31 + x * 7 + y * 13) % 256,
             (id * 17 + x * 11 + y * 5) % 256,
             (id * 23 + x * 3 + y * 19) % 256)
    val n = (w * h).toDouble
    assert(feats.getDouble(3) == pixels.map(_._1).sum / n)
    assert(feats.getDouble(4) == pixels.map(_._2).sum / n)
    assert(feats.getDouble(5) == pixels.map(_._3).sum / n)
  }
}
