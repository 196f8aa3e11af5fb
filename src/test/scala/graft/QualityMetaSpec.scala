package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.config.DedupConfig
import graft.pairs.Meta
import graft.quality.Quality

class QualityMetaSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  val cfg = DedupConfig.default

  // fixtures lifted from the reference's own tests (FIXTURES.md §2)
  val cases: Seq[(String, Seq[String])] = Seq(
    ("bug", Seq("short_caption", "generic_caption")),
    ("App crashes on startup when clicking the login button", Seq()),
    ("THIS IS BROKEN EVERYTHING IS ON FIRE HELP", Seq("all_caps")),
    ("spam spam spam spam spam spam spam spam", Seq("low_uniqueness")),
    ("", Seq("missing_caption")),
    ("!!!! #### $$$$ %%%%", Seq("special_chars", "short_caption")),
    ("ok fine", Seq("short_caption"))
  )

  // non-ASCII: U+2028 line separator (regex \s does NOT match it — both
  // sides must agree it is "special"), astral plane emoji (counts as ONE
  // code point on both sides), accented letters (\p{L} matches)
  val nonAsciiCases: Seq[String] = Seq(
    "une légende parfaitement normale avec accents éèê",
    "broken line separated caption with several seps",
    "caption with astral chars 😀😀😀😀😀😀😀😀 padding words here",
    "😀😀😀 ok",
    "münchen straße café über alles und so weiter"
  )

  test("quality issues: column == scala on non-ASCII captions") {
    import spark.implicits._
    val got = nonAsciiCases.toDF("caption")
      .select(Quality.issuesCol(col("caption"), cfg)).as[Seq[String]].collect()
    nonAsciiCases.zip(got).foreach { case (cap, g) =>
      assert(g.toSet == Quality.issues(cap, cfg).toSet,
        s"caption: '$cap' column=${g.toSet} scala=${Quality.issues(cap, cfg).toSet}")
    }
  }

  test("quality issues: scala side") {
    cases.foreach { case (cap, want) =>
      assert(Quality.issues(cap, cfg).toSet == want.toSet, s"caption: '$cap'")
    }
  }

  test("quality issues: column side == scala side") {
    import spark.implicits._
    val caps = cases.map(_._1)
    val got = caps.toDF("caption")
      .select(Quality.issuesCol(col("caption"), cfg)).as[Seq[String]].collect()
    caps.zip(got).foreach { case (cap, g) =>
      assert(g.toSet == Quality.issues(cap, cfg).toSet, s"caption: '$cap'")
    }
  }

  test("quality score and severity") {
    assert(Quality.score(Seq()) == 1.0)
    assert(math.abs(Quality.score(Seq("short_caption")) - 0.7) < 1e-9)
    assert(Quality.score(Seq("missing_caption", "short_caption", "generic_caption", "low_uniqueness")) == 0.0)
    assert(Quality.severity(Seq("short_caption")) == "critical")
    assert(Quality.severity(Seq("all_caps")) == "major")
    assert(Quality.severity(Seq()) == "ok")
  }

  test("quality score column == scala") {
    import spark.implicits._
    val caps = cases.map(_._1)
    val got = caps.toDF("caption")
      .select(Quality.scoreCol(Quality.issuesCol(col("caption"), cfg))).as[Double].collect()
    caps.zip(got).foreach { case (cap, g) =>
      assert(math.abs(g - Quality.score(Quality.issues(cap, cfg))) < 1e-9)
    }
  }

  // pinned metadata arithmetic (FIXTURES.md §3: reference similarity_engine.py)
  test("metadata similarity: identical triples score 1") {
    assert(Meta.metaSim(64, 64, "png", 64, 64, "png") == 1.0)
  }

  test("metadata similarity: width-only match gets partial dims credit") {
    // same w, different h → dims 0.15 of 0.30 (the major.minor rule)
    val s = Meta.metaSim(64, 48, "png", 64, 64, "png")
    // fmt .2 + dims .15 + orient 0 (landscape vs square) + size 0 (11 vs 12)
    // + aspect 0 (21 vs 16), / 1.0
    assert(math.abs(s - 0.35) < 1e-9, s"got $s")
  }

  test("metadata similarity: missing fmt renormalizes by present weight") {
    val s = Meta.metaSim(64, 64, null, 64, 64, "png")
    assert(math.abs(s - 1.0) < 1e-9, s"got $s") // all present fields match
  }

  test("hybrid weights and cross-orientation penalty") {
    val h = Meta.hybrid(1.0, 0.5, 64, 64, 64, 64, cfg)
    assert(math.abs(h - 0.85) < 1e-9)
    // orientation differs → -0.05
    val p = Meta.hybrid(1.0, 0.5, 64, 32, 32, 64, cfg)
    assert(math.abs(p - 0.80) < 1e-9)
    // clamp at zero
    assert(Meta.hybrid(0.0, 0.1, 64, 32, 32, 64, cfg) == 0.0)
  }

  test("meta sim column == scala") {
    import spark.implicits._
    val rows = Seq((64, 64, "png", 64, 64, "png"), (64, 48, "png", 64, 64, "png"),
      (48, 48, "png", 64, 64, "jpg"), (64, 64, "jpg", 64, 64, "png"))
    val got = rows.toDF("w1", "h1", "f1", "w2", "h2", "f2")
      .select(Meta.metaSimCol(col("w1"), col("h1"), col("f1"),
        col("w2"), col("h2"), col("f2"))).as[Double].collect()
    rows.zip(got).foreach { case ((w1, h1, f1, w2, h2, f2), g) =>
      assert(math.abs(g - Meta.metaSim(w1, h1, f1, w2, h2, f2)) < 1e-9)
    }
  }
}
