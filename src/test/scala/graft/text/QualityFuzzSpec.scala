package graft.text

import scala.util.Random

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Randomized differentials for the quality-gate operators and URL
  * canonicalization against independent local folds: stopword language
  * ID (profile-order tie-breaks, the "und" floor), the C4-style
  * composite quality score, every Gopher rule's regex count and integer
  * cross-multiplied threshold, and canonical URLs assembled from random
  * scheme/host/port/param/fragment components (tracking-param removal,
  * default-port stripping, byte-order param sort). The regex replays run
  * on Java's engine — the same engine Spark uses — so a mismatch is a
  * rule-chain bug, not an engine difference. Seeds are pinned.
  */
class QualityFuzzSpec extends SparkSpec {
  import spark.implicits._

  test("fuzz: langId and qualityScore match local regex folds") {
    val rnd = new Random(13100)
    val fillers = IndexedSeq("zork", "blap", "mizzle", "?!;", "x", "worterbuch")
    val stopPool = TextAnalysis.StopwordProfiles.flatMap(_._2)
    val rows = (0 until 60).map { i =>
      val t: String =
        if (rnd.nextInt(12) == 0) null
        else (0 until rnd.nextInt(30)).map { _ =>
          if (rnd.nextInt(3) == 0) stopPool(rnd.nextInt(stopPool.size))
          else fillers(rnd.nextInt(fillers.size))
        }.mkString(" ")
      (s"d$i", t)
    }
    val df = rnd.shuffle(rows).toDF("id", "text")
      .repartition(1 + rnd.nextInt(4))
    val got = df.select(col("id"), TextAnalysis.langId(col("text")).as("l"),
        TextAnalysis.qualityScore(col("text")).as("q"))
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getDouble(2)))
      .toSet

    def count(re: String, s: String): Long = re.r.findAllIn(s).length.toLong
    def langScore(t: String, ws: Seq[String]): Long =
      count(ws.mkString("\\b(", "|", ")\\b"), t.toLowerCase)
    val want = rows.map { case (id, t0) =>
      val t = Option(t0).getOrElse("")
      val scores = TextAnalysis.StopwordProfiles
        .map { case (l, ws) => (l, langScore(t, ws)) }
      val best = scores.map(_._2).max
      val lang = if (best <= 0) "und"
        else scores.find(_._2 == best).get._1
      val nChars = t.length.toDouble
      val trimmed = t.trim
      val nTokens = (if (trimmed.isEmpty) 0
        else trimmed.split("\\s+").length).toDouble
      val meanWordLen = if (nTokens > 0) nChars / nTokens else 0.0
      val punct = count("[^\\p{L}\\d\\s]", t).toDouble
      val punctRatio = if (nChars > 0) punct / nChars else 1.0
      val stopRatio = if (nTokens > 0)
        langScore(t, stopPool.distinct).toDouble / nTokens else 0.0
      val s = (if (nTokens >= 10 && nTokens <= 1000) 1.0 else 0.0) +
        (if (meanWordLen >= 3.0 && meanWordLen <= 12.0) 1.0 else 0.0) +
        (if (punctRatio <= 0.2) 1.0 else 0.0) +
        (if (stopRatio >= 0.05) 1.0 else 0.0)
      (id, lang, s / 4.0) // quarters are exact; round(_, 2) is identity
    }.toSet
    assert(got == want,
      s"diff=${(got diff want).take(3)} / ${(want diff got).take(3)}")
  }

  test("fuzz: gopherRules matches a local per-rule fold") {
    val rnd = new Random(13200)
    val stops = Seq("the", "be", "to", "of", "and", "that", "have", "with")
    val lineKinds = IndexedSeq[Random => String](
      r => (0 until 5 + r.nextInt(60)).map(_ =>
        if (r.nextInt(4) == 0) stops(r.nextInt(stops.size))
        else Seq("word", "zag", "pneumonoultra", "x", "##", "12")(r.nextInt(6)))
        .mkString(" "),
      r => "- bullet item " + r.nextInt(10),
      r => "* " + stops(r.nextInt(stops.size)),
      r => "trailing thought" + ("." * 3),
      r => "dots … ",
      r => "")
    val rows = (0 until 50).map { i =>
      val t: String =
        if (rnd.nextInt(12) == 0) null
        else (0 until rnd.nextInt(8))
          .map(_ => lineKinds(rnd.nextInt(lineKinds.size))(rnd))
          .mkString("\n")
      (s"d$i", t)
    }
    val df = rnd.shuffle(rows).toDF("id", "text")
      .repartition(1 + rnd.nextInt(4))
    val got = TextAnalysis.gopherRules(df, "id", "text")
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7),
        r.getLong(8), r.getBoolean(9)))
      .toSet
    def count(re: String, s: String): Long = re.r.findAllIn(s).length.toLong
    val want = rows.map { case (id, t0) =>
      val t = Option(t0).getOrElse("")
      val nWords = count("\\S+", t)
      val charSum = t.replaceAll("\\s+", "").length.toLong
      val mean = if (nWords > 0)
        math.floor((charSum * 1000000L).toDouble / nWords.toDouble).toLong
      else 0L
      val nSym = count("\\.{3}|…", t) + t.count(_ == '#').toLong
      val nLines = count("(?m)^[ \\t]*\\S", t)
      val nBullet = count("(?m)^[ \\t]*[-*•]", t)
      val nEll = count("(?m)(\\.{3}|…)[ \\t]*$", t)
      val nAlpha = count("\\S*\\p{L}\\S*", t)
      val nStop = stops.count(w =>
        ("\\b" + w + "\\b").r.findFirstIn(t.toLowerCase).isDefined).toLong
      val keep = nWords >= 50L && nWords <= 100000L &&
        mean >= 3000000L && mean <= 10000000L &&
        nSym * 10L <= nWords &&
        nBullet * 10L <= nLines * 9L &&
        nEll * 10L <= nLines * 3L &&
        nAlpha * 10L >= nWords * 8L &&
        nStop >= 2L
      (id, nWords, mean, nSym, nLines, nBullet, nEll, nAlpha, nStop, keep)
    }.toSet
    assert(got == want,
      s"diff=${(got diff want).take(3)} / ${(want diff got).take(3)}")
  }

  test("fuzz: canonicalUrl matches a local component fold") {
    val rnd = new Random(13300)
    val schemes = IndexedSeq("http", "HTTP", "https", "HtTpS", "ftp", "")
    val hosts = IndexedSeq("Ex.COM", "a.B.org", "site.io")
    val ports = IndexedSeq("", ":80", ":443", ":8080")
    val paths = IndexedSeq("", "/", "/P/Q", "/x%20y/z")
    val params = IndexedSeq("a=1", "b=2", "B=0", "utm_source=x", "utm_",
      "fbclid", "gclid=z", "c", "utm_ok=1&a=2".split("&").head)
    val frags = IndexedSeq("", "#frag", "#a#b")
    val urls = (0 until 120).map { i =>
      val sch = schemes(rnd.nextInt(schemes.size))
      val base = if (sch == "") "no scheme here#x"
        else sch + "://" + hosts(rnd.nextInt(hosts.size)) +
          ports(rnd.nextInt(ports.size)) + paths(rnd.nextInt(paths.size))
      val q = (0 until rnd.nextInt(4))
        .map(_ => params(rnd.nextInt(params.size)))
      val u = base + (if (q.nonEmpty) "?" + q.mkString("&") else "") +
        frags(rnd.nextInt(frags.size))
      (s"u$i", u)
    }
    val df = rnd.shuffle(urls).toDF("id", "url")
      .repartition(1 + rnd.nextInt(4))
    val got = df.select(col("id"), TextAnalysis.canonicalUrl(col("url")).as("c"))
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    val want = urls.map { case (id, u) =>
      val noFrag = u.replaceAll("#.*", "")
      val schemeRe = "^([A-Za-z][A-Za-z0-9+.-]*)://".r
      schemeRe.findFirstMatchIn(noFrag) match {
        case None => (id, noFrag)
        case Some(m) =>
          val scheme = m.group(1).toLowerCase
          val rest = noFrag.substring(m.end)
          val hostPort = rest.takeWhile(c => c != '/' && c != '?').toLowerCase
          val host =
            if (scheme == "http") hostPort.replaceAll(":80$", "")
            else if (scheme == "https") hostPort.replaceAll(":443$", "")
            else hostPort
          val pathQ = rest.dropWhile(c => c != '/' && c != '?')
          val path0 = pathQ.takeWhile(_ != '?')
          val path = if (path0.isEmpty) "/" else path0
          val query = if (pathQ.contains('?'))
            pathQ.substring(pathQ.indexOf('?') + 1) else ""
          val ps = query.split("&", -1).filter(p => p.nonEmpty &&
            "^(utm_[^=&]*|fbclid|gclid)(=|$)".r.findFirstIn(p).isEmpty)
          val tail = if (ps.nonEmpty) "?" + ps.sorted.mkString("&") else ""
          (id, scheme + "://" + host + path + tail)
      }
    }.toSet
    assert(got == want,
      s"diff=${(got diff want).take(3)} / ${(want diff got).take(3)}")
  }
}
