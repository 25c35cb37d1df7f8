package graft.text

import scala.util.Random

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Randomized differentials for the PII / web-text extraction operators
  * against independent local folds: Luhn validity from the ISO 7812
  * definition (with constructed check digits on half the candidates),
  * card-candidate extraction, the ordered four-pattern PII redaction,
  * the stripHtml rule chain, URL extraction, script distribution, the
  * hashed classifier score, and positional phrase search. The regex
  * operators replay the same patterns through Java's engine — Spark's
  * regexp_* is Java regex, so any mismatch is a CHAIN bug (ordering,
  * missed coalesce), not an engine difference. Seeds are pinned.
  */
class PiiHtmlFuzzSpec extends SparkSpec {
  import spark.implicits._

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  private def luhnRef(s: String): Boolean =
    s.nonEmpty && s.reverse.zipWithIndex.map { case (c, i) =>
      val d = c.asDigit
      if (i % 2 == 1) { val x = d * 2; if (x > 9) x - 9 else x } else d
    }.sum % 10 == 0

  test("fuzz: cardCandidates matches a local Luhn fold, constructed " +
    "valids included") {
    for (trial <- 0 until 3) {
      val rnd = new Random(12600 + trial)
      def randDigits(n: Int) = (0 until n).map(_ => rnd.nextInt(10)).mkString
      def mkValid(n: Int): String = {
        val body = randDigits(n - 1)
        val d = (0 to 9).find(ck => luhnRef(body + ck)).get
        body + d
      }
      val rows = (0 until 8 + rnd.nextInt(12)).map { i =>
        val parts = (0 until rnd.nextInt(4)).map { _ =>
          val len = 13 + rnd.nextInt(4)
          if (rnd.nextBoolean()) mkValid(len) else randDigits(len)
        }
        (s"d$i", parts.mkString("pay ", " and ", " now"))
      }
      val df = rnd.shuffle(rows).toDF("id", "text")
        .repartition(1 + rnd.nextInt(4))
      val got = TextAnalysis.cardCandidates(df, "id", "text")
        .collect()
        .map(r => (r.getString(0), r.getString(1), r.getBoolean(2)))
        .groupBy(identity).view.mapValues(_.length).toMap
      val want = rows.flatMap { case (id, t) =>
        "\\d{13,16}".r.findAllIn(t).map(c => (id, c, luhnRef(c)))
      }.groupBy(identity).view.mapValues(_.length).toMap
      assert(got == want, s"trial $trial")
    }
  }

  test("fuzz: redactPii matches the ordered Java-regex replay") {
    for (trial <- 0 until 3) {
      val rnd = new Random(12700 + trial)
      val pieces = IndexedSeq(
        () => "visit https://ex.com/p?x=1 ok",
        () => s"mail a${rnd.nextInt(9)}@b${rnd.nextInt(9)}.com",
        () => s"ip ${rnd.nextInt(256)}.${rnd.nextInt(256)}.1.${rnd.nextInt(256)}",
        () => s"call +1 (555) ${100 + rnd.nextInt(900)}-${1000 + rnd.nextInt(9000)}",
        () => s"plain words ${rnd.nextInt(100)}",
        () => "url http://h.io/a inside email c@d.org and 10.0.0.1 twice")
      val rows = (0 until 8 + rnd.nextInt(12)).map { i =>
        (s"d$i", (0 until rnd.nextInt(4))
          .map(_ => pieces(rnd.nextInt(pieces.size))()).mkString("; "))
      }
      val df = rnd.shuffle(rows).toDF("id", "text")
        .repartition(1 + rnd.nextInt(4))
      val got = df.select(col("id"),
          TextAnalysis.redactPii(col("text")).as("r"))
        .collect().map(r => (r.getString(0), r.getString(1))).toSet
      val want = rows.map { case (id, t) =>
        val s1 = t.replaceAll(TextAnalysis.UrlRegex, "<URL>")
        val s2 = s1.replaceAll(TextAnalysis.EmailRegex, "<EMAIL>")
        val s3 = s2.replaceAll(TextAnalysis.Ipv4Regex, "<IP>")
        (id, s3.replaceAll(TextAnalysis.PhoneRegex, "<PHONE>"))
      }.toSet
      assert(got == want, s"trial $trial: " +
        s"diff=${(got diff want).take(2)} / ${(want diff got).take(2)}")
    }
  }

  test("fuzz: stripHtml matches the rule-chain replay; extractUrls " +
    "matches findAllIn") {
    for (trial <- 0 until 3) {
      val rnd = new Random(12800 + trial)
      val frags = IndexedSeq(
        () => "plain text",
        () => s"<p>para ${rnd.nextInt(10)}</p>",
        () => "<script type=\"x\">var a = '<p>';</script>",
        () => "<style>.c { color: red }</style>",
        () => "<!-- a <b> comment -->",
        () => "<div class=\"z\">block</div>",
        () => "a &amp;lt; b &lt; c &nbsp; d &quot;q&quot;",
        () => "<ul><li>one</li><li>two</li></ul>",
        () => "line<br>break",
        () => s"see https://site${rnd.nextInt(5)}.org/p/${rnd.nextInt(100)} and http://h.io")
      val rows = (0 until 8 + rnd.nextInt(12)).map { i =>
        (s"d$i", (0 until rnd.nextInt(6))
          .map(_ => frags(rnd.nextInt(frags.size))()).mkString(" "))
      }
      val df = rnd.shuffle(rows).toDF("id", "text")
        .repartition(1 + rnd.nextInt(4))
      val got = df.select(col("id"),
          TextAnalysis.stripHtml(col("text")).as("s"))
        .collect().map(r => (r.getString(0), r.getString(1))).toSet
      val want = rows.map { case (id, t) =>
        val noBlock = t.replaceAll(
          "(?is)<(script|style)\\b[^>]*>.*?</(script|style)\\s*>", " ")
        val noComment = noBlock.replaceAll("(?s)<!--.*?-->", " ")
        val breaks = noComment.replaceAll(
          "(?i)<(br|/p|/div|/li|/h[1-6]|/tr)\\b[^>]*>", "\n")
        val noTags = breaks.replaceAll("<[^>]*>", " ")
        val ent = Seq("&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"",
            "&#39;" -> "'", "&apos;" -> "'", "&nbsp;" -> " ")
          .foldLeft(noTags) { case (acc, (e, r)) => acc.replaceAll(e, r) }
        val amp = ent.replaceAll("&amp;", "&")
        val sp = amp.replaceAll("[ \\t\\x0B\\f\\r]+", " ")
        val nl = sp.replaceAll(" ?\\n ?", "\n")
        (id, nl.replaceAll("\\n{2,}", "\n").replaceAll("^\\s+|\\s+$", ""))
      }.toSet
      assert(got == want, s"trial $trial html: " +
        s"diff=${(got diff want).take(2)} / ${(want diff got).take(2)}")

      val gotU = TextAnalysis.extractUrls(df, "id", "text")
        .collect()
        .map(r => (r.getString(0), r.getString(1), r.getString(2)))
        .groupBy(identity).view.mapValues(_.length).toMap
      val wantU = rows.flatMap { case (id, t) =>
        TextAnalysis.UrlRegex.r.findAllIn(t).map { u =>
          (id, u, "^https?://([^/]+)".r.findFirstMatchIn(u)
            .map(_.group(1)).getOrElse(""))
        }
      }.groupBy(identity).view.mapValues(_.length).toMap
      assert(gotU == wantU, s"trial $trial urls")
    }
  }

  test("fuzz: scriptDistribution and classifierScore match local folds") {
    for (trial <- 0 until 3) {
      val rnd = new Random(12900 + trial)
      val chars = "abXY ЖуёЁ019 .!\t"
      val rows = (0 until 8 + rnd.nextInt(12)).map { i =>
        val t: String = if (rnd.nextInt(10) == 0) null
          else (0 until rnd.nextInt(40))
            .map(_ => chars(rnd.nextInt(chars.length))).mkString
        (s"d$i", t)
      }
      val df = rnd.shuffle(rows).toDF("id", "text")
        .repartition(1 + rnd.nextInt(4))
      val got = TextAnalysis.scriptDistribution(df, "id", "text")
        .collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
          r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7),
          r.getLong(8), r.getLong(9)))
        .toSet
      val want = rows.map { case (id, t0) =>
        val t = Option(t0).getOrElse("")
        val n = t.length.toLong
        def cnt(re: String) = re.r.findAllIn(t).length.toLong
        val (la, cy, di, ws) =
          (cnt("[A-Za-z]"), cnt("[А-Яа-яЁё]"), cnt("[0-9]"), cnt("\\s"))
        val other = n - la - cy - di - ws
        def share(x: Long) = if (n > 0) x * 1000000L / n else 0L
        (id, n, la, cy, di, ws, other, share(la), share(cy), share(other))
      }.toSet
      assert(got == want, s"trial $trial script")

      val words = IndexedSeq("aa", "bb", "cc", "dd", "ee")
      val wRows = (0 until 8 + rnd.nextInt(12)).map { i =>
        (s"w$i", (0 until rnd.nextInt(12))
          .map(_ => words(rnd.nextInt(words.size))).mkString(" "))
      }
      val wDf = rnd.shuffle(wRows).toDF("id", "text")
        .repartition(1 + rnd.nextInt(4))
      val gotC = TextAnalysis.classifierScore(wDf, "id", "text")
        .collect()
        .map(r => (r.getString(0), r.getLong(1), r.getDouble(2),
          r.getBoolean(3)))
        .toSet
      val wantC = wRows.map { case (id, t) =>
        val ws = t.split(" ", -1).filter(_.nonEmpty)
          .map(w => java.lang.Long.parseLong(md5hex(w).take(4), 16) % 2001)
        if (ws.isEmpty) (id, 0L, 0.0, false)
        else {
          val sum = ws.sum
          (id, ws.length.toLong,
            math.floor((sum * 1000000L).toDouble / ws.length.toDouble)
              .toLong / 1e6,
            sum > ws.length * 1000L)
        }
      }.toSet
      assert(gotC == wantC, s"trial $trial classifier")
    }
  }

  test("fuzz: phraseSearch matches a local consecutive-subsequence count") {
    val words = IndexedSeq("aa", "bb", "cc")
    for (trial <- 0 until 4) {
      val rnd = new Random(13000 + trial)
      val phrase = (0 until 1 + rnd.nextInt(3))
        .map(_ => words(rnd.nextInt(words.size)))
      val rows = (0 until 8 + rnd.nextInt(15)).map { i =>
        (s"d$i", (0 until rnd.nextInt(15))
          .map(_ => words(rnd.nextInt(words.size))).mkString(" "))
      }
      val df = rnd.shuffle(rows).toDF("id", "text")
        .repartition(1 + rnd.nextInt(4))
      val got = TextAnalysis.phraseSearch(df, "id", "text", phrase)
        .collect().map(r => (r.getString(0), r.getLong(1))).toSet
      val want = rows.flatMap { case (id, t) =>
        val ts = t.split(" ", -1).filter(_.nonEmpty).toVector
        val hits =
          if (ts.size < phrase.size) 0
          else (0 to ts.size - phrase.size)
            .count(i => ts.slice(i, i + phrase.size) == phrase.toVector)
        if (hits > 0) Some((id, hits.toLong)) else None
      }.toSet
      assert(got == want,
        s"trial $trial (phrase=${phrase.mkString(" ")}): " +
          s"diff=${(got diff want).take(3)} / ${(want diff got).take(3)}")
    }
  }
}
