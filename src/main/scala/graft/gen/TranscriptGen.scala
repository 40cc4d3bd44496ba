package graft.gen

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}

import graft.model.{GenTurn, Span}

/** Deterministic synthetic transcript generator + analytic goldens.
  *
  * Role: the graft's stand-in for the reference's synthetic degradation
  * generator (reference `synthetic_degradation.py:457-506`, which generates
  * degraded inputs *with metadata describing the expected outcome*). Every
  * turn's expected extraction is computed analytically at generation time —
  * goldens are defined by this spec, never by running the reference
  * (see SURVEY.md §7 "Hard parts").
  *
  * Fully deterministic and order-independent: row i's content depends only on
  * (seed, i) via a per-row RNG, so the same (n, seed) produces the same table
  * under any partitioning — the generator itself is distributed via
  * `spark.range(n).map(turnAt)` and scales to bench sizes without a
  * driver-side materialization.
  *
  * Payload classes (FIXTURES.md §2): plain / html / pdf / tooljson / blank.
  * Conversation sizing is skewed: a fixed Fibonacci-ish size pattern plus
  * periodic mega-conversations that absorb whole generator groups, to
  * exercise salting and sort-within-partitions (FIXTURES.md §1).
  */
object TranscriptGen {

  // conversation size pattern within one generator group (sums to GROUP)
  private val pattern = Array(2, 3, 5, 8, 13, 21, 34, 55, 89)
  private val GROUP = pattern.sum // 230
  private val prefix: Array[Int] = pattern.scanLeft(0)(_ + _) // len 10

  private val words: Array[String] = Array(
    "the", "quick", "brown", "fox", "jumps", "over", "lazy", "dog", "and",
    "then", "runs", "far", "away", "into", "deep", "forest", "where", "trees",
    "grow", "tall", "under", "bright", "summer", "sky", "while", "river",
    "flows", "between", "green", "hills", "toward", "distant", "mountain",
    "village", "people", "gather", "every", "morning", "market", "fresh",
    "bread", "warm", "coffee", "quiet", "street", "old", "stone", "bridge",
    "crosses", "water", "slowly", "evening", "light", "fades", "gently")

  private val toolNames =
    Array("search", "browser", "calculator", "editor", "shell")

  /** digit → confusable chars that the plain path's char-correction
    * (`translate(w,"lI|OoZzSsGgBb","1110022556988")`, SURVEY X6; mirrors
    * reference `pipeline.py:1296-1336`) maps back to the digit.
    */
  private val confusables: Map[Char, String] = Map(
    '0' -> "Oo", '1' -> "lI|", '2' -> "Zz", '5' -> "Ss",
    '6' -> "G", '8' -> "Bb", '9' -> "g")

  private val wsChoices = Array(" ", "  ", " \t", "\n", "   ", " \n ")

  // ---------------------------------------------------------------- rows

  /** Pure function (seed, i) → generated turn + golden. */
  def turnAt(i: Long, seed: Long = 42L): GenTurn = {
    val rng = new scala.util.Random(seed ^ (i * 0x9E3779B97F4A7C15L) ^ 0x5DEECE66DL)
    rng.nextLong() // warm up so low bits of i don't leak into first draws

    val (convId, turnIdx) = convOf(i)
    val ts = new Timestamp(1700000000000L + i * 1234L)

    val cls = {
      val d = rng.nextInt(100)
      if (d < 38) "plain"
      else if (d < 63) "html"
      else if (d < 78) "pdf"
      else if (d < 90) "tooljson"
      else if (d < 93) "lowconf"
      else "blank"
    }

    cls match {
      case "plain" =>
        val (raw, expected, spans) = plainPayload(rng)
        GenTurn(convId, turnIdx, roleOf(turnIdx), raw, null, ts,
          expected, "plain", "success", spans)
      case "html" =>
        val (raw, expected, spans) = htmlPayload(rng)
        GenTurn(convId, turnIdx, roleOf(turnIdx), raw, null, ts,
          expected, "html", "success", spans)
      case "pdf" =>
        val (raw, expected, spans) = pdfPayload(rng)
        GenTurn(convId, turnIdx, roleOf(turnIdx), raw, null, ts,
          expected, "pdf", "success", spans)
      case "tooljson" =>
        val tool = toolNames(rng.nextInt(toolNames.length))
        val (raw, expected, status, spans) = toolJsonPayload(rng)
        GenTurn(convId, turnIdx, "tool", raw, tool, ts,
          expected, "tooljson", status, spans)
      case "lowconf" =>
        val (raw, expected, path, spans) = lowconfPayload(rng)
        GenTurn(convId, turnIdx, roleOf(turnIdx), raw, null, ts,
          expected, path, "fallback", spans)
      case _ =>
        val raw = rng.nextInt(4) match {
          case 0 => null
          case 1 => ""
          case 2 => "   \t  \n "
          case _ => "  \t "
        }
        GenTurn(convId, turnIdx, roleOf(turnIdx), raw, null, ts,
          "", "blank", "blank", Seq.empty)
    }
  }

  private def roleOf(turnIdx: Int): String =
    if (turnIdx % 2 == 0) "user" else "assistant"

  /** Global row index → (conv_id, turn_idx). Groups of GROUP rows follow the
    * size pattern; every 13th group (offset 7) folds into one of 3
    * mega-conversations with dense, monotonically increasing turn_idx —
    * the skew fixture (FIXTURES.md §1).
    */
  private[graft] def convOf(i: Long): (String, Int) = {
    val group = i / GROUP
    val o = (i % GROUP).toInt
    if (group % 13 == 7) {
      val k = group / 13
      val mega = ((k + 1) % 3).toInt
      (s"mega-$mega", ((k / 3) * GROUP + o).toInt)
    } else {
      // find conv slot j with prefix(j) <= o < prefix(j+1)
      var j = 0
      while (prefix(j + 1) <= o) j += 1
      (f"conv-$group%06d-$j", o - prefix(j))
    }
  }

  // ---------------------------------------------------------------- plain

  /** Prose with OCR-style digit confusions in numeric tokens + irregular
    * whitespace. Expected = whitespace-collapsed text with confusions
    * corrected (mirrors reference char-correction cases
    * `pytorch_mobile/test_pipeline.py:115-121`: l23→123, O5→05, Z99→299).
    */
  private def plainPayload(rng: scala.util.Random): (String, String, Seq[Span]) = {
    val n = 5 + rng.nextInt(28)
    val rawToks = new scala.collection.mutable.ArrayBuffer[String](n)
    val expToks = new scala.collection.mutable.ArrayBuffer[String](n)
    var k = 0
    while (k < n) {
      if (rng.nextInt(100) < 18) {
        // numeric token, possibly corrupted with confusable glyphs
        val len = 1 + rng.nextInt(6)
        val digits = Array.fill(len)(('0' + rng.nextInt(10)).toChar)
        val num = new String(digits)
        val corrupt = rng.nextInt(100) < 55
        val rawTok =
          if (!corrupt) num
          else {
            val out = digits.map { d =>
              if (rng.nextInt(100) < 45 && confusables.contains(d)) {
                val cs = confusables(d); cs(rng.nextInt(cs.length))
              } else d
            }
            // keep >=1 real digit so the correction gate (rlike "[0-9]") fires
            if (!out.exists(_.isDigit)) out(0) = digits(0)
            new String(out)
          }
        rawToks += rawTok
        expToks += num
      } else {
        var w = words(rng.nextInt(words.length))
        if (rng.nextInt(100) < 12) w = w.capitalize
        if (rng.nextInt(100) < 15) w = w + (if (rng.nextBoolean()) "." else ",")
        rawToks += w
        expToks += w
      }
      k += 1
    }
    val lead = if (rng.nextInt(100) < 25) wsChoices(rng.nextInt(wsChoices.length)) else ""
    val trail = if (rng.nextInt(100) < 25) wsChoices(rng.nextInt(wsChoices.length)) else ""
    val body = rawToks.mkString(wsChoices(rng.nextInt(wsChoices.length)))
    val raw = lead + body + trail
    val expected = expToks.mkString(" ")
    (raw, expected, Seq(Span(lead.length, lead.length + body.length)))
  }

  // ---------------------------------------------------------------- tooljson

  /** Compact JSON tool result; extraction target `$.output.text`. The
    * `output` object is emitted LAST and malformed variants are truncated
    * inside the text value so any lenient streaming parse also fails —
    * exercising the fallback pass (mirrors reference low-confidence retry,
    * `pipeline.py:1989-2002`).
    */
  private def toolJsonPayload(rng: scala.util.Random): (String, String, String, Seq[Span]) = {
    val n = 4 + rng.nextInt(12)
    val content = Array.fill(n)(words(rng.nextInt(words.length))).mkString(" ")
    val k = rng.nextInt(1000)
    val pre = s"""{"ok":true,"n":$k,"output":{"text":""""
    val raw = pre + content + "\"}}"
    if (rng.nextInt(100) < 15) {
      // truncate inside the content string => guaranteed parse failure
      val cut = 4 + rng.nextInt(math.max(1, content.length / 2))
      val t = raw.dropRight(3 + cut) // removes "}}  + cut chars of content
      // expected: plain-path fallback = whitespace-collapse of trimmed raw
      val expected = t.trim.split("\\s+").mkString(" ")
      // span ends at the last non-ws char (truncation may land on a space)
      (t, expected, "fallback", Seq(Span(0, t.replaceAll("\\s+\\z", "").length)))
    } else {
      val start = pre.length
      (raw, content, "success", Seq(Span(start, start + content.length)))
    }
  }

  // ---------------------------------------------------------------- lowconf

  /** τ-ladder fixtures (reference keep-whichever-is-better retry,
    * `pipeline.py:1984-2050`): payloads that PARSE on their sniffed path
    * but at confidence below the plain alternative's 0.3, so the ladder
    * must return the plain normalization of the raw payload ("fallback").
    * Two shapes:
    *  - html whose only content block is a pure link farm (link density
    *    1 → block score floored at 1e-3; the aggressive re-parse cannot
    *    beat plain's 0.3 either) — the round-2 engine returned that
    *    near-zero-confidence block;
    *  - pdf with mostly malformed `G ` lines (run fraction < 0.3).
    * Expected = whitespace-collapse of the trimmed raw (no token is
    * digit-confusable by construction, so char correction is identity);
    * span = the whole trimmed content region.
    */
  private def lowconfPayload(rng: scala.util.Random): (String, String, String, Seq[Span]) = {
    if (rng.nextBoolean()) {
      val nl = 6 + rng.nextInt(6)
      val linkTxt = Array.fill(nl)(words(rng.nextInt(words.length)))
        .map(w => s"""<a href="#">$w</a>""").mkString(" ")
      val raw =
        s"<!doctype html><html><body>\n<div><p>$linkTxt</p></div>\n</body></html>"
      val expected = raw.split("\\s+").mkString(" ")
      (raw, expected, "html", Seq(Span(0, raw.length)))
    } else {
      val good = Array.fill(3 + rng.nextInt(4))(words(rng.nextInt(words.length)))
        .mkString(" ")
      val nBad = 3 + rng.nextInt(3) // conf = 1/(1+nBad) <= 0.25 < 0.3
      val bad = (0 until nBad)
        .map(b => s"G ${50 + b * 10} ${140 + b * 40}").mkString("\n")
      val raw = s"%PDF-SIM\nG 40 100 10 $good\n$bad"
      val expected = raw.split("\\s+").mkString(" ")
      (raw, expected, "pdf", Seq(Span(0, raw.length)))
    }
  }

  // ---------------------------------------------------------------- html

  /** Main-content paragraphs wrapped in boilerplate (nav/footer link farms,
    * comments, head/style) with inline tags and entities. Expected = decoded,
    * whitespace-collapsed text of content paragraphs (>=8 words, low link
    * density, not inside nav/header/footer/aside), joined by "\n".
    */
  private def htmlPayload(rng: scala.util.Random): (String, String, Seq[Span]) = {
    val sb = new StringBuilder
    val expected = new scala.collection.mutable.ArrayBuffer[String]
    val spans = new scala.collection.mutable.ArrayBuffer[Span]

    def link(): String = {
      val w = words(rng.nextInt(words.length)).capitalize
      s"""<a href="/${w.toLowerCase(java.util.Locale.ROOT)}">$w</a>"""
    }

    sb.append("<!doctype html><html><head><title>")
    sb.append(Array.fill(2 + rng.nextInt(3))(words(rng.nextInt(words.length))).mkString(" "))
    sb.append("</title><style>body{margin:0;font:14px sans}</style>")
    if (rng.nextBoolean())
      sb.append("<script>var x=1;if(x<2){x=3}</script>")
    sb.append("</head><body>")

    sb.append("<nav>")
    sb.append(Array.fill(3 + rng.nextInt(4))(link()).mkString(" | "))
    sb.append("</nav>")

    if (rng.nextBoolean()) {
      sb.append("<header><h1>")
      sb.append(Array.fill(2 + rng.nextInt(3))(words(rng.nextInt(words.length)).capitalize).mkString(" "))
      sb.append("</h1></header>")
    }

    sb.append("""<div class="main">""")
    val nParas = 1 + rng.nextInt(4)
    var p = 0
    while (p < nParas) {
      sb.append("<p>")
      val nW = 10 + rng.nextInt(28)
      val expWords = new scala.collection.mutable.ArrayBuffer[String](nW)
      var start = -1
      var end = -1
      var linkWords = 0
      var w = 0
      while (w < nW) {
        if (w > 0) sb.append(" ")
        val r = rng.nextInt(100)
        if (r < 8) {
          // entity-bearing token: raw "AT&amp;T" decodes to "AT&T"
          val a = words(rng.nextInt(words.length)).capitalize
          val b = words(rng.nextInt(words.length)).capitalize
          if (start < 0) start = sb.length
          sb.append(a).append("&amp;").append(b)
          end = sb.length
          expWords += s"$a&$b"
        } else if (r < 16) {
          val word = words(rng.nextInt(words.length))
          val tag = if (rng.nextBoolean()) "b" else "em"
          sb.append(s"<$tag>")
          if (start < 0) start = sb.length
          sb.append(word)
          end = sb.length
          sb.append(s"</$tag>")
          expWords += word
        } else if (r < 22 && (linkWords + 1) * 4 <= nW) {
          // short inline link; bounded so link_density stays well below 1/3
          // and the block is guaranteed KEPT by the classifier
          linkWords += 1
          val word = words(rng.nextInt(words.length))
          sb.append("""<a href="#">""")
          if (start < 0) start = sb.length
          sb.append(word)
          end = sb.length
          sb.append("</a>")
          expWords += word
        } else {
          var word = words(rng.nextInt(words.length))
          if (rng.nextInt(100) < 10) word = word.capitalize
          if (rng.nextInt(100) < 12) word = word + "."
          if (start < 0) start = sb.length
          sb.append(word)
          end = sb.length
          expWords += word
        }
        w += 1
      }
      sb.append("</p>")
      expected += expWords.mkString(" ")
      spans += Span(start, end)
      p += 1
    }
    sb.append("</div>")

    // Readability-subtree fixture: a content div of SHORT paragraphs
    // (each below the per-block word floor) that only survives via
    // container-level scoring — a flat Boilerpipe threshold drops it
    if (rng.nextInt(100) < 25) {
      sb.append("""<div class="cards">""")
      val nSmall = 4 + rng.nextInt(3)
      var q = 0
      while (q < nSmall) {
        sb.append("<p>")
        val nW = 4 + rng.nextInt(4) // 4-7 words: under MinWords=8
        val expW = new scala.collection.mutable.ArrayBuffer[String](nW)
        val start = sb.length
        var w = 0
        while (w < nW) {
          if (w > 0) sb.append(" ")
          val word = words(rng.nextInt(words.length))
          sb.append(word)
          expW += word
          w += 1
        }
        spans += Span(start, sb.length)
        sb.append("</p>")
        expected += expW.mkString(" ")
        q += 1
      }
      sb.append("</div>")
    }

    if (rng.nextBoolean())
      sb.append("<!-- boilerplate comment: ads tracking nothing to see -->")

    sb.append("<footer>")
    sb.append(Array.fill(2 + rng.nextInt(3))(link()).mkString(" "))
    sb.append(" <span>all rights reserved</span></footer>")
    sb.append("</body></html>")

    (sb.toString, expected.mkString("\n"), spans.toSeq)
  }

  // ---------------------------------------------------------------- pdf

  /** Text-encoded glyph-run payload: header "%PDF-SIM", then one run per
    * line `G <x> <y> <fontSize> <text...>`, emitted OUT of reading order.
    * Expected = lines restored by XY-cut layout analysis + reading-order
    * sort (reference analog: bbox reading-order,
    * `pytorch_mobile/ocr_pipeline.py:655-664`). Three layouts:
    *  - single column (y-band clustering only),
    *  - HTML-wrapped single column (`<div …>` before the %PDF- magic —
    *    the sniff-right-content-wrong cascade fixture),
    *  - TWO columns with an 80 px gutter: expected reading order is
    *    column-major (left column fully before right) — the recursive
    *    XY-cut fixture a 1-D y-banding would interleave.
    */
  private def pdfPayload(rng: scala.util.Random): (String, String, Seq[Span]) = {
    val variant = rng.nextInt(100) // <15 wrapped, <40 two-column, else plain
    val twoCol = variant >= 15 && variant < 40
    val wrapped = variant < 15

    // (colIdx, lineIdx, runs); run x = colBase + charOff·7
    case class Run(x: Int, y: Int, text: String)
    val maxChars = 40 // column text width cap (two-col: keeps the gutter)
    def buildCol(c: Int, nLines: Int): Seq[(Int, Int, Seq[Run])] = {
      val base = if (c == 0) 40 else 40 + maxChars * 7 + 80 // 80 px gutter
      (0 until nLines).map { li =>
        val nW = 3 + rng.nextInt(if (twoCol) 4 else 8)
        val ws0 = Array.fill(nW)(words(rng.nextInt(words.length)))
        // cap line width so a column never bleeds into the gutter
        val ws = {
          val keep = scala.collection.mutable.ArrayBuffer.empty[String]
          var len = 0
          ws0.foreach { w =>
            val add = w.length + (if (keep.nonEmpty) 1 else 0)
            if (len + add <= maxChars) { keep += w; len += add }
          }
          keep.toArray
        }
        val y = 100 + li * 40 + (rng.nextInt(9) - 4) // jitter within +-4
        val nRuns = 1 + rng.nextInt(math.min(3, ws.length))
        val cuts = (Seq(0) ++ Seq.fill(nRuns - 1)(1 + rng.nextInt(math.max(1, ws.length - 1)))
          .sorted ++ Seq(ws.length)).distinct.sorted
        val runs = cuts.sliding(2).collect { case Seq(a, b) if b > a =>
          val txt = ws.slice(a, b).mkString(" ")
          val charOff = ws.take(a).map(_.length + 1).sum
          Run(base + charOff * 7, y, txt)
        }.toSeq
        (c, li, runs)
      }
    }
    val lines: Seq[(Int, Int, Seq[Run])] =
      if (twoCol) buildCol(0, 2 + rng.nextInt(4)) ++ buildCol(1, 2 + rng.nextInt(4))
      else buildCol(0, 2 + rng.nextInt(6))

    val allRuns = lines.flatMap { case (c, li, rs) => rs.map(r => ((c, li), r)) }
    val shuffled = rng.shuffle(allRuns)

    val sb = new StringBuilder
    if (wrapped) sb.append("<div class=\"doc\">\n")
    sb.append("%PDF-SIM\n")
    val spanByKey = scala.collection.mutable.Map[((Int, Int), Int), Span]()
    shuffled.foreach { case (key, r) =>
      sb.append("G ").append(r.x).append(' ').append(r.y).append(' ')
        .append(10 + (key._2 % 3)).append(' ')
      val s = sb.length
      sb.append(r.text)
      spanByKey((key, r.x)) = Span(s, sb.length)
      sb.append('\n')
    }
    if (wrapped) sb.append("</div>")
    // reading order: column-major (XY-cut), lines top-down, runs by x
    val ordered = lines.sortBy { case (c, li, _) => (c, li) }
    val expected = ordered
      .map { case (_, _, rs) => rs.sortBy(_.x).map(_.text).mkString(" ") }
      .mkString("\n")
    val spans = ordered.flatMap { case (c, li, rs) =>
      rs.sortBy(_.x).map(r => spanByKey(((c, li), r.x)))
    }
    (sb.toString, expected, spans)
  }

  // ---------------------------------------------------------------- frames

  /** Full generated dataset (input + goldens), distributed. */
  def genDs(spark: SparkSession, n: Long, seed: Long = 42L): Dataset[GenTurn] = {
    import spark.implicits._
    spark.range(n).map(i => turnAt(i, seed))
  }

  /** Input table only — the `input_hint` shape. */
  def inputDf(spark: SparkSession, n: Long, seed: Long = 42L): DataFrame =
    genDs(spark, n, seed)
      .select("conv_id", "turn_idx", "role", "text", "tool", "ts")

  /** Golden expectations keyed by (conv_id, turn_idx). */
  def goldenDf(spark: SparkSession, n: Long, seed: Long = 42L): DataFrame =
    genDs(spark, n, seed)
      .select("conv_id", "turn_idx", "expected_text", "expected_path",
        "expected_status", "expected_spans")
}
