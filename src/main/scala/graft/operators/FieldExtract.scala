package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** KIE field extraction — the reference pipeline's actual purpose:
  * regex fallback chains with OCR-tolerant classes, first-match-wins
  * ordering, context validation and range guards, re-expressed as pure
  * Catalyst expression chains (`coalesce(nullif(regexp_extract(...)))`)
  * with a structurally-parallel DuckDB oracle generated from the SAME
  * pattern tables (one source of truth per regex — no transcription skew).
  *
  * Reference provenance:
  *  - ENERGY_RE / CARBON_RE chains: `pipeline.py:2071-2090`
  *  - positional numeric corrections: `pipeline.py:2093-2113`
  *  - context validation (±50 window): `pipeline.py:2115-2143`
  *  - `_normalise_number`: `pipeline.py:2181-2197`
  *  - cross-field range/ratio validation: `pipeline.py:2200-2221`
  *  - text KIE (±30 context scoring): `pipeline.py:2244-2303`
  *  - word-level OCR normalization: `pipeline.py:2306-2338`
  *  - extract_fields phase ordering: `pipeline.py:2340-2380`
  *  - simple patterns + per-field confidence: `pipeline.py:2382-2436`
  *  - mobile field patterns (account/date/period/readings/peak):
  *    `pytorch_mobile/ocr_pipeline.py:883-1000`
  *
  * Scale note: the whole operator is one narrow staged projection per row —
  * zero shuffles, zero UDFs, all regexp/array expressions inside
  * whole-stage codegen. At 100 TB this runs at scan speed.
  *
  * Regex dialect: every pattern below is written in the common
  * Java-regex ∩ RE2 subset (no lookahead/lookbehind, single-digit
  * backrefs), so the identical pattern string runs in Spark (Java) and
  * DuckDB (RE2). Two deliberate re-expressions: the `(?!\s*CO2)` tail of
  * the last simple-carbon pattern is EMULATED by sentinel pre-blanking
  * ([[carbonFirstInt]] — first-match order preserved; one documented
  * residual corner involving the digit inside `CO2` itself), and
  * CARBON_ALT_RE's `(?=\s|$|kg)` becomes a consuming `(?:\s|kg|$)`.
  */
object FieldExtract {

  // ================================================================ rules

  /** (pattern, replacement-in-Java-$n-form). DuckDB side converts $n → \n
    * (RE2 rewrites take single-digit \n groups, same greedy-digit parse
    * as Java's $n, so "$11" ≡ group1+"1" in both).
    */
  type Rule = (String, String)

  /** word/char-level OCR normalization, applied case-insensitively in
    * order (reference `_preprocess_ocr_errors`, `pipeline.py:2306-2338`).
    */
  val preprocessRules: Seq[Rule] = Seq(
    """\bl(\d+)\b""" -> "1$1",
    """\bO(\d+)\b""" -> "0$1",
    """\b(\d+)l\b""" -> "$11",
    """\b(\d+)O\b""" -> "$10",
    """(\d)[gq](\d)""" -> "$1$2",
    """(\d)[oO](\d)""" -> "$10$2",
    """(\d)[Il|](\d)""" -> "$11$2",
    """(\d)[Ss](\d)""" -> "$15$2",
    """\bElectr[il]city\b""" -> "Electricity",
    """\bDuba[il]\b""" -> "Dubai",
    """\b[Cc]onsumpt[il]on\b""" -> "Consumption",
    """\b[Cc][0oO][2zZ][eE]?\b""" -> "CO2e",
    """\bcoze?\b""" -> "CO2e")

  /** positional numeric corrections, case-SENSITIVE (reference
    * `_apply_numerical_corrections`, `pipeline.py:2093-2113`).
    */
  val numericalRules: Seq[Rule] = Seq(
    """\bI(\d)""" -> "1$1",
    """(\d)I\b""" -> "$11",
    """\bO(\d)""" -> "0$1",
    """(\d)O\b""" -> "$10",
    """\bS(\d)""" -> "5$1",
    """(\d)S\b""" -> "$15",
    """(\d)[lI|](\d)""" -> "$1$2",
    """(\d)[oO](\d)""" -> "$10$2")

  private val numAlt = """(?:\d{1,3}(?:,\d{3})*|\d{2,5})"""

  /** simple electricity patterns, first-match-wins with [50,50000] guard
    * (reference `pipeline.py:2388-2402`); all case-insensitive.
    */
  val elecPatterns: Seq[String] = Seq(
    s"""\\b($numAlt)\\s*kWh""",
    s"""Electricity\\s+($numAlt)""",
    s"""($numAlt)\\s+Electricity""",
    s"""Consumption[:\\s]+($numAlt)""",
    s"""usage[:\\s]+($numAlt)""")

  /** simple carbon patterns, [10,20000] guard (`pipeline.py:2413-2434`);
    * the last pattern's `(?!\s*CO2)` tail is emulated by [[carbonFirstInt]]
    * (pre-blanking), keeping the table itself in the RE2∩Java subset.
    */
  val carbPatterns: Seq[String] = Seq(
    """(\d{1,4})\s*kg\s*CO2e?""",
    """CO2e?\s+(\d{1,4})""",
    """Carbon[^0-9]*(\d{1,4})""",
    """footprint[^0-9]*(\d{1,4})""",
    """emissions.*?CO2e.*?(\d{1,4})""",
    """(\d{1,4})\s*kg""")

  /** blanked before the bare `N kg` pattern — the `(?!\s*CO2)` emulation */
  val KgCo2Blank = """\d{1,4}\s*kg\s*CO2"""

  /** Carbon chain with the reference's `(?!\s*CO2)` lookahead emulated in
    * the RE2∩Java subset (ADVICE r2: in '5 kg CO2 ... 200 kg flour' the
    * reference's last pattern skips the CO2-adjacent 5 and extracts 200):
    * the bare `(\d{1,4})\s*kg` pattern runs against a copy with each
    * `N kg CO2` occurrence replaced by the NON-digit, NON-whitespace
    * sentinel 'x' — a bare space would let `\s*` bridge digits across the
    * removed region ('100\n5 kg CO2 kg' must NOT match 100) and the
    * sentinel blocks that. Residual divergence, documented: the
    * reference's scan can take the digit INSIDE `CO2` as its first bare-kg
    * candidate ('... CO2 kg'), whose value 2 always fails the [10,20000]
    * guard and poisons the whole (last) pattern — here that occurrence is
    * blanked, so a later in-range `M kg` can still match where the
    * reference returns null. First-match order is otherwise preserved.
    */
  def carbonFirstInt(t: Column): Column =
    coalesce(
      firstInt(t, carbPatterns.init, 10, 20000),
      firstInt(regexp_replace(t, ci(KgCo2Blank), "x"),
        Seq(carbPatterns.last), 10, 20000))

  /** advanced OCR-tolerant chains (reference `pipeline.py:2071-2090`,
    * X1/X2) — values go through `_normalise_number` (X9), no range guard
    * at this layer (the reference defines none there).
    */
  val energyChain: Seq[String] = Seq(
    """(?s)(?:consumption|consumed|usage|total|reading).*?(\d{1,4}(?:[,\s]\d{3})*)\s*k\s*W\s*h""",
    """\b(\d{2,4})\s+Electricity""",
    """\b([\dl\s,g]{1,8})\s*k\s*W\s*h""",
    """Electr[il]city\s+([dl\s,g]{1,8})\s*k?W?h?""")

  val carbonChain: Seq[String] = Seq(
    "Kg\\s*(?:CO(?:2|₂)e|co(?:2|₂)e|coze|C0Ze|C02e)\\s+([\\dl\\s,g]{1,10})",
    "(?s)Kg\\s*(?:CO(?:2|₂)?e?|co(?:2|₂)?e?|coze?|C0Ze?|C02e?).*?([\\dl\\s,g]{1,6})(?:\\s|kg|$)",
    "(?s)Kg\\s*(?:CO(?:2|₂)?e?|co(?:2|₂)?e?|coze?|C0Ze?).*?0\\.00\\s+(\\d{3})",
    """(?s)Carbon\s+emissions.*?Kg\s+CO2e.*?(\d{2,4})""",
    """AED\s+(\d{2,4})\s+0\s+kWh\s+O?\s+The\s+Carbo[mn]""",
    """(?s)(\b120\b).*?(?:carbon|footprint|carbo[mn])""",
    """(?:carbon|footprint|co2e?|c02e?|carbo[mn])[\s\S]{0,200}?(\b120\b)|\b120\b[\s\S]{0,100}?(?:carbon|footprint|co2e?|c02e?|carbo[mn])""")

  /** mobile string-field pattern chains
    * (`pytorch_mobile/ocr_pipeline.py:926-1000`).
    */
  private val dateRe = """\d{1,2}[/-]\d{1,2}[/-]\d{2,4}"""
  val accountPatterns: Seq[String] = Seq(
    """Account\s*(?:No|Number)[:\s]*(\d{8,12})""",
    """Customer\s*(?:No|Number)[:\s]*(\d{8,12})""",
    """A/C\s*No[:\s]*(\d{8,12})""")
  val billDatePatterns: Seq[String] = Seq(
    s"""Bill\\s*Date[:\\s]*($dateRe)""",
    s"""Date[:\\s]*($dateRe)""",
    s"""Issue\\s*Date[:\\s]*($dateRe)""")
  val periodPatterns: Seq[String] = Seq(
    s"""From[:\\s]*($dateRe)\\s*To[:\\s]*($dateRe)""",
    s"""Period[:\\s]*($dateRe)\\s*-\\s*($dateRe)""")
  val currentPatterns: Seq[String] = Seq(
    """Current\s*Reading[:\s]*(\d{4,8})""",
    """Present\s*Reading[:\s]*(\d{4,8})""",
    """This\s*Month[:\s]*(\d{4,8})""")
  val previousPatterns: Seq[String] = Seq(
    """Previous\s*Reading[:\s]*(\d{4,8})""",
    """Last\s*Reading[:\s]*(\d{4,8})""",
    """Last\s*Month[:\s]*(\d{4,8})""")
  val peakPatterns: Seq[String] = Seq(
    """Peak\s*Demand[:\s]*(\d{1,4}\.?\d*)\s*kW""",
    """Maximum\s*Demand[:\s]*(\d{1,4}\.?\d*)\s*kW""",
    """Max\s*kW[:\s]*(\d{1,4}\.?\d*)""")

  /** water service patterns (X5, reference `main.py:111-115`), range
    * (0.1, 10000], first-match-wins, value kept fractional.
    */
  val waterPatterns: Seq[String] = Seq(
    """water[:\s]*(\d+(?:\.\d+)?)\s*(?:m3|cubic|liters?|gallons?)""",
    """(\d+(?:\.\d+)?)\s*(?:m3|cubic\s*meters?)""")

  /** text-KIE candidate scan (`pipeline.py:2253-2256`). DELIBERATE
    * DEVIATION (reference defect, SURVEY §7 class): the reference's
    * `(.{0,30})(num)(.{0,30})` findall is broken — the greedy prefix
    * window consumes all but the LAST digit of every number (verified
    * against CPython), so its text KIE never yields a value ≥ 10 and is
    * effectively dead code; a digit-blocked prefix fails differently
    * (the digit inside "CO2e" poisons any char-window). The evident
    * intent — "numbers (including comma-separated) with surrounding
    * context" — is re-expressed token-wise: whitespace tokens that fully
    * match the number shape are candidates, context = the ±5 neighboring
    * tokens (≈ the ±30 chars), scored with the same keyword weights.
    */
  val kieNumToken: String = s"^($numAlt)$$"
  val KieCtxTokens = 5

  val elecKeywords = Seq("kwh", "electricity", "consumption", "usage", "electric", "reading")
  val carbonKeywords = Seq("co2", "carbon", "footprint", "emission", "kg", "environmental", "c02")
  val elecUnitWords = Seq("kwh", "kw", "wh", "kilowatt", "electricity")
  val elecBillWords = Seq("consumption", "usage", "reading", "total", "bill")
  val carbonUnitWords = Seq("co2", "kg", "carbon", "footprint", "emission")

  // ===================================================== Spark expressions

  private def ci(p: String): String = "(?i)" + p

  private def col2e(c: Column) =
    org.apache.spark.sql.graftbridge.ColumnBridge.expr(c)
  private def e2col(e: org.apache.spark.sql.catalyst.expressions.Expression) =
    org.apache.spark.sql.graftbridge.ColumnBridge.column(e)

  /** Apply a rule list sequentially (X7/X8) — native
    * [[graft.expressions.RegexReplaceChain]]; semantics identical to
    * chained `regexp_replace` (same Java regex engine, asserted by the
    * x05 oracle compare), but one expression node instead of 8-13 —
    * the inlined chains blew whole-stage codegen past Janino's 64 KB
    * method limit and the whole projection ran interpreted.
    */
  def applyRules(text: Column, rules: Seq[Rule], caseInsensitive: Boolean): Column =
    e2col(graft.expressions.RegexReplaceChain(col2e(text), rules, caseInsensitive))

  /** declarative spec form of [[applyRules]] (cross-checked in tests) */
  def applyRulesDeclarative(text: Column, rules: Seq[Rule],
      caseInsensitive: Boolean): Column =
    rules.foldLeft(text) { case (acc, (p, r)) =>
      regexp_replace(acc, if (caseInsensitive) ci(p) else p, r)
    }

  def preprocessOcrErrors(text: Column): Column =
    applyRules(text, preprocessRules, caseInsensitive = true)

  def numericalCorrections(text: Column): Column =
    applyRules(text, numericalRules, caseInsensitive = false)

  /** digit-string → int with an explicit length gate instead of a
    * try-cast: ANSI mode (Spark 4 default) makes a bare overflow cast
    * THROW, and the gate keeps Spark and DuckDB byte-identical on
    * pathological leading-zero strings where TRY_CAST semantics differ.
    */
  private def gatedInt(digits: Column, maxLen: Int): Column =
    when(length(digits) <= maxLen, digits).cast("int")

  /** `_normalise_number` (X9): l→1 g→9 O→0, strip non-digits, null when
    * no digits survive.
    */
  def normaliseNumber(s: Column): Column =
    gatedInt(
      nullif(regexp_replace(translate(s, "lgO", "190"), "[^0-9]", ""), lit("")),
      maxLen = 9)

  private def extractGroup(text: Column, p: String, idx: Int = 1): Column =
    nullif(regexp_extract(text, ci(p), idx), lit(""))

  /** first-match-wins int chain with per-pattern range guard: a pattern
    * whose value fails the guard falls through to the NEXT pattern
    * (mirrors the reference's `break`-only-when-in-range loops).
    * Native [[graft.expressions.FirstIntChain]].
    */
  def firstInt(text: Column, pats: Seq[String], lo: Int, hi: Int): Column =
    e2col(graft.expressions.FirstIntChain(col2e(text), pats, lo, hi, 7))

  /** declarative spec form of [[firstInt]] (cross-checked in tests) */
  def firstIntDeclarative(text: Column, pats: Seq[String], lo: Int,
      hi: Int): Column =
    coalesce(pats.map { p =>
      val v = gatedInt(translate(extractGroup(text, p), ",", ""), maxLen = 7)
      when(v.between(lo, hi), v)
    }: _*)

  /** first-match-wins string chain (no guard) —
    * native [[graft.expressions.FirstStrChain]].
    */
  def firstStr(text: Column, pats: Seq[String], idx: Int = 1): Column =
    e2col(graft.expressions.FirstStrChain(col2e(text), pats, idx))

  /** first-match-wins fractional chain with range guard (water, X5) —
    * native [[graft.expressions.FirstDoubleChain]].
    */
  def firstDouble(text: Column, pats: Seq[String], lo: Double,
      hi: Double): Column =
    e2col(graft.expressions.FirstDoubleChain(col2e(text), pats, lo, hi))

  /** X1/X2 advanced chain: first pattern whose normalised value is
    * non-null — native [[graft.expressions.NormIntChain]].
    */
  def normChain(text: Column, pats: Seq[String]): Column =
    e2col(graft.expressions.NormIntChain(col2e(text), pats, 9))

  /** declarative spec form of [[normChain]] (cross-checked in tests) */
  def normChainDeclarative(text: Column, pats: Seq[String]): Column =
    coalesce(pats.map(p => normaliseNumber(extractGroup(text, p))): _*)

  /** cross-field validation (`_validate_extraction_values`,
    * `pipeline.py:2200-2221`): vacuously true when either side is null.
    */
  def crossValid(e: Column, c: Column): Column =
    e.isNull || c.isNull ||
      (c.cast("double") / e).between(0.1, 1.0) &&
      e.between(50, 50000) && c.between(10, 20000)

  /** ±50-char context validation (`_validate_numerical_context`,
    * `pipeline.py:2115-2143`): true when the number isn't found in the
    * text at all. The reference's `(.{0,50})NUM(.{0,50})` first-match
    * window is equivalent to a ±50-char substring window around the first
    * literal occurrence of NUM (digits only — case flags and regex
    * metachars are moot), which avoids a per-row dynamic regex.
    */
  def contextValid(text: Column, num: Column, isElectricity: Boolean): Column = {
    val ns = num.cast("string")
    val pos = instr(text, ns) // 1-based, 0 when absent
    val start = greatest(pos - 50, lit(1))
    // the reference window `(.{0,50})NUM(.{0,50})` has no DOTALL, so its
    // context clips at newlines — mirror that: keep the before-window
    // past its last newline, the after-window up to its first (ADVICE r2)
    val before = regexp_replace(
      text.substr(start, pos - start), "(?s).*\n", "")
    val after = regexp_replace(
      text.substr(pos + length(ns), lit(50)), "(?s)\n.*", "")
    val ctx = lower(concat(before, after))
    val anyOf = (ws: Seq[String]) => ws.map(w => ctx.contains(w)).reduce(_ || _)
    val ok =
      if (isElectricity) anyOf(elecUnitWords) || anyOf(elecBillWords)
      else anyOf(carbonUnitWords)
    pos === 0 || ok
  }

  // --------------------------------------------------------------- text KIE

  /** Packed sort key for KIE candidate selection: one BIGINT encoding
    * (score desc, |v-center| asc, position asc, value) so `array_min`
    * replaces a struct-comparator sort identically in Spark and DuckDB.
    * Layout: (35-score)·2^48 + absdiff·2^28 + min(idx,1000)·2^18 + v,
    * with v < 2^18 (KIE values ≤ 100000). Ties resolve to the earliest
    * candidate — Python's stable sort.
    */
  private val VBits = 262144L // 2^18

  /** tokenized scan input, staged once per row */
  def kieTokens(pre: Column): Column = split(pre, "\\s+")

  /** KIE candidate key arrays for one field over the staged token array.
    * `center` is the tie-break anchor (300 for electricity, 120 for
    * carbon — `pipeline.py:2294-2300`).
    */
  private def kieKeys(toks: Column, isElectricity: Boolean): Column = {
    val (kws, lo, hi, center, boostWords) =
      if (isElectricity) (elecKeywords, 50, 50000, 300, Seq("kwh"))
      else (carbonKeywords, 10, 20000, 120, Seq("co2e", "co2", "kg"))
    // guard: sequence(1, 0) infers a DESCENDING step in Spark — an empty
    // token list must yield an empty index list, not [1, 0]
    val idxs = when(size(toks) > 0, sequence(lit(1), size(toks)))
      .otherwise(array().cast("array<int>"))
    val keys = transform(idxs, i => {
      val vs = translate(
        regexp_extract(element_at(toks, i), kieNumToken, 1), ",", "")
      val v = when(length(vs).between(1, 7), vs).cast("long")
      val lo5 = greatest(i - KieCtxTokens, lit(1))
      val ctx = lower(array_join(concat(
        slice(toks, lo5, i - lo5),
        slice(toks, i + 1, lit(KieCtxTokens))), " "))
      val score = kws.map(w => when(ctx.contains(w), 2L).otherwise(0L))
        .reduce(_ + _) +
        when(boostWords.map(w => ctx.contains(w)).reduce(_ || _), 3L).otherwise(0L)
      when(v >= 10 && v <= 100000 && score > 0 && v.between(lo, hi),
        (lit(35L) - score) * lit(1L << 48) +
          abs(v - center) * lit(1L << 28) +
          least(i.cast("long"), lit(1000L)) * lit(VBits) + v)
    })
    filter(keys, k => k.isNotNull)
  }

  /** best KIE candidate value (null when none) for one field. */
  def kieField(toks: Column, isElectricity: Boolean): Column = {
    val ks = kieKeys(toks, isElectricity)
    when(size(ks) > 0, pmod(array_min(ks), lit(VBits)).cast("int"))
  }

  // ------------------------------------------------------------- operator

  /** Full extract_fields over a text column: simple regex → conditional
    * KIE merge → field-aware re-extraction, plus the mobile string fields
    * and the X1/X2 advanced chains. One staged narrow projection.
    */
  def withFields(df: DataFrame, textCol: String = "bill"): DataFrame = {
    val t = col(textCol)
    import org.apache.spark.sql.graftbridge.ColumnBridge.{column, expr => ex}
    val staged = df
      .withColumn("__pre", preprocessOcrErrors(t))
      .withColumn("__ct", numericalCorrections(t))
      .withColumn("__se", firstInt(t, elecPatterns, 50, 50000))
      .withColumn("__sc", carbonFirstInt(t))
      // KIE candidate scan as ONE native single-pass expression (same
      // semantics as [[kieField]], which remains the declarative spec —
      // cross-checked in FieldExtractSpec; the declarative form measured
      // ~4 ms/row interpreted at sf0.1)
      .withColumn("__kie", column(graft.expressions.KieBest(ex(col("__pre")))))
      .withColumn("__ke", col("__kie.ke"))
      .withColumn("__kc", col("__kie.kc"))

    val se = col("__se"); val sc = col("__sc")
    val ke = col("__ke"); val kc = col("__kc")
    val simpleN = se.isNotNull.cast("int") + sc.isNotNull.cast("int")
    val kieN = ke.isNotNull.cast("int") + kc.isNotNull.cast("int")
    val useKie = (simpleN < 2) || !crossValid(se, sc)
    val kieValid = crossValid(ke, kc)
    val kieWins = useKie && (kieValid || kieN > simpleN)

    val merged = staged
      .withColumn("__kiewins", kieWins)
      .withColumn("__e1", when(col("__kiewins"), coalesce(ke, se)).otherwise(se))
      .withColumn("__c1", when(col("__kiewins"), coalesce(kc, sc)).otherwise(sc))
      // per-field confidence: simple defaults 0.9/0.85 (no OCR tokens,
      // `pipeline.py:2509-2510`), KIE override 0.8 validated / 0.6
      // more-complete (`pipeline.py:2355-2370`)
      .withColumn("__econf",
        when(col("__kiewins") && ke.isNotNull,
          when(kieValid, 0.8).otherwise(0.6))
          .when(col("__e1").isNotNull, 0.9))
      .withColumn("__cconf",
        when(col("__kiewins") && kc.isNotNull,
          when(kieValid, 0.8).otherwise(0.6))
          .when(col("__c1").isNotNull, 0.85))

    // phase 3: numeric corrections → re-extract → context-validated
    // override. Re-extraction chains are STAGED: each is referenced ~6×
    // downstream (null test, context window ×3, result) and would
    // otherwise re-run its 5-regex chain per reference.
    val changed = col("__ct") =!= t
    val ree = col("__ree")
    val rec = col("__rec")
    val out = merged
      .withColumn("__ree", firstInt(col("__ct"), elecPatterns, 50, 50000))
      .withColumn("__rec", carbonFirstInt(col("__ct")))
      .withColumn("electricity_kwh",
        when(changed && ree.isNotNull &&
          contextValid(col("__ct"), ree, isElectricity = true), ree)
          .otherwise(col("__e1")))
      .withColumn("carbon_kgco2e",
        when(changed && rec.isNotNull &&
          contextValid(col("__ct"), rec, isElectricity = false), rec)
          .otherwise(col("__c1")))
      .withColumn("elec_conf", col("__econf"))
      .withColumn("carbon_conf", col("__cconf"))
      .withColumn("used_kie", col("__kiewins"))
      .withColumn("valid",
        crossValid(col("electricity_kwh"), col("carbon_kgco2e")))
      .withColumn("account_number", firstStr(t, accountPatterns))
      .withColumn("bill_date", firstStr(t, billDatePatterns))
      .withColumn("billing_start_date", firstStr(t, periodPatterns, 1))
      .withColumn("billing_end_date", firstStr(t, periodPatterns, 2))
      .withColumn("current_reading", firstStr(t, currentPatterns))
      .withColumn("previous_reading", firstStr(t, previousPatterns))
      .withColumn("peak_demand", firstStr(t, peakPatterns))
      .withColumn("water_m3", firstDouble(t, waterPatterns, 0.1, 10000.0))
      .withColumn("adv_electricity", normChain(t, energyChain))
      .withColumn("adv_carbon", normChain(t, carbonChain))
    out.drop("__pre", "__ct", "__se", "__sc", "__kie", "__ke", "__kc",
      "__kiewins", "__e1", "__c1", "__econf", "__cconf", "__ree", "__rec")
  }

  /** X19 calibrated confidence fusion (`pytorch_mobile/ocr_pipeline.py:
    * 1142-1173`; no-ground-truth accuracy branch `:1135-1138`):
    * raw·0.4 + field_accuracy·0.35 + completeness·0.25, clamped to [0,1].
    *  - field_accuracy = extracted critical fields / 3 (electricity,
    *    account number, bill date — the reference's completeness-as-
    *    accuracy fallback when no golden is attached);
    *  - completeness = 0.8·critical + 0.2·optional (carbon, water,
    *    current reading), `:1150-1158`;
    *  - the processing-time quality penalty (`:1160-1162`) has no batch
    *    analog (no raster decode) → 0;
    *  - raw = the electricity engine confidence (the reference's
    *    `_ocr_confidence` carrier), 0 when absent.
    * Truthiness mirrors Python (`fields.get(f)`): numerics count when
    * non-null and non-zero, strings when non-null and non-empty.
    * `needs_review` mirrors manualVerificationRequired
    * (fused < 0.7, `ocr_pipeline.py:1261`).
    */
  def withFusedConfidence(df: DataFrame): DataFrame = {
    def num(c: Column) = (c.isNotNull && c =!= 0).cast("int")
    def str(c: Column) = (c.isNotNull && c =!= "").cast("int")
    val crit = (num(col("electricity_kwh")) + str(col("account_number")) +
      str(col("bill_date"))).cast("double") / 3.0
    val opt = (num(col("carbon_kgco2e")) + num(col("water_m3")) +
      str(col("current_reading"))).cast("double") / 3.0
    df.withColumn("raw_conf", coalesce(col("elec_conf"), lit(0.0)))
      .withColumn("field_accuracy", round(crit, 6))
      .withColumn("completeness", round(crit * 0.8 + opt * 0.2, 6))
      .withColumn("fused_conf", round(
        least(lit(1.0), greatest(lit(0.0),
          col("raw_conf") * 0.4 + crit * 0.35 +
            (crit * 0.8 + opt * 0.2) * 0.25)), 6))
      .withColumn("needs_review", col("fused_conf") < 0.7)
  }

  /** Nested utility-bill payload projection (F6's nested form;
    * `build_utility_bill_payload`, `pytorch_mobile/ocr_pipeline.py:
    * 1176-1286`; golden instance `DEWA_Utility_Bill_Extracted.json:1-63`):
    * `to_json(struct(...))` over the extracted+fused columns — a pure
    * sink-boundary projection. Deviations from the Python dict, noted:
    * conditional sections (electricity/water/emissions) are ABSENT when
    * their gating field is missing (to_json drops null structs) where the
    * reference emits `{}`; filename-derived provider detection and
    * wall-clock metadata have no batch analog (provider literal, sha256
    * of the bill text instead of the image file).
    */
  def payloadCol(billCol: Column): Column = {
    def s(c: Column) = coalesce(c, lit(""))
    def d(c: Column) = round(coalesce(c.cast("double"), lit(0.0)), 6)
    to_json(struct(
      lit("utility_bill").as("documentType"),
      struct(
        struct(
          lit("Unknown Provider").as("providerName"),
          s(col("account_number")).as("accountNumber"),
          struct(
            s(col("billing_start_date")).as("startDate"),
            s(col("billing_end_date")).as("endDate"),
            lit("Monthly").as("periodicity")).as("billingPeriod"),
          s(col("bill_date")).as("billDate")).as("billInfo"),
        struct(
          when(col("electricity_kwh").isNotNull && col("electricity_kwh") =!= 0,
            struct(
              d(col("electricity_kwh")).as("value"),
              lit("kWh").as("unit"),
              lit("measured").as("dataQuality"),
              struct(
                s(col("current_reading")).as("current"),
                s(col("previous_reading")).as("previous"),
                lit("actual").as("readingType")).as("meterReading")))
            .as("electricity"),
          when(col("water_m3").isNotNull && col("water_m3") =!= 0,
            struct(d(col("water_m3")).as("value"), lit("m3").as("unit")))
            .as("water"),
          struct(d(col("peak_demand")).as("value"), lit("kW").as("unit"))
            .as("peakDemand")).as("consumptionData"),
        when(col("carbon_kgco2e").isNotNull && col("carbon_kgco2e") =!= 0,
          struct(struct(
            struct(d(col("carbon_kgco2e")).as("value"),
              lit("kgCO2e").as("unit")).as("totalCO2e"),
            struct(d(col("carbon_kgco2e")).as("electricity")).as("breakdown"))
            .as("scope2"))).as("emissionsData"),
        struct(
          lit("United Arab Emirates").as("region"),
          lit("UAE_GRID_2024").as("gridMix"),
          lit("2024").as("year")).as("emissionFactorReference")).as("extractedData"),
      struct(
        col("fused_conf").as("confidence"),
        lit("graft_spark_expression").as("extractionMethod"),
        col("needs_review").as("manualVerificationRequired"),
        col("raw_conf").as("rawOcrConfidence")).as("validation"),
      struct(sha2(billCol, 256).as("sha256")).as("metadata")))
  }

  // ======================================================== DuckDB oracle

  private def sq(s: String) = "'" + s.replace("'", "''") + "'"
  private def sqCi(p: String) = sq("(?i)" + p)

  private def rulesSql(x: String, rules: Seq[Rule], ci: Boolean): String =
    rules.foldLeft(x) { case (acc, (p, r)) =>
      s"regexp_replace($acc, ${sq(if (ci) "(?i)" + p else p)}, ${sq(r.replace("$", "\\"))}, 'g')"
    }

  private def exGSql(x: String, p: String, i: Int = 1) =
    s"NULLIF(regexp_extract($x, ${sqCi(p)}, $i), '')"

  private def gatedIntSql(d: String, maxLen: Int) =
    s"CAST(CASE WHEN length($d) <= $maxLen THEN $d END AS INT)"

  private def firstIntSql(x: String, pats: Seq[String], lo: Int, hi: Int) =
    "COALESCE(" + pats.map { p =>
      val v = gatedIntSql(s"replace(${exGSql(x, p)}, ',', '')", 7)
      s"CASE WHEN $v BETWEEN $lo AND $hi THEN $v END"
    }.mkString(", ") + ")"

  /** twin of [[carbonFirstInt]] — note DuckDB regexp_replace needs the
    * explicit 'g' flag to blank EVERY `N kg CO2` occurrence (Spark's
    * replaces all by default).
    */
  private def carbonFirstIntSql(x: String) =
    s"COALESCE(${firstIntSql(x, carbPatterns.init, 10, 20000)}, " +
      firstIntSql(s"regexp_replace($x, ${sqCi(KgCo2Blank)}, 'x', 'g')",
        Seq(carbPatterns.last), 10, 20000) + ")"

  private def firstStrSql(x: String, pats: Seq[String], i: Int = 1) =
    "COALESCE(" + pats.map(p => exGSql(x, p, i)).mkString(", ") + ")"

  private def firstDoubleSql(x: String, pats: Seq[String], lo: Double,
      hi: Double) =
    "COALESCE(" + pats.map { p =>
      val v = s"TRY_CAST(${exGSql(x, p)} AS DOUBLE)"
      s"CASE WHEN $v >= $lo AND $v <= $hi THEN $v END"
    }.mkString(", ") + ")"

  private def normNumSql(g: String) =
    gatedIntSql(
      s"NULLIF(regexp_replace(translate($g, 'lgO', '190'), '[^0-9]', '', 'g'), '')", 9)

  private def normChainSql(x: String, pats: Seq[String]) =
    "COALESCE(" + pats.map(p => normNumSql(exGSql(x, p))).mkString(", ") + ")"

  private def crossValidSql(e: String, c: String) =
    s"($e IS NULL OR $c IS NULL OR (CAST($c AS DOUBLE)/($e) BETWEEN 0.1 AND 1.0" +
      s" AND $e BETWEEN 50 AND 50000 AND $c BETWEEN 10 AND 20000))"

  private def ctxValidSql(x: String, n: String, elec: Boolean): String = {
    val ns = s"CAST($n AS VARCHAR)"
    val pos = s"strpos($x, $ns)"
    val start = s"greatest($pos - 50, 1)"
    // newline-clipped windows — see contextValid
    val ctx = s"lower(regexp_replace(substr($x, $start, greatest($pos - $start, 0)), '(?s).*\\n', '') || " +
      s"regexp_replace(substr($x, $pos + length($ns), 50), '(?s)\\n.*', ''))"
    val words = if (elec) elecUnitWords ++ elecBillWords else carbonUnitWords
    val ok = words.map(w => s"contains($ctx, ${sq(w)})").mkString(" OR ")
    s"($pos = 0 OR $ok)"
  }

  private def kieKeysSql(elec: Boolean): String = {
    val (kws, lo, hi, center, boosts) =
      if (elec) (elecKeywords, 50, 50000, 300, Seq("kwh"))
      else (carbonKeywords, 10, 20000, 120, Seq("co2e", "co2", "kg"))
    val vs = s"replace(regexp_extract(toks[i], ${sqCi(kieNumToken)}, 1), ',', '')"
    val v = s"CAST(CASE WHEN length($vs) BETWEEN 1 AND 7 THEN $vs END AS BIGINT)"
    val ctx = s"lower(array_to_string(list_concat(" +
      s"list_slice(toks, greatest(i - $KieCtxTokens, 1), i - 1), " +
      s"list_slice(toks, i + 1, i + $KieCtxTokens)), ' '))"
    val score = kws.map(w => s"CASE WHEN contains($ctx, ${sq(w)}) THEN 2 ELSE 0 END")
      .mkString(" + ") +
      s" + CASE WHEN ${boosts.map(w => s"contains($ctx, ${sq(w)})").mkString(" OR ")} THEN 3 ELSE 0 END"
    val key = s"(35 - ($score)) * 281474976710656 + abs($v - $center) * 268435456" +
      s" + least(i, 1000) * 262144 + $v"
    val cond = s"$v >= 10 AND $v <= 100000 AND ($score) > 0 AND $v BETWEEN $lo AND $hi"
    s"list_filter(list_transform(range(1, len(toks) + 1)," +
      s" i -> CASE WHEN $cond THEN $key END), k -> k IS NOT NULL)"
  }

  /** Structurally-parallel DuckDB twin of [[withFields]] over the
    * [[graft.gen.BillGen]] synthetic bills — generated from the same
    * pattern tables as the Spark chain.
    */
  def oracle(billSql: String): String =
    s"""WITH base AS (
      SELECT doc_id, $billSql AS bill FROM documents),
    s1 AS (
      SELECT doc_id, bill,
        ${rulesSql("bill", preprocessRules, ci = true)} AS pre,
        ${rulesSql("bill", numericalRules, ci = false)} AS ct,
        ${firstIntSql("bill", elecPatterns, 50, 50000)} AS se,
        ${carbonFirstIntSql("bill")} AS sc
      FROM base),
    s2 AS (
      SELECT *, string_split_regex(pre, '\\s+') AS toks
      FROM s1),
    s3 AS (
      SELECT *, ${kieKeysSql(elec = true)} AS eks,
        ${kieKeysSql(elec = false)} AS cks
      FROM s2),
    s4 AS (
      SELECT *,
        CASE WHEN len(eks) > 0 THEN CAST(list_min(eks) % 262144 AS INT) END AS ke,
        CASE WHEN len(cks) > 0 THEN CAST(list_min(cks) % 262144 AS INT) END AS kc
      FROM s3),
    s5 AS (
      SELECT *,
        (CASE WHEN se IS NOT NULL THEN 1 ELSE 0 END
          + CASE WHEN sc IS NOT NULL THEN 1 ELSE 0 END) AS simple_n,
        (CASE WHEN ke IS NOT NULL THEN 1 ELSE 0 END
          + CASE WHEN kc IS NOT NULL THEN 1 ELSE 0 END) AS kie_n,
        ${crossValidSql("ke", "kc")} AS kie_valid
      FROM s4),
    s6 AS (
      SELECT *,
        ((simple_n < 2 OR NOT ${crossValidSql("se", "sc")})
          AND (kie_valid OR kie_n > simple_n)) AS kiewins
      FROM s5),
    s7 AS (
      SELECT *,
        CASE WHEN kiewins THEN COALESCE(ke, se) ELSE se END AS e1,
        CASE WHEN kiewins THEN COALESCE(kc, sc) ELSE sc END AS c1,
        ${firstIntSql("ct", elecPatterns, 50, 50000)} AS ree,
        ${carbonFirstIntSql("ct")} AS rec,
        (ct <> bill) AS changed
      FROM s6),
    s8 AS (
      SELECT *,
        CASE WHEN changed AND ree IS NOT NULL AND ${ctxValidSql("ct", "ree", elec = true)}
          THEN ree ELSE e1 END AS fe,
        CASE WHEN changed AND rec IS NOT NULL AND ${ctxValidSql("ct", "rec", elec = false)}
          THEN rec ELSE c1 END AS fc
      FROM s7)
    SELECT doc_id,
      fe AS electricity_kwh,
      fc AS carbon_kgco2e,
      CAST(CASE WHEN kiewins AND ke IS NOT NULL THEN (CASE WHEN kie_valid THEN 0.8 ELSE 0.6 END)
        WHEN e1 IS NOT NULL THEN 0.9 END AS DOUBLE) AS elec_conf,
      CAST(CASE WHEN kiewins AND kc IS NOT NULL THEN (CASE WHEN kie_valid THEN 0.8 ELSE 0.6 END)
        WHEN c1 IS NOT NULL THEN 0.85 END AS DOUBLE) AS carbon_conf,
      kiewins AS used_kie,
      ${crossValidSql("fe", "fc")} AS valid,
      ${firstStrSql("bill", accountPatterns)} AS account_number,
      ${firstStrSql("bill", billDatePatterns)} AS bill_date,
      ${firstStrSql("bill", periodPatterns, 1)} AS billing_start_date,
      ${firstStrSql("bill", periodPatterns, 2)} AS billing_end_date,
      ${firstStrSql("bill", currentPatterns)} AS current_reading,
      ${firstStrSql("bill", previousPatterns)} AS previous_reading,
      ${firstStrSql("bill", peakPatterns)} AS peak_demand,
      ${firstDoubleSql("bill", waterPatterns, 0.1, 10000.0)} AS water_m3,
      ${normChainSql("bill", energyChain)} AS adv_electricity,
      ${normChainSql("bill", carbonChain)} AS adv_carbon
    FROM s8 ORDER BY doc_id"""

  /** shared inner frame (raw_conf / crit / opt + the clamped fused
    * composite over [[oracle]]) — the SINGLE source of the
    * fused-confidence arithmetic for both [[fusedOracle]] and
    * [[payloadOracle]]: this SQL is the bit-for-bit parity contract
    * with [[withFusedConfidence]] (same truthiness tests, same
    * left-associated arithmetic, so the doubles match bit-for-bit),
    * and a drifted second copy would break the byte-exact payload
    * compare while x09 still passed.
    */
  private def fusedFrameSql(billSql: String): String =
    s"""SELECT *, round(LEAST(1.0, GREATEST(0.0,
        raw_conf*0.4 + crit*0.35 + (crit*0.8 + opt*0.2)*0.25)), 6) AS fused
      FROM (
        SELECT *, COALESCE(elec_conf, 0.0) AS raw_conf,
          (CAST(electricity_kwh IS NOT NULL AND electricity_kwh <> 0 AS INT)
           + CAST(account_number IS NOT NULL AND account_number <> '' AS INT)
           + CAST(bill_date IS NOT NULL AND bill_date <> '' AS INT)) / 3.0 AS crit,
          (CAST(carbon_kgco2e IS NOT NULL AND carbon_kgco2e <> 0 AS INT)
           + CAST(water_m3 IS NOT NULL AND water_m3 <> 0 AS INT)
           + CAST(current_reading IS NOT NULL AND current_reading <> '' AS INT)) / 3.0 AS opt
        FROM (${oracle(billSql)}))"""

  /** DuckDB twin of [[withFusedConfidence]]: projects [[fusedFrameSql]]
    * to the x09 output shape.
    */
  def fusedOracle(billSql: String): String =
    s"""SELECT doc_id, raw_conf,
      round(crit, 6) AS field_accuracy,
      round(crit*0.8 + opt*0.2, 6) AS completeness,
      fused AS fused_conf,
      fused < 0.7 AS needs_review
    FROM (${fusedFrameSql(billSql)})
    ORDER BY doc_id"""

  /** DuckDB twin of [[payloadCol]] layered over [[oracle]] + the
    * [[fusedOracle]] arithmetic: the SAME nested JSON assembled by
    * string concatenation — Spark `to_json` field order, null-field
    * omission (electricity / water / emissionsData present only when
    * their value is non-null and non-zero), Jackson double rendering
    * (every embedded numeric is either an integer-valued double, which
    * both engines print as "N.0", or one of the bit-identical fused
    * confidence doubles) and sha256 over the byte-identical bill.
    * Verified byte-exact per row against the Spark output at sf0.001
    * and sf0.01.
    */
  def payloadOracle(billSql: String): String = {
    def str(c: String) = s"coalesce($c, '')"
    def num(c: String) =
      s"CAST(round(coalesce(CAST($c AS DOUBLE), 0.0), 6) AS VARCHAR)"
    s"""WITH t AS (${fusedFrameSql(billSql)}),
    b AS (SELECT doc_id, sha256(CAST($billSql AS VARCHAR)) AS sha
          FROM documents)
    SELECT t.doc_id,
      '{"documentType":"utility_bill","extractedData":{"billInfo":{"providerName":"Unknown Provider","accountNumber":"'
      || ${str("account_number")} || '","billingPeriod":{"startDate":"'
      || ${str("billing_start_date")} || '","endDate":"'
      || ${str("billing_end_date")}
      || '","periodicity":"Monthly"},"billDate":"' || ${str("bill_date")}
      || '"},"consumptionData":{'
      || CASE WHEN electricity_kwh IS NOT NULL AND electricity_kwh <> 0 THEN
           '"electricity":{"value":' || ${num("electricity_kwh")}
           || ',"unit":"kWh","dataQuality":"measured","meterReading":{"current":"'
           || ${str("current_reading")} || '","previous":"'
           || ${str("previous_reading")} || '","readingType":"actual"}},'
         ELSE '' END
      || CASE WHEN water_m3 IS NOT NULL AND water_m3 <> 0 THEN
           '"water":{"value":' || ${num("water_m3")} || ',"unit":"m3"},'
         ELSE '' END
      || '"peakDemand":{"value":' || ${num("peak_demand")}
      || ',"unit":"kW"}}'
      || CASE WHEN carbon_kgco2e IS NOT NULL AND carbon_kgco2e <> 0 THEN
           ',"emissionsData":{"scope2":{"totalCO2e":{"value":'
           || ${num("carbon_kgco2e")} || ',"unit":"kgCO2e"},"breakdown":{"electricity":'
           || ${num("carbon_kgco2e")} || '}}}'
         ELSE '' END
      || ',"emissionFactorReference":{"region":"United Arab Emirates","gridMix":"UAE_GRID_2024","year":"2024"}},"validation":{"confidence":'
      || CAST(fused AS VARCHAR)
      || ',"extractionMethod":"graft_spark_expression","manualVerificationRequired":'
      || CASE WHEN fused < 0.7 THEN 'true' ELSE 'false' END
      || ',"rawOcrConfidence":' || CAST(raw_conf AS VARCHAR)
      || '},"metadata":{"sha256":"' || sha || '"}}' AS payload
    FROM t JOIN b USING (doc_id) ORDER BY doc_id"""
  }
}
