package graft.functions

/** Snowball "english" stemmer (Porter2), transcribed directly from the
  * published algorithm description (snowballstem.org English stemmer;
  * M.F. Porter, 2001 revision with the standard exceptional forms).
  *
  * The reference's word_stem wraps Snowball's generated EnglishStemmer
  * (reference: presto-main/.../scalar/WordStemFunction.java) — i.e.
  * Porter2, NOT the older 1980 Porter algorithm. Rounds 4–7 shipped
  * Porter1 as a documented approximation whose long-tail classes
  * diverge ('ties' → 'ti' vs 'tie', 'dying' → 'dy' vs 'die'); this
  * transcription closes that divergence. All of the reference's own
  * test vectors and the classic divergence classes are pinned in
  * FnSpec.
  */
object Porter2Stemmer {

  private def isVowel(c: Char): Boolean =
    c == 'a' || c == 'e' || c == 'i' || c == 'o' || c == 'u' || c == 'y'

  private val Doubles = Set("bb", "dd", "ff", "gg", "mm", "nn", "pp", "rr", "tt")
  private val LiEnding = Set('c', 'd', 'e', 'g', 'h', 'k', 'm', 'n', 'r', 't')

  /** Exceptional forms checked on the whole word before any step. */
  private val Exception1 = Map(
    "skis" -> "ski", "skies" -> "sky", "dying" -> "die", "lying" -> "lie",
    "tying" -> "tie", "idly" -> "idl", "gently" -> "gentl", "ugly" -> "ugli",
    "early" -> "earli", "only" -> "onli", "singly" -> "singl",
    "sky" -> "sky", "news" -> "news", "howe" -> "howe", "atlas" -> "atlas",
    "cosmos" -> "cosmos", "bias" -> "bias", "andes" -> "andes")

  /** Invariant forms checked after step 1a. */
  private val Exception2 = Set("inning", "outing", "canning", "herring",
    "earring", "proceed", "exceed", "succeed")

  def stem(input: String): String = {
    Exception1.get(input) match {
      case Some(s) => return s
      case None =>
    }
    if (input.length < 3) return input

    // ── prelude: strip leading apostrophe; mark consonant-y as 'Y' ──
    var w = if (input.charAt(0) == '\'') input.substring(1) else input
    val sb = new StringBuilder(w)
    if (sb.charAt(0) == 'y') sb.setCharAt(0, 'Y')
    var i = 1
    while (i < sb.length) {
      if (sb.charAt(i) == 'y' && isVowel(sb.charAt(i - 1))) sb.setCharAt(i, 'Y')
      i += 1
    }
    w = sb.toString

    // ── mark_regions: R1/R2 start positions (fixed; suffix removal only
    // ever shortens the word, so the marks stay valid) ──
    val p1 = {
      val special = Seq("gener", "commun", "arsen").find(w.startsWith)
      special match {
        case Some(p) => p.length
        case None => regionAfterVC(w, 0)
      }
    }
    val p2 = regionAfterVC(w, p1)
    def inR1(suffixStart: Int) = suffixStart >= p1
    def inR2(suffixStart: Int) = suffixStart >= p2

    // ── step 0: apostrophe endings, longest first ──
    if (w.endsWith("'s'")) w = w.dropRight(3)
    else if (w.endsWith("'s")) w = w.dropRight(2)
    else if (w.endsWith("'")) w = w.dropRight(1)

    // ── step 1a ──
    if (w.endsWith("sses")) w = w.dropRight(2)
    else if (w.endsWith("ied") || w.endsWith("ies"))
      w = if (w.length - 3 > 1) w.dropRight(2) else w.dropRight(1)
    else if (w.endsWith("ss") || w.endsWith("us")) {}
    else if (w.endsWith("s")) {
      // delete if the preceding part contains a vowel NOT immediately
      // before the s
      val stemPart = w.dropRight(1)
      if (stemPart.dropRight(1).exists(isVowel)) w = stemPart
    }

    if (Exception2.contains(w)) return w.replace('Y', 'y')

    // ── step 1b ──
    if (w.endsWith("eedly")) { if (inR1(w.length - 5)) w = w.dropRight(3) }
    else if (w.endsWith("eed")) { if (inR1(w.length - 3)) w = w.dropRight(1) }
    else {
      val suf = Seq("ingly", "edly", "ing", "ed").find(w.endsWith)
      suf.foreach { s =>
        val stemPart = w.dropRight(s.length)
        if (stemPart.exists(isVowel)) {
          w = stemPart
          if (w.endsWith("at") || w.endsWith("bl") || w.endsWith("iz")) w += "e"
          else if (w.length >= 2 && Doubles.contains(w.takeRight(2))) w = w.dropRight(1)
          else if (p1 >= w.length && endsShortSyllable(w)) w += "e"
        }
      }
    }

    // ── step 1c: y/Y → i after a non-vowel that is not the first letter ──
    if (w.length > 2 && (w.endsWith("y") || w.endsWith("Y")) &&
        !isVowel(w.charAt(w.length - 2)))
      w = w.dropRight(1) + "i"

    // ── step 2 (suffix must lie in R1); longest match wins ──
    val step2: Seq[(String, String => Option[String])] = Seq(
      "ization" -> (s => Some(s + "ize")),
      "ational" -> (s => Some(s + "ate")),
      "fulness" -> (s => Some(s + "ful")),
      "ousness" -> (s => Some(s + "ous")),
      "iveness" -> (s => Some(s + "ive")),
      "tional" -> (s => Some(s + "tion")),
      "biliti" -> (s => Some(s + "ble")),
      "lessli" -> (s => Some(s + "less")),
      "entli" -> (s => Some(s + "ent")),
      "ation" -> (s => Some(s + "ate")),
      "alism" -> (s => Some(s + "al")),
      "aliti" -> (s => Some(s + "al")),
      "ousli" -> (s => Some(s + "ous")),
      "iviti" -> (s => Some(s + "ive")),
      "fulli" -> (s => Some(s + "ful")),
      "enci" -> (s => Some(s + "ence")),
      "anci" -> (s => Some(s + "ance")),
      "abli" -> (s => Some(s + "able")),
      "izer" -> (s => Some(s + "ize")),
      "ator" -> (s => Some(s + "ate")),
      "alli" -> (s => Some(s + "al")),
      "bli" -> (s => Some(s + "ble")),
      "ogi" -> (s => if (s.endsWith("l")) Some(s + "og") else None),
      "li" -> (s => if (s.nonEmpty && LiEnding.contains(s.last)) Some(s) else None),
    )
    applyLongest(w, step2, inR1).foreach(w = _)

    // ── step 3 (suffix in R1) ──
    val step3: Seq[(String, String => Option[String])] = Seq(
      "ational" -> (s => Some(s + "ate")),
      "tional" -> (s => Some(s + "tion")),
      "alize" -> (s => Some(s + "al")),
      "icate" -> (s => Some(s + "ic")),
      "iciti" -> (s => Some(s + "ic")),
      "ative" -> (s => if (inR2(w.length - 5)) Some(s) else None),
      "ical" -> (s => Some(s + "ic")),
      "ness" -> (s => Some(s)),
      "ful" -> (s => Some(s)),
    )
    applyLongest(w, step3, inR1).foreach(w = _)

    // ── step 4 (suffix in R2) ──
    val step4: Seq[(String, String => Option[String])] = Seq(
      "ement" -> (s => Some(s)),
      "ance" -> (s => Some(s)),
      "ence" -> (s => Some(s)),
      "able" -> (s => Some(s)),
      "ible" -> (s => Some(s)),
      "ment" -> (s => Some(s)),
      "ant" -> (s => Some(s)),
      "ent" -> (s => Some(s)),
      "ism" -> (s => Some(s)),
      "ate" -> (s => Some(s)),
      "iti" -> (s => Some(s)),
      "ous" -> (s => Some(s)),
      "ive" -> (s => Some(s)),
      "ize" -> (s => Some(s)),
      "ion" -> (s =>
        if (s.nonEmpty && (s.last == 's' || s.last == 't')) Some(s) else None),
      "al" -> (s => Some(s)),
      "er" -> (s => Some(s)),
      "ic" -> (s => Some(s)),
    )
    applyLongest(w, step4, inR2).foreach(w = _)

    // ── step 5 ──
    if (w.endsWith("e")) {
      val start = w.length - 1
      if (inR2(start) || (inR1(start) && !endsShortSyllable(w.dropRight(1))))
        w = w.dropRight(1)
    } else if (w.endsWith("l") && inR2(w.length - 1) &&
        w.length >= 2 && w.charAt(w.length - 2) == 'l')
      w = w.dropRight(1)

    w.replace('Y', 'y')
  }

  /** First position after a vowel followed by a non-vowel, scanning from
    * `from`; word length when no such sequence exists.
    */
  private def regionAfterVC(w: String, from: Int): Int = {
    var i = from
    while (i < w.length && !isVowel(w.charAt(i))) i += 1
    while (i < w.length && isVowel(w.charAt(i))) i += 1
    if (i < w.length) i + 1 else w.length
  }

  /** Backwards `shortv`: ends non-vowel + vowel + non-vowel(not w/x/Y),
    * or is exactly word-initial vowel + non-vowel.
    */
  private def endsShortSyllable(w: String): Boolean = {
    val n = w.length
    if (n == 2) isVowel(w.charAt(0)) && !isVowel(w.charAt(1))
    else if (n >= 3) {
      val (a, b, c) = (w.charAt(n - 3), w.charAt(n - 2), w.charAt(n - 1))
      !isVowel(a) && isVowel(b) && !isVowel(c) && c != 'w' && c != 'x' && c != 'Y'
    } else false
  }

  /** Longest-suffix-first rule table application; the region test applies
    * to the position where the suffix starts. Returns None when no
    * suffix matched or the matched rule declined.
    */
  private def applyLongest(w: String,
      rules: Seq[(String, String => Option[String])],
      region: Int => Boolean): Option[String] = {
    rules.sortBy(-_._1.length).collectFirst {
      case (suf, f) if w.endsWith(suf) =>
        if (region(w.length - suf.length)) f(w.dropRight(suf.length)) else None
    }.flatten
  }
}
