package graft.functions

/** The Porter stemming algorithm (M.F. Porter, "An algorithm for suffix
  * stripping", Program 14(3), 1980 — the public algorithm the reference's
  * word_stem wraps via Snowball, WordStemFunction.java; the Snowball
  * English stemmer is Porter's revision of this same algorithm and agrees
  * on the overwhelming majority of the vocabulary — FnSpec pins the
  * paper's own example table). Implemented from the paper: measure m =
  * number of VC sequences in the stem, conditions *v* (contains vowel),
  * *d (double consonant), *o (cvc, final c not w/x/y), then steps
  * 1a/1b/1c/2/3/4/5a/5b. Includes the two standard departures the
  * published reference implementation ships (bli→ble, logi→log).
  *
  * Pure function on the word's char content — registered as a long-tail
  * UDF (never on the TB-scan hot path).
  */
object PorterStemmer {

  private def isVowelAt(w: Array[Char], i: Int): Boolean = w(i) match {
    case 'a' | 'e' | 'i' | 'o' | 'u' => true
    case 'y' => i > 0 && !isVowelAt(w, i - 1)
    case _ => false
  }

  /** m = number of vowel→consonant transitions in w[0..end]. */
  private def measure(w: Array[Char], end: Int): Int = {
    var m = 0
    var i = 0
    var prevVowel = false
    while (i <= end) {
      val v = isVowelAt(w, i)
      if (prevVowel && !v) m += 1
      prevVowel = v
      i += 1
    }
    m
  }

  private def containsVowel(w: Array[Char], end: Int): Boolean =
    (0 to end).exists(isVowelAt(w, _))

  private def doubleC(w: Array[Char], end: Int): Boolean =
    end >= 1 && w(end) == w(end - 1) && !isVowelAt(w, end)

  /** *o: stem ends cvc where the final c is not w, x or y. */
  private def cvc(w: Array[Char], end: Int): Boolean =
    end >= 2 && !isVowelAt(w, end) && isVowelAt(w, end - 1) &&
      !isVowelAt(w, end - 2) &&
      w(end) != 'w' && w(end) != 'x' && w(end) != 'y'

  def stem(word: String): String = {
    if (word.length <= 2) return word
    val buf = new StringBuilder(word)

    def endsWith(s: String): Boolean =
      buf.length >= s.length && buf.substring(buf.length - s.length) == s
    def stemEnd(suffixLen: Int): Int = buf.length - suffixLen - 1
    def chars: Array[Char] = buf.toString.toCharArray
    def m(suffixLen: Int): Int = measure(chars, stemEnd(suffixLen))
    def replace(suffix: String, repl: String): Unit = {
      buf.setLength(buf.length - suffix.length)
      buf.append(repl)
    }

    // rule table walker: first matching suffix decides (longest listed
    // first, as in the paper); fires only if m(stem) > threshold
    def rules(minM: Int, table: (String, String)*): Boolean = {
      table.find { case (suf, _) => endsWith(suf) } match {
        case Some((suf, repl)) if m(suf.length) > minM =>
          replace(suf, repl); true
        case _ => false
      }
    }

    // ── Step 1a ──
    if (endsWith("sses")) replace("sses", "ss")
    else if (endsWith("ies")) replace("ies", "i")
    else if (!endsWith("ss") && endsWith("s")) replace("s", "")

    // ── Step 1b ──
    var restore = false
    if (endsWith("eed")) {
      if (m(3) > 0) replace("eed", "ee")
    } else if (endsWith("ed") && containsVowel(chars, stemEnd(2))) {
      replace("ed", ""); restore = true
    } else if (endsWith("ing") && containsVowel(chars, stemEnd(3))) {
      replace("ing", ""); restore = true
    }
    if (restore) {
      if (endsWith("at") || endsWith("bl") || endsWith("iz")) buf.append('e')
      else {
        val c = chars
        val end = buf.length - 1
        if (doubleC(c, end) && c(end) != 'l' && c(end) != 's' && c(end) != 'z')
          buf.setLength(buf.length - 1)
        else if (measure(c, end) == 1 && cvc(c, end)) buf.append('e')
      }
    }

    // ── Step 1c ──
    if (endsWith("y") && containsVowel(chars, stemEnd(1)))
      replace("y", "i")

    // ── Step 2 (m > 0) ──
    rules(0,
      "ational" -> "ate", "tional" -> "tion", "enci" -> "ence",
      "anci" -> "ance", "izer" -> "ize",
      "bli" -> "ble", // departure (paper lists abli→able)
      "alli" -> "al", "entli" -> "ent", "eli" -> "e", "ousli" -> "ous",
      "ization" -> "ize", "ation" -> "ate", "ator" -> "ate",
      "alism" -> "al", "iveness" -> "ive", "fulness" -> "ful",
      "ousness" -> "ous", "aliti" -> "al", "iviti" -> "ive",
      "biliti" -> "ble",
      "logi" -> "log") // departure

    // ── Step 3 (m > 0) ──
    rules(0,
      "icate" -> "ic", "ative" -> "", "alize" -> "al", "iciti" -> "ic",
      "ical" -> "ic", "ful" -> "", "ness" -> "")

    // ── Step 4 (m > 1) ──
    val step4 = Seq("al", "ance", "ence", "er", "ic", "able", "ible",
      "ant", "ement", "ment", "ent", "ion", "ou", "ism", "ate", "iti",
      "ous", "ive", "ize").sortBy(-_.length)
    step4.find(endsWith) match {
      case Some("ion") =>
        // (m>1 and (*S or *T)) ION → ""
        val e = stemEnd(3)
        if (m(3) > 1 && e >= 0 && (chars(e) == 's' || chars(e) == 't'))
          replace("ion", "")
      case Some(suf) if m(suf.length) > 1 => replace(suf, "")
      case _ => ()
    }

    // ── Step 5a ──
    if (endsWith("e")) {
      val mm = m(1)
      if (mm > 1) replace("e", "")
      else if (mm == 1 && !cvc(chars, stemEnd(1))) replace("e", "")
    }

    // ── Step 5b: (m > 1 and *d and *L) → single letter ──
    {
      val c = chars
      val end = buf.length - 1
      if (measure(c, end) > 1 && doubleC(c, end) && c(end) == 'l')
        buf.setLength(buf.length - 1)
    }

    buf.toString
  }
}
