package graft.functions

/** Snowball stemmers for the non-English languages the reference's
  * word_stem dispatches to (WordStemFunction.java STEMMERS — Snowball's
  * generated programs), transcribed from the published algorithm
  * descriptions at snowballstem.org (French, Spanish, Portuguese,
  * Italian, German — the languages the reference's own test corpus
  * exercises; the remaining Snowball languages stay loud
  * "Unknown stemmer language" errors as before).
  *
  * Shared machinery: the standard R1/R2 regions (the region after the
  * first non-vowel following a vowel, applied twice) and the Romance
  * RV region. Each stemmer follows its spec's step structure; suffix
  * tables are transcribed in longest-match order per the spec's
  * "search for the longest among the following suffixes" discipline.
  */
object SnowballStemmers {

  // ── shared region helpers ─────────────────────────────────────────────

  private def r1r2(w: String, isVowel: Char => Boolean): (Int, Int) = {
    def regionAfter(from: Int): Int = {
      var i = from
      // first vowel
      while (i < w.length && !isVowel(w.charAt(i))) i += 1
      // then first non-vowel
      while (i < w.length && isVowel(w.charAt(i))) i += 1
      math.min(i + 1, w.length)
    }
    val r1 = regionAfter(0)
    val r2 = regionAfter(r1)
    (r1, r2)
  }

  /** Romance RV: if the second letter is a consonant, RV is after the
    * next following vowel; if the first two letters are vowels, RV is
    * after the next consonant; otherwise (consonant-vowel) RV is after
    * the third letter; end of word when not found.
    */
  private def romanceRv(w: String, isVowel: Char => Boolean): Int = {
    if (w.length < 3) return w.length
    if (!isVowel(w.charAt(1))) {
      var i = 2
      while (i < w.length && !isVowel(w.charAt(i))) i += 1
      math.min(i + 1, w.length)
    } else if (isVowel(w.charAt(0)) && isVowel(w.charAt(1))) {
      var i = 2
      while (i < w.length && isVowel(w.charAt(i))) i += 1
      math.min(i + 1, w.length)
    } else 3
  }

  /** Longest suffix of `w` from `sufs` whose start is >= `region`. */
  private def longest(w: String, region: Int, sufs: Seq[String]): Option[String] =
    sufs.sortBy(-_.length).find(s => w.endsWith(s) && w.length - s.length >= region)

  /** Longest suffix of `w` from `sufs` (no region check). */
  private def longestAny(w: String, sufs: Seq[String]): Option[String] =
    sufs.sortBy(-_.length).find(w.endsWith)

  // ── Spanish ───────────────────────────────────────────────────────────

  private val esVowels = "aeiouáéíóúü".toSet
  def spanish(input: String): String = {
    var w = input
    val isV = (c: Char) => esVowels(c)
    def rv = romanceRv(w, isV)
    def r12 = r1r2(w, isV)

    // step 0: attached pronoun
    val pronouns = Seq("selas", "selos", "sela", "selo", "las", "les",
      "los", "nos", "me", "se", "la", "le", "lo")
    longestAny(w, pronouns).foreach { p =>
      val base = w.dropRight(p.length)
      val rvS = romanceRv(w, isV)
      val precA = Seq("iéndo", "ándo", "ár", "ér", "ír")
      val precB = Seq("ando", "iendo", "ar", "er", "ir")
      val aHit = precA.find(a => base.endsWith(a) && base.length - a.length >= rvS)
      val bHit = precB.find(b => base.endsWith(b) && base.length - b.length >= rvS)
      if (aHit.isDefined) {
        // delete pronoun, remove the acute accent from the preceding form
        val deacc = Map('á' -> 'a', 'é' -> 'e', 'í' -> 'i', 'ó' -> 'o', 'ú' -> 'u')
        w = base.map(c => deacc.getOrElse(c, c))
      } else if (bHit.isDefined ||
          (base.endsWith("yendo") && base.dropRight(5).endsWith("u") &&
            base.length - 5 >= rvS))
        w = base
    }

    val before1 = w
    // step 1: standard suffixes
    val (r1, r2) = r12
    def inR2(s: String) = w.endsWith(s) && w.length - s.length >= r2
    def inR1(s: String) = w.endsWith(s) && w.length - s.length >= r1
    val g1 = Seq("amientos", "imientos", "amiento", "imiento", "anzas",
      "ismos", "ables", "ibles", "istas", "anza", "icos", "icas", "ismo",
      "able", "ible", "ista", "osos", "osas", "ico", "ica", "oso", "osa")
    val g2 = Seq("adoras", "adores", "aciones", "adora", "ación", "antes",
      "ancias", "ador", "ante", "ancia")
    if (g1.exists(inR2)) w = w.dropRight(g1.filter(inR2).maxBy(_.length).length)
    else if (g2.exists(inR2)) {
      w = w.dropRight(g2.filter(inR2).maxBy(_.length).length)
      if (inR2("ic")) w = w.dropRight(2)
    }
    else if (inR2("logías")) w = w.dropRight(6) + "log"
    else if (inR2("logía")) w = w.dropRight(5) + "log"
    else if (inR2("uciones")) w = w.dropRight(7) + "u"
    else if (inR2("ución")) w = w.dropRight(5) + "u"
    else if (inR2("encias")) w = w.dropRight(6) + "ente"
    else if (inR2("encia")) w = w.dropRight(5) + "ente"
    else if (inR1("amente")) {
      w = w.dropRight(6)
      if (inR2("iv")) { w = w.dropRight(2); if (inR2("at")) w = w.dropRight(2) }
      else Seq("os", "ic", "ad").find(inR2).foreach(s => w = w.dropRight(s.length))
    }
    else if (inR2("mente")) {
      w = w.dropRight(5)
      Seq("ante", "able", "ible").find(inR2).foreach(s => w = w.dropRight(s.length))
    }
    else if (inR2("idades")) {
      w = w.dropRight(6)
      Seq("abil", "ic", "iv").find(inR2).foreach(s => w = w.dropRight(s.length))
    }
    else if (inR2("idad")) {
      w = w.dropRight(4)
      Seq("abil", "ic", "iv").find(inR2).foreach(s => w = w.dropRight(s.length))
    }
    else if (Seq("ivas", "ivos", "iva", "ivo").exists(inR2)) {
      w = w.dropRight(Seq("ivas", "ivos", "iva", "ivo").filter(inR2).maxBy(_.length).length)
      if (inR2("at")) w = w.dropRight(2)
    }

    if (w == before1) {
      // step 2a: verb suffixes beginning y, preceded by u
      val ys = Seq("yeron", "yendo", "yamos", "yais", "yan", "yen", "yes",
        "yas", "ye", "yo", "ya", "yó")
      val hit2a = longest(w, rv, ys).filter(s => w.dropRight(s.length).endsWith("u"))
      hit2a match {
        case Some(s) => w = w.dropRight(s.length)
        case None =>
          // step 2b: verb suffixes
          val guGroup = Seq("emos", "éis", "en", "es")
          val plain = Seq("aríamos", "eríamos", "iríamos", "iéramos",
            "iésemos", "aríais", "aseis", "eríais", "iríais", "ieseis",
            "asteis", "isteis", "ábamos", "áramos", "ásemos", "arían",
            "arías", "aréis", "erían", "erías", "eréis", "irían", "irías",
            "iréis", "ierais", "ieran", "iesen", "ieron", "iendo", "ieras",
            "ieses", "abais", "arais", "aremos", "eremos", "iremos",
            "asen", "ases", "arán", "arás", "aría", "erán", "erás",
            "ería", "irán", "irás", "iría", "iera", "iese", "aste",
            "iste", "aban", "aran", "aron", "ando", "abas", "adas",
            "idas", "aras", "íais", "ados", "idos", "amos", "íamos",
            "imos", "ará", "aré", "erá", "eré", "irá", "iré", "aba",
            "ada", "ida", "ara", "ase", "ían", "ado", "ido", "ías",
            "áis", "ía", "ad", "ed", "id", "an", "ió", "ar", "er",
            "ir", "as", "ís")
          val gHit = longest(w, rv, guGroup)
          val pHit = longest(w, rv, plain)
          (gHit, pHit) match {
            case (Some(g), p) if p.forall(_.length <= g.length) =>
              w = w.dropRight(g.length)
              if (w.endsWith("gu")) w = w.dropRight(1)
            case (_, Some(p)) => w = w.dropRight(p.length)
            case _ =>
          }
      }
    }

    // step 3: residual suffix
    val res1 = Seq("os", "a", "o", "á", "í", "ó")
    longest(w, rv, res1) match {
      case Some(s) => w = w.dropRight(s.length)
      case None =>
        longest(w, rv, Seq("e", "é")).foreach { s =>
          w = w.dropRight(s.length)
          if (w.endsWith("gu") && w.length - 1 >= rv) w = w.dropRight(1)
        }
    }
    val deacc = Map('á' -> 'a', 'é' -> 'e', 'í' -> 'i', 'ó' -> 'o', 'ú' -> 'u')
    w.map(c => deacc.getOrElse(c, c))
  }

  // ── Portuguese ────────────────────────────────────────────────────────

  private val ptVowels = "aeiouáéíóúâêô".toSet
  def portuguese(input: String): String = {
    // ã/õ are treated as vowel + consonant: mark as a~ / o~
    var w = input.replace("ã", "a~").replace("õ", "o~")
    val isV = (c: Char) => ptVowels(c)
    val rv = romanceRv(w, isV)
    val (r1, r2) = r1r2(w, isV)
    def inR2(s: String) = w.endsWith(s) && w.length - s.length >= r2
    def inR1(s: String) = w.endsWith(s) && w.length - s.length >= r1
    def inRV(s: String) = w.endsWith(s) && w.length - s.length >= rv

    val before1 = w
    // step 1: standard suffixes
    val g1 = Seq("amentos", "imentos", "amento", "imento", "adoras",
      "adores", "aço~es", "ismos", "istas", "adora", "aça~o", "antes",
      "ância", "ezas", "icos", "icas", "ismo", "ável", "ível", "ista",
      "osos", "osas", "ador", "ante", "eza", "ico", "ica", "oso", "osa")
    if (g1.exists(inR2)) w = w.dropRight(g1.filter(inR2).maxBy(_.length).length)
    else if (inR2("logías") || inR2("logias"))
      w = w.dropRight(6) + "log"
    else if (inR2("logía") || inR2("logia")) w = w.dropRight(5) + "log"
    else if (inR2("uço~es")) w = w.dropRight(6) + "u"
    else if (inR2("uça~o")) w = w.dropRight(5) + "u"
    else if (inR2("ências")) w = w.dropRight(6) + "ente"
    else if (inR2("ência")) w = w.dropRight(5) + "ente"
    else if (inR1("amente")) {
      w = w.dropRight(6)
      if (inR2("iv")) { w = w.dropRight(2); if (inR2("at")) w = w.dropRight(2) }
      else Seq("os", "ic", "ad").find(inR2).foreach(s => w = w.dropRight(s.length))
    }
    else if (inR2("mente")) {
      w = w.dropRight(5)
      Seq("ante", "avel", "ível").find(inR2).foreach(s => w = w.dropRight(s.length))
    }
    else if (inR2("idades")) {
      w = w.dropRight(6)
      Seq("abil", "ic", "iv").find(inR2).foreach(s => w = w.dropRight(s.length))
    }
    else if (inR2("idade")) {
      w = w.dropRight(5)
      Seq("abil", "ic", "iv").find(inR2).foreach(s => w = w.dropRight(s.length))
    }
    else if (Seq("ivas", "ivos", "iva", "ivo").exists(inR2)) {
      w = w.dropRight(Seq("ivas", "ivos", "iva", "ivo").filter(inR2).maxBy(_.length).length)
      if (inR2("at")) w = w.dropRight(2)
    }
    else if ((inRV("iras") || inRV("ira")) &&
        w.dropRight(if (w.endsWith("iras")) 4 else 3).endsWith("e")) {
      w = w.dropRight(if (w.endsWith("iras")) 4 else 3) + "ir"
    }

    // step 2: verb suffixes (only if step 1 did nothing)
    if (w == before1) {
      val verbs = Seq("aríamos", "eríamos", "iríamos", "ássemos",
        "êssemos", "íssemos", "aríeis", "eríeis", "iríeis", "ásseis",
        "ésseis", "ísseis", "áramos", "éramos", "íramos", "ávamos",
        "aremos", "eremos", "iremos", "ariam", "eriam", "iriam",
        "assem", "essem", "issem", "ara~o", "era~o", "ira~o", "arias",
        "erias", "irias", "ardes", "erdes", "irdes", "asses", "esses",
        "isses", "astes", "estes", "istes", "áreis", "areis", "éreis",
        "ereis", "íreis", "ireis", "ariam", "aria", "eria", "iria",
        "asse", "esse", "isse", "aste", "este", "iste", "arei", "erei",
        "irei", "aram", "eram", "iram", "avam", "arem", "erem", "irem",
        "ando", "endo", "indo", "adas", "idas", "arás", "aras", "erás",
        "eras", "irás", "avas", "ares", "eres", "ires", "íeis", "ados",
        "idos", "ámos", "amos", "emos", "imos", "iras", "ada", "ida",
        "ará", "ara", "erá", "era", "irá", "ava", "iam", "ado", "ido",
        "ias", "ais", "eis", "ira", "ia", "ei", "am", "em", "ar", "er",
        "ir", "as", "es", "is", "eu", "iu", "ou")
      longest(w, rv, verbs).foreach(s => w = w.dropRight(s.length))
      // step 4 (residual suffix — only if steps 1 AND 2 did nothing)
      if (w == before1)
        longest(w, rv, Seq("os", "a", "i", "o", "á", "í", "ó"))
          .foreach(s => w = w.dropRight(s.length))
    }
    // step 3: if changed, final i preceded by c in RV → delete
    if (w != before1 && w.endsWith("ci") && w.length - 1 >= rv)
      w = w.dropRight(1)

    // step 5: final e/é/ê in RV; gu/ci undouble
    longest(w, rv, Seq("e", "é", "ê")).foreach { s =>
      w = w.dropRight(s.length)
      if ((w.endsWith("gu") || w.endsWith("ci")) && w.length - 1 >= rv)
        w = w.dropRight(1)
    }
    if (w.endsWith("ç")) w = w.dropRight(1) + "c"
    w.replace("a~", "ã").replace("o~", "õ")
  }

  // ── Italian ───────────────────────────────────────────────────────────

  private val itVowels = "aeiouàèìòù".toSet
  def italian(input: String): String = {
    // acute → grave; u/i between vowels uppercase (consonant markers)
    var w = input.map {
      case 'á' => 'à'; case 'é' => 'è'; case 'í' => 'ì'
      case 'ó' => 'ò'; case 'ú' => 'ù'; case c => c
    }
    val chars = w.toCharArray
    for (i <- 1 until chars.length - 1) {
      if ((chars(i) == 'u' || chars(i) == 'i') &&
          itVowels(chars(i - 1)) && itVowels(chars(i + 1)))
        chars(i) = chars(i).toUpper
      if (chars(i) == 'u' && chars(i - 1) == 'q') chars(i) = 'U'
    }
    w = new String(chars)
    val isV = (c: Char) => itVowels(c)
    val rv = romanceRv(w, isV)
    val (r1, r2) = r1r2(w, isV)
    def inR2(s: String) = w.endsWith(s) && w.length - s.length >= r2
    def inR1(s: String) = w.endsWith(s) && w.length - s.length >= r1
    def inRV(s: String) = w.endsWith(s) && w.length - s.length >= rv

    // step 0: attached pronoun after ando/endo (delete) or ar/er/ir (→e)
    val pron = Seq("gliela", "gliele", "glieli", "glielo", "gliene",
      "sene", "mela", "mele", "meli", "melo", "mene", "tela", "tele",
      "teli", "telo", "tene", "cela", "cele", "celi", "celo", "cene",
      "vela", "vele", "veli", "velo", "vene", "gli", "ci", "la", "le",
      "li", "lo", "mi", "ne", "si", "ti", "vi")
    longestAny(w, pron).foreach { p =>
      val base = w.dropRight(p.length)
      if ((base.endsWith("ando") || base.endsWith("endo")) &&
          base.length - 4 >= rv) w = base
      else if (Seq("ar", "er", "ir").exists(s =>
          base.endsWith(s) && base.length - s.length >= rv)) w = base + "e"
    }

    val before1 = w
    // step 1: standard suffixes
    val g1 = Seq("atrici", "atrice", "abile", "abili", "ibile", "ibili",
      "mente", "anze", "anza", "iche", "ichi", "ismo", "ismi", "ista",
      "iste", "isti", "istà", "istè", "istì", "ante", "anti", "oso",
      "osa", "osi", "ose", "ico", "ica", "ici")
    val g2 = Seq("azione", "azioni", "atore", "atori")
    if (Seq("amento", "amenti", "imento", "imenti").exists(inRV))
      w = w.dropRight(6)
    else if (g2.exists(inR2)) {
      w = w.dropRight(g2.filter(inR2).maxBy(_.length).length)
      if (inR2("ic")) w = w.dropRight(2)
    }
    else if (g1.exists(inR2)) w = w.dropRight(g1.filter(inR2).maxBy(_.length).length)
    else if (inR2("logia") || inR2("logie")) w = w.dropRight(5) + "log"
    else if (Seq("uzione", "uzioni", "usione", "usioni").exists(inR2))
      w = w.dropRight(6) + "u"
    else if (inR2("enza") || inR2("enze")) w = w.dropRight(4) + "ente"
    else if (inR1("amente")) {
      w = w.dropRight(6)
      if (inR2("iv")) { w = w.dropRight(2); if (inR2("at")) w = w.dropRight(2) }
      else Seq("os", "ic", "abil").find(inR2).foreach(s => w = w.dropRight(s.length))
    }
    else if (inR2("ità")) {
      w = w.dropRight(3)
      Seq("abil", "ic", "iv").find(inR2).foreach(s => w = w.dropRight(s.length))
    }
    else if (Seq("ivo", "iva", "ivi", "ive").exists(inR2)) {
      w = w.dropRight(3)
      if (inR2("at")) {
        w = w.dropRight(2)
        if (inR2("ic")) w = w.dropRight(2)
      }
    }

    // step 2: verb suffixes (only if step 1 did nothing)
    if (w == before1) {
      val verbs = Seq("erebbero", "irebbero", "assero", "assimo",
        "eranno", "erebbe", "eremmo", "ereste", "eresti", "essero",
        "iranno", "irebbe", "iremmo", "ireste", "iresti", "iscano",
        "iscono", "issero", "arono", "avamo", "avano", "avate",
        "eremo", "erete", "erono", "evamo", "evano", "evate", "iremo",
        "irete", "irono", "ivamo", "ivano", "ivate", "ammo", "ando",
        "asse", "assi", "emmo", "enda", "ende", "endi", "endo", "erai",
        "erei", "Yamo", "iamo", "immo", "irai", "irei", "isca", "isce",
        "isci", "isco", "ano", "are", "ata", "ate", "ati", "ato", "ava",
        "avi", "avo", "erà", "ere", "erò", "ete", "eva", "evi", "evo",
        "irà", "ire", "irò", "ita", "ite", "iti", "ito", "iva", "ivi",
        "ivo", "ono", "uta", "ute", "uti", "uto", "ar", "ir")
      longest(w, rv, verbs).foreach(s => w = w.dropRight(s.length))
    }

    // step 3a: final vowel (and a following i) in RV
    longest(w, rv, Seq("a", "e", "i", "o", "à", "è", "ì", "ò")).foreach { s =>
      w = w.dropRight(1)
      if (w.endsWith("i") && w.length - 1 >= rv) w = w.dropRight(1)
    }
    // step 3b: ch/gh → c/g in RV
    if ((w.endsWith("ch") || w.endsWith("gh")) && w.length - 1 >= rv)
      w = w.dropRight(1)
    w.toLowerCase
  }

  // ── French ────────────────────────────────────────────────────────────

  private val frVowels = "aeiouyâàëéêèïîôûù".toSet
  def french(input: String): String = {
    // markers: u/i between vowels, y next to a vowel, u after q
    val cs = input.toCharArray
    for (i <- cs.indices) {
      val prevV = i > 0 && frVowels(cs(i - 1).toLower)
      val nextV = i < cs.length - 1 && frVowels(cs(i + 1).toLower)
      cs(i) match {
        case 'u' | 'i' if prevV && nextV => cs(i) = cs(i).toUpper
        case 'y' if prevV || nextV => cs(i) = 'Y'
        case 'u' if i > 0 && cs(i - 1) == 'q' => cs(i) = 'U'
        case _ =>
      }
    }
    var w = new String(cs)
    val isV = (c: Char) => frVowels(c) // uppercase markers are consonants
    val rv = {
      if (w.length < 3) w.length
      else if (isV(w.charAt(0)) && isV(w.charAt(1))) 3
      else {
        // after the first vowel not at the start
        var i = 1
        while (i < w.length && !isV(w.charAt(i))) i += 1
        math.min(i + 1, w.length)
      }
    }
    val (r1, r2) = r1r2(w, isV)
    def inR2(s: String) = w.endsWith(s) && w.length - s.length >= r2
    def inR1(s: String) = w.endsWith(s) && w.length - s.length >= r1
    def inRV(s: String) = w.endsWith(s) && w.length - s.length >= rv

    val before1 = w
    var step1MentFound = false
    // step 1: standard suffixes (longest-match discipline per the spec)
    val g1 = Seq("issements", "issement", "atrices", "atrice", "ateurs",
      "ations", "logies", "usions", "utions", "ements", "amment",
      "emment", "ments", "ances", "iqUes", "ismes", "ables", "istes",
      "ateur", "ation", "logie", "usion", "ution", "ences", "ement",
      "euses", "ment", "ance", "iqUe", "isme", "able", "iste", "ence",
      "ités", "ives", "eaux", "euse", "eux", "ité", "ive", "ifs", "aux",
      "if")
    longestAny(w, g1) match {
      case Some(s) => s match {
        case "ance" | "iqUe" | "isme" | "able" | "iste" | "eux" |
             "ances" | "iqUes" | "ismes" | "ables" | "istes" =>
          if (inR2(s)) w = w.dropRight(s.length)
        case "atrice" | "ateur" | "ation" | "atrices" | "ateurs" | "ations" =>
          if (inR2(s)) {
            w = w.dropRight(s.length)
            if (inR2("ic")) w = w.dropRight(2)
            else if (w.endsWith("ic")) w = w.dropRight(2) + "iqU"
          }
        case "logie" | "logies" => if (inR2(s)) w = w.dropRight(s.length) + "log"
        case "usion" | "ution" | "usions" | "utions" =>
          if (inR2(s)) w = w.dropRight(s.length) + "u"
        case "ence" | "ences" => if (inR2(s)) w = w.dropRight(s.length) + "ent"
        case "ement" | "ements" =>
          if (inRV(s)) {
            w = w.dropRight(s.length)
            if (inR2("iv")) { w = w.dropRight(2); if (inR2("at")) w = w.dropRight(2) }
            else if (inR2("eus")) w = w.dropRight(3)
            else if (inR1("eus") && w.endsWith("eus")) w = w.dropRight(3) + "eux"
            else if (inR2("abl") || inR2("iqU"))
              w = w.dropRight(3)
            else if (inRV("ièr")) w = w.dropRight(3) + "i"
            else if (inRV("Ièr")) w = w.dropRight(3) + "i"
          }
        case "ité" | "ités" =>
          if (inR2(s)) {
            w = w.dropRight(s.length)
            if (inR2("abil")) w = w.dropRight(4)
            else if (w.endsWith("abil")) w = w.dropRight(4) + "abl"
            else if (inR2("ic")) w = w.dropRight(2)
            else if (w.endsWith("ic")) w = w.dropRight(2) + "iqU"
            else if (inR2("iv")) w = w.dropRight(2)
          }
        case "if" | "ive" | "ifs" | "ives" =>
          if (inR2(s)) {
            w = w.dropRight(s.length)
            if (inR2("at")) {
              w = w.dropRight(2)
              if (inR2("ic")) w = w.dropRight(2)
              else if (w.endsWith("ic")) w = w.dropRight(2) + "iqU"
            }
          }
        case "eaux" => w = w.dropRight(4) + "eau"
        case "aux" => if (inR1(s)) w = w.dropRight(3) + "al"
        case "euse" | "euses" =>
          if (inR2(s)) w = w.dropRight(s.length)
          else if (inR1(s)) w = w.dropRight(s.length) + "eux"
        case "issement" | "issements" =>
          if (inR1(s) && w.length > s.length &&
              !isV(w.charAt(w.length - s.length - 1)))
            w = w.dropRight(s.length)
        case "amment" => if (inRV(s)) { w = w.dropRight(6) + "ant"; step1MentFound = true }
        case "emment" => if (inRV(s)) { w = w.dropRight(6) + "ent"; step1MentFound = true }
        case "ment" | "ments" =>
          if (w.length > s.length && isV(w.charAt(w.length - s.length - 1)) &&
              w.length - s.length - 1 >= rv) {
            w = w.dropRight(s.length); step1MentFound = true
          }
        case _ =>
      }
      case None =>
    }

    // step 2a (if step 1 removed nothing, or a -ment form was found)
    if (w == before1 || step1MentFound) {
      val w1 = w
      val iVerbs = Seq("issaIent", "issantes", "issables", "iraIent",
        "issante", "issants", "issions", "irions", "issais", "issait",
        "issant", "issent", "issiez", "issons", "irais", "irait",
        "irent", "iriez", "irons", "iront", "isses", "issez", "îmes",
        "îtes", "irai", "iras", "irez", "isse", "ies", "ira", "ît",
        "ie", "ir", "is", "it", "i")
      val hit = longest(w, rv, iVerbs).filter { s =>
        val j = w.length - s.length - 1
        j >= rv && j >= 0 && !isV(w.charAt(j))
      }
      hit.foreach(s => w = w.dropRight(s.length))
      // step 2b (if 2a removed nothing)
      if (w == w1 && !step1MentFound || (w == w1 && step1MentFound)) {
        if (w == w1) {
          val ions = "ions"
          val eGroup = Seq("eraIent", "erions", "èrent", "erais", "erait",
            "eriez", "erons", "eront", "erai", "eras", "erez", "ées",
            "era", "iez", "ée", "és", "er", "ez", "é")
          val aGroup = Seq("assions", "assent", "assiez", "aIent",
            "antes", "asses", "âmes", "âtes", "ante", "ants", "asse",
            "ais", "ait", "ant", "ât", "ai", "as", "a")
          if (w.endsWith(ions) && w.length - 4 >= r2) w = w.dropRight(4)
          else longest(w, rv, eGroup) match {
            case Some(s) => w = w.dropRight(s.length)
            case None =>
              longest(w, rv, aGroup).foreach { s =>
                w = w.dropRight(s.length)
                if (w.endsWith("e") && w.length - 1 >= rv) w = w.dropRight(1)
              }
          }
        }
      }
    }

    val changed = w != before1
    if (changed) {
      // step 3
      if (w.endsWith("Y")) w = w.dropRight(1) + "i"
      else if (w.endsWith("ç")) w = w.dropRight(1) + "c"
    } else {
      // step 4: final s not preceded by a i o u è s (or Hi)
      if (w.endsWith("s") && w.length >= 2 &&
          !"aiouès".contains(w.charAt(w.length - 2)))
        w = w.dropRight(1)
      if (w.endsWith("ion") && w.length - 3 >= r2 && w.length >= 4 &&
          (w.charAt(w.length - 4) == 's' || w.charAt(w.length - 4) == 't'))
        w = w.dropRight(3)
      else if (Seq("ière", "Ière").exists(inRV))
        w = w.dropRight(4) + "i"
      else if (Seq("ier", "Ier").exists(inRV))
        w = w.dropRight(3) + "i"
      else if (w.endsWith("e") && w.length - 1 >= rv) w = w.dropRight(1)
      else if (w.endsWith("guë") && w.length - 1 >= rv) w = w.dropRight(1)
    }
    // step 5: undouble enn onn ett ell eill
    if (Seq("enn", "onn", "ett", "ell", "eill").exists(w.endsWith))
      w = w.dropRight(1)
    // step 6: é/è followed by non-vowels at the end → e
    val m = "[éè]([^aeiouyâàëéêèïîôûù]+)$".r
    w = m.replaceAllIn(w, mm => "e" + mm.group(1))
    w.toLowerCase
  }

  // ── German ────────────────────────────────────────────────────────────

  private val deVowels = "aeiouyäöü".toSet
  def german(input: String): String = {
    var w = input.replace("ß", "ss")
    // u/y between vowels become consonant markers
    val cs = w.toCharArray
    for (i <- 1 until cs.length - 1)
      if ((cs(i) == 'u' || cs(i) == 'y') &&
          deVowels(cs(i - 1)) && deVowels(cs(i + 1)))
        cs(i) = cs(i).toUpper
    w = new String(cs)
    val isV = (c: Char) => deVowels(c)
    var (r1, r2) = r1r2(w, isV)
    if (r1 < 3) r1 = math.min(3, w.length) // region before R1 has >= 3 letters
    def inR1(s: String) = w.endsWith(s) && w.length - s.length >= r1
    def inR2(s: String) = w.endsWith(s) && w.length - s.length >= r2

    // step 1
    val sEnding = "bdfghklmnrt".toSet
    longestAny(w, Seq("ern", "em", "er", "en", "es", "e", "s")) match {
      case Some(s @ ("ern" | "em" | "er")) if inR1(s) => w = w.dropRight(s.length)
      case Some(s @ ("en" | "es" | "e")) if inR1(s) =>
        w = w.dropRight(s.length)
        if (w.endsWith("niss")) w = w.dropRight(1)
      case Some("s") if inR1("s") && w.length >= 2 &&
          sEnding(w.charAt(w.length - 2)) => w = w.dropRight(1)
      case _ =>
    }
    // step 2
    val stEnding = "bdfghklmnt".toSet
    longestAny(w, Seq("est", "en", "er", "st")) match {
      case Some(s @ ("est" | "en" | "er")) if inR1(s) => w = w.dropRight(s.length)
      case Some("st") if inR1("st") && w.length >= 6 &&
          stEnding(w.charAt(w.length - 3)) => w = w.dropRight(2)
      case _ =>
    }
    // step 3 (d-suffixes)
    longestAny(w, Seq("isch", "lich", "heit", "keit", "end", "ung",
      "ig", "ik")) match {
      case Some(s @ ("end" | "ung")) if inR2(s) =>
        w = w.dropRight(s.length)
        if (w.endsWith("ig") && w.length - 2 >= r2 &&
            !(w.length >= 3 && w.charAt(w.length - 3) == 'e'))
          w = w.dropRight(2)
      case Some(s @ ("ig" | "ik" | "isch")) if inR2(s) &&
          !(w.length > s.length && w.charAt(w.length - s.length - 1) == 'e') =>
        w = w.dropRight(s.length)
      case Some(s @ ("lich" | "heit")) if inR2(s) =>
        w = w.dropRight(s.length)
        if ((w.endsWith("er") || w.endsWith("en")) && w.length - 2 >= r1)
          w = w.dropRight(2)
      case Some("keit") if inR2("keit") =>
        w = w.dropRight(4)
        if (w.endsWith("lich") && w.length - 4 >= r2) w = w.dropRight(4)
        else if (w.endsWith("ig") && w.length - 2 >= r2) w = w.dropRight(2)
      case _ =>
    }
    w.toLowerCase.map {
      case 'ä' => 'a'; case 'ö' => 'o'; case 'ü' => 'u'; case c => c
    }
  }

  // ── Scandinavian shared: R1 with a 3-letter minimum prefix ───────────

  private def scandiR1(w: String, isV: Char => Boolean): Int = {
    val (r1, _) = r1r2(w, isV)
    math.min(math.max(r1, math.min(3, w.length)), w.length)
  }

  // ── Danish ────────────────────────────────────────────────────────────

  private val daVowels = "aeiouyæåø".toSet
  private val daSEnding = "abcdfghjklmnoprtvyzå".toSet
  private val daStep1 = Seq("hed", "ethed", "ered", "e", "erede", "ende",
    "erende", "ene", "erne", "ere", "en", "heden", "eren", "er", "heder",
    "erer", "heds", "es", "endes", "erendes", "enes", "ernes", "eres",
    "ens", "hedens", "erens", "ers", "ets", "erets", "et", "eret")

  def danish(input: String): String = {
    var w = input
    val isV = (c: Char) => daVowels(c)
    def r1 = scandiR1(w, isV)
    def inR1(s: String) = w.endsWith(s) && w.length - s.length >= r1
    // step 1: longest d-suffix in R1 deleted; bare s only after a valid
    // s-ending letter
    longest(w, r1, daStep1) match {
      case Some(s) => w = w.dropRight(s.length)
      case None =>
        if (inR1("s") && w.length >= 2 && daSEnding(w.charAt(w.length - 2)))
          w = w.dropRight(1)
    }
    // step 2: consonant-pair endings lose the final letter
    def step2(): Unit =
      if (Seq("gd", "dt", "gt", "kt").exists(inR1)) w = w.dropRight(1)
    step2()
    // step 3: igst drops st; then ig/lig/elig/els delete (and step 2
    // repeats); løst -> løs
    if (w.endsWith("igst")) w = w.dropRight(2)
    longest(w, r1, Seq("elig", "lig", "els", "ig")) match {
      case Some(s) => w = w.dropRight(s.length); step2()
      case None => if (inR1("løst")) w = w.dropRight(1)
    }
    // step 4: undouble a final double consonant in R1
    if (w.length >= 2 && w.charAt(w.length - 1) == w.charAt(w.length - 2) &&
        !isV(w.charAt(w.length - 1)) && w.length - 1 >= r1)
      w = w.dropRight(1)
    w
  }

  // ── Norwegian ─────────────────────────────────────────────────────────

  private val noVowels = "aeiouyæåø".toSet
  private val noSEnding = "bcdfghjlmnoprtvyz".toSet
  private val noStep1 = Seq("a", "e", "ede", "ande", "ende", "ane", "ene",
    "hetene", "en", "heten", "ar", "er", "heter", "as", "es", "edes",
    "endes", "enes", "hetenes", "ens", "hetens", "ers", "ets", "et",
    "het", "ast")

  def norwegian(input: String): String = {
    var w = input
    val isV = (c: Char) => noVowels(c)
    def r1 = scandiR1(w, isV)
    def inR1(s: String) = w.endsWith(s) && w.length - s.length >= r1
    // step 1: longest among the d-suffixes deleted; erte/ert -> er;
    // bare s after a valid s-ending (k counts only after a non-vowel)
    val erte = Seq("erte", "ert").find(inR1)
    longest(w, r1, noStep1) match {
      case Some(s) if erte.forall(_.length <= s.length) =>
        w = w.dropRight(s.length)
      case _ if erte.isDefined =>
        w = w.dropRight(erte.get.length) + "er"
      case None =>
        if (inR1("s") && w.length >= 2 && {
          val p = w.charAt(w.length - 2)
          noSEnding(p) ||
            (p == 'k' && (w.length < 3 || !isV(w.charAt(w.length - 3))))
        }) w = w.dropRight(1)
      case _ =>
    }
    // step 2: dt/vt lose the t
    if (Seq("dt", "vt").exists(inR1)) w = w.dropRight(1)
    // step 3
    longest(w, r1, Seq("hetslov", "slov", "elov", "lov", "eleg", "leg",
      "elig", "lig", "eig", "ig", "els")).foreach(s => w = w.dropRight(s.length))
    w
  }

  // ── Swedish ───────────────────────────────────────────────────────────

  private val svVowels = "aeiouyäåö".toSet
  private val svSEnding = "bcdfghjklmnoprtvy".toSet
  private val svStep1 = Seq("a", "arna", "erna", "heterna", "orna", "ad",
    "e", "ade", "ande", "arne", "are", "aste", "en", "anden", "aren",
    "heten", "ern", "ar", "er", "heter", "or", "as", "arnas", "ernas",
    "ornas", "es", "ades", "andes", "ens", "arens", "hetens", "erns",
    "at", "andet", "het", "ast")

  def swedish(input: String): String = {
    var w = input
    val isV = (c: Char) => svVowels(c)
    def r1 = scandiR1(w, isV)
    def inR1(s: String) = w.endsWith(s) && w.length - s.length >= r1
    // step 1
    longest(w, r1, svStep1) match {
      case Some(s) => w = w.dropRight(s.length)
      case None =>
        if (inR1("s") && w.length >= 2 && svSEnding(w.charAt(w.length - 2)))
          w = w.dropRight(1)
    }
    // step 2: consonant-pair endings lose the final letter
    if (Seq("dd", "gd", "nn", "dt", "gt", "kt", "tt").exists(inR1))
      w = w.dropRight(1)
    // step 3
    longest(w, r1, Seq("lig", "ig", "els")) match {
      case Some(s) => w = w.dropRight(s.length)
      case None =>
        if (inR1("löst")) w = w.dropRight(1)
        else if (inR1("fullt")) w = w.dropRight(1)
    }
    w
  }

  // ── Dutch ─────────────────────────────────────────────────────────────

  private val nlVowels = "aeiouyè".toSet

  def dutch(input: String): String = {
    // remove umlauts and acutes (grave stays — è is a Dutch vowel)
    var w = input.map {
      case 'ä' | 'á' => 'a'; case 'ë' | 'é' => 'e'; case 'ï' | 'í' => 'i'
      case 'ö' | 'ó' => 'o'; case 'ü' | 'ú' => 'u'; case c => c
    }
    // consonant markers: initial y, y after a vowel, i between vowels
    val cs = w.toCharArray
    if (cs.nonEmpty && cs(0) == 'y') cs(0) = 'Y'
    for (i <- 1 until cs.length) {
      if (cs(i) == 'y' && nlVowels(cs(i - 1))) cs(i) = 'Y'
      if (cs(i) == 'i' && i + 1 < cs.length && nlVowels(cs(i - 1)) &&
          nlVowels(cs(i + 1))) cs(i) = 'I'
    }
    w = new String(cs)
    val isV = (c: Char) => nlVowels(c)
    def regions: (Int, Int) = {
      var (r1, r2) = r1r2(w, isV)
      r1 = math.max(r1, math.min(3, w.length))
      (r1, r2)
    }
    def inR1(s: String) = { val (r1, _) = regions
      w.endsWith(s) && w.length - s.length >= r1 }
    def inR2(s: String) = { val (_, r2) = regions
      w.endsWith(s) && w.length - s.length >= r2 }
    def undouble(): Unit =
      if (Seq("kk", "dd", "tt").exists(w.endsWith)) w = w.dropRight(1)
    def validS(c: Char) = !isV(c) && c != 'j'
    def enEnding(stem: String) =
      stem.nonEmpty && !isV(stem.last) && !stem.endsWith("gem")

    // step 1
    if (inR1("heden")) w = w.dropRight(5) + "heid"
    else {
      val en = Seq("ene", "en").find(s =>
        inR1(s) && enEnding(w.dropRight(s.length)))
      en match {
        case Some(s) => w = w.dropRight(s.length); undouble()
        case None =>
          val se = Seq("se", "s").find(s =>
            inR1(s) && w.length > s.length && validS(w.charAt(w.length - s.length - 1)))
          se.foreach(s => w = w.dropRight(s.length))
      }
    }
    // step 2: e in R1 after a non-vowel
    var eFound = false
    def step2(): Unit =
      if (inR1("e") && w.length >= 2 && !isV(w.charAt(w.length - 2))) {
        eFound = true
        w = w.dropRight(1); undouble()
      }
    step2()
    // step 3a: heid (not after c), then a following en as in step 1
    if (inR2("heid") && (w.length < 5 || w.charAt(w.length - 5) != 'c')) {
      w = w.dropRight(4)
      if (inR1("en") && enEnding(w.dropRight(2))) { w = w.dropRight(2); undouble() }
    }
    // step 3b: d-suffixes
    if (Seq("end", "ing").exists(inR2)) {
      w = w.dropRight(3)
      if (inR2("ig") && (w.length < 3 || w.charAt(w.length - 3) != 'e'))
        w = w.dropRight(2)
      else undouble()
    } else if (inR2("ig") && (w.length < 3 || w.charAt(w.length - 3) != 'e'))
      w = w.dropRight(2)
    else if (inR2("lijk")) { w = w.dropRight(4); step2() }
    else if (inR2("baar")) w = w.dropRight(4)
    else if (inR2("bar") && eFound) w = w.dropRight(3)
    // step 4: undouble vowel in C-VV-D
    if (w.length >= 4) {
      val d = w.charAt(w.length - 1)
      val v1 = w.charAt(w.length - 2); val v2 = w.charAt(w.length - 3)
      val c = w.charAt(w.length - 4)
      if (!isV(d) && d != 'I' && v1 == v2 && "aeou".contains(v1) && !isV(c))
        w = w.dropRight(2) + d
    }
    w.toLowerCase
  }

  /** Dispatch for word_stem(word, lang) — the ten transcribed
    * languages (en/fr/es/pt/it/de exercised by the reference's own
    * tests, da/no/sv/nl added round 15); the remaining codes of the
    * reference's STEMMERS map (ca/eu/fi/hu/hy/ir/lt/ro/ru/tr) stay
    * LOUD documented deltas — their Snowball programs are not
    * transcribed, and a silent wrong stem would be worse than the
    * error (FnSpec pins the full 20-language matrix either way;
    * WordStemFunction.java:57-77 is the dispatch being mirrored).
    */
  def stem(word: String, lang: String): String = lang match {
    case "en" => Porter2Stemmer.stem(word.toLowerCase)
    case "fr" => french(word.toLowerCase)
    case "es" => spanish(word.toLowerCase)
    case "pt" => portuguese(word.toLowerCase)
    case "it" => italian(word.toLowerCase)
    case "de" => german(word.toLowerCase)
    case "da" => danish(word.toLowerCase)
    case "no" => norwegian(word.toLowerCase)
    case "sv" => swedish(word.toLowerCase)
    case "nl" => dutch(word.toLowerCase)
    case "ca" | "eu" | "fi" | "hu" | "hy" | "ir" | "lt" | "ro" | "ru" |
        "tr" =>
      // in the reference's STEMMERS map but not transcribed here —
      // loud, named delta (see scaladoc above)
      throw new IllegalArgumentException(
        s"Unknown stemmer language: $lang (reference dispatches it; " +
          "not transcribed — documented delta)")
    case other =>
      throw new IllegalArgumentException(s"Unknown stemmer language: $other")
  }
}
