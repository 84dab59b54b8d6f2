package graft.text

/** Snowball English ("Porter2") stemmer, tuned to byte-match the outputs of
  * NLTK's SnowballStemmer("english") as pinned by the reference's committed
  * goldens (daily/<date>/cleaned.csv; reference stems at
  * 00_training_pipeline.py:61,88 / 01_classification_pipeline.py:77,119-122).
  *
  * Base algorithm: snowballstem.org/algorithms/english/stemmer.html.
  * Two deliberate NLTK-behavior reproductions, both pinned by goldens:
  *
  *  1. R1/R2 are recomputed from the word after steps 0-1b, then tracked as
  *     *suffix strings* through steps 1c-5. Pinned by: dating→date but
  *     debating→debat (post-1b "date" has R2 empty, "debate" has R2="e"),
  *     floating→float, sized→size, realized→realiz.
  *
  *  2. In step 2, a replacement longer than the tracked R2 string collapses
  *     R2 to "" in the izer/ization branch but to the literal "e" in the
  *     ational/ation/ator and iveness/iviti branches. Pinned by:
  *     realization→realize (e kept) vs vacation→vacat / activities→activ
  *     (e stripped by step 5 via the phantom R2="e").
  *
  * Pure String => String; golden-tested end-to-end in TextCleanGoldenSpec,
  * word-level cases in Porter2Spec.
  */
object Porter2 {

  private val vowels = "aeiouy" // marked consonant-y is 'Y', not in set
  private val doubles =
    Seq("bb", "dd", "ff", "gg", "mm", "nn", "pp", "rr", "tt")
  private val liEnding = "cdeghkmnrt"

  @inline private def isV(c: Char): Boolean = vowels.indexOf(c) >= 0

  private val specialWords: Map[String, String] = Map(
    "skis" -> "ski", "skies" -> "sky", "dying" -> "die", "lying" -> "lie",
    "tying" -> "tie", "idly" -> "idl", "gently" -> "gentl", "ugly" -> "ugli",
    "early" -> "earli", "only" -> "onli", "singly" -> "singl",
    "sky" -> "sky", "news" -> "news", "howe" -> "howe", "atlas" -> "atlas",
    "cosmos" -> "cosmos", "bias" -> "bias", "andes" -> "andes")

  private val exception2 = Set(
    "inning", "outing", "canning", "herring", "earring",
    "proceed", "exceed", "succeed")

  private val step1aSuffixes = Seq("sses", "ied", "ies", "us", "ss", "s")
  private val step1bSuffixes = Seq("eedly", "ingly", "edly", "eed", "ing", "ed")
  private val step2Suffixes = Seq(
    "ization", "ational", "fulness", "ousness", "iveness", "tional",
    "biliti", "lessli", "entli", "ation", "alism", "aliti", "ousli",
    "iviti", "fulli", "enci", "anci", "abli", "izer", "ator", "alli",
    "bli", "ogi", "li")
  private val step3Suffixes = Seq(
    "ational", "tional", "alize", "icate", "iciti", "ative", "ical",
    "ness", "ful")
  private val step4Suffixes = Seq(
    "ement", "ance", "ence", "able", "ible", "ment", "ant", "ent",
    "ism", "ate", "iti", "ous", "ive", "ize", "ion", "al", "er", "ic")

  /** start index of the region after the first non-vowel following a vowel,
    * scanning from `from`; length (= empty region) if none. */
  private def regionStart(w: CharSequence, from: Int): Int = {
    var i = from + 1
    while (i < w.length) {
      if (!isV(w.charAt(i)) && isV(w.charAt(i - 1))) return i + 1
      i += 1
    }
    w.length
  }

  /** (r1, r2) suffix strings with the gener/commun/arsen R1 special case */
  private def regions(word: String): (String, String) = {
    val r1 =
      if (word.startsWith("gener") || word.startsWith("arsen")) word.substring(5)
      else if (word.startsWith("commun")) word.substring(6)
      else word.substring(regionStart(word, 0))
    val r2 = r1.substring(regionStart(r1, 0))
    (r1, r2)
  }

  def stem(wordIn: String): String = {
    var word = wordIn.toLowerCase
    if (word.length <= 2) return word
    specialWords.get(word).foreach(return _)

    word = word.replace('’', '\'').replace('‘', '\'').replace('‛', '\'')
    if (word.startsWith("'")) word = word.substring(1)
    if (word.length <= 2) return word

    // mark consonant-y as Y
    if (word.startsWith("y")) word = "Y" + word.substring(1)
    val yMarked = new StringBuilder(word)
    var yi = 1
    while (yi < yMarked.length) {
      if (yMarked.charAt(yi) == 'y' && isV(yMarked.charAt(yi - 1)))
        yMarked.setCharAt(yi, 'Y')
      yi += 1
    }
    word = yMarked.toString

    // positional R1 for the step-1b checks (steps 0-1a only chop, so the
    // original position stays valid)
    val r1Pos =
      if (word.startsWith("gener") || word.startsWith("arsen")) 5
      else if (word.startsWith("commun")) 6
      else regionStart(word, 0)

    // step 0
    if (word.endsWith("'s'")) word = word.substring(0, word.length - 3)
    else if (word.endsWith("'s")) word = word.substring(0, word.length - 2)
    else if (word.endsWith("'")) word = word.substring(0, word.length - 1)

    // step 1a
    step1aSuffixes.find(word.endsWith).foreach {
      case "sses" => word = word.substring(0, word.length - 2)
      case suffix @ ("ied" | "ies") =>
        word =
          if (word.length - suffix.length > 1) word.substring(0, word.length - 2)
          else word.substring(0, word.length - 1)
      case "s" =>
        if (word.substring(0, math.max(0, word.length - 2)).exists(isV))
          word = word.substring(0, word.length - 1)
      case _ => // "us", "ss": no-op
    }

    if (exception2.contains(word)) return word

    // step 1b
    @inline def endsShortSyllable(w: String): Boolean = {
      val n = w.length
      if (n == 2) isV(w.charAt(0)) && !isV(w.charAt(1))
      else if (n > 2) {
        val c = w.charAt(n - 1)
        isV(w.charAt(n - 2)) && !isV(c) && c != 'w' && c != 'x' && c != 'Y' &&
          !isV(w.charAt(n - 3))
      } else false
    }
    step1bSuffixes.find(word.endsWith).foreach { suffix =>
      if (suffix == "eed" || suffix == "eedly") {
        if (word.length - suffix.length >= r1Pos)
          word = word.substring(0, word.length - suffix.length) + "ee"
      } else {
        if (word.substring(0, word.length - suffix.length).exists(isV)) {
          word = word.substring(0, word.length - suffix.length)
          if (word.endsWith("at") || word.endsWith("bl") || word.endsWith("iz"))
            word += "e"
          else if (doubles.exists(word.endsWith))
            word = word.substring(0, word.length - 1)
          else if (r1Pos >= word.length && endsShortSyllable(word))
            word += "e"
        }
      }
    }

    // regions recomputed from the post-1b word, then tracked as suffix
    // strings through the remaining steps (NLTK behavior reproduction #1)
    var (r1, r2) = regions(word)

    @inline def chop(n: Int): Unit = {
      word = word.substring(0, word.length - n)
      r1 = if (r1.length >= n) r1.substring(0, r1.length - n) else ""
      r2 = if (r2.length >= n) r2.substring(0, r2.length - n) else ""
    }
    /** region-tracked suffix replacement with the NLTK collapse quirk:
      * a region shorter than the matched suffix becomes `r2Else`
      * (behavior reproduction #2). */
    @inline def replace(suffix: String, repl: String, r2Else: String = ""): Unit = {
      word = word.substring(0, word.length - suffix.length) + repl
      r1 = if (r1.length >= suffix.length)
        r1.substring(0, r1.length - suffix.length) + repl else ""
      r2 = if (r2.length >= suffix.length)
        r2.substring(0, r2.length - suffix.length) + repl else r2Else
    }

    // step 1c
    if (word.length > 2) {
      val c = word.charAt(word.length - 1)
      if ((c == 'y' || c == 'Y') && !isV(word.charAt(word.length - 2))) {
        word = word.substring(0, word.length - 1) + "i"
        r1 = if (r1.nonEmpty) r1.substring(0, r1.length - 1) + "i" else ""
        r2 = if (r2.nonEmpty) r2.substring(0, r2.length - 1) + "i" else ""
      }
    }

    // step 2
    step2Suffixes.find(word.endsWith).foreach { suffix =>
      if (r1.endsWith(suffix)) suffix match {
        case "tional" => chop(2)
        case "enci" | "anci" | "abli" => replace("i", "e")
        case "entli" => chop(2)
        case "izer" | "ization" => replace(suffix, "ize")
        case "ational" | "ation" | "ator" => replace(suffix, "ate", r2Else = "e")
        case "alism" | "aliti" | "alli" => replace(suffix, "al")
        case "fulness" => chop(4)
        case "ousli" | "ousness" => replace(suffix, "ous")
        case "iveness" | "iviti" => replace(suffix, "ive", r2Else = "e")
        case "biliti" | "bli" => replace(suffix, "ble")
        case "ogi" =>
          if (word.length > 3 && word.charAt(word.length - 4) == 'l') chop(1)
        case "fulli" | "lessli" => chop(2)
        case "li" =>
          if (word.length > 2 &&
            liEnding.indexOf(word.charAt(word.length - 3)) >= 0) chop(2)
        case _ =>
      }
    }

    // step 3
    step3Suffixes.find(word.endsWith).foreach { suffix =>
      if (r1.endsWith(suffix)) suffix match {
        case "tional" => chop(2)
        case "ational" => replace(suffix, "ate", r2Else = "e")
        case "alize" => chop(3)
        case "icate" | "iciti" | "ical" => replace(suffix, "ic")
        case "ful" | "ness" => chop(suffix.length)
        case "ative" => if (r2.endsWith(suffix)) chop(5)
        case _ =>
      }
    }

    // step 4
    step4Suffixes.find(word.endsWith).foreach { suffix =>
      if (r2.endsWith(suffix)) {
        if (suffix == "ion") {
          if (word.length > 3) {
            val c = word.charAt(word.length - 4)
            if (c == 's' || c == 't') chop(3)
          }
        } else chop(suffix.length)
      }
    }

    // step 5
    if (word.endsWith("e")) {
      if (r2.endsWith("e")) word = word.substring(0, word.length - 1)
      else if (r1.endsWith("e") && word.length >= 4 &&
        (isV(word.charAt(word.length - 2)) ||
          "wxY".indexOf(word.charAt(word.length - 2)) >= 0 ||
          !isV(word.charAt(word.length - 3)) ||
          isV(word.charAt(word.length - 4))))
        word = word.substring(0, word.length - 1)
    } else if (word.endsWith("l") && r2.endsWith("l") && word.length > 1 &&
      word.charAt(word.length - 2) == 'l')
      word = word.substring(0, word.length - 1)

    word.replace('Y', 'y')
  }
}
