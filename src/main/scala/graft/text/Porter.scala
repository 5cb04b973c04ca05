package graft.text

/** Porter stemming algorithm (M.F. Porter, 1980, public domain spec) —
  * the same stemmer family the reference uses at index and query time via
  * Tantivy's English stemmer (reference: src/search/tantivy/schema.rs:8-14).
  * Pure function: safe inside codegen'd expressions and driver-side query
  * rewriting alike.
  */
object Porter {

  def stem(word: String): String = {
    if (word.length <= 2) return word.toLowerCase
    var b = word.toLowerCase.toCharArray
    var k = b.length - 1

    def cons(i: Int): Boolean = b(i) match {
      case 'a' | 'e' | 'i' | 'o' | 'u' => false
      case 'y' => if (i == 0) true else !cons(i - 1)
      case _ => true
    }

    /** number of VC sequences in [0, j] */
    def m(j: Int): Int = {
      var n = 0; var i = 0
      while (i <= j && cons(i)) i += 1
      if (i > j) return 0
      while (i <= j) {
        while (i <= j && !cons(i)) i += 1
        if (i > j) return n
        n += 1
        while (i <= j && cons(i)) i += 1
      }
      n
    }

    def vowelInStem(j: Int): Boolean = (0 to j).exists(i => !cons(i))
    def doubleC(j: Int): Boolean = j >= 1 && b(j) == b(j - 1) && cons(j)
    /** cvc where second c is not w, x or y */
    def cvc(i: Int): Boolean =
      i >= 2 && cons(i) && !cons(i - 1) && cons(i - 2) &&
        b(i) != 'w' && b(i) != 'x' && b(i) != 'y'

    def ends(s: String): Boolean = {
      val l = s.length
      if (l > k + 1) false
      else (0 until l).forall(i => b(k - l + 1 + i) == s(i))
    }
    def setTo(s: String, j: Int): Unit = {
      val nb = new Array[Char](j + 1 + s.length)
      System.arraycopy(b, 0, nb, 0, j + 1)
      s.copyToArray(nb, j + 1)
      b = nb; k = nb.length - 1
    }
    def r(s: String, suffixLen: Int): Unit = {
      val j = k - suffixLen
      if (m(j) > 0) setTo(s, j)
    }

    // Step 1a
    if (ends("sses")) k -= 2
    else if (ends("ies")) { setTo("i", k - 3) }
    else if (!ends("ss") && ends("s")) k -= 1

    // Step 1b
    var extraEd = false
    if (ends("eed")) { if (m(k - 3) > 0) k -= 1 }
    else if (ends("ed") && vowelInStem(k - 2)) { k -= 2; extraEd = true }
    else if (ends("ing") && vowelInStem(k - 3)) { k -= 3; extraEd = true }
    if (extraEd) {
      if (ends("at")) setTo("ate", k - 2)
      else if (ends("bl")) setTo("ble", k - 2)
      else if (ends("iz")) setTo("ize", k - 2)
      else if (doubleC(k)) { if (b(k) != 'l' && b(k) != 's' && b(k) != 'z') k -= 1 }
      else if (m(k) == 1 && cvc(k)) setTo("e", k)
    }

    // Step 1c
    if (ends("y") && vowelInStem(k - 1)) b(k) = 'i'

    // Step 2
    val step2 = Seq(
      "ational" -> "ate", "tional" -> "tion", "enci" -> "ence", "anci" -> "ance",
      "izer" -> "ize", "bli" -> "ble", "alli" -> "al", "entli" -> "ent",
      "eli" -> "e", "ousli" -> "ous", "ization" -> "ize", "ation" -> "ate",
      "ator" -> "ate", "alism" -> "al", "iveness" -> "ive", "fulness" -> "ful",
      "ousness" -> "ous", "aliti" -> "al", "iviti" -> "ive", "biliti" -> "ble",
      "logi" -> "log")
    step2.find { case (suf, _) => ends(suf) }.foreach { case (suf, rep) => r(rep, suf.length) }

    // Step 3
    val step3 = Seq(
      "icate" -> "ic", "ative" -> "", "alize" -> "al", "iciti" -> "ic",
      "ical" -> "ic", "ful" -> "", "ness" -> "")
    step3.find { case (suf, _) => ends(suf) }.foreach { case (suf, rep) => r(rep, suf.length) }

    // Step 4
    val step4 = Seq("al", "ance", "ence", "er", "ic", "able", "ible", "ant",
      "ement", "ment", "ent", "ion", "ou", "ism", "ate", "iti", "ous",
      "ive", "ize")
    var done4 = false
    for (suf <- step4 if !done4) {
      if (ends(suf)) {
        done4 = true
        val j = k - suf.length
        val ok = suf match {
          case "ion" => j >= 0 && (b(j) == 's' || b(j) == 't') && m(j) > 1
          case _ => m(j) > 1
        }
        if (ok) k = j
      }
    }

    // Step 5a
    if (ends("e")) {
      val a = m(k - 1)
      if (a > 1 || (a == 1 && !cvc(k - 1))) k -= 1
    }
    // Step 5b
    if (b(k) == 'l' && doubleC(k) && m(k) > 1) k -= 1

    new String(b, 0, k + 1)
  }

  def stemTokens(tokens: Seq[String]): Seq[String] = tokens.map(stem)
}
