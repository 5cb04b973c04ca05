package graft.text

import scala.collection.mutable

/** Symmetric-delete spelling correction (public SymSpell algorithm, Wolf
  * Garbe) — the engine behind the reference's PDF text cleanup
  * (src/symspell_cleanup.rs:37-63 builds the same structure from a bundled
  * frequency dictionary; lookup at :99,141; lookup_compound at :303).
  *
  * Index: every dictionary word's delete-neighborhood (all variants with
  * up to `maxEdit` characters removed, over a bounded prefix) maps back to
  * the word. Lookup generates the QUERY's deletes only — candidate
  * verification uses true Damerau-Levenshtein — so search cost is
  * independent of dictionary size.
  *
  * Two dictionary tiers ship: `SymSpell.builtin` is a compact
  * common-English core (fast to build — the default for per-row repair
  * paths), and `SymSpell.bundled`/`SymSpell.default` load a ~57k-word
  * frequency list regenerated from English prose in this container
  * (tools/gen_frequency_dictionary.sh) — playing the role of the frequency
  * list the reference embeds, without copying that data file. `withCorpus`
  * additionally augments either tier with corpus-derived frequencies, so
  * rare domain words come from the data itself.
  */
final class SymSpell(maxEdit: Int = 2, prefixLen: Int = 7) extends Serializable {

  final case class Suggestion(term: String, distance: Int, freq: Long)

  private val words = mutable.Map.empty[String, Long]
  private val deletes = mutable.Map.empty[String, mutable.ArrayBuffer[String]]

  def contains(w: String): Boolean = words.contains(w)
  def frequency(w: String): Long = words.getOrElse(w, 0L)
  def size: Int = words.size

  def add(word: String, freq: Long): this.type = {
    val w = word.toLowerCase
    if (w.nonEmpty && words.getOrElse(w, 0L) < freq) {
      val isNew = !words.contains(w)
      words(w) = freq
      if (isNew)
        deleteVariants(w.take(prefixLen)).foreach(d =>
          deletes.getOrElseUpdate(d, mutable.ArrayBuffer.empty) += w)
    }
    this
  }

  def addAll(entries: Iterable[(String, Long)]): this.type = {
    entries.foreach { case (w, f) => add(w, f) }; this
  }

  /** corpus augmentation: observed tokens become dictionary entries (the
    * corpus-derived path TextRepair already used, now frequency-aware) */
  def withCorpus(tokenCounts: Map[String, Long], minCount: Long = 2): this.type =
    addAll(tokenCounts.collect {
      case (t, c) if c >= minCount && t.length >= 3 && t.forall(_.isLetter) => t -> c
    })

  private def deleteVariants(w: String): Set[String] = {
    val out = mutable.Set(w)
    var frontier = Set(w)
    var d = 0
    while (d < maxEdit) {
      frontier = frontier.flatMap(s =>
        s.indices.map(i => s.substring(0, i) + s.substring(i + 1)))
      out ++= frontier
      d += 1
    }
    out.toSet
  }

  /** optimal-string-alignment distance (Damerau-Levenshtein w/o
    * substring swaps), early-bounded by `max` */
  private[graft] def osa(a: String, b: String, max: Int): Int = {
    if (math.abs(a.length - b.length) > max) return max + 1
    val d = Array.ofDim[Int](a.length + 1, b.length + 1)
    (0 to a.length).foreach(i => d(i)(0) = i)
    (0 to b.length).foreach(j => d(0)(j) = j)
    for (i <- 1 to a.length; j <- 1 to b.length) {
      val cost = if (a(i - 1) == b(j - 1)) 0 else 1
      d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
                         d(i - 1)(j - 1) + cost)
      if (i > 1 && j > 1 && a(i - 1) == b(j - 2) && a(i - 2) == b(j - 1))
        d(i)(j) = math.min(d(i)(j), d(i - 2)(j - 2) + 1)
    }
    d(a.length)(b.length)
  }

  /** ranked suggestions: (distance asc, frequency desc, term asc) */
  def lookup(input: String, maxDistance: Int = 2): Seq[Suggestion] = {
    val q = input.toLowerCase
    val me = math.min(maxDistance, maxEdit)
    val cands = mutable.Set.empty[String]
    deleteVariants(q.take(prefixLen)).foreach(d =>
      deletes.get(d).foreach(cands ++= _))
    if (words.contains(q)) cands += q
    cands.toSeq
      .map(c => Suggestion(c, osa(q, c, me), words(c)))
      .filter(_.distance <= me)
      .sortBy(s => (s.distance, -s.freq, s.term))
  }

  /** per-token compound correction (symspell_cleanup.rs:303 semantics at
    * word granularity): keep dictionary words, else prefer a close single
    * correction, else split into two dictionary words, else keep as-is.
    * Non-alpha tokens and very short tokens pass through untouched. */
  def lookupCompound(text: String, maxDistance: Int = 2): String = {
    text.split(" ", -1).map { raw =>
      val w = raw.toLowerCase
      if (w.length <= 2 || !w.forall(_.isLetter) || words.contains(w)) raw
      else {
        val single = lookup(w, maxDistance).headOption
        val split = (1 until w.length).flatMap { i =>
          val (a, b) = (w.substring(0, i), w.substring(i))
          if (words.contains(a) && words.contains(b))
            Some((s"$a $b", math.min(words(a), words(b))))
          else None
        }.sortBy(-_._2).headOption
        single match {
          case Some(s) if s.distance <= 1 => s.term
          case _ => split.map(_._1).orElse(single.map(_.term)).getOrElse(raw)
        }
      }
    }.mkString(" ")
  }
}

/** Compact common-English frequency core (hand-written Zipf-ish ranks)
  * plus a full bundled ~57k-word frequency dictionary regenerated from
  * English prose in this container (Python stdlib docs, /usr/share/doc,
  * English man pages — see tools/gen_frequency_dictionary.sh). Plays the
  * same role as the frequency list the reference embeds at
  * src/symspell_cleanup.rs:20, without copying that data file. */
object SymSpell {
  def builtin(maxEdit: Int = 2): SymSpell =
    new SymSpell(maxEdit).addAll(BuiltinDictionary.entries)

  /** the bundled `word frequency` lines, parsed once per JVM */
  lazy val bundledEntries: Seq[(String, Long)] = {
    val in = getClass.getResourceAsStream(
      "/graft/text/frequency_dictionary_en.txt")
    require(in != null, "bundled frequency dictionary missing from resources")
    try scala.io.Source.fromInputStream(in, "UTF-8").getLines().flatMap { l =>
      l.split(' ') match {
        case Array(w, f) => f.toLongOption.map(w -> _)
        case _ => None
      }
    }.toVector
    finally in.close()
  }

  /** full-dictionary instance; the delete-neighborhood index over ~57k words
    * is a few-hundred-MB, few-second build, so share [[default]] rather
    * than constructing per call */
  def bundled(maxEdit: Int = 2): SymSpell =
    new SymSpell(maxEdit).addAll(bundledEntries)

  /** shared full-dictionary instance (one per JVM — e.g. one per executor
    * when used inside mapPartitions) */
  lazy val default: SymSpell = bundled()
}

private object BuiltinDictionary {
  // rank bands: common function words get the highest weights; content
  // words common in business/technical prose fill the tail
  private val bands: Seq[(Long, Seq[String])] = Seq(
    1000000L -> Seq("the", "of", "and", "to", "a", "in", "is", "it", "you",
      "that", "he", "was", "for", "on", "are", "as", "with", "his", "they",
      "at", "be", "this", "have", "from", "or", "one", "had", "by", "word",
      "but", "not", "what", "all", "were", "we", "when", "your", "can",
      "said", "there", "use", "an", "each", "which", "she", "do", "how",
      "their", "if", "will", "up", "other", "about", "out", "many", "then",
      "them", "these", "so", "some", "her", "would", "make", "like", "him",
      "into", "time", "has", "look", "two", "more", "write", "go", "see",
      "number", "no", "way", "could", "people", "my", "than", "first",
      "been", "who", "its", "now", "find", "long", "down", "day", "did",
      "get", "come", "made", "may", "part", "where", "love", "read"),
    100000L -> Seq("over", "new", "sound", "take", "only", "little", "work",
      "know", "place", "year", "live", "me", "back", "give", "most", "very",
      "after", "thing", "our", "just", "name", "good", "sentence", "man",
      "think", "say", "great", "help", "through", "much", "before", "line",
      "right", "too", "mean", "old", "any", "same", "tell", "boy", "follow",
      "came", "want", "show", "also", "around", "form", "three", "small",
      "set", "put", "end", "does", "another", "well", "large", "must",
      "big", "even", "such", "because", "turn", "here", "why", "ask",
      "went", "men", "land", "different", "home", "us", "move", "try",
      "kind", "hand", "picture", "again", "change", "off", "play", "spell",
      "air", "away", "animal", "house", "point", "page", "letter", "mother",
      "answer", "found", "study", "still", "learn", "should", "world",
      "high", "every", "near", "add", "food", "between", "own", "below",
      "country", "plant", "last", "school", "father", "keep", "tree",
      "never", "start", "city", "earth", "eye", "light", "thought", "head",
      "under", "story", "saw", "left", "few", "while", "along", "might",
      "close", "something", "seem", "next", "hard", "open", "example",
      "begin", "life", "always", "those", "both", "paper", "together",
      "got", "group", "often", "run", "important", "until", "children",
      "side", "feet", "car", "mile", "night", "walk", "white", "sea",
      "began", "grow", "took", "river", "four", "carry", "state", "once",
      "book", "hear", "stop", "without", "second", "later", "miss", "idea",
      "enough", "eat", "face", "watch", "far", "really", "almost", "let",
      "above", "girl", "sometimes", "mountain", "cut", "young", "talk",
      "soon", "list", "song", "being", "leave", "family", "sixth", "grade",
      "inspired", "past", "dated", "map", "late", "row", "item", "flag",
      "rate", "date", "code", "type", "size", "step", "plan", "team",
      "task", "note", "case", "cost", "rule", "term", "unit", "user"),
    10000L -> Seq("employee", "employer", "supervisor", "manager", "company",
      "business", "report", "project", "meeting", "budget", "market",
      "system", "process", "service", "product", "customer", "account",
      "contract", "invoice", "payment", "revenue", "quarter", "annual",
      "department", "director", "engineer", "analyst", "software",
      "hardware", "network", "database", "server", "cluster", "storage",
      "memory", "performance", "analysis", "research", "development",
      "design", "document", "section", "chapter", "table", "figure",
      "summary", "review", "detail", "result", "total", "average",
      "percent", "increase", "decrease", "schedule", "deadline", "status",
      "update", "version", "release", "feature", "issue", "error",
      "problem", "solution", "question", "information", "technology",
      "science", "history", "language", "computer", "program", "office",
      "finance", "legal", "policy", "public", "private", "general",
      "special", "standard", "quality", "security", "safety", "health",
      "education", "training", "experience", "knowledge", "skill",
      "couldnt", "wouldnt", "shouldnt"))
  val entries: Seq[(String, Long)] =
    bands.flatMap { case (f, ws) => ws.map(_ -> f) }
}
