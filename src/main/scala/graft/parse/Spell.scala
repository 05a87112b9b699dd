package graft.parse

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import scala.collection.mutable

/** Spell — LCS-based streaming template miner (SURVEY.md §2.3 T4), the
  * reference's alternate parser (logparser/Spell.py:227-274), re-expressed
  * with the same two-phase mine/merge + frozen-match design as [[Drain]].
  *
  * Match cascade per line (Spell.py:243-249): prefix-tree on constant tokens
  * → subsequence loop match → LCS ≥ tau·len over candidates prefiltered by
  * 50% token-set overlap.
  */
final class SpellTree(tau: Double) extends Serializable {

  final class Cluster(var template: Vector[String], var count: Long) extends Serializable
  final class TNode extends Serializable {
    var cluster: Cluster = _
    var templateNo: Int  = 0
    val children: mutable.HashMap[String, TNode] = mutable.HashMap.empty
  }

  private val root = new TNode
  val allClusters: mutable.ArrayBuffer[Cluster] = mutable.ArrayBuffer.empty

  /** Longest common subsequence, backtracked (Spell.py:59-82). */
  def lcs(a: Vector[String], b: Vector[String]): List[String] = {
    val m = Array.ofDim[Int](a.length + 1, b.length + 1)
    for (i <- a.indices; j <- b.indices)
      m(i + 1)(j + 1) =
        if (a(i) == b(j)) m(i)(j) + 1
        else math.max(m(i + 1)(j), m(i)(j + 1))
    var (i, j) = (a.length, b.length)
    var out = List.empty[String]
    while (i != 0 && j != 0) {
      if (m(i)(j) == m(i - 1)(j)) i -= 1
      else if (m(i)(j) == m(i)(j - 1)) j -= 1
      else { out = a(i - 1) :: out; i -= 1; j -= 1 }
    }
    out
  }

  /** Spell.py:95-108 — descend constant tokens; accept a cluster whose
    * constant part is ≥ tau·len(seq).
    */
  private def prefixTreeMatch(node: TNode, seq: Vector[String], idx: Int): Cluster = {
    var i = idx
    while (i < seq.length) {
      node.children.get(seq(i)) match {
        case Some(child) =>
          if (child.cluster != null) {
            val constLen = child.cluster.template.count(_ != "<*>")
            if (constLen >= tau * seq.length) return child.cluster
            // below the tau bar: the reference falls through and keeps
            // scanning siblings at THIS level (Spell.py:101-104), it does
            // not descend
            i += 1
          } else return prefixTreeMatch(child, seq, i + 1)
        case None => i += 1
      }
    }
    null
  }

  /** Spell.py:84-93 — first cluster whose template tokens are all in the
    * seq's token set (subsequence proxy), templates shorter than half the
    * seq skipped.
    */
  private def simpleLoopMatch(seq: Vector[String]): Cluster = {
    val tokenSet = seq.toSet
    allClusters.foreach { c =>
      if (c.template.length.toDouble >= 0.5 * seq.length &&
        c.template.forall(t => tokenSet.contains(t) || t == "<*>")) return c
    }
    null
  }

  /** Spell.py:111-133 — best LCS ≥ tau·len, candidates prefiltered by 50%
    * token overlap; ties → shorter template.
    */
  private def lcsMatch(seq: Vector[String]): (Cluster, List[String]) = {
    var maxLen = -1
    var maxLcs: List[String] = Nil
    var best: Cluster = null
    val setSeq = seq.toSet
    allClusters.foreach { c =>
      if ((setSeq intersect c.template.toSet).size >= 0.5 * seq.length) {
        val l = lcs(seq, c.template)
        if (l.length > maxLen ||
          (l.length == maxLen && best != null && c.template.length < best.template.length)) {
          maxLen = l.length; maxLcs = l; best = c
        }
      }
    }
    if (maxLen >= tau * seq.length) (best, maxLcs) else (null, Nil)
  }

  /** Spell.py:135-153 — project the cluster template onto the LCS: kept
    * tokens stay, gaps become `<*>`, an unconsumed tail becomes one `<*>`.
    */
  private def mergeTemplate(lcsSeq: List[String], seq: Vector[String]): Vector[String] = {
    if (lcsSeq.isEmpty) return Vector.empty
    var rem = lcsSeq
    val out = Vector.newBuilder[String]
    var i = 0
    while (i < seq.length && rem.nonEmpty) {
      if (seq(i) == rem.head) { out += seq(i); rem = rem.tail }
      else out += "<*>"
      i += 1
    }
    if (i < seq.length) out += "<*>"
    out.result()
  }

  private def addToTree(c: Cluster): Unit = {
    var node = root
    c.template.filter(_ != "<*>").foreach { tok =>
      val child = node.children.getOrElseUpdate(tok, new TNode)
      child.templateNo += 1
      node = child
    }
    if (node.cluster == null) node.cluster = c
  }

  private def removeFromTree(c: Cluster): Unit = {
    var node = root
    val consts = c.template.filter(_ != "<*>")
    var i = 0
    var done = false
    while (!done && i < consts.length) {
      node.children.get(consts(i)) match {
        case Some(child) =>
          if (child.templateNo == 1) { node.children.remove(consts(i)); done = true }
          else { child.templateNo -= 1; node = child }
        case None => done = true
      }
      i += 1
    }
  }

  /** Read-only match (frozen dictionary, phase b). */
  def search(tokens: Vector[String]): Cluster = {
    val const = tokens.filter(_ != "<*>")
    var c = prefixTreeMatch(root, const, 0)
    if (c == null) c = simpleLoopMatch(const)
    if (c == null) c = lcsMatch(tokens)._1
    c
  }

  /** One observation (Spell.py:236-265). */
  def insert(tokens: Vector[String], weight: Long = 1L): Unit = {
    if (tokens.isEmpty) return
    val const = tokens.filter(_ != "<*>")
    var matched = prefixTreeMatch(root, const, 0)
    if (matched == null) matched = simpleLoopMatch(const)
    if (matched == null) {
      val (c, l) = lcsMatch(tokens)
      if (c == null) {
        val fresh = new Cluster(tokens, weight)
        allClusters += fresh
        addToTree(fresh)
        return
      } else {
        val merged = mergeTemplate(l, c.template)
        if (merged != c.template) {
          removeFromTree(c)
          c.template = merged
          addToTree(c)
        }
        matched = c
      }
    }
    matched.count += weight
  }

  /** Frozen insert (template verbatim) for the broadcast match phase. */
  def insertFrozen(tokens: Vector[String], count: Long): Unit = {
    val c = new Cluster(tokens, count)
    allClusters += c
    addToTree(c)
  }

  def clusters: Vector[MinedCluster] =
    allClusters.iterator.map(c => MinedCluster(c.template, c.count)).toVector
}

object Spell {

  /** Spell tokenization (Spell.py:234-238): split on the punctuation set
    * minus `<*>`'s characters, drop empties.
    *
    * PINNED DEVIATION (like Drain's parameter-regex note): the reference
    * splits ONLY on punctuation, so its tokens can contain interior spaces
    * (an artifact of re.split with no \s in the class); we additionally
    * split on whitespace, which is the behavior every downstream consumer
    * (token-count matching, LCS length) actually assumes. Do not "fix" this
    * back to reference parity without re-deriving the oracle convergence
    * argument in CLAUDE.md.
    */
  private val punctPattern =
    java.util.regex.Pattern.compile("""[!"#$%&'()+,\-./:;=?@\[\\\]^_`{|}~]""")
  private val wsPattern = java.util.regex.Pattern.compile("\\s+")

  def tokenize(text: String, scrub: Seq[String]): Vector[String] =
    punctPattern.split(Drain.scrub(text, scrub)).iterator
      .flatMap(s => wsPattern.split(s.trim)).filter(_.nonEmpty).toVector

  /** T3, Spell variant — parameter extraction (Spell.py:328-338). Differs
    * from the Drain variant ([[Drain.parameterPattern]]) in three pinned
    * reference behaviors:
    *  (a) whitespace-SURROUNDED short tags are collapsed WITH their spaces
    *      (`\s<.{1,5}>\s → <*>`, Spell.py:329 — a tag at string start/end
    *      keeps its literal form but still becomes a capture group later);
    *  (b) each escaped space matches ANY non-alphanumeric run
    *      (`[^A-Za-z0-9]+`, Spell.py:333 — per space CHAR, not per run:
    *      the reference's `\\ +` pattern sees `\ \ \ `, one escaped space
    *      at a time);
    *  (c) captured parameters are stripped of leading/trailing punctuation
    *      and spaces (Spell.py:337).
    */
  def parameterPattern(template: String): java.util.regex.Pattern = {
    val normalized = template.replaceAll("\\s<.{1,5}>\\s", "<*>")
    val sb = new StringBuilder("^")
    var i = 0
    while (i < normalized.length) {
      if (normalized.startsWith("<*>", i)) { sb.append("(.*?)"); i += 3 }
      else if (normalized.charAt(i) == ' ') { sb.append("[^A-Za-z0-9]+"); i += 1 }
      else { sb.append(java.util.regex.Pattern.quote(normalized.charAt(i).toString)); i += 1 }
    }
    sb.append("$")
    java.util.regex.Pattern.compile(sb.toString)
  }

  private val punctuation = "!\"#$%&'()*+,-./:;<=>?@[\\]^_`{|}~"

  private def stripEnds(s: String, chars: String): String = {
    var a = 0; var b = s.length
    while (a < b && chars.indexOf(s.charAt(a)) >= 0) a += 1
    while (b > a && chars.indexOf(s.charAt(b - 1)) >= 0) b -= 1
    s.substring(a, b)
  }

  private val paramPatternCache =
    new java.util.concurrent.ConcurrentHashMap[String, java.util.regex.Pattern]()

  /** Column of Spell-extracted parameters: `parameters: array<string>`. */
  def extractParameters(df: DataFrame, textCol: String, templateCol: String): DataFrame = {
    val extractUdf = udf { (text: String, template: String) =>
      if (text == null || template == null) Seq.empty[String]
      else {
        val normalized = template.replaceAll("\\s<.{1,5}>\\s", "<*>")
        if (!normalized.contains("<*>")) Seq.empty[String] // Spell.py:330
        else {
          val p = paramPatternCache.computeIfAbsent(template, parameterPattern(_))
          val m = p.matcher(text)
          if (!m.matches()) Seq.empty[String]
          else (1 to m.groupCount())
            .map(g => stripEnds(stripEnds(m.group(g), punctuation), " "))
        }
      }
    }
    df.withColumn("parameters", extractUdf(col(textCol), col(templateCol)))
  }

  /** Phase (a): per-partition Spell trees + deterministic driver merge. */
  def mine(df: DataFrame, textCol: String, tau: Double,
           scrub: Seq[String] = Nil): Vector[TemplateEntry] = {
    val partials: Array[MinedCluster] =
      df.select(col(textCol)).na.drop()
        .mapPartitions { it =>
          val tree = new SpellTree(tau)
          it.foreach(r => tree.insert(tokenize(r.getString(0), scrub)))
          tree.clusters.iterator
        }(org.apache.spark.sql.Encoders.product[MinedCluster])
        .collect()
    mergePartials(partials.toIndexedSeq, tau)
  }

  def mergePartials(partials: Seq[MinedCluster], tau: Double): Vector[TemplateEntry] = {
    val tree = new SpellTree(tau)
    partials
      .sortBy(c => (c.tokens.length, c.tokens.mkString(" "), -c.count))
      .foreach(c => tree.insert(c.tokens.toVector, c.count))
    tree.clusters
      .groupBy(_.tokens)
      .map { case (toks, cs) =>
        val t = toks.mkString(" ")
        TemplateEntry(Drain.md5_8(t), t, cs.map(_.count).sum)
      }
      .toVector
      .sortBy(t => (-t.occurrences, t.event_template))
  }

  /** Phase (b): broadcast frozen dictionary, deterministic per-row match. */
  def matchTemplates(df: DataFrame, textCol: String, dict: Seq[TemplateEntry],
                     tau: Double, scrub: Seq[String] = Nil): DataFrame = {
    val spark = df.sparkSession
    val frozen = {
      val t = new SpellTree(tau)
      dict.foreach(e => t.insertFrozen(e.event_template.split(" ").toVector, e.occurrences))
      t
    }
    val idByTemplate = dict.map(e => e.event_template -> e.event_id).toMap
    val bc = graft.util.Bc(spark.sparkContext.broadcast((frozen, idByTemplate)))
    val matchUdf = udf { text: String =>
      if (text == null) null
      else {
        val (tree, ids) = bc.get
        val toks = tokenize(text, scrub)
        val c    = tree.search(toks)
        val tpl  = if (c != null) c.template.mkString(" ")
                   else toks.map(t => if (t.exists(_.isDigit)) "<*>" else t).mkString(" ")
        (ids.getOrElse(tpl, Drain.md5_8(tpl)), tpl)
      }
    }
    df.withColumn("__m", matchUdf(col(textCol)))
      .withColumn("event_id", col("__m._1"))
      .withColumn("event_template", col("__m._2"))
      .drop("__m")
  }

  def parse(df: DataFrame, textCol: String, tau: Double,
            scrub: Seq[String] = Nil): (DataFrame, Vector[TemplateEntry]) = {
    val dict = mine(df, textCol, tau, scrub)
    (matchTemplates(df, textCol, dict, tau, scrub), dict)
  }
}
