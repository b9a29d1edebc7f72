package graft.expr

/** Codepoint trie over vocabulary pieces — the scan-side lookup structure
  * shared by the WordPiece greedy matcher and the unigram Viterbi DP.
  *
  * Why a trie and not a HashSet/HashMap of piece strings: probing a set
  * requires materializing one candidate substring per candidate LENGTH at
  * every cursor position — O(len·maxLen²) character work per word — and
  * `maxLen` is an attacker-controlled quantity once models can be loaded
  * from persisted snapshots (one hostile 10k-codepoint "piece" in a
  * vocabulary degrades every uncached word of every document scanned).
  * The trie walk advances one codepoint per step, allocates nothing, and
  * dies at the first position where no vocabulary piece can extend the
  * match — so per-position cost is bounded by the longest REAL shared
  * prefix in the vocabulary, not by the longest hostile entry.
  *
  * Nodes fan out through small int-keyed open-addressing tables (most
  * vocabulary nodes have a handful of children; the root has at most a
  * few hundred). Lookup is allocation-free. Build happens once per model
  * per executor (lazily, like the caches it sits next to).
  */
final class CpTrie extends Serializable {

  /** One trie node: open-addressed (codepoint -> child) table plus the
    * terminal payload. Empty slots hold -1, which no codepoint equals —
    * even U+0000 (reachable through hostile documents and vocabularies)
    * keys normally.
    */
  final class Node {
    var keys: Array[Int] = null
    var kids: Array[Node] = null
    var used = 0
    var terminal = false
    var score = 0L

    def child(cp: Int): Node = {
      val ks = keys
      if (ks == null) return null
      var i = cp & (ks.length - 1)
      while (true) {
        val k = ks(i)
        if (k == cp) return kids(i)
        if (k == -1) return null
        i = (i + 1) & (ks.length - 1)
      }
      null // unreachable
    }

    def put(cp: Int): Node = {
      if (keys == null) {
        keys = Array.fill(4)(-1); kids = new Array[Node](4)
      } else if ((used + 1) * 4 > keys.length * 3) { // grow at 3/4 load
        val ok = keys; val oc = kids
        keys = Array.fill(ok.length * 2)(-1)
        kids = new Array[Node](ok.length * 2)
        used = 0
        var i = 0
        while (i < ok.length) {
          if (ok(i) != -1) putAt(ok(i), oc(i))
          i += 1
        }
      }
      var i = cp & (keys.length - 1)
      while (keys(i) != -1) {
        if (keys(i) == cp) return kids(i)
        i = (i + 1) & (keys.length - 1)
      }
      val n = new Node
      keys(i) = cp; kids(i) = n; used += 1
      n
    }

    private def putAt(cp: Int, n: Node): Unit = {
      var i = cp & (keys.length - 1)
      while (keys(i) != -1) i = (i + 1) & (keys.length - 1)
      keys(i) = cp; kids(i) = n; used += 1
    }
  }

  val root = new Node

  /** Insert one piece with its payload; empty strings are skipped (a
    * zero-length match is never legal).
    */
  def insert(s: String, sc: Long): Unit = {
    if (s == null || s.isEmpty) return
    var n = root
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      i += Character.charCount(cp)
      n = n.put(cp)
    }
    n.terminal = true
    n.score = sc
  }
}
