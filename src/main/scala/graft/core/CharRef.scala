package graft.core

/** The WHATWG named-character-reference table (2,231 entries: 2,125 with a
  * trailing `;`, 106 legacy semicolon-less, 93 mapping to two codepoints).
  * Data extracted from the public WHATWG table as carried by the reference at
  * tokenizer/char_ref.v:4-2236; shipped as a TSV resource.
  *
  * The reference rescans `char_ref.keys()` (a 2,231-element list
  * materialization) once per consumed character inside named-reference
  * scanning (tokenizer/tokenizer.v:2715,2730) — O(table) per char. We keep the
  * *semantics* (exact-key membership of the growing prefix, i.e. the
  * shortest-prefix match quirk Q6) but make each probe an O(1) hash lookup.
  */
object CharRef {
  /** name (with or without trailing ';') -> replacement codepoints. */
  val table: java.util.HashMap[String, Array[Int]] = {
    val m = new java.util.HashMap[String, Array[Int]](4096)
    val in = getClass.getResourceAsStream("/graft/char_ref.tsv")
    require(in != null, "char_ref.tsv resource missing")
    val src = scala.io.Source.fromInputStream(in, "UTF-8")
    try {
      for (line <- src.getLines() if line.nonEmpty) {
        val i = line.indexOf('\t')
        val name = line.substring(0, i)
        val cps = line.substring(i + 1).split(',').map(_.toInt)
        m.put(name, cps)
      }
    } finally src.close()
    m
  }

  /** Longest entry name (bounds the scan loop defensively). */
  val maxNameLen: Int = {
    var n = 0
    table.keySet.forEach(k => if (k.length > n) n = k.length)
    n
  }

  @inline def contains(name: String): Boolean = table.containsKey(name)
  @inline def lookup(name: String): Array[Int] = table.get(name)

  // ---- incremental trie over the key alphabet (ASCII letters/digits/';') --
  // `isTerminal(node after walking s)` ≡ `contains(s)`, so the tokenizer's
  // per-consumed-char membership probe (the shortest-prefix quirk Q6) needs
  // no String allocation. Edges indexed by raw ASCII code (< 128).
  val (trieEdges: Array[Array[Int]], trieTerminal: Array[Boolean]) = {
    val edges = scala.collection.mutable.ArrayBuffer[Array[Int]](Array.fill(128)(-1))
    val term = scala.collection.mutable.ArrayBuffer[Boolean](false)
    table.keySet.forEach { k =>
      var node = 0
      var i = 0
      while (i < k.length) {
        val c = k.charAt(i).toInt
        var next = edges(node)(c)
        if (next < 0) {
          next = edges.length
          edges += Array.fill(128)(-1)
          term += false
          edges(node)(c) = next
        }
        node = next
        i += 1
      }
      term(node) = true
    }
    (edges.toArray, term.toArray)
  }

  /** Walk one char; -1 = fell off the trie (sticky via the caller). */
  @inline def trieStep(node: Int, c: Int): Int =
    if (node < 0 || c < 0 || c >= 128) -1 else trieEdges(node)(c)

  @inline def trieTerminalAt(node: Int): Boolean = node >= 0 && trieTerminal(node)
}
