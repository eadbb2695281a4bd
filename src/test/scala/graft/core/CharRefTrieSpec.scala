package graft.core

import org.scalatest.funsuite.AnyFunSuite

/** Trie ≡ hash-table equivalence: for every table key, every strict prefix,
  * and mutated non-keys, walking the trie agrees with `contains`.
  */
class CharRefTrieSpec extends AnyFunSuite {
  private def walk(s: String): Int = {
    var node = 0
    var i = 0
    while (i < s.length) { node = CharRef.trieStep(node, s.charAt(i).toInt); i += 1 }
    node
  }

  test("every key is terminal; every strict prefix agrees with contains") {
    CharRef.table.keySet.forEach { k =>
      assert(CharRef.trieTerminalAt(walk(k)), k)
      for (i <- 1 until k.length) {
        val p = k.substring(0, i)
        assert(CharRef.trieTerminalAt(walk(p)) === CharRef.contains(p), p)
      }
    }
  }

  test("mutated non-keys are non-terminal") {
    CharRef.table.keySet.forEach { k =>
      val m = k + "Zq"
      assert(CharRef.trieTerminalAt(walk(m)) === CharRef.contains(m), m)
    }
    assert(!CharRef.trieTerminalAt(walk("")))
    assert(!CharRef.trieTerminalAt(walk("notakey99;")))
  }
}
